"""End-to-end match pipelines (SURVEY.md §3).

``match_pipeline`` is the fused fast path: after the blocking shuffle,
a SINGLE ``groupby(unique_id_r)`` shuffle performs match-key dedup, top-n
filtering and second-pass rescoring (the reference runs these as separate
relational passes; the semantics compose exactly because all three operate
within one messy record's candidate group).

``flagship_pipeline`` is the north-star DAG over Common-Crawl-style pages:
extract -> clean -> block/score -> rescore -> threshold -> cluster, with
optional per-stage checkpoints (state/checkpoint.py).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

from uk_address_matcher_ray.stages import cluster as cluster_mod
from uk_address_matcher_ray.stages.clean import clean_dataset
from uk_address_matcher_ray.stages.extract import extract_addresses
from uk_address_matcher_ray.stages.rescore import ImproveStage
from uk_address_matcher_ray.stages.score import scored_pairs_raw
from uk_address_matcher_ray.stages.tf import collect_corpus_stats
from uk_address_matcher_ray.state.model import MatchModel


def match_pipeline(
    cleaned_l,
    cleaned_r,  # None => cleaned_l is a tagged union (SIDE_COL: 0=l, 1=r)
    model: MatchModel,
    numeric_tf: Optional[Dict[str, Dict[str, float]]] = None,
    *,
    predict_threshold: float = -50.0,
    improve_threshold: float = -20.0,
    top_n_matches: int = 5,
    use_bigrams: bool = True,
    retain_columns: Sequence[str] = (),
    salt_threshold: int = 5000,
    emit_src_idx: bool = False,
    return_gather_ref: bool = False,
):
    """cleaned canonical × cleaned messy -> improved pair Dataset.

    Two shuffles total: (rule_id, key) blocking and unique_id_r grouping.

    ``emit_src_idx``: in gather mode, pass the payload row indices
    (``__src_idx_l``/``__src_idx_r``) through to the improved output so the
    caller can run integer-typed cluster edge extraction against the same
    payload. ``return_gather_ref``: return ``(pairs, combined_payload_ref)``
    — the ref is None outside gather mode.
    """
    import os

    pairs_hint = None
    gather_refs = None
    if salt_threshold and salt_threshold > 0:
        # salting materializes the cleaned sides anyway; the counts give
        # both grouped_maps a size estimate so big inputs stream straight
        # into their sorts (raw pairs ≈ 1.7 × cleaned rows measured; 2 is
        # a safe over-estimate — only the exchange choice depends on it)
        cleaned_l = cleaned_l.materialize()
        n = cleaned_l.count()
        if cleaned_r is not None:
            cleaned_r = cleaned_r.materialize()
            n += cleaned_r.count()
        pairs_hint = 2 * n
        # skinny-exchange eligibility (see scored_pairs_raw): tagged union
        # whose cleaned bytes fit a node's object store. Pin the block refs
        # HERE so the rescore stage gathers against the identical layout
        # the pair indices were minted from.
        gather_max = int(os.environ.get("GRAFT_GATHER_MAX_BYTES", str(4 << 30)))
        if (
            cleaned_r is None
            and not retain_columns
            and (cleaned_l.size_bytes() or 0) <= gather_max
        ):
            gather_refs = tuple(cleaned_l.to_arrow_refs())
    combined_ref = None
    if gather_refs is not None:
        from uk_address_matcher_ray.stages.score import combined_payload_ref

        combined_ref = combined_payload_ref(gather_refs)
    raw = scored_pairs_raw(
        cleaned_l,
        cleaned_r,
        model,
        numeric_tf,
        threshold=predict_threshold,
        retain_columns=retain_columns,
        salt_threshold=salt_threshold,
        # safe pre-prune: the second pass keeps only top_n rows above its
        # threshold per messy record, so tasks drop the rest before the
        # unique_id_r all-to-all (identical results, fraction of the bytes)
        local_prune=(top_n_matches, improve_threshold),
        rows_hint=(3 * n) if pairs_hint is not None else None,
        gather_refs=gather_refs,
        gather_combined_ref=combined_ref,
    )
    import pyarrow as pa

    from uk_address_matcher_ray.stages.block import SRC_IDX_COL

    passthrough = ()
    if emit_src_idx and gather_refs is not None:
        passthrough = (
            (f"{SRC_IDX_COL}_l", pa.int64()),
            (f"{SRC_IDX_COL}_r", pa.int64()),
        )
    stage = ImproveStage(
        dedup_first=True,
        retain_columns=retain_columns,
        passthrough=passthrough,
        match_weight_threshold=improve_threshold,
        top_n_matches=top_n_matches,
        use_bigrams=use_bigrams,
    )
    if gather_refs is not None:
        out = improve_raw_pairs_gather(
            raw, stage, model, (combined_ref,), rows_hint=pairs_hint
        )
        return (out, combined_ref) if return_gather_ref else out
    out = improve_raw_pairs(raw, stage, model, rows_hint=pairs_hint)
    return (out, None) if return_gather_ref else out


def slim_for_improve(raw, stage, model: MatchModel):
    """Project raw scored pairs to the columns the rescore kernel reads.

    Drops match_probability + the 8 gamma_* columns the output never uses,
    and slims the heavy common_end_tokens histogram to the token list — the
    kernel reads only the token SET and the improved output carries no
    histogram at all."""
    import pyarrow as pa

    from uk_address_matcher_ray.stages.score import pair_schema

    raw_schema = pair_schema(model, stage.retain_columns)
    keep_light = [
        c
        for c in stage.input_columns()
        if c in raw_schema.names and c != "common_end_tokens_hist_r"
    ]
    slim_schema = pa.schema(
        [pa.field(c, raw_schema.field(c).type) for c in keep_light]
        + [pa.field(stage.CET_TOKS_COL, pa.list_(pa.string()))]
    )

    def slim(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return slim_schema.empty_table()
        h = batch.column("common_end_tokens_hist_r")
        if isinstance(h, pa.ChunkedArray):
            h = (
                h.chunk(0)
                if h.num_chunks == 1
                else pa.concat_arrays(h.chunks)
                if h.num_chunks
                else pa.array([], type=h.type)
            )
        if h.offset != 0:
            h = pa.concat_arrays([h])
        toks = pa.ListArray.from_arrays(h.offsets, h.values.field("tok"))
        cols = {c: batch.column(c) for c in keep_light}
        cols[stage.CET_TOKS_COL] = toks
        return pa.table(cols).cast(slim_schema)

    return raw.map_batches(slim, batch_format="pyarrow")


def improve_raw_pairs(
    raw_slimmed_or_raw,
    stage,
    model: MatchModel,
    *,
    pre_slimmed: bool = False,
    rows_hint=None,
):
    """Second-pass rescoring of raw scored pairs: slim projection + ONE
    unique_id_r grouped_map running the (dedup + top-n + rescore) kernel.
    ``pre_slimmed=True`` skips the projection (used by the multiplier tuning
    loop, which re-runs this on one materialized slimmed dataset per
    evaluation). ``rows_hint``: pair-count estimate letting big inputs
    stream the slim projection straight into the unique_id_r sort (no
    materialize of the slimmed table)."""
    from uk_address_matcher_ray.stages.grouped import grouped_map

    slimmed = (
        raw_slimmed_or_raw
        if pre_slimmed
        else slim_for_improve(raw_slimmed_or_raw, stage, model)
    )
    return grouped_map(
        slimmed,
        "unique_id_r",
        None,
        stage.schema,
        fn_table=stage.process_table,
        rows_hint=rows_hint,
    )


def improve_raw_pairs_gather(raw, stage, model: MatchModel, payload_refs, *, rows_hint=None):
    """Gather-mode second pass: the unique_id_r all-to-all carries ONLY
    (match_weight, match_key, __src_idx_l, __src_idx_r) — 24 fixed bytes per
    pair — grouped by the int64 messy-row index (bijective with unique_id_r,
    so group semantics are identical). The kernel gathers both sides' payload
    (ids, addresses, postcodes, the messy common-end-token histogram) from
    the SAME materialized cleaned blocks the indices were minted from and
    runs the standard ImproveStage kernel; output schema unchanged."""
    import pyarrow as pa

    from uk_address_matcher_ray.stages.block import SRC_IDX_COL
    from uk_address_matcher_ray.stages.grouped import grouped_map
    from uk_address_matcher_ray.stages.score import _gathered_payload

    idx_l, idx_r = f"{SRC_IDX_COL}_l", f"{SRC_IDX_COL}_r"
    skinny_cols = ["match_weight", "match_key", idx_l, idx_r]
    gather_cols = [
        "unique_id",
        "original_address_concat",
        "postcode",
        "common_end_tokens_hist",
    ]

    def slim(batch: pa.Table) -> pa.Table:
        return batch.select(skinny_cols)

    def kernel(tbl: pa.Table) -> pa.Table:
        from uk_address_matcher_ray.util import timed

        if tbl.num_rows == 0:
            return stage.schema.empty_table()
        with timed("rescore.gather"):
            import numpy as np

            payload = _gathered_payload(payload_refs).select(gather_cols)
            li = tbl.column(idx_l).to_numpy(zero_copy_only=False)
            ri = tbl.column(idx_r).to_numpy(zero_copy_only=False)
            # sorted-unique gather + inverse expansion: the r side repeats
            # per group (grouped by idx_r) and l rows recur across pairs —
            # fetch each payload row once, row order identical to the
            # direct take (the score.gather locality/dedup pattern)
            lu, linv = np.unique(li, return_inverse=True)
            ru, rinv = np.unique(ri, return_inverse=True)
            lrows = payload.take(pa.array(lu, pa.int64())).take(
                pa.array(linv, pa.int64())
            )
            rrows = payload.take(pa.array(ru, pa.int64())).take(
                pa.array(rinv, pa.int64())
            )
        h = rrows.column("common_end_tokens_hist")
        if isinstance(h, pa.ChunkedArray):
            h = h.combine_chunks() if h.num_chunks else pa.array([], type=h.type)
        if h.offset != 0:
            h = pa.concat_arrays([h])
        toks = pa.ListArray.from_arrays(h.offsets, h.values.field("tok"))
        full_cols = {
            "unique_id_l": lrows.column("unique_id"),
            "unique_id_r": rrows.column("unique_id"),
            "match_weight": tbl.column("match_weight"),
            "match_key": tbl.column("match_key"),
            "original_address_concat_l": lrows.column("original_address_concat"),
            "original_address_concat_r": rrows.column("original_address_concat"),
            "postcode_l": lrows.column("postcode"),
            "postcode_r": rrows.column("postcode"),
            stage.CET_TOKS_COL: toks,
        }
        for nm, _typ in stage.passthrough:
            full_cols[nm] = tbl.column(nm)
        full = pa.table(full_cols)
        with timed("rescore.kernel"):
            return stage.process_table(full)

    return grouped_map(
        raw.map_batches(slim, batch_format="pyarrow"),
        idx_r,
        None,
        stage.schema,
        fn_table=kernel,
        rows_hint=rows_hint,
    )


def flagship_pipeline(
    pages_messy,
    pages_canonical,
    *,
    model: Optional[MatchModel] = None,
    cluster_threshold: float = 5.0,
    checkpoint_run=None,
    salt_threshold: int = 5000,
    verify_text: bool = True,
):
    """Common-Crawl-style page Datasets -> (improved pairs, cluster labels).

    TF tables / end tokens are computed on the fly from the union of both
    sides (one distributed counting pass; vocabulary-sized result broadcast
    back), mirroring the reference's on-the-fly mode
    (cleaning_pipelines.py:68-111).
    """
    import pyarrow as pa

    from uk_address_matcher_ray.stages.block import SIDE_COL

    model = model or MatchModel()

    # Both sides flow as ONE tagged union through extract -> corpus stats ->
    # clean -> key emission: half the Dataset jobs / materializations of the
    # two-sided pipeline (the per-job fixed cost is CPU-count-invariant, so
    # this directly buys scaling efficiency), identical row-level semantics.
    def tag(ds, side: int):
        def add(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                SIDE_COL, pa.array([side] * batch.num_rows, pa.int8())
            )

        return ds.map_batches(add, batch_format="pyarrow")

    pages = tag(pages_canonical, 0).union(tag(pages_messy, 1))

    # Extraction output (text-only, ~10% of page bytes) is consumed by three
    # passes (corpus stats, cleaning, and cleaning's consumers); materialize
    # once so lineage doesn't re-parse HTML per pass. Blocks live in the
    # object store and spill under pressure.
    extracted = extract_addresses(pages, verify_text=verify_text).materialize()

    # "auto" = size-triggered vocabulary floor: the final tree task drops
    # sub-floor tokens before anything reaches the driver once the global
    # vocabulary exceeds GRAFT_TF_FLOOR_TRIGGER rows, so the driver dict is
    # bounded at 100 TB while small/oracle runs stay bit-identical (floor
    # never engages below the trigger). See collect_corpus_stats docstring.
    tf, num_tf, end_tokens = collect_corpus_stats(extracted, min_token_count="auto")
    numeric_tf = {f"numeric_token_{i}": num_tf for i in (1, 2, 3)}

    def build_cleaned():
        return clean_dataset(extracted, tf, end_tokens)

    if checkpoint_run is not None:
        cleaned = checkpoint_run.stage("cleaned_tagged", "v1", build_cleaned)
    else:
        # cleaned feeds both the hot-key pre-pass and key emission;
        # materialize to avoid re-cleaning (checkpoints do this on disk).
        cleaned = build_cleaned().materialize()

    from uk_address_matcher_ray.stages.block import SRC_IDX_COL

    idx_cols = [f"{SRC_IDX_COL}_l", f"{SRC_IDX_COL}_r"]

    if checkpoint_run is not None:
        # checkpointed pairs reload from parquet in a later session — the
        # payload ref would be gone, so stay on the string cluster path
        pairs = checkpoint_run.stage(
            "improved_pairs",
            "v1",
            lambda: match_pipeline(
                cleaned, None, model, numeric_tf, salt_threshold=salt_threshold
            ),
        )
        edges = cluster_mod.edges_from_pairs(pairs, threshold=cluster_threshold)
        labels = cluster_mod.propagate_labels(edges)
        return pairs, labels

    pairs_idx, payload_ref = match_pipeline(
        cleaned,
        None,
        model,
        numeric_tf,
        salt_threshold=salt_threshold,
        emit_src_idx=True,
        return_gather_ref=True,
    )
    # consumed by the caller AND by edge extraction: pin once
    pairs_idx = pairs_idx.materialize()
    has_idx = all(c in pairs_idx.schema().names for c in idx_cols)
    if payload_ref is not None and has_idx:
        # integer edge extraction straight off the pair blocks: no node
        # discovery / id-encode passes, no node-array broadcast (those
        # phases anti-scaled with worker count); labels bit-identical
        labels = cluster_mod.propagate_labels_indexed(
            pairs_idx, cluster_threshold, payload_ref
        )
    else:
        edges = cluster_mod.edges_from_pairs(pairs_idx, threshold=cluster_threshold)
        labels = cluster_mod.propagate_labels(edges)
    pairs = (
        pairs_idx.drop_columns([c for c in idx_cols if c in pairs_idx.schema().names])
        if has_idx
        else pairs_idx
    )
    return pairs, labels


def match_one(
    address: str,
    postcode: str,
    cleaned_canonical,
    tf: Dict[str, float],
    end_tokens,
    numeric_tf: Optional[Dict[str, Dict[str, float]]] = None,
    *,
    model: Optional[MatchModel] = None,
    top_n_matches: int = 5,
    unique_id: str = "q_1",
):
    """Match ONE messy address against a cleaned canonical Dataset — the
    most common first-touch surface (reference examples/match_one.py).

    The single record is cleaned driver-side (one row) and run through the
    standard clean -> block/score -> rescore pipeline; returns the improved
    pair Dataset (≤ top_n_matches rows, match_weight descending when
    collected)."""
    import pyarrow as pa

    from uk_address_matcher_ray.stages.clean import clean_batch
    from uk_address_matcher_ray.util import dataset_from_table

    model = model or MatchModel()
    messy = pa.table(
        {
            "unique_id": pa.array([unique_id], pa.string()),
            "address_concat": pa.array([address], pa.string()),
            "postcode": pa.array([postcode], pa.string()),
        }
    )
    cleaned_messy = dataset_from_table(
        clean_batch(messy, dict(tf), frozenset(end_tokens))
    )
    return match_pipeline(
        cleaned_canonical,
        cleaned_messy,
        model,
        numeric_tf,
        top_n_matches=top_n_matches,
        salt_threshold=0,
    )
