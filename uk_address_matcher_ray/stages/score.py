"""Pair generation + Fellegi-Sunter scoring inside blocks (SURVEY.md §2.6).

``predict`` is the engine's equivalent of the reference's
``linker.inference.predict`` (splink_model.py:25-107): one block-key shuffle
scores candidate pairs where they are co-located, then one per-messy-record
shuffle deduplicates multi-rule pairs into Splink's ``match_key`` semantics.
Convention (asserted by the reference's tests/test_source_dataset.py:81-87):
``_l`` = canonical, ``_r`` = messy.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import pyarrow as pa

from uk_address_matcher_ray import schema as sch
from uk_address_matcher_ray.stages.block import (
    BLOCK_KEY_COL,
    BLOCK_KEYS,
    active_block_keys,
    BlockKeyEmitter,
    RULE_COL,
    SIDE_COL,
    compute_hot_keys,
)
from uk_address_matcher_ray.state.model import MatchModel

DEFAULT_PREDICT_THRESHOLD = -50.0

# Per-worker-process memo for the gathered cleaned payload (skinny
# exchange). Holds at most ONE payload: plasma gets are zero-copy on the
# node, so the memo only saves the concat bookkeeping between kernel calls.
_GATHER_MEMO: Dict[str, pa.Table] = {}


def _gathered_payload(refs) -> pa.Table:
    key = refs[0].hex() if refs else ""
    tbl = _GATHER_MEMO.get(key)
    if tbl is None:
        import ray

        tbl = pa.concat_tables(ray.get(list(refs)))
        _GATHER_MEMO.clear()
        _GATHER_MEMO[key] = tbl
    return tbl


def combined_payload_ref(refs):
    """Concat + combine_chunks the cleaned blocks into ONE contiguous table
    resident in plasma (single IPC object, single-chunk columns after the
    round-trip). ``pa.Table.take`` on a CHUNKED table pays a per-element
    chunk resolution that measured ~9x slower than on contiguous arrays
    (0.71s vs 0.08s for 130k rows against a 6.4M-row payload) — and the
    gather kernels take once per slice. One plasma copy total; every worker
    maps it zero-copy."""
    import ray

    @ray.remote
    def _combine(*tbls):
        live = [t for t in tbls if t.num_rows > 0]
        return pa.concat_tables(live).combine_chunks()

    return _combine.remote(*refs)


def pair_schema(
    model: MatchModel,
    retain_columns: Sequence[str] = (),
    retain_types: Optional[Dict[str, pa.DataType]] = None,
) -> pa.Schema:
    fields = [
        pa.field("match_weight", pa.float64()),
        pa.field("match_probability", pa.float64()),
        pa.field("match_key", pa.int32()),
        pa.field("unique_id_l", pa.string()),
        pa.field("unique_id_r", pa.string()),
        pa.field("original_address_concat_l", pa.string()),
        pa.field("original_address_concat_r", pa.string()),
        pa.field("postcode_l", pa.string()),
        pa.field("postcode_r", pa.string()),
        pa.field("common_end_tokens_hist_r", sch.HIST_TYPE),
    ]
    for comp in model.comparisons:
        fields.append(pa.field(f"gamma_{comp.name}", pa.int32()))
    for col in retain_columns:
        t = (retain_types or {}).get(col, pa.string())
        fields.append(pa.field(f"{col}_l", t))
        fields.append(pa.field(f"{col}_r", t))
    return pa.schema(fields)


def dedup_pairs_in_group(rows: List[dict]) -> List[dict]:
    """Splink match_key semantics: keep one row per (l, r) with min rule id
    (scores are identical across rules for the same pair)."""
    best: Dict[str, dict] = {}
    for row in rows:
        k = row["unique_id_l"]
        prev = best.get(k)
        if prev is None or row["match_key"] < prev["match_key"]:
            best[k] = row
    return sorted(best.values(), key=lambda r: (-r["match_weight"], r["unique_id_l"]))


def dedup_pairs_table(tbl: pa.Table) -> pa.Table:
    """Vectorized dedup_pairs_in_group over a table of complete unique_id_r
    groups (sorted by unique_id_r): min match_key per (r, l), rows ordered
    (unique_id_r, match_weight DESC, unique_id_l)."""
    import numpy as np

    if tbl.num_rows == 0:
        return tbl
    uid_r = tbl.column("unique_id_r").to_numpy(zero_copy_only=False)
    uid_l = tbl.column("unique_id_l").to_numpy(zero_copy_only=False)
    mk = tbl.column("match_key").to_numpy(zero_copy_only=False).astype(np.int64)
    mw = tbl.column("match_weight").to_numpy(zero_copy_only=False)
    # order-preserving integer ranks for the string keys
    _, r_rank = np.unique(uid_r, return_inverse=True)
    _, l_rank = np.unique(uid_l, return_inverse=True)
    order = np.lexsort((mk, l_rank, r_rank))
    rr, lr = r_rank[order], l_rank[order]
    first = np.ones(len(order), dtype=bool)
    first[1:] = (rr[1:] != rr[:-1]) | (lr[1:] != lr[:-1])
    kept = order[first]
    final = kept[np.lexsort((l_rank[kept], -mw[kept], r_rank[kept]))]
    return tbl.take(pa.array(final))


def scored_pairs_raw(
    cleaned_l,
    cleaned_r,
    model: MatchModel,
    numeric_tf: Optional[Dict[str, Dict[str, float]]] = None,
    *,
    threshold: float = DEFAULT_PREDICT_THRESHOLD,
    retain_columns: Sequence[str] = (),
    salt_threshold: int = 0,
    local_prune: Optional[Tuple[int, float]] = None,
    rows_hint: Optional[int] = None,
    gather_refs=None,
    gather_combined_ref=None,
):
    """Blocking + in-block scoring. Output may contain one row per
    (pair, matching rule); use ``predict`` for match_key-deduped pairs.

    ``cleaned_r=None``: ``cleaned_l`` is a TAGGED UNION of both sides
    carrying ``SIDE_COL`` (0 = canonical, 1 = messy) — the hot-key pre-pass
    and key emission each run as ONE Dataset pass instead of two.

    ``local_prune=(top_n, min_weight)``: task-local safe pre-prune for the
    improve path (see score_vec.prune_pairs_local) — NOT valid for predict
    semantics (drops sub-threshold pairs and multi-rule match_key copies).

    ``gather_refs``: caller-provided block refs of the (tagged, materialized)
    cleaned union — forces the skinny exchange against EXACTLY those blocks
    and appends ``__src_idx_l``/``__src_idx_r`` (int64 row indices into that
    block layout) to the output schema so downstream stages can run their own
    payload gathers against the same refs (see match_pipeline)."""
    import ray

    from uk_address_matcher_ray.stages.block import SRC_IDX_COL, TaggedBlockKeyEmitter

    tagged = cleaned_r is None
    if gather_refs is not None and not tagged:
        raise ValueError("gather_refs requires the tagged (cleaned_r=None) form")

    retain_types = {}
    if retain_columns:
        schema_l = cleaned_l.schema()
        for col in retain_columns:
            if col in schema_l.names:
                retain_types[col] = schema_l.types[schema_l.names.index(col)]

    hot_keys = {}
    if salt_threshold and salt_threshold > 0:
        # the hot-key pre-pass consumes the cleaned sides once and key
        # emission consumes them again — pin them so a lazy cleaning graph
        # doesn't execute twice
        cleaned_l = cleaned_l.materialize()
        if tagged:
            from uk_address_matcher_ray.util import timed

            with timed("block.hot_keys_wall"):
                hot_keys = compute_hot_keys(
                    cleaned_l, model, salt_threshold, tagged=True
                )
        else:
            cleaned_r = cleaned_r.materialize()
            hot_keys = compute_hot_keys(
                cleaned_l, model, salt_threshold, cleaned_r=cleaned_r
            )
        if rows_hint is None:
            # emitted rows ≈ cleaned rows × rules firing per row (~2.6
            # measured on the synth corpus; 3 is a safe over-estimate).
            # Only the hash-vs-sort exchange choice depends on this: big
            # inputs stream straight into the sort with no input
            # materialize barrier.
            n = cleaned_l.count() + (cleaned_r.count() if cleaned_r is not None else 0)
            rows_hint = 3 * n
    hot_ref = ray.put(hot_keys)

    # After key emission, only the scoring payload rides the shuffle —
    # the unusual-token arrays / address_without_numbers exist solely for
    # key extraction and are projected out before the sort.
    block_keys = active_block_keys()
    payload_cols = [
        *block_keys, RULE_COL, SIDE_COL,
        "unique_id", "original_address_concat", "postcode",
        "flat_positional", "flat_letter",
        "numeric_token_1", "numeric_token_2", "numeric_token_3",
        "token_rel_freq_arr_hist", "common_end_tokens_hist",
    ] + [c for c in retain_columns if c not in (
        "unique_id", "original_address_concat", "postcode")]

    # --- exchange representation: payload vs skinny+gather -----------------
    # Tagged + materialized inputs whose cleaned bytes fit a node's object
    # store use the SKINNY exchange: emissions carry only (key columns, rule,
    # side, __src_idx) — ~25 fixed bytes — and the scoring kernel gathers the
    # payload from the materialized cleaned blocks by row index (classic
    # broadcast-join shape: the cleaned table is read once per NODE via the
    # shared object store, not once per emitted row through the all-to-all).
    # Measured at x64: the blocking sort moves ~90 MB instead of ~1.2 GB.
    # The gate keeps the 100-TB story honest: when the cleaned table cannot
    # fit a node (GRAFT_GATHER_MAX_BYTES, default 4 GiB), the payload rides
    # the shuffle exactly as before — the shape that scales without bound.
    import os

    gather_max = int(os.environ.get("GRAFT_GATHER_MAX_BYTES", str(4 << 30)))
    use_gather = tagged and salt_threshold > 0
    if use_gather and gather_refs is None:
        try:
            use_gather = (cleaned_l.size_bytes() or 0) <= gather_max
        except Exception:
            use_gather = False
    if gather_refs is not None:
        use_gather = True
        # downstream gathers need the indices in the pair output
        retain_columns = (*retain_columns, SRC_IDX_COL)
        retain_types[SRC_IDX_COL] = pa.int64()

    out_schema = pair_schema(model, retain_columns, retain_types)
    tf_ref = ray.put(numeric_tf or {})
    retain = tuple(retain_columns)

    def score_table(tbl: pa.Table) -> pa.Table:
        from uk_address_matcher_ray.stages.score_vec import (
            prune_pairs_local,
            score_pairs_vectorized,
        )
        from uk_address_matcher_ray.util import timed

        with timed("score.vectorized"):
            out = score_pairs_vectorized(
                tbl,
                model,
                ray.get(tf_ref),
                threshold,
                out_schema,
                retain_columns=retain,
            )
        if local_prune is not None:
            with timed("score.prune"):
                out = prune_pairs_local(out, local_prune[0], local_prune[1])
        return out

    from uk_address_matcher_ray.stages.grouped import grouped_map

    if use_gather:
        payload_refs = (
            tuple(gather_refs)
            if gather_refs is not None
            else tuple(cleaned_l.to_arrow_refs())
        )

        @ray.remote
        def emit_skinny_block(tbl: pa.Table, offset: int, hot):
            from uk_address_matcher_ray.util import timed

            if tbl.num_rows == 0 or SIDE_COL not in tbl.schema.names:
                return None
            with timed("block.emit_skinny"):
                return TaggedBlockKeyEmitter(model, hot).emit_skinny(tbl, offset)

        @ray.remote
        def block_rows(tbl: pa.Table) -> int:
            return tbl.num_rows

        nrows = ray.get([block_rows.remote(r) for r in payload_refs])
        offsets = []
        acc = 0
        for n_b in nrows:
            offsets.append(acc)
            acc += n_b
        all_refs = [
            emit_skinny_block.remote(r, off, hot_ref)
            for r, off in zip(payload_refs, offsets)
        ]
        skinny_refs = []
        n_skinny = 0
        for r, t in zip(all_refs, ray.get(all_refs)):
            if t is not None and t.num_rows > 0:
                skinny_refs.append(r)
                n_skinny += t.num_rows
        if not skinny_refs:
            return ray.data.from_arrow(out_schema.empty_table())
        both = ray.data.from_arrow_refs(skinny_refs)
        rows_hint = n_skinny  # exact — emission already ran

        gather_cols = [
            c
            for c in payload_cols
            if c not in (*block_keys, RULE_COL, SIDE_COL)
            and c in cleaned_l.schema().names
        ]

        combined = gather_combined_ref or combined_payload_ref(payload_refs)
        combined_refs = (combined,)

        def score_table_gather(tbl: pa.Table) -> pa.Table:
            from uk_address_matcher_ray.util import timed

            import numpy as np

            with timed("score.gather"):
                payload = _gathered_payload(combined_refs).select(gather_cols)
                idx = tbl.column(SRC_IDX_COL).to_numpy(zero_copy_only=False)
                # gather SORTED UNIQUE indices then expand via the inverse
                # permutation: a row emitted under k rules is fetched once,
                # and the big-table access is sequential-ish instead of
                # random (the random gather was the one kernel whose
                # CPU-seconds inflated ~2.7x at 16 workers — shared memory
                # bandwidth on the plasma-mapped payload). Row order of the
                # result is IDENTICAL to the direct take.
                uniq, inverse = np.unique(idx, return_inverse=True)
                rows = payload.take(pa.array(uniq, type=pa.int64())).take(
                    pa.array(inverse, type=pa.int64())
                )
                for c in (*block_keys, RULE_COL, SIDE_COL, SRC_IDX_COL):
                    rows = rows.append_column(c, tbl.column(c).combine_chunks())
            return score_table(rows)

        return grouped_map(
            both, block_keys, None, out_schema, fn_table=score_table_gather,
            rows_hint=rows_hint,
        )

    def emit_side(ds, side):
        from uk_address_matcher_ray.util import get_broadcast

        def emit(batch: pa.Table) -> pa.Table:
            return BlockKeyEmitter(model, side, get_broadcast(hot_ref))(batch)

        emitted = ds.map_batches(emit, batch_format="pyarrow")
        names = ds.schema().names + [*block_keys, RULE_COL, SIDE_COL]
        keep = [c for c in payload_cols if c in names]
        return emitted.select_columns(keep)

    if tagged:
        from uk_address_matcher_ray.util import get_broadcast

        def emit_tagged(batch: pa.Table) -> pa.Table:
            return TaggedBlockKeyEmitter(model, get_broadcast(hot_ref))(batch)

        emitted = cleaned_l.map_batches(emit_tagged, batch_format="pyarrow")
        names = cleaned_l.schema().names + [*block_keys, RULE_COL]
        keep = [c for c in payload_cols if c in names]
        both = emitted.select_columns(keep)
    else:
        both = emit_side(cleaned_l, 0).union(emit_side(cleaned_r, 1))

    return grouped_map(
        both, block_keys, None, out_schema, fn_table=score_table,
        rows_hint=rows_hint,
    )


def _dataset_schema(ds) -> pa.Schema:
    s = ds.schema()
    return pa.schema([pa.field(n, t) for n, t in zip(s.names, s.types)])


def predict(
    cleaned_l,
    cleaned_r,
    model: MatchModel,
    numeric_tf: Optional[Dict[str, Dict[str, float]]] = None,
    *,
    threshold: float = DEFAULT_PREDICT_THRESHOLD,
    retain_columns: Sequence[str] = (),
    salt_threshold: int = 0,
):
    """Reference ``linker.inference.predict`` equivalent: deduped scored pairs."""
    raw = scored_pairs_raw(
        cleaned_l,
        cleaned_r,
        model,
        numeric_tf,
        threshold=threshold,
        retain_columns=retain_columns,
        salt_threshold=salt_threshold,
    )
    from uk_address_matcher_ray.stages.grouped import grouped_map

    return grouped_map(
        raw, "unique_id_r", None, _dataset_schema(raw), fn_table=dedup_pairs_table
    )
