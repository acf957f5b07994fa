"""Pair generation + Fellegi-Sunter scoring inside blocks (SURVEY.md §2.6).

``predict`` is the engine's equivalent of the reference's
``linker.inference.predict`` (splink_model.py:25-107): one block-key shuffle
scores candidate pairs where they are co-located, then one per-messy-record
shuffle deduplicates multi-rule pairs into Splink's ``match_key`` semantics.
Convention (asserted by the reference's tests/test_source_dataset.py:81-87):
``_l`` = canonical, ``_r`` = messy.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import pyarrow as pa

from uk_address_matcher_ray import schema as sch
from uk_address_matcher_ray.functions.compare import prepare_row, score_pair
from uk_address_matcher_ray.stages.block import (
    BLOCK_KEY_COL,
    BlockKeyEmitter,
    RULE_COL,
    SIDE_COL,
    compute_hot_keys,
)
from uk_address_matcher_ray.state.model import MatchModel

DEFAULT_PREDICT_THRESHOLD = -50.0


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


class BlockScorer:
    """map_groups callable over one block-key group: scores l×r cross pairs."""

    def __init__(
        self,
        model: MatchModel,
        numeric_tf_ref,
        threshold: float = DEFAULT_PREDICT_THRESHOLD,
        retain_columns: Sequence[str] = (),
        retain_types: Optional[Dict[str, pa.DataType]] = None,
        max_pairs_per_block: int = 1_000_000,
    ):
        import ray

        tf = numeric_tf_ref
        if tf is not None and not isinstance(tf, dict):
            tf = ray.get(tf)
        self.model = model
        self.numeric_tf = tf or {}
        self.threshold = threshold
        self.retain_columns = list(retain_columns)
        self.schema = pair_schema(model, retain_columns, retain_types)

        self.max_pairs_per_block = max_pairs_per_block

    def score_rows(self, rows: List[dict]) -> List[dict]:
        """Rows of ONE block-key group -> scored pair row-dicts."""
        l_rows = [r for r in rows if r[SIDE_COL] == 0]
        r_rows = [r for r in rows if r[SIDE_COL] == 1]
        if not l_rows or not r_rows:
            return []
        if len(l_rows) * len(r_rows) > self.max_pairs_per_block:
            raise RuntimeError(
                f"block {rows[0][BLOCK_KEY_COL]!r} would generate "
                f"{len(l_rows) * len(r_rows)} pairs; raise salt_threshold"
            )
        l_prep = [(r, prepare_row(r)) for r in l_rows]
        r_prep = [(r, prepare_row(r)) for r in r_rows]
        gamma_names = [f"gamma_{c.name}" for c in self.model.comparisons]
        out: List[dict] = []
        for l_raw, l_s in l_prep:
            for r_raw, r_s in r_prep:
                mw, prob, gammas = score_pair(l_s, r_s, self.model, self.numeric_tf)
                if mw < self.threshold:
                    continue
                rec = {
                    "match_weight": mw,
                    "match_probability": prob,
                    "match_key": l_raw[RULE_COL],
                    "unique_id_l": l_raw["unique_id"],
                    "unique_id_r": r_raw["unique_id"],
                    "original_address_concat_l": l_raw.get("original_address_concat"),
                    "original_address_concat_r": r_raw.get("original_address_concat"),
                    "postcode_l": l_raw.get("postcode"),
                    "postcode_r": r_raw.get("postcode"),
                    "common_end_tokens_hist_r": r_raw.get("common_end_tokens_hist"),
                }
                for gn, g in zip(gamma_names, gammas):
                    rec[gn] = g
                for col in self.retain_columns:
                    rec[f"{col}_l"] = l_raw.get(col)
                    rec[f"{col}_r"] = r_raw.get(col)
                out.append(rec)
        return out

    def score_joined(self, r_payload: dict, pair_rows: List[dict]) -> List[dict]:
        """One messy record + its deduped candidate pairs (l payloads
        embedded) -> scored pair row-dicts."""
        r_s = prepare_row(r_payload)
        gamma_names = [f"gamma_{c.name}" for c in self.model.comparisons]
        out: List[dict] = []
        for p in pair_rows:
            l_raw = p["__l"]
            mw, prob, gammas = score_pair(
                prepare_row(l_raw), r_s, self.model, self.numeric_tf
            )
            if mw < self.threshold:
                continue
            rec = {
                "match_weight": mw,
                "match_probability": prob,
                "match_key": p["match_key"],
                "unique_id_l": l_raw["unique_id"],
                "unique_id_r": r_payload["unique_id"],
                "original_address_concat_l": l_raw.get("original_address_concat"),
                "original_address_concat_r": r_payload.get("original_address_concat"),
                "postcode_l": l_raw.get("postcode"),
                "postcode_r": r_payload.get("postcode"),
                "common_end_tokens_hist_r": r_payload.get("common_end_tokens_hist"),
            }
            for gn, g in zip(gamma_names, gammas):
                rec[gn] = g
            for col in self.retain_columns:
                rec[f"{col}_l"] = l_raw.get(col)
                rec[f"{col}_r"] = r_payload.get(col)
            out.append(rec)
        return out

    def __call__(self, group: pa.Table) -> pa.Table:
        return pa.Table.from_pylist(
            self.score_rows(group.to_pylist()), schema=self.schema
        )


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


def _rule_key_columns(model: MatchModel) -> List[str]:
    """Cleaned columns the blocking-key extractors read (for projection)."""
    cols = {
        "unique_id",
        "numeric_token_1",
        "numeric_token_2",
        "unusual_tokens_arr",
        "very_unusual_tokens_arr",
        "extremely_unusual_tokens_arr",
        "postcode",
    }
    for rule in model.blocking_rules:
        for kn in rule.l_keys + rule.r_keys:
            if kn.startswith("col:"):
                cols.add(kn[4:])
    return sorted(cols)


_PAIR_ID_SCHEMA = pa.schema(
    [
        pa.field("unique_id_l", pa.string()),
        pa.field("unique_id_r", pa.string()),
        pa.field("match_key", pa.int32()),
    ]
)


def scored_pairs_raw(
    cleaned_l,
    cleaned_r,
    model: MatchModel,
    numeric_tf: Optional[Dict[str, Dict[str, float]]] = None,
    *,
    threshold: float = DEFAULT_PREDICT_THRESHOLD,
    retain_columns: Sequence[str] = (),
    salt_threshold: int = 0,
):
    """Blocking + scoring, payload-light:

    1. both sides project to the blocking-key columns and emit SKINNY
       (block_key, side, uid) rows — the wide cleaned payload never rides
       the per-rule replication;
    2. one grouped_map over block keys emits candidate (uid_l, uid_r, rule);
    3. one grouped_map keyed on uid_r deduplicates to min rule (Splink
       match_key semantics) so each pair is scored ONCE;
    4. two join shuffles attach the cleaned payloads (each side moves once)
       and the second join scores pairs in the same pass.

    Output: one scored row per distinct pair (already match_key-deduped).
    """
    import ray

    retain_types = {}
    if retain_columns:
        schema_l = cleaned_l.schema()
        for col in retain_columns:
            if col in schema_l.names:
                retain_types[col] = schema_l.types[schema_l.names.index(col)]

    hot_keys = {}
    if salt_threshold and salt_threshold > 0:
        hot_keys = compute_hot_keys(
            cleaned_l.select_columns(_rule_key_columns(model)), model, salt_threshold
        )
    hot_ref = ray.put(hot_keys)

    key_cols = _rule_key_columns(model)
    concurrency = (1, max(2, int(ray.cluster_resources().get("CPU", 4)) - 2))
    skinny_cols = [BLOCK_KEY_COL, RULE_COL, SIDE_COL, "unique_id"]

    def emit_side(ds, side):
        return ds.select_columns(key_cols).map_batches(
            BlockKeyEmitter,
            batch_format="pyarrow",
            concurrency=concurrency,
            fn_constructor_kwargs={
                "model": model,
                "side": side,
                "hot_keys_ref": hot_ref,
            },
        ).select_columns(skinny_cols)

    both = emit_side(cleaned_l, 0).union(emit_side(cleaned_r, 1))

    from uk_address_matcher_ray.stages.grouped import grouped_map

    def make_pairs(rows: List[dict]) -> List[dict]:
        l_ids = [r["unique_id"] for r in rows if r[SIDE_COL] == 0]
        r_ids = [r["unique_id"] for r in rows if r[SIDE_COL] == 1]
        if not l_ids or not r_ids:
            return []
        rule = rows[0][RULE_COL]
        return [
            {"unique_id_l": a, "unique_id_r": b, "match_key": rule}
            for a in l_ids
            for b in r_ids
        ]

    pair_ids = grouped_map(both, BLOCK_KEY_COL, make_pairs, _PAIR_ID_SCHEMA)

    def dedup_rows(rows: List[dict]) -> List[dict]:
        best: Dict[str, dict] = {}
        for row in rows:
            k = row["unique_id_l"]
            prev = best.get(k)
            if prev is None or row["match_key"] < prev["match_key"]:
                best[k] = row
        return sorted(best.values(), key=lambda r: r["unique_id_l"])

    deduped = grouped_map(pair_ids, "unique_id_r", dedup_rows, _PAIR_ID_SCHEMA)

    # ---- join 1: attach l payload (each cleaned_l row ships once) --------
    def struct_of(batch: pa.Table) -> pa.Array:
        return batch.combine_chunks().to_struct_array()

    l_schema_fields = [
        pa.field(n, t)
        for n, t in zip(cleaned_l.schema().names, cleaned_l.schema().types)
    ]
    l_struct_type = pa.struct(l_schema_fields)
    join1_schema = pa.schema(
        [
            pa.field("__key", pa.string()),
            pa.field("__kind", pa.int8()),
            pa.field("unique_id_r", pa.string()),
            pa.field("match_key", pa.int32()),
            pa.field("__l", l_struct_type),
        ]
    )

    def tag_l(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "__key": batch.column("unique_id").cast(pa.string()),
                "__kind": pa.array([0] * batch.num_rows, pa.int8()),
                "unique_id_r": pa.nulls(batch.num_rows, pa.string()),
                "match_key": pa.nulls(batch.num_rows, pa.int32()),
                "__l": struct_of(batch).cast(l_struct_type),
            }
        )

    def tag_pairs(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "__key": batch.column("unique_id_l"),
                "__kind": pa.array([1] * batch.num_rows, pa.int8()),
                "unique_id_r": batch.column("unique_id_r"),
                "match_key": batch.column("match_key"),
                "__l": pa.nulls(batch.num_rows, l_struct_type),
            }
        )

    join1_in = cleaned_l.map_batches(tag_l, batch_format="pyarrow").union(
        deduped.map_batches(tag_pairs, batch_format="pyarrow")
    )

    half_schema = pa.schema(
        [
            pa.field("__key", pa.string()),  # now unique_id_r
            pa.field("match_key", pa.int32()),
            pa.field("__l", l_struct_type),
        ]
    )

    def attach_l(rows: List[dict]) -> List[dict]:
        payload = next((r["__l"] for r in rows if r["__kind"] == 0), None)
        if payload is None:
            return []
        out = []
        for r in rows:
            if r["__kind"] == 1:
                out.append(
                    {
                        "__key": r["unique_id_r"],
                        "match_key": r["match_key"],
                        "__l": payload,
                    }
                )
        return out

    half = grouped_map(join1_in, "__key", attach_l, half_schema)

    # ---- join 2: attach r payload and SCORE in the same pass -------------
    scorer = BlockScorer(
        model,
        None,
        threshold=threshold,
        retain_columns=retain_columns,
        retain_types=retain_types,
    )
    scorer.numeric_tf = numeric_tf or {}

    r_schema_fields = [
        pa.field(n, t)
        for n, t in zip(cleaned_r.schema().names, cleaned_r.schema().types)
    ]
    r_struct_type = pa.struct(r_schema_fields)
    join2_schema = pa.schema(
        [
            pa.field("__key", pa.string()),
            pa.field("__kind", pa.int8()),
            pa.field("match_key", pa.int32()),
            pa.field("__l", l_struct_type),
            pa.field("__r", r_struct_type),
        ]
    )

    def tag_r(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "__key": batch.column("unique_id").cast(pa.string()),
                "__kind": pa.array([0] * batch.num_rows, pa.int8()),
                "match_key": pa.nulls(batch.num_rows, pa.int32()),
                "__l": pa.nulls(batch.num_rows, l_struct_type),
                "__r": struct_of(batch).cast(r_struct_type),
            }
        )

    def tag_half(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "__key": batch.column("__key"),
                "__kind": pa.array([1] * batch.num_rows, pa.int8()),
                "match_key": batch.column("match_key"),
                "__l": batch.column("__l"),
                "__r": pa.nulls(batch.num_rows, r_struct_type),
            }
        )

    join2_in = cleaned_r.map_batches(tag_r, batch_format="pyarrow").union(
        half.map_batches(tag_half, batch_format="pyarrow")
    )

    def score_group_rows(rows: List[dict]) -> List[dict]:
        r_payload = next((r["__r"] for r in rows if r["__kind"] == 0), None)
        if r_payload is None:
            return []
        pairs = [r for r in rows if r["__kind"] == 1]
        if not pairs:
            return []
        return scorer.score_joined(r_payload, pairs)

    return grouped_map(join2_in, "__key", score_group_rows, scorer.schema)


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
    return raw  # scored_pairs_raw output is already match_key-deduped
