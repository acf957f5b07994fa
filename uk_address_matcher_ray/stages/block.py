"""Blocking: candidate-key emission, hot-key salting, pair scoring.

Re-expresses the reference's 18 blocking rules (splink_model.json:16-89,
SURVEY.md §2.5) as ONE hash shuffle: each side flat-maps to
(block_key=(rule_id, key values), side, payload) rows, a single
``groupby(block_key)`` co-locates candidates, and pairs are scored inside
``map_groups`` before they leave the block (no unscored pair materialises).

``match_key`` semantics (first rule that produced the pair; Splink's
cascading NOT-exclusion) are reproduced downstream by deduplicating on
(unique_id_l, unique_id_r) keeping min(rule_id) inside the per-messy-record
group (stages/score.py) — equivalent because a pair's score is identical
whichever rule emitted it.

Skew: keys whose canonical-side row count exceeds ``salt_threshold`` are
split into ceil(n/salt_threshold) sub-blocks; canonical rows are assigned a
sub-block by uid hash, messy rows are replicated to every sub-block, so each
(l, r) pair still meets exactly once (north-rule salting requirement).
"""

from __future__ import annotations

import hashlib
from typing import Dict, List, Optional, Tuple

import pyarrow as pa

from uk_address_matcher_ray.functions.text import inward_code, outward_code
from uk_address_matcher_ray.state.model import MatchModel

SEP = "\x1f"
# The (rule_id, key values, salt cell) key string never rides the shuffle:
# it is hashed to TWO uint64 columns at emission (primary sort/partition key
# + disambiguation), so the all-to-all carries 16 fixed bytes per row instead
# of a 20-60 byte salted string, and every downstream comparison (sort
# sampling, range partition, group-boundary detection) is an integer compare.
# Group identity is the 128-bit pair — a spurious group merge needs a
# simultaneous collision in two independently-seeded 64-bit hashes
# (P ≈ n²/2^129; ~10^-14 even at 10^12 distinct keys).
BLOCK_KEY_COL = "__block_key"
BLOCK_KEY2_COL = "__block_key2"
BLOCK_KEYS = [BLOCK_KEY_COL, BLOCK_KEY2_COL]


def active_block_keys() -> List[str]:
    """A/B diagnosis knob: GRAFT_STRING_KEYS=1 reverts to the raw key string
    as a single sort/partition column (pre-hash behavior) for perf bisection.
    Default: the two-uint64 hashed key columns."""
    import os

    if os.environ.get("GRAFT_STRING_KEYS") == "1":
        return [BLOCK_KEY_COL]
    return BLOCK_KEYS
SIDE_COL = "__side"
RULE_COL = "__rule"
# skinny emission: global row index into the materialized cleaned blocks
SRC_IDX_COL = "__src_idx"


def hash_block_keys(keys: List[str]) -> Tuple[pa.Array, pa.Array]:
    """Key strings -> (primary, disambiguation) uint64 hash arrays.

    Vectorized via polars' 64-bit hash (two seeds); only equality/grouping
    semantics are relied on, never cross-process stability — the hot-key
    pre-pass matches keys as STRINGS before hashing, and no hash value
    persists beyond one pipeline run."""
    try:
        import polars as pl

        if isinstance(keys, (pa.Array, pa.ChunkedArray)):
            s = pl.Series("k", pl.from_arrow(keys))  # zero-copy
        else:
            s = pl.Series("k", keys, dtype=pl.Utf8)
        return (
            pa.array(s.hash(seed=1).to_numpy(), pa.uint64()),
            pa.array(s.hash(seed=2).to_numpy(), pa.uint64()),
        )
    except ImportError:  # pragma: no cover - polars is baked into the image
        if isinstance(keys, (pa.Array, pa.ChunkedArray)):
            keys = keys.to_pylist()
        h1, h2 = [], []
        for k in keys:
            d = hashlib.md5(k.encode()).digest()
            h1.append(int.from_bytes(d[:8], "little"))
            h2.append(int.from_bytes(d[8:], "little"))
        return pa.array(h1, pa.uint64()), pa.array(h2, pa.uint64())

_KEY_SOURCE_COLS = (
    "unique_id",
    "numeric_token_1",
    "numeric_token_2",
    "unusual_tokens_arr",
    "very_unusual_tokens_arr",
    "extremely_unusual_tokens_arr",
    "postcode",
)


def key_source_columns(model: MatchModel) -> List[str]:
    """Columns the blocking keys actually read — projecting to these before
    to_pylist keeps the (heavy) histogram structs out of the Python row
    conversion."""
    cols = list(_KEY_SOURCE_COLS)
    for rule in model.blocking_rules:
        for kn in rule.l_keys + rule.r_keys:
            if kn.startswith("col:") and kn[4:] not in cols:
                cols.append(kn[4:])
    return cols


def _key_components(row: dict) -> Dict[str, Optional[str]]:
    u = row.get("unusual_tokens_arr") or []
    vu = row.get("very_unusual_tokens_arr") or []
    eu = row.get("extremely_unusual_tokens_arr") or []
    pc = row.get("postcode")
    return {
        "n1": row.get("numeric_token_1"),
        "n2": row.get("numeric_token_2"),
        "u1": u[0] if len(u) > 0 else None,
        "u2": u[1] if len(u) > 1 else None,
        "vu1": vu[0] if len(vu) > 0 else None,
        "vu2": vu[1] if len(vu) > 1 else None,
        "eu1": eu[0] if len(eu) > 0 else None,
        "pc": pc,
        "out": outward_code(pc),
        "in": inward_code(pc),
    }


def _resolve(comp: Dict[str, Optional[str]], key_name: str, row: dict) -> Optional[str]:
    if key_name.startswith("col:"):
        v = row.get(key_name[4:])
        return None if v is None else str(v)
    return comp[key_name]


def row_block_keys(row: dict, model: MatchModel, side: int) -> List[Tuple[int, str]]:
    """All (rule_id, key-string) emissions for one cleaned row.

    side: 0 = l/canonical (keys from rule.l_keys), 1 = r/messy (r_keys).
    """
    comp = _key_components(row)
    out: List[Tuple[int, str]] = []
    for rule_id, rule in enumerate(model.blocking_rules):
        names = rule.l_keys if side == 0 else rule.r_keys
        vals = []
        ok = True
        for kn in names:
            v = _resolve(comp, kn, row)
            if v is None:
                ok = False
                break
            vals.append(v)
        if ok:
            out.append((rule_id, f"{rule_id}{SEP}" + SEP.join(vals)))
    return out


def _stable_hash(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")


def batch_rule_keys(
    batch: pa.Table, model: MatchModel, side: int
) -> Tuple[List[int], List[int], List[str]]:
    """Columnar key emission for a whole batch -> (row_idx, rule_id, key)
    parallel lists. Same keys as row_block_keys per row, but components are
    extracted once per column and each rule is one zip/listcomp instead of
    per-row dict construction (~10x on the emission/counting hot path)."""
    n = batch.num_rows
    names = set(batch.column_names)

    def col_list(name):
        if name in names:
            return batch.column(name).to_pylist()
        return [None] * n

    def arr_elem(name, idx):
        if name not in names:
            return [None] * n
        vals = batch.column(name).to_pylist()
        return [v[idx] if v is not None and len(v) > idx else None for v in vals]

    pc_vals = col_list("postcode")
    comp: Dict[str, List[Optional[str]]] = {
        "n1": col_list("numeric_token_1"),
        "n2": col_list("numeric_token_2"),
        "u1": arr_elem("unusual_tokens_arr", 0),
        "u2": arr_elem("unusual_tokens_arr", 1),
        "vu1": arr_elem("very_unusual_tokens_arr", 0),
        "vu2": arr_elem("very_unusual_tokens_arr", 1),
        "eu1": arr_elem("extremely_unusual_tokens_arr", 0),
        "pc": pc_vals,
        "out": [outward_code(p) for p in pc_vals],
        "in": [inward_code(p) for p in pc_vals],
    }

    def resolve(kn: str) -> List[Optional[str]]:
        if kn.startswith("col:"):
            vals = col_list(kn[4:])
            return [None if v is None else str(v) for v in vals]
        return comp[kn]

    out_row: List[int] = []
    out_rule: List[int] = []
    out_key: List[str] = []
    for rule_id, rule in enumerate(model.blocking_rules):
        key_names = rule.l_keys if side == 0 else rule.r_keys
        cols = [resolve(kn) for kn in key_names]
        prefix = f"{rule_id}{SEP}"
        for i, vals in enumerate(zip(*cols)):
            if None in vals:
                continue
            out_row.append(i)
            out_rule.append(rule_id)
            out_key.append(prefix + SEP.join(vals))
    return out_row, out_rule, out_key


def batch_rule_keys_arrays(batch: pa.Table, model: MatchModel, side: int):
    """Fully-vectorized key emission -> (row_idx int64 np array, rule_ids
    int32 np array, keys pa.StringArray).

    Same (row, rule, key) MULTISET as ``batch_rule_keys`` (differential
    property test); the key string is built as one Arrow
    ``binary_join_element_wise`` per rule — SEP.join with a null component
    emitting null — instead of ~rules x rows Python f-strings (this was the
    emission hot spot at x64)."""
    import numpy as np
    import pyarrow.compute as pcmp

    n = batch.num_rows
    names = set(batch.column_names)
    null_str = pa.nulls(n, pa.string())

    def as_arr(col):
        if isinstance(col, pa.ChunkedArray):
            return (
                col.combine_chunks()
                if col.num_chunks
                else pa.array([], type=col.type)
            )
        return col

    def col_arr(name):
        if name not in names:
            return null_str
        arr = as_arr(batch.column(name))
        if not pa.types.is_string(arr.type):
            # Python str(v), matching the legacy row path exactly: Arrow
            # cast(string) renders bools 'true'/'false' (vs 'True') and
            # floats differently, which would fork key spaces between the
            # two emitters for non-string col:/retain columns.
            arr = pa.array(
                [None if v is None else str(v) for v in arr.to_pylist()],
                pa.string(),
            )
        return arr

    def list_elem(name, idx):
        if name not in names:
            return null_str
        arr = as_arr(batch.column(name))
        if len(arr) == 0 or arr.null_count == len(arr):
            return null_str
        if arr.offset != 0:
            arr = pa.concat_arrays([arr])
        offs = arr.offsets.to_numpy(zero_copy_only=False)
        lens = offs[1:] - offs[:-1]
        valid = arr.is_valid().to_numpy(zero_copy_only=False) & (lens > idx)
        if not valid.any():
            return null_str
        # placeholder 0 is safe: some row is valid, so values is non-empty
        pos = np.where(valid, offs[:-1] + idx, 0)
        vals = arr.values.take(pa.array(pos, pa.int64()))
        return pcmp.if_else(
            pa.array(valid), vals, pa.scalar(None, pa.string())
        )

    pc_arr = col_arr("postcode")
    # outward/inward: split_part(pc, ' ', 1/2) with '' defaults — plain
    # (non-regex) single-space split, exactly str.split(" ")
    sp = as_arr(pcmp.split_pattern(pc_arr, " "))
    if len(sp) and sp.offset != 0:
        sp = pa.concat_arrays([sp])

    def split_part(idx: int):
        if len(sp) == 0:
            return null_str
        offs = sp.offsets.to_numpy(zero_copy_only=False)
        lens = offs[1:] - offs[:-1]
        sp_valid = sp.is_valid().to_numpy(zero_copy_only=False)
        ok = sp_valid & (lens > idx)
        if not ok.any():
            return pcmp.if_else(
                pa.array(sp_valid),
                pa.scalar("", pa.string()),
                pa.scalar(None, pa.string()),
            )
        vals = sp.values.take(
            pa.array(np.where(ok, offs[:-1] + idx, 0), pa.int64())
        )
        return pcmp.if_else(
            pa.array(sp_valid),
            pcmp.if_else(pa.array(ok), vals, pa.scalar("", pa.string())),
            pa.scalar(None, pa.string()),
        )

    out_arr = split_part(0)
    in_arr = split_part(1)

    comp = {
        "n1": col_arr("numeric_token_1"),
        "n2": col_arr("numeric_token_2"),
        "u1": list_elem("unusual_tokens_arr", 0),
        "u2": list_elem("unusual_tokens_arr", 1),
        "vu1": list_elem("very_unusual_tokens_arr", 0),
        "vu2": list_elem("very_unusual_tokens_arr", 1),
        "eu1": list_elem("extremely_unusual_tokens_arr", 0),
        "pc": pc_arr,
        "out": out_arr,
        "in": in_arr,
    }

    def resolve(kn: str):
        if kn.startswith("col:"):
            return col_arr(kn[4:])
        return comp[kn]

    idx_parts: List[np.ndarray] = []
    rule_parts: List[np.ndarray] = []
    key_parts: List[pa.Array] = []
    for rule_id, rule in enumerate(model.blocking_rules):
        key_names = rule.l_keys if side == 0 else rule.r_keys
        cols = [resolve(kn) for kn in key_names]
        joined = pcmp.binary_join_element_wise(
            pa.scalar(str(rule_id), pa.string()), *cols, SEP
        )
        valid = pcmp.is_valid(joined).to_numpy(zero_copy_only=False)
        idx = np.flatnonzero(valid)
        if len(idx) == 0:
            continue
        idx_parts.append(idx)
        rule_parts.append(np.full(len(idx), rule_id, dtype=np.int32))
        key_parts.append(joined.take(pa.array(idx, pa.int64())))
    if not idx_parts:
        return (
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.int32),
            pa.array([], pa.string()),
        )
    return (
        np.concatenate(idx_parts),
        np.concatenate(rule_parts),
        pa.concat_arrays(key_parts) if len(key_parts) > 1 else key_parts[0],
    )


class BlockKeyEmitter:
    """map_batches callable: cleaned rows -> exploded (block_key, side, payload).

    ``hot_keys`` maps block-key -> (k_l, k_r) salt grid. A canonical row
    hashes to one li cell and replicates across the k_r columns; a messy row
    hashes to one rj column and replicates across the k_l rows — every
    (l, r) pair meets in EXACTLY one (li, rj) sub-block, and each sub-block
    holds ≤ threshold rows of any salted side whichever side(s) are hot.
    A bare int factor k is accepted as (k, 1) (canonical-side-only salting).
    """

    def __init__(self, model: MatchModel, side: int, hot_keys_ref=None):
        import ray

        self.model = model
        self.side = side
        hot = hot_keys_ref
        if hot is not None and not isinstance(hot, dict):
            hot = ray.get(hot)
        self.hot_keys: Dict[str, object] = hot or {}

    def emission_lists(self, batch: pa.Table):
        """(take_idx int64 np, rules int32 np, keys pa.StringArray) for one
        batch — the salted emission plan shared by the payload (``__call__``)
        and skinny (``emit_skinny``) representations. Cold keys stay fully
        vectorized; only rows whose key is in the (small) hot set drop to
        the Python salting loop. Emission MULTISET identical to the legacy
        per-row path (property test)."""
        import numpy as np
        import pyarrow.compute as pcmp

        rows_idx, rule_ids, base_keys = batch_rule_keys_arrays(
            batch, self.model, self.side
        )
        hot = self.hot_keys
        if not hot or len(base_keys) == 0:
            return rows_idx, rule_ids, base_keys
        hot_arr = pa.array(list(hot.keys()), pa.string())
        hot_mask = pcmp.is_valid(
            pcmp.index_in(base_keys, value_set=hot_arr)
        ).to_numpy(zero_copy_only=False)
        if not hot_mask.any():
            return rows_idx, rule_ids, base_keys
        cold = np.flatnonzero(~hot_mask)
        uid_col = batch.column("unique_id")
        uid_hash: Dict[int, int] = {}
        x_idx: List[int] = []
        x_rules: List[int] = []
        x_keys: List[str] = []
        for j in np.flatnonzero(hot_mask):
            key = base_keys[j].as_py()
            i = int(rows_idx[j])
            rule_id = int(rule_ids[j])
            salt = hot[key]
            kl, kr = (salt, 1) if isinstance(salt, int) else salt
            if kl <= 1 and kr <= 1:
                x_idx.append(i)
                x_rules.append(rule_id)
                x_keys.append(key)
                continue
            h = uid_hash.get(i)
            if h is None:
                h = _stable_hash(str(uid_col[i].as_py()))
                uid_hash[i] = h
            if self.side == 0:
                li = h % kl
                for rj in range(kr):
                    x_idx.append(i)
                    x_rules.append(rule_id)
                    x_keys.append(f"{key}{SEP}#{li}|{rj}")
            else:
                rj = h % kr
                for li in range(kl):
                    x_idx.append(i)
                    x_rules.append(rule_id)
                    x_keys.append(f"{key}{SEP}#{li}|{rj}")
        take_idx = np.concatenate(
            [rows_idx[cold], np.asarray(x_idx, dtype=np.int64)]
        )
        rules = np.concatenate(
            [rule_ids[cold], np.asarray(x_rules, dtype=np.int32)]
        )
        keys = pa.concat_arrays(
            [
                base_keys.take(pa.array(cold, pa.int64())),
                pa.array(x_keys, pa.string()),
            ]
        )
        return take_idx, rules, keys

    def key_columns(self, keys):
        """Key strings (pa.StringArray or list) -> list of (name, array)
        sort/partition columns, honoring the GRAFT_STRING_KEYS knob."""
        import os

        if os.environ.get("GRAFT_STRING_KEYS") == "1":
            arr = (
                keys
                if isinstance(keys, (pa.Array, pa.ChunkedArray))
                else pa.array(keys, pa.string())
            )
            return [(BLOCK_KEY_COL, arr)]
        k1, k2 = hash_block_keys(keys)
        return [(BLOCK_KEY_COL, k1), (BLOCK_KEY2_COL, k2)]

    def emit_skinny(
        self, batch: pa.Table, global_offset: int, row_map=None
    ) -> pa.Table:
        """Skinny emission: (key columns, rule, side, __src_idx) only — the
        payload stays in the materialized cleaned blocks and is gathered
        inside the scoring kernel by global row index (broadcast-join shape;
        see scored_pairs_raw). ``row_map``: optional array mapping this
        batch's local row positions back to positions in the ORIGINAL block
        (used by the tagged emitter, which filters by side first)."""
        take_idx, rules, keys = self.emission_lists(batch)
        import numpy as np

        loc = np.asarray(take_idx, dtype=np.int64)
        if row_map is not None:
            loc = np.asarray(row_map, dtype=np.int64)[loc] if len(loc) else loc
        cols = {name: arr for name, arr in self.key_columns(keys)}
        cols[RULE_COL] = pa.array(np.asarray(rules, dtype=np.int32))
        cols[SIDE_COL] = pa.array(
            np.full(len(keys), self.side, dtype=np.int8), type=pa.int8()
        )
        cols[SRC_IDX_COL] = pa.array(loc + global_offset, type=pa.int64())
        return pa.table(cols)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        take_idx, rules, keys = self.emission_lists(batch)
        taken = batch.take(pa.array(np.asarray(take_idx), type=pa.int64()))
        for name, arr in self.key_columns(keys):
            taken = taken.append_column(name, arr)
        return taken.append_column(
            RULE_COL, pa.array(np.asarray(rules, dtype=np.int32))
        ).append_column(
            SIDE_COL,
            pa.array(np.full(len(keys), self.side, dtype=np.int8), pa.int8()),
        )


class TaggedBlockKeyEmitter:
    """Single-pass emitter over a TAGGED union of both cleaned sides
    (``SIDE_COL``: 0 = canonical/l, 1 = messy/r). Splits each batch by side
    and delegates to the per-side emitters — one Dataset pass instead of two,
    byte-identical emissions."""

    def __init__(self, model: MatchModel, hot_keys_ref=None):
        self.em0 = BlockKeyEmitter(model, 0, hot_keys_ref)
        self.em1 = BlockKeyEmitter(model, 1, hot_keys_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        side = batch.column(SIDE_COL)
        bare = batch.remove_column(batch.schema.get_field_index(SIDE_COL))
        mask0 = pc.equal(side, 0)
        return pa.concat_tables(
            [
                self.em0(bare.filter(mask0)),
                self.em1(bare.filter(pc.invert(mask0))),
            ]
        ).combine_chunks()

    def emit_skinny(self, batch: pa.Table, global_offset: int) -> pa.Table:
        """Skinny emission over one TAGGED cleaned block: key columns + rule
        + side + global row index into the block layout (``global_offset`` =
        first row's global position). Per-side local positions are mapped
        back through the side filter so ``__src_idx`` always indexes the
        ORIGINAL tagged block."""
        import numpy as np
        import pyarrow.compute as pc

        side = batch.column(SIDE_COL)
        bare = batch.remove_column(batch.schema.get_field_index(SIDE_COL))
        m0 = np.asarray(
            pc.equal(side, 0).to_numpy(zero_copy_only=False), dtype=bool
        )
        pos0 = np.nonzero(m0)[0]
        pos1 = np.nonzero(~m0)[0]
        parts = [
            self.em0.emit_skinny(
                bare.filter(pa.array(m0)), global_offset, row_map=pos0
            ),
            self.em1.emit_skinny(
                bare.filter(pa.array(~m0)), global_offset, row_map=pos1
            ),
        ]
        return pa.concat_tables(parts).combine_chunks()


def compute_hot_keys(
    cleaned_l,
    model: MatchModel,
    salt_threshold: int,
    cleaned_r=None,
    tagged: bool = False,
) -> Dict[str, Tuple[int, int]]:
    """Frequency pre-pass: block keys with more than ``salt_threshold`` rows
    on either side get a (k_l, k_r) salt grid, k = ceil(n / salt_threshold)
    per hot side. Only the hot tail is ever collected to the driver.

    With ``cleaned_r`` omitted only the canonical side is counted
    (k_r fixed at 1) — the pre-round-2 behavior. With ``tagged=True``
    ``cleaned_l`` is a tagged union carrying ``SIDE_COL`` and both sides are
    counted in ONE pass."""

    import math as _math

    import ray

    # No shuffle: per-batch Counter + pigeonhole floor filter + tiny driver
    # combine. A key with global count >= T has per-batch count >= T/nb in at
    # least one batch (nb = batch count), so emitting only per-batch counts
    # >= T//nb finds every hot key while the cold tail (the overwhelming
    # majority) never leaves the tasks. The floor is clamped to >= 2 so the
    # emission stays tiny even when nb >= T, which bounds the blind spot: a
    # key spread at < floor occurrences in EVERY batch (total < 2*nb) can be
    # missed, and a found key's collected sum may undercount by < floor*nb.
    # Both only shrink/skip the salt grid — salting is a performance hint:
    # results are bit-identical at any grid (salting-coverage tests) and
    # oversized blocks still score in bounded-memory tiles.
    BATCH = 16384

    def batches_of(ds) -> int:
        n_rows = ds.count()
        try:
            n_blocks = ds.num_blocks()
        except Exception:
            n_blocks = 1
        return max(1, _math.ceil(n_rows / BATCH), n_blocks)

    def side_counts(ds, side: int):
        nb = batches_of(ds)
        floor_n = max(2, salt_threshold // max(1, nb))

        def emit(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pcmp

            _rows, _rules, keys = batch_rule_keys_arrays(batch, model, side)
            vc = pcmp.value_counts(keys)
            hot = vc.filter(
                pcmp.greater_equal(vc.field("counts"), floor_n)
            )
            return pa.table(
                {
                    "key": hot.field("values"),
                    "side": pa.array([side] * len(hot), type=pa.int8()),
                    "n": hot.field("counts").cast(pa.int64()),
                }
            )

        return ds.map_batches(emit, batch_format="pyarrow", batch_size=BATCH)

    if tagged:
        # tagged input is already materialized: count with RAW tasks over the
        # block refs — no Dataset job (its fixed per-job cost is CPU-count
        # invariant and would land straight in the Amdahl serial term)
        refs = cleaned_l.to_arrow_refs()
        nb = max(1, len(refs))
        floor_n = max(2, salt_threshold // nb)

        @ray.remote
        def count_block(tbl: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            if tbl.num_rows == 0 or SIDE_COL not in tbl.schema.names:
                return pa.table(
                    {
                        "key": pa.array([], pa.string()),
                        "side": pa.array([], pa.int8()),
                        "n": pa.array([], pa.int64()),
                    }
                )
            side_arr = tbl.column(SIDE_COL)
            bare = tbl.remove_column(tbl.schema.get_field_index(SIDE_COL))
            mask0 = pc.equal(side_arr, 0)
            parts = []
            for side, sub in (
                (0, bare.filter(mask0)),
                (1, bare.filter(pc.invert(mask0))),
            ):
                _rows, _rules, keys = batch_rule_keys_arrays(sub, model, side)
                vc = pc.value_counts(keys)
                hot = vc.filter(pc.greater_equal(vc.field("counts"), floor_n))
                parts.append(
                    pa.table(
                        {
                            "key": hot.field("values"),
                            "side": pa.array([side] * len(hot), pa.int8()),
                            "n": hot.field("counts").cast(pa.int64()),
                        }
                    )
                )
            return pa.concat_tables(parts)

        part_tables = ray.get([count_block.remote(r) for r in refs])
    else:
        parts = side_counts(cleaned_l, 0)
        if cleaned_r is not None:
            parts = parts.union(side_counts(cleaned_r, 1))
        part_tables = ray.get(parts.to_arrow_refs())

    from collections import Counter

    totals: Dict[int, Counter] = {0: Counter(), 1: Counter()}
    for t in part_tables:
        if "key" not in t.schema.names:
            continue  # empty passthrough block
        for k, s, n in zip(
            t.column("key").to_pylist(),
            t.column("side").to_pylist(),
            t.column("n").to_pylist(),
        ):
            totals[s][k] += n

    out: Dict[str, Tuple[int, int]] = {}
    for side in (0, 1):
        for key, n in totals[side].items():
            if n <= salt_threshold:
                continue
            k = _math.ceil(n / salt_threshold)
            kl, kr = out.get(key, (1, 1))
            if side == 0:
                kl = k
            else:
                kr = k
            out[key] = (kl, kr)
    return out
