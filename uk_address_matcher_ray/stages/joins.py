"""Distributed temporal joins over ray.data Datasets.

``asof_join``: for every left row (key, ts), attach the right row with the
greatest right ts <= left ts for the same key — DuckDB's
``l ASOF JOIN r ON l.key = r.key AND l.ts >= r.ts`` (inner). Ray Data has
no asof primitive; this composes one tagged union + ONE key-hash exchange
(stages/grouped.grouped_map — complete key groups per task, no Dataset
all-to-all job below the row gate, global sort path above it) + a fully
vectorized per-partition kernel (one lexsort + one maximum.accumulate).

Partitioning assumption (documented per the driver brief): all rows of one
key co-locate in a task — the same contract as groupby().map_groups; a
single key's rows must fit in a worker's heap. Keys are hash-distributed,
so skew means one HOT key, not one hot partition; salting does not apply
(the carry-forward needs the whole key timeline).

Tie semantics: among right rows sharing the maximal ts, the kernel keeps
the LAST under a (ts, tiebreak...) lexsort, deterministically when
``right_tiebreak`` names a unique column. DuckDB leaves the tied pick
unspecified — oracle queries should project tie-invariant outputs (the
matched ts itself, deltas against it) unless right keys are unique per ts.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import pyarrow as pa

_SIDE = "__asof_side"


def _conform(ds, schema: pa.Schema, side: int):
    """Project a side onto the union schema (missing columns -> nulls)."""

    def conv(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = []
        for f in schema:
            if f.name == _SIDE:
                cols.append(pa.array([side] * n, pa.int8()))
            elif f.name in batch.column_names:
                cols.append(batch.column(f.name).cast(f.type).combine_chunks())
            else:
                cols.append(pa.nulls(n, f.type))
        return pa.Table.from_arrays(cols, schema=schema)

    return ds.map_batches(conv, batch_format="pyarrow")


def _asof_union(
    left_ds,
    right_ds,
    key: str,
    ts: str,
    right_cols: Sequence[str],
    suffix: str,
    right_tiebreak: Optional[str],
):
    """Shared tagged-union construction for both asof paths ->
    (union, out_schema, priv, carry, left_names)."""
    left_schema = left_ds.schema()
    right_schema = right_ds.schema()
    l_fields = {n: t for n, t in zip(left_schema.names, left_schema.types)}
    r_fields = {n: t for n, t in zip(right_schema.names, right_schema.types)}
    if key not in l_fields or key not in r_fields:
        raise ValueError(f"key column {key!r} missing from a side")
    if ts not in l_fields or ts not in r_fields:
        raise ValueError(f"ts column {ts!r} missing from a side")

    carry: List[str] = [ts] + [c for c in right_cols if c != ts]
    if right_tiebreak and right_tiebreak not in carry:
        carry.append(right_tiebreak)

    # union schema: key, ts, side, every left column, every carried right
    # column under a private name (avoids collisions with left names)
    fields = [pa.field(key, l_fields[key]), pa.field(ts, l_fields[ts])]
    fields.append(pa.field(_SIDE, pa.int8()))
    for n in left_schema.names:
        if n not in (key, ts):
            fields.append(pa.field(n, l_fields[n]))
    priv = {c: f"__r_{c}" for c in carry}
    for c in carry:
        fields.append(pa.field(priv[c], r_fields[c]))
    union_schema = pa.schema(fields)

    # right side: key/ts for ordering + carried values under private names
    def conv_right(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = []
        for f in union_schema:
            if f.name == _SIDE:
                cols.append(pa.array([0] * n, pa.int8()))
            elif f.name in (key, ts):
                cols.append(batch.column(f.name).cast(f.type).combine_chunks())
            elif f.name.startswith("__r_") and f.name[4:] in batch.column_names:
                cols.append(
                    batch.column(f.name[4:]).cast(f.type).combine_chunks()
                )
            else:
                cols.append(pa.nulls(n, f.type))
        return pa.Table.from_arrays(cols, schema=union_schema)

    tagged_left = _conform(left_ds, union_schema, 1)
    tagged_right = right_ds.map_batches(conv_right, batch_format="pyarrow")
    union = tagged_left.union(tagged_right)

    out_fields = [pa.field(n, t) for n, t in zip(left_schema.names, left_schema.types)]
    out_fields += [pa.field(f"{c}{suffix}", r_fields[c]) for c in carry]
    out_schema = pa.schema(out_fields)
    return union, out_schema, priv, carry, list(left_schema.names)


def asof_join(
    left_ds,
    right_ds,
    *,
    key: str,
    ts: str,
    right_cols: Sequence[str],
    suffix: str = "_r",
    right_tiebreak: Optional[str] = None,
    num_partitions: Optional[int] = None,
):
    """-> Dataset of every left row that has an as-of match, with
    ``right_cols`` (and the matched right ``ts``) appended as
    ``<name><suffix>`` columns. Inner semantics (unmatched left rows drop),
    matching DuckDB's default ASOF JOIN."""
    union, out_schema, priv, carry, left_names = _asof_union(
        left_ds, right_ds, key, ts, right_cols, suffix, right_tiebreak
    )

    def kernel(tbl: pa.Table) -> pa.Table:
        n = tbl.num_rows
        if n == 0:
            return out_schema.empty_table()
        kcol = tbl.column(key)
        karr = (
            kcol.to_numpy(zero_copy_only=False)
            if pa.types.is_integer(kcol.type)
            else np.asarray(kcol.to_pylist(), dtype=object)
        )
        tarr = tbl.column(ts).cast(pa.int64()).to_numpy(zero_copy_only=False)
        side = tbl.column(_SIDE).to_numpy(zero_copy_only=False)
        if right_tiebreak:
            tb = (
                tbl.column(priv[right_tiebreak])
                .cast(pa.int64())
                .to_numpy(zero_copy_only=False)
            )
            tb = np.where(side == 0, np.nan_to_num(tb, nan=0), 0)
            order = np.lexsort((side, tb, tarr, karr))
        else:
            order = np.lexsort((side, tarr, karr))
        k_s, t_s, side_s = karr[order], tarr[order], side[order]
        # carry the latest right row index forward within the sort
        carry_idx = np.maximum.accumulate(
            np.where(side_s == 0, np.arange(n, dtype=np.int64), -1)
        )
        is_left = side_s == 1
        valid = is_left & (carry_idx >= 0)
        # a carried index from a previous key has a different key value
        lv = np.flatnonzero(valid)
        if len(lv):
            same_key = k_s[carry_idx[lv]] == k_s[lv]
            lv = lv[same_key]
        if len(lv) == 0:
            return out_schema.empty_table()
        left_orig = pa.array(order[lv], pa.int64())
        right_orig = pa.array(order[carry_idx[lv]], pa.int64())
        cols = [tbl.column(nm).take(left_orig) for nm in left_names]
        cols += [tbl.column(priv[c]).take(right_orig) for c in carry]
        return pa.Table.from_arrays(
            [c.combine_chunks() for c in cols], schema=out_schema
        )

    from uk_address_matcher_ray.stages.grouped import grouped_map

    return grouped_map(
        union, key, None, out_schema, fn_table=kernel,
        num_partitions=num_partitions,
    )


def asof_join_chunked(
    left_ds,
    right_ds,
    *,
    key: str,
    ts: str,
    right_cols: Sequence[str],
    suffix: str = "_r",
    right_tiebreak: Optional[str] = None,
):
    """Hot-key-safe ``asof_join``: identical output, NO complete-group
    contract — one key's timeline may span any number of blocks.

    The as-of carry-forward is a prefix scan whose only cross-block state
    is the LAST RIGHT ROW seen: global range sort of the tagged union by
    (key, ts[, tiebreak], side) (right rows sort before equal-position
    left rows, exactly the monolithic kernel's lexsort), per-block local
    carry-forward, then an O(blocks) driver walk carrying one right row's
    values across each boundary; a second task wave joins each block's
    leading unmatched lefts (the only rows whose match can live in an
    earlier block — keys are globally sorted, so any OTHER key run
    starting mid-block genuinely has no earlier right) against the
    carried row. Tie caveat unchanged: with duplicate (key, ts, tiebreak)
    right rows the tied pick is unspecified across blocks, as in DuckDB —
    pass a unique ``right_tiebreak`` for determinism."""
    import ray

    union, out_schema, priv, carry, left_names = _asof_union(
        left_ds, right_ds, key, ts, right_cols, suffix, right_tiebreak
    )
    tb_col = "__tb_filled"

    def add_tb(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if right_tiebreak:
            tb = pc.if_else(
                pc.equal(batch.column(_SIDE), pa.scalar(0, pa.int8())),
                pc.fill_null(
                    batch.column(priv[right_tiebreak]).cast(pa.int64()), 0
                ),
                pa.scalar(0, pa.int64()),
            )
        else:
            tb = pa.array([0] * batch.num_rows, pa.int64())
        return batch.append_column(tb_col, tb)

    sorted_ds = union.map_batches(add_tb, batch_format="pyarrow").sort(
        [key, ts, tb_col, _SIDE]
    )
    refs = sorted_ds.to_arrow_refs()

    @ray.remote(num_returns=3)
    def block_asof(tbl: pa.Table):
        """-> (local joined out, prefix-left union rows, meta)."""
        n = tbl.num_rows
        if n == 0:
            return out_schema.empty_table(), None, None
        kcol = tbl.column(key)
        karr = (
            kcol.to_numpy(zero_copy_only=False)
            if pa.types.is_integer(kcol.type)
            else np.asarray(kcol.to_pylist(), dtype=object)
        )
        tarr = tbl.column(ts).cast(pa.int64()).to_numpy(zero_copy_only=False)
        side = tbl.column(_SIDE).to_numpy(zero_copy_only=False)
        tb = tbl.column(tb_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((side, tb, tarr, karr))
        k_s, side_s = karr[order], side[order]
        carry_idx = np.maximum.accumulate(
            np.where(side_s == 0, np.arange(n, dtype=np.int64), -1)
        )
        is_left = side_s == 1
        matched = is_left & (carry_idx >= 0)
        lv = np.flatnonzero(matched)
        if len(lv):
            same_key = k_s[carry_idx[lv]] == k_s[lv]
            lv = lv[same_key]
        if len(lv):
            left_orig = pa.array(order[lv], pa.int64())
            right_orig = pa.array(order[carry_idx[lv]], pa.int64())
            cols = [tbl.column(nm).take(left_orig) for nm in left_names]
            cols += [tbl.column(priv[c]).take(right_orig) for c in carry]
            local = pa.Table.from_arrays(
                [c.combine_chunks() for c in cols], schema=out_schema
            )
        else:
            local = out_schema.empty_table()
        # leading unmatched lefts: lefts of the FIRST key with no earlier
        # same-key right in this block
        fk = k_s[0]
        lead = np.flatnonzero(
            is_left
            & (k_s == fk)
            & ((carry_idx < 0) | (k_s[np.maximum(carry_idx, 0)] != fk))
        )
        prefix = (
            tbl.take(pa.array(order[lead], pa.int64()))
            if len(lead)
            else None
        )
        # last right row of the LAST key (the carry into the next block)
        lk = k_s[-1]
        rmask = np.flatnonzero((~is_left) & (k_s == lk))
        last_right = None
        if len(rmask):
            j = int(order[rmask[-1]])
            last_right = {c: tbl.column(priv[c])[j].as_py() for c in carry}
        meta = {
            "first_key": fk if not isinstance(fk, np.generic) else fk.item(),
            "last_key": lk if not isinstance(lk, np.generic) else lk.item(),
            "last_right": last_right,
        }
        return local, prefix, meta

    local_refs, prefix_refs, meta_refs = [], [], []
    for r in refs:
        a, b, m = block_asof.remote(r)
        local_refs.append(a)
        prefix_refs.append(b)
        meta_refs.append(m)
    metas = ray.get(meta_refs)

    # O(blocks) boundary walk: one carried right row per boundary
    plans = []
    open_key = None
    open_row = None
    for meta in metas:
        if meta is None:
            plans.append(None)
            continue
        if open_key is not None and open_key == meta["first_key"] and open_row:
            plans.append(dict(open_row))
        else:
            plans.append(None)
        if meta["last_right"] is not None:
            open_key, open_row = meta["last_key"], meta["last_right"]
        elif open_key != meta["last_key"]:
            open_key, open_row = meta["last_key"], None

    @ray.remote
    def fixup(prefix, carried: dict) -> pa.Table:
        if prefix is None:
            return out_schema.empty_table()
        n = prefix.num_rows
        cols = [prefix.column(nm).combine_chunks() for nm in left_names]
        for c in carry:
            typ = out_schema.field(f"{c}{suffix}").type
            cols.append(pa.array([carried[c]] * n, typ))
        return pa.Table.from_arrays(cols, schema=out_schema)

    out_refs = list(local_refs)
    for pref, plan in zip(prefix_refs, plans):
        if plan is not None:
            out_refs.append(fixup.remote(pref, plan))
    return ray.data.from_arrow_refs(out_refs)


def range_join(
    left_ds,
    right_ds,
    *,
    key: str,
    ts: str,
    window: int,
    right_cols: Sequence[str],
    suffix: str = "_r",
    num_partitions: Optional[int] = None,
):
    """Time-window join: every (left, right) pair with equal ``key`` and
    ``|left.ts - right.ts| <= window`` (inclusive; ts compared as int64 —
    microseconds for Arrow timestamps, ``window`` in the same unit).

    Interval-join co-location: each RIGHT row lands in ONE time bucket of
    width ``window``; each LEFT row replicates into its bucket ± 1, so any
    qualifying pair co-occurs in the right row's bucket EXACTLY once (no
    dedup pass). The exchange key is a 64-bit mix of (key-hash, bucket) —
    purely a distribution key: group boundaries inside the kernel use the
    real (key, bucket) columns, so hash collisions cannot cross-join. Hot
    keys spread across their time buckets, unlike asof_join's
    whole-timeline co-location."""
    left_schema = left_ds.schema()
    right_schema = right_ds.schema()
    l_fields = dict(zip(left_schema.names, left_schema.types))
    r_fields = dict(zip(right_schema.names, right_schema.types))
    carry: List[str] = [ts] + [c for c in right_cols if c != ts]
    priv = {c: f"__r_{c}" for c in carry}

    fields = [
        pa.field("__kb", pa.uint64()),
        pa.field("__bucket", pa.int64()),
        pa.field(key, l_fields[key]),
        pa.field(_SIDE, pa.int8()),
        pa.field("__ts", pa.int64()),
    ]
    for n in left_schema.names:
        if n != key:
            fields.append(pa.field(n, l_fields[n]))
    for c in carry:
        fields.append(pa.field(priv[c], r_fields[c]))
    union_schema = pa.schema(fields)
    left_names = list(left_schema.names)

    def key_hash(batch: pa.Table):
        col = batch.column(key)
        if pa.types.is_integer(col.type):
            return col.to_numpy(zero_copy_only=False).astype(np.uint64)
        import polars as pl

        return pl.Series("k", col.to_pylist(), dtype=pl.Utf8).hash(seed=0).to_numpy()

    def conform(batch: pa.Table, side: int, buckets: np.ndarray) -> pa.Table:
        n = batch.num_rows
        kh = key_hash(batch)
        kb = kh * np.uint64(0x9E3779B97F4A7C15) + buckets.astype(np.uint64)
        tarr = batch.column(ts).cast(pa.int64())
        cols = []
        for f in union_schema:
            if f.name == "__kb":
                cols.append(pa.array(kb, pa.uint64()))
            elif f.name == "__bucket":
                cols.append(pa.array(buckets, pa.int64()))
            elif f.name == _SIDE:
                cols.append(pa.array([side] * n, pa.int8()))
            elif f.name == "__ts":
                cols.append(tarr.combine_chunks())
            elif f.name == key:
                cols.append(batch.column(key).cast(f.type).combine_chunks())
            elif side == 1 and f.name in batch.column_names:
                cols.append(batch.column(f.name).cast(f.type).combine_chunks())
            elif side == 0 and f.name.startswith("__r_") and f.name[4:] in batch.column_names:
                cols.append(batch.column(f.name[4:]).cast(f.type).combine_chunks())
            else:
                cols.append(pa.nulls(n, f.type))
        return pa.Table.from_arrays(cols, schema=union_schema)

    def conv_right(batch: pa.Table) -> pa.Table:
        t = batch.column(ts).cast(pa.int64()).to_numpy(zero_copy_only=False)
        return conform(batch, 0, t // window)

    def conv_left(batch: pa.Table) -> pa.Table:
        t = batch.column(ts).cast(pa.int64()).to_numpy(zero_copy_only=False)
        b0 = t // window
        reps = [conform(batch, 1, b0 + d) for d in (-1, 0, 1)]
        return pa.concat_tables(reps).combine_chunks()

    union = left_ds.map_batches(conv_left, batch_format="pyarrow").union(
        right_ds.map_batches(conv_right, batch_format="pyarrow")
    )

    out_fields = [pa.field(n, l_fields[n]) for n in left_names]
    out_fields += [pa.field(f"{c}{suffix}", r_fields[c]) for c in carry]
    out_schema = pa.schema(out_fields)

    def kernel(tbl: pa.Table) -> pa.Table:
        n = tbl.num_rows
        if n == 0:
            return out_schema.empty_table()
        kcol = tbl.column(key)
        karr = (
            kcol.to_numpy(zero_copy_only=False)
            if pa.types.is_integer(kcol.type)
            else np.asarray(kcol.to_pylist(), dtype=object)
        )
        barr = tbl.column("__bucket").to_numpy(zero_copy_only=False)
        tarr = tbl.column("__ts").to_numpy(zero_copy_only=False)
        side = tbl.column(_SIDE).to_numpy(zero_copy_only=False)
        order = np.lexsort((tarr, side, barr, karr))
        k_s, b_s, t_s, side_s = karr[order], barr[order], tarr[order], side[order]
        # group boundaries on the REAL (key, bucket) pair
        bound = np.ones(n, dtype=bool)
        bound[1:] = (k_s[1:] != k_s[:-1]) | (b_s[1:] != b_s[:-1])
        starts = np.flatnonzero(bound)
        ends = np.append(starts[1:], n)
        li_parts, ri_parts = [], []
        for s, e in zip(starts, ends):
            sl = side_s[s:e]
            # rights sort before lefts (side 0 first), each sorted by ts
            n_r = int(np.searchsorted(sl, 1))
            if n_r == 0 or n_r == e - s:
                continue
            rts = t_s[s : s + n_r]
            lts = t_s[s + n_r : e]
            lo = np.searchsorted(rts, lts - window, side="left")
            hi = np.searchsorted(rts, lts + window, side="right")
            cnt = hi - lo
            tot = int(cnt.sum())
            if tot == 0:
                continue
            l_rep = np.repeat(np.arange(len(lts), dtype=np.int64), cnt)
            within = np.arange(tot, dtype=np.int64) - np.repeat(
                np.cumsum(cnt) - cnt, cnt
            )
            r_idx = np.repeat(lo, cnt) + within
            li_parts.append(order[s + n_r + l_rep])
            ri_parts.append(order[s + r_idx])
        if not li_parts:
            return out_schema.empty_table()
        li = pa.array(np.concatenate(li_parts), pa.int64())
        ri = pa.array(np.concatenate(ri_parts), pa.int64())
        cols = [tbl.column(nm).take(li) for nm in left_names]
        cols += [tbl.column(priv[c]).take(ri) for c in carry]
        return pa.Table.from_arrays(
            [c.combine_chunks() for c in cols], schema=out_schema
        )

    from uk_address_matcher_ray.stages.grouped import grouped_map

    return grouped_map(
        union, "__kb", None, out_schema, fn_table=kernel,
        num_partitions=num_partitions,
    )
