"""GPT-style sequence packing: concatenate a deterministically shuffled
token stream and split it into fixed-capacity training windows.

The op every LM training-data pipeline runs last: documents are laid out
end-to-end in a deterministic corpus order and the stream is cut every
``capacity`` tokens; a document that straddles a cut contributes one
SEGMENT to each window it overlaps.  Output is the packing manifest —
``(seq_id, doc_id, doc_off, seg_len, win_off)`` — from which a trainer
materializes windows by slicing each doc's tokens at ``doc_off``.

No counterpart in the reference (RobinL/uk_address_matcher has no
training-data surface); the corpus order reuses this repo's deterministic
md5 ``sample_key`` convention (stages/sampling.py) so the "shuffled"
layout is reproducible on any cluster size, block order or resume.

Scale shape — a distributed EXCLUSIVE PREFIX SUM, not a sort:

* every row's window assignment needs the total token count of all rows
  ranked before it.  A global ``Dataset.sort`` + driver scan would
  serialize; instead the uniform md5 key space is RANGE-bucketed by its
  leading 16 bits (order-preserving: equal prefixes share a bucket, the
  bucket id is monotone in the prefix), so
* pass 1 computes per-bucket token sums batch-locally (``group_by`` per
  batch bounds the exchange to <= num_buckets rows per block) and the
  driver folds them into num_buckets exclusive base offsets — constant
  driver state, no row-level collect;
* pass 2 is one ``grouped_map`` over complete buckets: sort the bucket's
  rows by (sample_key, id), local cumsum + the bucket's broadcast base,
  and vectorized segment emission (numpy repeat over window spans).

The only row-level exchange is the grouped_map's range partition of the
SKINNY keyed projection (id, token_count, sample_key, bucket ~ 40 B/row);
document text never moves.
"""

from typing import Optional

import numpy as np
import pyarrow as pa

from uk_address_matcher_ray.stages.sampling import sample_key

_PREFIX_BITS = 16  # bucket on the leading 4 hex chars of the md5 key


def _bucket_of(keys, num_buckets: int) -> np.ndarray:
    """Order-preserving bucket ids from the leading 16 bits of the md5
    sample_key (uniform by construction)."""
    pref = np.array([int(k[:4], 16) for k in keys], dtype=np.int64)
    return pref * num_buckets // (1 << _PREFIX_BITS)


def _pack_kernel(
    tbl: pa.Table,
    capacity: int,
    bases: dict,
    id_col: str,
    tokens_col: str,
    id_type: pa.DataType,
) -> pa.Table:
    """Per-bucket kernel over COMPLETE buckets (possibly several per call):
    order rows by (bucket, sample_key, id), add each bucket's exclusive
    base to the local cumsum, emit one row per (window x doc) overlap."""
    import pyarrow.compute as pc

    out_schema = pa.schema(
        [
            pa.field("seq_id", pa.int64()),
            pa.field(id_col, id_type),
            pa.field("doc_off", pa.int64()),
            pa.field("seg_len", pa.int64()),
            pa.field("win_off", pa.int64()),
        ]
    )
    if tbl.num_rows == 0:
        return out_schema.empty_table()
    order = pc.sort_indices(
        tbl,
        sort_keys=[
            ("bucket", "ascending"),
            ("sample_key", "ascending"),
            (id_col, "ascending"),
        ],
    )
    s = tbl.take(order)
    toks = s.column(tokens_col).to_numpy(zero_copy_only=False).astype(np.int64)
    bks = s.column("bucket").to_numpy(zero_copy_only=False)
    n = len(toks)
    # per-bucket exclusive prefix: cumsum minus the running sum at each
    # bucket's first row, plus the bucket's global base
    newg = np.empty(n, dtype=bool)
    newg[0] = True
    newg[1:] = bks[1:] != bks[:-1]
    cs = np.cumsum(toks)
    base_at_start = np.where(newg, cs - toks, 0)
    local0 = np.maximum.accumulate(np.where(newg, base_at_start, 0))
    gbase = np.array([bases.get(int(b), 0) for b in bks], dtype=np.int64)
    start = gbase + (cs - toks) - local0
    end = start + toks

    keep = toks > 0
    start, end, toks_k = start[keep], end[keep], toks[keep]
    ids = s.column(id_col).filter(pa.array(keep))
    if len(toks_k) == 0:
        return out_schema.empty_table()

    k0 = start // capacity
    k1 = (end - 1) // capacity
    nseg = (k1 - k0 + 1).astype(np.int64)
    total = int(nseg.sum())
    rep = np.repeat(np.arange(len(nseg)), nseg)
    seg_base = np.concatenate([[0], np.cumsum(nseg)])[:-1]
    j = np.arange(total, dtype=np.int64) - np.repeat(seg_base, nseg)
    k = k0[rep] + j
    g0 = np.maximum(k * capacity, start[rep])
    g1 = np.minimum((k + 1) * capacity, end[rep])
    return pa.table(
        {
            "seq_id": pa.array(k, pa.int64()),
            id_col: ids.take(pa.array(rep)),
            "doc_off": pa.array(g0 - start[rep], pa.int64()),
            "seg_len": pa.array(g1 - g0, pa.int64()),
            "win_off": pa.array(g0 - k * capacity, pa.int64()),
        }
    )


def pack_sequences(
    ds,
    capacity: int,
    id_col: str = "doc_id",
    tokens_col: str = "token_count",
    seed: int = 0,
    num_buckets: Optional[int] = None,
):
    """Pack ``(id, token_count)`` rows into fixed-``capacity`` windows.

    Corpus order is (md5 ``sample_key``, id) — the deterministic shuffle.
    Returns the segment manifest Dataset ``(seq_id, id, doc_off, seg_len,
    win_off)``: window ``seq_id`` holds tokens ``doc_off .. doc_off +
    seg_len`` of ``id`` at window offset ``win_off``.  Zero-token docs
    emit nothing.  The final window may be partial (trainer pads).
    """
    import ray

    from uk_address_matcher_ray.stages.grouped import grouped_map

    if capacity <= 0:
        raise ValueError("capacity must be positive")
    sch = ds.schema()
    id_type = dict(zip(sch.names, sch.types))[id_col]

    if num_buckets is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_buckets = max(16, 4 * cpus)
    P = int(num_buckets)

    def keyed_batch(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        keys = [sample_key(i, seed) for i in ids]
        return pa.table(
            {
                id_col: batch.column(id_col),
                tokens_col: batch.column(tokens_col).cast(pa.int64()),
                "sample_key": pa.array(keys, pa.string()),
                "bucket": pa.array(_bucket_of(keys, P), pa.int64()),
            }
        )

    keyed = (
        ds.select_columns([id_col, tokens_col])
        .map_batches(keyed_batch, batch_format="pyarrow")
        .materialize()  # skinny 40 B/row projection, consumed twice
    )

    # pass 1: per-bucket sums (<= P rows leave each batch), driver fold to
    # P exclusive base offsets
    def bucket_sums(batch: pa.Table) -> pa.Table:
        return batch.group_by("bucket").aggregate([(tokens_col, "sum")])

    sums = np.zeros(P, dtype=np.int64)
    for part in keyed.map_batches(bucket_sums, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        b = part.column("bucket").to_numpy(zero_copy_only=False)
        v = part.column(f"{tokens_col}_sum").to_numpy(zero_copy_only=False)
        np.add.at(sums, b, v)
    bases = {int(i): int(v) for i, v in enumerate(np.cumsum(sums) - sums)}

    out_schema = pa.schema(
        [
            pa.field("seq_id", pa.int64()),
            pa.field(id_col, id_type),
            pa.field("doc_off", pa.int64()),
            pa.field("seg_len", pa.int64()),
            pa.field("win_off", pa.int64()),
        ]
    )
    return grouped_map(
        keyed,
        "bucket",
        None,
        out_schema,
        fn_table=lambda t: _pack_kernel(
            t, capacity, bases, id_col, tokens_col, id_type
        ),
    )


def pack_sequences_sql(
    capacity: int,
    id_col: str = "doc_id",
    tokens_expr: str = "token_count",
    seed: int = 0,
    table: str = "documents",
) -> str:
    """DuckDB mirror: identical md5 order, exclusive-prefix window cumsum,
    ``generate_series`` over each doc's overlapped window ids."""
    return f"""
WITH keyed AS (
  SELECT {id_col}, {tokens_expr} AS tok,
         substr(md5('{seed}:' || CAST({id_col} AS VARCHAR)), 1, 8)
             AS sample_key
  FROM {table}
  WHERE {tokens_expr} > 0
),
c AS (
  SELECT {id_col}, tok,
         COALESCE(SUM(tok) OVER (ORDER BY sample_key, {id_col}
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS strt
  FROM keyed
),
seg AS (
  SELECT {id_col}, tok, strt,
         unnest(generate_series(
             CAST(strt // {capacity} AS BIGINT),
             CAST((strt + tok - 1) // {capacity} AS BIGINT))) AS seq_id
  FROM c
)
SELECT seq_id, {id_col},
       CAST(GREATEST(seq_id * {capacity}, strt) - strt AS BIGINT) AS doc_off,
       CAST(LEAST((seq_id + 1) * {capacity}, strt + tok)
           - GREATEST(seq_id * {capacity}, strt) AS BIGINT) AS seg_len,
       CAST(GREATEST(seq_id * {capacity}, strt) - seq_id * {capacity}
           AS BIGINT) AS win_off
FROM seg
"""
