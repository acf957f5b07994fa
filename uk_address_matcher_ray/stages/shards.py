"""Deterministic training-data shuffle + shard assignment.

The export stage every LLM training pipeline ends with: order the corpus
pseudo-randomly (so each training shard is an unbiased corpus sample) and
assign each row a shard and a position inside it. At 100 TB a
``random_shuffle`` (full random all-to-all, non-reproducible) is the wrong
tool; the production shape is HASH sharding on a seeded deterministic
key — reproducible end-to-end, resumable per shard, and one bounded
exchange.

Contract (mirrored by ``shuffle_shards_sql``):

* ``sample_key = md5(f"{seed}:{id}")[:8]`` — the repo-wide sampling key
  (stages/sampling.py), uniform and engine/SQL-identical;
* ``shard = uint32(sample_key) % num_shards``;
* ``pos`` = rank within the shard ordered by ``(sample_key, id)`` —
  fully deterministic (ids are unique).

Scale shape: one hash exchange keyed on ``shard`` (fixed-width key), the
per-shard rank kernel sorts complete shards. Partitioning assumption:
ONE SHARD fits a task — the operator's knob is ``num_shards``, which the
caller sizes so a shard is a few GB (65536 shards over 100 TB ≈ 1.5 GB
each). If shards must outgrow tasks, rank with the distributed exclusive
prefix-sum used by ``pack_sequences`` (stages/packing.py) instead of the
in-task sort; the assignment columns are identical.
"""

from __future__ import annotations

import pyarrow as pa

from uk_address_matcher_ray.stages.sampling import sample_key


def shuffle_shards(ds, id_col: str = "doc_id", num_shards: int = 16, seed: int = 0):
    """-> Dataset(id_col, sample_key, shard:int64, pos:int64)."""
    import numpy as np

    from uk_address_matcher_ray.stages.grouped import grouped_map

    id_type = dict(zip(ds.schema().names, ds.schema().types))[id_col]
    out_schema = pa.schema(
        [
            pa.field(id_col, id_type),
            pa.field("sample_key", pa.string()),
            pa.field("shard", pa.int64()),
            pa.field("pos", pa.int64()),
        ]
    )

    def key_batch(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        keys = [sample_key(i, seed) for i in ids]
        shards = [int(k, 16) % num_shards for k in keys]
        return pa.table(
            {
                id_col: batch.column(id_col),
                "sample_key": pa.array(keys, pa.string()),
                "shard": pa.array(shards, pa.int64()),
            }
        )

    keyed = ds.select_columns([id_col]).map_batches(
        key_batch, batch_format="pyarrow"
    )

    def rank_kernel(tbl: pa.Table) -> pa.Table:
        # complete shard groups per invocation: sort, then per-run ranks
        s = tbl.sort_by(
            [
                ("shard", "ascending"),
                ("sample_key", "ascending"),
                (id_col, "ascending"),
            ]
        )
        shards = s.column("shard").to_numpy(zero_copy_only=False)
        n = len(shards)
        idx = np.arange(n, dtype=np.int64)
        run_start = np.ones(n, dtype=bool)
        run_start[1:] = shards[1:] != shards[:-1]
        pos = idx - np.maximum.accumulate(np.where(run_start, idx, 0))
        return pa.table(
            {
                id_col: s.column(id_col),
                "sample_key": s.column("sample_key"),
                "shard": s.column("shard"),
                "pos": pa.array(pos),
            },
            schema=out_schema,
        )

    return grouped_map(keyed, "shard", None, out_schema, fn_table=rank_kernel)


def shuffle_shards_sql(
    num_shards: int = 16,
    seed: int = 0,
    source: str = "documents",
    id_col: str = "doc_id",
) -> str:
    """DuckDB mirror: identical md5 key, hex parse, mod, window rank."""
    return f"""
WITH keyed AS (
    SELECT {id_col},
           substr(md5('{seed}:' || CAST({id_col} AS VARCHAR)), 1, 8)
               AS sample_key
    FROM {source}
),
sharded AS (
    SELECT {id_col}, sample_key,
           CAST(CAST('0x' || sample_key AS UBIGINT) % {num_shards} AS BIGINT)
               AS shard
    FROM keyed
)
SELECT {id_col}, sample_key, shard,
       CAST(row_number() OVER (
                PARTITION BY shard ORDER BY sample_key, {id_col}
            ) - 1 AS BIGINT) AS pos
FROM sharded
"""
