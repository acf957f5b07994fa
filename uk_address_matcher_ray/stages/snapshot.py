"""Incremental snapshot dedup — drop new-crawl documents whose exact
content already exists in a previously-kept corpus.

The Common-Crawl ingestion staple: each monthly snapshot is mostly
re-fetches of pages already in the corpus; exact content dedup against
the KEPT side must run before any expensive per-doc work.  This is an
anti-semi-join on the engine-wide ``h60`` content hash
(functions/hashing.py — the exact_dedup key, stages/dedup.py:42), so a
doc survives iff no seen-side doc has the same hash.

Scale shape (100 TB corpus + 1 TB snapshot):
* Neither side is collected anywhere.  Both stream through one tagged
  hash-keyed exchange: the seen side ships only DISTINCT-per-batch
  (h:int64, side=0) rows — 9 B/row, pre-deduped in-batch; the new side
  ships (h, id, side=1).
* ``grouped_map`` co-locates equal hashes; the in-group kernel emits
  new-side ids whose group has no seen-side row.  Vectorized: one sort
  by h, run-offset scan, boolean gather — no per-row Python.
* For repeated monthly runs, the seen side's hash set can be persisted
  once as a skinny parquet (h only) and re-streamed — no index rebuild.
  A Bloom prefilter (stages/bloom.py) can cheaply pre-drop the ~90%
  definite-misses before the exchange when the snapshot >> survivors;
  the exchange stays the exactness backstop.

The reference engine has no incremental-ingestion counterpart; this is
part of the LLM-pipeline surface (brief: dedup family).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from uk_address_matcher_ray.functions import hashing as H


def _hash_batch(texts) -> pa.Array:
    return pa.array(
        [H.h60(t or "") for t in texts], pa.int64()
    )


def incremental_dedup(
    new_ds,
    seen_ds,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """-> Dataset(id, content_hash): new-side rows whose exact text hash
    does not occur on the seen side."""
    import ray

    from uk_address_matcher_ray.stages.grouped import grouped_map

    sch = new_ds.schema()
    if sch is None:  # empty new side: nothing can survive
        return ray.data.from_arrow(
            pa.schema(
                [
                    pa.field(id_col, pa.int64()),
                    pa.field("content_hash", pa.int64()),
                ]
            ).empty_table()
        )
    id_type = dict(zip(sch.names, sch.types))[id_col]

    def tag_new(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "h": _hash_batch(batch.column(text_col).to_pylist()),
                id_col: batch.column(id_col).cast(id_type),
                "side": pa.array(
                    np.ones(batch.num_rows, dtype=np.int8)
                ),
            }
        )

    def tag_seen(batch: pa.Table) -> pa.Table:
        hs = pc.unique(
            _hash_batch(batch.column(text_col).to_pylist())
        )  # distinct-per-batch: the exchange never carries seen dups
        return pa.table(
            {
                "h": hs,
                id_col: pa.nulls(len(hs), id_type),
                "side": pa.array(np.zeros(len(hs), dtype=np.int8)),
            }
        )

    tagged = new_ds.select_columns([id_col, text_col]).map_batches(
        tag_new, batch_format="pyarrow"
    ).union(
        seen_ds.select_columns([id_col, text_col]).map_batches(
            tag_seen, batch_format="pyarrow"
        )
    )

    out_schema = pa.schema(
        [pa.field(id_col, id_type), pa.field("content_hash", pa.int64())]
    )

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        t = t.combine_chunks()
        h = t.column("h").to_numpy(zero_copy_only=False)
        side = t.column("side").to_numpy(zero_copy_only=False)
        order = np.argsort(h, kind="stable")
        h_s = h[order]
        side_s = side[order]
        # run offsets of equal hashes; a group is "seen" iff any side==0
        idx = np.flatnonzero(h_s[1:] != h_s[:-1]) + 1
        offs = np.concatenate([[0], idx, [len(h_s)]])
        group_of = np.repeat(
            np.arange(len(offs) - 1), np.diff(offs)
        )
        seen_any = (
            np.maximum.reduceat((side_s == 0).astype(np.int8), offs[:-1]) > 0
        )
        keep_sorted = (side_s == 1) & ~seen_any[group_of]
        keep_idx = order[keep_sorted]
        kept = t.take(pa.array(keep_idx))
        return pa.table(
            {
                id_col: kept.column(id_col),
                "content_hash": kept.column("h"),
            },
            schema=out_schema,
        )

    return grouped_map(tagged, "h", None, out_schema, fn_table=finalize)


def incremental_dedup_sql(
    new_from: str, seen_from: str, id_col: str = "doc_id"
) -> str:
    """DuckDB mirror: identical h60 content hash on both sides (hash
    collisions — astronomically unlikely — conflate identically)."""
    h_new = H.h60_sql("coalesce(n.text, '')")
    h_seen = H.h60_sql("coalesce(s.text, '')")
    return f"""
SELECT n.{id_col}, {h_new} AS content_hash
FROM ({new_from}) n
WHERE {h_new} NOT IN (SELECT {h_seen} FROM ({seen_from}) s)
"""
