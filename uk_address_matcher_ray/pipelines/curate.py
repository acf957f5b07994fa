"""End-to-end web-corpus curation: filter -> exact-dedup, one corpus pass.

The composition every corpus paper describes (C4: heuristic filters then
dedup; CCNet/RefinedWeb likewise) assembled from this engine's kernels
with the 100 TB shapes preserved:

1. **Fused stats + filter** (one ``map_batches``): the vectorized
   text-stats kernel (stages/textstats.py) computes quality / token
   counts, the keep mask applies IN the same pass — the corpus is read
   once and the rejected rows never leave the task.
2. **Skinny exact-dedup exchange**: survivors are keyed by the 60-bit
   md5 text hash; the exchange carries ``(h, id, token_count,
   quality)`` — the TEXT never rides the shuffle.  Per-batch
   pre-reduction keeps one candidate per (hash, batch).  Within a hash
   group every row has the same text, hence identical deterministic
   stats, so independent per-column ``min`` aggregation IS the min-id
   row (no row-wise argmin machinery needed); the winner is the min id,
   matching ``stages/dedup.exact_dedup``.

-> Dataset(id, token_count, quality): the curated survivors.
"""

from __future__ import annotations

import pyarrow as pa

from uk_address_matcher_ray.functions import hashing as H


def _min_per_hash(t: pa.Table, id_col: str) -> pa.Table:
    agg = t.group_by("h").aggregate(
        [(id_col, "min"), ("token_count", "min"), ("quality", "min")]
    )
    return agg.rename_columns(["h", id_col, "token_count", "quality"])


def curate_docs(
    ds,
    min_quality: float = 0.35,
    min_tokens: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    import pyarrow.compute as pc

    from uk_address_matcher_ray.stages.grouped import grouped_map
    from uk_address_matcher_ray.stages.textstats import text_stats_table

    id_type = dict(zip(ds.schema().names, ds.schema().types))[id_col]

    def fused(batch: pa.Table) -> pa.Table:
        stats = text_stats_table(
            batch.column(id_col),
            batch.column(text_col),
            batch.schema.field(id_col),
        )
        keep = pc.and_(
            pc.greater_equal(stats.column("quality"), min_quality),
            pc.greater_equal(stats.column("token_count"), min_tokens),
        )
        st = stats.filter(keep)
        texts = batch.column(text_col).filter(keep).to_pylist()
        t = pa.table(
            {
                "h": pa.array([H.h60(x or "") for x in texts], pa.int64()),
                id_col: st.column(id_col),
                "token_count": st.column("token_count"),
                "quality": st.column("quality"),
            }
        )
        return _min_per_hash(t, id_col)

    def finalize(tbl: pa.Table) -> pa.Table:
        return _min_per_hash(tbl, id_col).drop_columns(["h"])

    out_schema = pa.schema(
        [
            pa.field(id_col, id_type),
            pa.field("token_count", pa.int64()),
            pa.field("quality", pa.float64()),
        ]
    )
    pre = ds.select_columns([id_col, text_col]).map_batches(
        fused, batch_format="pyarrow"
    )
    return grouped_map(pre, "h", None, out_schema, fn_table=finalize)


def curate_docs_sql(
    stats_sql: str, min_quality: float = 0.35, min_tokens: int = 5
) -> str:
    """DuckDB mirror: the text-stats oracle as a subquery, the identical
    md5-60-bit dedup key (collisions included), per-column min."""
    h = H.h60_sql("coalesce(d.text, '')")
    return f"""
WITH filt AS (
    SELECT s.doc_id, s.token_count, s.quality, {h} AS h
    FROM ({stats_sql}) s JOIN documents d USING (doc_id)
    WHERE s.quality >= {min_quality!r} AND s.token_count >= {min_tokens}
)
SELECT min(doc_id) AS doc_id,
       min(token_count) AS token_count,
       min(quality) AS quality
FROM filt GROUP BY h
"""
