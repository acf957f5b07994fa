"""Top-k most frequent word n-grams per group (corpus analytics).

Stopword-list induction, boilerplate phrase mining, and corpus QA
reports all start from "the most common n-grams per language/source".
Unlike ``group_cap`` (md5 rank — batch-local winners ARE global
winners), frequency top-k is NOT prunable per batch: a gram's global
count is spread across batches, so dropping batch-local losers can drop
a global winner.  The exact shape is therefore the TF shape:

* **Partial**: per-batch ``(group, gram, count)`` pre-aggregation — the
  exchange carries the batch's DISTINCT grams, never the corpus
  positions (web text repeats heavily; this is the same compression the
  TF builder gets).
* **Exchange + finalize**: one group-keyed ``grouped_map``; per complete
  group, sum counts and keep the k largest with a deterministic
  tie-break (count desc, gram asc) — stated identically in the DuckDB
  window mirror.

Scale: the exchange is vocabulary×groups-bounded, not corpus-bounded —
the same premise as ``stages/tf.py`` (and the same cure if the n-gram
vocabulary explodes: a count floor, which for top-k is SAFE once
``floor <= true k-th count / upstream-block count`` is violated only by
grams that cannot reach the top-k; the approximate path is a count-min
sketch + candidate re-count, not implemented).  Tokenization is the
dedup-family tokenizer (lower, whitespace split).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from uk_address_matcher_ray.stages.dedup import _tokens


def _gram_partial(batch: pa.Table, n: int, group_col: str, text_col: str):
    groups: list = []
    grams: list = []
    gvals = batch.column(group_col).to_pylist()
    for g, text in zip(gvals, batch.column(text_col).to_pylist()):
        toks = _tokens(text)
        for i in range(len(toks) - n + 1):
            groups.append(g)
            grams.append(" ".join(toks[i : i + n]))
    if not grams:
        return pa.table(
            {
                "g": pa.array([], pa.string()),
                "gram": pa.array([], pa.string()),
                "c": pa.array([], pa.int64()),
            }
        )
    t = pa.table(
        {
            "g": pa.array(groups, pa.string()),
            "gram": pa.array(grams, pa.string()),
        }
    )
    return (
        t.group_by(["g", "gram"])
        .aggregate([([], "count_all")])
        .rename_columns(["g", "gram", "c"])
    )


def ngram_topk(
    ds,
    k: int,
    n: int = 2,
    group_col: str = "lang",
    text_col: str = "text",
):
    """-> Dataset(group, gram, cnt): the k most frequent word n-grams per
    group (count desc, gram asc tie-break)."""
    from uk_address_matcher_ray.stages.grouped import grouped_map

    def finalize(tbl: pa.Table) -> pa.Table:
        merged = tbl.group_by(["g", "gram"]).aggregate([("c", "sum")])
        order = pa.compute.sort_indices(
            merged,
            sort_keys=[
                ("g", "ascending"),
                ("c_sum", "descending"),
                ("gram", "ascending"),
            ],
        )
        s = merged.take(order)
        gcol = s.column("g")
        if isinstance(gcol, pa.ChunkedArray):
            gcol = gcol.combine_chunks()
        enc = gcol.dictionary_encode()
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = pa.compute.fill_null(enc.indices, -1).to_numpy(
            zero_copy_only=False
        )
        m = len(codes)
        idx = np.arange(m, dtype=np.int64)
        newg = np.empty(m, dtype=bool)
        if m:
            newg[0] = True
            newg[1:] = codes[1:] != codes[:-1]
        starts = np.maximum.accumulate(np.where(newg, idx, 0)) if m else idx
        kept = s.filter(pa.array(idx - starts < k))
        return pa.table(
            {
                "g": kept.column("g"),
                "gram": kept.column("gram"),
                "cnt": kept.column("c_sum").cast(pa.int64()),
            }
        )

    out_schema = pa.schema(
        [
            pa.field("g", pa.string()),
            pa.field("gram", pa.string()),
            pa.field("cnt", pa.int64()),
        ]
    )
    pre = ds.select_columns([group_col, text_col]).map_batches(
        lambda b: _gram_partial(b, n, group_col, text_col),
        batch_format="pyarrow",
    )
    return grouped_map(pre, "g", None, out_schema, fn_table=finalize)


def ngram_topk_sql(
    k: int,
    n: int = 2,
    group_col: str = "lang",
    text_col: str = "text",
    table: str = "documents",
) -> str:
    """DuckDB mirror: identical tokenization, counts and tie-break."""
    tok_split = (
        f"list_filter(regexp_split_to_array(lower(trim(coalesce({text_col},"
        " ''))), '\\s+'), t -> t != '')"
    )
    return f"""
WITH docs AS (SELECT {group_col} AS g, {tok_split} AS t FROM {table}),
grams AS (
    SELECT g, array_to_string(t[i + 1 : i + {n}], ' ') AS gram
    FROM (SELECT g, t, unnest(range(len(t) - {n - 1})) AS i
          FROM docs WHERE len(t) >= {n})
),
cnts AS (SELECT g, gram, count(*) AS cnt FROM grams GROUP BY g, gram),
rnk AS (
    SELECT *, row_number() OVER (
        PARTITION BY g ORDER BY cnt DESC, gram ASC) AS rn
    FROM cnts
)
SELECT g, gram, cnt FROM rnk WHERE rn <= {k}
"""
