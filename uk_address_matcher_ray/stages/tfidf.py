"""Per-document top-k TF-IDF terms — keyword extraction / topic tagging.

Corpus reports, search indexing and topic-balance audits all want "the k
most distinctive terms per document".  Score is the classic

    score(doc, t) = tf(doc, t) * ln(N / df(t))

with tf = the term's count in the doc, df = the number of DISTINCT
documents containing it, N = total document rows.  Tokenization is the
dedup-family tokenizer (lower, trim, whitespace split) so the DuckDB
oracle's ``regexp_split_to_array`` twin applies verbatim.

Scale shape (the TF-table shape, stages/tf.py):

* **DF build**: one streaming pass emits per-batch DISTINCT
  (token, doc-count) partials — vocabulary-bounded rows, never corpus
  positions — merged by a fan-in-8 tree of group-sums; the document
  total N rides the same exchange as one sentinel row.  ``min_df``
  floors the broadcast table for 100 TB vocabularies (tokens below the
  floor cannot enter any top-k whose scores beat the floor's ceiling
  score ``max_tf * ln(N/min_df)`` — at web scale hapaxes are typos/ids
  and the floor is the standard cure; floored runs are NOT bit-identical
  to unfloored ones, same contract as tf.py's min_token_count).
* **Score pass**: df map broadcast once (``ray.put`` + per-worker memo);
  per-doc tf, scoring and top-k selection are row-local — zero shuffles.
  Ties break (score desc, token asc), stated identically in the oracle's
  window ORDER BY.

The float contract: score = CAST(tf AS DOUBLE) * ln(CAST(N AS DOUBLE) /
df) evaluated in exactly that shape on both engines (one divide, one
libm ln, one multiply — the lm_perplexity precedent).

Precondition: one input row per doc_id (the documents-table contract) —
df counts rows containing the token; a doc_id split across rows would
be counted once per row (the SQL oracle's COUNT(DISTINCT doc_id) would
not). Run url/exact dedup first if ids can repeat.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import pyarrow as pa

from uk_address_matcher_ray.stages.dedup import _tokens

_DF_SCHEMA = pa.schema([pa.field("t", pa.string()), pa.field("c", pa.int64())])
_EMPTY_DF = _DF_SCHEMA.empty_table()


def _df_partial(batch: pa.Table, text_col: str) -> pa.Table:
    counts: Dict[str, int] = {}
    for text in batch.column(text_col).to_pylist():
        for tok in set(_tokens(text)):
            counts[tok] = counts.get(tok, 0) + 1
    toks = list(counts)
    return pa.table(
        {
            # None sentinel row carries the batch's document count (N)
            "t": pa.array(toks + [None], pa.string()),
            "c": pa.array(
                [counts[t] for t in toks] + [batch.num_rows], pa.int64()
            ),
        }
    )


def corpus_df_assets(
    ds, text_col: str = "text", min_df: int = 0
) -> Tuple[Dict[str, int], int]:
    """One streaming pass -> (df map, N). Tree-merged vocabulary-bounded
    partials; ``min_df`` floors the broadcast table (see module docstring)."""
    import ray

    partials = ds.map_batches(
        lambda b: _df_partial(b, text_col),
        batch_format="pyarrow",
        batch_size=8192,
    )
    refs = list(partials.to_arrow_refs())

    @ray.remote
    def merge(*tbls):
        live = [t for t in tbls if t.num_rows > 0 and "t" in t.schema.names]
        if not live:
            return _EMPTY_DF
        agg = pa.concat_tables(live).group_by(["t"]).aggregate([("c", "sum")])
        return agg.rename_columns(["t", "c"])

    while len(refs) > 1:
        refs = [merge.remote(*refs[i : i + 8]) for i in range(0, len(refs), 8)]
    tbl = ray.get(refs[0]) if refs else _EMPTY_DF

    df: Dict[str, int] = {}
    n_docs = 0
    for t, c in zip(tbl.column("t").to_pylist(), tbl.column("c").to_pylist()):
        if t is None:
            n_docs = c
        elif c >= min_df:
            df[t] = c
    return df, n_docs


def tfidf_topk(
    ds,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 0,
    df_assets: Optional[tuple] = None,
):
    """Dataset(doc_id, token, rank, score) — each document's top-k TF-IDF
    terms (rank 1..k; fewer rows for short docs). Pass ``df_assets`` to
    reuse a prebuilt (df, N) across calls."""
    import ray

    df_map, n_docs = (
        df_assets if df_assets is not None else corpus_df_assets(ds, text_col, min_df)
    )
    df_ref = ray.put(df_map)
    n_f = float(n_docs)

    def score_batch(batch: pa.Table) -> pa.Table:
        id_type = batch.schema.field(id_col).type  # inherited, not assumed
        df = ray.get(df_ref)  # plasma-resident, one copy per node
        out_id, out_tok, out_rank, out_score = [], [], [], []
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        for did, text in zip(ids, texts):
            tf: Dict[str, int] = {}
            for tok in _tokens(text):
                tf[tok] = tf.get(tok, 0) + 1
            scored = []
            for tok, cnt in tf.items():
                d = df.get(tok)
                if d is None:  # floored out: cannot beat surviving scores
                    continue
                scored.append((float(cnt) * math.log(n_f / d), tok))
            scored.sort(key=lambda st: (-st[0], st[1]))
            for rank, (s, tok) in enumerate(scored[:k], start=1):
                out_id.append(did)
                out_tok.append(tok)
                out_rank.append(rank)
                out_score.append(s)
        return pa.table(
            {
                id_col: pa.array(out_id, id_type),
                "token": pa.array(out_tok, pa.string()),
                "rank": pa.array(out_rank, pa.int32()),
                "score": pa.array(out_score, pa.float64()),
            }
        )

    return ds.map_batches(score_batch, batch_format="pyarrow")


def tfidf_topk_sql(k: int = 5, table: str = "documents") -> str:
    """DuckDB mirror: identical tokenizer, identical score expression
    shape, identical (score DESC, token ASC) tie-break."""
    return f"""
WITH docs AS (
    SELECT doc_id,
           list_filter(regexp_split_to_array(lower(trim(coalesce(text, ''))),
                       '\\s+'), x -> x != '') AS ts
    FROM {table}
),
tok AS (SELECT doc_id, unnest(ts) AS t FROM docs),
tf AS (SELECT doc_id, t, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT t, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
n AS (SELECT COUNT(*) AS n FROM {table}),
scored AS (
    SELECT doc_id, t,
           CAST(tf AS DOUBLE) * ln(CAST(n AS DOUBLE) / df) AS score
    FROM tf JOIN df USING (t), n
),
r AS (
    SELECT doc_id, t, score,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY score DESC, t ASC) AS rank
    FROM scored
)
SELECT doc_id, t AS token, CAST(rank AS INT) AS rank, score
FROM r WHERE rank <= {k}
"""
