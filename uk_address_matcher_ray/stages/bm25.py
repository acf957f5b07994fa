"""BM25 retrieval scoring — top-k documents per query under the
Robertson/Lucene BM25 variant.

The retrieval primitive that pairs with stages/index.py (candidate
lookup, contamination audits, "find the page this benchmark item came
from").  Queries are the SMALL side (a handful to a few thousand
strings), documents are the corpus — so the engine never shuffles the
corpus:

1. **Asset pass**: one streaming ``map_batches`` pass emits per-batch
   integer partials — N (doc count), total token length, and per
   QUERY-TOKEN document frequencies (bounded by the query vocabulary,
   never the corpus vocabulary) — merged by one skinny groupby.
2. **Score pass**: assets broadcast once via ``ray.put``; one
   zero-shuffle pass scores every doc against every query (query
   count × docs work, embarrassingly parallel) and prunes to the
   per-batch top-k per query.  The driver merges the <= k-per-(query,
   batch) survivors.

Determinism contract (the lm_perplexity float regime):

    idf(t)     = ln((N - df + 0.5) / (df + 0.5) + 1.0)
    term(t, d) = idf(t) * (tf * (k1 + 1.0))
                 / (tf + k1 * ((1.0 - b) + b * (len_d / avgdl)))
    score      = round(fsum(terms over query tokens present in d), 6)

with ``avgdl = total_len / N`` (one double division), tf / len_d / N /
df all integers, and the DuckDB oracle restating the exact expression
chain.  ``fsum`` is exactly rounded so batch splits cannot reorder a
doc's sum; the 6-digit rounding absorbs the oracle's unordered-SUM
ulps.  Ranking (score DESC, doc_id ASC) uses the ROUNDED score on both
sides, so ties resolve identically.

Tokenization is the dedup-family tokenizer (``dedup._tokens``).  The
reference engine has no retrieval counterpart; this is part of the
LLM-pipeline surface (brief: similarity search).
"""

from __future__ import annotations

import math
from collections import Counter
from typing import Dict, List, Sequence, Tuple

import numpy as np
import pyarrow as pa

from uk_address_matcher_ray import util
from uk_address_matcher_ray.stages.dedup import _tokens

K1 = 1.2
B = 0.75

_TOK_SPLIT_SQL = (
    "list_filter(regexp_split_to_array(lower(trim(coalesce({x}, ''))),"
    " '\\s+'), t -> t != '')"
)


def bm25_assets(ds, queries: Sequence[Tuple[str, str]], text_col: str = "text"):
    """(df: dict token->int over query tokens, N, total_len) via one
    streaming pass of integer partials."""
    qtokens = sorted({t for _, q in queries for t in _tokens(q)})
    qset = frozenset(qtokens)

    def partial(batch: pa.Table) -> pa.Table:
        df = dict.fromkeys(qtokens, 0)
        n = 0
        total = 0
        for text in batch.column(text_col).to_pylist():
            toks = _tokens(text)
            n += 1
            total += len(toks)
            for t in set(toks) & qset:
                df[t] += 1
        keys = ["\x00n", "\x00len"] + qtokens  # \x00 never a token
        vals = [n, total] + [df[t] for t in qtokens]
        return pa.table(
            {
                "k": pa.array(keys, pa.string()),
                "c": pa.array(vals, pa.int64()),
            }
        )

    rows = (
        ds.select_columns([text_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("k")
        .sum("c")
        .take_all()
    )
    agg = {r["k"]: int(r["sum(c)"]) for r in rows}
    n = agg.pop("\x00n", 0)
    total = agg.pop("\x00len", 0)
    return agg, n, total


def bm25_topk(
    ds,
    queries: Sequence[Tuple[str, str]],
    k: int,
    assets=None,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = K1,
    b: float = B,
):
    """-> Dataset(qid, id, score): the k best docs per query
    (rounded-score DESC, id ASC; zero-score docs excluded)."""
    import ray

    if assets is None:
        assets = bm25_assets(ds, queries, text_col=text_col)
    df, n_docs, total_len = (
        util.get_broadcast(assets) if not isinstance(assets, tuple) else assets
    )
    if n_docs == 0:
        return ray.data.from_arrow(
            pa.schema(
                [
                    pa.field("qid", pa.string()),
                    pa.field(id_col, ds.schema().field(id_col).type
                             if ds.schema() else pa.int64()),
                    pa.field("score", pa.float64()),
                ]
            ).empty_table()
        )
    avgdl = total_len / n_docs
    # per query: list of (token, idf) for tokens the corpus has seen
    qterms: Dict[str, List[Tuple[str, float]]] = {}
    for qid, q in queries:
        terms = []
        for t in sorted(set(_tokens(q))):
            d = df.get(t, 0)
            if d > 0:
                terms.append(
                    (t, math.log((n_docs - d + 0.5) / (d + 0.5) + 1.0))
                )
        qterms[qid] = terms
    q_ref = ray.put((qterms, avgdl))
    sch = ds.schema()
    id_type = dict(zip(sch.names, sch.types))[id_col]

    def score_batch(batch: pa.Table) -> pa.Table:
        qt, adl = ray.get(q_ref)
        out_q: list = []
        out_i: list = []
        out_s: list = []
        ids = batch.column(id_col).to_pylist()
        for row, text in enumerate(batch.column(text_col).to_pylist()):
            toks = _tokens(text)
            if not toks:
                continue
            tf = Counter(toks)
            norm = k1 * ((1.0 - b) + b * (len(toks) / adl))
            for qid, terms in qt.items():
                parts = [
                    idf * (tf[t] * (k1 + 1.0)) / (tf[t] + norm)
                    for t, idf in terms
                    if tf[t] > 0
                ]
                if parts:
                    out_q.append(qid)
                    out_i.append(ids[row])
                    out_s.append(round(math.fsum(parts), 6))
        t = pa.table(
            {
                "qid": pa.array(out_q, pa.string()),
                id_col: pa.array(out_i, id_type),
                "score": pa.array(out_s, pa.float64()),
            }
        )
        # per-batch per-query top-k prune (superset of the global top-k)
        if t.num_rows == 0:
            return t
        import pyarrow.compute as pc

        keep_idx: list = []
        order = pc.sort_indices(
            t,
            sort_keys=[
                ("qid", "ascending"),
                ("score", "descending"),
                (id_col, "ascending"),
            ],
        ).to_numpy(zero_copy_only=False)
        qs = t.column("qid").to_pylist()
        seen: Dict[str, int] = {}
        for i in order:
            q = qs[i]
            c = seen.get(q, 0)
            if c < k:
                keep_idx.append(i)
                seen[q] = c + 1
        return t.take(pa.array(np.sort(np.array(keep_idx, dtype=np.int64))))

    rows = ds.select_columns([id_col, text_col]).map_batches(
        score_batch, batch_format="pyarrow"
    ).take_all()  # <= k per (query, batch) — driver-bounded
    rows.sort(key=lambda r: (r["qid"], -r["score"], r[id_col]))
    out: list = []
    seen: Dict[str, int] = {}
    for r in rows:
        c = seen.get(r["qid"], 0)
        if c < k:
            out.append(r)
            seen[r["qid"]] = c + 1
    return ray.data.from_arrow(
        pa.table(
            {
                "qid": pa.array([r["qid"] for r in out], pa.string()),
                id_col: pa.array([r[id_col] for r in out], id_type),
                "score": pa.array(
                    [r["score"] for r in out], pa.float64()
                ),
            }
        )
    )


def bm25_topk_sql(
    docs_from: str,
    queries: Sequence[Tuple[str, str]],
    k: int,
    id_col: str = "doc_id",
    k1: float = K1,
    b: float = B,
) -> str:
    """DuckDB mirror: identical tokenizer, integer tf/df/len, verbatim
    expression chain, rounded-score ordering."""
    qrows = " UNION ALL ".join(
        f"SELECT '{qid}' AS qid, '{q}' AS qtext" for qid, q in queries
    )
    # DuckDB parses 1.2 as DECIMAL, not DOUBLE — force double literals so
    # the arithmetic domain matches Python floats exactly
    k1d = f"CAST({k1!r} AS DOUBLE)"
    bd = f"CAST({b!r} AS DOUBLE)"
    tok = _TOK_SPLIT_SQL.format(x="d.text")
    qtok = _TOK_SPLIT_SQL.format(x="qtext")
    return f"""
WITH docs AS (SELECT {id_col}, {tok} AS t FROM ({docs_from}) d),
stats AS (SELECT count(*) AS n, sum(len(t)) AS total FROM docs),
qs AS ({qrows}),
qt AS (SELECT DISTINCT qid, unnest({qtok}) AS tok FROM qs),
dt AS (SELECT {id_col}, len(t) AS dl, unnest(t) AS tok FROM docs),
tf AS (SELECT {id_col}, tok, count(*) AS tf,
              any_value(dl) AS dl FROM dt GROUP BY {id_col}, tok),
dfreq AS (SELECT tok, count(*) AS df FROM tf
          WHERE tok IN (SELECT tok FROM qt) GROUP BY tok),
terms AS (
  SELECT qt.qid, tf.{id_col},
         ln((stats.n - dfreq.df + CAST(0.5 AS DOUBLE))
            / (dfreq.df + CAST(0.5 AS DOUBLE)) + 1.0)
           * (tf.tf * ({k1d} + 1.0))
           / (tf.tf + {k1d} * ((1.0 - {bd})
              + {bd} * (tf.dl / (stats.total / CAST(stats.n AS DOUBLE)))))
           AS term
  FROM qt
  JOIN tf ON tf.tok = qt.tok
  JOIN dfreq ON dfreq.tok = qt.tok
  CROSS JOIN stats
),
scores AS (
  SELECT qid, {id_col}, round(sum(term), 6) AS score
  FROM terms GROUP BY qid, {id_col}
),
ranked AS (
  SELECT qid, {id_col}, score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score DESC, {id_col} ASC) AS rn
  FROM scores
)
SELECT qid, {id_col}, score FROM ranked WHERE rn <= {k}
"""
