"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023).

The pretraining-data-selection staple: score every raw document by how
much more likely its hashed n-gram bag is under a TARGET distribution
(curated text) than under the RAW distribution (the crawl), then keep
the highest-importance documents.  The published method estimates both
distributions with hashed unigram+bigram bag-of-words models; we
implement exactly that estimator with the engine's determinism rules:

* **Features**: unigrams and space-joined bigrams of the dedup-family
  tokenizer (``dedup._tokens``: lower, whitespace split), hashed into
  ``buckets`` bins with the engine-wide ``h60`` md5 primitive
  (``functions/hashing.py``) so the DuckDB oracle reproduces every
  bucket id exactly.
* **Distribution fit** (``dsir_assets``): one streaming ``map_batches``
  pass per side emits per-batch PARTIAL (bucket, count) tables —
  pre-aggregated in-batch, hence bounded by ``buckets`` rows per batch —
  merged by one skinny groupby; the driver holds two int64[buckets]
  arrays, never a token dict.  Integer counts: exact at any
  parallelism / merge order.
* **Scoring** (``dsir_weights``): assets broadcast once via ``ray.put``;
  per-bucket log-ratio table built ONCE per task with ``math.log``
  (libm — matches DuckDB ``ln`` bit-for-bit on this estimator, the
  stages/lm.py precedent):

      term[b] = ln((tgt[b] + 1) / (T_tgt + B)) - ln((raw[b] + 1) / (T_raw + B))

  add-1 smoothing over the B buckets, T = total gram count of the side.
  Per doc: ``logw = round(fsum(term[bucket(g)] for g in grams), 6)`` —
  ``math.fsum`` is exactly rounded so block splits can never reorder a
  doc's sum into a different float; the 6-digit rounding absorbs the
  oracle's unordered-SUM ulps (same contract as lm_perplexity).  Docs
  with no tokens score NULL with ``n_grams`` 0.
* **Selection** (``dsir_select``): top-n by (logw DESC, id ASC) — the
  deterministic hard-top-k variant of the paper's Gumbel resampling
  (Gumbel noise adds nothing under a bit-exactness contract; swap in
  md5-derived Gumbel keys one expression deep if sampling diversity is
  wanted).  Per-batch partial top-n prune (a batch's top-n is a superset
  of its contribution to the global top-n), then one driver-side merge
  of the <= n-per-batch survivors.

Scale shape at 100 TB: both fit passes and the score pass are
zero-shuffle streaming; every exchange and driver structure is bounded
by ``buckets`` (the paper uses 1e4) or ``n``.  The reference engine has
no data-selection counterpart; this is part of the LLM-pipeline surface
(brief: quality scoring / data mixing).
"""

from __future__ import annotations

import math
from typing import Dict, List

import numpy as np
import pyarrow as pa

from uk_address_matcher_ray import util
from uk_address_matcher_ray.functions.hashing import h60, h60_sql
from uk_address_matcher_ray.stages.dedup import _tokens

DEFAULT_BUCKETS = 4096


def _grams(toks: List[str]) -> List[str]:
    return toks + [
        toks[i] + " " + toks[i + 1] for i in range(len(toks) - 1)
    ]


def _bucket_counts(ds, text_col: str, buckets: int) -> tuple:
    """(counts:int64[buckets], total:int) via per-batch partials + one
    bucket-keyed groupby (rows bounded by ``buckets`` per batch)."""

    def partial(batch: pa.Table) -> pa.Table:
        acc = np.zeros(buckets, dtype=np.int64)
        memo: Dict[str, int] = {}
        for text in batch.column(text_col).to_pylist():
            for g in _grams(_tokens(text)):
                b = memo.get(g)
                if b is None:
                    b = h60(g) % buckets
                    memo[g] = b
                acc[b] += 1
        nz = np.nonzero(acc)[0]
        return pa.table(
            {
                "b": pa.array(nz.astype(np.int64)),
                "c": pa.array(acc[nz]),
            }
        )

    rows = (
        ds.select_columns([text_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("b")
        .sum("c")
        .take_all()
    )
    counts = np.zeros(buckets, dtype=np.int64)
    for r in rows:
        counts[int(r["b"])] = int(r["sum(c)"])
    return counts, int(counts.sum())


def dsir_assets(
    raw_ds,
    target_ds,
    text_col: str = "text",
    buckets: int = DEFAULT_BUCKETS,
):
    """Fit both hashed-ngram distributions.  Returns
    (raw_counts, raw_total, tgt_counts, tgt_total, buckets)."""
    raw_counts, raw_total = _bucket_counts(raw_ds, text_col, buckets)
    tgt_counts, tgt_total = _bucket_counts(target_ds, text_col, buckets)
    return raw_counts, raw_total, tgt_counts, tgt_total, buckets


def dsir_weights(
    ds,
    assets,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """-> Dataset(id, n_grams, logw) — one zero-shuffle pass.

    ``assets``: the ``dsir_assets`` tuple or a ``ray.put`` ref of it."""

    def kernel(batch: pa.Table) -> pa.Table:
        raw_c, raw_t, tgt_c, tgt_t, buckets = util.get_broadcast(assets)
        # per-bucket log-ratio, math.log to match DuckDB ln (lm.py
        # precedent); built once per task, cost O(buckets)
        term = [
            math.log((int(tgt_c[b]) + 1.0) / (tgt_t + buckets))
            - math.log((int(raw_c[b]) + 1.0) / (raw_t + buckets))
            for b in range(buckets)
        ]
        memo: Dict[str, int] = {}
        n_out: list = []
        w_out: list = []
        for text in batch.column(text_col).to_pylist():
            grams = _grams(_tokens(text))
            if not grams:
                n_out.append(0)
                w_out.append(None)
                continue
            terms = []
            for g in grams:
                b = memo.get(g)
                if b is None:
                    b = h60(g) % buckets
                    memo[g] = b
                terms.append(term[b])
            n_out.append(len(grams))
            w_out.append(round(math.fsum(terms), 6))
        return pa.table(
            {
                id_col: batch.column(id_col),
                "n_grams": pa.array(n_out, pa.int64()),
                "logw": pa.array(w_out, pa.float64()),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        kernel, batch_format="pyarrow"
    )


def dsir_select(weights_ds, n: int, id_col: str = "doc_id"):
    """-> Dataset(id, logw): the n highest-importance docs
    (logw DESC, id ASC; NULL-logw docs excluded)."""
    import ray

    def prune(batch: pa.Table) -> pa.Table:
        t = batch.filter(batch.column("logw").is_valid())
        if t.num_rows > n:
            idx = pa.compute.sort_indices(
                t,
                sort_keys=[("logw", "descending"), (id_col, "ascending")],
            )[:n]
            t = t.take(idx)
        return t.select([id_col, "logw"])

    rows = weights_ds.map_batches(
        prune, batch_format="pyarrow"
    ).take_all()  # <= n per upstream batch — driver-bounded
    rows.sort(key=lambda r: (-r["logw"], r[id_col]))
    rows = rows[:n]
    return ray.data.from_arrow(
        pa.table(
            {
                id_col: pa.array([r[id_col] for r in rows]),
                "logw": pa.array(
                    [r["logw"] for r in rows], pa.float64()
                ),
            }
        )
    )


_TOK_SPLIT_SQL = (
    "list_filter(regexp_split_to_array(lower(trim(coalesce(text, ''))),"
    " '\\s+'), t -> t != '')"
)


def _grams_cte(docs_from: str, buckets: int) -> str:
    """CTE body producing (doc_id, b) for unigrams + bigrams of
    ``docs_from`` (which must yield doc_id, text)."""
    return f"""
  SELECT doc_id, {h60_sql('g')} % {buckets} AS b
  FROM (
    SELECT doc_id, unnest(t) AS g
    FROM (SELECT doc_id, {_TOK_SPLIT_SQL} AS t FROM ({docs_from}))
    UNION ALL
    SELECT doc_id, t[i] || ' ' || t[i + 1] AS g
    FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i
          FROM (SELECT doc_id, {_TOK_SPLIT_SQL} AS t FROM ({docs_from})))
  )"""


def dsir_weights_sql(
    raw_from: str,
    target_from: str,
    buckets: int = DEFAULT_BUCKETS,
) -> str:
    """DuckDB mirror: identical tokenization, md5 buckets, add-1
    smoothing and 6-digit rounding (unordered-SUM ulps absorbed, the
    lm_perplexity contract)."""
    return f"""
WITH rawg AS ({_grams_cte(raw_from, buckets)}),
tgtg AS ({_grams_cte(target_from, buckets)}),
rc AS (SELECT b, count(*) AS c FROM rawg GROUP BY b),
tc AS (SELECT b, count(*) AS c FROM tgtg GROUP BY b),
rt AS (SELECT count(*) AS t FROM rawg),
tt AS (SELECT count(*) AS t FROM tgtg),
lp AS (
  SELECT g.doc_id,
         ln((COALESCE(tc.c, 0) + 1.0) / (tt.t + {buckets}))
         - ln((COALESCE(rc.c, 0) + 1.0) / (rt.t + {buckets})) AS l
  FROM rawg g
  LEFT JOIN rc ON rc.b = g.b
  LEFT JOIN tc ON tc.b = g.b
  CROSS JOIN rt CROSS JOIN tt
),
agg AS (SELECT doc_id, count(*) AS n_grams, round(sum(l), 6) AS logw
        FROM lp GROUP BY doc_id)
SELECT d.doc_id,
       COALESCE(a.n_grams, 0) AS n_grams,
       a.logw AS logw
FROM ({raw_from}) d LEFT JOIN agg a USING (doc_id)
"""


def dsir_select_sql(
    raw_from: str,
    target_from: str,
    n: int,
    buckets: int = DEFAULT_BUCKETS,
) -> str:
    w = dsir_weights_sql(raw_from, target_from, buckets)
    return f"""
SELECT doc_id, logw FROM ({w})
WHERE logw IS NOT NULL
ORDER BY logw DESC, doc_id ASC
LIMIT {n}
"""
