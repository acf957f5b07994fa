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


def _gram_buckets_flat(texts, buckets: int):
    """Vectorized gram->bucket pipeline over a string column.

    -> (row_of_uni int64[], uni_bucket int64[], row_of_bi int64[],
    bi_bucket int64[]) with intra-row gram ORDER preserved (unigrams in
    token order; bigrams in position order). Tokens come from the shared
    ``flat_tokens`` Arrow chain; md5 (``h60``) runs only on DISTINCT
    tokens / DISTINCT bigram code pairs — identical bucket assignment to
    hashing every occurrence (same gram strings by construction)."""
    from uk_address_matcher_ray.stages.dedup import flat_tokens

    parents, flat = flat_tokens(texts)
    if len(flat) == 0:
        e = np.empty(0, np.int64)
        return e, e, e, e
    # stable sort restores per-row contiguity (dirty-row fallbacks append
    # at the end); intra-row order is preserved by stability
    order = np.argsort(parents, kind="stable")
    parents = parents[order]
    flat = flat.take(pa.array(order, pa.int64()))
    enc = flat.dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    toks = enc.dictionary.to_pylist()
    uni_lut = np.fromiter(
        (h60(t) % buckets for t in toks), np.int64, count=len(toks)
    )
    uni_b = uni_lut[codes]
    # bigrams: adjacent positions within one row
    adj = np.flatnonzero(parents[1:] == parents[:-1])
    if len(adj):
        v = len(toks)
        pair_codes = codes[adj] * v + codes[adj + 1]
        uniq, inv = np.unique(pair_codes, return_inverse=True)
        pair_lut = np.fromiter(
            (
                h60(toks[int(pc_ // v)] + " " + toks[int(pc_ % v)]) % buckets
                for pc_ in uniq
            ),
            np.int64,
            count=len(uniq),
        )
        bi_b = pair_lut[inv]
        bi_rows = parents[adj]
    else:
        bi_b = np.empty(0, np.int64)
        bi_rows = np.empty(0, np.int64)
    return parents, uni_b, bi_rows, bi_b


def _bucket_counts(ds, text_col: str, buckets: int) -> tuple:
    """(counts:int64[buckets], total:int) via per-batch vectorized
    partials + a fan-in-8 raw-task tree reduce (intermediates are
    bucket-bounded int vectors; the Dataset groupby cost a whole job's
    fixed overhead per asset side)."""
    import ray

    def partial(batch: pa.Table) -> pa.Table:
        _ru, uni_b, _rb, bi_b = _gram_buckets_flat(
            batch.column(text_col), buckets
        )
        acc = np.bincount(uni_b, minlength=buckets).astype(np.int64)
        if len(bi_b):
            acc += np.bincount(bi_b, minlength=buckets).astype(np.int64)
        nz = np.nonzero(acc)[0]
        return pa.table(
            {
                "b": pa.array(nz.astype(np.int64)),
                "c": pa.array(acc[nz]),
            }
        )

    refs = list(
        ds.select_columns([text_col])
        .map_batches(partial, batch_format="pyarrow")
        .to_arrow_refs()
    )

    @ray.remote
    def merge(*tbls):
        acc = np.zeros(buckets, dtype=np.int64)
        for t in tbls:
            if t.num_rows:
                acc[t.column("b").to_numpy(zero_copy_only=False)] += (
                    t.column("c").to_numpy(zero_copy_only=False)
                )
        nz = np.nonzero(acc)[0]
        return pa.table(
            {
                "b": pa.array(nz.astype(np.int64)),
                "c": pa.array(acc[nz]),
            }
        )

    while len(refs) > 1:
        refs = [merge.remote(*refs[i : i + 8]) for i in range(0, len(refs), 8)]
    counts = np.zeros(buckets, dtype=np.int64)
    if refs:
        t = ray.get(refs[0])
        counts[t.column("b").to_numpy(zero_copy_only=False)] = (
            t.column("c").to_numpy(zero_copy_only=False)
        )
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
        term_np = np.asarray(term, dtype=np.float64)
        n = batch.num_rows
        # vectorized gram->bucket pipeline; per-doc fsum runs over the
        # SAME term values in the SAME order as the scalar chain
        # (unigrams in token order, then bigrams) -> identical floats
        uni_rows, uni_b, bi_rows, bi_b = _gram_buckets_flat(
            batch.column(text_col), buckets
        )
        uni_terms = term_np[uni_b]
        bi_terms = term_np[bi_b] if len(bi_b) else np.empty(0, np.float64)
        uni_off = np.zeros(n + 1, np.int64)
        np.add.at(uni_off, uni_rows + 1, 1)
        uni_off = np.cumsum(uni_off)
        bi_off = np.zeros(n + 1, np.int64)
        if len(bi_rows):
            np.add.at(bi_off, bi_rows + 1, 1)
        bi_off = np.cumsum(bi_off)
        n_out: list = []
        w_out: list = []
        for i in range(n):
            u0, u1 = uni_off[i], uni_off[i + 1]
            b0, b1 = bi_off[i], bi_off[i + 1]
            ng = int(u1 - u0) + int(b1 - b0)
            if ng == 0:
                n_out.append(0)
                w_out.append(None)
                continue
            n_out.append(ng)
            w_out.append(
                round(
                    math.fsum(
                        np.concatenate(
                            [uni_terms[u0:u1], bi_terms[b0:b1]]
                        )
                    ),
                    6,
                )
            )
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
