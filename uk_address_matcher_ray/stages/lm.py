"""Bigram language-model perplexity scoring (CCNet-style quality filter).

CCNet (Wenzek et al. 2020) ranks Common-Crawl documents by the perplexity
of a language model trained on curated text and keeps the low-perplexity
head; most published web-corpus pipelines since (RedPajama, FineWeb
ablations) carry the same step.  KenLM is not in this container, so the
model is a from-scratch add-k-smoothed bigram LM — the estimator KenLM
generalizes — trained and applied entirely on the engine:

* **Training** (``corpus_lm_assets``): one streaming ``map_batches`` pass
  emits per-batch PARTIAL (w1, w2, count) bigram tables (pre-aggregated
  inside the batch), merged in a fan-in-8 tree of Ray tasks exactly like
  ``stages/tf.collect_corpus_stats`` — integer sums are order-independent
  so the counts are exact at any tree shape, every intermediate stays
  vocabulary-bounded, and there is NO all-to-all shuffle.  The driver
  receives only the merged count table.  ``min_count`` floors the
  long tail (dropped bigrams fall back to the smoothed-zero probability
  at score time) while context totals and the vocabulary size are
  computed PRE-floor, so surviving probabilities are bit-identical to
  the unfloored model — the same floor contract as the TF builder.
* **Model**: p(w2 | w1) = (c(w1,w2) + a) / (ctx(w1) + a·V), a = 0.5,
  ctx(w1) = Σ_w2 c(w1,w2) (bigram-prefix total), V = distinct unigram
  count.  Unseen bigram → c = 0; unseen context → ctx = 0 (p = 1/V).
  Pure integer counts + one closed-form division: reproducible at any
  parallelism and SQL-mirrorable without iteration.
* **Scoring** (``score_perplexity``): assets broadcast once via
  ``ray.put`` (per-worker memo, util.get_broadcast); one zero-shuffle
  row-local pass.  Per doc: logprob = Σ_{i=2..n} ln p(w_i | w_{i-1})
  accumulated with ``math.fsum`` (exactly-rounded, so block splits can
  never reorder a doc's sum into a different float) and perplexity =
  exp(-logprob / (n-1)), rounded to 6 digits to absorb the oracle's
  unordered-sum ulps.  Docs with < 2 tokens score NULL with
  ``n_bigrams`` 0.  Per-process ln-probability memo keyed on the
  (w1, w2) pair: the cost is per DISTINCT bigram, not per occurrence.

Tokenization is the dedup-family tokenizer (``dedup._tokens``: lower,
whitespace split, empties dropped) so the oracle reuses the classifier's
split expression.

Scale shape at 100 TB: training is the TF tree (vocabulary-bounded
intermediates, floor for the noise tail); scoring is embarrassingly
parallel.  The bigram table of a deduplicated web corpus is
O(vocabulary)·fan-out — with ``min_count=2`` it fits a driver/object
store comfortably (singleton bigrams are the overwhelming tail mass);
beyond that, train on a deterministic hash-sample (stages/sampling.py)
like CCNet itself does — the estimator changes, the plumbing does not.

The reference engine has no LM counterpart; this is part of the
LLM-pipeline surface this engine adds (brief: text quality scoring).
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import pyarrow as pa

from uk_address_matcher_ray import util
from uk_address_matcher_ray.stages.dedup import _tokens

SMOOTH_A = 0.5

_EMPTY_COUNTS = pa.table(
    {
        "w1": pa.array([], pa.string()),
        "w2": pa.array([], pa.string()),
        "c": pa.array([], pa.int64()),
    }
)


def _bigram_partial(batch: pa.Table, text_col: str) -> pa.Table:
    """Per-batch (w1, w2, count) partial + (w, NULL, count) unigram rows.

    Unigram rows ride the same exchange (w2 IS NULL tags them) so one
    tree merge carries both tables; vocabulary V falls out of the
    distinct unigram keys."""
    w1s: list = []
    w2s: list = []
    for text in batch.column(text_col).to_pylist():
        toks = _tokens(text)
        if not toks:
            continue
        w1s.extend(toks[:-1])
        w2s.extend(toks[1:])
        w1s.extend(toks)  # unigram rows (w, NULL) for every position
        w2s.extend([None] * len(toks))
    if not w1s:
        return _EMPTY_COUNTS
    t = pa.table(
        {
            "w1": pa.array(w1s, pa.string()),
            "w2": pa.array(w2s, pa.string()),
        }
    )
    agg = t.group_by(["w1", "w2"]).aggregate([([], "count_all")])
    return agg.rename_columns(["w1", "w2", "c"])


def corpus_lm_assets(
    ds, text_col: str = "text", min_count: int = 0
) -> Tuple[Dict[Tuple[str, str], int], Dict[str, int], int]:
    """Train the bigram model -> (bigram_counts, context_totals, V).

    Tree-merged partial counts (see module docstring); ``min_count``
    floors the bigram table AFTER context totals and V are computed, so
    surviving probabilities are bit-identical to the unfloored model.
    """
    import ray

    partials = ds.map_batches(
        lambda b: _bigram_partial(b, text_col),
        batch_format="pyarrow",
        batch_size=8192,
    )
    refs = list(partials.to_arrow_refs())

    @ray.remote
    def merge(*tbls):
        live = [t for t in tbls if t.num_rows > 0 and "w1" in t.schema.names]
        if not live:
            return _EMPTY_COUNTS
        t = pa.concat_tables(live)
        agg = t.group_by(["w1", "w2"]).aggregate([("c", "sum")])
        return agg.rename_columns(["w1", "w2", "c"])

    while len(refs) > 1:
        refs = [merge.remote(*refs[i : i + 8]) for i in range(0, len(refs), 8)]
    tbl = ray.get(refs[0]) if refs else _EMPTY_COUNTS

    bigrams: Dict[Tuple[str, str], int] = {}
    ctx: Dict[str, int] = {}
    vocab = 0
    w1_col = tbl.column("w1").to_pylist()
    w2_col = tbl.column("w2").to_pylist()
    c_col = tbl.column("c").to_pylist()
    for w1, w2, c in zip(w1_col, w2_col, c_col):
        if w2 is None:  # unigram row: every distinct token appears once here
            vocab += 1
            continue
        ctx[w1] = ctx.get(w1, 0) + c
        if c >= min_count:
            bigrams[(w1, w2)] = c
    return bigrams, ctx, vocab


def score_perplexity(
    ds,
    assets,
    id_col: str = "doc_id",
    text_col: str = "text",
    a: float = SMOOTH_A,
):
    """-> Dataset(id, n_bigrams, perplexity) — one zero-shuffle pass.

    ``assets``: the ``corpus_lm_assets`` triple or a ``ray.put`` ref of it
    (broadcast once, per-worker memo)."""
    id_field = None

    def kernel(batch: pa.Table) -> pa.Table:
        bigrams, ctx, vocab = util.get_broadcast(assets)
        av = a * vocab
        memo: Dict[Tuple[str, str], float] = {}
        n_out: list = []
        ppl_out: list = []
        for text in batch.column(text_col).to_pylist():
            toks = _tokens(text)
            n = len(toks)
            if n < 2:
                n_out.append(0)
                ppl_out.append(None)
                continue
            terms = []
            for i in range(1, n):
                key = (toks[i - 1], toks[i])
                lp = memo.get(key)
                if lp is None:
                    c = bigrams.get(key, 0)
                    cc = ctx.get(key[0], 0)
                    lp = math.log((c + a) / (cc + av))
                    memo[key] = lp
                terms.append(lp)
            s = math.fsum(terms)
            n_out.append(n - 1)
            ppl_out.append(round(math.exp(-s / (n - 1)), 6))
        return pa.table(
            {
                id_col: batch.column(id_col),
                "n_bigrams": pa.array(n_out, pa.int64()),
                "perplexity": pa.array(ppl_out, pa.float64()),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        kernel, batch_format="pyarrow"
    )


def lm_perplexity(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Train-on-corpus + score-corpus convenience (the CCNet query shape
    when the curated LM corpus IS the input — tests/oracle use this; a
    production filter passes a different training Dataset)."""
    import ray

    assets = corpus_lm_assets(ds, text_col=text_col)
    return score_perplexity(
        ds, ray.put(assets), id_col=id_col, text_col=text_col
    )


def lm_perplexity_sql(a: float = SMOOTH_A) -> str:
    """DuckDB mirror: identical tokenization, integer counts, closed-form
    smoothing; ln-term sum order differs from fsum at ~1e-15 — absorbed
    by the 6-digit rounding both sides apply."""
    tok_split = (
        "list_filter(regexp_split_to_array(lower(trim(coalesce(text, ''))),"
        " '\\s+'), t -> t != '')"
    )
    return f"""
WITH docs AS (SELECT doc_id, {tok_split} AS t FROM documents),
tok AS (SELECT unnest(t) AS w FROM docs),
big AS (
    SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
    FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM docs)
),
voc AS (SELECT count(DISTINCT w) AS v FROM tok),
bc AS (SELECT w1, w2, count(*) AS c FROM big GROUP BY w1, w2),
ctx AS (SELECT w1, sum(c) AS cc FROM bc GROUP BY w1),
lp AS (
    SELECT b.doc_id,
           ln((bc.c + {a!r}) / (ctx.cc + {a!r} * voc.v)) AS l
    FROM big b
    JOIN bc ON b.w1 = bc.w1 AND b.w2 = bc.w2
    JOIN ctx ON b.w1 = ctx.w1
    CROSS JOIN voc
),
agg AS (SELECT doc_id, count(*) AS n_bigrams, sum(l) AS s FROM lp GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(a.n_bigrams, 0) AS n_bigrams,
       round(exp(-a.s / a.n_bigrams), 6) AS perplexity
FROM docs d LEFT JOIN agg a USING (doc_id)
"""
