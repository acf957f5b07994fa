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


def _score_texts(texts, assets, a: float):
    """(n_bigrams, perplexity) lists for a batch — the shared scoring
    loop of ``score_perplexity`` and ``ccnet_perplexity_buckets``.
    math.fsum + Python-float transcendentals per the determinism
    contract (see module docstring); per-process memo per distinct
    bigram."""
    bigrams, ctx, vocab = assets
    av = a * vocab
    memo: Dict[Tuple[str, str], float] = {}
    n_out: list = []
    ppl_out: list = []
    for text in texts:
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
    return n_out, ppl_out


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
        n_out, ppl_out = _score_texts(
            batch.column(text_col).to_pylist(), util.get_broadcast(assets), a
        )
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


# ---------------------------------------------------------------------------
# CCNet head/middle/tail perplexity bucketing
# ---------------------------------------------------------------------------

_Q1, _Q2 = 1.0 / 3.0, 2.0 / 3.0


def ccnet_perplexity_buckets(
    ds,
    id_col: str = "doc_id",
    lang_col: str = "lang",
    text_col: str = "text",
    a: float = SMOOTH_A,
):
    """-> Dataset(id, lang, n_bigrams, perplexity, bucket) — CCNet's
    three-way quality split (Wenzek et al. 2020 §4.4: per-language
    perplexity tertiles name the 'head', 'middle' and 'tail' of the
    crawl; most pipelines keep head+middle).

    Stages (all shapes already in the engine):

    1. **LM + score**: ``corpus_lm_assets`` tree merge, then one
       zero-shuffle scoring pass that carries ``lang`` through and adds
       ``pbin = floor(perplexity * 100)`` — an int64 centi-perplexity
       bin, bounding the cutoff histogram's distinct-value space (the
       ``stages/quantiles`` contract) while moving a document across a
       tertile edge by at most 0.01 perplexity.  The scored Dataset is
       SKINNY (two ints, a double, a lang code) and is materialized so
       the cutoff pass and the bucket pass don't re-score; at corpus
       scale checkpoint it to parquet instead (state/checkpoint) —
       same two consumers, spill-backed.
    2. **Cutoffs**: exact type-1 tertiles of ``pbin`` per language via
       ``stages/quantiles.grouped_quantiles`` (histogram exchange, never
       the corpus); the driver holds languages x 2 cutoff rows.
    3. **Assign**: zero-shuffle row-local pass — ``head`` if
       ``pbin <= c(1/3)``, ``middle`` if ``<= c(2/3)``, else ``tail``;
       docs with no bigrams (NULL perplexity) keep a NULL bucket and are
       excluded from the cutoff histogram, exactly like the oracle.

    q·n products use the same q = 1/3, 2/3 doubles on both sides, so
    ceil() agrees bit-exactly (q < true third strictly, and the slack
    exceeds the product's rounding error for any n below ~1e15).
    """
    import ray

    from uk_address_matcher_ray.stages.quantiles import grouped_quantiles

    assets_ref = ray.put(corpus_lm_assets(ds, text_col=text_col))
    id_type = dict(zip(ds.schema().names, ds.schema().types))[id_col]
    scored_schema = pa.schema(
        [
            pa.field(id_col, id_type),
            pa.field(lang_col, pa.string()),
            pa.field("n_bigrams", pa.int64()),
            pa.field("perplexity", pa.float64()),
            pa.field("pbin", pa.int64()),
        ]
    )

    def score_kernel(batch: pa.Table) -> pa.Table:
        n_out, ppl_out = _score_texts(
            batch.column(text_col).to_pylist(),
            util.get_broadcast(assets_ref),
            a,
        )
        pbin = [
            None if p is None else math.floor(p * 100.0) for p in ppl_out
        ]
        return pa.Table.from_arrays(
            [
                batch.column(id_col).combine_chunks(),
                batch.column(lang_col).cast(pa.string()).combine_chunks(),
                pa.array(n_out, pa.int64()),
                pa.array(ppl_out, pa.float64()),
                pa.array(pbin, pa.int64()),
            ],
            schema=scored_schema,
        )

    scored = (
        ds.select_columns([id_col, lang_col, text_col])
        .map_batches(score_kernel, batch_format="pyarrow")
        .materialize()
    )

    import pyarrow.compute as pc

    cuts_rows = grouped_quantiles(
        scored.map_batches(
            lambda t: t.filter(pc.is_valid(t.column("pbin"))),
            batch_format="pyarrow",
        ),
        [_Q1, _Q2],
        value_col="pbin",
        group_col=lang_col,
    ).take_all()
    cuts: dict = {}
    for r in cuts_rows:
        c1, c2 = cuts.get(r["g"], (None, None))
        if r["q"] == _Q1:
            c1 = r["value"]
        else:
            c2 = r["value"]
        cuts[r["g"]] = (c1, c2)

    out_schema = pa.schema(list(scored_schema)[:4] + [pa.field("bucket", pa.string())])

    def assign(batch: pa.Table) -> pa.Table:
        langs = batch.column(lang_col).to_pylist()
        pbins = batch.column("pbin").to_pylist()
        buckets = []
        for lg, pb in zip(langs, pbins):
            if pb is None:
                buckets.append(None)
                continue
            c1, c2 = cuts[lg]
            buckets.append("head" if pb <= c1 else "middle" if pb <= c2 else "tail")
        return pa.Table.from_arrays(
            [batch.column(f.name).combine_chunks() for f in list(scored_schema)[:4]]
            + [pa.array(buckets, pa.string())],
            schema=out_schema,
        )

    return scored.map_batches(assign, batch_format="pyarrow")


def ccnet_buckets_sql(a: float = SMOOTH_A) -> str:
    """DuckDB mirror: the lm oracle as a materialized CTE, centi-bins,
    the grouped_quantiles type-1 formula per language, bucket CASE."""
    return f"""
WITH perp AS MATERIALIZED ({lm_perplexity_sql(a)}),
scored AS (
    SELECT d.doc_id, d.lang, p.n_bigrams, p.perplexity,
           CAST(floor(p.perplexity * 100) AS BIGINT) AS pbin
    FROM documents d JOIN perp p USING (doc_id)
),
h AS (
    SELECT lang AS g, pbin AS v, count(*) AS c FROM scored
    WHERE pbin IS NOT NULL GROUP BY 1, 2
),
tot AS (SELECT g, sum(c) AS n FROM h GROUP BY g),
cum AS (SELECT g, v, sum(c) OVER (PARTITION BY g ORDER BY v) AS cc FROM h),
cut AS (
    SELECT cum.g,
           min(cum.v) FILTER (
               WHERE cum.cc >= greatest(ceil({_Q1!r} * tot.n), 1)) AS c1,
           min(cum.v) FILTER (
               WHERE cum.cc >= greatest(ceil({_Q2!r} * tot.n), 1)) AS c2
    FROM cum JOIN tot USING (g) GROUP BY cum.g
)
SELECT s.doc_id, s.lang, s.n_bigrams, s.perplexity,
       CASE WHEN s.pbin IS NULL THEN NULL
            WHEN s.pbin <= cut.c1 THEN 'head'
            WHEN s.pbin <= cut.c2 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM scored s LEFT JOIN cut ON s.lang = cut.g
"""
