"""Multinomial Naive Bayes language classifier (train + predict on the
engine) — the fastText/langdetect estimator family reduced to its exact
classical core so the whole computation is distributed AND bit-exactly
SQL-mirrorable.

Web-corpus pipelines carry a TRAINED language classifier (CCNet uses
fastText, earlier stacks used langdetect's Naive Bayes); the engine's
``textstats.lang_id`` is an unsupervised heuristic.  This stage learns a
multinomial NB over character bigrams from LABELED documents and scores
any text:

* **Training** (``nb_lang_assets``): one streaming pass emits per-batch
  PARTIAL (lang, gram, count) tables (character bigrams of the lowered
  text, counted inside the batch) plus (lang, NULL, doc_count) prior
  rows riding the same exchange — merged in the fan-in-8 tree of
  ``stages/tf``/``stages/lm``.  Integer counts: exact at any tree shape;
  intermediates stay vocabulary-bounded (bigram space ≤ alphabet²).
* **Model**: p(g | L) = (c(L,g) + a) / (tot(L) + a·V), a = 1 (Laplace),
  V = distinct grams over ALL languages; prior p(L) = docs(L) / docs.
* **Scoring** (``nb_lang_predict``): assets broadcast once; one
  zero-shuffle pass.  score(L) = ln p(L) + Σ_grams ln p(g | L) summed
  with ``math.fsum`` and ROUNDED TO 6 DIGITS (the lm.py float regime —
  the rounding absorbs the oracle's unordered-sum ulps), prediction =
  argmax over the ROUNDED scores with ties broken by language name
  ascending (stated so the SQL ROW_NUMBER tie-break is identical).
  Texts with no bigram (< 2 chars) predict NULL.  Per-process
  ln-probability memo per distinct (gram, lang).

Driver-query shape: docs with ``doc_id % 3 != 0`` act as the labeled
training set; every doc is scored (a self-training split, like the
label-evaluation query's convention).

Scale shape at 100 TB: training partials are alphabet²-bounded rows per
batch, the tree merge is the TF tree; scoring is embarrassingly
parallel with the model (|langs| × V floats after memoization) broadcast
once per node via ``ray.put``.

The reference engine has no classifier surface; part of the
LLM-pipeline surface this engine adds (brief: language ID).
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import pyarrow as pa

from uk_address_matcher_ray import util

SMOOTH_A = 1.0

_EMPTY = pa.table(
    {
        "lang": pa.array([], pa.string()),
        "g": pa.array([], pa.string()),
        "c": pa.array([], pa.int64()),
    }
)


def _grams(text) -> list:
    s = (text or "").lower()
    return [s[i : i + 2] for i in range(len(s) - 1)]


def _partial(batch: pa.Table, lang_col: str, text_col: str) -> pa.Table:
    langs = batch.column(lang_col).to_pylist()
    texts = batch.column(text_col).to_pylist()
    ls: list = []
    gs: list = []
    for lg, t in zip(langs, texts):
        grams = _grams(t)
        ls.extend([lg] * (len(grams) + 1))
        gs.extend(grams)
        gs.append(None)  # (lang, NULL) prior row: one per doc
    if not ls:
        return _EMPTY
    t = pa.table(
        {"lang": pa.array(ls, pa.string()), "g": pa.array(gs, pa.string())}
    )
    agg = t.group_by(["lang", "g"]).aggregate([([], "count_all")])
    return agg.rename_columns(["lang", "g", "c"])


def nb_lang_assets(ds, lang_col: str = "lang", text_col: str = "text"):
    """-> (counts {(lang, gram): c}, totals {lang: grams}, priors
    {lang: docs}, V, n_docs)."""
    import ray

    partials = ds.map_batches(
        lambda b: _partial(b, lang_col, text_col),
        batch_format="pyarrow",
        batch_size=8192,
    )
    refs = list(partials.to_arrow_refs())

    @ray.remote
    def merge(*tbls):
        live = [t for t in tbls if t.num_rows > 0]
        if not live:
            return _EMPTY
        t = pa.concat_tables(live)
        agg = t.group_by(["lang", "g"]).aggregate([("c", "sum")])
        return agg.rename_columns(["lang", "g", "c"])

    while len(refs) > 1:
        refs = [merge.remote(*refs[i : i + 8]) for i in range(0, len(refs), 8)]
    tbl = ray.get(refs[0]) if refs else _EMPTY

    counts: Dict[Tuple[str, str], int] = {}
    totals: Dict[str, int] = {}
    priors: Dict[str, int] = {}
    vocab = set()
    for lg, g, c in zip(
        tbl.column("lang").to_pylist(),
        tbl.column("g").to_pylist(),
        tbl.column("c").to_pylist(),
    ):
        if g is None:
            priors[lg] = priors.get(lg, 0) + c
            continue
        counts[(lg, g)] = c
        totals[lg] = totals.get(lg, 0) + c
        vocab.add(g)
    return counts, totals, priors, len(vocab), sum(priors.values())


def nb_lang_predict(
    ds,
    assets,
    id_col: str = "doc_id",
    text_col: str = "text",
    a: float = SMOOTH_A,
):
    """-> Dataset(id, pred_lang, score) — zero-shuffle broadcast pass."""
    id_type = dict(zip(ds.schema().names, ds.schema().types))[id_col]
    out_schema = pa.schema(
        [
            pa.field(id_col, id_type),
            pa.field("pred_lang", pa.string()),
            pa.field("score", pa.float64()),
        ]
    )

    def kernel(batch: pa.Table) -> pa.Table:
        import numpy as np

        counts, totals, priors, V, n_docs = util.get_broadcast(assets)
        langs = sorted(priors)
        av = a * V
        lp_prior = {lg: math.log(priors[lg] / n_docs) for lg in langs}
        memo: Dict[Tuple[str, str], float] = {}

        def lp_of(lg: str, g: str) -> float:
            key = (lg, g)
            lp = memo.get(key)
            if lp is None:
                lp = math.log(
                    (counts.get(key, 0) + a) / (totals.get(lg, 0) + av)
                )
                memo[key] = lp
            return lp

        def score_doc(term_arrays):
            """term_arrays: {lang: array-like of per-gram lp in gram
            order}; same fsum([prior] + terms) + round-6 + first-wins
            argmax as the scalar chain."""
            best_lang, best_score = None, None
            for lg in langs:
                s = round(
                    math.fsum(
                        np.concatenate(
                            [[lp_prior[lg]], term_arrays[lg]]
                        )
                    ),
                    6,
                )
                if best_score is None or s > best_score:
                    best_lang, best_score = lg, s
            return best_lang, best_score

        texts = batch.column(text_col).to_pylist()
        preds: list = [None] * len(texts)
        scores: list = [None] * len(texts)
        # vectorized path for pure-ASCII texts: byte-pair codes over the
        # lowered buffer, math.log only on DISTINCT (lang, gram) pairs —
        # identical lp values (same args to the same log), identical
        # per-doc fsum order, so scores are bit-equal to the scalar path
        lowered = [(t or "").lower() for t in texts]
        ascii_rows = [
            i for i, s in enumerate(lowered) if s.isascii() and len(s) >= 2
        ]
        if ascii_rows:
            bufs = [lowered[i].encode() for i in ascii_rows]
            arrs = [np.frombuffer(b, np.uint8) for b in bufs]
            code_seqs = [
                a_.astype(np.int32)[:-1] * 256 + a_.astype(np.int32)[1:]
                for a_ in arrs
            ]
            uniq = np.unique(np.concatenate(code_seqs))
            grams_u = [chr(c >> 8) + chr(c & 0xFF) for c in uniq.tolist()]
            luts = {}
            for lg in langs:
                luts[lg] = np.array(
                    [lp_of(lg, g) for g in grams_u], np.float64
                )
            for i, seq in zip(ascii_rows, code_seqs):
                pos = np.searchsorted(uniq, seq)
                preds[i], scores[i] = score_doc(
                    {lg: luts[lg][pos] for lg in langs}
                )
        for i, s in enumerate(lowered):
            if s.isascii() and len(s) >= 2:
                continue  # handled by the vectorized path (or gramless)
            grams = [s[j : j + 2] for j in range(len(s) - 1)]
            if not grams:
                continue
            preds[i], scores[i] = score_doc(
                {
                    lg: np.array(
                        [lp_of(lg, g) for g in grams], np.float64
                    )
                    for lg in langs
                }
            )
        return pa.Table.from_arrays(
            [
                batch.column(id_col).combine_chunks(),
                pa.array(preds, pa.string()),
                pa.array(scores, pa.float64()),
            ],
            schema=out_schema,
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        kernel, batch_format="pyarrow"
    )


def nb_lang_id(
    ds,
    train_ds=None,
    id_col: str = "doc_id",
    lang_col: str = "lang",
    text_col: str = "text",
):
    """Train + predict convenience; ``train_ds`` defaults to ``ds``."""
    import ray

    assets = nb_lang_assets(
        train_ds if train_ds is not None else ds, lang_col, text_col
    )
    return nb_lang_predict(ds, ray.put(assets), id_col, text_col)


def nb_lang_sql(
    a: float = SMOOTH_A,
    train_filter: str = "doc_id % 3 != 0",
    table: str = "documents",
) -> str:
    """DuckDB mirror: identical gram grid, integer counts, closed-form
    smoothing, round-6 scores, (score DESC, lang ASC) argmax."""
    return f"""
WITH train AS MATERIALIZED (
    SELECT lang, lower(coalesce(text, '')) AS s FROM {table}
    WHERE {train_filter}
),
tg AS MATERIALIZED (
    SELECT lang, substr(s, i, 2) AS g
    FROM (SELECT lang, s, unnest(range(1, len(s))) AS i FROM train)
),
cnt AS (SELECT lang, g, count(*) AS c FROM tg GROUP BY lang, g),
tot AS (SELECT lang, sum(c) AS tot FROM cnt GROUP BY lang),
voc AS (SELECT count(DISTINCT g) AS v FROM tg),
pri AS (
    SELECT lang, count(*) AS d FROM train GROUP BY lang
),
nd AS (SELECT sum(d) AS n FROM pri),
docs AS (SELECT doc_id, lower(coalesce(text, '')) AS s FROM {table}),
dg AS MATERIALIZED (
    SELECT doc_id, substr(s, i, 2) AS g
    FROM (SELECT doc_id, s, unnest(range(1, len(s))) AS i FROM docs)
),
scored AS (
    SELECT d.doc_id, p.lang,
           round(
               ln(CAST(p.d AS DOUBLE) / (SELECT n FROM nd))
               + sum(ln((coalesce(c.c, 0) + CAST({a!r} AS DOUBLE))
                        / (t.tot + CAST({a!r} AS DOUBLE) * (SELECT v FROM voc)))),
               6) AS score
    FROM dg d
    CROSS JOIN pri p
    JOIN tot t ON t.lang = p.lang
    LEFT JOIN cnt c ON c.lang = p.lang AND c.g = d.g
    GROUP BY d.doc_id, p.lang, p.d
),
best AS (
    SELECT doc_id, lang AS pred_lang, score,
           ROW_NUMBER() OVER (
               PARTITION BY doc_id ORDER BY score DESC, lang) AS rn
    FROM scored
)
SELECT dd.doc_id, b.pred_lang, b.score
FROM (SELECT doc_id FROM docs) dd
LEFT JOIN best b ON b.doc_id = dd.doc_id AND b.rn = 1
"""
