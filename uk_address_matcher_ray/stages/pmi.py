"""Windowed token co-occurrence PMI — the word2vec/GloVe preprocessing
statistic: for every unordered pair of frequent tokens that co-occur
within ``window`` positions, the pointwise mutual information of the
pair against the unigram distribution.

A training-data pipeline uses this to mine collocations (for tokenizer
seeding), to spot templated/boilerplate corpora (PMI spikes on page
furniture) and as the co-occurrence matrix for classical embeddings.

Contract (mirrored by ``token_pmi_sql``):

* tokens: the dedup-family tokenizer (lower / strip / split ``\\s+``);
* vocab = tokens with global occurrence count >= ``min_count`` — the
  same vocabulary-floor story as the TF table: the floor is what keeps
  the broadcast bounded at corpus scale;
* pair events: positions ``i < j <= i + window`` within one doc with
  BOTH tokens in vocab; the pair is unordered —
  ``(min(tok_i, tok_j), max(...))`` by byte order;
* ``T`` = total token occurrences (all tokens), ``P`` = total pair
  events, ``c_a`` / ``c_b`` = unigram counts, ``c_ab`` = pair count;
* ``pmi = round(ln(c_ab) + 2*ln(T) - ln(P) - ln(c_a) - ln(c_b), 6)``
  — every ln argument is an exact int64, the expression chain is
  written identically on both sides, round-6 absorbs associativity
  ulps (the lm.py float regime);
* output: pairs with ``c_ab >= min_pair`` (``P`` counts ALL pairs,
  pre-filter).

Scale shape: one unigram-count exchange (token-keyed, the same
pre-aggregated Counter partials as the TF build), then ONE pair
exchange keyed on the int64 ``a_id * V + b_id`` pair code (vocab ids,
not strings — the strings never ride the shuffle), with per-batch
Counter pre-aggregation in front of it.  The vocab broadcast is
``min_count``-bounded; window pairing is numpy shift algebra, no
per-pair Python.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np
import pyarrow as pa

from uk_address_matcher_ray import util

_TOK_SPLIT_SQL = (
    "list_filter(regexp_split_to_array(lower(trim(coalesce({x}, ''))),"
    " '\\s+'), t -> t != '')"
)


def unigram_counts(ds, text_col: str = "text"):
    """-> (Dataset(tok, c), total_tokens:int) via per-batch vectorized
    value_counts partials + one token-keyed groupby."""

    def partial(batch: pa.Table) -> pa.Table:
        from uk_address_matcher_ray.stages.dedup import flat_tokens

        _, flat = flat_tokens(batch.column(text_col))
        vc = flat.value_counts()
        return pa.table(
            {
                "tok": vc.field("values"),
                "c": vc.field("counts").cast(pa.int64()),
            }
        )

    counts = (
        ds.select_columns([text_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("tok")
        .sum("c")
    )
    counts = counts.map_batches(
        lambda b: b.rename_columns(["tok", "c"]), batch_format="pyarrow"
    ).materialize()  # distinct-token-sized; every consumer (total, vocab
    # filter, per-group joins) would otherwise re-run the corpus pass
    total = counts.sum("c") or 0
    return counts, int(total)


class _PairStage:
    """Window pair events coded as a_id * V + b_id over broadcast vocab
    (sorted-vocab ids via one vectorized ``index_in``)."""

    def __init__(self, vocab_ref, window: int, text_col: str):
        vocab = util.get_broadcast(vocab_ref)
        self.vocab_arr = pa.array(vocab, pa.string())
        self.v = len(vocab)
        self.window = window
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from uk_address_matcher_ray.stages.dedup import flat_tokens

        doc, flat = flat_tokens(batch.column(self.text_col))
        ids = (
            pc.fill_null(pc.index_in(flat, value_set=self.vocab_arr), -1)
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        codes = []
        for shift in range(1, self.window + 1):
            if len(ids) <= shift:
                break
            a, b = ids[:-shift], ids[shift:]
            ok = (doc[:-shift] == doc[shift:]) & (a >= 0) & (b >= 0)
            lo = np.minimum(a[ok], b[ok])
            hi = np.maximum(a[ok], b[ok])
            codes.append(lo * self.v + hi)
        if codes:
            code, cnt = np.unique(np.concatenate(codes), return_counts=True)
        else:
            code = cnt = np.empty(0, dtype=np.int64)
        return pa.table(
            {
                "code": pa.array(code, pa.int64()),
                "c": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )


def token_pmi(
    ds,
    window: int = 2,
    min_count: int = 5,
    min_pair: int = 2,
    text_col: str = "text",
    concurrency=None,
    unigrams=None,
):
    """-> Dataset(tok_a, tok_b, pair_count, pmi) for vocab pairs
    co-occurring within ``window`` positions at least ``min_pair``
    times."""
    import ray

    if unigrams is None:
        unigrams = unigram_counts(ds, text_col=text_col)
    counts, total = unigrams
    vocab_rows = counts.filter(expr=f"c >= {min_count}").take_all()
    vocab = sorted(r["tok"] for r in vocab_rows)
    cnt_of = {r["tok"]: int(r["c"]) for r in vocab_rows}
    out_schema = pa.schema(
        [
            pa.field("tok_a", pa.string()),
            pa.field("tok_b", pa.string()),
            pa.field("pair_count", pa.int64()),
            pa.field("pmi", pa.float64()),
        ]
    )
    if not vocab or total == 0:
        return ray.data.from_arrow(out_schema.empty_table())

    vocab_ref = ray.put(vocab)

    def pair_fn(batch: pa.Table) -> pa.Table:
        st = util.memo_stage(
            ("pmi_pair", vocab_ref.hex(), window, text_col),
            lambda: _PairStage(vocab_ref, window, text_col),
        )
        return st(batch)

    pairs = (
        ds.select_columns([text_col])
        .map_batches(
            pair_fn, batch_format="pyarrow", concurrency=concurrency
        )
        .groupby("code")
        .sum("c")
    )
    pairs = pairs.map_batches(
        lambda b: b.rename_columns(["code", "c"]), batch_format="pyarrow"
    ).materialize()  # post-agg, vocab²-bounded — avoids a second pair pass
    p_total = int(pairs.sum("c") or 0)
    if p_total == 0:
        return ray.data.from_arrow(out_schema.empty_table())

    v = len(vocab)
    ln_t2_p = 2 * math.log(total) - math.log(p_total)

    vocab_arr = pa.array(vocab, pa.string())
    cnt_arr = np.asarray([cnt_of[t] for t in vocab], dtype=np.float64)

    def finish(batch: pa.Table) -> pa.Table:
        code = batch.column("code").to_numpy()
        c = batch.column("c").to_numpy()
        keep = c >= min_pair
        code, c = code[keep], c[keep]
        ai, bi = code // v, code % v
        # identical association to the scalar chain; np.log(double) is
        # the same libm call math.log makes. Python round() per element
        # keeps the stated round-6 contract.
        raw = (
            np.log(c.astype(np.float64))
            + ln_t2_p
            - np.log(cnt_arr[ai])
            - np.log(cnt_arr[bi])
        )
        pmi = [round(float(x), 6) for x in raw]
        return pa.table(
            {
                "tok_a": vocab_arr.take(pa.array(ai)),
                "tok_b": vocab_arr.take(pa.array(bi)),
                "pair_count": pa.array(c, pa.int64()),
                "pmi": pa.array(pmi, pa.float64()),
            }
        )

    return pairs.map_batches(finish, batch_format="pyarrow")


def token_pmi_sql(
    table: str = "documents",
    window: int = 2,
    min_count: int = 5,
    min_pair: int = 2,
    text_col: str = "text",
) -> str:
    """DuckDB mirror: position self-join pairs, identical ln chain.

    NOTE ``2*ln(T)`` must parenthesize as the engine evaluates it:
    Python computes ``ln(c_ab) + 2*ln(T) - ln(P) - ...`` left to right;
    the SQL expression below is written with the same associativity.
    """
    toks = _TOK_SPLIT_SQL.format(x=text_col)
    # one EQUI-join per shift: an inequality band join re-evaluates
    # O(len²) candidate pairs per doc on long documents
    shifts = "\n    UNION ALL\n    ".join(
        "SELECT least(t1.tok, t2.tok) AS a, greatest(t1.tok, t2.tok) AS b"
        f" FROM vtoks t1 JOIN vtoks t2"
        f" ON t1.rid = t2.rid AND t2.pos = t1.pos + {s}"
        for s in range(1, window + 1)
    )
    return f"""
WITH toks AS (
    SELECT rid, t[i] AS tok, i AS pos
    FROM (SELECT rid, t, unnest(range(1, len(t) + 1)) AS i
          FROM (SELECT row_number() OVER () AS rid, {toks} AS t
                FROM {table})
          WHERE len(t) > 0)
),
uni AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
tot AS (SELECT count(*) AS t FROM toks),
vocab AS (SELECT tok, c FROM uni WHERE c >= {min_count}),
vtoks AS (
    SELECT toks.rid, toks.tok, toks.pos
    FROM toks JOIN vocab USING (tok)
),
pair_events AS (
    {shifts}
),
pc AS (SELECT a, b, count(*) AS c FROM pair_events GROUP BY a, b),
ptot AS (SELECT SUM(c) AS p FROM pc)
SELECT pc.a AS tok_a, pc.b AS tok_b,
       CAST(pc.c AS BIGINT) AS pair_count,
       round(ln(pc.c) + 2 * ln(tot.t) - ln(ptot.p)
             - ln(ua.c) - ln(ub.c), 6) AS pmi
FROM pc, tot, ptot
JOIN vocab ua ON ua.tok = pc.a
JOIN vocab ub ON ub.tok = pc.b
WHERE pc.c >= {min_pair}
"""
