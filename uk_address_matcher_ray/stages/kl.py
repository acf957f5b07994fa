"""Per-source unigram KL divergence vs the corpus — the domain-drift
statistic of a training-data mixing pipeline: which sources' token
distributions sit far from the corpus average (boilerplate farms, spam
domains, non-prose sources) and therefore deserve a mixing-weight or
quality look.

Contract (mirrored by ``source_kl_sql``):

* tokens: the dedup-family tokenizer; vocab = corpus count >=
  ``min_count`` (the vocabulary floor that bounds every broadcast);
* both distributions live on the vocab support: ``c_t`` / ``TV`` are
  corpus counts over vocab, ``cd_t`` / ``Td`` per-source counts over
  vocab;
* ``KL(d) = round( Σ_t (cd_t / Td) · ln( (cd_t · TV) / (Td · c_t) ),
  6 )`` summed over vocab tokens present in the source — every operand
  an exact int64, the term written with the identical cast/divide
  chain on both sides (products must stay < 2^53 for bit parity; at
  corpus scale the round-6 absorbs the tail), engine fsum vs SQL
  unordered SUM per the lm.py float regime;
* sources with zero vocab tokens emit no row.

Scale shape: pass 1 is the token-keyed unigram exchange (pre-aggregated
Counter partials); pass 2 pre-aggregates (source, tok, cd) per batch —
rows bounded by |sources|·|vocab| — and moves them through ONE
grouped exchange (``grouped_map`` keyed on source) whose group kernel
does the Td/fsum reduction with complete groups in hand.  The vocab
broadcast is ``min_count``-bounded.  No driver-side token state beyond
the floored vocab.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pyarrow as pa

from uk_address_matcher_ray import util
from uk_address_matcher_ray.stages.pmi import _TOK_SPLIT_SQL, unigram_counts


class _GroupTokStage:
    """Per-batch (group, tok, c) partials over broadcast vocab — one
    vectorized flatten + index_in membership + Arrow group_by count."""

    def __init__(self, vocab_ref, group_col: str, text_col: str):
        vocab = util.get_broadcast(vocab_ref)
        self.vocab_arr = pa.array(sorted(vocab), pa.string())
        self.group_col = group_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from uk_address_matcher_ray.stages.dedup import flat_tokens

        parents, flat = flat_tokens(batch.column(self.text_col))
        hit = pc.is_valid(
            pc.index_in(flat, value_set=self.vocab_arr)
        ).to_numpy(zero_copy_only=False)
        toks = flat.filter(pa.array(hit))
        groups = batch.column(self.group_col).take(pa.array(parents[hit]))
        t = (
            pa.table({"g": groups, "tok": toks})
            .group_by(["g", "tok"])
            .aggregate([("tok", "count")])
        )
        return pa.table(
            {
                "g": t.column("g"),
                "tok": t.column("tok"),
                "c": t.column("tok_count").cast(pa.int64()),
            }
        )


def source_kl(
    ds,
    min_count: int = 5,
    group_col: str = "source",
    text_col: str = "text",
    concurrency=None,
    unigrams=None,
):
    """-> Dataset(source, n_tokens, kl)."""
    import ray

    from uk_address_matcher_ray.stages.grouped import grouped_map

    if unigrams is None:
        unigrams = unigram_counts(ds, text_col=text_col)
    counts, _total = unigrams
    vocab_rows = counts.filter(expr=f"c >= {min_count}").take_all()
    cnt_of = {r["tok"]: int(r["c"]) for r in vocab_rows}
    tv = sum(cnt_of.values())
    out_schema = pa.schema(
        [
            pa.field("source", pa.string()),
            pa.field("n_tokens", pa.int64()),
            pa.field("kl", pa.float64()),
        ]
    )
    if not cnt_of:
        return ray.data.from_arrow(out_schema.empty_table())

    vocab_ref = ray.put(frozenset(cnt_of))
    cnt_ref = ray.put(cnt_of)

    def gt_fn(batch: pa.Table) -> pa.Table:
        st = util.memo_stage(
            ("kl_grouptok", vocab_ref.hex(), group_col, text_col),
            lambda: _GroupTokStage(vocab_ref, group_col, text_col),
        )
        return st(batch)

    partials = ds.select_columns([group_col, text_col]).map_batches(
        gt_fn, batch_format="pyarrow", concurrency=concurrency
    )

    def groups_kernel(tbl: pa.Table) -> pa.Table:
        cof = util.get_broadcast(cnt_ref)
        per: dict = defaultdict(Counter)
        for g, tok, c in zip(
            tbl.column("g").to_pylist(),
            tbl.column("tok").to_pylist(),
            tbl.column("c").to_pylist(),
        ):
            per[g][tok] += c
        out_g, out_n, out_kl = [], [], []
        for g in sorted(per):
            cd_map = per[g]
            td = sum(cd_map.values())
            terms = [
                (cd / td) * math.log((cd * tv) / (td * cof[t]))
                for t, cd in sorted(cd_map.items())
            ]
            out_g.append(g)
            out_n.append(td)
            out_kl.append(round(math.fsum(terms), 6))
        return pa.table(
            {
                "source": pa.array(out_g, pa.string()),
                "n_tokens": pa.array(out_n, pa.int64()),
                "kl": pa.array(out_kl, pa.float64()),
            }
        )

    return grouped_map(partials, "g", None, out_schema, fn_table=groups_kernel)


def source_kl_sql(
    table: str = "documents",
    min_count: int = 5,
    group_col: str = "source",
    text_col: str = "text",
) -> str:
    """DuckDB mirror: identical vocab floor, cast/divide term chain,
    unordered SUM + round 6."""
    toks = _TOK_SPLIT_SQL.format(x=text_col)
    return f"""
WITH toks AS (
    SELECT {group_col} AS g, unnest({toks}) AS tok FROM {table}
),
uni AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
vocab AS (SELECT tok, c FROM uni WHERE c >= {min_count}),
tv AS (SELECT CAST(SUM(c) AS BIGINT) AS v FROM vocab),
gt AS (
    SELECT g, tok, count(*) AS cd
    FROM toks JOIN vocab USING (tok) GROUP BY g, tok
),
td AS (SELECT g, CAST(SUM(cd) AS BIGINT) AS t FROM gt GROUP BY g),
terms AS (
    SELECT gt.g, td.t,
           (CAST(gt.cd AS DOUBLE) / td.t)
           * ln(CAST(gt.cd * tv.v AS DOUBLE)
                / CAST(td.t * vocab.c AS DOUBLE)) AS term
    FROM gt
    JOIN td ON td.g = gt.g
    JOIN vocab ON vocab.tok = gt.tok
    CROSS JOIN tv
)
SELECT g AS source, t AS n_tokens, round(SUM(term), 6) AS kl
FROM terms GROUP BY g, t
"""
