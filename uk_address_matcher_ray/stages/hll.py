"""HyperLogLog distinct-count sketch — grouped cardinality estimation.

"How many distinct tokens / urls / shingles per language?" at 100 TB
cannot afford a COUNT(DISTINCT) shuffle of the values; HLL answers it
with m registers per group.  This implementation is FULLY DETERMINISTIC
and bit-exact against a DuckDB restatement — unusual for a sketch, and
the property that lets the driver oracle hash-check it:

* hash = ``h60`` (md5, 60 bits — functions/hashing.py, the engine-wide
  SQL-mirrorable primitive); bucket j = top ``p`` bits, w = the
  remaining ``48`` bits (p=12), rho(w) = leading-zero count within
  those 48 bits + 1 (w=0 -> 49).
* register M[j] = max rho — max-merge, so per-batch partials combine
  exactly in any order/tree shape (the same order-free-merge argument
  as the integer moments).
* the harmonic sum is computed in the INTEGER domain:
  S = sum_j 2^(49 - M[j]) (empty register -> 2^49), an exact int64
  (S <= m * 2^49 = 2^61) — no float-summation-order dependence.
* raw estimate = alpha_m * m^2 * 2^49 / S with alpha embedded as one
  repr'd double literal; small-range correction
  ``m * ln(m / zeros)`` when raw <= 2.5m and zeros > 0.  One stated
  expression shape on both engines.  (No large-range correction: the
  60-bit hash space makes it irrelevant below ~2^30 distincts, and
  both engines omit it identically.)

Scale shape: each batch emits at most m x groups-in-batch (group, j,
rho) rows pre-maxed per (group, j); one group-keyed exchange; driver
sees only the final (group, estimate) rows.  Standard error ~1.04/
sqrt(m) = 1.6% at p=12.

Reference: Flajolet et al., "HyperLogLog: the analysis of a near-optimal
cardinality estimation algorithm" (AofA 2007) — public algorithm.
"""

from __future__ import annotations

import math

import pyarrow as pa

from uk_address_matcher_ray.functions import hashing as H

P_BITS = 12
M_REG = 1 << P_BITS  # 4096
W_BITS = 60 - P_BITS  # 48
RHO_MAX = W_BITS + 1  # 49
_ALPHA = 0.7213 / (1.0 + 1.079 / M_REG)
_POW_M2_2W = float(M_REG) * M_REG * float(1 << RHO_MAX)  # 2^73, exact double


def _rho(w: int) -> int:
    """Leading-zero count within W_BITS bits, + 1; w == 0 -> RHO_MAX."""
    if w == 0:
        return RHO_MAX
    return W_BITS - w.bit_length() + 1


def _estimate(s_int: int, zeros: int) -> float:
    raw = _ALPHA * _POW_M2_2W / float(s_int)
    if raw <= 2.5 * M_REG and zeros > 0:
        return float(M_REG) * math.log(float(M_REG) / zeros)
    return raw


def hll_distinct(ds, value_fn, group_col: str):
    """Dataset(group, zeros, s, estimate) — approximate distinct count of
    the values ``value_fn(batch) -> list[(group, str_value)]`` yields,
    per group.  ``value_fn`` runs inside the batch task (row-local)."""
    from uk_address_matcher_ray.stages.grouped import grouped_map

    sch = ds.schema()
    group_type = dict(zip(sch.names, sch.types))[group_col]

    def partial(batch: pa.Table) -> pa.Table:
        regs: dict = {}  # (group, j) -> max rho
        for g, v in value_fn(batch):
            h = H.h60(v)
            j = h >> W_BITS
            r = _rho(h & ((1 << W_BITS) - 1))
            key = (g, j)
            if r > regs.get(key, 0):
                regs[key] = r
        gs, js, rs = [], [], []
        for (g, j), r in regs.items():
            gs.append(g)
            js.append(j)
            rs.append(r)
        return pa.table(
            {
                group_col: pa.array(gs, group_type),
                "j": pa.array(js, pa.int32()),
                "rho": pa.array(rs, pa.int32()),
            }
        )

    out_schema = pa.schema(
        [
            pa.field(group_col, group_type),
            pa.field("zeros", pa.int64()),
            pa.field("s", pa.int64()),
            pa.field("estimate", pa.float64()),
        ]
    )

    def finalize(t: pa.Table) -> pa.Table:
        agg = t.group_by([group_col, "j"]).aggregate([("rho", "max")])
        regs: dict = {}
        for g, j, r in zip(
            agg.column(0).to_pylist(),
            agg.column(1).to_pylist(),
            agg.column(2).to_pylist(),
        ):
            regs.setdefault(g, {})[j] = r
        gs, zs, ss, es = [], [], [], []
        for g, m in regs.items():
            zeros = M_REG - len(m)
            s = zeros * (1 << RHO_MAX) + sum(1 << (RHO_MAX - r) for r in m.values())
            gs.append(g)
            zs.append(zeros)
            ss.append(s)
            es.append(_estimate(s, zeros))
        return pa.table(
            {
                group_col: pa.array(gs, group_type),
                "zeros": pa.array(zs, pa.int64()),
                "s": pa.array(ss, pa.int64()),
                "estimate": pa.array(es, pa.float64()),
            },
            schema=out_schema,
        )

    pre = ds.map_batches(partial, batch_format="pyarrow")
    return grouped_map(pre, group_col, None, out_schema, fn_table=finalize)


def hll_distinct_tokens(ds, group_col: str = "lang", text_col: str = "text"):
    """Distinct whitespace tokens per group (the corpus vocabulary-size
    report), via hll_distinct over the dedup-family tokenizer."""
    from uk_address_matcher_ray.stages.dedup import _tokens

    def values(batch: pa.Table):
        out = []
        for g, text in zip(
            batch.column(group_col).to_pylist(),
            batch.column(text_col).to_pylist(),
        ):
            for tok in _tokens(text):
                out.append((g, tok))
        return out

    return hll_distinct(
        ds.select_columns([group_col, text_col]), values, group_col
    )


def hll_distinct_tokens_sql(
    group_col: str = "lang", text_col: str = "text", table: str = "documents"
) -> str:
    """DuckDB mirror: identical md5 hash, register math, integer harmonic
    sum and estimate expression (rho via a generated threshold CASE —
    floor(log2()) is avoided because log2 of 2^e - 1 can round up to e
    for large e)."""
    rho_case = "CASE " + " ".join(
        f"WHEN w >= {1 << (W_BITS - r)} THEN {r}" for r in range(1, W_BITS + 1)
    ) + f" ELSE {RHO_MAX} END"
    tok_split = (
        f"list_filter(regexp_split_to_array(lower(trim(coalesce({text_col},"
        " ''))), '\\s+'), x -> x != '')"
    )
    return f"""
WITH vals AS (
    SELECT {group_col} AS g, unnest({tok_split}) AS v FROM {table}
),
h AS (
    SELECT g, CAST(('0x' || substr(md5(v), 1, 15)) AS BIGINT) AS h FROM vals
),
b AS (
    SELECT g, h >> {W_BITS} AS j, h & {(1 << W_BITS) - 1} AS w FROM h
),
r AS (
    SELECT g, j, MAX({rho_case}) AS m FROM b GROUP BY g, j
),
agg AS (
    SELECT g, COUNT(*) AS present,
           SUM(1::HUGEINT << ({RHO_MAX} - m)) AS s_present
    FROM r GROUP BY g
),
fin AS (
    SELECT g, {M_REG} - present AS zeros,
           CAST(({M_REG} - present) * (1::HUGEINT << {RHO_MAX})
                + s_present AS BIGINT) AS s
    FROM agg
)
SELECT g AS {group_col},
       CAST(zeros AS BIGINT) AS zeros,
       s,
       CASE WHEN ({_ALPHA!r} * {_POW_M2_2W!r} / CAST(s AS DOUBLE))
                 <= 2.5 * {M_REG} AND zeros > 0
            THEN CAST({M_REG} AS DOUBLE) * ln(CAST({M_REG} AS DOUBLE) / zeros)
            ELSE {_ALPHA!r} * {_POW_M2_2W!r} / CAST(s AS DOUBLE) END
           AS estimate
FROM fin
"""
