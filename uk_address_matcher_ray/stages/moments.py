"""Grouped moment statistics — count / sum / mean / variance / stddev per
group over an integer column (lengths, token counts, scores-in-cents).

The corpus-QA staple ("mean and spread of document length per language /
source") computed without a corpus sort: each batch contributes one
(group, cnt, sum, sum_sq) partial — integers, so partial aggregation is
EXACT and order-free (float Welford merges would be batch-order
dependent; integer moments are not). One group-keyed exchange of
partials, then closed-form finalization in a stated expression shape the
DuckDB oracle restates verbatim:

    mean    = CAST(s AS DOUBLE) / cnt
    var_pop = CAST(cnt*ss - s*s AS DOUBLE) / CAST(cnt*cnt AS DOUBLE)
    std_pop = sqrt(var_pop)

The variance numerator cnt*ss - s*s is computed in the integer domain
(Python int / DuckDB HUGEINT — no cancellation error), then one cast,
one divide, one sqrt. Exactness bound: the cast is bit-exact while
|cnt*ss - s*s| < 2^53 (e.g. a trillion docs of length <= 30k chars);
int64 partial sums bound value^2 * batch_rows < 2^63 per batch and
value^2 * group_rows < 2^63 per group — beyond that, route to the
histogram/quantiles path (stages/quantiles.py).

Scale shape: the exchange carries one 4-int row per (group, batch) —
groups x upstream-blocks, never the corpus. Skew-immune by construction.
"""

from __future__ import annotations

import math

import pyarrow as pa


def grouped_moments(ds, value_col: str, group_col: str):
    """-> Dataset(group, n, total, mean, var_pop, std_pop)."""
    import numpy as np

    from uk_address_matcher_ray.stages.grouped import grouped_map

    sch = ds.schema()
    group_type = dict(zip(sch.names, sch.types))[group_col]

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).cast(pa.int64())
        t = pa.table({group_col: batch.column(group_col), "v": v})
        vv = v.to_numpy(zero_copy_only=False)
        t = t.append_column("vv", pa.array(vv * vv, pa.int64()))
        agg = t.group_by(group_col).aggregate(
            [("v", "count"), ("v", "sum"), ("vv", "sum")]
        )
        return agg.rename_columns([group_col, "cnt", "s", "ss"])

    out_schema = pa.schema(
        [
            pa.field(group_col, group_type),
            pa.field("n", pa.int64()),
            pa.field("total", pa.int64()),
            pa.field("mean", pa.float64()),
            pa.field("var_pop", pa.float64()),
            pa.field("std_pop", pa.float64()),
        ]
    )

    def finalize(t: pa.Table) -> pa.Table:
        groups, ns, totals, means, vars_, stds = [], [], [], [], [], []
        agg = t.group_by(group_col).aggregate(
            [("cnt", "sum"), ("s", "sum"), ("ss", "sum")]
        )
        for g, cnt, s, ss in zip(
            agg.column(0).to_pylist(),
            agg.column(1).to_pylist(),
            agg.column(2).to_pylist(),
            agg.column(3).to_pylist(),
        ):
            cnt, s, ss = int(cnt), int(s), int(ss)  # exact int domain
            num = cnt * ss - s * s
            var = float(num) / float(cnt * cnt)
            groups.append(g)
            ns.append(cnt)
            totals.append(s)
            means.append(float(s) / cnt)
            vars_.append(var)
            stds.append(math.sqrt(var))
        return pa.table(
            {
                group_col: pa.array(groups, group_type),
                "n": pa.array(ns, pa.int64()),
                "total": pa.array(totals, pa.int64()),
                "mean": pa.array(means, pa.float64()),
                "var_pop": pa.array(vars_, pa.float64()),
                "std_pop": pa.array(stds, pa.float64()),
            },
            schema=out_schema,
        )

    pre = ds.select_columns([group_col, value_col]).map_batches(
        partial, batch_format="pyarrow"
    )
    return grouped_map(pre, group_col, None, out_schema, fn_table=finalize)


def grouped_moments_sql(
    value_expr: str, group_col: str, table: str = "documents"
) -> str:
    """DuckDB mirror: HUGEINT integer moments, then the identical cast /
    divide / sqrt chain."""
    return f"""
WITH m AS (
    SELECT {group_col},
           COUNT(*) AS cnt,
           SUM(CAST({value_expr} AS HUGEINT)) AS s,
           SUM(CAST({value_expr} AS HUGEINT) * CAST({value_expr} AS HUGEINT))
               AS ss
    FROM {table} GROUP BY 1
)
SELECT {group_col},
       CAST(cnt AS BIGINT) AS n,
       CAST(s AS BIGINT) AS total,
       CAST(s AS DOUBLE) / cnt AS mean,
       CAST(cnt * ss - s * s AS DOUBLE) / CAST(cnt * cnt AS DOUBLE)
           AS var_pop,
       sqrt(CAST(cnt * ss - s * s AS DOUBLE) / CAST(cnt * cnt AS DOUBLE))
           AS std_pop
FROM m
"""
