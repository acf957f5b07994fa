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


# ---------------------------------------------------------------------------
# Integer-exact z-score outliers
# ---------------------------------------------------------------------------

def grouped_outliers(
    ds,
    value_col: str,
    group_col: str,
    id_col: str = "doc_id",
    z: int = 3,
):
    """Rows whose ``value`` deviates more than ``z`` POPULATION standard
    deviations from their group mean -> Dataset(id, group, value) —
    the length-anomaly sweep (truncated pages, concatenation blowups,
    binary-in-text) run per source/language.

    The test is evaluated ENTIRELY in integers — no mean, no sqrt, no
    float anywhere, so there is no rounding boundary to disagree on:

        outlier(x)  <=>  (cnt·x - s)² > z² · (cnt·ss - s²)

    (multiply ``(x - s/cnt)² > z²·var_pop`` through by ``cnt²``; both
    sides are exact Python ints / DuckDB HUGEINTs).  Groups of size 1
    have zero variance and their single row is never an outlier
    (LHS = 0 = RHS).

    Scale shape: the moments pass (one 4-int partial per group x batch,
    one skinny exchange), group stats broadcast (one 3-int row per
    group — the per-source boundedness assumption), then a zero-shuffle
    row-local flag pass.  Mirrored by ``grouped_outliers_sql``.
    """
    import ray

    from uk_address_matcher_ray import util

    def mom_partial(batch: pa.Table) -> pa.Table:
        import numpy as np

        g = batch.column(group_col).to_pylist()
        v = batch.column(value_col).to_numpy(zero_copy_only=False)
        agg: dict = {}
        for gi, vi in zip(g, v):
            c = agg.get(gi)
            x = int(vi)
            if c is None:
                agg[gi] = [1, x, x * x]
            else:
                c[0] += 1
                c[1] += x
                c[2] += x * x
        keys = sorted(agg)
        return pa.table(
            {
                "g": pa.array(keys, pa.string()),
                "cnt": pa.array([agg[k][0] for k in keys], pa.int64()),
                "s": pa.array([agg[k][1] for k in keys], pa.int64()),
                "ss": pa.array([agg[k][2] for k in keys], pa.int64()),
            }
        )

    rows = (
        ds.select_columns([group_col, value_col])
        .map_batches(mom_partial, batch_format="pyarrow")
        .groupby("g")
        .sum(["cnt", "s", "ss"])
        .take_all()
    )
    stats = {
        r["g"]: (int(r["sum(cnt)"]), int(r["sum(s)"]), int(r["sum(ss)"]))
        for r in rows
    }
    stats_ref = ray.put(stats)
    id_type = dict(zip(ds.schema().names, ds.schema().types))[id_col]
    out_schema = pa.schema(
        [
            pa.field(id_col, id_type),
            pa.field(group_col, pa.string()),
            pa.field(value_col, pa.int64()),
        ]
    )
    if not stats:
        return ray.data.from_arrow(out_schema.empty_table())

    def flag(batch: pa.Table) -> pa.Table:
        st = util.get_broadcast(stats_ref)
        keep = []
        for gi, vi in zip(
            batch.column(group_col).to_pylist(),
            batch.column(value_col).to_pylist(),
        ):
            cnt, s, ss = st[gi]
            x = int(vi)
            keep.append(
                (cnt * x - s) ** 2 > z * z * (cnt * ss - s * s)
            )
        t = batch.filter(pa.array(keep))
        return pa.table(
            {
                id_col: t.column(id_col),
                group_col: t.column(group_col),
                value_col: t.column(value_col).cast(pa.int64()),
            }
        )

    return ds.select_columns([id_col, group_col, value_col]).map_batches(
        flag, batch_format="pyarrow"
    )


def grouped_outliers_sql(
    value_col: str,
    group_col: str,
    id_col: str = "doc_id",
    z: int = 3,
    table: str = "documents",
) -> str:
    """DuckDB mirror: identical integer inequality in HUGEINT."""
    return f"""
WITH st AS (
    SELECT {group_col} AS g,
           CAST(count(*) AS HUGEINT) AS cnt,
           CAST(sum({value_col}) AS HUGEINT) AS s,
           CAST(sum(CAST({value_col} AS HUGEINT) * {value_col})
                AS HUGEINT) AS ss
    FROM {table} GROUP BY {group_col}
)
SELECT t.{id_col}, t.{group_col},
       CAST(t.{value_col} AS BIGINT) AS {value_col}
FROM {table} t JOIN st ON st.g = t.{group_col}
WHERE (st.cnt * t.{value_col} - st.s) * (st.cnt * t.{value_col} - st.s)
      > {z * z} * (st.cnt * st.ss - st.s * st.s)
"""
