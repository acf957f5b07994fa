"""Exact distributed quantiles over a bounded-cardinality value column.

Corpus curation decisions are threshold picks — "drop docs below the
p25 of length", "keep the low-perplexity half", "cap at the p99 token
count" — so the engine needs per-group quantiles that are EXACT (a
t-digest's rank error moves real documents across the cut) and cheap at
100 TB.  For the columns these thresholds are computed over (byte/char
lengths, token counts, small integer scores) the DISTINCT-value space is
tiny relative to the corpus, so the right shape is a histogram
aggregation, not a sort:

* **Partial** : each batch pre-aggregates to ``(group, value, count)``
  rows — the exchange carries distinct-value histogram rows, never the
  corpus, and integer-count sums are order-independent so the result is
  exact at any parallelism.
* **Finalize** (per complete group, via ``grouped_map``): sort the
  group's histogram by value, cumulative-sum the counts, and for each
  requested q emit the smallest value whose cumulative count reaches
  ``ceil(q * n)`` — the classic discrete (type-1) quantile, stated
  explicitly so the DuckDB oracle runs the IDENTICAL formula as window
  SQL rather than trusting ``quantile_disc``'s internal convention.

Continuous/high-cardinality columns (e.g. float perplexities) should be
bucketed first (round/fixed-point) or routed through a sort-based
quantile; the docstring contract here is bounded distinct values.

The reference engine has no quantile surface; this supports the
engine's quality-filter thresholds (stages/textstats, stages/lm).
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np
import pyarrow as pa


def grouped_quantiles(
    ds,
    qs: Sequence[float],
    value_col: str,
    group_col: str,
    default_group: str = "__all__",
):
    """-> Dataset(group, q, value, n): exact type-1 quantiles per group.

    ``group_col=None`` computes global quantiles (single synthetic group
    named ``default_group``)."""
    qs = sorted(qs)
    sch = ds.schema()
    types = dict(zip(sch.names, sch.types))
    value_type = types[value_col]
    group_type = types[group_col] if group_col else pa.string()

    cols = [value_col] + ([group_col] if group_col else [])

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select(cols)
        if not group_col:
            t = t.append_column(
                "__g", pa.array([default_group] * t.num_rows, pa.string())
            )
        g = group_col or "__g"
        agg = t.group_by([g, value_col]).aggregate([([], "count_all")])
        return agg.rename_columns(["g", "v", "c"])

    def finalize(tbl: pa.Table) -> pa.Table:
        """Complete histogram of one or more groups -> quantile rows."""
        merged = tbl.group_by(["g", "v"]).aggregate([("c", "sum")])
        order = pa.compute.sort_indices(
            merged, sort_keys=[("g", "ascending"), ("v", "ascending")]
        )
        s = merged.take(order)
        gcol = s.column("g")
        if isinstance(gcol, pa.ChunkedArray):
            gcol = gcol.combine_chunks()
        enc = gcol.dictionary_encode()
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = pa.compute.fill_null(enc.indices, -1).to_numpy(
            zero_copy_only=False
        )
        vals = s.column("v").to_pylist()
        cnts = s.column("c_sum").to_numpy(zero_copy_only=False)
        out_g, out_q, out_v, out_n = [], [], [], []
        i, n_rows = 0, len(codes)
        while i < n_rows:
            j = i
            while j < n_rows and codes[j] == codes[i]:
                j += 1
            cum = np.cumsum(cnts[i:j])
            n = int(cum[-1])
            gval = gcol[i].as_py()
            for q in qs:
                # type-1 discrete quantile: smallest v with cum >= ceil(q*n)
                k = min(max(math.ceil(q * n), 1), n)
                pos = int(np.searchsorted(cum, k))
                out_g.append(gval)
                out_q.append(q)
                out_v.append(vals[i + pos])
                out_n.append(n)
            i = j
        return pa.table(
            {
                "g": pa.array(out_g, group_type),
                "q": pa.array(out_q, pa.float64()),
                "value": pa.array(out_v, value_type),
                "n": pa.array(out_n, pa.int64()),
            }
        )

    from uk_address_matcher_ray.stages.grouped import grouped_map

    out_schema = pa.schema(
        [
            pa.field("g", group_type),
            pa.field("q", pa.float64()),
            pa.field("value", value_type),
            pa.field("n", pa.int64()),
        ]
    )
    pre = ds.map_batches(partial, batch_format="pyarrow")
    return grouped_map(pre, "g", None, out_schema, fn_table=finalize)


def grouped_quantiles_sql(
    qs: Sequence[float],
    value_col: str,
    group_col: str,
    table: str = "documents",
) -> str:
    """DuckDB mirror: the identical explicit type-1 formula as window SQL
    (ceil on the same double product both sides)."""
    qlist = ", ".join(repr(float(q)) for q in sorted(qs))
    return f"""
WITH h AS (
  SELECT {group_col} AS g, {value_col} AS v, count(*) AS c
  FROM {table} GROUP BY 1, 2
),
tot AS (SELECT g, sum(c) AS n FROM h GROUP BY g),
cum AS (
  SELECT g, v, sum(c) OVER (PARTITION BY g ORDER BY v) AS cc FROM h
),
qs AS (SELECT unnest([{qlist}]::DOUBLE[]) AS q)
SELECT cum.g, qs.q, min(cum.v) AS value, CAST(any_value(tot.n) AS BIGINT) AS n
FROM cum JOIN tot USING (g) CROSS JOIN qs
WHERE cum.cc >= greatest(ceil(qs.q * tot.n), 1)
GROUP BY cum.g, qs.q
"""
