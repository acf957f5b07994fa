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


# ---------------------------------------------------------------------------
# Percent rank within group (window analytics)
# ---------------------------------------------------------------------------

def group_percent_rank(
    ds,
    value_col: str,
    group_col: str,
    id_col: str = "doc_id",
):
    """SQL ``PERCENT_RANK() OVER (PARTITION BY group ORDER BY value)``
    -> Dataset(id, group, value, pct_rank) — the percentile position of
    every row inside its group, the normalization step behind
    per-source quality stratification ("keep each source's top X%").

    Contract (mirrored by ``group_percent_rank_sql``): SQL RANK
    semantics — ties share the MINIMUM rank; ``pct_rank =
    CAST(rank - 1 AS DOUBLE) / (n - 1)`` (single-row groups get 0.0,
    the SQL convention) — one exact integer division per row.

    Scale shape: one grouped exchange carrying (id, group, value) —
    percent-rank needs its complete group by definition; the kernel is
    a sort + run-length rank over each group.  Rows, not payloads:
    callers project to the three columns first.
    """
    from uk_address_matcher_ray.stages.grouped import grouped_map

    sch = dict(zip(ds.schema().names, ds.schema().types))
    out_schema = pa.schema(
        [
            pa.field(id_col, sch[id_col]),
            pa.field(group_col, sch[group_col]),
            pa.field(value_col, pa.int64()),
            pa.field("pct_rank", pa.float64()),
        ]
    )

    def kernel(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if tbl.num_rows == 0:
            return out_schema.empty_table()
        order = pc.sort_indices(
            tbl,
            sort_keys=[
                (group_col, "ascending"),
                (value_col, "ascending"),
            ],
        )
        s = tbl.take(order)
        g = s.column(group_col)
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        codes = g.dictionary_encode()
        if isinstance(codes, pa.ChunkedArray):
            codes = codes.combine_chunks()
        gc = codes.indices.to_numpy(zero_copy_only=False)
        v = s.column(value_col).to_numpy(zero_copy_only=False)
        n = len(gc)
        idx = np.arange(n, dtype=np.int64)
        new_g = np.empty(n, dtype=bool)
        new_g[0] = True
        new_g[1:] = gc[1:] != gc[:-1]
        g_start = np.maximum.accumulate(np.where(new_g, idx, 0))
        # RANK semantics: position of the first row with this value
        new_v = new_g.copy()
        new_v[1:] |= v[1:] != v[:-1]
        v_start = np.maximum.accumulate(np.where(new_v, idx, 0))
        rank0 = v_start - g_start  # rank - 1
        # group sizes via end boundaries
        ends = np.flatnonzero(np.concatenate([new_g[1:], [True]]))
        sizes = np.diff(np.concatenate([[-1], ends]))
        gsize = np.repeat(sizes, sizes)
        denom = np.maximum(gsize - 1, 1)
        pct = rank0.astype(np.float64) / denom
        pct[gsize == 1] = 0.0
        return pa.table(
            {
                id_col: s.column(id_col),
                group_col: s.column(group_col),
                value_col: s.column(value_col).cast(pa.int64()),
                "pct_rank": pa.array(pct, pa.float64()),
            }
        )

    pre = ds.select_columns([id_col, group_col, value_col])
    return grouped_map(pre, group_col, None, out_schema, fn_table=kernel)


def group_percent_rank_sql(
    value_col: str,
    group_col: str,
    id_col: str = "doc_id",
    table: str = "documents",
) -> str:
    """DuckDB mirror: the window function itself."""
    return f"""
SELECT {id_col}, {group_col},
       CAST({value_col} AS BIGINT) AS {value_col},
       percent_rank() OVER (
           PARTITION BY {group_col} ORDER BY {value_col}) AS pct_rank
FROM {table}
"""
