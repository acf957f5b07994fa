"""Classic OLAP pricing summary over ``lineitem`` — the TPC-H Q1 shape
(multi-aggregate GROUP BY with a date filter) expressed as streaming
integer partials, the reporting workload every warehouse engine is
judged on.

Money/quantity columns arrive as 2-decimal doubles; every aggregate is
computed in EXACT scaled integers so partial aggregation is order-free:

* ``qty_c = rint(l_quantity · 100)``, ``price_c``, ``disc_c``,
  ``tax_c`` likewise (2-decimal data makes rint exact — the
  events_hourly cents contract);
* ``disc_price_e4 = price_c · (100 - disc_c)``   (units of 1e-4),
* ``charge_e6    = price_c · (100 - disc_c) · (100 + tax_c)``
  (units of 1e-6) — pure int64/HUGEINT products;
* double views divide the integer sums once at the end —
  ``CAST(x AS DOUBLE) / 10^k`` and ``CAST(s AS DOUBLE) / n`` — one
  correctly-rounded operation on identical operands on both sides.

Output per (l_returnflag, l_linestatus): n_rows, sum_qty,
sum_base_price, sum_disc_price, sum_charge, avg_qty, avg_price,
avg_disc (TPC-H Q1's column set, integer-exact underneath).

Scale shape: one Arrow ``group_by`` partial per batch (rows bounded by
the 6 distinct (flag, status) pairs), ONE skinny exchange of integer
partials, zero driver state beyond the final group table.  Mirrored by
``lineitem_pricing_sql``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

CUTOFF_US = 904_694_400_000_000  # 1998-09-02 00:00:00 UTC in micros


def lineitem_pricing(ds, cutoff_us: int = CUTOFF_US):
    """-> Dataset(l_returnflag, l_linestatus, n_rows, sum_qty,
    sum_base_price, sum_disc_price, sum_charge, avg_qty, avg_price,
    avg_disc)."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        us = (
            batch.column("l_shipdate")
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
        )
        keep = pc.less_equal(us, cutoff_us)
        t = batch.filter(keep)
        qty = np.rint(
            t.column("l_quantity").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        price = np.rint(
            t.column("l_extendedprice").to_numpy(zero_copy_only=False)
            * 100.0
        ).astype(np.int64)
        disc = np.rint(
            t.column("l_discount").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        tax = np.rint(
            t.column("l_tax").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        disc_price = price * (100 - disc)
        charge = disc_price * (100 + tax)
        part = pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "l_linestatus": t.column("l_linestatus"),
                "n": pa.array(np.ones(len(qty), np.int64)),
                "qty_c": pa.array(qty),
                "price_c": pa.array(price),
                "disc_c": pa.array(disc),
                "dp_e4": pa.array(disc_price),
                "ch_e6": pa.array(charge),
            }
        ).group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [
                ("n", "sum"),
                ("qty_c", "sum"),
                ("price_c", "sum"),
                ("disc_c", "sum"),
                ("dp_e4", "sum"),
                ("ch_e6", "sum"),
            ]
        )
        return part.rename_columns(
            ["l_returnflag", "l_linestatus", "n", "qty_c", "price_c",
             "disc_c", "dp_e4", "ch_e6"]
        )

    agg = (
        ds.select_columns(
            [
                "l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice", "l_discount", "l_tax", "l_shipdate",
            ]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .sum(["n", "qty_c", "price_c", "disc_c", "dp_e4", "ch_e6"])
    )

    def finalize(batch: pa.Table) -> pa.Table:
        n = batch.column("sum(n)").to_numpy(zero_copy_only=False)
        qty = batch.column("sum(qty_c)").to_numpy(zero_copy_only=False)
        price = batch.column("sum(price_c)").to_numpy(zero_copy_only=False)
        disc = batch.column("sum(disc_c)").to_numpy(zero_copy_only=False)
        dp = batch.column("sum(dp_e4)").to_numpy(zero_copy_only=False)
        ch = batch.column("sum(ch_e6)").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                "n_rows": pa.array(n, pa.int64()),
                "sum_qty": pa.array(qty / 100.0, pa.float64()),
                "sum_base_price": pa.array(price / 100.0, pa.float64()),
                "sum_disc_price": pa.array(dp / 10000.0, pa.float64()),
                "sum_charge": pa.array(ch / 1000000.0, pa.float64()),
                "avg_qty": pa.array(qty / 100.0 / n, pa.float64()),
                "avg_price": pa.array(price / 100.0 / n, pa.float64()),
                "avg_disc": pa.array(disc / 100.0 / n, pa.float64()),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


def lineitem_pricing_sql(cutoff_us: int = CUTOFF_US) -> str:
    """DuckDB mirror: identical integer scaling and division chains."""
    return f"""
WITH f AS (
    SELECT l_returnflag, l_linestatus,
           CAST(round(l_quantity * 100.0) AS BIGINT) AS qty_c,
           CAST(round(l_extendedprice * 100.0) AS BIGINT) AS price_c,
           CAST(round(l_discount * 100.0) AS BIGINT) AS disc_c,
           CAST(round(l_tax * 100.0) AS BIGINT) AS tax_c
    FROM lineitem
    WHERE epoch_us(l_shipdate) <= {cutoff_us}
),
g AS (
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(qty_c) AS BIGINT) AS qty,
           CAST(SUM(price_c) AS BIGINT) AS price,
           CAST(SUM(disc_c) AS BIGINT) AS disc,
           CAST(SUM(price_c * (100 - disc_c)) AS BIGINT) AS dp,
           CAST(SUM(price_c * (100 - disc_c) * (100 + tax_c))
                AS BIGINT) AS ch
    FROM f GROUP BY l_returnflag, l_linestatus
)
SELECT l_returnflag, l_linestatus, n AS n_rows,
       CAST(qty AS DOUBLE) / 100.0 AS sum_qty,
       CAST(price AS DOUBLE) / 100.0 AS sum_base_price,
       CAST(dp AS DOUBLE) / 10000.0 AS sum_disc_price,
       CAST(ch AS DOUBLE) / 1000000.0 AS sum_charge,
       CAST(qty AS DOUBLE) / 100.0 / n AS avg_qty,
       CAST(price AS DOUBLE) / 100.0 / n AS avg_price,
       CAST(disc AS DOUBLE) / 100.0 / n AS avg_disc
FROM g
"""
