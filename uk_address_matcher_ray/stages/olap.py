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

Exactness bound (stated contract): the widest accumulator is
``charge_e6`` at ~1.1e11 per row, so int64 partial sums are exact up
to ~8.4e7 rows PER (returnflag, linestatus) GROUP (~TPC-H SF 150 for
the biggest group).  Past that the engine's int64 lanes would wrap
silently while the DuckDB mirror (HUGEINT sum + ``CAST`` to BIGINT)
errors loudly — the oracle gate therefore cannot green a wrapped
value.  For bigger groups, split the charge lane (two int64 columns,
carry at 2^62) before trusting the sums.

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


# ---------------------------------------------------------------------------
# Order-priority counts over an existence semi-join (TPC-H Q4 shape)
# ---------------------------------------------------------------------------

def late_ship_priority_counts(orders, lineitem):
    """Orders with at least one line item shipped AFTER the order date,
    counted per order priority -> Dataset(o_orderpriority, n_orders) —
    the TPC-H Q4 shape (EXISTS semi-join + grouped count) adapted to
    this schema's columns.

    Scale shape: the lineitem side pre-aggregates ``max(l_shipdate)``
    per order key per batch (only the max can satisfy the EXISTS, so
    the exchange carries one row per (key, batch)); orders ride the
    same key-grouped exchange tagged with (priority, orderdate); the
    group kernel reduces each order to at most one (priority) hit and
    a final skinny groupby counts per priority.  No broadcast, no
    driver key state.  Mirrored by ``late_ship_priority_counts_sql``.
    """
    from uk_address_matcher_ray.stages.grouped import grouped_map

    def li_partial(batch: pa.Table) -> pa.Table:
        us = (
            batch.column("l_shipdate")
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
        )
        t = (
            pa.table({"k": batch.column("l_orderkey"), "mx": us})
            .group_by("k")
            .aggregate([("mx", "max")])
        )
        return pa.table(
            {
                "k": t.column("k"),
                "pri": pa.array([""] * t.num_rows, pa.string()),
                "odate": pa.array([0] * t.num_rows, pa.int64()),
                "mx": t.column("mx_max").cast(pa.int64()),
                "side": pa.array([1] * t.num_rows, pa.int64()),
            }
        )

    def o_partial(batch: pa.Table) -> pa.Table:
        us = (
            batch.column("o_orderdate")
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
        )
        n = batch.num_rows
        return pa.table(
            {
                "k": batch.column("o_orderkey"),
                "pri": batch.column("o_orderpriority"),
                "odate": us,
                "mx": pa.array([0] * n, pa.int64()),
                "side": pa.array([0] * n, pa.int64()),
            }
        )

    tagged = lineitem.select_columns(
        ["l_orderkey", "l_shipdate"]
    ).map_batches(li_partial, batch_format="pyarrow").union(
        orders.select_columns(
            ["o_orderkey", "o_orderpriority", "o_orderdate"]
        ).map_batches(o_partial, batch_format="pyarrow")
    )

    hit_schema = pa.schema(
        [pa.field("pri", pa.string()), pa.field("n", pa.int64())]
    )

    def kernel(tbl: pa.Table) -> pa.Table:
        # vectorized EXISTS: binary-search lineitem max-shipdate partials
        # against the sorted order rows, scatter-max per order, then one
        # value_counts over the hit priorities — the kernel emits
        # (priority, n) partials (bounded by the 5 priority values)
        k = tbl.column("k").to_numpy(zero_copy_only=False)
        odate = tbl.column("odate").to_numpy(zero_copy_only=False)
        mx = tbl.column("mx").to_numpy(zero_copy_only=False)
        side = tbl.column("side").to_numpy(zero_copy_only=False)
        om = side == 0
        ok = k[om]
        if len(ok) == 0:
            return hit_schema.empty_table()
        order = np.argsort(ok, kind="stable")
        ks = ok[order]
        odate_s = odate[om][order]
        lk, lmx = k[~om], mx[~om]
        pos = np.searchsorted(ks, lk, side="right") - 1
        valid = (pos >= 0) & (ks[np.maximum(pos, 0)] == lk)
        mxacc = np.full(len(ks), np.iinfo(np.int64).min, np.int64)
        np.maximum.at(mxacc, pos[valid], lmx[valid])
        hit = mxacc > odate_s
        pri_sorted = (
            tbl.column("pri")
            .filter(pa.array(om))
            .take(pa.array(order, pa.int64()))
        )
        vc = pri_sorted.filter(pa.array(hit)).value_counts()
        return pa.table(
            {
                "pri": vc.field("values"),
                "n": vc.field("counts").cast(pa.int64()),
            }
        )

    import ray

    hits = grouped_map(tagged, "k", None, hit_schema, fn_table=kernel)
    parts = [
        t
        for t in ray.get(hits.materialize().to_arrow_refs())
        if t.num_rows
    ]
    combined = (
        pa.concat_tables(parts)
        .group_by("pri")
        .aggregate([("n", "sum")])
        .rename_columns(["o_orderpriority", "n_orders"])
        if parts
        else pa.table(
            {
                "o_orderpriority": pa.array([], pa.string()),
                "n_orders": pa.array([], pa.int64()),
            }
        )
    )
    from uk_address_matcher_ray.util import dataset_from_table

    return dataset_from_table(
        combined.set_column(
            1, "n_orders", combined.column("n_orders").cast(pa.int64())
        )
    )


def late_ship_priority_counts_sql() -> str:
    """DuckDB mirror: max-shipdate semi-join + grouped count."""
    return """
WITH lmax AS (
    SELECT l_orderkey AS k, max(epoch_us(l_shipdate)) AS mx
    FROM lineitem GROUP BY l_orderkey
)
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
FROM orders JOIN lmax ON lmax.k = o_orderkey
WHERE lmax.mx > epoch_us(o_orderdate)
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Revenue by nation (TPC-H Q5 shape: 3-hop join)
# ---------------------------------------------------------------------------

def revenue_by_nation(lineitem, orders, customer, nation):
    """Revenue per customer nation -> Dataset(n_name, n_lineitems,
    revenue) — the TPC-H Q5 multi-hop join (lineitem ⋈ orders ⋈
    customer ⋈ nation) as two tagged-union key-grouped exchanges plus
    one tiny broadcast.

    Revenue is exact integers until the end: ``rev_e4 =
    rint(price·100) · (100 - rint(disc·100))`` summed as int64, one
    ``CAST(x AS DOUBLE)/10000.0`` at the end (the Q1 cents contract).

    Scale shape:
    1. exchange on ``custkey``: customer rows carry (custkey,
       nationkey), order rows carry (custkey, orderkey); the kernel
       rekeys each order to its nation — payloads are 3 ints/row;
    2. exchange on ``orderkey``: lineitem pre-aggregates (orderkey,
       n, rev_e4) per batch, order rows carry (orderkey, nationkey);
       the kernel emits per-nation integer partials;
    3. the nation-id -> name map is a REAL-WORLD-BOUNDED table (~25
       rows) collected once and applied row-locally.
    No driver state beyond the nation map and the final per-nation
    table.  Mirrored by ``revenue_by_nation_sql``.
    """
    import ray

    from uk_address_matcher_ray.stages.grouped import grouped_map

    # ---- hop 1: orders -> nationkey via custkey ----------------------
    def cust_partial(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "k": batch.column("c_custkey").cast(pa.int64()),
                "v": batch.column("c_nationkey").cast(pa.int64()),
                "side": pa.array([0] * n, pa.int64()),
            }
        )

    def ord_partial(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "k": batch.column("o_custkey").cast(pa.int64()),
                "v": batch.column("o_orderkey").cast(pa.int64()),
                "side": pa.array([1] * n, pa.int64()),
            }
        )

    hop1_in = customer.select_columns(
        ["c_custkey", "c_nationkey"]
    ).map_batches(cust_partial, batch_format="pyarrow").union(
        orders.select_columns(["o_custkey", "o_orderkey"]).map_batches(
            ord_partial, batch_format="pyarrow"
        )
    )

    hop1_schema = pa.schema(
        [pa.field("ok", pa.int64()), pa.field("nk", pa.int64())]
    )

    def hop1_kernel(tbl: pa.Table) -> pa.Table:
        # vectorized small-side join within the complete custkey group:
        # sort the customer rows once, binary-search each order row
        # (side='right'-1 mirrors the old dict's duplicate-key last-wins)
        k = tbl.column("k").to_numpy(zero_copy_only=False)
        v = tbl.column("v").to_numpy(zero_copy_only=False)
        side = tbl.column("side").to_numpy(zero_copy_only=False)
        cm = side == 0
        ck, cv = k[cm], v[cm]
        if len(ck) == 0:
            return hop1_schema.empty_table()
        order = np.argsort(ck, kind="stable")
        ck_s, cv_s = ck[order], cv[order]
        ok_k, ok_v = k[~cm], v[~cm]
        pos = np.searchsorted(ck_s, ok_k, side="right") - 1
        valid = (pos >= 0) & (ck_s[np.maximum(pos, 0)] == ok_k)
        return pa.table(
            {
                "ok": pa.array(ok_v[valid], pa.int64()),
                "nk": pa.array(cv_s[pos[valid]], pa.int64()),
            }
        )

    order_nation = grouped_map(hop1_in, "k", None, hop1_schema,
                               fn_table=hop1_kernel)

    # ---- hop 2: lineitem revenue -> nation via orderkey --------------
    def li_partial(batch: pa.Table) -> pa.Table:
        price = np.rint(
            batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
            * 100.0
        ).astype(np.int64)
        disc = np.rint(
            batch.column("l_discount").to_numpy(zero_copy_only=False)
            * 100.0
        ).astype(np.int64)
        t = (
            pa.table(
                {
                    "k": batch.column("l_orderkey").cast(pa.int64()),
                    "n": pa.array(np.ones(len(price), np.int64)),
                    "rev": pa.array(price * (100 - disc)),
                }
            )
            .group_by("k")
            .aggregate([("n", "sum"), ("rev", "sum")])
        )
        return pa.table(
            {
                "k": t.column("k"),
                "n": t.column("n_sum").cast(pa.int64()),
                "rev": t.column("rev_sum").cast(pa.int64()),
                "side": pa.array([1] * t.num_rows, pa.int64()),
            }
        )

    def on_partial(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "k": batch.column("ok"),
                "n": batch.column("nk"),
                "rev": pa.array([0] * n, pa.int64()),
                "side": pa.array([0] * n, pa.int64()),
            }
        )

    hop2_in = lineitem.select_columns(
        ["l_orderkey", "l_extendedprice", "l_discount"]
    ).map_batches(li_partial, batch_format="pyarrow").union(
        order_nation.map_batches(on_partial, batch_format="pyarrow")
    )

    hop2_schema = pa.schema(
        [
            pa.field("nk", pa.int64()),
            pa.field("n", pa.int64()),
            pa.field("rev", pa.int64()),
        ]
    )

    def hop2_kernel(tbl: pa.Table) -> pa.Table:
        # vectorized: binary-search lineitem partials against the sorted
        # order rows ('n' carries nationkey on side-0 rows), then exact
        # int64 scatter-add per nationkey (np.add.at is unbuffered)
        k = tbl.column("k").to_numpy(zero_copy_only=False)
        n = tbl.column("n").to_numpy(zero_copy_only=False)
        rev = tbl.column("rev").to_numpy(zero_copy_only=False)
        side = tbl.column("side").to_numpy(zero_copy_only=False)
        om = side == 0
        ok_k, ok_nk = k[om], n[om]
        if len(ok_k) == 0:
            return hop2_schema.empty_table()
        order = np.argsort(ok_k, kind="stable")
        ks, nks = ok_k[order], ok_nk[order]
        lk, ln, lrev = k[~om], n[~om], rev[~om]
        pos = np.searchsorted(ks, lk, side="right") - 1
        valid = (pos >= 0) & (ks[np.maximum(pos, 0)] == lk)
        nk = nks[pos[valid]]
        if len(nk) == 0:
            return hop2_schema.empty_table()
        width = int(nk.max()) + 1
        n_acc = np.zeros(width, np.int64)
        r_acc = np.zeros(width, np.int64)
        np.add.at(n_acc, nk, ln[valid])
        np.add.at(r_acc, nk, lrev[valid])
        keys = np.nonzero((n_acc != 0) | (r_acc != 0))[0]
        return pa.table(
            {
                "nk": pa.array(keys.astype(np.int64), pa.int64()),
                "n": pa.array(n_acc[keys], pa.int64()),
                "rev": pa.array(r_acc[keys], pa.int64()),
            }
        )

    # hop-2 output is ≤ |nations| rows PER TASK: the final combine is a
    # driver-side Arrow group-by over a nation-count-bounded table — a
    # Dataset groupby + finalize map here cost two whole jobs' fixed
    # overhead (~0.8 s) on ~25 rows
    per_nation_tbl = (
        pa.concat_tables(
            [
                t
                for t in ray.get(
                    grouped_map(
                        hop2_in, "k", None, hop2_schema,
                        fn_table=hop2_kernel,
                    )
                    .materialize()
                    .to_arrow_refs()
                )
                if t.num_rows
            ]
            or [hop2_schema.empty_table()]
        )
        .group_by("nk")
        .aggregate([("n", "sum"), ("rev", "sum")])
        .rename_columns(["nk", "n", "rev"])
    )

    names = {
        int(r["n_nationkey"]): r["n_name"]
        for r in nation.select_columns(
            ["n_nationkey", "n_name"]
        ).take_all()
    }

    nk = per_nation_tbl.column("nk").to_pylist()
    n = per_nation_tbl.column("n").to_numpy(zero_copy_only=False)
    rev = per_nation_tbl.column("rev").to_numpy(zero_copy_only=False)
    # inner-join semantics: a nationkey absent from the nation table
    # is dropped (matches the oracle's JOIN), not a KeyError.
    keep = [i for i, k in enumerate(nk) if k in names]
    if len(keep) != len(nk):
        nk = [nk[i] for i in keep]
        n = n[keep]
        rev = rev[keep]
    out = pa.table(
        {
            "n_name": pa.array([names[k] for k in nk], pa.string()),
            "n_lineitems": pa.array(n.astype(np.int64), pa.int64()),
            "revenue": pa.array(rev / 10000.0, pa.float64()),
        }
    )
    from uk_address_matcher_ray.util import dataset_from_table

    return dataset_from_table(out)


def revenue_by_nation_sql() -> str:
    """DuckDB mirror: identical cents products and final division."""
    return """
WITH li AS (
    SELECT l_orderkey,
           CAST(round(l_extendedprice * 100.0) AS BIGINT) AS price_c,
           CAST(round(l_discount * 100.0) AS BIGINT) AS disc_c
    FROM lineitem
),
j AS (
    SELECT n.n_name,
           count(*) AS n_li,
           CAST(SUM(li.price_c * (100 - li.disc_c)) AS BIGINT) AS rev
    FROM li
    JOIN orders o ON o.o_orderkey = li.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY n.n_name
)
SELECT n_name, CAST(n_li AS BIGINT) AS n_lineitems,
       CAST(rev AS DOUBLE) / 10000.0 AS revenue
FROM j
"""


# ---------------------------------------------------------------------------
# Calendar-month rollup
# ---------------------------------------------------------------------------

def orders_by_month(orders):
    """Orders per calendar month -> Dataset(month_us, n_orders,
    total_price) — calendar-aware time bucketing (events_hourly is
    fixed-width; months are not), the reporting rollup shape.

    Contract (mirrored by ``orders_by_month_sql``): ``month_us`` is
    ``epoch_us(date_trunc('month', o_orderdate))`` — numpy
    ``datetime64[M]`` truncation is bit-identical to DuckDB
    date_trunc (verified incl. leap-February); ``total_price`` sums
    exact cents (``rint(o_totalprice·100)``) and divides once.

    Scale shape: per-batch Arrow group_by partials (rows bounded by
    distinct months per batch), one skinny exchange.
    """
    def partial(batch: pa.Table) -> pa.Table:
        us = (
            batch.column("o_orderdate")
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        month_us = (
            us.astype("datetime64[us]")
            .astype("datetime64[M]")
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        cents = np.rint(
            batch.column("o_totalprice").to_numpy(zero_copy_only=False)
            * 100.0
        ).astype(np.int64)
        t = (
            pa.table(
                {
                    "month_us": pa.array(month_us),
                    "n": pa.array(np.ones(len(us), np.int64)),
                    "cents": pa.array(cents),
                }
            )
            .group_by("month_us")
            .aggregate([("n", "sum"), ("cents", "sum")])
        )
        return t.rename_columns(["month_us", "n", "cents"])

    agg = (
        orders.select_columns(["o_orderdate", "o_totalprice"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("month_us")
        .sum(["n", "cents"])
    )

    def finalize(batch: pa.Table) -> pa.Table:
        cents = batch.column("sum(cents)").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "month_us": batch.column("month_us"),
                "n_orders": batch.column("sum(n)").cast(pa.int64()),
                "total_price": pa.array(cents / 100.0, pa.float64()),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


def orders_by_month_sql() -> str:
    """DuckDB mirror: date_trunc month, cents sum, one division."""
    return """
SELECT epoch_us(date_trunc('month', o_orderdate)) AS month_us,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(CAST(SUM(CAST(round(o_totalprice * 100.0) AS BIGINT))
                 AS BIGINT) AS DOUBLE) / 100.0 AS total_price
FROM orders
GROUP BY month_us
"""


# ---------------------------------------------------------------------------
# Top-k by aggregated measure
# ---------------------------------------------------------------------------

def top_parts_by_revenue(lineitem, k: int = 10):
    """The ``k`` parts with the highest summed revenue ->
    Dataset(l_partkey, revenue) — the "top products" rollup: aggregate
    first, then a deterministic top-k over the aggregated measure.

    Contract (mirrored by ``top_parts_by_revenue_sql``): revenue
    aggregates as exact ``rev_e4`` integers (the Q1 cents contract);
    ranking is ``(rev_e4 DESC, l_partkey ASC)`` on the INTEGER measure
    — float ties cannot reorder what integers decide; the double view
    divides once at the end.

    Scale shape: per-batch (partkey, rev) partials -> one skinny
    exchange keyed on partkey; then per-batch top-k pruning (a global
    winner is a batch winner) with a driver merge of k × blocks rows.
    """
    import ray

    def li_partial(batch: pa.Table) -> pa.Table:
        price = np.rint(
            batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
            * 100.0
        ).astype(np.int64)
        disc = np.rint(
            batch.column("l_discount").to_numpy(zero_copy_only=False)
            * 100.0
        ).astype(np.int64)
        t = (
            pa.table(
                {
                    "k": batch.column("l_partkey").cast(pa.int64()),
                    "rev": pa.array(price * (100 - disc)),
                }
            )
            .group_by("k")
            .aggregate([("rev", "sum")])
        )
        return t.rename_columns(["k", "rev"])

    # fan-in-8 tree reduce of (partkey, rev) partials — the corpus-stats
    # pattern: every intermediate stays distinct-partkey-bounded (the
    # part dimension is the "vocabulary" here; at a scale where it breaks
    # a task's heap, switch back to .groupby("k").sum — the unbounded
    # all-to-all shape this replaced for ~1 s of per-job fixed cost)
    partials = lineitem.select_columns(
        ["l_partkey", "l_extendedprice", "l_discount"]
    ).map_batches(li_partial, batch_format="pyarrow")
    refs = list(partials.to_arrow_refs())

    @ray.remote
    def merge(*tbls):
        live = [t for t in tbls if t.num_rows]
        if not live:
            return pa.table(
                {"k": pa.array([], pa.int64()), "rev": pa.array([], pa.int64())}
            )
        return (
            pa.concat_tables(live)
            .group_by("k")
            .aggregate([("rev", "sum")])
            .rename_columns(["k", "rev"])
        )

    while len(refs) > 1:
        refs = [merge.remote(*refs[i : i + 8]) for i in range(0, len(refs), 8)]

    @ray.remote
    def topk(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        order = pc.sort_indices(
            t, sort_keys=[("rev", "descending"), ("k", "ascending")]
        )
        return t.take(order[: min(k, t.num_rows)])

    win_tbl = (
        ray.get(topk.remote(refs[0]))
        if refs
        else pa.table(
            {"k": pa.array([], pa.int64()), "rev": pa.array([], pa.int64())}
        )
    )
    winners = win_tbl.to_pylist()
    return ray.data.from_arrow(
        pa.table(
            {
                "l_partkey": pa.array(
                    [r["k"] for r in winners], pa.int64()
                ),
                "revenue": pa.array(
                    [r["rev"] / 10000.0 for r in winners], pa.float64()
                ),
            }
        )
    )


def top_parts_by_revenue_sql(k: int = 10) -> str:
    """DuckDB mirror: integer measure ordering, one final division."""
    return f"""
WITH g AS (
    SELECT l_partkey,
           CAST(SUM(CAST(round(l_extendedprice * 100.0) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100.0) AS BIGINT)))
                AS BIGINT) AS rev
    FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey, CAST(rev AS DOUBLE) / 10000.0 AS revenue
FROM g ORDER BY rev DESC, l_partkey LIMIT {k}
"""
