"""Relational analytics over the TPC-H-ish testdata tables.

The reference surface is scan → transform → keyed agg → join (SURVEY.md §2);
these queries exercise exactly those operators at table scale, and serve as
the bench headliners. Everything is declarative DataFrame code: filters and
projections reach the parquet scan (PushedFilters/ReadSchema), aggregations
get map-side partials, and small dimension sides are broadcast explicitly.

Money columns are summed in exact integer units (functions/money.py) so the
results hash-match the DuckDB oracle bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from flink_streaming_2_10_spark.functions.money import from_units, to_units


def pricing_summary(lineitem: DataFrame, cutoff: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1-style pricing summary: per (returnflag, linestatus) sums and
    averages over lineitem up to a ship-date cutoff.

    Single scan → partial agg → one exchange on a 2-column low-cardinality
    key; the shipdate filter is pushed to parquet.
    """
    li = lineitem.filter(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
    # Exact integer units: price in cents; discount/tax in basis-% units.
    pre = li.select(
        "l_returnflag",
        "l_linestatus",
        F.col("l_quantity"),  # integer-valued double: exact under double sum
        to_units("l_extendedprice").alias("price_c"),
        to_units("l_discount").alias("disc_pc"),
        to_units("l_tax").alias("tax_pc"),
    ).withColumns(
        {
            # disc_price scaled 1e4, charge scaled 1e6 — still exact longs.
            "disc_price_u": F.col("price_c") * (F.lit(100) - F.col("disc_pc")),
            "charge_u": F.col("price_c")
            * (F.lit(100) - F.col("disc_pc"))
            * (F.lit(100) + F.col("tax_pc")),
        }
    )
    agg = pre.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.sum("price_c").alias("price_c_sum"),
        F.sum("disc_price_u").alias("disc_u_sum"),
        F.sum("charge_u").alias("charge_u_sum"),
        F.sum("disc_pc").alias("disc_pc_sum"),
        F.count(F.lit(1)).alias("count_order"),
    )
    cnt = F.col("count_order").cast("double")
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        F.col("sum_qty"),
        from_units("price_c_sum").alias("sum_base_price"),
        from_units("disc_u_sum", 4).alias("sum_disc_price"),
        from_units("charge_u_sum", 6).alias("sum_charge"),
        (F.col("sum_qty") / cnt).alias("avg_qty"),
        (from_units("price_c_sum") / cnt).alias("avg_price"),
        (from_units("disc_pc_sum") / cnt).alias("avg_disc"),
        "count_order",
    )


def shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    date: str = "1998-03-15",
    limit: int = 10,
) -> DataFrame:
    """TPC-H Q3-style shipping priority: top orders by revenue for one
    market segment, orders before / shipments after a date.

    Join strategy: customer (15k rows at sf0.1, one filtered column) is
    broadcast; orders⋈lineitem co-shuffles on orderkey. Filters push to all
    three scans. The top-k is a deterministic sort (tie-break orderkey) +
    limit — Spark plans TakeOrderedAndProject, no global sort materialized.
    """
    cut = F.lit(date).cast("timestamp")
    c = customer.filter(F.col("c_mktsegment") == segment).select("c_custkey")
    o = orders.filter(F.col("o_orderdate") < cut).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    l = lineitem.filter(F.col("l_shipdate") > cut).select(
        "l_orderkey",
        (to_units("l_extendedprice") * (F.lit(100) - to_units("l_discount"))).alias(
            "rev_u"
        ),
    )
    joined = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(l, o["o_orderkey"] == l["l_orderkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum("rev_u").alias("rev_u_sum"))
    )
    return joined.select(
        "l_orderkey",
        from_units("rev_u_sum", 4).alias("revenue"),
        # o_orderdate scans as TIMESTAMP_NTZ; cast before unix_millis (the
        # session is pinned to UTC so NTZ wall time == epoch semantics).
        F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias(
            "o_orderdate_ms"
        ),
        "o_orderpriority",
        F.col("rev_u_sum"),
    ).orderBy(F.col("rev_u_sum").desc(), F.col("l_orderkey")).drop("rev_u_sum").limit(
        limit
    )


def revenue_by_region(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    orders: DataFrame,
) -> DataFrame:
    """TPC-H Q5-flavored star join: order revenue rolled up to region.

    The dimension chain region→nation→customer is broadcast (region 5 rows,
    nation 25, customer ≤150k) so the fact table never shuffles for the
    join — the only exchange is the final tiny groupBy(region).
    """
    dims = (
        customer.select("c_custkey", "c_nationkey")
        .join(
            F.broadcast(nation.select("n_nationkey", "n_regionkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(region.select("r_regionkey", "r_name")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("c_custkey", "r_name")
    )
    o = orders.select("o_custkey", to_units("o_totalprice").alias("total_c"))
    return (
        o.join(F.broadcast(dims), o["o_custkey"] == dims["c_custkey"])
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("order_count"),
            F.sum("total_c").alias("total_c_sum"),
        )
        .select(
            "r_name",
            "order_count",
            from_units("total_c_sum").alias("total_revenue"),
        )
    )


def pricing_cube(lineitem: DataFrame, cutoff: str = "1998-09-02") -> DataFrame:
    """Multi-dimensional pricing summary: the Q1 aggregate at EVERY
    grouping level of (returnflag, linestatus) — per-cell, per-flag,
    per-status, and grand total.

    Two-level plan (r16): ONE corpus pass pre-aggregates to the finest
    grouping (a plain hash agg — no Expand multiplying scan rows by the
    4 grouping sets, which direct ``cube`` over the raw rows pays), then
    the cube re-aggregates the PERSISTED finest table (≤ |flags|·|status|
    rows). Exact re-aggregation: counts and cent-units are longs;
    ``l_quantity`` is integer-valued, so double partial sums stay exact
    and order-free. Same money discipline as ``pricing_summary``; rolled
    dimensions surface as 'ALL' (source columns are non-null, so the
    label is unambiguous).

    ANSI empty-slice semantics (r16, found by the fresh-seed fuzz
    campaign): standard SQL's ``GROUP BY CUBE`` emits the ``()``
    grand-total row even over an EMPTY input (count 0, NULL sums —
    DuckDB/Postgres agree); Spark's grouping-set expansion aggregates by
    (keys, grouping-id) and returns ZERO rows. The union below restores
    the standard row: a global re-aggregate of the tiny finest table
    (one row always), kept only when its count is 0 — i.e. exactly when
    the cube lost it. Both branches read the persisted finest table, so
    the corpus is still scanned once.
    """
    from flink_streaming_2_10_spark.pipeline.caching import tracked_persist

    li = lineitem.filter(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
    pre = li.select(
        "l_returnflag",
        "l_linestatus",
        F.col("l_quantity"),
        (
            to_units("l_extendedprice")
            * (F.lit(100) - to_units("l_discount"))
        ).alias("disc_price_u"),
    )
    fine = tracked_persist(
        pre.groupBy("l_returnflag", "l_linestatus").agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("disc_price_u").alias("disc_u_sum"),
        )
    )
    agg = fine.cube("l_returnflag", "l_linestatus").agg(
        F.sum("cnt").alias("cnt"),
        F.sum("sum_qty").alias("sum_qty"),
        F.sum("disc_u_sum").alias("disc_u_sum"),
    )
    empty_total = (
        fine.agg(
            F.coalesce(F.sum("cnt"), F.lit(0).cast("long")).alias("cnt"),
            F.sum("sum_qty").alias("sum_qty"),
            F.sum("disc_u_sum").alias("disc_u_sum"),
        )
        .where(F.col("cnt") == 0)
        .select(
            F.lit(None).cast("string").alias("l_returnflag"),
            F.lit(None).cast("string").alias("l_linestatus"),
            "cnt",
            "sum_qty",
            "disc_u_sum",
        )
    )
    return agg.select(
        "l_returnflag", "l_linestatus", "cnt", "sum_qty", "disc_u_sum"
    ).unionByName(empty_total).select(
        F.coalesce("l_returnflag", F.lit("ALL")).alias("l_returnflag"),
        F.coalesce("l_linestatus", F.lit("ALL")).alias("l_linestatus"),
        "cnt",
        "sum_qty",
        from_units("disc_u_sum", 4).alias("revenue"),
    )


def forecast_revenue(
    lineitem: DataFrame,
    date_from: str = "1994-01-01",
    date_to: str = "1995-01-01",
    disc_lo_pc: int = 5,
    disc_hi_pc: int = 7,
    qty_max: int = 24,
) -> DataFrame:
    """TPC-H Q6-style forecast revenue: ``sum(extendedprice * discount)``
    over a ship-date year, a discount band, and a quantity cap — one row.

    The canonical pushdown shape: the date range and quantity cap are raw
    column predicates that reach the parquet scan (``PushedFilters``), and
    a coarse raw-double discount range is pushed alongside so row groups
    outside the band never decompress; the EXACT band membership is then
    decided on basis points (``round(discount*100)`` — the same integer
    units the revenue sum uses), which is engine-stable where raw double
    comparison at band edges is not. Aggregation is one partial+final sum
    of exact scaled longs (cents × basis points = 1e4 units) — no wide
    shuffle anywhere.
    """
    lo_raw = disc_lo_pc / 100.0 - 0.005
    hi_raw = disc_hi_pc / 100.0 + 0.005
    li = lineitem.filter(
        (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
        & (F.col("l_quantity") < F.lit(float(qty_max)))
        & (F.col("l_discount") >= F.lit(lo_raw))  # pushdown-only bound
        & (F.col("l_discount") <= F.lit(hi_raw))
    )
    pre = li.select(
        to_units("l_extendedprice").alias("price_c"),
        to_units("l_discount").alias("disc_pc"),
    ).filter(
        (F.col("disc_pc") >= F.lit(int(disc_lo_pc)))
        & (F.col("disc_pc") <= F.lit(int(disc_hi_pc)))
    )
    return pre.agg(
        from_units(
            F.sum(F.col("price_c") * F.col("disc_pc")), 4
        ).alias("revenue")
    )


def priority_order_check(
    orders: DataFrame,
    lineitem: DataFrame,
    start: str = "1994-01-01",
    end: str = "1994-04-01",
) -> DataFrame:
    """TPC-H Q4-shaped order-priority check: count orders per priority in
    a quarter that have at least one lineitem shipped AFTER the order
    date — the EXISTS subquery pattern, planned as a LEFT SEMI join with
    a non-equi conjunct (the one relational join strategy the other
    queries don't exercise; the driver testdata lacks
    l_commitdate/l_receiptdate, so ship-after-order stands in for the
    upstream commit-before-receipt predicate).

    Scale shape: the quarter filter is pushed to the orders scan; the
    semi join carries only (orderkey, orderdate) against (orderkey,
    shipdate) — neither side's payload columns move — and dedups
    per-order matches inside the join operator (no distinct needed);
    the final agg is one exchange on the 5-value priority key.
    """
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit(start).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(end).cast("timestamp"))
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = lineitem.select("l_orderkey", "l_shipdate")
    hit = o.join(
        li,
        (o["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > o["o_orderdate"]),
        "left_semi",
    )
    return hit.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


def local_supplier_volume(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    region_name: str = "ASIA",
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
) -> DataFrame:
    """Full TPC-H Q5 local-supplier volume: revenue per nation for orders
    whose customer AND lineitem supplier sit in the same nation of one
    region, over an order-date year.

    Join strategy at scale: lineitem (the 100 TB fact) co-shuffles with
    the date-filtered orders on orderkey — the big exchange; nation,
    region, and supplier are genuinely small and carry explicit BROADCAST
    hints. Customer is NOT hinted: at TPC-H ratios it is ~2% of corpus
    (~2 TB at the 100 TB point) — far past broadcastable — so the
    customer side is left to the planner: AQE broadcasts it at
    small/moderate SF (runtime size stats) and falls back to a shuffle
    hash join on ``o_custkey`` at scale, where orders-after-year-filter
    (~15% of orders) is the smaller shuffle side. The same-nation
    constraint (``s_nationkey == c_nationkey``) rides the customer join
    as a conjunct. Final agg is a tiny groupBy on ≤25 nations. Revenue
    is exact integer units (cents × basis points), one terminal
    division.
    """
    cut_lo = F.lit(date_from).cast("timestamp")
    cut_hi = F.lit(date_to).cast("timestamp")
    cdim = (
        customer.select("c_custkey", "c_nationkey")
        .join(
            F.broadcast(
                nation.select("n_nationkey", "n_regionkey", "n_name")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(
                region.filter(F.col("r_name") == region_name).select(
                    "r_regionkey"
                )
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("c_custkey", "c_nationkey", "n_name")
    )
    o = orders.filter(
        (F.col("o_orderdate") >= cut_lo) & (F.col("o_orderdate") < cut_hi)
    ).select("o_orderkey", "o_custkey")
    li = lineitem.select(
        "l_orderkey",
        "l_suppkey",
        (
            to_units("l_extendedprice") * (F.lit(100) - to_units("l_discount"))
        ).alias("rev_u"),
    )
    s = supplier.select("s_suppkey", "s_nationkey")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        # No broadcast hint on the customer chain: customer is ~2% of
        # corpus (not broadcastable at 100 TB); AQE picks broadcast at
        # small SF from runtime stats and shuffle-hash at scale.
        .join(
            cdim,
            (F.col("o_custkey") == cdim["c_custkey"])
            & (F.col("s_nationkey") == cdim["c_nationkey"]),
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("lineitem_count"),
            F.sum("rev_u").alias("rev_u_sum"),
        )
        .select(
            "n_name",
            "lineitem_count",
            from_units("rev_u_sum", 4).alias("revenue"),
        )
    )


def promo_revenue(
    lineitem: DataFrame,
    part: DataFrame,
    date_from: str = "1996-09-01",
    date_to: str = "1996-10-01",
    promo_type: str = "PROMO",
) -> DataFrame:
    """TPC-H Q14 promotion effect: the percentage of one month's
    discounted revenue coming from promotional parts — one row.

    The testdata's ``p_type`` is the single TPC-H type class (PROMO,
    STANDARD, …), so the match is equality rather than upstream's
    ``LIKE 'PROMO%'`` prefix on the three-word type string. Part is a
    broadcast dimension; the month filter pushes to the lineitem scan, so
    the fact never shuffles — the aggregation is a single global sum of
    exact integer units with map-side partials, and the percentage is one
    terminal division of two exact longs (deterministic for the oracle).
    """
    li = lineitem.filter(
        (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
    ).select(
        "l_partkey",
        (
            to_units("l_extendedprice") * (F.lit(100) - to_units("l_discount"))
        ).alias("rev_u"),
    )
    p = part.select("p_partkey", "p_type")
    joined = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
    agg = joined.agg(
        F.sum(
            F.when(F.col("p_type") == promo_type, F.col("rev_u")).otherwise(
                F.lit(0)
            )
        ).alias("promo_u"),
        F.sum("rev_u").alias("total_u"),
    )
    return agg.select(
        from_units("promo_u", 4).alias("promo_revenue"),
        from_units("total_u", 4).alias("total_revenue"),
        (
            F.lit(100.0)
            * F.col("promo_u").cast("double")
            / F.col("total_u").cast("double")
        ).alias("promo_pct"),
    )


def large_orders(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    min_quantity: float = 300.0,
    limit: int = 100,
) -> DataFrame:
    """TPC-H Q18 large-volume customers: orders whose total lineitem
    quantity exceeds ``min_quantity``, with customer identity, ordered by
    total price desc / order date asc — top ``limit``.

    Scale shape: the quantity rollup is the one fact-scale exchange
    (groupBy orderkey with map-side partials, carrying a single double);
    the HAVING cut leaves a tiny qualifying set, which then BROADCASTS to
    orders — the fact table is never joined at full width. The final cut
    is a deterministic TakeOrderedAndProject (price desc, date asc,
    orderkey asc), never a global sort. o_totalprice rides as exact cents
    for the ordering and hash.
    """
    qual = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > F.lit(min_quantity))
    )
    o = orders.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        to_units("o_totalprice").alias("total_c"),
    )
    c = customer.select("c_custkey", "c_name")
    joined = (
        o.join(F.broadcast(qual), o["o_orderkey"] == qual["l_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias(
                "o_orderdate_ms"
            ),
            from_units("total_c").alias("o_totalprice"),
            "sum_qty",
            "total_c",
        )
    )
    return (
        joined.orderBy(
            F.col("total_c").desc(),
            F.col("o_orderdate_ms"),
            F.col("o_orderkey"),
        )
        .drop("total_c")
        .limit(limit)
    )


def volume_shipping(
    supplier: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    nation_a: str = "NATION_1",
    nation_b: str = "NATION_2",
    date_from: str = "1996-01-01",
    date_to: str = "1998-01-01",
) -> DataFrame:
    """TPC-H Q7-style volume shipping: revenue flowing between two
    nations per (supplier nation, customer nation, ship year), both
    directions.

    Join strategy at scale: the two-nation filter lands EARLY — supplier
    and customer each pre-join their (broadcast, 25-row) nation dim
    filtered to the two names, so lineitem rows from uninvolved supplier
    nations drop at the first broadcast join and order rows from
    uninvolved customer nations drop before the fact co-shuffle. The
    cross-pair constraint (a→b or b→a) is a post-join filter on two
    tiny dictionary columns. lineitem⋈orders co-shuffles on orderkey;
    the customer side is unhinted for the same reason as Q5 (~2% of
    corpus — AQE broadcasts at small SF, shuffles at scale). Final agg
    keys on (nation, nation, year) — ≤ 2·years groups.
    """
    cut_lo = F.lit(date_from).cast("timestamp")
    cut_hi = F.lit(date_to).cast("timestamp")
    nd = nation.filter(
        F.col("n_name").isin(nation_a, nation_b)
    ).select("n_nationkey", "n_name")
    s = supplier.join(
        F.broadcast(nd.withColumnRenamed("n_name", "supp_nation")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "supp_nation")
    c = customer.join(
        F.broadcast(nd.withColumnRenamed("n_name", "cust_nation")),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).select("c_custkey", "cust_nation")
    li = lineitem.filter(
        (F.col("l_shipdate") >= cut_lo) & (F.col("l_shipdate") < cut_hi)
    ).select(
        "l_orderkey",
        "l_suppkey",
        F.year(F.col("l_shipdate").cast("timestamp")).alias("l_year"),
        (
            to_units("l_extendedprice") * (F.lit(100) - to_units("l_discount"))
        ).alias("rev_u"),
    )
    o = orders.select("o_orderkey", "o_custkey")
    return (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .filter(
            ((F.col("supp_nation") == nation_a) & (F.col("cust_nation") == nation_b))
            | ((F.col("supp_nation") == nation_b) & (F.col("cust_nation") == nation_a))
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            F.count(F.lit(1)).alias("lineitem_count"),
            F.sum("rev_u").alias("rev_u_sum"),
        )
        .select(
            "supp_nation",
            "cust_nation",
            "l_year",
            "lineitem_count",
            from_units("rev_u_sum", 4).alias("revenue"),
        )
    )


def returned_item_report(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1996-04-01",
    limit: int = 20,
) -> DataFrame:
    """TPC-H Q10-style returned-item reporting: top customers by revenue
    lost to returned lineitems ('R' flag) for orders placed in one
    quarter.

    Join strategy at scale: the quarter filter pushes to the orders
    scan and the return flag to the lineitem scan; lineitem⋈orders
    co-shuffles on orderkey; the customer attach keys on custkey — the
    per-customer aggregation keys on c_custkey too, so the agg rides
    the customer join's exchange instead of adding one. Nation is
    broadcast. The top-k is a deterministic (revenue DESC, custkey)
    TakeOrderedAndProject — no global sort.
    """
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = lineitem.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey",
        (
            to_units("l_extendedprice") * (F.lit(100) - to_units("l_discount"))
        ).alias("rev_u"),
    )
    c = customer.select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
    joined = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum("rev_u").alias("rev_u_sum"))
    )
    return (
        joined.select(
            "c_custkey",
            "c_name",
            from_units("rev_u_sum", 4).alias("revenue"),
            "c_acctbal",
            "n_name",
            "rev_u_sum",
        )
        .orderBy(F.col("rev_u_sum").desc(), F.col("c_custkey"))
        .drop("rev_u_sum")
        .limit(limit)
    )


#: Q19-style promotion brackets: (brand, size_lo, size_hi, qty_lo, qty_hi).
DEFAULT_BRACKETS: list[tuple[str, int, int, int, int]] = [
    ("Brand#12", 1, 5, 1, 11),
    ("Brand#23", 1, 10, 10, 20),
    ("Brand#14", 1, 15, 20, 30),
]


def bracket_revenue(
    lineitem: DataFrame,
    part: DataFrame,
    brackets: list[tuple[str, int, int, int, int]] | None = None,
) -> DataFrame:
    """TPC-H Q19-style disjunctive bracket revenue: one row — the
    discounted revenue of lineitems whose (part brand, part size,
    quantity) satisfies ANY of the brackets.

    The point of this shape is pushdown of a DISJUNCTION: the exact OR
    can only be evaluated after the join, but its per-side envelopes
    push to the scans — lineitem reads only quantities within the union
    of the qty ranges, part only the bracket brands within the union of
    the size ranges (both visible in PushedFilters, pinned in
    test_plans). The filtered part side is left unhinted: at TPC-H
    ratios part is ~1% of corpus — broadcastable only at moderate SF —
    so AQE decides from runtime sizes (Q5 reasoning).
    """
    brackets = DEFAULT_BRACKETS if brackets is None else brackets
    qty_lo = min(b[3] for b in brackets)
    qty_hi = max(b[4] for b in brackets)
    size_lo = min(b[1] for b in brackets)
    size_hi = max(b[2] for b in brackets)
    brands = sorted({b[0] for b in brackets})
    li = lineitem.filter(
        (F.col("l_quantity") >= qty_lo) & (F.col("l_quantity") <= qty_hi)
    ).select(
        "l_partkey",
        "l_quantity",
        (
            to_units("l_extendedprice") * (F.lit(100) - to_units("l_discount"))
        ).alias("rev_u"),
    )
    p = part.filter(
        F.col("p_brand").isin(*brands)
        & (F.col("p_size") >= size_lo)
        & (F.col("p_size") <= size_hi)
    ).select("p_partkey", "p_brand", "p_size")
    disj = None
    for brand, s_lo, s_hi, q_lo, q_hi in brackets:
        term = (
            (F.col("p_brand") == brand)
            & (F.col("p_size") >= s_lo)
            & (F.col("p_size") <= s_hi)
            & (F.col("l_quantity") >= q_lo)
            & (F.col("l_quantity") <= q_hi)
        )
        disj = term if disj is None else (disj | term)
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .filter(disj)
        .agg(F.sum("rev_u").alias("rev_u_sum"))
        .select(from_units("rev_u_sum", 4).alias("revenue"))
    )


def customer_distribution(
    customer: DataFrame,
    orders: DataFrame,
    exclude_priority: str = "1-URGENT",
) -> DataFrame:
    """TPC-H Q13-style customer order-count distribution: how many
    customers placed exactly k (counted) orders — INCLUDING k = 0, which
    is why the join must be LEFT OUTER (an inner join silently drops the
    no-order customers, the population Q13 exists to expose).

    The per-side filter (upstream's comment NOT LIKE; this schema's
    priority exclusion) belongs in the JOIN CONDITION, not a WHERE —
    a WHERE would turn the outer join back into an inner one.

    Scale shape: the non-equi exclusion rides the orderkey/custkey
    equi-join as a conjunct; count(o_orderkey) counts only matched rows
    (NULL-skipping, the outer-join contract); first agg keys on custkey
    (co-partitioned with the join's own exchange), second agg reduces to
    the tiny distinct-count histogram.
    """
    o = orders.filter(F.col("o_orderpriority") != exclude_priority).select(
        "o_orderkey", "o_custkey"
    )
    c = customer.select("c_custkey")
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


def global_sales_opportunity(
    customer: DataFrame,
    orders: DataFrame,
    nationkeys: tuple[int, ...] = (1, 2, 3, 4, 5, 6, 7),
) -> DataFrame:
    """TPC-H Q22-style sales opportunity: per nation (upstream: phone
    country code; this schema keys nations directly), the count and
    total balance of ABOVE-AVERAGE-balance customers who have never
    placed an order.

    Exactness: the above-average gate compares INTEGERS —
    ``acctbal_units · n_positive > total_positive_units`` — instead of
    dividing out a double average, so the cut is bit-identical in any
    engine (a double `avg` differs in the last ulp across partial-agg
    orders and would flip borderline customers).

    Scale shape: the average is a broadcast 1-row aggregate (crossJoin
    of a scalar); never-ordered customers are a LEFT ANTI join against
    the orders keys (no payload moves, per-order dedup inside the join
    operator); final agg keys on the ≤25-value nation key.
    """
    cust = customer.filter(F.col("c_nationkey").isin(*nationkeys)).select(
        "c_custkey",
        "c_nationkey",
        to_units("c_acctbal").alias("bal_u"),
    )
    pos = cust.filter(F.col("bal_u") > 0).agg(
        F.sum("bal_u").alias("pos_total_u"),
        F.count(F.lit(1)).alias("pos_n"),
    )
    qualified = (
        cust.crossJoin(F.broadcast(pos))
        .filter(F.col("bal_u") * F.col("pos_n") > F.col("pos_total_u"))
        .select("c_custkey", "c_nationkey", "bal_u")
    )
    never_ordered = qualified.join(
        orders.select("o_custkey"),
        qualified["c_custkey"] == F.col("o_custkey"),
        "left_anti",
    )
    return never_ordered.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("numcust"),
        from_units(F.sum("bal_u")).alias("totacctbal"),
    )


def top_revenue_suppliers(
    supplier: DataFrame,
    lineitem: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1996-04-01",
) -> DataFrame:
    """TPC-H Q15-style top supplier: per-supplier revenue over a
    quarter, returning the supplier(s) whose revenue equals the
    maximum (upstream phrases this as a view + scalar subquery).

    Exactness: revenue is the exact integer unit product
    (``price_u · (100 − disc_u)``), so the max and the equality against
    it compare longs — no double ties to flip. The displayed revenue
    divides out the units once at the end.

    Scale shape: one fact scan with the date filter pushed down, one
    map-side-combined agg keyed on suppkey (|suppliers| groups), the
    scalar max as a 1-row broadcast crossJoin, and the supplier dim
    broadcast onto the ≤|suppliers| survivors. Nothing order-sized
    shuffles more than once.
    """
    cut_lo = F.lit(date_from).cast("timestamp")
    cut_hi = F.lit(date_to).cast("timestamp")
    rev = (
        lineitem.filter(
            (F.col("l_shipdate") >= cut_lo) & (F.col("l_shipdate") < cut_hi)
        )
        .select(
            "l_suppkey",
            (
                to_units("l_extendedprice")
                * (F.lit(100) - to_units("l_discount"))
            ).alias("rev_u"),
        )
        .groupBy("l_suppkey")
        .agg(F.sum("rev_u").alias("total_u"))
    )
    mx = rev.agg(F.max("total_u").alias("max_u"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_u") == F.col("max_u"))
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select(
            "s_suppkey",
            "s_name",
            from_units("total_u", 4).alias("total_revenue"),
        )
    )


def small_quantity_revenue(
    part: DataFrame,
    lineitem: DataFrame,
    brand: str = "Brand#23",
) -> DataFrame:
    """TPC-H Q17-style small-quantity-order revenue: average yearly
    revenue lost if small orders (quantity below 20% of the part's
    average order quantity) of one brand's parts were no longer taken.

    Exactness: the correlated-average gate compares integers —
    ``5 · qty · n_part < Σqty_part`` is exactly ``qty < 0.2 · avg`` for
    positive counts — so borderline lineitems cut identically in every
    engine; the single final division of two exact longs (Σprice_u / 7)
    is one correctly-rounded double op.

    Scale shape: the brand's parts are a broadcast filter onto the fact
    scan (partkey pruning before anything shuffles); the per-part
    quantity statistics aggregate the FILTERED fact with map-side
    partials (|brand parts| groups) and broadcast back onto the same
    filtered fact — the full lineitem never shuffles. This is the
    Spark rewrite of upstream's correlated scalar subquery.
    """
    pk = F.broadcast(
        part.filter(F.col("p_brand") == brand).select("p_partkey")
    )
    li = (
        lineitem.join(pk, F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "l_partkey",
            F.col("l_quantity").cast("long").alias("qty"),
            to_units("l_extendedprice").alias("price_u"),
        )
    )
    stats = li.groupBy(F.col("l_partkey").alias("sp_partkey")).agg(
        F.sum("qty").alias("sum_qty"),
        F.count(F.lit(1)).alias("n_li"),
    )
    small = li.join(
        F.broadcast(stats), F.col("l_partkey") == F.col("sp_partkey")
    ).filter(
        F.lit(5) * F.col("qty") * F.col("n_li") < F.col("sum_qty")
    )
    return small.agg(
        (
            F.coalesce(F.sum("price_u"), F.lit(0)).cast("double")
            / F.lit(7.0)
            / F.lit(100.0)
        ).alias("avg_yearly")
    )


def waiting_orders_by_supplier(
    supplier: DataFrame,
    nation: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation_name: str = "NATION_1",
    k: int = 20,
) -> DataFrame:
    """TPC-H Q21-style suppliers who kept orders waiting: for finished
    ('F') multi-supplier orders, count per supplier (of one nation) the
    orders where that supplier shipped LAST — some other supplier exists
    on the order (upstream's EXISTS) and none shipped strictly later
    (upstream's NOT EXISTS; this schema has no receiptdate, so shipdate
    is the lateness signal). Ties at the latest date count for every
    tied supplier, exactly like upstream's strict-inequality NOT EXISTS.

    Scale shape — the Spark rewrite of the double correlated self-join:
    instead of EXISTS + NOT EXISTS scans of lineitem per row (two extra
    fact joins and a duplicated fact subtree), ONE aggregation per
    (orderkey, suppkey) followed by per-orderkey WINDOW functions over
    its (already aggregated, one-row-per-supplier) output derive every
    predicate: supplier's max shipdate, order's max shipdate, and the
    order's distinct-supplier count — the fact is scanned once and
    nothing rejoins it. Both exists-conditions become timestamp/
    integer comparisons on the aggregated rows. Deterministic top-k via
    (numwait DESC, s_name) TakeOrderedAndProject.
    """
    from pyspark.sql.window import Window

    nk = nation.filter(F.col("n_name") == nation_name).select("n_nationkey")
    sup = (
        supplier.join(
            F.broadcast(nk),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    fo = orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    li = lineitem.join(
        fo, F.col("l_orderkey") == F.col("o_orderkey")
    ).select("l_orderkey", "l_suppkey", "l_shipdate")
    per_os = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("sup_max")
    )
    w_ok = Window.partitionBy("l_orderkey")
    waited = (
        per_os.withColumn("order_max", F.max("sup_max").over(w_ok))
        .withColumn("n_sup", F.count(F.lit(1)).over(w_ok))
        .filter(
            (F.col("n_sup") >= 2) & (F.col("sup_max") == F.col("order_max"))
        )
        .select("l_suppkey")
    )
    return (
        waited.join(
            F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(k)
    )


def national_market_share(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    part: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    target_nation: str = "NATION_1",
    market_region: str = "ASIA",
    part_type: str = "ECONOMY",
    date_from: str = "1995-01-01",
    date_to: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q8-style national market share: per order year, the share
    of one part type's revenue (orders from customers in one region)
    supplied by one nation.

    Exactness: the share is ``nation_rev_u / total_rev_u`` — ONE double
    division of two exact integer-unit sums per year — so it is
    bit-identical in any engine (upstream's sum(case)/sum over doubles
    is partial-order-dependent; summing the integer units first makes
    the order irrelevant).

    Scale shape: every dimension is filtered THEN broadcast (region→
    nation keys for the customer side, one-nation flag for the supplier
    side, one-type partkeys), so lineitem rows of other part types drop
    at the first broadcast join and order rows from other regions drop
    before the fact co-shuffle on orderkey — the only corpus-scale
    exchange. Final agg keys on the handful of order years.
    """
    cut_lo = F.lit(date_from).cast("timestamp")
    cut_hi = F.lit(date_to).cast("timestamp")
    rk = region.filter(F.col("r_name") == market_region).select("r_regionkey")
    mkt_nations = nation.join(
        F.broadcast(rk), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(F.col("n_nationkey").alias("mkt_nk"))
    c = customer.join(
        F.broadcast(mkt_nations), F.col("c_nationkey") == F.col("mkt_nk")
    ).select("c_custkey")
    sup_nation = nation.filter(F.col("n_name") == target_nation).select(
        F.col("n_nationkey").alias("tgt_nk")
    )
    s = supplier.join(
        F.broadcast(sup_nation),
        F.col("s_nationkey") == F.col("tgt_nk"),
        "left",
    ).select(
        "s_suppkey", F.col("tgt_nk").isNotNull().alias("is_target")
    )
    pk = part.filter(F.col("p_type") == part_type).select("p_partkey")
    li = (
        lineitem.join(F.broadcast(pk), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "l_orderkey",
            "is_target",
            (
                to_units("l_extendedprice")
                * (F.lit(100) - to_units("l_discount"))
            ).alias("rev_u"),
        )
    )
    o = orders.filter(
        (F.col("o_orderdate") >= cut_lo) & (F.col("o_orderdate") < cut_hi)
    ).select(
        "o_orderkey",
        "o_custkey",
        F.year(F.col("o_orderdate").cast("timestamp")).alias("o_year"),
    )
    joined = li.join(o, li["l_orderkey"] == o["o_orderkey"]).join(
        c, o["o_custkey"] == c["c_custkey"]
    )
    agg = joined.groupBy("o_year").agg(
        F.sum(
            F.when(F.col("is_target"), F.col("rev_u")).otherwise(F.lit(0))
        ).alias("nat_u"),
        F.sum("rev_u").alias("tot_u"),
    )
    return agg.select(
        "o_year",
        (F.col("nat_u").cast("double") / F.col("tot_u").cast("double")).alias(
            "mkt_share"
        ),
    )


def min_cost_supplier(
    region: DataFrame,
    nation: DataFrame,
    supplier: DataFrame,
    part: DataFrame,
    lineitem: DataFrame,
    region_name: str = "ASIA",
    part_type: str = "LARGE",
    max_size: int = 10,
) -> DataFrame:
    """TPC-H Q2-shaped min-cost supplier: for each qualifying part, the
    region's supplier(s) offering it at the minimum observed unit price
    (the driver testdata has no partsupp table, so the part↔supplier
    bridge is the lineitem history and ps_supplycost stands in as the
    observed ``l_extendedprice / l_quantity`` unit price — the same
    correlated ``= MIN(...)`` scalar-subquery shape as upstream Q2,
    reference parity: the keyed-minimum family of SURVEY.md §2 A7).

    Exactness: the unit price is ONE IEEE double division of two exact
    scan values, identical bit-for-bit in any engine; MIN and the
    equality probe then operate on identical doubles, so tie semantics
    (ALL suppliers achieving the minimum survive, as in Q2) are engine-
    independent without any float-sum ordering hazard.

    Scale shape: part (filtered to one type + size band) and the
    region's supplier roster are both broadcast, so the corpus-scale
    lineitem scan drops non-qualifying rows at map side; the correlated
    minimum is a RANK window over ONE exchange on partkey (rank keeps
    ties exactly like the ``= MIN`` probe) — the naive min+equality
    self-join would recompute the bridge subtree and scan the fact
    twice, so the window form halves the corpus cost; the only other
    work is the tiny terminal distinct over the winners.
    """
    from pyspark.sql import Window
    rk = region.filter(F.col("r_name") == region_name).select("r_regionkey")
    mkt = (
        supplier.join(
            F.broadcast(
                nation.join(
                    F.broadcast(rk),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                ).select("n_nationkey", "n_name")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    pf = part.filter(
        (F.col("p_type") == part_type) & (F.col("p_size") <= max_size)
    ).select("p_partkey", "p_name", "p_size")
    bridge = (
        lineitem.join(
            F.broadcast(pf), F.col("l_partkey") == F.col("p_partkey")
        )
        .join(
            F.broadcast(mkt.select("s_suppkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_semi",
        )
        .select(
            "p_partkey",
            "p_name",
            "p_size",
            F.col("l_suppkey").alias("supp"),
            (F.col("l_extendedprice") / F.col("l_quantity")).alias(
                "unit_price"
            ),
        )
    )
    w = Window.partitionBy("p_partkey").orderBy("unit_price")
    return (
        bridge.withColumn("rk", F.rank().over(w))
        .filter(F.col("rk") == 1)
        .join(F.broadcast(mkt), F.col("supp") == mkt["s_suppkey"])
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            "p_size",
            "unit_price",
        )
        .distinct()
    )


def product_type_profit(
    nation: DataFrame,
    supplier: DataFrame,
    part: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    name_pattern: str = "gear",
    retail_cost_pct: int = 60,
) -> DataFrame:
    """TPC-H Q9-shaped product-type profit: per (supplier nation, order
    year), sum of revenue minus supply cost over parts whose name
    contains a substring (no partsupp in the driver testdata, so supply
    cost is modeled as ``retail_cost_pct``% of ``p_retailprice`` per
    unit — the profit-decomposition shape survives intact).

    Exactness: profit accumulates as exact integer units — revenue at
    scale 1e4 (cents x basis points) and cost lifted to the same scale
    (cents x qty x 100 x pct / 100 keeps integrality because pct is an
    integer percent) — ONE terminal double division per output row.

    Scale shape: the name-filtered part dim broadcasts into the
    lineitem scan (map-side row drop before anything moves), supplier→
    nation broadcasts, and the only corpus-scale exchange is the
    fact co-shuffle with orders on orderkey; the final agg keys on
    (nation, year) — a few hundred groups.
    """
    pf = part.filter(F.col("p_name").contains(name_pattern)).select(
        "p_partkey", to_units("p_retailprice").alias("retail_c")
    )
    sn = supplier.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "n_name")
    li = (
        lineitem.join(F.broadcast(pf), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(sn), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "l_orderkey",
            "n_name",
            (
                to_units("l_extendedprice")
                * (F.lit(100) - to_units("l_discount"))
                - F.col("retail_c")
                * F.col("l_quantity").cast("long")
                * F.lit(retail_cost_pct)
            ).alias("profit_u"),
        )
    )
    o = orders.select(
        "o_orderkey",
        F.year(F.col("o_orderdate").cast("timestamp")).alias("o_year"),
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("n_name", "o_year")
        .agg(F.sum("profit_u").alias("profit_u_sum"))
        .select(
            F.col("n_name").alias("nation"),
            "o_year",
            from_units("profit_u_sum", 4).alias("sum_profit"),
        )
    )


def supplier_part_counts(
    supplier: DataFrame,
    part: DataFrame,
    lineitem: DataFrame,
    excl_brand: str = "Brand#13",
    excl_type: str = "MEDIUM",
    sizes: tuple[int, ...] = (1, 4, 9, 14, 19, 24, 29, 34),
) -> DataFrame:
    """TPC-H Q16-shaped parts/supplier relationship: distinct supplier
    count per (brand, type, size) over the part↔supplier bridge,
    excluding one brand, one type, off-list sizes, and a
    NOT-IN-subquery supplier set (negative account balance stands in
    for upstream's complaints-comment scan; the testdata's bridge is
    lineitem, not partsupp).

    Scale shape: the filtered part dim broadcasts into the fact scan;
    the excluded-supplier set is a broadcast LEFT ANTI (the NOT IN
    rewrite that preserves its semantics for a non-null key); the
    (part,supplier) bridge dedups inside the partial agg of ONE
    exchange keyed on the (brand,type,size) descriptor — supplier_cnt
    is COUNT(DISTINCT) over that already-collapsed set, no second
    corpus pass.
    """
    pf = part.filter(
        (F.col("p_brand") != excl_brand)
        & (F.col("p_type") != excl_type)
        & F.col("p_size").isin(*sizes)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        lineitem.select("l_partkey", "l_suppkey")
        .join(F.broadcast(pf), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(bad),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


def dominant_part_suppliers(
    nation: DataFrame,
    supplier: DataFrame,
    part: DataFrame,
    lineitem: DataFrame,
    name_prefix: str = "red",
    date_from: str = "1997-01-01",
    date_to: str = "1998-01-01",
) -> DataFrame:
    """TPC-H Q20-shaped part-promotion suppliers: suppliers who shipped
    MORE THAN HALF of some name-prefixed part's total volume in a year
    (upstream gates ps_availqty against half the shipped quantity; with
    lineitem as the only bridge, the same >50% correlated-aggregate
    gate selects the year's dominant supplier per part), with their
    nations.

    Exactness: quantities are integer-valued doubles summed exactly;
    the gate is the integer cross-multiply ``2*supp_qty > total_qty``
    — no division anywhere.

    Scale shape: prefix-filtered parts broadcast into the date-pruned
    fact scan; the per-(part,supplier) agg is the one corpus-scale
    exchange, and the per-part total is a SUM WINDOW over that ALREADY
    vocabulary-sized table (one extra partkey exchange of the small
    table — a second aggregate would make Spark recompute the agg
    subtree and scan the fact twice); qualifying suppliers reach the
    supplier dim as a broadcast LEFT SEMI (EXISTS) probe.
    """
    from pyspark.sql import Window
    pf = part.filter(F.col("p_name").startswith(name_prefix)).select(
        "p_partkey"
    )
    ps = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
        )
        .join(F.broadcast(pf), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("supp_qty"))
    )
    qualifying = (
        ps.withColumn(
            "total_qty",
            F.sum("supp_qty").over(Window.partitionBy("l_partkey")),
        )
        .filter(F.lit(2) * F.col("supp_qty") > F.col("total_qty"))
        .select("l_suppkey")
    )
    return (
        supplier.join(
            F.broadcast(qualifying),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", F.col("n_name").alias("nation"))
    )


def important_stock_value(
    nation: DataFrame,
    supplier: DataFrame,
    lineitem: DataFrame,
    nation_name: str = "NATION_7",
    fraction_num: int = 1,
    fraction_den: int = 1000,
) -> DataFrame:
    """TPC-H Q11-shaped important stock: per-part value of one nation's
    supply, keeping parts whose value exceeds ``fraction`` of the
    nation's total (the classic HAVING-share query). Re-grounded on the
    lineitem part↔supplier bridge like Q2/Q9/Q16/Q20 (this testdata has
    no partsupp): value(part) = Σ extendedprice shipped by the nation's
    suppliers — the same "how much of this nation's business is this
    part" share semantics with shipped value standing in for
    supplycost·availqty.

    Exactness: prices sum as integer hundredths (functions/money.py);
    the share gate is the integer cross-multiply
    ``value_units · fraction_den > total_units · fraction_num`` — no
    division; the emitted ``value`` is one terminal unscale division.

    Scale shape: the nation's suppliers broadcast LEFT SEMI into the
    fact scan (the only corpus-scale input touched once); the per-part
    aggregation is the one big exchange; the national total is a
    single-partition window over that ALREADY part-sized table (the
    Q20 pattern — a second aggregate would re-evaluate the agg subtree
    and rescan the fact).
    """
    from pyspark.sql import Window

    from flink_streaming_2_10_spark.functions.money import (
        from_units,
        to_units,
    )

    nk = nation.filter(F.col("n_name") == nation_name).select("n_nationkey")
    sups = supplier.join(
        F.broadcast(nk), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey")
    per_part = (
        lineitem.join(
            F.broadcast(sups),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_semi",
        )
        .groupBy("l_partkey")
        .agg(
            F.sum(to_units("l_extendedprice")).alias("value_units")
        )
    )
    # National total as a 1-row aggregate broadcast back (the totals-row
    # pattern every other share query here uses), NOT a single-partition
    # window: the window form moves the ENTIRE per-part table into one
    # task (partkey cardinality scales with the corpus — a straggler at
    # 100 TB), while the agg's final combine moves only per-partition
    # partials. The per-part aggregation subtree appears on both
    # branches, but they share one Exchange at runtime (ReusedExchange),
    # so the fact is still scanned once.
    total = per_part.agg(F.sum("value_units").alias("__total"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(
            F.col("value_units") * F.lit(int(fraction_den))
            > F.col("__total") * F.lit(int(fraction_num))
        )
        .select(
            F.col("l_partkey").alias("partkey"),
            from_units("value_units").alias("value"),
        )
    )
