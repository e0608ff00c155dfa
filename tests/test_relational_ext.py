"""Semantics micros + plan pins for the Q2/Q9/Q16/Q20-shaped relational
operators (the four TPC-H shapes the earlier rounds could not express
until the lineitem bridge stood in for the absent partsupp table).

Oracle parity at sf0.001 for all four keys is covered by
tests/test_entry_contract.py like every registry query; these tests pin
the SEMANTIC corners the oracle data may not hit (min ties, the exact
>50% boundary, NOT-IN exclusion) and the plan shapes the 100 TB argument
rests on.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import Row

from flink_streaming_2_10_spark.operators.relational import (
    dominant_part_suppliers,
    min_cost_supplier,
    product_type_profit,
    supplier_part_counts,
)
from tests.conftest import SF_SMALL


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _region(spark):
    return spark.createDataFrame(
        [Row(r_regionkey=0, r_name="ASIA"), Row(r_regionkey=1, r_name="EUROPE")]
    )


def _nation(spark):
    return spark.createDataFrame(
        [
            Row(n_nationkey=0, n_name="N_ASIA", n_regionkey=0),
            Row(n_nationkey=1, n_name="N_EUR", n_regionkey=1),
        ]
    )


def _supplier(spark, rows):
    return spark.createDataFrame(
        [Row(s_suppkey=k, s_name=f"S{k}", s_nationkey=nk, s_acctbal=bal)
         for k, nk, bal in rows]
    )


def _part(spark, rows):
    return spark.createDataFrame(
        [Row(p_partkey=k, p_name=nm, p_brand=br, p_type=ty, p_size=sz,
             p_retailprice=rp)
         for k, nm, br, ty, sz, rp in rows]
    )


def _lineitem(spark, rows):
    """rows: (orderkey, partkey, suppkey, qty, extprice, disc, shipdate)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [Row(l_orderkey=o, l_partkey=p, l_suppkey=s, l_quantity=float(q),
             l_extendedprice=ep, l_discount=d, l_tax=0.0, l_shipdate=sd)
         for o, p, s, q, ep, d, sd in rows]
    )
    return df.withColumn("l_shipdate", F.col("l_shipdate").cast("timestamp"))


def test_q2_keeps_all_min_price_ties_and_drops_other_regions(spark):
    """Two ASIA suppliers tie at the minimum unit price — BOTH survive
    (Q2's correlated `= MIN` keeps ties); a cheaper EUROPE supplier must
    not win because the minimum is taken over the region's roster only."""
    sup = _supplier(spark, [(1, 0, 10.0), (2, 0, 20.0), (3, 1, 30.0)])
    part = _part(
        spark, [(7, "red bolt", "Brand#1", "LARGE", 5, 900.0),
                (8, "red nut", "Brand#1", "SMALL", 5, 900.0)]
    )
    li = _lineitem(
        spark,
        [
            # part 7: suppliers 1 and 2 tie at unit 2.0; EUROPE supplier 3
            # offers 1.0 but sits outside the region.
            (100, 7, 1, 10, 20.0, 0.0, "1997-01-01"),
            (101, 7, 2, 5, 10.0, 0.0, "1997-02-01"),
            (102, 7, 3, 10, 10.0, 0.0, "1997-03-01"),
            # supplier 2 also offers part 7 at a worse price — only the
            # min row of a supplier's history may survive the probe.
            (103, 7, 2, 4, 12.0, 0.0, "1997-04-01"),
        ],
    )
    out = min_cost_supplier(
        _region(spark), _nation(spark), sup, part, li,
        region_name="ASIA", part_type="LARGE", max_size=10,
    ).collect()
    assert {(r.s_name, r.p_partkey, r.unit_price) for r in out} == {
        ("S1", 7, 2.0),
        ("S2", 7, 2.0),
    }


def test_q9_profit_is_exact_integer_units(spark):
    """One lineitem: revenue 100.00 at 10% discount minus 60% of retail
    cost x qty — checked against the hand-computed exact value."""
    sup = _supplier(spark, [(1, 0, 10.0)])
    part = _part(spark, [(7, "hot gear", "Brand#1", "PROMO", 5, 10.0)])
    li = _lineitem(spark, [(100, 7, 1, 2, 100.0, 0.10, "1997-06-01")])
    orders = spark.createDataFrame(
        [Row(o_orderkey=100, o_orderdate="1997-06-01")]
    )
    from pyspark.sql import functions as F

    orders = orders.withColumn(
        "o_orderdate", F.col("o_orderdate").cast("timestamp")
    )
    out = product_type_profit(
        _nation(spark), sup, part, orders, li,
        name_pattern="gear", retail_cost_pct=60,
    ).collect()
    # revenue = 100.00 * 0.90 = 90.0; cost = 10.00 * 2 * 0.60 = 12.0
    assert len(out) == 1
    row = out[0]
    assert (row.nation, row.o_year) == ("N_ASIA", 1997)
    assert row.sum_profit == 78.0


def test_q16_not_in_exclusion_and_distinct_count(spark):
    """Supplier 2 (negative balance) is excluded; supplier 1 shipping a
    part twice still counts once."""
    sup = _supplier(spark, [(1, 0, 10.0), (2, 0, -5.0)])
    part = _part(spark, [(7, "red bolt", "Brand#1", "LARGE", 4, 900.0)])
    li = _lineitem(
        spark,
        [
            (100, 7, 1, 1, 10.0, 0.0, "1997-01-01"),
            (101, 7, 1, 1, 10.0, 0.0, "1997-02-01"),
            (102, 7, 2, 1, 10.0, 0.0, "1997-03-01"),
        ],
    )
    out = supplier_part_counts(
        sup, part, li, excl_brand="Brand#13", excl_type="MEDIUM",
        sizes=(4,),
    ).collect()
    assert [(r.p_brand, r.p_type, r.p_size, r.supplier_cnt) for r in out] == [
        ("Brand#1", "LARGE", 4, 1)
    ]


def test_q20_gate_is_strictly_more_than_half(spark):
    """Exactly 50% of a part's volume does NOT qualify (2*q > total is
    strict); 60% does. Out-of-window shipments are invisible."""
    sup = _supplier(spark, [(1, 0, 10.0), (2, 0, 20.0), (3, 0, 30.0)])
    part = _part(spark, [(7, "red bolt", "Brand#1", "LARGE", 4, 900.0),
                         (8, "red nut", "Brand#1", "SMALL", 5, 900.0)])
    li = _lineitem(
        spark,
        [
            # part 7: 10 vs 10 — a dead-even split, nobody dominates.
            (100, 7, 1, 10, 10.0, 0.0, "1997-03-01"),
            (101, 7, 2, 10, 10.0, 0.0, "1997-05-01"),
            # part 8: supplier 3 ships 6 of 10.
            (102, 8, 3, 6, 10.0, 0.0, "1997-07-01"),
            (103, 8, 1, 4, 10.0, 0.0, "1997-08-01"),
            # supplier 2 ships a mountain of part 8 — outside the window.
            (104, 8, 2, 100, 10.0, 0.0, "1998-06-01"),
        ],
    )
    out = dominant_part_suppliers(
        _nation(spark), sup, part, li,
        name_prefix="red", date_from="1997-01-01", date_to="1998-01-01",
    ).collect()
    assert [(r.s_suppkey, r.nation) for r in out] == [(3, "N_ASIA")]


def test_q2_plan_broadcasts_dims_and_scans_fact_once(spark):
    import __spark_entry__ as entrymod

    plan = _plan(
        entrymod.queries()["tpch_q2_min_cost_supplier"](spark, SF_SMALL)
    )
    li_scans = [
        s for s in plan.split("\n(") if s.lstrip("0123456789) ").startswith(
            "Scan parquet"
        ) and "lineitem" in s
    ]
    assert len(li_scans) == 1, plan  # fact is touched exactly once
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan  # rank window, no min self-join


def test_q9_q16_q20_fact_drops_rows_map_side(spark):
    """All three: part-dim filters broadcast into the fact scan (no
    SortMergeJoin against lineitem at this SF) and, where a date band
    applies (Q20), it reaches the parquet scan."""
    import __spark_entry__ as entrymod

    for key, needs_pushed_date in (
        ("tpch_q9_product_profit", False),
        ("tpch_q16_parts_suppliers", False),
        ("tpch_q20_part_promotion", True),
    ):
        plan = _plan(entrymod.queries()[key](spark, SF_SMALL))
        assert "BroadcastHashJoin" in plan, (key, plan)
        fact_scans = [
            s for s in plan.split("\n(")
            if "Scan parquet" in s.split("\n")[0] and "lineitem" in s
        ]
        assert len(fact_scans) == 1, (key, plan)  # fact never rescans
        if needs_pushed_date:
            li = [s for s in plan.split("\n(") if "Scan parquet" in s.split(
                "\n")[0] and "lineitem" in s]
            assert li and "l_shipdate" in li[0].split("PushedFilters:")[1].split(
                "\n"
            )[0], (key, plan)


def test_q11_share_gate_is_strict_and_exact(spark):
    from flink_streaming_2_10_spark.operators.relational import (
        important_stock_value,
    )

    nation = spark.createDataFrame(
        [(1, "X"), (2, "Y")], "n_nationkey long, n_name string"
    )
    supplier = spark.createDataFrame(
        [(10, 1), (11, 1), (20, 2)],
        "s_suppkey long, s_nationkey long",
    )
    # Nation X ships parts: part 1 value 99.00, part 2 value 1.00
    # (total 100.00). With fraction 1/100 the gate is STRICT: part 2 at
    # exactly 1% is excluded, part 1 kept. Nation-Y rows must not count.
    lineitem = spark.createDataFrame(
        [
            (1, 10, 50.0),
            (1, 11, 49.0),
            (2, 10, 1.0),
            (3, 20, 1000.0),
        ],
        "l_partkey long, l_suppkey long, l_extendedprice double",
    )
    got = {
        r["partkey"]: r["value"]
        for r in important_stock_value(
            nation, supplier, lineitem,
            nation_name="X", fraction_num=1, fraction_den=100,
        ).collect()
    }
    assert got == {1: 99.0}


def test_pricing_cube_empty_slice_emits_ansi_grand_total(spark):
    """ANSI GROUP BY CUBE emits the () grand-total row even over an
    EMPTY input (count 0, NULL sums — DuckDB/Postgres semantics);
    Spark's grouping-set expansion returns zero rows. pricing_cube
    restores the standard row via the tiny-table fallback union — found
    live by the r16 fresh-seed fuzz campaign (6/6 seeds failed on the
    pre-fix operator whenever the drawn cutoff emptied the slice)."""
    from pyspark.sql import Row, functions as F

    from flink_streaming_2_10_spark.operators.relational import pricing_cube

    li = spark.createDataFrame(
        [],
        "l_shipdate timestamp, l_returnflag string, l_linestatus string, "
        "l_quantity double, l_extendedprice double, l_discount double",
    )
    got = pricing_cube(li, cutoff="1998-09-02").collect()
    assert got == [
        Row(
            l_returnflag="ALL",
            l_linestatus="ALL",
            cnt=0,
            sum_qty=None,
            revenue=None,
        )
    ]
    # and a NONempty slice still has no duplicate grand-total row
    li2 = spark.createDataFrame(
        [("1995-01-01", "N", "O", 2.0, 10.0, 0.05)],
        ["l_shipdate", "l_returnflag", "l_linestatus", "l_quantity",
         "l_extendedprice", "l_discount"],
    ).withColumn("l_shipdate", F.col("l_shipdate").cast("timestamp"))
    rows = pricing_cube(li2).collect()
    assert len(rows) == 4  # cell, two subtotals, one grand total
    assert sum(
        1 for r in rows
        if r.l_returnflag == "ALL" and r.l_linestatus == "ALL"
    ) == 1
