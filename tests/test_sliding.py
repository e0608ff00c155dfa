"""Sliding window assigner semantics + plan shape."""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import Row, functions as F

from flink_streaming_2_10_spark.operators.sliding import sliding_window_agg


def _mk(spark, ts_counts):
    rows = [
        Row(k="a", ts=t, v=1)
        for t in ts_counts
    ]
    return spark.createDataFrame(rows).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )


def test_each_event_lands_in_exactly_two_windows(spark):
    df = _mk(spark, ["2020-01-01 10:30:00"])
    out = sliding_window_agg(
        df, keys=["k"], aggs=[F.count(F.lit(1)).alias("cnt")],
        window_size="2 hours", slide="1 hour",
    ).collect()
    starts = sorted(r.window_start for r in out)
    # 10:30 → windows starting 09:00 and 10:00 (epoch-ms, 2020-01-01 UTC)
    base = 1577836800000 + 9 * 3600000
    assert starts == [base, base + 3600000]
    assert all(r.window_end - r.window_start == 7200000 for r in out)
    assert all(r.cnt == 1 for r in out)


def test_boundary_event_belongs_to_aligned_window_and_previous(spark):
    """An event exactly ON an hour boundary: member of the window that
    STARTS there and the one that started an hour before — half-open
    [start, end) semantics on both edges."""
    df = _mk(spark, ["2020-01-01 10:00:00"])
    out = sliding_window_agg(
        df, keys=["k"], aggs=[F.count(F.lit(1)).alias("cnt")],
        window_size="2 hours", slide="1 hour",
    ).collect()
    starts = sorted(r.window_start for r in out)
    base = 1577836800000 + 9 * 3600000
    assert starts == [base, base + 3600000]


def test_overlap_aggregates_accumulate_neighbors(spark):
    """Events in adjacent hours meet in the shared window."""
    df = _mk(spark, ["2020-01-01 10:10:00", "2020-01-01 11:10:00"])
    out = {
        r.window_start: r.cnt
        for r in sliding_window_agg(
            df, keys=["k"], aggs=[F.count(F.lit(1)).alias("cnt")],
            window_size="2 hours", slide="1 hour",
        ).collect()
    }
    h9 = 1577836800000 + 9 * 3600000
    h10, h11 = h9 + 3600000, h9 + 2 * 3600000
    assert out == {h9: 1, h10: 2, h11: 1}


def test_plan_single_exchange(spark):
    """The assigner is a scan-side explode + ONE hash exchange — no
    extra shuffle beyond the (window, key) aggregation."""
    import __spark_entry__ as entrymod
    from tests.conftest import SF_SMALL

    df = entrymod.queries()["sliding_window_agg"](spark, SF_SMALL)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # Spark 4 formatted explain numbers nodes "(6) Exchange" and puts the
    # hashpartitioning spelling on a separate Arguments: line.
    assert len(re.findall(r"\(\d+\) Exchange\b", plan)) == 1, plan
    assert "hashpartitioning" in plan, plan
    assert re.search(r"\(\d+\) (Expand|Generate)\b", plan), plan
