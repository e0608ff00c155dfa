"""Windowed aggregation (A4/A8/A9) and argmax (A7) unit tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_streaming_2_10_spark.operators.argmax import max_by_record
from flink_streaming_2_10_spark.operators.windows import (
    session_window_agg,
    tumbling_window_agg,
    windowed_word_count,
)


def _ts(spark, rows, schema):
    df = spark.createDataFrame(rows, schema)
    return df.withColumn("ts", F.timestamp_millis(F.col("ms")))


def test_tumbling_window_word_count(spark):
    # F-6 contract: (ts, word) 5 s buckets
    rows = [(0, "a"), (1000, "a"), (4999, "b"), (5000, "a"), (9000, "a")]
    df = _ts(spark, rows, "ms long, word string").withColumn("frequency", F.lit(1))
    out = windowed_word_count(df, "5 seconds")
    got = {(r.window_start, r.word, r.cnt) for r in out.collect()}
    assert got == {(0, "a", 2), (0, "b", 1), (5000, "a", 2)}


def test_tumbling_window_epoch_alignment(spark):
    rows = [(1_700_000_001_234, "x")]
    df = _ts(spark, rows, "ms long, word string").withColumn("frequency", F.lit(1))
    out = windowed_word_count(df, "5 seconds").collect()[0]
    assert out.window_start == 1_700_000_000_000
    assert out.window_end == 1_700_000_005_000


def test_session_window_gap_semantics(spark):
    rows = [(0, 1), (100_000, 1), (100_000 + 299_999, 1), (900_000, 1)]
    df = _ts(spark, rows, "ms long, user_id int")
    out = session_window_agg(
        df, keys=["user_id"], aggs=[F.count(F.lit(1)).alias("cnt")], gap="5 minutes"
    )
    got = {(r.session_start, r.session_end, r.cnt) for r in out.collect()}
    # events at 0 and 100s merge (gap < 5 min); 399.999s chains onto 100s;
    # 900s starts fresh (> 5 min after 399.999s)
    assert got == {
        (0, 399_999 + 300_000, 3),
        (900_000, 1_200_000, 1),
    }


def test_max_by_record_tie_break_first_seen(spark):
    rows = [
        (1, 100, 9.0, 10),
        (1, 101, 9.0, 5),   # same speed, earlier time → wins
        (1, 102, 3.0, 1),
        (2, 200, 1.0, 1),
    ]
    df = spark.createDataFrame(rows, "k int, rec_id int, speed double, t long")
    out = max_by_record(df, keys=["k"], order_col="speed", tie_break=["t"])
    got = {(r.k, r.rec_id) for r in out.collect()}
    assert got == {(1, 101), (2, 200)}


def test_hypertable_rollup_tiers_are_consistent(spark):
    from datetime import datetime

    from flink_streaming_2_10_spark.operators.windows import hypertable_rollup

    rows = [
        # two hours inside one day, two event types
        (datetime(2024, 1, 1, 0, 10), "a", 100),
        (datetime(2024, 1, 1, 0, 50), "a", 200),
        (datetime(2024, 1, 1, 5, 0), "a", 50),
        (datetime(2024, 1, 1, 5, 30), "b", 25),
        # second day
        (datetime(2024, 1, 2, 3, 0), "a", 1000),
    ]
    df = spark.createDataFrame(rows, ["ts", "event_type", "value_c"])
    out = hypertable_rollup(
        df, keys=["event_type"], value_c_col="value_c",
        tiers=[("1h", 3_600_000), ("1d", 86_400_000)],
    )
    got = {
        (r["granularity"], r["window_start_ms"], r["event_type"]):
            (r["cnt"], r["value_c_sum"])
        for r in out.collect()
    }
    day1 = 1704067200000  # 2024-01-01T00:00Z
    assert got[("1h", day1, "a")] == (2, 300)
    assert got[("1h", day1 + 5 * 3_600_000, "a")] == (1, 50)
    assert got[("1h", day1 + 5 * 3_600_000, "b")] == (1, 25)
    assert got[("1d", day1, "a")] == (3, 350)
    assert got[("1d", day1, "b")] == (1, 25)
    assert got[("1d", day1 + 86_400_000, "a")] == (1, 1000)
    # every day-tier row equals the sum of its hour-tier rows
    assert len(got) == 7


def test_hypertable_rollup_rejects_non_nesting_tiers(spark):
    from datetime import datetime

    from flink_streaming_2_10_spark.operators.windows import hypertable_rollup

    df = spark.createDataFrame(
        [(datetime(2024, 1, 1), "a", 1)], ["ts", "event_type", "value_c"]
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="multiple"):
        hypertable_rollup(
            df, keys=["event_type"], value_c_col="value_c",
            tiers=[("1h", 3_600_000), ("90m", 5_400_000)],
        )


def test_hypertable_rollup_query_matches_oracle(spark, duck):
    import __spark_entry__ as entrymod
    from tests.conftest import SF_SMALL, assert_df_matches_oracle

    got = entrymod.queries()["hypertable_rollup"](spark, SF_SMALL)
    assert_df_matches_oracle(
        got, duck, entrymod.oracle_sql()["hypertable_rollup"]
    )
