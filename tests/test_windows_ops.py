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
