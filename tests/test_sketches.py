"""KMV cardinality sketch (pipeline/sketches.py): determinism,
duplicate-insensitivity, accuracy envelope, oracle parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_streaming_2_10_spark.catalog import load_table
from flink_streaming_2_10_spark.pipeline.sketches import kmv_distinct_estimate

SF_DIR = "/root/testdata/sf0.001"


def test_estimate_is_duplicate_insensitive(spark):
    base = [("g", f"value-{i}") for i in range(200)]
    dup = base + base * 3  # same distinct set, 4x the rows
    a = kmv_distinct_estimate(
        spark.createDataFrame(base, ["grp", "v"]), ["grp"], "v"
    ).collect()[0]["est_distinct"]
    b = kmv_distinct_estimate(
        spark.createDataFrame(dup, ["grp", "v"]), ["grp"], "v"
    ).collect()[0]["est_distinct"]
    assert a == b  # min over a multiset ignores multiplicity exactly


def test_estimate_is_deterministic_across_runs(spark):
    df = spark.createDataFrame(
        [("g", f"tok{i % 97}") for i in range(500)], ["grp", "v"]
    )
    runs = {
        kmv_distinct_estimate(df, ["grp"], "v").collect()[0]["est_distinct"]
        for _ in range(3)
    }
    assert len(runs) == 1


@pytest.mark.parametrize("n", [10, 300, 5000])
def test_accuracy_envelope(spark, n):
    df = spark.createDataFrame(
        [("g", f"item-{i}") for i in range(n)], ["grp", "v"]
    )
    est = kmv_distinct_estimate(df, ["grp"], "v", k=64).collect()[0][
        "est_distinct"
    ]
    # K=64 -> relative std ~12.5%; allow a 3-sigma-ish envelope
    assert 0.5 * n <= est <= 1.6 * n, (n, est)


def test_driver_query_matches_oracle_and_is_plausible(spark, duck):
    import __spark_entry__ as entrymod
    from tests.conftest import SF_SMALL, assert_df_matches_oracle

    got = entrymod.queries()["sketch_distinct_ngrams"](spark, SF_SMALL)
    assert_df_matches_oracle(
        got, duck, entrymod.oracle_sql()["sketch_distinct_ngrams"]
    )
    # estimates must be positive and the lang set complete
    rows = {r["lang"]: r["est_distinct"] for r in got.collect()}
    docs = load_table(spark, SF_SMALL, "documents")
    assert set(rows) == {
        r["lang"] for r in docs.select("lang").distinct().collect()
    }
    assert all(v > 0 for v in rows.values())


def test_windowed_distinct_users_buckets_and_accuracy(spark):
    from flink_streaming_2_10_spark.pipeline.sketches import (
        windowed_distinct_users,
    )

    HOUR = 3_600_000_000
    rows = []
    # Hour 0: users 0..9 (10 distinct, with repeats); hour 1: users 0..2.
    for u in range(10):
        rows.append((u, u * 7))
        rows.append((u, u * 11 + 5))
    for u in range(3):
        rows.append((u, HOUR + u))
    df = spark.createDataFrame(rows, "user_id long, t long")
    got = {
        r["window_start_us"]: r.asDict()
        for r in windowed_distinct_users(df, k=64).collect()
    }
    assert set(got) == {0, HOUR}
    assert got[0]["exact_users"] == 10
    assert got[HOUR]["exact_users"] == 3
    # Cardinality well below K: every minimum is a true order statistic,
    # so the estimate lands near the truth.
    assert abs(got[0]["est_distinct"] - 10) < 4.0
    assert abs(got[HOUR]["est_distinct"] - 3) < 1.5


def test_windowed_kmv_estimate_is_deterministic(spark):
    from flink_streaming_2_10_spark.pipeline.sketches import (
        windowed_distinct_users,
    )

    df = spark.createDataFrame(
        [(u % 50, u) for u in range(500)], "user_id long, t long"
    )
    a = windowed_distinct_users(df, k=64).collect()[0]["est_distinct"]
    b = windowed_distinct_users(df, k=64).collect()[0]["est_distinct"]
    assert a == b


def test_windowed_kmv_streams_where_distinct_cannot(spark, tmp_path):
    """Streaming aggregation does not support countDistinct — the KMV
    minima ARE plain min aggregates, so the sketch column is the
    windowed-distinct answer that runs live. Final streamed estimates
    must equal the batch estimates bit-for-bit."""
    from pyspark.sql import functions as F

    from flink_streaming_2_10_spark.pipeline.sketches import (
        kmv_distinct_estimate,
    )

    HOUR = 3_600_000_000
    rows = [(u % 40, (u % 2) * HOUR + u) for u in range(300)]
    df = spark.createDataFrame(rows, "user_id long, t long")
    src = str(tmp_path / "src")
    df.write.parquet(src)

    def bucketed(d):
        # same truncating `div` bucket as windowed_distinct_users
        return d.select(
            (F.expr(f"t div {HOUR}") * HOUR).alias("window_start_us"),
            "user_id",
        )

    batch = {
        r["window_start_us"]: r["est_distinct"]
        for r in kmv_distinct_estimate(
            bucketed(df), ["window_start_us"], "user_id", k=32,
            hasher="md5",
        ).collect()
    }
    stream = spark.readStream.schema("user_id long, t long").parquet(src)
    q = (
        kmv_distinct_estimate(
            bucketed(stream), ["window_start_us"], "user_id", k=32,
            hasher="md5",
        )
        .writeStream.format("memory")
        .queryName("kmv_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["window_start_us"]: r["est_distinct"]
        for r in spark.sql("select * from kmv_stream").collect()
    }
    assert got == batch


def test_windowed_distinct_negative_timestamp_parity(spark):
    """ADVICE r11 suspected Spark `div` (truncate toward zero) diverges
    from DuckDB `//` (assumed floor) on pre-1970 timestamps. Verified
    instead: DuckDB's INTEGER `//` ALSO truncates toward zero
    (-1 // 10 = 0 on BIGINTs), so the engines agree on every sign with
    the existing formulation — pin that agreement so a dialect change
    in either engine surfaces here, not in a driver hash-mismatch."""
    import duckdb

    from flink_streaming_2_10_spark.pipeline.sketches import (
        windowed_distinct_users,
    )

    HOUR = 3_600_000_000
    rows = [(1, -1), (2, -HOUR), (3, -HOUR - 1), (4, 0), (5, 1)]
    df = spark.createDataFrame(rows, "user_id long, t long")
    got = {
        r["window_start_us"]: r["exact_users"]
        for r in windowed_distinct_users(df, k=4).collect()
    }
    con = duckdb.connect()
    want = {
        w: n
        for w, n in con.execute(
            "SELECT (t // {h}) * {h} AS w, count(DISTINCT user_id) "
            "FROM (VALUES (1,-1),(2,-{h}),(3,-{h}-1),(4,0),(5,1)) "
            "AS v(user_id, t) GROUP BY 1".format(h=HOUR)
        ).fetchall()
    }
    assert got == want
    # Both engines truncate: -1 buckets to window 0, -HOUR-1 to -HOUR.
    assert got == {-HOUR: 2, 0: 3}
