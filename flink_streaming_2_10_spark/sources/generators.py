"""Sources (SURVEY.md §2.1 S1-S9).

Bounded sources map to ``spark.createDataFrame``/``spark.read``; unbounded
generators map to the ``rate`` streaming source plus deterministic column
transforms (its monotone ``value`` column replaces hand-rolled counter
loops, and ``rowsPerSecond`` replaces the reference's ThrottledIterator —
WindowJoinSampleData.scala:43,50).

Also provides the FIXTURES.md driver-table adapters: deriving the
grades/salaries (F-2/F-3) and car_events (F-4) shapes deterministically
from ``events.parquet`` so every operator has a reproducible oracle input.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

#: The reference's fixed name domain (WindowJoinSampleData.scala:35).
NAMES = ("tom", "jerry", "alice", "bob", "john", "grace")
GRADE_COUNT = 5  # WindowJoinSampleData.scala:36
SALARY_MAX = 10000  # WindowJoinSampleData.scala:37


def from_elements(spark: SparkSession, *values: str) -> DataFrame:
    """S1 (``env.fromElements`` — WordCount.java:75): bounded one-column
    source from varargs."""
    return spark.createDataFrame([(v,) for v in values], schema="text string")


def from_collection(spark: SparkSession, rows, schema) -> DataFrame:
    """S2 (``env.fromCollection`` — WindowJoinITCase.scala:47,54)."""
    return spark.createDataFrame(rows, schema=schema)


def read_text_lines(spark: SparkSession, path: str, streaming: bool = False):
    """S3 (``env.readTextFile`` — WordCount.java:70)."""
    reader = spark.readStream if streaming else spark.read
    return reader.text(path).withColumnRenamed("value", "text")


def socket_text_stream(spark: SparkSession, host: str, port: int) -> DataFrame:
    """S4 (``env.socketTextStream`` — SocketWindowWordCount.scala:58)."""
    return (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
        .withColumnRenamed("value", "text")
    )


def rate_stream(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """S6/S7: the rate source — a monotone counter (``value``) with
    wall-clock ``timestamp`` at a bounded rate (the reference's
    SimpleSource + ThrottledIterator in one built-in)."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )


def _name_of(col) -> F.Column:
    """Map an integer column onto the 6-name domain (S8 generator shape).

    The index is explicitly null-guarded: Spark 4.1.2's runtime
    ``ElementAt`` over a literal array returns the LAST element for a
    NULL index (while the constant-folded literal-index path correctly
    returns NULL — the asymmetry is an upstream bug the r18 nullkey
    sweep caught: NULL user_ids all mapped to 'grace' and inflated the
    window join 155 rows vs the oracle's 20). ANSI SQL and DuckDB both
    yield NULL for a NULL index."""
    idx = (col % 6 + 1).cast("int")
    return F.when(
        idx.isNotNull(),
        F.element_at(F.array(*[F.lit(n) for n in NAMES]), idx),
    )


def grade_stream(spark: SparkSession, rows_per_second: int = 3) -> DataFrame:
    """S8 GradeSource (WindowJoinSampleData.scala:55-63): uniform name from
    the 6-name domain, grade ∈ 1..GRADE_COUNT, at a throttled rate."""
    rate = rate_stream(spark, rows_per_second)
    return rate.select(
        F.col("timestamp").alias("ts"),
        _name_of(F.floor(F.rand() * 6)).alias("name"),
        (F.floor(F.rand() * GRADE_COUNT) + 1).cast("int").alias("grade"),
    )


def salary_stream(spark: SparkSession, rows_per_second: int = 3) -> DataFrame:
    """S8 SalarySource (WindowJoinSampleData.scala:65-75): salary ∈
    1..SALARY_MAX."""
    rate = rate_stream(spark, rows_per_second)
    return rate.select(
        F.col("timestamp").alias("ts"),
        _name_of(F.floor(F.rand() * 6)).alias("name"),
        (F.floor(F.rand() * SALARY_MAX) + 1).cast("int").alias("salary"),
    )


def grades_from_events(events: DataFrame) -> DataFrame:
    """F-2 driver-table adapter: deterministic grades stream derived from
    ``events`` (left side = 'click'/'view' events). name ← user_id mod 6,
    grade ← value folded into 1..5."""
    # floor() before the long cast: Spark's double→long cast truncates but
    # DuckDB's rounds, so an explicit floor keeps the oracle in agreement.
    return events.filter(F.col("event_type").isin("click", "view")).select(
        F.col("ts"),
        _name_of(F.col("user_id")).alias("name"),
        (F.pmod(F.floor(F.col("value")).cast("long"), F.lit(GRADE_COUNT)) + 1)
        .cast("int")
        .alias("grade"),
    )


def salaries_from_events(events: DataFrame) -> DataFrame:
    """F-3 driver-table adapter: right side = 'purchase'/'error' events,
    salary ← value folded into 1..10000."""
    return events.filter(F.col("event_type").isin("purchase", "error")).select(
        F.col("ts"),
        _name_of(F.col("user_id")).alias("name"),
        (F.pmod(F.floor(F.col("value") * 100).cast("long"), F.lit(SALARY_MAX)) + 1)
        .cast("int")
        .alias("salary"),
    )


def car_events_from_events(events: DataFrame, num_cars: int = 4) -> DataFrame:
    """F-4 driver-table adapter: carId ← user_id mod num_cars, speed ←
    value as int, distance ← running sum of speed/3.6 per car in time order,
    time ← epoch millis. Distance is monotone per car like the reference
    generator (TopSpeedWindowing.scala:92).

    The running sum is a window function over (car, time) — at scale this is
    one exchange + per-partition sort, the standard cumulative-sum plan.

    TEST-FIXTURE ADAPTER, not a pattern for production cumulative ops:
    ``num_cars`` (default 4, mirroring the reference's tiny car domain)
    is the window's partition count, so the whole input funnels through
    ``num_cars`` partitions regardless of cluster size. Real cumulative
    pipelines must partition on a key whose cardinality scales with the
    data (session id, device id, …) — never a single-digit domain.
    """
    # A NULL user maps to no car: the delta-trigger oracle's recursive
    # fire chain partitions on carId with plain equality, where NULL
    # never matches — and a "car" aggregating every unattributed event
    # is fixture noise, not a vehicle (r18 nullkey sweep). Scan-pushed.
    base = events.filter(F.col("user_id").isNotNull()).select(
        F.pmod(F.col("user_id"), F.lit(num_cars)).cast("int").alias("carId"),
        F.col("value").cast("int").alias("speed"),
        F.unix_millis(F.col("ts")).alias("time"),
        F.col("event_id"),
    )
    w = (
        Window.partitionBy("carId")
        .orderBy("time", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return base.select(
        "carId",
        "speed",
        F.round(F.sum(F.col("speed") / F.lit(3.6)).over(w), 6).alias("distance"),
        "time",
    )


def car_event_simulator(
    spark: SparkSession,
    num_cars: int = 2,
    ticks: int = 100,
    seed: int = 42,
) -> DataFrame:
    """S5: the car simulator (TopSpeedWindowing.scala:76-101) as a bounded
    deterministic fixture generator: per car, speed random-walks ±5 clamped
    to [0,100], distance += speed/3.6 per 100 ms tick.

    Test-scale generator (driver-side numpy) — production inputs come from
    tables; the streaming analog is ``rate_stream`` + the same dynamics.
    """
    import numpy as np

    rng = np.random.default_rng(seed)
    rows = []
    t0 = 1_700_000_000_000
    for car in range(num_cars):
        speed, distance = 50, 0.0
        for tick in range(ticks):
            if rng.integers(0, 2) == 1:
                speed = min(speed + 5, 100)
            else:
                speed = max(speed - 5, 0)
            distance += speed / 3.6
            rows.append((car, speed, distance, t0 + tick * 100))
    return spark.createDataFrame(
        rows, schema="carId int, speed int, distance double, time long"
    )


def tweet_fixtures(spark: SparkSession) -> DataFrame:
    """S9 substitute: tweet-shaped JSON rows replaying the fixture content
    shape of TwitterExampleData.java:22-26 (three English tweets whose text
    is 'Apache Flink', yielding the golden rolling counts at :28), plus
    non-English and no-text rows to exercise the predicate."""
    def tweet(text: str | None, lang: str, tid: int) -> str:
        doc: dict = {
            "created_at": "Mon Jan 01 00:00:00 +0000 2024",
            "id": tid,
            "user": {"lang": lang},
            "entities": {"hashtags": [{"text": "example"}]},
        }
        if text is not None:
            doc["text"] = text
        return json.dumps(doc)

    rows = [
        (tweet("Apache Flink", "en", 1),),
        (tweet("Apache Flink", "en", 2),),
        (tweet("Apache Flink", "en", 3),),
        (tweet("Apache Spark", "de", 4),),
        (tweet(None, "en", 5),),
    ]
    return spark.createDataFrame(rows, schema="json string")
