"""Tumbling-window stream–stream equi join (SURVEY.md §2.4 A5).

Reference: ``WindowJoin.scala:85-95`` —
``grades.join(salaries).where(_.name).equalTo(_.name)
 .window(TumblingEventTimeWindows.of(Time.milliseconds(windowSize)))
 .apply { (g, s) => Person(g.name, g.grade, s.salary) }``

Spark-first mapping: bucket both sides with the same tumbling ``window()``,
then an inner equi-join on ``[key, window]`` — exactly the stream–stream
join shape Structured Streaming supports (watermark on both sides bounds
the join state). The projector closure becomes a ``select``.

The factoring mirrors the reference's testable ``joinStreams`` function
(WindowJoin.scala:85-88): pure DataFrames in, DataFrame out, so the same
function serves the streaming main, the batch oracle and the IT-style test
(WindowJoinITCase.scala:60).

Scale notes: both sides hash-exchange on (key, window) — co-partitioned
join, no broadcast needed for two big streams. For a small dimension side
use ``broadcast()`` upstream. Within a (key, window) group the result is a
cartesian product, matching Flink's window-join apply-per-pair contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from flink_streaming_2_10_spark.operators.windows import with_event_time


def window_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "name",
    window_size: str = "2 seconds",
    ts_col: str = "ts",
    delay: str = "0 seconds",
    projection: list[str] | None = None,
) -> DataFrame:
    """Inner equi-join of two streams within a shared tumbling window.

    Returns the projected columns plus ``window_start`` (epoch millis) so
    per-window pairs stay distinguishable.
    """
    lw = with_event_time(left, ts_col, delay).withColumn(
        "__lw", F.window(F.col(ts_col), window_size)
    )
    rw = (
        with_event_time(right, ts_col, delay)
        .withColumn("__rw", F.window(F.col(ts_col), window_size))
        .withColumnRenamed(key, "__rkey")
        .drop(ts_col)
    )
    # Join on [key, window]: both sides repartition by the same composite
    # key — a co-located shuffle hash join, the plan Catalyst picks here.
    joined = lw.join(
        rw,
        (F.col(key) == F.col("__rkey")) & (F.col("__lw") == F.col("__rw")),
        "inner",
    )
    out_cols = projection or [
        c
        for c in left.columns + right.columns
        if c not in (key, ts_col, "__lw", "__rw", "__rkey")
    ]
    return joined.select(
        F.unix_millis(F.col("__lw.start")).alias("window_start"),
        F.col(key),
        *[F.col(c) for c in out_cols],
    )


def join_grades_salaries(
    grades: DataFrame, salaries: DataFrame, window_size: str = "2 seconds"
) -> DataFrame:
    """The reference join verbatim (WindowJoin.scala:90-94): grades ⋈
    salaries on ``name`` per tumbling window → Person(name, grade, salary).

    Expects ``grades(ts, name, grade)`` and ``salaries(ts, name, salary)``.
    """
    return window_join(
        grades,
        salaries,
        key="name",
        window_size=window_size,
        projection=["grade", "salary"],
    )
