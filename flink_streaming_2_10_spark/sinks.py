"""Sinks (SURVEY.md §2.2 K1-K5).

The reference's sinks are stdout/stderr ``print`` and ``writeAsText`` with
optional overwrite and sink-parallelism-1 (WindowJoin.scala:78). Spark
mapping: console sink / text writer; ``setParallelism(1)`` → ``coalesce(1)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def to_text_lines(df: DataFrame) -> DataFrame:
    """Serialize every row to the reference's tuple ``(a,b,...)`` text shape
    (PojoExample.java:130-132 toString contract) as a single ``value``
    column, ready for a text sink."""
    return df.select(
        F.concat(
            F.lit("("),
            F.concat_ws(",", *[F.col(c).cast("string") for c in df.columns]),
            F.lit(")"),
        ).alias("value")
    )


def write_as_text(df: DataFrame, path: str, overwrite: bool = False) -> None:
    """K3/K4 (``writeAsText`` — WordCount.java:86; overwrite mode at
    WindowJoinITCase.scala:61)."""
    writer = to_text_lines(df).write
    if overwrite:
        writer = writer.mode("overwrite")
    writer.text(path)


def print_sink(df: DataFrame, parallelism: int | None = None, n: int = 20) -> None:
    """K1/K5: stdout sink; ``parallelism=1`` coalesces first
    (print().setParallelism(1) — WindowJoin.scala:78)."""
    if parallelism is not None:
        df = df.coalesce(parallelism)
    df.show(n=n, truncate=False)


def console_stream_sink(df: DataFrame, output_mode: str = "update"):
    """K1 streaming: console sink for unbounded results."""
    return df.writeStream.outputMode(output_mode).format("console").start()
