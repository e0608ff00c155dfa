"""Windowed keyed aggregation (SURVEY.md §2.4 A4, A8, A9).

Reference:
* A4 — ``SocketWindowWordCount.scala:64-66``:
  ``keyBy("word").timeWindow(Time.seconds(5)).sum("count")`` — tumbling
  processing-time window.
* A8 — ``TopSpeedWindowing.scala:105``: ``assignAscendingTimestamps`` —
  event-time designation with a zero-delay watermark (ascending input).
* A9 — session windows: pom-declared (pom.xml:328-349, source stripped);
  Spark's ``session_window`` covers it natively.

Batch/streaming agnostic: ``window()``/``session_window()`` work on both;
``with_event_time`` adds the watermark only on streaming inputs (watermarks
are a streaming-only concept).

Scale notes: groupBy(window, key) is a single hash exchange with map-side
partial aggregation; window buckets are computed scan-side (no pre-shuffle
sort). State (streaming) is bounded by watermark eviction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def with_event_time(
    df: DataFrame, ts_col: str = "ts", delay: str = "0 seconds"
) -> DataFrame:
    """A8: designate the event-time column and (streaming only) attach a
    watermark. ``assignAscendingTimestamps`` ⇒ zero-delay watermark is safe
    (TopSpeedWindowing.scala:105)."""
    if df.isStreaming:
        return df.withWatermark(ts_col, delay)
    return df


def stamp_processing_time(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Processing/ingestion-time stamping (SocketWindowWordCount's implicit
    processing time; WindowJoin.scala:64 ingestion time): stamp the wall
    clock at ingest and treat it as event time downstream."""
    return df.withColumn(ts_col, F.current_timestamp())


def tumbling_window_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[Column],
    window_size: str = "5 seconds",
    ts_col: str = "ts",
    delay: str = "0 seconds",
) -> DataFrame:
    """A4 generalized: tumbling window + keyed aggregation.

    Output carries ``window_start``/``window_end`` as epoch-millis longs —
    integer window bounds hash identically in Spark and the DuckDB oracle
    (raw timestamps differ in sub-microsecond precision).
    """
    agged = (
        with_event_time(df, ts_col, delay)
        .groupBy(F.window(F.col(ts_col), window_size), *[F.col(k) for k in keys])
        .agg(*aggs)
    )
    # Result layout is [window, *keys, *aggs] — derive agg names positionally.
    agg_names = agged.columns[1 + len(keys) :]
    return agged.select(
        F.unix_millis(F.col("window.start")).alias("window_start"),
        F.unix_millis(F.col("window.end")).alias("window_end"),
        *[F.col(k) for k in keys],
        *[F.col(c) for c in agg_names],
    )


def session_window_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[Column],
    gap: str = "5 minutes",
    ts_col: str = "ts",
    delay: str = "0 seconds",
) -> DataFrame:
    """A9 (stretch, pom-implied): session windows with a fixed inactivity
    gap; window end = last event + gap (Spark ``session_window`` semantics,
    which match Flink's ``EventTimeSessionWindows.withGap``)."""
    agged = (
        with_event_time(df, ts_col, delay)
        .groupBy(F.session_window(F.col(ts_col), gap), *[F.col(k) for k in keys])
        .agg(*aggs)
    )
    agg_names = agged.columns[1 + len(keys) :]
    return agged.select(
        F.unix_millis(F.col("session_window.start")).alias("session_start"),
        F.unix_millis(F.col("session_window.end")).alias("session_end"),
        *[F.col(k) for k in keys],
        *[F.col(c) for c in agg_names],
    )


def windowed_word_count(
    df: DataFrame,
    window_size: str = "5 seconds",
    ts_col: str = "ts",
    word_col: str = "word",
    count_col: str = "frequency",
) -> DataFrame:
    """A4 verbatim shape (SocketWindowWordCount.scala:64-66): per-window
    per-word sum of counts. Expects pre-tokenized ``(ts, word, count)``."""
    return tumbling_window_agg(
        df,
        keys=[word_col],
        aggs=[F.sum(count_col).alias("cnt")],
        window_size=window_size,
        ts_col=ts_col,
    )
