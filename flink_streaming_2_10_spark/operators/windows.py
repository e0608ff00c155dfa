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
    gap; window end = last event + gap (Spark ``session_window``
    semantics). Exact-gap boundary: an event arriving at a delta of
    EXACTLY ``gap`` stays in-session — Spark's session merge treats the
    abutting window inclusively (verified empirically on Spark 4.1.2 and
    pinned at randomized gaps in tests/test_randomized_parity.py),
    matching Flink's ``EventTimeSessionWindows.withGap``
    (``TimeWindow.intersects`` is inclusive) and the event-labeling
    faces (``operators.temporal.sessionize``,
    ``streaming.runners.sessionize_stream``), which start a new session
    only when the delta EXCEEDS the gap. An earlier revision of this
    docstring claimed Spark was half-open-exclusive at the boundary;
    the r15 randomized gap sweep disproved that and caught the oracle
    carrying the same wrong assumption (latent only — real event data
    never lands an exact-gap delta)."""
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


def hypertable_rollup(
    df: DataFrame,
    keys: list[str],
    value_c_col: str,
    tiers: list[tuple[str, int]],
    ts_col: str = "ts",
) -> DataFrame:
    """Hypertable-style continuous aggregate: keyed count/sum rollups at a
    chain of time granularities, where each coarser tier aggregates the
    PREVIOUS tier's partials instead of rescanning raw rows — the
    TimescaleDB continuous-aggregate / OLAP summary-table pattern.

    ``tiers`` is ``[(label, bucket_millis), ...]`` finest first; each
    bucket width must divide the next (1 h → 1 d → 7 d). The finest tier
    is the ONLY corpus-scale shuffle; every further tier exchanges just
    the previous tier's (bucket × key) rows — at 100 TB that's the
    difference between one scan feeding the whole granularity pyramid and
    one scan per granularity. ``value_c_col`` must already be exact
    integer units (functions/money.py::to_units), so tier-over-tier
    re-aggregation is associative and oracle-stable.

    Output: ``(granularity, window_start_ms, *keys, cnt, value_c_sum)``
    unioned across tiers (union of aligned projections — no shuffle).
    """
    if not tiers:
        raise ValueError("hypertable_rollup: need at least one tier")
    for (_, fine_ms), (_, coarse_ms) in zip(tiers, tiers[1:]):
        if coarse_ms % fine_ms != 0:
            raise ValueError(
                f"tier {coarse_ms} ms is not a multiple of {fine_ms} ms"
            )
    fine_label, fine_ms = tiers[0]
    # integer `div`, not float division + floor: epoch millis are positive
    # so truncation == floor, and the arithmetic is exact by construction.
    ws = F.expr(f"(unix_millis(`{ts_col}`) div {fine_ms}) * {fine_ms}L")
    from flink_streaming_2_10_spark.pipeline.caching import tracked_persist

    cur = (
        df.groupBy(ws.alias("window_start_ms"), *[F.col(k) for k in keys])
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(value_c_col).alias("value_c_sum"),
        )
    )
    levels = []
    for i, (label, ms) in enumerate(tiers):
        if i > 0:
            bucket = F.expr(f"(window_start_ms div {ms}) * {ms}L").alias(
                "window_start_ms"
            )
            cur = (
                cur.groupBy(bucket, *[F.col(k) for k in keys])
                .agg(
                    F.sum("cnt").alias("cnt"),
                    F.sum("value_c_sum").alias("value_c_sum"),
                )
            )
        if i < len(tiers) - 1:
            # Each non-final tier is consumed TWICE (its own output branch
            # + the next tier's input). Without materialization Catalyst
            # plans the whole chain once per union branch — i.e. one raw
            # scan per granularity, which defeats the pyramid. Persist the
            # partials (bucket × key rows, tiny next to the input).
            cur = tracked_persist(cur)
        levels.append(cur.select(F.lit(label).alias("granularity"), "*"))
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out
