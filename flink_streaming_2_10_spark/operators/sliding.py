"""Sliding (hopping) event-time windows — the third Flink window
assigner next to tumbling (A4) and session (A9).

Reference: ``SlidingProcessingTimeWindows``/``SlidingEventTimeWindows``
are the assigners the reference's windowing examples parameterize
(flink-streaming pom examples; TopSpeedWindowing.scala:106 uses the
evictor-based global-window equivalent, covered by operators/topspeed).
Spark expresses the same semantics natively: ``F.window(ts, size,
slide)`` assigns each row to ``size/slide`` overlapping windows.

Scale notes: Spark implements the assigner as a scan-side EXPLODE of
each row into its ``size/slide`` member windows, followed by ONE hash
exchange on (window, keys) with map-side partial aggregation — so the
shuffle volume is the overlap factor times the tumbling equivalent.
Keep ``size/slide`` small (2–4) at corpus scale, or pre-aggregate into
slide-sized tumbling panes and roll panes into windows (the pane
optimization) when the overlap factor is large; for the 2× overlap used
here the direct form shuffles less than a pane join would.
Streaming: same watermark/eviction story as tumbling — state is
bounded by watermark minus the window size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from flink_streaming_2_10_spark.operators.windows import with_event_time


def sliding_window_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[Column],
    window_size: str = "2 hours",
    slide: str = "1 hour",
    ts_col: str = "ts",
    delay: str = "0 seconds",
) -> DataFrame:
    """Sliding event-time window + keyed aggregation.

    Output carries ``window_start``/``window_end`` as epoch-millis longs
    (integer bounds hash identically in Spark and the DuckDB oracle).
    Windows are epoch-aligned to multiples of ``slide``, matching both
    Flink's assigner and the oracle's integer bucket arithmetic.
    """
    agged = (
        with_event_time(df, ts_col, delay)
        .groupBy(
            F.window(F.col(ts_col), window_size, slide),
            *[F.col(k) for k in keys],
        )
        .agg(*aggs)
    )
    agg_names = agged.columns[1 + len(keys) :]
    return agged.select(
        F.unix_millis(F.col("window.start")).alias("window_start"),
        F.unix_millis(F.col("window.end")).alias("window_end"),
        *[F.col(k) for k in keys],
        *[F.col(c) for c in agg_names],
    )


def windowed_topk(
    df: DataFrame,
    key: str,
    window_size: str = "2 hours",
    slide: str = "1 hour",
    ts_col: str = "ts",
    k: int = 3,
) -> DataFrame:
    """Trending keys per sliding window: the ``k`` most frequent
    ``key`` values in every window, with rank — the canonical
    "trending topics" analytics shape (Flink's sliding-window top-N
    pattern).

    ``(window_start, window_end, <key>, n, rnk)``; total order inside a
    window is (count DESC, key ASC) so the cut is deterministic.

    Scale shape: the sliding count reuses :func:`sliding_window_agg`
    (scan-side Expand into member windows, ONE (window, key) exchange
    with map-side partials); the top-k cut is a rank window over the
    ALREADY aggregated (windows × keys)-sized table — one further
    exchange of count rows, never raw events, and Spark plans the
    rank-filter as WindowGroupLimit (per-partition heap, no global
    sort). Streaming face: run the windowed count watermarked in
    append mode and apply this rank in ``foreachBatch`` as each window
    closes — the count state is the only streaming state; batch==
    streamed final top-N pinned across a micro-batch boundary in
    tests/test_streaming.py::test_trending_topk_stream_equals_batch.
    """
    from pyspark.sql.window import Window

    counts = sliding_window_agg(
        df,
        keys=[key],
        aggs=[F.count(F.lit(1)).alias("n")],
        window_size=window_size,
        slide=slide,
        ts_col=ts_col,
    )
    w = Window.partitionBy("window_start").orderBy(
        F.col("n").desc(), F.col(key).asc()
    )
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= int(k))
    )
