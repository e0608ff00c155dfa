"""Late-data policy pins (append mode): a row whose event time is behind
the late-record watermark when its micro-batch runs must be DROPPED —
from tumbling aggregation, session aggregation, and the stream-stream
interval join.

The reference needs only the drop-after-watermark default (SURVEY.md
§1.3: Flink 1.1 had no allowed-lateness / side-output machinery yet), so
Spark's default drop semantics ARE the parity target; these tests pin
that late rows are actually excluded rather than silently folded in — a
correctness property no batch-parity test can see, because batch runs
have no watermark.

Spark's exact mechanics (pinned here, verified empirically on 4.1.2):
the watermark advances at the END of each micro-batch (max event time −
delay), but stateful operators filter LATE INPUT against the watermark
of the batch BEFORE the one that advanced it (``watermarkForLateEvents``
vs ``watermarkForEviction``, split in SPARK-40925) — i.e. one batch of
lenience. A row arriving in the very next batch after a big watermark
advance is still merged; a row arriving TWO batches after is dropped
(``numRowsDroppedByWatermark``). The tests therefore put a spacer batch
between the watermark-advancing flush and the late row.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_streaming_2_10_spark.operators.windows import (
    session_window_agg,
    tumbling_window_agg,
)
from flink_streaming_2_10_spark.streaming.runners import (
    interval_join_event_stream,
)
from tests.stream_util import collect_stream
from tests.test_streaming import _stream_lines, _write_text_files

_T0 = 1704067200000  # 2024-01-01 00:00:00 UTC, epoch millis


def _parse_user(df):
    parts = F.split(F.col("text"), ",")
    return df.select(
        F.element_at(parts, 1).cast("timestamp").alias("ts"),
        F.element_at(parts, 2).alias("user"),
    )


def test_tumbling_agg_drops_late_row_beyond_watermark(spark, tmp_path):
    src = str(tmp_path / "in")
    _write_text_files(
        src,
        [
            # batch 0: one on-time event + a flush that advances the
            # watermark to 00:10:00 (delay 0) at batch end
            "2024-01-01 00:00:30,a\n2024-01-01 00:10:00,flush",
            # batch 1: spacer — makes 00:10:00 the LATE-event watermark
            # for batch 2 (and evicts/emits the [00:00, 00:01) window)
            "2024-01-01 00:10:30,flush",
            # batch 2: late event for the closed [00:00, 00:01) window —
            # must be dropped, not counted and not re-emitted
            "2024-01-01 00:00:40,a",
            # batch 3: flush far enough to close every open window
            "2024-01-01 00:20:00,flush2",
        ],
    )
    stream = tumbling_window_agg(
        _parse_user(_stream_lines(spark, src)),
        keys=["user"],
        aggs=[F.count(F.lit(1)).alias("cnt")],
        window_size="1 minute",
        delay="0 seconds",
    )
    batches = collect_stream(stream, str(tmp_path / "ck"), output_mode="append")
    a_rows = [
        (r["window_start"], r["window_end"], r["cnt"])
        for batch in batches for r in batch if r["user"] == "a"
    ]
    # exactly ONE closed window for 'a', counting only the on-time event:
    # the late row neither increments the count (cnt would be 2) nor
    # reopens the window (a second 'a' row would appear)
    assert a_rows == [(_T0, _T0 + 60_000, 1)]


def test_session_agg_drops_late_row_beyond_watermark(spark, tmp_path):
    src = str(tmp_path / "in")
    _write_text_files(
        src,
        [
            # batch 0: a's session + watermark flush to 00:30:00
            "2024-01-01 00:00:00,a\n2024-01-01 00:30:00,flush",
            # batch 1: spacer (00:30:00 becomes the late-event watermark)
            "2024-01-01 00:30:30,flush",
            # batch 2: late row that would have EXTENDED a's session to
            # [00:00, 00:06) had it been on time — must be dropped
            "2024-01-01 00:01:00,a",
            # batch 3: close remaining sessions
            "2024-01-01 01:00:00,flush2",
        ],
    )
    stream = session_window_agg(
        _parse_user(_stream_lines(spark, src)),
        keys=["user"],
        aggs=[F.count(F.lit(1)).alias("cnt")],
        gap="5 minutes",
        delay="0 seconds",
    )
    batches = collect_stream(stream, str(tmp_path / "ck"), output_mode="append")
    a_rows = [
        (r["session_start"], r["session_end"], r["cnt"])
        for batch in batches for r in batch if r["user"] == "a"
    ]
    # one session, unextended end (start + gap), count 1
    assert a_rows == [(_T0, _T0 + 300_000, 1)]


def test_interval_join_drops_late_right_row(spark, tmp_path):
    """A right row arriving behind the late-event watermark joins
    NOTHING, even though an event-time match existed: the left buffer
    was evicted when the watermark passed left_time + upper, and the
    late input row itself is filtered. A same-trigger on-time pair in
    the same batch proves the join still fires. Both sides carry
    watermark columns, so the GLOBAL watermark is their min — each
    batch advances both sides together."""

    def parse(df, val):
        parts = F.split(F.col("text"), ",")
        return df.select(
            F.element_at(parts, 1).cast("timestamp").alias("ts"),
            F.element_at(parts, 2).alias("k"),
            F.element_at(parts, 3).cast("int").alias(val),
        )

    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    _write_text_files(
        lsrc,
        [
            # batch 0: the row 91 would match, plus a watermark mover
            "2024-01-01 00:00:00,k,1\n2024-01-01 01:00:00,kl,80",
            # batch 1: spacer (global watermark 01:00 becomes the
            # late-event watermark for batch 2)
            "2024-01-01 01:00:10,kl,81",
            # batch 2: control left row — pairs with on-time right 92
            "2024-01-01 01:01:00,k,2",
        ],
    )
    _write_text_files(
        rsrc,
        [
            "2024-01-01 01:00:00,kr,90",  # batch 0: watermark mover
            "2024-01-01 01:00:10,kr,93",  # batch 1: spacer
            # batch 2: 91 is LATE (00:00:30 < 01:00) -> dropped;
            # 92 is on time and pairs with control left row 2
            "2024-01-01 00:00:30,k,91\n2024-01-01 01:01:30,k,92",
        ],
    )
    joined = interval_join_event_stream(
        parse(_stream_lines(spark, lsrc), "lid"),
        parse(_stream_lines(spark, rsrc), "rid"),
        on=["k"],
        left_time="ts",
        right_time="ts",
        lower_seconds=0,
        upper_seconds=60,
        watermark_delay="0 seconds",
    )
    batches = collect_stream(joined, str(tmp_path / "ck"), output_mode="append")
    got = {(r["lid"], r["r_rid"]) for batch in batches for r in batch}
    assert got == {(2, 92)}  # (1, 91) matched in event time but 91 was late
