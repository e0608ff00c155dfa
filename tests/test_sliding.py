"""Sliding window assigner semantics + plan shape."""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import Row, functions as F

from flink_streaming_2_10_spark.operators.sliding import sliding_window_agg


def _mk(spark, ts_counts):
    rows = [
        Row(k="a", ts=t, v=1)
        for t in ts_counts
    ]
    return spark.createDataFrame(rows).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )


def test_each_event_lands_in_exactly_two_windows(spark):
    df = _mk(spark, ["2020-01-01 10:30:00"])
    out = sliding_window_agg(
        df, keys=["k"], aggs=[F.count(F.lit(1)).alias("cnt")],
        window_size="2 hours", slide="1 hour",
    ).collect()
    starts = sorted(r.window_start for r in out)
    # 10:30 → windows starting 09:00 and 10:00 (epoch-ms, 2020-01-01 UTC)
    base = 1577836800000 + 9 * 3600000
    assert starts == [base, base + 3600000]
    assert all(r.window_end - r.window_start == 7200000 for r in out)
    assert all(r.cnt == 1 for r in out)


def test_boundary_event_belongs_to_aligned_window_and_previous(spark):
    """An event exactly ON an hour boundary: member of the window that
    STARTS there and the one that started an hour before — half-open
    [start, end) semantics on both edges."""
    df = _mk(spark, ["2020-01-01 10:00:00"])
    out = sliding_window_agg(
        df, keys=["k"], aggs=[F.count(F.lit(1)).alias("cnt")],
        window_size="2 hours", slide="1 hour",
    ).collect()
    starts = sorted(r.window_start for r in out)
    base = 1577836800000 + 9 * 3600000
    assert starts == [base, base + 3600000]


def test_overlap_aggregates_accumulate_neighbors(spark):
    """Events in adjacent hours meet in the shared window."""
    df = _mk(spark, ["2020-01-01 10:10:00", "2020-01-01 11:10:00"])
    out = {
        r.window_start: r.cnt
        for r in sliding_window_agg(
            df, keys=["k"], aggs=[F.count(F.lit(1)).alias("cnt")],
            window_size="2 hours", slide="1 hour",
        ).collect()
    }
    h9 = 1577836800000 + 9 * 3600000
    h10, h11 = h9 + 3600000, h9 + 2 * 3600000
    assert out == {h9: 1, h10: 2, h11: 1}


def test_sliding_stream_equals_batch(spark, tmp_path):
    """Streaming face: the same assigner over readStream + watermark —
    every window the watermark closes (append mode) matches the batch
    result on the same rows."""
    from tests.stream_util import collect_stream

    rows = [
        ("2024-01-01 00:00:01", "a"),
        ("2024-01-01 00:00:04", "a"),
        ("2024-01-01 00:00:07", "b"),
        ("2024-01-01 00:00:11", "a"),
        ("2024-01-01 00:10:00", "flush"),  # advances the watermark
    ]
    csv = "\n".join(f"{ts},{k}" for ts, k in rows)
    src = str(tmp_path / "in")
    src_dir = __import__("pathlib").Path(src)
    src_dir.mkdir(parents=True)
    (src_dir / "part0.txt").write_text(csv)

    def parse(df):
        parts = F.split(F.col("text"), ",")
        return df.select(
            F.element_at(parts, 1).cast("timestamp").alias("ts"),
            F.element_at(parts, 2).alias("k"),
        )

    def agg(df):
        return sliding_window_agg(
            df, keys=["k"], aggs=[F.count(F.lit(1)).alias("cnt")],
            window_size="10 seconds", slide="5 seconds",
        )

    batch = parse(
        spark.createDataFrame([(line,) for line in csv.split("\n")], ["text"])
    )
    expected = {
        (r.window_start, r.k, r.cnt) for r in agg(batch).collect()
    }
    stream_in = parse(
        spark.readStream.text(src).withColumnRenamed("value", "text")
    )
    batches = collect_stream(
        agg(stream_in), str(tmp_path / "ck"), output_mode="append"
    )
    got = {(r.window_start, r.k, r.cnt) for b in batches for r in b}
    assert got <= expected
    # append emits only watermark-closed windows: everything except the
    # flush row's own two member windows must have closed
    assert len(got) >= len(expected) - 2


def test_plan_single_exchange(spark):
    """The assigner is a scan-side explode + ONE hash exchange — no
    extra shuffle beyond the (window, key) aggregation."""
    import __spark_entry__ as entrymod
    from tests.conftest import SF_SMALL

    df = entrymod.queries()["sliding_window_agg"](spark, SF_SMALL)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # Spark 4 formatted explain numbers nodes "(6) Exchange" and puts the
    # hashpartitioning spelling on a separate Arguments: line.
    assert len(re.findall(r"\(\d+\) Exchange\b", plan)) == 1, plan
    assert "hashpartitioning" in plan, plan
    assert re.search(r"\(\d+\) (Expand|Generate)\b", plan), plan


class TestWindowedTopk:
    def test_trending_hand_computed(self, spark):
        from flink_streaming_2_10_spark.operators.sliding import (
            windowed_topk,
        )

        # Hour 0: a x3, b x2, c x1, d x1 -> top3 = a, b, c (tie c<d).
        rows = (
            [(i, "a", "2024-01-01 00:10:00") for i in range(3)]
            + [(10 + i, "b", "2024-01-01 00:20:00") for i in range(2)]
            + [(20, "c", "2024-01-01 00:30:00"),
               (21, "d", "2024-01-01 00:40:00")]
        )
        ev = spark.createDataFrame(
            rows, "event_id long, event_type string, ts_s string"
        ).selectExpr("event_id", "event_type", "cast(ts_s as timestamp) as ts")
        out = windowed_topk(ev, key="event_type", k=3)
        # Events at 00:xx fall in windows [-1h, 1h) and [0h, 2h).
        by_win = {}
        for r in out.collect():
            by_win.setdefault(r["window_start"], []).append(
                (r["rnk"], r["event_type"], r["n"])
            )
        for win, rows_ in by_win.items():
            assert sorted(rows_) == [(1, "a", 3), (2, "b", 2), (3, "c", 1)]
        assert len(by_win) == 2

    def test_rank_cut_plans_as_window_group_limit(self, spark):
        import contextlib
        import io

        from flink_streaming_2_10_spark.operators.sliding import (
            windowed_topk,
        )

        from flink_streaming_2_10_spark.catalog import load_table

        ev = load_table(spark, "/root/testdata/sf0.001", "events")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            windowed_topk(ev, key="event_type", k=3).explain("formatted")
        plan = buf.getvalue()
        assert "WindowGroupLimit" in plan
        # No global sort: ordering exists only inside the rank window.
        assert "rangepartitioning" not in plan.lower()
