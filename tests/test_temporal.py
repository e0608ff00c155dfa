"""As-of join and interval join (operators/temporal.py).

Strategy: hand-built keyed timelines covering inclusivity, tolerance,
tie-breaks, and bucket boundaries (the interval join's correctness risk
is a pair straddling a quantization edge), plus the DuckDB oracle replay
of both driver queries at sf0.001.
"""

from __future__ import annotations

import duckdb
import pytest

from flink_streaming_2_10_spark.operators.temporal import asof_join, interval_join


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [(1, "A", 100), (2, "A", 205), (3, "B", 50), (4, "C", 10)],
        ["trade_id", "sym", "t"],
    )
    quotes = spark.createDataFrame(
        [
            (10, "A", 90),
            (11, "A", 100),  # equal time: asof is inclusive
            (12, "A", 200),
            (13, "B", 60),  # after the only B trade
        ],
        ["quote_id", "sym", "t"],
    )
    return trades, quotes


def _asof_map(trades, quotes, **kw):
    out = asof_join(
        trades, quotes, on=["sym"], left_time="t", right_time="t",
        right_prefix="q_", **kw
    )
    return {r["trade_id"]: r["q_quote_id"] for r in out.collect()}


def test_asof_latest_at_or_before(trades_quotes):
    trades, quotes = trades_quotes
    got = _asof_map(trades, quotes)
    # trade 1 at t=100 matches quote 11 (equal time wins over t=90);
    # trade 2 matches quote 12; B's quote is later than the trade; C has
    # no quotes at all.
    assert got == {1: 11, 2: 12, 3: None, 4: None}


def test_asof_tolerance_drops_stale_match(trades_quotes):
    trades, quotes = trades_quotes
    got = _asof_map(trades, quotes, tolerance=5)
    assert got == {1: 11, 2: 12, 3: None, 4: None}
    got_tight = _asof_map(trades, quotes, tolerance=4)
    # quote 12 at t=200 is 5 ticks before trade 2 at t=205 -> dropped
    assert got_tight[2] is None


def test_asof_tie_break_is_greatest(spark):
    left = spark.createDataFrame([(1, "A", 100)], ["trade_id", "sym", "t"])
    right = spark.createDataFrame(
        [(7, "A", 100), (9, "A", 100), (8, "A", 100)], ["quote_id", "sym", "t"]
    )
    got = _asof_map(left, right, tie_cols=["quote_id"])
    assert got == {1: 9}


def test_asof_keeps_every_left_row_and_columns(trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, on=["sym"], left_time="t", right_time="t")
    assert out.count() == trades.count()
    assert set(out.columns) == {"trade_id", "sym", "t", "r_quote_id", "r_sym", "r_t"}


def test_interval_join_bounds_inclusive_and_bucket_edges(spark):
    left = spark.createDataFrame([(1, "A", 100)], ["lid", "k", "t"])
    # window [t+0, t+10] = [100, 110]; bucket width 10 puts 100 and 110
    # in different buckets — both must still match. 99 and 111 must not.
    right = spark.createDataFrame(
        [(20, "A", 99), (21, "A", 100), (22, "A", 105), (23, "A", 110),
         (24, "A", 111), (25, "B", 105)],
        ["rid", "k", "t"],
    )
    out = interval_join(
        left, right, on=["k"], left_time="t", right_time="t", lower=0, upper=10
    )
    assert sorted(r["r_rid"] for r in out.collect()) == [21, 22, 23]


def test_interval_join_negative_lower(spark):
    # symmetric window [-5, +5] around each left time
    left = spark.createDataFrame([(1, "A", 100)], ["lid", "k", "t"])
    right = spark.createDataFrame(
        [(20, "A", 94), (21, "A", 95), (22, "A", 105), (23, "A", 106)],
        ["rid", "k", "t"],
    )
    out = interval_join(
        left, right, on=["k"], left_time="t", right_time="t", lower=-5, upper=5
    )
    assert sorted(r["r_rid"] for r in out.collect()) == [21, 22]


def test_interval_join_no_duplicate_pairs(spark):
    # A right row whose bucket both left copies probe must appear once.
    left = spark.createDataFrame(
        [(1, "A", 100), (2, "A", 101)], ["lid", "k", "t"]
    )
    right = spark.createDataFrame([(20, "A", 105)], ["rid", "k", "t"])
    out = interval_join(
        left, right, on=["k"], left_time="t", right_time="t", lower=0, upper=10
    )
    pairs = sorted((r["lid"], r["r_rid"]) for r in out.collect())
    assert pairs == [(1, 20), (2, 20)]


def test_bucketed_asof_exact_at_epoch_ns_scale(spark):
    """Bucket ids must come from exact integer floor division: at
    epoch-ns magnitudes (> 2^53, double ulp = 256) a float-div bucket
    can land a within-tolerance right row many buckets below its left
    row, silently NULLing the match. Times straddle a double-rounding
    midpoint so the old float path computes buckets ~36 apart."""
    base = (1 << 60) + 256_000  # ulp(double) == 256 here
    t_r, t_l = base + 126, base + 129  # 3 ns apart, round 256 apart
    left = spark.createDataFrame([(1, "A", t_l)], ["lid", "k", "t"])
    right = spark.createDataFrame([(20, "A", t_r)], ["rid", "k", "t"])
    out = asof_join(
        left, right, on=["k"], left_time="t", right_time="t",
        tolerance=7, bucketed=True, right_prefix="q_",
    )
    assert [r["q_rid"] for r in out.collect()] == [20]


def test_interval_join_exact_at_epoch_ns_scale_and_negative_times(spark):
    """Same exactness requirement for the interval join's buckets, on
    both huge-positive (epoch-ns) and negative time axes."""
    base = (1 << 60) + 256_000
    cases = [
        (1, "A", base + 129, 20, base + 126),   # straddles double midpoint
        (2, "B", -(base + 129), 21, -(base + 126)),
    ]
    left = spark.createDataFrame(
        [(lid, k, lt) for lid, k, lt, _, _ in cases], ["lid", "k", "t"]
    )
    right = spark.createDataFrame(
        [(rid, k, rt) for _, k, _, rid, rt in cases], ["rid", "k", "t"]
    )
    out = interval_join(
        left, right, on=["k"], left_time="t", right_time="t", lower=-7, upper=7
    )
    pairs = sorted((r["lid"], r["r_rid"]) for r in out.collect())
    assert pairs == [(1, 20), (2, 21)]


def test_driver_queries_match_oracle(spark, duck):
    import __spark_entry__ as entrymod
    from tests.conftest import SF_SMALL, assert_df_matches_oracle

    for name in ("asof_join_attribution", "interval_join_errors"):
        got = entrymod.queries()[name](spark, SF_SMALL)
        assert_df_matches_oracle(got, duck, entrymod.oracle_sql()[name])


def test_asof_bucketed_matches_plain_on_skewed_key(spark):
    """One key holds 90% of the rows: the skew-hardened bucketed path
    must return exactly what the plain path returns."""
    import random

    rng = random.Random(7)
    n = 400
    left_rows = [
        (i, "hot" if i % 10 else f"cold{i}", rng.randrange(0, 10_000))
        for i in range(n)
    ]
    right_rows = [
        (1000 + i, "hot" if i % 10 else f"cold{i}", rng.randrange(0, 10_000))
        for i in range(n)
    ]
    left = spark.createDataFrame(left_rows, ["lid", "k", "t"])
    right = spark.createDataFrame(right_rows, ["rid", "k", "t"])
    kw = dict(
        on=["k"], left_time="t", right_time="t", tolerance=500,
        tie_cols=["rid"], right_prefix="q_",
    )
    plain = asof_join(left, right, **kw)
    hard = asof_join(left, right, bucketed=True, **kw)
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, hard.collect()))
    for direction in ("forward",):
        p = asof_join(left, right, direction=direction, **kw)
        h = asof_join(left, right, direction=direction, bucketed=True, **kw)
        assert sorted(map(tuple, p.collect())) == sorted(map(tuple, h.collect()))


def test_asof_bucketed_bounds_hot_key_partitions(spark):
    """The window state for a hot key must split across time buckets:
    no (key, bucket) group may hold more than one tolerance-width slice
    of the hot key's rows."""
    from pyspark.sql import functions as F

    n, tol, span = 2000, 100, 10_000
    left = spark.createDataFrame(
        [(i, "hot", (i * 37) % span) for i in range(n)], ["lid", "k", "t"]
    )
    right = spark.createDataFrame(
        [(i, "hot", (i * 53) % span) for i in range(n)], ["rid", "k", "t"]
    )
    # replicate the operator's partitioning: (k, floor(t/tol)) for left,
    # right counted twice (own + next bucket)
    lcnt = left.groupBy("k", F.floor(F.col("t") / tol).alias("b")).count()
    rcnt = right.groupBy("k", F.floor(F.col("t") / tol).alias("b")).count()
    biggest = (
        lcnt.join(rcnt.withColumnRenamed("count", "rc"), ["k", "b"], "outer")
        .fillna(0)
        .select((F.col("count") + 2 * F.col("rc")).alias("g"))
        .agg(F.max("g"))
        .collect()[0][0]
    )
    # 2n rows on one key collapse to one partition un-bucketed; bucketed,
    # the largest group is ~3 * (2n / (span/tol)) — two orders smaller
    assert biggest < (2 * n) / 10
    # and the hardened operator still produces one row per left row
    out = asof_join(
        left, right, on=["k"], left_time="t", right_time="t",
        tolerance=tol, tie_cols=["rid"], bucketed=True, right_prefix="q_",
    )
    assert out.count() == n


def test_asof_bucketed_requires_tolerance(spark):
    left = spark.createDataFrame([(1, "A", 100)], ["lid", "k", "t"])
    with pytest.raises(ValueError, match="tolerance"):
        asof_join(
            left, left, on=["k"], left_time="t", right_time="t", bucketed=True
        )


def test_asof_forward_direction(spark):
    left = spark.createDataFrame(
        [(1, "A", 100), (2, "A", 250), (3, "B", 50)], ["trade_id", "sym", "t"]
    )
    right = spark.createDataFrame(
        [(10, "A", 90), (11, "A", 100), (12, "A", 200), (13, "B", 40)],
        ["quote_id", "sym", "t"],
    )
    out = asof_join(
        left, right, on=["sym"], left_time="t", right_time="t",
        right_prefix="q_", direction="forward",
    )
    got = {r["trade_id"]: r["q_quote_id"] for r in out.collect()}
    # trade 1 at 100: earliest quote at-or-after is 11 (equal time);
    # trade 2 at 250: nothing after; trade 3 at 50: B quote is before.
    assert got == {1: 11, 2: None, 3: None}
    assert "q___neg_t" not in out.columns and "__neg_t" not in out.columns


def test_asof_forward_tie_break_is_smallest(spark):
    left = spark.createDataFrame([(1, "A", 100)], ["trade_id", "sym", "t"])
    right = spark.createDataFrame(
        [(9, "A", 150), (7, "A", 150), (8, "A", 150)], ["quote_id", "sym", "t"]
    )
    out = asof_join(
        left, right, on=["sym"], left_time="t", right_time="t",
        tie_cols=["quote_id"], right_prefix="q_", direction="forward",
    )
    assert out.collect()[0]["q_quote_id"] == 7


def test_asof_forward_tolerance(spark):
    left = spark.createDataFrame([(1, "A", 100)], ["trade_id", "sym", "t"])
    right = spark.createDataFrame([(9, "A", 160)], ["quote_id", "sym", "t"])
    keep = asof_join(
        left, right, on=["sym"], left_time="t", right_time="t",
        tolerance=60, right_prefix="q_", direction="forward",
    ).collect()[0]["q_quote_id"]
    drop = asof_join(
        left, right, on=["sym"], left_time="t", right_time="t",
        tolerance=59, right_prefix="q_", direction="forward",
    ).collect()[0]["q_quote_id"]
    assert keep == 9 and drop is None


def test_asof_rejects_unknown_direction(spark, trades_quotes):
    trades, quotes = trades_quotes
    with pytest.raises(ValueError, match="direction"):
        asof_join(
            trades, quotes, on=["sym"], left_time="t", right_time="t",
            direction="nearest",
        )


def test_chained_forward_asof_null_stage_propagates(spark):
    """Funnel-style chaining: a left row whose first-stage match is NULL
    must stay NULL through later stages (a null click time can never
    match a purchase), and matched stages pick the earliest candidate."""
    views = spark.createDataFrame([(1, "u", 100), (2, "u", 900)], ["vid", "k", "t"])
    clicks = spark.createDataFrame([(11, "u", 150)], ["event_id", "k", "t"])
    buys = spark.createDataFrame(
        [(21, "u", 160), (22, "u", 1000)], ["event_id", "k", "t"]
    )
    s1 = asof_join(
        views, clicks, on=["k"], left_time="t", right_time="t",
        tolerance=100, tie_cols=["event_id"], right_prefix="c_",
        direction="forward",
    )
    s2 = asof_join(
        s1, buys, on=["k"], left_time="c_t", right_time="t",
        tolerance=100, tie_cols=["event_id"], right_prefix="p_",
        direction="forward",
    )
    got = {r["vid"]: (r["c_event_id"], r["p_event_id"]) for r in s2.collect()}
    # view 1 -> click 11 -> purchase 21; view 2 has no click within 100,
    # so its purchase must be NULL even though purchase 22 is at 1000
    assert got == {1: (11, 21), 2: (None, None)}


def test_sessionize_gap_edges_and_indices(spark):
    from flink_streaming_2_10_spark.operators.temporal import sessionize

    rows = [
        # user a: Flink EventTimeSessionWindows semantics — a delta of
        # exactly the gap (10) stays IN-session (abutting [t, t+gap)
        # windows merge: TimeWindow.intersects is inclusive); a delta of
        # 11 starts a new session.
        (1, "a", 0), (2, "a", 10), (3, "a", 19), (4, "a", 30),
        # user b: single event
        (5, "b", 1000),
    ]
    df = spark.createDataFrame(rows, ["event_id", "k", "t"])
    got = {
        r["event_id"]: r["session_idx"]
        for r in sessionize(
            df, on=["k"], time_col="t", gap=10, tie_cols=["event_id"]
        ).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 2, 5: 1}


def test_sessionize_simultaneous_events_share_session(spark):
    from flink_streaming_2_10_spark.operators.temporal import sessionize

    df = spark.createDataFrame(
        [(1, "a", 100), (2, "a", 100), (3, "a", 100)], ["event_id", "k", "t"]
    )
    rows = sessionize(
        df, on=["k"], time_col="t", gap=1, tie_cols=["event_id"]
    ).collect()
    assert {r["session_idx"] for r in rows} == {1}
