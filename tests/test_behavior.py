"""Behavior-analytics tests: hand-computed cohort retention and rolling
z-score flags, exactness properties, plan shapes, and oracle parity."""

from __future__ import annotations

import contextlib
import datetime as dt
import io
import re

import pytest

from flink_streaming_2_10_spark.operators.behavior import (
    retention_cohorts,
    rolling_zscore_flags,
)


@pytest.fixture(scope="module")
def user_events(spark):
    # Weeks (Mondays): 2024-01-01, 01-08, 01-15.
    # u1: weeks 0,1,2   u2: weeks 0,2   u3: week 1 only (later cohort)
    rows = [
        (1, dt.datetime(2024, 1, 2, 10)),
        (1, dt.datetime(2024, 1, 3, 11)),  # dup week — must not double-count
        (1, dt.datetime(2024, 1, 9, 10)),
        (1, dt.datetime(2024, 1, 16, 10)),
        (2, dt.datetime(2024, 1, 1, 0)),
        (2, dt.datetime(2024, 1, 21, 23, 59)),  # Sunday of week 2
        (3, dt.datetime(2024, 1, 10, 5)),
    ]
    return spark.createDataFrame(rows, ["user_id", "ts"])


def test_retention_hand_computed(user_events):
    got = {
        (r["cohort_week"], r["week_offset"]): r["n_active"]
        for r in retention_cohorts(user_events).collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,  # u1, u2
        ("2024-01-01", 1): 1,  # u1
        ("2024-01-01", 2): 2,  # u1, u2
        ("2024-01-08", 0): 1,  # u3's cohort
    }


def test_retention_offset0_is_cohort_size(spark):
    """Every user is active in their first week, so sum of offset-0
    n_active equals the number of distinct users."""
    import random

    rng = random.Random(7)
    rows = [
        (u, dt.datetime(2024, 1, 1) + dt.timedelta(hours=rng.randrange(2000)))
        for u in range(40)
        for _ in range(rng.randrange(1, 6))
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    out = retention_cohorts(df).collect()
    size0 = sum(r["n_active"] for r in out if r["week_offset"] == 0)
    assert size0 == 40
    # no offset row can exceed its cohort's size
    sizes = {
        r["cohort_week"]: r["n_active"] for r in out if r["week_offset"] == 0
    }
    for r in out:
        assert r["n_active"] <= sizes[r["cohort_week"]]


def test_retention_single_corpus_exchange(spark, user_events):
    """The 100 TB claim: event-volume data crosses ONE exchange (the
    user collect_set agg); the cohort/offset re-agg shuffles user-week
    rows only. Two hash exchanges total, no join, no range sort."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        retention_cohorts(user_events).explain("formatted")
    plan = buf.getvalue()
    # formatted-mode exchanges read "(N) Exchange" + "Arguments: hashpartitioning"
    assert len(re.findall(r"Arguments: hashpartitioning", plan)) == 2, plan
    assert "Join" not in plan
    assert "rangepartitioning" not in plan


def _zrows(values, typ="a"):
    return [
        (i, typ, i * 1000, float(v)) for i, v in enumerate(values)
    ]


def test_zscore_hand_computed(spark):
    # window=3, min_n=3: value 100 after [1,2,3] → v=10000, n=3,
    # s=600, ss=140000 → lhs=(10000*3-600)^2=864e6, rhs=9*(3*140000-360000)=540000
    vals = [1.0, 2.0, 3.0, 100.0, 2.0]
    df = spark.createDataFrame(
        _zrows(vals), ["event_id", "event_type", "t_us", "value"]
    )
    out = {
        r["event_id"]: (r["window_n"], r["is_anomaly"])
        for r in rolling_zscore_flags(
            df, time_col="t_us", window=3, min_n=3
        ).collect()
    }
    assert out[0] == (0, False)  # empty frame → never anomalous
    assert out[1] == (1, False)
    assert out[2] == (2, False)
    assert out[3] == (3, True)  # the spike
    # event 4: frame [2,3,100] — huge variance, 2.0 is not 3σ out
    assert out[4] == (3, False)


def test_zscore_spike_cannot_mask_itself(spark):
    """Self-exclusion (frame ends at 1 PRECEDING): a constant run then a
    spike — with the spike IN its own frame the variance would be huge
    and the flag false; excluded, variance is 0 and the flag fires."""
    vals = [5.0] * 10 + [50.0]
    df = spark.createDataFrame(
        _zrows(vals), ["event_id", "event_type", "t_us", "value"]
    )
    out = rolling_zscore_flags(df, time_col="t_us", window=5, min_n=5).collect()
    assert {r["event_id"]: r["is_anomaly"] for r in out}[10] is True


def test_zscore_constant_series_never_flags(spark):
    vals = [7.25] * 50
    df = spark.createDataFrame(
        _zrows(vals), ["event_id", "event_type", "t_us", "value"]
    )
    out = rolling_zscore_flags(df, time_col="t_us", window=10, min_n=5).collect()
    assert not any(r["is_anomaly"] for r in out)


def test_zscore_keys_independent(spark):
    """A spike in one key must not flag events of another key."""
    rows = _zrows([1.0, 1.0, 1.0, 1.0, 1.0, 99.0], "a") + _zrows(
        [1.0, 1.0, 1.0, 1.0, 1.0, 1.0], "b"
    )
    rows = [(i, t, ts, v) for i, (_, t, ts, v) in enumerate(rows)]
    df = spark.createDataFrame(rows, ["event_id", "event_type", "t_us", "value"])
    out = rolling_zscore_flags(df, time_col="t_us", window=5, min_n=5).collect()
    flagged = {r["event_id"] for r in out if r["is_anomaly"]}
    assert flagged == {5}


def test_zscore_validation(spark):
    df = spark.createDataFrame(
        _zrows([1.0]), ["event_id", "event_type", "t_us", "value"]
    )
    with pytest.raises(ValueError, match="window"):
        rolling_zscore_flags(df, time_col="t_us", window=0)
    with pytest.raises(ValueError, match="min_n"):
        rolling_zscore_flags(df, time_col="t_us", window=10, min_n=11)


def test_zscore_plan_one_exchange_no_global_sort(spark):
    df = spark.createDataFrame(
        _zrows([float(i % 9) for i in range(100)]),
        ["event_id", "event_type", "t_us", "value"],
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rolling_zscore_flags(df, time_col="t_us").explain("formatted")
    plan = buf.getvalue()
    assert len(re.findall(r"Arguments: hashpartitioning", plan)) == 1, plan
    assert "rangepartitioning" not in plan
    assert "Window" in plan


def test_queries_match_oracles(spark, duck):
    import __spark_entry__ as entrymod
    from tests.conftest import SF_SMALL, assert_df_matches_oracle

    for key in ("retention_cohorts", "rolling_zscore_anomalies"):
        assert_df_matches_oracle(
            entrymod.queries()[key](spark, SF_SMALL),
            duck,
            entrymod.oracle_sql()[key],
        )


def test_event_pivot_hand_computed_and_reconciles(spark):
    import datetime as dt

    from flink_streaming_2_10_spark.operators.behavior import event_type_pivot

    rows = [
        (1, dt.datetime(2024, 1, 1, 3), "view"),
        (2, dt.datetime(2024, 1, 1, 9), "view"),
        (3, dt.datetime(2024, 1, 1, 23, 59), "click"),
        (4, dt.datetime(2024, 1, 2, 0, 0), "purchase"),
        (5, dt.datetime(2024, 1, 2, 1), "mystery"),  # undeclared type
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "event_type"])
    got = {r["day"]: r.asDict() for r in event_type_pivot(df).collect()}
    d1, d2 = got["2024-01-01"], got["2024-01-02"]
    assert (d1["n_view"], d1["n_click"], d1["n_other"], d1["n_total"]) == (2, 1, 0, 3)
    assert (d2["n_purchase"], d2["n_other"], d2["n_total"]) == (1, 1, 2)
    # totals reconcile: declared + other == total, every row
    for r in got.values():
        declared = sum(
            v for k, v in r.items() if k.startswith("n_") and k not in ("n_other", "n_total")
        )
        assert declared + r["n_other"] == r["n_total"], r


def test_event_pivot_single_exchange_no_discovery_job(spark):
    """Explicit type list → ONE hash agg on day, no distinct-discovery
    scan: exactly one exchange, one parquet-less fixture scan."""
    import contextlib
    import datetime as dt
    import io
    import re

    from flink_streaming_2_10_spark.operators.behavior import event_type_pivot

    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), "view")], ["event_id", "ts", "event_type"]
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        event_type_pivot(df).explain("formatted")
    plan = buf.getvalue()
    assert len(re.findall(r"Arguments: hashpartitioning", plan)) == 1, plan
    assert "rangepartitioning" not in plan


def test_event_pivot_matches_oracle(spark, duck):
    import __spark_entry__ as entrymod
    from tests.conftest import SF_SMALL, assert_df_matches_oracle

    assert_df_matches_oracle(
        entrymod.queries()["event_type_pivot"](spark, SF_SMALL),
        duck,
        entrymod.oracle_sql()["event_type_pivot"],
    )


def test_event_transitions_hand_computed(spark):
    from flink_streaming_2_10_spark.operators.behavior import (
        event_transitions,
    )

    # user 1: a -> b -> a ; user 2: a -> b. Transitions:
    # (a,b) x2, (b,a) x1. Total 3.
    ev = spark.createDataFrame(
        [
            (1, 1, "a", 100),
            (2, 1, "b", 200),
            (3, 1, "a", 300),
            (4, 2, "a", 100),
            (5, 2, "b", 150),
        ],
        "event_id long, user_id long, event_type string, t long",
    )
    got = {
        (r["from_type"], r["to_type"]): r.asDict()
        for r in event_transitions(ev).collect()
    }
    assert got[("a", "b")]["n_transitions"] == 2
    assert got[("a", "b")]["share"] == 2.0 / 3.0
    assert got[("b", "a")]["n_transitions"] == 1
    assert set(got) == {("a", "b"), ("b", "a")}


def test_event_transitions_tie_breaks_on_event_id(spark):
    from flink_streaming_2_10_spark.operators.behavior import (
        event_transitions,
    )

    # Same timestamp: order is event_id ASC -> a precedes b.
    ev = spark.createDataFrame(
        [(1, 1, "a", 100), (2, 1, "b", 100)],
        "event_id long, user_id long, event_type string, t long",
    )
    got = [
        (r["from_type"], r["to_type"])
        for r in event_transitions(ev).collect()
    ]
    assert got == [("a", "b")]


def test_event_transitions_single_event_users_emit_nothing(spark):
    from flink_streaming_2_10_spark.operators.behavior import (
        event_transitions,
    )

    ev = spark.createDataFrame(
        [(1, 1, "a", 100), (2, 2, "b", 100)],
        "event_id long, user_id long, event_type string, t long",
    )
    assert event_transitions(ev).count() == 0
