"""Salted two-phase aggregation: salt-invariance + bounded-reducer plan
(pipeline/skew.py)."""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import Row, functions as F

from flink_streaming_2_10_spark.pipeline.skew import (
    salted_agg,
    salted_topk_counts,
)


def _events(spark):
    # hot key "u0" holds half the rows; the rest spread over 10 keys
    rows = [Row(user_id="u0", event_id=i, v=i % 7) for i in range(50)]
    rows += [
        Row(user_id=f"u{1 + i % 10}", event_id=100 + i, v=i % 5)
        for i in range(50)
    ]
    return spark.createDataFrame(rows)


def test_salted_agg_equals_plain_agg(spark):
    df = _events(spark)
    plain = {
        (r.user_id): (r.cnt, r.sv)
        for r in df.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("v").alias("sv"))
        .collect()
    }
    for salts in (1, 7, 32):
        got = {
            r.user_id: (r.cnt, r.sv)
            for r in salted_agg(
                df,
                keys=["user_id"],
                salt_from="event_id",
                sums={"cnt": F.count(F.lit(1)), "sv": F.sum("v")},
                salts=salts,
            ).collect()
        }
        assert got == plain, salts


def test_salted_topk_deterministic_tiebreak(spark):
    df = _events(spark)
    out = salted_topk_counts(
        df, key="user_id", salt_from="event_id",
        value_units=F.col("v"), k=3, salts=8,
    ).collect()
    assert out[0].user_id == "u0" and out[0].cnt == 50
    # u1..u10 all have 5 rows; tie-break is key ascending
    assert [r.user_id for r in out[1:]] == ["u1", "u10"]


def test_salted_plan_two_exchanges_no_global_sort(spark):
    df = _events(spark)
    out = salted_topk_counts(
        df, key="user_id", salt_from="event_id",
        value_units=F.col("v"), k=3, salts=8,
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    # phase-1 (key, salt) + phase-2 (key) hash exchanges, nothing else
    assert len(re.findall(r"\(\d+\) Exchange\b", plan)) == 2, plan
    # the k-cut is TakeOrderedAndProject, not a global Sort
    assert "TakeOrderedAndProject" in plan, plan
    assert not re.search(r"\(\d+\) Sort\b", plan), plan
