"""CountMin sketch: one-sided bound, mergeability, exact-when-sparse,
plan shape (pipeline/cmsketch.py)."""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import Row, functions as F

from flink_streaming_2_10_spark.pipeline.cmsketch import (
    cm_estimates,
    cm_frequency_audit,
    cm_sketch,
    merge_cm_sketches,
)


def _docs(spark):
    # zipf-ish: "alpha" 30x, "beta" 10x, singles
    text = " ".join(
        ["alpha"] * 30 + ["beta"] * 10 + [f"tail{i}" for i in range(40)]
    )
    return spark.createDataFrame([Row(doc_id=1, text=text)])


def test_estimate_upper_bounds_exact_everywhere(spark):
    out = cm_frequency_audit(_docs(spark), k=42, rows=4, width=16).collect()
    assert len(out) == 42
    assert all(r.cm_est >= r.exact_cnt for r in out)
    # exact ordering: alpha then beta lead
    assert (out[0].token, out[0].exact_cnt) == ("alpha", 30)
    assert (out[1].token, out[1].exact_cnt) == ("beta", 10)


def test_estimate_exact_when_width_dominates_vocab(spark):
    # 82 tokens over 42 distinct values into 4x4096 cells: collisions
    # are possible but unlikely under the md5 family; check alpha/beta
    # specifically (a collision on BOTH is ~impossible).
    out = {
        r.token: (r.exact_cnt, r.cm_est)
        for r in cm_frequency_audit(
            _docs(spark), k=2, rows=4, width=4096
        ).collect()
    }
    assert out["alpha"] == (30, 30)
    assert out["beta"] == (10, 10)


def test_merge_equals_whole_stream_sketch(spark):
    toks = spark.createDataFrame(
        [Row(tok=t) for t in ["a", "b", "a", "c", "a", "b", "d", "e"]]
    )
    rows = [r.tok for r in toks.collect()]
    h1 = spark.createDataFrame([Row(tok=t) for t in rows[:4]])
    h2 = spark.createDataFrame([Row(tok=t) for t in rows[4:]])
    whole = {
        (r.r, r.b): r.cnt
        for r in cm_sketch(toks, "tok", rows=3, width=8).collect()
    }
    merged = {
        (r.r, r.b): r.cnt
        for r in merge_cm_sketches(
            cm_sketch(h1, "tok", rows=3, width=8),
            cm_sketch(h2, "tok", rows=3, width=8),
        ).collect()
    }
    assert merged == whole


def test_probe_absent_from_stream_gets_zero_or_collision(spark):
    toks = spark.createDataFrame([Row(tok="x")])
    sketch = cm_sketch(toks, "tok", rows=4, width=4096)
    probes = spark.createDataFrame([Row(tok="never-seen-token")])
    [r] = cm_estimates(sketch, probes, "tok", rows=4, width=4096).collect()
    # with one stream value in 4x4096 cells, collision on all 4 rows is
    # impossible for a distinct value → strict zero
    assert r.cm_est == 0


def test_sketch_build_single_exchange(spark):
    toks = spark.createDataFrame([Row(tok="a"), Row(tok="b")])
    sk = cm_sketch(toks, "tok", rows=4, width=64)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        sk.explain("formatted")
    plan = buf.getvalue()
    assert len(re.findall(r"\(\d+\) Exchange\b", plan)) == 1, plan


def test_audit_plan_topk_no_global_sort(spark):
    import __spark_entry__ as entrymod
    from tests.conftest import SF_SMALL

    df = entrymod.queries()["cm_frequency_audit"](spark, SF_SMALL)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "TakeOrderedAndProject" in plan, plan
    # the sketch side arrives broadcast — probes never shuffle for it
    assert "BroadcastExchange" in plan, plan
