"""Winnowing fingerprints (pipeline/winnow.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_streaming_2_10_spark.catalog import load_table
from flink_streaming_2_10_spark.pipeline.winnow import (
    winnow_fingerprints,
    winnow_fingerprints_oracle,
    winnow_selected,
)
from tests.conftest import SF_SMALL, assert_df_matches_oracle


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_SMALL, "documents")


def test_matches_oracle(docs, duck):
    assert_df_matches_oracle(
        winnow_fingerprints(docs, k=3, w=4),
        duck,
        winnow_fingerprints_oracle(k=3, w=4),
    )


def test_every_long_enough_doc_summarised(docs):
    k = 3
    n_in = docs.where(
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(r"\S+"), 0)) >= k
    ).count()
    out = winnow_fingerprints(docs, k=k, w=4)
    assert out.count() == n_in
    assert out.where(F.col("n_fingerprints") < 1).count() == 0


def test_density_bounds(docs):
    """Selected count is within [1, n_windows]; mean density is near the
    paper's 2/(w+1) (loose band — distinctness only lowers it)."""
    w = 4
    rows = winnow_fingerprints(docs, k=3, w=w).collect()
    total_sel, total_windows = 0, 0
    for r in rows:
        n_windows = max(1, r["n_grams"] - w + 1)
        assert 1 <= r["n_fingerprints"] <= n_windows
        total_sel += r["n_fingerprints"]
        total_windows += n_windows
    density = total_sel / total_windows
    assert 0.1 < density < 0.8, density


def test_shared_run_guarantee(spark):
    """Any shared token run of length >= w + k - 1 yields a common
    selected fingerprint (the winnowing theorem, SIGMOD'03 §2)."""
    k, w = 3, 4
    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens = w + k - 1
    df = spark.createDataFrame(
        [
            (1, f"one two three {shared} four five six"),
            (2, f"seven eight {shared} nine ten eleven twelve"),
            (3, "totally different words with no overlap at all here"),
        ],
        ["doc_id", "text"],
    )
    sel = {
        r["doc_id"]: set(r["sel"])
        for r in winnow_selected(df, k=k, w=w).collect()
    }
    assert sel[1] & sel[2], "shared run must contribute a common fingerprint"
    assert not (sel[1] & sel[3])
    assert not (sel[2] & sel[3])


def test_degenerate_short_doc_keeps_global_min(spark):
    """m < w: exactly one fingerprint — the minimum over all grams."""
    df = spark.createDataFrame([(1, "a b c d")], ["doc_id", "text"])  # m=2
    row = winnow_selected(df, k=3, w=4).collect()[0]
    assert row["n_grams"] == 2
    assert len(row["sel"]) == 1


def test_case_insensitive(spark):
    df = spark.createDataFrame(
        [(1, "The Quick Brown Fox Jumps"), (2, "the quick brown fox jumps")],
        ["doc_id", "text"],
    )
    rows = winnow_fingerprints(df, k=3, w=4).collect()
    a, b = sorted(rows, key=lambda r: r["doc_id"])
    assert (a["fp_xor"], a["fp_min"], a["fp_max"]) == (
        b["fp_xor"],
        b["fp_min"],
        b["fp_max"],
    )


def test_invalid_params_raise(docs):
    with pytest.raises(ValueError):
        winnow_fingerprints(docs, k=0, w=4)
    with pytest.raises(ValueError):
        winnow_fingerprints(docs, k=3, w=0)


def test_plan_is_scan_local(docs):
    plan = (
        winnow_fingerprints(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan
