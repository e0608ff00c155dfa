"""Blocklist document gating (pipeline/blocklist.py)."""

from __future__ import annotations

import pytest

from flink_streaming_2_10_spark.catalog import load_table
from flink_streaming_2_10_spark.pipeline.blocklist import (
    blocklist_oracle_sql,
    blocklist_stats,
)
from tests.conftest import SF_SMALL, assert_df_matches_oracle


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_SMALL, "documents")


def test_matches_oracle(docs, duck):
    assert_df_matches_oracle(
        blocklist_stats(docs), duck, blocklist_oracle_sql()
    )


def test_verdicts(spark):
    df = spark.createDataFrame(
        [
            (1, "bad bad bad bad", "w"),  # 100% hits -> drop
            (2, "good clean text here", "w"),  # 0 hits -> keep
            (3, "", "w"),  # empty -> 0 <= 0 keep
            (4, "bad " + "ok " * 19, "w"),  # exactly 50 permille -> keep
            (5, "bad " + "ok " * 18, "w"),  # 1/19 > 50 permille -> drop
            (6, "BAD bad Bad", "w"),  # case-insensitive
            (7, "badge bade abad", "w"),  # word-boundary: no hits
        ],
        ["doc_id", "text", "source"],
    )
    out = {
        r["doc_id"]: r
        for r in blocklist_stats(df, terms=("bad",), max_permille=50).collect()
    }
    assert not out[1]["keep"] and out[1]["blocklist_hits"] == 4
    assert out[2]["keep"] and out[2]["blocklist_hits"] == 0
    assert out[3]["keep"] and out[3]["n_words"] == 0
    assert out[4]["keep"] and out[4]["blocklist_hits"] == 1
    assert not out[5]["keep"]
    assert out[6]["blocklist_hits"] == 3
    assert out[7]["blocklist_hits"] == 0 and out[7]["keep"]


def test_empty_terms_raise(docs):
    with pytest.raises(ValueError):
        blocklist_stats(docs, terms=())


def test_plan_is_scan_local(docs):
    """The gate must be a narrow map — zero exchanges."""
    plan = (
        blocklist_stats(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan
