"""Corpus snapshot delta (pipeline/snapshot.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_streaming_2_10_spark.catalog import load_table
from flink_streaming_2_10_spark.pipeline.snapshot import (
    snapshot_delta,
    snapshot_delta_oracle,
)
from tests.conftest import SF_SMALL, assert_df_matches_oracle


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_SMALL, "documents")


def _simulated(docs):
    old = docs.where(F.expr("doc_id % 10 != 7")).withColumn(
        "text",
        F.expr("CASE WHEN doc_id % 13 = 0 THEN text || ' [draft]' ELSE text END"),
    )
    new = docs.where(F.expr("doc_id % 11 != 3"))
    return old, new


def test_matches_oracle(docs, duck):
    old, new = _simulated(docs)
    old_sql = (
        "SELECT doc_id, source, CASE WHEN doc_id % 13 = 0 "
        "THEN text || ' [draft]' ELSE text END AS text "
        "FROM documents WHERE doc_id % 10 != 7"
    )
    new_sql = "SELECT doc_id, source, text FROM documents WHERE doc_id % 11 != 3"
    assert_df_matches_oracle(
        snapshot_delta(old, new), duck, snapshot_delta_oracle(old_sql, new_sql)
    )


def test_micro_classification(spark):
    old = spark.createDataFrame(
        [(1, "web", "same"), (2, "web", "v1"), (3, "lab", "gone")],
        ["doc_id", "source", "text"],
    )
    new = spark.createDataFrame(
        [(1, "web", "same"), (2, "web", "v2"), (4, "lab", "fresh")],
        ["doc_id", "source", "text"],
    )
    got = {
        (r["source"], r["status"]): (r["n_docs"], r["first_doc"], r["last_doc"])
        for r in snapshot_delta(old, new).collect()
    }
    assert got == {
        ("web", "unchanged"): (1, 1, 1),
        ("web", "changed"): (1, 2, 2),
        ("lab", "removed"): (1, 3, 3),
        ("lab", "added"): (1, 4, 4),
    }


def test_identical_snapshots_all_unchanged(docs):
    out = snapshot_delta(docs, docs)
    assert out.where(F.col("status") != "unchanged").count() == 0
    assert (
        out.agg(F.sum("n_docs")).collect()[0][0] == docs.count()
    )


def test_counts_reconcile_with_set_algebra(docs):
    """added + unchanged + changed == |new|; removed + unchanged +
    changed == |old|."""
    old, new = _simulated(docs)
    counts = {
        r["status"]: r["n"]
        for r in snapshot_delta(old, new)
        .groupBy("status")
        .agg(F.sum("n_docs").alias("n"))
        .collect()
    }
    assert (
        counts.get("added", 0) + counts.get("unchanged", 0) + counts.get("changed", 0)
        == new.count()
    )
    assert (
        counts.get("removed", 0) + counts.get("unchanged", 0) + counts.get("changed", 0)
        == old.count()
    )


def test_text_never_shuffles(docs):
    """The exchanges carry (id, partition, 60-bit fp) — never the text
    column: the fingerprint projection must sit below the join
    exchanges."""
    import contextlib
    import io
    import re

    old, new = _simulated(docs)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        snapshot_delta(old, new).explain("formatted")
    blocks = re.split(r"\n(?=\(\d+\) )", buf.getvalue())
    exchanges = [
        b for b in blocks
        if b.startswith("(") and "Exchange" in b.split("\n")[0]
    ]
    assert exchanges, buf.getvalue()
    for block in exchanges:
        input_lines = [
            line for line in block.splitlines() if line.startswith("Input")
        ]
        assert input_lines, block
        for line in input_lines:
            assert "text#" not in line, f"text column in an exchange: {block}"
