"""Fixed-token chunking with overlap (pipeline/chunking.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_streaming_2_10_spark.catalog import load_table
from flink_streaming_2_10_spark.pipeline.chunking import (
    chunk_documents,
    chunk_documents_oracle,
)
from tests.conftest import SF_SMALL, assert_df_matches_oracle


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_SMALL, "documents")


def test_matches_oracle(docs, duck):
    assert_df_matches_oracle(
        chunk_documents(docs, chunk_size=32, stride=24),
        duck,
        chunk_documents_oracle(chunk_size=32, stride=24),
    )


def test_all_chunks_full_except_doc_last(docs):
    c = 16
    rows = chunk_documents(docs, chunk_size=c, stride=12).collect()
    last = {}
    for r in rows:
        last[r["doc_id"]] = max(last.get(r["doc_id"], -1), r["chunk_index"])
    for r in rows:
        if r["chunk_index"] != last[r["doc_id"]]:
            assert r["n_tokens"] == c, r
        else:
            assert 0 < r["n_tokens"] <= c, r


def test_offsets_are_stride_multiples_and_cover(docs):
    c, s = 20, 15
    rows = chunk_documents(docs, chunk_size=c, stride=s).collect()
    n_toks = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id",
            F.size(F.regexp_extract_all("text", F.lit(r"\S+"), 0)).alias("n"),
        ).collect()
    }
    by_doc: dict[int, list] = {}
    for r in rows:
        assert r["tok_start"] == r["chunk_index"] * s, r
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_index"])
        assert [r["chunk_index"] for r in chunks] == list(range(len(chunks)))
        final = chunks[-1]
        # every token covered, nothing past the end
        assert final["tok_start"] + final["n_tokens"] == n_toks[doc_id]
        if len(chunks) > 1:  # the final chunk starts strictly inside
            assert final["tok_start"] < n_toks[doc_id]


def test_no_overlap_when_stride_equals_chunk_size(docs):
    """stride == chunk_size partitions the tokens: conservation holds."""
    c = 24
    chunks = chunk_documents(docs, chunk_size=c, stride=c)
    packed = chunks.agg(F.sum("n_tokens")).collect()[0][0]
    total = docs.select(
        F.size(F.regexp_extract_all("text", F.lit(r"\S+"), 0)).alias("n")
    ).agg(F.sum("n")).collect()[0][0]
    assert packed == total


def test_identical_windows_hash_identically(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e f")], ["doc_id", "text"]
    )
    rows = chunk_documents(df, chunk_size=4, stride=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], {})[r["chunk_index"]] = r["chunk_hash"]
    assert by_doc[1] == by_doc[2]
    # 6 tokens, c=4, s=2 -> chunks at 0 and 2
    assert sorted(by_doc[1]) == [0, 1]


def test_zero_token_docs_emit_nothing(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "one two")], ["doc_id", "text"]
    )
    rows = chunk_documents(df, chunk_size=4, stride=4).collect()
    assert {r["doc_id"] for r in rows} == {3}


def test_invalid_stride_raises(docs):
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_size=8, stride=0)
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_size=8, stride=9)


def test_plan_is_scan_local(docs):
    """Zero exchanges — chunking must parallelize with the scan."""
    plan = chunk_documents(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
