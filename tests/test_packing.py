"""Concat-and-chunk sequence packing (pipeline/packing.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_streaming_2_10_spark.catalog import load_table
from flink_streaming_2_10_spark.pipeline.packing import (
    derive_num_shards,
    pack_concat_chunks,
)
from flink_streaming_2_10_spark.pipeline.textstats import BPE_PATTERN
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_SMALL, "documents")


def test_every_chunk_full_except_shard_last(docs):
    budget = 128
    rows = pack_concat_chunks(docs, budget=budget, num_shards=4).collect()
    last = {}
    for r in rows:
        last[r["shard_id"]] = max(last.get(r["shard_id"], -1), r["chunk_id"])
    for r in rows:
        if r["chunk_id"] != last[r["shard_id"]]:
            assert r["n_tokens"] == budget, r
        else:
            assert 0 < r["n_tokens"] <= budget, r


def test_token_conservation(docs):
    """Sum of chunk tokens == sum of per-doc (bpe_tokens + 1)."""
    budget = 256
    chunks = pack_concat_chunks(docs, budget=budget, num_shards=4)
    packed = chunks.agg(F.sum("n_tokens")).collect()[0][0]
    total = docs.select(
        (F.regexp_count(F.col("text"), F.lit(BPE_PATTERN)) + 1).alias("t")
    ).agg(F.sum("t")).collect()[0][0]
    assert packed == total


def test_chunks_are_contiguous_per_shard(docs):
    rows = pack_concat_chunks(docs, budget=512, num_shards=8).collect()
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r["shard_id"], []).append(r["chunk_id"])
    assert len(by_shard) == 8
    for cids in by_shard.values():
        cids.sort()
        assert cids == list(range(len(cids)))  # 0..k-1, no gaps


def test_straddling_doc_counted_in_both_chunks(spark):
    # one shard; docs of 3 tokens each (2 bpe + EOS), budget 4:
    # doc a [0,3), doc b [3,6) straddles the 4-boundary.
    df = spark.createDataFrame(
        [(1, "aa bb"), (2, "cc dd"), (3, "ee ff")], ["doc_id", "text"]
    )
    rows = {
        (r["shard_id"], r["chunk_id"]): r
        for r in pack_concat_chunks(df, budget=4, num_shards=1).collect()
    }
    assert sum(r["n_tokens"] for r in rows.values()) == 9
    chunk0 = rows[(0, 0)]
    assert chunk0["n_tokens"] == 4 and chunk0["n_docs"] == 2
    # doc 2 appears in chunk 0 (1 token) and chunk 1 (2 tokens)
    chunk1 = rows[(0, 1)]
    assert chunk1["first_doc"] == 2


def test_default_shards_scale_with_input(spark, docs):
    # the default shard count is the packing parallelism: it must track
    # input partitions (data volume) with a defaultParallelism floor, so
    # the window stage never collapses to a fixed 8-way bottleneck
    derived = derive_num_shards(docs)
    assert derived == max(
        docs.rdd.getNumPartitions(), spark.sparkContext.defaultParallelism
    )
    wide = docs.repartition(derived * 3)
    assert derive_num_shards(wide) == derived * 3
    assert derived >= spark.sparkContext.defaultParallelism


def test_window_parallelism_tracks_shard_param(docs):
    # distinct shard ids == the window stage's effective parallelism;
    # every shard must be populated once num_shards << row count
    for k in (2, 16):
        got = (
            pack_concat_chunks(docs, budget=512, num_shards=k)
            .select("shard_id")
            .distinct()
            .count()
        )
        assert got == k


def test_shard_scaleout_preserves_totals(docs):
    a = (
        pack_concat_chunks(docs, budget=512, num_shards=2)
        .agg(F.sum("n_tokens"), F.sum("n_docs"))
        .collect()[0]
    )
    b = (
        pack_concat_chunks(docs, budget=512, num_shards=16)
        .agg(F.sum("n_tokens"), F.sum("n_docs"))
        .collect()[0]
    )
    assert a[0] == b[0]  # token mass invariant under shard count
