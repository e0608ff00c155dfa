"""PageRank/TextRank tests: hand-computed fixed points, exactness and
determinism of the integer iteration, keyword sanity, oracle parity."""

from __future__ import annotations

import contextlib
import io

import pytest

from flink_streaming_2_10_spark.pipeline.caching import release_cached
from flink_streaming_2_10_spark.pipeline.graph import pagerank_fixed
from flink_streaming_2_10_spark.pipeline.textstats import textrank_keywords


def test_symmetric_pair_is_exact_fixed_point(spark):
    """a↔b with equal weights: contribution = floor(85·10⁶/100) =
    850000, rank = 150000 + 850000 = r0 exactly, every round."""
    edges = spark.createDataFrame(
        [("a", "b", 1), ("b", "a", 1)], ["src", "dst", "w"]
    )
    for iters in (1, 5):
        got = {
            r["node"]: r["rank"]
            for r in pagerank_fixed(edges, iters=iters).collect()
        }
        release_cached()
        assert got == {"a": 1_000_000, "b": 1_000_000}


def test_one_round_hand_computed_star(spark):
    """Star a→{b,c,d} (and back, unit weights): after one round the
    center holds base + 3·floor(85·10⁶/100) and each leaf
    base + floor(85·10⁶/300) — wdeg(a)=3 splits a's mass three ways."""
    rows = []
    for leaf in "bcd":
        rows += [("a", leaf, 1), (leaf, "a", 1)]
    edges = spark.createDataFrame(rows, ["src", "dst", "w"])
    got = {
        r["node"]: r["rank"] for r in pagerank_fixed(edges, iters=1).collect()
    }
    release_cached()
    assert got["a"] == 150_000 + 3 * 850_000
    for leaf in "bcd":
        assert got[leaf] == 150_000 + (85 * 1_000_000) // 300


def test_iters_zero_returns_uniform(spark):
    edges = spark.createDataFrame(
        [("a", "b", 2), ("b", "a", 2)], ["src", "dst", "w"]
    )
    got = {r["node"]: r["rank"] for r in pagerank_fixed(edges, iters=0).collect()}
    release_cached()
    assert got == {"a": 1_000_000, "b": 1_000_000}


def test_rank_determinism_across_runs_and_partitionings(spark):
    """Independent per-edge floors make the sum order-insensitive: the
    same graph under different partition counts gives identical ranks."""
    import random

    rng = random.Random(3)
    nodes = [f"n{i}" for i in range(30)]
    rows = []
    for _ in range(200):
        a, b = rng.sample(nodes, 2)
        rows += [(a, b, rng.randint(1, 5))]
    edges = spark.createDataFrame(rows, ["src", "dst", "w"]).groupBy(
        "src", "dst"
    ).agg({"w": "sum"}).withColumnRenamed("sum(w)", "w")
    a = {r["node"]: r["rank"] for r in pagerank_fixed(edges, iters=4).collect()}
    release_cached()
    b = {
        r["node"]: r["rank"]
        for r in pagerank_fixed(edges.repartition(7), iters=4).collect()
    }
    release_cached()
    assert a == b


def test_pagerank_validation(spark):
    edges = spark.createDataFrame([("a", "b", 1)], ["src", "dst", "w"])
    with pytest.raises(ValueError, match="iters"):
        pagerank_fixed(edges, iters=-1)
    with pytest.raises(ValueError, match="damping"):
        pagerank_fixed(edges, damping_num=100, damping_den=100)


def test_textrank_hub_token_ranks_first(spark):
    """A token adjacent to many distinct partners out-ranks tokens that
    only ever co-occur inside one pair (the TextRank centrality claim),
    and self-stutter ('echo echo') must not create an edge."""
    rows = [
        (1, "spark joins spark windows spark shuffles spark state"),
        (2, "quiet corner quiet corner quiet corner"),
        (3, "spark streams spark batches"),
        (4, "echo echo echo echo echo echo"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = textrank_keywords(df, iters=5, k=10, min_edge_count=1).collect()
    release_cached()
    tokens = [r["token"] for r in out]
    assert tokens[0] == "spark"
    assert "echo" not in tokens  # self-loops dropped → no graph presence


def test_textrank_matches_oracle_fixture(spark, duck):
    import __spark_entry__ as entrymod
    from tests.conftest import SF_SMALL, assert_df_matches_oracle

    assert_df_matches_oracle(
        entrymod.queries()["textrank_keywords"](spark, SF_SMALL),
        duck,
        entrymod.oracle_sql()["textrank_keywords"],
    )
    release_cached()


def test_textrank_topk_plan_no_global_sort(spark):
    df = spark.createDataFrame(
        [(1, "a b c a b"), (2, "b c d")], ["doc_id", "text"]
    )
    out = textrank_keywords(df, iters=1, k=5, min_edge_count=1)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    release_cached()
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan
