"""Co-occurrence graph + triangle counting (pipeline/triangles.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_streaming_2_10_spark.catalog import load_table
from flink_streaming_2_10_spark.pipeline.triangles import (
    cooccurrence_edges,
    triangle_counts,
    triangles_oracle_sql,
)
from tests.conftest import SF_SMALL, assert_df_matches_oracle


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_SMALL, "documents")


def test_matches_oracle(docs, duck):
    assert_df_matches_oracle(
        triangle_counts(cooccurrence_edges(docs, min_df=2), k=50),
        duck,
        triangles_oracle_sql(min_df=2, k=50),
    )


def test_edges_are_ordered_distinct_unordered_pairs(spark):
    df = spark.createDataFrame(
        [(1, "b a b a"), (2, "a b x"), (3, "a a a")], ["doc_id", "text"]
    )
    rows = cooccurrence_edges(df, min_df=1).collect()
    edges = {(r["a"], r["b"]): r["edge_df"] for r in rows}
    # (a,b) once per doc despite 3 adjacent occurrences in doc 1;
    # self-loop a-a dropped entirely
    assert edges == {("a", "b"): 2, ("b", "x"): 1}
    assert all(a < b for a, b in edges)


def test_min_df_prunes(spark):
    df = spark.createDataFrame(
        [(1, "a b x"), (2, "a b y")], ["doc_id", "text"]
    )
    rows = cooccurrence_edges(df, min_df=2).collect()
    assert {(r["a"], r["b"]) for r in rows} == {("a", "b")}


def test_triangle_enumeration(spark):
    # docs weave edges (a,b),(b,c),(a,c) => one triangle; (c,d) dangles
    df = spark.createDataFrame(
        [(1, "a b c a"), (2, "a b c a"), (3, "c d c d")],
        ["doc_id", "text"],
    )
    rows = triangle_counts(cooccurrence_edges(df, min_df=1), k=10).collect()
    counts = {r["token"]: r["triangles"] for r in rows}
    assert counts == {"a": 1, "b": 1, "c": 1}


def test_two_triangles_sharing_an_edge(spark):
    # K4 minus one edge: triangles (a,b,c) and (a,b,d); edge (c,d) absent
    text = "a b a c a d b c b d"
    df = spark.createDataFrame([(1, text), (2, text)], ["doc_id", "text"])
    rows = triangle_counts(cooccurrence_edges(df, min_df=1), k=10).collect()
    counts = {r["token"]: r["triangles"] for r in rows}
    assert counts == {"a": 2, "b": 2, "c": 1, "d": 1}


def test_topk_cut_is_total_ordered(docs):
    rows = triangle_counts(cooccurrence_edges(docs, min_df=2), k=5).collect()
    keys = [(-r["triangles"], r["token"]) for r in rows]
    assert keys == sorted(keys)
    assert len(rows) <= 5


def test_no_cartesian_product(docs):
    plan = (
        triangle_counts(cooccurrence_edges(docs, min_df=2), k=50)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan, plan


def test_edge_subtree_reused_at_runtime(docs):
    """The three joins reference the same edge aggregation; the static
    plan shows three copies but AQE must dedupe them (ReusedExchange),
    so the corpus-scale bigram agg runs ONCE — same contract
    collocations documents for its identical-subtree reuse."""
    df = triangle_counts(cooccurrence_edges(docs, min_df=2), k=50)
    df.collect()  # AQE finalizes reuse only during execution
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ReusedExchange") >= 2, plan


class TestKCore:
    def test_planted_core_survives_peel(self, spark):
        from flink_streaming_2_10_spark.pipeline.triangles import (
            kcore_nodes,
        )

        # K4 clique on a..d (degree 3 each) with pendant chains hanging
        # off it; 3-core = exactly the clique.
        edges = spark.createDataFrame(
            [
                ("a", "b"), ("a", "c"), ("a", "d"),
                ("b", "c"), ("b", "d"), ("c", "d"),
                ("d", "e"), ("e", "f"), ("c", "g"),
            ],
            "a string, b string",
        )
        got = {
            r["token"]: r["degree"]
            for r in kcore_nodes(edges, k=3, rounds=8).collect()
        }
        assert got == {"a": 3, "b": 3, "c": 3, "d": 3}

    def test_round_count_invariant_after_convergence(self, spark):
        from flink_streaming_2_10_spark.pipeline.triangles import (
            kcore_nodes,
        )

        edges = spark.createDataFrame(
            [("a", "b"), ("a", "c"), ("b", "c"), ("c", "d")],
            "a string, b string",
        )
        a = sorted(map(tuple, kcore_nodes(edges, k=2, rounds=3).collect()))
        b = sorted(map(tuple, kcore_nodes(edges, k=2, rounds=9).collect()))
        assert a == b
        assert {t for t, _ in a} == {"a", "b", "c"}

    def test_cascade_peels_transitively(self, spark):
        from flink_streaming_2_10_spark.pipeline.triangles import (
            kcore_nodes,
        )

        # A path a-b-c-d: every node unravels under k=2 even though b,c
        # start at degree 2 — requires multiple peel rounds.
        edges = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "d")],
            "a string, b string",
        )
        assert kcore_nodes(edges, k=2, rounds=8).count() == 0
