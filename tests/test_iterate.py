"""iterate() (operators/iterate.py) and BFS hops (pipeline/graph.py).

Strategy: toy fixed-point loops with known round counts and end states;
hand-built graphs (path, disconnected, clique) against exact BFS answers;
and the driver query's DuckDB recursive-CTE oracle at sf0.001.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_streaming_2_10_spark.operators.iterate import iterate, truncate_lineage
from flink_streaming_2_10_spark.pipeline.graph import shortest_path_hops


def _halve_to_zero(df, _round_no):
    return df.select((F.col("x") / 2).cast("long").alias("x"))


def test_iterate_converges_and_reports_rounds(spark):
    df = spark.createDataFrame([(8,), (2,)], ["x"])
    stats: dict = {}

    def metric(d):
        return d.agg(F.sum("x")).collect()[0][0]

    out = iterate(df, _halve_to_zero, max_rounds=10, metric=metric, stats=stats)
    assert [r["x"] for r in out.collect()] == [0, 0]
    # 8 -> 4 -> 2 -> 1 -> 0; round 5 observes the unchanged sum.
    assert stats["rounds"] == 5


def test_iterate_fixed_rounds_without_metric(spark):
    df = spark.createDataFrame([(100,)], ["x"])
    stats: dict = {}
    out = iterate(df, _halve_to_zero, max_rounds=3, stats=stats)
    assert out.collect()[0]["x"] == 12  # 100 -> 50 -> 25 -> 12
    assert stats["rounds"] == 3


def test_iterate_strict_raises_when_still_moving(spark):
    df = spark.createDataFrame([(1,)], ["x"])

    def grow(d, _r):
        return d.select((F.col("x") + 1).alias("x"))

    def metric(d):
        return d.agg(F.sum("x")).collect()[0][0]

    with pytest.raises(RuntimeError, match="still moving"):
        iterate(df, grow, max_rounds=3, metric=metric)
    # non-strict: returns the bounded state instead
    got = iterate(df, grow, max_rounds=3, metric=metric, strict=False)
    assert got.collect()[0]["x"] == 4


def test_iterate_per_row_exit_fibonacci(spark):
    """The upstream IterateExample program shape (pom.xml:157): each
    (i, j) pair steps to (j, i+j) with a step counter until it crosses a
    bound, and rows EXIT the loop individually — modeled as a done flag
    that freezes the row. Metric is (active count, Σstep): Σstep moves
    every round any row is still stepping, so equality ⇒ all rows done.
    Verified against a sequential replay of the same recurrence."""
    bound = 100
    seeds = [(0, 1), (1, 1), (2, 3), (5, 8), (90, 95)]
    df = spark.createDataFrame(seeds, ["i", "j"]).select(
        "i", "j", F.col("i").alias("i0"), F.col("j").alias("j0"),
        F.lit(0).alias("step"), F.lit(False).alias("done"),
    )

    def step(d, _r):
        active = ~F.col("done")
        ni = F.when(active, F.col("j")).otherwise(F.col("i"))
        nj = F.when(active, F.col("i") + F.col("j")).otherwise(F.col("j"))
        nstep = F.when(active, F.col("step") + 1).otherwise(F.col("step"))
        return d.select(
            ni.alias("i"), nj.alias("j"), "i0", "j0",
            nstep.alias("step"), (nj > bound).alias("done"),
        )

    def metric(d):
        row = d.agg(
            F.sum((~F.col("done")).cast("long")).alias("active"),
            F.sum("step").alias("steps"),
        ).collect()[0]
        return (row["active"], row["steps"])

    out = iterate(df, step, max_rounds=50, metric=metric)
    got = {(r["i0"], r["j0"]): r["step"] for r in out.collect()}

    def ref(i, j):
        n = 0
        while j <= bound:
            i, j, n = j, i + j, n + 1
        return n

    assert got == {(i, j): ref(i, j) for i, j in seeds}
    assert all(r["done"] for r in out.collect())


def test_iterate_stop_when_stops_in_converged_round(spark):
    """stop_when replaces the equality test: the loop ends the round the
    predicate fires — no confirm round — and a plateaued (but nonzero)
    metric does NOT stop it."""
    df = spark.createDataFrame([(8,)], ["x"])
    stats: dict = {}

    def metric(d):
        return d.agg(F.sum("x")).collect()[0][0]

    out = iterate(df, _halve_to_zero, max_rounds=10, metric=metric,
                  stats=stats, stop_when=lambda s: s == 0)
    assert out.collect()[0]["x"] == 0
    # 8 -> 4 -> 2 -> 1 -> 0: stops at round 4, not 5 (no confirm round)
    assert stats["rounds"] == 4

    # plateau at 3 (metric equal two rounds running) must NOT stop when
    # stop_when is the criterion; strict raises at the bound instead
    def plateau(d, _r):
        return d.select(F.greatest(F.col("x") - 1, F.lit(3)).alias("x"))

    with pytest.raises(RuntimeError, match="still moving"):
        iterate(df, plateau, max_rounds=6, metric=metric,
                stop_when=lambda s: s == 0)


def test_iterate_rejects_bad_checkpoint_mode(spark):
    df = spark.createDataFrame([(1,)], ["x"])
    with pytest.raises(ValueError, match="local|reliable"):
        iterate(df, _halve_to_zero, max_rounds=1, checkpoint="hdfs")


def test_truncate_lineage_reliable_mode(spark, tmp_path):
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    df = spark.createDataFrame([(1,), (2,)], ["x"])
    out = truncate_lineage(df.select((F.col("x") * 2).alias("x")), "reliable")
    assert sorted(r["x"] for r in out.collect()) == [2, 4]


def test_iterate_resumes_after_driver_loss(spark, tmp_path):
    """Driver-loss durability: a loop killed mid-round relaunches from
    the last _SUCCESS'd round — same fixed point, earlier rounds not
    re-executed, superseded round dirs cleaned up."""
    import os

    resume = str(tmp_path / "it")
    df = spark.createDataFrame([(64,)], ["x"])

    def metric(d):
        return d.agg(F.sum("x")).collect()[0][0]

    boom = {"at": 3}

    def fragile_step(d, round_no):
        if round_no == boom["at"]:
            raise RuntimeError("driver died")
        return _halve_to_zero(d, round_no)

    with pytest.raises(RuntimeError, match="driver died"):
        iterate(df, fragile_step, max_rounds=10, metric=metric,
                resume_dir=resume)
    # rounds 1-2 landed durably before the crash
    assert sorted(os.listdir(resume))[-1] == "round_00002"

    boom["at"] = None  # relaunch: no failure this time
    stats: dict = {}
    out = iterate(df, fragile_step, max_rounds=10, metric=metric,
                  resume_dir=resume, stats=stats)
    assert stats["resumed_from"] == 2
    assert out.collect()[0]["x"] == 0
    # 64 -> ... -> 0 takes 7 halvings + 1 confirm = 8 rounds total;
    # resumed run executed only rounds 3..8
    assert stats["rounds"] == 8
    # storage bounded: only the final round's state remains
    rounds_left = [n for n in os.listdir(resume) if n.startswith("round_")]
    assert rounds_left == ["round_00008"]

    fresh = iterate(df, _halve_to_zero, max_rounds=10, metric=metric)
    assert fresh.collect()[0]["x"] == out.collect()[0]["x"]


def test_iterate_resume_with_smaller_max_rounds_returns_durable_state(
    spark, tmp_path
):
    """A relaunch that passes a smaller max_rounds than the last completed
    round must return the durable state (only round_{last} exists on
    disk — older dirs were deleted), not fail on a missing path."""
    resume = str(tmp_path / "it")
    df = spark.createDataFrame([(64,)], ["x"])

    def metric(d):
        return d.agg(F.sum("x")).collect()[0][0]

    iterate(df, _halve_to_zero, max_rounds=5, metric=metric,
            strict=False, resume_dir=resume)
    stats: dict = {}
    out = iterate(df, _halve_to_zero, max_rounds=3, metric=metric,
                  strict=False, resume_dir=resume, stats=stats)
    assert stats["resumed_from"] == 5
    assert stats["rounds"] == 5  # zero new rounds ran
    assert out.collect()[0]["x"] == 2  # 64 -> 32 -> 16 -> 8 -> 4 -> 2


def test_components_with_resume_dir_matches_plain(spark, tmp_path):
    from flink_streaming_2_10_spark.pipeline.components import (
        connected_components,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8), (9, 9)], ["doc_a", "doc_b"]
    )
    plain = {
        r["node"]: r["component"]
        for r in connected_components(pairs).collect()
    }
    stats: dict = {}
    durable = {
        r["node"]: r["component"]
        for r in connected_components(
            pairs, resume_dir=str(tmp_path / "cc"), stats=stats
        ).collect()
    }
    assert durable == plain and stats["rounds"] >= 1


# Both BFS strategies must agree: 0 forces the distributed loop, the
# default engages the driver-side sweep on small graphs.
BFS_BOTH = pytest.mark.parametrize("dsme", [0, 1_000_000])


@BFS_BOTH
def test_bfs_path_graph_exact_hops(spark, dsme):
    # path 1-2-3-4-5, seed 1 -> hops == position; needs 4 rounds (worst
    # case for the loop, unlike near-clique dedup graphs)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], ["doc_a", "doc_b"]
    )
    seeds = spark.createDataFrame([(1,)], ["node"])
    stats: dict = {}
    got = {
        r["node"]: r["hops"]
        for r in shortest_path_hops(
            pairs, seeds, stats=stats, driver_solve_max_edges=dsme
        ).collect()
    }
    assert got == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4}
    assert stats["rounds"] >= 4 if dsme == 0 else stats["driver_solved"]


@BFS_BOTH
def test_bfs_unreachable_nodes_absent_and_seed_not_in_graph(spark, dsme):
    pairs = spark.createDataFrame([(1, 2), (10, 11)], ["doc_a", "doc_b"])
    # seed 99 touches nothing; seed 1 reaches only its own component
    seeds = spark.createDataFrame([(1,), (99,)], ["node"])
    got = {
        r["node"]: r["hops"]
        for r in shortest_path_hops(
            pairs, seeds, driver_solve_max_edges=dsme
        ).collect()
    }
    assert got == {1: 0, 2: 1, 99: 0}


@BFS_BOTH
def test_bfs_multi_seed_takes_nearest(spark, dsme):
    # path 1-2-3-4-5 with seeds at both ends: 3 is 2 hops from either
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], ["doc_a", "doc_b"]
    )
    seeds = spark.createDataFrame([(1,), (5,)], ["node"])
    got = {
        r["node"]: r["hops"]
        for r in shortest_path_hops(
            pairs, seeds, driver_solve_max_edges=dsme
        ).collect()
    }
    assert got == {1: 0, 2: 1, 3: 2, 4: 1, 5: 0}


def test_bfs_max_rounds_too_small_raises(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], ["doc_a", "doc_b"]
    )
    seeds = spark.createDataFrame([(1,)], ["node"])
    with pytest.raises(RuntimeError, match="still moving"):
        shortest_path_hops(pairs, seeds, max_rounds=2, driver_solve_max_edges=0)


def test_graph_hops_query_matches_oracle(spark, duck):
    import __spark_entry__ as entrymod
    from tests.conftest import SF_SMALL, assert_df_matches_oracle

    df = entrymod.queries()["graph_shortest_hops"](spark, SF_SMALL)
    assert_df_matches_oracle(
        df, duck, entrymod.oracle_sql()["graph_shortest_hops"]
    )


@BFS_BOTH
def test_bfs_empty_seeds_return_empty(spark, dsme):
    pairs = spark.createDataFrame([(1, 2)], ["doc_a", "doc_b"])
    no_seeds = spark.createDataFrame([], "node long")
    out = shortest_path_hops(pairs, no_seeds, driver_solve_max_edges=dsme)
    assert out.collect() == []
    assert [f.name for f in out.schema.fields] == ["node", "hops"]


def test_iterate_stop_when_without_metric_rejected(spark):
    df = spark.createDataFrame([(1,)], ["x"])
    with pytest.raises(ValueError, match="stop_when requires a metric"):
        iterate(df, _halve_to_zero, max_rounds=1, stop_when=lambda s: True)
