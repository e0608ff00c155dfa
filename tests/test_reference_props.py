"""Randomized reference-implementation checks for the custom operators.

Each test generates seeded random inputs and compares the distributed
implementation against an independent sequential reference:
``pandas.merge_asof`` for the as-of join, a brute-force double loop for
the interval join, and union-find for connected components. Seeds are
fixed so failures reproduce; sizes are chosen to exercise multi-key,
multi-partition paths.
"""

from __future__ import annotations

import random

import pandas as pd
import pytest

from flink_streaming_2_10_spark.operators.temporal import asof_join, interval_join
from flink_streaming_2_10_spark.pipeline.components import connected_components


def _rand_events(rng: random.Random, n: int, keys: int, id_base: int):
    # duplicate times are generated on purpose (tie handling); ids unique
    return [
        (id_base + i, f"k{rng.randrange(keys)}", rng.randrange(0, 500))
        for i in range(n)
    ]


@pytest.mark.parametrize("seed", [7, 23, 99])
def test_asof_join_matches_pandas_merge_asof(spark, seed):
    rng = random.Random(seed)
    left = _rand_events(rng, 120, 5, 1000)
    right = _rand_events(rng, 150, 5, 5000)
    ldf = spark.createDataFrame(left, ["lid", "k", "t"])
    rdf = spark.createDataFrame(right, ["rid", "k", "t"])
    tol = 50

    got = {
        r["lid"]: r["r_rid"]
        for r in asof_join(
            ldf, rdf, on=["k"], left_time="t", right_time="t",
            tolerance=tol, tie_cols=["rid"],
        ).collect()
    }

    # pandas reference: greatest-rid tie-break == keep the last row after
    # a stable sort by (t, rid); merge_asof takes the LAST match in sort
    # order at equal times.
    lp = pd.DataFrame(left, columns=["lid", "k", "t"]).sort_values(
        ["t", "lid"], kind="mergesort"
    )
    rp = pd.DataFrame(right, columns=["rid", "k", "t"]).sort_values(
        ["t", "rid"], kind="mergesort"
    )
    merged = pd.merge_asof(
        lp, rp, on="t", by="k", direction="backward", tolerance=tol,
        suffixes=("", "_r"),
    )
    want = {
        int(row.lid): (None if pd.isna(row.rid) else int(row.rid))
        for row in merged.itertuples()
    }
    assert got == want


@pytest.mark.parametrize("seed", [3, 41])
def test_interval_join_matches_brute_force(spark, seed):
    rng = random.Random(seed)
    left = _rand_events(rng, 80, 4, 0)
    right = _rand_events(rng, 80, 4, 10000)
    lower, upper = -30, 45
    ldf = spark.createDataFrame(left, ["lid", "k", "t"])
    rdf = spark.createDataFrame(right, ["rid", "k", "t"])

    got = sorted(
        (r["lid"], r["r_rid"])
        for r in interval_join(
            ldf, rdf, on=["k"], left_time="t", right_time="t",
            lower=lower, upper=upper,
        ).collect()
    )
    want = sorted(
        (li, ri)
        for li, lk, lt in left
        for ri, rk, rt in right
        if lk == rk and lt + lower <= rt <= lt + upper
    )
    assert got == want


@pytest.mark.parametrize("seed", [11, 77])
def test_connected_components_matches_union_find(spark, seed):
    rng = random.Random(seed)
    nodes = list(range(60))
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(70)
    ]
    df = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    got = {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    touched = {v for e in edges for v in e}
    want = {v: find(v) for v in touched}
    assert got == want


@pytest.mark.parametrize("seed", [5, 61])
def test_asof_forward_matches_pandas(spark, seed):
    rng = random.Random(seed)
    left = _rand_events(rng, 100, 4, 2000)
    right = _rand_events(rng, 120, 4, 7000)
    ldf = spark.createDataFrame(left, ["lid", "k", "t"])
    rdf = spark.createDataFrame(right, ["rid", "k", "t"])
    tol = 40

    got = {
        r["lid"]: r["r_rid"]
        for r in asof_join(
            ldf, rdf, on=["k"], left_time="t", right_time="t",
            tolerance=tol, tie_cols=["rid"], direction="forward",
        ).collect()
    }

    # forward + smallest-rid tie-break == merge_asof forward on frames
    # sorted by (t, rid): pandas takes the FIRST match in sort order.
    lp = pd.DataFrame(left, columns=["lid", "k", "t"]).sort_values(
        ["t", "lid"], kind="mergesort"
    )
    rp = pd.DataFrame(right, columns=["rid", "k", "t"]).sort_values(
        ["t", "rid"], kind="mergesort"
    )
    merged = pd.merge_asof(
        lp, rp, on="t", by="k", direction="forward", tolerance=tol,
        suffixes=("", "_r"),
    )
    want = {
        int(row.lid): (None if pd.isna(row.rid) else int(row.rid))
        for row in merged.itertuples()
    }
    assert got == want
