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


@pytest.mark.parametrize("seed", [3, 41, 77])
def test_sessionize_matches_sequential_reference(spark, seed):
    """Distributed sessionize vs a per-key sequential sweep."""
    from flink_streaming_2_10_spark.operators.temporal import sessionize

    rng = random.Random(seed)
    events = _rand_events(rng, 200, 6, 1)
    gap = 25
    df = spark.createDataFrame(events, ["eid", "k", "t"])
    got = {
        r["eid"]: (r["k"], r["session_idx"])
        for r in sessionize(
            df, on=["k"], time_col="t", gap=gap, tie_cols=["eid"]
        ).collect()
    }

    by_key: dict[str, list] = {}
    for eid, k, t in events:
        by_key.setdefault(k, []).append((t, eid))
    want = {}
    for k, evs in by_key.items():
        evs.sort()
        idx, prev = 0, None
        for t, eid in evs:
            # Flink boundary: only a delta strictly greater than the gap
            # starts a new session (TimeWindow.intersects is inclusive).
            if prev is None or t - prev > gap:
                idx += 1
            want[eid] = (k, idx)
            prev = t
    assert got == want


@pytest.mark.parametrize("seed", [5, 19])
def test_packing_conservation_under_random_shards(spark, seed):
    """Token mass and doc multiplicity are invariant under any shard
    count, and every non-final chunk is exactly full."""
    from pyspark.sql import functions as F

    from flink_streaming_2_10_spark.pipeline.packing import pack_concat_chunks
    from flink_streaming_2_10_spark.pipeline.textstats import BPE_PATTERN

    rng = random.Random(seed)
    docs = [
        (i, " ".join(rng.choice("alpha beta gamma delta x 7 !".split())
                      for _ in range(rng.randrange(1, 40))))
        for i in range(120)
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    budget = rng.randrange(16, 100)
    total = df.select(
        F.sum(F.regexp_count("text", F.lit(BPE_PATTERN)) + 1)
    ).collect()[0][0]
    for shards in (1, rng.randrange(2, 9), 17):
        rows = pack_concat_chunks(df, budget=budget, num_shards=shards).collect()
        assert sum(r["n_tokens"] for r in rows) == total
        last = {}
        for r in rows:
            last[r["shard_id"]] = max(last.get(r["shard_id"], -1), r["chunk_id"])
        for r in rows:
            if r["chunk_id"] != last[r["shard_id"]]:
                assert r["n_tokens"] == budget
