"""Mutual-nearest-neighbor pair mining (pipeline/mining.py)."""

from __future__ import annotations

import pytest

from flink_streaming_2_10_spark.pipeline.mining import mutual_nn_pairs


def _vec(*coords, dim=4):
    v = [0.0] * dim
    for i, c in enumerate(coords):
        v[i] = float(c)
    return v


@pytest.fixture(scope="module")
def emb(spark):
    # Group 0: a0 near b0's direction, a1 near b1's, a2 is a hub-bait
    # vector closest to b0 but b0 prefers a0 -> not mutual.
    rows = [
        (0, _vec(1.0, 0.1), 0),
        (1, _vec(0.1, 1.0), 0),
        (2, _vec(0.8, 0.3), 0),
        (10, _vec(1.0, 0.0), 1),
        (11, _vec(0.0, 1.0), 1),
        (12, _vec(-1.0, -1.0), 1),
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def _pairs(df):
    return {(r["id_a"], r["id_b"]) for r in df.collect()}


def test_mutual_pairs_exact(emb):
    out = mutual_nn_pairs(emb, dim=4)
    got = _pairs(out)
    # a0 <-> b10 mutual; a1 <-> b11 mutual; a2's top is b10 but b10's
    # top is a0 -> excluded; b12 points at nothing mutual.
    assert got == {(0, 10), (1, 11)}


def test_one_directional_top1_is_not_enough(emb):
    out = mutual_nn_pairs(emb, dim=4)
    ids_a = {r["id_a"] for r in out.collect()}
    assert 2 not in ids_a


def test_min_cosine_filters_after_ranking(emb, spark):
    # Remove b11 so a1's best cross match is weak; threshold kills the
    # weak mutual pair but leaves the strong one.
    sub = emb.filter("vec_id != 11")
    strong_only = mutual_nn_pairs(sub, dim=4, min_cosine=0.9)
    assert _pairs(strong_only) == {(0, 10)}
    # Without the threshold the weak mutual exists (ranking unchanged).
    all_pairs = mutual_nn_pairs(sub, dim=4)
    assert (0, 10) in _pairs(all_pairs)


def test_candidate_restriction(emb):
    spark = emb.sparkSession
    cand = spark.createDataFrame(
        [(1, 11), (2, 10)], "id_a long, id_b long"
    )
    out = mutual_nn_pairs(emb, dim=4, candidates=cand)
    # Within the candidate set each id appears once -> both mutual.
    assert _pairs(out) == {(1, 11), (2, 10)}


def test_tie_break_ascending_other_id(spark):
    # b10 and b11 identical: a0's rank-1 is the lower id; only that one
    # can be mutual.
    rows = [
        (0, _vec(1.0), 0),
        (10, _vec(2.0), 1),
        (11, _vec(2.0), 1),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = mutual_nn_pairs(emb, dim=4)
    assert _pairs(out) == {(0, 10)}


def test_cosine_value_matches_manual(emb):
    import math

    import numpy as np

    row = [
        r
        for r in mutual_nn_pairs(emb, dim=4).collect()
        if r["id_a"] == 0
    ][0]
    # Embeddings are stored float32; the fold runs on their exact
    # float64 upcasts.
    x = float(np.float32(0.1))
    expect = 1.0 / (math.sqrt(1.0 + x * x) * 1.0)
    assert row["cosine"] == pytest.approx(expect, abs=1e-12)


def test_zero_norm_vector_never_wins(spark):
    """ADVICE r11: a zero-norm embedding used to score NaN (0/0) against
    every partner, and NaN sorts above all real cosines DESC — so the
    zero vector would crowd out every legitimate mutual pair. Guarded:
    cosine is 0.0 when either norm is 0, so genuine pairs still mine."""
    rows = [
        (0, _vec(1.0), 0),
        (1, _vec(0.0), 0),        # zero-norm on side A
        (10, _vec(0.9, 0.1), 1),
        (11, _vec(0.0), 1),       # zero-norm on side B
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in mutual_nn_pairs(emb, dim=4).collect()
    }
    # The genuine pair survives; no NaN anywhere.
    assert (0, 10) in got
    assert all(c == c for c in got.values())  # no NaN
    # The zero vectors may only pair with each other (cosine 0.0), never
    # with a real vector.
    for (ia, ib), c in got.items():
        if ia == 1 or ib == 11:
            assert ia == 1 and ib == 11 and c == 0.0
