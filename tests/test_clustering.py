"""Fixed-point k-means (pipeline/clustering.py): exactness against an
independent pure-Python replay of the contract (quantize → assign with
struct-min tie-break → integer-floor centroid update → fixed rounds),
plus the negative-sum floor case the r8 ADVICE flagged and the
empty-cluster retention rule."""

from __future__ import annotations

import pytest

from flink_streaming_2_10_spark.pipeline.caching import release_cached
from flink_streaming_2_10_spark.pipeline.clustering import (
    SCALE,
    kmeans_fixed_point,
)


def _py_quantize(vec):
    import math

    return [int(math.floor(float(x) * SCALE + 0.5)) for x in vec]


def _py_kmeans(rows, k, rounds):
    """Independent replay: rows = [(vec_id, [float...])]."""
    pts = sorted((vid, _py_quantize(v)) for vid, v in rows)
    centroids = [list(q) for _, q in pts[:k]]

    def dist2(q, c):
        return sum((a - b) * (a - b) for a, b in zip(q, c))

    def assign(q):
        return min((dist2(q, c), j) for j, c in enumerate(centroids))

    for _ in range(rounds):
        sums = {}
        for _, q in pts:
            _, j = assign(q)
            s, n = sums.get(j, ([0] * len(q), 0))
            sums[j] = ([a + b for a, b in zip(s, q)], n + 1)
        centroids = [
            [s // n for s in sums[j][0]] if j in sums else centroids[j]
            for j, (s, n) in ((j, sums.get(j, (None, 0))) for j in range(k))
        ]
    return {vid: assign(q) for vid, q in pts}


@pytest.fixture()
def vectors(spark):
    # 3 tight groups around distinct corners plus stragglers; negative
    # components exercise the floor-toward--inf centroid path.
    base = {0: [0.9, 0.9, -0.9], 1: [-0.9, 0.8, 0.9], 2: [0.1, -0.9, 0.3]}
    rows = []
    for vid in range(30):
        g = vid % 3
        rows.append(
            (
                vid,
                [
                    v + ((vid * 7 + i * 3) % 5 - 2) * 0.013
                    for i, v in enumerate(base[g])
                ],
            )
        )
    return rows


def test_matches_pure_python_replay(spark, vectors):
    df = spark.createDataFrame(vectors, ["vec_id", "embedding"])
    got = {
        r["vec_id"]: (r["dist2"], r["cluster"])
        for r in kmeans_fixed_point(df, k=3, rounds=3).collect()
    }
    release_cached()
    want = _py_kmeans(vectors, k=3, rounds=3)
    assert got == want


def test_negative_sums_floor_toward_negative_infinity(spark):
    # Cluster whose component sum is negative and not divisible by its
    # count: floor(-7/2) = -4, NOT the truncated -3. Two points at
    # q = [-3] and [-4] (after SCALE quantization) land in one cluster.
    rows = [(0, [-0.00035]), (1, [-0.00045]), (2, [0.9])]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_fixed_point(df, k=2, rounds=2).collect()
    }
    release_cached()
    want = {vid: c for vid, (_, c) in _py_kmeans(rows, k=2, rounds=2).items()}
    assert got == want
    # And the replay itself pins the floor: centroid of {-3.5} is -4, so
    # both negative points stay distance ≤ 1 from it while 9000 is far.
    assert got[0] == got[1] != got[2]


def test_empty_cluster_keeps_previous_centroid(spark):
    # k=3 over 3 identical-ish points: after round 1 every point assigns
    # to cluster 0 (tie-break on smallest id), clusters 1-2 go empty and
    # must RETAIN their init centroids — the final assignment still
    # prefers cluster 0 for all points (exact tie broken by id).
    rows = [(0, [0.5, 0.5]), (1, [0.5, 0.5]), (2, [0.5, 0.5])]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = kmeans_fixed_point(df, k=3, rounds=2).collect()
    release_cached()
    assert {r["cluster"] for r in out} == {0}
    assert all(r["dist2"] == 0 for r in out)


def test_validates_parameters(spark):
    df = spark.createDataFrame([(0, [0.1])], ["vec_id", "embedding"])
    with pytest.raises(ValueError, match="k and rounds"):
        kmeans_fixed_point(df, k=0)
    release_cached()


def test_k_beyond_corpus_size_matches_oracle_init(spark):
    """r17 degenerate-input sweep: k > n used to raise, but the oracle's
    init CTE (`row_number - 1 < k`) is well-defined — min(k, n)
    centroids. A 1-row corpus with k=5 assigns the row to cluster 0 at
    distance 0; an empty corpus yields zero rows with the contract
    schema."""
    df = spark.createDataFrame([(7, [0.1, 0.9])], ["vec_id", "embedding"])
    out = kmeans_fixed_point(df, k=5, rounds=2).collect()
    release_cached()
    assert [(r["vec_id"], r["cluster"], r["dist2"]) for r in out] == [(7, 0, 0)]

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    out2 = kmeans_fixed_point(empty, k=4, rounds=2)
    release_cached()
    assert out2.columns == ["vec_id", "cluster", "dist2"]
    assert out2.count() == 0


class TestCentroidOutliers:
    def test_planted_outlier_flagged(self, spark):
        from flink_streaming_2_10_spark.pipeline.clustering import (
            centroid_outliers,
        )

        def v(*coords, dim=4):
            out = [0.0] * dim
            for i, c in enumerate(coords):
                out[i] = float(c)
            return out

        emb = spark.createDataFrame(
            [
                # Label 0: three tight vectors + one far outlier.
                (1, v(0.10), 0),
                (2, v(0.12), 0),
                (3, v(0.11), 0),
                (4, v(0.90), 0),
                # Label 1: two tight vectors (none flagged).
                (10, v(-0.5), 1),
                (11, v(-0.52), 1),
            ],
            "vec_id long, embedding array<float>, label int",
        )
        got = {
            r["vec_id"]: r["is_outlier"]
            for r in centroid_outliers(emb, radius=0.3).collect()
        }
        assert got == {
            1: False, 2: False, 3: False, 4: True, 10: False, 11: False
        }

    def test_exact_integer_decision_matches_python(self, spark):
        import math

        from flink_streaming_2_10_spark.pipeline.clustering import (
            SCALE,
            centroid_outliers,
        )

        rows = [
            (i, [((i * 37) % 100) / 100.0, ((i * 17) % 100) / 100.0], i % 2)
            for i in range(20)
        ]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )
        got = {
            r["vec_id"]: (r["n"], r["dist2_num"], r["is_outlier"])
            for r in centroid_outliers(emb, radius=0.25).collect()
        }
        # Pure-Python replay with identical integer arithmetic.
        import numpy as np

        qs = {
            i: [
                math.floor(float(np.float32(x)) * SCALE + 0.5)
                for x in vec
            ]
            for i, vec, _ in rows
        }
        by_label: dict = {}
        for i, _, lab in rows:
            by_label.setdefault(lab, []).append(i)
        t = round(0.25 * SCALE)
        for lab, ids in by_label.items():
            n = len(ids)
            s = [sum(qs[i][d] for i in ids) for d in range(2)]
            for i in ids:
                num = sum((n * qs[i][d] - s[d]) ** 2 for d in range(2))
                assert got[i] == (n, num, num > n * n * t * t), i

    def test_boundary_is_strict(self, spark):
        from flink_streaming_2_10_spark.pipeline.clustering import (
            centroid_outliers,
        )

        # Two vectors symmetric around their centroid at distance
        # exactly 0.1 each: radius 0.1 -> NOT outliers (strict >).
        emb = spark.createDataFrame(
            [(1, [0.0], 0), (2, [0.2], 0)],
            "vec_id long, embedding array<float>, label int",
        )
        got = {
            r["vec_id"]: r["is_outlier"]
            for r in centroid_outliers(emb, radius=0.1).collect()
        }
        assert got == {1: False, 2: False}


def test_centroid_outliers_empty_input_returns_empty(spark):
    """ADVICE r11: empty input used to raise AttributeError (no CASE
    branches collected). Now: empty result, contract schema."""
    from flink_streaming_2_10_spark.pipeline.clustering import (
        centroid_outliers,
    )

    emb = spark.createDataFrame(
        [], "vec_id long, label int, embedding array<float>"
    )
    out = centroid_outliers(emb)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "vec_id", "label", "n", "dist2_num", "is_outlier",
    ]


def test_centroid_outliers_overflow_bound_raises(spark):
    """ADVICE r11: exceeding the documented int64 bound (n·SCALE beyond
    the dim-adjusted safe limit) must fail loudly, not flip flags."""
    import pytest as _pytest

    from flink_streaming_2_10_spark.pipeline import clustering as cl

    emb = spark.createDataFrame(
        [(i, 0, [0.5, 0.5]) for i in range(4)],
        "vec_id long, label int, embedding array<float>",
    )
    real_scale = cl.SCALE
    # Simulate a beyond-bound corpus without materializing one: raise
    # SCALE so n*SCALE blows the dim-adjusted isqrt((2^63-1)/(16*dim)).
    cl.SCALE = 10**18
    try:
        with _pytest.raises(ValueError, match="int64-safe bound"):
            cl.centroid_outliers(emb, radius=0.5)
    finally:
        cl.SCALE = real_scale
