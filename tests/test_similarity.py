"""Similarity-search tests: exact top-k vs DuckDB, ANN recall properties,
LSH bucket determinism, all-pairs near-dup verification."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from flink_streaming_2_10_spark.catalog import load_table
from flink_streaming_2_10_spark.pipeline.similarity import (
    ann_hyperplane_topk,
    cosine_neardup_pairs,
    cosine_topk,
    hyperplane_weights,
    with_buckets,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings")


def test_cosine_topk_matches_duckdb(emb, duck):
    got = cosine_topk(emb, query_id=0, k=20).collect()
    want = duck.sql("""
        WITH q AS (SELECT embedding qv FROM embeddings WHERE vec_id = 0)
        SELECT e.vec_id, list_cosine_similarity(e.embedding, q.qv) c
        FROM embeddings e CROSS JOIN q
        ORDER BY c DESC, e.vec_id LIMIT 20
    """).fetchall()
    assert [r["vec_id"] for r in got] == [w[0] for w in want]
    for r, w in zip(got, want):
        assert r["cosine"] == pytest.approx(w[1], abs=1e-6)
    assert got[0]["vec_id"] == 0 and got[0]["cosine"] == pytest.approx(1.0)


def test_topk_deterministic_fold(emb):
    a = [r["cosine"] for r in cosine_topk(emb, query_id=7, k=10).collect()]
    b = [r["cosine"] for r in cosine_topk(emb, query_id=7, k=10).collect()]
    assert a == b  # bit-identical across runs (fixed fold order)


def test_hyperplane_weights_deterministic():
    w1 = hyperplane_weights(2, 3, 8, seed=42)
    w2 = hyperplane_weights(2, 3, 8, seed=42)
    assert w1 == w2
    assert all(x in (-1, 1) for t in w1 for p in t for x in p)
    assert hyperplane_weights(2, 3, 8, seed=1) != w1


def test_buckets_close_vectors_collide(spark):
    # A vector and a tiny perturbation must share every bucket; its
    # negation must share none (all sign bits flip).
    base = [float(i % 7 - 3) + 0.1 for i in range(16)]
    near = [x + 1e-6 for x in base]
    neg = [-x for x in base]
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, neg)], ["vec_id", "embedding"]
    ).withColumn("embedding", F.col("embedding").cast("array<float>"))
    w = hyperplane_weights(4, 8, 16)
    rows = {r["vec_id"]: r for r in with_buckets(df, w).collect()}
    for t in range(4):
        assert rows[1][f"b{t}"] == rows[2][f"b{t}"]
        assert rows[1][f"b{t}"] + rows[3][f"b{t}"] == (1 << 8) - 1  # complement


def test_ann_recall_vs_bruteforce(emb):
    exact = [r["vec_id"] for r in cosine_topk(emb, query_id=3, k=10).collect()]
    approx = [
        r["vec_id"]
        for r in ann_hyperplane_topk(
            emb, query_id=3, k=10, num_tables=8, num_planes=4
        ).collect()
    ]
    assert approx[0] == 3  # the query itself always collides with itself
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.5  # modest planes on random data; exact-verify path


def test_ann_is_subset_reranked_by_exact_cosine(emb):
    out = ann_hyperplane_topk(emb, query_id=3, k=50).collect()
    cos = [r["cosine"] for r in out]
    assert cos == sorted(cos, reverse=True)
    all_ids = {r["vec_id"] for r in emb.select("vec_id").collect()}
    assert {r["vec_id"] for r in out} <= all_ids


def test_cosine_neardup_pairs_verified(emb, duck):
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in cosine_neardup_pairs(emb, threshold=0.35).collect()
    }
    truth = {
        (a, b): c
        for a, b, c in duck.sql("""
            SELECT a.vec_id, b.vec_id,
                   list_cosine_similarity(a.embedding, b.embedding) c
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.35
        """).fetchall()
    }
    assert set(got) <= set(truth)  # precision 1.0: every emitted pair is real
    for k, v in got.items():
        assert v == pytest.approx(truth[k], abs=1e-6)
    if truth:
        assert len(got) / len(truth) >= 0.25  # LSH recall floor on random data


def test_ivf_topk_recall_and_shape(emb):
    from flink_streaming_2_10_spark.pipeline.similarity import (
        ivf_centroids,
        ivf_topk,
    )

    cents = ivf_centroids(emb, num_centroids=8).collect()
    assert [c["cid"] for c in cents] == list(range(1, 9))
    assert all(c["cnorm"] > 0 for c in cents)

    k = 20
    exact = [r["vec_id"] for r in cosine_topk(emb, query_id=3, k=k).collect()]
    got = ivf_topk(
        emb, query_id=3, k=k, num_centroids=8, nprobe=3
    ).collect()
    ids = [r["vec_id"] for r in got]
    # query always lands in its own probed list
    assert ids[0] == 3 and got[0]["cosine"] == pytest.approx(1.0)
    # cosines sorted descending, ids unique
    cosines = [r["cosine"] for r in got]
    assert cosines == sorted(cosines, reverse=True)
    assert len(set(ids)) == len(ids)
    # probing 3/8 lists must still recover a meaningful share of the
    # exact top-k (loose: IVF recall on random data with coarse lists)
    assert len(set(ids) & set(exact)) >= k // 4


def test_ivf_topk_deterministic(emb):
    from flink_streaming_2_10_spark.pipeline.similarity import ivf_topk

    a = [(r["vec_id"], r["cosine"]) for r in
         ivf_topk(emb, query_id=5, k=10, num_centroids=8, nprobe=2).collect()]
    b = [(r["vec_id"], r["cosine"]) for r in
         ivf_topk(emb, query_id=5, k=10, num_centroids=8, nprobe=2).collect()]
    assert a == b


def test_auto_num_planes_scales_with_corpus():
    from flink_streaming_2_10_spark.pipeline.similarity import auto_num_planes

    assert auto_num_planes(500) == 6  # the oracle-gate scales (sf<=0.01)
    assert auto_num_planes(2000) == 8  # bench sf0.1
    assert auto_num_planes(10**9) == 20  # clamped at hi
    assert auto_num_planes(0) == 6  # degenerate input -> lo
    # monotone nondecreasing in n
    planes = [auto_num_planes(n) for n in (10, 100, 1000, 10**4, 10**6)]
    assert planes == sorted(planes)


def test_neardup_candidates_bounded_on_skewed_fixture(spark):
    # 600 random unit vectors + 8 planted near-dup pairs. Auto plane
    # scaling must keep the LSH candidate set near-linear in n (not the
    # 180k all-pairs), while still surfacing the planted high-cosine pairs.
    import numpy as np
    from pyspark.sql import Observation

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(600, 32))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    for i in range(8):  # planted: 1000+i is a tiny perturbation of i
        vecs = np.vstack([vecs, vecs[i] + rng.normal(scale=1e-3, size=32)])
    rows = [(int(i if i < 600 else 1000 + i - 600), [float(x) for x in v])
            for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )
    obs = Observation("neardup_cands")
    out = cosine_neardup_pairs(
        df, threshold=0.99, dim=32, observation=obs
    ).collect()
    got_pairs = {(r["id_a"], r["id_b"]) for r in out}
    assert {(i, 1000 + i) for i in range(8)} <= got_pairs
    n = 608
    cands = obs.get["candidate_pairs"]
    assert cands <= 60 * n  # near-linear, not n²/2 = 184k
    assert cands >= len(out)  # sanity: candidates superset of survivors


def test_quantize_embeddings_properties(spark):
    from flink_streaming_2_10_spark.pipeline.similarity import (
        quantize_embeddings,
    )

    rows = [
        (1, [1.0, -2.0, 0.5, 4.0]),
        (2, [0.0, 0.0, 0.0, 0.0]),   # all-zero: qvec zeros, scale 0
        (3, [-127.0, 127.0, 63.5, -63.5]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )
    got = {
        r["vec_id"]: (r["scale"], list(r["qvec"]), r["qnorm2"])
        for r in quantize_embeddings(df, extra_cols=()).collect()
    }
    # v1: max|v|=4 -> q = floor(v*127/4 + .5) = [32, -63, 16, 127]
    assert got[1][1] == [32, -63, 16, 127]
    assert got[1][0] == pytest.approx(4.0 / 127.0)
    assert got[1][2] == 32**2 + 63**2 + 16**2 + 127**2
    assert got[2] == (0.0, [0, 0, 0, 0], 0)
    # extremes land exactly on ±127, |q| never exceeds 127
    assert got[3][1] == [-127, 127, 64, -63]  # floor(-63.5+.5) = -63
    assert all(abs(x) <= 127 for qs in got.values() for x in qs[1])
    # dequantize roundtrip: q*scale within half a quant step of v
    for vid, vec in [(1, rows[0][1]), (3, rows[2][1])]:
        scale, q, _ = got[vid]
        for orig, qi in zip(vec, q):
            assert abs(qi * scale - orig) <= scale / 2 + 1e-12


def test_quantized_topk_recall_vs_exact(emb):
    from flink_streaming_2_10_spark.pipeline.similarity import (
        quantized_cosine_topk,
    )

    k = 50
    exact = [r["vec_id"] for r in cosine_topk(emb, query_id=0, k=k).collect()]
    quant = [
        r["vec_id"]
        for r in quantized_cosine_topk(emb, query_id=0, k=k).collect()
    ]
    # the query itself ranks first (self-cosine is exactly 1.0 in both)
    assert quant[0] == 0
    # int8 quantization error is ~1e-2 per cosine at d=64: the top-k sets
    # must overlap heavily even if the tail order shuffles
    overlap = len(set(exact) & set(quant)) / k
    assert overlap >= 0.8, (overlap, exact, quant)


def test_quantized_topk_matches_oracle(spark, duck):
    import __spark_entry__ as entrymod
    from tests.conftest import SF_SMALL, assert_df_matches_oracle

    df = entrymod.queries()["similarity_quantized_topk"](spark, SF_SMALL)
    assert_df_matches_oracle(
        df, duck, entrymod.oracle_sql()["similarity_quantized_topk"]
    )


def _planted_emb(spark, n=40, m=6, identical=True, dim=64):
    """n distinct vectors + an m-member planted class on vec 0: identical
    (bit-equal) or near-identical (1e-9-perturbed, collapse-immune)."""
    import math

    rows = []
    for i in range(n):
        # i+1: keeps vec 0 NONZERO (a zero vector has undefined cosine
        # and would vacuously pass the star-edge assertions)
        rows.append((i, [math.sin(0.1 * (i + 1) * (d + 1)) for d in range(dim)]))
    base = rows[0][1]
    for k in range(m):
        vec = list(base) if identical else [x + 1e-9 * (k + 1) for x in base]
        rows.append((1000 + k, vec))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_cosine_neardup_identical_collapse_star_edges(spark):
    """An identical-embedding class emits m-1 star edges from the min-id
    rep (here vec 0), never member-member pairs — linear in class size —
    and the pair graph keeps the same transitive closure as the
    uncollapsed all-pairs output."""
    from flink_streaming_2_10_spark.pipeline.similarity import (
        cosine_neardup_pairs,
    )

    df = _planted_emb(spark, n=20, m=5)
    got = cosine_neardup_pairs(
        df, threshold=0.99, num_tables=4, num_planes=6
    ).collect()
    stars = {(r["id_a"], r["id_b"]): r["cosine"] for r in got
             if r["id_a"] == 0 and r["id_b"] >= 1000}
    assert set(stars) == {(0, 1000 + k) for k in range(5)}
    assert all(c == 1.0 for c in stars.values())
    # no member-member pair survives (they collapsed)
    assert not [r for r in got if r["id_a"] >= 1000 and r["id_b"] >= 1000]

    # closure equivalence vs the uncollapsed path
    def closure(pairs):
        import itertools

        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            parent[find(a)] = find(b)
        groups = {}
        for node in list(parent):
            groups.setdefault(find(node), set()).add(node)
        return {frozenset(g) for g in groups.values() if len(g) > 1}

    un = cosine_neardup_pairs(
        df, threshold=0.99, num_tables=4, num_planes=6,
        collapse_identical=False,
    ).collect()
    assert closure([(r["id_a"], r["id_b"]) for r in got]) == closure(
        [(r["id_a"], r["id_b"]) for r in un]
    )


def test_cosine_neardup_bucket_cap_drops_whole_bucket(spark):
    """Near-identical (collapse-immune) floods: with the cap the
    flooded bucket drops WHOLE (no intra-flood pairs, other pairs
    untouched); uncapped, the flood pairs quadratically."""
    from flink_streaming_2_10_spark.pipeline.similarity import (
        cosine_neardup_pairs,
    )

    df = _planted_emb(spark, n=20, m=8, identical=False)
    capped = cosine_neardup_pairs(
        df, threshold=0.99, num_tables=4, num_planes=6, max_bucket_size=5
    ).collect()
    assert not [r for r in capped if r["id_a"] >= 1000], capped
    uncapped = cosine_neardup_pairs(
        df, threshold=0.99, num_tables=4, num_planes=6, max_bucket_size=None
    ).collect()
    flood_pairs = [
        r for r in uncapped if r["id_a"] >= 1000 and r["id_b"] >= 1000
    ]
    assert len(flood_pairs) == 8 * 7 // 2  # the quadratic the cap removes
