"""Exact-integer PCA: moment sums, covariance numerators, power
iteration determinism (pipeline/pca.py)."""

from __future__ import annotations

import numpy as np

from pyspark.sql import Row

from flink_streaming_2_10_spark.pipeline.pca import (
    _trunc_div,
    embedding_covariance,
    pca_top_component,
    quantized_moment_sums,
    top_component,
)


def _emb_df(spark, X):
    return spark.createDataFrame(
        [Row(doc_id=i, embedding=[float(v) for v in row])
         for i, row in enumerate(X)]
    )


def test_trunc_div_matches_duckdb_semantics(duck):
    for a, b in [(7, 2), (-7, 2), (1, 3), (-1, 3), (0, 5), (-10, 3)]:
        got = _trunc_div(a, b)
        want = duck.execute(f"SELECT {a} // {b}").fetchone()[0]
        assert got == want, (a, b, got, want)


def test_moment_sums_exact_vs_numpy(spark):
    rng = np.random.default_rng(7)
    X = rng.normal(size=(40, 5)).astype(np.float32)
    scale = 64
    q = np.floor(X.astype(np.float64) * scale).astype(np.int64)
    rows = quantized_moment_sums(_emb_df(spark, X), scale=scale).collect()
    got = {(r.i, r.j): r.v for r in rows}
    assert got[(0, 0)] == 40
    C = q.T @ q
    s = q.sum(axis=0)
    for i in range(5):
        assert got[(i + 1, 0)] == s[i]
        for j in range(i, 5):
            assert got[(i + 1, j + 1)] == C[i, j]


def test_covariance_numerators_exact(spark):
    rng = np.random.default_rng(11)
    X = rng.normal(size=(25, 4)).astype(np.float32)
    scale = 64
    q = np.floor(X.astype(np.float64) * scale).astype(np.int64)
    n = len(q)
    C = q.T @ q
    s = q.sum(axis=0)
    rows = embedding_covariance(_emb_df(spark, X), scale=scale).collect()
    got = {(r.i, r.j): r.cov_num for r in rows}
    assert len(got) == 4 * 5 // 2  # upper triangle only
    for i in range(4):
        for j in range(i, 4):
            assert got[(i + 1, j + 1)] == n * C[i, j] - s[i] * s[j]
    # diagonal numerators are n^2 * variance >= 0
    assert all(got[(i + 1, i + 1)] >= 0 for i in range(4))


def test_power_iteration_finds_dominant_direction():
    # symmetric matrix with a clearly dominant eigenpair
    M = np.array(
        [[90, 2, 1], [2, 40, 3], [1, 3, 10]], dtype=np.int64
    )
    rows = [
        (i + 1, j + 1, int(M[i, j]))
        for i in range(3)
        for j in range(i, 3)
    ]
    v = np.array(top_component(rows, d=3, iters=30), dtype=np.float64)
    v = v / np.linalg.norm(v)
    w, V = np.linalg.eigh(M.astype(np.float64))
    dom = V[:, np.argmax(np.abs(w))]
    assert abs(float(np.dot(v, dom))) > 0.9999


def test_power_iteration_deterministic_and_zero_safe():
    rows = [(1, 1, 4), (1, 2, 1), (2, 2, 3)]
    a = top_component(rows, d=2, iters=6)
    b = top_component(rows, d=2, iters=6)
    assert a == b
    # all-zero matrix: NULL loadings — the oracle's unrolled SQL
    # divides by a zero max, which is NULL in both Spark SQL and
    # DuckDB (r17 degenerate sweep; the old [1, 1] v0-seed answer
    # diverged from the oracle on a single-row corpus)
    assert top_component([(1, 1, 0)], d=2, iters=6) == [None, None]


def test_moment_pass_single_tiny_exchange(spark):
    """Corpus-scale pass emits only per-partition partial rows — the
    exchange carries d(d+1)/2+d+1 rows per partition, never the corpus."""
    import contextlib
    import io
    import re

    rng = np.random.default_rng(3)
    df = quantized_moment_sums(_emb_df(spark, rng.normal(size=(30, 4))))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert len(re.findall(r"\(\d+\) Exchange\b", plan)) == 1, plan


def test_direction_scores_exact_vs_numpy(spark):
    from flink_streaming_2_10_spark.pipeline.pca import (
        embedding_covariance,
        embedding_direction_scores,
        top_component,
    )

    rng = np.random.default_rng(5)
    X = rng.normal(size=(30, 4)).astype(np.float32)
    df = _emb_df(spark, X).withColumnRenamed("doc_id", "vec_id")
    cov = embedding_covariance(df, scale=64).collect()
    v = top_component(
        [(r.i, r.j, r.cov_num) for r in cov], d=4, iters=6
    )
    q = np.floor(X.astype(np.float64) * 64).astype(object)
    want = {i: int(sum(q[i][c] * v[c] for c in range(4))) for i in range(30)}
    got = {
        r.vec_id: r.dir_score
        for r in embedding_direction_scores(df, scale=64, k=30).collect()
    }
    assert got == want
    # ordering: |score| desc, id asc
    out = embedding_direction_scores(df, scale=64, k=30).collect()
    mags = [abs(r.dir_score) for r in out]
    assert mags == sorted(mags, reverse=True)


def test_direction_scores_plan_literal_no_join(spark):
    """The loading vector is inlined — the scoring scan joins nothing
    and the cut is TakeOrderedAndProject."""
    import contextlib
    import io

    from flink_streaming_2_10_spark.pipeline.pca import (
        embedding_direction_scores,
    )

    rng = np.random.default_rng(9)
    df = _emb_df(spark, rng.normal(size=(20, 3))).withColumnRenamed(
        "doc_id", "vec_id"
    )
    out = embedding_direction_scores(df, scale=64, k=5)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "TakeOrderedAndProject" in plan, plan
    assert "Join" not in plan, plan


def test_pca_top_component_on_testdata(spark):
    from tests.conftest import SF_SMALL

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    out = pca_top_component(emb).collect()
    d = len(out)
    assert sorted(r.i for r in out) == list(range(1, d + 1))
    # renormalized to infinity-norm 2^20 at the final iteration
    assert max(abs(r.loading) for r in out) == 1 << 20
