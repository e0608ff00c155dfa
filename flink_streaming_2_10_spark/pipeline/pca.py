"""Exact-integer PCA over the embeddings table: distributed moment
sums, covariance triples, and a deterministic top-component power
iteration.

The pipeline use-case: embedding whitening / dominant-direction removal
before ANN indexing or clustering (a top component dominated by corpus
boilerplate drowns cosine similarity), and per-dimension drift audits
between snapshots.

Design for exactness AND 100 TB:

* Embeddings are quantized scan-side: ``q = floor(x * scale)`` with
  ``scale`` a POWER OF TWO — scaling a float by 2^k only shifts the
  exponent, so the product and floor are exact in float32 and float64
  alike, and Spark, numpy, and DuckDB agree bit-for-bit.
* The corpus-scale work is ONE pass computing integer moment sums
  (Σ qᵢqⱼ upper triangle, Σ qᵢ, n). This uses an Arrow-batched
  ``mapInPandas`` partial aggregation (numpy int64 ``X.T @ X`` per
  batch — a BLAS-shaped accumulation the JVM cannot express without an
  n·d² row explode; the justified-Python list in COVERAGE.md gains one
  entry) emitting d(d+1)/2 + d + 1 partial rows per PARTITION, merged
  by one tiny keyed sum — integer addition is associative, so the
  result is partition-order-free and exact.
* Covariance numerators ``n·Σqᵢqⱼ − Σqᵢ·Σqⱼ`` are formed POST-agg on
  the d²-sized table (broadcast joins, no corpus touch). They fit
  int64 through ~1e13 rows at |q|≤256; past that, form them in
  decimal(38) or driver big-int from the same raw sums — the raw-sum
  face is the mergeable-state contract, matching ``corpus_summary``.
* The top principal component runs driver-side on the d×d matrix in
  arbitrary-precision Python ints (the same driver-scalar budget as
  ``clustering.py`` centroids: d² longs), with a FIXED iteration count
  and a deterministic integer renormalization ``v' = sign(w) ·
  (|w|·2^20 trunc-div max|w|)`` — truncating division matches DuckDB's
  ``//`` exactly (DuckDB truncates toward zero; Python ``//`` floors,
  so the sign is factored out first). The DuckDB oracle replays the
  identical iterations as unrolled CTEs in HUGEINT.

Reference parity: the reference has no linear-algebra surface; this is
part of the beyond-reference training-data-pipeline family (brief §
"Beyond the reference's own operators").
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

_NORM = 1 << 20  # per-iteration renormalization target magnitude


def quantized_moment_sums(
    emb: DataFrame, scale: int = 64, vec_col: str = "embedding"
) -> DataFrame:
    """One corpus pass → exact integer moment sums of the quantized
    vectors, as rows ``(i, j, v)`` (1-based): ``j >= i >= 1`` carry
    Σ qᵢqⱼ, ``(i, 0)`` carry Σ qᵢ, ``(0, 0)`` carries n.

    Partial aggregation happens INSIDE each Arrow batch (numpy int64
    matmul), so the exchange moves only d(d+1)/2+d+1 rows per
    partition regardless of corpus size.
    """
    assert scale & (scale - 1) == 0, "scale must be a power of two"

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        C = None
        s = None
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            q = np.floor(X * scale).astype(np.int64)
            C = q.T @ q if C is None else C + q.T @ q
            s = q.sum(axis=0) if s is None else s + q.sum(axis=0)
            n += len(q)
        if C is None:
            return
        import numpy as np

        d = C.shape[0]
        iu, ju = np.triu_indices(d)
        yield pd.DataFrame(
            {
                "i": np.concatenate([iu + 1, np.arange(1, d + 1), [0]]),
                "j": np.concatenate([ju + 1, np.zeros(d, np.int64), [0]]),
                "v": np.concatenate([C[iu, ju], s, [n]]),
            }
        )

    parts = emb.select(vec_col).mapInPandas(partials, "i int, j int, v long")
    return parts.groupBy("i", "j").agg(F.sum("v").alias("v"))


def embedding_covariance(
    emb: DataFrame, scale: int = 64, vec_col: str = "embedding"
) -> DataFrame:
    """Scaled-covariance numerators ``cov_num(i,j) = n·Σqᵢqⱼ −
    Σqᵢ·Σqⱼ`` for the upper triangle ``1 ≤ i ≤ j ≤ d`` — the exact
    integer d² summary every downstream consumer (power iteration,
    whitening, drift audit) starts from. Everything below the moment
    pass is broadcast joins on the d²-sized table."""
    # The moment table is referenced FOUR times below (qq, sa, sb, n) —
    # materialize it once (eager localCheckpoint of the d²-sized result)
    # or the corpus-scale moment pass re-executes per reference.
    sums = quantized_moment_sums(emb, scale, vec_col).localCheckpoint()
    qq = sums.filter((F.col("i") >= 1) & (F.col("j") >= 1))
    sv = sums.filter((F.col("i") >= 1) & (F.col("j") == 0)).select(
        F.col("i").alias("si_idx"), F.col("v").alias("sv")
    )
    n1 = sums.filter((F.col("i") == 0) & (F.col("j") == 0)).select(
        F.col("v").alias("nv")
    )
    sa = sv.select(F.col("si_idx").alias("ia"), F.col("sv").alias("sva"))
    sb = sv.select(F.col("si_idx").alias("ib"), F.col("sv").alias("svb"))
    return (
        qq.join(F.broadcast(sa), F.col("i") == F.col("ia"))
        .join(F.broadcast(sb), F.col("j") == F.col("ib"))
        .crossJoin(F.broadcast(n1))
        .select(
            "i",
            "j",
            (F.col("nv") * F.col("v") - F.col("sva") * F.col("svb")).alias(
                "cov_num"
            ),
        )
    )


def _trunc_div(a: int, b: int) -> int:
    """Truncating integer division (toward zero) — DuckDB's ``//``;
    Python's ``//`` floors, which differs for negative numerators."""
    return -((-a) // b) if a < 0 else a // b


def top_component(cov_rows, d: int, iters: int = 6) -> list[int]:
    """Deterministic power iteration on the symmetric integer matrix
    given as upper-triangle ``(i, j, cov_num)`` rows (1-based), in
    arbitrary-precision Python ints: ``v₀ = 1ᵈ``; each round ``w = M·v``
    then ``v' = sign(w)·(|w|·2^20 trunc-div max|w|)``. Fixed ``iters``
    (no convergence test) keeps the computation replayable as unrolled
    SQL. Returns the final integer loading vector (∞-norm 2^20).

    Degenerate matrix (``max|w| = 0`` at some round — e.g. n ≤ 1 rows,
    so every covariance numerator is 0): returns ``[None] * d``. This
    mirrors the unrolled SQL oracle exactly — integer division by a
    zero max is NULL in both Spark SQL (``div``) and DuckDB, and once
    one round is all-NULL every later round stays NULL — where the
    previous early-``break`` returned the PRE-renormalization vector
    and diverged from the oracle (found by the r17 degenerate-input
    sweep on a single-row corpus)."""
    M = [[0] * d for _ in range(d)]
    for i, j, v in cov_rows:
        M[i - 1][j - 1] = v
        M[j - 1][i - 1] = v
    v = [1] * d
    for _ in range(iters):
        w = [sum(M[r][c] * v[c] for c in range(d)) for r in range(d)]
        mx = max(abs(x) for x in w)
        if mx == 0:
            return [None] * d
        v = [_trunc_div(x * _NORM, mx) for x in w]
    return v


def _collect_top_component(
    emb: DataFrame, scale: int, iters: int, vec_col: str
) -> list[int] | None:
    """Run the moment pass once and the power iteration driver-side —
    the shared head of every apply face. ``None`` on an EMPTY corpus
    (no covariance rows at all — the oracle's CTE chain then yields
    zero rows, distinct from the all-NULL degenerate-matrix case)."""
    cov = embedding_covariance(emb, scale, vec_col).collect()
    if not cov:
        return None
    d = max(r["j"] for r in cov)
    return top_component(
        [(r["i"], r["j"], r["cov_num"]) for r in cov], d, iters
    )


def pca_top_component(
    emb: DataFrame, scale: int = 64, iters: int = 6,
    vec_col: str = "embedding",
) -> DataFrame:
    """Top principal component of the quantized embeddings as ``(i,
    loading)`` rows — corpus touched once (the moment pass), iteration
    on d² driver ints, result re-parallelized for composition.

    Degenerate inputs match the oracle's CTE chain exactly (r17 sweep):
    an EMPTY corpus yields ZERO rows (no covariance rows to iterate);
    a rank-zero covariance matrix (e.g. a single row) yields ``d`` rows
    with NULL loadings (division by a zero max is NULL in SQL)."""
    v = _collect_top_component(emb, scale, iters, vec_col)
    spark = emb.sparkSession
    return spark.createDataFrame(
        [(i + 1, None if x is None else int(x)) for i, x in enumerate(v or [])],
        "i int, loading long",
    )


def embedding_direction_scores(
    emb: DataFrame,
    scale: int = 64,
    iters: int = 6,
    k: int = 100,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """The apply face: each vector's exact-integer coordinate along the
    top principal direction, top-``k`` by |score| (tie-break id
    ascending) — the docs most aligned with the corpus's dominant
    direction, i.e. the boilerplate/template candidates that
    dominant-direction removal would rewrite most.

    Plan shape: the moment pass (one corpus scan), then ONE scoring
    scan with the integer loading vector inlined as a plan literal
    (``zip_with``/``aggregate`` higher-order functions — no Python, no
    join), cut by TakeOrderedAndProject. Scores are exact int64
    (|q| ≤ scale·max|x|, |loading| ≤ 2²⁰, d terms), so the oracle
    replays them bit-for-bit."""
    v = _collect_top_component(emb, scale, iters, vec_col)
    if v is None:
        # Empty corpus: the oracle's scored CTE has nothing to join the
        # (empty) loading vector against — zero rows, same schema.
        return emb.select(
            F.col(id_col), F.lit(None).cast("long").alias("dir_score")
        )
    # None components (rank-zero covariance) become NULL literals: the
    # dot product is then NULL for every vector, as in the oracle.
    vlit = F.array(
        *[F.lit(None if x is None else int(x)).cast("long") for x in v]
    )
    q = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * F.lit(scale)).cast("long"),
    )
    score = F.aggregate(
        F.zip_with(q, vlit, lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        emb.select(F.col(id_col), score.alias("dir_score"))
        .orderBy(F.abs(F.col("dir_score")).desc(), F.col(id_col))
        .limit(k)
    )


def covariance_oracle_sql(
    scale: int = 64, d: int = 64, table: str = "embeddings",
    vec_col: str = "embedding",
) -> str:
    """DuckDB mirror of :func:`embedding_covariance` — same power-of-two
    quantization (exact in any float width), same integer sums."""
    return f"""
        WITH q AS (SELECT list_transform({vec_col},
                          x -> CAST(floor(x * {scale}) AS BIGINT)) AS qv
                   FROM {table}),
        nn AS (SELECT CAST(count(*) AS BIGINT) AS nv FROM q),
        s AS (SELECT gi.i AS i, CAST(sum(qv[gi.i]) AS BIGINT) AS sv
              FROM q, generate_series(1, {d}) AS gi(i) GROUP BY 1),
        qq AS (SELECT gi.i AS i, gj.j AS j,
                      CAST(sum(qv[gi.i] * qv[gj.j]) AS BIGINT) AS qqv
               FROM q, generate_series(1, {d}) AS gi(i),
                    generate_series(1, {d}) AS gj(j)
               WHERE gj.j >= gi.i GROUP BY 1, 2)
        SELECT CAST(qq.i AS INT) AS i, CAST(qq.j AS INT) AS j,
               nv * qqv - sa.sv * sb.sv AS cov_num
        FROM qq
        JOIN s sa ON qq.i = sa.i
        JOIN s sb ON qq.j = sb.i
        CROSS JOIN nn
    """


def _power_iteration_ctes(
    scale: int, d: int, iters: int, table: str, vec_col: str
) -> str:
    """The shared CTE chain: covariance → symmetric expansion →
    ``iters`` unrolled HUGEINT power-iteration rounds, ending with
    ``v{iters}(i, val)``."""
    cov = covariance_oracle_sql(scale, d, table, vec_col)
    parts = [
        f"WITH cov AS ({cov}),",
        "m AS (SELECT i, j, CAST(cov_num AS HUGEINT) AS val FROM cov"
        " UNION ALL"
        " SELECT j, i, CAST(cov_num AS HUGEINT) AS val FROM cov"
        " WHERE i <> j),",
        f"v0 AS (SELECT CAST(t.i AS INT) AS i, CAST(1 AS HUGEINT) AS val"
        f" FROM generate_series(1, {d}) t(i))",
    ]
    for r in range(1, iters + 1):
        parts.append(
            f", w{r} AS (SELECT m.j AS i, SUM(m.val * v{r-1}.val) AS w"
            f" FROM m JOIN v{r-1} ON m.i = v{r-1}.i GROUP BY 1)"
            f", x{r} AS (SELECT MAX(ABS(w)) AS mx FROM w{r})"
            f", v{r} AS (SELECT i, CASE WHEN w < 0"
            f" THEN -((-w * {_NORM}) // mx)"
            f" ELSE (w * {_NORM}) // mx END AS val FROM w{r}, x{r})"
        )
    return "\n".join(parts)


def top_component_oracle_sql(
    scale: int = 64, d: int = 64, iters: int = 6,
    table: str = "embeddings", vec_col: str = "embedding",
) -> str:
    """DuckDB mirror of :func:`pca_top_component`: the covariance CTE,
    the symmetric expansion, and ``iters`` UNROLLED power-iteration
    rounds in HUGEINT with the identical truncating renormalization."""
    return (
        _power_iteration_ctes(scale, d, iters, table, vec_col)
        + f"\nSELECT CAST(i AS INT) AS i, CAST(val AS BIGINT) AS loading"
        f" FROM v{iters}"
    )


def direction_scores_oracle_sql(
    scale: int = 64, d: int = 64, iters: int = 6, k: int = 100,
    table: str = "embeddings", vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    """DuckDB mirror of :func:`embedding_direction_scores`: the shared
    power-iteration CTEs, then each vector's exact integer dot product
    with the final loading vector, top-``k`` by |score|."""
    return (
        _power_iteration_ctes(scale, d, iters, table, vec_col)
        + f"""
        , scored AS (
            SELECT e.{id_col} AS {id_col},
                   SUM(CAST(floor(e.{vec_col}[v.i] * {scale}) AS BIGINT)
                       * CAST(v.val AS BIGINT)) AS dir_score
            FROM {table} e, v{iters} v
            GROUP BY 1)
        SELECT {id_col}, CAST(dir_score AS BIGINT) AS dir_score
        FROM scored
        ORDER BY abs(dir_score) DESC, {id_col}
        LIMIT {k}"""
    )
