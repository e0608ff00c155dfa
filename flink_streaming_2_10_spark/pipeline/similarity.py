"""Similarity search over embedding columns (``array<float>``).

North-star extension (BASELINE.json): approximate-nearest-neighbor and
all-pairs similarity for training-data pipelines. Spark-first design:

* ``cosine_topk`` — brute-force exact top-k: one scan, per-row O(d)
  column-expression math (no Python), then ``orderBy(...).limit(k)`` which
  Spark executes as TakeOrderedAndProject (per-partition heap + driver
  merge of k rows — no global sort, no full shuffle). At 100 TB this is
  the bandwidth-bound baseline every ANN variant is judged against.
* ``ann_hyperplane_topk`` — random-hyperplane (SimHash-for-cosine) LSH:
  L independent tables × P sign bits; a vector's bucket in each table is
  the integer of its P sign bits. Candidates = rows sharing the query's
  bucket in ≥1 table (union + distinct), re-ranked by exact cosine.
  Bucketing is a narrow map (no shuffle); the candidate filter is a
  broadcast of L bucket ids; only candidates pay the exact-cosine cost.
* ``cosine_neardup_pairs`` — all-pairs flavour: bucket self-join per table
  (shuffle key = (table, bucket)) → distinct candidate pairs → exact
  cosine ≥ threshold verify. The embedding-cosine member of the dedup
  family (pipeline/dedup.py has the text-hash members).

Determinism contract: every float reduction is an explicit LEFT FOLD over
the array (Spark ``aggregate``; DuckDB ``list_reduce``), so dot products
and norms are bit-identical across engines and runs — which is what lets
the driver value-hash these queries. Hyperplane weights are ±1 literals
derived from a seeded md5 in plain Python (no engine hash involved), so
both engines plan against identical constant vectors.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.storagelevel import StorageLevel


def hyperplane_weights(
    num_tables: int, num_planes: int, dim: int, seed: int = 42
) -> list[list[list[int]]]:
    """Deterministic ±1 hyperplane weights: w[table][plane][dim_i].

    md5-seeded so any engine (and the DuckDB oracle) can reproduce them as
    plain literals; ±1 keeps the projection a sum/subtract — no multiplies
    needed in principle, and exact in IEEE arithmetic in any order.
    """
    out = []
    for t in range(num_tables):
        planes = []
        for p in range(num_planes):
            row = []
            for i in range(dim):
                h = hashlib.md5(f"{seed}:{t}:{p}:{i}".encode()).digest()
                row.append(1 if h[0] & 1 else -1)
            planes.append(row)
        out.append(planes)
    return out


#: Fixed embedding dimensionality of the explicit-index expressions. The
#: testdata embeddings are 64-wide; operators take ``dim`` so other widths
#: just pass it through.
DEFAULT_DIM = 64


def _dot(a: Column, b: Column, dim: int = DEFAULT_DIM) -> Column:
    """Dot product as an EXPLICIT left-associated sum of per-index
    products. Semantically identical to the zip_with/aggregate fold (the
    zero init collapses: 0.0 + t1 == t1), but higher-order array lambdas
    are CodegenFallback in Spark — interpreted per element — while this
    expression tree stays inside whole-stage codegen, ~an order of
    magnitude faster on million-row candidate sets. Left association
    keeps the IEEE result bit-identical to DuckDB's list_reduce oracle."""
    terms = [
        F.element_at(a, i + 1) * F.element_at(b, i + 1) for i in range(dim)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def _dot_weights(a: Column, weights: list[int]) -> Column:
    """Σ a[i]·w[i] for a ±1 literal weight vector, as a zip_with/aggregate
    fold. Interpreted (HOF = CodegenFallback), but the tree is tiny:
    bucket columns are evaluated once per INPUT row (n), not per candidate
    pair (n²-ish), so interpretation cost is negligible while an explicit
    64-term expansion per plane (L×P×d nodes) costs tens of seconds of
    driver-side analysis before any task runs. The candidate-pair cosine
    (_dot) makes the opposite trade. Fold order matches the oracle."""
    w = F.array(*[F.lit(float(x)) for x in weights])
    return F.aggregate(
        F.zip_with(a, w, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _as_double(col: Column) -> Column:
    return col.cast("array<double>")


def with_cosine(
    df: DataFrame,
    query: DataFrame,
    vec_col: str = "embedding",
    query_vec_col: str = "qvec",
) -> DataFrame:
    """Attach ``cosine`` = cos(df.vec_col, query.query_vec_col) via a
    broadcast cross join of the (single-row) query side."""
    joined = df.crossJoin(F.broadcast(query))
    a = _as_double(F.col(vec_col))
    b = _as_double(F.col(query_vec_col))
    cos = _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))
    return joined.withColumn("cosine", cos).drop(query_vec_col)


def query_vector(df: DataFrame, query_id: int, id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """One-row DataFrame holding the query embedding (column ``qvec``)."""
    return df.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("qvec")
    )


def cosine_topk(
    df: DataFrame,
    query_id: int,
    k: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    extra_cols: tuple[str, ...] = ("label",),
) -> DataFrame:
    """Exact brute-force cosine top-k against the embedding of
    ``query_id``. Deterministic: ties broken by ascending id."""
    q = query_vector(df, query_id, id_col, vec_col)
    scored = with_cosine(df, q, vec_col)
    return (
        scored.select(id_col, *extra_cols, "cosine")
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def _bucket(vec: Column, planes: list[list[int]]) -> Column:
    """Integer bucket id: bit p set iff Σ vec·plane_p > 0 (explicit-index
    codegen projection, see _dot_weights)."""
    bucket = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        proj = _dot_weights(vec, plane)
        bucket = bucket + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def with_buckets(
    df: DataFrame,
    weights: list[list[list[int]]],
    vec_col: str = "embedding",
    prefix: str = "b",
) -> DataFrame:
    """Attach one bucket column per hash table (narrow map, no shuffle).

    Single ``select`` rather than chained ``withColumn`` — each withColumn
    re-analyzes the whole plan, which at L×P×d expression nodes costs
    seconds of driver time before the first task runs."""
    vec = _as_double(F.col(vec_col))
    buckets = [
        _bucket(vec, planes).alias(f"{prefix}{t}")
        for t, planes in enumerate(weights)
    ]
    return df.select("*", *buckets)


def ann_hyperplane_topk(
    df: DataFrame,
    query_id: int,
    k: int = 100,
    num_tables: int = 8,
    num_planes: int = 6,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    extra_cols: tuple[str, ...] = ("label",),
) -> DataFrame:
    """ANN top-k: hyperplane-LSH candidate generation + exact re-rank.

    The scale path: bucket assignment is embarrassingly parallel; the
    query's L buckets broadcast to every partition, so candidate selection
    is a scan-local filter — the exact-cosine re-rank touches only the
    (expected near-linear) candidate set. Recall < 1 by design; measured
    against ``cosine_topk`` in tests.
    """
    weights = hyperplane_weights(num_tables, num_planes, dim, seed)
    data = with_buckets(df, weights, vec_col)
    qrow = with_buckets(
        df.filter(F.col(id_col) == query_id), weights, vec_col
    ).select(
        F.col(vec_col).alias("qvec"),
        *[F.col(f"b{t}").alias(f"qb{t}") for t in range(num_tables)],
    )
    joined = data.crossJoin(F.broadcast(qrow))
    match_any = None
    for t in range(num_tables):
        m = F.col(f"b{t}") == F.col(f"qb{t}")
        match_any = m if match_any is None else (match_any | m)
    cands = joined.filter(match_any)
    a = _as_double(F.col(vec_col))
    b = _as_double(F.col("qvec"))
    cos = _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))
    return (
        cands.withColumn("cosine", cos)
        .select(id_col, *extra_cols, "cosine")
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def cosine_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.4,
    num_tables: int = 8,
    num_planes: int = 6,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All-pairs embedding near-dups: LSH bucket self-join per table →
    distinct candidate pairs → exact-cosine verify ≥ threshold.

    Shuffle key is (table, bucket); with P planes the expected bucket
    occupancy is n/2^P per table, keeping the self-join near-linear.
    Returns (id_a, id_b, cosine) with id_a < id_b.
    """
    weights = hyperplane_weights(num_tables, num_planes, dim, seed)
    data = with_buckets(df, weights, vec_col).persist(StorageLevel.MEMORY_AND_DISK)
    banded = data.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(t).alias("t"), F.col(f"b{t}").alias("bkt"))
                    for t in range(num_tables)
                ]
            )
        ).alias("tb"),
    ).select(id_col, "tb.t", "tb.bkt")
    left = banded.select("t", "bkt", F.col(id_col).alias("id_a"))
    right = banded.select("t", "bkt", F.col(id_col).alias("id_b"))
    # Candidate pairs carry only the two ids through the dedup shuffle
    # (16 bytes/row, not 2 embeddings); vectors re-attach via joins against
    # the cached bucketed table afterwards.
    cands = (
        left.join(right, ["t", "bkt"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = data.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = data.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    paired = cands.join(va, ["id_a"]).join(vb, ["id_b"])
    a = _as_double(F.col("va"))
    b = _as_double(F.col("vb"))
    cos = _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))
    return (
        paired.withColumn("cosine", cos)
        .filter(F.col("cosine") >= F.lit(threshold))
        .select("id_a", "id_b", "cosine")
    )
