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


def _fold_sum(arr: Column) -> Column:
    """Left-fold sum of an array<double> — order-fixed, oracle-exact."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def _dot(a: Column, b: Column) -> Column:
    return _fold_sum(F.zip_with(a, b, lambda x, y: x * y))


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
    """Integer bucket id: bit p set iff fold-sum(vec · plane_p) > 0."""
    bucket = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        w = F.array(*[F.lit(float(x)) for x in plane])
        proj = _dot(vec, w)
        bucket = bucket + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def with_buckets(
    df: DataFrame,
    weights: list[list[list[int]]],
    vec_col: str = "embedding",
    prefix: str = "b",
) -> DataFrame:
    """Attach one bucket column per hash table (narrow map, no shuffle)."""
    vec = _as_double(F.col(vec_col))
    out = df
    for t, planes in enumerate(weights):
        out = out.withColumn(f"{prefix}{t}", _bucket(vec, planes))
    return out


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
    data = with_buckets(df, weights, vec_col)
    banded = data.select(
        F.col(id_col),
        F.col(vec_col),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(t).alias("t"), F.col(f"b{t}").alias("bkt"))
                    for t in range(num_tables)
                ]
            )
        ).alias("tb"),
    ).select(id_col, vec_col, "tb.t", "tb.bkt")
    left = banded.select(
        "t", "bkt", F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")
    )
    right = banded.select(
        "t", "bkt", F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")
    )
    cands = (
        left.join(right, ["t", "bkt"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "va", "vb")
        .distinct()
    )
    a = _as_double(F.col("va"))
    b = _as_double(F.col("vb"))
    cos = _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))
    return (
        cands.withColumn("cosine", cos)
        .filter(F.col("cosine") >= F.lit(threshold))
        .select("id_a", "id_b", "cosine")
    )
