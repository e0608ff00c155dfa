"""Class-centroid operators over embedding columns (north-star
extensions): nearest-centroid (prototype) classification and per-class
hard-negative mining — the label-supervised faces of the similarity /
clustering family (reference parity: beyond-reference training-data
ops; the reference has no embedding surface at all).

Both operators share the fixed-point arithmetic contract of
``pipeline.clustering`` (see its module docstring for why): points
quantize ONCE with the half-up ``round(x · SCALE)`` convention,
per-class centroids are exact ``floor(sum / count)`` integer vectors
computed with Python floor division, distances are exact integer
``Σ (q_i − c_i)²``, and all rankings are (distance, id) total orders —
so a DuckDB oracle replays every output bit-for-bit.

Scale shape (the same as ``kmeans_fixed_point``): centroids are DRIVER
state — C·dim longs, one per class, bounded and tiny — so

* the centroid build is ONE corpus scan + one C-group aggregation with
  map-side partials (C·dim cells of partial state per task);
* ``nearest_centroid_confusion`` is then one more scan evaluating the
  argmin as a literal expression (no join, no shuffle of points) and a
  C²-cell confusion aggregation — points never move;
* ``hard_negatives`` explodes each point into its C−1 imposter
  candidacies (narrow rows: ids + one long) and ranks per class with a
  rank window — Spark's WindowGroupLimit keeps at most ``k`` rows per
  class per partition before the single exchange, so the shuffle
  carries O(k·C·partitions) rows, not the C×corpus blow-up the naive
  plan would.

At 100 TB: both are scan-bound; the only grouped state is C·dim / C² /
k·C cells. No all-pairs anything.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F, Window

from flink_streaming_2_10_spark.pipeline.clustering import (
    _dist2,
    quantize_fixed,
)


def label_centroids(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> list[tuple[int, list[int]]]:
    """Exact integer per-class centroids ``[(label, floor-mean qvec)]``,
    ascending label — C·dim longs of driver state (the MLlib
    NaiveBayes/KMeans "small model, big data" shape).

    One scan, one C-group aggregation; components are
    ``sum // count`` in Python integers (exact at any magnitude — see
    ``kmeans_fixed_point`` for why not a double quotient).

    An EMPTY corpus yields ``[]`` — no classes, no centroids — so both
    consumers below return zero rows, exactly as their DuckDB oracles
    do (the r17 degenerate-input sweep found the previous
    ``ValueError`` raise diverging from the oracle's empty result).
    """
    pts = df.select(
        F.col(label_col).alias("label"), quantize_fixed(df, vec_col).alias("q")
    )
    head = pts.select(F.size("q").alias("d")).limit(1).collect()
    if not head:
        return []
    dim = head[0]["d"]
    agg = pts.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(F.element_at("q", i + 1)).alias(f"s{i}") for i in range(dim)],
    )
    # NULL is a class like any other (GROUP BY keeps it — both engines);
    # it sorts LAST, mirroring DuckDB's ASC NULLS LAST (r18 nullkey
    # sweep: the bare key crashed on None < int).
    return [
        (r["label"], [r[f"s{i}"] // r["n"] for i in range(dim)])
        for r in sorted(
            agg.collect(),
            key=lambda r: (r["label"] is None, r["label"] or 0),
        )
    ]


def _assign_labeled(
    q_col: str, centroids: list[tuple[int, list[int]]]
) -> Column:
    """Struct argmin over labeled centroid literals: exact
    (distance, label) total order — ties break on the smallest label,
    with a NULL label losing every tie (``__null`` ordering field —
    DuckDB's ORDER BY d, lab ASC puts NULLS LAST, and Spark's struct
    comparison would put the NULL field FIRST; r18 nullkey sweep)."""
    return F.array_min(
        F.array(
            *[
                F.struct(
                    _dist2(q_col, c).alias("d"),
                    F.lit(1 if lab is None else 0).alias("__null"),
                    F.lit(0 if lab is None else int(lab)).alias("__key"),
                    F.lit(None if lab is None else int(lab))
                    .cast("int")
                    .alias("lab"),
                )
                for lab, c in centroids
            ]
        )
    )


def nearest_centroid_confusion(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Nearest-centroid (Rocchio) self-classification confusion matrix:
    ``(label, assigned, n_vecs, sum_dist2)`` — the standard cheap probe
    of embedding-space class separability (diagonal mass = how well
    class prototypes explain the points).

    Two corpus scans total (centroid build + assignment — the argmin is
    a literal expression, no join), then a ≤C²-group aggregation.
    ``sum_dist2`` is an exact integer sum of exact integer distances.
    """
    cents = label_centroids(df, id_col, vec_col, label_col)
    if not cents:
        # Empty corpus: zero rows, contract schema (oracle parity).
        return df.select(
            F.col(label_col).cast("int").alias("label"),
            F.lit(None).cast("int").alias("assigned"),
            F.lit(None).cast("long").alias("n_vecs"),
            F.lit(None).cast("long").alias("sum_dist2"),
        )
    pts = df.select(
        F.col(label_col).cast("int").alias("label"),
        quantize_fixed(df, vec_col).alias("q"),
    )
    assigned = pts.select(
        "label", _assign_labeled("q", cents).alias("a")
    ).select("label", F.col("a")["lab"].alias("assigned"), F.col("a")["d"].alias("d"))
    return (
        assigned.groupBy("label", "assigned")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum("d").alias("sum_dist2"),
        )
        .select(
            "label",
            "assigned",
            "n_vecs",
            F.col("sum_dist2").cast("long").alias("sum_dist2"),
        )
    )


def hard_negatives(
    df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Per-class hard-negative mining: for every class prototype, the
    ``k`` nearest vectors whose OWN label differs —
    ``(centroid_label, vec_id, label, dist2, rnk)`` — the contrastive-
    training candidate generator (imposters closest to the class
    centroid are the informative negatives).

    Plan: centroid build (scan + C-group agg), then one scan that
    emits each point's C−1 imposter candidacies from a literal struct
    array (narrow: two ids + one long per row — text/vectors never
    leave the scan), and a rank window per class. WindowGroupLimit
    caps every partition at ``k`` rows per class before the exchange.
    Deterministic: (dist2, vec_id) ascending, rank gaps impossible
    since vec_id is unique.
    """
    cents = label_centroids(df, id_col, vec_col, label_col)
    # All-NULL labels reduce to the empty case too: the only centroid
    # is the NULL class, which the three-valued filter below can never
    # match — and a zero-branch literal array would be VOID-typed.
    if not any(lab is not None for lab, _ in cents):
        # Empty corpus: zero rows, contract schema (oracle parity).
        return df.select(
            F.lit(None).cast("int").alias("centroid_label"),
            F.col(id_col).alias("vec_id"),
            F.col(label_col).cast("int").alias("label"),
            F.lit(None).cast("long").alias("dist2"),
            F.lit(None).cast("int").alias("rnk"),
        ).filter(F.lit(False))
    pts = df.select(
        F.col(id_col).alias("vec_id"),
        F.col(label_col).cast("int").alias("label"),
        quantize_fixed(df, vec_col).alias("q"),
    )
    # A NULL-label centroid is skipped outright: the oracle's
    # `WHERE p.label <> c.lab` is three-valued, so NULL <> anything is
    # never TRUE — the NULL class can mine no negatives (and NULL-label
    # POINTS are dropped by the same filter below, where
    # centroid_label != NULL evaluates to NULL). r18 nullkey sweep.
    cand = F.filter(
        F.array(
            *[
                F.struct(
                    F.lit(int(lab)).alias("centroid_label"),
                    _dist2("q", c).alias("dist2"),
                )
                for lab, c in cents
                if lab is not None
            ]
        ),
        lambda s: s["centroid_label"] != F.col("label"),
    )
    exploded = pts.select(
        "vec_id", "label", F.explode(cand).alias("c")
    ).select(
        F.col("c")["centroid_label"].alias("centroid_label"),
        "vec_id",
        "label",
        F.col("c")["dist2"].alias("dist2"),
    )
    w = Window.partitionBy("centroid_label").orderBy(
        F.col("dist2").asc(), F.col("vec_id").asc()
    )
    return (
        exploded.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("centroid_label", "vec_id", "label", "dist2", "rnk")
    )


# ---------------------------------------------------------------------------
# DuckDB oracles — expression-for-expression mirrors (same half-up
# quantization, same floor-division centroid with the toward-zero //
# adjustment the kmeans oracle documents, same total orders).
# ---------------------------------------------------------------------------

def _centroid_ctes(dim: int, scale: int) -> str:
    return f"""
        pts AS (SELECT vec_id, label,
                       list_transform(embedding, x ->
                         CAST(floor(CAST(x AS DOUBLE) * {scale}.0 + 0.5)
                              AS BIGINT)) AS q
                FROM embeddings),
        idx AS (SELECT unnest(range(1, {dim + 1})) AS i),
        sums AS (SELECT p.label AS lab, x.i AS i,
                        SUM(p.q[x.i]) AS s, COUNT(*) AS n
                 FROM pts p CROSS JOIN idx x
                 GROUP BY p.label, x.i),
        cent AS (SELECT lab,
                        list(CASE WHEN s >= 0 OR s % n = 0 THEN s // n
                                  ELSE s // n - 1 END ORDER BY i) AS c
                 FROM sums GROUP BY lab)"""


def _dist2_sql(dim: int) -> str:
    return (
        f"list_reduce(list_transform(range(1, {dim + 1}), "
        f"i -> (p.q[i] - c.c[i]) * (p.q[i] - c.c[i])), "
        f"(a, v) -> a + v)"
    )


def confusion_oracle_sql(dim: int = 64, scale: int = 10_000) -> str:
    """DuckDB mirror of :func:`nearest_centroid_confusion`."""
    return f"""
        WITH {_centroid_ctes(dim, scale)},
        asg AS (SELECT p.vec_id, p.label, c.lab AS assigned,
                       {_dist2_sql(dim)} AS d
                FROM pts p CROSS JOIN cent c
                QUALIFY ROW_NUMBER() OVER (PARTITION BY p.vec_id
                                           ORDER BY d, c.lab) = 1)
        SELECT CAST(label AS INT) AS label,
               CAST(assigned AS INT) AS assigned,
               CAST(COUNT(*) AS BIGINT) AS n_vecs,
               CAST(SUM(d) AS BIGINT) AS sum_dist2
        FROM asg GROUP BY label, assigned"""


def hard_negatives_oracle_sql(
    k: int = 5, dim: int = 64, scale: int = 10_000
) -> str:
    """DuckDB mirror of :func:`hard_negatives`."""
    return f"""
        WITH {_centroid_ctes(dim, scale)}
        SELECT CAST(c.lab AS INT) AS centroid_label,
               p.vec_id,
               CAST(p.label AS INT) AS label,
               CAST({_dist2_sql(dim)} AS BIGINT) AS dist2,
               CAST(ROW_NUMBER() OVER (PARTITION BY c.lab
                                       ORDER BY {_dist2_sql(dim)},
                                                p.vec_id) AS INT) AS rnk
        FROM pts p CROSS JOIN cent c
        WHERE p.label <> c.lab
        QUALIFY rnk <= {int(k)}"""
