"""Parallel-pair mining over embedding columns — mutual-nearest-
neighbor matching between two groups of vectors (north-star extension;
the similarity family's pairing face).

The published method this reproduces: margin/mutual-NN bitext mining
(Artetxe & Schwenk 2019, "Margin-based Parallel Corpus Mining with
Multilingual Sentence Embeddings") — to pair documents across two
sub-corpora (languages, snapshots, modalities), keep (a, b) iff b is
a's nearest cross-group neighbor AND a is b's: mutual top-1 by cosine.
Mutuality is the cheap high-precision filter that kills the hubness
false-positives a one-directional top-1 produces. The same primitive
pairs queries to cached answers, duplicates across two crawls, or
image embeddings to caption embeddings.

Scale shape: candidate generation is pluggable. The default
(``candidates=None``) scores EVERY cross pair — the exact baseline,
O(|A|·|B|) with the smaller side broadcast, the right call when one
side is a query batch or an eval set (the common mining setup: |B| ≪
|A|). At corpus × corpus scale pass ``candidates=`` the pair output of
the LSH machinery (``similarity.cosine_neardup_pairs`` both-group
variant or the banded index) — mutual-top-1-among-candidates is then
the standard ANN-mining compromise, and the two rank windows below
partition on each side's id over the candidate table only. Either
way, after scoring the plan is: two window passes over the PAIRS
table (shuffle keys id_a then id_b — ids and one double, never the
vectors) and a filter; vectors are read once per side.

Determinism/oracle contract: cosine uses the similarity module's
left-fold dot/norm (bit-identical to DuckDB ``list_reduce``); ranks
break ties (cosine DESC, other-side id ASC) so the mutual filter is
total-ordered; output is ``(id_a, id_b, cosine)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from flink_streaming_2_10_spark.pipeline.similarity import (
    DEFAULT_DIM,
    _dot_sql,
    _norm_sql,
)


def mutual_nn_pairs(
    df: DataFrame,
    group_col: str = "label",
    group_a: int = 0,
    group_b: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = DEFAULT_DIM,
    min_cosine: float | None = None,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """``(id_a, id_b, cosine)`` — every mutual cross-group top-1 pair:
    ``id_b`` is ``id_a``'s highest-cosine vector in group B and vice
    versa (ties by ascending other-side id). ``min_cosine`` drops weak
    mutuals after the rank filter (rank first, then threshold — the
    Artetxe & Schwenk order, so a pair is not promoted to rank 1 by
    the threshold removing a better rival). ``candidates`` (optional
    ``(id_a, id_b)`` DataFrame) restricts scoring to an ANN candidate
    set — see the module docstring.
    """
    # Zero-norm guard (ADVICE r11): 0/0 = NaN sorts ABOVE every real
    # cosine in DESC order on both engines, so an all-zeros embedding
    # would win rank 1 against every partner and crowd out legitimate
    # mutual pairs. Emit cosine 0.0 when either norm is 0 instead — a
    # zero vector then never beats any genuine similarity. Norms are
    # computed per SIDE before the pair join (O(|A|+|B|) norm work, not
    # O(|A|·|B|)); the per-pair expression is one dot product, one
    # multiply, one guarded divide.
    a = df.filter(F.col(group_col) == group_a).select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).cast("array<double>").alias("__va"),
    ).withColumn("__na", F.expr(_norm_sql("__va", dim)))
    b = df.filter(F.col(group_col) == group_b).select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).cast("array<double>").alias("__vb"),
    ).withColumn("__nb", F.expr(_norm_sql("__vb", dim)))
    if candidates is None:
        pairs = a.crossJoin(F.broadcast(b))
    else:
        pairs = (
            candidates.select("id_a", "id_b")
            .join(a, "id_a")
            .join(b, "id_b")
        )
    scored = pairs.select(
        "id_a",
        "id_b",
        F.when(
            (F.col("__na") == 0.0) | (F.col("__nb") == 0.0), F.lit(0.0)
        )
        .otherwise(
            F.expr(f"({_dot_sql('__va', '__vb', dim)})")
            / (F.col("__na") * F.col("__nb"))
        )
        .alias("cosine"),
    )
    wa = Window.partitionBy("id_a").orderBy(
        F.col("cosine").desc(), F.col("id_b").asc()
    )
    wb = Window.partitionBy("id_b").orderBy(
        F.col("cosine").desc(), F.col("id_a").asc()
    )
    mutual = (
        scored.withColumn("__ra", F.row_number().over(wa))
        .withColumn("__rb", F.row_number().over(wb))
        .filter((F.col("__ra") == 1) & (F.col("__rb") == 1))
        .select("id_a", "id_b", "cosine")
    )
    if min_cosine is not None:
        mutual = mutual.filter(F.col("cosine") >= float(min_cosine))
    return mutual
