"""Train/held-out split leakage audit (north-star extension): which
held-out documents share winnowing fingerprints with the training
split — the standard pre-training hygiene check that a random document
split did NOT leak near-identical text across the train/test boundary
(deduplication's blind spot: splits are drawn AFTER dedup thresholds,
so sub-threshold overlap still leaks).

Composes two existing scan-side faces with NO new corpus-scale work:

* :func:`pipeline.sampling.holdout_label` — the split label is a pure
  hash expression of the id, attached in the SAME projection that
  winnows (no join against a split table);
* :func:`pipeline.winnow.winnow_selected` — the MOSS fingerprint set,
  whose w+k−1 guarantee makes "shares a fingerprint" ≈ "shares a token
  run of at least w+k−1" (here 6 tokens by default).

Plan shape: one corpus scan → explode the selected fingerprints
(narrow rows: one 60-bit long + id + split — text never leaves the
scan), ONE exchange on the fingerprint. The boilerplate guard (drop
fingerprints present in more than ``max_fp_df`` documents — shared
startup text is not leakage) is a window count over the SAME
fingerprint partitioning the train×test join shuffles on anyway, so it
rides that exchange (the ``minhash_lsh_candidates`` hot-bucket trick).
The join itself is posting-list × posting-list per fingerprint, output
bounded by the df cap (≤ cap² rows per fingerprint); the final per-doc
distinct-count agg is keyed on the held-out doc id.

At 100 TB: corpus-linear scan + fingerprint-keyed shuffle of id pairs,
exactly the cross-doc dedup cost model — no all-pairs, no text
movement, deterministic cap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from flink_streaming_2_10_spark.pipeline.sampling import (
    holdout_label,
    holdout_label_sql,
)
from flink_streaming_2_10_spark.pipeline.winnow import (
    winnow_selected,
    winnow_selected_oracle_ctes,
)

#: Fingerprints present in more docs than this are treated as corpus
#: boilerplate, not leakage evidence, and dropped whole (deterministic,
#: oracle-mirrored — the max_df / max_bucket_size family trade).
DEFAULT_MAX_FP_DF = 100


def holdout_leakage(
    df: DataFrame,
    fractions: dict[str, float] | None = None,
    train_split: str = "train",
    test_split: str = "test",
    k: int = 3,
    w: int = 4,
    max_fp_df: int = DEFAULT_MAX_FP_DF,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "split",
) -> DataFrame:
    """``(doc_id, n_train_sharers, n_shared_fps)`` — one row per
    HELD-OUT document that shares ≥1 surviving winnow fingerprint with
    ≥1 training document: how many distinct training docs it overlaps
    and on how many distinct fingerprints. Clean splits return 0 rows.
    """
    if fractions is None:
        fractions = {"train": 0.9, "test": 0.1}
    if train_split not in fractions or test_split not in fractions:
        raise ValueError("train_split/test_split must be in fractions")
    from flink_streaming_2_10_spark.pipeline.caching import tracked_persist

    # Persisted BELOW the explode — a materialization barrier between
    # the winnow HOF chain and the Generate. Without it Spark's
    # generator rewrite re-evaluates the whole k-gram/window-min
    # expression per EXPLODED row, not per document (measured ~20×
    # slower at sf0.01). The cached projection is narrow: id + split +
    # the selected-fingerprint longs (~2/(w+1) of the gram count), no
    # text.
    sel = tracked_persist(
        winnow_selected(df, k=k, w=w, id_col=id_col, text_col=text_col)
        .select(
            F.col(id_col).alias("doc_id"),
            holdout_label(F.col(id_col), fractions, salt).alias("split"),
            F.col("sel"),
        )
    )
    posts = sel.select("doc_id", "split", F.explode("sel").alias("fp"))
    dfw = Window.partitionBy("fp")
    kept = (
        posts.withColumn("__df", F.count(F.lit(1)).over(dfw))
        .filter(F.col("__df") <= max_fp_df)
        .drop("__df")
    )
    train = kept.filter(F.col("split") == train_split).select(
        "fp", F.col("doc_id").alias("train_doc")
    )
    test = kept.filter(F.col("split") == test_split).select("fp", "doc_id")
    return (
        test.join(train, "fp")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("train_doc").alias("n_train_sharers"),
            F.countDistinct("fp").alias("n_shared_fps"),
        )
    )


def holdout_leakage_oracle_sql(
    fractions: dict[str, float] | None = None,
    train_split: str = "train",
    test_split: str = "test",
    k: int = 3,
    w: int = 4,
    max_fp_df: int = DEFAULT_MAX_FP_DF,
    salt: str = "split",
) -> str:
    """DuckDB mirror of :func:`holdout_leakage` on the ``documents``
    view — same split CASE, same winnow CTEs, same df cap, same
    distinct counts."""
    if fractions is None:
        fractions = {"train": 0.9, "test": 0.1}
    label = holdout_label_sql("doc_id", fractions, salt)
    return f"""
        WITH {winnow_selected_oracle_ctes(k, w, "documents")},
        posts AS (SELECT s.doc_id, {label} AS split, u.fp
                  FROM sel s, unnest(s.sel) AS u(fp)),
        kept AS (SELECT * FROM
                   (SELECT *, COUNT(*) OVER (PARTITION BY fp) AS dfc
                    FROM posts)
                 WHERE dfc <= {int(max_fp_df)})
        SELECT t.doc_id,
               CAST(COUNT(DISTINCT tr.doc_id) AS BIGINT) AS n_train_sharers,
               CAST(COUNT(DISTINCT t.fp) AS BIGINT) AS n_shared_fps
        FROM kept t JOIN kept tr ON tr.fp = t.fp
        WHERE t.split = '{test_split}' AND tr.split = '{train_split}'
        GROUP BY t.doc_id"""
