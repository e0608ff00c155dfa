"""In-engine trained multi-class text classifier — hashed-gram
class-affinity (Naive-Bayes-flavored), the trainable counterpart of
``classifier.py``'s fixed-weight inference face (north-star extension;
tokenizer lineage WordCount.java:106-122).

``classifier.py`` applies an EXTERNALLY trained weight vector and says
so ("training the weights is an offline job"). This module removes
that dependency for the classic curation classifiers (CCNet's fastText
language ID, quality-vs-reference discrimination): the model IS a set
of per-class hashed-gram count tables, trained by the same engine in
one bounded aggregation per class, and applied scan-locally.

Method: per class c with count table cnt_c and total t_c, a document's
affinity is the MEAN per-gram Laplace-smoothed class probability

    score_c(d) = (1/n) Σᵢ (cnt_c(bᵢ) + 1) / (t_c + B)

over the document's gram buckets bᵢ. True multinomial NB multiplies
these terms (Σ log) — logs differ in the last ulp across math
libraries (the lm.py hazard), so this uses the mean as the log-free
surrogate: same per-term quantity, monotone in the same direction,
each term ONE division of two exact longs, summed in fixed position
order. Prediction = argmax over classes, FIRST class on ties in
ascending label order (total-ordered, oracle-identical).

Scale shape:

1. training = one bounded hash aggregation per class (output ≤ B rows
   each — corpus-size-independent, the dsir trick), collected as
   K·B longs of driver state;
2. scoring = ONE scan-local pass: bucket array hashed once per gram,
   K literal-array folds per row, argmax via a first-on-tie fold —
   no joins, no shuffles, nothing corpus-scale moves;
3. evaluation = one tiny keyed aggregation over (true label,
   predicted).

Because the count tables ride the plan as literals, the same
``classify_with_model`` call scores batch or streaming inputs (the
dsir model-face property).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from flink_streaming_2_10_spark.pipeline.dsir import (
    _bucket_sql,
    _exploded_grams,
    _with_grams,
)


def affinity_model(
    df: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    n: int = 1,
    num_buckets: int = 2048,
    hasher: str = "xxhash64",
) -> dict:
    """Train the per-class count tables: ``{"classes": [(label,
    counts, total), ...] sorted by label, "n": n, "num_buckets": B,
    "hasher": h}``. ONE corpus scan trains every class — a single
    (label, bucket)-keyed aggregation whose output is bounded at
    |classes|·B rows regardless of corpus size; the collect is that
    bounded table (K·B longs of driver state)."""
    B = int(num_buckets)
    # _exploded_grams carries one id-like column; the label rides it.
    rows = (
        _exploded_grams(df, label_col, text_col, n)
        .select(
            F.col("doc_id").alias("__lab"),
            F.expr(_bucket_sql("__g", B, hasher)).alias("b"),
        )
        .groupBy("__lab", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    by_label: dict[str, list[int]] = {}
    for r in rows:
        lab = r["__lab"]
        if lab is None:
            continue
        by_label.setdefault(lab, [0] * B)[r["b"]] = r["c"]
    classes = [
        (lab, counts, int(sum(counts)))
        for lab, counts in sorted(by_label.items())
    ]
    return {
        "classes": classes,
        "n": int(n),
        "num_buckets": B,
        "hasher": hasher,
    }


def classify_with_model(
    df: DataFrame,
    model: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(doc_id, n_grams, predicted, score)`` — argmax class affinity
    per document (first class in ascending label order on ties; a
    gramless document scores 0.0 everywhere and predicts the first
    label). Scan-local; see the module docstring."""
    n, B, hasher = model["n"], model["num_buckets"], model["hasher"]
    buckets = F.expr(
        f"transform(__grams, g -> {_bucket_sql('g', B, hasher)})"
    )
    if not model["classes"]:
        # A model trained on an EMPTY corpus has no classes: every
        # prediction is NULL (over an empty apply set this is zero
        # rows, matching the oracle — r17 degenerate-input sweep; the
        # previous code built `element_at(array(), 1)`, a VOID-typed
        # struct whose field extraction fails analysis).
        return _with_grams(df, id_col, text_col, n).select(
            "doc_id",
            F.expr("size(__grams)").cast("long").alias("n_grams"),
            F.lit(None).cast("string").alias("predicted"),
            F.lit(None).cast("double").alias("score"),
        )

    def lit_arr(xs: list) -> str:
        return "array(" + ", ".join(f"{int(x)}L" for x in xs) + ")"

    score_exprs = []
    for lab, counts, total in model["classes"]:
        fold = (
            f"aggregate(__buckets, cast(0.0 as double), (acc, b) -> acc"
            f" + cast(element_at({lit_arr(counts)}, b + 1) + 1L as double)"
            f" / cast({int(total) + B}L as double))"
        )
        lab_sql = lab.replace("'", "''")
        score_exprs.append(
            f"struct(CASE WHEN size(__buckets) > 0 THEN ({fold}) / "
            f"cast(size(__buckets) as double) ELSE 0.0D END AS s, "
            f"'{lab_sql}' AS lab)"
        )
    # Scores projected ONCE per row, then a first-on-tie argmax fold in
    # ascending-label array order over the projected column (slicing
    # the raw array expression instead would re-evaluate every fold).
    arr = "array(" + ", ".join(score_exprs) + ")"
    best = (
        "aggregate(slice(__scores, 2, size(__scores) - 1), "
        "element_at(__scores, 1), "
        "(best, x) -> CASE WHEN x.s > best.s THEN x ELSE best END)"
        if len(score_exprs) > 1
        else "element_at(__scores, 1)"
    )
    return (
        _with_grams(df, id_col, text_col, n)
        .select("doc_id", buckets.alias("__buckets"))
        .select(
            "doc_id",
            F.size("__buckets").cast("long").alias("n_grams"),
            F.expr(arr).alias("__scores"),
        )
        .select(
            "doc_id",
            "n_grams",
            F.expr(best).alias("__best"),
        )
        .select(
            "doc_id",
            "n_grams",
            F.col("__best.lab").alias("predicted"),
            F.col("__best.s").alias("score"),
        )
    )


def classification_report(
    df: DataFrame,
    predictions: DataFrame,
    label_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """``(lang, n_docs, n_correct, accuracy)`` per TRUE class — the
    evaluation face; one small keyed aggregation, exact-long division."""
    joined = df.select(
        F.col(id_col).alias("doc_id"), F.col(label_col).alias("lang")
    ).join(predictions.select("doc_id", "predicted"), "doc_id")
    agg = joined.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.when(F.col("predicted") == F.col("lang"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_correct"),
    )
    return agg.select(
        "lang",
        "n_docs",
        "n_correct",
        (
            F.col("n_correct").cast("double")
            / F.col("n_docs").cast("double")
        ).alias("accuracy"),
    )
