"""Bigram LM typicality (pipeline/lm.py): hand-computed exact scores,
the per-prefix probability simplex property, short-doc coverage, and
external-reference-model scoring with unseen bigrams."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_streaming_2_10_spark.pipeline.caching import release_cached
from flink_streaming_2_10_spark.pipeline.lm import (
    bigram_lm_scores,
    train_bigram_counts,
)


def test_hand_computed_scores(spark):
    # Corpus bigrams: (a,b)x2 (b,a)x1 (b,c)x1  →  prefix counts:
    # a:2, b:2.  p(b|a)=1.0  p(a|b)=0.5  p(c|b)=0.5
    docs = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a b")], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["lm_score"])
        for r in bigram_lm_scores(docs).collect()
    }
    release_cached()
    # doc 1: p = [1.0 (a,b), 0.5 (b,a), 1.0 (a,b), 0.5 (b,c)] → 3.0/4
    assert got[1] == (4, 0.75)
    # doc 2: p = [1.0] → 1.0
    assert got[2] == (1, 1.0)


def test_prefix_probabilities_form_a_simplex(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            ["the cat sat on the mat", "the dog sat on a log",
             "a cat and a dog", "the mat and the log"])],
        ["doc_id", "text"],
    )
    model = train_bigram_counts(docs)
    sums = (
        model.select("w1", (F.col("c_bigram") / F.col("c_unigram")).alias("p"))
        .groupBy("w1")
        .agg(F.sum("p").alias("total"))
        .collect()
    )
    release_cached()
    assert sums and all(abs(r["total"] - 1.0) < 1e-12 for r in sums)


def test_short_docs_covered_with_zero_score(spark):
    docs = spark.createDataFrame(
        [(1, "hello world again"), (2, "single"), (3, "")],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["lm_score"])
        for r in bigram_lm_scores(docs).collect()
    }
    release_cached()
    assert set(got) == {1, 2, 3}
    assert got[2] == (0, 0.0) and got[3] == (0, 0.0)
    assert got[1][0] == 2


def test_external_reference_model_and_unseen_bigrams(spark):
    ref = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "the cat ran off")],
        ["doc_id", "text"],
    )
    model = train_bigram_counts(ref)
    probe = spark.createDataFrame(
        # "the cat" seen (p(cat|the)=2/3); "cat xyz" unseen → 0;
        # "xyz qux" w1 not even in vocab → 0.
        [(10, "the cat xyz qux")],
        ["doc_id", "text"],
    )
    got = bigram_lm_scores(probe, model=model).collect()[0]
    release_cached()
    assert got["n_bigrams"] == 3
    assert abs(got["lm_score"] - (2 / 3) / 3) < 1e-15


def test_gibberish_scores_below_typical_text(spark):
    rows = [(i, "the quick brown fox jumps over the lazy dog") for i in
            range(10)]
    rows.append((100, "zqx vbn mkl pqw uio zqx asd"))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r["lm_score"] for r in bigram_lm_scores(docs).collect()
    }
    release_cached()
    assert got[100] < min(got[i] for i in range(10))
