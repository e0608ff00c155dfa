"""In-engine hashed-gram class-affinity classifier
(pipeline/nbaffinity.py)."""

from __future__ import annotations

import pytest

from flink_streaming_2_10_spark.pipeline.nbaffinity import (
    affinity_model,
    classification_report,
    classify_with_model,
)

TRAIN = [
    (1, "der hund läuft schnell durch den wald", "de"),
    (2, "die katze schläft auf dem warmen sofa", "de"),
    (3, "der wald ist schön und die katze läuft", "de"),
    (4, "the dog runs quickly through the forest", "en"),
    (5, "the cat sleeps on the warm couch", "en"),
    (6, "a forest is pretty and the cat runs", "en"),
    (7, "el perro corre rápido por el bosque", "es"),
    (8, "el gato duerme en el sofá caliente", "es"),
    (9, "el bosque es bonito y el gato corre", "es"),
]

HELDOUT = [
    (101, "die katze läuft durch den wald", "de"),
    (102, "the dog sleeps on the couch", "en"),
    (103, "el perro duerme en el bosque", "es"),
]


@pytest.fixture(scope="module")
def train(spark):
    return spark.createDataFrame(
        TRAIN, "doc_id long, text string, lang string"
    )


@pytest.fixture(scope="module")
def model(train):
    return affinity_model(train, n=1, num_buckets=1024, hasher="md5")


def test_model_shape(model):
    labels = [lab for lab, _, _ in model["classes"]]
    assert labels == ["de", "en", "es"]  # sorted
    for _, counts, total in model["classes"]:
        assert len(counts) == 1024
        assert total == sum(counts) > 0


def test_train_set_classified_correctly(train, model):
    preds = {
        r["doc_id"]: r["predicted"]
        for r in classify_with_model(train, model).collect()
    }
    truth = {i: lang for i, _, lang in TRAIN}
    assert preds == truth


def test_heldout_generalization(spark, model):
    held = spark.createDataFrame(
        HELDOUT, "doc_id long, text string, lang string"
    )
    preds = {
        r["doc_id"]: r["predicted"]
        for r in classify_with_model(held, model).collect()
    }
    assert preds == {101: "de", 102: "en", 103: "es"}


def test_report_counts(train, model):
    rep = {
        r["lang"]: r.asDict()
        for r in classification_report(
            train, classify_with_model(train, model)
        ).collect()
    }
    for lang in ("de", "en", "es"):
        assert rep[lang]["n_docs"] == 3
        assert rep[lang]["n_correct"] == 3
        assert rep[lang]["accuracy"] == 1.0


def test_gramless_doc_predicts_first_label(spark, model):
    empty = spark.createDataFrame(
        [(200, ""), (201, "   ")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in classify_with_model(empty, model).collect()
    }
    for r in got.values():
        assert r["n_grams"] == 0
        assert r["predicted"] == "de"  # first in sorted label order
        assert r["score"] == 0.0


def test_empty_model_on_nonempty_corpus_predicts_null(spark):
    """r17 ADVICE: the class-less early return was only ever exercised
    with an EMPTY apply set (train and apply share inputs in the
    registry query). Pin the other half of the documented contract — a
    model trained on zero docs applied to a NON-empty corpus must emit
    one row per doc with real n_grams and NULL predicted/score, not
    raise and not drop rows (the path is registry-unreachable today,
    so this test is its only guard)."""
    no_train = spark.createDataFrame(
        [], "doc_id long, text string, lang string"
    )
    m = affinity_model(no_train, n=1, num_buckets=64)
    assert m["classes"] == []
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in classify_with_model(docs, m).collect()
    }
    assert set(got) == {1, 2}
    assert got[1]["n_grams"] > 0 and got[2]["n_grams"] == 0
    for r in got.values():
        assert r["predicted"] is None and r["score"] is None


def test_prior_dominance_without_signal(spark):
    # Identical word distribution, unbalanced classes: the larger class
    # wins every prediction — the documented Bayesian fallback (and why
    # the driver corpus report shows en sweeping).
    rows = [(i, "same words everywhere", "big") for i in range(8)]
    rows += [(100 + i, "same words everywhere", "small") for i in range(2)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    m = affinity_model(df, n=1, num_buckets=256)
    preds = {r["predicted"] for r in classify_with_model(df, m).collect()}
    assert preds == {"big"}


def test_streaming_scoring_matches_batch(spark, train, model, tmp_path):
    src = str(tmp_path / "src")
    train.select("doc_id", "text").write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = (
        classify_with_model(stream, model)
        .writeStream.format("memory")
        .queryName("nb_stream_preds")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: (r["predicted"], r["score"])
        for r in spark.sql("select * from nb_stream_preds").collect()
    }
    batch = {
        r["doc_id"]: (r["predicted"], r["score"])
        for r in classify_with_model(
            train.select("doc_id", "text"), model
        ).collect()
    }
    assert got == batch
