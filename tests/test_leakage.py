"""Holdout split leakage audit (pipeline/leakage.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_streaming_2_10_spark.catalog import load_table
from flink_streaming_2_10_spark.pipeline.leakage import (
    holdout_leakage,
    holdout_leakage_oracle_sql,
)
from flink_streaming_2_10_spark.pipeline.sampling import holdout_split
from tests.conftest import SF_SMALL, assert_df_matches_oracle


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_SMALL, "documents")


def test_matches_oracle(docs, duck):
    assert_df_matches_oracle(
        holdout_leakage(docs), duck, holdout_leakage_oracle_sql()
    )


def test_planted_leak_found(spark, docs):
    """A held-out doc given a train doc's text must be flagged against
    exactly its text-sharers; distinct-text docs must not be."""
    splits = {
        r["doc_id"]: r["split"]
        for r in holdout_split(
            docs, {"train": 0.9, "test": 0.1}, salt="split"
        ).collect()
    }
    train_ids = [i for i, s in splits.items() if s == "train"]
    test_ids = [i for i, s in splits.items() if s == "test"]
    base = docs.select("doc_id", "text").collect()
    text_by_id = {r["doc_id"]: r["text"] for r in base}
    donor, victim = train_ids[0], test_ids[0]
    planted = spark.createDataFrame(
        [
            (i, text_by_id[donor] if i == victim else t)
            for i, t in text_by_id.items()
        ],
        ["doc_id", "text"],
    )
    flagged = {
        r["doc_id"]: r for r in holdout_leakage(planted).collect()
    }
    assert victim in flagged
    assert flagged[victim]["n_train_sharers"] >= 1
    assert flagged[victim]["n_shared_fps"] >= 1


def test_clean_split_empty(spark):
    """Documents with fully disjoint vocabularies cannot leak."""
    rows = [(i, " ".join(f"w{i}x{j}" for j in range(30))) for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    assert holdout_leakage(df).count() == 0


def test_boilerplate_cap_suppresses_common_span(spark):
    """A fingerprint present in every document is boilerplate, not
    leakage: with max_fp_df below the corpus size nothing is flagged;
    with the cap lifted everything held-out is."""
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [(i, shared) for i in range(50)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    assert holdout_leakage(df, max_fp_df=10).count() == 0
    lifted = holdout_leakage(df, max_fp_df=1000)
    n_test = holdout_split(df, {"train": 0.9, "test": 0.1}).filter(
        F.col("split") == "test"
    ).count()
    assert lifted.count() == n_test > 0


def test_counts_are_distinct_counts(spark):
    """One train doc sharing many fingerprints still counts as ONE
    sharer; n_shared_fps counts distinct fingerprints."""
    rows = [(i, " ".join(f"w{i}x{j}" for j in range(30))) for i in range(40)]
    df0 = spark.createDataFrame(rows, ["doc_id", "text"])
    splits = {
        r["doc_id"]: r["split"]
        for r in holdout_split(df0, {"train": 0.9, "test": 0.1}).collect()
    }
    train_ids = [i for i, s in splits.items() if s == "train"]
    test_ids = [i for i, s in splits.items() if s == "test"]
    donor, victim = train_ids[0], test_ids[0]
    long_shared = " ".join(f"s{j}" for j in range(40))
    rows2 = [
        (i, long_shared if i in (donor, victim) else t) for i, t in rows
    ]
    df = spark.createDataFrame(rows2, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in holdout_leakage(df).collect()}
    assert out[victim]["n_train_sharers"] == 1
    assert out[victim]["n_shared_fps"] > 1


def test_invalid_split_names_raise(docs):
    with pytest.raises(ValueError):
        holdout_leakage(docs, fractions={"a": 0.5, "b": 0.5})
