"""Sketch-quality recall audit (__spark_entry__.q_dedup_lsh_recall)."""

from __future__ import annotations

import pytest

import __spark_entry__ as em
from tests.conftest import SF_SMALL, assert_df_matches_oracle


@pytest.fixture(scope="module")
def row(spark):
    return em.queries()["dedup_lsh_recall"](spark, SF_SMALL).collect()[0]


def test_matches_oracle(spark, duck):
    assert_df_matches_oracle(
        em.queries()["dedup_lsh_recall"](spark, SF_SMALL),
        duck,
        em.oracle_sql()["dedup_lsh_recall"],
    )


def test_counts_reconcile(row):
    assert row["n_both"] + row["n_missed_by_lsh"] == row["n_truth"]
    assert row["n_both"] + row["n_lsh_only"] == row["n_lsh"]
    assert row["n_both"] <= min(row["n_truth"], row["n_lsh"])


def test_sketch_finds_the_planted_duplicates(row):
    """The corpus has planted near-dups; at j >= 0.7 the 8x4 banding
    must recover a non-trivial share of them (collision probability at
    j = 0.7 is 1 - (1 - 0.7^4)^8 ~ 0.91)."""
    assert row["n_truth"] > 0
    assert row["n_both"] > 0
    assert row["n_both"] * 2 >= row["n_truth"]  # >= 50% recall


def test_sample_fraction_one_is_the_full_audit(spark, row):
    """fraction 1.0 (the registry parameterization) must be IDENTICAL to
    the unsampled audit — the filter is omitted, not a no-op predicate."""
    sampled = em.q_dedup_lsh_recall(
        spark, SF_SMALL, sample_fraction=1.0
    ).collect()[0]
    assert sampled.asDict() == row.asDict()


def test_sampled_audit_matches_sampled_oracle(spark, duck):
    """The 100 TB form: both pipelines over a deterministic md5-threshold
    document sample, oracle shadowing `documents` with the same draw."""
    got = em.q_dedup_lsh_recall(spark, SF_SMALL, sample_fraction=0.5)
    assert_df_matches_oracle(got, duck, em._lsh_recall_oracle(0.5))


def test_sampled_audit_restricts_to_drawn_docs(spark):
    """Sampled truth counts are bounded by the full audit's (hash
    thresholding is monotone: a sampled doc set is a subset, so sampled
    truth pairs are a subset of full truth pairs up to the corpus-
    relative max_df cap resolving against the smaller denominator)."""
    full = em.q_dedup_lsh_recall(spark, SF_SMALL).collect()[0]
    half = em.q_dedup_lsh_recall(
        spark, SF_SMALL, sample_fraction=0.5
    ).collect()[0]
    assert half["n_truth"] <= full["n_truth"]
    assert half["n_lsh"] <= full["n_lsh"]
