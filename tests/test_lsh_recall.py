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
