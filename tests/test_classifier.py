"""Hashed linear classifier inference: int-exact scoring, the keep
gate's strict-mean semantics, weights-literal vs arithmetic parity,
empty-document handling, and the scan-local (zero-exchange) plan."""

from __future__ import annotations

import contextlib
import io

from flink_streaming_2_10_spark.pipeline.classifier import (
    DEFAULT_DIM,
    classifier_oracle_sql,
    hashed_linear_score,
    synthetic_weights,
)


def _score(spark, rows, **kw):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return {
        r["doc_id"]: (r["n_toks"], r["score_num"], r["keep"])
        for r in hashed_linear_score(df, **kw).collect()
    }


def test_score_is_sum_of_bucket_weights(spark):
    """One-token documents let us pin the per-token weight; a multi-
    token document's score must be the exact sum of its tokens'."""
    singles = _score(spark, [(1, "alpha"), (2, "beta"), (3, "gamma")])
    combo = _score(spark, [(9, "alpha beta gamma alpha")])
    w = {k: v[1] for k, v in singles.items()}
    n, s, _ = combo[9]
    assert n == 4
    assert s == w[1] + w[2] + w[3] + w[1]


def test_keep_gate_strict_mean(spark):
    """keep ⇔ score_num·denom > n_toks·num — verified on both sides of
    the boundary with a planted weight vector."""
    # dim-sized vector of all 1s: every token scores 1 → mean 1.
    ones = [1] * DEFAULT_DIM
    got = _score(
        spark,
        [(1, "a b c d"), (2, "")],
        weights=ones,
        keep_num=1,
        keep_denom=1,
    )
    # mean exactly 1: 4·1 > 4·1 is FALSE (strict)
    assert got[1] == (4, 4, False)
    # empty doc: 0 tokens, score 0, 0 > 0 false
    assert got[2] == (0, 0, False)
    got2 = _score(
        spark, [(1, "a b c d")], weights=ones, keep_num=1, keep_denom=2
    )
    assert got2[1] == (4, 4, True)  # 4·2 > 4·1


def test_weights_literal_matches_arithmetic(spark):
    """Passing synthetic_weights(dim) explicitly (the broadcast-literal
    path a trained model uses) must reproduce the arithmetic default
    exactly."""
    rows = [(i, t) for i, t in enumerate(
        ["spark scan join", "table query value", "", "zzz qqq"]
    )]
    assert _score(spark, rows) == _score(
        spark, rows, weights=synthetic_weights(DEFAULT_DIM)
    )


def test_weights_length_validated(spark):
    import pytest

    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="weights has 3"):
        hashed_linear_score(df, weights=[1, 2, 3])


def test_plan_is_scan_local(spark):
    """100 TB shape: Scan → Project, nothing else — no Exchange, no
    Python stage, no join (the weight vector rides the plan)."""
    df = spark.createDataFrame([(1, "x y z")], ["doc_id", "text"])
    for kw in ({}, {"weights": synthetic_weights(DEFAULT_DIM)}):
        out = hashed_linear_score(df, **kw)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            out.explain("formatted")
        plan = buf.getvalue()
        assert "Exchange" not in plan
        # Python EVAL stages (the createDataFrame scan's
        # applySchemaToPythonRDD argument line is fixture noise).
        assert "ArrowEvalPython" not in plan
        assert "BatchEvalPython" not in plan
        assert "MapInPandas" not in plan
        assert "Join" not in plan


def test_oracle_parity_sf_small(spark, duck):
    from tests.conftest import SF_SMALL, assert_df_matches_oracle

    import __spark_entry__ as em

    assert_df_matches_oracle(
        em.queries()["quality_classifier"](spark, SF_SMALL),
        duck,
        em.oracle_sql()["quality_classifier"],
    )
