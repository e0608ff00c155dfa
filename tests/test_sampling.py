"""Stratified sampling + domain mixture (pipeline/sampling.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_streaming_2_10_spark.catalog import load_table
from flink_streaming_2_10_spark.pipeline.sampling import (
    domain_mixture,
    priority_sample,
    stratified_sample,
)
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_SMALL, "documents")


def test_sample_deterministic(docs):
    rates = {"en": 0.3, "de": 0.3, "es": 0.3}
    a = {r["doc_id"] for r in stratified_sample(docs, rates).collect()}
    b = {r["doc_id"] for r in stratified_sample(docs, rates).collect()}
    assert a == b and a


def test_sample_monotone_in_rate(docs):
    """Hash thresholding: the 10% draw is a subset of the 50% draw."""
    small = {
        r["doc_id"]
        for r in stratified_sample(docs, {"en": 0.1}, default_rate=0.0).collect()
    }
    big = {
        r["doc_id"]
        for r in stratified_sample(docs, {"en": 0.5}, default_rate=0.0).collect()
    }
    assert small < big


def test_sample_respects_strata(docs):
    out = stratified_sample(docs, {"en": 1.0}, default_rate=0.0).collect()
    assert out and all(r["lang"] == "en" for r in out)
    n_en = docs.filter(F.col("lang") == "en").count()
    assert len(out) == n_en  # rate 1.0 keeps every English doc


def test_sample_rate_roughly_honored(docs):
    n = docs.count()
    kept = stratified_sample(
        docs, rates={}, default_rate=0.5, strata_col="lang"
    ).count()
    assert 0.35 * n < kept < 0.65 * n


def test_sample_salt_changes_draw(docs):
    rates = {"en": 0.4}
    a = {r["doc_id"] for r in stratified_sample(docs, rates, salt="a").collect()}
    b = {r["doc_id"] for r in stratified_sample(docs, rates, salt="b").collect()}
    assert a != b


def test_priority_sample_exact_size_and_nesting(docs):
    """Exactly min(k, |stratum|) rows per stratum, and the k-draw is a
    strict prefix of the (k+10)-draw — scaling a cohort up keeps every
    previously selected document."""
    small = {r["doc_id"] for r in priority_sample(docs, k=15).collect()}
    big_rows = priority_sample(docs, k=25).collect()
    big = {r["doc_id"] for r in big_rows}
    assert small < big
    per = {}
    for r in big_rows:
        per[r["lang"]] = per.get(r["lang"], 0) + 1
    strata_sizes = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per == {
        lang: min(25, n) for lang, n in strata_sizes.items() if min(25, n) > 0
    }


def test_priority_sample_prefilter_is_result_invariant(docs):
    plain = sorted(
        (r["doc_id"], r["sample_rank"])
        for r in priority_sample(docs, k=20).collect()
    )
    bucketed = sorted(
        (r["doc_id"], r["sample_rank"])
        for r in priority_sample(docs, k=20, prefilter_buckets=4).collect()
    )
    assert plain == bucketed and len(plain) > 0


def test_priority_sample_salt_changes_draw(docs):
    a = {r["doc_id"] for r in priority_sample(docs, k=20, salt="a").collect()}
    b = {r["doc_id"] for r in priority_sample(docs, k=20, salt="b").collect()}
    assert a != b


def test_mixture_shares_and_weights(spark):
    rows = [(1, "en", 30), (2, "en", 30), (3, "de", 30), (4, "fr", 10)]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "tok"])
    out = {r["lang"]: r for r in domain_mixture(df, F.col("tok")).collect()}
    assert out["en"]["n_docs"] == 2 and out["en"]["n_tokens"] == 60
    assert abs(sum(r["share"] for r in out.values()) - 1.0) < 1e-12
    # uniform target is 1/3; en is over-represented (share .6) -> weight < 1
    assert out["en"]["weight"] == pytest.approx((1 / 3) / 0.6)
    # fr is rare (share .1) -> upweighted toward 1/3 / .1 = 3.33
    assert out["fr"]["weight"] == pytest.approx((1 / 3) / 0.1)


def test_mixture_weight_cap(spark):
    rows = [(1, "en", 1000), (2, "xx", 1)]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "tok"])
    out = {
        r["lang"]: r
        for r in domain_mixture(df, F.col("tok"), max_weight=8.0).collect()
    }
    assert out["xx"]["weight"] == 8.0  # uncapped would be ~500


def test_source_quality_cap_prefilter_is_result_invariant(spark):
    from flink_streaming_2_10_spark.catalog import load_table
    from flink_streaming_2_10_spark.pipeline.sampling import source_quality_cap
    from tests.conftest import SF_SMALL

    docs = load_table(spark, SF_SMALL, "documents")
    plain = source_quality_cap(docs, cap=10)
    pruned = source_quality_cap(docs, cap=10, prefilter_buckets=3)
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, pruned.collect())
    )


def test_source_quality_cap_caps_and_ranks(spark):
    from flink_streaming_2_10_spark.catalog import load_table
    from flink_streaming_2_10_spark.pipeline.sampling import source_quality_cap
    from tests.conftest import SF_SMALL

    docs = load_table(spark, SF_SMALL, "documents")
    rows = source_quality_cap(docs, cap=5).collect()
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
    for src, grp in by_source.items():
        assert len(grp) <= 5
        grp.sort(key=lambda r: r["rank_in_source"])
        assert [r["rank_in_source"] for r in grp] == list(range(1, len(grp) + 1))
        qs = [r["quality"] for r in grp]
        assert qs == sorted(qs, reverse=True)


def test_holdout_split_partitions_exactly(docs):
    """Every doc gets exactly one split label; labels are the requested
    set; rough fraction sanity at sf0.001."""
    from flink_streaming_2_10_spark.pipeline.sampling import holdout_split

    out = holdout_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1})
    rows = out.collect()
    assert len(rows) == docs.count()  # one label per doc, none dropped
    counts: dict[str, int] = {}
    for r in rows:
        counts[r["split"]] = counts.get(r["split"], 0) + 1
    assert set(counts) <= {"train", "val", "test"}
    n = len(rows)
    assert counts["train"] / n > 0.7  # ~0.8 with hash noise at 500 docs


def test_holdout_split_deterministic_and_stable_under_growth(docs):
    """Rerun ⇒ identical labels. Growing train's fraction (shrinking
    val) only MOVES val rows into train — no doc ever crosses from a
    held-out set into a different held-out set, and no train doc leaves:
    the no-migration guarantee a training pipeline needs."""
    from flink_streaming_2_10_spark.pipeline.sampling import holdout_split

    a = {r["doc_id"]: r["split"]
         for r in holdout_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1}).collect()}
    b = {r["doc_id"]: r["split"]
         for r in holdout_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1}).collect()}
    assert a == b
    grown = {r["doc_id"]: r["split"]
             for r in holdout_split(docs, {"train": 0.85, "val": 0.05, "test": 0.1}).collect()}
    for doc, was in a.items():
        now = grown[doc]
        if was == "train":
            assert now == "train"
        if was == "test":
            assert now == "test"
        if was == "val":
            assert now in ("train", "val")


def test_holdout_split_validation(docs):
    from flink_streaming_2_10_spark.pipeline.sampling import holdout_split

    with pytest.raises(ValueError, match="sum to 1"):
        holdout_split(docs, {"train": 0.5, "val": 0.1})
    with pytest.raises(ValueError, match="not be empty"):
        holdout_split(docs, {})
    # per-fraction range check: a negative band sums to 1 but would
    # silently yield an empty split with its mass shifted to later bands
    with pytest.raises(ValueError, match="must be in \\(0, 1\\]"):
        holdout_split(docs, {"a": -0.1, "b": 0.6, "c": 0.5})
    with pytest.raises(ValueError, match="must be in \\(0, 1\\]"):
        holdout_split(docs, {"a": 0.0, "b": 1.0})
    from flink_streaming_2_10_spark.pipeline.sampling import (
        holdout_split_oracle,
    )

    with pytest.raises(ValueError, match="must be in \\(0, 1\\]"):
        holdout_split_oracle({"a": -0.1, "b": 0.6, "c": 0.5})


def test_holdout_split_matches_oracle(spark, duck):
    import __spark_entry__ as entrymod
    from tests.conftest import assert_df_matches_oracle

    df = entrymod.queries()["holdout_split"](spark, SF_SMALL)
    assert_df_matches_oracle(df, duck, entrymod.oracle_sql()["holdout_split"])


def test_budget_plan_clamps_and_reports_shortfall(spark):
    from flink_streaming_2_10_spark.pipeline.sampling import (
        mixture_budget_plan,
    )

    rows = [(1, "en", 800), (2, "en", 200), (3, "de", 50), (4, "fr", 100)]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "tok"])
    out = {
        r["lang"]: r
        for r in mixture_budget_plan(
            df, F.col("tok"),
            targets={"en": 0.5, "de": 0.5},
            budget_tokens=400,
        ).collect()
    }
    # en: 1000 tokens available, 200 desired -> rate 0.2, no shortfall
    assert out["en"]["keep_rate"] == pytest.approx(0.2)
    assert out["en"]["planned_tokens"] == pytest.approx(200.0)
    assert out["en"]["shortfall"] == 0.0
    # de: only 50 available for 200 desired -> clamp to 1, shortfall 150
    assert out["de"]["keep_rate"] == 1.0
    assert out["de"]["planned_tokens"] == pytest.approx(50.0)
    assert out["de"]["shortfall"] == pytest.approx(150.0)
    # fr observed but not in the recipe -> zero-rate row, never silent
    assert out["fr"]["target_share"] == 0.0
    assert out["fr"]["keep_rate"] == 0.0
    assert out["fr"]["planned_tokens"] == 0.0


def test_budget_plan_validates_inputs(spark):
    from flink_streaming_2_10_spark.pipeline.sampling import (
        mixture_budget_plan,
    )

    df = spark.createDataFrame([(1, "en", 10)], ["doc_id", "lang", "tok"])
    with pytest.raises(ValueError, match="sum to 1"):
        mixture_budget_plan(df, F.col("tok"), {"en": 0.5}, 100)
    with pytest.raises(ValueError, match=">= 0"):
        mixture_budget_plan(
            df, F.col("tok"), {"en": 1.5, "de": -0.5}, 100
        )
    with pytest.raises(ValueError, match="non-empty"):
        mixture_budget_plan(df, F.col("tok"), {}, 100)
    with pytest.raises(ValueError, match="budget_tokens"):
        mixture_budget_plan(df, F.col("tok"), {"en": 1.0}, -1)


def test_budget_plan_rates_execute_via_stratified_sample(docs):
    """The plan's contract: feeding its keep rates to stratified_sample
    realizes approximately planned_tokens per stratum (hash draw over
    the same strata column)."""
    from flink_streaming_2_10_spark.pipeline.sampling import (
        mixture_budget_plan,
    )

    tok = F.greatest(F.length("text"), F.lit(1))
    plan = {
        r["lang"]: r
        for r in mixture_budget_plan(
            docs, tok,
            targets={"en": 0.6, "de": 0.4},
            budget_tokens=2_000,
        ).collect()
    }
    rates = {k: r["keep_rate"] for k, r in plan.items()}
    # stratified_sample projects (id, stratum); join tokens back by id
    kept = stratified_sample(docs, rates, strata_col="lang").join(
        docs.select("doc_id", tok.alias("t")), "doc_id"
    )
    got = {
        r["lang"]: r["t"]
        for r in kept.groupBy("lang").agg(F.sum("t").alias("t")).collect()
    }
    for lang in ("en", "de"):
        planned = plan[lang]["planned_tokens"]
        if plan[lang]["keep_rate"] == 1.0:
            assert got[lang] == planned  # keep-everything is exact
        else:
            # hash draw: expected +- sampling noise on a small corpus
            assert got.get(lang, 0) == pytest.approx(planned, rel=0.7)
    # zero-rate strata are absent from the sample entirely
    assert all(lang in ("en", "de") for lang in got)


def test_budget_plan_arithmetic_identities(spark):
    """Planner invariants on every row: keep_rate in [0, 1];
    planned_tokens <= n_tokens; planned_tokens + shortfall recovers the
    desired budget share (exact when nothing clamps, IEEE-approx when
    the subtraction rounds); zero-token strata plan zero."""
    from flink_streaming_2_10_spark.pipeline.sampling import (
        mixture_budget_plan,
    )

    rows = [
        (1, "en", 700), (2, "en", 300), (3, "de", 10), (4, "es", 0),
        (5, "zh", 123456),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "tok"])
    targets = {"en": 0.3, "de": 0.3, "es": 0.2, "zh": 0.2}
    budget = 12_345
    for r in mixture_budget_plan(
        df, F.col("tok"), targets, budget
    ).collect():
        assert 0.0 <= r["keep_rate"] <= 1.0, r
        assert r["planned_tokens"] <= r["n_tokens"], r
        desired = float(budget) * targets.get(r["lang"], 0.0)
        assert r["planned_tokens"] + r["shortfall"] == pytest.approx(
            desired, abs=1e-9
        ), r
        if r["n_tokens"] == 0:
            assert r["keep_rate"] == 0.0 and r["planned_tokens"] == 0.0


def test_budget_plan_missing_target_stratum_zero_row(spark):
    """A target stratum entirely absent from the corpus must emit a
    zero-count row (full-desired shortfall, keep_rate 0) rather than
    silently vanish — the mirror image of the unlisted-stratum guard."""
    from flink_streaming_2_10_spark.pipeline.sampling import (
        mixture_budget_plan,
    )

    rows = [(1, "en", 1000), (2, "de", 500)]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "tok"])
    out = {
        r["lang"]: r
        for r in mixture_budget_plan(
            df, F.col("tok"),
            targets={"en": 0.5, "de": 0.3, "ja": 0.2},
            budget_tokens=100,
        ).collect()
    }
    assert set(out) == {"en", "de", "ja"}
    ja = out["ja"]
    assert ja["n_docs"] == 0 and ja["n_tokens"] == 0
    assert ja["target_share"] == pytest.approx(0.2)
    assert ja["keep_rate"] == 0.0
    assert ja["planned_tokens"] == 0.0
    assert ja["shortfall"] == pytest.approx(100 * 0.2)


def test_budget_plan_oracle_double_arithmetic(spark, duck):
    """The ADVICE decimal-parity case: budget=3, weight=0.1 — DuckDB's
    DECIMAL typing of bare literals would compute shortfall 0.3 exactly
    while Spark's doubles give 0.30000000000000004; the oracle's
    CAST(... AS DOUBLE) wrapping must make both engines agree bit-for-bit
    (the 'ja' stratum is corpus-absent so desired flows straight into
    shortfall, exposing the raw product)."""
    from tests.conftest import assert_df_matches_oracle
    from flink_streaming_2_10_spark.pipeline.sampling import (
        mixture_budget_plan,
        mixture_budget_plan_oracle,
    )

    rows = [(1, "en", 7), (2, "de", 13)]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "tok"])
    targets = {"en": 0.6, "de": 0.3, "ja": 0.1}
    out = mixture_budget_plan(df, F.col("tok"), targets, 3)
    # sanity: the Spark side really does produce the IEEE artifact
    ja = {r["lang"]: r for r in out.collect()}["ja"]
    assert ja["shortfall"] == 0.30000000000000004
    table = (
        "(SELECT * FROM (VALUES (1, 'en', 7), (2, 'de', 13))"
        " AS t(doc_id, lang, tok))"
    )
    assert_df_matches_oracle(
        out, duck, mixture_budget_plan_oracle("tok", targets, 3, table=table)
    )


def test_training_shard_budgeted_matches_oracle(spark, duck):
    import __spark_entry__ as entrymod
    from tests.conftest import assert_df_matches_oracle

    df = entrymod.queries()["training_shard_budgeted"](spark, SF_SMALL)
    assert_df_matches_oracle(
        df, duck, entrymod.oracle_sql()["training_shard_budgeted"]
    )


def test_training_shard_budgeted_realized_tracks_planned(docs):
    """Planner → executor contract: the realized per-stratum token mass
    tracks planned_tokens within the Bernoulli draw's noise; clamped
    (rate-1) strata realize exactly; zero-rate / corpus-absent strata
    realize zero."""
    from flink_streaming_2_10_spark.pipeline.sampling import (
        training_shard_budgeted,
    )

    tok = F.greatest(F.length("text"), F.lit(1))
    targets = {"en": 0.5, "de": 0.3, "zh": 0.15, "ja": 0.05}
    rows = {
        r["lang"]: r
        for r in training_shard_budgeted(
            docs, tok, targets, budget_tokens=30_000
        ).collect()
    }
    # corpus strata plus the corpus-absent target all present
    assert {"en", "de", "zh", "ja", "es", "fr"} <= set(rows)
    for lang, r in rows.items():
        if r["keep_rate"] == 1.0:
            assert r["realized_tokens"] == r["planned_tokens"], r
        elif r["keep_rate"] == 0.0:
            assert r["realized_tokens"] == 0 and r["realized_docs"] == 0, r
        else:
            # hash draw on a small corpus: generous but bounded noise
            assert r["realized_tokens"] == pytest.approx(
                r["planned_tokens"], rel=0.7
            ), r
    assert rows["ja"]["realized_docs"] == 0
    assert rows["fr"]["keep_rate"] == 0.0 and rows["fr"]["realized_tokens"] == 0


def test_training_shard_budgeted_null_strata(spark, duck):
    """A corpus with NULL in strata_col must not crash the rate-chain
    build (sorted() cannot order None against str) and must emit the
    NULL stratum as a zero-rate plan row with realized 0 — NULL never
    equality-matches a WHEN branch on the Spark side, exactly as the
    oracle's inner join drops it. Exact engine/oracle parity."""
    from tests.conftest import assert_df_matches_oracle
    from flink_streaming_2_10_spark.pipeline.sampling import (
        training_shard_budgeted,
        training_shard_budgeted_oracle,
    )

    rows = [
        (1, "en", 30), (2, "en", 50), (3, None, 40),
        (4, "de", 20), (5, None, 10), (6, "de", 60),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "tok"])
    targets = {"en": 0.75, "de": 0.25}
    out = training_shard_budgeted(df, F.col("tok"), targets, 60)
    got = {r["lang"]: r for r in out.collect()}
    assert set(got) == {"en", "de", None}
    assert got[None]["keep_rate"] == 0.0
    assert got[None]["realized_docs"] == 0 and got[None]["realized_tokens"] == 0

    values = ", ".join(
        f"({i}, {'NULL' if s is None else repr(s)}, {t})" for i, s, t in rows
    )
    table = f"(SELECT * FROM (VALUES {values}) AS t(doc_id, lang, tok))"
    assert_df_matches_oracle(
        out, duck,
        training_shard_budgeted_oracle("tok", targets, 60, table=table),
    )


def test_training_shard_budgeted_bounded_rate_chain(spark):
    """Generic strata_col safety: with a high-cardinality strata column
    (500 distinct, 3 targets) the executor's keep-rate WHEN chain must
    stay |targets|-sized — zero-rate strata are identical to the
    otherwise(0.0) default and must not each add a codegen branch — and
    non-target strata must realize exactly 0."""
    from flink_streaming_2_10_spark.pipeline.sampling import (
        training_shard_budgeted,
    )

    rows = [(i, f"s{i % 500:03d}", 10 + i % 7) for i in range(2000)]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "tok"])
    targets = {"s000": 0.5, "s001": 0.3, "s002": 0.2}
    out = training_shard_budgeted(df, F.col("tok"), targets, 50)
    plan_str = out._jdf.queryExecution().analyzed().toString()
    # each materialized copy of the rate expression carries exactly one
    # WHEN per non-zero target; 500 zero-rate strata must add none
    assert plan_str.count("WHEN") <= 4 * len(targets)
    got = {r["lang"]: r for r in out.collect()}
    assert len(got) == 500
    realized_elsewhere = [
        r for lang, r in got.items()
        if lang not in targets and r["realized_docs"] != 0
    ]
    assert realized_elsewhere == []
    assert sum(r["realized_docs"] for r in got.values()) > 0


def test_duckdb_double_lit_rejects_non_finite():
    """inf/nan would render as invalid SQL ('infe0') — must raise at
    oracle-build time instead."""
    import math

    from flink_streaming_2_10_spark.pipeline.sampling import duckdb_double_lit

    for bad in (math.inf, -math.inf, math.nan):
        with pytest.raises(ValueError, match="finite"):
            duckdb_double_lit(bad)
    assert duckdb_double_lit(0.5) == "0.5e0"


def test_budget_plan_oracle_parity_randomized(spark, duck):
    """Seeded-random engine/oracle parity for the planner — the hazard
    class the r13 ADVICE caught (DECIMAL vs IEEE-double literal
    arithmetic) pinned across awkward weights (non-dyadic sevenths,
    multiples of 0.1), random budgets, corpus-absent targets, and
    unlisted corpus strata. Exact (bit-level) comparison each time."""
    import random

    from tests.conftest import assert_df_matches_oracle
    from flink_streaming_2_10_spark.pipeline.sampling import (
        mixture_budget_plan,
        mixture_budget_plan_oracle,
    )

    rng = random.Random(1414)
    langs = ["aa", "bb", "cc", "dd", "ee", "ff"]
    for trial in range(8):
        present = rng.sample(langs, rng.randint(2, 5))
        rows = [
            (i, rng.choice(present), rng.randint(0, 400))
            for i in range(rng.randint(5, 40))
        ]
        # targets: a subset of present plus possibly absent strata,
        # weighted by awkward fractions normalized to sum exactly-ish 1
        tgt_names = rng.sample(langs, rng.randint(1, 4))
        raw_w = [rng.choice([1, 2, 3, 7, 10]) for _ in tgt_names]
        tot = sum(raw_w)
        targets = {n: w / tot for n, w in zip(tgt_names, raw_w)}
        # repair float drift so the sum-to-1 guard passes
        drift = 1.0 - sum(targets.values())
        targets[tgt_names[0]] += drift
        budget = rng.choice([3, 7, 100, 12_345])

        df = spark.createDataFrame(rows, ["doc_id", "lang", "tok"])
        out = mixture_budget_plan(df, F.col("tok"), targets, budget)
        values = ", ".join(f"({i}, '{s}', {t})" for i, s, t in rows)
        table = f"(SELECT * FROM (VALUES {values}) AS t(doc_id, lang, tok))"
        assert_df_matches_oracle(
            out, duck,
            mixture_budget_plan_oracle("tok", targets, budget, table=table),
        )


def test_training_shard_budgeted_oracle_parity_randomized(spark, duck):
    """Seeded-random end-to-end parity for the composed recipe: the
    Spark side COLLECTS the plan and re-literalizes keep_rate doubles
    while the oracle recomputes them in SQL — any bit divergence in the
    rate arithmetic shows up directly in planned_tokens/keep_rate
    outputs (and, near thresholds, in realized membership). Exact
    comparison across random corpora, awkward weights, absent targets."""
    import random

    from tests.conftest import assert_df_matches_oracle
    from flink_streaming_2_10_spark.pipeline.sampling import (
        training_shard_budgeted,
        training_shard_budgeted_oracle,
    )

    rng = random.Random(2828)
    langs = ["aa", "bb", "cc", "dd", "ee"]
    for trial in range(5):
        present = rng.sample(langs, rng.randint(2, 4))
        rows = [
            (i, rng.choice(present), rng.randint(0, 300))
            for i in range(rng.randint(8, 30))
        ]
        tgt_names = rng.sample(langs, rng.randint(1, 3))
        raw_w = [rng.choice([1, 3, 7]) for _ in tgt_names]
        tot = sum(raw_w)
        targets = {n: w / tot for n, w in zip(tgt_names, raw_w)}
        targets[tgt_names[0]] += 1.0 - sum(targets.values())
        budget = rng.choice([7, 500, 9_999])

        df = spark.createDataFrame(rows, ["doc_id", "lang", "tok"])
        out = training_shard_budgeted(
            df, F.col("tok"), targets, budget, salt=f"t{trial}"
        )
        values = ", ".join(f"({i}, '{s}', {t})" for i, s, t in rows)
        table = f"(SELECT * FROM (VALUES {values}) AS t(doc_id, lang, tok))"
        assert_df_matches_oracle(
            out, duck,
            training_shard_budgeted_oracle(
                "tok", targets, budget, table=table, salt=f"t{trial}"
            ),
        )
