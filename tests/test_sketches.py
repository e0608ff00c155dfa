"""KMV cardinality sketch (pipeline/sketches.py): determinism,
duplicate-insensitivity, accuracy envelope, oracle parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_streaming_2_10_spark.catalog import load_table
from flink_streaming_2_10_spark.pipeline.sketches import kmv_distinct_estimate

SF_DIR = "/root/testdata/sf0.001"


def test_estimate_is_duplicate_insensitive(spark):
    base = [("g", f"value-{i}") for i in range(200)]
    dup = base + base * 3  # same distinct set, 4x the rows
    a = kmv_distinct_estimate(
        spark.createDataFrame(base, ["grp", "v"]), ["grp"], "v"
    ).collect()[0]["est_distinct"]
    b = kmv_distinct_estimate(
        spark.createDataFrame(dup, ["grp", "v"]), ["grp"], "v"
    ).collect()[0]["est_distinct"]
    assert a == b  # min over a multiset ignores multiplicity exactly


def test_estimate_is_deterministic_across_runs(spark):
    df = spark.createDataFrame(
        [("g", f"tok{i % 97}") for i in range(500)], ["grp", "v"]
    )
    runs = {
        kmv_distinct_estimate(df, ["grp"], "v").collect()[0]["est_distinct"]
        for _ in range(3)
    }
    assert len(runs) == 1


@pytest.mark.parametrize("n", [10, 300, 5000])
def test_accuracy_envelope(spark, n):
    df = spark.createDataFrame(
        [("g", f"item-{i}") for i in range(n)], ["grp", "v"]
    )
    est = kmv_distinct_estimate(df, ["grp"], "v", k=64).collect()[0][
        "est_distinct"
    ]
    # K=64 -> relative std ~12.5%; allow a 3-sigma-ish envelope
    assert 0.5 * n <= est <= 1.6 * n, (n, est)


def test_driver_query_matches_oracle_and_is_plausible(spark, duck):
    import __spark_entry__ as entrymod
    from tests.conftest import SF_SMALL, assert_df_matches_oracle

    got = entrymod.queries()["sketch_distinct_ngrams"](spark, SF_SMALL)
    assert_df_matches_oracle(
        got, duck, entrymod.oracle_sql()["sketch_distinct_ngrams"]
    )
    # estimates must be positive and the lang set complete
    rows = {r["lang"]: r["est_distinct"] for r in got.collect()}
    docs = load_table(spark, SF_SMALL, "documents")
    assert set(rows) == {
        r["lang"] for r in docs.select("lang").distinct().collect()
    }
    assert all(v > 0 for v in rows.values())
