"""Benchmark-decontamination audit: n-gram overlap against a held-out set.

Strategy: hand-built corpus with planted contamination (verbatim copy,
partial quote, clean doc, doc shorter than the gram width), plus the
DuckDB oracle replay of the driver query at sf0.001.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_streaming_2_10_spark.pipeline.decontamination import decontaminate


def _audit(spark, docs, bench, **kw):
    d = spark.createDataFrame(docs, ["doc_id", "text"])
    b = spark.createDataFrame(bench, ["doc_id", "text"])
    out = decontaminate(d, b, **kw)
    return {
        r["doc_id"]: (
            r["total_ngrams"],
            r["contaminated_ngrams"],
            r["is_contaminated"],
        )
        for r in out.collect()
    }


EVAL_Q = "what is the capital city of france and when was it founded"


def test_planted_contamination_flags(spark):
    docs = [
        (1, f"some context then {EVAL_Q} then more filler text here"),  # verbatim
        (2, "entirely unrelated words about distributed query planning"),
        (3, "the capital city of france and when"),  # partial quote
        (4, "too short"),  # fewer words than the gram width
    ]
    got = _audit(spark, docs, [(100, EVAL_Q)], n=5, min_hits=1)
    assert got[1][2] and got[1][1] >= 7  # every eval 5-gram present
    assert got[2] == (got[2][0], 0, False)
    assert got[3][2] and got[3][1] == 3  # 7-word quote -> three 5-grams
    assert got[4] == (0, 0, False)  # audited, zero grams, clean


def test_min_hits_threshold(spark):
    docs = [(1, "x y " + EVAL_Q), (2, "the capital city of france only")]
    got = _audit(spark, docs, [(100, EVAL_Q)], n=5, min_hits=2)
    assert got[1][2]
    assert got[2][1] == 1 and not got[2][2]  # one shared gram < min_hits


def test_every_doc_audited_once(spark):
    docs = [(i, f"doc number {i} body text") for i in range(10)]
    out_rows = _audit(spark, docs, [(99, "nothing shared at all")], n=3)
    assert sorted(out_rows) == list(range(10))


def test_driver_query_matches_oracle(spark, duck):
    import __spark_entry__ as entrymod
    from tests.conftest import SF_SMALL, assert_df_matches_oracle

    got = entrymod.queries()["decontamination"](spark, SF_SMALL)
    assert_df_matches_oracle(got, duck, entrymod.oracle_sql()["decontamination"])
    # The planted eval set (doc_id % 20 == 0) must flag itself: every
    # member with at least one 5-gram is contaminated by construction.
    bad = got.where(
        (F.col("doc_id") % 20 == 0)
        & (F.col("total_ngrams") > 0)
        & ~F.col("is_contaminated")
    ).count()
    assert bad == 0


def test_shuffled_probe_equals_broadcast(spark):
    """broadcast=False (the giant-benchmark escape hatch: shuffled
    hash-only join) must return exactly the broadcast probe's audit."""
    docs = [
        (1, EVAL_Q + " extra tail words here"),
        (2, "a perfectly clean training document about rivers"),
        (3, "what is the capital city of france and nothing else"),
    ]
    bench = [(100, EVAL_Q)]
    a = _audit(spark, docs, bench, n=5)
    b = _audit(spark, docs, bench, n=5, broadcast=False)
    assert a == b and a[1][2] and not a[2][2]
