"""Keyword-search tests: hand-computed tf·(N/df) scores on a fixture,
validation, and the one-scan physical shape."""

from __future__ import annotations

import contextlib
import io

import pytest

from flink_streaming_2_10_spark.pipeline.search import keyword_search


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "cats chase mice and cats nap"),        # cats x2
        (2, "dogs chase cats"),                      # cats x1, dogs x1
        (3, "dogs and dogs and dogs bark"),          # dogs x3
        (4, "birds sing songs"),                     # no hit
        (5, "Cats, DOGS; cats!"),                    # cats x2, dogs x1
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_hand_computed_scores_and_order(corpus):
    # N=5, df(cats)=3 (docs 1,2,5), df(dogs)=3 (docs 2,3,5)
    got = keyword_search(corpus, terms=("cats", "dogs"), k=10).collect()
    rows = {r["doc_id"]: (r["n_hits"], r["score"]) for r in got}
    assert 4 not in rows  # zero-hit docs never surface
    n = 5.0
    assert rows[1] == (1, 2 * n / 3)
    assert rows[2] == (2, 1 * n / 3 + 1 * n / 3)
    assert rows[3] == (1, 3 * n / 3)
    assert rows[5] == (2, 2 * n / 3 + 1 * n / 3)
    # exact ranking: docs 3 and 5 tie at 15/3 = 5.0 (tie → doc_id asc),
    # then docs 1 and 2 tie at 10/3 (tie → doc_id asc)
    assert rows[5][1] == rows[3][1] == 5.0
    assert rows[1][1] == rows[2][1]
    assert [r["doc_id"] for r in got] == [3, 5, 1, 2]


def test_whole_token_matching(spark):
    # 'cat' must not match 'cats' or 'category' (token identity under \W+)
    docs = spark.createDataFrame(
        [(1, "cat"), (2, "cats category concat"), (3, "the cat sat")],
        ["doc_id", "text"],
    )
    got = {r["doc_id"] for r in keyword_search(docs, terms=("cat",), k=10).collect()}
    assert got == {1, 3}


def test_term_validation(corpus):
    with pytest.raises(ValueError, match="lowercase"):
        keyword_search(corpus, terms=("CATS",))
    with pytest.raises(ValueError, match="at least one"):
        keyword_search(corpus, terms=())


def test_one_scan_no_explode_topk(spark):
    """The 100 TB shape: ONE corpus scan (the persisted tf projection
    feeds both the totals aggregate and the ranking as InMemory scans),
    no Generate (explode), the cut is TakeOrderedAndProject, and the
    only exchange feeds the 1-row totals aggregate."""
    import re

    import __spark_entry__ as entrymod
    from flink_streaming_2_10_spark.pipeline.caching import release_cached
    from tests.conftest import SF_SMALL

    df = entrymod.queries()["keyword_search"](spark, SF_SMALL)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    release_cached()
    assert "TakeOrderedAndProject" in plan
    assert "Generate" not in plan  # no explode — scan-local term counts
    scans = len(re.findall(r"\(\d+\) Scan parquet", plan))
    assert scans <= 1, plan  # the single corpus scan behind the persist
    assert "InMemoryTableScan" in plan  # both consumers read the cache
    assert "rangepartitioning" not in plan


def test_query_matches_oracle_fixture(spark, duck):
    import __spark_entry__ as entrymod
    from tests.conftest import SF_SMALL, assert_df_matches_oracle

    assert_df_matches_oracle(
        entrymod.queries()["keyword_search"](spark, SF_SMALL),
        duck,
        entrymod.oracle_sql()["keyword_search"],
    )
