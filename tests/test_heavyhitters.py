"""Heavy-hitter tests: exact threshold semantics, the Misra–Gries
retention guarantee under forced summary overflow, mergeability, and
the two-phase physical shape (broadcast candidate recount)."""

from __future__ import annotations

import contextlib
import io
import re
from collections import Counter

import pytest

from flink_streaming_2_10_spark.pipeline.caching import release_cached
from flink_streaming_2_10_spark.pipeline.heavyhitters import (
    _mg_fold,
    heavy_hitter_tokens,
    merge_mg_summaries,
)


def _brute_force(texts: list[str], support_denom: int) -> dict[str, int]:
    toks = [
        t
        for txt in texts
        for t in re.split(r"\W+", txt.lower())
        if t
    ]
    n = len(toks)
    cnt = Counter(toks)
    return {t: c for t, c in cnt.items() if c * (support_denom + 1) > n}


def test_exact_threshold_set_small(spark):
    texts = [
        "spark spark spark join join scan",
        "spark join filter filter rare1",
        "spark scan scan rare2 rare3",
    ]
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    # n=16 tokens; threshold 1/(4+1): need cnt*5 > 16 → cnt ≥ 4
    got = {
        r["token"]: r["cnt"]
        for r in heavy_hitter_tokens(df, support_denom=4).collect()
    }
    release_cached()
    assert got == _brute_force(texts, 4) == {"spark": 5}


def test_output_invariant_to_sketch_cap(spark):
    """The contract in the module header: sketch_cap changes the plan,
    never the answer — forced overflow (cap ≪ vocab) must still produce
    the exact brute-force threshold set with exact counts."""
    # 4 heavy tokens + 300 singleton tokens: vocab 304 ≫ cap 16
    texts = []
    for i in range(30):
        texts.append("alpha beta gamma delta " + f"rare{10*i} rare{10*i+1}")
    for i in range(40):
        texts.append(f"alpha lone{i}")
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(4)
    expect = _brute_force(texts, 15)
    assert expect  # the fixture must actually have heavy hitters
    got = {
        r["token"]: r["cnt"]
        for r in heavy_hitter_tokens(
            df, support_denom=15, sketch_cap=16
        ).collect()
    }
    release_cached()
    assert got == expect


def test_mg_fold_retention_guarantee():
    """Any item with count > N/(cap+1) survives the fold, and stored
    counts undercount by at most the total δ the fold reports (≤
    N/(cap+1)) — the classic MG bound the candidate pass relies on."""
    stream = (
        ["hot"] * 40
        + ["warm"] * 12
        + [f"cold{i}" for i in range(60)]
        + ["hot"] * 10
    )
    n = len(stream)
    cap = 10
    counts: dict[str, int] = {}
    delta_total = 0
    # fold in uneven chunks to exercise repeated trims
    for start in range(0, n, 17):
        chunk = Counter(stream[start : start + 17])
        delta_total += _mg_fold(counts, chunk.items(), cap)
    assert len(counts) <= cap
    assert delta_total * (cap + 1) <= n
    true = Counter(stream)
    for tok, c in true.items():
        if c * (cap + 1) > n:
            assert tok in counts
        if tok in counts:
            assert counts[tok] <= c  # never overcounts
            assert c - counts[tok] <= delta_total  # bounded undercount


def test_merge_summaries_mergeable():
    """Per-shard summaries merged with ``merge_mg_summaries`` retain
    every item heavy in the CONCATENATED stream (errors add — the
    mergeable-summaries property)."""
    cap = 8
    a_stream = ["x"] * 30 + [f"a{i}" for i in range(40)]
    b_stream = ["x"] * 5 + ["y"] * 25 + [f"b{i}" for i in range(40)]
    sa: dict[str, int] = {}
    sb: dict[str, int] = {}
    ea = _mg_fold(sa, Counter(a_stream).items(), cap)
    eb = _mg_fold(sb, Counter(b_stream).items(), cap)
    merged = dict(merge_mg_summaries(sa.items(), sb.items(), cap))
    assert len(merged) <= cap
    n = len(a_stream) + len(b_stream)
    true = Counter(a_stream) + Counter(b_stream)
    # combined-stream bound: undercount ≤ εa + εb + merge trim ≤ 2·N/(cap+1)
    for tok, c in true.items():
        if c > 2 * n // (cap + 1) + 2:
            assert tok in merged, (tok, c, merged)
        if tok in merged:
            assert merged[tok] <= c
    assert ea * (cap + 1) <= len(a_stream)
    assert eb * (cap + 1) <= len(b_stream)


def test_validation(spark):
    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="support_denom"):
        heavy_hitter_tokens(df, support_denom=0)
    with pytest.raises(ValueError, match="sketch_cap"):
        heavy_hitter_tokens(df, support_denom=100, sketch_cap=50)


def test_two_phase_plan_shape(spark):
    """100 TB shape: the recount joins the token stream against the
    BROADCAST candidate set (left semi — the exchange carries candidate
    tokens only, never the vocabulary), the sketch runs as one
    Arrow-batched Python stage, nothing range-partitions (no global
    sort), and the corpus-sized token stream is NOT cached by default
    (persist_tokens=False since r10): two columnar text scans, with only
    the cap-sized SKETCH persisted between the total/candidate reads."""
    import __spark_entry__ as entrymod
    from tests.conftest import SF_SMALL

    df = entrymod.queries()["heavy_hitter_tokens"](spark, SF_SMALL)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    release_cached()
    assert "MapInPandas" in plan  # the MG sketch pass
    assert re.search(r"BroadcastHashJoin.*LeftSemi", plan), plan
    assert "rangepartitioning" not in plan
    # TWO parquet scans of text (sketch pass + exact recount): the
    # corpus-sized exploded token stream must not appear as a cache.
    scans = len(re.findall(r"\(\d+\) Scan parquet", plan))
    assert scans == 2, plan
    assert "InMemoryTableScan" in plan  # the cap-sized sketch only


def test_persist_tokens_paths_identical(spark):
    """persist_tokens trades a corpus-sized cache for a second scan —
    the emitted set and counts must be identical on both paths."""
    texts = [
        "spark spark spark join join scan",
        "spark join filter filter rare1",
        "spark scan scan rare2 rare3",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    two_scan = sorted(
        map(tuple, heavy_hitter_tokens(df, support_denom=4).collect())
    )
    release_cached()
    cached = sorted(
        map(
            tuple,
            heavy_hitter_tokens(
                df, support_denom=4, persist_tokens=True
            ).collect(),
        )
    )
    release_cached()
    assert two_scan == cached == [("spark", 5, 16)]


def test_query_matches_oracle_fixture(spark, duck):
    import __spark_entry__ as entrymod
    from tests.conftest import SF_SMALL, assert_df_matches_oracle

    assert_df_matches_oracle(
        entrymod.queries()["heavy_hitter_tokens"](spark, SF_SMALL),
        duck,
        entrymod.oracle_sql()["heavy_hitter_tokens"],
    )
    release_cached()
