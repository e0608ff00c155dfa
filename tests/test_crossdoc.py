"""Cross-document exact substring dedup (pipeline/crossdoc.py): planted
shared-boilerplate spans are found with exact positions/lengths, sharer
counts respect exact-duplicate multiplicity via the pre-collapse star
re-expansion, intra-doc repeats do NOT count as sharers, and the strip
face removes exactly the covered tokens."""

from __future__ import annotations

import pytest

from flink_streaming_2_10_spark.pipeline.caching import release_cached
from flink_streaming_2_10_spark.pipeline.crossdoc import (
    cross_doc_shared_spans,
    strip_shared_spans,
)

BOILER = "all rights reserved by the mirror site network"  # 8 tokens


def _collect(df):
    rows = sorted(
        (r["doc_id"], r["span_start"], r["span_len"], r["n_sharers"])
        for r in df.collect()
    )
    return rows


def test_planted_boilerplate_span_found_with_exact_bounds(spark):
    # Doc 1: 5 unique tokens, BOILER at positions 6-13, 4 unique tokens.
    # Doc 2: BOILER at positions 1-8, then unique tail.
    # Doc 3: fully unique.
    d1 = f"alpha beta gamma delta epsilon {BOILER} zeta eta theta iota"
    d2 = f"{BOILER} kappa lambda mu nu xi omicron"
    d3 = "totally unique words nothing shared with any other document here"
    df = spark.createDataFrame(
        [(1, d1), (2, d2), (3, d3)], ["doc_id", "text"]
    )
    got = _collect(cross_doc_shared_spans(df, window=5, min_sharers=2))
    release_cached()
    # 8-token boiler with window 5 ⇒ matched starts form one maximal run
    # of 4 positions ⇒ span_len = 4 - 1 + 5 = 8 (the whole boiler).
    assert got == [(1, 6, 8, 2), (2, 1, 8, 2)]


def test_exact_duplicate_classes_count_as_sharers(spark):
    # 3 exact copies of one text + 1 unique: every window of the copied
    # text has 3 sharers, so each copy reports one whole-doc span with
    # n_sharers = 3; positions come from the class representative but
    # apply to every member (identical token arrays).
    t = "the same page content repeated verbatim across three mirrors"
    rows = [(i, t) for i in (10, 11, 12)] + [
        (13, "some other entirely unrelated document text body here")
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = _collect(cross_doc_shared_spans(df, window=4, min_sharers=2))
    release_cached()
    n = len(t.split())
    want = [(i, 1, n, 3) for i in (10, 11, 12)]
    assert got == want


def test_intra_doc_repeat_is_not_cross_document(spark):
    # The phrase repeats TWICE inside doc 1 but appears in no other doc:
    # sharer count is per-document, so nothing is flagged.
    d1 = "fill one two three fill fill one two three fill tail words"
    df = spark.createDataFrame(
        [(1, d1), (2, "completely different content goes here now")],
        ["doc_id", "text"],
    )
    got = _collect(cross_doc_shared_spans(df, window=3, min_sharers=2))
    release_cached()
    assert got == []


def test_two_separated_spans_stay_separate(spark):
    a = "shared head phrase one"          # 4 tokens
    b = "common tail snippet two"         # 4 tokens
    d1 = f"{a} unique middle filler words here {b}"
    d2 = f"{a} other body entirely different tokens {b}"
    df = spark.createDataFrame([(1, d1), (2, d2)], ["doc_id", "text"])
    got = _collect(cross_doc_shared_spans(df, window=4, min_sharers=2))
    release_cached()
    # d1: head at 1..4, tail at 10..13; d2: head at 1..4, tail at 10..13.
    assert got == [
        (1, 1, 4, 2), (1, 10, 4, 2),
        (2, 1, 4, 2), (2, 10, 4, 2),
    ]


def test_flood_of_exact_copies_is_pre_collapsed(spark):
    # 300 copies of one boilerplate page + 2 distinct docs sharing a
    # phrase: output is linear in members (300 whole-doc spans + 2), and
    # the window/sharer machinery only ever saw 3 distinct texts.
    rows = [(i, f"{BOILER} boilerplate page body stays identical") for i in
            range(300)]
    rows += [
        (1000, f"prefix words {BOILER} suffix words"),
        (1001, f"{BOILER} and then a different continuation entirely"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = cross_doc_shared_spans(df, window=8, min_sharers=2)
    got = _collect(out)
    release_cached()
    assert len(got) == 302
    # every flood copy: one whole-page span with 302 sharers on the
    # boiler windows — n_sharers is the span MIN, and the flood page's
    # non-boiler windows have 300 sharers.
    flood = [g for g in got if g[0] < 300]
    assert all(g[1] == 1 and g[3] == 300 for g in flood)
    # the two distinct docs share only the 8-token boiler (window=8 ⇒
    # single position), with 302 sharers (300 copies + both).
    assert (1000, 3, 8, 302) in got and (1001, 1, 8, 302) in got


def test_strip_removes_exactly_covered_tokens(spark):
    d1 = f"alpha beta gamma delta epsilon {BOILER} zeta eta theta iota"
    d2 = f"{BOILER} kappa lambda mu nu xi omicron"
    d3 = "totally unique words nothing shared with any other document here"
    df = spark.createDataFrame(
        [(1, d1), (2, d2), (3, d3)], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["stripped_text"])
        for r in strip_shared_spans(df, window=5, min_sharers=2).collect()
    }
    release_cached()
    assert got[1] == (
        17, 8, "alpha beta gamma delta epsilon zeta eta theta iota"
    )
    assert got[2] == (14, 8, "kappa lambda mu nu xi omicron")
    assert got[3] == (10, 0, d3)


def test_parameter_validation(spark):
    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="window"):
        cross_doc_shared_spans(df, window=0)
    with pytest.raises(ValueError, match="min_sharers"):
        cross_doc_shared_spans(df, min_sharers=1)
