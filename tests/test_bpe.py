"""BPE merge-training tests: the hand-computed Sennrich-style fixture,
greedy left-to-right run semantics (the l==r islands case), early
exhaustion, segmentation round-trip, and DuckDB oracle parity."""

from __future__ import annotations

from flink_streaming_2_10_spark.pipeline.bpe import (
    _apply_merge,
    _char_symbols,
    segment_words,
    segment_words_greedy,
    train_bpe_merges,
    word_counts,
)


def _wc(spark, counts: dict[str, int]):
    return spark.createDataFrame(
        [(w, c) for w, c in counts.items()], ["word", "cnt"]
    )


def _symbols(state) -> dict[str, list[str]]:
    out: dict[str, list[tuple[int, str]]] = {}
    for r in state.collect():
        out.setdefault(r["word"], []).append((r["pos"], r["sym"]))
    return {w: [s for _, s in sorted(v)] for w, v in out.items()}


def test_hand_computed_merge_sequence(spark):
    # The classic fixture (Sennrich et al. 2016 §3 shape), weighted:
    # low×5 lower×2 newest×6 widest×3.  Pair totals round 1:
    # es=9 st=9 we=8 lo=7 ow=7 ne=6 ew=6 er=2 wi=3 id=3 de=3
    # → ties break (count DESC, left ASC, right ASC).
    wc = _wc(spark, {"low": 5, "lower": 2, "newest": 6, "widest": 3})
    got = [
        (r["merge_rank"], r["left_sym"], r["right_sym"], r["pair_count"])
        for r in train_bpe_merges(wc, n_merges=5)
        .orderBy("merge_rank")
        .collect()
    ]
    assert got == [
        (1, "e", "s", 9),   # es=st=9, e<s
        (2, "es", "t", 9),  # newest/widest now end  es,t
        (3, "l", "o", 7),   # lo=ow=7, l<o
        (4, "lo", "w", 7),
        (5, "e", "w", 6),   # ne=ew=west… all 6; e<n<w
    ]


def test_greedy_left_runs_l_equals_r(spark):
    # "aaaa" → (aa)(aa); "aaaaa" → (aa)(aa)(a); "aba" untouched —
    # the islands-parity argument in the module docstring.
    state = _char_symbols(_wc(spark, {"aaaa": 1, "aaaaa": 1, "aba": 1}))
    merged = _symbols(_apply_merge(state, "a", "a"))
    assert merged == {
        "aaaa": ["aa", "aa"],
        "aaaaa": ["aa", "aa", "a"],
        "aba": ["a", "b", "a"],
    }


def test_adjacent_nonoverlapping_l_ne_r(spark):
    # "abab" → (ab)(ab): consecutive occurrences with no shared symbol.
    # "aab" → a,(ab): the merged pair takes the LEFTMOST r.  "xab" left
    # boundary, "abx" right boundary.
    state = _char_symbols(_wc(spark, {"abab": 1, "aab": 1, "xab": 1, "abx": 1}))
    merged = _symbols(_apply_merge(state, "a", "b"))
    assert merged == {
        "abab": ["ab", "ab"],
        "aab": ["a", "ab"],
        "xab": ["x", "ab"],
        "abx": ["ab", "x"],
    }


def test_exhaustion_stops_early(spark):
    # One word, two chars: exactly one merge possible.
    stats: dict = {}
    merges = train_bpe_merges(
        _wc(spark, {"ab": 4}), n_merges=10, stats=stats
    ).collect()
    assert stats["rounds"] == 1
    assert [(r["left_sym"], r["right_sym"], r["pair_count"]) for r in merges] == [
        ("a", "b", 4)
    ]


def test_min_pair_count_gate(spark):
    stats: dict = {}
    merges = train_bpe_merges(
        _wc(spark, {"ab": 2, "cd": 2}), n_merges=5,
        min_pair_count=3, stats=stats,
    ).collect()
    assert stats["rounds"] == 0 and merges == []


def test_segment_words_roundtrip(spark):
    wc = _wc(spark, {"low": 5, "lower": 2, "newest": 6, "widest": 3})
    merges = [
        (r["left_sym"], r["right_sym"])
        for r in train_bpe_merges(wc, n_merges=5)
        .orderBy("merge_rank")
        .collect()
    ]
    pieces = {
        r["word"]: list(r["pieces"])
        for r in segment_words(wc, merges).collect()
    }
    assert pieces == {
        "low": ["low"],
        "lower": ["low", "e", "r"],
        "newest": ["n", "ew", "est"],
        "widest": ["w", "i", "d", "est"],
    }


def test_greedy_face_parity_planted(spark):
    """segment_words_greedy (scan-local lowest-rank loop) must produce
    IDENTICAL pieces to segment_words (rank-ordered window passes) on a
    planted vocabulary whose merge table exercises runs (l==r),
    chained merges, and untouched words."""
    wc = _wc(
        spark,
        {
            "low": 5,
            "lower": 2,
            "newest": 6,
            "widest": 3,
            "aaaa": 4,  # l==r islands under a (a,a) merge
            "zzz": 1,  # vocabulary absent from any merge
        },
    )
    merges = [
        (r["left_sym"], r["right_sym"])
        for r in train_bpe_merges(wc, n_merges=8)
        .orderBy("merge_rank")
        .collect()
    ]
    seq = {
        r["word"]: list(r["pieces"])
        for r in segment_words(wc, merges).collect()
    }
    fast = {
        r["word"]: list(r["pieces"])
        for r in segment_words_greedy(wc, merges).collect()
    }
    assert fast == seq
    # Lossless: pieces concatenate back to the word, for every word.
    for w, ps in fast.items():
        assert "".join(ps) == w


def test_greedy_face_parity_corpus_trained(spark):
    """Parity on a REAL corpus-trained table: train on sf0.001
    documents' word counts, segment the full vocabulary with both
    faces."""
    from flink_streaming_2_10_spark.catalog import load_table
    from tests.conftest import SF_SMALL

    docs = load_table(spark, SF_SMALL, "documents")
    wc = word_counts(docs)
    merges = [
        (r["left_sym"], r["right_sym"])
        for r in train_bpe_merges(wc, n_merges=12)
        .orderBy("merge_rank")
        .collect()
    ]
    assert len(merges) == 12
    seq = {
        r["word"]: list(r["pieces"])
        for r in segment_words(wc, merges).collect()
    }
    fast = {
        r["word"]: list(r["pieces"])
        for r in segment_words_greedy(wc, merges).collect()
    }
    assert fast == seq


def test_greedy_face_plan_is_scan_local(spark):
    """The inference face must not shuffle: Scan → ArrowEvalPython →
    project, no Exchange anywhere."""
    import contextlib
    import io

    wc = _wc(spark, {"low": 5, "newest": 6})
    df = segment_words_greedy(wc, [("l", "o"), ("lo", "w")])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "ArrowEvalPython" in plan
    assert "Exchange" not in plan


def test_word_counts_is_weighted_and_tokenized(spark):
    docs = spark.createDataFrame(
        [(1, "Spark spark JOIN!"), (2, "spark scan")],
        ["doc_id", "text"],
    )
    got = {r["word"]: r["cnt"] for r in word_counts(docs).collect()}
    assert got == {"spark": 3, "join": 1, "scan": 1}


def test_oracle_parity_sf_small(spark, duck):
    from tests.conftest import SF_SMALL, assert_df_matches_oracle

    import __spark_entry__ as em

    assert_df_matches_oracle(
        em.queries()["bpe_merges"](spark, SF_SMALL),
        duck,
        em.oracle_sql()["bpe_merges"],
    )
