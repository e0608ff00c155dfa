"""Text-analysis tests: token counting, quality scoring, language ID,
rolling-hash fingerprints — fixtures with known answers + a Python
reference implementation for the fingerprint."""

from __future__ import annotations

import pytest

from flink_streaming_2_10_spark.catalog import load_table
from flink_streaming_2_10_spark.pipeline.textstats import (
    FINGERPRINT_MOD,
    doc_fingerprints,
    language_id,
    quality_scores,
    token_counts,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def fixture_docs(spark):
    rows = [
        (1, "The cat sat on the mat, and it was happy."),
        (2, "Der Hund ist nicht in der Schule und ich bin zu Hause."),
        (3, "El perro es un animal que vive en la casa con los gatos."),
        (4, "Le chat est une créature que je ne comprends pas des fois."),
        (5, "这是一个中文句子 with some latin."),
        (6, "xyzzy plugh 42 7!!"),
        (7, ""),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_token_counts_fixture(fixture_docs):
    out = {r["doc_id"]: r for r in token_counts(fixture_docs).collect()}
    assert out[1]["ws_tokens"] == 10
    assert out[7]["ws_tokens"] == 0 and out[7]["bpe_tokens"] == 0
    # "xyzzy plugh 42 7!!" → xyzzy, plugh, 4, 2, 7, !! = 6 BPE-ish tokens
    assert out[6]["bpe_tokens"] == 6
    assert out[1]["n_chars"] == len("The cat sat on the mat, and it was happy.")


def test_quality_scores_ordering(fixture_docs):
    out = {r["doc_id"]: r for r in quality_scores(fixture_docs).collect()}
    # English prose with stopwords beats digit/punct gibberish
    assert out[1]["quality"] > out[6]["quality"]
    assert out[1]["stop_ratio"] > 0.3
    assert out[6]["digit_ratio"] > 0
    assert 0.0 <= out[7]["quality"] <= 1.0
    for r in out.values():
        assert 0.0 <= r["quality"] <= 1.0


def test_language_id_fixture(fixture_docs):
    out = {r["doc_id"]: r["lang_pred"] for r in language_id(fixture_docs).collect()}
    assert out[1] == "en"
    assert out[2] == "de"
    assert out[3] == "es"
    assert out[4] == "fr"
    assert out[5] == "zh"  # CJK chars dominate regardless of latin tail
    assert out[6] == "unknown"
    assert out[7] == "unknown"


def test_fingerprint_matches_python_reference(fixture_docs):
    out = {r["doc_id"]: r["fingerprint"] for r in doc_fingerprints(fixture_docs).collect()}

    def ref(text: str) -> int:
        h = 0
        for ch in text:
            h = (h * 31 + ord(ch)) % FINGERPRINT_MOD
        return h

    rows = {
        1: "The cat sat on the mat, and it was happy.",
        5: "这是一个中文句子 with some latin.",
        7: "",
    }
    for doc_id, text in rows.items():
        assert out[doc_id] == ref(text), doc_id


def test_fingerprint_distinguishes_docs(spark):
    docs = load_table(spark, SF_DIR, "documents")
    fps = doc_fingerprints(docs)
    n = docs.count()
    distinct = fps.select("fingerprint").distinct().count()
    # rolling hash over 2^53: collisions on ~50 docs essentially impossible
    assert distinct == fps.count() == n


def test_language_id_runs_on_testdata(spark):
    docs = load_table(spark, SF_DIR, "documents")
    out = language_id(docs)
    assert out.count() == docs.count()
    langs = {r["lang_pred"] for r in out.collect()}
    assert langs <= {"en", "de", "es", "fr", "zh", "unknown"}


def test_repetition_stats_hand_computed(spark):
    from flink_streaming_2_10_spark.pipeline.textstats import repetition_stats

    rows = [
        (1, "a b a b a b"),          # heavy repetition
        (2, "one two three four"),   # all distinct
        (3, "solo"),                 # < 2 words: no bigram
        (4, ""),                     # empty
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r.asDict() for r in repetition_stats(df).collect()}

    r1 = out[1]
    assert r1["n_words"] == 6
    assert r1["dup_word_frac"] == (6 - 2) / 6
    # trigrams: [a b a, b a b, a b a, b a b] -> 4 total, 2 distinct
    assert r1["dup_trigram_frac"] == (4 - 2) / 4
    # bigram counts: "a b" x3, "b a" x2 -> top is "a b"
    assert r1["top_bigram"] == "a b"
    assert r1["top_bigram_frac"] == 3 * 3 / len("a b a b a b")

    r2 = out[2]
    assert r2["dup_word_frac"] == 0.0 and r2["dup_trigram_frac"] == 0.0
    # all bigrams tie at cnt=1 -> lexicographically largest wins
    assert r2["top_bigram"] == "two three"

    assert out[3]["top_bigram"] is None and out[3]["top_bigram_frac"] == 0.0
    assert out[4]["n_words"] == 0 and out[4]["dup_word_frac"] == 0.0


def test_repetition_query_matches_oracle(spark, duck):
    import __spark_entry__ as entrymod
    from tests.conftest import SF_SMALL, assert_df_matches_oracle

    got = entrymod.queries()["text_repetition"](spark, SF_SMALL)
    assert_df_matches_oracle(got, duck, entrymod.oracle_sql()["text_repetition"])


def test_top_ngrams_doc_frequency_not_term_frequency(spark):
    from flink_streaming_2_10_spark.pipeline.textstats import top_ngrams

    df = spark.createDataFrame(
        [
            (1, "a b c a b c a b c"),  # "a b c" 3x in one doc -> df 1
            (2, "a b c x y z"),
            (3, "x y z only here"),
        ],
        ["doc_id", "text"],
    )
    got = {r["ngram"]: r["doc_freq"] for r in top_ngrams(df, n=3, k=10).collect()}
    assert got["a b c"] == 2  # docs 1 and 2, not 4 occurrences
    assert got["x y z"] == 2


def test_top_ngrams_cut_is_deterministic(spark):
    from flink_streaming_2_10_spark.pipeline.textstats import top_ngrams

    # 4 grams with equal df; k=2 must keep the lexicographically first two
    df = spark.createDataFrame(
        [(1, "p q r"), (2, "a b c"), (3, "m n o"), (4, "d e f")],
        ["doc_id", "text"],
    )
    rows = top_ngrams(df, n=3, k=2).collect()
    assert [r["ngram"] for r in rows] == ["a b c", "d e f"]


def test_length_histogram_integer_bucket_edges(spark):
    from flink_streaming_2_10_spark.pipeline.textstats import length_histogram

    # 9 tokens -> magnitude 1; 10 tokens -> magnitude 2 (exact edge);
    # 0 tokens -> its OWN magnitude-0 bucket, not hidden inside 1-9.
    df = spark.createDataFrame(
        [
            ("en", " ".join(["w"] * 9)),
            ("en", " ".join(["w"] * 10)),
            ("en", ""),
            ("de", "one two"),
        ],
        ["lang", "text"],
    )
    got = {
        (r["lang"], r["magnitude"]): (r["n_docs"], r["total_tokens"])
        for r in length_histogram(df).collect()
    }
    assert got[("en", 0)] == (1, 0)
    assert got[("en", 1)] == (1, 9)
    assert got[("en", 2)] == (1, 10)
    assert got[("de", 1)] == (1, 2)


def test_token_percentiles_match_builtin_percentile_cont(spark):
    """The histogram-based percentile must be BIT-identical to Spark's
    percentile_cont (which buffers all group values — the thing the
    histogram formulation avoids at scale)."""
    from pyspark.sql import functions as F

    from flink_streaming_2_10_spark.catalog import load_table
    from flink_streaming_2_10_spark.pipeline.textstats import (
        BPE_PATTERN,
        token_percentiles,
    )
    from tests.conftest import SF_SMALL

    docs = load_table(spark, SF_SMALL, "documents")
    mine = {r["lang"]: r for r in token_percentiles(docs).collect()}
    docs.select(
        "lang",
        F.regexp_count("text", F.lit(BPE_PATTERN)).cast("long").alias("tk"),
    ).createOrReplaceTempView("__tk")
    ref = spark.sql(
        """SELECT lang, count(*) AS n_docs,
             percentile_cont(0.5) WITHIN GROUP (ORDER BY tk) AS p50,
             percentile_cont(0.9) WITHIN GROUP (ORDER BY tk) AS p90,
             percentile_cont(0.99) WITHIN GROUP (ORDER BY tk) AS p99
           FROM __tk GROUP BY lang"""
    ).collect()
    assert len(ref) == len(mine)
    for r in ref:
        m = mine[r["lang"]]
        for c in ("n_docs", "p50", "p90", "p99"):
            assert m[c] == r[c], (r["lang"], c, m[c], r[c])


def test_token_percentiles_single_doc_group(spark):
    from flink_streaming_2_10_spark.pipeline.textstats import token_percentiles

    df = spark.createDataFrame([("xx", "one two three")], ["lang", "text"])
    row = token_percentiles(df).collect()[0]
    # n=1: every percentile is the single value (3 tokens)
    assert (row["n_docs"], row["p50"], row["p90"], row["p99"]) == (1, 3.0, 3.0, 3.0)


def test_collocations_lift_value_and_order(spark):
    from flink_streaming_2_10_spark.pipeline.textstats import collocations

    # "new york" appears 4x and its words appear ONLY together (max lift);
    # "of the" appears 4x but both words are common elsewhere (low lift)
    docs = spark.createDataFrame(
        [
            (1, "new york of the city"),
            (2, "new york of the state"),
            (3, "new york of the port"),
            (4, "new york of the bay the of"),
        ],
        ["doc_id", "text"],
    )
    rows = collocations(docs, min_count=4, k=10).collect()
    got = {(r["w1"], r["w2"]): r for r in rows}
    assert set(got) == {("new", "york"), ("york", "of"), ("of", "the")}
    # exact lift for (new, york): c_ab=4 of n_bi=18 bigrams; c_a=c_b=4 of
    # n_uni=22 words
    r = got[("new", "york")]
    assert r["c_ab"] == 4
    assert r["lift"] == (4 / 18) / ((4 / 22) * (4 / 22))
    # uniquely-paired words outrank the common-word bigram
    lifts = [(r["w1"], r["w2"], r["lift"]) for r in rows]
    assert lifts[0][:2] == ("new", "york")
    assert got[("new", "york")]["lift"] > got[("of", "the")]["lift"]


def test_despan_planted_repeated_spans(spark):
    """Planted adjacent repeats: exact removal counts and despanned text
    for periods 1..3; distant (non-adjacent) repeats untouched."""
    from flink_streaming_2_10_spark.pipeline.textstats import despan_repeated

    docs = spark.createDataFrame(
        [
            (1, "very very very very good"),        # p=1 run
            (2, "ab cd ab cd ab cd"),               # p=2 run
            (3, "x y z x y z x y z"),               # p=3 run
            (4, "the cat sat on the mat"),          # distant repeat: kept
            (5, ""),                                 # empty doc
            (6, "Spam! spam, SPAM? eggs"),           # case/punct-insensitive p=1
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in despan_repeated(docs, max_period=3).collect()}
    assert out[1]["despanned_text"] == "very good"
    assert (out[1]["n_tokens"], out[1]["n_removed"]) == (5, 3)
    assert out[2]["despanned_text"] == "ab cd ab"
    assert out[3]["despanned_text"] == "x y z x y"
    assert out[4]["despanned_text"] == "the cat sat on the mat"
    assert out[4]["n_removed"] == 0
    assert (out[5]["n_tokens"], out[5]["despanned_text"]) == (0, "")
    assert out[5]["despan_ratio"] == 0.0
    assert out[6]["despanned_text"] == "spam eggs"


def test_despan_kfold_repeat_bounded_by_2p_minus_1(spark):
    """Invariant: a k-fold adjacent repeat of a p-token unit keeps at
    most 2p-1 tokens regardless of k, for every p <= max_period."""
    from flink_streaming_2_10_spark.pipeline.textstats import despan_repeated

    rows = []
    did = 0
    units = {1: "foo", 2: "foo bar", 3: "foo bar baz"}
    for p, unit in units.items():
        for k in (2, 5, 40):
            did += 1
            rows.append((did, p, k, " ".join([unit] * k)))
    docs = spark.createDataFrame(rows, ["doc_id", "p", "k", "text"])
    out = {r["doc_id"]: r for r in despan_repeated(docs, max_period=3).collect()}
    for doc_id, p, k, _ in rows:
        r = out[doc_id]
        kept = r["n_tokens"] - r["n_removed"]
        assert kept <= 2 * p - 1, (doc_id, p, k, kept)
        assert r["n_tokens"] == p * k


def test_despan_matches_oracle(spark, duck):
    """Full despan query vs the DuckDB oracle on the real testdata."""
    import __spark_entry__ as entrymod
    from tests.conftest import SF_SMALL, assert_df_matches_oracle

    assert_df_matches_oracle(
        entrymod.queries()["text_despan"](spark, SF_SMALL),
        duck,
        entrymod.oracle_sql()["text_despan"],
    )


def test_despan_window_strategy_parity_with_hof(spark):
    """The two exact strategies are the same function: identical output
    on planted fixtures AND real testdata docs, for several periods."""
    from flink_streaming_2_10_spark.pipeline.textstats import despan_repeated

    planted = spark.createDataFrame(
        [
            (1, "very very very very good"),
            (2, "ab cd ab cd ab cd"),
            (3, "x y z x y z x y z"),
            (4, "the cat sat on the mat"),
            (5, ""),
            (6, "Spam! spam, SPAM? eggs"),
            (7, "a b a b a b a b c a a a"),
        ],
        ["doc_id", "text"],
    )
    real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for docs in (planted, real):
        for p in (1, 3, 5):
            hof = despan_repeated(docs, max_period=p, strategy="hof")
            win = despan_repeated(docs, max_period=p, strategy="window")
            a = sorted(map(tuple, hof.collect()))
            b = sorted(map(tuple, win.collect()))
            assert a == b, (p, a[:3], b[:3])


def test_despan_long_period_boilerplate_p20(spark):
    """The r8-verdict gap: a 20-token boilerplate unit repeated k-fold is
    invisible at max_period=3 but collapses under the window strategy at
    max_period=20, honoring the k-fold <= 2p-1 invariant."""
    from flink_streaming_2_10_spark.pipeline.textstats import despan_repeated

    unit = " ".join(f"tok{i}" for i in range(20))
    docs = spark.createDataFrame(
        [
            (1, " ".join([unit] * 6)),               # 6-fold p=20 loop
            (2, f"head words {' '.join([unit] * 3)} tail"),
            (3, "entirely unrepetitive text body"),
        ],
        ["doc_id", "text"],
    )
    small = {
        r["doc_id"]: r for r in despan_repeated(docs, max_period=3).collect()
    }
    assert small[1]["n_removed"] == 0  # out of reach for p<=3
    out = {
        r["doc_id"]: r
        for r in despan_repeated(docs, max_period=20).collect()
    }
    # Removal starts at t = 2p: a k-fold p-unit loop keeps exactly
    # 2p-1 tokens (unit + all but the last token of its second copy).
    head39 = " ".join([unit, " ".join(f"tok{i}" for i in range(19))])
    assert out[1]["n_tokens"] == 120
    assert out[1]["despanned_text"] == head39
    assert out[1]["n_removed"] == 120 - 39
    assert out[2]["n_removed"] == 60 - 39
    assert out[2]["despanned_text"] == f"head words {head39} tail"
    assert out[3]["n_removed"] == 0


def test_despan_p20_matches_duckdb_oracle(spark, duck):
    """Window-strategy despan at max_period=20 vs the parametric DuckDB
    oracle over real testdata plus a planted long-period fixture."""
    import __spark_entry__ as entrymod
    from tests.conftest import SF_SMALL, assert_df_matches_oracle
    from flink_streaming_2_10_spark.catalog import load_table
    from flink_streaming_2_10_spark.pipeline.textstats import despan_repeated

    unit = " ".join(f"w{i}" for i in range(17))
    planted = [
        (9001, " ".join([unit] * 5)),
        (9002, f"intro {' '.join([unit] * 2)} outro"),
    ]
    docs = load_table(spark, SF_SMALL, "documents").select(
        "doc_id", "text"
    ).union(spark.createDataFrame(planted, ["doc_id", "text"]))
    duck.execute(
        "CREATE OR REPLACE TEMP VIEW despan20_docs AS "
        f"SELECT doc_id, text FROM read_parquet('{SF_SMALL}/documents.parquet') "
        "UNION ALL SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in planted)
        + ") v(doc_id, text)"
    )
    sql = entrymod._text_despan_oracle(max_period=20).replace(
        "FROM documents", "FROM despan20_docs"
    )
    assert_df_matches_oracle(
        despan_repeated(docs, max_period=20), duck, sql
    )


def test_corpus_summary_consistent_with_per_doc_queries(spark):
    """One-pass rollup equals recomputing from the per-doc operators."""
    from flink_streaming_2_10_spark.pipeline.textstats import (
        corpus_summary,
        language_id,
        quality_scores,
        token_counts,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    row = corpus_summary(docs, hasher="md5").collect()[0]
    n = docs.count()
    assert row["n_docs"] == n
    q = {r["doc_id"]: r["quality"] for r in quality_scores(docs).collect()}
    langs = {r["doc_id"]: r["lang_pred"] for r in language_id(docs).collect()}
    nw = {r["doc_id"]: r["n_words"] for r in quality_scores(docs).collect()}
    assert row["n_tokens"] == sum(nw.values())
    assert row["n_quality_ge_half"] == sum(1 for v in q.values() if v >= 0.5)
    assert row["n_english"] == sum(1 for v in langs.values() if v == "en")
    assert row["mean_doc_tokens"] == sum(nw.values()) / n
    # KMV estimate is within its ~12.5% band of the true distinct count
    # (few duplicates at this SF, far below K ⇒ near-exact regime).
    true_distinct = docs.selectExpr(
        "regexp_replace(lower(text), '\\\\s+', ' ') AS t"
    ).distinct().count()
    assert abs(row["est_distinct_texts"] - true_distinct) / true_distinct < 0.3


def test_corpus_summary_empty_corpus(spark):
    from flink_streaming_2_10_spark.pipeline.textstats import corpus_summary

    empty = spark.createDataFrame([], "doc_id long, text string")
    row = corpus_summary(empty).collect()[0]
    assert (
        row["n_docs"], row["n_tokens"], row["mean_doc_tokens"],
        row["n_quality_ge_half"], row["n_english"],
        row["est_distinct_texts"],
    ) == (0, 0, 0.0, 0, 0, 0.0)


def test_corpus_summary_state_merges_exactly_to_one_shot(spark):
    """Mergeable-state contract: batch states folded in ANY order
    finalize to the BIT-identical row the one-shot summary computes."""
    from flink_streaming_2_10_spark.pipeline.textstats import (
        corpus_summary,
        corpus_summary_state,
        finalize_summary,
        merge_summary_states,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    batches = [
        docs.filter(f"doc_id % 3 = {i}") for i in range(3)
    ]
    states = [
        corpus_summary_state(b, hasher="md5").collect()[0].asDict()
        for b in batches
    ]
    one_shot = corpus_summary(docs, hasher="md5").collect()[0].asDict()
    merged_fwd = {}
    for s in states:
        merged_fwd = merge_summary_states(merged_fwd, s)
    merged_rev = {}
    for s in reversed(states):
        merged_rev = merge_summary_states(merged_rev, s)
    assert finalize_summary(merged_fwd) == one_shot
    assert finalize_summary(merged_rev) == one_shot
    # empty state is the identity; finalizing it gives the zero row
    assert merge_summary_states({}, states[0]) == states[0]
    assert finalize_summary({})["n_docs"] == 0


def test_script_mix_multiscript_fixture(spark):
    """Bucket correctness on actual non-ASCII text (the driver corpus is
    ASCII-only, so THIS is where the codepoint classes are exercised):
    counts are per-codepoint, buckets disjoint, remainder exact."""
    from flink_streaming_2_10_spark.pipeline.textstats import script_mix

    rows = [
        (1, "Hello мир 世界 123"),          # latin5 cyr3 cjk2 digit3 space3
        (2, "مرحبا"),                        # arabic 5
        (3, "tab\there"),                    # whitespace class covers \t
        (4, ""),                             # empty
        (5, "№☂"),                           # neither bucket → other
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r.asDict() for r in script_mix(df).collect()}
    assert got[1] == {
        "doc_id": 1, "n_chars": 16, "n_latin": 5, "n_digit": 3,
        "n_cyrillic": 3, "n_cjk": 2, "n_arabic": 0, "n_space": 3,
        "n_other": 0,
    }
    assert got[2]["n_arabic"] == 5 and got[2]["n_other"] == 0
    assert got[3]["n_space"] == 1 and got[3]["n_latin"] == 7
    assert got[4]["n_chars"] == 0 and got[4]["n_other"] == 0
    assert got[5] == {
        "doc_id": 5, "n_chars": 2, "n_latin": 0, "n_digit": 0,
        "n_cyrillic": 0, "n_cjk": 0, "n_arabic": 0, "n_space": 0,
        "n_other": 2,
    }


def test_script_mix_duckdb_parity_on_nonascii(spark):
    """Java-regex vs RE2 parity for the non-ASCII classes themselves —
    run the ORACLE SQL over the same multiscript rows via a temp duckdb
    relation and compare full row sets."""
    import duckdb
    import pandas as pd

    import __spark_entry__ as entrymod
    from flink_streaming_2_10_spark.pipeline.textstats import script_mix

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["Ѐӿ؀ۿ一鿿 edges", "mixed мир world 42", "\t\n\r\f "],
        }
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    oracle = con.sql(entrymod.oracle_sql()["text_script_mix"]).df()
    spark_out = script_mix(
        spark.createDataFrame(pdf, ["doc_id", "text"])
    ).toPandas()
    a = spark_out.sort_values("doc_id").reset_index(drop=True)
    b = oracle[a.columns].sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_script_mix_plan_zero_shuffle(spark):
    from flink_streaming_2_10_spark.pipeline.textstats import script_mix
    import contextlib, io

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        script_mix(docs).explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan
    assert "codegen id" in plan  # whole-stage-codegen project


# ---------------------------------------------------------------------------
# novelty_scores (r11)
# ---------------------------------------------------------------------------


def test_novelty_planted_fixture(spark):
    from flink_streaming_2_10_spark.pipeline.textstats import novelty_scores

    docs = spark.createDataFrame(
        [
            # 1 and 2 are verbatim copies: every trigram shared -> 0.0.
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta epsilon"),
            # 3 shares its first trigram with 1/2, second is unique:
            # grams = {alpha beta gamma, beta gamma zeta} -> 1/2.
            (3, "alpha beta gamma zeta"),
            # 4 is fully original -> 1.0.
            (4, "one two three four"),
            # 5 too short for a trigram -> zeros.
            (5, "tiny doc"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in novelty_scores(docs, n=3).collect()
    }
    assert got[1]["novel_frac"] == 0.0 and got[2]["novel_frac"] == 0.0
    assert got[3]["n_distinct_grams"] == 2 and got[3]["novel_frac"] == 0.5
    assert got[4]["novel_frac"] == 1.0
    assert got[5] == {
        "doc_id": 5,
        "n_distinct_grams": 0,
        "n_novel": 0,
        "novel_frac": 0.0,
    }


def test_novelty_repeated_gram_within_one_doc_still_novel(spark):
    from flink_streaming_2_10_spark.pipeline.textstats import novelty_scores

    # The same trigram occurring twice INSIDE one doc is doc-distinct
    # (set semantics) — df stays 1, so it still counts as novel.
    docs = spark.createDataFrame(
        [(1, "a b c a b c"), (2, "x y z w")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in novelty_scores(docs, n=3).collect()
    }
    # grams of doc 1: {a b c, b c a, c a b} — all unique to doc 1.
    assert got[1]["n_distinct_grams"] == 3
    assert got[1]["novel_frac"] == 1.0


def test_tokenizer_fertility_hand_computed(spark):
    from flink_streaming_2_10_spark.pipeline.textstats import (
        tokenizer_fertility,
    )

    docs = spark.createDataFrame(
        [
            # "don't stop" -> ws 2; BPE-ish: don,',t,stop = 4.
            (1, "don't stop", "en"),
            # "abc 123" -> ws 2; BPE-ish: abc,1,2,3 = 4.
            (2, "abc 123", "en"),
            # plain words, fertility 1.0.
            (3, "uno dos tres", "es"),
            (4, "", "fr"),
        ],
        "doc_id long, text string, lang string",
    )
    got = {r["lang"]: r.asDict() for r in tokenizer_fertility(docs).collect()}
    assert got["en"]["ws_tokens"] == 4 and got["en"]["bpe_tokens"] == 8
    assert got["en"]["fertility"] == 2.0
    assert got["es"]["fertility"] == 1.0
    assert got["fr"] == {
        "lang": "fr",
        "n_docs": 1,
        "ws_tokens": 0,
        "bpe_tokens": 0,
        "fertility": 0.0,
    }


def test_lang_label_audit_counts(spark):
    """Composition replica of the lang_label_audit query shape on a
    planted fixture where agreement is known exactly."""
    from pyspark.sql import functions as F

    from flink_streaming_2_10_spark.pipeline.textstats import language_id

    docs = spark.createDataFrame(
        [
            (1, "the and is of to in it", "en"),      # en stopwords
            (2, "der und die das ist nicht", "de"),   # de stopwords
            (3, "xqz vbn mlk", "en"),                 # no stopwords
        ],
        "doc_id long, text string, lang string",
    )
    joined = docs.select("doc_id", "lang").join(
        language_id(docs), "doc_id"
    )
    agg = {
        r["lang"]: r.asDict()
        for r in joined.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when(F.col("lang_pred") == F.col("lang"), 1).otherwise(0)
            ).alias("n_agree"),
            F.sum(
                F.when(F.col("lang_pred") == "unknown", 1).otherwise(0)
            ).alias("n_unknown"),
        )
        .collect()
    }
    assert agg["en"]["n_docs"] == 2 and agg["en"]["n_agree"] == 1
    assert agg["en"]["n_unknown"] == 1
    assert agg["de"]["n_agree"] == 1
