"""Tweet pipelines (TwitterExample.java; FIXTURES.md F-5)."""

from __future__ import annotations

from flink_streaming_2_10_spark.functions.jsonx import english_tweet_texts
from flink_streaming_2_10_spark.operators.twitter import (
    english_tweet_wordcount,
    fork_find_word_pipeline,
)
from flink_streaming_2_10_spark.sources.generators import (
    from_elements,
    tweet_fixtures,
)


def test_lang_predicate_and_has_text(spark):
    tweets = tweet_fixtures(spark)
    texts = english_tweet_texts(tweets, "json")
    # 3 en tweets with text; the de tweet and the text-less tweet drop out
    assert [r.text for r in texts.collect()] == ["Apache Flink"] * 3


def test_golden_rolling_counts_final_state(spark):
    # Golden constant (TwitterExampleData.java:28): rolling counts end at
    # (apache,3),(flink,3) for the three fixture tweets.
    counts = english_tweet_wordcount(tweet_fixtures(spark), "json")
    assert {(r.word, r.cnt) for r in counts.collect()} == {
        ("apache", 3),
        ("flink", 3),
    }


def test_fork_pipeline_conditional_multi_emit(spark):
    df = from_elements(
        spark,
        "I like Trump today",          # qualifies: 4 words, 1 target hit
        "nothing to see here",         # no hit → emits nothing
        "TRUMP trump tRuMp",           # qualifies: 3 hits
    )
    out = fork_find_word_pipeline(df, "text", target="trump")
    # qualifying lines emit ALL words uppercased, then only target kept
    assert [r.word for r in out.collect()].count("TRUMP") == 4
    assert {r.word for r in out.collect()} == {"TRUMP"}
