"""Word-count operators vs the reference's tokenizer contract
(WordCount.java:106-122; fixture shape FIXTURES.md F-1)."""

from __future__ import annotations

from flink_streaming_2_10_spark.functions.text import tokenize
from flink_streaming_2_10_spark.operators.wordcount import word_count, word_count_pojo
from flink_streaming_2_10_spark.sources.generators import from_elements


def test_tokenizer_lowercases_splits_and_drops_empties(spark):
    df = from_elements(spark, "Hello, World!!", "  one two  ", "")
    words = [r.word for r in tokenize(df, "text").collect()]
    assert sorted(words) == ["hello", "one", "two", "world"]


def test_word_count_final_state(spark):
    # Mirrors the golden rolling-count final state for repeated words
    # (TwitterExampleData.java:28 semantics: 3× "Apache Flink").
    df = from_elements(spark, "Apache Flink", "Apache Flink", "Apache Flink")
    result = {r.word: r.cnt for r in word_count(df, "text").collect()}
    assert result == {"apache": 3, "flink": 3}


def test_pojo_word_count_equals_positional(spark):
    df = from_elements(spark, "a b a", "b c")
    pos = {(r.word, r.cnt) for r in word_count(df, "text").collect()}
    pojo = {
        (r.word, r.total_frequency) for r in word_count_pojo(df, "text").collect()
    }
    assert pos == pojo == {("a", 2), ("b", 2), ("c", 1)}


def test_punctuation_only_line_yields_nothing(spark):
    df = from_elements(spark, "!!! ... ???")
    assert word_count(df, "text").count() == 0
