"""The Twitter-example pipelines (SURVEY.md §2.3 T3-T6).

Reference: ``TwitterExample.java`` — two pipelines over a stream of
tweet-JSON strings:

* Upstream pipeline (``:131-169``, SelectEnglishAndTokenizeFlatMap): parse
  JSON, keep tweets with ``user.lang == 'en'`` and a ``text`` field,
  whitespace-tokenize the text (lowercased, whitespace stripped), emit
  ``(word, 1)`` and rolling-count (keyBy(0).sum(1), ``:82`` commented but
  golden data at TwitterExampleData.java:28 encodes it).
* The fork's pipeline (``:84-102``): space-split each raw line; if any word
  equals a target word case-insensitively, emit every word uppercased; then
  keep only tokens equal to the target.

The target word is a parameter (the fork hardcodes a politician's name; any
needle works — the semantics are "conditional multi-emit + equality filter").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from flink_streaming_2_10_spark.functions.jsonx import english_tweet_texts
from flink_streaming_2_10_spark.functions.text import (
    conditional_multi_emit,
    keep_equals,
)


def english_tweet_wordcount(df: DataFrame, json_col: str = "json") -> DataFrame:
    """T5 + T2-style tokenize + A3 rolling count (final state).

    JSON parse → lang filter → lowercase whitespace tokenize (the reference
    also strips inner whitespace via ``replaceAll("\\s*","")``, a no-op on
    already-split tokens) → (word,1) → keyed sum.
    Returns ``(word, cnt)``.
    """
    texts = english_tweet_texts(df, json_col)
    words = texts.select(
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("word")
    ).filter(F.length("word") > 0)
    return words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))


def fork_find_word_pipeline(
    df: DataFrame, col: str = "text", target: str = "trump"
) -> DataFrame:
    """The fork's pipeline (TwitterExample.java:84-102): conditional
    multi-emit (T3) then equality filter (T4). Returns ``(word)`` rows —
    every occurrence of the uppercased target from qualifying lines."""
    return keep_equals(
        conditional_multi_emit(df, col, target), col="word", target=target
    )
