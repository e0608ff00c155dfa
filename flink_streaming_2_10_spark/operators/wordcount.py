"""Word count — rolling keyed aggregation (SURVEY.md §2.4 A1-A3).

Reference programs:
* ``WordCount.java:80-82``   — ``flatMap(Tokenizer).keyBy(0).sum(1)``
* ``PojoExample.java:76-78`` — same pipeline keyed/summed by POJO field name
  (``keyBy("word").sum("frequency")``)

Flink's unwindowed keyed ``sum`` emits a refined cumulative record per input
record; the batch answer is the final refinement, i.e. a plain grouped sum.
Streaming parity: run the same function on a streaming DataFrame with
``outputMode("update")`` (micro-batch refinement cadence — accepted semantic
delta, SURVEY.md §2.4 A3).

Scale notes: groupBy(word) is a hash-exchange on the token — Spark plans a
partial (map-side) aggregation before the shuffle, so the shuffle volume is
~distinct-words-per-partition, not tokens. Skewed hot words are absorbed by
the partial agg; AQE coalesces the post-shuffle side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from flink_streaming_2_10_spark.functions.text import (
    NON_WORD_PATTERN,
    to_pairs,
    tokenize,
)


def word_count(
    df: DataFrame, col: str = "text", pattern: str = NON_WORD_PATTERN
) -> DataFrame:
    """A1+A3 positional path (``keyBy(0).sum(1)``): tokenize → (word, 1)
    pairs → key by position 0 → sum position 1.

    Returns columns ``(word, cnt)``.
    """
    pairs = to_pairs(tokenize(df, col, pattern))
    # keyBy(position 0) resolves to the column name at that position —
    # SURVEY.md §1.4 keying-by-position mapping.
    key = pairs.columns[0]
    return pairs.groupBy(key).agg(F.sum(pairs.columns[1]).alias("cnt"))


def word_count_pojo(
    df: DataFrame, col: str = "text", pattern: str = NON_WORD_PATTERN
) -> DataFrame:
    """A2+A3 field-name path (``keyBy("word").sum("frequency")``).

    Returns columns ``(word, total_frequency)``.
    """
    pairs = to_pairs(tokenize(df, col, pattern))
    return pairs.groupBy(F.col("word")).agg(
        F.sum("frequency").alias("total_frequency")
    )
