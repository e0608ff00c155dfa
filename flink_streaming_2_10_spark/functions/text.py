"""Element-wise text transforms (SURVEY.md §2.3, §2.6).

Covers the tokenizers and scalar string functions the reference exercises:

* T2 — lowercase, split on ``\\W+``, drop empties
  (WordCount.java:106-122, PojoExample.java:145-160)
* T3 — conditional multi-emit: if any space-split word matches a target
  (case-insensitively), emit every word uppercased (TwitterExample.java:84-97)
* T4 — predicate keep-if-equals (TwitterExample.java:97-102)
* T6 — plain single-space splitter (TwitterExample.java:171-178)
* F1-F13 scalar functions, all expressed as built-in column expressions so
  they stay inside whole-stage codegen — no Python in the hot path.

Every function is ``DataFrame -> DataFrame`` and batch/streaming agnostic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: Java's default (non-UNICODE_CHARACTER_CLASS) \W — what the reference's
#: tokenizer splits on (WordCount.java:113).
NON_WORD_PATTERN = r"\W+"
WHITESPACE_PATTERN = r"\s+"


def tokenize(
    df: DataFrame,
    col: str = "text",
    pattern: str = NON_WORD_PATTERN,
    keep: list[str] | None = None,
) -> DataFrame:
    """T2: lowercase → regex split → explode → drop empty tokens.

    Mirrors the reference tokenizer contract (WordCount.java:113-118):
    ``value.toLowerCase().split("\\W+")`` then skip zero-length tokens.
    ``keep`` optionally carries through passthrough columns (the POJO path
    keeps whole records around the tokenized field).
    """
    carried = [F.col(c) for c in (keep or [])]
    words = F.explode(F.split(F.lower(F.col(col)), pattern)).alias("word")
    return df.select(*carried, words).filter(F.length("word") > 0)


def to_pairs(df: DataFrame, word_col: str = "word") -> DataFrame:
    """Emit ``(word, 1)`` pairs — the Tuple2/POJO construction step
    (WordCount.java:118, PojoExample.java:156)."""
    return df.select(F.col(word_col), F.lit(1).alias("frequency"))


def conditional_multi_emit(
    df: DataFrame, col: str = "text", target: str = "trump"
) -> DataFrame:
    """T3 (TwitterExample.java:84-97): for rows where ANY space-split word
    equals ``target`` case-insensitively, emit EVERY word uppercased; other
    rows emit nothing.

    Expressed as filter(exists(...)) + explode so Catalyst can push the
    row-level predicate to the scan before the (row-multiplying) explode.
    """
    words = F.split(F.col(col), " ")
    has_target = F.exists(words, lambda w: F.lower(w) == F.lit(target.lower()))
    return (
        df.filter(has_target)
        .select(F.explode(words).alias("word"))
        .select(F.upper(F.col("word")).alias("word"))
    )


def keep_equals(df: DataFrame, col: str = "word", target: str = "trump") -> DataFrame:
    """T4 (TwitterExample.java:97-102): keep rows where
    ``value.toLowerCase().equals(target)``."""
    return df.filter(F.lower(F.col(col)) == F.lit(target.lower()))


def split_whitespace(df: DataFrame, col: str = "text") -> DataFrame:
    """T6-style plain splitter (single-space StringTokenizer semantics,
    TwitterExample.java:174): explode space-split tokens, drop empties."""
    return df.select(
        F.explode(F.split(F.col(col), " ")).alias("word")
    ).filter(F.length("word") > 0)


def parse_paren_tuple(df: DataFrame, col: str = "value") -> DataFrame:
    """T1: parse the reference's ``(carId,speed,distance,time)`` text lines
    (TopSpeedWindowing.scala:132-135): strip outer parens, split on ',',
    cast fields."""
    body = F.regexp_replace(F.col(col), r"^\((.*)\)$", r"$1")
    parts = F.split(body, ",")
    return df.select(
        F.element_at(parts, 1).cast("int").alias("carId"),
        F.element_at(parts, 2).cast("int").alias("speed"),
        F.element_at(parts, 3).cast("double").alias("distance"),
        F.element_at(parts, 4).cast("long").alias("time"),
    )


def parse_seq_csv(df: DataFrame, col: str, value_name: str) -> DataFrame:
    """T1: parse the WindowJoin IT fixture CSV ``seq,name,value``
    (WindowJoinITCase.scala:48-51,55-58 — field 0 is a sequence prefix)."""
    parts = F.split(F.col(col), ",")
    return df.select(
        F.element_at(parts, 1).cast("long").alias("seq"),
        F.element_at(parts, 2).alias("name"),
        F.element_at(parts, 3).cast("int").alias(value_name),
    )


def clamp(col: Column, lo, hi) -> Column:
    """F11 (TopSpeedWindowing.scala:89-90): Math.min/Math.max clamp."""
    return F.least(F.greatest(col, F.lit(lo)), F.lit(hi))
