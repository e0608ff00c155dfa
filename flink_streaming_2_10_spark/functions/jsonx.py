"""JSON access (T5/F14 — TwitterExample.java:131-169).

The reference parses tweet JSON ad hoc with Jackson: ``has("text")``,
``get("user").get("lang").asText()``. Spark-first mapping: a fixed minimal
StructType + ``from_json`` (ignores extra fields, exactly the reference's
access pattern), or ``get_json_object`` for one-path probes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Minimal tweet schema — only what the reference reads (FIXTURES.md F-5):
#: text, user.lang, created_at, id, entities.hashtags[].text.
TWEET_SCHEMA = StructType(
    [
        StructField("text", StringType()),
        StructField("created_at", StringType()),
        StructField("id", LongType()),
        StructField("user", StructType([StructField("lang", StringType())])),
        StructField(
            "entities",
            StructType(
                [
                    StructField(
                        "hashtags",
                        ArrayType(StructType([StructField("text", StringType())])),
                    )
                ]
            ),
        ),
    ]
)


def parse_tweets(df: DataFrame, col: str = "json") -> DataFrame:
    """Parse raw tweet-JSON strings into a typed struct column ``tweet``."""
    return df.withColumn("tweet", F.from_json(F.col(col), TWEET_SCHEMA))


def english_tweet_texts(df: DataFrame, col: str = "json") -> DataFrame:
    """T5 predicate (TwitterExample.java:146-152): keep tweets with
    ``user.lang == 'en'`` that have a ``text`` field; project the text."""
    parsed = parse_tweets(df, col)
    return parsed.filter(
        (F.col("tweet.user.lang") == "en") & F.col("tweet.text").isNotNull()
    ).select(F.col("tweet.text").alias("text"))


def json_get(df: DataFrame, col: str, path: str, alias: str) -> DataFrame:
    """F14 single-path probe via get_json_object (JSON path like '$.k')."""
    return df.withColumn(alias, F.get_json_object(F.col(col), path))
