"""Argmax — ``maxBy`` (SURVEY.md §2.4 A7).

Reference: ``TopSpeedWindowing.scala:115`` — ``maxBy("speed")`` emits the
whole record having the max value, keeping the FIRST-SEEN record on ties.

Spark-first mapping: ``max_by`` with a composite ordering struct — a plain
hash aggregation with map-side partials (one exchange, no sort). Flink's
first-on-tie is nondeterministic under parallelism; we make it deterministic
with explicit tie-break columns (ascending), matching SURVEY.md §4.2's
"mind first-on-tie" note.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import NumericType, TimestampType


def _descending_equivalent(df: DataFrame, col: str) -> Column:
    """A column that orders ASC exactly when ``col`` orders DESC, so a
    max_by composite key can express 'then take the smallest'."""
    field = df.schema[col].dataType
    if isinstance(field, TimestampType):
        return -F.unix_micros(F.col(col))
    if isinstance(field, NumericType):
        return -F.col(col)
    raise TypeError(f"no descending equivalent for {col}: {field}")


def max_by_record(
    df: DataFrame, keys: list[str], order_col: str, tie_break: list[str] | None = None
) -> DataFrame:
    """Per group of ``keys``, return the full record maximizing
    ``order_col``; ties resolved by the SMALLEST ``tie_break`` values
    (deterministic stand-in for Flink's first-seen)."""
    tie_break = tie_break or []
    payload = [c for c in df.columns if c not in keys]
    order = F.struct(
        F.col(order_col), *[_descending_equivalent(df, t) for t in tie_break]
    )
    agg = df.groupBy(*[F.col(k) for k in keys]).agg(
        F.max_by(F.struct(*[F.col(c) for c in payload]), order).alias("__rec")
    )
    return agg.select(*keys, *[F.col(f"__rec.{c}").alias(c) for c in payload])
