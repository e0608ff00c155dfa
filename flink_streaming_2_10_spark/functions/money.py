"""Exact money arithmetic for oracle-stable aggregation.

Double-precision sums are order-dependent, and Spark's partial-aggregate
ordering differs from any oracle's — so queries that must hash-match an
independent engine never sum raw doubles. Prices/discounts in the testdata
are fixed-point (2 decimals) stored as doubles; scaling to integer units
(cents / basis points) before summing makes the aggregation exact and
associative, then one deterministic double division at the end restores the
natural unit. Both sides of the oracle comparison compute the same final
expression shape, so results are bit-identical.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def to_units(col: Column | str, decimals: int = 2) -> Column:
    """Scale a fixed-point-in-double column to exact integer units.

    ``round()`` (not a bare cast) because the scaled double is within 1e-9
    of an integer and both Spark and DuckDB round-half-up for positives,
    whereas bare double→long casts truncate in Spark but round in DuckDB.
    """
    return F.round(F.col(col) if isinstance(col, str) else col, 0).cast(
        "long"
    ) if decimals == 0 else F.round(
        (F.col(col) if isinstance(col, str) else col) * F.lit(10**decimals), 0
    ).cast("long")


def units_sum(col: Column | str, alias: str, decimals: int = 2) -> Column:
    """Exact sum of a scaled-integer column, kept as a long."""
    return F.sum(to_units(col, decimals)).alias(alias)


def from_units(col: Column | str, decimals: int = 2) -> Column:
    """Deterministic unscale: integer / 10^decimals in double."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("double") / F.lit(float(10**decimals))
