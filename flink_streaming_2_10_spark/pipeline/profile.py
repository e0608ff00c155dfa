"""One-pass table profiling: per-column null / distinct / min / max —
the ANALYZE-style data-quality audit a pipeline runs before trusting a
new corpus drop.

Shape: ONE aggregation produces a single wide row (count + 4 stats per
column), then a scan-free ``stack`` unpivots it to one row per column.
Exact multi-column ``count_distinct`` makes Catalyst plan an Expand
with one group per distinct aggregate — the scan is read once but the
aggregation processes ``|cols|``× the rows (each expand group dedups
map-side on its own column's values). That is the right trade for a
handful of audited columns; for WIDE tables at 100 TB, profile in
column batches or swap the distinct term for the KMV estimate
(`pipeline/sketches.kmv_distinct_estimate`) — same one-row-per-column
output, sketch-sized state.

min/max are computed on the NATIVE type (so numeric/timestamp ordering
is correct) and cast to string only for the uniform output schema —
int, string, and timestamp renderings are identical in Spark and
DuckDB, which keeps the profile oracle-checkable. Doubles render
differently between engines (scientific-notation thresholds); profile
them through an integer-unit projection (`functions/money.py`) first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def table_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-column profile of ``cols``: ``(column, n_rows, n_nonnull,
    n_distinct, min_val, max_val)`` — one row per column from ONE pass
    over ``df`` (single agg + driver-sized unpivot)."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"__nd_{c}"))
        aggs.append(F.min(F.col(c)).cast("string").alias(f"__mn_{c}"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"__mx_{c}"))
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `__nn_{c}`, `__nd_{c}`, `__mn_{c}`, `__mx_{c}`" for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column_name, n_nonnull, n_distinct, min_val, max_val)"
        ),
        F.col("__n").alias("n_rows"),
    ).select(
        "column_name", "n_rows", "n_nonnull", "n_distinct",
        "min_val", "max_val",
    )


def table_profile_oracle_sql(cols: list[str], table: str) -> str:
    """DuckDB mirror: one UNION ALL branch per column, identical
    native-type min/max then VARCHAR cast."""
    branches = []
    for c in cols:
        branches.append(
            f"SELECT '{c}' AS column_name,"
            f" (SELECT CAST(count(*) AS BIGINT) FROM {table}) AS n_rows,"
            f" CAST(count({c}) AS BIGINT) AS n_nonnull,"
            f" CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,"
            f" CAST(min({c}) AS VARCHAR) AS min_val,"
            f" CAST(max({c}) AS VARCHAR) AS max_val"
            f" FROM {table}"
        )
    return " UNION ALL ".join(branches)
