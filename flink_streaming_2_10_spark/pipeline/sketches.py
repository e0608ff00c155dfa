"""Mergeable cardinality sketch: distinct-count estimation from K
permutation minima (the KMV / min-of-K-hashes family).

``approx_count_distinct`` (HyperLogLog++) is the built-in answer, but its
register layout is engine-specific — no independent oracle can reproduce
the estimate bit-for-bit. This sketch trades a little accuracy for full
determinism: hash each value ONCE, apply the same K affine permutations
the MinHash pipeline uses (pipeline/dedup.py::minhash_perm_params — md5
constants both engines can compute), keep the per-group minimum of each,
and estimate

    n̂ = K·(p+1) / Σ_i (min_i + 1)  −  1

(each ``min_i/p`` of n uniform draws has mean ≈ 1/(n+1), so the pooled
sum concentrates at K/(n+1); inverting gives n̂ with relative std
≈ 1/√K ≈ 12.5% at K=64). Every term is exact integer arithmetic until
one final double division — DuckDB reproduces the estimate EXACTLY, so
the sketch sits behind the same value-hash oracle gate as the exact
operators.

Scale shape — the reason to sketch at all: one narrow hash projection
and ONE grouped aggregation with K ``min`` partials (map-side combine,
8-byte buffer per permutation). No distinct-shuffle of the raw values,
no per-group state proportional to cardinality, and the (group → K
minima) state is mergeable across partitions/days — the
summary-table/streaming-state property HLL is normally chosen for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from flink_streaming_2_10_spark.pipeline.dedup import (
    _MERSENNE_31,
    _base_hash,
    minhash_perm_params,
)


def kmv_distinct_estimate(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
    hasher: str = "xxhash64",
) -> DataFrame:
    """Per-group deterministic distinct-count estimate of ``value_col``.

    Returns ``(*group_cols, est_distinct DOUBLE, k INT)``. Groups whose
    true cardinality is well below K come out near-exact (every minimum
    is a true order statistic); accuracy for large groups is ≈ 1/√K
    relative. ``hasher="md5"`` makes the estimate oracle-reproducible.
    """
    p = _MERSENNE_31
    hashed = df.select(
        *[F.col(c) for c in group_cols],
        _base_hash(F.col(value_col).cast("string"), hasher).alias("h"),
    )
    mins = [
        F.min(
            F.pmod(F.lit(a) * F.col("h") + F.lit(b), F.lit(p))
        ).alias(f"m{i}")
        for i, (a, b) in enumerate(minhash_perm_params(k))
    ]
    agged = hashed.groupBy(*[F.col(c) for c in group_cols]).agg(*mins)
    # Exact integer pooled sum, then ONE double division + subtraction —
    # the only float ops, identical in DuckDB.
    pooled = sum(
        (F.col(f"m{i}") + F.lit(1) for i in range(1, k)),
        F.col("m0") + F.lit(1),
    )
    est = (
        F.lit(float(k) * (p + 1)) / pooled.cast("double") - F.lit(1.0)
    ).alias("est_distinct")
    return agged.select(*group_cols, est, F.lit(k).alias("k"))


def windowed_distinct_users(
    df: DataFrame,
    user_col: str = "user_id",
    time_col: str = "t",
    interval_us: int = 3_600_000_000,
    k: int = 64,
    hasher: str = "xxhash64",
) -> DataFrame:
    """Active users per time window, exact AND sketched side by side:
    ``(window_start_us, exact_users, est_distinct, k)``.

    The exact column is the classic two-exchange distinct aggregation —
    per-window state proportional to cardinality, the thing that stops
    scaling first. The KMV column is the mergeable-state answer: K
    8-byte minima per window regardless of cardinality, ONE grouped
    aggregation, state that merges across partitions, days, and
    streaming micro-batches. Emitting both from one operator lets the
    small-SF oracle gate verify the estimate against its own exact
    truth in every run; at 100 TB you keep only the sketch column (and
    the windowed grouping is exactly the shape
    ``applyInPandasWithState`` / summary tables carry forward).
    """
    # Cross-engine bucket semantics, verified not assumed (ADVICE r11
    # suspected a floor-vs-truncate divergence here): Spark's `div` and
    # DuckDB's INTEGER `//` BOTH truncate toward zero (-1 // 10 = 0 in
    # DuckDB on BIGINTs; only its float `/`-family floors differ), so
    # the engines agree on every timestamp sign as-is — pinned by
    # tests/test_sketches.py::test_windowed_distinct_negative_timestamp_
    # parity. Pre-1970 events land in the truncated (toward-zero)
    # window on both sides.
    bucket = (
        F.expr(f"`{time_col}` div {int(interval_us)}")
        * F.lit(int(interval_us))
    ).alias("window_start_us")
    bucketed = df.select(bucket, F.col(user_col))
    exact = bucketed.groupBy("window_start_us").agg(
        F.countDistinct(user_col).alias("exact_users")
    )
    est = kmv_distinct_estimate(
        bucketed, ["window_start_us"], user_col, k=k, hasher=hasher
    )
    return exact.join(est, "window_start_us")
