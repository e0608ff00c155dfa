"""Round-17 scale probe: asof_join plain vs ``bucketed=True`` under a
single dominating hot key — the skew-hardening claim measured, not
asserted.

operators/temporal.py documents the bucketed path as the skew defense:
partitioning the running-last window by (key, floor(t/tolerance))
instead of key alone spreads a hot key's rows across
``time_span/tolerance`` partitions at the cost of replicating the
right side ×2 into adjacent buckets. The r17 randomized-parity family
(tests/test_randomized_parity.py::test_asof_bucketed_tolerance_parity_
randomized) proves the two paths bit-identical against a brute-force
oracle; this probe measures the 100 TB-relevant question: with ~95% of
rows on ONE key, does the plain path's single-partition sort become
the straggler, and does the bucketed path actually flatten it?

Method: N_LEFT probe events and N_RIGHT quote events, HOT_FRAC of each
on key "hot", the rest uniform over COLD_KEYS cold keys; times uniform
in [0, SPAN). Measure wall time of a count() over the joined output
(forcing the window) for plain and bucketed at several tolerance
widths (smaller tolerance = more buckets = flatter hot key), plus a
result-equality spot check (full collect compare at the smallest size
only — the parity family owns correctness, this probe owns shape).

Run: ``python tools/scale_probe_r17.py`` — report to stdout, paste
into SCALE_r17.md.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from flink_streaming_2_10_spark.operators.temporal import asof_join
from flink_streaming_2_10_spark.session import get_spark

N_LEFT = 2_000_000
N_RIGHT = 2_000_000
HOT_FRAC = 0.95
COLD_KEYS = 64
SPAN = 1_000_000
TOLERANCES = [1_000, 10_000, 100_000]


def make_side(spark, n: int, id_off: int):
    # Deterministic synthetic skew: xxhash64-derived uniform draws.
    df = spark.range(n).select(
        (F.col("id") + id_off).alias("rid"),
        F.when(
            (F.abs(F.xxhash64(F.col("id") + id_off)) % 100) < int(HOT_FRAC * 100),
            F.lit("hot"),
        )
        .otherwise(
            F.concat(
                F.lit("k"),
                (F.abs(F.xxhash64(F.col("id") + id_off + 7)) % COLD_KEYS).cast(
                    "string"
                ),
            )
        )
        .alias("k"),
        (F.abs(F.xxhash64(F.col("id") + id_off + 13)) % SPAN).alias("t"),
    )
    return df


def main() -> None:
    spark = get_spark("scale-probe-r17", cpus=32, shuffle_partitions=64)
    left = make_side(spark, N_LEFT, 0).persist()
    right = make_side(spark, N_RIGHT, 10_000_000).select(
        F.col("rid").alias("qid"), "k", "t"
    ).persist()
    print(f"left={left.count():,} right={right.count():,} "
          f"hot_frac~{HOT_FRAC} span={SPAN:,}")

    for tol in TOLERANCES:
        times = {}
        for bucketed in (False, True):
            t0 = time.monotonic()
            n = asof_join(
                left, right, on=["k"], left_time="t", right_time="t",
                tolerance=tol, tie_cols=["qid"], bucketed=bucketed,
            ).filter(F.col("r_qid").isNotNull()).count()
            times[bucketed] = time.monotonic() - t0
            print(
                f"tolerance={tol:>7,} bucketed={bucketed!s:5s} "
                f"matched={n:,} wall={times[bucketed]:.2f}s",
                flush=True,
            )
        print(
            f"tolerance={tol:>7,} speedup plain/bucketed = "
            f"{times[False] / times[True]:.2f}x  "
            f"(buckets over hot key ~{SPAN // tol:,})",
            flush=True,
        )
    left.unpersist()
    right.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
