"""Round-18 scale probe: sessionize plain vs two-phase
(``bucket_width``) under a single dominating hot key — closing the one
measured, unfixed straggler SCALE_r17 recorded (×2.8 penalty at a 95%
hot key, the null/bot-user-id shape at 100 TB).

operators/temporal.py's two-phase path sessionizes locally inside each
(key, floor(t/bucket_width)) partition, then stitches buckets per key
over one tiny summary row per non-empty bucket. The r18
randomized-parity family
(tests/test_randomized_parity.py::test_sessionize_bucketed_parity_
randomized) proves the two paths bit-identical — gap boundaries ON the
bucket edge included; this probe measures the 100 TB-relevant question:
with ~95% of rows on ONE key, does the plain path's single-partition
prefix sort straggle, and does the two-phase path actually flatten it
(despite paying the summary branch's second scan)?

Method: N_EVENTS events, HOT_FRAC on key "hot", the rest uniform over
COLD_KEYS cold keys; times uniform in [0, SPAN); gap = GAP. Wall time
of a full ``agg(max(session_idx), count(*))`` over the labeled output
for plain and three bucket widths, plus a uniform-keys control and a
cross-path session-count equality check (the parity family owns
correctness; this probe owns shape).

Run: ``python tools/scale_probe_r18.py`` — report to stdout, paste into
SCALE_r18.md.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from flink_streaming_2_10_spark.operators.temporal import sessionize
from flink_streaming_2_10_spark.session import get_spark

N_EVENTS = 8_000_000
HOT_FRAC = 0.95
COLD_KEYS = 64
SPAN = 1_000_000
GAP = 50
WIDTHS = [2_000, 20_000, 125_000]


def make_events(spark, n: int, skewed: bool):
    df = spark.range(n).select(
        F.col("id").alias("rid"),
        (
            F.when(
                (F.abs(F.xxhash64(F.col("id"))) % 100) < int(HOT_FRAC * 100),
                F.lit("hot"),
            ).otherwise(
                F.concat(
                    F.lit("k"),
                    (F.abs(F.xxhash64(F.col("id") + 7)) % COLD_KEYS).cast(
                        "string"
                    ),
                )
            )
            if skewed
            else F.concat(
                F.lit("k"),
                (F.abs(F.xxhash64(F.col("id") + 7)) % COLD_KEYS).cast("string"),
            )
        ).alias("k"),
        (F.abs(F.xxhash64(F.col("id") + 13)) % SPAN).alias("t"),
    )
    return df


def run(df, **kw) -> tuple[float, int, int]:
    """Best-of-2 warm wall time (single samples on this host swing ~2×
    with JIT/contention phase; the min is the stable shape signal)."""
    best = None
    for _ in range(2):
        t0 = time.monotonic()
        row = (
            sessionize(
                df, on=["k"], time_col="t", gap=GAP, tie_cols=["rid"], **kw
            )
            .groupBy("k")
            .agg(F.max("session_idx").alias("ns"), F.count("*").alias("n"))
            .agg(F.sum("ns").alias("sessions"), F.sum("n").alias("rows"))
            .collect()[0]
        )
        wall = time.monotonic() - t0
        if best is None or wall < best[0]:
            best = (wall, int(row["sessions"]), int(row["rows"]))
    return best


def main() -> None:
    spark = get_spark("scale-probe-r18", cpus=32, shuffle_partitions=64)
    for skewed in (False, True):
        df = make_events(spark, N_EVENTS, skewed).persist()
        df.count()
        label = "skewed(95% hot)" if skewed else "uniform"
        wall, sess, rows = run(df)
        print(
            f"{label:16s} plain           wall={wall:6.2f}s "
            f"sessions={sess:,} rows={rows:,}",
            flush=True,
        )
        base = wall
        base_sessions = sess
        for w in WIDTHS:
            wall, sess, rows = run(df, bucket_width=w)
            ok = "OK" if sess == base_sessions else "MISMATCH!"
            print(
                f"{label:16s} width={w:>7,}   wall={wall:6.2f}s "
                f"sessions={sess:,} ({ok}) speedup={base / wall:.2f}x "
                f"(hot-key buckets ~{SPAN // w:,})",
                flush=True,
            )
        df.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
