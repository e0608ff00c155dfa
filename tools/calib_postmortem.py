"""Adjudicate the r9 bench calib anomaly (VERDICT r9, item 2).

The puzzle: r8→r9 raw same-basket totals were FLAT (66.0 s vs 66.6 s
min-vs-min) but the calib probe moved 0.336 → 0.253, nominally a
1.33×-faster host — which would make r9 a ~1.34× calib-adjusted
regression across nearly every JVM query. Two hypotheses:

  H1 (config): something session-level (codegen cache at 89 queries,
      GC, …) ate the faster host — queries really did get slower
      relative to host speed.
  H2 (probe): the 0.25 s burst calib probe has more cross-session
      variance than the ±12 % idle jitter documented for it, so the
      1.33× "host speedup" is probe noise and the round was flat.

This script produces the evidence to pick one:

  * ``calib_start`` / ``calib_end``: N probe samples at session start
    and after the full query workload — if end ≈ start, there is no
    within-session degradation for the start-of-run calib to miss
    (kills the codegen-cache/GC form of H1).
  * ``calib_interleaved``: one probe after every few queries — drift
    trajectory, not just endpoints.
  * ``query_mins``: best-of-3 for a fixed subset of queries whose
    implementations are UNCHANGED since r8 (fingerprint-stable), run
    exactly like bench.py (noop write, release_cached between). Today's
    min ÷ (today's calib ÷ r8 calib) vs the r8 recorded min answers
    whether the code is actually slower per unit of host speed.

Run: python tools/calib_postmortem.py  (writes JSON to stdout)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Queries untouched since r8 (modules fingerprint-stable across r8→r10),
# spanning JVM-relational, text, and dedup families.
SUBSET = [
    "tpch_q1_pricing_summary",
    "tpch_q5_local_supplier_volume",
    "tpch_q18_large_orders",
    "sessionize_events",
    "keyword_search",
    "text_repetition",
    "top_ngrams",
    "dedup_minhash_lsh",
    "similarity_ann_topk",
    "sketch_distinct_ngrams",
]


def main() -> None:
    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F
    from flink_streaming_2_10_spark.pipeline.caching import release_cached
    from flink_streaming_2_10_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_probe = int(os.environ.get("CALIB_PM_PROBES", "8"))
    spark = get_spark("calib-postmortem")
    queries = entrymod.queries()

    def calib_once() -> float:
        t0 = time.time()
        (
            spark.range(100_000_000)
            .select(F.pmod(F.xxhash64("id"), F.lit(1_000_003)).alias("h"))
            .agg(F.sum("h")).collect()
        )
        return round(time.time() - t0, 3)

    # Warm exactly like bench.py: one entry() pass then a JIT-warm probe.
    try:
        entrymod.entry(spark).write.format("noop").mode("overwrite").save()
    except Exception:
        pass
    calib_once()

    calib_start = [calib_once() for _ in range(n_probe)]

    query_mins: dict[str, float] = {}
    calib_interleaved: list[float] = []
    for i, name in enumerate(SUBSET):
        fn = queries[name]
        ts = []
        for _ in range(3):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts.append(time.time() - t0)
            release_cached()
        query_mins[name] = round(min(ts), 3)
        if i % 2 == 1:
            calib_interleaved.append(calib_once())

    calib_end = [calib_once() for _ in range(n_probe)]

    spark.stop()
    out = {
        "calib_start": calib_start,
        "calib_interleaved": calib_interleaved,
        "calib_end": calib_end,
        "calib_start_min": min(calib_start),
        "calib_end_min": min(calib_end),
        "calib_all_spread": round(
            max(calib_start + calib_interleaved + calib_end)
            / min(calib_start + calib_interleaved + calib_end),
            3,
        ),
        "calib_median": round(
            statistics.median(calib_start + calib_interleaved + calib_end), 3
        ),
        "query_mins": query_mins,
    }
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
