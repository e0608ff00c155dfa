"""Round-18 optimization probe: time a SUBSET of driver queries with the
bench's exact methodology (noop sink, warmup pass, median + min of N),
without paying for the full 135-query bench between changes.

Usage: python tools/opt_probe_r19.py q1 [q2 ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
       SPARK_GRAFT_BENCH_N (default 3), SPARK_GRAFT_BENCH_WARMUP (default 1)
       SPARK_GRAFT_PROBE_CONF ("k=v;k2=v2" runtime SQLConf overrides, applied
       after session build — for A/B-testing config candidates in isolation)

Prints one JSON line: {"queries": {name: median}, "queries_min": {...}}.
NOT part of the driver contract — bench.py remains the reference
measurement; this exists so each optimization's before/after can be
measured in isolation (guide §1: measure first, re-measure after).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_iter = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_N", "3")))
    warmup = max(0, int(os.environ.get("SPARK_GRAFT_BENCH_WARMUP", "1")))
    names = sys.argv[1:]
    if not names:
        print("usage: opt_probe_r19.py <query> [query ...]", file=sys.stderr)
        raise SystemExit(2)

    import __spark_entry__ as entrymod
    from flink_streaming_2_10_spark.pipeline.caching import release_cached
    from flink_streaming_2_10_spark.session import get_spark

    spark = get_spark("opt-probe-r19")
    overrides = os.environ.get("SPARK_GRAFT_PROBE_CONF", "")
    for kv in overrides.split(";"):
        if "=" in kv:
            k, v = kv.split("=", 1)
            spark.conf.set(k.strip(), v.strip())
            print(f"probe conf: {k.strip()}={v.strip()}", file=sys.stderr)
    queries = entrymod.queries()
    unknown = [n for n in names if n not in queries]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        raise SystemExit(2)

    # Same JVM warm as bench.py.
    try:
        entrymod.entry(spark).write.format("noop").mode("overwrite").save()
    except Exception:
        pass

    samples: dict[str, list[float]] = {n: [] for n in names}
    for it in range(warmup + n_iter):
        timed = it >= warmup
        for name in names:
            spark.sparkContext.setJobDescription(f"probe:{name}")
            t0 = time.time()
            try:
                queries[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                if timed:
                    samples[name].append(time.time() - t0)
            except Exception as exc:  # noqa: BLE001
                print(f"probe error in {name}: {exc}", file=sys.stderr)
            finally:
                spark.sparkContext.setJobDescription(None)
                release_cached()
    out = {
        "queries": {
            n: round(statistics.median(v), 3) if v else -1.0
            for n, v in samples.items()
        },
        "queries_min": {
            n: round(min(v), 3) if v else -1.0 for n, v in samples.items()
        },
        "n": n_iter,
        "sf_dir": sf_dir,
    }
    spark.stop()
    print(json.dumps(out, separators=(",", ":")), flush=True)


if __name__ == "__main__":
    main()
