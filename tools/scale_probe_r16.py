"""Round-16 scale probe: the MEDIA ingest face END-TO-END under a
sustained arrival flood with auto-compaction cadence in the loop.

SCALE_r15 and earlier rounds probed the media index PER STAGE (build
cost, probe cost, compaction swap safety); the r15 verdict (item 6)
asked for the missing composed measurement: ``media_ingest_batch``
driven pass after pass — flag append, survivor append, and every k-th
pass an ``_auto_compact_index_table`` of both index tables — while the
index grows to 10× and 20× its seed size. The question at 100 TB:
does the per-pass PROBE cost stay flat once compaction bounds the
file count, or does the O(passes·buckets) small-file growth leak into
probe latency anyway (footer opens, listing)?

Method:

* Seed the phash index with SEED payloads (pass 0, overwrite).
* Run PASSES append passes of BATCH arrivals each — 10% deterministic
  re-encodes (case-flip) of already-indexed payloads so the flag path
  runs every pass, 90% fresh survivors so the index actually grows.
* ``compact_every=COMPACT_EVERY`` exercises the generation-style
  compaction INSIDE the callback, exactly as a production stream would.
* After every pass, measure (a) the pass wall time, (b) the wall time
  of a FIXED 200-arrival probe (``media_against_index .count()`` — the
  read-side metric compaction exists to protect), and (c) the live
  bucket-table parquet file count.

Pass/scale arithmetic: 1,000 seed + 40 passes × 500 × 90% fresh ≈
19k indexed ≈ 19× seed; the 10× checkpoint falls around pass 20.

Run: ``python tools/scale_probe_r16.py`` — report to stdout, paste
into SCALE_r16.md.
"""

from __future__ import annotations

import os
import random
import shutil
import sys
import time

SEED = 1_000
PASSES = 40
BATCH = 500
COMPACT_EVERY = 8
NUM_BUCKETS = 16
PROBE_N = 200

BASE = (
    "a crawled media payload with enough bytes to give the gradient "
    "hash a stable signal across its sixty five regions. "
)


def _payload(rng: random.Random) -> str:
    body = "".join(
        rng.choice("abcdefghijklmnopqrstuvwxyz0123456789 ")
        for _ in range(rng.randint(200, 400))
    )
    return BASE + body


def _file_count(root: str) -> int:
    n = 0
    for dirpath, _dirs, files in os.walk(root):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def main() -> None:
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from pyspark.sql import functions as F

    from flink_streaming_2_10_spark.pipeline.neardup_index import (
        media_against_index,
        media_ingest_batch,
    )
    from flink_streaming_2_10_spark.pipeline.writer import (
        _norm_location,
        _table_location,
    )
    from flink_streaming_2_10_spark.session import get_spark

    spark = get_spark("scale_probe_r16")
    root = "/tmp/scale_probe_r16"
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    idx = os.path.join(root, "idx")
    flagged = os.path.join(root, "flagged")

    rng = random.Random(1616)
    indexed_payloads: list[tuple[int, str]] = []
    next_id = 0

    def make_batch(n: int, reencode_frac: float) -> list[tuple[int, str]]:
        nonlocal next_id
        rows = []
        n_re = int(n * reencode_frac) if indexed_payloads else 0
        for _ in range(n_re):
            _oid, pay = rng.choice(indexed_payloads)
            rows.append((next_id, pay.upper()))  # perceptual re-encode
            next_id += 1
        for _ in range(n - n_re):
            pay = _payload(rng)
            rows.append((next_id, pay))
            indexed_payloads.append((next_id, pay))
            next_id += 1
        return rows

    def to_df(rows):
        return spark.createDataFrame(rows, ["media_id", "payload_s"]).select(
            "media_id", F.encode("payload_s", "UTF-8").alias("payload")
        )

    on_batch = media_ingest_batch(
        spark, idx, "sp16", flagged,
        max_hamming=3, chunks=8, num_buckets=NUM_BUCKETS,
        compact_every=COMPACT_EVERY,
    )

    # fixed probe batch, reused every pass: half re-encodes of the SEED
    # payloads (stable across the run), half fresh noise
    print(f"== media flood: seed {SEED}, {PASSES} passes x {BATCH}, "
          f"compact_every={COMPACT_EVERY}, num_buckets={NUM_BUCKETS} ==")
    t0 = time.time()
    on_batch(to_df(make_batch(SEED, 0.0)), 0)
    print(f"seed pass: {time.time() - t0:.2f}s, indexed={len(indexed_payloads)}")

    probe_rows = [
        (10_000_000 + i, indexed_payloads[i % SEED][1].upper())
        for i in range(PROBE_N // 2)
    ] + [(11_000_000 + i, _payload(rng)) for i in range(PROBE_N // 2)]
    probe_df = to_df(probe_rows).localCheckpoint()

    def probe_once() -> tuple[float, int]:
        t = time.time()
        n = media_against_index(
            spark, probe_df, "sp16", max_hamming=3, chunks=8
        ).count()
        return time.time() - t, n

    # JIT/readers warm-up probe, unrecorded (same rationale as bench.py)
    probe_once()

    print(f"{'pass':>4} {'indexed':>8} {'pass_s':>7} {'probe_s':>8} "
          f"{'bucket_files':>12} {'flags':>6}")
    rows_out = []
    for p in range(1, PASSES + 1):
        batch = make_batch(BATCH, 0.1)
        t = time.time()
        on_batch(to_df(batch), p)
        pass_s = time.time() - t
        probe_s, probe_hits = probe_once()
        loc = _norm_location(_table_location(spark, "sp16_buckets"))
        files = _file_count(loc)
        n_flags = spark.read.parquet(flagged).count()
        rows_out.append((p, len(indexed_payloads), pass_s, probe_s, files))
        print(f"{p:>4} {len(indexed_payloads):>8} {pass_s:>7.2f} "
              f"{probe_s:>8.3f} {files:>12} {n_flags:>6}")

    # summary: probe cost at 1x / ~10x / ~20x seed, and the flat-cost
    # verdict (mean probe over the last compaction cycle vs the first)
    first_cycle = [r[3] for r in rows_out[:COMPACT_EVERY]]
    last_cycle = [r[3] for r in rows_out[-COMPACT_EVERY:]]
    mean = lambda xs: sum(xs) / len(xs)
    print(f"\nprobe_s mean first cycle: {mean(first_cycle):.3f} "
          f"(indexed ~{rows_out[COMPACT_EVERY - 1][1]})")
    print(f"probe_s mean last  cycle: {mean(last_cycle):.3f} "
          f"(indexed ~{rows_out[-1][1]})")
    print(f"ratio last/first: {mean(last_cycle) / mean(first_cycle):.2f}")
    fmax = max(r[4] for r in rows_out)
    fmin = min(r[4] for r in rows_out)
    print(f"bucket file count range: {fmin}..{fmax} "
          f"(compaction resets to {NUM_BUCKETS})")
    spark.stop()


if __name__ == "__main__":
    main()
