"""Round-11 scaling probe (part 3): the segment-census LOG — does the
append-only design's read cost actually grow with delta count, and
does compaction actually restore it? (The claim segdedup.py makes
qualitatively; this measures it, the SCALE_r0x house style.)

Fixture: 24 ingest passes of 2k docs each (one shared banner per pass
so state is non-trivial), probing a fixed 2k-doc batch with
strip_against_census after 6 / 12 / 24 deltas, then after compaction.
Appends to SCALE_r11.md. Run: python tools/scale_probe_r11c.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from flink_streaming_2_10_spark.pipeline.segdedup import (
        _census_partial,
        compact_segment_census,
        strip_against_census,
    )
    from flink_streaming_2_10_spark.session import get_spark

    spark = get_spark("scale_probe_r11c")
    tmp = tempfile.mkdtemp(prefix="census_probe_")
    census = os.path.join(tmp, "census")

    def batch(pass_i: int, m: int = 2000):
        return spark.range(m).select(
            (F.col("id") + pass_i * m).alias("doc_id"),
            F.concat(
                F.lit("shared banner line\nunique "),
                (F.col("id") + pass_i * m).cast("string"),
            ).alias("text"),
        )

    probe = batch(999).persist()
    probe.count()

    def probe_time() -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.monotonic()
            strip_against_census(
                spark, probe, census, min_count=3, keep="none"
            ).write.format("noop").mode("overwrite").save()
            best = min(best, time.monotonic() - t0)
        return best

    rows = []
    for p in range(24):
        _census_partial(
            batch(p), "doc_id", "text", "\n", 1, "xxhash64"
        ).write.mode("append").parquet(census)
        if p + 1 in (6, 12, 24):
            rows.append((f"{p + 1} deltas", probe_time()))
    compact_segment_census(spark, census)
    rows.append(("24 deltas, compacted", probe_time()))

    with open(
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "SCALE_r11.md"),
        "a",
    ) as f:
        f.write(
            "\n## segment-census log: probe cost vs delta count (r11)\n\n"
            "24 ingest passes x 2k docs; fixed 2k-doc strip probe, "
            "min-of-2, local[32]. `tools/scale_probe_r11c.py`.\n\n"
            "| census state | probe s |\n|---|---:|\n"
        )
        for label, t in rows:
            f.write(f"| {label} | {t:.2f} |\n")
        f.write(
            "\n**Reading**: the append-only log's aggregate-on-read "
            "cost as deltas accumulate, and what one compaction buys — "
            "the measured version of segdedup.py's log-structured "
            "trade.\n"
        )
    print(rows)
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
