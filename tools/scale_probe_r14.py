"""Round-14 scale probe: auto-compaction on the text ingest face.

Measures what `compact_every` buys at append-scale: run K append passes
through `neardup_ingest_batch` twice — once append-only, once with
`compact_every` — and record (a) index file counts, (b) wall time of a
fixed probe (`neardup_against_index`) against the final index. The
r13 compaction probe measured the manual path (2808→128 files after 8
passes on the media index); this one exercises the HOOK end-to-end,
including the generation swaps happening mid-ingest and the post-swap
appends landing in the current generation.

Run: ``python tools/scale_probe_r14.py [passes] [docs_per_pass]``
(defaults 8, 200). Output is a short report to stdout — paste into
SCALE_r14.md.
"""

from __future__ import annotations

import os
import sys
import time


def main() -> None:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    per = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import tempfile

    from flink_streaming_2_10_spark.pipeline.neardup_index import (
        neardup_against_index,
        neardup_ingest_batch,
    )
    from flink_streaming_2_10_spark.pipeline.writer import (
        _norm_location,
        _table_location,
    )
    from flink_streaming_2_10_spark.session import get_spark

    spark = get_spark("scale_probe_r14")
    tmp = tempfile.mkdtemp(prefix="r14probe_")

    def docs(p: int):
        rows = [
            (
                p * 100_000 + i,
                f"pass {p} document {i} about recurring subject {i % 17} "
                f"with distinctive trailing tokens alpha{p}_{i} beta{p}_{i} "
                f"gamma{p}_{i} delta{p}_{i}",
            )
            for i in range(per)
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    probe_arrivals = spark.createDataFrame(
        [
            (
                9_999_999,
                "pass 0 document 7 about recurring subject 7 with "
                "distinctive trailing tokens alpha0_7 beta0_7 gamma0_7 "
                "delta0_7 extra",
            )
        ],
        "doc_id long, text string",
    )

    def count_files(table: str) -> int:
        loc = _norm_location(_table_location(spark, table))
        return sum(
            1
            for _, _, fs in os.walk(loc)
            for f in fs
            if f.endswith(".parquet")
        )

    def run(prefix: str, compact_every: int | None) -> dict:
        on_batch = neardup_ingest_batch(
            spark,
            os.path.join(tmp, f"idx_{prefix}"),
            prefix,
            os.path.join(tmp, f"fl_{prefix}"),
            threshold=0.5,
            num_buckets=16,
            compact_every=compact_every,
        )
        t0 = time.time()
        for p in range(passes):
            on_batch(docs(p), p)
        ingest_s = time.time() - t0
        files = {
            t: count_files(f"{prefix}_{t}") for t in ("buckets", "sigs")
        }
        # fixed probe, best-of-3 wall
        best = None
        for _ in range(3):
            t0 = time.time()
            n = neardup_against_index(
                spark, probe_arrivals, prefix, threshold=0.5
            ).count()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        loc = _norm_location(_table_location(spark, f"{prefix}_buckets"))
        return {
            "files": files,
            "probe_s": round(best, 3),
            "probe_rows": n,
            "ingest_s": round(ingest_s, 1),
            "generation": loc.rsplit("/", 1)[-1],
        }

    try:
        plain = run("r14plain", None)
        auto = run("r14auto", 4)
        print(f"passes={passes} docs/pass={per} num_buckets=16")
        print(f"append-only : {plain}")
        print(f"compact@4   : {auto}")
        same = plain["probe_rows"] == auto["probe_rows"]
        print(f"probe result parity: {'OK' if same else 'MISMATCH'}")
    finally:
        for p in ("r14plain", "r14auto"):
            spark.sql(f"DROP TABLE IF EXISTS {p}_buckets")
            spark.sql(f"DROP TABLE IF EXISTS {p}_sigs")


if __name__ == "__main__":
    main()
