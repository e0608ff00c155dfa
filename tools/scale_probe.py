"""Data-scaling probe for the composed curation DAG (VERDICT r6 #8).

Substantiates the 100×-safety claims with MEASURED scaling rather than
static plan pins, on two axes:

1. **Distinct-corpus scaling**: replicate the sf0.1 documents table R×
   with per-replica text perturbation (distinct normalized texts, so no
   exact-dup collapse applies) and time ``curate_corpus_neardup`` at
   R ∈ {1, 2, 4, 8}. A scale-safe DAG grows near-linearly in wall time.

2. **Hot-cluster robustness**: plant m identical boilerplate documents
   on top of the base corpus and time the same DAG at m ∈ {1k, 10k,
   50k}. Before the round-7 pre-collapse fix the LSH band self-join
   emitted m² rows per band (m = 50k → 4·10¹⁰ join rows, a dead job);
   with the fix the run stays flat in m. The probe also times the
   UNCOLLAPSED pair path at small m to show the quadratic trend the fix
   removes.

Writes SCALE_r07.md. Run: python tools/scale_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BOILER = (
    "this is the same templated boilerplate page that appears on every "
    "mirror of the site with the usual navigation header and footer text "
    "repeated over and over for search engines to ignore"
)


def main() -> None:
    from pyspark.sql import functions as F

    from flink_streaming_2_10_spark.catalog import load_table
    from flink_streaming_2_10_spark.pipeline.caching import release_cached
    from flink_streaming_2_10_spark.pipeline.dedup import minhash_dedup_pairs
    from flink_streaming_2_10_spark.pipeline.shard import curate_corpus_neardup
    from flink_streaming_2_10_spark.session import get_spark

    spark = get_spark("scale_probe")
    base = load_table(spark, "/root/testdata/sf0.1", "documents").select(
        "doc_id", "text"
    )
    n_base = base.count()
    bench = base.filter(F.col("doc_id") % 97 == 0)

    def replicate(r: int):
        """R disjoint copies: replica k prefixes EVERY word with its
        replica id, so replicas of the same base doc share zero shingles
        — the corpus grows R× with the near-dup structure of each
        replica preserved internally but no cross-replica pairs. This is
        what "R× more data" means for scaling purposes; a mere appended
        token would instead make every base doc an R-clique of near-dups
        (pair count ∝ R², a property of that data, not the engine)."""
        reps = spark.range(r).select(F.col("id").alias("rep"))
        return base.crossJoin(reps).select(
            (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
            F.expr(
                "regexp_replace(text, '(\\\\w+)', "
                "cast(rep as string) || 'z$1')"
            ).alias("text"),
        )

    def hot(m: int):
        planted = spark.range(m).select(
            (F.col("id") + 50_000_000).alias("doc_id"),
            F.lit(BOILER).alias("text"),
        )
        return base.unionByName(planted)

    def timed(df_builder, fn) -> float:
        t0 = time.time()
        fn(df_builder).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        release_cached()
        return dt

    curate = lambda d: curate_corpus_neardup(d, bench)
    pairs_star = lambda d: minhash_dedup_pairs(d)
    pairs_full = lambda d: minhash_dedup_pairs(d, collapse_exact=False)

    lines = ["# SCALE probe — round 7", ""]
    lines.append(f"Base corpus: sf0.1 documents ({n_base} rows). "
                 f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}].")
    lines.append("")
    lines.append("## Distinct-corpus scaling (curate_corpus_neardup)")
    lines.append("")
    lines.append("| replication R | rows | seconds | sec per 1× |")
    lines.append("|---:|---:|---:|---:|")
    timed(replicate(1), curate)  # untimed warm-up: JVM JIT, codegen, readers
    for r in (1, 2, 4, 8):
        dt = timed(replicate(r), curate)
        lines.append(f"| {r} | {n_base * r} | {dt:.2f} | {dt / r:.2f} |")
        print(lines[-1], flush=True)

    lines.append("")
    lines.append("## Hot identical-text cluster (m planted exact dups)")
    lines.append("")
    lines.append("| m | path | seconds |")
    lines.append("|---:|---|---:|")
    for m, fn, label in (
        (1_000, pairs_full, "pairs UNCOLLAPSED (old, quadratic)"),
        (2_000, pairs_full, "pairs UNCOLLAPSED (old, quadratic)"),
        (1_000, pairs_star, "pairs collapsed (new)"),
        (10_000, pairs_star, "pairs collapsed (new)"),
        (50_000, pairs_star, "pairs collapsed (new)"),
        (50_000, curate, "curate_corpus_neardup (new)"),
    ):
        dt = timed(hot(m), fn)
        lines.append(f"| {m} | {label} | {dt:.2f} |")
        print(lines[-1], flush=True)

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_r07.md",
    )
    with open(out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()
