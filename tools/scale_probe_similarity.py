"""Scale probe for the embedding similarity family (VERDICT r7 #6) —
the analog of tools/scale_probe.py for cosine_neardup_pairs /
semantic_clusters.

Three axes:

1. **Hot identical-embedding cluster**: plant m bit-identical copies of
   one embedding on top of the sf0.1 corpus. Identical vectors share
   every bucket in every table — auto_num_planes can do nothing — so
   the UNCOLLAPSED self-join squares in m; the r8 identical-vector
   pre-collapse keeps one representative + m−1 star edges (linear).
   Timed both ways (uncollapsed only at small m).

2. **Near-identical flood (cap axis)**: m DISTINCT vectors within 1e-9
   of each other — the collapse can't merge them, every one lands in
   the same bucket of every table. The per-(t, bkt) cap drops the
   bucket whole; timed with the cap on vs off (off only at small m).

3. **Distinct-corpus scaling**: replicate the embeddings R× with a
   per-replica deterministic component offset (distinct vectors, no
   cross-replica identity) and time the collapsed pair path.

Writes SCALE_r08.md. Run: python tools/scale_probe_similarity.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from flink_streaming_2_10_spark.catalog import load_table
    from flink_streaming_2_10_spark.pipeline.caching import release_cached
    from flink_streaming_2_10_spark.pipeline.components import dedup_canonical
    from flink_streaming_2_10_spark.pipeline.similarity import (
        cosine_neardup_pairs,
    )
    from flink_streaming_2_10_spark.session import get_spark

    spark = get_spark("scale_probe_similarity")
    base = load_table(spark, "/root/testdata/sf0.1", "embeddings").select(
        "vec_id", "embedding"
    )
    n_base = base.count()
    seed_vec = base.filter(F.col("vec_id") == 0)

    def with_identical(m: int):
        """m bit-identical copies of vec 0 with fresh ids."""
        copies = (
            spark.range(m)
            .withColumnRenamed("id", "k")
            .crossJoin(F.broadcast(seed_vec.select("embedding")))
            .select(
                (F.col("k") + 1_000_000).alias("vec_id"), "embedding"
            )
        )
        return base.unionByName(copies)

    def with_near_identical(m: int):
        """m DISTINCT vectors within 1e-9 of vec 0 (collapse-immune,
        bucket-identical)."""
        copies = (
            spark.range(m)
            .withColumnRenamed("id", "k")
            .crossJoin(F.broadcast(seed_vec.select("embedding")))
            .select(
                (F.col("k") + 2_000_000).alias("vec_id"),
                F.expr(
                    "transform(embedding, x -> x + 1e-9 * (k + 1))"
                ).alias("embedding"),
            )
        )
        return base.unionByName(copies)

    def replicate(r: int):
        """R disjoint copies: replica k ROTATES the component order by k
        positions. A rotation is an isometry — every replica keeps the
        base corpus's internal pairwise-cosine structure exactly — while
        cross-replica vectors decorrelate (cos(x, rot_k(x)) is small for
        generic x). A first probe draft instead ADDED 0.05·k to every
        component; that concentrates all of replica k's vectors around
        the ones-vector (cosine → 1 as k grows), manufacturing an
        all-pairs clique — an adversarial-data property, not an engine
        property (R=8 measured 83 s on output volume alone)."""
        dim = 64
        reps = []
        for k in range(r):
            if k == 0:
                vec = F.col("embedding")
            else:
                vec = F.expr(
                    f"concat(slice(embedding, {k + 1}, {dim - k}), "
                    f"slice(embedding, 1, {k}))"
                )
            reps.append(
                base.select(
                    (F.col("vec_id") + k * 1_000_000).alias("vec_id"),
                    vec.alias("embedding"),
                )
            )
        out = reps[0]
        for rep in reps[1:]:
            out = out.unionByName(rep)
        return out

    def timed(df, **kw) -> float:
        t0 = time.time()
        cosine_neardup_pairs(df, threshold=0.4, num_tables=8, **kw).write.format(
            "noop"
        ).mode("overwrite").save()
        dt = time.time() - t0
        release_cached()
        return dt

    # Untimed warmup: absorbs JVM JIT / codegen / python-worker spin-up
    # so the first timed row isn't systematically inflated (the first
    # probe draft's m=500 row read ~2× its steady-state value).
    timed(base)

    lines = [
        "# SCALE probe — round 8 (embedding similarity family)",
        "",
        f"Base corpus: sf0.1 embeddings ({n_base} rows, dim 64). local[32].",
        "Probe: `tools/scale_probe_similarity.py` (one untimed warmup pass "
        "first).",
        "",
        "## Hot identical-embedding cluster (m bit-equal planted copies)",
        "",
        "| m | path | seconds |",
        "|---:|---|---:|",
    ]
    for m in (500, 1000, 2000):
        dt = timed(with_identical(m), collapse_identical=False)
        lines.append(f"| {m} | UNCOLLAPSED (pre-r8, quadratic) | {dt:.2f} |")
        print(lines[-1], flush=True)
    for m in (1000, 10_000, 50_000):
        dt = timed(with_identical(m))
        lines.append(f"| {m} | collapsed (r8 default) | {dt:.2f} |")
        print(lines[-1], flush=True)

    lines += [
        "",
        "## Near-identical flood (m distinct vectors in one bucket)",
        "",
        "| m | path | seconds |",
        "|---:|---|---:|",
    ]
    for m in (1000, 2000, 4000):
        dt = timed(with_near_identical(m), max_bucket_size=None)
        lines.append(f"| {m} | UNCAPPED (quadratic) | {dt:.2f} |")
        print(lines[-1], flush=True)
    for m in (2000, 20_000):
        dt = timed(with_near_identical(m))
        lines.append(f"| {m} | capped at 5000/bucket (r8 default) | {dt:.2f} |")
        print(lines[-1], flush=True)

    lines += [
        "",
        "## Distinct-corpus scaling (collapsed path)",
        "",
        "| replication R | rows | seconds | sec per 1x |",
        "|---:|---:|---:|---:|",
    ]
    for r in (1, 2, 4, 8):
        dt = timed(replicate(r))
        lines.append(f"| {r} | {n_base * r} | {dt:.2f} | {dt / r:.2f} |")
        print(lines[-1], flush=True)

    # Composition sanity: clusters over the biggest identical flood.
    big = with_identical(50_000)
    t0 = time.time()
    pairs = cosine_neardup_pairs(big, threshold=0.4, num_tables=8)
    dedup_canonical(
        big, pairs, id_col="vec_id", a_col="id_a", b_col="id_b"
    ).write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    release_cached()
    lines += [
        "",
        f"Composed semantic clusters over the m=50k identical flood: "
        f"{dt:.2f} s (the 25x-corpus-sized hot class resolves to one "
        f"cluster via star edges — linear by construction).",
    ]
    print(lines[-1], flush=True)

    with open(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "SCALE_r08.md",
        ),
        "w",
    ) as fh:
        fh.write("\n".join(lines) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
