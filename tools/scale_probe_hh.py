"""Scale probe: heavy_hitter_tokens wall time vs vocabulary size.

Claim under test (pipeline/heavyhitters.py): the MG two-phase plan's
shuffle volume is bounded by sketch_cap per partition + the candidate
set — independent of vocabulary size — while the naive exact plan
(full groupBy over all tokens) shuffles the vocabulary itself. At a
fixed corpus token count, growing the vocabulary 100x should leave the
sketch path near-flat and grow the naive path's exchange.

Both paths are also checked to produce the IDENTICAL heavy-hitter set
(the sketch-affects-only-the-plan contract).

Usage: python tools/scale_probe_hh.py   (prints a markdown table row
per vocabulary size; local[32], same session across rows).
"""

from __future__ import annotations

import random
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from flink_streaming_2_10_spark.pipeline.caching import release_cached
from flink_streaming_2_10_spark.pipeline.dedup import _words_sql
from flink_streaming_2_10_spark.pipeline.heavyhitters import heavy_hitter_tokens
from flink_streaming_2_10_spark.session import get_spark

N_DOCS = 10_000
TOKENS_PER_DOC = 200
N_HEAVY = 20
SUPPORT_DENOM = 499  # report tokens above 1/500 of the stream


def make_corpus(spark, vocab: int):
    """~2M tokens: each position is a heavy token with p=0.5 (uniform
    over 20 → each ~2.5% ≫ 1/500), else a uniform rare token (far below
    threshold at every probed vocab size)."""
    rng = random.Random(42)
    rows = []
    for d in range(N_DOCS):
        toks = []
        for _ in range(TOKENS_PER_DOC):
            if rng.random() < 0.5:
                toks.append(f"hot{rng.randrange(N_HEAVY)}")
            else:
                toks.append(f"w{rng.randrange(vocab)}")
        rows.append((d, " ".join(toks)))
    return spark.createDataFrame(rows, ["doc_id", "text"]).repartition(32)


def naive_exact(df, support_denom: int):
    toks = df.select(F.explode(F.expr(_words_sql("text"))).alias("tok"))
    total = toks.agg(F.count(F.lit(1)).alias("n"))
    return (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * F.lit(support_denom + 1) > F.col("n"))
        .select(F.col("tok").alias("token"), "cnt")
    )


def main() -> int:
    spark = get_spark("scale-hh", cpus=32, shuffle_partitions=32)
    print("| vocab | sketch s | naive-groupBy s | heavy found | sets match |")
    print("|---:|---:|---:|---:|---|")
    for vocab in (10_000, 100_000, 1_000_000):
        df = make_corpus(spark, vocab)
        df.persist().count()  # corpus materialized: time the operators only
        t0 = time.time()
        got = {
            r["token"]: r["cnt"]
            for r in heavy_hitter_tokens(
                df, support_denom=SUPPORT_DENOM, sketch_cap=512
            ).collect()
        }
        t_sketch = time.time() - t0
        release_cached()
        t0 = time.time()
        exact = {
            r["token"]: r["cnt"]
            for r in naive_exact(df, SUPPORT_DENOM).collect()
        }
        t_naive = time.time() - t0
        df.unpersist()
        print(
            f"| {vocab} | {t_sketch:.2f} | {t_naive:.2f} | {len(got)} "
            f"| {'YES' if got == exact else 'NO — MISMATCH'} |"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
