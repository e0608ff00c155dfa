"""Round-15 scale probe: training_shard_budgeted under a skewed corpus
and under a high-cardinality strata column.

Two measurements the r14 probes don't cover:

1. **Skewed corpus** (one stratum = ~90% of tokens, the Bernoulli
   draw's worst case for the realized-vs-planned contract): plan a
   budget whose mixture is the OPPOSITE of the corpus skew (dominant
   stratum down-weighted to 10%, tail strata asked for 30% each) and
   record per-stratum |realized − planned| / planned. The draw is
   per-document, so relative error should shrink as ~1/sqrt(kept docs)
   — the probe prints the observed relative errors at three corpus
   sizes so the trend is visible.

2. **High-cardinality strata column** (the r14 verdict's What's-wrong
   1): 20k distinct strata, 3 targets. Before the r15 fix the keep-rate
   expression was a WHEN chain over ALL corpus strata (a plan-sized
   codegen blowup); now it is bounded at |targets|. The probe records
   wall time and the WHEN count in the analyzed plan.

Run: ``python tools/scale_probe_r15.py`` — report to stdout, paste
into SCALE_r15.md.
"""

from __future__ import annotations

import os
import sys
import time


def main() -> None:
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from pyspark.sql import functions as F

    from flink_streaming_2_10_spark.pipeline.sampling import (
        training_shard_budgeted,
    )
    from flink_streaming_2_10_spark.session import get_spark

    spark = get_spark("scale_probe_r15")

    # --- 1. skewed corpus -------------------------------------------------
    print("== skewed corpus (dominant stratum ~90% of tokens) ==")
    targets = {"big": 0.1, "t1": 0.3, "t2": 0.3, "t3": 0.3}
    for n_docs in (2_000, 20_000, 200_000):
        # deterministic synthetic corpus: 90% of docs in 'big', tokens
        # 50-150; tail strata split the rest
        df = (
            spark.range(n_docs)
            .select(
                F.col("id").alias("doc_id"),
                F.when(F.pmod("id", F.lit(10)) < 9, F.lit("big"))
                .otherwise(
                    F.concat(F.lit("t"), (F.pmod("id", F.lit(3)) + 1).cast("string"))
                )
                .alias("lang"),
                (F.pmod("id", F.lit(101)) + 50).alias("tok"),
            )
        )
        budget = int(n_docs * 100 * 0.2)  # ~20% of total token mass
        t0 = time.time()
        rows = {
            r["lang"]: r
            for r in training_shard_budgeted(
                df, F.col("tok"), targets, budget
            ).collect()
        }
        wall = time.time() - t0
        errs = []
        for lang, r in sorted(rows.items()):
            planned, realized = r["planned_tokens"], r["realized_tokens"]
            rel = abs(realized - planned) / planned if planned else 0.0
            errs.append(f"{lang}: rate={r['keep_rate']:.4f} "
                        f"planned={planned:.0f} realized={realized} "
                        f"rel_err={rel:.4f}")
        print(f"n_docs={n_docs} budget={budget} wall={wall:.2f}s")
        for e in errs:
            print("   " + e)

    # --- 2. high-cardinality strata column --------------------------------
    print("\n== high-cardinality strata (20k distinct, 3 targets) ==")
    n_docs, n_strata = 200_000, 20_000
    df = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), F.pmod("id", F.lit(n_strata)).cast("string")).alias(
            "lang"
        ),
        (F.pmod("id", F.lit(37)) + 10).alias("tok"),
    )
    targets = {"s0": 0.5, "s1": 0.25, "s2": 0.25}
    t0 = time.time()
    out = training_shard_budgeted(df, F.col("tok"), targets, 5_000)
    n_out = out.count()
    wall = time.time() - t0
    plan_str = out._jdf.queryExecution().analyzed().toString()
    print(
        f"n_docs={n_docs} n_strata={n_strata} out_rows={n_out} "
        f"wall={wall:.2f}s WHEN_count={plan_str.count('WHEN')} "
        f"(bounded at ~4x|targets|; pre-fix it scaled with |strata|)"
    )


if __name__ == "__main__":
    main()
