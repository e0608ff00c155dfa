"""CountMin sketch: mergeable point-frequency estimates in bounded
space, with a bit-exact DuckDB replay.

Complements the Misra–Gries pass (`pipeline/heavyhitters.py`): MG
answers "which items are frequent" with an exact recount; CountMin
answers "how frequent is THIS item" for any probe item, from a sketch
whose size is fixed (``rows × width`` int64 cells) regardless of
vocabulary. The estimate is an upper bound with one-sided error:

    exact ≤ est ≤ exact + εN   with prob ≥ 1 − δ,
    ε = e/width per row, δ = e^(−rows)

(each row is an independent bucket sum ≥ the item's true count; the
min over rows concentrates the overcount).

Determinism for the oracle gate: the hash family is the SAME md5-based
affine permutation family the MinHash/KMV pipeline uses
(``dedup.minhash_perm_params`` — constants both engines can compute):
``bucket_r(x) = ((a_r·h(x) + b_r) mod (2³¹−1)) mod width`` with
``h(x)`` the 60-bit md5 prefix reduced mod 2³¹−1. Every cell count and
every estimate is exact integer arithmetic, so DuckDB reproduces the
sketch AND the estimates bit-for-bit — the sketch sits behind the same
value-hash oracle gate as the exact operators (unlike
``count_min_sketch()``'s engine-private murmur layout).

Scale shape: building the sketch is ONE narrow aggregation — the
exploded value stream collapses map-side to ≤ rows·width partial rows
per partition (the groupBy key space IS the sketch), so the exchange
is sketch-sized, not corpus-sized. Sketches merge by cell-wise
addition (`merge_cm_sketches`) — the per-shard / per-day summary-table
property. Probing broadcasts the sketch (rows·width·16 bytes — 64 KiB
at the defaults), so estimate lookups never shuffle the probe side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from flink_streaming_2_10_spark.pipeline.dedup import (
    _MERSENNE_31,
    _base_hash,
    _words_sql,
    duckdb_hash60_sql,
    minhash_perm_params,
)

#: Seed namespace for the CM hash rows — distinct from MinHash's rows so
#: a pipeline using both gets independent families.
_CM_SEED = 101


def _bucket_cols(h: Column, rows: int, width: int) -> list[Column]:
    params = minhash_perm_params(rows, seed=_CM_SEED)
    return [
        F.pmod(
            F.pmod(F.lit(a) * h + F.lit(b), F.lit(_MERSENNE_31)),
            F.lit(width),
        ).cast("int")
        for a, b in params
    ]


def cm_sketch(
    values: DataFrame,
    value_col: str,
    rows: int = 4,
    width: int = 1024,
    hasher: str = "md5",
) -> DataFrame:
    """Build the sketch from a value stream: ``(r INT, b INT, cnt LONG)``
    — one row per non-empty cell. ONE aggregation; the exchange carries
    at most ``rows × width`` partial rows per upstream partition."""
    h = _base_hash(F.col(value_col).cast("string"), hasher)
    cells = values.select(
        F.posexplode(F.array(*_bucket_cols(h, rows, width))).alias("r", "b")
    )
    return cells.groupBy("r", "b").agg(F.count(F.lit(1)).alias("cnt"))


def merge_cm_sketches(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum — CountMin's mergeable-state face (per-shard or
    per-day sketches combine into the corpus sketch exactly)."""
    assert sketches
    acc = sketches[0]
    for s in sketches[1:]:
        acc = acc.unionByName(s)
    return acc.groupBy("r", "b").agg(F.sum("cnt").alias("cnt"))


def cm_estimates(
    sketch: DataFrame,
    probes: DataFrame,
    value_col: str,
    rows: int = 4,
    width: int = 1024,
    hasher: str = "md5",
) -> DataFrame:
    """Point estimates for each probe row: min over the ``rows`` bucket
    counts. The sketch broadcasts; probes keep all their columns and
    gain ``cm_est`` (0 for values hashing only to empty cells)."""
    h = _base_hash(F.col(value_col).cast("string"), hasher)
    exploded = probes.select(
        "*",
        F.posexplode(F.array(*_bucket_cols(h, rows, width))).alias("r", "b"),
    )
    joined = exploded.join(F.broadcast(sketch), ["r", "b"], "left")
    others = [c for c in probes.columns]
    return (
        joined.groupBy(*[F.col(c) for c in others])
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cm_est"))
    )


def cm_frequency_audit(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 30,
    rows: int = 4,
    width: int = 1024,
    hasher: str = "md5",
) -> DataFrame:
    """The audit query: the top-``k`` tokens by EXACT count (tie-break
    token ascending), each with its CountMin estimate from a
    ``rows × width`` sketch of the same stream — ``(token, exact_cnt,
    cm_est)`` with ``cm_est ≥ exact_cnt`` guaranteed.

    Two token-stream passes (sketch + exact counts), both collapsing
    map-side; the exploded stream is never cached (the
    `heavyhitters.py` 100 TB rationale). The exact pass is the audit's
    ground truth — production probes use :func:`cm_estimates` against
    whatever probe set without it."""
    toks = docs.select(F.explode(F.expr(_words_sql(text_col))).alias("token"))
    sketch = cm_sketch(toks, "token", rows, width, hasher)
    top = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy(F.col("exact_cnt").desc(), F.col("token"))
        .limit(k)
    )
    out = cm_estimates(sketch, top, "token", rows, width, hasher)
    return out.select("token", "exact_cnt", "cm_est")


def cm_audit_oracle_sql(
    k: int = 30,
    rows: int = 4,
    width: int = 1024,
    table: str = "documents",
    text_col: str = "text",
) -> str:
    """DuckDB replay of :func:`cm_frequency_audit` — identical hash
    constants, cell counts, and min-over-rows estimates."""
    p = _MERSENNE_31
    params = minhash_perm_params(rows, seed=_CM_SEED)
    hv = f"({duckdb_hash60_sql(f'token')} % {p})"
    cell_selects = " UNION ALL ".join(
        f"SELECT {r} AS r, (({a} * hv + {b}) % {p}) % {width} AS b FROM h"
        for r, (a, b) in enumerate(params)
    )
    probe_selects = " UNION ALL ".join(
        f"SELECT token, exact_cnt, {r} AS r,"
        f" (({a} * hv + {b}) % {p}) % {width} AS b FROM probe"
        for r, (a, b) in enumerate(params)
    )
    return f"""
        WITH w AS (SELECT list_filter(regexp_split_to_array(lower({text_col}),
                                                            '\\W+'),
                                      x -> length(x) > 0) AS words
                   FROM {table}),
        toks AS (SELECT unnest(words) AS token FROM w),
        h AS (SELECT {hv} AS hv FROM toks),
        cells AS (SELECT r, b, CAST(count(*) AS BIGINT) AS cnt
                  FROM ({cell_selects}) GROUP BY 1, 2),
        exact AS (SELECT token, CAST(count(*) AS BIGINT) AS exact_cnt
                  FROM toks GROUP BY 1
                  ORDER BY exact_cnt DESC, token LIMIT {k}),
        probe AS (SELECT token, exact_cnt, {hv} AS hv FROM exact),
        pb AS ({probe_selects})
        SELECT pb.token, pb.exact_cnt, MIN(cells.cnt) AS cm_est
        FROM pb JOIN cells USING (r, b)
        GROUP BY pb.token, pb.exact_cnt
    """
