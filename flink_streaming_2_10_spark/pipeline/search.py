"""Keyword search over the document corpus — TF·(N/df) relevance
ranking, the BM25-family shape with exact-by-construction arithmetic
(north-star extension; builds on the reference's tokenizer surface,
WordCount.java:106-122, the way ``pipeline/textstats.py`` does).

Why not textbook BM25/ln-idf: ``ln`` differs in the last ulp across math
libraries (the same reason ``collocations`` ranks on the raw lift), and
a SQL ``SUM`` over per-term doubles is partial-order-dependent. Here
each term's contribution ``tf_i · N / df_i`` is ONE exact-long division,
and the per-document score adds those in the FIXED written order of the
query terms (a pivoted expression, not an aggregation over rows) — so
the doubles are bit-identical in any engine and the DuckDB oracle
hash-matches. Ranking quality is the idf family's (rarer term ⇒ bigger
N/df lift), the scale behavior is what matters here.

Scale shape (the 100 TB path): term frequencies are SCAN-LOCAL
``regexp_count`` expressions (no explode, no shuffle — a whole-token
match ``\\b(term)\\b`` equals token equality under the ``\\W+``
tokenizer, same identity ``textstats.quality_scores`` pins); the tf
projection (doc_id + one small int per term — a sliver of the corpus
bytes) is PERSISTED so the text is scanned and regexp'd exactly ONCE,
feeding both the document-frequency totals (ONE broadcast row from a
single partial aggregate) and the ranking; the final cut is a
deterministic (score DESC, doc_id) TakeOrderedAndProject. Query cost is
one scan + one 1-row broadcast — independent of the number of query
terms moving through any exchange. (Caller releases the cache via
``pipeline.caching.release_cached``, as with the dedup intermediates.)
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F

from flink_streaming_2_10_spark.pipeline.caching import tracked_persist

#: Default query — mid-frequency corpus terms (so df spread is real).
DEFAULT_QUERY = ("vector", "hash", "stream")


def keyword_search(
    df: DataFrame,
    terms: tuple[str, ...] = DEFAULT_QUERY,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` documents by Σᵢ tfᵢ·(N/dfᵢ) over the query ``terms``.

    Returns ``(doc_id, n_hits, score)`` — ``n_hits`` is how many of the
    query terms the document contains (the AND-ness signal rankers
    usually weight); ties break on doc_id. Documents matching no term
    never enter the top-k heap (score 0 filtered scan-side).
    """
    if not terms:
        raise ValueError("keyword_search needs at least one term")
    for t in terms:
        if not re.fullmatch(r"[a-z0-9]+", t):
            raise ValueError(
                f"terms must be lowercase \\w+ tokens (got {t!r}): the "
                f"whole-token regexp identity only holds for those"
            )
    lowered = F.lower(F.col(text_col))
    tf_cols = {
        f"__tf{i}": F.regexp_count(lowered, F.lit(rf"\b{t}\b"))
        for i, t in enumerate(terms)
    }
    scored = tracked_persist(
        df.select(
            F.col(id_col).alias("doc_id"),
            *(c.alias(n) for n, c in tf_cols.items()),
        )
    )
    # One broadcast row: every df_i and N from a single partial agg.
    totals = F.broadcast(
        scored.agg(
            F.count(F.lit(1)).alias("__N"),
            *[
                F.sum((F.col(f"__tf{i}") > 0).cast("long")).alias(f"__df{i}")
                for i in range(len(terms))
            ],
        )
    )
    # Fixed-order score expression: term 0's contribution + term 1's + …
    # — an expression chain, not a row aggregation, so the double result
    # is order-deterministic cross-engine. df_i = 0 ⇒ tf_i = 0 in every
    # row; guard the division anyway (0-contribution, not NaN).
    score = F.lit(0.0)
    for i in range(len(terms)):
        contrib = (
            F.col(f"__tf{i}").cast("double")
            * F.col("__N").cast("double")
            / F.col(f"__df{i}").cast("double")
        )
        score = score + F.when(F.col(f"__df{i}") > 0, contrib).otherwise(
            F.lit(0.0)
        )
    n_hits = sum(
        (F.col(f"__tf{i}") > 0).cast("int") for i in range(len(terms))
    )
    return (
        scored.crossJoin(totals)
        .select("doc_id", n_hits.alias("n_hits"), score.alias("score"))
        .filter(F.col("n_hits") > 0)
        .orderBy(F.col("score").desc(), F.col("doc_id"))
        .limit(k)
    )
