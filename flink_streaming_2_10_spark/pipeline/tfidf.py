"""Per-document TF-IDF top terms — the classic "what is this document
about" projection used for corpus exploration, topic labeling, and
near-dup triage (north-star extension; builds on the reference's
tokenizer surface, WordCount.java:106-122, like the rest of the text
family).

Why tf·(N/df) and not tf·ln(N/df): ``ln`` differs in the last ulp
across math libraries (the same reason ``collocations`` ranks on raw
lift and ``keyword_search`` scores tf·N/df), which would break the
cross-engine value-hash oracle. The score here is ONE exact-long
multiply (``tf·N`` — both operands exact counts, product < 2^63 for
any real corpus: tf ≤ doc tokens ~1e5, N ≤ ~1e13 docs) followed by ONE
double division — bit-identical in any engine — and the ranking it
induces within a document is the same as any monotone idf transform of
N/df would give WHEN tf is equal; across unequal tf the linear idf
weights rare terms more aggressively than ln, which is the right bias
for a "distinctive terms" report.

Scale shape (the 100 TB path): the corpus text is scanned ONCE into
``(doc_id, token)`` postings; everything downstream is postings-sized
(8-byte-ish rows, a sliver of the corpus bytes):

- per-doc term frequencies: ONE hash aggregation on (doc_id, token)
  with map-side partials (within-doc repeats collapse before the
  exchange); the tf table is PERSISTED (the ``keyword_search``
  pattern — caller releases via ``pipeline.caching.release_cached``)
  so the corpus text is tokenized exactly once: the cached rows are
  (doc_id, token, count) postings, a sliver of the corpus bytes, and
  MEMORY_AND_DISK spills rather than recomputing the text scan;
- document frequencies: ONE vocabulary-sized aggregation OVER THE TF
  TABLE (df = COUNT(*) per token of the tf rows — no second corpus
  scan, no distinct);
- N: a single 1-row partial aggregate, broadcast (crossJoin of one
  row — the ``keyword_search`` pattern). N must count token-LESS
  documents too, so it aggregates the raw table — a second scan node,
  but column-pruned to the empty schema (row counts only, no text
  bytes);
- score join: tf ⋈ df on token is 1:1 per posting (the df side has
  ONE row per token), so a stopword is AQE skew-join territory, never
  row fan-out;
- top-k per doc: ``row_number`` over (doc_id; score DESC, token ASC)
  filtered to ≤ k plans as WindowGroupLimit — Spark prunes to k rows
  per doc MAP-SIDE before the final per-doc exchange.

No self-joins, nothing vocabulary-sized is ever broadcast, and the
only corpus-scale work is the initial tokenize scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from flink_streaming_2_10_spark.pipeline.caching import tracked_persist
from flink_streaming_2_10_spark.pipeline.dedup import _words_sql


def _postings(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, token) — one row per token OCCURRENCE (multiplicity
    kept, unlike dedup._tokens' set semantics). The token array is
    projected once below the Generate, shingle-style."""
    ws = df.select(
        F.col(id_col).alias("doc_id"),
        F.expr(_words_sql(text_col)).alias("__ws"),
    )
    return ws.select("doc_id", F.explode("__ws").alias("token"))


def tfidf_top_terms(
    df: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` distinctive terms per document by tf·(N/df).

    Returns ``(doc_id, rnk, token, tf, n_docs_with_term, score)`` —
    ``rnk`` is 1-based within the document, ties break on token ASC
    (deterministic cross-engine: binary string order both sides).
    Documents with no tokens emit no rows. ``score`` is
    ``CAST(tf * N AS DOUBLE) / CAST(df AS DOUBLE)`` — exact-long
    operands, one IEEE division, hash-stable.
    """
    tf = tracked_persist(
        _postings(df, id_col, text_col)
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(
        F.count(F.lit(1)).alias("n_docs_with_term")
    )
    # N counts ALL corpus documents (token-less ones too): one 1-row
    # aggregate, broadcast. df.count() would be a second action; this
    # stays one lazy plan.
    n_docs = F.broadcast(df.agg(F.count(F.lit(1)).alias("__N")))
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(n_docs)
        .select(
            "doc_id",
            "token",
            "tf",
            "n_docs_with_term",
            (
                (F.col("tf") * F.col("__N")).cast("double")
                / F.col("n_docs_with_term").cast("double")
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= F.lit(int(k)))
        .select(
            "doc_id", "rnk", "token", "tf", "n_docs_with_term", "score"
        )
    )
