"""Bigram language-model typicality scoring — the CCNet-style
"perplexity filter" face of quality scoring (north-star extension;
builds on the reference's tokenizer surface, WordCount.java:106-122,
like the rest of the text family).

Corpus curation pipelines score documents against an n-gram language
model and drop the tails (CCNet buckets by KenLM perplexity; Gopher/
FineWeb use similar signals). This is that operator with the model
TRAINED BY THE SAME JOB over the corpus (a "typicality" score: how
much each document looks like the corpus at the bigram level —
gibberish, boilerplate-free word salad, and wrong-language text all
score near zero) — swap the count tables for a clean reference corpus
to get the classic filter.

Why no logarithms: perplexity needs Σ log p, and ``ln`` differs in the
last ulp across math libraries (the same reason ``collocations`` ranks
on raw lift and ``keyword_search`` on N/df), which would break the
value-hash oracle. The score here is the MEAN CONDITIONAL BIGRAM
PROBABILITY instead: score = (Σᵢ c(wᵢ₋₁,wᵢ)/c(wᵢ₋₁)) / (n−1), where
each term is ONE division of two exact longs and the sum runs in FIXED
position order (a left fold over the per-doc sequence, not a row
aggregation) — bit-identical doubles in any engine. Monotonicity
matches the perplexity filter's intent (rarer transitions ⇒ lower
score) without its cross-engine hazard.

Scale shape (the 100 TB path): the unigram and bigram count tables are
vocabulary-sized aggregations with map-side partials (one shuffle each
on the token key — counts, never text); scoring shuffles the corpus
bigram postings once against each count table (both joins 1:1 per
posting — the count side has ONE row per key, so a stopword bigram is
shuffle skew for AQE, never fan-out); per-doc reassembly moves
(doc_id, pos, p) triples and sorts inside each doc only. Everything is
linear in corpus tokens; no self-joins, no broadcast of anything
vocabulary-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from flink_streaming_2_10_spark.pipeline.caching import tracked_persist
from flink_streaming_2_10_spark.pipeline.dedup import _words_sql


def _bigram_rows(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, n_tokens, pos, w1, w2) — one row per in-doc bigram,
    1-based ``pos`` of the bigram's FIRST token. The token array is
    projected once below the Generate, shingle-style."""
    pairs = (
        "CASE WHEN size(__ws) >= 2 THEN transform(sequence(1, size(__ws) - 1), "
        "i -> struct(__ws[i - 1] AS w1, __ws[i] AS w2)) "
        "ELSE cast(array() as array<struct<w1:string,w2:string>>) END"
    )
    ws = df.select(
        F.col(id_col).alias("doc_id"),
        F.expr(_words_sql(text_col)).alias("__ws"),
    )
    return ws.select(
        "doc_id",
        F.size("__ws").cast("long").alias("n_tokens"),
        F.posexplode(F.expr(pairs)).alias("p0", "__bg"),
    ).select(
        "doc_id",
        "n_tokens",
        (F.col("p0") + 1).alias("pos"),
        F.col("__bg.w1").alias("w1"),
        F.col("__bg.w2").alias("w2"),
    )


def bigram_lm_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    model: DataFrame | None = None,
) -> DataFrame:
    """``(doc_id, n_bigrams, lm_score)`` for every document:
    ``lm_score`` is the mean conditional bigram probability of the
    document under the corpus bigram model (see module docstring);
    documents with fewer than two tokens score 0.0 with 0 bigrams.

    ``model`` optionally supplies a pre-trained count model — a
    DataFrame with columns ``(w1, w2, c_bigram, c_unigram)`` as
    produced by :func:`train_bigram_counts` over a reference corpus;
    None trains on ``df`` itself (typicality mode).
    """
    bg = tracked_persist(_bigram_rows(df, id_col, text_col))
    if model is None:
        model = train_bigram_counts_from_rows(bg)
    scored = (
        bg.join(model, ["w1", "w2"], "left")
        .select(
            "doc_id",
            "n_tokens",
            "pos",
            F.coalesce(
                F.col("c_bigram").cast("double")
                / F.col("c_unigram").cast("double"),
                F.lit(0.0),
            ).alias("p"),
        )
    )
    # Fixed-order fold: sort each doc's (pos, p) pairs and left-fold the
    # probabilities in position order — the double sum is bit-identical
    # in any engine (a SUM() aggregation would be partial-order-
    # dependent).
    folded = (
        scored.groupBy("doc_id")
        .agg(
            F.max("n_tokens").alias("n_tokens"),
            F.expr(
                "aggregate(array_sort(collect_list(struct(pos, p))), "
                "cast(0.0 as double), (acc, x) -> acc + x.p)"
            ).alias("__sum_p"),
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        )
    )
    scores = folded.select(
        "doc_id",
        "n_bigrams",
        (F.col("__sum_p") / F.col("n_bigrams").cast("double")).alias(
            "lm_score"
        ),
    )
    # Short documents (< 2 tokens) emit no bigram rows — re-attach them
    # with a zero score so the output covers every input document.
    all_docs = df.select(F.col(id_col).alias("doc_id"))
    return (
        all_docs.join(scores, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_bigrams"), F.lit(0).cast("long")).alias(
                "n_bigrams"
            ),
            F.coalesce(F.col("lm_score"), F.lit(0.0)).alias("lm_score"),
        )
    )


def train_bigram_counts_from_rows(bg: DataFrame) -> DataFrame:
    """Bigram model from bigram posting rows: ``(w1, w2, c_bigram,
    c_unigram)`` where ``c_unigram`` counts w1 as a bigram PREFIX (the
    correct conditional denominator: Σ_w2 c(w1, w2) = c_prefix(w1), so
    per-prefix probabilities sum to exactly 1)."""
    big = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_bigram"))
    uni = bg.groupBy(F.col("w1").alias("u_w1")).agg(
        F.count(F.lit(1)).alias("c_unigram")
    )
    return big.join(uni, big["w1"] == uni["u_w1"]).select(
        "w1", "w2", "c_bigram", "c_unigram"
    )


def train_bigram_counts(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Train the bigram count model from a (reference) corpus."""
    return train_bigram_counts_from_rows(
        _bigram_rows(df, id_col, text_col)
    )
