"""Benchmark decontamination: flag training documents that share n-grams
with a held-out evaluation set.

The standard published technique (GPT-3 appendix C; PaLM §5; Llama eval
hygiene): build the set of all word n-grams occurring in the benchmark
corpus, then mark any training document containing one of them. Training
on contaminated documents inflates eval scores, so a 100 TB pipeline runs
this as a standard pass before shard writing.

Scale shape: evaluation sets are small by definition (MBs against a 100 TB
corpus), so the benchmark gram set is a **broadcast** hash probe — the
corpus side is one narrow tokenize/shingle map, one broadcast semi-join
(no shuffle of corpus grams), and one hash aggregation on ``doc_id`` with
map-side partials. The corpus text never shuffles; grams travel as 8-byte
hashes (see dedup._hash60 — collisions are ~n·m/2^60 false contamination
flags, the conservative direction).

No reference counterpart; north-star extension per SURVEY.md §7.2 item 9.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from flink_streaming_2_10_spark.pipeline.dedup import _hash60, _shingles


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_hits: int = 1,
    hasher: str = "xxhash64",
    broadcast: bool = True,
) -> DataFrame:
    """Per-document contamination audit against ``benchmark``.

    Returns ``(doc_id, total_ngrams, contaminated_ngrams,
    is_contaminated)`` for EVERY row of ``docs`` — ``contaminated_ngrams``
    counts the document's *distinct* word ``n``-grams that also occur
    anywhere in the benchmark, and ``is_contaminated`` is
    ``contaminated_ngrams >= min_hits``. Filter on the flag to drop, or
    keep the counts for graded policies (e.g. drop only when >10% of a
    doc's grams are benchmark grams).

    ``n=13`` is the GPT-3 setting for web-scale text; the default here is
    lower because gram width must not exceed typical document length for
    the audit to have power (tune to your corpus). ``hasher="md5"`` makes
    the whole audit DuckDB-reproducible (oracle parity); ``xxhash64`` is
    the cluster fast path — identical plan.

    ``broadcast=False`` is the escape hatch for a benchmark SUITE whose
    distinct gram set outgrows executor memory (hundreds of evals × many
    templates): the probe becomes a shuffled hash join in which the
    corpus side exchanges only ``(doc_id, 8-byte gram hash)`` rows —
    document text still never shuffles, and Spark's runtime bloom-filter
    join pruning (on by default) prefilters the corpus side before the
    exchange. Identical results either way (tested).
    """
    bench_grams = (
        _shingles(benchmark, id_col, text_col, n)
        .select(_hash60(F.col("shingle"), hasher).alias("h"))
        .distinct()
    )
    doc_grams = _shingles(docs, id_col, text_col, n).select(
        "doc_id", _hash60(F.col("shingle"), hasher).alias("h")
    )
    # _shingles is distinct-per-doc, so plain counts are distinct-gram
    # counts. Benchmark grams broadcast: the corpus side never shuffles
    # for the probe; the only exchange is the per-doc hash agg.
    totals = doc_grams.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("total_ngrams")
    )
    probe = F.broadcast(bench_grams) if broadcast else bench_grams
    hits = (
        doc_grams.join(probe, "h")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("contaminated_ngrams"))
    )
    per_doc = totals.join(hits, "doc_id", "left")
    out = (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("total_ngrams", F.lit(0)).alias("total_ngrams"),
            F.coalesce("contaminated_ngrams", F.lit(0)).alias(
                "contaminated_ngrams"
            ),
        )
        .withColumn(
            "is_contaminated",
            F.col("contaminated_ngrams") >= F.lit(min_hits),
        )
    )
    return out
