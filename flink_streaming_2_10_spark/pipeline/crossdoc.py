"""Cross-document EXACT substring dedup — flag (and optionally strip)
verbatim token spans of length ≥ L shared across documents, in the
spirit of Lee et al. 2022 ("Deduplicating Training Data Makes Language
Models Better"), the across-document flavor (north-star extension;
builds on the reference's tokenizer surface, WordCount.java:106-122,
like the rest of the text family).

Why this operator exists: the dedup family detects near-duplicate
DOCUMENTS (Jaccard/MinHash/SimHash/containment) and ``text_despan``
removes INTRA-document periodic repeats, but a 200-token boilerplate
paragraph pasted into thousands of otherwise-distinct documents is
neither — it is below doc-level Jaccard thresholds and is not an
adjacent intra-doc repeat. This is the standard curation step that
catches it (the r8 verdict's top missing pipeline operator).

Method (suffix arrays are a single-machine construction; the
distributed equivalent is a fixed-width shingle inverted index):

1. pre-collapse exact duplicates (``dedup._exact_classes``): window
   work runs over DISTINCT normalized texts only — an m-copy flood of
   one boilerplate page costs one representative, not m, and class
   multiplicity re-enters the sharer counts exactly (star
   re-expansion, the same defense the pair family uses);
2. slide an L-token window over each representative's token array
   (one HOF projection + one posexplode — Σ windows ≈ Σ tokens rows,
   the shingle cost class) and hash each window to a 60-bit key;
3. count SHARERS per window key: distinct (key, class) rows weighted
   by class multiplicity — one partial-aggregated shuffle on the
   60-bit key, never the text;
4. keep positions whose window reaches ``min_sharers`` and merge
   adjacent positions into MAXIMAL spans per class (gaps-and-islands:
   one window function over (class, position) — position-integers
   only);
5. re-expand spans to every member document of each class.

Scale shape: no self-join anywhere — the sharer aggregation emits ONE
row per window key regardless of how many documents contain it, and
the positions-side join against it fans out at most the input's own
window count, so a boilerplate span shared by a million documents
costs O(member docs) output rows, not O(docs²) — hot keys are a skew
(AQE) concern, never a blow-up. Everything that shuffles is (hash,
class-fingerprint, position, count) — the document text never moves.

Output/semantics contract (mirrored by the DuckDB oracle in
``__spark_entry__``): positions are 1-based over the filtered
lowercase ``\\W+`` token array; a span is a maximal run of consecutive
positions t whose window tokens[t..t+L−1] appears in ≥ ``min_sharers``
documents (counting the document itself and every exact copy);
``span_len`` counts tokens covered (run length + L − 1);
``n_sharers`` is the minimum sharer count over the span's windows —
exact for single-window spans and an upper bound on the number of
documents sharing the WHOLE span otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from flink_streaming_2_10_spark.pipeline.caching import tracked_persist
from flink_streaming_2_10_spark.pipeline.dedup import (
    _exact_classes,
    _hash60,
    _words_sql,
)

#: Default shared-span window: Lee et al. 2022 use 50 BPE tokens; 50
#: whitespace-ish tokens is the closest analog on this tokenizer.
DEFAULT_SPAN_TOKENS = 50


def _window_rows(
    cls: DataFrame, window: int, hasher: str
) -> DataFrame:
    """One row per (class, position): ``(__nfp, __m, t, h)`` with ``t``
    the 1-based start position and ``h`` the 60-bit hash of the L-token
    window starting there. The token array is projected once below the
    Generate (posexplode) node, shingle-style."""
    parts = ", ".join(
        f"__ws[i + {j}]" if j else "__ws[i]" for j in range(window)
    )
    warr = (
        f"CASE WHEN size(__ws) >= {window} "
        f"THEN transform(sequence(0, size(__ws) - {window}), "
        f"i -> concat_ws(' ', {parts})) "
        f"ELSE cast(array() as array<string>) END"
    )
    return (
        cls.select(
            "__nfp", "__m", F.expr(_words_sql("__rep_text")).alias("__ws")
        )
        .select("__nfp", "__m", F.posexplode(F.expr(warr)).alias("p0", "__w"))
        .select(
            "__nfp",
            "__m",
            (F.col("p0") + 1).cast("long").alias("t"),
            _hash60(F.col("__w"), hasher).alias("h"),
        )
    )


def cross_doc_shared_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = DEFAULT_SPAN_TOKENS,
    min_sharers: int = 2,
    hasher: str = "xxhash64",
) -> DataFrame:
    """``(doc_id, span_start, span_len, n_sharers)`` — every maximal
    verbatim token span of length ≥ ``window`` that ``doc_id`` shares
    with at least ``min_sharers − 1`` other documents (exact copies
    included in the count). See the module docstring for the contract.
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    if min_sharers < 2:
        raise ValueError(
            "min_sharers must be >= 2: a span needs at least one OTHER "
            "sharer to be cross-document"
        )
    nrm, cls = _exact_classes(df, id_col, text_col)
    # Persisted: feeds both the sharer aggregation and the position join
    # (caller releases via pipeline.caching.release_cached).
    wrows = tracked_persist(_window_rows(cls, int(window), hasher))
    sharers = (
        wrows.select("h", "__nfp", "__m")
        .distinct()
        .groupBy("h")
        .agg(F.sum("__m").alias("n_sh"))
        .filter(F.col("n_sh") >= int(min_sharers))
    )
    matched = wrows.join(sharers, "h").select("__nfp", "t", "n_sh")
    # Gaps-and-islands: consecutive matched positions share (t − rank).
    grp = F.col("t") - F.row_number().over(
        Window.partitionBy("__nfp").orderBy("t")
    )
    spans = (
        matched.withColumn("__g", grp)
        .groupBy("__nfp", "__g")
        .agg(
            F.min("t").alias("span_start"),
            (F.max("t") - F.min("t") + F.lit(int(window)))
            .cast("long")
            .alias("span_len"),
            F.min("n_sh").cast("long").alias("n_sharers"),
        )
        .drop("__g")
    )
    return (
        nrm.select(F.col(id_col).alias("doc_id"), "__nfp")
        .join(spans, "__nfp")
        .select("doc_id", "span_start", "span_len", "n_sharers")
    )


def strip_shared_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = DEFAULT_SPAN_TOKENS,
    min_sharers: int = 2,
    hasher: str = "xxhash64",
) -> DataFrame:
    """Remove every token covered by a cross-document shared span from
    every document (the aggressive boilerplate-stripping face; Lee et
    al. keep one occurrence — keeping a canonical copy is a
    survivorship policy layered on top, same as ``exact_dedup``'s
    min-id rule). Returns ``(doc_id, n_tokens, n_removed,
    stripped_text)``.

    Covered positions come from the spans' (start, len) intervals via
    one per-class interval array (classes re-use the SAME span
    computation, so the text is tokenized once more but never joined
    row-per-position)."""
    nrm, cls = _exact_classes(df, id_col, text_col)
    wrows = tracked_persist(_window_rows(cls, int(window), hasher))
    sharers = (
        wrows.select("h", "__nfp", "__m")
        .distinct()
        .groupBy("h")
        .agg(F.sum("__m").alias("n_sh"))
        .filter(F.col("n_sh") >= int(min_sharers))
    )
    matched = wrows.join(sharers, "h").select("__nfp", "t")
    grp = F.col("t") - F.row_number().over(
        Window.partitionBy("__nfp").orderBy("t")
    )
    ivals = (
        matched.withColumn("__g", grp)
        .groupBy("__nfp", "__g")
        .agg(
            F.min("t").alias("s"),
            (F.max("t") + F.lit(int(window) - 1)).alias("e"),
        )
        .groupBy("__nfp")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("s"), F.col("e")))
            ).alias("__iv")
        )
    )
    base = nrm.join(ivals, "__nfp", "left").select(
        F.col(id_col).alias("doc_id"),
        F.expr(_words_sql(text_col)).alias("__ws"),
        F.coalesce(
            F.col("__iv"),
            F.expr("cast(array() as array<struct<s:bigint,e:bigint>>)"),
        ).alias("__iv"),
    )
    kept = (
        "CASE WHEN size(__ws) = 0 THEN cast(array() as array<string>) "
        "ELSE transform(filter(sequence(1, size(__ws)), "
        "t -> NOT exists(__iv, v -> t >= v.s AND t <= v.e)), "
        "t -> element_at(__ws, t)) END"
    )
    out = base.select(
        "doc_id",
        F.size("__ws").cast("long").alias("n_tokens"),
        F.expr(kept).alias("__kept"),
    )
    return out.select(
        "doc_id",
        "n_tokens",
        (F.col("n_tokens") - F.size("__kept").cast("long")).alias(
            "n_removed"
        ),
        F.concat_ws(" ", F.col("__kept")).alias("stripped_text"),
    )
