"""Corpus-level repeated-SEGMENT dedup — the C4 / CCNet line- and
paragraph-granular face of the dedup family (north-star extension; same
tokenizer lineage as the rest of the text family, reference
WordCount.java:106-122).

Why this operator exists: the document-level members
(Jaccard/MinHash/SimHash/containment) flag whole near-duplicate
documents, ``crossdoc`` flags verbatim ≥L-token runs, and
``despan_repeated`` collapses intra-doc periodic repeats — but the
single most common web-corpus curation step is simpler than all of
them: drop every LINE (navigation chrome, cookie banners, share
buttons) or PARAGRAPH that recurs verbatim across the corpus more
than a handful of times. C4 (Raffel et al. 2020) removes repeated
three-sentence spans keeping one occurrence; CCNet (Wenzek et al.
2020) dedups at paragraph granularity. Both are instances of ONE
primitive: split each document into segments by a delimiter regex,
count segment occurrences corpus-wide, and strip segments above a
count threshold (keeping the globally-first occurrence, or none).

Scale shape (the part that matters at 100 TB):

1. segments are a scan-local projection (split + trim + filter —
   narrow, no Python);
2. the census aggregation shuffles ONLY the 8-byte 60-bit segment
   hash with map-side partial aggregation — a segment repeated a
   million times arrives at its reducer as one partial row per map
   partition, never a million rows (no skew blow-up);
3. the keeper for ``keep="first"`` rides the SAME aggregate as a
   ``min(struct(doc_id, pos))`` — no second pass, no window over the
   corpus;
4. drop positions join hash-to-hash (ids + 8-byte hashes only — the
   text never enters a shuffle here) and collapse to one
   position-array row per affected document;
5. the rebuild joins that per-doc array back on ``doc_id`` — the one
   place document text can move, and AQE broadcasts the (affected
   docs only) array side when it is small, which for boilerplate
   stripping it usually is.

A hot segment (one cookie banner in m documents) fans out linearly —
m drop rows, never m² — the same no-self-join argument as
``crossdoc``. The exploded posting table is consumed twice (census +
drop join); it is persisted ids-only by default. At 100 TB pass
``persist_postings=False`` to trade the cache for a second scan — the
same knob, same rationale, as ``heavyhitters``.

Determinism/oracle contract (mirrored by the DuckDB oracle in
``__spark_entry__``): segments are ``trim()``-ed pieces of
``split(text, delimiter)`` with ``length >= min_chars``; positions are
1-based over that filtered array; two segments are "the same" iff
their 60-bit hashes agree (md5 hasher makes DuckDB reproduce the keys
bit-for-bit; collisions — ~n²/2⁶¹ — merge identically in both
engines); the rebuilt text is the surviving segments joined by
``joiner`` in original order; ``keep="first"`` keeps exactly the
occurrence with the smallest (doc_id, pos).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from flink_streaming_2_10_spark.pipeline.caching import tracked_persist
from flink_streaming_2_10_spark.pipeline.dedup import _hash60


def _regex_sql_literal(regex: str) -> str:
    """Escape a Java regex for embedding in a Spark SQL string literal
    (Spark SQL literals process backslash escapes; DuckDB's do not —
    the oracle builder embeds the raw regex)."""
    return regex.replace("\\", "\\\\").replace("'", "\\'")


def _segs_sql(text_col: str, delimiter: str, min_chars: int) -> str:
    """SQL for the trimmed, length-filtered segment array of
    ``text_col`` split by the ``delimiter`` regex."""
    d = _regex_sql_literal(delimiter)
    return (
        f"filter(transform(split(`{text_col}`, '{d}'), s -> trim(s)), "
        f"s -> length(s) >= {int(min_chars)})"
    )


def _exploded_postings(
    df: DataFrame,
    id_col: str,
    text_col: str,
    delimiter: str,
    min_chars: int,
    hasher: str,
) -> DataFrame:
    """One row per (doc, position): ``(doc_id, pos, h)`` with ``pos``
    1-based over the filtered segment array and ``h`` the segment's
    60-bit hash. The segment string exists only between the Generate
    node and the hash projection — it never reaches a shuffle."""
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(
                F.expr(_segs_sql(text_col, delimiter, min_chars))
            ).alias("p0", "__seg"),
        )
        .select(
            "doc_id",
            (F.col("p0") + 1).cast("int").alias("pos"),
            _hash60(F.col("__seg"), hasher).alias("h"),
        )
    )


def repeated_segments(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    delimiter: str = "\n",
    min_chars: int = 1,
    min_count: int = 2,
) -> DataFrame:
    """Census of corpus-repeated segments: ``(segment, n_total,
    n_docs)`` for every distinct trimmed segment occurring at least
    ``min_count`` times corpus-wide (``n_docs`` = distinct documents
    containing it). The reporting face — what boilerplate exists and
    how widely it spreads.

    Groups by the segment VALUE (the census must output it); the
    exchange still collapses map-side — one partial row per distinct
    segment per partition — so a million-copy banner costs one row per
    map partition in flight, and segments are short by construction.
    """
    segs = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.expr(_segs_sql(text_col, delimiter, min_chars))
        ).alias("segment"),
    )
    return (
        segs.groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .filter(F.col("n_total") >= int(min_count))
    )


def strip_repeated_segments(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    delimiter: str = "\n",
    joiner: str = "\n",
    min_chars: int = 1,
    min_count: int = 3,
    keep: str = "first",
    hasher: str = "xxhash64",
    persist_postings: bool = True,
) -> DataFrame:
    """Strip corpus-repeated segments from every document.

    ``(doc_id, n_segments, n_removed, text)`` — ``text`` is the
    document rebuilt from the segments that survive, joined by
    ``joiner``; a segment occurrence is removed iff its value occurs
    ≥ ``min_count`` times corpus-wide and (for ``keep="first"``) it is
    not the single globally-first occurrence (smallest (doc_id, pos)).
    ``keep="none"`` strips every occurrence — the aggressive
    navigation-junk face; ``keep="first"`` is the C4/CCNet-style
    information-preserving face.

    See the module docstring for the 100 TB shape; ``hasher="md5"``
    makes the DuckDB oracle bit-exact.
    """
    if keep not in ("first", "none"):
        raise ValueError(f"keep must be 'first' or 'none', got {keep!r}")
    if min_count < 2:
        raise ValueError(
            "min_count must be >= 2: a segment needs at least one other "
            "occurrence to be corpus-repeated"
        )

    exploded = _exploded_postings(
        df, id_col, text_col, delimiter, min_chars, hasher
    )
    if persist_postings:
        exploded = tracked_persist(exploded)

    counts = exploded.groupBy("h").agg(
        F.count(F.lit(1)).alias("__n"),
        F.min(F.struct("doc_id", "pos")).alias("__keeper"),
    )
    bad = counts.filter(F.col("__n") >= int(min_count))

    if keep == "none":
        drops = exploded.join(bad.select("h"), "h", "left_semi")
    else:
        drops = (
            exploded.join(bad.select("h", "__keeper"), "h")
            .filter(
                ~(
                    (F.col("doc_id") == F.col("__keeper.doc_id"))
                    & (F.col("pos") == F.col("__keeper.pos"))
                )
            )
            .select("doc_id", "pos", "h")
        )

    drop_arr = drops.groupBy("doc_id").agg(
        F.collect_set("pos").alias("__drop")
    )

    return _rebuild_without_positions(
        df, drop_arr, id_col, text_col, delimiter, joiner, min_chars
    )


def _rebuild_without_positions(
    df: DataFrame,
    drop_arr: DataFrame,
    id_col: str,
    text_col: str,
    delimiter: str,
    joiner: str,
    min_chars: int,
) -> DataFrame:
    """Rebuild every document's text from the segments whose positions
    are NOT in ``drop_arr`` (``(doc_id, __drop array<int>)``) — the
    shared scan-side tail of the batch and incremental strip faces."""
    segs_expr = _segs_sql(text_col, delimiter, min_chars)
    rebuilt = (
        df.join(
            drop_arr.withColumnRenamed("doc_id", "__did"),
            F.col(id_col) == F.col("__did"),
            "left",
        )
        .select(
            F.col(id_col).alias("doc_id"),
            F.expr(segs_expr).alias("__segs"),
            F.coalesce(
                F.col("__drop"), F.expr("cast(array() as array<int>)")
            ).alias("__dropped"),
        )
        .select(
            "doc_id",
            F.size("__segs").cast("long").alias("n_segments"),
            F.size("__dropped").cast("long").alias("n_removed"),
            F.expr(
                "concat_ws('" + _regex_sql_literal(joiner) + "', "
                "transform("
                "  filter("
                "    CASE WHEN size(__segs) >= 1"
                "         THEN sequence(1, size(__segs))"
                "         ELSE cast(array() as array<int>) END,"
                "    i -> NOT array_contains(__dropped, i)),"
                "  i -> element_at(__segs, i)))"
            ).alias("text"),
        )
    )
    return rebuilt


# ---------------------------------------------------------------------------
# Incremental face — a persisted, APPEND-ONLY segment census
# (log-structured: each ingest pass appends one bounded partial-count
# parquet; readers aggregate on the fly; compaction is optional).
# The segment-granular sibling of neardup_index's persisted MinHash
# index: old corpus never rescanned, state is hashes + counts, never
# text.
# ---------------------------------------------------------------------------


def _census_partial(
    batch_df: DataFrame,
    id_col: str,
    text_col: str,
    delimiter: str,
    min_chars: int,
    hasher: str,
) -> DataFrame:
    """One batch's census delta: ``(h, n, keeper_doc, keeper_pos)`` —
    per-hash occurrence count and the batch-local first occurrence."""
    return (
        _exploded_postings(
            batch_df, id_col, text_col, delimiter, min_chars, hasher
        )
        .groupBy("h")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(F.struct("doc_id", "pos")).alias("__k"),
        )
        .select(
            "h",
            "n",
            F.col("__k.doc_id").alias("keeper_doc"),
            F.col("__k.pos").alias("keeper_pos"),
        )
    )


def _census_state(spark: SparkSession, census_dir: str) -> DataFrame:
    """Aggregate the append-only census log to current state:
    ``(h, n, keeper_doc, keeper_pos)`` with summed counts and the
    global-minimum keeper. Count sums and struct-min are MERGEABLE, so
    any partition of the log into deltas reads back to the same state."""
    log = spark.read.parquet(census_dir)
    return (
        log.groupBy("h")
        .agg(
            F.sum("n").alias("n"),
            F.min(F.struct("keeper_doc", "keeper_pos")).alias("__k"),
        )
        .select(
            "h",
            "n",
            F.col("__k.keeper_doc").alias("keeper_doc"),
            F.col("__k.keeper_pos").alias("keeper_pos"),
        )
    )


def compact_segment_census(spark: SparkSession, census_dir: str) -> None:
    """Rewrite the census log as one aggregated delta (read cost of the
    strip probe grows with the number of appended deltas until
    compacted; state and results are unchanged — the mergeable-state
    property tested in test_segdedup)."""
    # localCheckpoint materializes the aggregated state to executor
    # storage and CUTS the lineage to the log files, so overwriting the
    # directory the state was read from is safe — and nothing
    # distinct-segment-scale ever touches the driver.
    state = _census_state(spark, census_dir).localCheckpoint()
    state.write.mode("overwrite").parquet(census_dir)


def strip_against_census(
    spark: SparkSession,
    batch_df: DataFrame,
    census_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    delimiter: str = "\n",
    joiner: str = "\n",
    min_chars: int = 1,
    min_count: int = 3,
    keep: str = "first",
    hasher: str = "xxhash64",
) -> DataFrame:
    """Strip ``batch_df``'s corpus-repeated segments using the persisted
    census state (which must already include this batch's own delta —
    :func:`segdedup_ingest_batch` appends first, then strips). Same
    output contract as :func:`strip_repeated_segments`; the probe joins
    batch postings to census state hash-to-hash — the historical corpus
    is never rescanned."""
    if keep not in ("first", "none"):
        raise ValueError(f"keep must be 'first' or 'none', got {keep!r}")
    exploded = _exploded_postings(
        batch_df, id_col, text_col, delimiter, min_chars, hasher
    )
    bad = _census_state(spark, census_dir).filter(
        F.col("n") >= int(min_count)
    )
    joined = exploded.join(bad, "h")
    if keep == "first":
        joined = joined.filter(
            ~(
                (F.col("doc_id") == F.col("keeper_doc"))
                & (F.col("pos") == F.col("keeper_pos"))
            )
        )
    drop_arr = joined.groupBy("doc_id").agg(
        F.collect_set("pos").alias("__drop")
    )
    return _rebuild_without_positions(
        batch_df, drop_arr, id_col, text_col, delimiter, joiner, min_chars
    )


def segdedup_ingest_batch(
    spark: SparkSession,
    census_dir: str,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    delimiter: str = "\n",
    joiner: str = "\n",
    min_chars: int = 1,
    min_count: int = 3,
    keep: str = "first",
    hasher: str = "xxhash64",
    compact_every: int | None = None,
):
    """``foreachBatch`` callback for segment-dedup-aware incremental
    ingestion — compose with ``streaming.runners.run_incremental``:

    each arriving micro-batch (1) appends its census delta (so
    intra-batch repeats AND repeats of any earlier pass's segments are
    counted), then (2) strips against the UPDATED census and appends
    the survivors' rebuilt text to ``out_dir``. With monotonically
    increasing doc ids across passes the result equals the batch
    operator replayed over the union (pinned in test_segdedup); the one
    streaming asymmetry is inherent and shared with every incremental
    dedup face here: a segment crossing ``min_count`` only in a LATER
    pass does not retro-strip documents already written.

    State is the append-only census log — 8-byte hashes, counts, and
    keeper coordinates; document text never enters it. Keep the
    delimiter/hasher parameters IDENTICAL across passes.

    ``compact_every=k`` runs :func:`compact_segment_census` after every
    k-th batch (state and results unchanged — the mergeable-state
    property; the strip probe's read cost otherwise grows with the
    number of appended deltas). Batch counting is per callback
    instance."""
    if compact_every is not None and compact_every < 1:
        raise ValueError(f"compact_every must be >= 1, got {compact_every}")

    def on_batch(batch_df: DataFrame, _batch_id: int) -> None:
        batch_df = batch_df.persist()
        try:
            _census_partial(
                batch_df, id_col, text_col, delimiter, min_chars, hasher
            ).write.mode("append").parquet(census_dir)
            stripped = strip_against_census(
                spark,
                batch_df,
                census_dir,
                id_col=id_col,
                text_col=text_col,
                delimiter=delimiter,
                joiner=joiner,
                min_chars=min_chars,
                min_count=min_count,
                keep=keep,
                hasher=hasher,
            )
            stripped.write.mode("append").parquet(out_dir)
            if compact_every is not None:
                batches[0] += 1
                if batches[0] % compact_every == 0:
                    compact_segment_census(spark, census_dir)
        finally:
            batch_df.unpersist()

    batches = [0]
    return on_batch
