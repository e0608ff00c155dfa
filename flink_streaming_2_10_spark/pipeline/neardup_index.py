"""Persistent MinHash band/bucket index for INCREMENTAL near-dup
detection — the cross-run counterpart of ``streaming/runners.py``'s
exact-dedup state (north-star extension; no reference analog — Flink 1.1
programs rebuild all state per job, pom.xml's connectors notwithstanding).

Problem (r7 verdict): ``run_incremental`` carries EXACT-dedup state
across passes, but a new arrival that NEAR-duplicates an old document is
only caught by rescanning the whole corpus. This module persists the
MinHash banding as two bucketed parquet tables so a later pass joins
only the arrivals' buckets against the index — the old corpus is never
rescanned, and the index side of every probe join is EXCHANGE-FREE
(bucket layout == join partitioning; pinned in tests/test_neardup_index).

Layout (via :func:`pipeline.writer.write_bucketed_table`):

* ``{prefix}_buckets``: ``(bb, doc_id)`` bucketed by ``bb`` — one row
  per (doc, band); ``bb`` is an 8-byte hash of ``band:bucket``, the
  single join key (a collision only adds a spurious CANDIDATE, which
  signature verification then scores honestly).
* ``{prefix}_sigs``: ``(doc_id, sig)`` bucketed by ``doc_id`` — the
  K-component MinHash signature used to verify candidates WITHOUT
  touching document text: est_jaccard = matching components / K (the
  standard MinHash estimator; se ≈ sqrt(j(1-j)/K), ~0.06 at K=64).

Scale shape: build cost is one signature aggregation + one banding
explode + bucketed writes — rides the ingest. A probe shuffles ONLY the
arrivals (both probe joins' index sides are satisfied by bucket layout),
so a daily pass over D arrivals against an N-doc corpus moves O(D·bands)
rows, never O(N). Hot-bucket defense is TWO-layer: at BUILD time
(``max_bucket_size``) oversized (band, bucket) groups are dropped WHOLE
before the write — deterministic, mirrored by the oracle's HAVING cap —
but that window sees only ONE build/append batch, so k appends could
still grow a boilerplate bucket to k·cap. The PROBE therefore re-caps
over the read index (an exchange-free count on the bucketed layout, see
:func:`neardup_against_index`), so cumulative growth across appends can
never make a probe join key's fan-out exceed the cap.

Reference parity note: the banding is :func:`pipeline.dedup.
minhash_banding` — the SAME expression the in-corpus self-join uses —
so index buckets agree bit-for-bit with ``minhash_dedup_pairs``'s.
"""

from __future__ import annotations

import math

from pyspark.errors import AnalysisException
from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from flink_streaming_2_10_spark.pipeline.dedup import (
    _hash60,
    minhash_banding,
    minhash_signatures,
)
from flink_streaming_2_10_spark.pipeline.writer import write_bucketed_table

#: Build-time hot-bucket cap — same trade as dedup.DEFAULT_MAX_BUCKET_SIZE.
DEFAULT_INDEX_MAX_BUCKET = 5_000


def _bb(hasher: str) -> Column:
    """8-byte (band, bucket) join key: hash of 'band:bucket'."""
    return _hash60(
        F.concat_ws(":", F.col("band").cast("string"), F.col("bucket")), hasher
    )


def _banded_with_key(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int,
    bands: int,
    rows: int,
    shingle_n: int,
    hasher: str,
) -> tuple[DataFrame, DataFrame]:
    """(signatures, banded-with-bb) for a document set. ``hash_buckets``
    is False so the raw concat bucket feeds the bb hash — required for
    the md5/DuckDB-exact path and harmless for xxhash64."""
    sigs = minhash_signatures(
        docs, id_col=id_col, text_col=text_col,
        num_hashes=num_hashes, shingle_n=shingle_n, hasher=hasher,
    )
    banded = minhash_banding(
        sigs, bands=bands, rows=rows, hash_buckets=False, validate=False
    ).select(F.col("doc_id"), _bb(hasher).alias("bb"))
    return sigs, banded


def build_neardup_index(
    docs: DataFrame,
    path: str,
    prefix: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    rows: int = 4,
    shingle_n: int = 3,
    hasher: str = "xxhash64",
    num_buckets: int = 64,
    max_bucket_size: int | None = DEFAULT_INDEX_MAX_BUCKET,
    mode: str = "overwrite",
) -> None:
    """Persist the MinHash index of ``docs`` as the two bucketed tables
    ``{prefix}_buckets`` / ``{prefix}_sigs`` rooted at ``path``.

    ``mode="append"`` is the incremental-ingest face: after a pass
    flags (and the caller filters) near-dups, appending the SURVIVORS
    keeps the index covering the whole corpus without rewriting it —
    ``saveAsTable`` append preserves the bucket spec, so probe joins
    stay exchange-free across any number of appends.
    """
    if num_hashes != bands * rows:
        raise ValueError(
            f"num_hashes {num_hashes} != bands {bands} * rows {rows}"
        )
    sigs, banded = _banded_with_key(
        docs, id_col, text_col, num_hashes, bands, rows, shingle_n, hasher
    )
    # Both bucketed writes below consume `sigs` (banded derives from it):
    # without a persist the full corpus-scan → shingle → num_hashes-
    # permutation signature pipeline executes TWICE — once per write
    # action. Persist the compact (doc_id, sig) rows across the two
    # writes (guide §5: reused AND expensive to recompute); the first
    # write materializes the cache, the second reads it, and the blocks
    # are dropped before returning — nothing escapes the build.
    sigs = sigs.persist()
    try:
        _write_index_tables(
            sigs, banded, path, prefix, num_buckets, max_bucket_size, mode
        )
    finally:
        sigs.unpersist()


def _write_index_tables(
    sigs: DataFrame,
    banded: DataFrame,
    path: str,
    prefix: str,
    num_buckets: int,
    max_bucket_size: int | None,
    mode: str,
) -> None:
    if max_bucket_size is not None:
        # Deterministic build-time whole-bucket drop: rides the write's
        # own shuffle (window over bb). Scope: THIS batch only — the
        # window cannot see rows already in the table under
        # mode="append", so the probe applies the cap again over the
        # read index (cumulative-growth defense).
        w = Window.partitionBy("bb")
        banded = (
            banded.withColumn("__bs", F.count(F.lit(1)).over(w))
            .filter(F.col("__bs") <= max_bucket_size)
            .drop("__bs")
        )
    write_bucketed_table(
        banded, f"{prefix}_buckets", f"{path}/buckets",
        bucket_col="bb", num_buckets=num_buckets, mode=mode,
    )
    write_bucketed_table(
        sigs, f"{prefix}_sigs", f"{path}/sigs",
        bucket_col="doc_id", num_buckets=num_buckets, mode=mode,
    )


def _auto_compact_index_table(
    spark: SparkSession, table: str, bucket_col: str, num_buckets: int
) -> None:
    """One generation-style compaction of an append-grown bucketed index
    table (:func:`writer.compact_bucketed_table`): reads the table's
    CURRENT catalog location, writes generation N+1 as
    ``{base}_g{N+1}``, and re-points the name. The old generation's
    files are left for the caller's retention window.

    The counter and base path live in TBLPROPERTIES
    (:data:`writer.GENERATION_PROP` / :data:`writer.BASE_PATH_PROP`),
    NOT parsed out of the path — a user-chosen root that itself ends in
    ``_g2`` has its first compaction written to ``..._g2_g1``, never to
    the colliding sibling ``..._g3``. Tables compacted by a pre-r15
    build (lineage recorded, no generation property) fall back to the
    old suffix parse — but only when the parsed chain is corroborated
    by the recorded lineage (the previous generation's path appears in
    PREV_PATHS_PROP); a MANUAL ``compact_bucketed_table`` call to a
    user path that merely ends in ``_gN`` records lineage too, and
    trusting its suffix would misderive the base and jump the counter
    to N+1 — such tables restart as a fresh base at generation 1."""
    import re

    from flink_streaming_2_10_spark.pipeline.writer import (
        BASE_PATH_PROP,
        GENERATION_PROP,
        PREV_PATHS_PROP,
        _decode_prev_paths,
        _norm_location,
        _sql_str_lit,
        _table_location,
        _table_properties,
        compact_bucketed_table,
    )

    loc = _table_location(spark, table)
    if loc is None:
        return
    old = _norm_location(loc)
    props = _table_properties(spark, table)
    base = props.get(BASE_PATH_PROP)
    gen_raw = props.get(GENERATION_PROP)
    if base and gen_raw is not None:
        nxt = int(gen_raw) + 1
    elif props.get(PREV_PATHS_PROP):
        # Legacy (pre-r15) AUTO-compacted table: lineage recorded but no
        # generation counter — its _g suffix was written by this module,
        # so the suffix parse recovers base and counter. Guard: lineage
        # can also exist after a MANUAL compact_bucketed_table call to
        # an arbitrary user path that merely ENDS in _gN; trusting that
        # suffix would misderive base and jump the counter to N+1. The
        # suffix is ours only if the generation chain is actually in the
        # recorded lineage: the previous generation's path (base for
        # N=1, base_g{N-1} otherwise) must appear in PREV_PATHS_PROP.
        recorded = {
            _norm_location(p)
            for p in _decode_prev_paths(props.get(PREV_PATHS_PROP, ""))
        }
        m = re.search(r"_g(\d+)$", old)
        if m:
            n = int(m.group(1))
            cand_base = old[: m.start()]
            prev_gen = cand_base if n == 1 else f"{cand_base}_g{n - 1}"
            if _norm_location(prev_gen) in recorded:
                nxt, base = n + 1, cand_base
            else:
                # manual compaction to a coincidental _gN path: treat
                # the current location as a fresh base
                nxt, base = 1, old
        else:
            nxt, base = 1, old
    else:
        # never compacted: the current location IS the base, verbatim
        nxt, base = 1, old
    new = f"{base}_g{nxt}"
    compact_bucketed_table(spark, table, old, new, bucket_col, num_buckets)
    esc = _sql_str_lit(base)
    spark.sql(
        f"ALTER TABLE {table} SET TBLPROPERTIES "
        f"('{GENERATION_PROP}' = '{nxt}', '{BASE_PATH_PROP}' = '{esc}')"
    )


def neardup_ingest_batch(
    spark: SparkSession,
    path: str,
    prefix: str,
    flagged_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
    compact_every: int | None = None,
    **index_params,
):
    """``foreachBatch`` callback for NEAR-dup-aware incremental ingestion
    — compose with :func:`streaming.runners.run_incremental`:

    each arriving micro-batch is (1) probed against the persisted index
    (old corpus never rescanned), (2) its flagged pairs appended to
    ``flagged_dir`` parquet, and (3) its SURVIVORS (arrivals that
    near-duplicate nothing indexed) appended to the index, so the next
    pass — today's or next month's — probes against the grown corpus.
    The first batch ever creates the index. This closes the gap
    ``run_incremental`` + ``streaming_exact_dedup`` leave open: a new
    arrival near- (not exact-) duplicating an OLD document is now caught
    without a full-corpus rescan.

    Scope: arrivals are probed against the INDEX, not against each other
    — two near-dup documents arriving in the same batch both survive
    (run a batch-local ``minhash_dedup_pairs`` first if intra-batch
    dedup matters; at daily-arrival scale the index probe is the 100 TB
    cost that matters). Survivor appends preserve the bucket spec, so
    every probe join stays exchange-free on the index side.

    ``index_params`` forward to build/probe (num_hashes, bands, rows,
    shingle_n, hasher, max_bucket_size, num_buckets — keep them
    IDENTICAL across passes; banding parameters are baked into the
    persisted buckets).

    ``compact_every=k`` runs :func:`writer.compact_bucketed_table` on
    both index tables after every k-th append pass (generation-style —
    bucket spec preserved, probes stay exchange-free, old generation
    left for the retention window). Small-file growth under appends is
    O(passes·buckets), and a manual compaction step is the one that
    gets skipped at daily-append scale; pass counting is per callback
    instance, so a restarted job compacts k appends after ITS first
    batch.
    """
    if compact_every is not None and compact_every < 1:
        raise ValueError(f"compact_every must be >= 1, got {compact_every}")
    build_keys = (
        "num_hashes", "bands", "rows", "shingle_n", "hasher",
        "num_buckets", "max_bucket_size",
    )
    probe_keys = (
        "num_hashes", "bands", "rows", "shingle_n", "hasher",
        "max_bucket_size",
    )
    bad = set(index_params) - set(build_keys)
    if bad:
        raise ValueError(f"unknown index_params: {sorted(bad)}")

    def on_batch(batch_df: DataFrame, _batch_id: int) -> None:
        batch_df = batch_df.persist()
        try:
            if spark.catalog.tableExists(f"{prefix}_buckets"):
                flags = neardup_against_index(
                    spark, batch_df, prefix,
                    id_col=id_col, text_col=text_col, threshold=threshold,
                    **{k: v for k, v in index_params.items() if k in probe_keys},
                )
                flags.write.mode("append").parquet(flagged_dir)
                # DURABILITY: derive survivors from the just-WRITTEN
                # flagged parquet, not from the in-memory `flags` plan.
                # `flags`'s lineage reads the very index tables the two
                # appends below grow, and persist() is best-effort — if
                # cached partitions were lost between the appends, a
                # recomputation would probe a half-updated index and the
                # survivor set could differ between the buckets and sigs
                # writes, desynchronizing the two tables. Re-reading the
                # parquet severs that lineage with a durable artifact.
                # The historical flags accumulated from earlier batches
                # are harmless in the anti-join: arrival ids are unique
                # per batch, and a re-arriving already-flagged id SHOULD
                # stay out of the index either way.
                flagged_ids = (
                    spark.read.parquet(flagged_dir)
                    .select(F.col("doc_id").alias(id_col))
                    .distinct()
                )
                survivors = batch_df.join(flagged_ids, id_col, "left_anti")
                mode = "append"
            else:
                survivors = batch_df
                mode = "overwrite"
            build_neardup_index(
                survivors, path, prefix,
                id_col=id_col, text_col=text_col, mode=mode,
                **{k: v for k, v in index_params.items() if k in build_keys},
            )
            # The append executes in the micro-batch's CLONED session;
            # severing the survivors' lineage from the index tables
            # (above) also means the insert no longer refreshes the
            # caller session's cached file listing for them — refresh
            # explicitly so the next pass's probe sees this append.
            spark.catalog.refreshTable(f"{prefix}_buckets")
            spark.catalog.refreshTable(f"{prefix}_sigs")
            if mode == "append" and compact_every is not None:
                appends[0] += 1
                if appends[0] % compact_every == 0:
                    nb = index_params.get("num_buckets", 64)
                    _auto_compact_index_table(
                        spark, f"{prefix}_buckets", "bb", nb
                    )
                    _auto_compact_index_table(
                        spark, f"{prefix}_sigs", "doc_id", nb
                    )
        finally:
            batch_df.unpersist()

    appends = [0]
    return on_batch


def neardup_against_index(
    spark: SparkSession,
    arrivals: DataFrame,
    prefix: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    rows: int = 4,
    shingle_n: int = 3,
    hasher: str = "xxhash64",
    threshold: float = 0.7,
    max_bucket_size: int | None = DEFAULT_INDEX_MAX_BUCKET,
) -> DataFrame:
    """Flag arrivals that near-duplicate an INDEXED document:
    ``(doc_id, index_doc_id, est_jaccard)`` for every (arrival, old)
    pair sharing ≥1 LSH bucket whose signature-agreement estimate
    reaches ``threshold`` — without scanning the old corpus.

    ``max_bucket_size`` re-applies the build-time hot-bucket cap over
    the READ index: the build cap's window sees one append batch only,
    so k appends could cumulatively grow a boilerplate bucket to k·cap
    — this probe-side cap (count + semi-join, BOTH exchange-free on the
    bucketed-by-bb layout, so it adds no shuffle and no asymptotic
    cost beyond the scan the probe join already does) deterministically
    drops any bucket whose CURRENT size exceeds the cap, restoring the
    bounded-fan-out guarantee for every probe join key.

    The threshold compares exact integers (``matches ≥
    ceil(threshold·K)``) and the returned estimate is ``matches / K``,
    a dyadic rational — bit-identical in any engine, so the DuckDB
    oracle hash-matches. Self-pairs (an arrival already present in the
    index under the same id) are excluded.

    Plan: arrivals' banding shuffles on bb against the bucket table
    (index side exchange-FREE: bucketed on bb); the candidate set joins
    the signature table on the index doc id (index side exchange-free:
    bucketed on doc_id); the arrivals' signatures re-attach via their
    own aggregation subtree. Total movement is O(arrivals·bands +
    candidates), independent of index size.
    """
    a_sigs, a_banded = _banded_with_key(
        arrivals, id_col, text_col, num_hashes, bands, rows, shingle_n, hasher
    )
    idx_buckets = spark.table(f"{prefix}_buckets").select(
        "bb", F.col("doc_id").alias("index_doc_id")
    )
    if max_bucket_size is not None:
        # Same single scan: the window's ClusteredDistribution(bb) is
        # satisfied by the bucketed layout (no Exchange) and its sort is
        # the one the bb join needs anyway (no extra Sort either).
        w = Window.partitionBy("bb")
        idx_buckets = (
            idx_buckets.withColumn("__bs", F.count(F.lit(1)).over(w))
            .filter(F.col("__bs") <= max_bucket_size)
            .drop("__bs")
        )
    idx_sigs = spark.table(f"{prefix}_sigs").select(
        F.col("doc_id").alias("index_doc_id"), F.col("sig").alias("sig_idx")
    )
    cands = (
        a_banded.join(idx_buckets, "bb")
        .filter(F.col("doc_id") != F.col("index_doc_id"))
        .select("doc_id", "index_doc_id")
        .distinct()
    )
    min_matches = int(math.ceil(float(threshold) * num_hashes - 1e-9))
    matches = F.expr(
        "aggregate(zip_with(sig, sig_idx, (x, y) -> "
        "CASE WHEN x = y THEN 1 ELSE 0 END), 0, (acc, v) -> acc + v)"
    )
    return (
        cands.join(idx_sigs, "index_doc_id")
        .join(a_sigs, "doc_id")
        .withColumn("__m", matches)
        .filter(F.col("__m") >= F.lit(min_matches))
        .select(
            "doc_id",
            "index_doc_id",
            (F.col("__m").cast("double") / F.lit(float(num_hashes))).alias(
                "est_jaccard"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Media (perceptual-hash) index — the payload_neardup analog of the
# MinHash index above: same two-table bucketed layout, same exchange-free
# probe contract, with the 64-bit byte-signal dHash
# (multimodal.phash_bytes) in place of MinHash signatures and Hamming
# verification in place of signature agreement.
# ---------------------------------------------------------------------------


def _media_chunked(
    media, id_col: str, payload_col: str, bits: int, chunks: int, hasher: str
):
    """(phashes, chunk-keyed rows) for a media set: fingerprints via the
    Arrow-batched scan stage, then one row per (media, chunk) carrying
    BOTH the raw ``(c, v)`` chunk identity and ``cb`` = 8-byte hash of
    'chunk:value' — ``cb`` is the single bucket/join key (exactly the
    text index's ``bb`` construction) while ``(c, v)`` is what hot-
    bucket caps group by, so a 60-bit ``cb`` collision can only add a
    spurious CANDIDATE (removed by Hamming verification) and can never
    merge two chunk groups past the cap (r12 advisory). The chunk
    extraction is the simhash pigeonhole form (arithmetic shift + mask —
    identical in Spark and DuckDB, proven by the dedup_simhash
    oracle)."""
    from flink_streaming_2_10_spark.pipeline.multimodal import media_phash

    if bits % chunks:
        raise ValueError(f"bits {bits} not divisible by chunks {chunks}")
    width = bits // chunks
    mask = (1 << width) - 1
    fps = media_phash(
        media, id_col=id_col, payload_col=payload_col, bits=bits
    )
    chunked = fps.select(
        "media_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("c"),
                        F.shiftright("phash", c * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("v"),
                    )
                    for c in range(chunks)
                ]
            )
        ).alias("ch"),
    ).select(
        "media_id",
        F.col("ch.c").alias("c"),
        F.col("ch.v").alias("v"),
        _hash60(
            F.concat_ws(
                ":",
                F.col("ch.c").cast("string"),
                F.col("ch.v").cast("string"),
            ),
            hasher,
        ).alias("cb"),
    )
    return fps, chunked


def _media_index_has_raw_chunks(spark: SparkSession, prefix: str) -> bool:
    """True iff the persisted ``{prefix}_buckets`` table carries the raw
    ``(c, v)`` chunk-identity columns (post-migration schema)."""
    return {"c", "v"} <= set(spark.table(f"{prefix}_buckets").columns)


def _require_raw_chunk_columns(spark: SparkSession, prefix: str) -> None:
    """Refuse an append that would interleave the post-migration bucket
    schema into a pre-migration index (see the Migration note on
    :func:`build_media_phash_index`)."""
    table = f"{prefix}_buckets"
    try:
        exists = spark.catalog.tableExists(table)
    except AnalysisException:
        return
    if exists and not _media_index_has_raw_chunks(spark, prefix):
        raise ValueError(
            f"persisted media index table '{table}' predates the raw "
            f"(c, v) chunk columns — appending would interleave two "
            f"schemas. Rebuild the index from the full media corpus "
            f"with mode='overwrite' (compaction cannot add the columns)."
        )


def build_media_phash_index(
    media,
    path: str,
    prefix: str,
    id_col: str = "media_id",
    payload_col: str = "payload",
    bits: int = 64,
    chunks: int = 4,
    hasher: str = "xxhash64",
    num_buckets: int = 64,
    max_bucket_size: int | None = DEFAULT_INDEX_MAX_BUCKET,
    mode: str = "overwrite",
) -> None:
    """Persist the perceptual-hash index of ``media`` as two bucketed
    tables ``{prefix}_buckets`` (cb, media_id — bucketed by cb) and
    ``{prefix}_phash`` (media_id, phash — bucketed by media_id).

    Closes for MEDIA the gap the MinHash index closes for text (module
    docstring): a newly crawled image/audio payload that re-encodes an
    already-ingested one is caught by probing ONLY the arrival's chunk
    buckets — the old corpus is never rescanned and payload bytes never
    leave their original scan. ``mode="append"`` is the incremental-
    ingest face; the bucket spec survives appends so probes stay
    exchange-free. Build-time hot-bucket cap as in
    :func:`build_neardup_index` (this batch's window only — the probe
    re-caps, same two-layer defense). Caps group by the RAW ``(c, v)``
    chunk identity, not the hashed ``cb`` key, so oracle parity holds
    even under a 60-bit ``cb`` collision; the bucket table persists
    ``(c, v)`` alongside ``cb`` so the probe-side re-cap can do the
    same over the read index.

    **Migration**: the raw ``(c, v)`` columns were added to the bucket
    table schema after its first release. Appending to an index
    persisted by the earlier code would silently interleave two
    schemas, so ``mode="append"`` raises with instructions when the
    existing table lacks them — REBUILD the index from the full media
    corpus with ``mode="overwrite"`` (re-chunking is one pass over the
    payloads; compaction alone cannot add the columns). Probing an
    old-schema index still works: :func:`media_against_index` falls
    back to capping by ``cb`` (the pre-migration behavior) with a
    warning."""
    fps, chunked = _media_chunked(
        media, id_col, payload_col, bits, chunks, hasher
    )
    if mode == "append":
        _require_raw_chunk_columns(media.sparkSession, prefix)
    if max_bucket_size is not None:
        w = Window.partitionBy("c", "v")
        chunked = (
            chunked.withColumn("__bs", F.count(F.lit(1)).over(w))
            .filter(F.col("__bs") <= max_bucket_size)
            .drop("__bs")
        )
    # Same double-materialization hazard as build_neardup_index: both
    # writes consume `fps`, and recomputing it repeats the payload-
    # hashing pass (the expensive stage — payload bytes re-read and
    # re-fingerprinted). Persist the tiny (media_id, phash) rows for the
    # duration of the two writes, then drop the blocks.
    fps = fps.persist()
    try:
        write_bucketed_table(
            chunked, f"{prefix}_buckets", f"{path}/buckets",
            bucket_col="cb", num_buckets=num_buckets, mode=mode,
        )
        write_bucketed_table(
            fps, f"{prefix}_phash", f"{path}/phash",
            bucket_col="media_id", num_buckets=num_buckets, mode=mode,
        )
    finally:
        fps.unpersist()


def media_against_index(
    spark: SparkSession,
    arrivals,
    prefix: str,
    id_col: str = "media_id",
    payload_col: str = "payload",
    bits: int = 64,
    chunks: int = 4,
    hasher: str = "xxhash64",
    max_hamming: int = 3,
    max_bucket_size: int | None = DEFAULT_INDEX_MAX_BUCKET,
):
    """Flag arriving media that perceptually near-duplicate an INDEXED
    item: ``(media_id, index_media_id, hamming)`` for every (arrival,
    old) pair sharing ≥1 phash chunk with Hamming distance ≤
    ``max_hamming`` — without scanning the old corpus.

    With ``max_hamming < chunks`` the chunk join is EXACT by pigeonhole
    (modulo the deterministic hot-bucket cap, the family's documented
    recall trade, re-applied here over the READ index exactly as
    :func:`neardup_against_index` does and for the same cumulative-
    append reason). ``bits``/``chunks``/``hasher`` must be IDENTICAL to
    the values the index was built with — the chunk geometry is baked
    into the persisted ``cb`` keys (same contract as the text index's
    banding parameters). Verification is one ``bit_count(xor)`` on two
    8-byte fingerprints — integer-exact in any engine.

    Plan contract (pinned in tests/test_neardup_index.py): both probe
    joins' index sides are satisfied by the bucketed layout — total
    movement O(arrivals·chunks + candidates), independent of index
    size; payload bytes are consumed by the arrival-side Arrow stage
    and appear in no exchange."""
    if max_hamming >= chunks:
        raise ValueError("pigeonhole requires max_hamming < chunks")
    a_fps, a_chunked = _media_chunked(
        arrivals, id_col, payload_col, bits, chunks, hasher
    )
    # Pre-migration indexes lack the raw (c, v) columns: fall back to
    # capping by the hashed cb key (the pre-migration behavior, exact
    # except under a 60-bit cb collision) and recommend a rebuild.
    has_raw = _media_index_has_raw_chunks(spark, prefix)
    raw_cols = ["c", "v"] if has_raw else []
    idx_buckets = spark.table(f"{prefix}_buckets").select(
        "cb", *raw_cols, F.col("media_id").alias("index_media_id")
    )
    if not has_raw:
        import warnings

        warnings.warn(
            f"media index '{prefix}_buckets' predates the raw (c, v) "
            f"chunk columns; probe caps fall back to the hashed cb key "
            f"(may merge colliding chunk groups past the cap). Rebuild "
            f"the index with mode='overwrite' to restore exact capping.",
            stacklevel=2,
        )
    if max_bucket_size is not None:
        # Cap per RAW chunk group (c, v), not per hashed cb (r12
        # advisory: a 60-bit collision must not merge two groups past
        # the cap). Window-partitioning by (cb, c, v) counts exactly
        # the (c, v) groups — cb is a function of (c, v) — while the
        # bucketed-by-cb layout still satisfies the window's clustered
        # distribution, so the index side stays exchange-free (pinned
        # in tests/test_neardup_index.py).
        w = Window.partitionBy("cb", *raw_cols)
        idx_buckets = (
            idx_buckets.withColumn("__bs", F.count(F.lit(1)).over(w))
            .filter(F.col("__bs") <= max_bucket_size)
            .drop("__bs")
        )
    idx_buckets = idx_buckets.drop(*raw_cols)
    idx_fps = spark.table(f"{prefix}_phash").select(
        F.col("media_id").alias("index_media_id"),
        F.col("phash").alias("phash_idx"),
    )
    cands = (
        a_chunked.join(idx_buckets, "cb")
        .filter(F.col("media_id") != F.col("index_media_id"))
        .select("media_id", "index_media_id")
        .distinct()
    )
    return (
        cands.join(idx_fps, "index_media_id")
        .join(a_fps, "media_id")
        .withColumn(
            "hamming",
            F.bit_count(F.col("phash").bitwiseXOR(F.col("phash_idx"))),
        )
        .filter(F.col("hamming") <= F.lit(int(max_hamming)))
        .select("media_id", "index_media_id", "hamming")
    )


def media_ingest_batch(
    spark: SparkSession,
    path: str,
    prefix: str,
    flagged_dir: str,
    id_col: str = "media_id",
    payload_col: str = "payload",
    max_hamming: int = 3,
    compact_every: int | None = None,
    **index_params,
):
    """``foreachBatch`` callback for perceptual-near-dup-aware MEDIA
    ingestion — the media face of :func:`neardup_ingest_batch`, closing
    for crawled images/audio the same gap that closes for text: a new
    arrival that perceptually re-encodes an OLD payload is caught
    without rescanning the old corpus.

    Each arriving micro-batch is (1) probed against the persisted phash
    chunk index (:func:`media_against_index` — old corpus never
    rescanned, payload bytes never enter an exchange), (2) its flagged
    ``(media_id, index_media_id, hamming)`` pairs appended to
    ``flagged_dir`` parquet, and (3) its SURVIVORS (arrivals matching
    nothing indexed) appended to the index, so a pass-3 re-encode of a
    pass-2 arrival is caught too. The first batch ever creates the
    index.

    Scope and durability follow the text face exactly: arrivals are
    probed against the INDEX, not against each other (run a batch-local
    :func:`pipeline.multimodal.payload_neardup` first if intra-batch
    near-dup matters); survivors are derived from the just-WRITTEN
    flagged parquet, not the in-memory plan, so a lost cached partition
    between the two index appends cannot desynchronize the buckets and
    phash tables (see the lineage comment in
    :func:`neardup_ingest_batch`).

    ``index_params`` forward to build/probe (``bits``, ``chunks``,
    ``hasher``, ``num_buckets``, ``max_bucket_size`` — keep them
    IDENTICAL across passes; the chunk geometry is baked into the
    persisted ``cb`` keys). ``compact_every=k`` compacts both index
    tables after every k-th append pass, exactly as on the text face.
    """
    if compact_every is not None and compact_every < 1:
        raise ValueError(f"compact_every must be >= 1, got {compact_every}")
    build_keys = ("bits", "chunks", "hasher", "num_buckets", "max_bucket_size")
    probe_keys = ("bits", "chunks", "hasher", "max_bucket_size")
    bad = set(index_params) - set(build_keys)
    if bad:
        raise ValueError(f"unknown index_params: {sorted(bad)}")

    def on_batch(batch_df: DataFrame, _batch_id: int) -> None:
        batch_df = batch_df.persist()
        try:
            if spark.catalog.tableExists(f"{prefix}_buckets"):
                flags = media_against_index(
                    spark, batch_df, prefix,
                    id_col=id_col, payload_col=payload_col,
                    max_hamming=max_hamming,
                    **{k: v for k, v in index_params.items() if k in probe_keys},
                )
                flags.write.mode("append").parquet(flagged_dir)
                flagged_ids = (
                    spark.read.parquet(flagged_dir)
                    .select(F.col("media_id").alias(id_col))
                    .distinct()
                )
                survivors = batch_df.join(flagged_ids, id_col, "left_anti")
                mode = "append"
            else:
                survivors = batch_df
                mode = "overwrite"
            build_media_phash_index(
                survivors, path, prefix,
                id_col=id_col, payload_col=payload_col, mode=mode,
                **{k: v for k, v in index_params.items() if k in build_keys},
            )
            spark.catalog.refreshTable(f"{prefix}_buckets")
            spark.catalog.refreshTable(f"{prefix}_phash")
            if mode == "append" and compact_every is not None:
                appends[0] += 1
                if appends[0] % compact_every == 0:
                    nb = index_params.get("num_buckets", 64)
                    _auto_compact_index_table(
                        spark, f"{prefix}_buckets", "cb", nb
                    )
                    _auto_compact_index_table(
                        spark, f"{prefix}_phash", "media_id", nb
                    )
        finally:
            batch_df.unpersist()

    appends = [0]
    return on_batch
