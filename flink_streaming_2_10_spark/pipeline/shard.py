"""Training-shard preparation: the composed pipeline a 100 TB corpus
actually runs ahead of tokenization — language gate, quality floor, exact
dedup, per-survivor token budget — as ONE Spark job with one shuffle.

Composition shape (the point of the module):

* a single narrow projection computes language prediction, quality score,
  token counts, and the dedup fingerprint from one pass over ``text`` —
  all built-in column expressions shared with ``pipeline/textstats.py``
  (``quality_exprs`` / ``language_pred_expr``), full codegen, no Python;
* the language/quality FILTER runs scan-side, before any exchange, so
  rejected documents never shuffle;
* the only shuffle is the dedup ``groupBy`` on the 32-byte md5
  fingerprint, carrying (id, two ints, a double) per row — never the
  document body;
* survivor stats ride along via ``min_by(col, id)`` aggregates (primitive
  buffers → hash aggregate with map-side partials), so no join-back to
  the corpus is needed.

Everything is deterministic and mirrored field-for-field in the DuckDB
oracle (``__spark_entry__._training_shard_oracle``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from flink_streaming_2_10_spark.pipeline.caching import tracked_persist
from flink_streaming_2_10_spark.pipeline.textstats import (
    BPE_PATTERN,
    NONSPACE_RUN_PATTERN,
    language_pred_expr,
    quality_exprs,
)


def prepare_training_shard(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang: str = "en",
    min_quality: float = 0.5,
) -> DataFrame:
    """Filter to ``lang`` documents with quality ≥ ``min_quality``,
    exact-dedup on normalized text (min-id survivor), and emit each
    survivor's token budget.

    Returns ``(doc_id, n_dups, ws_tokens, bpe_tokens, quality)`` — the
    manifest a downstream tokenizer shards on.
    """
    text = F.col(text_col)
    ws_tokens = F.regexp_count(text, F.lit(NONSPACE_RUN_PATTERN))
    proj = df.select(
        F.col(id_col),
        language_pred_expr(text).alias("lang_pred"),
        quality_exprs(text)["quality"].alias("quality"),
        ws_tokens.alias("ws_tokens"),
        F.regexp_count(text, F.lit(BPE_PATTERN)).alias("bpe_tokens"),
        F.md5(F.regexp_replace(F.lower(text), r"\s+", " ")).alias("fp"),
    )
    kept = proj.filter(
        (F.col("lang_pred") == lang) & (F.col("quality") >= F.lit(min_quality))
    )
    return (
        kept.groupBy("fp")
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("n_dups"),
            F.min_by("ws_tokens", F.col(id_col)).alias("ws_tokens"),
            F.min_by("bpe_tokens", F.col(id_col)).alias("bpe_tokens"),
            F.min_by("quality", F.col(id_col)).alias("quality"),
        )
        .select(id_col, "n_dups", "ws_tokens", "bpe_tokens", "quality")
    )


def _curation_gate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    lang: str,
    min_quality: float,
    max_dup_word_frac: float,
) -> DataFrame:
    """The shared scan-side curation gate: ONE narrow projection computes
    language prediction, quality, token counts, the exact-dedup
    fingerprint and the duplicate-word fraction, then filters — rejected
    bodies never leave the scan stage. Keeps ``text_col`` for downstream
    consumers (shingle probes, near-dup signatures)."""
    from flink_streaming_2_10_spark.pipeline.dedup import _words_sql

    text = F.col(text_col)
    n_words = F.expr(f"size({_words_sql(text_col)})")
    n_distinct = F.expr(f"size(array_distinct({_words_sql(text_col)}))")
    dup_word_frac = (
        F.when(
            n_words > 0,
            (n_words - n_distinct).cast("double") / n_words.cast("double"),
        )
        .otherwise(F.lit(0.0))
    )
    proj = df.select(
        F.col(id_col),
        F.col(text_col),
        language_pred_expr(text).alias("lang_pred"),
        quality_exprs(text)["quality"].alias("quality"),
        F.regexp_count(text, F.lit(NONSPACE_RUN_PATTERN)).alias("ws_tokens"),
        F.regexp_count(text, F.lit(BPE_PATTERN)).alias("bpe_tokens"),
        F.md5(F.regexp_replace(F.lower(text), r"\s+", " ")).alias("fp"),
        dup_word_frac.alias("dup_word_frac"),
    )
    return proj.filter(
        (F.col("lang_pred") == lang)
        & (F.col("quality") >= F.lit(min_quality))
        & (F.col("dup_word_frac") <= F.lit(max_dup_word_frac))
    )


def _contaminated_ids(
    kept: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    decontam_n: int,
    hasher: str,
) -> DataFrame:
    """Distinct ids of ``kept`` docs sharing ≥1 ``decontam_n``-gram with
    the benchmark — the broadcast semi-join probe (eval sets are small by
    definition; corpus text never shuffles)."""
    from flink_streaming_2_10_spark.pipeline.dedup import _hash60, _shingles

    bench_grams = (
        _shingles(benchmark, id_col, text_col, decontam_n)
        .select(_hash60(F.col("shingle"), hasher).alias("h"))
        .distinct()
    )
    return (
        _shingles(kept, id_col, text_col, decontam_n)
        .select(F.col(id_col), _hash60(F.col("shingle"), hasher).alias("h"))
        .join(F.broadcast(bench_grams), "h")
        .select(id_col)
        .distinct()
    )


def prepare_curated_shard(
    df: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang: str = "en",
    min_quality: float = 0.5,
    max_dup_word_frac: float = 0.6,
    decontam_n: int = 5,
    hasher: str = "xxhash64",
) -> DataFrame:
    """``prepare_training_shard`` plus the round-2 curation gates: a
    Gopher-style repetition cap and GPT-3-style benchmark decontamination
    — still one corpus-scale shuffle.

    Pipeline order (and why it stays cheap at 100 TB):

    1. ONE narrow projection computes language, quality, token counts,
       the dedup fingerprint AND the duplicate-word fraction (array math
       on the same token split) — all gates evaluate scan-side, so
       rejected bodies never leave the scan stage;
    2. only GATE SURVIVORS explode their ``decontam_n``-grams for the
       contamination probe: a broadcast semi-join against the benchmark
       gram set (eval sets are small by definition), producing the
       contaminated-id list — an exchange of 8-byte ids for flagged docs
       only, then a broadcast anti-join back (decontamination removes a
       small fraction by assumption; if most of the corpus overlaps the
       eval set, the pipeline has bigger problems than this plan);
    3. the dedup groupBy on the 32-byte fingerprint — the single
       corpus-scale shuffle, carrying the manifest fields, not bodies.

    Returns ``(doc_id, n_dups, ws_tokens, bpe_tokens, quality,
    dup_word_frac)``.
    """
    # `kept` is consumed twice (shingle probe + anti-join left side);
    # without a persist the five-regexp gate projection runs twice over
    # every document body. MEMORY_AND_DISK spills gracefully at scale and
    # the caller releases via the caching contract (bench.py does).
    kept = tracked_persist(
        _curation_gate(df, id_col, text_col, lang, min_quality, max_dup_word_frac)
    )
    contaminated = _contaminated_ids(
        kept, benchmark, id_col, text_col, decontam_n, hasher
    )
    clean = kept.join(
        F.broadcast(contaminated),
        kept[id_col] == contaminated[id_col],
        "left_anti",
    )
    return (
        clean.groupBy("fp")
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("n_dups"),
            F.min_by("ws_tokens", F.col(id_col)).alias("ws_tokens"),
            F.min_by("bpe_tokens", F.col(id_col)).alias("bpe_tokens"),
            F.min_by("quality", F.col(id_col)).alias("quality"),
            F.min_by("dup_word_frac", F.col(id_col)).alias("dup_word_frac"),
        )
        .select(
            id_col, "n_dups", "ws_tokens", "bpe_tokens", "quality",
            "dup_word_frac",
        )
    )


def curate_corpus_neardup(
    df: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang: str = "en",
    min_quality: float = 0.5,
    max_dup_word_frac: float = 0.6,
    decontam_n: int = 5,
    num_hashes: int = 64,
    bands: int = 16,
    rows: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.7,
    hasher: str = "xxhash64",
    max_bucket_size: int | None = None,
    checkpoint: str = "local",
    resume_dir: str | None = None,
) -> DataFrame:
    """The FULL curation DAG in one call — the pipeline a corpus actually
    runs ahead of tokenization, with NEAR-duplicate (not just exact)
    canonicalization:

    1. scan-side gates (language / quality / repetition —
       :func:`_curation_gate`, one projection, rejected bodies never
       leave the scan);
    2. MinHash-LSH pairs over gate SURVIVORS only → transitive clusters
       (``connected_components`` on the ``iterate()`` loop, ids-only
       state) → keep the min-id doc per cluster. Exact duplicates are
       PRE-COLLAPSED before shingling (``minhash_dedup_pairs``'s
       ``collapse_exact``): the band self-join sees one representative
       per distinct text, and identical-class membership re-enters the
       pair graph as linear star edges — an identical-text cluster can
       never make the band join quadratic. The transitive closure (and
       therefore clusters, canonicals, and sizes) is the same as with
       the full pair set;
    3. benchmark decontamination of the canonical survivors (broadcast
       gram probe — by this stage the candidate set is smallest);
    4. per-survivor manifest ``(doc_id, cluster_size, ws_tokens,
       bpe_tokens, quality, dup_word_frac)``.

    Scale shape: the gate is a narrow map; signatures/buckets carry
    8-byte hashes, never text; the component loop state is ids-only;
    decontamination probes only canonical survivors. The corpus-scale
    shuffles are the LSH band bucket join and the per-band exchange —
    both on survivor ids.

    ``max_bucket_size`` overrides the LSH hot-bucket cap (``None`` =
    the library default ``DEFAULT_MAX_BUCKET_SIZE``). ``checkpoint`` /
    ``resume_dir`` thread through to ``connected_components`` — pass
    ``checkpoint="reliable"`` plus a ``resume_dir`` on a real cluster so
    a driver loss mid-component-loop resumes from the last completed
    round instead of restarting the 100 TB curation run.
    """
    from flink_streaming_2_10_spark.pipeline.components import (
        connected_components,
    )
    from flink_streaming_2_10_spark.pipeline.dedup import (
        DEFAULT_MAX_BUCKET_SIZE,
        minhash_dedup_pairs,
    )

    kept = tracked_persist(
        _curation_gate(df, id_col, text_col, lang, min_quality, max_dup_word_frac)
    )
    pairs = minhash_dedup_pairs(
        # `fp` is the gate's scan-side exact-dedup fingerprint — passing
        # it spares the collapse a second full-corpus normalize+md5 pass.
        kept.select(F.col(id_col), F.col(text_col), F.col("fp")),
        id_col=id_col,
        text_col=text_col,
        num_hashes=num_hashes,
        bands=bands,
        rows=rows,
        shingle_n=shingle_n,
        threshold=threshold,
        hasher=hasher,
        collapse_exact=True,
        max_bucket_size=(
            DEFAULT_MAX_BUCKET_SIZE if max_bucket_size is None else max_bucket_size
        ),
        fp_col="fp",
    )
    comp = connected_components(
        pairs,
        a_col="doc_a",
        b_col="doc_b",
        checkpoint=checkpoint,
        resume_dir=resume_dir,
    )
    # Cluster sizes come from the (small) component table alone: every
    # unpaired survivor has size 1 by construction, and a cluster's
    # canonical is itself a paired node, so the ids can't collide. The
    # gated corpus flows through probe joins only — no corpus-wide
    # groupBy(canonical_id) exchange (see components.dedup_canonical).
    comp_sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("__csize")
    )
    canon = (
        kept.join(comp, kept[id_col] == comp["node"], "left")
        .withColumn(
            "canonical_id", F.coalesce(F.col("component"), F.col(id_col))
        )
        .drop("node", "component")
    )
    surv = (
        canon.filter(F.col(id_col) == F.col("canonical_id"))
        .join(
            comp_sizes,
            F.col("canonical_id") == comp_sizes["component"],
            "left",
        )
        .withColumn(
            "cluster_size",
            F.coalesce(F.col("__csize"), F.lit(1).cast("long")),
        )
        .drop("component", "__csize")
    )
    contaminated = _contaminated_ids(
        surv, benchmark, id_col, text_col, decontam_n, hasher
    )
    clean = surv.join(
        F.broadcast(contaminated),
        surv[id_col] == contaminated[id_col],
        "left_anti",
    )
    return clean.select(
        id_col, "cluster_size", "ws_tokens", "bpe_tokens", "quality",
        "dup_word_frac",
    )


def curate_corpus_quality(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    target_lang: str = "en",
    min_seg_count: int = 500,
    num_buckets: int = 4096,
    scale: float = 0.8,
    hasher: str = "md5",
) -> DataFrame:
    """The round-11 composed curation DAG — boilerplate removal +
    domain-targeted selection in one recipe (the quality-side sibling
    of :func:`curate_corpus_neardup`):

    1. strip corpus-repeated segments keeping each one's globally-first
       occurrence (``segdedup.strip_repeated_segments`` — census
       exchange carries 8-byte hashes only);
    2. drop documents the strip emptied;
    3. DSIR importance scores against the ``target_lang`` slice of the
       SURVIVORS (``dsir.dsir_importance_scores`` — bounded count
       tables broadcast as one-row maps, scoring scan-local);
    4. deterministic importance resampling proportional to score
       (``dsir.importance_resample`` — 52-bit-exact acceptance test).

    Output: ``(doc_id, n_removed, n_grams, dsir_score)`` of the kept
    documents. Everything corpus-scale touches one strip rebuild join
    and two doc_id-keyed joins; every score/threshold is the same
    exact arithmetic its component operator contracts, so the full
    composed DAG is value-hash checkable end-to-end (the oracle
    assembles the component CTE chains).
    """
    from flink_streaming_2_10_spark.pipeline.dsir import (
        dsir_importance_scores,
        importance_resample,
    )
    from flink_streaming_2_10_spark.pipeline.segdedup import (
        strip_repeated_segments,
    )

    stripped = strip_repeated_segments(
        docs,
        id_col=id_col,
        text_col=text_col,
        # explicit whitespace class == Java \s (ADVICE r11: RE2's \s
        # lacks U+000B, so the oracle must see the spelled-out class)
        delimiter="[ \\t\\n\\x0B\\f\\r]+",
        joiner=" ",
        min_count=min_seg_count,
        keep="first",
        hasher=hasher,
    )
    # Gate matches the documented contract (ADVICE r11): keep only docs
    # with at least one SURVIVING segment — n_segments > n_removed drops
    # both segment-less docs and docs the strip emptied (previously
    # `n_segments > 0` let fully-stripped docs through, harmless only
    # because they scored 0.0 and the resample never keeps score-0 rows).
    enriched = tracked_persist(
        stripped.filter(F.col("n_segments") > F.col("n_removed")).join(
            docs.select(
                F.col(id_col).alias("doc_id"), F.col(lang_col).alias("lang")
            ),
            "doc_id",
        )
    )
    scored = dsir_importance_scores(
        enriched,
        # one-pass fused count tables: target = the lang slice of the
        # survivors (dsir._bucket_count_maps_fused)
        None,
        target_pred=F.col("lang") == target_lang,
        id_col="doc_id",
        text_col="text",
        n=2,
        num_buckets=num_buckets,
        hasher=hasher,
    )
    kept = importance_resample(scored, scale=scale)
    return kept.join(
        enriched.select("doc_id", "n_removed"), "doc_id"
    ).select("doc_id", "n_removed", "n_grams", "dsir_score")
