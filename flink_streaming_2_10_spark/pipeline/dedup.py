"""Deduplication operators for large-scale training-data pipelines.

Beyond the reference surface (BASELINE.json north-star): exact dedup,
exact n-gram Jaccard via inverted-index join, MinHash+LSH, and SimHash.
All are pure DataFrame compositions — no driver-side collection — designed
so every stage is a hash exchange Catalyst can plan at 100 TB:

* exact: one groupBy on a fingerprint column (32-byte key, not the body).
* n-gram Jaccard: explode → inverted-index self-join on token → per-pair
  intersection counts → filter. The join key is the token, so shuffle
  volume is Σ posting-list² per token — bound it with ``max_df`` (drop
  tokens appearing in more than N docs; standard stop-token pruning) at
  scale.
* MinHash+LSH: per-doc K minhashes (one aggregation), banded bucket join
  (b bands × r rows), candidate pairs from same-bucket collisions, exact
  Jaccard verification of candidates only. Identical-text hardening:
  exact duplicates PRE-COLLAPSE to one representative per distinct
  normalized text before shingling, re-expanding as linear star edges —
  a million-copy boilerplate cluster can never make the band self-join
  quadratic — plus a deterministic per-(band, bucket) size cap
  (``DEFAULT_MAX_BUCKET_SIZE``) as defense in depth.
* SimHash: 64-bit fingerprint from token-hash bit votes; near-dup pairs by
  pigeonholed chunk join (hamming ≤ k pairs must share one of k+1 chunks)
  verified with bit_count(xor). Same pre-collapse (on equal fingerprints)
  and optional per-chunk-bucket cap.

Hashing: ``hasher="xxhash64"`` (default) keeps everything JVM-side and
fast — the right choice on a cluster. ``hasher="md5"`` derives a 60-bit
integer from the md5 hex digest, which DuckDB reproduces bit-for-bit
(``('0x'||substr(md5(x),1,15))::BIGINT``), making the whole MinHash/SimHash
pipeline oracle-checkable. Same plan shape either way — only the hash
expression differs.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import Column, DataFrame, functions as F

from flink_streaming_2_10_spark.functions.text import NON_WORD_PATTERN
from flink_streaming_2_10_spark.pipeline.caching import tracked_persist

# ---------------------------------------------------------------------------
# hashing + tokenization
# ---------------------------------------------------------------------------


#: MinHash permutation arithmetic: the K hash functions are affine
#: permutations g_i(x) = (a_i·h(x) + b_i) mod p of ONE base hash per
#: shingle (the standard one-hash-K-permutations MinHash). p = 2^31−1
#: keeps a_i·h < 2^62 — safe under Spark's ANSI arithmetic — and the
#: per-function random multipliers a_i give the per-function independence
#: that naive double-hashing (h1 + i·h2) lacks: there the argmin lies on a
#: lower envelope of lines controlled by a couple of extreme elements, so
#: one differing element can decorrelate EVERY function at once.
_MERSENNE_31 = (1 << 31) - 1


def minhash_perm_params(num_hashes: int, seed: int = 7) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) affine-permutation constants — plain
    Python md5 so the DuckDB oracle embeds identical literals."""
    params: list[tuple[int, int]] = []
    for i in range(num_hashes):
        d = hashlib.md5(f"minhash:{seed}:{i}".encode()).digest()
        a = int.from_bytes(d[:4], "big") % (_MERSENNE_31 - 1) + 1
        b = int.from_bytes(d[4:8], "big") % _MERSENNE_31
        params.append((a, b))
    return params


def _hash64(col: Column, seed: int, hasher: str) -> Column:
    """Seeded 64-bit-ish integer hash of a string column.

    ``xxhash64``: native seeded hash (fast path). ``md5``: first 15 hex
    chars (60 bits) of md5(seed || ':' || value) as a BIGINT — chosen
    because DuckDB computes the identical value, so oracle SQL can verify
    signature pipelines end-to-end.
    """
    if hasher == "xxhash64":
        return F.xxhash64(col, F.lit(seed))
    if hasher == "md5":
        seeded = F.concat(F.lit(f"{seed}:"), col)
        return F.conv(F.substring(F.md5(seeded), 1, 15), 16, 10).cast("long")
    raise ValueError(f"unknown hasher: {hasher}")


def _hash60(col: Column, hasher: str) -> Column:
    """Seedless 60-bit (md5) / 64-bit (xxhash64) integer hash of a string
    column. This is the POSTING key: dedup joins carry this 8-byte long
    through every shuffle instead of the shingle string (~25 bytes) —
    narrower exchanges and long-vs-string join comparisons. Collisions
    (~n²/2^61) alter intersection counts identically in both engines (the
    DuckDB oracle hashes with the same function), so oracle parity holds
    exactly."""
    if hasher == "xxhash64":
        return F.xxhash64(col, F.lit(0))
    if hasher == "md5":
        return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")
    raise ValueError(f"unknown hasher: {hasher}")


def duckdb_hash60_sql(expr: str) -> str:
    """DuckDB SQL reproducing ``_hash60(..., hasher='md5')`` exactly."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def _base_hash(col: Column, hasher: str) -> Column:
    """Single base hash per shingle, reduced mod 2^31−1 — each shingle is
    digested ONCE regardless of K (the difference between 1 and K digest
    computations per posting)."""
    return F.pmod(_hash60(col, hasher), F.lit(_MERSENNE_31))


#: ``NON_WORD_PATTERN`` with backslashes doubled for embedding in a Spark
#: SQL string literal (the SQL parser consumes one level of escaping).
_PAT_SQL = NON_WORD_PATTERN.replace("\\", "\\\\")


def _words_sql(text_col: str) -> str:
    """SQL for the filtered lowercase token array of ``text_col``."""
    return (
        f"filter(split(lower(`{text_col}`), '{_PAT_SQL}'), "
        f"w -> length(w) > 0)"
    )


def _tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, token) pairs: lowercase \\W+ tokens, empties dropped,
    de-duplicated per document (set semantics for Jaccard).

    The token array is projected ONCE below the Generate (explode) node —
    CollapseProject does not merge across Generate, so the split/filter
    runs once per document, and per-doc ``array_distinct`` replaces a
    global ``.distinct()``: identical output rows (doc_id is part of the
    pair and input ids are unique) with ZERO shuffles instead of one.
    """
    ws = df.select(
        F.col(id_col).alias("doc_id"),
        F.expr(_words_sql(text_col)).alias("__ws"),
    )
    return ws.select(
        "doc_id", F.explode(F.array_distinct(F.col("__ws"))).alias("token")
    )


def _shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(doc_id, shingle) pairs — distinct n-word shingles as strings.

    Implementation: project the filtered token array once, then ONE
    generated-SQL higher-order expression builds + dedups the shingle
    array per document and explodes it. HOFs are CodegenFallback
    (interpreted), but each token array is touched once per doc — the
    measured 3-gram cost at sf0.1 is ~3× faster than a posexplode +
    window-``lead`` formulation and shuffle-FREE (the lead variant costs
    an exchange on doc_id plus a global distinct). The whole operator is
    a narrow map — at 100 TB it scales with input bytes, no skew risk.
    """
    if n == 1:
        return _tokens(df, id_col, text_col).withColumnRenamed("token", "shingle")
    parts = ", ".join(f"__ws[i + {j}]" if j else "__ws[i]" for j in range(n))
    shingle_arr = (
        f"array_distinct(transform("
        f"CASE WHEN size(__ws) >= {n} THEN sequence(0, size(__ws) - {n}) "
        f"ELSE cast(array() as array<int>) END, "
        f"i -> concat_ws(' ', {parts})))"
    )
    ws = df.select(
        F.col(id_col).alias("doc_id"),
        F.expr(_words_sql(text_col)).alias("__ws"),
    )
    return ws.select("doc_id", F.explode(F.expr(shingle_arr)).alias("shingle"))


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    normalize: bool = True,
) -> DataFrame:
    """Exact dedup: keep the smallest id per distinct (normalized) text.

    Returns ``(doc_id, n_dups)``. Grouping key is an md5 fingerprint of the
    (optionally whitespace/case-normalized) text, so the shuffle carries a
    32-byte key instead of the document body — the difference between
    shuffling 100 TB and shuffling ~3 GB of keys at scale.
    """
    text = F.col(text_col)
    if normalize:
        text = F.regexp_replace(F.lower(text), r"\s+", " ")
    fp = F.md5(text.cast("string")).alias("fp")
    return (
        df.select(F.col(id_col), fp)
        .groupBy("fp")
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("n_dups"),
        )
        .select(id_col, "n_dups")
    )


def exact_dedup_scoped(
    df: DataFrame,
    scope_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    normalize: bool = True,
) -> DataFrame:
    """Exact dedup WITHIN scopes: keep the smallest id per distinct
    (normalized) text per ``scope_col`` value — the per-crawl-snapshot
    / per-domain dedup real pipelines run when cross-scope duplicates
    are wanted (e.g. keep one copy of a page PER monthly snapshot so
    time-series analyses still see it, while collapsing within-snapshot
    mirrors).

    ``(scope, doc_id, n_dups)``. Same shape as :func:`exact_dedup` with
    the scope added to the grouping key: the shuffle carries
    (scope, 32-byte fingerprint), never the text; identical text in two
    scopes survives in both (pinned in tests).

    The normalizer spells out Java's \\s class explicitly (ADVICE r11:
    RE2/DuckDB read '\\s' without U+000B, so the oracle can only match
    a spelled-out class — identical Spark behavior, engine-portable
    contract).
    """
    text = F.col(text_col)
    if normalize:
        text = F.regexp_replace(F.lower(text), "[ \\t\\n\\x0B\\f\\r]+", " ")
    fp = F.md5(text.cast("string")).alias("fp")
    return (
        df.select(F.col(scope_col).alias("scope"), F.col(id_col), fp)
        .groupBy("scope", "fp")
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("n_dups"),
        )
        .select("scope", id_col, "n_dups")
    )


# ---------------------------------------------------------------------------
# exact n-gram Jaccard via inverted-index join
# ---------------------------------------------------------------------------


#: Default document-frequency cap for ``ngram_jaccard_pairs``: grams
#: appearing in more than this FRACTION of the corpus are pruned. The
#: inverted-index self-join shuffles Σ(posting-list²) rows per gram, so an
#: unbounded stop-gram ("the quick brown" boilerplate) is quadratic at
#: scale; a fractional cap is scale-free and both engines can derive the
#: same absolute cap from the corpus count.
DEFAULT_MAX_DF_FRAC = 0.2

#: Corpus-size ceiling for ``max_df=None`` (pruning disabled). Above this
#: the Σdf² posting self-join has no bound at all — one boilerplate gram
#: shared by every document is a full cross product — so the unpruned
#: mode is refused rather than silently launched. Exact-over-all-grams is
#: an oracle-replay/small-corpus tool, not a scale path.
MAX_UNPRUNED_DOCS = 1_000_000

#: Default per-(band, bucket) membership cap for the LSH band self-join
#: (``minhash_dedup_pairs``). A bucket of m REPRESENTATIVES costs m²
#: join rows on a single key; with exact duplicates pre-collapsed a
#: bucket this hot can only be pathological templated boilerplate, and
#: dropping it (deterministically, whole-bucket) is the same
#: scale/precision trade as the n-gram path's ``max_df`` stop-gram
#: prune. 5000² = 2.5e7 rows is the worst single-key join any bucket
#: can contribute. The DuckDB oracle applies the identical HAVING cap,
#: so both engines drop exactly the same buckets if one ever fills.
DEFAULT_MAX_BUCKET_SIZE = 5_000


def _exact_classes(
    df: DataFrame, id_col: str, text_col: str, fp_col: str | None = None
) -> tuple[DataFrame, DataFrame]:
    """Pre-collapse exact duplicates ahead of a near-dup detector.

    Returns ``(nrm, cls)``: ``nrm`` is the corpus with the exact-dedup
    fingerprint ``__nfp`` (md5 of case/whitespace-normalized text — the
    same key :func:`exact_dedup` groups on), and ``cls`` is one
    PERSISTED row per distinct normalized text: ``(__nfp, __rep,
    __rep_text, __m)`` with ``__rep`` = min member id.

    Why: identical texts collide in EVERY LSH band, so an m-member
    identical class makes the band self-join emit m² rows per band on
    one skewed key — 10¹³ rows for a million templated boilerplate
    pages, a dead job at 100 TB. Running the detector over class
    representatives bounds the join at one row per class, and class
    membership re-expands afterwards as m−1 star edges.

    The groupBy shuffles ``min_by(text, id)`` partials: map-side combine
    keeps ONE text per class per partition, so the hotter a duplicate
    class, the less it shuffles — the exact inverse of the band join's
    failure mode. For a mostly-unique corpus the volume matches the
    posting shuffle that follows anyway.

    ``fp_col`` names a column of ``df`` that ALREADY holds this
    fingerprint (the curation gate computes it scan-side for exact
    dedup) — passing it skips a second full-corpus lower/regex/md5 pass.
    """
    fp = (
        F.col(fp_col)
        if fp_col is not None
        else F.md5(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    )
    nrm = df.select(F.col(id_col), F.col(text_col), fp.alias("__nfp"))
    cls = tracked_persist(
        nrm.groupBy("__nfp").agg(
            F.min(id_col).alias("__rep"),
            F.min_by(text_col, F.col(id_col)).alias("__rep_text"),
            F.count(F.lit(1)).alias("__m"),
        )
    )
    return nrm, cls


def collapsed_posting_state(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    hasher: str = "md5",
    fp_col: str | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Build ONCE the ``(nrm, cls, posts)`` prefix every collapse-exact
    dedup scorer starts from: the normalized-fingerprint corpus, the
    persisted exact-duplicate classes (:func:`_exact_classes`), and the
    persisted per-representative postings ``(doc_id, h)`` — the
    ``shingle_n``-gram 60-bit hashes of one representative per distinct
    text.

    Why it exists (guide §5 / §1.2 "don't compute things twice"): a
    query that composes TWO scorers over the same corpus — e.g. the LSH
    recall audit, which runs the exact n-gram truth AND the MinHash-LSH
    sketch side by side — otherwise pays the full corpus scan → class
    collapse → shingle explode → digest pipeline once per scorer, and
    caches two identical posting tables. Passing this state via the
    scorers' ``shared_state`` parameter computes and caches the prefix
    once; each scorer's output is expression-identical to the unshared
    form (the state is exactly what the scorer would have built itself,
    with the same persist points), so results are unchanged.

    The consuming scorers must use the SAME ``shingle_n`` and ``hasher``
    and run with ``collapse_exact=True`` — enforced by the scorers'
    asserts where cheap; parameter agreement is the caller's contract.
    """
    nrm, cls = _exact_classes(df, id_col, text_col, fp_col=fp_col)
    work = cls.select(
        F.col("__rep").alias(id_col), F.col("__rep_text").alias(text_col)
    )
    posts = tracked_persist(
        _shingles(work, id_col, text_col, shingle_n)
        .select("doc_id", _hash60(F.col("shingle"), hasher).alias("h"))
    )
    return nrm, cls, posts


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 1,
    threshold: float = 0.5,
    max_df: int | float | None = DEFAULT_MAX_DF_FRAC,
    hasher: str = "md5",
    collapse_exact: bool = True,
    shared_state: tuple[DataFrame, DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """All document pairs with n-gram-set Jaccard ≥ threshold — exact
    over the (optionally stop-gram-pruned) gram sets.

    Inverted-index algorithm: explode distinct n-grams, self-join postings
    on the n-gram, count common grams per pair, compute
    ``|∩| / (|A| + |B| − |∩|)``. ``max_df`` prunes grams whose posting list
    exceeds the cap via a broadcast anti-join (the frequent-gram list is
    tiny by definition) — pairs sharing ONLY ultra-common grams can be
    missed, the standard scale/precision trade. A float ``max_df`` in
    (0, 1) is a corpus FRACTION (resolved via one cheap count job —
    ``ceil(frac · n_distinct_texts)`` — the scale-safe default); an int is
    an absolute cap; ``None`` disables pruning (exact over ALL grams, with
    Σdf² shuffle risk — small corpora / oracle replay only; refused with
    ``ValueError`` above ``MAX_UNPRUNED_DOCS`` documents, since one
    corpus-wide boilerplate gram would make the posting self-join a full
    cross product).

    ``collapse_exact`` (default, the 100 TB-safe mode — the same
    hardening as ``minhash_dedup_pairs``): the inverted index is built
    over one REPRESENTATIVE per distinct normalized text, and each
    m-member identical class re-expands as m−1 star edges ``(rep,
    member, sz, sz, sz, 1.0)`` with ``sz`` the rep's post-prune gram-set
    size — an identical-text class shares EVERY gram, so uncollapsed it
    costs m² posting-join rows per gram AND inflates every shared gram's
    document frequency by m (pruning grams real near-dup pairs needed).
    Document-frequency counts and the fractional cap resolve over
    DISTINCT texts (duplicate-robust IDF semantics). Same transitive
    closure as the exhaustive output; classes whose post-prune gram set
    is empty emit no edges, matching the no-shared-grams behavior.
    ``collapse_exact=False`` restores the exhaustive all-pairs form.

    ``shared_state`` optionally supplies a precomputed
    :func:`collapsed_posting_state` (requires ``collapse_exact=True``
    and matching ``n``/``hasher``) so a composing query shares the
    corpus → classes → postings prefix with a sibling scorer instead of
    rebuilding it.

    Jaccard is emitted as exact integer fields (inter, size_a, size_b) plus
    a derived double — division of exact longs, deterministic for oracles.
    """
    base = _ngram_pair_counts(
        df, id_col, text_col, n, max_df, hasher, collapse_exact,
        shared_state=shared_state,
    )
    union = F.col("size_a") + F.col("size_b") - F.col("inter")
    return (
        base.withColumn(
            "jaccard", F.col("inter").cast("double") / union.cast("double")
        )
        .filter(F.col("jaccard") >= F.lit(threshold))
        .select("doc_a", "doc_b", "inter", "size_a", "size_b", "jaccard")
    )


def ngram_containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.9,
    max_df: int | float | None = DEFAULT_MAX_DF_FRAC,
    hasher: str = "md5",
    collapse_exact: bool = True,
) -> DataFrame:
    """All document pairs whose smaller gram set is ≥ ``threshold``
    CONTAINED in the other: ``|A∩B| / min(|A|, |B|)`` — the asymmetric
    near-dup relation Jaccard misses when lengths differ.

    Why it exists: a document verbatim-embedded in a larger one
    (boilerplate wrapping, quote-and-expand reposts, concatenated
    pages — ubiquitous in web corpora) has Jaccard ≈ |A|/|B|, far below
    any sane Jaccard threshold, while its containment is ≈ 1. Gram-set
    containment is the standard scalable approximation of substring
    dedup for training-data curation.

    Same inverted-index machinery, shuffle shape, ``max_df`` stop-gram
    prune, and exact-duplicate pre-collapse as
    :func:`ngram_jaccard_pairs` (star edges score 1.0 here too); the
    score is one terminal division of exact longs.
    """
    base = _ngram_pair_counts(
        df, id_col, text_col, n, max_df, hasher, collapse_exact
    )
    smaller = F.least(F.col("size_a"), F.col("size_b"))
    return (
        base.withColumn(
            "containment",
            F.col("inter").cast("double") / smaller.cast("double"),
        )
        .filter(F.col("containment") >= F.lit(threshold))
        .select("doc_a", "doc_b", "inter", "size_a", "size_b", "containment")
    )


def _ngram_pair_counts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    max_df: int | float | None,
    hasher: str,
    collapse_exact: bool,
    shared_state: tuple[DataFrame, DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Shared inverted-index pair machinery for the exact n-gram scorers:
    ``(doc_a, doc_b, inter, size_a, size_b)`` for every pair sharing ≥ 1
    surviving gram — including the pre-collapse star rows, whose counts
    are the rep's post-prune set size, so ANY score of the form
    f(inter, size_a, size_b) evaluates to its identical-set value (1.0
    for jaccard and containment) without scorer-specific star handling."""
    nrm = cls = None
    work = df
    if shared_state is not None:
        if not collapse_exact:
            raise ValueError("shared_state requires collapse_exact=True")
        nrm, cls, posts = shared_state
        work = cls.select(
            F.col("__rep").alias(id_col), F.col("__rep_text").alias(text_col)
        )
    elif collapse_exact:
        nrm, cls = _exact_classes(df, id_col, text_col)
        work = cls.select(
            F.col("__rep").alias(id_col), F.col("__rep_text").alias(text_col)
        )
    if shared_state is None:
        grams = _shingles(work, id_col, text_col, n)
        # Postings carry the 60-bit hash, not the string (see _hash60): the
        # self-join and pair-count shuffles move 8-byte longs.
        # Persist the RAW postings before anything consumes them: the prune's
        # document-frequency aggregation plus the three downstream consumers
        # (sizes + both join sides) all read the cache, so the tokenize/explode
        # pipeline runs exactly once. MEMORY_AND_DISK: postings are
        # input-scale; spilling beats recomputing the explode. The per-consumer
        # broadcast anti-join re-applies from cache — a narrow hash probe,
        # far cheaper than caching a second (pruned) copy.
        posts = tracked_persist(
            grams.select("doc_id", _hash60(F.col("shingle"), hasher).alias("h"))
        )
    if isinstance(max_df, float):
        if not 0.0 < max_df < 1.0:
            raise ValueError("fractional max_df must be in (0, 1)")
        max_df = int(math.ceil(max_df * work.count()))
    elif max_df is None:
        n_docs = work.count()
        if n_docs > MAX_UNPRUNED_DOCS:
            raise ValueError(
                f"max_df=None (no stop-gram pruning) on {n_docs} documents: "
                f"the posting self-join is unbounded (Σdf² rows; a single "
                f"corpus-wide gram is a full cross product). Pass a "
                f"fractional max_df (default {DEFAULT_MAX_DF_FRAC}) or an "
                f"absolute cap; None is supported only below "
                f"{MAX_UNPRUNED_DOCS} documents (oracle replay)."
            )
    if max_df is not None:
        frequent = (
            posts.groupBy("h")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_df)
            .select("h")
        )
        posts = posts.join(F.broadcast(frequent), ["h"], "left_anti")

    sizes = posts.groupBy("doc_id").agg(F.count(F.lit(1)).alias("set_size"))

    a = posts.select(F.col("doc_id").alias("doc_a"), "h")
    b = posts.select(F.col("doc_id").alias("doc_b"), "h")
    inter = (
        a.join(b, ["h"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("set_size").alias("size_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("set_size").alias("size_b"))
    result = (
        inter.join(sa, ["doc_a"])
        .join(sb, ["doc_b"])
        .select("doc_a", "doc_b", "inter", "size_a", "size_b")
    )
    if cls is not None:
        # Star rows carry the rep's post-prune set size as inter and
        # both sizes (identical gram sets); the inner sizes join drops
        # classes whose gram set is empty after pruning — those docs
        # share no grams, so the exhaustive form emits no pair either.
        star = (
            nrm.select(F.col(id_col), "__nfp")
            .join(
                cls.filter(F.col("__m") > 1).select("__nfp", "__rep"),
                "__nfp",
            )
            .filter(F.col(id_col) != F.col("__rep"))
            .join(
                sizes.select(
                    F.col("doc_id").alias("__rep"),
                    F.col("set_size").alias("__sz"),
                ),
                "__rep",
            )
            .select(
                F.col("__rep").alias("doc_a"),
                F.col(id_col).alias("doc_b"),
                F.col("__sz").alias("inter"),
                F.col("__sz").alias("size_a"),
                F.col("__sz").alias("size_b"),
            )
        )
        result = result.unionByName(star)
    return result


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    shingle_n: int = 3,
    hasher: str = "xxhash64",
) -> DataFrame:
    """Per-doc MinHash signature: for each of K affine permutations
    ``g_i = (a_i·h + b_i) mod p`` of ONE base hash per shingle, the min
    over the doc's shingles.

    One explode + one grouped aggregation with K min() partials — a single
    exchange and a single digest per posting regardless of K; signature
    size is K longs per doc.
    """
    sh = _shingles(df, id_col, text_col, shingle_n)
    hashed = sh.select(
        "doc_id", _base_hash(F.col("shingle"), hasher).alias("h")
    )
    mins = [
        F.min(
            F.pmod(F.lit(a) * F.col("h") + F.lit(b), F.lit(_MERSENNE_31))
        ).alias(f"g{i}")
        for i, (a, b) in enumerate(minhash_perm_params(num_hashes))
    ]
    agg = hashed.groupBy("doc_id").agg(*mins)
    return agg.select(
        "doc_id",
        F.array(*[F.col(f"g{i}") for i in range(num_hashes)]).alias("sig"),
    )


def minhash_banding(
    signatures: DataFrame,
    bands: int = 16,
    rows: int = 4,
    hash_buckets: bool = True,
    validate: bool = True,
) -> DataFrame:
    """``(doc_id, band, bucket)`` — one row per (doc, band), the LSH
    banding of a ``(doc_id, sig)`` signature table. Shared by the
    in-corpus self-join (:func:`minhash_lsh_candidates`) and the
    persistent incremental index (``pipeline/neardup_index.py``), so
    both produce IDENTICAL buckets for identical signatures.

    ``validate`` guards bands×rows against the runtime signature length
    (a mismatch would otherwise read past the array: NULL slots that
    ``concat_ws`` silently skips, corrupting band buckets)."""
    # Fail fast on a banding mismatch. Array length isn't in the schema,
    # so guard inside the bucket expression: assert_true evaluates per row
    # before any band slice is read, turning silent corruption into an
    # immediate, explainable job failure.
    sig_guard = F.assert_true(
        F.size("sig") == bands * rows,
        F.concat(
            F.lit(f"minhash_banding: bands*rows = {bands * rows} "
                  f"!= signature length "),
            F.size("sig").cast("string"),
        ),
    )

    def band_bucket(b: int) -> Column:
        key = F.concat_ws(
            ",",
            *[
                F.element_at("sig", b * rows + r + 1).cast("string")
                for r in range(rows)
            ],
        )
        return F.xxhash64(key).cast("string") if hash_buckets else key

    # The guard must live inside an expression the plan keeps, or column
    # pruning would drop it — fold it into band 0's index (+0 when valid).
    guard_zero = (
        sig_guard.isNull().cast("int") * F.lit(0) if validate else F.lit(0)
    )
    return (
        signatures.select(
            "doc_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            (F.lit(b) + (guard_zero if b == 0 else F.lit(0))).alias(
                                "band"
                            ),
                            band_bucket(b).alias("bucket"),
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("bb"),
        )
        .select("doc_id", "bb.band", "bb.bucket")
    )


def minhash_lsh_candidates(
    signatures: DataFrame,
    bands: int = 16,
    rows: int = 4,
    hash_buckets: bool = True,
    validate: bool = True,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """LSH banding: docs whose signature agrees on ALL rows of at least one
    band become a candidate pair. bands×rows must equal signature length —
    validated against the ``sig`` array's element count (a mismatch would
    otherwise read past the array: NULL slots that ``concat_ws`` silently
    skips, corrupting band buckets).

    Per band: join on (band, bucket) where the bucket is the band slice —
    xxhash64-compressed to 8 bytes when ``hash_buckets`` (the cluster fast
    path), or the raw concat string when oracle-exact candidate sets are
    required (DuckDB has no xxhash64). Collisions (real candidates) are
    rare by construction, so the self-join output stays near-linear.

    ``validate=False`` skips the per-row signature-length guard — for
    callers that construct ``sig`` themselves with a statically known
    length (``minhash_dedup_pairs`` builds it as an ``array()`` of exactly
    ``num_hashes`` elements, so the check is provable at plan time and the
    runtime expression would be dead weight in the banding stage).

    ``max_bucket_size`` is the hot-bucket guard: buckets whose
    membership exceeds the cap are dropped WHOLE before the self-join —
    a window ``count`` over the same (band, bucket) partitioning the
    self-join shuffles on anyway, so the filter rides the join's own
    exchange instead of paying a separate aggregation pass (see the
    inline comment below) — bounding any single join key at cap² output
    rows. The drop is deterministic, so an oracle applying the same
    HAVING cap stays in lockstep; pairs living only in dropped buckets
    are missed, the same recall trade ``max_df`` makes for stop grams.
    ``None`` disables the guard (exhaustive small-corpus mode).
    """
    # NOT persisted, deliberately: the signature aggregation ends in an
    # exchange, and the bucket self-join's two sides are the identical
    # subtree — ReusedExchange computes it once at runtime; an explicit
    # cache measured ~15% slower at sf0.1 (materialization for no saved
    # recompute). Contrast the POSTINGS persist in the callers, which is
    # a narrow map with no exchange to reuse and measures 2× faster
    # cached.
    banded = minhash_banding(signatures, bands, rows, hash_buckets, validate)
    if max_bucket_size is not None:
        # Window count over the SAME (band, bucket) partitioning the
        # self-join needs anyway — the filter rides the join's own
        # exchange+sort instead of paying a separate aggregation pass
        # plus a broadcast anti-join (measured ~15% cheaper at sf0.1,
        # and one fewer traversal of the banding subtree at any scale).
        from pyspark.sql import Window

        w = Window.partitionBy("band", "bucket")
        banded = (
            banded.withColumn("__bs", F.count(F.lit(1)).over(w))
            .filter(F.col("__bs") <= max_bucket_size)
            .drop("__bs")
        )
    left = banded.select("band", "bucket", F.col("doc_id").alias("doc_a"))
    right = banded.select("band", "bucket", F.col("doc_id").alias("doc_b"))
    return (
        left.join(right, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    rows: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.7,
    hasher: str = "xxhash64",
    collapse_exact: bool = True,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
    fp_col: str | None = None,
    shared_state: tuple[DataFrame, DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """End-to-end MinHash-LSH near-dup detection: signatures → banded
    candidates → verify candidates with the exact n-gram Jaccard (computed
    only for the candidate set — the LSH is the scale filter, the verify
    step restores precision). Returns pairs with exact jaccard ≥ threshold
    that the LSH surfaced (recall < 1 by design; measured in tests).

    ``collapse_exact`` (default, the 100 TB-safe mode) pre-collapses
    exact duplicates before shingling (:func:`_exact_classes`): the
    signature/band/verify pipeline runs over one REPRESENTATIVE per
    distinct normalized text, and each m-member identical class
    re-expands as m−1 star edges ``(rep, member, jaccard=1.0)`` instead
    of all C(m,2) pairs — the band self-join stays linear in class size
    where it was quadratic. The pair GRAPH keeps the same transitive
    closure as the full pair set (every member connects to its rep, reps
    carry the cross-class near-dup edges), so connected components,
    canonicalization, and cluster sizes downstream are unchanged; only
    the explicit pair list is the sparser star form. Classes whose text
    has fewer than ``shingle_n`` words emit no edges, matching the
    empty-shingle-set behavior of the uncollapsed pipeline.
    ``collapse_exact=False`` restores the exhaustive all-pairs output
    (small corpora / property tests). ``max_bucket_size`` is the
    defense-in-depth hot-bucket cap (see :func:`minhash_lsh_candidates`).
    ``fp_col`` optionally names a precomputed normalized-text
    fingerprint column (see :func:`_exact_classes`).
    ``shared_state`` optionally supplies a precomputed
    :func:`collapsed_posting_state` (requires ``collapse_exact=True``
    and matching ``shingle_n``/``hasher``) so a composing query shares
    the corpus → classes → postings prefix with a sibling scorer.
    """
    if bands * rows != num_hashes:
        raise ValueError(
            f"bands*rows ({bands}*{rows}={bands * rows}) must equal "
            f"num_hashes ({num_hashes})"
        )
    if shared_state is not None and not collapse_exact:
        raise ValueError("shared_state requires collapse_exact=True")
    star: DataFrame | None = None
    work = df
    if collapse_exact:
        if shared_state is not None:
            nrm, cls, _ = shared_state
        else:
            nrm, cls = _exact_classes(df, id_col, text_col, fp_col=fp_col)
        work = cls.select(
            F.col("__rep").alias(id_col), F.col("__rep_text").alias(text_col)
        )
        multi = cls.filter(
            (F.col("__m") > 1)
            & (F.expr(f"size({_words_sql('__rep_text')})") >= shingle_n)
        ).select("__nfp", "__rep")
        star = (
            nrm.select(F.col(id_col), "__nfp")
            .join(multi, "__nfp")
            .filter(F.col(id_col) != F.col("__rep"))
            .select(
                F.col("__rep").alias("doc_a"),
                F.col(id_col).alias("doc_b"),
                F.lit(1.0).cast("double").alias("jaccard"),
            )
        )
    # One digest per posting: the 60-bit hash is BOTH the verify-join key
    # (8-byte shuffles instead of shingle strings) and, reduced mod p, the
    # MinHash base value the K affine permutations act on.
    if shared_state is not None:
        posts = shared_state[2]
    else:
        posts = tracked_persist(
            _shingles(work, id_col, text_col, shingle_n)
            .select("doc_id", _hash60(F.col("shingle"), hasher).alias("h"))
        )
    base = F.pmod(F.col("h"), F.lit(_MERSENNE_31))
    mins = [
        F.min(
            F.pmod(F.lit(a) * base + F.lit(b), F.lit(_MERSENNE_31))
        ).alias(f"g{i}")
        for i, (a, b) in enumerate(minhash_perm_params(num_hashes))
    ]
    # ONE grouped pass computes the K signature mins AND the gram-set
    # size: signatures and sizes group on the same key over the same
    # postings, and as separate aggregations they are two full posting
    # passes + two exchanges (different aggregate lists, so runtime
    # ReusedExchange cannot dedupe them — guide §1.2/§2.4). set_size
    # rides the signature aggregation as one extra count field; the
    # PERSIST is what makes the fusion stick — without it Catalyst's
    # per-consumer column pruning splits the aggregate back into a
    # 32-func copy (banding) and a count-only copy (sizes), restoring
    # both passes (verified in the r19 before/after plans).
    sig_sz = tracked_persist(
        posts.groupBy("doc_id").agg(
            *mins, F.count(F.lit(1)).alias("set_size")
        )
    )
    sigs = sig_sz.select(
        "doc_id",
        F.array(*[F.col(f"g{i}") for i in range(num_hashes)]).alias("sig"),
    )
    # validate=False: sigs' array() length == num_hashes by construction
    # and bands*rows == num_hashes was checked above — plan-time proof, no
    # per-row guard expression in the banding stage.
    cands = minhash_lsh_candidates(
        sigs,
        bands,
        rows,
        hash_buckets=hasher == "xxhash64",
        validate=False,
        max_bucket_size=max_bucket_size,
    )
    sizes = sig_sz.select("doc_id", "set_size")
    a = posts.select(F.col("doc_id").alias("doc_a"), "h")
    # NOTE (measured and rejected, r19): pre-pruning this side to
    # candidate docs with a broadcast semi-join (guide §3.2) — so the
    # (doc_b, h) join shuffles candidate-doc postings instead of the
    # full posting table — was A/B-probed at sf0.1 and was 15–45% SLOWER
    # in both the bare and cands-persisted forms: the duplicated/
    # materialized candidate subtree plus the per-row broadcast probe
    # cost more than the exchange it saves at this scale. On a cluster
    # where the posting exchange is network-bound and candidates ≪
    # corpus the trade reverses; re-measure there before adopting.
    b = posts.select(F.col("doc_id").alias("doc_b"), "h")
    # Intersection restricted to candidate pairs: attach A-side postings,
    # then inner-join the B side on (doc_b, h) — the join key carries both
    # the pair identity and the posting, one exchange, no cross blowup.
    inter = (
        cands.join(a, ["doc_a"])
        .join(b, ["doc_b", "h"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("set_size").alias("size_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("set_size").alias("size_b"))
    union = F.col("size_a") + F.col("size_b") - F.col("inter")
    verified = (
        inter.join(sa, ["doc_a"])
        .join(sb, ["doc_b"])
        .withColumn("jaccard", F.col("inter").cast("double") / union.cast("double"))
        .filter(F.col("jaccard") >= F.lit(threshold))
        .select("doc_a", "doc_b", "jaccard")
    )
    return verified if star is None else verified.unionByName(star)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 64,
    hasher: str = "xxhash64",
    shingle_n: int = 1,
) -> DataFrame:
    """SimHash per doc: bit b of the fingerprint is the sign of the vote
    Σ±1 over feature hashes' bit b. Features are tokens (``shingle_n=1``)
    or word n-grams — use n-grams when the corpus vocabulary is small,
    otherwise token-set fingerprints saturate and everything looks similar.

    Expressed as one grouped aggregation of ``bits`` conditional sums — all
    JVM-side, one exchange. With ``hasher='md5'`` only 60 bits are
    available (bits ≤ 60), and the result is DuckDB-reproducible."""
    if hasher == "md5" and bits > 60:
        raise ValueError("md5 hasher yields 60 usable bits")
    toks = _shingles(df, id_col, text_col, shingle_n).withColumn(
        "h", _hash64(F.col("shingle"), 0, hasher)
    )

    def bit_mask(b: int) -> int:
        # bit 63 is the sign bit: representable only as its two's-complement
        # negative value in a Java long.
        m = 1 << b
        return m - (1 << 64) if m >= (1 << 63) else m

    # Votes: Σ±1 > 0 over bit b ⇔ 2·(count of ones at bit b) > n, with the
    # per-bit one-counts PACKED four to a long in 16-bit lanes — 4× fewer
    # aggregation buffer fields than one sum per bit, which both shrinks
    # the per-group shuffle state and keeps the generated HashAggregate
    # small enough to compile fast (the 61-field variant costs ~2 s of
    # janino time per fresh plan). Integer arithmetic is exact, so the
    # DuckDB oracle reproduces the counts without mirroring the packing.
    # Lane width 16 bounds per-doc feature counts at 65535 — enforced
    # below with assert_true rather than silently corrupting lanes.
    groups = (bits + 3) // 4
    packed = [
        F.expr(
            "sum("
            + " + ".join(
                f"((shiftright(h, {4 * g + j}) & 1) * {1 << (16 * j)})"
                for j in range(4)
                if 4 * g + j < bits
            )
            + ")"
        ).alias(f"s{g}")
        for g in range(groups)
    ]
    agg = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"), *packed)
    fp_terms = " + ".join(
        f"(CASE WHEN 2 * ((s{b // 4} >> {16 * (b % 4)}) & 65535) > n "
        f"THEN {bit_mask(b)} ELSE 0 END)"
        for b in range(bits)
    )
    return agg.select(
        "doc_id",
        F.expr(
            f"CAST(assert_true(n < 65536, 'simhash: doc exceeds 65535 "
            f"features (16-bit vote lanes)') IS NULL AS BIGINT) * 0 "
            f"+ CAST({fp_terms} AS BIGINT)"
        ).alias("simhash"),
    )


def simhash_neardup_pairs(
    fingerprints: DataFrame,
    max_hamming: int = 3,
    chunks: int = 4,
    bits: int = 64,
    collapse_identical: bool = True,
    max_chunk_df: int | None = None,
) -> DataFrame:
    """Pairs with hamming(simhash_a, simhash_b) ≤ max_hamming.

    Pigeonhole join: with ``chunks`` equal-width chunks and max_hamming <
    chunks, any qualifying pair agrees exactly on ≥1 chunk — join on
    (chunk_index, chunk_value), verify with bit_count(xor). The chunk join
    keeps the self-join near-linear instead of O(n²).

    ``collapse_identical`` (default, the 100 TB-safe mode) groups docs by
    EQUAL fingerprint first: the chunk join runs over one representative
    per distinct fingerprint, and an m-member identical-fingerprint class
    (exact duplicates, or texts SimHash can't tell apart) re-expands as
    m−1 star edges ``(rep, member, hamming=0)`` instead of all C(m,2)
    pairs — the chunk join, where identical docs share every one of the
    k+1 chunks, stays linear in class size. Same transitive closure as
    the full pair set; ``False`` restores the exhaustive all-pairs output.
    ``max_chunk_df`` optionally drops (chunk, value) buckets hotter than
    the cap (deterministic whole-bucket drop, here via a broadcast
    anti-join on the — by definition tiny — oversized-bucket list) —
    defense in depth against templated near-identical boilerplate, the
    same recall trade as ``minhash_lsh_candidates(max_bucket_size=...)``
    (which implements its drop as a window-count filter riding the band
    self-join's own exchange)."""
    if max_hamming >= chunks:
        raise ValueError("pigeonhole requires max_hamming < chunks")
    width = bits // chunks
    mask = (1 << width) - 1
    # One row per doc — cache so the self-join doesn't recompute the whole
    # vote aggregation for each side.
    fingerprints = tracked_persist(fingerprints)
    star: DataFrame | None = None
    if collapse_identical:
        cls = tracked_persist(
            fingerprints.groupBy("simhash").agg(
                F.min("doc_id").alias("__rep"),
                F.count(F.lit(1)).alias("__m"),
            )
        )
        star = (
            fingerprints.join(
                cls.filter(F.col("__m") > 1).select("simhash", "__rep"),
                "simhash",
            )
            .filter(F.col("doc_id") != F.col("__rep"))
            .select(
                F.col("__rep").alias("doc_a"),
                F.col("doc_id").alias("doc_b"),
                F.lit(0).cast("integer").alias("hamming"),
            )
        )
        fingerprints = cls.select(F.col("__rep").alias("doc_id"), "simhash")
    chunked = fingerprints.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("c"),
                        F.shiftright("simhash", c * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("v"),
                    )
                    for c in range(chunks)
                ]
            )
        ).alias("ch"),
    ).select("doc_id", "simhash", "ch.c", "ch.v")
    if max_chunk_df is not None:
        hot = (
            chunked.groupBy("c", "v")
            .agg(F.count(F.lit(1)).alias("__cs"))
            .filter(F.col("__cs") > max_chunk_df)
            .select("c", "v")
        )
        chunked = chunked.join(F.broadcast(hot), ["c", "v"], "left_anti")
    left = chunked.select(
        "c", "v", F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a")
    )
    right = chunked.select(
        "c", "v", F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b")
    )
    verified = (
        left.join(right, ["c", "v"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sh_a", "sh_b")
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
    return verified if star is None else verified.unionByName(star)
