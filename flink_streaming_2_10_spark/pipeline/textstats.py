"""Text analysis for training-data pipelines (north-star extensions):
language-ID, quality scoring, token counting, document fingerprinting.

Everything here is pure built-in column expressions — no Python in the hot
path, full whole-stage codegen, trivially scan-parallel at 100 TB (no
shuffle at all: these are narrow per-row transforms; any aggregation is
the caller's choice). Every function is exactly reproducible in DuckDB
SQL, and the arithmetic is ordered so float results are bit-identical.

Heuristics are deliberately simple and deterministic (stopword hit counts,
CJK codepoint counts, ratio features): the contract is a fast first-pass
filter/labeler of the kind used ahead of model-based classifiers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: Tiny per-language stopword lists (top function words). Order of the
#: language arbitration is fixed: zh (CJK chars), then en/de/es/fr by
#: score with that priority on ties.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "that", "it", "you"],
    "de": ["der", "die", "und", "das", "nicht", "ist", "ich", "ein", "zu", "mit"],
    "es": ["el", "que", "de", "los", "se", "un", "una", "es", "por", "con"],
    "fr": ["le", "la", "et", "les", "des", "est", "une", "que", "je", "pas"],
}
LANG_ORDER = ["en", "de", "es", "fr"]

#: BPE-ish pre-tokenizer: letter runs | single digits | punctuation runs.
#: Same leftmost-first semantics in Java regex and RE2, so counts agree.
#: Whitespace is the EXPLICIT Java \s class ([ \t\n\x0B\f\r]) rather
#: than bare \s: these patterns are shared verbatim by the Spark (Java
#: regex) side and the DuckDB (RE2) oracles, and RE2's \s lacks U+000B
#: — the explicit class makes both engines agree on any corpus
#: (ADVICE r11 convention, r13 rollout).
BPE_PATTERN = r"[a-zA-Z]+|[0-9]|[^a-zA-Z0-9 \t\n\x0B\f\r]+"
PUNCT_PATTERN = r"[^a-zA-Z0-9 \t\n\x0B\f\r]"
DIGIT_PATTERN = r"[0-9]"
CJK_PATTERN_SPARK = "[一-鿿]"
CJK_PATTERN_DUCKDB = r"[\x{4e00}-\x{9fff}]"

FINGERPRINT_MOD = 1 << 53  # fits (mod * 31 + char) in a signed 64-bit long


#: Counting formulations (all compiled-regex ``regexp_count`` — no
#: array HOFs, which Spark evaluates interpreted per element): a "word"
#: is a maximal ``\w+`` run of the LOWERCASED text, identical to
#: splitting on ``\W+`` and dropping empties; a stopword hit is such a
#: run equal to a list entry, which ``\b(?:w1|w2|…)\b`` matches exactly
#: (the boundary guards force whole-run matches, so leftmost-first and
#: leftmost-longest alternation semantics agree — Java and RE2 count the
#: same). Word-LENGTH mass is just the count of ``\w`` chars.
WORD_RUN_PATTERN = r"\w+"
WORD_CHAR_PATTERN = r"\w"
NONSPACE_RUN_PATTERN = r"\S+"


def _stop_pattern(stops: list[str]) -> str:
    return r"\b(?:" + "|".join(stops) + r")\b"


def _stop_hits(lowered: Column, stops: list[str]) -> Column:
    return F.regexp_count(lowered, F.lit(_stop_pattern(stops)))


def token_counts(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc token accounting: whitespace tokens, BPE-ish pre-tokens,
    characters. All regexp_count/length expressions — scan-local."""
    text = F.col(text_col)
    ws = F.regexp_count(text, F.lit(NONSPACE_RUN_PATTERN))
    return df.select(
        F.col(id_col),
        ws.alias("ws_tokens"),
        F.regexp_count(text, F.lit(BPE_PATTERN)).alias("bpe_tokens"),
        F.length(text).alias("n_chars"),
    )


def tokenizer_fertility(
    df: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Tokenizer fertility per group: ``(lang, n_docs, ws_tokens,
    bpe_tokens, fertility)`` with fertility = BPE-ish pre-tokens per
    whitespace word — the standard multilingual-tokenizer health metric
    (a tokenizer that fragments one language into 3× the pieces of
    another starves it of effective context). Exact-long sums in ONE
    scan + one small keyed aggregation; the ratio is a single terminal
    division, so the double is oracle-exact.
    """
    text = F.col(text_col)
    per_doc = df.select(
        F.col(group_col).alias("lang"),
        F.regexp_count(text, F.lit(NONSPACE_RUN_PATTERN))
        .cast("long")
        .alias("__ws"),
        F.regexp_count(text, F.lit(BPE_PATTERN))
        .cast("long")
        .alias("__bpe"),
    )
    agg = per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__ws").alias("ws_tokens"),
        F.sum("__bpe").alias("bpe_tokens"),
    )
    return agg.select(
        "lang",
        "n_docs",
        "ws_tokens",
        "bpe_tokens",
        F.when(
            F.col("ws_tokens") > 0,
            F.col("bpe_tokens").cast("double")
            / F.col("ws_tokens").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("fertility"),
    )


def quality_exprs(text: Column) -> dict[str, Column]:
    """The quality feature columns as reusable expressions (single source
    of truth for quality_scores and composed pipelines — the fixed
    evaluation order is what keeps the doubles oracle-matchable)."""
    lowered = F.lower(text)
    n_words = F.regexp_count(lowered, F.lit(WORD_RUN_PATTERN))
    n_chars = F.length(text)
    stop_hits = _stop_hits(lowered, STOPWORDS["en"])
    punct = F.regexp_count(text, F.lit(PUNCT_PATTERN))
    digits = F.regexp_count(text, F.lit(DIGIT_PATTERN))
    safe_words = F.greatest(n_words, F.lit(1))
    safe_chars = F.greatest(n_chars, F.lit(1))
    stop_ratio = stop_hits.cast("double") / safe_words.cast("double")
    punct_ratio = punct.cast("double") / safe_chars.cast("double")
    digit_ratio = digits.cast("double") / safe_chars.cast("double")
    mean_word_len = (
        F.regexp_count(lowered, F.lit(WORD_CHAR_PATTERN))
        .cast("long")
        .cast("double")
        / safe_words.cast("double")
    )
    len_factor = F.least(n_words.cast("double") / F.lit(50.0), F.lit(1.0))
    quality = (
        stop_ratio * F.lit(0.3)
        + (F.lit(1.0) - punct_ratio) * F.lit(0.3)
        + (F.lit(1.0) - digit_ratio) * F.lit(0.1)
        + len_factor * F.lit(0.3)
    )
    return {
        "n_words": n_words,
        "stop_ratio": stop_ratio,
        "punct_ratio": punct_ratio,
        "digit_ratio": digit_ratio,
        "mean_word_len": mean_word_len,
        "quality": quality,
    }


def quality_scores(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Heuristic document quality: stopword ratio, punctuation ratio,
    length factor — composited into ``quality`` ∈ [0, 1].

    Ratios are exact-integer divisions evaluated in a fixed order, so the
    double is deterministic and oracle-matchable.
    """
    q = quality_exprs(F.col(text_col))
    return df.select(
        F.col(id_col), *[expr.alias(name) for name, expr in q.items()]
    )


def language_pred_expr(text: Column) -> Column:
    """The language-ID prediction as a reusable expression: CJK codepoint
    count decides zh; otherwise argmax of per-language stopword hit counts
    (token-level, repeats counted), ties broken in LANG_ORDER; all-zero →
    'unknown'."""
    lowered = F.lower(text)
    scores = {
        lang: _stop_hits(lowered, stops) for lang, stops in STOPWORDS.items()
    }
    cjk = F.regexp_count(text, F.lit(CJK_PATTERN_SPARK))
    best = F.greatest(*[scores[lang] for lang in LANG_ORDER])
    return F.when(cjk > 0, F.lit("zh")).otherwise(
        F.when(best == 0, F.lit("unknown")).otherwise(
            F.coalesce(
                *[
                    F.when(scores[lang] == best, F.lit(lang))
                    for lang in LANG_ORDER
                ]
            )
        )
    )


def language_id(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """N-gram-free heuristic language ID over a documents table — see
    :func:`language_pred_expr` for the arbitration rules."""
    return df.select(
        F.col(id_col), language_pred_expr(F.col(text_col)).alias("lang_pred")
    )


#: Unicode-script buckets as (name, spark_pattern, duckdb_pattern) —
#: Spark side uses literal range endpoints (the CJK_PATTERN convention
#: above: dodges double-escaping through the SQL parser), DuckDB side
#: the equivalent RE2 ``\x{...}`` class. Whitespace is an EXPLICIT class
#: because Java's ``\s`` includes U+000B while RE2's does not.
SCRIPT_BUCKETS: list[tuple[str, str, str]] = [
    ("latin", "[A-Za-z]", "[A-Za-z]"),
    ("digit", "[0-9]", "[0-9]"),
    ("cyrillic", "[Ѐ-ӿ]", r"[\x{0400}-\x{04ff}]"),
    ("cjk", CJK_PATTERN_SPARK, CJK_PATTERN_DUCKDB),
    ("arabic", "[؀-ۿ]", r"[\x{0600}-\x{06ff}]"),
    ("space", "[ \\t\\n\\r\\f]", r"[ \t\n\r\f]"),
]


def script_mix(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document Unicode-script composition: ``(doc_id, n_chars,
    n_latin, n_digit, n_cyrillic, n_cjk, n_arabic, n_space, n_other)``
    — codepoint counts per script bucket, ``n_other`` the remainder.

    The script dimension ``language_id`` lacks: a corpus-curation gate
    needs "how much of this doc is CJK/Cyrillic/Arabic vs Latin" to
    route docs to per-script tokenizers and to catch mixed-script spam
    (e.g. Cyrillic homoglyph stuffing inside Latin text), independent of
    the stopword heuristic. All counts are exact integers from anchored
    codepoint classes (``SCRIPT_BUCKETS`` — identical semantics in Java
    regex and RE2, whitespace spelled explicitly), so the output is
    oracle-exact. Zero shuffle: one scan-local projection per doc,
    whole-stage-codegen column expressions only.
    """
    cnt = {
        name: F.regexp_count(F.col(text_col), F.lit(pat)).cast("long")
        for name, pat, _ in SCRIPT_BUCKETS
    }
    n_chars = F.length(text_col).cast("long")
    covered = None
    for name, _, _ in SCRIPT_BUCKETS:
        covered = cnt[name] if covered is None else covered + cnt[name]
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        *[cnt[name].alias(f"n_{name}") for name, _, _ in SCRIPT_BUCKETS],
        (n_chars - covered).alias("n_other"),
    )


def doc_fingerprints(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Rolling polynomial hash over the document's characters:
    ``h ← (h·31 + codepoint) mod 2^53`` — a deterministic content
    fingerprint (Karp-Rabin family) computed as one array fold, exactly
    reproducible in DuckDB (list_reduce folds left like Spark aggregate
    once the zero-init step collapses to the first element)."""
    text = F.col(text_col)
    codes = F.transform(F.split(text, ""), lambda c: F.ascii(c))
    fold = F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * F.lit(31) + x.cast("long")) % F.lit(FINGERPRINT_MOD),
    )
    fp = F.when(F.length(text) == 0, F.lit(0).cast("long")).otherwise(fold)
    return df.select(F.col(id_col), fp.alias("fingerprint"))


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021, table A1):
    per-document duplicate-word fraction, duplicate-trigram fraction, and
    the character share of the most frequent word bigram.

    ``(doc_id, n_words, dup_word_frac, dup_trigram_frac, top_bigram,
    top_bigram_frac)``. High values mark boilerplate/keyword-stuffed
    documents a quality gate should drop.

    Scale shape: the duplicate fractions are NARROW per-row array
    expressions (token array projected once; total n-gram counts are
    arithmetic on ``n_words``, only the distinct counts touch an array).
    The bigram mode needs per-(doc, gram) counts — one explode + two hash
    aggregations keyed by doc_id with map-side partials, then a join back
    that co-partitions with the agg. Fractions divide exact longs, so the
    doubles are bit-identical in DuckDB. Tie-break for the top bigram is
    total-ordered (max count, then max gram lexicographically — Spark
    struct max == DuckDB ORDER BY cnt DESC, gram DESC), so the output is
    deterministic under any row order.
    """
    from flink_streaming_2_10_spark.pipeline.dedup import _words_sql

    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.length(F.col(text_col)).alias("text_len"),
        F.expr(_words_sql(text_col)).alias("__ws"),
    )
    tri = (
        "CASE WHEN size(__ws) >= 3 THEN transform(sequence(0, size(__ws) - 3), "
        "i -> concat_ws(' ', __ws[i], __ws[i+1], __ws[i+2])) "
        "ELSE cast(array() as array<string>) END"
    )
    narrow = base.select(
        "doc_id",
        "text_len",
        F.size("__ws").cast("long").alias("n_words"),
        F.size(F.array_distinct("__ws")).cast("long").alias("n_distinct_words"),
        F.greatest(F.size("__ws") - 2, F.lit(0)).cast("long").alias("n_trigrams"),
        F.expr(f"size(array_distinct({tri}))")
        .cast("long")
        .alias("n_distinct_trigrams"),
    )
    big = (
        "CASE WHEN size(__ws) >= 2 THEN transform(sequence(0, size(__ws) - 2), "
        "i -> concat_ws(' ', __ws[i], __ws[i+1])) "
        "ELSE cast(array() as array<string>) END"
    )
    top = (
        base.select("doc_id", F.explode(F.expr(big)).alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc_id")
        .agg(F.max(F.struct(F.col("cnt"), F.col("gram"))).alias("top"))
    )

    def _frac(num: Column, den: Column) -> Column:
        return (
            F.when(den > 0, num.cast("double") / den.cast("double"))
            .otherwise(F.lit(0.0))
        )

    return narrow.join(top, "doc_id", "left").select(
        "doc_id",
        "n_words",
        _frac(
            F.col("n_words") - F.col("n_distinct_words"), F.col("n_words")
        ).alias("dup_word_frac"),
        _frac(
            F.col("n_trigrams") - F.col("n_distinct_trigrams"),
            F.col("n_trigrams"),
        ).alias("dup_trigram_frac"),
        F.col("top.gram").alias("top_bigram"),
        F.when(F.col("top").isNull() | (F.col("text_len") == 0), F.lit(0.0))
        .otherwise(
            (F.col("top.cnt") * F.length(F.col("top.gram"))).cast("double")
            / F.col("text_len").cast("double")
        )
        .alias("top_bigram_frac"),
    )


def line_repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style LINE and PARAGRAPH repetition filters (Rae et al.
    2021, table A1 rows "duplicate line fraction" / "duplicate
    paragraph fraction" and their character-weighted variants) —
    the segment-granular complement of :func:`repetition_stats`
    (which covers words/trigrams/top-bigram).

    ``(doc_id, n_chars, n_lines, dup_line_frac, dup_line_char_frac,
    n_paras, dup_para_frac, dup_para_char_frac)``. Lines are trimmed
    non-empty pieces of ``split(text, '\\n')``; paragraphs of
    ``split(text, '\\n{2,}')``. The duplicate fraction is
    (n − n_distinct)/n — the share of occurrences beyond each value's
    first; the char-weighted variant replaces counts with summed
    segment lengths, so one giant duplicated paragraph weighs more
    than ten tiny ones (the Gopher rationale).

    100 TB shape: ENTIRELY scan-local — split/trim/filter/
    array_distinct plus two exact-long array folds per granularity;
    zero shuffles, zero Python. Counts and char sums are exact longs,
    each fraction one terminal double division, so the DuckDB oracle
    hash-matches bit-for-bit. Corpus-WIDE repeated segments are the
    other face — ``pipeline.segdedup`` — this one is the per-document
    quality gate.
    """
    from flink_streaming_2_10_spark.pipeline.segdedup import _segs_sql

    def _sum_chars(arr_sql: str) -> str:
        return (
            f"aggregate({arr_sql}, 0L, (acc, s) -> acc + length(s))"
        )

    def _granularity(name: str, delim: str) -> list:
        segs = _segs_sql(text_col, delim, 1)
        dist = f"array_distinct({segs})"
        n = F.expr(f"size({segs})").cast("long")
        nd = F.expr(f"size({dist})").cast("long")
        ch = F.expr(_sum_chars(segs))
        chd = F.expr(_sum_chars(dist))
        return [
            n.alias(f"n_{name}s"),
            F.when(n > 0, (n - nd).cast("double") / n.cast("double"))
            .otherwise(F.lit(0.0))
            .alias(f"dup_{name}_frac"),
            F.when(ch > 0, (ch - chd).cast("double") / ch.cast("double"))
            .otherwise(F.lit(0.0))
            .alias(f"dup_{name}_char_frac"),
        ]

    return df.select(
        F.col(id_col).alias("doc_id"),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
        *_granularity("line", "\n"),
        *_granularity("para", "\\n{2,}"),
    )


def novelty_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    hasher: str = "xxhash64",
) -> DataFrame:
    """Per-document n-gram novelty: ``(doc_id, n_distinct_grams,
    n_novel, novel_frac)`` where ``novel_frac`` is the fraction of the
    document's DISTINCT n-grams that appear in no other document — the
    originality signal dual to the dedup family (a verbatim copy scores
    0.0 because every gram it has, its twin has; template-stamped docs
    score low; fresh prose scores near 1.0). The inverse view of
    document frequency that FineWeb-style curation uses to rank
    "contentful" documents.

    100 TB shape: doc-distinct shingles come from the shared narrow
    shingle builder (dedup._shingles — no shuffle); document frequency
    is ONE hash aggregation over the 8-byte gram hash with map-side
    partials (rows are doc-distinct already, so count == doc
    frequency); the join back is 1:1 per posting against the one-row-
    per-hash count side (a stopword gram is AQE skew, never fan-out);
    the per-doc rollup re-keys ids+flags only. Text never shuffles.
    ``novel_frac`` is one exact-long division. ``hasher="md5"`` makes
    the DuckDB oracle bit-exact (collisions merge identically).
    """
    from flink_streaming_2_10_spark.pipeline.caching import (
        tracked_persist,
    )
    from flink_streaming_2_10_spark.pipeline.dedup import (
        _hash60,
        _shingles,
    )

    posts = tracked_persist(
        _shingles(df, id_col, text_col, n).select(
            "doc_id", _hash60(F.col("shingle"), hasher).alias("h")
        )
    )
    dfreq = posts.groupBy("h").agg(F.count(F.lit(1)).alias("__nd"))
    per_doc = (
        posts.join(dfreq, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_distinct_grams"),
            F.sum(
                F.when(F.col("__nd") == 1, F.lit(1)).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("n_novel"),
        )
    )
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_distinct_grams"), F.lit(0).cast("long"))
            .alias("n_distinct_grams"),
            F.coalesce(F.col("n_novel"), F.lit(0).cast("long")).alias(
                "n_novel"
            ),
            F.when(
                F.col("n_distinct_grams") > 0,
                F.col("n_novel").cast("double")
                / F.col("n_distinct_grams").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("novel_frac"),
        )
    )


def top_ngrams(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 50,
) -> DataFrame:
    """Corpus-wide n-gram heavy hitters: the ``k`` word n-grams present
    in the most documents — ``(ngram, doc_freq)``, document frequency
    (per-doc distinct via the shared shingle builder), total-ordered by
    (doc_freq DESC, ngram ASC) so the cut at ``k`` is deterministic.

    100 TB shape: shingling is a narrow map (dedup._shingles — no
    shuffle); the frequency count is one hash aggregation with map-side
    partials keyed on the gram string; the final top-k plans as
    TakeOrderedAndProject — every partition forwards at most ``k`` rows,
    no global sort. The classic exact-heavy-hitter plan; sketch-based
    alternatives (pipeline.sketches) only become necessary when ``k`` or
    the gram cardinality explodes.
    """
    from flink_streaming_2_10_spark.pipeline.dedup import _shingles

    return (
        _shingles(df, id_col, text_col, n)
        .groupBy(F.col("shingle").alias("ngram"))
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .orderBy(F.col("doc_freq").desc(), F.col("ngram").asc())
        .limit(k)
    )


def length_histogram(
    df: DataFrame, text_col: str = "text", lang_col: str = "lang"
) -> DataFrame:
    """Token-count distribution per language in decimal-magnitude
    buckets: ``magnitude`` = digit count of the BPE-ish token count
    (0 → empty doc, 1 → 1-9 tokens, 2 → 10-99, …), with per-bucket doc
    count and token-mass min/max/total. Zero-token documents get their
    OWN bucket (digit count of '0' is 1, which would otherwise hide
    empties inside the shortest bucket).

    Bucket edges are INTEGER-exact (string digit count) rather than
    ``floor(log10/log2)`` — float logs can land boundary values on
    different sides across engines, which would silently shift histogram
    mass. Scan shape: one narrow projection, one tiny hash aggregation
    (≤ languages × ~7 buckets of state), map-side partials — the whole
    corpus reduces to a handful of rows with zero wide shuffles.
    """
    tokens = F.regexp_count(F.col(text_col), F.lit(BPE_PATTERN)).cast("long")
    t = df.select(F.col(lang_col).alias("lang"), tokens.alias("tokens"))
    magnitude = (
        F.when(F.col("tokens") == 0, F.lit(0))
        .otherwise(F.length(F.col("tokens").cast("string")))
        .cast("int")
    )
    return t.groupBy("lang", magnitude.alias("magnitude")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("tokens").alias("total_tokens"),
        F.min("tokens").alias("min_tokens"),
        F.max("tokens").alias("max_tokens"),
    )


def token_percentiles(
    df: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    ps: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Exact per-language token-count percentiles (``percentile_cont``
    linear-interpolation semantics) computed the 100 TB way: via the
    VALUE HISTOGRAM, never a per-group value buffer.

    Spark's built-in ``percentile_cont`` materializes every group value
    in the aggregation buffer — a non-starter when one language holds
    billions of documents. Token counts have small integer cardinality,
    so the distribution compresses losslessly to (lang, tokens, count):
    one hash agg over the corpus, a cumulative sum across each language's
    DISTINCT values (window state = distinct token counts, not rows),
    then each percentile is picked with two rank probes and one
    interpolation. The arithmetic mirrors percentile_cont exactly
    (``(1-frac)·lo + frac·hi`` with ``frac = p·(n-1) - floor(p·(n-1))``)
    — asserted against the built-in in tests.
    """
    from pyspark.sql import Window

    tokens = F.regexp_count(F.col(text_col), F.lit(BPE_PATTERN)).cast("long")
    t = df.select(F.col(lang_col).alias("lang"), tokens.alias("tokens"))
    hist = t.groupBy("lang", "tokens").agg(F.count(F.lit(1)).alias("cnt"))
    wcum = (
        Window.partitionBy("lang")
        .orderBy("tokens")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.select(
        "lang",
        "tokens",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(Window.partitionBy("lang")).alias("n"),
    )
    aggs = [F.max("n").alias("n_docs")]
    for i, p in enumerate(ps):
        h = F.lit(float(p)) * (F.col("n").cast("double") - F.lit(1.0))
        lo_rank = F.floor(h)
        hi_rank = F.least(lo_rank + F.lit(1), F.col("n") - F.lit(1))
        aggs.append(
            F.min(F.when(F.col("cum") > lo_rank, F.col("tokens"))).alias(f"__lo{i}")
        )
        aggs.append(
            F.min(F.when(F.col("cum") > hi_rank, F.col("tokens"))).alias(f"__hi{i}")
        )
    g = cum.groupBy("lang").agg(*aggs)
    out = [F.col("lang"), F.col("n_docs")]
    for i, p in enumerate(ps):
        h = F.lit(float(p)) * (F.col("n_docs").cast("double") - F.lit(1.0))
        frac = h - F.floor(h)
        val = (F.lit(1.0) - frac) * F.col(f"__lo{i}").cast("double") + frac * F.col(
            f"__hi{i}"
        ).cast("double")
        out.append(val.alias(f"p{round(p * 100)}"))
    return g.select(*out)


def collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    k: int = 50,
) -> DataFrame:
    """Top-``k`` bigram collocations by PMI lift: ``(p(ab) / (p(a)·p(b))``
    over corpus TERM frequencies — the classic collocation score, ranked
    without the log (monotone transform; the RAW ratio stays a
    deterministic chain of exact-long divisions, whereas ``ln`` differs
    in the last ulp across math libraries and would break cross-engine
    hashing). Bigrams below ``min_count`` occurrences are noise-pruned.

    Scale shape: bigram/unigram counting is explode → hash agg with
    map-side partials (shuffle carries word strings only); the two
    marginal joins key on single words against the vocabulary-sized
    unigram table; totals attach via broadcast; the final cut is
    TakeOrderedAndProject on (lift DESC, w1, w2) — no global sort.
    The count tables are NOT persisted, deliberately: although the
    static plan shows each feeding two consumers (its total and the
    scoring join — five corpus scans on paper), Spark's ReusedExchange
    dedupes the identical agg subtrees at runtime, and an explicit cache
    measured ~1.7× SLOWER at sf0.1 (materialization cost, no recompute
    saved).
    """
    from flink_streaming_2_10_spark.pipeline.dedup import _words_sql

    ws = df.select(F.expr(_words_sql(text_col)).alias("__ws"))
    big = (
        "CASE WHEN size(__ws) >= 2 THEN transform(sequence(0, size(__ws) - 2), "
        "i -> struct(__ws[i] AS w1, __ws[i+1] AS w2)) "
        "ELSE cast(array() as array<struct<w1:string,w2:string>>) END"
    )
    bi = ws.select(F.explode(F.expr(big)).alias("b")).select("b.w1", "b.w2")
    uni = ws.select(F.explode("__ws").alias("w"))
    cb = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_ab"))
    cu = uni.groupBy("w").agg(F.count(F.lit(1)).alias("c_w"))
    totals = F.broadcast(
        cb.agg(F.sum("c_ab").alias("n_bi")).crossJoin(
            cu.agg(F.sum("c_w").alias("n_uni"))
        )
    )
    lift = (
        F.col("c_ab").cast("double") / F.col("n_bi").cast("double")
    ) / (
        (F.col("c_a").cast("double") / F.col("n_uni").cast("double"))
        * (F.col("c_b").cast("double") / F.col("n_uni").cast("double"))
    )
    return (
        cb.filter(F.col("c_ab") >= F.lit(int(min_count)))
        .join(cu.select(F.col("w").alias("w1"), F.col("c_w").alias("c_a")), "w1")
        .join(cu.select(F.col("w").alias("w2"), F.col("c_w").alias("c_b")), "w2")
        .crossJoin(totals)
        .select("w1", "w2", "c_ab", lift.alias("lift"))
        .orderBy(F.col("lift").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(k)
    )


def textrank_keywords(
    df: DataFrame,
    text_col: str = "text",
    iters: int = 5,
    k: int = 50,
    min_edge_count: int = 2,
) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau 2004): ``(token,
    rank)`` — the top-``k`` tokens by exact-integer PageRank over the
    corpus-level token co-occurrence graph.

    Graph: adjacent-token pairs (window 2 on the shared lowercase
    ``\\W+`` tokenizer), undirected via both directed rows, self-loops
    dropped (``u = v`` would let a stuttered token pump its own rank),
    edges below ``min_edge_count`` corpus occurrences pruned (noise +
    the dominant edge-count term at scale). Ranking runs EXACTLY
    ``iters`` rounds of :func:`pipeline.graph.pagerank_fixed` — every
    arithmetic step is int64 with independent per-edge floors, so the
    final ranks (and therefore the top-k cut, tie-broken rank DESC then
    token ASC) are bit-reproducible in DuckDB by unrolling the same
    ``iters`` rounds as CTEs.

    Scale shape: bigram counting is the collocation machinery's explode
    → hash agg (shuffle carries word pairs once); the iteration then
    runs on the VOCABULARY-sized graph — at 100 TB the corpus scan
    happens once and five rounds of ids-only joins run on a table
    millions of times smaller; final cut is TakeOrderedAndProject.
    """
    from flink_streaming_2_10_spark.pipeline.dedup import _words_sql
    from flink_streaming_2_10_spark.pipeline.graph import pagerank_fixed

    ws = df.select(F.expr(_words_sql(text_col)).alias("__ws"))
    big = (
        "CASE WHEN size(__ws) >= 2 THEN transform(sequence(0, size(__ws) - 2), "
        "i -> struct(__ws[i] AS w1, __ws[i+1] AS w2)) "
        "ELSE cast(array() as array<struct<w1:string,w2:string>>) END"
    )
    bi = (
        ws.select(F.explode(F.expr(big)).alias("b"))
        .select("b.w1", "b.w2")
        .filter(F.col("w1") != F.col("w2"))
    )
    edges = (
        bi.select(F.col("w1").alias("src"), F.col("w2").alias("dst"))
        .unionByName(
            bi.select(F.col("w2").alias("src"), F.col("w1").alias("dst"))
        )
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= F.lit(int(min_edge_count)))
    )
    ranks = pagerank_fixed(edges, iters=iters)
    return (
        ranks.select(F.col("node").alias("token"), "rank")
        .orderBy(F.col("rank").desc(), F.col("token").asc())
        .limit(int(k))
    )


def despan_repeated(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_period: int = 3,
    strategy: str = "auto",
) -> DataFrame:
    """INTRA-document repeated-span removal (the within-doc counterpart of
    the cross-doc dedup family, in the spirit of Lee et al. 2022's exact
    substring dedup): drop tokens that merely continue an adjacent
    periodic repeat of period ≤ ``max_period``.

    Rule (single pass, positions 1-based over the filtered lowercase
    ``\\W+`` token array — the reference's tokenizer surface,
    WordCount.java:106-122): token ``t`` is REMOVED iff for some period
    ``p ∈ 1..max_period`` the ``p``-token window ending at ``t`` exactly
    equals the ``p``-token window ending at ``t−p``. So ``very very
    very`` (p=1), ``ab ab ab`` (p=2), and boilerplate loops up to
    ``max_period`` tokens collapse to their leading occurrence; spans
    repeated at a DISTANCE (not adjacent) are out of scope — that is the
    cross-doc/suffix-array regime, served by ``pipeline/crossdoc.py``
    and the dedup family. Invariant (pinned in tests): a k-fold adjacent
    repeat of a ``p``-token unit keeps at most ``2p−1`` tokens
    REGARDLESS of k.

    Output: ``(doc_id, n_tokens, n_removed, despan_ratio,
    despanned_text)``; ratio divides exact longs so the double is
    bit-identical cross-engine.

    Two EXACT execution strategies (identical output, pinned by a
    parity test):

    * ``"hof"`` — scan-local array expressions: zero shuffle, zero
      Python, O(n·max_period²) element compares per doc. The right
      shape for small periods (the production default 3 costs ≤ 9
      compares per token, rides the scan).
    * ``"window"`` — the r8-verdict generalization for long-period
      boilerplate loops: posexplode tokens once, and per period p
      compute ``match_p(t) = token(t) == lag(token, p)`` (O(1) — no
      window slices) plus a RUNNING max of the last mismatch position;
      ``t − last_mismatch ≥ p`` is exactly "the p-window ending at t
      equals the one ending at t−p". O(n·max_period) total, ONE
      exchange+sort on doc_id shared by all 2·max_period window
      expressions, aggregation back rides the same partitioning. The
      right shape for max_period ≈ 20: at p=20 the HOF path would pay
      400 compares/token; this pays 20 lags + 20 running maxes.
    * ``"auto"`` — hof for ``max_period ≤ 4``, window beyond.
    """
    from flink_streaming_2_10_spark.pipeline.dedup import _words_sql

    p_max = int(max_period)
    if p_max < 1:
        raise ValueError("max_period must be >= 1")
    if strategy == "auto":
        strategy = "hof" if p_max <= 4 else "window"
    if strategy == "window":
        return _despan_window(df, id_col, text_col, p_max)
    if strategy != "hof":
        raise ValueError(f"unknown strategy {strategy!r}")
    base = df.select(
        F.col(id_col).alias("doc_id"), F.expr(_words_sql(text_col)).alias("__ws")
    )
    # 1-based window-ending-at-t equality: slice(arr, t-p+1, p) is the
    # window ending at t; t >= 2*p keeps the earlier window in range.
    removed = (
        f"exists(sequence(1, {p_max}), p -> t >= 2*p AND "
        "slice(__ws, t - 2*p + 1, p) = slice(__ws, t - p + 1, p))"
    )
    # sequence(1, 0) would generate a DESCENDING [1, 0] — guard n = 0.
    kept = (
        "CASE WHEN size(__ws) = 0 THEN cast(array() as array<string>) "
        f"ELSE transform(filter(sequence(1, size(__ws)), t -> NOT ({removed})), "
        "t -> element_at(__ws, t)) END"
    )
    out = base.select(
        "doc_id",
        F.size("__ws").cast("long").alias("n_tokens"),
        F.expr(kept).alias("__kept"),
    )
    ratio = (
        F.when(
            F.col("n_tokens") > 0,
            (F.col("n_tokens") - F.size("__kept").cast("long")).cast("double")
            / F.col("n_tokens").cast("double"),
        )
        .otherwise(F.lit(0.0))
    )
    return out.select(
        "doc_id",
        "n_tokens",
        (F.col("n_tokens") - F.size("__kept").cast("long")).alias("n_removed"),
        ratio.alias("despan_ratio"),
        F.concat_ws(" ", F.col("__kept")).alias("despanned_text"),
    )


def _despan_window(
    df: DataFrame, id_col: str, text_col: str, p_max: int
) -> DataFrame:
    """``despan_repeated`` strategy="window" (see its docstring): exact
    long-period variant via lag + running-max over exploded tokens.

    Per period p, "the p-window ending at t equals the p-window ending
    at t−p" ⟺ every position j in (t−p, t] has token(j) == token(j−p)
    ⟺ the LAST position where that per-element match fails (counting
    every j ≤ p as a failure — the window would run off the front) is
    at most t−p. The running max of failure positions makes that an
    O(1)-per-row test, so the whole operator is O(n·p_max) with one
    shuffle; all lag/max expressions share the (doc_id, t) sort."""
    from pyspark.sql.window import Window

    from flink_streaming_2_10_spark.pipeline.dedup import _words_sql

    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.expr(_words_sql(text_col)).alias("__ws"),
    )
    toks = base.select(
        "doc_id",
        F.size("__ws").cast("long").alias("n_tokens"),
        F.posexplode_outer("__ws").alias("p0", "__tok"),
    ).select(
        "doc_id", "n_tokens", (F.col("p0") + 1).alias("t"), "__tok"
    )
    w = Window.partitionBy("doc_id").orderBy("t")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    removed = F.lit(False)
    for p in range(1, p_max + 1):
        match_p = F.col("__tok") == F.lag("__tok", p).over(w)
        fail = F.when(~F.coalesce(match_p, F.lit(False)), F.col("t"))
        removed = removed | (F.col("t") - F.max(fail).over(wrun) >= p)
    kept = F.when(
        F.col("__tok").isNotNull() & ~removed,
        F.struct(F.col("t").alias("t"), F.col("__tok").alias("tok")),
    )
    agg = (
        toks.withColumn("__kp", kept)
        .groupBy("doc_id")
        .agg(
            F.max("n_tokens").alias("n_tokens"),
            F.array_sort(F.collect_list("__kp")).alias("__ks"),
        )
    )
    ratio = (
        F.when(
            F.col("n_tokens") > 0,
            (F.col("n_tokens") - F.size("__ks").cast("long")).cast("double")
            / F.col("n_tokens").cast("double"),
        )
        .otherwise(F.lit(0.0))
    )
    return agg.select(
        "doc_id",
        "n_tokens",
        (F.col("n_tokens") - F.size("__ks").cast("long")).alias("n_removed"),
        ratio.alias("despan_ratio"),
        F.concat_ws(
            " ", F.expr("transform(__ks, s -> s.tok)")
        ).alias("despanned_text"),
    )


def corpus_summary(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 64,
    hasher: str = "xxhash64",
) -> DataFrame:
    """Corpus health dashboard in ONE scan + ONE global aggregation:
    ``(n_docs, n_tokens, mean_doc_tokens, n_quality_ge_half, n_english,
    est_distinct_texts)``.

    Composes the per-document quality composite (:func:`quality_exprs`),
    the language arbiter (:func:`language_pred_expr`), and the KMV
    distinct sketch's K permutation minima (pipeline/sketches.py) into a
    single projection, so the corpus is read once and everything reduces
    through one map-side-combined aggregate — the operational "how is my
    corpus doing" query a 100 TB pipeline runs after every ingest, at
    the cost of one pass. Counts are exact longs; the two doubles are
    one terminal division each (mean, KMV estimate), so the whole row
    hash-matches the DuckDB oracle.
    """
    from flink_streaming_2_10_spark.pipeline.dedup import _MERSENNE_31

    p = _MERSENNE_31
    agg = corpus_summary_state(df, id_col, text_col, k, hasher)
    pooled = sum(
        (F.col(f"m{i}") + F.lit(1) for i in range(1, int(k))),
        F.col("m0") + F.lit(1),
    )
    est = F.when(
        F.col("n_docs") > 0,
        F.lit(float(k) * (p + 1)) / pooled.cast("double") - F.lit(1.0),
    ).otherwise(F.lit(0.0))
    mean_tokens = F.when(
        F.col("n_docs") > 0,
        F.col("n_tokens").cast("double") / F.col("n_docs").cast("double"),
    ).otherwise(F.lit(0.0))
    return agg.select(
        "n_docs",
        "n_tokens",
        mean_tokens.alias("mean_doc_tokens"),
        "n_quality_ge_half",
        "n_english",
        est.alias("est_distinct_texts"),
    )


def corpus_summary_state(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 64,
    hasher: str = "xxhash64",
) -> DataFrame:
    """The PRE-division state row behind :func:`corpus_summary` —
    ``(n_docs, n_tokens, n_quality_ge_half, n_english, m0..m{k-1})`` —
    every field an exact long, which makes the state MERGEABLE: counts
    add, KMV minima take elementwise mins. This is the incremental-
    ingest face: keep one state row per corpus (or per day), fold each
    arriving batch in with :func:`merge_summary_states`, and
    :func:`finalize_summary` yields exactly what a full rescan would —
    the summary-table property HLL is normally chosen for, with none of
    its engine-specific register layout."""
    from flink_streaming_2_10_spark.pipeline.dedup import (
        _MERSENNE_31,
        _base_hash,
        minhash_perm_params,
    )

    text = F.col(text_col)
    q = quality_exprs(text)
    lang = language_pred_expr(text)
    norm = F.regexp_replace(F.lower(text), r"\s+", " ")
    p = _MERSENNE_31
    proj = df.select(
        q["n_words"].cast("long").alias("nw"),
        (q["quality"] >= F.lit(0.5)).cast("long").alias("okq"),
        (lang == F.lit("en")).cast("long").alias("en"),
        _base_hash(norm, hasher).alias("h"),
    )
    mins = [
        F.min(
            F.pmod(F.lit(a) * F.col("h") + F.lit(b), F.lit(p))
        ).alias(f"m{i}")
        for i, (a, b) in enumerate(minhash_perm_params(int(k)))
    ]
    return proj.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.coalesce(F.sum("nw"), F.lit(0)).alias("n_tokens"),
        F.coalesce(F.sum("okq"), F.lit(0)).alias("n_quality_ge_half"),
        F.coalesce(F.sum("en"), F.lit(0)).alias("n_english"),
        *mins,
    )


def merge_summary_states(a: dict, b: dict, k: int = 64) -> dict:
    """Merge two summary state rows (as dicts): counts ADD, minima take
    MIN (None = empty state absorbs). Exact integer arithmetic only, so
    any merge ORDER or grouping gives the identical state — the
    associative/commutative contract that lets daily states roll up
    into monthly ones."""
    if not a:
        return dict(b)
    if not b:
        return dict(a)
    out = {
        key: a[key] + b[key]
        for key in ("n_docs", "n_tokens", "n_quality_ge_half", "n_english")
    }
    for i in range(int(k)):
        ma, mb = a.get(f"m{i}"), b.get(f"m{i}")
        out[f"m{i}"] = (
            ma if mb is None else mb if ma is None else min(ma, mb)
        )
    return out


def finalize_summary(state: dict, k: int = 64) -> dict:
    """State row → the :func:`corpus_summary` output row (the two
    terminal double divisions)."""
    from flink_streaming_2_10_spark.pipeline.dedup import _MERSENNE_31

    p = _MERSENNE_31
    n_docs = state.get("n_docs", 0) if state else 0
    if not n_docs:
        return {
            "n_docs": 0, "n_tokens": 0, "mean_doc_tokens": 0.0,
            "n_quality_ge_half": 0, "n_english": 0,
            "est_distinct_texts": 0.0,
        }
    pooled = sum(state[f"m{i}"] + 1 for i in range(int(k)))
    return {
        "n_docs": n_docs,
        "n_tokens": state["n_tokens"],
        "mean_doc_tokens": float(state["n_tokens"]) / float(n_docs),
        "n_quality_ge_half": state["n_quality_ge_half"],
        "n_english": state["n_english"],
        "est_distinct_texts": float(k) * (p + 1) / float(pooled) - 1.0,
    }
