"""Winnowing document fingerprints (the MOSS local-minimum scheme,
Schleimer/Wilkerson/Aiken SIGMOD'03): hash every k-token shingle, slide
a w-wide window over the hash sequence, and keep each window's minimum.
The selected set is position-robust — any shared run of at least
``w + k - 1`` tokens between two documents is GUARANTEED to contribute
at least one common fingerprint, while only ~2/(w+1) of all shingles
are kept — the density/guarantee trade the paper proves optimal.

Complements the fingerprint family already here: ``doc_fingerprints``
(whole-document rolling hash) detects only exact duplicates;
MinHash/SimHash estimate GLOBAL similarity; winnowing detects LOCAL
overlap (a shared paragraph inside otherwise-different documents) with
a hard guarantee instead of a probability — the plagiarism / partial-
reuse detector of the family.

100 TB shape: entirely scan-local — tokenize, shingle-hash, window-min
and aggregate with array higher-order functions in a handful of narrow
projections; zero shuffles, zero UDFs, no per-doc state outside the
row. The per-document output is a fixed 5-column summary (count /
xor / min / max of the selected set), so downstream joins carry ~40
bytes per document, never the text. Callers building a cross-document
reuse index explode the selected array instead and bucket-join on the
fingerprint — same posting-list shape as ``pipeline/crossdoc.py``.

All arithmetic is integer (md5-derived 60-bit hashes, xor/min/max
reductions), so the DuckDB oracle reproduces every value bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from flink_streaming_2_10_spark.pipeline.dedup import _hash60, duckdb_hash60_sql

#: Whitespace tokens over the lowercased text — same atom in Spark
#: (Java regex) and DuckDB (RE2).
_TOKEN_PATTERN = r"\S+"


def winnow_selected(
    df: DataFrame,
    k: int = 3,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document selected fingerprint SET: ``(id_col, n_grams, sel
    array<long>)`` — the distinct window minima. The posting-list face
    for cross-document reuse indexes (explode ``sel`` and bucket-join);
    :func:`winnow_fingerprints` summarises it per document.
    """
    if k < 1 or w < 1:
        raise ValueError("require k >= 1 and w >= 1")
    k, w = int(k), int(w)
    toks = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(_TOKEN_PATTERN), 0
    )
    base = df.select(F.col(id_col), toks.alias("toks")).where(
        F.size("toks") >= F.lit(k)
    )
    # Stage the gram-hash array ONCE per row; the winnow stage references
    # it from inside a lambda, which Spark re-evaluates per window — a
    # separate projection keeps the md5 work O(n), not O(n·w).
    grams = base.select(
        id_col,
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - F.lit(k - 1)),
            lambda i: _hash60(
                F.concat_ws(" ", F.slice(F.col("toks"), i, F.lit(k))), "md5"
            ),
        ).alias("grams"),
    )
    m = F.size("grams")
    # slice() clamps at the array end, so the trailing (shorter) windows
    # of the degenerate m < w case need no special arithmetic.
    return grams.select(
        id_col,
        m.alias("n_grams"),
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.lit(1), m - F.lit(w - 1))),
                lambda j: F.array_min(F.slice(F.col("grams"), j, F.lit(w))),
            )
        ).alias("sel"),
    )


def winnow_fingerprints(
    df: DataFrame,
    k: int = 3,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document winnowing fingerprint summary.

    Returns ``(id_col, n_grams, n_fingerprints, fp_xor, fp_min,
    fp_max)`` for every document with at least ``k`` tokens: ``n_grams``
    k-shingle count, ``n_fingerprints`` the distinct window minima
    selected (≈ ``2/(w+1)`` of the shingles), and xor/min/max over the
    selected set — an order-free, exactly-reproducible digest of it.
    Documents shorter than one window keep their global minimum (the
    scheme's single-window degenerate case), so every document with
    ``n_grams >= 1`` emits a summary.
    """
    sel = winnow_selected(df, k=k, w=w, id_col=id_col, text_col=text_col)
    return sel.select(
        id_col,
        F.col("n_grams").cast("long").alias("n_grams"),
        F.size("sel").cast("long").alias("n_fingerprints"),
        F.aggregate(
            F.col("sel"),
            F.lit(0).cast("long"),
            lambda acc, x: acc.bitwiseXOR(x),
        ).alias("fp_xor"),
        F.array_min("sel").alias("fp_min"),
        F.array_max("sel").alias("fp_max"),
    )


def winnow_fingerprints_oracle(
    k: int = 3,
    w: int = 4,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB mirror of :func:`winnow_fingerprints` — same tokens, same
    md5 60-bit shingle hashes, same window minima and reductions
    (xor with a 0 seed is identity, so ``list_reduce`` matches Spark's
    0-initialised ``aggregate`` fold exactly)."""
    return f"""
        WITH {winnow_selected_oracle_ctes(k, w, table, id_col, text_col)}
        SELECT {id_col},
               CAST(n_grams AS BIGINT) AS n_grams,
               CAST(len(sel) AS BIGINT) AS n_fingerprints,
               list_reduce(sel, (a, b) -> xor(a, b)) AS fp_xor,
               list_min(sel) AS fp_min,
               list_max(sel) AS fp_max
        FROM sel
    """


def winnow_selected_oracle_ctes(
    k: int = 3,
    w: int = 4,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """CTE chain ``base/grams/sel`` ending in the per-document selected
    fingerprint set ``sel(id_col, n_grams, sel)`` — the DuckDB mirror of
    :func:`winnow_selected`, shared by the fingerprint-summary oracle and
    composing oracles (``pipeline.leakage``)."""
    k, w = int(k), int(w)
    gram = duckdb_hash60_sql(
        f"array_to_string(list_slice(toks, i, i + {k - 1}), ' ')"
    )
    return f"""base AS (
            SELECT {id_col},
                   regexp_extract_all(lower({text_col}), '{_TOKEN_PATTERN}') AS toks
            FROM {table}
            WHERE len(regexp_extract_all(lower({text_col}), '{_TOKEN_PATTERN}')) >= {k}
        ),
        grams AS (
            SELECT {id_col},
                   list_transform(generate_series(1, len(toks) - {k - 1}),
                                  i -> {gram}) AS grams
            FROM base
        ),
        sel AS (
            SELECT {id_col}, len(grams) AS n_grams,
                   list_distinct(list_transform(
                       generate_series(1, greatest(1, len(grams) - {w - 1})),
                       j -> list_min(list_slice(grams, j, j + {w - 1})))) AS sel
            FROM grams
        )"""
