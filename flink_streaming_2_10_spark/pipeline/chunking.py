"""Fixed-token document chunking with overlap (north-star extension):
split each document into windows of ``chunk_size`` whitespace tokens
advancing by ``stride`` tokens (``chunk_size - stride`` tokens of
overlap between consecutive chunks) — the standard long-document
pre-processing step for context-bounded LLM training and embedding
models (every RAG / pretraining pipeline runs exactly this shape).

Complements :mod:`flink_streaming_2_10_spark.pipeline.packing`:
packing concatenates SHORT documents up to a token budget; chunking
splits LONG documents down to one. A production shard-prep pipeline
runs chunking first, packing second.

100 TB shape: the whole operator is scan-local — tokenize, compute the
chunk count, and slice out every window with array higher-order
functions inside ONE projection per document, then ``explode``. Zero
shuffles, zero UDFs, no driver participation; Catalyst prunes the scan
to (id, text) and the work parallelizes with the input partitioning
(a 1000-executor scan chunks 1000-way with no exchange). Emitting the
md5-derived 60-bit content hash instead of the chunk text keeps the
output (and any downstream shuffle of it) narrow; callers that need
the text re-slice it from the source row.

Chunk arithmetic (all integer, so the DuckDB oracle matches
bit-for-bit): a document with ``n > 0`` tokens produces

    n_chunks = 1                              if n <= chunk_size
               1 + ceil((n - chunk_size) / stride)   otherwise

chunk ``i`` covers tokens ``[i*stride, min(i*stride + chunk_size, n))``
— every token is covered, consecutive chunks share ``chunk_size -
stride`` tokens, and the final chunk is the only one allowed to be
short. Zero-token documents produce no chunks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from flink_streaming_2_10_spark.pipeline.dedup import _hash60, duckdb_hash60_sql

#: Whitespace tokens — same atom in Spark (Java regex) and DuckDB (RE2).
_TOKEN_PATTERN = r"\S+"


def chunk_documents(
    df: DataFrame,
    chunk_size: int = 32,
    stride: int = 24,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split documents into overlapping fixed-token chunks.

    Returns ``(id_col, chunk_index, tok_start, n_tokens, chunk_hash)``
    with one row per chunk: ``chunk_index`` counts from 0 within the
    document, ``tok_start`` is the 0-based token offset of the chunk,
    ``n_tokens`` its width (== ``chunk_size`` everywhere but each
    document's last chunk), and ``chunk_hash`` the 60-bit md5 hash of
    the space-joined token window (the content key downstream exact
    dedup runs on).
    """
    if not 0 < stride <= chunk_size:
        raise ValueError("require 0 < stride <= chunk_size")
    c, s = int(chunk_size), int(stride)
    toks = F.regexp_extract_all(F.col(text_col), F.lit(_TOKEN_PATTERN), 0)
    base = df.select(F.col(id_col), toks.alias("toks")).where(F.size("toks") > 0)
    # Integer ceil-div on positive operands: 1 + (n - c + s - 1) div s.
    n_chunks = F.expr(
        f"IF(size(toks) <= {c}, 1, 1 + (size(toks) - {c} + {s - 1}) div {s})"
    )
    ex = base.select(
        id_col,
        "toks",
        F.explode(F.sequence(F.lit(0), (n_chunks - F.lit(1)).cast("int"))).alias(
            "chunk_index"
        ),
    )
    start = F.col("chunk_index") * F.lit(s)
    width = F.least(F.lit(c), F.size("toks") - start)
    window = F.concat_ws(" ", F.slice(F.col("toks"), start + F.lit(1), width))
    return ex.select(
        id_col,
        F.col("chunk_index").cast("int").alias("chunk_index"),
        start.cast("long").alias("tok_start"),
        width.cast("long").alias("n_tokens"),
        _hash60(window, "md5").alias("chunk_hash"),
    )


def chunk_documents_oracle(
    chunk_size: int = 32,
    stride: int = 24,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB mirror of :func:`chunk_documents` — same tokenization,
    same integer chunk arithmetic, same md5 60-bit content hash."""
    c, s = int(chunk_size), int(stride)
    window = (
        f"array_to_string(list_slice(toks, chunk_index * {s} + 1, "
        f"chunk_index * {s} + least({c}, len(toks) - chunk_index * {s})), ' ')"
    )
    return f"""
        WITH base AS (
            SELECT {id_col}, regexp_extract_all({text_col}, '{_TOKEN_PATTERN}') AS toks
            FROM {table}
            WHERE len(regexp_extract_all({text_col}, '{_TOKEN_PATTERN}')) > 0
        ),
        ex AS (
            SELECT {id_col}, toks,
                   unnest(generate_series(0,
                       CASE WHEN len(toks) <= {c} THEN 0
                            ELSE (len(toks) - {c} + {s - 1}) // {s} END)) AS chunk_index
            FROM base
        )
        SELECT {id_col},
               CAST(chunk_index AS INT) AS chunk_index,
               CAST(chunk_index * {s} AS BIGINT) AS tok_start,
               CAST(least({c}, len(toks) - chunk_index * {s}) AS BIGINT) AS n_tokens,
               {duckdb_hash60_sql(window)} AS chunk_hash
        FROM ex
    """
