"""Sequence packing for LLM pretraining shards (north-star extension):
GPT-style concat-and-chunk — documents are concatenated in a fixed order
(with an EOS separator token each) and the token stream is cut into
fixed-size training sequences; a document that straddles a boundary is
split across the two sequences.

100 TB shape: the corpus is first bucketed into ``num_shards`` hash
shards (narrow projection — the shard id is a pure function of doc_id),
and all ordering state is PER SHARD: the running token offset is a
window sum partitioned by shard, so the sort is shard-local and every
shard packs independently in parallel. There is no global order and no
single-partition window — exactly how production packing jobs shard
their output files. Scaling up = raising ``num_shards`` (one output file
per shard); the per-shard sort is the order the tokenizer needs anyway.

All arithmetic is integer (token counts, offsets, chunk ids), so the
DuckDB oracle (:func:`pack_chunks_oracle`) matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from flink_streaming_2_10_spark.pipeline.dedup import duckdb_hash60_sql
from flink_streaming_2_10_spark.pipeline.textstats import BPE_PATTERN


def derive_num_shards(df: DataFrame) -> int:
    """Scale-aware shard count: one shard per input partition, floored at
    the cluster's default parallelism.

    The shard count IS the packing parallelism — the running-sum window is
    partitioned by shard, so at most ``num_shards`` tasks ever do ordering
    work. Input partition count tracks data volume (one scan partition ≈
    ``spark.sql.files.maxPartitionBytes``), so a 100× bigger corpus gets
    ~100× the shards automatically instead of squeezing through a fixed
    8-way window stage; the defaultParallelism floor keeps tiny inputs
    from under-using the cluster.
    """
    spark = df.sparkSession
    return max(df.rdd.getNumPartitions(), spark.sparkContext.defaultParallelism)


def pack_concat_chunks(
    df: DataFrame,
    budget: int = 512,
    num_shards: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Pack documents into fixed-``budget`` token sequences, concat-and-
    chunk style, sharded by ``pmod(hash(doc_id), num_shards)``.

    ``num_shards=None`` (the default) derives the shard count from the
    input size via :func:`derive_num_shards`; pass an explicit count when
    the number of output files is a contract (the oracle query pins 8 for
    cross-engine parity).

    Per document: ``tokens = bpe_count(text) + 1`` (one EOS separator —
    also guarantees every doc occupies ≥1 slot). Within a shard, docs
    are laid out in ``doc_id`` order; ``[start, end)`` token offsets
    come from a shard-partitioned running sum, and the doc lands in
    chunks ``start DIV budget .. (end-1) DIV budget`` (inclusive —
    straddlers appear in each chunk they overlap, with the overlap
    length as their token contribution).

    Returns the per-chunk manifest ``(shard_id, chunk_id, n_docs,
    n_tokens, first_doc, last_doc)`` — every chunk holds exactly
    ``budget`` tokens except each shard's last.
    """
    if num_shards is None:
        num_shards = derive_num_shards(df)
    sid = F.conv(
        F.substring(F.md5(F.concat(F.lit("shard:"), F.col(id_col).cast("string"))), 1, 15),
        16,
        10,
    ).cast("long") % num_shards
    tokens = F.regexp_count(F.col(text_col), F.lit(BPE_PATTERN)) + F.lit(1)
    laid = df.select(
        F.col(id_col),
        sid.alias("shard_id"),
        tokens.cast("long").alias("tokens"),
    )
    w = (
        Window.partitionBy("shard_id")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    spans = laid.select(
        id_col,
        "shard_id",
        "tokens",
        (F.sum("tokens").over(w) - F.col("tokens")).alias("start"),
        F.sum("tokens").over(w).alias("end"),
    )
    b = F.lit(int(budget)).cast("long")
    exploded = spans.select(
        id_col,
        "shard_id",
        "start",
        "end",
        F.explode(
            F.sequence(
                F.expr(f"start div {int(budget)}"),
                F.expr(f"(`end` - 1) div {int(budget)}"),
            )
        ).alias("chunk_id"),
    )
    contrib = F.least(F.col("end"), (F.col("chunk_id") + 1) * b) - F.greatest(
        F.col("start"), F.col("chunk_id") * b
    )
    return (
        exploded.groupBy("shard_id", "chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(contrib).alias("n_tokens"),
            F.min(id_col).alias("first_doc"),
            F.max(id_col).alias("last_doc"),
        )
    )


def pack_chunks_oracle(
    budget: int = 512,
    num_shards: int = 8,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB mirror of :func:`pack_concat_chunks` — same shard hash,
    same running sum, same integer chunk arithmetic."""
    sid = duckdb_hash60_sql(f"'shard:' || CAST({id_col} AS VARCHAR)")
    return f"""
        WITH laid AS (
            SELECT {id_col},
                   {sid} % {int(num_shards)} AS shard_id,
                   CAST(len(regexp_extract_all({text_col}, '{BPE_PATTERN}')) + 1
                        AS BIGINT) AS tokens
            FROM {table}
        ),
        spans AS (
            SELECT {id_col}, shard_id, tokens,
                   CAST(sum(tokens) OVER w - tokens AS BIGINT) AS start,
                   CAST(sum(tokens) OVER w AS BIGINT) AS "end"
            FROM laid
            WINDOW w AS (PARTITION BY shard_id ORDER BY {id_col}
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ),
        exploded AS (
            SELECT {id_col}, shard_id, start, "end",
                   unnest(generate_series(start // {int(budget)},
                                          ("end" - 1) // {int(budget)})) AS chunk_id
            FROM spans
        )
        SELECT shard_id, chunk_id,
               count(*) AS n_docs,
               CAST(sum(least("end", (chunk_id + 1) * {int(budget)}) -
                        greatest(start, chunk_id * {int(budget)})) AS BIGINT)
                   AS n_tokens,
               min({id_col}) AS first_doc,
               max({id_col}) AS last_doc
        FROM exploded
        GROUP BY shard_id, chunk_id
    """
