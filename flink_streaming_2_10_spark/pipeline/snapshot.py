"""Corpus snapshot delta (north-star extension): classify every
document across two ingest snapshots as ``added`` / ``removed`` /
``changed`` / ``unchanged`` and report per-partition counts — the diff
step every periodically-recrawled training corpus runs before
reprocessing (only ``added``+``changed`` docs re-enter the dedup /
quality / packing pipeline; ``removed`` ids propagate as deletions).

100 TB shape: each snapshot is reduced SCAN-SIDE to a 3-column
``(id, partition, 60-bit content hash)`` projection — the full-outer
join that computes the diff shuffles ~20 bytes per document and never
moves text. On a real lakehouse both snapshots are bucketed by the id
(the write path in ``pipeline/writer.py`` does exactly that), making
the join exchange-free; the follow-up aggregation is on the tiny
(partition, status) key space with map-side partials. Content equality
via the md5-derived hash has a ~n²/2^61 collision risk — the standard
trade for never re-reading either snapshot's text; both engines hash
identically so the DuckDB oracle matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from flink_streaming_2_10_spark.pipeline.dedup import _hash60, duckdb_hash60_sql


def snapshot_delta(
    old_df: DataFrame,
    new_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    part_col: str = "source",
) -> DataFrame:
    """Diff two corpus snapshots by content hash.

    Returns ``(part_col, status, n_docs, first_doc, last_doc)`` with
    ``status ∈ {'added','removed','changed','unchanged'}``; the
    partition column of a removed document comes from the old snapshot
    (it no longer exists in the new one).
    """
    def digest(df: DataFrame, tag: str) -> DataFrame:
        return df.select(
            F.col(id_col),
            F.col(part_col).alias(f"{part_col}_{tag}"),
            _hash60(F.col(text_col), "md5").alias(f"fp_{tag}"),
        )

    joined = digest(old_df, "old").join(
        digest(new_df, "new"), on=id_col, how="full_outer"
    )
    status = (
        F.when(F.col("fp_old").isNull(), F.lit("added"))
        .when(F.col("fp_new").isNull(), F.lit("removed"))
        .when(F.col("fp_old") == F.col("fp_new"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    part = F.coalesce(F.col(f"{part_col}_new"), F.col(f"{part_col}_old"))
    return (
        joined.select(
            part.alias(part_col), status.alias("status"), F.col(id_col)
        )
        .groupBy(part_col, "status")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(id_col).alias("first_doc"),
            F.max(id_col).alias("last_doc"),
        )
    )


def snapshot_delta_oracle(
    old_sql: str,
    new_sql: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    part_col: str = "source",
) -> str:
    """DuckDB mirror of :func:`snapshot_delta` over two snapshot
    subqueries (each selecting at least ``id_col, part_col,
    text_col``)."""
    fp = duckdb_hash60_sql(text_col)
    return f"""
        WITH old_snap AS (
            SELECT {id_col}, {part_col} AS part_old, {fp} AS fp_old
            FROM ({old_sql})
        ),
        new_snap AS (
            SELECT {id_col}, {part_col} AS part_new, {fp} AS fp_new
            FROM ({new_sql})
        ),
        joined AS (
            SELECT COALESCE(o.{id_col}, n.{id_col}) AS {id_col},
                   COALESCE(n.part_new, o.part_old) AS {part_col},
                   CASE WHEN o.fp_old IS NULL THEN 'added'
                        WHEN n.fp_new IS NULL THEN 'removed'
                        WHEN o.fp_old = n.fp_new THEN 'unchanged'
                        ELSE 'changed' END AS status
            FROM old_snap o FULL OUTER JOIN new_snap n USING ({id_col})
        )
        SELECT {part_col}, status,
               count(*) AS n_docs,
               min({id_col}) AS first_doc,
               max({id_col}) AS last_doc
        FROM joined
        GROUP BY {part_col}, status
    """
