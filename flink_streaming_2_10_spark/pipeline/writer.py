"""Training-shard writer: the sink side of the curation pipeline —
deterministic hash sharding, shard-local ordering, one parquet directory
per shard, and a driver-consumable manifest.

The reference's sinks are line sinks (``writeAsText``/``print`` —
sinks.py); a training pipeline's terminal op is instead "write N
well-balanced, reproducibly-assigned shards + a manifest the tokenizer
fleet can schedule on". Design for 100 TB:

* shard assignment is a pure column expression on the id (no sampling
  pass, no global sort): ``pmod(hash60(id), num_shards)`` — re-running
  the pipeline reassigns identically, so incremental re-writes and
  debugging a single shard are deterministic;
* the write repartitions BY the shard column (one hash exchange of the
  final survivor rows) and sorts only within partitions (no global
  order, no range-exchange skew pass), then ``partitionBy("shard")``
  emits one directory per shard;
* the manifest is one hash aggregation on the same assignment — token
  totals per shard let a scheduler bin-pack tokenizer work.

``hasher="md5"`` mirrors in DuckDB (shard_manifest oracle);
``xxhash64`` is the cluster default — identical plan shape.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, functions as F

from flink_streaming_2_10_spark.pipeline.dedup import _hash60
from flink_streaming_2_10_spark.pipeline.textstats import NONSPACE_RUN_PATTERN


def assign_shards(
    df: DataFrame,
    num_shards: int,
    id_col: str = "doc_id",
    hasher: str = "xxhash64",
) -> DataFrame:
    """Append a deterministic ``shard`` column: ``pmod(hash60(id),
    num_shards)``. Hashing the id string (not the raw integer) spreads
    sequential ids uniformly."""
    if num_shards < 1:
        raise ValueError(f"num_shards must be >= 1, got {num_shards}")
    h = _hash60(F.col(id_col).cast("string"), hasher)
    return df.withColumn("shard", F.pmod(h, F.lit(num_shards)).cast("int"))


def shard_manifest(
    df: DataFrame,
    num_shards: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    hasher: str = "xxhash64",
) -> DataFrame:
    """Per-shard scheduling stats: ``(shard, n_docs, n_tokens, n_chars,
    min_doc_id, max_doc_id)`` — one narrow projection + one hash agg on
    the int shard key."""
    assigned = assign_shards(df, num_shards, id_col, hasher).select(
        "shard",
        F.col(id_col),
        F.regexp_count(F.col(text_col), F.lit(NONSPACE_RUN_PATTERN))
        .cast("long")
        .alias("__tok"),
        F.length(F.col(text_col)).cast("long").alias("__chars"),
    )
    return (
        assigned.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__tok").alias("n_tokens"),
            F.sum("__chars").alias("n_chars"),
            F.min(id_col).alias("min_doc_id"),
            F.max(id_col).alias("max_doc_id"),
        )
    )


def write_bucketed_table(
    df: DataFrame,
    table: str,
    path: str,
    bucket_col: str = "doc_id",
    num_buckets: int = 64,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a Spark BUCKETED parquet table (external, at
    ``path``): rows are hash-partitioned into ``num_buckets`` files by
    ``bucket_col`` and optionally sorted within each bucket.

    The co-located-join primitive for a corpus that is joined or
    aggregated on the same key repeatedly (dedup reruns, incremental
    ingestion diffs, per-doc feature joins): two tables bucketed the same
    way join with ZERO exchanges — the scan's bucket layout satisfies the
    join's partitioning requirement outright, so at 100 TB each rerun
    saves a full corpus shuffle for a one-time write-side cost. Pinned by
    ``tests/test_writer.py::test_bucketed_tables_join_without_exchange``.

    Bucket metadata lives in the session catalog (``saveAsTable`` is
    required — plain ``.parquet()`` writes no bucket spec, and a reader
    that doesn't know the layout can't exploit it); ``path`` keeps the
    data external so the table is re-registerable in a fresh session.
    """
    if num_buckets < 1:
        raise ValueError(f"num_buckets must be >= 1, got {num_buckets}")
    writer = df.write.mode(mode).format("parquet").bucketBy(
        num_buckets, bucket_col
    )
    # Appends to an EXISTING table go to the table's own location (the
    # path argument is only binding at creation): after a
    # :func:`compact_bucketed_table` generation swap the table lives at
    # a new path, and pinning the original path here would make every
    # ingest face (which passes the same path each pass) fail its first
    # post-compaction append on Spark's location-mismatch check. That
    # redirect is only silent when the passed path is a RECORDED prior
    # generation of this table (compaction stamps lineage into
    # TBLPROPERTIES); a location mismatch with no lineage means a stale
    # same-named table from an unrelated build would swallow the append,
    # so it warns loudly instead of failing the way plain Spark would.
    exists = False
    if mode == "append":
        try:
            exists = df.sparkSession.catalog.tableExists(table)
        except AnalysisException:
            exists = False
        if exists:
            _warn_if_unrelated_location(df.sparkSession, table, path)
    if not (mode == "append" and exists):
        writer = writer.option("path", path)
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


#: TBLPROPERTIES key where :func:`compact_bucketed_table` accumulates the
#: prior-generation paths of a table as a JSON array, oldest first.
PREV_PATHS_PROP = "spark_graft.prev_paths"

#: TBLPROPERTIES keys tracking the auto-compaction generation counter and
#: the original (user-chosen) base path the ``_g{N}`` suffix is appended
#: to — recorded by ``neardup_index._auto_compact_index_table`` so the
#: next generation never has to be parsed back out of the current path
#: (a user root that itself ends in ``_g2`` must NOT have its first
#: compaction written to the sibling ``_g3``).
GENERATION_PROP = "spark_graft.generation"
BASE_PATH_PROP = "spark_graft.base_path"


def _decode_prev_paths(raw: str) -> list[str]:
    """Parse the :data:`PREV_PATHS_PROP` value — a JSON array of path
    strings. Pre-r15 tables recorded a comma-joined string (which
    corrupted on paths containing commas and silently stripped quotes);
    that legacy form is still read, best-effort, for tables compacted
    by an older build."""
    import json

    if not raw:
        return []
    try:
        decoded = json.loads(raw)
        if isinstance(decoded, list) and all(
            isinstance(p, str) for p in decoded
        ):
            return decoded
    except ValueError:
        pass
    return [p for p in raw.split(",") if p]


def _encode_prev_paths(paths: list[str]) -> str:
    """JSON-encode the lineage list (lossless for commas and quotes in
    paths — the round-trip :func:`_decode_prev_paths` inverts exactly)."""
    import json

    return json.dumps(paths)


def _sql_str_lit(value: str) -> str:
    """Escape ``value`` for interpolation into a single-quoted Spark SQL
    string literal. Spark SQL processes BACKSLASH escapes inside string
    literals by default (``spark.sql.parser.escapedStringLiterals`` is
    false → C-style escapes), so doubling single quotes alone is NOT
    enough: a path containing ``\\`` or a JSON-encoded ``\\"`` reaches
    the property store corrupted (the backslash is consumed as an
    escape prefix), silently breaking the lossless-lineage round trip.
    Backslashes must be doubled FIRST, then single quotes — the reverse
    order would double the backslashes that quote-doubling introduces
    (it introduces none, but the ordering invariant is the point)."""
    return value.replace("\\", "\\\\").replace("'", "''")


def _norm_location(p: str) -> str:
    """Normalize a table location / path for equality: strip a file:
    scheme and trailing slashes (Spark reports catalog locations as
    ``file:/...`` URIs while callers pass plain paths)."""
    for prefix in ("file://", "file:"):
        if p.startswith(prefix):
            p = p[len(prefix):]
            break
    return p.rstrip("/")


def _table_properties(spark, table: str) -> dict[str, str]:
    """All TBLPROPERTIES of ``table`` as a dict (driver-side, catalog
    metadata only)."""
    return {
        r["key"]: r["value"]
        for r in spark.sql(f"SHOW TBLPROPERTIES {table}").collect()
    }


def _table_location(spark, table: str) -> str | None:
    """Catalog location of ``table``, or None if the catalog doesn't
    report one (DESCRIBE FORMATTED's Location row)."""
    for r in spark.sql(f"DESCRIBE FORMATTED {table}").collect():
        if r["col_name"] == "Location":
            return r["data_type"]
    return None


def _warn_if_unrelated_location(spark, table: str, path: str) -> None:
    """Warn when an append is about to be redirected to a catalog
    location that is neither the passed path nor a recorded prior
    generation of it — the stale-table-shadowing case."""
    import warnings

    loc = _table_location(spark, table)
    if loc is None or _norm_location(loc) == _norm_location(path):
        return
    prev = {
        _norm_location(p)
        for p in _decode_prev_paths(
            _table_properties(spark, table).get(PREV_PATHS_PROP, "")
        )
    }
    if _norm_location(path) in prev:
        return  # the intended post-compaction generation-swap redirect
    warnings.warn(
        f"append to bucketed table '{table}' will go to its catalog "
        f"location {loc!r}, NOT the passed path {path!r}, and {path!r} is "
        f"not a recorded prior generation of this table — a same-named "
        f"table from an unrelated build may be receiving this append. "
        f"Drop/rename the stale table or pass its actual location.",
        stacklevel=3,
    )


def compact_bucketed_table(
    spark,
    table: str,
    old_path: str,
    new_path: str,
    bucket_col: str,
    num_buckets: int,
    sort_col: str | None = None,
) -> None:
    """Rewrite a bucketed table into exactly ``num_buckets`` files at a
    NEW path and re-point the catalog name at it — the small-file
    compaction every append-maintained bucketed index eventually needs.

    Each ``mode="append"`` pass through :func:`write_bucketed_table`
    (the incremental-ingest faces: ``neardup_ingest_batch``,
    ``media_ingest_batch``, survivor appends) adds its own file set per
    bucket, so after k passes a probe opens O(k·num_buckets) parquet
    files — at 100 TB with daily appends that is the classic streaming
    small-file problem (open/footer costs start to rival the scan).
    Compaction is generation-style, the only shape that is safe while
    readers exist: the OLD files are read by path (never through the
    catalog name, so Spark's cannot-overwrite-a-table-being-read check
    is never in play and no self-referential lineage exists),
    repartitioned by the bucket hash so each task holds exactly one
    bucket (Spark's bucket assignment and ``repartition``'s hash are
    the same Murmur3 — one file per bucket, pinned in
    tests/test_writer.py), and written bucketed to ``new_path``;
    ``saveAsTable(mode="overwrite")`` then atomically re-points the
    table name. The caller deletes ``old_path`` once no reader needs
    the old generation (on a cluster, after the retention window).

    Bucket SPEC is preserved (same column, same count), so every probe
    join that was exchange-free on the old generation is exchange-free
    on the new one — state and results are unchanged, exactly the
    mergeable-state contract ``compact_segment_census`` documents for
    the census log.
    """
    if old_path.rstrip("/") == new_path.rstrip("/"):
        raise ValueError(
            "compaction must write a NEW generation: old_path == new_path"
        )
    # Carry the generation lineage forward BEFORE the swap: the passed
    # old_path plus any generations already recorded, so ingest faces
    # that keep passing the original creation path stay silently
    # redirected across ANY number of compactions (write_bucketed_table
    # warns on location mismatches outside this recorded history).
    prev: list[str] = []
    try:
        if spark.catalog.tableExists(table):
            recorded = _table_properties(spark, table).get(
                PREV_PATHS_PROP, ""
            )
            prev = _decode_prev_paths(recorded)
    except AnalysisException:
        prev = []
    if _norm_location(old_path) not in [_norm_location(p) for p in prev]:
        prev.append(old_path)

    df = spark.read.parquet(old_path).repartition(num_buckets, F.col(bucket_col))
    write_bucketed_table(
        df, table, new_path,
        bucket_col=bucket_col, num_buckets=num_buckets,
        sort_col=sort_col, mode="overwrite",
    )
    # JSON array escaped for the SQL string literal (backslashes AND
    # single quotes — Spark SQL C-style escape processing would
    # otherwise corrupt JSON's \" sequences) — lossless for paths
    # containing commas, quotes, or backslashes.
    lineage = _sql_str_lit(_encode_prev_paths(prev))
    spark.sql(
        f"ALTER TABLE {table} SET TBLPROPERTIES "
        f"('{PREV_PATHS_PROP}' = '{lineage}')"
    )
    spark.catalog.refreshTable(table)


def write_training_shards(
    df: DataFrame,
    out_dir: str,
    num_shards: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    hasher: str = "xxhash64",
    order_col: str | None = None,
) -> DataFrame:
    """Write ``df`` as ``out_dir/shard=K/*.parquet`` (one file per shard
    via repartition-by-shard + partitionBy) with rows ordered by id
    within each shard, and return the manifest DataFrame.

    ``order_col`` switches the within-shard order to CURRICULUM order:
    rows sorted by that column (ascending — pass a difficulty/quality
    score) with ``id_col`` the total-order tie-break, so a trainer
    streaming a shard file front-to-back reads easy-to-hard without any
    extra pass. Ordering stays shard-local either way.

    The exchange keys on the int shard column; ``sortWithinPartitions``
    keeps ordering shard-local (a global orderBy would add a range
    exchange + skew-prone sampling pass for ordering nobody reads
    across shard boundaries).
    """
    assigned = assign_shards(df, num_shards, id_col, hasher)
    order = (
        ["shard", order_col, id_col]
        if order_col is not None
        else ["shard", id_col]
    )
    (
        assigned.repartition(num_shards, "shard")
        .sortWithinPartitions(*order)
        .write.partitionBy("shard")
        .mode("overwrite")
        .parquet(out_dir)
    )
    return shard_manifest(df, num_shards, id_col, text_col, hasher)
