"""Shard writer: deterministic assignment, balanced parquet output,
manifest parity (pipeline/writer.py)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from flink_streaming_2_10_spark.catalog import load_table
from flink_streaming_2_10_spark.pipeline.writer import (
    assign_shards,
    shard_manifest,
    write_training_shards,
)

SF_DIR = "/root/testdata/sf0.001"


def test_assignment_deterministic_and_in_range(spark):
    docs = load_table(spark, SF_DIR, "documents")
    a = assign_shards(docs, 8).select("doc_id", "shard")
    b = assign_shards(docs, 8).select("doc_id", "shard")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    bounds = a.agg(F.min("shard"), F.max("shard")).collect()[0]
    assert bounds[0] >= 0 and bounds[1] <= 7


def test_assignment_is_reasonably_balanced(spark):
    docs = load_table(spark, SF_DIR, "documents")
    sizes = [
        r["n"]
        for r in assign_shards(docs, 8)
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    n = docs.count()
    assert len(sizes) == 8
    # md5-uniform over 500 docs: every shard within 3x of the mean
    assert max(sizes) <= 3 * n / 8 and min(sizes) >= n / 8 / 3


def test_write_round_trips_and_orders_within_shards(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    out = str(tmp_path / "shards")
    manifest = write_training_shards(docs, out, num_shards=4)

    # one directory per shard, all input rows present exactly once
    dirs = sorted(d for d in os.listdir(out) if d.startswith("shard="))
    assert dirs == [f"shard={k}" for k in range(4)]
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    assert back.select("doc_id").distinct().count() == docs.count()

    # shard column in the files matches the deterministic assignment
    expected = assign_shards(docs, 4).select("doc_id", "shard")
    mismatch = (
        back.select("doc_id", "shard")
        .exceptAll(expected)
        .count()
    )
    assert mismatch == 0

    # each shard file is sorted by doc_id
    for k in range(4):
        ids = [
            r["doc_id"]
            for r in spark.read.parquet(f"{out}/shard={k}").select("doc_id").collect()
        ]
        # parquet preserves row order within the single part file
        assert ids == sorted(ids)

    # returned manifest agrees with the standalone manifest op
    m2 = shard_manifest(docs, 4)
    assert manifest.exceptAll(m2).count() == 0


def test_manifest_query_matches_oracle(spark, duck):
    import __spark_entry__ as entrymod
    from tests.conftest import SF_SMALL, assert_df_matches_oracle

    got = entrymod.queries()["shard_manifest"](spark, SF_SMALL)
    assert_df_matches_oracle(got, duck, entrymod.oracle_sql()["shard_manifest"])
    totals = got.agg(F.sum("n_docs")).collect()[0][0]
    assert totals == load_table(spark, SF_SMALL, "documents").count()


def test_num_shards_validation(spark):
    docs = load_table(spark, SF_DIR, "documents")
    with pytest.raises(ValueError, match="num_shards"):
        assign_shards(docs, 0)


def test_bucketed_tables_join_without_exchange(spark, tmp_path):
    """Two tables bucketed identically on the join key must join with
    ZERO exchanges — the scan's bucket layout satisfies the join's
    partitioning requirement, which is the entire point of paying the
    bucketed write (repeated 100 TB joins become shuffle-free)."""
    import contextlib
    import io

    from flink_streaming_2_10_spark.pipeline.writer import (
        write_bucketed_table,
    )

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(500)], ["doc_id", "text"]
    )
    feats = spark.createDataFrame(
        [(i, i * 10) for i in range(0, 500, 2)], ["doc_id", "score"]
    )
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        write_bucketed_table(
            docs, "bt_docs", str(tmp_path / "d"), "doc_id", 4, sort_col="doc_id"
        )
        write_bucketed_table(feats, "bt_feats", str(tmp_path / "f"), "doc_id", 4)
        # Disable auto-broadcast: these test tables are KBs, so the planner
        # would broadcast and hide the property under test — at the scale
        # bucketing targets, neither side is broadcastable by definition.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("bt_docs").join(spark.table("bt_feats"), "doc_id")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "Exchange" not in plan, plan  # bucket layout == join layout
        assert "Bucketed: true" in plan, plan
        rows = {r["doc_id"]: r["score"] for r in joined.collect()}
        assert len(rows) == 250 and rows[4] == 40
        # validation: bad bucket count refuses
        with pytest.raises(ValueError, match="num_buckets"):
            write_bucketed_table(docs, "bt_bad", str(tmp_path / "x"), "doc_id", 0)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.sql("DROP TABLE IF EXISTS bt_docs")
        spark.sql("DROP TABLE IF EXISTS bt_feats")


def test_curriculum_order_within_shards(spark, tmp_path):
    from pyspark.sql import functions as F

    from flink_streaming_2_10_spark.pipeline.writer import (
        write_training_shards,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i}", float((i * 37) % 100)) for i in range(200)],
        "doc_id long, text string, difficulty double",
    )
    out = str(tmp_path / "shards")
    write_training_shards(
        docs, out, num_shards=4, order_col="difficulty"
    )
    import glob

    import pandas as pd
    import pyarrow.parquet as pq

    for shard_dir in glob.glob(f"{out}/shard=*"):
        frames = [
            pq.read_table(f).to_pandas()
            for f in sorted(glob.glob(f"{shard_dir}/*.parquet"))
        ]
        got = pd.concat(frames, ignore_index=True)
        # File order IS curriculum order: difficulty ascending, doc_id
        # as the tie-break.
        keys = list(zip(got["difficulty"], got["doc_id"]))
        assert keys == sorted(keys), shard_dir


def test_append_warns_on_unrelated_table_location(spark, tmp_path):
    """An append whose passed path differs from the existing table's
    catalog location — with NO recorded generation lineage — must warn:
    a stale same-named table from an unrelated build would otherwise
    silently swallow the append."""
    import warnings

    from flink_streaming_2_10_spark.pipeline.writer import (
        write_bucketed_table,
    )

    df = spark.createDataFrame([(i, i) for i in range(20)], ["doc_id", "v"])
    try:
        write_bucketed_table(df, "bt_warn", str(tmp_path / "orig"), "doc_id", 2)
        with pytest.warns(UserWarning, match="not a recorded prior generation"):
            write_bucketed_table(
                df, "bt_warn", str(tmp_path / "elsewhere"), "doc_id", 2,
                mode="append",
            )
        # behavior unchanged: the append landed at the table's location
        assert spark.table("bt_warn").count() == 40
        # same-path append stays silent
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            write_bucketed_table(
                df, "bt_warn", str(tmp_path / "orig"), "doc_id", 2,
                mode="append",
            )
        assert spark.table("bt_warn").count() == 60
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_warn")


def test_append_after_compaction_is_silent_across_generations(
    spark, tmp_path
):
    """The intended generation-swap case: an ingest face keeps passing
    the ORIGINAL creation path; after one and after TWO compactions the
    redirect must stay silent (lineage is recorded in TBLPROPERTIES),
    and the appends land in the current generation."""
    import warnings

    from flink_streaming_2_10_spark.pipeline.writer import (
        PREV_PATHS_PROP,
        _table_properties,
        compact_bucketed_table,
        write_bucketed_table,
    )

    p0, p1, p2 = (str(tmp_path / g) for g in ("g0", "g1", "g2"))
    df = spark.createDataFrame([(i, i) for i in range(20)], ["doc_id", "v"])
    try:
        write_bucketed_table(df, "bt_gen", p0, "doc_id", 2)
        compact_bucketed_table(spark, "bt_gen", p0, p1, "doc_id", 2)
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            write_bucketed_table(df, "bt_gen", p0, "doc_id", 2, mode="append")
        assert spark.table("bt_gen").count() == 40
        compact_bucketed_table(spark, "bt_gen", p1, p2, "doc_id", 2)
        # original path is TWO generations back — still recorded, silent
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            write_bucketed_table(df, "bt_gen", p0, "doc_id", 2, mode="append")
        assert spark.table("bt_gen").count() == 60
        lineage = _table_properties(spark, "bt_gen")[PREV_PATHS_PROP]
        assert p0 in lineage and p1 in lineage
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_gen")


def test_lineage_round_trips_commas_and_quotes(spark, tmp_path):
    """Lineage is a JSON array in TBLPROPERTIES: a generation path
    containing a comma (legal in a filesystem path) must survive the
    record/parse round-trip — the legacy comma-joined encoding split it
    into two bogus entries and warned spuriously on the next append."""
    import warnings

    from flink_streaming_2_10_spark.pipeline.writer import (
        PREV_PATHS_PROP,
        _decode_prev_paths,
        _table_properties,
        compact_bucketed_table,
        write_bucketed_table,
    )

    p0 = str(tmp_path / "gen,zero")
    p1 = str(tmp_path / "gen,one")
    p2 = str(tmp_path / "g2")
    df = spark.createDataFrame([(i, i) for i in range(10)], ["doc_id", "v"])
    try:
        write_bucketed_table(df, "bt_comma", p0, "doc_id", 2)
        compact_bucketed_table(spark, "bt_comma", p0, p1, "doc_id", 2)
        compact_bucketed_table(spark, "bt_comma", p1, p2, "doc_id", 2)
        recorded = _decode_prev_paths(
            _table_properties(spark, "bt_comma")[PREV_PATHS_PROP]
        )
        assert recorded == [p0, p1]
        # appends through either prior generation stay silent
        for prior in (p0, p1):
            with warnings.catch_warnings():
                warnings.simplefilter("error")
                write_bucketed_table(
                    df, "bt_comma", prior, "doc_id", 2, mode="append"
                )
        assert spark.table("bt_comma").count() == 30
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_comma")


def test_lineage_round_trips_quotes_and_backslashes_via_sql(
    spark, tmp_path
):
    """Quote/backslash lineage must survive the ACTUAL Spark SQL
    TBLPROPERTIES write, not just the JSON encoder: Spark SQL processes
    C-style backslash escapes inside string literals, so a path with a
    double quote (JSON-encoded as ``\\"``) or a literal backslash was
    corrupted by the old single-quote-only escaping — json.loads then
    failed and _decode_prev_paths degraded to a garbage comma-split,
    warning spuriously on the next append. Regression for the r15
    ADVICE finding (writer.py lineage literal escaping)."""
    import warnings

    from flink_streaming_2_10_spark.pipeline.writer import (
        PREV_PATHS_PROP,
        _decode_prev_paths,
        _table_properties,
        compact_bucketed_table,
        write_bucketed_table,
    )

    # Hostile-but-Hadoop-legal names: a DOUBLE QUOTE is the trigger —
    # JSON encodes it as \" so the old single-quote-only escaping let
    # Spark SQL consume the backslash and corrupt the stored JSON. (A
    # literal backslash in the path itself is rejected by Hadoop's Path
    # long before lineage matters, so that case is covered at the
    # property-value level in test_sql_str_lit_spark_roundtrip.)
    p0 = str(tmp_path / 'gen"zero')
    p1 = str(tmp_path / "gen'one\"x")
    p2 = str(tmp_path / "g2")
    df = spark.createDataFrame([(i, i) for i in range(10)], ["doc_id", "v"])
    try:
        write_bucketed_table(df, "bt_esc", p0, "doc_id", 2)
        compact_bucketed_table(spark, "bt_esc", p0, p1, "doc_id", 2)
        compact_bucketed_table(spark, "bt_esc", p1, p2, "doc_id", 2)
        recorded = _decode_prev_paths(
            _table_properties(spark, "bt_esc")[PREV_PATHS_PROP]
        )
        assert recorded == [p0, p1]
        # appends through either prior generation stay silent — the
        # spurious-warning symptom of the corrupted-JSON bug
        for prior in (p0, p1):
            with warnings.catch_warnings():
                warnings.simplefilter("error")
                write_bucketed_table(
                    df, "bt_esc", prior, "doc_id", 2, mode="append"
                )
        assert spark.table("bt_esc").count() == 30
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_esc")


def test_sql_str_lit_spark_roundtrip(spark, tmp_path):
    """_sql_str_lit survives the ACTUAL Spark SQL parser for every
    escape-relevant character class: backslash, double quote, single
    quote, and their JSON encodings. The old ``.replace("'", "''")``
    demonstrably corrupted the backslash cases (Spark SQL C-style
    escapes unescape them); a value-level round trip through SET
    TBLPROPERTIES is the direct proof, independent of what Hadoop's
    Path layer happens to accept as a filename."""
    import json

    from flink_streaming_2_10_spark.pipeline.writer import (
        _decode_prev_paths,
        _encode_prev_paths,
        _sql_str_lit,
        _table_properties,
        write_bucketed_table,
    )

    hostile = ["/a/back\\slash", '/b/say "hi"', "/c/it's", "/d/mix\\'\""]
    payload = _encode_prev_paths(hostile)
    df = spark.createDataFrame([(1, 1)], ["doc_id", "v"])
    try:
        write_bucketed_table(
            df, "bt_lit", str(tmp_path / "lit"), "doc_id", 2
        )
        spark.sql(
            "ALTER TABLE bt_lit SET TBLPROPERTIES "
            f"('roundtrip.probe' = '{_sql_str_lit(payload)}')"
        )
        stored = _table_properties(spark, "bt_lit")["roundtrip.probe"]
        assert stored == payload  # byte-exact through the SQL parser
        assert json.loads(stored) == hostile
        assert _decode_prev_paths(stored) == hostile
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_lit")


def test_decode_prev_paths_json_and_legacy():
    """JSON lineage round-trips commas and quotes exactly; the pre-r15
    comma-joined form still parses best-effort; junk degrades to the
    legacy split instead of raising."""
    from flink_streaming_2_10_spark.pipeline.writer import (
        _decode_prev_paths,
        _encode_prev_paths,
    )

    awkward = ["/a/gen,zero", "/b/it's here", '/c/say "hi"']
    assert _decode_prev_paths(_encode_prev_paths(awkward)) == awkward
    assert _decode_prev_paths("") == []
    assert _decode_prev_paths("/a/g0,/a/g1") == ["/a/g0", "/a/g1"]
    # JSON that is not a list of strings degrades to the legacy split
    assert _decode_prev_paths("42") == ["42"]


def test_compaction_safe_under_open_reader(spark, tmp_path):
    """The generation-swap safety claim, exercised with a READER HELD
    OPEN across the swap: a toLocalIterator started on the old
    generation before compaction finishes cleanly after it (old files
    are never deleted by the swap), a pre-swap DataFrame plan collects
    correctly post-swap, and the first post-swap probe through the
    table name reads the new generation."""
    from flink_streaming_2_10_spark.pipeline.writer import (
        _norm_location,
        _table_location,
        compact_bucketed_table,
        write_bucketed_table,
    )

    p0, p1 = str(tmp_path / "g0"), str(tmp_path / "g1")
    df = spark.createDataFrame([(i, i * 7) for i in range(3000)], ["doc_id", "v"])
    try:
        write_bucketed_table(df, "bt_cr", p0, "doc_id", 4)
        # grow it so the scan spans several file sets
        write_bucketed_table(df.select(
            (df.doc_id + 10_000).alias("doc_id"), "v"), "bt_cr", p0,
            "doc_id", 4, mode="append")

        pre_swap_plan = spark.table("bt_cr")      # resolved pre-swap
        it = spark.table("bt_cr").toLocalIterator()
        first = next(it)                          # scan started, held open

        compact_bucketed_table(spark, "bt_cr", p0, p1, "doc_id", 4)

        # 1) the held-open reader finishes against the old generation
        rest = list(it)
        assert 1 + len(rest) == 6000
        # 2) a pre-swap plan still collects (old files untouched)
        assert pre_swap_plan.count() == 6000
        assert first is not None
        # 3) first post-swap probe via the name reads the new generation
        assert _norm_location(_table_location(spark, "bt_cr")).endswith("g1")
        assert spark.table("bt_cr").count() == 6000
        got = {r["doc_id"]: r["v"] for r in spark.table("bt_cr").collect()}
        assert got[42] == 294 and got[10_042] == 294
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_cr")
