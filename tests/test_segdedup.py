"""Corpus-level repeated-segment dedup (pipeline/segdedup.py) — the
C4/CCNet line & paragraph face, plus the per-doc Gopher line/paragraph
repetition gates (textstats.line_repetition_stats)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_streaming_2_10_spark.pipeline.segdedup import (
    repeated_segments,
    strip_repeated_segments,
)
from flink_streaming_2_10_spark.pipeline.textstats import (
    line_repetition_stats,
)

BANNER = "Accept all cookies to continue"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, f"unique alpha\n{BANNER}\nbody of doc one"),
            (2, f"{BANNER}\nbody of doc two\n{BANNER} "),
            (3, f"  {BANNER}\nbody of doc three\n\n   "),
            (4, "only original material here"),
            (5, ""),
        ],
        "doc_id long, text string",
    )


def _by_id(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


class TestCensus:
    def test_counts_total_and_doc_frequency(self, docs):
        rows = {
            r["segment"]: r.asDict()
            for r in repeated_segments(docs, min_count=2).collect()
        }
        # 4 occurrences (doc 2 has it twice), 3 distinct documents.
        assert rows == {
            BANNER: {"segment": BANNER, "n_total": 4, "n_docs": 3}
        }

    def test_min_count_excludes_unique_segments(self, docs):
        assert repeated_segments(docs, min_count=5).count() == 0

    def test_trim_and_empty_filter(self, spark):
        d = spark.createDataFrame(
            [(1, "  x  \n\n x\n   "), (2, "x")], "doc_id long, text string"
        )
        rows = repeated_segments(d, min_count=3).collect()
        assert len(rows) == 1 and rows[0]["n_total"] == 3

    def test_min_chars_gate(self, spark):
        d = spark.createDataFrame(
            [(1, "ab\nab\nlong line"), (2, "ab")],
            "doc_id long, text string",
        )
        assert (
            repeated_segments(d, min_count=2, min_chars=3).count() == 0
        )


class TestStrip:
    def test_keep_none_strips_every_occurrence(self, docs):
        out = _by_id(strip_repeated_segments(docs, min_count=3, keep="none"))
        assert out[1]["text"] == "unique alpha\nbody of doc one"
        assert out[2]["text"] == "body of doc two"
        assert out[3]["text"] == "body of doc three"
        assert out[2]["n_removed"] == 2
        assert out[4] == {
            "doc_id": 4,
            "n_segments": 1,
            "n_removed": 0,
            "text": "only original material here",
        }
        assert out[5]["text"] == "" and out[5]["n_segments"] == 0

    def test_keep_first_keeps_globally_first_occurrence(self, docs):
        out = _by_id(
            strip_repeated_segments(docs, min_count=3, keep="first")
        )
        # Keeper is the smallest (doc_id, pos): doc 1, pos 2.
        assert BANNER in out[1]["text"] and out[1]["n_removed"] == 0
        assert BANNER not in out[2]["text"] and out[2]["n_removed"] == 2
        assert BANNER not in out[3]["text"]

    def test_keeper_duplicate_within_same_doc_still_dropped(self, spark):
        d = spark.createDataFrame(
            [(1, "dup\nmiddle\ndup"), (2, "dup")],
            "doc_id long, text string",
        )
        out = _by_id(strip_repeated_segments(d, min_count=3, keep="first"))
        assert out[1]["text"] == "dup\nmiddle"  # pos 3 dropped, pos 1 kept
        assert out[2]["text"] == "" and out[2]["n_removed"] == 1

    def test_below_threshold_untouched(self, docs):
        out = _by_id(strip_repeated_segments(docs, min_count=5))
        assert all(r["n_removed"] == 0 for r in out.values())
        assert BANNER in out[2]["text"]

    def test_md5_hasher_parity_with_xxhash(self, docs):
        a = _by_id(strip_repeated_segments(docs, min_count=3, keep="none"))
        b = _by_id(
            strip_repeated_segments(
                docs, min_count=3, keep="none", hasher="md5"
            )
        )
        assert a == b

    def test_no_persist_path_identical(self, docs):
        a = _by_id(strip_repeated_segments(docs, min_count=3))
        b = _by_id(
            strip_repeated_segments(docs, min_count=3, persist_postings=False)
        )
        assert a == b

    def test_whitespace_delimiter_token_face(self, spark):
        d = spark.createDataFrame(
            [(1, "the cat the dog"), (2, "the end")],
            "doc_id long, text string",
        )
        out = _by_id(
            strip_repeated_segments(
                d,
                delimiter="\\s+",
                joiner=" ",
                min_count=3,
                keep="first",
            )
        )
        assert out[1]["text"] == "the cat dog"
        assert out[2]["text"] == "end"

    def test_flood_linear_fanout(self, spark):
        # One banner in 300 docs: every copy beyond the first stripped,
        # distinct bodies untouched.
        d = spark.createDataFrame(
            [(i, f"{BANNER}\nbody {i}") for i in range(300)],
            "doc_id long, text string",
        )
        out = strip_repeated_segments(d, min_count=3, keep="first")
        removed = out.agg(F.sum("n_removed")).collect()[0][0]
        assert removed == 299
        kept = out.filter(F.col("text").contains(BANNER))
        assert kept.count() == 1 and kept.collect()[0]["doc_id"] == 0

    def test_invalid_args(self, docs):
        with pytest.raises(ValueError):
            strip_repeated_segments(docs, keep="last")
        with pytest.raises(ValueError):
            strip_repeated_segments(docs, min_count=1)


class TestNewlineFaceOracleParity:
    def test_strip_matches_duckdb_on_planted_newline_corpus(
        self, spark, docs
    ):
        """The driver corpus is newline-free, so the registered query
        exercises the whitespace face; this pins the '\\n' C4 face
        against an independent DuckDB replay on planted fixtures."""
        import duckdb

        got = strip_repeated_segments(
            docs, min_count=3, keep="first", hasher="md5"
        )
        con = duckdb.connect()
        con.register("docs", docs.toPandas())
        expect = con.sql(
            r"""
            WITH segs AS (SELECT doc_id,
                     list_filter(list_transform(
                         regexp_split_to_array(text, '\n'),
                         s -> trim(s)), s -> length(s) >= 1) AS segs
                 FROM docs),
            pst AS (SELECT doc_id, s.pos AS pos, s.h AS h
                    FROM (SELECT doc_id,
                             unnest(list_transform(range(1, len(segs)+1),
                               i -> {'pos': i,
                                     'h': ('0x' || substr(md5(segs[i]),
                                           1, 15))::BIGINT})) AS s
                          FROM segs)),
            rk AS (SELECT doc_id, pos,
                      row_number() OVER (PARTITION BY h
                                         ORDER BY doc_id, pos) AS rn,
                      count(*) OVER (PARTITION BY h) AS n
                   FROM pst),
            da AS (SELECT doc_id, list(pos) AS dropped
                   FROM rk WHERE n >= 3 AND rn > 1 GROUP BY doc_id)
            SELECT s.doc_id,
                   CAST(len(s.segs) AS BIGINT) AS n_segments,
                   CAST(coalesce(len(da.dropped), 0) AS BIGINT)
                     AS n_removed,
                   coalesce(array_to_string(list_transform(
                       list_filter(range(1, len(s.segs) + 1),
                           i -> NOT list_contains(
                                   coalesce(da.dropped, []), i)),
                       i -> s.segs[i]), chr(10)), '') AS text
            FROM segs s LEFT JOIN da ON da.doc_id = s.doc_id
            """
        ).df()
        a = {r["doc_id"]: r.asDict() for r in got.collect()}
        b = {
            int(r.doc_id): {
                "doc_id": int(r.doc_id),
                "n_segments": int(r.n_segments),
                "n_removed": int(r.n_removed),
                "text": r.text,
            }
            for r in expect.itertuples()
        }
        assert a == b
        con.close()


class TestIncrementalCensus:
    @staticmethod
    def _batches(spark):
        return [
            spark.createDataFrame(rows, "doc_id long, text string")
            for rows in (
                [(1, f"{BANNER}\nbody one"), (2, "unique two")],
                [(3, f"{BANNER}\nbody three"), (4, f"{BANNER}\nbody four")],
                [(5, f"{BANNER}\nbody five"), (6, "unique six")],
            )
        ]

    def test_three_pass_parity_with_batch_operator(self, spark, tmp_path):
        from flink_streaming_2_10_spark.pipeline.segdedup import (
            segdedup_ingest_batch,
        )

        census = str(tmp_path / "census")
        out = str(tmp_path / "out")
        on_batch = segdedup_ingest_batch(
            spark, census, out, min_count=3, keep="first"
        )
        batches = self._batches(spark)
        for i, b in enumerate(batches):
            on_batch(b, i)
        got = {
            r["doc_id"]: r.asDict()
            for r in spark.read.parquet(out).collect()
        }
        union = batches[0]
        for b in batches[1:]:
            union = union.unionByName(b)
        expect = {
            r["doc_id"]: r.asDict()
            for r in strip_repeated_segments(
                union, min_count=3, keep="first"
            ).collect()
        }
        # doc ids increase across passes, so the global keeper (doc 1)
        # is already final when later passes strip — incremental ==
        # batch replay on every document.
        assert got == expect
        # The banner crossed min_count in pass 2: docs 3 and 4 stripped.
        assert BANNER not in got[3]["text"]
        assert BANNER not in got[4]["text"]
        assert BANNER not in got[5]["text"]
        # Keeper (pass-1 doc) was written before the count crossed the
        # threshold — the documented streaming asymmetry keeps it, which
        # here coincides with keep='first' batch semantics.
        assert BANNER in got[1]["text"]

    def test_cross_pass_repeat_of_old_segment_caught(self, spark, tmp_path):
        from flink_streaming_2_10_spark.pipeline.segdedup import (
            segdedup_ingest_batch,
        )

        census = str(tmp_path / "census")
        out = str(tmp_path / "out")
        on_batch = segdedup_ingest_batch(
            spark, census, out, min_count=2, keep="none"
        )
        on_batch(
            spark.createDataFrame(
                [(1, "old boilerplate\nfresh one")],
                "doc_id long, text string",
            ),
            0,
        )
        on_batch(
            spark.createDataFrame(
                [(2, "old boilerplate\nfresh two")],
                "doc_id long, text string",
            ),
            1,
        )
        got = {
            r["doc_id"]: r["text"]
            for r in spark.read.parquet(out).collect()
        }
        # Pass 2 sees the pass-1 segment through the census, not a
        # rescan; pass-1's own copy predates the threshold (asymmetry).
        assert got[2] == "fresh two"
        assert got[1] == "old boilerplate\nfresh one"

    def test_compaction_preserves_state(self, spark, tmp_path):
        from flink_streaming_2_10_spark.pipeline.segdedup import (
            _census_state,
            compact_segment_census,
            segdedup_ingest_batch,
        )

        census = str(tmp_path / "census")
        out = str(tmp_path / "out")
        on_batch = segdedup_ingest_batch(spark, census, out, min_count=3)
        for i, b in enumerate(self._batches(spark)):
            on_batch(b, i)
        before = {
            r["h"]: (r["n"], r["keeper_doc"], r["keeper_pos"])
            for r in _census_state(spark, census).collect()
        }
        compact_segment_census(spark, census)
        after = {
            r["h"]: (r["n"], r["keeper_doc"], r["keeper_pos"])
            for r in _census_state(spark, census).collect()
        }
        assert before == after
        # One aggregated delta now: every hash appears exactly once.
        log = spark.read.parquet(census)
        assert log.count() == log.select("h").distinct().count()


class TestLineRepetitionStats:
    def test_planted_fractions(self, spark):
        # 4 lines, 3 distinct ("dup" twice): dup_line_frac = 1/4;
        # chars 3+3+6+10=22, distinct chars 3+6+10=19 -> 3/22.
        d = spark.createDataFrame(
            [(1, "dup\ndup\nmiddle\nlong final"), (2, "")],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r.asDict() for r in
               line_repetition_stats(d).collect()}
        r1 = out[1]
        assert r1["n_lines"] == 4
        assert r1["dup_line_frac"] == 0.25
        assert r1["dup_line_char_frac"] == 3.0 / 22.0
        # One paragraph (no blank line separators) -> no para dupes.
        assert r1["n_paras"] == 1 and r1["dup_para_frac"] == 0.0
        r2 = out[2]
        assert r2["n_lines"] == 0 and r2["dup_line_frac"] == 0.0
        assert r2["dup_line_char_frac"] == 0.0

    def test_paragraph_granularity(self, spark):
        para = "repeated paragraph\nsecond line"
        d = spark.createDataFrame(
            [(1, f"{para}\n\n{para}\n\n\nunique tail")],
            "doc_id long, text string",
        )
        r = line_repetition_stats(d).collect()[0]
        assert r["n_paras"] == 3
        assert r["dup_para_frac"] == pytest.approx(1.0 / 3.0)
        # Lines: "repeated paragraph", "second line" twice each + tail.
        assert r["n_lines"] == 5 and r["dup_line_frac"] == 0.4


def test_census_rides_run_incremental_passes(spark, tmp_path):
    """The deployment shape: run_incremental (availableNow checkpoint)
    + segdedup_ingest_batch — pass 2 reads ONLY its new files yet its
    strip decisions see pass 1's segments through the persisted census."""
    from flink_streaming_2_10_spark.pipeline.segdedup import (
        segdedup_ingest_batch,
    )
    from flink_streaming_2_10_spark.streaming.runners import (
        run_incremental,
    )

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    census = str(tmp_path / "census")
    out = str(tmp_path / "out")
    on_batch = segdedup_ingest_batch(
        spark, census, out, min_count=2, keep="none"
    )

    def arrivals(rows):
        spark.createDataFrame(
            rows, "doc_id long, text string"
        ).write.mode("append").parquet(src)
        stream = spark.readStream.schema(
            "doc_id long, text string"
        ).parquet(src)
        run_incremental(stream, ckpt, on_batch)

    arrivals([(1, "shared banner\nfresh one")])
    arrivals([(2, "shared banner\nfresh two")])
    got = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(out).collect()
    }
    # Pass 2's copy of the pass-1 segment crosses min_count=2 via the
    # census and is stripped; pass 1 predates the threshold (documented
    # asymmetry) and the checkpoint guarantees it was never rescanned.
    assert got == {1: "shared banner\nfresh one", 2: "fresh two"}


def test_vertical_tab_splits_identically_in_both_engines(spark):
    """ADVICE r11: Java's \\s includes U+000B, RE2's does not — the
    registry delimiter is now the explicit class so DuckDB and Spark
    split identically even on a vertical tab. Pin both engines on a
    planted \\x0B corpus."""
    import duckdb

    from flink_streaming_2_10_spark.pipeline.segdedup import (
        repeated_segments,
    )

    text = "alpha\x0bbeta gamma\x0bbeta"
    docs = spark.createDataFrame(
        [(1, text), (2, text)], "doc_id long, text string"
    )
    got = {
        (r["segment"], r["n_total"], r["n_docs"])
        for r in repeated_segments(
            docs, delimiter="[ \\t\\n\\x0B\\f\\r]+", min_count=2
        ).collect()
    }
    con = duckdb.connect()
    # DuckDB string literals keep backslashes raw; RE2 parses the escapes
    pat = "[ \\t\\n\\x0B\\f\\r]+"
    want = {
        tuple(r)
        for r in con.execute(
            f"""
            WITH d(doc_id, text) AS (VALUES (1, ?), (2, ?)),
            e AS (SELECT doc_id,
                         unnest(list_filter(list_transform(
                             regexp_split_to_array(text, '{pat}'),
                             s -> trim(s)), s -> length(s) >= 1))
                           AS segment
                  FROM d)
            SELECT segment, count(*), count(DISTINCT doc_id)
            FROM e GROUP BY segment HAVING count(*) >= 2
            """,
            [text, text],
        ).fetchall()
    }
    assert got == want
    # beta appears twice per doc across the \x0B boundary: 4 total.
    assert ("beta", 4, 2) in got


class TestIngestAutoCompaction:
    def test_compact_every_preserves_three_pass_parity(self, spark, tmp_path):
        """compact_every=2 on the segdedup ingest face: the census log is
        compacted to one aggregated delta after batch 2, batch 3 strips
        against the COMPACTED state, and the output is identical to the
        uncompacted run (mergeable-state property, now exercised through
        the auto-compaction hook)."""
        import os

        from flink_streaming_2_10_spark.pipeline.segdedup import (
            segdedup_ingest_batch,
        )

        batches = TestIncrementalCensus._batches(spark)

        def run(tag: str, **kw) -> dict:
            census = str(tmp_path / f"census_{tag}")
            out = str(tmp_path / f"out_{tag}")
            on_batch = segdedup_ingest_batch(
                spark, census, out, min_count=3, keep="first", **kw
            )
            for i, b in enumerate(batches):
                on_batch(b, i)
            files = [
                f for f in os.listdir(census) if f.endswith(".parquet")
            ]
            return {
                "rows": {
                    r["doc_id"]: r["text"]
                    for r in spark.read.parquet(out).collect()
                },
                "census_files": len(files),
            }

        base = run("plain")
        compacted = run("auto", compact_every=2)
        assert compacted["rows"] == base["rows"]
        # plain: one delta file-set per batch; auto: batch-1 and batch-2
        # deltas collapsed by the swap, batch-3 delta appended after
        assert compacted["census_files"] < base["census_files"]

    def test_compact_every_validation(self, spark, tmp_path):
        from flink_streaming_2_10_spark.pipeline.segdedup import (
            segdedup_ingest_batch,
        )

        with pytest.raises(ValueError, match="compact_every"):
            segdedup_ingest_batch(
                spark, str(tmp_path / "c"), str(tmp_path / "o"),
                compact_every=0,
            )
