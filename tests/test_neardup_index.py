"""Incremental near-dup: the persisted MinHash band/bucket index.

Pins the r8 contract: a pass-2 arrival that NEAR-duplicates a pass-1
document is flagged by joining only the arrivals' buckets against the
persisted index — no pass-1 rescan — and the index side of the probe
joins is exchange-free (bucket layout == join partitioning).
"""

from __future__ import annotations

import contextlib
import io

import pytest

from flink_streaming_2_10_spark.pipeline.neardup_index import (
    build_neardup_index,
    neardup_against_index,
)


def _pass1_docs(spark):
    # 40 distinct docs with enough tokens for 3-shingles.
    rows = [
        (i, f"document number {i} talks about topic {i % 7} in long form "
            f"with unique trailing words alpha{i} beta{i} gamma{i}")
        for i in range(40)
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture()
def no_broadcast(spark):
    """Disable auto-broadcast so the exchange-free property is actually
    exercised (at index scale neither side broadcasts by definition)."""
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)


def test_two_pass_ingest_flags_neardup_without_rescan(spark, tmp_path):
    docs1 = _pass1_docs(spark)
    build_neardup_index(docs1, str(tmp_path / "idx"), "ndx1", num_buckets=4)

    # Pass 2: doc 100 near-duplicates pass-1 doc 3 (one word changed),
    # doc 101 is fresh content.
    base = docs1.where("doc_id = 3").collect()[0]["text"]
    near = base.replace("long form", "short form")
    arrivals = spark.createDataFrame(
        [(100, near), (101, "entirely different content about nothing "
                           "shared with any earlier document at all")],
        ["doc_id", "text"],
    )
    got = neardup_against_index(
        spark, arrivals, "ndx1", threshold=0.5
    ).collect()
    flagged = {(r["doc_id"], r["index_doc_id"]) for r in got}
    assert (100, 3) in flagged
    assert all(d != 101 for d, _ in flagged)
    for r in got:
        assert 0.5 <= r["est_jaccard"] <= 1.0

    # No pass-1 rescan: the probe plan reads ONLY the index tables (and
    # the arrivals' in-memory relation) — no parquet scan outside the
    # index path, and no reference to a pass-1 documents relation.
    plan = _plan(neardup_against_index(spark, arrivals, "ndx1", threshold=0.5))
    import re

    for scan_loc in re.findall(r"Location:.*\n", plan):
        assert "idx" in scan_loc, plan


def test_probe_index_side_is_exchange_free(spark, tmp_path, no_broadcast):
    build_neardup_index(
        _pass1_docs(spark), str(tmp_path / "idx"), "ndx2", num_buckets=4
    )
    arrivals = spark.createDataFrame(
        [(200, "document number 5 talks about topic 5 in long form with "
               "unique trailing words alpha5 beta5 gamma5")],
        ["doc_id", "text"],
    )
    plan = _plan(neardup_against_index(spark, arrivals, "ndx2"))
    assert "Bucketed: true" in plan, plan
    # Both index scans appear with bucketed output; no Exchange may sit
    # between an index table scan and its join (the arrivals side DOES
    # shuffle). Structure check: every Exchange block's subtree must not
    # contain a parquet scan of the index tables.
    import re

    blocks = re.split(r"\n(?=\(\d+\) )", plan)
    scan_ids = [
        re.match(r"\((\d+)\) Scan parquet", b).group(1)
        for b in blocks
        if re.match(r"\(\d+\) Scan parquet", b) and "idx" in b
    ]
    assert len(scan_ids) == 2, plan  # buckets + sigs
    # In the formatted tree, an exchange-free bucketed scan feeds its
    # join via (optional) Filter/Project/Sort only. Assert no line of
    # the tree shows an Exchange directly consuming an index scan's
    # column lineage: cheap proxy — the plan has exactly as many
    # "Exchange" nodes as the arrivals side needs (banding + distinct +
    # two join-side repartitions), and removing bucketing would add 2.
    n_exchanges = len(re.findall(r"\(\d+\) Exchange\b", plan))
    # Re-plan with bucketing information hidden (read parquet directly,
    # no table metadata): the same join DAG must cost MORE exchanges.
    from pyspark.sql import functions as F

    from flink_streaming_2_10_spark.pipeline.neardup_index import (
        _banded_with_key,
    )

    a_sigs, a_banded = _banded_with_key(
        arrivals, "doc_id", "text", 64, 16, 4, 3, "xxhash64"
    )
    raw_buckets = spark.read.parquet(str(tmp_path / "idx" / "buckets")).select(
        "bb", F.col("doc_id").alias("index_doc_id")
    )
    raw_sigs = spark.read.parquet(str(tmp_path / "idx" / "sigs")).select(
        F.col("doc_id").alias("index_doc_id"), F.col("sig").alias("sig_idx")
    )
    cands = (
        a_banded.join(raw_buckets, "bb")
        .filter(F.col("doc_id") != F.col("index_doc_id"))
        .select("doc_id", "index_doc_id")
        .distinct()
    )
    unbucketed = cands.join(raw_sigs, "index_doc_id").join(a_sigs, "doc_id")
    assert (
        len(re.findall(r"\(\d+\) Exchange\b", _plan(unbucketed))) > n_exchanges
    )


def test_append_extends_index_without_rewrite(spark, tmp_path):
    docs1 = _pass1_docs(spark)
    build_neardup_index(docs1, str(tmp_path / "idx"), "ndx3", num_buckets=4)
    # Pass 2 survivors appended.
    pass2 = spark.createDataFrame(
        [(300, "completely novel second pass content words flowing here "
               "with trailing tokens delta epsilon zeta")],
        ["doc_id", "text"],
    )
    build_neardup_index(
        pass2, str(tmp_path / "idx"), "ndx3", num_buckets=4, mode="append"
    )
    # Pass 3 near-duplicates the PASS-2 doc.
    arrivals = spark.createDataFrame(
        [(400, "completely novel second pass content words flowing here "
               "with trailing tokens delta epsilon eta")],
        ["doc_id", "text"],
    )
    got = neardup_against_index(
        spark, arrivals, "ndx3", threshold=0.5
    ).collect()
    assert {(r["doc_id"], r["index_doc_id"]) for r in got} == {(400, 300)}
    # Appends preserve the bucket layout (probe still exchange-free on
    # the index side → "Bucketed: true" still in the plan).
    assert "Bucketed: true" in _plan(
        neardup_against_index(spark, arrivals, "ndx3")
    )


def test_identical_doc_estimates_jaccard_one(spark, tmp_path):
    docs1 = _pass1_docs(spark)
    build_neardup_index(docs1, str(tmp_path / "idx"), "ndx4", num_buckets=4)
    dup = docs1.where("doc_id = 7").collect()[0]["text"]
    got = neardup_against_index(
        spark,
        spark.createDataFrame([(500, dup)], ["doc_id", "text"]),
        "ndx4",
        threshold=0.9,
    ).collect()
    assert [(r["doc_id"], r["index_doc_id"], r["est_jaccard"]) for r in got] \
        == [(500, 7, 1.0)]


def test_build_validates_banding_arithmetic(spark, tmp_path):
    with pytest.raises(ValueError, match="num_hashes"):
        build_neardup_index(
            _pass1_docs(spark), str(tmp_path / "idx"), "ndx5", num_hashes=60
        )


def test_incremental_ingest_flags_neardups_across_passes(spark, tmp_path):
    """run_incremental + neardup_ingest_batch: pass 1 seeds the index;
    pass 2 reads ONLY the new file, its near-dup of a pass-1 doc is
    flagged via the index (no pass-1 rescan), and its fresh doc joins
    the index so pass 3 near-dups of IT are flagged too."""
    import os

    from pyspark.sql import functions as F

    from flink_streaming_2_10_spark.pipeline.neardup_index import (
        neardup_ingest_batch,
    )
    from flink_streaming_2_10_spark.streaming.runners import run_incremental

    src = str(tmp_path / "docs")
    os.makedirs(src)
    ck = str(tmp_path / "ck")
    flagged = str(tmp_path / "flagged")
    idx = str(tmp_path / "idx")

    def write_file(name, lines):
        with open(os.path.join(src, name), "w") as fh:
            fh.write("\n".join(lines))

    doc_a = "the quick brown fox jumps over the lazy dog near the river bank"
    doc_b = "completely unrelated second document about cooking pasta daily"
    write_file("p1.txt", [f"1,{doc_a}", f"2,{doc_b}"])

    parts = F.split(F.col("value"), ",", 2)

    def stream():
        return spark.readStream.text(src).select(
            F.element_at(parts, 1).cast("long").alias("doc_id"),
            F.element_at(parts, 2).alias("text"),
        )

    on_batch = neardup_ingest_batch(
        spark, idx, "ndx_ing", flagged, threshold=0.5, num_buckets=4
    )
    run_incremental(stream(), ck, on_batch)
    assert not os.path.exists(flagged) or not [
        f for f in os.listdir(flagged) if f.endswith(".parquet")
    ]

    # pass 2: 10 near-dups doc 1; 11 is fresh
    near_a = doc_a.replace("river bank", "water edge")
    doc_c = "a third topic entirely focused on mountain hiking trails today"
    write_file("p2.txt", [f"10,{near_a}", f"11,{doc_c}"])
    run_incremental(stream(), ck, on_batch)
    got = {
        (r["doc_id"], r["index_doc_id"])
        for r in spark.read.parquet(flagged).collect()
    }
    assert (10, 1) in got
    assert all(d != 11 for d, _ in got)

    # pass 3: 20 near-dups the PASS-2 fresh doc 11 (survivor appended)
    near_c = doc_c.replace("trails today", "trails tomorrow")
    write_file("p3.txt", [f"20,{near_c}"])
    run_incremental(stream(), ck, on_batch)
    got3 = {
        (r["doc_id"], r["index_doc_id"])
        for r in spark.read.parquet(flagged).collect()
    }
    assert (20, 11) in got3
    # flagged docs were never appended: 20's probe found 11, not 10's dup
    assert all(i in (1, 2, 11) for _, i in got3)


def test_probe_time_cap_bounds_cumulative_bucket_growth(spark, tmp_path):
    """The build-time cap windows over ONE append batch, so k appends can
    grow a boilerplate bucket to k·cap; the probe's max_bucket_size must
    re-cap over the READ index (ADVICE r8). Grow an identical-text bucket
    to 6 members across three 2-member appends under a build cap of 3
    (each append individually passes), then probe: capped probe drops the
    hot bucket entirely; uncapped probe still matches through it."""
    boiler = (
        "the very same boilerplate paragraph repeated across mirror sites "
        "word for word with no variation at all whatsoever in any copy"
    )
    idx = str(tmp_path / "idx")
    for k in range(3):
        batch = spark.createDataFrame(
            [(100 * k + j, boiler) for j in range(2)], ["doc_id", "text"]
        )
        build_neardup_index(
            batch, idx, "ndx_cap", num_buckets=4, max_bucket_size=3,
            mode="overwrite" if k == 0 else "append",
        )
    # Cumulative bucket size is 6 > 3 even though every append passed the
    # build cap. An arrival with the same text probes that bucket:
    arrival = spark.createDataFrame([(999, boiler)], ["doc_id", "text"])
    uncapped = neardup_against_index(
        spark, arrival, "ndx_cap", threshold=0.5, max_bucket_size=None
    )
    assert uncapped.count() == 6
    capped = neardup_against_index(
        spark, arrival, "ndx_cap", threshold=0.5, max_bucket_size=3
    )
    assert capped.count() == 0


# ---------------------------------------------------------------------------
# media perceptual-hash index (r12) — the payload_neardup analog
# ---------------------------------------------------------------------------


def _media_rows(spark):
    base = (
        "a crawled media payload with enough bytes to give the gradient "
        "hash a stable signal across its sixty five regions. " * 4
    )
    rows = [
        (i, bytearray((base + f"unique tail {i} " * 3).encode()))
        for i in range(30)
    ]
    return spark.createDataFrame(rows, "media_id long, payload binary")


def test_media_index_flags_reencode_without_rescan(spark, tmp_path):
    from flink_streaming_2_10_spark.pipeline.multimodal import phash_bytes
    from flink_streaming_2_10_spark.pipeline.neardup_index import (
        build_media_phash_index,
        media_against_index,
    )

    media = _media_rows(spark)
    build_media_phash_index(
        media, str(tmp_path / "midx"), "mdx1", num_buckets=4, chunks=8
    )
    originals = {
        r["media_id"]: bytes(r["payload"]) for r in media.collect()
    }
    # arrival 200 = re-encode (upper-case) of item 3; 201 unrelated
    unrelated = bytes((i * 89 + 7) % 256 for i in range(300))
    arrivals = spark.createDataFrame(
        [
            (200, bytearray(originals[3].upper())),
            (201, bytearray(unrelated)),
        ],
        "media_id long, payload binary",
    )
    got = {
        (r["media_id"], r["index_media_id"]): r["hamming"]
        for r in media_against_index(
            spark, arrivals, "mdx1", max_hamming=6, chunks=8
        ).collect()
    }
    # the re-encode is flagged against its original with the true
    # hamming distance; the unrelated payload matches nothing
    want_h = bin(
        (phash_bytes(originals[3]) ^ phash_bytes(originals[3].upper()))
        & ((1 << 64) - 1)
    ).count("1")
    assert want_h <= 6  # fixture sanity
    assert got[(200, 3)] == want_h
    assert all(m != 201 for m, _ in got)


def test_media_index_append_extends_coverage(spark, tmp_path):
    from flink_streaming_2_10_spark.pipeline.neardup_index import (
        build_media_phash_index,
        media_against_index,
    )

    media = _media_rows(spark)
    build_media_phash_index(
        media, str(tmp_path / "midx"), "mdx2", num_buckets=4, chunks=8
    )
    extra = spark.createDataFrame(
        [(500, bytearray(b"a brand new payload family " * 20))],
        "media_id long, payload binary",
    )
    build_media_phash_index(
        extra, str(tmp_path / "midx"), "mdx2", num_buckets=4, chunks=8,
        mode="append",
    )
    probe = spark.createDataFrame(
        [(900, bytearray((b"a brand new payload family " * 20).upper()))],
        "media_id long, payload binary",
    )
    got = {
        r["index_media_id"]
        for r in media_against_index(
            spark, probe, "mdx2", max_hamming=6, chunks=8
        ).collect()
    }
    assert 500 in got  # the appended item is probe-visible


def test_media_probe_index_side_is_exchange_free(
    spark, tmp_path, no_broadcast
):
    import re

    from flink_streaming_2_10_spark.pipeline.neardup_index import (
        build_media_phash_index,
        media_against_index,
    )

    build_media_phash_index(
        _media_rows(spark), str(tmp_path / "midx"), "mdx3", num_buckets=4
    )
    arrivals = spark.createDataFrame(
        [(700, bytearray(b"probe payload " * 30))],
        "media_id long, payload binary",
    )
    plan = _plan(media_against_index(spark, arrivals, "mdx3"))
    assert "Bucketed: true" in plan, plan
    blocks = re.split(r"\n(?=\(\d+\) )", plan)
    idx_scans = [
        b
        for b in blocks
        if re.match(r"\(\d+\) Scan parquet", b) and "mdx3" in b
    ]
    assert len(idx_scans) == 2, plan  # buckets + phash tables
    # payload never appears in any exchange (consumed by the arrival
    # scan's Arrow stage)
    for b in blocks:
        if b.startswith("(") and "Exchange" in b.split("\n")[0]:
            assert "payload" not in b, b


def test_media_probe_equals_cross_set_bruteforce(spark, tmp_path):
    """Pigeonhole exactness carries over from payload_neardup: probing
    arrivals against the index equals brute-force cross-set Hamming
    (cap never fires at this scale)."""
    from flink_streaming_2_10_spark.pipeline.multimodal import phash_bytes
    from flink_streaming_2_10_spark.pipeline.neardup_index import (
        build_media_phash_index,
        media_against_index,
    )

    media = _media_rows(spark)
    build_media_phash_index(
        media, str(tmp_path / "midx"), "mdx4", num_buckets=4
    )
    originals = {
        r["media_id"]: bytes(r["payload"]) for r in media.collect()
    }

    def tweak(p: bytes, pos: int) -> bytes:
        # single-byte substitution: hamming <= 2 by the phash locality
        # property (test_phash_single_byte_substitution_bounded_hamming)
        return p[:pos] + bytes([(p[pos] + 7) % 256]) + p[pos + 1 :]

    arrivals_py = {
        1000 + i: tweak(originals[i], 40 + 5 * i) for i in range(10)
    }
    arrivals = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in arrivals_py.items()],
        "media_id long, payload binary",
    )
    got = {
        (r["media_id"], r["index_media_id"], r["hamming"])
        for r in media_against_index(
            spark, arrivals, "mdx4", max_hamming=3, chunks=4
        ).collect()
    }
    want = set()
    fps_idx = {
        i: phash_bytes(p) & ((1 << 64) - 1) for i, p in originals.items()
    }
    fps_arr = {
        i: phash_bytes(p) & ((1 << 64) - 1) for i, p in arrivals_py.items()
    }
    for a, fa in fps_arr.items():
        for i, fi in fps_idx.items():
            h = bin(fa ^ fi).count("1")
            if h <= 3:
                want.add((a, i, h))
    assert got == want
    assert want  # fixture sanity: some re-encodes land within 3


def test_media_cap_groups_by_raw_chunk_not_hashed_cb(
    spark, tmp_path, monkeypatch
):
    """r12 advisory regression: the hot-bucket cap must count RAW
    (c, v) chunk groups, not hashed cb buckets — a cb collision merging
    two groups must not push either past the cap. Force the worst case
    (ALL cb values collide) and check nothing is dropped as long as
    every raw group stays under the cap, at build time AND at the
    probe's re-cap over the read index."""
    import flink_streaming_2_10_spark.pipeline.neardup_index as ndx
    from flink_streaming_2_10_spark.pipeline.multimodal import phash_bytes
    from pyspark.sql import functions as F

    monkeypatch.setattr(
        ndx, "_hash60", lambda col, hasher: F.lit(0).cast("long")
    )

    media = _media_rows(spark)
    n_media = media.count()
    # Every cb collides, so the merged "bucket" holds n_media*chunks
    # rows; each raw (c, v) group holds at most n_media. A cap between
    # the two separates the behaviors: per-cb capping would drop
    # EVERYTHING, per-(c, v) capping keeps every row.
    cap = n_media + 5
    assert cap < n_media * 8
    ndx.build_media_phash_index(
        media, str(tmp_path / "midx"), "mdxcap", num_buckets=4,
        chunks=8, max_bucket_size=cap,
    )
    assert spark.table("mdxcap_buckets").count() == n_media * 8

    originals = {
        r["media_id"]: bytes(r["payload"]) for r in media.collect()
    }
    arrivals = spark.createDataFrame(
        [(300, bytearray(originals[5].upper()))],
        "media_id long, payload binary",
    )
    got = {
        (r["media_id"], r["index_media_id"]): r["hamming"]
        for r in ndx.media_against_index(
            spark, arrivals, "mdxcap", max_hamming=6, chunks=8,
            max_bucket_size=cap,
        ).collect()
    }
    want_h = bin(
        (phash_bytes(originals[5]) ^ phash_bytes(originals[5].upper()))
        & ((1 << 64) - 1)
    ).count("1")
    assert want_h <= 6
    assert got[(300, 5)] == want_h


def test_media_incremental_ingest_flags_reencodes_across_passes(
    spark, tmp_path
):
    """run_incremental + media_ingest_batch (the media face of the text
    three-pass contract): pass 1 seeds the phash index; pass 2's
    re-encode of a pass-1 payload is flagged via the index (no pass-1
    rescan) while its fresh payload joins the index; pass 3's re-encode
    of THAT pass-2 arrival is flagged too."""
    import os

    from pyspark.sql import functions as F

    from flink_streaming_2_10_spark.pipeline.neardup_index import (
        media_ingest_batch,
    )
    from flink_streaming_2_10_spark.streaming.runners import run_incremental

    src = str(tmp_path / "media")
    os.makedirs(src)
    ck = str(tmp_path / "ck")
    flagged = str(tmp_path / "flagged")
    idx = str(tmp_path / "idx")

    def write_file(name, lines):
        with open(os.path.join(src, name), "w") as fh:
            fh.write("\n".join(lines))

    base = (
        "a crawled media payload with enough bytes to give the gradient "
        "hash a stable signal across its sixty five regions. " * 4
    )
    pay_a = base + "original subject one " * 3
    pay_b = "".join(chr(33 + (i * 89 + 7) % 90) for i in range(300))
    write_file("p1.txt", [f"1,{pay_a}", f"2,{pay_b}"])

    parts = F.split(F.col("value"), ",", 2)

    def stream():
        return spark.readStream.text(src).select(
            F.element_at(parts, 1).cast("long").alias("media_id"),
            F.encode(F.element_at(parts, 2), "UTF-8").alias("payload"),
        )

    on_batch = media_ingest_batch(
        spark, idx, "mdx_ing", flagged,
        max_hamming=6, chunks=8, num_buckets=4,
    )
    run_incremental(stream(), ck, on_batch)
    assert not os.path.exists(flagged) or not [
        f for f in os.listdir(flagged) if f.endswith(".parquet")
    ]

    # pass 2: 10 re-encodes payload 1 (upper-case); 11 is fresh
    pay_c = base + "a different fresh subject " * 3
    write_file("p2.txt", [f"10,{pay_a.upper()}", f"11,{pay_c}"])
    run_incremental(stream(), ck, on_batch)
    got = {
        (r["media_id"], r["index_media_id"])
        for r in spark.read.parquet(flagged).collect()
    }
    assert (10, 1) in got
    assert all(m != 11 for m, _ in got)

    # pass 3: 20 re-encodes the PASS-2 fresh payload 11 (survivor
    # appended — caught without rescanning pass 1 or 2)
    write_file("p3.txt", [f"20,{pay_c.upper()}"])
    run_incremental(stream(), ck, on_batch)
    got3 = {
        (r["media_id"], r["index_media_id"])
        for r in spark.read.parquet(flagged).collect()
    }
    assert (20, 11) in got3
    # the pass-2 flagged re-encode never entered the index
    assert all(i != 10 for _, i in got3)


def test_compaction_preserves_probe_results_and_plan(spark, tmp_path):
    """writer.compact_bucketed_table on an append-grown index: after 3
    append passes the bucket table holds one file set per pass;
    compaction rewrites it to exactly num_buckets files at a NEW
    generation path, the probe returns IDENTICAL pairs, and the probe's
    index side is still exchange-free (bucket spec preserved)."""
    import glob

    from flink_streaming_2_10_spark.pipeline.writer import (
        compact_bucketed_table,
    )

    docs = _pass1_docs(spark)
    idx = str(tmp_path / "idx")
    build_neardup_index(
        docs.filter("doc_id < 20"), idx, "ndx_cmp", num_buckets=4
    )
    for lo in (20, 30):
        build_neardup_index(
            docs.filter(f"doc_id >= {lo} and doc_id < {lo + 10}"),
            idx, "ndx_cmp", num_buckets=4, mode="append",
        )
    arrivals = spark.createDataFrame(
        [
            (100,
             "document number 7 talks about topic 0 in long form "
             "with unique trailing words alpha7 beta7 gamma7"),
            (101,
             "document number 25 talks about topic 4 in long form "
             "with unique trailing words alpha25 beta25 gamma25"),
        ],
        ["doc_id", "text"],
    )

    def probe():
        return {
            (r["doc_id"], r["index_doc_id"], r["est_jaccard"])
            for r in neardup_against_index(
                spark, arrivals, "ndx_cmp", threshold=0.5
            ).collect()
        }

    before_pairs = probe()
    assert {(100, 7), (101, 25)} <= {(a, b) for a, b, _ in before_pairs}
    n_files_before = len(
        glob.glob(f"{idx}/buckets/**/*.parquet", recursive=True)
    )
    assert n_files_before > 4  # 3 append passes left >1 file set

    compact_bucketed_table(
        spark, "ndx_cmp_buckets", f"{idx}/buckets", f"{idx}/buckets_g2",
        bucket_col="bb", num_buckets=4,
    )
    compact_bucketed_table(
        spark, "ndx_cmp_sigs", f"{idx}/sigs", f"{idx}/sigs_g2",
        bucket_col="doc_id", num_buckets=4,
    )
    n_files_after = len(
        glob.glob(f"{idx}/buckets_g2/**/*.parquet", recursive=True)
    )
    assert n_files_after <= 4 < n_files_before
    assert probe() == before_pairs

    plan = _plan(
        neardup_against_index(spark, arrivals, "ndx_cmp", threshold=0.5)
    )
    import re

    blocks = re.split(r"\n(?=\(\d+\) )", plan)
    idx_scans = [
        b for b in blocks
        if re.match(r"\(\d+\) Scan parquet", b) and "_g2" in b
    ]
    # both index scans read the NEW generation, with bucketed output
    assert len(idx_scans) == 2, plan
    for b in idx_scans:
        assert "Bucketed: true" in b, b


def test_compaction_rejects_same_path(spark, tmp_path):
    from flink_streaming_2_10_spark.pipeline.writer import (
        compact_bucketed_table,
    )

    with pytest.raises(ValueError, match="NEW generation"):
        compact_bucketed_table(
            spark, "t", str(tmp_path / "p"), str(tmp_path / "p"),
            bucket_col="x", num_buckets=4,
        )


def test_append_after_compaction_lands_in_new_generation(spark, tmp_path):
    """The ingest faces pass the SAME path every pass; after a
    compaction generation-swap the table lives elsewhere. Appends to an
    existing table must follow the table's own location (writer.py), so
    pass-3 lands in the new generation and probes see all batches —
    pre-fix this append failed Spark's location-mismatch check."""
    import glob

    from pyspark.sql import functions as F

    from flink_streaming_2_10_spark.pipeline.writer import (
        compact_bucketed_table,
    )

    def docs(lo, n):
        uid = (F.col("id") + F.lit(lo)).cast("string")
        return spark.range(n).select(
            (F.col("id") + F.lit(lo)).alias("doc_id"),
            F.concat(
                F.lit("body words "), F.md5(uid), F.lit(" "),
                F.md5(F.concat(uid, F.lit("z"))),
            ).alias("text"),
        )

    idx = str(tmp_path / "idx")
    build_neardup_index(docs(0, 30), idx, "ndx_gen", num_buckets=4)
    build_neardup_index(
        docs(30, 30), idx, "ndx_gen", num_buckets=4, mode="append"
    )
    compact_bucketed_table(
        spark, "ndx_gen_buckets", f"{idx}/buckets", f"{idx}/buckets_g2",
        bucket_col="bb", num_buckets=4,
    )
    compact_bucketed_table(
        spark, "ndx_gen_sigs", f"{idx}/sigs", f"{idx}/sigs_g2",
        bucket_col="doc_id", num_buckets=4,
    )
    old_files = set(glob.glob(f"{idx}/buckets/**/*.parquet", recursive=True))
    # pass 3 STILL passes the original path — must append to g2
    build_neardup_index(
        docs(60, 30), idx, "ndx_gen", num_buckets=4, mode="append"
    )
    assert (
        set(glob.glob(f"{idx}/buckets/**/*.parquet", recursive=True))
        == old_files
    )  # old generation untouched
    assert spark.table("ndx_gen_sigs").count() == 90
    # an exact re-ingest of a batch-3 doc is flagged via the index
    arr = docs(60, 3).withColumn(
        "doc_id", F.col("doc_id") + F.lit(10_000_000)
    )
    got = {
        (r["doc_id"], r["index_doc_id"])
        for r in neardup_against_index(
            spark, arr, "ndx_gen", threshold=0.9
        ).collect()
    }
    assert {(10_000_060, 60), (10_000_061, 61), (10_000_062, 62)} <= got


def test_media_append_after_compaction_lands_in_new_generation(
    spark, tmp_path
):
    """Media twin of the generation-swap pin: the phash index compacts,
    then the next build_media_phash_index append — still passing the
    ORIGINAL path, as media_ingest_batch does every pass — lands in the
    new generation and its payloads are probe-visible."""
    from pyspark.sql import functions as F

    from flink_streaming_2_10_spark.pipeline.neardup_index import (
        build_media_phash_index,
        media_against_index,
    )
    from flink_streaming_2_10_spark.pipeline.writer import (
        compact_bucketed_table,
    )

    def media(lo, n):
        uid = (F.col("id") + F.lit(lo)).cast("string")
        body = F.concat(
            *[F.md5(F.concat(uid, F.lit(f":{j}"))) for j in range(8)]
        )
        return spark.range(n).select(
            (F.col("id") + F.lit(lo)).alias("media_id"),
            F.encode(body, "UTF-8").alias("payload"),
        )

    idx = str(tmp_path / "midx")
    build_media_phash_index(media(0, 20), idx, "mdx_gen", num_buckets=4)
    compact_bucketed_table(
        spark, "mdx_gen_buckets", f"{idx}/buckets", f"{idx}/buckets_g2",
        bucket_col="cb", num_buckets=4,
    )
    compact_bucketed_table(
        spark, "mdx_gen_phash", f"{idx}/phash", f"{idx}/phash_g2",
        bucket_col="media_id", num_buckets=4,
    )
    build_media_phash_index(
        media(20, 20), idx, "mdx_gen", num_buckets=4, mode="append"
    )
    assert spark.table("mdx_gen_phash").count() == 40
    # exact re-ingest of a POST-compaction appended payload is flagged
    arr = media(25, 1).withColumn(
        "media_id", F.col("media_id") + F.lit(10_000_000)
    )
    got = {
        (r["media_id"], r["index_media_id"], r["hamming"])
        for r in media_against_index(spark, arr, "mdx_gen").collect()
    }
    assert (10_000_025, 25, 0) in got


def test_media_index_pre_migration_schema_fallback(spark, tmp_path):
    """An index persisted before the raw (c, v) bucket columns existed:
    probing still works (cb-keyed cap fallback, with a rebuild warning);
    appending refuses with migration instructions; a rebuilt
    (mode='overwrite') index restores the silent post-migration path."""
    import warnings

    from flink_streaming_2_10_spark.pipeline.neardup_index import (
        build_media_phash_index,
        media_against_index,
    )
    from flink_streaming_2_10_spark.pipeline.writer import (
        write_bucketed_table,
    )

    media = _media_rows(spark)
    try:
        build_media_phash_index(
            media, str(tmp_path / "midx"), "mdxold", num_buckets=4, chunks=8
        )
        # strip the raw columns to simulate the pre-migration schema
        # (read by PATH, not catalog name — overwriting a table being
        # read through its own name is Spark's self-reference error)
        old = spark.read.parquet(str(tmp_path / "midx" / "buckets")).select(
            "cb", "media_id"
        )
        write_bucketed_table(
            old, "mdxold_buckets", str(tmp_path / "midx_old"),
            bucket_col="cb", num_buckets=4, mode="overwrite",
        )
        originals = {
            r["media_id"]: bytes(r["payload"]) for r in media.collect()
        }
        arrivals = spark.createDataFrame(
            [(200, bytearray(originals[3].upper()))],
            "media_id long, payload binary",
        )
        with pytest.warns(UserWarning, match="predates the raw"):
            got = media_against_index(
                spark, arrivals, "mdxold", max_hamming=6, chunks=8
            ).collect()
        pairs = {(r["media_id"], r["index_media_id"]) for r in got}
        assert (200, 3) in pairs
        with pytest.raises(ValueError, match="Rebuild the index"):
            build_media_phash_index(
                media, str(tmp_path / "midx"), "mdxold",
                num_buckets=4, chunks=8, mode="append",
            )
        # rebuild restores the post-migration schema and silent probing
        build_media_phash_index(
            media, str(tmp_path / "midx2"), "mdxold",
            num_buckets=4, chunks=8, mode="overwrite",
        )
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            got2 = media_against_index(
                spark, arrivals, "mdxold", max_hamming=6, chunks=8
            ).collect()
        # the cb fallback and the rebuilt raw-(c, v) path flag the same
        # pairs here (no cb collision in this fixture)
        assert {(r["media_id"], r["index_media_id"]) for r in got2} == pairs
    finally:
        spark.sql("DROP TABLE IF EXISTS mdxold_buckets")
        spark.sql("DROP TABLE IF EXISTS mdxold_phash")


def test_text_ingest_auto_compaction_preserves_flags(spark, tmp_path):
    """compact_every=2 on the text ingest face: the 4-pass run flags
    EXACTLY the pairs the uncompacted run flags; the generation swap
    happens after the 2nd append (table re-pointed to <base>_g1 with
    one file per bucket) and the post-swap pass both probes and appends
    correctly through the original path."""
    import os

    from flink_streaming_2_10_spark.pipeline.neardup_index import (
        neardup_ingest_batch,
    )
    from flink_streaming_2_10_spark.pipeline.writer import (
        _norm_location,
        _table_location,
    )

    doc_a = "the quick brown fox jumps over the lazy dog near the river bank"
    doc_b = "completely unrelated second document about cooking pasta daily"
    doc_c = "a third topic entirely focused on mountain hiking trails today"
    passes = [
        [(1, doc_a), (2, doc_b)],
        [(10, doc_a.replace("river bank", "water edge")), (11, doc_c)],
        [(20, doc_c.replace("trails today", "trails tomorrow"))],
        # post-swap pass: near-dups of a pass-1 AND a pass-2 doc, plus
        # a fresh survivor (so the post-swap APPEND writes rows too)
        [(30, doc_a.replace("quick", "swift")),
         (31, doc_c.replace("third", "final")),
         (32, "a wholly fresh fourth pass document regarding deep sea "
              "creatures and their luminescent displays")],
    ]

    def run(prefix: str, **kw) -> set:
        flagged = str(tmp_path / f"fl_{prefix}")
        on_batch = neardup_ingest_batch(
            spark, str(tmp_path / f"idx_{prefix}"), prefix, flagged,
            threshold=0.5, num_buckets=4, **kw,
        )
        for i, rows in enumerate(passes):
            on_batch(
                spark.createDataFrame(rows, "doc_id long, text string"), i
            )
        return {
            (r["doc_id"], r["index_doc_id"])
            for r in spark.read.parquet(flagged).collect()
        }

    try:
        base = run("ndx_ac0")
        compacted = run("ndx_ac1", compact_every=2)
        assert compacted == base
        assert (30, 1) in compacted and (31, 11) in compacted  # post-swap
        # appends: pass2 (#1), pass3 (#2 -> compact), pass4 (#3): one swap
        loc = _norm_location(_table_location(spark, "ndx_ac1_buckets"))
        assert loc.endswith("_g1"), loc
        # ...and the post-swap append went INTO the new generation
        g1_files = [
            f for f in os.listdir(loc) if f.endswith(".parquet")
        ]
        assert len(g1_files) > 4  # 4 compacted files + pass-4 append
    finally:
        for p in ("ndx_ac0", "ndx_ac1"):
            spark.sql(f"DROP TABLE IF EXISTS {p}_buckets")
            spark.sql(f"DROP TABLE IF EXISTS {p}_sigs")


def test_auto_compaction_generation_tracked_in_properties(spark, tmp_path):
    """The generation counter lives in TBLPROPERTIES, not in the path: a
    user-chosen root that itself ends in ``_g2`` gets its first
    compaction at ``..._g2_g1`` (never the colliding sibling
    ``..._g3``), the counter advances 1, 2, ... across compactions, and
    the recorded base path never drifts."""
    from flink_streaming_2_10_spark.pipeline.neardup_index import (
        _auto_compact_index_table,
    )
    from flink_streaming_2_10_spark.pipeline.writer import (
        BASE_PATH_PROP,
        GENERATION_PROP,
        _norm_location,
        _table_location,
        _table_properties,
        write_bucketed_table,
    )

    root = str(tmp_path / "index_g2")  # adversarial user-chosen root
    df = spark.createDataFrame([(i, i) for i in range(12)], ["doc_id", "v"])
    try:
        write_bucketed_table(df, "bt_gprop", root, "doc_id", 2)
        _auto_compact_index_table(spark, "bt_gprop", "doc_id", 2)
        loc1 = _norm_location(_table_location(spark, "bt_gprop"))
        assert loc1 == f"{root}_g1", loc1  # NOT .../index_g3
        props = _table_properties(spark, "bt_gprop")
        assert props[GENERATION_PROP] == "1"
        assert props[BASE_PATH_PROP] == root
        _auto_compact_index_table(spark, "bt_gprop", "doc_id", 2)
        loc2 = _norm_location(_table_location(spark, "bt_gprop"))
        assert loc2 == f"{root}_g2", loc2  # base stable, counter advances
        props = _table_properties(spark, "bt_gprop")
        assert props[GENERATION_PROP] == "2"
        assert props[BASE_PATH_PROP] == root
        assert spark.table("bt_gprop").count() == 12
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_gprop")


def test_manual_compaction_gN_path_not_mistaken_for_legacy(spark, tmp_path):
    """A MANUAL compact_bucketed_table call records lineage but no
    generation counter — if the user-chosen new path merely ends in
    ``_gN``, the legacy-fallback suffix parse must NOT claim it (that
    would misderive the base and jump the counter to N+1). The gate:
    the suffix is ours only when the previous generation's path is in
    the recorded lineage; otherwise the table restarts as a fresh base
    at generation 1. Regression for the r15 ADVICE finding
    (neardup_index.py legacy fallback)."""
    from flink_streaming_2_10_spark.pipeline.neardup_index import (
        _auto_compact_index_table,
    )
    from flink_streaming_2_10_spark.pipeline.writer import (
        BASE_PATH_PROP,
        GENERATION_PROP,
        _norm_location,
        _table_location,
        _table_properties,
        compact_bucketed_table,
        write_bucketed_table,
    )

    p0 = str(tmp_path / "plain_root")
    manual = str(tmp_path / "archive_g7")  # user path, coincidental _gN
    df = spark.createDataFrame([(i, i) for i in range(12)], ["doc_id", "v"])
    try:
        write_bucketed_table(df, "bt_manual", p0, "doc_id", 2)
        # manual compaction: lineage = [p0], no GENERATION_PROP
        compact_bucketed_table(spark, "bt_manual", p0, manual, "doc_id", 2)
        props = _table_properties(spark, "bt_manual")
        assert GENERATION_PROP not in props
        _auto_compact_index_table(spark, "bt_manual", "doc_id", 2)
        loc = _norm_location(_table_location(spark, "bt_manual"))
        # fresh base at generation 1 — NOT .../archive_g8
        assert loc == f"{manual}_g1", loc
        props = _table_properties(spark, "bt_manual")
        assert props[GENERATION_PROP] == "1"
        assert props[BASE_PATH_PROP] == manual
        assert spark.table("bt_manual").count() == 12
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_manual")


def test_legacy_auto_compacted_suffix_still_recovered(spark, tmp_path):
    """The pre-r15 legacy fallback still works WHEN the suffix really is
    ours: a table whose lineage contains the previous generation's path
    (here base → base_g1, lineage [base]) has its next auto-compaction
    continue the chain at base_g2 with the counter landing on 2 — the
    corroboration gate must not break genuine legacy tables."""
    from flink_streaming_2_10_spark.pipeline.neardup_index import (
        _auto_compact_index_table,
    )
    from flink_streaming_2_10_spark.pipeline.writer import (
        BASE_PATH_PROP,
        GENERATION_PROP,
        _norm_location,
        _table_location,
        _table_properties,
        compact_bucketed_table,
        write_bucketed_table,
    )

    base = str(tmp_path / "legacy_root")
    df = spark.createDataFrame([(i, i) for i in range(12)], ["doc_id", "v"])
    try:
        write_bucketed_table(df, "bt_legacy", base, "doc_id", 2)
        # replicate a pre-r15 auto-compaction: old → base_g1, lineage
        # records [base], no generation property
        compact_bucketed_table(
            spark, "bt_legacy", base, f"{base}_g1", "doc_id", 2
        )
        props = _table_properties(spark, "bt_legacy")
        assert GENERATION_PROP not in props
        _auto_compact_index_table(spark, "bt_legacy", "doc_id", 2)
        loc = _norm_location(_table_location(spark, "bt_legacy"))
        assert loc == f"{base}_g2", loc  # chain continues, no restart
        props = _table_properties(spark, "bt_legacy")
        assert props[GENERATION_PROP] == "2"
        assert props[BASE_PATH_PROP] == base
        assert spark.table("bt_legacy").count() == 12
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_legacy")


def test_media_ingest_auto_compaction_preserves_flags(spark, tmp_path):
    """compact_every=1 on the media ingest face: the pass after the
    generation swap still probes (re-encode of a pass-2 survivor
    caught) and appends through the original path; flags match the
    uncompacted three-pass contract."""
    from pyspark.sql import functions as F

    from flink_streaming_2_10_spark.pipeline.neardup_index import (
        media_ingest_batch,
    )
    from flink_streaming_2_10_spark.pipeline.writer import (
        _norm_location,
        _table_location,
    )

    base = (
        "a crawled media payload with enough bytes to give the gradient "
        "hash a stable signal across its sixty five regions. " * 4
    )
    pay_a = base + "original subject one " * 3
    pay_b = "".join(chr(33 + (i * 89 + 7) % 90) for i in range(300))
    pay_c = base + "a different fresh subject " * 3
    passes = [
        [(1, pay_a), (2, pay_b)],
        [(10, pay_a.upper()), (11, pay_c)],
        [(20, pay_c.upper())],
    ]
    flagged = str(tmp_path / "fl_media_ac")
    on_batch = media_ingest_batch(
        spark, str(tmp_path / "idx_media_ac"), "mdx_ac", flagged,
        max_hamming=6, chunks=8, num_buckets=4, compact_every=1,
    )
    try:
        for i, rows in enumerate(passes):
            df = spark.createDataFrame(rows, "media_id long, payload string")
            on_batch(df.withColumn("payload", F.encode("payload", "UTF-8")), i)
        got = {
            (r["media_id"], r["index_media_id"])
            for r in spark.read.parquet(flagged).collect()
        }
        assert (10, 1) in got and (20, 11) in got
        assert all(i != 10 for _, i in got)
        # two appends, compact_every=1: two swaps
        loc = _norm_location(_table_location(spark, "mdx_ac_buckets"))
        assert loc.endswith("_g2"), loc
    finally:
        spark.sql("DROP TABLE IF EXISTS mdx_ac_buckets")
        spark.sql("DROP TABLE IF EXISTS mdx_ac_phash")


def test_empty_micro_batch_is_harmless(spark, tmp_path):
    """Quiet-stream robustness (r17): a ZERO-row micro-batch through
    `neardup_ingest_batch` must neither raise nor corrupt the index —
    both as the FIRST batch ever (creates an empty but probeable index)
    and between real batches (no-op append, counts unchanged)."""
    from flink_streaming_2_10_spark.pipeline.neardup_index import (
        neardup_ingest_batch,
    )

    empty = spark.createDataFrame([], "doc_id long, text string")
    flagged = str(tmp_path / "flagged")

    # First-ever batch empty: creates an empty index that later real
    # batches append to and probe against without error.
    cb = neardup_ingest_batch(
        spark, str(tmp_path / "idx"), "ndx_empty_t", flagged,
        threshold=0.5, num_buckets=4,
    )
    cb(empty, 0)
    assert spark.table("ndx_empty_t_buckets").count() == 0

    docs = _pass1_docs(spark)
    cb(docs, 1)
    n_buckets = spark.table("ndx_empty_t_buckets").count()
    n_sigs = spark.table("ndx_empty_t_sigs").count()
    assert n_sigs == docs.count()

    # Empty batch between real ones: flags nothing, appends nothing.
    cb(empty, 2)
    assert spark.table("ndx_empty_t_buckets").count() == n_buckets
    assert spark.table("ndx_empty_t_sigs").count() == n_sigs

    # And a real batch afterwards still probes correctly: a near-dup of
    # an indexed doc is flagged, not appended.
    base = docs.where("doc_id = 3").collect()[0]["text"]
    arrivals = spark.createDataFrame(
        [(300, base.replace("long form", "short form"))], ["doc_id", "text"]
    )
    cb(arrivals, 3)
    flags = spark.read.parquet(flagged)
    assert flags.where("doc_id = 300").count() >= 1
    assert spark.table("ndx_empty_t_sigs").where("doc_id = 300").count() == 0


def test_media_empty_micro_batch_is_harmless(spark, tmp_path):
    """Media face of the quiet-stream pin: a zero-row batch through
    `media_ingest_batch` neither raises nor corrupts the phash index,
    first-ever and mid-stream (r17)."""
    from flink_streaming_2_10_spark.pipeline.neardup_index import (
        media_ingest_batch,
    )

    empty = spark.createDataFrame([], "media_id long, payload binary")
    flagged = str(tmp_path / "mflagged")
    cb = media_ingest_batch(
        spark, str(tmp_path / "midx"), "ndx_empty_m", flagged, num_buckets=4
    )
    cb(empty, 0)
    assert spark.table("ndx_empty_m_buckets").count() == 0

    media = _media_rows(spark)
    cb(media, 1)
    n_buckets = spark.table("ndx_empty_m_buckets").count()
    n_ph = spark.table("ndx_empty_m_phash").count()
    assert n_ph == media.count()

    cb(empty, 2)
    assert spark.table("ndx_empty_m_buckets").count() == n_buckets
    assert spark.table("ndx_empty_m_phash").count() == n_ph
