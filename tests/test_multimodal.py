"""Multimodal plumbing tests: binary payload schema, Arrow batch shapes,
real PNG/JPEG/GIF header decoding, frame-sampling explosion,
metadata-only plans."""

from __future__ import annotations

import struct
import zlib

import pytest
from pyspark.sql import functions as F

from flink_streaming_2_10_spark.catalog import load_table
from flink_streaming_2_10_spark.pipeline.multimodal import (
    attach_media,
    audio_stats,
    decode_image_real,
    fake_decode_dims,
    media_features,
    resize_images,
    video_frame_samples,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    return attach_media(load_table(spark, SF_DIR, "documents"))


def test_media_schema(media):
    types = dict(media.dtypes)
    assert types["payload"] == "binary"
    assert types["kind"] == "string"
    assert types["meta"].startswith("struct<sample_rate:int,duration_ms:int,codec:string")


def _png_bytes(width: int, height: int) -> bytes:
    """Genuine (if pixel-less) PNG: signature + well-formed IHDR chunk
    with a correct CRC — exactly what `file`/PIL would accept as a header."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    chunk = b"IHDR" + ihdr
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr))
        + chunk
        + struct.pack(">I", zlib.crc32(chunk) & 0xFFFFFFFF)
    )


def _jpeg_bytes(width: int, height: int, sof_marker: int = 0xC0) -> bytes:
    """Genuine JPEG prefix: SOI, APP0/JFIF, DQT filler, then SOFn carrying
    the frame dimensions — the segments a real camera file leads with."""
    app0_body = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    app0 = b"\xff\xe0" + struct.pack(">H", 2 + len(app0_body)) + app0_body
    dqt_body = b"\x00" + bytes(64)
    dqt = b"\xff\xdb" + struct.pack(">H", 2 + len(dqt_body)) + dqt_body
    sof_body = struct.pack(">BHHB", 8, height, width, 3) + b"\x01\x22\x00\x02\x11\x01\x03\x11\x01"
    sof = bytes([0xFF, sof_marker]) + struct.pack(">H", 2 + len(sof_body)) + sof_body
    return b"\xff\xd8" + app0 + dqt + sof


def _gif_bytes(width: int, height: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", width, height) + b"\xf7\x00\x00"


def test_decode_real_png():
    assert decode_image_real(_png_bytes(640, 480)) == (640, 480)
    assert decode_image_real(_png_bytes(1, 70000)) == (1, 70000)


def test_decode_real_jpeg_baseline_and_progressive():
    assert decode_image_real(_jpeg_bytes(1920, 1080)) == (1920, 1080)
    # progressive (SOF2) — dimensions live in the same segment layout
    assert decode_image_real(_jpeg_bytes(320, 240, sof_marker=0xC2)) == (320, 240)


def test_decode_jpeg_skips_non_sof_and_fill_bytes():
    # DHT (a non-SOF 0xC4 marker) and a 0xFF fill byte before SOF0 must be
    # stepped over, not mistaken for the frame header
    dht_body = b"\x00" + bytes(16) + b"\x00"
    dht = b"\xff\xc4" + struct.pack(">H", 2 + len(dht_body)) + dht_body
    sof_body = struct.pack(">BHHB", 8, 24, 42, 1) + b"\x01\x11\x00"
    sof = b"\xff\xff\xc0" + struct.pack(">H", 2 + len(sof_body)) + sof_body
    assert decode_image_real(b"\xff\xd8" + dht + sof) == (42, 24)


def test_decode_real_gif():
    assert decode_image_real(_gif_bytes(800, 600)) == (800, 600)
    assert decode_image_real(b"GIF87a" + struct.pack("<HH", 12, 7)) == (12, 7)


def test_decode_rejects_non_images():
    for junk in (b"", b"hello world", b"\x89PNGnope", b"\xff\xd8\x00\x00",
                 b"RIFF....WAVE"):
        with pytest.raises(ValueError):
            decode_image_real(junk)


def test_decode_rejects_out_of_range_dims():
    # uint32 PNG dims that overflow int32 (Arrow would silently wrap them
    # in the width/height columns) must be treated as unparseable
    for w, h in ((0xFFFFFFFF, 480), (640, 0x80000000), (0, 480), (640, 0)):
        with pytest.raises(ValueError):
            decode_image_real(_png_bytes(w, h))
    with pytest.raises(ValueError):
        decode_image_real(_gif_bytes(0, 600))


def test_decode_rejects_jpeg_dnl_deferred_height():
    # height == 0 in SOF is legal JPEG ("height arrives later in a DNL
    # marker") but unparseable from the header alone -> fall back
    with pytest.raises(ValueError):
        decode_image_real(_jpeg_bytes(1920, 0))


def test_media_features_total_on_adversarial_headers(spark):
    # the operator stays total: malformed headers take the deterministic
    # fallback instead of wrapping negative through the int32 schema
    bad_png = _png_bytes(0xFFFFFFFF, 0xFFFFFFFF)
    dnl_jpeg = _jpeg_bytes(640, 0)
    df = spark.createDataFrame(
        [(1, "image", bad_png), (2, "image", dnl_jpeg)],
        "media_id long, kind string, payload binary",
    )
    out = {r["media_id"]: r for r in media_features(df).collect()}
    assert (out[1]["width"], out[1]["height"]) == fake_decode_dims(bad_png)
    assert (out[2]["width"], out[2]["height"]) == fake_decode_dims(dnl_jpeg)
    assert all(r["width"] > 0 and r["height"] > 0 for r in out.values())


def test_fake_decode_deterministic():
    assert fake_decode_dims(b"ab") == fake_decode_dims(b"ab")
    assert fake_decode_dims(b"") == (128, 128)
    w, h = fake_decode_dims(bytes([7, 3]))
    assert w == 128 + (7 % 8) * 64 and h == 128 + (3 % 8) * 48


def test_media_features_roundtrip(media, spark):
    out = media_features(media)
    rows = {r["media_id"]: r for r in out.collect()}
    src = {r["media_id"]: r for r in media.collect()}
    assert set(rows) == set(src)  # mapInPandas preserves every row
    for mid, r in rows.items():
        payload = bytes(src[mid]["payload"])
        assert r["n_bytes"] == len(payload)
        assert r["checksum"] == sum(payload) % 65536
        assert (r["width"], r["height"]) == fake_decode_dims(payload)


def test_media_features_real_image_bytes(spark):
    # genuine PNG/JPEG/GIF payloads through the Spark mapInPandas path:
    # dimensions must come from the real header parse, not the fake fallback
    payloads = [
        (1, "image", _png_bytes(640, 480)),
        (2, "image", _jpeg_bytes(1920, 1080)),
        (3, "image", _gif_bytes(800, 600)),
        (4, "image", b"not an image at all"),
    ]
    df = spark.createDataFrame(payloads, "media_id long, kind string, payload binary")
    out = {r["media_id"]: r for r in media_features(df).collect()}
    assert (out[1]["width"], out[1]["height"]) == (640, 480)
    assert (out[2]["width"], out[2]["height"]) == (1920, 1080)
    assert (out[3]["width"], out[3]["height"]) == (800, 600)
    for mid in (1, 2, 3):
        real = (out[mid]["width"], out[mid]["height"])
        assert real != fake_decode_dims(payloads[mid - 1][2])
    assert (out[4]["width"], out[4]["height"]) == fake_decode_dims(b"not an image at all")


def test_media_features_batch_shape(spark):
    # many input partitions -> mapInPandas must emit per-batch frames that
    # concatenate to exactly the input rows, regardless of partitioning
    docs = load_table(spark, SF_DIR, "documents").repartition(7)
    out = media_features(attach_media(docs))
    assert out.count() == docs.count()


def test_video_frame_samples(media):
    frames = video_frame_samples(media, interval_ms=250)
    src = {r["media_id"]: r["meta"]["duration_ms"]
           for r in media.filter(F.col("kind") == "video").collect()}
    counts = {
        r["media_id"]: r["n"]
        for r in frames.groupBy("media_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(counts) == set(src)
    for mid, dur in src.items():
        expected = (dur + 249) // 250  # ceil(duration / interval)
        assert counts[mid] == expected, (mid, dur)
    one = frames.filter(F.col("media_id") == min(src)).orderBy("frame_ts_ms").collect()
    assert [r["frame_idx"] for r in one] == list(range(len(one)))


def test_audio_stats_metadata_only_plan(media):
    out = audio_stats(media)
    rows = out.collect()
    assert all(r["n_samples"] == r["duration_ms"] * r["sample_rate"] // 1000 for r in rows)
    assert all(r["pcm16_bytes"] == r["n_samples"] * 2 for r in rows)
    # payload must be pruned from the physical scan (column pruning)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan


def test_resize_metadata(media):
    out = resize_images(media, 224, 224)
    r = out.select("meta.target_width", "meta.target_height").first()
    assert (r["target_width"], r["target_height"]) == (224, 224)
    # payload untouched
    a = media.select("media_id", F.md5(F.col("payload").cast("string")).alias("h"))
    b = out.select("media_id", F.md5(F.col("payload").cast("string")).alias("h"))
    assert a.exceptAll(b).count() == 0


def test_payload_dedup_planted_duplicates(spark):
    from flink_streaming_2_10_spark.pipeline.multimodal import (
        attach_media,
        payload_dedup,
    )

    docs = spark.createDataFrame(
        [
            (1, "same bytes"),
            (2, "same bytes"),
            (7, "same bytes"),
            (3, "unique payload"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["media_id"]: r.asDict()
        for r in payload_dedup(attach_media(docs)).collect()
    }
    assert got[1]["is_canonical"] and got[1]["n_copies"] == 3
    assert got[2]["canonical_id"] == 1 and not got[2]["is_canonical"]
    assert got[7]["canonical_id"] == 1
    assert got[3]["is_canonical"] and got[3]["n_copies"] == 1


def test_payload_dedup_fingerprint_is_byte_level(spark):
    from flink_streaming_2_10_spark.pipeline.multimodal import payload_dedup

    # Distinct bytes with equal lengths stay distinct.
    media = spark.createDataFrame(
        [(1, bytearray(b"\x00\x01")), (2, bytearray(b"\x00\x02"))],
        "media_id long, payload binary",
    )
    got = payload_dedup(media).collect()
    assert all(r["n_copies"] == 1 and r["is_canonical"] for r in got)


# ---------------------------------------------------------------------------
# perceptual-hash near-dup (phash_bytes / media_phash / payload_neardup)
# ---------------------------------------------------------------------------


def _phash_naive(payload: bytes, bits: int = 64) -> int:
    """Independent re-derivation of the phash contract (pure Python, no
    numpy): region of byte i = i*(bits+1)//n, bit b set iff region b's
    mean exceeds region b+1's via integer cross-multiply."""
    n = len(payload)
    if n == 0:
        return 0
    regions = bits + 1
    sums = [0] * regions
    cnts = [0] * regions
    for i, byte in enumerate(payload):
        r = i * regions // n
        sums[r] += byte
        cnts[r] += 1
    fp = 0
    for b in range(bits):
        if sums[b] * cnts[b + 1] > sums[b + 1] * cnts[b]:
            fp |= 1 << b
    return fp - (1 << 64) if fp >= (1 << 63) else fp


def test_phash_bytes_matches_naive_reference():
    from flink_streaming_2_10_spark.pipeline.multimodal import phash_bytes

    cases = [
        b"",
        b"a",
        b"ab",
        b"ba",
        bytes(range(256)),
        bytes(reversed(range(256))),
        b"x" * 64,          # shorter than regions: empty regions -> 0 bits
        b"x" * 65,
        b"the quick brown fox jumps over the lazy dog " * 40,
        bytes([255] * 100 + [0] * 100),
        bytes([0, 255] * 500),
    ]
    for payload in cases:
        assert phash_bytes(payload) == _phash_naive(payload), payload[:20]


def test_phash_bytes_edge_values():
    from flink_streaming_2_10_spark.pipeline.multimodal import phash_bytes

    assert phash_bytes(b"") == 0
    # Monotonically decreasing signal: every gradient bit set, including
    # bit 63 -> the fingerprint is the NEGATIVE two's-complement value.
    desc = bytes(
        max(0, 255 - i * 2) for i in range(130)
    )
    fp = phash_bytes(desc)
    assert fp < 0
    assert fp == _phash_naive(desc)
    # Constant signal: no gradient anywhere, fingerprint 0.
    assert phash_bytes(b"\x42" * 1000) == 0


def test_phash_reencode_proximity():
    """The property the operator exists for: a length-preserving
    re-encode (case change) stays within small Hamming distance while
    unrelated payloads are far apart."""
    from flink_streaming_2_10_spark.pipeline.multimodal import phash_bytes

    a = (
        b"Spark reduces each payload to an eight byte fingerprint "
        b"inside the scan so only fingerprints ever shuffle. " * 8
    )
    b_re = a.upper()
    unrelated = bytes((i * 37 + 11) % 256 for i in range(len(a)))

    def ham(x: int, y: int) -> int:
        return bin((x ^ y) & ((1 << 64) - 1)).count("1")

    close = ham(phash_bytes(a), phash_bytes(b_re))
    far = ham(phash_bytes(a), phash_bytes(unrelated))
    assert close <= 6
    assert far >= 15


def test_media_phash_mapinpandas_matches_driver(spark):
    from flink_streaming_2_10_spark.pipeline.multimodal import (
        media_phash,
        phash_bytes,
    )

    payloads = [
        (1, b"hello world, this is payload one"),
        (2, b""),
        (3, bytes(range(200))),
        (4, b"HELLO WORLD, THIS IS PAYLOAD ONE"),
    ]
    media = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in payloads],
        "media_id long, payload binary",
    )
    got = {r["media_id"]: r["phash"] for r in media_phash(media).collect()}
    assert got == {i: phash_bytes(p) for i, p in payloads}


def test_payload_neardup_clusters_reencodes(spark):
    from flink_streaming_2_10_spark.pipeline.multimodal import (
        payload_neardup,
    )

    base = (
        b"a corpus document whose re-encoded twin must cluster with it "
        b"under the perceptual fingerprint despite byte inequality. " * 6
    )
    other = bytes((i * 73 + 5) % 256 for i in range(len(base)))
    media = spark.createDataFrame(
        [
            (10, bytearray(base)),
            (20, bytearray(base.upper())),   # re-encode of 10
            (30, bytearray(base)),           # exact copy of 10 (hamming 0)
            (40, bytearray(other)),          # unrelated
        ],
        "media_id long, payload binary",
    )
    got = {
        r["media_id"]: r.asDict()
        for r in payload_neardup(media, max_hamming=6, chunks=8).collect()
    }
    assert got[10]["canonical_id"] == 10 and got[10]["cluster_size"] == 3
    assert got[20]["canonical_id"] == 10
    assert got[30]["canonical_id"] == 10
    assert got[40]["canonical_id"] == 40 and got[40]["cluster_size"] == 1


def test_payload_neardup_pigeonhole_matches_bruteforce(spark):
    """The banded pair join is EXACT (max_hamming < chunks): clusters
    equal a brute-force all-pairs Hamming closure on driver-side."""
    from flink_streaming_2_10_spark.pipeline.multimodal import (
        payload_neardup,
        phash_bytes,
    )

    rng_payloads = {
        i: bytes(((i * 31 + j * 7 + (i * j) % 13) % 256) for j in range(120))
        for i in range(1, 25)
    }
    # plant two near pairs via single-byte tweaks
    rng_payloads[100] = bytes(
        b if j != 60 else (b + 1) % 256
        for j, b in enumerate(rng_payloads[1])
    )
    rng_payloads[101] = rng_payloads[2].upper()

    media = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in rng_payloads.items()],
        "media_id long, payload binary",
    )
    got = {
        r["media_id"]: r["canonical_id"]
        for r in payload_neardup(media, max_hamming=3, chunks=4).collect()
    }

    # brute force union-find over all-pairs hamming <= 3
    fps = {i: phash_bytes(p) & ((1 << 64) - 1) for i, p in rng_payloads.items()}
    parent = {i: i for i in fps}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a in fps:
        for b in fps:
            if a < b and bin(fps[a] ^ fps[b]).count("1") <= 3:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    want = {i: min(j for j in fps if find(j) == find(i)) for i in fps}
    assert got == want


def test_phash_single_byte_substitution_bounded_hamming():
    """Provable locality property: substituting ONE byte (same length)
    perturbs exactly one region sum, which participates in exactly two
    adjacent-region comparisons — so the fingerprints differ in AT MOST
    2 bits. Hypothesis-driven over random payloads and positions."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from flink_streaming_2_10_spark.pipeline.multimodal import phash_bytes

    @settings(max_examples=200, deadline=None)
    @given(
        data=st.binary(min_size=1, max_size=400),
        pos_seed=st.integers(min_value=0, max_value=10**9),
        new_byte=st.integers(min_value=0, max_value=255),
    )
    def prop(data: bytes, pos_seed: int, new_byte: int) -> None:
        pos = pos_seed % len(data)
        mutated = data[:pos] + bytes([new_byte]) + data[pos + 1 :]
        a = phash_bytes(data) & ((1 << 64) - 1)
        b = phash_bytes(mutated) & ((1 << 64) - 1)
        assert bin(a ^ b).count("1") <= 2

    prop()


def test_phash_rejects_oversized_payload_bound():
    """The int64 product bound fails loudly instead of letting numpy
    wrap and silently flip gradient bits (same policy as
    clustering.centroid_outliers)."""
    import pytest as _pytest

    from flink_streaming_2_10_spark.pipeline import multimodal as mm

    class _FakeLen(bytes):
        def __len__(self):
            return 2_000_000_000

    with _pytest.raises(ValueError, match="int64-safe bound"):
        mm.phash_bytes(_FakeLen(b"x"))
