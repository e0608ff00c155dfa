"""Multimodal plumbing tests: binary payload schema, Arrow batch shapes,
stubbed decoders, frame-sampling explosion, metadata-only plans."""

from __future__ import annotations

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


def test_real_decoder_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image_real(b"\x89PNG")


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
