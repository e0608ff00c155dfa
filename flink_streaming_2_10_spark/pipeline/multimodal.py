"""Multimodal (image/audio/video) column handling for training-data
pipelines — north-star extension (BASELINE.json).

Model: media are opaque ``binary`` payload columns plus a typed metadata
struct; heavy per-item work (decode, feature extraction, resize, frame
sampling) runs as Arrow-batched ``mapInPandas`` so each executor processes
columnar batches of payloads without ever collecting to the driver. At
100 TB the payload column dominates: every operator here either prunes it
(metadata-only plans never read payload bytes thanks to parquet column
pruning) or streams it batch-wise through Python exactly once.

Image dimensions are decoded for REAL from PNG / JPEG / GIF headers with
a pure-Python parser (``decode_image_real`` below) — no codec library
needed, the container's only gap is full-pixel decode. Payloads that are
not a recognized image container (e.g. the text-derived fixtures, audio
PCM, video bitstreams) fall back to a deterministic fake "decode" derived
from the payload bytes, so the operator is total. Full-pixel decode /
resample (``resize_images``) remains a declared pass-through: that part
genuinely needs PIL/libav.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_KINDS = ("image", "audio", "video")

#: Output schema of media_features — the contract the driver checks.
FEATURES_SCHEMA = (
    "media_id long, kind string, n_bytes int, checksum int, width int, height int"
)


def attach_media(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Derive a deterministic media table from ``documents``: payload =
    utf-8 bytes of the text (a stand-in for real image/audio bytes), kind
    by id mod 3, and a typed metadata struct. Pure column expressions —
    this is the shape a real ingest (S3 scan + sidecar metadata) lands in.
    """
    doc_id = F.col(id_col)
    text = F.col(text_col)
    kind = (
        F.when(doc_id % 3 == 0, F.lit("image"))
        .when(doc_id % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
    )
    meta = F.struct(
        (F.lit(8000) + (doc_id % 4).cast("int") * F.lit(4000)).cast("int").alias(
            "sample_rate"
        ),
        (F.lit(1000) + (F.length(text) * F.lit(13)) % F.lit(9000))
        .cast("int")
        .alias("duration_ms"),
        F.when(kind == "image", F.lit("png"))
        .when(kind == "audio", F.lit("pcm16"))
        .otherwise(F.lit("h264"))
        .alias("codec"),
    )
    return docs.select(
        doc_id.alias("media_id"),
        kind.alias("kind"),
        F.encode(text, "utf-8").alias("payload"),
        meta.alias("meta"),
    )


# ---------------------------------------------------------------------------
# decoders — real header parsing (pure Python, no codec libraries)
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: Dimensions outside (0, INT32_MAX] cannot be represented in the int32
#: FEATURES_SCHEMA columns (Arrow conversion would silently wrap), and a
#: zero dimension is how JPEG encodes "height deferred to a DNL marker" —
#: both are treated as unparseable so callers fall back deterministically.
_MAX_DIM = 0x7FFFFFFF


def _checked_dims(width: int, height: int, what: str) -> tuple[int, int]:
    if not (0 < width <= _MAX_DIM and 0 < height <= _MAX_DIM):
        raise ValueError(f"{what}: dimensions {width}x{height} out of int32 range")
    return width, height
#: JPEG SOF markers that carry frame dimensions (baseline, extended,
#: progressive, lossless, differential, arithmetic variants) — every
#: 0xC0..0xCF marker EXCEPT DHT (C4), JPG (C8) and DAC (CC).
_JPEG_SOF = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def decode_image_real(payload: bytes) -> tuple[int, int]:
    """Parse (width, height) straight from the container header — PNG
    IHDR, JPEG SOFn segment scan, or GIF logical-screen descriptor. Pure
    Python byte-offset arithmetic; raises ``ValueError`` when the payload
    is not one of those three containers (callers may then fall back)."""
    if payload.startswith(_PNG_SIG):
        # Signature (8) + IHDR length (4) + b"IHDR" (4); width/height are
        # the first two big-endian uint32 fields of the IHDR chunk data.
        if len(payload) < 24 or payload[12:16] != b"IHDR":
            raise ValueError("truncated or malformed PNG: missing IHDR")
        width = int.from_bytes(payload[16:20], "big")
        height = int.from_bytes(payload[20:24], "big")
        return _checked_dims(width, height, "malformed PNG")
    if payload[:2] == b"\xff\xd8":  # JPEG SOI
        pos = 2
        n = len(payload)
        while pos + 4 <= n:
            if payload[pos] != 0xFF:
                raise ValueError("malformed JPEG: lost marker sync")
            marker = payload[pos + 1]
            if marker == 0xFF:  # fill byte
                pos += 1
                continue
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos += 2  # standalone markers carry no length
                continue
            seg_len = int.from_bytes(payload[pos + 2 : pos + 4], "big")
            if seg_len < 2:
                raise ValueError("malformed JPEG: bad segment length")
            if marker in _JPEG_SOF:
                # SOFn: len(2) precision(1) height(2) width(2) ...
                if pos + 9 > n:
                    raise ValueError("truncated JPEG: SOF cut short")
                height = int.from_bytes(payload[pos + 5 : pos + 7], "big")
                width = int.from_bytes(payload[pos + 7 : pos + 9], "big")
                # height == 0 is legal JPEG (DNL-deferred height) but
                # unparseable without scanning entropy-coded data.
                return _checked_dims(width, height, "unsupported JPEG")
            pos += 2 + seg_len
        raise ValueError("malformed JPEG: no SOF marker before EOF")
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        if len(payload) < 10:
            raise ValueError("truncated GIF: missing screen descriptor")
        width = int.from_bytes(payload[6:8], "little")
        height = int.from_bytes(payload[8:10], "little")
        return _checked_dims(width, height, "malformed GIF")
    raise ValueError("not a PNG/JPEG/GIF payload")


def fake_decode_dims(payload: bytes) -> tuple[int, int]:
    """Deterministic fake decode: dimensions derived from the first two
    payload bytes — stands in for reading the real image header."""
    b0 = payload[0] if len(payload) > 0 else 0
    b1 = payload[1] if len(payload) > 1 else 0
    return 128 + (b0 % 8) * 64, 128 + (b1 % 8) * 48


def media_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Per-item features via Arrow-batched ``mapInPandas``: byte length,
    byte checksum, decoded dimensions. This is the genuine Python hot
    path a real decoder would occupy — batches stay columnar end-to-end,
    no shuffle, payload bytes read exactly once per item."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            dims = [dims_for(p) for p in payloads]
            # Byte checksum via numpy over the buffer protocol — sum(p)
            # iterated interpreted bytecode per BYTE (O(total payload
            # bytes) of Python), which made this query the bench's worst
            # mover at r7; frombuffer+sum is the same Arrow batch shape
            # with the per-byte work in C. uint8 sums stay exact in
            # numpy's int64 accumulator.
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) for p in payloads],
                    "checksum": [
                        int(np.frombuffer(p, dtype=np.uint8).sum()) % 65536
                        for p in payloads
                    ],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                }
            )

    def dims_for(payload: bytes) -> tuple[int, int]:
        try:
            return decode_image_real(bytes(payload))
        except ValueError:
            return fake_decode_dims(payload)

    return media.select("media_id", "kind", "payload").mapInPandas(
        extract, schema=FEATURES_SCHEMA
    )


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plan: metadata rewrite is a column expression; the pixel
    transform itself would run in the same mapInPandas slot as
    media_features (STUBBED: payload passes through unchanged)."""
    return media.withColumn(
        "meta",
        F.struct(
            F.col("meta.sample_rate"),
            F.col("meta.duration_ms"),
            F.col("meta.codec"),
            F.lit(width).alias("target_width"),
            F.lit(height).alias("target_height"),
        ),
    )


def video_frame_samples(
    media: DataFrame, interval_ms: int = 250
) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per sampled
    timestamp — pure explode of a sequence, fully JVM-side; the actual
    frame decode would be a downstream mapInPandas on (payload, ts).
    Payload is pruned from the scan (metadata-only plan)."""
    vids = media.filter(F.col("kind") == "video")
    ts = F.explode(
        F.sequence(
            F.lit(0),
            F.col("meta.duration_ms") - F.lit(1),
            F.lit(interval_ms),
        )
    ).alias("frame_ts_ms")
    out = vids.select(F.col("media_id"), ts)
    return out.withColumn(
        "frame_idx", (F.col("frame_ts_ms") / F.lit(interval_ms)).cast("int")
    )


def audio_stats(media: DataFrame) -> DataFrame:
    """Audio accounting from typed metadata only (payload never read —
    parquet column pruning keeps this scan narrow): sample count and
    PCM16 byte size."""
    aud = media.filter(F.col("kind") == "audio")
    n_samples = (
        F.col("meta.duration_ms").cast("long")
        * F.col("meta.sample_rate").cast("long")
    ) / F.lit(1000)
    return aud.select(
        "media_id",
        F.col("meta.sample_rate").alias("sample_rate"),
        F.col("meta.duration_ms").alias("duration_ms"),
        n_samples.cast("long").alias("n_samples"),
        (n_samples.cast("long") * F.lit(2)).alias("pcm16_bytes"),
    )


def phash_bytes(payload: bytes, bits: int = 64) -> int:
    """Perceptual fingerprint of one payload: a dHash over the
    downsampled byte signal. The payload is split into ``bits + 1``
    contiguous regions (byte ``i`` lands in region ``i·(bits+1) // n`` —
    the standard nearest-boundary downsample), and bit ``b`` is set when
    region ``b``'s mean byte value exceeds region ``b+1``'s. Exactly the
    dHash recipe (gradient sign over a downsampled signal, Krawetz) with
    the 9×8 grayscale row replaced by the 1-D byte stream — for real
    images the same slot would consume the pixel rows a full decoder
    yields (the container has none; ``decode_image_real`` parses headers
    only), and for audio PCM this IS the envelope-gradient hash, applied
    to the raw samples.

    Small local edits (a re-encode header rewrite, a case change, a few
    substituted bytes) perturb a handful of region means, flipping only
    the bits whose adjacent-region means were nearly tied — so near-
    identical payloads land within a small Hamming distance while the
    64-bit space keeps unrelated payloads far apart.

    Integer-exact and engine-portable: the mean comparison is the
    cross-multiplied form ``sum_b · cnt_{b+1} > sum_{b+1} · cnt_b`` (no
    float ever enters), empty regions (payloads shorter than ``bits+1``
    bytes) contribute 0-valued sums/counts so their bits are 0, and an
    empty payload fingerprints to 0 — all reproducible verbatim in
    DuckDB SQL, which is what the ``multimodal_neardup`` oracle does.
    Bit 63 is packed as its two's-complement negative (Java long / SQL
    BIGINT are signed). Products stay inside int64 for payloads up to
    ~1.5 GB (sum·cnt ≤ 255·n·(n/65+1) < 2⁶³ ⇔ n ≲ 1.5·10⁹).
    """
    n = len(payload)
    if n == 0:
        return 0
    if n > 1_500_000_000:
        # Enforce the documented product bound loudly (the same
        # fail-don't-flip policy as clustering.centroid_outliers):
        # beyond ~1.5 GB sum·cnt can exceed int64 and numpy would wrap
        # silently, flipping gradient bits.
        raise ValueError(
            f"phash_bytes: payload of {n} bytes exceeds the int64-safe "
            "bound (~1.5e9); fingerprint a bounded prefix/sample or "
            "raise the region count"
        )
    regions = bits + 1
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
    # Region r covers bytes [ceil(r·n/regions), ceil((r+1)·n/regions)).
    bounds = (
        np.arange(regions + 1, dtype=np.int64) * n + regions - 1
    ) // regions
    csum = np.concatenate((np.zeros(1, dtype=np.int64), np.cumsum(arr)))
    sums = csum[bounds[1:]] - csum[bounds[:-1]]
    cnts = bounds[1:] - bounds[:-1]
    set_bits = np.nonzero(sums[:-1] * cnts[1:] > sums[1:] * cnts[:-1])[0]
    fp = 0
    for b in set_bits:
        fp |= 1 << int(b)
    return fp - (1 << 64) if fp >= (1 << 63) else fp


def media_phash(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    bits: int = 64,
) -> DataFrame:
    """``(media_id, phash)`` — :func:`phash_bytes` per media row, run as
    Arrow-batched ``mapInPandas`` in the same slot a real pixel decoder
    would occupy (see ``media_features``): payload bytes are read ONCE,
    reduced to an 8-byte fingerprint inside the scan, and never enter an
    exchange — everything downstream (banding, verify, clustering)
    shuffles fingerprints only. 100 TB shape identical to
    ``payload_dedup``'s md5 digest, with a locality-preserving hash in
    place of a cryptographic one."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "phash": [
                        phash_bytes(bytes(p), bits)
                        for p in pdf["payload"]
                    ],
                }
            )

    return media.select(
        F.col(id_col).alias("media_id"), F.col(payload_col).alias("payload")
    ).mapInPandas(compute, schema="media_id long, phash long")


def payload_neardup(
    media: DataFrame,
    max_hamming: int = 3,
    chunks: int = 4,
    bits: int = 64,
    id_col: str = "media_id",
    payload_col: str = "payload",
    max_chunk_df: int | None = None,
) -> DataFrame:
    """Perceptual near-dup resolution over binary payloads — the
    near-dup face ``payload_dedup``'s docstring promises: re-encoded /
    lightly-edited copies (which exact-bytes dedup misses — the dominant
    duplicate mode in crawled media) cluster by fingerprint proximity.

    ``(media_id, canonical_id, cluster_size)`` over the FULL media set,
    ``canonical_id`` = min media id of the item's near-dup cluster (its
    own id when unpaired) — same survivorship contract as the text
    family's ``dedup_canonical``.

    Composition, all existing machinery: :func:`media_phash` reduces
    payloads to 64-bit dHash fingerprints inside the scan; pair finding
    reuses ``dedup.simhash_neardup_pairs`` verbatim (pigeonhole chunk
    join — with ``max_hamming < chunks`` any qualifying pair agrees on a
    full chunk, so the banded self-join is EXACT, never all-pairs;
    identical fingerprints pre-collapse to star edges; ``max_chunk_df``
    caps pathological buckets); clusters resolve through
    ``components.dedup_canonical`` (size-adaptive connected components).
    Payload bytes never shuffle anywhere in the DAG."""
    from flink_streaming_2_10_spark.pipeline.components import (
        dedup_canonical,
    )
    from flink_streaming_2_10_spark.pipeline.dedup import (
        simhash_neardup_pairs,
    )

    fps = media_phash(
        media, id_col=id_col, payload_col=payload_col, bits=bits
    ).select(F.col("media_id").alias("doc_id"), F.col("phash").alias("simhash"))
    pairs = simhash_neardup_pairs(
        fps,
        max_hamming=max_hamming,
        chunks=chunks,
        bits=bits,
        max_chunk_df=max_chunk_df,
    )
    ids = media.select(F.col(id_col).alias("doc_id"))
    return dedup_canonical(ids, pairs).select(
        F.col("doc_id").alias("media_id"), "canonical_id", "cluster_size"
    )


def payload_dedup(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Exact dedup of binary payloads — the media-column analog of
    ``dedup.exact_dedup`` (text): ``(media_id, canonical_id, n_copies,
    is_canonical)`` with the fingerprint = md5 of the raw payload
    bytes, min-id survivorship. The first curation step for any
    image/audio/video corpus (identical files re-crawled under
    different URLs); its near-dup sibling is :func:`payload_neardup`,
    which swaps the md5 for the :func:`phash_bytes` perceptual
    fingerprint to also catch re-encodes.

    100 TB shape: ONE scan reads the payload column and reduces it to
    a 16-byte digest immediately — everything that shuffles afterwards
    is (id, fingerprint); the copy-count aggregation collapses
    map-side and the posting join back is 1:1 per media row. Payload
    bytes never enter an exchange.
    """
    posts = media.select(
        F.col(id_col).alias("media_id"),
        F.md5(F.col(payload_col)).alias("__fp"),
    )
    groups = posts.groupBy("__fp").agg(
        F.min("media_id").alias("canonical_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )
    return posts.join(groups, "__fp").select(
        "media_id",
        "canonical_id",
        F.col("n_copies").cast("long").alias("n_copies"),
        (F.col("media_id") == F.col("canonical_id")).alias(
            "is_canonical"
        ),
    )
