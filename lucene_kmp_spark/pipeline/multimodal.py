"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The Spark-side machinery (schemas, Arrow batch shapes, ``mapInPandas``
signatures, partitioning) is real and tested; the actual codec calls are
STUBBED behind ``_decode_image_bytes`` (the image/audio libraries are not in
this container). Swapping in PIL/torchaudio is a one-function change — batch
shapes and schemas stay identical.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),      # image | audio | video
        StructField("payload", BinaryType()),   # opaque encoded bytes
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("digest", StringType()),
        StructField("feature", ArrayType(FloatType())),  # fixed-dim embedding
    ]
)

FEATURE_DIM = 16


def _decode_image_bytes(payload: bytes) -> list[float]:
    """STUB decode: deterministic fake feature from the payload digest.

    Real implementation: PIL.Image.open(io.BytesIO(payload)) -> resize ->
    normalized pixel stats / model embedding. Raises nothing here so the
    distributed plumbing is exercised end-to-end with the fake."""
    d = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in d[:FEATURE_DIM]]


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes) for tests."""
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (F.pmod(F.col("id"), 3) + 1).cast("int")).alias("kind"),
        F.sha2(F.concat(F.lit(str(seed)), F.col("id").cast("string")), 256).cast("binary").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(64).alias("width"),
        F.lit(64).alias("height"),
        F.lit(1000).alias("duration_ms"),
    )


def extract_features(media: DataFrame, batch_hint: int = 256) -> DataFrame:
    """Decode + feature-extract via ``mapInPandas`` (Arrow batches of encoded
    payloads in, fixed-dim float vectors out). At 100 TB this is the only
    Python stage; everything around it stays columnar."""

    def gen(batches):
        for pdf in batches:
            feats = [_decode_image_bytes(bytes(p) if p is not None else b"") for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(bytes(p)) if p is not None else 0 for p in pdf["payload"]],
                    "digest": [hashlib.sha256(bytes(p) if p is not None else b"").hexdigest() for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(gen, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 200) -> DataFrame:
    """Video frame-sampling plumbing: explode a deterministic frame timeline
    (decode stubbed; the row-explosion + partitioning is the real part)."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))).alias("frame_ms"),
        )
    )


# ---------------------------------------------------------------------------
# Real container parsing (library-free): the decode step every multimodal
# pipeline starts with — sniff the container and read its header metadata
# (dimensions / sample rate / duration) straight from the bytes. Pure
# stdlib (struct/zlib), vectorized per Arrow batch; PIXEL decoding still
# needs codec libs and stays stubbed, but the byte-level probe is the part
# a 100 TB curation pass actually runs on every object (filter by dims /
# duration before paying for decode).
# ---------------------------------------------------------------------------

import struct
import zlib

PROBE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("container", StringType()),   # png|jpeg|gif|bmp|wav|unknown
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)


def build_png(width: int, height: int) -> bytes:
    """Minimal VALID PNG (signature + CRC-correct IHDR + IEND, no IDAT)."""
    ihdr = struct.pack(">II5B", width, height, 8, 6, 0, 0, 0)
    def chunk(typ: bytes, data: bytes) -> bytes:
        return struct.pack(">I", len(data)) + typ + data + struct.pack(
            ">I", zlib.crc32(typ + data) & 0xFFFFFFFF
        )
    return b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"IEND", b"")


def build_jpeg(width: int, height: int) -> bytes:
    """Minimal JPEG: SOI + APP0(JFIF) + SOF0 carrying the dimensions + EOI."""
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    sof0 = b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, height, width, 3) + b"\x01\x11\x00\x02\x11\x01\x03\x11\x01"
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def build_gif(width: int, height: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", width, height) + b"\x00\x00\x00;"


def build_wav(sample_rate: int, channels: int, n_samples: int) -> bytes:
    """RIFF/WAVE header (fmt + data chunk header, body elided): the metadata
    a duration probe reads. 16-bit PCM."""
    block_align = channels * 2
    byte_rate = sample_rate * block_align
    data_size = n_samples * block_align
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, block_align, 16)
    return (
        b"RIFF" + struct.pack("<I", 36 + data_size) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", data_size)
    )


def probe_bytes(payload: bytes) -> tuple:
    """(container, width, height, sample_rate, channels, duration_ms) from
    raw bytes; 'unknown' + NULLs when nothing parses. Validates structure it
    reads (magic, chunk walk, marker walk) but not CRCs — the fast-probe
    discipline of production samplers."""
    none6 = ("unknown", None, None, None, None, None)
    if payload is None:
        return none6
    b = bytes(payload)
    try:
        if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24 and b[12:16] == b"IHDR":
            w, h = struct.unpack(">II", b[16:24])
            return ("png", w, h, None, None, None)
        if b[:2] == b"\xff\xd8":
            i = 2
            while i + 4 <= len(b):
                if b[i] != 0xFF:
                    break
                marker = b[i + 1]
                if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7:
                    i += 2
                    continue
                seglen = struct.unpack(">H", b[i + 2 : i + 4])[0]
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                    return ("jpeg", w, h, None, None, None)
                i += 2 + seglen
            return none6
        if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
            w, h = struct.unpack("<HH", b[6:10])
            return ("gif", w, h, None, None, None)
        if b[:2] == b"BM" and len(b) >= 26:
            w, h = struct.unpack("<ii", b[18:26])
            return ("bmp", w, abs(h), None, None, None)
        if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            i = 12
            rate = ch = byte_rate = None
            data_size = None
            while i + 8 <= len(b):
                cid = b[i : i + 4]
                clen = struct.unpack("<I", b[i + 4 : i + 8])[0]
                if cid == b"fmt " and i + 24 <= len(b):
                    _, ch, rate, byte_rate, _, _ = struct.unpack("<HHIIHH", b[i + 8 : i + 24])
                elif cid == b"data":
                    data_size = clen
                i += 8 + clen + (clen & 1)
            if rate and byte_rate and data_size is not None:
                return ("wav", None, None, rate, ch, data_size * 1000 // byte_rate)
            return none6
    except (struct.error, IndexError):
        return none6
    return none6


def probe_media(media: DataFrame, id_col: str = "media_id", payload_col: str = "payload") -> DataFrame:
    """Container probe over a binary column: one ``mapInPandas`` pass, no
    shuffle — the decode-stage front door (filter/route by container and
    header metadata before any expensive pixel/sample decode)."""

    def gen(batches):
        for pdf in batches:
            rows = [probe_bytes(p) for p in pdf[payload_col]]
            out = pd.DataFrame(rows, columns=["container", "width", "height", "sample_rate", "channels", "duration_ms"])
            out.insert(0, "media_id", pdf[id_col].to_numpy())
            for c in ("width", "height", "sample_rate", "channels", "duration_ms"):
                out[c] = out[c].astype("Int32")
            yield out

    return media.select(F.col(id_col).alias(id_col), payload_col).mapInPandas(gen, schema=PROBE_SCHEMA)


def synth_containers(spark, source: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL container files keyed by id: media_id % 4 picks
    png/jpeg/gif/wav; dimensions / audio params derive from the id by fixed
    integer arithmetic (so an oracle can recompute them without parsing)."""

    def gen(batches):
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = []
            for i in ids:
                i = int(i)
                w = 1 + (i * 7) % 4000
                h = 1 + (i * 11) % 3000
                k = i % 4
                if k == 0:
                    payloads.append(build_png(w, h))
                elif k == 1:
                    payloads.append(build_jpeg(w, h))
                elif k == 2:
                    payloads.append(build_gif(w % 60000, h % 60000))
                else:
                    rate = 8000 + (i % 5) * 8000
                    ch = 1 + i % 2
                    payloads.append(build_wav(rate, ch, 1000 + i % 5000))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return source.select(id_col).mapInPandas(
        gen, schema="media_id long, payload binary"
    )
