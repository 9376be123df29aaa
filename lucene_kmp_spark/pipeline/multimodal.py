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
        if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
            # fast-probe discipline: avih immediately follows 'LIST hdrl'
            # in any well-formed file; find it rather than full-walking
            j = b.find(b"avih")
            if j != -1 and j + 48 <= len(b):
                us_pf, _, _, _, total, _, _, _, aw, ah = struct.unpack(
                    "<10I", b[j + 8 : j + 48]
                )
                if aw and ah:
                    return ("avi", aw, ah, None, None, us_pf * total // 1000)
            return none6
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


# ---------------------------------------------------------------------------
# Real PIXEL/SAMPLE decode for the uncompressed containers (library-free):
# 24-bit BMP and 16-bit PCM WAV need no codec — struct + numpy read the
# actual image/audio buffers. This narrows the "decode is stubbed" boundary
# to the compressed codecs only (png/jpeg/gif pixels, lossy audio): the
# plumbing AND the decode are real for the formats stdlib can express.
# ---------------------------------------------------------------------------

DECODE_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("container", StringType()),  # bmp | wav | unknown
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_px", LongType()),
        StructField("pix_sum_r", LongType()),
        StructField("pix_sum_g", LongType()),
        StructField("pix_sum_b", LongType()),
        StructField("n_samp", LongType()),
        StructField("samp_sum", LongType()),
    ]
)


def build_bmp(pixels) -> bytes:
    """Full uncompressed 24-bit BMP (BITMAPINFOHEADER, bottom-up rows,
    4-byte row padding) from an (h, w, 3) uint8 RGB array."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    stride = (w * 3 + 3) & ~3
    body = bytearray()
    pad = b"\x00" * (stride - w * 3)
    for y in range(h - 1, -1, -1):  # bottom-up storage order
        row = px[y, :, ::-1]  # RGB -> BGR per pixel
        body += row.tobytes() + pad
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    header = b"BM" + struct.pack("<IHHI", 14 + 40 + len(body), 0, 0, 14 + 40)
    return header + info + bytes(body)


def decode_bmp(payload: bytes):
    """(h, w, 3) uint8 RGB array from an uncompressed 24-bit BMP (top-down
    or bottom-up), or None when the payload is not such a BMP."""
    import numpy as np

    b = bytes(payload or b"")
    if b[:2] != b"BM" or len(b) < 54:
        return None
    offset = struct.unpack("<I", b[10:14])[0]
    w, h_raw = struct.unpack("<ii", b[18:26])
    planes, bpp = struct.unpack("<HH", b[26:30])
    compression = struct.unpack("<I", b[30:34])[0]
    if planes != 1 or bpp != 24 or compression != 0 or w <= 0 or h_raw == 0:
        return None
    h = abs(h_raw)
    stride = (w * 3 + 3) & ~3
    if offset + stride * h > len(b):
        return None
    rows = np.frombuffer(b, dtype=np.uint8, count=stride * h, offset=offset)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if h_raw > 0:  # bottom-up -> image order
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def build_wav_pcm(sample_rate: int, channels: int, samples) -> bytes:
    """Complete RIFF/WAVE file with a real 16-bit PCM body. ``samples`` is
    int16 channel-interleaved (frame-major) of length n_frames*channels."""
    import numpy as np

    pcm = np.asarray(samples, dtype="<i2").tobytes()
    block_align = channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block_align, block_align, 16
    )
    return (
        b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )


def decode_wav_pcm(payload: bytes):
    """(sample_rate, channels, int16 interleaved array) from a 16-bit PCM
    WAV, or None when the payload is not such a WAV."""
    import numpy as np

    b = bytes(payload or b"")
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    i = 12
    rate = ch = bits = codec = None
    data = None
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        clen = struct.unpack("<I", b[i + 4 : i + 8])[0]
        if cid == b"fmt " and i + 24 <= len(b):
            codec, ch, rate, _, _, bits = struct.unpack("<HHIIHH", b[i + 8 : i + 24])
        elif cid == b"data":
            data = b[i + 8 : i + 8 + clen]
        i += 8 + clen + (clen & 1)
    if codec != 1 or bits != 16 or not rate or not ch or data is None:
        return None
    usable = len(data) - (len(data) % (2 * ch))
    return rate, ch, np.frombuffer(data[:usable], dtype="<i2")


def synth_decodable(spark, source: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic FULLY-DECODABLE containers keyed by id: even ids are
    24-bit BMPs whose pixel at column x is (R,G,B) = ((3*id+7*x)%256,
    (2*id+5*x)%256, (id+3*x)%256) on every row (row-constant, so an oracle
    sums one row and multiplies by height); odd ids are 16-bit PCM WAVs
    whose flat sample j is ((7*id + 13*(j//ch) + 17*(j%ch)) % 2048) - 1024
    with ch = 1 + (id%4)//2 (odd ids alternate mono/stereo). All parameters
    derive from the id by fixed integer arithmetic."""
    import numpy as np

    def gen(batches):
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = []
            for i in ids:
                i = int(i)
                if i % 2 == 0:
                    w = 8 + (i * 7) % 56
                    h = 8 + (i * 11) % 40
                    x = np.arange(w, dtype=np.int64)
                    row = np.stack(
                        [(3 * i + 7 * x) % 256, (2 * i + 5 * x) % 256, (i + 3 * x) % 256],
                        axis=1,
                    ).astype(np.uint8)
                    payloads.append(build_bmp(np.broadcast_to(row, (h, w, 3))))
                else:
                    rate = 8000 + (i % 3) * 4000
                    ch = 1 + (i % 4) // 2
                    n = 64 + i % 64
                    j = np.arange(n * ch, dtype=np.int64)
                    samples = ((7 * i + 13 * (j // ch) + 17 * (j % ch)) % 2048) - 1024
                    payloads.append(build_wav_pcm(rate, ch, samples))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return source.select(id_col).mapInPandas(gen, schema="media_id long, payload binary")


def decode_media_stats(
    media: DataFrame, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL decode over a binary column: route by magic, read the actual
    pixel/sample buffers (numpy over the raw bytes), reduce to exact integer
    statistics. One ``mapInPandas`` pass, no shuffle — the same batch shape
    a model-embedding decode stage uses; integer sums make the output
    bit-stable under any partitioning."""
    import numpy as np

    def gen(batches):
        for pdf in batches:
            out = []
            for mid, p in zip(pdf[id_col].astype("int64"), pdf[payload_col]):
                img = decode_bmp(p)
                if img is not None:
                    h, w, _ = img.shape
                    s = img.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                    out.append(
                        (int(mid), "bmp", w, h, w * h, int(s[0]), int(s[1]), int(s[2]), -1, -1)
                    )
                    continue
                wav = decode_wav_pcm(p)
                if wav is not None:
                    _, _, samples = wav
                    out.append(
                        (
                            int(mid), "wav", -1, -1, -1, -1, -1, -1,
                            len(samples), int(samples.sum(dtype=np.int64)),
                        )
                    )
                    continue
                out.append((int(mid), "unknown", -1, -1, -1, -1, -1, -1, -1, -1))
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "container", "width", "height", "n_px",
                    "pix_sum_r", "pix_sum_g", "pix_sum_b", "n_samp", "samp_sum",
                ],
            )

    return media.select(F.col(id_col).alias(id_col), payload_col).mapInPandas(
        gen, schema=DECODE_STATS_SCHEMA
    )


def build_avi(frames, fps: int = 10) -> bytes:
    """Minimal structurally-valid uncompressed AVI (RIFF 'AVI ': hdrl with
    avih + one 'vids' stream, movi with one '00db' DIB chunk per frame —
    bottom-up BGR rows, 4-byte padded, same layout as the BMP body).
    ``frames`` is a list of (h, w, 3) uint8 RGB arrays of equal shape."""
    import numpy as np

    fr = [np.asarray(f, dtype=np.uint8) for f in frames]
    h, w, _ = fr[0].shape
    stride = (w * 3 + 3) & ~3
    pad = b"\x00" * (stride - w * 3)

    def dib(px) -> bytes:
        body = bytearray()
        for y in range(h - 1, -1, -1):
            body += px[y, :, ::-1].tobytes() + pad
        return bytes(body)

    def chunk(cid: bytes, data: bytes) -> bytes:
        return cid + struct.pack("<I", len(data)) + data + (b"\x00" if len(data) & 1 else b"")

    def lst(typ: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", typ + data)

    us_per_frame = 1_000_000 // max(fps, 1)
    avih = struct.pack(
        "<14I", us_per_frame, stride * h * fps, 0, 0, len(fr), 0, 1, stride * h,
        w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh", b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0,
        len(fr), stride * h, 0, 0, 0, 0, w, h,
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00db", dib(f)) for f in fr))
    payload = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(payload)) + payload


def decode_avi(payload: bytes):
    """(fps, frames) from a minimal uncompressed-DIB AVI, each frame an
    (h, w, 3) uint8 RGB array, or None when the payload is not such an
    AVI. Walks RIFF LIST chunks for avih (dims / rate) and movi '00db'
    frame buffers — the same chunk discipline as the WAV reader."""
    import numpy as np

    b = bytes(payload or b"")
    if b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        return None
    w = h = fps = None
    frames = []

    def walk(lo: int, hi: int) -> None:
        nonlocal w, h, fps
        i = lo
        while i + 8 <= hi:
            cid = b[i : i + 4]
            clen = struct.unpack("<I", b[i + 4 : i + 8])[0]
            end = min(i + 8 + clen, hi)
            if cid == b"LIST":
                walk(i + 12, end)
            elif cid == b"avih" and clen >= 40:
                vals = struct.unpack("<10I", b[i + 8 : i + 48])
                us_pf, _, _, _, _, _, _, _, aw, ah = vals
                w, h = aw, ah
                fps = 1_000_000 // us_pf if us_pf else None
            elif cid == b"00db":
                frames.append((i + 8, end))
            i += 8 + clen + (clen & 1)

    try:
        walk(12, len(b))
    except (struct.error, IndexError):
        return None
    if not w or not h or w <= 0 or h <= 0 or fps is None or not frames:
        return None
    stride = (w * 3 + 3) & ~3
    out = []
    for lo, hi in frames:
        if hi - lo < stride * h:
            return None
        rows = np.frombuffer(b, dtype=np.uint8, count=stride * h, offset=lo)
        rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
        out.append(rows[::-1, :, ::-1].copy())  # bottom-up BGR -> image RGB
    return fps, out


def synth_videos(spark, source: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic fully-decodable AVI videos keyed by id: w = 4+(id*5)%28,
    h = 4+(id*3)%20, n_frames = 2+id%6, fps = 10+id%5; the pixel at frame f,
    column x is the same value on every row and channel:
    (id + 11*f + 7*x) % 256 — so an oracle recomputes the total pixel sum as
    3 * h * sum over (f, x)."""
    import numpy as np

    def gen(batches):
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = []
            for i in ids:
                i = int(i)
                w = 4 + (i * 5) % 28
                h = 4 + (i * 3) % 20
                n_frames = 2 + i % 6
                fps = 10 + i % 5
                x = np.arange(w, dtype=np.int64)
                frames = []
                for f in range(n_frames):
                    row = np.repeat(((i + 11 * f + 7 * x) % 256)[:, None], 3, axis=1)
                    frames.append(np.broadcast_to(row.astype(np.uint8), (h, w, 3)))
                payloads.append(build_avi(frames, fps))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return source.select(id_col).mapInPandas(gen, schema="media_id long, payload binary")


def decode_video_stats(
    media: DataFrame, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL video decode over a binary column: every DIB frame buffer is
    read back pixel-for-pixel and reduced to exact integer statistics
    (frame count, parsed fps, total pixel sum across frames/channels).
    Same shuffle-free ``mapInPandas`` shape as ``decode_media_stats``."""
    import numpy as np

    def gen(batches):
        for pdf in batches:
            out = []
            for mid, p in zip(pdf[id_col].astype("int64"), pdf[payload_col]):
                got = decode_avi(p)
                if got is None:
                    out.append((int(mid), "unknown", -1, -1, -1, -1, -1))
                    continue
                fps, frames = got
                h, w, _ = frames[0].shape
                total = sum(int(f.sum(dtype=np.int64)) for f in frames)
                out.append((int(mid), "avi", w, h, len(frames), fps, total))
            yield pd.DataFrame(
                out,
                columns=["media_id", "container", "width", "height", "n_frames", "fps", "pix_sum"],
            )

    return media.select(F.col(id_col).alias(id_col), payload_col).mapInPandas(
        gen,
        schema=(
            "media_id long, container string, width int, height int, "
            "n_frames long, fps int, pix_sum long"
        ),
    )


def resize_nearest(pixels, out_h: int, out_w: int):
    """Nearest-neighbor resize of an (h, w, 3) uint8 array via integer index
    maps (pure numpy fancy-indexing — the Lanczos/bilinear kernels live in
    codec libs, but nearest is exactly expressible and deterministic).
    Source index for output row i is floor(i * h / out_h) (floor-scale
    sampling), likewise for columns."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    ys = (np.arange(out_h, dtype=np.int64) * h) // out_h
    xs = (np.arange(out_w, dtype=np.int64) * w) // out_w
    return px[ys][:, xs]


def audio_features_pcm(samples, channels: int, frame: int = 256):
    """(n_frames, zero_crossings, sum_abs) over a mono mix-down of an int16
    interleaved buffer — the exact-integer core of the usual RMS/ZCR audio
    featurizer. Mix-down = per-frame channel SUM (not mean) so everything
    stays integer; zero crossings count strict sign changes between
    consecutive mixed samples, zeros pass through (sign 0 is not a
    crossing); framing truncates the tail partial frame."""
    import numpy as np

    s = np.asarray(samples, dtype=np.int64)
    usable = len(s) - (len(s) % channels)
    mixed = s[:usable].reshape(-1, channels).sum(axis=1)
    n_frames = len(mixed) // frame
    mixed = mixed[: n_frames * frame]
    sign = np.sign(mixed)
    nz = sign[sign != 0]
    crossings = int((nz[1:] != nz[:-1]).sum()) if len(nz) > 1 else 0
    return n_frames, crossings, int(np.abs(mixed).sum())


def media_feature_frame(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    thumb: int = 8,
    frame: int = 256,
) -> DataFrame:
    """Feature-extract + resize + frame-slice in one real decode pass:
    images are decoded and nearest-resized to a thumb x thumb RGB grid
    (flattened int array — the classic perceptual-hash precursor), audio is
    framed into ``frame``-sample windows with zero-crossing and magnitude
    totals. Same ``mapInPandas`` shape as ``decode_media_stats`` — at 100 TB
    this is one shuffle-free columnar scan with a Python decode kernel."""
    import numpy as np

    def gen(batches):
        for pdf in batches:
            out = []
            for mid, p in zip(pdf[id_col].astype("int64"), pdf[payload_col]):
                img = decode_bmp(p)
                if img is not None:
                    tb = resize_nearest(img, thumb, thumb)
                    out.append(
                        (int(mid), "image", [int(v) for v in tb.reshape(-1)], -1, -1, -1)
                    )
                    continue
                wav = decode_wav_pcm(p)
                if wav is not None:
                    _, ch, samples = wav
                    n_frames, zc, sum_abs = audio_features_pcm(samples, ch, frame)
                    out.append((int(mid), "audio", None, n_frames, zc, sum_abs))
                    continue
                out.append((int(mid), "unknown", None, -1, -1, -1))
            yield pd.DataFrame(
                out,
                columns=["media_id", "kind", "thumb", "n_frames", "zero_crossings", "sum_abs"],
            )

    return media.select(F.col(id_col).alias(id_col), payload_col).mapInPandas(
        gen,
        schema=(
            "media_id long, kind string, thumb array<int>, "
            "n_frames long, zero_crossings long, sum_abs long"
        ),
    )


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
