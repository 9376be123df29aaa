"""Real pixel/sample decode for uncompressed containers (BMP 24-bit, PCM16
WAV): codec round-trips, hostile-input rejection, and the distributed
decode-stats pass vs an independent numpy recompute.

Reference scope note: the reference engine has no multimodal surface — this
is part of the beyond-reference training-data pipeline layer; the decode
boundary for COMPRESSED codecs (png/jpeg pixels) stays stubbed because no
codec libraries exist in the container (see COVERAGE.md)."""

import numpy as np
import pytest

from lucene_kmp_spark.pipeline.multimodal import (
    build_bmp,
    build_wav_pcm,
    decode_bmp,
    decode_media_stats,
    decode_wav_pcm,
    probe_bytes,
    synth_decodable,
)


def test_bmp_roundtrip_exact():
    rng = np.random.RandomState(7)
    for h, w in [(1, 1), (3, 5), (8, 8), (13, 31), (40, 63)]:
        img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        payload = build_bmp(img)
        back = decode_bmp(payload)
        assert back is not None and np.array_equal(back, img)
        # header probe agrees with the decoded shape
        container, pw, ph = probe_bytes(payload)[:3]
        assert (container, pw, ph) == ("bmp", w, h)


def test_bmp_row_padding_is_real():
    # w=5 -> 15-byte rows padded to 16: decode must strip the pad bytes
    img = np.arange(5 * 3 * 2, dtype=np.uint8).reshape(2, 5, 3)
    payload = build_bmp(img)
    stride_bytes = len(payload) - 54
    assert stride_bytes == 16 * 2  # padded stride, not 15*2
    assert np.array_equal(decode_bmp(payload), img)


def test_wav_pcm_roundtrip_exact():
    rng = np.random.RandomState(11)
    for rate, ch, n in [(8000, 1, 1), (16000, 2, 64), (12000, 2, 127)]:
        samples = rng.randint(-(2 ** 15), 2 ** 15, n * ch).astype("<i2")
        payload = build_wav_pcm(rate, ch, samples)
        r2, c2, s2 = decode_wav_pcm(payload)
        assert (r2, c2) == (rate, ch)
        assert np.array_equal(s2, samples)
        # duration probe over the same bytes sees the real body length
        pc = probe_bytes(payload)
        assert pc[0] == "wav" and pc[3] == rate and pc[4] == ch
        assert pc[5] == (n * ch * 2) * 1000 // (rate * ch * 2)


def test_decoders_reject_foreign_and_hostile_inputs():
    wav = build_wav_pcm(8000, 1, np.zeros(4, dtype="<i2"))
    bmp = build_bmp(np.zeros((2, 2, 3), np.uint8))
    assert decode_bmp(wav) is None
    assert decode_wav_pcm(bmp) is None
    assert decode_bmp(b"junk") is None and decode_wav_pcm(b"junk") is None
    assert decode_bmp(None) is None and decode_wav_pcm(None) is None
    # truncated body: header promises more pixels than the payload holds
    assert decode_bmp(bmp[:-4]) is None
    # 8bpp / compressed BMPs are out of decode scope -> None, not garbage
    bad_bpp = bytearray(bmp)
    bad_bpp[28] = 8
    assert decode_bmp(bytes(bad_bpp)) is None


@pytest.mark.usefixtures("spark")
def test_decode_stats_matches_numpy_recompute(spark):
    src = spark.range(0, 96).selectExpr("id AS doc_id")
    got = {
        r["media_id"]: r.asDict()
        for r in decode_media_stats(synth_decodable(spark, src)).collect()
    }
    assert len(got) == 96
    for i in range(96):
        row = got[i]
        if i % 2 == 0:
            w = 8 + (i * 7) % 56
            h = 8 + (i * 11) % 40
            x = np.arange(w, dtype=np.int64)
            r_sum = int(h * ((3 * i + 7 * x) % 256).sum())
            g_sum = int(h * ((2 * i + 5 * x) % 256).sum())
            b_sum = int(h * ((i + 3 * x) % 256).sum())
            assert row == {
                "media_id": i, "container": "bmp", "width": w, "height": h,
                "n_px": w * h, "pix_sum_r": r_sum, "pix_sum_g": g_sum,
                "pix_sum_b": b_sum, "n_samp": -1, "samp_sum": -1,
            }
        else:
            ch = 1 + (i % 4) // 2
            n = 64 + i % 64
            j = np.arange(n * ch, dtype=np.int64)
            samples = ((7 * i + 13 * (j // ch) + 17 * (j % ch)) % 2048) - 1024
            assert row == {
                "media_id": i, "container": "wav", "width": -1, "height": -1,
                "n_px": -1, "pix_sum_r": -1, "pix_sum_g": -1, "pix_sum_b": -1,
                "n_samp": n * ch, "samp_sum": int(samples.sum()),
            }


@pytest.mark.usefixtures("spark")
def test_decode_stats_unknown_payloads(spark):
    import pandas as pd

    media = spark.createDataFrame(
        pd.DataFrame({"media_id": [0, 1], "payload": [b"not a container", None]})
    )
    rows = {r["media_id"]: r["container"] for r in decode_media_stats(media).collect()}
    assert rows == {0: "unknown", 1: "unknown"}


def test_resize_nearest_identity_and_downscale():
    from lucene_kmp_spark.pipeline.multimodal import resize_nearest

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (16, 12, 3)).astype(np.uint8)
    assert np.array_equal(resize_nearest(img, 16, 12), img)  # identity
    half = resize_nearest(img, 8, 6)
    assert half.shape == (8, 6, 3)
    # floor-scale sampling: output (i, j) takes source (2i, 2j)
    assert np.array_equal(half, img[::2, ::2])
    up = resize_nearest(img, 32, 24)
    assert up.shape == (32, 24, 3)
    assert np.array_equal(up[::2, ::2], img)  # every source pixel survives


def test_audio_features_pcm_exact():
    from lucene_kmp_spark.pipeline.multimodal import audio_features_pcm

    # stereo: mix-down sums channel pairs; alternating-sign mix
    samples = np.array([100, 50, -30, -40, 20, 5, 0, 0, -7, -3], dtype=np.int16)
    n_frames, zc, sum_abs = audio_features_pcm(samples, channels=2, frame=5)
    mixed = np.array([150, -70, 25, 0, -10])
    assert n_frames == 1
    assert sum_abs == int(np.abs(mixed).sum())
    # sign path 150, -70, 25, (0 skipped), -10 -> 3 crossings
    assert zc == 3
    # frame truncation: frame bigger than the buffer -> zero frames, empty stats
    assert audio_features_pcm(samples, channels=2, frame=64) == (0, 0, 0)


@pytest.mark.usefixtures("spark")
def test_media_feature_frame_end_to_end(spark):
    from lucene_kmp_spark.pipeline.multimodal import media_feature_frame

    src = spark.range(0, 32).selectExpr("id AS doc_id")
    rows = {
        r["media_id"]: r.asDict()
        for r in media_feature_frame(synth_decodable(spark, src), frame=32).collect()
    }
    assert len(rows) == 32
    for i in range(32):
        r = rows[i]
        if i % 2 == 0:
            assert r["kind"] == "image" and len(r["thumb"]) == 8 * 8 * 3
            # recompute the thumb independently from the synthesis formula
            w = 8 + (i * 7) % 56
            h = 8 + (i * 11) % 40
            x = np.arange(w, dtype=np.int64)
            row = np.stack(
                [(3 * i + 7 * x) % 256, (2 * i + 5 * x) % 256, (i + 3 * x) % 256], axis=1
            ).astype(np.uint8)
            full = np.broadcast_to(row, (h, w, 3))
            xs = (np.arange(8, dtype=np.int64) * w) // 8
            expect = full[(np.arange(8, dtype=np.int64) * h) // 8][:, xs]
            assert r["thumb"] == [int(v) for v in expect.reshape(-1)]
        else:
            ch = 1 + (i % 4) // 2
            n = 64 + i % 64
            j = np.arange(n * ch, dtype=np.int64)
            samples = ((7 * i + 13 * (j // ch) + 17 * (j % ch)) % 2048) - 1024
            mixed = samples.reshape(-1, ch).sum(axis=1)
            n_frames = len(mixed) // 32
            mixed = mixed[: n_frames * 32]
            sign = np.sign(mixed)
            nz = sign[sign != 0]
            zc = int((nz[1:] != nz[:-1]).sum()) if len(nz) > 1 else 0
            assert r["kind"] == "audio" and r["n_frames"] == n_frames
            assert r["zero_crossings"] == zc
            assert r["sum_abs"] == int(np.abs(mixed).sum())


# ---- property forms (hypothesis): arbitrary shapes/buffers round-trip ----

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=40),
    w=st.integers(min_value=1, max_value=40),
    seed=st.integers(min_value=0, max_value=2 ** 31 - 1),
)
def test_bmp_roundtrip_property(h, w, seed):
    img = np.random.RandomState(seed).randint(0, 256, (h, w, 3)).astype(np.uint8)
    assert np.array_equal(decode_bmp(build_bmp(img)), img)


@settings(max_examples=60, deadline=None)
@given(
    ch=st.integers(min_value=1, max_value=4),
    n=st.integers(min_value=0, max_value=500),
    rate=st.sampled_from([8000, 16000, 22050, 44100]),
    seed=st.integers(min_value=0, max_value=2 ** 31 - 1),
)
def test_wav_roundtrip_property(ch, n, rate, seed):
    samples = (
        np.random.RandomState(seed)
        .randint(-(2 ** 15), 2 ** 15, n * ch)
        .astype("<i2")
    )
    r2, c2, s2 = decode_wav_pcm(build_wav_pcm(rate, ch, samples))
    assert (r2, c2) == (rate, ch) and np.array_equal(s2, samples)


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=30),
    w=st.integers(min_value=1, max_value=30),
    oh=st.integers(min_value=1, max_value=30),
    ow=st.integers(min_value=1, max_value=30),
    seed=st.integers(min_value=0, max_value=2 ** 31 - 1),
)
def test_resize_property_every_output_pixel_is_a_source_pixel(h, w, oh, ow, seed):
    from lucene_kmp_spark.pipeline.multimodal import resize_nearest

    img = np.random.RandomState(seed).randint(0, 256, (h, w, 3)).astype(np.uint8)
    out = resize_nearest(img, oh, ow)
    assert out.shape == (oh, ow, 3)
    # nearest never invents values: output (i, j) == source (i*h//oh, j*w//ow)
    for i in (0, oh - 1, oh // 2):
        for j in (0, ow - 1, ow // 2):
            assert np.array_equal(out[i, j], img[(i * h) // oh, (j * w) // ow])


@settings(max_examples=40, deadline=None)
@given(data=st.binary(min_size=0, max_size=200))
def test_decoders_never_crash_on_arbitrary_bytes(data):
    # never raises, never returns garbage shapes — None or a valid parse
    img = decode_bmp(data)
    assert img is None or (img.ndim == 3 and img.shape[2] == 3)
    wav = decode_wav_pcm(data)
    assert wav is None or (wav[0] > 0 and wav[1] > 0)
    probe_bytes(data)  # must not raise either


# ---- video (uncompressed-DIB AVI) ----

def test_avi_roundtrip_exact():
    from lucene_kmp_spark.pipeline.multimodal import build_avi, decode_avi

    rng = np.random.RandomState(5)
    for h, w, n, fps in [(1, 1, 1, 10), (4, 5, 3, 12), (16, 9, 6, 25), (7, 13, 2, 10)]:
        frames = [rng.randint(0, 256, (h, w, 3)).astype(np.uint8) for _ in range(n)]
        got = decode_avi(build_avi(frames, fps))
        assert got is not None
        f2, fr2 = got
        assert f2 == fps and len(fr2) == n
        for a, b in zip(frames, fr2):
            assert np.array_equal(a, b)


def test_avi_probe_and_rejection():
    from lucene_kmp_spark.pipeline.multimodal import (
        build_avi,
        build_wav_pcm,
        decode_avi,
    )

    frames = [np.zeros((6, 10, 3), np.uint8)] * 4
    payload = build_avi(frames, fps=20)
    pc = probe_bytes(payload)
    # probe: container, dims, and duration from avih (us/frame x frames)
    assert pc[0] == "avi" and pc[1] == 10 and pc[2] == 6
    assert pc[5] == (1_000_000 // 20) * 4 // 1000
    # foreign/hostile inputs
    assert decode_avi(build_wav_pcm(8000, 1, np.zeros(4, dtype="<i2"))) is None
    assert decode_avi(b"RIFF\x00\x00\x00\x00WAVE") is None
    assert decode_avi(b"junk") is None and decode_avi(None) is None
    assert decode_bmp(payload) is None and decode_wav_pcm(payload) is None


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=16),
    w=st.integers(min_value=1, max_value=16),
    n=st.integers(min_value=1, max_value=6),
    fps=st.sampled_from([10, 12, 15, 24, 30]),
    seed=st.integers(min_value=0, max_value=2 ** 31 - 1),
)
def test_avi_roundtrip_property(h, w, n, fps, seed):
    from lucene_kmp_spark.pipeline.multimodal import build_avi, decode_avi

    rng = np.random.RandomState(seed)
    frames = [rng.randint(0, 256, (h, w, 3)).astype(np.uint8) for _ in range(n)]
    f2, fr2 = decode_avi(build_avi(frames, fps))
    assert f2 == fps and len(fr2) == n
    for a, b in zip(frames, fr2):
        assert np.array_equal(a, b)


@settings(max_examples=30, deadline=None)
@given(data=st.binary(min_size=0, max_size=200))
def test_decode_avi_never_crashes_on_arbitrary_bytes(data):
    from lucene_kmp_spark.pipeline.multimodal import decode_avi

    got = decode_avi(data)
    assert got is None or (got[0] > 0 and len(got[1]) > 0)


@pytest.mark.usefixtures("spark")
def test_decode_video_stats_matches_numpy_recompute(spark):
    from lucene_kmp_spark.pipeline.multimodal import decode_video_stats, synth_videos

    src = spark.range(0, 48).selectExpr("id AS doc_id")
    got = {
        r["media_id"]: r.asDict()
        for r in decode_video_stats(synth_videos(spark, src)).collect()
    }
    assert len(got) == 48
    for i in range(48):
        w = 4 + (i * 5) % 28
        h = 4 + (i * 3) % 20
        nf = 2 + i % 6
        x = np.arange(w, dtype=np.int64)
        total = int(3 * h * sum(((i + 11 * f + 7 * x) % 256).sum() for f in range(nf)))
        assert got[i] == {
            "media_id": i, "container": "avi", "width": w, "height": h,
            "n_frames": nf, "fps": 10 + i % 5, "pix_sum": total,
        }
