"""DSIR importance resampling (pipeline/dsir.py) vs an independent scalar
model: same md5 bucket hash, same add-alpha multinomials, same Gumbel keys —
computed in plain Python over the same tiny corpus."""

import hashlib
import math
from collections import Counter

import pytest

from lucene_kmp_spark.pipeline import dsir

BUCKETS = 64
ALPHA = 0.1

RAW = [
    (0, "the cat sat on the mat"),
    (1, "quantum flux capacitor array"),
    (2, "the dog sat on the log"),
    (3, "gradient descent loss curve"),
    (4, "the cat and the dog"),
    (5, "flux array quantum descent"),
    (6, ""),
]
TARGET = [
    (100, "the cat sat"),
    (101, "the dog and the cat sat on the mat"),
]


def _bucket(ng: str, salt: str = "dsir") -> int:
    h = hashlib.md5(f"{salt}|{ng}".encode()).hexdigest()[:8]
    return int(h, 16) % BUCKETS


def _ngrams(text: str) -> list[str]:
    w = text.strip().split()
    return w + [f"{a} {b}" for a, b in zip(w, w[1:])]


def _model_weights() -> dict[int, float]:
    raw_counts = Counter(_bucket(ng) for _i, t in RAW for ng in _ngrams(t))
    tgt_counts = Counter(_bucket(ng) for _i, t in TARGET for ng in _ngrams(t))
    n_raw, n_tgt = sum(raw_counts.values()), sum(tgt_counts.values())
    out = {}
    for i, t in RAW:
        s = 0.0
        for ng in _ngrams(t):
            b = _bucket(ng)
            s += math.log((tgt_counts[b] + ALPHA) / (n_tgt + ALPHA * BUCKETS))
            s -= math.log((raw_counts[b] + ALPHA) / (n_raw + ALPHA * BUCKETS))
        out[i] = s
    return out


def _gumbel(i: int, seed: str = "dsir-gumbel") -> float:
    u32 = int(hashlib.md5(f"{seed}|{i}".encode()).hexdigest()[:8], 16)
    u = (u32 + 0.5) / 2**32
    return -math.log(-math.log(u))


@pytest.fixture(scope="module")
def frames(spark):
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    tgt = spark.createDataFrame(TARGET, "doc_id long, text string")
    return raw, tgt


def test_log_weights_match_scalar_model(frames):
    raw, tgt = frames
    got = {
        r["doc_id"]: (r["n_ngrams"], r["log_weight"])
        for r in dsir.dsir_log_weights(raw, tgt, buckets=BUCKETS, alpha=ALPHA).collect()
    }
    want = _model_weights()
    # empty doc: no ngrams -> no feature rows -> absent from the weights table
    assert set(got) == {i for i, t in RAW if t.strip()}
    for i, t in RAW:
        if not t.strip():
            continue
        n, w = got[i]
        assert n == len(_ngrams(t))
        assert w == pytest.approx(want[i], rel=1e-9)


def test_target_like_docs_outrank_dissimilar(frames):
    raw, tgt = frames
    w = {
        r["doc_id"]: r["log_weight"]
        for r in dsir.dsir_log_weights(raw, tgt, buckets=BUCKETS, alpha=ALPHA).collect()
    }
    # docs 0/2/4 share the target's vocabulary; 1/3/5 share none of it
    assert min(w[0], w[2], w[4]) > max(w[1], w[3], w[5])


def test_select_gumbel_deterministic_and_correct(frames):
    raw, tgt = frames
    sel = dsir.dsir_select(raw, tgt, k=3, buckets=BUCKETS, alpha=ALPHA)
    rows = sel.collect()
    want_w = _model_weights()
    keys = sorted(
        ((want_w[i] + _gumbel(i), i) for i, t in RAW if t.strip()),
        key=lambda x: (-x[0], x[1]),
    )
    assert [r["doc_id"] for r in rows] == [i for _k, i in keys[:3]]
    for r in rows:
        assert r["sel_key"] == pytest.approx(want_w[r["doc_id"]] + _gumbel(r["doc_id"]), rel=1e-9)
    # rerun: identical (seeded, no RNG state)
    assert [r["doc_id"] for r in sel.collect()] == [r["doc_id"] for r in rows]


def test_select_no_gumbel_is_pure_topk(frames):
    raw, tgt = frames
    rows = dsir.dsir_select(raw, tgt, k=2, buckets=BUCKETS, alpha=ALPHA, gumbel=False).collect()
    want = sorted(_model_weights().items(), key=lambda kv: (-kv[1], kv[0]))
    assert [r["doc_id"] for r in rows] == [i for i, _w in want[:2]]
