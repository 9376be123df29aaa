"""Bloom-filtered term dictionaries (``codecs/bloom`` analog).

Reference: ``codecs/bloom/FuzzySet.kt`` (MurmurHash3 x64/128 seeded 104729,
(2^n - 1)-masked bitset sizes for AND-modulo downsizing, k positions
``(lsb + i*msb).toInt() & bloomSize``), ``BloomFilteringPostingsFormat.kt``
(per-segment per-field filter consulted before the terms dict to answer
"definitely absent" without IO), ``DefaultBloomFilterFactory.kt``
(optimal set at fpp 0.1023, discard when saturation > 0.9).

Spark-first shape: the reference consults the filter per ``seekExact`` to
skip a terms-dict lookup inside one segment; at 100 TB the analogous win is
skipping WHOLE SEGMENTS — a pruned :class:`SegmentedReader` never unions a
segment whose bloom proves the query's required terms absent, so those
parquet files are not in the scan at all (no tasks, no IO, no listing).
Filter construction is distributed: each term-dict partition folds its
terms into a local bitset inside ``mapInPandas`` (vectorized murmur over
length-grouped byte matrices) and the driver ORs the per-partition bitsets
— collect traffic is ``num_partitions × filter bytes`` (metadata-scale),
never vocabulary-scale rows.
"""

from __future__ import annotations

import base64
import struct

import numpy as np

_SEED = 104729  # StringHelper.murmurhash3_x64_128(BytesRef) seed
_C1 = np.uint64(0x87C37B91114253D5)
_C2 = np.uint64(0x4CF5AD432745937F)

# (1 << (i + 6)) - 1 for i in 0..25 — all-ones sizes so downsizing and the
# position mask are a single AND (FuzzySet.usableBitSetSizes)
USABLE_BITSET_SIZES = [(1 << (i + 6)) - 1 for i in range(26)]

_ERR = {"over": "ignore"}  # wraparound uint64 arithmetic is intentional


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    return (x << np.uint64(r)) | (x >> np.uint64(64 - r))


def _fmix(k: np.ndarray) -> np.ndarray:
    k = k ^ (k >> np.uint64(33))
    k = k * np.uint64(0xFF51AFD7ED558CCD)
    k = k ^ (k >> np.uint64(33))
    k = k * np.uint64(0xC4CEB9FE1A85EC53)
    return k ^ (k >> np.uint64(33))


def murmur3_x64_128(values: list[bytes], seed: int = _SEED) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized MurmurHash3 x64/128 over a batch of byte strings.

    Returns ``(msb, lsb)`` uint64 arrays = the reference's ``hash[0]``,
    ``hash[1]``. Values are grouped by byte length so every group is a
    dense (n, L) uint8 matrix processed with whole-array ops — zero-padded
    16-byte blocks make the tail XOR-accumulation a plain little-endian
    uint64 load (zero bytes contribute nothing to the XOR chain).
    """
    n = len(values)
    msb = np.zeros(n, dtype=np.uint64)
    lsb = np.zeros(n, dtype=np.uint64)
    if n == 0:
        return msb, lsb
    lens = np.fromiter((len(v) for v in values), dtype=np.int64, count=n)
    order = np.argsort(lens, kind="stable")
    with np.errstate(**_ERR):
        start = 0
        while start < n:
            L = int(lens[order[start]])
            stop = start
            while stop < n and lens[order[stop]] == L:
                stop += 1
            idx = order[start:stop]
            h1, h2 = _murmur_group([values[i] for i in idx], L, seed)
            msb[idx] = h1
            lsb[idx] = h2
            start = stop
    return msb, lsb


def _murmur_group(vals: list[bytes], length: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    g = len(vals)
    h1 = np.full(g, np.uint64(seed & 0xFFFFFFFF), dtype=np.uint64)
    h2 = h1.copy()
    padded = (length + 15) >> 4 << 4
    if padded:
        buf = np.zeros((g, padded), dtype=np.uint8)
        if length:
            flat = np.frombuffer(b"".join(vals), dtype=np.uint8)
            buf[:, :length] = flat.reshape(g, length)
        words = buf.view("<u8").reshape(g, padded >> 3)
    nblocks = length >> 4
    for i in range(nblocks):
        k1 = words[:, 2 * i].astype(np.uint64)
        k2 = words[:, 2 * i + 1].astype(np.uint64)
        k1 = _rotl(k1 * _C1, 31) * _C2
        h1 = _rotl(h1 ^ k1, 27) + h2
        h1 = h1 * np.uint64(5) + np.uint64(0x52DCE729)
        k2 = _rotl(k2 * _C2, 33) * _C1
        h2 = _rotl(h2 ^ k2, 31) + h1
        h2 = h2 * np.uint64(5) + np.uint64(0x38495AB5)
    tail = length & 0x0F
    if tail:
        k1 = words[:, 2 * nblocks].astype(np.uint64)
        if tail > 8:
            k2 = words[:, 2 * nblocks + 1].astype(np.uint64)
            h2 = h2 ^ (_rotl(k2 * _C2, 33) * _C1)
        h1 = h1 ^ (_rotl(k1 * _C1, 31) * _C2)
    ln = np.uint64(length)
    h1 = h1 ^ ln
    h2 = h2 ^ ln
    h1 = h1 + h2
    h2 = h2 + h1
    h1 = _fmix(h1)
    h2 = _fmix(h2)
    h1 = h1 + h2
    h2 = h2 + h1
    return h1, h2


def murmur3_x64_128_scalar(data: bytes, seed: int = _SEED) -> tuple[int, int]:
    """Independent scalar implementation of the same published algorithm
    (used only as the test oracle for the vectorized path)."""
    mask = (1 << 64) - 1

    def rotl(x, r):
        return ((x << r) | (x >> (64 - r))) & mask

    def fmix(k):
        k ^= k >> 33
        k = (k * 0xFF51AFD7ED558CCD) & mask
        k ^= k >> 33
        k = (k * 0xC4CEB9FE1A85EC53) & mask
        return k ^ (k >> 33)

    c1, c2 = 0x87C37B91114253D5, 0x4CF5AD432745937F
    h1 = h2 = seed & 0xFFFFFFFF
    length = len(data)
    nblocks = length >> 4
    for i in range(nblocks):
        k1 = int.from_bytes(data[16 * i : 16 * i + 8], "little")
        k2 = int.from_bytes(data[16 * i + 8 : 16 * i + 16], "little")
        k1 = (rotl((k1 * c1) & mask, 31) * c2) & mask
        h1 = (rotl(h1 ^ k1, 27) + h2) & mask
        h1 = (h1 * 5 + 0x52DCE729) & mask
        k2 = (rotl((k2 * c2) & mask, 33) * c1) & mask
        h2 = (rotl(h2 ^ k2, 31) + h1) & mask
        h2 = (h2 * 5 + 0x38495AB5) & mask
    tail = data[nblocks * 16 :]
    k1 = int.from_bytes(tail[:8].ljust(8, b"\0"), "little")
    k2 = int.from_bytes(tail[8:].ljust(8, b"\0"), "little")
    if len(tail) > 8:
        h2 ^= (rotl((k2 * c2) & mask, 33) * c1) & mask
    if len(tail) > 0:
        h1 ^= (rotl((k1 * c1) & mask, 31) * c2) & mask
    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & mask
    h2 = (h2 + h1) & mask
    h1 = fmix(h1)
    h2 = fmix(h2)
    h1 = (h1 + h2) & mask
    h2 = (h2 + h1) & mask
    return h1, h2


def _nearest_set_size_bits(max_bits: int) -> int:
    result = USABLE_BITSET_SIZES[0]
    for s in USABLE_BITSET_SIZES:
        if s <= max_bits:
            result = s
    return result


class FuzzySet:
    """Probabilistic term set: MAYBE or NO, never a false negative.

    Bit positions for a value: ``(lsb + i*msb) & bloom_size`` for
    ``i in 0..hash_count-1`` over the murmur 128-bit halves — identical to
    ``FuzzySet.kt`` (Kotlin's ``toInt()`` truncates to the low 32 bits and
    ``bloom_size`` masks low bits, so masking the uint64 directly agrees).
    """

    MAYBE = "maybe"
    NO = "no"

    def __init__(self, bits: np.ndarray, bloom_size: int, hash_count: int):
        assert bits.dtype == np.uint64 and len(bits) == (bloom_size + 1) >> 6
        self.bits = bits
        self.bloom_size = bloom_size
        self.hash_count = hash_count

    # ------------------------------------------------------------ factories
    @classmethod
    def create_optimal_set(cls, max_unique_values: int, target_fpp: float = 0.1023) -> "FuzzySet":
        """FuzzySet.createOptimalSet: size for target false-positive rate,
        k = round(size/n * ln 2)."""
        import math

        n = max(1, max_unique_values)
        set_size = math.ceil((n * math.log(target_fpp)) / math.log(1.0 / (2.0 ** math.log(2.0))))
        set_size = _nearest_set_size_bits(2 * set_size)
        k = max(1, round((set_size / n) * math.log(2.0)))
        return cls(np.zeros((set_size + 1) >> 6, dtype=np.uint64), set_size, k)

    @classmethod
    def create_set_based_on_max_memory(cls, max_num_bytes: int) -> "FuzzySet":
        set_size = _nearest_set_size_bits(max_num_bytes * 8)
        return cls(np.zeros((set_size + 1) >> 6, dtype=np.uint64), set_size, 1)

    # ------------------------------------------------------------ add/query
    def _positions(self, msb: np.ndarray, lsb: np.ndarray, i: int) -> np.ndarray:
        with np.errstate(**_ERR):
            return (lsb + np.uint64(i) * msb) & np.uint64(self.bloom_size)

    def add_values(self, values: list[bytes]):
        msb, lsb = murmur3_x64_128(values)
        self.add_hashes(msb, lsb)

    def add_hashes(self, msb: np.ndarray, lsb: np.ndarray):
        for i in range(self.hash_count):
            pos = self._positions(msb, lsb, i)
            np.bitwise_or.at(self.bits, (pos >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (pos & np.uint64(63)))

    def contains_batch(self, values: list[bytes]) -> np.ndarray:
        """Boolean array: True = MAYBE present, False = definitely absent."""
        msb, lsb = murmur3_x64_128(values)
        out = np.ones(len(values), dtype=bool)
        for i in range(self.hash_count):
            pos = self._positions(msb, lsb, i)
            word = self.bits[(pos >> np.uint64(6)).astype(np.int64)]
            out &= (word >> (pos & np.uint64(63))) & np.uint64(1) != 0
        return out

    def contains(self, value: bytes) -> str:
        return self.MAYBE if bool(self.contains_batch([value])[0]) else self.NO

    # ------------------------------------------------------------ lifecycle
    @property
    def saturation(self) -> float:
        set_bits = int(np.unpackbits(self.bits.view(np.uint8)).sum())
        return set_bits / self.bloom_size

    def downsize(self, target_max_saturation: float = 0.5) -> "FuzzySet | None":
        """FuzzySet.downsize: remap every set bit with an AND of the smaller
        all-ones size; None when even the smallest set stays oversaturated."""
        num_set = int(np.unpackbits(self.bits.view(np.uint8)).sum())
        right_size = self.bloom_size
        for cand in USABLE_BITSET_SIZES:
            if cand >= self.bloom_size:
                break
            if num_set / cand <= target_max_saturation:
                right_size = cand
                break
        if right_size == self.bloom_size:
            return None
        words = (right_size + 1) >> 6
        new_bits = np.zeros(words, dtype=np.uint64)
        set_idx = np.flatnonzero(np.unpackbits(self.bits.view(np.uint8), bitorder="little"))
        remapped = set_idx & right_size
        np.bitwise_or.at(new_bits, remapped >> 6, np.uint64(1) << (remapped & 63).astype(np.uint64))
        return FuzzySet(new_bits, right_size, self.hash_count)

    def union_(self, other: "FuzzySet"):
        assert other.bloom_size == self.bloom_size and other.hash_count == self.hash_count
        self.bits |= other.bits

    # ---------------------------------------------------------- persistence
    def serialize(self) -> bytes:
        return struct.pack("<4sII", b"FZY1", self.hash_count, self.bloom_size) + self.bits.tobytes()

    @classmethod
    def deserialize(cls, raw: bytes) -> "FuzzySet":
        magic, hash_count, bloom_size = struct.unpack("<4sII", raw[:12])
        if magic != b"FZY1":
            raise ValueError("not a FuzzySet blob")
        bits = np.frombuffer(raw[12:], dtype=np.uint64).copy()
        return cls(bits, bloom_size, hash_count)

    def to_b64(self) -> str:
        return base64.b64encode(self.serialize()).decode("ascii")

    @classmethod
    def from_b64(cls, s: str) -> "FuzzySet":
        return cls.deserialize(base64.b64decode(s))


# --------------------------------------------------------------- distributed
def bloom_from_term_dict(term_dict, num_terms: int, target_fpp: float = 0.1023,
                         downsize_saturation: float = 0.5,
                         saturated_ceiling: float = 0.9) -> FuzzySet | None:
    """Build a segment's term bloom from its term_dict DataFrame.

    One ``mapInPandas`` pass folds each partition's terms into a local
    bitset (vectorized murmur); the driver ORs ``num_partitions`` bitsets.
    Returns None when the filter would be useless (saturation > 0.9),
    mirroring DefaultBloomFilterFactory.isSaturated.
    """
    proto = FuzzySet.create_optimal_set(num_terms, target_fpp)
    bloom_size, hash_count, words = proto.bloom_size, proto.hash_count, len(proto.bits)

    def fold(batches):
        import pandas as pd

        local = FuzzySet(np.zeros(words, dtype=np.uint64), bloom_size, hash_count)
        any_rows = False
        for pdf in batches:
            if len(pdf):
                any_rows = True
                local.add_values([t.encode("utf-8") for t in pdf["term"]])
        if any_rows:
            yield pd.DataFrame({"bits": [local.bits.tobytes()]})

    parts = term_dict.select("term").mapInPandas(fold, schema="bits binary").collect()
    out = FuzzySet(np.zeros(words, dtype=np.uint64), bloom_size, hash_count)
    for row in parts:
        out.bits |= np.frombuffer(row["bits"], dtype=np.uint64)
    if out.saturation > saturated_ceiling:
        return None
    sized = out.downsize(downsize_saturation)
    return sized if sized is not None else out


def segment_may_match(query, contains) -> bool:
    """Conservative per-segment admission test: False ONLY when the bloom
    proves the query cannot match any doc in the segment (a required term
    is definitely absent, or no branch of a disjunction can be present).

    ``contains(term) -> bool`` is the segment's MAYBE test. Query shapes
    the bloom cannot reason about (multi-term expansion, ranges, regex,
    match-all, filters over stored columns) return True — never prune on
    uncertainty. Mirrors what BloomFilteringPostingsFormat's terms enum
    guarantees per seekExact: NO is authoritative, MAYBE is not.
    """
    from lucene_kmp_spark.search import query as q

    if isinstance(query, q.TermQuery):
        return contains(query.term)
    if isinstance(query, q.SynonymQuery):
        return any(contains(t) for t in query.terms)
    if isinstance(query, q.NGramPhraseQuery):
        return all(contains(t) for t in query.terms)
    if isinstance(query, q.PhraseQuery):
        return all(contains(t) for t in query.terms)
    if isinstance(query, q.MultiPhraseQuery):
        return all(any(contains(t) for t in slot) for slot in query.slots)
    if isinstance(query, q.ConstantScoreQuery):
        return segment_may_match(query.query, contains)
    if isinstance(query, q.MatchNoDocsQuery):
        return False
    if isinstance(query, q.DisjunctionMaxQuery):
        return any(segment_may_match(c, contains) for c in query.queries)
    if isinstance(query, q.BooleanQuery):
        for c in query.clauses:
            if c.occur in (q.Occur.MUST, q.Occur.FILTER) and not segment_may_match(c.query, contains):
                return False
        should = [c for c in query.clauses if c.occur == q.Occur.SHOULD]
        required = [c for c in query.clauses if c.occur in (q.Occur.MUST, q.Occur.FILTER)]
        if should and not required:
            return any(segment_may_match(c.query, contains) for c in should)
        return True
    return True
