"""Morfologik dictionary-driven lemmatization (the Polish/Ukrainian analyzer
machinery) with user-supplied dictionaries.

Reference: ``analysis/morfologik`` module — ``morfologik/fsa/FSA5.kt`` and
``CFSA2.kt`` (binary automaton formats), ``morfologik/stemming/
DictionaryLookup.kt`` (word → encoded-lemma lookup over the FSA),
``Trim{Suffix,PrefixAndSuffix,InfixAndSuffix}Encoder.kt`` + ``NoEncoder.kt``
(lemma delta codes), and ``analysis/morfologik/MorfologikFilter.kt`` (token →
all lemmas at the same position, exact-then-lowercase lookup).

The bundled Polish (morfologik-stemming) and Ukrainian dictionaries are
EXTERNAL data the reference repo itself does not contain (its gradle tasks
generate Kotlin blobs from files that must be supplied separately —
``gradle/generatePolishDicData.gradle.kts`` reads an absent ``dictFile``), so
this module takes the dictionary as input: ``load_dictionary(dict_bytes,
info_bytes)`` accepts the standard ``.dict`` (FSA5 or CFSA2 automaton) +
``.info`` (Java-properties metadata) pair any morfologik build produces.
The end-to-end goldens come from the reference's own embedded test
dictionary (``TestMorfologikFilterFactory.kt:108-114``).

Everything here is driver/executor-side plain Python: the analyzer runs
inside the tokenize UDF like every other chain (the FSA bytes ship with the
closure; lookups are in-memory automaton walks, no per-token I/O).
"""

from __future__ import annotations

from dataclasses import dataclass

_REMOVE_EVERYTHING = 255


class _FSA5:
    """morfologik/fsa/FSA5.kt: version-5 automaton. Arcs are (label byte,
    flags-in-low-bits-of-address) records; ``gtl`` = go-to field length."""

    VERSION = 5
    _BIT_FINAL, _BIT_LAST, _BIT_NEXT = 1, 2, 4

    def __init__(self, data: bytes, pos: int):
        self.filler = data[pos]
        self.annotation = data[pos + 1]
        hgtl = data[pos + 2]
        self.node_data_length = (hgtl >> 4) & 0x0F
        self.gtl = hgtl & 0x0F
        self.arcs = data[pos + 3 :]

    # -- arc primitives (FSA5.kt:63-120)
    def first_arc(self, node: int) -> int:
        return self.node_data_length + node

    def _flags(self, arc: int) -> int:
        return self.arcs[arc + 1]

    def is_final(self, arc: int) -> bool:
        return bool(self._flags(arc) & self._BIT_FINAL)

    def is_last(self, arc: int) -> bool:
        return bool(self._flags(arc) & self._BIT_LAST)

    def _is_next(self, arc: int) -> bool:
        return bool(self._flags(arc) & self._BIT_NEXT)

    def _skip_arc(self, offset: int) -> int:
        return offset + (2 if self._is_next(offset) else 1 + self.gtl)

    def next_arc(self, arc: int) -> int:
        return 0 if self.is_last(arc) else self._skip_arc(arc)

    def label(self, arc: int) -> int:
        return self.arcs[arc]

    def dest(self, arc: int) -> int:
        if self._is_next(arc):
            return self._skip_arc(arc)
        r = 0
        for i in range(self.gtl - 1, -1, -1):
            r = (r << 8) | self.arcs[arc + 1 + i]
        return r >> 3

    def get_arc(self, node: int, label: int) -> int:
        arc = self.first_arc(node)
        while arc != 0:
            if self.arcs[arc] == label:
                return arc
            arc = self.next_arc(arc)
        return 0

    def root(self) -> int:
        eps = self._skip_arc(self.first_arc(0))
        return self.dest(self.first_arc(eps))


class _CFSA2:
    """morfologik/fsa/CFSA2.kt: compact v2 automaton — flags live in the
    label byte's high bits, frequent labels index a mapping table, targets
    are v-coded ints."""

    VERSION = 0xC6
    _BIT_NEXT, _BIT_LAST, _BIT_FINAL = 1 << 7, 1 << 6, 1 << 5
    _LABEL_MASK = (1 << 5) - 1
    _FLAG_NUMBERS = 1 << 8

    def __init__(self, data: bytes, pos: int):
        flag_bits = (data[pos] << 8) | data[pos + 1]
        self.has_numbers = bool(flag_bits & self._FLAG_NUMBERS)
        mapping_size = data[pos + 2]
        self.label_mapping = data[pos + 3 : pos + 3 + mapping_size]
        self.arcs = data[pos + 3 + mapping_size :]

    @staticmethod
    def _read_vint(arr: bytes, off: int) -> int:
        b = arr[off]
        value = b & 0x7F
        shift = 7
        while b & 0x80:
            off += 1
            b = arr[off]
            value |= (b & 0x7F) << shift
            shift += 7
        return value

    def _skip_vint(self, off: int) -> int:
        while self.arcs[off] & 0x80:
            off += 1
        return off + 1

    def first_arc(self, node: int) -> int:
        return self._skip_vint(node) if self.has_numbers else node

    def is_final(self, arc: int) -> bool:
        return bool(self.arcs[arc] & self._BIT_FINAL)

    def is_last(self, arc: int) -> bool:
        return bool(self.arcs[arc] & self._BIT_LAST)

    def _is_next(self, arc: int) -> bool:
        return bool(self.arcs[arc] & self._BIT_NEXT)

    def _skip_arc(self, offset: int) -> int:
        flag = self.arcs[offset]
        offset += 1
        if (flag & self._LABEL_MASK) == 0:
            offset += 1
        if not (flag & self._BIT_NEXT):
            offset = self._skip_vint(offset)
        return offset

    def next_arc(self, arc: int) -> int:
        return 0 if self.is_last(arc) else self._skip_arc(arc)

    def label(self, arc: int) -> int:
        index = self.arcs[arc] & self._LABEL_MASK
        return self.label_mapping[index] if index > 0 else self.arcs[arc + 1]

    def dest(self, arc: int) -> int:
        if self._is_next(arc):
            cur = arc
            while not self.is_last(cur):
                cur = self.next_arc(cur)
            return self._skip_arc(cur)
        explicit = (self.arcs[arc] & self._LABEL_MASK) == 0
        return self._read_vint(self.arcs, arc + (2 if explicit else 1))

    def get_arc(self, node: int, label: int) -> int:
        arc = self.first_arc(node)
        while arc != 0:
            if self.label(arc) == label:
                return arc
            arc = self.next_arc(arc)
        return 0

    def root(self) -> int:
        return self.dest(self.first_arc(0))


def read_fsa(data: bytes):
    """Dispatch on the ``\\fsa`` magic + version byte (FSAHeader.kt)."""
    if data[:4] != b"\\fsa":
        raise ValueError("not an FSA file (bad magic)")
    version = data[4]
    if version == _FSA5.VERSION:
        return _FSA5(data, 5)
    if version == _CFSA2.VERSION:
        return _CFSA2(data, 5)
    raise ValueError(f"unsupported FSA version: 0x{version:02x}")


# -------------------------------------------------- sequence decode (lemmas)

_ENCODER_PREFIX_BYTES = {"NONE": 0, "SUFFIX": 1, "PREFIX": 2, "INFIX": 3}


def _decode_stem(word: bytes, enc: bytes, encoder: str) -> bytes:
    """The four ISequenceEncoder.decode forms (Trim*Encoder.kt / NoEncoder.kt):
    header bytes are 'A'-based counts, 255 ('A'-1 wrapped) = remove all."""
    if encoder == "NONE":
        return enc
    if encoder == "SUFFIX":
        trunc = (enc[0] - ord("A")) & 0xFF
        if trunc == _REMOVE_EVERYTHING:
            trunc = len(word)
        return word[: len(word) - trunc] + enc[1:]
    if encoder == "PREFIX":
        trunc_pre = (enc[0] - ord("A")) & 0xFF
        trunc_suf = (enc[1] - ord("A")) & 0xFF
        if _REMOVE_EVERYTHING in (trunc_pre, trunc_suf):
            trunc_pre, trunc_suf = len(word), 0
        return word[trunc_pre : len(word) - trunc_suf] + enc[2:]
    if encoder == "INFIX":
        ii = (enc[0] - ord("A")) & 0xFF
        il = (enc[1] - ord("A")) & 0xFF
        ts = (enc[2] - ord("A")) & 0xFF
        if _REMOVE_EVERYTHING in (il, ts):
            ii, il, ts = 0, len(word), 0
        len1 = len(word) - (ii + il + ts)
        return word[:ii] + word[ii + il : ii + il + len1] + enc[3:]
    raise ValueError(f"unknown sequence encoder: {encoder}")


# --------------------------------------------------------------- dictionary


@dataclass(frozen=True)
class DictionaryMetadata:
    """fsa.dict.* properties of the .info file (DictionaryMetadata.kt)."""

    separator: int = ord("+")
    encoding: str = "UTF-8"
    encoder: str = "SUFFIX"
    input_conversions: tuple = ()
    output_conversions: tuple = ()


def parse_info(info_bytes: bytes) -> DictionaryMetadata:
    """Minimal Java-properties reader for the metadata keys the lookup
    needs (DictionaryMetadataBuilder surface)."""
    props = {}
    for raw in info_bytes.decode("utf-8", errors="replace").splitlines():
        line = raw.strip()
        if not line or line.startswith("#") or "=" not in line:
            continue
        k, v = line.split("=", 1)
        props[k.strip()] = v.strip()
    sep = props.get("fsa.dict.separator", "+")
    conv_in = []
    conv_out = []
    for key, acc in (
        ("fsa.dict.input.conversion", conv_in),
        ("fsa.dict.output.conversion", conv_out),
    ):
        if key in props:
            for pair in props[key].split(","):
                if " " in pair.strip():
                    a, b = pair.strip().split(" ", 1)
                    acc.append((a, b))
    return DictionaryMetadata(
        separator=ord(sep[0]),
        encoding=props.get("fsa.dict.encoding", "UTF-8"),
        encoder=props.get("fsa.dict.encoder", "SUFFIX").upper(),
        input_conversions=tuple(conv_in),
        output_conversions=tuple(conv_out),
    )


class MorfologikDictionary:
    """``.dict`` + ``.info`` pair → ``lookup(word) -> [(stem, tag)]``
    (DictionaryLookup.kt semantics: match word bytes, descend the separator
    arc, enumerate the right language, decode each sequence)."""

    def __init__(self, fsa, metadata: DictionaryMetadata):
        self.fsa = fsa
        self.metadata = metadata
        self._root = fsa.root()

    def lookup(self, word: str) -> list[tuple[str, str | None]]:
        md = self.metadata
        if any(chr(md.separator) == ch for ch in word):
            return []
        for a, b in md.input_conversions:
            word = word.replace(a, b)
        try:
            wb = word.encode(md.encoding)
        except UnicodeEncodeError:
            return []
        fsa = self.fsa
        node = self._root
        arc = 0
        for i, b in enumerate(wb):
            arc = fsa.get_arc(node, b)
            if arc == 0:
                return []
            if i + 1 < len(wb):
                node = fsa.dest(arc)
                if node == 0:
                    return []  # word continues past a terminal arc
        if arc == 0 or fsa.dest(arc) == 0:
            return []
        sep_arc = fsa.get_arc(fsa.dest(arc), md.separator)
        if sep_arc == 0 or fsa.is_final(sep_arc):
            return []
        prefix_bytes = _ENCODER_PREFIX_BYTES[md.encoder]
        out = []
        for seq in self._right_language(fsa.dest(sep_arc)):
            sep_pos = prefix_bytes
            while sep_pos < len(seq) and seq[sep_pos] != md.separator:
                sep_pos += 1
            stem = _decode_stem(wb, seq[:sep_pos], md.encoder).decode(
                md.encoding, errors="replace"
            )
            for a, b in md.output_conversions:
                stem = stem.replace(a, b)
            tag = (
                seq[sep_pos + 1 :].decode(md.encoding, errors="replace")
                if sep_pos + 1 < len(seq)
                else None
            )
            out.append((stem, tag))
        return out

    def _right_language(self, node: int) -> list[bytes]:
        """All byte sequences from ``node`` to a final arc, in arc order
        (ByteSequenceIterator.kt DFS)."""
        fsa = self.fsa
        out: list[bytes] = []

        def walk(n: int, prefix: bytes):
            arc = fsa.first_arc(n)
            while arc != 0:
                seq = prefix + bytes([fsa.label(arc)])
                if fsa.is_final(arc):
                    out.append(seq)
                d = fsa.dest(arc)
                if d != 0:
                    walk(d, seq)
                arc = fsa.next_arc(arc)

        walk(node, b"")
        return out


def load_dictionary(dict_bytes: bytes, info_bytes: bytes) -> MorfologikDictionary:
    return MorfologikDictionary(read_fsa(dict_bytes), parse_info(info_bytes))


# ------------------------------------------------------------ token filter


def morfologik_filter(dictionary: MorfologikDictionary):
    """MorfologikFilter.kt: each token looks up exact-then-lowercased; on a
    hit the token is REPLACED by its lemmas — first lemma at the token's
    position, the rest overlapping at posIncr=0 (so the surface form only
    survives if the dictionary lists it as its own lemma, matching the
    reference's TestMorfologikAnalyzer expectations); a miss passes the
    token through unchanged."""

    def run(terms, positions):
        out_t, out_p = [], []
        for t, p in zip(terms, positions):
            lemmas = dictionary.lookup(t)
            if not lemmas:
                low = t.lower()
                if low != t:
                    lemmas = dictionary.lookup(low)
            if lemmas:
                for stem, _tag in lemmas:
                    out_t.append(stem)
                    out_p.append(p)
            else:
                out_t.append(t)
                out_p.append(p)
        return out_t, out_p

    return run


def morfologik_analyzer(dictionary: MorfologikDictionary):
    """MorfologikAnalyzer.kt chain: StandardTokenizer → MorfologikFilter
    (no lowercase stage — the filter handles case in the lookup)."""
    from lucene_kmp_spark.analysis.standard import standard_tokenize

    filt = morfologik_filter(dictionary)

    def run(text: str):
        toks = [(t.term, t.position) for t in standard_tokenize(text)]
        length = len(toks)  # field length before the posIncr=0 lemma overlap
        terms, positions = filt([t for t, _ in toks], [p for _, p in toks])
        return terms, positions, length

    return run
