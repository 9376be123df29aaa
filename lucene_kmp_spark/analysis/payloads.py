"""Payload token filters (``analysis/common/.../analysis/payloads/``).

``DelimitedPayloadTokenFilter.kt`` splits each token at the first
delimiter and attaches the encoded remainder as the occurrence's payload.
The engine stores one non-negative int payload per occurrence
(``build_index(payload_fn=...)``, PostingsEnum.PAYLOADS analog), so the
reference's three encoders map onto ints:

* ``int``   — IntegerEncoder.kt: decimal string -> int
* ``float`` — FloatEncoder.kt: float string -> float32 bits (uint32)
* ``identity`` — IdentityEncoder.kt: UTF-8 bytes -> big-endian int

:func:`delimited_payload_components` returns an ``(analyzer, payload_fn)``
pair wired through shared per-document state: the analyzer strips the
delimiter and records each occurrence's payload; ``payload_fn`` (called by
the builder for the same document immediately after) looks it up by
position. Both close over the same state and ship to executors together.
"""
from __future__ import annotations

import struct

DEFAULT_DELIMITER = "|"


def encode_int_payload(s: str) -> int:
    return int(s)


def encode_float_payload(s: str) -> int:
    return struct.unpack("<I", struct.pack("<f", float(s)))[0]


def decode_float_payload(v: int) -> float:
    return struct.unpack("<f", struct.pack("<I", v))[0]


def encode_identity_payload(s: str) -> int:
    b = s.encode("utf-8")
    return int.from_bytes(b, "big") if b else 0


def decode_identity_payload(v: int) -> str:
    if v == 0:
        return ""
    return v.to_bytes((v.bit_length() + 7) // 8, "big").decode("utf-8")


_ENCODERS = {
    "int": encode_int_payload,
    "float": encode_float_payload,
    "identity": encode_identity_payload,
}


def _whitespace_tokenize_offsets(text: str):
    """whitespace tokens with (term, start, end) offsets."""
    out = []
    start = None
    for i, c in enumerate(text):
        if c.isspace():
            if start is not None:
                out.append((text[start:i], start, i))
                start = None
        elif start is None:
            start = i
    if start is not None:
        out.append((text[start:], start, len(text)))
    return out


def delimited_payload_components(delimiter: str = DEFAULT_DELIMITER,
                                 encoder: str = "identity",
                                 lowercase: bool = False):
    """(analyzer, payload_fn) for ``build_index(analyzer=...,
    index_options="offsets", payload_fn=...)``. Tokens without a
    delimiter get payload 0 (the reference leaves the attribute null)."""
    enc = _ENCODERS[encoder] if isinstance(encoder, str) else encoder
    state: dict[int, int] = {}        # position -> encoded payload

    def analyzer(text: str):
        state.clear()
        if not text:
            return [], [], [], [], 0
        terms, positions, starts, ends = [], [], [], []
        for pos, (raw, s, e) in enumerate(_whitespace_tokenize_offsets(text)):
            cut = raw.find(delimiter)
            if cut >= 0:
                term = raw[:cut]
                state[pos] = enc(raw[cut + 1:])
            else:
                term = raw
            if lowercase:
                term = term.lower()
            terms.append(term)
            positions.append(pos)
            starts.append(s)
            ends.append(s + (cut if cut >= 0 else len(raw)))
        return terms, positions, starts, ends, len(terms)

    def payload_fn(term: str, position: int, start: int, end: int) -> int:
        return state.get(position, 0)

    return analyzer, payload_fn
