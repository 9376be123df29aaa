"""Morfologik dictionary machinery — goldens from the reference's own
embedded test dictionary (TestMorfologikFilterFactory.kt:106-114) plus
format/encoder unit tests."""

import base64

import pytest

from lucene_kmp_spark.analysis.morfologik import (
    _CFSA2,
    _FSA5,
    _decode_stem,
    load_dictionary,
    morfologik_analyzer,
    morfologik_filter,
    parse_info,
    read_fsa,
)

# TestMorfologikFilterFactory.kt CUSTOM_DICT_BYTES / CUSTOM_INFO_BYTES
# (an FSA5 dictionary: inflected1->lemma1;tag1, inflected2->lemma2;tag2,
# INFIX encoder, ';' separator)
CUSTOM_DICT = base64.b64decode(
    "XGZzYQVfKwIAAABeBmkGbgZmBmwGZQZjBnQGZQZkBjG4ATIGOwZBBkQGRgZtBm0GYQYyBjsGdAZhBmcGMgMAOwZBBkQGRgZtBm0GYQYxBjsGdAZhBmcGMQMA"
)
CUSTOM_INFO = base64.b64decode(
    "IwojIEFuIGV4YW1wbGUgc3RlbW1pbmcgZGljdGlvbmFyeSBmaWxlIGZvciBNb3Jmb2xvZ2lr"
    "IGZpbHRlci4KIwojIENvbXBpbGUgd2l0aCBNb3Jmb2xvZ2lrLXN0ZW1taW5nLCBzZWUKIyBo"
    "dHRwczovL2dpdGh1Yi5jb20vbW9yZm9sb2dpay9tb3Jmb2xvZ2lrLXN0ZW1taW5nL3dpa2kv"
    "RXhhbXBsZXMKIwoKIyBBdXRob3Igb2YgdGhlIGRpY3Rpb25hcnkuCmZzYS5kaWN0LmF1dGhv"
    "cj1BY21lIEluYy4KCiMgRGF0ZSB0aGUgZGljdGlvbmFyeSBkYXRhIHdhcyBhc3NlbWJsZWQg"
    "KG5vdCBjb21waWxhdGlvbiB0aW1lISkuCmZzYS5kaWN0LmNyZWF0ZWQ9MjAxNS8xMC8wOCAw"
    "OToxNjowMAoKIyBUaGUgbGljZW5zZSBmb3IgdGhlIGRpY3Rpb25hcnkgZGF0YS4KZnNhLmRp"
    "Y3QubGljZW5zZT1BU0wgMi4wCgojIENoYXJhY3RlciBlbmNvZGluZyBpbnNpZGUgdGhlIGF1"
    "dG9tYXRvbiAoYW5kIGlucHV0IGZpbGUpLgpmc2EuZGljdC5lbmNvZGluZz1VVEYtOAoKIyBm"
    "aWVsZCBzZXBhcmF0b3IgKGxlbW1hO2luZmxlY3RlZDt0YWcpCmZzYS5kaWN0LnNlcGFyYXRv"
    "cj07CgojIHR5cGUgb2YgYmFzZS9sZW1tYSBjb21wcmVzc2lvbiBlbmNvZGluZyBiZWZvcmUg"
    "YXV0b21hdG9uIGNvbXByZXNzaW9uLgpmc2EuZGljdC5lbmNvZGVyPUlORklY"
)


def test_info_parse():
    md = parse_info(CUSTOM_INFO)
    assert chr(md.separator) == ";"
    assert md.encoding == "UTF-8"
    assert md.encoder == "INFIX"


def test_fsa5_header_and_dispatch():
    fsa = read_fsa(CUSTOM_DICT)
    assert isinstance(fsa, _FSA5)
    assert chr(fsa.filler) == "_"
    assert chr(fsa.annotation) == "+"
    with pytest.raises(ValueError):
        read_fsa(b"nope")


def test_lookup_reference_goldens():
    d = load_dictionary(CUSTOM_DICT, CUSTOM_INFO)
    assert d.lookup("inflected1") == [("lemma1", "tag1")]
    assert d.lookup("inflected2") == [("lemma2", "tag2")]
    assert d.lookup("nosuchword") == []
    assert d.lookup("inflected") == []  # prefix of an entry, not an entry
    assert d.lookup("inflected1x") == []  # past a terminal arc
    assert d.lookup("infl;cted") == []  # separator char in input


def test_filter_factory_golden_stream():
    """testExplicitDictionary golden: 'inflected1 inflected2' ->
    ('lemma1', 'lemma2')."""
    d = load_dictionary(CUSTOM_DICT, CUSTOM_INFO)
    f = morfologik_filter(d)
    t, p = f(["inflected1", "inflected2"], [0, 1])
    assert t == ["lemma1", "lemma2"] and p == [0, 1]


def test_filter_miss_and_lowercase_retry():
    d = load_dictionary(CUSTOM_DICT, CUSTOM_INFO)
    f = morfologik_filter(d)
    # OOV passes through (MorfologikFilter keeps unmatched tokens)
    assert f(["Glücksberg"], [0]) == (["Glücksberg"], [0])
    # exact miss, lowercase hit (the toLowercase retry)
    assert f(["INFLECTED1"], [0]) == (["lemma1"], [0])


def test_filter_multi_lemma_overlap():
    """Several lemmas emit at the same position (posIncr=0 overlap)."""
    d = load_dictionary(CUSTOM_DICT, CUSTOM_INFO)

    class Multi:
        metadata = d.metadata

        def lookup(self, w):
            if w == "liście":
                return [("liście", None), ("liść", None), ("list", None)]
            return []

    f = morfologik_filter(Multi())
    t, p = f(["liście", "x"], [0, 1])
    assert t == ["liście", "liść", "list", "x"]
    assert p == [0, 0, 0, 1]


def test_analyzer_end_to_end():
    d = load_dictionary(CUSTOM_DICT, CUSTOM_INFO)
    an = morfologik_analyzer(d)
    terms, positions, length = an("inflected1 and inflected2")
    assert terms == ["lemma1", "and", "lemma2"]
    assert positions == [0, 1, 2]
    assert length == 3


# ----------------------------------------------------------- encoder decode
@pytest.mark.parametrize(
    "encoder,word,enc,expected",
    [
        # NONE: encoded IS the stem
        ("NONE", b"abc", b"xyz", b"xyz"),
        # SUFFIX: 'B' = drop 1 trailing byte, append rest
        ("SUFFIX", b"walking", b"B", b"walkin"),
        ("SUFFIX", b"walking", b"Ded", b"walked"),
        # REMOVE_EVERYTHING (header byte 255 after -'A' wrap: chr((255+65)&0xFF))
        ("SUFFIX", b"abc", bytes([(255 + ord("A")) & 0xFF]) + b"zz", b"zz"),
        # PREFIX: drop 1 leading + 1 trailing, append
        ("PREFIX", b"xstemy", b"BBzz", b"stemzz"),
        # INFIX: drop 2 bytes at index 1, drop 1 trailing, append 'Q'
        ("INFIX", b"aXXbcd", b"BCBQ", b"abcQ"),
        ("INFIX", b"abc", b"AAA", b"abc"),
    ],
)
def test_decode_stem(encoder, word, enc, expected):
    assert _decode_stem(word, enc, encoder) == expected


# ------------------------------------------------------------------- CFSA2
def _vint(v):
    out = bytearray()
    while v >= 0x80:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)
    return bytes(out)


def test_cfsa2_traversal():
    """Hand-assembled v2 automaton accepting 'ab' and 'ac': epsilon arc ->
    root('a') -> node{'b' final, 'c' final+last}; 'b' resolves through the
    label-mapping table (index 1), the rest are explicit labels."""
    FINAL, LAST = 1 << 5, 1 << 6
    arcs = bytearray()
    arcs += bytes([LAST, 0x00]) + _vint(3)          # 0: epsilon -> root @3
    arcs += bytes([LAST, ord("a")]) + _vint(6)      # 3: 'a' -> node @6
    arcs += bytes([FINAL | 1]) + _vint(0)           # 6: 'b' via mapping[1], final, terminal
    arcs += bytes([FINAL | LAST, ord("c")]) + _vint(0)  # 8: 'c' final+last, terminal
    data = b"\\fsa" + bytes([0xC6]) + bytes([0x00, 0x07]) + bytes([2, 0, ord("b")]) + bytes(arcs)

    fsa = read_fsa(data)
    assert isinstance(fsa, _CFSA2)
    root = fsa.root()
    assert root == 3
    arc_a = fsa.get_arc(root, ord("a"))
    assert arc_a and not fsa.is_final(arc_a)
    node = fsa.dest(arc_a)
    arc_b = fsa.get_arc(node, ord("b"))
    arc_c = fsa.get_arc(node, ord("c"))
    assert fsa.is_final(arc_b) and fsa.dest(arc_b) == 0
    assert fsa.is_final(arc_c) and fsa.dest(arc_c) == 0
    assert fsa.get_arc(node, ord("z")) == 0
