"""Horn-of-Africa lexicon lookups shared by the Amharic and Oromo chains.

Replays the reference's ``analysis/horn/.../horn/HornLexicons.kt`` over the
vendored HornMorpho data (``horn_data.py``): a lexicon of
``surface -> lemma`` analyses plus a known-word set, consulted with one
prefix strip and up to two suffix strips. The compile-time variant
expansion (``generateHornData.gradle.kts`` ``addGeneratedVariants``) is
replayed lazily here so the vendored data stays raw. Amharic terms are
transliterated Ge'ez -> simplified SERA before lookup
(``HornLexicons.kt`` ``toSimplifiedSera``/``simplifySera``).
"""
from __future__ import annotations

from functools import lru_cache

# HornLexicons.kt AMHARIC_PREFIXES / AMHARIC_SUFFIXES / OROMO_SUFFIXES
AMHARIC_PREFIXES = ("'nde", "yemay", "yal", "le", "be", "ke", "ye", "s")
AMHARIC_SUFFIXES = (
    "Wocacnm", "Wocacn", "Wocnm", "Wocn", "Wocm", "Woc",
    "ocacnm", "ocacn", "ocnm", "ocn", "ocm", "oc",
    "ac_ew", "c_ew", "cnm", "cn", "m", "n", "s",
)
OROMO_SUFFIXES = (
    "oota", "wwan", "leen", "oota", "tti", "irra", "iin", "aan", "een",
    "manii", "mani", "ani", "ne", "te", "tu", "ti", "ni", "n",
)

# generateHornData.gradle.kts companion arrays (compile-time expansion)
_AM_GEN_PREFIXES = ("ye", "le", "be", "ke", "s", "'nde")
_AM_GEN_SUFFIXES = (
    "oc", "ocn", "ocm", "ocnm", "acn", "acnm",
    "Woc", "Wocn", "Wocm", "Wocnm", "N_a", "n_et", "m", "n", "s",
)
_AM_GEN_COMBINED = ("oc", "ocn", "Woc", "Wocn", "m", "n")
_OM_GEN_SUFFIXES = (
    "oota", "wwan", "leen", "tti", "irra", "iin", "aan", "een",
    "ummaa", "n", "ni",
)


def _should_expand(token: str) -> bool:
    if len(token) < 3:
        return False
    return not any(c in "[]{}" for c in token)


def _expand(data: str, prefixes, suffixes, combined) -> tuple[set, dict]:
    """addGeneratedVariants semantics: variants added putIfAbsent in base
    insertion order, then parsed exactly like the generated blob."""
    entries: dict[str, str] = {}
    for line in data.split("\n"):
        if not line:
            continue
        tab = line.find("\t")
        if tab < 0:
            entries.setdefault(line, line)
        else:
            entries[line[:tab]] = line[tab + 1:]
    for surface, lemma in list(entries.items()):
        if not _should_expand(surface) or not _should_expand(lemma):
            continue
        for suffix in suffixes:
            entries.setdefault(surface + suffix, lemma)
        for prefix in prefixes:
            entries.setdefault(prefix + surface, lemma)
            for suffix in combined:
                entries.setdefault(prefix + surface + suffix, lemma)
    words, analyses = set(), {}
    for surface, lemma in entries.items():
        words.add(lemma)
        if lemma != surface:
            analyses[surface] = lemma
        else:
            words.add(surface)
    return words, analyses


class Lexicon:
    """HornLexicons.Lexicon.lookup: analyses/word hit, one prefix strip,
    up to two suffix strips."""

    def __init__(self, words: set, analyses: dict,
                 prefixes: tuple, suffixes: tuple):
        self.words = words
        self.analyses = analyses
        self.prefixes = prefixes
        self.suffixes = suffixes

    def lookup(self, term: str) -> str | None:
        hit = self.analyses.get(term)
        if hit is not None:
            return hit
        if term in self.words:
            return term
        candidate = self._strip_prefix(term)
        hit = self.analyses.get(candidate)
        if hit is not None:
            return hit
        if candidate in self.words:
            return candidate
        for _ in range(2):
            candidate = self._strip_suffix(candidate)
            hit = self.analyses.get(candidate)
            if hit is not None:
                return hit
            if candidate in self.words:
                return candidate
        return None

    def _strip_prefix(self, term: str) -> str:
        for prefix in self.prefixes:
            if len(term) > len(prefix) + 2 and term.startswith(prefix):
                return term[len(prefix):]
        return term

    def _strip_suffix(self, term: str) -> str:
        for suffix in self.suffixes:
            if len(term) > len(suffix) + 2 and term.endswith(suffix):
                return term[: -len(suffix)]
        return term


@lru_cache(maxsize=1)
def _amharic_lexicon() -> Lexicon:
    from lucene_kmp_spark.analysis.horn_data import AM_LEXICON_RAW
    words, analyses = _expand(AM_LEXICON_RAW, _AM_GEN_PREFIXES,
                              _AM_GEN_SUFFIXES, _AM_GEN_COMBINED)
    return Lexicon(words, analyses, AMHARIC_PREFIXES, AMHARIC_SUFFIXES)


@lru_cache(maxsize=1)
def _oromo_lexicon() -> Lexicon:
    from lucene_kmp_spark.analysis.horn_data import OM_LEXICON_RAW
    words, analyses = _expand(OM_LEXICON_RAW, (), _OM_GEN_SUFFIXES, ())
    return Lexicon(words, analyses, (), OROMO_SUFFIXES)


@lru_cache(maxsize=1)
def _geez_sera() -> dict:
    from lucene_kmp_spark.analysis.horn_data import AM_GEEZ_SERA_RAW
    out = {}
    for line in AM_GEEZ_SERA_RAW.split("\n"):
        if len(line) > 2 and line[1] == "\t":
            out[line[0]] = line[2:]
    return out


def simplify_sera(term: str) -> str:
    """HornLexicons.simplifySera: drop ^, H->h, `->', K->h except 'Ke'."""
    result = term.replace("^", "").replace("H", "h").replace("`", "'")
    result = result.replace("Ke", "!!").replace("K", "h").replace("!!", "Ke")
    return result


def to_simplified_sera(term: str) -> str:
    geez = _geez_sera()
    return simplify_sera("".join(geez.get(ch, ch) for ch in term))


def amharic_lexicon_stem(term: str) -> str | None:
    """HornLexicons.amharicStem: Ge'ez transliterated, then lexicon lookup."""
    roman = (to_simplified_sera(term) if any(ord(c) > 0x1200 for c in term)
             else simplify_sera(term))
    return _amharic_lexicon().lookup(roman)


def oromo_lexicon_stem(term: str) -> str | None:
    """HornLexicons.oromoStem."""
    return _oromo_lexicon().lookup(term.lower())
