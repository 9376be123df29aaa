"""Hebrew analysis chain (HebMorph) with a pluggable morphological
dictionary.

Reference: ``analysis/hebmorph`` module — ``HebMorphTokenizer.kt`` (the
Hebrew-aware tokenizer state machine: geresh/gershayim normalization inside
words, makaf construct split, niqqud carried through), ``HebrewTokenizer.kt``
(construct-prefix skip + acronym prefix stripping + token typing),
``HebrewFilters.kt`` (AddSuffixTokenFilter for exact-match fields),
``NiqqudFilter`` and ``Lemmatizer.kt`` (exact / trailing-geresh / legal-
prefix-stripping lookup cascade).

The hspell dictionary the reference's analyzers default to is EXTERNAL data
its repo does not contain (``gradle/generateHebMorphData.gradle.kts`` reads
absent hspell source files), so — like :mod:`.morfologik` — the dictionary
here is an input: ``HebrewDictionary(entries, prefixes)`` with
``entries[word] = (prefix_mask, [(lemma, lemma_prefix_mask), ...])`` and
``prefixes[prefix] = mask``, exactly the ``DictHebMorph`` shape the
reference loads from its generated blob. Documented subset: the
tokenization-exception radix (``specialCases``) and the niqqud/em-kryia
TOLERANT lookup cascade are not ported (the reference repo ships no data
that exercises them).

Token type flags follow HebMorphTokenizer.TokenType.
"""

from __future__ import annotations

# HebMorphTokenizer.TokenType (HebMorphTokenizer.kt:8-17)
HEBREW, NON_HEBREW, NUMERIC, MIXED, CONSTRUCT, ACRONYM, EXACT = (
    1, 2, 4, 8, 16, 32, 64,
)

# HebrewUtils (HebMorphCore.kt:325-360)
_GERESH = frozenset("'׳‘’‛＇")
_GERSHAYIM = frozenset('"״“”‟❞＂')
_MAKAF = frozenset("-‒–—―־")
_LETTERS_ACCEPTING_GERESH = frozenset("זגץצח")
# presentation-form alternates collapse to base letters (HebMorphCore.kt:307-321)
_ALTERNATES = {
    "ﬠ": "ע", "ﬡ": "א", "ﬢ": "ד",
    "ﬣ": "ה", "ﬤ": "כ", "ﬥ": "ל",
    "ﬦ": "ם", "ﬧ": "ר", "ﬨ": "ת",
}
_FINAL_LETTERS = frozenset(map(chr, (1498, 1501, 1503, 1507, 1509)))


def is_hebrew_letter(c: str) -> bool:
    return 1488 <= ord(c) <= 1514


def is_niqqud(c: str) -> bool:
    return 1456 <= ord(c) <= 1465 or c in "ֻּׁׂ"


def strip_niqqud(term: str) -> str:
    """NiqqudFilter: remove pointing characters, keep everything else."""
    return "".join(c for c in term if not is_niqqud(c))


def _raw_tokens(text: str, suffix_for_exact: str | None = None):
    """HebMorphTokenizer.nextToken state machine over the whole string
    (no specialCases radix — those branches are dead with an empty one).
    Yields (token, type_flags)."""
    buf: list[str] = []
    ttype = 0
    i = 0
    n = len(text)

    def finish():
        nonlocal buf, ttype
        # trailing gershayim drop (HebMorphTokenizer.kt:215-219)
        if buf and buf[-1] in _GERSHAYIM:
            buf.pop()
        # trailing geresh drop unless a Hebrew abbreviation letter precedes
        if len(buf) > 2 and buf[-1] == "'":
            if not (ttype & HEBREW) or buf[-2] not in _LETTERS_ACCEPTING_GERESH:
                buf.pop()
        tok = "".join(buf)
        t = ttype
        buf, ttype = [], 0
        return tok, t

    while i < n:
        c = _ALTERNATES.get(text[i], text[i])
        i += 1
        if not buf:
            if is_hebrew_letter(c):
                if not (c in _FINAL_LETTERS):
                    ttype |= HEBREW
                    buf.append(c)
            elif c.isalnum():
                ttype |= NON_HEBREW
                if c.isdigit():
                    ttype |= NUMERIC
                buf.append(c)
            continue
        if is_hebrew_letter(c) or is_niqqud(c):
            buf.append(c)
        elif c.isalnum():
            if ttype == HEBREW:
                ttype |= MIXED
            buf.append(c)
        elif c in _GERSHAYIM:
            if not (is_hebrew_letter(buf[-1]) or is_niqqud(buf[-1])):
                yield finish()
                continue
            ttype |= ACRONYM
            buf.append('"')
        elif c in _GERESH:
            if ttype & HEBREW and not (
                is_hebrew_letter(buf[-1]) or is_niqqud(buf[-1]) or buf[-1] == "'"
            ):
                yield finish()
                continue
            # double geresh collapses to gershayim (HebMorphTokenizer.kt:196-201)
            if buf[-1] == "'":
                buf[-1] = '"'
                ttype |= ACRONYM
            else:
                buf.append("'")
        else:
            if c in _MAKAF:
                ttype |= CONSTRUCT
            elif suffix_for_exact is not None and c == suffix_for_exact:
                ttype |= EXACT
            yield finish()
    if buf:
        yield finish()


def _try_stripping_prefix(word: str, prefixes) -> str:
    """HebrewTokenizer.tryStrippingPrefix: drop a legal prefix before the
    first quote mark of an acronym."""
    fq = word.find('"')
    if -1 < fq < len(word) - 2 and word[:fq] in prefixes:
        return word[fq + 1 :]
    fs = word.find("'")
    if fs == -1 or (fq > -1 and fs > fq):
        return word
    if word[:fs] in prefixes:
        return word[fs + 1 :]
    return word


def hebrew_tokenize(
    text: str, prefixes=None, suffix_for_exact: str | None = None
) -> list[tuple[str, int]]:
    """HebrewTokenizer.incrementToken: construct tokens that are legal
    prefixes vanish; acronyms retry a prefix strip (losing the Acronym type
    when the quote disappears). Returns [(token, type_flags)]."""
    prefixes = prefixes or {}
    out = []
    for tok, ttype in _raw_tokens(text, suffix_for_exact):
        if not tok:
            continue
        if ttype & HEBREW:
            if ttype & CONSTRUCT and tok in prefixes:
                continue
            if ttype & ACRONYM:
                stripped = _try_stripping_prefix(tok, prefixes)
                if '"' not in stripped:
                    ttype &= ~ACRONYM
                tok = stripped
        out.append((tok, ttype))
    return out


def add_suffix(tokens: list[tuple[str, int]], suffix: str = "$") -> list[str]:
    """AddSuffixTokenFilter (HebrewFilters.kt:28-44): Hebrew-ish and
    NonHebrew tokens get the exact-match suffix; Numeric ones do not."""
    out = []
    for tok, ttype in tokens:
        if ttype & NUMERIC:
            out.append(tok)
        else:
            out.append(tok + suffix)
    return out


class HebrewDictionary:
    """DictHebMorph analog: word → (allowed-prefix mask, lemma list)."""

    def __init__(self, entries: dict, prefixes: dict | None = None):
        self.entries = entries
        self.prefixes = prefixes or {}

    def lookup(self, word: str):
        return self.entries.get(word)


def lemmatize(word: str, dictionary: HebrewDictionary) -> list[str]:
    """Lemmatizer.lemmatize (Lemmatizer.kt:28-60): exact hit, then the
    trailing-geresh retry, then every legal-prefix split whose mask agrees
    with the entry's allowed prefixes. Returns lemma strings in cascade
    order (duplicates removed, first win)."""
    out: list[str] = []

    def add(lemmas, mask=None):
        for lemma, lemma_mask in lemmas:
            if mask is not None and not (lemma_mask & mask):
                continue
            if lemma not in out:
                out.append(lemma)

    hit = dictionary.lookup(word)
    if hit is not None:
        add(hit[1])
    elif word.endswith("'"):
        hit = dictionary.lookup(word[:-1])
        if hit is not None:
            add(hit[1])
    pref_len = 0
    while len(word) - pref_len >= 2:
        pref_len += 1
        mask = dictionary.prefixes.get(word[:pref_len])
        if mask is None:
            break
        hit = dictionary.lookup(word[pref_len:])
        if hit is not None and (hit[0] & mask):
            add(hit[1], mask)
    return out


def hebrew_analyzer(dictionary: HebrewDictionary | None = None, exact: bool = False):
    """HebrewIndexingAnalyzer / HebrewExactAnalyzer shape: tokenize →
    strip niqqud → (indexing) replace each Hebrew token by its lemmas at
    the same position, OOV and non-Hebrew tokens pass through; (exact)
    append the '$' exact-match suffix instead of lemmatizing."""
    prefixes = dictionary.prefixes if dictionary is not None else {}

    def run(text: str):
        toks = hebrew_tokenize(text, prefixes)
        toks = [(strip_niqqud(t), ty) for t, ty in toks]
        toks = [(t, ty) for t, ty in toks if t]
        terms: list[str] = []
        positions: list[int] = []
        if exact or dictionary is None:
            emitted = add_suffix(toks) if exact else [t for t, _ty in toks]
            for p, t in enumerate(emitted):
                terms.append(t)
                positions.append(p)
            return terms, positions, len(toks)
        for p, (t, ty) in enumerate(toks):
            lemmas = lemmatize(t, dictionary) if ty & HEBREW else []
            if lemmas:
                for lm in lemmas:
                    terms.append(lm)
                    positions.append(p)
            else:
                terms.append(t)
                positions.append(p)
        return terms, positions, len(toks)

    return run
