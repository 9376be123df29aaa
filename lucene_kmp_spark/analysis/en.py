"""English analysis chain: Porter stemmer, possessive filter, S-stemmer.

Reproduces the semantics of the reference's ``analysis/common`` English
package (``analysis/common/.../analysis/en/``):

* ``porter_stem`` — the Porter stemming algorithm (Porter 1980), in the
  exact variant Lucene ships (``en/PorterStemmer.kt``): Martin Porter's
  reference implementation including its two documented departures from the
  published paper (step-3 ``bli -> ble`` and ``logi -> log``) and the
  "words of length <= 2 are left untouched" guard
  (``PorterStemmer.kt:468-471`` — steps run only when ``k > k0 + 1``).
* ``english_possessive`` — ``en/EnglishPossessiveFilter.kt:19-29``: strips a
  trailing ``'s`` where the apostrophe may be U+0027, U+2019 or U+FF07 and
  the s may be either case.
* ``english_minimal_stem`` — the Harman S-stemmer,
  ``en/EnglishMinimalStemmer.kt:9-26``.
* ``english_analyzer`` — ``en/EnglishAnalyzer.kt:27-37`` chain:
  StandardTokenizer -> EnglishPossessiveFilter -> LowerCaseFilter ->
  StopFilter(ENGLISH_STOP_WORDS_SET) -> [SetKeywordMarkerFilter] ->
  PorterStemFilter.  Stop removal leaves position holes
  (``analysis/FilteringTokenFilter.kt:32-36``) and stopped tokens do not
  count toward the field length, so norms follow post-stop token counts
  exactly as in the reference.

The stemmers are pure ``str -> str`` functions (ASCII-letter oriented, like
the originals: any non-vowel codepoint counts as a consonant) so they run
inside the same Arrow tokenize UDF as the rest of the chain.
"""

from __future__ import annotations

from lucene_kmp_spark.analysis.standard import (
    DEFAULT_MAX_TOKEN_LENGTH,
    _lower_simple,
    standard_tokenize,
)

# EnglishAnalyzer.ENGLISH_STOP_WORDS_SET (EnglishAnalyzer.kt:49-55)
ENGLISH_STOP_WORDS = frozenset(
    (
        "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
        "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
        "that", "the", "their", "then", "there", "these", "they", "this",
        "to", "was", "will", "with",
    )
)

_VOWELS = frozenset("aeiou")


def _cons(b: list[str], i: int) -> bool:
    """True iff b[i] acts as a consonant ('y' after a consonant is a vowel)."""
    c = b[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return True if i == 0 else not _cons(b, i - 1)
    return True


def _measure(b: list[str], j: int) -> int:
    """Porter's m(): number of VC sequences in b[0..j] inclusive."""
    n = 0
    i = 0
    # skip the optional initial consonant run
    while True:
        if i > j:
            return n
        if not _cons(b, i):
            break
        i += 1
    i += 1
    while True:
        # inside a vowel run: find the next consonant
        while True:
            if i > j:
                return n
            if _cons(b, i):
                break
            i += 1
        i += 1
        n += 1
        # inside a consonant run: find the next vowel
        while True:
            if i > j:
                return n
            if not _cons(b, i):
                break
            i += 1
        i += 1


# step-3/4/5 suffix rule tables, dispatched on the same char the reference
# switches on (penultimate for steps 3/5, final for step 4); within a branch
# the first matching suffix wins and no further rules are tried, matching the
# if/else chains of PorterStemmer.kt step3()-step5().
_STEP3 = {
    "a": (("ational", "ate"), ("tional", "tion")),
    "c": (("enci", "ence"), ("anci", "ance")),
    "e": (("izer", "ize"),),
    "l": (("bli", "ble"), ("alli", "al"), ("entli", "ent"), ("eli", "e"),
          ("ousli", "ous")),
    "o": (("ization", "ize"), ("ation", "ate"), ("ator", "ate")),
    "s": (("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
          ("ousness", "ous")),
    "t": (("aliti", "al"), ("iviti", "ive"), ("biliti", "ble")),
    "g": (("logi", "log"),),
}

_STEP4 = {
    "e": (("icate", "ic"), ("ative", ""), ("alize", "al")),
    "i": (("iciti", "ic"),),
    "l": (("ical", "ic"), ("ful", "")),
    "s": (("ness", ""),),
}

_STEP5 = {
    "a": ("al",),
    "c": ("ance", "ence"),
    "e": ("er",),
    "i": ("ic",),
    "l": ("able", "ible"),
    "n": ("ant", "ement", "ment", "ent"),
    "s": ("ism",),
    "t": ("ate", "iti"),
    "u": ("ous",),
    "v": ("ive",),
    "z": ("ize",),
}


def porter_stem(word: str) -> str:
    """Stem one (already lowercased) word with the Porter algorithm."""
    k = len(word) - 1
    if k <= 1:  # length <= 2: untouched (PorterStemmer.kt stem(): k > k0+1)
        return word
    b = list(word)
    j = 0

    def ends(s: str) -> bool:
        nonlocal j
        o = k - len(s) + 1
        if o < 0 or "".join(b[o : k + 1]) != s:
            return False
        j = k - len(s)
        return True

    def setto(s: str) -> None:
        nonlocal k
        b[j + 1 : k + 1] = list(s)
        k = j + len(s)

    def vowel_in_stem() -> bool:
        return any(not _cons(b, i) for i in range(j + 1))

    def doublec(at: int) -> bool:
        return at >= 1 and b[at] == b[at - 1] and _cons(b, at)

    def cvc(at: int) -> bool:
        if at < 2 or not _cons(b, at) or _cons(b, at - 1) or not _cons(b, at - 2):
            return False
        return b[at] not in "wxy"

    # step 1: plurals and -ed / -ing
    if b[k] == "s":
        if ends("sses"):
            k -= 2
        elif ends("ies"):
            setto("i")
        elif b[k - 1] != "s":
            k -= 1
    if ends("eed"):
        if _measure(b, j) > 0:
            k -= 1
    elif (ends("ed") or ends("ing")) and vowel_in_stem():
        k = j
        if ends("at"):
            setto("ate")
        elif ends("bl"):
            setto("ble")
        elif ends("iz"):
            setto("ize")
        elif doublec(k):
            ch = b[k]
            k -= 1
            if ch in "lsz":
                k += 1
        elif _measure(b, j) == 1 and cvc(k):
            setto("e")

    # step 2: terminal y -> i when the stem has another vowel
    if ends("y") and vowel_in_stem():
        b[k] = "i"

    # step 3: double suffixes -> single (m > 0)
    if k > 0:
        for suf, rep in _STEP3.get(b[k - 1], ()):
            if ends(suf):
                if _measure(b, j) > 0:
                    setto(rep)
                break

    # step 4: -ic-ate / -ful / -ness etc. (m > 0)
    for suf, rep in _STEP4.get(b[k], ()):
        if ends(suf):
            if _measure(b, j) > 0:
                setto(rep)
            break

    # step 5: drop the suffix entirely in context m > 1
    if k > 0:
        c = b[k - 1]
        matched = False
        if c == "o":
            if ends("ion") and j >= 0 and b[j] in "st":
                matched = True
            elif ends("ou"):
                matched = True
        else:
            for suf in _STEP5.get(c, ()):
                if ends(suf):
                    matched = True
                    break
        if matched and _measure(b, j) > 1:
            k = j

    # step 6: final -e and -ll reduction.  NOTE: j deliberately stays at the
    # pre-removal end for the second measure() call — the reference does the
    # same (step6() sets j = k once up front), so "controll" -> "control"
    # measures over the full buffer.
    j = k
    if b[k] == "e":
        a = _measure(b, j)
        if a > 1 or (a == 1 and not cvc(k - 1)):
            k -= 1
    if b[k] == "l" and doublec(k) and _measure(b, j) > 1:
        k -= 1

    return "".join(b[: k + 1])


_APOSTROPHES = ("'", "’", "＇")


def english_possessive(term: str) -> str:
    """Strip a trailing 's / 'S (any of the three apostrophe forms)."""
    if (
        len(term) >= 2
        and term[-2] in _APOSTROPHES
        and term[-1] in ("s", "S")
    ):
        return term[:-2]
    return term


def english_minimal_stem(word: str) -> str:
    """Harman's S-stemmer (EnglishMinimalStemmer.kt:9-26)."""
    n = len(word)
    if n < 3 or word[-1] != "s":
        return word
    c = word[-2]
    if c in ("u", "s"):
        return word
    if c == "e":
        if n > 3 and word[-3] == "i" and word[-4] not in ("a", "e"):
            return word[:-3] + "y"
        if word[-3] in ("i", "a", "o", "e"):
            return word
    return word[:-1]


def english_analyzer(
    stop_words: frozenset[str] | tuple[str, ...] | None = ENGLISH_STOP_WORDS,
    stem_exclusions: frozenset[str] | tuple[str, ...] = (),
    max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH,
):
    """EnglishAnalyzer chain factory for ``build_index(analyzer=...)``.

    Order matches EnglishAnalyzer.createComponents (EnglishAnalyzer.kt:27-37):
    tokenize -> possessive strip -> lowercase -> stop -> [keyword-marker] ->
    Porter stem.  Possessive stripping precedes the stop check, so "it's"
    stems through "it" and IS stopped (leaving a position hole), unlike a
    naive post-analysis stem pass.  Returns ``(terms, positions, length)``
    where length is the surviving (post-stop) token count — stopped tokens
    never reach FieldInvertState in the reference, so they never count
    toward norms (IndexingChain.kt:1192-1252).
    """
    stop = frozenset(stop_words) if stop_words else frozenset()
    excl = frozenset(stem_exclusions)

    def run(text: str):
        if not text:
            return [], [], 0
        terms: list[str] = []
        positions: list[int] = []
        for t in standard_tokenize(text, max_token_length):
            term = _lower_simple(english_possessive(t.term))
            if term in stop:
                continue
            if term not in excl:
                term = porter_stem(term)
            terms.append(term)
            positions.append(t.position)
        return terms, positions, len(terms)

    return run


def english_minimal_analyzer(
    stop_words: frozenset[str] | tuple[str, ...] | None = None,
    max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH,
):
    """Standard chain + EnglishMinimalStemFilter (S-stemmer) — the light
    alternative to the full Porter chain (EnglishMinimalStemFilter.kt)."""
    stop = frozenset(stop_words) if stop_words else frozenset()

    def run(text: str):
        if not text:
            return [], [], 0
        terms: list[str] = []
        positions: list[int] = []
        for t in standard_tokenize(text, max_token_length):
            term = _lower_simple(t.term)
            if term in stop:
                continue
            terms.append(english_minimal_stem(term))
            positions.append(t.position)
        return terms, positions, len(terms)

    return run
