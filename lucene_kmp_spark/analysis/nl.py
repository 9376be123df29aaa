"""Dutch analysis chain (``analysis/common/.../analysis/nl/``).

* ``dutch_snowball_stem`` — the published Snowball dutch algorithm
  (snowballstem.org; generated reference: ``snowball/ext/DutchStemmer.kt``):
  accent fold + i/y consonantal marking, R1 (min 3) / R2 regions,
  en/ene + s/se removal, e-ending with undoubling, heid -> heid/en
  handling, end/ing/ig/lijk/baar/bar suffixes, double-vowel undoubling.
* ``dutch_analyzer`` — ``nl/DutchAnalyzer.kt:70-84`` chain:
  StandardTokenizer -> LowerCaseFilter -> StopFilter(dutch) ->
  [SetKeywordMarkerFilter] -> StemmerOverrideFilter(DEFAULT_STEM_DICT) ->
  SnowballFilter(DutchStemmer).
"""

from __future__ import annotations

from lucene_kmp_spark.analysis.standard import (
    DEFAULT_MAX_TOKEN_LENGTH,
    _lower_simple,
    standard_tokenize,
)

DUTCH_STOP_WORDS = frozenset((
    "de", "en", "van", "ik", "te", "dat", "die", "in", "een", "hij", "het",
    "niet", "zijn", "is", "was", "op", "aan", "met", "als", "voor", "had",
    "er", "maar", "om", "hem", "dan", "zou", "of", "wat", "mijn", "men",
    "dit", "zo", "door", "over", "ze", "zich", "bij", "ook", "tot", "je",
    "mij", "uit", "der", "daar", "haar", "naar", "heb", "hoe", "heeft",
    "hebben", "deze", "u", "want", "nog", "zal", "me", "zij", "nu", "ge",
    "geen", "omdat", "iets", "worden", "toch", "al", "waren", "veel",
    "meer", "doen", "toen", "moet", "ben", "zonder", "kan", "hun", "dus",
    "alles", "onder", "ja", "eens", "hier", "wie", "werd", "altijd",
    "doch", "wordt", "wezen", "kunnen", "ons", "zelf", "tegen", "na",
    "reeds", "wil", "kon", "niets", "uw", "iemand", "geweest", "andere",
))


# DutchAnalyzer.DEFAULT_STEM_DICT (DutchAnalyzer.kt:235-239)
DUTCH_STEM_OVERRIDES = {
    "fiets": "fiets", "bromfiets": "bromfiets", "ei": "eier",
    "kind": "kinder",
}

_NL_V = frozenset("aeiouy\u00e8")          # g_v: vowels incl. è
_NL_V_I = _NL_V | {"I"}                      # g_v_I
_NL_V_J = _NL_V | {"j"}                      # g_v_j
_NL_FOLD = str.maketrans({
    "\u00e1": "a", "\u00e4": "a", "\u00e9": "e", "\u00eb": "e",
    "\u00ed": "i", "\u00ef": "i", "\u00f3": "o", "\u00f6": "o",
    "\u00fa": "u", "\u00fc": "u",
})


def _nl_prelude(word: str) -> str:
    word = word.translate(_NL_FOLD)
    chars = list(word)
    if chars and chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i - 1] in _NL_V:
            if chars[i] == "i" and i + 1 < len(chars) \
                    and chars[i + 1] in _NL_V:
                chars[i] = "I"
            elif chars[i] == "y":
                chars[i] = "Y"
    return "".join(chars)


def _nl_regions(word: str) -> tuple[int, int]:
    n = len(word)

    def boundary(start: int) -> int:
        i = start
        while i < n and word[i] not in _NL_V:
            i += 1
        while i < n and word[i] in _NL_V:
            i += 1
        return i + 1 if i < n else n

    p1 = boundary(0)
    p1 = max(p1, 3) if p1 < n else p1
    if p1 < 3:
        p1 = 3
    p2 = boundary(p1) if p1 < n else n
    return p1, p2


class _NlWord:
    """Mutable word state so the step procedures can share flags."""

    def __init__(self, w: str):
        self.w = _nl_prelude(w)
        self.p1, self.p2 = _nl_regions(self.w)
        self.e_found = False

    def undouble(self):
        if self.w.endswith(("dd", "kk", "tt")):
            self.w = self.w[:-1]

    def e_ending(self):
        self.e_found = False
        w = self.w
        if w.endswith("e") and len(w) - 1 >= self.p1 and len(w) >= 2 \
                and w[-2] not in _NL_V:
            self.w = w[:-1]
            self.e_found = True
            self.undouble()

    def en_ending(self, sfx: str) -> bool:
        """Delete a bracketed en/ene suffix under the en-ending rules."""
        w = self.w
        start = len(w) - len(sfx)
        pre = w[:start]
        if start >= self.p1 and pre and pre[-1] not in _NL_V \
                and not pre.endswith("gem"):
            self.w = pre
            self.undouble()
            return True
        return False


def dutch_snowball_stem(word: str) -> str:
    st = _NlWord(word)

    # step 1: heden / en(e) / s(e)
    w = st.w
    m = None
    for sfx in ("heden", "ene", "en", "se", "s"):
        if w.endswith(sfx):
            m = sfx
            break
    if m == "heden":
        if len(w) - 5 >= st.p1:
            st.w = w[:-5] + "heid"
    elif m in ("ene", "en"):
        st.en_ending(m)
    elif m in ("se", "s"):
        start = len(w) - len(m)
        if start >= st.p1 and start >= 1 and w[start - 1] not in _NL_V_J:
            st.w = w[:start]

    # step 2: e-ending
    st.e_ending()

    # step 3: heid
    w = st.w
    if w.endswith("heid") and len(w) - 4 >= st.p2 \
            and not w[:-4].endswith("c"):
        st.w = w[:-4]
        if st.w.endswith("en"):
            st.en_ending("en")

    # step 4: end/ing/ig/lijk/baar/bar
    w = st.w
    m = None
    for sfx in ("lijk", "baar", "end", "ing", "bar", "ig"):
        if w.endswith(sfx):
            m = sfx
            break
    if m in ("end", "ing"):
        if len(w) - len(m) >= st.p2:
            st.w = w[: -len(m)]
            w2 = st.w
            if w2.endswith("ig") and len(w2) - 2 >= st.p2 \
                    and not w2[:-2].endswith("e"):
                st.w = w2[:-2]
            else:
                st.undouble()
    elif m == "ig":
        if len(w) - 2 >= st.p2 and not w[:-2].endswith("e"):
            st.w = w[:-2]
    elif m == "lijk":
        if len(w) - 4 >= st.p2:
            st.w = w[:-4]
            st.e_ending()
    elif m == "baar":
        if len(w) - 4 >= st.p2:
            st.w = w[:-4]
    elif m == "bar":
        if len(w) - 3 >= st.p2 and st.e_found:
            st.w = w[:-3]

    # step 5: undouble vowel before final consonant
    w = st.w
    if len(w) >= 4 and w[-1] not in _NL_V_I \
            and w[-3:-1] in ("aa", "ee", "oo", "uu") and w[-4] not in _NL_V:
        st.w = w[:-2] + w[-1]

    return st.w.replace("I", "i").replace("Y", "y")


def dutch_analyzer(stop_words=None, stem_exclusions=(), stem_overrides=None,
                   max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH):
    """DutchAnalyzer.createComponents (DutchAnalyzer.kt:70-84)."""
    stop = DUTCH_STOP_WORDS if stop_words is None else frozenset(stop_words)
    excl = frozenset(stem_exclusions)
    # the default stem dict applies only when no exclusions were given,
    # mirroring the reference's constructor overloads
    overrides = DUTCH_STEM_OVERRIDES if stem_overrides is None else stem_overrides

    def run(text: str):
        if not text:
            return [], [], 0
        terms, positions = [], []
        for t in standard_tokenize(text, max_token_length):
            term = _lower_simple(t.term)
            if term in stop:
                continue
            if term not in excl:
                if term in overrides:
                    term = overrides[term]
                else:
                    term = dutch_snowball_stem(term)
            terms.append(term)
            positions.append(t.position)
        return terms, positions, len(terms)

    return run
