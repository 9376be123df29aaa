"""Indonesian analysis chain (``analysis/common/.../analysis/id/``).

* ``indonesian_stem`` — ``id/IndonesianStemmer.kt``: the Tala stemmer
  ("A Study of Stemming Effects on Information Retrieval in Bahasa
  Indonesia", Fadillah Z Tala): particle + possessive-pronoun inflection
  strips, then derivational first/second-order prefixes and suffixes with
  the removed-prefix exclusion flags and the syllable (vowel-count) > 2
  guard before every step.
* ``indonesian_analyzer`` — ``id/IndonesianAnalyzer.kt:34-42`` chain:
  StandardTokenizer -> LowerCaseFilter -> StopFilter(indonesian) ->
  [SetKeywordMarkerFilter] -> IndonesianStemFilter(stemDerivational=true).
"""

from __future__ import annotations

from lucene_kmp_spark.analysis.standard import (
    DEFAULT_MAX_TOKEN_LENGTH,
    _lower_simple,
    standard_tokenize,
)

INDONESIAN_STOP_WORDS = frozenset((
    "ada", "adanya", "adalah", "adapun", "agak", "agaknya", "agar", "akan", "akankah", "akhirnya",
    "aku", "akulah", "amat", "amatlah", "anda", "andalah", "antar", "diantaranya", "antara", "antaranya",
    "diantara", "apa", "apaan", "mengapa", "apabila", "apakah", "apalagi", "apatah", "atau", "ataukah",
    "ataupun", "bagai", "bagaikan", "sebagai", "sebagainya", "bagaimana", "bagaimanapun", "sebagaimana", "bagaimanakah", "bagi",
    "bahkan", "bahwa", "bahwasanya", "sebaliknya", "banyak", "sebanyak", "beberapa", "seberapa", "begini", "beginian",
    "beginikah", "beginilah", "sebegini", "begitu", "begitukah", "begitulah", "begitupun", "sebegitu", "belum", "belumlah",
    "sebelum", "sebelumnya", "sebenarnya", "berapa", "berapakah", "berapalah", "berapapun", "betulkah", "sebetulnya", "biasa",
    "biasanya", "bila", "bilakah", "bisa", "bisakah", "sebisanya", "boleh", "bolehkah", "bolehlah", "buat",
    "bukan", "bukankah", "bukanlah", "bukannya", "cuma", "percuma", "dahulu", "dalam", "dan", "dapat",
    "dari", "daripada", "dekat", "demi", "demikian", "demikianlah", "sedemikian", "dengan", "depan", "di",
    "dia", "dialah", "dini", "diri", "dirinya", "terdiri", "dong", "dulu", "enggak", "enggaknya",
    "entah", "entahlah", "terhadap", "terhadapnya", "hal", "hampir", "hanya", "hanyalah", "harus", "haruslah",
    "harusnya", "seharusnya", "hendak", "hendaklah", "hendaknya", "hingga", "sehingga", "ia", "ialah", "ibarat",
    "ingin", "inginkah", "inginkan", "ini", "inikah", "inilah", "itu", "itukah", "itulah", "jangan",
    "jangankan", "janganlah", "jika", "jikalau", "juga", "justru", "kala", "kalau", "kalaulah", "kalaupun",
    "kalian", "kami", "kamilah", "kamu", "kamulah", "kan", "kapan", "kapankah", "kapanpun", "dikarenakan",
    "karena", "karenanya", "ke", "kecil", "kemudian", "kenapa", "kepada", "kepadanya", "ketika", "seketika",
    "khususnya", "kini", "kinilah", "kiranya", "sekiranya", "kita", "kitalah", "kok", "lagi", "lagian",
    "selagi", "lah", "lain", "lainnya", "melainkan", "selaku", "lalu", "melalui", "terlalu", "lama",
    "lamanya", "selama", "selama", "selamanya", "lebih", "terlebih", "bermacam", "macam", "semacam", "maka",
    "makanya", "makin", "malah", "malahan", "mampu", "mampukah", "mana", "manakala", "manalagi", "masih",
    "masihkah", "semasih", "masing", "mau", "maupun", "semaunya", "memang", "mereka", "merekalah", "meski",
    "meskipun", "semula", "mungkin", "mungkinkah", "nah", "namun", "nanti", "nantinya", "nyaris", "oleh",
    "olehnya", "seorang", "seseorang", "pada", "padanya", "padahal", "paling", "sepanjang", "pantas", "sepantasnya",
    "sepantasnyalah", "para", "pasti", "pastilah", "per", "pernah", "pula", "pun", "merupakan", "rupanya",
    "serupa", "saat", "saatnya", "sesaat", "saja", "sajalah", "saling", "bersama", "sama", "sesama",
    "sambil", "sampai", "sana", "sangat", "sangatlah", "saya", "sayalah", "se", "sebab", "sebabnya",
    "sebuah", "tersebut", "tersebutlah", "sedang", "sedangkan", "sedikit", "sedikitnya", "segala", "segalanya", "segera",
    "sesegera", "sejak", "sejenak", "sekali", "sekalian", "sekalipun", "sesekali", "sekaligus", "sekarang", "sekarang",
    "sekitar", "sekitarnya", "sela", "selain", "selalu", "seluruh", "seluruhnya", "semakin", "sementara", "sempat",
    "semua", "semuanya", "sendiri", "sendirinya", "seolah", "seperti", "sepertinya", "sering", "seringnya", "serta",
    "siapa", "siapakah", "siapapun", "disini", "disinilah", "sini", "sinilah", "sesuatu", "sesuatunya", "suatu",
    "sesudah", "sesudahnya", "sudah", "sudahkah", "sudahlah", "supaya", "tadi", "tadinya", "tak", "tanpa",
    "setelah", "telah", "tentang", "tentu", "tentulah", "tentunya", "tertentu", "seterusnya", "tapi", "tetapi",
    "setiap", "tiap", "setidaknya", "tidak", "tidakkah", "tidaklah", "toh", "waduh", "wah", "wahai",
    "sewaktu", "walau", "walaupun", "wong", "yaitu", "yakni", "yang",
))

_VOWELS = frozenset("aeiou")

_REMOVED_KE, _REMOVED_PENG, _REMOVED_DI = 1, 2, 4
_REMOVED_MENG, _REMOVED_TER, _REMOVED_BER, _REMOVED_PE = 8, 16, 32, 64


class _Stem:
    """Mutable stemming state (numSyllables/flags thread through steps)."""

    __slots__ = ("s", "syl", "flags")

    def __init__(self, term: str):
        self.s = term
        self.syl = sum(1 for ch in term if ch in _VOWELS)
        self.flags = 0

    def _particle(self):
        if self.s.endswith(("kah", "lah", "pun")):
            self.syl -= 1
            self.s = self.s[:-3]

    def _possessive(self):
        if self.s.endswith(("ku", "mu")):
            self.syl -= 1
            self.s = self.s[:-2]
        elif self.s.endswith("nya"):
            self.syl -= 1
            self.s = self.s[:-3]

    def _first_order_prefix(self):
        s = self.s
        if s.startswith("meng"):
            self.flags |= _REMOVED_MENG; self.syl -= 1; self.s = s[4:]
        elif s.startswith("meny") and len(s) > 4 and s[4] in _VOWELS:
            self.flags |= _REMOVED_MENG; self.syl -= 1; self.s = "s" + s[4:]
        elif s.startswith("men"):
            self.flags |= _REMOVED_MENG; self.syl -= 1; self.s = s[3:]
        elif s.startswith("mem"):
            self.flags |= _REMOVED_MENG; self.syl -= 1; self.s = s[3:]
        elif s.startswith("me"):
            self.flags |= _REMOVED_MENG; self.syl -= 1; self.s = s[2:]
        elif s.startswith("peng"):
            self.flags |= _REMOVED_PENG; self.syl -= 1; self.s = s[4:]
        elif s.startswith("peny") and len(s) > 4 and s[4] in _VOWELS:
            self.flags |= _REMOVED_PENG; self.syl -= 1; self.s = "s" + s[4:]
        elif s.startswith("peny"):
            self.flags |= _REMOVED_PENG; self.syl -= 1; self.s = s[4:]
        elif s.startswith("pen") and len(s) > 3 and s[3] in _VOWELS:
            self.flags |= _REMOVED_PENG; self.syl -= 1; self.s = "t" + s[3:]
        elif s.startswith("pen"):
            self.flags |= _REMOVED_PENG; self.syl -= 1; self.s = s[3:]
        elif s.startswith("pem"):
            self.flags |= _REMOVED_PENG; self.syl -= 1; self.s = s[3:]
        elif s.startswith("di"):
            self.flags |= _REMOVED_DI; self.syl -= 1; self.s = s[2:]
        elif s.startswith("ter"):
            self.flags |= _REMOVED_TER; self.syl -= 1; self.s = s[3:]
        elif s.startswith("ke"):
            self.flags |= _REMOVED_KE; self.syl -= 1; self.s = s[2:]

    def _second_order_prefix(self):
        s = self.s
        if s.startswith("ber"):
            self.flags |= _REMOVED_BER; self.syl -= 1; self.s = s[3:]
        elif len(s) == 7 and s.startswith("belajar"):
            self.flags |= _REMOVED_BER; self.syl -= 1; self.s = s[3:]
        elif s.startswith("be") and len(s) > 4 and s[2] not in _VOWELS and s[3] == "e" and s[4] == "r":
            self.flags |= _REMOVED_BER; self.syl -= 1; self.s = s[2:]
        elif s.startswith("per"):
            self.syl -= 1; self.s = s[3:]
        elif len(s) == 7 and s.startswith("pelajar"):
            self.syl -= 1; self.s = s[3:]
        elif s.startswith("pe"):
            self.flags |= _REMOVED_PE; self.syl -= 1; self.s = s[2:]

    def _suffix(self):
        s = self.s
        if s.endswith("kan") and not self.flags & (_REMOVED_KE | _REMOVED_PENG | _REMOVED_PE):
            self.syl -= 1; self.s = s[:-3]
        elif s.endswith("an") and not self.flags & (_REMOVED_DI | _REMOVED_MENG | _REMOVED_TER):
            self.syl -= 1; self.s = s[:-2]
        elif (s.endswith("i") and not s.endswith("si")
              and not self.flags & (_REMOVED_BER | _REMOVED_KE | _REMOVED_PENG)):
            self.syl -= 1; self.s = s[:-1]


def indonesian_stem(term: str, stem_derivational: bool = True) -> str:
    """IndonesianStemmer.stem (IndonesianStemmer.kt:32-65)."""
    st = _Stem(term)
    if st.syl > 2:
        st._particle()
    if st.syl > 2:
        st._possessive()
    if stem_derivational:
        old = len(st.s)
        if st.syl > 2:
            st._first_order_prefix()
        if len(st.s) != old:
            old = len(st.s)
            if st.syl > 2:
                st._suffix()
            if len(st.s) != old:
                if st.syl > 2:
                    st._second_order_prefix()
        else:
            if st.syl > 2:
                st._second_order_prefix()
            if st.syl > 2:
                st._suffix()
    return st.s


def indonesian_analyzer(
    stop_words=INDONESIAN_STOP_WORDS,
    stem_exclusions=(),
    max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH,
    stem_derivational: bool = True,
):
    """IndonesianAnalyzer.createComponents (IndonesianAnalyzer.kt:34-42)."""
    stop = frozenset(stop_words) if stop_words else frozenset()
    excl = frozenset(stem_exclusions)

    def run(text: str):
        if not text:
            return [], [], 0
        terms, positions = [], []
        for t in standard_tokenize(text, max_token_length):
            term = _lower_simple(t.term)
            if term in stop:
                continue
            if term not in excl:
                term = indonesian_stem(term, stem_derivational)
            terms.append(term)
            positions.append(t.position)
        return terms, positions, len(terms)

    return run
