"""Persian analysis chain (``analysis/common/.../analysis/fa/``).

* ``persian_char_fold`` — ``fa/PersianCharFilter.kt``: ZERO WIDTH NON-JOINER
  (U+200C) becomes a SPACE before tokenization, so compound verbs split.
* ``persian_normalize`` — ``fa/PersianNormalizer.kt``: farsi yeh / yeh
  barree -> arabic yeh, keheh -> kaf, heh+yeh / heh goal -> heh, hamza
  above deleted.
* ``persian_stem`` — ``fa/PersianStemmer.kt``: suffix strip in list order
  (-at, -an, -tarin, -tar, -ii, -i, -ha, ZWNJ), each requiring >= 2
  surviving chars.
* ``persian_analyzer`` — ``fa/PersianAnalyzer.kt:41-57``:
  PersianCharFilter -> StandardTokenizer -> LowerCaseFilter ->
  DecimalDigitFilter -> ArabicNormalization -> PersianNormalization ->
  StopFilter(NORMALIZED persian list — order matters, stop runs after
  normalization) -> [SetKeywordMarkerFilter] -> PersianStemFilter.
"""

from __future__ import annotations

from lucene_kmp_spark.analysis.ar import arabic_normalize, decimal_digit_fold
from lucene_kmp_spark.analysis.standard import (
    DEFAULT_MAX_TOKEN_LENGTH,
    _lower_simple,
    standard_tokenize,
)

PERSIAN_STOP_WORDS = frozenset((
    "انان", "نداشته", "سراسر", "خياه", "ايشان", "وي", "تاكنون", "بيشتري",
    "دوم", "پس", "ناشي", "وگو", "يا", "داشتند", "سپس", "هنگام",
    "هرگز", "پنج", "نشان", "امسال", "ديگر", "گروهي", "شدند", "چطور",
    "ده", "و", "دو", "نخستين", "ولي", "چرا", "چه", "وسط",
    "ه", "كدام", "قابل", "يك", "رفت", "هفت", "همچنين", "در",
    "هزار", "بله", "بلي", "شايد", "اما", "شناسي", "گرفته", "دهد",
    "داشته", "دانست", "داشتن", "خواهيم", "ميليارد", "وقتيكه", "امد", "خواهد",
    "جز", "اورده", "شده", "بلكه", "خدمات", "شدن", "برخي", "نبود",
    "بسياري", "جلوگيري", "حق", "كردند", "نوعي", "بعري", "نكرده", "نظير",
    "نبايد", "بوده", "بودن", "داد", "اورد", "هست", "جايي", "شود",
    "دنبال", "داده", "بايد", "سابق", "هيچ", "همان", "انجا", "كمتر",
    "كجاست", "گردد", "كسي", "تر", "مردم", "تان", "دادن", "بودند",
    "سري", "جدا", "ندارند", "مگر", "يكديگر", "دارد", "دهند", "بنابراين",
    "هنگامي", "سمت", "جا", "انچه", "خود", "دادند", "زياد", "دارند",
    "اثر", "بدون", "بهترين", "بيشتر", "البته", "به", "براساس", "بيرون",
    "كرد", "بعضي", "گرفت", "توي", "اي", "ميليون", "او", "جريان",
    "تول", "بر", "مانند", "برابر", "باشيم", "مدتي", "گويند", "اكنون",
    "تا", "تنها", "جديد", "چند", "بي", "نشده", "كردن", "كردم",
    "گويد", "كرده", "كنيم", "نمي", "نزد", "روي", "قصد", "فقط",
    "بالاي", "ديگران", "اين", "ديروز", "توسط", "سوم", "ايم", "دانند",
    "سوي", "استفاده", "شما", "كنار", "داريم", "ساخته", "طور", "امده",
    "رفته", "نخست", "بيست", "نزديك", "طي", "كنيد", "از", "انها",
    "تمامي", "داشت", "يكي", "طريق", "اش", "چيست", "روب", "نمايد",
    "گفت", "چندين", "چيزي", "تواند", "ام", "ايا", "با", "ان",
    "ايد", "ترين", "اينكه", "ديگري", "راه", "هايي", "بروز", "همچنان",
    "پاعين", "كس", "حدود", "مختلف", "مقابل", "چيز", "گيرد", "ندارد",
    "ضد", "همچون", "سازي", "شان", "مورد", "باره", "مرسي", "خويش",
    "برخوردار", "چون", "خارج", "شش", "هنوز", "تحت", "ضمن", "هستيم",
    "گفته", "فكر", "بسيار", "پيش", "براي", "روزهاي", "انكه", "نخواهد",
    "بالا", "كل", "وقتي", "كي", "چنين", "كه", "گيري", "نيست",
    "است", "كجا", "كند", "نيز", "يابد", "بندي", "حتي", "توانند",
    "عقب", "خواست", "كنند", "بين", "تمام", "همه", "ما", "باشند",
    "مثل", "شد", "اري", "باشد", "اره", "طبق", "بعد", "اگر",
    "صورت", "غير", "جاي", "بيش", "ريزي", "اند", "زيرا", "چگونه",
    "بار", "لطفا", "مي", "درباره", "من", "ديده", "همين", "گذاري",
    "برداري", "علت", "گذاشته", "هم", "فوق", "نه", "ها", "شوند",
    "اباد", "همواره", "هر", "اول", "خواهند", "چهار", "نام", "امروز",
    "مان", "هاي", "قبل", "كنم", "سعي", "تازه", "را", "هستند",
    "زير", "جلوي", "عنوان", "بود",
))


_FA_MAP = {
    "\u06CC": "\u064A",  # farsi yeh -> yeh
    "\u06D2": "\u064A",  # yeh barree -> yeh
    "\u06A9": "\u0643",  # keheh -> kaf
    "\u06C0": "\u0647",  # heh+yeh -> heh
    "\u06C1": "\u0647",  # heh goal -> heh
}

# PersianStemmer.kt suffixes, in declaration order
_FA_SUFFIXES = (
    "\u0627\u062A",                   # -at
    "\u0627\u0646",                   # -an
    "\u062A\u0631\u064A\u0646",     # -tarin
    "\u062A\u0631",                   # -tar
    "\u064A\u064A",                   # -ii
    "\u064A",                          # -i
    "\u0647\u0627",                   # -ha
    "\u200C",                          # ZWNJ
)


def persian_char_fold(text: str) -> str:
    """PersianCharFilter.kt: ZWNJ -> space, pre-tokenization."""
    return text.replace("\u200C", " ")


def persian_normalize(term: str) -> str:
    return "".join(_FA_MAP.get(ch, ch) for ch in term if ch != "\u0654")


def persian_stem(term: str) -> str:
    for s in _FA_SUFFIXES:
        if len(term) >= len(s) + 2 and term.endswith(s):
            term = term[: -len(s)]
    return term


def persian_analyzer(
    stop_words=PERSIAN_STOP_WORDS,
    stem_exclusions=(),
    max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH,
):
    """PersianAnalyzer.createComponents + initReader (PersianAnalyzer.kt)."""
    stop = frozenset(stop_words) if stop_words else frozenset()
    excl = frozenset(stem_exclusions)

    def run(text: str):
        if not text:
            return [], [], 0
        terms, positions = [], []
        for t in standard_tokenize(persian_char_fold(text), max_token_length):
            term = decimal_digit_fold(_lower_simple(t.term))
            term = persian_normalize(arabic_normalize(term))
            if term in stop:  # normalized stop list, post-normalization
                continue
            if term not in excl:
                term = persian_stem(term)
            terms.append(term)
            positions.append(t.position)
        return terms, positions, len(terms)

    return run
