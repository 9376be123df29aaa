"""Urdu analysis chain (``analysis/extra/.../analysis/ur/``).

* ``urdu_normalize`` — ``ur/UrduNormalizer.kt``: Arabic presentation forms
  folded to canonical Urdu letters (157-rule map incl. lam-alef ligatures
  and tatweel deletion), hamza/madda combining sequences recomposed,
  Quranic/harakat diacritics removed.
* ``urdu_stem`` — ``ur/UrduStemmer.kt``: light stemming — prefix strip,
  alef/meem infix rules (length-gated), suffix strip; words of length <= 3
  untouched.
* ``urdu_analyzer`` — ``ur/UrduAnalyzer.kt:32-43`` chain: StandardTokenizer
  -> LowerCaseFilter -> DecimalDigitFilter -> [SetKeywordMarkerFilter] ->
  UrduNormalizationFilter -> StopFilter(urdu) -> UrduStemFilter.
"""

from __future__ import annotations

from lucene_kmp_spark.analysis.ar import decimal_digit_fold
from lucene_kmp_spark.analysis.standard import (
    DEFAULT_MAX_TOKEN_LENGTH,
    _lower_simple,
    standard_tokenize,
)

URDU_STOP_WORDS = frozenset((
    "آئی", "آئے", "آج", "آخر", "آخرکبر", "آدهی", "آًب", "آٹھ",
    "آیب", "اة", "اخبزت", "اختتبم", "ادھر", "ارد", "اردگرد", "ارکبى",
    "اش", "اضتعوبل", "اضتعوبلات", "اضطرذ", "اضکب", "اضکی", "اضکے", "اطراف",
    "اغیب", "افراد", "الگ", "اور", "اوًچب", "اوًچبئی", "اوًچی", "اوًچے",
    "اى", "اً", "اًذر", "اًہیں", "اٹھبًب", "اپٌب", "اپٌے", "اچھب",
    "اچھی", "اچھے", "اکثر", "اکٹھب", "اکٹھی", "اکٹھے", "اکیلا", "اکیلی",
    "اکیلے", "اگرچہ", "اہن", "ایطے", "ایک", "ب", "ت", "تبزٍ",
    "تت", "تر", "ترتیت", "تریي", "تعذاد", "تن", "تو", "توبم",
    "توہی", "توہیں", "تٌہب", "تک", "تھب", "تھوڑا", "تھوڑی", "تھوڑے",
    "تھی", "تھے", "تیي", "ثب", "ثبئیں", "ثبترتیت", "ثبری", "ثبرے",
    "ثبعث", "ثبلا", "ثبلترتیت", "ثبہر", "ثدبئے", "ثرآں", "ثراں", "ثرش",
    "ثعذ", "ثغیر", "ثلٌذ", "ثلٌذوثبلا", "ثلکہ", "ثي", "ثٌب", "ثٌبرہب",
    "ثٌبرہی", "ثٌبرہے", "ثٌبًب", "ثٌذ", "ثٌذکرو", "ثٌذکرًب", "ثٌذی", "ثڑا",
    "ثڑوں", "ثڑی", "ثڑے", "ثھر", "ثھرا", "ثھراہوا", "ثھرپور", "ثھی",
    "ثہت", "ثہتر", "ثہتری", "ثہتریي", "ثیچ", "ج", "خب", "خبرہب",
    "خبرہی", "خبرہے", "خبهوظ", "خبًب", "خبًتب", "خبًتی", "خبًتے", "خبًٌب",
    "خت", "ختن", "خجکہ", "خص", "خططرذ", "خلذی", "خو", "خواى",
    "خوًہی", "خوکہ", "خٌبة", "خگہ", "خگہوں", "خگہیں", "خیطب", "خیطبکہ",
    "در", "درخبت", "درخہ", "درخے", "درزقیقت", "درضت", "دش", "دفعہ",
    "دلچطپ", "دلچطپی", "دلچطپیبں", "دو", "دور", "دوراى", "دوضرا", "دوضروں",
    "دوضری", "دوضرے", "دوًوں", "دکھبئیں", "دکھبتب", "دکھبتی", "دکھبتے", "دکھبو",
    "دکھبًب", "دکھبیب", "دی", "دیب", "دیتب", "دیتی", "دیتے", "دیر",
    "دیٌب", "دیکھو", "دیکھٌب", "دیکھی", "دیکھیں", "دے", "ر", "راضتوں",
    "راضتہ", "راضتے", "رریعہ", "رریعے", "رکي", "رکھ", "رکھب", "رکھتب",
    "رکھتبہوں", "رکھتی", "رکھتے", "رکھی", "رکھے", "رہب", "رہی", "رہے",
    "ز", "زبصل", "زبضر", "زبل", "زبلات", "زبلیہ", "زصوں", "زصہ",
    "زصے", "زقبئق", "زقیتیں", "زقیقت", "زکن", "زکویہ", "زیبدٍ", "صبف",
    "صسیر", "صفر", "صورت", "صورتسبل", "صورتوں", "صورتیں", "ض", "ضبت",
    "ضبتھ", "ضبدٍ", "ضبرا", "ضبرے", "ضبل", "ضبلوں", "ضت", "ضرور",
    "ضرورت", "ضروری", "ضلطلہ", "ضوچ", "ضوچب", "ضوچتب", "ضوچتی", "ضوچتے",
    "ضوچو", "ضوچٌب", "ضوچی", "ضوچیں", "ضکب", "ضکتب", "ضکتی", "ضکتے",
    "ضکٌب", "ضکی", "ضکے", "ضیذھب", "ضیذھی", "ضیذھے", "ضیکٌڈ", "ضے",
    "طرف", "طریق", "طریقوں", "طریقہ", "طریقے", "طور", "طورپر", "ظبہر",
    "ع", "عذد", "عظین", "علاقوں", "علاقہ", "علاقے", "علاوٍ", "عووهی",
    "غبیذ", "غخص", "غذ", "غروع", "غروعبت", "غے", "فرد", "فی",
    "ق", "قجل", "قجیلہ", "قطن", "لئے", "لا", "لازهی", "لو",
    "لوجب", "لوجی", "لوجے", "لوسبت", "لوسہ", "لوگ", "لوگوں", "لڑکپي",
    "لگتب", "لگتی", "لگتے", "لگٌب", "لگی", "لگیں", "لگے", "لی",
    "لیب", "لیٌب", "لیں", "لے", "ه", "هتعلق", "هختلف", "هسترم",
    "هسترهہ", "هسطوش", "هسیذ", "هطئلہ", "هطئلے", "هطبئل", "هطتعول", "هطلق",
    "هعلوم", "هػتول", "هلا", "هوکي", "هوکٌبت", "هوکٌہ", "هٌبضت", "هڑا",
    "هڑًب", "هڑے", "هکول", "هگر", "هہرثبى", "هیرا", "هیری", "هیرے",
    "هیں", "و", "وار", "والے", "وٍ", "ًئی", "ًئے", "ًب",
    "ًبپطٌذ", "ًبگسیر", "ًطجت", "ًقطہ", "ًو", "ًوخواى", "ًکبلٌب", "ًکتہ",
    "ًہ", "ًہیں", "ًیب", "ًے", "ٓ آش", "ٹھیک", "پبئے", "پبش",
    "پبًب", "پبًچ", "پر", "پراًب", "پطٌذ", "پل", "پورا", "پوچھب",
    "پوچھتب", "پوچھتی", "پوچھتے", "پوچھو", "پوچھوں", "پوچھٌب", "پوچھیں", "پچھلا",
    "پھر", "پہلا", "پہلی", "پہلےضی", "پہلےضے", "پہلےضےہی", "پیع", "چبر",
    "چبہب", "چبہٌب", "چبہے", "چلا", "چلو", "چلیں", "چلے", "چکب",
    "چکی", "چکیں", "چکے", "چھوٹب", "چھوٹوں", "چھوٹی", "چھوٹے", "چھہ",
    "چیسیں", "ڈھوًڈا", "ڈھوًڈلیب", "ڈھوًڈو", "ڈھوًڈًب", "ڈھوًڈی", "ڈھوًڈیں", "ک",
    "کئی", "کئے", "کب", "کبفی", "کبم", "کت", "کجھی", "کرا",
    "کرتب", "کرتبہوں", "کرتی", "کرتے", "کرتےہو", "کررہب", "کررہی", "کررہے",
    "کرو", "کرًب", "کریں", "کرے", "کطی", "کل", "کن", "کوئی",
    "کوتر", "کورا", "کوروں", "کورٍ", "کورے", "کوطي", "کوى", "کوًطب",
    "کوًطی", "کوًطے", "کھولا", "کھولو", "کھولٌب", "کھولی", "کھولیں", "کھولے",
    "کہ", "کہب", "کہتب", "کہتی", "کہتے", "کہو", "کہوں", "کہٌب",
    "کہی", "کہیں", "کہے", "کی", "کیب", "کیطب", "کیطرف", "کیطے",
    "کیلئے", "کیوًکہ", "کیوں", "کیے", "کے", "کےثعذ", "کےرریعے", "گئی",
    "گئے", "گب", "گرد", "گروٍ", "گروپ", "گروہوں", "گٌتی", "گی",
    "گیب", "گے", "ہر", "ہن", "ہو", "ہوئی", "ہوئے", "ہوا",
    "ہوبرا", "ہوبری", "ہوبرے", "ہوتب", "ہوتی", "ہوتے", "ہورہب", "ہورہی",
    "ہورہے", "ہوضکتب", "ہوضکتی", "ہوضکتے", "ہوًب", "ہوًی", "ہوًے", "ہوچکب",
    "ہوچکی", "ہوچکے", "ہوگئی", "ہوگئے", "ہوگیب", "ہوں", "ہی", "ہیں",
    "ہے", "ی", "یقیٌی", "یہ", "یہبں",
))

_UR_CHAR_MAP = {
    "\uFE81": "\u0622",
    "\uFE82": "\u0622",
    "\uFE83": "\u0623",
    "\uFE8D": "\u0627",
    "\uFE8E": "\u0627",
    "\uFE8F": "\u0628",
    "\uFE90": "\u0628",
    "\uFE91": "\u0628",
    "\uFE92": "\u0628",
    "\uFB56": "\u067E",
    "\uFB58": "\u067E",
    "\uFB59": "\u067E",
    "\uFE95": "\u062A",
    "\uFE96": "\u062A",
    "\uFE97": "\u062A",
    "\uFE98": "\u062A",
    "\uFB66": "\u0679",
    "\uFB67": "\u0679",
    "\uFB68": "\u0679",
    "\uFB69": "\u0679",
    "\uFE9B": "\u062B",
    "\uFE9C": "\u062B",
    "\uFE9A": "\u062B",
    "\uFE9D": "\u062C",
    "\uFE9E": "\u062C",
    "\uFE9F": "\u062C",
    "\uFEA0": "\u062C",
    "\uFEA1": "\u062D",
    "\uFEA3": "\u062D",
    "\uFEA4": "\u062D",
    "\uFEA2": "\u062D",
    "\uFEA7": "\u062E",
    "\uFEA8": "\u062E",
    "\uFEA6": "\u062E",
    "\uFEA9": "\u062F",
    "\uFEAA": "\u062F",
    "\uFEAC": "\u0630",
    "\uFEAB": "\u0630",
    "\uFEAD": "\u0631",
    "\uFEAE": "\u0631",
    "\uFEAF": "\u0632",
    "\uFEB0": "\u0632",
    "\uFEB1": "\u0633",
    "\uFEB2": "\u0633",
    "\uFEB3": "\u0633",
    "\uFEB4": "\u0633",
    "\uFEB5": "\u0634",
    "\uFEB6": "\u0634",
    "\uFEB7": "\u0634",
    "\uFEB8": "\u0634",
    "\uFEB9": "\u0635",
    "\uFEBA": "\u0635",
    "\uFEBB": "\u0635",
    "\uFEBC": "\u0635",
    "\uFEBD": "\u0636",
    "\uFEBE": "\u0636",
    "\uFEBF": "\u0636",
    "\uFEC0": "\u0636",
    "\uFEC3": "\u0637",
    "\uFEC4": "\u0637",
    "\uFEC5": "\u0638",
    "\uFEC7": "\u0638",
    "\uFEC8": "\u0638",
    "\uFEC9": "\u0639",
    "\uFECA": "\u0639",
    "\uFECB": "\u0639",
    "\uFECC": "\u0639",
    "\uFECD": "\u063A",
    "\uFECF": "\u063A",
    "\uFED0": "\u063A",
    "\uFED1": "\u0641",
    "\uFED2": "\u0641",
    "\uFED3": "\u0641",
    "\uFED4": "\u0641",
    "\uFED5": "\u0642",
    "\uFED6": "\u0642",
    "\uFED7": "\u0642",
    "\uFED8": "\u0642",
    "\uFEDD": "\u0644",
    "\uFEDE": "\u0644",
    "\uFEDF": "\u0644",
    "\uFEE0": "\u0644",
    "\uFEE1": "\u0645",
    "\uFEE2": "\u0645",
    "\uFEE3": "\u0645",
    "\uFEE4": "\u0645",
    "\uFEE5": "\u0646",
    "\uFEE6": "\u0646",
    "\uFEE7": "\u0646",
    "\uFEE8": "\u0646",
    "\uFB7A": "\u0686",
    "\uFB7B": "\u0686",
    "\uFB7C": "\u0686",
    "\uFB7D": "\u0686",
    "\uFB88": "\u0688",
    "\uFB89": "\u0688",
    "\uFB8D": "\u0691",
    "\uFB8C": "\u0691",
    "\uFB8B": "\u0698",
    "\uFB8E": "\u06A9",
    "\uFB8F": "\u06A9",
    "\uFB90": "\u06A9",
    "\uFB91": "\u06A9",
    "\uFEDB": "\u06A9",
    "\u0643": "\u06A9",
    "\uFB92": "\u06AF",
    "\uFB93": "\u06AF",
    "\uFB94": "\u06AF",
    "\uFB95": "\u06AF",
    "\uFB9E": "\u06BA",
    "\uFB9F": "\u06BA",
    "\uFEEE": "\u0648",
    "\uFEED": "\u0648",
    "\uFE85": "\u0624",
    "\uFBAA": "\u06BE",
    "\uFBAC": "\u06BE",
    "\uFBAD": "\u06BE",
    "\uFEEC": "\u06BE",
    "\uFEEB": "\u06BE",
    "\uFBAB": "\u06BE",
    "\uFEE9": "\u06C1",
    "\uFBA6": "\u06C1",
    "\uFEEA": "\u06C1",
    "\uFBA7": "\u06C1",
    "\uFBA9": "\u06C1",
    "\uFBA8": "\u06C1",
    "\u0647": "\u06C1",
    "\u0629": "\u06C3",
    "\uFE80": "\u0621",
    "\uFBFC": "\u06CC",
    "\u0649": "\u06CC",
    "\uFBFD": "\u06CC",
    "\uFEF0": "\u06CC",
    "\uFEF1": "\u06CC",
    "\uFEF2": "\u06CC",
    "\uFBFE": "\u06CC",
    "\uFBFF": "\u06CC",
    "\u064A": "\u06CC",
    "\uFE8B": "\u0626",
    "\uFE8C": "\u0626",
    "\uFBAE": "\u06D2",
    "\uFBAF": "\u06D2",
    "\uFEF3": "\u06D2",
    "\uFEF4": "\u06D2",
    "\u0660": "\u06F0",
    "\u0661": "\u06F1",
    "\u0662": "\u06F2",
    "\u0663": "\u06F3",
    "\u0664": "\u06F4",
    "\u0665": "\u06F5",
    "\u0666": "\u06F6",
    "\u0667": "\u06F7",
    "\u0668": "\u06F8",
    "\u0669": "\u06F9",
    "\uFEFB": "\u0644\u0627",
    "\uFEFC": "\u0644\u0627",
    "\u0640": "",
}

_UR_DIACRITICS = frozenset(
    [chr(c) for c in range(0x0610, 0x061B)]
    + [chr(c) for c in range(0x064B, 0x0660)]
    + ["\u0670"]
    + [chr(c) for c in range(0x06D6, 0x06DD) if c != 0x06DD]
    + ["\u06DF", "\u06E0", "\u06E1", "\u06E2", "\u06E3", "\u06E4",
       "\u06E5", "\u06E6", "\u06E7", "\u06E8", "\u06EA", "\u06EB",
       "\u06EC", "\u06ED"]
)

_UR_COMBINE = {
    ("\u0627", "\u0653"): "\u0622",  # alef + madda -> alef madda
    ("\u0627", "\u0654"): "\u0623",  # alef + hamza -> alef hamza
    ("\u06D2", "\u0654"): "\u06D3",  # yeh barree + hamza
}


def urdu_normalize(term: str) -> str:
    """UrduNormalizer.normalize (UrduNormalizer.kt:16-60)."""
    out = []
    i = 0
    n = len(term)
    while i < n:
        ch = term[i]
        if i + 1 < n and (ch, term[i + 1]) in _UR_COMBINE:
            for c in _UR_COMBINE[(ch, term[i + 1])]:
                if c not in _UR_DIACRITICS:
                    out.append(c)
            i += 2
            continue
        rep = _UR_CHAR_MAP.get(ch)
        if rep is not None:
            for c in rep:
                if c not in _UR_DIACRITICS:
                    out.append(c)
        elif ch not in _UR_DIACRITICS:
            out.append(ch)
        i += 1
    return "".join(out)


_UR_PREFIXES = ("\u0627\u0644", "\u062A\u0634", "\u062F\u0633", "\u062A\u0630",
                "\u0646\u0627", "\u0627\u0635", "\u062A\u0627", "\u0639\u0634")
_UR_SUFFIXES = ("\u0648\u06CC\u06BA", "\u0626\u06CC\u06BA", "\u06CC\u0627\u06BA",
                "\u0627\u062A\u06D2", "\u0627\u062A\u06CC", "\u06C1\u0649\u06D2",
                "\u0648\u06D2", "\u0648\u06BA")
_UR_RULE2 = frozenset("\u0627\u062A\u0637\u06CC\u06BA\u0626\u0624\u0621")
_UR_RULE3 = frozenset("\u0627\u06CC\u06BA\u0626\u0624\u0621\u0648")


def urdu_stem(term: str) -> str:
    """UrduStemmer.stem (UrduStemmer.kt:16-74)."""
    if len(term) <= 3:
        return term
    word = term
    for p in _UR_PREFIXES:
        if len(word) > len(p) + 2 and word.startswith(p):
            word = word[len(p):]
            break
    # infix rules
    if word and word[0] == "\u0627":
        if len(word) == 5 and word[1] == "\u062A":
            word = "".join(c for c in word if c not in _UR_RULE3)
        elif len(word) == 5:
            word = word.replace("\u0627", "")
        elif len(word) > 5:
            word = "".join(c for c in word if c not in _UR_RULE2)
    elif len(word) == 5 and word and word[0] == "\u0645" and word[-2] == "\u0648":
        word = word.replace("\u0645", "").replace("\u0648", "")
    for s in _UR_SUFFIXES:
        if len(word) > len(s) + 2 and word.endswith(s):
            word = word[: -len(s)]
            break
    return word


def urdu_analyzer(
    stop_words=URDU_STOP_WORDS,
    stem_exclusions=(),
    max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH,
):
    """UrduAnalyzer.createComponents (UrduAnalyzer.kt:32-43)."""
    stop = frozenset(stop_words) if stop_words else frozenset()
    excl = frozenset(stem_exclusions)

    def run(text: str):
        if not text:
            return [], [], 0
        terms, positions = [], []
        for t in standard_tokenize(text, max_token_length):
            term = decimal_digit_fold(_lower_simple(t.term))
            is_keyword = term in excl
            if not is_keyword:
                term = urdu_normalize(term)
            if term in stop:
                continue
            if not is_keyword:
                term = urdu_stem(term)
            terms.append(term)
            positions.append(t.position)
        return terms, positions, len(terms)

    return run
