"""Khmer analysis chain (``analysis/extra/.../analysis/km/``).

* ``khmer_tokenize`` — ``km/GraphemeClusterTokenizer.kt``: a syllable
  state machine over the Khmer block (base consonants / independent
  vowels start syllables, coeng U+17D2 glues clusters, digit runs are
  separate tokens, everything else ignored).
* ``khmer_reorder`` — ``km/CharReorderFilter.kt``: canonical in-syllable
  reordering (stable category sort: base < robat < coeng < ZW(N)J <
  shifter < vowel < modifier), split-vowel composition, u-before-vowel
  reordering, triisap/muusikatoan upshifting, coeng-ro second, coeng
  da -> ta, plus the fixed replacement list.
* ``khmer_analyzer`` — ``km/KhmerAnalyzer.kt`` chain (defaults:
  stopwords OFF, number normalization OFF, like the reference's no-arg
  constructor): GraphemeClusterTokenizer -> CharReorderFilter ->
  [StopFilter] -> [KhmerNumberFilter].
"""

from __future__ import annotations

import re

KHMER_STOP_WORDS = frozenset((
    "#", "បន្ថែម", "ខណៈនោះ", "ខាងក្រោម", "គ្រប់គ្រាន់", "ដោយសារតែ",
    "នៅពេលនោះ", "ប្រទះឃើញ", "ម្យ៉ាងទៀត", "យ៉ាងខាប់", "លើក", "ប្រាំ", "វា",
    "កម្រិត", "កាន់", "ការ", "ការបើ", "ការផ្លាស់ប្ដូរ", "ការរៀបចំ",
    "កាលណា", "កាលនោះ", "ក្តី", "ក្នុង", "ក្នុងនេះ", "ក្រាស់", "ក្រោម",
    "ក្រោយ", "ក្រោយមក", "ក្លាយ", "ក្លាយជា", "កំពុង", "កំពូល", "កំឡុងពេល",
    "ក៏", "ក៏ដោយ", "ក៏បាន", "ខាង", "ខាងក្នុង", "ខាងក្រោយ", "ខាងក្រៅ",
    "ខាងមុខ", "ខាងលើ", "ខុស", "ខ្ងុំ", "ខ្លួន", "ខ្លួនឯង", "ខ្លះ", "គាត់",
    "គាំទ្រ", "គឺ", "គឺជា", "គួរតែ", "គួរសម", "គេ", "គ្នា", "គ្មាន",
    "គ្មានមួយ", "គ្រប់", "គ្រា", "គ្រាមួយ", "ចង់", "ចន្លោះ", "ចាកពី",
    "ចុង", "ចុងក្រោយ", "ចេញ", "ចេញពី", "ចៃដន្យ", "ច្រើន", "ច្រើនជាងគេ",
    "ចំណែក", "ចំណោម", "ចំនួន", "ចំនួនច្រើន", "ចំពោះ", "ចំហៀង", "ឆ្ងាយ",
    "ឆ្ងាយជាង", "ឆ្ពោះទៅ", "ជាដរាប", "ជានិច្ចកាល", "ជាមុន", "ជាមួយគ្នា",
    "ជាស្រេច", "ជិត", "ជុំវិញ", "ជួនកាល", "ជួយ", "ជំរាល", "ឈម", "ញឹក",
    "ញឹកញាប់", "ញែក", "ដកចេញ", "ដង", "ដដែល", "ដល់", "ដល់ម្ល៉េះ", "ដូចគ្នា",
    "ដូចជា", "ដូចនេះ", "ដូចនេះហើយ", "ដូចនោះ", "ដូចម្ដេច", "ដូច្នេះ",
    "ដូច្នេះហើយ", "ដូច្នោះទេ", "ដើម្បី", "ដើម្បីនឹង", "ដែរ", "ដែល",
    "ដែលក្រោយបំផុត", "ដែលក្លាយ", "ដែលជា", "ដែលជួយ", "ដែលនឹង", "ដែលអាច",
    "ដោយ", "ដោយខ្លួនឯង", "ដោយទីពីរ", "ដោយភាគច្រើន", "ដោយមិនដឹងជាយ៉ាងម៉េច",
    "ដោយមិនដឹងជារឿងអ្វី", "ដោយមិនដឹងម៉េចទេ", "ដោយសារតែ", "ដោយហេតុថា",
    "ដោយហេតុនោះ", "ដំបូង", "ដ៏ទៃ", "ណា", "ណាមួយ", "ណាស់", "តាម",
    "តាមចន្លោះ", "តាំង", "តាំងពី", "តាំងពីនោះ", "តើ", "តែ", "តែមួយ",
    "តោងតែ", "ត្រង់នោះហើយ", "ត្រឹម", "ត្រឹមតែ", "ត្រូវ", "ត្រូវបាន", "ថា",
    "ថែមទៀត", "ថ្មី", "ថ្វីបើ", "ទទឹង", "ទទួល", "ទទេ", "ទល់នឹង", "ទាន់",
    "ទាប", "ទាល់តែ", "ទាស់", "ទាំង", "ទាំងនេះ", "ទាំងពីរ", "ទាំងមូល",
    "ទាំងឡាយ", "ទាំងអស់", "ទី", "ទីកន្លែង", "ទីណា", "ទីនេះ", "ទីនោះ",
    "ទីពីរ", "ទុក", "ទុកបាន", "ទូទាំង", "ទៀត", "ទេ", "ទោះបី", "ទោះបីជា",
    "ទៅ", "ទៅដល់", "ទៅផុត", "ទៅលើ", "ទំនង", "ធម្មតា", "ធ្លាក់ចុះ", "ធ្វើ",
    "ធ្វើបាន", "ធ្វើអោយបានចំរើន", "នរណា", "នាង", "នាយ", "និង", "និមួយ",
    "និយម", "នីមួយ", "នឹង", "នូវ", "នេះ", "នេះទៅទៀត", "នៃ", "នោះ", "នោះទេ",
    "នោះមក", "នោះឯង", "នៅ", "នៅក្នុង", "នៅគ្រា", "នៅជិតៗ", "នៅតែ", "នៅទី",
    "នៅពេល", "នៅមុខ", "នៅម្ដុំនេះ", "នៅលើ", "ន័យនេះ", "បង្អស់", "បន្ដិច",
    "បន្ថែម", "បន្ទាប់", "បន្ទាប់ពី", "បន្ទាប់ពីនេះ", "ប៉ុនគ្នា",
    "ប៉ុន្ដែ", "ប៉ុន្មាន", "បានជា", "បានដែរ", "បី", "បីនេះ", "បួន", "បើ",
    "បើមិនមែន", "បែបនេះ", "ប្រឈម", "ប្រមាណ", "ប្រហែល", "ប្រាំបី",
    "ប្រាំបួន", "ប្រាំមួយ", "បំផុត", "បំពេញ", "ផង", "ផុត", "ផ្គាប់",
    "ផ្ដល់នូវ", "ផ្ទុយនឹង", "ផ្ទុយពី", "ផ្សេងទៀត", "ពី", "ពីនេះតទៅ",
    "ពីនេះពីនោះ", "ពីព្រោះ", "ពីមុន", "ពីរ", "ពីលើ", "ពុំ", "ពួក", "ពួកគេ",
    "ពេញ", "ពេញទាំង", "ពេល", "ពេលដែល", "ពេលនោះ", "ពោលគឺ", "ព្រោះ",
    "ព្រោះតែ", "ភាព", "មក", "មកកាន់", "មកពី", "ម៉េច", "មាន", "មិនដែល",
    "មិនត្រូវ", "មិនទាន់", "មិនទៀង", "មិនព្រម", "មិនមែន", "មិនអាច", "មូល",
    "មូលហេតុ", "មួយ", "មួយចំនួន", "មួយណា", "មួយទៀត", "មែន", "មែនទែន",
    "ម្ដង", "ម្នាក់", "ម្នាក់ៗ", "ម្ភៃ", "ម្យ៉ាងទៀត", "ម្ល៉េះ", "យក",
    "យកចេញ", "យល់ស្រប", "យ៉ាង", "យ៉ាងច្រើន", "យ៉ាងណា", "យ៉ាងណា", "ក៏ដោយ",
    "យ៉ាងណាក្តី", "យ៉ាងនេះ", "យ៉ាងនោះ", "យើង", "ឬ", "រក្សា", "រញៀវ", "ឬទេ",
    "របស់", "របស់ខ្ញុំ", "របស់គាត់", "របស់គាត់", "របស់គេ", "របស់នាង",
    "របស់លោក", "របស់វា", "រយះពេល", "រយៈ", "រយៈនេះ", "រវាង", "រហូតដល់",
    "រាល់", "រឺ", "រឺក៏", "រួចហើយ", "រួម", "រួមទាំង", "លើ", "លើក",
    "លើកលែង", "លើស", "លេខមួយ", "លែង", "លោក", "ល្អ", "លំអិត", "វា", "វិញ",
    "វែង", "សព្វ", "សម្រាប់", "សរុប", "សូម្បីតែ", "សេចក្ដី", "សោះ",
    "ស្ងៀម", "ស្ទើរ", "ស្មើរគ្នា", "ស្មោះ", "ស្វែងរក", "សំខាន់", "សំរាប់",
    "សំរេច", "ហាម", "ហាសិប", "ហុកសិប", "ហើយ", "ហើយនឹង", "ហេតុផល",
    "ហេតុអ្វី", "ហៅ", "ឡើង", "ឡើយ", "ឯ", "ឯការ", "ឯកោ", "អង្កាល់",
    "អញ្ចឹង", "ឯណា", "ឥត", "ឥតទៅណា", "អតីត", "ឯទៀត", "អស់", "ឥឡូវនេះ",
    "អ៊ីចឹង", "អាច", "អី", "អោយ", "អ្នក", "អ្នកក្រោយ", "អ្នកណា", "ឱ្យ",
    "អ្វី", "អ្វីខ្លះ", "អ្វីមួយ", "អំពី", "។ល។", "ជា", "បាន", "មិន",
    "ក្នុង", "នៅ", "ដ៏", "ទ្រង់", "ម្នាល", "ឲ្យ", "ខ្ញុំ", "បុគ្គល",
    "ព្រះអង្គ", "ធម៌", "ឯង", "ព្រះ", "គួរ", "លុះ", "ប្រកបដោយ", "ទើប",
    "ទាំងនោះ", "ត", "សូម", "ជាង",
))


_KM_BASE = lambda c: "\u1780" <= c <= "\u17b3"
_KM_COENG = "\u17d2"
_KM_NUM = "\u17e0\u17e1\u17e2\u17e3\u17e4\u17e5\u17e6\u17e7\u17e8\u17e9"


def _km_cat(c: str) -> str:
    if "\u17e0" <= c <= "\u17f9" or "0" <= c <= "9":
        return "digit"
    if "\u1780" <= c <= "\u17b3":
        return "base"
    if c == _KM_COENG:
        return "coeng"
    if "\u17b6" <= c <= "\u17d3" or c in ("\u17dd", "\u200c", "\u200d"):
        return "inside"
    return "ignore"


def khmer_tokenize(text: str) -> list[str]:
    """Syllable/digit tokens via the reference's state machine."""
    tokens = []
    cur = []
    state = "init"
    for c in text:
        cat = _km_cat(c)
        if cat == "ignore":
            if cur:
                tokens.append("".join(cur))
                cur = []
            state = "init"
            continue
        brk = False
        if state == "init":
            if cat == "base":
                brk = True
                state = "insidesyl"
            elif cat == "digit":
                brk = True
                state = "afterdigit"
        elif state == "insidesyl":
            if cat == "coeng":
                state = "aftercoeng"
            elif cat != "inside":
                brk = True
                state = "insidesyl" if cat == "base" else "afterdigit"
        elif state == "aftercoeng":
            if cat == "digit":
                brk = True
                state = "afterdigit"
            elif cat != "coeng":
                state = "insidesyl"
        elif state == "afterdigit":
            if cat != "digit":
                brk = True
                state = "insidesyl" if cat == "base" else "afterdigit"
        if brk and cur:
            tokens.append("".join(cur))
            cur = []
        cur.append(c)
    if cur:
        tokens.append("".join(cur))
    return tokens


# reorder categories (CharReorderFilter.kt companion init)
def _reorder_cat(c: str) -> int:
    if "\u1780" <= c <= "\u17b3":
        return 1                       # base
    if "\u17b4" <= c <= "\u17c5":
        return 6                       # vowel
    if c == "\u17c6" or c == "\u17cb" or "\u17cd" <= c <= "\u17d1" \
            or c in ("\u17d3", "\u17dd"):
        return 7                       # modifier (strictly after vowel)
    if c in ("\u17c7", "\u17c8"):
        return 8                       # final modifier
    if c in ("\u17c9", "\u17ca"):
        return 5                       # shifter
    if c == "\u17cc":
        return 2                       # robat
    if c == _KM_COENG:
        return 3                       # coeng
    if c in ("\u200c", "\u200d"):
        return 4                       # ZW(N)J
    return 0                           # other


_BNB = "[\u1780-\u1793\u1795-\u17a2]"
_SF = "[\u179e-\u17a0\u17a2]"
_SNF = "[\u1780-\u179d\u17a1]"
_SS = "[\u1784\u1789\u1793\u1794\u1798-\u179d]"
_VA = "[\u17b7-\u17ba\u17be\u17d0\u17dd]|\u17b6\u17c6"
_TRIISAP = re.compile(
    "(" + _SF + "(?:\u17d2" + _BNB + "){0,2}|" + _BNB +
    "(?:\u17d2" + _SF + "(?:\u17d2" + _BNB + ")?|\u17d2" + _BNB +
    "\u17d2" + _SF + "))\u17bb(" + _VA + ")")
_MUUSIKATOAN = re.compile(
    "(" + _SS + "(?:\u17d2" + _SNF + "){0,2}|" + _SNF +
    "(?:\u17d2" + _SS + "(?:\u17d2" + _SNF + ")?|\u17d2" + _SNF +
    "\u17d2" + _SS + "))\u17bb(" + _VA + ")")
_KM_REPLACEMENTS = (
    ("\u1794\u17d2\u178f\u17b8", "\u1794\u17d2\u178a\u17b8"),
    ("\u1795\u1798\u17d2\u178f\u17be",
     "\u1795\u17d2\u178a\u17be\u1798"),
    ("\u1795\u17d2\u178f\u17be\u1798",
     "\u1795\u17d2\u178a\u17be\u1798"),
    ("\u1795\u17d2\u178f\u179b\u17cb",
     "\u1795\u17d2\u178a\u179b\u17cb"),
    ("\u1798\u17d2\u178f\u1784", "\u1798\u17d2\u178a\u1784"),
    ("\u1780\u178e\u179b\u17d2\u178f\u17b6",
     "\u1780\u178e\u17d2\u178a\u17b6\u179b"),
    ("\u1780\u178e\u17d2\u178f\u17b6\u179b",
     "\u1780\u178e\u17d2\u178a\u17b6\u179b"),
)


def khmer_reorder(term: str) -> str:
    """CharReorderFilter.incrementToken (km/CharReorderFilter.kt:76-140)."""
    n = len(term)
    if n < 2 or n > 30 or _reorder_cat(term[0]) != 1:
        return term
    cats = []
    for i, c in enumerate(term):
        cat = _reorder_cat(c)
        if i > 0 and cat == 1 and cats[i - 1] == 3:
            cat = 3                    # base after coeng stays with coeng
        cats.append(cat)
    order = sorted(range(n), key=lambda i: cats[i])   # stable
    res = "".join(term[i] for i in order)
    res = re.sub("([\u200c\u200d])[\u200c\u200d]+", "\\1", res)
    res = re.sub("\u17d2\u17d2+", "\u17d2", res)
    res = re.sub("\u17c1(\u17bb?)\u17b8", "\\1\u17be", res)
    res = re.sub("\u17c1(\u17bb?)\u17b6", "\\1\u17c4", res)
    res = re.sub("\u17b8(\u17bb?)\u17c1", "\\1\u17be", res)
    res = re.sub("\u17b6(\u17bb?)\u17c1", "\\1\u17c4", res)
    res = re.sub("([\u17b7-\u17ba\u17be\u17d0\u17dd]|\u17b6\u17c6)(\u17bb)",
                 "\\2\\1", res)
    res = _TRIISAP.sub("\\1\u17ca\\2", res)
    res = _MUUSIKATOAN.sub("\\1\u17c9\\2", res)
    res = re.sub("(\u17d2\u179a)(\u17d2[\u1780-\u17b3])", "\\2\\1", res)
    res = re.sub("(\u17d2)\u178a", "\\1\u178f", res)
    for bad, good in _KM_REPLACEMENTS:
        res = res.replace(bad, good)
    return res


_KM_DIGIT_MAP = str.maketrans("\u17e1\u17e2\u17e3\u17e4\u17e5\u17e6\u17e7\u17e8\u17e9\u17e0",
                              "1234567890")


def khmer_normalize_number(term: str) -> str:
    return term.translate(_KM_DIGIT_MAP)


def khmer_analyzer(stop_words=None, enable_stopwords: bool = False,
                   khmer_number: bool = False):
    """KhmerAnalyzer (no-arg defaults: stopwords off, numbers off)."""
    stop = KHMER_STOP_WORDS if stop_words is None else frozenset(stop_words)

    def run(text: str):
        if not text:
            return [], [], 0
        terms, positions = [], []
        for pos, raw in enumerate(khmer_tokenize(text)):
            term = khmer_reorder(raw)
            if enable_stopwords and term in stop:
                continue
            if khmer_number and term and all(c in _KM_NUM for c in term):
                term = khmer_normalize_number(term)
            terms.append(term)
            positions.append(pos)
        return terms, positions, len(terms)

    return run
