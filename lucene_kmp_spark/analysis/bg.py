"""Bulgarian analysis chain (``analysis/common/.../analysis/bg/``).

* ``bulgarian_stem`` — ``bg/BulgarianStemmer.kt``: the light stemmer from
  Savoy, "Searching Strategies for the Bulgarian Language" (IR 2007):
  definite-article and plural removal, final-vowel drop, ен->н and
  ъ-elision rewrites.
* ``bulgarian_analyzer`` — ``bg/BulgarianAnalyzer.kt`` chain:
  StandardTokenizer -> LowerCaseFilter -> StopFilter(bulgarian) ->
  [SetKeywordMarkerFilter] -> BulgarianStemFilter.
"""

from __future__ import annotations

from lucene_kmp_spark.analysis.standard import (
    DEFAULT_MAX_TOKEN_LENGTH,
    _lower_simple,
    standard_tokenize,
)

BULGARIAN_STOP_WORDS = frozenset((
    "а", "аз", "ако", "ала", "бе", "без", "беше", "би", "бил", "била",
    "били", "било", "близо", "бъдат", "бъде", "бяха", "в", "вас", "ваш",
    "ваша", "вероятно", "вече", "взема", "ви", "вие", "винаги", "все",
    "всеки", "всички", "всичко", "всяка", "във", "въпреки", "върху", "г",
    "ги", "главно", "го", "д", "да", "дали", "до", "докато", "докога",
    "дори", "досега", "доста", "е", "едва", "един", "ето", "за", "зад",
    "заедно", "заради", "засега", "затова", "защо", "защото", "и", "из",
    "или", "им", "има", "имат", "иска", "й", "каза", "как", "каква",
    "какво", "както", "какъв", "като", "кога", "когато", "което", "които",
    "кой", "който", "колко", "която", "къде", "където", "към", "ли", "м",
    "ме", "между", "мен", "ми", "мнозина", "мога", "могат", "може", "моля",
    "момента", "му", "н", "на", "над", "назад", "най", "направи", "напред",
    "например", "нас", "не", "него", "нея", "ни", "ние", "никой", "нито",
    "но", "някои", "някой", "няма", "обаче", "около", "освен", "особено",
    "от", "отгоре", "отново", "още", "пак", "по", "повече", "повечето",
    "под", "поне", "поради", "после", "почти", "прави", "пред", "преди",
    "през", "при", "пък", "първо", "с", "са", "само", "се", "сега", "си",
    "скоро", "след", "сме", "според", "сред", "срещу", "сте", "съм", "със",
    "също", "т", "тази", "така", "такива", "такъв", "там", "твой", "те",
    "тези", "ти", "тн", "то", "това", "тогава", "този", "той", "толкова",
    "точно", "трябва", "тук", "тъй", "тя", "тях", "у", "харесва", "ч",
    "че", "често", "чрез", "ще", "щом", "я",
))


def _bg_remove_article(s: str) -> str:
    n = len(s)
    if n > 6 and s.endswith("\u0438\u044f\u0442"):       # ият
        return s[:-3]
    if n > 5 and s.endswith((
        "\u044a\u0442",  # ът
        "\u0442\u043e",  # то
        "\u0442\u0435",  # те
        "\u0442\u0430",  # та
        "\u0438\u044f",  # ия
    )):
        return s[:-2]
    if n > 4 and s.endswith("\u044f\u0442"):               # ят
        return s[:-2]
    return s


def _bg_remove_plural(s: str) -> str:
    n = len(s)
    if n > 6:
        if s.endswith("\u043e\u0432\u0446\u0438"):       # овци -> о
            return s[:-3]
        if s.endswith("\u043e\u0432\u0435"):              # ове
            return s[:-3]
        if s.endswith("\u0435\u0432\u0435"):              # еве -> й
            return s[:-3] + "\u0439"
    if n > 5:
        if s.endswith("\u0438\u0449\u0430"):              # ища
            return s[:-3]
        if s.endswith("\u0442\u0430"):                     # та
            return s[:-2]
        if s.endswith("\u0446\u0438"):                     # ци -> к
            return s[:-2] + "\u043a"
        if s.endswith("\u0437\u0438"):                     # зи -> г
            return s[:-2] + "\u0433"
        if s[-3] == "\u0435" and s[-1] == "\u0438":        # еXи -> яX
            return s[:-3] + "\u044f" + s[-2]
    if n > 4:
        if s.endswith("\u0441\u0438"):                     # си -> х
            return s[:-2] + "\u0445"
        if s.endswith("\u0438"):                            # и
            return s[:-1]
    return s


def bulgarian_stem(term: str) -> str:
    """BulgarianStemmer.stem (BulgarianStemmer.kt:20-55)."""
    s = term
    if len(s) < 4:
        return s
    if len(s) > 5 and s.endswith("\u0438\u0449\u0430"):   # ища
        return s[:-3]
    s = _bg_remove_article(s)
    s = _bg_remove_plural(s)
    if len(s) > 3:
        if s.endswith("\u044f"):                            # я
            s = s[:-1]
        if s.endswith(("\u0430", "\u043e", "\u0435")):    # а о е
            s = s[:-1]
    if len(s) > 4 and s.endswith("\u0435\u043d"):          # ен -> н
        s = s[:-2] + "\u043d"
    if len(s) > 5 and s[-2] == "\u044a":                    # ъN -> N
        s = s[:-2] + s[-1]
    return s


def bulgarian_analyzer(stop_words=None, stem_exclusions=(),
                       max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH):
    """BulgarianAnalyzer.createComponents (BulgarianAnalyzer.kt:262-274)."""
    stop = BULGARIAN_STOP_WORDS if stop_words is None else frozenset(stop_words)
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
                term = bulgarian_stem(term)
            terms.append(term)
            positions.append(t.position)
        return terms, positions, len(terms)

    return run
