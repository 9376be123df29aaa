"""Russian analysis chain (``analysis/common/.../analysis/ru/``).

* ``russian_snowball_stem`` — implements the PUBLISHED Snowball "russian"
  algorithm (snowballstem.org/algorithms/russian/stemmer.html), the same
  algorithm the reference runs via its generated
  ``org/tartarus/snowball/ext/RussianStemmer.kt``: RV/R2 regions,
  perfective gerund -> reflexive -> adjectival/verb/noun, trailing-и strip,
  derivational ость/ост in R2, tidying (нн undouble, superlative ейш(е),
  soft sign). Implemented from the published specification, not the
  generated code.
* ``russian_analyzer`` — ``ru/RussianAnalyzer.kt:35-44`` chain:
  StandardTokenizer -> LowerCaseFilter -> StopFilter(russian, snowball
  list) -> [SetKeywordMarkerFilter] -> SnowballFilter(RussianStemmer).
"""

from __future__ import annotations

from lucene_kmp_spark.analysis.standard import (
    DEFAULT_MAX_TOKEN_LENGTH,
    _lower_simple,
    standard_tokenize,
)

RUSSIAN_STOP_WORDS = frozenset((
    "и", "в", "во", "не", "что", "он", "на", "я",
    "с", "со", "как", "а", "то", "все", "она", "так",
    "его", "но", "да", "ты", "к", "у", "же", "вы",
    "за", "бы", "по", "только", "ее", "мне", "было", "вот",
    "от", "меня", "еще", "нет", "о", "из", "ему", "теперь",
    "когда", "даже", "ну", "вдруг", "ли", "если", "уже", "или",
    "ни", "быть", "был", "него", "до", "вас", "нибудь", "опять",
    "уж", "вам", "сказал", "ведь", "там", "потом", "себя", "ничего",
    "ей", "может", "они", "тут", "где", "есть", "надо", "ней",
    "для", "мы", "тебя", "их", "чем", "была", "сам", "чтоб",
    "без", "будто", "человек", "чего", "раз", "тоже", "себе", "под",
    "жизнь", "будет", "ж", "тогда", "кто", "этот", "говорил", "того",
    "потому", "этого", "какой", "совсем", "ним", "здесь", "этом", "один",
    "почти", "мой", "тем", "чтобы", "нее", "кажется", "сейчас", "были",
    "куда", "зачем", "сказать", "всех", "никогда", "сегодня", "можно", "при",
    "наконец", "два", "об", "другой", "хоть", "после", "над", "больше",
    "тот", "через", "эти", "нас", "про", "всего", "них", "какая",
    "много", "разве", "сказала", "три", "эту", "моя", "впрочем", "хорошо",
    "свою", "этой", "перед", "иногда", "лучше", "чуть", "том", "нельзя",
    "такой", "им", "более", "всегда", "конечно", "всю", "между",
))

_V = frozenset("\u0430\u0435\u0438\u043e\u0443\u044b\u044d\u044e\u044f")  # а е и о у ы э ю я

# ending groups (longest-first within each group); group-1 endings require a
# preceding а/я that is itself inside RV
_PERF_GERUND_1 = ("\u0432\u0448\u0438\u0441\u044c", "\u0432\u0448\u0438", "\u0432")  # вшись вши в
_PERF_GERUND_2 = ("\u0438\u0432\u0448\u0438\u0441\u044c", "\u044b\u0432\u0448\u0438\u0441\u044c",
                  "\u0438\u0432\u0448\u0438", "\u044b\u0432\u0448\u0438",
                  "\u0438\u0432", "\u044b\u0432")  # ившись ывшись ивши ывши ив ыв
_ADJECTIVE = ("\u0438\u043c\u0438", "\u044b\u043c\u0438",
              "\u0435\u0433\u043e", "\u043e\u0433\u043e", "\u0435\u043c\u0443", "\u043e\u043c\u0443",
              "\u0435\u0435", "\u0438\u0435", "\u044b\u0435", "\u043e\u0435",
              "\u0435\u0439", "\u0438\u0439", "\u044b\u0439", "\u043e\u0439",
              "\u0435\u043c", "\u0438\u043c", "\u044b\u043c", "\u043e\u043c",
              "\u0438\u0445", "\u044b\u0445",
              "\u0443\u044e", "\u044e\u044e", "\u0430\u044f", "\u044f\u044f",
              "\u043e\u044e", "\u0435\u044e")
_PARTICIPLE_1 = ("\u0435\u043c", "\u043d\u043d", "\u0432\u0448", "\u044e\u0449", "\u0449")  # ем нн вш ющ щ
_PARTICIPLE_2 = ("\u0438\u0432\u0448", "\u044b\u0432\u0448", "\u0443\u044e\u0449")  # ивш ывш ующ
_VERB_1 = ("\u0435\u0448\u044c", "\u043d\u043d\u043e",
           "\u0435\u0442\u0435", "\u0439\u0442\u0435",
           "\u043b\u0430", "\u043d\u0430", "\u043b\u0438", "\u0435\u043c",
           "\u043b\u043e", "\u043d\u043e", "\u0435\u0442", "\u044e\u0442",
           "\u043d\u044b", "\u0442\u044c",
           "\u0439", "\u043b", "\u043d")  # ешь нно ете йте ла на ли ем ло но ет ют ны ть й л н
_VERB_2 = ("\u0435\u0439\u0442\u0435", "\u0443\u0439\u0442\u0435",
           "\u0438\u043b\u0430", "\u044b\u043b\u0430", "\u0435\u043d\u0430",
           "\u0438\u0442\u0435", "\u0438\u043b\u0438", "\u044b\u043b\u0438",
           "\u0438\u043b\u043e", "\u044b\u043b\u043e", "\u0435\u043d\u043e",
           "\u0443\u0435\u0442", "\u0443\u044e\u0442",
           "\u0435\u043d\u044b", "\u0438\u0442\u044c", "\u044b\u0442\u044c",
           "\u0438\u0448\u044c",
           "\u0435\u0439", "\u0443\u0439", "\u0438\u043b", "\u044b\u043b",
           "\u0438\u043c", "\u044b\u043c", "\u0435\u043d",
           "\u044f\u0442", "\u0438\u0442", "\u044b\u0442",
           "\u0443\u044e", "\u044e")  # ейте уйте ила ыла ена ите или ыли ило ыло ено ует уют ены ить ыть ишь ей уй ил ыл им ым ен ят ит ыт ую ю
_NOUN = ("\u0438\u044f\u043c\u0438", "\u044f\u043c\u0438", "\u0430\u043c\u0438",
         "\u0438\u0435\u0439", "\u0438\u044f\u043c", "\u0438\u044f\u0445",
         "\u0435\u0432", "\u043e\u0432", "\u0438\u0435", "\u044c\u0435",
         "\u0435\u0438", "\u0438\u0438", "\u0435\u0439", "\u043e\u0439",
         "\u0438\u0439", "\u044f\u043c", "\u0438\u0435\u043c", "\u0435\u043c",
         "\u0430\u043c", "\u043e\u043c", "\u0430\u0445", "\u044f\u0445",
         "\u0438\u044e", "\u044c\u044e", "\u0438\u044f", "\u044c\u044f",
         "\u0430", "\u0435", "\u0438", "\u0439", "\u043e", "\u0443",
         "\u044b", "\u044c", "\u044e", "\u044f")  # иями ями ами ией иям иях ев ов ие ье еи ии ей ой ий ям ием ем ам ом ах ях ию ью ия ья а е и й о у ы ь ю я
_DERIVATIONAL = ("\u043e\u0441\u0442\u044c", "\u043e\u0441\u0442")  # ость ост
_SUPERLATIVE = ("\u0435\u0439\u0448\u0435", "\u0435\u0439\u0448")  # ейше ейш


def _regions(word: str) -> tuple[int, int]:
    """(rv, r2) start offsets per the Snowball definition."""
    n = len(word)
    rv = n
    for i, ch in enumerate(word):
        if ch in _V:
            rv = i + 1
            break
    r1 = n
    for i in range(1, n):
        if word[i] not in _V and word[i - 1] in _V:
            r1 = i + 1
            break
    r2 = n
    for i in range(r1 + 1, n):
        if i < n and word[i] not in _V and word[i - 1] in _V:
            r2 = i + 1
            break
    return rv, r2


def _strip(word: str, rv: int, group1, group2) -> str | None:
    """Longest match across both groups, honoring the preceding-а/я rule for
    group 1; endings must lie entirely inside RV. Returns stripped word."""
    best = None
    for e in group2:
        if word.endswith(e) and len(word) - len(e) >= rv and (best is None or len(e) > best[0]):
            best = (len(e), e, False)
    for e in group1:
        if (word.endswith(e) and len(word) - len(e) >= rv
                and len(word) - len(e) - 1 >= 0
                and word[len(word) - len(e) - 1] in ("\u0430", "\u044f")
                and len(word) - len(e) - 1 >= rv):
            if best is None or len(e) > best[0]:
                best = (len(e), e, True)
    if best is None:
        return None
    return word[: len(word) - best[0]]


def russian_snowball_stem(word: str) -> str:
    rv, r2 = _regions(word)

    # step 1: perfective gerund, else [reflexive] + adjectival|verb|noun
    out = _strip(word, rv, _PERF_GERUND_1, _PERF_GERUND_2)
    if out is None:
        w = word
        for refl in ("\u0441\u044f", "\u0441\u044c"):  # ся сь
            if w.endswith(refl) and len(w) - 2 >= rv:
                w = w[:-2]
                break
        # adjectival: adjective, optionally preceded by participle
        adj = _strip(w, rv, (), _ADJECTIVE)
        if adj is not None:
            part = _strip(adj, rv, _PARTICIPLE_1, _PARTICIPLE_2)
            out = part if part is not None else adj
        else:
            vb = _strip(w, rv, _VERB_1, _VERB_2)
            if vb is not None:
                out = vb
            else:
                nn = _strip(w, rv, (), _NOUN)
                out = nn if nn is not None else w
    word = out

    # step 2: trailing и (in RV)
    if word.endswith("\u0438") and len(word) - 1 >= rv:
        word = word[:-1]

    # step 3: derivational ость/ост in R2
    for e in _DERIVATIONAL:
        if word.endswith(e) and len(word) - len(e) >= r2:
            word = word[: len(word) - len(e)]
            break

    # step 4: tidying (one branch, like the Snowball among)
    if word.endswith("\u043d\u043d") and len(word) - 1 >= rv:
        word = word[:-1]
    else:
        sup = _strip(word, rv, (), _SUPERLATIVE)
        if sup is not None:
            word = sup
            if word.endswith("\u043d\u043d") and len(word) - 1 >= rv:
                word = word[:-1]
        elif word.endswith("\u044c") and len(word) - 1 >= rv:
            word = word[:-1]
    return word


def russian_analyzer(
    stop_words=RUSSIAN_STOP_WORDS,
    stem_exclusions=(),
    max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH,
):
    """RussianAnalyzer.createComponents (RussianAnalyzer.kt:35-44)."""
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
                term = russian_snowball_stem(term)
            terms.append(term)
            positions.append(t.position)
        return terms, positions, len(terms)

    return run
