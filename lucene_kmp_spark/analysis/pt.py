"""Portuguese analysis chain (``analysis/common/.../analysis/pt/``).

* ``portuguese_light_stem`` — ``pt/PortugueseLightStemmer.kt``: the UniNE
  light stemmer (Savoy): plural suffix restoration (-ões/-ães -> -ão,
  -eis -> -el, ...), feminine normalization (-osa -> -oso, -ona -> -ão, ...),
  final-vowel strip, then accent fold.
* ``portuguese_analyzer`` — ``pt/PortugueseAnalyzer.kt:34-42`` chain:
  StandardTokenizer -> LowerCaseFilter -> StopFilter(portuguese) ->
  [SetKeywordMarkerFilter] -> PortugueseLightStemFilter.
"""

from __future__ import annotations

from lucene_kmp_spark.analysis.standard import (
    DEFAULT_MAX_TOKEN_LENGTH,
    _lower_simple,
    standard_tokenize,
)

# portuguese_stop.txt (snowball) as embedded in PortugueseAnalyzer
PORTUGUESE_STOP_WORDS = frozenset((
    "de", "a", "o", "que", "e", "do", "da", "em",
    "um", "para", "com", "não", "uma", "os", "no", "se",
    "na", "por", "mais", "as", "dos", "como", "mas", "ao",
    "ele", "das", "à", "seu", "sua", "ou", "quando", "muito",
    "nos", "já", "eu", "também", "só", "pelo", "pela", "até",
    "isso", "ela", "entre", "depois", "sem", "mesmo", "aos", "seus",
    "quem", "nas", "me", "esse", "eles", "você", "essa", "num",
    "nem", "suas", "meu", "às", "minha", "numa", "pelos", "elas",
    "qual", "nós", "lhe", "deles", "essas", "esses", "pelas", "este",
    "dele", "tu", "te", "vocês", "vos", "lhes", "meus", "minhas",
    "teu", "tua", "teus", "tuas", "nosso", "nossa", "nossos", "nossas",
    "dela", "delas", "esta", "estes", "estas", "aquele", "aquela", "aqueles",
    "aquelas", "isto", "aquilo", "estou", "está", "estamos", "estão", "estive",
    "esteve", "estivemos", "estiveram", "estava", "estávamos", "estavam", "estivera", "estivéramos",
    "esteja", "estejamos", "estejam", "estivesse", "estivéssemos", "estivessem", "estiver", "estivermos",
    "estiverem", "hei", "há", "havemos", "hão", "houve", "houvemos", "houveram",
    "houvera", "houvéramos", "haja", "hajamos", "hajam", "houvesse", "houvéssemos", "houvessem",
    "houver", "houvermos", "houverem", "houverei", "houverá", "houveremos", "houverão", "houveria",
    "houveríamos", "houveriam", "sou", "somos", "são", "era", "éramos", "eram",
    "fui", "foi", "fomos", "foram", "fora", "fôramos", "seja", "sejamos",
    "sejam", "fosse", "fôssemos", "fossem", "for", "formos", "forem", "serei",
    "será", "seremos", "serão", "seria", "seríamos", "seriam", "tenho", "tem",
    "temos", "tém", "tinha", "tínhamos", "tinham", "tive", "teve", "tivemos",
    "tiveram", "tivera", "tivéramos", "tenha", "tenhamos", "tenham", "tivesse", "tivéssemos",
    "tivessem", "tiver", "tivermos", "tiverem", "terei", "terá", "teremos", "terão",
    "teria", "teríamos", "teriam",
))

_PT_FOLD = str.maketrans("àáâäãòóôöõèéêëùúûüìíîïç", "aaaaaoooooeeeeuuuuiiiic")


def _ends(s: list[str], suf: str) -> bool:
    return len(s) >= len(suf) and "".join(s[-len(suf):]) == suf


def _pt_remove_suffix(s: list[str]) -> list[str]:
    """PortugueseLightStemmer.removeSuffix (PortugueseLightStemmer.kt:38-80)."""
    if len(s) > 4 and _ends(s, "es") and s[-3] in ("r", "s", "l", "z"):
        return s[:-2]
    if len(s) > 3 and _ends(s, "ns"):
        s = s[:-1]
        s[-1] = "m"
        return s
    if len(s) > 4 and (_ends(s, "eis") or _ends(s, "éis")):
        s = s[:-1]
        s[-2] = "e"
        s[-1] = "l"
        return s
    if len(s) > 4 and _ends(s, "ais"):
        s = s[:-1]
        s[-1] = "l"
        return s
    if len(s) > 4 and _ends(s, "óis"):
        s = s[:-1]
        s[-2] = "o"
        s[-1] = "l"
        return s
    if len(s) > 4 and _ends(s, "is"):
        s[-1] = "l"
        return s
    if len(s) > 3 and (_ends(s, "ões") or _ends(s, "ães")):
        s = s[:-1]
        s[-2] = "ã"
        s[-1] = "o"
        return s
    if len(s) > 6 and _ends(s, "mente"):
        return s[:-5]
    if len(s) > 3 and s[-1] == "s":
        return s[:-1]
    return s


def _pt_norm_feminine(s: list[str]) -> list[str]:
    """PortugueseLightStemmer.normFeminine (PortugueseLightStemmer.kt:82-117)."""
    if len(s) > 7 and (_ends(s, "inha") or _ends(s, "iaca") or _ends(s, "eira")):
        s[-1] = "o"
        return s
    if len(s) > 6:
        if (_ends(s, "osa") or _ends(s, "ica") or _ends(s, "ida")
                or _ends(s, "ada") or _ends(s, "iva") or _ends(s, "ama")):
            s[-1] = "o"
            return s
        if _ends(s, "ona"):
            s = s[:-1]
            s[-2] = "ã"
            s[-1] = "o"
            return s
        if _ends(s, "ora"):
            return s[:-1]
        if _ends(s, "esa"):
            s = s[:-1]
            s[-2] = "ê"
            return s
        if _ends(s, "na"):
            s[-1] = "o"
            return s
    return s


def portuguese_light_stem(term: str) -> str:
    """PortugueseLightStemmer.stem (PortugueseLightStemmer.kt:9-36)."""
    if len(term) < 4:
        return term
    s = list(term)
    s = _pt_remove_suffix(s)
    if len(s) > 3 and s[-1] == "a":
        s = _pt_norm_feminine(s)
    if len(s) > 4 and s[-1] in ("e", "a", "o"):
        s = s[:-1]
    return "".join(s).translate(_PT_FOLD)


def portuguese_analyzer(
    stop_words=PORTUGUESE_STOP_WORDS,
    stem_exclusions=(),
    max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH,
):
    """PortugueseAnalyzer.createComponents (PortugueseAnalyzer.kt:34-42)."""
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
                term = portuguese_light_stem(term)
            terms.append(term)
            positions.append(t.position)
        return terms, positions, len(terms)

    return run
