"""Spanish analysis chain (``analysis/common/.../analysis/es/``).

* ``spanish_light_stem`` — ``es/SpanishLightStemmer.kt``: the CLEF-2001
  light stemmer (Savoy): accent fold, then strip final -o/-a/-e, -os/-as/-es
  (with the -eses and -ces -> -z special cases).
* ``spanish_analyzer`` — ``es/SpanishAnalyzer.kt:34-42`` chain:
  StandardTokenizer -> LowerCaseFilter -> StopFilter(spanish) ->
  [SetKeywordMarkerFilter] -> SpanishLightStemFilter.
"""

from __future__ import annotations

from lucene_kmp_spark.analysis.standard import (
    DEFAULT_MAX_TOKEN_LENGTH,
    _lower_simple,
    standard_tokenize,
)

# spanish_stop.txt (snowball) as embedded in SpanishAnalyzer.DEFAULT_STOPWORD_DATA
SPANISH_STOP_WORDS = frozenset((
    "de", "la", "que", "el", "en", "y", "a", "los",
    "del", "se", "las", "por", "un", "para", "con", "no",
    "una", "su", "al", "lo", "como", "más", "pero", "sus",
    "le", "ya", "o", "este", "sí", "porque", "esta", "entre",
    "cuando", "muy", "sin", "sobre", "también", "me", "hasta", "hay",
    "donde", "quien", "desde", "todo", "nos", "durante", "todos", "uno",
    "les", "ni", "contra", "otros", "ese", "eso", "ante", "ellos",
    "e", "esto", "mí", "antes", "algunos", "qué", "unos", "yo",
    "otro", "otras", "otra", "él", "tanto", "esa", "estos", "mucho",
    "quienes", "nada", "muchos", "cual", "poco", "ella", "estar", "estas",
    "algunas", "algo", "nosotros", "mi", "mis", "tú", "te", "ti",
    "tu", "tus", "ellas", "nosotras", "vosotros", "vosotras", "os", "mío",
    "mía", "míos", "mías", "tuyo", "tuya", "tuyos", "tuyas", "suyo",
    "suya", "suyos", "suyas", "nuestro", "nuestra", "nuestros", "nuestras", "vuestro",
    "vuestra", "vuestros", "vuestras", "esos", "esas", "estoy", "estás", "está",
    "estamos", "estáis", "están", "esté", "estés", "estemos", "estéis", "estén",
    "estaré", "estarás", "estará", "estaremos", "estaréis", "estarán", "estaría", "estarías",
    "estaríamos", "estaríais", "estarían", "estaba", "estabas", "estábamos", "estabais", "estaban",
    "estuve", "estuviste", "estuvo", "estuvimos", "estuvisteis", "estuvieron", "estuviera", "estuvieras",
    "estuviéramos", "estuvierais", "estuvieran", "estuviese", "estuvieses", "estuviésemos", "estuvieseis", "estuviesen",
    "estando", "estado", "estada", "estados", "estadas", "estad", "he", "has",
    "ha", "hemos", "habéis", "han", "haya", "hayas", "hayamos", "hayáis",
    "hayan", "habré", "habrás", "habrá", "habremos", "habréis", "habrán", "habría",
    "habrías", "habríamos", "habríais", "habrían", "había", "habías", "habíamos", "habíais",
    "habían", "hube", "hubiste", "hubo", "hubimos", "hubisteis", "hubieron", "hubiera",
    "hubieras", "hubiéramos", "hubierais", "hubieran", "hubiese", "hubieses", "hubiésemos", "hubieseis",
    "hubiesen", "habiendo", "habido", "habida", "habidos", "habidas", "soy", "eres",
    "es", "somos", "sois", "son", "sea", "seas", "seamos", "seáis",
    "sean", "seré", "serás", "será", "seremos", "seréis", "serán", "sería",
    "serías", "seríamos", "seríais", "serían", "era", "eras", "éramos", "erais",
    "eran", "fui", "fuiste", "fue", "fuimos", "fuisteis", "fueron", "fuera",
    "fueras", "fuéramos", "fuerais", "fueran", "fuese", "fueses", "fuésemos", "fueseis",
    "fuesen", "siendo", "sido", "tengo", "tienes", "tiene", "tenemos", "tenéis",
    "tienen", "tenga", "tengas", "tengamos", "tengáis", "tengan", "tendré", "tendrás",
    "tendrá", "tendremos", "tendréis", "tendrán", "tendría", "tendrías", "tendríamos", "tendríais",
    "tendrían", "tenía", "tenías", "teníamos", "teníais", "tenían", "tuve", "tuviste",
    "tuvo", "tuvimos", "tuvisteis", "tuvieron", "tuviera", "tuvieras", "tuviéramos", "tuvierais",
    "tuvieran", "tuviese", "tuvieses", "tuviésemos", "tuvieseis", "tuviesen", "teniendo", "tenido",
    "tenida", "tenidos", "tenidas", "tened",
))

_ES_FOLD = str.maketrans("àáâäòóôöèéêëùúûüìíîï", "aaaaooooeeeeuuuuiiii")


def spanish_light_stem(term: str) -> str:
    """SpanishLightStemmer.stem (SpanishLightStemmer.kt:10-37)."""
    if len(term) < 5:
        return term
    s = list(term.translate(_ES_FOLD))
    last = s[-1]
    if last in ("o", "a", "e"):
        return "".join(s[:-1])
    if last == "s":
        if s[-2] == "e" and s[-3] == "s" and s[-4] == "e":
            return "".join(s[:-2])
        if s[-2] == "e" and s[-3] == "c":
            s[-3] = "z"
            return "".join(s[:-2])
        if s[-2] in ("o", "a", "e"):
            return "".join(s[:-2])
    return "".join(s)


def spanish_analyzer(
    stop_words=SPANISH_STOP_WORDS,
    stem_exclusions=(),
    max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH,
):
    """SpanishAnalyzer.createComponents (SpanishAnalyzer.kt:34-42)."""
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
                term = spanish_light_stem(term)
            terms.append(term)
            positions.append(t.position)
        return terms, positions, len(terms)

    return run
