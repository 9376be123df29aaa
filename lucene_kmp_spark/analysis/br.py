"""Brazilian Portuguese analysis chain (``analysis/common/.../analysis/br/``).

* ``brazilian_stem`` — ``br/BrazilianStemmer.kt``: the Orengo-style
  Brazilian stemmer: accent/cedilla fold, R1/R2/RV regions (bounded to
  exclude the final char, per the reference), standard-suffix step (R1/R2
  checks, one RV+preceded rule), verb-suffix step in RV, then the residual
  i / os-a-i-o / e-gu-ci steps. The reference's "logias" quirk (rule
  matches and reports success without modifying the term) is preserved.
  Terms shorter than 3 or 30+ chars are not stemmed; non-letter terms pass
  through unchanged (BrazilianStemFilter keeps the original on null).
* ``brazilian_analyzer`` — ``br/BrazilianAnalyzer.kt:47-55`` chain:
  StandardTokenizer -> LowerCaseFilter -> StopFilter(brazilian) ->
  [SetKeywordMarkerFilter] -> BrazilianStemFilter.
"""

from __future__ import annotations

from lucene_kmp_spark.analysis.standard import (
    DEFAULT_MAX_TOKEN_LENGTH,
    _lower_simple,
    standard_tokenize,
)

BRAZILIAN_STOP_WORDS = frozenset((
    "a", "ainda", "alem", "ambas", "ambos", "antes", "ao", "aonde", "aos",
    "apos", "aquele", "aqueles", "as", "assim", "com", "como", "contra",
    "contudo", "cuja", "cujas", "cujo", "cujos", "da", "das", "de", "dela",
    "dele", "deles", "demais", "depois", "desde", "desta", "deste",
    "dispoe", "dispoem", "diversa", "diversas", "diversos", "do", "dos",
    "durante", "e", "ela", "elas", "ele", "eles", "em", "entao", "entre",
    "essa", "essas", "esse", "esses", "esta", "estas", "este", "estes",
    "ha", "isso", "isto", "logo", "mais", "mas", "mediante", "menos",
    "mesma", "mesmas", "mesmo", "mesmos", "na", "no", "nao", "nas", "nem",
    "nesse", "neste", "nos", "o", "os", "ou", "outra", "outras", "outro",
    "outros", "pelas", "pelas", "pelo", "pelos", "perante", "pois", "por",
    "porque", "portanto", "proprio", "propios", "quais", "qual",
    "qualquer", "quando", "quanto", "que", "quem", "quer", "se", "seja",
    "sem", "sendo", "seu", "seus", "sob", "sobre", "sua", "suas", "tal",
    "tambem", "teu", "teus", "toda", "todas", "todo", "todos", "tua",
    "tuas", "tudo", "um", "uma", "umas", "uns",
))


_BR_STEP1 = (
    (0, "uciones", "R2", "", "u"), (6, "imentos", "R2", "", ""),
    (6, "amentos", "R2", "", ""), (6, "adores", "R2", "", ""),
    (6, "adoras", "R2", "", ""), (6, "logias", "R2", "", "log"),
    (6, "encias", "R2", "", "ente"), (6, "amente", "R1", "", ""),
    (6, "idades", "R2", "", ""), (5, "acoes", "R2", "", ""),
    (5, "imento", "R2", "", ""), (5, "amento", "R2", "", ""),
    (5, "adora", "R2", "", ""), (5, "ismos", "R2", "", ""),
    (5, "istas", "R2", "", ""), (5, "logia", "R2", "", "log"),
    (5, "ucion", "R2", "", "u"), (5, "encia", "R2", "", "ente"),
    (5, "mente", "R2", "", ""), (5, "idade", "R2", "", ""),
    (4, "acao", "R2", "", ""), (4, "ezas", "R2", "", ""),
    (4, "icos", "R2", "", ""), (4, "icas", "R2", "", ""),
    (4, "ismo", "R2", "", ""), (4, "avel", "R2", "", ""),
    (4, "ivel", "R2", "", ""), (4, "ista", "R2", "", ""),
    (4, "osos", "R2", "", ""), (4, "osas", "R2", "", ""),
    (4, "ador", "R2", "", ""), (4, "ivas", "R2", "", ""),
    (4, "ivos", "R2", "", ""), (4, "iras", "RV", "e", "ir"),
    (3, "eza", "R2", "", ""), (3, "ico", "R2", "", ""),
    (3, "ica", "R2", "", ""), (3, "oso", "R2", "", ""),
    (3, "osa", "R2", "", ""), (3, "iva", "R2", "", ""),
    (3, "ivo", "R2", "", ""), (3, "ira", "RV", "e", "ir"),
)

_BR_STEP2 = (
    (7, "issemos"), (7, "essemos"), (7, "assemos"), (7, "ariamos"),
    (7, "eriamos"), (7, "iriamos"), (6, "iremos"), (6, "eremos"),
    (6, "aremos"), (6, "avamos"), (6, "iramos"), (6, "eramos"),
    (6, "aramos"), (6, "asseis"), (6, "esseis"), (6, "isseis"),
    (6, "arieis"), (6, "erieis"), (6, "irieis"), (5, "irmos"),
    (5, "iamos"), (5, "armos"), (5, "ermos"), (5, "areis"), (5, "ereis"),
    (5, "ireis"), (5, "asses"), (5, "esses"), (5, "isses"), (5, "astes"),
    (5, "assem"), (5, "essem"), (5, "issem"), (5, "ardes"), (5, "erdes"),
    (5, "irdes"), (5, "ariam"), (5, "eriam"), (5, "iriam"), (5, "arias"),
    (5, "erias"), (5, "irias"), (5, "estes"), (5, "istes"), (5, "areis"),
    (5, "aveis"), (4, "aria"), (4, "eria"), (4, "iria"), (4, "asse"),
    (4, "esse"), (4, "isse"), (4, "aste"), (4, "este"), (4, "iste"),
    (4, "arei"), (4, "erei"), (4, "irei"), (4, "aram"), (4, "eram"),
    (4, "iram"), (4, "avam"), (4, "arem"), (4, "erem"), (4, "irem"),
    (4, "ando"), (4, "endo"), (4, "indo"), (4, "arao"), (4, "erao"),
    (4, "irao"), (4, "adas"), (4, "idas"), (4, "aras"), (4, "eras"),
    (4, "iras"), (4, "avas"), (4, "ares"), (4, "eres"), (4, "ires"),
    (4, "ados"), (4, "idos"), (4, "amos"), (4, "emos"), (4, "imos"),
    (4, "iras"), (4, "ieis"), (3, "ada"), (3, "ida"), (3, "ara"),
    (3, "era"), (3, "ira"), (3, "iam"), (3, "ado"), (3, "ido"), (3, "ias"),
    (3, "ais"), (3, "eis"), (3, "ira"), (3, "ear"), (2, "ia"), (2, "ei"),
    (2, "am"), (2, "em"), (2, "ar"), (2, "er"), (2, "ir"), (2, "as"),
    (2, "es"), (2, "is"), (2, "eu"), (2, "iu"), (2, "iu"), (2, "ou"),
)

_BR_FOLD = str.maketrans({
    "\u00e1": "a", "\u00e2": "a", "\u00e3": "a",
    "\u00e9": "e", "\u00ea": "e", "\u00ed": "i",
    "\u00f3": "o", "\u00f4": "o", "\u00f5": "o",
    "\u00fa": "u", "\u00fc": "u", "\u00e7": "c", "\u00f1": "n",
})
_BR_VOWELS = frozenset("aeiou")
_BR_PUNCT = set('"\'-,;.?!')


def _br_r1(v: str | None) -> str | None:
    """getR1: region after the first non-vowel following a vowel, scanning
    only up to the second-to-last char (BrazilianStemmer.kt:93-115)."""
    if v is None:
        return None
    i = len(v) - 1
    for jj in range(i):
        if v[jj] in _BR_VOWELS:
            j = jj
            while j < i and v[j] in _BR_VOWELS:
                j += 1
            return v[j + 1:] if j < i else None
    return None


def _br_rv(v: str) -> str | None:
    """getRV (BrazilianStemmer.kt:117-160)."""
    i = len(v) - 1
    if i > 0 and v[1] not in _BR_VOWELS:
        for jj in range(2, i):
            if v[jj] in _BR_VOWELS:
                return v[jj + 1:]
    if i > 1 and v[0] in _BR_VOWELS and v[1] in _BR_VOWELS:
        for jj in range(2, i):
            if v[jj] not in _BR_VOWELS:
                return v[jj + 1:]
    if i > 2:
        return v[3:]
    return None


def _sfx(value: str | None, suffix: str) -> bool:
    return value is not None and value.endswith(suffix)


def brazilian_stem(term: str) -> str | None:
    """BrazilianStemmer.stem (BrazilianStemmer.kt:19-51): returns the
    discriminator, the folded term when unstemmable, or None when not
    indexable (caller keeps the original)."""
    ct = term.lower().translate(_BR_FOLD)
    if len(ct) >= 2 and ct[0] in _BR_PUNCT:
        ct = ct[1:]
    if len(ct) >= 2 and ct[-1] in _BR_PUNCT:
        ct = ct[:-1]
    if not (2 < len(ct) < 30):
        return None
    if not ct.isalpha():
        return ct

    r1 = _br_r1(ct)
    r2 = _br_r1(r1)
    rv = _br_rv(ct)

    # step 1: standard suffixes
    altered = False
    for min_len, sfx, region, preceded, repl in _BR_STEP1:
        if min_len and len(ct) < min_len:
            continue
        reg = {"R1": r1, "R2": r2, "RV": rv}[region]
        if _sfx(ct, sfx) and _sfx(reg, sfx):
            if preceded and not ct[: -len(sfx)].endswith(preceded):
                continue
            if sfx == "logias":  # reference quirk: result discarded
                altered = True
                break
            ct = ct[: -len(sfx)] + repl
            altered = True
            break

    # step 2: verb suffixes in RV
    if not altered and rv is not None:
        for min_len, sfx in _BR_STEP2:
            if len(rv) >= min_len and rv.endswith(sfx):
                ct = ct[: -len(sfx)]
                altered = True
                break

    if altered:
        # step 3: trailing i preceded by c, in RV
        if rv is not None and _sfx(rv, "i") and rv[:-1].endswith("c"):
            ct = ct[:-1]
    else:
        # step 4: residual suffix in RV
        if rv is not None:
            for sfx in ("os", "a", "i", "o"):
                if rv.endswith(sfx):
                    ct = ct[: -len(sfx)]
                    break

    # step 5: trailing e in RV (gu/ci absorption)
    if rv is not None and _sfx(rv, "e"):
        if rv[:-1].endswith("gu"):
            ct = ct[:-1]
            if ct.endswith("u"):
                ct = ct[:-1]
        elif rv[:-1].endswith("ci"):
            ct = ct[:-1]
            if ct.endswith("i"):
                ct = ct[:-1]
        else:
            ct = ct[:-1]

    return ct


def brazilian_analyzer(stop_words=None, stem_exclusions=(),
                       max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH):
    """BrazilianAnalyzer.createComponents (BrazilianAnalyzer.kt:47-55)."""
    stop = BRAZILIAN_STOP_WORDS if stop_words is None else frozenset(stop_words)
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
                s = brazilian_stem(term)
                if s is not None and s != term:
                    term = s
            terms.append(term)
            positions.append(t.position)
        return terms, positions, len(terms)

    return run
