"""Language analyzer chains (analysis/common fr/es/de/cjk packages) vs the
reference's own test goldens, plus per-row multilingual routing."""

import pytest

from lucene_kmp_spark.analysis.cjk import cjk_analyzer, cjk_width_fold
from lucene_kmp_spark.analysis.de import german_analyzer, german_light_stem, german_normalize
from lucene_kmp_spark.analysis.es import spanish_analyzer, spanish_light_stem
from lucene_kmp_spark.analysis.fr import elision_strip, french_analyzer, french_light_stem
from lucene_kmp_spark.analysis.registry import analyzer_for, multilingual_analyzer

# TestFrenchLightStemFilter.kt testVocabulary goldens (complete list)
FR_GOLDENS = [
    ("chevaux", "cheval"), ("cheval", "cheval"), ("hiboux", "hibou"),
    ("hibou", "hibou"), ("chantés", "chant"), ("chanter", "chant"),
    ("chante", "chant"), ("chant", "chant"), ("baronnes", "baron"),
    ("barons", "baron"), ("baron", "baron"), ("peaux", "peau"),
    ("peau", "peau"), ("anneaux", "aneau"), ("anneau", "aneau"),
    ("neveux", "neveu"), ("neveu", "neveu"), ("affreux", "afreu"),
    ("affreuse", "afreu"), ("investissement", "investi"),
    ("investir", "investi"), ("assourdissant", "asourdi"),
    ("assourdir", "asourdi"), ("pratiquement", "pratiqu"),
    ("pratique", "pratiqu"), ("administrativement", "administratif"),
    ("administratif", "administratif"), ("justificatrice", "justifi"),
    ("justificateur", "justifi"), ("justifier", "justifi"),
    ("educatrice", "eduqu"), ("eduquer", "eduqu"),
    ("communicateur", "comuniqu"), ("communiquer", "comuniqu"),
    ("accompagnatrice", "acompagn"), ("accompagnateur", "acompagn"),
    ("administrateur", "administr"), ("administrer", "administr"),
    ("productrice", "product"), ("producteur", "product"),
    ("acheteuse", "achet"), ("acheteur", "achet"), ("planteur", "plant"),
    ("plante", "plant"), ("poreuse", "poreu"), ("poreux", "poreu"),
    ("plieuse", "plieu"), ("bijoutière", "bijouti"), ("bijoutier", "bijouti"),
    ("caissière", "caisi"), ("caissier", "caisi"), ("abrasive", "abrasif"),
    ("abrasif", "abrasif"), ("folle", "fou"), ("fou", "fou"),
    ("personnelle", "person"), ("personne", "person"),
    ("complète", "complet"), ("complet", "complet"),
    ("aromatique", "aromat"), ("faiblesse", "faibl"), ("faible", "faibl"),
    ("patinage", "patin"), ("patin", "patin"), ("sonorisation", "sono"),
    ("ritualisation", "rituel"), ("rituel", "rituel"),
    ("nomination", "nomin"), ("disposition", "dispos"),
    ("dispose", "dispos"), ("1234555", "1234555"),
    ("12333345", "12333345"), ("1234", "1234"), ("abcdeff", "abcdef"),
    ("abcccddeef", "abcdef"), ("créées", "cre"), ("22hh00", "22h00"),
]


@pytest.mark.parametrize("word,stem", FR_GOLDENS)
def test_french_light_stem_goldens(word, stem):
    assert french_light_stem(word) == stem


def test_elision_filter():
    # ElisionFilter.kt: strip "<article>'" (U+0027 or U+2019, case-insensitive)
    assert elision_strip("l'avion") == "avion"
    assert elision_strip("L’avion") == "avion"
    assert elision_strip("qu'il") == "il"
    assert elision_strip("xyz'abc") == "xyz'abc"  # not an article
    assert elision_strip("avion") == "avion"


def test_french_analyzer_chain():
    a = french_analyzer()
    terms, positions, length = a("l'avion des chevaux chantés")
    assert terms == ["avion", "cheval", "chant"]
    assert positions == [0, 2, 3]  # 'des' stopped -> position hole
    assert length == 3


# SpanishLightStemmer.kt (CLEF-2001 Savoy): suffix classes the algorithm defines
ES_GOLDENS = [
    ("casas", "cas"), ("caminos", "camin"), ("grandes", "grand"),
    ("meses", "mes"), ("peces", "pez"), ("caminando", "caminand"),
    ("niños", "niñ"), ("serán", "seran"), ("cuatro", "cuatr"),
    ("cosas", "cos"), ("abc", "abc"), ("libro", "libr"),
]


@pytest.mark.parametrize("word,stem", ES_GOLDENS)
def test_spanish_light_stem(word, stem):
    assert spanish_light_stem(word) == stem


def test_spanish_under_5_untouched():
    assert spanish_light_stem("dos") == "dos"
    assert spanish_light_stem("tres") == "tres"


# TestGermanNormalizationFilter.kt goldens
DE_NORM_GOLDENS = [
    ("Schaltflächen", "Schaltflachen"),
    ("Schaltflaechen", "Schaltflachen"),
    ("dauer", "dauer"),
    ("weißbier", "weissbier"),
    ("", ""),
]


@pytest.mark.parametrize("word,norm", DE_NORM_GOLDENS)
def test_german_normalization(word, norm):
    assert german_normalize(word) == norm


def test_german_light_stem():
    # GermanLightStemmer.kt step1+step2 suffix classes
    assert german_light_stem(german_normalize("häuser")) == "haus"
    assert german_light_stem("bildern") == "bild"
    assert german_light_stem("bilder") == "bild"
    assert german_light_stem("bild") == "bild"
    assert german_light_stem("kleinen") == "klein"
    assert german_light_stem(german_normalize("schönste")) == "schon"


def test_german_analyzer_chain():
    a = german_analyzer()
    terms, _pos, _l = a("die schönen Häuser")
    assert terms == ["schon", "haus"]  # 'die' stopped


# TestCJKAnalyzer.kt goldens (DOUBLE/SINGLE emission)
CJK_GOLDENS = [
    ("一二三四五六七八九十",
     ["一二", "二三", "三四", "四五", "五六", "六七", "七八", "八九", "九十"]),
    ("一 二三四 五六七八九 十",
     ["一", "二三", "三四", "五六", "六七", "七八", "八九", "十"]),
    ("abc defgh ijklmn opqrstu vwxy z",
     ["abc", "defgh", "ijklmn", "opqrstu", "vwxy", "z"]),
    ("あい", ["あい"]),
    ("あいtest", ["あい", "test"]),
    ("testあい    ", ["test", "あい"]),
    ("あいうえおabcかきくけこ",
     ["あい", "いう", "うえ", "えお", "abc", "かき", "きく", "くけ", "けこ"]),
]


@pytest.mark.parametrize("text,expected", CJK_GOLDENS)
def test_cjk_analyzer_goldens(text, expected):
    assert cjk_analyzer()(text)[0] == expected


def test_cjk_width_fold():
    # CJKWidthFilter.kt: fullwidth ASCII + halfwidth kana (voice-mark combine)
    assert cjk_width_fold("Ｔｅｓｔ　１２３") == "Test　123"
    assert cjk_width_fold("ｶﾀｶﾅ") == "カタカナ"
    assert cjk_width_fold("ｳﾞｨｯﾂ") == "ヴィッツ"  # U+FF73 + voice mark -> U+30F4
    assert cjk_width_fold("ﾊﾟﾅｿﾆｯｸ") == "パナソニック"  # half-voiced combine


def test_cjk_stop_after_bigrams():
    terms, positions, _ = cjk_analyzer()("中文 the 字")
    assert terms == ["中文", "字"]
    assert positions == [0, 2]  # hole where 'the' was


def test_registry_and_multilingual_routing():
    assert analyzer_for("fr")("chevaux")[0] == ["cheval"]
    router = multilingual_analyzer()
    assert router("chevaux", "fr")[0] == ["cheval"]
    assert router("casas", "es")[0] == ["cas"]
    assert router("Häuser", "de")[0] == ["haus"]
    assert router("一二三", "zh")[0] == ["一二", "二三"]
    assert router("customers", "en")[0] == ["custom"]
    assert router("customers", None)[0] == ["customers"]  # standard fallback


def test_multilingual_build_and_search(spark):
    """End-to-end: one index over a mixed-language table, analyzer routed by
    the lang column; per-language stems are queryable."""
    from lucene_kmp_spark.index import assign_doc_ids, build_index
    from lucene_kmp_spark.search.executor import IndexSearcher
    from lucene_kmp_spark.search.query import TermQuery

    rows = [
        ("c0", 0, "the customers arrived", "en"),
        ("c1", 0, "les chevaux chantés", "fr"),
        ("c2", 0, "las casas grandes", "es"),
        ("c3", 0, "die schönen Häuser", "de"),
        ("c4", 0, "一二三四", "zh"),
        ("c5", 0, "plain standard text", "xx"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string, lang string")
    docs = assign_doc_ids(df).persist()
    docs.count()
    idx = build_index(docs, analyzer=multilingual_analyzer(), analyzer_col="lang")
    s = IndexSearcher(idx)
    by_lang = {r["lang"]: r["doc_id"] for r in docs.select("doc_id", "lang").collect()}
    for term, lang in [
        ("custom", "en"), ("cheval", "fr"), ("cas", "es"),
        ("haus", "de"), ("二三", "zh"), ("standard", "xx"),
    ]:
        got = [r["doc_id"] for r in s.execute(TermQuery(term)).collect()]
        assert got == [by_lang[lang]], (term, got)


def test_multilang_oracle_maps_match_stemmers():
    """The inline CASE maps in __spark_entry__._ML_PRELUDE must equal the
    library stemmers/stop sets over the ACTUAL parquet vocabulary — vocab
    drift fails here, not as a silent oracle mismatch."""
    import duckdb

    from lucene_kmp_spark.analysis.cjk import CJK_STOP_WORDS
    from lucene_kmp_spark.analysis.de import GERMAN_STOP_WORDS
    from lucene_kmp_spark.analysis.en import ENGLISH_STOP_WORDS, porter_stem
    from lucene_kmp_spark.analysis.es import SPANISH_STOP_WORDS
    from lucene_kmp_spark.analysis.fr import FRENCH_STOP_WORDS

    vocab = [r[0] for r in duckdb.connect().execute(
        "SELECT DISTINCT unnest(string_split(text, ' ')) "
        "FROM '/root/testdata/sf0.01/documents.parquet'").fetchall()]
    expected = {
        "en": ({w: porter_stem(w) for w in vocab if porter_stem(w) != w},
               {w for w in vocab if w in ENGLISH_STOP_WORDS}),
        "fr": ({w: french_light_stem(w) for w in vocab if french_light_stem(w) != w},
               {w for w in vocab if w in FRENCH_STOP_WORDS}),
        "es": ({w: spanish_light_stem(w) for w in vocab if spanish_light_stem(w) != w},
               {w for w in vocab if w in SPANISH_STOP_WORDS}),
        "de": ({w: german_light_stem(german_normalize(w)) for w in vocab
                if german_light_stem(german_normalize(w)) != w},
               {w for w in vocab if w in GERMAN_STOP_WORDS}),
        "zh": ({}, {w for w in vocab if w in CJK_STOP_WORDS}),
    }
    assert expected["en"][0] == {"customer": "custom", "key": "kei", "merge": "merg",
                                 "query": "queri", "table": "tabl", "value": "valu"}
    assert expected["en"][1] == {"a", "the"}
    assert expected["fr"][0] == {"customer": "custom", "filter": "filt", "merge": "merg",
                                 "order": "ord", "small": "smal", "table": "tabl",
                                 "value": "valu", "vector": "vecto"}
    assert expected["fr"][1] == set()
    assert expected["es"][0] == {"merge": "merg", "table": "tabl", "value": "valu"}
    assert expected["es"][1] == {"a"}
    assert expected["de"][0] == {"customer": "custom", "filter": "filt", "line": "lin",
                                 "merge": "merg", "order": "ord", "table": "tabl",
                                 "value": "valu"}
    assert expected["de"][1] == set()
    assert expected["zh"][1] == {"a", "the"}


# ---- Portuguese / Italian (pt/PortugueseLightStemmer.kt, it/ItalianLightStemmer.kt) ----

from lucene_kmp_spark.analysis.it import italian_analyzer, italian_light_stem  # noqa: E402
from lucene_kmp_spark.analysis.pt import portuguese_analyzer, portuguese_light_stem  # noqa: E402

# TestPortugueseLightStemFilter.kt goldens (complete inline list)
PT_GOLDENS = [
    ("doutores", "doutor"), ("doutor", "doutor"), ("homens", "homem"),
    ("homem", "homem"), ("papéis", "papel"), ("papel", "papel"),
    ("normais", "normal"), ("normal", "normal"), ("lencóis", "lencol"),
    ("lencol", "lencol"), ("barris", "barril"), ("barril", "barril"),
    ("botões", "bota"), ("botão", "bota"),
]


@pytest.mark.parametrize("word,stem", PT_GOLDENS)
def test_portuguese_light_stem_goldens(word, stem):
    assert portuguese_light_stem(word) == stem


def test_portuguese_feminine_and_mente():
    # normFeminine + -mente adverb strip classes of the algorithm
    assert portuguese_light_stem("rapidamente") == "rapid"
    assert portuguese_light_stem("famosa") == "famos"  # osa -> oso -> strip o
    assert portuguese_light_stem("abc") == "abc"  # < 4 untouched


ITALIAN_GOLDENS = [
    # final-vowel classes of ItalianLightStemmer.kt:22-28
    ("ragazzi", "ragazz"), ("ragazze", "ragazz"), ("ragazzo", "ragazz"),
    ("ragazza", "ragazz"), ("banchi", "banc"), ("amiche", "amic"),
    ("vecchie", "vecch"), ("abcde", "abcde"),  # < 6 untouched
]


@pytest.mark.parametrize("word,stem", ITALIAN_GOLDENS)
def test_italian_light_stem(word, stem):
    assert italian_light_stem(word) == stem


def test_italian_elision_and_chain():
    a = italian_analyzer()
    terms, _p, _l = a("dell'orologio un'amica")
    # dell' stripped; "orologio" -> io ends, prev 'g' -> strip 1; un' stripped
    assert terms[0] == italian_light_stem("orologio")
    assert terms[1] == italian_light_stem("amica")


def test_pt_it_in_registry():
    router = multilingual_analyzer()
    assert router("doutores", "pt")[0] == ["doutor"]
    assert router("ragazzi", "it")[0] == ["ragazz"]


# ---- Arabic (TestArabicAnalyzer.kt / TestArabicStemFilter.kt goldens) ----
@pytest.mark.parametrize("text,expected", [
    ("كبير", ["كبير"]),
    ("كبيرة", ["كبير"]),            # feminine marker
    ("مشروبات", ["مشروب"]),          # plural -at
    ("أمريكيين", ["امريك"]),         # plural -in
    ("امريكي", ["امريك"]),           # singular with bare alif
    ("الكتاب", ["كتاب"]),            # definite article
    ("ما ملكت أيمانكم", ["ملكت", "ايمانكم"]),      # stopwords dropped
    ("الذين ملكت أيمانكم", ["ملكت", "ايمانكم"]),
    ("English text.", ["english", "text"]),
    ("١٢٣٤", ["1234"]),              # DecimalDigitFilter
])
def test_arabic_analyzer_goldens(text, expected):
    from lucene_kmp_spark.analysis.ar import arabic_analyzer

    assert arabic_analyzer()(text)[0] == expected


def test_arabic_stem_exclusion():
    from lucene_kmp_spark.analysis.ar import arabic_analyzer

    a = arabic_analyzer(stop_words=(), stem_exclusions=("ساهدهات",))
    assert a("كبيرة the quick ساهدهات")[0] == ["كبير", "the", "quick", "ساهدهات"]
    b = arabic_analyzer(stop_words=())
    assert b("كبيرة the quick ساهدهات")[0] == ["كبير", "the", "quick", "ساهد"]


# ---- Hindi (TestHindi{Analyzer,Normalizer,Stemmer}.kt goldens) ----
@pytest.mark.parametrize("text,expected", [
    ("हिन्दी", ["हिंद"]),   # dead-n normalization + stem
    ("हिंदी", ["हिंद"]),
    ("१२३४", ["1234"]),
])
def test_hindi_analyzer_goldens(text, expected):
    from lucene_kmp_spark.analysis.hi import hindi_analyzer

    assert hindi_analyzer()(text)[0] == expected


@pytest.mark.parametrize("word,norm", [
    ("अँगरेज़ी", "अंगरेजि"), ("अँग्रेज़ी", "अंगरेजि"), ("अंग्रेजी", "अंगरेजि"),
    ("क़िताब", "किताब"), ("फ़र्ज़", "फरज"), ("ऱऴख़ग़ड़ढ़य़", "रळखगडढय"),
    ("शार्‍मा", "शारमा"), ("शार्‌मा", "शारमा"),
    ("ॅॆॉॊऍऎऑऒॲ", "ेेोोएएओओअ"), ("आईऊॠॡऐऔीूॄॣैौ", "अइउऋऌएओिुृॢेो"),
])
def test_hindi_normalizer_goldens(word, norm):
    from lucene_kmp_spark.analysis.hi import hindi_normalize

    assert hindi_normalize(word) == norm


@pytest.mark.parametrize("word,stem", [
    ("लडका", "लडक"), ("लडके", "लडक"), ("लडकों", "लडक"),
    ("गुरु", "गुर"), ("गुरुओं", "गुर"), ("दोस्त", "दोस्त"), ("दोस्तों", "दोस्त"),
    ("लडकियों", "लडक"), ("किताबें", "किताब"), ("किताबों", "किताब"),
    ("खाना", "खा"), ("खाता", "खा"), ("खा", "खा"),
    ("कठिनाइयां", "कठिन"), ("कठिन", "कठिन"),
])
def test_hindi_stemmer_goldens(word, stem):
    from lucene_kmp_spark.analysis.hi import hindi_stem

    assert hindi_stem(word) == stem


def test_hindi_stem_exclusion():
    from lucene_kmp_spark.analysis.hi import hindi_analyzer

    a = hindi_analyzer(stem_exclusions=("हिंदी",))
    assert a("हिंदी")[0] == ["हिंदी"]


def test_indic_normalize_compositions():
    from lucene_kmp_spark.analysis.indic import indic_normalize

    # devanagari: A + AA-matra -> AA; A + candra-E -> candra A;
    # three-char A + AA + candra-E -> candra O
    assert indic_normalize("अा") == "आ"
    assert indic_normalize("अॅ") == "ॲ"
    assert indic_normalize("अाॅ") == "ऑ"
    assert indic_normalize("abc") == "abc"


def test_registry_routes_ar_hi():
    from lucene_kmp_spark.analysis.registry import analyzer_for

    assert analyzer_for("ar")("الكتاب")[0] == ["كتاب"]
    assert analyzer_for("hi")("हिन्दी")[0] == ["हिंद"]


# ---- Persian (TestPersianAnalyzer.kt goldens, verb conjugation sweep) ----
@pytest.mark.parametrize("text,expected", [
    ("\u0645\u06cc\u200c\u062e\u0648\u0631\u062f", ["\u062e\u0648\u0631\u062f"]),
    ("\u062e\u0648\u0631\u062f", ["\u062e\u0648\u0631\u062f"]),
    ("\u0645\u06cc\u200c\u062e\u0648\u0631\u062f", ["\u062e\u0648\u0631\u062f"]),
    ("\u062e\u0648\u0627\u0647\u062f \u062e\u0648\u0631\u062f", ["\u062e\u0648\u0631\u062f"]),
    ("\u062f\u0627\u0631\u062f \u0645\u06cc\u200c\u062e\u0648\u0631\u062f", ["\u062e\u0648\u0631\u062f"]),
    ("\u062f\u0627\u0634\u062a \u0645\u06cc\u200c\u062e\u0648\u0631\u062f", ["\u062e\u0648\u0631\u062f"]),
    ("\u062e\u0648\u0631\u062f\u0647\u200c\u0627\u0633\u062a", ["\u062e\u0648\u0631\u062f\u0647"]),
    ("\u0645\u06cc\u200c\u062e\u0648\u0631\u062f\u0647\u200c\u0627\u0633\u062a", ["\u062e\u0648\u0631\u062f\u0647"]),
    ("\u062e\u0648\u0631\u062f\u0647 \u0628\u0648\u062f", ["\u062e\u0648\u0631\u062f\u0647"]),
    ("\u0645\u06cc\u200c\u062e\u0648\u0631\u062f\u0647 \u0628\u0648\u062f", ["\u062e\u0648\u0631\u062f\u0647"]),
    ("\u062e\u0648\u0631\u062f\u0647 \u0628\u0627\u0634\u062f", ["\u062e\u0648\u0631\u062f\u0647"]),
    ("\u0645\u06cc\u200c\u062e\u0648\u0631\u062f\u0647 \u0628\u0627\u0634\u062f", ["\u062e\u0648\u0631\u062f\u0647"]),
    ("\u062e\u0648\u0631\u062f\u0647 \u0628\u0648\u062f\u0647 \u0628\u0627\u0634\u062f", ["\u062e\u0648\u0631\u062f\u0647"]),
    ("\u0645\u06cc\u200c\u062e\u0648\u0631\u062f\u0647 \u0628\u0648\u062f\u0647 \u0628\u0627\u0634\u062f", ["\u062e\u0648\u0631\u062f\u0647"]),
    ("\u062e\u0648\u0631\u062f\u0647 \u0645\u06cc\u200c\u0634\u0648\u062f", ["\u062e\u0648\u0631\u062f\u0647"]),
    ("\u062e\u0648\u0631\u062f\u0647 \u0634\u062f", ["\u062e\u0648\u0631\u062f\u0647"]),
    ("\u062e\u0648\u0631\u062f\u0647 \u0645\u06cc\u200c\u0634\u062f", ["\u062e\u0648\u0631\u062f\u0647"]),
    ("\u062e\u0648\u0631\u062f\u0647 \u0634\u062f\u0647\u200c\u0627\u0633\u062a", ["\u062e\u0648\u0631\u062f\u0647"]),
    ("\u062e\u0648\u0631\u062f\u0647 \u0645\u06cc\u200c\u0634\u062f\u0647\u200c\u0627\u0633\u062a", ["\u062e\u0648\u0631\u062f\u0647"]),
    ("\u062e\u0648\u0631\u062f\u0647 \u0634\u062f\u0647 \u0628\u0648\u062f", ["\u062e\u0648\u0631\u062f\u0647"]),
    ("\u062e\u0648\u0631\u062f\u0647 \u0645\u06cc\u200c\u0634\u062f\u0647 \u0628\u0648\u062f", ["\u062e\u0648\u0631\u062f\u0647"]),
    ("\u062e\u0648\u0631\u062f\u0647 \u062e\u0648\u0627\u0647\u062f \u0634\u062f", ["\u062e\u0648\u0631\u062f\u0647"]),
    ("\u062f\u0627\u0631\u062f \u062e\u0648\u0631\u062f\u0647 \u0645\u06cc\u200c\u0634\u0648\u062f", ["\u062e\u0648\u0631\u062f\u0647"]),
    ("\u062f\u0627\u0634\u062a \u062e\u0648\u0631\u062f\u0647 \u0645\u06cc\u200c\u0634\u062f", ["\u062e\u0648\u0631\u062f\u0647"]),
    ("\u062e\u0648\u0631\u062f\u0647 \u0634\u0648\u062f", ["\u062e\u0648\u0631\u062f\u0647"]),
    ("\u062e\u0648\u0631\u062f\u0647 \u0634\u062f\u0647 \u0628\u0627\u0634\u062f", ["\u062e\u0648\u0631\u062f\u0647"]),
    ("\u062e\u0648\u0631\u062f\u0647 \u0645\u06cc\u200c\u0634\u062f\u0647 \u0628\u0627\u0634\u062f", ["\u062e\u0648\u0631\u062f\u0647"]),
    ("\u062e\u0648\u0631\u062f\u0647 \u0634\u062f\u0647 \u0628\u0648\u062f\u0647 \u0628\u0627\u0634\u062f", ["\u062e\u0648\u0631\u062f\u0647"]),
    ("\u062e\u0648\u0631\u062f\u0647 \u0645\u06cc\u200c\u0634\u062f\u0647 \u0628\u0648\u062f\u0647 \u0628\u0627\u0634\u062f", ["\u062e\u0648\u0631\u062f\u0647"]),
    ("\u0628\u062e\u0648\u0631\u062f", ["\u0628\u062e\u0648\u0631\u062f"]),
    ("\u0645\u064a \u062e\u0648\u0631\u062f", ["\u062e\u0648\u0631\u062f"]),
    ("\u062e\u0648\u0631\u062f", ["\u062e\u0648\u0631\u062f"]),
    ("\u0645\u064a \u062e\u0648\u0631\u062f", ["\u062e\u0648\u0631\u062f"]),
    ("\u062e\u0648\u0627\u0647\u062f \u062e\u0648\u0631\u062f", ["\u062e\u0648\u0631\u062f"]),
    ("\u062f\u0627\u0631\u062f \u0645\u064a \u062e\u0648\u0631\u062f", ["\u062e\u0648\u0631\u062f"]),
    ("\u062f\u0627\u0634\u062a \u0645\u064a \u062e\u0648\u0631\u062f", ["\u062e\u0648\u0631\u062f"]),
    ("\u062e\u0648\u0631\u062f\u0647 \u0627\u0633\u062a", ["\u062e\u0648\u0631\u062f\u0647"]),
    ("\u0645\u064a \u062e\u0648\u0631\u062f\u0647 \u0627\u0633\u062a", ["\u062e\u0648\u0631\u062f\u0647"]),
    ("\u062e\u0648\u0631\u062f\u0647 \u0628\u0648\u062f", ["\u062e\u0648\u0631\u062f\u0647"]),
    ("\u0645\u064a \u062e\u0648\u0631\u062f\u0647 \u0628\u0648\u062f", ["\u062e\u0648\u0631\u062f\u0647"]),
    ("\u062e\u0648\u0631\u062f\u0647 \u0628\u0627\u0634\u062f", ["\u062e\u0648\u0631\u062f\u0647"]),
    ("\u0645\u064a \u062e\u0648\u0631\u062f\u0647 \u0628\u0627\u0634\u062f", ["\u062e\u0648\u0631\u062f\u0647"]),
    ("\u062e\u0648\u0631\u062f\u0647 \u0628\u0648\u062f\u0647 \u0628\u0627\u0634\u062f", ["\u062e\u0648\u0631\u062f\u0647"]),
    ("\u0645\u064a \u062e\u0648\u0631\u062f\u0647 \u0628\u0648\u062f\u0647 \u0628\u0627\u0634\u062f", ["\u062e\u0648\u0631\u062f\u0647"]),
    ("\u062e\u0648\u0631\u062f\u0647 \u0645\u064a \u0634\u0648\u062f", ["\u062e\u0648\u0631\u062f\u0647"]),
    ("\u062e\u0648\u0631\u062f\u0647 \u0634\u062f", ["\u062e\u0648\u0631\u062f\u0647"]),
    ("\u062e\u0648\u0631\u062f\u0647 \u0645\u064a \u0634\u062f", ["\u062e\u0648\u0631\u062f\u0647"]),
    ("\u062e\u0648\u0631\u062f\u0647 \u0634\u062f\u0647 \u0627\u0633\u062a", ["\u062e\u0648\u0631\u062f\u0647"]),
    ("\u062e\u0648\u0631\u062f\u0647 \u0645\u064a \u0634\u062f\u0647 \u0627\u0633\u062a", ["\u062e\u0648\u0631\u062f\u0647"]),
    ("\u062e\u0648\u0631\u062f\u0647 \u0634\u062f\u0647 \u0628\u0648\u062f", ["\u062e\u0648\u0631\u062f\u0647"]),
    ("\u062e\u0648\u0631\u062f\u0647 \u0645\u064a \u0634\u062f\u0647 \u0628\u0648\u062f", ["\u062e\u0648\u0631\u062f\u0647"]),
    ("\u062e\u0648\u0631\u062f\u0647 \u062e\u0648\u0627\u0647\u062f \u0634\u062f", ["\u062e\u0648\u0631\u062f\u0647"]),
    ("\u062f\u0627\u0631\u062f \u062e\u0648\u0631\u062f\u0647 \u0645\u064a \u0634\u0648\u062f", ["\u062e\u0648\u0631\u062f\u0647"]),
    ("\u062f\u0627\u0634\u062a \u062e\u0648\u0631\u062f\u0647 \u0645\u064a \u0634\u062f", ["\u062e\u0648\u0631\u062f\u0647"]),
    ("\u062e\u0648\u0631\u062f\u0647 \u0634\u0648\u062f", ["\u062e\u0648\u0631\u062f\u0647"]),
    ("\u062e\u0648\u0631\u062f\u0647 \u0634\u062f\u0647 \u0628\u0627\u0634\u062f", ["\u062e\u0648\u0631\u062f\u0647"]),
    ("\u062e\u0648\u0631\u062f\u0647 \u0645\u064a \u0634\u062f\u0647 \u0628\u0627\u0634\u062f", ["\u062e\u0648\u0631\u062f\u0647"]),
    ("\u062e\u0648\u0631\u062f\u0647 \u0634\u062f\u0647 \u0628\u0648\u062f\u0647 \u0628\u0627\u0634\u062f", ["\u062e\u0648\u0631\u062f\u0647"]),
    ("\u062e\u0648\u0631\u062f\u0647 \u0645\u064a \u0634\u062f\u0647 \u0628\u0648\u062f\u0647 \u0628\u0627\u0634\u062f", ["\u062e\u0648\u0631\u062f\u0647"]),
    ("\u0628\u062e\u0648\u0631\u062f", ["\u0628\u062e\u0648\u0631\u062f"]),
    ("\u0628\u0631\u06af \u0647\u0627", ["\u0628\u0631\u06af"]),
    ("\u0628\u0631\u06af\u200c\u0647\u0627", ["\u0628\u0631\u06af"]),
    ("English test.", ["english", "test"]),
    ("\u062e\u0648\u0631\u062f\u0647 \u0645\u064a \u0634\u062f\u0647 \u0628\u0648\u062f\u0647 \u0628\u0627\u0634\u062f", ["\u062e\u0648\u0631\u062f\u0647"]),
    ("\u0628\u0631\u06af\u200c\u0647\u0627", ["\u0628\u0631\u06af"]),
])
def test_persian_analyzer_goldens(text, expected):
    from lucene_kmp_spark.analysis.fa import persian_analyzer

    assert persian_analyzer()(text)[0] == expected


# ---- Bengali (TestBengali{Normalizer,Stemmer,Analyzer}.kt goldens) ----
@pytest.mark.parametrize("word,norm", [
    ("\u099a\u09be\u0981\u09a6", "\u099a\u09be\u09a6"),
    ("\u09ac\u09be\u09dc\u09c0", "\u09ac\u09be\u09b0\u09bf"),
    ("\u09a4\u09c0\u09b0", "\u09a4\u09bf\u09b0"),
    ("\u09ad\u09c2\u09b2", "\u09ad\u09c1\u09b2"),
    ("\u0985\u09a8\u09c2\u09aa", "\u0985\u09a8\u09c1\u09aa"),
    ("\u09ac\u09be\u0999\u09b2\u09be", "\u09ac\u09be\u0982\u09b2\u09be"),
    ("\u09ac\u09cd\u09af\u09be\u0995\u09cd\u09a4\u09bf", "\u09ac\u09c7\u0995\u09cd\u09a4\u09bf"),
    ("\u09b8\u09a8\u09cd\u09a7\u09cd\u09af\u09be", "\u09b8\u09a8\u09cd\u09a7\u09be"),
    ("\u09b8\u09cd\u09ac\u09a6\u09c7\u09b6", "\u09b8\u09a6\u09c7\u09b8"),
    ("\u09a4\u09a4\u09cd\u09a4\u09cd\u09ac", "\u09a4\u09a4\u09cd\u09a4"),
    ("\u09ac\u09bf\u09b6\u09cd\u09ac", "\u09ac\u09bf\u09b8\u09b8"),
    ("\u09a6\u09c1\u0983\u0996", "\u09a6\u09c1\u0996\u0996"),
    ("\u0989\u0983", "\u0989\u09b9"),
    ("\u09aa\u09c1\u09a8\u0983", "\u09aa\u09c1\u09a8"),
    ("\u0995\u09a3\u09be", "\u0995\u09a8\u09be"),
    ("\u09b6\u09b0\u09c0\u09b0", "\u09b8\u09b0\u09bf\u09b0"),
    ("\u09ac\u09be\u09dc\u09bf", "\u09ac\u09be\u09b0\u09bf"),
])
def test_bengali_normalizer_goldens(word, norm):
    from lucene_kmp_spark.analysis.bn import bengali_normalize

    assert bengali_normalize(word) == norm


@pytest.mark.parametrize("word,stem", [
    ("\u0995\u09b0\u09c7\u099b\u09bf\u09b2\u09be\u09ae", "\u0995\u09b0"),
    ("\u0995\u09b0\u09bf\u09a4\u09c7\u099b\u09bf\u09b2\u09c7", "\u0995\u09b0"),
    ("\u0996\u09be\u0987\u09a4\u09be\u09ae", "\u0996\u09be\u0987"),
    ("\u09af\u09be\u0987\u09ac\u09c7", "\u09af\u09be"),
    ("\u0995\u09b0\u099b\u09bf\u09b2\u09be\u09ae", "\u0995\u09b0"),
    ("\u0995\u09b0\u099b\u09bf\u09b2\u09c7", "\u0995\u09b0"),
    ("\u0995\u09b0\u09a4\u09be\u09ae", "\u0995\u09b0"),
    ("\u09af\u09be\u09ac", "\u09af\u09be"),
    ("\u09af\u09be\u09ac\u09c7", "\u09af\u09be"),
    ("\u0995\u09b0\u09bf", "\u0995\u09b0"),
    ("\u0995\u09b0\u09cb", "\u0995\u09b0"),
    ("\u09ae\u09c7\u09df\u09c7\u09b0\u09be", "\u09ae\u09c7"),
    ("\u09ae\u09c7\u09df\u09c7\u09a6\u09c7\u09b0\u0995\u09c7", "\u09ae\u09c7"),
    ("\u09ae\u09c7\u09df\u09c7\u09a6\u09c7\u09b0", "\u09ae\u09c7"),
    ("\u098f\u0995\u099f\u09bf", "\u098f\u0995"),
    ("\u09ae\u09be\u09a8\u09c1\u09b7\u0997\u09c1\u09b2\u09bf", "\u09ae\u09be\u09a8\u09c1\u09b7"),
])
def test_bengali_stemmer_goldens(word, stem):
    from lucene_kmp_spark.analysis.bn import bengali_stem

    assert bengali_stem(word) == stem


@pytest.mark.parametrize("text,expected", [
    ("\u09ac\u09be\u09dc\u09c0", ["\u09ac\u09be\u09b0"]),
    ("\u09ac\u09be\u09b0\u09c0", ["\u09ac\u09be\u09b0"]),
    ("\u09e7\u09e8\u09e9\u09ea\u09eb\u09ec\u09ed\u09ee\u09ef\u09e6", ["1234567890"]),
])
def test_bengali_analyzer_goldens(text, expected):
    from lucene_kmp_spark.analysis.bn import bengali_analyzer

    assert bengali_analyzer()(text)[0] == expected


def test_persian_custom_stopwords():
    from lucene_kmp_spark.analysis.fa import persian_analyzer

    a = persian_analyzer(stop_words=("the", "and", "a"))
    assert a("The quick brown fox.")[0] == ["quick", "brown", "fox"]


def test_registry_routes_fa_bn():
    from lucene_kmp_spark.analysis.registry import analyzer_for

    assert analyzer_for("fa")("\u0645\u06cc\u200c\u062e\u0648\u0631\u062f")[0] == ["\u062e\u0648\u0631\u062f"]
    assert analyzer_for("bn")("\u09ac\u09be\u09dc\u09c0")[0] == ["\u09ac\u09be\u09b0"]


# ---- Telugu (TestTelugu{Normalizer,Stemmer,Analyzer}.kt goldens) ----
@pytest.mark.parametrize("word,norm", [
    ("\u0c2a\u0c26\u0c3e\u0c32\u0c42", "\u0c2a\u0c26\u0c3e\u0c32\u0c41"),
    ("\u0c05\u0c2c\u0c4d\u0c2c\u0c3e\u0c2f\u0c40", "\u0c05\u0c2c\u0c4d\u0c2c\u0c3e\u0c2f\u0c3f"),
    ("\u0c03\u0c4c\u0c48\u0c3e\u0c3f\u0c41", "\u0c4c\u0c48\u0c3e\u0c3f\u0c41"),
    ("\u0c14\u0c10\u0c06\u0c08\u0c0a", "\u0c13\u0c0f\u0c05\u0c07\u0c09"),
])
def test_telugu_normalizer_goldens(word, norm):
    from lucene_kmp_spark.analysis.te import telugu_normalize

    assert telugu_normalize(word) == norm


@pytest.mark.parametrize("word,stem", [
    ("\u0c35\u0c38\u0c4d\u0c24\u0c41\u0c35\u0c41\u0c32\u0c41", "\u0c35\u0c38\u0c4d\u0c24\u0c41\u0c35\u0c41"),
    ("\u0c2a\u0c28\u0c4d\u0c28\u0c41\u0c32\u0c41", "\u0c2a\u0c28\u0c4d\u0c28\u0c41"),
    ("\u0c1a\u0c47\u0c2a\u0c3f\u0c38\u0c4d\u0c24\u0c41\u0c28\u0c4d\u0c28\u0c26\u0c3f", "\u0c1a\u0c47\u0c2a\u0c3f\u0c38\u0c4d\u0c24\u0c41\u0c28\u0c4d\u0c28"),
    ("\u0c1a\u0c47\u0c2a\u0c3f\u0c38\u0c4d\u0c24\u0c41\u0c28\u0c4d\u0c28\u0c21\u0c41", "\u0c1a\u0c47\u0c2a\u0c3f\u0c38\u0c4d\u0c24\u0c41\u0c28\u0c4d\u0c28"),
])
def test_telugu_stemmer_goldens(word, stem):
    from lucene_kmp_spark.analysis.te import telugu_stem

    assert telugu_stem(word) == stem


def test_telugu_analyzer_goldens():
    from lucene_kmp_spark.analysis.te import telugu_analyzer

    a = telugu_analyzer()
    assert a("\u0c12\u0c55\u0c28\u0c2e\u0c3e\u0c32")[0] == ["\u0c13\u0c28\u0c2e\u0c3e\u0c32"]
    assert a("\u0c67\u0c68\u0c69\u0c6a")[0] == ["1234"]
    # exclusion: telugu filters skipped, indic composition still applies
    ax = telugu_analyzer(stem_exclusions=("\u0c35\u0c38\u0c4d\u0c24\u0c41\u0c35\u0c41\u0c32\u0c41",))
    assert ax("\u0c35\u0c38\u0c4d\u0c24\u0c41\u0c35\u0c41\u0c32\u0c41")[0] == ["\u0c35\u0c38\u0c4d\u0c24\u0c41\u0c2e\u0c32\u0c41"]


# ---- Indonesian (TestIndonesianStemmer.kt goldens, incl. inflectional-only mode) ----
@pytest.mark.parametrize("word,stem,deriv", [
    ("bukukah", "buku", True),
    ("adalah", "ada", True),
    ("bukupun", "buku", True),
    ("bukuku", "buku", True),
    ("bukumu", "buku", True),
    ("bukunya", "buku", True),
    ("mengukur", "ukur", True),
    ("menyapu", "sapu", True),
    ("menduga", "duga", True),
    ("menuduh", "uduh", True),
    ("membaca", "baca", True),
    ("merusak", "rusak", True),
    ("pengukur", "ukur", True),
    ("penyapu", "sapu", True),
    ("penduga", "duga", True),
    ("pembaca", "baca", True),
    ("diukur", "ukur", True),
    ("tersapu", "sapu", True),
    ("kekasih", "kasih", True),
    ("berlari", "lari", True),
    ("belajar", "ajar", True),
    ("bekerja", "kerja", True),
    ("perjelas", "jelas", True),
    ("pelajar", "ajar", True),
    ("pekerja", "kerja", True),
    ("tarikkan", "tarik", True),
    ("ambilkan", "ambil", True),
    ("mengambilkan", "ambil", True),
    ("makanan", "makan", True),
    ("janjian", "janji", True),
    ("perjanjian", "janji", True),
    ("tandai", "tanda", True),
    ("dapati", "dapat", True),
    ("mendapati", "dapat", True),
    ("pantai", "panta", True),
    ("penyalahgunaan", "salahguna", True),
    ("menyalahgunakan", "salahguna", True),
    ("disalahgunakan", "salahguna", True),
    ("pertanggungjawaban", "tanggungjawab", True),
    ("mempertanggungjawabkan", "tanggungjawab", True),
    ("dipertanggungjawabkan", "tanggungjawab", True),
    ("pelaksanaan", "laksana", True),
    ("pelaksana", "laksana", True),
    ("melaksanakan", "laksana", True),
    ("dilaksanakan", "laksana", True),
    ("melibatkan", "libat", True),
    ("terlibat", "libat", True),
    ("penculikan", "culik", True),
    ("menculik", "culik", True),
    ("diculik", "culik", True),
    ("penculik", "culik", True),
    ("perubahan", "ubah", True),
    ("peledakan", "ledak", True),
    ("penanganan", "tangan", True),
    ("kepolisian", "polisi", True),
    ("kenaikan", "naik", True),
    ("bersenjata", "senjata", True),
    ("penyelewengan", "seleweng", True),
    ("kecelakaan", "celaka", True),
    ("bukunya", "buku", False),
    ("bukukah", "buku", False),
    ("bukunyakah", "buku", False),
    ("dibukukannya", "dibukukan", False),
    ("bersenjata", "senjata", True),
    ("bukukah", "buku", True),
    ("gigi", "gigi", True),
    ("", "", True),
])
def test_indonesian_stemmer_goldens(word, stem, deriv):
    from lucene_kmp_spark.analysis.id import indonesian_stem

    assert indonesian_stem(word, stem_derivational=deriv) == stem


def test_indonesian_analyzer_chain():
    from lucene_kmp_spark.analysis.id import indonesian_analyzer

    a = indonesian_analyzer()
    # stopwords drop, stemming applies (Tala): "peledakan" -> "ledak"
    assert a("peledakan yang besar")[0] == ["ledak", "besar"]


def test_registry_routes_te_id():
    from lucene_kmp_spark.analysis.registry import analyzer_for

    assert analyzer_for("te")("\u0c67\u0c68\u0c69\u0c6a")[0] == ["1234"]
    assert analyzer_for("id")("peledakan")[0] == ["ledak"]


# ---- Russian (TestRussianAnalyzer.kt goldens; published Snowball algorithm) ----
def test_russian_analyzer_goldens():
    from lucene_kmp_spark.analysis.ru import russian_analyzer

    a = russian_analyzer()
    assert a("text 1000")[0] == ["text", "1000"]
    assert a(
        "\u0412\u043c\u0435\u0441\u0442\u0435 \u0441 \u0442\u0435\u043c \u043e "
        "\u0441\u0438\u043b\u0435 \u044d\u043b\u0435\u043a\u0442\u0440\u043e"
        "\u043c\u0430\u0433\u043d\u0438\u0442\u043d\u043e\u0439 "
        "\u044d\u043d\u0435\u0440\u0433\u0438\u0438 \u0438\u043c\u0435\u043b\u0438 "
        "\u043f\u0440\u0435\u0434\u0441\u0442\u0430\u0432\u043b\u0435\u043d\u0438\u0435 "
        "\u0435\u0449\u0435"
    )[0] == [
        "\u0432\u043c\u0435\u0441\u0442", "\u0441\u0438\u043b",
        "\u044d\u043b\u0435\u043a\u0442\u0440\u043e\u043c\u0430\u0433\u043d\u0438\u0442\u043d",
        "\u044d\u043d\u0435\u0440\u0433", "\u0438\u043c\u0435\u043b",
        "\u043f\u0440\u0435\u0434\u0441\u0442\u0430\u0432\u043b\u0435\u043d",
    ]
    assert a("\u041d\u043e \u0437\u043d\u0430\u043d\u0438\u0435 \u044d\u0442\u043e "
             "\u0445\u0440\u0430\u043d\u0438\u043b\u043e\u0441\u044c \u0432 "
             "\u0442\u0430\u0439\u043d\u0435")[0] == [
        "\u0437\u043d\u0430\u043d", "\u044d\u0442", "\u0445\u0440\u0430\u043d",
        "\u0442\u0430\u0439\u043d",
    ]


def test_russian_stem_exclusion():
    from lucene_kmp_spark.analysis.ru import russian_analyzer

    word = "\u043f\u0440\u0435\u0434\u0441\u0442\u0430\u0432\u043b\u0435\u043d\u0438\u0435"
    a = russian_analyzer(stem_exclusions=(word,))
    assert a(word)[0] == [word]


def test_russian_snowball_paths():
    from lucene_kmp_spark.analysis.ru import russian_snowball_stem as st

    # reflexive + verb: хранилось -> хран; perfective gerund: прочитав -> прочита
    assert st("\u0445\u0440\u0430\u043d\u0438\u043b\u043e\u0441\u044c") == "\u0445\u0440\u0430\u043d"
    assert st("\u043f\u0440\u043e\u0447\u0438\u0442\u0430\u0432") == "\u043f\u0440\u043e\u0447\u0438\u0442\u0430"
    # derivational in R2: видимость -> видим
    assert st("\u0432\u0438\u0434\u0438\u043c\u043e\u0441\u0442\u044c") == "\u0432\u0438\u0434\u0438\u043c"
    # noun plural: книгами -> книг
    assert st("\u043a\u043d\u0438\u0433\u0430\u043c\u0438") == "\u043a\u043d\u0438\u0433"


def test_registry_routes_ru():
    from lucene_kmp_spark.analysis.registry import analyzer_for

    assert analyzer_for("ru")("\u043a\u043d\u0438\u0433\u0430\u043c\u0438")[0] == ["\u043a\u043d\u0438\u0433"]


# ---- Urdu (analysis:extra TestUrdu{Normalizer,Stemmer,Analyzer}.kt goldens) ----
def test_urdu_goldens():
    from lucene_kmp_spark.analysis.ur import urdu_analyzer, urdu_normalize, urdu_stem

    # diacritic strip, presentation-form + ligature folds
    assert urdu_normalize("\u0634\u06cc\u0631\u0650") == "\u0634\u06cc\u0631"
    assert urdu_normalize("\u0643") == "\u06a9"
    assert urdu_normalize("\ufefb") == "\u0644\u0627"
    assert urdu_normalize("\ufefc") == "\u0644\u0627"
    # stem: کتابوں -> کتاب, لڑکیاں -> لڑک; short/proper words untouched
    assert urdu_stem("\u06a9\u062a\u0627\u0628\u0648\u06ba") == "\u06a9\u062a\u0627\u0628"
    assert urdu_stem("\u0644\u0691\u06a9\u06cc\u0627\u06ba") == "\u0644\u0691\u06a9"
    assert urdu_stem("\u067e\u0627\u06a9\u0633\u062a\u0627\u0646") == "\u067e\u0627\u06a9\u0633\u062a\u0627\u0646"
    a = urdu_analyzer()
    assert a("\u06f1\u06f2\u06f3\u06f4")[0] == ["1234"]
    assert a("\u067e\u0627\u06a9\u0633\u062a\u0627\u0646")[0] == ["\u067e\u0627\u06a9\u0633\u062a\u0627\u0646"]


# ---- Swahili (analysis:extra TestSwahili*.kt goldens) ----
def test_swahili_goldens():
    from lucene_kmp_spark.analysis.sw import swahili_analyzer

    a = swahili_analyzer()
    assert a("Ninasoma")[0] == ["som"]
    assert a("Vitabu")[0] == ["tabu"]
    assert a("1234")[0] == ["1234"]
    assert a("mimi na mtoto ninasoma kitabu")[0] == ["toto", "som", "tabu"]
    ax = swahili_analyzer(stem_exclusions=("ninasoma",))
    assert ax("Ninasoma")[0] == ["ninasoma"]


def test_registry_routes_ur_sw():
    from lucene_kmp_spark.analysis.registry import analyzer_for

    assert analyzer_for("ur")("\u06f1\u06f2\u06f3\u06f4")[0] == ["1234"]
    assert analyzer_for("sw")("Vitabu")[0] == ["tabu"]


# ---------------------------------------------------------------- da/no/sv

def test_danish_analyzer_goldens():
    """TestDanishAnalyzer.kt testBasics + testExclude."""
    from lucene_kmp_spark.analysis.scand import danish_analyzer

    a = danish_analyzer()
    assert a("undersøg")[0] == ["undersøg"]
    assert a("undersøgelse")[0] == ["undersøg"]
    assert a("på")[0] == []  # stopword
    ex = danish_analyzer(stem_exclusions=("undersøgelse",))
    assert ex("undersøgelse")[0] == ["undersøgelse"]
    assert ex("undersøg")[0] == ["undersøg"]


def test_norwegian_analyzer_goldens():
    """TestNorwegianAnalyzer.kt testBasics + testExclude."""
    from lucene_kmp_spark.analysis.scand import norwegian_analyzer

    a = norwegian_analyzer()
    assert a("havnedistriktene")[0] == ["havnedistrikt"]
    assert a("havnedistrikter")[0] == ["havnedistrikt"]
    assert a("det")[0] == []
    ex = norwegian_analyzer(stem_exclusions=("havnedistriktene",))
    assert ex("havnedistriktene")[0] == ["havnedistriktene"]
    assert ex("havnedistrikter")[0] == ["havnedistrikt"]


def test_swedish_analyzer_goldens():
    """TestSwedishAnalyzer.kt testBasics + testExclude."""
    from lucene_kmp_spark.analysis.scand import swedish_analyzer

    a = swedish_analyzer()
    assert a("jaktkarlarne")[0] == ["jaktkarl"]
    assert a("jaktkarlens")[0] == ["jaktkarl"]
    assert a("och")[0] == []
    ex = swedish_analyzer(stem_exclusions=("jaktkarlarne",))
    assert ex("jaktkarlarne")[0] == ["jaktkarlarne"]
    assert ex("jaktkarlens")[0] == ["jaktkarl"]


@pytest.mark.parametrize("word,stem", [
    # hand-derived from the published Snowball danish algorithm
    ("friskhed", "frisk"),         # main: -hed in R1
    ("bilen", "bil"),              # main: -en
    ("huset", "hus"),              # main: -et
    ("bøgerne", "bøg"),            # main: -erne
    ("kattens", "kat"),            # main: -ens, then undouble tt->t
    ("venligst", "ven"),           # other: igst chop + -lig, not via main
    ("hundene", "hund"),           # main: -ene
    ("springende", "spring"),      # main: -ende
    ("ab", "ab"),                  # shorter than 3: no R1, untouched
    ("sejest", "sejest"),          # -est not a danish suffix
])
def test_danish_snowball_cases(word, stem):
    from lucene_kmp_spark.analysis.scand import danish_snowball_stem

    assert danish_snowball_stem(word) == stem


@pytest.mark.parametrize("word,stem", [
    ("huset", "hus"),              # main: -et
    ("bilens", "bil"),             # main: -ens
    ("fisks", "fisk"),             # -s after k preceded by non-vowel
    ("raks", "raks"),              # -s after k preceded by vowel: kept
    ("lønnsomhet", "lønnsom"),     # main: -het
    ("kjøpte", "kjøpt"),           # main: -e
    ("billigst", "billigst"),      # no igst rule in norwegian
    ("hyggelig", "hygg"),          # other: -elig
])
def test_norwegian_snowball_cases(word, stem):
    from lucene_kmp_spark.analysis.scand import norwegian_snowball_stem

    assert norwegian_snowball_stem(word) == stem


@pytest.mark.parametrize("word,stem", [
    ("flickorna", "flick"),        # main: -orna
    ("trädet", "trädet"),          # swedish among has no bare -et
    ("hemskt", "hemsk"),           # consonant pair -kt drops last letter
    ("husets", "huset"),           # -ets not in swedish among: only -s strips
    ("stolen", "stol"),            # main: -en
    ("dagens", "dag"),             # main: -ens
    ("fullt", "fullt"),            # 'fullt' starts before R1: untouched
    ("sorgfullt", "sorgfull"),     # other: fullt -> full inside R1
    ("kolöst", "kolös"),           # öst -> ös after valid ost-ending
    ("bäst", "bäst"),              # -ast not matchable (b < R1)
])
def test_swedish_snowball_cases(word, stem):
    from lucene_kmp_spark.analysis.scand import swedish_snowball_stem

    assert swedish_snowball_stem(word) == stem


def test_registry_routes_da_no_sv():
    from lucene_kmp_spark.analysis.registry import analyzer_for

    assert analyzer_for("da")("undersøgelse")[0] == ["undersøg"]
    assert analyzer_for("no")("havnedistriktene")[0] == ["havnedistrikt"]
    assert analyzer_for("sv")("jaktkarlarne")[0] == ["jaktkarl"]


# ---------------------------------------------------------------- cz/bg/hu

# TestCzechStemmer.kt — complete assertAnalyzesTo goldens (via CzechAnalyzer)
CZ_GOLDENS_A = [
    ("pán", "pán"),
    ("páni", "pán"),
    ("pánové", "pán"),
    ("pána", "pán"),
    ("pánů", "pán"),
    ("pánovi", "pán"),
    ("pánům", "pán"),
    ("pány", "pán"),
    ("páne", "pán"),
    ("pánech", "pán"),
    ("pánem", "pán"),
    ("hrad", "hrad"),
    ("hradu", "hrad"),
    ("hrade", "hrad"),
    ("hradem", "hrad"),
    ("hrady", "hrad"),
    ("hradech", "hrad"),
    ("hradům", "hrad"),
    ("hradů", "hrad"),
    ("muž", "muh"),
    ("muži", "muh"),
    ("muže", "muh"),
    ("mužů", "muh"),
    ("mužům", "muh"),
    ("mužích", "muh"),
    ("mužem", "muh"),
    ("stroj", "stroj"),
    ("stroje", "stroj"),
    ("strojů", "stroj"),
    ("stroji", "stroj"),
    ("strojům", "stroj"),
    ("strojích", "stroj"),
    ("strojem", "stroj"),
    ("předseda", "předsd"),
    ("předsedové", "předsd"),
    ("předsedy", "předsd"),
    ("předsedů", "předsd"),
    ("předsedovi", "předsd"),
    ("předsedům", "předsd"),
    ("předsedu", "předsd"),
    ("předsedo", "předsd"),
    ("předsedech", "předsd"),
    ("předsedou", "předsd"),
    ("soudce", "soudk"),
    ("soudci", "soudk"),
    ("soudců", "soudk"),
    ("soudcům", "soudk"),
    ("soudcích", "soudk"),
    ("soudcem", "soudk"),
    ("kost", "kost"),
    ("kosti", "kost"),
    ("kostí", "kost"),
    ("kostem", "kost"),
    ("kostech", "kost"),
    ("kostmi", "kost"),
    ("píseň", "písň"),
    ("písně", "písn"),
    ("písni", "písn"),
    ("písněmi", "písn"),
    ("písních", "písn"),
    ("písním", "písn"),
    ("růže", "růh"),
    ("růží", "růh"),
    ("růžím", "růh"),
    ("růžích", "růh"),
    ("růžemi", "růh"),
    ("růži", "růh"),
    ("žena", "žn"),
    ("ženy", "žn"),
    ("žen", "žn"),
    ("ženě", "žn"),
    ("ženám", "žn"),
    ("ženu", "žn"),
    ("ženo", "žn"),
    ("ženách", "žn"),
    ("ženou", "žn"),
    ("ženami", "žn"),
    ("město", "měst"),
    ("města", "měst"),
    ("měst", "měst"),
    ("městu", "měst"),
    ("městům", "měst"),
    ("městě", "měst"),
    ("městech", "měst"),
    ("městem", "měst"),
    ("městy", "měst"),
    ("moře", "moř"),
    ("moří", "moř"),
    ("mořím", "moř"),
    ("moři", "moř"),
    ("mořích", "moř"),
    ("mořem", "moř"),
    ("kuře", "kuř"),
    ("kuřata", "kuř"),
    ("kuřete", "kuř"),
    ("kuřat", "kuř"),
    ("kuřeti", "kuř"),
    ("kuřatům", "kuř"),
    ("kuřatech", "kuř"),
    ("kuřetem", "kuř"),
    ("kuřaty", "kuř"),
    ("stavení", "stavn"),
    ("stavením", "stavn"),
    ("staveních", "stavn"),
    ("staveními", "stavn"),
    ("mladý", "mlad"),
    ("mladí", "mlad"),
    ("mladého", "mlad"),
    ("mladých", "mlad"),
    ("mladému", "mlad"),
    ("mladým", "mlad"),
    ("mladé", "mlad"),
    ("mladém", "mlad"),
    ("mladými", "mlad"),
    ("mladá", "mlad"),
    ("mladou", "mlad"),
    ("jarní", "jarn"),
    ("jarního", "jarn"),
    ("jarních", "jarn"),
    ("jarnímu", "jarn"),
    ("jarním", "jarn"),
    ("jarními", "jarn"),
    ("Karlův", "karl"),
    ("jazykový", "jazyk"),
    ("český", "česk"),
    ("čeští", "česk"),
    ("anglický", "anglick"),
    ("angličtí", "anglick"),
    ("kniha", "knih"),
    ("knize", "knih"),
    ("mazat", "mah"),
    ("mažu", "mah"),
    ("kluk", "kluk"),
    ("kluci", "kluk"),
    ("klucích", "kluk"),
    ("hezký", "hezk"),
    ("hezčí", "hezk"),
    ("hůl", "hol"),
    ("hole", "hol"),
    ("deska", "desk"),
    ("desek", "desk"),
    ("e", "e"),
    ("zi", "zi"),
]

# TestBulgarianStemmer.kt — complete goldens (via BulgarianAnalyzer)
BG_GOLDENS_A = [
    ("град", "град"),
    ("града", "град"),
    ("градът", "град"),
    ("градове", "град"),
    ("градовете", "град"),
    ("народ", "народ"),
    ("народа", "народ"),
    ("народът", "народ"),
    ("народи", "народ"),
    ("народите", "народ"),
    ("народе", "народ"),
    ("път", "път"),
    ("пътя", "път"),
    ("пътят", "път"),
    ("пътища", "път"),
    ("пътищата", "път"),
    ("градец", "градец"),
    ("градеца", "градец"),
    ("градецът", "градец"),
    ("градовце", "градовц"),
    ("градовцете", "градовц"),
    ("дядо", "дяд"),
    ("дядото", "дяд"),
    ("дядовци", "дяд"),
    ("дядовците", "дяд"),
    ("мъж", "мъж"),
    ("мъжа", "мъж"),
    ("мъже", "мъж"),
    ("мъжете", "мъж"),
    ("мъжо", "мъж"),
    ("мъжът", "мъжът"),
    ("крак", "крак"),
    ("крака", "крак"),
    ("кракът", "крак"),
    ("краката", "крак"),
    ("брат", "брат"),
    ("брата", "брат"),
    ("братът", "брат"),
    ("братя", "брат"),
    ("братята", "брат"),
    ("брате", "брат"),
    ("вест", "вест"),
    ("вестта", "вест"),
    ("вести", "вест"),
    ("вестите", "вест"),
    ("дърво", "дърв"),
    ("дървото", "дърв"),
    ("дърва", "дърв"),
    ("дървета", "дърв"),
    ("дървата", "дърв"),
    ("дърветата", "дърв"),
    ("море", "мор"),
    ("морето", "мор"),
    ("морета", "мор"),
    ("моретата", "мор"),
    ("изключение", "изключени"),
    ("изключението", "изключени"),
    ("изключенията", "изключени"),
    ("изключения", "изключн"),
    ("красив", "красив"),
    ("красивия", "красив"),
    ("красивият", "красив"),
    ("красива", "красив"),
    ("красивата", "красив"),
    ("красиво", "красив"),
    ("красивото", "красив"),
    ("красиви", "красив"),
    ("красивите", "красив"),
    ("собственик", "собственик"),
    ("собственика", "собственик"),
    ("собственикът", "собственик"),
    ("собственици", "собственик"),
    ("собствениците", "собственик"),
    ("подлог", "подлог"),
    ("подлога", "подлог"),
    ("подлогът", "подлог"),
    ("подлози", "подлог"),
    ("подлозите", "подлог"),
    ("кожух", "кожух"),
    ("кожуха", "кожух"),
    ("кожухът", "кожух"),
    ("кожуси", "кожух"),
    ("кожусите", "кожух"),
    ("център", "центр"),
    ("центъра", "центр"),
    ("центърът", "центр"),
    ("центрове", "центр"),
    ("центровете", "центр"),
    ("промяна", "промян"),
    ("промяната", "промян"),
    ("промени", "промян"),
    ("промените", "промян"),
    ("песен", "песн"),
    ("песента", "песн"),
    ("песни", "песн"),
    ("песните", "песн"),
    ("строй", "строй"),
    ("строеве", "строй"),
    ("строевете", "строй"),
    ("строя", "стр"),
    ("строят", "стр"),
]


@pytest.mark.parametrize("word,stem", CZ_GOLDENS_A)
def test_czech_stemmer_goldens(word, stem):
    from lucene_kmp_spark.analysis.cz import czech_analyzer

    assert czech_analyzer()(word)[0] == [stem]


def test_czech_keyword_and_stop():
    """TestCzechStemmer.kt testWithKeywordAttribute + stopword handling."""
    from lucene_kmp_spark.analysis.cz import czech_analyzer

    ex = czech_analyzer(stem_exclusions=("hole",))
    assert ex("hole desek")[0] == ["hole", "desk"]
    assert czech_analyzer()("a")[0] == []  # stopword


@pytest.mark.parametrize("word,stem", BG_GOLDENS_A)
def test_bulgarian_stemmer_goldens(word, stem):
    from lucene_kmp_spark.analysis.bg import bulgarian_analyzer

    assert bulgarian_analyzer()(word)[0] == [stem]


def test_bulgarian_short_and_exclusion():
    from lucene_kmp_spark.analysis.bg import bulgarian_analyzer, bulgarian_stem

    assert bulgarian_stem("\u0434\u043e\u043c") == "\u0434\u043e\u043c"  # len<4 untouched
    ex = bulgarian_analyzer(stem_exclusions=("\u0441\u0442\u0440\u0430\u043d\u0430",))
    assert ex("\u0441\u0442\u0440\u0430\u043d\u0430")[0] == ["\u0441\u0442\u0440\u0430\u043d\u0430"]


def test_hungarian_analyzer_goldens():
    """TestHungarianAnalyzer.kt testBasics + testExclude."""
    from lucene_kmp_spark.analysis.hu import hungarian_analyzer

    a = hungarian_analyzer()
    assert a("babakocsi")[0] == ["babakocs"]
    assert a("babakocsij\u00e1\u00e9rt")[0] == ["babakocs"]
    assert a("\u00e1ltal")[0] == []  # stopword
    ex = hungarian_analyzer(stem_exclusions=("babakocsi",))
    assert ex("babakocsi")[0] == ["babakocsi"]
    assert ex("babakocsij\u00e1\u00e9rt")[0] == ["babakocs"]


def test_registry_routes_cs_bg_hu():
    from lucene_kmp_spark.analysis.registry import analyzer_for

    assert analyzer_for("cs")("p\u00e1nov\u00e9")[0] == ["p\u00e1n"]
    assert analyzer_for("hu")("babakocsi")[0] == ["babakocs"]
    assert analyzer_for("bg")("\u0433\u0440\u0430\u0434\u044a\u0442")[0] == ["\u0433\u0440\u0430\u0434"]


# ---------------------------------------------------------------- ne/ro/nl

def test_nepali_analyzer_goldens():
    """TestNepaliAnalyzer.kt — stemming, stopwords, case/digit fold, excl."""
    from lucene_kmp_spark.analysis.ne import nepali_analyzer

    a = nepali_analyzer()
    assert a("मित्र")[0] == ["मित्र"]
    assert a("मित्रहरु")[0] == ["मित्र"]
    assert a("FIFA")[0] == ["fifa"]
    assert a("१२३४")[0] == ["1234"]
    assert a("सबै व्यक्तिहरू जन्मजात स्वतन्त्र हुन् ती सबैको समान अधिकार र महत्व")[0] == [
        "व्यक्ति", "जन्मजात", "स्वतन्त्र", "सबै", "समान", "अधिकार", "महत्व"]
    ex = nepali_analyzer(stem_exclusions=("मित्रहरु",))
    assert ex("मित्रहरु")[0] == ["मित्रहरु"]


def test_romanian_analyzer_goldens():
    """TestRomanianAnalyzer.kt — stemming, cedilla normalization, stop, excl."""
    from lucene_kmp_spark.analysis.ro import romanian_analyzer

    a = romanian_analyzer()
    assert a("absența")[0] == ["absenț"]
    assert a("absenți")[0] == ["absenț"]
    assert a("absenţ")[0] == ["absenț"]  # cedilla input folds to comma form
    assert a("îl")[0] == []
    ex = romanian_analyzer(stem_exclusions=("absența",))
    assert ex("absența")[0] == ["absența"]
    assert ex("absenți")[0] == ["absenț"]


# TestDutchAnalyzer.kt — complete check() vocabulary (via DutchAnalyzer)
NL_GOLDENS = [
    ("lichaamsziek", "lichaamsziek"), ("lichamelijk", "licham"),
    ("lichamelijke", "licham"), ("lichamelijkheden", "licham"),
    ("lichamen", "licham"), ("lichere", "licher"), ("licht", "licht"),
    ("lichtbeeld", "lichtbeeld"), ("lichtbruin", "lichtbruin"),
    ("lichtdoorlatende", "lichtdoorlat"), ("lichte", "licht"),
    ("lichten", "licht"), ("lichtende", "lichtend"),
    ("lichtenvoorde", "lichtenvoord"), ("lichter", "lichter"),
    ("lichtere", "lichter"), ("lichters", "lichter"),
    ("lichtgevoeligheid", "lichtgevoel"), ("lichtgewicht", "lichtgewicht"),
    ("lichtgrijs", "lichtgrijs"), ("lichthoeveelheid", "lichthoevel"),
    ("lichtintensiteit", "lichtintensiteit"), ("lichtje", "lichtj"),
    ("lichtjes", "lichtjes"), ("lichtkranten", "lichtkrant"),
    ("lichtkring", "lichtkring"), ("lichtkringen", "lichtkring"),
    ("lichtregelsystemen", "lichtregelsystem"), ("lichtste", "lichtst"),
    ("lichtstromende", "lichtstrom"), ("lichtte", "licht"),
    ("lichtten", "licht"), ("lichttoetreding", "lichttoetred"),
    ("lichtverontreinigde", "lichtverontreinigd"),
    ("lichtzinnige", "lichtzinn"), ("lid", "lid"), ("lidia", "lidia"),
    ("lidmaatschap", "lidmaatschap"), ("lidstaten", "lidstat"),
    ("lidvereniging", "lidveren"), ("opgingen", "opging"),
    ("opglanzing", "opglanz"), ("opglanzingen", "opglanz"),
    ("opglimlachten", "opglimlacht"), ("opglimpen", "opglimp"),
    ("opglimpende", "opglimp"), ("opglimping", "opglimp"),
    ("opglimpingen", "opglimp"), ("opgraven", "opgrav"),
    ("opgrijnzen", "opgrijnz"), ("opgrijzende", "opgrijz"),
    ("opgroeien", "opgroei"), ("opgroeiende", "opgroei"),
    ("opgroeiplaats", "opgroeiplat"), ("ophaal", "ophal"),
    ("ophaaldienst", "ophaaldienst"), ("ophaalkosten", "ophaalkost"),
    ("ophaalsystemen", "ophaalsystem"), ("ophaalt", "ophaalt"),
    ("ophaaltruck", "ophaaltruck"), ("ophalen", "ophal"),
    ("ophalend", "ophal"), ("ophalers", "ophaler"), ("ophef", "ophef"),
    ("opheldering", "ophelder"), ("ophemelde", "ophemeld"),
    ("ophemelen", "ophemel"), ("opheusden", "opheusd"),
    ("ophief", "ophief"), ("ophield", "ophield"), ("ophieven", "ophiev"),
    ("ophoepelt", "ophoepelt"), ("ophoog", "ophog"),
    ("ophoogzand", "ophoogzand"), ("ophopen", "ophop"),
    ("ophoping", "ophop"), ("ophouden", "ophoud"),
]


@pytest.mark.parametrize("word,stem", NL_GOLDENS)
def test_dutch_vocabulary(word, stem):
    from lucene_kmp_spark.analysis.nl import dutch_analyzer

    assert dutch_analyzer()(word)[0] == [stem]


def test_dutch_stem_dict_and_stopwords():
    """TestDutchAnalyzer.kt stem-dict on/off + stopword casing."""
    from lucene_kmp_spark.analysis.nl import dutch_analyzer

    a = dutch_analyzer()
    assert a("fiets")[0] == ["fiets"]        # DEFAULT_STEM_DICT override
    assert a("bromfiets")[0] == ["bromfiets"]
    assert a("ei")[0] == ["eier"]
    assert a("kind")[0] == ["kinder"]
    assert dutch_analyzer(stem_overrides={})("fiets")[0] == ["fiet"]
    assert a("Zelf")[0] == []                # stopwords case-insensitive
    assert a("opheffen")[0] == ["opheff"]
    assert a("lichamelijkheden")[0] == ["licham"]


def test_registry_routes_ne_ro_nl():
    from lucene_kmp_spark.analysis.registry import analyzer_for

    assert analyzer_for("ne")("मित्रहरु")[0] == ["मित्र"]
    assert analyzer_for("ro")("absenți")[0] == ["absenț"]
    assert analyzer_for("nl")("lichamen")[0] == ["licham"]


# ---------------------------------------------------------------- el

# TestGreekStemmer.kt — complete checkOneTerm goldens (342 pairs)
EL_GOLDENS = [
    ("άνθρωπος", "ανθρωπ"), ("ανθρώπου", "ανθρωπ"), ("άνθρωπο", "ανθρωπ"),
    ("άνθρωπε", "ανθρωπ"), ("άνθρωποι", "ανθρωπ"), ("ανθρώπων", "ανθρωπ"),
    ("ανθρώπους", "ανθρωπ"), ("άνθρωποι", "ανθρωπ"), ("πελάτης", "πελατ"),
    ("πελάτη", "πελατ"), ("πελάτες", "πελατ"), ("πελατών", "πελατ"),
    ("ελέφαντας", "ελεφαντ"), ("ελέφαντα", "ελεφαντ"),
    ("ελέφαντες", "ελεφαντ"), ("ελεφάντων", "ελεφαντ"),
    ("μπαμπάς", "μπαμπ"), ("μπαμπά", "μπαμπ"), ("μπαμπάδες", "μπαμπ"),
    ("μπαμπάδων", "μπαμπ"), ("μπακάλης", "μπακαλ"), ("μπακάλη", "μπακαλ"),
    ("μπακάληδες", "μπακαλ"), ("μπακάληδων", "μπακαλ"), ("καφές", "καφ"),
    ("καφέ", "καφ"), ("καφέδες", "καφ"), ("καφέδων", "καφ"),
    ("γραμματέας", "γραμματε"), ("γραμματέα", "γραμματε"),
    ("γραμματείς", "γραμματ"), ("γραμματέων", "γραμματ"),
    ("απόπλους", "αποπλ"), ("απόπλου", "αποπλ"), ("απόπλοι", "αποπλ"),
    ("απόπλων", "αποπλ"), ("παππούς", "παππ"), ("παππού", "παππ"),
    ("παππούδες", "παππ"), ("παππούδων", "παππ"), ("λάτρης", "λατρ"),
    ("λάτρη", "λατρ"), ("λάτρεις", "λατρ"), ("λάτρεων", "λατρ"),
    ("πέλεκυς", "πελεκ"), ("πέλεκυ", "πελεκ"), ("πελέκεις", "πελεκ"),
    ("πελέκεων", "πελεκ"), ("μέντωρ", "μεντωρ"), ("μέντορος", "μεντορ"),
    ("μέντορα", "μεντορ"), ("μέντορες", "μεντορ"), ("μεντόρων", "μεντορ"),
    ("αγώνας", "αγων"), ("αγώνος", "αγων"), ("αγώνα", "αγων"),
    ("αγώνα", "αγων"), ("αγώνες", "αγων"), ("αγώνων", "αγων"),
    ("αέρας", "αερ"), ("αέρα", "αερ"), ("αέρηδες", "αερ"),
    ("αέρηδων", "αερ"), ("γόης", "γο"), ("γόη", "γοη"), ("γόητες", "γοητ"),
    ("γοήτων", "γοητ"), ("φορά", "φορ"), ("φοράς", "φορ"),
    ("φορές", "φορ"), ("φορών", "φορ"), ("αγελάδα", "αγελαδ"),
    ("αγελάδας", "αγελαδ"), ("αγελάδες", "αγελαδ"), ("αγελάδων", "αγελαδ"),
    ("ζάχαρη", "ζαχαρ"), ("ζάχαρης", "ζαχαρ"), ("ζάχαρες", "ζαχαρ"),
    ("ζαχάρεων", "ζαχαρ"), ("τηλεόραση", "τηλεορασ"),
    ("τηλεόρασης", "τηλεορασ"), ("τηλεοράσεις", "τηλεορασ"),
    ("τηλεοράσεων", "τηλεορασ"), ("μαμά", "μαμ"), ("μαμάς", "μαμ"),
    ("μαμάδες", "μαμ"), ("μαμάδων", "μαμ"), ("λεωφόρος", "λεωφορ"),
    ("λεωφόρου", "λεωφορ"), ("λεωφόρο", "λεωφορ"), ("λεωφόρε", "λεωφορ"),
    ("λεωφόροι", "λεωφορ"), ("λεωφόρων", "λεωφορ"),
    ("λεωφόρους", "λεωφορ"), ("αλεπού", "αλεπ"), ("αλεπούς", "αλεπ"),
    ("αλεπούδες", "αλεπ"), ("αλεπούδων", "αλεπ"),
    ("γραμματέας", "γραμματε"), ("γραμματέως", "γραμματ"),
    ("γραμματέα", "γραμματε"), ("γραμματείς", "γραμματ"),
    ("γραμματέων", "γραμματ"), ("βιβλίο", "βιβλι"), ("βιβλίου", "βιβλ"),
    ("βιβλία", "βιβλ"), ("βιβλίων", "βιβλ"), ("πουλί", "πουλ"),
    ("πουλιού", "πουλ"), ("πουλιά", "πουλ"), ("πουλιών", "πουλ"),
    ("πρόβλημα", "προβλημ"), ("προβλήματος", "προβλημα"),
    ("προβλήματα", "προβλημα"), ("προβλημάτων", "προβλημα"),
    ("πέλαγος", "πελαγ"), ("πελάγους", "πελαγ"), ("πελάγη", "πελαγ"),
    ("πελάγων", "πελαγ"), ("γεγονός", "γεγον"), ("γεγονότος", "γεγον"),
    ("γεγονότα", "γεγον"), ("γεγονότων", "γεγον"), ("βράδυ", "βραδ"),
    ("βράδι", "βραδ"), ("βραδιού", "βραδ"), ("βράδια", "βραδ"),
    ("βραδιών", "βραδ"), ("δόρυ", "δορ"), ("δόρατος", "δορατ"),
    ("δόρατα", "δορατ"), ("δοράτων", "δορατ"), ("κρέας", "κρε"),
    ("κρέατος", "κρε"), ("κρέατα", "κρε"), ("κρεάτων", "κρε"),
    ("λυκόφως", "λυκοφω"), ("λυκόφωτος", "λυκοφω"), ("λυκόφωτα", "λυκοφω"),
    ("λυκοφώτων", "λυκοφω"), ("μέσον", "μεσον"), ("μέσου", "μεσ"),
    ("μέσα", "μεσ"), ("μέσων", "μεσ"), ("ενδιαφέρον", "ενδιαφερον"),
    ("ενδιαφέροντος", "ενδιαφεροντ"), ("ενδιαφέροντα", "ενδιαφεροντ"),
    ("ενδιαφερόντων", "ενδιαφεροντ"), ("ανακοινωθέν", "ανακοινωθεν"),
    ("ανακοινωθέντος", "ανακοινωθεντ"), ("ανακοινωθέντα", "ανακοινωθεντ"),
    ("ανακοινωθέντων", "ανακοινωθεντ"), ("σύμπαν", "συμπ"),
    ("σύμπαντος", "συμπαντ"), ("σύμπαντα", "συμπαντ"),
    ("συμπάντων", "συμπαντ"), ("γάλα", "γαλ"), ("γάλακτος", "γαλακτ"),
    ("γάλατα", "γαλατ"), ("γαλάκτων", "γαλακτ"), ("συνεχής", "συνεχ"),
    ("συνεχούς", "συνεχ"), ("συνεχή", "συνεχ"), ("συνεχών", "συνεχ"),
    ("συνεχείς", "συνεχ"), ("συνεχές", "συνεχ"), ("συνήθης", "συνηθ"),
    ("συνήθους", "συνηθ"), ("συνήθη", "συνηθ"), ("συνήθεις", "συν"),
    ("συνήθων", "συνηθ"), ("σύνηθες", "συνηθ"), ("βαθύς", "βαθ"),
    ("βαθέος", "βαθε"), ("βαθύ", "βαθ"), ("βαθείς", "βαθ"),
    ("βαθέων", "βαθ"), ("βαθιά", "βαθ"), ("βαθιάς", "βαθι"),
    ("βαθιές", "βαθι"), ("βαθιών", "βαθ"), ("βαθέα", "βαθε"),
    ("ψηλός", "ψηλ"), ("ψηλότερος", "ψηλ"), ("ψηλότατος", "ψηλ"),
    ("ωραίος", "ωραι"), ("ωραιότερος", "ωραι"), ("ωραιότατος", "ωραι"),
    ("επιεικής", "επιεικ"), ("επιεικέστερος", "επιεικ"),
    ("επιεικέστατος", "επιεικ"), ("ορίζω", "οριζ"), ("όριζα", "οριζ"),
    ("όριζε", "οριζ"), ("ορίζοντας", "οριζ"), ("ορίζομαι", "οριζ"),
    ("οριζόμουν", "οριζ"), ("ορίζεσαι", "οριζ"), ("όρισα", "ορισ"),
    ("ορίσω", "ορισ"), ("όρισε", "ορισ"), ("ορίσει", "ορισ"),
    ("ορίστηκα", "οριστ"), ("οριστώ", "οριστ"), ("οριστείς", "οριστ"),
    ("οριστεί", "οριστ"), ("ορισμένο", "ορισμεν"), ("ορισμένη", "ορισμεν"),
    ("ορισμένος", "ορισμεν"), ("ανοίγω", "ανοιγ"), ("άνοιγα", "ανοιγ"),
    ("άνοιγε", "ανοιγ"), ("ανοίγοντας", "ανοιγ"), ("ανοίγομαι", "ανοιγ"),
    ("ανοιγόμουν", "ανοιγ"), ("άνοιξα", "ανοιξ"), ("ανοίξω", "ανοιξ"),
    ("άνοιξε", "ανοιξ"), ("ανοίξει", "ανοιξ"), ("ανοίχτηκα", "ανοιχτ"),
    ("ανοιχτώ", "ανοιχτ"), ("ανοίχτηκα", "ανοιχτ"),
    ("ανοιχτείς", "ανοιχτ"), ("ανοιχτεί", "ανοιχτ"), ("ανοίξου", "ανοιξ"),
    ("περνώ", "περν"), ("περνάω", "περν"), ("περνούσα", "περν"),
    ("πέρναγα", "περν"), ("πέρνα", "περν"), ("περνώντας", "περν"),
    ("πέρασα", "περασ"), ("περάσω", "περασ"), ("πέρασε", "περασ"),
    ("περάσει", "περασ"), ("περνιέμαι", "περν"), ("περνιόμουν", "περν"),
    ("περάστηκα", "περαστ"), ("περαστώ", "περαστ"),
    ("περαστείς", "περαστ"), ("περαστεί", "περαστ"),
    ("περασμένο", "περασμεν"), ("περασμένη", "περασμεν"),
    ("περασμένος", "περασμεν"), ("πετώ", "πετ"), ("πετάω", "πετ"),
    ("πετούσα", "πετ"), ("πέταγα", "πετ"), ("πέτα", "πετ"),
    ("πετώντας", "πετ"), ("πετιέμαι", "πετ"), ("πετιόμουν", "πετ"),
    ("πέταξα", "πεταξ"), ("πετάξω", "πεταξ"), ("πέταξε", "πεταξ"),
    ("πετάξει", "πεταξ"), ("πετάχτηκα", "πεταχτ"), ("πεταχτώ", "πεταχτ"),
    ("πεταχτείς", "πεταχτ"), ("πεταχτεί", "πεταχτ"),
    ("πεταμένο", "πεταμεν"), ("πεταμένη", "πεταμεν"),
    ("πεταμένος", "πεταμεν"), ("καλώ", "καλ"), ("καλούσα", "καλ"),
    ("καλείς", "καλ"), ("καλώντας", "καλ"), ("καλούμαι", "καλ"),
    ("καλούμουν", "καλουμ"), ("καλείσαι", "καλεισα"),
    ("καλέστηκα", "καλεστ"), ("καλεστώ", "καλεστ"),
    ("καλεστείς", "καλεστ"), ("καλεστεί", "καλεστ"),
    ("καλεσμένο", "καλεσμεν"), ("καλεσμένη", "καλεσμεν"),
    ("καλεσμένος", "καλεσμεν"), ("φορώ", "φορ"), ("φοράω", "φορ"),
    ("φορούσα", "φορ"), ("φόραγα", "φορ"), ("φόρα", "φορ"),
    ("φορώντας", "φορ"), ("φοριέμαι", "φορ"), ("φοριόμουν", "φορ"),
    ("φοριέσαι", "φορ"), ("φόρεσα", "φορεσ"), ("φορέσω", "φορεσ"),
    ("φόρεσε", "φορεσ"), ("φορέσει", "φορεσ"), ("φορέθηκα", "φορεθ"),
    ("φορεθώ", "φορεθ"), ("φορεθείς", "φορεθ"), ("φορεθεί", "φορεθ"),
    ("φορεμένο", "φορεμεν"), ("φορεμένη", "φορεμεν"),
    ("φορεμένος", "φορεμεν"), ("κρατώ", "κρατ"), ("κρατάω", "κρατ"),
    ("κρατούσα", "κρατ"), ("κράταγα", "κρατ"), ("κράτα", "κρατ"),
    ("κρατώντας", "κρατ"), ("κράτησα", "κρατ"), ("κρατήσω", "κρατ"),
    ("κράτησε", "κρατ"), ("κρατήσει", "κρατ"), ("κρατούμαι", "κρατ"),
    ("κρατιέμαι", "κρατ"), ("κρατούμουν", "κρατουμ"),
    ("κρατιόμουν", "κρατ"), ("κρατείσαι", "κρατεισα"),
    ("κρατήθηκα", "κρατ"), ("κρατηθώ", "κρατ"), ("κρατηθείς", "κρατ"),
    ("κρατηθεί", "κρατ"), ("κρατήσου", "κρατ"), ("κρατημένο", "κρατημεν"),
    ("κρατημένη", "κρατημεν"), ("κρατημένος", "κρατημεν"),
    ("κοιμάμαι", "κοιμ"), ("κοιμόμουν", "κοιμ"), ("κοιμάσαι", "κοιμ"),
    ("κοιμήθηκα", "κοιμ"), ("κοιμηθώ", "κοιμ"), ("κοιμήσου", "κοιμ"),
    ("κοιμηθεί", "κοιμ"), ("κοιμισμένο", "κοιμισμεν"),
    ("κοιμισμένη", "κοιμισμεν"), ("κοιμισμένος", "κοιμισμεν"),
    ("καθεστώτα", "καθεστ"), ("καθεστώτος", "καθεστ"),
    ("καθεστώς", "καθεστ"), ("καθεστώτων", "καθεστ"), ("χουμε", "χουμ"),
    ("χουμ", "χουμ"), ("υποταγεσ", "υποταγ"), ("υποταγ", "υποταγ"),
    ("εμετε", "εμετ"), ("εμετ", "εμετ"), ("αρχοντασ", "αρχοντ"),
    ("αρχοντων", "αρχοντ"),
]


@pytest.mark.parametrize("word,stem", EL_GOLDENS)
def test_greek_stemmer_goldens(word, stem):
    from lucene_kmp_spark.analysis.el import greek_analyzer

    assert greek_analyzer()(word)[0] == [stem]


def test_greek_analyzer_sentences():
    """TestGreekAnalyzer.kt — casing, diaeresis, accents, stop removal."""
    from lucene_kmp_spark.analysis.el import greek_analyzer

    a = greek_analyzer()
    assert a("Μία εξαιρετικά καλή και πλούσια σειρά χαρακτήρων της Ελληνικής γλώσσας")[0] == [
        "μια", "εξαιρετ", "καλ", "πλουσ", "σειρ", "χαρακτηρ", "ελληνικ", "γλωσσ"]
    assert a("Προϊόντα (και)     [πολλαπλές] - ΑΝΑΓΚΕΣ")[0] == [
        "προιοντ", "πολλαπλ", "αναγκ"]
    assert a("ΠΡΟΫΠΟΘΕΣΕΙΣ  Άψογος, ο μεστός και οι άλλοι")[0] == [
        "προυποθεσ", "αψογ", "μεστ", "αλλ"]


def test_registry_routes_el():
    from lucene_kmp_spark.analysis.registry import analyzer_for

    assert analyzer_for("el")("χαρακτήρων")[0] == ["χαρακτηρ"]


# ------------------------------------------------------- lv/ca/sr/hy/ga

# TestLatvianStemmer.kt — complete checkOneTerm goldens (172 pairs)
LV_GOLDENS = [
    ("tēvs", "tēv"), ("tēvi", "tēv"), ("tēva", "tēv"), ("tēvu", "tēv"),
    ("tēvam", "tēv"), ("tēviem", "tēv"), ("tēvu", "tēv"), ("tēvus", "tēv"),
    ("tēvā", "tēv"), ("tēvos", "tēv"), ("tēvs", "tēv"), ("tēvi", "tēv"),
    ("lācis", "lāc"), ("lāči", "lāc"), ("lāča", "lāc"), ("lāču", "lāc"),
    ("lācim", "lāc"), ("lāčiem", "lāc"), ("lāci", "lāc"), ("lāčus", "lāc"),
    ("lācī", "lāc"), ("lāčos", "lāc"), ("lāci", "lāc"), ("lāči", "lāc"),
    ("akmens", "akmen"), ("akmeņi", "akmen"), ("akmens", "akmen"),
    ("akmeņu", "akmen"), ("akmenim", "akmen"), ("akmeņiem", "akmen"),
    ("akmeni", "akmen"), ("akmeņus", "akmen"), ("akmenī", "akmen"),
    ("akmeņos", "akmen"), ("akmens", "akmen"), ("akmeņi", "akmen"),
    ("kurmis", "kurm"), ("kurmji", "kurm"), ("kurmja", "kurm"),
    ("kurmju", "kurm"), ("kurmim", "kurm"), ("kurmjiem", "kurm"),
    ("kurmi", "kurm"), ("kurmjus", "kurm"), ("kurmī", "kurm"),
    ("kurmjos", "kurm"), ("kurmi", "kurm"), ("kurmji", "kurm"),
    ("lietus", "liet"), ("lieti", "liet"), ("lietus", "liet"),
    ("lietu", "liet"), ("lietum", "liet"), ("lietiem", "liet"),
    ("lietu", "liet"), ("lietus", "liet"), ("lietū", "liet"),
    ("lietos", "liet"), ("lietus", "liet"), ("lieti", "liet"),
    ("lapa", "lap"), ("lapas", "lap"), ("lapas", "lap"), ("lapu", "lap"),
    ("lapai", "lap"), ("lapām", "lap"), ("lapu", "lap"), ("lapas", "lap"),
    ("lapā", "lap"), ("lapās", "lap"), ("lapa", "lap"), ("lapas", "lap"),
    ("puika", "puik"), ("puikas", "puik"), ("puikas", "puik"),
    ("puiku", "puik"), ("puikam", "puik"), ("puikām", "puik"),
    ("puiku", "puik"), ("puikas", "puik"), ("puikā", "puik"),
    ("puikās", "puik"), ("puika", "puik"), ("puikas", "puik"),
    ("egle", "egl"), ("egles", "egl"), ("egles", "egl"), ("egļu", "egl"),
    ("eglei", "egl"), ("eglēm", "egl"), ("egli", "egl"), ("egles", "egl"),
    ("eglē", "egl"), ("eglēs", "egl"), ("egle", "egl"), ("egles", "egl"),
    ("govs", "gov"), ("govis", "gov"), ("govs", "gov"), ("govju", "gov"),
    ("govij", "gov"), ("govīm", "gov"), ("govi ", "gov"), ("govis", "gov"),
    ("govi ", "gov"), ("govīm", "gov"), ("govī", "gov"), ("govīs", "gov"),
    ("govs", "gov"), ("govis", "gov"), ("zils", "zil"), ("zilais", "zil"),
    ("zili", "zil"), ("zilie", "zil"), ("zila", "zil"), ("zilā", "zil"),
    ("zilas", "zil"), ("zilās", "zil"), ("zila", "zil"), ("zilā", "zil"),
    ("zilu", "zil"), ("zilo", "zil"), ("zilas", "zil"), ("zilās", "zil"),
    ("zilu", "zil"), ("zilo", "zil"), ("zilam", "zil"), ("zilajam", "zil"),
    ("ziliem", "zil"), ("zilajiem", "zil"), ("zilai", "zil"),
    ("zilajai", "zil"), ("zilām", "zil"), ("zilajām", "zil"),
    ("zilu", "zil"), ("zilo", "zil"), ("zilus", "zil"), ("zilos", "zil"),
    ("zilu", "zil"), ("zilo", "zil"), ("zilās", "zil"), ("zilās", "zil"),
    ("zilā", "zil"), ("zilajā", "zil"), ("zilos", "zil"),
    ("zilajos", "zil"), ("zilā", "zil"), ("zilajā", "zil"),
    ("zilās", "zil"), ("zilajās", "zil"), ("zilais", "zil"),
    ("zilie", "zil"), ("zilā", "zil"), ("zilās", "zil"),
    ("krāsns", "krāsn"), ("krāšņu", "krāsn"), ("zvaigzne", "zvaigzn"),
    ("zvaigžņu", "zvaigzn"), ("kāpslis", "kāpsl"), ("kāpšļu", "kāpsl"),
    ("zizlis", "zizl"), ("zižļu", "zizl"), ("vilnis", "viln"),
    ("viļņu", "viln"), ("lelle", "lell"), ("leļļu", "lell"),
    ("pinne", "pinn"), ("piņņu", "pinn"), ("rīkste", "rīkst"),
    ("rīkšu", "rīkst"), ("usa", "usa"), ("60ms", "60ms"),
]


@pytest.mark.parametrize("word,stem", LV_GOLDENS)
def test_latvian_stemmer_goldens(word, stem):
    from lucene_kmp_spark.analysis.lv import latvian_analyzer

    assert latvian_analyzer()(word)[0] == [stem]


def test_latvian_analyzer_basics():
    from lucene_kmp_spark.analysis.lv import latvian_analyzer

    a = latvian_analyzer()
    assert a("tirgiem")[0] == ["tirg"]
    assert a("un")[0] == []
    ex = latvian_analyzer(stem_exclusions=("tirgiem",))
    assert ex("tirgiem")[0] == ["tirgiem"]
    assert ex("tirgus")[0] == ["tirg"]


def test_catalan_analyzer_goldens():
    """TestCatalanAnalyzer.kt — stemming, contractions, stop, exclusion."""
    from lucene_kmp_spark.analysis.ca import catalan_analyzer

    a = catalan_analyzer()
    assert a("llengües")[0] == ["llengu"]
    assert a("llengua")[0] == ["llengu"]
    assert a("un")[0] == []
    assert a("Diccionari de l'Institut d'Estudis Catalans")[0] == [
        "diccion", "inst", "estud", "catalan"]
    ex = catalan_analyzer(stem_exclusions=("llengües",))
    assert ex("llengües")[0] == ["llengües"]
    assert ex("llengua")[0] == ["llengu"]


def test_serbian_analyzer_goldens():
    """TestSerbianAnalyzer.kt — stem + bald-latin normalization, stop, excl."""
    from lucene_kmp_spark.analysis.sr import serbian_analyzer, serbian_normalize

    a = serbian_analyzer()
    assert a("abdiciraće")[0] == ["abdicirac"]
    assert a("decimalnim")[0] == ["decimaln"]
    assert a("đubrište")[0] == ["djubrist"]
    assert a("ili")[0] == []
    ex = serbian_analyzer(stem_exclusions=("decimalnim",))
    assert ex("decimalnim")[0] == ["decimalnim"]
    assert ex("decimalni")[0] == ["decimaln"]
    # cyrillic -> bald latin (TestSerbianNormalizationFilter.kt)
    assert serbian_normalize("абдицираће") == "abdicirace"
    assert serbian_normalize("љубав") == "ljubav"


def test_armenian_analyzer_goldens():
    """TestArmenianAnalyzer.kt — stemming, stop, exclusion."""
    from lucene_kmp_spark.analysis.hy import armenian_analyzer

    a = armenian_analyzer()
    assert a("արծիվ")[0] == ["արծ"]
    assert a("արծիվներ")[0] == ["արծ"]
    assert a("է")[0] == []
    ex = armenian_analyzer(stem_exclusions=("արծիվներ",))
    assert ex("արծիվներ")[0] == ["արծիվներ"]
    assert ex("արծիվ")[0] == ["արծ"]


def test_irish_analyzer_goldens():
    """TestIrishAnalyzer.kt — stemming, elision, hyphenation stop, excl."""
    from lucene_kmp_spark.analysis.ga import irish_analyzer

    a = irish_analyzer()
    assert a("siopadóireacht")[0] == ["siopadóir"]
    assert a("síceapatacha")[0] == ["síceapaite"]
    assert a("le")[0] == []
    assert a("b'fhearr m'athair")[0] == ["fearr", "athair"]
    assert a("n-athair")[0] == ["athair"]
    ex = irish_analyzer(stem_exclusions=("feirmeoireacht",))
    assert ex("feirmeoireacht")[0] == ["feirmeoireacht"]
    assert ex("siopadóireacht")[0] == ["siopadóir"]


def test_registry_routes_lv_ca_sr_hy_ga():
    from lucene_kmp_spark.analysis.registry import analyzer_for

    assert analyzer_for("lv")("tirgiem")[0] == ["tirg"]
    assert analyzer_for("ca")("llengües")[0] == ["llengu"]
    assert analyzer_for("sr")("đubrište")[0] == ["djubrist"]
    assert analyzer_for("hy")("արծիվներ")[0] == ["արծ"]
    assert analyzer_for("ga")("siopadóireacht")[0] == ["siopadóir"]


# ---------------------------------------------------------------- lt/fi/et

def test_lithuanian_analyzer_goldens():
    """TestLithuanianAnalyzer.kt — stop + exclusion, plus spec-derived."""
    from lucene_kmp_spark.analysis.lt import (
        lithuanian_analyzer, lithuanian_snowball_stem)

    a = lithuanian_analyzer()
    assert a("man")[0] == []
    ex = lithuanian_analyzer(stem_exclusions=("vaikų",))
    assert ex("vaikų")[0] == ["vaikų"]
    # hand-derived from the published snowball lithuanian algorithm
    assert lithuanian_snowball_stem("vaikų") == "vaik"
    assert lithuanian_snowball_stem("vaikas") == "vaik"
    assert lithuanian_snowball_stem("knygos") == "knyg"
    assert lithuanian_snowball_stem("namuose") == "nam"
    # conflict fix: aitės -> aitė kept as a unit
    assert lithuanian_snowball_stem("mergaitės") == "mergait"


def test_finnish_analyzer_goldens():
    """TestFinnishAnalyzer.kt — stemming + exclusion."""
    from lucene_kmp_spark.analysis.fi import (
        finnish_analyzer, finnish_snowball_stem)

    a = finnish_analyzer()
    assert a("edeltäjiinsä")[0] == ["edeltäj"]
    assert a("edeltäjistään")[0] == ["edeltäj"]
    assert a("olla")[0] == []  # stopword
    ex = finnish_analyzer(stem_exclusions=("edeltäjistään",))
    assert ex("edeltäjiinsä")[0] == ["edeltäj"]
    assert ex("edeltäjistään")[0] == ["edeltäjistään"]
    # hand-derived from the published snowball finnish algorithm
    assert finnish_snowball_stem("taloissa") == "talo"
    assert finnish_snowball_stem("kirjat") == "kirj"
    assert finnish_snowball_stem("nopeasti") == "nopeast"
    assert finnish_snowball_stem("kontti") == "kont"


# TestEstonianAnalyzer.kt — complete goldens
ET_GOLDENS = [
    ("teadaolevalt", "teadaole"), ("teadaolevaid", "teadaole"),
    ("teadaolevatest", "teadaole"), ("teadaolevail", "teadaole"),
    ("teadaolevatele", "teadaole"), ("teadaolevatel", "teadaole"),
    ("teadaolevateks", "teadaole"), ("teadaolevate", "teadaole"),
    ("teadaolevaks", "teadaole"), ("teadaoleval", "teadaole"),
    ("teadaolevates", "teadaole"), ("teadaolevat", "teadaole"),
    ("teadaolevast", "teadaole"), ("teadaoleva", "teadaole"),
    ("teadaolevais", "teadaole"), ("teadaolevas", "teadaole"),
    ("teadaolevad", "teadaole"), ("teadaolevale", "teadaole"),
    ("teadaolevatesse", "teadaole"),
]


@pytest.mark.parametrize("word,stem", ET_GOLDENS)
def test_estonian_stemmer_goldens(word, stem):
    from lucene_kmp_spark.analysis.et import estonian_analyzer

    assert estonian_analyzer()(word)[0] == [stem]


def test_estonian_verb_exception_and_stop():
    from lucene_kmp_spark.analysis.et import (
        estonian_analyzer, estonian_snowball_stem)

    # whole-word verb exceptions short-circuit all other steps
    assert estonian_snowball_stem("joodakse") == "joo"
    assert estonian_snowball_stem("nägid") == "nägi"
    a = estonian_analyzer()
    assert a("alla")[0] == []  # stopword


def test_registry_routes_lt_fi_et():
    from lucene_kmp_spark.analysis.registry import analyzer_for

    assert analyzer_for("lt")("knygos")[0] == ["knyg"]
    assert analyzer_for("fi")("taloissa")[0] == ["talo"]
    assert analyzer_for("et")("teadaolevalt")[0] == ["teadaole"]


# ---------------------------------------------------------------- gl/eu

def test_galician_analyzer_goldens():
    """TestGalicianAnalyzer.kt + TestGalicianMinimalStemFilter.kt goldens."""
    from lucene_kmp_spark.analysis.gl import (
        galician_analyzer, galician_minimal_stem)

    a = galician_analyzer()
    assert a("correspondente")[0] == ["correspond"]
    assert a("corresponderá")[0] == ["correspond"]
    assert a("e")[0] == []  # stopword
    ex = galician_analyzer(stem_exclusions=("correspondente",))
    assert ex("correspondente")[0] == ["correspondente"]
    assert ex("corresponderá")[0] == ["correspond"]
    # minimal (Plural step only)
    assert galician_minimal_stem("elefantes") == "elefante"
    assert galician_minimal_stem("elefante") == "elefante"
    assert galician_minimal_stem("kalóres") == "kalór"
    assert galician_minimal_stem("kalór") == "kalór"
    assert galician_minimal_stem("mas") == "mas"          # exception list
    assert galician_minimal_stem("barcelonês") == "barcelonês"


def test_basque_analyzer_goldens():
    """TestBasqueAnalyzer.kt — stemming, stop, exclusion."""
    from lucene_kmp_spark.analysis.eu import basque_analyzer

    a = basque_analyzer()
    assert a("zaldi")[0] == ["zaldi"]
    assert a("zaldiak")[0] == ["zaldi"]
    assert a("mendiari")[0] == ["mendi"]
    assert a("izan")[0] == []  # stopword
    ex = basque_analyzer(stem_exclusions=("zaldiak",))
    assert ex("zaldiak")[0] == ["zaldiak"]
    assert ex("mendiari")[0] == ["mendi"]


def test_registry_routes_gl_eu():
    from lucene_kmp_spark.analysis.registry import analyzer_for

    assert analyzer_for("gl")("correspondente")[0] == ["correspond"]
    assert analyzer_for("eu")("zaldiak")[0] == ["zaldi"]


# ---------------------------------------------------------------- br

# TestBrazilianAnalyzer.kt — complete check() goldens (86 pairs)
BR_GOLDENS = [
    ("boa", "boa"), ("boainain", "boainain"), ("boas", "boas"),
    ("bôas", "boas"), ("boassu", "boassu"), ("boataria", "boat"),
    ("boate", "boat"), ("boates", "boat"), ("boatos", "boat"),
    ("bob", "bob"), ("boba", "bob"), ("bobagem", "bobag"),
    ("bobagens", "bobagens"), ("bobalhões", "bobalho"), ("bobear", "bob"),
    ("bobeira", "bobeir"), ("bobinho", "bobinh"), ("bobinhos", "bobinh"),
    ("bobo", "bob"), ("bobs", "bobs"), ("boca", "boc"), ("bocadas", "boc"),
    ("bocadinho", "bocadinh"), ("bocado", "boc"), ("bocaiúva", "bocaiuv"),
    ("boçal", "bocal"), ("bocarra", "bocarr"), ("bocas", "boc"),
    ("bode", "bod"), ("bodoque", "bodoqu"), ("body", "body"),
    ("boeing", "boeing"), ("boem", "boem"), ("boemia", "boem"),
    ("boêmio", "boemi"), ("bogotá", "bogot"), ("boi", "boi"),
    ("bóia", "boi"), ("boiando", "boi"), ("quiabo", "quiab"),
    ("quicaram", "quic"), ("quickly", "quickly"), ("quieto", "quiet"),
    ("quietos", "quiet"), ("quilate", "quilat"), ("quilates", "quilat"),
    ("quilinhos", "quilinh"), ("quilo", "quil"), ("quilombo", "quilomb"),
    ("quilométricas", "quilometr"), ("quilométricos", "quilometr"),
    ("quilômetro", "quilometr"), ("quilômetros", "quilometr"),
    ("quilos", "quil"), ("quimica", "quimic"), ("quilos", "quil"),
    ("quimica", "quimic"), ("quimicas", "quimic"), ("quimico", "quimic"),
    ("quimicos", "quimic"), ("quimioterapia", "quimioterap"),
    ("quimioterápicos", "quimioterap"), ("quimono", "quimon"),
    ("quincas", "quinc"), ("quinhão", "quinha"),
    ("quinhentos", "quinhent"), ("quinn", "quinn"), ("quino", "quin"),
    ("quinta", "quint"), ("quintal", "quintal"), ("quintana", "quintan"),
    ("quintanilha", "quintanilh"), ("quintão", "quinta"),
    ("quintessência", "quintessente"), ("quintino", "quintin"),
    ("quinto", "quint"), ("quintos", "quint"),
    ("quintuplicou", "quintuplic"), ("quinze", "quinz"),
    ("quinzena", "quinzen"), ("quiosque", "quiosqu"), ("Brasil", "brasil"),
    ("Brasília", "brasil"), ("quimio5terápicos", "quimio5terapicos"),
    ("áá", "áá"), ("ááá", "aaa"),
]


@pytest.mark.parametrize("word,stem", BR_GOLDENS)
def test_brazilian_stemmer_goldens(word, stem):
    from lucene_kmp_spark.analysis.br import brazilian_analyzer

    assert brazilian_analyzer()(word)[0] == [stem]


def test_brazilian_exclusion_and_registry():
    from lucene_kmp_spark.analysis.br import brazilian_analyzer
    from lucene_kmp_spark.analysis.registry import analyzer_for

    ex = brazilian_analyzer(stem_exclusions=("quintessência",))
    assert ex("quintessência")[0] == ["quintessência"]
    assert analyzer_for("pt-br")("quintessência")[0] == ["quintessente"]


# ---------------------------------------------------------------- th

def test_thai_analyzer_goldens():
    """TestThaiAnalyzer.kt — dictionary segmentation, stops, digit fold."""
    from lucene_kmp_spark.analysis.th import thai_analyzer

    empty = thai_analyzer(stop_words=())
    assert empty("การที่ได้ต้องแสดงว่างานดี")[0] == [
        "การ", "ที่", "ได้", "ต้อง", "แสดง", "ว่า", "งาน", "ดี"]
    assert empty("บริษัทชื่อ XY&Z - คุยกับ xyz@demo.com")[0] == [
        "บริษัท", "ชื่อ", "xy", "z", "คุย", "กับ", "xyz", "demo.com"]
    assert empty("")[0] == []
    # default stop set removes function words but keeps position holes
    a = thai_analyzer()
    terms, positions, _ = a("การที่ได้ต้องแสดงว่างานดี")
    assert terms == ["แสดง", "งาน", "ดี"]
    assert positions == [4, 6, 7]       # posIncr 5, 2, 1 in the reference
    # thai digits fold to latin
    assert a("๑๒๓๔")[0] == ["1234"]
    # english stopword makes a position hole inside mixed text
    en = thai_analyzer(stop_words=("the",))
    terms, positions, _ = en("การที่ได้ต้อง the แสดงว่างานดี")
    assert terms == ["การ", "ที่", "ได้", "ต้อง", "แสดง", "ว่า", "งาน", "ดี"]
    assert positions == [0, 1, 2, 3, 5, 6, 7, 8]


def test_registry_routes_th():
    from lucene_kmp_spark.analysis.registry import analyzer_for

    assert analyzer_for("th")("การที่ได้ต้องแสดงว่างานดี")[0] == [
        "แสดง", "งาน", "ดี"]


# ---------------------------------------------------------------- tr

def test_turkish_analyzer_goldens():
    """TestTurkishAnalyzer.kt — stemming, apostrophe, stop, exclusion."""
    from lucene_kmp_spark.analysis.tr import turkish_analyzer

    a = turkish_analyzer()
    assert a("ağacı")[0] == ["ağaç"]
    assert a("ağaç")[0] == ["ağaç"]
    assert a("dolayı")[0] == []                  # stopword
    assert a("Kıbrıs'ta")[0] == ["kıbrıs"]       # apostrophe strip
    assert a("Van Gölü'ne")[0] == ["van", "göl"]
    ex = turkish_analyzer(stem_exclusions=("ağacı",))
    assert ex("ağacı")[0] == ["ağacı"]
    assert ex("ağaç")[0] == ["ağaç"]


def test_turkish_lowercase_filter():
    """TestTurkishLowerCaseFilter.kt — dotted/dotless I handling."""
    from lucene_kmp_spark.analysis.tr import turkish_lowercase

    assert turkish_lowercase("İSTANBUL") == "istanbul"
    assert turkish_lowercase("ISPARTA") == "ısparta"
    assert turkish_lowercase("I") == "ı"
    assert turkish_lowercase("İ") == "i"
    # I + combining dot above composes to plain i
    assert turkish_lowercase("İSTANBUL") == "istanbul"


def test_turkish_snowball_paths():
    """Hand-derived from the snowball turkish algorithm: harmony suffix
    stripping, final devoicing, d/g vowel append, reserved words."""
    from lucene_kmp_spark.analysis.tr import turkish_snowball_stem as s

    assert s("kitapları") == "kitap"
    assert s("kitabı") == "kitap"        # b -> p devoicing
    assert s("evlerinde") == "ev"
    assert s("çocuklarımızın") == "çocuk"
    assert s("güzelliği") == "güzellik"  # ğ -> k devoicing
    assert s("arabalarla") == "araba"
    assert s("ad") == "ad"               # reserved word
    assert s("soyad") == "soyad"
    assert s("tek") == "tek"             # single syllable: untouched


def test_registry_routes_tr():
    from lucene_kmp_spark.analysis.registry import analyzer_for

    assert analyzer_for("tr")("ağacı")[0] == ["ağaç"]


# ---------------------------------------------------------------- ta

def test_tamil_analyzer_goldens():
    """TestTamilAnalyzer (BibleTamil base) — stemming, digits, case, excl."""
    from lucene_kmp_spark.analysis.ta import tamil_analyzer

    a = tamil_analyzer()
    assert a("நண்பன்")[0] == ["நண்"]
    assert a("நண்பர்கள்")[0] == ["நண்"]
    assert a("௧௨௩௪")[0] == ["1234"]
    assert a("FIFA")[0] == ["fifa"]
    ex = tamil_analyzer(stem_exclusions=("நண்பர்கள்",))
    assert ex("நண்பர்கள்")[0] == ["நண்பர்கள்"]


def test_tamil_snowball_paths():
    """Hand-derived from the snowball tamil algorithm."""
    from lucene_kmp_spark.analysis.ta import tamil_snowball_stem as s

    assert s("புத்தகங்கள்") == "புத்தகம்"   # plural ங்+கள் -> ம்
    assert s("வீடுகள்") == "வீடு"             # plural கள் removal
    assert s("படித்தேன்") == "படி"            # tense ேன் -> ் + fixups
    assert s("நண்") == "நண்"                  # <= 4 chars untouched


def test_registry_routes_ta():
    from lucene_kmp_spark.analysis.registry import analyzer_for

    assert analyzer_for("ta")("நண்பர்கள்")[0] == ["நண்"]


# ----------------------------------------- extra module: indic family

def test_punjabi_analyzer_goldens():
    """TestPunjabiAnalyzer.kt goldens."""
    from lucene_kmp_spark.analysis.pa import punjabi_analyzer

    a = punjabi_analyzer()
    assert a("ਭੱਜਣਾ")[0] == ["ਭੱਜ"]
    assert a("ਪੜਾਉਂਦਾ")[0] == ["ਪੜਾ"]
    assert a("੧੨੩੪")[0] == ["1234"]
    assert a("ਇਹ ਇੱਕ ਉਦਾਹਰਣ ਵਾਕ ਹੈ")[0] == ["ਉਦਾਹਰਣ", "ਵਾਕ"]
    ex = punjabi_analyzer(stem_exclusions=("ਭੱਜਣਾ",))
    assert ex("ਭੱਜਣਾ")[0] == ["ਭੱਜਣਾ"]


def test_marathi_analyzer_goldens():
    """TestMarathiAnalyzer.kt goldens."""
    from lucene_kmp_spark.analysis.mr import marathi_analyzer

    a = marathi_analyzer()
    assert a("पुस्तके")[0] == ["पुसतक"]
    assert a("मुली")[0] == ["मुल"]
    assert a("१२३४")[0] == ["1234"]
    ex = marathi_analyzer(stem_exclusions=("मुली",))
    assert ex("मुली")[0] == ["मुली"]


def test_gujarati_analyzer_goldens():
    """TestGujaratiAnalyzer.kt goldens."""
    from lucene_kmp_spark.analysis.gu import gujarati_analyzer

    a = gujarati_analyzer()
    assert a("ગુજરાતી")[0] == ["ગુજરાતી"]
    assert a("ગુજરાતીઓ")[0] == ["ગુજરાતી"]
    assert a("૧૨૩૪")[0] == ["1234"]
    ex = gujarati_analyzer(stem_exclusions=("ગુજરાતીઓ",))
    assert ex("ગુજરાતીઓ")[0] == ["ગુજરાતીઓ"]


def test_odia_analyzer_goldens():
    """TestOdiaAnalyzer.kt goldens."""
    from lucene_kmp_spark.analysis.or_ import odia_analyzer

    a = odia_analyzer()
    assert a("ଘରକୁ")[0] == ["ଘର"]
    assert a("ପିଲାମାନଙ୍କର")[0] == ["ପିଲା"]
    assert a("୧୨୩୪")[0] == ["1234"]
    assert a("ଏହି ଓ ଘରକୁ")[0] == ["ଘର"]
    assert a("ରାମ ଓ ସୀତା ଆମକୁ ଆଶୀର୍ବାଦ ଦେଇଛନ୍ତି")[0] == [
        "ରାମ", "ସୀତା", "ଆମ", "ଆଶୀର୍ବାଦ"]
    assert a("ଏହା ପାଇଁ ଦେଇଛନ୍ତି")[0] == []
    ex = odia_analyzer(stem_exclusions=("ଘରକୁ",))
    assert ex("ଘରକୁ")[0] == ["ଘରକୁ"]


def test_malayalam_analyzer_goldens():
    """TestMalayalamAnalyzer.kt + normalization filter goldens."""
    from lucene_kmp_spark.analysis.indic import indic_normalize
    from lucene_kmp_spark.analysis.ml import (
        malayalam_analyzer, malayalam_normalize)

    a = malayalam_analyzer()
    assert a("പുസ്തകങ്ങൾ")[0] == ["പുസ്തക"]
    assert a("രാജ്യത്തിൽ")[0] == ["രാജ്യ"]
    assert a("൧൨൩൪")[0] == ["1234"]
    assert a("ഈ പുസ്തകങ്ങൾ ആണ്")[0] == ["പുസ്തക"]
    assert a("കുട്ടികളുടെ")[0] == ["കുട്ടി"]
    # chillu composition happens in the indic layer before the ml layer
    assert malayalam_normalize(indic_normalize("അവന്‍")) == "അവൻ"
    assert malayalam_normalize("മ‌ലയാളം") == "മലയാളം"  # zwnj removed
    ex = malayalam_analyzer(stem_exclusions=("പുസ്തകങ്ങൾ",))
    assert ex("പുസ്തകങ്ങൾ")[0] == ["പുസ്തകങ്ങൾ"]


def test_kannada_analyzer_goldens():
    """TestKannadaAnalyzer.kt goldens."""
    from lucene_kmp_spark.analysis.kn import kannada_analyzer

    a = kannada_analyzer()
    assert a("ಮನೆಗೆ")[0] == ["ಮನೆ"]
    assert a("ಪುಸ್ತಕಗಳನ್ನು")[0] == ["ಪುಸ್ತಕ"]
    assert a("ಕನ್ನಡದಲ್ಲಿ")[0] == ["ಕನ್ನಡ"]
    assert a("೧೨೩೪")[0] == ["1234"]
    assert a("ಈ ಮತ್ತು ಮನೆಗೆ")[0] == ["ಮನೆ"]
    ex = kannada_analyzer(stem_exclusions=("ಮನೆಗೆ",))
    assert ex("ಮನೆಗೆ")[0] == ["ಮನೆಗೆ"]


def test_assamese_analyzer_goldens():
    """TestAssameseAnalyzer.kt goldens."""
    from lucene_kmp_spark.analysis.as_ import assamese_analyzer

    a = assamese_analyzer()
    assert a("ঘৰলৈ")[0] == ["ঘৰ"]
    assert a("মানুহবোৰৰ")[0] == ["মানুহ"]
    assert a("কিতাপখনত")[0] == ["কিতাপ"]
    assert a("১২৩৪")[0] == ["1234"]
    assert a("এই আৰু ঘৰলৈ")[0] == ["ঘৰ"]
    ex = assamese_analyzer(stem_exclusions=("ঘৰলৈ",))
    assert ex("ঘৰলৈ")[0] == ["ঘৰলৈ"]


def test_sinhala_analyzer_goldens():
    """TestSinhalaAnalyzer.kt goldens."""
    from lucene_kmp_spark.analysis.si import sinhala_analyzer

    a = sinhala_analyzer()
    assert a("ගෙදරට")[0] == ["ගෙදර"]
    assert a("පොත්වලට")[0] == ["පොත්"]
    assert a("කතාවෙන්")[0] == ["කතා"]
    assert a("෦෧෨෩")[0] == ["0123"]
    assert a("මේ සහ ගෙදරට")[0] == ["ගෙදර"]
    ex = sinhala_analyzer(stem_exclusions=("ගෙදරට",))
    assert ex("ගෙදරට")[0] == ["ගෙදරට"]


def test_registry_routes_extra_indic():
    from lucene_kmp_spark.analysis.registry import analyzer_for

    assert analyzer_for("pa")("ਭੱਜਣਾ")[0] == ["ਭੱਜ"]
    assert analyzer_for("mr")("पुस्तके")[0] == ["पुसतक"]
    assert analyzer_for("gu")("ગુજરાતીઓ")[0] == ["ગુજરાતી"]
    assert analyzer_for("or")("ଘରକୁ")[0] == ["ଘର"]
    assert analyzer_for("ml")("പുസ്തകങ്ങൾ")[0] == ["പുസ്തക"]
    assert analyzer_for("kn")("ಮನೆಗೆ")[0] == ["ಮನೆ"]
    assert analyzer_for("as")("ঘৰলৈ")[0] == ["ঘৰ"]
    assert analyzer_for("si")("ගෙදරට")[0] == ["ගෙදර"]


# ------------------------------------- extra module: SEA family

def test_malay_analyzer_goldens():
    """TestMalayAnalyzer.kt goldens."""
    from lucene_kmp_spark.analysis.ms import malay_analyzer

    a = malay_analyzer()
    assert a("Membaca")[0] == ["baca"]
    assert a("Dituliskan")[0] == ["tulis"]
    assert a("dan yang kepada")[0] == []
    assert a("١٢٣٤")[0] == ["1234"]
    ex = malay_analyzer(stem_exclusions=("membaca",))
    assert ex("Membaca")[0] == ["membaca"]


def test_javanese_analyzer_goldens():
    """TestJavaneseAnalyzer.kt goldens."""
    from lucene_kmp_spark.analysis.jv import javanese_analyzer

    a = javanese_analyzer()
    assert a("Ditulisake")[0] == ["tulis"]
    assert a("Buku")[0] == ["buku"]
    assert a("aku lan dheweke ditulisake buku")[0] == ["tulis", "buku"]
    assert a("1234")[0] == ["1234"]
    ex = javanese_analyzer(stem_exclusions=("ditulisake",))
    assert ex("Ditulisake")[0] == ["ditulisake"]


def test_sundanese_analyzer_goldens():
    """TestSundaneseAnalyzer.kt goldens."""
    from lucene_kmp_spark.analysis.su import sundanese_analyzer

    a = sundanese_analyzer()
    assert a("Dibacakeun")[0] == ["baca"]
    assert a("Buku")[0] == ["buku"]
    assert a("abdi jeung anjeunna dibacakeun buku")[0] == ["baca", "buku"]
    assert a("١٢٣٤")[0] == ["1234"]
    ex = sundanese_analyzer(stem_exclusions=("dibacakeun",))
    assert ex("Dibacakeun")[0] == ["dibacakeun"]


def test_tagalog_analyzer_goldens():
    """TestTagalogAnalyzer.kt goldens + stemmer paths."""
    from lucene_kmp_spark.analysis.tl import tagalog_analyzer, tagalog_stem

    a = tagalog_analyzer()
    assert a("Pilipino")[0] == ["pilipino"]
    assert a("Tagalog")[0] == ["tagalog"]
    assert a("1234")[0] == ["1234"]
    # affix paths from the stemmer: prefix, infix, reduplication, suffix
    assert tagalog_stem("nagluto") == "luto"
    assert tagalog_stem("sumulat") == "sulat"
    assert tagalog_stem("araw-araw") == "araw"


def test_cebuano_analyzer_goldens():
    """TestCebuanoAnalyzer.kt goldens."""
    from lucene_kmp_spark.analysis.ceb import cebuano_analyzer

    a = cebuano_analyzer()
    assert a("Mopalit")[0] == ["palit"]
    assert a("Gipalitan")[0] == ["palit"]
    assert a("Ang mga tawo sa Cebu ug Pransiya")[0] == ["tawo", "cebu"]
    assert a("१२३४")[0] == ["1234"]
    ex = cebuano_analyzer(stem_exclusions=("mopalit",))
    assert ex("Mopalit")[0] == ["mopalit"]


def test_vietnamese_analyzer_goldens():
    """TestVietnameseAnalyzer.kt goldens — bigram compounds, URLs, folds."""
    from lucene_kmp_spark.analysis.vi import (
        vietnamese_analyzer, vietnamese_tokenize)

    assert vietnamese_tokenize("công nghệ thông tin Việt Nam") == [
        "công nghệ", "thông tin", "việt nam"]
    a = vietnamese_analyzer()
    assert a("công nghệ thông tin Việt Nam")[0] == [
        "cong nghe", "thong tin", "viet nam"]
    assert a("Công nghệ thông tin Việt Nam https://duydo.me")[0] == [
        "cong nghe", "thong tin", "viet nam", "https", "duydo", "me"]
    assert a("điện thoại Việt")[0] == ["dien thoai", "viet"]


def test_registry_routes_sea():
    from lucene_kmp_spark.analysis.registry import analyzer_for

    assert analyzer_for("ms")("Membaca")[0] == ["baca"]
    assert analyzer_for("jv")("Ditulisake")[0] == ["tulis"]
    assert analyzer_for("su")("Dibacakeun")[0] == ["baca"]
    assert analyzer_for("tl")("Pilipino")[0] == ["pilipino"]
    assert analyzer_for("ceb")("Mopalit")[0] == ["palit"]
    assert analyzer_for("vi")("điện thoại Việt")[0] == ["dien thoai", "viet"]


# --------------------------------- extra module: km/my/ha/yo/ig

def test_hausa_analyzer_goldens():
    """TestHausaAnalyzer.kt goldens."""
    from lucene_kmp_spark.analysis.ha import hausa_analyzer

    a = hausa_analyzer()
    assert a("Nakarantawa")[0] == ["karanta"]
    assert a("ƙasa")[0] == ["kasa"]
    assert a("ni da su nakarantawa")[0] == ["karanta"]
    assert a("١٢٣٤")[0] == ["1234"]
    ex = hausa_analyzer(stem_exclusions=("nakarantawa",))
    assert ex("Nakarantawa")[0] == ["nakarantawa"]


def test_yoruba_analyzer_goldens():
    """TestYorubaAnalyzer.kt goldens."""
    from lucene_kmp_spark.analysis.yo import yoruba_analyzer

    a = yoruba_analyzer()
    assert a("Yorùbá")[0] == ["yoruba"]
    assert a("ìkọwé")[0] == ["kowe"]
    assert a("àwọn ọmọ ní ilé ìkọwé")[0] == ["omo", "ile", "kowe"]
    assert a("١٢٣٤")[0] == ["1234"]


def test_igbo_analyzer_goldens():
    """TestIgboAnalyzer.kt goldens."""
    from lucene_kmp_spark.analysis.ig import igbo_analyzer

    a = igbo_analyzer()
    assert a("Ikwughi")[0] == ["kwu"]
    assert a("Akwụkwọ")[0] == ["akwukwo"]
    assert a("anyi na ha ikwughi akwukwo")[0] == ["kwu", "akwukwo"]
    assert a("١٢٣٤")[0] == ["1234"]
    ex = igbo_analyzer(stem_exclusions=("ikwughi",))
    assert ex("Ikwughi")[0] == ["ikwughi"]


def test_khmer_analyzer_goldens():
    """TestKhmerAnalyzer.kt goldens — reorder, stopwords, numbers."""
    from lucene_kmp_spark.analysis.km import khmer_analyzer

    a = khmer_analyzer()
    assert a("ខ្ញុំ")[0] == ["ខ្ញុំ"]
    assert a("សើុ")[0] == ["ស៊ើ"]       # reorder + triisap upshift
    assert a("ប្តី")[0] == ["ប្ដី"]       # coeng da -> ta replacement
    st = khmer_analyzer(enable_stopwords=True)
    assert st("ខ្ញុំ")[0] == []
    assert st("ទេ")[0] == []
    num = khmer_analyzer(khmer_number=True)
    assert num("១២៣៤៥")[0] == ["12345"]
    assert num("១២៣.៤៥")[0] == ["123", "45"]
    both = khmer_analyzer(enable_stopwords=True, khmer_number=True)
    assert both("ខ្ញុំ ១២៣៤៥")[0] == ["12345"]
    assert num("ស៉")[0] == ["ស៉"]


def test_burmese_analyzer_goldens():
    """TestBurmeseAnalyzer.kt goldens — segmentation, particles, digits."""
    from lucene_kmp_spark.analysis.my import (
        burmese_analyzer, burmese_normalize, burmese_stem)

    a = burmese_analyzer()
    assert a("မြန်မာစာ")[0] == ["မြန်", "မာ", "စာ"]
    assert a("သူသည်စာအုပ်တွေဖတ်သည်")[0] == ["စာ", "အုပ်", "ဖတ်"]
    assert a("၁၂၃၄")[0] == ["1234"]
    assert a("သူတို့က မြန်မာစာကို ဖတ်သည်")[0] == ["မြန်", "မာ", "စာ", "ဖတ်"]
    ex = burmese_analyzer(stop_words=(), stem_exclusions=("စာအုပ်တွေ",))
    assert ex("စာအုပ်တွေ")[0] == ["စာ", "အုပ်", "တွေ"]
    # filter-level goldens
    assert burmese_normalize("၁၂​၃၄") == "1234"
    assert burmese_stem("စာအုပ်တွေ") == "စာအုပ်"
    assert burmese_stem("လူများ") == "လူ"
    assert burmese_stem("မြန်မာတို့") == "မြန်မာ"


def test_registry_routes_km_my_ha_yo_ig():
    from lucene_kmp_spark.analysis.registry import analyzer_for

    assert analyzer_for("ha")("Nakarantawa")[0] == ["karanta"]
    assert analyzer_for("yo")("ìkọwé")[0] == ["kowe"]
    assert analyzer_for("ig")("Ikwughi")[0] == ["kwu"]
    assert analyzer_for("km")("ប្តី")[0] == ["ប្ដី"]
    assert analyzer_for("my")("မြန်မာစာ")[0] == ["မြန်", "မာ", "စာ"]


# --------------------------------- extra module: be/ht/ilo/ti/uz

def test_belarusian_analyzer_goldens():
    """TestBelarusianAnalyzer.kt goldens — stem, apostrophe fold, digits."""
    from lucene_kmp_spark.analysis.be import belarusian_analyzer

    a = belarusian_analyzer()
    assert a("Мінску")[0] == ["мінск"]
    assert a("пʼе")[0] == ["п'е"]
    assert a("١٢٣٤")[0] == ["1234"]
    assert a("я і ты ў мінску")[0] == ["мінск"]
    ex = belarusian_analyzer(stem_exclusions=("мінску",))
    assert ex("Мінску")[0] == ["мінску"]


def test_haitian_analyzer_goldens():
    """TestHaitianCreoleAnalyzer.kt goldens — diacritic fold, -man strip."""
    from lucene_kmp_spark.analysis.ht import haitian_analyzer

    a = haitian_analyzer()
    assert a("Kreyòl")[0] == ["kreyol"]
    assert a("rapidman")[0] == ["rapid"]
    assert a("١٢٣٤")[0] == ["1234"]
    assert a("Mwen ap pale ak timoun yo rapidman")[0] == \
        ["pale", "timoun", "rapid"]
    ex = haitian_analyzer(stem_exclusions=("rapidman",))
    assert ex("rapidman")[0] == ["rapidman"]


def test_ilocano_analyzer_goldens():
    """TestIlocanoAnalyzer.kt goldens — affix strip, stopwords."""
    from lucene_kmp_spark.analysis.ilo import ilocano_analyzer

    a = ilocano_analyzer()
    assert a("Ilokáno")[0] == ["ilokano"]
    assert a("nagadal")[0] == ["adal"]
    assert a("١٢٣٤")[0] == ["1234"]
    assert a("dagiti ubing ket agbasa iti libro")[0] == \
        ["ubing", "basa", "libro"]
    ex = ilocano_analyzer(stem_exclusions=("nagadal",))
    assert ex("nagadal")[0] == ["nagadal"]


def test_tigrinya_analyzer_goldens():
    """TestTigrinyaAnalyzer.kt goldens — Ethiopic normalize, plural strip."""
    from lucene_kmp_spark.analysis.ti import tigrinya_analyzer

    a = tigrinya_analyzer()
    assert a("መፅሐፍታት")[0] == ["መጽሀፍ"]
    assert a("ሠላም")[0] == ["ሰላም"]
    assert a("١٢٣٤")[0] == ["1234"]
    assert a("እቲ ኣብ መፅሐፍታት እዩ")[0] == ["መጽሀፍ"]
    ex = tigrinya_analyzer(stem_exclusions=("መፅሐፍታት",))
    assert ex("መፅሐፍታት")[0] == ["መፅሐፍታት"]


def test_uzbek_analyzer_goldens():
    """TestUzbekAnalyzer.kt goldens — apostrophe-aware tokens, suffix loop."""
    from lucene_kmp_spark.analysis.uz import uzbek_analyzer

    a = uzbek_analyzer()
    assert a("Oʻzbekistonda")[0] == ["o'zbekiston"]
    assert a("kitoblardan")[0] == ["kitob"]
    assert a("uylarimizdan")[0] == ["uy"]
    assert a("١٢٣٤")[0] == ["1234"]
    assert a("bu kitoblar va uylar")[0] == ["kitob", "uy"]
    ex = uzbek_analyzer(stem_exclusions=("kitoblardan",))
    assert ex("kitoblardan")[0] == ["kitoblardan"]


def test_registry_routes_be_ht_ilo_ti_uz():
    from lucene_kmp_spark.analysis.registry import analyzer_for

    assert analyzer_for("be")("Мінску")[0] == ["мінск"]
    assert analyzer_for("ht")("rapidman")[0] == ["rapid"]
    assert analyzer_for("ilo")("nagadal")[0] == ["adal"]
    assert analyzer_for("ti")("ሠላም")[0] == ["ሰላም"]
    assert analyzer_for("uz")("kitoblardan")[0] == ["kitob"]


# --------------------------------- horn module: am/om

def test_amharic_analyzer_goldens():
    """TestAmharicAnalyzer.kt + TestAmharicStemmer.kt goldens."""
    from lucene_kmp_spark.analysis.am import amharic_analyzer, amharic_stem

    a = amharic_analyzer()
    assert a("የማያስፈልጋትስ")[0] == ["አስፈለገ"]
    assert a("አይደለችም")[0] == ["ነው"]
    assert a("ይመጣሉ")[0] == ["መጣ"]
    assert a("መጽሐፎችን")[0] == ["መፅሀፍ"]      # normalized then light-stemmed
    assert a("ለዘመዶቻችንም")[0] == ["ዘመድ"]
    assert a("ሀገር")[0] == ["hager"]          # Ge'ez -> SERA lexicon hit
    assert a("na")[0] == ["mT'"]
    assert a("yehagerocn")[0] == ["hager"]
    ex = amharic_analyzer(stem_exclusions=("ይመጣሉ",))
    assert ex("ይመጣሉ")[0] == ["ይመጣሉ"]
    # stemmer-level (pre-normalization) goldens
    assert amharic_stem("መጽሐፎችን") == "መጽሐፍ"
    assert amharic_stem("x") == "x"
    assert amharic_stem("zzzzzz") == "zzzzzz"


def test_oromo_analyzer_goldens():
    """TestOromoAnalyzer.kt + TestOromoStemmer.kt goldens."""
    from lucene_kmp_spark.analysis.om import oromo_analyzer, oromo_stem

    a = oromo_analyzer()
    assert a("afeeramaniiru")[0] == ["afeeramuu"]
    assert a("dubbanne")[0] == ["dubbachuu"]
    assert a("Namoota")[0] == ["nama"]
    assert a("manaan")[0] == ["mana"]
    assert a("fedhi")[0] == ["fedh"]
    assert a("Ameerikaanummaa")[0] == ["ameerikaanummaa"]
    assert a("Ameerikaatti")[0] == ["ameerikaa"]
    ex = oromo_analyzer(stem_exclusions=("namoota",))
    assert ex("Namoota")[0] == ["namoota"]
    assert oromo_stem("galmeewwan") == "galmee"
    assert oromo_stem("manatti") == "mana"
    assert oromo_stem("ab") == "ab"
    assert oromo_stem("zzzzzz") == "zzzzzz"


def test_registry_routes_am_om():
    from lucene_kmp_spark.analysis.registry import analyzer_for

    assert analyzer_for("am")("ይመጣሉ")[0] == ["መጣ"]
    assert analyzer_for("om")("Namoota")[0] == ["nama"]


def test_sorani_analyzer_goldens():
    """TestSoraniAnalyzer/StemFilter/NormalizationFilter goldens (ckb)."""
    from lucene_kmp_spark.analysis.ckb import (
        sorani_analyzer, sorani_normalize)

    a = sorani_analyzer()
    assert a("ئەم پیاوە")[0] == ["پیاو"]          # stopword drop + stem
    assert a("١٢٣٤")[0] == ["1234"]
    for text, exp in [
        ("پیاوێک", "پیاو"), ("دەرگایەک", "دەرگا"), ("پیاوەكە", "پیاو"),
        ("دەرگاكە", "دەرگا"), ("کتاویە", "کتاوی"), ("دەرگایە", "دەرگا"),
        ("پیاوان", "پیاو"), ("دەرگایان", "دەرگا"), ("پیاوەکان", "پیاو"),
        ("دەرگاکان", "دەرگا"), ("پیاوانە", "پیاو"), ("دەرگایانە", "دەرگا"),
        ("هۆتیلی", "هۆتیل"), ("هۆتیلێکی", "هۆتیل"), ("هۆتیلانی", "هۆتیل"),
        ("دوورەوە", "دوور"), ("نیوەشەودا", "نیوەشەو"), ("سۆرانا", "سۆران"),
        ("پارەمان", "پارە"), ("پارەتان", "پارە"), ("پارەیان", "پارە"),
    ]:
        assert a(text)[0] == [exp], (text, a(text)[0], exp)
    ex = sorani_analyzer(stem_exclusions=("پیاوەکان",))
    assert ex("پیاوەکان")[0] == ["پیاوەکان"]
    # normalizer-level goldens (TestSoraniNormalizationFilter.kt)
    for src, exp in [
        ("ي", "ی"), ("ى", "ی"), ("ی", "ی"), ("ك", "ک"), ("ک", "ک"),
        ("ه‌", "ە"), ("ه‌ک", "ەک"), ("ھ", "ه"), ("ة", "ە"),
        ("ههه", "ههە"), ("ڒ", "ڕ"), ("ررر", "ڕرر"),
        ("ـ", ""), ("ً", ""), ("ٌ", ""), ("ٍ", ""),
        ("َ", ""), ("ُ", ""), ("ِ", ""), ("ّ", ""),
        ("ْ", ""), ("‌", ""),
    ]:
        assert sorani_normalize(src) == exp, (src, sorani_normalize(src))


def test_registry_routes_ckb():
    from lucene_kmp_spark.analysis.registry import analyzer_for

    assert analyzer_for("ckb")("پیاوەکان")[0] == ["پیاو"]
