"""Language-analyzer registry + per-row multilingual routing.

The reference ships one Analyzer class per language (LANGUAGE_COVERAGE.md;
``analysis/common/.../analysis/<code>/``); a user picks it per field. In a
multilingual table the language is a COLUMN, so the Spark-first surface is a
router: ``multilingual_analyzer()`` plugs into
``build_index(analyzer=..., analyzer_col="lang")`` and dispatches each row's
text to the chain registered for its language code, falling back to the
StandardAnalyzer chain for unknown codes — deterministic, picklable, and
running inside the same Arrow tokenize UDF as every other analyzer.

Registered chains (each a faithful port of the reference's default
``createComponents``): en (EnglishAnalyzer), fr (FrenchAnalyzer),
es (SpanishAnalyzer), de (GermanAnalyzer), ar (ArabicAnalyzer),
fa (PersianAnalyzer incl. ZWNJ char filter), bn (BengaliAnalyzer),
te (TeluguAnalyzer, no-lowercase chain), id (IndonesianAnalyzer, Tala stemmer),
ru (RussianAnalyzer, published Snowball russian algorithm),
ur (UrduAnalyzer incl. presentation-form folding), sw (SwahiliAnalyzer),
hi (HindiAnalyzer, incl. IndicNormalizer), zh/ja/ko/cjk (CJKAnalyzer — the
``analysis/common`` default for CJK text; the reference's smartcn/kuromoji/
nori dictionary models are out of scope, as SURVEY §2.1 records).
"""

from __future__ import annotations

from lucene_kmp_spark.analysis.ar import arabic_analyzer
from lucene_kmp_spark.analysis.as_ import assamese_analyzer
from lucene_kmp_spark.analysis.gu import gujarati_analyzer
from lucene_kmp_spark.analysis.kn import kannada_analyzer
from lucene_kmp_spark.analysis.ml import malayalam_analyzer
from lucene_kmp_spark.analysis.ceb import cebuano_analyzer
from lucene_kmp_spark.analysis.ha import hausa_analyzer
from lucene_kmp_spark.analysis.ig import igbo_analyzer
from lucene_kmp_spark.analysis.jv import javanese_analyzer
from lucene_kmp_spark.analysis.km import khmer_analyzer
from lucene_kmp_spark.analysis.my import burmese_analyzer
from lucene_kmp_spark.analysis.yo import yoruba_analyzer
from lucene_kmp_spark.analysis.mr import marathi_analyzer
from lucene_kmp_spark.analysis.ms import malay_analyzer
from lucene_kmp_spark.analysis.su import sundanese_analyzer
from lucene_kmp_spark.analysis.tl import tagalog_analyzer
from lucene_kmp_spark.analysis.vi import vietnamese_analyzer
from lucene_kmp_spark.analysis.or_ import odia_analyzer
from lucene_kmp_spark.analysis.pa import punjabi_analyzer
from lucene_kmp_spark.analysis.si import sinhala_analyzer
from lucene_kmp_spark.analysis.bn import bengali_analyzer
from lucene_kmp_spark.analysis.cjk import cjk_analyzer
from lucene_kmp_spark.analysis.hi import hindi_analyzer
from lucene_kmp_spark.analysis.de import german_analyzer
from lucene_kmp_spark.analysis.en import english_analyzer
from lucene_kmp_spark.analysis.es import spanish_analyzer
from lucene_kmp_spark.analysis.filters import standard_analyzer
from lucene_kmp_spark.analysis.fa import persian_analyzer
from lucene_kmp_spark.analysis.id import indonesian_analyzer
from lucene_kmp_spark.analysis.fr import french_analyzer
from lucene_kmp_spark.analysis.it import italian_analyzer
from lucene_kmp_spark.analysis.pt import portuguese_analyzer
from lucene_kmp_spark.analysis.ru import russian_analyzer
from lucene_kmp_spark.analysis.bg import bulgarian_analyzer
from lucene_kmp_spark.analysis.br import brazilian_analyzer
from lucene_kmp_spark.analysis.ca import catalan_analyzer
from lucene_kmp_spark.analysis.el import greek_analyzer
from lucene_kmp_spark.analysis.et import estonian_analyzer
from lucene_kmp_spark.analysis.eu import basque_analyzer
from lucene_kmp_spark.analysis.fi import finnish_analyzer
from lucene_kmp_spark.analysis.gl import galician_analyzer
from lucene_kmp_spark.analysis.ga import irish_analyzer
from lucene_kmp_spark.analysis.hy import armenian_analyzer
from lucene_kmp_spark.analysis.lt import lithuanian_analyzer
from lucene_kmp_spark.analysis.lv import latvian_analyzer
from lucene_kmp_spark.analysis.sr import serbian_analyzer
from lucene_kmp_spark.analysis.ne import nepali_analyzer
from lucene_kmp_spark.analysis.nl import dutch_analyzer
from lucene_kmp_spark.analysis.ro import romanian_analyzer
from lucene_kmp_spark.analysis.cz import czech_analyzer
from lucene_kmp_spark.analysis.hu import hungarian_analyzer
from lucene_kmp_spark.analysis.scand import (
    danish_analyzer,
    norwegian_analyzer,
    swedish_analyzer,
)
from lucene_kmp_spark.analysis.sw import swahili_analyzer
from lucene_kmp_spark.analysis.ta import tamil_analyzer
from lucene_kmp_spark.analysis.th import thai_analyzer
from lucene_kmp_spark.analysis.tr import turkish_analyzer
from lucene_kmp_spark.analysis.ur import urdu_analyzer
from lucene_kmp_spark.analysis.te import telugu_analyzer
from lucene_kmp_spark.analysis.be import belarusian_analyzer
from lucene_kmp_spark.analysis.ht import haitian_analyzer
from lucene_kmp_spark.analysis.ilo import ilocano_analyzer
from lucene_kmp_spark.analysis.ti import tigrinya_analyzer
from lucene_kmp_spark.analysis.uz import uzbek_analyzer
from lucene_kmp_spark.analysis.am import amharic_analyzer
from lucene_kmp_spark.analysis.ckb import sorani_analyzer
from lucene_kmp_spark.analysis.om import oromo_analyzer

def _hebrew_factory(dictionary=None, **kw):
    """he: HebMorph tokenizer + niqqud strip; lemmatization activates when a
    DictHebMorph-shaped dictionary is supplied (hspell data is external —
    DEVIATIONS #10)."""
    from lucene_kmp_spark.analysis.hebrew import hebrew_analyzer

    return hebrew_analyzer(dictionary, **kw)


ANALYZER_FACTORIES = {
    "standard": standard_analyzer,
    "he": _hebrew_factory,
    "ar": arabic_analyzer,
    "bn": bengali_analyzer,
    "fa": persian_analyzer,
    "id": indonesian_analyzer,
    "te": telugu_analyzer,
    "en": english_analyzer,
    "hi": hindi_analyzer,
    "fr": french_analyzer,
    "es": spanish_analyzer,
    "de": german_analyzer,
    "pt": portuguese_analyzer,
    "ru": russian_analyzer,
    "sw": swahili_analyzer,
    "ur": urdu_analyzer,
    "it": italian_analyzer,
    "bg": bulgarian_analyzer,
    "el": greek_analyzer,
    "ca": catalan_analyzer,
    "pt-br": brazilian_analyzer,
    "br": brazilian_analyzer,
    "ga": irish_analyzer,
    "hy": armenian_analyzer,
    "et": estonian_analyzer,
    "eu": basque_analyzer,
    "gl": galician_analyzer,
    "fi": finnish_analyzer,
    "lt": lithuanian_analyzer,
    "lv": latvian_analyzer,
    "sr": serbian_analyzer,
    "ta": tamil_analyzer,
    "as": assamese_analyzer,
    "gu": gujarati_analyzer,
    "kn": kannada_analyzer,
    "ml": malayalam_analyzer,
    "mr": marathi_analyzer,
    "or": odia_analyzer,
    "pa": punjabi_analyzer,
    "si": sinhala_analyzer,
    "ceb": cebuano_analyzer,
    "ha": hausa_analyzer,
    "ig": igbo_analyzer,
    "km": khmer_analyzer,
    "my": burmese_analyzer,
    "yo": yoruba_analyzer,
    "jv": javanese_analyzer,
    "ms": malay_analyzer,
    "su": sundanese_analyzer,
    "tl": tagalog_analyzer,
    "vi": vietnamese_analyzer,
    "be": belarusian_analyzer,
    "ht": haitian_analyzer,
    "ilo": ilocano_analyzer,
    "ti": tigrinya_analyzer,
    "uz": uzbek_analyzer,
    "am": amharic_analyzer,
    "om": oromo_analyzer,
    "ckb": sorani_analyzer,
    "th": thai_analyzer,
    "tr": turkish_analyzer,
    "ne": nepali_analyzer,
    "nl": dutch_analyzer,
    "ro": romanian_analyzer,
    "cs": czech_analyzer,
    "hu": hungarian_analyzer,
    "da": danish_analyzer,
    "no": norwegian_analyzer,
    "sv": swedish_analyzer,
    "zh": cjk_analyzer,
    "ja": cjk_analyzer,
    "ko": cjk_analyzer,
    "cjk": cjk_analyzer,
}


def _japanese_dict_analyzer(**kw):
    from lucene_kmp_spark.analysis.ja import japanese_analyzer

    return japanese_analyzer(**kw)


def _korean_dict_analyzer(**kw):
    from lucene_kmp_spark.analysis.ko import korean_analyzer

    return korean_analyzer(**kw)


def _smart_chinese_analyzer(**kw):
    from lucene_kmp_spark.analysis.smartcn import smart_chinese_analyzer

    return smart_chinese_analyzer(**kw)


# dictionary-based CJK chains (kuromoji/nori/smartcn machinery; system
# dictionaries caller-supplied, demo tables by default — analysis/ja.py,
# ko.py, smartcn.py). Registered under explicit codes so the width-fold +
# bigram CJK default for bare "ja"/"ko"/"zh" stays unchanged.
ANALYZER_FACTORIES["ja-dict"] = _japanese_dict_analyzer
ANALYZER_FACTORIES["ko-dict"] = _korean_dict_analyzer
ANALYZER_FACTORIES["zh-smart"] = _smart_chinese_analyzer


def analyzer_for(lang: str, **kwargs):
    """The analyzer chain registered for a language code (KeyError if none —
    use :func:`multilingual_analyzer` for fall-back routing)."""
    return ANALYZER_FACTORIES[lang](**kwargs)


def multilingual_analyzer(default: str = "standard", overrides: dict | None = None):
    """A ``(text, lang) -> (terms, positions, length)`` router for
    ``build_index(analyzer=..., analyzer_col=<lang column>)``. Chains are
    instantiated once per registered language (closure state serialized to
    executors with the UDF); unknown/None codes route to ``default``.
    ``overrides`` maps a language code to a ready analyzer callable."""
    chains = {code: factory() for code, factory in ANALYZER_FACTORIES.items()}
    if overrides:
        chains.update(overrides)
    fallback = chains[default]

    def run(text: str, lang):
        return chains.get(lang, fallback)(text)

    return run
