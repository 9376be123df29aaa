"""Composable analyzer factories — the custom-Analyzer surface demo.

The reference ships these as TokenFilters in ``analysis/common``
(ShingleFilter, NGramTokenFilter, EdgeNGramTokenFilter); here each factory
returns a picklable ``(text) -> (terms, positions, length)`` callable that
plugs into ``build_index(analyzer=...)`` / ``tokenize_to_tokens(analyzer=…)``
and runs inside the same Arrow tokenize UDF as the default chain.
"""

from __future__ import annotations

from lucene_kmp_spark.analysis import analyze


def standard_analyzer(stop_words: tuple[str, ...] = ()):
    """The default StandardAnalyzer chain, as an explicit factory."""
    stop = frozenset(stop_words) if stop_words else None

    def run(text: str):
        return analyze(text, stop_set=stop)

    return run


def shingle_analyzer(n: int = 2, sep: str = " ", keep_unigrams: bool = False):
    """Word shingles over the standard token stream (ShingleFilter analog:
    ``analysis/common`` shingle package). Shingle position = position of its
    first token; with ``keep_unigrams`` the unigram stream is interleaved
    (outputUnigrams=true, the reference default)."""

    def run(text: str):
        terms, positions, _length = analyze(text)
        out_t: list[str] = []
        out_p: list[int] = []
        for i, (t, p) in enumerate(zip(terms, positions)):
            if keep_unigrams:
                out_t.append(t)
                out_p.append(p)
            if i + n <= len(terms):
                out_t.append(sep.join(terms[i : i + n]))
                out_p.append(p)
        return out_t, out_p, len(out_t)

    return run


def synonym_analyzer(synonyms: dict[str, tuple[str, ...]], stop_words: tuple[str, ...] = ()):
    """Index-time single-token synonym expansion — the SynonymFilter /
    SynonymGraphFilter 1:1-rule analog (``analysis/common`` synonym package).

    Each synonym is emitted at its source token's position (posIncr=0
    overlap), so:

    * phrases match across synonyms ("quick scan" hits "fast scan"),
    * norms discount the overlap — the engine derives the field length from
      distinct positions (Similarity.kt discountOverlaps=true), so synonym
      emission never shortens BM25 norms,
    * collection sumTotalTermFreq DOES include the extra tokens (it sums
      per-term ttf, BM25Similarity.kt:53-55), exactly like Lucene — avgdl
      shifts while per-doc lengths don't.
    """
    stop = frozenset(stop_words) if stop_words else None

    def run(text: str):
        terms, positions, length = analyze(text, stop_set=stop)
        out_t: list[str] = []
        out_p: list[int] = []
        for t, p in zip(terms, positions):
            out_t.append(t)
            out_p.append(p)
            for s in synonyms.get(t, ()):
                out_t.append(s)
                out_p.append(p)
        return out_t, out_p, length

    return run


def ngram_analyzer(min_n: int = 2, max_n: int = 3):
    """Per-token character n-grams (NGramTokenFilter analog). Every gram
    keeps its source token's position (posIncr=0 for the extra grams —
    overlap semantics)."""

    def run(text: str):
        terms, positions, _length = analyze(text)
        out_t: list[str] = []
        out_p: list[int] = []
        for t, p in zip(terms, positions):
            for n in range(min_n, max_n + 1):
                for i in range(0, max(0, len(t) - n + 1)):
                    out_t.append(t[i : i + n])
                    out_p.append(p)
        return out_t, out_p, len(out_t)

    return run


def fold_ascii(text: str) -> str:
    """ASCIIFoldingFilter.foldToASCII as a string function
    (``analysis/common/.../miscellaneous/ASCIIFoldingFilter.kt``): every
    character in the reference's 1,242-entry fold table maps to its ASCII
    replacement (1→N chars); everything else passes through unchanged.
    Also useful as a pipeline text-normalization step."""
    from lucene_kmp_spark.analysis.asciifolding_data import FOLD_MAP

    if all(ord(c) < 0x80 for c in text):
        return text  # pure-ASCII fast path (the filter's needsFolding check)
    return "".join(FOLD_MAP.get(c, c) for c in text)


def ascii_folding_analyzer(stop_words: tuple[str, ...] = (), preserve_original: bool = False):
    """StandardTokenizer → LowerCase → Stop → ASCIIFoldingFilter chain.

    ``preserve_original=True`` (setPreserveOriginal) additionally emits the
    UNFOLDED token at the same position — a posIncr=0 overlap, exactly the
    filter's second output state; norms discount the overlap (length counts
    position-incrementing tokens only, the discountOverlaps default)."""
    stop = frozenset(stop_words) if stop_words else None

    def run(text: str):
        terms, positions, length = analyze(text, stop_set=stop)
        out_t: list[str] = []
        out_p: list[int] = []
        for t, p in zip(terms, positions):
            folded = fold_ascii(t)
            out_t.append(folded)
            out_p.append(p)
            if preserve_original and folded != t:
                out_t.append(t)
                out_p.append(p)
        return out_t, out_p, length

    return run


def edge_ngram_analyzer(min_n: int = 1, max_n: int = 5):
    """Leading-edge grams per token (EdgeNGramTokenFilter analog) — the
    classic search-as-you-type indexing scheme."""

    def run(text: str):
        terms, positions, _length = analyze(text)
        out_t: list[str] = []
        out_p: list[int] = []
        for t, p in zip(terms, positions):
            for n in range(min_n, min(max_n, len(t)) + 1):
                out_t.append(t[:n])
                out_p.append(p)
        return out_t, out_p, len(out_t)

    return run
