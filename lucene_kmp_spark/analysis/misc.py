"""Core tokenizers + miscellaneous/commongrams/compound/pattern/reverse
token filters (``analysis/common/.../analysis/{core,miscellaneous,
commongrams,compound,pattern,reverse}/``).

Filters operate on ``(terms, positions)`` parallel lists — the repo's
token-stream representation (position holes encode removed tokens, shared
positions encode posIncr=0 overlaps) — and compose via
:func:`filter_analyzer` into the standard ``(text) -> (terms, positions,
length)`` analyzer contract used by ``build_index``.

Reference parity notes per filter are inline; test goldens come from the
corresponding Test*.kt files.
"""
from __future__ import annotations

import re

from lucene_kmp_spark.analysis.standard import (
    DEFAULT_MAX_TOKEN_LENGTH,
    _lower_simple,
    standard_tokenize,
)

# --------------------------------------------------------------------------
# core tokenizers (core/WhitespaceTokenizer.kt, LetterTokenizer.kt,
# KeywordTokenizer.kt, UnicodeWhitespaceTokenizer.kt)

def whitespace_tokenize(text: str, max_token_length: int = 255) -> list[str]:
    out, cur = [], []
    for c in text:
        if c.isspace():
            if cur:
                out.append("".join(cur))
                cur = []
        else:
            cur.append(c)
            if len(cur) >= max_token_length:
                out.append("".join(cur))
                cur = []
    if cur:
        out.append("".join(cur))
    return out


def letter_tokenize(text: str, max_token_length: int = 255) -> list[str]:
    out, cur = [], []
    for c in text:
        if c.isalpha():
            cur.append(c)
            if len(cur) >= max_token_length:
                out.append("".join(cur))
                cur = []
        elif cur:
            out.append("".join(cur))
            cur = []
    if cur:
        out.append("".join(cur))
    return out


def keyword_tokenize(text: str) -> list[str]:
    return [text] if text else []


def pattern_tokenize(text: str, pattern: str, group: int = -1) -> list[str]:
    """pattern/PatternTokenizer.kt: group=-1 splits on the pattern,
    group>=0 emits that capture group of each match."""
    rx = re.compile(pattern)
    if group >= 0:
        return [m.group(group) for m in rx.finditer(text)
                if m.group(group)]
    return [p for p in rx.split(text) if p]


# --------------------------------------------------------------------------
# stateless per-term filters

def trim_filter(terms, positions):
    """miscellaneous/TrimFilter.kt (whitespace trim, token kept if empty)."""
    return [t.strip() for t in terms], positions


def truncate_filter(length: int):
    """miscellaneous/TruncateTokenFilter.kt (keyword-aware variant is the
    chain's responsibility)."""
    if length < 1:
        raise ValueError("length parameter must be a positive number")

    def run(terms, positions):
        return [t[:length] for t in terms], positions

    return run


def upper_case_filter(terms, positions):
    """core/UpperCaseFilter.kt."""
    return [t.upper() for t in terms], positions


def reverse_string_filter(terms, positions):
    """reverse/ReverseStringFilter.kt (no marker variant)."""
    return [t[::-1] for t in terms], positions


def pattern_replace_filter(pattern: str, replacement: str = "",
                           replace_all: bool = True):
    """pattern-replace token filter (Java Matcher.replaceAll/replaceFirst)."""
    rx = re.compile(pattern)

    def run(terms, positions):
        n = 0 if replace_all else 1
        return [rx.sub(replacement, t, count=n) for t in terms], positions

    return run


def scandinavian_normalization_filter(terms, positions):
    """miscellaneous/ScandinavianNormalizer.kt with ALL_FOLDINGS:
    ä->æ, ö->ø, aa->å, a[eo]->æ/å, o[eo]->ø (case-aware digraph folds)."""
    return [_scand_normalize(t) for t in terms], positions


def _scand_normalize(term: str) -> str:
    buf = list(term)
    i = 0
    while i < len(buf):
        c = buf[i]
        if c == "ä":
            buf[i] = "æ"
        elif c == "Ä":
            buf[i] = "Æ"
        elif c == "ö":
            buf[i] = "ø"
        elif c == "Ö":
            buf[i] = "Ø"
        elif i + 1 < len(buf):
            nxt = buf[i + 1]
            if c in "aA" and nxt in "aAoO":
                buf[i] = "å" if c == "a" else "Å"
                del buf[i + 1]
            elif c == "a" and nxt in "eE":
                buf[i] = "æ"
                del buf[i + 1]
            elif c == "A" and nxt in "eE":
                buf[i] = "Æ"
                del buf[i + 1]
            elif c in "oO" and nxt in "eEoO":
                buf[i] = "ø" if c == "o" else "Ø"
                del buf[i + 1]
        i += 1
    return "".join(buf)


def scandinavian_folding_filter(terms, positions):
    """miscellaneous/ScandinavianFoldingFilter.kt: å/ä/æ->a, ö/ø->o,
    a[aeo]->a, o[eo]->o."""
    return [_scand_fold(t) for t in terms], positions


def _scand_fold(term: str) -> str:
    buf = list(term)
    i = 0
    while i < len(buf):
        c = buf[i]
        if c in "åäæ":
            buf[i] = "a"
        elif c in "ÅÄÆ":
            buf[i] = "A"
        elif c in "øö":
            buf[i] = "o"
        elif c in "ØÖ":
            buf[i] = "O"
        elif i + 1 < len(buf):
            nxt = buf[i + 1]
            if c in "aA" and nxt in "aAeEoO":
                del buf[i + 1]
            elif c in "oO" and nxt in "eEoO":
                del buf[i + 1]
        i += 1
    return "".join(buf)


def capitalization_filter(only_first_word: bool = True, keep=(),
                          force_first_letter: bool = True, ok_prefix=(),
                          min_word_length: int = 0,
                          max_word_count: int = 2 ** 31 - 1,
                          max_token_length: int = 2 ** 31 - 1):
    """miscellaneous/CapitalizationFilter.kt: title-cases sub-words split
    on space/'.'; ``keep``/``ok_prefix`` exempt words, later words
    lowercase when only_first_word."""
    keep_set = frozenset(keep)
    prefixes = tuple(ok_prefix)

    def _process(word: str, word_count: int) -> str:
        if not word:
            return word
        if only_first_word and word_count > 0:
            return word.lower()
        if word in keep_set:
            if force_first_letter and word_count == 0:
                return word[0].upper() + word[1:]
            return word
        if len(word) < min_word_length:
            return word
        if any(word.startswith(p) for p in prefixes):
            return word
        return word[0].upper() + word[1:].lower()

    def run(terms, positions):
        out = []
        for t in terms:
            if len(t) >= max_token_length:
                out.append(t)
                continue
            # verbatim CapitalizationFilter.kt scan (including its
            # double-advance after a separator that ends a word)
            buf = list(t)
            wc = 0
            last_start = 0
            i = 0
            while i < len(buf):
                c = buf[i]
                if c <= " " or c == ".":
                    length = i - last_start
                    if length > 0:
                        word = "".join(buf[last_start:i])
                        buf[last_start:i] = list(_process(word, wc))
                        wc += 1
                        last_start = i + 1
                        i += 1
                i += 1
            if last_start < len(buf):
                word = "".join(buf[last_start:])
                buf[last_start:] = list(_process(word, wc))
                wc += 1
            out.append("".join(buf) if wc <= max_word_count else t)
        return out, positions

    return run


# --------------------------------------------------------------------------
# removing filters (FilteringTokenFilter semantics: position holes)

def length_filter(min_len: int, max_len: int):
    """miscellaneous/LengthFilter.kt."""
    if min_len < 0:
        raise ValueError("minimum length must be greater than or equal to zero")
    if min_len > max_len:
        raise ValueError("maximum length must not be greater than minimum length")

    def run(terms, positions):
        kept = [(t, p) for t, p in zip(terms, positions)
                if min_len <= len(t) <= max_len]
        return [t for t, _ in kept], [p for _, p in kept]

    return run


def codepoint_count_filter(min_cp: int, max_cp: int):
    """miscellaneous/CodepointCountFilter.kt — cp count == len() in Python
    (no surrogate pairs)."""
    return length_filter(min_cp, max_cp)


def keep_word_filter(words, lowercase: bool = False):
    """miscellaneous/KeepWordFilter.kt."""
    ws = frozenset(w.lower() for w in words) if lowercase else frozenset(words)

    def run(terms, positions):
        kept = [(t, p) for t, p in zip(terms, positions)
                if (t.lower() if lowercase else t) in ws]
        return [t for t, _ in kept], [p for _, p in kept]

    return run


def limit_token_count_filter(max_count: int):
    """miscellaneous/LimitTokenCountFilter.kt (consumeAllTokens moot here)."""
    def run(terms, positions):
        return terms[:max_count], positions[:max_count]

    return run


def limit_token_position_filter(max_position: int):
    """miscellaneous/LimitTokenPositionFilter.kt: keep tokens whose
    1-based position is <= maxTokenPosition."""
    def run(terms, positions):
        kept = [(t, p) for t, p in zip(terms, positions)
                if p + 1 <= max_position]
        return [t for t, _ in kept], [p for _, p in kept]

    return run


def remove_duplicates_filter(terms, positions):
    """miscellaneous/RemoveDuplicatesTokenFilter.kt: drop a token equal to
    another token at the same position."""
    seen: set[tuple[int, str]] = set()
    out_t, out_p = [], []
    for t, p in zip(terms, positions):
        if (p, t) in seen:
            continue
        seen.add((p, t))
        out_t.append(t)
        out_p.append(p)
    return out_t, out_p


# --------------------------------------------------------------------------
# stream-restructuring filters

def hyphenated_words_filter(terms, positions):
    """miscellaneous/HyphenatedWordsFilter.kt: a token ending in '-' joins
    the following token(s); the joined token takes the first part's
    position; a trailing dangling part keeps its '-'."""
    out_t, out_p = [], []
    pending: list[str] = []
    pend_pos = 0
    for t, p in zip(terms, positions):
        if t.endswith("-") and len(t) > 0:
            if not pending:
                pend_pos = p
            pending.append(t[:-1])
        elif pending:
            pending.append(t)
            out_t.append("".join(pending))
            out_p.append(pend_pos)
            pending = []
        else:
            out_t.append(t)
            out_p.append(p)
    if pending:
        out_t.append("".join(pending) + "-")
        out_p.append(pend_pos)
    return out_t, out_p


def fingerprint_filter(separator: str = " ", max_output_token_size: int = 1024):
    """miscellaneous/FingerprintFilter.kt: one token = sorted unique input
    terms joined by ``separator`` (empty stream stays empty; oversized
    output emits nothing)."""
    def run(terms, positions):
        if not terms:
            return [], []
        uniq = sorted(set(terms))
        joined = separator.join(uniq)
        if len(joined) > max_output_token_size:
            return [], []
        return [joined], [positions[0] if positions else 0]

    return run


def _common_grams_typed(terms, positions, common):
    """(term, position, is_gram) stream per CommonGramsFilter.kt: the gram
    precedes the current unigram, at the previous token's position."""
    out = []
    prev: tuple[str, int] | None = None
    for t, p in zip(terms, positions):
        if prev is not None and (prev[0] in common or t in common):
            out.append((prev[0] + "_" + t, prev[1], True))
        out.append((t, p, False))
        prev = (t, p)
    return out


def common_grams_filter(common_words):
    """commongrams/CommonGramsFilter.kt: for each adjacent pair where
    either side is common, emit ``prev_cur`` (GRAM) at the previous
    token's position (posIncr=0) before the current unigram."""
    common = frozenset(common_words)

    def run(terms, positions):
        typed = _common_grams_typed(terms, positions, common)
        return [t for t, _, _ in typed], [p for _, p, _ in typed]

    return run


def common_grams_query_filter(common_words):
    """commongrams/CommonGramsQueryFilter.kt held-previous state machine:
    a unigram followed by its gram is replaced by the gram; a trailing
    unigram after an emitted gram is dropped."""
    common = frozenset(common_words)

    def run(terms, positions):
        typed = _common_grams_typed(terms, positions, common)
        out: list[tuple[str, int]] = []
        prev = None                      # (term, pos, is_gram) held back
        last_emitted_gram = False
        for cur in typed:
            if prev is not None and not cur[2]:
                out.append((prev[0], prev[1]))
                last_emitted_gram = prev[2]
            prev = cur
        if prev is not None and not last_emitted_gram:
            out.append((prev[0], prev[1]))
        # renumber: grams are ordinary positions in the query stream
        return [t for t, _ in out], list(range(len(out)))

    return run


def dictionary_compound_filter(dictionary, min_word_size: int = 5,
                               min_subword_size: int = 2,
                               max_subword_size: int = 15,
                               only_longest_match: bool = False):
    """compound/DictionaryCompoundWordTokenFilter.kt: dictionary subwords
    appended at the original token's position (posIncr=0), original kept."""
    words = frozenset(w.lower() for w in dictionary)

    def run(terms, positions):
        out_t, out_p = [], []
        for t, p in zip(terms, positions):
            out_t.append(t)
            out_p.append(p)
            if len(t) < min_word_size:
                continue
            low = t.lower()
            subs = []
            i = 0
            while i <= len(t) - min_subword_size:
                longest = None
                for j in range(min_subword_size, max_subword_size + 1):
                    if i + j > len(t):
                        break
                    if low[i:i + j] in words:
                        if only_longest_match:
                            if longest is None or len(longest[1]) < j:
                                longest = (i, t[i:i + j])
                        else:
                            subs.append(t[i:i + j])
                if only_longest_match and longest is not None:
                    subs.append(longest[1])
                i += 1
            for s in subs:
                out_t.append(s)
                out_p.append(p)
        return out_t, out_p

    return run


def stemmer_override_filter(overrides: dict[str, str]):
    """miscellaneous/StemmerOverrideFilter.kt analog: mapped terms are
    rewritten and marked keyword so later stemmers skip them. In this
    composed representation the rewrite happens before the stem filter
    and the stem filter receives the exclusion set."""
    def run(terms, positions):
        return [overrides.get(t, t) for t in terms], positions

    return run


# --------------------------------------------------------------------------
# composition

def filter_analyzer(tokenizer=None, filters=(), lowercase: bool = False,
                    stop_words: tuple = (),
                    max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH):
    """Compose tokenizer -> [LowerCase] -> [Stop] -> filters into the
    ``(text) -> (terms, positions, length)`` analyzer contract.

    ``tokenizer`` returns either a list of strings (positions assigned
    sequentially) or None to use the UAX#29 StandardTokenizer."""
    stop = frozenset(stop_words)

    def run(text: str):
        if not text:
            return [], [], 0
        if tokenizer is None:
            toks = [(t.term, t.position)
                    for t in standard_tokenize(text, max_token_length)]
        else:
            toks = list(enumerate(tokenizer(text)))
            toks = [(t, p) for p, t in toks]
        terms = [t for t, _ in toks]
        positions = [p for _, p in toks]
        if lowercase:
            terms = [_lower_simple(t) for t in terms]
        if stop:
            kept = [(t, p) for t, p in zip(terms, positions) if t not in stop]
            terms = [t for t, _ in kept]
            positions = [p for _, p in kept]
        for f in filters:
            terms, positions = f(terms, positions)
        return terms, positions, len(terms)

    return run


def whitespace_analyzer(**kw):
    """core/WhitespaceAnalyzer.kt."""
    return filter_analyzer(whitespace_tokenize, **kw)


def simple_analyzer(**kw):
    """core/SimpleAnalyzer.kt: LetterTokenizer + LowerCase."""
    return filter_analyzer(letter_tokenize, lowercase=True, **kw)


def keyword_analyzer(**kw):
    """core/KeywordAnalyzer.kt."""
    return filter_analyzer(keyword_tokenize, **kw)


def stop_analyzer(stop_words, **kw):
    """core/StopAnalyzer.kt: LetterTokenizer + LowerCase + Stop."""
    return filter_analyzer(letter_tokenize, lowercase=True,
                           stop_words=tuple(stop_words), **kw)


def protected_term_filter(protected_words, inner):
    """miscellaneous/ProtectedTermFilter.kt (a ConditionalTokenFilter):
    ``inner`` (a (terms, positions) filter) runs only over tokens NOT in
    the protected set; protected tokens pass through in place."""
    protected = frozenset(protected_words)

    def run(terms, positions):
        out_t = list(terms)
        idx = [i for i, t in enumerate(terms) if t not in protected]
        sub_t, _sub_p = inner([terms[i] for i in idx],
                              [positions[i] for i in idx])
        if len(sub_t) != len(idx):
            raise ValueError(
                "protected_term_filter requires a 1:1 inner filter")
        for i, t in zip(idx, sub_t):
            out_t[i] = t
        return out_t, list(positions)

    return run


def keyword_repeat_stemmer(stem_fn):
    """miscellaneous/KeywordRepeatFilter.kt + stemmer +
    RemoveDuplicatesTokenFilter composition: each token is emitted as its
    original (keyword-protected) plus its stem at the same position; the
    duplicate collapses when the stem is a no-op."""
    def run(terms, positions):
        out_t, out_p = [], []
        for t, p in zip(terms, positions):
            stemmed = stem_fn(t)
            out_t.append(t)
            out_p.append(p)
            if stemmed != t:
                out_t.append(stemmed)
                out_p.append(p)
        return out_t, out_p

    return run


def concatenate_filter(separator: str = ""):
    """miscellaneous/ConcatenateGraphFilter.kt (flattened): the whole
    stream joins into one token in stream order (suggester input shape)."""
    def run(terms, positions):
        if not terms:
            return [], []
        return [separator.join(terms)], [positions[0]]

    return run
