"""Korean morphological analysis — the nori machinery.

Semantics ported from the reference:

* ``analysis/nori/.../ko/Viterbi.kt`` — script-run unknown-word grouping
  (:57-108), decompound backtrace for COMPOUND/INFLECT entries with
  NONE/DISCARD/MIXED modes (:115-242), POS-keyed space penalty 3000
  (:244-271), punctuation discard incl. U+318D (:281-304),
  outputLongestUserEntryOnly + enableSpacePenaltyFactor (:46-48).
* ``ko/KoreanTokenizer.kt`` — DecompoundMode enum, DEFAULT_DECOMPOUND =
  DISCARD (:29-40).
* ``ko/KoreanAnalyzer.kt:21-27`` — chain: tokenizer ->
  PartOfSpeechStopFilter -> ReadingFormFilter -> LowerCaseFilter.
* ``ko/KoreanPartOfSpeechStopFilter.kt:19-50`` — DEFAULT_STOP_TAGS
  (embedded in the reference source, reproduced verbatim below).
* ``ko/KoreanReadingFormFilter.kt`` — replace Hanja surface with reading.

Dictionaries (mecab-ko-dic) are caller-supplied, same contract as ja.py;
the demo dictionary reproduces the reference's own TestKoreanTokenizer
decompound sentence 가락지나물은 한국, 중국, 일본 across all three modes.
"""

from __future__ import annotations

import unicodedata

from lucene_kmp_spark.analysis.morph import (
    KNOWN,
    UNKNOWN,
    USER,
    CharacterDefinition,
    ConnectionCosts,
    MorphEntry,
    MorphToken,
    PrefixDictionary,
    UnknownDictionary,
    ViterbiLattice,
    is_punctuation,
)
from lucene_kmp_spark.analysis.standard import _lower_simple

NONE, DISCARD, MIXED = "none", "discard", "mixed"
DEFAULT_DECOMPOUND = DISCARD  # KoreanTokenizer.kt:40

# KoreanPartOfSpeechStopFilter.DEFAULT_STOP_TAGS (:19-50)
DEFAULT_STOP_TAGS = frozenset((
    "EP", "EF", "EC", "ETN", "ETM", "IC", "JKS", "JKC", "JKG", "JKO",
    "JKB", "JKV", "JKQ", "JX", "JC", "MAG", "MAJ", "MM", "SP", "SSC",
    "SSO", "SC", "SE", "XPN", "XSA", "XSN", "XSV", "UNA", "NA", "VSV",
))

# POS tags that take the 3000 space penalty (nori Viterbi.kt:248-266):
# verbal endings, particles, copula, derivational suffixes
_SPACE_PENALTY_TAGS = frozenset((
    "EP", "EF", "EC", "ETN", "ETM", "JKS", "JKC", "JKG", "JKO", "JKB",
    "JKV", "JKQ", "JX", "JC", "VCP", "XSA", "XSN", "XSV",
))


# Letter-block -> script ranges (vendored from the public Unicode Scripts.txt
# block structure; Unicode 12.1, the reference's version). The run-grouping
# rule (nori Viterbi.kt:306-312 / processUnknownWord) consults script
# identity only for LETTERS: punctuation-ness gates the run separately, and
# Mn combining marks are joinable by category — so letter-block granularity
# reproduces Character.UnicodeScript.of grouping exactly for real text.
_SCRIPT_RANGES: tuple[tuple[int, int, str], ...] = (
    (0x0041, 0x005A, "LATIN"), (0x0061, 0x007A, "LATIN"),
    (0x00C0, 0x024F, "LATIN"),  # Latin-1 letters + Extended-A/B
    (0x0250, 0x02AF, "LATIN"),  # IPA extensions
    (0x0370, 0x03FF, "GREEK"), (0x1F00, 0x1FFF, "GREEK"),
    (0x0400, 0x04FF, "CYRILLIC"), (0x0500, 0x052F, "CYRILLIC"),
    (0x0531, 0x058F, "ARMENIAN"),
    (0x0591, 0x05F4, "HEBREW"),
    (0x0600, 0x060B, "ARABIC"), (0x060D, 0x061A, "ARABIC"),
    (0x0620, 0x064A, "ARABIC"), (0x0656, 0x066F, "ARABIC"),
    (0x0671, 0x06DC, "ARABIC"), (0x06DE, 0x06FF, "ARABIC"),
    (0x0750, 0x077F, "ARABIC"),  # Arabic Supplement
    (0x0700, 0x074F, "SYRIAC"),
    (0x0780, 0x07B1, "THAANA"),
    (0x07C0, 0x07FA, "NKO"),
    (0x0900, 0x0963, "DEVANAGARI"), (0x0966, 0x097F, "DEVANAGARI"),
    (0x0980, 0x09FF, "BENGALI"),
    (0x0A00, 0x0A7F, "GURMUKHI"),
    (0x0A80, 0x0AFF, "GUJARATI"),
    (0x0B00, 0x0B7F, "ORIYA"),
    (0x0B80, 0x0BFF, "TAMIL"),
    (0x0C00, 0x0C7F, "TELUGU"),
    (0x0C80, 0x0CFF, "KANNADA"),
    (0x0D00, 0x0D7F, "MALAYALAM"),
    (0x0D80, 0x0DFF, "SINHALA"),
    (0x0E01, 0x0E3A, "THAI"), (0x0E40, 0x0E5B, "THAI"),  # 0E3F baht = Common
    (0x0E81, 0x0EFF, "LAO"),
    (0x0F00, 0x0FFF, "TIBETAN"),
    (0x1000, 0x109F, "MYANMAR"),
    (0x10A0, 0x10FF, "GEORGIAN"),
    (0x1100, 0x11FF, "HANGUL"),
    (0x1200, 0x139F, "ETHIOPIC"),
    (0x13A0, 0x13FD, "CHEROKEE"),
    (0x1400, 0x167F, "CANADIAN_ABORIGINAL"),
    (0x1680, 0x169C, "OGHAM"),
    (0x16A0, 0x16EA, "RUNIC"),
    (0x1780, 0x17FF, "KHMER"), (0x19E0, 0x19FF, "KHMER"),
    (0x1800, 0x18AF, "MONGOLIAN"),
    (0x1E00, 0x1EFF, "LATIN"),  # Latin Extended Additional
    # 3099-309A (combining voiced marks) are script Inherited and 309B-309C
    # (spacing voiced marks) are Common per Scripts.txt — excluded from the
    # block range so they fall through to the category fallback (ADVICE r4:
    # an unknown run STARTING on U+3099 must not lock its script to
    # HIRAGANA; inherited adopts the next script as in nori).
    (0x3041, 0x3096, "HIRAGANA"), (0x309D, 0x309F, "HIRAGANA"),
    (0x30A1, 0x30FA, "KATAKANA"), (0x30FD, 0x30FF, "KATAKANA"),
    (0x3105, 0x312F, "BOPOMOFO"), (0x31A0, 0x31BF, "BOPOMOFO"),
    (0x3130, 0x318F, "HANGUL"),
    (0x3400, 0x4DBF, "HAN"), (0x4E00, 0x9FFF, "HAN"),
    (0x2E80, 0x2FDF, "HAN"),  # radicals
    (0xF900, 0xFAFF, "HAN"),  # compatibility ideographs
    (0xA000, 0xA4CF, "YI"),
    (0xA500, 0xA62B, "VAI"),
    (0xAC00, 0xD7AF, "HANGUL"), (0xA960, 0xA97F, "HANGUL"),
    (0xD7B0, 0xD7FF, "HANGUL"),
    (0xFB1D, 0xFB4F, "HEBREW"),
    (0xFB50, 0xFDFF, "ARABIC"), (0xFE70, 0xFEFF, "ARABIC"),
    (0x10330, 0x1034A, "GOTHIC"),
    (0x20000, 0x2A6DF, "HAN"),
)
_SCRIPT_MEMO: dict[str, str] = {}


def _script_of(ch: str) -> str:
    """Unicode script id for run grouping — Character.UnicodeScript.of
    equivalent at letter granularity (nori Viterbi.kt:306-312 treats
    COMMON/INHERITED as joinable; DEVIATIONS ex-#28 closed round 4)."""
    s = _SCRIPT_MEMO.get(ch)
    if s is None:
        cp = ord(ch)
        s = None
        for lo, hi, name in _SCRIPT_RANGES:
            if lo <= cp <= hi:
                s = name
                break
        if s is None:
            # combining marks outside any script block are INHERITED; the
            # rest (digits, punctuation, symbols, spaces) are COMMON
            s = ("INHERITED"
                 if unicodedata.category(ch) in ("Mn", "Mc", "Me")
                 else "COMMON")
        _SCRIPT_MEMO[ch] = s
    return s


def _common_or_inherited(script: str) -> bool:
    return script == "COMMON" or script == "INHERITED"


_NATIVE_TOK = None  # unresolved -> run_tokenize_ko | False


def _native_tokenize(v, text):
    global _NATIVE_TOK
    if _NATIVE_TOK is None:
        try:
            from .cmorph import run_tokenize_ko
            _NATIVE_TOK = run_tokenize_ko
        except Exception:
            _NATIVE_TOK = False
    return _NATIVE_TOK(v, text) if _NATIVE_TOK else None


class KoreanViterbi(ViterbiLattice):
    def __init__(self, *args, mode=DEFAULT_DECOMPOUND,
                 discard_punctuation=True, output_unknown_unigrams=False, **kw):
        kw.setdefault("output_longest_user_only", True)   # Viterbi.kt:48
        kw.setdefault("enable_space_penalty", True)        # Viterbi.kt:47
        super().__init__(*args, **kw)
        self.mode = mode
        self.discard_punctuation = discard_punctuation
        self.output_unknown_unigrams = output_unknown_unigrams

    def compute_space_penalty(self, entry: MorphEntry, num_spaces: int) -> int:
        """nori Viterbi.computeSpacePenalty (:244-271)."""
        if num_spaces > 0 and entry.pos.split("+", 1)[0] in _SPACE_PENALTY_TAGS:
            return 3000
        return 0

    def process_unknown(self, pos: int, pos_data, any_matches: bool) -> int:
        """nori Viterbi.processUnknownWord (:57-108): the run extends while
        script matches (common/inherited merge), punctuation-ness and
        digit-ness match, and the char is groupable."""
        text = self.text
        first = text[pos]
        if any_matches and not self.char_def.is_invoke(first):
            return 0
        cls = self.char_def.char_class(first)
        if not self.char_def.is_group(first):
            length = 1
        else:
            length = 1
            script = _script_of(first)
            is_punct = is_punctuation(first)
            is_digit = first.isdigit()
            while length < 1024 and pos + length < len(text):
                ch = text[pos + length]
                sc = _script_of(ch)
                same_script = (
                    sc == script or _common_or_inherited(script)
                    or _common_or_inherited(sc)
                    or unicodedata.category(ch) == "Mn"
                )
                if (same_script and is_punctuation(ch) == is_punct
                        and ch.isdigit() == is_digit
                        and self.char_def.is_group(ch)):
                    length += 1
                else:
                    break
                if _common_or_inherited(script) and not _common_or_inherited(sc):
                    script = sc
                    cls = self.char_def.char_class(ch)
        self._add_unknown(cls, pos_data, pos, pos + length)
        return length

    def tokenize(self, text: str) -> list[MorphToken]:
        # Compiled fast path: forward + backtrace in one C call
        # (analysis/cmorph.py run_tokenize_ko) — bit-identical token
        # stream, transparent fallback to the Python loops below.
        toks = _native_tokenize(self, text)
        if toks is not None:
            return toks
        self.forward(text)
        end_data, least_idx = self.best_end_index(len(text))
        if end_data is None:
            return []
        pending: list[MorphToken] = []
        self._backtrace(end_data, least_idx, pending)
        return list(reversed(pending))

    def _backtrace(self, end_pos_data, from_idx, pending):
        """nori Viterbi.backtrace (:115-242)."""
        text = self.text
        pos = end_pos_data.pos
        best_idx = from_idx
        while pos > 0:
            pos_data = self.positions[pos]
            back_pos = pos_data.back_pos[best_idx]
            back_word_pos = pos_data.back_word_pos[best_idx]
            length = pos - back_word_pos
            back_type = pos_data.back_type[best_idx]
            back_id = pos_data.back_id[best_idx]
            next_best_idx = pos_data.back_index[best_idx]
            entry = self.entry_of(back_id, back_type)

            if self.output_unknown_unigrams and back_type == UNKNOWN:
                i = length - 1
                while i >= 0:
                    char_len = 1
                    if i > 0 and 0xDC00 <= ord(text[back_word_pos + i]) <= 0xDFFF:
                        i -= 1
                        char_len = 2
                    pending.append(MorphToken(
                        text[back_word_pos + i : back_word_pos + i + char_len],
                        back_word_pos + i, back_word_pos + i + char_len,
                        UNKNOWN, entry))
                    i -= 1
            else:
                token = MorphToken(text[back_word_pos:pos], back_word_pos,
                                   pos, back_type, entry)
                if entry.pos_type == "MORPHEME" or self.mode == NONE:
                    if not (self.discard_punctuation
                            and is_punctuation(token.surface[0])):
                        pending.append(token)
                else:
                    morphemes = entry.morphemes
                    if not morphemes:
                        pending.append(token)
                    else:
                        end_offset = pos
                        pos_len = 0
                        compound_parts = []
                        for i in range(len(morphemes) - 1, -1, -1):
                            m_pos, m_surface = morphemes[i]
                            if entry.pos_type == "COMPOUND":
                                part = MorphToken(
                                    m_surface,
                                    end_offset - len(m_surface), end_offset,
                                    back_type,
                                    MorphEntry(m_surface, entry.left_id,
                                               entry.right_id, 0, m_pos))
                            else:  # INFLECT: parts share the whole offsets
                                part = MorphToken(
                                    m_surface, back_word_pos, pos, back_type,
                                    MorphEntry(m_surface, entry.left_id,
                                               entry.right_id, 0, m_pos))
                            if i == 0 and self.mode == MIXED:
                                part.position_increment = 0
                            pos_len += 1
                            end_offset -= len(m_surface)
                            compound_parts.append(part)
                        pending.extend(compound_parts)
                        if self.mode == MIXED:
                            token.position_length = max(1, pos_len)
                            pending.append(token)

            if not self.discard_punctuation and back_word_pos != back_pos:
                # emit the whitespace run as a SPACE unknown token (:218-233)
                space_entry = (self.unk.entries_for("SPACE") or
                               [MorphEntry(" ", 0, 0, 0, "SP")])[0]
                pending.append(MorphToken(
                    text[back_pos:back_word_pos], back_pos, back_word_pos,
                    UNKNOWN, space_entry))

            pos = back_pos
            best_idx = next_best_idx


def korean_tokenizer(
    entries: list[MorphEntry],
    connections: ConnectionCosts,
    unknowns: UnknownDictionary,
    char_def: CharacterDefinition,
    user_entries: list[MorphEntry] | None = None,
    mode: str = DEFAULT_DECOMPOUND,
    discard_punctuation: bool = True,
    output_unknown_unigrams: bool = False,
):
    v = KoreanViterbi(
        PrefixDictionary(entries),
        connections,
        unknowns,
        char_def,
        user_dictionary=PrefixDictionary(user_entries) if user_entries else None,
        mode=mode,
        discard_punctuation=discard_punctuation,
        output_unknown_unigrams=output_unknown_unigrams,
    )
    try:  # pack native tables driver-side so workers inherit them
        from lucene_kmp_spark.analysis.cmorph import prepack
        prepack(v)
    except Exception:
        pass
    return v.tokenize


def korean_analyzer(
    entries: list[MorphEntry] | None = None,
    connections: ConnectionCosts | None = None,
    unknowns: UnknownDictionary | None = None,
    char_def: CharacterDefinition | None = None,
    user_entries: list[MorphEntry] | None = None,
    mode: str = DEFAULT_DECOMPOUND,
    stop_tags=DEFAULT_STOP_TAGS,
    normalize_numbers: bool = False,
):
    """KoreanAnalyzer.createComponents (KoreanAnalyzer.kt:21-27):
    tokenizer -> POS stop (left POS of the entry) -> reading form ->
    simple lowercase. ``normalize_numbers`` adds KoreanNumberFilter (a
    separate factory in the reference, opt-in here too). Returns
    ``text -> (terms, positions, length)``."""
    if entries is None:
        entries, connections, unknowns, char_def = demo_korean_dictionary()
    tok = korean_tokenizer(entries, connections, unknowns, char_def,
                           user_entries, mode)
    tags = frozenset(stop_tags)

    def run(text: str):
        if not text:
            return [], [], 0
        tokens = tok(text)
        if normalize_numbers:
            from lucene_kmp_spark.analysis.cjk_numbers import korean_number_filter

            tokens = korean_number_filter(tokens)
        out_terms, out_positions = [], []
        pos = -1
        overlap = 0
        for t in tokens:
            pos += t.position_increment
            left_pos = t.entry.pos.split("+", 1)[0]
            if left_pos in tags:
                continue  # position hole preserved
            term = t.entry.reading or t.surface  # KoreanReadingFormFilter
            out_terms.append(_lower_simple(term))
            out_positions.append(max(pos, 0))
            if t.position_increment == 0:
                overlap += 1  # MIXED-mode graph overlaps discount the norm
        return out_terms, out_positions, len(out_terms) - overlap

    return run


def parse_user_dictionary(
    text: str,
    left_id: int = 1,
    right_id: int = 1,
    word_cost: int = -100000,
    pos: str = "NNG",
) -> list[MorphEntry]:
    """nori userdict.txt parser (ko/dict/UserDictionary.kt): one entry per
    line, ``surface`` alone or ``surface seg1 seg2 ...`` for compounds,
    ``#`` comments. Compound lines become COMPOUND entries whose morphemes
    decompose per mode; the fixed user cost model applies
    (UserMorphData WORD_COST=-100000; override ids for caller matrices)."""
    import re

    entries: list[MorphEntry] = []
    for raw in text.splitlines():
        line = re.sub(r"#.*$", "", raw).strip()
        if not line:
            continue
        parts = re.split(r"\s+", line)
        surface = parts[0]
        segs = parts[1:]
        if segs and "".join(segs) != surface:
            raise ValueError(
                f"Illegal user dictionary entry {surface} - the concatenated "
                f"segmentation ({''.join(segs)}) does not match the surface form"
            )
        if len(segs) > 1:
            entries.append(MorphEntry(
                surface, left_id, right_id, word_cost, pos,
                pos_type="COMPOUND",
                morphemes=tuple((pos, s) for s in segs),
            ))
        else:
            entries.append(MorphEntry(surface, left_id, right_id, word_cost, pos))
    return entries


def demo_korean_dictionary():
    """Hand-authored mecab-ko-dic-shaped demo tables. Context ids:
    0=BOS/EOS, 1=noun, 2=particle, 3=verb-ish. The compound entry
    가락지나물 = 가락지 + 나물 reproduces the reference's
    TestKoreanTokenizer three-mode decompound sentence."""
    N, J, V = 1, 2, 3
    entries = [
        MorphEntry("가락지나물", N, N, 4000, "NNG", pos_type="COMPOUND",
                   morphemes=(("NNG", "가락지"), ("NNG", "나물"))),
        MorphEntry("가락지", N, N, 3500, "NNG"),
        MorphEntry("나물", N, N, 3200, "NNG"),
        MorphEntry("은", J, J, 800, "JX"),
        MorphEntry("는", J, J, 800, "JX"),
        MorphEntry("이", J, J, 900, "JKS"),
        MorphEntry("가", J, J, 900, "JKS"),
        MorphEntry("을", J, J, 900, "JKO"),
        MorphEntry("한국", N, N, 3000, "NNP"),
        MorphEntry("중국", N, N, 3000, "NNP"),
        MorphEntry("일본", N, N, 3000, "NNP"),
        MorphEntry("검색", N, N, 3300, "NNG"),
        MorphEntry("엔진", N, N, 3400, "NNG"),
        MorphEntry("서버", N, N, 3400, "NNG"),
        MorphEntry("데이터", N, N, 3400, "NNG"),
        MorphEntry("먹다", V, V, 4200, "VV"),
        MorphEntry("먹었다", V, V, 4500, "VV+EP+EF", pos_type="INFLECT",
                   morphemes=(("VV", "먹"), ("EP", "었"), ("EF", "다"))),
        MorphEntry("中國", N, N, 3600, "NNP", reading="중국"),
    ]
    matrix = [
        #  BOS    N     J     V
        [    0,  500, 2500, 1200],
        [  500,  900,  200, 1500],
        [  900,  300, 2500,  600],
        [  200, 1500,  400,  900],
    ]
    unknowns = UnknownDictionary({
        "HANGUL": [MorphEntry("*", N, N, 11000, "NNG")],
        "ALPHA": [MorphEntry("*", N, N, 6000, "SL")],
        "NUMERIC": [MorphEntry("*", N, N, 6000, "SN")],
        "HANJA": [MorphEntry("*", N, N, 9000, "NNG")],
        "SPACE": [MorphEntry(" ", 0, 0, 0, "SP")],
        "DEFAULT": [MorphEntry("*", N, N, 12000, "SY")],
    })
    char_def = CharacterDefinition(
        classes={
            "HANGUL": (False, True),
            "ALPHA": (True, True),
            "NUMERIC": (True, True),
            "HANJA": (False, False),
            "SPACE": (False, True),
            "DEFAULT": (True, True),
        },
        ranges=[
            (0xAC00, 0xD7AF, "HANGUL"),
            (0x4E00, 0x9FFF, "HANJA"),
            (ord("a"), ord("z"), "ALPHA"),
            (ord("A"), ord("Z"), "ALPHA"),
            (ord("0"), ord("9"), "NUMERIC"),
            (0x20, 0x20, "SPACE"),
        ],
    )
    return entries, ConnectionCosts(matrix), unknowns, char_def
