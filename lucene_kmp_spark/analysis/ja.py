"""Japanese morphological analysis — the kuromoji machinery.

Semantics ported from the reference:

* ``analysis/kuromoji/.../ja/KuromojiViterbiNBest.kt`` — search-mode
  penalties (:44-47, computePenalty :69-85), unknown-word grouping by
  (character class, punctuation-ness) runs (:95-131), the backtrace with
  second-best compound splitting (:136-316) and the local pruneAndRescore
  lattice rebuild (:318-389), extended-mode unigram emission (:263-289),
  punctuation discard (:291).
* ``ja/JapaneseTokenizer.kt`` — modes NORMAL/SEARCH/EXTENDED (:37-41,
  default SEARCH :44), discardPunctuation/discardCompoundToken defaults.
* ``ja/JapaneseAnalyzer.kt:31-47`` — chain: CJKWidth char filter ->
  tokenizer -> BaseForm -> PartOfSpeechStop -> Stop -> KatakanaStem ->
  LowerCase.
* ``ja/JapaneseBaseFormFilter.kt`` / ``ja/JapaneseKatakanaStemFilter.kt``
  (min length 4, strip trailing U+30FC from all-katakana terms).

The system dictionary (mecab-ipadic) is NOT embedded in the reference (its
build downloads it); dictionaries here are caller-supplied in the same
shapes (entries + connection matrix + char classes + unknown defs). A small
hand-authored demo dictionary ships for tests and oracle rows; its costs are
chosen so the canonical kuromoji behaviors reproduce (関西国際空港 stays
one token in NORMAL mode and splits to 関西/国際/空港 in SEARCH mode —
the reference's own testDecomposition shape).
"""

from __future__ import annotations

from lucene_kmp_spark.analysis.cjk import cjk_width_fold
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
    assign_positions,
    is_punctuation,
)
from lucene_kmp_spark.analysis.standard import _lower_simple

# KuromojiViterbiNBest.kt:44-47
SEARCH_MODE_KANJI_LENGTH = 2
SEARCH_MODE_OTHER_LENGTH = 7
SEARCH_MODE_KANJI_PENALTY = 3000
SEARCH_MODE_OTHER_PENALTY = 1700

NORMAL, SEARCH, EXTENDED = "normal", "search", "extended"


class JapaneseViterbi(ViterbiLattice):
    def __init__(self, *args, search_mode=True, extended_mode=False,
                 discard_punctuation=True, output_compounds=False, **kw):
        super().__init__(*args, **kw)
        self.search_mode = search_mode
        self.extended_mode = extended_mode
        self.discard_punctuation = discard_punctuation
        self.output_compounds = output_compounds

    # ---------------------------------------------------------- cost hooks
    def compute_penalty(self, pos: int, length: int) -> int:
        """KuromojiViterbiNBest.computePenalty (:69-85)."""
        if length > SEARCH_MODE_KANJI_LENGTH:
            if all(self.char_def.is_kanji(c)
                   for c in self.text[pos : pos + length]):
                return (length - SEARCH_MODE_KANJI_LENGTH) * SEARCH_MODE_KANJI_PENALTY
            if length > SEARCH_MODE_OTHER_LENGTH:
                return (length - SEARCH_MODE_OTHER_LENGTH) * SEARCH_MODE_OTHER_PENALTY
        return 0

    def should_skip_unknown(self, unknown_end, pos_data):
        # :64-66 — search mode always processes unknown words
        return (not self.search_mode) and super().should_skip_unknown(
            unknown_end, pos_data)

    def process_unknown(self, pos: int, pos_data, any_matches: bool) -> int:
        """KuromojiViterbiNBest.processUnknownWord (:95-131): grouping runs
        share the first char's class AND punctuation-ness."""
        text = self.text
        first = text[pos]
        if any_matches and not self.char_def.is_invoke(first):
            return 0
        cls = self.char_def.char_class(first)
        if not self.char_def.is_group(first):
            length = 1
        else:
            is_punct = is_punctuation(first)
            length = 1
            while (length < 1024 and pos + length < len(text)
                   and self.char_def.char_class(text[pos + length]) == cls
                   and is_punctuation(text[pos + length]) == is_punct):
                length += 1
        self._add_unknown(cls, pos_data, pos, pos_data.pos + length)
        return length

    # ------------------------------------------------------------ backtrace
    def tokenize(self, text: str) -> list[MorphToken]:
        self.forward(text)
        end_data, least_idx = self.best_end_index(len(text))
        if end_data is None:
            return []
        pending: list[MorphToken] = []
        self._backtrace(end_data, least_idx, pending)
        return list(reversed(pending))

    def _backtrace(self, end_pos_data, from_idx, pending):
        """KuromojiViterbiNBest.backtrace (:136-316) with lastBackTracePos
        fixed at 0 (whole-string lattice)."""
        text = self.text
        pos = end_pos_data.pos
        best_idx = from_idx
        alt_token = None
        last_left_word_id = -1
        back_count = 0

        while pos > 0:
            pos_data = self.positions[pos]
            back_pos = pos_data.back_pos[best_idx]
            length = pos - back_pos
            back_type = pos_data.back_type[best_idx]
            back_id = pos_data.back_id[best_idx]
            next_best_idx = pos_data.back_index[best_idx]

            if self.search_mode and alt_token is None and back_type != USER:
                penalty = self.compute_penalty(back_pos, length)
                if penalty > 0:
                    max_cost = pos_data.costs[best_idx] + penalty
                    if last_left_word_id != -1:
                        max_cost += self.costs.get(
                            self.entry_of(back_id, back_type).right_id,
                            last_left_word_id)
                    self._prune_and_rescore(back_pos, pos,
                                            pos_data.back_index[best_idx])
                    least_cost, least_idx = None, -1
                    for idx in range(pos_data.count):
                        cost = pos_data.costs[idx]
                        if last_left_word_id != -1:
                            cost += self.costs.get(
                                self.entry_of(pos_data.back_id[idx],
                                              pos_data.back_type[idx]).right_id,
                                last_left_word_id)
                        if least_cost is None or cost < least_cost:
                            least_cost, least_idx = cost, idx
                    if (least_idx != -1 and least_cost <= max_cost
                            and pos_data.back_pos[least_idx] != back_pos):
                        alt_token = MorphToken(
                            text[back_pos:pos], back_pos, pos, back_type,
                            self.entry_of(back_id, back_type))
                        best_idx = least_idx
                        next_best_idx = pos_data.back_index[best_idx]
                        back_pos = pos_data.back_pos[best_idx]
                        length = pos - back_pos
                        back_type = pos_data.back_type[best_idx]
                        back_id = pos_data.back_id[best_idx]
                        back_count = 0

            if alt_token is not None and alt_token.start >= back_pos:
                # emit the compound alongside its parts (discardCompoundToken
                # =false / outputCompounds) with positionLength = #parts
                if self.output_compounds and back_count > 0:
                    back_count += 1
                    alt_token.position_length = back_count
                    pending.append(alt_token)
                alt_token = None

            entry = self.entry_of(back_id, back_type)

            if back_type == USER and entry.segmentation:
                # UserDictionary.lookupSegmentation: compound user entry
                # splits into fixed-length parts (:239-262)
                current = 0
                part_tokens = []
                for seg_len in entry.segmentation:
                    s = back_pos + current
                    part_tokens.append(MorphToken(
                        text[s : s + seg_len], s, s + seg_len, USER, entry))
                    current += seg_len
                pending.extend(reversed(part_tokens))
                back_count += len(part_tokens)
            elif self.extended_mode and back_type == UNKNOWN:
                # :263-289 unigram the unknown span (surrogate-aware)
                i = length - 1
                while i >= 0:
                    char_len = 1
                    if i > 0 and 0xDC00 <= ord(text[back_pos + i]) <= 0xDFFF:
                        i -= 1
                        char_len = 2
                    ch = text[back_pos + i]
                    if not self.discard_punctuation or not is_punctuation(ch):
                        pending.append(MorphToken(
                            text[back_pos + i : back_pos + i + char_len],
                            back_pos + i, back_pos + i + char_len,
                            UNKNOWN, entry))
                        back_count += 1
                    i -= 1
            elif (not self.discard_punctuation or length == 0
                  or not is_punctuation(text[back_pos])):
                pending.append(MorphToken(
                    text[back_pos:pos], back_pos, pos, back_type, entry))
                back_count += 1

            last_left_word_id = entry.left_id
            pos = back_pos
            best_idx = next_best_idx

    def _prune_and_rescore(self, start_pos, end_pos, best_start_idx):
        """KuromojiViterbiNBest.pruneAndRescore (:318-389): rebuild the
        lattice slice [start_pos, end_pos] with search penalties applied."""
        # collect forward arcs from the back arcs, then clear the slice
        pos = end_pos
        while pos > start_pos:
            pos_data = self.positions.get(pos)
            if pos_data is not None:
                for idx in range(pos_data.count):
                    bp = pos_data.back_pos[idx]
                    if bp >= start_pos:
                        self._pos_at(bp).forward.append(
                            (pos, pos_data.back_id[idx], pos_data.back_type[idx]))
                pos_data.reset()
            pos -= 1

        for pos2 in range(start_pos, end_pos):
            pos_data = self.positions.get(pos2)
            if pos_data is None or (pos_data.count == 0 and pos2 != start_pos):
                if pos_data is not None:
                    pos_data.forward.clear()
                continue
            if pos2 == start_pos:
                # seed from the single surviving incoming arc
                if start_pos == 0:
                    right_id = 0
                else:
                    right_id = self.entry_of(
                        pos_data.back_id[best_start_idx],
                        pos_data.back_type[best_start_idx]).right_id
                path_cost = pos_data.costs[best_start_idx]
                for to_pos, word_id, ttype in pos_data.forward:
                    entry = self.entry_of(word_id, ttype)
                    new_cost = (path_cost + entry.word_cost
                                + self.costs.get(right_id, entry.left_id)
                                + self.compute_penalty(pos2, to_pos - pos2))
                    self._pos_at(to_pos).add(
                        new_cost, entry.right_id, pos2, -1, best_start_idx,
                        word_id, ttype)
            else:
                for to_pos, word_id, ttype in pos_data.forward:
                    self._add(self.entry_of(word_id, ttype), pos_data, pos2,
                              to_pos, word_id, ttype, True)
            pos_data.forward.clear()


# ---------------------------------------------------------------- filters
def base_form_filter(tokens):
    """JapaneseBaseFormFilter: replace term with the lemma."""
    for t in tokens:
        if t.entry.base_form:
            t.surface = t.entry.base_form
    return tokens


def katakana_stem(term: str, minimum_length: int = 4) -> str:
    """JapaneseKatakanaStemFilter.stem (:40-61)."""
    if len(term) < minimum_length:
        return term
    if not all("゠" <= c <= "ヿ" for c in term):
        return term
    if term[-1] == "ー":
        return term[:-1]
    return term


# ------------------------------------------------------------- tokenizer
def japanese_tokenizer(
    entries: list[MorphEntry],
    connections: ConnectionCosts,
    unknowns: UnknownDictionary,
    char_def: CharacterDefinition,
    user_entries: list[MorphEntry] | None = None,
    mode: str = SEARCH,
    discard_punctuation: bool = True,
    discard_compound_token: bool = True,
):
    """JapaneseTokenizer with caller-supplied dictionaries; returns
    ``text -> [MorphToken]``."""
    v = JapaneseViterbi(
        PrefixDictionary(entries),
        connections,
        unknowns,
        char_def,
        user_dictionary=PrefixDictionary(user_entries) if user_entries else None,
        search_mode=mode in (SEARCH, EXTENDED),
        extended_mode=mode == EXTENDED,
        discard_punctuation=discard_punctuation,
        output_compounds=not discard_compound_token,
    )
    return v.tokenize


def japanese_analyzer(
    entries: list[MorphEntry] | None = None,
    connections: ConnectionCosts | None = None,
    unknowns: UnknownDictionary | None = None,
    char_def: CharacterDefinition | None = None,
    user_entries: list[MorphEntry] | None = None,
    mode: str = SEARCH,
    stop_words=(),
    stop_tags=(),
    normalize_numbers: bool = False,
    iteration_marks: bool = False,
):
    """JapaneseAnalyzer.createComponents (JapaneseAnalyzer.kt:31-47) as a
    picklable ``text -> (terms, positions, length)`` chain. Defaults to the
    embedded demo dictionary; production callers pass their own (ipadic-
    format) tables. Default stop sets are empty because the reference's
    stopwords.txt/stoptags.txt ship with the (non-embedded) dictionary.
    ``normalize_numbers``/``iteration_marks`` add JapaneseNumberFilter /
    JapaneseIterationMarkCharFilter (separate factories in the reference,
    so opt-in here too)."""
    if entries is None:
        entries, connections, unknowns, char_def = demo_japanese_dictionary()
    tok = japanese_tokenizer(entries, connections, unknowns, char_def,
                             user_entries, mode)
    stop = frozenset(stop_words)
    tags = frozenset(stop_tags)

    def run(text: str):
        if not text:
            return [], [], 0
        if iteration_marks:
            from lucene_kmp_spark.analysis.cjk_numbers import iteration_mark_fold

            text = iteration_mark_fold(text)
        tokens = tok(cjk_width_fold(text))
        if normalize_numbers:
            from lucene_kmp_spark.analysis.cjk_numbers import japanese_number_filter

            tokens = japanese_number_filter(tokens)
        base_form_filter(tokens)
        out_terms, out_positions = [], []
        pos = -1
        kept = 0
        for t in tokens:
            pos += t.position_increment
            term = t.surface
            if tags and t.entry.pos in tags:
                continue  # PartOfSpeechStopFilter (position hole kept)
            if term in stop:
                continue
            term = _lower_simple(katakana_stem(term))
            out_terms.append(term)
            out_positions.append(max(pos, 0))
            kept += 1
        return out_terms, out_positions, kept

    return run


# ------------------------------------------------------- demo dictionary
def demo_japanese_dictionary():
    """Hand-authored ipadic-shaped demo tables (NOT extracted from ipadic —
    surfaces are common vocabulary, costs are chosen for hand-derivable
    lattices). Context ids: 0=BOS/EOS, 1=noun, 2=particle, 3=verb."""
    N, P, V = 1, 2, 3
    entries = [
        MorphEntry("関西", N, N, 3500, "名詞-固有名詞-地域"),
        MorphEntry("国際", N, N, 3600, "名詞-一般"),
        MorphEntry("空港", N, N, 3400, "名詞-一般"),
        MorphEntry("関西国際空港", N, N, 6000, "名詞-固有名詞-組織"),
        MorphEntry("日本", N, N, 3000, "名詞-固有名詞-地域"),
        MorphEntry("経済", N, N, 3500, "名詞-一般"),
        MorphEntry("新聞", N, N, 3600, "名詞-一般"),
        MorphEntry("日本経済新聞", N, N, 6200, "名詞-固有名詞-組織"),
        MorphEntry("の", P, P, 1000, "助詞-連体化"),
        MorphEntry("に", P, P, 1000, "助詞-格助詞-一般"),
        MorphEntry("は", P, P, 1100, "助詞-係助詞"),
        MorphEntry("を", P, P, 1000, "助詞-格助詞-一般"),
        MorphEntry("行く", V, V, 4000, "動詞-自立", base_form="行く"),
        MorphEntry("行き", V, V, 4200, "動詞-自立", base_form="行く"),
        MorphEntry("ます", V, V, 2000, "助動詞"),
        MorphEntry("検索", N, N, 3500, "名詞-サ変接続"),
        MorphEntry("エンジン", N, N, 3800, "名詞-一般"),
        MorphEntry("サーバー", N, N, 3800, "名詞-一般"),
        MorphEntry("寿司", N, N, 3400, "名詞-一般"),
    ]
    # 4x4 connection matrix over (BOS/EOS, noun, particle, verb): cheap
    # noun->particle / particle->noun / noun->EOS transitions, the shape of
    # the ipadic matrix at toy scale
    matrix = [
        #  BOS    N     P     V
        [    0,  500, 2000, 1000],  # from BOS/EOS
        [  500,  800,  200, 1500],  # from noun
        [ 1000,  300, 2000,  500],  # from particle
        [  200, 1500,  300,  800],  # from verb
    ]
    unknowns = UnknownDictionary({
        "KANJI": [MorphEntry("*", N, N, 12000, "名詞-一般")],
        "KATAKANA": [MorphEntry("*", N, N, 9000, "名詞-一般")],
        "HIRAGANA": [MorphEntry("*", P, P, 9000, "助詞")],
        "ALPHA": [MorphEntry("*", N, N, 6000, "名詞-一般")],
        "NUMERIC": [MorphEntry("*", N, N, 6000, "名詞-数")],
        "DEFAULT": [MorphEntry("*", N, N, 12000, "記号-一般")],
    })
    char_def = CharacterDefinition(
        classes={
            # (invoke, group) — ipadic char.def flag shapes
            "KANJI": (False, False),
            "KATAKANA": (True, True),
            "HIRAGANA": (True, True),
            "ALPHA": (True, True),
            "NUMERIC": (True, True),
            "DEFAULT": (True, True),
        },
        ranges=[
            (0x4E00, 0x9FFF, "KANJI"),
            (0x30A0, 0x30FF, "KATAKANA"),
            (0x3040, 0x309F, "HIRAGANA"),
            (ord("a"), ord("z"), "ALPHA"),
            (ord("A"), ord("Z"), "ALPHA"),
            (ord("0"), ord("9"), "NUMERIC"),
        ],
    )
    return entries, ConnectionCosts(matrix), unknowns, char_def
