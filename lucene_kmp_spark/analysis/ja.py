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

_NATIVE_TOK = None  # unresolved -> run_tokenize_ja | False


def _native_tokenize(v, text):
    global _NATIVE_TOK
    if _NATIVE_TOK is None:
        try:
            from .cmorph import run_tokenize_ja
            _NATIVE_TOK = run_tokenize_ja
        except Exception:
            _NATIVE_TOK = False
    return _NATIVE_TOK(v, text) if _NATIVE_TOK else None


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
        # Compiled fast path: forward + search-mode backtrace in one C
        # call (analysis/cmorph.py run_tokenize_ja) — bit-identical token
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

    def tokenize_nbest(self, text: str, nbest_cost: int) -> list[MorphToken]:
        """ViterbiNBest.backtraceNBest + fixupPendingList
        (morph/ViterbiNBest.kt:37-125): emit the best path plus every
        alternative span whose total cost is within ``nbest_cost`` of it,
        deduplicated, offset-sorted, with positionLength derived from the
        distinct-offset index map."""
        self.forward(text)
        end_data, least_idx = self.best_end_index(len(text))
        if end_data is None:
            return []
        lat = _NBestLattice(self, len(text))
        lat.mark_unreachable()
        lat.calc_left()
        lat.calc_right()
        best_cost = lat.best_cost()
        pending: list[MorphToken] = []
        for node in lat.best_path():
            self._register_node(lat, node, pending)
        n = 2
        while True:
            nbest = lat.nbest_list(n)
            if not nbest:
                break
            if best_cost + nbest_cost < lat.cost(nbest[0]):
                break
            for node in nbest:
                self._register_node(lat, node, pending)
            n += 1
        return self._fixup_pending(pending)

    def _register_node(self, lat: _NBestLattice, node: int, pending):
        """KuromojiViterbiNBest.registerNode (:391-451)."""
        text = self.text
        left, right = lat.left[node], lat.right[node]
        ttype = lat.dic_type[node]
        if self.discard_punctuation and is_punctuation(text[left]):
            return
        entry = self.entry_of(lat.word_id[node], ttype)
        if ttype == USER and entry.segmentation:
            pending.append(MorphToken(text[left:right], left, right, USER, entry))
            current = 0
            for seg_len in entry.segmentation:
                if seg_len < right - left:
                    s = left + current
                    pending.append(MorphToken(
                        text[s : s + seg_len], s, s + seg_len, USER, entry))
                current += seg_len
        else:
            pending.append(MorphToken(text[left:right], left, right, ttype, entry))

    @staticmethod
    def _fixup_pending(pending: list[MorphToken]) -> list[MorphToken]:
        """ViterbiNBest.fixupPendingList (:84-125): sort (offset asc,
        length asc, type-ordinal desc), dedup same spans, positionLength =
        span width in distinct-offset units; posIncr 0 for tokens sharing a
        start offset (JapaneseTokenizer.incrementToken:219-226)."""
        pending.sort(key=lambda t: (t.start, t.end - t.start,
                                    -_TYPE_ORDINAL[t.type]))
        out: list[MorphToken] = []
        for t in pending:
            if out and out[-1].start == t.start and out[-1].end == t.end:
                continue
            out.append(t)
        offsets = sorted({o for t in out for o in (t.start, t.end)})
        index = {o: i for i, o in enumerate(offsets)}
        last = -1
        for t in out:
            t.position_length = index[t.end] - index[t.start]
            t.position_increment = 0 if t.start == last else 1
            last = t.start
        return out

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


# ----------------------------------------------------------------- n-best
_TYPE_ORDINAL = {KNOWN: 0, UNKNOWN: 1, USER: 2}


class _NBestLattice:
    """ViterbiNBest.Lattice (morph/ViterbiNBest.kt:176-479): a second
    lattice over ALL surviving back arcs with forward+backward cost DP;
    n-best extraction peels off least-total-cost unmarked spans until the
    cost gap exceeds nBestCost."""

    def __init__(self, viterbi: "JapaneseViterbi", end_pos: int):
        self.v = viterbi
        self.root_base = 0
        self.root_size = end_pos + 1
        self.l_root = [-1] * self.root_size
        self.r_root = [-1] * self.root_size
        # node-parallel arrays
        self.dic_type: list[str] = []
        self.word_id: list[int] = []
        self.mark: list[int] = []
        self.left_id: list[int] = []
        self.right_id: list[int] = []
        self.word_cost: list[int] = []
        self.left_cost: list[int] = []
        self.right_cost: list[int] = []
        self.left_node: list[int] = []
        self.right_node: list[int] = []
        self.left: list[int] = []
        self.right: list[int] = []
        self.left_chain: list[int] = []
        self.right_chain: list[int] = []

        first = viterbi.positions[0]
        self._add(first.back_type[0], first.back_id[0], -1, 0)  # BOS
        self._add(KNOWN, -1, end_pos, -1)  # EOS
        for offset in range(end_pos, 0, -1):
            if self.l_root[offset] >= 0 or offset == end_pos:
                pos_data = viterbi.positions.get(offset)
                if pos_data is None:
                    continue
                for i in range(pos_data.count):
                    self._add(pos_data.back_type[i], pos_data.back_id[i],
                              pos_data.back_pos[i], offset)

    def _add(self, dic_type, word_id, left, right) -> int:
        node = len(self.dic_type)
        self.dic_type.append(dic_type)
        self.word_id.append(word_id)
        self.mark.append(0)
        if word_id < 0:
            self.word_cost.append(0)
            self.left_id.append(0)
            self.right_id.append(0)
        else:
            e = self.v.entry_of(word_id, dic_type)
            self.word_cost.append(e.word_cost)
            self.left_id.append(e.left_id)
            self.right_id.append(e.right_id)
        self.left_cost.append(0)
        self.right_cost.append(0)
        self.left_node.append(-1)
        self.right_node.append(-1)
        self.left.append(left)
        self.right.append(right)
        if left >= 0:
            self.left_chain.append(self.l_root[left])
            self.l_root[left] = node
        else:
            self.left_chain.append(-1)
        if right >= 0:
            self.right_chain.append(self.r_root[right])
            self.r_root[right] = node
        else:
            self.right_chain.append(-1)
        return node

    def mark_unreachable(self):
        for index in range(1, self.root_size - 1):
            if self.r_root[index] < 0:
                node = self.l_root[index]
                while node >= 0:
                    self.mark[node] = -1
                    node = self.left_chain[node]

    def _conn(self, left_node, right_node) -> int:
        return self.v.costs.get(self.right_id[left_node], self.left_id[right_node])

    def calc_left(self):
        big = 1 << 60
        for index in range(self.root_size):
            node = self.l_root[index]
            while node >= 0:
                if self.mark[node] >= 0:
                    least, least_node = big, -1
                    ln = self.r_root[index]
                    while ln >= 0:
                        if self.mark[ln] >= 0:
                            c = (self.left_cost[ln] + self.word_cost[ln]
                                 + self._conn(ln, node))
                            if c < least:
                                least, least_node = c, ln
                        ln = self.right_chain[ln]
                    self.left_node[node] = least_node
                    self.left_cost[node] = least
                node = self.left_chain[node]

    def calc_right(self):
        big = 1 << 60
        for index in range(self.root_size - 1, -1, -1):
            node = self.r_root[index]
            while node >= 0:
                if self.mark[node] >= 0:
                    least, least_node = big, -1
                    rn = self.l_root[index]
                    while rn >= 0:
                        if self.mark[rn] >= 0:
                            c = (self.right_cost[rn] + self.word_cost[rn]
                                 + self._conn(node, rn))
                            if c < least:
                                least, least_node = c, rn
                        rn = self.left_chain[rn]
                    self.right_node[node] = least_node
                    self.right_cost[node] = least
                node = self.right_chain[node]

    def _mark_same_span(self, ref_node, value):
        left, right = self.left[ref_node], self.right[ref_node]
        node = self.l_root[left]
        while node >= 0:
            if self.right[node] == right:
                self.mark[node] = value
            node = self.left_chain[node]

    def cost(self, node) -> int:
        return self.left_cost[node] + self.word_cost[node] + self.right_cost[node]

    def best_path(self) -> list[int]:
        out = []
        node = self.right_node[0]
        while node != 1:
            out.append(node)
            self._mark_same_span(node, 1)
            node = self.right_node[node]
        return out

    def nbest_list(self, n) -> list[int]:
        out: list[int] = []
        least, ll, lr = 1 << 62, -1, -1
        for node in range(2, len(self.dic_type)):
            if self.mark[node] == 0:
                c = self.cost(node)
                if c < least:
                    least, ll, lr = c, self.left[node], self.right[node]
                    out = [node]
                elif c == least and (self.left[node] != ll or self.right[node] != lr):
                    out.append(node)
        for node in out:
            self._mark_same_span(node, n)
        return out

    def best_cost(self) -> int:
        return self.left_cost[1]


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
    nbest_cost: int = 0,
):
    """JapaneseTokenizer with caller-supplied dictionaries; returns
    ``text -> [MorphToken]``. ``nbest_cost > 0`` enables n-best output
    (setNBestCost): alternative segmentations within that cost of the best
    path are emitted as overlapping tokens with positionLength."""
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
    try:  # pack native tables driver-side so workers inherit them
        from lucene_kmp_spark.analysis.cmorph import prepack
        prepack(v)
    except Exception:
        pass
    if nbest_cost > 0:
        return lambda text: v.tokenize_nbest(text, nbest_cost)
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
    nbest_cost: int = 0,
    reading_form: str | None = None,  # None | "katakana" | "romaji"
):
    """JapaneseAnalyzer.createComponents (JapaneseAnalyzer.kt:31-47) as a
    picklable ``text -> (terms, positions, length)`` chain. Defaults to the
    embedded demo dictionary; production callers pass their own (ipadic-
    format) tables. Default stop sets are empty because the reference's
    stopwords.txt/stoptags.txt ship with the (non-embedded) dictionary.
    ``normalize_numbers``/``iteration_marks`` add JapaneseNumberFilter /
    JapaneseIterationMarkCharFilter (separate factories in the reference,
    so opt-in here too); ``nbest_cost > 0`` indexes n-best alternatives as
    posIncr-0 overlaps (discounted from the norm length like every overlap,
    Similarity.kt:138-139)."""
    if entries is None:
        entries, connections, unknowns, char_def = demo_japanese_dictionary()
    tok = japanese_tokenizer(entries, connections, unknowns, char_def,
                             user_entries, mode, nbest_cost=nbest_cost)
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
        if reading_form:
            from lucene_kmp_spark.analysis.romaji import japanese_reading_form

            japanese_reading_form(tokens, use_romaji=reading_form == "romaji")
        out_terms, out_positions = [], []
        pos = -1
        kept = 0
        overlap = 0
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
            if t.position_increment == 0:
                overlap += 1  # discountOverlaps (Similarity.kt:138-139)
        return out_terms, out_positions, kept - overlap

    return run


# ------------------------------------------------------ user dictionaries
def parse_user_dictionary(
    text: str,
    left_id: int = 5,
    right_id: int = 5,
    word_cost: int = -100000,
) -> list[MorphEntry]:
    """kuromoji userdict.txt parser (ja/dict/UserDictionary.kt:29-100):
    CSV lines ``surface,segmentation,readings,pos`` with space-separated
    segmentation/readings, ``#`` comments, and the reference's validation
    (segment/reading counts match; concatenated segments equal the
    surface). Entries carry the fixed user-entry cost model
    (UserMorphData: WORD_COST=-100000, LEFT_ID=RIGHT_ID=5 — override the
    ids to match a caller-supplied connection matrix). Per-part readings
    are validated and kept on single-segment entries; multi-segment
    entries record the split lengths for the backtrace."""
    import csv
    import re

    entries: list[MorphEntry] = []
    for raw in text.splitlines():
        line = re.sub(r"#.*$", "", raw)
        if not line.strip():
            continue
        values = next(csv.reader([line]))
        if len(values) < 4:
            raise ValueError(f"illegal user dictionary entry: {raw!r}")
        surface = re.sub(r"\s", "", values[0])
        concatenated = re.sub(r"\s", "", values[1])
        segmentation = re.split(r" +", values[1].strip())
        readings = re.split(r" +", values[2].strip())
        pos = values[3]
        if len(segmentation) != len(readings):
            raise ValueError(
                f"Illegal user dictionary entry {values[0]} - the number of "
                f"segmentations ({len(segmentation)}) does not the match "
                f"number of readings ({len(readings)})"
            )
        if surface != concatenated:
            raise ValueError(
                f"Illegal user dictionary entry {values[0]} - the "
                f"concatenated segmentation ({concatenated}) does not match "
                f"the surface form ({surface})"
            )
        entries.append(
            MorphEntry(
                surface,
                left_id,
                right_id,
                word_cost,
                pos,
                reading=readings[0] if len(segmentation) == 1 else None,
                segmentation=(tuple(len(s) for s in segmentation)
                              if len(segmentation) > 1 else ()),
            )
        )
    return entries


# ------------------------------------------------------- demo dictionary
_DEMO_READINGS = {
    "関西": "カンサイ", "国際": "コクサイ", "空港": "クウコウ",
    "関西国際空港": "カンサイコクサイクウコウ", "日本": "ニホン",
    "経済": "ケイザイ", "新聞": "シンブン",
    "日本経済新聞": "ニホンケイザイシンブン",
    "の": "ノ", "に": "ニ", "は": "ハ", "を": "ヲ",
    "行く": "イク", "行き": "イキ", "ます": "マス",
    "検索": "ケンサク", "エンジン": "エンジン", "サーバー": "サーバー",
    "寿司": "スシ",
}


def demo_japanese_dictionary_with_readings():
    """The demo tables with katakana readings attached to every entry —
    exercises JapaneseReadingFormFilter / romaji output end-to-end
    (JapaneseReadingFormFilter.kt; readings are per-entry dictionary data
    in ipadic, caller-supplied here like everything else)."""
    import dataclasses

    entries, conn, unk, cd = demo_japanese_dictionary()
    entries = [
        dataclasses.replace(e, reading=_DEMO_READINGS.get(e.surface))
        for e in entries
    ]
    return entries, conn, unk, cd


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
