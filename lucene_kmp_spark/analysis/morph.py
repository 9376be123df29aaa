"""Shared Viterbi lattice framework for dictionary-based morphological
tokenizers — the kuromoji/nori machinery.

Semantics mirror the reference's shared framework
``analysis/common/.../analysis/morph/Viterbi.kt:49-262`` (forward pass,
``add()`` cost propagation at :284-325, EOS selection at :237-261) and
``morph/CharacterDefinition.kt`` (per-char class + per-class invoke/group
flags). Differences are representational only:

* The reference streams through a ``RollingCharBuffer`` with incremental
  frontier backtraces (Viterbi.kt:66-78) and a MAX_BACKTRACE_GAP pruning
  valve (:80-137) because its tokenizer wraps an unbounded ``Reader``. Our
  documents are bounded strings inside Arrow batches, so the lattice covers
  the whole string and backtraces once from EOS — by Viterbi optimal
  substructure the emitted path is identical (a frontier position with one
  live arc lies on every path).
* The FST over dictionary surfaces (TokenInfoFST) is replaced by a hash of
  surface forms probed per prefix length — an implementation detail of the
  common-prefix lookup, not of the cost model.

Dictionaries are CALLER-SUPPLIED (the reference downloads mecab-ipadic /
mecab-ko-dic at build time; neither repo embeds them) — the same contract as
``analysis/morfologik.py``. Small demo dictionaries for tests live with the
per-language modules.
"""

from __future__ import annotations

import unicodedata
from dataclasses import dataclass, field

KNOWN, UNKNOWN, USER = "KNOWN", "UNKNOWN", "USER"

MAX_UNKNOWN_WORD_LENGTH = 1024  # Viterbi.kt:28

# character classes whose presence marks punctuation for token discard —
# KuromojiViterbiNBest.kt:473-494 (same set in nori Viterbi.kt:283-304)
_PUNCT_CATEGORIES = frozenset(
    ("Zs", "Zl", "Zp", "Cc", "Cf", "Pd", "Ps", "Pe", "Pc", "Po",
     "Sm", "Sc", "Sk", "So", "Pi", "Pf")
)


_PUNCT_MEMO: dict[str, bool] = {}


def is_punctuation(ch: str) -> bool:
    v = _PUNCT_MEMO.get(ch)
    if v is None:
        if ord(ch) == 0x318D:  # nori Viterbi.kt:284 special-cases ㆍ
            v = True
        else:
            v = unicodedata.category(ch) in _PUNCT_CATEGORIES
        _PUNCT_MEMO[ch] = v
    return v


@dataclass(frozen=True)
class MorphEntry:
    """One dictionary row: surface form + the mecab cost model triple +
    morphological attributes. ``morphemes`` carries nori-style compound
    decomposition as ((pos_tag, surface), ...); ``segmentation`` carries
    kuromoji user-dictionary splits as (len, len, ...)."""

    surface: str
    left_id: int
    right_id: int
    word_cost: int
    pos: str = ""
    base_form: str | None = None
    reading: str | None = None
    pos_type: str = "MORPHEME"  # MORPHEME | COMPOUND | INFLECT | PREANALYSIS
    morphemes: tuple = ()
    segmentation: tuple = ()


class PrefixDictionary:
    """Common-prefix lookup over dictionary surfaces (TokenInfoFST role)."""

    def __init__(self, entries: list[MorphEntry]):
        self.entries = list(entries)
        self._by_surface: dict[str, list[int]] = {}
        self._max_len = 0
        for i, e in enumerate(self.entries):
            if not e.surface:
                raise ValueError("dictionary entry needs a surface form")
            self._by_surface.setdefault(e.surface, []).append(i)
            self._max_len = max(self._max_len, len(e.surface))
        # lengths that exist, ascending — skip probe lengths with no words
        self._lengths = sorted({len(s) for s in self._by_surface})

    def matches(self, text: str, start: int) -> list[tuple[int, list[int]]]:
        """[(length, [entry_idx...])] for every dictionary surface starting
        at ``start``, shortest first (the FST arc-walk emission order)."""
        out = []
        n = len(text)
        for length in self._lengths:
            if start + length > n:
                break
            ids = self._by_surface.get(text[start : start + length])
            if ids:
                out.append((length, ids))
        return out


class ConnectionCosts:
    """matrix.def analog: cost of connecting right-context id of the
    previous word to left-context id of the next (morph/ConnectionCosts.kt;
    ``get(rightID_prev, leftID_next)``)."""

    def __init__(self, matrix: list[list[int]]):
        self.matrix = matrix
        self._t: list[list[int]] | None = None  # lazy transpose for column()

    def get(self, right_id: int, left_id: int) -> int:
        return self.matrix[right_id][left_id]

    def column(self, left_id: int) -> list[int]:
        """``[get(r, left_id) for r in ids]`` as one row of the transpose —
        the arc-relaxation hot loop indexes it per incoming arc, saving a
        2-level indirection per lookup."""
        t = self._t
        if t is None:
            t = self._t = [list(col) for col in zip(*self.matrix)]
        return t[left_id]


class CharacterDefinition:
    """char.def analog (morph/CharacterDefinition.kt): maps a char to a
    class name; each class carries (invoke, group) flags. ``invoke`` forces
    unknown-word processing even when dictionary words matched; ``group``
    lets a run of same-class chars form one unknown word."""

    NGRAM = "NGRAM"  # extended-mode unigram class id analog

    def __init__(
        self,
        classes: dict[str, tuple[bool, bool]],
        ranges: list[tuple[int, int, str]],
        default: str = "DEFAULT",
    ):
        if default not in classes:
            classes = {**classes, default: (True, False)}
        self.classes = classes
        self.ranges = sorted(ranges)
        self.default = default
        self._memo: dict[str, str] = {}

    def char_class(self, ch: str) -> str:
        cls = self._memo.get(ch)
        if cls is None:
            cp = ord(ch)
            cls = self.default
            for lo, hi, name in self.ranges:
                if lo <= cp <= hi:
                    cls = name
                    break
            self._memo[ch] = cls
        return cls

    def is_invoke(self, ch: str) -> bool:
        return self.classes[self.char_class(ch)][0]

    def is_group(self, ch: str) -> bool:
        return self.classes[self.char_class(ch)][1]

    def is_kanji(self, ch: str) -> bool:
        return self.char_class(ch) == "KANJI"


class UnknownDictionary:
    """Per-character-class unknown entries (kuromoji/nori unk.def analog):
    class name -> [MorphEntry] (surface ignored, costs/ids used)."""

    def __init__(self, by_class: dict[str, list[MorphEntry]]):
        self.by_class = by_class

    def entries_for(self, class_name: str) -> list[MorphEntry]:
        return self.by_class.get(class_name, [])


@dataclass
class MorphToken:
    """A backtraced token: surface + offsets + provenance."""

    surface: str
    start: int
    end: int
    type: str
    entry: MorphEntry
    position_increment: int = 1
    position_length: int = 1


class _Pos:
    """One lattice position: parallel arrays of arcs ending here
    (Viterbi.Position, Viterbi.kt:350-402)."""

    __slots__ = ("pos", "costs", "last_right", "back_pos", "back_word_pos",
                 "back_index", "back_id", "back_type", "forward")

    def __init__(self, pos: int):
        self.pos = pos
        self.costs: list[int] = []
        self.last_right: list[int] = []
        self.back_pos: list[int] = []
        self.back_word_pos: list[int] = []
        self.back_index: list[int] = []
        self.back_id: list[int] = []
        self.back_type: list[str] = []
        self.forward: list[tuple[int, int, str]] = []  # (to_pos, word_id, type)

    @property
    def count(self) -> int:
        return len(self.costs)

    def add(self, cost, last_right, back_pos, back_word_pos, back_index,
            back_id, back_type):
        self.costs.append(cost)
        self.last_right.append(last_right)
        self.back_pos.append(back_pos)
        self.back_word_pos.append(back_word_pos)
        self.back_index.append(back_index)
        self.back_id.append(back_id)
        self.back_type.append(back_type)

    def reset(self):
        self.costs.clear()
        self.last_right.clear()
        self.back_pos.clear()
        self.back_word_pos.clear()
        self.back_index.clear()
        self.back_id.clear()
        self.back_type.clear()


_NATIVE = None  # unresolved -> run_forward | False


def _native_forward(v, text) -> bool:
    """Dispatch to the compiled forward kernel when available (lazy import
    to avoid a cycle: cmorph imports this module's classes)."""
    global _NATIVE
    if _NATIVE is None:
        try:
            from .cmorph import run_forward
            _NATIVE = run_forward
        except Exception:
            _NATIVE = False
    return _NATIVE(v, text) if _NATIVE else False


class ViterbiLattice:
    """The shared forward pass. Language subclasses provide unknown-word
    processing, penalties, and the backtrace."""

    def __init__(
        self,
        dictionary: PrefixDictionary,
        costs: ConnectionCosts,
        unk_dictionary: UnknownDictionary,
        char_def: CharacterDefinition,
        user_dictionary: PrefixDictionary | None = None,
        output_longest_user_only: bool = False,
        enable_space_penalty: bool = False,
    ):
        self.dictionary = dictionary
        self.costs = costs
        self.unk = unk_dictionary
        self.char_def = char_def
        self.user = user_dictionary
        self.output_longest_user_only = output_longest_user_only
        self.enable_space_penalty = enable_space_penalty
        self.positions: dict[int, _Pos] = {}
        self.text = ""

    # ------------------------------------------------------------ accessors
    def entry_of(self, word_id: int, ttype: str) -> MorphEntry:
        if ttype == KNOWN:
            return self.dictionary.entries[word_id]
        if ttype == USER:
            assert self.user is not None
            return self.user.entries[word_id]
        return self._unk_entries[word_id]

    def _pos_at(self, i: int) -> _Pos:
        p = self.positions.get(i)
        if p is None:
            p = _Pos(i)
            self.positions[i] = p
        return p

    # ----------------------------------------------------------- cost model
    def compute_penalty(self, pos: int, length: int) -> int:  # Viterbi.kt:330
        return 0

    def compute_space_penalty(self, entry: MorphEntry, num_spaces: int) -> int:
        return 0  # Viterbi.kt:327

    def _add(self, entry: MorphEntry, from_pos_data: _Pos, word_pos: int,
             end_pos: int, word_id: int, ttype: str, add_penalty: bool):
        """Viterbi.kt:284-325 — relax all arcs at from_pos into a new arc."""
        num_spaces = word_pos - from_pos_data.pos
        col = self.costs.column(entry.left_id)
        fc = from_pos_data.costs
        fr = from_pos_data.last_right
        least_cost = fc[0] + col[fr[0]]
        least_idx = 0
        for idx in range(1, len(fc)):
            cost = fc[idx] + col[fr[idx]]
            if cost < least_cost:
                least_cost, least_idx = cost, idx
        # space penalty depends only on (entry, num_spaces): identical for
        # every incoming arc, so hoisted out of the min (argmin unchanged)
        if num_spaces:
            least_cost += self.compute_space_penalty(entry, num_spaces)
        least_cost += entry.word_cost
        if add_penalty and ttype != USER:
            least_cost += self.compute_penalty(from_pos_data.pos,
                                               end_pos - from_pos_data.pos)
        self._pos_at(end_pos).add(
            least_cost, entry.right_id, from_pos_data.pos, word_pos,
            least_idx, word_id, ttype,
        )

    # -------------------------------------------------------- unknown words
    def should_skip_unknown(self, unknown_end: int, pos_data: _Pos) -> bool:
        return unknown_end > pos_data.pos  # Viterbi.kt:264-266

    def process_unknown(self, pos: int, pos_data: _Pos, any_matches: bool) -> int:
        raise NotImplementedError

    # -------------------------------------------------------------- forward
    def _flatten_unknowns(self):
        """Flatten unknown entries into one id space for entry_of — shared
        by the Python forward pass and the compiled fast paths."""
        self._unk_entries: list[MorphEntry] = []
        self._unk_ids: dict[str, list[int]] = {}
        for cls, entries in self.unk.by_class.items():
            ids = []
            for e in entries:
                ids.append(len(self._unk_entries))
                self._unk_entries.append(e)
            self._unk_ids[cls] = ids

    def forward(self, text: str):
        """Build the lattice (Viterbi.kt:49-233 minus streaming valves)."""
        self._flatten_unknowns()
        self.text = text
        n = len(text)
        self.positions = {}

        # Compiled forward pass (analysis/cmorph.py + _native/cmorph.c):
        # bit-identical lattice for the registered exact classes, built by
        # the C kernel when the machine has gcc; transparent fallback to
        # the Python loop below otherwise (LKS_MORPH_NATIVE=0 disables).
        if _native_forward(self, text):
            return

        self._pos_at(0).add(0, 0, -1, -1, -1, -1, KNOWN)
        unknown_end = -1
        user_max_ahead = -1
        pos = 0
        while pos < n:
            pos_data = self.positions.get(pos)
            if pos_data is None or pos_data.count == 0:
                pos += 1
                continue

            if (
                self.enable_space_penalty
                and unicodedata.category(text[pos]) == "Zs"
            ):
                # Viterbi.kt:139-143: a space at a live position shifts the
                # word start ahead; the arc still relaxes FROM pos_data, and
                # add() charges compute_space_penalty(numSpaces).  At EOF the
                # reference resets pos back to posData.pos (Viterbi.kt:140-141)
                # so the trailing space itself is matched as an unknown arc
                # that reaches EOS — breaking here would leave EOS empty.
                pos += 1
                if pos == n:
                    pos = pos_data.pos

            any_matches = False

            if self.user is not None:
                umatches = self.user.matches(text, pos)
                if umatches:
                    any_matches = True
                    if self.output_longest_user_only:
                        length, ids = umatches[-1]
                        if pos + length - 1 > user_max_ahead:
                            self._add(self.user.entries[ids[0]], pos_data,
                                      pos, pos + length, ids[0], USER, False)
                            user_max_ahead = pos + length - 1
                    else:
                        for length, ids in umatches:
                            for i in ids:
                                self._add(self.user.entries[i], pos_data,
                                          pos, pos + length, i, USER, False)

            if not any_matches:
                for length, ids in self.dictionary.matches(text, pos):
                    for wid in ids:
                        self._add(self.dictionary.entries[wid], pos_data,
                                  pos, pos + length, wid, KNOWN, False)
                        any_matches = True

            if not self.should_skip_unknown(unknown_end, pos_data):
                ulen = self.process_unknown(pos, pos_data, any_matches)
                if ulen:
                    unknown_end = pos_data.pos + ulen
            pos += 1

    def _add_unknown(self, class_name: str, pos_data: _Pos, word_pos: int,
                     end_pos: int):
        for uid in self._unk_ids.get(class_name, ()):
            self._add(self._unk_entries[uid], pos_data, word_pos, end_pos,
                      uid, UNKNOWN, False)

    def best_end_index(self, n: int) -> tuple[_Pos | None, int]:
        """EOS selection: least cost + connection(right, 0) (Viterbi.kt:237-252)."""
        end_data = self.positions.get(n)
        if end_data is None or end_data.count == 0:
            return None, -1
        least_cost, least_idx = None, -1
        for idx in range(end_data.count):
            cost = end_data.costs[idx] + self.costs.get(end_data.last_right[idx], 0)
            if least_cost is None or cost < least_cost:
                least_cost, least_idx = cost, idx
        return end_data, least_idx


def assign_positions(tokens: list[MorphToken]) -> tuple[list[str], list[int], int]:
    """Fold emitted tokens into the analyzer contract (terms, positions,
    length): position += posIncr per token; norm length counts tokens with
    posIncr > 0 plus overlaps per IndexingChain's discountOverlaps default
    (numTerms = length - numOverlap)."""
    terms: list[str] = []
    positions: list[int] = []
    pos = -1
    overlap = 0
    for t in tokens:
        if t.position_increment == 0 and pos >= 0:
            overlap += 1
        pos += t.position_increment if pos >= 0 or t.position_increment > 0 else 1
        if pos < 0:
            pos = 0
        terms.append(t.surface)
        positions.append(pos)
    return terms, positions, len(terms) - overlap
