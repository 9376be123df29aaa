"""Faithful per-doc port of Lucene's sloppy phrase matching.

Reproduces the reference's ``search/SloppyPhraseMatcher.kt`` (:133-679):
a priority-queue traversal over offset-adjusted term positions that always
advances the minimal PhrasePositions, minimizes each match's length before
emitting it, and resolves repeating-term collisions via repetition groups
(rptGroups, ``SloppyPhraseMatcher.kt:190-340``).  The scorer accumulates
``freq += 1/(1 + matchLength)`` per emitted match (``PhraseScorer.kt``).

The priority queue is ported bit-for-bit from ``util/PriorityQueue.kt``
(1-based binary heap with live ``lessThan`` comparisons) because the
collision-resolution path re-queues entries whose positions changed while
enqueued — the emitted match sequence depends on that heap's exact behavior,
so a library heap with snapshot keys would diverge.

One deliberate delta (recorded in DEVIATIONS.md): Lucene runs repetition-group
detection once per *segment*, on the first candidate document, and reuses the
groups for every later doc — so when two different repeating terms happen to
share a position in that first doc, later docs' scores depend on segment
layout.  Here every doc derives its own groups (each doc is its own "first
candidate"), which is deterministic and partitioning-independent, and
identical to Lucene whenever grouping follows same-term equality (every
non-pathological phrase).
"""

from __future__ import annotations

import numpy as np

_MIN_INT = -(2**63)


class _PP:
    """PhrasePositions (search/PhrasePositions.kt): one phrase slot's
    position stream, adjusted by the slot's query offset."""

    __slots__ = (
        "plist", "offset", "ord", "terms", "count", "idx", "position",
        "rpt_group", "rpt_ind",
    )

    def __init__(self, plist: np.ndarray, offset: int, ord_: int, terms: tuple):
        self.plist = plist
        self.offset = offset
        self.ord = ord_
        self.terms = terms
        self.count = 0
        self.idx = 0
        self.position = 0
        self.rpt_group = -1
        self.rpt_ind = 0

    def first_position(self) -> bool:
        self.count = len(self.plist)
        self.idx = 0
        return self.next_position()

    def next_position(self) -> bool:
        if self.count > 0:
            self.count -= 1
            self.position = int(self.plist[self.idx]) - self.offset
            self.idx += 1
            return True
        return False


def _less_than(pp1: _PP, pp2: _PP) -> bool:
    """PhraseQueue.lessThan (search/PhraseQueue.kt): position, then query
    offset, then ord."""
    if pp1.position == pp2.position:
        if pp1.offset == pp2.offset:
            return pp1.ord < pp2.ord
        return pp1.offset < pp2.offset
    return pp1.position < pp2.position


class _PhraseQueue:
    """util/PriorityQueue.kt port with live comparisons — entries may mutate
    while enqueued (collision resolution), and the reference's pop order under
    a locally broken invariant is part of the observable match sequence."""

    def __init__(self, size: int):
        self._heap: list = [None] * (size + 1)
        self._size = 0

    def clear(self):
        for i in range(len(self._heap)):
            self._heap[i] = None
        self._size = 0

    def add(self, pp: _PP):
        self._size += 1
        self._heap[self._size] = pp
        self._up_heap(self._size)

    def top(self) -> _PP:
        return self._heap[1]

    def pop(self) -> _PP:
        result = self._heap[1]
        self._heap[1] = self._heap[self._size]
        self._heap[self._size] = None
        self._size -= 1
        self._down_heap(1)
        return result

    def __len__(self):
        return self._size

    def _up_heap(self, orig_pos: int):
        heap = self._heap
        i = orig_pos
        node = heap[i]
        j = i >> 1
        while j > 0 and _less_than(node, heap[j]):
            heap[i] = heap[j]
            i = j
            j = j >> 1
        heap[i] = node

    def _down_heap(self, i: int):
        heap, size = self._heap, self._size
        node = heap[i]
        j = i << 1
        k = j + 1
        if k <= size and _less_than(heap[k], heap[j]):
            j = k
        while j <= size and _less_than(heap[j], node):
            heap[i] = heap[j]
            i = j
            j = i << 1
            k = j + 1
            if k <= size and _less_than(heap[k], heap[j]):
                j = k
        heap[i] = node


class SloppyMatcher:
    """Per-doc SloppyPhraseMatcher. Construct per candidate doc, call
    ``reset()``, then iterate ``next_match()`` reading ``match_length``."""

    def __init__(self, pps: list[_PP], slop: int):
        self.phrase_positions = pps
        self.slop = slop
        self.pq = _PhraseQueue(len(pps))
        self.end = 0
        self.has_rpts = False
        self.has_multi_term_rpts = False
        self.rpt_groups: list[list[_PP]] = []
        self.positioned = False
        self.match_length = 0

    # ------------------------------------------------------------ main loop
    def reset(self):
        self.positioned = self._init_first_time()
        self.match_length = 2**31 - 1

    def next_match(self) -> bool:
        # SloppyPhraseMatcher.nextMatch (:142-173)
        if not self.positioned:
            return False
        pp = self.pq.pop()
        self.match_length = self.end - pp.position
        next_pos = self.pq.top().position
        while self._advance_pp(pp):
            if self.has_rpts and not self._advance_rpts(pp):
                break  # pps exhausted
            if pp.position > next_pos:  # done minimizing current match-length
                self.pq.add(pp)
                if self.match_length <= self.slop:
                    return True
                pp = self.pq.pop()
                next_pos = self.pq.top().position
                self.match_length = self.end - pp.position
            else:
                ml2 = self.end - pp.position
                if ml2 < self.match_length:
                    self.match_length = ml2
        self.positioned = False
        return self.match_length <= self.slop

    # ---------------------------------------------------------- pp movement
    def _advance_pp(self, pp: _PP) -> bool:
        if not pp.next_position():
            return False
        if pp.position > self.end:
            self.end = pp.position
        return True

    def _advance_rpts(self, pp: _PP) -> bool:
        # advanceRpts (:247-289): resolve the (single possible) collision by
        # advancing the lesser of the two colliding pps, then re-queue every
        # enqueued pp that moved
        if pp.rpt_group < 0:
            return True  # not a repeater
        rg = self.rpt_groups[pp.rpt_group]
        bits: set[int] = set()
        k0 = pp.rpt_ind
        while True:
            k = self._collide(pp)
            if k < 0:
                break
            pp = _lesser(pp, rg[k])
            if not self._advance_pp(pp):
                return False  # exhausted
            if k != k0:
                bits.add(k)
        # collisions resolved, now re-queue: empty (partially) the queue
        # until every advanced pp has been seen
        stack: list[_PP] = []
        while bits:
            pp2 = self.pq.pop()
            stack.append(pp2)
            if pp2.rpt_group >= 0:
                bits.discard(pp2.rpt_ind)
        for pp2 in reversed(stack):
            self.pq.add(pp2)
        return True

    def _collide(self, pp: _PP) -> int:
        tp = pp.position + pp.offset
        for pp2 in self.rpt_groups[pp.rpt_group]:
            if pp2 is not pp and pp2.position + pp2.offset == tp:
                return pp2.rpt_ind
        return -1

    # ------------------------------------------------------- initialization
    def _init_first_time(self) -> bool:
        # initFirstTime (:471-495) — per-doc here (see module docstring)
        for pp in self.phrase_positions:
            pp.first_position()
        self.end = _MIN_INT
        rpt_terms = self._repeating_terms()
        self.has_rpts = bool(rpt_terms)
        if self.has_rpts:
            rgs = self._gather_rpt_groups(rpt_terms)
            self._sort_rpt_groups(rgs)
            if not self._advance_repeat_groups():
                return False
        # fillQueue
        self.pq.clear()
        for pp in self.phrase_positions:
            if pp.position > self.end:
                self.end = pp.position
            self.pq.add(pp)
        return True

    def _repeating_terms(self) -> dict:
        # repeatingTerms (:573-586): terms appearing in >=2 slots, with ords
        tord: dict = {}
        tcnt: dict = {}
        for pp in self.phrase_positions:
            for t in pp.terms:
                cnt = tcnt.get(t, 0) + 1
                tcnt[t] = cnt
                if cnt == 2:
                    tord[t] = len(tord)
        return tord

    def _gather_rpt_groups(self, rpt_terms: dict) -> list[list[_PP]]:
        # gatherRptGroups (:517-566)
        rpp = []
        for pp in self.phrase_positions:
            for t in pp.terms:
                if t in rpt_terms:
                    rpp.append(pp)
                    self.has_multi_term_rpts |= len(pp.terms) > 1
                    break
        res: list[list[_PP]] = []
        if not self.has_multi_term_rpts:
            # simpler - no multi-terms - base on positions in this doc
            for i, pp in enumerate(rpp):
                if pp.rpt_group >= 0:
                    continue
                tp = pp.position + pp.offset
                for pp2 in rpp[i + 1:]:
                    if (
                        pp2.rpt_group >= 0
                        or pp2.offset == pp.offset
                        or pp2.position + pp2.offset != tp
                    ):
                        continue
                    g = pp.rpt_group
                    if g < 0:
                        g = len(res)
                        pp.rpt_group = g
                        res.append([pp])
                    pp2.rpt_group = g
                    res[g].append(pp2)
        else:
            # multi-terms: connected components of the (pp, term) bipartite
            # graph — ppTermsBitSets + unionTermGroups + termGroups (:612-679)
            bb = [frozenset(rpt_terms[t] for t in pp.terms if t in rpt_terms) for pp in rpp]
            groups: list[set] = [set(b) for b in bb]
            i = 0
            while i < len(groups) - 1:
                incr = 1
                j = i + 1
                while j < len(groups):
                    if groups[i] & groups[j]:
                        groups[i] |= groups[j]
                        del groups[j]
                        incr = 0
                    else:
                        j += 1
                i += incr
            tg = {}
            ord_to_term = {o: t for t, o in rpt_terms.items()}
            for gi, bits in enumerate(groups):
                for o in bits:
                    tg[ord_to_term[o]] = gi
            tmp: list[list[_PP]] = [[] for _ in groups]
            for pp in rpp:
                for t in pp.terms:
                    if t in rpt_terms:
                        g = tg[t]
                        if pp not in tmp[g]:
                            tmp[g].append(pp)
                        pp.rpt_group = g
            res = tmp
        return res

    def _sort_rpt_groups(self, rgs: list[list[_PP]]):
        # sortRptGroups (:499-513): by query offset; ord tiebreak for
        # determinism (Lucene's stable sort ties resolve by set order)
        self.rpt_groups = []
        for rg in rgs:
            rg = sorted(rg, key=lambda p: (p.offset, p.ord))
            for j, pp in enumerate(rg):
                pp.rpt_ind = j
            self.rpt_groups.append(rg)

    def _advance_repeat_groups(self) -> bool:
        # advanceRepeatGroups (:400-448)
        for rg in self.rpt_groups:
            if self.has_multi_term_rpts:
                i = 0
                while i < len(rg):
                    incr = 1
                    pp = rg[i]
                    while True:
                        k = self._collide(pp)
                        if k < 0:
                            break
                        pp2 = _lesser(pp, rg[k])
                        if not self._advance_pp(pp2):
                            return False  # exhausted
                        if pp2.rpt_ind < i:  # should not happen
                            incr = 0
                            break
                    i += incr
            else:
                # we know exactly how much to advance: rg[j] moves j times
                for j in range(1, len(rg)):
                    for _ in range(j):
                        if not rg[j].next_position():
                            return False
        return True


def _lesser(pp: _PP, pp2: _PP) -> _PP:
    if pp.position < pp2.position or (
        pp.position == pp2.position and pp.offset < pp2.offset
    ):
        return pp
    return pp2


def sloppy_freq(
    plists: list,
    slop: int,
    terms_per_slot: list | None = None,
    offsets: list | None = None,
) -> float:
    """Sloppy phrase freq for one candidate doc.

    ``plists``: one sorted position array per phrase slot (a multi-term slot
    passes the union of its terms' positions).  ``terms_per_slot``: the slot's
    term strings, for repetition detection; defaults to unique sentinels (no
    repeats).  ``offsets``: explicit query positions (holes allowed), default
    0..n-1.
    """
    n = len(plists)
    if n == 0 or any(len(p) == 0 for p in plists):
        return 0.0
    if n == 1:
        # single-slot phrase degenerates to a term: every occurrence is a
        # 0-length match (Lucene rewrites this shape to TermQuery)
        return float(len(plists[0]))
    if offsets is None:
        offsets = list(range(n))
    if terms_per_slot is None:
        terms_per_slot = [("\x00slot%d" % i,) for i in range(n)]
    pps = [
        _PP(np.asarray(plists[i], dtype=np.int64), int(offsets[i]), i, tuple(terms_per_slot[i]))
        for i in range(n)
    ]
    m = SloppyMatcher(pps, slop)
    m.reset()
    freq = 0.0
    while m.next_match():
        freq += 1.0 / (1.0 + m.match_length)
    return freq
