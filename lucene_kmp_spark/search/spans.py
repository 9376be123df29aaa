"""Span algebra evaluation (``queries/spans/`` — SpanTermQuery, SpanOrQuery,
SpanNotQuery, SpanFirstQuery, SpanNearQuery over nested clauses).

A span is ``(start, end, width)`` with exclusive ``end``. ``width`` follows
the reference exactly:

* term span: width 0;
* ordered near (NearSpansOrdered.kt ``stretchToOrder``): width =
  Σ over consecutive clause pairs of ``next.start - prev.end`` — the gaps at
  THIS nesting level only; child widths do NOT accumulate into the parent;
* unordered near (NearSpansUnordered.kt ``width()``): width =
  ``maxEndPosition - top.start`` — the covering-window length (the match
  TEST uses the gap ``maxEnd - top.start - Σ spanLength <= slop``, but the
  reported width is the window).

The SpanScorer freq is ``Σ 1/(1 + width)`` over a doc's spans in emission
order, accumulated in float32 (SpanScorer.kt:82 ``setFreqCurrentDoc``).

``eval_spans(q, pos)`` evaluates a span tree against one document's
``{term: sorted positions}`` map; it is pure python/numpy and runs inside the
Arrow scoring UDF, once per candidate doc.
"""

from __future__ import annotations

import bisect

import numpy as np

from lucene_kmp_spark.search.query import (
    Query,
    SpanContainingQuery,
    SpanFirstQuery,
    SpanNearQuery,
    SpanNotQuery,
    SpanOrQuery,
    SpanPositionRangeQuery,
    SpanTermQuery,
    SpanWithinQuery,
)

Span = tuple[int, int, int]  # start, end(exclusive), width


def span_terms(q) -> set[str]:
    if isinstance(q, str):
        return {q}
    if isinstance(q, SpanTermQuery):
        return {q.term}
    if isinstance(q, SpanOrQuery):
        return set().union(*(span_terms(c) for c in q.clauses)) if q.clauses else set()
    if isinstance(q, SpanNotQuery):
        return span_terms(q.include) | span_terms(q.exclude)
    if isinstance(q, (SpanFirstQuery, SpanPositionRangeQuery)):
        return span_terms(q.match)
    if isinstance(q, (SpanContainingQuery, SpanWithinQuery)):
        return span_terms(q.big) | span_terms(q.little)
    if isinstance(q, SpanNearQuery):
        return set().union(*(span_terms(c) for c in q.terms)) if q.terms else set()
    raise TypeError(f"not a span clause: {type(q).__name__}")


def eval_spans(q, pos: dict) -> list[Span]:
    """Spans of q in one doc, sorted by (start, end)."""
    if isinstance(q, str):
        ps = pos.get(q)
        return [(int(p), int(p) + 1, 0) for p in (ps if ps is not None else [])]
    if isinstance(q, SpanTermQuery):
        return eval_spans(q.term, pos)
    if isinstance(q, SpanOrQuery):
        out: list[Span] = []
        for c in q.clauses:
            out.extend(eval_spans(c, pos))
        out.sort()
        return out
    if isinstance(q, SpanNotQuery):
        excl = eval_spans(q.exclude, pos)
        out = []
        for s, e, w in eval_spans(q.include, pos):
            lo, hi = s - q.pre, e + q.post
            if not any(xs < hi and xe > lo for xs, xe, _ in excl):
                out.append((s, e, w))
        return out
    if isinstance(q, SpanFirstQuery):
        return [sp for sp in eval_spans(q.match, pos) if sp[1] <= q.end]
    if isinstance(q, SpanPositionRangeQuery):
        # SpanPositionRangeQuery.acceptPosition: start >= start AND end <= end
        return [
            sp for sp in eval_spans(q.match, pos) if sp[0] >= q.start and sp[1] <= q.end
        ]
    if isinstance(q, SpanContainingQuery):
        # keep big spans containing >=1 little span (ContainSpans; payload
        # and width come from big)
        little = eval_spans(q.little, pos)
        return [
            b
            for b in eval_spans(q.big, pos)
            if any(b[0] <= ls and le <= b[1] for ls, le, _ in little)
        ]
    if isinstance(q, SpanWithinQuery):
        # keep little spans lying within >=1 big span (SpanWithinQuery.kt)
        big = eval_spans(q.big, pos)
        return [
            l
            for l in eval_spans(q.little, pos)
            if any(bs <= l[0] and l[1] <= be for bs, be, _ in big)
        ]
    if isinstance(q, SpanNearQuery):
        lists = [eval_spans(c, pos) for c in q.terms]
        if any(not lst for lst in lists):
            return []
        return (
            _near_ordered(lists, q.slop) if q.in_order else _near_unordered(lists, q.slop)
        )
    raise TypeError(f"not a span clause: {type(q).__name__}")


def _near_ordered(lists: list[list[Span]], slop: int) -> list[Span]:
    """Faithful NearSpansOrdered.kt: clause iterators are stateful and
    forward-only across matches; for each successive span of clause 0,
    ``stretchToOrder`` advances each later clause while ``start < prev.end``
    and sums the gaps ``start - prev.end``; a match is emitted when the gap
    sum is <= slop, with width = that gap sum (child widths excluded).
    Matching stops when any later clause exhausts in the doc."""
    n = len(lists)
    out: list[Span] = []
    idx = [0] * n  # forward-only iterator state per clause (never rewinds)
    starts = [[sp[0] for sp in lst] for lst in lists]
    for i0 in range(len(lists[0])):
        first = lists[0][i0]
        prev_end = first[1]
        width = 0
        for k in range(1, n):
            j = bisect.bisect_left(starts[k], prev_end)
            if j < idx[k]:
                j = idx[k]
            if j >= len(lists[k]):
                return out  # oneExhaustedInCurrentDoc
            idx[k] = j
            sp = lists[k][j]
            width += sp[0] - prev_end
            prev_end = sp[1]
        if width <= slop:
            out.append((first[0], prev_end, width))
    return out


def _near_unordered(lists: list[list[Span]], slop: int) -> list[Span]:
    """Faithful NearSpansUnordered.kt: a priority queue over the clauses'
    current spans ordered by (start, end); ``maxEnd`` is a high-water mark of
    every end seen this doc; each queue state where
    ``maxEnd - top.start - Σ currentSpanLength <= slop`` emits a match with
    width = ``maxEnd - top.start`` (the covering window, ``width()``); then
    the top clause advances one span. Stops when any clause exhausts."""
    import heapq

    n = len(lists)
    idx = [0] * n
    cur = [lst[0] for lst in lists]
    total_len = sum(e - s for s, e, _w in cur)
    max_end = max(e for _s, e, _w in cur)
    heap = [(cur[k][0], cur[k][1], k) for k in range(n)]
    heapq.heapify(heap)
    out: list[Span] = []
    while True:
        ts, te, tk = heap[0]
        if max_end - ts - total_len <= slop:
            out.append((ts, max_end, max_end - ts))
        j = idx[tk] + 1
        if j >= len(lists[tk]):
            out.sort()
            return out
        idx[tk] = j
        ns, ne, _w = lists[tk][j]
        total_len += (ne - ns) - (te - ts)
        if ne > max_end:
            max_end = ne
        heapq.heapreplace(heap, (ns, ne, tk))


def span_scoring_terms(q) -> set[str]:
    """Terms contributing to the scoring weight: SpanNotQuery's exclude side
    matches but never scores (SpanNotQuery.createWeight gathers termStates
    from the include clause only)."""
    if isinstance(q, SpanNotQuery):
        return span_scoring_terms(q.include)
    if isinstance(q, (str, SpanTermQuery)):
        return span_terms(q)
    if isinstance(q, SpanOrQuery):
        return set().union(*(span_scoring_terms(c) for c in q.clauses)) if q.clauses else set()
    if isinstance(q, (SpanFirstQuery, SpanPositionRangeQuery)):
        return span_scoring_terms(q.match)
    if isinstance(q, (SpanContainingQuery, SpanWithinQuery)):
        # both sides' termStates feed the weight
        # (SpanContainQuery getTermStates(bigWeight, littleWeight))
        return span_scoring_terms(q.big) | span_scoring_terms(q.little)
    if isinstance(q, SpanNearQuery):
        return set().union(*(span_scoring_terms(c) for c in q.terms)) if q.terms else set()
    raise TypeError(f"not a span clause: {type(q).__name__}")


def span_freq(q, pos: dict) -> float:
    """SpanScorer freq: Σ 1/(1+width) over the doc's top-level spans, in
    emission order, accumulated in float32 (SpanScorer.kt:82)."""
    freq = np.float32(0.0)
    one = np.float32(1.0)
    for _s, _e, w in eval_spans(q, pos):
        freq += one / (one + np.float32(w))
    return float(freq)


# --------------------------------------------------------- field masking
FIELD_SEP = "\x00"  # joins (field, term) into one position-map key


def resolve_masks(q, primary_field: str, expand=None):
    """Rewrite a span tree containing FieldMaskingSpanQuery nodes
    (queries/spans/FieldMaskingSpanQuery.kt) into a mask-free tree whose term
    leaves are ``field\\x00term`` keys, plus the per-field term sets to fetch.

    The masked subtree keeps its own REAL field for position lookup while
    composing positionally with the enclosing clauses — evaluation then runs
    on a single per-doc position map with field-qualified keys, so
    ``eval_spans`` needs no notion of fields at all.

    ``expand(node, field)`` resolves SpanMultiTermWrapper nodes against the
    right field's term dictionary (the caller owns the per-field searchers).

    Returns ``(rewritten, per_field)`` where ``per_field`` maps field name ->
    sorted list of raw terms needed from that field's postings."""
    from lucene_kmp_spark.search.query import FieldMaskingSpanQuery, SpanMultiTermWrapper

    per_field: dict[str, set[str]] = {}

    def walk(node, field):
        if isinstance(node, str):
            per_field.setdefault(field, set()).add(node)
            return field + FIELD_SEP + node
        if isinstance(node, FieldMaskingSpanQuery):
            return walk(node.match, node.field)
        if isinstance(node, SpanMultiTermWrapper):
            if expand is None:
                raise TypeError(
                    "SpanMultiTermWrapper in a masked span tree needs an "
                    "expand callback (term-dict expansion is per-field)"
                )
            return walk(expand(node, field), field)
        if isinstance(node, SpanTermQuery):
            per_field.setdefault(field, set()).add(node.term)
            return SpanTermQuery(field + FIELD_SEP + node.term, boost=node.boost)
        if isinstance(node, SpanOrQuery):
            return SpanOrQuery(tuple(walk(c, field) for c in node.clauses), boost=node.boost)
        if isinstance(node, SpanNotQuery):
            return SpanNotQuery(
                walk(node.include, field), walk(node.exclude, field),
                pre=node.pre, post=node.post, boost=node.boost,
            )
        if isinstance(node, SpanFirstQuery):
            return SpanFirstQuery(walk(node.match, field), node.end, boost=node.boost)
        if isinstance(node, SpanPositionRangeQuery):
            return SpanPositionRangeQuery(
                walk(node.match, field), node.start, node.end, boost=node.boost
            )
        if isinstance(node, SpanContainingQuery):
            return SpanContainingQuery(
                walk(node.big, field), walk(node.little, field), boost=node.boost
            )
        if isinstance(node, SpanWithinQuery):
            return SpanWithinQuery(
                walk(node.big, field), walk(node.little, field), boost=node.boost
            )
        if isinstance(node, SpanNearQuery):
            return SpanNearQuery(
                tuple(walk(c, field) for c in node.terms),
                slop=node.slop, in_order=node.in_order, boost=node.boost,
            )
        raise TypeError(f"not a span clause: {type(node).__name__}")

    rewritten = walk(q, primary_field)
    return rewritten, {f: sorted(ts) for f, ts in per_field.items()}
