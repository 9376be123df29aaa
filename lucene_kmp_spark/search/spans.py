"""Span algebra evaluation (``queries/spans/`` — SpanTermQuery, SpanOrQuery,
SpanNotQuery, SpanFirstQuery, SpanNearQuery over nested clauses).

A span is ``(start, end, width)`` with exclusive ``end``; ``width`` is the
accumulated slop (total gap) inside the span — a term span has width 0, a
near span adds its chain gap to its children's widths (NearSpansOrdered /
NearSpansUnordered semantics). The SpanScorer freq is
``Σ 1/(1 + width)`` over a doc's top-level spans (SpanScorer sloppy weight).

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


def _span_len_width(picks: list[Span]) -> tuple[int, int]:
    total_len = sum(e - s for s, e, _ in picks)
    sub_width = sum(w for _s, _e, w in picks)
    return total_len, sub_width


def _near_ordered(lists: list[list[Span]], slop: int) -> list[Span]:
    """Non-overlapping clause spans in order; leading span shrunk forward
    (NearSpansOrdered stretch/shrink loop); gap = coverage - Σ lengths."""
    n = len(lists)
    out: list[Span] = []
    a0 = lists[0]
    starts = [[sp[0] for sp in lst] for lst in lists]
    i0 = 0
    while i0 < len(a0):
        prev_end = a0[i0][1]
        picks: list[Span] = [a0[i0]]
        ok = True
        for k in range(1, n):
            j = bisect.bisect_left(starts[k], prev_end)
            if j >= len(lists[k]):
                ok = False
                break
            picks.append(lists[k][j])
            prev_end = lists[k][j][1]
        if not ok:
            break
        # shrink the first span as close as order allows
        if n > 1:
            limit = picks[1][0]
            j0 = i0
            for idx in range(i0, len(a0)):
                if a0[idx][1] <= limit:
                    j0 = idx
                elif a0[idx][0] >= limit:
                    break
            picks[0] = a0[j0]
        else:
            j0 = i0
        total_len, sub_w = _span_len_width(picks)
        gap = (picks[-1][1] - picks[0][0]) - total_len
        width = max(0, gap) + sub_w
        if gap + sub_w <= slop:
            out.append((picks[0][0], picks[-1][1], width))
        i0 = j0 + 1
    return out


def _near_unordered(lists: list[list[Span]], slop: int) -> list[Span]:
    """Plane-sweep minimal windows, one span per clause."""
    n = len(lists)
    idx = [0] * n
    out: list[Span] = []
    while True:
        cur = [lists[k][idx[k]] for k in range(n)]
        start = min(s for s, _e, _w in cur)
        end = max(e for _s, e, _w in cur)
        total_len, sub_w = _span_len_width(cur)
        gap = (end - start) - total_len
        if gap + sub_w <= slop:
            out.append((start, end, max(0, gap) + sub_w))
        k = min(range(n), key=lambda i: cur[i][0])
        idx[k] += 1
        if idx[k] >= len(lists[k]):
            out.sort()
            return out


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
    """SpanScorer freq: Σ 1/(1+width) over the doc's top-level spans."""
    return float(sum(1.0 / (1 + w) for _s, _e, w in eval_spans(q, pos)))


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
