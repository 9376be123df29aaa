"""Naive single-process reference scorer (the CheckHits oracle).

Deliberately shares NO code with the distributed pipeline except the three
parity-critical kernels (analyze, SmallFloat, float32 BM25 expression): plain
Python dicts, no blocks, no compression, no Spark. Tests assert the optimized
distributed engine is rank- and score-identical to this path — the reference's
own load-bearing oracle pattern (tests/search/CheckHits.kt:130,195;
TestBoolean2-style equivalence, SURVEY.md §5).
"""

from __future__ import annotations

from collections import Counter, defaultdict

import numpy as np

from lucene_kmp_spark.analysis import analyze
from lucene_kmp_spark.search import bm25
from lucene_kmp_spark.search.query import (
    BooleanQuery,
    ColumnFilterQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    MatchNoDocsQuery,
    MultiPhraseQuery,
    Occur,
    PhraseQuery,
    SpanNearQuery,
    PrefixQuery,
    Query,
    SynonymQuery,
    TermInSetQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
)


def _unordered_span_freq(lists: list[list[int]], slop: int) -> float:
    """NearSpansUnordered emulation over term positions: walk queue states
    (advance the min clause each step); a state matches when the high-water
    max end minus the min position minus Σ span lengths (= n) is <= slop,
    contributing 1/(1 + window) with window = maxEnd - min position; float32
    accumulation like SpanScorer."""
    n = len(lists)
    idx = [0] * n
    cur = [a[0] for a in lists]
    max_end = max(cur) + 1
    freq = np.float32(0.0)
    while True:
        start = min(cur)
        if max_end - start - n <= slop:
            freq += np.float32(1.0) / np.float32(1 + (max_end - start))
        k = cur.index(start)
        idx[k] += 1
        if idx[k] >= len(lists[k]):
            return float(freq)
        cur[k] = lists[k][idx[k]]
        max_end = max(max_end, cur[k] + 1)


class NaiveIndex:
    def __init__(self, rows: list[tuple[int, str]], stop_words=(), dtype=np.float32):
        """rows: (doc_id, text)."""
        self.dtype = dtype
        stop = frozenset(stop_words) if stop_words else None
        self.postings: dict[str, dict[int, list[int]]] = defaultdict(dict)
        self.norms: dict[int, int] = {}
        self.doc_lengths: dict[int, int] = {}
        self.max_doc = len(rows)
        from lucene_kmp_spark.util.smallfloat import int_to_byte4

        for doc_id, text in rows:
            if text is None:
                continue
            terms, positions, _ = analyze(text, stop_set=stop)
            if not terms:
                continue
            self.norms[doc_id] = int_to_byte4(len(terms))
            self.doc_lengths[doc_id] = len(terms)
            for t, p in zip(terms, positions):
                self.postings[t].setdefault(doc_id, []).append(p)
        self.doc_count = len(self.norms)
        self.sum_ttf = sum(self.doc_lengths.values())

    # --- stats
    def df(self, term: str) -> int:
        return len(self.postings.get(term, {}))

    def ttf(self, term: str) -> int:
        return sum(len(v) for v in self.postings.get(term, {}).values())

    def _scorer(self, term_df: int, boost: float) -> bm25.BM25Scorer:
        return bm25.make_scorer(
            boost, term_df, self.doc_count, self.sum_ttf, dtype=self.dtype
        )

    # --- scoring
    def scores(self, q: Query) -> dict[int, float]:
        """doc_id -> score (double accumulation across clauses)."""
        if isinstance(q, TermQuery):
            sc = self._scorer(self.df(q.term), q.boost)
            out = {}
            for doc, plist in self.postings.get(q.term, {}).items():
                out[doc] = float(sc.score(np.array([len(plist)]), np.array([self.norms[doc]]))[0])
            return out
        if isinstance(q, SynonymQuery):
            blended_df = max((self.df(t) for t in q.terms), default=0)
            if blended_df == 0:
                return {}
            sc = self._scorer(blended_df, q.boost)
            freqs: Counter = Counter()
            for t in q.terms:
                for doc, plist in self.postings.get(t, {}).items():
                    freqs[doc] += len(plist)
            return {
                doc: float(sc.score(np.array([f]), np.array([self.norms[doc]]))[0])
                for doc, f in freqs.items()
            }
        if isinstance(q, PhraseQuery):
            if len(q.terms) == 1:
                return self.scores(TermQuery(q.terms[0], boost=q.boost))
            dfs = [self.df(t) for t in q.terms]
            if any(d == 0 for d in dfs):
                return {}
            dt = self.dtype
            idf_sum = float(
                sum(float(bm25.idf(self.df(t), self.doc_count, dt)) for t in q.terms)
            )
            sc = bm25.BM25Scorer(
                q.boost, idf_sum, bm25.avg_field_length(self.sum_ttf, self.doc_count, dt), dtype=dt
            )
            candidates = set(self.postings[q.terms[0]])
            for t in q.terms[1:]:
                candidates &= set(self.postings[t])
            out = {}
            for doc in candidates:
                if q.slop == 0:
                    base = self.postings[q.terms[0]][doc]
                    freq = 0.0
                    for p in base:
                        if all((p + i) in self.postings[t][doc] for i, t in enumerate(q.terms) if i > 0):
                            freq += 1
                else:
                    # faithful SloppyPhraseMatcher port (repeat collisions,
                    # match-length minimization) — search/sloppy.py
                    from lucene_kmp_spark.search.sloppy import sloppy_freq

                    freq = sloppy_freq(
                        [sorted(self.postings[t][doc]) for t in q.terms],
                        q.slop,
                        [(t,) for t in q.terms],
                    )
                if freq:
                    out[doc] = float(sc.score(np.array([freq]), np.array([self.norms[doc]]))[0])
            return out
        if isinstance(q, MultiPhraseQuery):
            return self._multi_phrase_scores(q)
        if isinstance(q, SpanNearQuery):
            return self._span_near_scores(q)
        if isinstance(q, BooleanQuery):
            return self._bool_scores(q)
        if isinstance(q, DisjunctionMaxQuery):
            subs = [self.scores(s) for s in q.queries]
            out: dict[int, float] = {}
            for d in set().union(*(m.keys() for m in subs)) if subs else set():
                vals = [m[d] for m in subs if d in m]
                out[d] = (max(vals) + q.tie_breaker * (sum(vals) - max(vals))) * (
                    q.boost if q.boost != 1.0 else 1.0
                )
            return out
        if isinstance(q, (PrefixQuery, WildcardQuery, TermRangeQuery, TermInSetQuery)):
            return {d: float(q.boost) for d in self._multiterm_docs(q)}
        if isinstance(q, ConstantScoreQuery):
            return {d: float(q.boost) for d in self.scores(q.query)}
        if isinstance(q, MatchAllDocsQuery):
            return {d: float(q.boost) for d in range(self.max_doc)}
        if isinstance(q, MatchNoDocsQuery):
            return {}
        raise NotImplementedError(type(q).__name__)

    def _phrase_scorer(self, terms, boost):
        dt = self.dtype
        idf_sum = float(
            sum(float(bm25.idf(self.df(t), self.doc_count, dt)) for t in dict.fromkeys(terms))
        )
        return bm25.BM25Scorer(
            boost, idf_sum, bm25.avg_field_length(self.sum_ttf, self.doc_count, dt), dtype=dt
        )

    def _multi_phrase_scores(self, q: MultiPhraseQuery) -> dict[int, float]:
        live_slots = [tuple(t for t in slot if self.df(t) > 0) for slot in q.slots]
        if any(not s for s in live_slots):
            return {}
        sc = self._phrase_scorer([t for s in live_slots for t in s], q.boost)
        # per-slot per-doc merged position sets
        slot_pos: list[dict[int, list[int]]] = []
        for slot in live_slots:
            merged: dict[int, set[int]] = {}
            for t in slot:
                for doc, plist in self.postings[t].items():
                    merged.setdefault(doc, set()).update(plist)
            slot_pos.append({d: sorted(ps) for d, ps in merged.items()})
        candidates = set(slot_pos[0])
        for sp in slot_pos[1:]:
            candidates &= set(sp)
        out = {}
        for doc in candidates:
            plists = [sp[doc] for sp in slot_pos]
            if q.slop == 0:
                freq = float(
                    sum(
                        1
                        for p in plists[0]
                        if all((p + i) in set(plists[i]) for i in range(1, len(plists)))
                    )
                )
            else:
                from lucene_kmp_spark.search.sloppy import sloppy_freq

                freq = sloppy_freq(plists, q.slop, live_slots)
            if freq:
                out[doc] = float(sc.score(np.array([freq]), np.array([self.norms[doc]]))[0])
        return out

    def _span_near_scores(self, q: SpanNearQuery) -> dict[int, float]:
        import bisect

        if any(self.df(t) == 0 for t in q.terms):
            return {}
        sc = self._phrase_scorer(list(q.terms), q.boost)
        candidates = set(self.postings[q.terms[0]])
        for t in q.terms[1:]:
            candidates &= set(self.postings[t])
        n = len(q.terms)
        out = {}
        for doc in candidates:
            plists = [sorted(self.postings[t][doc]) for t in q.terms]
            if q.in_order:
                # NearSpansOrdered emulation: clause iterators never rewind;
                # every clause-0 position attempts a stretch; width = Σ gaps.
                freq = np.float32(0.0)
                iters = [0] * n
                a0 = plists[0]
                exhausted = False
                for i0 in range(len(a0)):
                    if exhausted:
                        break
                    prev_end, width = a0[i0] + 1, 0
                    for i in range(1, n):
                        j = max(iters[i], bisect.bisect_left(plists[i], prev_end))
                        if j >= len(plists[i]):
                            exhausted = True
                            break
                        iters[i] = j
                        width += plists[i][j] - prev_end
                        prev_end = plists[i][j] + 1
                    else:
                        if width <= q.slop:
                            freq += np.float32(1.0) / np.float32(1 + width)
                freq = float(freq)
            else:
                freq = _unordered_span_freq(plists, q.slop)
            if freq:
                out[doc] = float(sc.score(np.array([freq]), np.array([self.norms[doc]]))[0])
        return out

    def _multiterm_docs(self, q) -> set[int]:
        import re

        docs: set[int] = set()
        if isinstance(q, PrefixQuery):
            match = lambda t: t.startswith(q.prefix)  # noqa: E731
        elif isinstance(q, WildcardQuery):
            from lucene_kmp_spark.search.executor import _wildcard_to_regex

            rx = re.compile(_wildcard_to_regex(q.pattern))
            match = lambda t: rx.match(t) is not None  # noqa: E731
        elif isinstance(q, TermInSetQuery):
            s = set(q.terms)
            match = lambda t: t in s  # noqa: E731
        elif isinstance(q, TermRangeQuery):

            def match(t):
                if q.lower is not None and (t < q.lower or (t == q.lower and not q.include_lower)):
                    return False
                if q.upper is not None and (t > q.upper or (t == q.upper and not q.include_upper)):
                    return False
                return True

        for t, posting in self.postings.items():
            if match(t):
                docs |= set(posting)
        return docs

    def _bool_scores(self, q: BooleanQuery) -> dict[int, float]:
        musts = [c.query for c in q.clauses if c.occur == Occur.MUST]
        shoulds = [c.query for c in q.clauses if c.occur == Occur.SHOULD]
        filters = [c.query for c in q.clauses if c.occur == Occur.FILTER]
        nots = [c.query for c in q.clauses if c.occur == Occur.MUST_NOT]

        must_scores = [self.scores(m) for m in musts]
        should_scores = [self.scores(s) for s in shoulds]

        if musts:
            docs = set(must_scores[0])
            for ms in must_scores[1:]:
                docs &= set(ms)
        elif shoulds:
            cnt: Counter = Counter()
            for ss in should_scores:
                for d in ss:
                    cnt[d] += 1
            need = max(q.minimum_should_match, 1)
            docs = {d for d, c in cnt.items() if c >= need}
        elif filters:
            docs = set(self.scores(ConstantScoreQuery(filters[0])))
        else:
            return {}

        if musts and q.minimum_should_match > 0 and shoulds:
            cnt = Counter()
            for ss in should_scores:
                for d in ss:
                    cnt[d] += 1
            docs = {d for d in docs if cnt.get(d, 0) >= q.minimum_should_match}
        for f in filters:
            docs &= set(self.scores(ConstantScoreQuery(f)))
        for nq in nots:
            docs -= set(self.scores(ConstantScoreQuery(nq)))

        out = {}
        for d in docs:
            total = 0.0  # double accumulate, matching cross-clause sums
            for ms in must_scores:
                total += ms.get(d, 0.0)
            for ss in should_scores:
                total += ss.get(d, 0.0)
            out[d] = total * q.boost if q.boost != 1.0 else total
        return out

    def top_k(self, q: Query, k: int = 10) -> list[tuple[int, float]]:
        scores = self.scores(q)
        if self.dtype == np.float32:
            items = [(d, float(np.float32(s))) for d, s in scores.items()]
        else:
            items = list(scores.items())
        items.sort(key=lambda x: (-x[1], x[0]))  # score desc, docID asc (HitQueue.kt:56-62)
        return items[:k]
