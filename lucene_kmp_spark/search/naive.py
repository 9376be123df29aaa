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
    FuzzyQuery,
    MatchAllDocsQuery,
    MatchNoDocsQuery,
    Occur,
    PhraseQuery,
    PrefixQuery,
    Query,
    SynonymQuery,
    TermInSetQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
)


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
                    # plane-sweep sloppy matching, weight 1/(1+matchLength)
                    adj = [
                        sorted(p - i for p in self.postings[t][doc])
                        for i, t in enumerate(q.terms)
                    ]
                    idx = [0] * len(adj)
                    freq = 0.0
                    while True:
                        cur = [a[j] for a, j in zip(adj, idx)]
                        start, end = min(cur), max(cur)
                        if end - start <= q.slop:
                            freq += 1.0 / (1 + (end - start))
                        k = cur.index(start)
                        idx[k] += 1
                        if idx[k] >= len(adj[k]):
                            break
                if freq:
                    out[doc] = float(sc.score(np.array([freq]), np.array([self.norms[doc]]))[0])
            return out
        if isinstance(q, BooleanQuery):
            return self._bool_scores(q)
        if isinstance(q, (PrefixQuery, WildcardQuery, TermRangeQuery, TermInSetQuery)):
            return {d: float(q.boost) for d in self._multiterm_docs(q)}
        if isinstance(q, ConstantScoreQuery):
            return {d: float(q.boost) for d in self.scores(q.query)}
        if isinstance(q, MatchAllDocsQuery):
            return {d: float(q.boost) for d in range(self.max_doc)}
        if isinstance(q, MatchNoDocsQuery):
            return {}
        raise NotImplementedError(type(q).__name__)

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
