"""MoreLikeThis — "find documents like this one".

Semantics follow upstream Lucene's ``queries/mlt/MoreLikeThis`` (the
reference repo does not port the mlt module, same situation as grouping /
suggest — we implement the published Lucene surface so a reference user
keeps their workflow):

* Source-term extraction (``retrieveTerms``): the doc's term vector when the
  index stores one, else re-analysis of the stored text field — exactly
  Lucene's fallback ladder.
* Term selection (``createQueue``): keep term ``t`` when
  ``doc_tf(t) >= min_term_freq``, word-length within
  ``[min_word_len, max_word_len]`` bounds (0 = unbounded), not a stop word,
  and ``df(t) >= min_doc_freq`` (and ``<= max_doc_freq`` when set); rank by
  ``score = doc_tf * idf`` with the ClassicSimilarity idf
  ``1 + ln((N + 1) / (df + 1))`` and keep the top ``max_query_terms``.
  Lucene's priority queue leaves exact-float-tie order unspecified
  (insertion order); we break ties by term ascending — deterministic and
  engine/oracle-portable.
* Query construction (``createQuery``): one SHOULD ``TermQuery`` per kept
  term; with ``boost=True`` each clause is boosted by ``score / best_score``
  (Lucene's boostFactor=1 form).

Scale shape: the per-doc term map is one pruned stored-fields / term-vector
lookup (metadata-sized), df lookups are ONE ``term_dict`` scan filtered to
the candidate set (Parquet pushdown on the term-sorted dictionary), and the
resulting disjunction runs through the engine's batched single-scan boolean
path — nothing here is proportional to corpus size except the final scoring
scan, same as any BM25 disjunction.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from lucene_kmp_spark.search.query import BooleanQuery, Query, TermQuery


class MoreLikeThis:
    """Build "more like this" queries against an :class:`IndexSearcher`.

    Parameters mirror Lucene's defaults: ``min_term_freq=2``,
    ``min_doc_freq=5``, ``max_doc_freq=None``, ``max_query_terms=25``,
    ``min_word_len=0``, ``max_word_len=0`` (0 = no bound), ``boost=False``.
    """

    def __init__(
        self,
        searcher,
        min_term_freq: int = 2,
        min_doc_freq: int = 5,
        max_doc_freq: int | None = None,
        max_query_terms: int = 25,
        min_word_len: int = 0,
        max_word_len: int = 0,
        stop_words: frozenset[str] = frozenset(),
        boost: bool = False,
        analyzer=None,
    ):
        self.searcher = searcher
        self.min_term_freq = int(min_term_freq)
        self.min_doc_freq = int(min_doc_freq)
        self.max_doc_freq = None if max_doc_freq is None else int(max_doc_freq)
        self.max_query_terms = int(max_query_terms)
        self.min_word_len = int(min_word_len)
        self.max_word_len = int(max_word_len)
        self.stop_words = frozenset(stop_words)
        self.boost = bool(boost)
        self.analyzer = analyzer

    # ------------------------------------------------------------- sources
    def _analyze(self, text: str) -> Counter:
        if self.analyzer is not None:
            out = self.analyzer(text)
            terms = out[0] if isinstance(out, tuple) else list(out)
        else:
            from lucene_kmp_spark.analysis.standard import analyze

            terms = analyze(text)[0]
        return Counter(terms)

    def doc_term_freqs(self, doc_id: int) -> Counter:
        """Per-term tf of one stored doc: term-vector fast path when the
        index keeps the forward index, else stored-field re-analysis
        (MoreLikeThis.retrieveTerms(int) ladder)."""
        idx = self.searcher.index
        if idx.term_vectors is not None:
            rows = (
                idx.term_vectors.filter(F.col("doc_id") == int(doc_id))
                .select("term", "tf")
                .collect()
            )
            if rows:
                return Counter({r["term"]: int(r["tf"]) for r in rows})
        stored = self.searcher.doc(int(doc_id), fields=(idx.field_name,))
        if stored is None:
            return Counter()
        return self._analyze(stored[idx.field_name] or "")

    # ------------------------------------------------------------ selection
    def interesting_terms(self, term_freqs: Counter) -> list[tuple[str, float]]:
        """(term, selection_score) for the kept terms, best first
        (createQueue). df comes from ONE candidate-filtered term_dict scan —
        bounded by the source doc's vocabulary, never the corpus."""
        cand = {}
        for t, tf in term_freqs.items():
            if tf < self.min_term_freq or t in self.stop_words:
                continue
            if self.min_word_len and len(t) < self.min_word_len:
                continue
            if self.max_word_len and len(t) > self.max_word_len:
                continue
            cand[t] = int(tf)
        if not cand:
            return []
        dfs = {
            r["term"]: int(r["df"])
            for r in self.searcher.index.term_dict.filter(
                F.col("term").isin(list(cand))
            )
            .select("term", "df")
            .collect()
        }
        import math

        n_docs = self.searcher.index.stats.doc_count
        scored = []
        for t, tf in cand.items():
            df = dfs.get(t, 0)
            if df < self.min_doc_freq:
                continue
            if self.max_doc_freq is not None and df > self.max_doc_freq:
                continue
            idf = 1.0 + math.log((n_docs + 1.0) / (df + 1.0))
            scored.append((t, tf * idf))
        scored.sort(key=lambda p: (-p[1], p[0]))
        return scored[: self.max_query_terms]

    # ---------------------------------------------------------------- query
    def _to_query(self, selected: list[tuple[str, float]]) -> Query:
        if not selected:
            from lucene_kmp_spark.search.query import MatchNoDocsQuery

            return MatchNoDocsQuery()
        best = selected[0][1]
        clauses = tuple(
            TermQuery(t, boost=(s / best) if (self.boost and best > 0) else 1.0)
            for t, s in selected
        )
        return BooleanQuery.build(should=clauses)

    def like(self, doc_id: int) -> Query:
        """Query for docs similar to the given stored doc
        (MoreLikeThis.like(int))."""
        return self._to_query(self.interesting_terms(self.doc_term_freqs(doc_id)))

    def like_text(self, text: str) -> Query:
        """Query for docs similar to free text (MoreLikeThis.like(Reader))."""
        return self._to_query(self.interesting_terms(self._analyze(text)))
