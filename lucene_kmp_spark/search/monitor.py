"""Reverse search (percolation): registered queries matched against incoming
document batches — the upstream Lucene ``monitor`` module surface
(``Monitor`` / ``TermFilteredPresearcher`` / ``CandidateMatcher``; the
reference repo does not port monitor, same situation as grouping/mlt/suggest
— this implements the published semantics Spark-first).

Two-phase plan, exactly the module's shape:

1. **Presearcher** — for every registered query, extract a term set such
   that any matching document must contain at least one of its terms
   (TermFilteredPresearcher.buildQuery): a conjunction contributes its
   cheapest clause's set, a disjunction the union of its clauses' sets,
   multi-term/match-all queries fall back to the ANYTOKEN bucket. The
   (query_id, term) table is broadcast (queries ≪ corpus) and joined
   against one tokenize pass over the batch — candidate (doc, query) pairs
   cost one narrow shuffle-free join, never |docs| × |queries|.
2. **Candidate matcher** — each candidate pair is verified EXACTLY against
   the doc's analyzed token positions (the MemoryIndex-per-document analog,
   ``CandidateMatcher.matchQuery``): Arrow-batched ``applyInPandas`` per
   doc, cost ∝ candidate pairs.

For a streaming alert flow call :meth:`Monitor.match` inside
``foreachBatch`` — the operator is stateless per batch, so the streaming
twin is the batch op applied per micro-batch (same pattern as
``streaming/incremental.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from lucene_kmp_spark.search.query import (
    BooleanQuery,
    ConstantScoreQuery,
    MatchAllDocsQuery,
    MatchNoDocsQuery,
    Occur,
    PhraseQuery,
    PrefixQuery,
    Query,
    TermInSetQuery,
    TermQuery,
    rewrite_query,
)

_SUPPORTED = (
    TermQuery,
    PhraseQuery,
    PrefixQuery,
    TermInSetQuery,
    MatchAllDocsQuery,
    MatchNoDocsQuery,
    BooleanQuery,
    ConstantScoreQuery,
)


def _validate(q: Query) -> None:
    if isinstance(q, BooleanQuery):
        for c in q.clauses:
            _validate(c.query)
        return
    if isinstance(q, ConstantScoreQuery):
        _validate(q.query)
        return
    if isinstance(q, PhraseQuery):
        if q.slop != 0:
            raise ValueError("Monitor supports exact (slop=0) phrases only")
        return
    if not isinstance(q, _SUPPORTED):
        raise ValueError(f"Monitor does not support {type(q).__name__}")


def _presearch_terms(q: Query) -> set[str] | None:
    """Terms such that every matching doc contains >=1 of them; None =
    ANYTOKEN (the query can match docs we cannot bound by a term list).
    Mirrors TermFilteredPresearcher's QueryTree weighting: a conjunction
    keeps only its cheapest child (any single conjunct's set stays
    complete), a disjunction unions all children; for phrases the longest
    term stands in for the whole phrase (the stats-free length weightor —
    longer tokens are rarer)."""
    if isinstance(q, TermQuery):
        return {q.term}
    if isinstance(q, MatchNoDocsQuery):
        return set()
    if isinstance(q, PhraseQuery):
        return {max(q.terms, key=lambda t: (len(t), [-ord(c) for c in t]))}
    if isinstance(q, TermInSetQuery):
        return set(q.terms)
    if isinstance(q, ConstantScoreQuery):
        return _presearch_terms(q.query)
    if isinstance(q, (PrefixQuery, MatchAllDocsQuery)):
        return None
    if isinstance(q, BooleanQuery):
        conj = []
        disj = []
        for c in q.clauses:
            if c.occur in (Occur.MUST, Occur.FILTER):
                conj.append(_presearch_terms(c.query))
            elif c.occur is Occur.SHOULD:
                disj.append(_presearch_terms(c.query))
        bounded = [s for s in conj if s is not None]
        if bounded:
            return min(bounded, key=lambda s: (len(s), sorted(s)))
        if conj:  # conjuncts exist but none is boundable
            return None
        if not disj or any(s is None for s in disj):
            return None
        out: set[str] = set()
        for s in disj:
            out |= s
        return out
    return None


def _verify_vocab(q: Query, terms: set, prefixes: set) -> None:
    """Collect the vocabulary verification can touch: exact terms + prefix
    families. Everything else (MatchAll/None) reads no positions at all."""
    if isinstance(q, TermQuery):
        terms.add(q.term)
    elif isinstance(q, TermInSetQuery):
        terms.update(q.terms)
    elif isinstance(q, PhraseQuery):
        terms.update(q.terms)
    elif isinstance(q, PrefixQuery):
        prefixes.add(q.prefix)
    elif isinstance(q, ConstantScoreQuery):
        _verify_vocab(q.query, terms, prefixes)
    elif isinstance(q, BooleanQuery):
        for c in q.clauses:
            _verify_vocab(c.query, terms, prefixes)


def _verify(q: Query, pos: dict) -> bool:
    """Exact per-document evaluation over {term: [positions]} — the
    MemoryIndex percolation check."""
    if isinstance(q, TermQuery):
        return q.term in pos
    if isinstance(q, TermInSetQuery):
        return any(t in pos for t in q.terms)
    if isinstance(q, PrefixQuery):
        return any(t.startswith(q.prefix) for t in pos)
    if isinstance(q, MatchAllDocsQuery):
        return True
    if isinstance(q, MatchNoDocsQuery):
        return False
    if isinstance(q, ConstantScoreQuery):
        return _verify(q.query, pos)
    if isinstance(q, PhraseQuery):
        live = None
        for i, t in enumerate(q.terms):
            plist = pos.get(t)
            if not plist:
                return False
            shifted = {p - i for p in plist}
            live = shifted if live is None else (live & shifted)
            if not live:
                return False
        return bool(live)
    if isinstance(q, BooleanQuery):
        should_hits = 0
        has_positive = False
        for c in q.clauses:
            hit = _verify(c.query, pos)
            if c.occur in (Occur.MUST, Occur.FILTER):
                has_positive = True
                if not hit:
                    return False
            elif c.occur is Occur.MUST_NOT:
                if hit:
                    return False
            else:
                if hit:
                    should_hits += 1
        msm = q.minimum_should_match
        n_should = sum(1 for c in q.clauses if c.occur is Occur.SHOULD)
        if not has_positive and n_should:
            msm = max(1, msm)
        return should_hits >= msm
    raise ValueError(f"unsupported query in verify: {type(q).__name__}")


class Monitor:
    """Registered-query store + batch percolation (Monitor.match analog)."""

    def __init__(self, spark, analyzer=None):
        self.spark = spark
        self.analyzer = analyzer
        self._queries: dict[str, Query] = {}

    def register(self, query_id: str, q: Query) -> None:
        q = rewrite_query(q)
        _validate(q)
        self._queries[str(query_id)] = q

    def deregister(self, query_id: str) -> None:
        self._queries.pop(str(query_id), None)

    def presearcher_df(self) -> DataFrame:
        """(query_id, term) presearcher index; term NULL = ANYTOKEN row."""
        rows = []
        for qid, q in sorted(self._queries.items()):
            terms = _presearch_terms(q)
            if terms is None:
                rows.append((qid, None))
            else:
                rows.extend((qid, t) for t in sorted(terms))
        return self.spark.createDataFrame(rows, "query_id string, term string")

    def match(
        self, docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
    ) -> DataFrame:
        """(doc_id, query_id) for every registered query each doc matches.

        One tokenize pass over the batch (the same Arrow UDF the index build
        uses), one broadcast candidate join, one per-doc Arrow verification
        over candidate pairs only."""
        from lucene_kmp_spark.index.builder import tokenize_to_tokens

        if not self._queries:
            return self.spark.createDataFrame([], "doc_id long, query_id string")
        toks = tokenize_to_tokens(
            docs.select(F.col(id_col).cast("long").alias("doc_id"), text_col),
            text_col=text_col,
            analyzer=self.analyzer,
        ).select("doc_id", "term", "positions")

        pres = [(qid, _presearch_terms(q)) for qid, q in sorted(self._queries.items())]
        term_rows = [(qid, t) for qid, s in pres if s is not None for t in sorted(s)]
        any_qids = [qid for qid, s in pres if s is None]

        cand = None
        if term_rows:
            qterms = self.spark.createDataFrame(
                term_rows, "query_id string, term string"
            )
            cand = (
                toks.join(F.broadcast(qterms), "term")
                .select("doc_id", "query_id")
                .distinct()
            )
        if any_qids:
            allq = self.spark.createDataFrame(
                [(qid,) for qid in any_qids], "query_id string"
            )
            anyc = toks.select("doc_id").distinct().crossJoin(F.broadcast(allq))
            cand = anyc if cand is None else cand.union(anyc)
        if cand is None:  # every registered query has an empty presearch set
            return self.spark.createDataFrame([], "doc_id long, query_id string")

        cand_by_doc = cand.groupBy("doc_id").agg(F.collect_set("query_id").alias("_qids"))

        # verification only reads positions of terms the queries mention
        # (plus prefix-covered terms) — prune the token stream BEFORE the
        # per-doc pivot so candidate docs don't drag their whole vocabulary
        # through the shuffle (MemoryIndex builds only what the query asks)
        vterms, vprefixes = set(), set()
        for q in self._queries.values():
            _verify_vocab(q, vterms, vprefixes)
        pred = None
        if vterms:
            pred = F.col("term").isin(sorted(vterms))
        for p in sorted(vprefixes):
            c = F.col("term").startswith(p)
            pred = c if pred is None else (pred | c)
        toks_v = toks.filter(pred) if pred is not None else toks

        doc_pos = toks_v.groupBy("doc_id").agg(
            F.map_from_entries(F.collect_list(F.struct("term", "positions"))).alias("_pos")
        )
        # left join: a candidate doc may contain NO verify-relevant terms
        # (e.g. an ANYTOKEN MatchAll query) — it still needs verification
        data = cand_by_doc.join(doc_pos, "doc_id", "left")
        queries = dict(self._queries)

        def verify(batches):
            import pandas as pd

            for pdf in batches:
                out_doc, out_qid = [], []
                for doc, qids, pos_raw in zip(
                    pdf["doc_id"].values, pdf["_qids"].values, pdf["_pos"].values
                ):
                    pos = {} if pos_raw is None else {t: list(p) for t, p in dict(pos_raw).items()}
                    for qid in sorted(qids):
                        if _verify(queries[qid], pos):
                            out_doc.append(doc)
                            out_qid.append(qid)
                yield pd.DataFrame({"doc_id": out_doc, "query_id": out_qid})

        return data.mapInPandas(verify, "doc_id long, query_id string")
