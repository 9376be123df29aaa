"""Multi-word SynonymGraphFilter analog + SolrSynonymParser goldens."""
from lucene_kmp_spark.analysis.synonyms import (
    parse_solr_synonyms, synonym_graph_analyzer)


def test_parse_solr_synonyms():
    rules = """
# comment
i-pod, ipod => i pod
foo => bar
a, b, c
"""
    m = parse_solr_synonyms(rules)
    assert ("i", "pod") not in m            # identity mapping dropped
    assert m[("ipod",)] == [("i", "pod")]
    assert m[("foo",)] == [("bar",)]
    assert set(m[("a",)]) == {("b",), ("c",)}
    assert set(m[("b",)]) == {("a",), ("c",)}
    collapsed = parse_solr_synonyms("a, b, c", expand=False)
    assert collapsed[("b",)] == [("a",)] and collapsed[("c",)] == [("a",)]
    assert ("a",) not in collapsed


def test_multiword_expansion_positions():
    m = {("new", "york"): [("ny",)], ("usa",): [("united", "states",
                                                 "of", "america")]}
    a = synonym_graph_analyzer(m)
    terms, positions, n = a("new york city")
    # ny lands on 'new' (posIncr 0); phrase ny->york survives flattening
    assert list(zip(terms, positions)) == [
        ("new", 0), ("york", 1), ("ny", 0), ("city", 2)]
    terms, positions, n = a("visit usa today")
    # replacement longer than match: tail stacks on the last position
    assert list(zip(terms, positions)) == [
        ("visit", 0), ("usa", 1), ("united", 1), ("states", 1),
        ("of", 1), ("america", 1), ("today", 2)]


def test_longest_match_and_keep_orig_false():
    m = {("big", "apple"): [("nyc",)], ("apple",): [("fruit",)]}
    a = synonym_graph_analyzer(m)
    terms, positions, _ = a("big apple pie")
    assert list(zip(terms, positions)) == [
        ("big", 0), ("apple", 1), ("nyc", 0), ("pie", 2)]
    b = synonym_graph_analyzer(m, keep_orig=False)
    terms, positions, _ = b("big apple pie")
    assert list(zip(terms, positions)) == [("nyc", 0), ("pie", 2)]
    terms, positions, _ = b("one apple")
    assert list(zip(terms, positions)) == [("one", 0), ("fruit", 1)]


def test_end_to_end_synonym_search(spark):
    from lucene_kmp_spark.index import build_index
    from lucene_kmp_spark.search.executor import IndexSearcher
    from lucene_kmp_spark.search.query import PhraseQuery, TermQuery

    m = {("new", "york"): [("ny",)]}
    docs = spark.createDataFrame(
        [(0, "new york city blog"), (1, "york minster news")],
        ["doc_id", "text"])
    idx = build_index(docs, text_col="text",
                      analyzer=synonym_graph_analyzer(m))
    s = IndexSearcher(idx)
    assert [r.doc_id for r in s.top_k(TermQuery("ny"), 5).collect()] == [0]
    # flattened graph: "ny york" is phrase-adjacent (Lucene sausage too)
    assert [r.doc_id
            for r in s.top_k(PhraseQuery(("ny", "york")), 5).collect()] == [0]
