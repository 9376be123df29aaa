"""Lead-term skip pruning (two-phase conjunction advance).

The distributed analog of Lucene's ConjunctionDISI leading with the
lowest-cost iterator and driving skip pointers into the denser clauses
(ConjunctionDISI.kt, Lucene90SkipReader): the rarest term's doc windows
become a min/max_doc_id predicate on the positions scan, so hot terms'
blocks outside those windows never decode. Pruned results must be
IDENTICAL to the unpruned path.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_kmp_spark.index import build_index
from lucene_kmp_spark.search.executor import IndexSearcher
from lucene_kmp_spark.search.query import MultiPhraseQuery, PhraseQuery, SpanNearQuery


def _mk_docs(spark, n=20000):
    """Every doc contains hot terms; 'needle' appears in a few clustered docs
    (plus one straddling a window boundary region) always followed by 'hay'."""
    rows = []
    for i in range(n):
        words = ["hay", "stack", "filler", "hay", "stack"]
        if i in (7, 8, 9, 1007, 3999) or 2040 <= i <= 2050:
            words = ["needle", "hay"] + words
        if i % 40 == 0:  # rare but uniformly scattered — pruning can't pay
            words = ["scat", "hay"] + words
        rows.append((i, " ".join(words)))
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def env(spark):
    docs = _mk_docs(spark)
    idx = build_index(docs, text_col="text")
    s = IndexSearcher(idx)
    # the test corpus is smaller than one 8,192-doc window: shrink windows
    # to 64 docs so the coverage gate has something to measure
    s._LEAD_WINDOW_BITS = 6
    return s, docs


def _force_unpruned(searcher):
    """A searcher whose gate never fires (ratio made unreachable)."""
    s2 = IndexSearcher(searcher.index)
    s2._LEAD_PRUNE_MIN_RATIO = 10**9
    return s2


def _fresh_pruned(searcher, **over):
    s2 = IndexSearcher(searcher.index)
    s2._LEAD_WINDOW_BITS = 6
    for k, v in over.items():
        setattr(s2, k, v)
    return s2


def test_phrase_pruned_equals_unpruned(env):
    s, _ = env
    q = PhraseQuery(("needle", "hay"))
    got = [(r["doc_id"], r["score"]) for r in s.top_k(q, 50).collect()]
    assert s._last_lead_prune == "pruned"
    s_un = _force_unpruned(s)
    want = [(r["doc_id"], r["score"]) for r in s_un.top_k(q, 50).collect()]
    assert s_un._last_lead_prune == "unpruned"
    assert got == want
    assert len(got) == 16  # every needle doc matches "needle hay"


def test_sloppy_phrase_pruned_equals_unpruned(env):
    s, _ = env
    q = PhraseQuery(("needle", "stack"), slop=3)
    got = [(r["doc_id"], r["score"]) for r in s.top_k(q, 50).collect()]
    assert s._last_lead_prune == "pruned"
    want = [
        (r["doc_id"], r["score"]) for r in _force_unpruned(s).top_k(q, 50).collect()
    ]
    assert got == want and len(got) > 0


def test_span_near_pruned_equals_unpruned(env):
    s, _ = env
    q = SpanNearQuery(("needle", "stack"), slop=4, in_order=True)
    got = [(r["doc_id"], r["score"]) for r in s.top_k(q, 50).collect()]
    assert s._last_lead_prune == "pruned"
    want = [
        (r["doc_id"], r["score"]) for r in _force_unpruned(s).top_k(q, 50).collect()
    ]
    assert got == want and len(got) > 0


def test_multiphrase_lead_slot_prunes(env):
    s, _ = env
    q = MultiPhraseQuery((("needle",), ("hay", "stack")))
    got = [(r["doc_id"], r["score"]) for r in s.top_k(q, 50).collect()]
    assert s._last_lead_prune == "pruned"
    want = [
        (r["doc_id"], r["score"]) for r in _force_unpruned(s).top_k(q, 50).collect()
    ]
    assert got == want and len(got) == 16


def test_gate_skips_scattered_lead(env):
    """A rare but uniformly scattered lead coarsens into near-total cover —
    the coverage gates must refuse to prune (measured 3.5x slower if they
    don't) while results stay correct."""
    s, _ = env
    q = PhraseQuery(("scat", "hay"))
    got = [(r["doc_id"], r["score"]) for r in s.top_k(q, 600).collect()]
    assert s._last_lead_prune == "unpruned"
    assert len(got) == 500
    # and the interval computation itself reports "don't prune"
    assert s._lead_doc_intervals(("scat",)) is None


def test_gate_skips_when_all_terms_hot(env):
    s, _ = env
    q = PhraseQuery(("hay", "stack"))
    rows = s.top_k(q, 10).collect()
    assert s._last_lead_prune == "unpruned"
    assert len(rows) == 10


def test_interval_coarsening_is_sound(env):
    """Force the interval cap to 1: maximal coarsening must stay correct.
    (Coverage gate relaxed — a single coarsened interval spans most of this
    corpus, which the default gate would rightly refuse to prune.)"""
    s, _ = env
    s2 = _fresh_pruned(s, _LEAD_PRUNE_MAX_INTERVALS=1, _LEAD_PRUNE_MAX_COVERAGE=1.01)
    q = PhraseQuery(("needle", "hay"))
    got = [(r["doc_id"], r["score"]) for r in s2.top_k(q, 50).collect()]
    assert s2._last_lead_prune == "pruned"
    want = [
        (r["doc_id"], r["score"]) for r in _force_unpruned(s).top_k(q, 50).collect()
    ]
    assert got == want


def test_lead_intervals_shape(env):
    s, _ = env
    iv = s._lead_doc_intervals(("needle",))
    assert iv is not None and len(iv) >= 1
    # windows are 8192-doc aligned and cover every needle doc
    needles = [7, 8, 9, 1007, 3999] + list(range(2040, 2051))
    for d in needles:
        assert any(lo <= d <= hi for lo, hi in iv)
    for lo, hi in iv:
        assert lo % 64 == 0 and (hi + 1) % 64 == 0
