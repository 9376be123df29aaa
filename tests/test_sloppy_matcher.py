"""SloppyPhraseMatcher port (search/sloppy.py) vs independent oracles.

Two independently-derived closed forms check the pq algorithm:

* duplicated-term two-slot phrases ("t t"~s): the collision machinery keeps
  the second slot one occurrence ahead, so each consecutive occurrence pair
  (p_i, p_{i+1}) emits one match of length gap = p_{i+1} - p_i - 1 — freq is
  the sum of 1/(1+gap) over gaps <= slop.
* distinct-term two-slot phrases: the algorithm is an alternating leapfrog —
  each settle pairs the stationary list's position y with the advancing
  list's largest element <= y, then roles swap at y's successor.

Both forms were derived by hand-tracing SloppyPhraseMatcher.kt:142-173 and
are implemented here with different code shapes than the port.
"""

import random
from bisect import bisect_right

import numpy as np
import pytest

from lucene_kmp_spark.search.sloppy import sloppy_freq


def _gap_formula(positions, slop):
    ps = sorted(positions)
    return sum(
        1.0 / (1 + g) for g in (b - a - 1 for a, b in zip(ps, ps[1:])) if g <= slop
    )


def _leapfrog_two_slot(pa, pb, slop):
    """Independent 2-distinct-slot derivation (see module docstring)."""
    A, B = sorted(pa), sorted(p - 1 for p in pb)  # offset-adjusted
    freq = 0.0
    if A[0] <= B[0]:
        L, O = A, B
    else:
        L, O = B, A
    y = O[0]
    while True:
        x = L[bisect_right(L, y) - 1]
        if y - x <= slop:
            freq += 1.0 / (1 + y - x)
        j = bisect_right(L, y)
        if j >= len(L):
            return freq
        z = L[j]
        L, O = O, L
        y = z


def test_lucene_doc_example():
    # SloppyPhraseMatcher.kt:22-24: "a b"~2 on "x a b a y" matches twice,
    # distance 0 and distance 2
    assert sloppy_freq([np.array([1, 3]), np.array([2])], 2, [("a",), ("b",)]) == (
        1.0 + 1.0 / 3.0
    )


def test_match_length_minimization():
    # a@[0,1] b@[4] (adjusted [0,1] vs [3]): ONE match minimized to length 2 —
    # the naive per-window sweep would wrongly count two
    got = sloppy_freq([np.array([0, 1]), np.array([4])], 3, [("a",), ("b",)])
    assert got == pytest.approx(1.0 / 3.0)


def test_exact_match_inside_sloppy():
    # doc "a b b a": a@[0,3], b@[1,2] — exact adjacency at 0 matches even
    # with slop=0; the reverse pair exceeds slop
    assert sloppy_freq([np.array([0, 3]), np.array([1, 2])], 0, [("a",), ("b",)]) == 1.0


def test_order_dependence_is_reproduced():
    # SloppyPhraseMatcher.kt:26-28: "a b c"~4 and "c b a"~4 score differently
    # on doc "a b c b a" — a deliberate efficiency quirk we must reproduce
    doc = {"a": [0, 4], "b": [1, 3], "c": [2]}
    q1 = sloppy_freq([np.array(doc[t]) for t in "abc"], 4, [(t,) for t in "abc"])
    q2 = sloppy_freq([np.array(doc[t]) for t in "cba"], 4, [(t,) for t in "cba"])
    assert q1 != q2


def test_repeat_single_occurrence_no_match():
    assert sloppy_freq([np.array([4]), np.array([4])], 9, [("t",), ("t",)]) == 0.0


def test_repeat_gap_formula_random():
    rng = random.Random(11)
    for _ in range(800):
        n = rng.randint(1, 12)
        ps = sorted(rng.sample(range(0, 60), n))
        slop = rng.randint(0, 9)
        got = sloppy_freq([np.array(ps), np.array(ps)], slop, [("t",), ("t",)])
        assert got == pytest.approx(_gap_formula(ps, slop)), (ps, slop)


def test_two_slot_leapfrog_random():
    rng = random.Random(13)
    for _ in range(800):
        pool = list(range(0, 50))
        rng.shuffle(pool)
        na, nb = rng.randint(1, 10), rng.randint(1, 10)
        pa = sorted(pool[:na])
        pb = sorted(pool[na : na + nb])
        slop = rng.randint(0, 10)
        got = sloppy_freq([np.array(pa), np.array(pb)], slop, [("a",), ("b",)])
        assert got == pytest.approx(_leapfrog_two_slot(pa, pb, slop)), (pa, pb, slop)


def test_three_slot_repeat_hand_trace():
    # "t x t"~4 on t@[0,5], x@[1,6]: groups force the two t-slots apart
    # (t0@0, t2@5); the single settle chain emits one match of length 3
    got = sloppy_freq(
        [np.array([0, 5]), np.array([1, 6]), np.array([0, 5])],
        4,
        [("t",), ("x",), ("t",)],
    )
    assert got == pytest.approx(0.25)


def test_multi_term_slot_union_smoke():
    # MultiPhrase slot ("a"|"b") then ("b"): shared term triggers the
    # multi-term repeat path (hasMultiTermRpts); must be deterministic and
    # positive when a valid assignment exists
    plists = [np.array([0, 2]), np.array([1, 3])]  # slot unions
    slots = [("a", "b"), ("b",)]
    g1 = sloppy_freq(plists, 2, slots)
    g2 = sloppy_freq(plists, 2, slots)
    assert g1 == g2 and g1 > 0


def test_single_slot_degenerates_to_tf():
    assert sloppy_freq([np.array([3, 7, 9])], 5, [("t",)]) == 3.0


def test_empty_slot_no_match():
    assert sloppy_freq([np.array([1]), np.array([], dtype=np.int64)], 5) == 0.0
