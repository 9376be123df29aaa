"""Dictionary-size dependence of the CJK lattice constant
(BENCH/BASELINE.md round-5, SCALE.md "CJK lattice constant at scale").

Controlled design: ONE 100k-entry synthetic stream; the 12k/50k variants
are bit-exact prefixes (pinned by test_ja_12k_is_prefix_of_100k_stream),
so sentences (12k-prefix vocabulary), unknown tables and connection matrix
are held fixed — the only variable is dictionary size. Reports per-arc
cost (the engine constant) separately from matched-arc density (a
dictionary property).

Run: python scripts/dict_scale_probe.py
"""
from __future__ import annotations

import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lucene_kmp_spark.analysis.ja import NORMAL, japanese_tokenizer  # noqa: E402
from lucene_kmp_spark.analysis.morph import is_punctuation  # noqa: E402
from lucene_kmp_spark.analysis.synthdict import (  # noqa: E402
    synth_japanese_dictionary,
    synth_sentences_ja,
)


def _count_arcs(text, entries, unknowns, char_def) -> int:
    """Independent arc enumeration (same rules as the DP oracle in
    tests/test_synthdict_scale.py) — counts the lattice arcs the engine
    must relax for this text under this dictionary."""
    by_surface = defaultdict(list)
    for e in entries:
        by_surface[e.surface].append(e)
    max_len = max(len(s) for s in by_surface)
    n = len(text)
    total = 0
    live = {0}
    unknown_end = -1
    for pos in range(n):
        if pos not in live:
            continue
        any_matches = False
        for ln in range(1, min(max_len, n - pos) + 1):
            hits = by_surface.get(text[pos : pos + ln], ())
            if hits:
                total += len(hits)
                live.add(pos + ln)
                any_matches = True
        first = text[pos]
        if (not any_matches or char_def.is_invoke(first)) and not unknown_end > pos:
            cls = char_def.char_class(first)
            if not char_def.is_group(first):
                ln = 1
            else:
                is_p = is_punctuation(first)
                ln = 1
                while (
                    ln < 1024
                    and pos + ln < n
                    and char_def.char_class(text[pos + ln]) == cls
                    and is_punctuation(text[pos + ln]) == is_p
                ):
                    ln += 1
            ues = unknowns.entries_for(cls)
            if ues:
                total += len(ues)
                live.add(pos + ln)
                unknown_end = pos + ln
    return total


def main() -> None:
    e100, conn, unk, cd = synth_japanese_dictionary(n_entries=100_000)
    sizes = {"12k": e100[:12_000], "50k": e100[:50_000], "100k": e100}
    sents = synth_sentences_ja(sizes["12k"], n=400, seed=42, words_lo=8, words_hi=14)
    chars = sum(len(s) for s in sents)
    out = {}
    for name, ents in sizes.items():
        tok = japanese_tokenizer(ents, conn, unk, cd, mode=NORMAL)
        for s in sents[:20]:
            tok(s)  # warm memos
        best = 1e9
        for _ in range(3):
            t = time.perf_counter()
            for s in sents:
                tok(s)
            best = min(best, time.perf_counter() - t)
        arcs = sum(_count_arcs(s, ents, unk, cd) for s in sents)
        out[name] = {
            "sec": round(best, 3),
            "chars_per_sec": round(chars / best),
            "arcs": arcs,
            "us_per_arc": round(best / arcs * 1e6, 2),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
