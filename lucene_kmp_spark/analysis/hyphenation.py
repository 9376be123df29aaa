"""HyphenationCompoundWordTokenFilter
(``analysis/common/.../analysis/compound/HyphenationCompoundWordTokenFilter.kt``
+ ``compound/hyphenation/HyphenationTree.kt``).

Liang's TeX hyphenation algorithm over Apache-FOP-format pattern XML
(classes / TeX patterns / exceptions): interletter values are the max
over all patterns matching at each offset of ``.word.``; hyphenation
points fall where the value is odd, bounded by remain/push char counts.
``hyphenation_compound_filter`` then replays the reference's
``decompose()`` verbatim — every hyphenation-point-aligned substring
within the subword-size window, optionally dictionary-checked (with the
genitive -1 retry), honoring onlyLongestMatch / noSubMatches /
noOverlappingMatches — emitting subwords at the original token's
position (posIncr=0).
"""
from __future__ import annotations

import re
import xml.etree.ElementTree as ET


class HyphenationTree:
    """Pattern store + hyphenate() (HyphenationTree.kt)."""

    def __init__(self):
        self.classes: dict[str, str] = {}
        self.patterns: dict[str, tuple[int, ...]] = {}
        self.exceptions: dict[str, list[str]] = {}
        self._max_pat = 0

    # -- loading ------------------------------------------------------
    @classmethod
    def from_xml(cls, xml_text: str) -> "HyphenationTree":
        tree = cls()
        # strip the DOCTYPE (external DTD never fetched)
        xml_text = re.sub(r"<!DOCTYPE[^>]*>", "", xml_text)
        root = ET.fromstring(xml_text)
        classes = root.find("classes")
        if classes is not None and classes.text:
            for group in classes.text.split():
                tree.add_class(group)
        patterns = root.find("patterns")
        if patterns is not None:
            for chunk in "".join(patterns.itertext()).split():
                tree.add_pattern(chunk)
        exceptions = root.find("exceptions")
        if exceptions is not None:
            for word in "".join(exceptions.itertext()).split():
                tree.add_exception(word)
        return tree

    def add_class(self, chargroup: str):
        if chargroup:
            for c in chargroup:
                self.classes[c] = chargroup[0]

    def add_pattern(self, pattern: str):
        letters: list[str] = []
        values = [0]
        for c in pattern:
            if c.isdigit():
                values[len(letters)] = int(c)
            else:
                letters.append(c)
                values.append(0)
        key = "".join(letters)
        self.patterns[key] = tuple(values)
        self._max_pat = max(self._max_pat, len(key))

    def add_exception(self, word: str):
        self.exceptions[word.replace("-", "")] = word.split("-")

    # -- hyphenation --------------------------------------------------
    def hyphenate(self, word: str, remain: int = 1,
                  push: int = 1) -> list[int] | None:
        """Hyphenation points incl. synthetic 0 and len, or None
        (HyphenationTree.kt:201-309 incl. the ignore-leading-nonletter
        normalization)."""
        ignore_at_beginning = 0
        letters: list[str] = []
        end_of_letters = False
        for i, ch in enumerate(word):
            nc = self.classes.get(ch)
            if nc is None:
                if i == ignore_at_beginning:
                    ignore_at_beginning += 1
                else:
                    end_of_letters = True
            else:
                if end_of_letters:
                    return None
                letters.append(nc)
        n = len(letters)
        if n < remain + push:
            return None
        sw = "".join(letters)
        points: list[int] = []
        exc = self.exceptions.get(sw)
        if exc is not None:
            j = 0
            for part in exc:
                j += len(part)
                if remain <= j < n - push:
                    points.append(j + ignore_at_beginning)
        else:
            padded = "." + sw + "."
            il = [0] * (len(padded) + 1)
            for i in range(len(padded)):
                limit = min(self._max_pat, len(padded) - i)
                for l in range(1, limit + 1):
                    vals = self.patterns.get(padded[i:i + l])
                    if vals:
                        for k, v in enumerate(vals):
                            if v > il[i + k]:
                                il[i + k] = v
            for i in range(n):
                if (il[i + 1] & 1) == 1 and remain <= i <= n - push:
                    points.append(i + ignore_at_beginning)
        uniq: list[int] = []
        for p in points:
            if 0 < p < n and (not uniq or uniq[-1] != p):
                uniq.append(p)
        if not uniq:
            return None
        return [0] + uniq + [n]


def hyphenation_compound_filter(tree: HyphenationTree, dictionary=None,
                                min_word_size: int = 5,
                                min_subword_size: int = 2,
                                max_subword_size: int = 15,
                                only_longest_match: bool = False,
                                no_sub_matches: bool = False,
                                no_overlapping_matches: bool = False):
    """(terms, positions) filter; subwords join the original token at its
    position. Flag semantics per HyphenationCompoundWordTokenFilter.kt."""
    words = (frozenset(w.lower() for w in dictionary)
             if dictionary is not None else None)
    calc_sub = (not only_longest_match and not no_sub_matches
                and not no_overlapping_matches)

    def _decompose(term: str) -> list[str]:
        low = term.lower()
        if words is not None and not calc_sub and (
                low in words or (len(low) > 1 and low[:-1] in words)):
            return []
        hyp = tree.hyphenate(low, 1, 1)
        if hyp is None:
            return []
        max_sub = min(max_subword_size, len(term) - 1)
        consumed = -1
        out: list[str] = []
        last = (None, None)
        i = 0
        while i < len(hyp):
            if no_overlapping_matches:
                i = max(i, consumed)
                if i >= len(hyp):
                    break
            start = hyp[i]
            until = max(consumed, i) if no_sub_matches else i
            j = len(hyp) - 1
            while j > until:
                part_len = hyp[j] - start
                if part_len > max_sub:
                    j -= 1
                    continue
                if part_len < min_subword_size:
                    break
                if words is None or low[start:start + part_len] in words:
                    if (start, part_len) != last:
                        out.append(term[start:start + part_len])
                        last = (start, part_len)
                    consumed = j
                    if not calc_sub:
                        break
                elif low[start:start + part_len - 1] in words:
                    if (start, part_len - 1) != last:
                        out.append(term[start:start + part_len - 1])
                        last = (start, part_len - 1)
                    consumed = j
                    if not calc_sub:
                        break
                j -= 1
            i += 1
        return out

    def run(terms, positions):
        out_t, out_p = [], []
        for t, p in zip(terms, positions):
            out_t.append(t)
            out_p.append(p)
            if len(t) < min_word_size:
                continue
            for sub in _decompose(t):
                out_t.append(sub)
                out_p.append(p)
        return out_t, out_p

    return run
