"""RSLP stemming framework (``analysis/pt/RSLPStemmerBase.kt``).

The RSLP ("Removedor de Sufixos da Lingua Portuguesa") framework drives a
stemmer from a declarative steps file: each step has a minimum word size,
optional gating suffixes, and ordered rules ``{suffix, min-stem, replacement
[, exceptions]}`` where exceptions are whole words (step type 1) or suffixes
(step type 0). First matching rule in a step wins.

The rule data files are the published RSLP/RSLG rule sets distributed with
Apache Lucene (ASL 2.0); they are data, embedded verbatim below their
consuming stemmers (``galician_rslp.py``).
"""

from __future__ import annotations

import re


class RslpRule:
    __slots__ = ("suffix", "min", "replacement", "exceptions", "whole_word")

    def __init__(self, suffix, min_, replacement, exceptions=(),
                 whole_word=True):
        self.suffix = suffix
        self.min = min_
        self.replacement = replacement
        self.exceptions = tuple(exceptions)
        self.whole_word = whole_word

    def matches(self, word: str) -> bool:
        if len(word) - len(self.suffix) < self.min \
                or not word.endswith(self.suffix):
            return False
        if self.exceptions:
            if self.whole_word:
                if word in self.exceptions:
                    return False
            else:
                for exc in self.exceptions:
                    if word.endswith(exc):
                        return False
        return True

    def replace(self, word: str) -> str:
        return word[: len(word) - len(self.suffix)] + self.replacement


class RslpStep:
    __slots__ = ("name", "rules", "min_word_size", "suffixes")

    def __init__(self, name, rules, min_, suffixes):
        self.name = name
        self.rules = tuple(rules)
        if min_ == 0:
            min_ = min(r.min + len(r.suffix) for r in rules)
        self.min_word_size = min_
        self.suffixes = tuple(suffixes) if suffixes else ()

    def apply(self, word: str) -> str:
        if len(word) < self.min_word_size:
            return word
        if self.suffixes and not word.endswith(self.suffixes):
            return word
        for rule in self.rules:
            if rule.matches(word):
                return rule.replace(word)
        return word


_HEADER = re.compile(r'^\{\s*"([^"]*)",\s*([0-9]+),\s*(0|1),\s*\{(.*)\},\s*$')
_STRIP = re.compile(r'^\{\s*"([^"]*)",\s*([0-9]+)\s*\}\s*(,|(\}\s*;))$')
_REP = re.compile(r'^\{\s*"([^"]*)",\s*([0-9]+),\s*"([^"]*)"\s*\}\s*(,|(\}\s*;))$')
_EXC = re.compile(
    r'^\{\s*"([^"]*)",\s*([0-9]+),\s*"([^"]*)",\s*\{(.*)\}\s*\}\s*(,|(\}\s*;))$')


def _parse_list(s: str):
    if not s:
        return ()
    return tuple(x.strip().strip('"') for x in s.split(","))


def parse_rslp(data: str) -> dict:
    """Parse an RSLP steps file into {step name: RslpStep}."""
    lines = [ln.strip() for ln in data.splitlines()]
    lines = [ln for ln in lines if ln and not ln.startswith("#")]
    steps = {}
    i = 0
    while i < len(lines):
        h = _HEADER.match(lines[i])
        if not h:
            raise ValueError(f"bad RSLP step header: {lines[i]!r}")
        name, min_, type_ = h.group(1), int(h.group(2)), int(h.group(3))
        suffixes = _parse_list(h.group(4))
        rules = []
        i += 1
        while i < len(lines):
            ln = lines[i]
            m = _STRIP.match(ln)
            if m:
                rules.append(RslpRule(m.group(1), int(m.group(2)), ""))
            else:
                m = _REP.match(ln)
                if m:
                    rules.append(RslpRule(m.group(1), int(m.group(2)),
                                          m.group(3)))
                else:
                    m = _EXC.match(ln)
                    if not m:
                        raise ValueError(f"bad RSLP rule: {ln!r}")
                    rules.append(RslpRule(
                        m.group(1), int(m.group(2)), m.group(3),
                        _parse_list(m.group(4)), whole_word=(type_ == 1)))
            i += 1
            if ln.rstrip().endswith(";"):
                break
        steps[name] = RslpStep(name, rules, min_, suffixes)
    return steps
