"""Char filters (``analysis/common/.../analysis/charfilter/``).

* ``html_strip`` — ``charfilter/HTMLStripCharFilter.kt`` semantics
  (published HTMLStripCharFilter.jflex rules): block-level open/close tags
  and ``<br>`` become ``\\n``; inline-element tags (a, b, em, span, ...)
  are removed outright; comments / doctype / processing instructions are
  removed; ``<script>``/``<style>`` elements are removed *with* their
  content, leaving one ``\\n``; character entities are decoded
  (``&nbsp;`` to a plain space, as the reference's entity table does);
  tags named in ``escaped_tags`` pass through verbatim. Pathological
  malformed-HTML recovery (mid-tag backtracking of the generated DFA) is
  approximated: an unterminated tag falls back to the first raw ``>``, and
  a ``<`` with no following ``>`` is emitted literally (DEVIATIONS.md).
* ``mapping_charfilter`` — ``charfilter/MappingCharFilter.kt``: greedy
  longest-match replacement; replacement text is not re-scanned.
* ``html_strip_col`` — the pure-column (JVM regexp) subset used on the
  100 TB pipeline path where per-row Python is not wanted.
"""
from __future__ import annotations

import html as _html
import re

from pyspark.sql import Column, functions as F

# HTMLStripCharFilter.jflex InlineElment alternation
INLINE_ELEMENTS = frozenset((
    "a", "abbr", "acronym", "b", "basefont", "bdo", "big", "cite", "code",
    "dfn", "em", "font", "i", "img", "input", "kbd", "label", "q", "s",
    "samp", "select", "small", "span", "strike", "strong", "sub", "sup",
    "textarea", "tt", "u", "var",
))

_ENTITY = re.compile(r"&(?:#[0-9]{1,7}|#[xX][0-9A-Fa-f]{1,6}|[A-Za-z][A-Za-z0-9]{1,30});")
_TAG_NAME = re.compile(r"[A-Za-z][A-Za-z0-9:._-]*")


def _decode_entity(raw: str) -> str:
    if raw == "&nbsp;":
        return " "                      # entity table maps nbsp -> 0x20
    decoded = _html.unescape(raw)
    return decoded if decoded != raw else raw


def _find_tag_end(text: str, start: int) -> int:
    """Index just past the closing ``>`` of a tag whose ``<`` is at
    ``start``; -1 if none. Quote-aware first, raw-``>`` fallback."""
    n = len(text)
    i = start + 1
    quote = None
    while i < n:
        c = text[i]
        if quote is not None:
            if c == quote:
                quote = None
        elif c in "\"'":
            quote = c
        elif c == ">":
            return i + 1
        i += 1
    if quote is not None:               # unterminated quote: raw fallback
        pos = text.find(">", start + 1)
        if pos != -1:
            return pos + 1
    return -1


def html_strip(text: str, escaped_tags=()) -> str:
    """Strip HTML markup, returning the visible text (see module doc)."""
    if not text:
        return text
    escaped = frozenset(t.lower() for t in escaped_tags)
    out: list[str] = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c == "&":
            m = _ENTITY.match(text, i)
            if m:
                decoded = _decode_entity(m.group(0))
                if decoded != m.group(0):
                    out.append(decoded)
                    i = m.end()
                    continue
            out.append("&")
            i += 1
            continue
        if c != "<":
            out.append(c)
            i += 1
            continue
        # comment / doctype / processing instruction
        if text.startswith("<!--", i):
            end = text.find("-->", i + 4)
            i = n if end == -1 else end + 3
            continue
        if text.startswith("<!", i) or text.startswith("<?", i):
            end = text.find(">", i + 2)
            i = n if end == -1 else end + 1
            continue
        # tag name (open or close)
        j = i + 1
        closing = j < n and text[j] == "/"
        if closing:
            j += 1
        m = _TAG_NAME.match(text, j)
        if not m:
            out.append("<")
            i += 1
            continue
        name = m.group(0).lower()
        end = _find_tag_end(text, i)
        if end == -1:                   # '<' never closed: literal
            out.append("<")
            i += 1
            continue
        # a bare '<' inside the tag body (before any quote) inhibits
        # recognition, matching the reference's "< before >" behavior
        body = text[i + 1:end - 1]
        bare = re.split(r"[\"'].*?[\"']", body, flags=re.S)
        if any("<" in seg for seg in bare):
            out.append("<")
            i += 1
            continue
        if name in escaped:
            out.append(text[i:end])
            i = end
            continue
        if not closing and name in ("script", "style") \
                and not body.rstrip().endswith("/"):
            close = re.search(r"</%s[^>]*>" % name, text[end:], re.I)
            out.append("\n")
            i = n if close is None else end + close.end()
            continue
        if name == "br" or name not in INLINE_ELEMENTS:
            out.append("\n")
        i = end
    return "".join(out)


def mapping_charfilter(mapping: dict[str, str]):
    """MappingCharFilter.kt: greedy longest-match rewrite; replacements are
    not re-scanned (inputOff advances past the match)."""
    if not mapping or any(not k for k in mapping):
        raise ValueError("mapping keys must be non-empty")
    by_first: dict[str, list[str]] = {}
    for key in sorted(mapping, key=len, reverse=True):
        by_first.setdefault(key[0], []).append(key)
    max_len = max(len(k) for k in mapping)

    def run(text: str) -> str:
        if not text:
            return text
        out: list[str] = []
        i, n = 0, len(text)
        while i < n:
            best = None
            for key in by_first.get(text[i], ()):
                if text.startswith(key, i):
                    best = key          # keys pre-sorted longest-first
                    break
            if best is None:
                out.append(text[i])
                i += 1
            else:
                out.append(mapping[best])
                i += len(best)
        return "".join(out)

    run.max_match = max_len
    return run


def html_strip_analyzer(base_analyzer=None, escaped_tags=()):
    """HTMLStripCharFilter in front of an analyzer chain (the CharFilter
    slot of Analyzer.createComponents). Default base: StandardAnalyzer."""
    if base_analyzer is None:
        from lucene_kmp_spark.analysis.filters import standard_analyzer
        base_analyzer = standard_analyzer()
    tags = tuple(escaped_tags)

    def run(text: str):
        return base_analyzer(html_strip(text, tags))

    return run


# Common named entities kept JVM-side; the full table lives in the Python
# path above. Order matters: longest/most-specific first, amp LAST so
# freshly produced '&' are not re-decoded differently than the reference.
_COL_ENTITIES = (
    ("&nbsp;", " "), ("&quot;", '"'), ("&apos;", "'"),
    ("&lt;", "<"), ("&gt;", ">"), ("&amp;", "&"),
)


def html_strip_col(col) -> Column:
    """Pure-column html_strip subset (no script/style content removal, no
    escaped_tags, named entities limited to the common six + numeric):
    chained JVM regexp_replace, zero Python in the scan. Use for bulk
    pipeline hygiene at scale; use ``html_strip`` for reference parity."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, r"<!--.*?-->", "")
    c = F.regexp_replace(c, r"(?is)<(script|style)\b[^>]*>.*?</\1[^>]*>", "\n")
    c = F.regexp_replace(c, r"(?i)<!DOCTYPE[^>]*>|<\?[^>]*>", "")
    inline = "|".join(sorted(INLINE_ELEMENTS))
    c = F.regexp_replace(c, r"(?i)</?(%s)(\s[^>]*)?/?>" % inline, "")
    c = F.regexp_replace(c, r"(?i)</?[a-z][a-z0-9:._-]*(\s[^>]*)?/?>", "\n")
    for ent, repl in _COL_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(repl))
    return c
