"""WordDelimiterGraphFilter (``analysis/common/.../miscellaneous/
WordDelimiterGraphFilter.kt`` + ``WordDelimiterIterator.kt``).

Splits tokens on delimiter characters, case transitions and alpha/digit
boundaries; optionally emits catenated runs (``catenate_words`` /
``catenate_numbers`` / ``catenate_all``) and the original token, with the
reference's exact part ordering (sort by start offset, longer spans
first) and graph positions (catenations share their first part's
position). English possessives are stemmed. Flat ``(terms, positions)``
output: a token split into N graph positions shifts later tokens by N-1,
exactly like Lucene's flattened index positions.
"""
from __future__ import annotations

import unicodedata

LOWER = 0x01
UPPER = 0x02
DIGIT = 0x04
SUBWORD_DELIM = 0x08
ALPHA = 0x03

_DONE = -1

_TYPE_CACHE: dict[str, int] = {}


def _char_type(c: str) -> int:
    t = _TYPE_CACHE.get(c)
    if t is None:
        cat = unicodedata.category(c)
        if cat == "Lu":
            t = UPPER
        elif c.islower() and ord(c) < 256:
            # the <256 table tests Character.isLowerCase first (covers
            # Other_Lowercase like ª/º)
            t = LOWER
        elif cat == "Ll":
            t = LOWER
        elif cat in ("Lt", "Lm", "Lo", "Mn", "Me", "Mc"):
            t = ALPHA
        elif cat in ("Nd", "Nl", "No"):
            t = DIGIT
        elif cat == "Cs":
            t = ALPHA | DIGIT
        else:
            t = SUBWORD_DELIM
        _TYPE_CACHE[c] = t
    return t


def _is_alpha(t): return (t & ALPHA) != 0
def _is_digit(t): return (t & DIGIT) != 0
def _is_delim(t): return (t & SUBWORD_DELIM) != 0
def _is_upper(t): return (t & UPPER) != 0


class _Iterator:
    """WordDelimiterIterator.kt over a Python string."""

    def __init__(self, text: str, split_case: bool, split_num: bool,
                 stem_poss: bool):
        self.text = text
        self.split_case = split_case
        self.split_num = split_num
        self.stem_poss = stem_poss
        self.current = 0
        self.end = 0
        self.skip_possessive = False
        self.has_final_possessive = False
        self.start_bounds = 0
        self.end_bounds = len(text)
        while self.start_bounds < len(text) and \
                _is_delim(_char_type(text[self.start_bounds])):
            self.start_bounds += 1
        while self.end_bounds > self.start_bounds and \
                _is_delim(_char_type(text[self.end_bounds - 1])):
            self.end_bounds -= 1
        if self._ends_with_possessive(self.end_bounds):
            self.has_final_possessive = True
        self.current = self.start_bounds

    def _ends_with_possessive(self, pos: int) -> bool:
        t = self.text
        return (self.stem_poss and pos > 2
                and t[pos - 2] == "'"
                and t[pos - 1] in "sS"
                and _is_alpha(_char_type(t[pos - 3]))
                and (pos == self.end_bounds
                     or _is_delim(_char_type(t[pos]))))

    def _is_break(self, last_type: int, typ: int) -> bool:
        if (typ & last_type) != 0:
            return False
        if not self.split_case and _is_alpha(last_type) and _is_alpha(typ):
            return False
        if _is_upper(last_type) and _is_alpha(typ):
            return False
        if not self.split_num and ((_is_alpha(last_type) and _is_digit(typ))
                                   or (_is_digit(last_type)
                                       and _is_alpha(typ))):
            return False
        return True

    def next(self) -> int:
        self.current = self.end
        if self.current == _DONE:
            return _DONE
        if self.skip_possessive:
            self.current += 2
            self.skip_possessive = False
        last_type = 0
        while self.current < self.end_bounds:
            last_type = _char_type(self.text[self.current])
            if not _is_delim(last_type):
                break
            self.current += 1
        if self.current >= self.end_bounds:
            self.end = _DONE
            return _DONE
        self.end = self.current + 1
        while self.end < self.end_bounds:
            typ = _char_type(self.text[self.end])
            if self._is_break(last_type, typ):
                break
            last_type = typ
            self.end += 1
        if self.end < self.end_bounds - 1 and \
                self._ends_with_possessive(self.end + 2):
            self.skip_possessive = True
        return self.end

    def type(self) -> int:
        if self.end == _DONE:
            return 0
        t = _char_type(self.text[self.current])
        return ALPHA if t in (LOWER, UPPER) else t

    def is_single_word(self) -> bool:
        if self.has_final_possessive:
            return (self.current == self.start_bounds
                    and self.end == self.end_bounds - 2)
        return (self.current == self.start_bounds
                and self.end == self.end_bounds)


class _Concat:
    __slots__ = ("parts", "start_part", "end_part", "start_pos", "type")

    def __init__(self):
        self.parts: list[str] = []
        self.start_part = 0
        self.end_part = 0
        self.start_pos = 0
        self.type = 0

    @property
    def count(self):
        return len(self.parts)

    def clear(self):
        self.parts = []
        self.start_part = self.end_part = self.type = 0


def _token_parts(term: str, flags: dict) -> list[tuple[str, int, int, int, int]] | None:
    """bufferWordParts(): sorted (text, startPos, endPos, startPart,
    endPart) parts, or None for pass-through (single clean word /
    protected). Empty list = token dropped (all delimiters)."""
    it = _Iterator(term, flags["split_on_case_change"],
                   flags["split_on_numerics"],
                   flags["stem_english_possessive"])
    it.next()
    if it.current == 0 and it.end == len(term):
        return None                       # clean single word: pass through
    if it.end == _DONE:                   # all delimiters
        return [(term, 0, 1, 0, len(term))] if flags["preserve_original"] \
            else []

    buffered: list[tuple[str, int, int, int, int]] = []
    word_pos = 0
    concat = _Concat()
    concat_all = _Concat()
    last_concat_count = 0

    def write_concat(c: _Concat, end_pos: int):
        buffered.append(("".join(c.parts), c.start_pos, end_pos,
                         c.start_part, c.end_part))

    def should_concat(t):
        return ((flags["catenate_words"] and _is_alpha(t))
                or (flags["catenate_numbers"] and _is_digit(t)))

    def should_generate(t):
        return ((flags["generate_word_parts"] and _is_alpha(t))
                or (flags["generate_number_parts"] and _is_digit(t)))

    def do_concat(c: _Concat, t):
        if not c.parts:
            c.type = t
            c.start_part = it.current
            c.start_pos = word_pos
        c.parts.append(term[it.current:it.end])
        c.end_part = it.end

    if flags["preserve_original"]:
        buffered.append((term, 0, -1, 0, len(term)))  # endPos patched below

    if it.is_single_word():
        buffered.append((term[it.current:it.end], word_pos, word_pos + 1,
                         it.current, it.end))
        word_pos += 1
        it.next()
    else:
        while it.end != _DONE:
            word_type = it.type()
            if concat.parts and (concat.type & word_type) == 0:
                if word_pos == concat.start_pos:
                    word_pos += 1
                last_concat_count = concat.count
                if concat.count != 1 or not should_generate(concat.type):
                    write_concat(concat, word_pos)
                concat.clear()
            if should_concat(word_type):
                do_concat(concat, word_type)
            if flags["catenate_all"]:
                do_concat(concat_all, word_type)
            if should_generate(word_type):
                buffered.append((term[it.current:it.end], word_pos,
                                 word_pos + 1, it.current, it.end))
                word_pos += 1
            it.next()
        if concat.parts:
            if word_pos == concat.start_pos:
                word_pos += 1
            last_concat_count = concat.count
            if concat.count != 1 or not should_generate(concat.type):
                write_concat(concat, word_pos)
            concat.clear()
        if concat_all.parts:
            if concat_all.count > last_concat_count:
                if word_pos == concat_all.start_pos:
                    word_pos += 1
                write_concat(concat_all, word_pos)
            concat_all.clear()

    if flags["preserve_original"]:
        if word_pos == 0:
            word_pos += 1
        text, sp, _, spt, ept = buffered[0]
        buffered[0] = (text, sp, word_pos, spt, ept)

    head = buffered[:1] if flags["preserve_original"] else []
    tail = buffered[1:] if flags["preserve_original"] else buffered
    tail.sort(key=lambda b: (b[3], -b[4]))
    return head + tail


def word_delimiter_graph_filter(
    generate_word_parts: bool = True,
    generate_number_parts: bool = True,
    catenate_words: bool = False,
    catenate_numbers: bool = False,
    catenate_all: bool = False,
    preserve_original: bool = False,
    split_on_case_change: bool = True,
    split_on_numerics: bool = True,
    stem_english_possessive: bool = True,
    protected_words=(),
):
    """(terms, positions) -> (terms, positions) stream filter; later
    tokens shift by the number of extra graph positions a split creates
    (Lucene's flattened indexing view)."""
    flags = dict(
        generate_word_parts=generate_word_parts,
        generate_number_parts=generate_number_parts,
        catenate_words=catenate_words,
        catenate_numbers=catenate_numbers,
        catenate_all=catenate_all,
        preserve_original=preserve_original,
        split_on_case_change=split_on_case_change,
        split_on_numerics=split_on_numerics,
        stem_english_possessive=stem_english_possessive,
    )
    protected = frozenset(protected_words)

    def run(terms, positions):
        out_t, out_p = [], []
        prev_in = -1
        last_out = -1
        pending = 0                       # accumPosInc analog
        for term, pos in zip(terms, positions):
            pending += pos - prev_in
            prev_in = pos
            if term in protected:
                last_out += pending
                pending = 0
                out_t.append(term)
                out_p.append(last_out)
                continue
            parts = _token_parts(term, flags)
            if parts is None:
                last_out += pending
                pending = 0
                out_t.append(term)
                out_p.append(last_out)
                continue
            if not parts:                 # dropped: hole accumulates
                continue
            base = last_out + pending
            pending = 0
            for text, sp, _ep, _spt, _ept in parts:
                out_t.append(text)
                out_p.append(base + sp)
            last_out = base + parts[-1][1]
        return out_t, out_p

    return run
