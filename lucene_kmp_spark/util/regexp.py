"""Lucene RegExp syntax engine: parser + codepoint-range automaton.

Faithful reimplementation of the reference's regular-expression surface
(``core/.../util/automaton/RegExp.kt``), which is NOT Java/PCRE regex:

* operators: union ``|``, concatenation, repeat ``? * + {n} {n,} {n,m}``,
  char classes ``[a-z]`` / ``[^a-z]``, any-char ``.``, quoted strings
  ``"..."``, groups ``( )``, predefined classes ``\\d \\D \\s \\S \\w \\W``
* optional syntax (gated by the same flag constants, default ``ALL``):
  intersection ``&`` (INTERSECTION), empty language ``#`` (EMPTY),
  any-string ``@`` (ANYSTRING), numeric intervals ``<n-m>`` (INTERVAL),
  named automata ``<id>`` (AUTOMATON — unsupported here, as in the
  reference without an AutomatonProvider), and the deprecated complement
  ``~`` (DEPRECATED_COMPLEMENT, NOT part of ALL — RegExp.kt:1359)
* matching is anchored: the automaton must consume the entire term
  (AutomatonQuery semantics)

Implementation: recursive-descent parse into an AST (the same grammar
productions as RegExp.kt parseUnionExp -> parseInterExp -> parseConcatExp ->
parseRepeatExp -> parseComplExp -> parseCharClassExp -> parseSimpleExp),
compiled to a Thompson NFA over codepoint ranges; complement and
intersection determinize via subset construction (the same
Brics-automaton-style algebra the reference uses, ``util/automaton/
Operations.kt``). ``compile_regexp`` returns a picklable DFA matcher, so
term-dictionary filtering runs partition-parallel inside a pandas UDF.
"""

from __future__ import annotations

from bisect import bisect_right

# syntax flags (RegExp.kt:1266-1286)
INTERSECTION = 0x0001
EMPTY = 0x0004
ANYSTRING = 0x0008
AUTOMATON = 0x0010
INTERVAL = 0x0020
ALL = 0xFF
NONE = 0x0000
# match flags (RegExp.kt:1297,1347) and the deprecated complement (:1359)
ASCII_CASE_INSENSITIVE = 0x0100
CASE_INSENSITIVE = 0x0200
DEPRECATED_COMPLEMENT = 0x10000

_MAX_CP = 0x10FFFF


# --------------------------------------------------------------------------
# NFA fragments (codepoint-range transitions + epsilon edges)
# --------------------------------------------------------------------------
class _Nfa:
    __slots__ = ("n", "start", "accepts", "trans", "eps")

    def __init__(self, n, start, accepts, trans, eps):
        self.n = n                  # state count
        self.start = start
        self.accepts = accepts      # frozenset/set of accepting states
        self.trans = trans          # list[(src, lo, hi, dst)]
        self.eps = eps              # list[(src, dst)]


def _shift(a: _Nfa, off: int):
    return (
        {s + off for s in a.accepts},
        [(s + off, lo, hi, d + off) for (s, lo, hi, d) in a.trans],
        [(s + off, d + off) for (s, d) in a.eps],
    )


def _ranges_nfa(ranges) -> _Nfa:
    """Accepts exactly one codepoint from any of the (lo, hi) ranges."""
    trans = [(0, lo, hi, 1) for (lo, hi) in ranges if lo <= hi]
    return _Nfa(2, 0, {1}, trans, [])


def _string_nfa(s: str) -> _Nfa:
    trans = [(i, ord(c), ord(c), i + 1) for i, c in enumerate(s)]
    return _Nfa(len(s) + 1, 0, {len(s)}, trans, [])


def _empty_string_nfa() -> _Nfa:
    return _Nfa(1, 0, {0}, [], [])


def _empty_lang_nfa() -> _Nfa:
    return _Nfa(1, 0, set(), [], [])


def _any_string_nfa() -> _Nfa:
    return _Nfa(1, 0, {0}, [(0, 0, _MAX_CP, 0)], [])


def _union_nfa(a: _Nfa, b: _Nfa) -> _Nfa:
    # new start 0; a at 1..; b after
    aacc, atr, aeps = _shift(a, 1)
    off = 1 + a.n
    bacc, btr, beps = _shift(b, off)
    eps = aeps + beps + [(0, a.start + 1), (0, b.start + off)]
    return _Nfa(1 + a.n + b.n, 0, aacc | bacc, atr + btr, eps)


def _concat_nfa(a: _Nfa, b: _Nfa) -> _Nfa:
    bacc, btr, beps = _shift(b, a.n)
    eps = list(a.eps) + beps + [(s, b.start + a.n) for s in a.accepts]
    return _Nfa(a.n + b.n, a.start, bacc, list(a.trans) + btr, eps)


def _optional_nfa(a: _Nfa) -> _Nfa:
    return _Nfa(a.n, a.start, set(a.accepts) | {a.start}, a.trans, a.eps)


def _star_nfa(a: _Nfa) -> _Nfa:
    eps = list(a.eps) + [(s, a.start) for s in a.accepts]
    return _Nfa(a.n, a.start, set(a.accepts) | {a.start}, a.trans, eps)


def _copy_nfa(a: _Nfa) -> _Nfa:
    return _Nfa(a.n, a.start, set(a.accepts), list(a.trans), list(a.eps))


def _repeat_min_nfa(a: _Nfa, n: int) -> _Nfa:
    if n == 0:
        return _star_nfa(_copy_nfa(a))
    out = _copy_nfa(a)
    for _ in range(n - 1):
        out = _concat_nfa(out, _copy_nfa(a))
    return _concat_nfa(out, _star_nfa(_copy_nfa(a)))


def _repeat_minmax_nfa(a: _Nfa, n: int, m: int) -> _Nfa:
    if m == 0:
        return _empty_string_nfa()
    parts = [_copy_nfa(a) for _ in range(n)]
    opts = [_optional_nfa(_copy_nfa(a)) for _ in range(m - n)]
    # nest the optionals so a?a? can't match the second 'a' alone — build
    # right-to-left: (a (a ...)?)?
    tail = None
    for _ in range(m - n):
        tail = _optional_nfa(_concat_nfa(_copy_nfa(a), tail) if tail else _copy_nfa(a))
    del opts
    pieces = parts + ([tail] if tail else [])
    if not pieces:
        return _empty_string_nfa()
    out = pieces[0]
    for p in pieces[1:]:
        out = _concat_nfa(out, p)
    return out


# --------------------------------------------------------------------------
# subset construction / complement / intersection (Operations.kt analogs)
# --------------------------------------------------------------------------
class Dfa:
    """Deterministic automaton: per-state sorted range transitions.

    Picklable; ``match(term)`` runs the whole string (anchored) in
    O(len * log ranges).
    """

    __slots__ = ("start", "accepts", "lows", "dests")

    def __init__(self, start, accepts, lows, dests):
        self.start = start
        self.accepts = accepts  # set[int]
        # per state: sorted list of interval low bounds and the dest for the
        # interval starting there (-1 = dead); intervals partition [0, MAX]
        self.lows = lows        # list[list[int]]
        self.dests = dests      # list[list[int]]

    def match(self, term: str) -> bool:
        st = self.start
        for ch in term:
            cp = ord(ch)
            lows = self.lows[st]
            st = self.dests[st][bisect_right(lows, cp) - 1]
            if st < 0:
                return False
        return st in self.accepts

    def common_prefix(self) -> str:
        """Longest literal prefix every accepted string starts with
        (Operations.getCommonPrefix analog) — lets the term-dictionary scan
        push a `startswith` predicate down to Parquet before the DFA UDF."""
        out: list[str] = []
        st = self.start
        seen: set[int] = set()
        while st not in self.accepts and st not in seen:
            seen.add(st)
            lows, dests = self.lows[st], self.dests[st]
            live = [
                (lo, (lows[i + 1] - 1) if i + 1 < len(lows) else _MAX_CP, dst)
                for i, (lo, dst) in enumerate(zip(lows, dests))
                if dst >= 0
            ]
            if len(live) != 1 or live[0][0] != live[0][1]:
                break
            out.append(chr(live[0][0]))
            st = live[0][2]
        return "".join(out)


def _eps_closure(nfa: _Nfa, states) -> frozenset:
    eps_map: dict[int, list[int]] = {}
    for s, d in nfa.eps:
        eps_map.setdefault(s, []).append(d)
    out = set(states)
    stack = list(states)
    while stack:
        s = stack.pop()
        for d in eps_map.get(s, ()):
            if d not in out:
                out.add(d)
                stack.append(d)
    return frozenset(out)


def _determinize(nfa: _Nfa) -> Dfa:
    trans_by_src: dict[int, list[tuple[int, int, int]]] = {}
    for s, lo, hi, d in nfa.trans:
        trans_by_src.setdefault(s, []).append((lo, hi, d))
    eps_map: dict[int, list[int]] = {}
    for s, d in nfa.eps:
        eps_map.setdefault(s, []).append(d)

    def closure(states):
        out = set(states)
        stack = list(states)
        while stack:
            s = stack.pop()
            for d in eps_map.get(s, ()):
                if d not in out:
                    out.add(d)
                    stack.append(d)
        return frozenset(out)

    start = closure({nfa.start})
    ids = {start: 0}
    work = [start]
    lows: list[list[int]] = []
    dests: list[list[int]] = []
    accepts: set[int] = set()
    while work:
        cur = work.pop()
        cid = ids[cur]
        while len(lows) <= cid:
            lows.append([])
            dests.append([])
        if cur & nfa.accepts:
            accepts.add(cid)
        edges = [t for s in cur for t in trans_by_src.get(s, ())]
        # partition [0, MAX] at all range boundaries
        cuts = {0}
        for lo, hi, _ in edges:
            cuts.add(lo)
            if hi + 1 <= _MAX_CP:
                cuts.add(hi + 1)
        slows: list[int] = []
        sdests: list[int] = []
        for c in sorted(cuts):
            tgt = frozenset(d for lo, hi, d in edges if lo <= c <= hi)
            if tgt:
                tgt = closure(tgt)
                if tgt not in ids:
                    ids[tgt] = len(ids)
                    work.append(tgt)
                dst = ids[tgt]
            else:
                dst = -1
            if sdests and sdests[-1] == dst:
                continue  # merge adjacent identical intervals
            slows.append(c)
            sdests.append(dst)
        lows[cid] = slows
        dests[cid] = sdests
    return Dfa(0, accepts, lows, dests)


def _dfa_to_nfa(d: Dfa) -> _Nfa:
    trans = []
    for s, (slows, sdests) in enumerate(zip(d.lows, d.dests)):
        for i, (lo, dst) in enumerate(zip(slows, sdests)):
            if dst < 0:
                continue
            hi = (slows[i + 1] - 1) if i + 1 < len(slows) else _MAX_CP
            trans.append((s, lo, hi, dst))
    return _Nfa(len(d.lows), d.start, set(d.accepts), trans, [])


def _complement_nfa(a: _Nfa) -> _Nfa:
    d = _determinize(a)
    n = len(d.lows)
    sink = n  # totalize: dead transitions go to an accepting sink
    trans = []
    for s, (slows, sdests) in enumerate(zip(d.lows, d.dests)):
        for i, (lo, dst) in enumerate(zip(slows, sdests)):
            hi = (slows[i + 1] - 1) if i + 1 < len(slows) else _MAX_CP
            trans.append((s, lo, hi, dst if dst >= 0 else sink))
    trans.append((sink, 0, _MAX_CP, sink))
    accepts = {s for s in range(n) if s not in d.accepts} | {sink}
    return _Nfa(n + 1, d.start, accepts, trans, [])


def _intersect_nfa(a: _Nfa, b: _Nfa) -> _Nfa:
    da, db = _determinize(a), _determinize(b)

    def step(d: Dfa, s: int, cp: int) -> int:
        return d.dests[s][bisect_right(d.lows[s], cp) - 1]

    ids = {(da.start, db.start): 0}
    work = [(da.start, db.start)]
    trans = []
    accepts = set()
    while work:
        sa, sb = work.pop()
        cid = ids[(sa, sb)]
        if sa in da.accepts and sb in db.accepts:
            accepts.add(cid)
        cuts = sorted(set(da.lows[sa]) | set(db.lows[sb]))
        for i, lo in enumerate(cuts):
            ta, tb = step(da, sa, lo), step(db, sb, lo)
            if ta < 0 or tb < 0:
                continue
            hi = (cuts[i + 1] - 1) if i + 1 < len(cuts) else _MAX_CP
            if (ta, tb) not in ids:
                ids[(ta, tb)] = len(ids)
                work.append((ta, tb))
            trans.append((cid, lo, hi, ids[(ta, tb)]))
    return _Nfa(max(len(ids), 1), 0, accepts, trans, [])


def _decimal_interval_nfa(mn: int, mx: int, digits: int) -> _Nfa:
    """Automata.makeDecimalInterval semantics: decimal strings for
    mn..mx; digits > 0 = exact width (zero-padded); digits == 0 = variable
    width with any number of leading zeros accepted."""

    def digit_dp(lo_s: str, hi_s: str) -> _Nfa:
        # fixed-width bounded counter automaton: state = (pos, tightLow, tightHigh)
        width = len(lo_s)
        ids: dict[tuple[int, bool, bool], int] = {(0, True, True): 0}
        work = [(0, True, True)]
        trans = []
        accepts = set()
        while work:
            key = work.pop()
            pos, tl, th = key
            cid = ids[key]
            if pos == width:
                accepts.add(cid)
                continue
            lo_d = int(lo_s[pos]) if tl else 0
            hi_d = int(hi_s[pos]) if th else 9
            for d in range(lo_d, hi_d + 1):
                nkey = (pos + 1, tl and str(d) == lo_s[pos], th and str(d) == hi_s[pos])
                if nkey not in ids:
                    ids[nkey] = len(ids)
                    work.append(nkey)
                c = ord("0") + d
                trans.append((cid, c, c, ids[nkey]))
        return _Nfa(len(ids), 0, accepts, trans, [])

    if digits > 0:
        return digit_dp(str(mn).zfill(digits), str(mx).zfill(digits))
    # variable width: (0)* then the significant digits without leading zero
    body = None
    lmin, lmax = len(str(mn)), len(str(mx))
    for width in range(lmin, lmax + 1):
        lo = mn if width == lmin else 10 ** (width - 1)
        hi = mx if width == lmax else 10 ** width - 1
        if lo > hi:
            continue
        piece = digit_dp(str(lo), str(hi))
        body = piece if body is None else _union_nfa(body, piece)
    zeros = _star_nfa(_ranges_nfa([(ord("0"), ord("0"))]))
    return _concat_nfa(zeros, body if body is not None else _empty_lang_nfa())


# --------------------------------------------------------------------------
# parser (grammar of RegExp.kt:989-1262)
# --------------------------------------------------------------------------
class _Parser:
    def __init__(self, s: str, flags: int):
        self.s = s
        self.pos = 0
        self.flags = flags

    # --- stream helpers
    def _more(self) -> bool:
        return self.pos < len(self.s)

    def _peek(self, chars: str) -> bool:
        return self._more() and self.s[self.pos] in chars

    def _match(self, ch: str) -> bool:
        if self._peek(ch):
            self.pos += 1
            return True
        return False

    def _next(self) -> str:
        if not self._more():
            raise ValueError("unexpected end of string")
        c = self.s[self.pos]
        self.pos += 1
        return c

    def _check(self, flag: int) -> bool:
        return (self.flags & flag) != 0

    def _ci_forms(self, cp: int) -> list[int]:
        """toCaseInsensitiveChar analog (simple 1:1 alternates only)."""
        if not self._check(ASCII_CASE_INSENSITIVE | CASE_INSENSITIVE):
            return [cp]
        ch = chr(cp)
        forms = {cp}
        for alt in (ch.lower(), ch.upper()):
            if len(alt) == 1:
                forms.add(ord(alt))
        return sorted(forms)

    # --- grammar
    def parse_union(self) -> _Nfa:
        e = self.parse_inter()
        while self._match("|"):
            e = _union_nfa(e, self.parse_inter())
        return e

    def parse_inter(self) -> _Nfa:
        e = self.parse_concat()
        while self._check(INTERSECTION) and self._match("&"):
            e = _intersect_nfa(e, self.parse_concat())
        return e

    def parse_concat(self) -> _Nfa:
        e = self.parse_repeat()
        while (
            self._more()
            and not self._peek(")|")
            and (not self._check(INTERSECTION) or not self._peek("&"))
        ):
            e = _concat_nfa(e, self.parse_repeat())
        return e

    def parse_repeat(self) -> _Nfa:
        e = self.parse_compl()
        while self._peek("?*+{"):
            if self._match("?"):
                e = _optional_nfa(e)
            elif self._match("*"):
                e = _star_nfa(e)
            elif self._match("+"):
                e = _repeat_min_nfa(e, 1)
            elif self._match("{"):
                start = self.pos
                while self._peek("0123456789"):
                    self.pos += 1
                if start == self.pos:
                    raise ValueError(f"integer expected at position {self.pos}")
                n = int(self.s[start : self.pos])
                m = -1
                if self._match(","):
                    start = self.pos
                    while self._peek("0123456789"):
                        self.pos += 1
                    if start != self.pos:
                        m = int(self.s[start : self.pos])
                else:
                    m = n
                if not self._match("}"):
                    raise ValueError(f"expected '}}' at position {self.pos}")
                if m != -1 and n > m:
                    raise ValueError(f"invalid repetition range(out of order): {n}..{m}")
                e = _repeat_min_nfa(e, n) if m == -1 else _repeat_minmax_nfa(e, n, m)
        return e

    def parse_compl(self) -> _Nfa:
        if self._check(DEPRECATED_COMPLEMENT) and self._match("~"):
            return _complement_nfa(self.parse_compl())
        return self.parse_char_class_exp()

    def parse_char_class_exp(self) -> _Nfa:
        if self._match("["):
            negate = self._match("^")
            ranges = self.parse_char_classes()
            if not self._match("]"):
                raise ValueError(f"expected ']' at position {self.pos}")
            if negate:
                # anychar ∩ ¬class — exactly one codepoint outside the set
                return _intersect_nfa(
                    _ranges_nfa([(0, _MAX_CP)]), _complement_nfa(_ranges_nfa(ranges))
                )
            return _ranges_nfa(ranges)
        return self.parse_simple()

    def parse_char_classes(self) -> list[tuple[int, int]]:
        ranges: list[tuple[int, int]] = []
        while True:
            if self._match("\\") :
                if self._peek("\\ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"):
                    self._expand_predefined(ranges)
                else:
                    self.pos -= 1
                    c = self.parse_char_exp()
                    ranges.append((c, c))
            else:
                c = self.parse_char_exp()
                if self._match("-"):
                    ranges.append((c, self.parse_char_exp()))
                else:
                    for form in self._ci_forms(c):
                        ranges.append((form, form))
            if not (self._more() and not self._peek("]")):
                break
        return ranges

    def _expand_predefined(self, ranges: list[tuple[int, int]]) -> None:
        if self._peek("\\"):
            ranges.append((ord("\\"), ord("\\")))
            self.pos += 1
        elif self._peek("d"):
            ranges.append((ord("0"), ord("9")))
            self.pos += 1
        elif self._peek("D"):
            ranges.extend([(0, ord("0") - 1), (ord("9") + 1, _MAX_CP)])
            self.pos += 1
        elif self._peek("s"):
            ranges.extend([(9, 10), (13, 13), (32, 32)])
            self.pos += 1
        elif self._peek("S"):
            ranges.extend([(0, 8), (11, 12), (14, 31), (33, _MAX_CP)])
            self.pos += 1
        elif self._peek("w"):
            ranges.extend(
                [(ord("0"), ord("9")), (ord("A"), ord("Z")), (95, 95), (ord("a"), ord("z"))]
            )
            self.pos += 1
        elif self._peek("W"):
            ranges.extend(
                [
                    (0, ord("0") - 1),
                    (ord("9") + 1, ord("A") - 1),
                    (ord("Z") + 1, 94),
                    (96, 96),
                    (ord("z") + 1, _MAX_CP),
                ]
            )
            self.pos += 1
        elif self._peek("abcefghijklmnopqrtuvxyz") or self._peek("ABCEFGHIJKLMNOPQRTUVXYZ"):
            raise ValueError("invalid character class \\" + self._next())

    def _match_predefined(self) -> _Nfa | None:
        if self._match("\\"):
            if self._peek("\\ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"):
                ranges: list[tuple[int, int]] = []
                self._expand_predefined(ranges)
                return _ranges_nfa(ranges)
            self.pos -= 1
        return None

    def parse_simple(self) -> _Nfa:
        if self._match("."):
            return _ranges_nfa([(0, _MAX_CP)])
        if self._check(EMPTY) and self._match("#"):
            return _empty_lang_nfa()
        if self._check(ANYSTRING) and self._match("@"):
            return _any_string_nfa()
        if self._match('"'):
            start = self.pos
            while self._more() and not self._peek('"'):
                self.pos += 1
            if not self._match('"'):
                raise ValueError(f"expected '\"' at position {self.pos}")
            return self._string(self.s[start : self.pos - 1])
        if self._match("("):
            if self._match(")"):
                return _empty_string_nfa()
            e = self.parse_union()
            if not self._match(")"):
                raise ValueError(f"expected ')' at position {self.pos}")
            return e
        if (self._check(AUTOMATON) or self._check(INTERVAL)) and self._match("<"):
            start = self.pos
            while self._more() and not self._peek(">"):
                self.pos += 1
            if not self._match(">"):
                raise ValueError(f"expected '>' at position {self.pos}")
            s = self.s[start : self.pos - 1]
            i = s.find("-")
            if i == -1:
                if not self._check(AUTOMATON):
                    raise ValueError(f"interval syntax error at position {self.pos - 1}")
                raise ValueError(
                    "named automata are not supported (no AutomatonProvider), "
                    "matching RegExp.toAutomaton() without a provider"
                )
            if not self._check(INTERVAL):
                raise ValueError(f"illegal identifier at position {self.pos - 1}")
            if i == 0 or i == len(s) - 1 or i != s.rfind("-"):
                raise ValueError(f"interval syntax error at position {self.pos - 1}")
            smin, smax = s[:i], s[i + 1 :]
            try:
                imin, imax = int(smin), int(smax)
            except ValueError as e:
                raise ValueError(f"interval syntax error at position {self.pos - 1}") from e
            digits = len(smin) if len(smin) == len(smax) else 0
            if imin > imax:
                imin, imax = imax, imin
            return _decimal_interval_nfa(imin, imax, digits)
        predefined = self._match_predefined()
        if predefined is not None:
            return predefined
        return self._char(self.parse_char_exp())

    def parse_char_exp(self) -> int:
        self._match("\\")
        return ord(self._next())

    def _char(self, cp: int) -> _Nfa:
        return _ranges_nfa([(f, f) for f in self._ci_forms(cp)])

    def _string(self, s: str) -> _Nfa:
        if not self._check(ASCII_CASE_INSENSITIVE | CASE_INSENSITIVE):
            return _string_nfa(s)
        out = _empty_string_nfa()
        for ch in s:
            out = _concat_nfa(out, self._char(ord(ch)))
        return out


def compile_regexp(pattern: str, syntax_flags: int = ALL, match_flags: int = 0) -> Dfa:
    """Parse + compile a Lucene-syntax regexp to an anchored DFA matcher."""
    if (syntax_flags & ~DEPRECATED_COMPLEMENT) > ALL:
        raise ValueError("Illegal syntax flag")
    p = _Parser(pattern, syntax_flags | match_flags)
    nfa = p.parse_union()
    if p._more():
        raise ValueError(f"end-of-string expected at position {p.pos}")
    return _determinize(nfa)
