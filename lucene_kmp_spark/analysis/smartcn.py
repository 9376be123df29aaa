"""Chinese analysis — the smartcn HHMM machinery.

Semantics ported from the reference ``analysis/smartcn/``:

* ``cn/smart/Utility.kt`` — char typing (:96-117: HANZI 4E00-9FA5, LETTER,
  DIGIT, SPACE_LIKE, the two DELIMITER ranges, FULLWIDTH forms), the
  sentinel char arrays (未##串, 未##数, 始##始, 末##末), COMMON_DELIMITER
  ',', MAX_FREQUENCE = 2079997 + 80000.
* ``cn/smart/hhmm/HHMMSegmenter.kt`` — SegGraph construction (:26-135):
  per-char HANZI tokens + dictionary prefix extensions, letter/digit runs
  collapsed to the 未##串/未##数 sentinels, delimiters at MAX_FREQUENCE,
  SENTENCE_BEGIN/END sentinels.
* ``cn/smart/hhmm/BiSegGraph.kt`` — bigram edge weights (:54-60):
  ``-ln(smooth*(1+f1)/(MAX+0) + (1-smooth)*((1-t)*f12/(1+f1) + t))`` with
  smooth=0.1, t=1/MAX; shortest path by forward DP over token indexes
  (:getShortPath).
* ``cn/smart/hhmm/SegTokenFilter.kt`` — fullwidth folding, latin
  lowercasing, delimiter -> ','.
* ``cn/smart/WordSegmenter.kt`` — drop SENTENCE_BEGIN/END, restore the
  original surface for STRING/NUMBER tokens.
* ``cn/smart/SmartChineseAnalyzer.kt`` — chain: sentence split ->
  HHMM words -> porter stem (latin) -> stopword filter (the embedded
  punctuation stop set).

The word/bigram frequency tables (coredict/bigramdict) are caller-supplied
(the reference loads them from non-embedded .mem resources); a small demo
table ships for tests and oracle rows.
"""

from __future__ import annotations

import math
import unicodedata

from lucene_kmp_spark.analysis.en import porter_stem

MAX_FREQUENCE = 2079997 + 80000  # Utility.kt:27

STRING_SENTINEL = "未##串"
NUMBER_SENTINEL = "未##数"
START_SENTINEL = "始##始"
END_SENTINEL = "末##末"
COMMON_DELIMITER = ","

# char types (CharType.kt)
HANZI, LETTER, DIGIT, SPACE_LIKE, DELIMITER = "HANZI", "LETTER", "DIGIT", "SPACE", "DELIM"
FULLWIDTH_LETTER, FULLWIDTH_DIGIT, SURROGATE, OTHER = "FW_LETTER", "FW_DIGIT", "SURROGATE", "OTHER"

# word types (WordType.kt)
W_CHINESE, W_STRING, W_NUMBER, W_DELIMITER = "CHINESE_WORD", "STRING", "NUMBER", "DELIMITER"
W_FW_STRING, W_FW_NUMBER, W_BEGIN, W_END = "FULLWIDTH_STRING", "FULLWIDTH_NUMBER", "SENTENCE_BEGIN", "SENTENCE_END"

# SmartChineseAnalyzer.DEFAULT_STOPWORD_DATA — punctuation tokens
DEFAULT_STOP_WORDS = frozenset((
    ",", ".", "`", "-", "_", "=", "?", "'", "|", '"', "(", ")", "{", "}",
    "[", "]", "<", ">", "*", "#", "&", "^", "$", "@", "!", "~", ":", ";",
    "+", "/", "\\", "《", "》", "—", "－", "，", "。", "、", "：", "；",
    "！", "·", "？", "“", "”", "）", "（", "【", "】", "［", "］", "●",
))


def get_char_type(ch: str) -> str:
    """Utility.getCharType (:96-117)."""
    cp = ord(ch)
    if 0xD800 <= cp <= 0xDFFF:
        return SURROGATE
    if 0x4E00 <= cp <= 0x9FA5:
        return HANZI
    if (0x41 <= cp <= 0x5A) or (0x61 <= cp <= 0x7A):
        return LETTER
    if 0x30 <= cp <= 0x39:
        return DIGIT
    if ch in " \t\r\n　":
        return SPACE_LIKE
    if 0x0021 <= cp <= 0x00BB or 0x2010 <= cp <= 0x2642 or 0x3001 <= cp <= 0x301E:
        return DELIMITER
    if 0xFF21 <= cp <= 0xFF3A or 0xFF41 <= cp <= 0xFF5A:
        return FULLWIDTH_LETTER
    if 0xFF10 <= cp <= 0xFF19:
        return FULLWIDTH_DIGIT
    if 0xFE30 <= cp <= 0xFF63:
        return DELIMITER
    return OTHER


class SegToken:
    __slots__ = ("word", "start", "end", "word_type", "weight", "index")

    def __init__(self, word, start, end, word_type, weight):
        self.word = word
        self.start = start
        self.end = end
        self.word_type = word_type
        self.weight = weight
        self.index = -1


class ChineseDictionary:
    """coredict + bigramdict analog: word -> frequency, 'w1@w2' -> bigram
    frequency (BigramDictionary.WORD_SEGMENT_CHAR = '@')."""

    def __init__(self, word_freq: dict[str, int], bigram_freq: dict[str, int]):
        self.word_freq = dict(word_freq)
        self.bigram_freq = dict(bigram_freq)
        self._prefixes: set[str] = set()
        for w in self.word_freq:
            for i in range(1, len(w) + 1):
                self._prefixes.add(w[:i])

    def frequency(self, word: str) -> int:
        return self.word_freq.get(word, 0)

    def has_prefix(self, s: str) -> bool:
        return s in self._prefixes

    def bigram(self, w1: str, w2: str) -> int:
        return self.bigram_freq.get(w1 + "@" + w2, 0)


def _create_seg_graph(sentence: str, dictionary: ChineseDictionary):
    """HHMMSegmenter.createSegGraph (:18-135): tokens keyed by start
    offset."""
    by_start: dict[int, list[SegToken]] = {}

    def add(tok: SegToken):
        by_start.setdefault(tok.start, []).append(tok)

    n = len(sentence)
    char_types = [get_char_type(c) for c in sentence]
    i = 0
    while i < n:
        ct = char_types[i]
        if ct == SPACE_LIKE:
            i += 1
        elif ct == SURROGATE:
            j = i + 2 if i + 1 < n and 0xDC00 <= ord(sentence[i + 1]) <= 0xDFFF else i + 1
            add(SegToken(sentence[i:j], i, j, W_CHINESE, 0))
            i = j
        elif ct == HANZI:
            j = i + 1
            word = sentence[i]
            add(SegToken(word, i, j, W_CHINESE, dictionary.frequency(word)))
            while j <= n and dictionary.has_prefix(word):
                if word in dictionary.word_freq and len(word) > 1:
                    add(SegToken(word, i, j, W_CHINESE,
                                 dictionary.frequency(word)))
                while j < n and char_types[j] == SPACE_LIKE:
                    j += 1
                if j < n and char_types[j] == HANZI:
                    word = word + sentence[j]
                    j += 1
                else:
                    break
            i += 1
        elif ct in (FULLWIDTH_LETTER, LETTER):
            j = i + 1
            has_fw = ct == FULLWIDTH_LETTER
            while j < n and char_types[j] in (LETTER, FULLWIDTH_LETTER):
                has_fw |= char_types[j] == FULLWIDTH_LETTER
                j += 1
            add(SegToken(STRING_SENTINEL, i, j,
                         W_FW_STRING if has_fw else W_STRING,
                         dictionary.frequency(STRING_SENTINEL)))
            i = j
        elif ct in (FULLWIDTH_DIGIT, DIGIT):
            j = i + 1
            has_fw = ct == FULLWIDTH_DIGIT
            while j < n and char_types[j] in (DIGIT, FULLWIDTH_DIGIT):
                has_fw |= char_types[j] == FULLWIDTH_DIGIT
                j += 1
            add(SegToken(NUMBER_SENTINEL, i, j,
                         W_FW_NUMBER if has_fw else W_NUMBER,
                         dictionary.frequency(NUMBER_SENTINEL)))
            i = j
        elif ct == DELIMITER:
            add(SegToken(sentence[i], i, i + 1, W_DELIMITER, MAX_FREQUENCE))
            i += 1
        else:
            add(SegToken(STRING_SENTINEL, i, i + 1, W_STRING,
                         dictionary.frequency(STRING_SENTINEL)))
            i += 1

    add(SegToken(START_SENTINEL, -1, 0, W_BEGIN,
                 dictionary.frequency(START_SENTINEL)))
    add(SegToken(END_SENTINEL, n, n + 1, W_END,
                 dictionary.frequency(END_SENTINEL)))
    return by_start


def hhmm_segment(sentence: str, dictionary: ChineseDictionary) -> list[SegToken]:
    """HHMMSegmenter.process: SegGraph -> BiSegGraph -> shortest path."""
    by_start = _create_seg_graph(sentence, dictionary)
    # makeIndex: tokens indexed in start-offset order (SegGraph.kt:37-59)
    token_list: list[SegToken] = []
    for s in sorted(by_start):
        for t in by_start[s]:
            t.index = len(token_list)
            token_list.append(t)

    # BiSegGraph.generateBiSegGraph (:23-69)
    smooth = 0.1
    tiny = 1.0 / MAX_FREQUENCE
    edges_to: dict[int, list[tuple[int, float]]] = {}
    starts = sorted(by_start)
    max_start = starts[-1]
    for s in starts:
        for t1 in by_start[s]:
            f1 = float(t1.weight)
            nxt = t1.end
            next_tokens = None
            while nxt <= max_start:
                if nxt in by_start:
                    next_tokens = by_start[nxt]
                    break
                nxt += 1
            if next_tokens is None:
                continue
            for t2 in next_tokens:
                f12 = dictionary.bigram(t1.word, t2.word)
                weight = -math.log(
                    smooth * (1.0 + f1) / (MAX_FREQUENCE + 0.0)
                    + (1.0 - smooth) * ((1.0 - tiny) * f12 / (1.0 + f1) + tiny)
                )
                edges_to.setdefault(t2.index, []).append((t1.index, weight))

    # getShortPath: forward DP over token index order
    n_tokens = len(token_list)
    best = [0.0] + [float("inf")] * (n_tokens - 1)
    prev = [0] * n_tokens
    for cur in range(1, n_tokens):
        for frm, w in edges_to.get(cur, ()):
            if best[frm] + w < best[cur]:
                best[cur] = best[frm] + w
                prev[cur] = frm
    path = []
    cur = n_tokens - 1
    path.append(cur)
    while cur != 0:
        cur = prev[cur]
        path.append(cur)
    return [token_list[i] for i in reversed(path)]


def segment_sentence(sentence: str, dictionary: ChineseDictionary) -> list[SegToken]:
    """WordSegmenter.segmentSentence: drop sentinels, restore surfaces,
    apply SegTokenFilter."""
    toks = hhmm_segment(sentence, dictionary)
    out = []
    for t in toks[1:-1] if len(toks) > 2 else []:
        if t.word_type in (W_STRING, W_NUMBER, W_FW_STRING, W_FW_NUMBER):
            t.word = sentence[t.start : t.end]
        # SegTokenFilter
        if t.word_type in (W_FW_NUMBER, W_FW_STRING):
            t.word = "".join(
                chr(ord(c) - 0xFEE0) if ord(c) >= 0xFF10 else c for c in t.word)
            t.word = t.word.lower()
        elif t.word_type == W_STRING:
            t.word = t.word.lower()
        elif t.word_type == W_DELIMITER:
            t.word = COMMON_DELIMITER
        out.append(t)
    return out


# ---- JDK BreakIterator.getSentenceInstance(Locale.ROOT) sentence rules ----
# Ported from the JDK's SentenceBreakRules (sun/text/resources/
# BreakIteratorRules.java — the 1.2-era rule grammar the reference's
# jdkport RuleBasedBreakIterator executes via generated state tables).
# Forward rules implemented: paragraph separator; danda+spaces; period run +
# mandatory space + non-lowercase letter; period run + spaces + opening
# punctuation/sentence-start run + letter; terminator run + spaces
# (+ optional single PS). Closes DEVIATIONS ex-#29 (terminator-only split).
_TERM = frozenset("!?。！？")
_PERIOD = frozenset(".．")
_DANDA = frozenset("।॥")
_QUOTES = frozenset("\"'")
_IGNORE_CATS = frozenset(("Mn", "Me", "Cf"))
_SPACE_EXTRA = frozenset("\t\r\f\n ")
_PS = " "


def _sb_space(ch: str) -> bool:
    return ch in _SPACE_EXTRA or unicodedata.category(ch) == "Zs"


def _sb_ignore(ch: str) -> bool:
    return unicodedata.category(ch) in _IGNORE_CATS


def _sb_start_punct(ch: str) -> bool:
    return ch in _QUOTES or unicodedata.category(ch) in ("Ps", "Pi")


def _sb_end_punct(ch: str) -> bool:
    return ch in _QUOTES or unicodedata.category(ch) in ("Pe", "Pf")


def _sb_letter(ch: str) -> bool:
    return unicodedata.category(ch).startswith("L")


def _sb_sent_start(ch: str) -> bool:
    """<sent-start>: anything not a letter, space, start/end punctuation,
    digit, terminator, period, comma, PS, or ignorable."""
    if (_sb_letter(ch) or _sb_space(ch) or _sb_start_punct(ch)
            or _sb_end_punct(ch) or ch in _TERM or ch in _PERIOD
            or ch == "," or ch == _PS or _sb_ignore(ch)):
        return False
    return not unicodedata.category(ch).startswith("N")


def sentence_breaks(text: str) -> list[int]:
    """Break offsets (exclusive sentence ends) per the JDK default sentence
    rules; always ends with ``len(text)`` for non-empty text."""
    n = len(text)
    breaks: list[int] = []

    def skip(j: int, pred) -> int:
        while j < n and (pred(text[j]) or _sb_ignore(text[j])):
            j += 1
        return j

    i = 0
    while i < n:
        ch = text[i]
        if _sb_ignore(ch):
            i += 1
            continue
        if ch == _PS:
            if i + 1 < n:
                breaks.append(i + 1)
            i += 1
            continue
        if ch in _DANDA:
            j = skip(i + 1, _sb_space)
            if j < n:
                breaks.append(j)
            i = j if j > i else i + 1
            continue
        if ch in _TERM:
            # .*?<term>[<term><period><end>]*<space>*{PS}
            j = skip(i + 1, lambda c: c in _TERM or c in _PERIOD
                     or _sb_end_punct(c))
            j = skip(j, _sb_space)
            if j < n and text[j] == _PS:
                j += 1
            if j < n:
                breaks.append(j)
            i = j if j > i else i + 1
            continue
        if ch in _PERIOD:  # noqa: C901 — faithful rule port
            j = skip(i + 1, lambda c: c in _PERIOD or _sb_end_punct(c))
            k = skip(j, _sb_space)
            if k < n and _sb_letter(text[k]):
                # <period>...<space>+ / <notlc> — and two generated-DFA
                # behaviors verified against the live JDK oracle: >=2
                # whitespace breaks before ANY letter, and a quote ending
                # the period run (quotes are both start- and end-punct, so
                # both rule paths stay alive in the merged DFA state)
                # breaks before an immediately following letter
                if (k - j >= 2
                        or (k > j
                            and unicodedata.category(text[k]) != "Ll")
                        or (k == j and j > i + 1
                            and text[j - 1] in _QUOTES)):
                    breaks.append(k)
                    i = k
                    continue
            m = skip(k, lambda c: _sb_start_punct(c) or _sb_sent_start(c))
            if m > k and m < n and _sb_letter(text[m]):
                # <period>...<space>* / [start-punct|sent-start]+ <letter>
                breaks.append(k)
                i = k
                continue
            if m > k:
                if m == n:
                    # generated-DFA EOF backup (oracle-verified): when the
                    # rule-4 lookahead run hits EOF without a letter, the
                    # period runs shatter into single-char boundaries —
                    # every period run inside the consumed [i, j) span, and
                    # spreading BACKWARD through space/punct-separated
                    # period runs until a letter/digit/terminator
                    a = i
                    while a < j:
                        if text[a] in _PERIOD:
                            e = a
                            while e < j and text[e] in _PERIOD:
                                e += 1
                            breaks.extend(range(a, e + 1))
                            a = e
                        else:
                            a += 1
                    b = i - 1
                    while b >= 0:
                        c = text[b]
                        # spread crosses spaces and quote-like punctuation
                        # only — NOT generic sent-start chars like ':'
                        if (_sb_space(c) or _sb_start_punct(c)
                                or _sb_end_punct(c) or _sb_ignore(c)):
                            b -= 1
                            continue
                        if c in _PERIOD:
                            e = b + 1
                            while b > 0 and text[b - 1] in _PERIOD:
                                b -= 1
                            if b > 0 and (text[b - 1] in _TERM
                                          or text[b - 1] in _DANDA):
                                # this run was absorbed by a terminator
                                # match — already broken there, no shatter
                                break
                            breaks.extend(range(b, e + 1))
                            b -= 1
                            continue
                        break
                    i = n
                else:
                    # failed lookahead consumes the run (no re-scan of the
                    # danda/start-punct chars inside it — oracle-verified)
                    i = m
                continue
            i = j
            continue
        i += 1
    # the backward EOF spread can emit out-of-order / duplicate offsets;
    # offset 0 (start of text) is never a boundary
    return sorted(b for b in set(breaks) if b > 0)


def split_sentences(text: str):
    """Sentence pre-segmentation — the HMMChineseTokenizer's
    ``BreakIterator.getSentenceInstance(Locale.ROOT)`` role
    (HMMChineseTokenizer.kt), JDK default sentence rules."""
    start = 0
    for b in sentence_breaks(text):
        if b > start:
            yield start, text[start:b]
        start = b
    if start < len(text):
        yield start, text[start:]


def smart_chinese_analyzer(
    dictionary: "ChineseDictionary | None" = None,
    stop_words=DEFAULT_STOP_WORDS,
):
    """SmartChineseAnalyzer chain (SmartChineseAnalyzer.kt): sentences ->
    HHMM words -> porter stem (latin terms) -> stop filter. Returns
    ``text -> (terms, positions, length)``."""
    if dictionary is None:
        dictionary = demo_chinese_dictionary()
    stop = frozenset(stop_words)

    def run(text: str):
        if not text:
            return [], [], 0
        terms, positions = [], []
        pos = -1
        for _off, sentence in split_sentences(text):
            for t in segment_sentence(sentence, dictionary):
                pos += 1
                word = t.word
                if word and word.isascii() and word.isalpha():
                    word = porter_stem(word)
                if word in stop:
                    continue
                terms.append(word)
                positions.append(pos)
        return terms, positions, len(terms)

    return run


def demo_chinese_dictionary() -> ChineseDictionary:
    """Hand-authored demo frequency tables (common vocabulary, invented
    counts shaped like a real corpus — NOT extracted from the smartcn
    data files)."""
    wf = {
        "我": 50000, "是": 60000, "中": 40000, "国": 45000, "中国": 30000,
        "人": 42000, "中国人": 8000, "北": 15000, "京": 12000, "北京": 20000,
        "大": 30000, "学": 25000, "大学": 18000, "生": 22000, "学生": 15000,
        "大学生": 5000, "喜": 8000, "欢": 7000, "喜欢": 9000, "搜": 4000,
        "索": 3500, "搜索": 6000, "引": 5000, "擎": 800, "引擎": 3000,
        "数": 9000, "据": 7000, "数据": 8000, "库": 4000, "数据库": 3500,
        "天": 20000, "气": 15000, "天气": 9000, "很": 18000, "好": 25000,
        STRING_SENTINEL: 500, NUMBER_SENTINEL: 600,
        START_SENTINEL: 100000, END_SENTINEL: 100000,
    }
    bf = {
        "始##始@我": 6000, "我@是": 9000, "是@中国人": 1200,
        "中国@人": 900, "我@喜欢": 2500, "喜欢@北京": 700,
        "始##始@北京": 3000, "北京@大学": 1500, "大学@生": 300,
        "北京@大学生": 250, "大学生@末##末": 400, "中国人@末##末": 800,
        "搜索@引擎": 2200, "数据@库": 500, "数据库@末##末": 600,
        "天气@很": 1400, "很@好": 2600, "好@末##末": 1800,
    }
    return ChineseDictionary(wf, bf)
