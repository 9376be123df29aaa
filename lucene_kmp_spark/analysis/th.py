"""Thai analysis chain (``analysis/common/.../analysis/th/``).

* ``thai_tokenize`` — ``th/ThaiTokenizer.kt``: the reference segments Thai
  runs with the JDK's dictionary-based break iterator
  (``jdkport/DictionaryBasedBreakIterator.kt``) over the thai_dict trie.
  This implementation uses the same word list (decoded from the same trie,
  ``analysis/thai_words.py``) with the same longest-match-with-backtracking
  search: at each position try the longest dictionary word whose remainder
  can still be fully segmented; when no full segmentation exists, the
  words of the farthest-reaching path are emitted and the unknown span up
  to the next segmentable position becomes one token (the JDK "blesses"
  the farthest breaks the same way; boundary placement inside unknown
  spans can differ by one position — see DEVIATIONS.md). Non-Thai runs
  are tokenized by the UAX#29 StandardTokenizer, matching the rule-based
  layer of the JDK iterator.
* ``thai_analyzer`` — ``th/ThaiAnalyzer.kt`` chain:
  ThaiTokenizer -> LowerCaseFilter -> DecimalDigitFilter ->
  StopFilter(thai).
"""

from __future__ import annotations

from lucene_kmp_spark.analysis.ar import decimal_digit_fold
from lucene_kmp_spark.analysis.standard import (
    DEFAULT_MAX_TOKEN_LENGTH,
    _lower_simple,
    standard_tokenize,
)
from lucene_kmp_spark.analysis.thai_words import MAX_WORD_LEN, THAI_WORDS

THAI_STOP_WORDS = frozenset((
    "#", "#", "#", "#", "ไว้", "ไม่", "ไป", "ได้", "ให้", "ใน", "โดย",
    "แห่ง", "แล้ว", "และ", "แรก", "แบบ", "แต่", "เอง", "เห็น", "เลย",
    "เริ่ม", "เรา", "เมื่อ", "เพื่อ", "เพราะ", "เป็นการ", "เป็น",
    "เปิดเผย", "เปิด", "เนื่องจาก", "เดียวกัน", "เดียว", "เช่น", "เฉพาะ",
    "เคย", "เข้า", "เขา", "อีก", "อาจ", "อะไร", "ออก", "อย่าง", "อยู่",
    "อยาก", "หาก", "หลาย", "หลังจาก", "หลัง", "หรือ", "หนึ่ง", "ส่วน",
    "ส่ง", "สุด", "สําหรับ", "ว่า", "วัน", "ลง", "ร่วม", "ราย", "รับ",
    "ระหว่าง", "รวม", "ยัง", "มี", "มาก", "มา", "พร้อม", "พบ", "ผ่าน",
    "ผล", "บาง", "น่า", "นี้", "นํา", "นั้น", "นัก", "นอกจาก", "ทุก",
    "ที่สุด", "ที่", "ทําให้", "ทํา", "ทาง", "ทั้งนี้", "ทั้ง", "ถ้า",
    "ถูก", "ถึง", "ต้อง", "ต่างๆ", "ต่าง", "ต่อ", "ตาม", "ตั้งแต่", "ตั้ง",
    "ด้าน", "ด้วย", "ดัง", "ซึ่ง", "ช่วง", "จึง", "จาก", "จัด", "จะ",
    "คือ", "ความ", "ครั้ง", "คง", "ขึ้น", "ของ", "ขอ", "ขณะ", "ก่อน", "ก็",
    "การ", "กับ", "กัน", "กว่า", "กล่าว",
))



def _is_thai_letter(ch: str) -> bool:
    # Thai block letters/marks; Thai digits (U+0E50-59) go to the standard
    # rule-based layer like the JDK's word rules
    return "\u0e01" <= ch <= "\u0e5b" and not "\u0e50" <= ch <= "\u0e59"


def _segment_run(run: str) -> list[str]:
    """Dictionary segmentation of one Thai-letter run."""
    n = len(run)
    fail = set()          # start offsets proven unsegmentable to the end

    def dfs(i: int) -> list[int] | None:
        """Break positions fully covering run[i:], longest-first."""
        if i == n:
            return []
        if i in fail:
            return None
        limit = min(n - i, MAX_WORD_LEN)
        for length in range(limit, 0, -1):
            if run[i:i + length] in THAI_WORDS:
                rest = dfs(i + length)
                if rest is not None:
                    return [i + length] + rest
        fail.add(i)
        return None

    out = []
    i = 0
    while i < n:
        breaks = dfs(i)
        if breaks is not None:
            prev = i
            for b in breaks:
                out.append(run[prev:b])
                prev = b
            break
        # farthest-reaching partial path (longest-first order, like the
        # JDK's bestBreakPositions blessing)
        best_path: list[int] = []
        best_end = i

        def probe(j: int, path: list[int]):
            nonlocal best_path, best_end
            advanced = False
            limit = min(n - j, MAX_WORD_LEN)
            for length in range(limit, 0, -1):
                if run[j:j + length] in THAI_WORDS:
                    advanced = True
                    path.append(j + length)
                    probe(j + length, path)
                    path.pop()
            if not advanced and j > best_end:
                best_end = j
                best_path = list(path)

        probe(i, [])
        prev = i
        for b in best_path:
            out.append(run[prev:b])
            prev = b
        # unknown span: extend until a position where a word starts
        k = best_end
        j = k + 1
        while j < n and not any(
            run[j:j + length] in THAI_WORDS
            for length in range(min(n - j, MAX_WORD_LEN), 0, -1)
        ):
            j += 1
        out.append(run[k:j])
        i = j
    return [w for w in out if w]


def thai_tokenize(text: str, max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH):
    """Token list for mixed Thai / non-Thai text, in offset order."""
    tokens = []
    i, n = 0, len(text)
    buf_start = None
    for i in range(n + 1):
        is_thai = i < n and _is_thai_letter(text[i])
        if is_thai:
            if buf_start is None:
                buf_start = i
            continue
        if buf_start is not None:
            tokens.append(("thai", text[buf_start:i]))
            buf_start = None
        if i < n:
            if not tokens or tokens[-1][0] != "other":
                tokens.append(("other", text[i]))
            else:
                tokens[-1] = ("other", tokens[-1][1] + text[i])
    terms = []
    for kind, chunk in tokens:
        if kind == "thai":
            terms.extend(_segment_run(chunk))
        else:
            terms.extend(
                t.term for t in standard_tokenize(chunk, max_token_length))
    return terms


def thai_analyzer(stop_words=None,
                  max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH):
    """ThaiAnalyzer.createComponents (ThaiAnalyzer.kt:60-66)."""
    stop = THAI_STOP_WORDS if stop_words is None else frozenset(stop_words)

    def run(text: str):
        if not text:
            return [], [], 0
        terms, positions = [], []
        for pos, raw in enumerate(thai_tokenize(text, max_token_length)):
            term = decimal_digit_fold(_lower_simple(raw))
            if term in stop:
                continue
            terms.append(term)
            positions.append(pos)
        return terms, positions, len(terms)

    return run
