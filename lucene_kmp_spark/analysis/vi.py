"""Vietnamese analysis chain (``analysis/extra/.../analysis/vi/``).

* ``vietnamese_tokenize`` — ``vi/VietnameseTokenizer.kt``: lowercased
  letter/digit word runs, URL splitting (http/https runs tokenized
  per-segment), then greedy pairing of whitespace-adjacent words into
  bigram compound tokens (the word-compound analog).
* ``vietnamese_normalize`` — ``vi/VietnameseNormalizer.kt``: Vietnamese
  diacritic/tone fold to plain ASCII (đ -> d).
* chain (``vi/VietnameseAnalyzer.kt``): VietnameseTokenizer -> Stop ->
  VietnameseNormalization -> VietnameseStem (identity).
"""

from __future__ import annotations

import unicodedata

from lucene_kmp_spark.analysis.standard import DEFAULT_MAX_TOKEN_LENGTH




VIETNAMESE_STOP_WORDS = frozenset((
    "bị", "bởi", "cả", "các", "cái", "cần", "càng", "chỉ", "chiếc", "cho",
    "chứ", "chưa", "chuyện", "có", "có thể", "cứ", "của", "cùng", "cũng",
    "đã", "đang", "đây", "để", "đến nỗi", "đều", "điều", "do", "đó",
    "được", "dưới", "gì", "khi", "không", "là", "lại", "lên", "lúc", "mà",
    "mỗi", "một cách", "này", "nên", "nếu", "ngay", "nhiều", "như",
    "nhưng", "những", "nơi", "nữa", "phải", "qua", "ra", "rằng", "rằng",
    "rất", "rất", "rồi", "sau", "sẽ", "so", "sự", "tại", "theo", "thì",
    "trên", "trước", "từ", "từng", "và", "vẫn", "vào", "vậy", "vì", "việc",
    "với", "vừa",
))


def _vi_fold_char(c: str) -> str:
    if c in ("\u0111",):
        return "d"
    if c in ("\u0110",):
        return "D"
    if ord(c) < 128:
        return c
    decomp = unicodedata.normalize("NFD", c)
    base = "".join(ch for ch in decomp if unicodedata.category(ch) != "Mn")
    return base if len(base) == 1 else c


def vietnamese_normalize(term: str) -> str:
    return "".join(_vi_fold_char(c) for c in term)


def vietnamese_tokenize(text: str) -> list[str]:
    tokens = []       # (text, kind) kind: word|url
    i, n = 0, len(text)
    while i < n:
        low = text[i:i + 8].lower()
        if low.startswith("http://") or low.startswith("https://"):
            j = i
            while j < n and not text[j].isspace():
                j += 1
            k = i
            while k < j:
                while k < j and not text[k].isalnum():
                    k += 1
                s = k
                while k < j and text[k].isalnum():
                    k += 1
                if s < k:
                    tokens.append((text[s:k].lower(), "url", s, k))
            i = j
            continue
        c = text[i]
        if c.isalnum():
            s = i
            i += 1
            while i < n and text[i].isalnum():
                i += 1
            tokens.append((text[s:i].lower(), "word", s, i))
            continue
        i += 1
    # merge adjacent word pairs separated only by whitespace
    merged = []
    i = 0
    while i < len(tokens):
        t = tokens[i]
        if t[1] == "word" and i + 1 < len(tokens):
            nxt = tokens[i + 1]
            between = text[t[3]:nxt[2]]
            if nxt[1] == "word" and between and between.isspace():
                merged.append(t[0] + " " + nxt[0])
                i += 2
                continue
        merged.append(t[0])
        i += 1
    return merged


def vietnamese_analyzer(stop_words=None,
                        max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH):
    stop = VIETNAMESE_STOP_WORDS if stop_words is None else frozenset(stop_words)

    def run(text: str):
        if not text:
            return [], [], 0
        terms, positions = [], []
        for pos, raw in enumerate(vietnamese_tokenize(text)):
            if raw in stop:
                continue
            terms.append(vietnamese_normalize(raw))
            positions.append(pos)
        return terms, positions, len(terms)

    return run
