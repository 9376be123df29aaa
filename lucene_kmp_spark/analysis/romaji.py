"""Katakana → modified-Hepburn romanization.

Semantics of ``analysis/kuromoji/.../ja/dict/ToStringUtil.getRomanization``
(:201-535), re-expressed as RULES over the public Hepburn tables instead of
the reference's per-kana switch:

* base gojūon/dakuon/handakuon syllables (standard Hepburn);
* small-kana digraphs: an i-row kana + ャ/ュ/ョ/ェ drops its vowel and
  takes the y-glide (sha/cha/ja forms lose the 'y'); ク/グ + small vowels
  form kw/gw; フ/ヴ/ウ/テ/デ/ト/ド take their extended-katakana digraphs;
* long vowels: Cョ+ウ → Cyō, Cュ+ウ → Cyū, オ+ウ → ō; the prolonged
  sound mark ー is dropped (:535 — マージャン → majan);
* ッ geminates a following k/s/t/p row onset (else silent);
* ン → m before labials, n' before vowels/y, n otherwise.

Validated against the full 178-entry table plus the word goldens embedded
in the reference's TestToStringUtil (public Hepburn data, the same
conformance-table precedent as the ASCII-folding table).
"""

from __future__ import annotations

# gojūon + voiced + semi-voiced + extended rows (public Hepburn)
_BASE = {
    "ア": "a", "イ": "i", "ウ": "u", "エ": "e", "オ": "o",
    "カ": "ka", "キ": "ki", "ク": "ku", "ケ": "ke", "コ": "ko",
    "サ": "sa", "シ": "shi", "ス": "su", "セ": "se", "ソ": "so",
    "タ": "ta", "チ": "chi", "ツ": "tsu", "テ": "te", "ト": "to",
    "ナ": "na", "ニ": "ni", "ヌ": "nu", "ネ": "ne", "ノ": "no",
    "ハ": "ha", "ヒ": "hi", "フ": "fu", "ヘ": "he", "ホ": "ho",
    "マ": "ma", "ミ": "mi", "ム": "mu", "メ": "me", "モ": "mo",
    "ヤ": "ya", "ユ": "yu", "ヨ": "yo",
    "ラ": "ra", "リ": "ri", "ル": "ru", "レ": "re", "ロ": "ro",
    "ワ": "wa", "ヰ": "i", "ヱ": "e", "ヲ": "o",
    "ガ": "ga", "ギ": "gi", "グ": "gu", "ゲ": "ge", "ゴ": "go",
    "ザ": "za", "ジ": "ji", "ズ": "zu", "ゼ": "ze", "ゾ": "zo",
    "ダ": "da", "ヂ": "ji", "ヅ": "zu", "デ": "de", "ド": "do",
    "バ": "ba", "ビ": "bi", "ブ": "bu", "ベ": "be", "ボ": "bo",
    "パ": "pa", "ピ": "pi", "プ": "pu", "ペ": "pe", "ポ": "po",
    "ヴ": "v",  # ヴ alone = v; digraphs below give va/vi/vu/ve/vo
    "ヷ": "va", "ヸ": "vi", "ヹ": "ve", "ヺ": "vo",
    # small vowels standing alone
    "ァ": "a", "ィ": "i", "ゥ": "u", "ェ": "e", "ォ": "o",
}

_SMALL_VOWEL = {"ァ": "a", "ィ": "i", "ゥ": "u", "ェ": "e", "ォ": "o", "ヮ": "wa"}
_SMALL_Y = {"ャ": "ya", "ュ": "yu", "ョ": "yo"}

# i-row kana whose digraphs take the consonant onset + glide
_I_ROW = {"キ": "k", "シ": "sh", "チ": "ch", "ニ": "n", "ヒ": "h", "ミ": "m",
          "リ": "r", "ギ": "g", "ジ": "j", "ヂ": "j", "ビ": "b", "ピ": "p"}
# onsets whose glide absorbs the 'y' (sha, cha, ja — modified Hepburn)
_NO_Y = {"sh", "ch", "j"}

# u-row kana with w-digraphs (ToStringUtil ク/グ/ウ rows)
_W_ROW = {"ク": "k", "グ": "g"}
# kana with direct small-vowel digraphs (フォ -> fo, ヴァ -> va, ...)
_V_ROW = {"フ": "f", "ヴ": "v"}
# テ/デ + ィ -> ti/di, ュ -> tyu/dyu; ト/ド + ゥ -> tu/du
_T_ROWS = {"テ": "t", "デ": "d"}
_TU_ROWS = {"ト": "t", "ド": "d"}

_GEMINATES = {"カ": "k", "キ": "k", "ク": "k", "ケ": "k", "コ": "k",
              "サ": "s", "シ": "s", "ス": "s", "セ": "s", "ソ": "s",
              "タ": "t", "チ": "t", "ツ": "t", "テ": "t", "ト": "t",
              "パ": "p", "ピ": "p", "プ": "p", "ペ": "p", "ポ": "p"}

_LABIAL = set("バビブベボパピプペポマミムメモ")
_N_APOS = set("ヤユヨアイウエオ")

_MACRON = {"a": "ā", "i": "ī", "u": "ū", "e": "ē", "o": "ō"}

# o-row kana that fold a following ウ into ō (ToStringUtil: every o-row
# syllable has the `ch2 == 'ウ' -> "..ō"` case — コウ→kō, トウ→tō, ... —
# while u-row kana do NOT fold: クウ→kuu. ヲ is excluded.)
_O_MACRON_KANA = set("オコソトノホモヨロゴゾドボポ")


def _syllable(s: str, i: int) -> tuple[str, int]:
    """One romanized unit starting at i -> (romaji, chars consumed)."""
    ch = s[i]
    ch2 = s[i + 1] if i + 1 < len(s) else ""
    ch3 = s[i + 2] if i + 2 < len(s) else ""

    # handakuten-combining la/li/... rows (ラ゜ -> la, TestToStringUtil tail)
    if ch2 == "゜" and ch in "ラリルレロ":
        return "l" + _BASE[ch][1], 2

    if ch in _I_ROW:
        onset = _I_ROW[ch]
        if ch2 in _SMALL_Y:
            glide = _SMALL_Y[ch2]
            body = glide[1] if onset in _NO_Y else glide
            if ch3 == "ウ" and glide in ("yu", "yo"):
                return onset + body[:-1] + _MACRON[body[-1]], 3
            return onset + body, 2
        if ch2 == "ェ":
            return onset + ("e" if onset in _NO_Y else "ye"), 2
        return _BASE[ch], 1

    if ch in _W_ROW:
        if ch2 in _SMALL_VOWEL and ch2 != "ゥ":
            v = _SMALL_VOWEL[ch2]
            return _W_ROW[ch] + ("w" + v if v != "wa" else v), 2
        return _BASE[ch], 1

    if ch in _V_ROW:
        if ch2 == "ィ" and ch3 == "ェ":  # フィェ -> fye, ヴィェ -> vye
            return _V_ROW[ch] + "ye", 3
        if ch2 in _SMALL_VOWEL:
            return _V_ROW[ch] + _SMALL_VOWEL[ch2][-1], 2
        if ch2 in _SMALL_Y:  # フュ -> fyu, ヴュ -> vyu
            return _V_ROW[ch] + _SMALL_Y[ch2], 2
        return _BASE[ch], 1

    if ch in _T_ROWS:
        if ch2 == "ィ":
            return _T_ROWS[ch] + "i", 2
        if ch2 == "ュ":
            return _T_ROWS[ch] + "yu", 2
        return _BASE[ch], 1

    if ch in _TU_ROWS and ch2 == "ゥ":
        return _TU_ROWS[ch] + "u", 2

    if ch == "ウ":
        if ch2 in _SMALL_VOWEL and ch2 != "ゥ":
            v = _SMALL_VOWEL[ch2]
            return ("w" + v) if v != "wa" else v, 2
        if ch2 == "ゥ":
            return "wu", 2
        if ch2 == "ュ":
            return "wyu", 2
        return "u", 1

    if ch == "イ":
        if ch2 == "ィ":
            return "yi", 2
        if ch2 == "ェ":
            return "ye", 2
        return "i", 1

    if ch == "オ" and ch2 == "ウ":
        return "ō", 2

    if ch == "ツ":
        if ch2 in _SMALL_VOWEL and ch2 != "ゥ":  # ツァ -> tsa ...
            return "ts" + _SMALL_VOWEL[ch2][-1], 2
        if ch2 in _SMALL_Y:  # ツャ etc. (rare) -> tsya...
            return "ts" + _SMALL_Y[ch2], 2

    if ch in ("ス", "ズ") and ch2 == "ィ":  # スィ -> si, ズィ -> zi
        return ("s" if ch == "ス" else "z") + "i", 2

    if ch == "ホ" and ch2 == "ゥ":  # ホゥ -> hu
        return "hu", 2

    if ch in _BASE:
        return _BASE[ch], 1
    return ch, 1


def romanize(s: str) -> str:
    """ToStringUtil.getRomanization semantics over a katakana string."""
    out: list[str] = []
    i = 0
    n = len(s)
    while i < n:
        ch = s[i]
        if ch == "ー":
            i += 1  # prolonged mark dropped (:535)
            continue
        if ch == "ッ":
            nxt = s[i + 1] if i + 1 < n else ""
            g = _GEMINATES.get(nxt)
            if g:
                out.append(g)
            i += 1
            continue
        if ch == "ン":
            nxt = s[i + 1] if i + 1 < n else ""
            if nxt in _LABIAL:
                out.append("m")
            elif nxt in _N_APOS:
                out.append("n'")
            else:
                out.append("n")
            i += 1
            continue
        piece, used = _syllable(s, i)
        if (used == 1 and ch in _O_MACRON_KANA and i + 1 < n
                and s[i + 1] == "ウ"):
            piece = piece[:-1] + "ō"
            used = 2
        out.append(piece)
        i += used
    return "".join(out)


def japanese_reading_form(tokens, use_romaji: bool = False):
    """JapaneseReadingFormFilter: replace each term with its katakana
    reading (or its Hepburn romanization); terms without a reading pass
    through."""
    for t in tokens:
        reading = t.entry.reading
        if reading:
            t.surface = romanize(reading) if use_romaji else reading
    return tokens
