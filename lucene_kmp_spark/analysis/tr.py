"""Turkish analysis chain (``analysis/common/.../analysis/tr/``).

* ``turkish_lowercase`` — ``tr/TurkishLowerCaseFilter.kt``: Turkish dotted /
  dotless I handling (İ -> i, I -> ı, I+combining-dot -> i) then lowercase.
* ``apostrophe_strip`` — ``tr/ApostropheFilter.kt``: drop the first
  apostrophe (' or U+2019) and everything after it.
* ``turkish_snowball_stem`` — the Snowball turkish algorithm as shipped by
  the reference (generated ``snowball/ext/TurkishStemmer.kt``): vowel
  harmony checks, optional n/s/y-consonant and U-vowel suffix marking,
  nominal-verb suffix cascade, recursive ki-chain, noun suffix cascade,
  then the postlude (reserved "ad"/"soyad" guard, harmony-vowel append
  after d/g, final consonant devoicing b/c/d/ğ -> p/ç/t/k). Words with
  fewer than two vowels are not stemmed. Matching is longest-first within
  each among table; deletions persist across cursor restores, exactly as
  in the snowball runtime.
* ``turkish_analyzer`` — ``tr/TurkishAnalyzer.kt:47-56`` chain:
  StandardTokenizer -> ApostropheFilter -> TurkishLowerCaseFilter ->
  StopFilter(turkish) -> [SetKeywordMarkerFilter] -> SnowballFilter.
"""

from __future__ import annotations

from lucene_kmp_spark.analysis.standard import (
    DEFAULT_MAX_TOKEN_LENGTH,
    standard_tokenize,
)

TURKISH_STOP_WORDS = frozenset((
    "#", "#", "#", "acaba", "altmış", "altı", "ama", "ancak", "arada",
    "aslında", "ayrıca", "bana", "bazı", "belki", "ben", "benden", "beni",
    "benim", "beri", "beş", "bile", "bin", "bir", "birçok", "biri",
    "birkaç", "birkez", "birşey", "birşeyi", "biz", "bize", "bizden",
    "bizi", "bizim", "böyle", "böylece", "bu", "buna", "bunda", "bundan",
    "bunlar", "bunları", "bunların", "bunu", "bunun", "burada", "çok",
    "çünkü", "da", "daha", "dahi", "de", "defa", "değil", "diğer", "diye",
    "doksan", "dokuz", "dolayı", "dolayısıyla", "dört", "edecek", "eden",
    "ederek", "edilecek", "ediliyor", "edilmesi", "ediyor", "eğer", "elli",
    "en", "etmesi", "etti", "ettiği", "ettiğini", "gibi", "göre", "halen",
    "hangi", "hatta", "hem", "henüz", "hep", "hepsi", "her", "herhangi",
    "herkesin", "hiç", "hiçbir", "için", "iki", "ile", "ilgili", "ise",
    "işte", "itibaren", "itibariyle", "kadar", "karşın", "katrilyon",
    "kendi", "kendilerine", "kendini", "kendisi", "kendisine", "kendisini",
    "kez", "ki", "kim", "kimden", "kime", "kimi", "kimse", "kırk",
    "milyar", "milyon", "mu", "mü", "mı", "nasıl", "ne", "neden",
    "nedenle", "nerde", "nerede", "nereye", "niye", "niçin", "o", "olan",
    "olarak", "oldu", "olduğu", "olduğunu", "olduklarını", "olmadı",
    "olmadığı", "olmak", "olması", "olmayan", "olmaz", "olsa", "olsun",
    "olup", "olur", "olursa", "oluyor", "on", "ona", "ondan", "onlar",
    "onlardan", "onları", "onların", "onu", "onun", "otuz", "oysa", "öyle",
    "pek", "rağmen", "sadece", "sanki", "sekiz", "seksen", "sen", "senden",
    "seni", "senin", "siz", "sizden", "sizi", "sizin", "şey", "şeyden",
    "şeyi", "şeyler", "şöyle", "şu", "şuna", "şunda", "şundan", "şunları",
    "şunu", "tarafından", "trilyon", "tüm", "üç", "üzere", "var", "vardı",
    "ve", "veya", "ya", "yani", "yapacak", "yapılan", "yapılması",
    "yapıyor", "yapmak", "yaptı", "yaptığı", "yaptığını", "yaptıkları",
    "yedi", "yerine", "yetmiş", "yine", "yirmi", "yoksa", "yüz", "zaten",
))


_TR_V = frozenset("aeiou\u00f6\u00fc\u0131")
_TR_U = frozenset("iu\u00fc\u0131")
_TR_HARMONY = {
    "a": frozenset("aou\u0131"), "e": frozenset("ei\u00f6\u00fc"),
    "\u0131": frozenset("a\u0131"), "i": frozenset("ei"),
    "o": frozenset("ou"), "u": frozenset("ou"),
    "\u00f6": frozenset("\u00f6\u00fc"),
    "\u00fc": frozenset("\u00f6\u00fc"),
}

_POSSESSIVES = ("miz", "niz", "muz", "nuz", "m\u00fcz", "n\u00fcz",
                "m\u0131z", "n\u0131z", "m", "n")
_LARI = ("leri", "lar\u0131")
_NU = ("ni", "nu", "n\u00fc", "n\u0131")
_NUN = ("in", "un", "\u00fcn", "\u0131n")
_YA = ("a", "e")
_NA = ("na", "ne")
_DA = ("da", "ta", "de", "te")
_NDA = ("nda", "nde")
_DAN = ("dan", "tan", "den", "ten")
_NDAN = ("ndan", "nden")
_YLA = ("la", "le")
_NCA = ("ca", "ce")
_YUM = ("im", "um", "\u00fcm", "\u0131m")
_SUN = ("sin", "sun", "s\u00fcn", "s\u0131n")
_YUZ = ("iz", "uz", "\u00fcz", "\u0131z")
_SUNUZ = ("siniz", "sunuz", "s\u00fcn\u00fcz", "s\u0131n\u0131z")
_LAR = ("lar", "ler")
_NUZ = ("niz", "nuz", "n\u00fcz", "n\u0131z")
_DUR = ("dir", "tir", "dur", "tur", "d\u00fcr", "t\u00fcr",
        "d\u0131r", "t\u0131r")
_CASINA = ("cas\u0131na", "cesine")
_YDU = ("dik", "tik", "duk", "tuk", "d\u00fck", "t\u00fck", "d\u0131k",
        "t\u0131k", "dim", "tim", "dum", "tum", "d\u00fcm", "t\u00fcm",
        "d\u0131m", "t\u0131m", "din", "tin", "dun", "tun", "d\u00fcn",
        "t\u00fcn", "d\u0131n", "t\u0131n", "di", "ti", "du", "tu",
        "d\u00fc", "t\u00fc", "d\u0131", "t\u0131")
_YSA = ("sak", "sek", "sam", "sem", "san", "sen", "sa", "se")
_YMUS = ("mi\u015f", "mu\u015f", "m\u00fc\u015f", "m\u0131\u015f")
_DEVOICE = {"b": "p", "c": "\u00e7", "d": "t", "\u011f": "k"}


def _among(w: str, pos: int, table) -> int | None:
    best = None
    head = w[:pos]
    for s in table:
        if (best is None or len(s) > len(best)) and head.endswith(s):
            best = s
    return pos - len(best) if best else None


def _harmony(w: str, pos: int) -> bool:
    """check_vowel_harmony: the last vowel before ``pos`` must have an
    earlier character from its harmony group."""
    j = pos - 1
    while j >= 0 and w[j] not in _TR_V:
        j -= 1
    if j < 0:
        return False
    group = _TR_HARMONY[w[j]]
    return any(c in group for c in w[:j])


def _opt_cons(w: str, pos: int, ch: str) -> int | None:
    """mark_suffix_with_optional_{n,s,y}_consonant."""
    if pos >= 1 and w[pos - 1] == ch:
        if pos >= 2 and w[pos - 2] in _TR_V:
            return pos - 1
        return None
    if pos >= 2 and w[pos - 2] in _TR_V:
        return pos
    return None


def _opt_U(w: str, pos: int) -> int | None:
    """mark_suffix_with_optional_U_vowel."""
    if pos >= 1 and w[pos - 1] in _TR_U:
        if pos >= 2 and w[pos - 2] not in _TR_V:
            return pos - 1
        return None
    if pos >= 2 and w[pos - 2] not in _TR_V:
        return pos
    return None


def _mk_possessives(w, pos):
    p = _among(w, pos, _POSSESSIVES)
    return _opt_U(w, p) if p is not None else None


def _mk_sU(w, pos):
    if not _harmony(w, pos):
        return None
    if pos >= 1 and w[pos - 1] in _TR_U:
        return _opt_cons(w, pos - 1, "s")
    return None


def _mk_lArI(w, pos):
    return _among(w, pos, _LARI)


def _mk_yU(w, pos):
    if not _harmony(w, pos):
        return None
    if pos >= 1 and w[pos - 1] in _TR_U:
        return _opt_cons(w, pos - 1, "y")
    return None


def _harmony_among(w, pos, table):
    if not _harmony(w, pos):
        return None
    return _among(w, pos, table)


def _harmony_among_opt(w, pos, table, ch):
    p = _harmony_among(w, pos, table)
    return _opt_cons(w, p, ch) if p is not None else None


def _mk_nU(w, pos):
    return _harmony_among(w, pos, _NU)


def _mk_nUn(w, pos):
    return _harmony_among_opt(w, pos, _NUN, "n")


def _mk_yA(w, pos):
    return _harmony_among_opt(w, pos, _YA, "y")


def _mk_nA(w, pos):
    return _harmony_among(w, pos, _NA)


def _mk_DA(w, pos):
    return _harmony_among(w, pos, _DA)


def _mk_ndA(w, pos):
    return _harmony_among(w, pos, _NDA)


def _mk_DAn(w, pos):
    return _harmony_among(w, pos, _DAN)


def _mk_ndAn(w, pos):
    return _harmony_among(w, pos, _NDAN)


def _mk_ylA(w, pos):
    return _harmony_among_opt(w, pos, _YLA, "y")


def _mk_ki(w, pos):
    return pos - 2 if w[:pos].endswith("ki") else None


def _mk_ncA(w, pos):
    return _harmony_among_opt(w, pos, _NCA, "n")


def _mk_yUm(w, pos):
    return _harmony_among_opt(w, pos, _YUM, "y")


def _mk_sUn(w, pos):
    return _harmony_among(w, pos, _SUN)


def _mk_yUz(w, pos):
    return _harmony_among_opt(w, pos, _YUZ, "y")


def _mk_sUnUz(w, pos):
    return _among(w, pos, _SUNUZ)


def _mk_lAr(w, pos):
    return _harmony_among(w, pos, _LAR)


def _mk_nUz(w, pos):
    return _harmony_among(w, pos, _NUZ)


def _mk_DUr(w, pos):
    return _harmony_among(w, pos, _DUR)


def _mk_cAsInA(w, pos):
    return _among(w, pos, _CASINA)


def _mk_yDU(w, pos):
    return _harmony_among_opt(w, pos, _YDU, "y")


def _mk_ysA(w, pos):
    p = _among(w, pos, _YSA)
    return _opt_cons(w, p, "y") if p is not None else None


def _mk_ymUs(w, pos):
    return _harmony_among_opt(w, pos, _YMUS, "y")


def _mk_yken(w, pos):
    if w[:pos].endswith("ken"):
        return _opt_cons(w, pos - 3, "y")
    return None


def _nominal_verb(w: str) -> tuple[str, bool]:
    """stem_nominal_verb_suffixes; returns (word, continue_flag)."""
    pos = len(w)
    # A: ymUs | yDU | ysA | yken
    for mk in (_mk_ymUs, _mk_yDU, _mk_ysA, _mk_yken):
        p = mk(w, pos)
        if p is not None:
            return w[:p], True
    # B: cAsInA (sUnUz|lAr|yUm|sUn|yUz)? ymUs
    p = _mk_cAsInA(w, pos)
    if p is not None:
        base = p
        for mk in (_mk_sUnUz, _mk_lAr, _mk_yUm, _mk_sUn, _mk_yUz):
            q = mk(w, p)
            if q is not None:
                base = q
                break
        p3 = _mk_ymUs(w, base)
        if p3 is not None:
            return w[:p3], True
    # C: lAr [delete] then (DUr|yDU|ysA|ymUs)? [delete]; stop noun stemming
    p = _mk_lAr(w, pos)
    if p is not None:
        w = w[:p]
        for mk in (_mk_DUr, _mk_yDU, _mk_ysA, _mk_ymUs):
            q = mk(w, len(w))
            if q is not None:
                w = w[:q]
                break
        return w, False
    # D: nUz (yDU|ysA)
    p = _mk_nUz(w, pos)
    if p is not None:
        for mk in (_mk_yDU, _mk_ysA):
            q = mk(w, p)
            if q is not None:
                return w[:q], True
    # E: (sUnUz|yUz|sUn|yUm) [delete] then ymUs? [delete]
    for mk in (_mk_sUnUz, _mk_yUz, _mk_sUn, _mk_yUm):
        p = mk(w, pos)
        if p is not None:
            w = w[:p]
            q = _mk_ymUs(w, len(w))
            if q is not None:
                w = w[:q]
            return w, True
    # F: DUr [delete] then ((sUnUz|lAr|yUm|sUn|yUz)? ymUs)? [delete]
    p = _mk_DUr(w, pos)
    if p is not None:
        w = w[:p]
        base = len(w)
        for mk in (_mk_sUnUz, _mk_lAr, _mk_yUm, _mk_sUn, _mk_yUz):
            q = mk(w, base)
            if q is not None:
                base = q
                break
        p3 = _mk_ymUs(w, base)
        if p3 is not None:
            w = w[:p3]
        return w, True
    return w, True


def _chain_ki(p: str) -> tuple[str, bool]:
    """stem_suffix_chain_before_ki over a prefix ending at the current
    cursor; deletions inside the prefix persist even when a nested chain
    fails (snowball cursor restores never undo slices)."""
    pos = len(p) - 2 if p.endswith("ki") else None
    if pos is None:
        return p, False
    # branch 1: DA(ki)
    q = _mk_DA(p, pos)
    if q is not None:
        p = p[:q]
        r = _mk_lAr(p, len(p))
        if r is not None:
            p = p[:r]
            p2, ok = _chain_ki(p)
            if ok:
                p = p2
        else:
            r = _mk_possessives(p, len(p))
            if r is not None:
                p = p[:r]
                s = _mk_lAr(p, len(p))
                if s is not None:
                    p = p[:s]
                    p2, ok = _chain_ki(p)
                    if ok:
                        p = p2
        return p, True
    # branch 2: nUn(ki)
    q = _mk_nUn(p, pos)
    if q is not None:
        p = p[:q]
        r = _mk_lArI(p, len(p))
        if r is not None:
            return p[:r], True
        for mk in (_mk_possessives, _mk_sU):
            r = mk(p, len(p))
            if r is not None:
                p = p[:r]
                s = _mk_lAr(p, len(p))
                if s is not None:
                    p = p[:s]
                    p2, ok = _chain_ki(p)
                    if ok:
                        p = p2
                return p, True
        p2, ok = _chain_ki(p)
        if ok:
            p = p2
        return p, True
    # branch 3: ndA(ki)
    q = _mk_ndA(p, pos)
    if q is None:
        return p, False
    r = _mk_lArI(p, q)
    if r is not None:
        return p[:r], True
    r = _mk_sU(p, q)
    if r is not None:
        p = p[:r]
        s = _mk_lAr(p, len(p))
        if s is not None:
            p = p[:s]
            p2, ok = _chain_ki(p)
            if ok:
                p = p2
        return p, True
    p2, ok = _chain_ki(p[:q])
    if not ok:
        return p, False
    return p2 + p[q:], True


def _noun_suffixes(w: str) -> str:
    pos = len(w)
    # 1: lAr [delete] chain?
    p = _mk_lAr(w, pos)
    if p is not None:
        w = w[:p]
        w2, ok = _chain_ki(w)
        return w2 if ok else w
    # 2: ncA [delete] then (lArI | (poss|sU)(lAr chain)? | lAr chain)?
    p = _mk_ncA(w, pos)
    if p is not None:
        w = w[:p]
        r = _mk_lArI(w, len(w))
        if r is not None:
            return w[:r]
        for mk in (_mk_possessives, _mk_sU):
            r = mk(w, len(w))
            if r is not None:
                w = w[:r]
                s = _mk_lAr(w, len(w))
                if s is not None:
                    w = w[:s]
                    w2, ok = _chain_ki(w)
                    if ok:
                        w = w2
                return w
        s = _mk_lAr(w, len(w))
        if s is not None:
            w = w[:s]
            w2, ok = _chain_ki(w)
            if ok:
                w = w2
        return w
    # 3: (ndA|nA) then REQUIRED (lArI | sU... | chain)
    for mk in (_mk_ndA, _mk_nA):
        p = mk(w, pos)
        if p is not None:
            r = _mk_lArI(w, p)
            if r is not None:
                return w[:r]
            r = _mk_sU(w, p)
            if r is not None:
                w = w[:r]
                s = _mk_lAr(w, len(w))
                if s is not None:
                    w = w[:s]
                    w2, ok = _chain_ki(w)
                    if ok:
                        w = w2
                return w
            p2, ok = _chain_ki(w[:p])
            if ok:
                return p2 + w[p:]
            break
    # 4: (ndAn|nU) then REQUIRED (sU... | lArI (match only, port quirk))
    for mk in (_mk_ndAn, _mk_nU):
        p = mk(w, pos)
        if p is not None:
            r = _mk_sU(w, p)
            if r is not None:
                w = w[:r]
                s = _mk_lAr(w, len(w))
                if s is not None:
                    w = w[:s]
                    w2, ok = _chain_ki(w)
                    if ok:
                        w = w2
                return w
            if _mk_lArI(w, p) is not None:
                # the reference port matches lArI here without slicing
                return w
            break
    # 5: DAn [delete] then (poss... | lAr chain? | chain)?
    p = _mk_DAn(w, pos)
    if p is not None:
        w = w[:p]
        r = _mk_possessives(w, len(w))
        if r is not None:
            w = w[:r]
            s = _mk_lAr(w, len(w))
            if s is not None:
                w = w[:s]
                w2, ok = _chain_ki(w)
                if ok:
                    w = w2
            return w
        r = _mk_lAr(w, len(w))
        if r is not None:
            w = w[:r]
            w2, ok = _chain_ki(w)
            return w2 if ok else w
        w2, ok = _chain_ki(w)
        return w2 if ok else w
    # 6: (nUn|ylA) [delete] then (lAr+chain | (poss|sU)... | chain)?
    for mk in (_mk_nUn, _mk_ylA):
        p = mk(w, pos)
        if p is not None:
            w = w[:p]
            r = _mk_lAr(w, len(w))
            handled = False
            if r is not None:
                w = w[:r]
                w2, ok = _chain_ki(w)
                if ok:
                    return w2
                # lAr deleted; chain failed: fall to the next alternative
            for mk2 in (_mk_possessives, _mk_sU):
                r = mk2(w, len(w))
                if r is not None:
                    w = w[:r]
                    s = _mk_lAr(w, len(w))
                    if s is not None:
                        w = w[:s]
                        w2, ok = _chain_ki(w)
                        if ok:
                            w = w2
                    handled = True
                    break
            if not handled:
                w2, ok = _chain_ki(w)
                if ok:
                    w = w2
            return w
    # 7: lArI [delete]
    p = _mk_lArI(w, pos)
    if p is not None:
        return w[:p]
    # 8: chain
    w2, ok = _chain_ki(w)
    if ok:
        return w2
    # 9: (DA|yU|yA) [delete] then ((poss [lAr?] | lAr) [delete] chain)?
    for mk in (_mk_DA, _mk_yU, _mk_yA):
        p = mk(w, pos)
        if p is not None:
            w = w[:p]
            r = _mk_possessives(w, len(w))
            if r is not None:
                s = _mk_lAr(w, r)
                cut = s if s is not None else r
                w = w[:cut]
                w2, ok = _chain_ki(w)
                if ok:
                    w = w2
                return w
            r = _mk_lAr(w, len(w))
            if r is not None:
                w = w[:r]
                w2, ok = _chain_ki(w)
                if ok:
                    w = w2
            return w
    # 10: (poss|sU) [delete] (lAr [delete] chain)?
    for mk in (_mk_possessives, _mk_sU):
        p = mk(w, pos)
        if p is not None:
            w = w[:p]
            s = _mk_lAr(w, len(w))
            if s is not None:
                w = w[:s]
                w2, ok = _chain_ki(w)
                if ok:
                    w = w2
            return w
    return w


def _postlude(w: str) -> str:
    if w in ("ad", "soyad"):
        return w
    # append harmony vowel after final d/g
    if w.endswith(("d", "g")):
        j = len(w) - 2
        while j >= 0 and w[j] not in _TR_V:
            j -= 1
        if j >= 0:
            v = w[j]
            if v in "a\u0131":
                w += "\u0131"
            elif v in "ei":
                w += "i"
            elif v in "ou":
                w += "u"
            elif v in "\u00f6\u00fc":
                w += "\u00fc"
    # devoice the final consonant
    if w and w[-1] in _DEVOICE:
        w = w[:-1] + _DEVOICE[w[-1]]
    return w


def turkish_snowball_stem(word: str) -> str:
    if sum(1 for c in word if c in _TR_V) < 2:
        return word
    w, cont = _nominal_verb(word)
    if not cont:
        return w
    w = _noun_suffixes(w)
    return _postlude(w)


def apostrophe_strip(term: str) -> str:
    """ApostropheFilter (ApostropheFilter.kt:36-45)."""
    for i, ch in enumerate(term):
        if ch in ("'", "\u2019"):
            return term[:i]
    return term


def turkish_lowercase(term: str) -> str:
    """TurkishLowerCaseFilter (TurkishLowerCaseFilter.kt:47-90)."""
    out = []
    skip_dot = False
    for i, ch in enumerate(term):
        if skip_dot and ch == "\u0307":
            skip_dot = False
            continue
        if ch == "İ":
            # Java's simple mapping: İ -> i (python's .lower() would add a
            # combining dot above)
            out.append("i")
            continue
        if ch == "I":
            rest = term[i + 1:]
            j = 0
            before_dot = False
            while j < len(rest):
                import unicodedata
                if unicodedata.category(rest[j]) != "Mn":
                    break
                if rest[j] == "\u0307":
                    before_dot = True
                    break
                j += 1
            if before_dot:
                out.append("i")
                skip_dot = True
            else:
                out.append("\u0131")
            continue
        out.append(ch.lower())
    return "".join(out)


def turkish_analyzer(stop_words=None, stem_exclusions=(),
                     max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH):
    """TurkishAnalyzer.createComponents (TurkishAnalyzer.kt:47-56)."""
    stop = TURKISH_STOP_WORDS if stop_words is None else frozenset(stop_words)
    excl = frozenset(stem_exclusions)

    def run(text: str):
        if not text:
            return [], [], 0
        terms, positions = [], []
        for t in standard_tokenize(text, max_token_length):
            term = turkish_lowercase(apostrophe_strip(t.term))
            if not term or term in stop:
                continue
            if term not in excl:
                term = turkish_snowball_stem(term)
            terms.append(term)
            positions.append(t.position)
        return terms, positions, len(terms)

    return run
