"""Greek analysis chain (``analysis/common/.../analysis/el/``).

* ``greek_lowercase`` — ``el/GreekLowerCaseFilter.kt``: lowercase with
  final-sigma standardization (ς -> σ) and tonos/dialytika diacritic
  removal for the accented vowels.
* ``greek_stem`` — ``el/GreekStemmer.kt``: the Ntais stemmer ("Development
  of a Stemmer for the Greek Language", with the Saroukos improvements):
  twenty "short" rules with exception lists, the rule-21 long suffix table
  applied only when nothing else fired, and the comparative rule 22.
  Operator-precedence quirks of the reference (the bare ``||`` arms in
  rules 0/8 that bypass the length guard) are preserved bit-for-bit.
* ``greek_analyzer`` — ``el/GreekAnalyzer.kt:66-72`` chain:
  StandardTokenizer -> GreekLowerCaseFilter -> StopFilter(greek) ->
  GreekStemFilter.
"""

from __future__ import annotations

from lucene_kmp_spark.analysis.standard import (
    DEFAULT_MAX_TOKEN_LENGTH,
    standard_tokenize,
)

GREEK_STOP_WORDS = frozenset((
    "#", "#", "#", "ο", "η", "το", "οι", "τα", "του", "τησ", "των", "τον",
    "την", "και", "κι", "κ", "ειμαι", "εισαι", "ειναι", "ειμαστε", "ειστε",
    "στο", "στον", "στη", "στην", "μα", "αλλα", "απο", "για", "προσ", "με",
    "σε", "ωσ", "παρα", "αντι", "κατα", "μετα", "θα", "να", "δε", "δεν",
    "μη", "μην", "επι", "ενω", "εαν", "αν", "τοτε", "που", "πωσ", "ποιοσ",
    "ποια", "ποιο", "ποιοι", "ποιεσ", "ποιων", "ποιουσ", "αυτοσ", "αυτη",
    "αυτο", "αυτοι", "αυτων", "αυτουσ", "αυτεσ", "αυτα", "εκεινοσ",
    "εκεινη", "εκεινο", "εκεινοι", "εκεινεσ", "εκεινα", "εκεινων",
    "εκεινουσ", "οπωσ", "ομωσ", "ισωσ", "οσο", "οτι",
))


_EL_EXC4 = frozenset((
    "θ", "δ", "ελ", "γαλ", "ν", "π", "ιδ", "παρ",
))

_EL_EXC6 = frozenset((
    "αλ", "αδ", "ενδ", "αμαν", "αμμοχαλ", "ηθ", "ανηθ", "αντιδ", "φυσ",
    "βρωμ", "γερ", "εξωδ", "καλπ", "καλλιν", "καταδ", "μουλ", "μπαν",
    "μπαγιατ", "μπολ", "μποσ", "νιτ", "ξικ", "συνομηλ", "πετσ", "πιτσ",
    "πικαντ", "πλιατσ", "ποστελν", "πρωτοδ", "σερτ", "συναδ", "τσαμ",
    "υποδ", "φιλον", "φυλοδ", "χασ",
))

_EL_EXC7 = frozenset((
    "αναπ", "αποθ", "αποκ", "αποστ", "βουβ", "ξεθ", "ουλ", "πεθ", "πικρ",
    "ποτ", "σιχ", "χ",
))

_EL_EXC8A = frozenset((
    "τρ", "τσ",
))

_EL_EXC8B = frozenset((
    "βετερ", "βουλκ", "βραχμ", "γ", "δραδουμ", "θ", "καλπουζ", "καστελ",
    "κορμορ", "λαοπλ", "μωαμεθ", "μ", "μουσουλμ", "ν", "ουλ", "π", "πελεκ",
    "πλ", "πολισ", "πορτολ", "σαρακατσ", "σουλτ", "τσαρλατ", "ορφ",
    "τσιγγ", "τσοπ", "φωτοστεφ", "χ", "ψυχοπλ", "αγ", "ορφ", "γαλ", "γερ",
    "δεκ", "διπλ", "αμερικαν", "ουρ", "πιθ", "πουριτ", "σ", "ζωντ", "ικ",
    "καστ", "κοπ", "λιχ", "λουθηρ", "μαιντ", "μελ", "σιγ", "σπ", "στεγ",
    "τραγ", "τσαγ", "φ", "ερ", "αδαπ", "αθιγγ", "αμηχ", "ανικ", "ανοργ",
    "απηγ", "απιθ", "ατσιγγ", "βασ", "βασκ", "βαθυγαλ", "βιομηχ", "βραχυκ",
    "διατ", "διαφ", "ενοργ", "θυσ", "καπνοβιομηχ", "καταγαλ", "κλιβ",
    "κοιλαρφ", "λιβ", "μεγλοβιομηχ", "μικροβιομηχ", "νταβ", "ξηροκλιβ",
    "ολιγοδαμ", "ολογαλ", "πενταρφ", "περηφ", "περιτρ", "πλατ", "πολυδαπ",
    "πολυμηχ", "στεφ", "ταβ", "τετ", "υπερηφ", "υποκοπ", "χαμηλοδαπ",
    "ψηλοταβ",
))

_EL_EXC9 = frozenset((
    "αβαρ", "βεν", "εναρ", "αβρ", "αδ", "αθ", "αν", "απλ", "βαρον", "ντρ",
    "σκ", "κοπ", "μπορ", "νιφ", "παγ", "παρακαλ", "σερπ", "σκελ", "συρφ",
    "τοκ", "υ", "δ", "εμ", "θαρρ", "θ",
))

_EL_EXC12A = frozenset((
    "π", "απ", "συμπ", "ασυμπ", "ακαταπ", "αμεταμφ",
))

_EL_EXC12B = frozenset((
    "αλ", "αρ", "εκτελ", "ζ", "μ", "ξ", "παρακαλ", "αρ", "προ", "νισ",
))

_EL_EXC13 = frozenset((
    "διαθ", "θ", "παρακαταθ", "προσθ", "συνθ",
))

_EL_EXC14 = frozenset((
    "φαρμακ", "χαδ", "αγκ", "αναρρ", "βρομ", "εκλιπ", "λαμπιδ", "λεχ", "μ",
    "πατ", "ρ", "λ", "μεδ", "μεσαζ", "υποτειν", "αμ", "αιθ", "ανηκ",
    "δεσποζ", "ενδιαφερ", "δε", "δευτερευ", "καθαρευ", "πλε", "τσα",
))

_EL_EXC15A = frozenset((
    "αβαστ", "πολυφ", "αδηφ", "παμφ", "ρ", "ασπ", "αφ", "αμαλ", "αμαλλι",
    "ανυστ", "απερ", "ασπαρ", "αχαρ", "δερβεν", "δροσοπ", "ξεφ", "νεοπ",
    "νομοτ", "ολοπ", "ομοτ", "προστ", "προσωποπ", "συμπ", "συντ", "τ",
    "υποτ", "χαρ", "αειπ", "αιμοστ", "ανυπ", "αποτ", "αρτιπ", "διατ", "εν",
    "επιτ", "κροκαλοπ", "σιδηροπ", "λ", "ναυ", "ουλαμ", "ουρ", "π", "τρ",
    "μ",
))

_EL_EXC15B = frozenset((
    "ψοφ", "ναυλοχ",
))

_EL_EXC16 = frozenset((
    "ν", "χερσον", "δωδεκαν", "ερημον", "μεγαλον", "επταν",
))

_EL_EXC17 = frozenset((
    "ασβ", "σβ", "αχρ", "χρ", "απλ", "αειμν", "δυσχρ", "ευχρ", "κοινοχρ",
    "παλιμψ",
))

_EL_EXC18 = frozenset((
    "ν", "ρ", "σπι", "στραβομουτσ", "κακομουτσ", "εξων",
))

_EL_EXC19 = frozenset((
    "παρασουσ", "φ", "χ", "ωριοπλ", "αζ", "αλλοσουσ", "ασουσ",
))


_EL_LOWER = str.maketrans({
    "\u03c2": "\u03c3",                                   # ς -> σ
    "\u0386": "\u03b1", "\u03ac": "\u03b1",             # ά -> α
    "\u0388": "\u03b5", "\u03ad": "\u03b5",             # έ -> ε
    "\u0389": "\u03b7", "\u03ae": "\u03b7",             # ή -> η
    "\u038a": "\u03b9", "\u03aa": "\u03b9",             # ί/ϊ -> ι
    "\u03af": "\u03b9", "\u03ca": "\u03b9", "\u0390": "\u03b9",
    "\u038e": "\u03c5", "\u03ab": "\u03c5",             # ύ/ϋ -> υ
    "\u03cd": "\u03c5", "\u03cb": "\u03c5", "\u03b0": "\u03c5",
    "\u038c": "\u03bf", "\u03cc": "\u03bf",             # ό -> ο
    "\u038f": "\u03c9", "\u03ce": "\u03c9",             # ώ -> ω
    "\u03a2": "\u03c2",                                   # legacy U+03A2
})

_EL_VOWELS = frozenset("\u03b1\u03b5\u03b7\u03b9\u03bf\u03c5\u03c9")
_EL_VOWELS_NO_Y = frozenset("\u03b1\u03b5\u03b7\u03b9\u03bf\u03c9")


def greek_lowercase(term: str) -> str:
    """GreekLowerCaseFilter.lowerCase over each codepoint."""
    return term.lower().translate(_EL_LOWER)


def _v(w: str) -> bool:
    return bool(w) and w[-1] in _EL_VOWELS


def _v_no_y(w: str) -> bool:
    return bool(w) and w[-1] in _EL_VOWELS_NO_Y


def _strip_longest(w: str, groups) -> str:
    """Apply the first (min_len, (suffixes...), cut) row that matches."""
    for min_len, sfxs, cut in groups:
        if len(w) > min_len and w.endswith(sfxs):
            return w[:-cut]
    return w


def greek_stem(word: str) -> str:
    """GreekStemmer.stem (GreekStemmer.kt:31-63)."""
    if len(word) < 4:
        return word
    w = word
    orig_len = len(w)

    # rule 0 — irregular neuter nouns
    w = _strip_longest(w, (
        (9, ("καθεστωτοσ", "καθεστωτων"), 4),
        (8, ("γεγονοτοσ", "γεγονοτων"), 4),
        (8, ("καθεστωτα",), 3),
        (7, ("τατογιου", "τατογιων"), 4),
        (7, ("γεγονοτα",), 3),
        (7, ("καθεστωσ",), 2),
        # reference quirk: the len guard binds only to the first suffix
        (0, ("σκαγιων", "ολογιου", "ολογιων", "κρεατοσ", "κρεατων",
             "περατοσ", "περατων", "τερατοσ", "τερατων"), 4),
        (6, ("σκαγιου",), 4),
        (6, ("τατογια",), 3),
        (6, ("γεγονοσ",), 2),
        (5, ("σκαγια", "ολογια", "κρεατα", "περατα", "τερατα"), 3),
        (4, ("φαγια", "σογια", "φωτοσ", "φωτων"), 3),
        (5, ("φαγιου", "φαγιων", "σογιου", "σογιων"), 4),
        (4, ("κρεασ", "περασ", "τερασ"), 2),
        (3, ("φωτα",), 2),
        (2, ("φωσ",), 1),
    ))

    # rule 1 — αδεσ/αδων
    if len(w) > 4 and w.endswith(("αδεσ", "αδων")):
        w = w[:-4]
        if not w.endswith(("οκ", "μαμ", "μαν", "μπαμπ", "πατερ", "γιαγι",
                           "νταντ", "κυρ", "θει", "πεθερ")):
            w += "αδ"

    # rule 2 — εδεσ/εδων
    if len(w) > 4 and w.endswith(("εδεσ", "εδων")):
        w = w[:-4]
        if w.endswith(("οπ", "ιπ", "εμπ", "υπ", "γηπ", "δαπ", "κρασπ",
                       "μιλ")):
            w += "εδ"

    # rule 3 — ουδεσ/ουδων
    if len(w) > 5 and w.endswith(("ουδεσ", "ουδων")):
        w = w[:-5]
        if w.endswith(("αρκ", "καλιακ", "πεταλ", "λιχ", "πλεξ", "σκ", "σ",
                       "φλ", "φρ", "βελ", "λουλ", "χν", "σπ", "τραγ",
                       "φε")):
            w += "ουδ"

    # rule 4 — εωσ/εων
    if len(w) > 3 and w.endswith(("εωσ", "εων")):
        w = w[:-3]
        if w in _EL_EXC4:
            w += "ε"

    # rule 5 — ια/ιου/ιων
    if len(w) > 2 and w.endswith("ια"):
        w = w[:-2]
        if _v(w):
            w += "ι"
    elif len(w) > 3 and w.endswith(("ιου", "ιων")):
        w = w[:-3]
        if _v(w):
            w += "ι"

    # rule 6 — ικα/ικο/ικου/ικων
    removed = False
    if len(w) > 3 and w.endswith(("ικα", "ικο")):
        w = w[:-3]
        removed = True
    elif len(w) > 4 and w.endswith(("ικου", "ικων")):
        w = w[:-4]
        removed = True
    if removed and (_v(w) or w in _EL_EXC6):
        w += "ικ"

    # rule 7 — αγαμε family (the len==5 case exits rule 7 only)
    if len(w) == 5 and w.endswith("αγαμε"):
        w = w[:-1]
    else:
        if len(w) > 7 and w.endswith("ηθηκαμε"):
            w = w[:-7]
        elif len(w) > 6 and w.endswith("ουσαμε"):
            w = w[:-6]
        elif len(w) > 5 and w.endswith(("αγαμε", "ησαμε", "ηκαμε")):
            w = w[:-5]
        if len(w) > 3 and w.endswith("αμε"):
            w = w[:-3]
            if w in _EL_EXC7:
                w += "αμ"

    # rule 8 — ανε family (reference quirk: bare || arms skip the guard)
    removed = False
    if len(w) > 8 and w.endswith("ιουντανε"):
        w = w[:-8]
        removed = True
    elif (len(w) > 7 and w.endswith("ιοντανε")) or \
            w.endswith(("ουντανε", "ηθηκανε")):
        w = w[:-7]
        removed = True
    elif (len(w) > 6 and w.endswith("ιοτανε")) or \
            w.endswith(("οντανε", "ουσανε")):
        w = w[:-6]
        removed = True
    elif (len(w) > 5 and w.endswith("αγανε")) or \
            w.endswith(("ησανε", "οτανε", "ηκανε")):
        w = w[:-5]
        removed = True
    if removed and w in _EL_EXC8A:
        w += "αγαν"
    if len(w) > 3 and w.endswith("ανε"):
        w = w[:-3]
        if _v_no_y(w) or w in _EL_EXC8B:
            w += "αν"

    # rule 9 — ετε
    if len(w) > 5 and w.endswith("ησετε"):
        w = w[:-5]
    if len(w) > 3 and w.endswith("ετε"):
        w = w[:-3]
        if (w in _EL_EXC9 or _v_no_y(w) or w.endswith((
                "οδ", "αιρ", "φορ", "ταθ", "διαθ", "σχ", "ενδ", "ευρ",
                "τιθ", "υπερθ", "ραθ", "ενθ", "ροθ", "σθ", "πυρ", "αιν",
                "συνδ", "συν", "συνθ", "χωρ", "πον", "βρ", "καθ", "ευθ",
                "εκθ", "νετ", "ρον", "αρκ", "βαρ", "βολ", "ωφελ"))):
            w += "ετ"

    # rule 10 — οντασ/ωντασ
    if len(w) > 5 and w.endswith(("οντασ", "ωντασ")):
        w = w[:-5]
        if len(w) == 3 and w == "αρχ":
            w += "οντ"
        if w.endswith("κρε"):
            w += "ωντ"

    # rule 11 — ομαστε/ιομαστε
    if len(w) > 6 and w.endswith("ομαστε"):
        w = w[:-6]
        if w == "ον":
            w += "ομαστ"
    elif len(w) > 7 and w.endswith("ιομαστε"):
        w = w[:-7]
        if w == "ον":
            w += "ομαστ"

    # rule 12 — ιεστε/εστε
    if len(w) > 5 and w.endswith("ιεστε"):
        w = w[:-5]
        if w in _EL_EXC12A:
            w += "ιεστ"
    if len(w) > 4 and w.endswith("εστε"):
        w = w[:-4]
        if w in _EL_EXC12B:
            w += "εστ"

    # rule 13 — ηθηκ/ηκ family
    if len(w) > 6 and w.endswith("ηθηκεσ"):
        w = w[:-6]
    elif len(w) > 5 and w.endswith(("ηθηκα", "ηθηκε")):
        w = w[:-5]
    removed = False
    if len(w) > 4 and w.endswith("ηκεσ"):
        w = w[:-4]
        removed = True
    elif len(w) > 3 and w.endswith(("ηκα", "ηκε")):
        w = w[:-3]
        removed = True
    if removed and (w in _EL_EXC13 or w.endswith((
            "σκωλ", "σκουλ", "ναρθ", "σφ", "οθ", "πιθ"))):
        w += "ηκ"

    # rule 14 — ουσα family
    removed = False
    if len(w) > 5 and w.endswith("ουσεσ"):
        w = w[:-5]
        removed = True
    elif len(w) > 4 and w.endswith(("ουσα", "ουσε")):
        w = w[:-4]
        removed = True
    if removed and (w in _EL_EXC14 or _v(w) or w.endswith((
            "ποδαρ", "βλεπ", "πανταχ", "φρυδ", "μαντιλ", "μαλλ", "κυματ",
            "λαχ", "ληγ", "φαγ", "ομ", "πρωτ"))):
        w += "ουσ"

    # rule 15 — αγα family
    removed = False
    if len(w) > 4 and w.endswith("αγεσ"):
        w = w[:-4]
        removed = True
    elif len(w) > 3 and w.endswith(("αγα", "αγε")):
        w = w[:-3]
        removed = True
    if removed:
        cond1 = w in _EL_EXC15A or w.endswith((
            "οφ", "πελ", "χορτ", "λλ", "σφ", "ρπ", "φρ", "πρ", "λοχ",
            "σμην"))
        cond2 = w in _EL_EXC15B or w.endswith("κολλ")
        if cond1 and not cond2:
            w += "αγ"

    # rule 16 — ησου/ησε/ησα
    removed = False
    if len(w) > 4 and w.endswith("ησου"):
        w = w[:-4]
        removed = True
    elif len(w) > 3 and w.endswith(("ησε", "ησα")):
        w = w[:-3]
        removed = True
    if removed and w in _EL_EXC16:
        w += "ησ"

    # rule 17 — ηστε
    if len(w) > 4 and w.endswith("ηστε"):
        w = w[:-4]
        if w in _EL_EXC17:
            w += "ηστ"

    # rule 18 — ουνε family
    removed = False
    if len(w) > 6 and w.endswith(("ησουνε", "ηθουνε")):
        w = w[:-6]
        removed = True
    elif len(w) > 4 and w.endswith("ουνε"):
        w = w[:-4]
        removed = True
    if removed and w in _EL_EXC18:
        w += "ουν"

    # rule 19 — ουμε family
    removed = False
    if len(w) > 6 and w.endswith(("ησουμε", "ηθουμε")):
        w = w[:-6]
        removed = True
    elif len(w) > 4 and w.endswith("ουμε"):
        w = w[:-4]
        removed = True
    if removed and w in _EL_EXC19:
        w += "ουμ"

    # rule 20 — ματ
    if len(w) > 5 and w.endswith(("ματων", "ματοσ")):
        w = w[:-3]
    elif len(w) > 4 and w.endswith("ματα"):
        w = w[:-2]

    # rule 21 — long suffix list, only when nothing fired
    if len(w) == orig_len:
        w = _el_rule21(w)

    return _el_rule22(w)


def _el_rule21(w: str) -> str:
    n = len(w)
    if n > 9 and w.endswith("ιοντουσαν"):
        return w[:-9]
    if n > 8 and w.endswith(("ιομασταν", "ιοσασταν", "ιουμαστε",
                             "οντουσαν")):
        return w[:-8]
    if n > 7 and w.endswith(("ιεμαστε", "ιεσαστε", "ιομουνα", "ιοσαστε",
                             "ιοσουνα", "ιουνται", "ιουνταν", "ηθηκατε",
                             "ομασταν", "οσασταν", "ουμαστε")):
        return w[:-7]
    if n > 6 and w.endswith(("ιομουν", "ιονταν", "ιοσουν", "ηθειτε",
                             "ηθηκαν", "ομουνα", "οσαστε", "οσουνα",
                             "ουνται", "ουνταν", "ουσατε")):
        return w[:-6]
    if n > 5 and w.endswith(("αγατε", "ιεμαι", "ιεται", "ιεσαι", "ιοταν",
                             "ιουμα", "ηθεισ", "ηθουν", "ηκατε", "ησατε",
                             "ησουν", "ομουν", "ονται", "ονταν", "οσουν",
                             "ουμαι", "ουσαν")):
        return w[:-5]
    if n > 4 and w.endswith(("αγαν", "αμαι", "ασαι", "αται", "ειτε",
                             "εσαι", "εται", "ηδεσ", "ηδων", "ηθει",
                             "ηκαν", "ησαν", "ησει", "ησεσ", "ομαι",
                             "οταν")):
        return w[:-4]
    if n > 3 and w.endswith(("αει", "εισ", "ηθω", "ησω", "ουν", "ουσ")):
        return w[:-3]
    if n > 2 and w.endswith(("αν", "ασ", "αω", "ει", "εσ", "ησ", "οι",
                             "οσ", "ου", "υσ", "ων")):
        return w[:-2]
    if n > 1 and _v(w):
        return w[:-1]
    return w


def _el_rule22(w: str) -> str:
    if w.endswith(("εστερ", "εστατ")):
        return w[:-5]
    if w.endswith(("οτερ", "οτατ", "υτερ", "υτατ", "ωτερ", "ωτατ")):
        return w[:-4]
    return w


def greek_analyzer(stop_words=None,
                   max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH):
    """GreekAnalyzer.createComponents (GreekAnalyzer.kt:66-72)."""
    stop = GREEK_STOP_WORDS if stop_words is None else frozenset(stop_words)

    def run(text: str):
        if not text:
            return [], [], 0
        terms, positions = [], []
        for t in standard_tokenize(text, max_token_length):
            term = greek_lowercase(t.term)
            if term in stop:
                continue
            terms.append(greek_stem(term))
            positions.append(t.position)
        return terms, positions, len(terms)

    return run
