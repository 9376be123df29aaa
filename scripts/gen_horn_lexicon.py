"""One-time vendoring of the Horn (HornMorpho-derived) lexicon data.

The reference builds ``HornGeneratedData`` at compile time from the public
HornMorpho lexicon files (``gradle/generateHornData.gradle.kts``:
``GenerateHornDataKotlinTask``). This script replays the same cleaning
pass (``cleanToken`` / entry-precedence semantics,
generateHornData.gradle.kts:85-125) over those lexicon files and emits the
*raw* entry list as a Python data module
(``lucene_kmp_spark/analysis/horn_data.py``); the generated-variant
expansion (``addGeneratedVariants``) is replayed lazily at import time by
``lucene_kmp_spark/analysis/horn.py`` so the vendored file stays small.

Run once against a checkout of the reference's ``gradle/horn`` data dir:

    python scripts/gen_horn_lexicon.py /root/reference/gradle/horn

The emitted module is committed; the engine never reads the reference tree.
"""
from __future__ import annotations

import re
import sys
from pathlib import Path

# File lists mirror generateHornData.gradle.kts:320-355 (order matters only
# via sortedBy(name), replayed below).
AM_LEX_FILES = [
    "n_stem.lex", "n_stemG.lex", "n_stem_an.lex", "n_analyzed.lex",
    "n_analyzed_phon.lex", "irr_plr.lex", "irr_n.lex", "irr_conj.lex",
    "words.lex", "words_phon.lex", "n_name.lex", "n_nameG.lex",
    "n_place.lex", "n_placeG.lex", "prep_n.lex", "ppron.lex", "ppronG.lex",
    "alle.lex", "new.lex", "vb_root.lex", "vb_rootG.lex", "v_analyzed.lex",
    "v_analyzed_phon.lex", "irr_stem.lex", "irr_vnoun.lex",
]
OM_LEX_FILES = [
    "nouns.lex", "nouns0.lex", "nouns_pl.lex", "nouns_f.lex", "nouns_m.lex",
    "words.lex", "v_stems.lex", "v_stem.lex", "irr_stem.lex",
    "irr_stem+.lex", "irr_stemG.lex",
]

_WS = re.compile(r"\s+")


def clean_token(value: str, lowercase: bool) -> str | None:
    """cleanToken (generateHornData.gradle.kts:150-158)."""
    trimmed = value.strip()
    if not trimmed:
        return None
    if trimmed.startswith("[") or trimmed.startswith("{"):
        return None
    if trimmed == "''":
        return None
    cleaned = trimmed.strip(",;")
    if not cleaned:
        return None
    return cleaned.lower() if lowercase else cleaned


def build_entries(paths: list[Path], lowercase: bool) -> dict[str, str]:
    """buildLexiconData minus variant expansion (kts:85-125)."""
    entries: dict[str, str] = {}
    for path in sorted(paths, key=lambda p: p.name):
        for raw in path.read_text(encoding="utf-8").splitlines():
            line = raw.split("#", 1)[0].strip()
            if not line:
                continue
            columns = [c for c in _WS.split(line) if c]
            if not columns:
                continue
            surface = clean_token(columns[0], lowercase)
            if surface is None:
                continue
            lemma = None
            if len(columns) > 1:
                lemma = clean_token(columns[1], lowercase)
                if lemma == "''":
                    lemma = None
            if lemma is None:
                lemma = surface
            if lemma != surface:
                entries[surface] = lemma        # overwrite, keep position
            else:
                entries.setdefault(surface, lemma)
    return entries


def build_geez_sera(path: Path) -> dict[str, str]:
    """buildGeezSeraData (kts:160-176): geez -> LAST '='-column."""
    entries: dict[str, str] = {}
    for raw in path.read_text(encoding="utf-8").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        for part in _WS.split(line):
            columns = part.split("=")
            if len(columns) >= 2 and columns[0] and columns[-1]:
                entries.setdefault(columns[0], columns[-1])
    # runtime parseGeezSera only keeps single-char geez keys
    return {k: v for k, v in entries.items() if len(k) == 1}


def render(entries: dict[str, str]) -> str:
    lines = []
    for surface, lemma in entries.items():
        lines.append(surface if lemma == surface else f"{surface}\t{lemma}")
    return "\n".join(lines)


def main() -> None:
    horn = Path(sys.argv[1])
    am = build_entries([horn / "am/lex" / f for f in AM_LEX_FILES], False)
    om = build_entries([horn / "om/lex" / f for f in OM_LEX_FILES], True)
    geez = build_geez_sera(horn / "geez/am_conv_sera.txt")
    out = Path(__file__).resolve().parent.parent / \
        "lucene_kmp_spark/analysis/horn_data.py"
    with out.open("w", encoding="utf-8") as f:
        f.write('"""Vendored HornMorpho lexicon data (public, see '
                'scripts/gen_horn_lexicon.py).\n\nRaw cleaned entries; '
                'variant expansion happens in analysis/horn.py.\n"""\n\n')
        f.write("AM_LEXICON_RAW = %r\n\n" % render(am))
        f.write("OM_LEXICON_RAW = %r\n\n" % render(om))
        f.write("AM_GEEZ_SERA_RAW = %r\n" % render(geez))
    print(f"am={len(am)} om={len(om)} geez={len(geez)} -> {out} "
          f"({out.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
