"""WordDelimiterGraphFilter goldens (TestWordDelimiterGraphFilter.kt)."""
from lucene_kmp_spark.analysis.worddelimiter import (
    word_delimiter_graph_filter)


def _split(term, **kw):
    f = word_delimiter_graph_filter(**kw)
    t, p = f([term], [0])
    return t


def test_do_split_goldens():
    assert _split("basic-split") == ["basic", "split"]
    assert _split("camelCase") == ["camel", "Case"]
    assert _split("test's'") == ["test"]
    assert _split("Роберт") == ["Роберт"]
    assert _split("РобЕрт") == ["Роб", "Ерт"]
    assert _split("aǅungla") == ["aǅungla"]
    assert _split("ب" + "ـ" * 5 + "سلام") == ["ب" + "ـ" * 5 + "سلام"]
    assert _split("हिन्दी") == ["हिन्दी"]
    assert _split("١٢٣٤") == ["١٢٣٤"]
    assert _split("𠀀𠀀") == ["𠀀𠀀"]
    assert _split("PowerShot500") == ["Power", "Shot", "500"]


def test_possessives():
    assert _split("ra's") == ["ra"]
    assert _split("ra's", stem_english_possessive=False) == ["ra", "s"]


def test_no_split_options():
    assert _split("camelCase", split_on_case_change=False) == ["camelCase"]
    assert _split("Shot500", split_on_numerics=False) == ["Shot500"]


def test_lots_of_concatenating_golden():
    # flags: generate both + catenate words/numbers/all + splits + possessive
    f = word_delimiter_graph_filter(
        catenate_words=True, catenate_numbers=True, catenate_all=True)
    t, p = f(["abc-def-123-456"], [0])
    assert t == ["abcdef123456", "abcdef", "abc", "def", "123456", "123",
                 "456"]
    assert p == [0, 0, 0, 1, 2, 2, 3]       # posIncr 1,0,0,1,1,0,1


def test_position_increments_golden():
    # "SAL_S8371 - SAL" with PRESERVE_ORIGINAL (no possessive stemming)
    f = word_delimiter_graph_filter(preserve_original=True,
                                    stem_english_possessive=False)
    t, p = f(["SAL_S8371", "-", "SAL"], [0, 1, 2])
    assert t == ["SAL_S8371", "SAL", "S", "8371", "-", "SAL"]
    assert p == [0, 0, 1, 2, 3, 4]           # posIncr 1,0,1,1,1,1


def test_protected_words():
    f = word_delimiter_graph_filter(protected_words=("klm-nop",))
    t, p = f(["abc-def", "klm-nop", "kpop"], [0, 1, 2])
    assert t == ["abc", "def", "klm-nop", "kpop"]
    assert p == [0, 1, 2, 3]


def test_delimiter_only_token_dropped_leaves_hole():
    f = word_delimiter_graph_filter()
    t, p = f(["foo", "-", "bar"], [0, 1, 2])
    assert t == ["foo", "bar"]
    assert p == [0, 2]                       # hole where '-' died


def test_offsets_parts():
    # "foo-bar" with catenate_words: foobar + foo + bar at one position
    f = word_delimiter_graph_filter(catenate_words=True)
    t, p = f(["foo-bar"], [0])
    assert t == ["foobar", "foo", "bar"]
    assert p == [0, 0, 1]
