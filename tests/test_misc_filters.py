"""Core tokenizers + misc/commongrams/compound/pattern/reverse filters.

Goldens from the reference's Test*.kt files (analysis/common commonTest).
"""
from lucene_kmp_spark.analysis.misc import (
    capitalization_filter, common_grams_filter, common_grams_query_filter,
    dictionary_compound_filter, filter_analyzer, fingerprint_filter,
    hyphenated_words_filter, keep_word_filter, keyword_analyzer,
    keyword_tokenize, length_filter, letter_tokenize,
    limit_token_count_filter, limit_token_position_filter, pattern_tokenize,
    pattern_replace_filter, remove_duplicates_filter, reverse_string_filter,
    scandinavian_folding_filter, scandinavian_normalization_filter,
    simple_analyzer, stop_analyzer, trim_filter, truncate_filter,
    upper_case_filter, whitespace_analyzer, whitespace_tokenize)


def _apply(filt, terms):
    t, p = filt(list(terms), list(range(len(terms))))
    return t


def test_core_tokenizers():
    assert whitespace_tokenize("foo  bar\tbaz\n") == ["foo", "bar", "baz"]
    assert letter_tokenize("ab3cd e!f") == ["ab", "cd", "e", "f"]
    assert keyword_tokenize("one whole token") == ["one whole token"]
    assert keyword_tokenize("") == []


def test_core_analyzers():
    assert whitespace_analyzer()("Foo Bar")[0] == ["Foo", "Bar"]
    assert simple_analyzer()("Foo3Bar baz")[0] == ["foo", "bar", "baz"]
    assert keyword_analyzer()("Foo Bar")[0] == ["Foo Bar"]
    a = stop_analyzer(("the", "of"))
    assert a("The quick of fox")[0] == ["quick", "fox"]


def test_length_filter():
    # TestLengthFilter.kt: min=2 max=6 over mock stream, holes preserved
    terms = ["short", "toolong", "ab", "a", "foo"]
    t, p = length_filter(2, 6)(terms, [0, 1, 2, 3, 4])
    assert t == ["short", "ab", "foo"]
    assert p == [0, 2, 4]                      # incr 1,4,2 == holes


def test_trim_and_truncate_and_case():
    # TestTrimFilter.kt: " a ", "b  ", "cCc", "   ", ""
    assert _apply(trim_filter, [" a ", "b  ", "cCc", "   ", ""]) == \
        ["a", "b", "cCc", "", ""]
    # TestTruncateTokenFilter.kt: length 5
    assert _apply(truncate_filter(5),
                  ["abcdefg", "12345678", "ABCDEFG", "abcde", "abc",
                   "12345", "123"]) == \
        ["abcde", "12345", "ABCDE", "abcde", "abc", "12345", "123"]
    assert _apply(upper_case_filter, ["foo", "Bar"]) == ["FOO", "BAR"]


def test_keep_word_filter():
    # TestKeepWordFilter.kt: words={aaa,bbb}; "aaa BBB ccc DDD"
    terms = ["aaa", "BBB", "ccc", "DDD"]
    t, p = keep_word_filter(["aaa", "bbb"], lowercase=True)(
        terms, [2, 3, 4, 5])                   # leading hole like the test
    assert t == ["aaa", "BBB"] and p == [2, 3]
    t, p = keep_word_filter(["aaa", "bbb"], lowercase=False)(
        terms, [2, 3, 4, 5])
    assert t == ["aaa"] and p == [2]


def test_capitalization_filter_goldens():
    keep = ("and", "the", "it", "BIG")
    one = capitalization_filter(only_first_word=True, keep=keep,
                                force_first_letter=True)
    assert _apply(one, ["kiTTEN"]) == ["Kitten"]
    assert _apply(one, ["and"]) == ["And"]      # keep + forced first letter
    assert _apply(one, ["AnD"]) == ["And"]      # not in case-sensitive keep
    assert _apply(one, ["big"]) == ["Big"]
    assert _apply(one, ["BIG"]) == ["BIG"]      # kept verbatim
    assert _apply(one, ["Hello thEre my Name is Ryan"]) == \
        ["Hello there my name is ryan"]
    each = capitalization_filter(only_first_word=False, keep=keep,
                                 force_first_letter=True)
    assert _apply(each, ["Hello", "thEre", "my", "Name", "is", "Ryan"]) == \
        ["Hello", "There", "My", "Name", "Is", "Ryan"]
    long3 = capitalization_filter(only_first_word=False, keep=keep,
                                  force_first_letter=True, min_word_length=3)
    assert _apply(long3, ["Hello", "thEre", "my", "Name", "is", "Ryan"]) == \
        ["Hello", "There", "my", "Name", "is", "Ryan"]
    assert _apply(one, ["McKinley"]) == ["Mckinley"]
    pref = capitalization_filter(only_first_word=True, keep=keep,
                                 force_first_letter=True, ok_prefix=("McK",))
    assert _apply(pref, ["McKinley"]) == ["McKinley"]
    assert _apply(each, ["1st", "2nd", "third"]) == ["1st", "2nd", "Third"]


def test_hyphenated_words_filter():
    # TestHyphenatedWordsFilter.kt
    terms = "ecological develop comprehensive-hands-on and ecologi- cal".split()
    assert _apply(hyphenated_words_filter, terms) == \
        ["ecological", "develop", "comprehensive-hands-on", "and",
         "ecological"]
    terms = "ecological develop comprehensive-hands-on and ecology-".split()
    assert _apply(hyphenated_words_filter, terms) == \
        ["ecological", "develop", "comprehensive-hands-on", "and",
         "ecology-"]
    # offsets case: "abc- def geh 1234- 5678-"
    assert _apply(hyphenated_words_filter,
                  ["abc-", "def", "geh", "1234-", "5678-"]) == \
        ["abcdef", "geh", "12345678-"]


def test_remove_duplicates_and_limits():
    # same term at same position dropped
    t, p = remove_duplicates_filter(["a", "a", "b"], [0, 0, 1])
    assert t == ["a", "b"] and p == [0, 1]
    t, p = remove_duplicates_filter(["a", "a"], [0, 1])
    assert t == ["a", "a"]
    assert _apply(limit_token_count_filter(2), ["a", "b", "c"]) == ["a", "b"]
    t, p = limit_token_position_filter(2)(["a", "b", "c"], [0, 1, 2])
    assert t == ["a", "b"]


def test_scandinavian_normalization_goldens():
    # TestScandinavianNormalizationFilter.kt
    cases = [("aeäaeeea", "æææeea"), ("aeäaeeeae", "æææeeæ"),
             ("aeaeeeae", "ææeeæ"), ("bøen", "bøen"), ("bOEen", "bØen"),
             ("åene", "åene"), ("blåbærsyltetøj", "blåbærsyltetøj"),
             ("blaabaersyltetöj", "blåbærsyltetøj"),
             ("räksmörgås", "ræksmørgås"), ("raeksmörgaos", "ræksmørgås"),
             ("raeksmörgaas", "ræksmørgås"), ("raeksmoergås", "ræksmørgås")]
    for src, exp in cases:
        assert _apply(scandinavian_normalization_filter, [src]) == [exp], src


def test_scandinavian_folding():
    # TestScandinavianFoldingFilter.kt style: å/ä/æ->a ö/ø->o, digraphs drop
    for src, exp in [("räksmörgås", "raksmorgas"), ("bøen", "boen"),
                     ("blåbærsyltetøj", "blabarsyltetoj"),
                     ("aaby", "aby"), ("aeby", "aby"), ("oeby", "oby")]:
        assert _apply(scandinavian_folding_filter, [src]) == [exp], src


def test_reverse_string_filter():
    assert _apply(reverse_string_filter, ["Do", "have", "a", "nice", "day"]) \
        == ["oD", "evah", "a", "ecin", "yad"]


def test_pattern_tokenizer_and_replace():
    assert pattern_tokenize("aaa bbb ccc", r"\s+") == ["aaa", "bbb", "ccc"]
    assert pattern_tokenize("aaa'bbb'ccc", r"'([^']+)'", 1) == ["bbb"]
    assert _apply(pattern_replace_filter(r"a+", "-"),
                  ["caaat", "dog"]) == ["c-t", "dog"]
    assert _apply(pattern_replace_filter(r"a", "-", replace_all=False),
                  ["caaat"]) == ["c-aat"]


def test_common_grams_goldens():
    # TestCommonGramsFilter.kt — commons: of, the, s
    common = ("of", "the", "s")
    cg = common_grams_filter(common)

    def grams(words):
        t, p = cg(words.split(), list(range(len(words.split()))))
        return t

    assert grams("brown fox") == ["brown", "fox"]
    assert grams("the fox") == ["the", "the_fox", "fox"]
    assert grams("fox of") == ["fox", "fox_of", "of"]
    assert grams("n n n") == ["n", "n", "n"]
    assert grams("n n s") == ["n", "n", "n_s", "s"]
    assert grams("n s n") == ["n", "n_s", "s", "s_n", "n"]
    assert grams("s n n") == ["s", "s_n", "n", "n"]
    assert grams("s s s") == ["s", "s_s", "s", "s_s", "s"]
    # gram sits at the previous token's position (posIncr = 0)
    t, p = cg(["the", "fox"], [0, 1])
    assert t == ["the", "the_fox", "fox"] and p == [0, 0, 1]


def test_common_grams_query_goldens():
    # TestCommonGramsQueryFilter.kt
    common = ("of", "the", "s")
    q = common_grams_query_filter(common)

    def out(words):
        ws = words.split()
        return q(ws, list(range(len(ws))))[0]

    assert out("brown fox") == ["brown", "fox"]
    assert out("the fox") == ["the_fox"]
    assert out("fox of") == ["fox_of"]
    assert out("of the") == ["of_the"]
    assert out("the") == ["the"]
    assert out("foo") == ["foo"]
    assert out("n n n") == ["n", "n", "n"]
    assert out("n n s") == ["n", "n_s"]
    assert out("n s n") == ["n_s", "s_n"]
    assert out("s n n") == ["s_n", "n", "n"]
    assert out("n s s") == ["n_s", "s_s"]
    assert out("s n s") == ["s_n", "n_s"]
    assert out("s s n") == ["s_s", "s_n"]
    assert out("s s s") == ["s_s", "s_s"]
    assert out("fox of the") == ["fox_of", "of_the"]
    assert out("the quick brown") == ["the_quick", "quick", "brown"]
    assert out("the fox of") == ["the_fox", "fox_of"]
    assert out("of the fox") == ["of_the", "the_fox"]
    assert out("of the of") == ["of_the", "the_of"]
    assert out("quick the brown") == ["quick_the", "the_brown"]
    assert out("quick brown the") == ["quick", "brown_the"]


def test_dictionary_compound_goldens():
    # TestCompoundWordTokenFilter.kt testDumbCompoundWordsSE
    dic = ("Bil", "Dörr", "Motor", "Tak", "Borr", "Slag", "Hammar", "Pelar",
           "Glas", "Ögon", "Fodral", "Bas", "Fiol", "Makare", "Gesäll",
           "Sko", "Vind", "Rute", "Torkare", "Blad")
    f = dictionary_compound_filter(dic)
    text = ("Bildörr Bilmotor Biltak Slagborr Hammarborr Pelarborr "
            "Glasögonfodral Basfiolsfodral Basfiolsfodralmakaregesäll "
            "Skomakare Vindrutetorkare Vindrutetorkarblad abba")
    words = text.split()
    t, p = f(words, list(range(len(words))))
    assert t == [
        "Bildörr", "Bil", "dörr", "Bilmotor", "Bil", "motor", "Biltak",
        "Bil", "tak", "Slagborr", "Slag", "borr", "Hammarborr", "Hammar",
        "borr", "Pelarborr", "Pelar", "borr", "Glasögonfodral", "Glas",
        "ögon", "fodral", "Basfiolsfodral", "Bas", "fiol", "fodral",
        "Basfiolsfodralmakaregesäll", "Bas", "fiol", "fodral", "makare",
        "gesäll", "Skomakare", "Sko", "makare", "Vindrutetorkare", "Vind",
        "rute", "torkare", "Vindrutetorkarblad", "Vind", "rute", "blad",
        "abba"]
    # subwords share the original token's position
    t2, p2 = f(["Bildörr"], [7])
    assert t2 == ["Bildörr", "Bil", "dörr"] and p2 == [7, 7, 7]


def test_fingerprint_filter():
    f = fingerprint_filter()
    assert f(["b", "a", "b"], [0, 1, 2]) == (["a b"], [0])
    assert f([], []) == ([], [])
    tiny = fingerprint_filter(max_output_token_size=2)
    assert tiny(["aaa", "bbb"], [0, 1]) == ([], [])


def test_protected_term_filter():
    from lucene_kmp_spark.analysis.misc import (
        protected_term_filter, truncate_filter)
    f = protected_term_filter(("friends",), truncate_filter(4))
    t, p = f(["hello", "friends", "forever"], [0, 1, 2])
    assert t == ["hell", "friends", "fore"] and p == [0, 1, 2]


def test_keyword_repeat_stemmer():
    from lucene_kmp_spark.analysis.en import porter_stem
    from lucene_kmp_spark.analysis.misc import keyword_repeat_stemmer
    f = keyword_repeat_stemmer(porter_stem)
    t, p = f(["running", "run"], [0, 1])
    assert t == ["running", "run", "run"] and p == [0, 0, 1]


def test_concatenate_filter():
    from lucene_kmp_spark.analysis.misc import concatenate_filter
    f = concatenate_filter(" ")
    assert f(["a", "b", "c"], [0, 1, 2]) == (["a b c"], [0])
    assert f([], []) == ([], [])


def test_filter_analyzer_composition():
    a = filter_analyzer(
        whitespace_tokenize,
        filters=(trim_filter, length_filter(2, 10)),
        lowercase=True)
    terms, positions, n = a("A QuickBrown fox")
    assert terms == ["quickbrown", "fox"] and positions == [1, 2]
