"""HTMLStripCharFilter + MappingCharFilter goldens.

Reference: analysis/common/.../charfilter/HTMLStripCharFilter.kt (generated
from the published HTMLStripCharFilter.jflex) and its
TestHTMLStripCharFilter.kt; MappingCharFilter.kt greedy longest-match.
"""
from lucene_kmp_spark.analysis.charfilter import (
    html_strip, html_strip_analyzer, mapping_charfilter)


def test_main_golden():
    html = ('<div class="foo">this is some text</div> here is a '
            '<a href="#bar">link</a> and another '
            '<a href="http://lucene.apache.org/">link</a>. '
            'This is an entity: &amp; plus a &lt;.  Here is an &. '
            '<!-- is a comment -->')
    gold = ('\nthis is some text\n here is a link and another link. '
            'This is an entity: & plus a <.  Here is an &. ')
    assert html_strip(html) == gold


def test_entity_goldens():
    assert html_strip("&Gamma;", ("reserved",)) == "Γ"
    assert html_strip(
        "&nbsp; &lt;foo&gt; &Uuml;bermensch &#61; &Gamma; bar &#x393;",
        ("reserved",)) == "  <foo> Übermensch = Γ bar Γ"
    assert html_strip("&nbsp; &lt;junk/&gt; &nbsp; &#33; &#64; and &#8217;",
                      ("reserved",)) == "  <junk/>   ! @ and ’"


def test_escaped_tags_preserved():
    result = html_strip(
        'aaa bbb <reserved ccc="ddddd"> eeee </reserved> ffff '
        '<reserved ggg="hhhh"/> <other/>', ("reserved",))
    assert result.find("reserved") == 9
    assert result.find("reserved", 15) == 38
    assert result.find("reserved", 41) == 54
    assert "other" not in result


def test_malformed_html_goldens():
    # TestHTMLStripCharFilter.testBufferOverflow-style adversarial inputs
    assert html_strip("a <a hr<ef=aa<a>> </close</a>") == \
        "a <a hr<ef=aa> </close"
    assert html_strip(
        '<a href=http://dmoz.org/cgi-bin/add.cgi?where=/arts/" class=lu '
        'style="font-size: 9px" target=dmoz>Submit a Site</a>') == \
        "Submit a Site"
    unclosed = ('<a href=" http://www.surgery4was.happyhost.org/'
                'video-of-arthroscopic-knee-surgery symptoms.html, heat '
                'congestive heart failure <a href=" '
                'http://www.symptoms1bad.happyhost.org/canine')
    assert html_strip(unclosed) == unclosed
    assert html_strip('<a href="http://ucblibraries.colorado.edu/how/'
                      'index.htm"class="pageNavAreaText">') == ""
    assert html_strip('<a href="#postcomment" title=""Leave a comment";">?') \
        == "?"


def test_block_vs_inline_and_script_style():
    assert html_strip("x<br>y") == "x\ny"
    assert html_strip("x<span>y</span>z") == "xyz"
    assert html_strip("x<p>y</p>z") == "x\ny\nz"
    assert html_strip("before<script>var x = 1;</script>after") == \
        "before\nafter"
    assert html_strip('a<style type="text/css">p {}</style>b') == "a\nb"
    assert html_strip("<?php echo(); ?>x<!DOCTYPE html>y") == "xy"


def test_mapping_charfilter_longest_match():
    mc = mapping_charfilter({"aa": "x", "a": "y", "bbb": ""})
    assert mc("aaa b bbb a") == "xy b  y"
    mc2 = mapping_charfilter({"fi": "fi", "ff": "ff"})
    assert mc2("affine final") == "affine final"


def test_html_strip_analyzer_chain():
    a = html_strip_analyzer()
    terms, positions, length = a("<p>Hello <b>World</b></p> &amp; more")
    assert terms == ["hello", "world", "more"]
