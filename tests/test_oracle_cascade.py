"""E6 selector-cascade unit tests — one per branch (ref:1239-1363)."""

from webtext.dom import parse_html
from webtext.oracle.cascade import extract_main_content

LONG = "word " * 60   # 300 chars

def _doc(body: str, head: str = "") -> object:
    return parse_html(f"<html><head>{head}</head><body>{body}</body></html>")


def test_domain_rule_beats_generic():
    doc = _doc('<main>decoy main content here</main>'
               f'<div class="article_body"><p>{LONG}</p></div>')
    text, method = extract_main_content(doc, "news.yahoo.co.jp")
    assert method == "domain_rule"
    assert "decoy" not in text


def test_domain_rule_joins_multiple_elements():
    doc = _doc('<div class="article_body">one</div>'
               '<div class="article_body">two</div>')
    text, method = extract_main_content(doc, "news.yahoo.co.jp")
    assert text == "one\n\ntwo"


def test_domain_rule_misses_fall_to_generic():
    doc = _doc(f"<main><p>{LONG}</p></main>")
    text, method = extract_main_content(doc, "news.yahoo.co.jp")
    assert method == "generic_selector"


def test_sanspo_comma_selector_union():
    doc = _doc('<div class="article-header"><h1>head</h1></div>'
               '<div class="article-body">body text</div>')
    text, method = extract_main_content(doc, "www.sanspo.com")
    assert method == "domain_rule"
    assert text == "head\n\nbody text"


def test_generic_picks_longest_element():
    doc = _doc(f"<article>tiny</article><article><p>{LONG}</p></article>")
    text, _ = extract_main_content(doc, "")
    assert "tiny" not in text


def test_generic_selector_priority_main_over_article():
    doc = _doc(f"<article>{LONG}</article><main>short main body text</main>")
    text, method = extract_main_content(doc, "")
    # 'main' comes first in the cascade even though article is longer
    assert text == "short main body text"


def test_unwanted_removed_inside_selected_content():
    doc = _doc(f'<main><p>{LONG}</p><div class="related">junk link</div>'
               f"<nav>menu</nav></main>")
    text, _ = extract_main_content(doc, "")
    assert "junk" not in text and "menu" not in text


def test_heuristic_argmax_with_exclude_classes():
    big_excluded = "junk " * 100
    win = "keep " * 50                       # 250 chars
    doc = _doc(f'<div class="sidebar">{big_excluded}</div>'
               f'<div class="zone">{win}</div>')
    text, method = extract_main_content(doc, "")
    assert method == "heuristic"
    assert "junk" not in text and "keep" in text


def test_heuristic_class_repr_substring_quirk():
    # class "badge" contains "ad" as a substring → excluded (ref:1304)
    win = "keep " * 50
    doc = _doc(f'<div class="badge">{"junk " * 100}</div>'
               f'<div class="zone">{win}</div>')
    text, _ = extract_main_content(doc, "")
    assert "junk" not in text


def test_heuristic_parent_boost_flips_argmax():
    plain = "plain " * 55      # 330 chars
    boosted = "boost " * 45    # 270 chars ×1.5 = 405 effective
    doc = _doc(f'<div class="zonea">{plain}</div>'
               f'<div class="post-wrap"><div class="inner">{boosted}</div></div>')
    text, method = extract_main_content(doc, "")
    assert method == "heuristic"
    assert text.startswith("boost")


def test_heuristic_min_200_gate_falls_to_body():
    doc = _doc('<div class="zz">short text only here but above fifty '
               "characters in total for the body gate</div>")
    text, method = extract_main_content(doc, "")
    assert method == "body"


def test_body_fallback_strips_unwanted():
    doc = _doc('<div class="menu">navigation junk</div>'
               "<div>real body words spread across enough characters to "
               "pass the fifty char gate</div>")
    text, method = extract_main_content(doc, "")
    assert method == "body"
    assert "navigation" not in text


def test_body_under_50_falls_to_title():
    doc = _doc("<div>tiny</div>", head="<title>the title</title>")
    text, method = extract_main_content(doc, "")
    assert (text, method) == ("the title", "title")


def test_nothing_returns_empty():
    doc = _doc("")
    text, method = extract_main_content(doc, "")
    assert (text, method) == ("", "empty")
