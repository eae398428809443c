"""DOM + selector engine unit tests."""

from webtext.dom import parse_html


def test_basic_tree_and_text():
    doc = parse_html("<html><body><p>hello <b>world</b></p></body></html>")
    assert doc.body is not None
    assert doc.body.get_text(strip=True) == "helloworld"
    assert doc.body.get_text(separator=" ", strip=True) == "hello world"


def test_get_text_skips_whitespace_nodes_when_stripped():
    doc = parse_html("<div>\n  <p>a</p>\n  <p>b</p>\n</div>")
    assert doc.get_text(separator="\n", strip=True) == "a\nb"
    # unstripped keeps raw whitespace nodes
    assert "\n  " in doc.get_text()


def test_void_elements_do_not_swallow_siblings():
    doc = parse_html("<div><img src='x.png'>after<br>more</div>")
    assert doc.get_text(strip=True) == "aftermore"


def test_select_tag_class_id():
    html = ('<div id="content" class="a b">x</div>'
            '<div class="b">y</div><span class="a">z</span>')
    doc = parse_html(html)
    assert [e.get_text() for e in doc.select(".b")] == ["x", "y"]
    assert [e.get_text() for e in doc.select("div.a")] == ["x"]
    assert doc.select_one("#content").get_text() == "x"
    assert [e.get_text() for e in doc.select("span")] == ["z"]


def test_select_class_matches_whole_tokens_only():
    doc = parse_html('<div class="ads">x</div><div class="ad">y</div>')
    assert [e.get_text() for e in doc.select(".ad")] == ["y"]


def test_select_attribute_ops():
    html = ("<a href='http://x.com'>1</a>"
            "<span style='text-decoration: underline; color: red'>2</span>"
            "<div itemprop=\"articleBody\">3</div>"
            "<div data-test-id='pin-title'>4</div>")
    doc = parse_html(html)
    assert [e.get_text() for e in doc.select("a[href*='http']")] == ["1"]
    assert [e.get_text() for e in
            doc.select("span[style*='text-decoration: underline']")] == ["2"]
    assert [e.get_text() for e in
            doc.select('[itemprop="articleBody"]')] == ["3"]
    assert [e.get_text() for e in
            doc.select("[data-test-id='pin-title']")] == ["4"]


def test_select_comma_and_descendant():
    html = ('<div class="x"><p>in</p></div><p>out</p>'
            '<div class="hdr">h</div>')
    doc = parse_html(html)
    assert [e.get_text() for e in doc.select(".x p")] == ["in"]
    got = [e.get_text() for e in doc.select(".hdr, .x p")]
    assert got == ["in", "h"]  # document order


def test_select_adjacent_sibling():
    html = ("<div data-test-id='pinner-avatar'>av</div><div>name</div>"
            "<div>other</div>")
    doc = parse_html(html)
    got = doc.select("[data-test-id='pinner-avatar'] + div")
    assert [e.get_text() for e in got] == ["name"]


def test_decompose_mutates_in_place():
    doc = parse_html("<div><nav>menu</nav><p>body</p></div>")
    for el in doc.select("nav"):
        el.decompose()
    assert doc.get_text(strip=True) == "body"


def test_unclosed_tags_recover():
    doc = parse_html("<div><p>one<p>two</div><span>three</span>")
    assert "one" in doc.get_text() and "three" in doc.get_text()


def test_entities_converted():
    doc = parse_html("<p>a &amp; b</p>")
    assert doc.get_text(strip=True) == "a & b"
