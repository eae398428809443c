"""Link-mining pipeline tests (U1/U2/U3/U9/U5 shapes)."""

import pytest

from webtext.pipelines.links import (
    dedup_links,
    extract_links,
    is_excluded_url,
    is_navigation_text,
    top_links_per_domain,
)


def _doc(doc_id, html):
    return {"doc_id": doc_id,
            "spans": [{"kind": "html", "text": html, "media_ref": "",
                       "offset": 0}]}


HTML_A = """<html><body>
<a href="https://news.site-a.com/article/1">a real article headline</a>
<a href="https://google.com/search?q=x">search result page</a>
<a href="https://site-b.net/privacy">privacy policy page</a>
<a href="https://site-b.net/story/2">another story worth reading</a>
<a href="https://site-c.org/style.css">stylesheet</a>
<a href="https://nav.example.com/x">ログイン</a>
<a href="https://short.example.com/y">ab</a>
</body></html>"""

HTML_B = """<html><body>
<a href="https://news.site-a.com/article/1">duplicate of the first link</a>
<a href="https://news.site-a.com/article/2">second site-a article</a>
<a href="https://news.site-a.com/article/3">third site-a article</a>
<a href="https://news.site-a.com/article/4">fourth site-a article</a>
</body></html>"""


@pytest.fixture(scope="module")
def links(ray_session):
    import ray.data

    ds = ray.data.from_items([_doc("https://x.com/d/1", HTML_A),
                              _doc("https://x.com/d/2", HTML_B)])
    return extract_links(ds)


def test_predicates():
    assert is_excluded_url("https://google.com/search?q=a")
    assert is_excluded_url("https://site.net/terms-of-use")
    assert is_excluded_url("https://cdn.site.com/app.js")
    assert not is_excluded_url("https://news.site.com/article")
    assert is_navigation_text("ログイン")
    assert is_navigation_text("ab")
    assert not is_navigation_text("a real headline")


def test_extract_links_filters_and_ranks(links):
    rows = links.take_all()
    urls = [r["url"] for r in rows]
    assert "https://google.com/search?q=x" not in urls
    assert "https://site-b.net/privacy" not in urls
    assert "https://site-c.org/style.css" not in urls
    assert "https://nav.example.com/x" not in urls       # nav text
    assert "https://short.example.com/y" not in urls     # ≤2 chars
    d1 = sorted((r["rank"], r["url"]) for r in rows
                if r["doc_id"].endswith("/1"))
    assert d1[0] == (0, "https://news.site-a.com/article/1")
    assert d1[1] == (1, "https://site-b.net/story/2")


def test_dedup_first_wins(links):
    rows = dedup_links(links).take_all()
    by_url = {r["url"]: r for r in rows}
    assert len(by_url) == len(rows)               # unique
    # the duplicate resolves to its FIRST occurrence (doc 1, rank 0)
    first = by_url["https://news.site-a.com/article/1"]
    assert first["doc_id"].endswith("/1") and first["rank"] == 0


def test_top_k_per_domain(links):
    rows = top_links_per_domain(dedup_links(links), k=3).take_all()
    site_a = [r for r in rows if r["target_domain"] == "news.site-a.com"]
    assert len(site_a) == 3                       # capped from 4
    assert {r["url"] for r in site_a} == {
        "https://news.site-a.com/article/1",
        "https://news.site-a.com/article/2",
        "https://news.site-a.com/article/3"}


# -- engine-specific miners (U4/U6/U7/U8) -----------------------------------

def test_yahoo_card_miner_branches():
    from webtext.dom import parse_html
    from webtext.pipelines.links import mine_yahoo_cards, serp_fixture_docs

    doc = parse_html(serp_fixture_docs()[0]["spans"][0]["text"])
    urls = mine_yahoo_cards(doc)
    # ping decoded, skip-sections skipped, excludes applied, ordered dedup
    assert urls == ["https://example.com/a1", "https://example.org/pinged"]


def test_yahoo_ping_decode():
    from webtext.pipelines.links import decode_ping_url

    assert decode_ping_url(
        "https://rd.yahoo.co.jp/x/*-https%3A//ex.org/p?a=1") \
        == "https://ex.org/p?a=1"
    assert decode_ping_url("https://plain.example/x") \
        == "https://plain.example/x"


def test_yahoo_exclude_rules():
    from webtext.pipelines.links import is_excluded_url_yahoo

    assert is_excluded_url_yahoo("https://search.yahoo.co.jp/x?rs=4")
    assert is_excluded_url_yahoo("https://search.yahoo.co.jp/y?sqs=1")
    assert is_excluded_url_yahoo("https://shopping.yahoo.co.jp/item")
    assert not is_excluded_url_yahoo("https://detail.chiebukuro.yahoo.co.jp/q")
    assert not is_excluded_url_yahoo("https://example.com/ok")


def test_yahoo_related_miner():
    from webtext.dom import parse_html
    from webtext.pipelines.links import (mine_yahoo_related,
                                         serp_fixture_docs)

    doc = parse_html(serp_fixture_docs()[0]["spans"][0]["text"])
    assert mine_yahoo_related(doc) == [
        "https://search.yahoo.co.jp/search?p=rel1",
        "https://search.yahoo.co.jp/search?p=rel2"]


def test_google_related_primary_and_fallback():
    from webtext.dom import parse_html
    from webtext.pipelines.links import (mine_google_related,
                                         serp_fixture_docs)

    docs = serp_fixture_docs()
    primary = parse_html(docs[1]["spans"][0]["text"])
    assert mine_google_related(primary) == [
        "https://www.google.com/search?q=rel+one",
        "https://www.google.com/search?q=rel+two"]
    fallback = parse_html(docs[2]["spans"][0]["text"])
    assert mine_google_related(fallback) == [
        "https://www.google.com/search?q=fallback+one",
        "https://www.google.com/search?q=fallback+two"]


def test_extract_search_links_dataset_stage(ray_session):
    import pyarrow as pa
    import ray.data

    from webtext.pipelines.links import (extract_search_links,
                                         serp_fixture_docs)
    from webtext.schema import INPUT_SCHEMA

    table = pa.Table.from_pylist(serp_fixture_docs(), schema=INPUT_SCHEMA)
    rows = extract_search_links(
        ray.data.from_arrow(table), "yahoo").take_all()
    got = sorted((r["doc_id"], r["rank"], r["url"]) for r in rows)
    assert got == [("serp://yahoo/1", 0, "https://example.com/a1"),
                   ("serp://yahoo/1", 1, "https://example.org/pinged")]


# -- U1 literal Google result miner (google_url_serch.py ref:97-230) --------
# These hand-written expected URL lists are the INDEPENDENT pin of the
# miner semantics (the search_engine_links golden only pins the Ray
# plumbing — see tools/gen_goldens.py circularity note).

def test_google_results_fixture_branches():
    from webtext.dom import parse_html
    from webtext.pipelines.links import (mine_google_results,
                                         serp_fixture_docs)

    docs = serp_fixture_docs()
    doc = parse_html(docs[3]["spans"][0]["text"])
    # r1 via direct-parent anchor; r2 via div.g container; r3 via
    # ancestor anchor; related-question, footer/nav, maps-exclude,
    # duplicate and linkless h3s all dropped
    assert mine_google_results(doc) == [
        "https://example.com/r1", "https://example.com/r2",
        "https://example.com/r3"]


def test_google_results_main_area_priority_and_fallback():
    from webtext.dom import parse_html
    from webtext.pipelines.links import mine_google_results

    # no #search/#center_col/#rso/#main/.v7W49e → body fallback
    doc = parse_html(
        '<html><body><div class="g">'
        '<a href="https://x.example/a"></a><h3>t</h3></div>'
        '</body></html>')
    assert mine_google_results(doc) == ["https://x.example/a"]
    # h3 outside every main area is not scanned
    doc2 = parse_html(
        '<html><body><div id="search"></div>'
        '<div class="g"><a href="https://x.example/out"></a>'
        '<h3>outside</h3></div></body></html>')
    assert mine_google_results(doc2) == []


def test_google_results_footer_nav_walk():
    from webtext.dom import parse_html
    from webtext.pipelines.links import mine_google_results

    # id substring 'footer', exact botstuff/appbar/hdtb, class
    # substrings footer/navcnt/NKcBbd all suppress the h3
    for attr in ('id="page-footer"', 'id="botstuff"', 'id="appbar"',
                 'id="hdtb"', 'class="sfooter x"', 'class="navcnt"',
                 'class="yNKcBbdz"'):
        doc = parse_html(
            f'<html><body><div id="search"><div {attr}>'
            f'<h3><a href="https://x.example/skip">s</a></h3>'
            f'</div></div></body></html>')
        assert mine_google_results(doc) == [], attr


def test_google_results_related_question_link_recheck():
    from webtext.dom import parse_html
    from webtext.pipelines.links import mine_google_results

    # the h3 sits outside the related-question block, but the resolved
    # container link is inside one → dropped by the link re-check
    doc = parse_html(
        '<html><body><div id="search"><div class="g">'
        '<div class="related-question-pair">'
        '<a href="https://x.example/rq"></a></div>'
        '<h3>heading</h3></div></div></body></html>')
    assert mine_google_results(doc) == []


def test_google_results_js_exclude_substrings():
    from webtext.dom import parse_html
    from webtext.pipelines.links import mine_google_results

    bad = ["https://www.google.com/search?q=x",
           "https://google.com/travel/things",
           "https://support.google.com/websearch",
           "https://policies.google.com/privacy",
           "http://accounts.google.com/signin",
           "https://www.google.com/preferences",
           "https://www.google.com/advanced_search",
           "ftp://example.com/not-http"]
    items = "".join(
        f'<div class="g"><a href="{u}"></a><h3>h{i}</h3></div>'
        for i, u in enumerate(bad))
    doc = parse_html(f'<html><body><div id="search">{items}'
                     f'<div class="g"><a href="https://ok.example/k">'
                     f'</a><h3>keep</h3></div></div></body></html>')
    assert mine_google_results(doc) == ["https://ok.example/k"]
