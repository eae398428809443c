"""E1 dispatcher + E12/E13 taxonomy + document-assembly tests."""

import pytest

from webtext.oracle import (
    classify_failure,
    detect_browser_errors,
    extract_document,
    extract_span,
)
from webtext.oracle.rules import (
    BROWSER_ERROR_PATTERNS,
    FAILURE_TEMPLATES_WITH_URL,
    TIMEOUT_SENTINEL,
)

URL = "https://example-news.com/a/1"


# -- per-kind dispatch ------------------------------------------------------

def test_pdf_pages_joined_and_corrupt_skipped():
    payload = "page one text\f<corrupt>\fpage two text"
    r = extract_span("pdf", payload, "", URL)
    assert r.status == "ok"
    assert r.text == "page one text\npage two text"


def test_pdf_empty_yields_kept_stub_without_url():
    r = extract_span("pdf", "\f\f", "", URL)
    # the reference quirk: the empty-PDF message is cleaned (URL stripped)
    # and KEPT (ref:365-368 + template filter mismatch)
    assert r.status == "ok"
    assert r.text == "PDFからテキストを抽出できませんでした:"


def test_pdf_binary_route_real_two_page_fixture():
    """The inline-binary route decodes a REAL 2-page PDF (encode_pdf:
    valid xref, uncompressed Tj streams).  Without the pypdf wheel the
    pure-stdlib mini parser covers the fixture shape; with it, pypdf
    takes over (parity pinned separately below)."""
    import base64

    from webtext.oracle.pdf import encode_pdf, extract_pdf_text

    raw = encode_pdf(["page one text", "page two (with) \\specials"])
    assert raw.startswith(b"%PDF-1.4") and raw.endswith(b"%%EOF\n")
    payload = "inline:" + base64.b64encode(raw).decode()
    assert extract_pdf_text(payload, URL) == \
        "page one text\npage two (with) \\specials"
    # all-empty binary PDF → the same kept-stub failure message as the
    # page-model route
    empty = "inline:" + base64.b64encode(encode_pdf([""])).decode()
    assert extract_pdf_text(empty, URL) == \
        f"PDFからテキストを抽出できませんでした: {URL}"
    # dispatcher end-to-end: binary payload rides kind='pdf' unchanged
    r = extract_span("pdf", payload, "", URL)
    assert r.status == "ok"
    assert "page one text" in r.text


def test_pdf_binary_route_pypdf_parity():
    """When the pypdf wheel exists, its page walk must read the same
    texts from the fixture as the mini parser (skipped when absent)."""
    pytest.importorskip("pypdf")
    from webtext.oracle.pdf import _mini_pdf_pages, encode_pdf
    from webtext.oracle.pdf import _iter_pages_binary

    raw = encode_pdf(["alpha bravo", "charlie delta"])
    got = [t.strip() for t in _iter_pages_binary(raw)]
    assert got == list(_mini_pdf_pages(raw))


def test_markdown_generic_gets_cleanup():
    body = ("Title: x\nMarkdown Content:\n"
            "real content words here beyond the fifty char gate easily "
            "with https://strip.example.com/me inside")
    r = extract_span("markdown", body, "", "https://r.example.ai/d/1")
    assert r.status == "ok"
    assert "strip.example.com" not in r.text       # cleanup ran
    assert "Title:" not in r.text


def test_markdown_special_domain_raw_no_cleanup():
    body = ("real content words here beyond the fifty char gate easily "
            "with https://keep.example.com/me inside for proof")
    r = extract_span("markdown", body, "", "https://youtube.com/watch/1")
    assert r.status == "ok"
    assert "https://keep.example.com/me" in r.text  # NO cleanup (ref:398-401)


def test_markdown_short_special_domain_failure():
    r = extract_span("markdown", "tiny", "", "https://youtube.com/watch/1")
    assert r.status == "failed"
    assert r.message == ("特定ドメインの抽出に失敗しました (Jina & Selenium): "
                         "https://youtube.com/watch/1")


def test_markdown_short_yahoo_image_failure():
    url = "https://search.yahoo.co.jp/image/search?p=x"
    r = extract_span("markdown", "tiny", "", url)
    assert r.message.startswith("Yahoo画像検索の抽出に失敗しました")


def test_text_timeout_sentinel_kept_verbatim():
    r = extract_span("text", TIMEOUT_SENTINEL, "", URL)
    assert (r.status, r.text) == ("timeout", TIMEOUT_SENTINEL)


def test_text_plain_gets_cleanup():
    r = extract_span("text", "hello https://x.example.com/y world", "", URL)
    assert r.status == "ok"
    assert r.text == "hello  world"


def test_html_empty_page_fails_with_template():
    r = extract_span("html", "<html><body></body></html>", "", URL)
    assert r.status == "failed"
    assert r.message == f"すべての抽出方法でテキストを抽出できませんでした: {URL}"


def test_html_domain_www_kept_for_rule_dispatch():
    # requests-path domain KEEPS www (ref:519 quirk) so www.nikkansports.com
    # rules fire on the full host
    html = ('<html><body><div class="articleText">' + "word " * 30
            + "</div></body></html>")
    r = extract_span("html", html, "",
                     "https://www.nikkansports.com/a/1.html")
    assert r.method == "domain_rule"


def test_html_short_content_retry_keeps_best():
    html = "<html><body><main>just a few words</main></body></html>"
    r = extract_span("html", html, "", URL)
    assert r.status == "ok"
    assert "just a few words" in r.text


def test_special_handler_success_cleans_and_returns():
    html = ("<html><body><article><div>tweet text with "
            "https://strip.example.com/link inside</div></article>"
            "</body></html>")
    r = extract_span("html", html, "", "https://x.com/u/status/1")
    assert r.method == "special:twitter"
    assert "strip.example.com" not in r.text


def test_special_handler_empty_falls_back_to_generic():
    html = ("<html><body><main><p>" + "word " * 30
            + "</p></main></body></html>")
    r = extract_span("html", html, "", "https://x.com/u/status/1")
    assert r.method == "generic_selector"


def test_instagram_stub_message_kept_via_quirk():
    html = "<html><body><article><span>tiny</span></article></body></html>"
    url = "https://instagram.com/p/1/"
    r = extract_span("html", html, "", url)
    assert r.status == "ok"
    assert r.text == "Instagramポストからテキストが見つかりませんでした:"


def test_unknown_kind_raises():
    with pytest.raises(ValueError):
        extract_span("audio", "", "ref", URL)


# -- failure taxonomy -------------------------------------------------------

def test_classify_all_templates():
    for template in FAILURE_TEMPLATES_WITH_URL:
        assert classify_failure(template.format(URL), URL) == "failure_template"


def test_classify_prefix_and_sentinel():
    assert classify_failure("エラーが発生しました: boom", URL) == "failure_prefix"
    assert classify_failure(TIMEOUT_SENTINEL, URL) is None
    assert classify_failure(None, URL) == "none_result"
    assert classify_failure("normal text", URL) is None


def test_detect_browser_errors_each_pattern():
    for pat in BROWSER_ERROR_PATTERNS:
        assert detect_browser_errors(f"prefix {pat} suffix")
    assert not detect_browser_errors("clean text")


def test_error_pattern_beats_template_match():
    text = "ERR_TIMED_OUT " + FAILURE_TEMPLATES_WITH_URL[0].format(URL)
    assert classify_failure(text, URL) == "error_pattern"


# -- document assembly ------------------------------------------------------

def _span(kind, text, ref, off):
    return {"kind": kind, "text": text, "media_ref": ref, "offset": off}


def test_media_passthrough_order_and_reindex():
    spans = [
        _span("image", "", "media://d/0", 0),
        _span("text", "some real text content for the doc", "", 1),
        _span("video", "", "media://d/2", 2),
    ]
    r = extract_document("https://mixed.example.com/d", spans)
    assert r.status == "ok"
    assert [(s["kind"], s["media_ref"], s["offset"]) for s in r.spans] == [
        ("media", "media://d/0", 0),
        ("text", "", 1) if False else ("text", "", 1),
        ("media", "media://d/2", 2),
    ]


def test_spans_processed_in_offset_order_even_if_shuffled():
    spans = [
        _span("text", "second chunk of text here", "", 1),
        _span("text", "first chunk of text here", "", 0),
    ]
    r = extract_document("https://t.example.com/d", spans)
    assert r.spans[0]["text"].startswith("first")


def test_media_only_doc_is_ok():
    spans = [_span("image", "", "media://d/0", 0)]
    r = extract_document("https://m.example.com/d", spans)
    assert r.status == "ok" and len(r.spans) == 1


def test_all_text_failed_rejects_doc_and_drops_media():
    spans = [
        _span("html", "<html><body></body></html>", "", 0),
        _span("image", "", "media://d/1", 1),
    ]
    r = extract_document("https://f.example.com/d", spans)
    assert r.status == "failed"
    assert r.spans == []
    assert len(r.failures) == 1


def test_error_pattern_rejects_whole_doc():
    spans = [
        _span("text", "fine text content here", "", 0),
        _span("text", "bad ERR_TIMED_OUT content", "", 1),
    ]
    r = extract_document("https://e.example.com/d", spans)
    assert r.status == "error_pattern"
    assert r.spans == []


def test_timeout_doc_kept():
    spans = [_span("text", TIMEOUT_SENTINEL, "", 0)]
    r = extract_document("https://t.example.com/d", spans)
    assert r.status == "timeout"
    assert r.spans[0]["text"] == TIMEOUT_SENTINEL
