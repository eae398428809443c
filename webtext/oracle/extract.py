"""Per-document dispatcher — operator E1 — plus the E12/E13 failure
taxonomy and the span/document assembly contract.

This module is the single implementation of the extraction semantics: the
pure-Python oracle used as ground truth in tests AND the inner loop of the
Ray Data extraction actor (webtext.stages.extractor) — one implementation,
two harnesses (SURVEY §7 step 2), so pipeline-vs-oracle equality is by
construction modulo the distributed plumbing.

Dispatch model (adaptation of ref:345-601 to materialized content):
the reference's per-URL fallback chain dispatches on live content-type
and network availability; here content is already materialized as typed
spans, so the chain becomes per-span dispatch on ``kind`` and then the
reference's per-domain / generic stages over the stored payload:

  kind='pdf'      → PDF page walk (E3) → cleanup              (ref:361-368)
  kind='markdown' → markdown normalizer (E4); special domains
                    (youtube / Yahoo image search) return RAW
                    (ref:398-401, no cleanup), all others take
                    the final-resort path WITH cleanup          (ref:568-576)
  kind='html'     → special handlers by URL substring (E8)     (ref:418-442)
                    → generic cascade on the requests-path
                      domain (www KEPT, ref:519 quirk)          (ref:446-529)
                    → dynamic-render fallback on the
                      selenium-path domain (www stripped) with
                      the whole-body strip                      (ref:539-566, 1187-1224)
                    → Pinterest nav-only re-check               (ref:580-591)
                    → cleanup of the surviving text             (ref:593)
  kind='text'     → pre-rendered text: timeout sentinel kept
                    verbatim (ref:1388-1393, 1628-1630), else
                    Pinterest re-check + cleanup
  media kinds     → pass-through spans, order preserved

Per-row invariant (BASELINE.json input_hint): the output spans must match
the oracle under span-sequence equality (kind, text, media_ref, order).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..dom import parse_html
from . import rules
from .cascade import extract_main_content
from .cleanup import DedupBudgetExceeded, cleanup_extracted_text
from .handlers import (
    handle_chiebukuro,
    handle_instagram,
    handle_pinterest,
    handle_twitter,
    is_pinterest_navigation_error,
)
from .markdown import normalize_markdown
from .pdf import extract_pdf_text

# span-level statuses
OK = "ok"
TIMEOUT = "timeout"
FAILED = "failed"


@dataclass
class SpanResult:
    status: str           # ok | timeout | failed
    text: str             # extracted text ('' when failed)
    method: str           # lineage label of the branch that produced it
    message: str = ""     # failure message when failed


@dataclass
class DocResult:
    doc_id: str
    status: str           # ok | timeout | failed | error_pattern
    spans: list[dict] = field(default_factory=list)
    methods: list[str] = field(default_factory=list)
    failures: list[str] = field(default_factory=list)


# ---------------------------------------------------------------------------
# failure taxonomy — E12/E13
# ---------------------------------------------------------------------------

def detect_browser_errors(text: str) -> bool:
    """Substring match of the frozen error patterns (ref:1408-1455)."""
    if not text:
        return False
    return any(pat in text for pat in rules.BROWSER_ERROR_PATTERNS)


def classify_failure(text: str | None, url: str) -> str | None:
    """Returns a reject reason, or None when the row is kept.

    Mirrors the save_results filter order (ref:1569-1630): None result →
    error patterns → exact URL-templated messages → prefix match; the
    timeout sentinel is explicitly exempt.
    """
    if text is None:
        return "none_result"
    if detect_browser_errors(text):
        return "error_pattern"
    for template in rules.FAILURE_TEMPLATES_WITH_URL:
        if text == template.format(url):
            return "failure_template"
    if text == rules.TIMEOUT_SENTINEL:
        return None
    for prefix in rules.FAILURE_PREFIXES:
        if text.startswith(prefix):
            return "failure_prefix"
    return None


# ---------------------------------------------------------------------------
# per-span extraction
# ---------------------------------------------------------------------------

def _selenium_equivalent(html: str, domain: str) -> str | None:
    """Dynamic-render fallback (E7, ref:1187-1224) over stored HTML.

    Fresh parse, cascade (which mutates the DOM), then — if short — the
    body-wide strip on the SAME mutated DOM, keeping the longer text.
    Returns stripped text or None, like the reference.
    """
    doc = parse_html(html)
    text, _method = extract_main_content(doc, domain)
    if not text or len(text.strip()) < rules.SHORT_CONTENT_THRESHOLD:
        for tag in doc.select(rules.UNWANTED_SELENIUM_BODY):
            tag.decompose()
        body = doc.body
        body_text = (body.get_text(separator="\n", strip=True)
                     if body is not None else None)
        if body_text and (not text or len(body_text) > len(text)):
            text = body_text
    return text.strip() if text and text.strip() else None


def _finalize(text: str, url: str, method: str,
              html_for_recheck: str | None) -> SpanResult:
    """Final-return stage (ref:580-593): Pinterest nav-only re-check, then
    cleanup."""
    if (rules.PINTEREST_SUBSTR in url
            and is_pinterest_navigation_error(text)):
        pinterest_result = handle_pinterest(
            parse_html(html_for_recheck or ""), url)
        if (pinterest_result
                and rules.FAILURE_MARKER not in pinterest_result
                and pinterest_result.strip()):
            return SpanResult(OK, cleanup_extracted_text(pinterest_result),
                             "special:pinterest")
    return SpanResult(OK, cleanup_extracted_text(text.strip()), method)


def _extract_html_span(url: str, html: str) -> SpanResult:
    special_handler_failed_message = None

    # 2. special handlers (ref:418-442) — fresh parse per handler, as each
    # reference handler drives its own page load
    special_handler_result = None
    is_special_handled = False
    handler_name = ""
    if rules.CHIEBUKURO_SUBSTR in url:
        is_special_handled = True
        handler_name = "chiebukuro"
        special_handler_result = handle_chiebukuro(parse_html(html), url)
    elif rules.INSTAGRAM_SUBSTR in url:
        is_special_handled = True
        handler_name = "instagram"
        special_handler_result = handle_instagram(parse_html(html), url)
    elif any(s in url for s in rules.TWITTER_SUBSTRS):
        is_special_handled = True
        handler_name = "twitter"
        special_handler_result = handle_twitter(parse_html(html), url)

    if is_special_handled:
        if (special_handler_result
                and rules.FAILURE_MARKER not in special_handler_result
                and special_handler_result.strip()):
            return SpanResult(
                OK, cleanup_extracted_text(special_handler_result),
                f"special:{handler_name}")
        if (special_handler_result
                and rules.FAILURE_MARKER in special_handler_result):
            special_handler_failed_message = special_handler_result

    # 3. requests-path extraction: domain keeps www (ref:519 quirk)
    extracted_text = None
    method = ""
    content, m = extract_main_content(
        parse_html(html), rules.domain_keep_www(url))
    if content and len(content.strip()) >= rules.SHORT_CONTENT_THRESHOLD:
        extracted_text = content.strip()
        method = m
    else:
        extracted_text = content if content else None
        method = m if content else ""
        # 4. dynamic-render fallback: domain strips www (ref:1206)
        selenium_result = _selenium_equivalent(
            html, rules.domain_strip_www(url))
        if (selenium_result
                and len(selenium_result.strip())
                >= rules.SHORT_CONTENT_THRESHOLD):
            extracted_text = selenium_result
            method = "selenium_equiv"
        else:
            current = extracted_text if extracted_text else ""
            selenium_res = selenium_result if selenium_result else ""
            best = (selenium_res if len(selenium_res) > len(current)
                    else current)
            if best:
                if best is selenium_res:
                    method = "selenium_equiv"
                extracted_text = best
            else:
                extracted_text = None
        # 5. final-resort markdownizer (ref:568-576) needs remote content;
        # html spans have none materialized → skipped.

    if extracted_text and extracted_text.strip():
        return _finalize(extracted_text, url, method, html)
    if special_handler_failed_message:
        return SpanResult(FAILED, "", f"special:{handler_name}",
                          special_handler_failed_message)
    return SpanResult(
        FAILED, "", "none",
        f"すべての抽出方法でテキストを抽出できませんでした: {url}")


def _extract_markdown_span(url: str, payload: str) -> SpanResult:
    is_target_domain = any(d in url for d in rules.JINA_FIRST_DOMAINS)
    is_yahoo_image = url.startswith(rules.YAHOO_IMAGE_SEARCH_PREFIX)
    normalized = normalize_markdown(payload)
    if is_target_domain or is_yahoo_image:
        # special-domain path returns the markdownizer result RAW
        # (ref:398-401 — no cleanup), else the Jina&Selenium failure
        if normalized:
            return SpanResult(OK, normalized, "markdown:raw")
        label = "特定ドメイン" if is_target_domain else "Yahoo画像検索"
        return SpanResult(
            FAILED, "", "markdown",
            f"{label}の抽出に失敗しました (Jina & Selenium): {url}")
    # generic path: final-resort markdownizer WITH cleanup (ref:576)
    if normalized:
        return SpanResult(OK, cleanup_extracted_text(normalized),
                          "markdown:final")
    return SpanResult(
        FAILED, "", "markdown",
        f"すべての抽出方法でテキストを抽出できませんでした: {url}")


def _extract_text_span(url: str, payload: str) -> SpanResult:
    if payload == rules.TIMEOUT_SENTINEL:
        # the timeout sentinel row is KEPT verbatim (ref:1393, 1628-1630)
        return SpanResult(TIMEOUT, payload, "timeout")
    if payload and payload.strip():
        return _finalize(payload, url, "plain", None)
    return SpanResult(
        FAILED, "", "none",
        f"すべての抽出方法でテキストを抽出できませんでした: {url}")


def extract_span(kind: str, text: str, media_ref: str, url: str) -> SpanResult:
    try:
        return _extract_span_inner(kind, text, media_ref, url)
    except DedupBudgetExceeded:
        # deterministic analogue of the reference's 600 s per-document
        # timeout (ref:1388-1393): the sentinel row is KEPT
        return SpanResult(TIMEOUT, rules.TIMEOUT_SENTINEL, "timeout:budget")


def _extract_span_inner(kind: str, text: str, media_ref: str,
                        url: str) -> SpanResult:
    if kind == "pdf":
        pdf_text = extract_pdf_text(text, url)
        if pdf_text and rules.FAILURE_MARKER not in pdf_text:
            # includes the empty-PDF stub message, which survives cleanup
            # minus its URL — the reference's quirk (ref:365-368)
            return SpanResult(OK, cleanup_extracted_text(pdf_text), "pdf")
        return SpanResult(FAILED, "", "pdf", pdf_text)
    if kind == "markdown":
        return _extract_markdown_span(url, text)
    if kind == "html":
        return _extract_html_span(url, text)
    if kind == "text":
        return _extract_text_span(url, text)
    raise ValueError(f"not a text-bearing kind: {kind!r}")


# ---------------------------------------------------------------------------
# per-document assembly
# ---------------------------------------------------------------------------

def extract_document(doc_id: str, spans: list[dict]) -> DocResult:
    """Run the chain over every span, in offset order.

    Document status:
      * 'error_pattern' — any produced text matches E12 → whole doc
        rejected (mirrors ref:1583-1586 dropping the URL);
      * 'ok'            — ≥1 text-bearing span succeeded, or the doc is
        media-only;
      * 'timeout'       — kept (sentinel spans retained, ref:1628-1630);
      * 'failed'        — every text-bearing span failed (row dropped to
        the reject manifest, mirroring ref:1632-1636).
    Output spans are re-indexed densely; media spans pass through in
    original relative order.
    """
    out_spans: list[dict] = []
    methods: list[str] = []
    failures: list[str] = []
    any_text_ok = False
    any_text_bearing = False
    any_timeout = False
    error_pattern = False

    for span in sorted(spans, key=lambda s: s["offset"]):
        kind = span["kind"]
        if kind in rules.MEDIA_KINDS:
            out_spans.append(
                {"kind": "media", "text": "",
                 "media_ref": span["media_ref"]})
            continue
        any_text_bearing = True
        result = extract_span(kind, span["text"], span["media_ref"], doc_id)
        methods.append(result.method)
        if result.status == OK:
            if detect_browser_errors(result.text):
                error_pattern = True
                failures.append("error_pattern")
                continue
            any_text_ok = True
            out_spans.append(
                {"kind": "text", "text": result.text, "media_ref": ""})
        elif result.status == TIMEOUT:
            any_timeout = True
            out_spans.append(
                {"kind": "text", "text": result.text, "media_ref": ""})
        else:
            failures.append(result.message)

    if error_pattern:
        status = "error_pattern"
    elif any_text_ok or not any_text_bearing:
        status = OK
    elif any_timeout:
        status = TIMEOUT
    else:
        status = FAILED

    if status in ("failed", "error_pattern"):
        out_spans = []
    for i, s in enumerate(out_spans):
        s["offset"] = i

    return DocResult(doc_id=doc_id, status=status, spans=out_spans,
                     methods=methods, failures=failures)
