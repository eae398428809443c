"""PDF text extraction — operator E3, over the synthetic page model.

The reference downloads the PDF and walks PyPDF2 pages, concatenating
non-empty page texts with ``\\n`` and skipping pages whose extraction
raises (ref:122-159).  This container has no PDF library and the input
table materializes PDF payloads as spans of ``kind='pdf'`` whose ``text``
carries the deterministic per-page text (FIXTURES.md ``pdf-doc``): pages
are separated by ``\\f`` and the literal page ``<corrupt>`` stands in for
a page whose ``extract_text()`` raises.

A real deployment swaps ``iter_pages`` for a pypdf-backed reader over the
binary payload; everything downstream (page loop, failure taxonomy,
cleanup application at the dispatcher) is unchanged.
"""

from __future__ import annotations

from . import rules


def iter_pages(payload: str):
    """Yield per-page text from the synthetic page model."""
    for page in payload.split(rules.PDF_PAGE_SEP):
        if page == rules.PDF_CORRUPT_PAGE:
            # a corrupt page raises in the reference and is skipped
            # (ref:142-144)
            continue
        yield page


def extract_pdf_text(payload: str, url: str) -> str:
    """Join non-empty page texts with \\n; empty result → failure message.

    ref:136-151.  The returned failure string intentionally does NOT
    contain the dispatcher's failure marker ("失敗しました"), so the
    dispatcher cleans it up and keeps it — reproducing the reference's
    empty-PDF quirk (ref:365-368 + ref:1592-1617: after cleanup strips the
    URL, the exact-template filter no longer matches).
    """
    text_content = ""
    for page_text in iter_pages(payload):
        if page_text:
            text_content += page_text + "\n"
    if text_content.strip():
        return text_content.strip()
    return f"PDFからテキストを抽出できませんでした: {url}"
