"""PDF text extraction — operator E3.

The reference downloads the PDF and walks PyPDF2 pages, concatenating
non-empty page texts with ``\\n`` and skipping pages whose extraction
raises (ref common_scripts/web_text_extractor_ver1.5.py:122-159).

Two payload routes, dispatched on the payload prefix:

* synthetic page model (default corpus shape, FIXTURES.md ``pdf-doc``):
  pages separated by ``\\f``, the literal page ``<corrupt>`` stands in
  for a page whose ``extract_text()`` raises.
* ``inline:<base64>`` BINARY payload — real PDF bytes.  Decoded by
  pypdf when the wheel imports (probed ONCE at module import, the
  auto_decoder_cls pattern from functions/media.py): PdfReader page
  walk, pages that raise are skipped, matching ref:139-144.  Without
  the wheel, a pure-stdlib parser (``_mini_pdf_pages``) handles the
  UNCOMPRESSED fixture-shaped PDFs this repo generates (one content
  stream per page, literal-string Tj operators) so the binary seam is
  exercised with real bytes in codec-less environments too.

Everything downstream (page loop, failure taxonomy, cleanup application
at the dispatcher) is payload-route independent.
"""

from __future__ import annotations

import base64
import re

from . import rules

try:  # probe once at import — workers ship this module by value
    from pypdf import PdfReader as _PdfReader
except ImportError:
    try:
        from PyPDF2 import PdfReader as _PdfReader  # reference's wheel
    except ImportError:
        _PdfReader = None

_INLINE = "inline:"
# literal PDF string body: escaped pairs or anything but \ ( )
_TJ_RE = re.compile(rb"\(((?:\\.|[^\\()])*)\)\s*Tj")
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\s*endstream", re.S)


def _unescape_pdf_string(body: bytes) -> str:
    out = []
    i = 0
    while i < len(body):
        c = body[i:i + 1]
        if c == b"\\" and i + 1 < len(body):
            nxt = body[i + 1:i + 2]
            out.append({b"n": b"\n", b"r": b"\r", b"t": b"\t",
                        b"(": b"(", b")": b")",
                        b"\\": b"\\"}.get(nxt, nxt))
            i += 2
        else:
            out.append(c)
            i += 1
    return b"".join(out).decode("latin-1")


def _mini_pdf_pages(raw: bytes):
    """Page texts of an UNCOMPRESSED fixture-shaped PDF: one content
    stream per page in file order, text carried by literal-string Tj
    operators.  Streams with no Tj (fonts, xobjects) contribute
    nothing — like an empty ``extract_text()`` in the reference."""
    for m in _STREAM_RE.finditer(raw):
        texts = _TJ_RE.findall(m.group(1))
        if texts:
            yield "\n".join(_unescape_pdf_string(t) for t in texts)


def _iter_pages_binary(raw: bytes):
    """pypdf page walk when the wheel exists (pages whose extraction
    raises are skipped — ref:139-144), else the mini parser."""
    if _PdfReader is not None:
        import io

        reader = _PdfReader(io.BytesIO(raw))
        for page in reader.pages:
            try:
                yield page.extract_text() or ""
            except Exception:
                continue  # corrupt page: skip, keep going (ref:142-144)
    else:
        yield from _mini_pdf_pages(raw)


def iter_pages(payload: str):
    """Yield per-page text — binary route for inline payloads, the
    synthetic page model otherwise."""
    if payload.startswith(_INLINE):
        yield from _iter_pages_binary(
            base64.b64decode(payload[len(_INLINE):]))
        return
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


def encode_pdf(pages: list[str]) -> bytes:
    """A REAL, minimal, valid uncompressed PDF — pure stdlib,
    deterministic: one page object + one literal-string-Tj content
    stream per entry, correct xref offsets.  Fixture generator for the
    binary route (pypdf opens these when present; _mini_pdf_pages
    decodes them everywhere)."""

    def esc(s: str) -> bytes:
        return (s.replace("\\", "\\\\").replace("(", "\\(")
                 .replace(")", "\\)").encode("latin-1", "replace"))

    objs: list[bytes] = []  # 1-indexed bodies, object i = objs[i-1]
    n_font = 3 + 2 * len(pages)
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(len(pages)))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(f"<< /Type /Pages /Kids [{kids}] "
                f"/Count {len(pages)} >>".encode())
    for i, text in enumerate(pages):
        objs.append(
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Contents {4 + 2 * i} 0 R /Resources << /Font "
            f"<< /F1 {n_font} 0 R >> >> >>".encode())
        stream = (b"BT /F1 12 Tf 72 720 Td (" + esc(text)
                  + b") Tj ET")
        objs.append(b"<< /Length " + str(len(stream)).encode()
                    + b" >>\nstream\n" + stream + b"\nendstream")
    objs.append(b"<< /Type /Font /Subtype /Type1 "
                b"/BaseFont /Helvetica >>")

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n".encode())
    return bytes(out)
