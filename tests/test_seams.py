"""Wheel-gated deployment-seam mode report (round-4 verdict item 7).

Three seams probe for wheels the reference stack uses but this
container does not ship (pypdf/PyPDF2 for the PDF extractor, PIL for
media decode, lance for the production reader).  This test ASSERTS the
active mode of each seam and PRINTS it, so a future environment
upgrade (a wheel appearing) is noticed the moment the suite runs — the
seam then starts exercising the real codec path and this report says
so, instead of the fallback silently remaining in use.

Each assertion accepts BOTH modes: what is pinned is that the probe
resolves to a definite, working mode, not which wheel happens to be
installed.
"""

from __future__ import annotations


def test_pdf_seam_mode_report():
    """oracle/pdf.py probes pypdf then PyPDF2 at import; absent both,
    the stdlib mini-parser handles real PDF bytes."""
    from webtext.oracle import pdf

    mode = ("real:" + pdf._PdfReader.__module__
            if pdf._PdfReader is not None else "fallback:stdlib-mini")
    print(f"[seam] pdf-extract mode = {mode}")
    if pdf._PdfReader is None:
        # the fallback must still extract from real PDF bytes (the
        # repo's own well-formed encoder output)
        import base64
        raw = pdf.encode_pdf(["hello seam"])
        payload = "inline:" + base64.b64encode(raw).decode()
        assert "hello seam" in pdf.extract_pdf_text(
            payload, "https://example.com/a.pdf")
    else:  # pragma: no cover - wheel-present environments only
        assert callable(pdf._PdfReader)


def test_media_seam_mode_report():
    """functions/media.py routes to PilDecoder when PIL imports,
    FakeDecoder otherwise (auto_decoder_cls)."""
    from webtext.functions import media

    cls = media.auto_decoder_cls()
    try:
        import PIL  # noqa: F401
        expect = "PilDecoder"
    except ImportError:
        expect = "FakeDecoder"
    print(f"[seam] media-decode mode = {cls.__name__}")
    assert cls.__name__ == expect
    # whichever mode: the decoder contract must hold on inline bytes
    # (FakeDecoder) or be the PIL class (real mode)
    assert cls().decode is not None


def test_lance_seam_mode_report():
    """sources/io.py's read_documents_lance is a drop-in for the
    parquet-fragment reader when the lance wheel exists; absent it,
    the documented ImportError names the tested stand-in."""
    from webtext.sources import io as wio

    try:
        import lance  # noqa: F401
        has_lance = True
    except ImportError:
        has_lance = False
    print(f"[seam] reader mode = "
          f"{'lance' if has_lance else 'parquet-fragment stand-in'}")
    if not has_lance:
        import pytest
        with pytest.raises(ImportError, match="read_documents"):
            wio.read_documents_lance("/nonexistent.lance")
    else:  # pragma: no cover - wheel-present environments only
        assert callable(wio.read_documents_lance)
