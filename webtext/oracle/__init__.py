"""Pure-Python oracle extractor: ground truth for span-sequence equality
AND the inner loop of the Ray Data extraction actor (one implementation,
two harnesses — SURVEY.md §7 step 2)."""

from .extract import (  # noqa: F401
    DocResult,
    SpanResult,
    classify_failure,
    detect_browser_errors,
    extract_document,
    extract_span,
)
from .cleanup import cleanup_extracted_text, remove_duplicate_paragraphs  # noqa: F401
from .cascade import extract_main_content  # noqa: F401
from .markdown import normalize_markdown  # noqa: F401
from .pdf import extract_pdf_text  # noqa: F401
