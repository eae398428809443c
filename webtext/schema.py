"""Arrow schemas for the interleaved-document tables.

Input schema is fixed by BASELINE.json ``input_hint``:
``(doc_id: string, spans: list<struct<kind, text, media_ref, offset>>)``.
Output rows carry the same span layout plus status/lineage columns; the
per-row correctness invariant is span-sequence equality
``(kind, text, media_ref, order)`` against the oracle.
"""

from __future__ import annotations

import pyarrow as pa

SPAN_STRUCT = pa.struct([
    ("kind", pa.string()),       # in: html|text|markdown|pdf|image|video
    ("text", pa.string()),       # payload for text-bearing kinds, '' for media
    ("media_ref", pa.string()),  # opaque ref for media kinds, '' for text
    ("offset", pa.int32()),      # dense 0-based position within the document
])

INPUT_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("spans", pa.list_(SPAN_STRUCT)),
])

# extraction output: kind ∈ {'text','media'}, offset = output sequence index
OUTPUT_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("spans", pa.list_(SPAN_STRUCT)),
    ("status", pa.string()),       # ok | timeout (kept rows only)
    ("method", pa.string()),       # comma-joined branch lineage labels
    ("n_spans_in", pa.int32()),
    ("n_chars_out", pa.int64()),
])

# reject manifest rows (replaces the reference's URL-file rewrite, E14)
REJECT_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("status", pa.string()),       # failed | error_pattern
    ("messages", pa.list_(pa.string())),
])
