"""webtext — a Ray-Data-native main-content extraction engine.

A from-scratch reimplementation of the extraction capabilities of
sakaki9900/WebText_extraction (reference at /root/reference, read-only)
as a streaming Ray Data pipeline over tables of interleaved text+media
documents: ``(doc_id, spans: list<struct<kind,text,media_ref,offset>>)``.

Layout:
  dom.py        minimal HTML DOM + CSS selector engine (no bs4 in env)
  oracle/       pure-Python extraction semantics (ground truth + actor core)
  schema.py     Arrow schemas for input/output/reject tables
  synth.py      deterministic fixture-corpus generator (FIXTURES.md)
  stages/       Ray Data stages (extraction actor pool, skew handling)
  sources/      table IO + commit manifest / resume
  pipelines/    end-to-end pipeline assembly
  functions/    corpus-level ops (dedup, ANN, text stats, media stubs)
"""

__version__ = "0.1.0"
