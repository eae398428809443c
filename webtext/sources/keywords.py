"""Keyword-file source/sink — the reference's job-intake surface as a
real dataset op (closes SURVEY §2 S2/S3 beyond the driver-config cut).

The reference drives everything from 2-line ``<keyword>.txt`` files:
the writer generates one Google and one Yahoo search URL per keyword
(ref: delivery_folder/create_file.py:34-58) and the per-keyword worker
sniffs them back out by line prefix + engine substring
(ref: common_scripts/start.py:16-42); a file moved into
``completed_folder`` is the done marker, so the pending set is
``delivery − completed`` (ref: run_all_starts.py:44-60).

Here the intake becomes a Ray Data source: the driver lists filenames
(metadata only — same contract as the parquet reader's file listing)
and the CONTENT reads + URL sniffing run distributed in ``map_batches``
over path batches, so a million keyword files never serialize through
the driver."""

from __future__ import annotations

import os
from urllib.parse import quote_plus

import pyarrow as pa

from ..pipelines.integrate import sanitize_filename

KEYWORD_SCHEMA = pa.schema([
    ("keyword", pa.string()),
    ("google_url", pa.string()),
    ("yahoo_url", pa.string()),
])

_GOOGLE_MARKS = ("google.com/search", "google.co.jp/search")
_YAHOO_MARKS = ("search.yahoo.co.jp/search", "search.yahoo.com/search")


def generate_search_urls(keyword: str) -> tuple[str, str]:
    """Google + Yahoo search URLs for a keyword
    (ref: create_file.py:34-39 — quote_plus encoding)."""
    enc = quote_plus(keyword)
    return (f"https://www.google.com/search?q={enc}",
            f"https://search.yahoo.co.jp/search?p={enc}")


def write_keyword_files(keywords, target_dir: str) -> list[str]:
    """S3: one sanitized ``<keyword>.txt`` per keyword, two URL lines
    (ref: create_file.py:42-58)."""
    os.makedirs(target_dir, exist_ok=True)
    created = []
    for kw in keywords:
        path = os.path.join(target_dir,
                            f"{sanitize_filename(kw)}.txt")
        g, y = generate_search_urls(kw)
        with open(path, "w", encoding="utf-8") as f:
            f.write(f"{g}\n{y}\n")
        created.append(path)
    return created


def sniff_search_urls(text: str) -> tuple[str | None, str | None]:
    """S2 line sniff (ref: start.py:16-42): first non-blank line that
    starts with http(s) and contains an engine's search marker wins for
    that engine; stop when both are found."""
    google_url = yahoo_url = None
    for line in text.splitlines():
        line = line.strip()
        if not line or not line.startswith(("http://", "https://")):
            continue
        if google_url is None and any(m in line for m in _GOOGLE_MARKS):
            google_url = line
        elif yahoo_url is None and any(m in line for m in _YAHOO_MARKS):
            yahoo_url = line
        if google_url and yahoo_url:
            break
    return google_url, yahoo_url


def pending_keyword_paths(delivery_dir: str,
                          completed_dir: str | None = None) -> list[str]:
    """delivery − completed, by filename (the move-as-done contract)."""
    done = set()
    if completed_dir and os.path.isdir(completed_dir):
        done = {f for f in os.listdir(completed_dir)
                if f.endswith(".txt")}
    return sorted(
        os.path.join(delivery_dir, f)
        for f in os.listdir(delivery_dir)
        if f.endswith(".txt") and f not in done)


def read_keyword_files(delivery_dir: str,
                       completed_dir: str | None = None):
    """S2 as a dataset: (keyword, google_url, yahoo_url) rows for every
    PENDING keyword file.  Files with neither URL sniffable are dropped
    (the reference aborts that keyword's job); a missing engine URL
    stays NULL.  The keyword is the file stem, as in the reference."""
    import ray.data

    paths = pending_keyword_paths(delivery_dir, completed_dir)

    def load(batch: pa.Table) -> pa.Table:
        out = {k: [] for k in KEYWORD_SCHEMA.names}
        for path in batch.column("path").to_pylist():
            try:
                with open(path, encoding="utf-8") as f:
                    g, y = sniff_search_urls(f.read())
            except OSError:
                continue          # vanished mid-scan: skip, resumable
            if g is None and y is None:
                continue
            out["keyword"].append(
                os.path.splitext(os.path.basename(path))[0])
            out["google_url"].append(g)
            out["yahoo_url"].append(y)
        return pa.Table.from_pydict(out, schema=KEYWORD_SCHEMA)

    if not paths:
        return ray.data.from_arrow(KEYWORD_SCHEMA.empty_table())
    return ray.data.from_items(
        [{"path": p} for p in paths]).map_batches(
        load, batch_format="pyarrow", zero_copy_batch=True)
