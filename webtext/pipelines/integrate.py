"""Post-extraction operators: integrator sink (S5/A3), timeout
collect-aggregate (A2), order restoration (A1), reject-manifest view
(E14), retro error scan (E15), filename sanitizer (U10).

``ref:`` cites /root/reference/common_scripts/* as in SURVEY.md §2.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..oracle import rules
from .extract_pipeline import read_output

TIMEOUT_WARNING_HEADER = (
    "※以下の{n}件のURLはテキスト抽出がタイムアウトしました:\n{urls}\n\n")


def ordered_output(output_dir: str):
    """A1 order restoration (web_text_extractor_ver1.5.py:1398-1405):
    the reference re-sorts scrambled pool results back to input order;
    here a total order on doc_id is restored only at the consumer —
    never mid-pipeline (sorting is the expensive all-to-all)."""
    return read_output(output_dir).sort("doc_id")


def read_rejects(output_dir: str):
    """E14 reject manifest (replaces the reference's racy in-place URL
    file rewrite, ref:1500-1555): the immutable record of every dropped
    document with its failure messages."""
    return read_output(output_dir, statuses=("failed", "error_pattern")) \
        .select_columns(["doc_id", "status", "messages"])


def timeout_report(output_dir: str) -> dict:
    """A2 timeout collect-aggregate (integrated.py:19-51): collect the
    timeout-sentinel doc_ids and build the warning preamble.  A small
    aggregate — the id list is bounded by the timeout rate."""
    rows = read_output(output_dir, statuses=("timeout",)) \
        .select_columns(["doc_id"]).take_all()
    ids = sorted(r["doc_id"] for r in rows)
    header = (TIMEOUT_WARNING_HEADER.format(n=len(ids), urls="\n".join(ids))
              if ids else "")
    return {"n_timeouts": len(ids), "doc_ids": ids, "header": header}


def integrate_outputs(output_dir_a: str, output_dir_b: str):
    """S5/A3 integrator (integrated.py:44-58): append-union of two
    engine outputs, deliberately NOT deduped — a doc extracted by both
    sides appears twice, matching the reference's concatenation.  The
    timeout warning becomes a manifest sidecar (timeout_report), not an
    in-band data row."""
    a = read_output(output_dir_a)
    b = read_output(output_dir_b)
    return a.union(b)


def scan_output_for_errors(output_dir: str):
    """E15 retro-validation (cleanup_error_pages.py:100-195): scan
    *kept* output rows for browser-error patterns that slipped through
    → repair list of (doc_id, pattern).  Vectorized substring sweep per
    pattern; runs as a streaming pass over the committed output."""

    patterns = rules.BROWSER_ERROR_PATTERNS

    def scan(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id")
        texts = []
        for spans in batch.column("spans").to_pylist():
            texts.append("\n".join(s["text"] for s in spans or []))
        text_arr = pa.array(texts, pa.string())
        out_ids, out_pats = [], []
        for pat in patterns:
            mask = pc.match_substring(text_arr, pat)
            hits = pc.filter(doc_ids, mask).to_pylist()
            out_ids.extend(hits)
            out_pats.extend([pat] * len(hits))
        return pa.Table.from_arrays(
            [pa.array(out_ids, pa.string()), pa.array(out_pats, pa.string())],
            names=["doc_id", "pattern"])

    return read_output(output_dir).map_batches(
        scan, batch_format="pyarrow", zero_copy_batch=True)


def sanitize_filename(name: str) -> str:
    """U10 (delivery_folder/create_file.py:27-31): forbidden filesystem
    characters replaced with underscores — used for manifest names."""
    for ch in '<>:"/\\|?*':
        name = name.replace(ch, "_")
    return name


def lineage_report(output_dir: str):
    """(shard, docs, ok, timeout, failed, error_pattern, n_chars_out):
    the per-partition lineage/observability readout from a committed
    run's manifest — the north-star's "every partition records lineage
    + throughput metrics" surface as a queryable table (throughput
    seconds are wall-clock and excluded so the result is deterministic
    and golden-checkable against the pure extraction oracle).

    Driver-side by design: the manifest is per-shard METADATA (one
    JSON record per committed shard, written by `run_extraction`), so
    this reads kilobytes at any corpus size — the per-document data is
    never touched.  The golden is generated from the pure-Python
    oracle over the same deterministic corpus, so a mismatch catches
    both metric-collection bugs and extraction drift."""
    import collections

    import pyarrow as pa

    from ..sources.manifest import CommitManifest

    agg: dict[str, dict] = {}
    for rec in CommitManifest(output_dir).records():
        a = agg.setdefault(rec["shard"], collections.Counter())
        for k in ("docs", "ok", "timeout", "failed", "error_pattern",
                  "n_chars_out"):
            a[k] += int(rec.get(k, 0))
    shards = sorted(agg)
    cols = {"shard": shards}
    for k in ("docs", "ok", "timeout", "failed", "error_pattern",
              "n_chars_out"):
        cols[k] = [int(agg[s][k]) for s in shards]
    return pa.table({
        "shard": pa.array(cols["shard"], pa.string()),
        **{k: pa.array(cols[k], pa.int64())
           for k in ("docs", "ok", "timeout", "failed",
                     "error_pattern", "n_chars_out")}})
