"""Commit manifest: per-partition lineage + metrics, and resume.

Replaces the reference's two filesystem-state mechanisms with one
immutable manifest:

* the ``completed_folder`` move-as-commit marker (update_delivery_file.py
  ref:54-83, run_all_starts.py ref:21-42) → shard-granular commit records;
* the racy in-place URL-file rewrite for error URLs (E14,
  web_text_extractor_ver1.5.py ref:1500-1555) → per-shard reject counts
  recorded immutably; reruns skip committed shards (anti-join by shard id)
  instead of mutating the input.

Each commit record carries lineage + throughput metrics per the
north_rule: shard id, row counts by status, method histogram, output
bytes, seconds, docs/sec.

The manifest is a JSONL file rewritten atomically (tmp + os.replace) on
each commit; at real scale one manifest per job lives beside the output
and each round appends O(shards) bytes.
"""

from __future__ import annotations

import json
import os


class CommitManifest:
    DIRNAME = "_manifest"
    FILENAME = "commits.jsonl"

    def __init__(self, output_dir: str):
        self.dir = os.path.join(output_dir, self.DIRNAME)
        self.path = os.path.join(self.dir, self.FILENAME)
        os.makedirs(self.dir, exist_ok=True)

    def records(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        out = []
        with open(self.path, encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if line:
                    out.append(json.loads(line))
        return out

    def committed_shards(self) -> set[str]:
        return {r["shard"] for r in self.records()}

    def commit(self, records: list[dict]) -> None:
        """Atomic append of one round's shard records."""
        existing = self.records()
        tmp = self.path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            for r in existing + records:
                f.write(json.dumps(r, ensure_ascii=False, sort_keys=True)
                        + "\n")
        os.replace(tmp, self.path)

    def totals(self) -> dict:
        recs = self.records()
        keys = ("docs", "ok", "timeout", "failed", "error_pattern",
                "n_chars_out", "seconds")
        tot = {k: 0 for k in keys}
        for r in recs:
            for k in keys:
                tot[k] += r.get(k, 0)
        tot["shards"] = len(recs)
        return tot
