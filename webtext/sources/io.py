"""Table IO for the interleaved-document corpus.

Lance is the documented production format (BASELINE.json input_hint:
``ray.data.read_lance``); this container ships no Lance wheel, so parquet
stands in with the same layout contract: a directory of independent
fragments, each a resumable unit.  ``read_documents`` prunes to exactly
the two pipeline columns at the read (nothing else leaves storage).
"""

from __future__ import annotations

import glob
import os


def list_fragments(input_dir: str) -> list[str]:
    """Input fragments in stable (name-sorted) order."""
    if os.path.isfile(input_dir):
        return [input_dir]
    return sorted(glob.glob(os.path.join(input_dir, "*.parquet")))


def read_documents(paths, *, override_num_blocks=None):
    """Ray Dataset over input fragments, pruned to (doc_id, spans)."""
    import ray.data

    kwargs = {}
    if override_num_blocks is not None:
        kwargs["override_num_blocks"] = override_num_blocks
    return ray.data.read_parquet(paths, columns=["doc_id", "spans"],
                                 **kwargs)


def read_documents_jsonl(input_dir: str, **kwargs):
    """Interleaved-document reader over JSONL fragments — the common
    interchange format for web-scrape corpora.  Nested spans ride as
    JSON arrays of objects; Ray's Arrow JSON reader infers the same
    list<struct> schema as the parquet path, so the extraction pipeline
    is format-agnostic downstream of the read."""
    import ray.data

    paths = input_dir
    if os.path.isdir(input_dir):
        paths = sorted(glob.glob(os.path.join(input_dir, "*.jsonl")) +
                       glob.glob(os.path.join(input_dir, "*.json")))
    ds = ray.data.read_json(paths, **kwargs)
    return ds.select_columns(["doc_id", "spans"])


def write_documents_jsonl(ds, output_dir: str) -> None:
    """JSONL writer (one fragment file per block) — the inverse seam,
    for handing extracted corpora to JSON-native consumers."""
    ds.write_json(output_dir)


def read_flat_csv(paths, columns=None, **kwargs):
    """CSV reader for FLAT tables (documents/events/TPC-H side): CSV
    cannot carry the nested spans column, so this seam is for the
    curation/relational operators, with the same column pruning
    contract as read_parquet(columns=...)."""
    import ray.data

    ds = ray.data.read_csv(paths, **kwargs)
    if columns is not None:
        ds = ds.select_columns(list(columns))
    return ds


def read_documents_lance(uri: str, **kwargs):
    """Production reader per BASELINE.json input_hint:
    ``ray.data.read_lance`` with the same (doc_id, spans) pruning.

    DEPLOYMENT SEAM — this container ships no ``lance`` wheel, so this
    raises ImportError here; in production it is a drop-in replacement
    for ``read_documents`` (same schema contract, fragment-granular
    resumability maps to Lance fragments)."""
    import ray.data

    try:
        import lance  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "lance is not installed in this environment; use "
            "read_documents (parquet fragments) — the tested stand-in "
            "with the same layout contract") from e
    return ray.data.read_lance(uri, columns=["doc_id", "spans"], **kwargs)
