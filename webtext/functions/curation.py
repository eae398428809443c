"""Data-curation operators for training-corpus preparation: PII
redaction, Gopher-style repetition statistics, and test-set
decontamination.

These extend the reference's per-document cleanup family
(ref: /root/reference/common_scripts/web_text_extractor_ver1.5.py:161-343
— URL strip / printable filter / paragraph dedup) with the corpus-level
curation steps a large-scale LLM-data pipeline needs.  Every op is a
vectorized ``map_batches`` stage over zero-copy Arrow batches:

* ``redact_pii`` — Arrow's RE2 regex kernels (the same engine DuckDB
  uses, so the SQL oracle is bit-exact), no Python row loop at all;
* ``repetition_stats`` — token/2-gram/3-gram duplicate counts via
  factorize + segment-unique (no per-row sets);
* ``decontaminate`` — the classic eval-set n-gram overlap filter:
  hash the benchmark's n-grams once (small side), broadcast the sorted
  hash array via ``ray.put``, and filter the corpus with a
  ``searchsorted`` membership test per batch.  The corpus side never
  shuffles — at 100 TB the only moving data is the benchmark hash set
  (eval suites are millions of n-grams ≈ tens of MB, a classic
  broadcast side).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# --------------------------------------------------------------------------
# PII redaction
# --------------------------------------------------------------------------

# RE2-safe patterns (no backreferences / lookaround) so Arrow's
# replace_substring_regex and DuckDB's regexp_replace(…, 'g') — both
# RE2 — agree byte-for-byte.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+?\d[\d -]{7,}\d"

_PII_STEPS = ((EMAIL_RE, "<EMAIL>", "n_email"),
              (IPV4_RE, "<IP>", "n_ip"),
              (PHONE_RE, "<PHONE>", "n_phone"))


def redact_pii_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, clean_text, n_email, n_ip, n_phone): sequentially
    replace email → IPv4 → phone patterns; each count is measured on
    the text state *before* its own replacement (so `<IP>` substitution
    cannot create or destroy phone matches that were counted)."""
    text = batch.column("text")
    cols = [batch.column("doc_id")]
    names = ["doc_id"]
    counts = []
    for pattern, token, cname in _PII_STEPS:
        counts.append((cname,
                       pc.count_substring_regex(text, pattern=pattern)
                       .cast(pa.int64())))
        text = pc.replace_substring_regex(text, pattern=pattern,
                                          replacement=token)
    cols.append(text)
    names.append("clean_text")
    for cname, c in counts:
        cols.append(c)
        names.append(cname)
    return pa.Table.from_arrays(cols, names=names)


def redact_pii(ds):
    """Corpus-wide PII redaction: pure per-batch map, no shuffle."""
    return ds.map_batches(redact_pii_batch, batch_format="pyarrow",
                          zero_copy_batch=True)


# --------------------------------------------------------------------------
# Repetition statistics (Gopher-style quality signals)
# --------------------------------------------------------------------------

def _flat_tokens(chunk) -> tuple[np.ndarray, np.ndarray]:
    """(row lengths, flattened token codes) for one list<string> chunk.
    Codes come from pandas.factorize — C-speed hashing, no Python
    loop over tokens."""
    import pandas as pd

    lengths = pc.list_value_length(chunk) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    if lengths.sum() == 0:
        return lengths, np.empty(0, dtype=np.int64)
    codes, _ = pd.factorize(pc.list_flatten(chunk).to_pandas(),
                            sort=False)
    return lengths, codes.astype(np.int64) + 1  # null → its own code 0


def _segment_nunique(rows: np.ndarray, values: np.ndarray,
                     n_rows: int) -> np.ndarray:
    """Per-row count of distinct ``values`` (both arrays flat/aligned).
    lexsort + neighbor-compare — no linearized row*span+value key, so
    arbitrary uint64 value ranges can't overflow."""
    if len(rows) == 0:
        return np.zeros(n_rows, dtype=np.int64)
    order = np.lexsort((values, rows))
    r, v = rows[order], values[order]
    first = np.ones(len(r), dtype=bool)
    first[1:] = (r[1:] != r[:-1]) | (v[1:] != v[:-1])
    return np.bincount(r[first], minlength=n_rows).astype(np.int64)


def repetition_stats_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, n_toks, n_uniq_toks, n_2grams, n_uniq_2grams, n_3grams,
    n_uniq_3grams): integer repetition signals per document.  A high
    duplicate-n-gram fraction (1 - uniq/total) is the Gopher/MassiveText
    repetition filter; counts stay integers so the driver's value-hash
    comparison is float-free (the caller derives fractions)."""
    tokens = pc.split_pattern(batch.column("text"), " ")
    n = batch.num_rows
    out = {k: np.zeros(n, dtype=np.int64)
           for k in ("n_toks", "n_uniq_toks", "n_2grams",
                     "n_uniq_2grams", "n_3grams", "n_uniq_3grams")}
    offset = 0
    chunks = (tokens.chunks if isinstance(tokens, pa.ChunkedArray)
              else [tokens])
    for chunk in chunks:
        lengths, codes = _flat_tokens(chunk)
        cn = len(lengths)
        sl = slice(offset, offset + cn)
        offset += cn
        out["n_toks"][sl] = lengths
        if len(codes) == 0:
            continue
        rows = np.repeat(np.arange(cn, dtype=np.int64), lengths)
        out["n_uniq_toks"][sl] = _segment_nunique(rows, codes, cn)
        # n-gram ids: multiply-xor-mix successive token codes into a
        # uint64 (wrap is part of the hash — no vocab-size overflow
        # cliff; collisions are ~(#grams)²/2⁶⁴, oracle-negligible).
        # A gram is valid only when all its tokens share a row.
        ucodes = codes.astype(np.uint64)
        for gname, uname, k in (("n_2grams", "n_uniq_2grams", 2),
                                ("n_3grams", "n_uniq_3grams", 3)):
            out[gname][sl] = np.maximum(lengths - (k - 1), 0)
            if len(codes) < k:
                continue
            m = len(codes) - (k - 1)
            valid = rows[:m] == rows[k - 1:]
            with np.errstate(over="ignore"):
                gram = ucodes[:m].copy()
                for j in range(1, k):
                    gram = gram * _MIX ^ ucodes[j: m + j]
            out[uname][sl] = _segment_nunique(
                rows[:m][valid], gram[valid], cn)
    cols = [batch.column("doc_id")] + \
        [pa.array(out[k], pa.int64())
         for k in ("n_toks", "n_uniq_toks", "n_2grams", "n_uniq_2grams",
                   "n_3grams", "n_uniq_3grams")]
    return pa.Table.from_arrays(cols, names=[
        "doc_id", "n_toks", "n_uniq_toks", "n_2grams", "n_uniq_2grams",
        "n_3grams", "n_uniq_3grams"])


def repetition_stats(ds):
    """Per-document repetition signals: pure per-batch map, no shuffle."""
    return ds.map_batches(repetition_stats_batch, batch_format="pyarrow",
                          zero_copy_batch=True)


# --------------------------------------------------------------------------
# Test-set decontamination
# --------------------------------------------------------------------------

def split_by_mod(ds, mod: int = 100, lt: int = 3, invert: bool = False):
    """Deterministic benchmark/corpus split: rows where
    ``doc_id % mod < lt`` (or the complement with ``invert``).  A pure
    vectorized per-batch filter — used to carve a stand-in 'eval suite'
    out of the documents table for the decontamination oracle."""
    def part(batch: pa.Table, *, _mod=mod, _lt=lt,
             _inv=invert) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        mask = (ids % _mod) < _lt
        return batch.filter(pa.array(~mask if _inv else mask))

    return ds.map_batches(part, batch_format="pyarrow",
                          zero_copy_batch=True)


def _token_hash_lut(flat: pa.Array) -> np.ndarray:
    """uint64 hash per flattened token.  Hashing happens once per
    *distinct* token (np.unique first), then scatters — the Python md5
    loop runs over the batch vocabulary, not the token stream."""
    arr = flat.to_numpy(zero_copy_only=False)
    uniq, inv = np.unique(arr.astype("U"), return_inverse=True)
    lut = np.fromiter(
        (int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[:8],
                        "big") for t in uniq),
        dtype=np.uint64, count=len(uniq))
    return lut[inv]


_MIX = np.uint64(0x9E3779B97F4A7C15)


def _gram_hashes(chunk, n: int) -> tuple[np.ndarray, np.ndarray]:
    """(row index, gram hash) for every n-gram in a list<string> chunk.
    Gram hash = rolling multiply-xor of the tokens' md5-64 hashes —
    order-sensitive, identical on the benchmark and corpus sides, and
    collision-safe enough (64-bit over ≤1e9 grams) that membership by
    hash equals membership by string for oracle purposes."""
    lengths = pc.list_value_length(chunk) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    if lengths.sum() < n:
        return (np.empty(0, dtype=np.int64),
                np.empty(0, dtype=np.uint64))
    th = _token_hash_lut(pc.list_flatten(chunk))
    rows = np.repeat(np.arange(len(lengths), dtype=np.int64), lengths)
    m = len(th) - (n - 1)
    valid = rows[:m] == rows[n - 1:]
    with np.errstate(over="ignore"):
        h = th[:m].copy()
        for j in range(1, n):
            h = h * _MIX ^ th[j: m + j]
    return rows[:m][valid], h[valid]


def benchmark_gram_hashes(bench_ds, n: int = 4) -> np.ndarray:
    """Sorted distinct n-gram hashes of the benchmark corpus.  The
    benchmark (an eval suite) is small by definition; each task emits
    its batch's distinct hashes, and the driver unions them — the only
    full materialization in the op, bounded by eval-suite size."""
    def grams(batch: pa.Table) -> pa.Table:
        _, h = _gram_hashes(
            pc.split_pattern(batch.column("text"), " "), n)
        return pa.Table.from_arrays([pa.array(np.unique(h), pa.uint64())],
                                    names=["h"])

    parts = []
    for b in bench_ds.map_batches(grams, batch_format="pyarrow",
                                  zero_copy_batch=True) \
            .iter_batches(batch_format="pyarrow"):
        parts.append(b.column("h").to_numpy(zero_copy_only=False))
    if not parts:
        return np.empty(0, dtype=np.uint64)
    return np.unique(np.concatenate(parts))


def decontaminate(ds, bench_ds, n: int = 4):
    """Drop corpus documents sharing any n-gram with the benchmark.

    Real pipelines use n = 8–13; the default 4 suits the tiny synthetic
    vocabulary.  The benchmark hash set is broadcast once via
    ``ray.put`` and every filter task reads the same object-store copy
    (never re-shipped per batch); the corpus streams through a pure
    filter — no shuffle, no corpus materialization.
    Returns the clean (doc_id) rows.
    """
    import ray

    bench_ref = ray.put(benchmark_gram_hashes(bench_ds, n))

    def keep_clean(batch: pa.Table, *, _ref=bench_ref,
                   _n=n) -> pa.Table:
        bench = _ref if isinstance(_ref, np.ndarray) else ray.get(_ref)
        rows, h = _gram_hashes(
            pc.split_pattern(batch.column("text"), " "), _n)
        contaminated = np.zeros(batch.num_rows, dtype=bool)
        if len(h) and len(bench):
            pos = np.searchsorted(bench, h)
            pos[pos == len(bench)] = 0
            hit = bench[pos] == h
            contaminated[np.unique(rows[hit])] = True
        return batch.select(["doc_id"]).filter(
            pa.array(~contaminated))

    return ds.map_batches(keep_clean, batch_format="pyarrow",
                          zero_copy_batch=True)


# --------------------------------------------------------------------------
# Text normalization
# --------------------------------------------------------------------------

def normalize_text_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, norm): lowercase + whitespace-squeeze + trim — the
    canonical pre-dedup normalization pass.  Pure Arrow kernels
    (utf8_lower + RE2 replace — the same regex engine DuckDB uses, so
    the SQL oracle `trim(regexp_replace(lower(text),'\\s+',' ','g'))`
    is bit-exact)."""
    norm = pc.utf8_trim_whitespace(
        pc.replace_substring_regex(
            pc.utf8_lower(batch.column("text")),
            pattern=r"\s+", replacement=" "))
    return pa.Table.from_arrays([batch.column("doc_id"), norm],
                                names=["doc_id", "norm"])


def normalize_text(ds):
    """Corpus-wide normalization: pure per-batch map, no shuffle."""
    return ds.map_batches(normalize_text_batch, batch_format="pyarrow",
                          zero_copy_batch=True)


# --------------------------------------------------------------------------
# URL canonicalization
# --------------------------------------------------------------------------

# The reference's pipelines are URL-list driven (ref:
# /root/reference/common_scripts/google_url_serch.py — mined URLs are
# dict-deduped RAW, so http://Site/ and https://site?utm=… count as
# different pages).  Canonicalization before dedup is the standard
# crawl-corpus fix.  The canonical form is defined BY this RE2 rewrite
# chain applied after lowercasing scheme://host[:port] — Arrow's
# replace_substring_regex and DuckDB's regexp_replace(…,'g') are both
# RE2, so the SQL oracle replays the identical chain bit-for-bit.
URL_HEAD_RE = r"^[A-Za-z]+://[^/?#]*"
URL_CANON_STEPS: tuple[tuple[str, str], ...] = (
    (r"#.*$", ""),                                   # fragment
    (r"([?&])(utm_[A-Za-z0-9_]*|gclid|fbclid)=[^&#]*", r"\1"),
    (r"\?&+", "?"),                                  # separator debris…
    (r"&&+", "&"),
    (r"[?&]+$", ""),
    (r"^(http://[^/:?#]+):80(/|\?|#|$)", r"\1\2"),   # default ports
    (r"^(https://[^/:?#]+):443(/|\?|#|$)", r"\1\2"),
    (r"/+(\?)", r"\1"),                              # trailing slash
    (r"/+$", ""),
)


def canonicalize_urls_batch(batch: pa.Table,
                            col: str = "url") -> pa.Table:
    """(doc_id, canon_url): lowercase the scheme://host[:port] head
    (path/query case is significant and preserved), then apply
    URL_CANON_STEPS.  Pure Arrow RE2 kernels — no Python row loop."""
    urls = batch.column(col)
    # head = full match of URL_HEAD_RE; rest = the remainder
    m = pc.extract_regex(urls, r"(?P<head>" + URL_HEAD_RE + r")")
    head = pc.utf8_lower(pc.struct_field(m, "head"))
    rest = pc.replace_substring_regex(urls, pattern=URL_HEAD_RE,
                                      replacement="",
                                      max_replacements=1)
    u = pc.binary_join_element_wise(head, rest, "")
    for pat, rep in URL_CANON_STEPS:
        u = pc.replace_substring_regex(u, pattern=pat, replacement=rep)
    return pa.Table.from_arrays([batch.column("doc_id"), u],
                                names=["doc_id", "canon_url"])


def canonicalize_urls(ds, col: str = "url"):
    """Corpus-wide URL canonicalization: per-batch map, no shuffle."""
    def f(batch: pa.Table, *, _c=col) -> pa.Table:
        return canonicalize_urls_batch(batch, _c)
    return ds.map_batches(f, batch_format="pyarrow",
                          zero_copy_batch=True)


def url_dedup(ds, col: str = "url"):
    """First-occurrence page dedup by CANONICAL url: one native
    groupby(canon_url).min(doc_id) hash aggregate — no per-URL Python
    groups (the dedup_links lesson), shuffle ships (canon_url, doc_id)
    only."""
    canon = canonicalize_urls(ds, col)
    out = canon.groupby("canon_url").min("doc_id")
    return out.map_batches(
        lambda b: pa.Table.from_arrays(
            [b.column("min(doc_id)").cast(pa.int64()),
             b.column("canon_url")],
            names=["doc_id", "canon_url"]),
        batch_format="pyarrow", zero_copy_batch=True)
