"""Winnowing, BPE token count, and embedding-LSH near-dup tests."""

import pytest

from webtext.functions.ann import cosine_dup_pairs, lsh_cosine_dup_pairs
from webtext.functions.textstats import (
    BPE_TOKEN_PATTERN,
    token_count_bpe,
    winnow,
    winnow_fingerprints,
)

SF = "/root/testdata/sf0.001"


def test_winnow_deterministic_and_shift_robust():
    text = "the quick brown fox jumps over the lazy dog again and again"
    a = winnow_fingerprints(text)
    assert a == winnow_fingerprints(text)
    # a prefix insertion changes positions but shared k-grams keep most
    # fingerprints overlapping (the property winnowing exists for)
    b = winnow_fingerprints("PRE " + text)
    overlap = len(set(a) & set(b)) / len(set(a))
    assert overlap > 0.6


def test_winnow_disjoint_texts_share_nothing():
    a = set(winnow_fingerprints("alpha beta gamma delta epsilon zeta"))
    b = set(winnow_fingerprints("one two three four five six seven"))
    assert not (a & b)


def test_winnow_short_text_edge_cases():
    assert winnow_fingerprints("") == []
    assert len(winnow_fingerprints("abc")) == 1      # shorter than k


def test_bpe_pattern_matches_python_semantics():
    import re

    text = "hello world42 x-y,z  done"
    toks = re.findall(BPE_TOKEN_PATTERN, text)
    # letter runs, digit runs, punct runs, optional leading space
    # the lone space between "z" and " done" cannot match (classes
    # exclude space) — it becomes the leading space of " done"
    assert toks == ["hello", " world", "42", " x", "-", "y", ",", "z",
                    " done"]


def test_token_count_bpe_dataset(ray_session):
    import ray.data

    rows = [{"doc_id": 1, "text": "ab 12 cd"}]
    out = token_count_bpe(ray.data.from_items(rows)).take_all()
    assert out[0]["n_bpe_tokens"] == 3


def test_winnow_dataset(ray_session):
    import ray.data

    ds = ray.data.read_parquet(f"{SF}/documents.parquet",
                               columns=["doc_id", "text"])
    out = winnow(ds).take(10)
    for r in out:
        assert r["n_fps"] > 0
        assert r["min_fp"] <= r["max_fp"]


def test_lsh_pairs_subset_of_exact(ray_session):
    import ray.data

    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    exact = {(r["left_id"], r["right_id"])
             for r in cosine_dup_pairs(ds, 0.4).take_all()}
    approx = {(r["left_id"], r["right_id"])
              for r in lsh_cosine_dup_pairs(ds, 0.4).take_all()}
    assert approx <= exact                     # no false positives
    assert exact, "fixture should contain pairs"
    recall = len(approx) / len(exact)
    assert recall >= 0.3, f"LSH recall {recall:.2f} too low"


def test_minhash_recall_audit_verbatim_dups(ray_session):
    """Verbatim duplicates are both word-similar and shingle-similar →
    the audit reports full recall on them; a reordered pair is
    word-similar only → counted in n_exact, missed by LSH."""
    import ray.data

    from webtext.functions.dedup import minhash_recall_audit

    base = "alpha beta gamma delta epsilon zeta eta theta " \
           "iota kappa lambda mu"
    reordered = " ".join(reversed(base.split(" ")))
    rows = [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": base},           # verbatim dup of 1
        {"doc_id": 3, "text": reordered},      # word-set dup, no order
        {"doc_id": 4, "text": "totally different words here now"},
    ]
    got = minhash_recall_audit(ray.data.from_items(rows),
                               threshold=0.9).to_pylist()[0]
    # exact pairs: (1,2), (1,3), (2,3); LSH finds only the verbatim one
    assert got["n_exact"] == 3
    assert got["n_lsh"] == 1 and got["n_hits"] == 1
    assert got["recall_micro"] == 333333
