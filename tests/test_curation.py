"""Curation operators: PII redaction, repetition stats, decontamination.

Semantics are pinned here with hand-computed expectations; the corpus-
scale oracle parity lives in __ray_entry__.oracle_sql (live DuckDB SQL
for all three queries — same RE2 engine, same n-gram definitions).
"""

import numpy as np
import pyarrow as pa
import pytest

from webtext.functions import curation

SF = "/root/testdata/sf0.001"


def _tbl(rows):
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string())})


# -- PII redaction ----------------------------------------------------------

def test_redact_pii_batch_all_kinds():
    t = _tbl([
        (1, "mail me at bob.smith+x@corp.example.org today"),
        (2, "server 192.168.0.1 then call +81 90-1234-5678"),
        (3, "no pii here at all"),
    ])
    out = curation.redact_pii_batch(t).to_pydict()
    assert out["clean_text"] == [
        "mail me at <EMAIL> today",
        "server <IP> then call <PHONE>",
        "no pii here at all",
    ]
    assert out["n_email"] == [1, 0, 0]
    assert out["n_ip"] == [0, 1, 0]
    assert out["n_phone"] == [0, 1, 0]


def test_redact_pii_sequential_counting():
    # the IP is counted before the phone pattern could swallow its
    # digits; after <IP> substitution the remaining digits are too
    # short for the phone pattern
    t = _tbl([(1, "x 10.0.0.1 y")])
    out = curation.redact_pii_batch(t).to_pydict()
    assert out["clean_text"] == ["x <IP> y"]
    assert out["n_ip"] == [1] and out["n_phone"] == [0]


def test_redact_pii_dataset(ray_session):
    import ray.data

    t = _tbl([(i, f"doc{i}@ex.com word") for i in range(10)])
    out = curation.redact_pii(ray.data.from_arrow(t)).take_all()
    assert all(r["clean_text"] == "<EMAIL> word" for r in out)
    assert sum(r["n_email"] for r in out) == 10


# -- repetition stats -------------------------------------------------------

def test_repetition_stats_hand_computed():
    t = _tbl([
        (1, "a b a b a"),       # toks 5/2; 2-grams 4 -> {ab, ba} = 2
        (2, "x y z"),           # toks 3/3; 2-grams 2/2; 3-grams 1/1
        (3, "w w w w"),         # toks 4/1; 2-grams 3/1; 3-grams 2/1
    ])
    out = curation.repetition_stats_batch(t).to_pydict()
    assert out["n_toks"] == [5, 3, 4]
    assert out["n_uniq_toks"] == [2, 3, 1]
    assert out["n_2grams"] == [4, 2, 3]
    assert out["n_uniq_2grams"] == [2, 2, 1]
    assert out["n_3grams"] == [3, 1, 2]
    assert out["n_uniq_3grams"] == [2, 1, 1]  # {aba, bab}, {xyz}, {www}


def test_repetition_stats_short_docs():
    t = _tbl([(1, ""), (2, "solo"), (3, "two words")])
    out = curation.repetition_stats_batch(t).to_pydict()
    # "" splits to [''] -> one token
    assert out["n_toks"] == [1, 1, 2]
    assert out["n_2grams"] == [0, 0, 1]
    assert out["n_3grams"] == [0, 0, 0]
    assert out["n_uniq_3grams"] == [0, 0, 0]


def test_repetition_gram_ids_do_not_cross_rows():
    # rows share tokens; the 2-gram "b c" exists only via row
    # boundaries and must NOT be counted
    t = _tbl([(1, "a b"), (2, "c d")])
    out = curation.repetition_stats_batch(t).to_pydict()
    assert out["n_2grams"] == [1, 1]
    assert out["n_uniq_2grams"] == [1, 1]


# -- decontamination --------------------------------------------------------

def test_decontaminate_drops_overlapping_docs(ray_session):
    import ray.data

    bench = ray.data.from_arrow(_tbl([
        (100, "the quick brown fox jumps high")]))
    corpus = ray.data.from_arrow(_tbl([
        (1, "prefix the quick brown fox suffix"),   # shares a 4-gram
        (2, "quick brown dog sits low today"),       # no shared 4-gram
        (3, "too short"),                            # < n tokens
    ]))
    kept = sorted(r["doc_id"] for r in
                  curation.decontaminate(corpus, bench, n=4).take_all())
    assert kept == [2, 3]


def test_decontaminate_empty_benchmark(ray_session):
    import ray.data

    bench = ray.data.from_arrow(_tbl([])) if False else \
        ray.data.from_arrow(_tbl([(9, "one two three")]))  # < n grams
    corpus = ray.data.from_arrow(_tbl([(1, "one two three four five")]))
    kept = curation.decontaminate(corpus, bench, n=4).take_all()
    assert [r["doc_id"] for r in kept] == [1]


def test_split_by_mod_partitions(ray_session):
    import ray.data

    t = _tbl([(i, "x") for i in range(20)])
    ds = ray.data.from_arrow(t)
    a = sorted(r["doc_id"] for r in
               curation.split_by_mod(ds, mod=10, lt=3).take_all())
    b = sorted(r["doc_id"] for r in
               curation.split_by_mod(ds, mod=10, lt=3,
                                     invert=True).take_all())
    assert a == [0, 1, 2, 10, 11, 12]
    assert len(a) + len(b) == 20 and not set(a) & set(b)


def test_gram_hashes_order_sensitive():
    chunk = pa.array([["a", "b", "c", "d"], ["d", "c", "b", "a"]])
    _, h = curation._gram_hashes(chunk, 4)
    assert len(h) == 2 and h[0] != h[1]


def test_decontaminate_block_split_invariant(ray_session):
    """Survivor set is independent of input partitioning (the single-
    node answer transfers to a cluster by construction)."""
    import ray.data

    rows = [(i, f"w{i % 7} w{(i + 1) % 7} w{(i + 2) % 7} "
                f"w{(i + 3) % 7} w{i % 5}") for i in range(40)]
    bench = ray.data.from_arrow(_tbl(rows[:4]))
    corpus = ray.data.from_arrow(_tbl(rows[4:]))
    base = sorted(r["doc_id"] for r in
                  curation.decontaminate(corpus, bench, n=4).take_all())
    resplit = sorted(r["doc_id"] for r in curation.decontaminate(
        corpus.repartition(7), bench.repartition(3), n=4).take_all())
    assert base == resplit and len(base) < 36  # something was dropped


def test_normalize_text_kernel():
    import pyarrow as pa

    from webtext.functions.curation import normalize_text_batch

    t = pa.table({"doc_id": [1, 2],
                  "text": ["  Hello\t WORLD \n\nfoo ", "ABC"]})
    out = normalize_text_batch(t)
    assert out.column("norm").to_pylist() == ["hello world foo", "abc"]


def test_normalize_text_matches_duckdb(ray_session):
    import duckdb
    import ray.data

    from webtext.functions.curation import normalize_text

    sf = "/root/testdata/sf0.001"
    ds = ray.data.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id", "text"])
    got = sorted((r["doc_id"], r["norm"])
                 for r in normalize_text(ds).take_all())
    want = duckdb.sql(
        f"SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ',"
        f" 'g')) FROM read_parquet('{sf}/documents.parquet')"
        f" ORDER BY 1").fetchall()
    assert got == [tuple(w) for w in want]


# --------------------------------------------------------------------------
# URL canonicalization
# --------------------------------------------------------------------------

def test_canonicalize_urls_handwritten_cases(ray_session):
    import pyarrow as pa

    from webtext.functions.curation import canonicalize_urls_batch

    cases = [
        # (raw, expected canonical) — expectations written BY HAND from
        # the spec, not generated by the implementation
        ("HTTP://WWW.Ex.COM:80/A/B/?utm_source=f&id=7&utm_campaign=c#x",
         "http://www.ex.com/A/B?id=7"),
        ("HttpS://Site.COM:443/a?id=1&fbclid=XY",
         "https://site.com/a?id=1"),
        ("http://x.com/p?gclid=g1&utm_x=2", "http://x.com/p"),
        ("https://y.com/q/?id=3", "https://y.com/q?id=3"),
        ("http://h.com:8080/keep?id=2", "http://h.com:8080/keep?id=2"),
        ("https://h.com:80/not-default?a=1",
         "https://h.com:80/not-default?a=1"),
        ("http://root.com/", "http://root.com"),
        ("http://CASE.com/Path/Is/Kept", "http://case.com/Path/Is/Kept"),
    ]
    t = pa.table({"doc_id": pa.array(range(len(cases)), pa.int64()),
                  "url": pa.array([r for r, _ in cases])})
    got = canonicalize_urls_batch(t).column("canon_url").to_pylist()
    assert got == [w for _, w in cases]


def test_url_dedup_first_wins(ray_session):
    import pyarrow as pa
    import ray.data

    from webtext.functions.curation import url_dedup

    t = pa.table({
        "doc_id": pa.array([5, 2, 9, 7], pa.int64()),
        "url": pa.array([
            "http://a.com/x?utm_source=1",   # canon: http://a.com/x
            "HTTP://A.com/x",                # same canonical page
            "http://a.com/x/",               # same again
            "http://b.com/y",
        ])})
    out = url_dedup(ray.data.from_arrow(t).repartition(3)).to_pandas() \
        .sort_values("canon_url").reset_index(drop=True)
    assert out["canon_url"].tolist() == ["http://a.com/x",
                                         "http://b.com/y"]
    assert out["doc_id"].tolist() == [2, 7]      # min doc_id wins


# --------------------------------------------------------------------------
# Cross-document line dedup (CCNet-style)
# --------------------------------------------------------------------------

def _line_dedup_rows(ray_docs):
    import ray.data

    out = curation.line_dedup(ray.data.from_items(ray_docs))
    return {r["doc_id"]: r for r in out.take_all()}


def test_line_dedup_first_occurrence_wins(ray_session):
    import hashlib

    docs = [{"doc_id": "a", "text": "shared\nonly-a"},
            {"doc_id": "b", "text": "shared\nonly-b"}]
    rows = _line_dedup_rows(docs)
    # winner of "shared" = the doc with the smaller 63-bit LE md5 prefix
    def did(s):
        return int.from_bytes(hashlib.md5(s.encode()).digest()[:8],
                              "little") & 0x7FFFFFFFFFFFFFFF
    keeper, loser = ("a", "b") if did("a") < did("b") else ("b", "a")
    assert rows[keeper]["text"] == f"shared\nonly-{keeper}"
    assert rows[loser]["text"] == f"only-{loser}"
    assert rows[loser]["n_lines"] == 2 and rows[loser]["n_kept"] == 1


def test_line_dedup_within_doc_and_empty_lines(ray_session):
    docs = [{"doc_id": "a", "text": "x\n\nx\n\ny"}]
    rows = _line_dedup_rows(docs)
    # second "x" drops; BOTH empty lines survive (blank separators are
    # never deduplicated)
    assert rows["a"]["text"] == "x\n\n\ny"
    assert rows["a"]["n_lines"] == 5 and rows["a"]["n_kept"] == 4


def test_line_dedup_all_lines_lost_doc_survives(ray_session):
    import hashlib

    def did(s):
        return int.from_bytes(hashlib.md5(s.encode()).digest()[:8],
                              "little") & 0x7FFFFFFFFFFFFFFF
    a, b = sorted(["a", "b"], key=did)
    docs = [{"doc_id": a, "text": "dup"}, {"doc_id": b, "text": "dup"}]
    rows = _line_dedup_rows(docs)
    assert rows[b]["text"] == "" and rows[b]["n_kept"] == 0
    assert rows[a]["text"] == "dup" and rows[a]["n_kept"] == 1


def test_line_dedup_block_split_invariant(ray_session):
    import ray.data

    docs = [{"doc_id": f"d{i}", "text": f"common-line\nuniq-{i % 7}\ntail-{i}"}
            for i in range(40)]
    base = curation.line_dedup(ray.data.from_items(docs))
    split = curation.line_dedup(
        ray.data.from_items(docs).repartition(13))
    key = lambda rows: sorted((r["doc_id"], r["text"], r["n_kept"])
                              for r in rows)
    assert key(base.take_all()) == key(split.take_all())


# --------------------------------------------------------------------------
# DSIR importance scores
# --------------------------------------------------------------------------

def test_dsir_target_scores_higher(ray_session):
    import numpy as np
    import ray.data

    # target docs use a distinct vocabulary; their own score must beat
    # background docs' by construction of the likelihood ratio
    docs = ([{"doc_id": i, "text": "alpha beta gamma alpha beta"}
             for i in range(10)] +
            [{"doc_id": 100 + i, "text": "delta epsilon zeta eta theta"}
             for i in range(40)])
    ds = ray.data.from_items(docs)
    target = ds.filter(expr="doc_id < 10")
    s = {r["doc_id"]: r["dsir_score_fp"]
         for r in curation.dsir_scores(ds, target).take_all()}
    t = np.mean([s[i] for i in range(10)])
    o = np.mean([s[100 + i] for i in range(40)])
    assert t > o


def test_dsir_block_split_invariant(ray_session):
    import ray.data

    docs = [{"doc_id": i, "text": f"tok{i % 5} tok{i % 7} common word"}
            for i in range(80)]
    ds = ray.data.from_items(docs)
    tgt = ray.data.from_items(docs[:8])
    a = sorted((r["doc_id"], r["dsir_score_fp"])
               for r in curation.dsir_scores(ds, tgt).take_all())
    b = sorted((r["doc_id"], r["dsir_score_fp"])
               for r in curation.dsir_scores(
                   ds.repartition(11), tgt).take_all())
    assert a == b


def test_temperature_sample_flattens_head(ray_session):
    import ray.data

    docs = ([{"doc_id": i, "text": "x", "lang": "big"}
             for i in range(400)] +
            [{"doc_id": 1000 + i, "text": "x", "lang": "small"}
             for i in range(100)])
    ds = ray.data.from_items(docs)
    kept = curation.temperature_sample(ds).take_all()
    import collections

    c = collections.Counter(r["lang"] for r in kept)
    assert c["small"] == 100                  # n_min language keeps all
    # big keeps ~ 400·sqrt(100/400) = 200, content-addressed so only
    # statistically near — but DETERMINISTIC: same set every run
    assert 140 <= c["big"] <= 260
    again = curation.temperature_sample(ds.repartition(7)).take_all()
    assert sorted(r["doc_id"] for r in kept) == \
        sorted(r["doc_id"] for r in again)


def test_url_blocklist_filter_suffix_semantics(ray_session):
    import ray.data

    from webtext.functions.curation import url_blocklist_filter

    rows = [
        {"doc_id": 1, "url": "http://site1.example.com/a"},       # exact
        {"doc_id": 2, "url": "HTTP://WWW.Site1.EXAMPLE.com/b"},   # subdom
        {"doc_id": 3, "url": "http://evilsite1.example.com/c"},   # NOT a
        # subdomain (no dot boundary) — must be kept
        {"doc_id": 4, "url": "http://site2.example.com/d"},       # kept
    ]
    out = url_blocklist_filter(ray.data.from_items(rows))
    got = sorted((r["doc_id"], r["host"]) for r in out.take_all())
    assert got == [(3, "evilsite1.example.com"),
                   (4, "site2.example.com")]


def test_pps_sample_weight_monotone_and_deterministic(ray_session):
    import ray.data

    from webtext.functions.curation import pps_sample

    rows = [{"doc_id": i, "source": "s", "n_chars": 10 + 90 * (i % 2)}
            for i in range(400)]
    ds = ray.data.from_items(rows).repartition(4)
    kept = pps_sample(ds, k=100).take_all()
    kept_ids = sorted(r["doc_id"] for r in kept)
    # deterministic under different blocking
    kept2 = sorted(r["doc_id"] for r in
                   pps_sample(ray.data.from_items(rows).repartition(7),
                              k=100).take_all())
    assert kept_ids == kept2
    # size-biased: heavy docs (100 chars) survive ~10x more often
    heavy = sum(1 for i in kept_ids if i % 2 == 1)
    light = len(kept_ids) - heavy
    assert heavy > 3 * max(light, 1)
