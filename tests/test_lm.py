"""LM-signal operators (functions/lm.py) vs brute-force references."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pytest

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the cat sat on the hat"),
    (2, "a dog ran in the park and the dog sat"),
    (3, "the cat sat on the mat"),          # exact dup of doc 0
    (4, "single"),                          # no bigram, no 3-window
    (5, "one two three"),
]


def _ds(ray_session):
    import ray.data

    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _ in DOCS], pa.int64()),
        "text": pa.array([t for _, t in DOCS], pa.string())}))


def _brute_lm(scale=1_000_000):
    c2: dict[tuple, int] = {}
    c1: dict[str, int] = {}
    occs = []
    for did, text in DOCS:
        w = text.split(" ")
        for a, b in zip(w, w[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
            c1[a] = c1.get(a, 0) + 1
            occs.append((did, a, b))
    rows: dict[int, list] = {}
    for did, a, b in occs:
        q = (c2[(a, b)] * scale) // c1[a]
        n, s = rows.get(did, (0, 0))
        rows[did] = (n + 1, s + q)
    return pd.DataFrame(
        [(d, n, s) for d, (n, s) in sorted(rows.items())],
        columns=["doc_id", "n_bigrams", "lm_score_micro"])


def _brute_dup(n=3):
    gd: dict[tuple, int] = {}
    for did, text in DOCS:
        w = text.split(" ")
        for i in range(len(w) - n + 1):
            g = " ".join(w[i:i + n])
            gd[(did, g)] = gd.get((did, g), 0) + 1
    ndocs: dict[str, int] = {}
    for (_, g) in gd:
        ndocs[g] = ndocs.get(g, 0) + 1
    rows: dict[int, list] = {}
    for (did, g), cnt in gd.items():
        nw, nd = rows.get(did, (0, 0))
        rows[did] = (nw + cnt, nd + (cnt if ndocs[g] > 1 else 0))
    return pd.DataFrame(
        [(d, nw, nd) for d, (nw, nd) in sorted(rows.items())],
        columns=["doc_id", "n_windows", "n_dup_windows"])


def _canon(df):
    return df.sort_values("doc_id").reset_index(drop=True).astype("int64")


def test_bigram_lm_scores_matches_brute(ray_session):
    from webtext.functions.lm import bigram_lm_scores

    got = _canon(bigram_lm_scores(_ds(ray_session)).to_pandas())
    want = _canon(_brute_lm())
    pd.testing.assert_frame_equal(got, want)
    # the single-token doc emits nothing
    assert 4 not in set(got["doc_id"])


def test_bigram_lm_dup_doc_scores_equal(ray_session):
    from webtext.functions.lm import bigram_lm_scores

    got = bigram_lm_scores(_ds(ray_session)).to_pandas() \
        .set_index("doc_id")
    assert got.loc[0, "lm_score_micro"] == got.loc[3, "lm_score_micro"]


def test_dup_ngram_flags_matches_brute(ray_session):
    from webtext.functions.lm import dup_ngram_flags

    got = _canon(dup_ngram_flags(_ds(ray_session), n=3).to_pandas())
    want = _canon(_brute_dup(3))
    pd.testing.assert_frame_equal(got, want)
    by = got.set_index("doc_id")
    # exact-dup docs 0/3 have every window duplicated; doc 5's windows
    # are unique to it
    assert by.loc[0, "n_dup_windows"] == by.loc[0, "n_windows"]
    assert by.loc[5, "n_dup_windows"] == 0


@pytest.mark.parametrize("parts", [1, 5])
def test_lm_repartition_invariance(ray_session, parts):
    from webtext.functions.lm import bigram_lm_scores, dup_ngram_flags

    ds = _ds(ray_session).repartition(parts)
    assert _canon(bigram_lm_scores(ds).to_pandas()).equals(
        _canon(_brute_lm()))
    assert _canon(dup_ngram_flags(ds, n=3).to_pandas()).equals(
        _canon(_brute_dup(3)))


def test_dup_doc_filter_semantics(ray_session):
    from webtext.functions.lm import dup_doc_filter

    # n=3 windows: docs 0 and 3 are exact dups (100% dup fraction ->
    # dropped); docs 1/2/5 have <=50% dup windows -> kept; doc 4 is too
    # short for any window -> kept by the no-evidence rule
    kept = sorted(r["doc_id"] for r in
                  dup_doc_filter(_ds(ray_session), n=3).take_all())
    brute = _brute_dup(3).set_index("doc_id")
    expect = sorted(
        [d for d, _ in DOCS
         if d not in brute.index
         or brute.loc[d, "n_dup_windows"] * 100
         <= brute.loc[d, "n_windows"] * 50])
    assert kept == expect
    assert 4 in kept and 0 not in kept and 3 not in kept


def test_string_intersect_set_semantics(ray_session):
    import ray.data

    from webtext.pipelines.relational import string_intersect, tokens_of

    a = ray.data.from_items([{"text": "x y z z"}, {"text": "w"}])
    b = ray.data.from_items([{"text": "z q"}, {"text": "y q"}]) \
        .repartition(2)
    got = sorted(r["token"] for r in
                 string_intersect(tokens_of(a), tokens_of(b))
                 .take_all())
    assert got == ["y", "z"]      # w and q are one-sided; dups collapse


def test_incremental_near_dedup_crafted(ray_session):
    import ray.data

    from webtext.pipelines.dedup_pipeline import incremental_near_dedup

    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep dark woods tonight")
    hist = ray.data.from_items([
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": "completely unrelated historical page"},
    ])
    new = ray.data.from_items([
        {"doc_id": 10, "text": base + " extra"},   # near-dup of 1
        {"doc_id": 11, "text": "fresh novel content about query "
                               "engines and shuffle planning"},
        {"doc_id": 12, "text": base + " extra"},   # new-vs-new dup of
    ]).repartition(2)                              # 10 — KEPT by spec
    surv = sorted(r["doc_id"] for r in
                  incremental_near_dedup(new, hist, 0.5).take_all())
    assert surv == [11]  # 10 and 12 both near-dup the historical base


def test_incremental_near_dedup_persisted_index(ray_session, tmp_path):
    """The build-once/query-many band-index lifecycle: querying through
    a persisted historical band table is row-identical to the inline
    banding pass, and a second build call is an idempotent no-op."""
    import ray.data

    from webtext.pipelines.dedup_pipeline import (build_near_dedup_index,
                                                  incremental_near_dedup)

    base = ("one two three four five six seven eight nine ten eleven "
            "twelve thirteen fourteen fifteen sixteen")
    hist = ray.data.from_items(
        [{"doc_id": i, "text": f"{base} hist{i}"} for i in range(20)])
    new = ray.data.from_items(
        [{"doc_id": 100, "text": f"{base} hist7 tail"},  # near-dup of 7
         {"doc_id": 101, "text": "entirely different new document "
                                 "about nothing shared at all"}])
    path = str(tmp_path / "bands")
    build_near_dedup_index(hist, path)
    mtimes = sorted((f, (tmp_path / "bands" / f).stat().st_mtime_ns)
                    for f in __import__("os").listdir(path))
    build_near_dedup_index(hist, path)  # idempotent: untouched
    assert mtimes == sorted(
        (f, (tmp_path / "bands" / f).stat().st_mtime_ns)
        for f in __import__("os").listdir(path))
    inline = sorted(r["doc_id"] for r in
                    incremental_near_dedup(new, hist, 0.5).take_all())
    indexed = sorted(
        r["doc_id"] for r in
        incremental_near_dedup(new, hist, 0.5,
                               hist_band_path=path).take_all())
    assert indexed == inline == [101]


# -- ExactSubstr removal ------------------------------------------------------

def test_dedup_substrings_removes_shared_run(ray_session):
    import ray.data

    from webtext.functions.lm import dedup_substrings

    docs = [
        {"doc_id": 1, "text": "a b c d e f g h unique1 tail1"},
        {"doc_id": 2, "text": "prefix2 a b c d e f g h tail2"},
        {"doc_id": 3, "text": "totally different words here now ok"},
        {"doc_id": 4, "text": "short doc"},
        {"doc_id": 5, "text": "x y z w x y z w"},
    ]
    out = {r["doc_id"]: r for r in dedup_substrings(
        ray.data.from_items(docs), k=4).take_all()}
    assert out["1"]["text"] == "unique1 tail1"
    assert out["2"]["text"] == "prefix2 tail2"
    assert out["3"]["n_removed"] == 0
    assert out["4"]["text"] == "short doc"      # < k tokens untouched
    # within-doc repeat: both copies of the duplicated window removed
    assert out["5"]["text"] == "" and out["5"]["n_removed"] == 8


def test_dedup_substrings_split_invariant(ray_session):
    import ray.data

    from webtext.functions.lm import dedup_substrings

    docs = [{"doc_id": i,
             "text": " ".join(f"t{(i * 7 + j) % 23}" for j in range(30))}
            for i in range(60)]
    a = sorted((r["doc_id"], r["text"], r["n_removed"])
               for r in dedup_substrings(
                   ray.data.from_items(docs), k=5).take_all())
    b = sorted((r["doc_id"], r["text"], r["n_removed"])
               for r in dedup_substrings(
                   ray.data.from_items(docs).repartition(11),
                   k=5).take_all())
    assert a == b


def test_perplexity_buckets_tertiles_and_split_invariance(ray_session):
    import ray.data

    from webtext.functions.lm import bigram_lm_scores, perplexity_buckets

    # 90 docs over a shared vocabulary: fluent docs repeat a common
    # bigram chain, noisy docs use rarer transitions
    docs = [{"doc_id": i,
             "text": " ".join(f"w{(i * 3 + j) % (5 + i % 17)}"
                              for j in range(20))}
            for i in range(90)]
    ds = ray.data.from_items(docs)
    out = perplexity_buckets(ds).take_all()
    assert len(out) == 90
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r["bucket"], []).append(r["lm_avg_micro"])
    assert set(by_bucket) == {"head", "middle", "tail"}
    # threshold semantics: every tail score <= every head score
    assert max(by_bucket["tail"]) <= min(by_bucket["head"])
    # bucketing is threshold-based, so block layout cannot change it
    b = perplexity_buckets(ds.repartition(13)).take_all()
    assert sorted((r["doc_id"], r["bucket"]) for r in out) \
        == sorted((r["doc_id"], r["bucket"]) for r in b)
    # scores agree with bigram_lm_scores' integer average
    scores = {r["doc_id"]: r["lm_score_micro"] // r["n_bigrams"]
              for r in bigram_lm_scores(ds).take_all()}
    for r in out:
        assert r["lm_avg_micro"] == scores[r["doc_id"]]


def test_dice_collocations_matches_brute(ray_session):
    import collections

    import ray.data

    from webtext.functions.lm import dice_collocations

    docs = [{"doc_id": i,
             "text": " ".join(f"v{(i + j * j) % 13}" for j in range(25))}
            for i in range(40)]
    # brute force with arbitrary-precision ints
    c2 = collections.Counter()
    for d in docs:
        t = d["text"].split(" ")
        for a, b in zip(t, t[1:]):
            c2[(a, b)] += 1
    u1 = collections.Counter()
    u2 = collections.Counter()
    for (a, b), c in c2.items():
        u1[a] += c
        u2[b] += c
    want = sorted(
        ((a, b, c, 2 * c * 1_000_000 // (u1[a] + u2[b]))
         for (a, b), c in c2.items() if c >= 2),
        key=lambda r: (-r[3], r[0], r[1]))[:50]
    ds = ray.data.from_items(docs)
    got = [(r["w1"], r["w2"], r["c2"], r["dice_micro"])
           for r in dice_collocations(ds).take_all()]
    assert got == want
    got2 = [(r["w1"], r["w2"], r["c2"], r["dice_micro"])
            for r in dice_collocations(ds.repartition(9)).take_all()]
    assert got2 == want


def test_quality_stratified_sample_rates(ray_session):
    import ray.data

    from webtext.functions.lm import (perplexity_buckets,
                                      quality_stratified_sample)

    docs = [{"doc_id": i,
             "text": " ".join(f"w{(i * 3 + j) % (5 + i % 17)}"
                              for j in range(20))}
            for i in range(90)]
    ds = ray.data.from_items(docs)
    buckets = {r["doc_id"]: r["bucket"]
               for r in perplexity_buckets(ds).take_all()}
    out = quality_stratified_sample(ds).take_all()
    kept = {r["doc_id"] for r in out}
    # every head doc survives; every kept doc carries its bucket label
    for r in out:
        assert r["bucket"] == buckets[r["doc_id"]]
    heads = {d for d, b in buckets.items() if b == "head"}
    assert heads <= kept
    # tail is sampled at ~10%: strictly fewer tail docs kept than exist
    tails = {d for d, b in buckets.items() if b == "tail"}
    kept_tails = kept & tails
    assert len(kept_tails) < len(tails)
    # keep_tail=0 drops the whole tail deterministically
    none_tail = quality_stratified_sample(ds, keep_tail=0).take_all()
    assert not [r for r in none_tail if r["bucket"] == "tail"]


def test_nb_classify_separable_langs(ray_session):
    import ray.data

    from webtext.functions.lm import nb_classify

    # two languages with disjoint vocabularies; doc_id % 10 < 8 trains
    rows = []
    for i in range(40):
        lang = "aa" if i % 2 == 0 else "bb"
        words = (["gato perro casa sol"] if lang == "aa"
                 else ["hund katze haus mond"])
        rows.append({"doc_id": i, "lang": lang,
                     "text": " ".join(words * 3)})
    ds = ray.data.from_items(rows).repartition(4)
    out = nb_classify(ds).take_all()
    # held-out = doc_id % 10 in {8, 9} -> 8 docs
    assert len(out) == 8
    assert all(r["pred"] == r["lang"] for r in out)
    # block-split invariance
    out2 = nb_classify(ray.data.from_items(rows).repartition(7)) \
        .take_all()
    assert sorted((r["doc_id"], r["pred"]) for r in out2) == \
        sorted((r["doc_id"], r["pred"]) for r in out)


def test_nb_classify_tie_breaks_to_smallest_lang(ray_session):
    import ray.data

    from webtext.functions.lm import nb_classify

    # identical text + balanced classes -> every score ties; the
    # prediction must be the lexicographically smallest language
    rows = [{"doc_id": i, "lang": "zz" if i % 2 else "mm",
             "text": "same words every time"} for i in range(20)]
    out = nb_classify(ray.data.from_items(rows).repartition(3)) \
        .take_all()
    assert out and all(r["pred"] == "mm" for r in out)


def test_nb_classify_empty_training_slice(ray_session):
    import ray.data

    from webtext.functions.lm import nb_classify

    # every doc_id lands in the held-out slice -> no trained classes
    rows = [{"doc_id": i, "lang": "aa", "text": "x y"}
            for i in (8, 9, 18, 19)]
    out = nb_classify(ray.data.from_items(rows)).take_all()
    assert out == []
