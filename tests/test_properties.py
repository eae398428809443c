"""Property-based checks (SURVEY §5): cleanup idempotence, dedup
order-stability, dispatch totality, parser robustness."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from webtext.dom import parse_html
from webtext.oracle import (
    classify_failure,
    extract_document,
    extract_span,
)
from webtext.oracle.cleanup import (
    cleanup_extracted_text,
    remove_duplicate_paragraphs,
)

text_st = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=400)
word_st = st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=10)
para_st = st.lists(word_st, min_size=3, max_size=30).map(" ".join)


def test_cleanup_not_strictly_idempotent_reference_faithful():
    """The reference strips BEFORE the printable filter (ref:193 before
    ref:195-203), so dropping a trailing unprintable can expose new
    trailing whitespace: '0 \\x1b' → '0 ' → (second pass) '0'.  This
    non-idempotence is reference behavior, kept deliberately."""
    assert cleanup_extracted_text("0 \x1b") == "0 "
    assert cleanup_extracted_text("0 ") == "0"


@given(text_st)
@settings(max_examples=200, deadline=None)
def test_cleanup_converges_by_second_application(text):
    c1 = cleanup_extracted_text(text)
    c2 = cleanup_extracted_text(c1)
    assert cleanup_extracted_text(c2) == c2


@given(text_st)
@settings(max_examples=200, deadline=None)
def test_cleanup_output_printable(text):
    out = cleanup_extracted_text(text)
    assert all(ch in "\n\t\r" or ch.isprintable() for ch in out)
    assert "�" not in out


@given(st.lists(para_st, min_size=1, max_size=8))
@settings(max_examples=100, deadline=None)
def test_dedup_is_stable_subsequence(paras):
    text = "\n\n".join(paras)
    out = remove_duplicate_paragraphs(text)
    out_paras = [p for p in out.split("\n\n") if p.strip()]
    # kept paragraphs are a subsequence of the (stripped) input paragraphs
    it = iter(p.strip() for p in paras)
    assert all(any(p == q for q in it) for p in out_paras) or out == text


@given(st.lists(para_st, min_size=1, max_size=8))
@settings(max_examples=100, deadline=None)
def test_dedup_idempotent(paras):
    text = "\n\n".join(paras)
    once = remove_duplicate_paragraphs(text)
    assert remove_duplicate_paragraphs(once) == once


DOMAINS = st.sampled_from([
    "example-news.com", "www.nikkansports.com", "news.yahoo.co.jp",
    "x.com", "instagram.com", "pinterest.com",
    "detail.chiebukuro.yahoo.co.jp", "youtube.com", "no-selectors.net",
])
KINDS = st.sampled_from(["html", "text", "markdown", "pdf"])


@given(DOMAINS, KINDS, text_st)
@settings(max_examples=150, deadline=None)
def test_dispatch_totality(domain, kind, payload):
    """Every (kind, domain, payload) lands in exactly one branch and
    yields a status — never an exception."""
    url = f"https://{domain}/prop/1"
    r = extract_span(kind, payload, "", url)
    assert r.status in ("ok", "timeout", "failed")
    if r.status == "failed":
        assert r.message
        # every produced failure is recognized by the E13 classifier
        assert classify_failure(r.message, url) is not None
    else:
        assert isinstance(r.text, str)


@given(st.text(alphabet=string.printable, max_size=300))
@settings(max_examples=200, deadline=None)
def test_parser_never_raises(junk):
    doc = parse_html(junk)
    doc.get_text(separator="\n", strip=True)
    doc.select("div, .cls, #id, a[href*='x'], main p")


@given(DOMAINS, st.lists(
    st.tuples(st.sampled_from(["html", "text", "image", "video"]), text_st),
    max_size=5))
@settings(max_examples=100, deadline=None)
def test_document_assembly_invariants(domain, kind_payloads):
    spans = []
    for off, (kind, payload) in enumerate(kind_payloads):
        media_ref = f"media://d/{off}" if kind in ("image", "video") else ""
        text = payload if kind not in ("image", "video") else ""
        spans.append({"kind": kind, "text": text, "media_ref": media_ref,
                      "offset": off})
    r = extract_document(f"https://{domain}/doc/1", spans)
    assert r.status in ("ok", "timeout", "failed", "error_pattern")
    # offsets dense ascending; media refs preserved in relative order
    assert [s["offset"] for s in r.spans] == list(range(len(r.spans)))
    in_media = [s["media_ref"] for s in spans if s["media_ref"]]
    out_media = [s["media_ref"] for s in r.spans if s["kind"] == "media"]
    if r.status in ("ok", "timeout"):
        assert out_media == in_media
    else:
        assert r.spans == []


# -- vectorized kernel properties (no Ray: the in-bucket kernels are pure) --

@settings(max_examples=300, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 5),        # key
                          st.integers(0, 20)),      # ts
                max_size=25),
       st.lists(st.tuples(st.integers(0, 5),
                          st.integers(0, 20),
                          st.integers(100, 199)),   # right id
                max_size=25))
def test_asof_merge_kernel_matches_bruteforce(lefts, rights):
    """The as-of merge kernel == brute force on random timelines:
    inclusive boundary, max-(ts, id) winner, key isolation, unmatched
    lefts dropped."""
    import numpy as np
    import pyarrow as pa

    from webtext.functions.events import _asof_merge_kernel

    lefts = [(k, t, i) for i, (k, t) in enumerate(lefts)]  # unique ids
    rows = ([(k, t, 0, p) for k, t, p in lefts]
            + [(k, t, 1, p) for k, t, p in rights])
    if not rows:
        return
    group = pa.Table.from_arrays(
        [pa.array([r[0] for r in rows], pa.int64()),
         pa.array([r[1] for r in rows], pa.int64()),
         pa.array(np.array([r[2] for r in rows], dtype=np.int8)),
         pa.array([r[3] for r in rows], pa.int64())],
        names=["key", "ts", "is_right", "payload"])
    out = _asof_merge_kernel(group, "lid", "key", "rid")
    got = dict(zip(out.column("lid").to_pylist(),
                   out.column("rid").to_pylist()))
    want = {}
    for k, t, p in lefts:
        cands = [(rt, rp) for rk, rt, rp in rights
                 if rk == k and rt <= t]
        if cands:
            want[p] = max(cands)[1]
    assert got == want


@settings(max_examples=300, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 5),        # key
                          st.integers(0, 30)),      # ts
                max_size=25),
       st.lists(st.tuples(st.integers(0, 5),
                          st.integers(0, 30),
                          st.integers(100, 199)),   # right id
                max_size=25),
       st.integers(1, 12))                          # window
def test_interval_merge_kernel_matches_bruteforce(lefts, rights, window):
    """The interval merge kernel == brute force: half-open window
    [ts, ts+w), key isolation, every qualifying pair emitted exactly
    once with the right delta."""
    import numpy as np
    import pyarrow as pa

    from webtext.functions.events import _interval_merge_kernel

    lefts = [(k, t, i) for i, (k, t) in enumerate(lefts)]  # unique ids
    rows = ([(k, t, 0, p) for k, t, p in lefts]
            + [(k, t, 1, p) for k, t, p in rights])
    if not rows:
        return
    group = pa.Table.from_arrays(
        [pa.array([r[0] for r in rows], pa.int64()),
         pa.array([r[1] for r in rows], pa.int64()),
         pa.array(np.array([r[2] for r in rows], dtype=np.int8)),
         pa.array([r[3] for r in rows], pa.int64())],
        names=["key", "ts", "is_right", "payload"])
    out = _interval_merge_kernel(group, window, "lid", "key", "rid")
    got = sorted(zip(out.column("lid").to_pylist(),
                     out.column("rid").to_pylist(),
                     out.column("delta_us").to_pylist()))
    want = sorted((lp, rp, rt - lt)
                  for lk, lt, lp in lefts
                  for rk, rt, rp in rights
                  if rk == lk and lt <= rt < lt + window)
    assert got == want


# -- curation kernels vs brute force ----------------------------------------

_word_st = st.text(alphabet="abc", min_size=0, max_size=3)
_doc_st = st.lists(_word_st, min_size=0, max_size=12).map(" ".join)


@given(st.lists(_doc_st, min_size=1, max_size=10))
@settings(max_examples=60, deadline=None)
def test_repetition_stats_matches_bruteforce(texts):
    import pyarrow as pa

    from webtext.functions.curation import repetition_stats_batch

    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = repetition_stats_batch(t).to_pydict()
    for i, text in enumerate(texts):
        toks = text.split(" ")
        g2 = [tuple(toks[j:j + 2]) for j in range(len(toks) - 1)]
        g3 = [tuple(toks[j:j + 3]) for j in range(len(toks) - 2)]
        assert out["n_toks"][i] == len(toks)
        assert out["n_uniq_toks"][i] == len(set(toks))
        assert out["n_2grams"][i] == len(g2)
        assert out["n_uniq_2grams"][i] == len(set(g2))
        assert out["n_3grams"][i] == len(g3)
        assert out["n_uniq_3grams"][i] == len(set(g3))


@given(st.lists(_doc_st, min_size=1, max_size=8),
       st.lists(_doc_st, min_size=1, max_size=4),
       st.integers(2, 4))
@settings(max_examples=40, deadline=None)
def test_gram_membership_matches_bruteforce(corpus, bench, n):
    """The hash-set membership test used by decontaminate equals exact
    string n-gram intersection (no false hits at test scale)."""
    import numpy as np
    import pyarrow as pa

    from webtext.functions.curation import _gram_hashes

    def grams(text):
        toks = text.split(" ")
        return {tuple(toks[j:j + n]) for j in range(len(toks) - n + 1)}

    bench_set = set().union(*(grams(b) for b in bench)) if bench else set()

    chunk = pa.array([t.split(" ") for t in corpus])
    rows, h = _gram_hashes(chunk, n)
    bchunk = pa.array([t.split(" ") for t in bench])
    _, bh = _gram_hashes(bchunk, n)
    bh = np.unique(bh)
    contaminated_hash = set()
    if len(h) and len(bh):
        pos = np.searchsorted(bh, h)
        pos[pos == len(bh)] = 0
        contaminated_hash = set(rows[bh[pos] == h].tolist())
    contaminated_true = {i for i, t in enumerate(corpus)
                         if grams(t) & bench_set}
    assert contaminated_hash == contaminated_true


@given(st.lists(_doc_st, min_size=1, max_size=10))
@settings(max_examples=40, deadline=None)
def test_redact_pii_noop_on_clean_text(texts):
    """Texts with no digits or @ are untouched and count zero."""
    import pyarrow as pa

    from webtext.functions.curation import redact_pii_batch

    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = redact_pii_batch(t).to_pydict()
    assert out["clean_text"] == texts
    assert not any(out["n_email"] + out["n_ip"] + out["n_phone"])


def test_cell_member_pairs_matches_brute_force():
    """The shared vectorized pair kernel (minhash/simhash/phash
    emitters) equals per-cell brute force on random inputs, including
    duplicate rows, payload carry, and empty/edge cases."""
    import itertools
    import random

    import numpy as np

    from webtext.functions.dedup import _cell_member_pairs, _popcount64

    random.seed(7)
    for _ in range(300):
        n = random.randint(0, 14)
        c1 = np.array([random.randint(0, 2) for _ in range(n)],
                      dtype=np.int64)
        c2 = np.array([random.randint(0, 2) for _ in range(n)],
                      dtype=np.int64)
        mem = np.array([random.randint(0, 5) for _ in range(n)],
                       dtype=np.int64)
        pay = mem * 13 + 5
        lo, ro, pl, pr = _cell_member_pairs((c1, c2), mem, pay)
        got = set(zip(lo.tolist(), ro.tolist(), pl.tolist(),
                      pr.tolist()))
        cells = {}
        for a, b, m in zip(c1, c2, mem):
            cells.setdefault((int(a), int(b)), set()).add(int(m))
        want = set()
        for ms in cells.values():
            for x, y in itertools.combinations(sorted(ms), 2):
                want.add((x, y, x * 13 + 5, y * 13 + 5))
        assert got == want

    assert _popcount64(np.array([0, 1, 3, (1 << 64) - 1],
                                dtype=np.uint64)).tolist() == [0, 1, 2,
                                                               64]


@settings(max_examples=200, deadline=None)
@given(
    scheme=st.sampled_from(["http", "HTTP", "https", "HtTpS"]),
    host=st.from_regex(r"[A-Za-z0-9.\-]{1,12}", fullmatch=True),
    port=st.sampled_from(["", ":80", ":443", ":8080"]),
    path=st.from_regex(r"(/[A-Za-z0-9._\-]{0,8}){0,3}/?",
                       fullmatch=True),
    query=st.sampled_from(
        ["", "?id=1", "?utm_source=x", "?utm_a=1&id=2&utm_b=3",
         "?id=1&gclid=g&z=2", "?fbclid=f"]),
    frag=st.sampled_from(["", "#x", "#Sec-2"]),
)
def test_url_canonicalize_idempotent(scheme, host, port, path, query,
                                     frag):
    """Canonical forms are fixed points: canon(canon(u)) == canon(u)
    for every generated url — the defining property of a
    canonicalizer (a second pass must find nothing to rewrite)."""
    import pyarrow as pa

    from webtext.functions.curation import canonicalize_urls_batch

    url = f"{scheme}://{host}{port}{path}{query}{frag}"

    def canon(u: str) -> str:
        t = pa.table({"doc_id": pa.array([0], pa.int64()),
                      "url": pa.array([u])})
        return canonicalize_urls_batch(t).column(
            "canon_url").to_pylist()[0]

    once = canon(url)
    assert canon(once) == once
