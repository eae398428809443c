"""Web-graph operator tests (webtext/pipelines/webgraph.py): crafted
anchor/host semantics, block-split invariance, and a dense PageRank
differential on a tiny crafted graph."""

import numpy as np
import pyarrow as pa

from webtext.pipelines.webgraph import (
    _outlinks_batch,
    anchor_stats,
    host_edges,
    host_of,
    host_pagerank,
    linkweb_fixture_docs,
    outlinks,
)
from webtext.schema import INPUT_SCHEMA


def _doc(doc_id: str, html: str) -> dict:
    return {"doc_id": doc_id,
            "spans": [{"kind": "html", "text": html,
                       "media_ref": "", "offset": 0}]}


def _links_of(html: str) -> list[tuple[str, str]]:
    t = pa.Table.from_pylist([_doc("https://t.example/x", html)],
                             schema=INPUT_SCHEMA)
    out = _outlinks_batch(t)
    return list(zip(out.column("href").to_pylist(),
                    out.column("anchor").to_pylist()))


def test_outlinks_entities_and_inner_tags():
    html = ('<a href="https://a.example/p?x=1&amp;y=2">one <b>two</b>'
            '&amp;co</a>')
    assert _links_of(html) == [("https://a.example/p?x=1&y=2",
                                "one two&co")]


def test_outlinks_inner_tags_concatenate_without_space():
    # DOM text nodes concatenate: <b>x</b>y -> "xy"
    assert _links_of('<a href="https://a.example/">ab<b>c</b>d</a>') \
        == [("https://a.example/", "abcd")]


def test_outlinks_skips_empty_and_missing_href():
    html = ('<a href="">empty</a><a name="frag">no href</a>'
            '<a href="https://k.example/">kept</a>')
    assert _links_of(html) == [("https://k.example/", "kept")]


def test_outlinks_ignores_non_html_spans():
    t = pa.Table.from_pylist(
        [{"doc_id": "https://t.example/y",
          "spans": [{"kind": "text",
                     "text": '<a href="https://x.example/">x</a>',
                     "media_ref": "", "offset": 0}]}],
        schema=INPUT_SCHEMA)
    assert _outlinks_batch(t).num_rows == 0


def test_outlinks_multiline_and_attr_order():
    html = ('<a class="c"\n   href="https://m.example/p"\n   id="i">\n'
            "  spread\n  text\n</a>")
    assert _links_of(html) == [("https://m.example/p", "spread text")]


def test_host_rule():
    assert host_of("https://A.Example.ORG:8080/x?q#f") \
        == "a.example.org:8080"
    assert host_of("HTTPS://HUB.example.org/TOP") == "hub.example.org"
    assert host_of("/relative/path") == ""
    assert host_of("//proto.relative/x") == ""
    assert host_of("mailto:x@y.example") == ""
    assert host_of("") == ""


def test_outlinks_block_split_invariance(ray_session):
    import ray.data

    docs = linkweb_fixture_docs(n_docs=30)
    table = pa.Table.from_pylist(docs, schema=INPUT_SCHEMA)

    def rows(n_blocks):
        ds = ray.data.from_arrow(table).repartition(n_blocks)
        out = outlinks(ds).take_all()
        return sorted((r["src"], r["href"], r["anchor"]) for r in out)

    assert rows(1) == rows(7)


def test_anchor_stats_tie_breaks(ray_session):
    import ray.data

    # href T: anchor "b" x2, "a" x2 (tie -> "a"); 2 distinct docs, 4 links
    docs = [
        _doc("https://d1.example/1",
             '<a href="https://T.target/">b</a><a href="https://T.target/">a</a>'),
        _doc("https://d2.example/2",
             '<a href="https://T.target/">b</a><a href="https://T.target/">a</a>'),
    ]
    ds = ray.data.from_arrow(
        pa.Table.from_pylist(docs, schema=INPUT_SCHEMA)).repartition(2)
    out = anchor_stats(outlinks(ds)).take_all()
    assert len(out) == 1
    r = out[0]
    assert (r["href"], r["n_links"], r["n_docs"], r["top_anchor"]) \
        == ("https://T.target/", 4, 2, "a")


def test_host_pagerank_matches_dense(ray_session):
    """Distributed integer fixed-point PageRank over the fixture's host
    graph == a dense np.add.at recurrence computed here (independent of
    tools/gen_goldens.py)."""
    import hashlib

    import ray.data

    docs = linkweb_fixture_docs(n_docs=40)
    table = pa.Table.from_pylist(docs, schema=INPUT_SCHEMA)
    ds = ray.data.from_arrow(table).repartition(5)
    got = {r["host"]: r["rank"]
           for r in host_pagerank(ds).take_all()}

    # dense reference
    def u63(s):
        return int.from_bytes(hashlib.md5(s.encode()).digest()[:8],
                              "big") & 0x7FFFFFFFFFFFFFFF

    pairs, names = {}, {}
    for d in docs:
        sh = host_of(d["doc_id"])
        for s in d["spans"]:
            import re
            for m in re.finditer(
                    r'<a\s[^>]*?href\s*=\s*"([^"]*)"[^>]*>', s["text"]):
                import html as H
                dh = host_of(H.unescape(m.group(1)))
                if sh and dh:
                    k = (u63(sh), u63(dh))
                    names[k[0]], names[k[1]] = sh, dh
                    pairs[k] = pairs.get(k, 0) + 1
    esrc = np.array([k[0] for k in pairs], dtype=np.int64)
    edst = np.array([k[1] for k in pairs], dtype=np.int64)
    ew = np.array(list(pairs.values()), dtype=np.int64)
    nodes = np.unique(np.concatenate([esrc, edst]))
    si, di = np.searchsorted(nodes, esrc), np.searchsorted(nodes, edst)
    outdeg = np.zeros(len(nodes), dtype=np.int64)
    np.add.at(outdeg, si, ew)
    base = np.int64(10**12 // len(nodes))
    rank = np.full(len(nodes), base, dtype=np.int64)
    for _ in range(8):
        share = np.where(outdeg > 0, rank // np.maximum(outdeg, 1),
                         np.int64(0))
        inflow = np.zeros(len(nodes), dtype=np.int64)
        np.add.at(inflow, di, share[si] * ew)
        rank = (np.int64(3) * base) // np.int64(20) \
            + (np.int64(17) * inflow) // np.int64(20)
    want = {names[int(n)]: int(r) for n, r in zip(nodes, rank)}
    assert got == want


def test_host_edges_weights(ray_session):
    import ray.data

    docs = [
        _doc("https://s.example/1",
             '<a href="https://t.example/a">x</a>'
             '<a href="https://t.example/b">y</a>'
             '<a href="/rel">dropped</a>'),
    ]
    ds = ray.data.from_arrow(
        pa.Table.from_pylist(docs, schema=INPUT_SCHEMA))
    edges = host_edges(outlinks(ds)).take_all()
    assert len(edges) == 1
    assert edges[0]["w"] == 2  # two links, one host pair


def test_fixture_deterministic():
    a = linkweb_fixture_docs()
    b = linkweb_fixture_docs()
    assert a == b


def test_doc_authority_hostless_and_unranked(ray_session):
    import ray.data

    from webtext.pipelines.webgraph import doc_authority

    docs = [
        _doc("https://s.example/1", '<a href="https://t.example/">x</a>'),
        _doc("not-a-url-doc", "<p>no anchors</p>"),       # hostless
        _doc("https://lonely.example/2", "<p>no anchors</p>"),  # unranked
    ]
    ds = ray.data.from_arrow(
        pa.Table.from_pylist(docs, schema=INPUT_SCHEMA))
    ranks = host_pagerank(ds)
    out = {r["doc_id"]: (r["host"], r["rank"])
           for r in doc_authority(ds, ranks).take_all()}
    assert len(out) == 3
    assert out["not-a-url-doc"] == ("", 0)
    assert out["https://lonely.example/2"] == ("lonely.example", 0)
    assert out["https://s.example/1"][0] == "s.example"
    assert out["https://s.example/1"][1] > 0  # in-graph source host


def test_authority_sample_blocking_invariant_and_weighted(ray_session):
    import ray.data

    from webtext.pipelines.webgraph import authority_sample, doc_authority

    docs = linkweb_fixture_docs(n_docs=50)
    table = pa.Table.from_pylist(docs, schema=INPUT_SCHEMA)

    def sample(n_blocks):
        ds = ray.data.from_arrow(table).repartition(n_blocks)
        return sorted(r["doc_id"]
                      for r in authority_sample(ds, k=20).take_all())

    s1 = sample(1)
    assert s1 == sample(6)          # content-addressed, not block-dependent
    assert 0 < len(s1) < 50          # neither empty nor everything
    # every sampled doc has positive authority (rank-0 docs can't be kept)
    ds = ray.data.from_arrow(table)
    ranks = {r["doc_id"]: r["rank"]
             for r in doc_authority(ds, host_pagerank(ds)).take_all()}
    assert all(ranks[d] > 0 for d in s1)


def test_sbucket_nul_batch_equals_solo():
    # pandas hash_array's categorize=True default mis-hashes embedded-
    # NUL strings context-dependently; _sbucket must hash each element
    # independently of its neighbours (see _sbucket docstring)
    from webtext.functions.dedup import _sbucket

    combs = [f"host{a}.example.org\x00site{b}.example.net"
             for a in range(9) for b in range(a + 1, 9)]
    batch = _sbucket(combs)
    solo = np.array([_sbucket([c])[0] for c in combs])
    assert (batch == solo).all()


def test_host_cocitation_matches_brute(ray_session):
    import itertools
    from collections import Counter, defaultdict

    import ray

    from webtext.pipelines.webgraph import host_cocitation

    docs = linkweb_fixture_docs(n_docs=40, seed=3)
    t = pa.Table.from_pylist(docs, schema=INPUT_SCHEMA)
    links = outlinks(ray.data.from_arrow(t).repartition(5))
    got = {(r.host1, r.host2): r.n_docs
           for r in host_cocitation(links).to_pandas().itertuples()}

    per_src = defaultdict(set)
    for d in docs:
        import re as _re
        from webtext.pipelines.webgraph import ANCHOR_RE, host_of
        import html as _h
        for m in ANCHOR_RE.finditer(d["spans"][0]["text"]):
            h = host_of(_h.unescape(m.group(1)))
            if h:
                per_src[d["doc_id"]].add(h)
    want: Counter = Counter()
    for hs in per_src.values():
        for a, b in itertools.combinations(sorted(hs), 2):
            want[(a, b)] += 1
    assert got == dict(want)


def test_host_coupling_matches_brute(ray_session):
    import html as _h
    import itertools
    from collections import defaultdict

    import ray

    from webtext.pipelines.webgraph import (ANCHOR_RE, host_coupling,
                                            host_of)

    docs = linkweb_fixture_docs(n_docs=36, seed=5)
    t = pa.Table.from_pylist(docs, schema=INPUT_SCHEMA)
    links = outlinks(ray.data.from_arrow(t).repartition(5))
    df = host_coupling(links).to_pandas()
    got = {(r.host1, r.host2): (r.inter, r.union, r.jaccard_micro)
           for r in df.itertuples()}

    per_host = defaultdict(set)
    for d in docs:
        sh = host_of(d["doc_id"])
        for m in ANCHOR_RE.finditer(d["spans"][0]["text"]):
            dh = host_of(_h.unescape(m.group(1)))
            if sh and dh:
                per_host[sh].add(dh)
    want = {}
    for a, b in itertools.combinations(sorted(per_host), 2):
        inter = len(per_host[a] & per_host[b])
        if inter:
            union = len(per_host[a] | per_host[b])
            want[(a, b)] = (inter, union, inter * 1_000_000 // union)
    assert got == want
