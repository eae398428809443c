"""Graph operators: degrees and fixed-point PageRank."""

import numpy as np
import pyarrow as pa

from webtext.functions import graph


def _edges_ds(rows):
    import ray.data

    return ray.data.from_arrow(pa.table({
        "src": pa.array([r[0] for r in rows], pa.int64()),
        "dst": pa.array([r[1] for r in rows], pa.int64()),
        "w": pa.array([r[2] for r in rows], pa.int64())}))


def _dense_pagerank(rows, iters=graph.PAGERANK_ITERS,
                    scale=graph.PAGERANK_SCALE):
    """Independent dense reference (mirrors tools/gen_goldens.py)."""
    esrc = np.array([r[0] for r in rows], dtype=np.int64)
    edst = np.array([r[1] for r in rows], dtype=np.int64)
    ew = np.array([r[2] for r in rows], dtype=np.int64)
    nodes = np.unique(np.concatenate([esrc, edst]))
    si = np.searchsorted(nodes, esrc)
    di = np.searchsorted(nodes, edst)
    outdeg = np.zeros(len(nodes), dtype=np.int64)
    np.add.at(outdeg, si, ew)
    base = np.int64(scale // len(nodes))
    base_next = (np.int64(3) * base) // np.int64(graph.PR_D_DEN)
    rank = np.full(len(nodes), base, dtype=np.int64)
    for _ in range(iters):
        share = np.where(outdeg > 0,
                         rank // np.maximum(outdeg, 1), np.int64(0))
        inflow = np.zeros(len(nodes), dtype=np.int64)
        np.add.at(inflow, di, share[si] * ew)
        rank = base_next + (np.int64(graph.PR_D_NUM) * inflow) \
            // np.int64(graph.PR_D_DEN)
    return dict(zip(nodes.tolist(), rank.tolist()))


def test_degrees_with_multiplicity(ray_session):
    edges = _edges_ds([(0, 1, 3), (0, 3, 1), (2, 1, 2)])
    got = {r["node"]: (r["out_deg"], r["in_deg"])
           for r in graph.degrees(edges).take_all()}
    assert got == {0: (4, 0), 1: (0, 5), 2: (2, 0), 3: (0, 1)}


def test_pagerank_two_node_cycle(ray_session):
    # symmetric cycle: ranks stay equal, mass conserved up to floor
    edges = _edges_ds([(0, 1, 1), (1, 0, 1)])
    got = {r["node"]: r["rank"]
           for r in graph.pagerank(edges).take_all()}
    assert got == _dense_pagerank([(0, 1, 1), (1, 0, 1)])
    assert got[0] == got[1]


def test_pagerank_matches_dense_reference(ray_session):
    rng = np.random.RandomState(7)
    rows = [(int(rng.randint(0, 30)), int(rng.randint(0, 30)),
             int(rng.randint(1, 4))) for _ in range(120)]
    rows = [(s, d, w) for s, d, w in rows if s != d]
    # collapse duplicate (src, dst) pairs — the op contract is one
    # weighted edge per pair (lineitem_edges guarantees this upstream)
    agg = {}
    for s, d, w in rows:
        agg[(s, d)] = agg.get((s, d), 0) + w
    rows = [(s, d, w) for (s, d), w in agg.items()]
    got = {r["node"]: r["rank"]
           for r in graph.pagerank(edges=_edges_ds(rows)).take_all()}
    assert got == _dense_pagerank(rows)


def test_pagerank_split_invariant(ray_session):
    rows = [(i % 9, (i * 7) % 9 or 1, 1 + i % 3) for i in range(40)
            if i % 9 != ((i * 7) % 9 or 1)]
    agg = {}
    for s, d, w in rows:
        agg[(s, d)] = agg.get((s, d), 0) + w
    rows = [(s, d, w) for (s, d), w in agg.items()]
    one = {r["node"]: r["rank"]
           for r in graph.pagerank(_edges_ds(rows)).take_all()}
    many = {r["node"]: r["rank"]
            for r in graph.pagerank(
                _edges_ds(rows).repartition(5)).take_all()}
    assert one == many


def test_lineitem_edges_collapse_multiedges(ray_session):
    import ray.data

    li = ray.data.from_arrow(pa.table({
        "l_partkey": pa.array([1, 1, 2], pa.int64()),
        "l_suppkey": pa.array([5, 5, 5], pa.int64())}))
    got = sorted((r["src"], r["dst"], r["w"])
                 for r in graph.lineitem_edges(li).take_all())
    assert got == [(2, 11, 2), (4, 11, 1)]


def test_hits_bipartite_ordering_and_invariance(ray_session):
    import ray.data

    from webtext.functions.graph import hits

    # parts 0,2,4 (even) -> suppliers 1,3 (odd); supplier 1 receives
    # from every part, supplier 3 from one part only
    edges = [
        {"src": 0, "dst": 1, "w": 1},
        {"src": 2, "dst": 1, "w": 1},
        {"src": 4, "dst": 1, "w": 1},
        {"src": 4, "dst": 3, "w": 1},
    ]
    out = {r["node"]: (r["hub"], r["auth"])
           for r in hits(ray.data.from_items(edges).repartition(2))
           .take_all()}
    # authorities live on suppliers, hubs on parts
    assert out[1][0] == 0 and out[3][0] == 0
    assert out[0][1] == 0 and out[2][1] == 0 and out[4][1] == 0
    # the all-parts supplier out-ranks the single-part supplier
    assert out[1][1] > out[3][1]
    # the two-link part out-hubs the single-link parts
    assert out[4][0] > out[0][0] == out[2][0]
    # block-split invariance (integer sums + elementwise rescale)
    out2 = {r["node"]: (r["hub"], r["auth"])
            for r in hits(ray.data.from_items(edges).repartition(4))
            .take_all()}
    assert out2 == out


def test_butterfly_count_known_motifs(ray_session):
    """K_{2,2} has exactly 1 butterfly; adding a third part on both
    suppliers makes C(3,2)=3; multi-edges must not inflate counts."""
    import ray.data

    from webtext.functions.graph import butterfly_count

    # parts 2,4,6 (even ids) each connected to suppliers 1,3 (odd ids)
    edges = [{"src": p, "dst": s, "w": 1}
             for p in (2, 4, 6) for s in (1, 3)]
    # a multi-edge duplicate (same src, dst) — must be ignored
    edges.append({"src": 2, "dst": 1, "w": 5})
    # a dangling extra edge that makes no new wedge pair
    edges.append({"src": 8, "dst": 1, "w": 1})
    got = butterfly_count(ray.data.from_items(edges)).to_pylist()[0]
    # wedges: parts 2,4,6 each contribute pair (1,3) → c=3 → C(3,2)=3
    assert got == {"butterflies": 3, "wedges": 3}


def test_butterfly_count_no_wedges(ray_session):
    import ray.data

    from webtext.functions.graph import butterfly_count

    edges = [{"src": 2, "dst": 1, "w": 1}, {"src": 4, "dst": 3, "w": 1}]
    got = butterfly_count(ray.data.from_items(edges)).to_pylist()[0]
    assert got == {"butterflies": 0, "wedges": 0}


def test_pagerank_personalized_uniform_equals_plain(ray_session):
    """Uniform teleport weights reproduce the plain pagerank
    bit-for-bit (p_v = scale//n exactly when all w equal... only when
    scale//W*w matches scale//n — true for w=1, W=n)."""
    import ray.data

    from webtext.functions.graph import pagerank, pagerank_personalized

    edges = [{"src": 2, "dst": 1, "w": 2}, {"src": 4, "dst": 1, "w": 1},
             {"src": 4, "dst": 3, "w": 1}, {"src": 6, "dst": 3, "w": 3}]
    eds = ray.data.from_items(edges)
    nodes = sorted({e["src"] for e in edges} | {e["dst"] for e in edges})
    wds = ray.data.from_items([{"node": n, "w": 1} for n in nodes])
    plain = {r["node"]: r["rank"]
             for r in pagerank(ray.data.from_items(edges)).take_all()}
    pers = {r["node"]: r["rank"]
            for r in pagerank_personalized(eds, wds).take_all()}
    assert plain == pers


def test_pagerank_personalized_concentrates_on_seed(ray_session):
    """All teleport mass on one source node → that node's neighborhood
    outranks the rest; nodes absent from weights still rank via
    inflow; weight rows for non-graph nodes are ignored."""
    import ray.data

    from webtext.functions.graph import pagerank_personalized

    edges = ray.data.from_items([
        {"src": 2, "dst": 1, "w": 1},
        {"src": 4, "dst": 3, "w": 1},
    ])
    weights = ray.data.from_items([
        {"node": 2, "w": 100},      # all teleport mass here
        {"node": 999, "w": 500},    # not in graph → ignored
    ])
    got = {r["node"]: r["rank"]
           for r in pagerank_personalized(edges, weights).take_all()}
    assert set(got) == {1, 2, 3, 4}
    assert got[2] > got[4]          # seed beats unseeded source
    assert got[1] > got[3]          # seed's sink beats unseeded sink
    assert got[4] == 0 and got[3] == 0


def test_lineitem_degrees_fused_equals_composition(ray_session):
    """The one-exchange fused path is row-identical to
    degrees(lineitem_edges(x)) — the edge-collapse groupby cancels
    against the degree sum; block-split invariant."""
    import ray.data

    from webtext.functions.graph import (degrees, lineitem_degrees,
                                         lineitem_edges)

    rows = [{"l_partkey": p, "l_suppkey": s}
            for p, s in [(1, 1), (1, 1), (1, 2), (2, 1), (3, 3),
                         (3, 3), (3, 1)]]
    ds = ray.data.from_items(rows)
    want = sorted((r["node"], r["out_deg"], r["in_deg"]) for r in
                  degrees(lineitem_edges(ds)).take_all())
    for parts in (1, 4):
        got = sorted((r["node"], r["out_deg"], r["in_deg"]) for r in
                     lineitem_degrees(ds.repartition(parts)).take_all())
        assert got == want
