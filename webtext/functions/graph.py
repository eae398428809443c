"""Graph operators over an (src, dst) int64 edge table.

Beyond the reference (its pipelines stop at link *lists*): a web-scale
corpus is also a link *graph*, and training-data curation wants graph
signals (degree features, PageRank-style authority for quality
weighting — the classic web-spam / quality prior).

Everything here follows the repo's two scale rules:

* shuffles are constant-fan-out — the only map_groups is over
  hash(key) % N_SHUFFLE_BUCKETS buckets (256 Python groups per
  all-to-all, never one per node); per-node aggregation uses NATIVE
  ``groupby(...).sum`` hash aggregates;
* PageRank state is integer fixed-point (rank in 1e-12 units of total
  mass, shares via int64 floor division), so every distributed sum is
  order-invariant and the result is bit-identical to the dense
  single-process golden in tools/gen_goldens.py — same trick as the
  distributed IVF k-means fit (functions/ann.py).

The driver query builds a bipartite part->supplier digraph from
lineitem (node ids disambiguated as 2*l_partkey / 2*l_suppkey+1);
``degrees`` has a live DuckDB SQL oracle, ``pagerank`` a differential
golden.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .dedup import N_SHUFFLE_BUCKETS, _col_i64, _ibucket

PAGERANK_SCALE = 10**12        # fixed-point quantum: 1e-12 of total mass
PAGERANK_ITERS = 8
# iteration state compacted to few blocks before each materialize —
# per-round cost must be task coordination over O(state) bytes, not
# O(input blocks) tasks (the connected-components lesson, dedup.py)
STATE_BLOCKS = max(2, N_SHUFFLE_BUCKETS // 32)
# damping 0.85 as the exact rational 17/20 — floor-division recurrence
PR_D_NUM, PR_D_DEN = 17, 20


def lineitem_edges(ds):
    """(src, dst, w): weighted part->supplier edges from lineitem,
    multi-edges collapsed to integer weights by a per-batch combiner +
    one native groupby sum (the shuffle ships (src, dst, w) partials,
    never lineitem rows)."""

    def partial(batch: pa.Table) -> pa.Table:
        src = _col_i64(batch, "l_partkey") * 2
        dst = _col_i64(batch, "l_suppkey") * 2 + 1
        t = pa.Table.from_arrays(
            [pa.array(src), pa.array(dst)], names=["src", "dst"])
        agg = t.group_by(["src", "dst"]).aggregate([("dst", "count")])
        return agg.rename_columns(["src", "dst", "w"])

    summed = ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True) \
        .groupby(["src", "dst"]).sum("w")
    return summed.map_batches(
        lambda b: b.rename_columns(["src", "dst", "w"]),
        batch_format="pyarrow", zero_copy_batch=True)


def degrees(edges):
    """(node, out_deg, in_deg) with edge multiplicity: both roles emit
    per-batch partial counts, one native groupby(node).sum — no Python
    groups anywhere."""

    def partial(batch: pa.Table) -> pa.Table:
        src = _col_i64(batch, "src")
        dst = _col_i64(batch, "dst")
        w = _col_i64(batch, "w")
        node = np.concatenate([src, dst])
        return pa.Table.from_arrays(
            [pa.array(node),
             pa.array(np.concatenate([w, np.zeros_like(w)])),
             pa.array(np.concatenate([np.zeros_like(w), w]))],
            names=["node", "out_deg", "in_deg"])

    summed = edges.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True) \
        .groupby("node").sum(["out_deg", "in_deg"])
    return summed.map_batches(
        lambda b: b.rename_columns(["node", "out_deg", "in_deg"]),
        batch_format="pyarrow", zero_copy_batch=True)


def _pr_next_ranks(base: int, out: pa.Table) -> pa.Table:
    """rank' = base + (17 * inflow) // 20, carrying outdeg forward."""
    inflow = _col_i64(out, "sum(contrib)")
    rank = np.int64(base) + (np.int64(PR_D_NUM) * inflow) \
        // np.int64(PR_D_DEN)
    return pa.Table.from_arrays(
        [out.column("node").cast(pa.int64()), pa.array(rank),
         out.column("sum(outdeg)").cast(pa.int64())],
        names=["node", "rank", "outdeg"])


def _pr_bucket_join(group: pa.Table) -> pa.Table:
    """In-bucket share-to-edge attach, single-consumption form: rank
    rows (dst == -1) carry (src=node, outdeg in w, rank-derived share);
    edge rows look their src's share up via searchsorted and emit
    per-dst partial contributions.  Every rank row ALSO re-emits its
    node as a (node, contrib=0, outdeg) row, so the downstream
    groupby(node).sum sees every node and the carried outdeg without a
    second pass over the rank state — rank state is consumed exactly
    once per round, which is what lets the whole fixed point run as one
    lazy streaming plan (a twice-consumed lazy dataset would re-execute
    its lineage per consumer)."""
    src = _col_i64(group, "src")
    dst = _col_i64(group, "dst")
    w = _col_i64(group, "w")
    share = _col_i64(group, "share")
    is_rank = dst == -1
    rsrc, rshare, rdeg = src[is_rank], share[is_rank], w[is_rank]
    order = np.argsort(rsrc, kind="stable")
    rsrc, rshare, rdeg = rsrc[order], rshare[order], rdeg[order]
    esrc, edst, ew = src[~is_rank], dst[~is_rank], w[~is_rank]
    node_rows = [rsrc, np.zeros(len(rsrc), dtype=np.int64), rdeg]
    if len(esrc) and len(rsrc):
        pos = np.searchsorted(rsrc, esrc)
        # every edge src has a rank row in this bucket by construction
        contrib = rshare[pos] * ew
        # in-bucket combiner: pre-sum per dst before the global shuffle
        t = pa.Table.from_arrays([pa.array(edst), pa.array(contrib)],
                                 names=["node", "contrib"])
        agg = t.group_by("node").aggregate([("contrib", "sum")])
        cn = agg.column("node").to_numpy(zero_copy_only=False)
        cc = agg.column("contrib_sum").to_numpy(zero_copy_only=False)
        node_rows = [np.concatenate([node_rows[0], cn]),
                     np.concatenate([node_rows[1], cc]),
                     np.concatenate([node_rows[2],
                                     np.zeros(len(cn), dtype=np.int64)])]
    return pa.Table.from_arrays(
        [pa.array(node_rows[0]), pa.array(node_rows[1]),
         pa.array(node_rows[2])],
        names=["node", "contrib", "outdeg"])


def pagerank(edges, iters: int = PAGERANK_ITERS,
             scale: int = PAGERANK_SCALE,
             n_buckets: int = N_SHUFFLE_BUCKETS):
    """Fixed-point distributed PageRank: (node, rank) with rank in
    ``scale``-ths of total mass after ``iters`` synchronous rounds of

        rank'_v = (3 * rank0) // 20  +  (17 * inflow_v) // 20
        inflow_v = sum over edges u->v of (rank_u // outdeg_u) * w

    where rank0 = scale // N.  Dangling mass (nodes with no out-edges)
    is dropped, the standard no-redistribution variant; every quantity
    is int64, so sums are order-invariant and the distributed result is
    bit-identical to the dense golden.

    Per round: one constant-fan-out bucketed map_groups (rank rows ride
    the shuffle once, edges once) emits BOTH the per-dst contribution
    partials and each node's zero-row with its carried outdeg, then one
    NATIVE groupby(node).sum merges them.  Rank state is consumed
    exactly once per round, so the whole ``iters``-round fixed point is
    a single lazy streaming plan — no per-round materialize barrier, no
    second union pass (the round-3 restructure; the iteration count is
    fixed, so no driver-side decision ever forces execution)."""
    deg = degrees(edges)

    def init_rank(base):
        def f(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            return pa.Table.from_arrays(
                [batch.column("node").cast(pa.int64()),
                 pa.array(np.full(n, base, dtype=np.int64)),
                 batch.column("out_deg").cast(pa.int64())],
                names=["node", "rank", "outdeg"])
        return f

    # deg is a derived dataset consumed twice (count + rank init) —
    # materialize so degrees() executes once
    deg = deg.materialize()
    n_nodes = deg.count()
    base = scale // n_nodes
    ranks = deg.map_batches(init_rank(base), batch_format="pyarrow",
                            zero_copy_batch=True) \
        .repartition(STATE_BLOCKS).materialize()

    def ranks_emit(batch: pa.Table) -> pa.Table:
        node = _col_i64(batch, "node")
        rank = _col_i64(batch, "rank")
        outdeg = _col_i64(batch, "outdeg")
        share = np.where(outdeg > 0, rank // np.maximum(outdeg, 1),
                         np.int64(0))
        neg = np.full(len(node), -1, dtype=np.int64)
        return pa.Table.from_arrays(
            [pa.array(_ibucket(node, n_buckets)), pa.array(node),
             pa.array(neg), pa.array(outdeg), pa.array(share)],
            names=["bucket", "src", "dst", "w", "share"])

    def edges_emit(batch: pa.Table) -> pa.Table:
        src = _col_i64(batch, "src")
        return pa.Table.from_arrays(
            [pa.array(_ibucket(src, n_buckets)),
             pa.array(src),
             batch.column("dst").cast(pa.int64()),
             batch.column("w").cast(pa.int64()),
             pa.array(np.zeros(len(src), dtype=np.int64))],
            names=["bucket", "src", "dst", "w", "share"])

    ebatches = edges.map_batches(edges_emit, batch_format="pyarrow",
                                 zero_copy_batch=True) \
        .repartition(STATE_BLOCKS).materialize()
    base_next = (np.int64(3) * np.int64(base)) // np.int64(PR_D_DEN)
    for _ in range(iters):
        joined = ranks.map_batches(ranks_emit, batch_format="pyarrow",
                                   zero_copy_batch=True).union(ebatches)
        merged = joined.groupby("bucket").map_groups(
            _pr_bucket_join, batch_format="pyarrow") \
            .groupby("node").sum(["contrib", "outdeg"])
        # materialize per round: a 16-all-to-all lazy megaplan is
        # bit-identical but measured 2x SLOWER on the streaming
        # executor than eager rounds (BASELINE.md round-3 cont. 3) —
        # the barrier buys scheduler locality
        ranks = merged.map_batches(
            lambda b: _pr_next_ranks(base_next, b),
            batch_format="pyarrow", zero_copy_batch=True) \
            .repartition(STATE_BLOCKS).materialize()

    return ranks.select_columns(["node", "rank"])
