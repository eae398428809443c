"""Scale-posture tests: wide rows, pathological dedup, youtube parity."""

import time

import pytest

from webtext.dom import parse_html
from webtext.oracle import extract_document, extract_span
from webtext.oracle.cleanup import remove_duplicate_paragraphs
from webtext.oracle.handlers import handle_youtube


def test_youtube_handler_labels():
    doc = parse_html(
        '<html><body><h1 class="title">My Video Title</h1>'
        '<div id="description-inline-expander">line one<br>line two</div>'
        "</body></html>")
    out = handle_youtube(doc, "https://youtube.com/watch?v=1")
    assert out.startswith("【タイトル】My Video Title")
    assert "【説明】" in out and "line one" in out


def test_youtube_handler_empty():
    assert handle_youtube(parse_html("<body></body>"), "u") == ""


def test_multi_megabyte_html_span():
    """Wide-row posture: a ~2 MB page extracts correctly and in bounded
    time (block-size tuning relies on this not exploding)."""
    para = "words and more words in a paragraph of reasonable size. " * 10
    body = "".join(f"<p>{para}</p>" for _ in range(3600))   # ~2 MB
    html = f"<html><body><main>{body}</main></body></html>"
    assert len(html) > 2_000_000
    t0 = time.perf_counter()
    r = extract_span("html", html, "", "https://big.example.com/x")
    dt = time.perf_counter() - t0
    assert r.status == "ok"
    assert len(r.text) > 100_000
    assert dt < 30, f"2MB doc took {dt:.1f}s"


def test_pathological_paragraph_dedup_bounded():
    """E11 is O(P²) worst case (SURVEY hard-part b): 250 distinct
    same-vocab paragraphs (the quick-ratio bound never fires) must stay
    in interactive time via the cached-matcher exact optimization."""
    import random

    vocab = [f"w{i:02d}" for i in range(60)]
    paras = [" ".join(random.Random(i).sample(vocab, 25))
             for i in range(250)]
    text = "\n\n".join(paras)
    # best-of-2 with headroom: the shared microVM jitters single runs
    # 1.3x+ (observed 16.7-21.4 s for identical work); the uncached
    # quadratic path this guards against is minutes, so 35 s still
    # discriminates by an order of magnitude
    dt = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        out = remove_duplicate_paragraphs(text)
        dt = min(dt, time.perf_counter() - t0)
        if dt < 20:
            break
    assert dt < 35, f"250-para dedup took {dt:.1f}s (best of 2)"
    assert len(out.split("\n\n")) == 250   # all kept (they differ)


def test_dedup_budget_yields_timeout_sentinel():
    """Beyond the deterministic budget the document becomes a KEPT
    timeout-sentinel row — the reference's 600 s timeout analogue."""
    from webtext.oracle.rules import TIMEOUT_SENTINEL

    paras = [f"paragraph number {i} " + "y" * 120 for i in range(600)]
    text = "\n\n".join(paras)
    r = extract_span("text", text, "", "https://huge.example.com/x")
    assert r.status == "timeout"
    assert r.text == TIMEOUT_SENTINEL
    doc = extract_document("https://huge.example.com/x",
                           [{"kind": "text", "text": text,
                             "media_ref": "", "offset": 0}])
    assert doc.status == "timeout"
    assert doc.spans[0]["text"] == TIMEOUT_SENTINEL


def test_many_spans_document():
    spans = []
    for i in range(200):
        kind = "image" if i % 3 == 0 else "text"
        spans.append({
            "kind": kind,
            "text": "" if kind == "image"
            else f"span number {i} with some real content in it",
            "media_ref": f"media://d/{i}" if kind == "image" else "",
            "offset": i})
    r = extract_document("https://many.example.com/d", spans)
    assert r.status == "ok"
    assert len(r.spans) == 200


# -- block-split invariance: distributed ops must give identical results
# regardless of how the input is partitioned (the property that makes
# single-node answers transfer to a 256-node cluster)

def _pairs_set(ds_result):
    return {(r["left_id"], r["right_id"]) for r in ds_result.take_all()}


def test_dedup_ops_invariant_under_repartition(ray_session):
    import ray.data

    from webtext.functions import dedup

    ds = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text"])
    for k in (3, 11):
        split = ds.repartition(k)
        assert _pairs_set(dedup.minhash_lsh_pairs(split)) \
            == _pairs_set(dedup.minhash_lsh_pairs(ds))
        assert _pairs_set(dedup.simhash_dup_pairs(split)) \
            == _pairs_set(dedup.simhash_dup_pairs(ds))
    surv_a = sorted(r["doc_id"]
                    for r in dedup.dedup_apply(ds).take_all())
    surv_b = sorted(r["doc_id"]
                    for r in dedup.dedup_apply(ds.repartition(7)).take_all())
    assert surv_a == surv_b


def test_ann_ops_invariant_under_repartition(ray_session):
    import ray.data

    from webtext.functions import ann

    ds = ray.data.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    split = ds.repartition(9)
    assert _pairs_set(ann.lsh_cosine_dup_pairs(ds, 0.4)) \
        == _pairs_set(ann.lsh_cosine_dup_pairs(split, 0.4))
    q = ann.get_query_vector(ds, 0)
    a = [r["vec_id"] for r in ann.knn_ivf(ds, q, k=10).take_all()]
    b = [r["vec_id"] for r in ann.knn_ivf(split, q, k=10).take_all()]
    assert a == b       # fixed-point k-means ⇒ identical probe/topk


def test_connected_components_checkpoint_resume(ray_session, tmp_path):
    """Kill-mid-CC + resume: a run that crashes after committing round
    1 must, when rerun with the same checkpoint_dir, resume from the
    committed label state (not round 0) and produce labels identical to
    an uncheckpointed run."""
    import ray.data

    from webtext.functions import dedup
    from webtext.sources.manifest import CommitManifest

    # a 9-node path graph (worst case for propagation: long chain)
    edges = [{"left_id": i, "right_id": i + 1} for i in range(100, 109)]
    pairs = ray.data.from_items(edges)

    want = {r["node"]: r["label"]
            for r in dedup.connected_components(pairs).take_all()}
    assert set(want.values()) == {100}

    ckpt = str(tmp_path / "cc_ckpt")
    with pytest.raises(RuntimeError, match="injected failure"):
        dedup.connected_components(
            ray.data.from_items(edges), checkpoint_dir=ckpt,
            _fail_after_round=1)
    committed = CommitManifest(ckpt).committed_shards()
    assert "edges" in committed and "round_1" in committed \
        and "round_2" not in committed

    resumed = dedup.connected_components(
        ray.data.from_items(edges), checkpoint_dir=ckpt)
    got = {r["node"]: r["label"] for r in resumed.take_all()}
    assert got == want
    # resume started past the committed rounds
    iters = sorted(r["iter"] for r in CommitManifest(ckpt).records()
                   if str(r.get("shard", "")).startswith("round_"))
    assert iters[0] == 0 and iters[-1] > 1


def test_connected_components_changed_count_witness(ray_session):
    """Two disjoint components converge with an exact changed-count
    witness (no label-sum wraparound concerns) — labels = component
    minima."""
    import ray.data

    from webtext.functions import dedup

    edges = [{"left_id": 1, "right_id": 2},
             {"left_id": 2, "right_id": 3},
             {"left_id": 50, "right_id": 60}]
    labels = {r["node"]: r["label"]
              for r in dedup.connected_components(
                  ray.data.from_items(edges)).take_all()}
    assert labels == {1: 1, 2: 1, 3: 1, 50: 50, 60: 50}


def test_relational_joins_invariant_under_repartition(ray_session):
    """Block-split invariance for the bucketed join pipelines: Q3 /
    Q5 / window ops must produce IDENTICAL rows regardless of how the
    inputs are split — single-node answers transfer to a cluster by
    construction."""
    import ray.data

    from webtext.functions.events import lag_deltas, rolling_sums
    from webtext.pipelines.tpch import (local_supplier_volume,
                                        shipping_priority)

    sf = "/root/testdata/sf0.001"

    def rd(t, parts=None):
        ds = ray.data.read_parquet(f"{sf}/{t}.parquet")
        return ds.repartition(parts) if parts else ds

    def rows(ds):
        return sorted(tuple(sorted(r.items())) for r in ds.take_all())

    a = rows(shipping_priority(rd("customer"), rd("orders"),
                               rd("lineitem")))
    b = rows(shipping_priority(rd("customer", 7), rd("orders", 3),
                               rd("lineitem", 11)))
    assert a == b and len(a) > 0

    a5 = rows(local_supplier_volume(rd("customer"), rd("orders"),
                                    rd("lineitem"), rd("supplier"),
                                    rd("nation")))
    b5 = rows(local_supplier_volume(rd("customer", 5), rd("orders", 9),
                                    rd("lineitem", 2), rd("supplier", 3),
                                    rd("nation", 2)))
    assert a5 == b5 and len(a5) > 0

    ev = ray.data.read_parquet(f"{sf}/events.parquet",
                               columns=["event_id", "user_id", "ts",
                                        "value"])
    assert rows(rolling_sums(ev)) == rows(rolling_sums(ev.repartition(9)))
    assert rows(lag_deltas(ev)) == rows(lag_deltas(ev.repartition(4)))
