"""Golden expected-output tables for the queries with no SQL oracle.

Each golden is computed by an INDEPENDENT single-process implementation
(pure numpy / python below — no Ray, no webtext.functions imports except
where noted) over the same inputs the driver passes to ``queries()``,
and committed as parquet under ``goldens/<sf_tag>/``.  The matching
``oracle_sql()`` entry is then ``SELECT * FROM read_parquet(...)`` so
the driver hash-checks the Ray pipeline against the golden.

Two families:

* algorithmic ops (minhash / simhash / winnow / LSH-cosine / IVF /
  dedup-apply): re-derived here from the published spec constants
  (seeds, crc32 formulas) — a differential oracle: two implementations
  of one spec must agree bit-for-bit (fixed-point k-means sums make the
  distributed fit order-invariant, see functions/ann.py).
* extraction-surface ops (extract_spans / status / media_features /
  links / rejects / integrate / error-scan): computed by driving the
  pure-Python oracle ``webtext.oracle.extract_document`` directly over
  the deterministic synth corpus — independent of all Ray plumbing
  (actors, manifests, shuffles) that the queries() side exercises.

Regenerate (``python tools/gen_goldens.py``) ONLY on an intended
semantic change, alongside the tests/test_golden.py hash.
"""

from __future__ import annotations

import os
import sys
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
           "/root/testdata/sf0.1"]
OUT_BASE = os.path.join(REPO, "goldens")


# ---------------------------------------------------------------------------
# spec constants, re-derived (must match webtext/functions/dedup.py & ann.py)
# ---------------------------------------------------------------------------

_P = (1 << 61) - 1
_rs = np.random.RandomState(12345)
_A = _rs.randint(1, _P, size=64, dtype=np.int64)
_B = _rs.randint(0, _P, size=64, dtype=np.int64)
BANDS, ROWS_PER_BAND = 16, 4
KMEANS_SCALE = 1_000_000


def minhash_sig(text: str, k: int = 3) -> np.ndarray:
    words = text.split(" ")
    grams = ([" ".join(words)] if len(words) < k else
             [" ".join(words[i:i + k]) for i in range(len(words) - k + 1)])
    h = np.array([zlib.crc32(g.encode("utf-8")) for g in grams],
                 dtype=np.int64)
    return ((np.outer(_A, h) + _B[:, None]) % _P).min(axis=1)


def word_jaccard(a: str, b: str) -> tuple[int, int]:
    sa, sb = set(a.split(" ")), set(b.split(" "))
    return len(sa & sb), len(sa | sb)


def golden_minhash_pairs(ids, texts, threshold=0.5):
    buckets: dict[tuple[int, int], list[int]] = {}
    for did, text in zip(ids, texts):
        sig = minhash_sig(text)
        for b in range(BANDS):
            chunk = sig[b * ROWS_PER_BAND:(b + 1) * ROWS_PER_BAND]
            key = (b, zlib.crc32(chunk.tobytes()))
            buckets.setdefault(key, []).append(did)
    by_id = dict(zip(ids, texts))
    cands = set()
    for members in buckets.values():
        ms = sorted(set(members))
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                cands.add((ms[i], ms[j]))
    out = []
    for a, b in sorted(cands):
        inter, union = word_jaccard(by_id[a], by_id[b])
        if union and inter / union >= threshold:
            out.append((a, b))
    return out


def simhash64(text: str) -> int:
    acc = np.zeros(64, dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    one = np.uint64(1)
    for w in text.split(" "):
        h = np.uint64(zlib.crc32(w.encode())
                      | (zlib.crc32(w[::-1].encode()) << 32))
        bits = (h >> shifts) & one
        acc += np.where(bits == one, 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= (1 << i)
    return out - (1 << 63)


def golden_simhash_pairs(ids, hashes, max_hamming=8):
    """BRUTE-FORCE all-pairs Hamming filter — an honest independent
    oracle since the distributed side's 9-band candidate generation is
    pigeonhole-complete for distance <= 8 (dedup.SIMHASH_BANDS), so
    banded must equal brute force exactly."""
    by_id = dict(zip(ids, hashes))
    ms = sorted(by_id)
    pairs = []
    for i in range(len(ms)):
        for j in range(i + 1, len(ms)):
            a, b = ms[i], ms[j]
            d = bin((by_id[a] ^ by_id[b]) & ((1 << 64) - 1)).count("1")
            if d <= max_hamming:
                pairs.append((a, b))
    return pairs


def winnow_fps(text: str, k: int = 5, w: int = 4) -> list[int]:
    if len(text) < k:
        return [zlib.crc32(text.encode("utf-8"))] if text else []
    hashes = [zlib.crc32(text[i:i + k].encode("utf-8"))
              for i in range(len(text) - k + 1)]
    fps, last = [], -1
    for start in range(max(1, len(hashes) - w + 1)):
        window = hashes[start:start + w]
        m = min(window)
        idx = start + max(i for i, h in enumerate(window) if h == m)
        if idx != last:
            fps.append(hashes[idx])
            last = idx
    return fps


class UnionFind:
    def __init__(self):
        self.p: dict[int, int] = {}

    def find(self, x):
        self.p.setdefault(x, x)
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # min-id becomes the root (matches min-label propagation)
            lo, hi = sorted((ra, rb))
            self.p[hi] = lo


# -- embeddings-side spec replication ---------------------------------------

def emb_matrix(sf_dir):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = np.asarray(t["vec_id"].to_numpy())
    labels = np.asarray(t["label"].to_numpy())
    col = t["embedding"].combine_chunks()
    mat = np.asarray(col.flatten(), dtype=np.float64).reshape(len(ids), -1)
    return ids, labels, mat


def cos(mat, q):
    qn = q / np.linalg.norm(q)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    return (mat @ qn) / norms


def golden_knn_ivf(sf_dir, k=10, nlist=16, nprobe=4, iters=5):
    ids, labels, mat = emb_matrix(sf_dir)
    query = mat[ids == 0][0]
    seed_ids = sorted(set(int(i) for i in
                          np.linspace(0, ids.max(), nlist).astype(int)))
    order = np.argsort(ids)
    cents = np.stack([mat[ids == s][0] for s in seed_ids])
    del order
    for _ in range(iters):
        d = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        q = np.rint(mat * KMEANS_SCALE).astype(np.int64)
        tot = np.zeros((len(cents), mat.shape[1]), dtype=np.int64)
        np.add.at(tot, assign, q)
        cnt = np.bincount(assign, minlength=len(cents)).astype(np.int64)
        new = cents.copy()
        nz = cnt > 0
        new[nz] = (tot[nz] / KMEANS_SCALE) / cnt[nz, None]
        cents = new
    probe = set(np.argsort(((cents - query) ** 2).sum(axis=1))[:nprobe]
                .tolist())
    d = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    assign = d.argmin(axis=1)
    keep = np.isin(assign, list(probe)) & (ids != 0)
    sims = cos(mat[keep], query)
    kids, klabels = ids[keep], labels[keep]
    order = np.lexsort((kids, -sims))[:k]
    return kids[order], klabels[order]


def golden_pq_recall_audit(sf_dir, n_queries=16, k=10, m=8,
                           ksub=16, iters=5):
    """Independent PQ-vs-exact-L2 recall audit: the same spec-constant
    per-subspace k-means as golden_knn_pq, ADC vs exact L2 top-k per
    query, lexsort((id, dist)) ties, recall in floor micros."""
    ids, labels, mat = emb_matrix(sf_dir)
    seed_ids = sorted(set(int(i) for i in
                          np.linspace(0, ids.max(), ksub).astype(int)))
    seed_mat = np.stack([mat[ids == s][0] for s in seed_ids])
    ksub = len(seed_mat)
    dim = mat.shape[1]
    dsub = dim // m
    cents = np.stack([seed_mat[:, s * dsub:(s + 1) * dsub]
                      for s in range(m)])
    for _ in range(iters):
        new = cents.copy()
        for s in range(m):
            sub = mat[:, s * dsub:(s + 1) * dsub]
            d = ((sub[:, None, :] - cents[s][None, :, :]) ** 2) \
                .sum(axis=2)
            assign = d.argmin(axis=1)
            q = np.rint(sub * KMEANS_SCALE).astype(np.int64)
            tot = np.zeros((ksub, dsub), dtype=np.int64)
            np.add.at(tot, assign, q)
            cnt = np.bincount(assign, minlength=ksub).astype(np.int64)
            nz = cnt > 0
            new[s][nz] = (tot[nz] / KMEANS_SCALE) / cnt[nz, None]
        cents = new
    codes = np.stack([
        ((mat[:, s * dsub:(s + 1) * dsub][:, None, :]
          - cents[s][None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
        for s in range(m)])
    out_q, out_h, out_r = [], [], []
    for qi in range(n_queries):
        query = mat[ids == qi][0]
        keep = ids != qi
        kids = ids[keep]
        diff = mat[keep] - query
        dist = (diff * diff).sum(axis=1)
        exact = set(kids[np.lexsort((kids, dist))[:k]].tolist())
        qsub = query.reshape(m, dsub)
        table = ((cents - qsub[:, None, :]) ** 2).sum(axis=2)
        adc = np.zeros(len(ids), dtype=np.float64)
        for s in range(m):
            adc += table[s][codes[s]]
        adc = adc[keep]
        approx = set(kids[np.lexsort((kids, adc))[:k]].tolist())
        hits = len(exact & approx)
        out_q.append(qi)
        out_h.append(hits)
        out_r.append((1_000_000 * hits) // max(1, len(exact)))
    return pa.table({"qid": pa.array(out_q, pa.int64()),
                     "n_hits": pa.array(out_h, pa.int64()),
                     "recall_micro": pa.array(out_r, pa.int64())})


def golden_ivf_recall_audit(sf_dir, n_queries=16, k=10, nlist=16,
                            nprobe=4, iters=5):
    """Independent dense recall@k audit: the same spec-constant k-means
    (linspace seeds, fixed-point int64 partial sums), per-query exact
    and probed top-k with the lexsort((id, -sim)) tie rule, recall in
    floor micros."""
    ids, labels, mat = emb_matrix(sf_dir)
    seed_ids = sorted(set(int(i) for i in
                          np.linspace(0, ids.max(), nlist).astype(int)))
    cents = np.stack([mat[ids == s][0] for s in seed_ids])
    for _ in range(iters):
        d = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        q = np.rint(mat * KMEANS_SCALE).astype(np.int64)
        tot = np.zeros((len(cents), mat.shape[1]), dtype=np.int64)
        np.add.at(tot, assign, q)
        cnt = np.bincount(assign, minlength=len(cents)).astype(np.int64)
        new = cents.copy()
        nz = cnt > 0
        new[nz] = (tot[nz] / KMEANS_SCALE) / cnt[nz, None]
        cents = new
    d = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    assign = d.argmin(axis=1)
    out_q, out_h, out_r = [], [], []
    for qi in range(n_queries):
        query = mat[ids == qi][0]
        keep = ids != qi
        sims = cos(mat[keep], query)
        kids = ids[keep]
        exact = set(kids[np.lexsort((kids, -sims))[:k]].tolist())
        probe = set(np.argsort(((cents - query) ** 2).sum(axis=1))
                    [:nprobe].tolist())
        keep2 = keep & np.isin(assign, list(probe))
        sims2 = cos(mat[keep2], query)
        kids2 = ids[keep2]
        approx = set(kids2[np.lexsort((kids2, -sims2))[:k]].tolist())
        hits = len(exact & approx)
        out_q.append(qi)
        out_h.append(hits)
        out_r.append((1_000_000 * hits) // max(1, len(exact)))
    return pa.table({"qid": pa.array(out_q, pa.int64()),
                     "n_hits": pa.array(out_h, pa.int64()),
                     "recall_micro": pa.array(out_r, pa.int64())})


def golden_ndcg_audit(sf_dir, n_queries=16, k=10, nlist=16,
                      nprobe=4, iters=5):
    """Independent dense nDCG@k audit of the IVF probe ranking: same
    spec-constant k-means as golden_ivf_recall_audit, ORDERED exact and
    probed top-k lists under the lexsort((id, -sim)) tie rule, linear
    gains k..1 from the exact order, integer position discounts
    round(1e6/log2(r+1)) derived here with math.log2 (independent of
    the engine's _dcg_discounts), ndcg = 1e6*DCG // IDCG."""
    import math

    ids, labels, mat = emb_matrix(sf_dir)
    seed_ids = sorted(set(int(i) for i in
                          np.linspace(0, ids.max(), nlist).astype(int)))
    cents = np.stack([mat[ids == s][0] for s in seed_ids])
    for _ in range(iters):
        d = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        q = np.rint(mat * KMEANS_SCALE).astype(np.int64)
        tot = np.zeros((len(cents), mat.shape[1]), dtype=np.int64)
        np.add.at(tot, assign, q)
        cnt = np.bincount(assign, minlength=len(cents)).astype(np.int64)
        new = cents.copy()
        nz = cnt > 0
        new[nz] = (tot[nz] / KMEANS_SCALE) / cnt[nz, None]
        cents = new
    d = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    assign = d.argmin(axis=1)
    disc = [round(1_000_000 / math.log2(r + 1)) for r in range(1, k + 1)]
    out_q, out_d, out_n = [], [], []
    for qi in range(n_queries):
        query = mat[ids == qi][0]
        keep = ids != qi
        sims = cos(mat[keep], query)
        kids = ids[keep]
        exact = kids[np.lexsort((kids, -sims))[:k]].tolist()
        probe = set(np.argsort(((cents - query) ** 2).sum(axis=1))
                    [:nprobe].tolist())
        keep2 = keep & np.isin(assign, list(probe))
        sims2 = cos(mat[keep2], query)
        kids2 = ids[keep2]
        approx = kids2[np.lexsort((kids2, -sims2))[:k]].tolist()
        rel = {int(doc): k - r for r, doc in enumerate(exact)}
        dcg = sum(rel.get(int(doc), 0) * disc[i]
                  for i, doc in enumerate(approx))
        idcg = sum((k - i) * disc[i] for i in range(len(exact)))
        out_q.append(qi)
        out_d.append(dcg)
        out_n.append((1_000_000 * dcg) // idcg if idcg else 0)
    return pa.table({"qid": pa.array(out_q, pa.int64()),
                     "dcg_units": pa.array(out_d, pa.int64()),
                     "ndcg_micro": pa.array(out_n, pa.int64())})


def golden_knn_pq(sf_dir, k=10, m=8, ksub=16, iters=5):
    """Independent reimplementation of ann.knn_pq: per-subspace k-means
    with deterministic linspace seeds and fixed-point int64 partial
    sums (whole-matrix here; integer addition makes the distributed
    fit identical), then uint8 encoding and asymmetric-distance top-k
    (ties → min vec_id)."""
    ids, labels, mat = emb_matrix(sf_dir)
    query = mat[ids == 0][0]
    seed_ids = sorted(set(int(i) for i in
                          np.linspace(0, ids.max(), ksub).astype(int)))
    seed_mat = np.stack([mat[ids == s][0] for s in seed_ids])
    ksub = len(seed_mat)
    dim = mat.shape[1]
    dsub = dim // m
    cents = np.stack([seed_mat[:, s * dsub:(s + 1) * dsub]
                      for s in range(m)])
    for _ in range(iters):
        new = cents.copy()
        for s in range(m):
            sub = mat[:, s * dsub:(s + 1) * dsub]
            d = ((sub[:, None, :] - cents[s][None, :, :]) ** 2) \
                .sum(axis=2)
            assign = d.argmin(axis=1)
            q = np.rint(sub * KMEANS_SCALE).astype(np.int64)
            tot = np.zeros((ksub, dsub), dtype=np.int64)
            np.add.at(tot, assign, q)
            cnt = np.bincount(assign, minlength=ksub).astype(np.int64)
            nz = cnt > 0
            new[s][nz] = (tot[nz] / KMEANS_SCALE) / cnt[nz, None]
        cents = new
    qsub = query.reshape(m, dsub)
    table = ((cents - qsub[:, None, :]) ** 2).sum(axis=2)
    keep = ids != 0
    kmat, kids, klabels = mat[keep], ids[keep], labels[keep]
    dist = np.zeros(len(kids), dtype=np.float64)
    for s in range(m):
        sub = kmat[:, s * dsub:(s + 1) * dsub]
        d = ((sub[:, None, :] - cents[s][None, :, :]) ** 2).sum(axis=2)
        codes = d.argmin(axis=1)
        dist += table[s][codes]
    order = np.lexsort((kids, dist))[:k]
    return kids[order], klabels[order]


def golden_lsh_cosine_pairs(sf_dir, threshold=0.4, n_planes=5, n_tables=8):
    ids, _labels, mat = emb_matrix(sf_dir)
    rng = np.random.RandomState(987)
    planes = rng.normal(size=(n_tables, n_planes, mat.shape[1]))
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    pairs = set()
    for t in range(n_tables):
        signs = (mat @ planes[t].T) > 0
        keys = signs.dot(1 << np.arange(n_planes))
        buckets: dict[int, list[int]] = {}
        for i, vid in enumerate(ids):
            buckets.setdefault(int(keys[i]), []).append(i)
        for members in buckets.values():
            if len(members) < 2:
                continue
            sub = norm[members]
            sims = sub @ sub.T
            for i in range(len(members)):
                for j in range(i + 1, len(members)):
                    if sims[i, j] >= threshold:
                        a, b = sorted((int(ids[members[i]]),
                                       int(ids[members[j]])))
                        pairs.add((a, b))
    return sorted(pairs)


def golden_hash_embed_nn(sf_dir, dim=64):
    """Independent reimplementation of the documents → feature-hashing
    embedding → exact nearest-neighbor composition: slot = crc32(token)
    % dim, sign = bit 31, accumulate per occurrence, L2-normalize; NN =
    max cosine (ties → min doc_id)."""
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "text"])
    ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    mat = np.zeros((len(ids), dim), dtype=np.float64)
    for i, text in enumerate(texts):
        for tok in text.split(" "):
            h = zlib.crc32(tok.encode("utf-8"))
            mat[i, h % dim] += -1.0 if (h >> 31) & 1 else 1.0
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    mat = mat / norms
    arr = np.array(ids, dtype=np.int64)
    out = []
    for i in range(len(ids)):
        # same 1e-12 quantization as the implementation: last-ulp
        # differences from summation order cannot flip the argmax
        sims = np.floor((mat @ mat[i]) / 1e-12 + 0.5)
        sims[arr == arr[i]] = -np.inf
        best = sims.max()
        out.append((int(arr[i]),
                    int(arr[sims == best].min())))
    return sorted(out)


def golden_lsh_nearest_neighbor(sf_dir, n_planes=5, n_tables=8):
    """Independent reimplementation of lsh_nearest_neighbor_ids: per
    vector, the max-cosine candidate over the union of co-bucketed
    vectors across all tables (ties → min vec_id); no candidates →
    nn_id = -1."""
    ids, _labels, mat = emb_matrix(sf_dir)
    rng = np.random.RandomState(987)
    planes = rng.normal(size=(n_tables, n_planes, mat.shape[1]))
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    cand: dict[int, set[int]] = {i: set() for i in range(len(ids))}
    for t in range(n_tables):
        signs = (mat @ planes[t].T) > 0
        keys = signs.dot(1 << np.arange(n_planes))
        buckets: dict[int, list[int]] = {}
        for i in range(len(ids)):
            buckets.setdefault(int(keys[i]), []).append(i)
        for members in buckets.values():
            for i in members:
                cand[i].update(m for m in members if m != i)
    out = []
    for i in range(len(ids)):
        cs = sorted(cand[i])
        if not cs:
            out.append((int(ids[i]), -1))
            continue
        sims = np.array([float(norm[c] @ norm[i]) for c in cs])
        best = sims.max()
        nn = min(int(ids[c]) for c, s in zip(cs, sims) if s == best)
        out.append((int(ids[i]), nn))
    return sorted(out)


# ---------------------------------------------------------------------------
# extraction-surface goldens (pure oracle, no Ray)
# ---------------------------------------------------------------------------

def fake_decode(media_ref: str) -> tuple[int, int, int]:
    h = zlib.crc32(media_ref.encode("utf-8"))
    return (160 + (h & 0x3FF), 120 + ((h >> 10) & 0x3FF),
            1 + ((h >> 20) & 0xFF))


def oracle_results(n_per_family: int, seed: int):
    from webtext.oracle import extract_document
    from webtext.synth import generate_docs

    docs = generate_docs(n_per_family=n_per_family, seed=seed)
    return [(d, extract_document(d["doc_id"], d["spans"])) for d in docs]


def flat_span_rows(results, statuses=None):
    rows = {k: [] for k in ("doc_id", "offset", "kind", "text",
                            "media_ref", "status")}
    for _doc, r in results:
        if statuses is not None and r.status not in statuses:
            continue
        for s in r.spans:
            rows["doc_id"].append(r.doc_id)
            rows["offset"].append(s["offset"])
            rows["kind"].append(s["kind"])
            rows["text"].append(s["text"])
            rows["media_ref"].append(s["media_ref"])
            rows["status"].append(r.status)
    return rows


FLAT_SCHEMA = pa.schema([
    ("doc_id", pa.string()), ("offset", pa.int32()), ("kind", pa.string()),
    ("text", pa.string()), ("media_ref", pa.string()),
    ("status", pa.string())])


def golden_dedup_substrings(sf_dir, k=8):
    """Independent ExactSubstr removal: pure-Python dict occurrence
    count over rolling-hash k-grams, then per-doc covered-range mask."""
    import collections

    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"])
    ids = [str(d) for d in t.column("doc_id").to_pylist()]
    texts = t.column("text").to_pylist()

    def gram_hashes(tokens):
        th = [int.from_bytes(
            __import__("hashlib").md5(x.encode("utf-8")).digest()[:8],
            "big") for x in tokens]
        out = []
        for i in range(len(th) - (k - 1)):
            h = th[i]
            for j in range(1, k):
                h = ((h * _DSIR_MIX) & _U64) ^ th[i + j]
            out.append(h)
        return out

    grams = [gram_hashes(tx.split(" ")) for tx in texts]
    occ = collections.Counter()
    for g in grams:
        occ.update(g)
    rows = []
    for d, tx, g in zip(ids, texts, grams):
        toks = tx.split(" ")
        covered = [False] * len(toks)
        for p, h in enumerate(g):
            if occ[h] >= 2:
                for j in range(p, min(p + k, len(toks))):
                    covered[j] = True
        kept = [x for x, c in zip(toks, covered) if not c]
        rows.append((d, " ".join(kept), len(toks),
                     sum(1 for c in covered if c)))
    return rows


DSIR_BUCKETS = 10_000
DSIR_SCALE = 10**9
_DSIR_MIX = 0x9E3779B97F4A7C15
_U64 = (1 << 64) - 1


def _golden_dsir_buckets(text: str) -> list:
    """Unigram+bigram hashed buckets via pure-Python uint64 arithmetic
    (independent of the engine's numpy vectorization)."""
    toks = text.split(" ")
    th = [int.from_bytes(
        __import__("hashlib").md5(t.encode("utf-8")).digest()[:8],
        "big") for t in toks]
    buckets = [h % DSIR_BUCKETS for h in th]
    for i in range(len(th) - 1):
        g = ((th[i] * _DSIR_MIX) & _U64) ^ th[i + 1]
        buckets.append(g % DSIR_BUCKETS)
    return buckets


def golden_dsir(sf_dir, mod=100, lt=3):
    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"])
    ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    tgt = np.zeros(DSIR_BUCKETS, dtype=np.int64)
    raw = np.zeros(DSIR_BUCKETS, dtype=np.int64)
    per_doc = []
    for d, tx in zip(ids, texts):
        b = _golden_dsir_buckets(tx)
        per_doc.append(b)
        np.add.at(raw, b, 1)
        if int(d) % mod < lt:
            np.add.at(tgt, b, 1)
    lp = np.log((tgt + 1).astype(np.float64)) \
        - np.log(float(int(tgt.sum()) + DSIR_BUCKETS))
    lq = np.log((raw + 1).astype(np.float64)) \
        - np.log(float(int(raw.sum()) + DSIR_BUCKETS))
    lut = np.rint((lp - lq) * DSIR_SCALE).astype(np.int64)
    return [(int(d), int(sum(int(lut[x]) for x in b)))
            for d, b in zip(ids, per_doc)]


BPE_MERGE_BASE = 0x110000


def _golden_bpe_apply(codes, merges):
    """Textbook greedy leftmost-nonoverlapping merge replay (plain
    while-loop — independent of the engine's vectorized run-parity)."""
    s = codes
    for rank, (a, b) in enumerate(merges):
        out, i = [], 0
        while i < len(s):
            if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                out.append(BPE_MERGE_BASE + rank)
                i += 2
            else:
                out.append(s[i])
                i += 1
        s = out
    return s


def golden_bpe(sf_dir, n_merges=12, min_count=2,
               keep_of_4096=512, salt="s0"):
    """Independent single-process BPE: train on the deterministic
    md5-prefix sample (same predicate as textstats.sample_by_hash),
    winner = max count then min (a, b); encode the FULL corpus with the
    learned merges."""
    import collections
    import hashlib as _h

    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"])
    ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    thresh = format(keep_of_4096, "03x")
    in_sample = [
        _h.md5((str(d) + salt).encode()).hexdigest()[:3] < thresh
        for d in ids]
    sample = [[ord(c) for c in tx]
              for tx, k in zip(texts, in_sample) if k]
    merges: list[tuple[int, int]] = []
    rows = []
    for _ in range(n_merges):
        cnt: collections.Counter = collections.Counter()
        for codes in sample:
            s = _golden_bpe_apply(codes, merges)
            for i in range(len(s) - 1):
                cnt[(s[i], s[i + 1])] += 1
        if not cnt:
            break
        top = max(cnt.values())
        if top < min_count:
            break
        a, b = min(k for k, v in cnt.items() if v == top)
        rows.append({"rank": len(merges), "left": a, "right": b,
                     "n": int(top)})
        merges.append((a, b))
    enc = [(int(d), len(_golden_bpe_apply([ord(c) for c in tx], merges)))
           for d, tx in zip(ids, texts)]
    return rows, enc


def golden_semdedup(sf_dir, nlist=16, threshold=0.4, iters=5):
    """Independent single-process SemDeDup: same deterministic k-means
    as golden_knn_ivf (fixed-point int64 sums ⇒ blocking-independent),
    dense within-cluster all-pairs cosine, textbook union-find, keep
    the min (cent_sim_fp, vec_id) member per component (the paper's
    least-central keep-rule, fixed-point so ties are integer-exact)."""
    ids, labels, mat = emb_matrix(sf_dir)
    seed_ids = sorted(set(int(i) for i in
                          np.linspace(0, ids.max(), nlist).astype(int)))
    cents = np.stack([mat[ids == s][0] for s in seed_ids])
    for _ in range(iters):
        d = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        q = np.rint(mat * KMEANS_SCALE).astype(np.int64)
        tot = np.zeros((len(cents), mat.shape[1]), dtype=np.int64)
        np.add.at(tot, assign, q)
        cnt = np.bincount(assign, minlength=len(cents)).astype(np.int64)
        new = cents.copy()
        nz = cnt > 0
        new[nz] = (tot[nz] / KMEANS_SCALE) / cnt[nz, None]
        cents = new
    d = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    assign = d.argmin(axis=1)
    vn = np.linalg.norm(mat, axis=1, keepdims=True)
    vn[vn == 0] = 1.0
    normv = mat / vn
    cn = np.linalg.norm(cents, axis=1, keepdims=True)
    cn[cn == 0] = 1.0
    centn = cents / cn
    simfp = np.rint((normv * centn[assign]).sum(axis=1) * 10**12) \
        .astype(np.int64)
    pairs = []
    for c in range(len(cents)):
        m = assign == c
        cid, cm = ids[m], normv[m]
        if len(cid) < 2:
            continue
        s = cm @ cm.T
        iu, ju = np.triu_indices(len(cid), k=1)
        hit = s[iu, ju] >= threshold
        pairs.extend((int(min(a, b)), int(max(a, b)))
                     for a, b in zip(cid[iu[hit]], cid[ju[hit]]))
    pairs = sorted(set(pairs))
    uf = UnionFind()
    for a, b in pairs:
        uf.union(a, b)
    simof = dict(zip(ids.tolist(), simfp.tolist()))
    comp: dict[int, list[int]] = {}
    for x in list(uf.p):
        comp.setdefault(uf.find(x), []).append(x)
    dropped = set()
    for members in comp.values():
        surv = min(members, key=lambda n: (simof[n], n))
        dropped.update(m for m in members if m != surv)
    keep = [(int(v), int(l)) for v, l in zip(ids, labels)
            if int(v) not in dropped]
    return pairs, keep


def golden_pagerank(sf_dir: str) -> pa.Table:
    """Dense single-process fixed-point PageRank over the lineitem
    part->supplier digraph — the differential oracle for the
    distributed bucketed implementation (webtext/functions/graph.py):
    identical integer recurrence, entirely different execution (np.add.at
    dense scatter vs bucketed map_groups join + groupby sums)."""
    SCALE, ITERS, D_NUM, D_DEN = 10**12, 8, 17, 20
    li = pq.read_table(f"{sf_dir}/lineitem.parquet",
                       columns=["l_partkey", "l_suppkey"])
    src = li["l_partkey"].to_numpy().astype(np.int64) * 2
    dst = li["l_suppkey"].to_numpy().astype(np.int64) * 2 + 1
    pairs = np.stack([src, dst], axis=1)
    uniq, w = np.unique(pairs, axis=0, return_counts=True)
    esrc, edst, ew = uniq[:, 0], uniq[:, 1], w.astype(np.int64)
    nodes = np.unique(np.concatenate([esrc, edst]))
    si = np.searchsorted(nodes, esrc)
    di = np.searchsorted(nodes, edst)
    outdeg = np.zeros(len(nodes), dtype=np.int64)
    np.add.at(outdeg, si, ew)
    base = np.int64(SCALE // len(nodes))
    base_next = (np.int64(3) * base) // np.int64(D_DEN)
    rank = np.full(len(nodes), base, dtype=np.int64)
    for _ in range(ITERS):
        share = np.where(outdeg > 0,
                         rank // np.maximum(outdeg, 1), np.int64(0))
        inflow = np.zeros(len(nodes), dtype=np.int64)
        np.add.at(inflow, di, share[si] * ew)
        rank = base_next + (np.int64(D_NUM) * inflow) // np.int64(D_DEN)
    return pa.table({"node": pa.array(nodes, pa.int64()),
                     "rank": pa.array(rank, pa.int64())})


def golden_part_coreness(sf_dir: str) -> pa.Table:
    """Exact k-core decomposition of the lineitem co-purchase part
    graph by LITERAL iterated peeling (delete nodes with degree < k) —
    the textbook definition, entirely different machinery from the
    engine's distributed h-index fixed point."""
    from collections import defaultdict

    li = pq.read_table(f"{sf_dir}/lineitem.parquet",
                       columns=["l_orderkey", "l_partkey"])
    per_order: dict = defaultdict(set)
    for o, p in zip(li["l_orderkey"].to_pylist(),
                    li["l_partkey"].to_pylist()):
        per_order[o].add(p)
    adj: dict = defaultdict(set)
    for parts in per_order.values():
        ps = sorted(parts)
        for i, a in enumerate(ps):
            for b in ps[i + 1:]:
                adj[a].add(b)
                adj[b].add(a)
    core: dict = {}
    live = {v: set(ns) for v, ns in adj.items()}
    k = 0
    while live:
        k += 1
        while True:
            drop = [v for v, ns in live.items() if len(ns) < k]
            if not drop:
                break
            for v in drop:
                core[v] = k - 1
                for u in live[v]:
                    live[u].discard(v)
                del live[v]
    nodes = sorted(core)
    return pa.table({
        "node": pa.array(nodes, pa.int64()),
        "coreness": pa.array([core[n] for n in nodes], pa.int64())})


def golden_part_communities(sf_dir: str) -> pa.Table:
    """Independent dense simulation of deterministic synchronous LPA
    (10 rounds; most frequent neighbour label, ties -> smallest) over
    the support->=2 co-purchase subgraph — dict/Counter machinery,
    nothing shared with the engine's bucketed exchanges."""
    from collections import Counter, defaultdict

    li = pq.read_table(f"{sf_dir}/lineitem.parquet",
                       columns=["l_orderkey", "l_partkey"])
    per_order: dict = defaultdict(set)
    for o, p in zip(li["l_orderkey"].to_pylist(),
                    li["l_partkey"].to_pylist()):
        per_order[o].add(p)
    pair_orders: Counter = Counter()
    for parts in per_order.values():
        ps = sorted(parts)
        for i, a in enumerate(ps):
            for b in ps[i + 1:]:
                pair_orders[(a, b)] += 1
    adj: dict = defaultdict(set)
    for (a, b), n in pair_orders.items():
        if n >= 2:
            adj[a].add(b)
            adj[b].add(a)
    label = {v: v for v in adj}
    for _ in range(10):
        nxt = {}
        for v, ns in adj.items():
            cnt = Counter(label[u] for u in ns)
            top = max(cnt.values())
            nxt[v] = min(l for l, c in cnt.items() if c == top)
        if nxt == label:
            break
        label = nxt
    nodes = sorted(label)
    return pa.table({
        "node": pa.array(nodes, pa.int64()),
        "community": pa.array([label[n] for n in nodes], pa.int64())})


def golden_pagerank_weighted(sf_dir: str) -> pa.Table:
    """Dense single-process PERSONALIZED fixed-point PageRank:
    teleport mass proportional to each part node's integer retail
    cents (supplier nodes weight 0) — differential oracle for
    webtext/functions/graph.py pagerank_personalized.  Same integer
    recurrence, dense np.add.at execution; p_v computed with exact
    python big-ints (the distributed side's split multiply is an exact
    identity for the same value)."""
    SCALE, ITERS, D_NUM, D_DEN = 10**12, 8, 17, 20
    li = pq.read_table(f"{sf_dir}/lineitem.parquet",
                       columns=["l_partkey", "l_suppkey"])
    src = li["l_partkey"].to_numpy().astype(np.int64) * 2
    dst = li["l_suppkey"].to_numpy().astype(np.int64) * 2 + 1
    pairs = np.stack([src, dst], axis=1)
    uniq, w = np.unique(pairs, axis=0, return_counts=True)
    esrc, edst, ew = uniq[:, 0], uniq[:, 1], w.astype(np.int64)
    nodes = np.unique(np.concatenate([esrc, edst]))
    si = np.searchsorted(nodes, esrc)
    di = np.searchsorted(nodes, edst)
    outdeg = np.zeros(len(nodes), dtype=np.int64)
    np.add.at(outdeg, si, ew)

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_retailprice"])
    pnode = part["p_partkey"].to_numpy().astype(np.int64) * 2
    pcents = np.floor(part["p_retailprice"].to_numpy() * 100.0
                      + 0.5).astype(np.int64)
    wmap = dict(zip(pnode.tolist(), pcents.tolist()))
    wv = np.array([wmap.get(int(n), 0) for n in nodes],
                  dtype=np.int64)
    W = int(wv.sum())
    p = np.array([(SCALE * int(x)) // W for x in wv], dtype=np.int64)
    base_next = (np.int64(3) * p) // np.int64(D_DEN)
    rank = p.copy()
    for _ in range(ITERS):
        share = np.where(outdeg > 0,
                         rank // np.maximum(outdeg, 1), np.int64(0))
        inflow = np.zeros(len(nodes), dtype=np.int64)
        np.add.at(inflow, di, share[si] * ew)
        rank = base_next + (np.int64(D_NUM) * inflow) // np.int64(D_DEN)
    return pa.table({"node": pa.array(nodes, pa.int64()),
                     "rank": pa.array(rank, pa.int64())})


class _AnchorWalk:
    """Stdlib html.parser DOM-event anchor miner — the independent
    counterpart of webtext/pipelines/webgraph.py's regex scan (entirely
    different parsing machinery over the same html)."""

    def __init__(self):
        from html.parser import HTMLParser

        outer = self

        class _P(HTMLParser):
            def __init__(self):
                super().__init__(convert_charrefs=True)

            def handle_starttag(self, tag, attrs):
                if tag == "a":
                    outer._flush()
                    outer._href = dict(attrs).get("href")
                    outer._buf = []

            def handle_endtag(self, tag):
                if tag == "a":
                    outer._flush()

            def handle_data(self, data):
                if outer._href is not None:
                    outer._buf.append(data)

        self._p = _P()
        self._href = None
        self._buf: list[str] = []
        self.links: list[tuple[str, str]] = []

    def _flush(self):
        if self._href:
            self.links.append(
                (self._href, " ".join("".join(self._buf).split())))
        self._href = None
        self._buf = []

    def feed(self, html: str):
        self._p.feed(html)
        self._flush()


def golden_outlinks(docs: list[dict]) -> pa.Table:
    rows = {"src": [], "href": [], "anchor": []}
    for d in docs:
        for s in d["spans"]:
            if s["kind"] != "html":
                continue
            w = _AnchorWalk()
            w.feed(s["text"] or "")
            for href, anchor in w.links:
                rows["src"].append(d["doc_id"])
                rows["href"].append(href)
                rows["anchor"].append(anchor)
    return pa.table({"src": pa.array(rows["src"], pa.string()),
                     "href": pa.array(rows["href"], pa.string()),
                     "anchor": pa.array(rows["anchor"], pa.string())})


def golden_anchor_stats(ol: pa.Table) -> pa.Table:
    """Plain-python Counter aggregation over the HTMLParser link table
    (vs the engine's numpy bucket cells)."""
    from collections import Counter, defaultdict

    n_links: Counter = Counter()
    docs: dict = defaultdict(set)
    acnt: dict = defaultdict(Counter)
    for src, href, anchor in zip(ol["src"].to_pylist(),
                                 ol["href"].to_pylist(),
                                 ol["anchor"].to_pylist()):
        n_links[href] += 1
        docs[href].add(src)
        acnt[href][anchor] += 1
    hrefs = sorted(n_links)
    top = [min(acnt[h].items(), key=lambda kv: (-kv[1], kv[0]))[0]
           for h in hrefs]
    return pa.table({
        "href": pa.array(hrefs, pa.string()),
        "n_links": pa.array([n_links[h] for h in hrefs], pa.int64()),
        "n_docs": pa.array([len(docs[h]) for h in hrefs], pa.int64()),
        "top_anchor": pa.array(top, pa.string())})


def _golden_host(url: str) -> str:
    """Host rule (webgraph.py docstring): lowercased netloc of
    scheme-explicit absolute URLs only — implemented via urlsplit
    (vs the engine's regex)."""
    from urllib.parse import urlsplit

    if "://" not in url:
        return ""
    try:
        return urlsplit(url).netloc.lower()
    except ValueError:
        return ""


def golden_host_cocitation(ol: pa.Table) -> pa.Table:
    """Plain-python co-citation counts over the HTMLParser link table:
    per source doc the DISTINCT target-host set, then a Counter over
    its sorted host pairs (vs the engine's coded run expansion)."""
    import itertools
    from collections import Counter, defaultdict

    per_src: dict = defaultdict(set)
    for src, href in zip(ol["src"].to_pylist(), ol["href"].to_pylist()):
        h = _golden_host(href)
        if h:
            per_src[src].add(h)
    cnt: Counter = Counter()
    for hs in per_src.values():
        for a, b in itertools.combinations(sorted(hs), 2):
            cnt[(a, b)] += 1
    keys = sorted(cnt)
    return pa.table({
        "host1": pa.array([k[0] for k in keys], pa.string()),
        "host2": pa.array([k[1] for k in keys], pa.string()),
        "n_docs": pa.array([cnt[k] for k in keys], pa.int64())})


def golden_host_coupling(ol: pa.Table) -> pa.Table:
    """Plain-python bibliographic coupling over the HTMLParser link
    table: per SOURCE host the distinct target-host set, then pairwise
    intersection / union / integer-floor Jaccard micro."""
    import itertools
    from collections import defaultdict

    per_host: dict = defaultdict(set)
    for src, href in zip(ol["src"].to_pylist(), ol["href"].to_pylist()):
        sh, dh = _golden_host(src), _golden_host(href)
        if sh and dh:
            per_host[sh].add(dh)
    rows = []
    for a, b in itertools.combinations(sorted(per_host), 2):
        inter = len(per_host[a] & per_host[b])
        if inter == 0:
            continue
        union = len(per_host[a] | per_host[b])
        rows.append((a, b, inter, union, inter * 1_000_000 // union))
    return pa.table({
        "host1": pa.array([r[0] for r in rows], pa.string()),
        "host2": pa.array([r[1] for r in rows], pa.string()),
        "inter": pa.array([r[2] for r in rows], pa.int64()),
        "union": pa.array([r[3] for r in rows], pa.int64()),
        "jaccard_micro": pa.array([r[4] for r in rows], pa.int64())})


def golden_host_pagerank(ol: pa.Table) -> pa.Table:
    """Dense np.add.at fixed-point PageRank over HTMLParser-derived
    host edges, md5-u63 node ids re-keyed to host strings — identical
    integer recurrence to golden_pagerank, independent execution from
    the bucketed distributed side."""
    import hashlib

    def u63(s: str) -> int:
        return int.from_bytes(
            hashlib.md5(s.encode()).digest()[:8], "big") \
            & 0x7FFFFFFFFFFFFFFF

    SCALE, ITERS, D_NUM, D_DEN = 10**12, 8, 17, 20
    pairs: dict[tuple[int, int], int] = {}
    names: dict[int, str] = {}
    for src, href in zip(ol["src"].to_pylist(), ol["href"].to_pylist()):
        sh, dh = _golden_host(src), _golden_host(href)
        if not sh or not dh:
            continue
        si, di = u63(sh), u63(dh)
        names[si], names[di] = sh, dh
        pairs[(si, di)] = pairs.get((si, di), 0) + 1
    esrc = np.array([k[0] for k in pairs], dtype=np.int64)
    edst = np.array([k[1] for k in pairs], dtype=np.int64)
    ew = np.array(list(pairs.values()), dtype=np.int64)
    nodes = np.unique(np.concatenate([esrc, edst]))
    si = np.searchsorted(nodes, esrc)
    di = np.searchsorted(nodes, edst)
    outdeg = np.zeros(len(nodes), dtype=np.int64)
    np.add.at(outdeg, si, ew)
    base = np.int64(SCALE // len(nodes))
    base_next = (np.int64(3) * base) // np.int64(D_DEN)
    rank = np.full(len(nodes), base, dtype=np.int64)
    for _ in range(ITERS):
        share = np.where(outdeg > 0,
                         rank // np.maximum(outdeg, 1), np.int64(0))
        inflow = np.zeros(len(nodes), dtype=np.int64)
        np.add.at(inflow, di, share[si] * ew)
        rank = base_next + (np.int64(D_NUM) * inflow) // np.int64(D_DEN)
    return pa.table({
        "host": pa.array([names[int(n)] for n in nodes], pa.string()),
        "rank": pa.array(rank, pa.int64())})


def golden_doc_authority(docs: list[dict], hp: pa.Table) -> pa.Table:
    """Plain-python host→rank join (vs the engine's bucketed
    emit-union): every doc tagged with its host's PageRank, 0 for
    hostless / unranked."""
    rank_of = dict(zip(hp["host"].to_pylist(), hp["rank"].to_pylist()))
    ids = [d["doc_id"] for d in docs]
    hosts = [_golden_host(i) for i in ids]
    ranks = [rank_of.get(h, 0) if h else 0 for h in hosts]
    return pa.table({"doc_id": pa.array(ids, pa.string()),
                     "host": pa.array(hosts, pa.string()),
                     "rank": pa.array(ranks, pa.int64())})


def golden_authority_sample(auth: pa.Table, k: int = 64,
                            salt: str = "authority") -> pa.Table:
    """Membership recomputed with python scalar IEEE doubles in the
    same left-to-right order as the engine's numpy expression."""
    import hashlib

    W = sum(auth["rank"].to_pylist())
    keep = []
    for i, (did, rank) in enumerate(zip(auth["doc_id"].to_pylist(),
                                        auth["rank"].to_pylist())):
        hv = int.from_bytes(
            hashlib.md5((did + salt).encode()).digest()[:8],
            "little") & 0x7FFFFFFFFFFFFFFF
        bound = float(rank) * float(k) / float(W) \
            * 9223372036854775808.0
        if float(hv) < bound:
            keep.append(i)
    return auth.take(keep)


def golden_hits(sf_dir: str) -> pa.Table:
    """Dense single-process HITS over the same lineitem part->supplier
    digraph — differential oracle for webtext/functions/graph.py hits:
    identical integer contribution sums and float64 L1 rescale, dense
    np.add.at execution instead of bucketed joins."""
    SCALE, ITERS = 10**12, 5
    li = pq.read_table(f"{sf_dir}/lineitem.parquet",
                       columns=["l_partkey", "l_suppkey"])
    src = li["l_partkey"].to_numpy().astype(np.int64) * 2
    dst = li["l_suppkey"].to_numpy().astype(np.int64) * 2 + 1
    pairs = np.stack([src, dst], axis=1)
    uniq, w = np.unique(pairs, axis=0, return_counts=True)
    esrc, edst, ew = uniq[:, 0], uniq[:, 1], w.astype(np.int64)
    nodes = np.unique(np.concatenate([esrc, edst]))
    si = np.searchsorted(nodes, esrc)
    di = np.searchsorted(nodes, edst)
    base = np.int64(SCALE // len(nodes))
    hub = np.full(len(nodes), base, dtype=np.int64)
    auth = np.zeros(len(nodes), dtype=np.int64)

    def rescale(raw: np.ndarray) -> np.ndarray:
        s = int(raw.sum())
        ratio = (float(SCALE) / float(s)) if s else 0.0
        return np.floor(raw.astype(np.float64) * ratio) \
            .astype(np.int64)

    for _ in range(ITERS):
        araw = np.zeros(len(nodes), dtype=np.int64)
        np.add.at(araw, di, hub[si] * ew)
        auth = rescale(araw)
        hraw = np.zeros(len(nodes), dtype=np.int64)
        np.add.at(hraw, si, auth[di] * ew)
        hub = rescale(hraw)
    return pa.table({"node": pa.array(nodes, pa.int64()),
                     "hub": pa.array(hub, pa.int64()),
                     "auth": pa.array(auth, pa.int64())})


def golden_coverage_select(sf_dir, k=20):
    """Pure-Python sequential greedy max-coverage over BIGRAM units —
    differential oracle for webtext/functions/textstats.py
    coverage_select(unit='bigram'): same split-by-single-space token
    convention, adjacent pairs joined by ' ', same (gain desc, doc_id
    asc) tie-break, same stop-at-zero-gain rule."""
    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"])
    ids = t.column("doc_id").to_pylist()
    sets = {}
    for i, s in zip(ids, t.column("text").to_pylist()):
        a = s.split(" ")
        sets[int(i)] = {f"{x} {y}" for x, y in zip(a, a[1:])}
    covered: set = set()
    rows = []
    for rank in range(1, k + 1):
        best_id, best_gain = None, -1
        for did in sorted(sets):
            g = len(sets[did] - covered)
            if g > best_gain:
                best_id, best_gain = did, g
        if best_gain == 0:
            break
        covered |= sets[best_id]
        rows.append((rank, best_id, best_gain, len(covered)))
    return pa.table({
        "rank": pa.array([r for r, _, _, _ in rows], pa.int64()),
        "doc_id": pa.array([d for _, d, _, _ in rows], pa.int64()),
        "gain": pa.array([g for _, _, g, _ in rows], pa.int64()),
        "covered": pa.array([c for _, _, _, c in rows], pa.int64())})


def golden_hard_negatives(sf_dir, n_queries=16, k=5):
    """Dense single-process hard-negative mining — differential oracle
    for webtext/functions/ann.py hard_negatives: per query the top-k
    cosine neighbours with a different label, lexsort((id, -sim)) tie
    rule, 1-based ranks."""
    ids, labels, mat = emb_matrix(sf_dir)
    out_q, out_i, out_r = [], [], []
    for qi in range(n_queries):
        qpos = int(np.flatnonzero(ids == qi)[0])
        keep = (labels != labels[qpos]) & (ids != qi)
        sims = cos(mat[keep], mat[qpos])
        kids = ids[keep]
        order = np.lexsort((kids, -sims))[:k]
        for r, pos in enumerate(order, 1):
            out_q.append(qi)
            out_i.append(int(kids[pos]))
            out_r.append(r)
    return pa.table({"qid": pa.array(out_q, pa.int64()),
                     "vec_id": pa.array(out_i, pa.int64()),
                     "rank": pa.array(out_r, pa.int64())})


def golden_cluster_census(sf_dir, nlist=16, iters=5):
    """Dense cluster census over the same spec-constant k-means as
    golden_ivf_recall_audit: nearest-centroid assignment, per-cluster
    counts, inertia summed from per-vector floor(d^2 * 1e6) int64."""
    ids, labels, mat = emb_matrix(sf_dir)
    seed_ids = sorted(set(int(i) for i in
                          np.linspace(0, ids.max(), nlist).astype(int)))
    cents = np.stack([mat[ids == s][0] for s in seed_ids])
    for _ in range(iters):
        d = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        q = np.rint(mat * KMEANS_SCALE).astype(np.int64)
        tot = np.zeros((len(cents), mat.shape[1]), dtype=np.int64)
        np.add.at(tot, assign, q)
        cnt = np.bincount(assign, minlength=len(cents)).astype(np.int64)
        new = cents.copy()
        nz = cnt > 0
        new[nz] = (tot[nz] / KMEANS_SCALE) / cnt[nz, None]
        cents = new
    d = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    assign = d.argmin(axis=1)
    # same gather-then-reduce float path as the engine partial, so the
    # per-vector quantization is bit-equal
    d2 = ((mat - cents[assign]) ** 2).sum(axis=1)
    d2_micro = np.floor(d2 * 1_000_000.0).astype(np.int64)
    n = np.bincount(assign, minlength=nlist).astype(np.int64)
    iner = np.zeros(nlist, dtype=np.int64)
    np.add.at(iner, assign, d2_micro)
    nz = np.flatnonzero(n > 0)
    return pa.table({"cluster": pa.array(nz.astype(np.int64)),
                     "n": pa.array(n[nz]),
                     "inertia_micro": pa.array(iner[nz])})


def golden_dim_truncation_audit(sf_dir, n_queries=16, k=10,
                                keep_dims=16):
    """Dense truncated-dimension recall audit: full-dim vs first-
    keep_dims brute cosine top-k, lexsort((id, -sim)) tie rule,
    floor-micros recall."""
    ids, labels, mat = emb_matrix(sf_dir)
    out_q, out_h, out_r = [], [], []
    for qi in range(n_queries):
        qpos = int(np.flatnonzero(ids == qi)[0])
        keep = ids != qi
        kids = ids[keep]
        full_s = cos(mat[keep], mat[qpos])
        full = set(kids[np.lexsort((kids, -full_s))[:k]].tolist())
        tm = mat[:, :keep_dims]
        tr_s = cos(tm[keep], tm[qpos])
        tr = set(kids[np.lexsort((kids, -tr_s))[:k]].tolist())
        hits = len(full & tr)
        out_q.append(qi)
        out_h.append(hits)
        out_r.append((1_000_000 * hits) // max(1, len(full)))
    return pa.table({"qid": pa.array(out_q, pa.int64()),
                     "n_hits": pa.array(out_h, pa.int64()),
                     "recall_micro": pa.array(out_r, pa.int64())})


def golden_weighted_k_sample(sf_dir, k=100):
    """Dense Efraimidis-Spirakis exactly-k weighted sample: same
    content-addressed md5 uniforms, w = max(n_chars, 1), k smallest
    -ln(u)/w keys, ties to min doc_id."""
    import hashlib

    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "n_chars"])
    ids = np.asarray(t.column("doc_id").to_pylist(), dtype=np.int64)
    u = np.asarray(
        [int.from_bytes(hashlib.md5(str(d).encode()).digest()[:8],
                        "big") >> 1 for d in ids],
        dtype=np.float64) / float(1 << 63)
    u = np.maximum(u, 1e-18)
    w = np.maximum(np.asarray(t.column("n_chars").to_pylist(),
                              dtype=np.int64), 1).astype(np.float64)
    e = -np.log(u) / w
    order = np.lexsort((ids, e))[:k]
    return pa.table({"doc_id": pa.array(ids[order])})


def golden_label_centroid_drift(sf_dir, scale=1_000_000_000):
    """Dense label-centroid drift: same half-away-from-zero fixed-point
    sums as label_centroids, global centroid from the summed label
    sums, floor-micros cosine distance."""
    ids, labels, mat = emb_matrix(sf_dir)
    x = mat * float(scale)
    fp = np.where(x >= 0, np.floor(x + 0.5),
                  np.ceil(x - 0.5)).astype(np.int64)
    uniq = np.unique(labels)
    sums = np.zeros((len(uniq), mat.shape[1]), dtype=np.int64)
    inv = np.searchsorted(uniq, labels)
    np.add.at(sums, inv, fp)
    n = np.bincount(inv).astype(np.int64)
    g = sums.sum(axis=0).astype(np.float64) / float(n.sum())
    cents = sums.astype(np.float64) / n[:, None].astype(np.float64)
    num = cents @ g
    den = np.sqrt((cents * cents).sum(axis=1)) * np.sqrt(g @ g)
    drift = np.floor((1.0 - num / den) * 1_000_000.0).astype(np.int64)
    return pa.table({"label": pa.array(uniq.astype(np.int64)),
                     "n": pa.array(n),
                     "drift_micro": pa.array(drift)})


def golden_poisson_bootstrap(sf_dir, n_replicas=32):
    """Dense Poisson-bootstrap replicas: same splitmix64 uniforms over
    (event_id*B + b), same Poisson(1) CDF inversion, int64 sums."""
    t = pq.read_table(f"{sf_dir}/events.parquet",
                      columns=["event_id", "value"])
    ids = np.asarray(t.column("event_id").to_pylist(),
                     dtype=np.int64).astype(np.uint64)
    cents = np.rint(np.asarray(t.column("value").to_pylist(),
                               dtype=np.float64) * 100.0).astype(np.int64)
    fact = [1.0]
    for i in range(1, 8):
        fact.append(fact[-1] * i)
    cdf = np.cumsum([np.exp(-1.0) / f for f in fact])
    b = np.arange(n_replicas, dtype=np.uint64)
    x = ids[:, None] * np.uint64(n_replicas) + b[None, :]
    x = x + np.uint64(0x9E3779B97F4A7C15)
    z = x
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    z = z ^ (z >> np.uint64(31))
    u = z.astype(np.float64) / float(2**64)
    w = np.searchsorted(cdf, u).astype(np.int64)
    return pa.table({
        "replica": pa.array(np.arange(n_replicas, dtype=np.int64)),
        "n": pa.array(w.sum(axis=0)),
        "sum_cents": pa.array((w * cents[:, None]).sum(axis=0))})


def golden_cms_join_estimate(sf_dir, d=4, w=8):
    """Independent CMS join-size estimation audit: exact self-join
    size sum(cnt^2) via a Counter in Python big-ints, the same keyed-
    blake2b row hashes, dense sketch, min-over-rows inner product."""
    import collections
    import hashlib as _hl

    texts = pq.read_table(f"{sf_dir}/documents.parquet",
                          columns=["text"])["text"].to_pylist()
    counts = collections.Counter()
    for t in texts:
        counts.update(t.split(" "))
    exact = sum(n * n for n in counts.values())
    sketch = np.zeros((d, w), dtype=np.int64)
    for tok, n in counts.items():
        for i in range(d):
            h = int.from_bytes(_hl.blake2b(
                tok.encode("utf-8"), key=i.to_bytes(8, "little"),
                digest_size=8).digest(), "little")
            sketch[i, h % w] += n
    est = min(int((sketch[i].astype(object) ** 2).sum())
              for i in range(d))
    err = (1_000_000 * (est - exact)) // max(1, exact)
    return pa.table({"exact_join": pa.array([exact], pa.int64()),
                     "cms_est": pa.array([est], pa.int64()),
                     "err_micro": pa.array([err], pa.int64())})


def golden_kcenter(sf_dir: str, k: int = 8) -> pa.Table:
    """Dense single-process greedy k-center (farthest-point, Gonzalez)
    — differential oracle for webtext/functions/ann.py kcenter_select:
    identical integer-micros distance recurrence and (max dist, min id)
    tie-break, dense numpy execution instead of blockwise partials."""
    ids, _labels, mat = emb_matrix(sf_dir)
    c0_pos = int(np.argmin(ids))
    sel = [(0, int(ids[c0_pos]), 0)]
    centers = mat[[c0_pos]]
    for rank in range(1, k):
        d2 = ((mat[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
        dmi = np.floor(d2 * 1_000_000.0 + 0.5).astype(np.int64)
        nearest = dmi.min(axis=1)
        order = np.lexsort((ids, -nearest))
        b = order[0]
        sel.append((rank, int(ids[b]), int(nearest[b])))
        centers = np.concatenate([centers, mat[[b]]])
    return pa.table({
        "rank": pa.array([r for r, _, _ in sel], pa.int64()),
        "vec_id": pa.array([v for _, v, _ in sel], pa.int64()),
        "dist_micro": pa.array([d for _, _, d in sel], pa.int64())})


def golden_lineage(sf_dir: str) -> pa.Table:
    """Per-shard lineage golden from the pure oracle: replicate the
    committed run's corpus (seed 42, rows_per_file=40 chunking =
    part-%05d shard names) and aggregate extract_document results —
    independent of the engine's manifest collection entirely."""
    n_fam = 16 if sf_dir.rstrip("/").endswith("0.1") else 8
    res = oracle_results(n_fam, seed=42)
    per = {}
    for i in range(0, len(res), 40):
        shard = f"part-{i // 40:05d}"
        rec = per.setdefault(shard, {
            "docs": 0, "ok": 0, "timeout": 0, "failed": 0,
            "error_pattern": 0, "n_chars_out": 0})
        for _doc, r in res[i:i + 40]:
            rec["docs"] += 1
            rec[r.status] += 1
            rec["n_chars_out"] += sum(len(s["text"]) for s in r.spans)
    shards = sorted(per)
    return pa.table({
        "shard": pa.array(shards, pa.string()),
        **{k: pa.array([per[s][k] for s in shards], pa.int64())
           for k in ("docs", "ok", "timeout", "failed",
                     "error_pattern", "n_chars_out")}})


def golden_hll_users_windowed(sf_dir: str) -> pa.Table:
    """Tumbling-1-day-window variant of golden_hll_users_by_type: one
    independent scalar-python HLL per day over that day's distinct
    user set — differential vs sketches.hll_users_windowed."""
    P = 12
    m = 1 << P
    t = pq.read_table(f"{sf_dir}/events.parquet",
                      columns=["ts", "user_id"])
    by_day: dict[str, set] = {}
    for ts, uid in zip(t["ts"].to_pylist(), t["user_id"].to_pylist()):
        by_day.setdefault(ts.strftime("%Y-%m-%d"), set()).add(int(uid))
    MASK = (1 << 64) - 1
    gs, ests = [], []
    for day in sorted(by_day):
        regs = np.zeros(m, dtype=np.int64)
        for v in sorted(by_day[day]):
            z = (v + 0x9E3779B97F4A7C15) & MASK
            z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & MASK
            z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & MASK
            z = z ^ (z >> 31)
            reg = z & (m - 1)
            w = z >> P
            rho = (64 - P) + 1 if w == 0 \
                else (64 - P) - (w.bit_length() - 1)
            if rho > regs[reg]:
                regs[reg] = rho
        alpha = 0.7213 / (1 + 1.079 / m)
        raw = alpha * m * m / np.sum(
            np.power(2.0, -regs.astype(np.float64)))
        zeros = int(np.sum(regs == 0))
        est = m * np.log(m / zeros) if (raw <= 2.5 * m and zeros) \
            else raw
        gs.append(day)
        ests.append(int(round(est)))
    return pa.table({"g": pa.array(gs, pa.string()),
                     "n_approx": pa.array(ests, pa.int64())})


def golden_dd_quantiles(sf_dir: str, sub: int = 32,
                        qs=(0.5, 0.95, 0.99)) -> pa.Table:
    """Independent single-process DDSketch-style quantiles per
    event_type: dense per-type bucket dict, same frexp bucketing and
    midpoint representative as webtext/functions/sketches.py
    dd_quantiles_by_group — must match bit-for-bit."""
    import math

    ev = pq.read_table(f"{sf_dir}/events.parquet",
                       columns=["event_type", "value"]).to_pylist()
    per_type: dict[str, dict[int, int]] = {}
    for r in ev:
        c = math.floor(r["value"] * 100.0 + 0.5)
        if c < 1:
            key = -1
        else:
            m, e = math.frexp(float(c))
            key = (e - 1) * sub + min(int((m * 2.0 - 1.0) * sub),
                                      sub - 1)
        d = per_type.setdefault(r["event_type"], {})
        d[key] = d.get(key, 0) + 1
    rows = {"grp": [], "q_pct": [], "est_cents": []}
    for t in sorted(per_type):
        items = sorted(per_type[t].items())
        keys = [k for k, _ in items]
        cum = np.cumsum([n for _, n in items])
        total = int(cum[-1])
        for q in qs:
            rank = max(0, int(np.ceil(q * total)) - 1)
            b = int(np.searchsorted(cum, rank + 1))
            k = keys[b]
            rep = 0 if k < 0 else int(math.floor(
                2.0 ** (k // sub)
                * (1.0 + ((k % sub) + 0.5) / sub) + 0.5))
            rows["grp"].append(t)
            rows["q_pct"].append(int(round(q * 100)))
            rows["est_cents"].append(rep)
    return pa.Table.from_pydict(rows, schema=pa.schema(
        [("grp", pa.string()), ("q_pct", pa.int64()),
         ("est_cents", pa.int64())]))


def golden_hll_users(sf_dir: str) -> pa.Table:
    """Independent single-process HyperLogLog (p=12, splitmix64 element
    hash) over events.user_id — the sketch is a pure deterministic
    function of the value SET, so a differential golden IS possible:
    same published estimator (Flajolet et al. 2007 alpha_m + the
    small-range linear-counting correction), entirely different
    execution (scalar-python register scatter over the distinct set here
    vs per-block vectorized partial registers + groupby(register).max
    shuffle in webtext/functions/sketches.py)."""
    P = 12
    m = 1 << P
    uid = pq.read_table(f"{sf_dir}/events.parquet",
                        columns=["user_id"])["user_id"].to_pylist()
    regs = np.zeros(m, dtype=np.int64)
    MASK = (1 << 64) - 1
    for v in sorted({int(x) for x in uid}):
        z = (v + 0x9E3779B97F4A7C15) & MASK
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & MASK
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & MASK
        z = z ^ (z >> 31)
        reg = z & (m - 1)
        w = z >> P
        rho = (64 - P) + 1 if w == 0 else (64 - P) - (w.bit_length() - 1)
        if rho > regs[reg]:
            regs[reg] = rho
    alpha = 0.7213 / (1 + 1.079 / m)
    raw = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int(np.sum(regs == 0))
    est = m * np.log(m / zeros) if (raw <= 2.5 * m and zeros) else raw
    return pa.table({"n_approx": pa.array([int(round(est))], pa.int64())})


def golden_hll_users_by_type(sf_dir: str) -> pa.Table:
    """Per-event_type variant of golden_hll_users: one independent
    scalar-python HLL per group over that group's distinct user set —
    differential vs sketches.hll_distinct_by_group's vectorized
    partial-register + groupby(g, register).max execution."""
    P = 12
    m = 1 << P
    t = pq.read_table(f"{sf_dir}/events.parquet",
                      columns=["event_type", "user_id"])
    by_type: dict[str, set] = {}
    for et, uid in zip(t["event_type"].to_pylist(),
                       t["user_id"].to_pylist()):
        by_type.setdefault(et, set()).add(int(uid))
    MASK = (1 << 64) - 1
    gs, ests = [], []
    for et in sorted(by_type):
        regs = np.zeros(m, dtype=np.int64)
        for v in sorted(by_type[et]):
            z = (v + 0x9E3779B97F4A7C15) & MASK
            z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & MASK
            z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & MASK
            z = z ^ (z >> 31)
            reg = z & (m - 1)
            w = z >> P
            rho = (64 - P) + 1 if w == 0 \
                else (64 - P) - (w.bit_length() - 1)
            if rho > regs[reg]:
                regs[reg] = rho
        alpha = 0.7213 / (1 + 1.079 / m)
        raw = alpha * m * m / np.sum(
            np.power(2.0, -regs.astype(np.float64)))
        zeros = int(np.sum(regs == 0))
        est = m * np.log(m / zeros) if (raw <= 2.5 * m and zeros) \
            else raw
        gs.append(et)
        ests.append(int(round(est)))
    return pa.table({"g": pa.array(gs, pa.string()),
                     "n_approx": pa.array(ests, pa.int64())})


def golden_nb_classify(sf_dir: str, n_feats: int = 4096,
                       train_mod: int = 10,
                       train_lt: int = 8) -> pa.Table:
    """Independent single-process multinomial NB with feature hashing —
    dict-of-dicts counts, math.log micro-quantized log-probs, ties to
    the lexicographically smallest language (must match
    webtext/functions/lm.py nb_classify bit-for-bit)."""
    import math

    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang", "text"]).to_pylist()
    counts: dict[str, dict[int, int]] = {}
    docs_of: dict[str, int] = {}
    for d in docs:
        if d["doc_id"] % train_mod < train_lt:
            lg = d["lang"]
            docs_of[lg] = docs_of.get(lg, 0) + 1
            c = counts.setdefault(lg, {})
            for tok in d["text"].split(" "):
                f = zlib.crc32(tok.encode("utf-8")) % n_feats
                c[f] = c.get(f, 0) + 1
    langs = sorted(docs_of)
    d_total = sum(docs_of.values())
    prior = {lg: math.floor(math.log(float(docs_of[lg])
                                     / float(d_total))
                            * 1000000.0 + 0.5) for lg in langs}
    denom = {lg: float(sum(counts.get(lg, {}).values()) + n_feats)
             for lg in langs}
    llp = {lg: {f: math.floor(math.log(float(c + 1) / denom[lg])
                              * 1000000.0 + 0.5)
                for f, c in counts.get(lg, {}).items()}
           for lg in langs}
    zero = {lg: math.floor(math.log(1.0 / denom[lg])
                           * 1000000.0 + 0.5) for lg in langs}
    rows = {"doc_id": [], "lang": [], "pred": []}
    for d in docs:
        if d["doc_id"] % train_mod < train_lt:
            continue
        feats = [zlib.crc32(tok.encode("utf-8")) % n_feats
                 for tok in d["text"].split(" ")]
        best, best_s = None, None
        for lg in langs:                 # sorted → first max wins
            s = prior[lg] + sum(
                llp[lg].get(f, zero[lg]) for f in feats)
            if best_s is None or s > best_s:
                best, best_s = lg, s
        rows["doc_id"].append(d["doc_id"])
        rows["lang"].append(d["lang"])
        rows["pred"].append(best)
    return pa.Table.from_pydict(rows, schema=pa.schema(
        [("doc_id", pa.int64()), ("lang", pa.string()),
         ("pred", pa.string())]))


def golden_pca_top_component(sf_dir: str, iters: int = 100) -> pa.Table:
    """Independent single-process PCA top direction: exact integer
    Gram (python big-int accumulation via object dtype) over the
    identically-quantized micro embeddings, then the same
    fixed-iteration float64 power recurrence as
    webtext/functions/ann.py pca_top_component — a differential oracle
    (dense numpy vs limb-encoded distributed partials)."""
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["embedding"])
    x = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    y = x * 1_000_000.0
    q = np.copysign(np.floor(np.abs(y) + 0.5), y).astype(np.int64)
    G_exact = q.astype(object).T @ q.astype(object)   # exact big-ints
    d = G_exact.shape[0]
    G = np.array([[float(G_exact[i, j]) for j in range(d)]
                  for i in range(d)], dtype=np.float64)
    v = np.full(d, 1.0 / np.sqrt(d))
    for _ in range(iters):
        w = G @ v
        nrm = float(np.sqrt(np.dot(w, w)))
        if nrm == 0.0:
            break
        v = w / nrm
    if v[int(np.argmax(np.abs(v)))] < 0:
        v = -v
    lm = np.copysign(np.floor(np.abs(v * 1_000_000.0) + 0.5), v) \
        .astype(np.int64)
    return pa.table({"dim": pa.array(np.arange(d, dtype=np.int64)),
                     "loading_micro": pa.array(lm)})


def golden_effective_rank(sf_dir: str) -> pa.Table:
    """Independent exact participation-ratio effective rank: big-int
    Gram trace and Frobenius-squared over the identically-quantized
    micro embeddings — pure object-dtype numpy, no limbs."""
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["embedding"])
    x = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    y = x * 1_000_000.0
    q = np.copysign(np.floor(np.abs(y) + 0.5), y).astype(np.int64)
    G = q.astype(object).T @ q.astype(object)
    d = G.shape[0]
    tr = sum(int(G[i, i]) for i in range(d))
    tr2 = sum(int(G[i, j]) ** 2 for i in range(d) for j in range(d))
    er_micro = (1_000_000 * tr * tr) // tr2 if tr2 else 0
    return pa.table({"dim": pa.array([d], pa.int64()),
                     "er_micro": pa.array([er_micro], pa.int64())})


def golden_minhash_recall_audit(sf_dir, threshold=0.9) -> pa.Table:
    """Independent recall audit on the doc_id%10==0 slice: exact pairs
    by dense all-pairs word-Jaccard, LSH pairs by the dense
    spec-constant banding reimpl (golden_minhash_pairs)."""
    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"])
    ids = t.column("doc_id").to_numpy().astype(np.int64)
    texts = t.column("text").to_pylist()
    keep = ids % 10 == 0
    ids = ids[keep].tolist()
    texts = [x for x, k in zip(texts, keep) if k]
    exact = set()
    order = sorted(range(len(ids)), key=lambda i: ids[i])
    for a in range(len(order)):
        for b in range(a + 1, len(order)):
            i, j = order[a], order[b]
            inter, union = word_jaccard(texts[i], texts[j])
            if union and inter / union >= threshold:
                exact.add((ids[i], ids[j]))
    lsh = set(golden_minhash_pairs(ids, texts, threshold))
    hits = len(exact & lsh)
    return pa.table({
        "n_exact": pa.array([len(exact)], pa.int64()),
        "n_lsh": pa.array([len(lsh)], pa.int64()),
        "n_hits": pa.array([hits], pa.int64()),
        "recall_micro": pa.array(
            [(1_000_000 * hits) // max(1, len(exact))], pa.int64())})


def golden_whiten_embeddings(sf_dir: str, iters: int = 30,
                             eps_micro: int = 1000) -> pa.Table:
    """Independent ZCA whitening: exact big-int Gram over the
    identically-quantized micro embeddings, the same fixed-iteration
    Newton-Schulz recurrence (re-stated here), one dense transform."""
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    x = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    vid = t.column("vec_id").to_numpy().astype(np.int64)
    y = x * 1_000_000.0
    q = np.copysign(np.floor(np.abs(y) + 0.5), y).astype(np.int64)
    G = q.astype(object).T @ q.astype(object)
    d = G.shape[0]
    n = len(vid)
    C = np.array([[float(G[i, j]) / (1e12 * float(n))
                   for j in range(d)] for i in range(d)])
    C = C + (float(eps_micro) / 1e6) * np.eye(d)
    c = float(np.trace(C))
    A = C / c
    eye = np.eye(d)
    Y, Z = A.copy(), eye.copy()
    for _ in range(iters):
        T = 0.5 * (3.0 * eye - Z @ Y)
        Y = Y @ T
        Z = T @ Z
    W = Z / np.sqrt(c)
    out = x @ W
    qq = np.copysign(np.floor(np.abs(out * 1e6) + 0.5), out) \
        .astype(np.int64)
    return pa.table({
        "vec_id": pa.array(np.repeat(vid, d)),
        "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), n)),
        "w_micro": pa.array(qq.reshape(-1))})


def golden_kmv_distinct(sf_dir: str, k: int = 256) -> pa.Table:
    """Independent KMV distinct estimate of events.user_id: the same
    splitmix64 finalizer (re-stated here, not imported) over the full
    column at once — no blocking, no partial merge — so agreement with
    the distributed block-partial implementation proves
    blocking-invariance of the sketch."""
    t = pq.read_table(f"{sf_dir}/events.parquet", columns=["user_id"])
    data = t.column("user_id").to_numpy().astype(np.uint64)
    z = data + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    z = z ^ (z >> np.uint64(31))
    merged = np.unique(z)[:k]
    kth = int(merged[-1])
    if len(merged) < k:
        est = len(merged)
    else:
        est = int((k - 1) * 18446744073709551616.0 / float(kth))
    return pa.table({
        "est_distinct": pa.array([est], pa.int64()),
        "k_used": pa.array([int(len(merged))], pa.int64()),
        "kth_hash": pa.array([int(merged[-1:].astype(np.int64)[0])],
                             pa.int64())})


def golden_hll_error_audit(sf_dir: str) -> pa.Table:
    """Independent HLL-vs-exact error audit over events.user_id: exact
    distinct via a python set, estimate via the same scalar HLL as
    golden_hll_users."""
    uid = pq.read_table(f"{sf_dir}/events.parquet",
                        columns=["user_id"])["user_id"].to_pylist()
    distinct = sorted({int(x) for x in uid})
    P = 12
    m = 1 << P
    regs = np.zeros(m, dtype=np.int64)
    MASK = (1 << 64) - 1
    for v in distinct:
        z = (v + 0x9E3779B97F4A7C15) & MASK
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & MASK
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & MASK
        z = z ^ (z >> 31)
        reg = z & (m - 1)
        w = z >> P
        rho = (64 - P) + 1 if w == 0 else (64 - P) - (w.bit_length() - 1)
        if rho > regs[reg]:
            regs[reg] = rho
    alpha = 0.7213 / (1 + 1.079 / m)
    raw = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int(np.sum(regs == 0))
    est = m * np.log(m / zeros) if (raw <= 2.5 * m and zeros) else raw
    est = int(round(est))
    exact = len(distinct)
    err = (1_000_000 * abs(est - exact)) // max(1, exact)
    return pa.table({"exact_distinct": pa.array([exact], pa.int64()),
                     "n_approx": pa.array([est], pa.int64()),
                     "err_micro": pa.array([err], pa.int64())})


def golden_cms_error_audit(sf_dir: str, k: int = 50, d: int = 4,
                           w: int = 8) -> pa.Table:
    """Independent CMS overestimate audit at small width: exact token
    counts via a Counter, the same keyed-blake2b row hashes, dense
    sketch, min-over-rows estimates for the exact top-k."""
    import collections
    import hashlib as _hl

    texts = pq.read_table(f"{sf_dir}/documents.parquet",
                          columns=["text"])["text"].to_pylist()
    counts = collections.Counter()
    for t in texts:
        counts.update(t.split(" "))
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    sketch = np.zeros((d, w), dtype=np.int64)
    for tok, n in counts.items():
        for i in range(d):
            h = int.from_bytes(_hl.blake2b(
                tok.encode("utf-8"), key=i.to_bytes(8, "little"),
                digest_size=8).digest(), "little")
            sketch[i, h % w] += n
    se = sx = 0
    for tok, n in top:
        est = min(int(sketch[i, int.from_bytes(_hl.blake2b(
            tok.encode("utf-8"), key=i.to_bytes(8, "little"),
            digest_size=8).digest(), "little") % w]) for i in range(d))
        se += est
        sx += n
    return pa.table({
        "n_tokens": pa.array([len(top)], pa.int64()),
        "sum_exact": pa.array([sx], pa.int64()),
        "sum_est": pa.array([se], pa.int64()),
        "over_micro": pa.array([(1_000_000 * (se - sx))
                                // max(1, sx)], pa.int64())})


def golden_bloom_fp_audit(sf_dir: str, m: int = 1 << 20,
                          k: int = 4) -> pa.Table:
    """Independent Bloom FP audit on the same 50/50 content split as
    bloom_dedup: python-int double hashing, set-based exact membership."""
    import hashlib as _hl

    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"]).to_pylist()

    def probes(text):
        f = _hl.md5(text.encode("utf-8")).hexdigest()
        h1, h2 = int(f[:16], 16), int(f[16:32], 16)
        return [((h1 + i * h2) % (1 << 64)) % m for i in range(k)], f

    bset: set[int] = set()
    seen_fps: set[str] = set()
    for dd in docs:
        if dd["doc_id"] % 100 < 50:
            p, f = probes(dd["text"])
            bset.update(p)
            seen_fps.add(f)
    n_probe = n_bloom = n_true = 0
    for dd in docs:
        if dd["doc_id"] % 100 < 50:
            continue
        p, f = probes(dd["text"])
        n_probe += 1
        if all(x in bset for x in p):
            n_bloom += 1
        if f in seen_fps:
            n_true += 1
    denom = max(1, n_probe - n_true)
    return pa.table({
        "n_probe": pa.array([n_probe], pa.int64()),
        "n_bloom_hits": pa.array([n_bloom], pa.int64()),
        "n_true_hits": pa.array([n_true], pa.int64()),
        "fp_micro": pa.array([(1_000_000 * (n_bloom - n_true))
                              // denom], pa.int64())})


def golden_quantile_sketch_audit(sf_dir: str, sub: int = 32,
                                 qs=(0.5, 0.95)) -> pa.Table:
    """Independent quantile-sketch error audit: exact quantile_disc per
    event_type (numpy sort + rank) vs the same dense DDSketch as
    golden_dd_quantiles, error in floor micros."""
    import math

    ev = pq.read_table(f"{sf_dir}/events.parquet",
                       columns=["event_type", "value"]).to_pylist()
    per_type_vals: dict[str, list[float]] = {}
    per_type: dict[str, dict[int, int]] = {}
    for r in ev:
        per_type_vals.setdefault(r["event_type"], []).append(r["value"])
        c = math.floor(r["value"] * 100.0 + 0.5)
        if c < 1:
            key = -1
        else:
            m, e = math.frexp(float(c))
            key = (e - 1) * sub + min(int((m * 2.0 - 1.0) * sub),
                                      sub - 1)
        d = per_type.setdefault(r["event_type"], {})
        d[key] = d.get(key, 0) + 1
    rows = {"grp": [], "q_pct": [], "exact_cents": [],
            "est_cents": [], "err_micro": []}
    for t in sorted(per_type_vals):
        vals = np.sort(np.asarray(per_type_vals[t]))
        items = sorted(per_type[t].items())
        keys = [k for k, _ in items]
        cum = np.cumsum([n for _, n in items])
        total = int(cum[-1])
        for q in qs:
            rank = max(0, int(np.ceil(q * len(vals))) - 1)
            exact_c = int(math.floor(float(vals[rank]) * 100.0 + 0.5))
            b = int(np.searchsorted(cum, rank + 1))
            k = keys[b]
            est_c = 0 if k < 0 else int(math.floor(
                2.0 ** (k // sub)
                * (1.0 + ((k % sub) + 0.5) / sub) + 0.5))
            rows["grp"].append(t)
            rows["q_pct"].append(int(round(q * 100)))
            rows["exact_cents"].append(exact_c)
            rows["est_cents"].append(est_c)
            rows["err_micro"].append(
                (1_000_000 * abs(est_c - exact_c)) // max(1, exact_c))
    return pa.table({
        "grp": pa.array(rows["grp"], pa.string()),
        "q_pct": pa.array(rows["q_pct"], pa.int64()),
        "exact_cents": pa.array(rows["exact_cents"], pa.int64()),
        "est_cents": pa.array(rows["est_cents"], pa.int64()),
        "err_micro": pa.array(rows["err_micro"], pa.int64())})


def golden_bloom_dedup(sf_dir: str, m: int = 1 << 20,
                       k: int = 4) -> pa.Table:
    """Independent Bloom-filter incremental dedup: Python-int double
    hashing over md5 halves, set-of-bit-positions filter (must match
    webtext/functions/sketches.py bloom_dedup bit-for-bit, including
    any false-positive drops)."""
    import hashlib

    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"]).to_pylist()

    def probes(text: str):
        f = hashlib.md5(text.encode("utf-8")).hexdigest()
        h1, h2 = int(f[:16], 16), int(f[16:32], 16)
        return [((h1 + i * h2) % (1 << 64)) % m for i in range(k)], f

    bset: set[int] = set()
    for d in docs:
        if d["doc_id"] % 100 < 50:
            p, _ = probes(d["text"])
            bset.update(p)
    rows = {"doc_id": [], "fp": []}
    for d in docs:
        if d["doc_id"] % 100 < 50:
            continue
        p, f = probes(d["text"])
        if not all(x in bset for x in p):
            rows["doc_id"].append(d["doc_id"])
            rows["fp"].append(f)
    return pa.Table.from_pydict(rows, schema=pa.schema(
        [("doc_id", pa.int64()), ("fp", pa.string())]))


def build_goldens(sf_dir: str) -> dict[str, pa.Table]:
    tag = os.path.basename(sf_dir.rstrip("/"))
    n_fam = 16 if tag.endswith("0.1") else 8

    g: dict[str, pa.Table] = {}

    # -- documents-table algorithmic ops
    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"])
    ids = t["doc_id"].to_pylist()
    texts = t["text"].to_pylist()

    mh = golden_minhash_pairs(ids, texts)
    g["minhash_lsh_pairs"] = pa.table(
        {"left_id": pa.array([p[0] for p in mh], pa.int64()),
         "right_id": pa.array([p[1] for p in mh], pa.int64())})

    # incremental NEAR-dup: new docs (doc_id%100>=50) flagged by any
    # cross-half confirmed pair drop; survivors derive from the same
    # independent banding+Jaccard reimplementation as minhash pairs
    flagged = {b if b % 100 >= 50 else a
               for a, b in mh if (a % 100 < 50) != (b % 100 < 50)}
    surv = sorted(i for i in ids if i % 100 >= 50 and i not in flagged)
    g["incremental_near_dedup"] = pa.table(
        {"doc_id": pa.array(surv, pa.int64())})

    hashes = [simhash64(x) for x in texts]
    g["simhash"] = pa.table(
        {"doc_id": pa.array(ids, pa.int64()),
         "simhash": pa.array(hashes, pa.int64())})

    sp = golden_simhash_pairs(ids, hashes)
    g["simhash_dup_pairs"] = pa.table(
        {"left_id": pa.array([p[0] for p in sp], pa.int64()),
         "right_id": pa.array([p[1] for p in sp], pa.int64())})

    fps = [winnow_fps(x) for x in texts]
    g["winnow_fingerprint"] = pa.table(
        {"doc_id": pa.array(ids, pa.int64()),
         "n_fps": pa.array([len(f) for f in fps], pa.int64()),
         "min_fp": pa.array([min(f) if f else 0 for f in fps], pa.int64()),
         "max_fp": pa.array([max(f) if f else 0 for f in fps], pa.int64())})

    # containment pairs: MOSS overlap ratio on distinct winnow fps,
    # replicating the distributed op's deterministic hot-fp cap (docs
    # per fp sorted ascending, truncated to 64) exactly
    from collections import Counter

    fpsets = {i: sorted(set(f)) for i, f in zip(ids, fps)}
    nfp = {i: len(f) for i, f in fpsets.items()}
    by_fp: dict[int, list[int]] = {}
    for i in ids:
        for x in fpsets[i]:
            by_fp.setdefault(x, []).append(i)
    shared: Counter = Counter()
    for x, docs in by_fp.items():
        docs = sorted(docs)[:64]
        for ai in range(len(docs)):
            for bi in range(ai + 1, len(docs)):
                shared[(docs[ai], docs[bi])] += 1
    crows = [(a, b, s, min(nfp[a], nfp[b]))
             for (a, b), s in sorted(shared.items())
             if s * 2 >= min(nfp[a], nfp[b])]
    g["containment_pairs"] = pa.table(
        {"left_id": pa.array([r[0] for r in crows], pa.int64()),
         "right_id": pa.array([r[1] for r in crows], pa.int64()),
         "shared_fps": pa.array([r[2] for r in crows], pa.int64()),
         "min_fps": pa.array([r[3] for r in crows], pa.int64())})

    # zlib compressibility: same pinned codec (level 6), independent
    # single-process pass
    import zlib

    craw = [len(x.encode("utf-8")) for x in texts]
    ccmp = [len(zlib.compress(x.encode("utf-8"), 6)) for x in texts]
    g["compression_ratio"] = pa.table(
        {"doc_id": pa.array(ids, pa.int64()),
         "raw_bytes": pa.array(craw, pa.int64()),
         "zlib_bytes": pa.array(ccmp, pa.int64()),
         "ratio_micro": pa.array(
             [c * 1_000_000 // r if r else 0
              for r, c in zip(craw, ccmp)], pa.int64())})

    uf = UnionFind()
    for a, b in mh:
        uf.union(a, b)
    dropped = {x for x in uf.p if uf.find(x) != x}
    keep = [(d, x) for d, x in zip(ids, texts) if d not in dropped]
    g["dedup_apply"] = pa.table(
        {"doc_id": pa.array([d for d, _ in keep], pa.int64()),
         "text": pa.array([x for _, x in keep], pa.string())})

    # duplicate-lineage mapping: every dropped member -> its cluster's
    # min-id representative (the CC label convention)
    comp_map: dict[int, list[int]] = {}
    for x in uf.p:
        comp_map.setdefault(uf.find(x), []).append(x)
    map_rows = []
    for members in comp_map.values():
        rep = min(members)
        map_rows.extend((m, rep) for m in members if m != rep)
    map_rows.sort()
    g["dup_mapping"] = pa.table(
        {"doc_id": pa.array([m for m, _ in map_rows], pa.int64()),
         "rep_id": pa.array([r for _, r in map_rows], pa.int64())})

    # keep-LONGEST dedup: same clusters, best member = most characters
    # (Python len(str) counts code points = Arrow utf8_length), ties →
    # min doc_id; everything else in the cluster drops
    comp: dict[int, list[int]] = {}
    for x in uf.p:
        comp.setdefault(uf.find(x), []).append(x)
    len_by = {i: len(x) for i, x in zip(ids, texts)}
    drop_best: set[int] = set()
    for members in comp.values():
        best = min(members, key=lambda i: (-len_by[i], i))
        drop_best.update(m for m in members if m != best)
    keep_l = [(d, x) for d, x in zip(ids, texts) if d not in drop_best]
    g["dedup_keep_longest"] = pa.table(
        {"doc_id": pa.array([d for d, _ in keep_l], pa.int64()),
         "text": pa.array([x for _, x in keep_l], pa.string())})

    # curation pipeline: gopher keep → keep-longest near-dedup over the
    # SURVIVORS (pairs re-derived on the filtered set — banding is
    # per-doc, so filtering first changes nothing for surviving pairs)
    # → epoch-0 md5 shuffle; every rule re-derived here from the spec
    # constants, no library code
    import hashlib as _hl

    _stop = {"the", "a", "of", "and", "in", "to"}

    def _gopher_keep(text: str) -> bool:
        toks = text.split(" ")
        n_tok = len(toks)
        tot = len(text) - n_tok + 1
        n_stop = sum(1 for t in toks if t in _stop)
        n_uniq = len(set(toks))
        return (20 <= n_tok <= 90 and 10 * tot >= 42 * n_tok
                and tot <= 10 * n_tok and 50 * n_stop >= n_tok
                and 10 * n_uniq >= 4 * n_tok)

    kept_g = [(d, x) for d, x in zip(ids, texts) if _gopher_keep(x)]
    mh2 = golden_minhash_pairs([d for d, _ in kept_g],
                               [x for _, x in kept_g])
    uf2 = UnionFind()
    for a, b in mh2:
        uf2.union(a, b)
    comp2: dict[int, list[int]] = {}
    for x in uf2.p:
        comp2.setdefault(uf2.find(x), []).append(x)
    lb2 = {d: len(x) for d, x in kept_g}
    drop2: set[int] = set()
    for members in comp2.values():
        best2 = min(members, key=lambda i: (-lb2[i], i))
        drop2.update(m for m in members if m != best2)
    by_shard: dict[int, list[tuple[str, int]]] = {}
    for d, _ in kept_g:
        if d in drop2:
            continue
        h = _hl.md5(f"{d}:e0".encode()).hexdigest()
        by_shard.setdefault(int(h[:4], 16) % 64, []).append((h, d))
    crow = []
    for sh in sorted(by_shard):
        for pos, (_, d) in enumerate(sorted(by_shard[sh]), 1):
            crow.append((d, sh, pos))
    g["curation_pipeline"] = pa.table(
        {"doc_id": pa.array([r[0] for r in crow], pa.int64()),
         "shard": pa.array([r[1] for r in crow], pa.int64()),
         "pos": pa.array([r[2] for r in crow], pa.int64())})

    # dup-cluster size histogram from the SAME independent union-find
    # (clusters of size >= 2 only — singletons never enter the edge set)
    comp_size: Counter = Counter()
    for x in uf.p:
        comp_size[uf.find(x)] += 1
    hist = Counter(comp_size.values())
    g["dup_cluster_stats"] = pa.table(
        {"cluster_size": pa.array(sorted(hist), pa.int64()),
         "n_clusters": pa.array([hist[s] for s in sorted(hist)],
                                pa.int64())})

    # sequence packing: hash-bucket (Knuth multiplicative, 64 buckets)
    # then first-fit-sequential in doc_id order, budget 256 tokens
    buckets: dict[int, list[tuple[int, int]]] = {}
    for did, text in zip(ids, texts):
        b = ((did * 2654435761) & 0x7FFFFFFFFFFFFFFF) % 64
        buckets.setdefault(b, []).append((did, len(text.split(" "))))
    prow = {"bucket": [], "pack_id": [], "doc_id": [], "n_tokens": []}
    for b in sorted(buckets):
        cur_id, cur_tot = 0, 0
        for did, n in sorted(buckets[b]):
            if cur_tot and cur_tot + n > 256:
                cur_id += 1
                cur_tot = 0
            cur_tot += n
            prow["bucket"].append(b)
            prow["pack_id"].append(cur_id)
            prow["doc_id"].append(did)
            prow["n_tokens"].append(n)
    g["pack_sequences"] = pa.Table.from_pydict(
        prow, schema=pa.schema([("bucket", pa.int64()),
                                ("pack_id", pa.int64()),
                                ("doc_id", pa.int64()),
                                ("n_tokens", pa.int64())]))

    # training_pipeline: quality filter → exact dedup → packing, all
    # re-derived here from the spec (no library code)
    STOPS = [("en", {"the", "a", "of", "and", "in", "to"}),
             ("es", {"el", "la", "de", "y", "en", "que"}),
             ("de", {"der", "die", "das", "und", "ist", "von"}),
             ("fr", {"le", "la", "et", "les", "des", "un"})]

    def _pred_lang(toks):
        counts = [sum(t in words for t in toks) for _l, words in STOPS]
        best = max(counts)
        return STOPS[counts.index(best)][0] if best > 0 else "und"

    kept_by_text: dict[str, int] = {}
    for did, text in zip(ids, texts):
        toks = text.split(" ")
        n = len(toks)
        n_stop = sum(t in STOPS[0][1] for t in toks)
        if not (_pred_lang(toks) == "en" and n >= 10
                and n_stop * 50 >= n and len(set(toks)) * 10 >= 3 * n):
            continue
        if text not in kept_by_text or did < kept_by_text[text]:
            kept_by_text[text] = did
    tbuckets: dict[int, list[tuple[int, int]]] = {}
    for text, did in kept_by_text.items():
        b = ((did * 2654435761) & 0x7FFFFFFFFFFFFFFF) % 64
        tbuckets.setdefault(b, []).append((did, len(text.split(" "))))
    trow = {"bucket": [], "pack_id": [], "doc_id": [], "n_tokens": []}
    for b in sorted(tbuckets):
        cur_id, cur_tot = 0, 0
        for did, n in sorted(tbuckets[b]):
            if cur_tot and cur_tot + n > 256:
                cur_id += 1
                cur_tot = 0
            cur_tot += n
            trow["bucket"].append(b)
            trow["pack_id"].append(cur_id)
            trow["doc_id"].append(did)
            trow["n_tokens"].append(n)
    g["training_pipeline"] = pa.Table.from_pydict(
        trow, schema=pa.schema([("bucket", pa.int64()),
                                ("pack_id", pa.int64()),
                                ("doc_id", pa.int64()),
                                ("n_tokens", pa.int64())]))

    # -- embeddings ops
    kids, klabels = golden_knn_ivf(sf_dir)
    g["knn_ivf"] = pa.table(
        {"vec_id": pa.array(kids.tolist(), pa.int64()),
         "label": pa.array(klabels.tolist(), pa.int32())})

    pqids, pqlabels = golden_knn_pq(sf_dir)
    g["knn_pq"] = pa.table(
        {"vec_id": pa.array(pqids.tolist(), pa.int64()),
         "label": pa.array(pqlabels.tolist(), pa.int32())})

    lc = golden_lsh_cosine_pairs(sf_dir)
    g["lsh_cosine_pairs"] = pa.table(
        {"left_id": pa.array([p[0] for p in lc], pa.int64()),
         "right_id": pa.array([p[1] for p in lc], pa.int64())})

    ln = golden_lsh_nearest_neighbor(sf_dir)
    g["lsh_nearest_neighbor"] = pa.table(
        {"vec_id": pa.array([p[0] for p in ln], pa.int64()),
         "nn_id": pa.array([p[1] for p in ln], pa.int64())})

    dsub = golden_dedup_substrings(sf_dir)
    g["dedup_substrings"] = pa.table(
        {"doc_id": pa.array([r[0] for r in dsub], pa.string()),
         "text": pa.array([r[1] for r in dsub], pa.string()),
         "n_tokens": pa.array([r[2] for r in dsub], pa.int64()),
         "n_removed": pa.array([r[3] for r in dsub], pa.int64())})

    dr = golden_dsir(sf_dir)
    g["dsir_scores"] = pa.table(
        {"doc_id": pa.array([p[0] for p in dr], pa.int64()),
         "dsir_score_fp": pa.array([p[1] for p in dr], pa.int64())})

    bm, be = golden_bpe(sf_dir)
    g["bpe_merges"] = pa.table(
        {"rank": pa.array([r["rank"] for r in bm], pa.int64()),
         "left": pa.array([r["left"] for r in bm], pa.int64()),
         "right": pa.array([r["right"] for r in bm], pa.int64()),
         "n": pa.array([r["n"] for r in bm], pa.int64())})
    g["bpe_token_count"] = pa.table(
        {"doc_id": pa.array([p[0] for p in be], pa.int64()),
         "n_tokens": pa.array([p[1] for p in be], pa.int64())})

    sp, sk = golden_semdedup(sf_dir)
    g["semdedup_pairs"] = pa.table(
        {"left_id": pa.array([p[0] for p in sp], pa.int64()),
         "right_id": pa.array([p[1] for p in sp], pa.int64())})
    g["semdedup_apply"] = pa.table(
        {"vec_id": pa.array([p[0] for p in sk], pa.int64()),
         "label": pa.array([p[1] for p in sk], pa.int64())})

    he = golden_hash_embed_nn(sf_dir)
    g["hash_embed_nn"] = pa.table(
        {"vec_id": pa.array([p[0] for p in he], pa.int64()),
         "nn_id": pa.array([p[1] for p in he], pa.int64())})

    vids, vlabels, _vmat = emb_matrix(sf_dir)
    uf_e = UnionFind()
    for a, b in lc:
        uf_e.union(a, b)
    dropped_e = {x for x in uf_e.p if uf_e.find(x) != x}
    keep_mask = [int(v) not in dropped_e for v in vids]
    g["dedup_apply_emb"] = pa.table(
        {"vec_id": pa.array([int(v) for v, k in zip(vids, keep_mask)
                             if k], pa.int64()),
         "label": pa.array([int(l) for l, k in zip(vlabels, keep_mask)
                            if k], pa.int32())})

    # nearest-centroid confusion matrix: dense single-process reimpl —
    # same fixed-point centroid rule (round-half-away × 1e9, int sums,
    # divide once), unit-normalized rows, 1e-12-quantized argmax with
    # first-max (= smallest label, labels sorted asc) tie-break
    _cids, _clabs, _cmat = emb_matrix(sf_dir)
    _cl = _clabs.astype(np.int64)
    _x = _cmat * 1e9
    _fp = np.where(_x >= 0, np.floor(_x + 0.5),
                   np.ceil(_x - 0.5)).astype(np.int64)
    _ulabs = np.unique(_cl)
    _C = np.zeros((len(_ulabs), _cmat.shape[1]), dtype=np.float64)
    for _i, _l in enumerate(_ulabs):
        _m = _cl == _l
        _C[_i] = _fp[_m].sum(axis=0) / (int(_m.sum()) * 10**9)
    _C = _C / np.linalg.norm(_C, axis=1, keepdims=True)
    _V = _cmat / np.linalg.norm(_cmat, axis=1, keepdims=True)
    _sims = np.floor(_V @ _C.T / 1e-12 + 0.5)
    _pred = _ulabs[np.argmax(_sims, axis=1)]
    _pairs = Counter(zip(_cl.tolist(), _pred.tolist()))
    _keys = sorted(_pairs)
    g["centroid_classify"] = pa.table(
        {"label": pa.array([k[0] for k in _keys], pa.int64()),
         "pred_label": pa.array([k[1] for k in _keys], pa.int64()),
         "n": pa.array([_pairs[k] for k in _keys], pa.int64())})

    # -- extraction surface (oracle over the deterministic synth corpus)
    res42 = oracle_results(n_fam, seed=42)
    g["extract_spans"] = pa.Table.from_pydict(
        flat_span_rows(res42), schema=FLAT_SCHEMA)

    from collections import Counter
    c = Counter(r.status for _d, r in res42)
    g["extract_status"] = pa.table(
        {"status": pa.array(sorted(c), pa.string()),
         "n": pa.array([c[s] for s in sorted(c)], pa.int64())})

    mf = {k: [] for k in ("doc_id", "media_ref", "kind", "width",
                          "height", "n_frames")}
    for _d, r in res42:
        for s in r.spans:
            if s["kind"] != "media":
                continue
            w, h, nf = fake_decode(s["media_ref"])
            mf["doc_id"].append(r.doc_id)
            mf["media_ref"].append(s["media_ref"])
            mf["kind"].append(s["kind"])
            mf["width"].append(w)
            mf["height"].append(h)
            mf["n_frames"].append(nf)
    g["media_features"] = pa.Table.from_pydict(mf, schema=pa.schema([
        ("doc_id", pa.string()), ("media_ref", pa.string()),
        ("kind", pa.string()), ("width", pa.int32()),
        ("height", pa.int32()), ("n_frames", pa.int32())]))

    # REAL-decode path: the inline-PNG fixture rows are shared INPUT
    # (webtext.functions.media.inline_png_rows, noted exception), but
    # the decode here is independent of the engine's chunk-walking
    # PngInlineDecoder — fixed-offset struct.unpack of the IHDR after
    # asserting the chunk layout, n_frames pinned to 1 (plain PNGs)
    import base64
    import struct

    from webtext.functions.media import inline_png_rows

    n_png = 48 if sf_dir.rstrip("/").endswith("0.1") else 24
    mfr = {k: [] for k in ("doc_id", "media_ref", "kind", "width",
                           "height", "n_frames")}
    for row in inline_png_rows(n_png):
        for s in row["spans"]:
            if s["kind"] != "media":
                continue
            raw = base64.b64decode(s["media_ref"][len("inline:"):])
            assert raw[:8] == b"\x89PNG\r\n\x1a\n" \
                and raw[12:16] == b"IHDR"
            w, h = struct.unpack(">II", raw[16:24])
            mfr["doc_id"].append(row["doc_id"])
            mfr["media_ref"].append(s["media_ref"])
            mfr["kind"].append("media")
            mfr["width"].append(int(w))
            mfr["height"].append(int(h))
            mfr["n_frames"].append(1)
    g["media_features_real"] = pa.Table.from_pydict(
        mfr, schema=pa.schema([
            ("doc_id", pa.string()), ("media_ref", pa.string()),
            ("kind", pa.string()), ("width", pa.int32()),
            ("height", pa.int32()), ("n_frames", pa.int32())]))

    # resize planning (fit-within-224 box) + uniform frame sampling
    rz = {k: [] for k in ("doc_id", "media_ref", "orig_w", "orig_h",
                          "out_w", "out_h")}
    fr = {k: [] for k in ("doc_id", "media_ref", "frame_idx")}
    for _d, r in res42:
        for s in r.spans:
            if s["kind"] != "media":
                continue
            w, h, n = fake_decode(s["media_ref"])
            if w >= h:
                ow, oh = 224, max(1, (h * 224) // w)
            else:
                ow, oh = max(1, (w * 224) // h), 224
            rz["doc_id"].append(r.doc_id)
            rz["media_ref"].append(s["media_ref"])
            rz["orig_w"].append(w)
            rz["orig_h"].append(h)
            rz["out_w"].append(ow)
            rz["out_h"].append(oh)
            k = min(4, n)
            for i in range(k):
                fr["doc_id"].append(r.doc_id)
                fr["media_ref"].append(s["media_ref"])
                fr["frame_idx"].append((i * n) // k)
    g["media_resize"] = pa.Table.from_pydict(rz, schema=pa.schema([
        ("doc_id", pa.string()), ("media_ref", pa.string()),
        ("orig_w", pa.int32()), ("orig_h", pa.int32()),
        ("out_w", pa.int32()), ("out_h", pa.int32())]))
    g["frame_sample"] = pa.Table.from_pydict(fr, schema=pa.schema([
        ("doc_id", pa.string()), ("media_ref", pa.string()),
        ("frame_idx", pa.int32())]))

    # perceptual-hash near-dup pairs: scalar re-derivation of the
    # fake-thumbnail + average-hash spec (family crc -> splitmix pixels,
    # 3 high-bit flips, bit i = pixel > mean), then BRUTE-FORCE all
    # pairs at hamming <= 6 — the banded Ray path must equal this
    # exactly (8x8-bit bands are pigeonhole-complete for d <= 7)
    def _g_phash(ref: str) -> int:
        MASK = (1 << 64) - 1
        fh = zlib.crc32(ref.rsplit("/", 2)[0].encode("utf-8"))
        pix = []
        for i in range(64):
            z = (fh + i + 0x9E3779B97F4A7C15) & MASK
            z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & MASK
            z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & MASK
            z = z ^ (z >> 31)
            pix.append(int(z & 0xFF))
        vh = zlib.crc32(ref.encode("utf-8"))
        for k in range(3):
            pix[(vh >> (6 * k)) & 63] ^= 0x80
        mean = sum(pix) / 64.0
        p = 0
        for i, v in enumerate(pix):
            if v > mean:
                p |= 1 << i
        return p - (1 << 64) if p >= (1 << 63) else p

    phashes = {}
    for _d, r in res42:
        for s in r.spans:
            if s["kind"] == "media":
                phashes[s["media_ref"]] = _g_phash(s["media_ref"])
    prow = {"left_ref": [], "right_ref": [], "hamming": []}
    refs_sorted = sorted(phashes)
    for i, a in enumerate(refs_sorted):
        for b in refs_sorted[i + 1:]:
            d = bin((phashes[a] ^ phashes[b]) & ((1 << 64) - 1)) \
                .count("1")
            if d <= 6:
                prow["left_ref"].append(a)
                prow["right_ref"].append(b)
                prow["hamming"].append(d)
    g["media_phash_pairs"] = pa.Table.from_pydict(
        prow, schema=pa.schema([("left_ref", pa.string()),
                                ("right_ref", pa.string()),
                                ("hamming", pa.int64())]))

    # media dedup APPLY: independent union-find over the brute-force
    # pair set, keyed by the same md5-64 surrogate ids the distributed
    # CC uses; survivor = min-surrogate member of each cluster
    import hashlib as _hl

    def _sid(ref):
        return int.from_bytes(_hl.md5(ref.encode()).digest()[:8],
                              "big") & 0x7FFFFFFFFFFFFFFF

    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    sid_of = {r: _sid(r) for r in phashes}
    for a, b in zip(prow["left_ref"], prow["right_ref"]):
        ra, rb = find(sid_of[a]), find(sid_of[b])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    surv = sorted(r for r, s in sid_of.items() if find(s) == s)
    g["media_dedup_apply"] = pa.table(
        {"media_ref": pa.array(surv, pa.string())})

    # links: DOM mining via the (pytest-covered) batch miner applied
    # directly — dedup + per-domain top-k replicated in plain python
    from webtext.oracle.rules import domain_strip_www
    from webtext.pipelines.links import _mine_batch
    from webtext.schema import INPUT_SCHEMA
    from webtext.synth import generate_docs

    docs_tab = pa.Table.from_pylist(generate_docs(n_fam, seed=42),
                                    schema=INPUT_SCHEMA)
    mined = _mine_batch(docs_tab).to_pylist()
    first_by_url: dict[str, dict] = {}
    for row in mined:
        cur = first_by_url.get(row["url"])
        if cur is None or (row["doc_id"], row["rank"]) < (cur["doc_id"],
                                                          cur["rank"]):
            first_by_url[row["url"]] = row
    by_dom: dict[str, list[dict]] = {}
    for row in first_by_url.values():
        by_dom.setdefault(domain_strip_www(row["url"]), []).append(row)
    link_rows = []
    for dom in by_dom:
        rows = sorted(by_dom[dom], key=lambda r: (r["doc_id"], r["rank"]))
        for row in rows[:3]:
            link_rows.append({**row, "target_domain": dom})
    g["extract_links"] = pa.Table.from_pylist(link_rows, schema=pa.schema([
        ("doc_id", pa.string()), ("rank", pa.int32()), ("url", pa.string()),
        ("anchor", pa.string()), ("target_domain", pa.string())]))

    # web-graph family: HTMLParser anchor walk over the same corpus
    # (differential vs the engine's regex scan), then plain-python /
    # dense-numpy derivations
    from webtext.pipelines.webgraph import linkweb_fixture_docs

    wg_docs = generate_docs(n_fam, seed=42) + linkweb_fixture_docs()
    ol = golden_outlinks(wg_docs)
    g["outlinks"] = ol
    g["anchor_stats"] = golden_anchor_stats(ol)
    g["host_cocitation"] = golden_host_cocitation(ol)
    g["host_coupling"] = golden_host_coupling(ol)
    g["host_pagerank"] = golden_host_pagerank(ol)
    g["doc_authority"] = golden_doc_authority(wg_docs,
                                              g["host_pagerank"])
    g["authority_sample"] = golden_authority_sample(g["doc_authority"])

    # rejects / integrate / error-scan over committed-run semantics
    rej = {k: [] for k in ("doc_id", "status", "messages_joined")}
    for _d, r in res42:
        if r.status in ("failed", "error_pattern"):
            rej["doc_id"].append(r.doc_id)
            rej["status"].append(r.status)
            rej["messages_joined"].append(";".join(r.failures))
    g["read_rejects"] = pa.Table.from_pydict(rej, schema=pa.schema([
        ("doc_id", pa.string()), ("status", pa.string()),
        ("messages_joined", pa.string())]))

    # extraction → corpus dedup composition: kept docs' joined text
    # spans, 63-bit md5 surrogate ids, minhash pairs, union-find
    import hashlib as _hl

    kept_docs = []
    for _d, r in res42:
        if r.status not in ("ok", "timeout"):
            continue
        text = "\n".join(s["text"] for s in r.spans
                         if s["kind"] == "text")
        iid = int.from_bytes(
            _hl.md5(r.doc_id.encode("utf-8")).digest()[:8], "big") \
            & 0x7FFFFFFFFFFFFFFF
        kept_docs.append((iid, r.doc_id, text))
    dmh = golden_minhash_pairs([i for i, _s, _t in kept_docs],
                               [t for _i, _s, t in kept_docs])
    uf_d = UnionFind()
    for a, b in dmh:
        uf_d.union(a, b)
    dropped_d = {x for x in uf_d.p if uf_d.find(x) != x}
    g["dedup_extracted"] = pa.table(
        {"doc_id": pa.array(sorted(
            s for i, s, _t in kept_docs if i not in dropped_d),
            pa.string())})

    tids = sorted(r.doc_id for _d, r in res42 if r.status == "timeout")
    g["timeout_ids"] = pa.table(
        {"doc_id": pa.array(tids, pa.string()),
         "status": pa.array(["timeout"] * len(tids), pa.string())})

    res43 = oracle_results(n_fam, seed=43)
    kept = ("ok", "timeout")
    both = {k: v + flat_span_rows(res43, kept)[k]
            for k, v in flat_span_rows(res42, kept).items()}
    g["integrate_outputs"] = pa.Table.from_pydict(both, schema=FLAT_SCHEMA)

    # engine-specific SERP miners over the literal fixture corpus.
    # NOTE (circularity, by design): this golden drives the same miner
    # functions the Ray stage wraps, so it pins the Ray plumbing
    # (flat_map, per-doc dedup, ranks, union) and regressions — NOT the
    # miner semantics themselves.  Miner semantics are pinned
    # independently by the hand-written branch assertions in
    # tests/test_links.py (per-selector fixtures with expected URL
    # lists).  The algorithmic goldens above (minhash/simhash/winnow/
    # LSH/IVF/CC) remain genuine independent reimplementations.
    from webtext.dom import parse_html
    from webtext.pipelines.links import (
        _ENGINE_MINERS, serp_fixture_docs)

    srows = {"doc_id": [], "rank": [], "url": [], "engine": []}
    fixture = serp_fixture_docs()
    for engine in ("google", "yahoo", "yahoo_related",
                   "google_related"):
        miner = _ENGINE_MINERS[engine]
        for d in fixture:
            seen: list[str] = []
            for span in sorted(d["spans"], key=lambda s: s["offset"]):
                if span["kind"] != "html":
                    continue
                for url in miner(parse_html(span["text"])):
                    if url not in seen:
                        seen.append(url)
            for rank, url in enumerate(seen):
                srows["doc_id"].append(d["doc_id"])
                srows["rank"].append(rank)
                srows["url"].append(url)
                srows["engine"].append(engine)
    g["search_engine_links"] = pa.Table.from_pydict(
        srows, schema=pa.schema([
            ("doc_id", pa.string()), ("rank", pa.int32()),
            ("url", pa.string()), ("engine", pa.string())]))

    from webtext.oracle.rules import BROWSER_ERROR_PATTERNS
    scan = {"doc_id": [], "pattern": []}
    for _d, r in res42:
        if r.status not in kept:
            continue
        joined = "\n".join(s["text"] for s in r.spans)
        for pat in BROWSER_ERROR_PATTERNS:
            if pat in joined:
                scan["doc_id"].append(r.doc_id)
                scan["pattern"].append(pat)
    g["scan_output_for_errors"] = pa.Table.from_pydict(
        scan, schema=pa.schema([("doc_id", pa.string()),
                                ("pattern", pa.string())]))

    g["pagerank"] = golden_pagerank(sf_dir)
    g["pagerank_weighted"] = golden_pagerank_weighted(sf_dir)
    g["part_coreness"] = golden_part_coreness(sf_dir)
    g["part_communities"] = golden_part_communities(sf_dir)

    g["hll_users"] = golden_hll_users(sf_dir)
    g["hll_users_by_type"] = golden_hll_users_by_type(sf_dir)

    g["nb_classify"] = golden_nb_classify(sf_dir)
    g["hits_scores"] = golden_hits(sf_dir)
    g["dd_quantiles"] = golden_dd_quantiles(sf_dir)
    g["kcenter_select"] = golden_kcenter(sf_dir)
    g["coverage_select"] = golden_coverage_select(sf_dir)
    g["hard_negatives"] = golden_hard_negatives(sf_dir)
    g["cluster_census"] = golden_cluster_census(sf_dir)
    g["dim_truncation_audit"] = golden_dim_truncation_audit(sf_dir)
    g["weighted_k_sample"] = golden_weighted_k_sample(sf_dir)
    g["label_centroid_drift"] = golden_label_centroid_drift(sf_dir)
    g["poisson_bootstrap"] = golden_poisson_bootstrap(sf_dir)
    g["cms_join_estimate"] = golden_cms_join_estimate(sf_dir)
    g["lineage_report"] = golden_lineage(sf_dir)
    g["hll_users_windowed"] = golden_hll_users_windowed(sf_dir)
    g["bloom_dedup"] = golden_bloom_dedup(sf_dir)
    g["hll_error_audit"] = golden_hll_error_audit(sf_dir)
    g["cms_error_audit"] = golden_cms_error_audit(sf_dir)
    g["bloom_fp_audit"] = golden_bloom_fp_audit(sf_dir)
    g["quantile_sketch_audit"] = golden_quantile_sketch_audit(sf_dir)
    g["pca_top_component"] = golden_pca_top_component(sf_dir)
    g["kmv_distinct"] = golden_kmv_distinct(sf_dir)
    g["effective_rank"] = golden_effective_rank(sf_dir)
    g["whiten_embeddings"] = golden_whiten_embeddings(sf_dir)
    g["ivf_recall_audit"] = golden_ivf_recall_audit(sf_dir)
    g["pq_recall_audit"] = golden_pq_recall_audit(sf_dir)
    g["ndcg_audit"] = golden_ndcg_audit(sf_dir)
    g["minhash_recall_audit"] = golden_minhash_recall_audit(sf_dir)

    return g


def main():
    for sf_dir in SF_DIRS:
        tag = os.path.basename(sf_dir.rstrip("/"))
        out_dir = os.path.join(OUT_BASE, tag)
        os.makedirs(out_dir, exist_ok=True)
        goldens = build_goldens(sf_dir)
        for name, table in goldens.items():
            pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))
            print(f"{tag}/{name}: {table.num_rows} rows")


if __name__ == "__main__":
    main()
