"""Golden-output regression pin.

The oracle IS the correctness contract (span-sequence equality is
defined against it), so unintended semantic drift must be loud.  This
hash covers every family's extraction output (status, branch lineage,
and full span sequences) for a fixed off-test seed.

If a change is SUPPOSED to alter semantics: update the hash here and
say why in the commit message.  If it wasn't supposed to: the change
broke extraction semantics.
"""

import hashlib
import json

from webtext.oracle import extract_document
from webtext.synth import generate_docs

GOLDEN_SHA256 = "55368a4fa21af723a21f4bf10a6250c43e8f2514999ed910514ab24af71fb9b1"
GOLDEN_N_DOCS = 190   # 19 families × 10


def test_oracle_golden_hash_cross_process():
    """Determinism across interpreter processes (SURVEY §7 hard-part f):
    a fresh process with a different PYTHONHASHSEED must reproduce the
    same golden hash — no dict-order or hash-salt dependence anywhere in
    the chain."""
    import os
    import subprocess
    import sys

    code = (
        "import hashlib, json\n"
        "from webtext.synth import generate_docs\n"
        "from webtext.oracle import extract_document\n"
        "h = hashlib.sha256()\n"
        "for d in generate_docs(n_per_family=2, seed=123):\n"
        "    r = extract_document(d['doc_id'], d['spans'])\n"
        "    h.update(json.dumps([r.doc_id, r.status, r.methods,\n"
        "        [(s['kind'], s['text'], s['media_ref'])"
        " for s in r.spans]], ensure_ascii=False).encode())\n"
        "print(h.hexdigest())\n"
    )
    outs = set()
    for seed in ("0", "424242"):
        env = dict(os.environ, PYTHONHASHSEED=seed,
                   PYTHONPATH="/root/repo")
        proc = subprocess.run([sys.executable, "-c", code], env=env,
                              capture_output=True, text=True, check=True)
        outs.add(proc.stdout.strip())
    assert len(outs) == 1


def test_oracle_golden_hash():
    docs = generate_docs(n_per_family=10, seed=123)
    assert len(docs) == GOLDEN_N_DOCS
    h = hashlib.sha256()
    for d in docs:
        r = extract_document(d["doc_id"], d["spans"])
        h.update(json.dumps(
            [r.doc_id, r.status, r.methods,
             [(s["kind"], s["text"], s["media_ref"]) for s in r.spans]],
            ensure_ascii=False).encode())
    assert h.hexdigest() == GOLDEN_SHA256
