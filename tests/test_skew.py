"""Skew-handling stage tests: hot-domain detection + salted repartition."""

import pyarrow as pa
import pytest

from webtext.stages.skew import (
    add_domain_column,
    add_salted_key,
    detect_hot_domains,
    domain_counts,
    rebalance_by_domain,
)


def _docs_table(n_hot=60, n_cold=40):
    rows = []
    for i in range(n_hot):
        rows.append({"doc_id": f"https://hot.example.com/a/{i}",
                     "spans": []})
    for i in range(n_cold):
        rows.append({"doc_id": f"https://cold{i}.example.net/b/{i}",
                     "spans": []})
    return rows


def test_add_domain_column_vectorized():
    t = pa.table({"doc_id": ["https://www.a.com/x", "http://b.net/y",
                             "not-a-url"]})
    out = add_domain_column(t)
    # requests-path semantics: www kept (ref:519 quirk)
    assert out.column("domain").to_pylist() == ["www.a.com", "b.net", ""]


def test_domain_counts_partial_agg(ray_session):
    import ray.data

    ds = ray.data.from_items(_docs_table())
    counts = {r["domain"]: r["sum(n)"]
              for r in domain_counts(ds).take_all()}
    assert counts["hot.example.com"] == 60
    assert sum(counts.values()) == 100


def test_detect_hot_domains(ray_session):
    import ray.data

    ds = ray.data.from_items(_docs_table())
    hot = detect_hot_domains(ds, hot_fraction=0.3)
    assert hot == ["hot.example.com"]
    # every cold domain is under threshold
    assert detect_hot_domains(ds, hot_fraction=0.99) == []


def test_salted_key_splits_hot_only():
    t = pa.table({"doc_id": [f"https://hot.example.com/a/{i}"
                             for i in range(50)]
                  + ["https://cold.example.net/b/1"]})
    out = add_salted_key(t, frozenset(["hot.example.com"]), buckets=4)
    keys = out.column("skew_key").to_pylist()
    hot_keys = {k for k in keys if k.startswith("hot.example.com#")}
    assert 2 <= len(hot_keys) <= 4           # salt actually spreads
    assert "cold.example.net" in keys        # cold key unsalted


def test_salt_deterministic():
    t = pa.table({"doc_id": ["https://hot.example.com/a/7"]})
    a = add_salted_key(t, frozenset(["hot.example.com"]), 8)
    b = add_salted_key(t, frozenset(["hot.example.com"]), 8)
    assert a.column("skew_key").to_pylist() == b.column("skew_key").to_pylist()


def test_rebalance_preserves_rows(ray_session):
    import ray.data

    ds = ray.data.from_items(_docs_table())
    out = rebalance_by_domain(ds, ["hot.example.com"], buckets=4)
    rows = out.take_all()
    assert len(rows) == 100
    assert {r["doc_id"] for r in rows} == {d["doc_id"]
                                           for d in _docs_table()}


def test_rebalance_scope_hot_preserves_rows(ray_session):
    import ray.data

    ds = ray.data.from_items(_docs_table())
    out = rebalance_by_domain(ds, ["hot.example.com"], buckets=4,
                              scope="hot")
    rows = out.take_all()
    assert len(rows) == 100
    assert {r["doc_id"] for r in rows} == {d["doc_id"]
                                           for d in _docs_table()}
    with pytest.raises(ValueError):
        rebalance_by_domain(ds, [], scope="bogus")


def test_rebalance_for_extraction_roundtrip(ray_session):
    import ray.data

    from webtext.stages.skew import rebalance_for_extraction

    ds = ray.data.from_items(_docs_table())
    out, hot = rebalance_for_extraction(ds, hot_fraction=0.3, buckets=4)
    assert hot == ["hot.example.com"]
    rows = out.take_all()
    assert len(rows) == 100
    assert all("domain" not in r and "skew_key" not in r for r in rows)
    # no hot domain above threshold → passthrough, helper cols dropped
    cold = ray.data.from_items(_docs_table(n_hot=1, n_cold=99))
    out2, hot2 = rebalance_for_extraction(cold, hot_fraction=0.5)
    assert hot2 == [] and out2.count() == 100
