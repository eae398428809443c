"""Driver-contract tests for __ray_entry__."""

import sys

import pytest

sys.path.insert(0, "/root/repo")

import __ray_entry__ as entrymod  # noqa: E402


def test_entry_runs_and_has_rows(ray_session):
    ds = entrymod.entry()
    rows = ds.take_all()
    assert len(rows) > 0
    assert {"doc_id", "spans", "status"} <= set(rows[0])
    assert all(r["status"] in ("ok", "timeout") for r in rows)


def test_queries_and_oracles_consistent():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    # every oracle-free query is a documented non-SQL op
    rows_only = set(qs) - set(oracles)
    assert rows_only == {"extract_spans", "extract_status",
                         "media_features", "minhash_lsh_pairs", "simhash",
                         "knn_ivf", "extract_links", "winnow_fingerprint",
                         "lsh_cosine_pairs"}


@pytest.mark.parametrize("name", ["token_count", "group_counts",
                                  "exact_dedup", "knn_cosine"])
def test_query_smoke_sf0001(ray_session, name):
    out = entrymod.queries()[name]("/root/testdata/sf0.001")
    import pyarrow as pa

    if not isinstance(out, pa.Table):
        out = out.to_pandas()
        assert len(out) > 0
    else:
        assert out.num_rows > 0
