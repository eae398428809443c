"""Keyword-file source/sink (S2/S3): sniffing, pending-set contract,
distributed read."""

from __future__ import annotations

from webtext.sources.keywords import (generate_search_urls,
                                      pending_keyword_paths,
                                      read_keyword_files,
                                      sniff_search_urls,
                                      write_keyword_files)


def test_sniff_line_semantics():
    # order-independent, blank/junk lines skipped, first match wins
    text = ("\nnot a url\n"
            "https://search.yahoo.co.jp/search?p=a\n"
            "https://www.google.com/search?q=a\n"
            "https://www.google.com/search?q=SECOND\n")
    g, y = sniff_search_urls(text)
    assert g == "https://www.google.com/search?q=a"
    assert y == "https://search.yahoo.co.jp/search?p=a"
    # a google.com/search line without the scheme prefix is ignored
    assert sniff_search_urls("google.com/search?q=x") == (None, None)
    # engine variants
    g, y = sniff_search_urls(
        "http://google.co.jp/search?q=j\n"
        "http://search.yahoo.com/search?p=e\n")
    assert g and y


def test_roundtrip_and_pending_set(tmp_path):
    delivery = str(tmp_path / "delivery")
    completed = str(tmp_path / "completed")
    kws = ["alpha one", 'we/ird:"kw', "beta two"]
    write_keyword_files(kws, delivery)
    write_keyword_files(["alpha one"], completed)
    pending = pending_keyword_paths(delivery, completed)
    assert len(pending) == 2
    assert all("alpha" not in p for p in pending)
    # sanitizer replaced the forbidden characters in the filename
    assert any("we_ird__kw.txt" in p for p in pending)


def test_read_keyword_files_dataset(ray_session, tmp_path):
    delivery = str(tmp_path / "d")
    write_keyword_files(["k one", "k two"], delivery)
    # a file with no sniffable URL must be dropped, not crash
    (tmp_path / "d" / "junk.txt").write_text("no urls here\n")
    rows = {r["keyword"]: (r["google_url"], r["yahoo_url"])
            for r in read_keyword_files(delivery).take_all()}
    assert set(rows) == {"k one", "k two"}
    assert rows["k one"] == generate_search_urls("k one")


def test_read_keyword_files_empty(ray_session, tmp_path):
    empty = str(tmp_path / "none")
    import os

    os.makedirs(empty)
    ds = read_keyword_files(empty)
    assert ds.count() == 0
    assert set(ds.schema().names) == {"keyword", "google_url",
                                      "yahoo_url"}


def test_run_query_cli_writes_parquet(ray_session, tmp_path):
    """run_query job surface: any registered query runs from any cwd
    and lands as parquet (uses the in-session Ray)."""
    import pyarrow.parquet as pq

    from webtext.jobs.run_query import main

    out = str(tmp_path / "res")
    rc = main(["group_counts", "--sf-dir", "/root/testdata/sf0.001",
               "--output", out])
    assert rc == 0
    import os

    n = sum(pq.ParquetFile(os.path.join(out, f)).metadata.num_rows
            for f in os.listdir(out) if f.endswith(".parquet"))
    assert n == 5                  # five langs in the synthetic corpus

    assert main(["no_such_query"]) == 2

    # re-running into the same (now non-empty) directory must refuse —
    # the walked row count would silently mix in the stale files
    import pytest

    with pytest.raises(SystemExit, match="already contains parquet"):
        main(["group_counts", "--sf-dir", "/root/testdata/sf0.001",
              "--output", out])


def test_run_query_cli_partitioned_output(ray_session, tmp_path):
    """--partition-by writes hive layout (one directory per key) and
    the partitioned result reads back equal to the flat one."""
    import os

    import ray.data

    from webtext.jobs.run_query import main

    out = str(tmp_path / "by_lang")
    rc = main(["group_counts", "--sf-dir", "/root/testdata/sf0.001",
               "--output", out, "--partition-by", "lang"])
    assert rc == 0
    parts = sorted(d for d in os.listdir(out) if d.startswith("lang="))
    assert len(parts) == 5
    back = ray.data.read_parquet(out).to_pandas()
    assert sorted(back["n"].astype(int).tolist()) == sorted(
        r["n"] for r in
        __import__("__ray_entry__").queries()["group_counts"](
            "/root/testdata/sf0.001").to_pandas().to_dict("records"))
