"""Link mining over HTML spans — the search-side operators' relational
skeleton (SURVEY §2.3) as real dataset ops.

The reference mines result links out of live search DOMs
(google_url_serch.py / yahoo_url_search.py); the *transform* shape that
survives materialization is: flat_map (doc → anchors) → exclude
predicates → ordered first-wins dedup → per-group top-k.  Applied here
to the anchors of any interleaved corpus:

  U1/U6  extract_links        flat_map over html spans (anchor mining)
  U2/U7  EXCLUDE_URL_RES      regex blocklist (google_url_serch.py:20-55)
  U3     NAV_TEXT_PATTERNS    nav-text predicate (google_url_serch.py:57-77)
  U9     dedup_links          first-occurrence-wins by URL, order-stable
  U5/U8  top_links_per_domain per-target-domain limit(k)
"""

from __future__ import annotations

import re

import pyarrow as pa

from ..dom import parse_html
from ..oracle.rules import domain_strip_www

# U2 exclude regex blocklist (google_url_serch.py:22-48)
EXCLUDE_URL_RES: tuple[re.Pattern, ...] = tuple(re.compile(p) for p in (
    r"google\.com/search",
    r"support\.google\.com",
    r"accounts\.google\.com",
    r"ads\.google\.com",
    r"translate\.google\.com",
    r"maps\.google\.com",
    r"google\.com/maps",
    r"google\.com/travel",
    r"google\.co\.jp/intl",
    r"google\.com/advanced_search",
    r"policies\.google\.com",
    r"privacy",
    r"terms",
    r"google\.com/preferences",
    r"google\.com/webhp",
    r"chrome\.google\.com",
    r".*\.(css|js|xml|ico)$",
))

# U3 nav-text phrase list (google_url_serch.py:59-67) + ≤2-char gate
NAV_TEXT_PATTERNS: tuple[str, ...] = (
    "設定", "検索設定", "ログイン", "画像", "動画", "地図", "ニュース",
    "一覧", "メニュー", "トップ", "今すぐ", "使い方", "条件指定",
    "アクティビティ", "日本語のみ", "リアルタイム", "ウェブ", "アカウント",
    "ヘルプ", "プライバシー", "規約", "メールアドレス", "ホーム",
    "ショッピング", "マップ", "カレンダー", "ブラウザ", "アプリ",
    "最近の検索", "メール", "ファイナンス", "ブックマーク", "設定する",
)


def is_excluded_url(url: str) -> bool:
    return any(p.search(url) for p in EXCLUDE_URL_RES)


def is_navigation_text(text: str) -> bool:
    if any(p in text for p in NAV_TEXT_PATTERNS):
        return True
    return len(text) <= 2


def _mine_batch(batch: pa.Table) -> pa.Table:
    """flat_map: one row per surviving anchor, rank = document order."""
    out = {"doc_id": [], "rank": [], "url": [], "anchor": []}
    for doc_id, spans in zip(batch.column("doc_id").to_pylist(),
                             batch.column("spans").to_pylist()):
        rank = 0
        for span in sorted(spans or [], key=lambda s: s["offset"]):
            if span["kind"] != "html":
                continue
            doc = parse_html(span["text"])
            for a in doc.select("a[href]"):
                href = a.get("href", "")
                text = a.get_text(strip=True)
                if not href or is_excluded_url(href) \
                        or is_navigation_text(text):
                    continue
                out["doc_id"].append(doc_id)
                out["rank"].append(rank)
                out["url"].append(href)
                out["anchor"].append(text)
                rank += 1
    return pa.Table.from_pydict(out, schema=pa.schema([
        ("doc_id", pa.string()), ("rank", pa.int32()),
        ("url", pa.string()), ("anchor", pa.string())]))


def extract_links(ds):
    return ds.map_batches(_mine_batch, batch_format="pyarrow",
                          zero_copy_batch=True)


def dedup_links(links_ds):
    """U9: first occurrence wins, order-stable — the reference's
    ``dict.fromkeys`` over the concatenated link list becomes
    groupby(url) keeping the minimal (doc_id, rank)."""

    def first(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        idx = pc.sort_indices(group, sort_keys=[("doc_id", "ascending"),
                                                ("rank", "ascending")])
        return group.take(idx[:1])

    return links_ds.groupby("url").map_groups(first, batch_format="pyarrow")


def top_links_per_domain(links_ds, k: int = 3):
    """U5/U8: per-target-domain limit(k), ordered by (doc_id, rank)."""

    def add_domain(batch: pa.Table) -> pa.Table:
        domains = [domain_strip_www(u)
                   for u in batch.column("url").to_pylist()]
        return batch.append_column("target_domain",
                                   pa.array(domains, pa.string()))

    def head(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        idx = pc.sort_indices(group, sort_keys=[("doc_id", "ascending"),
                                                ("rank", "ascending")])
        return group.take(idx[:k])

    keyed = links_ds.map_batches(add_domain, batch_format="pyarrow",
                                 zero_copy_batch=True)
    return keyed.groupby("target_domain").map_groups(
        head, batch_format="pyarrow")
