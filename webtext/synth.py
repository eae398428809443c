"""Deterministic fixture-corpus generator (FIXTURES.md families).

One function per behavior family; each maps 1:1 onto branches of the
extraction chain (cites into /root/reference/common_scripts/
web_text_extractor_ver1.5.py as ``ref:``).  Fully seeded — per-doc RNG is
``random.Random(f"{seed}:{family}:{i}")``, which hashes via SHA-512 and is
stable across processes and Python runs.  No wall-clock anywhere.

The generator is driver-side tooling (it replaces the reference's live
web as the source of materialized content); at bench scale it is invoked
inside Ray tasks by ``webtext.pipelines.bench_corpus``.
"""

from __future__ import annotations

import random

import pyarrow as pa

from .oracle import rules as _oracle_rules  # module scope: generators
from .schema import INPUT_SCHEMA           # run on workers via by-value
                                           # pickling; no lazy imports

WORDS = (
    "the fast key order sort table scan merge part window small hash join "
    "batch stream spark data query row column value vector group agg filter "
    "line customer big slow dup pipeline engine worker cluster block arrow "
    "shard spill actor stage lane tensor corpus token shingle bucket probe "
    "anchor ledger marble violet copper meadow harbor lantern orchard"
).split()

JA_SENTENCES = (
    "今日は天気がよくて散歩にはちょうどよい一日でした。",
    "新しい技術を学ぶことはいつでも楽しいものです。",
    "昨日の試合はとても白熱した展開になりました。",
    "この町の図書館は静かで落ち着いた雰囲気があります。",
    "電車の窓から見える景色が少しずつ変わっていきます。",
    "週末には家族と一緒に料理を作る予定です。",
)


def _rng(seed: int, family: str, i: int) -> random.Random:
    return random.Random(f"{seed}:{family}:{i}")


def _words(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(WORDS) for _ in range(n))


def _sentence(rng: random.Random) -> str:
    return _words(rng, rng.randint(8, 16)).capitalize() + "."


def _paragraph(rng: random.Random, min_chars: int = 120,
               max_chars: int = 260) -> str:
    target = rng.randint(min_chars, max_chars)
    out = _sentence(rng)
    while len(out) < target:
        out += " " + _sentence(rng)
    return out


def _ja_paragraph(rng: random.Random, n: int = 3) -> str:
    return "".join(rng.choice(JA_SENTENCES) for _ in range(n))


def _span(kind: str, text: str, media_ref: str, offset: int) -> dict:
    return {"kind": kind, "text": text, "media_ref": media_ref,
            "offset": offset}


def _html_doc(doc_id: str, html: str) -> dict:
    return {"doc_id": doc_id,
            "spans": [_span("html", html, "", 0)]}


def _text_doc(doc_id: str, text: str) -> dict:
    return {"doc_id": doc_id,
            "spans": [_span("text", text, "", 0)]}


_BOILER = """
<header><nav>home products about contact sitemap login register</nav></header>
<aside class="sidebar">trending now popular posts archive list widget</aside>
<div class="ad">sponsored message buy this product now limited offer</div>
<script>var tracker = loadAnalytics('abc123');</script>
<style>.x {{ color: red; }}</style>
<footer>copyright legal terms privacy imprint rss feed</footer>
"""


# ---------------------------------------------------------------------------
# families
# ---------------------------------------------------------------------------

def gen_generic_article(seed: int, i: int) -> dict:
    """Generic selector cascade + unwanted removal (ref:1244-1290)."""
    rng = _rng(seed, "generic-article", i)
    doc_id = f"https://example-news.com/generic-article/{i}"
    paras = [_paragraph(rng) for _ in range(rng.randint(3, 6))]
    inner = "\n".join(f"<p>{p}</p>" for p in paras)
    unwanted = '<div class="related">more stories you may like elsewhere</div>'
    variant = i % 5
    if variant == 0:
        content = f"<main>{inner}{unwanted}</main>"
    elif variant == 1:
        content = f"<article>{inner}{unwanted}</article>"
    elif variant == 2:
        content = f'<div class="content">{inner}{unwanted}</div>'
    elif variant == 3:
        content = f'<div id="content">{inner}{unwanted}</div>'
    else:
        content = f'<div itemprop="articleBody">{inner}{unwanted}</div>'
    html = (f"<html><head><title>story {i}</title></head><body>"
            f"{_BOILER}{content}</body></html>")
    return _html_doc(doc_id, html)


_RULE_DOMAINS = (
    ("news.yahoo.co.jp", "article_body"),
    ("www.nikkansports.com", "articleText"),
    ("ja.wikipedia.org", None),              # id selector #mw-content-text
    ("number.bunshun.jp", "p-article__body"),
    ("gendai.media", "article-body"),
    ("www.oricon.co.jp", "full-text"),
    ("www.chunichi.co.jp", "article-body"),
    ("www.sanspo.com", "article-body"),      # plus .article-header pair
)


def gen_domain_rule(seed: int, i: int) -> dict:
    """Per-domain selector rule table dispatch (ref:1251-1268).

    Decoy content sits in <main> to prove the domain branch outranks the
    generic cascade.  The requests-path domain keeps 'www.' (ref:519), so
    www-prefixed rule keys are exercised as-is.
    """
    rng = _rng(seed, "domain-rule", i)
    domain, cls = _RULE_DOMAINS[i % len(_RULE_DOMAINS)]
    doc_id = f"https://{domain}/domain-rule/{i}"
    body_paras = [_paragraph(rng) for _ in range(2)]
    decoy = f"<main><p>{_paragraph(rng)}</p></main>"
    if domain == "ja.wikipedia.org":
        content = ('<div id="mw-content-text">'
                   + "".join(f"<p>{p}</p>" for p in body_paras) + "</div>")
    elif domain == "news.yahoo.co.jp":
        # two matching elements joined with \n\n (ref:1268)
        content = "".join(
            f'<div class="article_body"><p>{p}</p></div>' for p in body_paras)
    elif domain == "www.sanspo.com":
        # comma-list selector '.article-header, .article-body' (ref:1259)
        content = (f'<div class="article-header"><h1>{_sentence(rng)}</h1></div>'
                   f'<div class="article-body"><p>{body_paras[0]}</p></div>')
    else:
        content = (f'<div class="{cls}">'
                   + "".join(f"<p>{p}</p>" for p in body_paras) + "</div>")
    html = (f"<html><head><title>{domain}</title></head><body>"
            f"{_BOILER}{decoy}{content}</body></html>")
    return _html_doc(doc_id, html)


def gen_heuristic_blocks(seed: int, i: int) -> dict:
    """Text-density heuristic: argmax with exclude lists and the ×1.5
    contentish-parent boost (ref:1295-1338).  No generic selector matches.
    """
    rng = _rng(seed, "heuristic-blocks", i)
    doc_id = f"https://no-selectors.net/heuristic-blocks/{i}"
    long_plain = _paragraph(rng, 300, 380)       # plain block, big
    boosted = _paragraph(rng, 240, 280)          # smaller, but boosted ×1.5
    decoy = _paragraph(rng, 420, 480)            # biggest, excluded class
    small = _words(rng, 10)
    if i % 2 == 0:
        # boost flips the argmax: 240×1.5 > 380
        blocks = (f'<div class="zonex">{long_plain}</div>'
                  f'<div class="post-wrap"><div class="inner">{boosted}</div></div>'
                  f'<div class="sidebar">{decoy}</div>')
    else:
        blocks = (f'<div class="zonex">{long_plain}</div>'
                  f'<div class="ranking">{decoy}</div>'
                  f'<div class="zoney">{small}</div>')
    html = f"<html><head><title>t{i}</title></head><body>{blocks}</body></html>"
    return _html_doc(doc_id, html)


def gen_body_fallback(seed: int, i: int) -> dict:
    """Whole-body fallback (>50 chars, ref:1340-1356) and the <100-char
    dynamic-render retry (ref:542-566)."""
    rng = _rng(seed, "body-fallback", i)
    doc_id = f"https://sparse.org/body-fallback/{i}"
    if i % 2 == 0:
        bits = [_words(rng, 6) for _ in range(8)]     # total > 100
    else:
        bits = [_words(rng, 4) for _ in range(3)]     # 50 < total < 100
    divs = "".join(f'<div class="bit">{b}</div>' for b in bits)
    html = f"<html><head><title>sparse {i}</title></head><body>{divs}</body></html>"
    return _html_doc(doc_id, html)


def gen_title_fallback(seed: int, i: int) -> dict:
    """Title-only fallback (ref:1358-1361)."""
    rng = _rng(seed, "title-fallback", i)
    doc_id = f"https://sparse.org/title-fallback/{i}"
    html = (f"<html><head><title>{_sentence(rng)}</title></head>"
            f"<body><div>{_words(rng, 3)}</div></body></html>")
    return _html_doc(doc_id, html)


def gen_chiebukuro(seed: int, i: int) -> dict:
    """Yahoo Chiebukuro handler (ref:682-909)."""
    rng = _rng(seed, "special-chiebukuro", i)
    doc_id = f"https://detail.chiebukuro.yahoo.co.jp/qa/{i}"
    q = _ja_paragraph(rng, 2)
    a1, a2 = _ja_paragraph(rng, 3), _ja_paragraph(rng, 2)
    variant = i % 3
    if variant == 0:
        html = f"""<html><body><div id="leftColumn">
<h1 class="Title__title">{q}</h1>
<div class="ClapLv1__content">{_ja_paragraph(rng, 2)}</div>
<div class="ClapLv2__item">{a1}</div>
<div class="ClapLv2__item">{a2}</div>
<div class="RelatedContentBox"><h3>あわせて知りたい</h3>{_ja_paragraph(rng, 1)}</div>
<div class="AdBlock">広告テキストです</div>
<div class="side-bar-box">サイドバー</div>
<div class="PaginationBar">ページ送り</div>
</div><div id="rightColumn">{_ja_paragraph(rng, 1)}</div></body></html>"""
    elif variant == 1:
        html = f"""<html><body>
<h1 class="Title__title">{q}</h1>
<div class="ClapLv1__content">{_ja_paragraph(rng, 2)}</div>
<div class="ClapLv2__item">{a1}</div>
<div class="ClapLv2__item">{a2}</div>
</body></html>"""
    else:
        # no recognized structure → longest-3-blocks fallback (ref:859-883)
        html = f"""<html><body>
<div class="qa-free"><h2>{q}</h2>{_ja_paragraph(rng, 3)}</div>
<div class="qa-free2">{a1}</div>
<div class="qa-free3">{a2}</div>
</body></html>"""
    return _html_doc(doc_id, html)


def gen_twitter(seed: int, i: int) -> dict:
    """X/Twitter handler: <article> nodes joined by blank lines
    (ref:603-635); variant with no articles falls back to the generic
    cascade."""
    rng = _rng(seed, "special-twitter", i)
    host = "x.com" if i % 2 == 0 else "twitter.com"
    doc_id = f"https://{host}/special-twitter/{i}"
    if i % 3 == 2:
        html = (f"<html><body><main><p>{_paragraph(rng)}</p></main>"
                f"</body></html>")
    else:
        tweets = "".join(
            f"<article><div>{_sentence(rng)}</div>"
            f"<span>{_words(rng, 5)}</span></article>"
            for _ in range(rng.randint(2, 4)))
        html = f"<html><body>{tweets}</body></html>"
    return _html_doc(doc_id, html)


def gen_instagram(seed: int, i: int) -> dict:
    """Instagram handler: h1/span captions with the >20-char gate
    (ref:651-663); no-caption variant exercises the kept not-found stub
    quirk (ref:674 + ref:433-436)."""
    rng = _rng(seed, "special-instagram", i)
    doc_id = f"https://instagram.com/p/special-instagram-{i}/"
    variant = i % 3
    if variant == 0:
        caps = "".join(f"<span>{_paragraph(rng, 60, 90)}</span>"
                       for _ in range(2))
        html = (f"<html><body><article><h1>{_paragraph(rng, 40, 60)}</h1>"
                f"{caps}<span>short one</span></article></body></html>")
    elif variant == 1:
        html = (f"<html><body><article><span>tiny</span></article>"
                f'<div class="_a9zs">{_paragraph(rng, 50, 80)}</div>'
                f"</body></html>")
    else:
        # all captions ≤20 chars and no fallback element → stub message
        html = ("<html><body><article><span>hello</span>"
                "<span>shorty</span></article></body></html>")
    return _html_doc(doc_id, html)


# the canonical nav-only phrase set — must contain the detector's strict
# pattern verbatim (ref:279-293) so the nav-only branch fires
_PINTEREST_NAV = (
    "Skip to content Explore ideas Search for easy dinners, fashion, etc. "
    "When autocomplete results are available use up and down arrows to "
    "review and enter to select. Touch device users, explore by touch or "
    "with swipe gestures. Log in Sign up")


def gen_pinterest(seed: int, i: int) -> dict:
    """Pinterest nav-only detector (ref:210-295) + dedicated handler
    (ref:957-1185) via the final-return re-check (ref:580-591)."""
    rng = _rng(seed, "special-pinterest", i)
    doc_id = f"https://pinterest.com/pin/special-pinterest-{i}/"
    if i % 2 == 0:
        # nav-only page: generic extraction yields only nav chrome →
        # re-check fires → handler's large-div fallback
        html = (f"<html><body><div class=\"navshell\">{_PINTEREST_NAV}"
                f"</div></body></html>")
    else:
        # pin page whose useful bits hide behind data-test-id selectors;
        # generic body text stays nav-dominated so the re-check fires
        title = "cozy winter knitting patterns"
        html = f"""<html><body>
<div class="navshell">{_PINTEREST_NAV}</div>
<div data-test-id="pin-close-up-content">
<h1 data-test-id="pin-title">{title}</h1>
<div data-test-id="pin-domain-link"><span>craftsite.io</span></div>
</div></body></html>"""
    return _html_doc(doc_id, html)


def gen_pdf_doc(seed: int, i: int) -> dict:
    """PDF page-walk path (ref:122-159, dispatch ref:361-368)."""
    rng = _rng(seed, "pdf-doc", i)
    doc_id = f"https://docs.example.org/pdf-doc/{i}.pdf"
    if i % 4 == 3:
        payload = "\f\f"           # all pages empty → kept stub (quirk)
    else:
        pages = [_paragraph(rng) for _ in range(rng.randint(2, 4))]
        pages.insert(rng.randint(0, len(pages)), "<corrupt>")
        payload = "\f".join(pages)
    return {"doc_id": doc_id, "spans": [_span("pdf", payload, "", 0)]}


def gen_markdown_doc(seed: int, i: int) -> dict:
    """Markdownizer normalizer (ref:89-109) across all three dispatch
    paths: generic (cleanup applied, ref:576), youtube special-domain
    (raw return, ref:398-401), Yahoo image search (raw return)."""
    rng = _rng(seed, "markdown-doc", i)
    variant = i % 3
    if variant == 0:
        doc_id = f"https://r.example.ai/markdown-doc/{i}"
    elif variant == 1:
        doc_id = f"https://youtube.com/watch/markdown-doc-{i}"
    else:
        doc_id = f"https://search.yahoo.co.jp/image/search?p=markdown-doc-{i}"
    body = (f"Title: some page {i}\n"
            f"URL Source: https://origin.example.com/{i}\n"
            f"Markdown Content:\n"
            f"{_paragraph(rng)}\n\n"
            f"[a link](https://link.example.com/x) trailing words\n"
            f"![alt text](https://img.example.com/i.png)\n"
            f"<img src='x.png'>\n"
            f"{_paragraph(rng)} see https://inline.example.com/deep page\n")
    return {"doc_id": doc_id, "spans": [_span("markdown", body, "", 0)]}


def gen_dup_paragraphs(seed: int, i: int) -> dict:
    """Per-document near-dup removal: SequenceMatcher > 0.8 (ref:297-343).

    Paragraphs are kept under 200 chars so SequenceMatcher's autojunk
    (which activates at b-length ≥ 200) stays out of play, making the
    similarity bands analytic."""
    rng = _rng(seed, "dup-paragraphs", i)
    doc_id = f"https://dup.example.com/dup-paragraphs/{i}"
    base = _paragraph(rng, 140, 170)[:180]
    exact_dup = base
    near = base[:-30] + " zz qq xx vv ww yy kk jj pp nn"   # ~0.85 → drop
    keep_n = int(len(base) * 0.74)
    far = base[:keep_n] + " " + "".join(
        rng.choice("zqxvwy") for _ in range(len(base) - keep_n))  # ~0.75 keep
    other = _paragraph(rng, 120, 150)
    text = "\n\n".join([base, other, exact_dup, near, far])
    return _text_doc(doc_id, text)


def gen_dirty_text(seed: int, i: int) -> dict:
    """Cleanup normalizer: URL regexes, blank squeeze, printable filter
    (ref:161-208)."""
    rng = _rng(seed, "dirty-text", i)
    doc_id = f"https://dirty.example.com/dirty-text/{i}"
    text = (f"{_paragraph(rng)} visit https://spam.example.com/offer now\n"
            f"also www.junk.example.net/path here\n"
            f"and bare foo.co.jp/path/deep too\n\n\n\n\n"
            f"{_paragraph(rng)}\x00\x01 with control chars\n"
            f"and a replacement � char {_sentence(rng)}")
    return _text_doc(doc_id, text)


def gen_error_page(seed: int, i: int) -> dict:
    """Browser-error predicate → row rejected + reject manifest
    (ref:1408-1455, 1569-1656; patterns config.ini:10)."""
    rules = _oracle_rules
    rng = _rng(seed, "error-page", i)
    doc_id = f"https://err.example.com/error-page/{i}"
    pattern = rules.BROWSER_ERROR_PATTERNS[
        i % len(rules.BROWSER_ERROR_PATTERNS)]
    text = f"{_paragraph(rng)}\n\n{pattern}\n\n{_paragraph(rng)}"
    return _text_doc(doc_id, text)


def gen_failure_doc(seed: int, i: int) -> dict:
    """Failure taxonomy (ref:1592-1630): reachable failure branches plus
    the kept timeout sentinel."""
    variant = i % 5
    if variant == 0:   # empty HTML → すべての抽出方法… (reject)
        doc_id = f"https://fail.example.com/failure-doc/{i}"
        return _html_doc(doc_id, "<html><body></body></html>")
    if variant == 1:   # timeout sentinel, kept (ref:1628-1630)
        doc_id = f"https://fail.example.com/failure-doc/{i}"
        return _text_doc(doc_id, "（テキスト抽出タイムアウト）")
    if variant == 2:   # short markdown, generic → reject
        doc_id = f"https://fail.example.com/failure-doc/{i}"
        return {"doc_id": doc_id,
                "spans": [_span("markdown", "Title: x\ntiny", "", 0)]}
    if variant == 3:   # short markdown, youtube special domain → reject
        doc_id = f"https://youtube.com/watch/failure-doc-{i}"
        return {"doc_id": doc_id,
                "spans": [_span("markdown", "tiny body", "", 0)]}
    # short markdown, Yahoo image search → reject
    doc_id = f"https://search.yahoo.co.jp/image/search?p=failure-doc-{i}"
    return {"doc_id": doc_id,
            "spans": [_span("markdown", "tiny body", "", 0)]}


def gen_interleaved_media(seed: int, i: int) -> dict:
    """Span-order invariant: media spans pass through interleaved with
    extracted text spans by source offset (SURVEY §7 hard-part d)."""
    rng = _rng(seed, "interleaved-media", i)
    doc_id = f"https://mixed.example.com/interleaved-media/{i}"
    spans = []
    off = 0
    for j in range(rng.randint(2, 4)):
        spans.append(_span(
            "html",
            f"<html><body><main><p>{_paragraph(rng)}</p></main></body></html>",
            "", off)); off += 1
        spans.append(_span("image", "", f"media://{doc_id}/{off}", off)); off += 1
        spans.append(_span("text", _paragraph(rng), "", off)); off += 1
        if j % 2 == 0:
            spans.append(_span("video", "", f"media://{doc_id}/{off}", off)); off += 1
    return {"doc_id": doc_id, "spans": spans}


def gen_short_content(seed: int, i: int) -> dict:
    """Extraction < 100 chars: exercises the retry path (ref:523-566)."""
    rng = _rng(seed, "short-content", i)
    doc_id = f"https://short.example.com/short-content/{i}"
    html = (f"<html><head><title>s{i}</title></head><body>"
            f"<main>{_words(rng, 8)}</main></body></html>")
    return _html_doc(doc_id, html)


def gen_link_page(seed: int, i: int) -> dict:
    """Anchor-bearing pages for the link-mining pipeline (U1/U2/U3/U9/U5
    — webtext.pipelines.links): good links (some duplicated across docs),
    an excluded URL, a nav-text anchor, a resource file."""
    rng = _rng(seed, "link-page", i)
    doc_id = f"https://links.example.com/link-page/{i}"
    good = "".join(
        f'<a href="https://content{j}.example.org/story/{i % 4}">'
        f"{_sentence(rng)}</a>" for j in range(3))
    html = (f"<html><head><title>links {i}</title></head><body>"
            f"<p>{_paragraph(rng)}</p>{good}"
            f'<a href="https://google.com/search?q={i}">search page</a>'
            f'<a href="https://nav.example.com/login">ログイン</a>'
            f'<a href="https://cdn.example.com/app.js">bundle</a>'
            f"</body></html>")
    return _html_doc(doc_id, html)


def gen_media_only(seed: int, i: int) -> dict:
    """Media-only documents: status ok, pure pass-through."""
    doc_id = f"https://mixed.example.com/media-only/{i}"
    spans = [_span("image", "", f"media://{doc_id}/0", 0),
             _span("video", "", f"media://{doc_id}/1", 1)]
    return {"doc_id": doc_id, "spans": spans}


def gen_hot_domain(seed: int, i: int) -> dict:
    """Bench-only skew family: one domain holding the bulk of rows."""
    rng = _rng(seed, "hot-domain", i)
    doc_id = f"https://hot.example.com/hot-domain/{i}"
    paras = "".join(f"<p>{_paragraph(rng)}</p>" for _ in range(3))
    html = (f"<html><head><title>hot {i}</title></head><body>"
            f"{_BOILER}<main>{paras}</main></body></html>")
    return _html_doc(doc_id, html)


FAMILY_GENERATORS = {
    "generic-article": gen_generic_article,
    "domain-rule": gen_domain_rule,
    "heuristic-blocks": gen_heuristic_blocks,
    "body-fallback": gen_body_fallback,
    "title-fallback": gen_title_fallback,
    "special-chiebukuro": gen_chiebukuro,
    "special-twitter": gen_twitter,
    "special-instagram": gen_instagram,
    "special-pinterest": gen_pinterest,
    "pdf-doc": gen_pdf_doc,
    "markdown-doc": gen_markdown_doc,
    "dup-paragraphs": gen_dup_paragraphs,
    "dirty-text": gen_dirty_text,
    "error-page": gen_error_page,
    "failure-doc": gen_failure_doc,
    "interleaved-media": gen_interleaved_media,
    "short-content": gen_short_content,
    "media-only": gen_media_only,
    "link-page": gen_link_page,
}


def generate_docs(n_per_family: int = 20, seed: int = 42,
                  families=None) -> list[dict]:
    fams = families or list(FAMILY_GENERATORS)
    docs = []
    for family in fams:
        gen = FAMILY_GENERATORS[family]
        for i in range(n_per_family):
            docs.append(gen(seed, i))
    return docs


def corpus_table(n_per_family: int = 20, seed: int = 42,
                 families=None) -> pa.Table:
    docs = generate_docs(n_per_family, seed, families)
    return pa.Table.from_pylist(docs, schema=INPUT_SCHEMA)


def write_corpus(path: str, n_per_family: int = 20, seed: int = 42,
                 families=None, rows_per_file: int = 0) -> str:
    """Write the corpus as (optionally sharded) parquet under ``path``.

    Parquet stands in for Lance here (no Lance wheel in this container);
    the layout contract is the same: N independent fragments, each a
    resumable unit (see webtext.sources.manifest).
    """
    import os

    import pyarrow.parquet as pq

    table = corpus_table(n_per_family, seed, families)
    os.makedirs(path, exist_ok=True)
    if rows_per_file and table.num_rows > rows_per_file:
        k = 0
        for start in range(0, table.num_rows, rows_per_file):
            pq.write_table(table.slice(start, rows_per_file),
                           os.path.join(path, f"part-{k:05d}.parquet"))
            k += 1
    else:
        pq.write_table(table, os.path.join(path, "part-00000.parquet"))
    return path
