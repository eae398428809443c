"""Site-specific handlers — operator E8 (+ E9 Pinterest nav detector).

Each handler reproduces the DOM-side semantics of the reference's
Selenium-driven handler over materialized HTML (browser navigation,
scrolling and button-clicking are out of scope; the stored HTML plays the
role of the fully-rendered page source).  ``ref:`` cites
/root/reference/common_scripts/web_text_extractor_ver1.5.py.

Handlers return plain strings.  Failure strings follow the reference's
taxonomy exactly — including the quirk that "…できませんでした" messages
do NOT contain the dispatcher's failure marker ("失敗しました") and are
therefore treated as successes upstream (see rules.FAILURE_MARKER).
"""

from __future__ import annotations

import re

from ..dom import Document, Node, parse_html
from . import rules


# ---------------------------------------------------------------------------
# X / Twitter (ref:603-635)
# ---------------------------------------------------------------------------

def handle_twitter(doc: Document, url: str) -> str:
    """Join every <article> node's text with blank lines (ref:620-629)."""
    tweets = doc.select("article")
    text_content = []
    for tweet in tweets:
        tweet_text = tweet.get_text(separator=" ", strip=True)
        if tweet_text:
            text_content.append(tweet_text)
    return "\n\n".join(text_content)


# ---------------------------------------------------------------------------
# Instagram (ref:637-680)
# ---------------------------------------------------------------------------

def handle_instagram(doc: Document, url: str) -> str:
    """h1/span captions >20 chars inside <article>; fallback selector;
    else the not-found message (ref:651-674)."""
    post_texts: list[str] = []
    for article in doc.select("article"):
        for caption in article.select("h1, span"):
            text = caption.get_text(strip=True)
            if text and len(text) > rules.INSTAGRAM_CAPTION_MIN_CHARS:
                post_texts.append(text)
    if not post_texts:
        # the reference's live-driver fallback (ref:666-672) becomes a
        # plain selector pass over the same DOM
        for caption in doc.select(rules.INSTAGRAM_FALLBACK_SELECTOR):
            post_texts.append(caption.get_text(strip=True))
    if post_texts:
        return "\n\n".join(post_texts)
    return f"Instagramポストからテキストが見つかりませんでした: {url}"


# ---------------------------------------------------------------------------
# YouTube (ref:911-955)
# ---------------------------------------------------------------------------

def handle_youtube(doc: Document, url: str) -> str:
    """【タイトル】/【説明】 labeled assembly (ref:943-949).

    NOTE: in the reference this handler is dispatch-dead — the E1 chain
    routes youtube.com to the markdownizer (ref:386-401) and never calls
    ``handle_youtube_page`` — and this engine reproduces that routing
    (see oracle.extract).  The handler is implemented for operator-
    inventory parity (SURVEY §2.2 E8) and is callable directly."""
    title_el = doc.select_one("h1.title")
    title = title_el.get_text(strip=True) if title_el else ""
    desc_el = doc.select_one("#description-inline-expander")
    description = desc_el.get_text(separator="\n", strip=True) \
        if desc_el else ""
    result = []
    if title:
        result.append(f"【タイトル】{title}")
    if description:
        result.append(f"【説明】\n{description}")
    return "\n\n".join(result)


# ---------------------------------------------------------------------------
# Yahoo Chiebukuro (ref:682-909)
# ---------------------------------------------------------------------------

def _class_tokens_match(el: Node, pred) -> bool:
    """bs4 matches a class_ callable against each class token (and None
    when the attribute is absent)."""
    tokens = el.classes
    if not tokens:
        return bool(pred(None))
    return any(pred(tok) for tok in tokens)


def handle_chiebukuro(doc: Document, url: str) -> str:
    left_column = doc.find_first(
        "div", pred=lambda el: el.id == "leftColumn")
    if left_column is not None:
        return _chiebukuro_left_column(left_column)
    return _chiebukuro_selector_path(doc, url)


def _chiebukuro_left_column(left_column: Node) -> str:
    """#leftColumn isolation with related/ad/sidebar/nav removal
    (ref:757-820)."""
    related_sections: list[Node] = []

    # 1. headings/divs containing the related-content phrase → their parent
    for heading in left_column.find_all({"h2", "h3", "h4", "div"}):
        if (heading.get_text()
                and rules.CHIEBUKURO_RELATED_TEXT in heading.get_text()):
            parent = heading.parent
            if parent is not None and parent not in related_sections:
                related_sections.append(parent)

    # 2. class-name search
    for related_div in left_column.find_all(
            "div", pred=lambda el: _class_tokens_match(
                el, lambda c: c and ("RelatedContent" in c
                                     or "related" in c.lower()))):
        if related_div not in related_sections:
            related_sections.append(related_div)

    # 3. id search
    for related_div in left_column.find_all(
            "div", pred=lambda el: el.id and (
                "RelatedContent" in el.id or "related" in el.id.lower())):
        if related_div not in related_sections:
            related_sections.append(related_div)

    # 4. text-node search: nearest div ancestor
    for tn in list(left_column.text_nodes()):
        if rules.CHIEBUKURO_RELATED_TEXT in tn.text:
            parent = tn.parent
            while (parent is not None and parent.name != "div"
                   and parent is not left_column):
                parent = parent.parent
            if (parent is not None and parent is not left_column
                    and parent not in related_sections):
                related_sections.append(parent)

    for section in related_sections:
        section.decompose()

    # kill headings for more-answers / popular-questions sections
    for heading in left_column.find_all({"h2", "h3", "h4"}):
        heading_text = heading.get_text().lower()
        if any(k in heading_text
               for k in rules.CHIEBUKURO_HEADING_KILL_KEYWORDS):
            parent = heading.parent
            if parent is not None:
                parent.decompose()

    # ads / sidebars / page navigation
    for ad in left_column.find_all(
            "div", pred=lambda el: _class_tokens_match(
                el, lambda c: c and ("Ad" in c or "ad" in c.lower()
                                     or "advertisement" in c.lower()))):
        ad.decompose()
    for sidebar in left_column.find_all(
            "div", pred=lambda el: _class_tokens_match(
                el, lambda c: c and ("sidebar" in c.lower()
                                     or "side-bar" in c.lower()))):
        sidebar.decompose()
    for nav in left_column.find_all(
            "div", pred=lambda el: _class_tokens_match(
                el, lambda c: c and ("navigation" in c.lower()
                                     or "pagination" in c.lower()))):
        nav.decompose()

    content = left_column.get_text(separator="\n", strip=True)
    content = re.sub(r"\n\s*\n", "\n\n", content)
    return content


def _chiebukuro_selector_path(doc: Document, url: str) -> str:
    """No #leftColumn: Q/A selector cascade + longest-3-blocks fallback
    (ref:822-902)."""
    title_text = ""
    for title_selector in rules.CHIEBUKURO_TITLE_SELECTORS:
        el = doc.select_one(title_selector)
        if el is not None:
            title_text = el.get_text(strip=True)
            break

    content_text = ""
    for content_selector in rules.CHIEBUKURO_CONTENT_SELECTORS:
        el = doc.select_one(content_selector)
        if el is not None:
            content_text = el.get_text(strip=True)
            break

    answers: list[str] = []
    for answer_selector in rules.CHIEBUKURO_ANSWER_SELECTORS:
        elements = doc.select(answer_selector)
        if elements:
            for answer in elements:
                answer_text = answer.get_text(separator="\n", strip=True)
                if answer_text:
                    answers.append(answer_text)
            break

    if not answers:
        for answer in doc.select(rules.CHIEBUKURO_GENERIC_ANSWER_SELECTOR):
            answer_text = answer.get_text(separator="\n", strip=True)
            if answer_text and len(answer_text) > 50:
                answers.append(answer_text)

    if not title_text and not content_text and not answers:
        main_blocks: list[tuple[Node, str]] = []
        for tag in doc.find_all({"div", "section", "article"}):
            text = tag.get_text(strip=True)
            if len(text) > 100 and not any(
                    k in text.lower()
                    for k in rules.CHIEBUKURO_BLOCK_EXCLUDE_KEYWORDS):
                main_blocks.append((tag, text))
        main_blocks.sort(key=lambda x: len(x[1]), reverse=True)
        if main_blocks:
            if not title_text:
                title_candidate = main_blocks[0][0].find_first(
                    {"h1", "h2", "h3"})
                if title_candidate is not None:
                    title_text = title_candidate.get_text(strip=True)
            for i, (_block, text) in enumerate(main_blocks[:3]):
                if i == 0 and not content_text:
                    content_text = text
                else:
                    answers.append(text)

    result: list[str] = []
    if title_text:
        result.append(f"【質問】{title_text}")
    if content_text:
        result.append(content_text)
    if answers:
        result.append("\n【回答】")
        result.extend(answers)

    if not result:
        return f"知恵袋からコンテンツを抽出できませんでした: {url}"
    return "\n\n".join(result)


# ---------------------------------------------------------------------------
# Pinterest nav-only detector — E9 (ref:210-295)
# ---------------------------------------------------------------------------

def is_pinterest_navigation_error(text: str) -> bool:
    if not text or len(text.strip()) == 0:
        return False

    for pattern in rules.PINTEREST_CONTENT_INDICATOR_RES:
        if pattern.search(text):
            return False

    nav_char_count = 0
    total_nav_phrases = 0
    for phrase in rules.PINTEREST_NAV_PHRASES:
        if phrase in text:
            nav_char_count += len(phrase)
            total_nav_phrases += 1

    total_char_count = len(text.strip())
    if (total_nav_phrases >= rules.PINTEREST_NAV_MIN_PHRASES
            and total_char_count > 0):
        if nav_char_count / total_char_count > rules.PINTEREST_NAV_RATIO:
            return True

    normalized_text = " ".join(text.split())
    normalized_pattern = " ".join(rules.PINTEREST_STRICT_NAV_PATTERN.split())
    if (len(normalized_text) < rules.PINTEREST_STRICT_MAX_CHARS
            and normalized_pattern in normalized_text):
        return True
    return False


# ---------------------------------------------------------------------------
# Pinterest handler (ref:957-1185)
# ---------------------------------------------------------------------------

def _collect(doc: Document, selectors, keep) -> list[str]:
    """Selector-family sweep with per-family keep predicate and
    first-seen dedup (the shape of ref:1007-1083)."""
    out: list[str] = []
    for selector in selectors:
        for elem in doc.select(selector):
            text = elem.get_text(strip=True)
            if keep(text) and text not in out:
                out.append(text)
    return out


def handle_pinterest(doc: Document, url: str) -> str:
    result: list[str] = []

    domain_links = _collect(
        doc, rules.PINTEREST_DOMAIN_SELECTORS,
        lambda t: bool(t) and ("." in t or "http" in t) and len(t) < 100)
    pin_titles = _collect(
        doc, rules.PINTEREST_TITLE_SELECTORS,
        lambda t: bool(t) and len(t) > 5)
    descriptions = _collect(
        doc, rules.PINTEREST_DESC_SELECTORS,
        lambda t: bool(t) and len(t) > 10)
    pinner_names = _collect(
        doc, rules.PINTEREST_PINNER_SELECTORS,
        lambda t: bool(t) and 2 < len(t) < 50)
    comments_info = _collect(
        doc, rules.PINTEREST_COMMENT_SELECTORS,
        lambda t: bool(t) and len(t) > 5)

    main_content_areas: list[str] = []
    for selector in rules.PINTEREST_MAIN_SELECTORS:
        for elem in doc.select(selector):
            filtered_texts = []
            for tn in elem.text_nodes():
                clean_text = tn.text.strip()
                if clean_text and len(clean_text) > 3:
                    parent_name = tn.parent.name if tn.parent else ""
                    if parent_name not in ("script", "style", "noscript"):
                        filtered_texts.append(clean_text)
            if filtered_texts:
                area_content = "\n".join(filtered_texts)
                if (area_content not in main_content_areas
                        and len(area_content) > 50):
                    main_content_areas.append(area_content)

    # assembly with the reference's per-family caps (ref:1113-1142)
    result.extend(domain_links[:3])
    result.extend(pin_titles[:2])
    result.extend(descriptions[:3])
    result.extend(pinner_names[:2])
    result.extend(comments_info[:5])
    result.extend(main_content_areas[:2])

    # fallback: broad large-div extraction (ref:1144-1169)
    if len("\n".join(result)) < rules.PINTEREST_MIN_RESULT_CHARS:
        for unwanted in doc.select(rules.PINTEREST_FALLBACK_STRIP):
            unwanted.decompose()
        body = doc.body
        if body is not None:
            large_divs: list[tuple[Node, int]] = []
            for div in body.find_all("div"):
                div_text = div.get_text(separator=" ", strip=True)
                if len(div_text) > rules.PINTEREST_LARGE_DIV_MIN:
                    large_divs.append((div, len(div_text)))
            if large_divs:
                large_divs.sort(key=lambda x: x[1], reverse=True)
                for div, _n in large_divs[:2]:
                    div_content = div.get_text(separator="\n", strip=True)
                    if div_content and div_content not in result:
                        result.append(
                            div_content[:rules.PINTEREST_DIV_TRUNCATE])

    if result:
        return "\n\n".join(result)
    return f"Pinterestからコンテンツを抽出できませんでした: {url}"


def handle_pinterest_html(html: str, url: str) -> str:
    """Parse-fresh entry point used by the dispatcher's re-check
    (ref:580-591 re-navigates; here we re-parse the stored span)."""
    return handle_pinterest(parse_html(html), url)
