"""Markdown (remote-markdownizer style) normalizer — operator E4.

The reference fetches ``https://r.jina.ai/<url>`` and strips the
markdownizer's framing (ref:75-120).  The network call is out of scope in
this engine (content is materialized in the input table as spans of
``kind='markdown'``); the *normalizer* survives as a pure per-span map.
"""

from __future__ import annotations

from . import rules


def normalize_markdown(content: str) -> str | None:
    """Strip markdownizer headers/links/images, squeeze blanks; reject ≤50.

    ref:89-109: header lines (``Title:`` / ``URL Source:`` /
    ``Published Time:`` / ``Markdown Content:``) are removed, then source
    links, image-bearing links, standalone images, plain markdown links,
    raw ``<img>`` tags; double blank lines squeeze to one blank; results of
    50 chars or fewer are rejected (returns None, like the reference's
    Jina failure path).
    """
    if content is None:
        return None
    for pat in rules.MD_HEADER_RES:
        content = pat.sub("", content)
    content = rules.MD_SOURCE_LINK_RE.sub("", content)
    content = rules.MD_IMAGE_LINK_RE.sub("", content)
    content = rules.MD_IMAGE_RE.sub("", content)
    content = rules.MD_LINK_RE.sub("", content)
    content = rules.MD_IMG_TAG_RE.sub("", content)
    content = rules.MD_BLANK_RE.sub("\n\n", content).strip()
    if content and len(content) > rules.MD_MIN_CHARS:
        return content
    return None
