"""HTML kernels: text extraction (M5), link extraction (M2), SEO parse (M4).

All pure functions over batches of HTML strings, designed to run inside
``map_batches``.  No bs4/lxml dependency — a compiled-regex tokenizer
reproduces the reference semantics for the HTML shapes this engine
processes (and for the golden fixtures ported from the reference's
tests/link_extractor_test.py).

Reference semantics:
- ``extract_text`` must be BYTE-IDENTICAL per url to the reference's
  cleaner (Link_Profiler/utils/content_validator.py:87-101): remove
  <script>/<style> elements (dotall, case-insensitive, backreferenced
  closing tag), strip all tags, decode HTML entities, collapse all
  whitespace runs to single spaces, strip.  This is the per-row
  invariant named in BASELINE.json.
- ``extract_links`` mirrors Link_Profiler/crawlers/link_extractor.py:23-132:
  every <a href> yields one edge with anchor_text (tag text, stripped),
  rel attribute list split on spaces, link_type by the precedence
  sponsored > ugc > nofollow > canonical > redirect > dofollow
  (link_extractor.py:94-109), context_text = previous-sibling text +
  anchor text + next-sibling text truncated to 100 chars
  (link_extractor.py:111-132); plus one pseudo-edge for the first
  <link rel="canonical"> with anchor_text="canonical"
  (link_extractor.py:59-73).  mailto:/tel:/javascript: hrefs are
  dropped (link_extractor.py:84-88).
- ``parse_seo`` mirrors Link_Profiler/crawlers/content_parser.py:21-129
  and the score formula in Link_Profiler/core/models.py:191-242.
"""

from __future__ import annotations

import html as _html
import json
import re

import numpy as np

from .canonical import host_of, resolve_batch

__all__ = [
    "extract_text",
    "extract_text_batch",
    "extract_links",
    "parse_seo",
    "seo_score",
    "LINK_TYPE_PRECEDENCE",
]

# --- M5: text extraction -------------------------------------------------

_SCRIPT_STYLE_RE = re.compile(r"<(script|style)[^>]*>.*?</\1>", re.IGNORECASE | re.DOTALL)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")


def extract_text(html_content: str) -> str:
    """Strip script/style + tags, unescape entities, collapse whitespace."""
    s = _SCRIPT_STYLE_RE.sub("", html_content)
    s = _TAG_RE.sub("", s)
    s = _html.unescape(s)
    return _WS_RE.sub(" ", s).strip()


def extract_text_batch(htmls) -> list:
    """Batch entrypoint; accepts str or utf-8 bytes values."""
    out = []
    for h in htmls:
        if isinstance(h, (bytes, bytearray, memoryview)):
            h = bytes(h).decode("utf-8", errors="replace")
        out.append(extract_text(h))
    return out


# --- M2: link extraction -------------------------------------------------

_A_RE = re.compile(r"<a\b([^>]*)>(.*?)</a\s*>", re.IGNORECASE | re.DOTALL)
_LINK_TAG_RE = re.compile(r"<link\b[^>]*>", re.IGNORECASE)
_ATTR_RE = re.compile(
    r"""([a-zA-Z_:][-a-zA-Z0-9_:.]*)\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))"""
)

LINK_TYPE_PRECEDENCE = ("sponsored", "ugc", "nofollow", "canonical", "redirect")


def _attrs(attr_str: str) -> dict:
    return {
        m.group(1).lower(): (m.group(3) if m.group(3) is not None else (m.group(4) if m.group(4) is not None else m.group(5)))
        for m in _ATTR_RE.finditer(attr_str)
    }


def _inner_text(fragment: str) -> str:
    """Tag text the way get_text(strip=True)-ish reads it for flat markup."""
    s = _TAG_RE.sub("", fragment)
    s = _html.unescape(s)
    return _WS_RE.sub(" ", s).strip()


def _link_type(rel_attributes) -> str:
    for t in LINK_TYPE_PRECEDENCE:
        if t in rel_attributes:
            return t
    return "dofollow"


def _context_text(html_content: str, start: int, end: int, anchor_text: str, max_length: int = 100) -> str:
    """Prev-sibling text + anchor + next-sibling text, truncated.

    Sibling text is approximated as the raw text run between the anchor
    tag and the adjacent tag boundary — equivalent to the reference's
    BeautifulSoup sibling walk for flat (non-nested-sibling) markup,
    which is the corpus this engine generates and the fixtures test.
    """
    prev_stop = html_content.rfind(">", 0, start)
    prev_txt = html_content[prev_stop + 1 : start].strip() if prev_stop != -1 else html_content[:start].strip()
    next_start = html_content.find("<", end)
    next_txt = html_content[end:next_start].strip() if next_start != -1 else html_content[end:].strip()
    context = ""
    if prev_txt:
        context += prev_txt + " "
    context += anchor_text
    if next_txt:
        context += " " + next_txt
    return context.strip()[:max_length]


def extract_links(base_url: str, html_content: str) -> list[dict]:
    """All <a href> edges plus the first <link rel=canonical> pseudo-edge.

    Returns a list of dicts with keys: target_url, anchor_text,
    link_type, rel_attributes, context_text.  target_url is resolved
    against ``base_url`` and canonicalized; non-web schemes are dropped.
    """
    anchors = []
    hrefs = []
    for m in _A_RE.finditer(html_content):
        attrs = _attrs(m.group(1))
        href = attrs.get("href")
        if href is None:
            continue
        anchors.append((m, attrs))
        hrefs.append(href)

    resolved = resolve_batch([base_url] * len(hrefs), hrefs)
    links: list[dict] = []
    for (m, attrs), target in zip(anchors, resolved):
        if target is None:
            continue
        anchor_text = _inner_text(m.group(2))
        rel_raw = attrs.get("rel")
        rel_attributes = [r for r in rel_raw.split(" ") if r.strip()] if rel_raw else []
        links.append(
            {
                "target_url": target,
                "anchor_text": anchor_text,
                "link_type": _link_type(rel_attributes),
                "rel_attributes": rel_attributes,
                "context_text": _context_text(html_content, m.start(), m.end(), anchor_text),
            }
        )

    for m in _LINK_TAG_RE.finditer(html_content):
        attrs = _attrs(m.group(0)[5:])
        if attrs.get("rel", "").strip().lower() == "canonical" and attrs.get("href"):
            target = resolve_batch([base_url], [attrs["href"].strip()])[0]
            if target is not None:
                links.append(
                    {
                        "target_url": target,
                        "anchor_text": "canonical",
                        "link_type": "canonical",
                        "rel_attributes": ["canonical"],
                        "context_text": "",
                    }
                )
            break  # reference takes only the first canonical link tag
    return links


# --- M4 + M8: SEO metrics ------------------------------------------------

_TITLE_RE = re.compile(r"<title[^>]*>(.*?)</title\s*>", re.IGNORECASE | re.DOTALL)
_META_RE = re.compile(r"<meta\b[^>]*>", re.IGNORECASE)
_H1_RE = re.compile(r"<h1\b", re.IGNORECASE)
_H2_RE = re.compile(r"<h2\b", re.IGNORECASE)
_IMG_RE = re.compile(r"<img\b[^>]*>", re.IGNORECASE)
_JSONLD_RE = re.compile(
    r"<script\b[^>]*type\s*=\s*[\"']application/ld\+json[\"'][^>]*>(.*?)</script\s*>",
    re.IGNORECASE | re.DOTALL,
)


def _meta_tags(html_content: str):
    for m in _META_RE.finditer(html_content):
        yield _attrs(m.group(0)[5:])


def parse_seo(url: str, html_content: str) -> dict:
    """Wide nullable SEO-metrics struct for one page (content_parser.py:21-129)."""
    out: dict = {
        "title_length": None,
        "meta_description_length": None,
        "h1_count": 0,
        "h2_count": 0,
        "internal_links": 0,
        "external_links": 0,
        "images_count": 0,
        "images_without_alt": 0,
        "has_canonical": False,
        "has_robots_meta": False,
        "has_schema_markup": False,
        "structured_data_types": [],
        "og_title": None,
        "og_description": None,
        "twitter_title": None,
        "twitter_description": None,
        "mobile_friendly": False,
    }
    m = _TITLE_RE.search(html_content)
    if m and m.group(1):
        out["title_length"] = len(m.group(1).strip())

    metas = list(_meta_tags(html_content))
    for a in metas:
        name = (a.get("name") or "").lower()
        prop = (a.get("property") or "").lower()
        content = a.get("content")
        if name == "description" and content:
            out["meta_description_length"] = len(content.strip())
        elif name == "robots":
            out["has_robots_meta"] = True
        elif name == "viewport":
            out["mobile_friendly"] = bool(content and "width=device-width" in content)
        elif name == "twitter:title" and content:
            out["twitter_title"] = content.strip()
        elif name == "twitter:description" and content:
            out["twitter_description"] = content.strip()
        if prop == "og:title" and content:
            out["og_title"] = content.strip()
        elif prop == "og:description" and content:
            out["og_description"] = content.strip()

    out["h1_count"] = len(_H1_RE.findall(html_content))
    out["h2_count"] = len(_H2_RE.findall(html_content))

    base_host = host_of(url)
    hrefs = []
    for m in _A_RE.finditer(html_content):
        href = _attrs(m.group(1)).get("href")
        if href is not None:
            hrefs.append(href)
    # content_parser.py:49-59 counts via raw urljoin (no scheme filtering)
    from urllib.parse import urljoin, urlsplit

    for href in hrefs:
        try:
            link_host = urlsplit(urljoin(url, href.strip())).netloc.lower()
        except ValueError:
            continue
        if link_host == base_host:
            out["internal_links"] += 1
        elif link_host:
            out["external_links"] += 1

    for m in _IMG_RE.finditer(html_content):
        out["images_count"] += 1
        if not _attrs(m.group(0)[4:]).get("alt"):
            out["images_without_alt"] += 1

    out["has_canonical"] = any(
        (a.get("rel", "").strip().lower() == "canonical" and a.get("href"))
        for a in (_attrs(t.group(0)[5:]) for t in _LINK_TAG_RE.finditer(html_content))
    )

    sd_types: set[str] = set()
    for m in _JSONLD_RE.finditer(html_content):
        out["has_schema_markup"] = True
        try:
            payload = json.loads(m.group(1))
        except json.JSONDecodeError:
            continue
        items = payload if isinstance(payload, list) else [payload]
        for item in items:
            if isinstance(item, dict) and "@type" in item:
                t = item["@type"]
                sd_types.update(t if isinstance(t, list) else [t])
    out["structured_data_types"] = sorted(sd_types)

    out["seo_score"] = seo_score(out)
    return out


def seo_score(m: dict) -> float:
    """Weighted SEO score 0-100 (core/models.py:191-242).

    performance/accessibility/ai scores and broken-links are unknown at
    parse time (None/absent), matching the reference's parse-time path.
    """
    weights_abs_sum = 0.3 + 0.2 + 0.1 + 0.1 + 0.05 + 0.05 + 0.05 + 0.05 + 0.1 + 0.1
    score = 0.0
    tl = m.get("title_length")
    if tl is not None:
        if 30 <= tl <= 60:
            score += 0.1
        elif tl > 0:
            score += 0.05
    ml = m.get("meta_description_length")
    if ml is not None:
        if 50 <= ml <= 160:
            score += 0.1
        elif ml > 0:
            score += 0.05
    h1 = m.get("h1_count")
    if h1 is not None:
        if h1 == 1:
            score += 0.05
        elif h1 > 1:
            score += 0.025
    if m.get("has_canonical"):
        score += 0.05
    if m.get("has_robots_meta"):
        score += 0.05
    if m.get("has_schema_markup"):
        score += 0.05
    return max(0.0, min(100.0, score * 100.0 / weights_abs_sum))
