"""URL resolution, canonicalization and 64-bit hashing (operator M1).

Reference semantics being reproduced (SURVEY.md §2.2 M1):
- resolve relative hrefs against the page URL, dropping non-http(s)
  schemes (mailto/tel/javascript):  Link_Profiler/crawlers/link_extractor.py:81-92
- a URL is valid iff it has scheme+netloc:  Link_Profiler/utils/url_validator.py:20-26
- hosts compare lowercased:  Link_Profiler/utils/url_validator.py:28-33

Canonical form produced here (the BASELINE.json contract:
"lowercase host, strip fragments/utm params, percent-decode"):
- scheme and host lowercased; default ports (:80 http, :443 https) removed
- fragment stripped
- query parameters whose name starts with ``utm_`` (case-insensitive) removed,
  remaining parameters kept in original order
- path and query percent-decoded via ``urllib.parse.unquote``
- empty path becomes "/"

These functions are pure and batch-oriented: they take/return equal
length sequences so they can run inside ``map_batches`` without any
per-row Python in the *driver* — the per-URL work is a single compiled
``urlsplit`` + string ops per value, the practical floor for URL
parsing without a native extension.
"""

from __future__ import annotations

from urllib.parse import urljoin, urlsplit, urlunsplit, unquote

import numpy as np

__all__ = [
    "canonicalize",
    "canonicalize_batch",
    "resolve_batch",
    "host_of",
    "host_of_batch",
    "url_hash64",
    "is_internal_url",
]

_WEB_SCHEMES = ("http", "https")


def canonicalize(url: str) -> str | None:
    """Canonicalize one absolute URL.  Returns None for non-web URLs."""
    try:
        parts = urlsplit(url)
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if scheme not in _WEB_SCHEMES:
        return None
    host = parts.netloc.lower()
    if not host:
        return None
    # strip default ports
    if scheme == "http" and host.endswith(":80"):
        host = host[:-3]
    elif scheme == "https" and host.endswith(":443"):
        host = host[:-4]
    path = unquote(parts.path) or "/"
    query = ""
    if parts.query:
        kept = [
            kv
            for kv in parts.query.split("&")
            if kv and not kv.split("=", 1)[0].lower().startswith("utm_")
        ]
        query = "&".join(unquote(kv) for kv in kept)
    return urlunsplit((scheme, host, path, query, ""))


def canonicalize_batch(urls) -> list:
    """Vectorized entrypoint: list of canonical URLs (None where invalid)."""
    return [canonicalize(u) for u in urls]


def resolve_batch(base_urls, hrefs) -> list:
    """Resolve hrefs against their page URLs, then canonicalize.

    Mirrors LinkExtractor._resolve_url (link_extractor.py:81-92): any
    explicit non-http(s) scheme is dropped *before* joining.
    """
    out = []
    for base, href in zip(base_urls, hrefs):
        href = href.strip()
        scheme_end = href.find(":")
        if scheme_end > 0 and href[:scheme_end].isalpha():
            scheme = href[:scheme_end].lower()
            if scheme not in _WEB_SCHEMES:
                out.append(None)
                continue
        try:
            joined = urljoin(base, href)
        except ValueError:
            out.append(None)
            continue
        out.append(canonicalize(joined))
    return out


def host_of(url: str) -> str:
    """Lowercased netloc (url_validator.py:28-33)."""
    try:
        return urlsplit(url).netloc.lower()
    except ValueError:
        return ""


def host_of_batch(urls) -> list:
    return [host_of(u) for u in urls]


def is_internal_url(url: str, base_domain: str) -> bool:
    """url_validator.py:87-93: same host or subdomain of base."""
    h = host_of(url)
    return bool(h) and (h == base_domain or h.endswith("." + base_domain))


def url_hash64(urls) -> np.ndarray:
    """Deterministic 64-bit hash per URL (frontier routing + dedup key).

    Uses polars' vectorized xxhash with a fixed seed — stable across
    processes, which checkpoint/resume and shard routing rely on.  At
    10^10-URL scale this is the partitioning key for the seen-set
    shards and the corpus-replay fetch shards.
    """
    import polars as pl

    s = pl.Series("u", urls, dtype=pl.Utf8)
    return s.hash(seed=0).to_numpy().astype(np.uint64)
