"""T7: per-domain-consistent User-Agent rotation for real-fetch mode.

The reference keeps a pool of realistic browser UA strings plus
matching request headers and rotates among them on a timer
(utils/user_agent_manager.py:13-120).  A timer-random choice is not
reproducible and makes a crawler look *more* suspicious to a host that
sees its UA flapping between requests, so this rebuild makes the
rotation DETERMINISTIC PER DOMAIN: every host is pinned to one UA from
the pool by hash, giving

- per-domain stability: a host always sees the same browser identity
  (cookie/session coherence, cacheable robots decisions), and
- cross-domain variety: the fleet's requests spread over the pool.

``headers_for_host`` adds the same browser-consistent header envelope
the reference builds (Accept/Accept-Language/Sec-Fetch-* for Chrome
engines, DNT for Firefox).  Opt-in via ``CrawlConfig.ua_rotation``;
the default remains the honest static crawler UA, which is what
robots.txt rules are evaluated against either way.
"""

from __future__ import annotations

from ..functions import canonical as can
from .politeness import USER_AGENT

__all__ = ["USER_AGENT_POOL", "ua_for_host", "headers_for_host"]

# public, widely-published browser UA shapes (variety across OS/engine)
USER_AGENT_POOL = [
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",
    "Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36 Edg/120.0.0.0",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.1 Safari/605.1.15",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64; rv:121.0) Gecko/20100101 Firefox/121.0",
    "Mozilla/5.0 (X11; Linux x86_64; rv:121.0) Gecko/20100101 Firefox/121.0",
    "Mozilla/5.0 (iPhone; CPU iPhone OS 17_1 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.1 Mobile/15E148 Safari/604.1",
]


# Appended to every rotated UA so the crawler stays IDENTIFIABLE even
# when presenting a browser-shaped identity (round-3 advice: rotation
# without any bot marker is camouflage; robots rules are still
# evaluated against the honest crawler token either way).  Hosts that
# key robots/serving decisions on this token see a consistent story.
BOT_SUFFIX = " (compatible; LinkProfilerRayBot)"


def ua_for_host(host: str, identify_bot: bool = True) -> str:
    """The pool UA this host is pinned to (stable across actors/runs:
    keyed by the same url_hash64 the frontier shards by), with the
    identifiable bot suffix appended unless explicitly disabled."""
    if not host:
        return USER_AGENT
    # int() BEFORE the modulo: numpy promotes uint64 % python-int to
    # float64, which silently mangles the high bits
    idx = int(can.url_hash64([host])[0]) % len(USER_AGENT_POOL)
    ua = USER_AGENT_POOL[idx]
    return ua + BOT_SUFFIX if identify_bot else ua


def headers_for_host(host: str) -> list[tuple[str, str]]:
    """Browser-consistent header envelope for the host's pinned UA."""
    ua = ua_for_host(host)
    headers = [
        ("User-Agent", ua),
        ("Accept", "text/html,application/xhtml+xml,application/xml;q=0.9,*/*;q=0.8"),
        ("Accept-Language", "en-US,en;q=0.5"),
        ("Connection", "keep-alive"),
        ("Upgrade-Insecure-Requests", "1"),
    ]
    if "Chrome" in ua:
        headers += [
            ("Sec-Fetch-Dest", "document"),
            ("Sec-Fetch-Mode", "navigate"),
            ("Sec-Fetch-Site", "none"),
        ]
    elif "Firefox" in ua:
        headers.append(("DNT", "1"))
    return headers
