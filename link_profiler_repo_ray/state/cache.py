"""T6: API response cache (logical-clock TTL LRU).

Reference: utils/api_cache.py:20-110 — Redis GET/SET with a TTL
(default 3600 s) keyed ``{service}:{key}``, consulted by the backlink/
SERP clients before an API round-trip (backlink_service.py:586-625).
Here the cache is actor-held state with a LOGICAL clock so tests are
deterministic: the caller ticks time by passing ``now`` (the crawl's
round counter, or a second counter in real deployments).  Eviction is
LRU at ``max_entries`` — the memory bound Redis gave for free.

Load-bearing use: ``FrontierShard`` holds one as its robots.txt TTL
cache in real-fetch mode (the reference's 24h robots cache, T2 —
robots bodies, INCLUDING empty allow-all ones, are cached per host and
re-fetched after ``robots_ttl_rounds`` logical rounds).
"""

from __future__ import annotations

from collections import OrderedDict

__all__ = ["ResponseCache"]

_ABSENT = object()  # distinguishes 'not cached' from a cached None/falsy value


class ResponseCache:
    def __init__(self, ttl: int = 3600, max_entries: int = 10_000):
        self.ttl = ttl
        self.max_entries = max_entries
        self._d: OrderedDict[str, tuple[int, object]] = OrderedDict()
        self.hits = 0
        self.misses = 0

    @staticmethod
    def _key(service: str, key: str) -> str:
        return f"{service}:{key}"  # api_cache.py key shape

    def get(self, service: str, key: str, now: int, default=None):
        """Returns the cached value (which may itself be None/falsy) or
        ``default``.  Use ``contains`` / ``get_or_fetch`` when cached
        None must be distinguishable from absence."""
        v = self._lookup(service, key, now)
        return default if v is _ABSENT else v

    def _lookup(self, service: str, key: str, now: int):
        k = self._key(service, key)
        item = self._d.get(k)
        if item is None or now >= item[0]:
            if item is not None:
                del self._d[k]  # expired
            self.misses += 1
            return _ABSENT
        self._d.move_to_end(k)  # LRU touch
        self.hits += 1
        return item[1]

    def set(self, service: str, key: str, value, now: int, ttl: int | None = None) -> None:
        k = self._key(service, key)
        self._d[k] = (now + (self.ttl if ttl is None else ttl), value)
        self._d.move_to_end(k)
        while len(self._d) > self.max_entries:
            self._d.popitem(last=False)

    def contains(self, service: str, key: str, now: int) -> bool:
        """Live-entry test (counts toward hit/miss stats)."""
        return self._lookup(service, key, now) is not _ABSENT

    def get_or_fetch(self, service: str, key: str, now: int, fetch):
        """The ``@cached_api_call`` decorator shape (api_cache.py:99-110).

        A cached None/empty value is a valid hit (the reference caches
        'no result' responses to avoid hammering the API)."""
        v = self._lookup(service, key, now)
        if v is not _ABSENT:
            return v
        v = fetch()
        self.set(service, key, v, now)
        return v

    def stats(self) -> dict:
        return {"hits": self.hits, "misses": self.misses, "entries": len(self._d)}
