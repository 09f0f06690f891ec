"""T6: API response cache (logical-clock TTL LRU).

Reference: utils/api_cache.py:20-110 — Redis GET/SET with a TTL
(default 3600 s) keyed ``{service}:{key}``, consulted by the backlink/
SERP clients before an API round-trip (backlink_service.py:586-625).
Here the cache is actor-held state (one per fetch/enrichment actor,
exactly like the robots cache) with a LOGICAL clock so tests are
deterministic: the caller ticks time by passing ``now`` (the crawl's
round counter, or a second counter in real deployments).  Eviction is
LRU at ``max_entries`` — the memory bound Redis gave for free.
"""

from __future__ import annotations

from collections import OrderedDict

__all__ = ["ResponseCache"]


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

    def get(self, service: str, key: str, now: int):
        k = self._key(service, key)
        item = self._d.get(k)
        if item is None or now >= item[0]:
            if item is not None:
                del self._d[k]  # expired
            self.misses += 1
            return None
        self._d.move_to_end(k)  # LRU touch
        self.hits += 1
        return item[1]

    def set(self, service: str, key: str, value, now: int, ttl: int | None = None) -> None:
        k = self._key(service, key)
        self._d[k] = (now + (self.ttl if ttl is None else ttl), value)
        self._d.move_to_end(k)
        while len(self._d) > self.max_entries:
            self._d.popitem(last=False)

    def get_or_fetch(self, service: str, key: str, now: int, fetch):
        """The ``@cached_api_call`` decorator shape (api_cache.py:99-110)."""
        v = self.get(service, key, now)
        if v is not None:
            return v
        v = fetch()
        self.set(service, key, v, now)
        return v

    def stats(self) -> dict:
        return {"hits": self.hits, "misses": self.misses, "entries": len(self._d)}
