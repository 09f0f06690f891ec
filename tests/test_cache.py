"""T6 API response cache: TTL expiry on the logical clock, LRU bound,
get_or_fetch decorator shape, hit/miss accounting."""

from link_profiler_repo_ray.state.cache import ResponseCache


def test_ttl_expiry_logical_clock():
    c = ResponseCache(ttl=10)
    c.set("backlinks", "https://a.com", {"n": 3}, now=0)
    assert c.get("backlinks", "https://a.com", now=9) == {"n": 3}
    assert c.get("backlinks", "https://a.com", now=10) is None  # expired
    assert c.get("backlinks", "https://a.com", now=11) is None
    assert c.stats()["hits"] == 1 and c.stats()["misses"] == 2


def test_keys_are_service_scoped():
    c = ResponseCache()
    c.set("serp", "kw", "a", now=0)
    c.set("backlinks", "kw", "b", now=0)
    assert c.get("serp", "kw", now=1) == "a"
    assert c.get("backlinks", "kw", now=1) == "b"


def test_lru_eviction_bound():
    c = ResponseCache(ttl=100, max_entries=3)
    for i in range(5):
        c.set("s", f"k{i}", i, now=0)
    assert c.stats()["entries"] == 3
    assert c.get("s", "k0", now=1) is None  # oldest evicted
    assert c.get("s", "k4", now=1) == 4
    # touching k2 protects it from the next eviction
    assert c.get("s", "k2", now=1) == 2
    c.set("s", "k5", 5, now=1)
    assert c.get("s", "k2", now=2) == 2
    assert c.get("s", "k3", now=2) is None


def test_get_or_fetch_decorator_shape():
    c = ResponseCache(ttl=5)
    calls = []

    def fetch():
        calls.append(1)
        return {"x": 1}

    assert c.get_or_fetch("svc", "u", 0, fetch) == {"x": 1}
    assert c.get_or_fetch("svc", "u", 3, fetch) == {"x": 1}
    assert len(calls) == 1  # second call served from cache
    assert c.get_or_fetch("svc", "u", 6, fetch) == {"x": 1}
    assert len(calls) == 2  # TTL expired → refetched


def test_cached_none_is_a_hit():
    """Review regression: a cached None/empty value (an API 'no result',
    or an empty allow-all robots.txt) must be served from cache, not
    refetched every call."""
    c = ResponseCache(ttl=10)
    calls = []

    def fetch():
        calls.append(1)
        return None

    assert c.get_or_fetch("svc", "u", 0, fetch) is None
    assert c.get_or_fetch("svc", "u", 5, fetch) is None
    assert len(calls) == 1
    assert c.contains("svc", "u", 9)
    assert not c.contains("svc", "u", 10)  # TTL expiry
    # empty-string robots body is likewise a valid cached value
    c.set("robots", "h.com", "", now=0)
    assert c.contains("robots", "h.com", 5)
    assert c.get("robots", "h.com", 5, default="MISS") == ""
