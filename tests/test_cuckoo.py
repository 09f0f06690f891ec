"""Cuckoo-filter seen set: no false negatives, bounded false positives,

state round-trip (the 10^10-URL memory plan, SURVEY §7.5)."""

import numpy as np

from link_profiler_repo_ray.state.cuckoo import CuckooFilter


def _rand_u64(rng, n):
    hi = rng.randint(0, 2**32, n, dtype=np.uint32).astype(np.uint64)
    lo = rng.randint(0, 2**32, n, dtype=np.uint32).astype(np.uint64)
    return (hi << np.uint64(32)) | lo


def test_no_false_negatives():
    rng = np.random.RandomState(7)
    keys = np.unique(_rand_u64(rng, 20_000))
    f = CuckooFilter(capacity=40_000)
    mask = f.contains_and_insert(keys)
    assert mask.all()  # all new on first insert
    for k in keys[:2000].tolist():
        assert f.contains_one(k)


def test_false_positive_rate_bounded():
    rng = np.random.RandomState(8)
    keys = np.unique(_rand_u64(rng, 50_000))
    f = CuckooFilter(capacity=100_000)
    f.contains_and_insert(keys)
    probes = np.unique(_rand_u64(np.random.RandomState(9), 50_000))
    probes = np.setdiff1d(probes, keys)
    fp = sum(f.contains_one(p) for p in probes.tolist())
    # 16-bit fingerprints, 2x4 slots → theoretical FPR ≈ 8/2^16 ≈ 0.012%
    assert fp / len(probes) < 0.002


def test_sadd_semantics():
    f = CuckooFilter(capacity=1000)
    h = np.array([11, 22, 33, 22, 11], dtype=np.uint64)
    assert f.contains_and_insert(h).tolist() == [True, True, True, False, False]


def test_state_roundtrip():
    rng = np.random.RandomState(10)
    keys = np.unique(_rand_u64(rng, 5_000))
    f = CuckooFilter(capacity=10_000)
    f.contains_and_insert(keys)
    g = CuckooFilter.from_state(f.to_state())
    for k in keys[:500].tolist():
        assert g.contains_one(k)
    assert g.load_factor() == f.load_factor()


def test_memory_footprint():
    # power-of-two bucket rounding can double the table; at a
    # pow2-friendly capacity the footprint is ~2.2 B/key (vs ~16 B/key
    # for a Python set of ints), worst case ~4.4 B/key
    f = CuckooFilter(capacity=900_000)
    bytes_per_key = f.table.nbytes / 900_000
    assert bytes_per_key < 3.0


def test_cuckoo_backed_crawl_matches_exact(ray_session):
    """At test scale the cuckoo FP probability is tiny and the filter is
    deterministic, so a cuckoo-backed crawl must equal the exact one."""
    from link_profiler_repo_ray.pipelines.crawl import CrawlConfig, run_crawl

    sf = "/root/testdata/sf0.001"
    exact = run_crawl(sf, CrawlConfig(num_seen_shards=2, num_fetchers=2))
    cuckoo = run_crawl(
        sf,
        CrawlConfig(num_seen_shards=2, num_fetchers=2, seen_backend="cuckoo"),
    )
    assert exact.order.column("url").to_pylist() == cuckoo.order.column("url").to_pylist()
    assert exact.counters["seen_urls"] == cuckoo.counters["seen_urls"]
