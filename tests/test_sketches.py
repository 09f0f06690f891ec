"""Sketch kernels: HLL accuracy/merge, MinHash Jaccard estimation, SimHash."""

import numpy as np

from link_profiler_repo_ray.functions.sketches import (
    HyperLogLog,
    band_hashes,
    minhash_signature,
    shingle_hashes,
    simhash64,
    token_hashes,
)


def _rand_u64(rng, n):
    hi = rng.randint(0, 2**32, n, dtype=np.uint32).astype(np.uint64)
    lo = rng.randint(0, 2**32, n, dtype=np.uint32).astype(np.uint64)
    return (hi << np.uint64(32)) | lo


def test_hll_accuracy():
    rng = np.random.RandomState(1)
    h = _rand_u64(rng, 100_000)
    hll = HyperLogLog(12).add_hashes(h)
    n_true = len(np.unique(h))
    assert abs(hll.estimate() - n_true) / n_true < 0.05


def test_hll_merge_equals_union():
    rng = np.random.RandomState(2)
    a = _rand_u64(rng, 50_000)
    b = _rand_u64(rng, 50_000)
    ab = HyperLogLog(12).add_hashes(np.concatenate([a, b]))
    m = HyperLogLog(12).add_hashes(a).merge(HyperLogLog(12).add_hashes(b))
    assert m.estimate() == ab.estimate()


def test_hll_roundtrip_bytes():
    h = HyperLogLog(12).add_hashes(np.arange(1000, dtype=np.uint64) * 2654435761)
    h2 = HyperLogLog.from_bytes(h.to_bytes(), 12)
    assert h2.estimate() == h.estimate()


def test_hll_small_range_correction():
    h = HyperLogLog(12).add_hashes(token_hashes([f"x{i}" for i in range(100)]))
    assert abs(h.estimate() - 100) < 5


def test_minhash_jaccard_estimate():
    base = ("tok%d " % i for i in range(200))
    words = list(base)
    a = " ".join(words)
    b = " ".join(words[:150] + ["zz%d" % i for i in range(50)])  # true J ≈ 0.6
    sa = minhash_signature(shingle_hashes(a, 1), 256)
    sb = minhash_signature(shingle_hashes(b, 1), 256)
    est = (sa == sb).mean()
    true_j = 150 / 250
    assert abs(est - true_j) < 0.12


def test_minhash_identical_docs_identical_sigs():
    s1 = minhash_signature(shingle_hashes("a b c d e f g", 3))
    s2 = minhash_signature(shingle_hashes("a b c d e f g", 3))
    assert (s1 == s2).all()
    assert (band_hashes(s1) == band_hashes(s2)).all()


def test_simhash_similar_docs_close():
    a = " ".join(f"w{i}" for i in range(100))
    b = " ".join(f"w{i}" for i in range(99)) + " zz"
    ha = int(simhash64(token_hashes(a.split())))
    hb = int(simhash64(token_hashes(b.split())))
    hc = int(simhash64(token_hashes([f"q{i}" for i in range(100)])))
    near = bin(ha ^ hb).count("1")
    far = bin(ha ^ hc).count("1")
    assert near < far
    assert near <= 10


def test_cms_cells_shape_range_determinism():
    from link_profiler_repo_ray.functions.sketches import _CMS_DEPTH, cms_cells

    rng = np.random.RandomState(7)
    h = _rand_u64(rng, 5000)
    cells = cms_cells(h, log2_width=13)
    assert cells.shape == (_CMS_DEPTH, 5000)
    assert cells.min() >= 0 and cells.max() < (1 << 13)
    # deterministic across calls and dtype-coercion path
    assert np.array_equal(cells, cms_cells(h.astype(np.int64), log2_width=13))
    # rows are distinct hash functions: equal keys collide per-row,
    # distinct keys rarely collide on ALL rows
    all_rows_equal = (cells[:, :1000, None] == cells[:, None, 1000:2000]).all(axis=0)
    assert all_rows_equal.sum() == 0
