"""Mergeable sketches: MinHash (+LSH banding), SimHash, HyperLogLog.

These are the scale path for the reference's exact-set operations:
- referring-domain cardinality (SURVEY.md A4) used a Python set
  (Link_Profiler/core/models.py:456-480); at 10^10-URL scale that
  becomes a HyperLogLog merged through ``groupby().aggregate``.
- near-duplicate detection (SURVEY.md D4) stored only an MD5 hash
  (Link_Profiler/utils/content_validator.py:83); MinHash-LSH and
  SimHash provide the near-dup variants a training-data pipeline needs.

All kernels are numpy-vectorized and deterministic (fixed seeds), so
sketch states can be checkpointed and merged across partitions.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "token_hashes",
    "shingle_hashes",
    "minhash_signature",
    "band_hashes",
    "simhash64",
    "HyperLogLog",
    "cms_cells",
    "stride_summary",
    "weighted_quantile",
]

_MERSENNE = np.uint64((1 << 61) - 1)
_SEED = 0x9E3779B97F4A7C15


def _rng_params(num_perm: int):
    rng = np.random.RandomState(42)
    a = rng.randint(1, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    return a, b


_PERM_CACHE: dict[int, tuple[np.ndarray, np.ndarray]] = {}


def token_hashes(tokens) -> np.ndarray:
    """uint64 hash per token (vectorized via polars xxhash, seed 0)."""
    import polars as pl

    if len(tokens) == 0:
        return np.empty(0, dtype=np.uint64)
    return pl.Series("t", list(tokens), dtype=pl.Utf8).hash(seed=0).to_numpy().astype(np.uint64)


def shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    """Hashes of word n-gram shingles of one document."""
    words = text.split()
    if len(words) < n:
        shingles = [" ".join(words)] if words else []
    else:
        shingles = [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]
    return token_hashes(shingles)


def minhash_signature(hashes: np.ndarray, num_perm: int = 128) -> np.ndarray:
    """MinHash signature (num_perm,) of a set of element hashes."""
    if num_perm not in _PERM_CACHE:
        _PERM_CACHE[num_perm] = _rng_params(num_perm)
    a, b = _PERM_CACHE[num_perm]
    if hashes.size == 0:
        return np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    x = (hashes % _MERSENNE).astype(np.uint64)
    with np.errstate(over="ignore"):
        # (num_perm, n) universal hash, min over elements
        v = (a[:, None] * x[None, :] + b[:, None]) % _MERSENNE
    return v.min(axis=1).astype(np.uint64)


def band_hashes(signature: np.ndarray, bands: int = 16) -> np.ndarray:
    """Collapse a signature into ``bands`` bucket hashes for LSH."""
    rows = signature.shape[-1] // bands
    sig = signature[: bands * rows].reshape(bands, rows).astype(np.uint64)
    out = np.full(bands, np.uint64(1469598103934665603), dtype=np.uint64)  # FNV offset
    prime = np.uint64(1099511628211)
    with np.errstate(over="ignore"):
        for r in range(rows):
            out = (out ^ sig[:, r]) * prime
    return out


def simhash64(hashes: np.ndarray) -> np.uint64:
    """64-bit SimHash of a bag of element hashes."""
    if hashes.size == 0:
        return np.uint64(0)
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    votes = (2 * bits - 1).sum(axis=0)
    out = np.uint64(0)
    for i in range(64):
        if votes[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return out


class HyperLogLog:
    """Dense HyperLogLog with 2^p registers (default p=12, ~1.6% error).

    Mergeable (register-wise max) → usable as the combine state of a
    Ray Data ``AggregateFn`` and serializable into checkpoints.
    """

    __slots__ = ("p", "m", "registers")

    def __init__(self, p: int = 12, registers: np.ndarray | None = None):
        self.p = p
        self.m = 1 << p
        self.registers = (
            registers if registers is not None else np.zeros(self.m, dtype=np.uint8)
        )

    def add_hashes(self, h: np.ndarray) -> "HyperLogLog":
        if h.size == 0:
            return self
        h = h.astype(np.uint64)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)).astype(np.uint64)
        # rank = leading zeros of `rest` + 1, capped at 64 - p + 1
        rank = np.full(h.shape, 64 - self.p + 1, dtype=np.uint8)
        nz = rest != 0
        if nz.any():
            # count leading zeros via bit length
            bl = np.zeros(h.shape, dtype=np.int64)
            r = rest[nz]
            for shift in (32, 16, 8, 4, 2, 1):
                ge = r >= (np.uint64(1) << np.uint64(shift))
                bl[nz] = bl[nz] + np.where(ge, shift, 0)
                r = np.where(ge, r >> np.uint64(shift), r)
            bl[nz] += 1  # bit length
            rank_nz = (64 - bl[nz] + 1).astype(np.uint8)
            rank[nz] = np.minimum(rank_nz, 64 - self.p + 1)
        np.maximum.at(self.registers, idx, rank)
        return self

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        inv_sum = np.sum(2.0 ** (-self.registers.astype(np.float64)))
        e = alpha * m * m / inv_sum
        if e <= 2.5 * m:
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros:
                e = m * np.log(m / zeros)
        return float(e)

    def to_bytes(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, p: int = 12) -> "HyperLogLog":
        return cls(p=p, registers=np.frombuffer(data, dtype=np.uint8).copy())


# --- Count-Min sketch (heavy-hitter frequency estimation) -----------------

_CMS_DEPTH = 4
# multiply-shift row hashes (Dietzfelbinger): odd 64-bit multipliers,
# overflow-wrapping product, top bits select the cell — vectorized and
# deterministic across processes
_CMS_A = np.array(
    [0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9, 0x27D4EB2F165667C5],
    dtype=np.uint64,
) | np.uint64(1)


def cms_cells(hashes: np.ndarray, log2_width: int = 13) -> np.ndarray:
    """(depth, n) int64 cell indices for uint64 key hashes.

    Row d of the result is the Count-Min cell index of every key under
    the d-th multiply-shift hash; width = 2**log2_width.  Flattened as
    ``d * width + idx`` these become plain int64 exchange keys, so a
    distributed CMS is just a (cell, count) hash aggregate — the whole
    sketch is ≤ depth·width rows AFTER aggregation no matter how many
    tokens crossed, which is what bounds the sketch at 10^12 tokens.
    """
    if hashes.dtype != np.uint64:
        hashes = hashes.astype(np.uint64)
    shift = np.uint64(64 - log2_width)
    out = np.empty((_CMS_DEPTH, len(hashes)), dtype=np.int64)
    for d in range(_CMS_DEPTH):
        out[d] = ((_CMS_A[d] * hashes) >> shift).astype(np.int64)
    return out


# --- deterministic mergeable quantile summary (MRL-style) ------------------


def stride_summary(
    values: np.ndarray, weights: np.ndarray | None, m: int
) -> tuple[np.ndarray, np.ndarray]:
    """Compact (values, weights) to ≤ m weighted order statistics.

    Deterministic MRL-style compaction (Manku-Rajagopalan-Lindsay):
    sort by value, pick the weighted order statistic at rank
    W·(i+0.5)/m for each i, give each weight W/m.  One pass adds at
    most W/m weighted-rank error, and summaries MERGE BY CONCATENATION
    (rank errors add), so a distributed quantile sketch is per-block
    summaries → re-stride batches of concatenated summaries → final
    weighted quantile.  Unlike the bounded-domain exact histogram
    (pipelines/relational.py value_percentiles) this works on
    unbounded/float domains at fixed size.
    """
    if weights is None:
        weights = np.ones(len(values), dtype=np.float64)
    if len(values) <= m:
        return values, weights.astype(np.float64)
    order = np.argsort(values, kind="stable")
    sv = values[order]
    cum = np.cumsum(weights[order].astype(np.float64))
    total = cum[-1]
    targets = total * (np.arange(m, dtype=np.float64) + 0.5) / m
    pos = np.minimum(np.searchsorted(cum, targets, side="left"), len(sv) - 1)
    return sv[pos], np.full(m, total / m, dtype=np.float64)


def weighted_quantile(
    values: np.ndarray, weights: np.ndarray, qs: np.ndarray
) -> np.ndarray:
    """Value at weighted rank q·W for each q (lower selection)."""
    order = np.argsort(values, kind="stable")
    sv = values[order]
    cum = np.cumsum(weights[order].astype(np.float64))
    pos = np.minimum(
        np.searchsorted(cum, np.asarray(qs, dtype=np.float64) * cum[-1], side="left"),
        len(sv) - 1,
    )
    return sv[pos]
