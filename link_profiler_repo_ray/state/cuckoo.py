"""Cuckoo filter: the 10^10-URL seen-set memory plan (SURVEY.md §7.5).

An exact uint64 hash set costs ~16 B/key in CPython; at 10^10 URLs the
seen set would need ~160 GB across shards.  A cuckoo filter with
16-bit fingerprints and 4-slot buckets stores ~2.3 B/key at a ~0.02%
false-positive rate — false positives make the crawler *skip* a URL it
has never seen, an acceptable loss semantics for frontier dedup at that
scale (and the reason the exact set remains the default for the
oracle-matched tests).

Drop-in for ``FrontierShard``: ``contains``/``add`` over numpy uint64
hash arrays, ``to_state``/``from_state`` for checkpoints.  Public
algorithm per Fan et al., "Cuckoo Filter: Practically Better Than
Bloom" (CoNEXT 2014).
"""

from __future__ import annotations

import numpy as np

__all__ = ["CuckooFilter"]

_EMPTY = np.uint16(0)
_MAX_KICKS = 500


class CuckooFilter:
    """16-bit-fingerprint, 4-way-bucket cuckoo filter over uint64 keys."""

    def __init__(self, capacity: int):
        # power-of-two bucket count sized for ~95% max load
        n_buckets = 1
        while n_buckets * 4 * 0.95 < capacity:
            n_buckets <<= 1
        self.n_buckets = n_buckets
        self.mask = np.uint64(n_buckets - 1)
        self.table = np.zeros((n_buckets, 4), dtype=np.uint16)
        self.size = 0

    # fingerprint: low 16 bits of the key's upper half, never 0
    @staticmethod
    def _fingerprint(h: np.uint64) -> np.uint16:
        fp = np.uint16((int(h) >> 32) & 0xFFFF)
        return fp if fp != 0 else np.uint16(1)

    def _index1(self, h: np.uint64) -> int:
        return int(h & self.mask)

    def _index2(self, i1: int, fp: np.uint16) -> int:
        # partial-key cuckoo hashing: i2 = i1 xor hash(fp)
        return int((np.uint64(i1) ^ (np.uint64(fp) * np.uint64(0x5BD1E995))) & self.mask)

    def contains_one(self, h: int) -> bool:
        h = np.uint64(h)
        fp = self._fingerprint(h)
        i1 = self._index1(h)
        if (self.table[i1] == fp).any():
            return True
        i2 = self._index2(i1, fp)
        return bool((self.table[i2] == fp).any())

    def add_one(self, h: int) -> bool:
        """Insert; returns False if the filter is over-full (caller

        should resize/reshard).  Idempotence is NOT guaranteed (a
        duplicate add may occupy a second slot) — pair with a
        ``contains`` check for SADD-style first-sighting semantics."""
        h = np.uint64(h)
        fp = self._fingerprint(h)
        i1 = self._index1(h)
        return self.add_fp(i1, fp)

    def add_fp(self, i1: int, fp: np.uint16) -> bool:
        """``add_one`` with (bucket, fingerprint) precomputed — the
        batch path computes them vectorized for the whole batch."""
        for i in (i1, self._index2(i1, fp)):
            row = self.table[i]
            empty = np.nonzero(row == _EMPTY)[0]
            if len(empty):
                row[empty[0]] = fp
                self.size += 1
                return True
        # cuckoo kicks; the victim slot is derived deterministically
        # from (fingerprint, kick counter) — no RNG, so checkpoint
        # restore replays the exact eviction sequence (round-1 advice:
        # an unserialized RNG made resumed runs diverge).  On give-up
        # the kick path is ROLLED BACK (the swap is an involution), so
        # a failed insert never silently evicts some other key.
        i = i1
        path: list[tuple[int, int]] = []
        for kick in range(_MAX_KICKS):
            slot = (int(fp) + kick) & 3
            path.append((i, slot))
            fp, self.table[i, slot] = self.table[i, slot], fp
            i = self._index2(i, fp)
            row = self.table[i]
            empty = np.nonzero(row == _EMPTY)[0]
            if len(empty):
                row[empty[0]] = fp
                self.size += 1
                return True
        for i_k, s_k in reversed(path):
            fp, self.table[i_k, s_k] = self.table[i_k, s_k], fp
        return False

    def contains_and_insert(self, hashes: np.ndarray) -> np.ndarray:
        """Bool mask of first-sightings (SADD semantics), batch API —

        the same contract as the exact seen-set shards."""
        out = np.empty(len(hashes), dtype=bool)
        for j, h in enumerate(hashes.tolist()):
            if self.contains_one(h):
                out[j] = False
            else:
                out[j] = self.add_one(h)
        return out

    def load_factor(self) -> float:
        return self.size / (self.n_buckets * 4)

    def to_state(self) -> dict:
        return {"table": self.table.copy(), "size": self.size}

    @classmethod
    def from_state(cls, state: dict) -> "CuckooFilter":
        f = cls(capacity=1)
        f.table = state["table"].copy()
        f.n_buckets = f.table.shape[0]
        f.mask = np.uint64(f.n_buckets - 1)
        f.size = int(state["size"])
        return f
