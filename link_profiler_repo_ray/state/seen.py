"""Sharded URL-seen set (operator T1 / D2).

The reference keeps per-job seen sets in process memory
(services/crawl_service.py:491-503) and a global edge-dedup set in
Redis (crawl_service.py:95-116).  Here the seen set is an actor pool
of N shards, routed by ``url_hash % N`` — the shard RPC is batched
(one call per shard per round-batch, never per URL), and shard state
serializes to the checkpoint as a sorted uint64 array.

Sizing at 10^10 URLs: an exact uint64 hash-set costs ~8-16 B/key →
~100-200 GB across shards, i.e. 256 shards × ~0.5-0.8 GB — viable on a
256-node cluster; a cuckoo/bloom representation (2 B/key) is a drop-in
replacement for `SeenShard._set` behind the same batch interface.
"""

from __future__ import annotations

import os

import numpy as np
import ray


@ray.remote(num_cpus=0.25)
class SeenShard:
    """One shard of the distributed seen set (exact uint64 membership)."""

    def __init__(self):
        self._set: set[int] = set()

    def contains_and_insert(self, hashes: np.ndarray) -> np.ndarray:
        """Insert; return bool mask 'was new' per input (SADD semantics,

        crawl_service.py:95-116: add-returns-1 ⇒ first sighting)."""
        s = self._set
        out = np.empty(len(hashes), dtype=bool)
        for i, h in enumerate(hashes.tolist()):
            if h in s:
                out[i] = False
            else:
                s.add(h)
                out[i] = True
        return out

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        s = self._set
        return np.fromiter((h in s for h in hashes.tolist()), dtype=bool, count=len(hashes))

    def size(self) -> int:
        return len(self._set)

    def dump(self) -> np.ndarray:
        """Serialized shard state for checkpoints (sorted uint64)."""
        return np.sort(np.fromiter(self._set, dtype=np.uint64, count=len(self._set)))

    def load(self, arr: np.ndarray) -> int:
        self._set = set(arr.tolist())
        return len(self._set)


class SeenSet:
    """Client for the shard pool; all calls are batch fan-outs."""

    def __init__(self, num_shards: int = 8):
        self.num_shards = num_shards
        self.shards = [SeenShard.remote() for _ in range(num_shards)]

    def _route(self, hashes: np.ndarray):
        shard_ids = (hashes % np.uint64(self.num_shards)).astype(np.int64)
        return shard_ids

    def filter_new(self, hashes: np.ndarray) -> np.ndarray:
        """Insert all; bool mask of first-sightings, order-aligned."""
        if len(hashes) == 0:
            return np.empty(0, dtype=bool)
        shard_ids = self._route(hashes)
        out = np.empty(len(hashes), dtype=bool)
        futures = []
        index_lists = []
        for s in range(self.num_shards):
            idx = np.nonzero(shard_ids == s)[0]
            if len(idx):
                futures.append(self.shards[s].contains_and_insert.remote(hashes[idx]))
                index_lists.append(idx)
        for idx, mask in zip(index_lists, ray.get(futures)):
            out[idx] = mask
        return out

    def insert(self, hashes: np.ndarray) -> None:
        self.filter_new(hashes)

    def size(self) -> int:
        return int(sum(ray.get([s.size.remote() for s in self.shards])))

    def checkpoint(self, directory: str) -> None:
        os.makedirs(directory, exist_ok=True)
        dumps = ray.get([s.dump.remote() for s in self.shards])
        for i, arr in enumerate(dumps):
            tmp = os.path.join(directory, f"shard-{i}.npy.tmp")
            with open(tmp, "wb") as fh:
                np.save(fh, arr)
            os.replace(tmp, os.path.join(directory, f"shard-{i}.npy"))

    def restore(self, directory: str) -> None:
        futures = []
        for i in range(self.num_shards):
            arr = np.load(os.path.join(directory, f"shard-{i}.npy"))
            futures.append(self.shards[i].load.remote(arr))
        ray.get(futures)

    def shutdown(self) -> None:
        for s in self.shards:
            ray.kill(s)
        self.shards = []
