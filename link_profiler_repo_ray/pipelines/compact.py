"""Page-delta compaction — the LSM maintenance pass a long crawl needs.

Every crawl round each fetch actor appends a small page-delta Parquet
file (``pages/part-<fetcher>-<seq>.parquet``).  That is the right
WRITE discipline (no cross-actor coordination, resumable, append-only)
but after a 10^5-round crawl the table is millions of tiny files and
every downstream scan pays per-file open costs; retried/re-run tail
rounds (resume semantics, ``pipelines/crawl.py``) can also leave the
same URL in two deltas.  This pass rewrites the delta log into a
host-sharded, URL-deduplicated, manifest-tracked table:

- shard(url) = first 4 hex chars of md5(host) mod K — the engine-wide
  PORTABLE partitioning convention (dataset_split /
  shard_balance_report), computed once per DISTINCT host per batch,
  so any later job can route a URL to its shard without a lookup;
- ONE exchange keyed shard; inside a shard every URL's rows are
  complete, so latest-wins dedup (min depth, then max status — the
  frontier's min-depth-merge discipline) is a vectorized per-shard
  unique, and each shard writes exactly one consolidated file;
- a ``manifest.json`` (written last, atomic rename) lists every shard
  with row counts and bytes — a re-run that finds a complete manifest
  is a no-op, and a reader can verify a shard landed before trusting
  it.  This mirrors the crawl checkpoint's manifest-last discipline.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os

import polars as pl
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from .. import ops
from ..ops import hash_group_apply

__all__ = ["compact_pages"]


def _shard_of_hosts(hosts: list[str], num_shards: int) -> list[int]:
    cache: dict[str, int] = {}
    out = []
    for h in hosts:
        s = cache.get(h)
        if s is None:
            s = int(hashlib.md5(h.encode()).hexdigest()[:4], 16) % num_shards
            cache[h] = s
        out.append(s)
    return out


def compact_pages(pages_dir: str, dest: str, num_shards: int = 16) -> dict:
    """Compact a crawl's page-delta directory into ``dest``.

    Returns the manifest dict.  Idempotent: a complete existing
    manifest short-circuits (the resume path).
    """
    manifest_path = os.path.join(dest, "manifest.json")
    if os.path.exists(manifest_path):
        with open(manifest_path) as fh:
            manifest = json.load(fh)
        if all(
            os.path.exists(os.path.join(dest, s["path"])) for s in manifest["shards"]
        ):
            manifest["skipped"] = True
            return manifest

    # flat delta dir (output_dir layout) OR a checkpoint root, whose
    # deltas live per-round under round=NNNNN/pages/ — so `cli compact`
    # points straight at a (possibly killed-and-resumed) crawl's
    # checkpoint and compacts its whole delta log, duplicates from
    # re-run tail rounds included
    files = sorted(glob.glob(os.path.join(pages_dir, "*.parquet")))
    if not files:
        files = sorted(glob.glob(os.path.join(pages_dir, "round=*", "pages", "*.parquet")))
    if not files:
        raise FileNotFoundError(f"no page deltas under {pages_dir!r}")
    os.makedirs(dest, exist_ok=True)

    ds = ops.read_parquet(files)

    def add_shard(batch: pa.Table) -> pa.Table:
        from ..functions import canonical as can

        urls = batch.column("url").to_pylist()
        shard = _shard_of_hosts(can.host_of_batch(urls), num_shards)
        return batch.append_column("shard", pa.array(shard, pa.int32()))

    def write_shards(df: pl.DataFrame) -> pl.DataFrame:
        # a hash partition may hold several complete shards — write
        # each to its own file
        outs = []
        for (sid,), sub in df.group_by("shard"):
            sid = int(sid)
            # latest-wins: frontier merges re-discovered URLs at MIN
            # depth, and a retried fetch's final status supersedes
            # earlier ones
            sub = (
                sub.drop("shard")
                .sort(["url", "depth", "status"], descending=[False, False, True])
                .unique(subset=["url"], keep="first", maintain_order=True)
            )
            path = os.path.join(dest, f"shard={sid:04d}.parquet")
            pq.write_table(sub.to_arrow(), path)
            outs.append(
                pl.DataFrame(
                    {
                        "shard": pl.Series([sid], dtype=pl.Int64),
                        "rows": pl.Series([sub.height], dtype=pl.Int64),
                        "bytes": pl.Series([os.path.getsize(path)], dtype=pl.Int64),
                        "path": pl.Series([os.path.basename(path)], dtype=pl.Utf8),
                    }
                )
            )
        return pl.concat(outs)

    rows = hash_group_apply(
        ds.map_batches(add_shard, batch_format="pyarrow", zero_copy_batch=True),
        ["shard"],
        write_shards,
        num_partitions=num_shards,
    ).take_all()  # ≤ num_shards manifest rows — bounded by design

    manifest = {
        "num_shards": num_shards,
        "total_rows": int(sum(r["rows"] for r in rows)),
        "total_bytes": int(sum(r["bytes"] for r in rows)),
        "shards": sorted(
            ({k: r[k] for k in ("shard", "rows", "bytes", "path")} for r in rows),
            key=lambda s: s["shard"],
        ),
    }
    tmp = manifest_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, manifest_path)  # manifest last, atomic
    return manifest


def read_compacted(dest: str, columns: list[str] | None = None) -> rd.Dataset:
    """Scan a compacted table, verifying the manifest first."""
    with open(os.path.join(dest, "manifest.json")) as fh:
        manifest = json.load(fh)
    paths = [os.path.join(dest, s["path"]) for s in manifest["shards"]]
    return ops.read_parquet(paths, columns=columns)
