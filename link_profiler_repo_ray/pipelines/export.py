"""Export sinks (S6-S8, S10): partitioned Parquet / CSV / JSONL.

The reference's export paths (utils/data_exporter.py:22-140 CSV/Excel,
crawl_service.py:454-553 JSONL debug channel, the Postgres/ClickHouse
bulk writers) all map to Ray Data's file sinks.  Outputs are
directories of part files — resumable, parallel-writable — never one
giant file.
"""

from __future__ import annotations

import ray.data as rd

__all__ = ["write_parquet", "write_csv", "write_jsonl"]


def write_parquet(ds: rd.Dataset, path: str, **kwargs) -> str:
    ds.write_parquet(path, **kwargs)
    return path


def write_csv(ds: rd.Dataset, path: str, **kwargs) -> str:
    """CSV export (data_exporter.py:22-76)."""
    ds.write_csv(path, **kwargs)
    return path


def write_jsonl(ds: rd.Dataset, path: str, **kwargs) -> str:
    """Newline-delimited JSON (the crawl debug channel, S10)."""
    ds.write_json(path, **kwargs)
    return path
