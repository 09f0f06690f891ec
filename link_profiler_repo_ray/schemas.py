"""Explicit Arrow schemas for every logical table of the engine.

The reference keeps three divergent schema layers (dataclasses, ORM,
ClickHouse DDL — see SURVEY.md §1).  Here there is exactly one layer:
declared ``pyarrow.Schema`` constants.

Reference provenance:
- pages:    BASELINE.json input_hint; Link_Profiler/core/models.py:299-330 (URL)
- frontier: Link_Profiler/queue_system/smart_crawler_queue.py:28-63 (CrawlTask)
- edges:    Link_Profiler/core/models.py:332-380 (Backlink),
            Link_Profiler/database/clickhouse_loader.py:101-125 (backlinks_analytical)
- profiles: Link_Profiler/core/models.py:449-491 (create_link_profile_from_backlinks)
"""

from __future__ import annotations

import pyarrow as pa

# The primary input table: Common-Crawl-style pages.
PAGES = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.large_string()),
        pa.field("lang", pa.string()),
    ]
)

# Engine-internal frontier rows (checkpointed per round).
FRONTIER = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("url_hash", pa.uint64()),
        pa.field("host", pa.string()),
        pa.field("priority", pa.int8()),   # 1=HIGH 5=MEDIUM 10=LOW
        pa.field("depth", pa.int16()),
        pa.field("retries", pa.int8()),
    ]
)

# Backlink graph edges (primary crawl output).
EDGES = pa.schema(
    [
        pa.field("source_url", pa.string()),
        pa.field("target_url", pa.string()),
        pa.field("source_host", pa.string()),
        pa.field("target_host", pa.string()),
        pa.field("anchor_text", pa.string()),
        pa.field("link_type", pa.string()),  # dofollow/nofollow/sponsored/ugc/canonical/redirect
        pa.field("rel_attributes", pa.list_(pa.string())),
        pa.field("context_text", pa.string()),
        pa.field("crawl_ts", pa.timestamp("us")),
    ]
)

# Per-target link profile aggregate.
PROFILES = pa.schema(
    [
        pa.field("target_url", pa.string()),
        pa.field("total_backlinks", pa.int64()),
        pa.field("unique_referring_domains", pa.int64()),
        pa.field("dofollow_backlinks", pa.int64()),
        pa.field("nofollow_backlinks", pa.int64()),
        pa.field("sponsored_backlinks", pa.int64()),
        pa.field("ugc_backlinks", pa.int64()),
    ]
)

PRIORITY_HIGH = 1
PRIORITY_MEDIUM = 5
PRIORITY_LOW = 10
