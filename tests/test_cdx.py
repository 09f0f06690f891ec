"""CDX source operators (S4/S5): NDJSON + positional parses vs DuckDB
oracles, timestamp decode, latest-snapshot rollup, and a crawl seeded
from the CDX-derived frontier matching the sequential oracle under the
same seed list."""

import duckdb
import polars as pl
import pytest

from link_profiler_repo_ray.sources import cdx

SF = "/root/testdata/sf0.001"


def _oracle(sql: str):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    return con.execute(sql).pl()


@pytest.mark.usefixtures("ray_session")
class TestCdx:
    def test_cc_parse_matches_oracle(self):
        import __ray_entry__ as e

        got = pl.from_pandas(cdx.cc_cdx_parse(SF).to_pandas())
        want = _oracle(e.oracle_sql()["cc_cdx_parse"])
        cols = sorted(got.columns)
        assert cols == sorted(want.columns)
        assert got.select(cols).sort(cols).equals(want.select(cols).sort(cols))

    def test_timestamp_decode_round_trips(self):
        """YYYYMMDDHHMMSS decode (common_crawl_client.py:181): re-format
        the parsed timestamp and compare to the raw line's field."""
        import json

        lines = cdx.cc_cdx_lines(SF).take_all()
        parsed = cdx.cc_cdx_parse(SF).take(50)
        raw_by_url = {json.loads(l["line"])["url"]: json.loads(l["line"]) for l in lines}
        for row in parsed:
            raw = raw_by_url[row["url"]]
            assert row["fetch_ts"].strftime("%Y%m%d%H%M%S") == raw["timestamp"]
            assert row["status"] == int(raw["status"])
            assert row["length"] == int(raw["length"])

    def test_wayback_latest_matches_oracle(self):
        import __ray_entry__ as e

        got = pl.from_pandas(cdx.wayback_latest_snapshot(SF).to_pandas())
        want = _oracle(e.oracle_sql()["wayback_latest_snapshot"])
        cols = sorted(got.columns)
        assert got.select(cols).sort(cols).equals(want.select(cols).sort(cols))

    def test_seed_frontier_filters_and_dedups(self):
        import __ray_entry__ as e

        got = pl.from_pandas(cdx.cdx_seed_frontier(SF).to_pandas())
        want = _oracle(e.oracle_sql()["cdx_seed_frontier"])
        cols = sorted(got.columns)
        assert got.select(cols).sort(cols).equals(want.select(cols).sort(cols))
        # no redirects, no PDFs, unique urls
        assert got.get_column("url").n_unique() == got.height

    def test_crawl_seeded_from_cdx_matches_oracle(self):
        """End-to-end S4→crawl: seed the engine from the CDX frontier
        and require order/seen equality with the sequential oracle
        under the SAME seed list (the BASELINE determinism contract is
        seed-list-parametric, not tied to the synthetic seeds)."""
        from link_profiler_repo_ray.pipelines.crawl import (
            CrawlConfig,
            oracle_crawl,
            run_crawl,
        )

        seeds_df = pl.from_pandas(cdx.cdx_seed_frontier(SF).to_pandas()).sort("url")
        seeds = [
            {"url": u, "priority": int(p)}
            for u, p in zip(
                seeds_df.get_column("url").head(40).to_list(),
                seeds_df.get_column("priority").head(40).to_list(),
            )
        ]
        cfg = CrawlConfig(num_seen_shards=2, num_fetchers=2, seeds=seeds, max_depth=2)
        res = run_crawl(SF, cfg)
        ora = oracle_crawl(SF, cfg)
        got_order = list(
            zip(res.order.column("url").to_pylist(), res.order.column("depth").to_pylist())
        )
        assert got_order == ora["order"]
        assert set(res.counters["seen_urls"]) == ora["seen"]
