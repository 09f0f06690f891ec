"""Sitemap source: robots Sitemap: extraction, urlset/sitemapindex
round trips through the vectorized parsers, and seeding a crawl from
parsed sitemap entries."""

import polars as pl
import pyarrow as pa
import pytest
import ray

from link_profiler_repo_ray.sources import sitemap

SF = "/root/testdata/sf0.001"


def _collect(ds) -> pl.DataFrame:
    return pl.from_arrow(
        pa.concat_tables(
            [ray.get(r) for r in ds.to_arrow_refs()], promote_options="permissive"
        )
    )


def test_sitemap_urls_from_robots():
    bodies = [
        "User-agent: *\nDisallow: /private\nSitemap: https://a.com/sitemap.xml\n"
        "sitemap: https://a.com/sitemap-news.xml\n",
        "User-agent: *\nAllow: /\n",
        "SITEMAP:   https://b.com/s.xml  \nSitemap:\n",
    ]
    got = sitemap.sitemap_urls_from_robots(bodies)
    assert got == [
        ["https://a.com/sitemap.xml", "https://a.com/sitemap-news.xml"],
        [],
        ["https://b.com/s.xml"],
    ]


@pytest.mark.usefixtures("ray_session")
def test_urlset_round_trip_covers_every_doc():
    docs = pl.read_parquet(f"{SF}/documents.parquet").height
    parsed = _collect(sitemap.sitemap_parse(SF))
    assert parsed.height == docs
    assert parsed["loc"].n_unique() == docs
    assert set(parsed["changefreq"].unique().to_list()) <= {"daily", "weekly"}
    assert parsed["priority"].min() >= 0.0 and parsed["priority"].max() <= 0.9
    # host column consistent with the loc it was parsed from
    assert (
        parsed.filter(~pl.col("loc").str.contains(pl.col("host"), literal=True)).height
        == 0
    )


@pytest.mark.usefixtures("ray_session")
def test_sitemap_index_lists_every_host():
    hosts = _collect(sitemap.host_sitemap_xml(SF))["host"].sort().to_list()
    locs = _collect(
        sitemap.parse_sitemap_index(sitemap.sitemap_index_xml(SF))
    )["loc"].sort().to_list()
    assert locs == [f"https://{h}/sitemap.xml" for h in hosts]


@pytest.mark.usefixtures("ray_session")
def test_crawl_seeded_from_sitemap():
    from link_profiler_repo_ray.pipelines.crawl import CrawlConfig, run_crawl

    seeds_df = _collect(sitemap.sitemap_seed_frontier(SF))
    # high-priority band only, mirroring "seed from the best sitemap hints"
    top = seeds_df.filter(pl.col("priority") == 1).head(20)
    seeds = [{"url": u, "priority": int(p)} for u, p in zip(top["url"], top["priority"])]
    res = run_crawl(SF, CrawlConfig(num_seen_shards=2, num_fetchers=2, max_depth=0, seeds=seeds))
    got = set(res.order.column("url").to_pylist())
    assert got == set(top["url"].to_list())


@pytest.mark.usefixtures("ray_session")
def test_parse_real_world_pretty_printed_sitemap():
    """Real sitemaps are pretty-printed (newlines inside <url>) and
    escape & in query strings — the parser must handle both."""
    import ray.data as rd

    xml = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>https://shop.example.org/p?id=3&amp;ref=home</loc>
    <lastmod>2024-05-01</lastmod>
    <changefreq>daily</changefreq>
    <priority>0.8</priority>
  </url>
  <url>
    <loc>
      https://shop.example.org/about
    </loc>
  </url>
</urlset>"""
    idx = """<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap>
    <loc>https://shop.example.org/sitemap-a.xml</loc>
  </sitemap>
</sitemapindex>"""
    got = _collect(sitemap.parse_urlsets(rd.from_items([{"xml": xml}]))).sort("loc")
    assert got["loc"].to_list() == [
        "https://shop.example.org/about",
        "https://shop.example.org/p?id=3&ref=home",
    ]
    assert got["host"].to_list() == ["shop.example.org"] * 2
    assert got["lastmod"].to_list() == [None, "2024-05-01"]
    assert got["changefreq"].to_list() == [None, "daily"]
    assert got["priority"].to_list() == [None, 0.8]

    locs = _collect(sitemap.parse_sitemap_index(rd.from_items([{"xml": idx}])))
    assert locs["loc"].to_list() == ["https://shop.example.org/sitemap-a.xml"]
