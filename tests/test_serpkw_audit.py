"""SERP analysis / keyword research / AI scoring / technical audit
(round-4 additions; reference services/serp_service.py,
services/keyword_service.py, competitive_analysis_service.py:55-106,
services/ai_service.py:207-295, crawlers/technical_auditor.py).

Value-hash parity vs DuckDB is covered for all five queries by
tests/test_queries_oracle.py; these tests assert the semantic
invariants the hashes can't express."""

import glob
import os

import pyarrow.parquet as pq
import pytest

from link_profiler_repo_ray.pipelines import audit
from link_profiler_repo_ray.sources import serpkw

SF = "/root/testdata/sf0.001"


def _pl(ds):
    import polars as pl

    return pl.from_pandas(ds.to_pandas())


@pytest.mark.usefixtures("ray_session")
class TestSerpKeyword:
    def test_serp_urls_distinct_within_snapshot(self):
        serp = _pl(serpkw.serp_results(SF))
        # one SERP page never lists the same url twice
        grp = serp.group_by(["keyword", "crawl_ts", "result_url"]).len()
        assert (grp.get_column("len") == 1).all()

    def test_rank_latest_is_latest(self):
        serp = _pl(serpkw.serp_results(SF))
        latest = _pl(serpkw.serp_rank_latest(SF))
        # every (keyword, url) key appears exactly once, with the rank
        # of its max-ts snapshot row
        joined = latest.join(
            serp.sort("crawl_ts").group_by(["keyword", "result_url"], maintain_order=True).last(),
            on=["keyword", "result_url"],
        )
        assert joined.height == latest.height
        assert (joined.get_column("latest_rank") == joined.get_column("rank")).all()

    def test_keyword_gap_non_degenerate_and_sound(self):
        import polars as pl

        gap = _pl(serpkw.keyword_gap(SF))
        assert gap.height > 0  # the top-3 tightening keeps the gap meaningful
        serp = _pl(serpkw.serp_results(SF))
        top3 = serp.filter(pl.col("rank") <= 3)
        primary_kws = set(
            top3.filter(pl.col("result_host") == serpkw.DEFAULT_PRIMARY)
            .get_column("keyword")
            .to_list()
        )
        for host, kw in gap.iter_rows():
            assert kw not in primary_kws
            assert host in serpkw.DEFAULT_COMPETITORS
            comp_kws = set(
                top3.filter(pl.col("result_host") == host).get_column("keyword").to_list()
            )
            assert kw in comp_kws


@pytest.mark.usefixtures("ray_session")
class TestAIScoring:
    def test_labels_and_score_range(self):
        df = audit.ai_content_scores(SF).to_pandas()
        assert len(df) > 0
        assert df["ai_quality_score"].between(0, 100).all()
        assert set(df["ai_classification"]) <= {
            "high_quality", "low_quality", "spam", "irrelevant",
        }
        assert set(df["ai_sentiment"]) <= {"negative", "neutral", "positive"}

    def test_crawl_wires_ai_stage(self, tmp_path):
        """T10 in the crawl loop: CrawlConfig.ai_scoring adds the model
        columns to the persisted pages, scored on the extracted text
        (crawl_service.py:560-575's fetch→score→persist sequence)."""
        from link_profiler_repo_ray.pipelines.crawl import CrawlConfig, run_crawl
        from link_profiler_repo_ray.stages import AIScoreStage

        out = str(tmp_path / "out")
        cfg = CrawlConfig(
            num_seen_shards=2, num_fetchers=2, max_pages=40,
            output_dir=out, ai_scoring=True, collect_edges=False,
        )
        run_crawl(SF, cfg)
        parts = sorted(glob.glob(os.path.join(out, "pages", "*.parquet")))
        assert parts
        pages = pq.read_table(parts[0])
        for col in ("ai_quality_score", "ai_classification", "ai_sentiment", "ai_topic"):
            assert col in pages.schema.names
        # scores match a fresh stage applied to the same rows
        expected = AIScoreStage()(pages.select(["url", "text"]))
        assert (
            pages.column("ai_quality_score").to_pylist()
            == expected.column("ai_quality_score").to_pylist()
        )


@pytest.mark.usefixtures("ray_session")
class TestTechnicalAudit:
    def test_scores_bounded_and_feature_driven(self):
        df = audit.technical_audit(SF).to_pandas()
        assert len(df) > 0
        for c in ("performance_score", "accessibility_score", "best_practices_score"):
            assert df[c].between(0, 100).all(), c
        # the audit reads REAL page features: viewport pages (doc%3==0)
        # must outscore non-viewport pages on accessibility
        assert df["accessibility_score"].nunique() == 2
        assert sorted(df["accessibility_score"].unique()) == [75, 100]
