"""Link-building prospects + outreach rollups (pipelines/prospects.py;
reference services/link_building_service.py:52-205,
core/models.py:765-860).

Value-hash parity vs DuckDB is covered by tests/test_queries_oracle.py
for both queries; these tests assert the semantic invariants the
hashes can't express — in particular strategy 1 (competitor backlink
difference), which is degenerate (empty) on the dense synthetic edge
graph and so needs a planted sparse graph to be exercised at all."""

import pyarrow as pa
import pytest

from link_profiler_repo_ray.pipelines import prospects

SF = "/root/testdata/sf0.001"


def _pl(ds):
    import polars as pl

    return pl.from_pandas(ds.to_pandas())


@pytest.mark.usefixtures("ray_session")
class TestLinkProspects:
    def test_strategy1_planted_graph(self):
        """Hosts linking to a competitor but not the primary surface as
        root-URL prospects; hosts that also hit the primary don't."""
        import ray.data as rd

        # h10 -> h2 only (prospect); h11 -> h2 and h1 (not a prospect);
        # h12 -> h4 only (no competitor link, not a prospect)
        edges = rd.from_arrow(
            pa.table(
                {
                    "source_host": [
                        "h10.example.com",
                        "h11.example.com",
                        "h11.example.com",
                        "h12.example.com",
                    ],
                    "target_host": [
                        "h2.example.com",
                        "h2.example.com",
                        "h1.example.com",
                        "h4.example.com",
                    ],
                }
            )
        )
        out = _pl(prospects.link_prospects(SF, edges=edges))
        s1 = out.filter(out["links_to_competitor"])
        assert s1["host"].to_list() == ["h10.example.com"]
        assert s1["prospect_url"].to_list() == ["https://h10.example.com"]
        # h10: authority (10*37+11)%100 = 81 >= 20, spam (10*71+3)%100 = 13 <= 30
        # score = 81*.5 + 37*.2 - 13*.3 + 10 + 5 (age (10*97+13)%4000=983? no)
        row = s1.row(0, named=True)
        hid = 10
        age = (hid * 97 + 13) % 4000
        expected = (
            ((hid * 37 + 11) % 100) * 0.5
            + ((hid * 53 + 7) % 100) * 0.2
            - ((hid * 71 + 3) % 100) * 0.3
            + 10.0
            + (5.0 if age > 1095 else 0.0)
            + 10.0  # links_to_competitor
        )
        assert row["score"] == pytest.approx(min(100.0, max(0.0, expected)))

    def test_metric_filters_drop_low_authority_and_spam(self):
        out = _pl(prospects.link_prospects(SF))
        assert (out["authority_score"] >= 20).all()
        assert (out["spam_score"] <= 30).all()
        assert out["score"].is_between(0.0, 100.0).all()
        # strategy 2 excludes the primary and competitor hosts
        assert not out["host"].is_in(
            ["h1.example.com", "h2.example.com", "h3.example.com"]
        ).any()

    def test_serp_prospects_distinct_urls(self):
        out = _pl(prospects.link_prospects(SF))
        assert out["prospect_url"].n_unique() == len(out)
        assert (out.filter(out["ranks_for_keyword"])["prospect_url"]
                .str.contains("/doc/").all())

    def test_outreach_counters_consistent(self):
        stats = _pl(prospects.outreach_campaign_stats(SF)).sort("campaign_id")
        pros = _pl(prospects.link_prospects(SF))
        assert stats["campaign_id"].to_list() == sorted(set(stats["campaign_id"]))
        assert stats["total_prospects"].sum() == len(pros)
        # funnel monotonicity per campaign
        assert (stats["contacts_made"] <= stats["total_prospects"]).all()
        assert (stats["replies_received"] <= stats["contacts_made"]).all()
        assert (stats["links_acquired"] <= stats["replies_received"]).all()
