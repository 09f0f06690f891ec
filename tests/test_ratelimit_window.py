"""T4 adaptive rate limiter (deterministic) + M13 sliding-window
anomaly operator vs its DuckDB window-function oracle."""

import duckdb
import polars as pl
import pytest

from link_profiler_repo_ray.state.ratelimit import AdaptiveRateLimiter

SF = "/root/testdata/sf0.001"


class TestAdaptiveRateLimiter:
    def test_healthy_domain_base_delay(self):
        rl = AdaptiveRateLimiter()
        for _ in range(20):
            rl.record("a.com", True, 0.1)
        assert rl.delay_rounds("a.com") == 1
        assert rl.success_rate("a.com") == 1.0

    def test_failure_backoff_tiers(self):
        rl = AdaptiveRateLimiter()
        for i in range(10):
            rl.record("half.com", i % 2 == 0, 0.1)  # 50% success
        assert rl.delay_rounds("half.com") == 2  # <0.8 → ×2
        for i in range(10):
            rl.record("bad.com", i % 4 == 0, 0.1)  # 25% success
        assert rl.delay_rounds("bad.com") == 4  # <0.5 → ×4

    def test_server_stress_multiplier(self):
        rl = AdaptiveRateLimiter(stress_threshold=1.0)
        for i in range(10):
            rl.record("slow.com", i % 2 == 0, 5.0)  # 50% + slow p95
        # ×2 (rate) × 1.5 (stress) = 3
        assert rl.delay_rounds("slow.com") == 3

    def test_windows_are_bounded(self):
        rl = AdaptiveRateLimiter()
        for _ in range(150):
            rl.record("w.com", False, 0.1)
        for _ in range(100):
            rl.record("w.com", True, 0.1)
        # only the last 100 requests count → all-success again
        assert rl.success_rate("w.com") == 1.0
        assert len(rl.domains["w.com"].response_times) == 50

    def test_state_round_trip_deterministic(self):
        rl = AdaptiveRateLimiter()
        for i in range(30):
            rl.record("x.com", i % 3 != 0, 0.1 * (i % 7))
        clone = AdaptiveRateLimiter()
        clone.load_state(rl.state_rows())
        assert clone.delay_rounds("x.com") == rl.delay_rounds("x.com")
        assert clone.p95_response_time("x.com") == rl.p95_response_time("x.com")


@pytest.mark.usefixtures("ray_session")
def test_anomalous_events_windowed_matches_oracle():
    import __ray_entry__ as e
    from link_profiler_repo_ray.pipelines import research

    got = pl.from_pandas(research.anomalous_events_windowed(SF).to_pandas())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    want = con.execute(e.oracle_sql()["anomalous_events_windowed"]).pl()
    cols = sorted(got.columns)
    assert cols == sorted(want.columns)
    assert got.select(cols).sort(cols).equals(
        want.select(cols).sort(cols).cast({c: got.schema[c] for c in cols})
    )
    assert got.height > 0  # the detector actually fires on this data


def test_stress_tier_reachable_from_base_delay():
    """Review regression: int() truncation made 1 x 1.5 = 1; the
    stress multiplier must round UP (ceil) to actually slow a healthy
    but slow host."""
    rl = AdaptiveRateLimiter(stress_threshold=1.0)
    for _ in range(10):
        rl.record("slowok.com", True, 5.0)  # 100% success, slow p95
    assert rl.delay_rounds("slowok.com") == 2
