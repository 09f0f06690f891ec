"""Auxiliary operators: validators, circuit breaker, export sinks,

top-k anchor maps."""

import glob
import os

import pytest

from link_profiler_repo_ray.functions.validators import (
    is_domain_allowed,
    is_valid_email,
    is_valid_url,
)
from link_profiler_repo_ray.state.breaker import CLOSED, HALF_OPEN, OPEN, CircuitBreaker

SF = "/root/testdata/sf0.001"


class TestValidators:
    def test_url(self):
        assert is_valid_url("https://a.com/x")
        assert not is_valid_url("not a url")
        assert not is_valid_url("/relative/only")

    def test_email(self):
        assert is_valid_email("a.b+c@example.co.uk")
        assert not is_valid_email("no-at-sign")
        assert not is_valid_email("x@no-tld")

    def test_domain_allowlist(self):
        assert is_domain_allowed("https://x.com/", set())  # empty = allow all
        assert is_domain_allowed("https://sub.x.com/", {"x.com"})
        assert not is_domain_allowed("https://y.com/", {"x.com"})


class TestCircuitBreaker:
    def test_opens_after_threshold(self):
        cb = CircuitBreaker(failure_threshold=3, recovery_rounds=10, close_threshold=2)
        for r in range(3):
            assert cb.allow("h", r)
            cb.record("h", False, r)
        assert cb.state_of("h") == OPEN
        assert not cb.allow("h", 3)

    def test_half_open_and_close(self):
        cb = CircuitBreaker(failure_threshold=2, recovery_rounds=5, close_threshold=2)
        cb.record("h", False, 0)
        cb.record("h", False, 0)
        assert cb.state_of("h") == OPEN
        assert cb.allow("h", 5)  # recovery elapsed → half-open probe
        assert cb.state_of("h") == HALF_OPEN
        cb.record("h", True, 5)
        cb.record("h", True, 6)
        assert cb.state_of("h") == CLOSED

    def test_half_open_failure_reopens(self):
        cb = CircuitBreaker(failure_threshold=2, recovery_rounds=5)
        cb.record("h", False, 0)
        cb.record("h", False, 0)
        cb.allow("h", 5)
        cb.record("h", False, 5)
        assert cb.state_of("h") == OPEN
        assert not cb.allow("h", 6)


@pytest.mark.usefixtures("ray_session")
class TestExportSinks:
    def test_csv_roundtrip(self, tmp_path):
        import ray.data as rd

        from link_profiler_repo_ray.pipelines.export import write_csv

        ds = rd.from_items([{"a": i, "b": f"s{i}"} for i in range(10)])
        out = write_csv(ds, str(tmp_path / "csv"))
        import polars as pl

        back = pl.concat([pl.read_csv(f) for f in glob.glob(os.path.join(out, "*"))])
        assert back.height == 10 and set(back.columns) == {"a", "b"}

    def test_jsonl_roundtrip(self, tmp_path):
        import json

        import ray.data as rd

        from link_profiler_repo_ray.pipelines.export import write_jsonl

        ds = rd.from_items([{"a": i} for i in range(7)])
        out = write_jsonl(ds, str(tmp_path / "jsonl"))
        rows = []
        for f in glob.glob(os.path.join(out, "*.json")):
            with open(f) as fh:
                rows.extend(json.loads(line) for line in fh if line.strip())
        assert sorted(r["a"] for r in rows) == list(range(7))


@pytest.mark.usefixtures("ray_session")
def test_top_anchor_profiles_matches_pandas():
    from link_profiler_repo_ray.pipelines import graph

    out = graph.top_anchor_profiles(SF, k=3).to_pandas()
    edges = graph.edges_dataset(SF).to_pandas()
    some_target = edges["target_url"].value_counts().index[0]
    row = out[out["target_url"] == some_target].iloc[0]
    exp = (
        edges[edges["target_url"] == some_target]["anchor_text"]
        .value_counts()
        .head(3)
    )
    got = dict(zip(row["top_anchor_text_keys"], row["top_anchor_text_counts"]))
    assert got == dict(exp)


@pytest.mark.usefixtures("ray_session")
def test_expired_domain_finder_limit_and_threshold():
    import polars as pl
    import pyarrow as pa
    import ray as _ray

    from link_profiler_repo_ray.pipelines import research

    sf = "/root/testdata/sf0.001"
    full = pl.from_arrow(
        pa.concat_tables(
            [_ray.get(r) for r in research.expired_domain_finder(sf, min_value_score=0).to_arrow_refs()],
            promote_options="permissive",
        )
    )
    assert full.height > 0
    # availability predicate: host_id ≡ 3 (mod 4)
    hids = full["host"].str.extract(r"^h(\d+)\.", 1).cast(pl.Int64)
    assert ((hids * 13 + 5) % 4 == 0).all()
    top2 = pl.from_arrow(
        pa.concat_tables(
            [_ray.get(r) for r in research.expired_domain_finder(sf, min_value_score=0, limit=2).to_arrow_refs()],
            promote_options="permissive",
        )
    )
    want = full.sort(["value_score", "host"], descending=[True, False]).head(2)
    assert top2.sort(["value_score", "host"], descending=[True, False]).equals(want)
