"""Deterministic MRL quantile summary: rank-error bound, merge by
concatenation, and the distributed value_quantiles_sketch pipeline
against exact per-type ranks."""

import numpy as np
import polars as pl
import pytest

from link_profiler_repo_ray.functions.sketches import (
    stride_summary,
    weighted_quantile,
)

SF = "/root/testdata/sf0.001"


def _rank_band(sorted_exact: np.ndarray, v: float) -> tuple[int, int]:
    return (
        int(np.searchsorted(sorted_exact, v, side="left")),
        int(np.searchsorted(sorted_exact, v, side="right")),
    )


def test_stride_summary_rank_error_bound():
    rng = np.random.RandomState(3)
    x = rng.lognormal(0.0, 2.0, 50_000)
    m = 400
    v, w = stride_summary(x, None, m)
    assert len(v) == m and abs(w.sum() - len(x)) < 1e-6
    xs = np.sort(x)
    for q in (0.01, 0.25, 0.5, 0.9, 0.99):
        est = weighted_quantile(v, w, np.array([q]))[0]
        lo, hi = _rank_band(xs, est)
        target = q * len(x)
        # one compaction pass + selection: error ≤ 2N/m
        assert lo - 2 * len(x) / m <= target <= hi + 2 * len(x) / m


def test_stride_summary_merge_by_concat():
    rng = np.random.RandomState(5)
    parts = [rng.normal(i, 1.0, 7000) for i in range(8)]
    m = 500
    vs, ws = zip(*(stride_summary(p, None, m) for p in parts))
    v, w = np.concatenate(vs), np.concatenate(ws)
    allx = np.sort(np.concatenate(parts))
    n = len(allx)
    for q in (0.1, 0.5, 0.9):
        est = weighted_quantile(v, w, np.array([q]))[0]
        lo, hi = _rank_band(allx, est)
        # per-part errors add: ≤ sum(n_p/m) + selection ≤ 2n/m
        assert lo - 2 * n / m <= q * n <= hi + 2 * n / m
    # deterministic: identical inputs → identical summaries
    v2, w2 = stride_summary(parts[0], None, m)
    assert np.array_equal(vs[0], v2) and np.array_equal(ws[0], w2)


@pytest.mark.usefixtures("ray_session")
def test_value_quantiles_sketch_vs_exact():
    from link_profiler_repo_ray.pipelines.relational import value_quantiles_sketch

    eps = 0.01
    rows = value_quantiles_sketch(SF, eps=eps).take_all()
    assert rows, "no output"
    exact = pl.read_parquet(f"{SF}/events.parquet", columns=["event_type", "value"])
    by_type = {
        etype: np.sort(g["value"].to_numpy().astype(np.float64))
        for (etype,), g in exact.group_by("event_type")
    }
    assert {r["event_type"] for r in rows} == set(by_type)
    for r in rows:
        xs = by_type[r["event_type"]]
        n = len(xs)
        assert r["n_events"] == n
        lo, hi = _rank_band(xs, r["est_value"])
        assert lo - eps * n <= r["q"] * n <= hi + eps * n, (r, lo, hi, n)
    # deterministic across runs
    rows2 = value_quantiles_sketch(SF, eps=eps).take_all()
    assert rows == rows2
