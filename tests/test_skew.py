"""Hub-key skew bounding: the combine stage IS the salt.

BASELINE's north star requires explicit skew handling for the
(source_host, target_host) groupby.  ``ops.hash_aggregate`` /
``hash_group_apply(pre=...)`` bound reducer input per hot key to one
partial row per combine batch — these tests pin that property on a
deliberately skewed table (one key holding 90% of rows) and on the
synthetic corpus's real hub host (h0 owns every d%37==0 page).
"""

import numpy as np
import polars as pl
import pyarrow as pa
import pytest
import ray
import ray.data as rd

from link_profiler_repo_ray import ops

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_combine_stage_bounds_hot_key_fanin():
    """A 90%-hot key must reach the reduce side as O(#combine batches)
    partial rows, never O(rows)."""
    n = 200_000
    keys = np.where(np.arange(n) % 10 < 9, "hub", None)
    keys = [k if k is not None else f"k{i % 997}" for i, k in enumerate(keys)]
    t = pa.table({"k": pa.array(keys), "v": pa.array(np.ones(n, dtype=np.int64))})
    ds = rd.from_arrow(t)

    def counting_merge(df: pl.DataFrame) -> pl.DataFrame:
        # the fn runs remotely — report the per-partition hub fan-in
        # (number of partial rows received for the hot key) as data
        hub_rows = df.filter(pl.col("k") == "hub").height
        return df.group_by("k").agg(pl.col("v").sum()).with_columns(
            pl.lit(hub_rows).cast(pl.Int64).alias("hub_fanin")
        )

    out = ops.hash_group_apply(
        ds,
        ["k"],
        counting_merge,
        pre=lambda df: df.group_by("k").agg(pl.col("v").sum()),
        batch_size=8192,
    )
    res = pl.from_arrow(pa.concat_tables([ray.get(r) for r in out.to_arrow_refs()]))
    # correctness: the hot key's total survived the two-level plan
    assert res.filter(pl.col("k") == "hub").get_column("v")[0] == 180_000
    # skew bound: the reduce partition saw at most one hub partial per
    # combine batch (200k rows / 8192 ≈ 25 batches), not 180k rows
    hub_fanin = res.filter(pl.col("k") == "hub").get_column("hub_fanin")[0]
    assert 0 < hub_fanin <= 32, hub_fanin


@pytest.mark.usefixtures("ray_session")
def test_host_graph_hub_host_correct():
    """The corpus hub host (h0 absorbs every d%37==0 page) aggregates
    correctly through the salted plan: totals equal a direct polars
    groupby of the raw edges."""
    from link_profiler_repo_ray.pipelines import graph

    edges = graph.edges_dataset(SF)
    raw = pl.from_arrow(
        pa.concat_tables([ray.get(r) for r in edges.to_arrow_refs()])
    )
    want = (
        raw.group_by(["source_host", "target_host"])
        .agg(pl.len().cast(pl.Int64).alias("n_links"))
        .sort(["source_host", "target_host"])
    )
    got = (
        pl.from_arrow(pa.concat_tables(
            [ray.get(r) for r in graph.host_graph(SF).to_arrow_refs()]
        ))
        .sort(["source_host", "target_host"])
    )
    assert got.equals(want)
    # and the hub is genuinely hot (sanity that this test means something)
    hub_share = (
        raw.filter(pl.col("target_host") == "h0.example.com").height / raw.height
    )
    assert hub_share > 0.1
