"""WARC source/sink: byte-identical round trip of the page corpus
through standard WARC/1.0 shards, and analytics parity over the
WARC-read dataset."""

import polars as pl
import pyarrow as pa
import pytest
import ray

from link_profiler_repo_ray.pipelines import graph
from link_profiler_repo_ray.sources import warc

SF = "/root/testdata/sf0.001"


def _collect(ds) -> pl.DataFrame:
    return pl.from_arrow(pa.concat_tables([ray.get(r) for r in ds.to_arrow_refs()]))


@pytest.mark.usefixtures("ray_session")
def test_warc_round_trip_byte_identical(tmp_path):
    out = str(tmp_path / "warc")
    warc.write_warc(graph.pages_dataset(SF), out)

    orig = _collect(graph.pages_dataset(SF)).sort("url")
    back = _collect(warc.pages_from_warc(out)).sort("url")
    assert back.height == orig.height
    assert back.get_column("url").to_list() == orig.get_column("url").to_list()
    # the BASELINE invariant THROUGH the container format: html bytes
    # and extracted text identical per url
    assert back.get_column("html").to_list() == orig.get_column("html").to_list()
    assert back.get_column("text").to_list() == orig.get_column("text").to_list()
    assert back.get_column("lang").to_list() == orig.get_column("lang").to_list()
    assert back.get_column("warc_ts").to_list() == orig.get_column("warc_ts").to_list()


@pytest.mark.usefixtures("ray_session")
def test_analytics_over_warc_input(tmp_path):
    """Link extraction over the WARC-read dataset equals extraction
    over the Parquet corpus — a user can point the engine at real CC
    segment files."""
    out = str(tmp_path / "warc")
    warc.write_warc(graph.pages_dataset(SF), out)

    from link_profiler_repo_ray.stages import ExtractLinksStage

    via_warc = _collect(
        warc.pages_from_warc(out, extract_text=False)
        .select_columns(["url", "warc_ts", "html"])
        .map_batches(ExtractLinksStage(), batch_format="pyarrow", zero_copy_batch=True)
    )
    via_parquet = _collect(graph.edges_dataset(SF))
    cols = ["source_url", "target_url", "anchor_text", "link_type"]
    assert via_warc.select(cols).sort(cols).equals(via_parquet.select(cols).sort(cols))
