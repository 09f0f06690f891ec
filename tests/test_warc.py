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


def _gz_member(record: bytes) -> bytes:
    import gzip
    import io

    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(record)
    return buf.getvalue()


def _cc_record(warc_type: str, headers: dict, payload: bytes) -> bytes:
    hdr = [b"WARC/1.0", f"WARC-Type: {warc_type}".encode()]
    hdr += [f"{k}: {v}".encode() for k, v in headers.items()]
    hdr.append(b"Content-Length: " + str(len(payload)).encode())
    return b"\r\n".join(hdr) + b"\r\n\r\n" + payload + b"\r\n\r\n"


@pytest.mark.usefixtures("ray_session")
def test_real_cc_segment_shape(tmp_path):
    """A CC-shaped .warc.gz (one gzip member per record; warcinfo +
    request + metadata records interleaved; response payloads carrying
    the verbatim HTTP status line + headers) parses to response rows
    with header-stripped body bytes only — the ADVICE r2 gaps."""
    html = b"<html><body><p>real cc body</p></body></html>"
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=UTF-8\r\n"
        b"X-Crawler-Transfer-Encoding: chunked\r\n\r\n" + html
    )
    records = [
        _cc_record("warcinfo", {"Content-Type": "application/warc-fields"},
                   b"software: testgen\r\n"),
        _cc_record("request",
                   {"WARC-Target-URI": "http://a.example/x",
                    "Content-Type": "application/http; msgtype=request"},
                   b"GET /x HTTP/1.1\r\nHost: a.example\r\n\r\n"),
        _cc_record("response",
                   {"WARC-Target-URI": "http://a.example/x",
                    "WARC-Date": "2024-03-01T00:00:00Z",
                    "WARC-Identified-Content-Language": "en",
                    "Content-Type": "application/http; msgtype=response"},
                   http),
        _cc_record("metadata",
                   {"WARC-Target-URI": "http://a.example/x",
                    "Content-Type": "application/warc-fields"},
                   b"fetchTimeMs: 12\r\n"),
    ]
    seg = tmp_path / "seg-00000.warc.gz"
    seg.write_bytes(b"".join(_gz_member(r) for r in records))

    got = _collect(warc.pages_from_warc(str(tmp_path)))
    assert got.height == 1  # ONLY the response record
    row = got.row(0, named=True)
    assert row["url"] == "http://a.example/x"
    assert row["html"] == html  # HTTP headers stripped, body exact
    assert row["lang"] == "en"
    assert "real cc body" in row["text"]


@pytest.mark.usefixtures("ray_session")
def test_body_starting_with_http_prefix_not_stripped(tmp_path):
    """Envelope stripping keys on the record's Content-Type
    (application/http), never on a payload-prefix sniff — a page whose
    body legitimately begins with 'HTTP/' must round-trip intact."""
    import datetime

    import ray.data as rd

    body = b"HTTP/1.1 is a protocol\r\n\r\nand this article explains it"
    page = {
        "url": "http://h0.example.com/http-article",
        "warc_ts": datetime.datetime(2024, 3, 1),
        "html": body,
        "text": "x",
        "lang": "en",
    }
    out = str(tmp_path / "warc")
    warc.write_warc(rd.from_items([page]), out)
    back = _collect(warc.pages_from_warc(out, extract_text=False))
    assert back.get_column("html").to_list() == [body]
