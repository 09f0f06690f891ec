"""S8 Excel export (minimal SpreadsheetML), O3/A1 row-form top-k vs
DuckDB, and the CLI's generic query dispatch (job-type registry)."""

import json
import zipfile
import xml.etree.ElementTree as ET

import duckdb
import polars as pl
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"
_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"


def _read_xlsx(path):
    """Parse the worksheet back without openpyxl."""
    with zipfile.ZipFile(path) as z:
        names = set(z.namelist())
        assert "[Content_Types].xml" in names and "xl/workbook.xml" in names
        sheet = ET.fromstring(z.read("xl/worksheets/sheet1.xml"))
    rows = []
    for row in sheet.iter(f"{_NS}row"):
        vals = []
        for c in row.iter(f"{_NS}c"):
            t = c.find(f"{_NS}is/{_NS}t")
            v = c.find(f"{_NS}v")
            if t is not None:
                vals.append(t.text)
            elif v is not None:
                vals.append(v.text)
            else:
                vals.append(None)
        rows.append(vals)
    return rows


def test_excel_round_trip(tmp_path):
    from link_profiler_repo_ray.pipelines.export import write_excel

    t = pa.table(
        {
            "host": ["a.com", "b.com", None],
            "score": [1.5, 2, 3],
            "valuable": [True, False, True],
        }
    )
    path = str(tmp_path / "out.xlsx")
    write_excel(t, path)
    rows = _read_xlsx(path)
    assert rows[0] == ["host", "score", "valuable"]
    assert rows[1] == ["a.com", "1.5", "1"]
    assert rows[3][0] is None  # null cell preserved as empty


def test_excel_escapes_markup(tmp_path):
    from link_profiler_repo_ray.pipelines.export import write_excel

    t = pa.table({"anchor": ['<a href="x">&amp;</a>']})
    path = str(tmp_path / "esc.xlsx")
    write_excel(t, path)
    rows = _read_xlsx(path)
    assert rows[1] == ['<a href="x">&amp;</a>']


@pytest.mark.usefixtures("ray_session")
def test_top_anchors_referrers_matches_oracle():
    import __ray_entry__ as e
    from link_profiler_repo_ray.pipelines import graph

    got = pl.from_pandas(graph.top_anchors_referrers(SF).to_pandas())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    want = con.execute(e.oracle_sql()["top_anchors_referrers"]).pl()
    cols = sorted(got.columns)
    assert cols == sorted(want.columns)
    assert got.select(cols).sort(cols).equals(want.select(cols).sort(cols))
    # row-form and map-form agree on the anchor top-10 of a sample target
    maps = pl.from_pandas(graph.top_anchor_profiles(SF).to_pandas())
    sample = maps.sort("target_url").row(0, named=True)
    rows = got.filter(
        (pl.col("target_url") == sample["target_url"]) & (pl.col("kind") == "anchor")
    ).sort("rank")
    assert rows.get_column("item").to_list() == list(sample["top_anchor_text_keys"])


@pytest.mark.usefixtures("ray_session")
def test_cli_query_dispatch(tmp_path, capsys):
    from link_profiler_repo_ray.cli import main

    # registry listing
    assert main(["query", "--name", "list"]) == 0
    names = json.loads(capsys.readouterr().out.strip())
    assert "link_profiles" in names and "cc_cdx_parse" in names

    # run one query to excel through the CLI surface
    out = str(tmp_path / "tv.xlsx")
    rc = main(
        ["query", "--name", "top_valuable_domains", "--sf-dir", SF, "--out", out, "--fmt", "excel"]
    )
    assert rc == 0
    rows = _read_xlsx(out)
    assert rows[0] == ["target_host", "value_score"]
    assert len(rows) == 4  # header + top-3

    # unknown name → error payload, nonzero exit
    assert main(["query", "--name", "nope"]) == 2
    err = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "unknown query" in err["error"]


def test_pdf_report_structure(tmp_path):
    """S9: hand-rolled PDF 1.4 — header, xref offsets that actually
    point at their objects, and the report text present in the
    uncompressed content streams."""
    import re

    import pyarrow as pa

    from link_profiler_repo_ray.pipelines.export import write_pdf_report

    t = pa.table({"target_host": [f"h{i}.example.com" for i in range(60)],
                  "value_score": list(range(60))})
    path = str(tmp_path / "report.pdf")
    write_pdf_report(t, path, title="Valuable (domains)")
    raw = open(path, "rb").read()
    assert raw.startswith(b"%PDF-1.4")
    assert raw.rstrip().endswith(b"%%EOF")
    # xref offsets point at "N 0 obj"
    xref_at = int(raw.rsplit(b"startxref", 1)[1].split()[0])
    xref = raw[xref_at:].split(b"trailer")[0].decode()
    offsets = [int(l.split()[0]) for l in xref.splitlines()[2:] if l.strip().endswith("n")]
    for i, off in enumerate(offsets, start=1):
        assert raw[off:].startswith(f"{i} 0 obj".encode()), i
    # two pages (64 lines at 50/page) and escaped parens in the title
    assert raw.count(b"/Type /Page ") == 2
    assert rb"(Valuable \(domains\))" in raw
    assert b"(h42.example.com" in raw


@pytest.mark.usefixtures("ray_session")
def test_cli_query_pdf(tmp_path):
    from link_profiler_repo_ray.cli import main

    out = str(tmp_path / "tv.pdf")
    rc = main(["query", "--name", "top_valuable_domains", "--sf-dir", SF, "--out", out, "--fmt", "pdf"])
    assert rc == 0
    raw = open(out, "rb").read()
    assert raw.startswith(b"%PDF-1.4") and b"h0.example.com" in raw
