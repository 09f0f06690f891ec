"""Export sinks (S6-S8, S10): partitioned Parquet / CSV / JSONL / Excel.

The reference's export paths (utils/data_exporter.py:22-140 CSV/Excel,
crawl_service.py:454-553 JSONL debug channel, the Postgres/ClickHouse
bulk writers) all map to Ray Data's file sinks.  Outputs are
directories of part files — resumable, parallel-writable — never one
giant file.  Excel is the one driver-side sink (a workbook is a single
small file for humans, data_exporter.py:78-140); openpyxl isn't in
this container, so ``write_excel`` emits a minimal standards-compliant
.xlsx (a zip of SpreadsheetML parts with inline strings) directly.
"""

from __future__ import annotations

import ray.data as rd

__all__ = ["write_parquet", "write_csv", "write_jsonl", "write_excel"]


def write_parquet(ds: rd.Dataset, path: str, **kwargs) -> str:
    ds.write_parquet(path, **kwargs)
    return path


def write_csv(ds: rd.Dataset, path: str, **kwargs) -> str:
    """CSV export (data_exporter.py:22-76)."""
    ds.write_csv(path, **kwargs)
    return path


def write_jsonl(ds: rd.Dataset, path: str, **kwargs) -> str:
    """Newline-delimited JSON (the crawl debug channel, S10)."""
    ds.write_json(path, **kwargs)
    return path


_XLSX_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
    "</Types>"
)
_XLSX_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
    "</Relationships>"
)
_XLSX_WORKBOOK = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
    'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
    '<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>'
)
_XLSX_WB_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
    "</Relationships>"
)


def write_excel(table, path: str, max_rows: int = 1_048_575) -> str:
    """Single-workbook Excel export (S8, data_exporter.py:78-140).

    ``table`` is a small driver-side pyarrow Table (profiles, top-k
    results, report summaries — the reference's Excel use cases) or a
    Dataset whose result fits a worksheet; numbers are written as
    native cells, everything else as inline strings.
    """
    import zipfile
    from xml.sax.saxutils import escape

    import pyarrow as pa
    import ray.data as rd_mod

    if isinstance(table, rd_mod.Dataset):
        table = pa.Table.from_pandas(table.to_pandas())
    if table.num_rows > max_rows:
        raise ValueError(f"worksheet limit is {max_rows} rows, got {table.num_rows}")

    cols = table.column_names
    rows_xml = ["<row r=\"1\">"]
    for name in cols:
        rows_xml.append(f'<c t="inlineStr"><is><t>{escape(str(name))}</t></is></c>')
    rows_xml.append("</row>")
    data = [table.column(c).to_pylist() for c in cols]
    for r in range(table.num_rows):
        rows_xml.append(f'<row r="{r + 2}">')
        for c in range(len(cols)):
            v = data[c][r]
            if v is None:
                rows_xml.append("<c/>")
            elif isinstance(v, bool):
                rows_xml.append(f'<c t="b"><v>{int(v)}</v></c>')
            elif isinstance(v, (int, float)):
                rows_xml.append(f"<c><v>{v}</v></c>")
            else:
                rows_xml.append(f'<c t="inlineStr"><is><t>{escape(str(v))}</t></is></c>')
        rows_xml.append("</row>")
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        "<sheetData>" + "".join(rows_xml) + "</sheetData></worksheet>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _XLSX_CONTENT_TYPES)
        z.writestr("_rels/.rels", _XLSX_RELS)
        z.writestr("xl/workbook.xml", _XLSX_WORKBOOK)
        z.writestr("xl/_rels/workbook.xml.rels", _XLSX_WB_RELS)
        z.writestr("xl/worksheets/sheet1.xml", sheet)
    return path
