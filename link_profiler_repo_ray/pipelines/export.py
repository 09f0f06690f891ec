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

import math

import ray.data as rd

__all__ = ["write_parquet", "write_csv", "write_jsonl", "write_excel", "write_pdf_report"]


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
            elif isinstance(v, int) or (isinstance(v, float) and math.isfinite(v)):
                rows_xml.append(f"<c><v>{v}</v></c>")
            elif isinstance(v, float):
                # NaN/inf are not valid SpreadsheetML numerics — write
                # the repr as an inline string so Excel accepts the book
                rows_xml.append(f'<c t="inlineStr"><is><t>{v!r}</t></is></c>')
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


def _pdf_escape(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def write_pdf_report(table, path: str, title: str = "Link Profile Report") -> str:
    """S9: PDF report generator (services/report_service.py:1-313).

    No PDF library ships in this container, so this emits a minimal
    valid PDF 1.4 by hand: one Courier text page per ~50 rows, an
    uncompressed content stream per page, a correct xref table.  The
    input is a small driver-side table (a link profile, top-k result,
    or crawl summary — the reference's report payloads).
    """
    import pyarrow as pa
    import ray.data as rd_mod

    if isinstance(table, rd_mod.Dataset):
        table = pa.Table.from_pandas(table.to_pandas())

    cols = table.column_names
    data = [table.column(c).to_pylist() for c in cols]
    widths = [
        max(len(str(c)), *(len(str(v)) for v in col)) if col else len(str(c))
        for c, col in zip(cols, data)
    ]

    def fmt_row(vals):
        return "  ".join(str(v if v is not None else "").ljust(w) for v, w in zip(vals, widths))

    lines = [title, "", fmt_row(cols), fmt_row(["-" * w for w in widths])]
    for r in range(table.num_rows):
        lines.append(fmt_row([data[c][r] for c in range(len(cols))]))

    rows_per_page = 50
    pages = [lines[i : i + rows_per_page] for i in range(0, len(lines), rows_per_page)] or [[]]

    objects: list[bytes] = []  # 1-indexed PDF objects

    def add(obj: bytes) -> int:
        objects.append(obj)
        return len(objects)

    font_id = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier >>")
    page_ids = []
    kids_placeholder = add(b"")  # pages tree, patched below
    for page_lines in pages:
        tj = "\n".join(f"({_pdf_escape(ln)}) Tj 0 -14 Td" for ln in page_lines)
        stream = f"BT /F1 10 Tf 40 780 Td 14 TL\n{tj}\nET".encode("latin-1", "replace")
        cont_id = add(
            b"<< /Length " + str(len(stream)).encode() + b" >>\nstream\n" + stream + b"\nendstream"
        )
        page_ids.append(
            add(
                (
                    f"<< /Type /Page /Parent {kids_placeholder} 0 R "
                    f"/MediaBox [0 0 612 792] /Contents {cont_id} 0 R "
                    f"/Resources << /Font << /F1 {font_id} 0 R >> >> >>"
                ).encode()
            )
        )
    kids = " ".join(f"{p} 0 R" for p in page_ids)
    objects[kids_placeholder - 1] = (
        f"<< /Type /Pages /Count {len(page_ids)} /Kids [{kids}] >>".encode()
    )
    catalog_id = add(f"<< /Type /Catalog /Pages {kids_placeholder} 0 R >>".encode())

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, obj in enumerate(objects, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + obj + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objects) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objects) + 1} /Root {catalog_id} 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    with open(path, "wb") as fh:
        fh.write(bytes(out))
    return path
