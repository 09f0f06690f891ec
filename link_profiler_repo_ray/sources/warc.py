"""WARC source/sink: the container format Common Crawl actually ships.

BASELINE's input is a "Common-Crawl-style Parquet table"; real Common
Crawl arrives as WARC/1.0 files (ISO 28500) of response records.  This
module writes the synthetic page corpus out as standard WARC shards
and reads WARC shards back into the engine's PAGES shape — so a user
can point the pipeline at actual CC segment files.

Record layout handled (the response-record subset CC uses; records
are written as WARC/1.1 because WARC-Date carries fractional seconds,
which ISO 28500 only legalized in 1.1 — the reader accepts both):

    WARC/1.1\\r\\n
    WARC-Type: response\\r\\n
    WARC-Target-URI: <url>\\r\\n
    WARC-Date: <ISO8601>\\r\\n
    Content-Length: <n>\\r\\n
    \\r\\n
    <n payload bytes>\\r\\n\\r\\n

Parsing is a single pass over the shard bytes inside ``map_batches``
(one task per WARC file — WARC is not splittable without an index,
which is also how CC segment files are consumed); the round-trip
(pages → WARC → pages) is byte-identical per URL and pytest-pinned.

Real CC segment files are also accepted (pytest-pinned against a
synthetic CC-shaped fixture): ``.warc.gz`` with one gzip member per
record, warcinfo/request/metadata records filtered out, and the
``application/http; msgtype=response`` status-line + header block
stripped from payloads so ``html`` holds body bytes only.  Chunked
transfer-encoding inside stored payloads is NOT decoded (modern CC
stores de-chunked bodies).
"""

from __future__ import annotations

import glob
import os
from datetime import datetime

import pyarrow as pa
import ray.data as rd

__all__ = ["write_warc", "pages_from_warc"]

_CRLF = b"\r\n"


def write_warc(pages: rd.Dataset, out_dir: str) -> str:
    """Serialize a PAGES-shaped Dataset to WARC/1.1 response shards.

    One ``.warc`` file per output task (parallel, resumable).  ``lang``
    rides in a ``WARC-Identified-Content-Language`` header (the field
    CC's CDX derives it from); ``warc_ts`` becomes ``WARC-Date``.
    """
    os.makedirs(out_dir, exist_ok=True)

    def to_records(batch: pa.Table) -> pa.Table:
        out = []
        for url, ts, html, lang in zip(
            batch.column("url").to_pylist(),
            batch.column("warc_ts").to_pylist(),
            batch.column("html").to_pylist(),
            batch.column("lang").to_pylist(),
        ):
            payload = bytes(html or b"")
            # WARC/1.1-style fractional seconds: the schema is
            # timestamp(us) and the round trip must be exact
            date = (ts or datetime(1970, 1, 1)).strftime("%Y-%m-%dT%H:%M:%S.%fZ")
            hdr = (
                b"WARC/1.1" + _CRLF
                + b"WARC-Type: response" + _CRLF
                + b"WARC-Target-URI: " + url.encode() + _CRLF
                + b"WARC-Date: " + date.encode() + _CRLF
                + (
                    b"WARC-Identified-Content-Language: " + lang.encode() + _CRLF
                    if lang
                    else b""
                )
                + b"Content-Length: " + str(len(payload)).encode() + _CRLF
                + _CRLF
            )
            out.append(hdr + payload + _CRLF + _CRLF)
        return pa.table({"record": pa.array(out, pa.binary())})

    records = pages.map_batches(to_records, batch_format="pyarrow", zero_copy_batch=True)

    # one .warc file per block, written by the tasks (actor-side I/O)
    def write_shard(batch: pa.Table) -> pa.Table:
        import uuid

        blob = b"".join(batch.column("record").to_pylist())
        name = os.path.join(out_dir, f"part-{uuid.uuid4().hex[:12]}.warc")
        with open(name + ".tmp", "wb") as fh:
            fh.write(blob)
        os.replace(name + ".tmp", name)
        return pa.table({"path": pa.array([name]), "n_bytes": pa.array([len(blob)])})

    records.map_batches(
        write_shard, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).materialize()
    return out_dir


def _parse_warc_bytes(blob: bytes) -> dict[str, list]:
    """Single-pass parse of one WARC shard's bytes → column lists.

    Handles both this module's own output and real Common Crawl
    segment content (ADVICE round 2): non-``response`` records
    (warcinfo / request / metadata / revisit) are skipped, and when a
    response payload is an ``application/http`` capture — the status
    line + header block CC stores verbatim — the HTTP headers are
    stripped so ``html`` is the body bytes only.
    """
    urls, tss, htmls, langs = [], [], [], []
    pos = 0
    n = len(blob)
    while pos < n:
        hdr_end = blob.find(_CRLF + _CRLF, pos)
        if hdr_end < 0:
            break
        header = blob[pos:hdr_end].decode("utf-8", errors="replace")
        fields: dict[str, str] = {}
        for line in header.split("\r\n")[1:]:  # skip the WARC/1.0 line
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        clen = int(fields.get("content-length", "0"))
        body_start = hdr_end + 4
        payload = blob[body_start : body_start + clen]
        pos = body_start + clen + 4  # skip payload + record-separator CRLFCRLF
        if fields.get("warc-type", "response").lower() != "response":
            continue
        # strip the stored HTTP envelope ONLY when the record declares
        # it (CC sets Content-Type: application/http; msgtype=response).
        # A payload-prefix sniff would corrupt a legitimate page body
        # that merely begins with "HTTP/" (this module's own writer
        # never embeds an envelope).
        if fields.get("content-type", "").startswith("application/http"):
            http_end = payload.find(_CRLF + _CRLF)
            if http_end >= 0:
                payload = payload[http_end + 4 :]
        urls.append(fields.get("warc-target-uri", ""))
        date = fields.get("warc-date")
        if date:
            fmt = "%Y-%m-%dT%H:%M:%S.%fZ" if "." in date else "%Y-%m-%dT%H:%M:%SZ"
            tss.append(datetime.strptime(date, fmt))
        else:
            tss.append(None)
        htmls.append(payload)
        langs.append(fields.get("warc-identified-content-language"))
    return {"url": urls, "warc_ts": tss, "html": htmls, "lang": langs}


def pages_from_warc(warc_dir: str, extract_text: bool = True) -> rd.Dataset:
    """Read WARC shards back into the engine's PAGES shape.

    One read task per file (WARC shards aren't splittable without a
    CDX index, matching how Common Crawl segments are consumed); the
    ``text`` column is re-derived with the byte-identical extractor so
    downstream pipelines see the exact BASELINE schema.
    """
    files = sorted(
        glob.glob(os.path.join(warc_dir, "*.warc"))
        + glob.glob(os.path.join(warc_dir, "*.warc.gz"))
    )
    ds = rd.from_items([{"path": f} for f in files])

    def parse_file(batch: pa.Table) -> pa.Table:
        import gzip

        from ..functions.htmlx import extract_text_batch

        cols = {"url": [], "warc_ts": [], "html": [], "lang": []}
        for path in batch.column("path").to_pylist():
            with open(path, "rb") as fh:
                raw = fh.read()
            if path.endswith(".gz"):
                # CC ships one gzip MEMBER per record, concatenated;
                # gzip.decompress walks all members of the stream
                raw = gzip.decompress(raw)
            parsed = _parse_warc_bytes(raw)
            for k in cols:
                cols[k].extend(parsed[k])
        texts = (
            extract_text_batch(
                [(h or b"").decode("utf-8", errors="replace") for h in cols["html"]]
            )
            if extract_text
            else [None] * len(cols["url"])
        )
        return pa.table(
            {
                "url": pa.array(cols["url"], pa.string()),
                "warc_ts": pa.array(cols["warc_ts"], pa.timestamp("us")),
                "html": pa.array(cols["html"], pa.binary()),
                "text": pa.array(texts, pa.large_string()),
                "lang": pa.array(cols["lang"], pa.string()),
            }
        )

    return ds.map_batches(
        parse_file, batch_format="pyarrow", zero_copy_batch=True, batch_size=1
    )
