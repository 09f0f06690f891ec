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

__all__ = [
    "write_warc",
    "write_warc_indexed",
    "pages_from_warc",
    "pages_from_cdx_index",
    "surt_key",
]

_CRLF = b"\r\n"


def surt_key(url: str) -> str:
    """SURT urlkey (the CDX sort key): host labels reversed and
    comma-joined, ``)/`` then the path — e.g.
    ``https://h3.example.com/doc/5`` → ``com,example,h3)/doc/5``
    (common_crawl_client.py's index rows carry exactly this form)."""
    rest = url.split("://", 1)[-1]
    host, slash, path = rest.partition("/")
    host = host.lower().split(":", 1)[0]
    return ",".join(reversed(host.split("."))) + ")/" + path


def _record_bytes(url: str, ts, html, lang) -> bytes:
    payload = bytes(html or b"")
    # WARC/1.1-style fractional seconds: the schema is timestamp(us)
    # and the round trip must be exact
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
    return hdr + payload + _CRLF + _CRLF


def write_warc(pages: rd.Dataset, out_dir: str) -> str:
    """Serialize a PAGES-shaped Dataset to WARC/1.1 response shards.

    One ``.warc`` file per output task (parallel, resumable).  ``lang``
    rides in a ``WARC-Identified-Content-Language`` header (the field
    CC's CDX derives it from); ``warc_ts`` becomes ``WARC-Date``.
    """
    os.makedirs(out_dir, exist_ok=True)

    def to_records(batch: pa.Table) -> pa.Table:
        out = [
            _record_bytes(url, ts, html, lang)
            for url, ts, html, lang in zip(
                batch.column("url").to_pylist(),
                batch.column("warc_ts").to_pylist(),
                batch.column("html").to_pylist(),
                batch.column("lang").to_pylist(),
            )
        ]
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


# --- CDX index: the sidecar that makes WARC shards seekable --------------

CDX_SCHEMA = pa.schema(
    [
        ("urlkey", pa.string()),
        ("timestamp", pa.string()),   # YYYYMMDDHHMMSS, the CDX wire form
        ("url", pa.string()),
        ("mime", pa.string()),
        ("status", pa.int64()),
        ("digest", pa.string()),      # sha1 hex of the payload bytes
        ("length", pa.int64()),       # full record length in the shard
        ("offset", pa.int64()),       # record start offset in the shard
        ("filename", pa.string()),
    ]
)


def write_warc_indexed(pages: rd.Dataset, out_dir: str) -> rd.Dataset:
    """WARC shards + the CDX index that makes them random-access.

    Common Crawl distributes WARC segments WITH a CDX index (urlkey →
    filename/offset/length) because WARC itself is not splittable or
    seekable; the reference's CDX reader (common_crawl_client.py)
    consumes exactly these rows.  This writer emits one ``.warc`` shard
    per output task and returns the index Dataset sorted by
    (urlkey, timestamp) — the CDX sort order binary search depends on.
    Offsets are recorded while the shard bytes are joined, so a reader
    can ``seek(offset); read(length)`` one record without touching the
    rest of the file (pytest-pinned in tests/test_warc_index.py).
    """
    import hashlib

    os.makedirs(out_dir, exist_ok=True)

    def write_shard(batch: pa.Table) -> pa.Table:
        import uuid

        urls = batch.column("url").to_pylist()
        tss = batch.column("warc_ts").to_pylist()
        htmls = batch.column("html").to_pylist()
        langs = batch.column("lang").to_pylist()
        if not urls:
            return CDX_SCHEMA.empty_table()
        rows = {k: [] for k in CDX_SCHEMA.names}
        parts, off = [], 0
        for url, ts, html, lang in zip(urls, tss, htmls, langs):
            rec = _record_bytes(url, ts, html, lang)
            payload = bytes(html or b"")
            rows["urlkey"].append(surt_key(url))
            rows["timestamp"].append(
                (ts or datetime(1970, 1, 1)).strftime("%Y%m%d%H%M%S")
            )
            rows["url"].append(url)
            rows["mime"].append("text/html")
            rows["status"].append(200)
            rows["digest"].append(hashlib.sha1(payload).hexdigest())
            rows["length"].append(len(rec))
            rows["offset"].append(off)
            parts.append(rec)
            off += len(rec)
        blob = b"".join(parts)
        # shard name = hash of the FULL shard bytes: deterministic per
        # content, collision-free across differing batches (a name from
        # just the first URL + row count collides for recaptured URLs
        # and would clobber another shard), and idempotent — a re-run
        # producing identical bytes rewrites the same file harmlessly
        path = os.path.join(out_dir, f"part-{hashlib.md5(blob).hexdigest()[:16]}.warc")
        rows["filename"] = [path] * len(urls)
        if not os.path.exists(path):  # content-addressed: skip rewrite
            tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"  # private tmp per writer
            with open(tmp, "wb") as fh:
                fh.write(blob)
            os.replace(tmp, path)
        return pa.Table.from_pydict(rows, schema=CDX_SCHEMA)

    index = pages.map_batches(write_shard, batch_format="pyarrow", zero_copy_batch=True)
    # CDX order: the exchange here is the index rows only (tiny), never
    # the page payloads
    return index.sort(["urlkey", "timestamp"])


def pages_from_cdx_index(index: pa.Table | rd.Dataset, extract_text: bool = True) -> rd.Dataset:
    """Random-access WARC reads driven by CDX index rows.

    Each task seeks straight to its records' offsets — the whole point
    of the index: fetching one URL out of a multi-GB shard costs one
    seek + ``length`` bytes, not a full-file scan.  Rows are grouped
    per shard inside the batch so each file opens once.  Output schema
    is identical to ``pages_from_warc`` (text None-filled when
    ``extract_text=False``) so the two readers are interchangeable."""
    if isinstance(index, pa.Table):
        index = rd.from_arrow(index)

    def read_records(batch: pa.Table) -> pa.Table:
        import polars as pl

        from ..functions.htmlx import extract_text_batch

        df = pl.from_arrow(batch.select(["filename", "offset", "length"]))
        cols: dict[str, list] = {"url": [], "warc_ts": [], "html": [], "lang": []}
        for (fname,), grp in df.group_by("filename", maintain_order=True):
            with open(fname, "rb") as fh:
                for off, ln in zip(grp["offset"], grp["length"]):
                    fh.seek(off)
                    rec = _parse_warc_bytes(fh.read(ln))
                    for k in cols:
                        cols[k].extend(rec[k])
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

    return index.map_batches(read_records, batch_format="pyarrow", zero_copy_batch=True)


def cdx_index_build(sf_dir: str, multiplier: int = 1) -> rd.Dataset:
    """Registry entry: pages corpus → WARC shards + sorted CDX index.

    Shards land under a per-(sf_dir, multiplier) /tmp dir with
    content-addressed names, so a repeated build skips every existing
    shard's payload write (the expensive part) and only recomputes the
    cheap index rows; the returned Dataset is the index (one row per
    page, CDX sort order)."""
    import hashlib

    from ..pipelines import graph

    key = hashlib.md5(f"{os.path.abspath(sf_dir)}|{multiplier}".encode()).hexdigest()[:12]
    out_dir = os.path.join("/tmp/lpr_warc_cdx", key)
    pages = graph.pages_dataset(sf_dir, multiplier)
    return write_warc_indexed(pages, out_dir)
