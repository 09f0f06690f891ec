"""M14: DNS enrichment — live DNS-over-HTTPS with a deterministic
simulated fallback (services/domain_service.py:264-305).

The reference queries a DoH endpoint (Cloudflare/Google ``dns-json``)
per record type and falls back to simulated records when live lookups
are disabled.  Same here: ``fetch_dns_records`` is a real DoH client
(urllib, one GET per record type, ``Accept: application/dns-json``),
and ``simulate_dns_records`` is the closed-form fallback — derived
from the corpus host id where the host matches ``h<N>.example.com``
(so a DuckDB oracle can recompute it) and from the host length
otherwise.

``DnsEnrichStage`` is the actor-pool stage: one per-actor response
cache (T6 discipline — a host's records are fetched once per actor,
not once per batch), vectorizable fallback, swap ``doh_url`` in for
live deployments and nothing else changes.
"""

from __future__ import annotations

import json
import re
import urllib.parse
import urllib.request

import pyarrow as pa

__all__ = ["fetch_dns_records", "simulate_dns_records", "DnsEnrichStage"]

_RECORD_TYPES = ("A", "AAAA", "MX", "NS", "TXT")
_HOST_ID_RE = re.compile(r"^h(\d+)\.")


def fetch_dns_records(
    domain: str, doh_url: str, timeout_s: float = 5.0
) -> dict[str, list[str]]:
    """Live DoH lookup: one dns-json GET per record type; failures for
    a type are skipped (domain_service.py:272-289 semantics)."""
    records: dict[str, list[str]] = {}
    for rtype in _RECORD_TYPES:
        try:
            url = f"{doh_url}?{urllib.parse.urlencode({'name': domain, 'type': rtype})}"
            req = urllib.request.Request(url, headers={"Accept": "application/dns-json"})
            with urllib.request.urlopen(req, timeout=timeout_s) as resp:
                data = json.loads(resp.read().decode("utf-8", errors="replace"))
            answers = data.get("Answer") or data.get("answer") or []
            vals = [a.get("data") for a in answers if a.get("data")]
            if vals:
                records[rtype] = vals
        except Exception:
            continue
    return records


def _host_seed(domain: str) -> int:
    m = _HOST_ID_RE.match(domain)
    return int(m.group(1)) if m else len(domain)


def simulate_dns_records(domain: str) -> dict[str, list[str]]:
    """Deterministic fallback records (closed form of the corpus host
    id — SQL-recomputable; the reference's _simulate_dns_records is the
    same idea with random values)."""
    s = _host_seed(domain)
    return {
        "A": [f"192.0.2.{1 + s % 254}"],
        "NS": [f"ns1.{domain}", f"ns2.{domain}"],
        "MX": [f"{10 + s % 3 * 10} mail.{domain}"],
    }


class DnsEnrichStage:
    """Actor-pool DNS enrichment over a ``host`` column.

    ``doh_url=None`` → simulated records (the in-sandbox default; no
    network here).  Per-actor cache: each distinct host resolves once
    per actor regardless of how many batches carry it."""

    def __init__(self, host_col: str = "host", doh_url: str | None = None, timeout_s: float = 5.0):
        self.host_col = host_col
        self.doh_url = doh_url
        self.timeout_s = timeout_s
        self._cache: dict[str, dict[str, list[str]]] = {}

    def _resolve(self, host: str) -> dict[str, list[str]]:
        rec = self._cache.get(host)
        if rec is None:
            rec = (
                fetch_dns_records(host, self.doh_url, self.timeout_s)
                if self.doh_url
                else {}
            ) or simulate_dns_records(host)
            self._cache[host] = rec
        return rec

    def __call__(self, batch: pa.Table) -> pa.Table:
        hosts = batch.column(self.host_col).to_pylist()
        recs = [self._resolve(h or "") for h in hosts]
        out = {c: batch.column(c) for c in batch.schema.names}
        out["dns_a"] = pa.array([r.get("A", [None])[0] for r in recs], pa.string())
        out["dns_ns_count"] = pa.array(
            [len(r.get("NS", [])) for r in recs], pa.int64()
        )
        out["dns_mx"] = pa.array([r.get("MX", [None])[0] for r in recs], pa.string())
        return pa.table(out)
