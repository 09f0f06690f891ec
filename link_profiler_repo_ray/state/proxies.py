"""T7 (second half): proxy rotation with good/bad health marking.

The reference's ``utils/proxy_manager.py:33-209`` keeps a proxy pool,
hands out the next proxy by health-weighted *random* choice,
marks proxies good/bad per request, bans one after ``max_failures``
consecutive failures and retries banned proxies after a cooldown.

This rebuild keeps the same lifecycle (rotate → mark → ban → cooldown
→ probe) but replaces the weighted-random pick with a deterministic
round-robin over currently-eligible proxies: reproducible under test,
and uniform load-spreading instead of piling onto one "best" exit.
One ``ProxyPool`` lives per fetch actor (state in ``__init__``, the
actor-pool discipline) — a fleet-global singleton would serialize
every fetch through one actor for no benefit: per-actor health
converges to the same bans because a dead proxy fails everywhere.

The pool is shared by the actor's fetch THREADS (RealFetchActor runs
up to 16 concurrent ``_fetch_one`` calls), so every mutation holds a
lock, and a banned proxy whose cooldown has expired is handed to
exactly ONE caller as a probe (its ban is provisionally extended so
concurrent callers skip it until the probe's mark_good/mark_bad
lands) — the reference's FAILED → TESTING single-probe transition,
not a whole thread-pool wave burned on a still-dead exit.
"""

from __future__ import annotations

import threading
import time

__all__ = ["ProxyPool"]


class ProxyPool:
    def __init__(
        self,
        proxies: list[str],
        max_failures: int = 5,
        retry_after_s: float = 300.0,
        clock=time.monotonic,
    ):
        self._order = list(proxies)
        self.max_failures = max_failures
        self.retry_after_s = retry_after_s
        self._clock = clock
        self._rr = 0
        self._lock = threading.Lock()
        self._state: dict[str, dict] = {
            p: {"ok": 0, "fail": 0, "consec_fail": 0, "banned_until": 0.0}
            for p in self._order
        }

    def get_next(self) -> str | None:
        """Next eligible proxy (round-robin); None = go direct.

        A banned proxy past its cooldown is returned as a single
        PROBE: its ban is provisionally re-extended under the lock so
        concurrent callers skip it until mark_good (clears the ban) or
        mark_bad (confirms it) resolves the probe."""
        n = len(self._order)
        if not n:
            return None
        with self._lock:
            now = self._clock()
            for off in range(n):
                p = self._order[(self._rr + off) % n]
                st = self._state[p]
                if st["consec_fail"] < self.max_failures:
                    self._rr = (self._rr + off + 1) % n
                    return p
                if now >= st["banned_until"]:
                    # FAILED → TESTING: exactly one caller probes
                    st["banned_until"] = now + self.retry_after_s
                    self._rr = (self._rr + off + 1) % n
                    return p
            return None

    def mark_good(self, proxy: str) -> None:
        with self._lock:
            st = self._state.get(proxy)
            if st is None:
                return
            st["ok"] += 1
            st["consec_fail"] = 0
            st["banned_until"] = 0.0

    def mark_bad(self, proxy: str) -> None:
        with self._lock:
            st = self._state.get(proxy)
            if st is None:
                return
            st["fail"] += 1
            st["consec_fail"] += 1
            if st["consec_fail"] >= self.max_failures:
                st["banned_until"] = self._clock() + self.retry_after_s

    def stats(self) -> dict[str, dict]:
        with self._lock:
            return {p: dict(st) for p, st in self._state.items()}
