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
"""

from __future__ import annotations

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
        self._state: dict[str, dict] = {
            p: {"ok": 0, "fail": 0, "consec_fail": 0, "banned_until": 0.0}
            for p in self._order
        }

    def _eligible(self, p: str, now: float) -> bool:
        st = self._state[p]
        # banned proxies become probe-eligible again after the cooldown
        # (proxy_manager.py's FAILED → TESTING transition)
        return st["consec_fail"] < self.max_failures or now >= st["banned_until"]

    def get_next(self) -> str | None:
        """Next eligible proxy (round-robin); None = go direct."""
        n = len(self._order)
        if not n:
            return None
        now = self._clock()
        for off in range(n):
            p = self._order[(self._rr + off) % n]
            if self._eligible(p, now):
                self._rr = (self._rr + off + 1) % n
                return p
        return None

    def mark_good(self, proxy: str) -> None:
        st = self._state.get(proxy)
        if st is None:
            return
        st["ok"] += 1
        st["consec_fail"] = 0
        st["banned_until"] = 0.0

    def mark_bad(self, proxy: str) -> None:
        st = self._state.get(proxy)
        if st is None:
            return
        st["fail"] += 1
        st["consec_fail"] += 1
        if st["consec_fail"] >= self.max_failures:
            st["banned_until"] = self._clock() + self.retry_after_s

    def stats(self) -> dict[str, dict]:
        return {p: dict(st) for p, st in self._state.items()}
