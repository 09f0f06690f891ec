"""T4: adaptive per-domain rate limiter (deterministic rebuild).

Reference: utils/adaptive_rate_limiter.py:17-190 — per-domain request
history (deque(100)), response-time history (deque(50)), success-rate
and p95-latency derived signals, heuristic delay prediction with a
×1.5 "server stress" multiplier.  The reference seeds its heuristics
with wall-clock time; this rebuild is a pure function of the fed
observations (logical metrics in → delay out), so crawls that use it
stay reproducible.  It plugs into a ``FrontierShard`` as an
alternative to the fixed Crawl-delay budget (per-host state in the
host's owning shard, exactly like the breaker) — the fixed logical
budget remains the default because BASELINE's ordering contract is
defined against it.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field

__all__ = ["AdaptiveRateLimiter"]

_REQ_WINDOW = 100  # adaptive_rate_limiter.py: request history deque(100)
_RT_WINDOW = 50  # response-time deque(50)


@dataclass
class _DomainState:
    requests: deque = field(default_factory=lambda: deque(maxlen=_REQ_WINDOW))
    response_times: deque = field(default_factory=lambda: deque(maxlen=_RT_WINDOW))


@dataclass
class AdaptiveRateLimiter:
    """Predicts the politeness delay (in logical rounds) per domain.

    ``record(domain, success, response_time)`` feeds an observation;
    ``delay_rounds(domain)`` returns the predicted delay:

    - base delay 1 round
    - success rate < 0.5 → ×4;  < 0.8 → ×2   (backoff on failures)
    - p95 response time > stress_threshold → ×1.5 (server stress,
      adaptive_rate_limiter.py's stress multiplier)
    - all-healthy domains with fast p95 → base (no speedup below 1:
      politeness floors at one fetch batch per round)
    """

    stress_threshold: float = 2.0
    max_delay_rounds: int = 16
    domains: dict = field(default_factory=dict)

    def _st(self, domain: str) -> _DomainState:
        if domain not in self.domains:
            self.domains[domain] = _DomainState()
        return self.domains[domain]

    def record(self, domain: str, success: bool, response_time: float) -> None:
        st = self._st(domain)
        st.requests.append(bool(success))
        st.response_times.append(float(response_time))

    def success_rate(self, domain: str) -> float:
        st = self._st(domain)
        if not st.requests:
            return 1.0
        return sum(st.requests) / len(st.requests)

    def p95_response_time(self, domain: str) -> float:
        st = self._st(domain)
        if not st.response_times:
            return 0.0
        xs = sorted(st.response_times)
        # nearest-rank p95 (deterministic, no interpolation)
        idx = min(len(xs) - 1, max(0, int(round(0.95 * len(xs))) - 1))
        return xs[idx]

    def delay_rounds(self, domain: str) -> int:
        import math

        delay = 1.0
        rate = self.success_rate(domain)
        if rate < 0.5:
            delay *= 4.0
        elif rate < 0.8:
            delay *= 2.0
        if self.p95_response_time(domain) > self.stress_threshold:
            delay *= 1.5
        # ceil, not truncate: 1 round x1.5 stress must round UP to 2
        # (int() made the stress tier unreachable from base delay)
        return max(1, min(self.max_delay_rounds, int(math.ceil(delay))))

    # --- checkpoint serialization ---------------------------------------

    def state_rows(self) -> list[dict]:
        return [
            {
                "domain": d,
                "requests": [bool(x) for x in st.requests],
                "response_times": [float(x) for x in st.response_times],
            }
            for d, st in sorted(self.domains.items())
        ]

    def load_state(self, rows) -> None:
        self.domains = {}
        for r in rows:
            st = self._st(r["domain"])
            st.requests.extend(bool(x) for x in r["requests"])
            st.response_times.extend(float(x) for x in r["response_times"])
