"""Per-host circuit breaker (T5) on the logical round clock.

Reference: utils/distributed_circuit_breaker.py:22-152 — CLOSED /
OPEN / HALF_OPEN per domain, threshold 5 consecutive failures, 60 s
recovery, 3 successes to re-close.  Here time is the crawl's logical
round counter (deterministic); the class is host-bucket state, i.e. it
drops into a FrontierShard or a real fetch actor unchanged.
"""

from __future__ import annotations

from dataclasses import dataclass, field

__all__ = ["CircuitBreaker", "CLOSED", "OPEN", "HALF_OPEN"]

CLOSED, OPEN, HALF_OPEN = "closed", "open", "half_open"


@dataclass
class _HostState:
    state: str = CLOSED
    consecutive_failures: int = 0
    consecutive_successes: int = 0
    opened_round: int = -1


@dataclass
class CircuitBreaker:
    failure_threshold: int = 5
    recovery_rounds: int = 60
    close_threshold: int = 3
    hosts: dict = field(default_factory=dict)
    opens: int = 0  # lifetime count of CLOSED/HALF_OPEN -> OPEN trips

    def _st(self, host: str) -> _HostState:
        if host not in self.hosts:
            self.hosts[host] = _HostState()
        return self.hosts[host]

    def allow(self, host: str, round_no: int) -> bool:
        st = self._st(host)
        if st.state == CLOSED:
            return True
        if st.state == OPEN:
            if round_no >= st.opened_round + self.recovery_rounds:
                st.state = HALF_OPEN
                st.consecutive_successes = 0
                return True
            return False
        return True  # HALF_OPEN probes are allowed

    def record(self, host: str, success: bool, round_no: int) -> None:
        st = self._st(host)
        if success:
            st.consecutive_failures = 0
            if st.state == HALF_OPEN:
                st.consecutive_successes += 1
                if st.consecutive_successes >= self.close_threshold:
                    st.state = CLOSED
            return
        st.consecutive_successes = 0
        st.consecutive_failures += 1
        if st.state == HALF_OPEN or st.consecutive_failures >= self.failure_threshold:
            st.state = OPEN
            st.opened_round = round_no
            st.consecutive_failures = 0
            self.opens += 1

    def state_of(self, host: str) -> str:
        return self._st(host).state

    # --- checkpoint serialization (deterministic resume) -----------------

    def state_rows(self) -> list[dict]:
        # ``opens`` (lifetime trip counter) rides along as a constant
        # column so resumed runs report the same telemetry
        return [
            {
                "host": h,
                "state": st.state,
                "consecutive_failures": st.consecutive_failures,
                "consecutive_successes": st.consecutive_successes,
                "opened_round": st.opened_round,
                "opens_total": self.opens,
            }
            for h, st in sorted(self.hosts.items())
        ]

    def load_state(self, rows) -> None:
        rows = list(rows)
        self.hosts = {
            r["host"]: _HostState(
                state=r["state"],
                consecutive_failures=int(r["consecutive_failures"]),
                consecutive_successes=int(r["consecutive_successes"]),
                opened_round=int(r["opened_round"]),
            )
            for r in rows
        }
        if rows:
            self.opens = int(rows[0].get("opens_total", 0))
