"""Per-host politeness: token-bucket / min-delay scheduling on a virtual or
wall clock.

The reference enforces a global per-source min-delay by sleeping
(reference: competitive-intel/scrapers/utils.py:29-40).  Distributed, one
bucket per HOST must gate all fetches for that host regardless of which
worker fetches — the frontier shard that owns a host issues fetch leases
with a not-before time.  The clock is injectable so tests and the mock-fetch
bench advance virtual time instead of sleeping.
"""

from __future__ import annotations

from typing import Dict


class HostPoliteness:
    """min_delay seconds between consecutive fetches of the same host.

    ``per_host_delay`` overrides the default for named hosts — the
    reference's per-source ``rate_limit_seconds`` (each competitor config
    carries its own; see sources/config.py) compiled onto the shared
    token-bucket state."""

    def __init__(self, min_delay: float = 0.5,
                 per_host_delay: Dict[str, float] | None = None):
        self.min_delay = min_delay
        self.per_host_delay: Dict[str, float] = dict(per_host_delay or {})
        self._next_free: Dict[str, float] = {}

    @property
    def active(self) -> bool:
        """True when ANY host has a positive delay (politeness routing and
        scheduling must engage even if the default delay is 0)."""
        return self.min_delay > 0 or any(
            d > 0 for d in self.per_host_delay.values())

    def raise_floor(self, host: str, delay: float) -> None:
        """Raise ``host``'s effective min-delay to at least ``delay``
        (robots Crawl-delay compilation) — never lowers a configured
        delay."""
        if delay > self.per_host_delay.get(host, self.min_delay):
            self.per_host_delay[host] = delay

    def reserve(self, host: str, now: float) -> float:
        """Returns the scheduled fetch time (>= now) for one fetch of
        ``host`` and advances the bucket."""
        t = max(now, self._next_free.get(host, 0.0))
        self._next_free[host] = t + self.per_host_delay.get(
            host, self.min_delay)
        return t

    def snapshot(self) -> Dict[str, float]:
        return dict(self._next_free)

    def restore(self, state: Dict[str, float]) -> None:
        self._next_free = dict(state)
