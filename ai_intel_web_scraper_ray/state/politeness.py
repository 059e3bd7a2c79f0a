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
    """min_delay seconds between consecutive fetches of the same host."""

    def __init__(self, min_delay: float = 0.5):
        self.min_delay = min_delay
        self._next_free: Dict[str, float] = {}

    def reserve(self, host: str, now: float) -> float:
        """Returns the scheduled fetch time (>= now) for one fetch of
        ``host`` and advances the bucket."""
        t = max(now, self._next_free.get(host, 0.0))
        self._next_free[host] = t + self.min_delay
        return t

    def snapshot(self) -> Dict[str, float]:
        return dict(self._next_free)

    def restore(self, state: Dict[str, float]) -> None:
        self._next_free = dict(state)
