"""Real HTTP transport for the crawl fetch workers.

Mirrors the reference fetch policy (competitive-intel/scrapers/utils.py:43-85):

- one shared ``requests.Session`` with the bot User-Agent headers,
- 30 s timeout,
- 3 attempts with exponential backoff (2 s → 10 s cap) retrying ONLY
  connection / timeout errors,
- ``404`` → ``None`` immediately (no retry),
- any other HTTP error status → ``None`` immediately (no retry),
- exhausted retries → ``None``.

The Session is created lazily on first use, so the transport object is
picklable into a Ray actor and each ``FetchExtractWorker`` builds its own
connection pool once per actor process (never per batch).

POLITENESS: ``crawl_scalable``'s lease schedule is a VIRTUAL clock by
default (no sleeping — right for the mock transport and for measuring
scheduler throughput).  When plugging in this transport, pass
``wall_clock_politeness=True`` to ``crawl_scalable`` so the driver holds
each lease until its scheduled wall time; without it min_delay is NOT
enforced in wall time and a live host could be hammered.

This sandbox has no network, so the live path is exercised only through
injected fakes (tests/test_http_transport.py); the retry ladder itself is
fully tested.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Optional, Tuple

DEFAULT_HEADERS = {
    "User-Agent": "CompetitiveIntel/1.0 (competitive intelligence research bot)",
    "Accept": "text/html,application/xhtml+xml,application/xml;q=0.9,*/*;q=0.8",
    "Accept-Language": "en-US,en;q=0.5",
}


class HttpTransport:
    """Session-pooled fetcher with the reference's retry ladder.

    ``get_fn`` / ``sleep_fn`` are injectable for tests (a fake ``get_fn``
    bypasses Session creation entirely, so the class is testable offline).
    """

    def __init__(
        self,
        headers: Optional[Dict[str, str]] = None,
        timeout: float = 30.0,
        max_attempts: int = 3,
        backoff_min: float = 2.0,
        backoff_max: float = 10.0,
        get_fn: Optional[Callable] = None,
        sleep_fn: Callable[[float], None] = time.sleep,
    ):
        self.headers = {**DEFAULT_HEADERS, **(headers or {})}
        self.timeout = timeout
        self.max_attempts = max_attempts
        self.backoff_min = backoff_min
        self.backoff_max = backoff_max
        self._get_fn = get_fn
        self._sleep = sleep_fn
        self._session = None
        self.counters = {"fetched": 0, "not_found": 0, "http_error": 0, "retries": 0,
                         "gave_up": 0}

    # -- session ----------------------------------------------------------

    def _get(self, url: str):
        if self._get_fn is not None:
            return self._get_fn(url, headers=self.headers, timeout=self.timeout)
        if self._session is None:  # once per actor process
            import requests

            self._session = requests.Session()
            self._session.headers.update(self.headers)
        return self._session.get(url, timeout=self.timeout)

    def _retryable_exceptions(self) -> Tuple[type, ...]:
        try:
            import requests

            return (requests.ConnectionError, requests.Timeout)
        except ImportError:  # pragma: no cover - requests is baked in
            return (ConnectionError, TimeoutError)

    # -- fetch ------------------------------------------------------------

    def fetch(self, url: str) -> Optional[str]:
        """Fetch one URL → HTML text, or None on 404 / HTTP error /
        exhausted retries (reference fetch_url contract)."""
        retryable = self._retryable_exceptions()
        for attempt in range(self.max_attempts):
            try:
                resp = self._get(url)
            except retryable:
                if attempt + 1 >= self.max_attempts:
                    self.counters["gave_up"] += 1
                    return None
                # tenacity wait_exponential(multiplier=1, min=backoff_min,
                # max=backoff_max): 2s, 4s, 8s… clamped to [min, max]
                delay = min(max(self.backoff_min, 2.0 ** (attempt + 1)), self.backoff_max)
                self.counters["retries"] += 1
                self._sleep(delay)
                continue
            status = getattr(resp, "status_code", 200)
            if status == 404:
                self.counters["not_found"] += 1
                return None
            if status >= 400:
                self.counters["http_error"] += 1
                return None
            self.counters["fetched"] += 1
            return resp.text
        return None
