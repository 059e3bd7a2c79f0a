"""robots.txt cache.

The reference never consults robots.txt (it only self-identifies via UA,
reference: competitive-intel/scrapers/utils.py:22-26); the north rule adds
robots handling as a new, config-defeasible capability: with
``respect_robots=False`` (the default, matching the reference) every URL is
allowed, so reference-equality tests hold; with ``respect_robots=True`` the
per-host robots.txt (fetched once per host, cached) gates enqueue.

Parsing uses stdlib ``urllib.robotparser`` fed from the fetcher, so the
cache works identically against the mock web graph and a real fetcher.
"""

from __future__ import annotations

import urllib.robotparser
from typing import Callable, Dict, Optional

from ..functions.urls import host_of


class RobotsCache:
    def __init__(
        self,
        fetch_robots: Optional[Callable[[str], Optional[str]]] = None,
        user_agent: str = "CompetitiveIntel/1.0",
        respect_robots: bool = False,
    ):
        self.fetch_robots = fetch_robots
        self.user_agent = user_agent
        self.respect = respect_robots
        self._cache: Dict[str, Optional[urllib.robotparser.RobotFileParser]] = {}

    def _parser(self, host: str) -> Optional[urllib.robotparser.RobotFileParser]:
        if host not in self._cache:
            parser = None
            text = self.fetch_robots(host) if self.fetch_robots else None
            if text is not None:
                parser = urllib.robotparser.RobotFileParser()
                parser.parse(text.splitlines())
            self._cache[host] = parser
        return self._cache[host]

    def allowed(self, url: str) -> bool:
        if not self.respect:
            return True
        parser = self._parser(host_of(url))
        return True if parser is None else parser.can_fetch(self.user_agent, url)

    def crawl_delay(self, host: str, refresh: bool = False) -> Optional[float]:
        """The robots.txt ``Crawl-delay`` declared for our UA (or ``*``),
        in seconds — None when robots are not respected, the host has no
        robots.txt, or no delay is declared.  Callers compile this onto
        the host's politeness bucket as a FLOOR (a configured per-host
        delay is never lowered).

        ``refresh=True`` drops a cached MISS (parser None) and re-asks
        ``fetch_robots`` — ``allowed()`` runs at offer time for every
        admitted URL and caches None for hosts whose robots text wasn't
        available yet, so a dynamic robots source (real fetcher) would
        otherwise never surface a late-arriving Crawl-delay."""
        if not self.respect:
            return None
        if refresh and self._cache.get(host) is None:
            self._cache.pop(host, None)
        parser = self._parser(host)
        if parser is None:
            return None
        d = parser.crawl_delay(self.user_agent)
        return float(d) if d is not None else None

    def snapshot(self) -> Dict[str, Optional[str]]:
        # robots text is re-fetchable; checkpoint only the host list
        return {h: None for h in self._cache}

    def restore_hosts(self, hosts) -> None:
        # lazily re-fetch on next use; nothing to do beyond clearing
        self._cache = {}
