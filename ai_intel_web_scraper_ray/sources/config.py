"""Competitor-config compiler — the reference's primary plugin point.

The reference drives every crawl from per-competitor JSON config files
(reference: competitive-intel/config/competitors/questdb.json:1-211, consumed
at scrapers/docs_scraper.py:52-58 and blog_scraper.py:48-54): each carries
``base_url``, ``content_selector``, ``max_depth``, ``max_pages``,
``rate_limit_seconds``, ``exclude_patterns`` and ``topic_keywords``.  Adding
a competitor = dropping a config file (reference README.md:66-74).

This module compiles a set of those configs into ONE multi-source crawl
plan for ``crawl_scalable``:

- all ``base_url``s become frontier seeds,
- per-competitor ``rate_limit_seconds`` become the per-HOST token-bucket
  delays (state/politeness.py ``per_host_delay``) — different sources keep
  their own politeness budgets inside one shared frontier,
- per-competitor ``exclude_patterns`` compile to a host-keyed dict the
  fetch workers consult for that host's URLs only (one source's pattern
  can never veto another source's pages),
- ``max_pages`` budgets and ``topic_keywords`` are returned alongside for
  the per-source ordered/strict crawls and the tagger stage.

Scale shape: the plan is O(#competitors) — pure config, broadcast with the
worker args, never per-URL state.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Sequence, Union

from ..functions.urls import host_of, normalize_url


def load_configs(path: str) -> List[dict]:
    """Read every ``*.json`` in a directory (sorted, deterministic) or a
    single config file holding one config object OR a list of them."""
    if os.path.isdir(path):
        cfgs = []
        for name in sorted(os.listdir(path)):
            if name.endswith(".json"):
                with open(os.path.join(path, name)) as f:
                    loaded = json.load(f)
                    cfgs.extend(loaded if isinstance(loaded, list) else [loaded])
        return cfgs
    with open(path) as f:
        loaded = json.load(f)
        return loaded if isinstance(loaded, list) else [loaded]


def compile_competitor_configs(
    configs: Union[str, Sequence[dict]],
) -> dict:
    """Compile competitor configs into a multi-source crawl plan.

    Returns ``{"seeds", "per_host_delay", "per_host_excludes",
    "budgets", "selectors", "topic_keywords", "max_depth"}`` — the first
    three feed ``crawl_scalable`` directly; ``budgets`` / ``selectors``
    drive per-source ordered crawls; ``topic_keywords`` feeds the tagger.
    """
    if isinstance(configs, str):
        configs = load_configs(configs)

    seeds: List[str] = []
    per_host_delay: Dict[str, float] = {}
    per_host_excludes: Dict[str, List[str]] = {}
    budgets: Dict[str, int] = {}
    selectors: Dict[str, str] = {}
    explicit_selector: set = set()
    topic_keywords: Dict[str, List[str]] = {}
    max_depth = 0

    for cfg in configs:
        base = normalize_url(cfg["base_url"])
        host = host_of(base)
        seeds.append(base)
        delay = float(cfg.get("rate_limit_seconds", 0.0))
        if delay > 0:
            # same host in two configs: the stricter (slower) budget wins
            per_host_delay[host] = max(per_host_delay.get(host, 0.0), delay)
        pats = list(cfg.get("exclude_patterns", ()))
        if pats:
            per_host_excludes.setdefault(host, []).extend(
                p for p in pats if p not in per_host_excludes.get(host, []))
        if cfg.get("max_pages"):
            budgets[host] = min(budgets.get(host, 10**9),
                                int(cfg["max_pages"]))
        # explicit selector beats the default regardless of config order;
        # two EXPLICIT selectors for one host keep the first (configs load
        # in sorted filename order, so the merge is deterministic) —
        # unlike delay/budget there is no "stricter" ordering to take
        if "content_selector" in cfg and host not in explicit_selector:
            selectors[host] = cfg["content_selector"]
            explicit_selector.add(host)
        else:
            selectors.setdefault(host, "article")
        name = cfg.get("name") or host
        topic_keywords[name] = list(cfg.get("topic_keywords", ()))
        max_depth = max(max_depth, int(cfg.get("max_depth", 3)))

    return {
        "seeds": seeds,
        "per_host_delay": per_host_delay,
        "per_host_excludes": per_host_excludes,
        "budgets": budgets,
        "selectors": selectors,
        "topic_keywords": topic_keywords,
        "max_depth": max_depth,
    }
