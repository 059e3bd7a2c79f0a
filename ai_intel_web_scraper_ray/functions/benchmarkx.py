"""Benchmark-data mining from text.

Semantics mirror the reference benchmark scraper's extractor
(reference: competitive-intel/scrapers/benchmark_scraper.py:161-209):
known database-name mentions, performance-number patterns (rows/s, latency
units, bandwidth, QPS, x-faster), and hardware-spec patterns.  All regexes
compiled at module load.
"""

from __future__ import annotations

import re
from typing import Dict, List

DB_NAMES = [
    "QuestDB", "ClickHouse", "KDB\\+", "KDB-X", "TimescaleDB",
    "InfluxDB", "DuckDB", "PostgreSQL", "MySQL", "MongoDB",
    "Druid", "Pinot", "CrateDB", "TDengine",
]
_DB_PATTERNS = [(db, re.compile(db, re.IGNORECASE)) for db in DB_NAMES]

_PERF_PATTERNS = [
    re.compile(r"([\d,.]+)\s*(rows?/s(?:ec(?:ond)?)?|rows per second)", re.IGNORECASE),
    re.compile(r"([\d,.]+)\s*(ms|millisecond|microsecond|μs|us|ns|nanosecond)", re.IGNORECASE),
    re.compile(r"([\d,.]+)\s*(GB/s|MB/s|TB/s)", re.IGNORECASE),
    re.compile(r"([\d,.]+)\s*(QPS|queries per second)", re.IGNORECASE),
    re.compile(r"([\d,.]+)x\s*(faster|slower)", re.IGNORECASE),
]

_HW_PATTERNS = [
    re.compile(r"(\d+)\s*(CPU|core|vCPU)", re.IGNORECASE),
    re.compile(r"(\d+)\s*(GB|TB)\s*(RAM|memory|disk|SSD|NVMe|storage)", re.IGNORECASE),
    re.compile(r"(AWS|GCP|Azure)\s+(\w+\.\w+)", re.IGNORECASE),
]


def extract_benchmark_data(text: str) -> Dict[str, List[str]]:
    dbs = [db.replace("\\+", "+") for db, pat in _DB_PATTERNS if pat.search(text)]
    perf = [" ".join(m) for pat in _PERF_PATTERNS for m in pat.findall(text)]
    hw = [" ".join(m) for pat in _HW_PATTERNS for m in pat.findall(text)]
    return {
        "databases_mentioned": dbs,
        "performance_numbers": perf,
        "hardware_specs": hw,
    }
