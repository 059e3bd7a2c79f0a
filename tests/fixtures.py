"""Deterministic synthetic fixtures (seed 42, no wall clock, no network).

Designed per FIXTURES.md: source records exercising every filter/dedup/tagger
boundary, a synthetic web graph for the crawler, and interleaved-document
builders matching BASELINE.json's input_hint.
"""

from __future__ import annotations

import datetime
import random
from typing import Dict, List, Optional

SEED = 42

TOPIC_KEYWORDS = {
    "performance": ["fast", "slow", "benchmark result", "throughput"],
    "storage": ["table", "column", "merge tree"],
    "streaming": ["stream", "window", "late data"],
    "query": ["query", "join", "filter"],
    "ops": ["deploy", "cluster", "monitoring dashboard"],
}

TOPIC_NAMES = {
    "performance": "Performance",
    "storage": "Storage Engine",
    "streaming": "Streaming",
    "query": "Query Processing",
    "ops": "Operations",
}

_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima "
    "mike november oscar papa quebec romeo sierra tango uniform victor whiskey".split()
)


def _sentence(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n))


def make_source_records(n: int = 60, seed: int = SEED) -> List[dict]:
    """Record dicts in arrival order (arrival_seq = index)."""
    rng = random.Random(seed)
    records: List[dict] = []
    base_date = datetime.date(2026, 1, 10)

    def rec(i: int, **kw) -> dict:
        r = {
            "id": f"acme-official_docs-{i:012x}",
            "origin": "acme",
            "source_type": "official_docs",
            "url": f"https://docs.acme.io/page/{i}",
            "title": f"Doc page {i}",
            "text": "",
            "scraped_date": base_date,
            "content_date": None,
            "topics": [],
            "subtopics": [],
            "credibility": "official",
            "sentiment": "neutral",
            "word_count": 0,
            "arrival_seq": i,
            "metadata": {},
        }
        r.update(kw)
        r["word_count"] = len(r["text"].split())
        return r

    long_tagged = lambda extra="": (
        "The fast query engine joins each table and column quickly. " * 12
        + _sentence(rng, 80)
        + " "
        + extra
    )

    i = 0
    # plain keepers with topic keywords
    for _ in range(20):
        records.append(rec(i, text=long_tagged()))
        i += 1
    # too-short records (<100 words)
    for _ in range(4):
        records.append(rec(i, text="fast query table " + _sentence(rng, 20)))
        i += 1
    # untagged long records — non-exempt type (dropped) and exempt (kept)
    records.append(rec(i, text=_sentence(rng, 150)))
    i += 1
    records.append(rec(i, source_type="benchmark", credibility="third_party", text=_sentence(rng, 150)))
    i += 1
    records.append(rec(i, source_type="github_release", text=_sentence(rng, 150),
                       metadata={"tag_name": "v1.2.3", "is_prerelease": False}))
    i += 1
    # mostly-code docs page (>85% fenced code)
    code = "```python\n" + ("x = compute(1)\n" * 120) + "```"
    records.append(rec(i, text="The fast query intro. " + code))
    i += 1
    # boilerplate phrases record
    bp = ("Skip to content. Table of contents. Cookie policy. Privacy policy. "
          "The fast query table works. " + _sentence(rng, 120))
    records.append(rec(i, text=bp))
    i += 1
    # link-word-heavy short record
    links = " ".join(f"/nav/item{j}" for j in range(20)) + " home docs api"
    records.append(rec(i, text=links))
    i += 1
    # url duplicates: same url different case / trailing slash
    records.append(rec(i, url="https://docs.acme.io/Dup/Page", text=long_tagged("dupA")))
    i += 1
    records.append(rec(i, url="https://docs.acme.io/dup/page/", text=long_tagged("dupB")))
    i += 1
    # github issue duplicates by number
    for k, num in enumerate([501, 501, 502]):
        records.append(
            rec(
                i,
                source_type="github_issue",
                url=f"https://github.com/acme/acme/issues/{num}?p={k}",
                title=f"Crash on fast query {num}",
                text=long_tagged(f"issue {num} body"),
                credibility="community",
                metadata={
                    "issue_number": num,
                    "state": "open",
                    "labels": ["bug"],
                    "comments_count": 2,
                    "top_comments": ["Same problem here with the fast table merge.",
                                     "Fixed by upgrading the cluster deploy."],
                    "is_bug": True,
                    "is_feature_request": False,
                },
            )
        )
        i += 1
    # near-duplicate family: base + ~0.9 + ~0.75 + ~0.4 Jaccard variants
    base_words = [rng.choice(_WORDS) for _ in range(200)]
    base_text = "the fast query table filter join. " + " ".join(base_words)

    def mutate(words: List[str], frac: float, salt: int) -> str:
        r2 = random.Random(seed + salt)
        w = list(words)
        k = int(len(w) * frac)
        for _ in range(k):
            w[r2.randrange(len(w))] = r2.choice(_WORDS)
        return "the fast query table filter join. " + " ".join(w)

    records.append(rec(i, url=f"https://docs.acme.io/near/base", text=base_text))
    i += 1
    records.append(rec(i, url=f"https://docs.acme.io/near/v90", text=mutate(base_words, 0.02, 1)))
    i += 1
    records.append(rec(i, url=f"https://docs.acme.io/near/v75", text=mutate(base_words, 0.06, 2)))
    i += 1
    records.append(rec(i, url=f"https://docs.acme.io/near/v40", text=mutate(base_words, 0.5, 3)))
    i += 1
    # blog + discussion + community records for the chunker strategies
    blog_text = "\n## Intro\n" + _sentence(rng, 120) + "\n## Deep dive\n" + \
        ("The fast query engine merges each table column. " * 40) + "\n### Details\n" + _sentence(rng, 150)
    records.append(rec(i, source_type="blog", url="https://acme.io/blog/fast-queries-2026",
                       title="Fast queries in 2026", text=blog_text,
                       metadata={"relevance_score": 0.5, "priority_keywords_matched": ["fast"]}))
    i += 1
    records.append(
        rec(i, source_type="github_discussion", url="https://github.com/acme/acme/discussions/88",
            title="How to tune fast table merges", text=long_tagged("discussion body"),
            credibility="community",
            metadata={"discussion_number": 88, "category": "Q&A", "is_answered": True,
                      "answer_body": "Enable the fast merge setting on every table column. " * 10}))
    i += 1
    records.append(
        rec(i, source_type="community_hn", url="https://news.ycombinator.com/item?id=99",
            title="Acme DB is fast", text=long_tagged("hn post"),
            credibility="community",
            metadata={"hn_id": 99, "points": 123,
                      "top_comments": ["Impressively fast query times on our cluster. " * 6,
                                       "meh"]}))
    i += 1
    while len(records) < n:
        records.append(rec(i, text=long_tagged(f"filler {i}")))
        i += 1
    return records


# ---------------------------------------------------------------------------
# Synthetic web graph (FIXTURES.md §2) — shared with the bench harness
# ---------------------------------------------------------------------------

from ai_intel_web_scraper_ray.sources.synthetic import make_web_graph  # noqa: E402,F401


def records_to_table(records: List[dict]):
    """Record dicts → Arrow table with the engine's SOURCE_RECORD_SCHEMA
    (metadata normalized to the sparse struct)."""
    import pyarrow as pa

    from ai_intel_web_scraper_ray.schemas import METADATA_TYPE, SOURCE_RECORD_SCHEMA

    meta_fields = [f.name for f in METADATA_TYPE]
    rows = []
    for r in records:
        row = dict(r)
        meta = dict.fromkeys(meta_fields)
        meta.update(r.get("metadata") or {})
        row["metadata"] = meta
        rows.append(row)
    cols = {}
    for field in SOURCE_RECORD_SCHEMA:
        cols[field.name] = pa.array([row.get(field.name) for row in rows], field.type)
    return pa.table(cols)


def records_to_interleaved(records: List[dict]) -> List[dict]:
    """SourceRecord-equivalents → interleaved documents (input_hint shape):
    title span, body span, one span per top_comment, answer span, media spans
    per FIXTURES.md §1."""
    docs = []
    for r in records:
        spans = []
        off = 0

        def add(kind: str, text: str = "", media_ref: str = ""):
            nonlocal off
            spans.append({"kind": kind, "text": text, "media_ref": media_ref, "offset": off})
            off += 1

        add("title", r.get("title") or "")
        add("body", r.get("text") or "")
        meta = r.get("metadata") or {}
        for c in meta.get("top_comments") or []:
            add("comment", c)
        if meta.get("is_answered") and meta.get("answer_body"):
            add("answer", meta["answer_body"])
        if r.get("arrival_seq", 0) % 4 == 0:
            add("media", media_ref=f"media://img/{r['id']}")
        docs.append({"doc_id": r["id"], "spans": spans})
    return docs
