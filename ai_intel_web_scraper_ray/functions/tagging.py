"""Keyword-based topic tagging.

Semantics mirror the reference tagger
(reference: competitive-intel/processors/topic_tagger.py:49-142):
- global topic→keywords map, supplemented (case-insensitively deduped) by
  per-competitor keywords;
- each keyword compiled to ``\\b<kw>\\b`` IGNORECASE, weight
  ``1.0 + 0.5 * n_spaces``;
- topic score = Σ(match_count · weight) / n_keywords, only topics with
  score > 0 recorded;
- top-3 topics with score ≥ 0.01 in descending score order (stable sort, so
  ties break by topic insertion order), else ``["unclassified"]``.

The compiled pattern bank is the stateful part — build once per actor via
:class:`~ai_intel_web_scraper_ray.stages.transforms.TopicTagStage`.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence, Tuple

UNCLASSIFIED = "unclassified"


class KeywordBank:
    """Compiled keyword patterns for a topic taxonomy."""

    def __init__(
        self,
        topic_keywords: Dict[str, Sequence[str]],
        competitor_keywords: Optional[Dict[str, Sequence[str]]] = None,
        max_topics: int = 3,
        min_score_threshold: float = 0.01,
    ):
        self.max_topics = max_topics
        self.min_score_threshold = min_score_threshold

        merged: Dict[str, List[str]] = {t: list(kws) for t, kws in topic_keywords.items()}
        if competitor_keywords:
            for topic, kws in competitor_keywords.items():
                if topic in merged:
                    seen = {k.lower() for k in merged[topic]}
                    for kw in kws:
                        if kw.lower() not in seen:
                            merged[topic].append(kw)
                            seen.add(kw.lower())
                else:
                    merged[topic] = list(kws)
        self.topic_keywords = merged

        self.patterns: Dict[str, List[Tuple[re.Pattern, float]]] = {}
        for topic, kws in merged.items():
            compiled = []
            for kw in kws:
                weight = 1.0 + kw.count(" ") * 0.5
                compiled.append((re.compile(r"\b" + re.escape(kw) + r"\b", re.IGNORECASE), weight))
            self.patterns[topic] = compiled

    def score(self, text: str) -> Dict[str, float]:
        scores: Dict[str, float] = {}
        for topic, pats in self.patterns.items():
            if not pats:
                continue
            total = 0.0
            for pat, weight in pats:
                n = len(pat.findall(text))
                if n:
                    total += n * weight
            if total > 0:
                scores[topic] = total / len(pats)
        return scores

    def tag(self, title: str, text: str) -> List[str]:
        scores = self.score(f"{title} {text}")
        ranked = sorted(scores.items(), key=lambda kv: kv[1], reverse=True)
        top = [t for t, s in ranked[: self.max_topics] if s >= self.min_score_threshold]
        return top if top else [UNCLASSIFIED]


# Default taxonomy over the synthetic testdata vocabulary — used by the
# flagship pipeline / bench over /root/testdata documents.  Mirrors the role
# of config/keywords.json in the reference (an external, user-editable map).
DEFAULT_TOPIC_KEYWORDS: Dict[str, List[str]] = {
    "query_processing": ["query", "scan", "filter", "join", "group by", "order by"],
    "storage": ["table", "column", "row", "part", "batch", "merge"],
    "performance": ["fast", "slow", "big", "small", "hash join", "window"],
    "streaming": ["window", "stream", "event", "late data", "watermark"],
    "distributed": ["spark", "shuffle", "partition", "cluster", "worker node"],
}
