"""Content-type-aware chunking as a Ray Data flat-map actor stage.

Strategy semantics mirror the reference chunking engine
(reference: competitive-intel/vectorstore/chunker.py):
- blog:        header-section split; sections ≤400 tok kept whole (min 50),
               else recursive-split with the section header re-prefixed onto
               sub-chunks after the first (chunker.py:268-290)
- docs:        header split with a running "title > h2 > h3" hierarchy path
               prefix, hierarchy trimmed to the header level (chunker.py:296-328)
- github_issue: "title [labels] (state: x)" header + body; top comments
               greedily buffer-packed to 400 tok; ≥400-tok comments split;
               <50-tok trailing buffer dropped (chunker.py:334-386)
- github_discussion: body + separate "Accepted answer" chunk when answered
               (chunker.py:392-418)
- community:   post + one chunk per ≥50-tok comment (chunker.py:424-453)
- single:      whole doc if ≤800 tok (dropped if <50), else recursive split
               (chunker.py:459-469); used for releases/benchmarks/comparisons
- generic:     recursive split of title+text (chunker.py:475-478)

Core splitter: separators in priority order
["\\n## ", "\\n### ", "\\n#### ", "\\n\\n", "\\n", ". ", " "], greedy packing
to 400 tokens with a 60-token suffix overlap, <50-token trailing chunk merged
into the previous, token-slice hard split as last resort
(chunker.py:511-588).  Token counts come from the pinned offline tokenizer
(functions/tokenizer.py) instead of tiktoken.

Every output chunk gets the context prefix
``[Competitor | SourceType | Topic] `` (chunker.py:145-153) and the
deterministic id ``{competitor}-chunk-{sha256(parent:idx:text[:100])[:12]}``
(chunker.py:88-91).

Chunking is row-local and deterministic, so the stage is an embarrassingly
parallel flat map; the actor pool amortizes nothing heavier than config, but
keeps the interface uniform with the tokenizer-bearing production shape.
"""

from __future__ import annotations

import hashlib
import re
from typing import Dict, List, Optional, Tuple

import pandas as pd
import pyarrow as pa

from ..functions.tokenizer import count_tokens, encode_spans, slice_by_tokens

DEFAULT_CHUNK_TOKENS = 400
DEFAULT_OVERLAP_TOKENS = 60
MIN_CHUNK_TOKENS = 50
MAX_CHUNK_TOKENS = 800

SECTION_HEADERS = re.compile(r"^(#{1,4})\s+(.+)$", re.MULTILINE)
SEPARATORS = ["\n## ", "\n### ", "\n#### ", "\n\n", "\n", ". ", " "]


def _as_list(x) -> list:
    """Normalize None / numpy array / list to a plain list (pandas batches
    deliver Arrow list columns as ndarrays)."""
    if x is None:
        return []
    if isinstance(x, (list, tuple)):
        return list(x)
    try:
        return list(x)
    except TypeError:
        return [x]


def chunk_id(competitor: str, parent_doc_id: str, chunk_index: int, text: str) -> str:
    h = hashlib.sha256(f"{parent_doc_id}:{chunk_index}:{text[:100]}".encode()).hexdigest()[:12]
    return f"{competitor}-chunk-{h}"


def context_prefix(origin: str, source_type: str, topics: List[str], topic_names: Dict[str, str]) -> str:
    competitor = origin.upper() if origin == "kx" else origin.capitalize()
    source = source_type.replace("_", " ").title()
    topic = "General"
    for t in topics or []:
        if t in topic_names:
            topic = topic_names[t]
            break
    return f"[{competitor} | {source} | {topic}]"


class Chunker:
    def __init__(
        self,
        chunk_tokens: int = DEFAULT_CHUNK_TOKENS,
        overlap_tokens: int = DEFAULT_OVERLAP_TOKENS,
        topic_names: Optional[Dict[str, str]] = None,
    ):
        self.chunk_tokens = chunk_tokens
        self.overlap_tokens = overlap_tokens
        self.topic_names = topic_names or {}

    # -- core splitters ---------------------------------------------------

    def split_by_headers(self, text: str) -> List[Tuple[str, str]]:
        parts = SECTION_HEADERS.split(text)
        sections: List[Tuple[str, str]] = []
        if parts and parts[0].strip():
            sections.append(("", parts[0].strip()))
        i = 1
        while i < len(parts) - 2:
            header = f"{parts[i]} {parts[i + 1]}"
            sections.append((header, parts[i + 2].strip()))
            i += 3
        return sections or [("", text)]

    def recursive_split(self, text: str) -> List[str]:
        tokens = count_tokens(text)
        if tokens <= self.chunk_tokens:
            return [text] if text.strip() else []
        for sep in SEPARATORS:
            parts = text.split(sep)
            if len(parts) <= 1:
                continue
            merged = self.merge_splits(parts, sep)
            if len(merged) > 1:
                return merged
        return self.hard_split(text)

    def merge_splits(self, parts: List[str], sep: str) -> List[str]:
        chunks: List[str] = []
        current: List[str] = []
        current_tokens = 0
        for part in parts:
            pt = count_tokens(part)
            if current_tokens + pt > self.chunk_tokens and current:
                chunks.append(sep.join(current))
                # suffix overlap: re-prepend trailing parts within budget
                overlap: List[str] = []
                otok = 0
                for prev in reversed(current):
                    t = count_tokens(prev)
                    if otok + t > self.overlap_tokens:
                        break
                    overlap.insert(0, prev)
                    otok += t
                current = overlap + [part]
                current_tokens = otok + pt
            else:
                current.append(part)
                current_tokens += pt
        if current:
            tail = sep.join(current)
            if count_tokens(tail) >= MIN_CHUNK_TOKENS or not chunks:
                chunks.append(tail)
            else:
                chunks[-1] = chunks[-1] + sep + tail
        return chunks

    def hard_split(self, text: str) -> List[str]:
        spans = encode_spans(text)
        out = []
        start = 0
        n = len(spans)
        while start < n:
            end = min(start + self.chunk_tokens, n)
            out.append(slice_by_tokens(text, spans, start, end))
            if end >= n:
                break
            start = end - self.overlap_tokens
        return out

    # -- strategies -------------------------------------------------------

    def chunk_blog(self, text: str, title: str) -> List[str]:
        chunks: List[str] = []
        for header, body in self.split_by_headers(text):
            full = f"{title}\n{header}\n{body}" if header else f"{title}\n{body}"
            t = count_tokens(full)
            if t <= self.chunk_tokens:
                if t >= MIN_CHUNK_TOKENS:
                    chunks.append(full.strip())
            else:
                for j, sc in enumerate(self.recursive_split(full)):
                    if j > 0 and header and not sc.startswith(header):
                        sc = f"{header}\n{sc}"
                    chunks.append(sc.strip())
        return chunks or [c.strip() for c in self.recursive_split(f"{title}\n{text}")]

    def chunk_docs(self, text: str, title: str) -> List[str]:
        chunks: List[str] = []
        hierarchy: List[str] = [title]
        for header, body in self.split_by_headers(text):
            if header:
                level = header.count("#")
                hierarchy = hierarchy[:level]
                hierarchy.append(header.lstrip("#").strip())
            path = " > ".join(hierarchy)
            full = f"{path}\n{body}"
            t = count_tokens(full)
            if t <= self.chunk_tokens:
                if t >= MIN_CHUNK_TOKENS:
                    chunks.append(full.strip())
            else:
                for j, sc in enumerate(self.recursive_split(full)):
                    if j > 0:
                        sc = f"{path}\n{sc}"
                    chunks.append(sc.strip())
        return chunks or [c.strip() for c in self.recursive_split(f"{title}\n{text}")]

    def chunk_github_issue(self, title: str, text: str, meta: dict) -> List[str]:
        chunks: List[str] = []
        labels = _as_list(meta.get("labels"))
        state = meta.get("state") or "unknown"
        label_str = f" [{', '.join(labels)}]" if labels else ""
        body = f"{title}{label_str} (state: {state})\n{text}"
        if count_tokens(body) <= self.chunk_tokens:
            chunks.append(body.strip())
        else:
            chunks.extend(sc.strip() for sc in self.recursive_split(body))

        buffer: List[str] = []
        buffer_tokens = 0
        for comment in _as_list(meta.get("top_comments")):
            ctext = f"Comment on '{title}': {comment}"
            ct = count_tokens(ctext)
            if ct >= self.chunk_tokens:
                if buffer:
                    chunks.append("\n\n".join(buffer).strip())
                    buffer, buffer_tokens = [], 0
                chunks.extend(sc.strip() for sc in self.recursive_split(ctext))
            elif buffer_tokens + ct > self.chunk_tokens:
                if buffer:
                    chunks.append("\n\n".join(buffer).strip())
                buffer, buffer_tokens = [ctext], ct
            else:
                buffer.append(ctext)
                buffer_tokens += ct
        if buffer:
            merged = "\n\n".join(buffer).strip()
            if count_tokens(merged) >= MIN_CHUNK_TOKENS:
                chunks.append(merged)
        return chunks

    def chunk_github_discussion(self, title: str, text: str, meta: dict) -> List[str]:
        chunks: List[str] = []
        body = f"{title} (discussion, category: {meta.get('category') or ''})\n{text}"
        if count_tokens(body) <= self.chunk_tokens:
            chunks.append(body.strip())
        else:
            chunks.extend(sc.strip() for sc in self.recursive_split(body))
        answer = meta.get("answer_body")
        if answer and meta.get("is_answered"):
            atext = f"Accepted answer for '{title}': {answer}"
            if count_tokens(atext) <= self.chunk_tokens:
                chunks.append(atext.strip())
            else:
                chunks.extend(sc.strip() for sc in self.recursive_split(atext))
        return chunks

    def chunk_community(self, title: str, text: str, meta: dict) -> List[str]:
        chunks: List[str] = []
        post = f"{title}\n{text}"
        t = count_tokens(post)
        if t <= self.chunk_tokens:
            if t >= MIN_CHUNK_TOKENS:
                chunks.append(post.strip())
        else:
            chunks.extend(sc.strip() for sc in self.recursive_split(post))
        for comment in _as_list(meta.get("top_comments")):
            ctext = f"Community comment on '{title}': {comment}"
            ct = count_tokens(ctext)
            if ct < MIN_CHUNK_TOKENS:
                continue
            if ct <= self.chunk_tokens:
                chunks.append(ctext.strip())
            else:
                chunks.extend(sc.strip() for sc in self.recursive_split(ctext))
        return chunks

    def chunk_single(self, text: str, title: str) -> List[str]:
        full = f"{title}\n{text}"
        t = count_tokens(full)
        if t <= MAX_CHUNK_TOKENS:
            return [full.strip()] if t >= MIN_CHUNK_TOKENS else []
        return [sc.strip() for sc in self.recursive_split(full)]

    def chunk_generic(self, text: str, title: str) -> List[str]:
        return [sc.strip() for sc in self.recursive_split(f"{title}\n{text}")]

    # -- dispatcher -------------------------------------------------------

    def chunk_record(self, rec: dict) -> List[dict]:
        text = rec.get("text") or ""
        if not text.strip():
            return []
        title = rec.get("title") or ""
        stype = rec.get("source_type") or ""
        meta = rec.get("metadata") or {}

        if stype == "blog":
            texts = self.chunk_blog(text, title)
        elif stype == "official_docs":
            texts = self.chunk_docs(text, title)
        elif stype == "github_issue":
            texts = self.chunk_github_issue(title, text, meta)
        elif stype == "github_discussion":
            texts = self.chunk_github_discussion(title, text, meta)
        elif stype in ("github_release", "benchmark", "comparison_page"):
            texts = self.chunk_single(text, title)
        elif stype in ("community_hn", "community_reddit"):
            texts = self.chunk_community(title, text, meta)
        else:
            texts = self.chunk_generic(text, title)

        origin = rec.get("origin") or ""
        topics = _as_list(rec.get("topics")) or ["unclassified"]
        prefix = context_prefix(origin, stype, topics, self.topic_names)
        out = []
        for i, t in enumerate(texts):
            body = f"{prefix} {t}"
            out.append(
                {
                    "chunk_id": chunk_id(origin, rec.get("id") or "", i, body),
                    "parent_doc_id": rec.get("id") or "",
                    "chunk_index": i,
                    "text": body,
                    "token_count": count_tokens(body),
                    "competitor": origin,
                    "source_type": stype,
                    "source_url": rec.get("url") or "",
                    "source_title": title,
                    "topic_ids": list(topics),
                    "credibility": rec.get("credibility") or "",
                    "content_date": rec.get("content_date"),
                    "scraped_date": rec.get("scraped_date"),
                }
            )
        return out


class ChunkStage:
    """Actor-pool flat map: source-record batch in → chunk batch out."""

    def __init__(self, chunk_tokens: int = DEFAULT_CHUNK_TOKENS,
                 overlap_tokens: int = DEFAULT_OVERLAP_TOKENS,
                 topic_names: Optional[Dict[str, str]] = None):
        self.chunker = Chunker(chunk_tokens, overlap_tokens, topic_names)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        rows: List[dict] = []
        for rec in batch.to_dict("records"):
            rows.extend(self.chunker.chunk_record(rec))
        if not rows:
            return pd.DataFrame(
                {c: pd.Series(dtype=object) for c in
                 ("chunk_id", "parent_doc_id", "chunk_index", "text", "token_count",
                  "competitor", "source_type", "source_url", "source_title",
                  "topic_ids", "credibility", "content_date", "scraped_date")}
            )
        return pd.DataFrame(rows)


_TASK_CHUNKERS: Dict[tuple, "ChunkStage"] = {}


def _chunk_task_fn(kwargs: dict):
    """Stateless-task fallback: one cached ChunkStage per worker process
    (module-level), so tiny sessions where chained actor pools would starve
    the read stage still stream."""
    key = tuple(sorted((k, repr(v)) for k, v in kwargs.items()))

    def fn(batch):
        inst = _TASK_CHUNKERS.get(key)
        if inst is None:
            inst = ChunkStage(**kwargs)
            _TASK_CHUNKERS[key] = inst
        return inst(batch)

    return fn


def chunk_stage(ds, concurrency: int = 4, batch_size: int = 256, **kwargs):
    import ray

    avail = ray.available_resources().get("CPU", 8)
    if avail < 3:
        # chained actor pools deadlock on ≤2-CPU sessions (each pool's
        # min actor pins a CPU, starving the read tasks) — fall back to
        # plain tasks with a per-worker cached instance
        return ds.map_batches(_chunk_task_fn(kwargs), batch_format="pandas",
                              batch_size=batch_size)
    # autoscaling pool (min 1) — see transforms.tag_stage
    return ds.map_batches(
        ChunkStage,
        fn_constructor_kwargs=kwargs,
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=(1, max(1, concurrency)),
        # a 256-node run WILL lose actors: replace them without limit
        # (transient node loss), but bound per-task retries so a POISON
        # batch (one that deterministically kills its worker, e.g. an
        # OOM-sized document) fails the stage after 8 attempts instead of
        # livelocking kill/restart forever (tests/test_fault_tolerance.py)
        max_restarts=-1,
        max_task_retries=8,
    )
