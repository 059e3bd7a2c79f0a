"""Query-time serve surface: RAG query engine + stdlib HTTP/SSE app.

From-scratch reimplementation of the reference's FastAPI webapp dataflow
(reference: competitive-intel/webapp/app.py:158-520,
webapp/rag/query_engine.py:367-660) on the standard library only —
FastAPI/uvicorn are not in this environment, so the app is a
``ThreadingHTTPServer`` speaking the same JSON endpoints and the same
``event:``/``data:`` SSE framing.  The LLM synthesis step is the
documented deterministic stub (no network): the answer is assembled from
the retrieved chunks themselves, streamed token-event by token-event,
with usage counted by the offline tokenizer.  Everything the reference
does BEFORE and AFTER the LLM call — query analysis fan-out (sub-queries
+ HyDE), filtered multi-strategy retrieval, RRF fusion, citation build +
dedup, SSE event sequence, session persistence with auto-titling, token
accounting — is real and mirrors the reference shape:

- event sequence (query_engine.py:486-660): status(analyzing) →
  status(analyzing_done) → status(retrieving) → status(retrieving_done)
  → citations_sources → status(synthesizing) → token* → usage →
  metadata → followups → done; the empty-retrieval fallback emits the
  reference's exact no-information token then metadata/done.
- session persistence after the stream completes (app.py:238-263):
  user message, assistant message with usage, auto-title from the first
  query (80 chars + ellipsis).

Retrieval scale shape: the serve path holds only Dataset handles; every
query runs the ChunkRetriever's distributed top-k (per-block partials,
driver merges ≤ n·blocks rows) and the citation build filters the chunk
table by a ≤n_results id set — never a driver-side copy of the corpus.
"""

from __future__ import annotations

import json
import time
from typing import Dict, List, Optional, Sequence

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.tokenizer import count_tokens
from .retrieval import ChunkRetriever, dedup_citations

_STUB_MODEL = "stub-synthesizer-v1"
_NO_INFO = ("No relevant information was found in the competitive "
            "intelligence database.")

_STOPWORDS = frozenset(
    "the a an and or of to in on for with is are was were be been how what"
    " why when where which who does do did can could should would".split())


def analyze_query(query: str, max_sub_queries: int = 3) -> Dict:
    """Deterministic stand-in for the reference's LLM query analysis
    (query_engine.py:667-720): sub-queries are consecutive keyword
    bigrams over the stopword-stripped question, the HyDE passage is a
    templated hypothetical answer built from the same keywords."""
    words = [w.strip("?.,!:;\"'()").lower() for w in query.split()]
    kws = [w for w in words if w and w not in _STOPWORDS]
    subs = [" ".join(kws[i:i + 2]) for i in range(0, len(kws) - 1, 2)]
    subs = [s for s in subs[:max_sub_queries] if s]
    hyde = ("A documentation passage answering this would state that "
            + " and ".join(kws[:6]) + " work as follows.") if kws else None
    return {"sub_queries": subs, "hyde_passage": hyde, "keywords": kws}


class QueryEngine:
    """Retrieval + deterministic synthesis over one or more chunk
    collections, with the reference's query/query_stream surface."""

    def __init__(self, collections: Dict[str, "object"],
                 embed_dim: int = 32, fast_mode: bool = False):
        self.retriever = ChunkRetriever(collections, embed_dim=embed_dim)
        self.collections = collections
        self.fast_mode = fast_mode
        self.model = _STUB_MODEL

    # -- internals --------------------------------------------------------

    def _chunk_rows(self, chunk_ids: Sequence[str]) -> pd.DataFrame:
        """Fetch full rows for ≤n_results fused chunk ids — a broadcast
        ``pc.is_in`` filter over the collection Datasets (bounded by k,
        never a corpus copy)."""
        ids = pa.array(list(chunk_ids), pa.string())
        parts = []
        for ds in self.collections.values():
            t = ds.map_batches(
                lambda t: t.filter(pc.is_in(t["chunk_id"], value_set=ids)),
                batch_format="pyarrow").to_pandas()
            if len(t):
                parts.append(t)
        if not parts:
            return pd.DataFrame({"chunk_id": []})
        return pd.concat(parts, ignore_index=True) \
            .drop_duplicates("chunk_id")

    def _build_citations(self, fused: pd.DataFrame) -> List[Dict]:
        """Reference Citation shape (query_engine.py:44-57) with
        keep-first (parent_doc_id, source_url) dedup
        (query_engine.py:890-918)."""
        if len(fused) == 0:
            return []
        rows = self._chunk_rows(fused["chunk_id"])
        if len(rows) == 0:
            return []
        order = {cid: i for i, cid in enumerate(fused["chunk_id"])}
        rows = rows[rows["chunk_id"].isin(order)].copy()
        rows["_rank"] = rows["chunk_id"].map(order)
        rows = rows.sort_values("_rank")
        rows = dedup_citations(rows)
        out = []
        for i, r in enumerate(rows.itertuples(index=False), start=1):
            topics = getattr(r, "topic_ids", None)
            primary = ""
            if topics is not None and len(topics):
                primary = str(topics[0])
            out.append({
                "index": i,
                "chunk_id": r.chunk_id,
                "source_title": str(getattr(r, "source_title", "") or ""),
                "source_url": str(getattr(r, "source_url", "") or ""),
                "source_type": str(getattr(r, "source_type", "") or ""),
                "competitor": str(getattr(r, "competitor", "") or ""),
                "primary_topic": primary,
                "text_preview": (str(getattr(r, "text", "") or ""))[:200],
            })
        return out

    def _synthesize(self, query: str, citations: List[Dict]) -> str:
        """Deterministic grounded answer: one cited line per source, the
        shape a real LLM call would replace (swap point documented —
        query_engine.py:560-650)."""
        lines = [f"Q: {query}", "Grounded findings:"]
        for c in citations:
            lines.append(
                f"[{c['index']}] ({c['competitor']} | {c['source_type']}) "
                f"{c['text_preview'][:120]}")
        return "\n".join(lines)

    def _follow_ups(self, query: str, citations: List[Dict]) -> List[str]:
        comps = sorted({c["competitor"] for c in citations if c["competitor"]})
        return [f"What else does {c} say about this?" for c in comps[:3]]

    # -- blocking query ----------------------------------------------------

    def query(self, query: str, competitor_filter=None, topic_filter=None,
              source_type_filter=None, n_results: int = 12,
              session_id: Optional[str] = None, username: Optional[str] = None,
              session_mgr=None) -> Dict:
        events = list(self.query_stream(
            query, competitor_filter=competitor_filter,
            topic_filter=topic_filter,
            source_type_filter=source_type_filter, n_results=n_results,
            session_id=session_id, username=username,
            session_mgr=session_mgr))
        answer_parts, citations, metadata, followups = [], [], {}, []
        for ev in events:
            kind, data = _parse_sse(ev)
            if kind == "token":
                answer_parts.append(data.get("text", ""))
            elif kind == "citations_sources":
                citations = data
            elif kind == "metadata":
                metadata = data
            elif kind == "followups":
                followups = data
        return {"query": query, "answer": "".join(answer_parts),
                "citations": citations,
                "follow_up_questions": followups, "metadata": metadata}

    # -- streaming query ---------------------------------------------------

    def query_stream(self, query: str, competitor_filter=None,
                     topic_filter=None, source_type_filter=None,
                     n_results: int = 12, session_id: Optional[str] = None,
                     username: Optional[str] = None, session_mgr=None):
        t_start = time.time()
        metadata: Dict = {"timings": {}}

        def sse(event: str, data) -> str:
            return f"event: {event}\ndata: {json.dumps(data)}\n\n"

        yield sse("status", {"step": "analyzing",
                             "message": "Analyzing query..."})
        t1 = time.time()
        analysis = {} if self.fast_mode else analyze_query(query)
        metadata["timings"]["query_analysis_ms"] = int((time.time() - t1) * 1000)
        yield sse("status", {"step": "analyzing_done",
                             "ms": metadata["timings"]["query_analysis_ms"]})

        yield sse("status", {"step": "retrieving",
                             "message": "Searching vector database..."})
        t2 = time.time()
        fused = self.retriever.retrieve(
            query, sub_queries=analysis.get("sub_queries"),
            hyde_passage=analysis.get("hyde_passage"),
            competitors=competitor_filter or None,
            topics=topic_filter or None,
            source_types=source_type_filter or None, n_results=n_results)
        metadata["timings"]["retrieval_ms"] = int((time.time() - t2) * 1000)
        metadata["chunks_retrieved"] = int(len(fused))
        yield sse("status", {"step": "retrieving_done",
                             "ms": metadata["timings"]["retrieval_ms"],
                             "chunks": int(len(fused))})

        if len(fused) == 0:
            metadata["llm_model"] = self.model
            metadata["timings"]["total_ms"] = int((time.time() - t_start) * 1000)
            answer = _NO_INFO
            yield sse("token", {"text": answer})
            yield sse("metadata", metadata)
            yield sse("done", {})
            self._persist(session_mgr, session_id, query, answer,
                          usage={"input_tokens": count_tokens(query),
                                 "output_tokens": count_tokens(answer)})
            return

        citations = self._build_citations(fused)
        yield sse("citations_sources", citations)

        yield sse("status", {"step": "synthesizing",
                             "message": "Synthesizing..."})
        answer = self._synthesize(query, citations)
        # stream in deterministic line-grained token events
        for line in answer.splitlines(keepends=True):
            yield sse("token", {"text": line})
        usage = {"input_tokens": count_tokens(query) + sum(
                     count_tokens(c["text_preview"]) for c in citations),
                 "output_tokens": count_tokens(answer)}
        yield sse("usage", usage)
        metadata["llm_model"] = self.model
        metadata["n_citations"] = len(citations)
        metadata["timings"]["total_ms"] = int((time.time() - t_start) * 1000)
        yield sse("metadata", metadata)
        yield sse("followups", self._follow_ups(query, citations))
        yield sse("done", {})
        self._persist(session_mgr, session_id, query, answer, usage)

    def _persist(self, session_mgr, session_id, query, answer, usage):
        """Post-stream session persistence + auto-title (app.py:238-263)."""
        if session_mgr is None or not session_id:
            return
        session_mgr.add_message(session_id, "user", query)
        session_mgr.add_message(
            session_id, "assistant", answer, model=self.model,
            tokens_input=int(usage.get("input_tokens", 0)),
            tokens_output=int(usage.get("output_tokens", 0)))
        s = session_mgr.get_session(session_id)
        if s and not s.get("title"):
            title = query[:80] + ("..." if len(query) > 80 else "")
            session_mgr.update_session_title(session_id, title)


def _parse_sse(ev: str):
    kind = ev.split("event: ", 1)[1].split("\n", 1)[0]
    data = json.loads(ev.split("data: ", 1)[1].split("\n", 1)[0])
    return kind, data


# ---------------------------------------------------------------------------
# stdlib HTTP app
# ---------------------------------------------------------------------------


def serve_app(engine: QueryEngine, session_mgr, host: str = "127.0.0.1",
              port: int = 0):
    """Start the serve app; returns (server, port).  Call
    ``server.shutdown()`` to stop.  Endpoints mirror app.py's API routes
    (login, sessions CRUD/search/export/messages/tokens, query,
    query-stream, status)."""
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from urllib.parse import parse_qs, urlparse

    def make_handler():
        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, *a):
                pass

            def _json(self, obj, status: int = 200):
                body = json.dumps(obj).encode()
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _body(self) -> Dict:
                n = int(self.headers.get("Content-Length", "0") or 0)
                if n == 0:
                    return {}
                return json.loads(self.rfile.read(n).decode() or "{}")

            # -- GET -----------------------------------------------------

            def do_GET(self):
                u = urlparse(self.path)
                q = {k: v[0] for k, v in parse_qs(u.query).items()}
                parts = [p for p in u.path.split("/") if p]
                try:
                    if u.path == "/api/status":
                        n_chunks = {name: ds.count() for name, ds
                                    in engine.collections.items()}
                        return self._json({
                            "collections": sorted(engine.collections),
                            "n_chunks": n_chunks,
                            "model": engine.model})
                    if u.path == "/api/sessions":
                        return self._json(session_mgr.list_sessions(
                            q.get("username", ""),
                            limit=int(q.get("limit", "20"))))
                    if u.path == "/api/sessions/search":
                        return self._json(session_mgr.search_sessions(
                            q.get("username", ""), q.get("q", "")))
                    if (len(parts) == 4 and parts[:2] == ["api", "sessions"]
                            and parts[3] == "messages"):
                        return self._json(
                            session_mgr.get_all_messages(parts[2]))
                    if (len(parts) == 4 and parts[:2] == ["api", "sessions"]
                            and parts[3] == "tokens"):
                        return self._json(
                            session_mgr.get_session_token_totals(parts[2]))
                    if (len(parts) == 4 and parts[:2] == ["api", "sessions"]
                            and parts[3] == "export"):
                        d = session_mgr.export_session(parts[2])
                        if d is None:
                            return self._json({"detail": "not found"}, 404)
                        return self._json(d)
                    return self._json({"detail": "not found"}, 404)
                except Exception as e:  # pragma: no cover - defensive 500
                    return self._json({"detail": str(e)}, 500)

            # -- POST ----------------------------------------------------

            def do_POST(self):
                u = urlparse(self.path)
                try:
                    req = self._body()
                    if u.path == "/api/login":
                        return self._json(session_mgr.get_or_create_user(
                            req["username"], req.get("display_name")))
                    if u.path == "/api/sessions":
                        sid = session_mgr.create_session(
                            req["username"], req.get("title"))
                        return self._json({"session_id": sid})
                    if u.path == "/api/query":
                        return self._json(engine.query(
                            req["query"],
                            competitor_filter=req.get("competitor_filter"),
                            topic_filter=req.get("topic_filter"),
                            source_type_filter=req.get("source_type_filter"),
                            n_results=int(req.get("n_results", 12)),
                            session_id=req.get("session_id"),
                            username=req.get("username"),
                            session_mgr=session_mgr))
                    if u.path == "/api/query-stream":
                        self.send_response(200)
                        self.send_header("Content-Type", "text/event-stream")
                        self.send_header("Cache-Control", "no-cache")
                        self.send_header("Transfer-Encoding", "chunked")
                        self.end_headers()

                        def chunk(ev: str) -> None:
                            b = ev.encode()
                            self.wfile.write(
                                f"{len(b):X}\r\n".encode() + b + b"\r\n")

                        # once the 200 + chunked headers are out, an
                        # engine error must arrive as an SSE error EVENT
                        # inside the stream (app.py:265-267) — emitting a
                        # second HTTP response here would corrupt the
                        # chunk framing on the keep-alive connection
                        try:
                            for ev in engine.query_stream(
                                    req["query"],
                                    competitor_filter=req.get(
                                        "competitor_filter"),
                                    topic_filter=req.get("topic_filter"),
                                    source_type_filter=req.get(
                                        "source_type_filter"),
                                    n_results=int(req.get("n_results", 12)),
                                    session_id=req.get("session_id"),
                                    username=req.get("username"),
                                    session_mgr=session_mgr):
                                chunk(ev)
                        except Exception as e:
                            chunk("event: error\ndata: "
                                  + json.dumps({"detail": str(e)})
                                  + "\n\n")
                        self.wfile.write(b"0\r\n\r\n")
                        return
                    return self._json({"detail": "not found"}, 404)
                except Exception as e:
                    return self._json({"detail": str(e)}, 500)

            # -- DELETE --------------------------------------------------

            def do_DELETE(self):
                u = urlparse(self.path)
                q = {k: v[0] for k, v in parse_qs(u.query).items()}
                parts = [p for p in u.path.split("/") if p]
                try:
                    if u.path.split("?")[0] == "/api/sessions" and \
                            "username" in q:
                        return self._json({"deleted": session_mgr
                                           .delete_all_sessions(
                                               q["username"])})
                    if len(parts) == 3 and parts[:2] == ["api", "sessions"]:
                        ok = session_mgr.delete_session(parts[2])
                        return self._json({"deleted": bool(ok)},
                                          200 if ok else 404)
                    return self._json({"detail": "not found"}, 404)
                except Exception as e:  # pragma: no cover - defensive 500
                    return self._json({"detail": str(e)}, 500)

        return Handler

    srv = ThreadingHTTPServer((host, port), make_handler())
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, srv.server_address[1]
