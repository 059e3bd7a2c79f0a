"""Serve surface: SQLite sessions, SSE query engine, stdlib HTTP app.

Mirrors the reference webapp dataflow (webapp/app.py:158-520,
webapp/rag/query_engine.py:367-660, webapp/sessions.py:22-320) — the
LLM synthesis is the deterministic stub, everything around it is real
and tested over actual localhost sockets."""

import json

import requests

from ai_intel_web_scraper_ray.pipelines.serve import (
    QueryEngine,
    _parse_sse,
    analyze_query,
    serve_app,
)
from ai_intel_web_scraper_ray.state.sessions import SessionManager

from .test_retrieval_generate import chunks_ds


def make_mgr(tmp_path):
    tick = iter(range(1, 10_000))
    ids = iter(f"sid{i}" for i in range(1, 100))
    return SessionManager(db_path=str(tmp_path / "s.db"),
                          clock=lambda: next(tick),
                          id_factory=lambda: next(ids))


class TestSessionManager:
    def test_user_session_message_roundtrip(self, tmp_path):
        m = make_mgr(tmp_path)
        m.get_or_create_user("ada")
        sid = m.create_session("ada", title=None)
        m.add_message(sid, "user", "what is minhash?")
        m.add_message(sid, "assistant", "a sketch", model="stub",
                      tokens_input=4, tokens_output=2)
        msgs = m.get_all_messages(sid)
        assert [x["role"] for x in msgs] == ["user", "assistant"]
        tot = m.get_session_token_totals(sid)
        assert (tot["tokens_input"], tot["tokens_output"],
                tot["n_messages"]) == (4, 2, 2)

    def test_list_orders_by_last_active(self, tmp_path):
        m = make_mgr(tmp_path)
        s1 = m.create_session("ada")
        s2 = m.create_session("ada")
        m.add_message(s1, "user", "bump")   # s1 now most recent
        ids = [s["session_id"] for s in m.list_sessions("ada")]
        assert ids == [s1, s2]
        assert m.list_sessions("ada")[0]["n_messages"] == 1

    def test_search_matches_title_and_body(self, tmp_path):
        m = make_mgr(tmp_path)
        s1 = m.create_session("ada", title="minhash talk")
        s2 = m.create_session("ada")
        m.add_message(s2, "user", "tell me about minhash banding")
        s3 = m.create_session("ada", title="unrelated")
        got = {s["session_id"] for s in m.search_sessions("ada", "minhash")}
        assert got == {s1, s2}
        assert s3 not in got

    def test_delete_and_export(self, tmp_path):
        m = make_mgr(tmp_path)
        sid = m.create_session("ada", title="t")
        m.add_message(sid, "user", "hi")
        exp = m.export_session(sid)
        assert exp["session"]["title"] == "t"
        assert len(exp["messages"]) == 1
        assert m.delete_session(sid) is True
        assert m.get_session(sid) is None
        assert m.get_all_messages(sid) == []
        assert m.export_session(sid) is None

    def test_delete_all_sessions_scoped_to_user(self, tmp_path):
        m = make_mgr(tmp_path)
        m.create_session("ada")
        m.create_session("ada")
        keep = m.create_session("bob")
        assert m.delete_all_sessions("ada") == 2
        assert [s["session_id"] for s in m.list_sessions("bob")] == [keep]

    def test_recent_messages_window_chronological(self, tmp_path):
        m = make_mgr(tmp_path)
        sid = m.create_session("ada")
        for i in range(7):
            m.add_message(sid, "user", f"m{i}")
        recent = m.get_recent_messages(sid, limit=3)
        assert [x["content"] for x in recent] == ["m4", "m5", "m6"]


class TestQueryEngine:
    def test_analyze_query_deterministic(self):
        a = analyze_query("How does the fast query engine join tables?")
        assert a == analyze_query(
            "How does the fast query engine join tables?")
        assert 1 <= len(a["sub_queries"]) <= 3
        assert a["hyde_passage"]

    def test_stream_event_sequence_and_blocking_parity(self, tmp_path):
        eng = QueryEngine({"main": chunks_ds()})
        events = list(eng.query_stream("fast query engine table",
                                       n_results=5))
        kinds = [_parse_sse(e)[0] for e in events]
        # the reference's event order (query_engine.py:486-660)
        assert kinds[0] == "status" and kinds[-1] == "done"
        assert "citations_sources" in kinds and "usage" in kinds
        assert kinds.index("citations_sources") < kinds.index("usage")
        assert kinds.index("usage") < kinds.index("metadata")
        assert kinds.index("metadata") < kinds.index("followups")
        res = eng.query("fast query engine table", n_results=5)
        streamed = "".join(_parse_sse(e)[1]["text"] for e in events
                           if _parse_sse(e)[0] == "token")
        assert res["answer"] == streamed
        assert len(res["citations"]) >= 1
        assert res["citations"][0]["index"] == 1
        assert res["metadata"]["chunks_retrieved"] >= 1

    def test_empty_retrieval_fallback(self):
        eng = QueryEngine({"main": chunks_ds()})
        res = eng.query("anything", competitor_filter=["nonexistent-co"])
        assert res["answer"].startswith("No relevant information")
        assert res["citations"] == []

    def test_session_persistence_and_auto_title(self, tmp_path):
        eng = QueryEngine({"main": chunks_ds()})
        m = make_mgr(tmp_path)
        sid = m.create_session("ada")
        q = "fast query engine table"
        eng.query(q, n_results=4, session_id=sid, session_mgr=m)
        msgs = m.get_all_messages(sid)
        assert [x["role"] for x in msgs] == ["user", "assistant"]
        assert msgs[0]["content"] == q
        assert msgs[1]["tokens_output"] > 0
        assert m.get_session(sid)["title"] == q


class TestServeApp:
    def _up(self, tmp_path):
        eng = QueryEngine({"main": chunks_ds()})
        mgr = make_mgr(tmp_path)
        srv, port = serve_app(eng, mgr)
        return srv, f"http://127.0.0.1:{port}"

    def test_full_api_roundtrip(self, tmp_path):
        srv, base = self._up(tmp_path)
        try:
            u = requests.post(f"{base}/api/login",
                              json={"username": "ada"}).json()
            assert u["username"] == "ada"
            sid = requests.post(f"{base}/api/sessions",
                                json={"username": "ada"}).json()["session_id"]
            st = requests.get(f"{base}/api/status").json()
            assert st["collections"] == ["main"]
            assert st["n_chunks"]["main"] > 0

            r = requests.post(f"{base}/api/query", json={
                "query": "fast query engine table", "n_results": 4,
                "session_id": sid, "username": "ada"}).json()
            assert r["citations"] and r["answer"].startswith("Q:")

            msgs = requests.get(
                f"{base}/api/sessions/{sid}/messages").json()
            assert [m["role"] for m in msgs] == ["user", "assistant"]
            tok = requests.get(f"{base}/api/sessions/{sid}/tokens").json()
            assert tok["tokens_output"] > 0
            exp = requests.get(f"{base}/api/sessions/{sid}/export").json()
            assert exp["session"]["title"].startswith("fast query")

            found = requests.get(
                f"{base}/api/sessions/search",
                params={"username": "ada", "q": "engine"}).json()
            assert [s["session_id"] for s in found] == [sid]

            assert requests.delete(
                f"{base}/api/sessions/{sid}").json()["deleted"] is True
            assert requests.get(
                f"{base}/api/sessions",
                params={"username": "ada"}).json() == []
        finally:
            srv.shutdown()
            srv.server_close()

    def test_sse_stream_over_socket(self, tmp_path):
        srv, base = self._up(tmp_path)
        try:
            sid = requests.post(f"{base}/api/sessions",
                                json={"username": "ada"}).json()["session_id"]
            with requests.post(f"{base}/api/query-stream", json={
                    "query": "fast query engine table", "n_results": 4,
                    "session_id": sid}, stream=True) as resp:
                assert resp.headers["Content-Type"] == "text/event-stream"
                raw = b"".join(resp.iter_content(8192)).decode()
            events = [e for e in raw.split("\n\n") if e.strip()]
            kinds = [e.split("event: ", 1)[1].split("\n", 1)[0]
                     for e in events]
            assert kinds[-1] == "done"
            assert "citations_sources" in kinds
            tokens = "".join(
                json.loads(e.split("data: ", 1)[1])["text"]
                for e in events if e.startswith("event: token"))
            blocking = requests.post(f"{base}/api/query", json={
                "query": "fast query engine table",
                "n_results": 4}).json()
            assert tokens == blocking["answer"]
            # post-stream persistence happened
            msgs = requests.get(
                f"{base}/api/sessions/{sid}/messages").json()
            assert [m["role"] for m in msgs] == ["user", "assistant"]
        finally:
            srv.shutdown()
            srv.server_close()

    def test_delete_all_and_404s(self, tmp_path):
        srv, base = self._up(tmp_path)
        try:
            requests.post(f"{base}/api/sessions", json={"username": "ada"})
            requests.post(f"{base}/api/sessions", json={"username": "ada"})
            d = requests.delete(f"{base}/api/sessions",
                                params={"username": "ada"}).json()
            assert d["deleted"] == 2
            assert requests.get(
                f"{base}/api/sessions/nope/export").status_code == 404
            assert requests.delete(
                f"{base}/api/sessions/nope").status_code == 404
            assert requests.get(f"{base}/api/bogus").status_code == 404
        finally:
            srv.shutdown()
            srv.server_close()


class TestSseMidStreamError:
    def test_error_arrives_as_sse_event_with_clean_framing(self, tmp_path):
        """An engine failure AFTER headers are sent must arrive as an
        `event: error` inside the chunked stream with a proper terminal
        chunk — never a second HTTP response."""
        eng = QueryEngine({"main": chunks_ds()})

        def boom(*a, **k):
            yield "event: status\ndata: {}\n\n"
            raise RuntimeError("mid-stream failure")

        eng.query_stream = boom
        mgr = make_mgr(tmp_path)
        srv, port = serve_app(eng, mgr)
        try:
            with requests.post(
                    f"http://127.0.0.1:{port}/api/query-stream",
                    json={"query": "x"}, stream=True) as resp:
                raw = b"".join(resp.iter_content(8192)).decode()
            events = [e for e in raw.split("\n\n") if e.strip()]
            kinds = [e.split("event: ", 1)[1].split("\n", 1)[0]
                     for e in events]
            assert kinds == ["status", "error"]
            assert "mid-stream failure" in events[-1]
        finally:
            srv.shutdown()
            srv.server_close()
