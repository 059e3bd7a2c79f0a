"""SQLite-backed chat session store for the serve surface.

From-scratch reimplementation of the reference's session semantics
(reference: competitive-intel/webapp/sessions.py:22-320): users,
sessions and messages tables; keep-last-active ordering; per-session
token totals; LIKE-search over titles and message bodies; JSON export.
Differences from the reference are deliberate and small: connections are
per-call (the serve handler is multi-threaded; sqlite3 objects are not
thread-portable), timestamps are stored as integer milliseconds from an
injectable clock (so tests are deterministic — the reference relies on
sqlite CURRENT_TIMESTAMP), and ids come from an injectable counter-or-
uuid factory for the same reason.
"""

from __future__ import annotations

import json
import os
import sqlite3
import time
import uuid
from typing import Callable, Dict, List, Optional

_SCHEMA = """
CREATE TABLE IF NOT EXISTS users (
    username TEXT PRIMARY KEY,
    display_name TEXT,
    created_at_ms INTEGER NOT NULL
);
CREATE TABLE IF NOT EXISTS sessions (
    session_id TEXT PRIMARY KEY,
    username TEXT NOT NULL REFERENCES users(username),
    created_at_ms INTEGER NOT NULL,
    last_active_at_ms INTEGER NOT NULL,
    title TEXT
);
CREATE TABLE IF NOT EXISTS messages (
    message_id INTEGER PRIMARY KEY AUTOINCREMENT,
    session_id TEXT NOT NULL REFERENCES sessions(session_id),
    role TEXT NOT NULL CHECK (role IN ('user', 'assistant')),
    content TEXT NOT NULL,
    model TEXT,
    tokens_input INTEGER DEFAULT 0,
    tokens_output INTEGER DEFAULT 0,
    created_at_ms INTEGER NOT NULL
);
CREATE INDEX IF NOT EXISTS idx_messages_session
    ON messages(session_id, created_at_ms);
CREATE INDEX IF NOT EXISTS idx_sessions_username
    ON sessions(username, last_active_at_ms DESC);
"""


class SessionManager:
    def __init__(self, db_path: Optional[str] = None,
                 clock: Callable[[], int] = lambda: int(time.time() * 1000),
                 id_factory: Callable[[], str] = lambda: uuid.uuid4().hex):
        self.db_path = db_path or os.path.join(
            os.path.expanduser("~"), ".aiws_sessions.db")
        self._clock = clock
        self._new_id = id_factory
        with self._conn() as c:
            c.executescript(_SCHEMA)

    def _conn(self) -> sqlite3.Connection:
        c = sqlite3.connect(self.db_path)
        c.row_factory = sqlite3.Row
        return c

    # -- users ------------------------------------------------------------

    def get_or_create_user(self, username: str,
                           display_name: Optional[str] = None) -> Dict:
        with self._conn() as c:
            row = c.execute("SELECT * FROM users WHERE username=?",
                            (username,)).fetchone()
            if row is None:
                c.execute(
                    "INSERT INTO users (username, display_name, "
                    "created_at_ms) VALUES (?,?,?)",
                    (username, display_name or username, self._clock()))
                row = c.execute("SELECT * FROM users WHERE username=?",
                                (username,)).fetchone()
            return dict(row)

    # -- sessions ---------------------------------------------------------

    def create_session(self, username: str,
                       title: Optional[str] = None) -> str:
        self.get_or_create_user(username)
        sid = self._new_id()
        now = self._clock()
        with self._conn() as c:
            c.execute(
                "INSERT INTO sessions (session_id, username, created_at_ms,"
                " last_active_at_ms, title) VALUES (?,?,?,?,?)",
                (sid, username, now, now, title))
        return sid

    def list_sessions(self, username: str, limit: int = 20) -> List[Dict]:
        with self._conn() as c:
            rows = c.execute(
                "SELECT s.*, COUNT(m.message_id) AS n_messages FROM sessions"
                " s LEFT JOIN messages m ON m.session_id = s.session_id"
                " WHERE s.username=? GROUP BY s.session_id"
                " ORDER BY s.last_active_at_ms DESC, s.session_id"
                " LIMIT ?", (username, limit)).fetchall()
            return [dict(r) for r in rows]

    def get_session(self, session_id: str) -> Optional[Dict]:
        with self._conn() as c:
            row = c.execute("SELECT * FROM sessions WHERE session_id=?",
                            (session_id,)).fetchone()
            return dict(row) if row else None

    def update_session_title(self, session_id: str, title: str) -> None:
        with self._conn() as c:
            c.execute("UPDATE sessions SET title=? WHERE session_id=?",
                      (title, session_id))

    def delete_session(self, session_id: str) -> bool:
        with self._conn() as c:
            c.execute("DELETE FROM messages WHERE session_id=?",
                      (session_id,))
            cur = c.execute("DELETE FROM sessions WHERE session_id=?",
                            (session_id,))
            return cur.rowcount > 0

    def delete_all_sessions(self, username: str) -> int:
        with self._conn() as c:
            c.execute(
                "DELETE FROM messages WHERE session_id IN "
                "(SELECT session_id FROM sessions WHERE username=?)",
                (username,))
            cur = c.execute("DELETE FROM sessions WHERE username=?",
                            (username,))
            return cur.rowcount

    def search_sessions(self, username: str, query: str,
                        limit: int = 50) -> List[Dict]:
        """Title OR message-body LITERAL substring match, newest-active
        first (reference sessions.py:276-300).  The query is escaped so
        %/_ in user input match themselves, not as LIKE wildcards."""
        esc = query.replace("\\", "\\\\").replace("%", "\\%") \
            .replace("_", "\\_")
        like = f"%{esc}%"
        with self._conn() as c:
            rows = c.execute(
                "SELECT DISTINCT s.* FROM sessions s LEFT JOIN messages m"
                " ON m.session_id = s.session_id WHERE s.username=? AND"
                " (s.title LIKE ? ESCAPE '\\'"
                "  OR m.content LIKE ? ESCAPE '\\')"
                " ORDER BY s.last_active_at_ms DESC, s.session_id LIMIT ?",
                (username, like, like, limit)).fetchall()
            return [dict(r) for r in rows]

    # -- messages ---------------------------------------------------------

    def add_message(self, session_id: str, role: str, content: str,
                    model: Optional[str] = None, tokens_input: int = 0,
                    tokens_output: int = 0) -> int:
        now = self._clock()
        with self._conn() as c:
            cur = c.execute(
                "INSERT INTO messages (session_id, role, content, model,"
                " tokens_input, tokens_output, created_at_ms)"
                " VALUES (?,?,?,?,?,?,?)",
                (session_id, role, content, model, tokens_input,
                 tokens_output, now))
            c.execute(
                "UPDATE sessions SET last_active_at_ms=? WHERE session_id=?",
                (now, session_id))
            return int(cur.lastrowid)

    def get_recent_messages(self, session_id: str,
                            limit: int = 5) -> List[Dict]:
        """Last ``limit`` messages in CHRONOLOGICAL order (the reference's
        conversation-history window, sessions.py:191-206)."""
        with self._conn() as c:
            rows = c.execute(
                "SELECT * FROM (SELECT * FROM messages WHERE session_id=?"
                " ORDER BY created_at_ms DESC, message_id DESC LIMIT ?)"
                " ORDER BY created_at_ms, message_id",
                (session_id, limit)).fetchall()
            return [dict(r) for r in rows]

    def get_all_messages(self, session_id: str) -> List[Dict]:
        with self._conn() as c:
            rows = c.execute(
                "SELECT * FROM messages WHERE session_id=?"
                " ORDER BY created_at_ms, message_id",
                (session_id,)).fetchall()
            return [dict(r) for r in rows]

    def get_session_token_totals(self, session_id: str) -> Dict:
        with self._conn() as c:
            row = c.execute(
                "SELECT COALESCE(SUM(tokens_input),0) AS tokens_input,"
                " COALESCE(SUM(tokens_output),0) AS tokens_output,"
                " COUNT(*) AS n_messages FROM messages WHERE session_id=?",
                (session_id,)).fetchone()
            return dict(row)

    def export_session(self, session_id: str) -> Optional[Dict]:
        s = self.get_session(session_id)
        if s is None:
            return None
        return {"session": s, "messages": self.get_all_messages(session_id),
                "token_totals": self.get_session_token_totals(session_id)}

    def export_session_json(self, session_id: str) -> Optional[str]:
        d = self.export_session(session_id)
        return None if d is None else json.dumps(d, sort_keys=True)
