"""Randomized brute-force conformance for this session's operators
(session table, EWMA recurrence, heavy hitters, KMV sketch, PageRank,
triangle census) — the driver gate pins them on the fixed corpus; these
cover random inputs across seeds."""

from __future__ import annotations

import hashlib
import itertools

import numpy as np
import pandas as pd
import pytest

from ai_intel_web_scraper_ray.pipelines import relational as rel


def _random_events(seed: int, n: int = 400) -> pd.DataFrame:
    rng = np.random.RandomState(seed)
    base = pd.Timestamp("2024-01-01").value
    return pd.DataFrame({
        "event_id": np.arange(n, dtype="int64"),
        "ts": pd.to_datetime(
            base + rng.randint(0, 5 * 86400 * 10**9, size=n), unit="ns"
        ).floor("us"),
        "user_id": rng.randint(0, 10, size=n).astype("int64"),
        "event_type": rng.choice(
            ["purchase", "click", "view", "error", "signup"], size=n),
        "value": np.round(rng.uniform(0, 30, size=n), 2),
        "props": ['{"k": 1}'] * n,
    })


@pytest.fixture(params=[3, 41, 77])
def events_dir(request, tmp_path):
    df = _random_events(request.param)
    df.to_parquet(tmp_path / "events.parquet")
    return str(tmp_path), df


class TestSessionTable:
    def test_matches_bruteforce(self, events_dir):
        sf_dir, df = events_dir
        got = rel.events_session_table(sf_dir)
        gap = pd.Timedelta(minutes=30)
        rows = []
        for uid, g in df.sort_values(["user_id", "ts"]).groupby("user_id"):
            sid = 0
            prev = None
            bucket: list = []
            for ts in g["ts"]:
                if prev is not None and ts - prev > gap:
                    rows.append((uid, sid, bucket[0], bucket[-1],
                                 len(bucket)))
                    sid += 1
                    bucket = []
                bucket.append(ts)
                prev = ts
            rows.append((uid, sid, bucket[0], bucket[-1], len(bucket)))
        exp = pd.DataFrame(rows, columns=[
            "user_id", "session_id", "start_ts", "end_ts", "n_events"]) \
            .sort_values(["user_id", "session_id"]).reset_index(drop=True)
        for c in ("user_id", "session_id", "n_events"):
            exp[c] = exp[c].astype("int64")
        pd.testing.assert_frame_equal(got, exp)


class TestDailyEwma:
    def test_matches_bruteforce(self, events_dir):
        sf_dir, df = events_dir
        got = rel.events_daily_ewma(sf_dir)
        d = df.copy()
        d["day"] = d["ts"].dt.floor("D")
        counts = d.groupby(["event_type", "day"]).size().rename("n") \
            .reset_index()
        rows = []
        for et, g in counts.groupby("event_type"):
            g = g.sort_values("day")
            acc = None
            for _, r in g.iterrows():
                acc = int(r["n"]) if acc is None \
                    else (3 * acc + int(r["n"])) // 4
                rows.append((et, r["day"], int(r["n"]), acc))
        exp = pd.DataFrame(rows, columns=["event_type", "day", "n",
                                          "ewma_q"]) \
            .sort_values(["event_type", "day"]).reset_index(drop=True)
        for c in ("n", "ewma_q"):
            exp[c] = exp[c].astype("int64")
        pd.testing.assert_frame_equal(got, exp)


class TestTopUsersAndKmv:
    def test_top_users(self, events_dir):
        sf_dir, df = events_dir
        got = rel.events_top_users(sf_dir)
        vc = df.groupby("user_id").size().rename("n").reset_index()
        exp = vc.sort_values(["n", "user_id"], ascending=[False, True],
                             kind="mergesort").head(20) \
            .reset_index(drop=True).astype("int64")
        pd.testing.assert_frame_equal(got, exp)

    def test_kmv(self, events_dir):
        sf_dir, df = events_dir
        got = rel.events_kmv_distinct(sf_dir)
        rows = []
        for et, g in df.groupby("event_type"):
            hs = sorted({int(hashlib.md5(str(u).encode()).hexdigest()[:8],
                             16) for u in g["user_id"].unique()})
            if len(hs) < 8:
                continue
            kth = hs[7]
            rows.append((et, kth, 7 * 4294967296 // kth))
        exp = pd.DataFrame(rows, columns=["event_type", "kth_hash",
                                          "est_users"]) \
            .sort_values("event_type").reset_index(drop=True)
        for c in ("kth_hash", "est_users"):
            exp[c] = exp[c].astype("int64")
        pd.testing.assert_frame_equal(got, exp)


def _random_lineitem(seed: int, n_orders: int = 80,
                     n_parts: int = 25) -> pd.DataFrame:
    rng = np.random.RandomState(seed)
    rows = []
    for ok in range(n_orders):
        for pk in rng.choice(n_parts, size=rng.randint(2, 6),
                             replace=False):
            rows.append((ok, int(pk), int(rng.randint(1, 4))))
    return pd.DataFrame(rows, columns=["l_orderkey", "l_partkey",
                                       "l_suppkey"]).astype("int64")


@pytest.fixture(params=[5, 19])
def lineitem_dir(request, tmp_path):
    df = _random_lineitem(request.param)
    df.to_parquet(tmp_path / "lineitem.parquet")
    return str(tmp_path), df


def _edges(df: pd.DataFrame) -> dict:
    """directed (src, dst) -> co-order count."""
    e: dict = {}
    for _, g in df.drop_duplicates(["l_orderkey", "l_partkey"]) \
            .groupby("l_orderkey"):
        for a, b in itertools.permutations(g["l_partkey"].tolist(), 2):
            e[(a, b)] = e.get((a, b), 0) + 1
    return e


class TestPagerank:
    def test_matches_bruteforce(self, lineitem_dir):
        sf_dir, df = lineitem_dir
        got = rel.parts_pagerank(sf_dir)
        e = _edges(df)
        outw: dict = {}
        for (s, _d), n in e.items():
            outw[s] = outw.get(s, 0) + n
        r1: dict = {}
        for (s, d), n in e.items():
            r1[d] = r1.get(d, 0) + 1_000_000 * n // outw[s]
        r1 = {d: 150_000 + 850 * v // 1_000 for d, v in r1.items()}
        r2: dict = {}
        for (s, d), n in e.items():
            r2[d] = r2.get(d, 0) + r1[s] * n // outw[s]
        r2 = {d: 150_000 + 850 * v // 1_000 for d, v in r2.items()}
        exp = pd.DataFrame(sorted(r2.items(),
                                  key=lambda kv: (-kv[1], kv[0]))[:20],
                           columns=["part", "rank_ppm"]).astype("int64")
        pd.testing.assert_frame_equal(got, exp)


class TestTriangles:
    def test_matches_bruteforce(self, lineitem_dir):
        sf_dir, df = lineitem_dir
        got = rel.parts_triangles(sf_dir)
        e = _edges(df)
        und = {(a, b) for (a, b), n in e.items() if a < b and n >= 2}
        nodes = sorted({x for ab in und for x in ab})
        adj = {x: {b for (a, b) in und if a == x} for x in nodes}
        wedges = sum(len(list(itertools.combinations(sorted(adj[x]), 2)))
                     for x in nodes)
        tris = sum(1 for x in nodes
                   for (y, z) in itertools.combinations(sorted(adj[x]), 2)
                   if (y, z) in und)
        exp = pd.DataFrame({"n_edges": [len(und)], "n_wedges": [wedges],
                            "n_triangles": [tris]}).astype("int64")
        pd.testing.assert_frame_equal(got, exp)


class TestEmptyInputGuards:
    """Degenerate corpora that collapse every bucket to an empty frame
    (Ray drops the block schema) — each operator must return its typed
    empty/zero result like its oracle, not crash."""

    def test_inverted_index_empty_shard(self, tmp_path):
        from ai_intel_web_scraper_ray.pipelines import docqueries as dq
        df = pd.DataFrame({"doc_id": np.arange(1, 17, dtype="int64"),
                           "lang": ["en"] * 16,
                           "text": ["alpha beta"] * 16})
        df.to_parquet(tmp_path / "documents.parquet")
        out = dq.docs_inverted_index(str(tmp_path))
        assert list(out.columns) == ["word", "df_docs", "postings"]
        assert len(out) == 0

    def test_vocab_overlap_single_language(self, tmp_path):
        from ai_intel_web_scraper_ray.pipelines import docqueries as dq
        df = pd.DataFrame({"doc_id": np.arange(6, dtype="int64"),
                           "lang": ["en"] * 6,
                           "text": ["alpha beta gamma"] * 6})
        df.to_parquet(tmp_path / "documents.parquet")
        out = dq.docs_lang_vocab_overlap(str(tmp_path))
        assert list(out.columns) == ["lang_a", "lang_b", "n_shared"]
        assert len(out) == 0

    def test_incremental_dedup_no_arrivals(self, tmp_path):
        from ai_intel_web_scraper_ray.pipelines import docqueries as dq
        df = pd.DataFrame({"doc_id": np.arange(0, 20, 2, dtype="int64"),
                           "lang": ["en"] * 10,
                           "text": [f"doc {i}" for i in range(10)]})
        df.to_parquet(tmp_path / "documents.parquet")
        out = dq.docs_incremental_dedup(str(tmp_path))
        assert list(out.columns) == ["lang", "n_incoming", "n_survivors"]
        assert len(out) == 0

    def test_pagerank_and_triangles_empty_graph(self, tmp_path):
        # single-part orders → no co-order pair anywhere
        df = pd.DataFrame({"l_orderkey": np.arange(30, dtype="int64"),
                           "l_partkey": np.arange(30, dtype="int64"),
                           "l_suppkey": np.ones(30, dtype="int64")})
        df.to_parquet(tmp_path / "lineitem.parquet")
        pr = rel.parts_pagerank(str(tmp_path))
        assert list(pr.columns) == ["part", "rank_ppm"] and len(pr) == 0
        tr = rel.parts_triangles(str(tmp_path))
        assert tr.iloc[0].tolist() == [0, 0, 0]

    def test_triangles_no_wedge_join_crash(self, tmp_path):
        # every pair co-ordered exactly once → n>=2 filter empties edges
        rows = []
        for ok in range(10):
            rows.append((ok, 2 * ok, 1))
            rows.append((ok, 2 * ok + 1, 1))
        df = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey",
                                         "l_suppkey"]).astype("int64")
        df.to_parquet(tmp_path / "lineitem.parquet")
        tr = rel.parts_triangles(str(tmp_path))
        assert tr.iloc[0].tolist() == [0, 0, 0]

    def test_cube_and_median_empty_tables(self, tmp_path):
        pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                      "ts": pd.Series([], dtype="datetime64[us]"),
                      "user_id": pd.Series([], dtype="int64"),
                      "event_type": pd.Series([], dtype=object),
                      "value": pd.Series([], dtype="float64"),
                      "props": pd.Series([], dtype=object)}) \
            .to_parquet(tmp_path / "events.parquet")
        cube = rel.events_cube(str(tmp_path))
        # SQL's CUBE still emits the () grouping set over an empty input
        assert cube.iloc[0].tolist() == ["ALL", "ALL", 0]
        pd.DataFrame({"o_orderkey": pd.Series([], dtype="int64"),
                      "o_custkey": pd.Series([], dtype="int64"),
                      "o_orderstatus": pd.Series([], dtype=object),
                      "o_totalprice": pd.Series([], dtype="float64"),
                      "o_orderdate": pd.Series([], dtype="datetime64[us]"),
                      "o_orderpriority": pd.Series([], dtype=object)}) \
            .to_parquet(tmp_path / "orders.parquet")
        med = rel.orders_price_median(str(tmp_path))
        assert list(med.columns) == ["o_orderpriority", "n_orders",
                                     "median_cents"]
        assert len(med) == 0


class TestCubeRangeMedian:
    def test_cube_matches_bruteforce(self, events_dir):
        sf_dir, df = events_dir
        got = rel.events_cube(sf_dir)
        d = df.copy()
        d["day"] = d["ts"].dt.strftime("%Y-%m-%d")
        base = d.groupby(["day", "event_type"]).size().rename("n") \
            .reset_index()
        by_day = base.groupby("day", as_index=False)["n"].sum()
        by_day["event_type"] = "ALL"
        by_type = base.groupby("event_type", as_index=False)["n"].sum()
        by_type["day"] = "ALL"
        total = pd.DataFrame({"day": ["ALL"], "event_type": ["ALL"],
                              "n": [base["n"].sum()]})
        exp = pd.concat([base, by_day, by_type, total], ignore_index=True)
        exp["n"] = exp["n"].astype("int64")
        exp = exp[["day", "event_type", "n"]] \
            .sort_values(["day", "event_type"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, exp)

    def test_range_window_matches_bruteforce(self, events_dir):
        sf_dir, df = events_dir
        got = rel.events_range_window(sf_dir)
        d = df.copy()
        d["day"] = d["ts"].dt.floor("D")
        counts = d.groupby(["event_type", "day"]).size().rename("n") \
            .reset_index()
        rows = []
        for et, g in counts.groupby("event_type"):
            g = g.sort_values("day")
            for _, r in g.iterrows():
                lo = r["day"] - pd.Timedelta(days=2)
                win = g[(g["day"] >= lo) & (g["day"] <= r["day"])]
                rows.append((et, r["day"], int(r["n"]),
                             int(win["n"].sum())))
        exp = pd.DataFrame(rows, columns=["event_type", "day", "n",
                                          "sum_3d"]) \
            .sort_values(["event_type", "day"]).reset_index(drop=True)
        for c in ("n", "sum_3d"):
            exp[c] = exp[c].astype("int64")
        pd.testing.assert_frame_equal(got, exp)

    @pytest.mark.parametrize("seed", [9, 31])
    def test_median_matches_bruteforce(self, seed, tmp_path):
        rng = np.random.RandomState(seed)
        n = 500
        df = pd.DataFrame({
            "o_orderkey": np.arange(n, dtype="int64"),
            "o_custkey": rng.randint(0, 50, size=n).astype("int64"),
            "o_orderstatus": rng.choice(["O", "F", "P"], size=n),
            "o_totalprice": np.round(rng.uniform(1, 1000, size=n), 2),
            "o_orderdate": pd.Timestamp("2024-01-01"),
            "o_orderpriority": rng.choice(
                ["1-URGENT", "2-HIGH", "3-MEDIUM"], size=n),
        })
        df.to_parquet(tmp_path / "orders.parquet")
        got = rel.orders_price_median(str(tmp_path))
        cents = np.floor(df["o_totalprice"].to_numpy() * 100 + 0.5) \
            .astype("int64")
        d = df.assign(cents=cents)
        rows = []
        for pri, g in d.groupby("o_orderpriority"):
            v = np.sort(g["cents"].to_numpy())
            rows.append((pri, len(v), int(v[(len(v) - 1) // 2])))
        exp = pd.DataFrame(rows, columns=["o_orderpriority", "n_orders",
                                          "median_cents"]) \
            .sort_values("o_orderpriority").reset_index(drop=True)
        for c in ("n_orders", "median_cents"):
            exp[c] = exp[c].astype("int64")
        pd.testing.assert_frame_equal(got, exp)

    def test_range_window_empty_table(self, tmp_path):
        pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                      "ts": pd.Series([], dtype="datetime64[us]"),
                      "user_id": pd.Series([], dtype="int64"),
                      "event_type": pd.Series([], dtype=object),
                      "value": pd.Series([], dtype="float64"),
                      "props": pd.Series([], dtype=object)}) \
            .to_parquet(tmp_path / "events.parquet")
        out = rel.events_range_window(str(tmp_path))
        assert list(out.columns) == ["event_type", "day", "n", "sum_3d"]
        assert len(out) == 0


class TestBpeMerges:
    @pytest.mark.parametrize("seed", [5, 19, 63])
    def test_matches_bruteforce(self, seed, tmp_path):
        """docs_bpe_merges vs a sequential pure-Python BPE on random
        corpora: small alphabets force repeated-symbol merges (the
        'aaa' overlap class) and frequent count ties (the pair-key
        tie-break)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ai_intel_web_scraper_ray.pipelines import docqueries as dq

        rng = np.random.RandomState(seed)
        words = ["".join(rng.choice(list("abc"), size=rng.randint(1, 7)))
                 for _ in range(30)]
        texts = [" ".join(rng.choice(words, size=rng.randint(3, 25)))
                 for _ in range(12)]
        docs = pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(["s"] * len(texts), pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        })
        pq.write_table(docs, tmp_path / "documents.parquet")

        got = dq.docs_bpe_merges(str(tmp_path))

        from collections import Counter
        c: Counter = Counter()
        for t in texts:
            c.update(t.split())
        w = lambda s: "\x01" + s + "\x02"  # noqa: E731
        vocab = {"".join(w(ch) for ch in word): n for word, n in c.items()}
        exp = []
        for r in range(1, 6):
            pc: Counter = Counter()
            for sym, n in vocab.items():
                syms = sym[1:-1].split("\x02\x01")
                for a, b in zip(syms, syms[1:]):
                    pc[a + "\x03" + b] += n
            if not pc:
                break
            key = min(pc, key=lambda k: (-pc[k], k))
            a, b = key.split("\x03")
            exp.append((r, a, b, pc[key]))
            vocab = {s.replace(w(a) + w(b), w(a + b)): n
                     for s, n in vocab.items()}
        assert list(got.itertuples(index=False, name=None)) == exp
