"""Randomized conformance tests for the custom operators (as-of join,
banded range join, hopping window) against brute-force pandas oracles —
the driver gate pins them on the fixed corpus; these cover random inputs
including band/window boundary placements, across several seeds."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from ai_intel_web_scraper_ray.pipelines import relational as rel


def _random_events(seed: int, n: int = 400) -> pd.DataFrame:
    rng = np.random.RandomState(seed)
    base = pd.Timestamp("2024-01-01").value
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype="int64"),
        "ts": pd.to_datetime(
            base + rng.randint(0, 6 * 3600 * 10**9, size=n), unit="ns"
        ).floor("us"),
        "user_id": rng.randint(0, 12, size=n).astype("int64"),
        "event_type": rng.choice(
            ["purchase", "click", "view", "error", "signup"], size=n),
        "value": np.round(rng.uniform(0, 30, size=n), 2),
        "props": ['{"k": 1}'] * n,
    })
    # (user_id, ts) must be unique for deterministic as-of tie-breaks
    return df.drop_duplicates(["user_id", "ts"]).reset_index(drop=True)


@pytest.fixture(params=[11, 23, 57])
def events_dir(request, tmp_path):
    df = _random_events(request.param)
    df.to_parquet(tmp_path / "events.parquet")
    return str(tmp_path), df


class TestAsofJoin:
    def test_matches_bruteforce(self, events_dir):
        sf_dir, df = events_dir
        got = rel.events_asof_click(sf_dir)

        purchases = df[df["event_type"] == "purchase"]
        clicks = df[df["event_type"] == "click"]
        rows = []
        for p in purchases.itertuples(index=False):
            prior = clicks[(clicks["user_id"] == p.user_id)
                           & (clicks["ts"] <= p.ts)]
            if not len(prior):
                continue
            c = prior.loc[prior["ts"].idxmax()]
            rows.append((p.event_id, int(c["event_id"]),
                         int((p.ts - c["ts"]) // pd.Timedelta(microseconds=1))))
        exp = pd.DataFrame(rows, columns=["event_id", "prior_click_id",
                                          "usecs_since_click"]) \
            .sort_values("event_id").reset_index(drop=True).astype("int64")
        pd.testing.assert_frame_equal(got, exp)


class TestRangeJoin:
    def test_matches_bruteforce(self, events_dir):
        sf_dir, df = events_dir
        got = rel.events_value_range_join(sf_dir)

        df = df.copy()
        df["cents"] = np.floor(df["value"] * 100 + 0.5).astype("int64")
        df["hour"] = df["ts"].dt.floor("h")
        purchases = df[df["event_type"] == "purchase"]
        clicks = df[df["event_type"] == "click"]
        rows = []
        for p in purchases.itertuples(index=False):
            m = clicks[(clicks["hour"] == p.hour)
                       & ((clicks["cents"] - p.cents).abs() <= 50)]
            rows.append((p.event_id, len(m)))
        exp = pd.DataFrame(rows, columns=["event_id", "n_close_clicks"]) \
            .sort_values("event_id").reset_index(drop=True).astype("int64")
        pd.testing.assert_frame_equal(got, exp)


class TestHoppingWindow:
    def test_matches_bruteforce(self, events_dir):
        sf_dir, df = events_dir
        got = rel.events_hopping(sf_dir)

        df = df.copy()
        df["cents"] = np.floor(df["value"] * 100 + 0.5).astype("int64")
        slot = df["ts"].dt.floor("30min")
        hop = pd.Timedelta(minutes=30)
        both = pd.concat([
            df[["cents"]].assign(window_start=slot),
            df[["cents"]].assign(window_start=slot - hop),
        ])
        exp = both.groupby("window_start", as_index=False).agg(
            n_events=("cents", "size"), sum_cents=("cents", "sum"))
        exp["n_events"] = exp["n_events"].astype("int64")
        exp = exp.sort_values("window_start").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, exp)

    def test_every_event_in_exactly_two_windows(self, events_dir):
        sf_dir, df = events_dir
        got = rel.events_hopping(sf_dir)
        assert got["n_events"].sum() == 2 * len(df)


def _random_docs(seed: int, n: int = 300) -> pd.DataFrame:
    """Random documents with heavy n_chars ties (small value domain) and
    deliberate 8-gram overlap: every 9th doc copies an 8-word span from a
    benchmark doc (doc_id % 7 == 0)."""
    rng = np.random.RandomState(seed)
    vocab = [f"w{i}" for i in range(50)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.randint(3, 40)))
        for _ in range(n)
    ]
    for i in range(0, n, 9):
        donor = 7 * rng.randint(0, max(n // 7, 1))
        if donor < n and donor % 7 == 0 and i % 7 != 0:
            words = texts[donor].split()
            if len(words) >= 8:
                start = rng.randint(0, len(words) - 7)
                texts[i] = texts[i] + " " + " ".join(words[start:start + 8])
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype="int64"),
        "text": texts,
        "lang": ["en"] * n,
        "source": [f"src{rng.randint(0, 8)}" for _ in range(n)],
        "n_chars": rng.randint(10, 15, size=n).astype("int64"),  # many ties
    })


@pytest.fixture(params=[3, 19])
def docs_dir(request, tmp_path):
    df = _random_docs(request.param)
    df.to_parquet(tmp_path / "documents.parquet")
    return str(tmp_path), df


class TestTopPerSource:
    def test_matches_bruteforce(self, docs_dir):
        from ai_intel_web_scraper_ray.pipelines import docqueries as dq
        sf_dir, df = docs_dir
        got = dq.docs_top_per_source(sf_dir)

        exp = df.sort_values(["source", "n_chars", "doc_id"],
                             ascending=[True, False, True], kind="mergesort")
        exp = exp.groupby("source", sort=False).head(3)
        exp = exp.sort_values(["source", "doc_id"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got, exp[["doc_id", "source", "n_chars"]])

    def test_null_source_is_its_own_partition(self, tmp_path):
        """A NULL source must form its own top-k partition (SQL
        row_number() OVER (PARTITION BY source) keeps NULL rows) — the
        default pandas groupby dropna=True silently deleted them."""
        from ai_intel_web_scraper_ray.pipelines import docqueries as dq
        df = _random_docs(12)
        df.loc[df["doc_id"] % 3 == 0, "source"] = None
        df.to_parquet(tmp_path / "documents.parquet")
        got = dq.docs_top_per_source(str(tmp_path))

        exp = df.sort_values(["source", "n_chars", "doc_id"],
                             ascending=[True, False, True], kind="mergesort")
        exp = exp.groupby("source", sort=False, dropna=False).head(3)
        exp = exp.sort_values(["source", "doc_id"]).reset_index(drop=True)
        assert exp["source"].isna().any()
        pd.testing.assert_frame_equal(
            got, exp[["doc_id", "source", "n_chars"]])


class TestDecontaminate:
    def test_matches_bruteforce(self, docs_dir):
        from ai_intel_web_scraper_ray.functions import minhash as mh
        from ai_intel_web_scraper_ray.pipelines import docqueries as dq
        sf_dir, df = docs_dir
        got = dq.docs_decontaminate(sf_dir)

        bench = set()
        for _, r in df[df["doc_id"] % 7 == 0].iterrows():
            bench.update(mh.shingles(r["text"], 8))
        rows = []
        for _, r in df[df["doc_id"] % 7 != 0].iterrows():
            hits = len(set(mh.shingles(r["text"], 8)) & bench)
            if hits:
                rows.append((r["doc_id"], hits))
        exp = pd.DataFrame(rows, columns=["doc_id", "n_hits"]).astype("int64")
        exp = exp.sort_values("doc_id").reset_index(drop=True)
        assert len(exp) > 0, "fixture must produce contamination"
        pd.testing.assert_frame_equal(got, exp)


# ---------------------------------------------------------------------------
# fifth-batch operators: sliding-window DAU/WAU, running totals, and the
# sort-free rank family, against brute-force (and DuckDB-window) oracles
# on random inputs with day gaps and heavy value ties
# ---------------------------------------------------------------------------


def _random_multiday_events(seed: int, n: int = 500) -> pd.DataFrame:
    rng = np.random.RandomState(seed)
    base = pd.Timestamp("2024-01-01").value
    # sparse day set → real holes inside trailing-7-day windows
    days = np.sort(rng.choice(60, size=18, replace=False))
    day_ns = rng.choice(days, size=n) * 86_400 * 10**9
    within = rng.randint(0, 86_400 * 10**9, size=n)
    return pd.DataFrame({
        "event_id": np.arange(n, dtype="int64"),
        "ts": pd.to_datetime(base + day_ns + within, unit="ns").floor("us"),
        "user_id": rng.randint(0, 15, size=n).astype("int64"),
        "event_type": rng.choice(["view", "click"], size=n),
        "value": np.round(rng.uniform(0, 30, size=n), 2),
        "props": ['{"k": 1}'] * n,
    })


@pytest.fixture(params=[5, 31, 77])
def multiday_dir(request, tmp_path):
    df = _random_multiday_events(request.param)
    df.to_parquet(tmp_path / "events.parquet")
    return str(tmp_path), df


class TestDauWau:
    def test_matches_bruteforce(self, multiday_dir):
        sf_dir, df = multiday_dir
        got = rel.events_dau_wau(sf_dir)
        pairs = pd.DataFrame({
            "day": df["ts"].dt.floor("D"), "user_id": df["user_id"]
        }).drop_duplicates()
        rows = []
        for d in sorted(pairs["day"].unique()):
            dau = pairs[pairs["day"] == d]["user_id"].nunique()
            lo = d - pd.Timedelta(days=6)
            wau = pairs[(pairs["day"] >= lo)
                        & (pairs["day"] <= d)]["user_id"].nunique()
            rows.append((d, dau, wau, dau * 1_000_000 // wau))
        exp = pd.DataFrame(rows, columns=["day", "dau", "wau",
                                          "stickiness_micro"])
        for c in ("dau", "wau", "stickiness_micro"):
            exp[c] = exp[c].astype("int64")
        pd.testing.assert_frame_equal(got, exp)


def _random_orders(seed: int, n: int = 600) -> pd.DataFrame:
    rng = np.random.RandomState(seed)
    base = pd.Timestamp("2024-01-01").value
    # coarse dates → heavy (custkey, date) ties exercising the orderkey
    # tiebreak in the window order
    return pd.DataFrame({
        "o_orderkey": np.arange(n, dtype="int64"),
        "o_custkey": rng.randint(0, 25, size=n).astype("int64"),
        "o_orderdate": pd.to_datetime(
            base + rng.randint(0, 10, size=n) * 86_400 * 10**9, unit="ns"),
        "o_totalprice": np.round(rng.uniform(1, 500, size=n), 2),
        "o_orderstatus": ["O"] * n,
        "o_orderpriority": ["1-URGENT"] * n,
    })


@pytest.fixture(params=[3, 44])
def orders_dir(request, tmp_path):
    df = _random_orders(request.param)
    df.to_parquet(tmp_path / "orders.parquet")
    return str(tmp_path), df


class TestRunningTotal:
    def test_matches_bruteforce(self, orders_dir):
        sf_dir, df = orders_dir
        got = rel.orders_running_total(sf_dir)
        df = df.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
        cents = np.floor(df["o_totalprice"].to_numpy() * 100 + 0.5) \
            .astype("int64")
        run = pd.Series(cents).groupby(
            df["o_custkey"].to_numpy()).cumsum().to_numpy()
        exp = pd.DataFrame({"o_orderkey": df["o_orderkey"].to_numpy(),
                            "run_cents": run}) \
            .sort_values("o_orderkey").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, exp)


def _random_ranked_docs(seed: int, n: int = 400) -> pd.DataFrame:
    rng = np.random.RandomState(seed)
    # tiny token-count domain → massive ties (the rank/ntile stress case)
    k = rng.randint(1, 12, size=n)
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype="int64"),
        "text": ["word " * int(x) for x in k],
        "lang": ["en"] * n,
        "source": ["s"] * n,
        "n_chars": [5 * int(x) for x in k],
    })


@pytest.fixture(params=[9, 62])
def ranked_docs_dir(request, tmp_path):
    df = _random_ranked_docs(request.param)
    df.to_parquet(tmp_path / "documents.parquet")
    return str(tmp_path), df


class TestRankFamily:
    def test_percent_rank_matches_duckdb(self, ranked_docs_dir):
        import duckdb

        from ai_intel_web_scraper_ray.pipelines import docqueries as dq

        sf_dir, _ = ranked_docs_dir
        got = dq.docs_percent_rank(sf_dir)
        con = duckdb.connect()
        from ai_intel_web_scraper_ray.functions.tokenizer import TOKEN_PATTERN
        exp = con.execute(f"""
            WITH t AS (SELECT doc_id,
                       len(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS n_tokens
                       FROM read_parquet('{sf_dir}/documents.parquet'))
            SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
                   CAST((RANK() OVER (ORDER BY n_tokens) - 1) * 1000000
                        // ((SELECT COUNT(*) FROM t) - 1) AS BIGINT) AS pr_micro
            FROM t ORDER BY doc_id""").fetch_df()
        con.close()
        pd.testing.assert_frame_equal(got, exp)

    def test_ntile_matches_duckdb(self, ranked_docs_dir):
        import duckdb

        from ai_intel_web_scraper_ray.pipelines import docqueries as dq

        sf_dir, _ = ranked_docs_dir
        got = dq.docs_ntile(sf_dir)
        con = duckdb.connect()
        from ai_intel_web_scraper_ray.functions.tokenizer import TOKEN_PATTERN
        exp = con.execute(f"""
            WITH t AS (SELECT doc_id,
                       len(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS n_tokens
                       FROM read_parquet('{sf_dir}/documents.parquet'))
            SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
                   CAST(NTILE(4) OVER (ORDER BY n_tokens, doc_id) AS BIGINT) AS tile
            FROM t ORDER BY doc_id""").fetch_df()
        con.close()
        pd.testing.assert_frame_equal(got, exp)
