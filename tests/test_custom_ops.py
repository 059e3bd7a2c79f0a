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
