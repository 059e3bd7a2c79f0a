"""Relational query pipelines over the driver testdata tables.

These exercise the engine's aggregate / join / sort / window machinery (the
Ray Data equivalents of the reference's groupby-topic, credibility-sort and
status-count operators, SURVEY.md §2.5-§2.7) at TPC-H-ish scale:

- dimension joins are BROADCAST (ray.put once, merged per batch) — never a
  shuffle for the small side;
- aggregates pre-aggregate per batch where the key count is bounded, then
  run one small groupby;
- window/as-of logic is groupby(key).map_groups over ts-sorted groups.

Every function takes ``sf_dir`` and returns a small pandas DataFrame whose
column names match the oracle SQL aliases in __ray_entry__.py exactly.
Float aggregate columns are rounded so driver-side value hashing is stable
across summation orders (round(2) for monetary sums, round(6) for ratios).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd


def _read(sf_dir: str, table: str, columns=None, num_blocks: int = 8):
    # single-file tables → split for map/shuffle parallelism
    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns,
                           override_num_blocks=num_blocks)


# ---------------------------------------------------------------------------
# Q1: pricing summary (TPC-H Q1 shape) — pure groupby aggregate
# ---------------------------------------------------------------------------


def q1_pricing_summary(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
                "l_discount", "l_shipdate"])

    cutoff = pa.scalar(np.datetime64("1998-09-01", "us"))

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t["l_shipdate"], cutoff))
        df = t.select(["l_returnflag", "l_linestatus", "l_quantity",
                       "l_extendedprice", "l_discount"]).to_pandas()
        # per-row integer cents (floor(x*100+0.5) is bit-stable on identical
        # doubles in numpy and DuckDB, unlike decimal rounding whose
        # half-way rule differs); integer sums are then order-independent
        df["base_cents"] = np.floor(df["l_extendedprice"] * 100 + 0.5).astype("int64")
        df["disc_cents"] = np.floor(
            df["l_extendedprice"] * (1 - df["l_discount"]) * 100 + 0.5
        ).astype("int64")
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("l_quantity", "sum"),
            base_cents=("base_cents", "sum"),
            disc_cents=("disc_cents", "sum"),
            n_rows=("l_quantity", "size"),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = partials.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
        sum_qty=("sum_qty", "sum"),
        base_cents=("base_cents", "sum"),
        disc_cents=("disc_cents", "sum"),
        n_rows=("n_rows", "sum"),
    )
    out["avg_qty"] = (out["sum_qty"] / out["n_rows"]).round(6)
    out["sum_base_price"] = out["base_cents"] / 100.0
    out["sum_disc_price"] = out["disc_cents"] / 100.0
    out["n_rows"] = out["n_rows"].astype("int64")
    out = out[["l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
               "sum_disc_price", "n_rows", "avg_qty"]]
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Q3-shape: top revenue orders for one market segment (broadcast join)
# ---------------------------------------------------------------------------


def q3_top_orders(sf_dir: str) -> pd.DataFrame:
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
    seg_keys = set(cust.loc[cust["c_mktsegment"] == "BUILDING", "c_custkey"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]).to_pandas()
    o_small = orders[orders["o_custkey"].isin(seg_keys)][["o_orderkey", "o_orderdate"]]
    okeys_ref = ray.put(set(o_small["o_orderkey"]))

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        okeys = ray.get(okeys_ref)
        df = t.to_pandas()
        df = df[df["l_orderkey"].isin(okeys)]
        df["rev_cents"] = np.floor(
            df["l_extendedprice"] * (1 - df["l_discount"]) * 100 + 0.5
        ).astype("int64")
        g = df.groupby("l_orderkey", as_index=False)["rev_cents"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    rev = partials.groupby("l_orderkey", as_index=False)["rev_cents"].sum()
    rev = rev.merge(o_small, left_on="l_orderkey", right_on="o_orderkey")
    rev["revenue"] = rev["rev_cents"] / 100.0
    rev = rev.sort_values(["revenue", "l_orderkey"], ascending=[False, True]).head(10)
    return rev[["l_orderkey", "o_orderdate", "revenue"]].reset_index(drop=True)


# ---------------------------------------------------------------------------
# Q5-shape: revenue per nation (chain of broadcast dimension joins)
# ---------------------------------------------------------------------------


def q5_nation_revenue(sf_dir: str) -> pd.DataFrame:
    nation = _read(sf_dir, "nation").to_pandas()
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).to_pandas()
    cust_nation = dict(zip(cust["c_custkey"], cust["c_nationkey"]))
    order_nation = {
        ok: cust_nation[ck]
        for ok, ck in zip(orders["o_orderkey"], orders["o_custkey"])
        if ck in cust_nation
    }
    map_ref = ray.put(order_nation)

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        omap = ray.get(map_ref)
        df = t.to_pandas()
        df["nk"] = df["l_orderkey"].map(omap)
        df = df.dropna(subset=["nk"])
        df["rev_cents"] = np.floor(
            df["l_extendedprice"] * (1 - df["l_discount"]) * 100 + 0.5
        ).astype("int64")
        g = df.groupby("nk", as_index=False)["rev_cents"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    rev = partials.groupby("nk", as_index=False)["rev_cents"].sum()
    rev["nk"] = rev["nk"].astype("int32")
    out = rev.merge(nation, left_on="nk", right_on="n_nationkey")
    out = out.rename(columns={"n_name": "nation"})
    out["revenue"] = out["rev_cents"] / 100.0
    return out[["nation", "revenue"]].sort_values("nation").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Q6-shape: filtered scalar aggregate (predicate + projection pruned read)
# ---------------------------------------------------------------------------


def q6_revenue_delta(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "lineitem", ["l_quantity", "l_extendedprice", "l_discount", "l_shipdate"])
    lo = pa.scalar(np.datetime64("1996-01-01", "us"))
    hi = pa.scalar(np.datetime64("1997-01-01", "us"))

    def partial(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.and_(pc.greater_equal(t["l_shipdate"], lo), pc.less(t["l_shipdate"], hi)),
            pc.and_(
                pc.and_(pc.greater_equal(t["l_discount"], 0.05), pc.less_equal(t["l_discount"], 0.07)),
                pc.less(t["l_quantity"], 24),
            ),
        )
        t = t.filter(mask)
        vals = pc.multiply(t["l_extendedprice"], t["l_discount"]).to_numpy(zero_copy_only=False)
        cents = int(np.floor(vals * 100 + 0.5).astype("int64").sum()) if len(vals) else 0
        return pa.table({"rev_cents": pa.array([cents], pa.int64()),
                         "n_rows": pa.array([len(t)], pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return pd.DataFrame({
        "revenue": [parts["rev_cents"].sum() / 100.0],
        "n_rows": [int(parts["n_rows"].sum())],
    })


# ---------------------------------------------------------------------------
# part / supplier dimension aggregates
# ---------------------------------------------------------------------------


def part_type_stats(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "part", ["p_type", "p_retailprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("p_type", as_index=False).agg(
            n=("p_retailprice", "size"), s=("p_retailprice", "sum")
        )

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    out = parts.groupby("p_type", as_index=False).agg(n=("n", "sum"), s=("s", "sum"))
    out["avg_price"] = (out["s"] / out["n"]).round(4)
    out["n"] = out["n"].astype("int64")
    return out[["p_type", "n", "avg_price"]].sort_values("p_type").reset_index(drop=True)


def supplier_nation_acct(sf_dir: str) -> pd.DataFrame:
    nation = _read(sf_dir, "nation").to_pandas()
    ds = _read(sf_dir, "supplier", ["s_nationkey", "s_acctbal"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("s_nationkey", as_index=False).agg(
            n=("s_acctbal", "size"), s=("s_acctbal", "sum")
        )

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    agg = parts.groupby("s_nationkey", as_index=False).agg(n=("n", "sum"), s=("s", "sum"))
    out = agg.merge(nation, left_on="s_nationkey", right_on="n_nationkey")
    out = out.rename(columns={"n_name": "nation"})
    out["avg_acctbal"] = (out["s"] / out["n"]).round(4)
    out["n"] = out["n"].astype("int64")
    return out[["nation", "n", "avg_acctbal"]].sort_values("nation").reset_index(drop=True)


# ---------------------------------------------------------------------------
# events: JSON props extraction
# ---------------------------------------------------------------------------


def events_props_k(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "events", ["event_type", "props"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["k"] = df["props"].str.extract(r"(\d+)").astype("int64")
        return df.groupby("event_type", as_index=False).agg(n=("k", "size"), sum_k=("k", "sum"))

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    out = parts.groupby("event_type", as_index=False).agg(n=("n", "sum"), sum_k=("sum_k", "sum"))
    out["n"] = out["n"].astype("int64")
    out["sum_k"] = out["sum_k"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


# ---------------------------------------------------------------------------
# events: tumbling window aggregate
# ---------------------------------------------------------------------------


def events_tumbling(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["window_start"] = df["ts"].dt.floor("h")
        return df.groupby(["event_type", "window_start"], as_index=False).agg(
            n_events=("value", "size"), sum_value=("value", "sum")
        )

    partials = ds.map_batches(partial, batch_format="pandas").to_pandas()
    out = partials.groupby(["event_type", "window_start"], as_index=False).agg(
        n_events=("n_events", "sum"), sum_value=("sum_value", "sum")
    )
    out["n_events"] = out["n_events"].astype("int64")
    out["sum_value"] = out["sum_value"].round(4)
    return out.sort_values(["event_type", "window_start"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# events: sessionization via per-user ordered scan (as-of/lag family)
# ---------------------------------------------------------------------------

SESSION_GAP_MIN = 30


def events_sessions(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts")
        gaps = g["ts"].diff()
        n_sessions = int((gaps > pd.Timedelta(minutes=SESSION_GAP_MIN)).sum()) + 1
        return pd.DataFrame(
            {"user_id": [g["user_id"].iloc[0]], "n_events": [len(g)], "n_sessions": [n_sessions]}
        )

    out = ds.groupby("user_id").map_groups(per_user, batch_format="pandas").to_pandas()
    out["user_id"] = out["user_id"].astype("int64")
    out["n_events"] = out["n_events"].astype("int64")
    out["n_sessions"] = out["n_sessions"].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# orders: per-customer order-gap stats (lag window)
# ---------------------------------------------------------------------------


def orders_gap_stats(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def per_cust(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("o_orderdate")
        gaps = g["o_orderdate"].diff().dt.days.dropna()
        return pd.DataFrame(
            {
                "o_custkey": [g["o_custkey"].iloc[0]],
                "n_orders": [len(g)],
                "max_gap_days": [int(gaps.max()) if len(gaps) else 0],
            }
        )

    out = ds.groupby("o_custkey").map_groups(per_cust, batch_format="pandas").to_pandas()
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("o_custkey").reset_index(drop=True)
