"""Relational query pipelines over the driver testdata tables.

These exercise the engine's aggregate / join / sort / window machinery (the
Ray Data equivalents of the reference's groupby-topic, credibility-sort and
status-count operators, SURVEY.md §2.5-§2.7) at TPC-H-ish scale:

- TRUE dimension joins (nation, customer→segment/nation) are BROADCAST
  (ray.put once, merged per batch) — never a shuffle for the small side;
- fact⋈fact joins (lineitem⋈orders) are hash-SHUFFLE joins via
  ``Dataset.join`` — the driver never holds a fact-table-derived map;
- aggregates pre-aggregate per batch where the key count is bounded, then
  run one small groupby;
- window/lag logic is ONE range sort on (key, ts) + per-block vectorized
  ``diff`` masked at key boundaries (no per-key Python callbacks).

Every function takes ``sf_dir`` and returns a small pandas DataFrame whose
column names match the oracle SQL aliases in __ray_entry__.py exactly.
Float aggregate columns are rounded so driver-side value hashing is stable
across summation orders (round(2) for monetary sums, round(6) for ratios).
"""

from __future__ import annotations

import re
from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads

import ray
import ray.data as rd


def _read(sf_dir: str, table: str, columns=None, num_blocks: int = 8,
          filter=None):
    # single-file tables → split for map/shuffle parallelism.
    # ``filter`` (a pyarrow.dataset expression) pushes the predicate into
    # the parquet scan itself — row groups outside the predicate's
    # min/max never leave storage and surviving row groups are filtered
    # before the block is built, so a date-windowed query reads only its
    # window (exact row semantics, verified vs DuckDB).
    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns,
                           override_num_blocks=num_blocks, filter=filter)


def _rev_cents(price, discount) -> np.ndarray:
    """Per-row discounted revenue in integer cents.

    ``floor(x*100 + 0.5)`` is bit-stable on identical doubles in numpy and
    DuckDB (unlike decimal rounding, whose half-way rule differs on
    terminating binary fractions); integer-cent sums are then
    order-independent across block/partition layouts.  Every monetary
    aggregate in this module MUST round through this one helper."""
    return np.floor(
        np.asarray(price) * (1 - np.asarray(discount)) * 100 + 0.5
    ).astype("int64")


def _in_sorted(values: np.ndarray, sorted_arr: np.ndarray) -> np.ndarray:
    """Vectorized membership test against a SORTED numeric array —
    O(n log m) searchsorted, no per-batch hash-set rebuild."""
    if len(sorted_arr) == 0:
        return np.zeros(len(values), dtype=bool)
    pos = np.searchsorted(sorted_arr, values)
    pos[pos >= len(sorted_arr)] = len(sorted_arr) - 1
    return sorted_arr[pos] == values


def _line_rev_partial(t: pa.Table) -> pa.Table:
    """Per-batch (l_orderkey, rev_cents) partial sums, Arrow-native: the
    two needed columns pull zero-copy into numpy, keys fold through
    np.unique + bincount — no per-batch pandas conversion (VERDICT r2
    §wrong-3).  Per-orderkey batch sums stay ≤ ~10⁹ cents, exact in the
    float64 bincount accumulator."""
    key = t["l_orderkey"].to_numpy(zero_copy_only=False).astype("int64")
    if len(key) == 0:
        return pa.table({"l_orderkey": pa.array([], pa.int64()),
                         "rev_cents": pa.array([], pa.int64())})
    rev = _rev_cents(t["l_extendedprice"].to_numpy(zero_copy_only=False),
                     t["l_discount"].to_numpy(zero_copy_only=False))
    uk, inv = np.unique(key, return_inverse=True)
    sums = np.bincount(inv, weights=rev.astype("float64")).astype("int64")
    return pa.table({"l_orderkey": pa.array(uk, pa.int64()),
                     "rev_cents": pa.array(sums, pa.int64())})


# customer-derived key/lookup arrays (q3 segment keys, q5 custkey→nation,
# q18 HAVING winners, q22 urgent custkeys) broadcast via ray.put only
# while the side stays genuinely small; above this row ceiling the query
# swaps to a hash-shuffle semi/anti/inner ``Dataset.join`` on the customer
# or order key, so no SF-proportional array ever lands in plasma whole —
# customer is a FACT-scale table at 100× (VERDICT r2 §wrong-1)
_CUST_BROADCAST_MAX = 5_000_000

# broadcast-path plasma puts route through this alias so tests can prove
# the shuffle path never touches it (monkeypatch to raise)
_ray_put = ray.put

# test-introspection only: which side each gated query took on its last
# call in this process ("broadcast" | "shuffle")
_LAST_PATH: dict = {}


def _join_partitions(sf_dir: str, table: str, selectivity: float = 1.0,
                     target_bytes: int = 32 << 20, cap: int = 64) -> int:
    """Size ``Dataset.join``'s hash partitions to the data actually
    flowing through the exchange.

    Ray's hash-shuffle join crashes when a partition receives ZERO blocks
    from one side (the empty partition loses its schema and the
    per-partition pyarrow join can't find the key column) — so a heavily
    filtered small input must NOT be spread over many partitions.  We
    size from the driving table's on-disk bytes × the feed's estimated
    selectivity: ~one partition per ``target_bytes`` of post-filter
    data, clamped to [1, cap].  Deterministic, no extra execution pass.
    At cluster scale the cap (64 here, sized for one 32-CPU node) should
    rise with the node count."""
    import os

    try:
        nbytes = os.path.getsize(f"{sf_dir}/{table}.parquet")
    except OSError:
        return 8
    eff = int(nbytes * max(0.0, min(1.0, selectivity)))
    return max(1, min(cap, eff // target_bytes + 1))


# ---------------------------------------------------------------------------
# Q1: pricing summary (TPC-H Q1 shape) — pure groupby aggregate
# ---------------------------------------------------------------------------


def q1_pricing_summary(sf_dir: str) -> pd.DataFrame:
    # shipdate cutoff pushes into the parquet scan — row groups past
    # the cutoff never leave storage
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
                "l_discount", "l_shipdate"],
               filter=pads.field("l_shipdate")
               < np.datetime64("1998-09-01", "us"))

    def partial(t: pa.Table) -> pa.Table:
        # Arrow-native: no pandas conversion — the two tiny-cardinality
        # key columns dictionary-encode to integer codes, every measure
        # sums through np.bincount over the combined code
        rf = t["l_returnflag"].combine_chunks().dictionary_encode()
        ls = t["l_linestatus"].combine_chunks().dictionary_encode()
        rf_idx = rf.indices.to_numpy(zero_copy_only=False).astype("int64")
        ls_idx = ls.indices.to_numpy(zero_copy_only=False).astype("int64")
        n_ls = len(ls.dictionary)
        code = rf_idx * max(n_ls, 1) + ls_idx
        n_codes = max(len(rf.dictionary), 1) * max(n_ls, 1)
        qty = t["l_quantity"].to_numpy(zero_copy_only=False)
        price = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = t["l_discount"].to_numpy(zero_copy_only=False)
        # per-row integer cents (floor(x*100+0.5) is bit-stable on identical
        # doubles in numpy and DuckDB, unlike decimal rounding whose
        # half-way rule differs); integer sums are then order-independent
        base_cents = np.floor(price * 100 + 0.5).astype("int64")
        disc_cents = _rev_cents(price, disc)
        n_rows = np.bincount(code, minlength=n_codes)
        live = np.nonzero(n_rows)[0]
        sum_qty = np.bincount(code, weights=qty, minlength=n_codes)[live]
        # int64 cents sum exactly through float64 bincount only below
        # 2^53; split into hi/lo 32-bit halves so the partials stay exact
        b_hi = np.bincount(code, weights=(base_cents >> 31).astype("float64"),
                           minlength=n_codes)[live]
        b_lo = np.bincount(code, weights=(base_cents & 0x7FFFFFFF).astype("float64"),
                           minlength=n_codes)[live]
        d_hi = np.bincount(code, weights=(disc_cents >> 31).astype("float64"),
                           minlength=n_codes)[live]
        d_lo = np.bincount(code, weights=(disc_cents & 0x7FFFFFFF).astype("float64"),
                           minlength=n_codes)[live]
        rf_dict = rf.dictionary.to_pylist()
        ls_dict = ls.dictionary.to_pylist()
        return pa.table({
            "l_returnflag": pa.array(
                [rf_dict[c // max(n_ls, 1)] for c in live], pa.string()),
            "l_linestatus": pa.array(
                [ls_dict[c % max(n_ls, 1)] for c in live], pa.string()),
            "sum_qty": pa.array(sum_qty, pa.float64()),
            "base_cents": pa.array(
                (b_hi.astype("int64") << 31) + b_lo.astype("int64"),
                pa.int64()),
            "disc_cents": pa.array(
                (d_hi.astype("int64") << 31) + d_lo.astype("int64"),
                pa.int64()),
            "n_rows": pa.array(n_rows[live], pa.int64())})

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


def q3_top_orders(sf_dir: str,
                  broadcast_max_rows: int = _CUST_BROADCAST_MAX
                  ) -> pd.DataFrame:
    """Fact⋈fact is a hash-SHUFFLE join on the order key.  The
    customer→segment side is broadcast only while customer stays under
    ``broadcast_max_rows``; above that (customer is SF-proportional — a
    fact-scale table at 100×) the segment filter runs as a hash-shuffle
    ``left_semi`` join on o_custkey, so no O(|customer|) array is ever
    built on the driver or in plasma.  Either way no driver-side
    structure is ever O(|orders|): the filtered orders stay a Dataset
    all the way into ``Dataset.join`` and the driver only sees the
    final 10 rows."""
    cust_ds = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    orders_ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    if cust_ds.count() <= broadcast_max_rows:
        _LAST_PATH["q3"] = "broadcast"
        cust = cust_ds.to_pandas()
        # sorted int64 array, not a Python set — numeric numpy arrays are
        # zero-copy from plasma; a pickled set re-deserializes per batch task
        seg_keys_ref = _ray_put(np.sort(
            cust.loc[cust["c_mktsegment"] == "BUILDING", "c_custkey"]
            .to_numpy(dtype="int64")
        ))

        def filter_orders(t: pa.Table) -> pa.Table:
            seg_keys = ray.get(seg_keys_ref)
            ck = t["o_custkey"].to_numpy(zero_copy_only=False) \
                .astype("int64")
            return t.select(["o_orderkey", "o_orderdate"]) \
                .filter(pa.array(_in_sorted(ck, seg_keys)))

        orders_ds = orders_ds.map_batches(filter_orders,
                                          batch_format="pyarrow")
    else:
        _LAST_PATH["q3"] = "shuffle"
        # pinned Arrow schema so EMPTY hash partitions keep their key
        # dtype into the per-partition pyarrow join (NOTES_r2 sharp edge)
        seg_schema = pa.schema([("c_custkey", pa.int64())])

        def seg_keys_t(t: pa.Table) -> pa.Table:
            out = t.filter(pc.equal(t["c_mktsegment"], "BUILDING")) \
                   .select(["c_custkey"])
            return out.cast(seg_schema)

        seg_ds = cust_ds.map_batches(seg_keys_t, batch_format="pyarrow")
        orders_ds = orders_ds.join(
            seg_ds, join_type="left_semi",
            num_partitions=_join_partitions(sf_dir, "orders"),
            on=("o_custkey",), right_on=("c_custkey",),
        ).select_columns(["o_orderkey", "o_orderdate"])

    line_ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    line_ds = line_ds.map_batches(_line_rev_partial, batch_format="pyarrow")

    joined = line_ds.join(
        orders_ds, join_type="inner", num_partitions=8,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    # per-batch partials already hold ≤1 row per (orderkey, batch); finish
    # the per-orderkey sum hash-bucketed (64 coarse groups, one vectorized
    # pandas groupby per bucket — ~8× cheaper than Ray's sort-based
    # Aggregate on a per-orderkey key), each bucket emits its own top-10
    # partial, and the driver merges ≤ 64×10 rows
    def bucketize(t: pa.Table) -> pa.Table:
        k = t["l_orderkey"].to_numpy(zero_copy_only=False).astype("int64")
        return t.append_column("_b", pa.array(k % 64, pa.int64()))

    def bucket_top(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["l_orderkey", "o_orderdate"],
                         as_index=False)["rev_cents"].sum()
        return out.sort_values(["rev_cents", "l_orderkey"],
                               ascending=[False, True],
                               kind="mergesort").head(10)

    top = joined.map_batches(bucketize, batch_format="pyarrow") \
                .groupby("_b").map_groups(bucket_top, batch_format="pandas") \
                .to_pandas()
    top = top.sort_values(["rev_cents", "l_orderkey"],
                          ascending=[False, True], kind="mergesort").head(10)
    top["revenue"] = top["rev_cents"] / 100.0
    return top[["l_orderkey", "o_orderdate", "revenue"]].reset_index(drop=True)


# ---------------------------------------------------------------------------
# Q5-shape: revenue per nation (chain of broadcast dimension joins)
# ---------------------------------------------------------------------------


def q5_nation_revenue(sf_dir: str,
                      broadcast_max_rows: int = _CUST_BROADCAST_MAX
                      ) -> pd.DataFrame:
    """Nation (25 rows) is always broadcast; customer→nation is broadcast
    only under ``broadcast_max_rows`` — above that the custkey→nationkey
    resolve runs as a hash-shuffle inner ``Dataset.join`` of orders
    against the (c_custkey, c_nationkey) projection, so no O(|customer|)
    array ever lands in plasma whole.  lineitem⋈orders is a hash-SHUFFLE
    join on the order key via ``Dataset.join`` — the driver never builds
    any O(|orders|) or O(|lineitem|) structure.  Per-batch partials
    reduce the post-join rows to ≤25 per batch before the driver
    combine."""
    nation = _read(sf_dir, "nation").to_pandas()
    cust_ds = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    orders_ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    if cust_ds.count() <= broadcast_max_rows:
        _LAST_PATH["q5"] = "broadcast"
        cust = cust_ds.to_pandas()
        # two parallel numpy arrays sorted by custkey, not a Python dict —
        # numeric numpy arrays are zero-copy from plasma; a pickled dict
        # re-deserializes per batch task
        order = np.argsort(cust["c_custkey"].to_numpy(dtype="int64"))
        cust_nation_ref = _ray_put((
            cust["c_custkey"].to_numpy(dtype="int64")[order],
            cust["c_nationkey"].to_numpy(dtype="int32")[order],
        ))

        def orders_nk(t: pa.Table) -> pa.Table:
            keys, nks = ray.get(cust_nation_ref)
            ck = t["o_custkey"].to_numpy(zero_copy_only=False) \
                .astype("int64")
            hit = _in_sorted(ck, keys)
            ok = t["o_orderkey"].to_numpy(zero_copy_only=False) \
                .astype("int64")[hit]
            nk = nks[np.searchsorted(keys, ck[hit])].astype("int64")
            return pa.table({"o_orderkey": pa.array(ok, pa.int64()),
                             "nk": pa.array(nk, pa.int64())})

        orders_ds = orders_ds.map_batches(orders_nk, batch_format="pyarrow")
    else:
        _LAST_PATH["q5"] = "shuffle"
        cust_schema = pa.schema([("c_custkey", pa.int64()),
                                 ("c_nationkey", pa.int64())])

        def cust_proj(t: pa.Table) -> pa.Table:
            return t.select(["c_custkey", "c_nationkey"]).cast(cust_schema)

        cds = cust_ds.map_batches(cust_proj, batch_format="pyarrow")
        nk_schema = pa.schema([("o_orderkey", pa.int64()),
                               ("nk", pa.int64())])

        def pick_nk(t: pa.Table) -> pa.Table:
            return pa.table({
                "o_orderkey": t["o_orderkey"],
                "nk": t["c_nationkey"]}).cast(nk_schema)

        orders_ds = orders_ds.join(
            cds, join_type="inner",
            num_partitions=_join_partitions(sf_dir, "orders"),
            on=("o_custkey",), right_on=("c_custkey",),
        ).map_batches(pick_nk, batch_format="pyarrow")

    line_ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    line_ds = line_ds.map_batches(_line_rev_partial, batch_format="pyarrow")

    joined = line_ds.join(
        orders_ds, join_type="inner", num_partitions=8,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def nk_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("nk", as_index=False)["rev_cents"].sum()

    partials = joined.map_batches(nk_partial, batch_format="pandas").to_pandas()
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
    # the WHOLE predicate pushes into the parquet scan (row-group
    # min/max pruning + exact row filtering before blocks form) — only
    # the qualifying window's rows ever leave storage
    expr = (
        (pads.field("l_shipdate") >= np.datetime64("1996-01-01", "us"))
        & (pads.field("l_shipdate") < np.datetime64("1997-01-01", "us"))
        & (pads.field("l_discount") >= 0.05)
        & (pads.field("l_discount") <= 0.07)
        & (pads.field("l_quantity") < 24))
    ds = _read(sf_dir, "lineitem",
               ["l_quantity", "l_extendedprice", "l_discount",
                "l_shipdate"], filter=expr)

    def partial(t: pa.Table) -> pa.Table:
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
    """Sessionization as a vectorized lag: ONE range sort on (user_id, ts),
    then per-BLOCK pandas ``diff`` masked at user boundaries — not one Python
    callback per user.  A user can straddle adjacent sorted blocks; each block
    emits per-user partials (n_events, in-block big-gap count, min/max ts) and
    the boundary gaps are closed with one vectorized shift over the partials,
    whose size is O(n_users + straddles) — the same order as the output."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])
    ds = ds.sort(["user_id", "ts"])
    gap = pd.Timedelta(minutes=SESSION_GAP_MIN)

    def block_partials(df: pd.DataFrame) -> pd.DataFrame:
        # block is sorted by (user_id, ts); diff once, mask at user boundaries
        gaps = df["ts"].diff()
        boundary = df["user_id"].ne(df["user_id"].shift())
        big = (gaps > gap) & ~boundary
        out = df.assign(_big=big).groupby("user_id", sort=False).agg(
            n_events=("ts", "size"), n_gaps=("_big", "sum"),
            min_ts=("ts", "min"), max_ts=("ts", "max"),
        )
        return out.reset_index()

    parts = ds.map_batches(block_partials, batch_format="pandas", batch_size=None).to_pandas()
    parts = parts.sort_values(["user_id", "min_ts"], kind="stable").reset_index(drop=True)
    same = parts["user_id"].eq(parts["user_id"].shift())
    bgap = parts["min_ts"] - parts["max_ts"].shift()
    parts["n_gaps"] = parts["n_gaps"] + (same & (bgap > gap)).astype("int64")
    out = parts.groupby("user_id", as_index=False).agg(
        n_events=("n_events", "sum"), n_gaps=("n_gaps", "sum")
    )
    out["n_sessions"] = out["n_gaps"] + 1
    out = out[["user_id", "n_events", "n_sessions"]]
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# orders: per-customer order-gap stats (lag window)
# ---------------------------------------------------------------------------


def orders_gap_stats(sf_dir: str) -> pd.DataFrame:
    """Lag window, same vectorized shape as :func:`events_sessions`: ONE
    range sort on (o_custkey, o_orderdate), per-block ``diff`` masked at
    customer boundaries, then one vectorized shift over the per-block
    partials to close straddled-customer boundary gaps."""
    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])
    ds = ds.sort(["o_custkey", "o_orderdate"])

    def block_partials(df: pd.DataFrame) -> pd.DataFrame:
        gaps = df["o_orderdate"].diff().dt.days
        boundary = df["o_custkey"].ne(df["o_custkey"].shift())
        local_gap = gaps.where(~boundary, other=np.nan)
        out = df.assign(_gap=local_gap).groupby("o_custkey", sort=False).agg(
            n_orders=("o_orderdate", "size"),
            max_gap=("_gap", "max"),
            min_d=("o_orderdate", "min"),
            max_d=("o_orderdate", "max"),
        )
        return out.reset_index()

    parts = ds.map_batches(block_partials, batch_format="pandas", batch_size=None).to_pandas()
    parts = parts.sort_values(["o_custkey", "min_d"], kind="stable").reset_index(drop=True)
    same = parts["o_custkey"].eq(parts["o_custkey"].shift())
    bgap = (parts["min_d"] - parts["max_d"].shift()).dt.days.where(same)
    parts["max_gap"] = parts[["max_gap"]].assign(b=bgap).max(axis=1)
    out = parts.groupby("o_custkey", as_index=False).agg(
        n_orders=("n_orders", "sum"), max_gap=("max_gap", "max")
    )
    out["max_gap_days"] = out["max_gap"].fillna(0)
    out = out[["o_custkey", "n_orders", "max_gap_days"]]
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("o_custkey").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Q4-shape: order-priority counts with an EXISTS semijoin on lineitem
# ---------------------------------------------------------------------------


def q4_order_priority(sf_dir: str) -> pd.DataFrame:
    """Orders in 1996 having at least one returned ('R') lineitem, counted
    per priority.  The semijoin is a hash-shuffle join of the date-filtered
    orders against the (returnflag-filtered, batch-deduped) lineitem KEY
    projection; post-join order duplicates (one per matching lineitem that
    survived batch-level dedup) are removed under a bounded key-bucket
    groupby, never per distinct orderkey."""
    # the 1996 window pushes into the orders scan
    orders_ds = _read(
        sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"],
        filter=(pads.field("o_orderdate")
                >= np.datetime64("1996-01-01", "us"))
        & (pads.field("o_orderdate") < np.datetime64("1997-01-01", "us")))

    orders_ds = orders_ds.map_batches(
        lambda t: t.select(["o_orderkey", "o_orderpriority"]),
        batch_format="pyarrow")

    keys_ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag"])

    def returned_keys(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["l_returnflag"], pa.scalar("R")))
        # batch-level dedup only (cheap); cross-batch dups resolved after the join
        ids = np.unique(t["l_orderkey"].to_numpy(zero_copy_only=False))
        return pa.table({"l_orderkey": pa.array(ids, pa.int64())})

    keys_ds = keys_ds.map_batches(returned_keys, batch_format="pyarrow")

    joined = orders_ds.join(
        keys_ds, join_type="inner", num_partitions=8,
        on=("o_orderkey",), right_on=("l_orderkey",),
    )

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_ob"] = (df["o_orderkey"].astype("int64") % 256).astype("int64")
        return df

    def bucket_counts(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates("o_orderkey")
        return df.groupby("o_orderpriority", as_index=False).agg(
            n_orders=("o_orderkey", "size"))

    parts = (
        joined.map_batches(bucketize, batch_format="pandas")
        .groupby("_ob").map_groups(bucket_counts, batch_format="pandas")
        .to_pandas()
    )
    out = parts.groupby("o_orderpriority", as_index=False)["n_orders"].sum()
    out["n_orders"] = out["n_orders"].astype("int64")
    return out.sort_values("o_orderpriority").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Q12-shape: high/low order-priority line counts per linestatus
# ---------------------------------------------------------------------------


def q12_priority_lines(sf_dir: str) -> pd.DataFrame:
    """lineitem⋈orders hash-shuffle join, then per-batch conditional
    partial counts over the bounded linestatus key."""
    lo = pa.scalar(np.datetime64("1996-01-01", "us"))
    hi = pa.scalar(np.datetime64("1997-01-01", "us"))

    line_ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linestatus", "l_shipdate"])

    def filter_lines(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t["l_shipdate"], lo), pc.less(t["l_shipdate"], hi))
        return t.filter(m).select(["l_orderkey", "l_linestatus"])

    line_ds = line_ds.map_batches(filter_lines, batch_format="pyarrow")
    orders_ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])

    joined = line_ds.join(
        orders_ds, join_type="inner", num_partitions=8,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        high = df["o_orderpriority"].isin(["1-URGENT", "2-HIGH"])
        df["high"] = high.astype("int64")
        df["low"] = (~high).astype("int64")
        return df.groupby("l_linestatus", as_index=False).agg(
            high_line_count=("high", "sum"), low_line_count=("low", "sum"))

    parts = joined.map_batches(partial, batch_format="pandas").to_pandas()
    out = parts.groupby("l_linestatus", as_index=False).agg(
        high_line_count=("high_line_count", "sum"),
        low_line_count=("low_line_count", "sum"))
    for c in ("high_line_count", "low_line_count"):
        out[c] = out[c].astype("int64")
    return out.sort_values("l_linestatus").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Q14-shape: promo revenue share (lineitem⋈part hash-shuffle join)
# ---------------------------------------------------------------------------


def q14_promo_revenue(sf_dir: str) -> pd.DataFrame:
    """part scales with SF (it is NOT a broadcastable dimension at 100 TB),
    so lineitem⋈part is a hash-shuffle join on the part key; revenue uses
    the same per-row integer-cents trick as q1/q6 so the int sums are
    order-independent and the final ratio is bit-stable vs DuckDB."""
    # the half-year window pushes into the lineitem scan
    line_ds = _read(
        sf_dir, "lineitem",
        ["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=(pads.field("l_shipdate")
                >= np.datetime64("1996-01-01", "us"))
        & (pads.field("l_shipdate") < np.datetime64("1996-07-01", "us")))

    def line_proj(t: pa.Table) -> pa.Table:
        rev = _rev_cents(
            t["l_extendedprice"].to_numpy(zero_copy_only=False),
            t["l_discount"].to_numpy(zero_copy_only=False))
        return pa.table({
            "l_partkey": pc.cast(t["l_partkey"], pa.int64()),
            "rev_cents": pa.array(rev, pa.int64())})

    line_ds = line_ds.map_batches(line_proj, batch_format="pyarrow")

    part_ds = _read(sf_dir, "part", ["p_partkey", "p_type"])

    def part_proj(t: pa.Table) -> pa.Table:
        return pa.table({
            "p_partkey": pc.cast(t["p_partkey"], pa.int64()),
            "is_promo": pc.cast(
                pc.starts_with(t["p_type"], "PROMO"), pa.int64())})

    part_ds = part_ds.map_batches(part_proj, batch_format="pyarrow")

    joined = line_ds.join(
        part_ds, join_type="inner", num_partitions=8,
        on=("l_partkey",), right_on=("p_partkey",),
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "promo_cents": [int((df["rev_cents"] * df["is_promo"]).sum())],
            "total_cents": [int(df["rev_cents"].sum())],
        })

    parts = joined.map_batches(partial, batch_format="pandas").to_pandas()
    promo = int(parts["promo_cents"].sum())
    total = int(parts["total_cents"].sum())
    return pd.DataFrame({
        "promo_cents": pd.Series([promo], dtype="int64"),
        "total_cents": pd.Series([total], dtype="int64"),
        "promo_pct": [round(100.0 * promo / total, 6)],
    })


# ---------------------------------------------------------------------------
# events: HOPPING window (streaming-window family — each event lands in
# length/hop overlapping windows, emitted by a vectorized per-batch explode)
# ---------------------------------------------------------------------------

HOP_MINUTES = 30
HOP_LENGTH_MINUTES = 60


def events_hopping(sf_dir: str) -> pd.DataFrame:
    """1-hour windows hopping every 30 minutes: each event belongs to
    length/hop = 2 windows.  The explode is a vectorized per-batch concat
    (no per-row Python), partial-aggregated inside the batch before the
    small cross-batch merge — window count is bounded by the time span, so
    the driver combine is O(windows), not O(events).  Value sums use
    integer cents so summation order cannot change the hash."""
    ds = _read(sf_dir, "events", ["ts", "value"])
    hop_us = HOP_MINUTES * 60 * 1_000_000

    def partial(t: pa.Table) -> pa.Table:
        # Arrow-native: slot arithmetic on zero-copy int64 microseconds;
        # window starts at every hop boundary — a 60-min window covers
        # the event's own hop slot and the previous one
        ts = t["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype("int64")
        cents = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100 + 0.5
        ).astype("int64")
        slot = (ts // hop_us) * hop_us
        w = np.concatenate([slot, slot - hop_us])
        c2 = np.concatenate([cents, cents])
        uw, inv = np.unique(w, return_inverse=True)
        n = np.bincount(inv).astype("int64")
        sc = np.bincount(inv, weights=c2.astype("float64")).astype("int64")
        return pa.table({"window_start_us": pa.array(uw, pa.int64()),
                         "n_events": pa.array(n, pa.int64()),
                         "sum_cents": pa.array(sc, pa.int64())})

    partials = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = partials.groupby("window_start_us", as_index=False).agg(
        n_events=("n_events", "sum"), sum_cents=("sum_cents", "sum"))
    # ns dtype preserves the pre-rewrite column type (pandas-native)
    out["window_start"] = out["window_start_us"] \
        .astype("datetime64[us]").astype("datetime64[ns]")
    out["n_events"] = out["n_events"].astype("int64")
    out["sum_cents"] = out["sum_cents"].astype("int64")
    return out[["window_start", "n_events", "sum_cents"]] \
        .sort_values("window_start").reset_index(drop=True)


# ---------------------------------------------------------------------------
# events: AS-OF join (custom operator — Ray Data has no asof join; built as
# bounded-bucket co-partition + per-bucket vectorized pandas merge_asof)
# ---------------------------------------------------------------------------

_ASOF_BUCKETS = 64


def events_asof_click(sf_dir: str) -> pd.DataFrame:
    """For each purchase event, the user's most recent click at-or-before
    the purchase (inner as-of semantics — purchases with no prior click
    drop).

    Partitioning assumption (documented per the custom-operator rule): both
    sides co-partition on hash(user_id) % 64 — every row of one user lands
    in ONE bucket, so each bucket's ``pd.merge_asof`` (sorted on ts,
    by=user_id) sees the user's full history.  Python callback count is
    bounded at 64; all matching work is the vectorized pandas kernel."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    _asof_kinds = pa.array(["purchase", "click"])

    def tag(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["event_type"], value_set=_asof_kinds))
        u = t["user_id"].to_numpy(zero_copy_only=False).astype("int64")
        return t.select(["event_id", "ts", "user_id", "event_type"]) \
            .append_column("_ab", pa.array(u % _ASOF_BUCKETS, pa.int64()))

    def bucket_asof(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["event_type"] == "purchase"].sort_values("ts", kind="mergesort")
        right = g[g["event_type"] == "click"].sort_values("ts", kind="mergesort")
        right = right.rename(columns={"event_id": "prior_click_id", "ts": "click_ts"})
        if not len(left) or not len(right):
            return pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                                 "prior_click_id": pd.Series([], dtype="int64"),
                                 "usecs_since_click": pd.Series([], dtype="int64")})
        m = pd.merge_asof(
            left, right[["prior_click_id", "click_ts", "user_id"]],
            left_on="ts", right_on="click_ts", by="user_id",
            direction="backward", allow_exact_matches=True,
        )
        m = m.dropna(subset=["prior_click_id"])
        out = pd.DataFrame({
            "event_id": m["event_id"].astype("int64"),
            "prior_click_id": m["prior_click_id"].astype("int64"),
            "usecs_since_click": ((m["ts"] - m["click_ts"])
                                  // pd.Timedelta(microseconds=1)).astype("int64"),
        })
        return out

    out = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_ab").map_groups(bucket_asof, batch_format="pandas")
        .to_pandas()
    )
    if "event_id" not in out.columns:
        return pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                             "prior_click_id": pd.Series([], dtype="int64"),
                             "usecs_since_click": pd.Series([], dtype="int64")})
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# events: RANGE join (custom operator — a non-equi |Δvalue| ≤ band join,
# built as banded buckets: left rows keep their band, right rows explode
# into ±1 neighbors, so every qualifying pair meets in EXACTLY one bucket)
# ---------------------------------------------------------------------------

RANGE_BAND = 0.5
_RANGE_HOUR_BUCKETS = 64


def events_value_range_join(sf_dir: str) -> pd.DataFrame:
    """Per purchase event: how many click events in the same hour have a
    value within ±RANGE_BAND.  Non-equi joins have no Ray Data primitive;
    this one shuffles on hash(hour) % 64 (bounded — one Python callback
    per bucket, each holding complete hours) and counts each purchase's
    qualifying clicks with two vectorized ``np.searchsorted`` calls over
    the bucket's (hour, cents) composite key — exact integer cents on both
    sides so the ±0.50 boundary is bit-stable vs the DuckDB twin.
    Purchases with no qualifying click still emit n=0 (left semantics)."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "event_type", "value"])
    BAND_CENTS = int(RANGE_BAND * 100)

    _range_kinds = pa.array(["purchase", "click"])

    def project(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["event_type"], value_set=_range_kinds))
        cents = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100 + 0.5
        ).astype("int64")
        # epoch-hours (NOT raw ns — composing with raw ns overflows int64)
        hour = t["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[ns]").astype("int64") // 3_600_000_000_000
        side = pc.cast(pc.equal(t["event_type"], "click"), pa.int64())
        return pa.table({
            "event_id": pc.cast(t["event_id"], pa.int64()),
            "hour": pa.array(hour, pa.int64()),
            "cents": pa.array(cents, pa.int64()),
            "side": side,
            "_hb": pa.array(hour % _RANGE_HOUR_BUCKETS, pa.int64())})

    def bucket_count(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["side"] == 0]
        if not len(left):
            return pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                                 "n_close_clicks": pd.Series([], dtype="int64")})
        right = g[g["side"] == 1]
        # composite (hour, cents) key: cents < 10^7, so ranges never cross
        # an hour boundary in key space
        rkey = np.sort(right["hour"].to_numpy() * 10_000_000
                       + right["cents"].to_numpy())
        base = left["hour"].to_numpy() * 10_000_000 + left["cents"].to_numpy()
        n = (np.searchsorted(rkey, base + BAND_CENTS, side="right")
             - np.searchsorted(rkey, base - BAND_CENTS, side="left"))
        return pd.DataFrame({"event_id": left["event_id"].to_numpy().astype("int64"),
                             "n_close_clicks": n.astype("int64")})

    out = (
        ds.map_batches(project, batch_format="pyarrow")
        .groupby("_hb").map_groups(bucket_count, batch_format="pandas")
        .to_pandas()
    )
    if "event_id" not in out.columns:
        return pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                             "n_close_clicks": pd.Series([], dtype="int64")})
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# events: COUNT(DISTINCT) — two-level distinct aggregation
# ---------------------------------------------------------------------------


def events_distinct_users(sf_dir: str) -> pd.DataFrame:
    """COUNT(DISTINCT user_id) per event_type via two-level distinct: a
    per-batch ``drop_duplicates`` shrinks the exchange to this batch's
    unique (event_type, user_id) pairs, the groupby shuffle dedups
    globally, and a per-batch count partial reduces to ≤|event_types|
    rows before the driver combine — the driver never sees user ids."""
    ds = _read(sf_dir, "events", ["event_type", "user_id"])

    def pre(t: pa.Table) -> pa.Table:
        d = t.group_by(["event_type", "user_id"]).aggregate([])
        u = d["user_id"].to_numpy(zero_copy_only=False).astype("int64")
        return d.append_column("_b", pa.array(u % 64, pa.int64()))

    def cnt(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["event_type", "user_id"])
        return df.groupby("event_type", as_index=False).agg(
            n_users=("user_id", "size"))

    # global DISTINCT under a bounded user-hash bucket (one vectorized
    # pandas dedup per bucket) — Ray's sort-based Aggregate on the full
    # (event_type, user_id) key space is ~8× slower at the same exchange
    parts = ds.map_batches(pre, batch_format="pyarrow") \
              .groupby("_b").map_groups(cnt, batch_format="pandas") \
              .to_pandas()
    out = parts.groupby("event_type", as_index=False)["n_users"].sum()
    out["n_users"] = out["n_users"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Q10-shape: top customers by returned-item revenue (double shuffle join
# tail: lineitem⋈orders on the order key, then a distributed groupby on
# the customer key; names resolved only for the final 20 rows)
# ---------------------------------------------------------------------------


def q10_returned_revenue(sf_dir: str) -> pd.DataFrame:
    """Returned-item ('R') revenue per customer in 1996Q1, top 20.  Both
    joins are scale-safe: lineitem⋈orders hash-shuffles on the order key
    and the per-customer revenue finishes in a distributed groupby; the
    customer table is touched ONLY to resolve names for the 20 winners
    (a broadcast `pc.is_in` filter — never a driver-side map over it)."""
    # the quarter window pushes into the orders scan
    orders_ds = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(pads.field("o_orderdate")
                >= np.datetime64("1996-01-01", "us"))
        & (pads.field("o_orderdate") < np.datetime64("1996-04-01", "us")))

    orders_ds = orders_ds.map_batches(
        lambda t: t.select(["o_orderkey", "o_custkey"]),
        batch_format="pyarrow")

    line_ds = _read(sf_dir, "lineitem",
                    ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"])

    def line_partial(t: pa.Table) -> pa.Table:
        return _line_rev_partial(
            t.filter(pc.equal(t["l_returnflag"], "R")))

    line_ds = line_ds.map_batches(line_partial, batch_format="pyarrow")

    joined = line_ds.join(
        orders_ds, join_type="inner", num_partitions=8,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    # per-customer sums under a bounded customer-hash bucket with a
    # per-bucket top-20 partial (q3's pattern — ~8× cheaper than Ray's
    # sort-based Aggregate on the per-customer key); driver merges ≤64×20
    def bucketize(t: pa.Table) -> pa.Table:
        k = t["o_custkey"].to_numpy(zero_copy_only=False).astype("int64")
        return t.append_column("_cb", pa.array(k % 64, pa.int64()))

    def bucket_top(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("o_custkey", as_index=False)["rev_cents"].sum()
        out = out.rename(columns={"rev_cents": "sum(rev_cents)"})
        return out.sort_values(["sum(rev_cents)", "o_custkey"],
                               ascending=[False, True],
                               kind="mergesort").head(20)

    top = joined.map_batches(bucketize, batch_format="pyarrow") \
                .groupby("_cb").map_groups(bucket_top,
                                           batch_format="pandas") \
                .to_pandas()
    top = top.sort_values(["sum(rev_cents)", "o_custkey"],
                          ascending=[False, True], kind="mergesort").head(20)

    winner_keys = pa.array(top["o_custkey"].astype("int64"))
    cust = (
        _read(sf_dir, "customer", ["c_custkey", "c_name", "c_nationkey"])
        .map_batches(
            lambda t: t.filter(pc.is_in(t["c_custkey"], value_set=winner_keys)),
            batch_format="pyarrow")
        .to_pandas()
    )
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()

    out = top.merge(cust, left_on="o_custkey", right_on="c_custkey") \
             .merge(nation, left_on="c_nationkey", right_on="n_nationkey")
    out = out.rename(columns={"n_name": "nation"})
    out["revenue"] = out["sum(rev_cents)"] / 100.0
    out = out.sort_values(["sum(rev_cents)", "c_custkey"],
                          ascending=[False, True], kind="mergesort")
    out["c_custkey"] = out["c_custkey"].astype("int64")
    return out[["c_custkey", "c_name", "nation", "revenue"]].reset_index(drop=True)


# ---------------------------------------------------------------------------
# Q19-shape: disjunctive predicate join — three (brand, size, quantity)
# OR-branches; the part side collapses to three broadcast key sets so the
# fact table never shuffles
# ---------------------------------------------------------------------------

_Q19_BRANCHES = (
    # (p_brand, size_lo, size_hi, qty_lo, qty_hi)
    ("Brand#1", 1, 15, 1, 11),
    ("Brand#13", 10, 30, 10, 20),
    ("Brand#20", 25, 50, 20, 35),
)

# broadcast the filtered part keys only while they stay a genuinely small
# side (q14's rule stands: the FULL part table is never broadcastable);
# above this the query falls back to the q14-style hash-shuffle join
_Q19_BROADCAST_MAX = 5_000_000


def q19_branch_revenue(sf_dir: str,
                       broadcast_max: int = _Q19_BROADCAST_MAX) -> pd.DataFrame:
    """Revenue matching any of three coupled (part attrs × lineitem
    quantity) OR-branches.  Two execution paths, auto-selected by the
    SIZE of the filtered part side — the branch predicates keep ~6 % of
    part, and whether that survives as a broadcastable small side depends
    on SF, so the plan must not hard-code either answer:

    - filtered keys ≤ ``broadcast_max``: three int key sets broadcast
      once via ``ray.put``; lineitem streams through one vectorized
      filter with ZERO shuffles;
    - larger: lineitem⋈part hash-shuffle join on the part key (exactly
      q14's shape), with the branch predicate evaluated post-join — the
      driver never holds the keys."""
    part = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"])

    def branch_keys(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for bi, (brand, slo, shi, _, _) in enumerate(_Q19_BRANCHES):
            keys = df.loc[(df["p_brand"] == brand)
                          & (df["p_size"] >= slo) & (df["p_size"] <= shi),
                          "p_partkey"]
            out.append(pd.DataFrame({"branch": bi, "p_partkey": keys}))
        return pd.concat(out, ignore_index=True)

    keys_ds = part.map_batches(branch_keys, batch_format="pandas").materialize()

    line_ds = _read(sf_dir, "lineitem",
                    ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"])

    def finish(parts: pd.DataFrame) -> pd.DataFrame:
        cents = int(parts["rev_cents"].sum())
        return pd.DataFrame({
            "revenue": [cents / 100.0],
            "n_rows": pd.Series([int(parts["n_rows"].sum())], dtype="int64"),
        })

    if keys_ds.count() <= broadcast_max:
        keys_df = keys_ds.to_pandas()
        # Sorted int64 numpy arrays, NOT Python sets: Ray zero-copies numeric
        # numpy arrays from plasma (one mapped copy per node), whereas a
        # pickled set would be fully re-deserialized by every batch task.
        branch_keys_ref = ray.put([
            np.sort(keys_df.loc[keys_df["branch"] == bi, "p_partkey"]
                    .to_numpy(dtype="int64"))
            for bi in range(len(_Q19_BRANCHES))
        ])

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            branch_keys = ray.get(branch_keys_ref)
            partkeys = df["l_partkey"].to_numpy(dtype="int64")
            mask = np.zeros(len(df), dtype=bool)
            for (_, _, _, qlo, qhi), keys in zip(_Q19_BRANCHES, branch_keys):
                mask |= (_in_sorted(partkeys, keys)
                         & (df["l_quantity"] >= qlo).to_numpy()
                         & (df["l_quantity"] <= qhi).to_numpy())
            df = df[mask]
            cents = _rev_cents(df["l_extendedprice"], df["l_discount"])
            return pd.DataFrame({"rev_cents": [int(cents.sum())],
                                 "n_rows": [len(df)]})

        parts = line_ds.map_batches(partial, batch_format="pandas").to_pandas()
        return finish(parts)

    # shuffle-join fallback: pre-filter lineitem to the union of the
    # branches' quantity ranges, join on the part key, apply the coupled
    # (branch, quantity) predicate post-join
    qlo_min = min(b[3] for b in _Q19_BRANCHES)
    qhi_max = max(b[4] for b in _Q19_BRANCHES)

    def line_proj(df: pd.DataFrame) -> pd.DataFrame:
        df = df[(df["l_quantity"] >= qlo_min) & (df["l_quantity"] <= qhi_max)].copy()
        df["rev_cents"] = _rev_cents(df["l_extendedprice"], df["l_discount"])
        return df[["l_partkey", "l_quantity", "rev_cents"]]

    joined = line_ds.map_batches(line_proj, batch_format="pandas").join(
        keys_ds, join_type="inner", num_partitions=8,
        on=("l_partkey",), right_on=("p_partkey",),
    )

    def post_join(df: pd.DataFrame) -> pd.DataFrame:
        mask = np.zeros(len(df), dtype=bool)
        for bi, (_, _, _, qlo, qhi) in enumerate(_Q19_BRANCHES):
            mask |= ((df["branch"] == bi).to_numpy()
                     & (df["l_quantity"] >= qlo).to_numpy()
                     & (df["l_quantity"] <= qhi).to_numpy())
        df = df[mask]
        return pd.DataFrame({"rev_cents": [int(df["rev_cents"].sum())],
                             "n_rows": [len(df)]})

    parts = joined.map_batches(post_join, batch_format="pandas").to_pandas()
    return finish(parts)


# ---------------------------------------------------------------------------
# Q7-shape: bilateral nation trade volume — two broadcast dimension maps
# (supplier→nation, customer→nation) feeding one fact⋈fact shuffle join,
# grouped by (supp_nation, cust_nation, year)
# ---------------------------------------------------------------------------

_Q7_NATIONS = (3, 15)  # nationkeys traded between, both directions


def q7_nation_trade(sf_dir: str, nations=None,
                    broadcast_max_rows: int = _CUST_BROADCAST_MAX
                    ) -> pd.DataFrame:
    """Revenue shipped between two nations, by direction and ship year.
    ``nations`` overrides the default pair (tests use a supplier-less
    pair to pin the empty-join-side guard).

    Scale shape: under ``broadcast_max_rows``, supplier→nationkey and
    customer→nationkey broadcast once via ``ray.put``; above it (both
    are SF-proportional) each fact feed resolves its nation by an inner
    hash-shuffle join against the nation-pair-filtered key projection
    instead.  Either way both fact tables are pre-filtered to the two
    nations BEFORE the lineitem⋈orders hash-shuffle join, so that
    exchange moves only the qualifying ~2/N_nations fraction of each
    side.  The cross-pair predicate (supp_nation != cust_nation) applies
    post-join and the final groupby has ≤ 2×2×n_years groups — per-batch
    partials reduce it to pennies before the driver combine."""
    n_lo, n_hi = nations if nations is not None else _Q7_NATIONS

    supp_ds = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    cust_ds = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    orders_raw = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    line_raw = _read(sf_dir, "lineitem",
                     ["l_orderkey", "l_suppkey", "l_extendedprice",
                      "l_discount", "l_shipdate"])
    lo_ts = pd.Timestamp("1996-01-01")
    hi_ts = pd.Timestamp("1998-01-01")

    # the nation filters are selective enough that a block can come out
    # EMPTY — pin an explicit Arrow schema on every block feeding the
    # hash-shuffle join, else the empty partition loses its key dtype and
    # the per-partition pyarrow join crashes (see NOTES_r2 sharp edges)
    orders_schema = pa.schema([("o_orderkey", pa.int64()),
                               ("cust_nk", pa.int32())])
    line_schema = pa.schema([("l_orderkey", pa.int64()),
                             ("supp_nk", pa.int32()),
                             ("l_year", pa.int64()),
                             ("rev_cents", pa.int64())])

    if max(cust_ds.count(), supp_ds.count()) <= broadcast_max_rows:
        _LAST_PATH["q7"] = "broadcast"
        supp = supp_ds.to_pandas()
        s_order = np.argsort(supp["s_suppkey"].to_numpy(dtype="int64"))
        supp_ref = _ray_put((
            supp["s_suppkey"].to_numpy(dtype="int64")[s_order],
            supp["s_nationkey"].to_numpy(dtype="int32")[s_order],
        ))

        cust = cust_ds.to_pandas()
        c_order = np.argsort(cust["c_custkey"].to_numpy(dtype="int64"))
        cust_ref = _ray_put((
            cust["c_custkey"].to_numpy(dtype="int64")[c_order],
            cust["c_nationkey"].to_numpy(dtype="int32")[c_order],
        ))

        def orders_nk(df: pd.DataFrame) -> pa.Table:
            keys, nks = ray.get(cust_ref)
            ck = df["o_custkey"].to_numpy(dtype="int64")
            hit = _in_sorted(ck, keys)
            df = df[hit].copy()
            df["cust_nk"] = nks[np.searchsorted(keys, ck[hit])]
            df = df[df["cust_nk"].isin((n_lo, n_hi))]
            return pa.Table.from_pandas(df[["o_orderkey", "cust_nk"]],
                                        schema=orders_schema,
                                        preserve_index=False)

        orders_ds = orders_raw.map_batches(orders_nk,
                                           batch_format="pandas")

        def line_partial(df: pd.DataFrame) -> pa.Table:
            df = df[(df["l_shipdate"] >= lo_ts) & (df["l_shipdate"] < hi_ts)]
            keys, nks = ray.get(supp_ref)
            sk = df["l_suppkey"].to_numpy(dtype="int64")
            hit = _in_sorted(sk, keys)
            df = df[hit].copy()
            df["supp_nk"] = nks[np.searchsorted(keys, sk[hit])]
            df = df[df["supp_nk"].isin((n_lo, n_hi))].copy()
            df["l_year"] = df["l_shipdate"].dt.year.astype("int64")
            df["rev_cents"] = _rev_cents(df["l_extendedprice"],
                                         df["l_discount"])
            out = df.groupby(["l_orderkey", "supp_nk", "l_year"],
                             as_index=False)["rev_cents"].sum()
            return pa.Table.from_pandas(out, schema=line_schema,
                                        preserve_index=False)

        line_ds = line_raw.map_batches(line_partial,
                                       batch_format="pandas")
    else:
        _LAST_PATH["q7"] = "shuffle"
        pair = pa.array([int(n_lo), int(n_hi)], pa.int64())

        cpair_schema = pa.schema([("c_custkey", pa.int64()),
                                  ("c_nationkey", pa.int64())])

        def cust_pair(t: pa.Table) -> pa.Table:
            m = pc.is_in(pc.cast(t["c_nationkey"], pa.int64()),
                         value_set=pair)
            return t.filter(m).select(["c_custkey", "c_nationkey"]) \
                .cast(cpair_schema)

        def pick_cust_nk(t: pa.Table) -> pa.Table:
            return pa.table({
                "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
                "cust_nk": pc.cast(t["c_nationkey"], pa.int32())}) \
                .cast(orders_schema)

        # left side = FULL orders flow through this exchange
        n_pair = _join_partitions(sf_dir, "orders", selectivity=1.0)
        orders_ds = orders_raw.join(
            cust_ds.map_batches(cust_pair, batch_format="pyarrow"),
            join_type="inner", num_partitions=n_pair,
            on=("o_custkey",), right_on=("c_custkey",),
        ).map_batches(pick_cust_nk, batch_format="pyarrow")

        spair_schema = pa.schema([("s_suppkey", pa.int64()),
                                  ("s_nationkey", pa.int64())])

        def supp_pair(t: pa.Table) -> pa.Table:
            m = pc.is_in(pc.cast(t["s_nationkey"], pa.int64()),
                         value_set=pair)
            return t.filter(m).select(["s_suppkey", "s_nationkey"]) \
                .cast(spair_schema)

        lp_schema = pa.schema([("l_orderkey", pa.int64()),
                               ("l_suppkey", pa.int64()),
                               ("l_year", pa.int64()),
                               ("rev_cents", pa.int64())])

        def line_proj(df: pd.DataFrame) -> pa.Table:
            df = df[(df["l_shipdate"] >= lo_ts)
                    & (df["l_shipdate"] < hi_ts)].copy()
            out = pd.DataFrame({
                "l_orderkey": df["l_orderkey"].astype("int64"),
                "l_suppkey": df["l_suppkey"].astype("int64"),
                "l_year": df["l_shipdate"].dt.year.astype("int64"),
                "rev_cents": _rev_cents(df["l_extendedprice"],
                                        df["l_discount"])})
            return pa.Table.from_pandas(out, schema=lp_schema,
                                        preserve_index=False)

        def fold_supp(df: pd.DataFrame) -> pa.Table:
            df = df.copy()
            df["supp_nk"] = df["s_nationkey"].astype("int32")
            out = df.groupby(["l_orderkey", "supp_nk", "l_year"],
                             as_index=False)["rev_cents"].sum()
            return pa.Table.from_pandas(out, schema=line_schema,
                                        preserve_index=False)

        # left side = date-windowed lineitem (~2/7 of ship years)
        n_lpair = _join_partitions(sf_dir, "lineitem", selectivity=0.3)
        line_ds = line_raw.map_batches(line_proj, batch_format="pandas") \
            .join(supp_ds.map_batches(supp_pair, batch_format="pyarrow"),
                  join_type="inner", num_partitions=n_lpair,
                  on=("l_suppkey",), right_on=("s_suppkey",)) \
            .map_batches(fold_supp, batch_format="pandas")

    # ~2/25 nations × ~2/7 ship years survive the feed filters
    n_parts = _join_partitions(sf_dir, "lineitem", selectivity=0.03)
    # Dataset.join materializes both inputs anyway (NOTES_r2 sharp edges),
    # so materializing here is free — and lets us catch a GLOBALLY empty
    # side (possible at tiny SF: no supplier in the nation pair), which
    # would otherwise crash Ray's hash-shuffle join with a schemaless
    # empty partition.  SQL semantics for an empty inner-join side is an
    # empty result.
    line_m = line_ds.materialize()
    orders_m = orders_ds.materialize()
    if line_m.count() == 0 or orders_m.count() == 0:
        return pd.DataFrame({
            "supp_nation": pd.Series([], dtype="object"),
            "cust_nation": pd.Series([], dtype="object"),
            "l_year": pd.Series([], dtype="int64"),
            "revenue": pd.Series([], dtype="float64"),
        })
    joined = line_m.join(
        orders_m, join_type="inner", num_partitions=n_parts,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["supp_nk"].to_numpy() != df["cust_nk"].to_numpy()]
        return df.groupby(["supp_nk", "cust_nk", "l_year"],
                          as_index=False)["rev_cents"].sum()

    parts = joined.map_batches(pair_partial, batch_format="pandas").to_pandas()
    agg = parts.groupby(["supp_nk", "cust_nk", "l_year"],
                        as_index=False)["rev_cents"].sum()

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    nk_name = dict(zip(nation["n_nationkey"], nation["n_name"]))
    agg["supp_nation"] = agg["supp_nk"].map(nk_name)
    agg["cust_nation"] = agg["cust_nk"].map(nk_name)
    agg["revenue"] = agg["rev_cents"] / 100.0
    agg = agg.sort_values(["supp_nation", "cust_nation", "l_year"],
                          kind="mergesort")
    return agg[["supp_nation", "cust_nation", "l_year",
                "revenue"]].reset_index(drop=True)


# ---------------------------------------------------------------------------
# Q13-shape: customer order-count distribution — LEFT-JOIN shape done as a
# distributed count groupby plus an arithmetic zero bucket (never a
# customer⋈orders row exchange)
# ---------------------------------------------------------------------------


def q13_order_count_dist(sf_dir: str) -> pd.DataFrame:
    """How many customers placed exactly k orders, for every k (including
    0).  The LEFT JOIN in the SQL twin never happens as a row exchange
    here: per-customer order counts come from one distributed groupby over
    orders (per-batch partials first), the count-of-counts histogram is
    again per-batch partials over THAT result, and the k=0 bucket is pure
    arithmetic — |customer| minus the number of distinct ordering
    customers, both distributed counts.  No driver structure is
    O(|orders|) or O(|customer|)."""
    orders_ds = _read(sf_dir, "orders", ["o_custkey"])

    # high-cardinality key (one group per customer): hash-bucket to 64
    # coarse groups and run ONE vectorized pandas groupby per bucket (the
    # q18 pattern — ~8× cheaper than Ray's sort-based Aggregate here);
    # each bucket then emits its own count-of-counts partial, so ≤64×k
    # rows reach the driver
    def count_partial(t: pa.Table) -> pa.Table:
        ck = t["o_custkey"].to_numpy(zero_copy_only=False).astype("int64")
        if len(ck) == 0:
            return pa.table({"o_custkey": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "_b": pa.array([], pa.int64())})
        uk, cnt = np.unique(ck, return_counts=True)
        return pa.table({"o_custkey": pa.array(uk, pa.int64()),
                         "n": pa.array(cnt.astype("int64"), pa.int64()),
                         "_b": pa.array(uk % 64, pa.int64())})

    def bucket_hist(df: pd.DataFrame) -> pd.DataFrame:
        per_cust = df.groupby("o_custkey", as_index=False)["n"].sum()
        out = per_cust.groupby("n", as_index=False).size()
        return out.rename(columns={"n": "c_count", "size": "custdist"})

    hist = orders_ds.map_batches(count_partial, batch_format="pyarrow") \
                    .groupby("_b").map_groups(bucket_hist,
                                              batch_format="pandas") \
                    .to_pandas()
    hist = hist.groupby("c_count", as_index=False)["custdist"].sum()
    n_ordering = int(hist["custdist"].sum())

    n_customers = _read(sf_dir, "customer", ["c_custkey"]).count()
    n_zero = n_customers - n_ordering
    if n_zero > 0:
        hist = pd.concat([hist, pd.DataFrame({"c_count": [0],
                                              "custdist": [n_zero]})],
                         ignore_index=True)

    hist["c_count"] = hist["c_count"].astype("int64")
    hist["custdist"] = hist["custdist"].astype("int64")
    hist = hist.sort_values(["custdist", "c_count"],
                            ascending=[False, False], kind="mergesort")
    return hist.reset_index(drop=True)


# ---------------------------------------------------------------------------
# Q17-shape: small-quantity revenue — per-part average correlated subquery
# done as two streaming passes over the fact table with a broadcast
# per-part threshold between them
# ---------------------------------------------------------------------------

_Q17_BRAND = "Brand#23"


def q17_small_qty_revenue(sf_dir: str,
                          broadcast_max_rows: int = _CUST_BROADCAST_MAX
                          ) -> pd.DataFrame:
    """Average yearly revenue lost if small-quantity orders (below 20 % of
    the part's average order quantity) of one brand were dropped.

    The correlated subquery (per-part AVG over the same fact table)
    becomes two passes over lineitem.  Under ``broadcast_max_rows`` the
    brand's part keys and the per-part thresholds are broadcast sorted
    arrays (pass 1 partials fold on the driver, ~|brand parts| rows).
    Above it (part is fact-scale at 100×) pass 1 runs as a left_semi
    join on the part key with the per-part (sum_qty, n) settling under a
    64-way part-hash bucket, the threshold table STAYS a Dataset, and
    pass 2 resolves the compare through an inner join on the part key —
    the threshold expression ``qty < 0.2·(sum/n)`` is the identical
    float arithmetic on both plans, so they agree bit-for-bit.  Revenue
    sums in integer cents either way."""
    part = _read(sf_dir, "part", ["p_partkey", "p_brand"])
    line_cols = ["l_partkey", "l_quantity", "l_extendedprice"]

    if part.count() <= broadcast_max_rows:
        _LAST_PATH["q17"] = "broadcast"
        brand_keys = part.map_batches(
            lambda df: df.loc[df["p_brand"] == _Q17_BRAND, ["p_partkey"]],
            batch_format="pandas").to_pandas()
        keys_ref = _ray_put(
            np.sort(brand_keys["p_partkey"].to_numpy(dtype="int64")))

        def qty_partial(t: pa.Table) -> pa.Table:
            keys = ray.get(keys_ref)
            pk = t["l_partkey"].to_numpy(zero_copy_only=False) \
                .astype("int64")
            hit = _in_sorted(pk, keys)
            pk = pk[hit]
            if len(pk) == 0:
                return pa.table({"l_partkey": pa.array([], pa.int64()),
                                 "sum_qty": pa.array([], pa.float64()),
                                 "n": pa.array([], pa.int64())})
            q = t["l_quantity"].to_numpy(zero_copy_only=False)[hit]
            uk, inv = np.unique(pk, return_inverse=True)
            return pa.table({
                "l_partkey": pa.array(uk, pa.int64()),
                "sum_qty": pa.array(np.bincount(inv, weights=q),
                                    pa.float64()),
                "n": pa.array(np.bincount(inv).astype("int64"),
                              pa.int64())})

        qty = _read(sf_dir, "lineitem", line_cols) \
            .map_batches(qty_partial, batch_format="pyarrow").to_pandas()
        qty = qty.groupby("l_partkey", as_index=False).agg(
            sum_qty=("sum_qty", "sum"), n=("n", "sum"))
        order = np.argsort(qty["l_partkey"].to_numpy(dtype="int64"))
        thresh_ref = _ray_put((
            qty["l_partkey"].to_numpy(dtype="int64")[order],
            (0.2 * (qty["sum_qty"].to_numpy() / qty["n"].to_numpy()))[order],
        ))

        def rev_partial(t: pa.Table) -> pa.Table:
            keys, thresh = ray.get(thresh_ref)
            pk = t["l_partkey"].to_numpy(zero_copy_only=False) \
                .astype("int64")
            hit = _in_sorted(pk, keys)
            q = t["l_quantity"].to_numpy(zero_copy_only=False)[hit]
            price = t["l_extendedprice"] \
                .to_numpy(zero_copy_only=False)[hit]
            small = q < thresh[np.searchsorted(keys, pk[hit])]
            cents = np.floor(price[small] * 100 + 0.5).astype("int64")
            return pa.table({
                "price_cents": pa.array([int(cents.sum())], pa.int64())})

        parts = _read(sf_dir, "lineitem", line_cols) \
            .map_batches(rev_partial, batch_format="pyarrow").to_pandas()
        total_cents = int(parts["price_cents"].sum())
    else:
        _LAST_PATH["q17"] = "shuffle"
        # the semi-join EXCHANGE carries the full pre-filter lineitem
        # projection (the join IS the brand filter), so size to the full
        # flow; the second join below carries only the ~4% brand slice
        n_parts = _join_partitions(sf_dir, "lineitem", selectivity=1.0)
        n_parts_brand = _join_partitions(sf_dir, "lineitem",
                                         selectivity=0.04)
        bk_schema = pa.schema([("p_partkey", pa.int64())])
        brand_ds = part.map_batches(
            lambda t: t.filter(pc.equal(t["p_brand"], _Q17_BRAND))
            .select(["p_partkey"]).cast(bk_schema),
            batch_format="pyarrow")

        lq_schema = pa.schema([("l_partkey", pa.int64()),
                               ("l_quantity", pa.float64()),
                               ("cents", pa.int64())])

        def line_proj(df: pd.DataFrame) -> pa.Table:
            out = pd.DataFrame({
                "l_partkey": df["l_partkey"].astype("int64"),
                "l_quantity": df["l_quantity"].astype("float64"),
                "cents": np.floor(df["l_extendedprice"].to_numpy() * 100
                                  + 0.5).astype("int64")})
            return pa.Table.from_pandas(out, schema=lq_schema,
                                        preserve_index=False)

        brand_lines = _read(sf_dir, "lineitem", line_cols) \
            .map_batches(line_proj, batch_format="pandas") \
            .join(brand_ds, join_type="left_semi", num_partitions=n_parts,
                  on=("l_partkey",), right_on=("p_partkey",)) \
            .materialize()

        # per-part (sum_qty, n) under a 64-way part-hash bucket — the
        # threshold table never leaves the workers whole
        def qpart(df: pd.DataFrame) -> pd.DataFrame:
            out = df.groupby("l_partkey", as_index=False).agg(
                sum_qty=("l_quantity", "sum"), n=("l_quantity", "size"))
            out["_b"] = (out["l_partkey"].astype("int64") % 64) \
                .astype("int64")
            return out

        qty_schema = pa.schema([("t_partkey", pa.int64()),
                                ("sum_qty", pa.float64()),
                                ("n", pa.int64())])

        def qbucket(df: pd.DataFrame) -> pa.Table:
            out = df.groupby("l_partkey", as_index=False).agg(
                sum_qty=("sum_qty", "sum"), n=("n", "sum"))
            out = out.rename(columns={"l_partkey": "t_partkey"})
            return pa.Table.from_pandas(out, schema=qty_schema,
                                        preserve_index=False)

        qty_ds = brand_lines.map_batches(qpart, batch_format="pandas") \
            .groupby("_b").map_groups(qbucket, batch_format="pandas")

        joined = brand_lines.join(
            qty_ds, join_type="inner", num_partitions=n_parts_brand,
            on=("l_partkey",), right_on=("t_partkey",))

        def small_partial(df: pd.DataFrame) -> pd.DataFrame:
            small = df["l_quantity"].to_numpy() < \
                0.2 * (df["sum_qty"].to_numpy() / df["n"].to_numpy())
            return pd.DataFrame({"price_cents": [int(
                df["cents"].to_numpy(dtype="int64")[small].sum())]})

        parts = joined.map_batches(small_partial,
                                   batch_format="pandas").to_pandas()
        total_cents = int(parts["price_cents"].sum())
    # floor(x*100+0.5)/100, NOT Python round(): round() is banker's
    # rounding, the oracle SQL mirrors this exact half-away formula
    v = total_cents / 100.0 / 7.0
    return pd.DataFrame({"avg_yearly": [np.floor(v * 100 + 0.5) / 100.0]})


# ---------------------------------------------------------------------------
# Q18-shape: large orders — distributed HAVING over a fact groupby, winners
# resolved by broadcast `pc.is_in` (the qualifying set is tiny by
# construction; orders/customer rows never shuffle)
# ---------------------------------------------------------------------------

_Q18_MIN_QTY = 300.0


def q18_large_orders(sf_dir: str,
                     broadcast_max_rows: int = _CUST_BROADCAST_MAX
                     ) -> pd.DataFrame:
    """Top-100 biggest orders whose total line quantity exceeds a
    threshold.  Per-orderkey quantity sums run as per-batch partials + one
    distributed groupby; the HAVING filter applies inside ``map_batches``
    on the grouped result.  While the qualifying set stays under
    ``broadcast_max_rows`` (46 keys at sf0.01) it is collected and both
    orders and customer filter by broadcast ``pc.is_in``; above that (the
    HAVING survivors are SF-proportional) the survivors STAY a Dataset,
    meet orders in a hash-shuffle inner join on the order key, and the
    top-100 settles per 64-way orderkey bucket before the driver merges
    ≤ 64×100 candidate rows — only customer-name resolution for the ≤100
    winners uses a (bounded) broadcast filter."""
    line_ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])

    # high-cardinality key (one group per orderkey): Ray's sort-based
    # Aggregate is ~8× slower than hash-bucketing to 64 coarse groups and
    # doing ONE vectorized pandas groupby per bucket — same exchange
    # volume, trivial sort key
    def qty_partial(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False).astype("int64")
        if len(ok) == 0:
            return pa.table({"l_orderkey": pa.array([], pa.int64()),
                             "l_quantity": pa.array([], pa.float64()),
                             "_b": pa.array([], pa.int64())})
        q = t["l_quantity"].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(ok, return_inverse=True)
        sums = np.bincount(inv, weights=q)
        return pa.table({"l_orderkey": pa.array(uk, pa.int64()),
                         "l_quantity": pa.array(sums, pa.float64()),
                         "_b": pa.array(uk % 64, pa.int64())})

    big_schema = pa.schema([("l_orderkey", pa.int64()),
                            ("sum_qty", pa.float64())])

    def bucket_agg(df: pd.DataFrame) -> pa.Table:
        out = df.groupby("l_orderkey", as_index=False)["l_quantity"].sum()
        out = out[out["l_quantity"] > _Q18_MIN_QTY] \
            .rename(columns={"l_quantity": "sum_qty"})
        return pa.Table.from_pandas(out, schema=big_schema,
                                    preserve_index=False)

    big_ds = line_ds.map_batches(qty_partial, batch_format="pyarrow") \
        .groupby("_b").map_groups(bucket_agg, batch_format="pandas") \
        .materialize()
    orders_ds = _read(sf_dir, "orders",
                      ["o_orderkey", "o_custkey", "o_orderdate",
                       "o_totalprice"])

    if big_ds.count() <= broadcast_max_rows:
        _LAST_PATH["q18"] = "broadcast"
        big = big_ds.to_pandas()
        winner_keys = pa.array(big["l_orderkey"].astype("int64"))
        orders = orders_ds.map_batches(
            lambda t: t.filter(pc.is_in(t["o_orderkey"],
                                        value_set=winner_keys)),
            batch_format="pyarrow").to_pandas()
        cand = big.merge(orders, left_on="l_orderkey",
                         right_on="o_orderkey")
    else:
        _LAST_PATH["q18"] = "shuffle"
        joined = orders_ds.join(
            big_ds, join_type="inner",
            num_partitions=_join_partitions(sf_dir, "orders"),
            on=("o_orderkey",), right_on=("l_orderkey",),
        )

        # per-bucket top-100 partials on the exact output order key
        # (total_cents desc, orderdate, orderkey); driver merges ≤ 64×100
        def bucket_top100(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["total_cents"] = np.floor(
                df["o_totalprice"].to_numpy() * 100 + 0.5).astype("int64")
            return df.sort_values(
                ["total_cents", "o_orderdate", "o_orderkey"],
                ascending=[False, True, True], kind="mergesort").head(100) \
                .drop(columns=["total_cents"])

        def obucket(t: pa.Table) -> pa.Table:
            k = t["o_orderkey"].to_numpy(zero_copy_only=False) \
                .astype("int64")
            return t.append_column("_ob", pa.array(k % 64, pa.int64()))

        cand = joined.map_batches(obucket, batch_format="pyarrow") \
            .groupby("_ob").map_groups(bucket_top100,
                                       batch_format="pandas") \
            .to_pandas()

    if len(cand) == 0:
        return pd.DataFrame({
            "c_name": pd.Series([], dtype=object),
            "o_custkey": pd.Series([], dtype="int64"),
            "o_orderkey": pd.Series([], dtype="int64"),
            "o_orderdate": pd.Series([], dtype="datetime64[us]"),
            "o_totalprice": pd.Series([], dtype="float64"),
            "sum_qty": pd.Series([], dtype="float64")})

    cand["total_cents"] = np.floor(
        cand["o_totalprice"].to_numpy() * 100 + 0.5).astype("int64")
    cand = cand.sort_values(["total_cents", "o_orderdate", "o_orderkey"],
                            ascending=[False, True, True],
                            kind="mergesort").head(100)

    # name resolution for the ≤100 winners — bounded broadcast either way
    cust_keys = pa.array(cand["o_custkey"].astype("int64"))
    cust = (
        _read(sf_dir, "customer", ["c_custkey", "c_name"])
        .map_batches(
            lambda t: t.filter(pc.is_in(t["c_custkey"],
                                        value_set=cust_keys)),
            batch_format="pyarrow")
        .to_pandas()
    )
    out = cand.merge(cust, left_on="o_custkey", right_on="c_custkey")
    out = out.sort_values(["total_cents", "o_orderdate", "o_orderkey"],
                          ascending=[False, True, True], kind="mergesort")
    out["o_totalprice"] = out["total_cents"] / 100.0
    out["o_orderkey"] = out["o_orderkey"].astype("int64")
    out["o_custkey"] = out["o_custkey"].astype("int64")
    return out[["c_name", "o_custkey", "o_orderkey", "o_orderdate",
                "o_totalprice", "sum_qty"]].reset_index(drop=True)


# ---------------------------------------------------------------------------
# Q22-shape: rich idle customers — exact integer-arithmetic scalar average
# plus a plasma-shared sorted-key anti-join (NOT EXISTS)
# ---------------------------------------------------------------------------

_Q22_PRIORITY = "1-URGENT"


def q22_idle_rich_customers(sf_dir: str,
                            broadcast_max_rows: int = _CUST_BROADCAST_MAX
                            ) -> pd.DataFrame:
    """Per-segment count and balance of customers whose account balance
    beats the positive-balance average and who never placed an URGENT
    order.

    Scale shape: the scalar average is (sum_cents, n) partials — and the
    threshold compare is EXACT integer math (`bal_cents * n > sum_cents`),
    immune to float summation order on both engine and oracle sides.  The
    NOT-EXISTS side has two gears: while customer stays under
    ``broadcast_max_rows`` the distinct urgent custkeys assemble into ONE
    sorted int64 array inside a remote task — the driver holds only the
    ObjectRef, filter tasks mmap it zero-copy from plasma and run a
    vectorized ``searchsorted`` anti-membership test.  Above the ceiling
    (urgent custkeys are SF-proportional) the NOT EXISTS runs as a
    hash-shuffle ``left_anti`` ``Dataset.join`` of customer against the
    per-batch-deduped urgent custkey projection — no O(|customer|) plasma
    object on that path, and duplicate right-side keys are harmless to
    anti-join semantics so no global distinct is needed."""
    cust_cols = ["c_custkey", "c_acctbal", "c_mktsegment"]

    def avg_partial(df: pd.DataFrame) -> pd.DataFrame:
        pos = df.loc[df["c_acctbal"] > 0, "c_acctbal"].to_numpy()
        cents = np.floor(pos * 100 + 0.5).astype("int64")
        return pd.DataFrame({"sum_cents": [int(cents.sum())],
                             "n": [len(pos)]})

    parts = _read(sf_dir, "customer", cust_cols) \
        .map_batches(avg_partial, batch_format="pandas").to_pandas()
    sum_cents = int(parts["sum_cents"].sum())
    n_pos = int(parts["n"].sum())

    # per-batch dedup shrinks each block to its unique custkeys
    urgent_schema = pa.schema([("o_custkey", pa.int64())])
    urgent = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"]) \
        .map_batches(
            lambda t: t.filter(
                pc.equal(t["o_orderpriority"], _Q22_PRIORITY))
            .select(["o_custkey"])
            .group_by("o_custkey").aggregate([])
            .cast(urgent_schema),
            batch_format="pyarrow")

    def rich_seg_partial(df: pd.DataFrame) -> pd.DataFrame:
        # rich filter + per-segment partials (anti-membership already
        # applied by the caller's gear)
        bal_cents = np.floor(
            df["c_acctbal"].to_numpy() * 100 + 0.5).astype("int64")
        rich = bal_cents * n_pos > sum_cents
        df = df[rich].copy()
        df["bal_cents"] = bal_cents[rich]
        return df.groupby("c_mktsegment", as_index=False).agg(
            n_custs=("c_custkey", "size"), sum_cents=("bal_cents", "sum"))

    cust_ds = _read(sf_dir, "customer", cust_cols)
    if cust_ds.count() <= broadcast_max_rows:
        _LAST_PATH["q22"] = "broadcast"

        @ray.remote
        def assemble(*tables) -> np.ndarray:
            # varargs so Ray resolves each block ref (refs nested inside a
            # list arrive unresolved); blocks may be Arrow or pandas
            import pyarrow as _pa
            tables = [t if isinstance(t, _pa.Table)
                      else _pa.Table.from_pandas(t) for t in tables]
            keys = _pa.concat_tables(
                [t.select(["o_custkey"]) for t in tables])["o_custkey"]
            return np.unique(
                keys.to_numpy(zero_copy_only=False).astype("int64"))

        urgent_ref = assemble.remote(*urgent.to_arrow_refs())

        def seg_partial(df: pd.DataFrame) -> pd.DataFrame:
            urgent_keys = ray.get(urgent_ref)
            idle = ~_in_sorted(df["c_custkey"].to_numpy(dtype="int64"),
                               urgent_keys)
            return rich_seg_partial(df[idle])

        parts = cust_ds.map_batches(seg_partial,
                                    batch_format="pandas").to_pandas()
    else:
        _LAST_PATH["q22"] = "shuffle"
        idle_ds = cust_ds.join(
            urgent, join_type="left_anti",
            num_partitions=_join_partitions(sf_dir, "customer"),
            on=("c_custkey",), right_on=("o_custkey",),
        )
        parts = idle_ds.map_batches(rich_seg_partial,
                                    batch_format="pandas").to_pandas()
    agg = parts.groupby("c_mktsegment", as_index=False).agg(
        n_custs=("n_custs", "sum"), sum_cents=("sum_cents", "sum"))
    agg["total_acctbal"] = agg["sum_cents"] / 100.0
    agg["n_custs"] = agg["n_custs"].astype("int64")
    agg = agg.sort_values("c_mktsegment", kind="mergesort")
    return agg[["c_mktsegment", "n_custs",
                "total_acctbal"]].reset_index(drop=True)


# ---------------------------------------------------------------------------
# Q8-shape: market share — what fraction of the revenue flowing to one
# customer region is supplied by one target nation, per ship year
# ---------------------------------------------------------------------------

_Q8_REGION = 0    # customer region under analysis
_Q8_NATION = 15   # supplier nation whose share we measure


def q8_market_share(sf_dir: str,
                    broadcast_max_rows: int = _CUST_BROADCAST_MAX
                    ) -> pd.DataFrame:
    """Target nation's share of revenue shipped to one customer region.

    Scale shape: nation (25 rows) always resolves region membership on
    the driver.  Under ``broadcast_max_rows``, customer→nationkey and
    supplier→is-target are broadcast sorted-array lookups; above it
    (both are SF-proportional) the in-region order filter runs as a
    hash-shuffle ``left_semi`` join on the cust key and the is-target
    flag comes from an inner lineitem⋈supplier join on the supp key.
    Either way the lineitem feed pre-aggregates (orderkey, year) →
    (total cents, target-nation cents) partials and the two feeds meet
    in ONE hash-shuffle join on the order key; post-join partials reduce
    to ≤ n_years rows per batch and the driver divides two exact integer
    sums (q14's ratio idiom)."""
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_regionkey"]).to_pandas()
    region_nks = np.sort(nation.loc[nation["n_regionkey"] == _Q8_REGION,
                                    "n_nationkey"].to_numpy(dtype="int64"))

    cust_ds = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    supp_ds = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    orders_raw = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    line_raw = _read(sf_dir, "lineitem",
                     ["l_orderkey", "l_suppkey", "l_extendedprice",
                      "l_discount", "l_shipdate"])

    orders_schema = pa.schema([("o_orderkey", pa.int64())])
    line_schema = pa.schema([("l_orderkey", pa.int64()),
                             ("l_year", pa.int64()),
                             ("cents", pa.int64()),
                             ("tgt_cents", pa.int64())])

    if max(cust_ds.count(), supp_ds.count()) <= broadcast_max_rows:
        _LAST_PATH["q8"] = "broadcast"
        cust = cust_ds.to_pandas()
        in_region = _in_sorted(cust["c_nationkey"].to_numpy(dtype="int64"),
                               region_nks)
        cust_ref = _ray_put(np.sort(
            cust.loc[in_region, "c_custkey"].to_numpy(dtype="int64")))

        supp = supp_ds.to_pandas()
        tgt_ref = _ray_put(np.sort(
            supp.loc[supp["s_nationkey"] == _Q8_NATION,
                     "s_suppkey"].to_numpy(dtype="int64")))

        def orders_feed(df: pd.DataFrame) -> pa.Table:
            keys = ray.get(cust_ref)
            df = df[_in_sorted(df["o_custkey"].to_numpy(dtype="int64"),
                               keys)]
            return pa.Table.from_pandas(df[["o_orderkey"]],
                                        schema=orders_schema,
                                        preserve_index=False)

        orders_ds = orders_raw.map_batches(orders_feed,
                                           batch_format="pandas")

        def line_feed(df: pd.DataFrame) -> pa.Table:
            tgt = ray.get(tgt_ref)
            df = df.copy()
            df["l_year"] = df["l_shipdate"].dt.year.astype("int64")
            df["cents"] = _rev_cents(df["l_extendedprice"], df["l_discount"])
            is_tgt = _in_sorted(df["l_suppkey"].to_numpy(dtype="int64"), tgt)
            df["tgt_cents"] = np.where(is_tgt, df["cents"].to_numpy(), 0)
            out = df.groupby(["l_orderkey", "l_year"], as_index=False).agg(
                cents=("cents", "sum"), tgt_cents=("tgt_cents", "sum"))
            return pa.Table.from_pandas(out, schema=line_schema,
                                        preserve_index=False)

        line_ds = line_raw.map_batches(line_feed, batch_format="pandas")
    else:
        _LAST_PATH["q8"] = "shuffle"
        ckeys_schema = pa.schema([("c_custkey", pa.int64())])
        region_set = pa.array([int(x) for x in region_nks], pa.int64())

        def cust_region(t: pa.Table) -> pa.Table:
            m = pc.is_in(pc.cast(t["c_nationkey"], pa.int64()),
                         value_set=region_set)
            return t.filter(m).select(["c_custkey"]).cast(ckeys_schema)

        # left side = FULL orders flow through this exchange
        n_ord = _join_partitions(sf_dir, "orders", selectivity=1.0)
        orders_ds = orders_raw.join(
            cust_ds.map_batches(cust_region, batch_format="pyarrow"),
            join_type="left_semi", num_partitions=n_ord,
            on=("o_custkey",), right_on=("c_custkey",),
        ).map_batches(
            lambda t: t.select(["o_orderkey"]).cast(orders_schema),
            batch_format="pyarrow")

        lp_schema = pa.schema([("l_orderkey", pa.int64()),
                               ("l_suppkey", pa.int64()),
                               ("l_year", pa.int64()),
                               ("cents", pa.int64())])

        def line_proj(df: pd.DataFrame) -> pa.Table:
            out = pd.DataFrame({
                "l_orderkey": df["l_orderkey"].astype("int64"),
                "l_suppkey": df["l_suppkey"].astype("int64"),
                "l_year": df["l_shipdate"].dt.year.astype("int64"),
                "cents": _rev_cents(df["l_extendedprice"],
                                    df["l_discount"])})
            return pa.Table.from_pandas(out, schema=lp_schema,
                                        preserve_index=False)

        supp_schema = pa.schema([("s_suppkey", pa.int64()),
                                 ("s_nationkey", pa.int64())])
        sds = supp_ds.map_batches(
            lambda t: t.select(["s_suppkey", "s_nationkey"])
            .cast(supp_schema), batch_format="pyarrow")

        n_lj = _join_partitions(sf_dir, "lineitem", selectivity=1.0)
        lj = line_raw.map_batches(line_proj, batch_format="pandas").join(
            sds, join_type="inner", num_partitions=n_lj,
            on=("l_suppkey",), right_on=("s_suppkey",))

        def to_oy(df: pd.DataFrame) -> pa.Table:
            df = df.copy()
            df["tgt_cents"] = np.where(
                df["s_nationkey"].to_numpy(dtype="int64") == _Q8_NATION,
                df["cents"].to_numpy(dtype="int64"), 0)
            out = df.groupby(["l_orderkey", "l_year"], as_index=False).agg(
                cents=("cents", "sum"), tgt_cents=("tgt_cents", "sum"))
            return pa.Table.from_pandas(out, schema=line_schema,
                                        preserve_index=False)

        line_ds = lj.map_batches(to_oy, batch_format="pandas")

    joined = line_ds.join(
        orders_ds, join_type="inner", num_partitions=8,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def year_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("l_year", as_index=False).agg(
            cents=("cents", "sum"), tgt_cents=("tgt_cents", "sum"))

    parts = joined.map_batches(year_partial, batch_format="pandas").to_pandas()
    agg = parts.groupby("l_year", as_index=False).agg(
        cents=("cents", "sum"), tgt_cents=("tgt_cents", "sum"))
    agg = agg.sort_values("l_year", kind="mergesort")
    return pd.DataFrame({
        "l_year": agg["l_year"].astype("int64").to_numpy(),
        "tgt_cents": agg["tgt_cents"].astype("int64").to_numpy(),
        "total_cents": agg["cents"].astype("int64").to_numpy(),
        "mkt_share": [round(t / c, 6) for t, c in
                      zip(agg["tgt_cents"], agg["cents"])],
    })


# ---------------------------------------------------------------------------
# Q9-shape: nation profit by year for one part family — all sides of the
# star resolve by broadcast, so NO shuffle at all: one streaming pass over
# lineitem with a bounded (25 nations × years) groupby
# ---------------------------------------------------------------------------

_Q9_PART_FAMILY = "widget"  # substring of p_name


def q9_nation_profit(sf_dir: str,
                     broadcast_max_rows: int = _CUST_BROADCAST_MAX
                     ) -> pd.DataFrame:
    """Profit (revenue minus tax) booked per supplier nation and ship
    year, for parts of one family.

    While part and supplier stay under ``broadcast_max_rows`` each,
    part→membership and supplier→nationkey are broadcast sorted arrays
    and no shuffle happens anywhere.  Above the ceiling (BOTH are
    SF-proportional — part is a fact-scale table at 100×) the family
    filter runs as a hash-shuffle ``left_semi`` join on the part key and
    the nation resolve as an inner join on the supp key, over a
    pre-aggregated (l_suppkey, l_year, profit_cents) projection so the
    join input is already collapsed to ≤ |suppliers|×|years| rows per
    block.  Profit is computed per row in integer cents
    (rev_cents − floor(extprice·tax·100+0.5)), so sums are
    order-independent.  The final groupby key space is ≤ 25 nations ×
    n_years — the driver combine is trivial either way."""
    part = _read(sf_dir, "part", ["p_partkey", "p_name"])
    supp_ds = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    line_ds = _read(sf_dir, "lineitem",
                    ["l_partkey", "l_suppkey", "l_extendedprice",
                     "l_discount", "l_tax", "l_shipdate"])

    def profit_cents(df: pd.DataFrame) -> np.ndarray:
        rev = _rev_cents(df["l_extendedprice"], df["l_discount"])
        tax = np.floor(df["l_extendedprice"].to_numpy()
                       * df["l_tax"].to_numpy() * 100 + 0.5).astype("int64")
        return rev - tax

    if max(part.count(), supp_ds.count()) <= broadcast_max_rows:
        _LAST_PATH["q9"] = "broadcast"
        fam = part.map_batches(
            lambda df: df.loc[df["p_name"].str.contains(_Q9_PART_FAMILY,
                                                        regex=False),
                              ["p_partkey"]],
            batch_format="pandas").to_pandas()
        fam_ref = _ray_put(np.sort(fam["p_partkey"].to_numpy(dtype="int64")))

        supp = supp_ds.to_pandas()
        s_order = np.argsort(supp["s_suppkey"].to_numpy(dtype="int64"))
        supp_ref = _ray_put((
            supp["s_suppkey"].to_numpy(dtype="int64")[s_order],
            supp["s_nationkey"].to_numpy(dtype="int32")[s_order],
        ))

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            fam_keys = ray.get(fam_ref)
            keys, nks = ray.get(supp_ref)
            df = df[_in_sorted(df["l_partkey"].to_numpy(dtype="int64"),
                               fam_keys)]
            sk = df["l_suppkey"].to_numpy(dtype="int64")
            hit = _in_sorted(sk, keys)
            df = df[hit].copy()
            df["nk"] = nks[np.searchsorted(keys, sk[hit])]
            df["l_year"] = df["l_shipdate"].dt.year.astype("int64")
            df["profit_cents"] = profit_cents(df)
            return df.groupby(["nk", "l_year"],
                              as_index=False)["profit_cents"].sum()

        parts = line_ds.map_batches(partial,
                                    batch_format="pandas").to_pandas()
    else:
        _LAST_PATH["q9"] = "shuffle"
        fam_schema = pa.schema([("p_partkey", pa.int64())])

        def fam_keys_t(t: pa.Table) -> pa.Table:
            m = pc.match_substring(t["p_name"], _Q9_PART_FAMILY)
            return t.filter(m).select(["p_partkey"]).cast(fam_schema)

        fam_ds = part.map_batches(fam_keys_t, batch_format="pyarrow")

        proj_schema = pa.schema([("l_partkey", pa.int64()),
                                 ("l_suppkey", pa.int64()),
                                 ("l_year", pa.int64()),
                                 ("profit_cents", pa.int64())])

        def line_proj(df: pd.DataFrame) -> pa.Table:
            out = pd.DataFrame({
                "l_partkey": df["l_partkey"].astype("int64"),
                "l_suppkey": df["l_suppkey"].astype("int64"),
                "l_year": df["l_shipdate"].dt.year.astype("int64"),
                "profit_cents": profit_cents(df)})
            return pa.Table.from_pandas(out, schema=proj_schema,
                                        preserve_index=False)

        # left side = FULL lineitem projection (the join IS the filter)
        n_fam = _join_partitions(sf_dir, "lineitem", selectivity=1.0)
        fam_lines = line_ds.map_batches(line_proj, batch_format="pandas") \
            .join(fam_ds, join_type="left_semi", num_partitions=n_fam,
                  on=("l_partkey",), right_on=("p_partkey",))

        # collapse to (suppkey, year) partials BEFORE the supplier join
        def pre_agg(df: pd.DataFrame) -> pd.DataFrame:
            return df.groupby(["l_suppkey", "l_year"],
                              as_index=False)["profit_cents"].sum()

        supp_schema = pa.schema([("s_suppkey", pa.int64()),
                                 ("s_nationkey", pa.int64())])
        sds = supp_ds.map_batches(
            lambda t: t.select(["s_suppkey", "s_nationkey"])
            .cast(supp_schema), batch_format="pyarrow")

        n_supp = _join_partitions(sf_dir, "supplier", selectivity=1.0)
        joined = fam_lines.map_batches(pre_agg, batch_format="pandas") \
            .join(sds, join_type="inner", num_partitions=n_supp,
                  on=("l_suppkey",), right_on=("s_suppkey",))

        def nk_partial(df: pd.DataFrame) -> pd.DataFrame:
            out = df.rename(columns={"s_nationkey": "nk"})
            return out.groupby(["nk", "l_year"],
                               as_index=False)["profit_cents"].sum()

        parts = joined.map_batches(nk_partial,
                                   batch_format="pandas").to_pandas()

    agg = parts.groupby(["nk", "l_year"], as_index=False)["profit_cents"].sum()

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    agg["nation"] = agg["nk"].map(
        dict(zip(nation["n_nationkey"], nation["n_name"])))
    agg["profit"] = agg["profit_cents"] / 100.0
    agg = agg.sort_values(["nation", "l_year"], kind="mergesort")
    out = agg[["nation", "l_year", "profit"]].reset_index(drop=True)
    out["l_year"] = out["l_year"].astype("int64")
    return out


# ---------------------------------------------------------------------------
# Q15-shape: top supplier(s) by quarterly revenue — bucketed per-supplier
# sums, then an exact integer max and an equality filter
# ---------------------------------------------------------------------------

_Q15_LO = "1996-01-01"
_Q15_HI = "1996-04-01"


def q15_top_supplier(sf_dir: str) -> pd.DataFrame:
    """Supplier(s) whose revenue over one quarter equals the global max.

    Per-supplier sums use the bucketed-aggregation pattern (per-batch
    partials + 64 hash buckets + one vectorized pandas groupby per
    bucket); the bucket stage ALSO emits only its local max rows, so the
    driver sees ≤ 64 candidate rows, takes the exact integer max, and
    resolves names from the (SF-bounded) supplier dimension for the
    winners only."""
    def partial(t: pa.Table) -> pa.Table:
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False).astype("int64")
        if len(sk) == 0:
            return pa.table({"l_suppkey": pa.array([], pa.int64()),
                             "rev_cents": pa.array([], pa.int64()),
                             "_b": pa.array([], pa.int64())})
        rev = _rev_cents(
            t["l_extendedprice"].to_numpy(zero_copy_only=False),
            t["l_discount"].to_numpy(zero_copy_only=False))
        uk, inv = np.unique(sk, return_inverse=True)
        sums = np.bincount(inv, weights=rev.astype("float64")) \
            .astype("int64")
        return pa.table({"l_suppkey": pa.array(uk, pa.int64()),
                         "rev_cents": pa.array(sums, pa.int64()),
                         "_b": pa.array(uk % 64, pa.int64())})

    def bucket_max(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("l_suppkey", as_index=False)["rev_cents"].sum()
        return out[out["rev_cents"] == out["rev_cents"].max()]

    # the quarter window pushes into the scan
    cands = _read(sf_dir, "lineitem",
                  ["l_suppkey", "l_extendedprice", "l_discount",
                   "l_shipdate"],
                  filter=(pads.field("l_shipdate")
                          >= np.datetime64(_Q15_LO, "us"))
                  & (pads.field("l_shipdate")
                     < np.datetime64(_Q15_HI, "us"))) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("_b").map_groups(bucket_max, batch_format="pandas") \
        .to_pandas()
    best = int(cands["rev_cents"].max())
    winners = cands[cands["rev_cents"] == best].copy()

    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_name"]).to_pandas()
    out = winners.merge(supp, left_on="l_suppkey", right_on="s_suppkey")
    out["total_revenue"] = out["rev_cents"] / 100.0
    out["s_suppkey"] = out["s_suppkey"].astype("int64")
    out = out.sort_values("s_suppkey", kind="mergesort")
    return out[["s_suppkey", "s_name", "total_revenue"]].reset_index(drop=True)


# ---------------------------------------------------------------------------
# Q16-shape: distinct suppliers per part attribute triple — shuffle join on
# the part key, then a DISTINCT under a bounded attribute-hash bucket
# ---------------------------------------------------------------------------

_Q16_EXCLUDE_BRAND = "Brand#13"


def q16_supplier_count(sf_dir: str) -> pd.DataFrame:
    """How many distinct suppliers ship each (brand, type, size) part
    class, excluding one brand.  part scales with SF (not broadcastable),
    so lineitem⋈part is a hash-shuffle join on the part key; the DISTINCT
    (attrs, suppkey) dedup runs per-batch first, then under a bounded
    64-value attribute-hash bucket — never per distinct attribute
    triple."""
    part_schema = pa.schema([("p_partkey", pa.int64()),
                             ("p_brand", pa.string()),
                             ("p_type", pa.string()),
                             ("p_size", pa.int64())])

    def part_feed(df: pd.DataFrame) -> pa.Table:
        df = df[df["p_brand"] != _Q16_EXCLUDE_BRAND]
        return pa.Table.from_pandas(
            df[["p_partkey", "p_brand", "p_type", "p_size"]],
            schema=part_schema, preserve_index=False)

    part_ds = _read(sf_dir, "part",
                    ["p_partkey", "p_brand", "p_type", "p_size"]) \
        .map_batches(part_feed, batch_format="pandas")

    line_ds = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def line_feed(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["l_partkey", "l_suppkey"])

    line_ds = line_ds.map_batches(line_feed, batch_format="pandas")

    joined = line_ds.join(
        part_ds, join_type="inner", num_partitions=8,
        on=("l_partkey",), right_on=("p_partkey",),
    )

    def dedup_batch(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["p_brand", "p_type", "p_size", "l_suppkey"])
        df = df.copy()
        key = (df["p_brand"].astype(str) + "|" + df["p_type"].astype(str)
               + "|" + df["p_size"].astype(str))
        df["_b"] = (pd.util.hash_pandas_object(key, index=False)
                    % 64).astype("int64")
        return df[["p_brand", "p_type", "p_size", "l_suppkey", "_b"]]

    def bucket_count(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["p_brand", "p_type", "p_size", "l_suppkey"])
        return df.groupby(["p_brand", "p_type", "p_size"],
                          as_index=False).agg(supplier_cnt=("l_suppkey",
                                                            "size"))

    out = joined.map_batches(dedup_batch, batch_format="pandas") \
                .groupby("_b").map_groups(bucket_count,
                                          batch_format="pandas") \
                .to_pandas()
    out["p_size"] = out["p_size"].astype("int64")
    out["supplier_cnt"] = out["supplier_cnt"].astype("int64")
    out = out.sort_values(
        ["supplier_cnt", "p_brand", "p_type", "p_size"],
        ascending=[False, True, True, True], kind="mergesort")
    return out[["p_brand", "p_type", "p_size",
                "supplier_cnt"]].reset_index(drop=True)


# ---------------------------------------------------------------------------
# events: ordered 3-stage funnel (view → click → purchase) — per-user
# sequence matching under a bounded user-hash bucket
# ---------------------------------------------------------------------------

_FUNNEL_STAGES = ("view", "click", "purchase")


def events_funnel(sf_dir: str) -> pd.DataFrame:
    """How many users complete each prefix of the ordered funnel
    view → click → purchase (a later stage only counts if it happens
    STRICTLY AFTER the user's earliest qualifying previous stage).

    Users are hash-bucketed (user_id % 64) so each bucket holds complete
    user histories; inside a bucket every stage is a vectorized
    groupby-min + merge + compare — no per-user Python.  Each bucket
    emits one 3-row count partial, so ≤ 64×3 rows reach the driver."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"].isin(_FUNNEL_STAGES)].copy()
        df["_b"] = (df["user_id"].astype("int64") % 64).astype("int64")
        return df[["user_id", "ts", "event_type", "_b"]]

    def bucket_funnel(df: pd.DataFrame) -> pd.DataFrame:
        reached = df.loc[df["event_type"] == _FUNNEL_STAGES[0]] \
            .groupby("user_id", as_index=False)["ts"].min() \
            .rename(columns={"ts": "prev_ts"})
        counts = [len(reached)]
        for stage in _FUNNEL_STAGES[1:]:
            ev = df[df["event_type"] == stage].merge(reached, on="user_id")
            ev = ev[ev["ts"] > ev["prev_ts"]]
            reached = ev.groupby("user_id", as_index=False)["ts"].min() \
                        .rename(columns={"ts": "prev_ts"})
            counts.append(len(reached))
        return pd.DataFrame({"stage": list(_FUNNEL_STAGES),
                             "n_users": counts})

    parts = ds.map_batches(keep, batch_format="pandas") \
              .groupby("_b").map_groups(bucket_funnel,
                                        batch_format="pandas") \
              .to_pandas()
    out = parts.groupby("stage", as_index=False)["n_users"].sum()
    out["n_users"] = out["n_users"].astype("int64")
    out = out.sort_values("stage", kind="mergesort")
    return out[["stage", "n_users"]].reset_index(drop=True)


# ---------------------------------------------------------------------------
# events: per-user rolling average over the last 4 events (ROWS window) —
# vectorized shift-and-mask, no rolling-API per-group state
# ---------------------------------------------------------------------------

_ROLL_WINDOW = 4


def events_rolling_avg(sf_dir: str) -> pd.DataFrame:
    """Rolling mean of ``value`` over each user's last 4 events ordered by
    (ts, event_id).

    Users are hash-bucketed (complete history per bucket); within a
    bucket the ROWS window is THREE shifted adds masked at user
    boundaries — integer cents keep the windowed sums exact, so the
    engine and the SQL window AVG agree bit-for-bit after round(6).
    Output is one row per event (id-keyed), ≤ |events| rows total."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_b"] = (df["user_id"].astype("int64") % 64).astype("int64")
        return df

    def bucket_roll(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort").reset_index(drop=True)
        cents = np.floor(df["value"].to_numpy() * 100 + 0.5).astype("int64")
        uid = df["user_id"].to_numpy()
        s = cents.astype("float64").copy()
        n = np.ones(len(df))
        for k in range(1, _ROLL_WINDOW):
            same = np.zeros(len(df), dtype=bool)
            same[k:] = uid[k:] == uid[:-k]
            shifted = np.zeros(len(df))
            shifted[k:] = cents[:-k]
            s += np.where(same, shifted, 0.0)
            n += same
        return pd.DataFrame({
            "event_id": df["event_id"].astype("int64"),
            "roll_avg": np.round(s / n / 100.0, 6),
        })

    out = ds.map_batches(keep, batch_format="pandas") \
            .groupby("_b").map_groups(bucket_roll, batch_format="pandas") \
            .to_pandas()
    out["event_id"] = out["event_id"].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# events: distributed moments — exact integer (sum, sum-of-squares, count)
# partials so mean and population stddev are bit-stable across any block
# layout and match the oracle's identical closed-form expression
# ---------------------------------------------------------------------------


def events_value_stats(sf_dir: str) -> pd.DataFrame:
    """Per-event-type mean and population stddev of ``value``.

    Naive streaming variance (Welford / DuckDB's STDDEV_POP) accumulates
    floats in visit order and can't match bit-for-bit across different
    partitionings — so BOTH sides compute from exact integer moments
    instead: values become cents (int64), each batch emits
    (n, Σc, Σc²) per type — c² sums stay < 2⁶³ for any realistic event
    volume — and mean/stddev come from the same closed form
    sqrt(E[c²] − E[c]²) on the merged integers, rounded identically."""
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        c = np.floor(df["value"].to_numpy() * 100 + 0.5).astype("int64")
        df["c"] = c
        df["c2"] = c * c
        return df.groupby("event_type", as_index=False).agg(
            n=("c", "size"), s=("c", "sum"), s2=("c2", "sum"))

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    agg = parts.groupby("event_type", as_index=False).agg(
        n=("n", "sum"), s=("s", "sum"), s2=("s2", "sum"))
    n = agg["n"].to_numpy(dtype="float64")
    s = agg["s"].to_numpy(dtype="float64")
    s2 = agg["s2"].to_numpy(dtype="float64")
    mean = s / n / 100.0
    var = (s2 / n - (s / n) ** 2) / 10000.0
    out = pd.DataFrame({
        "event_type": agg["event_type"],
        "n": agg["n"].astype("int64"),
        "mean_value": np.round(mean, 6),
        "stddev_pop": np.round(np.sqrt(np.maximum(var, 0.0)), 6),
    })
    return out.sort_values("event_type",
                           kind="mergesort").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Q21-shape (adapted: no receipt/commit dates in this schema): suppliers
# ranked by late shipments — lineitem⋈orders shuffle join on the order
# key, then bucketed per-supplier counts with per-bucket top-k partials
# ---------------------------------------------------------------------------

_Q21_LATE_DAYS = 90
_Q21_TOP = 10


def q21_late_suppliers(sf_dir: str) -> pd.DataFrame:
    """Top suppliers by number of lineitems shipped more than 90 days
    after the order date (the reference Q21 'kept waiting' shape on the
    columns this schema has).  lineitem⋈orders hash-shuffles on the order
    key; the late filter is a vectorized date diff post-join; per-supplier
    counts finish under a 64-way supplier-hash bucket whose per-bucket
    top-k partials bound the driver merge to ≤ 64×k rows.  Supplier names
    resolve via broadcast ``pc.is_in`` for the k winners only."""
    line_schema = pa.schema([("l_orderkey", pa.int64()),
                             ("l_suppkey", pa.int64()),
                             ("l_shipdate", pa.timestamp("us"))])

    def line_feed(df: pd.DataFrame) -> pa.Table:
        return pa.Table.from_pandas(
            df[["l_orderkey", "l_suppkey", "l_shipdate"]],
            schema=line_schema, preserve_index=False)

    line_ds = _read(sf_dir, "lineitem",
                    ["l_orderkey", "l_suppkey", "l_shipdate"]) \
        .map_batches(line_feed, batch_format="pandas")

    orders_ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])

    joined = line_ds.join(
        orders_ds, join_type="inner", num_partitions=8,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def late_partial(df: pd.DataFrame) -> pd.DataFrame:
        late = (df["l_shipdate"] - df["o_orderdate"]).dt.days > _Q21_LATE_DAYS
        df = df[late]
        out = df.groupby("l_suppkey", as_index=False).agg(
            n_late=("l_orderkey", "size"))
        out["_b"] = (out["l_suppkey"].astype("int64") % 64).astype("int64")
        return out

    def bucket_top(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("l_suppkey", as_index=False)["n_late"].sum()
        return out.sort_values(["n_late", "l_suppkey"],
                               ascending=[False, True],
                               kind="mergesort").head(_Q21_TOP)

    cands = joined.map_batches(late_partial, batch_format="pandas") \
                  .groupby("_b").map_groups(bucket_top,
                                            batch_format="pandas") \
                  .to_pandas()
    top = cands.sort_values(["n_late", "l_suppkey"],
                            ascending=[False, True],
                            kind="mergesort").head(_Q21_TOP)

    winner_keys = pa.array(top["l_suppkey"].astype("int64"))
    supp = (
        _read(sf_dir, "supplier", ["s_suppkey", "s_name"])
        .map_batches(
            lambda t: t.filter(pc.is_in(t["s_suppkey"],
                                        value_set=winner_keys)),
            batch_format="pyarrow")
        .to_pandas()
    )
    out = top.merge(supp, left_on="l_suppkey", right_on="s_suppkey")
    out["s_suppkey"] = out["s_suppkey"].astype("int64")
    out["n_late"] = out["n_late"].astype("int64")
    out = out.sort_values(["n_late", "s_suppkey"],
                          ascending=[False, True], kind="mergesort")
    return out[["s_suppkey", "s_name", "n_late"]].reset_index(drop=True)


# ---------------------------------------------------------------------------
# events: windowed top-k — the top user by spend inside every tumbling
# hour (per-batch partials, window-hash buckets, per-bucket winners)
# ---------------------------------------------------------------------------


def events_top_user_per_window(sf_dir: str) -> pd.DataFrame:
    """The single top user by total ``value`` in each tumbling hour
    (ties break to the smaller user id).

    Per-batch partials pre-sum (window, user) in integer cents; windows
    are hash-bucketed (a window's rows all land in one bucket), each
    bucket finishes its sums and emits ONLY its per-window winners, so
    the driver merge is O(n_windows).  Integer cents make the winner
    deterministic under any summation order."""
    ds = _read(sf_dir, "events", ["ts", "user_id", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["window_start"] = df["ts"].dt.floor("h")
        df["cents"] = np.floor(
            df["value"].to_numpy() * 100 + 0.5).astype("int64")
        out = df.groupby(["window_start", "user_id"],
                         as_index=False)["cents"].sum()
        out["_b"] = (out["window_start"].astype("int64") % 64).astype("int64")
        return out

    def bucket_top(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["window_start", "user_id"],
                         as_index=False)["cents"].sum()
        out = out.sort_values(["window_start", "cents", "user_id"],
                              ascending=[True, False, True],
                              kind="mergesort")
        return out.groupby("window_start", as_index=False).head(1)

    top = ds.map_batches(partial, batch_format="pandas") \
            .groupby("_b").map_groups(bucket_top, batch_format="pandas") \
            .to_pandas()
    top["sum_value"] = top["cents"] / 100.0
    top["user_id"] = top["user_id"].astype("int64")
    top = top.sort_values("window_start", kind="mergesort")
    return top[["window_start", "user_id",
                "sum_value"]].reset_index(drop=True)


# ---------------------------------------------------------------------------
# events: hopping-window DISTINCT users — explode + window-hash-bucketed
# global dedup (a window's rows all land in one bucket)
# ---------------------------------------------------------------------------


def events_hopping_distinct(sf_dir: str) -> pd.DataFrame:
    """Distinct users per overlapping 60-minute window hopping every 30
    minutes.  The vectorized per-batch explode (each event lands in
    exactly two windows) feeds a per-batch dedup, then windows are
    hash-bucketed so each window's global dedup happens inside ONE
    bucket with one vectorized ``drop_duplicates`` — a window never
    spans buckets, so per-bucket counts ARE the final counts and the
    driver only concatenates."""
    ds = _read(sf_dir, "events", ["ts", "user_id"])
    hop = pd.Timedelta(minutes=HOP_MINUTES)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        slot = df["ts"].dt.floor(f"{HOP_MINUTES}min")
        out = pd.concat([
            pd.DataFrame({"window_start": slot, "user_id": df["user_id"]}),
            pd.DataFrame({"window_start": slot - hop,
                          "user_id": df["user_id"]}),
        ], ignore_index=True).drop_duplicates()
        out["_b"] = (out["window_start"].astype("int64") % 64).astype("int64")
        return out

    def bucket_count(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["window_start", "user_id"])
        return df.groupby("window_start", as_index=False).agg(
            n_users=("user_id", "size"))

    out = ds.map_batches(explode, batch_format="pandas") \
            .groupby("_b").map_groups(bucket_count, batch_format="pandas") \
            .to_pandas()
    out["n_users"] = out["n_users"].astype("int64")
    out = out.sort_values("window_start", kind="mergesort")
    return out[["window_start", "n_users"]].reset_index(drop=True)


# ---------------------------------------------------------------------------
# Q2-shape (adapted: no partsupp in this schema): grouped argmin — the
# cheapest part per (type, size) class, with full row join-back
# ---------------------------------------------------------------------------


def q2_min_cost_part(sf_dir: str) -> pd.DataFrame:
    """The cheapest part in every (p_type, p_size) class (ties break to
    the smaller part key) — the reference Q2 min-cost-supplier shape on
    the columns this schema has.

    Grouped ARGMIN with row join-back, shuffle-free beyond one bounded
    bucket exchange: each batch keeps only its per-class winner (one
    vectorized sort + head(1) per group), classes are hash-bucketed by
    size so a class never spans buckets, and each bucket emits its final
    winner rows directly — integer-cents comparison makes the winner
    deterministic."""
    ds = _read(sf_dir, "part",
               ["p_partkey", "p_name", "p_type", "p_size", "p_retailprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["cents"] = np.floor(
            df["p_retailprice"].to_numpy() * 100 + 0.5).astype("int64")
        df = df.sort_values(["p_type", "p_size", "cents", "p_partkey"],
                            kind="mergesort")
        out = df.groupby(["p_type", "p_size"], as_index=False).head(1)
        out["_b"] = (out["p_size"].astype("int64") % 64).astype("int64")
        return out

    def bucket_argmin(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["p_type", "p_size", "cents", "p_partkey"],
                            kind="mergesort")
        return df.groupby(["p_type", "p_size"], as_index=False).head(1)

    out = ds.map_batches(partial, batch_format="pandas") \
            .groupby("_b").map_groups(bucket_argmin, batch_format="pandas") \
            .to_pandas()
    out["p_retailprice"] = out["cents"] / 100.0
    out["p_size"] = out["p_size"].astype("int64")
    out["p_partkey"] = out["p_partkey"].astype("int64")
    out = out.sort_values(["p_type", "p_size"], kind="mergesort")
    return out[["p_type", "p_size", "p_partkey", "p_name",
                "p_retailprice"]].reset_index(drop=True)


# ---------------------------------------------------------------------------
# ROLLUP-shape: revenue by (region, nation) with region subtotals and a
# grand total — multi-level aggregation derived from ONE distributed pass
# ---------------------------------------------------------------------------


def q5_rollup_revenue(sf_dir: str,
                      broadcast_max_rows: int = _CUST_BROADCAST_MAX
                      ) -> pd.DataFrame:
    """Revenue rolled up region ⊃ nation ⊃ grand total.

    One distributed pass computes the finest level (per-nation integer
    cents — the q5 shape: broadcast customer→nation, lineitem⋈orders
    hash-shuffle join, bounded groupby); the coarser rollup levels are
    pure arithmetic over that ≤|nations|-row result on the driver, which
    is the right plan at ANY scale when the finest group-by key is
    bounded — a second shuffle per rollup level would recompute the same
    sums.  Subtotal labels use 'ALL' (not NULL) so ordering and hashing
    are deterministic."""
    nation = _read(sf_dir, "nation",
                   ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    region = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    cust_ds = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    orders_ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    if cust_ds.count() <= broadcast_max_rows:
        _LAST_PATH["q5_rollup"] = "broadcast"
        cust = cust_ds.to_pandas()
        order = np.argsort(cust["c_custkey"].to_numpy(dtype="int64"))
        cust_ref = _ray_put((
            cust["c_custkey"].to_numpy(dtype="int64")[order],
            cust["c_nationkey"].to_numpy(dtype="int32")[order],
        ))

        def orders_nk(t: pa.Table) -> pa.Table:
            keys, nks = ray.get(cust_ref)
            ck = t["o_custkey"].to_numpy(zero_copy_only=False) \
                .astype("int64")
            hit = _in_sorted(ck, keys)
            ok = t["o_orderkey"].to_numpy(zero_copy_only=False) \
                .astype("int64")[hit]
            nk = nks[np.searchsorted(keys, ck[hit])].astype("int64")
            return pa.table({"o_orderkey": pa.array(ok, pa.int64()),
                             "nk": pa.array(nk, pa.int64())})

        orders_ds = orders_ds.map_batches(orders_nk,
                                          batch_format="pyarrow")
    else:
        _LAST_PATH["q5_rollup"] = "shuffle"
        cust_schema = pa.schema([("c_custkey", pa.int64()),
                                 ("c_nationkey", pa.int64())])
        nk_schema = pa.schema([("o_orderkey", pa.int64()),
                               ("nk", pa.int64())])
        orders_ds = orders_ds.join(
            cust_ds.map_batches(
                lambda t: t.select(["c_custkey", "c_nationkey"])
                .cast(cust_schema), batch_format="pyarrow"),
            join_type="inner",
            num_partitions=_join_partitions(sf_dir, "orders"),
            on=("o_custkey",), right_on=("c_custkey",),
        ).map_batches(
            lambda t: pa.table({"o_orderkey": t["o_orderkey"],
                                "nk": t["c_nationkey"]}).cast(nk_schema),
            batch_format="pyarrow")

    line_ds = _read(sf_dir, "lineitem",
                    ["l_orderkey", "l_extendedprice", "l_discount"])

    line_ds = line_ds.map_batches(_line_rev_partial, batch_format="pyarrow")

    joined = line_ds.join(
        orders_ds, join_type="inner", num_partitions=8,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def nk_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("nk", as_index=False)["rev_cents"].sum()

    parts = joined.map_batches(nk_partial, batch_format="pandas").to_pandas()
    base = parts.groupby("nk", as_index=False)["rev_cents"].sum()
    base["nk"] = base["nk"].astype("int64")
    base = base.merge(nation, left_on="nk", right_on="n_nationkey") \
               .merge(region, left_on="n_regionkey", right_on="r_regionkey")

    fine = base[["r_name", "n_name", "rev_cents"]].rename(
        columns={"r_name": "region", "n_name": "nation"})
    sub = fine.groupby("region", as_index=False)["rev_cents"].sum()
    sub["nation"] = "ALL"
    total = pd.DataFrame({"region": ["ALL"], "nation": ["ALL"],
                          "rev_cents": [fine["rev_cents"].sum()]})
    out = pd.concat([fine, sub[["region", "nation", "rev_cents"]], total],
                    ignore_index=True)
    out["revenue"] = out["rev_cents"] / 100.0
    out = out.sort_values(["region", "nation"], kind="mergesort")
    return out[["region", "nation", "revenue"]].reset_index(drop=True)


# ---------------------------------------------------------------------------
# events: day-over-day retention — per-user activity calendars under
# user-hash buckets, next-day membership via vectorized searchsorted
# ---------------------------------------------------------------------------


def events_retention(sf_dir: str) -> pd.DataFrame:
    """For every active day: how many users were active, and how many of
    them were also active the next day (day-over-day retention).

    The self-join in the SQL twin never happens as a row exchange:
    per-batch (user, day) dedup shrinks the exchange to activity pairs,
    users are hash-bucketed so each bucket holds complete per-user
    calendars, and next-day membership is a vectorized ``searchsorted``
    over each bucket's sorted (user, day) arrays.  Buckets emit per-day
    partial counts (≤ n_days rows each) and the driver sums them."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "user_id": df["user_id"].astype("int64"),
            "day": df["ts"].dt.floor("D"),
        }).drop_duplicates()
        out["_b"] = (out["user_id"].astype("int64") % 64).astype("int64")
        return out

    def bucket_retention(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["user_id", "day"])
        uid = df["user_id"].to_numpy(dtype="int64")
        # unit-safe epoch-day index (the column may arrive as ns or us
        # timestamps depending on the arrow<->pandas hop)
        day_idx = df["day"].to_numpy().astype("datetime64[D]").astype("int64")
        # encode (uid, epoch-day) into one int64 so next-day membership is
        # a single searchsorted: epoch-day indexes stay < 2_000_000 for
        # any calendar horizon, so uid * 2e6 + day_idx never collides and
        # fits int64 up to ~4.6e12 users
        enc = uid * 2_000_000 + day_idx
        enc_sorted = np.sort(enc)
        nxt = enc + 1
        p = np.searchsorted(enc_sorted, nxt)
        p[p >= len(enc_sorted)] = len(enc_sorted) - 1
        retained = enc_sorted[p] == nxt
        out = pd.DataFrame({"day": df["day"].to_numpy(),
                            "active": 1,
                            "retained": retained.astype("int64")})
        return out.groupby("day", as_index=False).agg(
            n_active=("active", "sum"), n_retained=("retained", "sum"))

    parts = ds.map_batches(pairs, batch_format="pandas") \
              .groupby("_b").map_groups(bucket_retention,
                                        batch_format="pandas") \
              .to_pandas()
    out = parts.groupby("day", as_index=False).agg(
        n_active=("n_active", "sum"), n_retained=("n_retained", "sum"))
    out["n_active"] = out["n_active"].astype("int64")
    out["n_retained"] = out["n_retained"].astype("int64")
    out = out.sort_values("day", kind="mergesort")
    return out[["day", "n_active", "n_retained"]].reset_index(drop=True)


# ---------------------------------------------------------------------------
# market-basket co-occurrence: part pairs ordered together — the SQL
# self-join becomes per-order pair generation under order-hash buckets
# ---------------------------------------------------------------------------

_BASKET_TOP = 20


def parts_co_ordered(sf_dir: str) -> pd.DataFrame:
    """Top part pairs appearing in the same order (market-basket shape).

    The oracle's lineitem self-join never happens as a row exchange:
    orders are hash-bucketed so each bucket holds complete baskets, pair
    generation is a vectorized per-bucket merge of each order against
    itself (baskets are small — ~7 lineitems — so the blowup is bounded
    per order, not quadratic in the table), and pair counts finish under
    a pair-hash bucket with per-bucket top-k partials."""
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def dedup_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = df.drop_duplicates(["l_orderkey", "l_partkey"])
        out = out.copy()
        out["_b"] = (out["l_orderkey"].astype("int64") % 64).astype("int64")
        return out

    def gen_pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["l_orderkey", "l_partkey"])
        m = df.merge(df, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        out = m.groupby(["l_partkey_x", "l_partkey_y"],
                        as_index=False).size().rename(columns={"size": "n"})
        # re-bucket by pair hash so cross-order counts co-locate
        out["_p"] = ((out["l_partkey_x"].astype("int64") * 1_000_003
                      + out["l_partkey_y"].astype("int64")) % 64).astype("int64")
        return out

    def pair_top(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["l_partkey_x", "l_partkey_y"],
                         as_index=False)["n"].sum()
        return out.sort_values(["n", "l_partkey_x", "l_partkey_y"],
                               ascending=[False, True, True],
                               kind="mergesort").head(_BASKET_TOP)

    cands = ds.map_batches(dedup_bucket, batch_format="pandas") \
              .groupby("_b").map_groups(gen_pairs, batch_format="pandas") \
              .groupby("_p").map_groups(pair_top, batch_format="pandas") \
              .to_pandas()
    top = cands.sort_values(["n", "l_partkey_x", "l_partkey_y"],
                            ascending=[False, True, True],
                            kind="mergesort").head(_BASKET_TOP)
    for c in ("l_partkey_x", "l_partkey_y", "n"):
        top[c] = top[c].astype("int64")
    return top.rename(columns={"l_partkey_x": "part_a",
                               "l_partkey_y": "part_b"}) \
              .reset_index(drop=True)


# ---------------------------------------------------------------------------
# events: conversion gap — users who viewed but never purchased
# (set-membership anti-join under user-hash buckets)
# ---------------------------------------------------------------------------


def events_view_no_purchase(sf_dir: str) -> pd.DataFrame:
    """Global counts of users who viewed but never purchased, and of
    viewers who did convert.
    The anti-join runs as per-bucket set arithmetic: users are
    hash-bucketed with complete histories, each bucket computes its
    viewer and purchaser id sets vectorized, and emits two partial
    counts; the driver sums ≤ 64×1 rows."""
    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"].isin(("view", "purchase"))]
        out = df.drop_duplicates().copy()
        out["_b"] = (out["user_id"].astype("int64") % 64).astype("int64")
        return out

    def bucket_counts(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["user_id", "event_type"])
        viewers = set(df.loc[df["event_type"] == "view", "user_id"])
        buyers = set(df.loc[df["event_type"] == "purchase", "user_id"])
        return pd.DataFrame({
            "n_view_no_purchase": [len(viewers - buyers)],
            "n_view_and_purchase": [len(viewers & buyers)],
        })

    parts = ds.map_batches(keep, batch_format="pandas") \
              .groupby("_b").map_groups(bucket_counts,
                                        batch_format="pandas") \
              .to_pandas()
    return pd.DataFrame({
        "n_view_no_purchase": pd.Series([int(parts["n_view_no_purchase"].sum())],
                                        dtype="int64"),
        "n_view_and_purchase": pd.Series([int(parts["n_view_and_purchase"].sum())],
                                         dtype="int64"),
    })


# ---------------------------------------------------------------------------
# Q11-shape: important parts by value share — per-part sums with a HAVING
# against a global scalar (two streaming passes, broadcast threshold).
# Adapted to lineitem: the testdata has no partsupp table, so "stock value"
# becomes discounted revenue from one nation's suppliers.
# ---------------------------------------------------------------------------

_Q11_NATION = "NATION_3"
_Q11_FRACTION = 0.001


def q11_part_value_share(sf_dir: str,
                         broadcast_max_rows: int = _CUST_BROADCAST_MAX
                         ) -> pd.DataFrame:
    """TPC-H Q11 shape: parts whose revenue from one nation's suppliers
    exceeds FRACTION of that nation's total revenue.

    Scale shape: under ``broadcast_max_rows`` the nation's supplier keys
    are a broadcast SORTED int64 array (one ``ray.put``, ``searchsorted``
    membership per batch — the q17/q19 keyset pattern); above it the
    nation filter runs ONCE as a left_semi join on the supp key and the
    filtered (partkey, cents) projection is materialized for both
    passes.  Either way pass 1 folds a scalar total via 1-row per-batch
    partials and pass 2 finishes bucketed per-part sums (64 partkey-hash
    buckets, one vectorized pandas groupby per bucket) with the
    threshold applied INSIDE the bucket — the driver never holds
    per-part state, only the winners, and the winner count is bounded by
    1/FRACTION by construction (shares sum to 1)."""
    supp_ds = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    nk = int(nat.loc[nat["n_name"] == _Q11_NATION, "n_nationkey"].iloc[0])

    cols = ["l_partkey", "l_suppkey", "l_extendedprice", "l_discount"]

    if supp_ds.count() <= broadcast_max_rows:
        _LAST_PATH["q11"] = "broadcast"
        supp = supp_ds.to_pandas()
        keys_ref = _ray_put(np.sort(
            supp.loc[supp["s_nationkey"] == nk, "s_suppkey"]
            .to_numpy(dtype="int64")))

        def nat_proj(df: pd.DataFrame) -> pd.DataFrame:
            keys = ray.get(keys_ref)
            df = df[_in_sorted(df["l_suppkey"].to_numpy(dtype="int64"),
                               keys)].copy()
            return pd.DataFrame({
                "l_partkey": df["l_partkey"].astype("int64"),
                "v": _rev_cents(df["l_extendedprice"], df["l_discount"])})

        nat_lines = _read(sf_dir, "lineitem", cols) \
            .map_batches(nat_proj, batch_format="pandas").materialize()
    else:
        _LAST_PATH["q11"] = "shuffle"
        sk_schema = pa.schema([("s_suppkey", pa.int64())])
        skeys_ds = supp_ds.map_batches(
            lambda t: t.filter(pc.equal(
                pc.cast(t["s_nationkey"], pa.int64()), nk))
            .select(["s_suppkey"]).cast(sk_schema),
            batch_format="pyarrow")

        lp_schema = pa.schema([("l_partkey", pa.int64()),
                               ("l_suppkey", pa.int64()),
                               ("v", pa.int64())])

        def line_proj(df: pd.DataFrame) -> pa.Table:
            out = pd.DataFrame({
                "l_partkey": df["l_partkey"].astype("int64"),
                "l_suppkey": df["l_suppkey"].astype("int64"),
                "v": _rev_cents(df["l_extendedprice"], df["l_discount"])})
            return pa.Table.from_pandas(out, schema=lp_schema,
                                        preserve_index=False)

        # left side = FULL lineitem projection (the join IS the filter)
        n_parts = _join_partitions(sf_dir, "lineitem", selectivity=1.0)
        nat_lines = _read(sf_dir, "lineitem", cols) \
            .map_batches(line_proj, batch_format="pandas") \
            .join(skeys_ds, join_type="left_semi",
                  num_partitions=n_parts,
                  on=("l_suppkey",), right_on=("s_suppkey",)) \
            .materialize()

    def total_partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "v": [int(df["v"].to_numpy(dtype="int64").sum())]})

    total = int(nat_lines.map_batches(total_partial,
                                      batch_format="pandas")
                .to_pandas()["v"].sum())
    # int64 total < 2^53 cents → the double product matches DuckDB's
    # HUGEINT-to-double promotion bit-for-bit
    thr = total * _Q11_FRACTION

    def part_partial(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("l_partkey", as_index=False)["v"].sum()
        out["_b"] = (out["l_partkey"].astype("int64") % 64).astype("int64")
        return out[["l_partkey", "v", "_b"]]

    def bucket_winners(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("l_partkey", as_index=False)["v"].sum()
        return out[out["v"].to_numpy() > thr]

    out = nat_lines.map_batches(part_partial, batch_format="pandas") \
        .groupby("_b").map_groups(bucket_winners, batch_format="pandas") \
        .to_pandas()
    if out.empty:
        return pd.DataFrame({"l_partkey": pd.Series([], dtype="int64"),
                             "value_cents": pd.Series([], dtype="int64")})
    out["l_partkey"] = out["l_partkey"].astype("int64")
    out["value_cents"] = out["v"].astype("int64")
    out = out.sort_values(["value_cents", "l_partkey"],
                          ascending=[False, True], kind="mergesort")
    return out[["l_partkey", "value_cents"]].reset_index(drop=True)


# ---------------------------------------------------------------------------
# Q20-shape: excess shippers — semi-join on a part-name prefix + a
# correlated threshold (supplier total vs the all-supplier average).
# Adapted to lineitem: no partsupp, so "excess stock" becomes "shipped more
# than MULT × the average supplier's quantity of those parts".
# ---------------------------------------------------------------------------

_Q20_PREFIX = "small"
_Q20_LO = "1996-01-01"
_Q20_HI = "1998-01-01"
_Q20_MULT = 1.2


def q20_excess_shippers(sf_dir: str,
                        broadcast_max_rows: int = _CUST_BROADCAST_MAX
                        ) -> pd.DataFrame:
    """TPC-H Q20 shape: suppliers whose shipped quantity of PREFIX-named
    parts over a two-year window exceeds MULT × the average such total.

    Scale shape: under ``broadcast_max_rows`` the prefix part keys are a
    broadcast sorted int64 array (lineitem never shuffles); above it
    (part is fact-scale at 100×) the prefix filter runs as a left_semi
    join on the part key over the window-filtered (suppkey, partkey, q)
    projection.  Either way per-supplier totals run as bucketed
    aggregation (64 suppkey-hash buckets); the bucket output (ONE row
    per qualifying supplier) is materialized once and consumed twice — a
    1-row-per-batch moment partial for the exact global average, then a
    broadcast-threshold filter whose winners (a small tail by
    construction) are the only rows the driver collects.  Names resolve
    via a ``pc.is_in`` filter over the supplier dimension for winners
    only (the q15 pattern).  Quantities are integral doubles → int64
    sums, so every aggregate is order-independent and SQL-exact."""
    part = _read(sf_dir, "part", ["p_partkey", "p_name"])
    lo = pd.Timestamp(_Q20_LO)
    hi = pd.Timestamp(_Q20_HI)

    def bucket_sum(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("l_suppkey", as_index=False)["q"].sum()

    line_raw = _read(sf_dir, "lineitem",
                     ["l_suppkey", "l_partkey", "l_quantity", "l_shipdate"])

    if part.count() <= broadcast_max_rows:
        _LAST_PATH["q20"] = "broadcast"
        pk = part.map_batches(
            lambda df: df.loc[df["p_name"].str.startswith(_Q20_PREFIX),
                              ["p_partkey"]],
            batch_format="pandas").to_pandas()
        keys_ref = _ray_put(np.sort(pk["p_partkey"].to_numpy(dtype="int64")))

        def supp_partial(df: pd.DataFrame) -> pd.DataFrame:
            keys = ray.get(keys_ref)
            df = df[(df["l_shipdate"] >= lo) & (df["l_shipdate"] < hi)]
            df = df[_in_sorted(df["l_partkey"].to_numpy(dtype="int64"),
                               keys)].copy()
            df["q"] = df["l_quantity"].to_numpy().astype("int64")
            out = df.groupby("l_suppkey", as_index=False)["q"].sum()
            out["_b"] = (out["l_suppkey"].astype("int64") % 64) \
                .astype("int64")
            return out[["l_suppkey", "q", "_b"]]

        partials = line_raw.map_batches(supp_partial,
                                        batch_format="pandas")
    else:
        _LAST_PATH["q20"] = "shuffle"
        pk_schema = pa.schema([("p_partkey", pa.int64())])
        pk_ds = part.map_batches(
            lambda t: t.filter(pc.starts_with(t["p_name"], _Q20_PREFIX))
            .select(["p_partkey"]).cast(pk_schema),
            batch_format="pyarrow")

        lp_schema = pa.schema([("l_suppkey", pa.int64()),
                               ("l_partkey", pa.int64()),
                               ("q", pa.int64())])

        def line_proj(df: pd.DataFrame) -> pa.Table:
            df = df[(df["l_shipdate"] >= lo) & (df["l_shipdate"] < hi)]
            out = pd.DataFrame({
                "l_suppkey": df["l_suppkey"].astype("int64"),
                "l_partkey": df["l_partkey"].astype("int64"),
                "q": df["l_quantity"].to_numpy().astype("int64")})
            return pa.Table.from_pandas(out, schema=lp_schema,
                                        preserve_index=False)

        # left side = date-windowed lineitem (~2/7 of ship years)
        n_parts = _join_partitions(sf_dir, "lineitem", selectivity=0.3)

        def supp_fold(df: pd.DataFrame) -> pd.DataFrame:
            out = df.groupby("l_suppkey", as_index=False)["q"].sum()
            out["_b"] = (out["l_suppkey"].astype("int64") % 64) \
                .astype("int64")
            return out[["l_suppkey", "q", "_b"]]

        partials = line_raw.map_batches(line_proj, batch_format="pandas") \
            .join(pk_ds, join_type="left_semi", num_partitions=n_parts,
                  on=("l_partkey",), right_on=("p_partkey",)) \
            .map_batches(supp_fold, batch_format="pandas")

    per_supp = partials \
        .groupby("_b").map_groups(bucket_sum, batch_format="pandas") \
        .materialize()

    moments = per_supp.map_batches(
        lambda df: pd.DataFrame({"s": [int(df["q"].sum())],
                                 "n": [len(df)]}),
        batch_format="pandas").to_pandas()
    n_supp = int(moments["n"].sum())
    if n_supp == 0:
        return pd.DataFrame({"s_suppkey": pd.Series([], dtype="int64"),
                             "s_name": pd.Series([], dtype=object),
                             "total_qty": pd.Series([], dtype="int64")})
    # int/int → correctly-rounded double, same as DuckDB's AVG(BIGINT)
    thr = (int(moments["s"].sum()) / n_supp) * _Q20_MULT

    winners = per_supp.map_batches(
        lambda df: df[df["q"].to_numpy() > thr],
        batch_format="pandas").to_pandas()
    if winners.empty:
        return pd.DataFrame({"s_suppkey": pd.Series([], dtype="int64"),
                             "s_name": pd.Series([], dtype=object),
                             "total_qty": pd.Series([], dtype="int64")})
    win_keys = pa.array(
        np.sort(winners["l_suppkey"].to_numpy(dtype="int64")))
    names = _read(sf_dir, "supplier", ["s_suppkey", "s_name"]) \
        .map_batches(
            lambda t: t.filter(pc.is_in(pc.cast(t["s_suppkey"], pa.int64()),
                                        value_set=win_keys)),
            batch_format="pyarrow").to_pandas()
    out = winners.merge(names, left_on="l_suppkey", right_on="s_suppkey")
    out["s_suppkey"] = out["s_suppkey"].astype("int64")
    out["total_qty"] = out["q"].astype("int64")
    out = out.sort_values("s_suppkey", kind="mergesort")
    return out[["s_suppkey", "s_name", "total_qty"]].reset_index(drop=True)


# ---------------------------------------------------------------------------
# events: path mining — the most common 3-event sequences (trigrams of a
# user's event-type history), funnel discovery's unsupervised cousin
# ---------------------------------------------------------------------------

_PATHS_TOP_K = 5


def events_user_paths(sf_dir: str, k: int = _PATHS_TOP_K) -> pd.DataFrame:
    """Top-k most common length-3 event-type paths across all users'
    histories ordered by (ts, event_id).

    Users are hash-bucketed (user_id % 64, complete history per bucket);
    inside a bucket ONE pandas sort orders every user's events and the
    trigram build is two shifts masked at user boundaries — no per-user
    Python.  The path key space is |event types|³ (bounded), so each
    bucket emits at most that many count partials and the driver merge is
    O(64 × |paths|), independent of event volume."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_b"] = (df["user_id"].astype("int64") % 64).astype("int64")
        return df[["user_id", "ts", "event_id", "event_type", "_b"]]

    def bucket_paths(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = df["user_id"].to_numpy()
        et = df["event_type"].to_numpy(dtype=object)
        if len(df) < 3:
            return pd.DataFrame({"path": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype="int64")})
        same3 = (uid[:-2] == uid[1:-1]) & (uid[1:-1] == uid[2:])
        tri = pd.Series(et[:-2][same3]) + ">" \
            + pd.Series(et[1:-1][same3]).values + ">" \
            + pd.Series(et[2:][same3]).values
        vc = tri.value_counts()
        return pd.DataFrame({"path": vc.index.to_numpy(dtype=object),
                             "n": vc.to_numpy().astype("int64")})

    parts = ds.map_batches(keep, batch_format="pandas") \
              .groupby("_b").map_groups(bucket_paths,
                                        batch_format="pandas") \
              .to_pandas()
    if parts.empty:
        return pd.DataFrame({"path": pd.Series([], dtype=object),
                             "n": pd.Series([], dtype="int64")})
    out = parts.groupby("path", as_index=False)["n"].sum()
    out["n"] = out["n"].astype("int64")
    out = out.sort_values(["n", "path"], ascending=[False, True],
                          kind="mergesort").head(k)
    return out[["path", "n"]].reset_index(drop=True)


# ---------------------------------------------------------------------------
# events: daily pivot — the crosstab (wide) view of the tumbling window:
# one row per day, one count column per event type
# ---------------------------------------------------------------------------

_PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_pivot(sf_dir: str) -> pd.DataFrame:
    """Per-day event counts pivoted into one column per event type plus a
    total — the wide/crosstab shape (SQL ``COUNT(*) FILTER``).

    Per-batch partial: one vectorized pandas groupby over (day, type) —
    ≤ days×types rows per batch; the driver merge is one pivot over those
    bounded partials (the events_tumbling pattern — window keys are
    calendar-bounded, not data-bounded).  Unknown event types count only
    toward ``n_total``, exactly like the FILTER columns in the SQL."""
    ds = _read(sf_dir, "events", ["ts", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["day"] = df["ts"].dt.floor("D")
        return df.groupby(["day", "event_type"], as_index=False).agg(
            n=("event_type", "size"))

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    merged = parts.groupby(["day", "event_type"], as_index=False)["n"].sum()
    wide = merged.pivot_table(index="day", columns="event_type", values="n",
                              aggfunc="sum", fill_value=0)
    out = pd.DataFrame({"day": wide.index})
    for et in _PIVOT_TYPES:
        col = wide[et].to_numpy() if et in wide.columns else 0
        out[f"n_{et}"] = pd.Series(col, dtype="int64").to_numpy()
    out["n_total"] = merged.groupby("day")["n"].sum() \
        .reindex(wide.index).fillna(0).astype("int64").to_numpy()
    return out.sort_values("day").reset_index(drop=True)


# ---------------------------------------------------------------------------
# orders: month-over-month revenue growth — LAG over an aggregated series
# ---------------------------------------------------------------------------


def orders_monthly_growth(sf_dir: str) -> pd.DataFrame:
    """Monthly order revenue and its month-over-month delta (LAG over the
    aggregate, first month = 0).

    Months are calendar-bounded, so per-batch partials merge on the
    driver (the events_tumbling pattern) and the LAG is one vectorized
    ``diff`` over the ≤ #months-row series — never a row-level window."""
    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["month"] = df["o_orderdate"].dt.to_period("M").dt.to_timestamp()
        df["cents"] = np.floor(
            df["o_totalprice"].to_numpy() * 100 + 0.5).astype("int64")
        return df.groupby("month", as_index=False)["cents"].sum()

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    out = parts.groupby("month", as_index=False)["cents"].sum() \
               .sort_values("month").reset_index(drop=True)
    rev = out["cents"].to_numpy()
    out["revenue_cents"] = rev
    out["delta_cents"] = np.concatenate(([0], np.diff(rev))).astype("int64")
    return out[["month", "revenue_cents", "delta_cents"]]


def orders_seasonal_decompose(sf_dir: str) -> pd.DataFrame:
    """Classical seasonal decomposition of monthly revenue over the
    OBSERVED month series: trend = centered 12-row moving sum // 12
    (full windows only), seasonal = per-calendar-month mean of the
    detrended residuals — integer throughout, with DuckDB's
    truncate-toward-zero ``//`` semantics on the (possibly negative)
    residual means.

    Scale shape: the fact stream collapses to per-month cent partials
    inside ``map_batches`` (the monthly-growth pattern); the
    decomposition then runs over the BOUNDED month calendar on the
    driver — O(#months) integer work, no data motion."""
    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "month": pd.Series([], dtype="datetime64[ns]"),
                "cents": pd.Series([], dtype="int64")})
        df = df.copy()
        df["month"] = df["o_orderdate"].dt.to_period("M").dt.to_timestamp()
        df["cents"] = np.floor(
            df["o_totalprice"].to_numpy() * 100 + 0.5).astype("int64")
        return df.groupby("month", as_index=False)["cents"].sum()

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    cols = ("month", "revenue_cents", "trend_cents", "seasonal_cents")
    if parts.empty:
        return pd.DataFrame({
            "month": pd.Series([], dtype="datetime64[ns]"),
            "revenue_cents": pd.Series([], dtype="int64"),
            "trend_cents": pd.Series([], dtype="int64"),
            "seasonal_cents": pd.Series([], dtype="int64")})
    m = parts.groupby("month", as_index=False)["cents"].sum() \
        .sort_values("month").reset_index(drop=True)
    rev = [int(x) for x in m["cents"]]
    n = len(rev)
    rows = []  # (idx, trend)
    for i in range(n):
        lo, hi = i - 6, i + 6  # ROWS BETWEEN 6 PRECEDING AND 5 FOLLOWING
        if lo < 0 or hi > n:
            continue
        rows.append((i, sum(rev[lo:hi]) // 12))
    if not rows:
        return pd.DataFrame({
            "month": pd.Series([], dtype="datetime64[ns]"),
            "revenue_cents": pd.Series([], dtype="int64"),
            "trend_cents": pd.Series([], dtype="int64"),
            "seasonal_cents": pd.Series([], dtype="int64")})
    dsum: dict = {}
    dn: dict = {}
    for i, trend in rows:
        moy = int(m["month"].iloc[i].month)
        dsum[moy] = dsum.get(moy, 0) + (rev[i] - trend)
        dn[moy] = dn.get(moy, 0) + 1

    def trunc_div(a: int, b: int) -> int:
        # DuckDB // truncates toward zero; Python floors — match DuckDB
        return -((-a) // b) if a < 0 else a // b

    seasonal = {moy: trunc_div(dsum[moy], dn[moy]) for moy in dsum}
    out = pd.DataFrame({
        "month": [m["month"].iloc[i] for i, _ in rows],
        "revenue_cents": pd.Series([rev[i] for i, _ in rows],
                                   dtype="int64"),
        "trend_cents": pd.Series([t for _, t in rows], dtype="int64"),
        "seasonal_cents": pd.Series(
            [seasonal[int(m["month"].iloc[i].month)] for i, _ in rows],
            dtype="int64")})
    return out[list(cols)]


def orders_changepoint(sf_dir: str) -> pd.DataFrame:
    """CUSUM changepoint detection over daily order revenue: per-day
    cents, the cumulative deviation ``dev_i = Σ_{j≤i}(rev_j - mean)``
    with the integer mean ``total // n_days``, and ``is_cp = 1`` on the
    EARLIEST day attaining the maximum |dev| — the classic
    level-shift-location statistic.

    Scale shape: the fact stream collapses to per-day cent partials
    inside ``map_batches`` (the events_tumbling / monthly-growth
    pattern); the CUSUM scan then runs over the BOUNDED day calendar
    (≤ ~11k rows for 30 years) on the driver with Python-int
    accumulation, so the running deviation is HUGEINT-safe even when
    the day sums press against int64."""
    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "day": pd.Series([], dtype="datetime64[ns]"),
                "cents": pd.Series([], dtype="int64")})
        df = df.copy()
        df["day"] = df["o_orderdate"].dt.floor("D")
        df["cents"] = np.floor(
            df["o_totalprice"].to_numpy() * 100 + 0.5).astype("int64")
        return df.groupby("day", as_index=False)["cents"].sum()

    days = ds.map_batches(partial, batch_format="pandas").to_pandas()
    cols = ("day", "revenue_cents", "dev_cents", "is_cp")
    if days.empty:
        return pd.DataFrame({
            "day": pd.Series([], dtype="datetime64[ns]"),
            "revenue_cents": pd.Series([], dtype="int64"),
            "dev_cents": pd.Series([], dtype="int64"),
            "is_cp": pd.Series([], dtype="int64")})
    days = days.groupby("day", as_index=False)["cents"].sum() \
        .sort_values("day").reset_index(drop=True)
    rev = [int(x) for x in days["cents"]]
    total = sum(rev)
    mbar = total // len(rev)
    dev: list = []
    acc = 0
    for r in rev:
        acc += r - mbar
        dev.append(acc)
    mx = max(abs(x) for x in dev)
    cp_idx = next(i for i, x in enumerate(dev) if abs(x) == mx)
    out = pd.DataFrame({
        "day": days["day"],
        "revenue_cents": pd.Series(rev, dtype="int64"),
        "dev_cents": pd.Series(dev, dtype="int64"),
        "is_cp": pd.Series([1 if i == cp_idx else 0
                            for i in range(len(rev))], dtype="int64")})
    return out[list(cols)]


# ---------------------------------------------------------------------------
# running total (UNBOUNDED PRECEDING window): cumulative revenue per customer
# over order time — the one window frame shape not yet covered (rolling_avg
# is a bounded ROWS frame, retention a self-join, sessions a lag)
# ---------------------------------------------------------------------------

_N_RUN_BUCKETS = 64


def orders_running_total(sf_dir: str) -> pd.DataFrame:
    """Cumulative ``o_totalprice`` per customer ordered by
    (o_orderdate, o_orderkey), exact integer cents.

    Scale shape: customers are hash-bucketed (complete history per
    bucket, ``_N_RUN_BUCKETS`` bounded per-group callbacks); inside a
    bucket ONE mergesort + ONE pandas ``groupby().cumsum()`` (C kernel)
    computes every customer's running sum — no per-key Python.  Output is
    one row per order; integer cents keep the prefix sums bit-stable
    under any block layout, so the window SUM matches the oracle
    hash-for-hash."""
    ds = _read(sf_dir, "orders",
               ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_b"] = (df["o_custkey"].astype("int64")
                    % _N_RUN_BUCKETS).astype("int64")
        return df

    def bucket_cumsum(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_custkey", "o_orderdate", "o_orderkey"],
                            kind="mergesort").reset_index(drop=True)
        cents = np.floor(
            df["o_totalprice"].to_numpy() * 100 + 0.5).astype("int64")
        run = pd.Series(cents).groupby(
            df["o_custkey"].to_numpy()).cumsum().to_numpy()
        return pd.DataFrame({
            "o_orderkey": df["o_orderkey"].astype("int64"),
            "run_cents": run.astype("int64")})

    out = ds.map_batches(keep, batch_format="pandas") \
        .groupby("_b").map_groups(bucket_cumsum, batch_format="pandas") \
        .to_pandas()
    for c in ("o_orderkey", "run_cents"):
        out[c] = out[c].astype("int64")
    return out.sort_values("o_orderkey").reset_index(drop=True)


# ---------------------------------------------------------------------------
# DAU / WAU stickiness: COUNT(DISTINCT) under a SLIDING calendar window —
# the one distinct-aggregation shape not yet covered (events_distinct_users
# is global, events_hopping_distinct is per-window-start over event rows)
# ---------------------------------------------------------------------------

_N_DAU_BUCKETS = 64
_WAU_DAYS = 7


def events_dau_wau(sf_dir: str) -> pd.DataFrame:
    """Daily active users, trailing-7-day active users, and the
    DAU/WAU "stickiness" ratio in exact integer micro units.

    Scale shape: sliding-window COUNT(DISTINCT) decomposes into (1) a
    distinct-(day, user) pass under user-hash buckets (a user's whole
    history lands in one bucket, so per-bucket distinct counts are
    exact partials that SUM across buckets), and (2) a bounded 7×
    explode of each (day, user) pair onto the window days it serves —
    the classic turn-a-window-into-a-groupby move, shuffling pair
    PROJECTIONS only.  Driver merge is O(days × buckets); the ratio is
    floor-divided micro units so no float ever aggregates."""
    ds = _read(sf_dir, "events", ["ts", "user_id"])

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "day": df["ts"].dt.floor("D"),
            "user_id": df["user_id"].astype("int64")}).drop_duplicates()
        out["_b"] = (out["user_id"] % _N_DAU_BUCKETS).astype("int64")
        return out

    def bucket_counts(df: pd.DataFrame) -> pd.DataFrame:
        pairs = df[["day", "user_id"]].drop_duplicates()
        dau = pairs.groupby("day", as_index=False).agg(
            n=("user_id", "size"))
        dau["kind"] = "dau"
        ex = pd.concat([
            pd.DataFrame({"day": pairs["day"]
                          + pd.to_timedelta(k, unit="D"),
                          "user_id": pairs["user_id"]})
            for k in range(_WAU_DAYS)], ignore_index=True) \
            .drop_duplicates()
        wau = ex.groupby("day", as_index=False).agg(n=("user_id", "size"))
        wau["kind"] = "wau"
        return pd.concat([dau, wau], ignore_index=True)

    parts = ds.map_batches(pair_partial, batch_format="pandas") \
        .groupby("_b").map_groups(bucket_counts, batch_format="pandas") \
        .to_pandas()
    merged = parts.groupby(["day", "kind"], as_index=False)["n"].sum()
    wide = merged.pivot_table(index="day", columns="kind", values="n",
                              aggfunc="sum", fill_value=0)
    # only days that actually had events (WAU explode creates future days)
    wide = wide[wide.get("dau", pd.Series(0, index=wide.index)) > 0]
    dau = wide["dau"].to_numpy(dtype="int64")
    wau = wide["wau"].to_numpy(dtype="int64")
    return pd.DataFrame({
        "day": wide.index,
        "dau": dau,
        "wau": wau,
        "stickiness_micro": dau * 1_000_000 // np.maximum(wau, 1),
    }).sort_values("day").reset_index(drop=True)


# ---------------------------------------------------------------------------
# connected components of the part co-order graph — the distributed
# ITERATIVE GRAPH algorithm (min-label propagation) exposed as a public,
# SQL-oracle-checked query (the oracle is a recursive-CTE reachability)
# ---------------------------------------------------------------------------

_COMP_SUPPORT = 3


def _order_part_buckets(sf_dir: str):
    """Materialized distinct (l_orderkey, l_partkey) projections under
    order-hash buckets (each bucket owns complete orders — batch-level
    dedup finishes globally inside the bucket).  Shared root of every
    co-order graph pipeline."""
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def dedup_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = df.drop_duplicates(["l_orderkey", "l_partkey"]).copy()
        out["_b"] = (out["l_orderkey"].astype("int64") % 64).astype("int64")
        return out

    return ds.map_batches(dedup_bucket, batch_format="pandas") \
        .materialize()


def _co_order_pair_counts(sf_dir: str, support: int, deduped=None):
    """Dataset (a_id, b_id, n_pair): part pairs co-ordered in ≥
    ``support`` distinct orders, with their exact counts.  The
    market-basket pipeline — order-hash buckets → per-bucket vectorized
    self-merge → pair-hash-bucketed count merge, never a row-level
    self-join exchange."""
    if deduped is None:
        deduped = _order_part_buckets(sf_dir)

    def gen_pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["l_orderkey", "l_partkey"])
        m = df.merge(df, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        out = m.groupby(["l_partkey_x", "l_partkey_y"],
                        as_index=False).size().rename(columns={"size": "n"})
        out["_p"] = ((out["l_partkey_x"].astype("int64") * 1_000_003
                      + out["l_partkey_y"].astype("int64")) % 64) \
            .astype("int64")
        return out

    def pair_counts(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["l_partkey_x", "l_partkey_y"],
                         as_index=False)["n"].sum()
        out = out[out["n"] >= support]
        return pd.DataFrame({
            "a_id": out["l_partkey_x"].astype("int64"),
            "b_id": out["l_partkey_y"].astype("int64"),
            "n_pair": out["n"].astype("int64")})

    return deduped.groupby("_b") \
        .map_groups(gen_pairs, batch_format="pandas") \
        .groupby("_p").map_groups(pair_counts, batch_format="pandas")


def _co_order_edges(sf_dir: str, support: int):
    """Materialized co-order edge Dataset (a_id, b_id, a_seq, b_seq):
    parts co-ordered in ≥ ``support`` distinct orders (counts dropped).
    Shared by ``parts_components`` and ``parts_bfs_levels``."""
    def project(df: pd.DataFrame) -> pd.DataFrame:
        a = df["a_id"].astype("int64")
        b = df["b_id"].astype("int64")
        return pd.DataFrame({"a_id": a, "b_id": b,
                             "a_seq": a, "b_seq": b})

    return _co_order_pair_counts(sf_dir, support) \
        .map_batches(project, batch_format="pandas").materialize()


def parts_components(sf_dir: str, support: int = _COMP_SUPPORT) -> pd.DataFrame:
    """Connected components of the co-order part graph
    (:func:`_co_order_edges`); each component is labeled by its minimum
    part key and reported as (component_id, n_parts, part_checksum).

    Scale shape: components come from ``stages.dedup.label_components`` —
    per-round two hash joins + a bucketed groupby-min, rounds bounded by
    component diameter, the strictly-decreasing label-sum potential
    detecting the fixpoint.  The final per-component stats run under
    label-hash buckets.  The DuckDB twin is a WITH RECURSIVE reachability
    closure — O(Σ|component|²) rows, fine at oracle scale, which is
    exactly why the ENGINE side does propagation instead."""
    from ..stages.dedup import label_components

    edges = _co_order_edges(sf_dir, support)
    empty = pd.DataFrame({"component_id": pd.Series([], dtype="int64"),
                          "n_parts": pd.Series([], dtype="int64"),
                          "part_checksum": pd.Series([], dtype="int64")})
    if edges.count() == 0:
        return empty

    labels, _, _ = label_components(edges)

    def lab_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_lb"] = (df["label"].astype("int64") % 64).astype("int64")
        return df

    def comp_stats(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("label", as_index=False).agg(
            n_parts=("id", "size"), part_checksum=("id", "sum"))
        return out.rename(columns={"label": "component_id"})

    out = labels.map_batches(lab_bucket, batch_format="pandas") \
        .groupby("_lb").map_groups(comp_stats, batch_format="pandas") \
        .to_pandas()
    if not len(out):
        return empty
    for c in ("component_id", "n_parts", "part_checksum"):
        out[c] = out[c].astype("int64")
    return out.sort_values("component_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# storage-layout operator: hive-partitioned write + PRUNED read — only the
# selected partition's files are ever opened (the "prune at the read" rule
# made demonstrable: the filter becomes a directory, not a scan predicate)
# ---------------------------------------------------------------------------


def lineitem_partition_prune(sf_dir: str) -> pd.DataFrame:
    """Write lineitem hive-partitioned by ``l_returnflag``, then read ONLY
    the ``l_returnflag=R`` partition directory back and aggregate it per
    linestatus (exact integer cents).

    Scale shape: the write is one streaming pass producing one directory
    per key value; the read opens just the selected directory — at 100 TB
    a returnflag filter that scans-and-discards reads ~3× the bytes this
    layout reads.  The partition column itself lives in the directory
    name, not the files, so the pruned read ships two value columns and
    one group column, nothing else."""
    import shutil
    import tempfile

    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice"])
    out_dir = tempfile.mkdtemp(prefix="aiws-prune-")
    try:
        ds.write_parquet(out_dir, partition_cols=["l_returnflag"])
        pruned = rd.read_parquet(f"{out_dir}/l_returnflag=R")

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["qty_cents"] = np.floor(
                df["l_quantity"].to_numpy() * 100 + 0.5).astype("int64")
            df["price_cents"] = np.floor(
                df["l_extendedprice"].to_numpy() * 100 + 0.5).astype("int64")
            return df.groupby("l_linestatus", as_index=False).agg(
                n=("l_linestatus", "size"), qty_cents=("qty_cents", "sum"),
                price_cents=("price_cents", "sum"))

        parts = pruned.map_batches(partial, batch_format="pandas") \
            .to_pandas()
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    out = parts.groupby("l_linestatus", as_index=False).agg(
        n=("n", "sum"), qty_cents=("qty_cents", "sum"),
        price_cents=("price_cents", "sum"))
    for c in ("n", "qty_cents", "price_cents"):
        out[c] = out[c].astype("int64")
    return out.sort_values("l_linestatus").reset_index(drop=True)


# ---------------------------------------------------------------------------
# audience overlap: pairwise |A∩B| / |A∪B| / Jaccard between the user SETS
# of each event type — distributed set intersection via per-bucket boolean
# membership matrices (M.T @ M), never a pairwise row exchange
# ---------------------------------------------------------------------------


def events_type_overlap(sf_dir: str) -> pd.DataFrame:
    """For every event-type pair (a < b): users doing both, users doing
    either, and Jaccard similarity in floor-divided ppm.

    Scale shape: users are hash-bucketed (each user's type memberships
    co-locate); a bucket builds its users×types boolean matrix once and
    emits the |types|×|types| co-membership matrix ``M.T @ M`` — one
    integer partial per bucket, independent of user count.  The driver
    merges 64 tiny matrices; the SQL self-join over distinct (type,
    user) pairs never happens as a row exchange."""
    ds = _read(sf_dir, "events", ["event_type", "user_id"])

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        out = df.drop_duplicates().copy()
        out["_b"] = (out["user_id"].astype("int64") % 64).astype("int64")
        return out

    def bucket_matrix(df: pd.DataFrame) -> pd.DataFrame:
        pairs = df[["event_type", "user_id"]].drop_duplicates()
        ct = pd.crosstab(pairs["user_id"], pairs["event_type"])
        m = (ct.to_numpy() > 0).astype("int64")
        co = m.T @ m                        # co-membership counts
        types = list(ct.columns)
        rows = []
        for i, ta in enumerate(types):
            for j, tb in enumerate(types):
                if ta <= tb:                # keep diagonal for |A| merges
                    rows.append((ta, tb, int(co[i, j])))
        return pd.DataFrame(rows, columns=["type_a", "type_b", "n"])

    parts = ds.map_batches(pair_partial, batch_format="pandas") \
        .groupby("_b").map_groups(bucket_matrix, batch_format="pandas") \
        .to_pandas()
    merged = parts.groupby(["type_a", "type_b"], as_index=False)["n"].sum()
    sizes = {r.type_a: int(r.n) for r in
             merged[merged["type_a"] == merged["type_b"]].itertuples()}
    off = merged[(merged["type_a"] < merged["type_b"])
                 & (merged["n"] > 0)].copy()   # SQL's inner join drops
    inter = off["n"].to_numpy(dtype="int64")   # zero-intersection pairs
    na = off["type_a"].map(sizes).to_numpy(dtype="int64")
    nb = off["type_b"].map(sizes).to_numpy(dtype="int64")
    union = na + nb - inter
    out = pd.DataFrame({
        "type_a": off["type_a"], "type_b": off["type_b"],
        "n_both": inter, "n_either": union,
        "jaccard_ppm": inter * 1_000_000 // np.maximum(union, 1)})
    for c in ("n_both", "n_either", "jaccard_ppm"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["type_a", "type_b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# global ROW_NUMBER over an UNBOUNDED domain: range sort + per-block prefix
# offsets (the sort-based complement of docs_percent_rank's histogram rank,
# for keys with ~one distinct value per row where a histogram IS the data)
# ---------------------------------------------------------------------------


def orders_spend_rank(sf_dir: str) -> pd.DataFrame:
    """Every customer's total spend and global spend rank
    (``ROW_NUMBER() OVER (ORDER BY spend DESC, custkey)``).

    Scale shape: per-customer sums reduce under 64-way customer-hash
    buckets; the ranking is ONE range sort of the (custkey, spend)
    projection — Ray's sort range-partitions so block k holds ranks
    strictly after block k-1 — then per-block counts make an exclusive
    prefix on the driver (O(blocks) scalars) and each block adds
    offset + arange, fully vectorized.  This is the correct plan when
    the rank key has ~|rows| distinct values: the percent-rank histogram
    trick would ship the whole table to the driver as its 'histogram'."""
    ds = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def spend_partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["cents"] = np.floor(
            df["o_totalprice"].to_numpy() * 100 + 0.5).astype("int64")
        out = df.groupby("o_custkey", as_index=False)["cents"].sum()
        out["_b"] = (out["o_custkey"].astype("int64") % 64).astype("int64")
        return out

    def bucket_sum(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("o_custkey", as_index=False)["cents"].sum()
        return out.rename(columns={"cents": "spend_cents"})

    spend = ds.map_batches(spend_partial, batch_format="pandas") \
        .groupby("_b").map_groups(bucket_sum, batch_format="pandas") \
        .sort([("spend_cents"), ("o_custkey")], descending=[True, False]) \
        .materialize()

    def block_count(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"first_cust": pa.array([], pa.int64()),
                             "first_spend": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        return pa.table({
            "first_cust": pa.array(
                [int(t["o_custkey"][0].as_py())], pa.int64()),
            "first_spend": pa.array(
                [int(t["spend_cents"][0].as_py())], pa.int64()),
            "n": pa.array([len(t)], pa.int64())})

    parts = spend.map_batches(block_count, batch_format="pyarrow",
                              batch_size=None).to_pandas()
    # block order = range-partition order = (spend DESC, custkey ASC)
    parts = parts.sort_values(["first_spend", "first_cust"],
                              ascending=[False, True]).reset_index(drop=True)
    offsets = parts["n"].cumsum().shift(fill_value=0).astype("int64")
    offset_of = dict(zip(parts["first_cust"].astype("int64"), offsets))

    def assign(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"o_custkey": pa.array([], pa.int64()),
                             "spend_cents": pa.array([], pa.int64()),
                             "spend_rank": pa.array([], pa.int64())})
        cust = t["o_custkey"].to_numpy(zero_copy_only=False).astype("int64")
        base = offset_of[int(cust[0])]
        return pa.table({
            "o_custkey": pa.array(cust, pa.int64()),
            "spend_cents": pc.cast(t["spend_cents"], pa.int64()),
            "spend_rank": pa.array(
                base + 1 + np.arange(len(t), dtype="int64"), pa.int64())})

    out = spend.map_batches(assign, batch_format="pyarrow",
                            batch_size=None).to_pandas()
    for c in ("o_custkey", "spend_cents", "spend_rank"):
        out[c] = out[c].astype("int64")
    return out.sort_values("o_custkey").reset_index(drop=True)


# ---------------------------------------------------------------------------
# exact global heavy hitters: top-20 users by event count — per-batch
# partials under a user-hash bucket; each bucket owns its users end-to-end
# so per-bucket top-20s merge exactly on the driver
# ---------------------------------------------------------------------------


def events_top_users(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """The 20 most active users by event count (ties to the smaller id).

    Scale shape: per-batch ``value_counts`` partials shrink the exchange to
    ≤|users|×blocks integer rows; the user-hash bucket colocates each
    user's partials (totals are exact, not sketched), and only each
    bucket's local top-20 reaches the driver — a 64×20-row merge."""
    ds = _read(sf_dir, "events", ["user_id"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("user_id", as_index=False).agg(n=("user_id", "size"))
        out["_b"] = (out["user_id"].astype("int64") % 64).astype("int64")
        return out

    def bucket_top(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("user_id", as_index=False)["n"].sum()
        return out.sort_values(["n", "user_id"], ascending=[False, True],
                               kind="mergesort").head(k)

    tops = ds.map_batches(partial, batch_format="pandas") \
        .groupby("_b").map_groups(bucket_top, batch_format="pandas") \
        .to_pandas()
    out = tops.sort_values(["n", "user_id"], ascending=[False, True],
                           kind="mergesort").head(k)
    out["user_id"] = out["user_id"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return out[["user_id", "n"]].reset_index(drop=True)


def events_conversion_lag(sf_dir: str) -> pd.DataFrame:
    """(n_users, median_min, p90_min): view→purchase conversion latency —
    for every user whose first purchase is at-or-after their first view,
    the whole-minute lag between the two firsts (µs-operand-floored),
    summarized by the exact discrete median and p90 (DuckDB
    ``quantile_disc`` = the ``ceil(q·n)-1``-th order statistic).

    Scale shape: per-block (user, first-view, first-purchase) min
    partials finish under the 64-way user-hash bucket; each bucket emits
    its users' integer lags and the driver selects the two order
    statistics with O(n) ``np.partition`` over the CONVERTING-user lag
    vector (one int per converting user — the bounded-output argument;
    for a corpus where even that is too large, the bounded-domain
    histogram refinement of docs_token_percentiles applies)."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"user_id": pd.Series([], dtype="int64"),
                "fv": pd.Series([], dtype="int64"),
                "fp": pd.Series([], dtype="int64"),
                "_b": pd.Series([], dtype="int64")}
        df = df[df["event_type"].isin(("view", "purchase"))]
        if len(df) == 0:
            return pd.DataFrame(cols)
        us = df["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        g = pd.DataFrame({
            "user_id": df["user_id"].astype("int64").to_numpy(),
            "fv": np.where(df["event_type"].to_numpy() == "view",
                           us, np.int64(2**62)),
            "fp": np.where(df["event_type"].to_numpy() == "purchase",
                           us, np.int64(2**62))}) \
            .groupby("user_id", as_index=False).min()
        g["_b"] = (g["user_id"] % 64).astype("int64")
        return g

    def bucket_lags(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("user_id", as_index=False)[["fv", "fp"]].min()
        sent = np.int64(2**62)
        m = (g["fv"] < sent) & (g["fp"] < sent) & (g["fp"] >= g["fv"])
        lag = ((g.loc[m, "fp"] - g.loc[m, "fv"]) // 60_000_000) \
            .astype("int64")
        return pd.DataFrame({"lag_min": lag.to_numpy()})

    lags = ds.map_batches(partial, batch_format="pandas") \
        .groupby("_b").map_groups(bucket_lags, batch_format="pandas") \
        .to_pandas()
    cols = ("n_users", "median_min", "p90_min")
    if lags.empty:
        return pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})
    v = lags["lag_min"].to_numpy(dtype="int64")
    n = len(v)
    k50 = -(-(1 * n) // 2) - 1   # ceil(0.5·n) - 1
    k90 = -(-(9 * n) // 10) - 1  # ceil(0.9·n) - 1
    return pd.DataFrame({
        "n_users": pd.Series([n], dtype="int64"),
        "median_min": pd.Series([int(np.partition(v, k50)[k50])],
                                dtype="int64"),
        "p90_min": pd.Series([int(np.partition(v, k90)[k90])],
                             dtype="int64")})


def events_abtest(sf_dir: str) -> pd.DataFrame:
    """Deterministic A/B experiment readout: users split into variants by
    ``md5_32(user_id) % 2`` (the shared-hash conformance convention),
    conversion = has ≥1 'purchase' event, and the 2×2 chi-square
    independence statistic in exact ppm —
    ``χ²·10⁶ = 10⁶·N·(ad-bc)² // ((a+b)(c+d)(a+c)(b+d))`` with Python
    big-int / HUGEINT intermediates (the (ad-bc)² product passes int64
    long before web scale).  Any zero marginal pins χ² to 0.

    Scale shape: per-block (user, purchased) partials finish under the
    64-way user-hash bucket (per-user OR is exact there); each bucket
    emits its four contingency cells, so the driver merges 64×4
    integers."""
    import hashlib

    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({c: pd.Series([], dtype="int64")
                                 for c in ("user_id", "conv", "_b")})
        g = pd.DataFrame({
            "user_id": df["user_id"].astype("int64"),
            "conv": (df["event_type"] == "purchase").astype("int64")}) \
            .groupby("user_id", as_index=False)["conv"].max()
        g["_b"] = (g["user_id"] % 64).astype("int64")
        return g

    def bucket_cells(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("user_id", as_index=False)["conv"].max()
        uids = g["user_id"].astype("int64")
        variant = uids.map(lambda u: int(hashlib.md5(
            str(u).encode()).hexdigest()[:8], 16) % 2).to_numpy()
        conv = g["conv"].to_numpy(dtype="int64")
        return pd.DataFrame({
            "a": [int(((variant == 0) & (conv == 1)).sum())],
            "b": [int(((variant == 0) & (conv == 0)).sum())],
            "c": [int(((variant == 1) & (conv == 1)).sum())],
            "d": [int(((variant == 1) & (conv == 0)).sum())]})

    cells = ds.map_batches(partial, batch_format="pandas") \
        .groupby("_b").map_groups(bucket_cells, batch_format="pandas") \
        .to_pandas()
    cols = ("n_a_conv", "n_a_no", "n_b_conv", "n_b_no", "chi2_ppm")
    if cells.empty:
        return pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})
    a = int(cells["a"].sum())
    b = int(cells["b"].sum())
    c = int(cells["c"].sum())
    d = int(cells["d"].sum())
    denom = (a + b) * (c + d) * (a + c) * (b + d)
    chi2 = 0 if denom == 0 else \
        (1_000_000 * (a + b + c + d) * (a * d - b * c) ** 2) // denom
    return pd.DataFrame({
        "n_a_conv": pd.Series([a], dtype="int64"),
        "n_a_no": pd.Series([b], dtype="int64"),
        "n_b_conv": pd.Series([c], dtype="int64"),
        "n_b_no": pd.Series([d], dtype="int64"),
        "chi2_ppm": pd.Series([chi2], dtype="int64")})


_MARKOV_ITERS = 3


def _transition_counts(ds) -> pd.DataFrame:
    """Merged first-order (from_type, to_type, n) transition counts over
    per-user histories ordered by (ts, event_id) — the shared kernel of
    events_transition_matrix / events_markov_stationary /
    events_entropy_rate: users hash-bucket (user_id % 64, whole history
    per bucket); inside a bucket ONE sort + shift-masked bigram build
    (no per-user Python); the |types|²-bounded partials merge on the
    driver.  Returns a typed-empty frame when no transitions exist."""
    def keep(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_b"] = (df["user_id"].astype("int64") % 64).astype("int64")
        return df[["user_id", "ts", "event_id", "event_type", "_b"]]

    def bucket_transitions(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) < 2 or "user_id" not in df.columns:
            return pd.DataFrame({"from_type": pd.Series([], dtype=object),
                                 "to_type": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype="int64")})
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = df["user_id"].to_numpy()
        et = df["event_type"].to_numpy(dtype=object)
        same = uid[:-1] == uid[1:]
        pairs = pd.DataFrame({"from_type": et[:-1][same],
                              "to_type": et[1:][same]})
        out = pairs.groupby(["from_type", "to_type"], as_index=False) \
            .agg(n=("to_type", "size"))
        out["n"] = out["n"].astype("int64")
        return out

    parts = ds.map_batches(keep, batch_format="pandas") \
        .groupby("_b").map_groups(bucket_transitions,
                                  batch_format="pandas").to_pandas()
    if parts.empty or "from_type" not in parts.columns:
        return pd.DataFrame({"from_type": pd.Series([], dtype=object),
                             "to_type": pd.Series([], dtype=object),
                             "n": pd.Series([], dtype="int64")})
    return parts.groupby(["from_type", "to_type"], as_index=False)["n"] \
        .sum()


def events_markov_stationary(sf_dir: str,
                             iters: int = _MARKOV_ITERS) -> pd.DataFrame:
    """(event_type, v_ppm): ``iters`` integer-ppm power-iteration steps
    of the uniform distribution through the first-order event-type
    transition matrix — the approach-to-stationary distribution of the
    user behavior chain.  Every step is
    ``v'[j] = Σ_i (v[i] · p_ppm[i,j]) // 10⁶`` with
    ``p_ppm = n(i,j)·10⁶ // Σ_j n(i,·)`` — fully integer, so the float
    Σ-order problem never arises and the DuckDB twin iterates the
    IDENTICAL generated CTE steps.

    Scale shape: transition counts reuse the ``events_transition_matrix``
    exchange (user-hash buckets, one sort + shift per bucket, |types|²-
    bounded partials); the iteration then runs on the driver over the
    BOUNDED |types|² matrix — O(k²) integer work, no data motion."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id",
                                  "event_type"])

    def type_partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"t": pd.Series(
            df["event_type"].drop_duplicates(), dtype=object)})

    # the main read already carries event_type — no second table scan
    types = ds.map_batches(type_partial, batch_format="pandas").to_pandas()
    cols = ("event_type", "v_ppm")
    if types.empty:
        return pd.DataFrame({"event_type": pd.Series([], dtype=object),
                             "v_ppm": pd.Series([], dtype="int64")})
    universe = sorted(types["t"].drop_duplicates())

    counts = _transition_counts(ds)
    p: dict = {}
    if not counts.empty:
        marg = counts.groupby("from_type")["n"].transform("sum")
        counts["p_ppm"] = (counts["n"].astype("int64") * 1_000_000
                           // marg.astype("int64"))
        for r in counts.itertuples():
            p[(r.from_type, r.to_type)] = int(r.p_ppm)

    k = len(universe)
    v = {t: 1_000_000 // k for t in universe}
    for _ in range(iters):
        v = {j: sum((v[i] * p.get((i, j), 0)) // 1_000_000
                    for i in universe) for j in universe}
    return pd.DataFrame({
        "event_type": pd.Series(universe, dtype=object),
        "v_ppm": pd.Series([v[t] for t in universe], dtype="int64")})


def events_decayed_counts(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Time-decayed engagement score per user: each event contributes
    ``1_000_000 // 2^(age_days // 7)`` (integer half-life of one week,
    anchored at the corpus MAX(ts)); top-``k`` users by decayed score,
    ties to the smaller id.  The integer weight table makes the decay
    fixpoint-free and exactly mergeable — no float Σ order to pin.

    Scale shape: one bounded-partial pass finds the global anchor
    timestamp; the scoring pass reduces each block to per-user integer
    partials that finish under the 64-way user-hash bucket, and only
    each bucket's local top-k reaches the driver (the events_top_users
    merge argument)."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def ts_max(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"m": pd.Series([], dtype="datetime64[ns]")})
        return pd.DataFrame({"m": [df["ts"].max()]})

    mx = ds.map_batches(ts_max, batch_format="pandas").to_pandas()
    cols = ("user_id", "decayed_q", "n_events")
    if mx.empty:
        return pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})
    anchor = mx["m"].max()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({c: pd.Series([], dtype="int64")
                                 for c in ("user_id", "dq", "n", "_b")})
        # floor each OPERAND to integer µs (exactly SQL's epoch_us), not
        # the difference — flooring the difference disagrees by 1 µs when
        # ts carries a sub-µs fraction larger than the anchor's
        anchor_us = int(np.datetime64(anchor, "us").astype("int64"))
        ts_us = df["ts"].to_numpy().astype("datetime64[us]") \
            .astype("int64")
        age_days = (anchor_us - ts_us) // 86_400_000_000
        kexp = np.minimum(age_days // 7, 20)
        w = (1_000_000 // np.left_shift(np.int64(1), kexp)).astype("int64")
        out = pd.DataFrame({"user_id": df["user_id"].astype("int64"),
                            "dq": w,
                            "n": np.ones(len(df), dtype="int64")}) \
            .groupby("user_id", as_index=False).sum()
        out["_b"] = (out["user_id"] % 64).astype("int64")
        return out

    def bucket_top(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("user_id", as_index=False)[["dq", "n"]].sum()
        return out.sort_values(["dq", "user_id"],
                               ascending=[False, True],
                               kind="mergesort").head(k)

    tops = ds.map_batches(partial, batch_format="pandas") \
        .groupby("_b").map_groups(bucket_top, batch_format="pandas") \
        .to_pandas()
    out = tops.sort_values(["dq", "user_id"], ascending=[False, True],
                           kind="mergesort").head(k)
    return pd.DataFrame({
        "user_id": out["user_id"].astype("int64").to_numpy(),
        "decayed_q": out["dq"].astype("int64").to_numpy(),
        "n_events": out["n"].astype("int64").to_numpy()})


# ---------------------------------------------------------------------------
# iterative graph ranking: PageRank over the directed co-order part graph
# (both directions of every co-order pair, edge weight = co-order count).
# Integer-ppm arithmetic makes the float-free fixpoint reproducible, so the
# DuckDB twin can unroll the same two iterations exactly.
# ---------------------------------------------------------------------------

_PAGERANK_TOP = 20


def parts_pagerank(sf_dir: str, k: int = _PAGERANK_TOP) -> pd.DataFrame:
    """Two PageRank iterations over the co-order part graph; top-k parts by
    final rank (ppm, damping 0.85 as 850/1000 integer ops).

    Scale shape: basket pair-generation is the bounded per-order blowup
    from ``parts_co_ordered``; the edge table (src, dst, n, outw) is built
    under a src-hash bucket (outw is exact — a src's edges are colocated)
    and MATERIALIZED once because both iterations stream over it (the
    loop-invariant input of any iterative graph op).  Iteration 1 folds the
    uniform start rank analytically (contribution = 10⁶·n // outw, row-
    local); iteration 2 attaches rank₁ to edges with a hash-shuffle
    ``Dataset.join`` on src and reduces contributions under a dst-hash
    bucket.  Ranks live in datasets keyed by node throughout — no driver
    rank vector, no broadcast of an unbounded node domain."""
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def dedup_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = df.drop_duplicates(["l_orderkey", "l_partkey"]).copy()
        out["_b"] = (out["l_orderkey"].astype("int64") % 64).astype("int64")
        return out

    def gen_dir_pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["l_orderkey", "l_partkey"])
        m = df.merge(df, on="l_orderkey")
        m = m[m["l_partkey_x"] != m["l_partkey_y"]]
        out = m.groupby(["l_partkey_x", "l_partkey_y"], as_index=False) \
            .size().rename(columns={"l_partkey_x": "src",
                                    "l_partkey_y": "dst", "size": "n"})
        out["_s"] = (out["src"].astype("int64") % 64).astype("int64")
        return out

    def finish_edges(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["src", "dst"], as_index=False)["n"].sum()
        out["outw"] = out.groupby("src")["n"].transform("sum")
        return out[["src", "dst", "n", "outw"]]

    edges = ds.map_batches(dedup_bucket, batch_format="pandas") \
        .groupby("_b").map_groups(gen_dir_pairs, batch_format="pandas") \
        .groupby("_s").map_groups(finish_edges, batch_format="pandas") \
        .materialize()

    def contrib1(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "dst": df["dst"].astype("int64"),
            "c": (1_000_000 * df["n"].astype("int64"))
            // df["outw"].astype("int64")})
        out = out.groupby("dst", as_index=False)["c"].sum()
        out["_d"] = (out["dst"] % 64).astype("int64")
        return out

    def damp(df: pd.DataFrame, rank_col: str) -> pd.DataFrame:
        out = df.groupby("dst", as_index=False)["c"].sum()
        return pd.DataFrame({
            "node": out["dst"].astype("int64"),
            rank_col: (150_000 + 850 * out["c"] // 1_000).astype("int64")})

    if edges.count() == 0:
        # no co-ordered pair anywhere: Dataset.join on a schema-less empty
        # side crashes the hash shuffle (see _join_partitions) — return
        # the oracle's empty top-20 directly
        return pd.DataFrame({"part": pd.Series([], dtype="int64"),
                             "rank_ppm": pd.Series([], dtype="int64")})

    rank1 = edges.map_batches(contrib1, batch_format="pandas") \
        .groupby("_d").map_groups(
            lambda df: damp(df, "rank"), batch_format="pandas")

    n_parts = _join_partitions(sf_dir, "lineitem", selectivity=0.5, cap=16)
    joined = edges.join(rank1, join_type="inner",
                        num_partitions=n_parts,
                        on=("src",), right_on=("node",))

    def contrib2(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "dst": df["dst"].astype("int64"),
            "c": (df["rank"].astype("int64") * df["n"].astype("int64"))
            // df["outw"].astype("int64")})
        out = out.groupby("dst", as_index=False)["c"].sum()
        out["_d"] = (out["dst"] % 64).astype("int64")
        return out

    def bucket_top(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["rank_ppm", "node"],
                              ascending=[False, True],
                              kind="mergesort").head(k)

    tops = joined.map_batches(contrib2, batch_format="pandas") \
        .groupby("_d").map_groups(
            lambda df: bucket_top(damp(df, "rank_ppm")),
            batch_format="pandas") \
        .to_pandas()
    out = tops.sort_values(["rank_ppm", "node"],
                           ascending=[False, True],
                           kind="mergesort").head(k)
    out = out.rename(columns={"node": "part"})
    for c in ("part", "rank_ppm"):
        out[c] = out[c].astype("int64")
    return out[["part", "rank_ppm"]].reset_index(drop=True)


# ---------------------------------------------------------------------------
# mergeable cardinality sketch: KMV (k-minimum-values) distinct-user
# estimate per event type.  md5 is the shared hash so the DuckDB twin runs
# the IDENTICAL sketch — the estimate is deterministic, not "approximately
# checked".
# ---------------------------------------------------------------------------

_KMV_K = 8


def events_kmv_distinct(sf_dir: str, k: int = _KMV_K) -> pd.DataFrame:
    """Distinct users per event type via a KMV sketch: keep the k smallest
    distinct 32-bit hash values; estimate = (k-1) * 2³² // kth_min.

    Scale shape: this is the sketch whose partials MERGE — each batch
    emits its local k smallest (type, hash) rows (a bounded projection,
    never user ids at volume), the type-bucket merge takes the k smallest
    of the union, and the driver sees ≤ |types| finished sketches.  Unlike
    the exact `events_distinct_users` exchange (all distinct pairs), the
    KMV exchange is O(types × k × blocks) regardless of cardinality."""
    import hashlib

    ds = _read(sf_dir, "events", ["event_type", "user_id"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates()
        h = df["user_id"].map(
            lambda u: int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16))
        out = pd.DataFrame({"event_type": df["event_type"],
                            "h32": h.astype("int64")})
        out = out.drop_duplicates()
        return out.sort_values("h32").groupby(
            "event_type", as_index=False).head(k)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates().sort_values("h32")
        df = df.groupby("event_type", as_index=False).head(k)
        kth = df.groupby("event_type", as_index=False).agg(
            kth_hash=("h32", "last"), n=("h32", "size"))
        kth = kth[kth["n"] == k]
        kth["est_users"] = ((k - 1) * 4294967296
                            // kth["kth_hash"]).astype("int64")
        return kth[["event_type", "kth_hash", "est_users"]]

    out = ds.map_batches(partial, batch_format="pandas") \
        .groupby("event_type").map_groups(merge, batch_format="pandas") \
        .to_pandas()
    if out.empty:
        return pd.DataFrame({"event_type": pd.Series([], dtype=object),
                             "kth_hash": pd.Series([], dtype="int64"),
                             "est_users": pd.Series([], dtype="int64")})
    for c in ("kth_hash", "est_users"):
        out[c] = out[c].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


# ---------------------------------------------------------------------------
# bloom-filter broadcast semi-join: orders from one customer segment.
# The small side never ships its keyset — each block emits a fixed 128 KiB
# bitmap partial, the driver ORs ≤ blocks bitmaps, and probe tasks drop
# non-matching orders vectorized; an exact hash-shuffle join over the few
# survivors removes bloom false positives, so the result is exact.
# ---------------------------------------------------------------------------


def orders_bloom_semijoin(sf_dir: str,
                          segment: str = "AUTOMOBILE") -> pd.DataFrame:
    """Order count + total price (cents) per order priority for orders
    placed by customers in ``segment``, via a Bloom-prefiltered semi-join.

    Scale shape: the keyset-broadcast alternative is O(|matching
    customers|) on the driver — the exact pattern that broke q5 in round 1.
    Here the driver holds only ≤ blocks × 128 KiB of OR-mergeable bitmaps
    (`functions/bloom.py`), one `ray.put` broadcasts the merged filter, and
    the orders scan drops ~4/5 of rows before the exact `Dataset.join`
    against the customer-key projection confirms the survivors."""
    import ray

    from ..functions.bloom import (bloom_merge, bloom_might_contain,
                                   bloom_partial)

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])

    def cust_keys(df: pd.DataFrame) -> pd.DataFrame:
        out = df[df["c_mktsegment"] == segment][["c_custkey"]]
        return out

    keys_ds = cust.map_batches(cust_keys, batch_format="pandas") \
        .materialize()

    def to_bitmap(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"bitmap": [
            bloom_partial(df["c_custkey"].to_numpy(dtype="int64"))]})

    partials = keys_ds.map_batches(to_bitmap, batch_format="pandas",
                                   batch_size=None).to_pandas()
    bloom_ref = ray.put(bloom_merge(partials["bitmap"].tolist()))

    orders = _read(sf_dir, "orders",
                   ["o_custkey", "o_orderpriority", "o_totalprice"])

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        bitmap = ray.get(bloom_ref)
        keep = bloom_might_contain(
            bitmap, df["o_custkey"].to_numpy(dtype="int64"))
        out = df[keep].copy()
        out["cents"] = np.floor(
            out["o_totalprice"].to_numpy() * 100 + 0.5).astype("int64")
        return out[["o_custkey", "o_orderpriority", "cents"]]

    n_parts = _join_partitions(sf_dir, "orders", selectivity=0.25, cap=16)
    joined = orders.map_batches(probe, batch_format="pandas").join(
        keys_ds, join_type="inner", num_partitions=n_parts,
        on=("o_custkey",), right_on=("c_custkey",))

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("o_orderpriority", as_index=False).agg(
            n_orders=("cents", "size"), sum_cents=("cents", "sum"))

    out = joined.map_batches(agg, batch_format="pandas").to_pandas()
    out = out.groupby("o_orderpriority", as_index=False).sum()
    for c in ("n_orders", "sum_cents"):
        out[c] = out[c].astype("int64")
    return out.sort_values("o_orderpriority").reset_index(drop=True)


# ---------------------------------------------------------------------------
# triangle counting over the (co-ordered ≥2 times) part graph — the
# wedge-generation + edge-membership-join formulation that distributes:
# wedges are generated per lower-endpoint bucket and confirmed against the
# edge table with a hash-shuffle join, never a driver adjacency structure.
# ---------------------------------------------------------------------------


def parts_triangles(sf_dir: str, min_weight: int = 2) -> pd.DataFrame:
    """Edge / wedge / triangle census of the part graph whose edges are
    pairs co-ordered at least ``min_weight`` times.

    Scale shape: pair counts finish under a pair-hash bucket (same shape
    as ``parts_co_ordered``); edges are MATERIALIZED once (loop-invariant
    input used by three consumers).  Wedges come from each edge-bucket's
    vectorized self-merge on the lower endpoint — id-orientation (u < v)
    bounds the blowup by the oriented degree², the standard enumeration
    cost — and triangle confirmation is an exact multi-key
    ``Dataset.join`` of wedges against edges, NOT a broadcast edge set
    (the edge table is unbounded at web scale)."""
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def dedup_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = df.drop_duplicates(["l_orderkey", "l_partkey"]).copy()
        out["_b"] = (out["l_orderkey"].astype("int64") % 64).astype("int64")
        return out

    def gen_pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["l_orderkey", "l_partkey"])
        m = df.merge(df, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        out = m.groupby(["l_partkey_x", "l_partkey_y"], as_index=False) \
            .size().rename(columns={"l_partkey_x": "u",
                                    "l_partkey_y": "v", "size": "n"})
        out["_p"] = ((out["u"].astype("int64") * 1_000_003
                      + out["v"].astype("int64")) % 64).astype("int64")
        return out

    def finish_edges(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["u", "v"], as_index=False)["n"].sum()
        out = out[out["n"] >= min_weight]
        return out[["u", "v"]].astype("int64")

    edges = ds.map_batches(dedup_bucket, batch_format="pandas") \
        .groupby("_b").map_groups(gen_pairs, batch_format="pandas") \
        .groupby("_p").map_groups(finish_edges, batch_format="pandas") \
        .materialize()
    n_edges = edges.count()

    def bucket_u(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_u"] = (df["u"] % 64).astype("int64")
        return df

    def gen_wedges(df: pd.DataFrame) -> pd.DataFrame:
        m = df.merge(df, on="u")
        m = m[m["v_x"] < m["v_y"]]
        return pd.DataFrame({"y": m["v_x"].astype("int64"),
                             "z": m["v_y"].astype("int64")})

    if n_edges == 0:
        return pd.DataFrame({"n_edges": [0], "n_wedges": [0],
                             "n_triangles": [0]}).astype("int64")

    wedges = edges.map_batches(bucket_u, batch_format="pandas") \
        .groupby("_u").map_groups(gen_wedges, batch_format="pandas") \
        .materialize()
    n_wedges = wedges.count()

    if n_wedges == 0:
        # an empty join side loses its schema and crashes the hash
        # shuffle (see _join_partitions) — and zero wedges means zero
        # triangles anyway
        return pd.DataFrame({"n_edges": [n_edges], "n_wedges": [0],
                             "n_triangles": [0]}).astype("int64")
    tri = wedges.join(edges, join_type="inner", num_partitions=4,
                      on=("y", "z"), right_on=("u", "v"))
    n_triangles = tri.count()

    return pd.DataFrame({"n_edges": [n_edges], "n_wedges": [n_wedges],
                         "n_triangles": [n_triangles]}).astype("int64")


# ---------------------------------------------------------------------------
# incremental-metric shape: new users per day (count of first-ever-seen
# users) — the min-reduce that underlies every "first touch" metric
# ---------------------------------------------------------------------------


def orders_ship_calendar(sf_dir: str) -> pd.DataFrame:
    """Daily order-placement counts FULL-OUTER-aligned with daily
    line-shipment counts: one row per day present on EITHER side,
    zero-filled where the other stream has no activity (ship dates trail
    order dates by months, so both null paths are live).

    Scale shape: each fact stream collapses to per-day count partials
    inside map_batches (≤ |days| rows per block out), finished exactly
    under a 64-way day-hash bucket groupby; the outer alignment then
    merges two AGGREGATED calendars on the driver — a date domain is
    bounded (30 years < 11k rows), so the FULL OUTER join is a
    bounded-domain final, never a fact-table exchange."""
    def day_partial(col):
        def partial(df: pd.DataFrame) -> pd.DataFrame:
            if len(df) == 0:
                return pd.DataFrame({
                    "day": pd.Series([], dtype="datetime64[ns]"),
                    "n": pd.Series([], dtype="int64"),
                    "_b": pd.Series([], dtype="int64")})
            out = df[col].dt.floor("D").value_counts() \
                .rename_axis("day").reset_index(name="n")
            out["_b"] = (out["day"].astype("int64") % 64).astype("int64")
            return out

        return partial

    def bucket_sum(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "day": pd.Series([], dtype="datetime64[ns]"),
                "n": pd.Series([], dtype="int64")})
        return df.groupby("day", as_index=False)["n"].sum()

    def daily(table: str, col: str) -> pd.DataFrame:
        return _read(sf_dir, table, [col]) \
            .map_batches(day_partial(col), batch_format="pandas") \
            .groupby("_b").map_groups(bucket_sum, batch_format="pandas") \
            .to_pandas()

    o = daily("orders", "o_orderdate").rename(columns={"n": "n_orders"})
    s = daily("lineitem", "l_shipdate").rename(columns={"n": "n_shipped"})
    out = o.merge(s, on="day", how="outer")
    for c in ("n_orders", "n_shipped"):
        out[c] = out[c].fillna(0).astype("int64")
    return out.sort_values("day").reset_index(drop=True)


def events_new_users_daily(sf_dir: str) -> pd.DataFrame:
    """Count of users whose FIRST event falls on each day.

    Scale shape: per-batch (user, min-day) partials shrink the exchange to
    ≤|users|×blocks rows; the user-hash bucket finishes the global min per
    user (all partials of a user colocate) and emits per-day count
    partials, so the driver merges ≤ 64×|days| rows and never sees user
    ids."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["day"] = df["ts"].dt.floor("D")
        out = df.groupby("user_id", as_index=False)["day"].min()
        out["_b"] = (out["user_id"].astype("int64") % 64).astype("int64")
        return out

    def bucket_days(df: pd.DataFrame) -> pd.DataFrame:
        first = df.groupby("user_id", as_index=False)["day"].min()
        return first.groupby("day", as_index=False).agg(
            n_new=("user_id", "size"))

    parts = ds.map_batches(partial, batch_format="pandas") \
        .groupby("_b").map_groups(bucket_days, batch_format="pandas") \
        .to_pandas()
    out = parts.groupby("day", as_index=False)["n_new"].sum()
    out["n_new"] = out["n_new"].astype("int64")
    return out.sort_values("day").reset_index(drop=True)


# ---------------------------------------------------------------------------
# data profiling: per-column null count, exact distinct count, min / max in
# ONE scan + one bounded distinct exchange — the validation pass a pipeline
# runs before trusting 100 TB of input
# ---------------------------------------------------------------------------

_PROFILE_INT_COLS = ("o_custkey",)
_PROFILE_STR_COLS = ("o_orderstatus", "o_orderpriority")


def orders_profile(sf_dir: str) -> pd.DataFrame:
    """Column profile of ``orders`` (int + string columns; floats and
    timestamps are profiled via their integer twins elsewhere — string
    formatting of those types is engine-specific, so the profiler keeps to
    types with a canonical text form).

    Scale shape: null/min/max partials are one tiny typed row per (column,
    batch); the distinct count is exact, not sketched — per-batch distinct
    (col, value) pairs dedup globally under a value-hash bucket and only
    per-column count partials reach the driver.  One scan feeds both."""
    cols = list(_PROFILE_INT_COLS + _PROFILE_STR_COLS)
    # two streaming scans of the column-pruned read — cheaper than pinning
    # the whole projection in the object store between the two passes
    ds = _read(sf_dir, "orders", cols)

    def mm_partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for c in cols:
            s = df[c]
            vals = s.dropna()
            is_int = c in _PROFILE_INT_COLS
            rows.append({
                "col": c,
                "n_nulls": int(s.isna().sum()),
                "min_i": int(vals.min()) if is_int and len(vals) else None,
                "max_i": int(vals.max()) if is_int and len(vals) else None,
                "min_s": str(vals.min()) if not is_int and len(vals) else None,
                "max_s": str(vals.max()) if not is_int and len(vals) else None,
            })
        return pd.DataFrame(rows)

    mm = ds.map_batches(mm_partial, batch_format="pandas").to_pandas()

    def dv_partial(df: pd.DataFrame) -> pd.DataFrame:
        frames = [pd.DataFrame({"col": c, "val": df[c].dropna()
                                .astype(str).unique()}) for c in cols]
        out = pd.concat(frames, ignore_index=True)
        out["_b"] = (pd.util.hash_pandas_object(
            out["col"] + "\x00" + out["val"], index=False) % 64) \
            .astype("int64")
        return out

    def dv_count(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["col", "val"])
        return df.groupby("col", as_index=False).agg(n=("val", "size"))

    dv = ds.map_batches(dv_partial, batch_format="pandas") \
        .groupby("_b").map_groups(dv_count, batch_format="pandas") \
        .to_pandas()
    dv = dv.groupby("col", as_index=False)["n"].sum() \
        .rename(columns={"n": "n_distinct"})

    rows = []
    for c in cols:
        g = mm[mm["col"] == c]
        if c in _PROFILE_INT_COLS:
            min_v = str(int(g["min_i"].dropna().min()))
            max_v = str(int(g["max_i"].dropna().max()))
        else:
            min_v = str(g["min_s"].dropna().min())
            max_v = str(g["max_s"].dropna().max())
        rows.append({"col": c, "n_nulls": int(g["n_nulls"].sum()),
                     "min_v": min_v, "max_v": max_v})
    out = pd.DataFrame(rows).merge(dv, on="col")
    for c in ("n_nulls", "n_distinct"):
        out[c] = out[c].astype("int64")
    return out[["col", "n_nulls", "n_distinct", "min_v", "max_v"]] \
        .sort_values("col").reset_index(drop=True)


# ---------------------------------------------------------------------------
# sequential-recurrence operator: integer EWMA over each type's daily count
# series — the "reduce to a bounded series, then scan it where it lives"
# pattern for stateful time-series smoothing
# ---------------------------------------------------------------------------


def events_daily_ewma(sf_dir: str) -> pd.DataFrame:
    """Per-type daily event counts smoothed by the integer EWMA
    ``s_t = (3·s_{t-1} + x_t) // 4`` (s_0 = x_0) — floor division makes
    the inherently sequential recurrence reproducible, so the DuckDB twin
    can replay it with a recursive CTE.

    Scale shape: the count reduction is the distributed part (per-batch
    (type, day) partials, ≤|types|×|days|×blocks rows); each type's
    complete bounded series lands in its type-hash bucket where the scan
    runs IN the worker — per-key series recurrences distribute by key,
    they never run on the driver."""
    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["day"] = df["ts"].dt.floor("D")
        return df.groupby(["event_type", "day"], as_index=False) \
            .agg(n=("ts", "size"))

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        df = df.groupby(["event_type", "day"], as_index=False)["n"].sum()
        frames = []
        for et, g in df.groupby("event_type", sort=False):
            g = g.sort_values("day", kind="mergesort")
            x = g["n"].to_numpy(dtype="int64")
            s = np.empty_like(x)
            acc = x[0]
            s[0] = acc
            for i in range(1, len(x)):
                acc = (3 * acc + x[i]) // 4
                s[i] = acc
            g = g.copy()
            g["ewma_q"] = s
            frames.append(g)
        return pd.concat(frames, ignore_index=True)

    out = ds.map_batches(partial, batch_format="pandas") \
        .groupby("event_type").map_groups(scan, batch_format="pandas") \
        .to_pandas()
    for c in ("n", "ewma_q"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["event_type", "day"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# sessionization to a session TABLE (ids + bounds), not just per-user
# stats: the event-to-entity assignment every funnel/attribution pipeline
# starts from
# ---------------------------------------------------------------------------


def events_session_table(sf_dir: str) -> pd.DataFrame:
    """One row per session: (user, session_id, start, end, event count),
    sessions split at >30-minute gaps (same contract as
    ``events_sessions``).

    Scale shape: user-hash buckets hold complete histories; inside a
    bucket ONE sort + diff + boundary mask + per-user cumsum (all C
    kernels) assigns every event its session id, and only the per-session
    aggregate rows leave the bucket."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])
    gap = pd.Timedelta(minutes=SESSION_GAP_MIN)

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_b"] = (df["user_id"].astype("int64") % 64).astype("int64")
        return df

    def bucket_sessions(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts"], kind="mergesort")
        boundary = df["user_id"].ne(df["user_id"].shift())
        brk = ((df["ts"].diff() > gap) & ~boundary).astype("int64")
        df = df.assign(session_id=brk.groupby(
            df["user_id"], sort=False).cumsum())
        out = df.groupby(["user_id", "session_id"], as_index=False).agg(
            start_ts=("ts", "min"), end_ts=("ts", "max"),
            n_events=("ts", "size"))
        return out

    out = ds.map_batches(keep, batch_format="pandas") \
        .groupby("_b").map_groups(bucket_sessions, batch_format="pandas") \
        .to_pandas()
    for c in ("user_id", "session_id", "n_events"):
        out[c] = out[c].astype("int64")
    return out[["user_id", "session_id", "start_ts", "end_ts", "n_events"]] \
        .sort_values(["user_id", "session_id"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# space-filling-curve layout key: Z-order (Morton) interleave of two
# coordinates — the multi-dimensional data-clustering key a 100-TB layout
# sorts by so range predicates on EITHER column prune contiguous runs
# ---------------------------------------------------------------------------


def morton_key_8bit(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Interleave two 8-bit coordinate arrays into one Z-order key
    (bit i of ``a`` → bit 2i, bit i of ``b`` → bit 2i+1)."""
    z = np.zeros(len(a), dtype="int64")
    for i in range(8):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def lineitem_zorder_sample(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """The first ``k`` lineitems in Z-order over (l_partkey % 256,
    l_suppkey % 256) (8 bits each interleaved; ties to the smaller
    orderkey).

    Scale shape: the Morton key is vectorized numpy bit math per batch
    (row-local); the global head-k comes from per-block partial top-k +
    an O(blocks×k) driver merge — in a real layout job the SAME key
    feeds ``Dataset.sort`` + ``write_parquet`` to cluster the table."""
    ds = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_partkey", "l_suppkey"])

    def zkey(df: pd.DataFrame) -> pd.DataFrame:
        a = (df["l_partkey"].to_numpy(dtype="int64") % 256)
        b = (df["l_suppkey"].to_numpy(dtype="int64") % 256)
        z = morton_key_8bit(a, b)
        out = pd.DataFrame({
            "l_orderkey": df["l_orderkey"].astype("int64"),
            "a": a.astype("int64"), "b": b.astype("int64"),
            "zkey": z})
        return out.sort_values(["zkey", "l_orderkey"]).head(k)

    cands = ds.map_batches(zkey, batch_format="pandas").to_pandas()
    out = cands.sort_values(["zkey", "l_orderkey"]).head(k)
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out[["l_orderkey", "a", "b", "zkey"]].reset_index(drop=True)


# ---------------------------------------------------------------------------
# CUBE grouping over (day, event_type) — all four aggregation lattices in
# one distributed pass (the ROLLUP complement; see q5_rollup_revenue for
# the derive-coarse-from-fine argument)
# ---------------------------------------------------------------------------


def events_cube(sf_dir: str) -> pd.DataFrame:
    """Event counts with CUBE subtotals over (day, event_type): every
    (day, type), per-day, per-type, and grand-total row, subtotal labels
    'ALL'.

    Scale shape: ONE distributed pass computes the finest lattice cell
    (per-batch partials → ≤|days|×|types| rows); the three coarser levels
    are arithmetic over that bounded frame on the driver — a shuffle per
    CUBE level would recompute the same sums."""
    ds = _read(sf_dir, "events", ["ts", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "day": df["ts"].dt.strftime("%Y-%m-%d"),
            "event_type": df["event_type"]})
        return out.groupby(["day", "event_type"], as_index=False) \
            .agg(n=("day", "size"))

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if parts.empty:
        # SQL's CUBE still emits the () grouping set over an empty input
        return pd.DataFrame({"day": ["ALL"], "event_type": ["ALL"],
                             "n": pd.Series([0], dtype="int64")})
    base = parts.groupby(["day", "event_type"], as_index=False)["n"].sum()
    by_day = base.groupby("day", as_index=False)["n"].sum()
    by_day["event_type"] = "ALL"
    by_type = base.groupby("event_type", as_index=False)["n"].sum()
    by_type["day"] = "ALL"
    total = pd.DataFrame({"day": ["ALL"], "event_type": ["ALL"],
                          "n": [base["n"].sum()]})
    out = pd.concat([base, by_day, by_type, total], ignore_index=True)
    out["n"] = out["n"].astype("int64")
    return out[["day", "event_type", "n"]] \
        .sort_values(["day", "event_type"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# exact distributed median (order-statistic selection) per group
# ---------------------------------------------------------------------------


def orders_price_median(sf_dir: str) -> pd.DataFrame:
    """Exact median order price (cents, discrete quantile: the
    ``(n-1)//2``-th order statistic, DuckDB ``quantile_disc(0.5)``) per
    order priority.

    Scale shape: the exchange ships only the (priority, cents) integer
    projection; each priority's values colocate in its hash bucket where
    an O(n) ``np.partition`` selects the statistic — no global sort.  For
    groups too large for one bucket's memory, the same selection runs as
    iterative histogram refinement (see docs_token_percentiles for the
    bounded-domain variant); at the testdata's group sizes the direct
    selection is the right plan."""
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_orderpriority": df["o_orderpriority"],
            "cents": np.floor(
                df["o_totalprice"].to_numpy() * 100 + 0.5).astype("int64")})

    def bucket_median(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for pri, g in df.groupby("o_orderpriority", sort=False):
            v = g["cents"].to_numpy()
            k = (len(v) - 1) // 2
            rows.append((pri, len(v), int(np.partition(v, k)[k])))
        return pd.DataFrame(rows, columns=["o_orderpriority", "n_orders",
                                           "median_cents"])

    out = ds.map_batches(partial, batch_format="pandas") \
        .groupby("o_orderpriority") \
        .map_groups(bucket_median, batch_format="pandas").to_pandas()
    if out.empty:
        return pd.DataFrame({"o_orderpriority": pd.Series([], dtype=object),
                             "n_orders": pd.Series([], dtype="int64"),
                             "median_cents": pd.Series([], dtype="int64")})
    for c in ("n_orders", "median_cents"):
        out[c] = out[c].astype("int64")
    return out.sort_values("o_orderpriority").reset_index(drop=True)


# ---------------------------------------------------------------------------
# RANGE-frame window (interval-bounded, gap-aware) — the complement of
# events_rolling_avg's ROWS frame: the frame is defined by TIME distance,
# so missing days shrink it
# ---------------------------------------------------------------------------


def events_range_window(sf_dir: str, days: int = 3) -> pd.DataFrame:
    """Per-type daily counts with a trailing 3-DAY RANGE sum (``RANGE
    BETWEEN INTERVAL 2 DAY PRECEDING AND CURRENT ROW``): days absent from
    the series contribute nothing, so the frame is time-bounded, not
    row-bounded.

    Scale shape: the distributed part is the (type, day) count reduction;
    each type's bounded day series lands whole in its hash bucket where
    prefix sums + one ``searchsorted`` evaluate every frame vectorized —
    O(|days|) per type, no per-row window scan."""
    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["day"] = df["ts"].dt.floor("D")
        return df.groupby(["event_type", "day"], as_index=False) \
            .agg(n=("ts", "size"))

    def bucket_window(df: pd.DataFrame) -> pd.DataFrame:
        df = df.groupby(["event_type", "day"], as_index=False)["n"].sum()
        frames = []
        for et, g in df.groupby("event_type", sort=False):
            g = g.sort_values("day")
            d = g["day"].to_numpy(dtype="datetime64[D]").astype("int64")
            n = g["n"].to_numpy(dtype="int64")
            csum = np.concatenate(([0], np.cumsum(n)))
            left = np.searchsorted(d, d - (days - 1), side="left")
            g = g.copy()
            g["sum_3d"] = csum[np.arange(1, len(n) + 1)] - csum[left]
            frames.append(g)
        return pd.concat(frames, ignore_index=True)

    out = ds.map_batches(partial, batch_format="pandas") \
        .groupby("event_type") \
        .map_groups(bucket_window, batch_format="pandas").to_pandas()
    if out.empty:
        return pd.DataFrame({"event_type": pd.Series([], dtype=object),
                             "day": pd.Series([], dtype="datetime64[us]"),
                             "n": pd.Series([], dtype="int64"),
                             "sum_3d": pd.Series([], dtype="int64")})
    for c in ("n", "sum_3d"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["event_type", "day"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# HyperLogLog registers: the max-merge distinct sketch (complement of the
# min-k-merge events_kmv_distinct).  The OUTPUT is the register table
# itself — exact integers, so the gate hash-checks the sketch state rather
# than a float estimate whose 2^-M summation order could differ.
# ---------------------------------------------------------------------------

_HLL_M = 256          # 2^8 registers
_HLL_REST_BITS = 52   # 60-bit md5 hash → 8 bucket bits + 52 rank bits


def events_hll_registers(sf_dir: str) -> pd.DataFrame:
    """Global distinct-user HLL sketch (p=8): for each of 256 buckets the
    max leading-zero rank of the 52-bit hash remainder.  Registers merge
    by MAX, so per-batch partials are one bounded 256-row projection each.

    Scale shape: batch-local distinct → (bucket, rank) partial → one
    256-key groupby MAX; the exchange is O(m × blocks) integers no matter
    the user cardinality (the exact `events_distinct_users` alternative
    ships every distinct id).  Rank uses exact integer bit_length — float
    log2 rounds up near powers of two (e.g. log2(2^52-1) → 52.0)."""
    import hashlib

    ds = _read(sf_dir, "events", ["user_id"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        users = df["user_id"].drop_duplicates()
        h = users.map(lambda u: int(
            hashlib.md5(str(u).encode()).hexdigest()[:15], 16))
        bucket = (h % _HLL_M).to_numpy(dtype=np.int64)
        rest = (h // _HLL_M).tolist()
        rank = np.array([(_HLL_REST_BITS + 1) - int(r).bit_length()
                         for r in rest], dtype=np.int64)
        out = pd.DataFrame({"bucket": bucket, "max_rank": rank})
        return out.groupby("bucket", as_index=False).max()

    out = ds.map_batches(partial, batch_format="pandas") \
        .groupby("bucket").max("max_rank").to_pandas()
    out = out.rename(columns={"max(max_rank)": "max_rank"})
    for c in ("bucket", "max_rank"):
        out[c] = out[c].astype("int64")
    return out.sort_values("bucket").reset_index(drop=True)


# ---------------------------------------------------------------------------
# count-min sketch heavy hitters: d=4 rows × w=64 slots of event counts
# (sum-mergeable partials), then per-user estimates = min over rows,
# verified against the exact count — the classic bounded-memory frequency
# sketch with its overestimate visible in the result table.
# ---------------------------------------------------------------------------

_CMS_D = 4
_CMS_W = 64


def _cms_hash(j: int, users: pd.Series) -> np.ndarray:
    import hashlib

    return users.map(lambda u: int(hashlib.md5(
        f"{j}|{u}".encode()).hexdigest()[:8], 16) % _CMS_W) \
        .to_numpy(dtype=np.int64)


def events_cms_topk(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Top-``k`` users by count-min-sketch estimate, with the exact count
    alongside (est_n ≥ true_n always; the gap is the collision
    overestimate at d=4, w=64).

    Scale shape: register partials are d×w = 256 integers per batch and
    merge by SUM regardless of user cardinality; the exact counts flow
    through a 64-way user-hash bucket (never a per-user Ray Aggregate);
    estimates are computed vectorized against the broadcast 4×64 register
    array; the driver merges per-block top-k projections."""
    ds = _read(sf_dir, "events", ["user_id"])

    def reg_partial(df: pd.DataFrame) -> pd.DataFrame:
        uc = df.groupby("user_id", as_index=False).size()
        frames = []
        for j in range(_CMS_D):
            slot = _cms_hash(j, uc["user_id"])
            f = pd.DataFrame({"j": np.int64(j), "slot": slot,
                              "c": uc["size"].to_numpy(dtype=np.int64)})
            frames.append(f.groupby(["j", "slot"], as_index=False).sum())
        return pd.concat(frames, ignore_index=True)

    regs = ds.map_batches(reg_partial, batch_format="pandas") \
        .groupby(["j", "slot"]).sum("c").to_pandas()
    reg = np.zeros((_CMS_D, _CMS_W), dtype=np.int64)
    reg[regs["j"].to_numpy(dtype=np.int64),
        regs["slot"].to_numpy(dtype=np.int64)] = \
        regs["sum(c)"].to_numpy(dtype=np.int64)

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("user_id", as_index=False).size() \
            .rename(columns={"size": "true_n"})
        out["_b"] = (out["user_id"] % 64).astype("int64")
        return out

    def user_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("user_id", as_index=False).agg(
            true_n=("true_n", "sum"))
        est = np.full(len(out), np.iinfo(np.int64).max, dtype=np.int64)
        for j in range(_CMS_D):
            est = np.minimum(est, reg[j, _cms_hash(j, out["user_id"])])
        out["est_n"] = est
        # per-bucket top-k partial: the driver merges ≤ k×64 rows
        return out.sort_values(["est_n", "user_id"],
                               ascending=[False, True]).head(k)

    out = ds.map_batches(count_partial, batch_format="pandas") \
        .groupby("_b").map_groups(user_bucket, batch_format="pandas") \
        .to_pandas()
    out = out.sort_values(["est_n", "user_id"],
                          ascending=[False, True]).head(k)
    out = out[["user_id", "est_n", "true_n"]].reset_index(drop=True)
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


# ---------------------------------------------------------------------------
# event-time watermark / late-data audit: how many events would a
# streaming engine drop at a 15-minute watermark, replaying the log in
# ARRIVAL order (event_id)?  The running event-time max is a distributed
# prefix scan — per-block maxima to the driver (O(#blocks) state), then a
# vectorized within-block cummax pass — never a per-row loop.
# ---------------------------------------------------------------------------

_WATERMARK_DELAY_US = 15 * 60 * 1_000_000


def events_watermark_late(sf_dir: str) -> pd.DataFrame:
    """Per event type: total events and how many arrive LATE — event time
    older than (max event time seen so far in arrival order) minus the
    15-minute watermark delay.  The first arrival is never late.

    Scale shape: the (event_id, ts, type) projection is range-sorted by
    arrival id (the only shuffle); pass 1 ships ONE (first_id, max_ts)
    row per block; the driver computes exclusive prefix maxima over
    blocks; pass 2 re-reads the SAME materialized blocks
    (batch_size=None pins batch == block) and does a vectorized
    cummax + compare, emitting per-(block, type) count partials."""
    proj = _read(sf_dir, "events", ["event_id", "ts", "event_type"]) \
        .sort("event_id").materialize()

    def block_max(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"first_id": pa.array([], pa.int64()),
                             "max_ts": pa.array([], pa.int64())})
        ids = t["event_id"].to_numpy(zero_copy_only=False)
        ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]") \
            .astype("int64")
        return pa.table({"first_id": pa.array([int(ids[0])], pa.int64()),
                         "max_ts": pa.array([int(ts.max())], pa.int64())})

    parts = proj.map_batches(block_max, batch_format="pyarrow",
                             batch_size=None).to_pandas()
    parts = parts.sort_values("first_id").reset_index(drop=True)
    prefix = parts["max_ts"].cummax().shift(1)
    entry_max = {int(f): (None if pd.isna(p) else int(p))
                 for f, p in zip(parts["first_id"], prefix)}

    def late_partial(t: pa.Table) -> pd.DataFrame:
        if len(t) == 0:
            return pd.DataFrame({"event_type": pd.Series([], dtype=object),
                                 "n_events": pd.Series([], dtype="int64"),
                                 "n_late": pd.Series([], dtype="int64")})
        ids = t["event_id"].to_numpy(zero_copy_only=False)
        ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]") \
            .astype("int64")
        entry = entry_max[int(ids[0])]
        shifted = np.concatenate(
            ([np.iinfo(np.int64).min if entry is None else entry],
             np.maximum.accumulate(ts)[:-1]))
        if entry is not None:
            shifted = np.maximum(shifted, entry)
        late = ts < shifted - _WATERMARK_DELAY_US
        # the global first arrival has no predecessor → never late
        if entry is None:
            late[0] = False
        df = pd.DataFrame({"event_type": t["event_type"].to_pylist(),
                           "late": late})
        out = df.groupby("event_type", as_index=False).agg(
            n_events=("late", "size"), n_late=("late", "sum"))
        return out.astype({"n_events": "int64", "n_late": "int64"})

    out = proj.map_batches(late_partial, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    out = out.groupby("event_type", as_index=False).sum()
    for c in ("n_events", "n_late"):
        out[c] = out[c].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


# ---------------------------------------------------------------------------
# incremental aggregate maintenance: a materialized per-priority order
# aggregate is refreshed by MERGING a day's delta partial into the base —
# the view-maintenance path a streaming warehouse runs instead of a full
# recompute.  The gate checks the merged result against the full SQL
# recompute, so merge-associativity is what's being verified.
# ---------------------------------------------------------------------------

_INCR_CUTOFF = "1995-06-17"


def orders_incremental_agg(sf_dir: str,
                           cutoff: str = _INCR_CUTOFF) -> pd.DataFrame:
    """(n_orders, sum_cents) per order priority as of ``cutoff``, computed
    as base(< cutoff) ⊕ delta(= cutoff) — two independent streaming
    aggregations whose bounded partials merge by addition.

    Scale shape: each arm is a column-pruned filtered scan emitting
    ≤ |priorities| rows per block; the merge is a driver-side add over
    ≤ 2×|priorities| rows.  A real deployment keeps the base table
    materialized and only ever runs the delta arm — this query verifies
    that merge path against the full recompute oracle."""
    cut = np.datetime64(cutoff)

    def arm(op) -> pd.DataFrame:
        ds = _read(sf_dir, "orders", ["o_orderdate", "o_orderpriority",
                                      "o_totalprice"])

        def partial(t: pa.Table) -> pd.DataFrame:
            d = t["o_orderdate"].to_numpy(zero_copy_only=False) \
                .astype("datetime64[D]")
            mask = op(d, cut)
            if not mask.any():
                return pd.DataFrame({
                    "o_orderpriority": pd.Series([], dtype=object),
                    "n_orders": pd.Series([], dtype="int64"),
                    "sum_cents": pd.Series([], dtype="int64")})
            price = t["o_totalprice"].to_numpy(zero_copy_only=False)[mask]
            cents = np.floor(price * 100 + 0.5).astype("int64")
            df = pd.DataFrame({
                "o_orderpriority": np.asarray(
                    t["o_orderpriority"].to_pylist(), dtype=object)[mask],
                "n": 1, "c": cents})
            out = df.groupby("o_orderpriority", as_index=False).agg(
                n_orders=("n", "sum"), sum_cents=("c", "sum"))
            return out.astype({"n_orders": "int64", "sum_cents": "int64"})

        return ds.map_batches(partial, batch_format="pyarrow").to_pandas()

    base = arm(np.less)
    delta = arm(np.equal)
    merged = pd.concat([base, delta], ignore_index=True) \
        .groupby("o_orderpriority", as_index=False).sum()
    for c in ("n_orders", "sum_cents"):
        merged[c] = merged[c].astype("int64")
    return merged.sort_values("o_orderpriority").reset_index(drop=True)


_WM_LATENESS_US = 2 * 3600 * 1_000_000    # 2 h allowed lateness


def events_late_window_agg(sf_dir: str,
                           lateness_us: int = _WM_LATENESS_US
                           ) -> pd.DataFrame:
    """Watermark + allowed-lateness stream semantics: replay events in
    ARRIVAL order (event_id) under a low watermark = max event-time over
    all PRIOR arrivals; an event is DROPPED-LATE iff its event time has
    already fallen more than ``lateness_us`` behind the watermark
    (``ts < watermark − lateness``, strict — the first arrival is never
    late).  Accepted events aggregate into their event-time day window.
    Output (day, n_accepted, n_late, accepted_cents) sorted by day, with
    late drops attributed to their own event-time day — the audit a
    streaming pipeline needs to size its lateness allowance.

    Scale shape (the ``docs_pack_blocks`` exclusive-prefix contract): a
    16-byte (event_id, ts_us, cents) projection range-sorts by event_id —
    the only shuffle; per-Ray-block maxima (ONE row each) reach the
    driver for the exclusive prefix-max (O(#blocks) state, never
    O(#events)); a second pass over the SAME materialized blocks
    (``batch_size=None`` pins batch == block) computes each row's
    prior-arrival watermark as max(carry-in, within-block exclusive
    running max) via ``np.maximum.accumulate`` and emits ≤ |days|-row
    day partials.  Events never ship twice and no per-event state ever
    reaches the driver."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "value"])

    def project(t: pa.Table) -> pa.Table:
        ts_us = t["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype("int64")
        cents = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100 + 0.5
        ).astype("int64")
        return pa.table({
            "event_id": pc.cast(t["event_id"], pa.int64()),
            "ts_us": pa.array(ts_us, pa.int64()),
            "cents": pa.array(cents, pa.int64())})

    proj = ds.map_batches(project, batch_format="pyarrow") \
        .sort("event_id").materialize()

    def block_max(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"first_id": pa.array([], pa.int64()),
                             "max_ts": pa.array([], pa.int64())})
        ids = t["event_id"].to_numpy(zero_copy_only=False)
        ts = t["ts_us"].to_numpy(zero_copy_only=False)
        return pa.table({"first_id": pa.array([int(ids[0])], pa.int64()),
                         "max_ts": pa.array([int(ts.max())], pa.int64())})

    parts = proj.map_batches(block_max, batch_format="pyarrow",
                             batch_size=None).to_pandas()
    empty = pd.DataFrame({
        "day": pd.Series([], dtype="datetime64[us]"),
        "n_accepted": pd.Series([], dtype="int64"),
        "n_late": pd.Series([], dtype="int64"),
        "accepted_cents": pd.Series([], dtype="int64")})
    if len(parts) == 0:
        return empty
    parts = parts.sort_values("first_id").reset_index(drop=True)
    # sentinel well below any real epoch-us but far from int64 min, so
    # `wm - lateness_us` can never wrap
    lo = -(2 ** 62)
    carry = parts["max_ts"].cummax().shift(fill_value=lo).astype("int64")
    carry_of = dict(zip(parts["first_id"].astype("int64"), carry))

    day_us = 86_400_000_000

    def day_partial(t: pa.Table) -> pd.DataFrame:
        cols = {"day_us": pd.Series([], dtype="int64"),
                "n_accepted": pd.Series([], dtype="int64"),
                "n_late": pd.Series([], dtype="int64"),
                "accepted_cents": pd.Series([], dtype="int64")}
        if len(t) == 0:
            return pd.DataFrame(cols)
        ids = t["event_id"].to_numpy(zero_copy_only=False)
        ts = t["ts_us"].to_numpy(zero_copy_only=False)
        cents = t["cents"].to_numpy(zero_copy_only=False)
        cin = carry_of[int(ids[0])]
        # exclusive running max: watermark BEFORE each arrival
        wm = np.empty(len(ts), dtype="int64")
        wm[0] = cin
        if len(ts) > 1:
            np.maximum.accumulate(ts[:-1], out=wm[1:])
            np.maximum(wm[1:], cin, out=wm[1:])
        late = (wm != lo) & (ts < wm - lateness_us)
        day = (ts // day_us) * day_us
        df = pd.DataFrame({
            "day_us": day,
            "acc": (~late).astype("int64"),
            "lat": late.astype("int64"),
            "c": np.where(late, 0, cents)})
        out = df.groupby("day_us", as_index=False).agg(
            n_accepted=("acc", "sum"), n_late=("lat", "sum"),
            accepted_cents=("c", "sum"))
        return out.astype({"day_us": "int64", "n_accepted": "int64",
                           "n_late": "int64", "accepted_cents": "int64"})

    merged = proj.map_batches(day_partial, batch_format="pyarrow",
                              batch_size=None).to_pandas()
    if merged.empty or "day_us" not in merged.columns:
        return empty
    out = merged.groupby("day_us", as_index=False).agg(
        n_accepted=("n_accepted", "sum"), n_late=("n_late", "sum"),
        accepted_cents=("accepted_cents", "sum"))
    out["day"] = out["day_us"].astype("datetime64[us]")
    for c in ("n_accepted", "n_late", "accepted_cents"):
        out[c] = out[c].astype("int64")
    return out[["day", "n_accepted", "n_late", "accepted_cents"]] \
        .sort_values("day").reset_index(drop=True)


def events_log_compaction(sf_dir: str) -> pd.DataFrame:
    """Last-value-wins log compaction: one row per (user, event type)
    carrying the latest (ts, value) by event time with arrival-id
    tiebreak — the upsert-log → table compaction a lakehouse runs.

    Scale shape: per-batch partials keep only each key's local winner
    (vectorized sort + tail, no Python per key), so the user-hash-bucket
    exchange ships ≤ |keys| rows per block; selection by (ts, event_id)
    max is associative, so partial merge is exact."""
    ds = _read(sf_dir, "events",
               ["event_id", "ts", "user_id", "event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        w = df.sort_values(["ts", "event_id"]) \
            .groupby(["user_id", "event_type"], as_index=False).tail(1)
        w = w.copy()
        w["_b"] = (w["user_id"] % 64).astype("int64")
        return w

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        w = df.sort_values(["ts", "event_id"]) \
            .groupby(["user_id", "event_type"], as_index=False).tail(1)
        return w[["user_id", "event_type", "ts", "value"]].rename(
            columns={"ts": "last_ts", "value": "last_value"})

    out = ds.map_batches(partial, batch_format="pandas") \
        .groupby("_b").map_groups(bucket, batch_format="pandas") \
        .to_pandas()
    out["user_id"] = out["user_id"].astype("int64")
    return out.sort_values(["user_id", "event_type"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# windowed stream-stream join: click ⋈ purchase per user within a 1-hour
# event-time window — BOTH sides are the big fact stream, so this is the
# co-partition-by-key + in-bucket interval-scan shape (the as-of join's
# sibling that keeps ALL pairs, not just the latest match).
# ---------------------------------------------------------------------------

_WJOIN_WINDOW_US = 3_600_000_000
_WJOIN_SPAN = 10**14  # composite-key stride; bucket-local ts offsets < this


def events_session_attribution(sf_dir: str) -> pd.DataFrame:
    """First-touch attribution: sessionize each user's stream (30-min
    gap, ts order with event_id tiebreak), credit every purchase in a
    session to the session's FIRST event type (the acquisition channel),
    and census per channel: (first_touch, n_sessions, n_purchases,
    attributed_cents) sorted by channel.

    Scale shape: the asof-join co-partition contract — every row of a
    user lands in ONE of 64 user-hash buckets, so each bucket sees full
    user histories and sessionizes them with ONE vectorized sort + diff
    (no per-user Python); the bucket emits ≤ |event_types| partial rows
    and the driver folds ≤ 64×|types|."""
    ds = _read(sf_dir, "events",
               ["event_id", "ts", "user_id", "event_type", "value"])
    gap_us = SESSION_GAP_MIN * 60 * 1_000_000

    def tag(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype("int64")
        return t.append_column("_ab", pa.array(u % 64, pa.int64()))

    def bucket_attr(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"first_touch": pd.Series([], dtype=object),
                "n_sessions": pd.Series([], dtype="int64"),
                "n_purchases": pd.Series([], dtype="int64"),
                "attributed_cents": pd.Series([], dtype="int64")}
        if len(df) == 0 or "user_id" not in df.columns:
            return pd.DataFrame(cols)
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort").reset_index(drop=True)
        ts_us = df["ts"].to_numpy().astype("datetime64[us]") \
            .astype("int64")
        uid = df["user_id"].to_numpy(dtype="int64")
        new_user = np.empty(len(df), dtype=bool)
        new_user[0] = True
        new_user[1:] = uid[1:] != uid[:-1]
        gap_break = np.empty(len(df), dtype=bool)
        gap_break[0] = True
        gap_break[1:] = (ts_us[1:] - ts_us[:-1]) > gap_us
        new_s = new_user | gap_break
        sid = np.cumsum(new_s)          # global session ids within bucket
        cents = np.floor(df["value"].to_numpy() * 100 + 0.5) \
            .astype("int64")
        is_purchase = (df["event_type"] == "purchase").to_numpy()
        # first row of each session is exactly the new_s positions
        first_touch = df.loc[new_s, "event_type"].to_numpy()
        g = pd.DataFrame({
            "sid": sid,
            "np_": is_purchase.astype("int64"),
            "c": np.where(is_purchase, cents, 0)})
        per_s = g.groupby("sid", sort=True).agg(
            np_=("np_", "sum"), c=("c", "sum"))
        out = pd.DataFrame({
            "first_touch": first_touch,
            "n_purchases": per_s["np_"].to_numpy(dtype="int64"),
            "attributed_cents": per_s["c"].to_numpy(dtype="int64")})
        res = out.groupby("first_touch", as_index=False).agg(
            n_sessions=("n_purchases", "size"),
            n_purchases=("n_purchases", "sum"),
            attributed_cents=("attributed_cents", "sum"))
        return res.astype({"n_sessions": "int64", "n_purchases": "int64",
                           "attributed_cents": "int64"})

    parts = ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("_ab").map_groups(bucket_attr,
                                   batch_format="pandas").to_pandas()
    empty = pd.DataFrame({
        "first_touch": pd.Series([], dtype=object),
        "n_sessions": pd.Series([], dtype="int64"),
        "n_purchases": pd.Series([], dtype="int64"),
        "attributed_cents": pd.Series([], dtype="int64")})
    if parts.empty or "first_touch" not in parts.columns:
        return empty
    out = parts.groupby("first_touch", as_index=False).agg(
        n_sessions=("n_sessions", "sum"),
        n_purchases=("n_purchases", "sum"),
        attributed_cents=("attributed_cents", "sum"))
    for c in ("n_sessions", "n_purchases", "attributed_cents"):
        out[c] = out[c].astype("int64")
    return out.sort_values("first_touch", kind="mergesort") \
        .reset_index(drop=True)


def orders_open_interval_count(sf_dir: str) -> pd.DataFrame:
    """Concurrent-interval counting: how many orders are OPEN (order
    placed, not yet fully shipped) on each day the count changes — an
    order is open from ``o_orderdate`` (inclusive) to its LAST lineitem
    shipdate (exclusive of the following day: the interval is
    [orderdate, max_shipdate + 1 day)).  Output (day, n_open) with one
    row per delta day, ``n_open`` being the count AFTER that day's
    openings/closings apply.

    Scale shape: interval stabbing without a sort over events — each
    order contributes exactly TWO deltas (+1 at start, −1 at end), the
    per-order last shipdate folds as (orderkey, max) partials under an
    orderkey-hash bucket, one hash-shuffle join attaches the orderdate,
    and delta partials aggregate per day INSIDE each batch, so the
    driver folds a calendar-bounded (≤ ~2×days) delta histogram and one
    cumsum — never O(|orders|) rows."""
    line_ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    day_us = 86_400_000_000

    def max_partial(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False).astype("int64")
        if len(ok) == 0:
            return pa.table({"l_orderkey": pa.array([], pa.int64()),
                             "m_us": pa.array([], pa.int64()),
                             "_b": pa.array([], pa.int64())})
        ts = t["l_shipdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype("int64")
        uk, inv = np.unique(ok, return_inverse=True)
        m = np.full(len(uk), np.iinfo(np.int64).min, dtype="int64")
        np.maximum.at(m, inv, ts)
        return pa.table({"l_orderkey": pa.array(uk, pa.int64()),
                         "m_us": pa.array(m, pa.int64()),
                         "_b": pa.array(uk % 64, pa.int64())})

    bmax_schema = pa.schema([("l_orderkey", pa.int64()),
                             ("m_us", pa.int64())])

    def bucket_max(df: pd.DataFrame) -> pa.Table:
        out = df.groupby("l_orderkey", as_index=False)["m_us"].max()
        return pa.Table.from_pandas(out, schema=bmax_schema,
                                    preserve_index=False)

    last_ship = line_ds.map_batches(max_partial, batch_format="pyarrow") \
        .groupby("_b").map_groups(bucket_max, batch_format="pandas")

    orders_ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
    joined = orders_ds.join(
        last_ship, join_type="inner",
        num_partitions=_join_partitions(sf_dir, "orders"),
        on=("o_orderkey",), right_on=("l_orderkey",))

    def delta_partial(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"day_us": pd.Series([], dtype="int64"),
                "delta": pd.Series([], dtype="int64")}
        if len(df) == 0 or "o_orderdate" not in df.columns:
            return pd.DataFrame(cols)
        start = df["o_orderdate"].to_numpy().astype("datetime64[us]") \
            .astype("int64") // day_us * day_us
        end = (df["m_us"].to_numpy(dtype="int64") // day_us + 1) * day_us
        d = pd.DataFrame({
            "day_us": np.concatenate([start, end]),
            "delta": np.concatenate([
                np.ones(len(start), dtype="int64"),
                -np.ones(len(end), dtype="int64")])})
        return d.groupby("day_us", as_index=False)["delta"].sum()

    parts = joined.map_batches(delta_partial,
                               batch_format="pandas").to_pandas()
    empty = pd.DataFrame({"day": pd.Series([], dtype="datetime64[us]"),
                          "n_open": pd.Series([], dtype="int64")})
    if parts.empty or "day_us" not in parts.columns:
        return empty
    hist = parts.groupby("day_us", as_index=False)["delta"].sum() \
        .sort_values("day_us")
    out = pd.DataFrame({
        "day": hist["day_us"].to_numpy(dtype="int64")
        .astype("datetime64[us]"),
        "n_open": hist["delta"].cumsum().astype("int64")})
    return out.reset_index(drop=True)


_PCTL_QS = ((50, "p50_cents"), (95, "p95_cents"), (99, "p99_cents"))


def events_value_percentiles(sf_dir: str) -> pd.DataFrame:
    """EXACT p50/p95/p99 of event value per event type — discrete lower
    quantiles on integer cents: p_q = the smallest cents c whose
    cumulative count reaches ``ceil(q·n/100)``.  Output (event_type,
    n_events, p50_cents, p95_cents, p99_cents) sorted by type.

    Scale shape: quantiles usually force a sort, but the value domain is
    FIXED-POINT (integer cents) and therefore bounded by the domain, not
    the event count — per-batch (type, cents, k) histogram partials
    merge under a TYPE-hash bucket so each type's complete histogram
    lands in exactly one group (≤ |domain| rows), the group reads its
    quantiles off one cumsum, and ONE row per type reaches the driver.
    No global sort, no per-event exchange beyond the histogram fold."""
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def hist_partial(t: pa.Table) -> pd.DataFrame:
        cols = {"event_type": pd.Series([], dtype=object),
                "cents": pd.Series([], dtype="int64"),
                "k": pd.Series([], dtype="int64"),
                "_tb": pd.Series([], dtype="int64")}
        if len(t) == 0:
            return pd.DataFrame(cols)
        cents = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100 + 0.5
        ).astype("int64")
        df = pd.DataFrame({"event_type": t["event_type"].to_pylist(),
                           "cents": cents})
        out = df.groupby(["event_type", "cents"], as_index=False) \
            .size().rename(columns={"size": "k"})
        out["_tb"] = (pd.util.hash_array(
            out["event_type"].to_numpy(dtype=object)) % 64).astype("int64")
        return out

    def type_quantiles(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"event_type": pd.Series([], dtype=object),
                "n_events": pd.Series([], dtype="int64")}
        cols.update({name: pd.Series([], dtype="int64")
                     for _, name in _PCTL_QS})
        if len(df) == 0 or "event_type" not in df.columns:
            return pd.DataFrame(cols)
        rows = []
        for et, g in df.groupby("event_type", sort=True):
            h = g.groupby("cents", as_index=False)["k"].sum() \
                .sort_values("cents")
            c = h["cents"].to_numpy(dtype="int64")
            ck = h["k"].to_numpy(dtype="int64").cumsum()
            n = int(ck[-1])
            row = [et, n]
            for q, _ in _PCTL_QS:
                target = -(-q * n // 100)        # ceil(q·n/100), exact
                row.append(int(c[np.searchsorted(ck, target)]))
            rows.append(row)
        return pd.DataFrame({
            "event_type": [r[0] for r in rows],
            "n_events": pd.Series([r[1] for r in rows], dtype="int64"),
            **{name: pd.Series([r[2 + i] for r in rows], dtype="int64")
               for i, (_, name) in enumerate(_PCTL_QS)}})

    parts = ds.map_batches(hist_partial, batch_format="pyarrow") \
        .groupby("_tb").map_groups(type_quantiles,
                                   batch_format="pandas").to_pandas()
    empty = pd.DataFrame({
        "event_type": pd.Series([], dtype=object),
        "n_events": pd.Series([], dtype="int64"),
        **{name: pd.Series([], dtype="int64") for _, name in _PCTL_QS}})
    if parts.empty or "event_type" not in parts.columns:
        return empty
    return parts.sort_values("event_type", kind="mergesort") \
        .reset_index(drop=True)


_CDC_DELETE = "error"     # changelog op mapping: error ⇒ DELETE the key


def events_cdc_state(sf_dir: str) -> pd.DataFrame:
    """Delete-aware CDC merge (lakehouse MERGE INTO semantics): replay
    the event stream as a changelog on key = user_id — every event
    upserts the key's value, except ``error`` which DELETES the key —
    and census the merged final state: (segment = user_id % 7, n_live,
    value_cents) over keys whose LAST op (by event time, event_id
    tiebreak) is not a delete.  The delete-aware sibling of
    events_log_compaction's last-value-wins upsert.

    Scale shape: "last op per key" is associative — per-batch partials
    keep only each key's local winner (vectorized sort + tail, no
    Python per key), the user-hash bucket settles the global winner and
    applies the delete filter, and only ≤ 7-row segment partials leave
    the buckets.  One projection exchange, no global sort."""
    ds = _read(sf_dir, "events",
               ["event_id", "ts", "user_id", "event_type", "value"])

    def local_last(df: pd.DataFrame) -> pd.DataFrame:
        w = df.sort_values(["ts", "event_id"]) \
            .groupby("user_id", as_index=False).tail(1).copy()
        w["_b"] = (w["user_id"] % 64).astype("int64")
        return w[["event_id", "ts", "user_id", "event_type", "value",
                  "_b"]]

    def bucket_state(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"segment": pd.Series([], dtype="int64"),
                "n_live": pd.Series([], dtype="int64"),
                "value_cents": pd.Series([], dtype="int64")}
        if len(df) == 0 or "user_id" not in df.columns:
            return pd.DataFrame(cols)
        w = df.sort_values(["ts", "event_id"]) \
            .groupby("user_id", as_index=False).tail(1)
        w = w[w["event_type"] != _CDC_DELETE].copy()
        if len(w) == 0:
            return pd.DataFrame(cols)
        w["segment"] = (w["user_id"].astype("int64") % 7)
        w["cents"] = np.floor(
            w["value"].to_numpy() * 100 + 0.5).astype("int64")
        out = w.groupby("segment", as_index=False).agg(
            n_live=("cents", "size"), value_cents=("cents", "sum"))
        return out.astype({"segment": "int64", "n_live": "int64",
                           "value_cents": "int64"})

    parts = ds.map_batches(local_last, batch_format="pandas") \
        .groupby("_b").map_groups(bucket_state, batch_format="pandas") \
        .to_pandas()
    empty = pd.DataFrame({"segment": pd.Series([], dtype="int64"),
                          "n_live": pd.Series([], dtype="int64"),
                          "value_cents": pd.Series([], dtype="int64")})
    if parts.empty or "segment" not in parts.columns:
        return empty
    out = parts.groupby("segment", as_index=False).agg(
        n_live=("n_live", "sum"), value_cents=("value_cents", "sum"))
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("segment").reset_index(drop=True)


# hot-key-salted join: diagnostics of the last run, test-introspection
# only ({"n_hot": int, "salt": int, "avg_ppm_threshold": int})
_LAST_SALT_INFO: dict = {}

_SALT_WAYS = 8
_SALT_HOT_FACTOR_PPM = 1_200_000     # hot ⇔ count > 1.2 × mean


_SALT_HOT_BROADCAST_MAX = 1_000_000   # hot-set broadcast row ceiling


def events_salted_segment_join(sf_dir: str, salt: int = _SALT_WAYS,
                               hot_factor_ppm: int = _SALT_HOT_FACTOR_PPM,
                               hot_broadcast_max: int =
                               _SALT_HOT_BROADCAST_MAX) -> pd.DataFrame:
    """Per-segment event census through a HOT-KEY-SALTED hash join —
    the skew-mitigation pattern for fact⋈dim joins whose key
    distribution would otherwise funnel one partition: (segment,
    n_events, value_cents) where the user→segment dimension joins the
    event fact table on user_id.

    Salting mechanics (the deliverable here — the census itself is
    trivially derivable, which is exactly what makes the oracle twin a
    sharp check of the join):
    1. a (user_id, n) count pass settles under 64 user-hash buckets;
       per-bucket (Σn, #users) scalars fold the global mean on the
       driver (O(64) state);
    2. HOT keys — count·10⁶ > mean·hot_factor_ppm — are collected and
       broadcast; by construction #hot ≤ 10⁶·#users/hot_factor_ppm,
       so the broadcast is bounded by a FRACTION of the key space, not
       the data;
    3. the fact side tags hot rows with ``hash(event_id) % salt``
       (cold rows salt 0), the dim side REPLICATES each hot user's row
       ``salt`` ways (cold rows once, salt 0), and the join runs on the
       composite (user_id, _salt) key — a hot key's rows now land in
       ``salt`` partitions instead of one;
    4. post-join per-segment partials reduce to ≤ 7 rows per batch.

    The Markov bound on step 2 is only #hot ≤ 10⁶·#users/hot_factor_ppm
    — near-mean-heavy distributions can make that O(#users), the exact
    plasma-broadcast class the q3/q5 gears exist to avoid.  So above
    ``hot_broadcast_max`` hot keys the operator flips to SALT-ALL: every
    fact row salts and the dim replicates EVERY key ``salt`` ways — no
    broadcast at all, ``salt``× the (tiny, two-int-column) dim exchange,
    identical result.

    ``salt=1`` degenerates to the plain join (tests pin equality), and
    ``_LAST_SALT_INFO`` records how many keys were actually salted."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "value"])

    # pass 1: per-user counts under user-hash buckets → global mean
    def count_partial(t: pa.Table) -> pd.DataFrame:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype("int64")
        if len(u) == 0:
            return pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64"),
                                 "_b": pd.Series([], dtype="int64")})
        uk, cnt = np.unique(u, return_counts=True)
        return pd.DataFrame({"user_id": uk, "n": cnt.astype("int64"),
                             "_b": uk % 64})

    def bucket_fold(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("user_id", as_index=False)["n"].sum()
        return out.astype({"user_id": "int64", "n": "int64"})

    counts = ds.map_batches(count_partial, batch_format="pyarrow") \
        .groupby("_b").map_groups(bucket_fold, batch_format="pandas") \
        .materialize()
    moments = counts.map_batches(
        lambda df: pd.DataFrame({"s": [int(df["n"].sum())],
                                 "k": [len(df)]}),
        batch_format="pandas").to_pandas()
    total_n, n_users = int(moments["s"].sum()), int(moments["k"].sum())
    empty = pd.DataFrame({"segment": pd.Series([], dtype="int64"),
                          "n_events": pd.Series([], dtype="int64"),
                          "value_cents": pd.Series([], dtype="int64")})
    if n_users == 0:
        return empty

    # hot ⇔ n · 10⁶ · n_users > total · hot_factor_ppm  (exact ints)
    def hot_partial(df: pd.DataFrame) -> pd.DataFrame:
        m = df["n"].to_numpy(dtype="int64") * 1_000_000 * n_users > \
            total_n * hot_factor_ppm
        return df.loc[m, ["user_id"]]

    hot_ds = counts.map_batches(hot_partial,
                                batch_format="pandas").materialize()
    n_hot = hot_ds.count()
    salt_all = n_hot > hot_broadcast_max
    if salt_all:
        hot_keys = None
        hot_ref = None
    else:
        hot = hot_ds.to_pandas()
        hot_keys = np.sort(hot["user_id"].to_numpy(dtype="int64")) \
            if len(hot) else np.array([], dtype="int64")
        hot_ref = _ray_put(hot_keys)
    _LAST_SALT_INFO.update(n_hot=n_hot, salt=salt, salt_all=salt_all,
                           avg_ppm_threshold=hot_factor_ppm)

    # dim side: distinct users (from the counts Dataset — already one
    # row per user), segment derived; hot users replicate `salt` ways
    dim_schema = pa.schema([("d_user", pa.int64()),
                            ("d_salt", pa.int64()),
                            ("segment", pa.int64())])

    def dim_rows(df: pd.DataFrame) -> pa.Table:
        u = df["user_id"].to_numpy(dtype="int64")
        if salt_all:
            is_hot = np.ones(len(u), dtype=bool)
        else:
            is_hot = _in_sorted(u, ray.get(hot_ref))
        cold = u[~is_hot]
        hotu = u[is_hot]
        du = np.concatenate([cold, np.repeat(hotu, salt)])
        dsalt = np.concatenate([
            np.zeros(len(cold), dtype="int64"),
            np.tile(np.arange(salt, dtype="int64"), len(hotu))])
        out = pd.DataFrame({"d_user": du, "d_salt": dsalt,
                            "segment": du % 7})
        return pa.Table.from_pandas(out, schema=dim_schema,
                                    preserve_index=False)

    dim_ds = counts.map_batches(dim_rows, batch_format="pandas")

    fact_schema = pa.schema([("user_id", pa.int64()),
                             ("_salt", pa.int64()),
                             ("cents", pa.int64())])

    def fact_rows(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype("int64")
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype("int64")
        cents = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100 + 0.5
        ).astype("int64")
        if salt_all:
            srow = (eid % salt).astype("int64")
        else:
            is_hot = _in_sorted(u, ray.get(hot_ref))
            srow = np.where(is_hot, eid % salt, 0).astype("int64")
        return pa.table({"user_id": pa.array(u, pa.int64()),
                         "_salt": pa.array(srow, pa.int64()),
                         "cents": pa.array(cents, pa.int64())})

    fact_ds = ds.map_batches(fact_rows, batch_format="pyarrow")

    n_parts = _join_partitions(sf_dir, "events", selectivity=1.0)
    joined = fact_ds.join(
        dim_ds, join_type="inner", num_partitions=n_parts,
        on=("user_id", "_salt"), right_on=("d_user", "d_salt"))

    def seg_partial(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("segment", as_index=False).agg(
            n_events=("cents", "size"), value_cents=("cents", "sum"))
        return out.astype({"segment": "int64", "n_events": "int64",
                           "value_cents": "int64"})

    parts = joined.map_batches(seg_partial, batch_format="pandas") \
        .to_pandas()
    if parts.empty:
        return empty
    out = parts.groupby("segment", as_index=False).agg(
        n_events=("n_events", "sum"), value_cents=("value_cents", "sum"))
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("segment").reset_index(drop=True)


def events_window_join(sf_dir: str) -> pd.DataFrame:
    """Per purchase day: how many (click, purchase) same-user pairs where
    the click lands within the hour before the purchase (inclusive both
    ends), and the integer-cents value volume of those pairs.

    Scale shape: one user-hash-bucket exchange co-partitions both sides;
    inside a bucket the join is two ``np.searchsorted`` calls on a
    (user, ts-offset) composite key plus a prefix-sum for the click-value
    side — no per-user Python, no pair materialization (counts and sums
    only); each bucket emits ≤ |days| partial rows."""
    ds = _read(sf_dir, "events", ["ts", "user_id", "event_type", "value"])

    def project(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"].isin(["purchase", "click"])].copy()
        df["cents"] = np.floor(df["value"] * 100 + 0.5).astype("int64")
        df["ts_us"] = df["ts"].values.astype("datetime64[us]").astype("int64")
        df["side"] = (df["event_type"] == "click").astype("int64")
        df["_b"] = (df["user_id"].astype("int64") % 64).astype("int64")
        return df[["user_id", "ts_us", "cents", "side", "_b"]]

    def bucket_join(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"day": pd.Series([], dtype="datetime64[us]"),
                              "n_pairs": pd.Series([], dtype="int64"),
                              "sum_cents": pd.Series([], dtype="int64")})
        # dense per-bucket user index: raw ids can be arbitrary int64
        # (a key-shifted corpus puts them near 2e9, where raw_id * SPAN
        # overflows — the old guard fired at the synthesized sf1), so
        # the composite key uses the bucket-local rank instead; the
        # no-bleed guard now bounds the DENSE count, which scales with
        # users-per-bucket — raise the bucket count, not the stride,
        # when a bucket approaches 2^62 // SPAN (~92k) users
        _, uinv = np.unique(g["user_id"].to_numpy(dtype=np.int64),
                            return_inverse=True)
        g = g.assign(_uidx=uinv.astype(np.int64))
        p = g[g["side"] == 0]
        c = g[g["side"] == 1]
        if not len(p) or not len(c):
            return empty
        base = int(g["ts_us"].min())
        # no-bleed guards cover the WHOLE group (both sides): the bucket's
        # time span must fit the composite stride minus the window, and
        # the dense user count must not overflow the stride multiply
        assert int(g["ts_us"].max()) - base < _WJOIN_SPAN - _WJOIN_WINDOW_US
        assert int(g["_uidx"].max()) < (2**62) // _WJOIN_SPAN
        off_p = p["ts_us"].to_numpy() - base
        off_c = c["ts_us"].to_numpy() - base
        users_p = p["_uidx"].to_numpy(dtype=np.int64)
        users_c = c["_uidx"].to_numpy(dtype=np.int64)
        ckey = users_c * _WJOIN_SPAN + off_c
        order = np.argsort(ckey, kind="stable")
        ckey = ckey[order]
        c_cents = c["cents"].to_numpy()[order]
        cs = np.concatenate(([0], np.cumsum(c_cents)))
        pkey = users_p * _WJOIN_SPAN + off_p
        lo = np.searchsorted(ckey, pkey - _WJOIN_WINDOW_US, side="left")
        hi = np.searchsorted(ckey, pkey, side="right")
        n = (hi - lo).astype("int64")
        click_sum = cs[hi] - cs[lo]
        pair_cents = click_sum + n * p["cents"].to_numpy()
        day = p["ts_us"].to_numpy().astype("datetime64[us]") \
            .astype("datetime64[D]")
        out = pd.DataFrame({"day": day.astype("datetime64[us]"),
                            "n_pairs": n, "sum_cents": pair_cents})
        out = out[out["n_pairs"] > 0]
        if out.empty:
            return empty
        return out.groupby("day", as_index=False).sum() \
            .astype({"n_pairs": "int64", "sum_cents": "int64"})

    parts = ds.map_batches(project, batch_format="pandas") \
        .groupby("_b").map_groups(bucket_join, batch_format="pandas") \
        .to_pandas()
    if parts.empty:
        return pd.DataFrame({"day": pd.Series([], dtype="datetime64[us]"),
                             "n_pairs": pd.Series([], dtype="int64"),
                             "sum_cents": pd.Series([], dtype="int64")})
    out = parts.groupby("day", as_index=False).sum()
    for c in ("n_pairs", "sum_cents"):
        out[c] = out[c].astype("int64")
    return out.sort_values("day").reset_index(drop=True)


# ---------------------------------------------------------------------------
# robust anomaly detection: median/MAD outlier flagging per event type —
# the quality-monitoring pass a streaming ingest runs before admitting a
# day's data (robust statistics so the outliers themselves can't shift the
# threshold, unlike mean/stddev z-scores)
# ---------------------------------------------------------------------------

_MAD_K = 3


def events_anomaly_mad(sf_dir: str, k: int = _MAD_K) -> pd.DataFrame:
    """Events whose value (cents) deviates from their type's median by
    more than k × MAD (median absolute deviation), both medians as the
    discrete ``(n-1)//2``-th order statistic (``quantile_disc(0.5)`` —
    the orders_price_median contract).

    Scale shape: the exchange ships the (event_id, type, cents) integer
    projection once; each type's rows colocate in its hash bucket where
    TWO O(n) ``np.partition`` selections (median, then MAD) and one
    vectorized filter flag the outliers — no global sort, no second scan
    of the raw table.  Bounded-domain histogram refinement replaces the
    in-bucket selection for groups beyond one bucket's memory (the
    docs_token_percentiles pattern)."""
    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_id": df["event_id"].astype("int64"),
            "event_type": df["event_type"],
            "cents": np.floor(
                df["value"].to_numpy() * 100 + 0.5).astype("int64")})

    def bucket_outliers(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for et, g in df.groupby("event_type", sort=False):
            v = g["cents"].to_numpy()
            med = int(np.partition(v, (len(v) - 1) // 2)[(len(v) - 1) // 2])
            dev = np.abs(v - med)
            mad = int(np.partition(dev, (len(dev) - 1) // 2)[
                (len(dev) - 1) // 2])
            keep = dev > k * mad
            frames.append(pd.DataFrame({
                "event_id": g["event_id"].to_numpy()[keep],
                "event_type": et,
                "cents": v[keep],
                "dev": dev[keep]}))
        if not frames:
            return pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                                 "event_type": pd.Series([], dtype=object),
                                 "cents": pd.Series([], dtype="int64"),
                                 "dev": pd.Series([], dtype="int64")})
        return pd.concat(frames, ignore_index=True)

    out = ds.map_batches(partial, batch_format="pandas") \
        .groupby("event_type") \
        .map_groups(bucket_outliers, batch_format="pandas").to_pandas()
    if out.empty:
        return pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                             "event_type": pd.Series([], dtype=object),
                             "cents": pd.Series([], dtype="int64"),
                             "dev": pd.Series([], dtype="int64")})
    for c in ("event_id", "cents", "dev"):
        out[c] = out[c].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Markov transition matrix over per-user event sequences — the full
# (from, to) probability table (events_user_paths is the top-k trigram
# view; this is the bounded |types|² first-order model)
# ---------------------------------------------------------------------------


def events_transition_matrix(sf_dir: str) -> pd.DataFrame:
    """First-order event-type transition counts and probabilities over
    every user's history ordered by (ts, event_id):
    ``prob_ppm = n(from,to) · 10⁶ // Σ_to n(from,·)``.

    Scale shape: users hash-bucket (user_id % 64, whole history per
    bucket); inside a bucket ONE sort + shift-masked bigram build (no
    per-user Python); the transition key space is |types|² (bounded) so
    each bucket emits one tiny count partial and the driver merge plus
    row-marginal division is O(|types|²)."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    out = _transition_counts(ds)
    if out.empty:
        return pd.DataFrame({"from_type": pd.Series([], dtype=object),
                             "to_type": pd.Series([], dtype=object),
                             "n": pd.Series([], dtype="int64"),
                             "prob_ppm": pd.Series([], dtype="int64")})
    marg = out.groupby("from_type")["n"].transform("sum")
    out["prob_ppm"] = (out["n"].astype("int64") * 1_000_000
                       // marg.astype("int64"))
    for c in ("n", "prob_ppm"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["from_type", "to_type"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# skyline (Pareto frontier): maximal orders under (price ↑ better,
# earlier date ↑ better) — the multi-objective shortlist operator; local
# per-block skylines merge associatively, so the all-to-all never happens
# ---------------------------------------------------------------------------


def _skyline_filter(cents: np.ndarray, day: np.ndarray) -> np.ndarray:
    """Boolean survivor mask: row i is dominated iff some j has
    cents_j ≥ cents_i AND day_j ≤ day_i with at least one strict.
    Vectorized O(n²) dominance test — blocks are bounded, and the merged
    candidate set a skyline produces is tiny relative to its input."""
    ge = cents[:, None] >= cents[None, :]
    le = day[:, None] <= day[None, :]
    strict = (cents[:, None] > cents[None, :]) | (day[:, None] < day[None, :])
    dominated = (ge & le & strict).any(axis=0)
    return ~dominated


def orders_skyline(sf_dir: str) -> pd.DataFrame:
    """Pareto-optimal 1995 orders: no other 1995 order is both ≥ price
    and ≤ date with one strict.  Equal (price, date) pairs don't dominate
    each other — both survive, exactly like the SQL ``NOT EXISTS``.

    Scale shape: each block computes its LOCAL skyline (dominance is
    transitive, so a globally maximal row is maximal in its block —
    per-block filtering is lossless); only the ≤√-sized candidate
    partials reach the driver for the final merge.  The year filter is
    pushed into the parquet scan (pyarrow dataset filter expression —
    non-matching row groups never leave storage)."""
    import datetime

    import pyarrow.dataset as pds

    year = ((pds.field("o_orderdate") >= datetime.datetime(1995, 1, 1))
            & (pds.field("o_orderdate") < datetime.datetime(1996, 1, 1)))
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderkey", "o_totalprice",
                                  "o_orderdate"],
                         filter=year, override_num_blocks=8)

    def local_skyline(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "o_orderkey": pd.Series([], dtype="int64"),
                "cents": pd.Series([], dtype="int64"),
                "o_orderdate": pd.Series([], dtype="datetime64[us]")})
        cents = np.floor(
            df["o_totalprice"].to_numpy() * 100 + 0.5).astype("int64")
        day = df["o_orderdate"].to_numpy(
            dtype="datetime64[us]").astype("int64")
        keep = _skyline_filter(cents, day)
        return pd.DataFrame({
            "o_orderkey": df["o_orderkey"].to_numpy()[keep],
            "cents": cents[keep],
            "o_orderdate": df["o_orderdate"].to_numpy()[keep]})

    cand = ds.map_batches(local_skyline, batch_format="pandas").to_pandas()
    if cand.empty:
        return pd.DataFrame({
            "o_orderkey": pd.Series([], dtype="int64"),
            "cents": pd.Series([], dtype="int64"),
            "o_orderdate": pd.Series([], dtype="datetime64[us]")})
    cents = cand["cents"].to_numpy(dtype="int64")
    day = cand["o_orderdate"].to_numpy(
        dtype="datetime64[us]").astype("int64")
    keep = _skyline_filter(cents, day)
    out = cand.loc[keep].copy()
    for c in ("o_orderkey", "cents"):
        out[c] = out[c].astype("int64")
    return out.sort_values("o_orderkey").reset_index(drop=True)


# ---------------------------------------------------------------------------
# distributed least squares: per-event-type linear trend of value (cents)
# over time, fitted from EXACT integer moments (n, Σx, Σy, Σx², Σxy) — the
# closed-form normal equation needs one streaming pass of distributive
# partials, never a residual iteration, so the fit is summation-order
# independent and SQL-checkable at any scale
# ---------------------------------------------------------------------------

# hours between the unix epoch and the corpus origin; x = hours since
# origin keeps Σx² (and n·Σx² − (Σx)²) far inside int64 for a multi-year
# corpus where raw epoch-hours would overflow the moment products
_LINREG_ORIGIN_H = int(pd.Timestamp("2024-01-01").value // 3_600_000_000_000)


def events_linreg(sf_dir: str) -> pd.DataFrame:
    """Per-event-type OLS slope of ``value`` (in cents) against event time
    (in hours since 2024-01-01): ``slope_ppm = (n·Σxy − Σx·Σy)·10⁶ /
    (n·Σx² − (Σx)²)``, integer-truncated toward zero (DuckDB ``//``
    semantics — NOT Python floor; the engine mirrors the truncation
    explicitly so negative slopes agree).

    Scale shape: each block emits ONE 5-integer moment row per event type
    (distributive partials — the classic parallel-regression shape); the
    driver merges ≤ types × blocks rows and finishes the division in
    Python big ints (the ×10⁶ numerator can exceed int64; SQL uses
    HUGEINT for the same step)."""
    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "event_type": pd.Series([], dtype=object),
                "n": pd.Series([], dtype="int64"),
                "sx": pd.Series([], dtype="int64"),
                "sy": pd.Series([], dtype="int64"),
                "sxx": pd.Series([], dtype="int64"),
                "sxy": pd.Series([], dtype="int64")})
        x = (df["ts"].to_numpy().astype("datetime64[us]").astype("int64")
             // 3_600_000_000) - _LINREG_ORIGIN_H
        y = np.floor(df["value"].to_numpy() * 100 + 0.5).astype("int64")
        g = pd.DataFrame({"event_type": df["event_type"].to_numpy(),
                          "n": 1, "sx": x, "sy": y,
                          "sxx": x * x, "sxy": x * y})
        return g.groupby("event_type", as_index=False).sum()

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if parts.empty:
        return pd.DataFrame({"event_type": pd.Series([], dtype=object),
                             "n": pd.Series([], dtype="int64"),
                             "sum_cents": pd.Series([], dtype="int64"),
                             "slope_ppm": pd.Series([], dtype="int64")})
    agg = parts.groupby("event_type", as_index=False).sum()
    slopes = []
    for _, r in agg.iterrows():
        # Python big ints: n·Σxy·10⁶ exceeds int64 at web-scale n
        n, sx, sy, sxx, sxy = (int(r["n"]), int(r["sx"]), int(r["sy"]),
                               int(r["sxx"]), int(r["sxy"]))
        num = (n * sxy - sx * sy) * 1_000_000
        den = n * sxx - sx * sx
        if den == 0:
            slopes.append(0)
        else:
            q = abs(num) // den  # den > 0 (variance); mirror DuckDB trunc
            slopes.append(q if num >= 0 else -q)
    out = pd.DataFrame({"event_type": agg["event_type"],
                        "n": agg["n"].astype("int64"),
                        "sum_cents": agg["sy"].astype("int64"),
                        "slope_ppm": pd.Series(slopes, dtype="int64")})
    return out.sort_values("event_type").reset_index(drop=True)


# ---------------------------------------------------------------------------
# sweep line: maximum concurrent sessions per day.  Sessions (the 30-min-gap
# contract shared with events_session_table) become ±1 boundary events; a
# distributed prefix sum over the globally sorted UNIQUE boundaries yields
# the running concurrency, and each block emits one per-day max partial —
# the interval-overlap aggregation a scheduler/capacity pipeline runs
# ---------------------------------------------------------------------------


def events_concurrency(sf_dir: str) -> pd.DataFrame:
    """Per day: the maximum number of sessions simultaneously open at any
    boundary instant that day.  Ends sort before starts at the same
    timestamp (``d=-1 < d=+1``), so back-to-back sessions don't overlap
    and zero-length (single-event) sessions never raise the count — the
    same peer semantics as SQL's RANGE-framed ``SUM(d) OVER (ORDER BY
    ts, d)``.

    Scale shape: three exchanges, all projections — (1) user-hash buckets
    sessionize complete histories (one sort + diff + cumsum per bucket,
    the events_session_table kernel) and emit ±1 boundary rows; (2) a
    ts-hash bucket collapses duplicate (ts, d) keys so the global sort
    never splits a peer group across blocks; (3) a range sort by (ts, d),
    then the two-pass prefix-sum idiom (per-block net totals → driver
    exclusive prefix over ≤ blocks rows → per-block running + per-day max
    partials).  The driver only ever sees block totals and day maxima."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])
    gap = pd.Timedelta(minutes=SESSION_GAP_MIN)

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_b"] = (df["user_id"].astype("int64") % 64).astype("int64")
        return df

    def bucket_boundaries(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts"], kind="mergesort")
        boundary = df["user_id"].ne(df["user_id"].shift())
        brk = ((df["ts"].diff() > gap) & ~boundary).astype("int64")
        df = df.assign(session_id=brk.groupby(
            df["user_id"], sort=False).cumsum())
        s = df.groupby(["user_id", "session_id"], as_index=False).agg(
            start=("ts", "min"), end=("ts", "max"))
        st = s["start"].to_numpy().astype("datetime64[us]").astype("int64")
        en = s["end"].to_numpy().astype("datetime64[us]").astype("int64")
        out = pd.DataFrame({
            "ts_us": np.concatenate([st, en]),
            "d": np.concatenate([np.ones(len(st), dtype=np.int64),
                                 -np.ones(len(en), dtype=np.int64)])})
        out["_tb"] = (out["ts_us"] % 64).astype("int64")
        return out

    def collapse(df: pd.DataFrame) -> pd.DataFrame:
        # unique (ts, d) keys with net counts — peer groups can no longer
        # straddle sort-block boundaries, so per-block cumsums are exact
        out = df.groupby(["ts_us", "d"], as_index=False).size() \
            .rename(columns={"size": "n"})
        out["n"] = out["n"].astype("int64")
        return out

    bnd = ds.map_batches(keep, batch_format="pandas") \
        .groupby("_b").map_groups(bucket_boundaries, batch_format="pandas") \
        .groupby("_tb").map_groups(collapse, batch_format="pandas") \
        .sort(["ts_us", "d"]).materialize()

    def block_tot(t: pa.Table) -> pd.DataFrame:
        if len(t) == 0:
            return pd.DataFrame({"first_ts": pd.Series([], dtype="int64"),
                                 "first_d": pd.Series([], dtype="int64"),
                                 "tot": pd.Series([], dtype="int64")})
        d = t["d"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False)
        return pd.DataFrame({
            "first_ts": [int(t["ts_us"][0].as_py())],
            "first_d": [int(t["d"][0].as_py())],
            "tot": [int((d * n).sum())]})

    parts = bnd.map_batches(block_tot, batch_format="pyarrow",
                            batch_size=None).to_pandas()
    if parts.empty:
        return pd.DataFrame({"day": pd.Series([], dtype="datetime64[us]"),
                             "max_concurrent": pd.Series([], dtype="int64")})
    parts = parts.sort_values(["first_ts", "first_d"]).reset_index(drop=True)
    prefix = parts["tot"].cumsum().shift(1, fill_value=0)
    entry = {(int(f), int(fd)): int(p) for f, fd, p in
             zip(parts["first_ts"], parts["first_d"], prefix)}

    def day_max(t: pa.Table) -> pd.DataFrame:
        if len(t) == 0:
            return pd.DataFrame({"day_us": pd.Series([], dtype="int64"),
                                 "mx": pd.Series([], dtype="int64")})
        ts = t["ts_us"].to_numpy(zero_copy_only=False)
        d = t["d"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False)
        base = entry[(int(ts[0]), int(d[0]))]
        running = base + np.cumsum(d * n)
        day = (ts // 86_400_000_000) * 86_400_000_000
        out = pd.DataFrame({"day_us": day, "running": running}) \
            .groupby("day_us", as_index=False)["running"].max() \
            .rename(columns={"running": "mx"})
        return out.astype({"day_us": "int64", "mx": "int64"})

    mx = bnd.map_batches(day_max, batch_format="pyarrow",
                         batch_size=None).to_pandas()
    out = mx.groupby("day_us", as_index=False)["mx"].max()
    return pd.DataFrame({
        "day": pd.to_datetime(out["day_us"], unit="us"),
        "max_concurrent": out["mx"].astype("int64"),
    }).sort_values("day").reset_index(drop=True)


# ---------------------------------------------------------------------------
# frontier BFS: hop distance from a source node over the co-order graph —
# the per-query traversal shape (k rounds of frontier expansion against a
# distributed edge set), complementing parts_components' global fixpoint
# ---------------------------------------------------------------------------

_BFS_MAX_LEVEL = 4
_BFS_SUPPORT = 2  # denser than parts_components' graph: the min-key
                  # source reaches 135-200 nodes across 3-4 hop levels on
                  # the shipped corpora (support 3 leaves a 2-node island)


def parts_bfs_levels(sf_dir: str, support: int = _BFS_SUPPORT,
                     max_level: int = _BFS_MAX_LEVEL) -> pd.DataFrame:
    """Hop distance (≤ ``max_level``) from the minimum part key in the
    co-order edge set, BFS over undirected edges.

    Scale shape: the edge Dataset never leaves the workers; each round
    broadcasts the current frontier SET (≤ |reached| node ids — the
    operator's documented partitioning assumption: the reached set of a
    bounded-radius query fits in one broadcast, which holds for k-hop
    neighborhoods; a GLOBAL traversal uses parts_components' label
    propagation instead) and one edge scan emits the distinct neighbor
    partials.  The DuckDB twin is a WITH RECURSIVE reach closure with
    MIN(level) per node."""
    import ray

    edges = _co_order_edges(sf_dir, support)
    empty = pd.DataFrame({"l_partkey": pd.Series([], dtype="int64"),
                          "level": pd.Series([], dtype="int64")})
    if edges.count() == 0:
        return empty

    def block_min(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"m": pd.Series([], dtype="int64")})
        return pd.DataFrame(
            {"m": [int(min(df["a_id"].min(), df["b_id"].min()))]})

    src = int(edges.map_batches(block_min, batch_format="pandas")
              .to_pandas()["m"].min())

    visited = {src: 0}
    frontier = {src}
    for lvl in range(1, max_level + 1):
        f_ref = ray.put(frozenset(frontier))

        def neighbors(df: pd.DataFrame) -> pd.DataFrame:
            f = ray.get(f_ref)
            a = df["a_id"].to_numpy()
            b = df["b_id"].to_numpy()
            am = np.array([x in f for x in a], dtype=bool)
            bm = np.array([x in f for x in b], dtype=bool)
            out = np.unique(np.concatenate([b[am], a[bm]]))
            return pd.DataFrame({"nb": out.astype("int64")})

        nbs = edges.map_batches(neighbors, batch_format="pandas") \
            .to_pandas()
        nxt = set(int(x) for x in nbs["nb"]) - set(visited)
        if not nxt:
            break
        for n in nxt:
            visited[n] = lvl
        frontier = nxt

    out = pd.DataFrame({"l_partkey": list(visited),
                        "level": [visited[k] for k in visited]})
    out["l_partkey"] = out["l_partkey"].astype("int64")
    out["level"] = out["level"].astype("int64")
    return out.sort_values("l_partkey").reset_index(drop=True)


_SSSP_SUPPORT = 2
_SSSP_ROUNDS = 3


def parts_sssp(sf_dir: str, support: int = _SSSP_SUPPORT,
               rounds: int = _SSSP_ROUNDS) -> pd.DataFrame:
    """Hop-bounded weighted single-source shortest path (Bellman-Ford,
    ``rounds`` relaxation rounds) from the minimum part key over the
    co-order graph: edge cost = 1_000_000 // n_pair (heavily co-ordered
    parts are "closer"), so cost is exact int64 and tie-free to merge.

    Scale shape: the weighted edge Dataset stays on the workers; each
    round broadcasts the current distance MAP (the parts_bfs_levels
    partitioning assumption: a bounded-radius query's reached set fits
    one broadcast — a GLOBAL SSSP would switch to the label-propagation
    exchange shape of parts_components) and ONE edge scan emits
    per-block min-relaxation partials (node, candidate_cost); the driver
    merges ≤ reached × blocks rows with an integer min.  A node relaxed
    in round r can be improved again in round r+1 via a cheaper 2-hop
    path — the min-merge keeps Bellman-Ford semantics, and the loop
    stops early on a fixpoint.  The DuckDB twin iterates the identical
    relax-then-min rounds as generated CTEs."""
    import ray

    counts = _co_order_pair_counts(sf_dir, support).materialize()
    empty = pd.DataFrame({"l_partkey": pd.Series([], dtype="int64"),
                          "cost": pd.Series([], dtype="int64")})
    if counts.count() == 0:
        return empty

    def block_min(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"m": pd.Series([], dtype="int64")})
        return pd.DataFrame(
            {"m": [int(min(df["a_id"].min(), df["b_id"].min()))]})

    src = int(counts.map_batches(block_min, batch_format="pandas")
              .to_pandas()["m"].min())

    dist = {src: 0}
    for _ in range(rounds):
        d_ref = ray.put(dict(dist))

        def relax(df: pd.DataFrame) -> pd.DataFrame:
            d = pd.Series(ray.get(d_ref), dtype="float64")
            a = df["a_id"].to_numpy().astype("int64")
            b = df["b_id"].to_numpy().astype("int64")
            w = (1_000_000 // df["n_pair"].to_numpy()).astype("int64")
            da = pd.Series(a).map(d).to_numpy()
            db = pd.Series(b).map(d).to_numpy()
            am, bm = ~np.isnan(da), ~np.isnan(db)
            nodes = np.concatenate([b[am], a[bm]])
            # costs ≤ rounds × 1e6 — exact in float64, cast back to int64
            costs = np.concatenate([da[am] + w[am], db[bm] + w[bm]]) \
                .astype("int64")
            out = pd.DataFrame({"node": pd.Series(nodes, dtype="int64"),
                                "cost": pd.Series(costs, dtype="int64")})
            return out.groupby("node", as_index=False)["cost"].min()

        cands = counts.map_batches(relax, batch_format="pandas") \
            .to_pandas()
        changed = False
        if len(cands):
            merged = cands.groupby("node")["cost"].min()
            for node, cost in merged.items():
                node, cost = int(node), int(cost)
                if node not in dist or cost < dist[node]:
                    dist[node] = cost
                    changed = True
        if not changed:
            break

    out = pd.DataFrame({"l_partkey": list(dist),
                        "cost": [dist[k] for k in dist]})
    out["l_partkey"] = out["l_partkey"].astype("int64")
    out["cost"] = out["cost"].astype("int64")
    return out.sort_values("l_partkey").reset_index(drop=True)


# ---------------------------------------------------------------------------
# time-series resample + gap fill: hourly last-observation-carried-forward
# per event type over the corpus's full hour range — the regularization a
# downstream feature pipeline runs before any fixed-step model
# ---------------------------------------------------------------------------


def events_gap_fill(sf_dir: str) -> pd.DataFrame:
    """One row per (event_type, hour) from each type's first observation
    to the global max hour: the hour's LAST value in cents (ties on ts
    break by event_id — the deterministic arg-last), forward-filled from
    the previous observed hour when the hour has no events, plus a
    ``filled`` flag.  Hours before a type's first observation are absent
    (both sides drop the leading NULLs).

    Scale shape: one pass emits per-(type, hour) arg-last partials
    (sort + groupby-last inside the batch, ≤ types×hours rows out) plus
    the global hour range; the type-hash bucket finishes the per-hour
    arg-last exactly, builds the dense hour axis with np.arange, and
    forward-fills via ONE searchsorted — no per-hour Python, no global
    sort."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "event_type": pd.Series([], dtype=object),
                "hour": pd.Series([], dtype="int64"),
                "ts_us": pd.Series([], dtype="int64"),
                "event_id": pd.Series([], dtype="int64"),
                "cents": pd.Series([], dtype="int64")})
        d = df.copy()
        d["ts_us"] = d["ts"].to_numpy().astype("datetime64[us]") \
            .astype("int64")
        d["hour"] = d["ts_us"] // 3_600_000_000
        d["cents"] = np.floor(d["value"].to_numpy() * 100 + 0.5) \
            .astype("int64")
        d = d.sort_values(["ts_us", "event_id"], kind="mergesort")
        last = d.groupby(["event_type", "hour"], as_index=False).last()
        return last[["event_type", "hour", "ts_us", "event_id", "cents"]]

    parts = ds.map_batches(partial, batch_format="pandas").materialize()
    rng = parts.map_batches(
        lambda df: pd.DataFrame({"mx": [df["hour"].max()]})
        if len(df) else pd.DataFrame({"mx": pd.Series([], dtype="int64")}),
        batch_format="pandas").to_pandas()
    empty = pd.DataFrame({"event_type": pd.Series([], dtype=object),
                          "hour": pd.Series([], dtype="datetime64[us]"),
                          "cents": pd.Series([], dtype="int64"),
                          "filled": pd.Series([], dtype="int64")})
    if rng.empty:
        return empty
    max_hour = int(rng["mx"].max())

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_b"] = (pd.util.hash_pandas_object(
            df["event_type"].astype(object), index=False).to_numpy()
            % 16).astype("int64")
        return df

    def fill_bucket(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for et, g in df.groupby("event_type", sort=False):
            # finish the per-hour arg-last exactly across block partials
            g = g.sort_values(["ts_us", "event_id"], kind="mergesort")
            last = g.groupby("hour", as_index=False).last() \
                .sort_values("hour")
            hours = last["hour"].to_numpy(dtype="int64")
            cents = last["cents"].to_numpy(dtype="int64")
            axis = np.arange(hours[0], max_hour + 1, dtype="int64")
            idx = np.searchsorted(hours, axis, side="right") - 1
            frames.append(pd.DataFrame({
                "event_type": et,
                "hour": axis,
                "cents": cents[idx],
                "filled": (~np.isin(axis, hours)).astype("int64")}))
        if not frames:
            return pd.DataFrame({
                "event_type": pd.Series([], dtype=object),
                "hour": pd.Series([], dtype="int64"),
                "cents": pd.Series([], dtype="int64"),
                "filled": pd.Series([], dtype="int64")})
        return pd.concat(frames, ignore_index=True)

    out = parts.map_batches(keyed, batch_format="pandas") \
        .groupby("_b").map_groups(fill_bucket, batch_format="pandas") \
        .to_pandas()
    if out.empty:
        return empty
    return pd.DataFrame({
        "event_type": out["event_type"],
        "hour": pd.to_datetime(out["hour"].astype("int64")
                               * 3_600_000_000, unit="us"),
        "cents": out["cents"].astype("int64"),
        "filled": out["filled"].astype("int64"),
    }).sort_values(["event_type", "hour"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# SCD type-2 dimension build: treat each customer's order stream as a
# change log and emit validity intervals (valid_from = order date,
# valid_to = next order's date, open interval pinned to 9999-12-31).
# The standard lakehouse "build the slowly-changing dimension from the
# CDC stream" shape (reference has no SCD op; this is the training-data/
# lakehouse extension surface).
# ---------------------------------------------------------------------------


def orders_scd2(sf_dir: str) -> pd.DataFrame:
    """SCD-2 intervals per customer from the orders change log.

    One row per order: (o_custkey, version, valid_from, valid_to,
    price_cents, is_current) where version numbers the customer's orders
    by (o_orderdate, o_orderkey) and valid_to is the NEXT version's
    valid_from ('9999-12-31' for the open current row).

    Scale shape: customers hash-bucket on o_custkey % 64 so each bucket
    holds complete change histories; inside a bucket ONE mergesort + ONE
    vectorized shift computes every customer's lead(valid_from) — the
    orders_running_total pattern, no per-key Python.  Dates travel as
    strings so the hash contract is dtype-stable."""
    ds = _read(sf_dir, "orders",
               ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_b"] = (df["o_custkey"].astype("int64")
                    % _N_RUN_BUCKETS).astype("int64")
        return df

    def bucket_scd2(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_custkey", "o_orderdate", "o_orderkey"],
                            kind="mergesort").reset_index(drop=True)
        cust = df["o_custkey"].to_numpy(dtype="int64")
        dates = df["o_orderdate"].dt.strftime("%Y-%m-%d").to_numpy()
        # version = 1-based rank within customer (arrival order after sort)
        version = np.arange(len(df), dtype="int64")
        starts = np.flatnonzero(np.r_[True, cust[1:] != cust[:-1]])
        version -= np.repeat(version[starts],
                             np.diff(np.r_[starts, len(df)]))
        version += 1
        # lead(valid_from) within customer; last row of each customer open
        valid_to = np.concatenate(
            [dates[1:], np.array(["9999-12-31"], dtype=object)]).astype(object)
        last = np.concatenate([cust[1:] != cust[:-1], [True]])
        valid_to[last] = "9999-12-31"
        cents = np.floor(
            df["o_totalprice"].to_numpy() * 100 + 0.5).astype("int64")
        return pd.DataFrame({
            "o_custkey": cust,
            "version": version,
            "valid_from": dates,
            "valid_to": valid_to.astype(str),
            "price_cents": cents,
            "is_current": last.astype("int64")})

    out = ds.map_batches(keyed, batch_format="pandas") \
        .groupby("_b").map_groups(bucket_scd2, batch_format="pandas") \
        .to_pandas()
    for c in ("o_custkey", "version", "price_cents", "is_current"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["o_custkey", "version"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Node-neighborhood Jaccard similarity over the co-order part graph —
# the standard link-prediction / entity-resolution signal: for every edge
# (u, v), |N(u) ∩ N(v)| / |N(u) ∪ N(v)| in exact integer ppm.
# ---------------------------------------------------------------------------


def parts_neighbor_jaccard(sf_dir: str, support: int = 2) -> pd.DataFrame:
    """Per-edge neighborhood Jaccard (a_id, b_id, common, jaccard_ppm).

    Scale shape: reuses the materialized co-order edge build (order-hash
    buckets, never a row-level self-join).  Common-neighbor counts come
    from each middle-vertex bucket's vectorized self-merge (the
    parts_triangles wedge shape, oriented merge bounded by bucket
    degree²); degrees and wedge counts then attach to edges through
    TAGGED-UNION exchanges (union frames co-partition on the join key and
    one pandas merge runs per bucket) — three bounded exchanges, no
    driver-side maps."""
    edges = _co_order_edges(sf_dir, support)

    def to_directed(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "node": np.concatenate([df["a_id"].to_numpy(dtype="int64"),
                                    df["b_id"].to_numpy(dtype="int64")]),
            "nbr": np.concatenate([df["b_id"].to_numpy(dtype="int64"),
                                   df["a_id"].to_numpy(dtype="int64")])})
        out["_b"] = (out["node"] % 64).astype("int64")
        return out

    directed = edges.map_batches(to_directed, batch_format="pandas") \
        .materialize()

    # degrees per node (node-bucket groupby; buckets hold complete nodes)
    def bucket_deg(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("node", as_index=False).agg(deg=("nbr", "size"))
        return g.astype("int64")

    # materialized: consumed by BOTH degree-attachment unions below —
    # without this the bucket_deg exchange would re-run per consumer
    degrees = directed.groupby("_b").map_groups(
        bucket_deg, batch_format="pandas").materialize()

    # wedges: within each middle-vertex bucket, self-merge on the middle
    # node; (u < v) orientation bounds the blowup by oriented degree².
    def bucket_wedges(df: pd.DataFrame) -> pd.DataFrame:
        m = df.merge(df, on="node")
        m = m[m["nbr_x"] < m["nbr_y"]]
        out = m.groupby(["nbr_x", "nbr_y"], as_index=False).size() \
            .rename(columns={"nbr_x": "a_id", "nbr_y": "b_id",
                             "size": "common"})
        out["_p"] = ((out["a_id"] * 1_000_003 + out["b_id"]) % 64) \
            .astype("int64")
        return out.astype("int64")

    wedges = directed.groupby("_b").map_groups(
        bucket_wedges, batch_format="pandas")

    # attach deg_a under node-bucket of a_id (tagged union + one merge)
    def tag_edge_a(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "key": df["a_id"].astype("int64"),
            "a_id": df["a_id"].astype("int64"),
            "b_id": df["b_id"].astype("int64"),
            "deg": np.full(len(df), -1, dtype="int64"),
            "_b": (df["a_id"].astype("int64") % 64).astype("int64")})

    def tag_deg(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "key": df["node"].astype("int64"),
            "a_id": np.full(len(df), -1, dtype="int64"),
            "b_id": np.full(len(df), -1, dtype="int64"),
            "deg": df["deg"].astype("int64"),
            "_b": (df["node"].astype("int64") % 64).astype("int64")})

    def merge_deg(col_out: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            e = df[df["deg"] < 0][["key", "a_id", "b_id"]]
            d = df[df["deg"] >= 0][["key", "deg"]]
            if e.empty:
                return pd.DataFrame({
                    "a_id": pd.Series([], dtype="int64"),
                    "b_id": pd.Series([], dtype="int64"),
                    col_out: pd.Series([], dtype="int64")})
            m = e.merge(d, on="key", how="left")
            return pd.DataFrame({
                "a_id": m["a_id"].astype("int64"),
                "b_id": m["b_id"].astype("int64"),
                col_out: m["deg"].fillna(0).astype("int64")})
        return fn

    e_with_da = edges.map_batches(tag_edge_a, batch_format="pandas") \
        .union(degrees.map_batches(tag_deg, batch_format="pandas")) \
        .groupby("_b").map_groups(merge_deg("deg_a"), batch_format="pandas")

    # attach deg_b under node-bucket of b_id
    def tag_edge_b(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "key": df["b_id"].astype("int64"),
            "a_id": df["a_id"].astype("int64"),
            "b_id": df["b_id"].astype("int64"),
            "deg": -df["deg_a"].astype("int64") - 2,  # smuggle deg_a < -1
            "_b": (df["b_id"].astype("int64") % 64).astype("int64")})

    def merge_deg_b(df: pd.DataFrame) -> pd.DataFrame:
        e = df[df["deg"] < -1][["key", "a_id", "b_id", "deg"]].copy()
        d = df[df["deg"] >= 0][["key", "deg"]].rename(
            columns={"deg": "deg_b"})
        if e.empty:
            return pd.DataFrame({c: pd.Series([], dtype="int64") for c in
                                 ("a_id", "b_id", "deg_a", "deg_b", "_p")})
        e["deg_a"] = (-e["deg"] - 2).astype("int64")
        m = e.merge(d, on="key", how="left")
        out = pd.DataFrame({
            "a_id": m["a_id"].astype("int64"),
            "b_id": m["b_id"].astype("int64"),
            "deg_a": m["deg_a"].astype("int64"),
            "deg_b": m["deg_b"].fillna(0).astype("int64")})
        out["_p"] = ((out["a_id"] * 1_000_003 + out["b_id"]) % 64) \
            .astype("int64")
        return out

    e_with_deg = e_with_da.map_batches(tag_edge_b, batch_format="pandas") \
        .union(degrees.map_batches(tag_deg, batch_format="pandas")) \
        .groupby("_b").map_groups(merge_deg_b, batch_format="pandas")

    # final pair-bucket merge: edges (with degrees) ⋈ wedge counts
    def finish(df: pd.DataFrame) -> pd.DataFrame:
        e = df[df["common"] < 0][["a_id", "b_id", "deg_a", "deg_b"]]
        # each middle-vertex bucket emitted a PARTIAL count for a pair;
        # sum partials before attaching them to the edge
        w = df[df["common"] >= 0].groupby(["a_id", "b_id"], as_index=False) \
            .agg(common=("common", "sum"))
        if e.empty:
            return pd.DataFrame({c: pd.Series([], dtype="int64") for c in
                                 ("a_id", "b_id", "common", "jaccard_ppm")})
        m = e.merge(w, on=["a_id", "b_id"], how="left")
        common = m["common"].fillna(0).astype("int64")
        union = (m["deg_a"] + m["deg_b"] - common).astype("int64")
        return pd.DataFrame({
            "a_id": m["a_id"].astype("int64"),
            "b_id": m["b_id"].astype("int64"),
            "common": common,
            "jaccard_ppm": (common * 1_000_000) // union})

    def tag_e(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["common"] = np.full(len(df), -1, dtype="int64")
        return out[["a_id", "b_id", "deg_a", "deg_b", "common", "_p"]]

    def tag_w(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["deg_a"] = np.zeros(len(df), dtype="int64")
        out["deg_b"] = np.zeros(len(df), dtype="int64")
        return out[["a_id", "b_id", "deg_a", "deg_b", "common", "_p"]]

    out = e_with_deg.map_batches(tag_e, batch_format="pandas") \
        .union(wedges.map_batches(tag_w, batch_format="pandas")) \
        .groupby("_p").map_groups(finish, batch_format="pandas") \
        .to_pandas()
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values(["a_id", "b_id"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Lakehouse manifest / zone-map build: per ship-month partition statistics
# (row count, value min/max, sum, distinct part count) — the metadata a
# table format writes next to its data files so reads can skip partitions
# (the write-side counterpart of lineitem_partition_prune).
# ---------------------------------------------------------------------------


def lineitem_manifest_stats(sf_dir: str) -> pd.DataFrame:
    """Per-month manifest row: (month, n_rows, min_date, max_date,
    min_price_cents, max_price_cents, sum_qty_c100, n_parts).

    Scale shape: every stat except the distinct-part count reduces from
    per-block partials (count/min/max/sum are mergeable — O(months ×
    blocks) to the exchange, never O(rows)); distinct parts co-partition
    as per-block-deduped (month, partkey) projections under a month-hash
    bucket.  Both partial streams finish in ONE tagged-union exchange."""
    ds = _read(sf_dir, "lineitem",
               ["l_shipdate", "l_extendedprice", "l_quantity", "l_partkey"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df.copy()
        d["month"] = d["l_shipdate"].dt.strftime("%Y-%m")
        d["date"] = d["l_shipdate"].dt.strftime("%Y-%m-%d")
        d["cents"] = np.floor(
            d["l_extendedprice"].to_numpy() * 100 + 0.5).astype("int64")
        # per-ROW integer centi-quantities so partials merge exactly under
        # any block layout (rounding a per-block float sum would double-
        # round vs the oracle's one global rounding)
        d["qty_c100"] = np.floor(
            d["l_quantity"].to_numpy() * 100 + 0.5).astype("int64")
        g = d.groupby("month", as_index=False).agg(
            n_rows=("cents", "size"), min_date=("date", "min"),
            max_date=("date", "max"), min_price_cents=("cents", "min"),
            max_price_cents=("cents", "max"), sum_qty_c100=("qty_c100", "sum"))
        g["l_partkey"] = np.full(len(g), -1, dtype="int64")
        return g

    def distinct_partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[["l_shipdate", "l_partkey"]].copy()
        d["month"] = d["l_shipdate"].dt.strftime("%Y-%m")
        d = d.drop_duplicates(["month", "l_partkey"])
        return pd.DataFrame({
            "month": d["month"],
            "n_rows": np.zeros(len(d), dtype="int64"),
            "min_date": np.full(len(d), "9999-12-31", dtype=object),
            "max_date": np.full(len(d), "0000-01-01", dtype=object),
            "min_price_cents": np.full(len(d), np.iinfo("int64").max,
                                       dtype="int64"),
            "max_price_cents": np.full(len(d), np.iinfo("int64").min,
                                       dtype="int64"),
            "sum_qty_c100": np.zeros(len(d), dtype="int64"),
            "l_partkey": d["l_partkey"].astype("int64")})

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_b"] = df["month"].map(
            lambda m: (int(m[:4]) * 12 + int(m[5:7])) % 16).astype("int64")
        return df

    def merge_month(df: pd.DataFrame) -> pd.DataFrame:
        stats = df[df["l_partkey"] < 0]
        parts = df[df["l_partkey"] >= 0]
        g = stats.groupby("month", as_index=False).agg(
            n_rows=("n_rows", "sum"), min_date=("min_date", "min"),
            max_date=("max_date", "max"),
            min_price_cents=("min_price_cents", "min"),
            max_price_cents=("max_price_cents", "max"),
            sum_qty_c100=("sum_qty_c100", "sum"))
        np_ = parts.drop_duplicates(["month", "l_partkey"]) \
            .groupby("month", as_index=False).agg(
                n_parts=("l_partkey", "size"))
        return g.merge(np_, on="month", how="left").fillna({"n_parts": 0})

    out = ds.map_batches(partial, batch_format="pandas") \
        .union(ds.map_batches(distinct_partial, batch_format="pandas")) \
        .map_batches(keyed, batch_format="pandas") \
        .groupby("_b").map_groups(merge_month, batch_format="pandas") \
        .to_pandas()
    for c in ("n_rows", "min_price_cents", "max_price_cents",
              "sum_qty_c100", "n_parts"):
        out[c] = out[c].astype("int64")
    return out.sort_values("month").reset_index(drop=True)


# ---------------------------------------------------------------------------
# RFM customer segmentation (classic marketing-analytics shape): per
# customer recency / frequency / monetary metrics, each scored into
# quintiles with exact NTILE(5) OVER (ORDER BY metric, custkey)
# semantics — computed WITHOUT a global sort via the docs_ntile
# histogram + below-count decomposition.
# ---------------------------------------------------------------------------


def _global_ntile(base, value_col: str, n_tiles: int):
    """(o_custkey, tile) with NTILE(n) OVER (ORDER BY value, custkey)
    semantics: merged value histogram → cumulative below-counts
    (O(distinct values × blocks) to the driver) + per-value custkey rank
    under 64-way value-hash buckets."""
    def hist_partial(df: pd.DataFrame) -> pd.DataFrame:
        u, c = np.unique(df[value_col].to_numpy(dtype="int64"),
                         return_counts=True)
        return pd.DataFrame({"v": u.astype("int64"), "n": c.astype("int64")})

    parts = base.map_batches(hist_partial, batch_format="pandas") \
        .to_pandas()
    hist = parts.groupby("v")["n"].sum().sort_index()
    domain = hist.index.to_numpy(dtype="int64")
    counts = hist.to_numpy(dtype="int64")
    below = np.concatenate(([0], np.cumsum(counts)[:-1]))
    n_total = int(counts.sum())
    q, rem = divmod(n_total, n_tiles)

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["o_custkey", value_col]].copy()
        out["_b"] = (out[value_col].astype("int64") % 64).astype("int64")
        return out

    def rank_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([value_col, "o_custkey"],
                            kind="mergesort").reset_index(drop=True)
        v = df[value_col].to_numpy(dtype="int64")
        within = df.groupby(value_col).cumcount().to_numpy()
        r0 = below[np.searchsorted(domain, v)] + within
        cut = rem * (q + 1)
        tile = np.where(r0 < cut, r0 // max(q + 1, 1),
                        rem + (r0 - cut) // max(q, 1)) + 1
        return pd.DataFrame({"o_custkey": df["o_custkey"].astype("int64"),
                             "tile": tile.astype("int64")})

    return base.map_batches(bucketize, batch_format="pandas") \
        .groupby("_b").map_groups(rank_bucket, batch_format="pandas")


def orders_rfm(sf_dir: str, n_tiles: int = 5) -> pd.DataFrame:
    """RFM segmentation: (o_custkey, recency_days, frequency,
    monetary_cents, r_score, f_score, m_score, rfm) with quintile scores
    under exact NTILE semantics (ties broken by custkey).

    Scale shape: per-customer metrics reduce from per-block partials
    under a custkey bucket; the global anchor date is the max of
    per-block maxes (one tiny driver reduce); each score is ONE
    histogram pass + ONE value-bucket rank exchange (`_global_ntile`,
    the docs_ntile decomposition — no global sort anywhere); scores
    re-attach to metrics through a custkey-bucket tagged-union merge."""
    ds = _read(sf_dir, "orders",
               ["o_custkey", "o_orderdate", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df.copy()
        d["day"] = (d["o_orderdate"].to_numpy().astype("datetime64[D]")
                    .astype("int64"))
        d["cents"] = np.floor(
            d["o_totalprice"].to_numpy() * 100 + 0.5).astype("int64")
        g = d.groupby("o_custkey", as_index=False).agg(
            last_day=("day", "max"), frequency=("day", "size"),
            monetary_cents=("cents", "sum"))
        g["_b"] = (g["o_custkey"].astype("int64") % 64).astype("int64")
        return g

    def merge_cust(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("o_custkey", as_index=False).agg(
            last_day=("last_day", "max"), frequency=("frequency", "sum"),
            monetary_cents=("monetary_cents", "sum"))
        return g.astype("int64")

    base = ds.map_batches(partial, batch_format="pandas") \
        .groupby("_b").map_groups(merge_cust, batch_format="pandas") \
        .materialize()

    anchor = base.map_batches(
        lambda df: pd.DataFrame({"m": [int(df["last_day"].max())]}
                                if len(df) else {"m": []}),
        batch_format="pandas").to_pandas()["m"].max()

    def add_recency(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["recency_days"] = (int(anchor)
                               - out["last_day"].astype("int64"))
        return out[["o_custkey", "recency_days", "frequency",
                    "monetary_cents"]]

    metrics = base.map_batches(add_recency, batch_format="pandas") \
        .materialize()

    scored = {}
    for col, name in (("recency_days", "r_score"), ("frequency", "f_score"),
                      ("monetary_cents", "m_score")):
        scored[name] = _global_ntile(metrics, col, n_tiles)

    # attach the three scores under a custkey-bucket tagged union
    def tag(ds_in, col_idx: int):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "o_custkey": df["o_custkey"].astype("int64"),
                "kind": np.full(len(df), col_idx, dtype="int64"),
                "a": df.get("recency_days",
                            df.get("tile")).astype("int64"),
                "b": df.get("frequency",
                            pd.Series(np.zeros(len(df)))).astype("int64"),
                "c": df.get("monetary_cents",
                            pd.Series(np.zeros(len(df)))).astype("int64"),
                "_b": (df["o_custkey"].astype("int64") % 64)
                .astype("int64")})
        return ds_in.map_batches(fn, batch_format="pandas")

    unioned = tag(metrics, 0).union(
        tag(scored["r_score"], 1), tag(scored["f_score"], 2),
        tag(scored["m_score"], 3))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        m = df[df["kind"] == 0][["o_custkey", "a", "b", "c"]].rename(
            columns={"a": "recency_days", "b": "frequency",
                     "c": "monetary_cents"})
        for idx, name in ((1, "r_score"), (2, "f_score"), (3, "m_score")):
            s = df[df["kind"] == idx][["o_custkey", "a"]].rename(
                columns={"a": name})
            m = m.merge(s, on="o_custkey", how="left")
        m["rfm"] = (m["r_score"] * 100 + m["f_score"] * 10
                    + m["m_score"]).astype("int64")
        return m.astype("int64")

    out = unioned.groupby("_b").map_groups(finish, batch_format="pandas") \
        .to_pandas()
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("o_custkey").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Cohort retention matrix: customers grouped by first-order month, then
# for every months-since-cohort offset the count of distinct customers
# still ordering — the classic product-analytics triangle.
# ---------------------------------------------------------------------------


def orders_cohort_retention(sf_dir: str) -> pd.DataFrame:
    """(cohort_month, months_since, n_customers) — distinct active
    customers per cohort × month offset.

    Scale shape: custkey buckets hold complete order histories, so the
    cohort month (per-customer MIN) and every (cohort, offset, customer)
    activity triple are bucket-local; per-bucket DISTINCT shrinks the
    final exchange to census partials keyed by (cohort, offset) — a
    months² table, independent of customer count."""
    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["_b"] = (out["o_custkey"].astype("int64") % 64).astype("int64")
        return out

    def bucket_census(df: pd.DataFrame) -> pd.DataFrame:
        d = df.copy()
        mon = (d["o_orderdate"].dt.year.to_numpy(dtype="int64") * 12
               + d["o_orderdate"].dt.month.to_numpy(dtype="int64") - 1)
        d["mon"] = mon
        first = d.groupby("o_custkey")["mon"].transform("min")
        d["cohort"] = first
        d["months_since"] = (d["mon"] - first).astype("int64")
        trip = d.drop_duplicates(["o_custkey", "cohort", "months_since"])
        g = trip.groupby(["cohort", "months_since"], as_index=False) \
            .agg(n_customers=("o_custkey", "size"))
        return g.astype("int64")

    out = ds.map_batches(keyed, batch_format="pandas") \
        .groupby("_b").map_groups(bucket_census, batch_format="pandas") \
        .to_pandas()
    out = out.groupby(["cohort", "months_since"], as_index=False) \
        ["n_customers"].sum()
    cohort_month = (out["cohort"] // 12).astype("int64").astype(str) \
        .str.zfill(4) + "-" + ((out["cohort"] % 12) + 1).astype("int64") \
        .astype(str).str.zfill(2)
    res = pd.DataFrame({
        "cohort_month": cohort_month,
        "months_since": out["months_since"].astype("int64"),
        "n_customers": out["n_customers"].astype("int64")})
    return res.sort_values(["cohort_month", "months_since"]) \
        .reset_index(drop=True)


# ---------------------------------------------------------------------------
# Exact distinct counting via OR-mergeable bitmaps (the roaring-bitmap
# pattern): each block packs its user ids into a fixed-domain bitset per
# day; bitmap partials OR together associatively, so the exchange carries
# (day, word_idx, bits) triples bounded by domain/64 × days — never rows.
# ---------------------------------------------------------------------------


def _or_by_key(day: np.ndarray, word: np.ndarray, bits: np.ndarray):
    """OR-reduce ``bits`` within (day, word) groups — one lexsort + one
    np.bitwise_or.reduceat, no per-group Python."""
    order = np.lexsort((word, day))
    d, w, b = day[order], word[order], bits[order].astype("uint64")
    if len(d) == 0:
        return d, w, b
    starts = np.flatnonzero(
        np.concatenate([[True], (d[1:] != d[:-1]) | (w[1:] != w[:-1])]))
    return (d[starts], w[starts],
            np.bitwise_or.reduceat(b, starts))


def events_bitmap_distinct(sf_dir: str) -> pd.DataFrame:
    """Exact distinct users per day via OR-merged uint64 bitmaps:
    (day, n_distinct).

    Scale shape: each block emits its per-(day, word) nonzero bitmap
    words (one lexsort + np.bitwise_or.reduceat), merged under a day-hash
    bucket with the same vectorized OR and popcounted — the Bloom-semijoin
    OR-merge shape, but exact because the id domain is dense.  (A sparse/
    unbounded domain would shard the bitmap by id-range first — same
    algebra, one more key.)"""
    from ..stages.dedup import _popcount64

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def bitmap_partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({
                "day": pd.Series([], dtype="int64"),
                "word": pd.Series([], dtype="int64"),
                "bits": pd.Series([], dtype="uint64"),
                "_b": pd.Series([], dtype="int64")})
        day = (df["ts"].to_numpy().astype("datetime64[D]")
               .astype("int64"))
        uid = df["user_id"].to_numpy(dtype="int64")
        word = uid >> 6
        bit = np.uint64(1) << (uid & 63).astype("uint64")
        d2, w2, b2 = _or_by_key(day, word, bit)
        out = pd.DataFrame({"day": d2, "word": w2, "bits": b2})
        out["_b"] = (out["day"].astype("int64") % 16).astype("int64")
        return out

    def bucket_or(df: pd.DataFrame) -> pd.DataFrame:
        d2, _, b2 = _or_by_key(df["day"].to_numpy(dtype="int64"),
                               df["word"].to_numpy(dtype="int64"),
                               df["bits"].to_numpy(dtype="uint64"))
        pop = _popcount64(b2)
        out = pd.DataFrame({"day": d2, "n": pop}) \
            .groupby("day", as_index=False)["n"].sum()
        return out.astype("int64")

    out = ds.map_batches(bitmap_partial, batch_format="pandas") \
        .groupby("_b").map_groups(bucket_or, batch_format="pandas") \
        .to_pandas()
    if out.empty:
        return pd.DataFrame({
            "day": pd.Series([], dtype="datetime64[ns]"),
            "n_distinct": pd.Series([], dtype="int64")})
    res = pd.DataFrame({
        "day": pd.to_datetime(out["day"].astype("int64"), unit="D"),
        "n_distinct": out["n"].astype("int64")})
    return res.sort_values("day").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Pareto / ABC inventory analysis: parts ranked by revenue, classified by
# the cumulative revenue share AT their rank (A ≤ 70%, B ≤ 90%, else C).
# The global weighted running total is computed WITHOUT a global sort:
# the docs_ntile below-count decomposition extended with per-value sums.
# ---------------------------------------------------------------------------


def parts_abc_classes(sf_dir: str) -> pd.DataFrame:
    """(p_partkey, revenue_cents, cum_ppm, abc_class) with exact
    SUM OVER (ORDER BY revenue DESC, partkey) semantics.

    Scale shape: per-part revenues reduce under a partkey bucket; ONE
    merged (value → count, sum) histogram gives every distinct revenue
    its cumulative prefix (O(distinct × blocks) to the driver, never
    O(rows)); within a value, ranks and running sums are closed-form
    (same value × position), computed under 64-way value-hash buckets —
    one mergesort + vectorized arithmetic per bucket."""
    ds = _read(sf_dir, "lineitem",
               ["l_partkey", "l_extendedprice", "l_discount"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(df["l_extendedprice"].to_numpy()
                         * (1 - df["l_discount"].to_numpy())
                         * 100 + 0.5).astype("int64")
        g = pd.DataFrame({"p_partkey": df["l_partkey"].astype("int64"),
                          "cents": cents}) \
            .groupby("p_partkey", as_index=False)["cents"].sum()
        g["_b"] = (g["p_partkey"].astype("int64") % 64).astype("int64")
        return g

    def merge_part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("p_partkey", as_index=False)["cents"].sum()
        return g.astype("int64")

    parts = ds.map_batches(partial, batch_format="pandas") \
        .groupby("_b").map_groups(merge_part, batch_format="pandas") \
        .materialize()

    # merged (revenue value → n parts, total cents) histogram; cumulative
    # prefixes in DESCENDING revenue order
    def hist_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("cents", as_index=False).agg(
            n=("p_partkey", "size"), s=("cents", "sum"))
        return g.astype("int64")

    hist = parts.map_batches(hist_partial, batch_format="pandas") \
        .to_pandas().groupby("cents").agg(n=("n", "sum"), s=("s", "sum")) \
        .sort_index(ascending=False)
    vals = hist.index.to_numpy(dtype="int64")          # descending
    sum_before = np.concatenate(
        ([0], np.cumsum(hist["s"].to_numpy(dtype="int64"))[:-1]))
    total = int(hist["s"].sum())

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["cents", "p_partkey"],
                            ascending=[False, True],
                            kind="mergesort").reset_index(drop=True)
        c = df["cents"].to_numpy(dtype="int64")
        within = df.groupby("cents", sort=False).cumcount().to_numpy()
        # vals is descending: searchsorted with a reversed view
        idx = len(vals) - 1 - np.searchsorted(vals[::-1], c, side="left")
        cum = sum_before[idx] + (within + 1) * c
        # ×1e6 exceeds int64 once total cents > ~9.2e12 (TPC-H SF≥0.5);
        # the SQL twin computes this step in HUGEINT — mirror with Python
        # big ints (the docs_dsir_weights contract)
        cum_ppm = np.array(
            [(int(x) * 1_000_000) // total for x in cum], dtype="int64")
        cls = np.where(cum_ppm <= 700_000, "A",
                       np.where(cum_ppm <= 900_000, "B", "C"))
        return pd.DataFrame({
            "p_partkey": df["p_partkey"].astype("int64"),
            "revenue_cents": c,
            "cum_ppm": cum_ppm.astype("int64"),
            "abc_class": cls})

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["_b"] = (out["cents"].astype("int64") % 64).astype("int64")
        return out

    out = parts.map_batches(bucketize, batch_format="pandas") \
        .groupby("_b").map_groups(classify, batch_format="pandas") \
        .to_pandas()
    for c in ("p_partkey", "revenue_cents", "cum_ppm"):
        out[c] = out[c].astype("int64")
    return out.sort_values("p_partkey").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Association-rule mining over order baskets (support / confidence /
# lift): the classic market-basket extension of parts_co_ordered.  All
# metrics are exact integer ppm; lift's ×N×10⁶ numerator is computed in
# Python big ints (HUGEINT in the twin).
# ---------------------------------------------------------------------------


def orders_basket_rules(sf_dir: str, support: int = 3) -> pd.DataFrame:
    """(a_id, b_id, n_pair, n_a, n_b, conf_ab_ppm, conf_ba_ppm, lift_ppm)
    for part pairs co-ordered ≥ ``support`` times.

    Scale shape: pair counts reuse the order-bucket self-merge (never a
    row-level self-join); per-part order counts reduce under part
    buckets; counts attach to pairs through two tagged-union exchanges
    (the parts_neighbor_jaccard pattern); the total-order count N is one
    scalar driver reduce of per-block partials."""
    deduped = _order_part_buckets(sf_dir)

    # total distinct orders: per-bucket exact counts (buckets own orders)
    def order_count(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"n": [int(df["l_orderkey"].nunique())]})

    counts_df = deduped.groupby("_b") \
        .map_groups(order_count, batch_format="pandas").to_pandas()
    if counts_df.empty:  # empty lineitem: no baskets, empty result
        return pd.DataFrame({c: pd.Series([], dtype="int64") for c in (
            "a_id", "b_id", "n_pair", "n_a", "n_b",
            "conf_ab_ppm", "conf_ba_ppm", "lift_ppm")})
    n_orders = int(counts_df["n"].sum())

    pairs = _co_order_pair_counts(sf_dir, support, deduped=deduped) \
        .materialize()

    # per-part distinct-order counts: the (order, part) dedup must be
    # GLOBAL, so it runs inside the order buckets (each holds complete
    # orders) and the per-part partials merge under part buckets
    def part_partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["l_orderkey", "l_partkey"])
        g = d.groupby("l_partkey", as_index=False).size() \
            .rename(columns={"l_partkey": "part", "size": "n"})
        g["_b"] = (g["part"].astype("int64") % 64).astype("int64")
        return g.astype("int64")

    def part_merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("part", as_index=False)["n"].sum().astype("int64")

    part_counts = deduped.groupby("_b") \
        .map_groups(part_partial, batch_format="pandas") \
        .groupby("_b").map_groups(part_merge, batch_format="pandas") \
        .materialize()

    # attach n_a then n_b through tagged-union part-bucket exchanges
    def tag_pairs(key_col: str, carry: list):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            out = df[["a_id", "b_id", "n_pair"] + carry].copy()
            out["key"] = out[key_col].astype("int64")
            out["cnt"] = np.full(len(df), -1, dtype="int64")
            out["_b"] = (out["key"] % 64).astype("int64")
            return out
        return fn

    def tag_counts(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "a_id": np.full(len(df), -1, dtype="int64"),
            "b_id": np.full(len(df), -1, dtype="int64"),
            "n_pair": np.full(len(df), -1, dtype="int64"),
            "key": df["part"].astype("int64"),
            "cnt": df["n"].astype("int64"),
            "_b": (df["part"].astype("int64") % 64).astype("int64")})

    def attach(col_out: str, carry: list):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            e = df[df["cnt"] < 0][["a_id", "b_id", "n_pair", "key"] + carry]
            c = df[df["cnt"] >= 0][["key", "cnt"]]
            if e.empty:
                cols = ["a_id", "b_id", "n_pair"] + carry + [col_out]
                return pd.DataFrame(
                    {x: pd.Series([], dtype="int64") for x in cols})
            m = e.merge(c, on="key", how="left")
            m[col_out] = m["cnt"].fillna(0).astype("int64")
            return m[["a_id", "b_id", "n_pair"] + carry + [col_out]] \
                .astype("int64")
        return fn

    with_na = pairs.map_batches(tag_pairs("a_id", []),
                                batch_format="pandas") \
        .union(part_counts.map_batches(tag_counts, batch_format="pandas")) \
        .groupby("_b").map_groups(attach("n_a", []), batch_format="pandas")

    def tag_counts_b(df: pd.DataFrame) -> pd.DataFrame:
        out = tag_counts(df)
        out["n_a"] = np.full(len(df), -1, dtype="int64")
        return out

    def tag_pairs_b(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["a_id", "b_id", "n_pair", "n_a"]].copy()
        out["key"] = out["b_id"].astype("int64")
        out["cnt"] = np.full(len(df), -1, dtype="int64")
        out["_b"] = (out["key"] % 64).astype("int64")
        return out

    with_nb = with_na.map_batches(tag_pairs_b, batch_format="pandas") \
        .union(part_counts.map_batches(tag_counts_b,
                                       batch_format="pandas")) \
        .groupby("_b").map_groups(attach("n_b", ["n_a"]),
                                  batch_format="pandas")

    def score(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            cols = ("a_id", "b_id", "n_pair", "n_a", "n_b",
                    "conf_ab_ppm", "conf_ba_ppm", "lift_ppm")
            return pd.DataFrame(
                {x: pd.Series([], dtype="int64") for x in cols})
        out = df.copy()
        # ×10⁶ exceeds int64 once pair counts pass ~9.2e12 — Python big
        # ints here too (numpy would wrap silently where BIGINT errors)
        out["conf_ab_ppm"] = np.array(
            [(int(x) * 1_000_000) // int(a)
             for x, a in zip(out["n_pair"], out["n_a"])], dtype="int64")
        out["conf_ba_ppm"] = np.array(
            [(int(x) * 1_000_000) // int(b)
             for x, b in zip(out["n_pair"], out["n_b"])], dtype="int64")
        # ×N×10⁶ exceeds int64 at web scale — Python big ints (HUGEINT twin)
        out["lift_ppm"] = np.array(
            [(int(p) * n_orders * 1_000_000) // (int(a) * int(b))
             for p, a, b in zip(out["n_pair"], out["n_a"], out["n_b"])],
            dtype="int64")
        return out[["a_id", "b_id", "n_pair", "n_a", "n_b",
                    "conf_ab_ppm", "conf_ba_ppm", "lift_ppm"]]

    out = with_nb.map_batches(score, batch_format="pandas").to_pandas()
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values(["a_id", "b_id"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# k-core peeling over the co-order part graph: rounds of "drop every node
# with degree < k" — the standard community/anchor decomposition.  k is
# data-adaptive (exact quantile_disc(0.25) of initial degree + 1, order
# statistic — 25th percentile, gentle enough not to cascade the whole
# graph away) so the peel is live at every scale factor; the driver gate
# pins THREE peel rounds (the emb_kmeans_iterate fixed-iteration
# contract: an iterative fixpoint made reproducible by pinning rounds).
# ---------------------------------------------------------------------------


def parts_kcore_peel(sf_dir: str, rounds: int = 3,
                     support: int = 2) -> pd.DataFrame:
    """(part, degree, dropped_round) after ``rounds`` peels at
    k = quantile_disc(initial degree, 0.25) + 1; survivors report 0
    and their final degree, peeled nodes the round that removed them.

    Scale shape: k comes from a degree HISTOGRAM (O(distinct degrees) to
    the driver, never O(nodes)); each round the node universe and the
    per-node surviving degrees meet in node-hash buckets and only the
    round's VICTIMS leave the workers; the accumulated peel set
    broadcasts via ``ray.put`` as a sorted int64 array (the exact-dedup
    loser-broadcast shape) and edges filter by searchsorted membership."""
    import ray

    edges = _co_order_edges(sf_dir, support)

    def to_directed(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "node": np.concatenate([df["a_id"].to_numpy(dtype="int64"),
                                    df["b_id"].to_numpy(dtype="int64")]),
            "nbr": np.concatenate([df["b_id"].to_numpy(dtype="int64"),
                                   df["a_id"].to_numpy(dtype="int64")])})
        out["_b"] = (out["node"] % 64).astype("int64")
        return out

    directed = edges.map_batches(to_directed, batch_format="pandas") \
        .materialize()

    def bucket_degs(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("node", as_index=False).size() \
            .rename(columns={"size": "deg"})
        g["_b"] = (g["node"].astype("int64") % 64).astype("int64")
        return g.astype("int64")

    # node universe + initial degrees (bucket-complete, materialized once)
    universe = directed.groupby("_b") \
        .map_groups(bucket_degs, batch_format="pandas").materialize()

    # adaptive k: exact quantile_disc(0.5) + 1 from a degree histogram —
    # O(distinct degree values) to the driver, never O(nodes)
    def deg_hist(df: pd.DataFrame) -> pd.DataFrame:
        u, c = np.unique(df["deg"].to_numpy(dtype="int64"),
                         return_counts=True)
        return pd.DataFrame({"v": u.astype("int64"),
                             "n": c.astype("int64")})

    hist_df = universe.map_batches(deg_hist, batch_format="pandas") \
        .to_pandas()
    if hist_df.empty:  # empty graph: nothing to peel, empty result
        return pd.DataFrame({c: pd.Series([], dtype="int64")
                             for c in ("part", "degree", "dropped_round")})
    hist = hist_df.groupby("v")["n"].sum().sort_index()
    counts = hist.to_numpy(dtype="int64")
    n_nodes = int(counts.sum())
    pos = (n_nodes - 1) // 4  # quantile_disc(0.25): floor(p·(n−1))
    k = int(hist.index.to_numpy(dtype="int64")[
        np.searchsorted(np.cumsum(counts), pos + 1)]) + 1

    dropped: dict[int, int] = {}
    for rnd in range(1, rounds + 1):
        gone = np.sort(np.array(list(dropped), dtype="int64"))
        gone_ref = ray.put(gone)

        def alive_degs(df: pd.DataFrame, _ref=gone_ref) -> pd.DataFrame:
            g = ray.get(_ref)
            node = df["node"].to_numpy(dtype="int64")
            nbr = df["nbr"].to_numpy(dtype="int64")
            if len(g):
                keep = ~(np.isin(node, g) | np.isin(nbr, g))
                node = node[keep]
            p = pd.DataFrame({"node": node}) \
                .groupby("node", as_index=False).size() \
                .rename(columns={"size": "deg"})
            p["kind"] = np.ones(len(p), dtype="int64")
            p["_b"] = (p["node"].astype("int64") % 64).astype("int64")
            return p.astype("int64")

        def tag_universe(df: pd.DataFrame, _ref=gone_ref) -> pd.DataFrame:
            g = ray.get(_ref)
            node = df["node"].to_numpy(dtype="int64")
            if len(g):
                node = node[~np.isin(node, g)]
            return pd.DataFrame({
                "node": node,
                "deg": np.zeros(len(node), dtype="int64"),
                "kind": np.zeros(len(node), dtype="int64"),
                "_b": (node % 64).astype("int64")})

        def victims(df: pd.DataFrame) -> pd.DataFrame:
            # per-node surviving degree (0 when only the universe row
            # exists — every edge vanished), then the k-core rule
            g = df.groupby("node", as_index=False)["deg"].sum()
            v = g[g["deg"] < k][["node"]]
            return v.astype("int64")

        new_victims = directed.map_batches(alive_degs,
                                           batch_format="pandas") \
            .union(universe.map_batches(tag_universe,
                                        batch_format="pandas")) \
            .groupby("_b").map_groups(victims, batch_format="pandas") \
            .to_pandas()
        if new_victims.empty:
            break
        for v in new_victims["node"].tolist():
            dropped[int(v)] = rnd

    gone = np.sort(np.array(list(dropped), dtype="int64"))
    gone_ref = ray.put(gone)

    def final_rows(df: pd.DataFrame, _ref=gone_ref) -> pd.DataFrame:
        g = ray.get(_ref)
        node = df["node"].to_numpy(dtype="int64")
        nbr = df["nbr"].to_numpy(dtype="int64")
        if len(g):
            keep = ~(np.isin(node, g) | np.isin(nbr, g))
            node = node[keep]
        p = pd.DataFrame({"node": node}) \
            .groupby("node", as_index=False).size() \
            .rename(columns={"size": "deg"})
        p["_b"] = (p["node"].astype("int64") % 64).astype("int64")
        return p.astype("int64")

    def merge_final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("node", as_index=False)["deg"].sum() \
            .astype("int64")

    survivors = directed.map_batches(final_rows, batch_format="pandas") \
        .groupby("_b").map_groups(merge_final, batch_format="pandas") \
        .to_pandas()
    if survivors.empty:  # total cascade: every map emitted a schema-less
        survivors = pd.DataFrame({"node": pd.Series([], dtype="int64"),
                                  "deg": pd.Series([], dtype="int64")})
    # final rows come from the NODE UNIVERSE, not the surviving edges: an
    # unpeeled node whose last neighbors died in the final round has zero
    # surviving edges but still belongs in the output with degree 0
    all_nodes = universe.map_batches(
        lambda df: df[["node"]], batch_format="pandas").to_pandas()
    if all_nodes.empty:
        all_nodes = pd.DataFrame({"node": pd.Series([], dtype="int64")})
    deg_map = dict(zip(survivors["node"].astype("int64"),
                       survivors["deg"].astype("int64")))
    node = all_nodes["node"].to_numpy(dtype="int64")
    rows = pd.DataFrame({
        "part": node,
        "degree": pd.Series(node).map(deg_map).fillna(0).astype("int64"),
        "dropped_round": pd.Series(node).map(dropped).fillna(0)
        .astype("int64")})
    rows.loc[rows["dropped_round"] > 0, "degree"] = 0
    for c in rows.columns:
        rows[c] = rows[c].astype("int64")
    return rows.sort_values("part").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Event-sequence validation: per user, count transitions that violate the
# funnel state machine (a purchase must follow a view/click by the SAME
# user — i.e. a purchase whose immediately preceding event is also a
# purchase, or that starts the stream, is invalid).  The standard
# data-quality gate before training on clickstreams.
# ---------------------------------------------------------------------------


def events_invalid_transitions(sf_dir: str) -> pd.DataFrame:
    """(user_id, n_events, n_purchases, n_invalid) per user; n_invalid
    counts purchases NOT preceded by a view or click event.

    Scale shape: users hash-bucket (complete streams per bucket); inside
    a bucket ONE mergesort by (user, ts, event_id) + ONE shifted compare
    classifies every transition — the orders_running_total pattern, no
    per-key Python."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id",
                                  "event_type"])

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["_b"] = (out["user_id"].astype("int64") % 64).astype("int64")
        return out

    def bucket_scan(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort").reset_index(drop=True)
        uid = df["user_id"].to_numpy(dtype="int64")
        et = df["event_type"].to_numpy(dtype=object)
        is_purchase = et == "purchase"
        prev_ok = np.concatenate(
            [[False], (et[:-1] == "view") | (et[:-1] == "click")])
        same_user = np.concatenate([[False], uid[1:] == uid[:-1]])
        invalid = is_purchase & ~(prev_ok & same_user)
        g = pd.DataFrame({
            "user_id": uid,
            "one": np.ones(len(df), dtype="int64"),
            "pur": is_purchase.astype("int64"),
            "inv": invalid.astype("int64")}) \
            .groupby("user_id", as_index=False).sum()
        return pd.DataFrame({
            "user_id": g["user_id"].astype("int64"),
            "n_events": g["one"].astype("int64"),
            "n_purchases": g["pur"].astype("int64"),
            "n_invalid": g["inv"].astype("int64")})

    out = ds.map_batches(keyed, batch_format="pandas") \
        .groupby("_b").map_groups(bucket_scan, batch_format="pandas") \
        .to_pandas()
    if out.empty:
        return pd.DataFrame({c: pd.Series([], dtype="int64") for c in (
            "user_id", "n_events", "n_purchases", "n_invalid")})
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# minimum spanning forest of the weighted co-order graph (Borůvka)
# ---------------------------------------------------------------------------

# components at least halve per round, so 64 rounds cover 2^64 nodes —
# a safety backstop, not a truncation point (exhaustion raises)
_MST_MAX_ROUNDS = 64


def parts_mst(sf_dir: str, support: int = 2) -> pd.DataFrame:
    """Minimum spanning FOREST of the weighted co-order part graph
    (edge cost = ``1_000_000 // n_pair``, the parts_sssp convention;
    ties broken by the TOTAL order ``(w, u, v)``, which makes the MSF
    unique) via distributed BORŮVKA: each round every component selects
    its minimum outgoing edge under the total order, selected edges
    contract components, and the loop ends when no cross-component edge
    remains.  Returns the forest's (u, v, w) rows sorted by (u, v).

    Scale shape: per round, component labels attach to edge endpoints
    through two hash-shuffle ``Dataset.join``s against the node-keyed
    comp table (never a broadcast NODE map); per-component minima finish
    under comp-hash buckets, so at most ONE row per surviving component
    — i.e. a slice of the OUTPUT, which is what the driver must hold
    anyway — leaves the workers per round; the round's contraction
    (union-find over ≤ #components selected edges) therefore runs on the
    driver at output scale, and the comp table relabels via a broadcast
    sorted old→new label array (the parts_kcore_peel loser-broadcast
    shape, geometrically shrinking after round 1).  Components at least
    halve per round, so rounds ≤ log₂(max component size).  Intra-
    component edges are dropped for good each round, so the edge scan
    shrinks monotonically.

    Oracle: an INDEPENDENT sequential Kruskal
    (tools/gen_pinned_oracles.gen_mst_expected) pinned per corpus —
    Borůvka and Kruskal agree exactly because the edge order is total."""
    import ray

    edge_schema = pa.schema([("u", pa.int64()), ("v", pa.int64()),
                             ("w", pa.int64())])
    comp_schema = pa.schema([("node", pa.int64()), ("comp", pa.int64())])

    def weighted(df: pd.DataFrame) -> pa.Table:
        out = pd.DataFrame({
            "u": df["a_id"].astype("int64"),
            "v": df["b_id"].astype("int64"),
            "w": (1_000_000 // df["n_pair"].astype("int64"))
            .astype("int64")})
        return pa.Table.from_pandas(out, schema=edge_schema,
                                    preserve_index=False)

    edges = _co_order_pair_counts(sf_dir, support) \
        .map_batches(weighted, batch_format="pandas").materialize()
    cols = ("u", "v", "w")
    if edges.count() == 0:
        return pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})

    def node_rows(df: pd.DataFrame) -> pd.DataFrame:
        nodes = np.unique(np.concatenate([
            df["u"].to_numpy(dtype="int64"),
            df["v"].to_numpy(dtype="int64")]))
        return pd.DataFrame({"node": nodes,
                             "_b": (nodes % 64).astype("int64")})

    def node_dedup(df: pd.DataFrame) -> pa.Table:
        nodes = df["node"].drop_duplicates().astype("int64")
        out = pd.DataFrame({"node": nodes, "comp": nodes})
        return pa.Table.from_pandas(out, schema=comp_schema,
                                    preserve_index=False)

    comp = edges.map_batches(node_rows, batch_format="pandas") \
        .groupby("_b").map_groups(node_dedup, batch_format="pandas") \
        .materialize()

    lab_schema = pa.schema([("u", pa.int64()), ("v", pa.int64()),
                            ("w", pa.int64()), ("cu", pa.int64()),
                            ("cv", pa.int64())])

    def strip_u(df: pd.DataFrame) -> pa.Table:
        out = pd.DataFrame({"u": df["u"].astype("int64"),
                            "v": df["v"].astype("int64"),
                            "w": df["w"].astype("int64"),
                            "cu": df["comp"].astype("int64")})
        return pa.Table.from_pandas(out, schema=pa.schema(
            [("u", pa.int64()), ("v", pa.int64()), ("w", pa.int64()),
             ("cu", pa.int64())]), preserve_index=False)

    def strip_v(df: pd.DataFrame) -> pa.Table:
        out = pd.DataFrame({"u": df["u"].astype("int64"),
                            "v": df["v"].astype("int64"),
                            "w": df["w"].astype("int64"),
                            "cu": df["cu"].astype("int64"),
                            "cv": df["comp"].astype("int64")})
        out = out[out["cu"] != out["cv"]]
        return pa.Table.from_pandas(out, schema=lab_schema,
                                    preserve_index=False)

    def tag_comps(df: pd.DataFrame) -> pd.DataFrame:
        a = df[["cu", "w", "u", "v", "cv"]].rename(columns={"cu": "c",
                                                            "cv": "co"})
        b = df[["cv", "w", "u", "v", "cu"]].rename(columns={"cv": "c",
                                                            "cu": "co"})
        out = pd.concat([a, b], ignore_index=True)
        out["_b"] = (out["c"] % 64).astype("int64")
        return out

    def comp_min(df: pd.DataFrame) -> pd.DataFrame:
        out = df.sort_values(["w", "u", "v"], kind="mergesort") \
            .drop_duplicates("c")
        return out[["c", "co", "u", "v", "w"]].astype("int64")

    sel_frames: list = []
    cur = edges
    n_edges = cur.count()
    converged = False
    for _ in range(_MST_MAX_ROUNDS):
        n_join = max(1, min(32, n_edges // 10_000 + 1))
        lab = cur.join(comp, join_type="inner", num_partitions=n_join,
                       on=("u",), right_on=("node",)) \
            .map_batches(strip_u, batch_format="pandas") \
            .join(comp, join_type="inner", num_partitions=n_join,
                  on=("v",), right_on=("node",)) \
            .map_batches(strip_v, batch_format="pandas").materialize()
        n_edges = lab.count()
        if n_edges == 0:
            converged = True
            break
        sel = lab.map_batches(tag_comps, batch_format="pandas") \
            .groupby("_b").map_groups(comp_min, batch_format="pandas") \
            .to_pandas()
        sel_frames.append(sel[["u", "v", "w"]].drop_duplicates(["u", "v"]))

        # output-scale contraction: union-find over the selected edges
        parent: dict = {}

        def find(x: int) -> int:
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:
                parent[x], x = r, parent[x]
            return r

        for c1, c2 in zip(sel["c"], sel["co"]):
            r1, r2 = find(int(c1)), find(int(c2))
            if r1 != r2:
                # min label wins so comp labels stay stable/deterministic
                lo2, hi2 = (r1, r2) if r1 < r2 else (r2, r1)
                parent[hi2] = lo2
        relabel = {c: find(c) for c in parent}
        old = np.sort(np.asarray(list(relabel), dtype="int64"))
        new = np.asarray([relabel[int(o)] for o in old], dtype="int64")
        old_ref = ray.put(old)
        new_ref = ray.put(new)

        def relabel_comp(df: pd.DataFrame) -> pa.Table:
            o = ray.get(old_ref)
            nw = ray.get(new_ref)
            c = df["comp"].to_numpy(dtype="int64")
            pos = np.searchsorted(o, c)
            hit = (pos < len(o))
            hit[hit] = o[pos[hit]] == c[hit]
            c = c.copy()
            c[hit] = nw[pos[hit]]
            out = pd.DataFrame({"node": df["node"].astype("int64"),
                                "comp": c})
            return pa.Table.from_pandas(out, schema=comp_schema,
                                        preserve_index=False)

        comp = comp.map_batches(relabel_comp,
                                batch_format="pandas").materialize()
        cur = lab.map_batches(
            lambda df: pa.Table.from_pandas(
                df[["u", "v", "w"]].astype("int64"), schema=edge_schema,
                preserve_index=False),
            batch_format="pandas")

    if not converged:
        # never return a silently incomplete forest — halving components
        # can't need 64 rounds, so this only fires on a logic regression
        raise RuntimeError(
            f"parts_mst: cross-component edges remain after "
            f"{_MST_MAX_ROUNDS} Borůvka rounds")
    if not sel_frames:
        return pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})
    out = pd.concat(sel_frames, ignore_index=True) \
        .drop_duplicates(["u", "v"]).astype("int64")
    return out.sort_values(["u", "v"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# per-node local clustering coefficient over the co-order part graph
# ---------------------------------------------------------------------------


def parts_clustering_coeff(sf_dir: str, support: int = 2) -> pd.DataFrame:
    """(part_id, degree, n_tri, coeff_ppm) for every part of co-order
    degree ≥ 2: the local clustering coefficient
    ``coeff_ppm = (2_000_000 * n_tri) // (degree * (degree - 1))`` over
    the graph whose edges are part pairs co-ordered in ≥ ``support``
    distinct orders.

    Scale shape: edges reuse the market-basket pair kernel
    (:func:`_co_order_pair_counts`) and are MATERIALIZED once for three
    consumers (degree partials, wedge generation, triangle confirmation).
    Wedges are oriented at the triangle's MIN vertex — the
    ``parts_triangles`` enumeration bound — but CARRY their center so a
    confirmed triangle credits all three corners; confirmation is an
    exact multi-key ``Dataset.join`` of wedges against edges, never a
    broadcast edge set.  Degree and triangle partials are tagged rows of
    one union that meets in node-hash buckets for the final integer
    ratio, so only per-bucket node partials ever move."""
    # pin explicit Arrow schemas on every block feeding the hash-shuffle
    # join: a tiny graph leaves some hash partitions EMPTY and an empty
    # pandas block loses its key dtypes, crashing the per-partition
    # pyarrow join (see NOTES_r2 sharp edges)
    edge_schema = pa.schema([("u", pa.int64()), ("v", pa.int64())])
    wedge_schema = pa.schema([("c", pa.int64()), ("y", pa.int64()),
                              ("z", pa.int64())])

    def project_edges(df: pd.DataFrame) -> pa.Table:
        out = pd.DataFrame({"u": df["a_id"].astype("int64"),
                            "v": df["b_id"].astype("int64")})
        return pa.Table.from_pandas(out, schema=edge_schema,
                                    preserve_index=False)

    edges = _co_order_pair_counts(sf_dir, support) \
        .map_batches(project_edges, batch_format="pandas").materialize()
    cols = ("part_id", "degree", "n_tri", "coeff_ppm")
    if edges.count() == 0:
        return pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})

    def degree_partial(df: pd.DataFrame) -> pd.DataFrame:
        nodes = np.concatenate([df["u"].to_numpy(dtype="int64"),
                                df["v"].to_numpy(dtype="int64")])
        g = pd.Series(nodes, dtype="int64").value_counts()
        out = pd.DataFrame({"node": g.index.to_numpy(dtype="int64"),
                            "deg": g.to_numpy(dtype="int64")})
        out["tri"] = np.zeros(len(out), dtype="int64")
        out["_n"] = (out["node"] % 64).astype("int64")
        return out

    def bucket_u(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_u"] = (df["u"] % 64).astype("int64")
        return df

    def gen_wedges(df: pd.DataFrame) -> pa.Table:
        m = df.merge(df, on="u")
        m = m[m["v_x"] < m["v_y"]]
        out = pd.DataFrame({"c": m["u"].astype("int64"),
                            "y": m["v_x"].astype("int64"),
                            "z": m["v_y"].astype("int64")})
        return pa.Table.from_pandas(out, schema=wedge_schema,
                                    preserve_index=False)

    parts = [edges.map_batches(degree_partial, batch_format="pandas")]

    wedges = edges.map_batches(bucket_u, batch_format="pandas") \
        .groupby("_u").map_groups(gen_wedges, batch_format="pandas") \
        .materialize()
    if wedges.count() > 0:
        # size the exchange to the data: a tiny wedge set spread over
        # fixed partitions leaves empties that crash the pyarrow join
        n_parts = _join_partitions(sf_dir, "lineitem", selectivity=0.05,
                                   cap=16)
        tri = wedges.join(edges, join_type="inner",
                          num_partitions=n_parts,
                          on=("y", "z"), right_on=("u", "v"))

        def tri_partial(df: pd.DataFrame) -> pd.DataFrame:
            if len(df) == 0:
                return pd.DataFrame({c: pd.Series([], dtype="int64")
                                     for c in ("node", "deg", "tri", "_n")})
            nodes = np.concatenate([df["c"].to_numpy(dtype="int64"),
                                    df["y"].to_numpy(dtype="int64"),
                                    df["z"].to_numpy(dtype="int64")])
            g = pd.Series(nodes, dtype="int64").value_counts()
            out = pd.DataFrame({"node": g.index.to_numpy(dtype="int64"),
                                "tri": g.to_numpy(dtype="int64")})
            out["deg"] = np.zeros(len(out), dtype="int64")
            out["_n"] = (out["node"] % 64).astype("int64")
            return out[["node", "deg", "tri", "_n"]]

        parts.append(tri.map_batches(tri_partial, batch_format="pandas"))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("node", as_index=False)[["deg", "tri"]].sum()
        g = g[g["deg"] >= 2]
        if len(g) == 0:
            return pd.DataFrame({c: pd.Series([], dtype="int64")
                                 for c in cols})
        # Python-int ratio: 2e6 × tri can pass int64 on a web-scale hub
        # node (tri grows with degree²) — the HUGEINT-safe ppm contract
        coeff = [(2_000_000 * int(t)) // (int(d) * (int(d) - 1))
                 for d, t in zip(g["deg"], g["tri"])]
        return pd.DataFrame({
            "part_id": g["node"].astype("int64"),
            "degree": g["deg"].astype("int64"),
            "n_tri": g["tri"].astype("int64"),
            "coeff_ppm": pd.Series(coeff, dtype="int64").to_numpy()})

    merged = parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])
    out = merged.groupby("_n").map_groups(finish, batch_format="pandas") \
        .to_pandas()
    if out.empty:
        return pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})
    out = out[list(cols)]
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("part_id").reset_index(drop=True)


def events_kaplan_meier(sf_dir: str) -> pd.DataFrame:
    """Kaplan–Meier survival curve for view→purchase conversion with
    right-censoring: the cohort is every user with a first 'view' whose
    first 'purchase' (if any) is at-or-after it; converting users die at
    the whole-minute lag between the two firsts, non-converters are
    censored at the corpus MAX(ts).  One output row per distinct death
    time — (t_min, n_risk, n_events, surv_ppm) — where the survival
    estimate is the standard product-limit recurrence kept in exact ppm
    with per-step truncation: S_i = S_{i-1}·(n_i−d_i) // n_i, S_0=10⁶.

    Scale shape: one bounded-partial pass finds the censoring anchor;
    per-block (user, first-view, first-purchase) min partials finish
    under the 64-way user-hash bucket, and each bucket emits its
    (t, death/censor) COUNT histogram — so the driver merges at most
    |distinct times|×2×64 integer rows, never per-user rows, and runs
    the O(|distinct death times|) recurrence locally (the bounded-final
    contract of orders_changepoint).  Reference parity: survival readout
    over the same first-event semantics as events_conversion_lag
    (reference analytics/report.py aggregates)."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

    def ts_max(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"m": pd.Series([], dtype="datetime64[ns]")})
        return pd.DataFrame({"m": [df["ts"].max()]})

    cols = ("t_min", "n_risk", "n_events", "surv_ppm")
    mx = ds.map_batches(ts_max, batch_format="pandas").to_pandas()
    if mx.empty:
        return pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})
    anchor_us = int(np.datetime64(mx["m"].max(), "us").astype("int64"))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        pcols = {"user_id": pd.Series([], dtype="int64"),
                 "fv": pd.Series([], dtype="int64"),
                 "fp": pd.Series([], dtype="int64"),
                 "_b": pd.Series([], dtype="int64")}
        df = df[df["event_type"].isin(("view", "purchase"))]
        if len(df) == 0:
            return pd.DataFrame(pcols)
        us = df["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        g = pd.DataFrame({
            "user_id": df["user_id"].astype("int64").to_numpy(),
            "fv": np.where(df["event_type"].to_numpy() == "view",
                           us, np.int64(2**62)),
            "fp": np.where(df["event_type"].to_numpy() == "purchase",
                           us, np.int64(2**62))}) \
            .groupby("user_id", as_index=False).min()
        g["_b"] = (g["user_id"] % 64).astype("int64")
        return g

    def bucket_hist(df: pd.DataFrame) -> pd.DataFrame:
        hcols = {"t": pd.Series([], dtype="int64"),
                 "death": pd.Series([], dtype="int64"),
                 "n": pd.Series([], dtype="int64")}
        g = df.groupby("user_id", as_index=False)[["fv", "fp"]].min()
        sent = np.int64(2**62)
        g = g[g["fv"] < sent]
        if len(g) == 0:
            return pd.DataFrame(hcols)
        has_p = g["fp"].to_numpy() < sent
        fv = g["fv"].to_numpy()
        fp = g["fp"].to_numpy()
        keep = ~has_p | (fp >= fv)
        fv, fp, has_p = fv[keep], fp[keep], has_p[keep]
        if len(fv) == 0:
            return pd.DataFrame(hcols)
        t = np.where(has_p, (fp - fv) // 60_000_000,
                     (anchor_us - fv) // 60_000_000).astype("int64")
        h = pd.DataFrame({"t": t, "death": has_p.astype("int64"),
                          "n": np.ones(len(t), dtype="int64")}) \
            .groupby(["t", "death"], as_index=False).sum()
        return h

    hist = ds.map_batches(partial, batch_format="pandas") \
        .groupby("_b").map_groups(bucket_hist, batch_format="pandas") \
        .to_pandas()
    if hist.empty or "t" not in hist.columns:
        return pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})
    hist = hist.groupby(["t", "death"], as_index=False)["n"].sum()
    # at-risk(t) = cohort members with event-or-censor time >= t:
    # suffix sums over times sorted descending
    times = np.sort(hist["t"].unique())
    total_at = hist.groupby("t")["n"].sum().reindex(times, fill_value=0) \
        .to_numpy(dtype="int64")
    deaths_at = hist[hist["death"] == 1].groupby("t")["n"].sum() \
        .reindex(times, fill_value=0).to_numpy(dtype="int64")
    n_risk_all = total_at[::-1].cumsum()[::-1]
    rows = []
    s = 1_000_000
    for t, n_i, d_i in zip(times, n_risk_all, deaths_at):
        if d_i == 0:
            continue
        s = (s * (int(n_i) - int(d_i))) // int(n_i)
        rows.append((int(t), int(n_i), int(d_i), s))
    if not rows:
        return pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})
    out = pd.DataFrame(rows, columns=list(cols))
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("t_min").reset_index(drop=True)


def events_autocorr(sf_dir: str, max_lag: int = 7) -> pd.DataFrame:
    """Autocorrelation function of the daily event-count series at lags
    1..``max_lag``: one row (lag, n_days, r_ppm) per lag that has at
    least one pair.  The series is gap-filled with zeros over the
    contiguous calendar range so the lag spacing is uniform, and the
    Pearson numerator/denominator use exact integer centering — with
    S = Σx the centered value is e_t = n·x_t − S (the n² factors cancel
    in the ratio), so num_k = Σ e_t·e_{t+k} and den = Σ e_t² are exact
    integers with no float mean to pin.  r_ppm = 10⁶·num_k trunc-div
    den (sign-aware: DuckDB ``//`` truncates toward zero); a constant
    series (den = 0) pins every lag to 0.

    Scale shape: per-block per-day count partials reduce a web-scale
    event log to at most |calendar days| × blocks integer rows; the
    driver merges them and runs the O(max_lag·n_days) ACF locally with
    Python big-ints (the bounded-calendar final contract of
    orders_changepoint — HUGEINT-safe at any event volume)."""
    ds = _read(sf_dir, "events", ["ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"day": pd.Series([], dtype="int64"),
                                 "x": pd.Series([], dtype="int64")})
        days = df["ts"].to_numpy().astype("datetime64[D]").astype("int64")
        g = pd.DataFrame({"day": days,
                          "x": np.ones(len(days), dtype="int64")}) \
            .groupby("day", as_index=False).sum()
        return g

    cols = ("lag", "n_days", "r_ppm")
    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if parts.empty:
        return pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})
    g = parts.groupby("day")["x"].sum()
    lo, hi = int(g.index.min()), int(g.index.max())
    x = np.zeros(hi - lo + 1, dtype="int64")
    x[g.index.to_numpy(dtype="int64") - lo] = g.to_numpy(dtype="int64")
    n = len(x)
    s_tot = int(x.sum())
    e = [n * int(v) - s_tot for v in x]
    den = sum(v * v for v in e)

    def tdiv(a: int, b: int) -> int:
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    rows = []
    for k in range(1, max_lag + 1):
        if n - k <= 0:
            break
        num = sum(e[i] * e[i + k] for i in range(n - k))
        r = 0 if den == 0 else tdiv(1_000_000 * num, den)
        rows.append((k, n, r))
    if not rows:
        return pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})
    out = pd.DataFrame(rows, columns=list(cols))
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def orders_holt_forecast(sf_dir: str) -> pd.DataFrame:
    """Holt linear-trend exponential smoothing over the observed monthly
    revenue series, kept exactly integer: with α=0.2 and β=0.1 in
    tenths, level l_t = (2·y_t + 8·(l_{t-1}+b_{t-1})) trunc-div 10 and
    trend b_t = ((l_t − l_{t-1}) + 9·b_{t-1}) trunc-div 10, initialised
    at l_1 = y_1, b_1 = 0.  Every division truncates toward zero
    (DuckDB ``//``; the level delta and trend go negative on a falling
    series).  One row per month — (month, revenue_cents, level_cents,
    trend_cents, fc1_cents) — where fc1 = l_t + b_t is the one-step-
    ahead forecast made at t (the last row's fc1 is the out-of-sample
    next-month forecast).

    Scale shape: the fact stream collapses to per-month cent partials
    inside ``map_batches`` (the orders_monthly_growth pattern); the
    recurrence runs over the BOUNDED month calendar on the driver with
    Python big-ints (the orders_seasonal_decompose final contract)."""
    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "month": pd.Series([], dtype="datetime64[ns]"),
                "cents": pd.Series([], dtype="int64")})
        df = df.copy()
        df["month"] = df["o_orderdate"].dt.to_period("M").dt.to_timestamp()
        df["cents"] = np.floor(
            df["o_totalprice"].to_numpy() * 100 + 0.5).astype("int64")
        return df.groupby("month", as_index=False)["cents"].sum()

    def empty() -> pd.DataFrame:
        return pd.DataFrame({
            "month": pd.Series([], dtype="datetime64[ns]"),
            "revenue_cents": pd.Series([], dtype="int64"),
            "level_cents": pd.Series([], dtype="int64"),
            "trend_cents": pd.Series([], dtype="int64"),
            "fc1_cents": pd.Series([], dtype="int64")})

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if parts.empty:
        return empty()
    m = parts.groupby("month", as_index=False)["cents"].sum() \
        .sort_values("month").reset_index(drop=True)

    def tdiv(a: int, b: int) -> int:
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    rows = []
    l = b = 0
    for i, (month, y) in enumerate(zip(m["month"], m["cents"])):
        y = int(y)
        if i == 0:
            l, b = y, 0
        else:
            l_new = tdiv(2 * y + 8 * (l + b), 10)
            b = tdiv((l_new - l) + 9 * b, 10)
            l = l_new
        rows.append((month, y, l, b, l + b))
    out = pd.DataFrame(rows, columns=["month", "revenue_cents",
                                      "level_cents", "trend_cents",
                                      "fc1_cents"])
    for c in out.columns[1:]:
        out[c] = out[c].astype("int64")
    return out


# ---------------------------------------------------------------------------
# Benford first-digit audit: the classic anomaly screen a data-quality
# tier runs over monetary fact columns — observed first-significant-digit
# shares vs the Benford expectation, integer ppm throughout
# ---------------------------------------------------------------------------

# floor(1e6 * log10(1 + 1/d)) for d = 1..9, pinned as literals so the
# engine and the SQL twin share one source of truth (no float log10 at
# query time on either side)
_BENFORD_PPM = {1: 301029, 2: 176091, 3: 124938, 4: 96910, 5: 79181,
                6: 66946, 7: 57991, 8: 51152, 9: 45757}


def orders_benford(sf_dir: str) -> pd.DataFrame:
    """First-significant-digit census of order totals: one row per digit
    that OCCURS (matching the SQL GROUP BY — absent digits are absent,
    not zero-filled) with (digit, n_orders, obs_ppm, benford_ppm,
    delta_ppm), obs_ppm = 10⁶·n // total and delta_ppm its deviation
    from the pinned Benford expectation.

    Totals are first made integer cents (``FLOOR(p·100 + 0.5)``, the
    corpus-wide cent contract), so the first digit is exact — never a
    float-formatting artifact.

    Scale shape: per-batch digit histograms (≤9 rows each) merge on the
    driver; the fact table never leaves ``map_batches``."""
    ds = _read(sf_dir, "orders", ["o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"digit": pd.Series([], dtype="int64"),
                              "n": pd.Series([], dtype="int64")})
        if len(df) == 0 or "o_totalprice" not in df.columns:
            return empty
        cents = np.floor(
            df["o_totalprice"].to_numpy() * 100 + 0.5).astype("int64")
        # first significant digit via integer magnitude reduction —
        # vectorized, no string round trip
        mag = np.ones_like(cents)
        while True:
            nxt = mag * 10
            grow = nxt <= cents
            if not grow.any():
                break
            mag[grow] = nxt[grow]
        digit = cents // mag
        out = pd.DataFrame({"digit": digit}).groupby(
            "digit", as_index=False).size().rename(columns={"size": "n"})
        return out.astype("int64")

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    empty = pd.DataFrame({"digit": pd.Series([], dtype="int64"),
                          "n_orders": pd.Series([], dtype="int64"),
                          "obs_ppm": pd.Series([], dtype="int64"),
                          "benford_ppm": pd.Series([], dtype="int64"),
                          "delta_ppm": pd.Series([], dtype="int64")})
    if parts.empty or "digit" not in parts.columns:
        return empty
    m = parts.groupby("digit", as_index=False)["n"].sum()
    total = int(m["n"].sum())
    if total == 0:
        return empty
    out = pd.DataFrame({
        "digit": m["digit"].astype("int64"),
        "n_orders": m["n"].astype("int64")})
    out["obs_ppm"] = (1_000_000 * out["n_orders"] // total).astype("int64")
    out["benford_ppm"] = out["digit"].map(_BENFORD_PPM).astype("int64")
    out["delta_ppm"] = (out["obs_ppm"] - out["benford_ppm"]).astype("int64")
    return out.sort_values("digit").reset_index(drop=True)


# ---------------------------------------------------------------------------
# degree assortativity of the co-order part graph: do high-degree parts
# co-order with other high-degree parts?  Pearson r over the directed
# edge-endpoint degree pairs, exact integer moments
# ---------------------------------------------------------------------------


def parts_degree_assortativity(sf_dir: str, support: int = 2) -> pd.DataFrame:
    """One row — (n_edges, sum_jk, sum_j, sum_j2, r_ppm) — where the sums
    run over the 2E DIRECTED orientations of the co-order edges
    (:func:`_co_order_pair_counts`, co-ordered in ≥ ``support`` orders),
    j/k are endpoint degrees, and

        r_ppm = 10⁶ · (M·Σjk − (Σj)²)  trunc-div  (M·Σj² − (Σj)²),

    M = 2E (the standard Newman assortativity with the half-factors
    cleared; the denominator is a variance so only the numerator can go
    negative — trunc-toward-zero matches DuckDB ``//``).  An empty graph
    yields zero rows (the SQL twin's ``HAVING COUNT(*) > 0``).

    Scale shape: degrees are exact per node-hash bucket; each bucket then
    re-keys its half-edges by NEIGHBOR and a second bucketed pass (a
    tagged union of degree rows and half-edge rows, co-partitioned on the
    same key) attaches the neighbor degree and reduces to ONE moment
    partial per bucket — two bounded exchanges, no driver-side maps.
    Partial moments travel as decimal strings so a web-scale graph can't
    overflow int64 between stages; the driver folds 64 such rows with
    Python big-ints."""
    edges = _co_order_pair_counts(sf_dir, support)
    empty = pd.DataFrame({"n_edges": pd.Series([], dtype="int64"),
                          "sum_jk": pd.Series([], dtype="int64"),
                          "sum_j": pd.Series([], dtype="int64"),
                          "sum_j2": pd.Series([], dtype="int64"),
                          "r_ppm": pd.Series([], dtype="int64")})

    def to_directed(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "a_id" not in df.columns:
            return pd.DataFrame({"node": pd.Series([], dtype="int64"),
                                 "nbr": pd.Series([], dtype="int64"),
                                 "_b": pd.Series([], dtype="int64")})
        out = pd.DataFrame({
            "node": np.concatenate([df["a_id"].to_numpy(dtype="int64"),
                                    df["b_id"].to_numpy(dtype="int64")]),
            "nbr": np.concatenate([df["b_id"].to_numpy(dtype="int64"),
                                   df["a_id"].to_numpy(dtype="int64")])})
        out["_b"] = (out["node"] % 64).astype("int64")
        return out

    # pass A (node buckets hold ALL of a node's half-edges → exact deg):
    # emit tag=0 degree rows keyed by the node itself and tag=1 half-edge
    # rows keyed by the NEIGHBOR, carrying j = deg(node)
    def emit_keyed(df: pd.DataFrame) -> pd.DataFrame:
        empty_k = pd.DataFrame({"key": pd.Series([], dtype="int64"),
                                "j": pd.Series([], dtype="int64"),
                                "tag": pd.Series([], dtype="int64"),
                                "_b2": pd.Series([], dtype="int64")})
        if len(df) == 0 or "node" not in df.columns:
            return empty_k
        deg = df.groupby("node")["nbr"].size()
        d_rows = pd.DataFrame({"key": deg.index.to_numpy(dtype="int64"),
                               "j": deg.to_numpy(dtype="int64"),
                               "tag": np.int64(0)})
        h_rows = pd.DataFrame({"key": df["nbr"].to_numpy(dtype="int64"),
                               "j": df["node"].map(deg).to_numpy(
                                   dtype="int64"),
                               "tag": np.int64(1)})
        out = pd.concat([d_rows, h_rows], ignore_index=True)
        out["_b2"] = (out["key"] % 64).astype("int64")
        return out.astype("int64")

    # pass B: attach k = deg(key) to each half-edge, reduce to one moment
    # partial per bucket (decimal strings — int64-overflow-proof)
    def moment_partial(df: pd.DataFrame) -> pd.DataFrame:
        empty_m = pd.DataFrame({"cnt": pd.Series([], dtype="int64"),
                                "s_jk": pd.Series([], dtype=object),
                                "s_j": pd.Series([], dtype=object),
                                "s_j2": pd.Series([], dtype=object)})
        if len(df) == 0 or "tag" not in df.columns:
            return empty_m
        degmap = df[df["tag"] == 0].set_index("key")["j"]
        he = df[df["tag"] == 1]
        if len(he) == 0:
            return empty_m
        j = he["j"].to_numpy(dtype="int64")
        k = he["key"].map(degmap).to_numpy(dtype="int64")
        s_jk = sum(int(a) * int(b) for a, b in zip(j, k))
        s_j = int(j.sum())
        s_j2 = sum(int(a) * int(a) for a in j)
        return pd.DataFrame({"cnt": [np.int64(len(he))],
                             "s_jk": [str(s_jk)], "s_j": [str(s_j)],
                             "s_j2": [str(s_j2)]})

    parts = edges.map_batches(to_directed, batch_format="pandas") \
        .groupby("_b").map_groups(emit_keyed, batch_format="pandas") \
        .groupby("_b2").map_groups(moment_partial, batch_format="pandas") \
        .to_pandas()
    if parts.empty or "cnt" not in parts.columns or parts["cnt"].sum() == 0:
        return empty

    m_ends = int(parts["cnt"].sum())
    a = sum(int(x) for x in parts["s_jk"])
    b = sum(int(x) for x in parts["s_j"])
    c = sum(int(x) for x in parts["s_j2"])
    num = m_ends * a - b * b
    den = m_ends * c - b * b

    def tdiv(x: int, y: int) -> int:
        q = abs(x) // abs(y)
        return q if (x >= 0) == (y >= 0) else -q

    r_ppm = 0 if den == 0 else tdiv(1_000_000 * num, den)
    return pd.DataFrame({"n_edges": [np.int64(m_ends // 2)],
                         "sum_jk": [np.int64(a)],
                         "sum_j": [np.int64(b)],
                         "sum_j2": [np.int64(c)],
                         "r_ppm": [np.int64(r_ppm)]})


# ---------------------------------------------------------------------------
# Theil–Sen robust trend estimator over monthly revenue: the slope is the
# MEDIAN of all pairwise slopes — a single outlier month that would drag an
# OLS fit (events_linreg) moves a Theil–Sen fit by at most one order
# statistic.  Reference parity: new-capability operator (time-series family
# alongside orders_holt_forecast / orders_changepoint).
# ---------------------------------------------------------------------------


def orders_theil_sen(sf_dir: str) -> pd.DataFrame:
    """Theil–Sen trend over monthly revenue, integer tenths of a cent.

    x = year·12 + month (calendar gaps WIDEN the pair denominator rather
    than being silently ignored), rev = monthly cents.  slope =
    quantile_disc(0.5) over the C(n,2) pairwise slopes
    ``(rev_j − rev_i)·10 trunc-div (x_j − x_i)``; intercept =
    quantile_disc(0.5) over ``rev_i·10 − slope·x_i``.  Both divisions
    truncate toward zero (DuckDB ``//``), and quantile_disc is the
    ceil(q·n)−1 order statistic on the ascending sort (the
    events_conversion_lag contract).  Fewer than two observed months →
    empty frame (the SQL twin's ``n_pairs > 0`` guard).

    Scale shape: the fact stream collapses to per-month cent partials
    inside ``map_batches`` (the monthly-growth pattern); the pair
    enumeration then runs over the BOUNDED month calendar on the driver —
    O(#months²) integer work on ≤ a-few-hundred months, no data motion."""
    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"x": pd.Series([], dtype="int64"),
                                 "cents": pd.Series([], dtype="int64")})
        df = df.copy()
        df["x"] = (df["o_orderdate"].dt.year * 12
                   + df["o_orderdate"].dt.month).astype("int64")
        df["cents"] = np.floor(
            df["o_totalprice"].to_numpy() * 100 + 0.5).astype("int64")
        return df.groupby("x", as_index=False)["cents"].sum()

    cols = ("n_months", "n_pairs", "slope_tenths", "intercept_tenths")
    empty = pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})
    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if parts.empty:
        return empty
    m = parts.groupby("x", as_index=False)["cents"].sum() \
        .sort_values("x").reset_index(drop=True)
    n = len(m)
    if n < 2:
        return empty
    x = m["x"].to_numpy(dtype="int64")
    rev = m["cents"].to_numpy(dtype="int64")
    i, j = np.triu_indices(n, k=1)
    num = (rev[j] - rev[i]) * 10
    den = x[j] - x[i]  # > 0 (strictly increasing months)
    # DuckDB // truncates toward zero; Python floors — match DuckDB
    slopes = np.sign(num) * (np.abs(num) // den)

    def q_disc(v: np.ndarray) -> int:
        # quantile_disc(0.5): ceil(0.5·n)−1 index on the ascending sort
        v = np.sort(v)
        return int(v[(len(v) + 1) // 2 - 1])

    slope = q_disc(slopes)
    intercept = q_disc(rev * 10 - slope * x)
    return pd.DataFrame({
        "n_months": pd.Series([n], dtype="int64"),
        "n_pairs": pd.Series([len(slopes)], dtype="int64"),
        "slope_tenths": pd.Series([slope], dtype="int64"),
        "intercept_tenths": pd.Series([intercept], dtype="int64")})


# ---------------------------------------------------------------------------
# two-sample Kolmogorov–Smirnov test over purchase values: the nonparametric
# companion to events_abtest's chi-square — compares the whole value
# DISTRIBUTION between the two md5-split variants, not just a conversion
# rate.  Exact-integer: D is maximised over cross-multiplied cumulative
# counts, so no float CDF ever exists to round.
# ---------------------------------------------------------------------------


def events_ks_test(sf_dir: str) -> pd.DataFrame:
    """Two-sample KS statistic between variant value distributions.

    Users split by ``md5_32(user_id) % 2`` (the events_abtest shared-hash
    convention); samples are purchase-event cents.  Over the ascending
    distinct-cents domain, ``diff(t) = |cA(t)·nB − cB(t)·nA|`` with
    cumulative counts cA/cB — D·nA·nB in exact integers —
    ``d_ppm = 10⁶·max(diff) // (nA·nB)`` and ``at_cents`` is the smallest
    t attaining the max (pinned tie).  Either variant empty → empty frame
    (the SQL twin's marginal guard).  Python big-int / HUGEINT
    intermediates: cA·nB passes int64 long before web scale.

    Scale shape: per-block (cents, variant) histogram partials merge on
    the driver over the bounded price domain (the docs_token_percentiles
    pattern — distinct cents, not rows); the cumulative walk is
    O(distinct values) integer work.  An unbounded continuous domain
    would range-bucket the same partials instead."""
    import hashlib

    ds = _read(sf_dir, "events", ["user_id", "event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"] == "purchase"]
        if len(df) == 0:
            return pd.DataFrame({c: pd.Series([], dtype="int64")
                                 for c in ("cents", "na", "nb")})
        uids = df["user_id"].astype("int64")
        uniq = pd.Series(uids.unique())
        vmap = dict(zip(uniq, uniq.map(lambda u: int(hashlib.md5(
            str(u).encode()).hexdigest()[:8], 16) % 2)))
        variant = uids.map(vmap).to_numpy(dtype="int64")
        cents = np.floor(
            df["value"].to_numpy() * 100 + 0.5).astype("int64")
        g = pd.DataFrame({"cents": cents, "variant": variant}) \
            .groupby(["cents", "variant"]).size().unstack(fill_value=0)
        out = pd.DataFrame({"cents": g.index.to_numpy(dtype="int64")})
        out["na"] = g[0].to_numpy(dtype="int64") if 0 in g.columns \
            else np.zeros(len(g), dtype="int64")
        out["nb"] = g[1].to_numpy(dtype="int64") if 1 in g.columns \
            else np.zeros(len(g), dtype="int64")
        return out

    cols = ("n_a", "n_b", "d_ppm", "at_cents")
    empty = pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})
    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if parts.empty:
        return empty
    h = parts.groupby("cents", as_index=False)[["na", "nb"]].sum() \
        .sort_values("cents").reset_index(drop=True)
    ta = int(h["na"].sum())
    tb = int(h["nb"].sum())
    if ta == 0 or tb == 0:
        return empty
    ca = cb = 0
    best = -1
    at = 0
    for cents, na, nb in zip(h["cents"], h["na"], h["nb"]):
        ca += int(na)
        cb += int(nb)
        diff = abs(ca * tb - cb * ta)
        if diff > best:
            best, at = diff, int(cents)
    return pd.DataFrame({
        "n_a": pd.Series([ta], dtype="int64"),
        "n_b": pd.Series([tb], dtype="int64"),
        "d_ppm": pd.Series([1_000_000 * best // (ta * tb)], dtype="int64"),
        "at_cents": pd.Series([at], dtype="int64")})


# ---------------------------------------------------------------------------
# HITS hubs & authorities over the ORIENTED co-order graph (src < dst, the
# parts_triangles orientation): one full mutual-reinforcement round in
# integer ppm — the eigen-pair companion to parts_pagerank's single
# random-walk eigenvector.
# ---------------------------------------------------------------------------


def parts_hits(sf_dir: str, support: int = 2, k: int = 20) -> pd.DataFrame:
    """One HITS round with max-normalization, exact-integer.

    Edges (src < dst, weight n = distinct co-orders ≥ ``support``).
    auth¹(v) = Σ_{u→v} n (hub⁰ ≡ 1 folded analytically), normalized
    ``auth_ppm = auth¹·10⁶ // max(auth¹)``; hub¹(u) = Σ_{u→v} n·auth_ppm(v),
    normalized the same way.  Output: top-k parts by (auth_ppm DESC,
    part ASC) with their hub_ppm (0 for sink-only parts).  All divisions
    are non-negative floors — no truncation-sign hazard.

    Scale shape: the weighted edge table comes from the shared
    market-basket pair builder (order-hash buckets, pair-hash merge) and
    is MATERIALIZED once — both HITS half-steps stream over it.  auth
    sums reduce under dst-hash buckets; the hub step attaches auth to
    edges with ONE hash-shuffle ``Dataset.join`` on dst and reduces under
    src-hash buckets; the two normalizing maxima are streaming scalar
    aggregates.  Scores stay in node-keyed datasets; the driver merges
    64-way bucket top-k partials (≤ 64·k rows) and the ≤ k hub lookups."""
    edges = _co_order_pair_counts(sf_dir, support).materialize()
    cols = ("part", "auth_ppm", "hub_ppm")
    empty = pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})
    if edges.count() == 0:
        return empty

    def auth_partial(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("b_id", as_index=False)["n_pair"].sum() \
            .rename(columns={"b_id": "node", "n_pair": "a1"})
        out["_d"] = (out["node"] % 64).astype("int64")
        return out

    auth = edges.map_batches(auth_partial, batch_format="pandas") \
        .groupby("_d").map_groups(
            lambda df: df.groupby("node", as_index=False)["a1"].sum(),
            batch_format="pandas").materialize()
    ma = int(auth.max("a1"))

    def auth_norm(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "node": df["node"].astype("int64"),
            "auth_ppm": (df["a1"].astype("int64") * 1_000_000 // ma)
            .astype("int64")})

    authp = auth.map_batches(auth_norm, batch_format="pandas") \
        .materialize()

    n_parts = _join_partitions(sf_dir, "lineitem", selectivity=0.5, cap=16)
    joined = edges.join(authp, join_type="inner",
                        num_partitions=n_parts,
                        on=("b_id",), right_on=("node",))

    def hub_partial(df: pd.DataFrame) -> pd.DataFrame:
        c = df["n_pair"].astype("int64") * df["auth_ppm"].astype("int64")
        out = pd.DataFrame({"node": df["a_id"].astype("int64"), "h": c}) \
            .groupby("node", as_index=False)["h"].sum()
        out["_s"] = (out["node"] % 64).astype("int64")
        return out

    hub = joined.map_batches(hub_partial, batch_format="pandas") \
        .groupby("_s").map_groups(
            lambda df: df.groupby("node", as_index=False)["h"].sum(),
            batch_format="pandas").materialize()
    mh = int(hub.max("h"))

    def top_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["auth_ppm", "node"],
                              ascending=[False, True],
                              kind="mergesort").head(k)

    tops = authp.map_batches(
        lambda df: df.assign(_d=(df["node"] % 64).astype("int64")),
        batch_format="pandas") \
        .groupby("_d").map_groups(top_partial, batch_format="pandas") \
        .to_pandas()
    tops = tops.sort_values(["auth_ppm", "node"],
                            ascending=[False, True],
                            kind="mergesort").head(k)
    want = set(int(x) for x in tops["node"])

    def hub_lookup(df: pd.DataFrame) -> pd.DataFrame:
        out = df[df["node"].isin(want)].copy()
        out["hub_ppm"] = (out["h"].astype("int64") * 1_000_000 // mh) \
            .astype("int64")
        return out[["node", "hub_ppm"]]

    hubs = hub.map_batches(hub_lookup, batch_format="pandas").to_pandas()
    out = tops.merge(hubs, on="node", how="left")
    out["hub_ppm"] = out["hub_ppm"].fillna(0).astype("int64")
    out = out.rename(columns={"node": "part"})
    for c in cols:
        out[c] = out[c].astype("int64")
    return out[list(cols)].reset_index(drop=True)


def orders_rolling_median(sf_dir: str) -> pd.DataFrame:
    """7-row rolling median of daily revenue (ROWS BETWEEN 6 PRECEDING
    AND CURRENT ROW over the OBSERVED day series — calendar gaps are
    rows absent from the window, exactly the SQL frame semantics).  The
    median is quantile_disc's ceil(0.5·n)−1 ascending order statistic
    (the events_conversion_lag contract) — an ORDER-STATISTIC window no
    shift/diff trick can vectorize, unlike the mean in
    events_rolling_avg.

    Scale shape: the fact stream collapses to per-day cent partials in
    ``map_batches`` (the monthly-growth pattern); the rolling walk runs
    over the BOUNDED day calendar on the driver — ≤7-element sorts per
    day, no data motion."""
    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "day": pd.Series([], dtype="datetime64[ns]"),
                "cents": pd.Series([], dtype="int64")})
        df = df.copy()
        df["day"] = df["o_orderdate"].dt.floor("D")
        df["cents"] = np.floor(
            df["o_totalprice"].to_numpy() * 100 + 0.5).astype("int64")
        return df.groupby("day", as_index=False)["cents"].sum()

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if parts.empty:
        return pd.DataFrame({
            "day": pd.Series([], dtype="datetime64[ns]"),
            "revenue_cents": pd.Series([], dtype="int64"),
            "med7_cents": pd.Series([], dtype="int64")})
    d = parts.groupby("day", as_index=False)["cents"].sum() \
        .sort_values("day").reset_index(drop=True)
    rev = d["cents"].to_numpy(dtype="int64")
    med = np.empty(len(rev), dtype="int64")
    for i in range(len(rev)):
        w = np.sort(rev[max(0, i - 6):i + 1])
        med[i] = w[(len(w) + 1) // 2 - 1]
    return pd.DataFrame({
        "day": d["day"],
        "revenue_cents": pd.Series(rev, dtype="int64"),
        "med7_cents": pd.Series(med, dtype="int64")})


def parts_adamic_adar(sf_dir: str, support: int = 2, k: int = 20
                      ) -> pd.DataFrame:
    """Top-``k`` Adamic–Adar link predictions over the co-order part
    graph: for every NON-edge pair (a < b), the score
    ``aa_score = Σ_{c ∈ N(a)∩N(b)} 1e12 // round(ln(deg c)·10⁶)`` —
    the docs_zipf_slope fixed-point-ln contract makes the per-center
    weight an exact integer, so partial sums are association-free.
    Output (part_a, part_b, n_common, aa_score), ties pinned by
    (aa_score DESC, part_a, part_b), existing edges excluded.

    Scale shape: directed adjacency under 64-way node-hash buckets —
    each center's FULL neighborhood lands in one bucket, so its degree
    (hence its AA weight) is computed where its wedges are generated
    and each wedge carries the center weight out, no degree exchange.
    Wedge partials and edge-tag rows meet under pair-hash buckets
    (the parts_neighbor_jaccard tagged-union convention): sum partials,
    drop edge pairs, emit a per-bucket top-``k`` — the driver merges
    ≤ 64·k candidate rows and never sees a wedge.  Reference parity:
    co-order analytics family (reference analytics/report.py
    aggregations); the AA readout is the engine's link-prediction
    extension over the same graph."""
    edges = _co_order_pair_counts(sf_dir, support)

    def to_directed(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "node": np.concatenate([df["a_id"].to_numpy(dtype="int64"),
                                    df["b_id"].to_numpy(dtype="int64")]),
            "nbr": np.concatenate([df["b_id"].to_numpy(dtype="int64"),
                                   df["a_id"].to_numpy(dtype="int64")])})
        out["_b"] = (out["node"] % 64).astype("int64")
        return out

    directed = edges.map_batches(to_directed, batch_format="pandas") \
        .materialize()
    cols = ("part_a", "part_b", "n_common", "aa_score")
    empty = pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})
    if directed.count() == 0:
        return empty

    pcols = ("a", "b", "n_common", "aa", "_p")

    def bucket_wedges(df: pd.DataFrame) -> pd.DataFrame:
        deg = df.groupby("node")["nbr"].size()
        deg2 = deg[deg >= 2]
        if len(deg2) == 0:
            return pd.DataFrame({c: pd.Series([], dtype="int64")
                                 for c in pcols})
        lq = np.round(np.log(deg2.to_numpy(dtype="float64"))
                      * 1_000_000).astype("int64")
        wc = pd.Series(1_000_000_000_000 // lq, index=deg2.index)
        m = df.merge(df, on="node")
        m = m[m["nbr_x"] < m["nbr_y"]]
        if len(m) == 0:
            return pd.DataFrame({c: pd.Series([], dtype="int64")
                                 for c in pcols})
        m["wc"] = m["node"].map(wc).astype("int64")
        g = m.groupby(["nbr_x", "nbr_y"], as_index=False).agg(
            n_common=("wc", "size"), aa=("wc", "sum"))
        out = pd.DataFrame({"a": g["nbr_x"].astype("int64"),
                            "b": g["nbr_y"].astype("int64"),
                            "n_common": g["n_common"].astype("int64"),
                            "aa": g["aa"].astype("int64")})
        out["_p"] = ((out["a"] * 1_000_003 + out["b"]) % 64).astype("int64")
        return out

    def tag_edge(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"a": df["a_id"].astype("int64"),
                            "b": df["b_id"].astype("int64")})
        out["n_common"] = np.full(len(out), -1, dtype="int64")
        out["aa"] = np.full(len(out), -1, dtype="int64")
        out["_p"] = ((out["a"] * 1_000_003 + out["b"]) % 64).astype("int64")
        return out

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        w = df[df["aa"] >= 0]
        if len(w) == 0:
            return empty.copy()
        e = df[df["aa"] < 0][["a", "b"]]
        g = w.groupby(["a", "b"], as_index=False).agg(
            n_common=("n_common", "sum"), aa=("aa", "sum"))
        m = g.merge(e.assign(_e=np.int64(1)), on=["a", "b"], how="left")
        m = m[m["_e"].isna()]
        m = m.sort_values(["aa", "a", "b"],
                          ascending=[False, True, True],
                          kind="stable").head(k)
        return pd.DataFrame({
            "part_a": m["a"].astype("int64"),
            "part_b": m["b"].astype("int64"),
            "n_common": m["n_common"].astype("int64"),
            "aa_score": m["aa"].astype("int64")})

    wedges = directed.groupby("_b").map_groups(
        bucket_wedges, batch_format="pandas")
    cand = wedges.union(edges.map_batches(tag_edge, batch_format="pandas")) \
        .groupby("_p").map_groups(finish, batch_format="pandas") \
        .to_pandas()
    if cand.empty or "aa_score" not in cand.columns:
        return empty
    cand = cand.sort_values(["aa_score", "part_a", "part_b"],
                            ascending=[False, True, True],
                            kind="stable").head(k)
    return cand[list(cols)].astype("int64").reset_index(drop=True)


def events_welch_ttest(sf_dir: str) -> pd.DataFrame:
    """Welch's unequal-variance t-test of event ``value`` between the
    two ``md5_32(user_id) % 2`` variants (the events_abtest split
    convention): one row (n_a, n_b, mean_a, mean_b, t_micro, df_micro)
    where t is the Welch statistic and df the Welch–Satterthwaite
    degrees of freedom, both rounded to integer micro.  Values become
    exact cents (the events_value_stats moment contract) so the three
    per-variant moments (n, Σc, Σc²) merge as integers in any order;
    the t/df readout is ONE scalar float expression written with the
    IDENTICAL association order in engine and SQL over those six
    integers.  Emitted only when both variants have n ≥ 2; a zero
    pooled standard error pins t_micro = df_micro = 0.

    Scale shape: per-block (variant, n, s, q) partials — the driver
    merges ≤ 2 rows per block and runs the closed form locally."""
    import hashlib

    ds = _read(sf_dir, "events", ["user_id", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({c: pd.Series([], dtype="int64")
                                 for c in ("variant", "n", "s", "q")})
        u = df["user_id"].astype("int64")
        vmap = {int(x): int(hashlib.md5(
            str(int(x)).encode()).hexdigest()[:8], 16) % 2
            for x in u.unique()}
        c = np.floor(df["value"].to_numpy() * 100 + 0.5).astype("int64")
        out = pd.DataFrame({"variant": u.map(vmap).astype("int64"),
                            "c": c, "c2": c * c})
        return out.groupby("variant", as_index=False).agg(
            n=("c", "size"), s=("c", "sum"), q=("c2", "sum"))

    cols = ("n_a", "n_b", "mean_a", "mean_b", "t_micro", "df_micro")

    def _empty() -> pd.DataFrame:
        return pd.DataFrame({
            "n_a": pd.Series([], dtype="int64"),
            "n_b": pd.Series([], dtype="int64"),
            "mean_a": pd.Series([], dtype="float64"),
            "mean_b": pd.Series([], dtype="float64"),
            "t_micro": pd.Series([], dtype="int64"),
            "df_micro": pd.Series([], dtype="int64")})

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if parts.empty or "variant" not in parts.columns:
        return _empty()
    agg = parts.groupby("variant")[["n", "s", "q"]].sum()
    if not (0 in agg.index and 1 in agg.index):
        return _empty()
    na, sa, qa = (int(agg.loc[0, k]) for k in ("n", "s", "q"))
    nb, sb, qb = (int(agg.loc[1, k]) for k in ("n", "s", "q"))
    if na < 2 or nb < 2:
        return _empty()
    fna, fnb = float(na), float(nb)
    ma = float(sa) / fna / 100.0
    mb = float(sb) / fnb / 100.0
    va = (float(qa) / fna - (float(sa) / fna) * (float(sa) / fna)) \
        / 10000.0 * fna / (fna - 1.0)
    vb = (float(qb) / fnb - (float(sb) / fnb) * (float(sb) / fnb)) \
        / 10000.0 * fnb / (fnb - 1.0)
    se2 = va / fna + vb / fnb
    if se2 == 0.0:
        t_micro = df_micro = 0
    else:
        t_micro = int(np.round((ma - mb) / np.sqrt(se2) * 1_000_000))
        df_micro = int(np.round(
            se2 * se2 / ((va / fna) * (va / fna) / (fna - 1.0)
                         + (vb / fnb) * (vb / fnb) / (fnb - 1.0))
            * 1_000_000))
    return pd.DataFrame({
        "n_a": pd.Series([na], dtype="int64"),
        "n_b": pd.Series([nb], dtype="int64"),
        "mean_a": pd.Series([float(np.round(ma, 6))], dtype="float64"),
        "mean_b": pd.Series([float(np.round(mb, 6))], dtype="float64"),
        "t_micro": pd.Series([t_micro], dtype="int64"),
        "df_micro": pd.Series([df_micro], dtype="int64")})


def orders_gini(sf_dir: str) -> pd.DataFrame:
    """One-row Gini coefficient of per-customer spend in exact ppm:
    ``gini_ppm = 10⁶·(2·Σᵢ i·xᵢ − (n+1)·Σx) // (n·Σx)`` with ranks i
    from the total order (cents ASC, custkey ASC).  Because x is
    constant within a tied spend value, Σ i·xᵢ collapses onto the
    merged value histogram: each distinct value v with multiplicity m
    and ``cb`` lower-ranked rows contributes
    ``v·(m·cb + m(m+1)/2)`` — so NO global sort and NO per-row rank
    materialization exists anywhere (the parts_abc_classes
    histogram-prefix shape).  Σ i·x reaches ~n²·x̄ and is kept in
    Python big ints (HUGEINT in the twin).

    Scale shape: per-customer spend reduces under 64-way custkey
    buckets; the driver merges an O(distinct values × blocks) histogram
    and runs the closed form locally."""
    ds = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(df["o_totalprice"].to_numpy() * 100
                         + 0.5).astype("int64")
        g = pd.DataFrame({"cust": df["o_custkey"].astype("int64"),
                          "cents": cents}) \
            .groupby("cust", as_index=False)["cents"].sum()
        g["_b"] = (g["cust"].astype("int64") % 64).astype("int64")
        return g

    def merge_cust(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("cust", as_index=False)["cents"].sum()
        h = g.groupby("cents", as_index=False).agg(
            m=("cust", "size"), s=("cents", "sum"))
        return h.astype("int64")

    hist = ds.map_batches(partial, batch_format="pandas") \
        .groupby("_b").map_groups(merge_cust, batch_format="pandas") \
        .to_pandas()
    cols = ("n_customers", "total_cents", "gini_ppm")
    if hist.empty or "cents" not in hist.columns:
        return pd.DataFrame({c: pd.Series([], dtype="int64")
                             for c in cols})
    h = hist.groupby("cents").agg(m=("m", "sum"), s=("s", "sum")) \
        .sort_index()
    vals = h.index.to_numpy(dtype="int64")
    ms = h["m"].to_numpy(dtype="int64")
    n = int(ms.sum())
    tot = int(h["s"].sum())
    if n == 0 or tot <= 0:
        return pd.DataFrame({c: pd.Series([], dtype="int64")
                             for c in cols})
    cb = 0
    rs = 0
    for v, m in zip(vals, ms):
        v, m = int(v), int(m)
        rs += v * (m * cb + m * (m + 1) // 2)
        cb += m
    gini = (1_000_000 * (2 * rs - (n + 1) * tot)) // (n * tot)
    return pd.DataFrame({
        "n_customers": pd.Series([n], dtype="int64"),
        "total_cents": pd.Series([tot], dtype="int64"),
        "gini_ppm": pd.Series([gini], dtype="int64")})


_STRESS_SOURCES = 4
_STRESS_TOP = 20
_STRESS_MAX_ROUNDS = 64


def parts_stress_centrality(sf_dir: str, support: int = 2,
                            n_sources: int = _STRESS_SOURCES,
                            k: int = _STRESS_TOP) -> pd.DataFrame:
    """Sampled-source STRESS centrality over the co-order graph: for the
    ``n_sources`` smallest part keys S, ``stress(v) = Σ_{s∈S} σ_sv·g_s(v)``
    — the number of shortest s→t paths passing through interior v,
    summed over all targets t.  Unlike betweenness (rational pair
    dependencies), stress is EXACT INTEGERS end to end: the forward
    level-synchronous pass counts shortest-path multiplicities
    ``σ_sv = Σ_{u∈pred} σ_su`` and the backward pass counts DAG
    continuations ``g_s(v) = Σ_{w∈succ} (1 + g_s(w))`` — so a
    distributed engine and an independent sequential implementation
    must agree bit-for-bit.  Sources and endpoints score 0 from their
    own terms (σ·g only credits interior vertices via s≠v and g>0…
    precisely: v=s is excluded, leaves have g=0).  Top-``k`` rows
    (part_id, stress), ties pinned by (stress DESC, part_id).

    Scale shape: the edge Dataset is MATERIALIZED once and every round
    is ONE streaming edge scan — all ``n_sources`` BFS trees advance
    simultaneously against broadcast (ray.put) dist/σ arrays indexed by
    a sorted node vector (np.searchsorted, no Python membership loop).
    The driver holds O(|reached|·n_sources) integers — the documented
    parts_bfs_levels bounded-reach assumption for sampled-source
    centrality; a full-graph exact betweenness would switch to the
    label-propagation exchange shape of parts_components.  The final
    σ·g products run in Python big ints (path counts multiply past 2⁶³
    on dense graphs long before web scale).  Oracle: pinned table from
    an INDEPENDENT sequential Brandes-stress in
    tools/gen_pinned_oracles.py (the parts_mst pinning pattern)."""
    import ray

    edges = _co_order_edges(sf_dir, support).materialize()
    empty = pd.DataFrame({"part_id": pd.Series([], dtype="int64"),
                          "stress": pd.Series([], dtype="int64")})
    if edges.count() == 0:
        return empty

    def block_nodes(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n": np.unique(np.concatenate(
            [df["a_id"].to_numpy(dtype="int64"),
             df["b_id"].to_numpy(dtype="int64")]))})

    nodes = np.unique(edges.map_batches(block_nodes, batch_format="pandas")
                      .to_pandas()["n"].to_numpy(dtype="int64"))
    srcs = nodes[:n_sources]
    ns = len(srcs)
    nv = len(nodes)
    dist = np.full((nv, ns), -1, dtype="int64")
    sig = np.zeros((nv, ns), dtype="int64")
    for j, s in enumerate(srcs):
        i = int(np.searchsorted(nodes, s))
        dist[i, j] = 0
        sig[i, j] = 1

    nodes_ref = ray.put(nodes)

    # forward: one edge scan per level advances every source's BFS tree;
    # a block emits (node_idx, source, σ-partial) only for fresh nodes
    for rnd in range(1, _STRESS_MAX_ROUNDS + 1):
        dist_ref = ray.put(dist)
        sig_ref = ray.put(sig)

        def fwd(df: pd.DataFrame, r=rnd, dr=dist_ref, sr=sig_ref):
            nd = ray.get(nodes_ref)
            d = ray.get(dr)
            s = ray.get(sr)
            ia = np.searchsorted(nd, df["a_id"].to_numpy(dtype="int64"))
            ib = np.searchsorted(nd, df["b_id"].to_numpy(dtype="int64"))
            outs = []
            for j in range(d.shape[1]):
                for u, v in ((ia, ib), (ib, ia)):
                    m = (d[u, j] == r - 1) & (d[v, j] == -1)
                    if m.any():
                        outs.append(pd.DataFrame({
                            "i": v[m].astype("int64"),
                            "j": np.full(int(m.sum()), j, dtype="int64"),
                            "sg": s[u[m], j]}))
            if not outs:
                return pd.DataFrame({c: pd.Series([], dtype="int64")
                                     for c in ("i", "j", "sg")})
            out = pd.concat(outs, ignore_index=True)
            return out.groupby(["i", "j"], as_index=False)["sg"].sum()

        msgs = edges.map_batches(fwd, batch_format="pandas").to_pandas()
        if msgs.empty or "i" not in msgs.columns:
            break
        g = msgs.groupby(["i", "j"], as_index=False)["sg"].sum()
        ii = g["i"].to_numpy(dtype="int64")
        jj = g["j"].to_numpy(dtype="int64")
        dist[ii, jj] = rnd
        sig[ii, jj] = g["sg"].to_numpy(dtype="int64")
    else:
        raise RuntimeError("stress forward pass did not converge in "
                           f"{_STRESS_MAX_ROUNDS} rounds")

    # backward: per level, one edge scan sums DAG continuations
    # g(u) = Σ_{succ w} (1 + g(w)) for nodes at that level
    gacc = np.zeros((nv, ns), dtype="int64")
    max_lvl = int(dist.max())
    for lvl in range(max_lvl - 1, -1, -1):
        dist_ref = ray.put(dist)
        g_ref = ray.put(gacc)

        def bwd(df: pd.DataFrame, lv=lvl, dr=dist_ref, gr=g_ref):
            nd = ray.get(nodes_ref)
            d = ray.get(dr)
            gg = ray.get(gr)
            ia = np.searchsorted(nd, df["a_id"].to_numpy(dtype="int64"))
            ib = np.searchsorted(nd, df["b_id"].to_numpy(dtype="int64"))
            outs = []
            for j in range(d.shape[1]):
                for u, v in ((ia, ib), (ib, ia)):
                    m = (d[u, j] == lv) & (d[v, j] == lv + 1)
                    if m.any():
                        outs.append(pd.DataFrame({
                            "i": u[m].astype("int64"),
                            "j": np.full(int(m.sum()), j, dtype="int64"),
                            "c": 1 + gg[v[m], j]}))
            if not outs:
                return pd.DataFrame({c: pd.Series([], dtype="int64")
                                     for c in ("i", "j", "c")})
            out = pd.concat(outs, ignore_index=True)
            return out.groupby(["i", "j"], as_index=False)["c"].sum()

        msgs = edges.map_batches(bwd, batch_format="pandas").to_pandas()
        if msgs.empty or "i" not in msgs.columns:
            continue
        g = msgs.groupby(["i", "j"], as_index=False)["c"].sum()
        gacc[g["i"].to_numpy(dtype="int64"),
             g["j"].to_numpy(dtype="int64")] = \
            g["c"].to_numpy(dtype="int64")

    # interior credit only: v = s has σ·g counting paths v itself starts
    stress = []
    for i in range(nv):
        t = 0
        for j in range(ns):
            if nodes[i] == srcs[j] or dist[i, j] <= 0:
                continue
            t += int(sig[i, j]) * int(gacc[i, j])
        stress.append(t)
    out = pd.DataFrame({"part_id": nodes.astype("int64"),
                        "stress": pd.Series(stress, dtype=object)})
    out = out.sort_values(["stress", "part_id"],
                          ascending=[False, True],
                          kind="mergesort").head(k)
    out["stress"] = out["stress"].astype("int64")
    out["part_id"] = out["part_id"].astype("int64")
    return out.reset_index(drop=True)


def parts_xyz_classes(sf_dir: str) -> pd.DataFrame:
    """XYZ demand-variability classification per part: the squared
    coefficient of variation of MONTHLY demand (centi-quantity; months
    with no demand count as zero over the corpus's global month
    horizon) in exact ppm —
    ``cv2_ppm = 10⁶·(M·Σq² − S²) // S²`` with S = Σ monthly q,
    M = global distinct month count — and the classic classes
    X (cv² ≤ 0.25), Y (≤ 1.0), Z (else).  No sqrt anywhere: cv² is the
    integer-exact monotone twin of CV, so the class cut is identical.
    Output (p_partkey, n_months_active, sum_qty_centi, cv2_ppm,
    xyz_class) sorted by part.

    Scale shape: per-batch (part, month) centi-qty partials finish
    under 64-way part buckets (a part's months are colocated, so
    monthly sums are exact before they are squared — the per-batch-
    partials-are-not-global sharp edge, NOTES_r2 #50); the global month
    count is one tiny distinct-month pass broadcast as a closure
    scalar; M·Σq² runs in Python big ints (HUGEINT in the twin)."""
    ds = _read(sf_dir, "lineitem",
               ["l_partkey", "l_shipdate", "l_quantity"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        q = np.floor(df["l_quantity"].to_numpy() * 100
                     + 0.5).astype("int64")
        g = pd.DataFrame({
            "part": df["l_partkey"].astype("int64"),
            "mo": df["l_shipdate"].to_numpy()
            .astype("datetime64[M]").astype("int64"),
            "q": q}).groupby(["part", "mo"], as_index=False)["q"].sum()
        g["_b"] = (g["part"] % 64).astype("int64")
        return g

    partials = ds.map_batches(partial, batch_format="pandas") \
        .materialize()
    cols = ("p_partkey", "n_months_active", "sum_qty_centi", "cv2_ppm",
            "xyz_class")

    def _empty() -> pd.DataFrame:
        out = {c: pd.Series([], dtype="int64") for c in cols[:-1]}
        out["xyz_class"] = pd.Series([], dtype=object)
        return pd.DataFrame(out)

    months = partials.map_batches(
        lambda df: pd.DataFrame({"mo": df["mo"].unique()}),
        batch_format="pandas").to_pandas()
    if months.empty:
        return _empty()
    nm = int(months["mo"].nunique())

    def bucket_stats(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["part", "mo"], as_index=False)["q"].sum()
        rows = []
        for part, sub in g.groupby("part"):
            s = int(sub["q"].sum())
            if s <= 0:
                continue
            q2 = sum(int(x) * int(x) for x in sub["q"])
            cv2 = (1_000_000 * (nm * q2 - s * s)) // (s * s)
            cls = "X" if cv2 <= 250_000 else \
                ("Y" if cv2 <= 1_000_000 else "Z")
            rows.append((int(part), len(sub), s, cv2, cls))
        out = {
            "p_partkey": pd.Series([r[0] for r in rows], dtype="int64"),
            "n_months_active": pd.Series([r[1] for r in rows],
                                         dtype="int64"),
            "sum_qty_centi": pd.Series([r[2] for r in rows],
                                       dtype="int64"),
            "cv2_ppm": pd.Series([r[3] for r in rows], dtype="int64"),
            "xyz_class": pd.Series([r[4] for r in rows], dtype=object)}
        return pd.DataFrame(out)

    out = partials.groupby("_b").map_groups(
        bucket_stats, batch_format="pandas").to_pandas()
    if out.empty or "p_partkey" not in out.columns:
        return _empty()
    for c in cols[:-1]:
        out[c] = out[c].astype("int64")
    return out[list(cols)].sort_values("p_partkey").reset_index(drop=True)


def events_hour_uniformity(sf_dir: str) -> pd.DataFrame:
    """Per-event-type hour-of-day uniformity test: the chi-square
    statistic against the uniform 24-bin hourly distribution in exact
    ppm — ``chi2_ppm = 10⁶·Σ_h (24·o_h − N)² // (24²·N)`` (the algebraic
    expansion of Σ(o−N/24)²/(N/24) with every intermediate an integer;
    zero-count hours contribute N², so the formula needs only the
    OBSERVED hour rows).  Output (event_type, n_events, n_hours_active,
    chi2_ppm) sorted by type; the numerator runs in Python big ints
    (HUGEINT in the twin — (24·o−N)² passes 2⁶³ near N ≈ 4·10⁸).

    Scale shape: per-block (type, hour) count partials are ≤ 24·|types|
    rows each, so the driver merge is O(24·|types|·blocks) integers —
    the bounded-final contract of events_value_stats; no shuffle."""
    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "event_type": df["event_type"].astype(object),
            "hour": pd.to_datetime(df["ts"]).dt.hour.astype("int64")}) \
            .groupby(["event_type", "hour"], as_index=False).size() \
            .rename(columns={"size": "n"})
        return g

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    cols = ("event_type", "n_events", "n_hours_active", "chi2_ppm")
    if parts.empty or "event_type" not in parts.columns:
        return pd.DataFrame({
            "event_type": pd.Series([], dtype=object),
            "n_events": pd.Series([], dtype="int64"),
            "n_hours_active": pd.Series([], dtype="int64"),
            "chi2_ppm": pd.Series([], dtype="int64")})
    g = parts.groupby(["event_type", "hour"], as_index=False)["n"].sum()
    rows = []
    for et, sub in g.groupby("event_type"):
        n = int(sub["n"].sum())
        obs = sum((24 * int(o) - n) ** 2 for o in sub["n"])
        zero_hours = 24 - len(sub)
        chi2 = (1_000_000 * (obs + zero_hours * n * n)) // (576 * n)
        rows.append((et, n, len(sub), chi2))
    rows.sort()
    return pd.DataFrame({
        "event_type": [r[0] for r in rows],
        "n_events": pd.Series([r[1] for r in rows], dtype="int64"),
        "n_hours_active": pd.Series([r[2] for r in rows], dtype="int64"),
        "chi2_ppm": pd.Series([r[3] for r in rows], dtype="int64")})


def events_entropy_rate(sf_dir: str) -> pd.DataFrame:
    """Per-state conditional entropy of the first-order event-type
    Markov chain in integer micro-nats: for each ``from_type`` with row
    marginal m and successor counts c_j,
    ``entropy_micro = (Σ_j c_j·round(ln(m/c_j)·10⁶)) // m`` — the
    docs_char_entropy fixed-point-ln contract applied to the
    events_transition_matrix transition counts.  Output
    (from_type, n_trans, n_to, entropy_micro) sorted by from_type; a
    deterministic state (one successor) scores exactly 0.

    Scale shape: identical to events_transition_matrix — users
    hash-bucket (user_id % 64, whole history per bucket), ONE sort +
    shift-masked bigram build per bucket, |types|²-bounded count
    partials; the entropy fold on the driver is O(|types|²)."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id",
                                  "event_type"])

    counts = _transition_counts(ds)
    if counts.empty:
        return pd.DataFrame({
            "from_type": pd.Series([], dtype=object),
            "n_trans": pd.Series([], dtype="int64"),
            "n_to": pd.Series([], dtype="int64"),
            "entropy_micro": pd.Series([], dtype="int64")})
    rows = []
    for ft, sub in counts.groupby("from_type"):
        m = int(sub["n"].sum())
        c = sub["n"].to_numpy(dtype="int64")
        lq = np.round(np.log(float(m) / c) * 1_000_000).astype("int64")
        # Python big-int fold: Σ c·round(ln(m/c)·10⁶) passes 2⁶³ at web
        # scale (the twin's SUM is HUGEINT); O(|types|²) driver work
        t = sum(int(ci) * int(li) for ci, li in zip(c, lq))
        rows.append((ft, m, len(sub), t // m))
    rows.sort()
    return pd.DataFrame({
        "from_type": [r[0] for r in rows],
        "n_trans": pd.Series([r[1] for r in rows], dtype="int64"),
        "n_to": pd.Series([r[2] for r in rows], dtype="int64"),
        "entropy_micro": pd.Series([r[3] for r in rows], dtype="int64")})


def customer_er_pairs(sf_dir: str) -> pd.DataFrame:
    """Entity resolution over customer names with FastSS delete-1
    blocking: two customers match iff their names are within Levenshtein
    distance 1 (DuckDB byte semantics).  Blocking key = the name itself
    plus every single-character deletion — for distance ≤1 the delete-1
    neighborhoods of matching strings always intersect, so blocking is
    LOSSLESS and the exact DP only runs inside tiny candidate groups.
    Output (custkey1, custkey2, dist) with custkey1 < custkey2, sorted.

    Scale shape: variant projections (never full rows) exchange under a
    64-way variant-hash bucket; a variant's group is bounded by the
    alphabet size when names are distinct (strings sharing a delete
    differ at ≤1 position), so in-bucket pairing is O(|group|²) on tiny
    groups.  Candidate pairs dedup under a pair-hash bucket (the same
    pair can surface via two shared variants, e.g. transpositions) and
    are verified there with ONE batched-DP Levenshtein pass per bucket —
    the docs_edit_dedup kernel, vectorized across the pair axis.  The
    driver only collects verified matches (the ER output itself)."""
    from .docqueries import _batched_levenshtein

    ds = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    cols = ("custkey1", "custkey2", "dist")
    empty = pd.DataFrame({
        "custkey1": pd.Series([], dtype="int64"),
        "custkey2": pd.Series([], dtype="int64"),
        "dist": pd.Series([], dtype="int64")})

    def variants(df: pd.DataFrame) -> pa.Table:
        keys, names, vs = [], [], []
        for k, nm in zip(df["c_custkey"].astype("int64"),
                         df["c_name"].astype(object)):
            s = nm or ""
            seen = {s}
            for i in range(len(s)):
                seen.add(s[:i] + s[i + 1:])
            for v in seen:
                keys.append(int(k))
                names.append(s)
                vs.append(v)
        bucket = (pd.util.hash_pandas_object(
            pd.Series(vs, dtype=object), index=False) % 64).to_numpy()
        return pa.table({
            "k": pa.array(keys, pa.int64()),
            "name": pa.array(names, pa.string()),
            "variant": pa.array(vs, pa.string()),
            "_b": pa.array(bucket.astype("int64"), pa.int64())})

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        out_k1, out_k2, out_n1, out_n2 = [], [], [], []
        if len(df) and "variant" in df.columns:
            for _, g in df.groupby("variant", sort=False):
                if len(g) < 2:
                    continue
                g = g.sort_values("k")
                ks = g["k"].to_numpy(dtype="int64")
                ns = g["name"].to_numpy(dtype=object)
                ia, ib = np.triu_indices(len(g), k=1)
                out_k1.extend(ks[ia])
                out_k2.extend(ks[ib])
                out_n1.extend(ns[ia])
                out_n2.extend(ns[ib])
        pb = (pd.util.hash_pandas_object(
            pd.Series([f"{a}|{b}" for a, b in zip(out_k1, out_k2)],
                      dtype=object), index=False) % 64).to_numpy()
        return pd.DataFrame({
            "k1": pd.Series(out_k1, dtype="int64"),
            "k2": pd.Series(out_k2, dtype="int64"),
            "n1": pd.Series(out_n1, dtype=object),
            "n2": pd.Series(out_n2, dtype=object),
            "_pb": pd.Series(pb, dtype="int64")})

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "k1" not in df.columns:
            return empty.copy()
        df = df.drop_duplicates(["k1", "k2"]).reset_index(drop=True)
        raw_a = [s.encode("utf-8") for s in df["n1"]]
        raw_b = [s.encode("utf-8") for s in df["n2"]]
        la = np.array([len(b) for b in raw_a], dtype=np.int64)
        lb = np.array([len(b) for b in raw_b], dtype=np.int64)
        width = max(int(la.max()), int(lb.max()), 1)
        ca = np.zeros((len(df), width), dtype=np.int32)
        cb = np.zeros((len(df), width), dtype=np.int32)
        for i, (a, b) in enumerate(zip(raw_a, raw_b)):
            ca[i, :len(a)] = np.frombuffer(a, dtype=np.uint8)
            cb[i, :len(b)] = np.frombuffer(b, dtype=np.uint8)
        d = _batched_levenshtein(ca, la, cb, lb)
        hit = d <= 1
        return pd.DataFrame({
            "custkey1": df["k1"].to_numpy()[hit],
            "custkey2": df["k2"].to_numpy()[hit],
            "dist": d[hit].astype("int64")})

    out = ds.map_batches(variants, batch_format="pandas") \
        .groupby("_b").map_groups(bucket_pairs, batch_format="pandas") \
        .groupby("_pb").map_groups(verify, batch_format="pandas") \
        .to_pandas()
    if out.empty or "custkey1" not in out.columns:
        return empty
    for c in cols:
        out[c] = out[c].astype("int64")
    return out[list(cols)].sort_values(["custkey1", "custkey2"]) \
        .reset_index(drop=True)


_CLOSE_SOURCES = 4
_CLOSE_MAX_LEVEL = 6


def parts_closeness(sf_dir: str, support: int = _BFS_SUPPORT,
                    n_sources: int = _CLOSE_SOURCES,
                    max_level: int = _CLOSE_MAX_LEVEL) -> pd.DataFrame:
    """Hop-bounded Wasserman–Faust closeness centrality from the
    ``n_sources`` smallest part keys over the co-order graph:
    ``closeness_ppm = (n_reach−1)²·10⁶ // ((n_nodes−1)·farness)`` where
    farness sums BFS distances ≤ ``max_level`` — the reachability-scaled
    form, so a source reaching few nodes cheaply doesn't beat one
    reaching the whole graph.  Isolated sources (farness 0) score 0.
    Output (src, n_reach, farness, closeness_ppm) sorted by src.

    Scale shape: the parts_bfs_levels contract run SIMULTANEOUSLY for
    all sources — each level broadcasts the per-source frontier sets
    and ONE edge scan emits distinct (source, neighbor) partials, so K
    sources cost max_level scans total, not K·max_level; the edge
    Dataset is materialized once and never leaves the workers.  The
    node census is a per-block distinct partial (the part key space is
    dimension-sized — the parts_components assumption)."""
    import ray

    edges = _co_order_edges(sf_dir, support)
    cols = ("src", "n_reach", "farness", "closeness_ppm")
    empty = pd.DataFrame({
        "src": pd.Series([], dtype="int64"),
        "n_reach": pd.Series([], dtype="int64"),
        "farness": pd.Series([], dtype="int64"),
        "closeness_ppm": pd.Series([], dtype="int64")})
    if edges.count() == 0:
        return empty

    def block_nodes(df: pd.DataFrame) -> pd.DataFrame:
        u = np.unique(np.concatenate([df["a_id"].to_numpy(),
                                      df["b_id"].to_numpy()]))
        return pd.DataFrame({"pk": u.astype("int64")})

    all_nodes = np.unique(
        edges.map_batches(block_nodes, batch_format="pandas")
        .to_pandas()["pk"].to_numpy())
    n_nodes = int(len(all_nodes))
    sources = [int(x) for x in all_nodes[:n_sources]]

    visited = {s: {s: 0} for s in sources}
    frontier = {s: {s} for s in sources}
    for lvl in range(1, max_level + 1):
        f_ref = ray.put({s: np.fromiter(f, dtype="int64", count=len(f))
                         for s, f in frontier.items() if f})
        if not ray.get(f_ref):
            break

        def neighbors(df: pd.DataFrame) -> pd.DataFrame:
            fmap = ray.get(f_ref)
            a = df["a_id"].to_numpy(dtype="int64")
            b = df["b_id"].to_numpy(dtype="int64")
            srcs, nbs = [], []
            for s, f in fmap.items():
                # np.isin is the C-level membership filter (the
                # relational-module idiom) — never a per-element loop
                am = np.isin(a, f)
                bm = np.isin(b, f)
                out = np.unique(np.concatenate([b[am], a[bm]]))
                srcs.extend([s] * len(out))
                nbs.extend(out)
            return pd.DataFrame({
                "src": pd.Series(srcs, dtype="int64"),
                "nb": pd.Series(nbs, dtype="int64")})

        nbs = edges.map_batches(neighbors, batch_format="pandas") \
            .to_pandas()
        progressed = False
        for s in sources:
            sub = nbs[nbs["src"] == s]["nb"] if len(nbs) else []
            nxt = set(int(x) for x in sub) - set(visited[s])
            for n in nxt:
                visited[s][n] = lvl
            frontier[s] = nxt
            progressed = progressed or bool(nxt)
        if not progressed:
            break

    rows = []
    for s in sources:
        n_reach = len(visited[s])
        farness = sum(visited[s].values())
        if farness == 0 or n_nodes <= 1:
            cl = 0
        else:
            cl = ((n_reach - 1) * (n_reach - 1) * 1_000_000
                  // ((n_nodes - 1) * farness))
        rows.append((s, n_reach, farness, cl))
    rows.sort()
    return pd.DataFrame({
        "src": pd.Series([r[0] for r in rows], dtype="int64"),
        "n_reach": pd.Series([r[1] for r in rows], dtype="int64"),
        "farness": pd.Series([r[2] for r in rows], dtype="int64"),
        "closeness_ppm": pd.Series([r[3] for r in rows], dtype="int64")})


_DP_SCALE = 10.0  # Laplace b = 1/ε with ε = 0.1


def events_dp_counts(sf_dir: str, b: float = _DP_SCALE) -> pd.DataFrame:
    """Differentially-private-SHAPED per-type event counts: Laplace(b)
    noise drawn by inverse CDF from a DETERMINISTIC md5 uniform
    ``u = (md5_32(event_type)+0.5)/2³²`` so engine and twin add the
    IDENTICAL noise — ``noisy_n = n + round(−b·sgn(u−½)·ln(1−2|u−½|))``
    (the docs_weighted_sample md5-uniform contract; a seeded release
    pipeline would swap the hash input for ``seed‖type``).  Real DP
    needs fresh randomness — this pins the mechanism's dataflow shape:
    one bounded count aggregate, per-key noise, no second pass.
    Output (event_type, n, noisy_n) sorted by type.

    Scale shape: per-block (type, count) partials — the bounded-final
    contract of events_value_stats; noise is O(|types|) driver work."""
    import hashlib
    import math

    ds = _read(sf_dir, "events", ["event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("event_type", as_index=False).size() \
            .rename(columns={"size": "n"})
        g["n"] = g["n"].astype("int64")
        return g

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if parts.empty or "event_type" not in parts.columns:
        return pd.DataFrame({
            "event_type": pd.Series([], dtype=object),
            "n": pd.Series([], dtype="int64"),
            "noisy_n": pd.Series([], dtype="int64")})
    g = parts.groupby("event_type", as_index=False)["n"].sum()
    noisy = []
    for et, n in zip(g["event_type"], g["n"]):
        h = int(hashlib.md5(str(et).encode()).hexdigest()[:8], 16)
        u = (h + 0.5) / 4294967296.0
        s = 0.0 if u == 0.5 else (1.0 if u > 0.5 else -1.0)
        noise = -b * s * math.log(1 - 2 * abs(u - 0.5))
        noisy.append(int(n) + int(np.round(noise)))
    g["noisy_n"] = pd.Series(noisy, dtype="int64")
    g["n"] = g["n"].astype("int64")
    return g.sort_values("event_type").reset_index(drop=True)


def events_attribution(sf_dir: str) -> pd.DataFrame:
    """Last-touch revenue attribution: each purchase credits the same
    user's most recent view STRICTLY before it and at most 24 h back
    (ties at equal ts → larger event_id, pinned on both sides);
    purchases with no qualifying view land in the ``view_hour = −1``
    row.  Output (view_hour, n_purchases, cents_total) — the marketing
    answer "which view hour drives revenue" — sorted by view_hour.

    Scale shape: the events_asof_click contract — both sides
    co-partition on hash(user_id) % 64 so each bucket's vectorized
    ``pd.merge_asof`` (tolerance 24 h, allow_exact_matches=False, right
    pre-sorted by (ts, event_id) so backward picks the max event_id on
    ties) sees the user's full history; each bucket emits ≤ 25
    (hour, n, cents) partials, so the driver merge is bounded."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id",
                                  "event_type", "value"])
    cols = ("view_hour", "n_purchases", "cents_total")
    empty = pd.DataFrame({
        "view_hour": pd.Series([], dtype="int64"),
        "n_purchases": pd.Series([], dtype="int64"),
        "cents_total": pd.Series([], dtype="int64")})

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"].isin(["purchase", "view"])].copy()
        df["_ab"] = (df["user_id"].astype("int64") % 64).astype("int64")
        return df[["event_id", "ts", "user_id", "event_type", "value",
                   "_ab"]]

    def bucket_attr(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["event_type"] == "purchase"] \
            .sort_values("ts", kind="mergesort").copy()
        if not len(left):
            return empty.copy()
        left["cents"] = np.floor(
            left["value"].to_numpy() * 100 + 0.5).astype("int64")
        right = g[g["event_type"] == "view"] \
            .sort_values(["ts", "event_id"], kind="mergesort") \
            .rename(columns={"ts": "view_ts"})
        if len(right):
            m = pd.merge_asof(
                left, right[["view_ts", "user_id"]],
                left_on="ts", right_on="view_ts", by="user_id",
                direction="backward", allow_exact_matches=False,
                tolerance=pd.Timedelta(hours=24))
            hour = pd.to_datetime(m["view_ts"]).dt.hour \
                .fillna(-1).astype("int64")
        else:
            m = left
            hour = pd.Series(-1, index=left.index, dtype="int64")
        out = pd.DataFrame({"view_hour": hour.to_numpy(),
                            "cents": m["cents"].to_numpy()})
        agg = out.groupby("view_hour", as_index=False).agg(
            n_purchases=("cents", "size"), cents_total=("cents", "sum"))
        for c in cols:
            agg[c] = agg[c].astype("int64")
        return agg[list(cols)]

    parts = ds.map_batches(tag, batch_format="pandas") \
        .groupby("_ab").map_groups(bucket_attr, batch_format="pandas") \
        .to_pandas()
    if parts.empty or "view_hour" not in parts.columns:
        return empty
    out = parts.groupby("view_hour", as_index=False)[
        ["n_purchases", "cents_total"]].sum()
    for c in cols:
        out[c] = out[c].astype("int64")
    return out.sort_values("view_hour").reset_index(drop=True)


_BOT_MIN_GAPS = 5
_BOT_REG_PPM = 1_400_000


def events_bot_users(sf_dir: str, min_gaps: int = _BOT_MIN_GAPS,
                     reg_ppm: int = _BOT_REG_PPM) -> pd.DataFrame:
    """Cadence-regularity bot flagging: a user with ≥ ``min_gaps``
    inter-event gaps is a bot iff ``IQR·10⁶ // median < reg_ppm`` over
    their gap distribution (quantile_disc order statistics — too-even
    timing is the classic automation tell; a zero median is perfectly
    regular and flags).  The census output (is_bot, n_users,
    user_checksum) keeps the result bounded at any corpus size; the
    1.4·10⁶ threshold splits the synthetic population so BOTH classes
    are live in the gate.

    Scale shape: user-hash buckets carry whole histories; inside a
    bucket gaps come from ONE (user, ts, event_id) sort + diff masked
    at user boundaries, and per-user quantiles from ONE (user, gap)
    sort + vectorized ceil(q·n)−1 indexing — no per-user Python; each
    bucket emits its two census partials."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id"])
    cols = ("is_bot", "n_users", "user_checksum")
    empty = pd.DataFrame({
        "is_bot": pd.Series([], dtype="int64"),
        "n_users": pd.Series([], dtype="int64"),
        "user_checksum": pd.Series([], dtype="int64")})

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_b"] = (df["user_id"].astype("int64") % 64).astype("int64")
        return df[["user_id", "ts", "event_id", "_b"]]

    def bucket_census(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) < 2 or "user_id" not in df.columns:
            return empty.copy()
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort")
        uid = df["user_id"].to_numpy(dtype="int64")
        ts = df["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
        same = uid[:-1] == uid[1:]
        gu = uid[1:][same]
        gaps = (ts[1:] - ts[:-1])[same]
        if len(gu) == 0:
            return empty.copy()
        order = np.lexsort((gaps, gu))
        gu, gaps = gu[order], gaps[order]
        starts = np.flatnonzero(
            np.concatenate(([True], gu[1:] != gu[:-1])))
        n = np.diff(np.append(starts, len(gu))).astype("int64")
        keep = n >= min_gaps
        if not keep.any():
            return empty.copy()
        st, nn = starts[keep], n[keep]
        users = gu[st]

        def q_disc(q: float) -> np.ndarray:
            idx = st + np.ceil(q * nn).astype("int64") - 1
            return gaps[idx]

        med = q_disc(0.5)
        iqr = q_disc(0.75) - q_disc(0.25)
        # Python big-ints: iqr·10⁶ wraps int64 past a ~107-day IQR (the
        # twin is HUGEINT); O(users-in-bucket) scalar ops
        is_bot = np.fromiter(
            (1 if m == 0 or int(q) * 1_000_000 // int(m) < reg_ppm
             else 0 for m, q in zip(med, iqr)),
            dtype="int64", count=len(med))
        out = pd.DataFrame({"is_bot": is_bot, "u": users})
        agg = out.groupby("is_bot", as_index=False).agg(
            n_users=("u", "size"), user_checksum=("u", "sum"))
        for c in cols:
            agg[c] = agg[c].astype("int64")
        return agg[list(cols)]

    parts = ds.map_batches(tag, batch_format="pandas") \
        .groupby("_b").map_groups(bucket_census, batch_format="pandas") \
        .to_pandas()
    if parts.empty or "is_bot" not in parts.columns:
        return empty
    out = parts.groupby("is_bot", as_index=False)[
        ["n_users", "user_checksum"]].sum()
    for c in cols:
        out[c] = out[c].astype("int64")
    return out.sort_values("is_bot").reset_index(drop=True)


def parts_edge_churn(sf_dir: str) -> pd.DataFrame:
    """Month-over-month stability of the co-order part graph: for each
    order month m, Jaccard between that month's edge set (parts sharing
    ≥1 order dated in m, a<b) and month m+1's —
    ``jaccard_ppm = common·10⁶ // (n₁+n₂−common)`` — the temporal-graph
    churn audit (an assortment shift shows up as a Jaccard cliff).  The
    last observed month compares against an empty successor (0 ppm).
    Output (month1, n_edges1, n_edges2, n_common, jaccard_ppm) sorted.

    Scale shape: lineitem's distinct (order, part) projection
    hash-joins orders' (key, month) — never a driver-side fact map (the
    q5 lesson); pairs generate per ORDER bucket with one vectorized
    self-merge; global edge dedup and the consecutive-month match both
    finish under the PAIR-hash bucket (every month of an (a,b) edge
    colocates, so a shift compare inside one sort finds m→m+1 runs);
    each bucket emits ≤ |months| partials."""
    line = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
    cols = ("month1", "n_edges1", "n_edges2", "n_common", "jaccard_ppm")
    empty = pd.DataFrame({
        "month1": pd.Series([], dtype="datetime64[us]"),
        "n_edges1": pd.Series([], dtype="int64"),
        "n_edges2": pd.Series([], dtype="int64"),
        "n_common": pd.Series([], dtype="int64"),
        "jaccard_ppm": pd.Series([], dtype="int64")})

    def omonth(df: pd.DataFrame) -> pd.DataFrame:
        m = pd.to_datetime(df["o_orderdate"]).to_numpy() \
            .astype("datetime64[M]").astype("int64")
        return pd.DataFrame({
            "o_orderkey": df["o_orderkey"].astype("int64"),
            "m": pd.Series(m, dtype="int64")})

    def lp(df: pd.DataFrame) -> pd.DataFrame:
        out = df.drop_duplicates(["l_orderkey", "l_partkey"]).copy()
        out["l_orderkey"] = out["l_orderkey"].astype("int64")
        out["l_partkey"] = out["l_partkey"].astype("int64")
        return out

    joined = line.map_batches(lp, batch_format="pandas").join(
        orders.map_batches(omonth, batch_format="pandas"),
        join_type="inner",
        num_partitions=_join_partitions(sf_dir, "lineitem"),
        on=("l_orderkey",), right_on=("o_orderkey",))

    def ob(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_ob"] = (df["l_orderkey"].astype("int64") % 64).astype("int64")
        return df[["l_orderkey", "l_partkey", "m", "_ob"]]

    def gen_pairs(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "l_orderkey" not in df.columns:
            return pd.DataFrame({
                "a": pd.Series([], dtype="int64"),
                "b": pd.Series([], dtype="int64"),
                "m": pd.Series([], dtype="int64"),
                "_pb": pd.Series([], dtype="int64")})
        mm = df.merge(df[["l_orderkey", "l_partkey"]], on="l_orderkey")
        mm = mm[mm["l_partkey_x"] < mm["l_partkey_y"]]
        out = mm.drop_duplicates(["l_partkey_x", "l_partkey_y", "m"])
        return pd.DataFrame({
            "a": out["l_partkey_x"].astype("int64").to_numpy(),
            "b": out["l_partkey_y"].astype("int64").to_numpy(),
            "m": out["m"].astype("int64").to_numpy(),
            "_pb": ((out["l_partkey_x"].astype("int64") * 1_000_003
                     + out["l_partkey_y"].astype("int64")) % 64)
            .astype("int64").to_numpy()})

    def churn_partial(df: pd.DataFrame) -> pd.DataFrame:
        cols2 = {"m": pd.Series([], dtype="int64"),
                 "n_edges": pd.Series([], dtype="int64"),
                 "n_common": pd.Series([], dtype="int64")}
        if len(df) == 0 or "a" not in df.columns:
            return pd.DataFrame(cols2)
        d = df.drop_duplicates(["a", "b", "m"]) \
            .sort_values(["a", "b", "m"], kind="mergesort")
        a = d["a"].to_numpy(dtype="int64")
        b = d["b"].to_numpy(dtype="int64")
        m = d["m"].to_numpy(dtype="int64")
        nxt = np.zeros(len(d), dtype=bool)
        if len(d) > 1:
            nxt[:-1] = (a[:-1] == a[1:]) & (b[:-1] == b[1:]) \
                & (m[:-1] + 1 == m[1:])
        out = pd.DataFrame({"m": m, "one": 1,
                            "c": nxt.astype("int64")})
        agg = out.groupby("m", as_index=False).agg(
            n_edges=("one", "sum"), n_common=("c", "sum"))
        for c in ("m", "n_edges", "n_common"):
            agg[c] = agg[c].astype("int64")
        return agg

    parts = joined.map_batches(ob, batch_format="pandas") \
        .groupby("_ob").map_groups(gen_pairs, batch_format="pandas") \
        .groupby("_pb").map_groups(churn_partial, batch_format="pandas") \
        .to_pandas()
    if parts.empty or "m" not in parts.columns:
        return empty
    g = parts.groupby("m", as_index=False)[["n_edges", "n_common"]].sum()
    cnt = dict(zip(g["m"].astype(int), g["n_edges"].astype(int)))
    rows = []
    for m1, n1, c in zip(g["m"].astype(int), g["n_edges"].astype(int),
                         g["n_common"].astype(int)):
        n2 = cnt.get(m1 + 1, 0)
        union = n1 + n2 - c
        rows.append((m1, n1, n2, c, c * 1_000_000 // union))
    rows.sort()
    return pd.DataFrame({
        "month1": pd.Series(np.array([r[0] for r in rows],
                                     dtype="int64").astype("datetime64[M]")
                            .astype("datetime64[us]")),
        "n_edges1": pd.Series([r[1] for r in rows], dtype="int64"),
        "n_edges2": pd.Series([r[2] for r in rows], dtype="int64"),
        "n_common": pd.Series([r[3] for r in rows], dtype="int64"),
        "jaccard_ppm": pd.Series([r[4] for r in rows], dtype="int64")})


_BOM_MAX_NODE = 99


def parts_bom_rollup(sf_dir: str) -> pd.DataFrame:
    """Hierarchical subtree rollup (the BOM-explosion shape) over the
    synthetic decimal prefix tree: node v is an ancestor of part p iff
    v = p // 10ᵏ for some k ≥ 0 (each part is its own depth-0 node and
    the root 0 is counted ONCE per part — the first k where the prefix
    chain hits 0).  For every node ≤ ``_BOM_MAX_NODE``: the part count
    and exact retail cents of its whole subtree.  Output (node,
    n_parts, total_cents) sorted by node.

    Scale shape: ancestor expansion is row-local (≤ 13 vectorized
    prefix divisions per block — no recursion, no exchange) and each
    block emits ≤ 100-node partials, so the driver merge is bounded
    regardless of part count — a recursive-CTE rollup re-expressed as
    a flat bounded fan-out, the way a streaming engine wants it."""
    ds = _read(sf_dir, "part", ["p_partkey", "p_retailprice"])
    cols = ("node", "n_parts", "total_cents")
    empty = pd.DataFrame({
        "node": pd.Series([], dtype="int64"),
        "n_parts": pd.Series([], dtype="int64"),
        "total_cents": pd.Series([], dtype="int64")})

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return empty.copy()
        p = df["p_partkey"].to_numpy(dtype="int64")
        cents = np.floor(
            df["p_retailprice"].to_numpy() * 100 + 0.5).astype("int64")
        nodes, cs = [], []
        for k in range(0, 13):
            a = p // 10**k
            if k == 0:
                # every part is its own depth-0 node (part 0 included)
                emit = a <= _BOM_MAX_NODE
            else:
                # the root 0 is emitted exactly once: at the FIRST k
                # where the prefix chain reaches it (prev > 0)
                prev = p // 10 ** (k - 1)
                emit = (a <= _BOM_MAX_NODE) & ((a > 0) | (prev > 0))
            if emit.any():
                nodes.append(a[emit])
                cs.append(cents[emit])
            if (a == 0).all():
                break
        if not nodes:
            return empty.copy()
        out = pd.DataFrame({"node": np.concatenate(nodes),
                            "cents": np.concatenate(cs)})
        agg = out.groupby("node", as_index=False).agg(
            n_parts=("cents", "size"), total_cents=("cents", "sum"))
        for c in cols:
            agg[c] = agg[c].astype("int64")
        return agg[list(cols)]

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if parts.empty or "node" not in parts.columns:
        return empty
    out = parts.groupby("node", as_index=False)[
        ["n_parts", "total_cents"]].sum()
    for c in cols:
        out[c] = out[c].astype("int64")
    return out.sort_values("node").reset_index(drop=True)


_DUPWIN_US = 3_600_000_000  # 1 hour


def events_dup_within_window(sf_dir: str,
                             window_us: int = _DUPWIN_US) -> pd.DataFrame:
    """Rapid-repeat (retry-storm) audit: an event is a REPEAT iff the
    same (user_id, event_type) fired within ``window_us`` before it
    (LAG over the identical key ordered by (ts, event_id) — the
    double-fire / at-least-once-delivery smell).  Census output
    (event_type, n_events, n_dups, dup_ppm) sorted by type, with
    ``dup_ppm = n_dups·10⁶ // n_events``; both classes are live at the
    gate SFs (184 repeats at sf0.01, 14 at sf0.001).

    Scale shape: user-hash buckets carry whole histories; inside a
    bucket ONE (user, type, ts, event_id) sort + shift compare finds
    every repeat (the key's previous occurrence is always the adjacent
    row), and each bucket emits ≤ |types| count partials."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id",
                                  "event_type"])
    cols = ("event_type", "n_events", "n_dups", "dup_ppm")
    empty = pd.DataFrame({
        "event_type": pd.Series([], dtype=object),
        "n_events": pd.Series([], dtype="int64"),
        "n_dups": pd.Series([], dtype="int64"),
        "dup_ppm": pd.Series([], dtype="int64")})

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_b"] = (df["user_id"].astype("int64") % 64).astype("int64")
        return df[["event_id", "ts", "user_id", "event_type", "_b"]]

    def bucket_census(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "user_id" not in df.columns:
            return empty.copy()
        df = df.sort_values(["user_id", "event_type", "ts",
                             "event_id"], kind="mergesort")
        uid = df["user_id"].to_numpy(dtype="int64")
        et = df["event_type"].to_numpy(dtype=object)
        ts = df["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
        dup = np.zeros(len(df), dtype="int64")
        if len(df) > 1:
            same = (uid[:-1] == uid[1:]) & (et[:-1] == et[1:])
            dup[1:] = (same & (ts[1:] - ts[:-1] <= window_us)) \
                .astype("int64")
        out = pd.DataFrame({"event_type": et, "one": 1, "dup": dup})
        agg = out.groupby("event_type", as_index=False).agg(
            n_events=("one", "sum"), n_dups=("dup", "sum"))
        agg["n_events"] = agg["n_events"].astype("int64")
        agg["n_dups"] = agg["n_dups"].astype("int64")
        return agg

    parts = ds.map_batches(tag, batch_format="pandas") \
        .groupby("_b").map_groups(bucket_census, batch_format="pandas") \
        .to_pandas()
    if parts.empty or "event_type" not in parts.columns:
        return empty
    out = parts.groupby("event_type", as_index=False)[
        ["n_events", "n_dups"]].sum()
    # Python big-ints: n_dups·10⁶ wraps int64 past ~9.2e12 repeats (the
    # twin's SUM(dup)·10⁶ is HUGEINT); O(|types|) driver work
    out["dup_ppm"] = [int(d) * 1_000_000 // int(n)
                      for d, n in zip(out["n_dups"], out["n_events"])]
    for c in cols[1:]:
        out[c] = out[c].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


def orders_backtest_mae(sf_dir: str) -> pd.DataFrame:
    """Forecast backtesting over monthly revenue: one-step-ahead MAE of
    the naive forecast (previous calendar month) vs the seasonal naive
    (same month last year), each evaluated on every observed month
    whose reference month is also observed —
    ``mae_cents = Σ|actual−forecast| // n_eval`` (integer cents, DuckDB
    trunc-div on non-negatives).  The model-selection primitive behind
    orders_holt_forecast: which baseline must a real model beat.
    Output (method, n_eval, mae_cents) for 'naive_1' and 'seasonal_12'.

    Scale shape: per-block (month, cents) partials — the monthly table
    is bounded by the time horizon, so the driver fold over two lag
    self-matches is O(months); no exchange anywhere."""
    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        m = pd.to_datetime(df["o_orderdate"]).to_numpy() \
            .astype("datetime64[M]").astype("int64")
        cents = np.floor(
            df["o_totalprice"].to_numpy() * 100 + 0.5).astype("int64")
        out = pd.DataFrame({"m": m, "cents": cents}) \
            .groupby("m", as_index=False)["cents"].sum()
        out["m"] = out["m"].astype("int64")
        out["cents"] = out["cents"].astype("int64")
        return out

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    rows = []
    if parts.empty or "m" not in parts.columns:
        rev = {}
    else:
        g = parts.groupby("m", as_index=False)["cents"].sum()
        rev = dict(zip(g["m"].astype(int), g["cents"].astype(int)))
    for method, lag in (("naive_1", 1), ("seasonal_12", 12)):
        errs = [abs(c - rev[m - lag]) for m, c in rev.items()
                if m - lag in rev]
        mae = sum(errs) // len(errs) if errs else 0
        rows.append((method, len(errs), mae))
    rows.sort()
    return pd.DataFrame({
        "method": [r[0] for r in rows],
        "n_eval": pd.Series([r[1] for r in rows], dtype="int64"),
        "mae_cents": pd.Series([r[2] for r in rows], dtype="int64")})


def parts_croston(sf_dir: str) -> pd.DataFrame:
    """Croston intermittent-demand forecast per part over its monthly
    demand series: two coupled integer EWMAs with α=¼ — demand size
    ``z_j = (3z+q_j)//4`` (z₁ = q₁, centi-qty) and inter-demand
    interval ``p_j = (3p+i_j)//4`` (p₂ = i₂ months) — the
    events_daily_ewma floor-div recurrence contract, so the DuckDB twin
    replays both with ONE recursive CTE.  Forecast = z // p centi-qty
    per month; parts with a single demand month emit nothing (no
    interval exists).  Output (p_partkey, n_demands, z_cq, p_m,
    forecast_cq) sorted by part.

    Scale shape: the distributed piece is the (part, month) demand
    reduction (per-batch partials); each part's complete bounded series
    lands in its part-hash bucket where the sequential scan runs IN the
    worker — per-key recurrences distribute by key, never on the
    driver."""
    ds = _read(sf_dir, "lineitem", ["l_partkey", "l_shipdate",
                                    "l_quantity"])
    cols = ("p_partkey", "n_demands", "z_cq", "p_m", "forecast_cq")
    empty = pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        m = pd.to_datetime(df["l_shipdate"]).to_numpy() \
            .astype("datetime64[M]").astype("int64")
        cq = np.floor(
            df["l_quantity"].to_numpy() * 100 + 0.5).astype("int64")
        out = pd.DataFrame({"p": df["l_partkey"].astype("int64"),
                            "m": m, "cq": cq}) \
            .groupby(["p", "m"], as_index=False)["cq"].sum()
        out["_b"] = (out["p"] % 64).astype("int64")
        return out

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "p" not in df.columns:
            return empty.copy()
        df = df.groupby(["p", "m"], as_index=False)["cq"].sum() \
            .sort_values(["p", "m"], kind="mergesort")
        rows = []
        for pk, g in df.groupby("p", sort=False):
            if len(g) < 2:
                continue
            ms = g["m"].to_numpy(dtype="int64")
            qs = g["cq"].to_numpy(dtype="int64")
            z = int(qs[0])
            p_m = 0
            for j in range(1, len(g)):
                z = (3 * z + int(qs[j])) // 4
                gap = int(ms[j] - ms[j - 1])
                p_m = gap if j == 1 else (3 * p_m + gap) // 4
            rows.append((int(pk), len(g), z, p_m, z // p_m))
        if not rows:
            return empty.copy()
        out = pd.DataFrame(rows, columns=list(cols))
        for c in cols:
            out[c] = out[c].astype("int64")
        return out

    out = ds.map_batches(partial, batch_format="pandas") \
        .groupby("_b").map_groups(scan, batch_format="pandas") \
        .to_pandas()
    if out.empty or "p_partkey" not in out.columns:
        return empty
    for c in cols:
        out[c] = out[c].astype("int64")
    return out.sort_values("p_partkey").reset_index(drop=True)


# ---------------------------------------------------------------------------
# storage-layout operator: RLE run census — how RLE-encodable is each column
# under the table's natural (l_orderkey, l_linenumber) clustering?  Zone-map
# sibling of lineitem_manifest_stats: per-block internal transition counts
# plus block-edge values, stitched in O(blocks) on the driver.
# ---------------------------------------------------------------------------


def lineitem_rle_runs(sf_dir: str) -> pd.DataFrame:
    """Run-length census per column under the global
    ``(l_orderkey, l_linenumber)`` order: for each of ``l_orderkey``,
    ``l_returnflag``, ``l_linestatus``, ``l_suppkey`` report
    (column_name, n_rows, n_runs, avg_run_len_ppm) — the encoder's-eye
    view a columnar writer (parquet RLE_DICTIONARY, Lance) uses to pick
    encodings.  ``n_runs`` counts change-points including the first row;
    ``avg_run_len_ppm = n_rows·10⁶ // n_runs`` (Python big-ints, so a
    10¹³-row table cannot wrap int64).

    Scale shape: one range sort on the composite key (the table's
    native clustering, so at 100 TB this sort is a no-op re-read of
    already-clustered files), then ONE pass with ``batch_size=None``
    pinning batch==block: each block emits 1 summary row per column
    (internal transition count + first/last value + block min key).
    The driver stitches at block boundaries — O(blocks·columns) rows,
    never the data."""
    cols = ["l_orderkey", "l_returnflag", "l_linestatus", "l_suppkey"]
    # (l_orderkey, l_linenumber) is NOT unique, so the sort appends every
    # counted column: rows that still tie are identical in all counted
    # values, making run counts invariant under tie order — without this
    # a multi-block distributed sort and the oracle's ORDER BY can break
    # ties differently and disagree on n_runs (found at the synthesized
    # sf1; a single-block sf0.1 read masked it)
    sort_cols = ["l_orderkey", "l_linenumber",
                 "l_suppkey", "l_returnflag", "l_linestatus"]
    ds = _read(sf_dir, "lineitem", ["l_linenumber"] + cols) \
        .sort(sort_cols)

    def block_summary(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "column_name": pd.Series([], dtype="object"),
                "n_rows": pd.Series([], dtype="int64"),
                "n_trans": pd.Series([], dtype="int64"),
                "first_v": pd.Series([], dtype="object"),
                "last_v": pd.Series([], dtype="object"),
                "min_key": pd.Series([], dtype="object")})
        # total-order stitch key (zero-padded lexicographic == sort
        # order): blocks whose first rows tie on the partial key would
        # otherwise stitch in the wrong order at run boundaries
        r0 = df.iloc[0]
        min_key = (f"{int(r0['l_orderkey']):020d}|"
                   f"{int(r0['l_linenumber']):010d}|"
                   f"{int(r0['l_suppkey']):020d}|"
                   f"{r0['l_returnflag']}|{r0['l_linestatus']}")
        rows = []
        for c in cols:
            v = df[c].to_numpy()
            n_trans = int((v[1:] != v[:-1]).sum())
            rows.append((c, len(v), n_trans, str(v[0]), str(v[-1]),
                         min_key))
        return pd.DataFrame(rows, columns=["column_name", "n_rows",
                                           "n_trans", "first_v",
                                           "last_v", "min_key"])

    parts = ds.map_batches(block_summary, batch_format="pandas",
                           batch_size=None).to_pandas()
    out_cols = ("column_name", "n_rows", "n_runs", "avg_run_len_ppm")
    if parts.empty or "column_name" not in parts.columns:
        return pd.DataFrame({
            "column_name": pd.Series([], dtype="object"),
            "n_rows": pd.Series([], dtype="int64"),
            "n_runs": pd.Series([], dtype="int64"),
            "avg_run_len_ppm": pd.Series([], dtype="int64")})
    rows = []
    for c in cols:
        g = parts[parts["column_name"] == c].sort_values("min_key")
        if len(g) == 0:
            continue
        n_rows = int(g["n_rows"].sum())
        # each block contributes (1 + internal transitions) runs; a
        # boundary where prev.last == next.first merges two runs
        n_runs = int(g["n_trans"].sum()) + len(g)
        lasts = g["last_v"].to_numpy()
        firsts = g["first_v"].to_numpy()
        n_runs -= int((lasts[:-1] == firsts[1:]).sum())
        rows.append((c, n_rows, n_runs,
                     n_rows * 1_000_000 // n_runs))
    out = pd.DataFrame(rows, columns=list(out_cols))
    for c in ("n_rows", "n_runs", "avg_run_len_ppm"):
        out[c] = out[c].astype("int64")
    return out.sort_values("column_name").reset_index(drop=True)


# ---------------------------------------------------------------------------
# lead–lag analysis: which daily series leads, views or purchases?  Exact
# integer regression betas at lags −3..+3 (the events_autocorr centering
# contract, cross-series).
# ---------------------------------------------------------------------------


def events_lead_lag(sf_dir: str, max_lag: int = 3) -> pd.DataFrame:
    """Cross-correlation-style lead–lag betas between the daily ``view``
    and ``purchase`` count series: for lag k ∈ [−3, 3],
    ``beta_ppm = 10⁶·Σₜ eˣ_t·eʸ_{t+k}  trunc-div  Σₜ (eˣ_t)²`` where
    both series are gap-filled with zeros over the union calendar and
    centered exactly as integers (e_t = n·x_t − Σx, the events_autocorr
    contract — the n² factors cancel).  A positive beta at k>0 means
    views lead purchases by k days.  Output (lag, n_days, beta_ppm),
    one row per lag; a constant view series (den = 0) pins every beta
    to 0.

    Scale shape: per-block (day, type) count partials reduce the event
    log to ≤ |days|·2·blocks integer rows; the driver merges them and
    computes the O(max_lag·n_days) moment sums in Python big-ints
    (HUGEINT-safe at any event volume, like orders_changepoint)."""
    ds = _read(sf_dir, "events", ["ts", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"].isin(("view", "purchase"))]
        if len(df) == 0:
            return pd.DataFrame({"day": pd.Series([], dtype="int64"),
                                 "is_p": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64")})
        days = df["ts"].to_numpy().astype("datetime64[D]").astype("int64")
        is_p = (df["event_type"].to_numpy() == "purchase").astype("int64")
        g = pd.DataFrame({"day": days, "is_p": is_p}) \
            .groupby(["day", "is_p"], as_index=False).size() \
            .rename(columns={"size": "n"})
        return g

    cols = ("lag", "n_days", "beta_ppm")
    empty = pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})
    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if parts.empty or "day" not in parts.columns:
        return empty
    g = parts.groupby(["day", "is_p"])["n"].sum()
    lo = int(parts["day"].min())
    hi = int(parts["day"].max())
    n = hi - lo + 1
    x = np.zeros(n, dtype="int64")
    y = np.zeros(n, dtype="int64")
    for (day, is_p), cnt in g.items():
        (y if is_p else x)[int(day) - lo] = int(cnt)
    s_x, s_y = int(x.sum()), int(y.sum())
    ex = [n * int(v) - s_x for v in x]
    ey = [n * int(v) - s_y for v in y]
    den = sum(v * v for v in ex)

    def tdiv(a: int, b: int) -> int:
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    rows = []
    for k in range(-max_lag, max_lag + 1):
        num = 0
        for t in range(n):
            if 0 <= t + k < n:
                num += ex[t] * ey[t + k]
        beta = 0 if den == 0 else tdiv(1_000_000 * num, den)
        rows.append((k, n, beta))
    out = pd.DataFrame(rows, columns=list(cols))
    for c in cols:
        out[c] = out[c].astype("int64")
    return out


# ---------------------------------------------------------------------------
# Katz-style walk-count centrality: attenuated counts of length-1/2/3 walks
# ending at each node of the co-order graph (β=1/4, integer-scaled ×4³ so
# katz_64 = 16·w1 + 4·w2 + w3 is exact) — the walk-counting sibling of
# parts_pagerank's normalized propagation.
# ---------------------------------------------------------------------------

_KATZ_SUPPORT = 2
_KATZ_TOP = 20


def parts_katz(sf_dir: str, support: int = _KATZ_SUPPORT,
               k: int = _KATZ_TOP) -> pd.DataFrame:
    """Top-``k`` parts by truncated Katz centrality over the co-order
    graph (pairs co-ordered in ≥ ``support`` orders): w_j[v] = number of
    length-j walks ending at v (w1 = degree, w_{j+1}[v] = Σ_{u~v} w_j[u]),
    ``katz_64 = 16·w1 + 4·w2 + w3`` (β=¼ scaled by 4³ — exact integers,
    no float attenuation).  Ties pinned (katz_64 DESC, part ASC).
    Output (p_partkey, w1, w2, w3, katz_64).

    Scale shape: the edge table is materialized once (loop-invariant);
    each propagation is one hash-shuffle ``Dataset.join`` on src plus a
    dst-hash bucket reduction — walk counts live in node-keyed datasets,
    never on the driver.  The three series are aligned with ONE tagged
    union + per-node-bucket pivot instead of two more joins.  Walk
    counts fit int64 for max degree ≤ ~2·10⁶ (Δ³ < 2⁶³); the DuckDB
    twin runs HUGEINT throughout."""
    edges = _co_order_pair_counts(sf_dir, support)

    def symmetrize(df: pd.DataFrame) -> pd.DataFrame:
        a = df["a_id"].astype("int64")
        b = df["b_id"].astype("int64")
        return pd.DataFrame({"src": pd.concat([a, b], ignore_index=True),
                             "dst": pd.concat([b, a], ignore_index=True)})

    edges = edges.map_batches(symmetrize, batch_format="pandas") \
        .materialize()
    out_cols = ("p_partkey", "w1", "w2", "w3", "katz_64")
    empty = pd.DataFrame({c: pd.Series([], dtype="int64")
                          for c in out_cols})
    if edges.count() == 0:
        return empty

    def degree(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("dst", as_index=False).size() \
            .rename(columns={"dst": "node", "size": "w"})
        out["_d"] = (out["node"] % 64).astype("int64")
        return out

    def merge_w(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("node", as_index=False)["w"].sum()
        out["node"] = out["node"].astype("int64")
        out["w"] = out["w"].astype("int64")
        return out

    n_parts = _join_partitions(sf_dir, "lineitem", selectivity=0.5,
                               cap=16)

    def propagate(w_ds):
        """w_{j+1} = A · w_j : join edges on src, reduce per dst."""
        joined = edges.join(w_ds, join_type="inner",
                            num_partitions=n_parts,
                            on=("src",), right_on=("node",))

        def contrib(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame({"node": df["dst"].astype("int64"),
                                "w": df["w"].astype("int64")})
            out = out.groupby("node", as_index=False)["w"].sum()
            out["_d"] = (out["node"] % 64).astype("int64")
            return out

        return joined.map_batches(contrib, batch_format="pandas") \
            .groupby("_d").map_groups(merge_w, batch_format="pandas") \
            .materialize()

    w1 = edges.map_batches(degree, batch_format="pandas") \
        .groupby("_d").map_groups(merge_w, batch_format="pandas") \
        .materialize()
    w2 = propagate(w1)
    w3 = propagate(w2)

    def tag(j):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            out = df[["node", "w"]].copy()
            out["j"] = np.int64(j)
            out["_n"] = (out["node"] % 64).astype("int64")
            return out
        return f

    def pivot_top(df: pd.DataFrame) -> pd.DataFrame:
        p = df.pivot_table(index="node", columns="j", values="w",
                           aggfunc="sum", fill_value=0).reset_index()
        out = pd.DataFrame({"p_partkey": p["node"].astype("int64")})
        for j, c in ((1, "w1"), (2, "w2"), (3, "w3")):
            out[c] = (p[j].astype("int64") if j in p.columns
                      else np.zeros(len(p), dtype="int64"))
        out["katz_64"] = 16 * out["w1"] + 4 * out["w2"] + out["w3"]
        return out.sort_values(["katz_64", "p_partkey"],
                               ascending=[False, True],
                               kind="mergesort").head(k)

    tops = w1.map_batches(tag(1), batch_format="pandas") \
        .union(w2.map_batches(tag(2), batch_format="pandas"),
               w3.map_batches(tag(3), batch_format="pandas")) \
        .groupby("_n").map_groups(pivot_top, batch_format="pandas") \
        .to_pandas()
    if tops.empty or "p_partkey" not in tops.columns:
        return empty
    out = tops.sort_values(["katz_64", "p_partkey"],
                           ascending=[False, True],
                           kind="mergesort").head(k)
    for c in out_cols:
        out[c] = out[c].astype("int64")
    return out[list(out_cols)].reset_index(drop=True)


# ---------------------------------------------------------------------------
# community detection: synchronous label propagation (4 rounds, most-
# frequent neighbor label, ties → smallest label) over the co-order graph —
# the community sibling of parts_components' connectivity labels.
# ---------------------------------------------------------------------------

_LPA_SUPPORT = 3
_LPA_ROUNDS = 4


def _lpa_label_dataset(sf_dir: str, support: int, rounds: int):
    """(edges, labels) after ``rounds`` synchronous LPA rounds over the
    co-order graph — the shared core of parts_label_propagation and
    parts_modularity: symmetrized materialized edge Dataset plus the
    node-keyed (node, lab) label Dataset.  Returns (None, None) on an
    empty graph.  Each round is one hash-shuffle ``Dataset.join``
    (labels attach to edges on src) plus a dst-hash-bucket vectorized
    mode (groupby-count → sort → first) — labels live in node-keyed
    datasets, never on the driver."""
    def symmetrize(df: pd.DataFrame) -> pd.DataFrame:
        a = df["a_id"].astype("int64")
        b = df["b_id"].astype("int64")
        return pd.DataFrame({
            "a_id": pd.concat([a, b], ignore_index=True),
            "b_id": pd.concat([b, a], ignore_index=True)})

    edges = _co_order_pair_counts(sf_dir, support) \
        .map_batches(symmetrize, batch_format="pandas").materialize()
    if edges.count() == 0:
        return None, None

    def init_labels(df: pd.DataFrame) -> pd.DataFrame:
        n = df["a_id"].astype("int64")
        out = pd.DataFrame({"node": n}).drop_duplicates()
        out["lab"] = out["node"]
        out["_d"] = (out["node"] % 64).astype("int64")
        return out

    def dedup_nodes(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates("node")[["node", "lab"]]

    labels = edges.map_batches(init_labels, batch_format="pandas") \
        .groupby("_d").map_groups(dedup_nodes, batch_format="pandas") \
        .materialize()

    n_parts = _join_partitions(sf_dir, "lineitem", selectivity=0.3,
                               cap=16)

    def neighbor_mode(df: pd.DataFrame) -> pd.DataFrame:
        cnt = df.groupby(["dst", "lab"], as_index=False).size()
        cnt = cnt.sort_values(["dst", "size", "lab"],
                              ascending=[True, False, True],
                              kind="mergesort")
        out = cnt.drop_duplicates("dst")
        return pd.DataFrame({"node": out["dst"].astype("int64"),
                             "lab": out["lab"].astype("int64")})

    for _ in range(rounds):
        joined = edges.join(labels, join_type="inner",
                            num_partitions=n_parts,
                            on=("a_id",), right_on=("node",))

        def project(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame({"dst": df["b_id"].astype("int64"),
                                "lab": df["lab"].astype("int64")})
            out["_d"] = (out["dst"] % 64).astype("int64")
            return out

        labels = joined.map_batches(project, batch_format="pandas") \
            .groupby("_d").map_groups(neighbor_mode,
                                      batch_format="pandas") \
            .materialize()

    return edges, labels


def parts_label_propagation(sf_dir: str, support: int = _LPA_SUPPORT,
                            rounds: int = _LPA_ROUNDS) -> pd.DataFrame:
    """Synchronous label propagation over the co-order part graph
    (support ≥ ``support``): every node starts labeled with its own id;
    each of ``rounds`` rounds relabels EVERY node with the most frequent
    label among its neighbors, ties → smallest label.  Fixed round
    count + pinned ties make the (possibly non-converged) fixpoint
    deterministic on both sides.  Output is the community census
    (community_id = final label, n_parts, part_checksum), sorted.

    Scale shape: :func:`_lpa_label_dataset` (per-round hash-shuffle
    join + bucket mode); the census runs under label-hash buckets.  The
    twin replays the rounds as chained window-CTEs."""
    empty = pd.DataFrame({"community_id": pd.Series([], dtype="int64"),
                          "n_parts": pd.Series([], dtype="int64"),
                          "part_checksum": pd.Series([], dtype="int64")})
    edges, labels = _lpa_label_dataset(sf_dir, support, rounds)
    if labels is None:
        return empty

    def lab_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_lb"] = (df["lab"].astype("int64") % 64).astype("int64")
        return df

    def census(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("lab", as_index=False).agg(
            n_parts=("node", "size"), part_checksum=("node", "sum"))
        return out.rename(columns={"lab": "community_id"})

    out = labels.map_batches(lab_bucket, batch_format="pandas") \
        .groupby("_lb").map_groups(census, batch_format="pandas") \
        .to_pandas()
    if not len(out):
        return empty
    for c in ("community_id", "n_parts", "part_checksum"):
        out[c] = out[c].astype("int64")
    return out.sort_values("community_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# per-group MODE with a deterministic tie rule: the modal order priority per
# order month (the reference's status-count shape taken one step further —
# argmax of a census instead of the census itself)
# ---------------------------------------------------------------------------


def orders_mode_priority(sf_dir: str) -> pd.DataFrame:
    """Modal ``o_orderpriority`` per order month; ties break to the
    lexicographically smallest priority.  Output
    (month, mode_priority, n_mode) — n_mode = how many orders carry the
    modal priority that month.

    Scale shape: per-batch (month, priority) count partials collapse the
    fact stream to a ≤ months×|priorities| projection (both bounded);
    one tiny groupby merges partials and the argmax per month runs on
    the bounded census — no row-level exchange, no driver structure over
    orders."""
    ds = _read(sf_dir, "orders", ["o_orderdate", "o_orderpriority"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "month": pd.Series([], dtype="datetime64[ns]"),
                "o_orderpriority": pd.Series([], dtype=object),
                "n": pd.Series([], dtype="int64")})
        df = df.copy()
        df["month"] = df["o_orderdate"].dt.to_period("M").dt.to_timestamp()
        out = df.groupby(["month", "o_orderpriority"], as_index=False) \
            .size().rename(columns={"size": "n"})
        return out

    census = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if census.empty:
        return pd.DataFrame({
            "month": pd.Series([], dtype="datetime64[ns]"),
            "mode_priority": pd.Series([], dtype=object),
            "n_mode": pd.Series([], dtype="int64")})
    census = census.groupby(["month", "o_orderpriority"], as_index=False)["n"].sum()
    # argmax per month: highest n first, then lexicographically smallest
    census = census.sort_values(
        ["month", "n", "o_orderpriority"],
        ascending=[True, False, True], kind="mergesort")
    out = census.groupby("month", as_index=False).first() \
        .rename(columns={"o_orderpriority": "mode_priority", "n": "n_mode"})
    out["n_mode"] = out["n_mode"].astype("int64")
    return out[["month", "mode_priority", "n_mode"]] \
        .sort_values("month").reset_index(drop=True)


# ---------------------------------------------------------------------------
# fixed-point periodogram: DFT power of the hourly event-count series at a
# few candidate periods — the seasonality-detection scan a scheduling or
# anomaly pipeline runs before fitting seasonal models.  Integer micro
# cos/sin tables make the spectral sums exact and order-free; |DFT|² is
# time-shift invariant, so the absolute epoch-hour index needs no anchoring.
# ---------------------------------------------------------------------------

_DFT_PERIODS = (8, 12, 24, 168)


def _dft_tables(periods=_DFT_PERIODS) -> dict:
    """round(cos/sin(2πk/P)·10⁶) integer tables (libm + Python round —
    the oracle generator recomputes them independently)."""
    import math

    tabs = {}
    for p in periods:
        tabs[p] = ([round(math.cos(2 * math.pi * k / p) * 1_000_000)
                    for k in range(p)],
                   [round(math.sin(2 * math.pi * k / p) * 1_000_000)
                    for k in range(p)])
    return tabs


def events_periodogram(sf_dir: str) -> pd.DataFrame:
    """Relative DFT power (ppm of the summed candidate-period powers) of
    the hourly event-count series at periods 8/12/24/168 h.

    Scale shape: the fact stream collapses to (epoch-hour, n) partials
    inside ``map_batches`` and ONE bounded-calendar census reaches the
    driver (hours grow with time, not data volume); the spectral fold
    runs there with Python big-int accumulation — Σ n_h·cos table values
    passes 2⁶³ on a web-scale corpus (the twin's SUM is HUGEINT)."""
    ds = _read(sf_dir, "events", ["ts"])
    cols = ("period", "power_ppm")
    empty = pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"h": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64")})
        h = (df["ts"].to_numpy().astype("datetime64[us]").astype("int64")
             // 3_600_000_000)
        return pd.DataFrame({"h": h}).groupby("h", as_index=False) \
            .size().rename(columns={"size": "n"})

    hours = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if hours.empty:
        return empty
    hours = hours.groupby("h", as_index=False)["n"].sum()
    hs = hours["h"].to_numpy(dtype="int64")
    ns = hours["n"].to_numpy(dtype="int64")
    tabs = _dft_tables()
    powers = {}
    for p in _DFT_PERIODS:
        ct, st = tabs[p]
        k = hs % p
        # Python big-int folds (exact at any corpus size)
        sc = sum(int(n) * ct[int(kk)] for n, kk in zip(ns, k))
        ss = sum(int(n) * st[int(kk)] for n, kk in zip(ns, k))
        powers[p] = sc * sc + ss * ss
    total = sum(powers.values())
    out = pd.DataFrame({
        "period": pd.Series(sorted(powers), dtype="int64"),
        "power_ppm": pd.Series(
            [powers[p] * 1_000_000 // total if total else 0
             for p in sorted(powers)], dtype="int64")})
    return out


# ---------------------------------------------------------------------------
# Kleinberg-style 2-state burst detection over the daily event-count series:
# per-day Viterbi forward costs for a base-rate state (λ0 = daily mean) and
# a burst state (λ1 = 2λ0), Poisson NLL in integer micro-nats with a fixed
# entry penalty — the burst-window detector a trend-monitoring pipeline
# runs over crawl or query logs.
# ---------------------------------------------------------------------------

_BURST_GAMMA = 2_000_000  # state-entry penalty (2.0 in micro units)


def events_burst_detect(sf_dir: str) -> pd.DataFrame:
    """Per-day forward Viterbi costs of the 2-state burst HMM over the
    full day calendar (gap days count 0 events).  Output
    (day, n_events, rdp0, rdp1, state): costs are normalized by the
    day's min so the emitted integers stay int64-bounded at any scale
    (the raw prefix costs grow with the series), state = argmin with
    ties → base state 0.

    Cost contract (mirrored exactly by the recursive-CTE twin):
    ``cost_s(d) = λ_s·10⁶ − c_d·round(ln(λ_s)·10⁶)`` with
    ``λ0 = max(1, total // n_days)``, ``λ1 = 2·λ0``; transitions charge
    ``γ = 2·10⁶`` on 0→1 only; day 1 starts ``(cost0, γ + cost1)``.

    Scale shape: the fact stream collapses to per-day count partials;
    the sequential DP runs on the driver over the BOUNDED day calendar
    (the changepoint/CUSUM argument) with Python-int accumulation."""
    import math

    ds = _read(sf_dir, "events", ["ts"])
    cols = ("day", "n_events", "rdp0", "rdp1", "state")
    empty = pd.DataFrame({
        "day": pd.Series([], dtype="datetime64[ns]"),
        "n_events": pd.Series([], dtype="int64"),
        "rdp0": pd.Series([], dtype="int64"),
        "rdp1": pd.Series([], dtype="int64"),
        "state": pd.Series([], dtype="int64")})

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "day": pd.Series([], dtype="datetime64[ns]"),
                "n": pd.Series([], dtype="int64")})
        df = pd.DataFrame({"day": df["ts"].dt.floor("D")})
        return df.groupby("day", as_index=False).size() \
            .rename(columns={"size": "n"})

    days = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if days.empty:
        return empty
    days = days.groupby("day", as_index=False)["n"].sum() \
        .sort_values("day").reset_index(drop=True)
    # full calendar: gap days are 0-event days
    cal = pd.date_range(days["day"].min(), days["day"].max(), freq="D")
    series = days.set_index("day")["n"].reindex(cal, fill_value=0)
    c = [int(x) for x in series.to_numpy()]
    total, n_days = sum(c), len(c)
    lam0 = max(1, total // n_days)
    lam1 = 2 * lam0
    l0 = round(math.log(lam0) * 1_000_000)
    l1 = round(math.log(lam1) * 1_000_000)
    dp0 = dp1 = 0
    rows = []
    for i, cd in enumerate(c):
        cost0 = lam0 * 1_000_000 - cd * l0
        cost1 = lam1 * 1_000_000 - cd * l1
        if i == 0:
            dp0, dp1 = cost0, _BURST_GAMMA + cost1
        else:
            dp0, dp1 = (cost0 + min(dp0, dp1),
                        cost1 + min(dp0 + _BURST_GAMMA, dp1))
        m = min(dp0, dp1)
        rows.append((cal[i], cd, dp0 - m, dp1 - m, 0 if dp0 <= dp1 else 1))
    return pd.DataFrame({
        "day": [r[0] for r in rows],
        "n_events": pd.Series([r[1] for r in rows], dtype="int64"),
        "rdp0": pd.Series([r[2] for r in rows], dtype="int64"),
        "rdp1": pd.Series([r[3] for r in rows], dtype="int64"),
        "state": pd.Series([r[4] for r in rows], dtype="int64")})


# ---------------------------------------------------------------------------
# sliding-window distinct via HLL register merge: the same 256-register
# sketch as events_hll_registers built PER DAY, then max-merged over a
# trailing 7-day window — the mergeability property that makes sketches the
# right distinct-count tool at scale, exercised end-to-end with exact
# integer outputs (register sums, not float estimates).
# ---------------------------------------------------------------------------


def events_hll_sliding(sf_dir: str) -> pd.DataFrame:
    """Per day (days present in the data): the trailing-7-day max-merge
    of the daily HLL register tables, reported as (day, sum_rank,
    n_buckets) — the integer register-level projection of the merged
    sketch (sum of register values, count of non-empty registers).

    Scale shape: per-batch distinct users → (day, bucket, rank) partials
    → one (day, bucket) groupby MAX; the exchange is O(days × 256 ×
    blocks) integers regardless of user cardinality, and the window
    merge folds the bounded days×256 register census on the driver."""
    import hashlib

    ds = _read(sf_dir, "events", ["ts", "user_id"])
    cols = ("day", "sum_rank", "n_buckets")
    empty = pd.DataFrame({
        "day": pd.Series([], dtype="datetime64[ns]"),
        "sum_rank": pd.Series([], dtype="int64"),
        "n_buckets": pd.Series([], dtype="int64")})

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "day": pd.Series([], dtype="datetime64[ns]"),
                "bucket": pd.Series([], dtype="int64"),
                "max_rank": pd.Series([], dtype="int64")})
        df = pd.DataFrame({"day": df["ts"].dt.floor("D"),
                           "user_id": df["user_id"]}) \
            .drop_duplicates(["day", "user_id"])
        h = df["user_id"].map(lambda u: int(
            hashlib.md5(str(u).encode()).hexdigest()[:15], 16))
        out = pd.DataFrame({
            "day": df["day"].to_numpy(),
            "bucket": (h % _HLL_M).to_numpy(dtype="int64"),
            "max_rank": np.array(
                [(_HLL_REST_BITS + 1) - int(r).bit_length()
                 for r in (h // _HLL_M)], dtype="int64")})
        return out.groupby(["day", "bucket"], as_index=False).max()

    regs = ds.map_batches(partial, batch_format="pandas") \
        .groupby(["day", "bucket"]).max("max_rank").to_pandas()
    if regs.empty:
        return empty
    regs = regs.rename(columns={"max(max_rank)": "max_rank"})
    days = np.sort(regs["day"].unique())
    rows = []
    for d in days:
        lo = d - np.timedelta64(6, "D")
        win = regs[(regs["day"] >= lo) & (regs["day"] <= d)]
        merged = win.groupby("bucket")["max_rank"].max()
        rows.append((d, int(merged.sum()), len(merged)))
    return pd.DataFrame({
        "day": [r[0] for r in rows],
        "sum_rank": pd.Series([r[1] for r in rows], dtype="int64"),
        "n_buckets": pd.Series([r[2] for r in rows], dtype="int64")})


# ---------------------------------------------------------------------------
# maximal independent set over the co-order part graph: Luby-style parallel
# rounds with the MIN-ID rule (an undecided node enters the MIS when its id
# beats every undecided neighbor; MIS neighbors exclude).  The parallel
# fixpoint equals the sequential greedy-by-ascending-id MIS, which the
# pinned oracle recomputes independently (the parts_mst two-algorithm
# pinning pattern).
# ---------------------------------------------------------------------------

_MIS_MAX_ROUNDS = 64
_MIS_SENTINEL = np.int64(2) ** 62


def parts_mis(sf_dir: str, support: int = 2) -> pd.DataFrame:
    """(part, in_mis) for every node of the support-≥2 co-order graph.

    Scale shape: statuses live in node-keyed datasets; each round is ONE
    hash-shuffle join (statuses onto edge sources) plus one node-bucket
    exchange of (min undecided neighbor, MIS-neighbor flag) partials —
    the same per-round cost as one label-propagation round.  Joining and
    excluding fold into a single update because two adjacent nodes can
    never enter together (one has the smaller id) and a node adjacent to
    a new MIS member sees the flag next round, before its own min-id
    test can fire.  Terminates in ≤ rounds(graph) rounds (the minimum
    undecided id always enters); a 64-round backstop raises rather than
    returning a non-maximal set."""
    def symmetrize(df: pd.DataFrame) -> pd.DataFrame:
        a = df["a_id"].astype("int64")
        b = df["b_id"].astype("int64")
        return pd.DataFrame({
            "src": pd.concat([a, b], ignore_index=True),
            "dst": pd.concat([b, a], ignore_index=True)})

    edges = _co_order_pair_counts(sf_dir, support) \
        .map_batches(symmetrize, batch_format="pandas").materialize()
    empty = pd.DataFrame({"part": pd.Series([], dtype="int64"),
                          "in_mis": pd.Series([], dtype="int64")})
    if edges.count() == 0:
        return empty

    def init_status(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"node": df["src"].astype("int64")}) \
            .drop_duplicates()
        out["st"] = np.int64(0)          # 0 undecided / 1 MIS / 2 excluded
        out["min_und"] = _MIS_SENTINEL
        out["has_mis"] = np.int64(0)
        out["kind"] = np.int64(0)
        out["_n"] = (out["node"] % 64).astype("int64")
        return out

    def dedup_nodes(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates("node")[
            ["node", "st", "min_und", "has_mis", "kind", "_n"]]

    status = edges.map_batches(init_status, batch_format="pandas") \
        .groupby("_n").map_groups(dedup_nodes, batch_format="pandas") \
        .materialize()

    n_parts = _join_partitions(sf_dir, "lineitem", selectivity=0.3, cap=16)

    def n_undecided(ds) -> int:
        parts = ds.map_batches(
            lambda df: pd.DataFrame(
                {"n": pd.Series([int((df["st"] == 0).sum())],
                                dtype="int64")}),
            batch_format="pandas").to_pandas()
        return int(parts["n"].sum()) if len(parts) else 0

    def nb_info(df: pd.DataFrame) -> pd.DataFrame:
        """Edge rows carrying the source's status → per-dst partials."""
        und = df[df["st"] == 0]
        mi = df[df["st"] == 1]
        a = und.groupby("dst", as_index=False)["src"].min() \
            .rename(columns={"dst": "node", "src": "min_und"})
        b = mi[["dst"]].drop_duplicates().rename(columns={"dst": "node"})
        a["has_mis"] = np.int64(0)
        b["min_und"] = _MIS_SENTINEL
        b["has_mis"] = np.int64(1)
        out = pd.concat([a, b], ignore_index=True)
        if len(out) == 0:
            return pd.DataFrame({
                "node": pd.Series([], dtype="int64"),
                "st": pd.Series([], dtype="int64"),
                "min_und": pd.Series([], dtype="int64"),
                "has_mis": pd.Series([], dtype="int64"),
                "kind": pd.Series([], dtype="int64"),
                "_n": pd.Series([], dtype="int64")})
        out["node"] = out["node"].astype("int64")
        out["min_und"] = out["min_und"].astype("int64")
        out["st"] = np.int64(-1)
        out["kind"] = np.int64(1)
        out["_n"] = (out["node"] % 64).astype("int64")
        return out[["node", "st", "min_und", "has_mis", "kind", "_n"]]

    def decide(df: pd.DataFrame) -> pd.DataFrame:
        st = df[df["kind"] == 0]
        nb = df[df["kind"] == 1].groupby("node", as_index=False).agg(
            nb_min=("min_und", "min"), nb_mis=("has_mis", "max"))
        m = st.merge(nb, on="node", how="left")
        und = (m["st"] == 0).to_numpy()
        has_mis = (m["nb_mis"].fillna(0) == 1).to_numpy()
        min_und = m["nb_min"].fillna(_MIS_SENTINEL).to_numpy(dtype="int64")
        new_st = m["st"].to_numpy(dtype="int64").copy()
        new_st[und & has_mis] = 2
        new_st[und & ~has_mis
               & (m["node"].to_numpy(dtype="int64") < min_und)] = 1
        out = pd.DataFrame({"node": m["node"].astype("int64"),
                            "st": new_st})
        out["min_und"] = _MIS_SENTINEL
        out["has_mis"] = np.int64(0)
        out["kind"] = np.int64(0)
        out["_n"] = (out["node"] % 64).astype("int64")
        return out[["node", "st", "min_und", "has_mis", "kind", "_n"]]

    converged = False
    for _ in range(_MIS_MAX_ROUNDS):
        if n_undecided(status) == 0:
            converged = True
            break
        joined = edges.join(status, join_type="inner",
                            num_partitions=n_parts,
                            on=("src",), right_on=("node",))
        contribs = joined.map_batches(nb_info, batch_format="pandas")
        status = status.union(contribs) \
            .groupby("_n").map_groups(decide, batch_format="pandas") \
            .materialize()
    if not converged and n_undecided(status) != 0:
        raise RuntimeError(
            f"parts_mis did not converge in {_MIS_MAX_ROUNDS} rounds")

    out = status.map_batches(
        lambda df: pd.DataFrame({
            "part": df["node"].astype("int64"),
            "in_mis": (df["st"] == 1).astype("int64")}),
        batch_format="pandas").to_pandas()
    return out.sort_values("part").reset_index(drop=True)


# ---------------------------------------------------------------------------
# SAX symbolization of per-user daily activity: 4 six-hour quarter counts
# per active user-day, global quartile breakpoints (quantile_disc contract),
# one 4-letter word per user-day, corpus word census — the symbolic
# time-series representation behind motif mining / anomaly grouping.
# ---------------------------------------------------------------------------


def events_sax_words(sf_dir: str) -> pd.DataFrame:
    """Census of 4-letter SAX words (alphabet a<b<c<d on the global
    quartiles of quarter counts, boundaries inclusive downward: x ≤ q25
    → 'a', ≤ q50 → 'b', ≤ q75 → 'c', else 'd') over all active
    user-days; quarters with no events count 0.

    Scale shape: the fact stream collapses to (user, day, quarter)
    count partials; user-hash buckets assemble exact counts + zero-fill
    (complete user history per bucket) into a materialized quarters
    dataset.  Pass 1 reads the global quartiles from a bounded-domain
    count histogram (the docs_token_percentiles contract:
    ``ceil(q·n)−1`` = DuckDB quantile_disc).  Pass 2 symbolizes per
    bucket and ships ≤ 256-word census partials to the driver."""
    ds = _read(sf_dir, "events", ["ts", "user_id"])
    empty = pd.DataFrame({"word": pd.Series([], dtype=object),
                          "n_userdays": pd.Series([], dtype="int64")})

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "user_id": pd.Series([], dtype="int64"),
                "day": pd.Series([], dtype="datetime64[ns]"),
                "q": pd.Series([], dtype="int64"),
                "c": pd.Series([], dtype="int64"),
                "_b": pd.Series([], dtype="int64")})
        epoch = df["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        out = pd.DataFrame({
            "user_id": df["user_id"].astype("int64"),
            "day": df["ts"].dt.floor("D"),
            "q": (epoch % 86_400_000_000) // 21_600_000_000})
        out = out.groupby(["user_id", "day", "q"], as_index=False).size() \
            .rename(columns={"size": "c"})
        out["c"] = out["c"].astype("int64")
        out["_b"] = (out["user_id"] % 64).astype("int64")
        return out

    def quarters_bucket(df: pd.DataFrame) -> pd.DataFrame:
        cnt = df.groupby(["user_id", "day", "q"], as_index=False)["c"].sum()
        ud = cnt[["user_id", "day"]].drop_duplicates()
        full = ud.merge(pd.DataFrame({"q": np.arange(4, dtype="int64")}),
                        how="cross")
        out = full.merge(cnt, on=["user_id", "day", "q"], how="left")
        out["c"] = out["c"].fillna(0).astype("int64")
        out["_b"] = (out["user_id"].astype("int64") % 64).astype("int64")
        return out[["user_id", "day", "q", "c", "_b"]]

    quarters = ds.map_batches(keep, batch_format="pandas") \
        .groupby("_b").map_groups(quarters_bucket, batch_format="pandas") \
        .materialize()

    def hist_partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"v": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64")})
        u, cc = np.unique(df["c"].to_numpy(dtype="int64"),
                          return_counts=True)
        return pd.DataFrame({"v": u.astype("int64"),
                             "n": cc.astype("int64")})

    parts = quarters.map_batches(hist_partial,
                                 batch_format="pandas").to_pandas()
    if parts.empty or parts["n"].sum() == 0:
        return empty
    hist = parts.groupby("v")["n"].sum().sort_index()
    n = int(hist.sum())
    cum = hist.cumsum()

    def q_disc(q: float) -> int:
        idx = int(np.ceil(q * n)) - 1
        return int(cum.index[(cum > idx).argmax()])

    b1, b2, b3 = q_disc(0.25), q_disc(0.5), q_disc(0.75)

    def words_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "day", "q"], kind="mergesort")
        c = df["c"].to_numpy(dtype="int64")
        sym = np.full(len(c), "d", dtype=object)
        sym[c <= b3] = "c"
        sym[c <= b2] = "b"
        sym[c <= b1] = "a"
        w = pd.DataFrame({"user_id": df["user_id"], "day": df["day"],
                          "s": sym}) \
            .groupby(["user_id", "day"], sort=False)["s"].agg("".join)
        out = w.reset_index(name="word") \
            .groupby("word", as_index=False).size() \
            .rename(columns={"size": "n"})
        return out

    wparts = quarters.groupby("_b") \
        .map_groups(words_bucket, batch_format="pandas").to_pandas()
    out = wparts.groupby("word", as_index=False)["n"].sum() \
        .rename(columns={"n": "n_userdays"})
    out["n_userdays"] = out["n_userdays"].astype("int64")
    return out.sort_values("word").reset_index(drop=True)


# ---------------------------------------------------------------------------
# interpolated percentile (PERCENTILE_CONT contract): exact integer
# interpolation over the cents domain — pos = (n−1)·q as a rational with
# denominator 10, result in cents×10 so no float ever forms
# ---------------------------------------------------------------------------


def events_value_percentile_cont(sf_dir: str) -> pd.DataFrame:
    """Interpolated p50/p90 of the event value in exact cents×10:
    ``pos = (n−1)·q``, ``out = cents[⌊pos⌋]·(10−rem) + cents[⌊pos⌋+1]·rem``
    with ``rem = ((n−1)·10q) mod 10`` — the linear interpolation
    PERCENTILE_CONT performs, kept integer-exact.

    Scale shape: per-block bounded-domain cents histograms merge on the
    driver (the docs_token_percentiles contract); both order statistics
    read from the cumulative histogram — no global sort."""
    ds = _read(sf_dir, "events", ["value"])
    cols = ("n_events", "p50_c10", "p90_c10")
    empty = pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})

    def hist_partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"cents": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64")})
        cents = np.floor(
            df["value"].to_numpy() * 100 + 0.5).astype("int64")
        u, c = np.unique(cents, return_counts=True)
        return pd.DataFrame({"cents": u, "n": c.astype("int64")})

    parts = ds.map_batches(hist_partial, batch_format="pandas").to_pandas()
    if parts.empty:
        return empty
    hist = parts.groupby("cents")["n"].sum().sort_index()
    n = int(hist.sum())
    if n == 0:
        return empty
    cum = hist.cumsum()

    def order_stat(rk: int) -> int:
        return int(cum.index[(cum > rk).argmax()])

    def p_cont(tenths: int) -> int:
        num = (n - 1) * tenths
        lo, rem = num // 10, num % 10
        v = order_stat(lo) * (10 - rem)
        if rem:
            v += order_stat(lo + 1) * rem
        return v

    return pd.DataFrame({
        "n_events": pd.Series([n], dtype="int64"),
        "p50_c10": pd.Series([p_cont(5)], dtype="int64"),
        "p90_c10": pd.Series([p_cont(9)], dtype="int64")})


# ---------------------------------------------------------------------------
# Hill tail-index estimator over the order-value distribution: the
# power-law heaviness audit (mean log-ratio of the top-m order statistics
# to the m-th), fixed-point ln contract
# ---------------------------------------------------------------------------

_HILL_M = 100


def orders_hill_tail(sf_dir: str, m: int = _HILL_M) -> pd.DataFrame:
    """(m_used, xm_cents, hill_inv_micro): the top-``m`` order totals in
    cents, their minimum x_m, and ``(Σ round(ln(x_i/x_m)·10⁶)) // m`` —
    the inverse Hill estimator in integer micro-nats (larger ⇒ heavier
    tail).  Per-row ln ratios are rounded BEFORE the big-int sum so the
    fold is order-free.

    Scale shape: each block emits its partial top-m cents (a bounded
    m-row projection); the driver merges ≤ m × blocks values — the
    emb_knn partial-top-k audit shape applied to a scalar column."""
    ds = _read(sf_dir, "orders", ["o_totalprice"])
    cols = ("m_used", "xm_cents", "hill_inv_micro")
    empty = pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})

    def top_partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"cents": pd.Series([], dtype="int64")})
        cents = np.floor(
            df["o_totalprice"].to_numpy() * 100 + 0.5).astype("int64")
        take = min(m, len(cents))
        top = np.partition(cents, len(cents) - take)[-take:]
        return pd.DataFrame({"cents": top})

    parts = ds.map_batches(top_partial, batch_format="pandas").to_pandas()
    if parts.empty or len(parts) == 0:
        return empty
    top = np.sort(parts["cents"].to_numpy(dtype="int64"))[::-1][:m]
    if len(top) == 0:
        return empty
    xm = int(top[-1])
    lr = np.round(np.log(top.astype(np.float64) / xm) * 1_000_000) \
        .astype("int64")
    total = sum(int(x) for x in lr)        # big-int fold (web-scale m ok)
    return pd.DataFrame({
        "m_used": pd.Series([len(top)], dtype="int64"),
        "xm_cents": pd.Series([xm], dtype="int64"),
        "hill_inv_micro": pd.Series([total // len(top)], dtype="int64")})


# ---------------------------------------------------------------------------
# referential-integrity audit via Bloom-prefiltered anti-join: definite
# orphans fall out of the bitmap for free (no false negatives), only the
# maybe-present keys pay the exact verify join
# ---------------------------------------------------------------------------


def lineitem_integrity_audit(sf_dir: str) -> pd.DataFrame:
    """Three key checks as one audit table, (check, n_rows, n_matched,
    n_orphans): 'lineitem_orders' (every lineitem's l_orderkey exists in
    orders) and 'customer_orders' (customers with ≥1 order) — the clean
    rows — plus 'customer_events' (customers with any event activity),
    whose never-active customers keep the orphan branch live.

    Scale shape: the referenced side collapses to OR-mergeable 128 KiB
    Bloom bitmaps (functions/bloom.py) — never a driver keyset; probe
    rows failing the bitmap are DEFINITE orphans (no false negatives)
    and are counted vectorized per block; only maybe-present keys (with
    row multiplicities, deduped per key bucket) pay an exact
    ``Dataset.join`` verify, so false positives can't inflate matches."""
    import ray

    from ..functions.bloom import (bloom_merge, bloom_might_contain,
                                   bloom_partial)

    def audit(probe_ds, probe_key: str, dim_ds, dim_key: str,
              n_join: int) -> tuple:
        def to_bitmap(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"bitmap": [
                bloom_partial(df[dim_key].to_numpy(dtype="int64"))]})

        partials = dim_ds.map_batches(to_bitmap, batch_format="pandas",
                                      batch_size=None).to_pandas()
        bloom_ref = ray.put(bloom_merge(partials["bitmap"].tolist()))

        def probe(df: pd.DataFrame) -> pd.DataFrame:
            if len(df) == 0:
                return pd.DataFrame({
                    "key": pd.Series([], dtype="int64"),
                    "m": pd.Series([], dtype="int64"),
                    "definite": pd.Series([], dtype="int64"),
                    "total": pd.Series([], dtype="int64")})
            keys = df[probe_key].to_numpy(dtype="int64")
            maybe = bloom_might_contain(ray.get(bloom_ref), keys)
            mk = pd.DataFrame({"key": keys[maybe]}) \
                .groupby("key", as_index=False).size() \
                .rename(columns={"size": "m"})
            mk["definite"] = np.int64(0)
            mk["total"] = np.int64(0)
            head = pd.DataFrame({
                "key": pd.Series([-1], dtype="int64"),
                "m": pd.Series([0], dtype="int64"),
                "definite": pd.Series([int((~maybe).sum())],
                                      dtype="int64"),
                "total": pd.Series([len(keys)], dtype="int64")})
            return pd.concat([head, mk], ignore_index=True)

        probed = probe_ds.map_batches(probe,
                                      batch_format="pandas").materialize()

        def counters(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "definite": pd.Series([int(df["definite"].sum())],
                                      dtype="int64"),
                "total": pd.Series([int(df["total"].sum())],
                                   dtype="int64")})

        folded = probed.map_batches(counters,
                                    batch_format="pandas").to_pandas()
        n_rows = int(folded["total"].sum())
        n_definite = int(folded["definite"].sum())

        def maybe_keys(df: pd.DataFrame) -> pd.DataFrame:
            out = df[df["key"] >= 0].groupby("key", as_index=False)[
                "m"].sum()
            out["_k"] = (out["key"] % 64).astype("int64")
            return out

        def merge_keys(df: pd.DataFrame) -> pd.DataFrame:
            out = df.groupby("key", as_index=False)["m"].sum()
            out["key"] = out["key"].astype("int64")
            out["m"] = out["m"].astype("int64")
            return out

        maybe_ds = probed.map_batches(maybe_keys, batch_format="pandas") \
            .groupby("_k").map_groups(merge_keys, batch_format="pandas") \
            .materialize()
        n_maybe_rows = 0
        parts2 = maybe_ds.map_batches(
            lambda df: pd.DataFrame({"s": pd.Series(
                [int(df["m"].sum())], dtype="int64")}),
            batch_format="pandas").to_pandas()
        if len(parts2):
            n_maybe_rows = int(parts2["s"].sum())

        def dim_keys(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame({"dk": df[dim_key].astype("int64")})
            out["_k"] = (out["dk"] % 64).astype("int64")
            return out

        dim_distinct = dim_ds.map_batches(dim_keys,
                                          batch_format="pandas") \
            .groupby("_k").map_groups(
                lambda df: df.drop_duplicates("dk")[["dk"]],
                batch_format="pandas").materialize()
        if maybe_ds.count() == 0 or dim_distinct.count() == 0:
            matched = 0
        else:
            joined = maybe_ds.join(dim_distinct, join_type="inner",
                                   num_partitions=n_join,
                                   on=("key",), right_on=("dk",))
            mparts = joined.map_batches(
                lambda df: pd.DataFrame({"s": pd.Series(
                    [int(df["m"].sum())], dtype="int64")}),
                batch_format="pandas").to_pandas()
            matched = int(mparts["s"].sum()) if len(mparts) else 0
        n_orphans = n_definite + (n_maybe_rows - matched)
        return n_rows, matched, n_orphans

    n_join = _join_partitions(sf_dir, "orders", cap=8)
    li = _read(sf_dir, "lineitem", ["l_orderkey"])
    orders_k = _read(sf_dir, "orders", ["o_orderkey"])
    r1 = audit(li, "l_orderkey", orders_k, "o_orderkey", n_join)
    cust = _read(sf_dir, "customer", ["c_custkey"])
    orders_c = _read(sf_dir, "orders", ["o_custkey"])
    r2 = audit(cust, "c_custkey", orders_c, "o_custkey", n_join)
    cust2 = _read(sf_dir, "customer", ["c_custkey"])
    ev_users = _read(sf_dir, "events", ["user_id"])
    r3 = audit(cust2, "c_custkey", ev_users, "user_id", n_join)
    return pd.DataFrame({
        "check": ["customer_events", "customer_orders",
                  "lineitem_orders"],
        "n_rows": pd.Series([r3[0], r2[0], r1[0]], dtype="int64"),
        "n_matched": pd.Series([r3[1], r2[1], r1[1]], dtype="int64"),
        "n_orphans": pd.Series([r3[2], r2[2], r1[2]], dtype="int64")})


# ---------------------------------------------------------------------------
# PPJoin-style set-similarity self-join over order baskets: global-
# frequency prefix filtering generates candidates, an exact pair-bucket
# intersection count verifies them — the classic distributed similarity
# join (Xiao et al., "Efficient Similarity Joins for Near Duplicate
# Detection"), applied to the basket dual of the co-order graph
# ---------------------------------------------------------------------------

_SIMJOIN_TAU = (1, 2)          # Jaccard threshold as a rational num/den


def orders_basket_simjoin(sf_dir: str) -> pd.DataFrame:
    """All order pairs whose part-baskets have Jaccard ≥ τ (= 1/2),
    output (o1, o2, jac_ppm = i·10⁶ // u) sorted.  The threshold test is
    integer-exact (``i·den ≥ u·num``), so engine and oracle agree on
    borderline pairs bit-for-bit.

    Scale shape (prefix filter, NOT an all-pairs join): tokens sort by
    (global frequency asc, partkey asc); a basket of size s emits only
    its first ``s − ⌈τ·s⌉ + 1`` tokens — any pair with J ≥ τ must share
    a token inside BOTH prefixes (the smallest common token has ≥
    ⌈τ·s⌉ − 1 common followers in each basket), so candidate generation
    under the token-hash bucket is lossless while rare-token bias keeps
    the per-token pair fan-out far below the raw inverted index's.
    Exact verify: candidates re-exchange against the basket table
    (``Dataset.join`` on orderkey), and intersection sizes fall out of
    one adjacent-equal scan per PAIR bucket — baskets never transit the
    driver.  The part-frequency table is dimension-sized and broadcast
    (``ray.put`` once).  A pathologically hot prefix token still bounds
    its pair fan-out by that token's prefix support; salt-by-partner
    range if a corpus ever concentrates prefixes (not needed here)."""
    tn, td = _SIMJOIN_TAU
    line = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    empty = pd.DataFrame({
        "o1": pd.Series([], dtype="int64"),
        "o2": pd.Series([], dtype="int64"),
        "jac_ppm": pd.Series([], dtype="int64")})

    def proj(df: pd.DataFrame) -> pd.DataFrame:
        out = df.drop_duplicates(["l_orderkey", "l_partkey"]).copy()
        out["l_orderkey"] = out["l_orderkey"].astype("int64")
        out["l_partkey"] = out["l_partkey"].astype("int64")
        out["_ob"] = (out["l_orderkey"] % 64).astype("int64")
        return out[["l_orderkey", "l_partkey", "_ob"]]

    def dedup_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "l_orderkey" not in df.columns:
            return pd.DataFrame({
                "l_orderkey": pd.Series([], dtype="int64"),
                "l_partkey": pd.Series([], dtype="int64"),
                "_ob": pd.Series([], dtype="int64")})
        return df.drop_duplicates(["l_orderkey", "l_partkey"])

    bp = line.map_batches(proj, batch_format="pandas") \
        .groupby("_ob").map_groups(dedup_bucket, batch_format="pandas") \
        .materialize()
    if bp.count() == 0:
        return empty

    # --- distinct-basket collapse (synthesized-sf1 lesson): corpora
    # with many IDENTICAL baskets (replicas, repeat orders) multiply
    # every prefix token's support, and the candidate fan-out grows with
    # the square of the duplication factor (the raw run filled the
    # disk).  So: signature per order (sorted parts), one REPRESENTATIVE
    # order per distinct signature, the whole ppjoin below runs on
    # representative baskets only, and rep pairs + identical-signature
    # groups expand back to order pairs at the end — expansion is
    # OUTPUT-bound, every join a bucket co-partition merge.
    import hashlib as _hl

    def _sig_bucket(sig: str) -> int:
        return int(_hl.md5(sig.encode()).hexdigest()[:8], 16) % 64

    def sig_rows(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"okey": pd.Series([], dtype="int64"),
                "sig": pd.Series([], dtype="object"),
                "s": pd.Series([], dtype="int64"),
                "_sb": pd.Series([], dtype="int64")}
        if len(df) == 0 or "l_orderkey" not in df.columns:
            return pd.DataFrame(cols)
        d = df.sort_values(["l_orderkey", "l_partkey"], kind="mergesort")
        grp = d.groupby("l_orderkey")
        sig = grp["l_partkey"].agg(lambda v: ",".join(map(str, v)))
        size = grp.size()
        return pd.DataFrame({
            "okey": sig.index.to_numpy(dtype="int64"),
            "sig": sig.to_numpy(dtype=object),
            "s": size.to_numpy(dtype="int64"),
            "_sb": np.array([_sig_bucket(x) for x in sig], dtype="int64")})

    def rep_rows(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"sig": pd.Series([], dtype="object"),
                "rep": pd.Series([], dtype="int64"),
                "s": pd.Series([], dtype="int64"),
                "_sb": pd.Series([], dtype="int64")}
        if len(df) == 0 or "sig" not in df.columns:
            return pd.DataFrame(cols)
        g = df.groupby("sig", as_index=False).agg(
            rep=("okey", "min"), s=("s", "first"), _sb=("_sb", "first"))
        for c in ("rep", "s", "_sb"):
            g[c] = g[c].astype("int64")
        return g[["sig", "rep", "s", "_sb"]]

    sigs = bp.groupby("_ob").map_groups(sig_rows, batch_format="pandas") \
        .materialize()
    reps = sigs.groupby("_sb").map_groups(rep_rows, batch_format="pandas") \
        .materialize()

    def rep_mark(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"l_orderkey": pd.Series([], dtype="int64"),
                "l_partkey": pd.Series([], dtype="int64"),
                "_ob": pd.Series([], dtype="int64")}
        if len(df) == 0 or "rep" not in df.columns:
            return pd.DataFrame(cols)
        r = df["rep"].to_numpy(dtype="int64")
        return pd.DataFrame({"l_orderkey": r,
                             "l_partkey": np.full(len(r), -1, dtype="int64"),
                             "_ob": r % 64})

    def keep_reps(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"l_orderkey": pd.Series([], dtype="int64"),
                "l_partkey": pd.Series([], dtype="int64"),
                "_ob": pd.Series([], dtype="int64")}
        if len(df) == 0 or "l_orderkey" not in df.columns:
            return pd.DataFrame(cols)
        marks = df.loc[df["l_partkey"] < 0, "l_orderkey"].unique()
        d = df[df["l_partkey"] >= 0]
        return d[d["l_orderkey"].isin(set(marks.tolist()))]

    bp_rep = bp.union(reps.map_batches(rep_mark, batch_format="pandas")) \
        .groupby("_ob").map_groups(keep_reps, batch_format="pandas") \
        .materialize()

    # global token frequency over REPRESENTATIVE baskets → rank (any
    # total order is lossless for the prefix filter)
    def freq_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("l_partkey", as_index=False).size() \
            .rename(columns={"size": "n"})
        g["l_partkey"] = g["l_partkey"].astype("int64")
        g["n"] = g["n"].astype("int64")
        return g

    fparts = bp_rep.map_batches(freq_partial, batch_format="pandas") \
        .to_pandas()
    freq = fparts.groupby("l_partkey")["n"].sum()
    order = np.lexsort((freq.index.to_numpy(dtype="int64"),
                        freq.to_numpy(dtype="int64")))
    ranked_parts = freq.index.to_numpy(dtype="int64")[order]
    pk_sorted = np.sort(ranked_parts)
    rank_by_pk = np.empty(len(ranked_parts), dtype="int64")
    rank_by_pk[np.searchsorted(pk_sorted, ranked_parts)] = \
        np.arange(len(ranked_parts), dtype="int64")
    rank_ref = ray.put((pk_sorted, rank_by_pk))

    def prefix_rows(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"tok": pd.Series([], dtype="int64"),
                "o": pd.Series([], dtype="int64"),
                "s": pd.Series([], dtype="int64"),
                "_tb": pd.Series([], dtype="int64")}
        if len(df) == 0 or "l_orderkey" not in df.columns:
            return pd.DataFrame(cols)
        pks, rks = ray.get(rank_ref)
        d = df.copy()
        d["_r"] = rks[np.searchsorted(pks, d["l_partkey"].to_numpy())]
        d = d.sort_values(["l_orderkey", "_r"], kind="mergesort")
        s = d.groupby("l_orderkey")["_r"].transform("size") \
            .to_numpy(dtype="int64")
        pos = d.groupby("l_orderkey").cumcount().to_numpy(dtype="int64")
        plen = s - (tn * s + td - 1) // td + 1
        keep = pos < plen
        return pd.DataFrame({
            "tok": d["l_partkey"].to_numpy(dtype="int64")[keep],
            "o": d["l_orderkey"].to_numpy(dtype="int64")[keep],
            "s": s[keep],
            "_tb": (d["l_partkey"].to_numpy(dtype="int64")[keep] % 64)})

    def cand_pairs(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"a": pd.Series([], dtype="int64"),
                "b": pd.Series([], dtype="int64"),
                "sa": pd.Series([], dtype="int64"),
                "sb": pd.Series([], dtype="int64"),
                "_pb": pd.Series([], dtype="int64")}
        if len(df) == 0 or "tok" not in df.columns:
            return pd.DataFrame(cols)
        mm = df.merge(df[["tok", "o", "s"]], on="tok")
        mm = mm[mm["o_x"] < mm["o_y"]]
        if len(mm) == 0:
            return pd.DataFrame(cols)
        mm = mm.drop_duplicates(["o_x", "o_y"])
        a = mm["o_x"].to_numpy(dtype="int64")
        b = mm["o_y"].to_numpy(dtype="int64")
        return pd.DataFrame({
            "a": a, "b": b,
            "sa": mm["s_x"].to_numpy(dtype="int64"),
            "sb": mm["s_y"].to_numpy(dtype="int64"),
            "_pb": (a * 1_000_003 + b) % 64})

    def probe_rows(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"okey": pd.Series([], dtype="int64"),
                "a": pd.Series([], dtype="int64"),
                "b": pd.Series([], dtype="int64"),
                "sa": pd.Series([], dtype="int64"),
                "sb": pd.Series([], dtype="int64")}
        if len(df) == 0 or "a" not in df.columns:
            return pd.DataFrame(cols)
        d = df.drop_duplicates(["a", "b"])
        return pd.DataFrame({
            "okey": np.concatenate([d["a"].to_numpy(dtype="int64"),
                                    d["b"].to_numpy(dtype="int64")]),
            "a": np.tile(d["a"].to_numpy(dtype="int64"), 2),
            "b": np.tile(d["b"].to_numpy(dtype="int64"), 2),
            "sa": np.tile(d["sa"].to_numpy(dtype="int64"), 2),
            "sb": np.tile(d["sb"].to_numpy(dtype="int64"), 2)})

    probes = bp_rep.map_batches(prefix_rows, batch_format="pandas") \
        .groupby("_tb").map_groups(cand_pairs, batch_format="pandas") \
        .groupby("_pb").map_groups(probe_rows, batch_format="pandas") \
        .materialize()
    # NOTE: an empty probe set must NOT early-return — identical-basket
    # groups still emit pairs through same_sig_pairs below (two orders
    # sharing one distinct basket have no rep PAIR at all)

    # co-partitioned bucket join instead of Dataset.join: the hash-
    # shuffle JoinOperator costs ~20s of aggregator-actor machinery on
    # this exchange REGARDLESS of num_partitions (measured 20.3s at 1
    # partition and 21.3s at 64, of a 24s total) — both sides here are
    # skinny int projections, so the repo's union + groupby(bucket) +
    # per-bucket pandas merge pattern moves the same rows through the
    # ordinary sort-shuffle path instead (~4s end to end, same rows).
    def probe_side(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"_jb": pd.Series([], dtype="int64"),
                "okey": pd.Series([], dtype="int64"),
                "a": pd.Series([], dtype="int64"),
                "b": pd.Series([], dtype="int64"),
                "sa": pd.Series([], dtype="int64"),
                "sb": pd.Series([], dtype="int64"),
                "l_partkey": pd.Series([], dtype="int64"),
                "side": pd.Series([], dtype="int64")}
        if len(df) == 0 or "okey" not in df.columns:
            return pd.DataFrame(cols)
        out = df[["okey", "a", "b", "sa", "sb"]].copy()
        for c in out.columns:
            out[c] = out[c].astype("int64")
        out["_jb"] = (out["okey"] % 64).astype("int64")
        out["l_partkey"] = np.int64(-1)
        out["side"] = np.int64(0)
        return out[list(cols)]

    def basket_side(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"_jb": pd.Series([], dtype="int64"),
                "okey": pd.Series([], dtype="int64"),
                "a": pd.Series([], dtype="int64"),
                "b": pd.Series([], dtype="int64"),
                "sa": pd.Series([], dtype="int64"),
                "sb": pd.Series([], dtype="int64"),
                "l_partkey": pd.Series([], dtype="int64"),
                "side": pd.Series([], dtype="int64")}
        if len(df) == 0 or "l_orderkey" not in df.columns:
            return pd.DataFrame(cols)
        out = pd.DataFrame({
            "okey": df["l_orderkey"].astype("int64"),
            "l_partkey": df["l_partkey"].astype("int64")})
        out["_jb"] = (out["okey"] % 64).astype("int64")
        for c in ("a", "b", "sa", "sb"):
            out[c] = np.int64(-1)
        out["side"] = np.int64(1)
        return out[list(cols)]

    def local_join(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"a": pd.Series([], dtype="int64"),
                "b": pd.Series([], dtype="int64"),
                "sa": pd.Series([], dtype="int64"),
                "sb": pd.Series([], dtype="int64"),
                "l_partkey": pd.Series([], dtype="int64"),
                "_pb": pd.Series([], dtype="int64")}
        if len(df) == 0 or "side" not in df.columns:
            return pd.DataFrame(cols)
        pr = df[df["side"] == 0]
        ba = df[df["side"] == 1]
        if not len(pr) or not len(ba):
            return pd.DataFrame(cols)
        m = pr[["okey", "a", "b", "sa", "sb"]].merge(
            ba[["okey", "l_partkey"]], on="okey")
        out = m[["a", "b", "sa", "sb", "l_partkey"]].copy()
        for c in out.columns:
            out[c] = out[c].astype("int64")
        out["_pb"] = ((out["a"] * 1_000_003 + out["b"]) % 64).astype("int64")
        return out

    joined = probes.map_batches(probe_side, batch_format="pandas") \
        .union(bp_rep.map_batches(basket_side, batch_format="pandas")) \
        .groupby("_jb").map_groups(local_join, batch_format="pandas")

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"o1": pd.Series([], dtype="int64"),
                "o2": pd.Series([], dtype="int64"),
                "jac_ppm": pd.Series([], dtype="int64")}
        if len(df) == 0 or "a" not in df.columns:
            return pd.DataFrame(cols)
        d = df.sort_values(["a", "b", "l_partkey"], kind="mergesort")
        a = d["a"].to_numpy(dtype="int64")
        b = d["b"].to_numpy(dtype="int64")
        t = d["l_partkey"].to_numpy(dtype="int64")
        dup = np.zeros(len(d), dtype="int64")
        if len(d) > 1:
            dup[1:] = ((a[1:] == a[:-1]) & (b[1:] == b[:-1])
                       & (t[1:] == t[:-1])).astype("int64")
        g = pd.DataFrame({"a": a, "b": b, "i": dup,
                          "sa": d["sa"].to_numpy(dtype="int64"),
                          "sb": d["sb"].to_numpy(dtype="int64")}) \
            .groupby(["a", "b"], as_index=False) \
            .agg(i=("i", "sum"), sa=("sa", "first"), sb=("sb", "first"))
        i = g["i"].to_numpy(dtype="int64")
        u = g["sa"].to_numpy(dtype="int64") \
            + g["sb"].to_numpy(dtype="int64") - i
        keep = i * td >= u * tn
        return pd.DataFrame({
            "o1": g["a"].to_numpy(dtype="int64")[keep],
            "o2": g["b"].to_numpy(dtype="int64")[keep],
            "jac_ppm": i[keep] * 1_000_000 // u[keep]})

    rp = joined.groupby("_pb").map_groups(verify, batch_format="pandas") \
        .materialize()

    # --- expansion: rep pairs -> (sig_a, sig_b) -> member order pairs,
    # plus identical-signature groups pairwise at jac = 1e6 (i = u for
    # equal baskets, so the ppm formula is exact).  Each step is a
    # union + groupby(bucket) + per-bucket pandas merge; fan-out equals
    # the emitted pair count, never an intermediate blow-up.
    _XCOLS = {"k": "object", "o": "int64", "x": "object",
              "jac": "int64", "side": "int64", "_xb": "int64"}

    def _xempty() -> pd.DataFrame:
        return pd.DataFrame({c: pd.Series([], dtype=t)
                             for c, t in _XCOLS.items()})

    def _xframe(k, o, x, jac, side, xb) -> pd.DataFrame:
        n = len(k)

        def arr(v, dtype):
            if np.isscalar(v):
                return pd.Series(np.full(n, v), dtype=dtype) if dtype != "object" \
                    else pd.Series([v] * n, dtype="object")
            return pd.Series(v, dtype=dtype)

        return pd.DataFrame({
            "k": arr(k, "object"), "o": arr(o, "int64"),
            "x": arr(x, "object"), "jac": arr(jac, "int64"),
            "side": arr(side, "int64"), "_xb": arr(xb, "int64")})

    # step 1+2: attach signatures to both rep keys (bucket by rep % 64)
    def rp_by_o1(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "o1" not in df.columns:
            return _xempty()
        o1 = df["o1"].to_numpy(dtype="int64")
        return _xframe([str(v) for v in o1], df["o2"].to_numpy("int64"),
                       [""] * len(df), df["jac_ppm"].to_numpy("int64"),
                       0, o1 % 64)

    def rep_by_rep(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "rep" not in df.columns:
            return _xempty()
        r = df["rep"].to_numpy(dtype="int64")
        return _xframe([str(v) for v in r], r, df["sig"].tolist(),
                       0, 1, r % 64)

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        """side-0 rows carry (k=join key, o=payload key, jac); side-1
        rows map k -> x; output rekeys on o."""
        if len(df) == 0 or "side" not in df.columns:
            return _xempty()
        pr = df[df["side"] == 0]
        mp = df[df["side"] == 1][["k", "x"]]
        if not len(pr) or not len(mp):
            return _xempty()
        m = pr.merge(mp, on="k", suffixes=("", "_m"))
        if not len(m):
            return _xempty()
        o = m["o"].to_numpy(dtype="int64")
        return _xframe([str(v) for v in o], o, m["x_m"].tolist(),
                       m["jac"].to_numpy("int64"), 0, o % 64)

    # after two attaches the row is (k=str(o2-rep), o=o2-rep, x=sig_a);
    # run attach again against the rep map to swap in sig_b, yielding
    # rows keyed for the member join: (x=sig_a, k..o reused)
    s1 = rp.map_batches(rp_by_o1, batch_format="pandas") \
        .union(reps.map_batches(rep_by_rep, batch_format="pandas")) \
        .groupby("_xb").map_groups(attach, batch_format="pandas")
    def _sigpair(df: pd.DataFrame) -> pd.DataFrame:
        """join s1 (side 0: x=sig_a, k=rep_b) with the rep map (side 1:
        k=rep, x=sig) -> one row per rep pair keyed by sig_a's bucket."""
        if len(df) == 0 or "side" not in df.columns:
            return _xempty()
        pr = df[df["side"] == 0]
        mp = df[df["side"] == 1][["k", "x"]]
        if not len(pr) or not len(mp):
            return _xempty()
        m = pr.merge(mp, on="k", suffixes=("", "_m"))
        if not len(m):
            return _xempty()
        # k = sig_a (member-join key), x = sig_b, o unused
        return _xframe(m["x"].tolist(), 0, m["x_m"].tolist(),
                       m["jac"].to_numpy("int64"), 0,
                       [_sig_bucket(x) for x in m["x"]])

    # s1 rows: k/o = o2 rep, x = sig_a, jac
    s2 = s1.union(reps.map_batches(rep_by_rep, batch_format="pandas")) \
        .groupby("_xb").map_groups(_sigpair, batch_format="pandas")

    def sig_members(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "sig" not in df.columns:
            return _xempty()
        return _xframe(df["sig"].tolist(), df["okey"].to_numpy("int64"),
                       [""] * len(df), 0, 1,
                       df["_sb"].to_numpy("int64"))

    def expand_a(df: pd.DataFrame) -> pd.DataFrame:
        """pair rows (k=sig_a, x=sig_b) x members of sig_a -> rows keyed
        by sig_b's bucket with o = member_a."""
        if len(df) == 0 or "side" not in df.columns:
            return _xempty()
        pr = df[df["side"] == 0]
        mem = df[df["side"] == 1][["k", "o"]]
        if not len(pr) or not len(mem):
            return _xempty()
        m = pr.merge(mem, on="k", suffixes=("", "_m"))
        if not len(m):
            return _xempty()
        return _xframe(m["x"].tolist(), m["o_m"].to_numpy("int64"),
                       [""] * len(m), m["jac"].to_numpy("int64"), 0,
                       [_sig_bucket(x) for x in m["x"]])

    def expand_b(df: pd.DataFrame) -> pd.DataFrame:
        """x members of sig_b -> final (o1, o2, jac_ppm) partials."""
        cols = {"o1": pd.Series([], dtype="int64"),
                "o2": pd.Series([], dtype="int64"),
                "jac_ppm": pd.Series([], dtype="int64")}
        if len(df) == 0 or "side" not in df.columns:
            return pd.DataFrame(cols)
        pr = df[df["side"] == 0]
        mem = df[df["side"] == 1][["k", "o"]]
        if not len(pr) or not len(mem):
            return pd.DataFrame(cols)
        m = pr.merge(mem, on="k", suffixes=("", "_m"))
        if not len(m):
            return pd.DataFrame(cols)
        a = m["o"].to_numpy(dtype="int64")
        b = m["o_m"].to_numpy(dtype="int64")
        return pd.DataFrame({
            "o1": np.minimum(a, b), "o2": np.maximum(a, b),
            "jac_ppm": m["jac"].to_numpy("int64")})

    def same_sig_pairs(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"o1": pd.Series([], dtype="int64"),
                "o2": pd.Series([], dtype="int64"),
                "jac_ppm": pd.Series([], dtype="int64")}
        if len(df) == 0 or "sig" not in df.columns:
            return pd.DataFrame(cols)
        frames = []
        for _, g in df.groupby("sig", sort=False):
            if len(g) < 2:
                continue
            o = np.sort(g["okey"].to_numpy(dtype="int64"))
            ia, ib = np.triu_indices(len(o), k=1)
            frames.append(pd.DataFrame({
                "o1": o[ia], "o2": o[ib],
                "jac_ppm": np.full(len(ia), 1_000_000, dtype="int64")}))
        if not frames:
            return pd.DataFrame(cols)
        return pd.concat(frames, ignore_index=True)

    e1 = s2.union(sigs.map_batches(sig_members, batch_format="pandas")) \
        .groupby("_xb").map_groups(expand_a, batch_format="pandas")
    expanded = e1.union(sigs.map_batches(sig_members,
                                         batch_format="pandas")) \
        .groupby("_xb").map_groups(expand_b, batch_format="pandas")
    same = sigs.groupby("_sb").map_groups(same_sig_pairs,
                                          batch_format="pandas")
    parts = expanded.union(same).to_pandas()
    if parts.empty or "o1" not in parts.columns:
        return empty
    out = parts.sort_values(["o1", "o2"], kind="mergesort") \
        .reset_index(drop=True)
    for c in ("o1", "o2", "jac_ppm"):
        out[c] = out[c].astype("int64")
    return out


# ---------------------------------------------------------------------------
# functional-dependency audit (schema profiling, the Metanome/HyFD
# verification step): FD lhs → rhs holds iff |distinct lhs| =
# |distinct (lhs, rhs)| — counted under lhs-hash buckets so each lhs
# value (and every pair built on it) settles in exactly one bucket
# ---------------------------------------------------------------------------

_FD_CANDIDATES = (
    ("customer", "c_custkey", "c_mktsegment"),
    ("customer", "c_name", "c_custkey"),
    ("lineitem", "l_orderkey", "l_returnflag"),
    ("lineitem", "l_partkey", "l_suppkey"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("orders", "o_orderkey", "o_custkey"),
    ("part", "p_type", "p_brand"),
    ("supplier", "s_name", "s_nationkey"),
)


def orders_fd_audit(sf_dir: str) -> pd.DataFrame:
    """Verify the pinned candidate FDs: (tab, lhs, rhs, n_lhs, n_pairs,
    n_viol, holds) per candidate, sorted — ``n_viol = n_pairs − n_lhs``
    is the number of extra rhs values carried by multi-valued lhs keys
    (0 ⇔ the dependency holds; an empty table holds vacuously).

    Scale shape: each candidate is ONE pass over a two-column
    projection — per-block distinct (lhs, rhs) partials land in
    lhs-hash buckets (a given lhs value, hence every pair built on it,
    settles in exactly one bucket), the bucket counts its distinct lhs
    and distinct pairs, and the driver folds ≤ 64 two-int partials per
    candidate.  Values never leave the workers; no global sort, no
    driver keysets."""
    rows = []
    for tab, lhs, rhs in _FD_CANDIDATES:
        ds = _read(sf_dir, tab, [lhs, rhs])

        def proj(df: pd.DataFrame, lhs=lhs, rhs=rhs) -> pd.DataFrame:
            out = df.drop_duplicates([lhs, rhs])[[lhs, rhs]].copy()
            out.columns = ["l", "r"]
            out["_b"] = (pd.util.hash_pandas_object(
                out["l"], index=False).to_numpy() % 64).astype("int64")
            return out

        def bucket_counts(df: pd.DataFrame) -> pd.DataFrame:
            cols = {"nl": pd.Series([], dtype="int64"),
                    "np": pd.Series([], dtype="int64")}
            if len(df) == 0 or "l" not in df.columns:
                return pd.DataFrame(cols)
            d = df.drop_duplicates(["l", "r"])
            return pd.DataFrame({
                "nl": pd.Series([d["l"].nunique()], dtype="int64"),
                "np": pd.Series([len(d)], dtype="int64")})

        parts = ds.map_batches(proj, batch_format="pandas") \
            .groupby("_b").map_groups(bucket_counts,
                                      batch_format="pandas").to_pandas()
        n_lhs = int(parts["nl"].sum()) if len(parts) else 0
        n_pairs = int(parts["np"].sum()) if len(parts) else 0
        rows.append((tab, lhs, rhs, n_lhs, n_pairs,
                     n_pairs - n_lhs, int(n_lhs == n_pairs)))
    rows.sort()
    return pd.DataFrame({
        "tab": [r[0] for r in rows],
        "lhs": [r[1] for r in rows],
        "rhs": [r[2] for r in rows],
        "n_lhs": pd.Series([r[3] for r in rows], dtype="int64"),
        "n_pairs": pd.Series([r[4] for r in rows], dtype="int64"),
        "n_viol": pd.Series([r[5] for r in rows], dtype="int64"),
        "holds": pd.Series([r[6] for r in rows], dtype="int64")})


# ---------------------------------------------------------------------------
# Mann-Kendall trend test per event type over zero-filled daily counts:
# exact-integer S statistic and tie-corrected variance numerator (the
# /18 is left undone so no float ever forms)
# ---------------------------------------------------------------------------


def events_mann_kendall(sf_dir: str) -> pd.DataFrame:
    """(event_type, n_days, s_stat, var18num) sorted: S = Σ_{i<j}
    sign(x_j − x_i) over the type's daily-count series x (zero-filled
    across the GLOBAL day horizon), and ``var18num = n(n−1)(2n+5) −
    Σ_t t(t−1)(2t+5)`` over tie groups t — 18·Var(S), kept integer.

    Scale shape: per-block (type, day) count partials (bounded by
    types × horizon per block) merge under the type-hash bucket, so each
    type's full series assembles in exactly one group; the global day
    horizon folds from per-block min/max partials (two ints each) and
    broadcasts via closure.  S is computed per type WITHOUT the n×n
    sign-outer (which at century horizons would cost ~10 GB of int64):
    with P = n(n−1)/2 total pairs, E = Σ_t t(t−1)/2 tied pairs and
    D = #inversions (i<j with x_i > x_j, counted by a bottom-up
    vectorized merge in O(n log n)), S = (P − E − D) − D = P − E − 2D.
    n is calendar-bounded, and the EVENT count underneath is
    unbounded."""
    empty = pd.DataFrame({
        "event_type": pd.Series([], dtype=object),
        "n_days": pd.Series([], dtype="int64"),
        "s_stat": pd.Series([], dtype="int64"),
        "var18num": pd.Series([], dtype="int64")})
    partials, d0, d1 = _daily_type_partials(sf_dir)
    if partials is None:
        return empty
    n = d1 - d0 + 1

    def inv_count(a: np.ndarray) -> int:
        # pairs (i<j) with a[i] > a[j], bottom-up merge, vectorized
        # cross-counts via searchsorted — O(n log n), no n×n matrix
        a = a.copy()
        m = len(a)
        inv = 0
        width = 1
        while width < m:
            for lo in range(0, m, 2 * width):
                mid = min(lo + width, m)
                hi = min(lo + 2 * width, m)
                if mid >= hi:
                    continue
                left = a[lo:mid]
                right = a[mid:hi]
                pos = np.searchsorted(left, right, side="right")
                inv += int((len(left) - pos).sum())
                merged = np.concatenate([left, right])
                merged.sort(kind="stable")
                a[lo:hi] = merged
            width *= 2
        return inv

    def mk_per_type(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"event_type": pd.Series([], dtype=object),
                "n_days": pd.Series([], dtype="int64"),
                "s_stat": pd.Series([], dtype="int64"),
                "var18num": pd.Series([], dtype="int64")}
        if len(df) == 0 or "event_type" not in df.columns:
            return pd.DataFrame(cols)
        rows = []
        for et, g in df.groupby("event_type", sort=True):
            x = np.zeros(n, dtype="int64")
            cc = g.groupby("day")["c"].sum()
            x[cc.index.to_numpy(dtype="int64") - d0] = \
                cc.to_numpy(dtype="int64")
            _, t = np.unique(x, return_counts=True)
            t = t.astype("int64")
            p_total = n * (n - 1) // 2
            e_pairs = int((t * (t - 1) // 2).sum())
            s = p_total - e_pairs - 2 * inv_count(x)
            tie = int((t * (t - 1) * (2 * t + 5)).sum())
            rows.append((et, n, s, n * (n - 1) * (2 * n + 5) - tie))
        return pd.DataFrame({
            "event_type": [r[0] for r in rows],
            "n_days": pd.Series([r[1] for r in rows], dtype="int64"),
            "s_stat": pd.Series([r[2] for r in rows], dtype="int64"),
            "var18num": pd.Series([r[3] for r in rows], dtype="int64")})

    parts = partials.groupby("_tb").map_groups(
        mk_per_type, batch_format="pandas").to_pandas()
    if parts.empty or "event_type" not in parts.columns:
        return empty
    return parts.sort_values("event_type", kind="mergesort") \
        .reset_index(drop=True)


# ---------------------------------------------------------------------------
# k-truss peel of the co-order part graph: per-EDGE triangle support
# (the edge dual of parts_kcore_peel's node degrees) with two pinned
# peel rounds and a final survivor recount
# ---------------------------------------------------------------------------

_KTRUSS_K = 4
_KTRUSS_ROUNDS = 2
_KTRUSS_SUPPORT = 2          # co-order weight floor, as parts_triangles


def _edge_support(edges, n_join: int) -> "rd.Dataset":
    """(u, v, s): per-edge triangle support over the materialized edge
    Dataset — center-carrying wedges (each confirmed triangle credits
    all three corner edges, the parts_clustering_coeff contract)
    confirmed by an exact multi-key ``Dataset.join`` against the edge
    table, counts settled under the pair-hash bucket via a tagged union
    (kind 0 = the edge itself, kind 1 = one triangle credit)."""
    def tag_edges(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["u", "v"]].copy()
        out["kind"] = np.zeros(len(out), dtype="int64")
        out["_pb"] = ((out["u"] * 1_000_003 + out["v"]) % 64) \
            .astype("int64")
        return out

    def bucket_u(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["u", "v"]].copy()
        out["_u"] = (out["u"] % 64).astype("int64")
        return out

    # pin explicit Arrow schemas on every block feeding the hash-shuffle
    # join: a tiny graph leaves some hash partitions EMPTY and an empty
    # pandas block loses its key dtypes, crashing the per-partition
    # pyarrow join (NOTES_r2 sharp edges)
    wedge_schema = pa.schema([("x", pa.int64()), ("y", pa.int64()),
                              ("z", pa.int64())])
    edge_schema = pa.schema([("u", pa.int64()), ("v", pa.int64())])

    def gen_wedges(df: pd.DataFrame) -> pa.Table:
        cols = {"x": pd.Series([], dtype="int64"),
                "y": pd.Series([], dtype="int64"),
                "z": pd.Series([], dtype="int64")}
        if len(df) == 0 or "u" not in df.columns:
            return pa.Table.from_pandas(pd.DataFrame(cols),
                                        schema=wedge_schema,
                                        preserve_index=False)
        m = df.merge(df[["u", "v"]], on="u")
        m = m[m["v_x"] < m["v_y"]]
        out = pd.DataFrame({"x": m["u"].astype("int64").to_numpy(),
                            "y": m["v_x"].astype("int64").to_numpy(),
                            "z": m["v_y"].astype("int64").to_numpy()})
        return pa.Table.from_pandas(out, schema=wedge_schema,
                                    preserve_index=False)

    def pin_edges(df: pd.DataFrame) -> pa.Table:
        out = pd.DataFrame({"u": df["u"].astype("int64").to_numpy(),
                            "v": df["v"].astype("int64").to_numpy()})
        return pa.Table.from_pandas(out, schema=edge_schema,
                                    preserve_index=False)

    def corner_rows(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"u": pd.Series([], dtype="int64"),
                "v": pd.Series([], dtype="int64"),
                "kind": pd.Series([], dtype="int64"),
                "_pb": pd.Series([], dtype="int64")}
        if len(df) == 0 or "x" not in df.columns:
            return pd.DataFrame(cols)
        x = df["x"].to_numpy(dtype="int64")
        y = df["y"].to_numpy(dtype="int64")
        z = df["z"].to_numpy(dtype="int64")
        u = np.concatenate([x, x, y])
        v = np.concatenate([y, z, z])
        return pd.DataFrame({
            "u": u, "v": v, "kind": np.ones(len(u), dtype="int64"),
            "_pb": (u * 1_000_003 + v) % 64})

    def settle(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"u": pd.Series([], dtype="int64"),
                "v": pd.Series([], dtype="int64"),
                "s": pd.Series([], dtype="int64")}
        if len(df) == 0 or "u" not in df.columns:
            return pd.DataFrame(cols)
        g = df.groupby(["u", "v"], as_index=False)["kind"].sum() \
            .rename(columns={"kind": "s"})
        for c in ("u", "v", "s"):
            g[c] = g[c].astype("int64")
        return g

    tagged = edges.map_batches(tag_edges, batch_format="pandas")
    wedges = edges.map_batches(bucket_u, batch_format="pandas") \
        .groupby("_u").map_groups(gen_wedges, batch_format="pandas") \
        .materialize()
    if wedges.count() > 0:
        tri = wedges.join(
            edges.map_batches(pin_edges, batch_format="pandas"),
            join_type="inner", num_partitions=n_join,
            on=("y", "z"), right_on=("u", "v"))
        tagged = tagged.union(
            tri.map_batches(corner_rows, batch_format="pandas"))
    return tagged.groupby("_pb").map_groups(settle,
                                            batch_format="pandas")


def parts_ktruss(sf_dir: str) -> pd.DataFrame:
    """(a_id, b_id, support, dropped_round) for every co-order edge
    (weight ≥ 2): two pinned peel rounds at k = 4 remove edges whose
    triangle support over the CURRENT edge set falls below k−2 = 2
    (victims report the support that killed them and their round);
    survivors report dropped_round = 0 and a final recount — the edge
    dual of the k-core node peel, with cascades live (an edge can lose
    its only triangle to a round-1 victim).

    Scale shape: each round is one wedge-generation pass (oriented by
    u < v, bounded by oriented degree²), one exact multi-key
    ``Dataset.join`` confirming triangles, and one pair-hash-bucket
    tagged-union settle — the edge table never transits the driver;
    only each round's victims (output rows by contract) do."""
    k, rounds = _KTRUSS_K, _KTRUSS_ROUNDS
    empty = pd.DataFrame({
        "a_id": pd.Series([], dtype="int64"),
        "b_id": pd.Series([], dtype="int64"),
        "support": pd.Series([], dtype="int64"),
        "dropped_round": pd.Series([], dtype="int64")})

    def project_uv(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"u": df["a_id"].astype("int64"),
                             "v": df["b_id"].astype("int64")})

    # size the triangle-confirmation exchange to the data: a tiny wedge
    # set spread over fixed partitions leaves empties that crash the
    # pyarrow join (NOTES_r2 sharp edges)
    n_join = _join_partitions(sf_dir, "lineitem", selectivity=0.05,
                              cap=16)
    cur = _co_order_pair_counts(sf_dir, _KTRUSS_SUPPORT) \
        .map_batches(project_uv, batch_format="pandas").materialize()
    out_parts = []
    for rnd in range(1, rounds + 1):
        if cur.count() == 0:
            break
        sup = _edge_support(cur, n_join).materialize()

        def victims(df: pd.DataFrame, rnd=rnd) -> pd.DataFrame:
            d = df[df["s"] < k - 2]
            return pd.DataFrame({
                "a_id": d["u"].astype("int64"),
                "b_id": d["v"].astype("int64"),
                "support": d["s"].astype("int64"),
                "dropped_round": np.full(len(d), rnd, dtype="int64")})

        def survivors(df: pd.DataFrame) -> pd.DataFrame:
            d = df[df["s"] >= k - 2]
            return pd.DataFrame({"u": d["u"].astype("int64"),
                                 "v": d["v"].astype("int64")})

        vp = sup.map_batches(victims, batch_format="pandas").to_pandas()
        if len(vp):
            out_parts.append(vp)
        cur = sup.map_batches(survivors, batch_format="pandas") \
            .materialize()
    if cur.count() > 0:
        fs = _edge_support(cur, n_join).to_pandas()
        out_parts.append(pd.DataFrame({
            "a_id": fs["u"].astype("int64"),
            "b_id": fs["v"].astype("int64"),
            "support": fs["s"].astype("int64"),
            "dropped_round": np.zeros(len(fs), dtype="int64")}))
    if not out_parts:
        return empty
    out = pd.concat(out_parts, ignore_index=True) \
        .sort_values(["a_id", "b_id"], kind="mergesort") \
        .reset_index(drop=True)
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


# ---------------------------------------------------------------------------
# Wald–Wolfowitz runs test per event type: randomness of the daily-count
# series around its median (the nonparametric sibling of
# events_mann_kendall's trend test — same series assembly, different
# statistic: run structure instead of pairwise signs)
# ---------------------------------------------------------------------------


def _daily_type_partials(sf_dir: str, types=None):
    """Shared series assembly for the daily-count statistics family
    (events_mann_kendall shape): per-block (event_type, day, c, _tb)
    count partials plus the global (d0, d1) day horizon folded from
    per-block min/max.  ``types`` optionally restricts the scan (and the
    horizon) to a pinned type subset.  Returns (partials, d0, d1);
    (None, None, None) when no rows survive."""
    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def day_partial(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"event_type": pd.Series([], dtype=object),
                "day": pd.Series([], dtype="int64"),
                "c": pd.Series([], dtype="int64"),
                "_tb": pd.Series([], dtype="int64")}
        if len(df) == 0:
            return pd.DataFrame(cols)
        if types is not None:
            df = df[df["event_type"].isin(types)]
            if len(df) == 0:
                return pd.DataFrame(cols)
        d = pd.DataFrame({
            "event_type": df["event_type"],
            "day": pd.to_datetime(df["ts"]).to_numpy()
            .astype("datetime64[D]").astype("int64")})
        g = d.groupby(["event_type", "day"], as_index=False).size() \
            .rename(columns={"size": "c"})
        g["c"] = g["c"].astype("int64")
        g["day"] = g["day"].astype("int64")
        g["_tb"] = (pd.util.hash_pandas_object(
            g["event_type"], index=False).to_numpy() % 64).astype("int64")
        return g

    partials = ds.map_batches(day_partial, batch_format="pandas") \
        .materialize()

    def minmax(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "day" not in df.columns:
            return pd.DataFrame({"lo": pd.Series([], dtype="int64"),
                                 "hi": pd.Series([], dtype="int64")})
        return pd.DataFrame({
            "lo": pd.Series([int(df["day"].min())], dtype="int64"),
            "hi": pd.Series([int(df["day"].max())], dtype="int64")})

    mm = partials.map_batches(minmax, batch_format="pandas").to_pandas()
    if mm.empty:
        return None, None, None
    return partials, int(mm["lo"].min()), int(mm["hi"].max())


def events_runs_test(sf_dir: str) -> pd.DataFrame:
    """(event_type, n_pos, n_neg, n_runs, exp2num, var_num) sorted:
    Wald–Wolfowitz runs test of the type's daily-count series
    (zero-filled across the GLOBAL day horizon) dichotomized around its
    median — days with c == median are EXCLUDED (the classical rule),
    the rest become a 0/1 sign sequence in day order, and n_runs counts
    its maximal constant blocks.  ``exp2num = n + 2·n1·n2`` is n·E[R]
    and ``var_num = 2·n1·n2·(2·n1·n2 − n)`` the variance numerator of
    n²(n−1)·Var(R) — both exact integers (n is calendar-bounded, so
    int64 holds past a century-long horizon).  The median is the
    quantile_disc contract: sorted[ceil(n/2)−1].  A type whose days all
    tie the median vanishes entirely (empty sequence — the SQL group is
    absent).

    Scale shape: identical to events_mann_kendall — bounded per-block
    (type, day) partials, type-hash bucket assembly, one vectorized
    pass per type over a calendar-bounded series."""
    partials, d0, d1 = _daily_type_partials(sf_dir)
    empty = pd.DataFrame({
        "event_type": pd.Series([], dtype=object),
        "n_pos": pd.Series([], dtype="int64"),
        "n_neg": pd.Series([], dtype="int64"),
        "n_runs": pd.Series([], dtype="int64"),
        "exp2num": pd.Series([], dtype="int64"),
        "var_num": pd.Series([], dtype="int64")})
    if partials is None:
        return empty
    n = d1 - d0 + 1

    def runs_per_type(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"event_type": pd.Series([], dtype=object),
                "n_pos": pd.Series([], dtype="int64"),
                "n_neg": pd.Series([], dtype="int64"),
                "n_runs": pd.Series([], dtype="int64"),
                "exp2num": pd.Series([], dtype="int64"),
                "var_num": pd.Series([], dtype="int64")}
        if len(df) == 0 or "event_type" not in df.columns:
            return pd.DataFrame(cols)
        rows = []
        for et, g in df.groupby("event_type", sort=True):
            x = np.zeros(n, dtype="int64")
            cc = g.groupby("day")["c"].sum()
            x[cc.index.to_numpy(dtype="int64") - d0] = \
                cc.to_numpy(dtype="int64")
            med = int(np.sort(x)[(n + 1) // 2 - 1])
            s = (x[x != med] > med).astype("int64")
            if s.size == 0:
                continue
            n1 = int(s.sum())
            n2 = int(s.size) - n1
            runs = 1 + int((s[1:] != s[:-1]).sum())
            nn = n1 + n2
            rows.append((et, n1, n2, runs,
                         nn + 2 * n1 * n2,
                         2 * n1 * n2 * (2 * n1 * n2 - nn)))
        return pd.DataFrame({
            "event_type": [r[0] for r in rows],
            "n_pos": pd.Series([r[1] for r in rows], dtype="int64"),
            "n_neg": pd.Series([r[2] for r in rows], dtype="int64"),
            "n_runs": pd.Series([r[3] for r in rows], dtype="int64"),
            "exp2num": pd.Series([r[4] for r in rows], dtype="int64"),
            "var_num": pd.Series([r[5] for r in rows], dtype="int64")})

    parts = partials.groupby("_tb").map_groups(
        runs_per_type, batch_format="pandas").to_pandas()
    if parts.empty or "event_type" not in parts.columns:
        return empty
    return parts.sort_values("event_type", kind="mergesort") \
        .reset_index(drop=True)


# ---------------------------------------------------------------------------
# Spearman rank correlation between the view and purchase daily-count
# series — exact doubled-rank integers (average-rank ties stay integral
# in half units), Pearson moments over ranks as BIGINT numerators
# ---------------------------------------------------------------------------

_SPEARMAN_X = "view"
_SPEARMAN_Y = "purchase"


def events_spearman(sf_dir: str) -> pd.DataFrame:
    """One row (n_days, sxy2, sxx2, syy2, rho_num, den_x, den_y):
    Spearman correlation between the daily-count series of the pinned
    types '{x}' and '{y}', zero-filled over the two types' joint day
    horizon.  Ties take the classical average rank; ranks are carried
    DOUBLED (r2 = 2·below + t + 1, an exact integer ≡ 2·RANK() + t − 1),
    so every moment is exact: rho = rho_num / sqrt(den_x·den_y) with
    ``rho_num = n·Σ(rx2·ry2) − (n(n+1))²`` and ``den_* = n·Σr2² −
    (n(n+1))²`` (Σr2 = n(n+1) identically).  n is calendar-bounded, so
    the n⁴-order terms hold in int64 past a decade-scale horizon; the
    twin computes in HUGEINT.  Empty input → empty frame (the twin
    filters its aggregate row on n > 0).

    Scale shape: one column-pruned scan filtered to the two pinned
    types; bounded (type, day) partials; the two calendar-length series
    fold on the driver in O(horizon) with Python-int moments."""
    partials, d0, d1 = _daily_type_partials(
        sf_dir, types=(_SPEARMAN_X, _SPEARMAN_Y))
    empty = pd.DataFrame({c: pd.Series([], dtype="int64") for c in (
        "n_days", "sxy2", "sxx2", "syy2", "rho_num", "den_x", "den_y")})
    if partials is None:
        return empty
    n = d1 - d0 + 1

    tot = partials.to_pandas()
    if tot.empty:
        return empty
    series = {}
    for et in (_SPEARMAN_X, _SPEARMAN_Y):
        x = np.zeros(n, dtype="int64")
        g = tot[tot["event_type"] == et].groupby("day")["c"].sum()
        if len(g):
            x[g.index.to_numpy(dtype="int64") - d0] = \
                g.to_numpy(dtype="int64")
        srt = np.sort(x)
        below = np.searchsorted(srt, x, side="left")
        t = np.searchsorted(srt, x, side="right") - below
        series[et] = (2 * below + t + 1).astype("int64")
    rx2 = series[_SPEARMAN_X]
    ry2 = series[_SPEARMAN_Y]
    # Σ(r2·r2) ≤ 4n³: int64 holds to n ≈ 1.3e6 days; past that (absurd
    # calendar horizons) route the products through Python big-ints
    if n > (1 << 20):
        rx2, ry2 = rx2.astype(object), ry2.astype(object)
    sxy2 = int((rx2 * ry2).sum())
    sxx2 = int((rx2 * rx2).sum())
    syy2 = int((ry2 * ry2).sum())
    s = n * (n + 1)
    return pd.DataFrame({
        "n_days": pd.Series([n], dtype="int64"),
        "sxy2": pd.Series([sxy2], dtype="int64"),
        "sxx2": pd.Series([sxx2], dtype="int64"),
        "syy2": pd.Series([syy2], dtype="int64"),
        "rho_num": pd.Series([n * sxy2 - s * s], dtype="int64"),
        "den_x": pd.Series([n * sxx2 - s * s], dtype="int64"),
        "den_y": pd.Series([n * syy2 - s * s], dtype="int64")})


events_spearman.__doc__ = events_spearman.__doc__.format(
    x=_SPEARMAN_X, y=_SPEARMAN_Y)


# ---------------------------------------------------------------------------
# Markov next-event predictor accuracy: the majority-transition baseline
# evaluated exactly from the transition counts themselves (argmax row of
# the events_transition_matrix kernel; correct = the majority count)
# ---------------------------------------------------------------------------


def events_markov_accuracy(sf_dir: str) -> pd.DataFrame:
    """(from_type, predicted, n_correct, n_total, acc_ppm) sorted: the
    majority next-type predictor per state — predicted is the
    most-frequent successor (count ties pinned to the lexicographically
    smallest type), n_correct its count (tie-invariant), n_total the
    state's outgoing transitions, acc_ppm = n_correct·10⁶ // n_total.
    The top-1 accuracy of the order-1 Markov baseline falls out of the
    counts alone — no second scoring pass over the events.

    Scale shape: reuses the :func:`_transition_counts` exchange
    (user-hash buckets, one sort + shift-masked bigram build per
    bucket, |types|²-bounded partials); the argmax fold runs on the
    driver over the bounded count table with Python-int arithmetic."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id",
                                  "event_type"])
    counts = _transition_counts(ds)
    empty = pd.DataFrame({
        "from_type": pd.Series([], dtype=object),
        "predicted": pd.Series([], dtype=object),
        "n_correct": pd.Series([], dtype="int64"),
        "n_total": pd.Series([], dtype="int64"),
        "acc_ppm": pd.Series([], dtype="int64")})
    if counts.empty:
        return empty
    rows = []
    for ft, g in counts.groupby("from_type", sort=True):
        g = g.sort_values(["n", "to_type"], ascending=[False, True],
                          kind="mergesort")
        n_correct = int(g.iloc[0]["n"])
        predicted = g.iloc[0]["to_type"]
        n_total = int(g["n"].sum())
        rows.append((ft, predicted, n_correct, n_total,
                     n_correct * 1_000_000 // n_total))
    return pd.DataFrame({
        "from_type": [r[0] for r in rows],
        "predicted": [r[1] for r in rows],
        "n_correct": pd.Series([r[2] for r in rows], dtype="int64"),
        "n_total": pd.Series([r[3] for r in rows], dtype="int64"),
        "acc_ppm": pd.Series([r[4] for r in rows], dtype="int64")})


# ---------------------------------------------------------------------------
# 4-cycle census of the co-order part graph: quadrilaterals counted by
# the diagonal-pair identity C4 = Σ_pairs C(codeg,2) / 2 — the length-4
# sibling of parts_triangles (no edge join needed: every 4-cycle is two
# wedge-coincidences, so pair-codegree counts are the whole statistic)
# ---------------------------------------------------------------------------


def parts_four_cycles(sf_dir: str, support: int = 2) -> pd.DataFrame:
    """One row (n_pairs, max_codeg, c4_two, n_c4): 4-cycle count of the
    co-order part graph (edges = parts co-ordered in ≥ ``support``
    orders).  For every unordered endpoint pair {u,w} the codegree is
    its common-neighbor count (= wedges centered anywhere); each 4-cycle
    u–x–w–y has exactly TWO diagonal pairs ({u,w} and {x,y}), so
    ``c4_two = Σ C(codeg, 2)`` counts every quadrilateral twice and
    ``n_c4 = c4_two // 2`` exactly (cycles, not necessarily induced —
    chords don't disqualify).  n_pairs is the number of codegree-
    positive pairs, max_codeg the densest diagonal.  Empty graph →
    empty frame (the twin guards with HAVING).

    Scale shape: wedge generation under the CENTER-hash bucket (one
    vectorized self-merge per bucket — Σ deg² work, the
    parts_clustering_coeff budget), codegrees settled under the
    PAIR-hash bucket, and each pair bucket emits ONE partial row whose
    Σ C(c,2) rides as a decimal string so the driver's 64-row fold runs
    in Python big-ints (pair counts can push C(c,2) sums past 2⁶³ on a
    web graph); output stays int64 with that documented bound."""
    edges = _co_order_pair_counts(sf_dir, support)
    empty = pd.DataFrame({
        "n_pairs": pd.Series([], dtype="int64"),
        "max_codeg": pd.Series([], dtype="int64"),
        "c4_two": pd.Series([], dtype="int64"),
        "n_c4": pd.Series([], dtype="int64")})

    und_schema = pa.schema([("ctr", pa.int64()), ("nbr", pa.int64()),
                            ("_cb", pa.int64())])

    def undirect(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0 or "a_id" not in df.columns:
            return pa.Table.from_pandas(
                pd.DataFrame({"ctr": pd.Series([], dtype="int64"),
                              "nbr": pd.Series([], dtype="int64"),
                              "_cb": pd.Series([], dtype="int64")}),
                schema=und_schema, preserve_index=False)
        a = df["a_id"].astype("int64").to_numpy()
        b = df["b_id"].astype("int64").to_numpy()
        ctr = np.concatenate([a, b])
        nbr = np.concatenate([b, a])
        out = pd.DataFrame({"ctr": ctr, "nbr": nbr,
                            "_cb": (ctr % 64).astype("int64")})
        return pa.Table.from_pandas(out, schema=und_schema,
                                    preserve_index=False)

    def wedge_pairs(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"v1": pd.Series([], dtype="int64"),
                "v2": pd.Series([], dtype="int64"),
                "c": pd.Series([], dtype="int64"),
                "_pb": pd.Series([], dtype="int64")}
        if len(df) == 0 or "ctr" not in df.columns:
            return pd.DataFrame(cols)
        m = df.merge(df[["ctr", "nbr"]], on="ctr")
        m = m[m["nbr_x"] < m["nbr_y"]]
        if len(m) == 0:
            return pd.DataFrame(cols)
        g = m.groupby(["nbr_x", "nbr_y"], as_index=False).size() \
            .rename(columns={"size": "c"})
        out = pd.DataFrame({
            "v1": g["nbr_x"].astype("int64"),
            "v2": g["nbr_y"].astype("int64"),
            "c": g["c"].astype("int64")})
        out["_pb"] = ((out["v1"] * 1_000_003 + out["v2"]) % 64) \
            .astype("int64")
        return out

    def bucket_stats(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"n_pairs": pd.Series([], dtype="int64"),
                "max_codeg": pd.Series([], dtype="int64"),
                "c2_str": pd.Series([], dtype=object)}
        if len(df) == 0 or "v1" not in df.columns:
            return pd.DataFrame(cols)
        g = df.groupby(["v1", "v2"], as_index=False)["c"].sum()
        c2 = sum(int(c) * (int(c) - 1) // 2 for c in g["c"])
        return pd.DataFrame({
            "n_pairs": pd.Series([len(g)], dtype="int64"),
            "max_codeg": pd.Series([int(g["c"].max())], dtype="int64"),
            "c2_str": pd.Series([str(c2)], dtype=object)})

    parts = edges.map_batches(undirect, batch_format="pandas") \
        .groupby("_cb").map_groups(wedge_pairs, batch_format="pandas") \
        .groupby("_pb").map_groups(bucket_stats, batch_format="pandas") \
        .to_pandas()
    if parts.empty or "n_pairs" not in parts.columns or \
            int(parts["n_pairs"].sum()) == 0:
        return empty
    c4_two = sum(int(s) for s in parts["c2_str"])
    return pd.DataFrame({
        "n_pairs": pd.Series([int(parts["n_pairs"].sum())], dtype="int64"),
        "max_codeg": pd.Series([int(parts["max_codeg"].max())],
                               dtype="int64"),
        "c4_two": pd.Series([c4_two], dtype="int64"),
        "n_c4": pd.Series([c4_two // 2], dtype="int64")})


# ---------------------------------------------------------------------------
# AMS (Alon–Matias–Szegedy) F2 sketch over per-user event counts — the
# moment-sketch family member next to HLL (F0), KMV, CMS and bitmap
# distinct: est_s = (Σ_u sign_s(u)·f_u)², unbiased for F2 = Σ f_u²
# ---------------------------------------------------------------------------

_AMS_SKETCHES = 16


def _ams_signs(users: np.ndarray, n_sketches: int) -> np.ndarray:
    """±1 sign matrix (len(users) × n_sketches): sketch s reads hex
    digit s of md5('ams-' || user) — even digit → +1 — so ONE md5 per
    user serves every sketch, and the SQL twin computes the identical
    digit with substr(md5(...), s+1, 1)."""
    import hashlib

    out = np.empty((len(users), n_sketches), dtype=np.int64)
    for r, u in enumerate(users):
        hx = hashlib.md5(f"ams-{int(u)}".encode()).hexdigest()
        for s in range(n_sketches):
            out[r, s] = 1 if int(hx[s], 16) % 2 == 0 else -1
    return out


def events_f2_sketch(sf_dir: str,
                     n_sketches: int = _AMS_SKETCHES) -> pd.DataFrame:
    """(sketch_id, est, exact_f2, err_ppm) sorted, one row per sketch
    plus a sketch_id = −1 MEDIAN row (quantile_disc lower median of the
    ests — the estimator AMS actually publishes): est_s =
    (Σ_u sign_s(u)·f_u)² where f_u is the user's event count and
    sign_s(u) = ±1 from hex digit s of md5('ams-'||u); exact_f2 =
    Σ f_u² (the self-join size / repeat-rate moment the sketch
    estimates in one pass); err_ppm = |est − exact|·10⁶ // exact.

    Scale shape: ONE events scan builds materialized (user, c, bucket)
    partials that serve both sides.  The est side is additive over
    partial rows — Σ sign·f = Σ_events sign(user(e)) — so each block
    emits one 16-int fold (an in-block groupby collapses repeat users
    before the md5); the exact side needs global per-user counts and
    runs in the events_top_users user-hash bucket exchange over the
    same partials, each bucket emitting its Σ f_u² partial
    as a decimal string so the driver's 64-row fold runs in Python
    big-ints (f_u² sums pass 2⁶³ on a web corpus); ests fold the same
    way ((Σ sign·f)² ≤ N²)."""
    ds = _read(sf_dir, "events", ["user_id"])
    cols = ("sketch_id", "est", "exact_f2", "err_ppm")
    empty = pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})

    def bucket_key(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "user_id" not in df.columns:
            return pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                                 "c": pd.Series([], dtype="int64"),
                                 "_b": pd.Series([], dtype="int64")})
        g = df.groupby("user_id", as_index=False).size() \
            .rename(columns={"size": "c"})
        g["c"] = g["c"].astype("int64")
        g["_b"] = (g["user_id"].astype("int64") % 64).astype("int64")
        return g

    def f2_partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "user_id" not in df.columns:
            return pd.DataFrame({"f2_str": pd.Series([], dtype=object)})
        g = df.groupby("user_id")["c"].sum()
        f2 = sum(int(c) * int(c) for c in g)
        return pd.DataFrame({"f2_str": pd.Series([str(f2)], dtype=object)})

    # ONE events scan: the (user, c, _b) partials serve BOTH sides —
    # Σ sign·f is additive over partial rows (duplicate users across
    # blocks just split their counts), the exact Σf² side needs the
    # user-bucket exchange
    partials = ds.map_batches(bucket_key, batch_format="pandas") \
        .materialize()

    def est_partial(df: pd.DataFrame) -> pd.DataFrame:
        out_cols = {"s": pd.Series([], dtype="int64"),
                    "v": pd.Series([], dtype="int64")}
        if len(df) == 0 or "user_id" not in df.columns:
            return pd.DataFrame(out_cols)
        g = df.groupby("user_id", as_index=False)["c"].sum()
        users = g["user_id"].to_numpy(dtype="int64")
        cnt = g["c"].to_numpy(dtype="int64")
        sg = _ams_signs(users, n_sketches)
        v = (sg * cnt[:, None]).sum(axis=0)
        return pd.DataFrame({
            "s": pd.Series(np.arange(n_sketches), dtype="int64"),
            "v": pd.Series(v, dtype="int64")})

    est_p = partials.map_batches(est_partial, batch_format="pandas") \
        .to_pandas()
    if est_p.empty or "s" not in est_p.columns or len(est_p) == 0:
        return empty
    sums = [0] * n_sketches
    for s, v in zip(est_p["s"], est_p["v"]):
        sums[int(s)] += int(v)
    ests = [x * x for x in sums]

    f2p = partials.groupby("_b").map_groups(
        f2_partial, batch_format="pandas").to_pandas()
    exact = sum(int(x) for x in f2p["f2_str"]) \
        if len(f2p) and "f2_str" in f2p.columns else 0
    if exact == 0:
        return empty
    rows = [(s, ests[s]) for s in range(n_sketches)]
    med = sorted(e for _, e in rows)[(n_sketches + 1) // 2 - 1]
    rows.append((-1, med))
    return pd.DataFrame({
        "sketch_id": pd.Series([r[0] for r in rows], dtype="int64"),
        "est": pd.Series([r[1] for r in rows], dtype="int64"),
        "exact_f2": pd.Series([exact] * len(rows), dtype="int64"),
        "err_ppm": pd.Series([abs(r[1] - exact) * 1_000_000 // exact
                              for r in rows], dtype="int64")}) \
        .sort_values("sketch_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# k-anonymity audit over pinned quasi-identifiers — the data-governance
# census: how re-identifiable is the customer table under
# (c_nationkey, c_mktsegment)?
# ---------------------------------------------------------------------------


def customer_k_anonymity(sf_dir: str) -> pd.DataFrame:
    """One row (k_min, n_classes, n_singletons, n_below_5, n_rows): the
    k-anonymity audit of customers under the pinned quasi-identifier
    pair (c_nationkey, c_mktsegment) — k_min is the smallest
    equivalence-class size (the table is k_min-anonymous), singletons
    are unique individuals, n_below_5 counts rows in classes smaller
    than 5 (the conventional release floor).  Empty table → empty frame.

    Scale shape: per-block (qi-pair, count) partials merge under the
    class-hash bucket (bounded by |nations|×|segments| per block); each
    bucket emits its own (min, classes, singletons, below5, rows) fold
    and the driver merges ≤ 64 rows."""
    ds = _read(sf_dir, "customer", ["c_nationkey", "c_mktsegment"])
    cols = ("k_min", "n_classes", "n_singletons", "n_below_5", "n_rows")
    empty = pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        pc_ = {"c_nationkey": pd.Series([], dtype="int64"),
               "c_mktsegment": pd.Series([], dtype=object),
               "n": pd.Series([], dtype="int64"),
               "_b": pd.Series([], dtype="int64")}
        if len(df) == 0 or "c_nationkey" not in df.columns:
            return pd.DataFrame(pc_)
        g = df.groupby(["c_nationkey", "c_mktsegment"], as_index=False) \
            .size().rename(columns={"size": "n"})
        g["n"] = g["n"].astype("int64")
        g["c_nationkey"] = g["c_nationkey"].astype("int64")
        g["_b"] = ((g["c_nationkey"] * 31
                    + pd.util.hash_pandas_object(
                        g["c_mktsegment"], index=False).astype("int64"))
                   % 64).astype("int64")
        return g

    def bucket_fold(df: pd.DataFrame) -> pd.DataFrame:
        bc = {c: pd.Series([], dtype="int64") for c in cols}
        if len(df) == 0 or "n" not in df.columns:
            return pd.DataFrame(bc)
        g = df.groupby(["c_nationkey", "c_mktsegment"])["n"].sum()
        sizes = g.to_numpy(dtype="int64")
        return pd.DataFrame({
            "k_min": pd.Series([int(sizes.min())], dtype="int64"),
            "n_classes": pd.Series([len(sizes)], dtype="int64"),
            "n_singletons": pd.Series([int((sizes == 1).sum())],
                                      dtype="int64"),
            "n_below_5": pd.Series([int(sizes[sizes < 5].sum())],
                                   dtype="int64"),
            "n_rows": pd.Series([int(sizes.sum())], dtype="int64")})

    parts = ds.map_batches(partial, batch_format="pandas") \
        .groupby("_b").map_groups(bucket_fold, batch_format="pandas") \
        .to_pandas()
    if parts.empty or "k_min" not in parts.columns or len(parts) == 0:
        return empty
    return pd.DataFrame({
        "k_min": pd.Series([int(parts["k_min"].min())], dtype="int64"),
        "n_classes": pd.Series([int(parts["n_classes"].sum())],
                               dtype="int64"),
        "n_singletons": pd.Series([int(parts["n_singletons"].sum())],
                                  dtype="int64"),
        "n_below_5": pd.Series([int(parts["n_below_5"].sum())],
                               dtype="int64"),
        "n_rows": pd.Series([int(parts["n_rows"].sum())], dtype="int64")})


# ---------------------------------------------------------------------------
# Zone-map overlap audit (clustering depth): how many partitions must a
# ship-date range probe open under (a) the table's physical
# orderkey-range layout vs (b) a ship-month re-sort?  The layout-quality
# metric that decides whether a compaction / Z-order pays off
# ---------------------------------------------------------------------------

_ZONE_ORDERKEY_WIDTH = 512


def lineitem_zone_overlap(sf_dir: str,
                          width: int = _ZONE_ORDERKEY_WIDTH) -> pd.DataFrame:
    """Two rows (layout, n_parts, max_overlaps, sum_overlaps, avg_ppm):
    zone-map the l_shipdate column (integer epoch days) per partition
    under two layouts — 'orderkey_range' (partition = l_orderkey //
    ``width``, the physical insert order) and 'ship_month' (the
    lineitem_manifest_stats re-sort) — and count, per partition, how
    many OTHER partitions' [lo, hi] day ranges intersect it.  A range
    probe opens overlaps + 1 partitions, so ``avg_ppm =
    sum_overlaps·10⁶ // n_parts`` is the layout's clustering depth:
    high for the insert order (dates spray across orderkeys), ~0 after
    the month re-sort.  Rows sorted by layout.

    Scale shape: min/max zone maps are mergeable — per-block (layout,
    part, lo, hi) partials reduce under the partition key; the merged
    manifest (one row per partition) folds on the driver with TWO
    searchsorted passes — overlaps_i = P − #{lo_j > hi_i} − #{hi_j <
    lo_i} − 1 (the two exclusion sets are provably disjoint), so the
    sweep is O(P log P) with no pairwise matrix."""
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    cols = ("layout", "n_parts", "max_overlaps", "sum_overlaps",
            "avg_ppm")
    empty = pd.DataFrame({
        "layout": pd.Series([], dtype=object),
        "n_parts": pd.Series([], dtype="int64"),
        "max_overlaps": pd.Series([], dtype="int64"),
        "sum_overlaps": pd.Series([], dtype="int64"),
        "avg_ppm": pd.Series([], dtype="int64")})

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        pc_ = {"layout": pd.Series([], dtype=object),
               "part": pd.Series([], dtype="int64"),
               "lo": pd.Series([], dtype="int64"),
               "hi": pd.Series([], dtype="int64")}
        if len(df) == 0 or "l_orderkey" not in df.columns:
            return pd.DataFrame(pc_)
        sd = pd.to_datetime(df["l_shipdate"])
        day = sd.to_numpy().astype("datetime64[D]").astype("int64")
        frames = []
        for name, key in (
                ("orderkey_range",
                 df["l_orderkey"].to_numpy(dtype="int64") // width),
                ("ship_month",
                 (sd.dt.year * 12 + sd.dt.month)
                 .to_numpy(dtype="int64"))):
            g = pd.DataFrame({"part": key, "d": day}) \
                .groupby("part", as_index=False) \
                .agg(lo=("d", "min"), hi=("d", "max"))
            g["layout"] = name
            frames.append(g[["layout", "part", "lo", "hi"]])
        out = pd.concat(frames, ignore_index=True)
        for c in ("part", "lo", "hi"):
            out[c] = out[c].astype("int64")
        return out

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if parts.empty or "layout" not in parts.columns or len(parts) == 0:
        return empty
    rows = []
    for name, g in parts.groupby("layout", sort=True):
        zm = g.groupby("part", as_index=False).agg(lo=("lo", "min"),
                                                   hi=("hi", "max"))
        lo = np.sort(zm["lo"].to_numpy(dtype="int64"))
        hi = np.sort(zm["hi"].to_numpy(dtype="int64"))
        p_ = len(zm)
        lo_u = zm["lo"].to_numpy(dtype="int64")
        hi_u = zm["hi"].to_numpy(dtype="int64")
        # overlaps_i = P − #{lo_j > hi_i} − #{hi_j < lo_i} − 1
        ov = (p_
              - (p_ - np.searchsorted(lo, hi_u, side="right"))
              - np.searchsorted(hi, lo_u, side="left")
              - 1).astype("int64")
        so = int(ov.sum())
        rows.append((name, p_, int(ov.max()), so,
                     so * 1_000_000 // p_))
    return pd.DataFrame({
        "layout": [r[0] for r in rows],
        "n_parts": pd.Series([r[1] for r in rows], dtype="int64"),
        "max_overlaps": pd.Series([r[2] for r in rows], dtype="int64"),
        "sum_overlaps": pd.Series([r[3] for r in rows], dtype="int64"),
        "avg_ppm": pd.Series([r[4] for r in rows], dtype="int64")})


# ---------------------------------------------------------------------------
# Rich-club coefficient of the co-order part graph: do high-degree parts
# preferentially co-order with each other?  rc(k) = density of the
# subgraph induced by nodes of degree > k — the topology audit next to
# parts_degree_assortativity's correlation coefficient
# ---------------------------------------------------------------------------

_RICH_CLUB_KS = (2, 4, 8)


def parts_rich_club(sf_dir: str, ks=_RICH_CLUB_KS,
                    support: int = 2) -> pd.DataFrame:
    """(k, n_rich, n_edges, rc_ppm) sorted by k: for each pinned degree
    floor k, the rich club is the set of nodes with degree > k; n_edges
    counts co-order edges internal to it and ``rc_ppm = 2·n_edges·10⁶
    // (n_rich·(n_rich−1))`` is its density.  Floors whose club has
    fewer than 2 members emit no row (the twin's HAVING).

    Scale shape: degrees fold from undirected-projection count partials
    under a node-hash bucket; the qualified-id arrays (one per floor,
    bounded by |parts| — a dimension) broadcast via closure, and ONE
    pass over the materialized edge Dataset emits per-block (k, m)
    membership-count partials via searchsorted — no per-k rescan."""
    edges = _co_order_pair_counts(sf_dir, support)

    def project(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "a_id" not in df.columns:
            return pd.DataFrame({"u": pd.Series([], dtype="int64"),
                                 "v": pd.Series([], dtype="int64")})
        return pd.DataFrame({"u": df["a_id"].astype("int64"),
                             "v": df["b_id"].astype("int64")})

    e = edges.map_batches(project, batch_format="pandas").materialize()
    empty = pd.DataFrame({
        "k": pd.Series([], dtype="int64"),
        "n_rich": pd.Series([], dtype="int64"),
        "n_edges": pd.Series([], dtype="int64"),
        "rc_ppm": pd.Series([], dtype="int64")})
    if e.count() == 0:
        return empty

    def deg_partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "u" not in df.columns:
            return pd.DataFrame({"node": pd.Series([], dtype="int64"),
                                 "d": pd.Series([], dtype="int64"),
                                 "_b": pd.Series([], dtype="int64")})
        n = np.concatenate([df["u"].to_numpy(dtype="int64"),
                            df["v"].to_numpy(dtype="int64")])
        g = pd.Series(n).value_counts().rename_axis("node").reset_index(
            name="d")
        g["node"] = g["node"].astype("int64")
        g["d"] = g["d"].astype("int64")
        g["_b"] = (g["node"] % 64).astype("int64")
        return g

    def deg_merge(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "node" not in df.columns:
            return pd.DataFrame({"node": pd.Series([], dtype="int64"),
                                 "d": pd.Series([], dtype="int64")})
        return df.groupby("node", as_index=False)["d"].sum()

    deg = e.map_batches(deg_partial, batch_format="pandas") \
        .groupby("_b").map_groups(deg_merge, batch_format="pandas") \
        .to_pandas()
    if deg.empty or "node" not in deg.columns:
        return empty
    nodes = deg["node"].to_numpy(dtype="int64")
    dd = deg["d"].to_numpy(dtype="int64")
    quals = {int(k): np.sort(nodes[dd > k]) for k in ks}

    def edge_counts(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"k": pd.Series([], dtype="int64"),
                "m": pd.Series([], dtype="int64")}
        if len(df) == 0 or "u" not in df.columns:
            return pd.DataFrame(cols)
        u = df["u"].to_numpy(dtype="int64")
        v = df["v"].to_numpy(dtype="int64")
        rows = []
        for k, q in quals.items():
            if len(q) == 0:
                continue
            m = int((_in_sorted(u, q) & _in_sorted(v, q)).sum())
            rows.append((k, m))
        return pd.DataFrame({
            "k": pd.Series([r[0] for r in rows], dtype="int64"),
            "m": pd.Series([r[1] for r in rows], dtype="int64")})

    mp = e.map_batches(edge_counts, batch_format="pandas").to_pandas()
    out_rows = []
    for k in sorted(int(x) for x in ks):
        n_rich = len(quals[k])
        if n_rich < 2:
            continue
        m = int(mp[mp["k"] == k]["m"].sum()) if len(mp) and \
            "k" in mp.columns else 0
        out_rows.append((k, n_rich, m,
                         2 * m * 1_000_000 // (n_rich * (n_rich - 1))))
    if not out_rows:
        return empty
    return pd.DataFrame({
        "k": pd.Series([r[0] for r in out_rows], dtype="int64"),
        "n_rich": pd.Series([r[1] for r in out_rows], dtype="int64"),
        "n_edges": pd.Series([r[2] for r in out_rows], dtype="int64"),
        "rc_ppm": pd.Series([r[3] for r in out_rows], dtype="int64")})


# ---------------------------------------------------------------------------
# Modularity of the label-propagation communities: the evaluation metric
# for the partition parts_label_propagation produces — exact integer
# numerators (Q = Σ_c q_num_c / (2m)²)
# ---------------------------------------------------------------------------


def parts_modularity(sf_dir: str, support: int = _LPA_SUPPORT,
                     rounds: int = _LPA_ROUNDS) -> pd.DataFrame:
    """(community_id, intra2, deg_sum, q_num) sorted: Newman modularity
    of the parts_label_propagation partition, kept exact — per
    community ``intra2`` counts DIRECTED intra-community edges (= 2·e_c
    over the symmetrized table), ``deg_sum`` its degree mass (= the
    community's directed out-edge count), and ``q_num = intra2·2m −
    deg_sum²`` so that Q = Σ_c q_num / (2m)² with 2m = the directed
    edge count.  int64 holds q_num to ~1.5e9 undirected edges; the twin
    computes in HUGEINT.

    Scale shape: labels come from :func:`_lpa_label_dataset` (node-keyed
    datasets, per-round shuffle joins); the final label table is a
    PARTS-dimension side (bounded) and broadcasts via ray.put, so ONE
    pass over the materialized edge Dataset emits per-block
    (label, intra2, deg) partials — both endpoint lookups are
    searchsorted, no second join round."""
    import ray

    empty = pd.DataFrame({c: pd.Series([], dtype="int64") for c in (
        "community_id", "intra2", "deg_sum", "q_num")})
    edges, labels = _lpa_label_dataset(sf_dir, support, rounds)
    if labels is None:
        return empty
    lab = labels.to_pandas()
    nodes = lab["node"].to_numpy(dtype="int64")
    order = np.argsort(nodes)
    nodes = nodes[order]
    labs = lab["lab"].to_numpy(dtype="int64")[order]
    n_ref = ray.put(nodes)
    l_ref = ray.put(labs)
    m2 = edges.count()

    def per_block(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"lab": pd.Series([], dtype="int64"),
                "intra2": pd.Series([], dtype="int64"),
                "deg": pd.Series([], dtype="int64"),
                "_b": pd.Series([], dtype="int64")}
        if len(df) == 0 or "a_id" not in df.columns:
            return pd.DataFrame(cols)
        nd, lb = ray.get(n_ref), ray.get(l_ref)
        la = lb[np.searchsorted(nd, df["a_id"].to_numpy(dtype="int64"))]
        lbl = lb[np.searchsorted(nd, df["b_id"].to_numpy(dtype="int64"))]
        g = pd.DataFrame({"lab": la,
                          "same": (la == lbl).astype("int64")}) \
            .groupby("lab", as_index=False) \
            .agg(intra2=("same", "sum"), deg=("same", "size"))
        g["_b"] = (g["lab"] % 64).astype("int64")
        for c in ("lab", "intra2", "deg", "_b"):
            g[c] = g[c].astype("int64")
        return g

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "lab" not in df.columns:
            return pd.DataFrame({"lab": pd.Series([], dtype="int64"),
                                 "intra2": pd.Series([], dtype="int64"),
                                 "deg": pd.Series([], dtype="int64")})
        return df.groupby("lab", as_index=False).agg(
            intra2=("intra2", "sum"), deg=("deg", "sum"))

    per = edges.map_batches(per_block, batch_format="pandas") \
        .groupby("_b").map_groups(merge, batch_format="pandas") \
        .to_pandas()
    if per.empty or "lab" not in per.columns:
        return empty
    rows = []
    for r in per.itertuples(index=False):
        i2, dc = int(r.intra2), int(r.deg)
        rows.append((int(r.lab), i2, dc, i2 * m2 - dc * dc))
    rows.sort()
    return pd.DataFrame({
        "community_id": pd.Series([r[0] for r in rows], dtype="int64"),
        "intra2": pd.Series([r[1] for r in rows], dtype="int64"),
        "deg_sum": pd.Series([r[2] for r in rows], dtype="int64"),
        "q_num": pd.Series([r[3] for r in rows], dtype="int64")})


# ---------------------------------------------------------------------------
# events: CEP sequence-pattern matching (MATCH_RECOGNIZE family) — count
# non-overlapping `view click+ purchase` runs in each user's ordered
# history.  The regex-over-symbol-string construction is the classic CEP
# compilation: one C-regex pass per bucket, zero per-user Python
# ---------------------------------------------------------------------------

_CEP_SYMS = {"view": "v", "click": "c", "purchase": "p",
             "signup": "s", "error": "e"}
_CEP_PATTERN = "vc+p"


def _cep_bucket_scan(df: pd.DataFrame, pat, gap_ns=None):
    """Shared CEP bucket core for events_cep_match / events_cep_sessions:
    sort one bucket by (user_id, ts, event_id), break pieces at user
    boundaries (always) and at time gaps > ``gap_ns`` (when given), join
    the pieces into ONE separator-delimited string, and run ONE compiled
    regex pass with searchsorted match→piece attribution.

    Returns (piece_user, piece_len, n_matches, matched_chars) numpy
    arrays, one entry per piece.  The pattern cannot cross the ``|``
    separator, so a match never spans two pieces."""
    df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    uid = df["user_id"].to_numpy(dtype="int64")
    syms = df["sym"].to_numpy(dtype=object)
    brk = np.empty(len(uid), dtype=bool)
    brk[0] = True
    brk[1:] = uid[1:] != uid[:-1]
    if gap_ns is not None:
        ts = df["ts"].to_numpy(dtype="datetime64[ns]").astype("int64")
        dt = np.zeros(len(uid), dtype=np.int64)
        dt[1:] = ts[1:] - ts[:-1]
        brk |= dt > gap_ns
    starts = np.nonzero(brk)[0]               # row index of each piece
    piece_user = uid[starts]
    piece_len = np.diff(np.append(starts, len(uid))).astype("int64")
    # char offset of piece j's first symbol = starts[j] + j ('|' count)
    pieces: List[str] = []
    for j, s in enumerate(starts):
        e = starts[j + 1] if j + 1 < len(starts) else len(uid)
        pieces.append("".join(syms[s:e]))
    blob = "|".join(pieces)
    offsets = starts + np.arange(len(starts))
    n_matches = np.zeros(len(starts), dtype=np.int64)
    matched = np.zeros(len(starts), dtype=np.int64)
    for m in pat.finditer(blob):
        j = int(np.searchsorted(offsets, m.start(), side="right")) - 1
        n_matches[j] += 1
        matched[j] += m.end() - m.start()
    return piece_user, piece_len, n_matches, matched


def events_cep_match(sf_dir: str) -> pd.DataFrame:
    """(user_id, n_events, n_matches, matched_events) for users whose
    event-type sequence (ordered by ts, event_id) contains at least one
    non-overlapping, leftmost-greedy match of ``view click+ purchase`` —
    SQL MATCH_RECOGNIZE / Flink CEP semantics compiled the classic way:
    each event type becomes one symbol char, a user's history becomes a
    string, and the pattern becomes a compiled regex.

    Scale shape: users are hash-bucketed (user_id % 64, complete history
    per bucket — the events_user_paths co-partition); inside a bucket ONE
    pandas sort orders every user's events, the bucket's symbols join
    into a single string with ``|`` separators at user boundaries (the
    pattern cannot cross ``|``), and ONE ``re.finditer`` pass over that
    string finds every match — match→user attribution is a searchsorted
    against the user start-offset array.  No per-user Python, no
    quadratic paths; per-bucket output ≤ #users rows.  Leftmost
    non-overlapping greedy semantics are identical in Python re and
    DuckDB's RE2 for this pattern (no backtracking divergence: ``c+`` is
    greedy and ``p`` is a literal), which is what the oracle twin's
    regexp_extract_all / regexp_replace pair checks."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id",
                                  "event_type"])
    cols = ("user_id", "n_events", "n_matches", "matched_events")
    empty = pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["sym"] = df["event_type"].map(_CEP_SYMS).fillna("e")
        df["_b"] = (df["user_id"].astype("int64") % 64).astype("int64")
        return df[["user_id", "ts", "event_id", "sym", "_b"]]

    pat = re.compile(_CEP_PATTERN)

    def bucket_match(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "user_id" not in df.columns:
            return empty.copy()
        users, n_events, n_matches, matched = _cep_bucket_scan(df, pat)
        hit = n_matches >= 1
        return pd.DataFrame({
            "user_id": users[hit],
            "n_events": n_events[hit],
            "n_matches": n_matches[hit],
            "matched_events": matched[hit]})

    out = ds.map_batches(keep, batch_format="pandas") \
        .groupby("_b").map_groups(bucket_match, batch_format="pandas") \
        .to_pandas()
    if out.empty or "user_id" not in out.columns or len(out) == 0:
        return empty
    for c in cols:
        out[c] = out[c].astype("int64")
    return out[list(cols)].sort_values("user_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# right-to-be-forgotten cascade: delete a customer cohort and everything
# reachable from it (orders → lineitem), reporting exact per-table
# delete accounting — the GDPR-deletion shape every retention pipeline
# needs at 100 TB
# ---------------------------------------------------------------------------

_FORGET_ACCTBAL = -900.0


def orders_forget_customers(sf_dir: str) -> pd.DataFrame:
    """(tab, rows_before, rows_deleted, rows_after) for customer /
    lineitem / orders (sorted by tab): the cascade erasure of every
    customer with ``c_acctbal < -900`` — an attribute ONLY the customer
    table holds, so both hops are forced to learn their delete sets from
    upstream (no per-row shortcut exists in orders or lineitem).

    Scale shape: the forgotten custkey set (≈0.9% of customer) and the
    doomed orderkey set (≈1% of orders) are each assembled SORTED inside
    the filter pass and broadcast once via ``ray.put``; the dependent
    table marks deletions with one zero-copy ``np.searchsorted`` per
    batch — the repo's small-side broadcast gear.  Counts settle as
    per-batch partials (ints only cross the wire).  When a cohort
    outgrows the broadcast budget the same cascade runs as two
    ``Dataset.join`` left_semi hops (the q3/q5 dual-plan gear,
    relational.py:141) — the plan swap is mechanical because each hop
    already IS a semi-join.  Reference deletion context: the engine-side
    exact dedup drop filters (stages/dedup.py) use the identical
    sorted-broadcast + searchsorted membership plumbing."""
    cols = ("tab", "rows_before", "rows_deleted", "rows_after")

    cust = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"])

    def cust_partial(t: pa.Table) -> pa.Table:
        bal = t["c_acctbal"].to_numpy(zero_copy_only=False)
        keys = t["c_custkey"].to_numpy(zero_copy_only=False)
        m = bal < _FORGET_ACCTBAL
        return pa.table({"n": pa.array([len(t)], pa.int64()),
                         "keys": pa.array([keys[m].tolist()],
                                          pa.list_(pa.int64()))})

    cp = cust.map_batches(cust_partial, batch_format="pyarrow").to_pandas()
    n_cust = int(cp["n"].sum())
    del_cust = np.sort(np.concatenate(
        [np.asarray(x, dtype=np.int64) for x in cp["keys"]]
        or [np.array([], dtype=np.int64)]))
    cust_ref = _ray_put(del_cust)

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    def orders_partial(t: pa.Table) -> pa.Table:
        dc = ray.get(cust_ref)                 # zero-copy plasma read
        ck = t["o_custkey"].to_numpy(zero_copy_only=False)
        ok = t["o_orderkey"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(dc, ck)
        hit = (idx < len(dc)) & (dc[np.minimum(idx, max(len(dc) - 1, 0))]
                                 == ck) if len(dc) else np.zeros(
                                     len(ck), dtype=bool)
        return pa.table({"n": pa.array([len(t)], pa.int64()),
                         "keys": pa.array([ok[hit].tolist()],
                                          pa.list_(pa.int64()))})

    op = orders.map_batches(orders_partial, batch_format="pyarrow") \
        .to_pandas()
    n_orders = int(op["n"].sum())
    del_orders = np.sort(np.concatenate(
        [np.asarray(x, dtype=np.int64) for x in op["keys"]]
        or [np.array([], dtype=np.int64)]))
    orders_ref = _ray_put(del_orders)

    line = _read(sf_dir, "lineitem", ["l_orderkey"])

    def line_partial(t: pa.Table) -> pa.Table:
        do = ray.get(orders_ref)
        lk = t["l_orderkey"].to_numpy(zero_copy_only=False)
        if len(do):
            idx = np.searchsorted(do, lk)
            hit = (idx < len(do)) & (
                do[np.minimum(idx, len(do) - 1)] == lk)
            nd = int(hit.sum())
        else:
            nd = 0
        return pa.table({"n": pa.array([len(t)], pa.int64()),
                         "nd": pa.array([nd], pa.int64())})

    lp = line.map_batches(line_partial, batch_format="pyarrow").to_pandas()
    n_line = int(lp["n"].sum())
    d_line = int(lp["nd"].sum())

    rows = [("customer", n_cust, len(del_cust)),
            ("lineitem", n_line, d_line),
            ("orders", n_orders, len(del_orders))]
    out = pd.DataFrame({
        "tab": [r[0] for r in rows],
        "rows_before": pd.Series([r[1] for r in rows], dtype="int64"),
        "rows_deleted": pd.Series([r[2] for r in rows], dtype="int64"),
        "rows_after": pd.Series([r[1] - r[2] for r in rows],
                                dtype="int64")})
    return out[list(cols)]


_CEP_WINDOW_MIN = 1440   # within(1 day) — the CEP time bound


def events_cep_sessions(sf_dir: str) -> pd.DataFrame:
    """(user_id, n_sessions, n_matches, sessions_with_match) for users
    with at least one ``view click+ purchase`` match INSIDE a 1-day
    activity session (gap > _CEP_WINDOW_MIN = 1440 minutes starts a new
    one; at this corpus's event sparsity the 30-minute browse-session
    window leaves every session a singleton, so the day window is what
    makes the time bound a REAL constraint rather than a vacuous one) —
    the time-bounded CEP variant: ``events_cep_match`` scans the whole
    history, this one resets the pattern at every session boundary
    (Flink CEP's within()/session-window composition).

    Scale shape: the shared :func:`_cep_bucket_scan` core (user-hash
    buckets, one pandas sort, ONE C-regex pass per bucket) with
    ``gap_ns`` set, so pieces break at _CEP_WINDOW_MIN-gaps as well as
    user boundaries and a match can never span two sessions.
    Match→session attribution stays a searchsorted; per-user reduction
    folds the ≤ #sessions rows inside the bucket."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id",
                                  "event_type"])
    cols = ("user_id", "n_sessions", "n_matches", "sessions_with_match")
    empty = pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})
    gap_ns = np.int64(_CEP_WINDOW_MIN) * 60 * 1_000_000_000

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["sym"] = df["event_type"].map(_CEP_SYMS).fillna("e")
        df["_b"] = (df["user_id"].astype("int64") % 64).astype("int64")
        return df[["user_id", "ts", "event_id", "sym", "_b"]]

    pat = re.compile(_CEP_PATTERN)

    def bucket_match(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "user_id" not in df.columns:
            return empty.copy()
        sess_users, _, n_matches, _ = _cep_bucket_scan(df, pat,
                                                       gap_ns=gap_ns)
        per = pd.DataFrame({"user_id": sess_users,
                            "m": n_matches,
                            "hit": (n_matches >= 1).astype("int64")}) \
            .groupby("user_id", as_index=False) \
            .agg(n_sessions=("m", "size"), n_matches=("m", "sum"),
                 sessions_with_match=("hit", "sum"))
        per = per[per["n_matches"] >= 1]
        for c in cols:
            per[c] = per[c].astype("int64")
        return per[list(cols)]

    out = ds.map_batches(keep, batch_format="pandas") \
        .groupby("_b").map_groups(bucket_match, batch_format="pandas") \
        .to_pandas()
    if out.empty or "user_id" not in out.columns or len(out) == 0:
        return empty
    for c in cols:
        out[c] = out[c].astype("int64")
    return out[list(cols)].sort_values("user_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# key-skew advisor: the distribution profile a join planner consults
# BEFORE picking a strategy (broadcast / shuffle / salt) — the analysis
# half of events_salted_segment_join's mitigation half
# ---------------------------------------------------------------------------


def events_key_skew(sf_dir: str) -> pd.DataFrame:
    """One-row skew profile of the events fact table's join key
    (user_id): (n_rows, n_keys, max_count, max_share_ppm, hot_keys_10x,
    gini_ppm, recommended_salt).

    ``gini_ppm`` is the EXACT integer Gini of the per-key count
    distribution — computed from a count-of-counts histogram, never a
    global sort: per-key counts settle under 64 user-hash buckets, each
    bucket emits (count_value, n_keys_with_it) partials, and the driver
    folds the bounded histogram (≤ distinct count values, independent of
    key cardinality).  Ranks of tied counts are interchangeable in
    Σ i·c_(i), so the histogram form is exact:
    for a run of f keys at value v starting after rank r the
    contribution is v·(f·r + f·(f+1)/2).  All arithmetic is Python
    arbitrary-precision on the driver (the SQL twin casts through
    HUGEINT), so n·S·10⁶ cannot overflow.
    ``recommended_salt = min(64, max(1, max_count // mean))`` is the
    events_salted_segment_join salt factor the profile implies;
    ``hot_keys_10x`` counts keys above 10× the floor mean (the
    broadcast-set size that join's step 2 would collect)."""
    ds = _read(sf_dir, "events", ["user_id"])

    def count_partial(t: pa.Table) -> pd.DataFrame:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype("int64")
        if len(u) == 0:
            return pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64"),
                                 "_b": pd.Series([], dtype="int64")})
        uk, cnt = np.unique(u, return_counts=True)
        return pd.DataFrame({"user_id": uk, "n": cnt.astype("int64"),
                             "_b": uk % 64})

    def bucket_hist(df: pd.DataFrame) -> pd.DataFrame:
        cols0 = {"v": pd.Series([], dtype="int64"),
                 "f": pd.Series([], dtype="int64")}
        if len(df) == 0 or "user_id" not in df.columns:
            return pd.DataFrame(cols0)
        per_key = df.groupby("user_id")["n"].sum()
        vc = per_key.value_counts()
        return pd.DataFrame({"v": vc.index.to_numpy(dtype="int64"),
                             "f": vc.to_numpy().astype("int64")})

    hist = ds.map_batches(count_partial, batch_format="pyarrow") \
        .groupby("_b").map_groups(bucket_hist, batch_format="pandas") \
        .to_pandas()
    cols = ("n_rows", "n_keys", "max_count", "max_share_ppm",
            "hot_keys_10x", "gini_ppm", "recommended_salt")
    if hist.empty or "v" not in hist.columns or len(hist) == 0:
        return pd.DataFrame({c: pd.Series([], dtype="int64")
                             for c in cols})
    hist = hist.groupby("v", as_index=False)["f"].sum() \
        .sort_values("v").reset_index(drop=True)
    vs = [int(x) for x in hist["v"]]
    fs = [int(x) for x in hist["f"]]
    k = sum(fs)
    S = sum(v * f for v, f in zip(vs, fs))
    mx = vs[-1]
    # Σ i·c_(i) over the ascending-sorted counts, folded per histogram run
    A, r = 0, 0
    for v, f in zip(vs, fs):
        A += v * (f * r + f * (f + 1) // 2)
        r += f
    mean = S // k
    hot = sum(f for v, f in zip(vs, fs) if v > 10 * mean)
    gini_ppm = ((2 * A - (k + 1) * S) * 1_000_000) // (k * S)
    salt = min(64, max(1, mx // max(mean, 1)))
    return pd.DataFrame({
        "n_rows": pd.Series([S], dtype="int64"),
        "n_keys": pd.Series([k], dtype="int64"),
        "max_count": pd.Series([mx], dtype="int64"),
        "max_share_ppm": pd.Series([mx * 1_000_000 // S], dtype="int64"),
        "hot_keys_10x": pd.Series([hot], dtype="int64"),
        "gini_ppm": pd.Series([gini_ppm], dtype="int64"),
        "recommended_salt": pd.Series([salt], dtype="int64")})


def parts_ppr(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Two personalized-PageRank iterations over the co-order part graph,
    restarting on the ``p_size = 1`` part cohort: (part, pr_ppm) top-k by
    final rank — the seeded-relevance sibling of :func:`parts_pagerank`
    (same damping 850/1000, same integer-ppm arithmetic), the primitive
    behind related-item / seed-expansion retrieval.

    Scale shape: edge build identical to parts_pagerank (bounded basket
    blowup, src-bucket outw settle, materialized once).  The seed vector
    never exists as a dense table: seeds are a SORTED broadcast array
    (searchsorted membership — a bounded ~2% slice of part; the q3 gear
    applies above the broadcast budget) and the teleport term is
    recomputed per node row.  Each iteration is ONE node-hash-bucket
    groupby whose input carries (dst, floor-div edge contribution) plus
    zero-contribution (src, 0) rows so teleport-only sources stay in the
    rank table for the next iteration's join; iteration 2 attaches
    rank₁ to edges with the same hash-shuffle ``Dataset.join`` as
    parts_pagerank.  Universe = nodes incident to ≥1 edge (isolated
    seeds are out of scope on BOTH sides, documented)."""
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def dedup_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = df.drop_duplicates(["l_orderkey", "l_partkey"]).copy()
        out["_b"] = (out["l_orderkey"].astype("int64") % 64).astype("int64")
        return out

    def gen_dir_pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["l_orderkey", "l_partkey"])
        m = df.merge(df, on="l_orderkey")
        m = m[m["l_partkey_x"] != m["l_partkey_y"]]
        out = m.groupby(["l_partkey_x", "l_partkey_y"], as_index=False) \
            .size().rename(columns={"l_partkey_x": "src",
                                    "l_partkey_y": "dst", "size": "n"})
        out["_s"] = (out["src"].astype("int64") % 64).astype("int64")
        return out

    def finish_edges(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["src", "dst"], as_index=False)["n"].sum()
        out["outw"] = out.groupby("src")["n"].transform("sum")
        return out[["src", "dst", "n", "outw"]]

    edges = ds.map_batches(dedup_bucket, batch_format="pandas") \
        .groupby("_b").map_groups(gen_dir_pairs, batch_format="pandas") \
        .groupby("_s").map_groups(finish_edges, batch_format="pandas") \
        .materialize()

    empty = pd.DataFrame({"part": pd.Series([], dtype="int64"),
                          "pr_ppm": pd.Series([], dtype="int64")})
    if edges.count() == 0:
        return empty

    seeds_df = _read(sf_dir, "part", ["p_partkey", "p_size"]) \
        .map_batches(lambda t: t.filter(pc.equal(t["p_size"], 1))
                     .select(["p_partkey"]), batch_format="pyarrow") \
        .to_pandas()
    seed_arr = np.sort(seeds_df["p_partkey"].to_numpy(dtype="int64"))
    n_seed = len(seed_arr)
    if n_seed == 0:
        return empty
    seed_ref = _ray_put(seed_arr)
    e_ppm = 1_000_000 // n_seed

    def _teleport(nodes: np.ndarray) -> np.ndarray:
        sa = ray.get(seed_ref)
        idx = np.searchsorted(sa, nodes)
        hit = (idx < len(sa)) & (sa[np.minimum(idx, len(sa) - 1)] == nodes)
        return np.where(hit, np.int64(e_ppm), np.int64(0))

    def contrib1(df: pd.DataFrame) -> pd.DataFrame:
        src = df["src"].to_numpy(dtype="int64")
        dst = df["dst"].to_numpy(dtype="int64")
        r0 = _teleport(src)
        c = (r0 * df["n"].to_numpy(dtype="int64")) \
            // df["outw"].to_numpy(dtype="int64")
        out = pd.DataFrame({
            "node": np.concatenate([dst, src]),
            "c": np.concatenate([c, np.zeros(len(src), dtype="int64")])})
        out = out.groupby("node", as_index=False)["c"].sum()
        out["_d"] = (out["node"] % 64).astype("int64")
        return out

    def fold_rank(df: pd.DataFrame, col: str) -> pd.DataFrame:
        out = df.groupby("node", as_index=False)["c"].sum()
        nodes = out["node"].to_numpy(dtype="int64")
        tele = _teleport(nodes)
        return pd.DataFrame({
            "node": nodes,
            col: (150 * tele // 1_000
                  + 850 * out["c"].to_numpy(dtype="int64") // 1_000)
            .astype("int64")})

    rank1 = edges.map_batches(contrib1, batch_format="pandas") \
        .groupby("_d").map_groups(
            lambda df: fold_rank(df, "rank"), batch_format="pandas")

    n_parts = _join_partitions(sf_dir, "lineitem", selectivity=0.5, cap=16)
    joined = edges.join(rank1, join_type="inner",
                        num_partitions=n_parts,
                        on=("src",), right_on=("node",))

    def contrib2(df: pd.DataFrame) -> pd.DataFrame:
        src = df["src"].to_numpy(dtype="int64")
        dst = df["dst"].to_numpy(dtype="int64")
        c = (df["rank"].to_numpy(dtype="int64")
             * df["n"].to_numpy(dtype="int64")) \
            // df["outw"].to_numpy(dtype="int64")
        out = pd.DataFrame({
            "node": np.concatenate([dst, src]),
            "c": np.concatenate([c, np.zeros(len(src), dtype="int64")])})
        out = out.groupby("node", as_index=False)["c"].sum()
        out["_d"] = (out["node"] % 64).astype("int64")
        return out

    def bucket_top(df: pd.DataFrame) -> pd.DataFrame:
        out = fold_rank(df, "pr_ppm")
        out = out[out["pr_ppm"] > 0]
        return out.sort_values(["pr_ppm", "node"],
                               ascending=[False, True]).head(k)

    tops = joined.map_batches(contrib2, batch_format="pandas") \
        .groupby("_d").map_groups(bucket_top, batch_format="pandas") \
        .to_pandas()
    if tops.empty or "node" not in tops.columns or len(tops) == 0:
        return empty
    tops = tops.sort_values(["pr_ppm", "node"],
                            ascending=[False, True]).head(k)
    return pd.DataFrame({
        "part": tops["node"].astype("int64").to_numpy(),
        "pr_ppm": tops["pr_ppm"].astype("int64").to_numpy()})


_CEP_GUARD_PATTERN = r"s[^e|]*p"   # engine blob: '|' must not be crossed


def events_cep_guard(sf_dir: str) -> pd.DataFrame:
    """(user_id, n_events, n_matches, matched_events) for non-overlapping
    leftmost-greedy ``signup (anything but error)* purchase`` runs per
    ordered user history — the NEGATION/guard CEP class
    (MATCH_RECOGNIZE's exclusion patterns: a run is killed by an
    intervening error event), complementing events_cep_match's plain
    sequence class.

    Same :func:`_cep_bucket_scan` core.  The engine pattern excludes the
    ``|`` piece separator from the negated class (``[^e|]``) so a match
    cannot cross users; the SQL twin's per-user strings have no
    separator, so its ``[^e]*`` is the identical language — Python re
    and RE2 agree on greedy-star + literal-tail spans."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id",
                                  "event_type"])
    cols = ("user_id", "n_events", "n_matches", "matched_events")
    empty = pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["sym"] = df["event_type"].map(_CEP_SYMS).fillna("e")
        df["_b"] = (df["user_id"].astype("int64") % 64).astype("int64")
        return df[["user_id", "ts", "event_id", "sym", "_b"]]

    pat = re.compile(_CEP_GUARD_PATTERN)

    def bucket_match(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "user_id" not in df.columns:
            return empty.copy()
        users, n_events, n_matches, matched = _cep_bucket_scan(df, pat)
        hit = n_matches >= 1
        return pd.DataFrame({
            "user_id": users[hit],
            "n_events": n_events[hit],
            "n_matches": n_matches[hit],
            "matched_events": matched[hit]})

    out = ds.map_batches(keep, batch_format="pandas") \
        .groupby("_b").map_groups(bucket_match, batch_format="pandas") \
        .to_pandas()
    if out.empty or "user_id" not in out.columns or len(out) == 0:
        return empty
    for c in cols:
        out[c] = out[c].astype("int64")
    return out[list(cols)].sort_values("user_id").reset_index(drop=True)
