"""Relational-query tests: DuckDB oracle parity at sf0.001 plus structural
scale-shape guards (VERDICT r1 items 2-3).

The scale guards are source-level regression tests: q3/q5 must join the
fact tables with a hash-shuffle ``Dataset.join`` (never a driver-built map
over ``orders``), and the window queries must use one vectorized lag per
block (never a Python callback per key via ``map_groups``).
"""

from __future__ import annotations

import inspect

import duckdb
import pytest

import __ray_entry__ as entrymod
from ai_intel_web_scraper_ray.pipelines import relational as rel
from tools.check_correctness import compare, to_pandas

SF_DIR = "/root/testdata/sf0.001"

ORACLE_QUERIES = [
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_nation_revenue",
    "q6_revenue_delta",
    "q4_order_priority",
    "q12_priority_lines",
    "q14_promo_revenue",
    "q7_nation_trade",
    "q8_market_share",
    "q9_nation_profit",
    "q13_order_count_dist",
    "q15_top_supplier",
    "q16_supplier_count",
    "q17_small_qty_revenue",
    "q18_large_orders",
    "q21_late_suppliers",
    "q11_part_value_share",
    "q20_excess_shippers",
    "q22_idle_rich_customers",
    "events_funnel",
    "events_rolling_avg",
    "events_value_stats",
    "events_top_user_per_window",
    "events_top_users",
    "parts_pagerank",
    "events_kmv_distinct",
    "orders_bloom_semijoin",
    "parts_triangles",
    "events_new_users_daily",
    "orders_profile",
    "events_daily_ewma",
    "events_session_table",
    "lineitem_zorder_sample",
    "events_cube",
    "orders_price_median",
    "events_range_window",
    "events_hll_registers",
    "events_cms_topk",
    "events_watermark_late",
    "orders_incremental_agg",
    "events_log_compaction",
    "events_window_join",
    "events_hopping_distinct",
    "events_retention",
    "events_view_no_purchase",
    "events_user_paths",
    "events_cep_match",
    "events_cep_sessions",
    "events_cep_guard",
    "events_key_skew",
    "parts_ppr",
    "events_pivot",
    "orders_forget_customers",
    "orders_monthly_growth",
    "orders_running_total",
    "orders_scd2",
    "parts_neighbor_jaccard",
    "lineitem_manifest_stats",
    "orders_rfm",
    "orders_cohort_retention",
    "events_bitmap_distinct",
    "parts_abc_classes",
    "orders_basket_rules",
    "parts_kcore_peel",
    "parts_clustering_coeff",
    "orders_changepoint",
    "parts_mst",
    "events_decayed_counts",
    "events_markov_stationary",
    "events_abtest",
    "events_conversion_lag",
    "orders_seasonal_decompose",
    "events_invalid_transitions",
    "orders_mode_priority",
    "events_periodogram",
    "events_burst_detect",
    "events_hll_sliding",
    "parts_mis",
    "events_sax_words",
    "events_value_percentile_cont",
    "orders_hill_tail",
    "orders_basket_simjoin",
    "orders_fd_audit",
    "events_mann_kendall",
    "events_runs_test",
    "events_spearman",
    "events_markov_accuracy",
    "parts_four_cycles",
    "events_f2_sketch",
    "customer_k_anonymity",
    "lineitem_zone_overlap",
    "parts_rich_club",
    "parts_modularity",
    "parts_ktruss",
    "lineitem_integrity_audit",
    "events_dau_wau",
    "parts_co_ordered",
    "parts_components",
    "lineitem_partition_prune",
    "events_type_overlap",
    "orders_spend_rank",
    "q2_min_cost_part",
    "q5_rollup_revenue",
    "events_hopping",
    "events_asof_click",
    "events_value_range_join",
    "part_type_stats",
    "supplier_nation_acct",
    "events_tumbling",
    "events_sessions",
    "events_props_k",
    "orders_gap_stats",
    "events_anomaly_mad",
    "events_transition_matrix",
    "orders_skyline",
    "events_linreg",
    "events_concurrency",
    "parts_bfs_levels",
    "parts_sssp",
    "orders_ship_calendar",
    "events_gap_fill",
    "events_kaplan_meier",
    "events_autocorr",
    "orders_holt_forecast",
    "orders_benford",
    "parts_degree_assortativity",
]


def test_ship_calendar_outer_sides_live():
    """The FULL OUTER alignment must exercise BOTH null paths on the
    testdata: ship dates trail order dates, so some days have orders but
    no shipments and vice versa."""
    from ai_intel_web_scraper_ray.pipelines import relational as rel

    out = rel.orders_ship_calendar(SF_DIR)
    assert (out["n_orders"] == 0).any(), "no ship-only days"
    assert (out["n_shipped"] == 0).any(), "no order-only days"


def test_sssp_two_hop_cheaper_than_direct(tmp_path):
    """Bellman-Ford re-relaxation: node 3 is first reached in round 1 via
    the expensive direct edge (1,3) and must be IMPROVED in round 2 by
    the cheaper 2-hop path 1→2→3 — the property BFS levels can't see."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ai_intel_web_scraper_ray.pipelines import relational as rel

    rows_ok, rows_pk = [], []
    ok = 0
    for parts, n_orders in (((1, 2), 10), ((2, 3), 10), ((1, 3), 2)):
        for _ in range(n_orders):
            ok += 1
            for p in parts:
                rows_ok.append(ok)
                rows_pk.append(p)
    t = pa.table({"l_orderkey": pa.array(rows_ok, pa.int64()),
                  "l_partkey": pa.array(rows_pk, pa.int64())})
    pq.write_table(t, tmp_path / "lineitem.parquet")
    out = rel.parts_sssp(str(tmp_path))
    got = dict(zip(out["l_partkey"], out["cost"]))
    # w(1,2)=w(2,3)=1e6//10=100000; w(1,3)=1e6//2=500000
    assert got == {1: 0, 2: 100000, 3: 200000}


def _write_coorder_graph(tmp_path, edge_orders):
    """Write a lineitem table whose co-order graph has one edge per
    (parts_pair, n_orders) entry."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows_ok, rows_pk = [], []
    ok = 0
    for parts, n_orders in edge_orders:
        for _ in range(n_orders):
            ok += 1
            for p in parts:
                rows_ok.append(ok)
                rows_pk.append(p)
    t = pa.table({"l_orderkey": pa.array(rows_ok, pa.int64()),
                  "l_partkey": pa.array(rows_pk, pa.int64())})
    pq.write_table(t, tmp_path / "lineitem.parquet")


def test_seasonal_decompose_trunc_div_parity(tmp_path):
    """30 seeded months (one order per month) vs a direct DuckDB run of
    the oracle SQL on the same table: the negative residual means must
    agree, i.e. the engine's sign-aware TRUNCATION matches DuckDB's //
    (Python floor would differ on odd negative sums)."""
    import random

    import duckdb
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tools.check_correctness import compare

    rng = random.Random(11)
    months = pd.date_range("2020-01-01", periods=30, freq="MS")
    df = pd.DataFrame({
        "o_orderdate": months,
        "o_totalprice": [rng.randrange(100, 99999) / 100.0
                         for _ in months]})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   tmp_path / "orders.parquet")
    got = rel.orders_seasonal_decompose(str(tmp_path))
    assert (got["seasonal_cents"] < 0).any(), "negative path not live"
    import __ray_entry__ as em

    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                f"read_parquet('{tmp_path}/orders.parquet')")
    exp = con.execute(em.oracle_sql()["orders_seasonal_decompose"]) \
        .fetch_df()
    con.close()
    problems = compare("orders_seasonal_decompose", got, exp)
    assert not problems, problems


def test_kaplan_meier_censoring_and_truncation(tmp_path):
    """Hand-built cohort: two deaths (10, 20 min), one user censored at
    the corpus MAX(ts), one purchase-before-view user excluded.  The
    survival recurrence truncates per step: S(10)=10⁶·2//3=666666,
    S(20)=666666·1//2=333333 — and the censored user stays in the risk
    set at both death times."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = pd.Timestamp("2024-01-01")
    rows = [(1, "view", 0), (1, "purchase", 10),
            (2, "view", 0), (2, "purchase", 20),
            (3, "view", 0),                       # censored at max ts (20)
            (4, "purchase", 5), (4, "view", 8)]   # purchase first: excluded
    df = pd.DataFrame({
        "user_id": pd.Series([r[0] for r in rows], dtype="int64"),
        "event_type": [r[1] for r in rows],
        "ts": [base + pd.Timedelta(minutes=r[2]) for r in rows]})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   tmp_path / "events.parquet")
    out = rel.events_kaplan_meier(str(tmp_path))
    got = [tuple(int(x) for x in r)
           for r in out[["t_min", "n_risk", "n_events", "surv_ppm"]]
           .itertuples(index=False)]
    assert got == [(10, 3, 1, 666666), (20, 2, 1, 333333)]


def test_holt_forecast_negative_trend_truncates(tmp_path):
    """Falling two-month series y=[1000, 25] cents: l₂ = (50+8000)//10 =
    805, Δl = −195, and the trend step must TRUNCATE toward zero —
    b₂ = trunc(−195/10) = −19 (floor would be −20), fc1 = 786."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    df = pd.DataFrame({
        "o_orderdate": pd.to_datetime(["2024-01-15", "2024-02-15"]),
        "o_totalprice": [10.00, 0.25]})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   tmp_path / "orders.parquet")
    out = rel.orders_holt_forecast(str(tmp_path))
    got = [tuple(int(x) for x in r)
           for r in out[["revenue_cents", "level_cents", "trend_cents",
                         "fc1_cents"]].itertuples(index=False)]
    assert got == [(1000, 1000, 0, 1000), (25, 805, -19, 786)]


def test_autocorr_gap_fill_and_trunc_division(tmp_path):
    """One event on day 0 and one on day 2: the gap day is filled with a
    zero, giving x=[1,0,1] → e=[1,−2,1], den=6.  Lag 1 is the
    truncate-toward-zero pin: −4·10⁶/6 → −666666 (floor would be
    −666667); lag 2 is 10⁶//6 = 166666."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = pd.Timestamp("2024-01-01")
    df = pd.DataFrame({
        "user_id": pd.Series([1, 2], dtype="int64"),
        "event_type": ["view", "view"],
        "ts": [base, base + pd.Timedelta(days=2)]})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   tmp_path / "events.parquet")
    out = rel.events_autocorr(str(tmp_path))
    got = [tuple(int(x) for x in r)
           for r in out[["lag", "n_days", "r_ppm"]].itertuples(index=False)]
    assert got == [(1, 3, -666666), (2, 3, 166666)]


def test_conversion_lag_firsts_and_quantiles(tmp_path):
    """Lags use the FIRST view and FIRST purchase (later events ignored);
    a purchase-before-any-view user doesn't convert; quantile indices are
    ceil(q·n)-1 (DuckDB quantile_disc)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = pd.Timestamp("2024-01-01")
    rows = []
    # users 1..3 convert with lags 10, 20, 30 min (extra later events)
    for u, lag in ((1, 10), (2, 20), (3, 30)):
        rows += [(u, "view", 0), (u, "purchase", lag),
                 (u, "view", lag + 5), (u, "purchase", lag + 60)]
    rows += [(4, "purchase", 0), (4, "view", 10)]   # purchase first: no
    rows += [(5, "view", 0)]                         # never purchases
    df = pd.DataFrame({
        "user_id": pd.Series([r[0] for r in rows], dtype="int64"),
        "event_type": [r[1] for r in rows],
        "ts": [base + pd.Timedelta(minutes=r[2]) for r in rows]})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   tmp_path / "events.parquet")
    out = rel.events_conversion_lag(str(tmp_path))
    r = out.iloc[0]
    # n=3: median idx ceil(1.5)-1=1 → 20; p90 idx ceil(2.7)-1=2 → 30
    assert (int(r.n_users), int(r.median_min), int(r.p90_min)) == (3, 20, 30)


def test_abtest_known_contingency(tmp_path):
    """Hand-built 2×2 table: 4 variant-0 users all convert, 1 of 4
    variant-1 users converts → χ²·10⁶ = 10⁶·8·144 // 240 = 4_800_000."""
    import hashlib

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    def variant(u):
        return int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) % 2

    v0 = [u for u in range(100) if variant(u) == 0][:4]
    v1 = [u for u in range(100) if variant(u) == 1][:4]
    rows = []
    base = pd.Timestamp("2024-01-01")
    for u in v0:
        rows.append((u, "purchase"))
    rows.append((v1[0], "purchase"))
    for u in v1[1:]:
        rows.append((u, "view"))
    df = pd.DataFrame({
        "user_id": pd.Series([r[0] for r in rows], dtype="int64"),
        "event_type": [r[1] for r in rows],
        "ts": [base] * len(rows)})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   tmp_path / "events.parquet")
    out = rel.events_abtest(str(tmp_path))
    r = out.iloc[0]
    assert (int(r.n_a_conv), int(r.n_a_no), int(r.n_b_conv),
            int(r.n_b_no)) == (4, 0, 1, 3)
    assert int(r.chi2_ppm) == 4_800_000


def test_markov_stationary_absorbing_and_leak(tmp_path):
    """A→B→B chain absorbs all surviving mass into B; type C (a single
    event, no transitions) is in the universe but its mass LEAKS (no
    outgoing row) — pinned integer semantics: {A: 0, B: 666666, C: 0}."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = pd.Timestamp("2024-01-01")
    rows = pd.DataFrame({
        "event_id": pd.Series(range(6), dtype="int64"),
        "user_id": pd.Series([1, 1, 1, 2, 2, 3], dtype="int64"),
        "ts": [base + pd.Timedelta(minutes=i) for i in range(6)],
        "event_type": ["A", "B", "B", "A", "B", "C"]})
    pq.write_table(pa.Table.from_pandas(rows, preserve_index=False),
                   tmp_path / "events.parquet")
    out = rel.events_markov_stationary(str(tmp_path))
    got = dict(zip(out["event_type"], out["v_ppm"].astype(int)))
    assert got == {"A": 0, "B": 666666, "C": 0}


def test_decayed_counts_half_life(tmp_path):
    """Pinned weights: an anchor-day event scores 1_000_000, one aged
    8 days scores 500_000 (one half-life), one aged 70 days scores
    1_000_000 // 2^10 = 976; deep past decays to exactly 0."""
    import pandas as pd
    import pyarrow.parquet as pq

    anchor = pd.Timestamp("2024-06-01")
    rows = pd.DataFrame({
        "user_id": pd.Series([1, 2, 3, 4], dtype="int64"),
        "ts": [anchor, anchor - pd.Timedelta(days=8),
               anchor - pd.Timedelta(days=70),
               anchor - pd.Timedelta(days=7 * 25)]})
    pq.write_table(__import__("pyarrow").Table.from_pandas(
        rows, preserve_index=False), tmp_path / "events.parquet")
    out = rel.events_decayed_counts(str(tmp_path))
    got = dict(zip(out["user_id"].astype(int),
                   out["decayed_q"].astype(int)))
    assert got == {1: 1_000_000, 2: 500_000, 3: 976, 4: 0}


def test_mst_cycle_property(tmp_path):
    """Triangle with one expensive edge: the heaviest cycle edge (1,3)
    must be excluded (w(1,2)=w(2,3)=100000 beat w(1,3)=500000)."""
    _write_coorder_graph(tmp_path, (((1, 2), 10), ((2, 3), 10),
                                    ((1, 3), 2)))
    out = rel.parts_mst(str(tmp_path))
    got = {(int(r.u), int(r.v)): int(r.w) for r in out.itertuples()}
    assert got == {(1, 2): 100000, (2, 3): 100000}


def test_mst_multi_round_and_forest(tmp_path):
    """Cheap edges (1,2) and (3,4) are picked by every endpoint in round
    1, leaving TWO contracted components whose only bridge (2,3) must be
    found in round 2 — the Borůvka contraction loop is genuinely
    exercised; the disconnected pair {8,9} stays its own tree (FOREST
    semantics)."""
    _write_coorder_graph(tmp_path, (((1, 2), 10), ((3, 4), 10),
                                    ((2, 3), 2), ((8, 9), 3)))
    out = rel.parts_mst(str(tmp_path))
    got = set(zip(out["u"].astype(int), out["v"].astype(int)))
    assert got == {(1, 2), (3, 4), (2, 3), (8, 9)}


def test_mst_tie_break_total_order(tmp_path):
    """All edges equal weight on a 4-cycle: the (w, u, v) total order
    keeps (1,2), (1,4), (2,3) and drops (3,4) — the lexicographically
    largest cycle edge."""
    _write_coorder_graph(tmp_path, (((1, 2), 5), ((2, 3), 5),
                                    ((3, 4), 5), ((1, 4), 5)))
    out = rel.parts_mst(str(tmp_path))
    got = set(zip(out["u"].astype(int), out["v"].astype(int)))
    assert got == {(1, 2), (1, 4), (2, 3)}


def test_mst_empty_graph(tmp_path):
    """No pair reaches support → typed empty frame."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table({"l_orderkey": pa.array([1, 2], pa.int64()),
                  "l_partkey": pa.array([1, 2], pa.int64())})
    pq.write_table(t, tmp_path / "lineitem.parquet")
    out = rel.parts_mst(str(tmp_path))
    assert list(out.columns) == ["u", "v", "w"] and len(out) == 0


def _write_orders_days(tmp_path, day_cents):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pandas as pd

    days, prices = [], []
    for d, cents in day_cents:
        days.append(pd.Timestamp(d))
        prices.append(cents / 100.0)
    t = pa.table({
        "o_orderdate": pa.array(days, pa.timestamp("ns")),
        "o_totalprice": pa.array(prices, pa.float64())})
    pq.write_table(t, tmp_path / "orders.parquet")


def test_changepoint_level_shift(tmp_path):
    """10 days at 100¢ then 10 days at 500¢: |CUSUM| peaks exactly at the
    last pre-shift day."""
    day_cents = [(f"2024-01-{d:02d}", 10000) for d in range(1, 11)] + \
                [(f"2024-01-{d:02d}", 50000) for d in range(11, 21)]
    _write_orders_days(tmp_path, day_cents)
    out = rel.orders_changepoint(str(tmp_path))
    assert len(out) == 20
    cp = out[out["is_cp"] == 1]
    assert len(cp) == 1
    assert str(cp["day"].iloc[0])[:10] == "2024-01-10"


def test_changepoint_constant_series_pins_first_day(tmp_path):
    """A constant series has dev ≡ 0 everywhere; the earliest-argmax pin
    must mark exactly the first day."""
    day_cents = [(f"2024-02-{d:02d}", 7700) for d in range(1, 6)]
    _write_orders_days(tmp_path, day_cents)
    out = rel.orders_changepoint(str(tmp_path))
    assert out["dev_cents"].tolist() == [0] * 5
    assert out["is_cp"].tolist() == [1, 0, 0, 0, 0]


def test_clustering_coeff_known_graph(tmp_path):
    """Triangle {1,2,3} plus pendant 4—1: node 1 has deg 3 and one
    triangle (coeff 333333 ppm), nodes 2/3 have deg 2 fully closed
    (1000000 ppm), pendant 4 (deg 1) is excluded."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows_ok, rows_pk = [], []
    ok = 0
    for parts, n_orders in (((1, 2), 2), ((1, 3), 2), ((2, 3), 2),
                            ((1, 4), 2)):
        for _ in range(n_orders):
            ok += 1
            for p in parts:
                rows_ok.append(ok)
                rows_pk.append(p)
    t = pa.table({"l_orderkey": pa.array(rows_ok, pa.int64()),
                  "l_partkey": pa.array(rows_pk, pa.int64())})
    pq.write_table(t, tmp_path / "lineitem.parquet")
    out = rel.parts_clustering_coeff(str(tmp_path))
    got = {int(r.part_id): (int(r.degree), int(r.n_tri), int(r.coeff_ppm))
           for r in out.itertuples()}
    assert got == {1: (3, 1, 333333), 2: (2, 1, 1000000),
                   3: (2, 1, 1000000)}


def test_clustering_coeff_triangle_free(tmp_path):
    """A path graph has wedges but no triangles: every deg≥2 node reports
    coeff 0 and the empty-triangle union path must keep its schema."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows_ok, rows_pk = [], []
    ok = 0
    for parts in ((1, 2), (2, 3), (3, 4)):
        for _ in range(2):
            ok += 1
            for p in parts:
                rows_ok.append(ok)
                rows_pk.append(p)
    t = pa.table({"l_orderkey": pa.array(rows_ok, pa.int64()),
                  "l_partkey": pa.array(rows_pk, pa.int64())})
    pq.write_table(t, tmp_path / "lineitem.parquet")
    out = rel.parts_clustering_coeff(str(tmp_path))
    got = {int(r.part_id): (int(r.degree), int(r.n_tri), int(r.coeff_ppm))
           for r in out.itertuples()}
    assert got == {2: (2, 0, 0), 3: (2, 0, 0)}


def test_clustering_coeff_empty_graph(tmp_path):
    """No pair reaches the co-order support → typed empty frame."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table({"l_orderkey": pa.array([1, 2], pa.int64()),
                  "l_partkey": pa.array([1, 2], pa.int64())})
    pq.write_table(t, tmp_path / "lineitem.parquet")
    out = rel.parts_clustering_coeff(str(tmp_path))
    assert list(out.columns) == ["part_id", "degree", "n_tri", "coeff_ppm"]
    assert len(out) == 0
    assert all(str(dt) == "int64" for dt in out.dtypes)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for tbl in "region nation customer supplier part orders lineitem events".split():
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{SF_DIR}/{tbl}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(name, duck):
    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    ray_df = to_pandas(qs[name](SF_DIR))
    sql_df = duck.execute(sqls[name]).fetch_df()
    problems = compare(name, ray_df, sql_df)
    assert not problems, f"{name}: {problems}"


# ---------------------------------------------------------------------------
# scale-shape guards
# ---------------------------------------------------------------------------


def test_fact_joins_are_shuffle_not_driver_maps():
    """q3/q5 must never build a driver-side structure over the orders fact
    table (VERDICT r1 'What's wrong' #2): the orders Dataset flows into
    ``Dataset.join`` and the only ``to_pandas()`` collections are true
    dimensions (customer, nation) or bounded partials."""
    for fn in (rel.q3_top_orders, rel.q5_nation_revenue):
        src = inspect.getsource(fn)
        assert ".join(" in src, f"{fn.__name__} no longer uses a shuffle join"
        # the orders read must stay a Dataset: no driver collection of it
        assert '"orders"' in src
        for bad in ("order_nation", 'orders").to_pandas', "orders.to_pandas",
                    "zip(orders"):
            assert bad not in src, f"{fn.__name__} builds a driver-side orders map"


def test_window_queries_are_vectorized_lag():
    """events_sessions / orders_gap_stats must not run one Python callback
    per key (VERDICT r1 'What's wrong' #3): no map_groups, one sorted
    vectorized diff per block instead."""
    for fn in (rel.events_sessions, rel.orders_gap_stats):
        src = inspect.getsource(fn)
        assert "map_groups" not in src, f"{fn.__name__} regressed to per-key callbacks"
        assert ".sort(" in src and ".diff()" in src


def test_session_boundary_straddle():
    """A user whose sorted events straddle blocks must still count the
    boundary gap: force tiny blocks so every user straddles, then compare
    with the single-partition answer."""
    import pandas as pd
    import ray.data as rd

    from ai_intel_web_scraper_ray.pipelines.relational import SESSION_GAP_MIN

    base = pd.Timestamp("2024-01-01")
    rows = []
    for uid in range(4):
        ts = base
        for i in range(10):
            # alternate small / large gaps → several sessions per user
            ts = ts + pd.Timedelta(minutes=5 if i % 3 else SESSION_GAP_MIN + 10)
            rows.append({"user_id": uid, "ts": ts})
    df = pd.DataFrame(rows)

    expected = {}
    for uid, g in df.groupby("user_id"):
        gaps = g.sort_values("ts")["ts"].diff()
        expected[uid] = int((gaps > pd.Timedelta(minutes=SESSION_GAP_MIN)).sum()) + 1

    import tempfile, os

    with tempfile.TemporaryDirectory() as tmp:
        df.sample(frac=1, random_state=7).reset_index(drop=True).to_parquet(
            os.path.join(tmp, "events.parquet")
        )
        # monkeypatch-free: call the pipeline against the tmp dir; _read's
        # override_num_blocks=8 splits 40 rows into tiny blocks, so sorted
        # users straddle block boundaries
        out = rel.events_sessions(tmp)

    got = dict(zip(out["user_id"], out["n_sessions"]))
    assert got == expected


class TestQ19DualPath:
    def test_fallback_join_matches_broadcast(self):
        """q19's two plans (broadcast key sets vs lineitem⋈part shuffle
        join) must agree — broadcast_max=0 forces the join path."""
        import pandas as pd

        from ai_intel_web_scraper_ray.pipelines import relational as rel
        a = rel.q19_branch_revenue(SF_DIR)
        b = rel.q19_branch_revenue(SF_DIR, broadcast_max=0)
        pd.testing.assert_frame_equal(a, b)
        assert int(a["n_rows"].iloc[0]) > 0


class TestCustomerShufflePath:
    """VERDICT r2 item 1: q3/q5/q18/q22 must have a customer-side plan
    that builds NO O(|customer|) driver/plasma object.  broadcast_max_
    rows=0 forces it; the broadcast-path ``_ray_put`` seam is patched to
    raise, proving the shuffle plan never touches plasma broadcast."""

    def _forced(self, monkeypatch, fn, **kw):
        import pandas as pd

        a = fn(SF_DIR)

        def boom(_):
            raise AssertionError("broadcast path engaged on shuffle plan")

        monkeypatch.setattr(rel, "_ray_put", boom)
        b = fn(SF_DIR, broadcast_max_rows=0)
        monkeypatch.undo()
        pd.testing.assert_frame_equal(a, b)
        return a

    def test_q3_semi_join_matches_broadcast(self, monkeypatch):
        a = self._forced(monkeypatch, rel.q3_top_orders)
        assert rel._LAST_PATH["q3"] == "shuffle"
        assert len(a) > 0

    def test_q5_inner_join_matches_broadcast(self, monkeypatch):
        a = self._forced(monkeypatch, rel.q5_nation_revenue)
        assert rel._LAST_PATH["q5"] == "shuffle"
        assert len(a) > 0

    def test_q18_winner_join_matches_broadcast(self, monkeypatch):
        a = self._forced(monkeypatch, rel.q18_large_orders)
        assert rel._LAST_PATH["q18"] == "shuffle"
        # sf0.001 has few HAVING winners but the shuffle plan must agree
        # even when empty-ish; the row count is data-dependent
        assert list(a.columns) == ["c_name", "o_custkey", "o_orderkey",
                                   "o_orderdate", "o_totalprice",
                                   "sum_qty"]

    def test_q22_anti_join_matches_broadcast(self, monkeypatch):
        a = self._forced(monkeypatch, rel.q22_idle_rich_customers)
        assert rel._LAST_PATH["q22"] == "shuffle"
        assert len(a) > 0

    def test_q9_semi_plus_supplier_join_matches_broadcast(self, monkeypatch):
        a = self._forced(monkeypatch, rel.q9_nation_profit)
        assert rel._LAST_PATH["q9"] == "shuffle"
        assert len(a) > 0

    def test_q7_pair_joins_match_broadcast(self, monkeypatch):
        a = self._forced(monkeypatch, rel.q7_nation_trade)
        assert rel._LAST_PATH["q7"] == "shuffle"
        assert len(a) > 0

    def test_q8_region_and_target_joins_match_broadcast(self, monkeypatch):
        a = self._forced(monkeypatch, rel.q8_market_share)
        assert rel._LAST_PATH["q8"] == "shuffle"
        assert len(a) > 0

    def test_q17_threshold_join_matches_broadcast(self, monkeypatch):
        a = self._forced(monkeypatch, rel.q17_small_qty_revenue)
        assert rel._LAST_PATH["q17"] == "shuffle"
        assert len(a) == 1

    def test_q5_rollup_join_matches_broadcast(self, monkeypatch):
        a = self._forced(monkeypatch, rel.q5_rollup_revenue)
        assert rel._LAST_PATH["q5_rollup"] == "shuffle"
        assert len(a) > 0

    def test_q11_nation_semi_join_matches_broadcast(self, monkeypatch):
        a = self._forced(monkeypatch, rel.q11_part_value_share)
        assert rel._LAST_PATH["q11"] == "shuffle"
        assert len(a) > 0

    def test_q20_prefix_semi_join_matches_broadcast(self, monkeypatch):
        self._forced(monkeypatch, rel.q20_excess_shippers)
        assert rel._LAST_PATH["q20"] == "shuffle"


def test_q7_empty_join_side_returns_empty_frame():
    """Regression: a nation pair with NO suppliers at this SF makes the
    lineitem join side globally empty — Ray's hash-shuffle join would
    crash on the schemaless empty partition, so q7 must detect it and
    return the SQL-correct empty result with a stable schema.
    (sf0.001 suppliers cover nationkeys {3,8,12,13,15,18,19,20,21,24};
    1 and 2 have none.)"""
    out = rel.q7_nation_trade(SF_DIR, nations=(1, 2))
    assert len(out) == 0
    assert list(out.columns) == ["supp_nation", "cust_nation", "l_year",
                                 "revenue"]
    assert str(out["l_year"].dtype) == "int64"
    assert str(out["revenue"].dtype) == "float64"


class TestSketches:
    def test_cms_estimate_dominates_true_count(self):
        """Count-min is a one-sided estimator: est_n >= true_n always."""
        out = rel.events_cms_topk(SF_DIR)
        assert len(out) == 10
        assert (out["est_n"] >= out["true_n"]).all()
        assert out["user_id"].is_unique

    def test_hll_registers_shape_and_partition_invariance(self):
        """Register table is ≤256 rows of (bucket, max_rank≥1) and MAX-merge
        makes it invariant to how the input is split into blocks."""
        a = rel.events_hll_registers(SF_DIR)
        assert len(a) <= 256
        assert (a["max_rank"] >= 1).all()
        assert a["bucket"].is_unique

        import ray.data as rd
        ds = rd.read_parquet(f"{SF_DIR}/events.parquet",
                             columns=["user_id"], override_num_blocks=13)
        # same partials math over a different split → same registers
        import hashlib
        import numpy as np
        import pandas as pd
        users = ds.to_pandas()["user_id"].drop_duplicates()
        h = users.map(lambda u: int(
            hashlib.md5(str(u).encode()).hexdigest()[:15], 16))
        exp = pd.DataFrame({
            "bucket": (h % 256).to_numpy(dtype=np.int64),
            "max_rank": np.array([53 - int(r).bit_length()
                                  for r in (h // 256).tolist()],
                                 dtype=np.int64)})
        exp = exp.groupby("bucket", as_index=False).max() \
            .sort_values("bucket").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, exp)

    def test_watermark_late_is_partitioning_invariant(self):
        """The distributed prefix-max must not depend on block boundaries:
        a sequential pandas replay is the ground truth."""
        import pandas as pd
        a = rel.events_watermark_late(SF_DIR)
        ev = pd.read_parquet(f"{SF_DIR}/events.parquet",
                             columns=["event_id", "ts", "event_type"]) \
            .sort_values("event_id")
        prev_max = ev["ts"].cummax().shift(1)
        late = ev["ts"] < prev_max - pd.Timedelta(minutes=15)
        exp = pd.DataFrame({"event_type": ev["event_type"], "late": late}) \
            .groupby("event_type", as_index=False) \
            .agg(n_events=("late", "size"), n_late=("late", "sum")) \
            .astype({"n_events": "int64", "n_late": "int64"}) \
            .sort_values("event_type").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, exp)

    def test_incremental_merge_equals_single_pass(self):
        """base(<D) ⊕ delta(=D) must equal one aggregation over <=D."""
        import numpy as np
        import pandas as pd
        merged = rel.orders_incremental_agg(SF_DIR)
        o = pd.read_parquet(f"{SF_DIR}/orders.parquet",
                            columns=["o_orderdate", "o_orderpriority",
                                     "o_totalprice"])
        m = o["o_orderdate"].to_numpy().astype("datetime64[D]") <= \
            np.datetime64("1995-06-17")
        sub = o[m]
        exp = pd.DataFrame({
            "o_orderpriority": sub["o_orderpriority"],
            "n": 1,
            "c": np.floor(sub["o_totalprice"].to_numpy() * 100 + 0.5)
                .astype("int64")}) \
            .groupby("o_orderpriority", as_index=False) \
            .agg(n_orders=("n", "sum"), sum_cents=("c", "sum")) \
            .astype({"n_orders": "int64", "sum_cents": "int64"}) \
            .sort_values("o_orderpriority").reset_index(drop=True)
        pd.testing.assert_frame_equal(merged, exp)


def _write_events(tmp_path, rows):
    """rows: (event_id, ts_str, user_id, event_type, value)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(np.array([r[1] for r in rows],
                                dtype="datetime64[us]")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([float(r[4]) for r in rows], pa.float64()),
        "props": pa.array(['{"k": 0}'] * len(rows), pa.string()),
    })
    pq.write_table(t, tmp_path / "events.parquet")


def test_linreg_truncates_toward_zero_like_duckdb(tmp_path):
    """DuckDB's integer ``//`` truncates toward zero; Python's floors.
    A negative non-exact slope is observable: −491e6/14 is −35,071,428.57…,
    so trunc gives −35071428 while floor would give −35071429 — the engine
    must pin the DuckDB semantics."""
    import pandas as pd

    _write_events(tmp_path, [
        (0, "2024-01-01 00:30:00", 1, "a", 1.00),   # x=0h, y=100c
        (1, "2024-01-01 01:30:00", 1, "a", 0.91),   # x=1h, y=91c
        (2, "2024-01-01 03:30:00", 1, "a", 0.00),   # x=3h, y=0c
    ])
    got = rel.events_linreg(str(tmp_path))
    assert list(got["slope_ppm"]) == [-35071428]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{tmp_path}/events.parquet')")
    sql_df = con.execute(entrymod.oracle_sql()["events_linreg"]).fetch_df()
    con.close()
    problems = compare("events_linreg", got, to_pandas(sql_df))
    assert not problems, problems


def test_concurrency_tie_and_zero_length_semantics(tmp_path):
    """Pins the boundary contract the shipped corpus can't exercise:
    (day 1) an end and a start at the SAME microsecond don't overlap
    (ends sort first) and a single-event session is zero-length and never
    raises the count → max 1 despite three sessions; (day 2) two sessions
    ending at the same instant form a −1 peer group whose net −2 must be
    applied as one collapsed step → max 2."""
    import pandas as pd

    _write_events(tmp_path, [
        # day 1: u1 session 10:00–10:10; u2 zero-length at 10:05;
        # u3 starts exactly at u1's end
        (0, "2024-01-01 10:00:00", 1, "a", 1.0),
        (1, "2024-01-01 10:10:00", 1, "a", 1.0),
        (2, "2024-01-01 10:05:00", 2, "a", 1.0),
        (3, "2024-01-01 10:10:00", 3, "a", 1.0),
        (4, "2024-01-01 10:15:00", 3, "a", 1.0),
        # day 2: u4 and u5 overlap and END at the same instant
        (5, "2024-01-02 10:00:00", 4, "a", 1.0),
        (6, "2024-01-02 10:20:00", 4, "a", 1.0),
        (7, "2024-01-02 10:02:00", 5, "a", 1.0),
        (8, "2024-01-02 10:20:00", 5, "a", 1.0),
    ])
    got = rel.events_concurrency(str(tmp_path))
    assert list(got["max_concurrent"]) == [1, 2]
    assert list(got["day"]) == [pd.Timestamp("2024-01-01"),
                                pd.Timestamp("2024-01-02")]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{tmp_path}/events.parquet')")
    sql_df = con.execute(
        entrymod.oracle_sql()["events_concurrency"]).fetch_df()
    con.close()
    problems = compare("events_concurrency", got, to_pandas(sql_df))
    assert not problems, problems


def test_gap_fill_carries_last_observation_forward(tmp_path):
    """Pins the LOCF contract on a corpus with REAL gaps (the sf0.01
    events table has ~16 events/hour, so the fill path is mostly dormant
    there): hour 0 has two events (arg-last by ts wins), hours 1-2 are
    gaps carrying hour 0's value, hour 3 observes again; a second type
    starting later must not emit rows before its first observation."""
    import pandas as pd

    _write_events(tmp_path, [
        (0, "2024-01-01 00:10:00", 1, "a", 1.00),
        (1, "2024-01-01 00:50:00", 1, "a", 2.00),   # arg-last of hour 0
        (2, "2024-01-01 03:30:00", 1, "a", 5.00),
        (3, "2024-01-01 02:15:00", 2, "b", 9.00),   # b starts at hour 2
    ])
    got = rel.events_gap_fill(str(tmp_path))
    a = got[got["event_type"] == "a"]
    assert list(a["cents"]) == [200, 200, 200, 500]
    assert list(a["filled"]) == [0, 1, 1, 0]
    b = got[got["event_type"] == "b"]
    assert list(b["cents"]) == [900, 900]           # hours 2, 3 only
    assert list(b["filled"]) == [0, 1]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{tmp_path}/events.parquet')")
    sql_df = con.execute(entrymod.oracle_sql()["events_gap_fill"]).fetch_df()
    con.close()
    problems = compare("events_gap_fill", got, to_pandas(sql_df))
    assert not problems, problems


def test_abc_classes_survive_int64_overflow(tmp_path):
    """cum × 1e6 exceeds int64 once total cents > ~9.2e12 — the big-int
    path must match DuckDB's HUGEINT window sum (r2 review finding)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = 40
    price = 4.0e11  # 4e13 cents each → total 1.6e15 cents; ×1e6 >> int64
    t = pa.table({
        "l_partkey": pa.array(list(range(n)), pa.int64()),
        "l_extendedprice": pa.array([price] * n, pa.float64()),
        "l_discount": pa.array([0.0] * n, pa.float64()),
    })
    pq.write_table(t, tmp_path / "lineitem.parquet")
    out = rel.parts_abc_classes(str(tmp_path))
    assert (out["cum_ppm"] > 0).all() and (out["cum_ppm"] <= 1_000_000).all()
    exp = duckdb.sql(f"""
        WITH p AS (
          SELECT l_partkey AS p_partkey,
                 CAST(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*100
                      + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
          FROM '{tmp_path}/lineitem.parquet' GROUP BY 1
        ), r AS (
          SELECT p_partkey, revenue_cents,
                 SUM(revenue_cents) OVER (ORDER BY revenue_cents DESC,
                                          p_partkey) AS cum,
                 SUM(revenue_cents) OVER () AS total
          FROM p
        )
        SELECT p_partkey, CAST((cum * 1000000) // total AS BIGINT) AS cum_ppm
        FROM r ORDER BY p_partkey
    """).df()
    assert list(out["cum_ppm"]) == list(exp["cum_ppm"].astype("int64"))


def test_manifest_stats_fractional_quantities(tmp_path):
    """Per-row centi-quantity keeps partials exactly mergeable under any
    block layout — per-block rounding would double-round (r2 review)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = 64
    import pandas as pd

    t = pa.table({
        "l_shipdate": pa.array(
            [pd.Timestamp("1995-03-01")] * n, pa.timestamp("us")),
        "l_extendedprice": pa.array([10.0] * n, pa.float64()),
        "l_quantity": pa.array([2.3] * n, pa.float64()),
        "l_partkey": pa.array([i % 5 for i in range(n)], pa.int64()),
    })
    pq.write_table(t, tmp_path / "lineitem.parquet")
    out = rel.lineitem_manifest_stats(str(tmp_path))
    assert len(out) == 1
    # 64 rows × floor(230.5) = 64 × 230 — identical however blocks split
    assert int(out["sum_qty_c100"].iloc[0]) == 64 * 230
    assert int(out["n_parts"].iloc[0]) == 5


def test_kcore_keeps_zero_degree_survivors(tmp_path):
    """A node that survives every peel round but loses all its edges in
    the final round must still appear with (degree 0, dropped_round 0) —
    the SQL oracle emits it from the node universe (r2 review repro)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    # star chain: 1-2, 1-3, 2-4, 3-5, 4-6, 5-7 (each co-ordered twice)
    edges = [(1, 2), (1, 3), (2, 4), (3, 5), (4, 6), (5, 7)]
    orders, parts = [], []
    oid = 0
    for (u, v) in edges:
        for _ in range(2):
            orders += [oid, oid]
            parts += [u, v]
            oid += 1
    t = pa.table({"l_orderkey": pa.array(orders, pa.int64()),
                  "l_partkey": pa.array(parts, pa.int64())})
    pq.write_table(t, tmp_path / "lineitem.parquet")
    out = rel.parts_kcore_peel(str(tmp_path))
    # k = 2; rounds peel {6,7}, {4,5}, {2,3}; node 1 survives edgeless
    row = out[out["part"] == 1]
    assert len(row) == 1
    assert int(row["degree"].iloc[0]) == 0
    assert int(row["dropped_round"].iloc[0]) == 0
    assert set(out[out["dropped_round"] == 1]["part"]) == {6, 7}
    assert set(out[out["dropped_round"] == 2]["part"]) == {4, 5}
    assert set(out[out["dropped_round"] == 3]["part"]) == {2, 3}


def test_new_rel_operators_handle_empty_tables(tmp_path):
    """Empty inputs return typed empty frames, never KeyError (the Ray
    empty-block-loses-schema class; r2 review findings)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    li = pa.table({"l_orderkey": pa.array([], pa.int64()),
                   "l_partkey": pa.array([], pa.int64())})
    pq.write_table(li, tmp_path / "lineitem.parquet")
    ev = pa.table({"user_id": pa.array([], pa.int64()),
                   "ts": pa.array([], pa.timestamp("us")),
                   "event_id": pa.array([], pa.int64()),
                   "event_type": pa.array([], pa.string())})
    pq.write_table(ev, tmp_path / "events.parquet")
    assert len(rel.parts_kcore_peel(str(tmp_path))) == 0
    assert len(rel.orders_basket_rules(str(tmp_path))) == 0
    assert len(rel.events_invalid_transitions(str(tmp_path))) == 0
    assert len(rel.events_bitmap_distinct(str(tmp_path))) == 0


def test_assortativity_star_is_minus_one(tmp_path):
    """A 3-leaf star is perfectly disassortative: r_ppm must be exactly
    −1000000, exercising the negative-numerator trunc-div path (DuckDB
    ``//`` truncates toward zero; a floor-div engine would emit
    −1000000 only by luck of exact division — this fixture divides
    exactly, so pair it with the moment columns to pin the path)."""
    _write_coorder_graph(tmp_path, (((1, 2), 2), ((1, 3), 2), ((1, 4), 2)))
    out = rel.parts_degree_assortativity(str(tmp_path))
    assert len(out) == 1
    row = out.iloc[0]
    # M=6 directed ends; A=Σjk=18, B=Σj=12, C=Σj²=30
    assert row["n_edges"] == 3
    assert row["sum_jk"] == 18
    assert row["sum_j"] == 12
    assert row["sum_j2"] == 30
    assert row["r_ppm"] == -1_000_000


def test_assortativity_empty_graph(tmp_path):
    """No co-order pair reaches support → zero rows (the SQL twin's
    HAVING)."""
    _write_coorder_graph(tmp_path, (((1, 2), 1),))
    out = rel.parts_degree_assortativity(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["n_edges", "sum_jk", "sum_j", "sum_j2",
                                 "r_ppm"]


def test_benford_digits_exact(tmp_path):
    """Pinned totals: first digits come from integer CENTS (123.45 →
    12345 → digit 1), never from float formatting; absent digits are
    absent."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    totals = [123.45, 19.99, 901.00, 0.07, 55.55]
    t = pa.table({"o_totalprice": pa.array(totals, pa.float64())})
    pq.write_table(t, tmp_path / "orders.parquet")
    out = rel.orders_benford(str(tmp_path))
    got = dict(zip(out["digit"], out["n_orders"]))
    assert got == {1: 2, 5: 1, 7: 1, 9: 1}
    row1 = out[out["digit"] == 1].iloc[0]
    assert row1["obs_ppm"] == 400_000
    assert row1["benford_ppm"] == 301_029
    assert row1["delta_ppm"] == 98_971


def test_theil_sen_gap_and_truncation(tmp_path):
    """Months Jan/Feb/Apr 2024 (the Apr gap widens the pair denominator
    to 3 resp. 2): revs [1000, 900, 954] cents give pair slopes
    [-1000, trunc(-460/3) = -153 (floor would be -154), 270] → median
    slope -153 tenths/month; intercept median = 954·10 + 153·24292 =
    3726216."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ai_intel_web_scraper_ray.pipelines import relational as rel

    df = pd.DataFrame({
        "o_orderdate": pd.to_datetime(
            ["2024-01-15", "2024-02-15", "2024-04-15"]),
        "o_totalprice": [10.00, 9.00, 9.54]})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   tmp_path / "orders.parquet")
    out = rel.orders_theil_sen(str(tmp_path))
    got = [tuple(int(x) for x in r) for r in out.itertuples(index=False)]
    assert got == [(3, 3, -153, 3726216)]

    # degenerate: a single month has no pairs -> empty frame
    pq.write_table(pa.Table.from_pandas(
        df.iloc[:1], preserve_index=False), tmp_path / "orders.parquet")
    assert len(rel.orders_theil_sen(str(tmp_path))) == 0


def test_ks_test_earliest_argmax_pin(tmp_path):
    """Variant-0 users {1,3,6} buy at [100,200,300] cents, variant-1
    users {2,4,5} at [250,350,400] (md5 parities recomputed here, not
    imported): |cA−cB|·3 peaks at 6 for BOTH t=200 and t=300, so
    at_cents must pin the EARLIEST argmax (200); d_ppm = 6·10⁶//9 =
    666666.  A non-purchase row must be excluded."""
    import hashlib

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ai_intel_web_scraper_ray.pipelines import relational as rel

    assert [int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) % 2
            for u in (1, 3, 6, 2, 4, 5)] == [0, 0, 0, 1, 1, 1]
    base = pd.Timestamp("2024-05-01")
    rows = [(1, "purchase", 1.00), (3, "purchase", 2.00),
            (6, "purchase", 3.00), (2, "purchase", 2.50),
            (4, "purchase", 3.50), (5, "purchase", 4.00),
            (1, "view", 99.0)]
    df = pd.DataFrame({
        "user_id": pd.Series([r[0] for r in rows], dtype="int64"),
        "event_type": [r[1] for r in rows],
        "value": [r[2] for r in rows],
        "ts": [base + pd.Timedelta(minutes=i) for i in range(len(rows))]})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   tmp_path / "events.parquet")
    out = rel.events_ks_test(str(tmp_path))
    got = [tuple(int(x) for x in r) for r in out.itertuples(index=False)]
    assert got == [(3, 3, 666666, 200)]

    # one-variant-only corpus -> empty frame (marginal guard)
    pq.write_table(pa.Table.from_pandas(
        df[df["user_id"].isin([1, 3, 6])], preserve_index=False),
        tmp_path / "events.parquet")
    assert len(rel.events_ks_test(str(tmp_path))) == 0


def test_hits_source_sink_asymmetry(tmp_path):
    """Two orders over parts {1,2,3} give oriented edges (1→2,1→3,2→3)
    each weight 2: auth = {2: 2, 3: 4} → ppm {500000, 1000000}; hub =
    {1: 3·10⁶, 2: 2·10⁶} → ppm {1000000, 666666}.  Part 3 is sink-only
    (hub 0) and part 1 source-only (absent — only authority nodes rank)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ai_intel_web_scraper_ray.pipelines import relational as rel

    rows = [(o, p) for o in (1, 2) for p in (1, 2, 3)]
    df = pd.DataFrame({
        "l_orderkey": pd.Series([r[0] for r in rows], dtype="int64"),
        "l_partkey": pd.Series([r[1] for r in rows], dtype="int64")})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   tmp_path / "lineitem.parquet")
    out = rel.parts_hits(str(tmp_path))
    got = [tuple(int(x) for x in r) for r in out.itertuples(index=False)]
    assert got == [(3, 1_000_000, 0), (2, 500_000, 666_666)]


def test_rolling_median_lower_order_statistic(tmp_path):
    """Even windows take the LOWER median (quantile_disc = ceil(q·n)−1):
    daily revenues [40,10,30,20] → windows sorted [40]→40, [10,40]→10,
    [10,30,40]→30, [10,20,30,40]→20."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ai_intel_web_scraper_ray.pipelines import relational as rel

    df = pd.DataFrame({
        "o_orderdate": pd.to_datetime(
            ["2024-03-01", "2024-03-02", "2024-03-03", "2024-03-04"]),
        "o_totalprice": [0.40, 0.10, 0.30, 0.20]})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   tmp_path / "orders.parquet")
    out = rel.orders_rolling_median(str(tmp_path))
    assert out["revenue_cents"].tolist() == [40, 10, 30, 20]
    assert out["med7_cents"].tolist() == [40, 10, 30, 20]


def test_adamic_adar_known_graph(tmp_path):
    """Triangle {1,2,3} plus pendant 4—1: the only non-edges with a
    common neighbor are (2,4) and (3,4), each through center 1 (deg 3,
    weight 1e12 // round(ln3·1e6) = 910239); every edge pair is excluded
    even though it has common neighbors."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows_ok, rows_pk = [], []
    ok = 0
    for parts in ((1, 2), (1, 3), (2, 3), (1, 4)):
        for _ in range(2):
            ok += 1
            for p in parts:
                rows_ok.append(ok)
                rows_pk.append(p)
    t = pa.table({"l_orderkey": pa.array(rows_ok, pa.int64()),
                  "l_partkey": pa.array(rows_pk, pa.int64())})
    pq.write_table(t, tmp_path / "lineitem.parquet")
    out = rel.parts_adamic_adar(str(tmp_path))
    got = [(int(r.part_a), int(r.part_b), int(r.n_common),
            int(r.aa_score)) for r in out.itertuples(index=False)]
    assert got == [(2, 4, 1, 910239), (3, 4, 1, 910239)]


def test_adamic_adar_empty_graph(tmp_path):
    """No pair reaches co-order support → typed empty frame."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table({"l_orderkey": pa.array([1, 2], pa.int64()),
                  "l_partkey": pa.array([1, 2], pa.int64())})
    pq.write_table(t, tmp_path / "lineitem.parquet")
    out = rel.parts_adamic_adar(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["part_a", "part_b", "n_common",
                                 "aa_score"]


def test_welch_ttest_planted_and_degenerate(tmp_path):
    """Planted Welch case: variant A values {0,2} (mean 1, var 2) vs
    variant B {4,6} (mean 5, var 2) → se² = 2, t = −4/√2 = −2.828427…
    (micro −2828427), Welch–Satterthwaite df = 2 (micro 2000000).
    One-variant corpora emit nothing; equal constant values pin
    t_micro = df_micro = 0 via the se² = 0 guard."""
    import hashlib

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    def variant(uid: int) -> int:
        return int(hashlib.md5(str(uid).encode()).hexdigest()[:8], 16) % 2

    v0 = [u for u in range(1, 40) if variant(u) == 0][:3]
    v1 = [u for u in range(1, 40) if variant(u) == 1][:3]

    def write(vals0, vals1):
        users = v0[:len(vals0)] + v1[:len(vals1)]
        vals = list(vals0) + list(vals1)
        df = pd.DataFrame({
            "event_id": pd.Series(range(len(vals)), dtype="int64"),
            "ts": pd.to_datetime(["2024-01-01"] * len(vals)),
            "user_id": pd.Series(users, dtype="int64"),
            "event_type": ["view"] * len(vals),
            "value": pd.Series(vals, dtype="float64"),
            "props": ["{}"] * len(vals)})
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       tmp_path / "events.parquet")

    write([0.0, 2.0], [4.0, 6.0])
    out = rel.events_welch_ttest(str(tmp_path))
    assert len(out) == 1
    r = out.iloc[0]
    assert (int(r.n_a), int(r.n_b)) == (2, 2)
    assert (float(r.mean_a), float(r.mean_b)) == (1.0, 5.0)
    assert int(r.t_micro) == -2828427
    assert int(r.df_micro) == 2000000

    write([0.0, 2.0, 3.0], [])          # one variant only → empty
    assert len(rel.events_welch_ttest(str(tmp_path))) == 0

    write([7.0, 7.0], [7.0, 7.0])       # zero pooled se → pinned zeros
    out = rel.events_welch_ttest(str(tmp_path))
    assert int(out.iloc[0].t_micro) == 0
    assert int(out.iloc[0].df_micro) == 0


def test_gini_pins_equality_and_extreme(tmp_path):
    """Gini planted cases: equal spends → 0; near-total concentration
    {1,1,1,9997} cents → (2·(1+2+3+4·9997)−5·10000)·1e6 // (4·10000) =
    749700; an empty orders table → typed empty frame."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    def write(cust_cents):
        df = pd.DataFrame({
            "o_orderkey": pd.Series(range(len(cust_cents)), dtype="int64"),
            "o_custkey": pd.Series([c for c, _ in cust_cents],
                                   dtype="int64"),
            "o_totalprice": pd.Series([v / 100.0 for _, v in cust_cents],
                                      dtype="float64")})
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       tmp_path / "orders.parquet")

    write([(1, 500), (2, 500), (3, 500)])
    out = rel.orders_gini(str(tmp_path))
    assert (int(out.iloc[0].n_customers), int(out.iloc[0].total_cents),
            int(out.iloc[0].gini_ppm)) == (3, 1500, 0)

    write([(1, 1), (2, 1), (3, 1), (4, 9997)])
    out = rel.orders_gini(str(tmp_path))
    assert (int(out.iloc[0].n_customers), int(out.iloc[0].total_cents),
            int(out.iloc[0].gini_ppm)) == (4, 10000, 749700)

    write([])
    empty = rel.orders_gini(str(tmp_path))
    assert len(empty) == 0
    assert list(empty.columns) == ["n_customers", "total_cents",
                                   "gini_ppm"]


def test_stress_centrality_path_graph(tmp_path):
    """Path 1—2—3—4—5 with sources {1,2,3,4}: hand-summed σ·g gives
    stress 6 for node 3, 5 for node 2, 3 for node 4, 0 for the
    endpoints — σ ≡ 1 on a path so this pins the backward g recurrence
    and the interior-only credit."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows_ok, rows_pk = [], []
    ok = 0
    for parts in ((1, 2), (2, 3), (3, 4), (4, 5)):
        for _ in range(2):
            ok += 1
            for p in parts:
                rows_ok.append(ok)
                rows_pk.append(p)
    t = pa.table({"l_orderkey": pa.array(rows_ok, pa.int64()),
                  "l_partkey": pa.array(rows_pk, pa.int64())})
    pq.write_table(t, tmp_path / "lineitem.parquet")
    out = rel.parts_stress_centrality(str(tmp_path))
    got = [(int(r.part_id), int(r.stress))
           for r in out.itertuples(index=False)]
    assert got == [(3, 6), (2, 5), (4, 3), (1, 0), (5, 0)]


def test_stress_centrality_diamond_counts_multiplicity(tmp_path):
    """4-cycle 1-2-4-3-1 with all nodes as sources: every node carries
    the same stress 2, and the σ=2 multiplicity through the two
    opposite corners must NOT over-credit the far corner (σ·g with
    g=0 at the target); empty graph → typed empty."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows_ok, rows_pk = [], []
    ok = 0
    for parts in ((1, 2), (1, 3), (2, 4), (3, 4)):
        for _ in range(2):
            ok += 1
            for p in parts:
                rows_ok.append(ok)
                rows_pk.append(p)
    t = pa.table({"l_orderkey": pa.array(rows_ok, pa.int64()),
                  "l_partkey": pa.array(rows_pk, pa.int64())})
    pq.write_table(t, tmp_path / "lineitem.parquet")
    out = rel.parts_stress_centrality(str(tmp_path))
    got = [(int(r.part_id), int(r.stress))
           for r in out.itertuples(index=False)]
    assert got == [(1, 2), (2, 2), (3, 2), (4, 2)]

    t = pa.table({"l_orderkey": pa.array([1, 2], pa.int64()),
                  "l_partkey": pa.array([1, 2], pa.int64())})
    pq.write_table(t, tmp_path / "lineitem.parquet")
    empty = rel.parts_stress_centrality(str(tmp_path))
    assert len(empty) == 0
    assert list(empty.columns) == ["part_id", "stress"]


def test_xyz_classes_zero_months_in_horizon(tmp_path):
    """Over a 3-month global horizon: a steady part is X (cv² = 0); a
    part selling in only one month has cv² = M−1 = 2 → Z; a part
    selling equally in 2 of 3 months has cv² = 0.5 → Y — zero months
    in the horizon count, so the class depends on OTHER parts' months."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [
        (1, "2024-01-05", 10.0), (1, "2024-02-05", 10.0),
        (1, "2024-03-05", 10.0),
        (2, "2024-01-10", 7.0),
        (3, "2024-01-15", 10.0), (3, "2024-02-15", 10.0),
    ]
    df = pd.DataFrame({
        "l_orderkey": pd.Series(range(len(rows)), dtype="int64"),
        "l_partkey": pd.Series([r[0] for r in rows], dtype="int64"),
        "l_shipdate": pd.to_datetime([r[1] for r in rows]),
        "l_quantity": pd.Series([r[2] for r in rows], dtype="float64")})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   tmp_path / "lineitem.parquet")
    out = rel.parts_xyz_classes(str(tmp_path))
    got = {int(r.p_partkey): (int(r.n_months_active), int(r.cv2_ppm),
                              r.xyz_class)
           for r in out.itertuples(index=False)}
    assert got[1] == (3, 0, "X")
    assert got[2] == (1, 2_000_000, "Z")
    assert got[3] == (2, 500_000, "Y")


def test_entropy_rate_pins_deterministic_and_uniform_states(tmp_path):
    """A state with ONE successor type scores exactly 0 micro-nats; a
    state splitting 2/2 between two successors scores ln(2)·10⁶ =
    693147 (each term c·round(ln(m/c)·10⁶) with m=4, c=2).  Transitions
    never cross users."""
    _write_events(tmp_path, [
        # user 1: a→b, b→a, a→c, c→a, a→b
        (0, "2024-01-01 00:00:00", 1, "a", 0.0),
        (1, "2024-01-01 01:00:00", 1, "b", 0.0),
        (2, "2024-01-01 02:00:00", 1, "a", 0.0),
        (3, "2024-01-01 03:00:00", 1, "c", 0.0),
        (4, "2024-01-01 04:00:00", 1, "a", 0.0),
        (5, "2024-01-01 05:00:00", 1, "b", 0.0),
        # user 2: a→c, then c (sequence end; no cross-user transition)
        (6, "2024-01-01 00:00:00", 2, "a", 0.0),
        (7, "2024-01-01 01:00:00", 2, "c", 0.0),
    ])
    out = rel.events_entropy_rate(str(tmp_path))
    got = {r.from_type: (int(r.n_trans), int(r.n_to), int(r.entropy_micro))
           for r in out.itertuples(index=False)}
    # a: successors b,c,b,c → 2×b + 2×c (m=4, uniform over 2) → ln2·1e6
    assert got["a"] == (4, 2, 693147)
    # b: 1×a (user1's b→a), deterministic → 0
    assert got["b"] == (1, 1, 0)
    # c: 1×a → deterministic → 0
    assert got["c"] == (1, 1, 0)
    assert list(out.columns) == ["from_type", "n_trans", "n_to",
                                 "entropy_micro"]


def test_er_pairs_blocking_verify_and_dedup(tmp_path):
    """Delete-1 blocking surfaces substitution, insert/delete and
    identical-name pairs (dist 1/1/0); a transposition ('ab' vs 'ba')
    is a blocking CANDIDATE via two shared variants but fails the exact
    Levenshtein ≤ 1 verify — and must not appear twice either."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    names = ["abc", "abd", "ab", "ba", "dup", "dup", "zzzzzz"]
    t = pa.table({
        "c_custkey": pa.array(range(len(names)), pa.int64()),
        "c_name": pa.array(names, pa.string()),
        "c_nationkey": pa.array([0] * len(names), pa.int32()),
        "c_acctbal": pa.array([0.0] * len(names), pa.float64()),
        "c_mktsegment": pa.array(["B"] * len(names), pa.string())})
    pq.write_table(t, tmp_path / "customer.parquet")
    out = rel.customer_er_pairs(str(tmp_path))
    got = {(int(r.custkey1), int(r.custkey2)): int(r.dist)
           for r in out.itertuples(index=False)}
    assert len(got) == len(out)  # no duplicate pairs
    assert got[(0, 1)] == 1      # abc ~ abd (substitution)
    assert got[(0, 2)] == 1      # abc ~ ab  (deletion)
    assert got[(4, 5)] == 0      # identical names
    assert (2, 3) not in got     # ab vs ba: lev 2, verify rejects
    # abd~ab is also dist 1 — pinned complete result set
    assert got[(1, 2)] == 1
    assert set(got) == {(0, 1), (0, 2), (1, 2), (4, 5)}


def test_closeness_path_graph_hand_computed(tmp_path):
    """Path 1—2—3—4—5 (support 2): from src 1, distances 0+1+2+3+4=10
    over n_reach=5 of n_nodes=5 → (4²·10⁶)//(4·10) = 400000; src 3 (the
    center) has farness 1+1+2+2=6 → 16·10⁶//24 = 666666.  An isolated
    pair (6—7) has farness 1 → (1·10⁶)//(6·1) = 166666 via the
    reachability penalty (n_reach−1)²/(n_nodes−1)."""
    _write_coorder_graph(tmp_path, [
        ((1, 2), 2), ((2, 3), 2), ((3, 4), 2), ((4, 5), 2),
        ((6, 7), 2)])
    out = rel.parts_closeness(str(tmp_path))
    got = {int(r.src): (int(r.n_reach), int(r.farness),
                        int(r.closeness_ppm))
           for r in out.itertuples(index=False)}
    # sources = 4 smallest node ids: 1, 2, 3, 4 ; n_nodes = 7
    assert got[1] == (5, 10, 4 * 4 * 1_000_000 // (6 * 10))
    assert got[2] == (5, 7, 16_000_000 // (6 * 7))
    assert got[3] == (5, 6, 16_000_000 // (6 * 6))
    assert got[4] == (5, 7, 16_000_000 // (6 * 7))
    assert set(got) == {1, 2, 3, 4}


def test_dp_counts_noise_is_deterministic_and_bounded(tmp_path):
    """The md5-uniform Laplace noise is pinned per type: recomputing the
    inverse CDF in the test reproduces noisy_n exactly, two runs agree,
    and |noise| ≤ b·ln(2³²) ≈ 222."""
    import hashlib
    import math

    _write_events(tmp_path, [
        (i, f"2024-01-01 0{i % 10}:00:00", i, t, 1.0)
        for i, t in enumerate(["view"] * 7 + ["purchase"] * 3)
    ])
    out = rel.events_dp_counts(str(tmp_path))
    out2 = rel.events_dp_counts(str(tmp_path))
    assert out.equals(out2)
    got = {r.event_type: (int(r.n), int(r.noisy_n))
           for r in out.itertuples(index=False)}
    for et, (n, noisy) in got.items():
        h = int(hashlib.md5(et.encode()).hexdigest()[:8], 16)
        u = (h + 0.5) / 4294967296.0
        s = 0.0 if u == 0.5 else (1.0 if u > 0.5 else -1.0)
        expect = n + int(round(-10.0 * s * math.log(1 - 2 * abs(u - 0.5))))
        assert noisy == expect
        assert abs(noisy - n) <= 222
    assert got["view"][0] == 7 and got["purchase"][0] == 3


def test_attribution_pins_strictness_window_and_ties(tmp_path):
    """A view AT the purchase ts is NOT credited (strict <); a view
    24 h + 1 µs back is outside the window; two equal-ts candidate
    views credit the LARGER event_id (different hour makes the pin
    observable); unattributed purchases land in view_hour −1."""
    _write_events(tmp_path, [
        # user 1: two views at the SAME ts but different... ts equal →
        # same hour unless we vary; equal-ts tie checked via checksum:
        (0, "2024-01-01 05:00:00", 1, "view", 0.0),
        (1, "2024-01-01 09:30:00", 1, "view", 0.0),
        (2, "2024-01-01 09:30:00", 1, "view", 0.0),
        (3, "2024-01-01 10:00:00", 1, "purchase", 2.00),
        # user 2: only view is exactly AT purchase ts → strict < drops it
        (4, "2024-01-02 07:00:00", 2, "view", 0.0),
        (5, "2024-01-02 07:00:00", 2, "purchase", 3.00),
        # user 3: view 24h+1h before purchase → outside window
        (6, "2024-01-01 06:00:00", 3, "view", 0.0),
        (7, "2024-01-02 07:00:00", 3, "purchase", 5.00),
    ])
    out = rel.events_attribution(str(tmp_path))
    got = {int(r.view_hour): (int(r.n_purchases), int(r.cents_total))
           for r in out.itertuples(index=False)}
    assert got[9] == (1, 200)       # user 1 → 09:30 view (not 05:00)
    assert got[-1] == (2, 800)      # users 2 and 3 unattributed
    assert set(got) == {-1, 9}


def test_bot_users_flags_metronome_and_zero_gaps(tmp_path):
    """A metronome user (identical gaps → IQR 0) and an all-equal-ts
    user (median 0) both flag; a user with wildly uneven gaps does
    not; users under 5 gaps are ignored entirely."""
    rows = []
    eid = 0
    # user 1: exactly 60s gaps ×6 → IQR 0 → bot
    for i in range(7):
        rows.append((eid, f"2024-01-01 00:{i:02d}:00", 1, "view", 0.0))
        eid += 1
    # user 2: all events at one ts → median gap 0 → bot
    for _ in range(6):
        rows.append((eid, "2024-01-01 00:00:00", 2, "view", 0.0))
        eid += 1
    # user 3: gaps 1s, 60s, 1h, 10h, 100h → IQR ≈ 10× median → human
    for t in ("2024-01-01 00:00:00", "2024-01-01 00:00:01",
              "2024-01-01 00:01:01", "2024-01-01 01:01:01",
              "2024-01-01 11:01:01", "2024-01-05 15:01:01"):
        rows.append((eid, t, 3, "view", 0.0))
        eid += 1
    # user 4: only 3 gaps → below min_gaps, not counted
    for i in range(4):
        rows.append((eid, f"2024-01-01 0{i}:00:00", 4, "view", 0.0))
        eid += 1
    _write_events(tmp_path, rows)
    out = rel.events_bot_users(str(tmp_path))
    got = {int(r.is_bot): (int(r.n_users), int(r.user_checksum))
           for r in out.itertuples(index=False)}
    assert got[1] == (2, 3)   # users 1 and 2
    assert got[0] == (1, 3)   # user 3


def test_edge_churn_jaccard_and_last_month(tmp_path):
    """Jan edges {(1,2),(2,3)}, Feb edges {(1,2),(4,5)} → common 1,
    union 3 → 333333 ppm; Feb (the last observed month) compares
    against an empty March (0 ppm)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    # orders 10,11 in Jan; 12,13 in Feb
    odf = pd.DataFrame({
        "o_orderkey": pd.Series([10, 11, 12, 13], dtype="int64"),
        "o_orderdate": pd.to_datetime([
            "2024-01-05", "2024-01-20", "2024-02-03", "2024-02-28"])})
    pq.write_table(pa.Table.from_pandas(odf, preserve_index=False),
                   tmp_path / "orders.parquet")
    rows = [(10, 1), (10, 2),          # Jan edge (1,2)
            (11, 2), (11, 3),          # Jan edge (2,3)
            (12, 1), (12, 2),          # Feb edge (1,2)
            (13, 4), (13, 5)]          # Feb edge (4,5)
    ldf = pd.DataFrame({
        "l_orderkey": pd.Series([r[0] for r in rows], dtype="int64"),
        "l_partkey": pd.Series([r[1] for r in rows], dtype="int64")})
    pq.write_table(pa.Table.from_pandas(ldf, preserve_index=False),
                   tmp_path / "lineitem.parquet")
    out = rel.parts_edge_churn(str(tmp_path))
    got = {str(r.month1)[:7]: (int(r.n_edges1), int(r.n_edges2),
                               int(r.n_common), int(r.jaccard_ppm))
           for r in out.itertuples(index=False)}
    assert got["2024-01"] == (2, 2, 1, 333_333)
    assert got["2024-02"] == (2, 0, 0, 0)
    assert set(got) == {"2024-01", "2024-02"}


def test_bom_rollup_prefix_chain_and_root_once(tmp_path):
    """Parts 5/12/123/1234: deep parts roll into their 2-digit and
    1-digit prefixes and the root exactly once each; nodes over 99
    never appear."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    df = pd.DataFrame({
        "p_partkey": pd.Series([5, 12, 123, 1234], dtype="int64"),
        "p_retailprice": pd.Series([1.0, 2.0, 3.0, 4.0],
                                   dtype="float64")})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   tmp_path / "part.parquet")
    out = rel.parts_bom_rollup(str(tmp_path))
    got = {int(r.node): (int(r.n_parts), int(r.total_cents))
           for r in out.itertuples(index=False)}
    assert got[0] == (4, 1000)
    assert got[1] == (3, 900)
    assert got[12] == (3, 900)
    assert got[5] == (1, 100)
    assert set(got) == {0, 1, 5, 12}


def test_dup_within_window_boundary_and_chain(tmp_path):
    """A repeat exactly AT the window boundary counts (≤); one 1 µs
    past does not; a burst of 3 counts 2 repeats (each row checks only
    its previous identical-key occurrence); different users never
    pair."""
    _write_events(tmp_path, [
        (0, "2024-01-01 00:00:00.000000", 1, "view", 0.0),
        (1, "2024-01-01 01:00:00.000000", 1, "view", 0.0),   # ≤ 1h: dup
        (2, "2024-01-01 02:00:00.000001", 1, "view", 0.0),   # 1h+1µs: no
        (3, "2024-01-01 02:30:00.000000", 1, "view", 0.0),   # dup (vs #2)
        (4, "2024-01-01 00:10:00.000000", 2, "view", 0.0),   # other user
        (5, "2024-01-01 00:00:00.000000", 1, "click", 0.0),  # other type
    ])
    out = rel.events_dup_within_window(str(tmp_path))
    got = {r.event_type: (int(r.n_events), int(r.n_dups), int(r.dup_ppm))
           for r in out.itertuples(index=False)}
    assert got["view"] == (5, 2, 400_000)
    assert got["click"] == (1, 0, 0)


def test_backtest_mae_skips_unobserved_reference_months(tmp_path):
    """Months Jan/Feb/Apr 2024 (March missing): naive evaluates Feb
    (|200−100|=100) only — Apr's reference March is unobserved;
    seasonal-12 has no evaluable month and reports (0, 0)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    df = pd.DataFrame({
        "o_orderdate": pd.to_datetime(
            ["2024-01-15", "2024-02-10", "2024-04-01"]),
        "o_totalprice": pd.Series([1.00, 2.00, 9.00], dtype="float64")})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   tmp_path / "orders.parquet")
    out = rel.orders_backtest_mae(str(tmp_path))
    got = {r.method: (int(r.n_eval), int(r.mae_cents))
           for r in out.itertuples(index=False)}
    assert got["naive_1"] == (1, 100)
    assert got["seasonal_12"] == (0, 0)


def test_croston_coupled_recurrences_hand_computed(tmp_path):
    """Part 1 demands (cq, month): (400, Jan), (800, Mar), (400, Aug):
    z = ((3·400+800)//4 = 500 → (3·500+400)//4 = 475); p = (i₂=2 →
    (3·2+5)//4 = 2); forecast = 475//2 = 237.  Part 2 has a single
    demand month and emits nothing."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [(1, "2024-01-10", 2.0), (1, "2024-01-20", 2.0),
            (1, "2024-03-05", 8.0), (1, "2024-08-15", 4.0),
            (2, "2024-02-01", 5.0)]
    df = pd.DataFrame({
        "l_orderkey": pd.Series(range(len(rows)), dtype="int64"),
        "l_partkey": pd.Series([r[0] for r in rows], dtype="int64"),
        "l_shipdate": pd.to_datetime([r[1] for r in rows]),
        "l_quantity": pd.Series([r[2] for r in rows], dtype="float64")})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   tmp_path / "lineitem.parquet")
    out = rel.parts_croston(str(tmp_path))
    got = {int(r.p_partkey): (int(r.n_demands), int(r.z_cq), int(r.p_m),
                              int(r.forecast_cq))
           for r in out.itertuples(index=False)}
    assert got == {1: (3, 475, 2, 237)}


def test_rle_runs_hand_computed(tmp_path):
    """6 rows in (orderkey, linenumber) order: returnflag A,A,B,B,A,A
    → 3 runs; linestatus all 'O' → 1 run; orderkey 1,1,1,2,2,3 → 3
    runs; suppkey 7,7,7,7,7,9 → 2 runs.  Rows are written shuffled so
    the result only holds if the engine's range sort + block-boundary
    stitching reconstructs the global order."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [(1, 1, "A", "O", 7), (1, 2, "A", "O", 7), (1, 3, "B", "O", 7),
            (2, 1, "B", "O", 7), (2, 2, "A", "O", 7), (3, 1, "A", "O", 9)]
    perm = [3, 0, 5, 2, 4, 1]          # shuffled on disk
    df = pd.DataFrame({
        "l_orderkey": pd.Series([rows[i][0] for i in perm], dtype="int64"),
        "l_linenumber": pd.Series([rows[i][1] for i in perm],
                                  dtype="int32"),
        "l_returnflag": [rows[i][2] for i in perm],
        "l_linestatus": [rows[i][3] for i in perm],
        "l_suppkey": pd.Series([rows[i][4] for i in perm], dtype="int64")})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   tmp_path / "lineitem.parquet")
    out = rel.lineitem_rle_runs(str(tmp_path))
    got = {r.column_name: (int(r.n_rows), int(r.n_runs),
                           int(r.avg_run_len_ppm))
           for r in out.itertuples(index=False)}
    assert got == {"l_orderkey": (6, 3, 2_000_000),
                   "l_returnflag": (6, 3, 2_000_000),
                   "l_linestatus": (6, 1, 6_000_000),
                   "l_suppkey": (6, 2, 3_000_000)}


def test_rle_runs_empty_table(tmp_path):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    df = pd.DataFrame({
        "l_orderkey": pd.Series([], dtype="int64"),
        "l_linenumber": pd.Series([], dtype="int32"),
        "l_returnflag": pd.Series([], dtype="object"),
        "l_linestatus": pd.Series([], dtype="object"),
        "l_suppkey": pd.Series([], dtype="int64")})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   tmp_path / "lineitem.parquet")
    out = rel.lineitem_rle_runs(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["column_name", "n_rows", "n_runs",
                                 "avg_run_len_ppm"]


def test_lead_lag_views_lead_purchases(tmp_path):
    """Purchases copy the view series shifted +1 day, so the lag=+1
    beta dominates every other lag and equals exactly 10⁶ when the
    series are aligned copies over the interior.  Series: views
    3,1,2,5 on days 0-3; purchases 0,3,1,2,5 on days 0-4 (union
    calendar n=5)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    days_v = [0] * 3 + [1] * 1 + [2] * 2 + [3] * 5
    days_p = [1] * 3 + [2] * 1 + [3] * 2 + [4] * 5
    ts = ([pd.Timestamp("2024-03-01") + pd.Timedelta(days=d)
           for d in days_v] +
          [pd.Timestamp("2024-03-01") + pd.Timedelta(days=d)
           for d in days_p])
    et = ["view"] * len(days_v) + ["purchase"] * len(days_p)
    df = pd.DataFrame({
        "ts": ts, "event_type": et,
        "user_id": pd.Series(range(len(ts)), dtype="int64")})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   tmp_path / "events.parquet")
    out = rel.events_lead_lag(str(tmp_path))
    betas = {int(r.lag): int(r.beta_ppm)
             for r in out.itertuples(index=False)}
    assert len(betas) == 7 and out["n_days"].eq(5).all()
    assert betas[1] == max(betas.values())
    assert betas[1] > 0

    # engine == oracle on this fixture
    import duckdb
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{tmp_path}/events.parquet'")
    want = con.execute(
        entrymod.oracle_sql()["events_lead_lag"]).df()
    got = {int(r.lag): int(r.beta_ppm)
           for r in want.itertuples(index=False)}
    assert betas == got


def test_lead_lag_constant_view_series_pins_zero(tmp_path):
    """A constant view series has den = 0 → every beta pinned to 0."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    ts = [pd.Timestamp("2024-03-01") + pd.Timedelta(days=d)
          for d in range(4)] + [pd.Timestamp("2024-03-02"),
                                pd.Timestamp("2024-03-03")]
    et = ["view"] * 4 + ["purchase"] * 2
    df = pd.DataFrame({
        "ts": ts, "event_type": et,
        "user_id": pd.Series(range(len(ts)), dtype="int64")})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   tmp_path / "events.parquet")
    out = rel.events_lead_lag(str(tmp_path))
    assert out["beta_ppm"].eq(0).all() and len(out) == 7


def _write_basket_lineitem(tmp_path, baskets):
    """Write a lineitem table whose order k contains baskets[k]'s parts."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    ok, pk = [], []
    for i, basket in enumerate(baskets):
        for p in basket:
            ok.append(i)
            pk.append(p)
    df = pd.DataFrame({"l_orderkey": pd.Series(ok, dtype="int64"),
                       "l_partkey": pd.Series(pk, dtype="int64")})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   tmp_path / "lineitem.parquet")


def test_katz_path_graph_hand_computed(tmp_path):
    """Path 1—2—3 (each edge co-ordered twice, support 2): w1 = (1,2,1),
    w2 = (2,2,2), w3 = (2,4,2) → katz_64 = (26,44,26); ties pinned
    part ASC so the order is 2,1,3."""
    _write_basket_lineitem(
        tmp_path, [(1, 2), (1, 2), (2, 3), (2, 3)])
    out = rel.parts_katz(str(tmp_path))
    got = [(int(r.p_partkey), int(r.w1), int(r.w2), int(r.w3),
            int(r.katz_64)) for r in out.itertuples(index=False)]
    assert got == [(2, 2, 2, 4, 44), (1, 1, 2, 2, 26), (3, 1, 2, 2, 26)]


def test_katz_empty_graph(tmp_path):
    """No pair reaches support → typed empty frame."""
    _write_basket_lineitem(tmp_path, [(1, 2), (3, 4)])
    out = rel.parts_katz(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["p_partkey", "w1", "w2", "w3",
                                 "katz_64"]


def test_label_propagation_triangle_and_oscillating_pair(tmp_path):
    """Triangle {1,2,3} converges to community 1 by round 2; the
    isolated edge {10,11} OSCILLATES under synchronous updates and
    after exactly 4 rounds lands back on self-labels → two singleton
    communities.  This pins the fixed-round synchronous semantics
    (an asynchronous or converged variant would merge the pair)."""
    tri = [(1, 2, 3)] * 3
    pair = [(10, 11)] * 3
    _write_basket_lineitem(tmp_path, tri + pair)
    out = rel.parts_label_propagation(str(tmp_path))
    got = {int(r.community_id): (int(r.n_parts), int(r.part_checksum))
           for r in out.itertuples(index=False)}
    assert got == {1: (3, 6), 10: (1, 10), 11: (1, 11)}

    import duckdb
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"'{tmp_path}/lineitem.parquet'")
    want = con.execute(
        entrymod.oracle_sql()["parts_label_propagation"]).df()
    assert {int(r.community_id): (int(r.n_parts), int(r.part_checksum))
            for r in want.itertuples(index=False)} == got


def test_label_propagation_empty_graph(tmp_path):
    _write_basket_lineitem(tmp_path, [(1, 2)])
    out = rel.parts_label_propagation(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["community_id", "n_parts",
                                 "part_checksum"]


def test_mode_priority_tie_breaks_lexicographic(tmp_path):
    """Two priorities tied at 2 orders in one month → the
    lexicographically smaller one wins."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    ts = pd.Timestamp("2024-03-05")
    t = pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_orderdate": pa.array([ts] * 4, pa.timestamp("us")),
        "o_orderpriority": pa.array(
            ["2-HIGH", "2-HIGH", "1-URGENT", "1-URGENT"], pa.string()),
    })
    pq.write_table(t, tmp_path / "orders.parquet")
    out = rel.orders_mode_priority(str(tmp_path))
    assert len(out) == 1
    assert out.iloc[0]["mode_priority"] == "1-URGENT"
    assert out.iloc[0]["n_mode"] == 2


def _write_event_times(tmp_path, ts_list, users=None):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = len(ts_list)
    users = users if users is not None else [1] * n
    t = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array([pd.Timestamp(x) for x in ts_list],
                       pa.timestamp("us")),
        "user_id": pa.array(users, pa.int64()),
        "event_type": pa.array(["view"] * n, pa.string()),
        "value": pa.array([1.0] * n, pa.float64()),
    })
    pq.write_table(t, tmp_path / "events.parquet")


def test_periodogram_pure_daily_cycle_dominates(tmp_path):
    """Events only at hour 0 of each day for 14 days: the 24 h period
    carries (nearly) all candidate power; an aliased divisor (12/8)
    stays below it."""
    ts = [f"2024-01-{d:02d} 00:30:00" for d in range(1, 15)]
    _write_event_times(tmp_path, ts)
    out = rel.events_periodogram(str(tmp_path))
    assert out["period"].tolist() == [8, 12, 24, 168]
    p = dict(zip(out["period"], out["power_ppm"]))
    # a once-per-day impulse train is a Dirac comb: every divisor
    # harmonic (24/12/8) carries EQUAL power; the non-divisor 168 h
    # period gets (almost) none
    assert p[24] == max(p.values())
    assert p[24] == p[12] == p[8]
    assert p[168] < p[24] // 100
    assert sum(p.values()) <= 1_000_000


def test_burst_detect_flags_burst_days(tmp_path):
    """1 event/day baseline with a 50-event day in the middle: the
    burst day flips to state 1 and gap days appear with 0 events."""
    ts = []
    for d in (1, 2, 3, 5, 6):           # day 4 is a calendar gap
        ts.append(f"2024-02-{d:02d} 10:00:00")
    ts += [f"2024-02-03 1{k % 10}:0{k % 6}:00" for k in range(50)]
    _write_event_times(tmp_path, ts)
    out = rel.events_burst_detect(str(tmp_path))
    assert len(out) == 6                # full calendar Feb 1..6
    byday = out.set_index(out["day"].dt.day)
    assert byday.loc[4, "n_events"] == 0
    assert byday.loc[3, "state"] == 1   # the burst day
    assert byday.loc[1, "state"] == 0
    # normalization invariant: one of rdp0/rdp1 is 0 every day
    assert ((out["rdp0"] == 0) | (out["rdp1"] == 0)).all()


def test_hll_sliding_merges_trailing_window_only(tmp_path):
    """User A on day 1, user B on day 5, user C on day 20: day 5's
    window merges days 1+5 (both registers), day 20's only itself."""
    _write_event_times(
        tmp_path,
        ["2024-03-01 08:00:00", "2024-03-05 08:00:00",
         "2024-03-20 08:00:00"],
        users=[101, 202, 303])
    out = rel.events_hll_sliding(str(tmp_path))
    assert len(out) == 3
    d1, d5, d20 = (out.iloc[0], out.iloc[1], out.iloc[2])
    assert d1["n_buckets"] == 1 and d20["n_buckets"] == 1
    # 101 and 202 land in different md5 buckets → day-5 window holds both
    assert d5["n_buckets"] == 2
    assert d5["sum_rank"] == d1["sum_rank"] + (d5["sum_rank"] - d1["sum_rank"])
    assert d20["sum_rank"] > 0


def test_mis_path_graph_multi_round(tmp_path):
    """Ascending-id path 1-2-3-4-5: greedy-by-id keeps {1,3,5} — the
    parallel rounds must walk the chain (1 joins, 2 excluded, 3 joins,
    4 excluded, 5 joins), exercising the exclusion-lag round order."""
    _write_coorder_graph(tmp_path, (((1, 2), 2), ((2, 3), 2),
                                    ((3, 4), 2), ((4, 5), 2)))
    out = rel.parts_mis(str(tmp_path))
    got = dict(zip(out["part"].astype(int), out["in_mis"].astype(int)))
    assert got == {1: 1, 2: 0, 3: 1, 4: 0, 5: 1}


def test_mis_star_and_empty(tmp_path):
    """Star with a high-id center: every leaf joins, the center is
    excluded; an under-support corpus yields a typed empty frame."""
    _write_coorder_graph(tmp_path, (((9, 1), 2), ((9, 2), 2),
                                    ((9, 3), 2)))
    out = rel.parts_mis(str(tmp_path))
    got = dict(zip(out["part"].astype(int), out["in_mis"].astype(int)))
    assert got == {1: 1, 2: 1, 3: 1, 9: 0}

    _write_coorder_graph(tmp_path, (((1, 2), 1),))
    out2 = rel.parts_mis(str(tmp_path))
    assert len(out2) == 0
    assert list(out2.columns) == ["part", "in_mis"]


def test_sax_words_zero_fill_and_breakpoints(tmp_path):
    """One user, one day, events only in quarter 0 (×3) and quarter 2
    (×1): the zero-filled quarter multiset {3,1,0,0} pins the quartile
    breakpoints and the resulting word (quantile_disc = ceil(q·n)-1
    order statistic, hand-derived below)."""
    ts = ["2024-04-01 01:00:00", "2024-04-01 02:00:00",
          "2024-04-01 03:00:00", "2024-04-01 13:00:00"]
    _write_event_times(tmp_path, ts, users=[7, 7, 7, 7])
    out = rel.events_sax_words(str(tmp_path))
    # multiset {3,1,0,0} sorted [0,0,1,3]: q25→idx0→0, q50→idx1→0,
    # q75→idx2→1 ⇒ symbols: q0 c=3→'d', q1 c=0→'a', q2 c=1→'c',
    # q3 c=0→'a'
    assert out["word"].tolist() == ["daca"]
    assert out["n_userdays"].tolist() == [1]


def test_percentile_cont_interpolates_exactly(tmp_path):
    """values [1,2,3,4] → cents [100..400]: p50 pos 1.5 → 250c = 2500
    c10; p90 pos 2.7 → 300·3? no — (n−1)·9=27 → lo 2, rem 7 →
    300·3 + 400·7 = 3700 c10 (370 cents)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    ts = pd.Timestamp("2024-01-01")
    t = pa.table({
        "event_id": pa.array(range(4), pa.int64()),
        "ts": pa.array([ts] * 4, pa.timestamp("us")),
        "user_id": pa.array([1] * 4, pa.int64()),
        "event_type": pa.array(["view"] * 4, pa.string()),
        "value": pa.array([1.0, 2.0, 3.0, 4.0], pa.float64())})
    pq.write_table(t, tmp_path / "events.parquet")
    out = rel.events_value_percentile_cont(str(tmp_path))
    assert out.iloc[0]["n_events"] == 4
    assert out.iloc[0]["p50_c10"] == 2500
    assert out.iloc[0]["p90_c10"] == 3700


def test_hill_tail_pareto_like(tmp_path):
    """Geometric tail x_i = 100·2^i: ln-ratios to the min are exact
    multiples of ln2 → hill_inv_micro = mean(0,ln2,2ln2,3ln2)·1e6."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table({
        "o_orderkey": pa.array(range(4), pa.int64()),
        "o_totalprice": pa.array([1.0, 2.0, 4.0, 8.0], pa.float64())})
    pq.write_table(t, tmp_path / "orders.parquet")
    out = rel.orders_hill_tail(str(tmp_path))
    r = out.iloc[0]
    assert r["m_used"] == 4 and r["xm_cents"] == 100
    import math
    exp = (0 + round(math.log(2) * 1e6) + round(math.log(4) * 1e6)
           + round(math.log(8) * 1e6)) // 4
    assert r["hill_inv_micro"] == exp


def test_integrity_audit_counts_orphans(tmp_path):
    """lineitem rows pointing at a missing order are orphans; customers
    without orders/events are orphans in their checks."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2, 99], pa.int64())}),
        tmp_path / "lineitem.parquet")
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_custkey": pa.array([10, 10], pa.int64())}),
        tmp_path / "orders.parquet")
    pq.write_table(pa.table({
        "c_custkey": pa.array([10, 20], pa.int64())}),
        tmp_path / "customer.parquet")
    ts = pd.Timestamp("2024-01-01")
    pq.write_table(pa.table({
        "ts": pa.array([ts], pa.timestamp("us")),
        "user_id": pa.array([20], pa.int64())}),
        tmp_path / "events.parquet")
    out = rel.lineitem_integrity_audit(str(tmp_path))
    got = {r.check: (int(r.n_rows), int(r.n_matched), int(r.n_orphans))
           for r in out.itertuples()}
    assert got == {"lineitem_orders": (4, 3, 1),
                   "customer_orders": (2, 1, 1),
                   "customer_events": (2, 1, 1)}


def _write_baskets(tmp_path, baskets):
    """Write a lineitem table with one row per (order, part) from
    ``baskets`` (dict order → part list; duplicates allowed to exercise
    the distinct projection)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    ok, pk = [], []
    for o, parts in baskets.items():
        for p in parts:
            ok.append(o)
            pk.append(p)
    pq.write_table(pa.table({
        "l_orderkey": pa.array(ok, pa.int64()),
        "l_partkey": pa.array(pk, pa.int64())}),
        tmp_path / "lineitem.parquet")


def test_basket_simjoin_threshold_and_prefix(tmp_path):
    """Hand baskets: (1,2) identical → J=1e6; (3,4) share 3 of 4-item
    baskets → J = 3/5 = 600000 ≥ τ (candidate MUST survive the prefix
    filter: plen(4) = 3 under τ=1/2, the shared tokens reach both
    prefixes); (3,5) share 2 of 4 → J = 2/6 < τ dropped; duplicate
    lineitem rows collapse in the distinct projection."""
    _write_baskets(tmp_path, {
        1: [10, 20],
        2: [10, 20, 20],           # dup row → distinct basket {10,20}
        3: [30, 40, 50, 60],
        4: [30, 40, 50, 70],
        5: [50, 60, 80, 90]})
    out = rel.orders_basket_simjoin(str(tmp_path))
    got = {(int(r.o1), int(r.o2)): int(r.jac_ppm)
           for r in out.itertuples()}
    assert got == {(1, 2): 1_000_000, (3, 4): 600_000}


def test_basket_simjoin_empty_and_singletons(tmp_path):
    """Disjoint singleton baskets → no candidate pairs → typed empty;
    two singletons sharing their only part → J=1."""
    _write_baskets(tmp_path, {1: [10], 2: [20], 3: [30]})
    out = rel.orders_basket_simjoin(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["o1", "o2", "jac_ppm"]

    _write_baskets(tmp_path, {1: [10], 2: [10]})
    out2 = rel.orders_basket_simjoin(str(tmp_path))
    assert {(int(r.o1), int(r.o2)): int(r.jac_ppm)
            for r in out2.itertuples()} == {(1, 2): 1_000_000}


def test_fd_audit_holds_and_violations(tmp_path):
    """Hand tables: orders' key FD holds; customer c_custkey →
    c_mktsegment is VIOLATED (one custkey, two segments → n_viol=1);
    empty part table holds vacuously (0 = 0)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2], pa.int64()),
        "l_partkey": pa.array([10, 11, 10], pa.int64()),
        "l_suppkey": pa.array([5, 5, 6], pa.int64()),
        "l_returnflag": pa.array(["A", "R", "A"])}),
        tmp_path / "lineitem.parquet")
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_custkey": pa.array([7, 7], pa.int64()),
        "o_orderpriority": pa.array(["1-URGENT", "2-HIGH"])}),
        tmp_path / "orders.parquet")
    pq.write_table(pa.table({
        "c_custkey": pa.array([7, 7], pa.int64()),
        "c_name": pa.array(["x", "y"]),
        "c_mktsegment": pa.array(["AUTO", "BUILDING"])}),
        tmp_path / "customer.parquet")
    pq.write_table(pa.table({
        "p_partkey": pa.array([], pa.int64()),
        "p_type": pa.array([], pa.string()),
        "p_brand": pa.array([], pa.string())}),
        tmp_path / "part.parquet")
    pq.write_table(pa.table({
        "s_name": pa.array(["s1", "s2"]),
        "s_nationkey": pa.array([1, 1], pa.int32())}),
        tmp_path / "supplier.parquet")
    out = rel.orders_fd_audit(str(tmp_path))
    got = {(r.tab, r.lhs, r.rhs): (int(r.n_lhs), int(r.n_pairs),
                                   int(r.n_viol), int(r.holds))
           for r in out.itertuples()}
    assert got[("orders", "o_orderkey", "o_custkey")] == (2, 2, 0, 1)
    assert got[("customer", "c_custkey", "c_mktsegment")] == (1, 2, 1, 0)
    assert got[("part", "p_type", "p_brand")] == (0, 0, 0, 1)
    # lineitem l_orderkey → l_returnflag: order 1 has A+R → violated
    assert got[("lineitem", "l_orderkey", "l_returnflag")] == (2, 3, 1, 0)
    assert len(out) == len(rel._FD_CANDIDATES)


def test_mann_kendall_trend_and_ties(tmp_path):
    """Strictly increasing daily counts → S = C(n,2), no count ties;
    a type absent on interior days zero-fills (ties of 0s shrink
    var18num).  3-day horizon, hand-computed."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    ts, ety = [], []
    # 'up': 1 event day0, 2 events day1, 3 events day2
    for day, k in ((1, 1), (2, 2), (3, 3)):
        for i in range(k):
            ts.append(f"2024-01-0{day} 0{i}:00:00")
            ety.append("up")
    # 'spike': only day0 active → series [1,0,0]
    ts.append("2024-01-01 05:00:00")
    ety.append("spike")
    pq.write_table(pa.table({
        "event_type": pa.array(ety),
        "ts": pa.array([pd.Timestamp(t) for t in ts],
                       pa.timestamp("us"))}),
        tmp_path / "events.parquet")
    out = rel.events_mann_kendall(str(tmp_path))
    got = {r.event_type: (int(r.n_days), int(r.s_stat), int(r.var18num))
           for r in out.itertuples()}
    # up: [1,2,3] → S = 3, no ties → var18num = 3·2·11 = 66
    assert got["up"] == (3, 3, 66)
    # spike: [1,0,0] → S = sign(0-1)+sign(0-1)+sign(0-0) = -2;
    # ties: {0:2, 1:1} → tt = 2·1·9 = 18 → var18num = 66-18 = 48
    assert got["spike"] == (3, -2, 48)


def test_ktruss_cascade_and_survivors(tmp_path):
    """K4 = {1,2,3,4} (every edge in 2 triangles → survives both rounds,
    final support 2) plus triangle {4,5,6}: its edges have support 1 <
    k−2 → all three die ROUND 1 (no cascade needed), and pendant edge
    (6,7) with support 0 dies round 1 too."""
    edges = [((1, 2), 2), ((1, 3), 2), ((1, 4), 2), ((2, 3), 2),
             ((2, 4), 2), ((3, 4), 2), ((4, 5), 2), ((4, 6), 2),
             ((5, 6), 2), ((6, 7), 2)]
    _write_coorder_graph(tmp_path, edges)
    out = rel.parts_ktruss(str(tmp_path))
    got = {(int(r.a_id), int(r.b_id)): (int(r.support),
                                        int(r.dropped_round))
           for r in out.itertuples()}
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    for e in k4:
        assert got[e] == (2, 0), e
    for e in [(4, 5), (4, 6), (5, 6)]:
        assert got[e] == (1, 1), e
    assert got[(6, 7)] == (0, 1)


def test_ktruss_round2_cascade(tmp_path):
    """Cascade: K4 {1,2,3,4} shares edge (3,4) with triangles {3,4,5}
    and {3,4,6}.  Round 1 kills the support-1 edges (3,5),(4,5),(3,6),
    (4,6); edge (3,4) had support 3 in round 1 but only 1 AFTER the
    peel → dies in ROUND 2; the four K4-internal... recount: after
    (3,4) dies the remaining K4 edges keep support derived from vertex
    1-2 triangles only."""
    edges = [((1, 2), 2), ((1, 3), 2), ((1, 4), 2), ((2, 3), 2),
             ((2, 4), 2), ((3, 4), 2),
             ((3, 5), 2), ((4, 5), 2), ((3, 6), 2), ((4, 6), 2)]
    _write_coorder_graph(tmp_path, edges)
    out = rel.parts_ktruss(str(tmp_path))
    got = {(int(r.a_id), int(r.b_id)): (int(r.support),
                                        int(r.dropped_round))
           for r in out.itertuples()}
    # round 1 victims: the four outrigger edges, each in exactly 1 tri
    for e in [(3, 5), (4, 5), (3, 6), (4, 6)]:
        assert got[e] == (1, 1), e
    # (3,4): support 4 initially (tris with 1,2,5,6) → survives round 1;
    # after the peel its only triangles are {1,3,4},{2,3,4} → support 2
    # → SURVIVES round 2 as well (2 ≥ k−2).  The K4 core is a 4-truss.
    for e in [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]:
        assert got[e][1] == 0, e


def _oracle_on(tmp_path, name):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{tmp_path}/events.parquet')")
    df = con.execute(entrymod.oracle_sql()[name]).fetch_df()
    con.close()
    return df


def test_runs_test_median_exclusion_and_runs(tmp_path):
    """'alt' daily counts [3,1,2,1,3]: median 2 (quantile_disc lower),
    day 3 excluded, signs [1,0,0,1] → 2 pos / 2 neg / 3 runs,
    exp2num = 4 + 8 = 12, var_num = 8·(8−4) = 32.  'flat' at 1/day ties
    its median everywhere → excluded entirely (row absent, matching the
    SQL group)."""
    rows, eid = [], 0
    for day, k in ((1, 3), (2, 1), (3, 2), (4, 1), (5, 3)):
        for i in range(k):
            rows.append((eid, f"2024-01-0{day} 0{i}:00:00", 1, "alt", 1.0))
            eid += 1
    for day in range(1, 6):
        rows.append((eid, f"2024-01-0{day} 12:00:00", 2, "flat", 1.0))
        eid += 1
    _write_events(tmp_path, rows)
    out = rel.events_runs_test(str(tmp_path))
    got = {r.event_type: (int(r.n_pos), int(r.n_neg), int(r.n_runs),
                          int(r.exp2num), int(r.var_num))
           for r in out.itertuples()}
    assert got == {"alt": (2, 2, 3, 12, 32)}
    problems = compare("events_runs_test", out,
                       to_pandas(_oracle_on(tmp_path, "events_runs_test")))
    assert not problems, problems


def test_spearman_doubled_ranks_with_ties(tmp_path):
    """views/day [1,1,2] (tied pair → doubled average ranks [3,3,6]) vs
    purchases/day [1,2,3] (ranks [2,4,6]): sxy2 = 54, sxx2 = 54,
    syy2 = 56, rho_num = den_x = 18, den_y = 24 — all hand-computed."""
    rows, eid = [], 0
    for day, k in ((1, 1), (2, 1), (3, 2)):
        for i in range(k):
            rows.append((eid, f"2024-01-0{day} 0{i}:00:00", 1, "view", 1.0))
            eid += 1
    for day, k in ((1, 1), (2, 2), (3, 3)):
        for i in range(k):
            rows.append((eid, f"2024-01-0{day} 1{i}:00:00", 1,
                         "purchase", 1.0))
            eid += 1
    _write_events(tmp_path, rows)
    out = rel.events_spearman(str(tmp_path))
    assert len(out) == 1
    r = out.iloc[0]
    assert (int(r.n_days), int(r.sxy2), int(r.sxx2), int(r.syy2)) \
        == (3, 54, 54, 56)
    assert (int(r.rho_num), int(r.den_x), int(r.den_y)) == (18, 18, 24)
    problems = compare("events_spearman", out,
                       to_pandas(_oracle_on(tmp_path, "events_spearman")))
    assert not problems, problems


def test_spearman_perfect_anticorrelation(tmp_path):
    """views [1,2,3] vs purchases [3,2,1] → rho_num = −den = −24
    (rho exactly −1)."""
    rows, eid = [], 0
    for day, k in ((1, 1), (2, 2), (3, 3)):
        for i in range(k):
            rows.append((eid, f"2024-01-0{day} 0{i}:00:00", 1, "view", 1.0))
            eid += 1
    for day, k in ((1, 3), (2, 2), (3, 1)):
        for i in range(k):
            rows.append((eid, f"2024-01-0{day} 1{i}:00:00", 1,
                         "purchase", 1.0))
            eid += 1
    _write_events(tmp_path, rows)
    r = rel.events_spearman(str(tmp_path)).iloc[0]
    assert int(r.rho_num) == -24
    assert int(r.den_x) == 24 and int(r.den_y) == 24


def test_markov_accuracy_majority_and_tie_pin(tmp_path):
    """User 1 walks a,b,a,c,a,b → from 'a' the majority successor is
    'b' (2 of 3, 666666 ppm); user 2 walks x,y,x,z → from 'x' the
    counts tie 1–1 and the pin picks the lexicographically smaller
    'y'."""
    seq1 = ["a", "b", "a", "c", "a", "b"]
    seq2 = ["x", "y", "x", "z"]
    rows = []
    for i, t in enumerate(seq1):
        rows.append((i, f"2024-01-01 0{i}:00:00", 1, t, 1.0))
    for i, t in enumerate(seq2):
        rows.append((10 + i, f"2024-01-01 0{i}:30:00", 2, t, 1.0))
    _write_events(tmp_path, rows)
    out = rel.events_markov_accuracy(str(tmp_path))
    got = {r.from_type: (r.predicted, int(r.n_correct), int(r.n_total),
                         int(r.acc_ppm))
           for r in out.itertuples()}
    assert got["a"] == ("b", 2, 3, 666666)
    assert got["x"] == ("y", 1, 2, 500000)
    assert got["b"] == ("a", 1, 1, 1000000)
    assert got["c"] == ("a", 1, 1, 1000000)
    assert got["y"] == ("x", 1, 1, 1000000)
    problems = compare(
        "events_markov_accuracy", out,
        to_pandas(_oracle_on(tmp_path, "events_markov_accuracy")))
    assert not problems, problems


def test_four_cycles_diagonal_identity(tmp_path):
    """C4 square {1,2,3,4} (edges 12,23,34,14): diagonal pairs (1,3) and
    (2,4) have codegree 2, the four side pairs codegree... sides ARE
    edges, their codegree comes from wedges: (1,2) common nbr? nbrs(1) =
    {2,4}, nbrs(2) = {1,3} → none.  So pairs with codegree: (1,3) c=2,
    (2,4) c=2 → c4_two = 1+1 = 2 → n_c4 = 1.  Adding chord (1,3) doesn't
    change codegrees of the diagonals but creates new wedge pairs
    through node 1 and 3 — hand-recomputed below."""
    edges = [((1, 2), 2), ((2, 3), 2), ((3, 4), 2), ((1, 4), 2)]
    _write_coorder_graph(tmp_path, edges)
    out = rel.parts_four_cycles(str(tmp_path))
    assert len(out) == 1
    r = out.iloc[0]
    assert (int(r.n_pairs), int(r.max_codeg), int(r.c4_two), int(r.n_c4)) \
        == (2, 2, 2, 1)


def test_four_cycles_with_chord_counts_noninduced(tmp_path):
    """Square 1-2-3-4 plus chord (1,3): nbrs 1={2,3,4}, 2={1,3},
    3={1,2,4}, 4={1,3}.  Wedge pairs: via 1: (2,3),(2,4),(3,4); via 2:
    (1,3); via 3: (1,2),(1,4),(2,4); via 4: (1,3) → codegrees:
    (1,3)=2,(2,4)=2, four singles → c4_two = C(2,2)... = 1+1 = 2,
    n_c4 = 1 (the square still counts despite the chord — cycles are
    not induced), n_pairs = 6, max_codeg = 2."""
    edges = [((1, 2), 2), ((2, 3), 2), ((3, 4), 2), ((1, 4), 2),
             ((1, 3), 2)]
    _write_coorder_graph(tmp_path, edges)
    out = rel.parts_four_cycles(str(tmp_path))
    r = out.iloc[0]
    assert (int(r.n_pairs), int(r.max_codeg), int(r.c4_two), int(r.n_c4)) \
        == (6, 2, 2, 1)


def test_four_cycles_empty_graph(tmp_path):
    """No co-order pairs at support 2 → empty frame (HAVING contract)."""
    edges = [((1, 2), 1)]
    _write_coorder_graph(tmp_path, edges)
    out = rel.parts_four_cycles(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["n_pairs", "max_codeg", "c4_two", "n_c4"]


def test_f2_sketch_exact_and_sign_math(tmp_path):
    """Two users with counts 3 and 1: exact F2 = 10; each sketch's est
    is (±3 ±1)² ∈ {4, 16}, median row present with sketch_id −1 —
    verified against the oracle twin (which computes the identical md5
    hex-digit signs)."""
    rows = []
    for i in range(3):
        rows.append((i, f"2024-01-01 0{i}:00:00", 7, "view", 1.0))
    rows.append((3, "2024-01-01 05:00:00", 11, "view", 1.0))
    _write_events(tmp_path, rows)
    out = rel.events_f2_sketch(str(tmp_path))
    assert len(out) == 17
    assert set(out["exact_f2"]) == {10}
    per = out[out["sketch_id"] >= 0]
    assert set(int(x) for x in per["est"]) <= {4, 16}
    med = out[out["sketch_id"] == -1].iloc[0]
    assert int(med.est) == sorted(int(x) for x in per["est"])[7]
    problems = compare("events_f2_sketch", out,
                       to_pandas(_oracle_on(tmp_path, "events_f2_sketch")))
    assert not problems, problems


def test_k_anonymity_class_census(tmp_path):
    """Hand-built customers: class A×SEG1 has 5 rows, B×SEG1 has 1,
    B×SEG2 has 2 → k_min 1, 3 classes, 1 singleton, below-5 rows =
    1 + 2 = 3, total 8."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    nk = [1] * 5 + [2] + [2, 2]
    seg = ["S1"] * 5 + ["S1"] + ["S2", "S2"]
    pq.write_table(pa.table({
        "c_custkey": pa.array(range(8), pa.int64()),
        "c_nationkey": pa.array(nk, pa.int64()),
        "c_mktsegment": pa.array(seg, pa.string())}),
        tmp_path / "customer.parquet")
    out = rel.customer_k_anonymity(str(tmp_path))
    r = out.iloc[0]
    assert (int(r.k_min), int(r.n_classes), int(r.n_singletons),
            int(r.n_below_5), int(r.n_rows)) == (1, 3, 1, 3, 8)


def test_zone_overlap_two_layouts(tmp_path):
    """orderkey parts (width 512): part0 = keys {1,2} spans Jan–Mar,
    part1 = key 600 at Feb (inside part0's span → mutual overlap),
    part2 = key 1100 at Dec (isolated) → overlaps [1,1,0], sum 2,
    avg 666666 ppm.  The ship-month re-sort gives 4 single-day
    partitions → zero overlap everywhere."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    keys = [1, 2, 600, 1100]
    ship = ["2024-01-01", "2024-03-01", "2024-02-01", "2024-12-01"]
    pq.write_table(pa.table({
        "l_orderkey": pa.array(keys, pa.int64()),
        "l_shipdate": pa.array(
            [np.datetime64(d, "us") for d in ship],
            pa.timestamp("us"))}),
        tmp_path / "lineitem.parquet")
    out = rel.lineitem_zone_overlap(str(tmp_path))
    got = {r.layout: (int(r.n_parts), int(r.max_overlaps),
                      int(r.sum_overlaps), int(r.avg_ppm))
           for r in out.itertuples(index=False)}
    assert got == {"orderkey_range": (3, 1, 2, 666666),
                   "ship_month": (4, 0, 0, 0)}


def test_rich_club_floors_and_density(tmp_path):
    """K4 {1,2,3,4} (degree 3) plus a 9-leaf star at node 5 (degree 9):
    at k=2 the club is {1,2,3,4,5} with the K4's 6 internal edges →
    rc = 12e6 // 20 = 600000; at k=4 and k=8 only node 5 qualifies
    (club size 1 < 2) → rows absent."""
    edges = [((1, 2), 2), ((1, 3), 2), ((1, 4), 2), ((2, 3), 2),
             ((2, 4), 2), ((3, 4), 2)]
    edges += [((5, 100 + i), 2) for i in range(9)]
    _write_coorder_graph(tmp_path, edges)
    out = rel.parts_rich_club(str(tmp_path))
    assert len(out) == 1
    r = out.iloc[0]
    assert (int(r.k), int(r.n_rich), int(r.n_edges), int(r.rc_ppm)) \
        == (2, 5, 6, 600000)


def test_modularity_two_triangles_exact(tmp_path):
    """Two disjoint triangles (LPA converges to per-triangle min-label
    communities): per community intra2 = 6 (directed), deg_sum = 6,
    2m = 12 → q_num = 6·12 − 36 = 36 each; Q = 72/144 = 0.5, the known
    modularity of two equal disconnected cliques."""
    edges = [((1, 2), 3), ((2, 3), 3), ((1, 3), 3),
             ((7, 8), 3), ((8, 9), 3), ((7, 9), 3)]
    _write_coorder_graph(tmp_path, edges)
    out = rel.parts_modularity(str(tmp_path))
    got = {int(r.community_id): (int(r.intra2), int(r.deg_sum),
                                 int(r.q_num))
           for r in out.itertuples(index=False)}
    assert got == {1: (6, 6, 36), 7: (6, 6, 36)}


class TestLateWindowAgg:
    def test_hand_fixture_strict_boundary(self, tmp_path):
        """Strict lateness boundary: an event exactly AT watermark−2h is
        accepted; below it is dropped; the first arrival is never late."""
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        d = pd.Timestamp("2024-03-01")
        rows = [
            # (arrival, event_time, value)
            (0, d + pd.Timedelta(hours=10), 1.00),   # first: never late
            (1, d + pd.Timedelta(hours=7), 2.00),    # < 08:00 -> late
            (2, d + pd.Timedelta(hours=8, minutes=30), 4.00),  # accepted
            (3, d + pd.Timedelta(hours=11), 8.00),   # accepted, wm -> 11
            (4, d + pd.Timedelta(hours=9), 16.00),   # == 09:00 boundary: kept
            (5, d + pd.Timedelta(days=1, hours=1), 32.00),  # next day
        ]
        t = pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(pd.Series([r[1] for r in rows])
                           .astype("datetime64[us]")),
            "user_id": pa.array([1] * len(rows), pa.int64()),
            "event_type": pa.array(["x"] * len(rows), pa.string()),
            "value": pa.array([r[2] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string())})
        pq.write_table(t, tmp_path / "events.parquet")
        out = rel.events_late_window_agg(str(tmp_path))
        assert len(out) == 2
        r0 = out.iloc[0]
        assert (int(r0.n_accepted), int(r0.n_late)) == (4, 1)
        assert int(r0.accepted_cents) == 100 + 400 + 800 + 1600
        r1 = out.iloc[1]
        assert (int(r1.n_accepted), int(r1.n_late)) == (1, 0)
        assert int(r1.accepted_cents) == 3200

    def test_block_split_invariance(self):
        """The two-pass exclusive-prefix watermark must not depend on how
        the arrival stream splits into Ray blocks."""
        import ray.data as rd

        a = rel.events_late_window_agg(SF_DIR)

        import pandas as pd

        orig_read = rel._read

        def read13(sf_dir, table, columns=None, num_blocks=8):
            return orig_read(sf_dir, table, columns, num_blocks=13)

        rel._read = read13
        try:
            b = rel.events_late_window_agg(SF_DIR)
        finally:
            rel._read = orig_read
        pd.testing.assert_frame_equal(a, b)


class TestSaltedJoin:
    def test_salted_equals_unsalted_and_hot_keys_fan_out(self):
        """salt=1 is the plain join; salt=8 with an all-hot threshold
        must produce the identical census while actually salting every
        key (fan-out recorded in _LAST_SALT_INFO)."""
        import pandas as pd

        plain = rel.events_salted_segment_join(SF_DIR, salt=1)
        salted = rel.events_salted_segment_join(SF_DIR, salt=8,
                                                hot_factor_ppm=0)
        assert rel._LAST_SALT_INFO["n_hot"] > 0
        pd.testing.assert_frame_equal(plain, salted)

    def test_default_threshold_bounds_hot_set(self):
        rel.events_salted_segment_join(SF_DIR)
        info = rel._LAST_SALT_INFO
        # hot ⇔ count > 1.2×mean  ⇒  #hot < #users/1.2 by Markov
        assert info["n_hot"] >= 0
        assert info["salt"] == rel._SALT_WAYS


class TestCdcState:
    def test_hand_fixture_delete_semantics(self, tmp_path):
        """The key's LAST op decides: upsert-after-delete resurrects,
        delete-after-upsert removes, tiebreak on event_id at equal ts."""
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        t0 = pd.Timestamp("2024-05-01")
        rows = [
            # user 0: upsert then delete -> absent
            (0, t0, 0, "click", 1.0),
            (1, t0 + pd.Timedelta(hours=1), 0, "error", 9.0),
            # user 1: delete then upsert -> live with 2.5
            (2, t0, 1, "error", 9.0),
            (3, t0 + pd.Timedelta(hours=1), 1, "purchase", 2.5),
            # user 2: equal ts, higher event_id wins -> live 4.0
            (4, t0, 2, "view", 3.0),
            (5, t0, 2, "signup", 4.0),
            # user 9: same segment as 2 (9 % 7 == 2), live 1.0
            (6, t0, 9, "click", 1.0),
        ]
        t = pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(pd.Series([r[1] for r in rows])
                           .astype("datetime64[us]")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string())})
        pq.write_table(t, tmp_path / "events.parquet")
        out = rel.events_cdc_state(str(tmp_path))
        got = {int(r.segment): (int(r.n_live), int(r.value_cents))
               for r in out.itertuples(index=False)}
        assert got == {1: (1, 250), 2: (2, 500)}


class TestValuePercentiles:
    def test_hand_fixture_discrete_lower_quantile(self, tmp_path):
        """10 values 1..10 (cents 100..1000): p50 = 5th smallest = 500,
        p95 = ceil(9.5)=10th = 1000, p99 = 1000."""
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        n = 10
        t = pa.table({
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(pd.Series([pd.Timestamp("2024-01-01")] * n)
                           .astype("datetime64[us]")),
            "user_id": pa.array([1] * n, pa.int64()),
            "event_type": pa.array(["click"] * n, pa.string()),
            "value": pa.array([float(i + 1) for i in range(n)],
                              pa.float64()),
            "props": pa.array(["{}"] * n, pa.string())})
        pq.write_table(t, tmp_path / "events.parquet")
        out = rel.events_value_percentiles(str(tmp_path))
        r = out.iloc[0]
        assert (int(r.n_events), int(r.p50_cents), int(r.p95_cents),
                int(r.p99_cents)) == (10, 500, 1000, 1000)


class TestIntervalAndAttribution:
    def test_open_interval_hand_fixture(self, tmp_path):
        """Two orders: A open days 0-2 (ships day 2 -> closes day 3),
        B open days 1-1 (ships day 1 -> closes day 2). Delta days:
        d0 +1 (=1), d1 +1 (=2), d2 -1 (=1), d3 -1 (=0)."""
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        d = pd.Timestamp("2024-01-01")
        orders = pa.table({
            "o_orderkey": pa.array([1, 2], pa.int64()),
            "o_custkey": pa.array([1, 1], pa.int64()),
            "o_orderdate": pa.array(pd.Series([d, d + pd.Timedelta(days=1)])
                                    .astype("datetime64[us]")),
            "o_orderpriority": pa.array(["1-URGENT"] * 2, pa.string()),
            "o_totalprice": pa.array([1.0, 2.0], pa.float64())})
        line = pa.table({
            "l_orderkey": pa.array([1, 1, 2], pa.int64()),
            "l_shipdate": pa.array(pd.Series(
                [d + pd.Timedelta(days=1), d + pd.Timedelta(days=2),
                 d + pd.Timedelta(days=1)]).astype("datetime64[us]"))})
        pq.write_table(orders, tmp_path / "orders.parquet")
        pq.write_table(line, tmp_path / "lineitem.parquet")
        out = rel.orders_open_interval_count(str(tmp_path))
        got = [(str(r.day)[:10], int(r.n_open))
               for r in out.itertuples(index=False)]
        assert got == [("2024-01-01", 1), ("2024-01-02", 2),
                       ("2024-01-03", 1), ("2024-01-04", 0)]

    def test_attribution_hand_fixture(self, tmp_path):
        """User's stream: view, purchase(2.0) in session 1; a >30-min gap;
        click, purchase(4.0), purchase(8.0) in session 2.  First-touch
        credits: view <- 200, click <- 1200."""
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        t0 = pd.Timestamp("2024-01-01 10:00")
        rows = [
            (0, t0, "view", 1.0),
            (1, t0 + pd.Timedelta(minutes=5), "purchase", 2.0),
            (2, t0 + pd.Timedelta(minutes=50), "click", 1.0),
            (3, t0 + pd.Timedelta(minutes=55), "purchase", 4.0),
            (4, t0 + pd.Timedelta(minutes=60), "purchase", 8.0),
        ]
        t = pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(pd.Series([r[1] for r in rows])
                           .astype("datetime64[us]")),
            "user_id": pa.array([7] * len(rows), pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "value": pa.array([r[3] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string())})
        pq.write_table(t, tmp_path / "events.parquet")
        out = rel.events_session_attribution(str(tmp_path))
        got = {r.first_touch: (int(r.n_sessions), int(r.n_purchases),
                               int(r.attributed_cents))
               for r in out.itertuples(index=False)}
        assert got == {"view": (1, 1, 200), "click": (1, 2, 1200)}


def test_salted_join_salt_all_gear_matches(monkeypatch):
    """Above the hot-set broadcast ceiling the join flips to SALT-ALL
    (no broadcast at all) and must produce the identical census."""
    import pandas as pd

    plain = rel.events_salted_segment_join(SF_DIR, salt=1)

    def boom(_):
        raise AssertionError("broadcast engaged on salt-all gear")

    monkeypatch.setattr(rel, "_ray_put", boom)
    b = rel.events_salted_segment_join(SF_DIR, salt=8,
                                       hot_broadcast_max=0)
    monkeypatch.undo()
    assert rel._LAST_SALT_INFO["salt_all"] is True
    pd.testing.assert_frame_equal(plain, b)


def test_cep_match_semantics(tmp_path):
    """Pins the CEP algebra on a crafted history: greedy c+ consumes the
    whole vccp run, leftmost restart skips the second v in vvcp,
    non-overlapping scan finds both runs in vcpvcp, and a user with no
    complete pattern emits no row.  Order ties on ts resolve by
    event_id."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ai_intel_web_scraper_ray.pipelines import relational as rel

    seqs = {
        1: ["view", "click", "click", "purchase"],        # vccp → 1×4
        2: ["view", "view", "click", "purchase"],         # vvcp → 1×3
        3: ["view", "click", "purchase",
            "view", "click", "purchase"],                 # vcpvcp → 2×6
        4: ["click", "purchase", "view"],                 # no match
    }
    rows = []
    eid = 0
    for uid, types in seqs.items():
        for et in types:
            rows.append((eid, uid, et))
            eid += 1
    ts = pd.Series([pd.Timestamp("2024-01-01")] * len(rows)) \
        .astype("datetime64[us]")     # identical ts → event_id breaks ties
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.Array.from_pandas(ts),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
        "value": pa.array([0.0] * len(rows), pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string())})
    pq.write_table(t, tmp_path / "events.parquet")
    out = rel.events_cep_match(str(tmp_path))
    assert out["user_id"].tolist() == [1, 2, 3]
    assert out["n_matches"].tolist() == [1, 1, 2]
    assert out["matched_events"].tolist() == [4, 3, 6]
    assert out["n_events"].tolist() == [4, 4, 6]
