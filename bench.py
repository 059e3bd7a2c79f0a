"""Benchmark harness.

Runs the headline pipelines over $GRAFT_SF_DIR (default /root/testdata/sf0.1)
with ray.init(address="local", num_cpus=$RAY_GRAFT_CPUS or 32) and prints ONE
JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
   "crawl_urls_per_sec": ..., "crawl_docs_per_sec": ...}

`--scaling` runs the same bench twice in fresh processes (num_cpus=8 then 32)
on the same input and prints throughput at both plus the scaling efficiency —
the sandbox surrogate for the north rule's N→4N-node criterion (BASELINE.md).

Headline pieces:
- crawl: scalable sharded-frontier fetch+extract over the synthetic web
  graph (politeness off ⇒ throughput-bound) — URLs/s and docs/s
- process: clean → tag → quality-filter → dedup over documents
- vectorize: chunk → embed over documents
- relational/search: TPC-H Q1 shape, tumbling windows, brute-force kNN,
  MinHash near-dup
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time



def _cpu_baseline(num_cpus: int) -> float:
    """Same-process pure-Python busy-loop throughput (Miter/s) — the
    machine's own CPU-scaling ceiling, shared by the headline bench and
    --scaling so both normalize against the identical baseline."""
    import ray

    @ray.remote
    def _burn(n: int) -> int:
        s = 0
        for i in range(n):
            s += i * i
        return s

    k = max(2, num_cpus - 2)
    n_iter = 3_000_000
    t0 = time.perf_counter()
    ray.get([_burn.remote(n_iter) for _ in range(k * 3)])
    return round(k * 3 * n_iter / (time.perf_counter() - t0) / 1e6, 1)


def _saturated_crawl(num_cpus: int, pages_table_ref, seeds) -> dict:
    """The north-rule scaling quantity: one saturated-frontier scan with
    the config BOTH the headline bench and --scaling measure."""
    from ai_intel_web_scraper_ray.pipelines.crawl import crawl_scalable

    t0 = time.perf_counter()
    sat = crawl_scalable(
        [], seeds, max_depth=0,
        num_shards=min(8, max(4, num_cpus // 4)), lease_per_shard=4096,
        pages_table_ref=pages_table_ref, materialize_records=False,
        collect_seen=False,
    )
    sec = time.perf_counter() - t0
    return {"n_records": sat["n_records"], "sec": sec,
            "docs_per_sec": round(sat["n_records"] / sec, 1),
            "sustained": sat["sustained_docs_per_sec"]}



def _frontier_microbench(n_urls: int = 200_000, heap_mem_cap: int = 20_000) -> dict:
    """Single-shard frontier stress (no Ray): offer n_urls across ~1k hosts
    through the seen-set (cuckoo + amortized growth) into a spilling heap,
    then drain every lease.  Evidences the 10^10-URL design per round:
    bounded in-memory heap (disk segments), bounded filter load (2x
    rebuilds), bloom untouched on a clean stream.  URL strings are built
    outside the timed windows."""
    import shutil
    import tempfile

    from ai_intel_web_scraper_ray.state import frontier as _fr

    Shard = _fr.FrontierShardImpl
    spill = tempfile.mkdtemp(prefix="bench_frontier_")
    sh = Shard(0, 1, heap_mem_cap=heap_mem_cap, spill_dir=spill)
    urls = [(f"https://h{i % 997}.example.com/p{i}", i % 7)
            for i in range(n_urls)]
    t0 = time.perf_counter()
    for s in range(0, n_urls, 10_000):
        sh.offer(urls[s:s + 10_000])
    offer_sec = time.perf_counter() - t0
    t0 = time.perf_counter()
    drained = 0
    while True:
        leases = sh.take(8192, now=0.0)
        if not leases:
            break
        drained += len(leases)
    drain_sec = time.perf_counter() - t0
    shutil.rmtree(spill, ignore_errors=True)
    f = sh.seen.filter
    return {
        "frontier_urls": n_urls,
        "frontier_offer_urls_per_sec": round(n_urls / offer_sec, 1),
        "frontier_drain_urls_per_sec": round(drained / drain_sec, 1),
        "frontier_heap_spills": sh.heap.spill_events,
        "frontier_filter_rebuilds": sh.seen.filter_rebuilds,
        "frontier_filter_load_pct": round(100 * f.count / (f.nbuckets * 4), 1),
    }


def run_bench(sf_dir: str, num_cpus: int) -> dict:
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from __ray_entry__ import _documents_as_records
    from ai_intel_web_scraper_ray.pipelines import docqueries as dq
    from ai_intel_web_scraper_ray.pipelines import relational as rel
    from ai_intel_web_scraper_ray.pipelines.crawl import crawl_scalable
    from ai_intel_web_scraper_ray.pipelines.process import process_pipeline
    from ai_intel_web_scraper_ray.pipelines.vectorize import vectorize_pipeline
    from ai_intel_web_scraper_ray.sources.synthetic import make_bench_web_graph

    # warm the OS page cache so we measure compute + shuffle, not first read
    import ray.data as rd

    for tbl in ("lineitem", "documents", "embeddings", "events", "orders"):
        rd.read_parquet(f"{sf_dir}/{tbl}.parquet").count()

    timings: dict = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        timings[name] = round(time.perf_counter() - t0, 3)
        return out

    # -- crawl throughput --------------------------------------------------
    # (the machine CPU-scaling baseline runs at the END of the bench: the
    # all-core busy loop depletes the VM's CPU burst budget and measurably
    # throttles whatever runs NEXT — 15-35% off the saturated crawl when
    # the burn preceded it, and asymmetrically worse at 32 CPUs than 8,
    # which suppressed every pre-fix scaling ratio)
    n_pages = int(os.environ.get("GRAFT_CRAWL_PAGES", "24000"))
    pages = make_bench_web_graph(n_pages)
    import ray as _ray

    from ai_intel_web_scraper_ray.pipelines.crawl import pages_to_table_ref

    pages_table_ref = pages_to_table_ref(pages)
    # wide seed list (the north-rule scenario is a 10^10-URL frontier that
    # is never starved, not a 9-seed BFS ramp): every 50th page + roots
    seeds = sorted({f"https://{p['host']}/p0" for p in pages}
                   | {p["url"] for i, p in enumerate(pages) if i % 50 == 0})
    t0 = time.perf_counter()
    res = crawl_scalable(
        [], seeds, max_depth=10**9, num_shards=min(8, max(4, num_cpus // 4)),
        lease_per_shard=4096, pages_table_ref=pages_table_ref,
        materialize_records=False,
    )
    crawl_sec = time.perf_counter() - t0
    timings["crawl"] = round(crawl_sec, 3)
    n_crawled = res["n_records"]
    n_seen = len(res["seen"])
    crawl_urls_per_sec = round(n_seen / crawl_sec, 1)
    crawl_docs_per_sec = round(n_crawled / crawl_sec, 1)

    # -- ordered crawl (reference order at throughput) ---------------------
    # windowed ordered replay from one seed: crawl ORDER is bit-equal to the
    # sequential reference (pinned by tests/test_crawl_streaming.py) while
    # fetches overlap — the conformance-without-the-round-barrier mode
    from ai_intel_web_scraper_ray.pipelines.crawl import crawl_ordered

    t0 = time.perf_counter()
    ores = crawl_ordered(
        [], pages[0]["url"], max_depth=10**7, max_pages=10**9,
        num_shards=min(8, max(4, num_cpus // 4)), window=4096, chunk_size=64,
        pages_ref=pages_table_ref,
    )
    ordered_sec = time.perf_counter() - t0
    timings["crawl_ordered"] = round(ordered_sec, 3)
    ordered_docs_per_sec = round(len(ores["records"]) / ordered_sec, 1)

    # -- saturated-frontier crawl (the north-rule scaling metric) ----------
    # The metric is SUSTAINED fetch+extract throughput on a 10^10-URL
    # frontier — such a frontier never starves.  The BFS crawl above mixes
    # discovery-ramp latency (waves of ~3 links/page) into the number; here
    # every URL is seeded up front, measuring the steady state the rule
    # describes.  Scaling efficiency is computed on THIS number.
    sat = _saturated_crawl(num_cpus, pages_table_ref,
                           [p["url"] for p in pages])
    timings["crawl_saturated"] = round(sat["sec"], 3)
    sat_docs_per_sec = sat["docs_per_sec"]

    # -- politeness-bound crawl (virtual clock) ---------------------------
    # small graph, per-host min-delay on: verifies the token-bucket floor
    # (virtual time ≥ (pages_on_hottest_host - 1) × delay) while wall time
    # stays parallel — the politeness-vs-throughput split the reference
    # cannot make (it sleeps for real, RUNBOOK.md:480)
    polite_pages = make_bench_web_graph(2000)
    t0 = time.perf_counter()
    polite = crawl_scalable(
        polite_pages, sorted({f"https://{p['host']}/p0" for p in polite_pages}),
        max_depth=10**9, num_shards=4, lease_per_shard=512, min_delay=0.05,
        materialize_records=False,
    )
    polite_wall = round(time.perf_counter() - t0, 3)
    timings["crawl_polite"] = polite_wall

    # -- process + vectorize ----------------------------------------------
    timed("process", lambda: process_pipeline(
        _documents_as_records(sf_dir, num_blocks=max(8, num_cpus // 4)), min_word_count=10,
        tagger_concurrency=max(2, num_cpus // 4),
        tagger_batch_size=512).count())
    timed("vectorize", lambda: vectorize_pipeline(
        _documents_as_records(sf_dir, num_blocks=max(8, num_cpus // 4)),
        chunk_concurrency=max(2, num_cpus // 4),
        embed_concurrency=max(2, num_cpus // 4)).count())

    # -- relational / search ----------------------------------------------
    timed("q1_pricing_summary", lambda: rel.q1_pricing_summary(sf_dir))
    timed("events_tumbling", lambda: rel.events_tumbling(sf_dir))
    timed("events_sessions", lambda: rel.events_sessions(sf_dir))
    timed("events_asof_click", lambda: rel.events_asof_click(sf_dir))
    timed("events_value_range_join", lambda: rel.events_value_range_join(sf_dir))
    timed("emb_knn", lambda: dq.emb_knn(sf_dir))
    timed("docs_minhash_dedup", lambda: dq.docs_minhash_dedup(sf_dir))
    # -- new in round 3 (totals are NOT comparable to r2 headline) --------
    timed("events_late_window_agg", lambda: rel.events_late_window_agg(sf_dir))
    timed("events_cdc_state", lambda: rel.events_cdc_state(sf_dir))
    timed("events_value_percentiles",
          lambda: rel.events_value_percentiles(sf_dir))
    timed("events_salted_segment_join",
          lambda: rel.events_salted_segment_join(sf_dir))

    # -- machine CPU-scaling baseline, AFTER every measured window (the
    # burn throttles what follows it; see the note at the top) ------------
    cpu_baseline = _cpu_baseline(num_cpus)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_pipeline_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "crawl_pages": n_crawled,
        "crawl_seen_urls": n_seen,
        "crawl_urls_per_sec": crawl_urls_per_sec,
        "crawl_docs_per_sec": crawl_docs_per_sec,
        "crawl_polite_pages": polite["n_records"],
        "crawl_polite_virtual_sec": round(polite["virtual_time"], 2),
        "crawl_polite_wall_sec": polite_wall,
        "crawl_ordered_pages": len(ores["records"]),
        "crawl_ordered_docs_per_sec": ordered_docs_per_sec,
        "crawl_saturated_pages": sat["n_records"],
        "crawl_saturated_docs_per_sec": sat_docs_per_sec,
        "cpu_baseline_miter_per_sec": cpu_baseline,
    }
    out.update(_frontier_microbench())
    ray.shutdown()
    return out


def run_sat_bench(num_cpus: int) -> dict:
    """Saturated-frontier crawl ONLY (the north-rule scaling quantity), on
    a 3× graph so the fixed costs a long-running frontier amortizes (actor
    pool spawn ~1 s, seed offering) stay under ~5% of the window at 32
    CPUs.  --scaling uses THIS per level: it repeats faster (less ambient
    exposure per pair) and measures the steady state, not the ramp."""
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from ai_intel_web_scraper_ray.pipelines.crawl import pages_to_table_ref
    from ai_intel_web_scraper_ray.sources.synthetic import make_bench_web_graph

    n_pages = int(os.environ.get("GRAFT_SAT_PAGES", "72000"))
    pages = make_bench_web_graph(n_pages)
    pages_table_ref = pages_to_table_ref(pages)
    sat = _saturated_crawl(num_cpus, pages_table_ref,
                           [p["url"] for p in pages])
    # baseline AFTER the measured window (see run_bench: the burn
    # throttles what follows it, not what preceded it)
    cpu_baseline = _cpu_baseline(num_cpus)
    out = {
        "metric": "saturated_crawl",
        "num_cpus": num_cpus,
        "crawl_saturated_pages": sat["n_records"],
        "crawl_saturated_sec": round(sat["sec"], 3),
        "crawl_saturated_docs_per_sec": sat["docs_per_sec"],
        "crawl_sustained_docs_per_sec": sat["sustained"],
        "cpu_baseline_miter_per_sec": cpu_baseline,
    }
    ray.shutdown()
    return out


def _nodes_big_sf(src: str, factors=None) -> str:
    """Key-shifted replication of the sf tables into /tmp for the
    multi-node shuffle bench: each fact table gets ``factors[table]``
    copies with its primary key shifted per copy (shift 2e8 — above
    every sf0.1 key; factor x shift reaches ~5e10, so the invariant is
    that the key columns are int64 — asserted below — NOT that the
    shift fits int32); dimension tables copy 1:1.  Each copy
    is its own parquet file inside a ``{table}.parquet/`` directory, so
    readers see factor x blocks.  Built once, reused by both cluster
    legs (identical files -> identical work).  Factors are sized so each
    1-node stage runs tens of seconds — the point is measuring the
    cluster, and a seconds-long stage only measures fixed overhead."""
    import shutil

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    factors = factors or {"lineitem": 64, "orders": 64, "events": 1,
                          "documents": 256}
    base = os.path.basename(os.path.normpath(src))
    tag = "_".join(f"{k[0]}{v}" for k, v in sorted(factors.items()))
    out = f"/tmp/graft_nodes_{base}_{tag}"
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)
    shift_by = {"lineitem": ("l_orderkey",), "orders": ("o_orderkey",),
                "events": ("event_id",), "documents": ("doc_id",)}
    SHIFT = 200_000_000
    for tbl, cols in shift_by.items():
        t = pq.read_table(f"{src}/{tbl}.parquet")
        tdir = os.path.join(out, tbl + ".parquet")
        os.makedirs(tdir, exist_ok=True)
        for c in range(factors.get(tbl, 1)):
            tc = t
            for col in cols:
                idx = tc.schema.get_field_index(col)
                assert tc.schema.field(col).type == pa.int64(), (
                    f"{tbl}.{col} must be int64: factor x SHIFT exceeds "
                    f"int32 range, got {tc.schema.field(col).type}")
                arr = pc.add(tc[col], pa.scalar(
                    c * SHIFT, tc.schema.field(col).type))
                tc = tc.set_column(idx, col, arr)
            if tbl == "documents" and c > 0:
                # deterministic per-copy word permutation: texts keep
                # their token statistics but stop being near-duplicates
                # of the other copies — otherwise factor x identical
                # texts form factor-cliques in every MinHash band and
                # push the dedup stage into its >2M-edge distributed
                # label-propagation branch, which is not the stage this
                # bench measures
                import numpy as _np

                rng = _np.random.RandomState(1000 + c)
                texts = tc["text"].to_pylist()
                perm = []
                for tx in texts:
                    w = (tx or "").split()
                    rng.shuffle(w)
                    perm.append(" ".join(w))
                ti = tc.schema.get_field_index("text")
                tc = tc.set_column(ti, "text", pa.array(perm, pa.string()))
            pq.write_table(tc, os.path.join(tdir, f"part{c}.parquet"))
    for tbl in ("customer", "supplier", "part", "nation", "region",
                "embeddings"):
        f = f"{src}/{tbl}.parquet"
        if os.path.exists(f):
            shutil.copy(f, os.path.join(out, f"{tbl}.parquet"))
    with open(done, "w") as fh:
        fh.write("ok")
    return out


def run_sat_bench_nodes(n_nodes: int, cpus_per_node: int = 8) -> dict:
    """Saturated-frontier crawl on a REAL local multi-node cluster
    (ray.cluster_utils.Cluster: one raylet + object store per node, page
    table / leases / links crossing node boundaries through plasma) —
    the sandbox's closest realization of the north rule's N-vs-4N-NODES
    criterion.  `--nodes` compares 1 node vs 4 nodes at the same CPUs
    per node in fresh processes."""
    import ray
    from ray.cluster_utils import Cluster

    cluster = Cluster()
    store = 2 * 1024 * 1024 * 1024
    for _ in range(n_nodes):
        cluster.add_node(num_cpus=cpus_per_node, object_store_memory=store)
    ray.init(address=cluster.address, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from ai_intel_web_scraper_ray.pipelines.crawl import pages_to_table_ref
    from ai_intel_web_scraper_ray.sources.synthetic import make_bench_web_graph

    n_pages = int(os.environ.get("GRAFT_SAT_PAGES", "72000"))
    pages = make_bench_web_graph(n_pages)
    pages_table_ref = pages_to_table_ref(pages)
    total_cpus = n_nodes * cpus_per_node
    # in-window ceiling control (verdict r4 #3): the busy-loop baseline is
    # captured BEFORE and AFTER the measured stages, inside this leg's
    # process — the pair's ceiling-normalized efficiencies derive from
    # these, never from a separate post-hoc run
    cpu_baseline_pre = _cpu_baseline(total_cpus)
    sat = _saturated_crawl(total_cpus, pages_table_ref,
                           [p["url"] for p in pages])

    # shuffle-heavy stage families on the same multi-node cluster (verdict
    # r3 #4): the crawl exercises actor messaging; these exercise what
    # multi-node actually taxes — all-to-all block exchange through
    # cross-node plasma.  process = map chain + three projection-shuffle
    # dedups; q3 = filtered semi-join + groupby; salted join = skew-split
    # fact⋈dim.  sf0.1 alone is seconds of work — far too small to
    # amortize a 4-node cluster (the 4-node leg measures LONGER on fixed
    # overhead + transfer) — so the nodes bench runs them over an
    # 8x-replicated key-shifted staging of the sf tables (built once,
    # shared by both legs: same files, same work, only the cluster size
    # varies).
    from __ray_entry__ import _documents_as_records
    from ai_intel_web_scraper_ray.pipelines import relational as rel
    from ai_intel_web_scraper_ray.pipelines.process import process_pipeline

    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    big_sf = _nodes_big_sf(sf_dir)
    from ai_intel_web_scraper_ray.pipelines import docqueries as dq

    t0 = time.perf_counter()
    process_pipeline(
        _documents_as_records(big_sf, num_blocks=max(16, total_cpus)),
        min_word_count=10, tagger_concurrency=max(2, total_cpus // 2),
        tagger_batch_size=512).count()
    process_sec = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    rel.q3_top_orders(big_sf)
    q3_sec = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    dq.docs_minhash_dedup(big_sf)
    minhash_sec = round(time.perf_counter() - t0, 3)

    cpu_baseline = _cpu_baseline(total_cpus)
    n_alive = len([n for n in ray.nodes() if n["Alive"]])
    out = {
        "metric": "saturated_crawl_nodes",
        "n_nodes": n_alive,
        "cpus_per_node": cpus_per_node,
        "crawl_saturated_pages": sat["n_records"],
        "crawl_saturated_sec": round(sat["sec"], 3),
        "crawl_saturated_docs_per_sec": sat["docs_per_sec"],
        "crawl_sustained_docs_per_sec": sat["sustained"],
        "process_sec": process_sec,
        "q3_sec": q3_sec,
        "minhash_sec": minhash_sec,
        "cpu_baseline_miter_per_sec": cpu_baseline,
        "cpu_baseline_pre": cpu_baseline_pre,
        "cpu_baseline_mid": round((cpu_baseline_pre + cpu_baseline) / 2, 1),
    }
    ray.shutdown()
    cluster.shutdown()
    return out


def run_subprocess(ncpu: int, sat_only: bool = False) -> dict:
    env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
    if sat_only:
        env["GRAFT_SAT_ONLY"] = "1"
    proc = subprocess.run([sys.executable, os.path.abspath(__file__)], env=env,
                          capture_output=True, text=True, check=True)
    return json.loads(proc.stdout.strip().splitlines()[-1])


def run_subprocess_nodes(n_nodes: int) -> dict:
    env = dict(os.environ, GRAFT_SAT_NODES=str(n_nodes))
    proc = subprocess.run([sys.executable, os.path.abspath(__file__)], env=env,
                          capture_output=True, text=True, check=True)
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main():
    if "--nodes" in sys.argv:
        # N-vs-4N NODES on a real local multi-node cluster (fresh process
        # per level; the 4-node run uses 4x the physical CPUs, so this is
        # the same core ratio as --scaling but THROUGH genuine multi-node
        # machinery: per-node raylets, cross-node plasma transfer).
        lo_n, hi_n = 1, 4
        repeats = int(os.environ.get("GRAFT_SCALING_REPEATS", "3"))
        runs = []
        for _ in range(repeats):
            r_lo = run_subprocess_nodes(lo_n)
            r_hi = run_subprocess_nodes(hi_n)
            ratio = r_hi["crawl_saturated_docs_per_sec"] / max(
                r_lo["crawl_saturated_docs_per_sec"], 1e-9)
            sus_lo = r_lo.get("crawl_sustained_docs_per_sec") or                 r_lo["crawl_saturated_docs_per_sec"]
            sus_hi = r_hi.get("crawl_sustained_docs_per_sec") or                 r_hi["crawl_saturated_docs_per_sec"]
            run = {
                "docs_per_sec_1node": r_lo["crawl_saturated_docs_per_sec"],
                "docs_per_sec_4node": r_hi["crawl_saturated_docs_per_sec"],
                "sustained_1node": sus_lo,
                "sustained_4node": sus_hi,
                "cpu_baseline_lo": r_lo["cpu_baseline_miter_per_sec"],
                "cpu_baseline_hi": r_hi["cpu_baseline_miter_per_sec"],
                "raw_node_efficiency": round(ratio / (hi_n / lo_n), 3),
                "sustained_node_efficiency": round(
                    (sus_hi / max(sus_lo, 1e-9)) / (hi_n / lo_n), 3),
            }
            # in-window CPU ceiling for THIS pair: how much compute the
            # machine actually delivered at 4x CPUs during these legs
            # (mean of each leg's pre/post busy-loop baselines).  1.0 =
            # the hardware scaled perfectly; on one oversubscribed VM it
            # routinely reads 0.6-0.9, and no Ray code can scale past it.
            base_lo = r_lo.get("cpu_baseline_mid",
                               r_lo["cpu_baseline_miter_per_sec"])
            base_hi = r_hi.get("cpu_baseline_mid",
                               r_hi["cpu_baseline_miter_per_sec"])
            ceiling = (base_hi / max(base_lo, 1e-9)) / (hi_n / lo_n)
            run["cpu_ceiling"] = round(ceiling, 3)
            run["raw_norm_efficiency"] = round(
                run["raw_node_efficiency"] / min(1.0, max(ceiling, 1e-9)), 3)
            # shuffle-stage node efficiencies: wall-time ratio over the
            # node ratio (1.0 = perfect 4x speedup on 4x nodes), raw and
            # normalized by the pair's own in-window ceiling
            for key in ("process_sec", "q3_sec", "minhash_sec"):
                if key in r_lo and key in r_hi:
                    run[key + "_1node"] = r_lo[key]
                    run[key + "_4node"] = r_hi[key]
                    eff = (r_lo[key] / max(r_hi[key], 1e-9)) / (hi_n / lo_n)
                    run[key.replace("_sec", "_node_efficiency")] = round(eff, 3)
                    run[key.replace("_sec", "_norm_efficiency")] = round(
                        eff / min(1.0, max(ceiling, 1e-9)), 3)
            runs.append(run)

        def median(xs):
            xs = sorted(xs)
            n = len(xs)
            return xs[n // 2] if n % 2 else round(
                (xs[n // 2 - 1] + xs[n // 2]) / 2, 3)

        print(json.dumps({
            "metric": "node_scaling_efficiency",
            "n_nodes_lo": lo_n, "n_nodes_hi": hi_n,
            "cpus_per_node": 8,
            "repeats": repeats,
            "runs": runs,
            "median_raw_node_efficiency": median(
                [r["raw_node_efficiency"] for r in runs]),
            "median_sustained_node_efficiency": median(
                [r["sustained_node_efficiency"] for r in runs]),
            "median_cpu_ceiling": median([r["cpu_ceiling"] for r in runs]),
            **{f"median_{k}": median([r[k] for r in runs])
               for k in ("process_node_efficiency", "q3_node_efficiency",
                         "minhash_node_efficiency", "raw_norm_efficiency",
                         "process_norm_efficiency", "q3_norm_efficiency",
                         "minhash_norm_efficiency")
               if all(k in r for r in runs)},
        }))
        return
    if "--scaling" in sys.argv:
        # Repeats are BAKED IN (VERDICT r1 #9): run lo/hi interleaved N
        # times (default 3, $GRAFT_SCALING_REPEATS) so ambient-load skew on
        # a shared host can't make one lucky pair the headline; report every
        # per-pair efficiency plus the medians (raw and machine-normalized).
        lo, hi = 8, 32
        repeats = int(os.environ.get("GRAFT_SCALING_REPEATS", "3"))
        runs = []
        for _ in range(repeats):
            # Saturated-frontier crawl ONLY per level (the north rule's
            # quantity is SUSTAINED fetch+extract throughput on a frontier
            # that never starves): a 3× graph amortizes the fixed actor-pool
            # spawn that a real long-running crawl never re-pays, and the
            # short window cuts ambient-skew exposure per pair.  The BFS-
            # ramp crawl number lives in the headline bench (crawl_docs_
            # per_sec); its efficiency history is in BENCH/BASELINE.md.
            r_lo = run_subprocess(lo, sat_only=True)
            r_hi = run_subprocess(hi, sat_only=True)
            sat_ratio = r_hi["crawl_saturated_docs_per_sec"] / max(
                r_lo["crawl_saturated_docs_per_sec"], 1e-9)
            sus_lo = r_lo.get("crawl_sustained_docs_per_sec") or \
                r_lo["crawl_saturated_docs_per_sec"]
            sus_hi = r_hi.get("crawl_sustained_docs_per_sec") or \
                r_hi["crawl_saturated_docs_per_sec"]
            sus_ratio = sus_hi / max(sus_lo, 1e-9)
            base_ratio = r_hi["cpu_baseline_miter_per_sec"] / max(r_lo["cpu_baseline_miter_per_sec"], 1e-9)
            runs.append({
                "sec_lo": r_lo["crawl_saturated_sec"],
                "sec_hi": r_hi["crawl_saturated_sec"],
                "crawl_saturated_docs_per_sec_lo": r_lo["crawl_saturated_docs_per_sec"],
                "crawl_saturated_docs_per_sec_hi": r_hi["crawl_saturated_docs_per_sec"],
                "crawl_sustained_docs_per_sec_lo": sus_lo,
                "crawl_sustained_docs_per_sec_hi": sus_hi,
                "cpu_baseline_lo": r_lo["cpu_baseline_miter_per_sec"],
                "cpu_baseline_hi": r_hi["cpu_baseline_miter_per_sec"],
                "raw_efficiency": round(sat_ratio / (hi / lo), 3),
                "sustained_efficiency": round(sus_ratio / (hi / lo), 3),
                "machine_cpu_scaling_efficiency": round(base_ratio / (hi / lo), 3),
                "normalized_efficiency": round(sat_ratio / max(base_ratio, 1e-9), 3),
            })

        def median(xs):
            xs = sorted(xs)
            n = len(xs)
            return xs[n // 2] if n % 2 else round((xs[n // 2 - 1] + xs[n // 2]) / 2, 3)

        print(json.dumps({
            "metric": "scaling_efficiency",
            "num_cpus_lo": lo, "num_cpus_hi": hi,
            "repeats": repeats,
            "runs": runs,
            "median_raw_efficiency": median([r["raw_efficiency"] for r in runs]),
            "median_sustained_efficiency": median(
                [r["sustained_efficiency"] for r in runs]),
            "median_normalized_efficiency": median([r["normalized_efficiency"] for r in runs]),
            "median_machine_cpu_efficiency": median(
                [r["machine_cpu_scaling_efficiency"] for r in runs]),
            # the baseline burn runs AFTER each measured window (running it
            # BEFORE throttled the crawl itself — the all-core busy loop
            # depletes the VM's CPU burst budget, 15-35% off the very
            # quantity being measured, worse at 32 CPUs than 8).  A post-
            # window baseline reads the residual-throttle state, so the
            # normalized/machine columns are diagnostics only now; the
            # headline criterion is median_raw_efficiency (clean windows).
            "normalization_caveat": "cpu_baseline measured post-window; "
                "raw/sustained are the headline numbers",
        }))
        return
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if os.environ.get("GRAFT_SAT_NODES"):
        print(json.dumps(run_sat_bench_nodes(
            int(os.environ["GRAFT_SAT_NODES"]))))
        return
    if os.environ.get("GRAFT_SAT_ONLY"):
        print(json.dumps(run_sat_bench(num_cpus)))
        return
    print(json.dumps(run_bench(sf_dir, num_cpus)))


if __name__ == "__main__":
    main()
