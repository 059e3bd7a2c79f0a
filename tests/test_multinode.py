"""REAL multi-node execution via ray.cluster_utils.Cluster: separate
raylets and object stores per node, objects crossing node boundaries —
the closest this sandbox gets to the north rule's fixed-size multi-node
cluster (`bench.py --nodes` measures the same topology's throughput
scaling).

Runs in a SUBPROCESS because the Cluster must own the Ray session (the
shared pytest session fixture is single-node)."""

from __future__ import annotations

import json
import subprocess
import sys

_SCRIPT = r"""
import json
import ray
from ray.cluster_utils import Cluster

cluster = Cluster()
cluster.add_node(num_cpus=2, object_store_memory=300 * 1024 * 1024)
cluster.add_node(num_cpus=2, object_store_memory=300 * 1024 * 1024)
ray.init(address=cluster.address, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False

from ai_intel_web_scraper_ray.pipelines.crawl import crawl_scalable
from ai_intel_web_scraper_ray.sources.synthetic import make_web_graph

pages = make_web_graph(
    hosts=["m0.example", "m1.example", "m2.example"],
    pages_per_host={0: 300, 1: 250, 2: 250})
seeds = [f"https://m{i}.example/p0" for i in range(3)]
res = crawl_scalable(pages, seeds, max_depth=10**9, num_shards=4,
                     lease_per_shard=256)
n_alive = len([n for n in ray.nodes() if n["Alive"]])
print(json.dumps({
    "nodes": n_alive,
    "n_records": res["n_records"],
    "seen": sorted(res["seen"]),
    "urls": sorted(r["url"] for r in res["records"]),
}))
ray.shutdown()
cluster.shutdown()
"""


def test_crawl_on_two_real_nodes():
    """The sharded-frontier crawl on a 2-node cluster (shards and workers
    land on BOTH nodes; links, leases and the page table cross node
    boundaries through plasma) must produce exactly the single-node
    record and seen sets."""
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True, text=True, timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    got = json.loads(proc.stdout.strip().splitlines()[-1])
    assert got["nodes"] == 2

    # single-node ground truth, inside the shared session fixture
    from ai_intel_web_scraper_ray.pipelines.crawl import crawl_scalable
    from ai_intel_web_scraper_ray.sources.synthetic import make_web_graph

    pages = make_web_graph(
        hosts=["m0.example", "m1.example", "m2.example"],
        pages_per_host={0: 300, 1: 250, 2: 250})
    seeds = [f"https://m{i}.example/p0" for i in range(3)]
    ref = crawl_scalable(pages, seeds, max_depth=10**9, num_shards=4,
                         lease_per_shard=256)
    assert got["seen"] == sorted(ref["seen"])
    assert got["urls"] == sorted(r["url"] for r in ref["records"])
    assert got["n_records"] == ref["n_records"]


_SCRIPT_SHUFFLE = r"""
import json
import ray
from ray.cluster_utils import Cluster

cluster = Cluster()
cluster.add_node(num_cpus=2, object_store_memory=400 * 1024 * 1024)
cluster.add_node(num_cpus=2, object_store_memory=400 * 1024 * 1024)
ray.init(address=cluster.address, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False

import sys
sys.path.insert(0, "/root/repo")
from ai_intel_web_scraper_ray.pipelines import docqueries as dq
from ai_intel_web_scraper_ray.pipelines import relational as rel

sf = "/root/testdata/sf0.001"
dedup = dq.docs_minhash_dedup(sf)          # band shuffles + bucket groupbys
q1 = rel.q1_pricing_summary(sf)            # partials + driver merge
print(json.dumps({
    "nodes": len([n for n in ray.nodes() if n["Alive"]]),
    "dedup": dedup.to_dict(orient="list"),
    "q1": {k: [str(x) for x in v]
           for k, v in q1.to_dict(orient="list").items()},
}))
ray.shutdown()
cluster.shutdown()
"""


def test_shuffles_on_two_real_nodes():
    """MinHash dedup (band exchanges, bucket groupbys, the plasma drop
    filter) and TPC-H q1 (per-block partials) across a 2-node cluster
    must equal the single-node results bit-for-bit — the hash-shuffle /
    broadcast machinery is node-topology-independent."""
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT_SHUFFLE],
        capture_output=True, text=True, timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    got = json.loads(proc.stdout.strip().splitlines()[-1])
    assert got["nodes"] == 2

    from ai_intel_web_scraper_ray.pipelines import docqueries as dq
    from ai_intel_web_scraper_ray.pipelines import relational as rel

    sf = "/root/testdata/sf0.001"
    ref_dedup = dq.docs_minhash_dedup(sf).to_dict(orient="list")
    ref_q1 = {k: [str(x) for x in v] for k, v in
              rel.q1_pricing_summary(sf).to_dict(orient="list").items()}
    assert got["dedup"] == ref_dedup
    assert got["q1"] == ref_q1


_SCRIPT_SIMJOIN = r"""
import json
import ray
from ray.cluster_utils import Cluster

cluster = Cluster()
cluster.add_node(num_cpus=2, object_store_memory=400 * 1024 * 1024)
cluster.add_node(num_cpus=2, object_store_memory=400 * 1024 * 1024)
ray.init(address=cluster.address, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False

import sys
sys.path.insert(0, "/root/repo")
from ai_intel_web_scraper_ray.pipelines import relational as rel

sf = "/root/testdata/sf0.001"
sj = rel.orders_basket_simjoin(sf)   # prefix filter + co-partitioned bucket join
print(json.dumps({
    "nodes": len([n for n in ray.nodes() if n["Alive"]]),
    "sj": sj.to_dict(orient="list"),
}))
ray.shutdown()
cluster.shutdown()
"""


def test_simjoin_bucket_join_on_two_real_nodes():
    """The similarity self-join's union + bucketed-groupby co-partition
    join (round-4 replacement for the hash-shuffle Dataset.join) across
    a real 2-node cluster must equal the single-node result bit-for-bit
    — probe and basket rows for the same okey bucket land on one node
    regardless of where their source blocks lived."""
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT_SIMJOIN],
        capture_output=True, text=True, timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    got = json.loads(proc.stdout.strip().splitlines()[-1])
    assert got["nodes"] == 2

    from ai_intel_web_scraper_ray.pipelines import relational as rel

    ref = rel.orders_basket_simjoin("/root/testdata/sf0.001") \
        .to_dict(orient="list")
    assert got["sj"] == ref
