"""Entry point for `ray job submit` on a real multi-node cluster.

    ray job submit --working-dir . -- python tools/job_entry.py \
        --mode crawl --pages-per-host 50000 --num-shards 64

In a cluster job, ray.init() with no address connects to the running
cluster (RAY_ADDRESS is injected by the job server); frontier shards and
fetch workers spread across nodes via Ray's default scheduling.  This
sandbox is single-node-only, so the same entry runs locally when no
cluster address exists.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["crawl", "process", "bench"], default="crawl")
    p.add_argument("--pages", type=int, default=24000)
    p.add_argument("--num-shards", type=int, default=16)
    p.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    p.add_argument("--out", default="/tmp/job_out")
    args = p.parse_args()

    import ray

    if not ray.is_initialized():
        # on a cluster the job server injects RAY_ADDRESS; locally fall back
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    t0 = time.perf_counter()
    if args.mode == "crawl":
        from ai_intel_web_scraper_ray.pipelines.crawl import (
            crawl_scalable,
            pages_to_table_ref,
        )
        from ai_intel_web_scraper_ray.sources.synthetic import make_bench_web_graph

        pages = make_bench_web_graph(args.pages)
        ref = pages_to_table_ref(pages)
        seeds = sorted({p["url"] for i, p in enumerate(pages) if i % 50 == 0})
        res = crawl_scalable([], seeds, max_depth=10**9, num_shards=args.num_shards,
                             lease_per_shard=4096, pages_table_ref=ref,
                             materialize_records=False,
                             checkpoint_dir=f"{args.out}/ckpt")
        dt = time.perf_counter() - t0
        print(json.dumps({"mode": "crawl", "docs": res["n_records"],
                          "seen": len(res["seen"]), "sec": round(dt, 2),
                          "docs_per_sec": round(res["n_records"] / dt, 1)}))
    elif args.mode == "process":
        from __ray_entry__ import _documents_as_records
        from ai_intel_web_scraper_ray.pipelines.process import process_pipeline

        n = process_pipeline(_documents_as_records(args.sf_dir, num_blocks=32),
                             min_word_count=10).count()
        print(json.dumps({"mode": "process", "rows": n,
                          "sec": round(time.perf_counter() - t0, 2)}))
    else:
        import subprocess

        subprocess.run([sys.executable, "bench.py"], check=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
