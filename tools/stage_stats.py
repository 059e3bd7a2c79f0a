"""Dump per-stage Ray Data execution stats for the headline pipelines —
the `ds.stats()` feedback loop used to drive the optimization passes
(see BENCH/BASELINE.md).  Usage:

    python tools/stage_stats.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from __ray_entry__ import _documents_as_records
    from ai_intel_web_scraper_ray.pipelines.process import process_pipeline
    from ai_intel_web_scraper_ray.pipelines.vectorize import vectorize_pipeline

    print("=== process pipeline ===")
    ds = process_pipeline(_documents_as_records(sf_dir, num_blocks=8),
                          min_word_count=10, tagger_concurrency=2)
    ds.count()
    print(ds.stats())

    print("\n=== vectorize pipeline ===")
    ds = vectorize_pipeline(_documents_as_records(sf_dir, num_blocks=8),
                            chunk_concurrency=2, embed_concurrency=2)
    ds.count()
    print(ds.stats())
    ray.shutdown()


if __name__ == "__main__":
    main()
