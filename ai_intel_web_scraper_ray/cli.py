"""CLI mirroring the reference's pipeline commands
(reference: competitive-intel/pipeline.py: scrape / process / vectorize /
generate / status / export) over parquet stage directories.

    python -m ai_intel_web_scraper_ray.cli crawl   --config cfg.json --out data/raw
    python -m ai_intel_web_scraper_ray.cli process --in data/raw --out data/processed
    python -m ai_intel_web_scraper_ray.cli vectorize --in data/processed --out data/chunks
    python -m ai_intel_web_scraper_ray.cli generate --in data/processed --primary kx --out data/entries
    python -m ai_intel_web_scraper_ray.cli status --dir data
    python -m ai_intel_web_scraper_ray.cli export --in data/entries --out battlecard.md

The CLI owns its Ray session (guarded init); library code never does.
``crawl`` here runs against a synthetic web graph config (no network in
this environment); a real fetcher slots into the crawl worker unchanged.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _ray_init():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def cmd_crawl(args):
    _ray_init()
    import pyarrow.parquet as pq

    from .pipelines.crawl import crawl_strict
    from .pipelines.full import crawl_records_to_source_table
    from .sources.interleaved import crawl_records_to_interleaved
    from .sources.synthetic import make_web_graph

    with open(args.config) as f:
        cfg = json.load(f)
    pages = make_web_graph(seed=cfg.get("seed", 42))
    res = crawl_strict(
        pages,
        cfg["base_url"],
        cfg.get("content_selector", "article"),
        cfg.get("max_depth", 3),
        cfg.get("max_pages", 200),
        cfg.get("exclude_patterns", []),
        checkpoint_dir=os.path.join(args.out, "_ckpt"),
        checkpoint_every_rounds=1,
        resume=args.resume,
    )
    os.makedirs(args.out, exist_ok=True)
    pq.write_table(crawl_records_to_source_table(res["records"]),
                   os.path.join(args.out, "records.parquet"))
    pq.write_table(crawl_records_to_interleaved(res["records"]),
                   os.path.join(args.out, "interleaved.parquet"))
    print(f"crawled {len(res['records'])} pages, seen {len(res['seen'])} urls -> {args.out}")


def cmd_process(args):
    _ray_init()
    from .pipelines.process import process_pipeline
    from .sources.readers import read_source_records

    ds = read_source_records(args.input)
    ds = process_pipeline(ds, min_word_count=args.min_words)
    ds.write_parquet(args.out)
    print(f"processed -> {args.out}")


def cmd_vectorize(args):
    _ray_init()
    from .pipelines.vectorize import vectorize_pipeline
    from .sources.readers import read_source_records

    ds = read_source_records(args.input)
    out = vectorize_pipeline(ds, chunk_tokens=args.chunk_tokens,
                             overlap_tokens=args.overlap_tokens)
    out.write_parquet(args.out)
    print(f"vectorized -> {args.out}")


def cmd_generate(args):
    _ray_init()
    from .pipelines.generate import generate_comparisons
    from .sources.readers import read_source_records

    ds = read_source_records(args.input)
    entries = generate_comparisons(ds, args.primary, args.out)
    print(f"generated {len(entries)} topic entries -> {args.out}")


def cmd_status(args):
    _ray_init()
    import glob

    import ray.data as rd

    for sub in sorted(glob.glob(os.path.join(args.dir, "*"))):
        files = glob.glob(os.path.join(sub, "**", "*.parquet"), recursive=True)
        if not files:
            continue
        n = rd.read_parquet(files).count()
        print(f"{os.path.basename(sub)}: {n} rows in {len(files)} files")


def cmd_export(args):
    from .pipelines.generate import export_markdown

    with open(os.path.join(args.input, "combined.json")) as f:
        entries = json.load(f)
    export_markdown(entries, args.out)
    print(f"exported {len(entries)} entries -> {args.out}")


def main(argv=None):
    p = argparse.ArgumentParser(prog="ai_intel_web_scraper_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("crawl")
    c.add_argument("--config", required=True)
    c.add_argument("--out", required=True)
    c.add_argument("--resume", action="store_true")
    c.set_defaults(fn=cmd_crawl)

    c = sub.add_parser("process")
    c.add_argument("--in", dest="input", required=True)
    c.add_argument("--out", required=True)
    c.add_argument("--min-words", type=int, default=100)
    c.set_defaults(fn=cmd_process)

    c = sub.add_parser("vectorize")
    c.add_argument("--in", dest="input", required=True)
    c.add_argument("--out", required=True)
    c.add_argument("--chunk-tokens", type=int, default=400)
    c.add_argument("--overlap-tokens", type=int, default=60)
    c.set_defaults(fn=cmd_vectorize)

    c = sub.add_parser("generate")
    c.add_argument("--in", dest="input", required=True)
    c.add_argument("--primary", required=True)
    c.add_argument("--out", required=True)
    c.set_defaults(fn=cmd_generate)

    c = sub.add_parser("status")
    c.add_argument("--dir", required=True)
    c.set_defaults(fn=cmd_status)

    c = sub.add_parser("export")
    c.add_argument("--in", dest="input", required=True)
    c.add_argument("--out", required=True)
    c.set_defaults(fn=cmd_export)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
