"""CLI mirroring the reference's pipeline commands
(reference: competitive-intel/pipeline.py: scrape / process / vectorize /
generate / status / export) over parquet stage directories.

    python -m ai_intel_web_scraper_ray.cli crawl   --config cfg.json --out data/raw
    python -m ai_intel_web_scraper_ray.cli process --in data/raw --out data/processed
    python -m ai_intel_web_scraper_ray.cli vectorize --in data/processed --out data/chunks
    python -m ai_intel_web_scraper_ray.cli generate --in data/processed --primary kx --out data/entries
    python -m ai_intel_web_scraper_ray.cli status --dir data
    python -m ai_intel_web_scraper_ray.cli export --in data/entries --out battlecard.md
    python -m ai_intel_web_scraper_ray.cli vector-status --in data/chunks
    python -m ai_intel_web_scraper_ray.cli vector-query "fast scans" --in data/chunks --top-k 5

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
    import os

    import ray

    if not ray.is_initialized():
        # under `ray job submit` the runtime presets RAY_ADDRESS to the
        # cluster address — attach to it; standalone runs default local
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def _embed_dim(ds) -> int:
    """Embedding dimension of a chunk store: fixed_size_list carries
    list_size; a variable-size list column (e.g. parquet written by an
    older/external tool) doesn't — fall back to the first row's length
    with a clear error instead of an AttributeError (advisor r4)."""
    sch = ds.schema()
    emb_type = sch.types[sch.names.index("embedding")]
    dim = getattr(emb_type, "list_size", None)
    if dim is not None and dim > 0:
        return int(dim)
    first = ds.limit(1).take(1)
    if not first or first[0].get("embedding") is None:
        raise SystemExit(
            "chunk store needs a non-empty 'embedding' column "
            "(fixed-size list, or at least one row to infer the dim)")
    return len(first[0]["embedding"])


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


def _records_path(path: str) -> str:
    """A crawl output dir holds records.parquet AND interleaved.parquet
    (different schemas) — point the source-record reader at the records
    file when present so the recursive glob can't mix the two."""
    rec = os.path.join(path, "records.parquet")
    return rec if os.path.isdir(path) and os.path.exists(rec) else path


def cmd_crawl_multi(args):
    """Crawl EVERY competitor config through one shared frontier: per-host
    rate limits and excludes come from the compiled plan
    (sources/config.py); records stream to worker-written parquet."""
    _ray_init()

    from .pipelines.crawl import crawl_scalable, load_crawl_records
    from .sources.config import compile_competitor_configs, load_configs
    from .sources.synthetic import make_web_graph

    cfgs = load_configs(args.configs)
    plan = compile_competitor_configs(cfgs)
    from urllib.parse import urlparse

    hosts = sorted({urlparse(s).netloc for s in plan["seeds"]})
    pages = make_web_graph(seed=42, hosts=hosts,
                           pages_per_host={i: 40 for i in range(len(hosts))})
    os.makedirs(args.out, exist_ok=True)
    res = crawl_scalable(
        pages, plan["seeds"], max_depth=plan["max_depth"],
        num_shards=4, per_host_delay=plan["per_host_delay"],
        per_host_excludes=plan["per_host_excludes"],
        per_host_budget=plan["budgets"],
        per_host_selectors=plan["selectors"],
        materialize_records=False, records_dir=args.out,
        capture_media_refs=True,
    )
    from .pipelines.full import (
        crawl_dataset_to_interleaved,
        crawl_dataset_to_source_records,
    )

    loaded = load_crawl_records(args.out)
    recs = crawl_dataset_to_source_records(loaded)
    # write the SourceRecord form next to the fragments so `process` /
    # `vectorize` chain directly off this directory (same layout contract
    # as cmd_crawl: <out>/records.parquet)
    recs.write_parquet(os.path.join(args.out, "records.parquet"))
    # ... and the interleaved text+media payload (input_hint shape) as a
    # partitioned table — the distributed twin of cmd_crawl's driver-side
    # interleaved.parquet
    crawl_dataset_to_interleaved(loaded).write_parquet(
        os.path.join(args.out, "interleaved"))
    import ray.data as rd

    n = rd.read_parquet(os.path.join(args.out, "records.parquet")).count()
    print(f"crawled {len(cfgs)} sources, {n} pages, "
          f"seen {len(res['seen'])} urls, "
          f"virtual politeness floor {res['virtual_time']:.2f}s -> {args.out}")


def cmd_process(args):
    _ray_init()
    from .pipelines.process import process_pipeline
    from .sources.readers import read_source_records

    ds = read_source_records(_records_path(args.input))
    ds = process_pipeline(ds, min_word_count=args.min_words)
    ds.write_parquet(args.out)
    print(f"processed -> {args.out}")


def cmd_vectorize(args):
    _ray_init()
    from .pipelines.vectorize import vectorize_pipeline
    from .sources.readers import read_source_records

    ds = read_source_records(_records_path(args.input))
    out = vectorize_pipeline(ds, chunk_tokens=args.chunk_tokens,
                             overlap_tokens=args.overlap_tokens)
    out.write_parquet(args.out)
    print(f"vectorized -> {args.out}")


def cmd_generate(args):
    _ray_init()
    from .pipelines.generate import generate_all, generate_comparisons
    from .sources.readers import read_source_records

    ds = read_source_records(_records_path(args.input))
    if args.competitor:
        # full reference `generate` verb: topics + objections/cross-cutting
        # + narrative for one competitor (reference pipeline.py:240-349)
        out = generate_all(ds, args.primary, args.competitor, args.out,
                           step=args.step)
        print(f"generated {len(out['entries'])} topic entries, "
              f"{len(out['objections'])} objection handlers, "
              f"{len(out['cross_cutting'])} cross-cutting themes, "
              f"narrative={'yes' if out['narrative'] else 'no'} -> {args.out}")
    else:
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


def cmd_vector_status(args):
    """Vector-store statistics over a chunks parquet directory
    (reference: competitive-intel/pipeline.py:cmd_vector_status — ChromaDB
    collection counts + sample metadata keys)."""
    _ray_init()
    import ray.data as rd

    ds = rd.read_parquet(args.input)
    n = ds.count()
    cols = [c for c in ds.schema().names if c not in ("embedding", "text")]
    print("=" * 70)
    print("VECTOR STORE STATUS")
    print("=" * 70)
    print(f"\n  Collection: {os.path.basename(os.path.normpath(args.input))}")
    print(f"    Vectors stored: {n}")
    print(f"    Metadata fields: {', '.join(cols)}")
    if "competitor" in cols:
        by = ds.groupby("competitor").count().to_pandas()
        for _, row in by.iterrows():
            print(f"      {row['competitor']}: {row['count()']}")
    print("\n" + "=" * 70)


def cmd_battlecard(args):
    """Battle-card verb (reference webapp/battlecard): KB-agent retrieval
    fan-out over the chunk store, deterministic synthesis stub, markdown
    report; status events stream to stdout like the reference's SSE."""
    _ray_init()
    import ray.data as rd

    from .pipelines.battlecard import (corpus_web_agents,
                                       generate_battlecard, render_markdown)
    from .pipelines.retrieval import ChunkRetriever

    ds = rd.read_parquet(args.input)
    name = os.path.basename(os.path.normpath(args.input))
    dim = _embed_dim(ds)
    retr = ChunkRetriever({name: ds}, embed_dim=dim)
    extra = None
    if getattr(args, "records", None):
        extra = corpus_web_agents(rd.read_parquet(_records_path(args.records)))
    report = None
    for kind, data in generate_battlecard(
            retr, args.competitor, use_case=args.use_case, tone=args.tone,
            client_name=args.client or "", primary=args.primary,
            extra_agents=extra):
        if kind == "status":
            print(f"[{data['progress']:4.0%}] {data['message']}")
        elif kind == "report":
            report = data
    md = render_markdown(report)
    with open(args.out, "w") as f:
        f.write(md)
    print(f"battlecard -> {args.out} ({report['sources_count']} sources)")


def cmd_vector_query(args):
    """Test query against the chunk store (reference:
    pipeline.py:cmd_vector_query — embed the query text, filtered top-k,
    print score/topic/source per hit)."""
    _ray_init()
    import ray.data as rd

    from .pipelines.retrieval import ChunkRetriever

    ds = rd.read_parquet(args.input)
    name = os.path.basename(os.path.normpath(args.input))
    dim = _embed_dim(ds)
    retr = ChunkRetriever({name: ds}, embed_dim=dim)
    fused = retr.retrieve(
        args.query,
        competitors=[args.competitor] if args.competitor else None,
        topics=[args.topic] if args.topic else None,
        n_results=args.top_k,
    )
    meta = ds.map_batches(
        lambda df: df[df["chunk_id"].isin(list(fused["chunk_id"]))],
        batch_format="pandas",
    ).to_pandas()
    meta = fused.merge(meta, on="chunk_id", how="left")
    print(f'\nQuery: "{args.query}"')
    print(f"Results: {len(meta)}")
    print("-" * 50)
    for i, row in meta.iterrows():
        tids = row.get("topic_ids")
        topic = tids[0] if isinstance(tids, (list, tuple)) and len(tids) else (
            tids.tolist()[0] if getattr(tids, "size", 0) else "?")
        print(f"\n[{i + 1}] Score: {row['rrf_score']:.4f} | "
              f"{row.get('competitor', '?')} | {row.get('source_type', '?')}")
        print(f"    Topic: {topic}")
        print(f"    Chunk: {row['chunk_id']}")
        print(f"    Source: {row.get('source_title', '?')}")
        print(f"    URL: {row.get('source_url', '?')}")
        preview = str(row.get("text", ""))[:200].replace("\n", " ")
        print(f"    Text: {preview}...")


def cmd_serve(args):
    """Run the query-time serve app over a chunk store (reference:
    webapp/app.py — the FastAPI surface, reimplemented on stdlib http;
    see pipelines/serve.py)."""
    _ray_init()
    import ray.data as rd

    from .pipelines.serve import QueryEngine, serve_app
    from .state.sessions import SessionManager

    ds = rd.read_parquet(args.input).materialize()
    name = os.path.basename(os.path.normpath(args.input))
    dim = _embed_dim(ds)
    engine = QueryEngine({name: ds}, embed_dim=dim)
    mgr = SessionManager(db_path=args.sessions_db)
    srv, port = serve_app(engine, mgr, host=args.host, port=args.port)
    print(f"serving on http://{args.host}:{port} "
          f"(collections: {name}, {ds.count()} chunks) — Ctrl-C to stop")
    try:
        import threading

        threading.Event().wait()
    except KeyboardInterrupt:
        srv.shutdown()


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

    c = sub.add_parser("crawl-multi")
    c.add_argument("--configs", required=True,
                   help="directory of competitor config JSONs (or one file)")
    c.add_argument("--out", required=True)
    c.set_defaults(fn=cmd_crawl_multi)

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
    c.add_argument("--competitor", default=None,
                   help="run the full generate verb (topics + objections + "
                        "narrative) for this competitor origin")
    c.add_argument("--step", default=None,
                   choices=["topics", "objections", "narrative"])
    c.set_defaults(fn=cmd_generate)

    c = sub.add_parser("status")
    c.add_argument("--dir", required=True)
    c.set_defaults(fn=cmd_status)

    c = sub.add_parser("vector-status")
    c.add_argument("--in", dest="input", required=True)
    c.set_defaults(fn=cmd_vector_status)

    c = sub.add_parser("vector-query")
    c.add_argument("query")
    c.add_argument("--in", dest="input", required=True)
    c.add_argument("--top-k", type=int, default=5)
    c.add_argument("--competitor")
    c.add_argument("--topic")
    c.set_defaults(fn=cmd_vector_query)

    c = sub.add_parser("battlecard")
    c.add_argument("--in", dest="input", required=True,
                   help="chunk-store parquet dir (vectorize output)")
    c.add_argument("--competitor", required=True)
    c.add_argument("--out", required=True)
    c.add_argument("--use-case", dest="use_case", default="general")
    c.add_argument("--tone", default="highly_technical",
                   choices=["highly_technical", "executive"])
    c.add_argument("--client", default=None)
    c.add_argument("--primary", default="kx")
    c.add_argument("--records", default=None,
                   help="records parquet dir (process output); when given, "
                        "the corpus-backed Benchmark / Developer Sentiment "
                        "/ Market News agents run over it")
    c.set_defaults(fn=cmd_battlecard)

    c = sub.add_parser("export")
    c.add_argument("--in", dest="input", required=True)
    c.add_argument("--out", required=True)
    c.set_defaults(fn=cmd_export)

    c = sub.add_parser("serve")
    c.add_argument("--in", dest="input", required=True,
                   help="chunk-store parquet dir (vectorize output)")
    c.add_argument("--host", default="127.0.0.1")
    c.add_argument("--port", type=int, default=8000)
    c.add_argument("--sessions-db", default=None)
    c.set_defaults(fn=cmd_serve)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
