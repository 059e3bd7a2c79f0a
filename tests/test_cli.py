"""End-to-end drive of the CLI surface (reference pipeline.py command
parity): crawl → process → vectorize → generate → status → export →
vector-status → vector-query, in-process against the session Ray
(cli._ray_init is guarded, so no second session starts)."""

from __future__ import annotations

import json
import os

from ai_intel_web_scraper_ray import cli


def test_cli_full_flow(tmp_path, capsys):
    cfg = tmp_path / "cfg.json"
    cfg.write_text(json.dumps({
        "base_url": "https://docs.hot.example/p0",
        "max_depth": 3,
        "max_pages": 120,
        "content_selector": "article",
    }))
    raw = str(tmp_path / "raw")
    processed = str(tmp_path / "processed")
    chunks = str(tmp_path / "chunks")
    entries = str(tmp_path / "entries")

    cli.main(["crawl", "--config", str(cfg), "--out", raw])
    out = capsys.readouterr().out
    assert "crawled" in out and os.path.exists(os.path.join(raw, "records.parquet"))
    # the crawl dir holds records + interleaved side by side: downstream
    # commands must not glob both schemas together
    assert os.path.exists(os.path.join(raw, "interleaved.parquet"))

    cli.main(["process", "--in", raw, "--out", processed])
    assert "processed" in capsys.readouterr().out

    cli.main(["vectorize", "--in", raw, "--out", chunks])
    assert "vectorized" in capsys.readouterr().out

    cli.main(["generate", "--in", processed, "--primary", "crawl",
              "--out", entries])
    assert "generated" in capsys.readouterr().out

    # full generate verb: objections + cross-cutting + narrative for one
    # competitor origin (reference pipeline.py generate)
    full = str(tmp_path / "entries_full")
    cli.main(["generate", "--in", processed, "--primary", "crawl",
              "--competitor", "crawl", "--out", full])
    out = capsys.readouterr().out
    assert "objection handlers" in out and "narrative=yes" in out
    for fname in ("crawl_objection_handlers.json", "crawl_cross_cutting.json",
                  "crawl_narrative.json"):
        assert os.path.exists(os.path.join(full, fname)), fname

    cli.main(["status", "--dir", str(tmp_path)])
    out = capsys.readouterr().out
    assert "chunks" in out and "raw" in out

    cli.main(["export", "--in", entries,
              "--out", str(tmp_path / "battlecard.md")])
    assert "exported" in capsys.readouterr().out
    assert (tmp_path / "battlecard.md").exists()

    cli.main(["vector-status", "--in", chunks])
    out = capsys.readouterr().out
    assert "Vectors stored" in out and "chunk_id" in out

    cli.main(["vector-query", "fast query engine", "--in", chunks,
              "--top-k", "3"])
    out = capsys.readouterr().out
    assert "Results: 3" in out and "Score:" in out

    bc = str(tmp_path / "bc.md")
    cli.main(["battlecard", "--in", chunks, "--competitor", "crawl",
              "--out", bc, "--primary", "crawl"])
    out = capsys.readouterr().out
    assert "battlecard ->" in out and "Deploying agents" in out
    text = open(bc).read()
    assert "## Why KX Wins" in text and "## Deal Strategy Playbook" in text

    # corpus-backed web agents over the processed store (--records)
    bc2 = str(tmp_path / "bc_corpus.md")
    cli.main(["battlecard", "--in", chunks, "--competitor", "crawl",
              "--out", bc2, "--primary", "crawl", "--records", processed])
    out = capsys.readouterr().out
    for name in ("Financial Benchmark", "Developer Sentiment", "Market News"):
        assert name in out, name
    text = open(bc2).read()
    assert "Financial Benchmark" in text      # agents_used footer line
