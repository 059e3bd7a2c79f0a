"""Battle-card surface: multi-agent intelligence gathering + synthesis +
report rendering, the last reference surface not yet mirrored.

Reference: webapp/battlecard/generator.py:1-409 (orchestrator + synthesis
prompt), agents.py:204-327 (InternalKBAgent — the only agent whose data
source exists in this sandbox; the Benchmark/DeveloperSentiment/MarketNews
agents are live web-search agents and are represented by injectable
callables defaulting to deterministic stubs), models.py (report shape),
report_renderer.py:876-1000 (section structure — rendered here as markdown
rather than the reference's HTML/CSS document).

The LLM synthesis is the documented deterministic stub (``llm_fn`` seam,
same policy as pipelines/generate.py); everything around it — the KB
retrieval fan-out over the Ray chunk store, cross-query dedup, prompt
section assembly, report normalization, status event sequence, renderer —
is real dataflow."""

from __future__ import annotations

import hashlib
import json
from typing import Callable, Dict, Iterator, List, Optional, Tuple

# deal stages mirror the reference synthesis prompt's deal_strategy shape
DEAL_STAGES = ["Discovery", "Technical Evaluation", "POC / Benchmark",
               "Procurement / Close"]

# reference agents.py:308-326 _build_queries
KB_QUERY_TEMPLATES = [
    "{competitor} limitations weaknesses",
    "{competitor} performance benchmarks latency",
    "{competitor} high availability replication",
    "{competitor} architecture storage engine",
    "{competitor} vs kdb+ comparison",
    "{competitor} security compliance enterprise",
]
KB_USE_CASE_QUERIES = {
    "alpha_generation": "{competitor} alpha generation quantitative trading",
    "order_book_analytics": "{competitor} order book level 2 market data",
    "tick_to_trade": "{competitor} tick-to-trade latency throughput",
    "risk_management": "{competitor} risk management real-time analytics",
    "agentic_ai": "{competitor} AI ML vector integration agentic",
}
# reference agents.py:258-262 KX-strength follow-up queries
KB_PRIMARY_QUERIES = [
    "kdb+ advantages over {competitor}",
    "KX performance benchmarks vs {competitor}",
    "kdb+ time-series analytics capabilities strengths",
]
KB_CHUNK_CLIP = 1500
KB_MAX_CHUNKS = 40


def build_kb_queries(competitor: str, use_case: str = "") -> List[str]:
    """Mirror of InternalKBAgent._build_queries (agents.py:308-326):
    use-case query first when mapped, then the six standard probes."""
    queries = [t.format(competitor=competitor) for t in KB_QUERY_TEMPLATES]
    if use_case in KB_USE_CASE_QUERIES:
        queries.insert(0, KB_USE_CASE_QUERIES[use_case].format(competitor=competitor))
    return queries


def internal_kb_agent(
    retriever,
    competitor: str,
    use_case: str = "",
    primary: str = "kx",
    n_results: int = 8,
    n_primary_results: int = 5,
) -> dict:
    """InternalKBAgent (agents.py:204-327) over the Ray chunk store: each
    probe query retrieves top-N with a competitor filter, chunk ids dedup
    ACROSS queries keep-first, then the primary-origin strength queries run
    filtered to the primary competitor tag; capped at 40 chunks like the
    reference.  Retrieval returns (chunk_id, score) only; metadata for the
    ≤ 9×n_results winning ids is fetched in ONE filtered pass over the
    chunk store afterwards (an ``is_in`` mask inside map_batches — the
    driver never materializes the store)."""
    ordered_ids: List[str] = []
    seen_ids = set()

    def collect(results):
        for cid in results["chunk_id"]:
            if cid not in seen_ids:
                seen_ids.add(cid)
                ordered_ids.append(cid)

    for q in build_kb_queries(competitor, use_case):
        collect(retriever.retrieve(q, competitors=[competitor],
                                   n_results=n_results))
    for q in KB_PRIMARY_QUERIES:
        collect(retriever.retrieve(q.format(competitor=competitor),
                                   competitors=[primary],
                                   n_results=n_primary_results))

    all_chunks: List[dict] = []
    if ordered_ids:
        import pyarrow as pa
        import pyarrow.compute as pc

        id_set = pa.array(ordered_ids, pa.string())
        meta_cols = ["chunk_id", "text", "source_title", "source_type",
                     "source_url", "competitor", "credibility"]

        def pick(t: "pa.Table") -> "pa.Table":
            t = t.filter(pc.is_in(t["chunk_id"], value_set=id_set))
            return t.select([c for c in meta_cols if c in t.schema.names])

        meta: Dict[str, dict] = {}
        for ds in retriever.collections.values():
            for row in ds.map_batches(pick, batch_format="pyarrow").take_all():
                meta.setdefault(row["chunk_id"], row)
        for cid in ordered_ids:
            d = meta.get(cid, {})
            all_chunks.append({
                "text": (d.get("text") or "")[:KB_CHUNK_CLIP],
                "source_title": d.get("source_title") or "",
                "source_type": d.get("source_type") or "",
                "source_url": d.get("source_url") or "",
                "competitor": d.get("competitor") or "",
                "credibility": d.get("credibility") or "",
            })

    return {
        "agent_name": "Internal Knowledge Base",
        "data": {"chunks": all_chunks[:KB_MAX_CHUNKS],
                 "total_found": len(all_chunks)},
        "sources_count": len(all_chunks),
        "error": None,
    }


def stub_web_agent(name: str) -> Callable[[str, str], dict]:
    """Deterministic stand-in for the web-search agents (Benchmark /
    Developer Sentiment / Market News — live search APIs, unavailable in
    this sandbox; documented stub seam like the LLM clients)."""

    def agent(competitor: str, use_case: str = "") -> dict:
        h = hashlib.sha256(f"{name}|{competitor}|{use_case}".encode()).hexdigest()
        return {
            "agent_name": name,
            "data": {"items": [f"{name.lower().replace(' ', '-')}-{h[:12]}"]},
            "sources_count": 1,
            "error": None,
        }

    # the 'Deploying agents' status line prints __name__; without this the
    # status says 'agent' while agents_used says e.g. 'Market News'
    agent.__name__ = name
    return agent


# ---------------------------------------------------------------------------
# Corpus-backed web agents: deterministic implementations of the reference's
# Benchmark / Developer Sentiment / Market News agents (agents.py:329-604)
# over the CRAWLED STORE instead of live web search (no network in this
# sandbox; the stub_web_agent seam above remains for injecting live ones).
# Each agent is ONE bounded map_batches pass over the records Dataset: rows
# mentioning the competitor are extracted per batch, per-batch output is
# capped at CORPUS_AGENT_CAP rows in arrival_seq order (the global earliest-
# CAP set is contained in the union of per-batch earliest-CAP sets), and a
# count carrier per batch keeps the total exact — the driver merge is
# O(blocks × CAP), never the matching corpus.
# ---------------------------------------------------------------------------

#: per-agent result cap, mirroring the reference's max_uses-bounded searches
CORPUS_AGENT_CAP = 12


def _corpus_scan(records_ds, competitor: str, build_rows) -> Tuple[List[dict], int]:
    """Bounded competitor-filtered scan: ``build_rows(sub_df) ->
    list[(seq, dict)]`` runs per batch on the matching rows; returns the
    globally earliest ``CORPUS_AGENT_CAP`` payloads and the exact total
    match count."""
    import pandas as pd

    def scan(df: "pd.DataFrame") -> "pd.DataFrame":
        mask = (df["text"].fillna("").str.contains(competitor, case=False,
                                                   regex=False)
                | df["title"].fillna("").str.contains(competitor, case=False,
                                                      regex=False))
        sub = df[mask]
        n_match = int(len(sub))
        sub = sub.sort_values("arrival_seq").head(CORPUS_AGENT_CAP)
        rows = build_rows(sub) if len(sub) else []
        rows = sorted(rows, key=lambda x: x[0])[:CORPUS_AGENT_CAP]
        return pd.DataFrame({
            "seq": pd.array([s for s, _ in rows] + [-1], dtype="int64"),
            "payload": pd.Series([json.dumps(d) for _, d in rows] + [""],
                                 dtype=object),
            "n_match": pd.array([0] * len(rows) + [n_match], dtype="int64"),
        })

    parts = records_ds.map_batches(scan, batch_format="pandas").to_pandas()
    total = int(parts["n_match"].sum())
    real = parts[parts["seq"] >= 0].sort_values("seq").head(CORPUS_AGENT_CAP)
    return [json.loads(p) for p in real["payload"]], total


def corpus_benchmark_agent(records_ds) -> Callable[[str, str], dict]:
    """BenchmarkAgent (agents.py:329-411) over the crawled store: the M14
    extractor (functions/benchmarkx.py — same regex bank as the reference's
    benchmark_scraper.py:161-209) mines performance numbers from documents
    mentioning the competitor; kx_value is filled from the same document
    when it also names a KDB variant."""
    from ..functions.benchmarkx import extract_benchmark_data

    def agent(competitor: str, use_case: str = "") -> dict:
        try:
            def build(sub):
                rows = []
                for r in sub.itertuples():
                    ext = extract_benchmark_data(r.text or "")
                    perf = ext["performance_numbers"]
                    if not perf:
                        continue
                    has_kx = any(d.upper().startswith("KDB")
                                 for d in ext["databases_mentioned"])
                    rows.append((int(r.arrival_seq), {
                        "metric": perf[0],
                        "kx_value": (perf[1] if has_kx and len(perf) > 1
                                     else ""),
                        "competitor_value": perf[0],
                        "source": r.url or r.title or "",
                    }))
                return rows

            benches, total = _corpus_scan(records_ds, competitor, build)
            data = {
                "benchmarks": benches,
                "summary": (f"{len(benches)} benchmark mention(s) for "
                            f"{competitor} across {total} matching "
                            f"document(s)"),
                "sources": sorted({b["source"] for b in benches if b["source"]}),
            }
            return {"agent_name": "Financial Benchmark", "data": data,
                    "sources_count": len(benches), "error": None}
        except Exception as e:  # mirror the reference's error envelope
            return {"agent_name": "Financial Benchmark",
                    "data": {"benchmarks": [], "summary": "", "sources": []},
                    "sources_count": 0, "error": str(e)}

    agent.__name__ = "Financial Benchmark"
    return agent


def corpus_sentiment_agent(records_ds) -> Callable[[str, str], dict]:
    """DeveloperSentimentAgent (agents.py:414-507) over the crawled store:
    the M13 estimator (functions/sentiment.py — the reference
    community_scraper.py:294-319 signal lists) classifies competitor
    mentions; negative rows become complaints (severity high at >=3 signal
    hits), positive rows become positive_sentiment, and the matched
    negative signals aggregate into developer_concerns."""
    from ..functions.sentiment import NEGATIVE_SIGNALS, estimate_sentiment

    def agent(competitor: str, use_case: str = "") -> dict:
        try:
            def build(sub):
                rows = []
                for r in sub.itertuples():
                    text = r.text or ""
                    senti = estimate_sentiment(text)
                    if senti not in ("negative", "positive", "mixed"):
                        continue
                    lower = text.lower()
                    hits = [s for s in NEGATIVE_SIGNALS if s in lower]
                    rows.append((int(r.arrival_seq), {
                        "kind": "complaint" if senti != "positive" else "positive",
                        "issue": (r.title or text[:80]).strip(),
                        "source": r.source_type or "",
                        "severity": "high" if len(hits) >= 3 else "medium",
                        "url": r.url or "",
                        "signals": hits,
                    }))
                return rows

            items, total = _corpus_scan(records_ds, competitor, build)
            complaints = [{"issue": i["issue"], "source": i["source"],
                           "severity": i["severity"], "url": i["url"]}
                          for i in items if i["kind"] == "complaint"]
            positive = [{"point": i["issue"], "source": i["source"],
                         "url": i["url"]}
                        for i in items if i["kind"] == "positive"]
            counts: Dict[str, int] = {}
            for i in items:
                for s in i["signals"]:
                    counts[s] = counts.get(s, 0) + 1
            concerns = [s for s, _ in sorted(counts.items(),
                                             key=lambda kv: (-kv[1], kv[0]))][:5]
            data = {
                "complaints": complaints,
                "positive_sentiment": positive,
                "developer_concerns": concerns,
                "summary": (f"{len(complaints)} complaint(s), "
                            f"{len(positive)} positive mention(s) for "
                            f"{competitor} across {total} matching "
                            f"document(s)"),
            }
            return {"agent_name": "Developer Sentiment", "data": data,
                    "sources_count": len(complaints) + len(positive),
                    "error": None}
        except Exception as e:
            return {"agent_name": "Developer Sentiment",
                    "data": {"complaints": [], "positive_sentiment": [],
                             "developer_concerns": [], "summary": ""},
                    "sources_count": 0, "error": str(e)}

    agent.__name__ = "Developer Sentiment"
    return agent


_RELEASE_RE = None


def corpus_news_agent(records_ds) -> Callable[[str, str], dict]:
    """MarketNewsAgent (agents.py:510-604) over the crawled store: dated
    competitor mentions become news_items (newest first), titles naming a
    release/version feed recent_releases."""
    import re as _re
    global _RELEASE_RE
    if _RELEASE_RE is None:
        _RELEASE_RE = _re.compile(r"\b(release[sd]?|v?\d+\.\d+)\b",
                                  _re.IGNORECASE)

    def agent(competitor: str, use_case: str = "") -> dict:
        try:
            def build(sub):
                rows = []
                for r in sub.itertuples():
                    if r.content_date is None or r.content_date != r.content_date:
                        continue
                    title = (r.title or "").strip()
                    rows.append((int(r.arrival_seq), {
                        "headline": title or (r.text or "")[:80],
                        "date": str(r.content_date)[:10],
                        "source": r.source_type or "",
                        "url": r.url or "",
                        "implication": (f"Corpus-dated {competitor} activity "
                                        f"via {r.source_type or 'unknown'}"),
                        "is_release": bool(_RELEASE_RE.search(title)),
                    }))
                return rows

            items, total = _corpus_scan(records_ds, competitor, build)
            items.sort(key=lambda n: (n["date"], n["url"]), reverse=True)
            news = [{k: v for k, v in n.items() if k != "is_release"}
                    for n in items]
            data = {
                "news_items": news,
                "funding_status": "",
                "recent_releases": [n["headline"] for n in items
                                    if n["is_release"]][:3],
                "key_hires": [],
                "summary": (f"{len(news)} dated item(s) for {competitor} "
                            f"across {total} matching document(s)"),
            }
            return {"agent_name": "Market News", "data": data,
                    "sources_count": len(news), "error": None}
        except Exception as e:
            return {"agent_name": "Market News",
                    "data": {"news_items": [], "funding_status": "",
                             "recent_releases": [], "key_hires": [],
                             "summary": ""},
                    "sources_count": 0, "error": str(e)}

    agent.__name__ = "Market News"
    return agent


def corpus_web_agents(records_ds) -> List[Callable[[str, str], dict]]:
    """The three corpus-backed agents in the reference's deployment order
    (generator.py:206-300), ready for ``generate_battlecard(...,
    extra_agents=corpus_web_agents(ds))``."""
    return [corpus_benchmark_agent(records_ds),
            corpus_sentiment_agent(records_ds),
            corpus_news_agent(records_ds)]


def build_synthesis_prompt(
    competitor_name: str,
    agent_results: List[dict],
    use_case: str = "general",
    tone: str = "highly_technical",
    client_name: str = "",
    client_industry: str = "",
    call_notes: str = "",
    chat_context: str = "",
) -> str:
    """Synthesis prompt assembly mirroring generator.py:62-200: client
    context section, chat context (clipped 3000), one intelligence section
    per agent (JSON payload clipped 8000), tone instruction, use-case
    label, and the report-shape instruction."""
    sections: List[str] = []
    if client_name or call_notes:
        ctx = "## CLIENT CONTEXT\n"
        if client_name:
            ctx += f"**Client**: {client_name}\n"
        if client_industry:
            ctx += f"**Industry**: {client_industry}\n"
        if use_case:
            ctx += f"**Target Use Case**: {use_case.replace('_', ' ').title()}\n"
        if call_notes:
            ctx += f"\n**Call Notes / Transcripts**:\n{call_notes[:3000]}\n"
        sections.append(ctx)
    if chat_context:
        sections.append(f"## ACTIVE CHAT SESSION CONTEXT\n{chat_context[:3000]}\n")
    for result in agent_results:
        err = result.get("error")
        sections.append(
            f"## INTELLIGENCE: {result['agent_name'].upper()}\n"
            f"Sources found: {result['sources_count']}\n"
            f"{'Error: ' + err if err else ''}\n\n"
            f"```json\n{json.dumps(result['data'], indent=2, default=str)[:8000]}\n```\n"
        )
    tone_instruction = (
        "Use HIGHLY TECHNICAL language."
        if tone == "highly_technical"
        else "Use EXECUTIVE/BUSINESS VALUE language."
    )
    return (
        f"Generate a sales battle card against **{competitor_name}**.\n"
        f"**Target Use Case**: {use_case.replace('_', ' ').title()}\n"
        f"**Tone**: {tone_instruction}\n\n"
        + "".join(sections)
    )


def stub_llm_battlecard(prompt: str) -> dict:
    """Deterministic synthesis stand-in: a full report dict (every section
    of the reference's EXACT JSON structure, generator.py:140-199) whose
    fields are sha256-hex slices of the prompt."""
    h = hashlib.sha256(prompt.encode()).hexdigest()

    def tag(i: int) -> str:
        return h[(i * 8) % 56:(i * 8) % 56 + 8]

    return {
        "why_kx_wins": f"why-{tag(0)}",
        "pain_points": [
            {"client_pain": f"pain-{tag(1)}", "kx_solution": f"fix-{tag(2)}"},
            {"client_pain": f"pain-{tag(3)}", "kx_solution": f"fix-{tag(4)}"},
        ],
        "architecture_comparison": f"arch-{tag(5)}",
        "benchmarks": [
            {"metric": f"metric-{tag(6)}", "kx_value": f"kx-{tag(0)}",
             "competitor_value": f"cv-{tag(1)}", "source": f"src-{tag(2)}"},
        ],
        "feature_matrix": [
            {"feature": f"feat-{tag(3)}", "kx_rating": "green",
             "competitor_rating": "yellow", "kx_detail": f"kd-{tag(4)}",
             "competitor_detail": f"cd-{tag(5)}"},
        ],
        "trap_questions": [
            {"question": f"q-{tag(6)}", "why_it_works": f"w-{tag(0)}",
             "source": f"s-{tag(1)}"},
        ],
        "objection_handlers": [
            {"objection": f"obj-{tag(2)}", "response": f"resp-{tag(3)}"},
        ],
        "competitor_news": [],
        "competitive_positioning": {
            "positioning_statement": f"pos-{tag(4)}",
            "key_differentiators": [f"diff-{tag(5)}", f"diff-{tag(6)}"],
            "landmines_to_set": [f"mine-{tag(0)}"],
            "proof_points": [f"proof-{tag(1)}"],
        },
        "deal_strategy": [
            {"stage": s, "action": f"act-{tag(i)}",
             "talking_point": f"talk-{tag(i + 1)}"}
            for i, s in enumerate(DEAL_STAGES)
        ],
        "pricing_guidance": f"price-{tag(2)}",
    }


def generate_battlecard(
    retriever,
    competitor: str,
    use_case: str = "general",
    tone: str = "highly_technical",
    client_name: str = "",
    client_industry: str = "",
    call_notes: str = "",
    chat_context: str = "",
    extra_agents: Optional[List[Callable[[str, str], dict]]] = None,
    llm_fn: Callable[[str], dict] = stub_llm_battlecard,
    primary: str = "kx",
) -> Iterator[Tuple[str, dict]]:
    """Orchestrator generator mirroring BattleCardGenerator.generate
    (generator.py:206-300): yields ("status", {...}) progress events in the
    reference's step sequence, then ("report", report).  The KB agent runs
    against the Ray chunk store; extra agents (web-search class) are
    injectable and default to none."""
    yield ("status", {"step": "starting",
                      "message": f"Generating battle card: {primary} vs {competitor}",
                      "progress": 0.02})
    agents = ["Internal Knowledge Base"] + [
        getattr(a, "__name__", "agent") for a in (extra_agents or [])]
    yield ("status", {"step": "agents",
                      "message": f"Deploying agents: {', '.join(agents)}",
                      "progress": 0.18})
    agent_results = [internal_kb_agent(retriever, competitor, use_case,
                                       primary=primary)]
    for a in extra_agents or []:
        agent_results.append(a(competitor, use_case))
    total_sources = sum(r["sources_count"] for r in agent_results)
    yield ("status", {"step": "agents_done",
                      "message": f"All {len(agent_results)} agents complete — "
                                 f"{total_sources} sources gathered",
                      "progress": 0.55})
    yield ("status", {"step": "synthesizing",
                      "message": "Synthesizing battle card...", "progress": 0.62})
    prompt = build_synthesis_prompt(
        competitor, agent_results, use_case=use_case, tone=tone,
        client_name=client_name, client_industry=client_industry,
        call_notes=call_notes, chat_context=chat_context)
    report = dict(llm_fn(prompt))
    report["competitor_name"] = competitor
    report["use_case"] = use_case.replace("_", " ").title()
    report["tone"] = tone
    report["client_name"] = client_name
    report["client_industry"] = client_industry
    report["agents_used"] = [r["agent_name"] for r in agent_results]
    report["sources_count"] = total_sources
    yield ("status", {"step": "rendering",
                      "message": "Formatting battle card document...",
                      "progress": 0.92})
    yield ("status", {"step": "done",
                      "message": "Battle card generated successfully",
                      "progress": 1.0})
    yield ("report", report)


def render_markdown(report: dict) -> str:
    """Markdown rendering of the report with the reference renderer's
    section sequence (report_renderer.py:876-1000: Why KX Wins → Client
    Context → Architecture → Benchmarks → Feature Matrix → Trap Questions
    → Objection Handling → Competitor Activity → Positioning → Deal
    Strategy → Pricing)."""
    comp = report.get("competitor_name", "")
    lines: List[str] = [f"# Battle Card: KX vs {comp}", ""]
    lines += ["## Why KX Wins", report.get("why_kx_wins", ""), ""]
    if report.get("pain_points"):
        lines += ["## Client Context Matrix", ""]
        for p in report["pain_points"]:
            lines.append(f"- **{p.get('client_pain', '')}** → {p.get('kx_solution', '')}")
        lines.append("")
    lines += ["## Architecture Comparison",
              report.get("architecture_comparison", ""), ""]
    if report.get("benchmarks"):
        lines += ["## Performance Benchmarks", "",
                  "| Metric | KX | Competitor | Source |", "|---|---|---|---|"]
        for b in report["benchmarks"]:
            lines.append(f"| {b.get('metric', '')} | {b.get('kx_value', '')} | "
                         f"{b.get('competitor_value', '')} | {b.get('source', '')} |")
        lines.append("")
    if report.get("feature_matrix"):
        lines += ["## Feature Matrix", "",
                  "| Feature | KX | Competitor |", "|---|---|---|"]
        for f in report["feature_matrix"]:
            lines.append(f"| {f.get('feature', '')} | {f.get('kx_rating', '')} "
                         f"({f.get('kx_detail', '')}) | {f.get('competitor_rating', '')} "
                         f"({f.get('competitor_detail', '')}) |")
        lines.append("")
    if report.get("trap_questions"):
        lines += ['## "Trap" Questions to Expose Weaknesses', ""]
        for q in report["trap_questions"]:
            lines.append(f"- **{q.get('question', '')}** — {q.get('why_it_works', '')}"
                         f" _(source: {q.get('source', '')})_")
        lines.append("")
    if report.get("objection_handlers"):
        lines += ["## Objection Handling Playbook", ""]
        for o in report["objection_handlers"]:
            lines.append(f"- _{o.get('objection', '')}_ → {o.get('response', '')}")
        lines.append("")
    if report.get("competitor_news"):
        lines += ["## Recent Competitor Activity (Last 90 Days)", ""]
        for n in report["competitor_news"]:
            lines.append(f"- [{n.get('date', '')}] {n.get('headline', '')} — "
                         f"{n.get('implication', '')}")
        lines.append("")
    pos = report.get("competitive_positioning") or {}
    lines += ["## Competitive Positioning", pos.get("positioning_statement", ""), ""]
    for title, key in (("Key Differentiators", "key_differentiators"),
                       ("Landmines to Set", "landmines_to_set"),
                       ("Proof Points", "proof_points")):
        if pos.get(key):
            lines.append(f"### {title}")
            lines.extend(f"- {x}" for x in pos[key])
            lines.append("")
    if report.get("deal_strategy"):
        lines += ["## Deal Strategy Playbook", ""]
        for d in report["deal_strategy"]:
            lines.append(f"- **{d.get('stage', '')}**: {d.get('action', '')} — "
                         f"{d.get('talking_point', '')}")
        lines.append("")
    lines += ["## Pricing & TCO Guidance", report.get("pricing_guidance", ""), ""]
    lines.append(f"_Agents: {', '.join(report.get('agents_used', []))}; "
                 f"sources: {report.get('sources_count', 0)}_")
    return "\n".join(lines)
