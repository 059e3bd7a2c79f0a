"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship pipeline (documents → clean → tag → quality
filter → dedup → chunk → embed) on sf0.001.  ``queries()`` exposes one
callable per implemented operator family (SURVEY.md §2); ``oracle_sql()``
gives the DuckDB-equivalent SQL for every SQL-expressible query — column
names and math match exactly (integer ppm ratios, explicit rounding of
float aggregates, identical RE2-safe regex patterns).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

import os

# Driver-process twin of the cap in ai_intel_web_scraper_ray/__init__:
# polars (used by Ray Data's sort path) sizes its rayon + tokio pools to
# the machine's 32 CPUs on first import — ~64 threads — and a long
# all-queries gate run in ONE process walks the node into pthread_create
# failure.  Must run before the first polars import anywhere.
os.environ.setdefault("POLARS_MAX_THREADS", "4")

from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa

# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------


def _documents_as_records(sf_dir: str, num_blocks: int | None = None):
    """documents.parquet → SourceRecord-shaped Dataset (generic adapter).

    ``num_blocks``: split the (single-file, few-MB) read so downstream
    CPU-bound stages parallelize; real corpora arrive in many files and
    don't need it."""
    import pyarrow.compute as pc
    import ray.data as rd

    if num_blocks:
        ds = rd.read_parquet(f"{sf_dir}/documents.parquet", override_num_blocks=num_blocks)
    else:
        ds = rd.read_parquet(f"{sf_dir}/documents.parquet")

    def adapt(t: pa.Table) -> pa.Table:
        n = len(t)
        doc_ids = t["doc_id"].to_pylist()
        sources = t["source"].to_pylist()
        t = t.append_column("id", pa.array([str(d) for d in doc_ids], pa.string()))
        t = t.append_column("origin", pa.array(["testdata"] * n, pa.string()))
        t = t.append_column("source_type", pa.array(["official_docs"] * n, pa.string()))
        t = t.append_column(
            "url", pa.array([f"https://testdata.example/{s}/{d}" for s, d in zip(sources, doc_ids)], pa.string())
        )
        t = t.append_column("title", pa.array([f"Doc {d}" for d in doc_ids], pa.string()))
        t = t.append_column("word_count", pc.cast(pc.count_substring_regex(t["text"], r"\S+"), pa.int32()))
        t = t.append_column("arrival_seq", pc.cast(t["doc_id"], pa.int64()))
        t = t.append_column("credibility", pa.array(["official"] * n, pa.string()))
        return t

    return ds.map_batches(adapt, batch_format="pyarrow")


def entry() -> Any:
    """Flagship: process + vectorize over sf0.001 documents."""
    from ai_intel_web_scraper_ray.pipelines.process import process_pipeline
    from ai_intel_web_scraper_ray.pipelines.vectorize import vectorize_pipeline

    ds = _documents_as_records("/root/testdata/sf0.001")
    ds = process_pipeline(ds, min_word_count=10, tagger_concurrency=2)
    ds = vectorize_pipeline(ds, chunk_concurrency=2, embed_concurrency=2)
    return ds


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def _crawl_fixture_query(sf_dir: str) -> pd.DataFrame:
    """Distributed strict crawl over the deterministic synthetic web graph
    (rows-only check; order equality vs the sequential oracle is pinned by
    pytest — tests/test_crawl.py)."""
    from ai_intel_web_scraper_ray.pipelines.crawl import crawl_strict
    from ai_intel_web_scraper_ray.sources.synthetic import make_web_graph

    pages = make_web_graph()
    res = crawl_strict(pages, "https://docs.hot.example/p0",
                       exclude_patterns=("/excluded/",), num_shards=4, round_size=32)
    df = pd.DataFrame(res["records"])[["url", "depth", "crawl_rank", "title"]]
    return df


def _crawl_fixture_ordered_query(sf_dir: str) -> pd.DataFrame:
    """Windowed ordered replay (crawl_ordered): same bit-exact reference
    order as crawl_strict but with fetches overlapped — pytest pins order
    equality; the driver sees the rows (rows-only check)."""
    from ai_intel_web_scraper_ray.pipelines.crawl import crawl_ordered
    from ai_intel_web_scraper_ray.sources.synthetic import make_web_graph

    pages = make_web_graph()
    res = crawl_ordered(pages, "https://docs.hot.example/p0",
                        exclude_patterns=("/excluded/",), num_shards=4,
                        window=64, chunk_size=8)
    df = pd.DataFrame(res["records"])[["url", "depth", "crawl_rank", "title"]]
    return df


def _crawl_lineage_query(sf_dir: str) -> pd.DataFrame:
    """Per-shard frontier LINEAGE counters for the fixture crawl
    (north rule: "per-partition lineage + metrics"): offered (with
    duplicate-sighting multiplicity), seen / admitted (distinct), and
    emitted leases — a drained, unbudgeted, robots-off crawl must emit
    exactly what it admits.  depth_refinement is off (max_depth sentinel)
    so the multiplicity counters are schedule-independent; hash-checked
    against the pinned independent sequential walk
    (tools/gen_pinned_oracles.py:gen_crawl_lineage_expected)."""
    from ai_intel_web_scraper_ray.pipelines.crawl import crawl_scalable
    from ai_intel_web_scraper_ray.sources.synthetic import make_web_graph

    pages = make_web_graph()
    res = crawl_scalable(pages, ["https://docs.hot.example/p0"],
                         exclude_patterns=("/excluded/",), num_shards=4,
                         max_depth=10**6, materialize_records=False,
                         collect_seen=False)
    rows = sorted(res["stats"], key=lambda d: d["shard"])
    out = pd.DataFrame({
        "shard": [r["shard"] for r in rows],
        "offered": [r["offered"] for r in rows],
        "seen": [r["seen"] for r in rows],
        "admitted": [r["admitted"] for r in rows],
        "emitted": [r["emitted"] for r in rows]})
    return out.astype("int64")


def _crawl_multi_fixture_query(sf_dir: str) -> pd.DataFrame:
    """Multi-source crawl through one shared frontier (compiled competitor
    configs: per-host politeness + per-host excludes).  Record SET +
    monotone min-depths are deterministic (per-shard BFS order is not) and
    hash-checked against the pinned independent per-host sequential BFS
    (tools/gen_pinned_oracles.py:gen_crawl_multi_expected)."""
    from ai_intel_web_scraper_ray.pipelines.crawl import crawl_scalable
    from ai_intel_web_scraper_ray.sources.config import (
        compile_competitor_configs)
    from ai_intel_web_scraper_ray.sources.synthetic import make_web_graph
    from tools.gen_pinned_oracles import CRAWL_MULTI_CONFIGS

    pages = make_web_graph(
        hosts=["docs.hot.example", "docs.cold1.example"],
        pages_per_host={0: 20, 1: 20}, error_sprinkle=False)
    plan = compile_competitor_configs(CRAWL_MULTI_CONFIGS)
    res = crawl_scalable(
        pages, plan["seeds"], max_depth=plan["max_depth"], num_shards=4,
        lease_per_shard=64, per_host_delay=plan["per_host_delay"],
        per_host_excludes=plan["per_host_excludes"])
    df = pd.DataFrame(res["records"])[["url", "depth", "title"]]
    df["depth"] = df["depth"].astype("int64")
    return df.sort_values("url").reset_index(drop=True)


def _crawl_multi_ordered_query(sf_dir: str) -> pd.DataFrame:
    """Multi-source REFERENCE-ORDER crawl: one windowed ordered replay per
    source (the reference scrapes configs one at a time), global
    crawl_rank = concatenation — hash-checked against the same pinned
    independent sequential BFS, ORDER INCLUDED."""
    from ai_intel_web_scraper_ray.pipelines.crawl import crawl_multi_ordered
    from ai_intel_web_scraper_ray.sources.synthetic import make_web_graph
    from tools.gen_pinned_oracles import CRAWL_MULTI_CONFIGS

    pages = make_web_graph(
        hosts=["docs.hot.example", "docs.cold1.example"],
        pages_per_host={0: 20, 1: 20}, error_sprinkle=False)
    res = crawl_multi_ordered(pages, CRAWL_MULTI_CONFIGS, num_shards=4,
                              window=64, chunk_size=8)
    df = pd.DataFrame(res["records"])[["url", "depth", "crawl_rank",
                                       "title"]]
    for c in ("depth", "crawl_rank"):
        df[c] = df[c].astype("int64")
    return df.sort_values("crawl_rank").reset_index(drop=True)


def _crawl_robots_fixture_query(sf_dir: str) -> pd.DataFrame:
    """Robots-gated fixture crawl (north rule: robots handling on the
    frontier): respect_robots=True with the pinned per-host robots.txt —
    admission drops disallowed URLs at offer time, so the record SET +
    BFS min-depths must equal the independent robots-aware sequential
    walk (tools/gen_pinned_oracles.py:gen_crawl_robots_expected)."""
    from ai_intel_web_scraper_ray.pipelines.crawl import crawl_scalable
    from ai_intel_web_scraper_ray.sources.synthetic import make_web_graph
    from tools.gen_pinned_oracles import CRAWL_ROBOTS_TEXTS

    pages = make_web_graph()
    res = crawl_scalable(
        pages, ["https://docs.hot.example/p0"], max_depth=3,
        exclude_patterns=("/excluded/",), num_shards=4,
        respect_robots=True, robots_texts=CRAWL_ROBOTS_TEXTS)
    df = pd.DataFrame(res["records"])[["url", "depth", "title"]]
    df["depth"] = df["depth"].astype("int64")
    return df.sort_values("url").reset_index(drop=True)


def _crawl_interleaved_fixture_query(sf_dir: str) -> pd.DataFrame:
    """The north-star archival flow end to end, span-level: streamed crawl
    with media capture (worker-written fragments, driver never holds
    bodies) → load_crawl_records (keep-first dedup + distributed ranks) →
    map_batches interleave (input_hint shape) → partitioned parquet →
    read back → one flat row per span.  Hash-checked against the pinned
    INDEPENDENT sequential BFS + codec replay
    (tools/gen_pinned_oracles.py:gen_crawl_interleaved_expected)."""
    import tempfile

    import pyarrow as pa

    from ai_intel_web_scraper_ray.pipelines.crawl import crawl_scalable
    from ai_intel_web_scraper_ray.pipelines.full import (
        write_interleaved_from_crawl,
    )
    from ai_intel_web_scraper_ray.sources.interleaved import spans_to_rows
    from ai_intel_web_scraper_ray.sources.readers import read_interleaved_docs
    from ai_intel_web_scraper_ray.sources.synthetic import make_web_graph

    pages = make_web_graph()
    with tempfile.TemporaryDirectory() as tmp:
        recs = os.path.join(tmp, "recs")
        out = os.path.join(tmp, "inter")
        crawl_scalable(pages, ["https://docs.hot.example/p0"], max_depth=3,
                       exclude_patterns=("/excluded/",), num_shards=4,
                       materialize_records=False, records_dir=recs,
                       capture_media_refs=True)
        write_interleaved_from_crawl(recs, out)
        df = (read_interleaved_docs(out)
              .map_batches(spans_to_rows, batch_format="pyarrow")
              .to_pandas())
    return df.sort_values(["doc_id", "span_offset"]).reset_index(drop=True)


def _chunk_documents_query(sf_dir: str) -> pd.DataFrame:
    """Chunk the documents table via the actor-pool flat map (rows-only)."""
    from ai_intel_web_scraper_ray.pipelines.vectorize import vectorize_pipeline

    ds = _documents_as_records(sf_dir)
    out = vectorize_pipeline(ds, chunk_concurrency=2, embed_concurrency=2)
    df = out.select_columns(["chunk_id", "parent_doc_id", "chunk_index", "token_count"]).to_pandas()
    return df.sort_values(["parent_doc_id", "chunk_index"]).reset_index(drop=True)


def queries() -> dict[str, Callable[[str], Any]]:
    from ai_intel_web_scraper_ray.pipelines import docqueries as dq
    from ai_intel_web_scraper_ray.pipelines import relational as rel

    return {
        # relational / aggregate / join / sort / window machinery
        "q1_pricing_summary": rel.q1_pricing_summary,
        "q3_top_orders": rel.q3_top_orders,
        "q5_nation_revenue": rel.q5_nation_revenue,
        "q6_revenue_delta": rel.q6_revenue_delta,
        "q4_order_priority": rel.q4_order_priority,
        "q12_priority_lines": rel.q12_priority_lines,
        "q14_promo_revenue": rel.q14_promo_revenue,
        "q10_returned_revenue": rel.q10_returned_revenue,
        "q19_branch_revenue": rel.q19_branch_revenue,
        "q7_nation_trade": rel.q7_nation_trade,
        "q13_order_count_dist": rel.q13_order_count_dist,
        "q17_small_qty_revenue": rel.q17_small_qty_revenue,
        "q18_large_orders": rel.q18_large_orders,
        "q22_idle_rich_customers": rel.q22_idle_rich_customers,
        "q8_market_share": rel.q8_market_share,
        "q21_late_suppliers": rel.q21_late_suppliers,
        "q11_part_value_share": rel.q11_part_value_share,
        "q20_excess_shippers": rel.q20_excess_shippers,
        "q9_nation_profit": rel.q9_nation_profit,
        "q15_top_supplier": rel.q15_top_supplier,
        "q16_supplier_count": rel.q16_supplier_count,
        "events_funnel": rel.events_funnel,
        "events_rolling_avg": rel.events_rolling_avg,
        "events_value_stats": rel.events_value_stats,
        "events_top_user_per_window": rel.events_top_user_per_window,
        "events_hopping_distinct": rel.events_hopping_distinct,
        "events_retention": rel.events_retention,
        "events_view_no_purchase": rel.events_view_no_purchase,
        "events_user_paths": rel.events_user_paths,
        "events_cep_match": rel.events_cep_match,
        "events_cep_sessions": rel.events_cep_sessions,
        "events_cep_guard": rel.events_cep_guard,
        "events_key_skew": rel.events_key_skew,
        "events_pivot": rel.events_pivot,
        "orders_monthly_growth": rel.orders_monthly_growth,
        "orders_running_total": rel.orders_running_total,
        "events_dau_wau": rel.events_dau_wau,
        "parts_co_ordered": rel.parts_co_ordered,
        "parts_components": rel.parts_components,
        "lineitem_partition_prune": rel.lineitem_partition_prune,
        "events_type_overlap": rel.events_type_overlap,
        "orders_spend_rank": rel.orders_spend_rank,
        "q2_min_cost_part": rel.q2_min_cost_part,
        "q5_rollup_revenue": rel.q5_rollup_revenue,
        "events_distinct_users": rel.events_distinct_users,
        "part_type_stats": rel.part_type_stats,
        "supplier_nation_acct": rel.supplier_nation_acct,
        "events_tumbling": rel.events_tumbling,
        "events_hopping": rel.events_hopping,
        "events_asof_click": rel.events_asof_click,
        "events_value_range_join": rel.events_value_range_join,
        "events_sessions": rel.events_sessions,
        "events_props_k": rel.events_props_k,
        "orders_gap_stats": rel.orders_gap_stats,
        "events_top_users": rel.events_top_users,
        "parts_pagerank": rel.parts_pagerank,
        "parts_ppr": rel.parts_ppr,
        "events_kmv_distinct": rel.events_kmv_distinct,
        "orders_bloom_semijoin": rel.orders_bloom_semijoin,
        "parts_triangles": rel.parts_triangles,
        "events_new_users_daily": rel.events_new_users_daily,
        "orders_profile": rel.orders_profile,
        "orders_forget_customers": rel.orders_forget_customers,
        "events_daily_ewma": rel.events_daily_ewma,
        "events_session_table": rel.events_session_table,
        "lineitem_zorder_sample": rel.lineitem_zorder_sample,
        "events_cube": rel.events_cube,
        "orders_price_median": rel.orders_price_median,
        "events_range_window": rel.events_range_window,
        "events_hll_registers": rel.events_hll_registers,
        "events_cms_topk": rel.events_cms_topk,
        "events_watermark_late": rel.events_watermark_late,
        "events_late_window_agg": rel.events_late_window_agg,
        "events_salted_segment_join": rel.events_salted_segment_join,
        "events_cdc_state": rel.events_cdc_state,
        "events_value_percentiles": rel.events_value_percentiles,
        "orders_open_interval_count": rel.orders_open_interval_count,
        "events_session_attribution": rel.events_session_attribution,
        "events_window_join": rel.events_window_join,
        "orders_incremental_agg": rel.orders_incremental_agg,
        "events_anomaly_mad": rel.events_anomaly_mad,
        "events_transition_matrix": rel.events_transition_matrix,
        "events_entropy_rate": rel.events_entropy_rate,
        "customer_er_pairs": rel.customer_er_pairs,
        "parts_closeness": rel.parts_closeness,
        "events_dp_counts": rel.events_dp_counts,
        "events_attribution": rel.events_attribution,
        "events_bot_users": rel.events_bot_users,
        "parts_edge_churn": rel.parts_edge_churn,
        "parts_bom_rollup": rel.parts_bom_rollup,
        "parts_croston": rel.parts_croston,
        "events_dup_within_window": rel.events_dup_within_window,
        "orders_backtest_mae": rel.orders_backtest_mae,
        "orders_skyline": rel.orders_skyline,
        "lineitem_rle_runs": rel.lineitem_rle_runs,
        "events_lead_lag": rel.events_lead_lag,
        "parts_katz": rel.parts_katz,
        "parts_label_propagation": rel.parts_label_propagation,
        "parts_mis": rel.parts_mis,
        # document/text operators
        "docs_lang_distribution": dq.docs_lang_distribution,
        "docs_token_stats": dq.docs_token_stats,
        "docs_token_percentiles": dq.docs_token_percentiles,
        "docs_token_percentiles_by_lang": dq.docs_token_percentiles_by_lang,
        "docs_quality_scores": dq.docs_quality_scores,
        "docs_langid": dq.docs_langid,
        "docs_sentiment": dq.docs_sentiment,
        "docs_primary_topic": dq.docs_primary_topic,
        "docs_url_canonical": dq.docs_url_canonical,
        "docs_interleaved_roundtrip": dq.docs_interleaved_roundtrip,
        "docs_top_tokens": dq.docs_top_tokens,
        "docs_burstiness": dq.docs_burstiness,
        "emb_lid": dq.emb_lid,
        "emb_snn_components": dq.emb_snn_components,
        "emb_dbscan": dq.emb_dbscan,
        "emb_rptree_recall": dq.emb_rptree_recall,
        "emb_lof": dq.emb_lof,
        "docs_containment": dq.docs_containment,
        "docs_dup_spans": dq.docs_dup_spans,
        "emb_knn_calibration": dq.emb_knn_calibration,
        "docs_fingerprints": dq.docs_fingerprints,         # pinned-table oracle
        "docs_top_per_source": dq.docs_top_per_source,
        "docs_decontaminate": dq.docs_decontaminate,
        "docs_stratified_sample": dq.docs_stratified_sample,
        "docs_write_roundtrip": dq.docs_write_roundtrip,
        "docs_write_exactly_once": dq.docs_write_exactly_once,
        "docs_repetition": dq.docs_repetition,
        "docs_crossdup": dq.docs_crossdup,
        "docs_exact_dedup": dq.docs_exact_dedup,
        "docs_minhash_dedup": dq.docs_minhash_dedup,       # pinned-table oracle
        "docs_ngram_dedup": dq.docs_ngram_dedup,
        "docs_simhash_dedup": dq.docs_simhash_dedup,       # pinned-table oracle
        "docs_ensemble_dedup": dq.docs_ensemble_dedup,     # pinned-table oracle
        "emb_cosine_dedup": dq.emb_cosine_dedup,
        "media_decode": dq.media_decode,
        "media_frames": dq.media_frames,
        "media_resize_decode": dq.media_resize_decode,
        "docs_objection_handlers": dq.docs_objection_handlers,
        "docs_comparison_pairs": dq.docs_comparison_pairs,
        "docs_simhash": dq.docs_simhash,                   # pinned-table oracle
        # similarity search
        "emb_knn": dq.emb_knn,
        "emb_knn_labels": dq.emb_knn_labels,
        "emb_label_centroids": dq.emb_label_centroids,
        "emb_centroid_distances": dq.emb_centroid_distances,
        "emb_rrf": dq.emb_rrf,
        "emb_range_search": dq.emb_range_search,
        "docs_tfidf_top_terms": dq.docs_tfidf_top_terms,
        "docs_pack_blocks": dq.docs_pack_blocks,
        "docs_interleaved_pack": dq.docs_interleaved_pack,
        "emb_kmeans_assign": dq.emb_kmeans_assign,
        "emb_kmeans_iterate": dq.emb_kmeans_iterate,
        "docs_langid_confusion": dq.docs_langid_confusion,
        "docs_lang_centered": dq.docs_lang_centered,
        "docs_percent_rank": dq.docs_percent_rank,
        "docs_ntile": dq.docs_ntile,
        "docs_vector_enrich": dq.docs_vector_enrich,
        "docs_bigram_lift": dq.docs_bigram_lift,
        "docs_rake_keywords": dq.docs_rake_keywords,
        "docs_js_divergence": dq.docs_js_divergence,
        "docs_char_entropy": dq.docs_char_entropy,
        "docs_textrank": dq.docs_textrank,
        "docs_hapax_ratio": dq.docs_hapax_ratio,
        "docs_simpson_diversity": dq.docs_simpson_diversity,
        "docs_rarity_score": dq.docs_rarity_score,
        "docs_interleaved_media_stats": dq.docs_interleaved_media_stats,
        "docs_media_ref_integrity": dq.docs_media_ref_integrity,
        "docs_media_ref_counts": dq.docs_media_ref_counts,
        "docs_inverted_index": dq.docs_inverted_index,
        "docs_mixture_weights": dq.docs_mixture_weights,
        "docs_train_val_test": dq.docs_train_val_test,
        "emb_semdedup": dq.emb_semdedup,
        "docs_epoch_shuffle": dq.docs_epoch_shuffle,
        "docs_quality_classifier": dq.docs_quality_classifier,
        "docs_dsir_weights": dq.docs_dsir_weights,
        "docs_edit_dedup": dq.docs_edit_dedup,
        "docs_lang_vocab_overlap": dq.docs_lang_vocab_overlap,
        "docs_incremental_dedup": dq.docs_incremental_dedup,
        "emb_pq_codes": dq.emb_pq_codes,
        "emb_residual_quantize": dq.emb_residual_quantize,
        "emb_pq_adc_topk": dq.emb_pq_adc_topk,
        "emb_pq_recall": dq.emb_pq_recall,
        "emb_prefix_fidelity": dq.emb_prefix_fidelity,
        "docs_dup_cluster_sizes": dq.docs_dup_cluster_sizes,
        "emb_nn_within_label": dq.emb_nn_within_label,
        "emb_int8_quantize": dq.emb_int8_quantize,
        "emb_isotropy": dq.emb_isotropy,
        "emb_power_iteration": dq.emb_power_iteration,
        "emb_pca_top2": dq.emb_pca_top2,
        "emb_knn_classify": dq.emb_knn_classify,
        "emb_ivf_recall": dq.emb_ivf_recall,
        "emb_mips_topk": dq.emb_mips_topk,
        "docs_pii_scrub": dq.docs_pii_scrub,
        "docs_weighted_sample": dq.docs_weighted_sample,
        "docs_compaction_roundtrip": dq.docs_compaction_roundtrip,
        "docs_minhash_recall": dq.docs_minhash_recall,
        "docs_media_asset_dedup": dq.docs_media_asset_dedup,
        "events_log_compaction": rel.events_log_compaction,
        "docs_training_build": dq.docs_training_build,
        "docs_lm_score": dq.docs_lm_score,
        "emb_hard_negatives": dq.emb_hard_negatives,
        "emb_kcenter": dq.emb_kcenter,
        "events_linreg": rel.events_linreg,
        "events_concurrency": rel.events_concurrency,
        "parts_bfs_levels": rel.parts_bfs_levels,
        "parts_sssp": rel.parts_sssp,
        "orders_ship_calendar": rel.orders_ship_calendar,
        "events_gap_fill": rel.events_gap_fill,
        "docs_phrase_search": dq.docs_phrase_search,
        "emb_random_projection": dq.emb_random_projection,
        "orders_scd2": rel.orders_scd2,
        "docs_gopher_rules": dq.docs_gopher_rules,
        "docs_line_filter": dq.docs_line_filter,
        "docs_line_dedup": dq.docs_line_dedup,
        "emb_hamming_topk": dq.emb_hamming_topk,
        "emb_hamming_recall": dq.emb_hamming_recall,
        "docs_bpe_merges": dq.docs_bpe_merges,
        "docs_bpe_fertility": dq.docs_bpe_fertility,
        "emb_mmr": dq.emb_mmr,
        "docs_bm25": dq.docs_bm25,
        "parts_neighbor_jaccard": rel.parts_neighbor_jaccard,
        "lineitem_manifest_stats": rel.lineitem_manifest_stats,
        "orders_rfm": rel.orders_rfm,
        "docs_zipf_slope": dq.docs_zipf_slope,
        "orders_cohort_retention": rel.orders_cohort_retention,
        "events_bitmap_distinct": rel.events_bitmap_distinct,
        "parts_abc_classes": rel.parts_abc_classes,
        "orders_basket_rules": rel.orders_basket_rules,
        "parts_kcore_peel": rel.parts_kcore_peel,
        "parts_clustering_coeff": rel.parts_clustering_coeff,
        "orders_changepoint": rel.orders_changepoint,
        "parts_mst": rel.parts_mst,
        "events_decayed_counts": rel.events_decayed_counts,
        "events_markov_stationary": rel.events_markov_stationary,
        "events_abtest": rel.events_abtest,
        "events_conversion_lag": rel.events_conversion_lag,
        "events_kaplan_meier": rel.events_kaplan_meier,
        "events_autocorr": rel.events_autocorr,
        "orders_holt_forecast": rel.orders_holt_forecast,
        "orders_theil_sen": rel.orders_theil_sen,
        "orders_rolling_median": rel.orders_rolling_median,
        "events_ks_test": rel.events_ks_test,
        "parts_hits": rel.parts_hits,
        "parts_adamic_adar": rel.parts_adamic_adar,
        "events_welch_ttest": rel.events_welch_ttest,
        "orders_gini": rel.orders_gini,
        "parts_stress_centrality": rel.parts_stress_centrality,
        "parts_xyz_classes": rel.parts_xyz_classes,
        "events_hour_uniformity": rel.events_hour_uniformity,
        "orders_benford": rel.orders_benford,
        "parts_degree_assortativity": rel.parts_degree_assortativity,
        "orders_seasonal_decompose": rel.orders_seasonal_decompose,
        "orders_mode_priority": rel.orders_mode_priority,
        "events_periodogram": rel.events_periodogram,
        "events_burst_detect": rel.events_burst_detect,
        "events_hll_sliding": rel.events_hll_sliding,
        "events_sax_words": rel.events_sax_words,
        "events_value_percentile_cont": rel.events_value_percentile_cont,
        "orders_hill_tail": rel.orders_hill_tail,
        "lineitem_integrity_audit": rel.lineitem_integrity_audit,
        "orders_basket_simjoin": rel.orders_basket_simjoin,
        "orders_fd_audit": rel.orders_fd_audit,
        "events_mann_kendall": rel.events_mann_kendall,
        "parts_four_cycles": rel.parts_four_cycles,
        "parts_rich_club": rel.parts_rich_club,
        "parts_modularity": rel.parts_modularity,
        "events_runs_test": rel.events_runs_test,
        "events_spearman": rel.events_spearman,
        "events_markov_accuracy": rel.events_markov_accuracy,
        "events_f2_sketch": rel.events_f2_sketch,
        "customer_k_anonymity": rel.customer_k_anonymity,
        "lineitem_zone_overlap": rel.lineitem_zone_overlap,
        "parts_ktruss": rel.parts_ktruss,
        "docs_chi2_terms": dq.docs_chi2_terms,
        "events_invalid_transitions": rel.events_invalid_transitions,
        "docs_source_lang_entropy": dq.docs_source_lang_entropy,
        "docs_cdc_chunks": dq.docs_cdc_chunks,
        "docs_vocab_growth": dq.docs_vocab_growth,
        "docs_readability": dq.docs_readability,
        "emb_silhouette": dq.emb_silhouette,
        "docs_charclass_census": dq.docs_charclass_census,
        "docs_media_context": dq.docs_media_context,
        "emb_cluster_stats": dq.emb_cluster_stats,
        "emb_nn_descent": dq.emb_nn_descent,
        # crawl + chunking (non-SQL, rows-only)
        "crawl_fixture": _crawl_fixture_query,
        "crawl_fixture_ordered": _crawl_fixture_ordered_query,
        "crawl_lineage_fixture": _crawl_lineage_query,
        "crawl_robots_fixture": _crawl_robots_fixture_query,
        "crawl_multi_fixture": _crawl_multi_fixture_query,
        "crawl_interleaved_fixture": _crawl_interleaved_fixture_query,
        "crawl_multi_ordered_fixture": _crawl_multi_ordered_query,
        "chunk_documents": _chunk_documents_query,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB) — generated so regex/keyword lists can't drift from
# the Python implementations
# ---------------------------------------------------------------------------


def _sql_quote(s: str) -> str:
    return s.replace("'", "''")


# pinned expected table for non-SQL-expressible per-doc functions
# (tools/gen_pinned_oracles.py) — joined on sha256(text) so any covered
# corpus (sf0.001 / sf0.01 testdata) validates
_PINNED_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "tests", "pinned")
_PINNED = os.path.join(_PINNED_DIR, "doc_expected.parquet")
_PINNED_CRAWL = os.path.join(_PINNED_DIR, "crawl_expected.parquet")
_PINNED_DEDUP = os.path.join(_PINNED_DIR, "dedup_expected.parquet")
_PINNED_CRAWL_MULTI = os.path.join(_PINNED_DIR, "crawl_multi_expected.parquet")
_PINNED_CRAWL_ROBOTS = os.path.join(_PINNED_DIR,
                                    "crawl_robots_expected.parquet")
_PINNED_MEDIA_DECODE = os.path.join(_PINNED_DIR,
                                    "media_decode_expected.parquet")
_PINNED_MST = os.path.join(_PINNED_DIR, "mst_expected.parquet")
_PINNED_MIS = os.path.join(_PINNED_DIR, "mis_expected.parquet")
_PINNED_STRESS = os.path.join(_PINNED_DIR, "stress_expected.parquet")
_PINNED_CRAWL_INTERLEAVED = os.path.join(
    _PINNED_DIR, "crawl_interleaved_expected.parquet")
_PINNED_CRAWL_LINEAGE = os.path.join(
    _PINNED_DIR, "crawl_lineage_expected.parquet")
_PINNED_CRAWL_MULTI_ORDERED = os.path.join(
    _PINNED_DIR, "crawl_multi_ordered_expected.parquet")


def _ktruss_sql(k: int, rounds: int, support: int) -> str:
    """Generated k-truss twin: round i's per-edge triangle support
    (tri/sup/es CTEs over edge set e_i), peel e_{i+1} = es_i filtered at
    s ≥ k−2, survivors report a final recount with dropped_round 0."""
    # AS MATERIALIZED throughout: DuckDB inlines plain CTEs, and each
    # round references the previous edge set FOUR times (tri 3x + es),
    # so an un-materialized chain re-expands the bp self-join
    # multiplicatively — at sf0.1 this spilled >200 GB of DuckDB temp
    # and filled the disk before timing out
    ctes = [f"""bp AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                       FROM lineitem),
            e0 AS MATERIALIZED (SELECT a.p AS u, b.p AS v
                   FROM bp a JOIN bp b ON a.o = b.o AND a.p < b.p
                   GROUP BY 1, 2 HAVING COUNT(*) >= {support})"""]
    for i in range(rounds + 1):
        ctes.append(f"""tri{i} AS MATERIALIZED (SELECT e1.u AS x, e1.v AS y, e2.v AS z
                   FROM e{i} e1
                   JOIN e{i} e2 ON e2.u = e1.u AND e2.v > e1.v
                   JOIN e{i} e3 ON e3.u = e1.v AND e3.v = e2.v),
            sup{i} AS MATERIALIZED (SELECT u, v, COUNT(*) AS s FROM (
                       SELECT x AS u, y AS v FROM tri{i}
                       UNION ALL SELECT x, z FROM tri{i}
                       UNION ALL SELECT y, z FROM tri{i}) GROUP BY 1, 2),
            es{i} AS MATERIALIZED (SELECT e{i}.u, e{i}.v, COALESCE(sup{i}.s, 0) AS s
                      FROM e{i} LEFT JOIN sup{i}
                        ON sup{i}.u = e{i}.u AND sup{i}.v = e{i}.v)""")
        if i < rounds:
            ctes.append(f"""e{i + 1} AS MATERIALIZED (SELECT u, v FROM es{i}
                        WHERE s >= {k - 2})""")
    sel = [f"""SELECT u AS a_id, v AS b_id, CAST(s AS BIGINT) AS support,
                  CAST(0 AS BIGINT) AS dropped_round FROM es{rounds}"""]
    for i in range(rounds):
        sel.append(f"""SELECT u, v, CAST(s AS BIGINT),
                   CAST({i + 1} AS BIGINT)
                   FROM es{i} WHERE s < {k - 2}""")
    return ("WITH " + ",\n".join(ctes) + "\nSELECT * FROM (\n"
            + "\nUNION ALL\n".join(sel)
            + "\n) ORDER BY a_id, b_id")


def _kcenter_sql(k: int) -> str:
    """Unrolled greedy farthest-point CTE chain: level i's candidate is
    the argmin of the running GREATEST-of-rounded-cosines against the
    i centers selected so far (ties → lowest vec_id) — the exact
    contract of ``emb_kcenter``."""
    parts = [
        "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v"
        " FROM embeddings),",
        "c0 AS (SELECT vec_id, v FROM e WHERE vec_id = 0),",
        "m1 AS (SELECT e.vec_id, e.v, ROUND(list_cosine_similarity("
        "e.v, (SELECT v FROM c0)), 6) AS ms FROM e),",
        "c1 AS (SELECT vec_id, v, ms FROM m1 ORDER BY ms, vec_id LIMIT 1)",
    ]
    for i in range(2, k):
        parts.append(
            f", m{i} AS (SELECT m{i-1}.vec_id, m{i-1}.v, GREATEST("
            f"m{i-1}.ms, ROUND(list_cosine_similarity(m{i-1}.v, "
            f"(SELECT v FROM c{i-1})), 6)) AS ms FROM m{i-1})")
        parts.append(
            f", c{i} AS (SELECT vec_id, v, ms FROM m{i} "
            f"ORDER BY ms, vec_id LIMIT 1)")
    sel = ["SELECT CAST(0 AS BIGINT) AS sel_rank, vec_id,"
           " CAST(1.0 AS DOUBLE) AS maxsim FROM c0"]
    sel += [f"UNION ALL SELECT CAST({i} AS BIGINT), vec_id, ms FROM c{i}"
            for i in range(1, k)]
    return ("\n".join(parts) + "\nSELECT * FROM (" + "\n".join(sel)
            + ") ORDER BY sel_rank")


def _pca2_sql(dim: int = 64) -> str:
    """Generated deflated-power-iteration twin of ``emb_pca_top2``:
    v1 = the emb_power_iteration chain (2 iterations, ROUND-6 after each
    normalize), λ1 = ROUND(Σ(x·v1)², 6), then two u iterations of
    w = Cu - λ1·v1·ROUND(v1ᵀu, 6) with the same normalize-then-ROUND
    contract.  Every inter-step scalar/vector is rounded exactly where
    the engine rounds."""
    r = range(dim)

    def vsel(src: str, dst: str) -> str:
        return ", ".join(
            f"CASE WHEN nrm = 0 THEN 0.0 ELSE ROUND({src}{i} / nrm, 6) END"
            f" AS {dst}{i}" for i in r)

    def sq(p: str) -> str:
        return " + ".join(f"{p}{i}*{p}{i}" for i in r)

    parts = [
        "WITH w1 AS (SELECT "
        + ", ".join(f"SUM(CAST(e.embedding[{i + 1}] AS DOUBLE)"
                    f" * CAST(e.embedding[1] AS DOUBLE)) AS w{i}"
                    for i in r)
        + " FROM embeddings e),",
        f"n1 AS (SELECT sqrt({sq('w')}) AS nrm, * FROM w1),",
        f"v1 AS (SELECT {vsel('w', 'a')} FROM n1),",
        "d1 AS (SELECT e.vec_id, ("
        + " + ".join(f"CAST(e.embedding[{i + 1}] AS DOUBLE) * v1.a{i}"
                     for i in r)
        + ") AS dot1 FROM embeddings e CROSS JOIN v1),",
        "w2 AS (SELECT "
        + ", ".join(f"SUM(CAST(e.embedding[{i + 1}] AS DOUBLE)"
                    f" * d1.dot1) AS u{i}" for i in r)
        + " FROM embeddings e JOIN d1 USING (vec_id)),",
        f"n2 AS (SELECT sqrt({sq('u')}) AS nrm, * FROM w2),",
        f"vf AS (SELECT {vsel('u', 'f')} FROM n2),",
        "dl AS (SELECT ("
        + " + ".join(f"CAST(e.embedding[{i + 1}] AS DOUBLE) * vf.f{i}"
                     for i in r)
        + ") AS dv FROM embeddings e CROSS JOIN vf),",
        "lam AS (SELECT ROUND(SUM(dv * dv), 6) AS l FROM dl),",
        # u iteration 1: u0 = e1 → Cu0 column, deflate by l·f·ROUND(f1,6)
        "t1 AS (SELECT "
        + ", ".join(f"SUM(CAST(e.embedding[{i + 1}] AS DOUBLE)"
                    f" * CAST(e.embedding[2] AS DOUBLE)) AS g{i}"
                    for i in r)
        + " FROM embeddings e),",
        "y1 AS (SELECT "
        + ", ".join(f"g{i} - lam.l * vf.f{i} * ROUND(vf.f1, 6) AS y{i}"
                    for i in r)
        + " FROM t1 CROSS JOIN vf CROSS JOIN lam),",
        f"m1 AS (SELECT sqrt({sq('y')}) AS nrm, * FROM y1),",
        f"u1 AS (SELECT {vsel('y', 'p')} FROM m1),",
        # u iteration 2
        "du AS (SELECT e.vec_id, ("
        + " + ".join(f"CAST(e.embedding[{i + 1}] AS DOUBLE) * u1.p{i}"
                     for i in r)
        + ") AS dotu FROM embeddings e CROSS JOIN u1),",
        "t2 AS (SELECT "
        + ", ".join(f"SUM(CAST(e.embedding[{i + 1}] AS DOUBLE)"
                    f" * du.dotu) AS h{i}" for i in r)
        + " FROM embeddings e JOIN du USING (vec_id)),",
        "dv2 AS (SELECT ROUND("
        + " + ".join(f"vf.f{i} * u1.p{i}" for i in r)
        + ", 6) AS d FROM vf CROSS JOIN u1),",
        "y2 AS (SELECT "
        + ", ".join(f"h{i} - lam.l * vf.f{i} * dv2.d AS q{i}" for i in r)
        + " FROM t2 CROSS JOIN vf CROSS JOIN lam CROSS JOIN dv2),",
        f"m2 AS (SELECT sqrt({sq('q')}) AS nrm, * FROM y2),",
        f"uf AS (SELECT {vsel('q', 'z')} FROM m2)",
        f"SELECT UNNEST(RANGE(0, {dim})) AS dim,",
        "UNNEST([" + ", ".join(f"f{i}" for i in r) + "]) AS loading1,",
        "UNNEST([" + ", ".join(f"z{i}" for i in r) + "]) AS loading2",
        "FROM vf CROSS JOIN uf",
    ]
    return "\n".join(parts)


def _random_projection_sql(n_out: int = 16, dim: int = 64) -> str:
    """Generated ±1-projection twin: one UNION ALL branch per output dim,
    each a left-to-right sum in input-dim order (the association order the
    engine reproduces with its sequential accumulate)."""
    from ai_intel_web_scraper_ray.pipelines.docqueries import _rp_sign

    branches = []
    for j in range(n_out):
        terms = " + ".join(
            f"({_rp_sign(i, j)}) * CAST(embedding[{i + 1}] AS DOUBLE)"
            for i in range(dim))
        branches.append(
            f"SELECT vec_id, CAST({j} AS BIGINT) AS dim, "
            f"ROUND({terms}, 6) AS value FROM embeddings")
    return ("SELECT * FROM (" + " UNION ALL ".join(branches)
            + ") ORDER BY vec_id, dim")


def _rptree_sql(k: int = 10, mod: int = 3, n_queries: int = 8,
                dim: int = 64) -> str:
    """Generated RP-tree recall twin: the three pinned ±1 projections as
    left-to-right sums (the emb_random_projection association order),
    quantile_disc median splits per node, leaf-restricted vs exact
    cosine top-k compared per query."""
    from ai_intel_web_scraper_ray.pipelines.docqueries import _rpt_sign

    def proj(node: int) -> str:
        return " + ".join(
            f"({_rpt_sign(i, node)}) * CAST(embedding[{i + 1}] AS DOUBLE)"
            for i in range(dim))

    return f"""
        WITH p AS (SELECT vec_id,
                          ROUND({proj(0)}, 6) AS p0,
                          ROUND({proj(1)}, 6) AS p1,
                          ROUND({proj(2)}, 6) AS p2
                   FROM embeddings),
        t0 AS (SELECT quantile_disc(p0, 0.5) AS t FROM p),
        s AS (SELECT p.*, CASE WHEN p.p0 > t0.t THEN 1 ELSE 0 END AS s0
              FROM p CROSS JOIN t0),
        t1 AS (SELECT quantile_disc(p1, 0.5) AS t FROM s WHERE s0 = 0),
        t2 AS (SELECT quantile_disc(p2, 0.5) AS t FROM s WHERE s0 = 1),
        leaf AS (SELECT s.vec_id,
                        CASE WHEN s0 = 0
                             THEN CASE WHEN s.p1 > t1.t THEN 1 ELSE 0 END
                             ELSE 2 + CASE WHEN s.p2 > t2.t
                                           THEN 1 ELSE 0 END
                        END AS lf
                 FROM s CROSS JOIN t1 CROSS JOIN t2),
        kkv AS (SELECT LEAST({k}, COUNT(*) - 1) AS kk FROM embeddings),
        q AS (SELECT vec_id AS qid FROM embeddings
              WHERE vec_id % {mod} = 0 ORDER BY vec_id LIMIT {n_queries}),
        cs AS (SELECT q.qid, e2.vec_id AS cand,
                      ROUND(list_cosine_similarity(
                          CAST(e1.embedding AS DOUBLE[]),
                          CAST(e2.embedding AS DOUBLE[])), 6) AS c
               FROM q JOIN embeddings e1 ON e1.vec_id = q.qid
                      JOIN embeddings e2 ON e2.vec_id <> q.qid),
        ex AS (SELECT qid, cand,
                      ROW_NUMBER() OVER (PARTITION BY qid
                                         ORDER BY c DESC, cand) AS rn
               FROM cs),
        exact_k AS (SELECT qid, cand FROM ex CROSS JOIN kkv
                    WHERE rn <= kk),
        ann0 AS (SELECT cs.qid, cs.cand, cs.c
                 FROM cs JOIN leaf lq ON lq.vec_id = cs.qid
                        JOIN leaf lc ON lc.vec_id = cs.cand
                                     AND lc.lf = lq.lf),
        annr AS (SELECT qid, cand,
                        ROW_NUMBER() OVER (PARTITION BY qid
                                           ORDER BY c DESC, cand) AS rn
                 FROM ann0),
        ann AS (SELECT qid, cand FROM annr CROSS JOIN kkv
                WHERE rn <= kk),
        hit AS (SELECT e.qid, COUNT(*) AS nh
                FROM exact_k e JOIN ann a USING (qid, cand) GROUP BY 1),
        ls AS (SELECT lf, COUNT(*) AS n FROM leaf GROUP BY 1)
        SELECT q.qid,
               CAST(lq.lf AS BIGINT) AS leaf_id,
               CAST(ls.n - 1 AS BIGINT) AS n_leaf,
               CAST(COALESCE(hit.nh, 0) AS BIGINT) AS n_hit,
               CAST(COALESCE(hit.nh, 0) * 1000000 // kkv.kk AS BIGINT)
                   AS recall_ppm
        FROM q JOIN leaf lq ON lq.vec_id = q.qid
               JOIN ls ON ls.lf = lq.lf
               LEFT JOIN hit ON hit.qid = q.qid
               CROSS JOIN kkv
        ORDER BY q.qid
    """


def _sentiment_sql() -> str:
    from ai_intel_web_scraper_ray.functions.sentiment import (
        NEGATIVE_SIGNALS,
        POSITIVE_SIGNALS,
    )

    neg = " + ".join(
        f"(CASE WHEN lower(text) LIKE '%{_sql_quote(s)}%' THEN 1 ELSE 0 END)"
        for s in NEGATIVE_SIGNALS
    )
    pos = " + ".join(
        f"(CASE WHEN lower(text) LIKE '%{_sql_quote(s)}%' THEN 1 ELSE 0 END)"
        for s in POSITIVE_SIGNALS
    )
    return f"""
        WITH scored AS (
            SELECT ({neg}) AS neg, ({pos}) AS pos FROM documents
        )
        SELECT CASE
                 WHEN neg > pos + 1 THEN 'negative'
                 WHEN pos > neg + 1 THEN 'positive'
                 WHEN neg > 0 AND pos > 0 THEN 'mixed'
                 ELSE 'neutral'
               END AS sentiment,
               COUNT(*) AS n
        FROM scored GROUP BY 1 ORDER BY 1
    """


def _langid_sql(confusion: bool = False) -> str:
    from ai_intel_web_scraper_ray.functions.langid import LANG_STOPWORDS

    score_cols = []
    for lang, words in LANG_STOPWORDS:
        pat = r"\b(?:" + "|".join(words) + r")\b"
        score_cols.append(f"len(regexp_extract_all(lower(text), '{pat}')) AS s_{lang}")
    langs = [lang for lang, _ in LANG_STOPWORDS]
    branches = []
    for i, lang in enumerate(langs):
        conds = [f"s_{lang} > 0"]
        conds += [f"s_{lang} >= s_{other}" for other in langs if other != lang]
        branches.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    case = "CASE " + " ".join(branches) + " ELSE 'und' END"
    if confusion:
        return f"""
            WITH scored AS (SELECT lang, {", ".join(score_cols)}
                            FROM documents)
            SELECT lang, {case} AS pred_lang, COUNT(*) AS n
            FROM scored GROUP BY 1, 2 ORDER BY 1, 2
        """
    return f"""
        WITH scored AS (SELECT {", ".join(score_cols)} FROM documents)
        SELECT {case} AS pred_lang, COUNT(*) AS n
        FROM scored GROUP BY 1 ORDER BY 1
    """


def _primary_topic_sql() -> str:
    from ai_intel_web_scraper_ray.functions.tagging import DEFAULT_TOPIC_KEYWORDS

    topics = list(DEFAULT_TOPIC_KEYWORDS.keys())
    score_cols = []
    for t in topics:
        terms = []
        for kw in DEFAULT_TOPIC_KEYWORDS[t]:
            w = 2 + kw.count(" ")
            pat = r"\b" + kw.lower() + r"\b"
            terms.append(f"{w} * len(regexp_extract_all(lower(text), '{_sql_quote(pat)}'))")
        score_cols.append(f"({' + '.join(terms)}) AS s_{t}")
    branches = []
    for t in topics:
        conds = [f"s_{t} > 0"] + [f"s_{t} >= s_{o}" for o in topics if o != t]
        branches.append(f"WHEN {' AND '.join(conds)} THEN '{t}'")
    case = "CASE " + " ".join(branches) + " ELSE 'unclassified' END"
    return f"""
        WITH scored AS (SELECT {", ".join(score_cols)} FROM documents)
        SELECT {case} AS primary_topic, COUNT(*) AS n
        FROM scored GROUP BY 1 ORDER BY 1
    """


def _pq_dist_sql(s: int, sub: int = 16, lhs: str = "e.embedding") -> str:
    """Squared-L2 distance over subspace ``s`` (dims s*16+1 .. s*16+16,
    1-indexed), matching emb_pq_codes' float contract."""
    return " + ".join(
        f"(CAST({lhs}[{i + 1}] AS DOUBLE) - cb.ce[{i + 1}])"
        f" * (CAST({lhs}[{i + 1}] AS DOUBLE) - cb.ce[{i + 1}])"
        for i in range(s * sub, (s + 1) * sub))


def _rq2_dist_sql(dims: int = 64) -> str:
    """Level-2 residual-quantization distance: squared L2 between the
    vector's level-1 residual (e − its centroid a1e) and a residual-
    codebook entry (cb2 − its own centroid a1b) — the emb_residual_quantize
    float contract."""
    return " + ".join(
        f"((CAST(e.embedding[{i + 1}] AS DOUBLE) - a1e.ce[{i + 1}])"
        f" - (cb2.ce[{i + 1}] - a1b.ce[{i + 1}]))"
        f" * ((CAST(e.embedding[{i + 1}] AS DOUBLE) - a1e.ce[{i + 1}])"
        f" - (cb2.ce[{i + 1}] - a1b.ce[{i + 1}]))"
        for i in range(dims))


def _emb_dot_sql(a: str, b: str, dims: int = 64) -> str:
    """Left-to-right 64-term dot product (matches the engine's strictly
    dim-ordered accumulation — the emb_power_iteration contract)."""
    return " + ".join(f"{a}[{i + 1}]*{b}[{i + 1}]" for i in range(dims))


def _hamming_sql(k: int = 10, dims: int = 64) -> str:
    """Sign-code Hamming top-k twin of docqueries.emb_hamming_topk."""
    terms = " + ".join(
        f"(CASE WHEN (e.embedding[{i + 1}] >= 0) <> (q.qe[{i + 1}] >= 0)"
        f" THEN 1 ELSE 0 END)" for i in range(dims))
    return f"""
        WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY ham, vec_id) AS BIGINT)
                   AS rank,
               vec_id, CAST(ham AS BIGINT) AS hamming
        FROM (SELECT e.vec_id, ({terms}) AS ham
              FROM embeddings e CROSS JOIN q)
        ORDER BY ham, vec_id LIMIT {k}
    """


def _hamming_recall_sql(k: int = 10, n_queries: int = 8,
                        dims: int = 64) -> str:
    """Recall@k of sign-code Hamming top-k vs exact cosine top-k — twin
    of docqueries.emb_hamming_recall (query excluded from both sets;
    ties break by vec_id in both rankings)."""
    terms = " + ".join(
        f"(CASE WHEN (e.embedding[{i + 1}] >= 0) <> (q.qe[{i + 1}] >= 0)"
        f" THEN 1 ELSE 0 END)" for i in range(dims))
    return f"""
        WITH q AS (
          SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
          FROM embeddings WHERE vec_id < {n_queries}
        ), ham AS (
          SELECT q.qid, e.vec_id AS vid, ({terms}) AS hd
          FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.qid
        ), htop AS (
          SELECT qid, vid FROM (
            SELECT qid, vid,
                   ROW_NUMBER() OVER (PARTITION BY qid
                                      ORDER BY hd, vid) AS rn
            FROM ham) WHERE rn <= {k}
        ), cs AS (
          SELECT q.qid, e.vec_id AS vid,
                 list_cosine_similarity(
                     CAST(e.embedding AS DOUBLE[]), q.qe) AS s
          FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.qid
        ), ctop AS (
          SELECT qid, vid FROM (
            SELECT qid, vid,
                   ROW_NUMBER() OVER (PARTITION BY qid
                                      ORDER BY s DESC, vid) AS rn
            FROM cs) WHERE rn <= {k}
        )
        SELECT c.qid AS query_vec_id,
               CAST(SUM(CASE WHEN h.vid IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_hits,
               CAST(SUM(CASE WHEN h.vid IS NOT NULL THEN 1 ELSE 0 END)
                    * 1000000 // {k} AS BIGINT) AS recall_ppm
        FROM ctop c LEFT JOIN htop h ON h.qid = c.qid AND h.vid = c.vid
        GROUP BY c.qid ORDER BY query_vec_id
    """


def _mmr_sql(k: int = 5, dims: int = 64) -> str:
    """Iterative MMR twin of docqueries.emb_mmr: one (pick, sel, sims)
    CTE triple per round; cosine is dot/(n_sel * n_cand) with
    left-to-right sums exactly as the engine computes it."""
    sq = _emb_dot_sql("e.embedding", "e.embedding", dims)
    sqb = _emb_dot_sql("b.embedding", "b.embedding", dims)
    parts = [f"""WITH qn AS (
  SELECT embedding AS qe, sqrt({_emb_dot_sql('embedding', 'embedding', dims)}) AS nq
  FROM embeddings WHERE vec_id = 0
), base AS (
  SELECT e.vec_id, e.embedding, sqrt({sq}) AS nrm,
         ({_emb_dot_sql('e.embedding', 'qn.qe', dims)}) / (qn.nq * sqrt({sq})) AS rel
  FROM embeddings e CROSS JOIN qn
  WHERE e.vec_id <> 0
)"""]
    for r in range(1, k + 1):
        if r == 1:
            score, excl, joins = "ROUND(0.5*rel, 6)", "", ""
        else:
            greatest = ", ".join(f"sim_{j}" for j in range(1, r))
            score = (f"ROUND(0.5*rel - 0.5*GREATEST({greatest}), 6)"
                     if r > 2 else "ROUND(0.5*rel - 0.5*sim_1, 6)")
            excl = "WHERE " + " AND ".join(
                f"b.vec_id <> (SELECT vec_id FROM pick_{j})"
                for j in range(1, r))
            joins = " ".join(
                f"JOIN sims_{j} USING (vec_id)" for j in range(1, r))
        parts.append(f""", pick_{r} AS (
  SELECT b.vec_id, {score} AS score
  FROM base b {joins}
  {excl}
  ORDER BY score DESC, b.vec_id LIMIT 1
), sel_{r} AS (
  SELECT b.vec_id, b.embedding, b.nrm FROM base b
  WHERE b.vec_id = (SELECT vec_id FROM pick_{r})
), sims_{r} AS (
  SELECT b.vec_id,
         ({_emb_dot_sql('b.embedding', 's.embedding', dims)}) / (s.nrm * b.nrm) AS sim_{r}
  FROM base b CROSS JOIN sel_{r} s
)""")
    union = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS BIGINT) AS round, vec_id, score FROM pick_{r}"
        for r in range(1, k + 1))
    parts.append(f"\n{union}\nORDER BY round")
    return "".join(parts)


def _sssp_sql(rounds: int = 3) -> str:
    """Hop-bounded Bellman-Ford twin of relational.parts_sssp: the
    relax-then-min round is generated once per hop; integer edge costs
    make every round's min tie-free."""
    parts = ["""
        WITH dedup AS MATERIALIZED (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ), pairs AS MATERIALIZED (
            SELECT a.l_partkey AS x, b.l_partkey AS y, COUNT(*) AS n
            FROM dedup a JOIN dedup b
              ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
            GROUP BY x, y HAVING COUNT(*) >= 2
        ), e AS MATERIALIZED (
            SELECT x AS src, y AS dst, 1000000 // n AS w FROM pairs
            UNION ALL
            SELECT y, x, 1000000 // n FROM pairs
        ), d0 AS MATERIALIZED (
            SELECT MIN(src) AS node, CAST(0 AS BIGINT) AS cost FROM e
            HAVING COUNT(*) > 0
        )"""]
    for r in range(1, rounds + 1):
        parts.append(f""", d{r} AS MATERIALIZED (
            SELECT node, MIN(cost) AS cost FROM (
                SELECT node, cost FROM d{r - 1}
                UNION ALL
                SELECT e.dst AS node, d.cost + e.w AS cost
                FROM d{r - 1} d JOIN e ON e.src = d.node
            ) GROUP BY node
        )""")
    parts.append(f"""
        SELECT node AS l_partkey, CAST(cost AS BIGINT) AS cost
        FROM d{rounds} ORDER BY node
    """)
    return "".join(parts)


def _bpe_sql(rounds: int = 5) -> str:
    """Generated BPE-training twin of docqueries.docs_bpe_merges: one
    (pair-count, winner, apply) CTE triple per round.  Both sides merge
    via leftmost-nonoverlapping replace over sentinel-wrapped symbols
    (chr(1)/chr(2) wrappers share no characters between adjacent
    matches), so SQL ``replace`` is bit-identical to the engine's
    str.replace merge rule."""
    parts = [r"""WITH w0 AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS n FROM (
    SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS word
    FROM documents) GROUP BY word
), v0 AS (
  SELECT chr(1) || list_aggregate(string_split(word, ''), 'string_agg',
                                  chr(2) || chr(1)) || chr(2) AS sym, n
  FROM w0
)"""]
    for r in range(1, rounds + 1):
        parts.append(f""", p{r} AS (
  SELECT pair, SUM(n) AS cnt FROM (
    SELECT unnest(list_transform(range(1, len(l)),
                                 i -> l[i] || chr(3) || l[i+1])) AS pair, n
    FROM (SELECT string_split(substr(sym, 2, length(sym) - 2),
                              chr(2) || chr(1)) AS l, n FROM v{r - 1}))
  GROUP BY pair
), win{r} AS (
  SELECT pair, cnt FROM p{r} ORDER BY cnt DESC, pair LIMIT 1
), v{r} AS (
  SELECT replace(v.sym,
                 chr(1) || string_split(w.pair, chr(3))[1] || chr(2) ||
                 chr(1) || string_split(w.pair, chr(3))[2] || chr(2),
                 chr(1) || string_split(w.pair, chr(3))[1] ||
                 string_split(w.pair, chr(3))[2] || chr(2)) AS sym, v.n
  FROM v{r - 1} v CROSS JOIN win{r} w
)""")
    union = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS BIGINT) AS round, "
        f"string_split(pair, chr(3))[1] AS s1, "
        f"string_split(pair, chr(3))[2] AS s2, "
        f"CAST(cnt AS BIGINT) AS n FROM win{r}"
        for r in range(1, rounds + 1))
    parts.append(f"\n{union}\nORDER BY round")
    return "".join(parts)


def _bpe_fertility_sql(rounds: int = 5) -> str:
    """Generated twin of docqueries.docs_bpe_fertility: the _bpe_sql
    training chain (w0/v0, p/win/v per round), then the learned merges
    replay over each (lang, word) with LEFT JOIN ON TRUE so an EMPTY
    win{r} (degenerate corpus ran out of pairs) leaves symbols
    untouched instead of emptying the chain; symbol count = number of
    chr(1) wrappers."""
    parts = [r"""WITH w0 AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS n FROM (
    SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS word
    FROM documents) GROUP BY word
), v0 AS (
  SELECT chr(1) || list_aggregate(string_split(word, ''), 'string_agg',
                                  chr(2) || chr(1)) || chr(2) AS sym, n
  FROM w0
)"""]
    for r in range(1, rounds + 1):
        parts.append(f""", p{r} AS (
  SELECT pair, SUM(n) AS cnt FROM (
    SELECT unnest(list_transform(range(1, len(l)),
                                 i -> l[i] || chr(3) || l[i+1])) AS pair, n
    FROM (SELECT string_split(substr(sym, 2, length(sym) - 2),
                              chr(2) || chr(1)) AS l, n FROM v{r - 1}))
  GROUP BY pair
), win{r} AS (
  SELECT pair, cnt FROM p{r} ORDER BY cnt DESC, pair LIMIT 1
), v{r} AS (
  SELECT replace(v.sym,
                 chr(1) || string_split(w.pair, chr(3))[1] || chr(2) ||
                 chr(1) || string_split(w.pair, chr(3))[2] || chr(2),
                 chr(1) || string_split(w.pair, chr(3))[1] ||
                 string_split(w.pair, chr(3))[2] || chr(2)) AS sym, v.n
  FROM v{r - 1} v CROSS JOIN win{r} w
)""")
    parts.append(r""", wl AS (
  SELECT lang, word, CAST(COUNT(*) AS BIGINT) AS n FROM (
    SELECT lang, unnest(regexp_extract_all(lower(text), '[a-z0-9_]+'))
        AS word
    FROM documents) GROUP BY lang, word
), u0 AS (
  SELECT lang, n, chr(1) || list_aggregate(string_split(word, ''),
             'string_agg', chr(2) || chr(1)) || chr(2) AS sym
  FROM wl
)""")
    for r in range(1, rounds + 1):
        parts.append(f""", u{r} AS (
  SELECT u.lang, u.n,
         CASE WHEN w.pair IS NULL THEN u.sym
              ELSE replace(u.sym,
                 chr(1) || string_split(w.pair, chr(3))[1] || chr(2) ||
                 chr(1) || string_split(w.pair, chr(3))[2] || chr(2),
                 chr(1) || string_split(w.pair, chr(3))[1] ||
                 string_split(w.pair, chr(3))[2] || chr(2))
         END AS sym
  FROM u{r - 1} u LEFT JOIN win{r} w ON TRUE
)""")
    parts.append(f"""
SELECT lang, CAST(SUM(n) AS BIGINT) AS n_word_tokens,
       CAST(SUM(n * (length(sym) - length(replace(sym, chr(1), ''))))
            AS BIGINT) AS n_bpe_tokens,
       CAST(SUM(n * (length(sym) - length(replace(sym, chr(1), ''))))
            * 1000000 // SUM(n) AS BIGINT) AS fertility_ppm
FROM u{rounds} GROUP BY lang ORDER BY lang""")
    return "".join(parts)


def _pq_recall_sql(k: int = 10, n_sub: int = 4, sub: int = 16) -> str:
    """Recall@k of PQ/ADC vs exact L2 for query vec 0 — twin of
    docqueries.emb_pq_recall.  Codes, LUT and the ADC sum reuse the
    emb_pq_adc_topk contract verbatim; the exact leg is the 64-term
    subspace-ordered distance chain ROUND(D0+D1+D2+D3, 6); the query is
    excluded from both candidate sets and ties break by vec_id."""
    d = [_pq_dist_sql(s) for s in range(n_sub)]
    lq = [_pq_dist_sql(s, lhs="q.qe") for s in range(n_sub)]
    ex = [_pq_dist_sql(s, lhs="e.embedding")
          .replace("cb.ce", "q.qe") for s in range(n_sub)]
    a_ctes = ",\n            ".join(
        f"""a{s} AS (SELECT vec_id, cid FROM (
                SELECT vec_id, cid, ROW_NUMBER() OVER (
                    PARTITION BY vec_id ORDER BY d{s}, cid) AS rn FROM d)
                WHERE rn = 1)""" for s in range(n_sub))
    return f"""
            WITH cb AS (
                SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS ce
                FROM embeddings WHERE vec_id < 8
            ), q AS (
                SELECT CAST(embedding AS DOUBLE[]) AS qe
                FROM embeddings WHERE vec_id = 0
            ), lut AS (
                SELECT cb.cid,
                       ROUND({lq[0]}, 6) AS l0, ROUND({lq[1]}, 6) AS l1,
                       ROUND({lq[2]}, 6) AS l2, ROUND({lq[3]}, 6) AS l3
                FROM cb CROSS JOIN q
            ), d AS (
                SELECT e.vec_id, cb.cid,
                       ROUND({d[0]}, 6) AS d0, ROUND({d[1]}, 6) AS d1,
                       ROUND({d[2]}, 6) AS d2, ROUND({d[3]}, 6) AS d3
                FROM embeddings e CROSS JOIN cb
            ), {a_ctes},
            adcs AS (
                SELECT a0.vec_id,
                       ROUND(l0.l0 + l1.l1 + l2.l2 + l3.l3, 6) AS adc
                FROM a0 JOIN a1 USING (vec_id) JOIN a2 USING (vec_id)
                        JOIN a3 USING (vec_id)
                     JOIN lut l0 ON l0.cid = a0.cid
                     JOIN lut l1 ON l1.cid = a1.cid
                     JOIN lut l2 ON l2.cid = a2.cid
                     JOIN lut l3 ON l3.cid = a3.cid
                WHERE a0.vec_id <> 0
            ), approx AS (
                SELECT vec_id FROM adcs ORDER BY adc, vec_id LIMIT {k}
            ), ex AS (
                SELECT e.vec_id,
                       ROUND({ex[0]} + {ex[1]} + {ex[2]} + {ex[3]}, 6)
                           AS dist
                FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0
            ), exact10 AS (
                SELECT vec_id FROM ex ORDER BY dist, vec_id LIMIT {k}
            ), hits AS (
                SELECT CAST(COUNT(*) AS BIGINT) AS h
                FROM approx JOIN exact10 USING (vec_id)
            )
            SELECT CAST(0 AS BIGINT) AS query_vec_id, h AS n_hits,
                   CAST(h * 1000000 // {k} AS BIGINT) AS recall_ppm
            FROM hits
    """


def _bm25_sql(k: int = 20) -> str:
    """Okapi BM25 twin of docqueries.docs_bm25 — term order, association
    order and the k1/b literals mirror the engine expression exactly."""
    from ai_intel_web_scraper_ray.pipelines.docqueries import BM25_TERMS

    terms = list(BM25_TERMS)
    tf_cols = ",\n                   ".join(
        f"SUM(CASE WHEN word = '{t}' THEN 1 ELSE 0 END) AS tf_{t}"
        for t in terms)
    df_sel = ",\n                   ".join(
        f"SUM(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS df_{t}"
        for t in terms)
    score_terms = " + ".join(
        f"LN((g.n_docs - g.df_{t} + 0.5) / (g.df_{t} + 0.5) + 1.0)"
        f" * (d.tf_{t} * 2.2)"
        f" / (d.tf_{t} + 1.2 * (0.25 + 0.75 * d.dl / g.avgdl))"
        for t in terms)
    return f"""
        WITH w AS (
          SELECT doc_id, unnest(string_split(text,' ')) AS word
          FROM documents
        ), d AS (
          SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS dl,
                   {tf_cols}
          FROM w GROUP BY doc_id
        ), g AS (
          SELECT COUNT(*) AS n_docs, SUM(dl)/COUNT(*) AS avgdl,
                   {df_sel}
          FROM d
        )
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id)
                    AS BIGINT) AS rank,
               doc_id, score
        FROM (SELECT d.doc_id, ROUND({score_terms}, 6) AS score
              FROM d CROSS JOIN g)
        ORDER BY score DESC, doc_id LIMIT {k}
    """


def _periodogram_sql(periods=(8, 12, 24, 168)) -> str:
    """Generated twin for events_periodogram: the integer micro cos/sin
    tables are recomputed here (math.cos/sin + Python round), independent
    of the engine's table builder."""
    import math

    rows = []
    for p in periods:
        for k in range(p):
            c = round(math.cos(2 * math.pi * k / p) * 1_000_000)
            s = round(math.sin(2 * math.pi * k / p) * 1_000_000)
            rows.append(f"({p},{k},{c},{s})")
    vals = ",".join(rows)
    return f"""
        WITH hours AS (
            SELECT epoch_us(ts) // 3600000000 AS h,
                   CAST(COUNT(*) AS HUGEINT) AS n
            FROM events GROUP BY 1
        ), tab(period, k, c, s) AS (VALUES {vals}),
        terms AS (
            SELECT tab.period,
                   SUM(n * tab.c) AS sc, SUM(n * tab.s) AS ss
            FROM hours JOIN tab ON (hours.h % tab.period) = tab.k
            GROUP BY tab.period
        ), pw AS (
            SELECT period, sc * sc + ss * ss AS power FROM terms
        )
        SELECT CAST(period AS BIGINT) AS period,
               CAST(CASE WHEN (SELECT SUM(power) FROM pw) = 0 THEN 0
                    ELSE power * 1000000 // (SELECT SUM(power) FROM pw)
                    END AS BIGINT) AS power_ppm
        FROM pw ORDER BY period
    """


def oracle_sql() -> dict[str, str]:
    from ai_intel_web_scraper_ray.pipelines import docqueries as dq
    from ai_intel_web_scraper_ray.functions.quality import QUALITY_STOPWORDS
    from ai_intel_web_scraper_ray.functions.tokenizer import TOKEN_PATTERN
    from ai_intel_web_scraper_ray.pipelines.docqueries import (
        PII_EMAIL_RE as _PII_EMAIL,
        PII_IP_RE as _PII_IP,
        PII_PHONE_RE as _PII_PHONE,
    )
    from ai_intel_web_scraper_ray.pipelines.relational import (
        SESSION_GAP_MIN,
        _CEP_WINDOW_MIN,
        _FD_CANDIDATES,
        _KTRUSS_K,
        _KTRUSS_ROUNDS,
        _KTRUSS_SUPPORT,
        _SIMJOIN_TAU,
    )

    from ai_intel_web_scraper_ray.stages.multimodal import (
        DEFAULT_FRAMES_PER_VIDEO as _MM_FRAMES,
        DEFAULT_PAYLOAD_BYTES as _MM_PAYLOAD,
        DEFAULT_RESIZE_H as _MM_RH,
        DEFAULT_RESIZE_W as _MM_RW,
    )

    # media twin constants DERIVED from the stage defaults (advisor r3) so
    # engine and oracle cannot drift: frame slice = payload/frames; every
    # slice/pixel-buffer is a whole number of 32-byte sha256 digest tiles
    # (the pure-SQL twins rely on that alignment — assert it here rather
    # than fail later with an opaque hash mismatch)
    _mm_frame_bytes = _MM_PAYLOAD // _MM_FRAMES
    _mm_frame_tiles = _mm_frame_bytes // 32
    _mm_resize_tiles = _MM_RW * _MM_RH * 3 // 32
    assert _MM_PAYLOAD % _MM_FRAMES == 0 and _mm_frame_bytes % 32 == 0, \
        "frame-sample SQL twin needs digest-aligned frame slices"
    assert (_MM_RW * _MM_RH * 3) % 32 == 0, \
        "resize SQL twin needs a digest-aligned pixel buffer"

    # objection-generator twin pieces, DERIVED from the generate-module
    # constants (same no-drift rule as the media twins): the SQL rebuilds
    # the exact prompt the engine assembles, so template or clip changes
    # propagate to both sides.  The digest-slice handler fields below pin
    # the stub_llm_objections contract (sha256-hex slices of the prompt).
    from ai_intel_web_scraper_ray.pipelines.generate import (
        DEFAULT_MAX_SOURCE_TOKENS as _GEN_MAXTOK,
        NO_SOURCES as _GEN_NOSRC,
        OBJECTION_TEMPLATE as _GEN_OBJ_T,
        OBJECTION_TEXT_CLIP as _GEN_CLIP,
        SOURCE_ENTRY_TEMPLATE as _GEN_ENTRY_T,
    )

    def _sqlq(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    _ge1, _rest = _GEN_ENTRY_T.split("{source_type}")
    _ge2, _rest = _rest.split("{title}")
    _ge3, _rest = _rest.split("{url}")
    _ge4, _ge5 = _rest.split("{text}")
    # entry for a documents-derived record: source_type 'official_docs',
    # title 'Doc {id}', url 'https://testdata.example/{source}/{id}'
    # (mirrors docqueries.docs_objection_handlers's adapt map)
    _gen_entry_sql = (
        f"{_sqlq(_ge1)} || 'official_docs' || {_sqlq(_ge2)} || 'Doc ' || "
        f"CAST(doc_id AS VARCHAR) || {_sqlq(_ge3)} || "
        f"'https://testdata.example/' || source || '/' || "
        f"CAST(doc_id AS VARCHAR) || {_sqlq(_ge4)} || "
        f"substr(text, 1, {_GEN_CLIP}) || {_sqlq(_ge5)}")
    _go1, _rest = _GEN_OBJ_T.split("{competitor_name}")
    _go2, _rest = _rest.split("{kx_sources}")
    _go3, _go4 = _rest.split("{competitor_sources}")
    _gen_max_chars = _GEN_MAXTOK * 3

    # comparison-pairing twin constants, DERIVED from the engine modules
    # (same no-drift rule): char budget + truncation marker.  The cred
    # cycle is asserted rank-aligned so the twin's rank column can be the
    # plain doc_id % 4.
    from ai_intel_web_scraper_ray.pipelines.docqueries import (
        COMPARISON_CRED_CYCLE as _CMP_CYCLE,
        COMPARISON_PAIR_BUDGET as _CMP_B,
    )
    from ai_intel_web_scraper_ray.stages.grouping import (
        CREDIBILITY_RANK as _CMP_RANKS,
        TRUNCATION_MARKER as _CMP_MARK,
    )
    assert [_CMP_RANKS.get(c, 3) for c in _CMP_CYCLE] == [0, 1, 2, 3], \
        "comparison twin needs rank == doc_id % 4"

    # generated min-label connected-component rounds (relax + pointer
    # jump per round, Shiloach–Vishkin style): each round is one
    # O(V+E) join+GROUP BY, and the label distance-to-minimum contracts
    # geometrically, so 24 rounds converge for any graph these corpora
    # can produce (equality vs the exact closure is pinned at sf0.01 and
    # sf0.1).  Used by emb_snn_components / emb_dbscan in place of a
    # recursive reach(v,l) closure that materializes s^2 rows per
    # component (50s at 500 vectors; effectively wedged at 2000).
    _MINLABEL_N = 24
    _MINLABEL_LAST = "lbl_fix"

    def _minlabel_rounds(edge_cte: str, node_cte: str) -> str:
        """CTE chain lbl0..lblN over a SYMMETRIC edge list
        ``edge_cte(a, b)`` and node set ``node_cte(v)``; lbl_fix holds
        the per-node component minimum WITH a fixpoint assertion: if the
        last two rounds still differ anywhere (a graph needing >N
        rounds), the scalar subquery raises via error() so the gate
        fails LOUDLY instead of silently reporting wrong components
        (advisor r4)."""
        # AS MATERIALIZED is load-bearing: DuckDB INLINES plain CTEs,
        # so a chain where each round references the previous one 3x
        # would otherwise expand 3^N copies of the base scan
        parts = [f"lbl0 AS MATERIALIZED (SELECT v, v AS l FROM {node_cte})"]
        for t in range(_MINLABEL_N):
            parts.append(
                f"lbl{t + 1} AS MATERIALIZED (SELECT v, MIN(l) AS l FROM ("
                f"SELECT v, l FROM lbl{t} "
                f"UNION ALL SELECT {edge_cte}.a AS v, lbl{t}.l "
                f"FROM {edge_cte} JOIN lbl{t} ON lbl{t}.v = {edge_cte}.b "
                f"UNION ALL SELECT x.v, y.l FROM lbl{t} x "
                f"JOIN lbl{t} y ON y.v = x.l"
                f") GROUP BY v)")
        # + 0 keeps the schema; the subquery must evaluate to produce l
        parts.append(
            f"{_MINLABEL_LAST} AS MATERIALIZED (SELECT v, l + (SELECT "
            f"CASE WHEN COUNT(*) > 0 THEN error("
            f"'minlabel did not converge in {_MINLABEL_N} rounds') "
            f"ELSE 0 END FROM lbl{_MINLABEL_N - 1} x "
            f"JOIN lbl{_MINLABEL_N} y ON x.v = y.v AND x.l <> y.l"
            f") AS l FROM lbl{_MINLABEL_N})")
        return ",\n            ".join(parts) + ","

    stop_pat = r"\b(?:" + "|".join(QUALITY_STOPWORDS) + r")\b"
    # left-assoc 64-term norm chain — the _norm_ltr association contract
    iso_norm_chain = " + ".join(
        f"(CAST(embedding[{d}] AS DOUBLE) * CAST(embedding[{d}] AS DOUBLE))"
        for d in range(1, 65))

    return {
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   SUM(l_quantity) AS sum_qty,
                   SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) / 100.0 AS sum_base_price,
                   SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) / 100.0 AS sum_disc_price,
                   COUNT(*) AS n_rows,
                   ROUND(SUM(l_quantity) / COUNT(*), 6) AS avg_qty
            FROM lineitem
            WHERE l_shipdate < TIMESTAMP '1998-09-01'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "q3_top_orders": """
            SELECT l.l_orderkey, o.o_orderdate,
                   SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)) / 100.0 AS revenue
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE c.c_mktsegment = 'BUILDING'
            GROUP BY l.l_orderkey, o.o_orderdate
            ORDER BY revenue DESC, l.l_orderkey
            LIMIT 10
        """,
        "q5_nation_revenue": """
            SELECT n.n_name AS nation,
                   SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)) / 100.0 AS revenue
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY n.n_name
            ORDER BY nation
        """,
        "events_tumbling": """
            SELECT event_type, date_trunc('hour', ts) AS window_start,
                   COUNT(*) AS n_events, ROUND(SUM(value), 4) AS sum_value
            FROM events
            GROUP BY event_type, window_start
            ORDER BY event_type, window_start
        """,
        "events_hopping": """
            WITH hops AS (
                SELECT CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents,
                       time_bucket(INTERVAL '30 minutes', ts) AS slot
                FROM events
            ), exploded AS (
                SELECT cents, slot AS window_start FROM hops
                UNION ALL
                SELECT cents, slot - INTERVAL '30 minutes' FROM hops
            )
            SELECT window_start, CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM(cents) AS BIGINT) AS sum_cents
            FROM exploded GROUP BY window_start ORDER BY window_start
        """,
        "events_asof_click": """
            SELECT p.event_id,
                   c.event_id AS prior_click_id,
                   CAST(date_diff('microsecond', c.ts, p.ts) AS BIGINT)
                       AS usecs_since_click
            FROM (SELECT * FROM events WHERE event_type = 'purchase') p
            ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
              ON p.user_id = c.user_id AND p.ts >= c.ts
            ORDER BY p.event_id
        """,
        "events_value_range_join": """
            WITH pc AS (
                SELECT event_id, date_trunc('hour', ts) AS h,
                       CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents,
                       event_type
                FROM events WHERE event_type IN ('purchase', 'click')
            )
            SELECT p.event_id, CAST(COUNT(c.cents) AS BIGINT) AS n_close_clicks
            FROM (SELECT * FROM pc WHERE event_type = 'purchase') p
            LEFT JOIN (SELECT * FROM pc WHERE event_type = 'click') c
              ON p.h = c.h AND abs(p.cents - c.cents) <= 50
            GROUP BY p.event_id ORDER BY p.event_id
        """,
        "events_sessions": f"""
            WITH gaps AS (
                SELECT user_id, ts,
                       ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS gap
                FROM events
            )
            SELECT user_id, COUNT(*) AS n_events,
                   CAST(SUM(CASE WHEN gap > INTERVAL {SESSION_GAP_MIN} MINUTE THEN 1 ELSE 0 END) + 1 AS BIGINT) AS n_sessions
            FROM gaps GROUP BY user_id ORDER BY user_id
        """,
        "orders_gap_stats": """
            WITH gaps AS (
                SELECT o_custkey, o_orderdate,
                       date_diff('day', LAG(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate), o_orderdate) AS gap
                FROM orders
            )
            SELECT o_custkey, COUNT(*) AS n_orders,
                   COALESCE(MAX(gap), 0) AS max_gap_days
            FROM gaps GROUP BY o_custkey ORDER BY o_custkey
        """,
        "q6_revenue_delta": """
            SELECT COALESCE(SUM(CAST(FLOOR(l_extendedprice * l_discount * 100 + 0.5) AS BIGINT)), 0) / 100.0 AS revenue,
                   COUNT(*) AS n_rows
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1997-01-01'
              AND l_discount BETWEEN 0.05 AND 0.07
              AND l_quantity < 24
        """,
        "q4_order_priority": """
            SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM orders o
            WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
              AND o.o_orderdate <  TIMESTAMP '1997-01-01'
              AND EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey
                            AND l.l_returnflag = 'R')
            GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        "q12_priority_lines": """
            SELECT l_linestatus,
                   CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                            THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                   CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                            THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1997-01-01'
            GROUP BY l_linestatus ORDER BY l_linestatus
        """,
        "q14_promo_revenue": """
            WITH j AS (
                SELECT CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) AS rev_cents,
                       CASE WHEN p_type LIKE 'PROMO%' THEN 1 ELSE 0 END AS is_promo
                FROM lineitem JOIN part ON l_partkey = p_partkey
                WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l_shipdate <  TIMESTAMP '1996-07-01'
            )
            SELECT CAST(SUM(rev_cents * is_promo) AS BIGINT) AS promo_cents,
                   CAST(SUM(rev_cents) AS BIGINT) AS total_cents,
                   ROUND(100.0 * SUM(rev_cents * is_promo) / SUM(rev_cents), 6) AS promo_pct
            FROM j
        """,
        "q10_returned_revenue": """
            WITH rev AS (
                SELECT o_custkey,
                       SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS cents
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                WHERE l_returnflag = 'R'
                  AND o_orderdate >= TIMESTAMP '1996-01-01'
                  AND o_orderdate <  TIMESTAMP '1996-04-01'
                GROUP BY o_custkey
            )
            SELECT c_custkey, c_name, n_name AS nation, cents / 100.0 AS revenue
            FROM rev JOIN customer ON c_custkey = o_custkey
                     JOIN nation ON c_nationkey = n_nationkey
            ORDER BY cents DESC, c_custkey LIMIT 20
        """,
        "q19_branch_revenue": """
            WITH m AS (
                SELECT CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) AS cents
                FROM lineitem JOIN part ON l_partkey = p_partkey
                WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
                       AND l_quantity BETWEEN 1 AND 11)
                   OR (p_brand = 'Brand#13' AND p_size BETWEEN 10 AND 30
                       AND l_quantity BETWEEN 10 AND 20)
                   OR (p_brand = 'Brand#20' AND p_size BETWEEN 25 AND 50
                       AND l_quantity BETWEEN 20 AND 35)
            )
            SELECT COALESCE(SUM(cents), 0) / 100.0 AS revenue,
                   CAST(COUNT(*) AS BIGINT) AS n_rows
            FROM m
        """,
        "q7_nation_trade": """
            SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
                   CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
                   SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)) / 100.0 AS revenue
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation ns ON s.s_nationkey = ns.n_nationkey
            JOIN nation nc ON c.c_nationkey = nc.n_nationkey
            WHERE s.s_nationkey IN (3, 15) AND c.c_nationkey IN (3, 15)
              AND s.s_nationkey <> c.c_nationkey
              AND l.l_shipdate >= TIMESTAMP '1996-01-01'
              AND l.l_shipdate < TIMESTAMP '1998-01-01'
            GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
        """,
        "q13_order_count_dist": """
            SELECT CAST(c_count AS BIGINT) AS c_count,
                   CAST(COUNT(*) AS BIGINT) AS custdist
            FROM (SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
                  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                  GROUP BY c.c_custkey)
            GROUP BY c_count ORDER BY custdist DESC, c_count DESC
        """,
        "q17_small_qty_revenue": """
            SELECT FLOOR((SUM(CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT)) / 100.0 / 7.0) * 100 + 0.5) / 100.0 AS avg_yearly
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            WHERE p.p_brand = 'Brand#23'
              AND l.l_quantity < 0.2 * (SELECT AVG(l2.l_quantity)
                                        FROM lineitem l2
                                        WHERE l2.l_partkey = l.l_partkey)
        """,
        "q18_large_orders": """
            SELECT c.c_name, CAST(o.o_custkey AS BIGINT) AS o_custkey,
                   CAST(o.o_orderkey AS BIGINT) AS o_orderkey, o.o_orderdate,
                   CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) / 100.0 AS o_totalprice,
                   SUM(l.l_quantity) AS sum_qty
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1, 2, 3, 4, 5
            HAVING SUM(l.l_quantity) > 300
            ORDER BY o_totalprice DESC, o.o_orderdate ASC, o_orderkey ASC
            LIMIT 100
        """,
        "q22_idle_rich_customers": """
            SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_custs,
                   SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)) / 100.0 AS total_acctbal
            FROM customer c
            WHERE CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)
                    * (SELECT COUNT(*) FROM customer WHERE c_acctbal > 0)
                  > (SELECT SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT))
                     FROM customer WHERE c_acctbal > 0)
              AND NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_orderpriority = '1-URGENT')
            GROUP BY c_mktsegment ORDER BY c_mktsegment
        """,
        "q8_market_share": """
            WITH l AS (
                SELECT l.l_orderkey,
                       CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
                       CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT) AS cents,
                       CASE WHEN s.s_nationkey = 15
                            THEN CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)
                            ELSE 0 END AS tgt
                FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
            )
            SELECT l_year, CAST(SUM(tgt) AS BIGINT) AS tgt_cents,
                   CAST(SUM(cents) AS BIGINT) AS total_cents,
                   ROUND(SUM(tgt) * 1.0 / SUM(cents), 6) AS mkt_share
            FROM l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation nc ON c.c_nationkey = nc.n_nationkey
            WHERE nc.n_regionkey = 0
            GROUP BY l_year ORDER BY l_year
        """,
        "q21_late_suppliers": """
            WITH late AS (
                SELECT l.l_suppkey, COUNT(*) AS n_late
                FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
                WHERE date_diff('day', o.o_orderdate, l.l_shipdate) > 90
                GROUP BY l.l_suppkey
            ), top AS (
                SELECT * FROM late
                ORDER BY n_late DESC, l_suppkey ASC LIMIT 10
            )
            SELECT CAST(s.s_suppkey AS BIGINT) AS s_suppkey, s.s_name,
                   CAST(t.n_late AS BIGINT) AS n_late
            FROM top t JOIN supplier s ON t.l_suppkey = s.s_suppkey
            ORDER BY n_late DESC, s_suppkey ASC
        """,
        # Q11 adapted to lineitem (no partsupp in the testdata): per-part
        # revenue share from one nation's suppliers, HAVING > fraction of
        # the nation total
        "q11_part_value_share": """
            WITH f AS (
                SELECT l_partkey,
                       SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount)
                                      * 100 + 0.5) AS BIGINT)) AS v
                FROM lineitem
                WHERE l_suppkey IN (
                    SELECT s_suppkey FROM supplier
                    JOIN nation ON s_nationkey = n_nationkey
                    WHERE n_name = 'NATION_3')
                GROUP BY l_partkey
            )
            SELECT CAST(l_partkey AS BIGINT) AS l_partkey,
                   CAST(v AS BIGINT) AS value_cents
            FROM f
            WHERE v > (SELECT SUM(v) FROM f) * 0.001
            ORDER BY value_cents DESC, l_partkey
        """,
        # Q20 adapted to lineitem (no partsupp): suppliers who shipped more
        # than 1.2x the average supplier's quantity of 'small'-prefixed
        # parts over a two-year window
        "q20_excess_shippers": """
            WITH f AS (
                SELECT l_suppkey,
                       SUM(CAST(l_quantity AS BIGINT)) AS total_qty
                FROM lineitem
                WHERE l_partkey IN (
                        SELECT p_partkey FROM part
                        WHERE p_name LIKE 'small%')
                  AND l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l_shipdate <  TIMESTAMP '1998-01-01'
                GROUP BY l_suppkey
            )
            SELECT CAST(s.s_suppkey AS BIGINT) AS s_suppkey, s.s_name,
                   CAST(f.total_qty AS BIGINT) AS total_qty
            FROM f JOIN supplier s ON f.l_suppkey = s.s_suppkey
            WHERE f.total_qty > (SELECT AVG(total_qty) FROM f) * 1.2
            ORDER BY s_suppkey
        """,
        # top-5 most common 3-event paths over per-user (ts, event_id)-
        # ordered histories
        "events_user_paths": """
            WITH seq AS (
                SELECT user_id,
                       list(event_type ORDER BY ts, event_id) AS s
                FROM events GROUP BY user_id
            ), tri AS (
                SELECT UNNEST(list_transform(range(1, len(s) - 1),
                           i -> s[i] || '>' || s[i+1] || '>' || s[i+2])) AS path
                FROM seq
            )
            SELECT path, CAST(COUNT(*) AS BIGINT) AS n
            FROM tri GROUP BY path
            ORDER BY n DESC, path LIMIT 5
        """,
        # CEP / MATCH_RECOGNIZE: non-overlapping leftmost-greedy
        # `view click+ purchase` runs per ordered user history — symbol
        # string + regex on both sides (RE2 and Python re agree on this
        # backtracking-free pattern); matched_events via length delta of
        # the global non-overlapping replacement
        "events_cep_match": """
            WITH ev AS (
                SELECT user_id, ts, event_id,
                       CASE event_type
                            WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
                            WHEN 'purchase' THEN 'p'
                            WHEN 'signup' THEN 's' ELSE 'e' END AS sym
                FROM events
            ), seq AS (
                SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
                       string_agg(sym, '' ORDER BY ts, event_id) AS s
                FROM ev GROUP BY user_id
            )
            SELECT user_id, n_events,
                   CAST(len(regexp_extract_all(s, 'vc+p')) AS BIGINT)
                       AS n_matches,
                   CAST(length(s) - length(regexp_replace(s, 'vc+p', '',
                                                          'g')) AS BIGINT)
                       AS matched_events
            FROM seq
            WHERE len(regexp_extract_all(s, 'vc+p')) >= 1
            ORDER BY user_id
        """,
        # guard/negation CEP: signup (no error)* purchase — the
        # exclusion-pattern class; per-user strings have no separator so
        # [^e]* is the engine's [^e|]* language exactly
        "events_cep_guard": """
            WITH ev AS (
                SELECT user_id, ts, event_id,
                       CASE event_type
                            WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
                            WHEN 'purchase' THEN 'p'
                            WHEN 'signup' THEN 's' ELSE 'e' END AS sym
                FROM events
            ), seq AS (
                SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
                       string_agg(sym, '' ORDER BY ts, event_id) AS s
                FROM ev GROUP BY user_id
            )
            SELECT user_id, n_events,
                   CAST(len(regexp_extract_all(s, 's[^e]*p')) AS BIGINT)
                       AS n_matches,
                   CAST(length(s) - length(regexp_replace(s, 's[^e]*p',
                                                          '', 'g'))
                       AS BIGINT) AS matched_events
            FROM seq
            WHERE len(regexp_extract_all(s, 's[^e]*p')) >= 1
            ORDER BY user_id
        """,
        # time-bounded CEP: the same pattern, reset at 1-day session
        # boundaries (gaps-and-islands session ids, then per-session
        # symbol strings)
        "events_cep_sessions": f"""
            WITH ev AS (
                SELECT user_id, ts, event_id,
                       CASE event_type
                            WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
                            WHEN 'purchase' THEN 'p'
                            WHEN 'signup' THEN 's' ELSE 'e' END AS sym
                FROM events
            ), g AS (
                SELECT user_id, ts, event_id, sym,
                       CASE WHEN ts - LAG(ts) OVER (
                                PARTITION BY user_id
                                ORDER BY ts, event_id)
                            > INTERVAL {_CEP_WINDOW_MIN} MINUTE
                            THEN 1 ELSE 0 END AS brk
                FROM ev
            ), s AS (
                SELECT user_id, ts, event_id, sym,
                       SUM(brk) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS sess
                FROM g
            ), seq AS (
                SELECT user_id, sess,
                       string_agg(sym, '' ORDER BY ts, event_id) AS str
                FROM s GROUP BY user_id, sess
            ), per AS (
                SELECT user_id,
                       CAST(COUNT(*) AS BIGINT) AS n_sessions,
                       CAST(SUM(len(regexp_extract_all(str, 'vc+p')))
                           AS BIGINT) AS n_matches,
                       CAST(SUM(CASE WHEN len(regexp_extract_all(
                                str, 'vc+p')) > 0 THEN 1 ELSE 0 END)
                           AS BIGINT) AS sessions_with_match
                FROM seq GROUP BY user_id
            )
            SELECT user_id, n_sessions, n_matches, sessions_with_match
            FROM per WHERE n_matches >= 1 ORDER BY user_id
        """,
        # join-key skew profile: exact integer Gini of per-key counts
        # (tie ranks are interchangeable in sum(i*c), so ROW_NUMBER
        # order among equal counts is immaterial); HUGEINT casts keep
        # n*S*10^6 exact
        "events_key_skew": """
            WITH c AS (
                SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
                FROM events GROUP BY user_id
            ), tot AS (
                SELECT CAST(SUM(n) AS HUGEINT) AS s,
                       CAST(COUNT(*) AS HUGEINT) AS k,
                       CAST(MAX(n) AS BIGINT) AS mx
                FROM c
            ), rk AS (
                SELECT n, ROW_NUMBER() OVER (ORDER BY n) AS i FROM c
            ), a AS (
                SELECT CAST(SUM(CAST(i AS HUGEINT) * n) AS HUGEINT) AS a
                FROM rk
            )
            SELECT CAST(s AS BIGINT) AS n_rows,
                   CAST(k AS BIGINT) AS n_keys,
                   mx AS max_count,
                   CAST(mx * 1000000 // s AS BIGINT) AS max_share_ppm,
                   CAST((SELECT COUNT(*) FROM c
                         WHERE n > 10 * (SELECT CAST(s // k AS BIGINT)
                                         FROM tot)) AS BIGINT)
                       AS hot_keys_10x,
                   CAST((2 * a - (k + 1) * s) * 1000000 // (k * s)
                        AS BIGINT) AS gini_ppm,
                   CAST(LEAST(64, GREATEST(1,
                        mx // GREATEST(CAST(s // k AS BIGINT), 1)))
                        AS BIGINT) AS recommended_salt
            FROM tot, a
            WHERE k > 0   -- typed-empty twin: no rows when events is empty
        """,
        # daily event-type crosstab (COUNT FILTER pivot)
        "events_pivot": """
            SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                   CAST(COUNT(*) FILTER (event_type = 'click') AS BIGINT)
                       AS n_click,
                   CAST(COUNT(*) FILTER (event_type = 'error') AS BIGINT)
                       AS n_error,
                   CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT)
                       AS n_purchase,
                   CAST(COUNT(*) FILTER (event_type = 'signup') AS BIGINT)
                       AS n_signup,
                   CAST(COUNT(*) FILTER (event_type = 'view') AS BIGINT)
                       AS n_view,
                   CAST(COUNT(*) AS BIGINT) AS n_total
            FROM events GROUP BY 1 ORDER BY 1
        """,
        # month-over-month revenue growth: LAG over the monthly aggregate
        # view→purchase conversion latency: whole-minute lags between the
        # two firsts, exact discrete quantiles; HAVING matches the
        # engine's typed-empty on a corpus with no conversions
        "events_conversion_lag": """
            WITH f AS (
                SELECT user_id,
                       MIN(CASE WHEN event_type = 'view'
                                THEN epoch_us(ts) END) AS fv,
                       MIN(CASE WHEN event_type = 'purchase'
                                THEN epoch_us(ts) END) AS fp
                FROM events GROUP BY user_id
            ), lags AS (
                SELECT (fp - fv) // 60000000 AS lag_min
                FROM f
                WHERE fv IS NOT NULL AND fp IS NOT NULL AND fp >= fv
            )
            SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
                   CAST(quantile_disc(lag_min, 0.5) AS BIGINT)
                       AS median_min,
                   CAST(quantile_disc(lag_min, 0.9) AS BIGINT) AS p90_min
            FROM lags HAVING COUNT(*) > 0
        """,
        # Kaplan–Meier product-limit curve with right-censoring at
        # MAX(ts); per-step ppm truncation via a recursive CTE (the
        # events_daily_ewma recurrence contract)
        "events_kaplan_meier": """
            WITH RECURSIVE f AS (
                SELECT user_id,
                       MIN(CASE WHEN event_type = 'view'
                                THEN epoch_us(ts) END) AS fv,
                       MIN(CASE WHEN event_type = 'purchase'
                                THEN epoch_us(ts) END) AS fp
                FROM events GROUP BY user_id
            ), cohort AS (
                SELECT CASE WHEN fp IS NOT NULL
                            THEN (fp - fv) // 60000000
                            ELSE ((SELECT MAX(epoch_us(ts)) FROM events)
                                  - fv) // 60000000 END AS t,
                       CASE WHEN fp IS NOT NULL THEN 1 ELSE 0 END AS death
                FROM f
                WHERE fv IS NOT NULL AND (fp IS NULL OR fp >= fv)
            ), dt AS (
                SELECT t, COUNT(*) AS d FROM cohort
                WHERE death = 1 GROUP BY t
            ), o AS (
                SELECT t, d,
                       (SELECT COUNT(*) FROM cohort c WHERE c.t >= dt.t)
                           AS n,
                       ROW_NUMBER() OVER (ORDER BY t) AS rn
                FROM dt
            ), km AS (
                SELECT rn, t, d, n,
                       CAST(1000000 * (n - d) // n AS BIGINT) AS s
                FROM o WHERE rn = 1
                UNION ALL
                SELECT o.rn, o.t, o.d, o.n,
                       CAST(km.s * (o.n - o.d) // o.n AS BIGINT)
                FROM km JOIN o ON o.rn = km.rn + 1
            )
            SELECT CAST(t AS BIGINT) AS t_min,
                   CAST(n AS BIGINT) AS n_risk,
                   CAST(d AS BIGINT) AS n_events,
                   s AS surv_ppm
            FROM km ORDER BY t_min
        """,
        # Holt linear-trend smoothing in integer tenths (α=0.2, β=0.1);
        # every step truncates toward zero; the level expression is
        # repeated inside the trend step because the CTE can't reference
        # its own select-list alias
        "orders_holt_forecast": """
            WITH RECURSIVE mo AS (
                SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)
                           AS month,
                       SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                           AS y
                FROM orders GROUP BY 1
            ), o AS (
                SELECT month, y, ROW_NUMBER() OVER (ORDER BY month) AS rn
                FROM mo
            ), h AS (
                SELECT rn, month, y, y AS l, CAST(0 AS BIGINT) AS b
                FROM o WHERE rn = 1
                UNION ALL
                SELECT o.rn, o.month, o.y,
                       (2 * o.y + 8 * (h.l + h.b)) // 10,
                       (((2 * o.y + 8 * (h.l + h.b)) // 10 - h.l)
                        + 9 * h.b) // 10
                FROM h JOIN o ON o.rn = h.rn + 1
            )
            SELECT month,
                   CAST(y AS BIGINT) AS revenue_cents,
                   CAST(l AS BIGINT) AS level_cents,
                   CAST(b AS BIGINT) AS trend_cents,
                   CAST(l + b AS BIGINT) AS fc1_cents
            FROM h ORDER BY month
        """,
        # rolling 7-row daily-revenue median: quantile_disc as a window
        # aggregate over the observed day series (order-statistic frame)
        "orders_rolling_median": """
            WITH d AS (
                SELECT date_trunc('day', o_orderdate) AS day,
                       SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                           AS rev
                FROM orders GROUP BY 1
            )
            SELECT day,
                   CAST(rev AS BIGINT) AS revenue_cents,
                   CAST(quantile_disc(rev, 0.5) OVER (
                            ORDER BY day
                            ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS med7_cents
            FROM d ORDER BY day
        """,
        # Theil–Sen robust trend: median of pairwise slopes in tenths of
        # a cent per month; // truncates toward zero, quantile_disc is the
        # ceil(q·n)−1 order statistic — both matched by the engine
        "orders_theil_sen": """
            WITH m AS (
                SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate)
                            AS BIGINT) AS x,
                       SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                           AS rev
                FROM orders GROUP BY 1
            ), p AS (
                SELECT (b.rev - a.rev) * 10 // (b.x - a.x) AS slope
                FROM m a JOIN m b ON a.x < b.x
            ), s AS (
                SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
                       CAST(quantile_disc(slope, 0.5) AS BIGINT)
                           AS slope_tenths
                FROM p
            ), ic AS (
                SELECT CAST(quantile_disc(m.rev * 10 - s.slope_tenths * m.x,
                                          0.5) AS BIGINT)
                           AS intercept_tenths
                FROM m, s
            )
            SELECT CAST((SELECT COUNT(*) FROM m) AS BIGINT) AS n_months,
                   s.n_pairs, s.slope_tenths, ic.intercept_tenths
            FROM s, ic WHERE s.n_pairs > 0
        """,
        # one HITS round over the oriented (src<dst, ≥2 co-orders) part
        # graph: integer max-normalized auth then hub; hub⁰ ≡ 1 folded
        # XYZ demand-variability classes: integer-exact squared CV of
        # monthly centi-quantity over the global month horizon (zeros
        # implicit); cv² is the monotone twin of CV so class cuts match
        "parts_xyz_classes": """
            WITH d AS (
                SELECT l_partkey, date_trunc('month', l_shipdate) AS mo,
                       CAST(SUM(CAST(FLOOR(l_quantity * 100 + 0.5)
                                     AS BIGINT)) AS BIGINT) AS q
                FROM lineitem GROUP BY 1, 2
            ), m AS (
                SELECT CAST(COUNT(DISTINCT mo) AS HUGEINT) AS nm FROM d
            ), s AS (
                SELECT l_partkey AS p_partkey,
                       CAST(COUNT(*) AS BIGINT) AS n_months_active,
                       CAST(SUM(q) AS HUGEINT) AS sq,
                       SUM(CAST(q AS HUGEINT) * q) AS sq2
                FROM d GROUP BY 1
            ), v AS (
                SELECT p_partkey, n_months_active,
                       CAST(sq AS BIGINT) AS sum_qty_centi,
                       CAST((1000000 * ((SELECT nm FROM m) * sq2
                                        - sq * sq))
                            // (sq * sq) AS BIGINT) AS cv2_ppm
                FROM s WHERE sq > 0
            )
            SELECT p_partkey, n_months_active, sum_qty_centi, cv2_ppm,
                   CASE WHEN cv2_ppm <= 250000 THEN 'X'
                        WHEN cv2_ppm <= 1000000 THEN 'Y'
                        ELSE 'Z' END AS xyz_class
            FROM v ORDER BY p_partkey
        """,
        # Gini coefficient of per-customer spend in exact ppm: ranks from
        # the (cents, custkey) total order; rank-weighted sum kept in
        # HUGEINT (engine: Python big ints over the value histogram)
        "orders_gini": """
            WITH s AS (
                SELECT o_custkey,
                       CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5)
                                     AS BIGINT)) AS BIGINT) AS cents
                FROM orders GROUP BY o_custkey
            ), r AS (
                SELECT cents,
                       ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS rk
                FROM s
            ), a AS (
                SELECT CAST(COUNT(*) AS BIGINT) AS n,
                       CAST(SUM(cents) AS HUGEINT) AS tot,
                       SUM(CAST(rk AS HUGEINT) * cents) AS rs
                FROM r
            )
            SELECT n AS n_customers,
                   CAST(tot AS BIGINT) AS total_cents,
                   CAST((1000000 * (2 * rs - (n + 1) * tot))
                        // (n * tot) AS BIGINT) AS gini_ppm
            FROM a WHERE n > 0 AND tot > 0
        """,
        # Welch's t-test of event value between the md5-split variants:
        # exact integer cents moments per variant; the t / Welch-
        # Satterthwaite-df readout is one scalar float expression with
        # the identical association order on both sides, micro-rounded
        "events_welch_ttest": """
            WITH v AS (
                SELECT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                                            1, 8)) AS BIGINT) % 2
                           AS variant,
                       CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c
                FROM events
            ), m AS (
                SELECT variant, CAST(COUNT(*) AS BIGINT) AS n,
                       CAST(SUM(c) AS BIGINT) AS s,
                       CAST(SUM(c * c) AS BIGINT) AS q
                FROM v GROUP BY variant
            ), p AS (
                SELECT a.n AS na, a.s AS sa, a.q AS qa,
                       b.n AS nb, b.s AS sb, b.q AS qb
                FROM m a JOIN m b ON a.variant = 0 AND b.variant = 1
                WHERE a.n >= 2 AND b.n >= 2
            ), f AS (
                SELECT na, nb,
                       CAST(sa AS DOUBLE) / na / 100.0 AS ma,
                       CAST(sb AS DOUBLE) / nb / 100.0 AS mb,
                       (CAST(qa AS DOUBLE) / na
                        - (CAST(sa AS DOUBLE) / na)
                          * (CAST(sa AS DOUBLE) / na))
                           / 10000.0 * na / (na - 1.0) AS va,
                       (CAST(qb AS DOUBLE) / nb
                        - (CAST(sb AS DOUBLE) / nb)
                          * (CAST(sb AS DOUBLE) / nb))
                           / 10000.0 * nb / (nb - 1.0) AS vb
                FROM p
            ), g AS (
                SELECT na, nb, ma, mb, va, vb,
                       va / na + vb / nb AS se2
                FROM f
            )
            SELECT na AS n_a, nb AS n_b,
                   ROUND(ma, 6) AS mean_a, ROUND(mb, 6) AS mean_b,
                   CAST(CASE WHEN se2 = 0 THEN 0 ELSE
                        ROUND((ma - mb) / sqrt(se2) * 1000000)
                        END AS BIGINT) AS t_micro,
                   CAST(CASE WHEN se2 = 0 THEN 0 ELSE
                        ROUND(se2 * se2
                              / ((va / na) * (va / na) / (na - 1.0)
                                 + (vb / nb) * (vb / nb) / (nb - 1.0))
                              * 1000000)
                        END AS BIGINT) AS df_micro
            FROM g
        """,
        # top-20 Adamic-Adar link predictions over the co-order graph:
        # non-edge pairs scored Σ 1e12 // round(ln(deg c)·1e6) over common
        # neighbors c (fixed-point-ln contract); ties pinned by
        # (score DESC, part_a, part_b)
        "parts_adamic_adar": """
            WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
            e AS (
                SELECT a.l_partkey AS u, c.l_partkey AS v
                FROM b a JOIN b c USING (l_orderkey)
                WHERE a.l_partkey < c.l_partkey
                GROUP BY 1, 2 HAVING COUNT(*) >= 2
            ),
            nbr AS (
                SELECT u AS c, v AS n FROM e
                UNION ALL SELECT v, u FROM e
            ),
            w AS (
                SELECT c, CAST(1000000000000 // CAST(ROUND(
                    ln(CAST(COUNT(*) AS DOUBLE)) * 1000000) AS BIGINT)
                    AS BIGINT) AS wc
                FROM nbr GROUP BY c HAVING COUNT(*) >= 2
            ),
            cand AS (
                SELECT n1.n AS a, n2.n AS b,
                       CAST(COUNT(*) AS BIGINT) AS n_common,
                       CAST(SUM(w.wc) AS BIGINT) AS aa
                FROM nbr n1
                JOIN nbr n2 ON n1.c = n2.c AND n1.n < n2.n
                JOIN w ON w.c = n1.c
                GROUP BY 1, 2
            )
            SELECT CAST(cand.a AS BIGINT) AS part_a,
                   CAST(cand.b AS BIGINT) AS part_b,
                   n_common, aa AS aa_score
            FROM cand LEFT JOIN e ON cand.a = e.u AND cand.b = e.v
            WHERE e.u IS NULL
            ORDER BY aa_score DESC, part_a, part_b
            LIMIT 20
        """,
        # into the first auth sum; sink-only parts carry hub_ppm 0
        "parts_hits": """
            WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
            e AS (
                SELECT a.l_partkey AS src, c.l_partkey AS dst,
                       CAST(COUNT(*) AS BIGINT) AS n
                FROM b a JOIN b c USING (l_orderkey)
                WHERE a.l_partkey < c.l_partkey
                GROUP BY 1, 2 HAVING COUNT(*) >= 2
            ),
            a1 AS (SELECT dst AS node, SUM(n) AS a1 FROM e GROUP BY dst),
            ma AS (SELECT MAX(a1) AS m FROM a1),
            a1p AS (SELECT node, a1 * 1000000 // ma.m AS auth_ppm
                    FROM a1, ma),
            h1 AS (SELECT e.src AS node, SUM(e.n * a1p.auth_ppm) AS h
                   FROM e JOIN a1p ON e.dst = a1p.node GROUP BY e.src),
            mh AS (SELECT MAX(h) AS m FROM h1),
            h1p AS (SELECT node, h * 1000000 // mh.m AS hub_ppm
                    FROM h1, mh)
            SELECT CAST(a1p.node AS BIGINT) AS part,
                   CAST(a1p.auth_ppm AS BIGINT) AS auth_ppm,
                   CAST(COALESCE(h1p.hub_ppm, 0) AS BIGINT) AS hub_ppm
            FROM a1p LEFT JOIN h1p ON a1p.node = h1p.node
            ORDER BY auth_ppm DESC, part LIMIT 20
        """,
        # two-sample KS over purchase cents between md5-split variants:
        # cross-multiplied cumulative counts keep D exact-integer; HUGEINT
        # guards ca·tb; at_cents pins the earliest argmax
        "events_ks_test": """
            WITH p AS (
                SELECT CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents,
                       CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                                            1, 8)) AS BIGINT) % 2 AS variant
                FROM events WHERE event_type = 'purchase'
            ), h AS (
                SELECT cents,
                       SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS na,
                       SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS nb
                FROM p GROUP BY cents
            ), t AS (SELECT SUM(na) AS ta, SUM(nb) AS tb FROM h),
            c AS (
                SELECT cents,
                       SUM(na) OVER (ORDER BY cents) AS ca,
                       SUM(nb) OVER (ORDER BY cents) AS cb
                FROM h
            ), d AS (
                SELECT cents,
                       ABS(CAST(ca AS HUGEINT) * t.tb
                           - CAST(cb AS HUGEINT) * t.ta) AS diff
                FROM c CROSS JOIN t
            )
            SELECT CAST(t.ta AS BIGINT) AS n_a,
                   CAST(t.tb AS BIGINT) AS n_b,
                   CAST(CAST(1000000 AS HUGEINT) * (SELECT MAX(diff) FROM d)
                        // (CAST(t.ta AS HUGEINT) * t.tb) AS BIGINT)
                       AS d_ppm,
                   CAST((SELECT MIN(cents) FROM d
                         WHERE diff = (SELECT MAX(diff) FROM d))
                        AS BIGINT) AS at_cents
            FROM t WHERE t.ta > 0 AND t.tb > 0
        """,
        # hour-of-day uniformity chi-square per event type; zero-count
        # hours contribute N^2 each so the sum runs over OBSERVED hours
        # only (24*o - N)^2 stays HUGEINT-safe at web scale
        "events_hour_uniformity": """
            WITH h AS (
                SELECT event_type, hour(ts) AS hr,
                       CAST(COUNT(*) AS HUGEINT) AS n
                FROM events GROUP BY 1, 2
            ), tot AS (
                SELECT event_type, SUM(n) AS n_events,
                       COUNT(*) AS n_hours_active
                FROM h GROUP BY 1
            ), s AS (
                SELECT h.event_type,
                       SUM((24 * h.n - tot.n_events)
                           * (24 * h.n - tot.n_events)) AS obs
                FROM h JOIN tot USING (event_type)
                GROUP BY h.event_type
            )
            SELECT tot.event_type,
                   CAST(tot.n_events AS BIGINT) AS n_events,
                   CAST(tot.n_hours_active AS BIGINT) AS n_hours_active,
                   CAST(1000000 * (s.obs
                            + (24 - tot.n_hours_active)
                              * tot.n_events * tot.n_events)
                        // (576 * tot.n_events) AS BIGINT) AS chi2_ppm
            FROM tot JOIN s USING (event_type)
            ORDER BY tot.event_type
        """,
        # Benford first-digit audit over integer cents; expectation ppm
        # pinned as literals (= floor(1e6*log10(1+1/d)), the same table
        # the engine carries in relational._BENFORD_PPM)
        "orders_benford": """
            WITH c AS (
                SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice * 100 + 0.5)
                                              AS BIGINT) AS VARCHAR),
                                   1, 1) AS BIGINT) AS digit,
                       COUNT(*) AS n
                FROM orders GROUP BY 1
            ), t AS (SELECT SUM(n) AS total FROM c),
            b AS (
                SELECT * FROM (VALUES
                    (1, 301029), (2, 176091), (3, 124938), (4, 96910),
                    (5, 79181), (6, 66946), (7, 57991), (8, 51152),
                    (9, 45757)) AS v(digit, benford_ppm)
            )
            SELECT c.digit,
                   CAST(c.n AS BIGINT) AS n_orders,
                   CAST(1000000 * c.n // t.total AS BIGINT) AS obs_ppm,
                   CAST(b.benford_ppm AS BIGINT) AS benford_ppm,
                   CAST(1000000 * c.n // t.total - b.benford_ppm
                        AS BIGINT) AS delta_ppm
            FROM c JOIN b USING (digit) CROSS JOIN t
            ORDER BY c.digit
        """,
        # degree assortativity of the co-order graph: HUGEINT moments
        # over the directed edge list, trunc-div ppm (numerator may be
        # negative; the denominator is a variance)
        "parts_degree_assortativity": """
            WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
            pairs AS (
              SELECT a.l_partkey AS u, b.l_partkey AS v, COUNT(*) AS n
              FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey < b.l_partkey
              GROUP BY 1, 2
            ), edges AS (SELECT u, v FROM pairs WHERE n >= 2),
            dir AS (SELECT u AS node, v AS nbr FROM edges
                    UNION ALL SELECT v, u FROM edges),
            deg AS (SELECT node, COUNT(*) AS d FROM dir GROUP BY node),
            e AS (
              SELECT dj.d AS j, dk.d AS k
              FROM dir
              JOIN deg dj ON dj.node = dir.node
              JOIN deg dk ON dk.node = dir.nbr
            ), m AS (
              SELECT CAST(COUNT(*) AS HUGEINT) AS mm,
                     SUM(CAST(j AS HUGEINT) * k) AS a,
                     SUM(CAST(j AS HUGEINT)) AS b,
                     SUM(CAST(j AS HUGEINT) * j) AS c
              FROM e HAVING COUNT(*) > 0
            )
            SELECT CAST(mm // 2 AS BIGINT) AS n_edges,
                   CAST(a AS BIGINT) AS sum_jk,
                   CAST(b AS BIGINT) AS sum_j,
                   CAST(c AS BIGINT) AS sum_j2,
                   CAST(CASE WHEN mm * c - b * b = 0 THEN 0
                        ELSE (1000000 * (mm * a - b * b))
                             // (mm * c - b * b)
                        END AS BIGINT) AS r_ppm
            FROM m
        """,
        # daily-count ACF: gap-filled calendar series, exact integer
        # centering e=n·x−S (n² cancels), trunc-toward-zero ppm ratio
        "events_autocorr": """
            WITH d AS (
                SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                       COUNT(*) AS x
                FROM events GROUP BY 1
            ), cal AS (
                SELECT CAST(UNNEST(generate_series(
                    CAST((SELECT MIN(day) FROM d) AS TIMESTAMP),
                    CAST((SELECT MAX(day) FROM d) AS TIMESTAMP),
                    INTERVAL 1 DAY)) AS DATE) AS day
            ), s AS (
                SELECT COALESCE(d.x, 0) AS x,
                       ROW_NUMBER() OVER (ORDER BY cal.day) AS i
                FROM cal LEFT JOIN d USING (day)
            ), c AS (
                SELECT i,
                       CAST((SELECT COUNT(*) FROM s) AS HUGEINT) * x
                           - (SELECT SUM(x) FROM s) AS e
                FROM s
            ), dn AS (SELECT SUM(e * e) AS den FROM c),
            num AS (
                SELECT t.lag AS lag, SUM(a.e * b.e) AS num
                FROM generate_series(1, 7) t(lag)
                JOIN c a ON TRUE
                JOIN c b ON b.i = a.i + t.lag
                GROUP BY t.lag
            )
            SELECT CAST(lag AS BIGINT) AS lag,
                   CAST((SELECT COUNT(*) FROM s) AS BIGINT) AS n_days,
                   CASE WHEN (SELECT den FROM dn) = 0 THEN CAST(0 AS BIGINT)
                        ELSE CAST(1000000 * num // (SELECT den FROM dn)
                                  AS BIGINT) END AS r_ppm
            FROM num ORDER BY lag
        """,
        # md5-split A/B chi-square readout: HUGEINT intermediates, zero
        # marginals pin chi2 to 0
        "events_abtest": """
            WITH u AS (
                SELECT user_id,
                       CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                                            1, 8)) AS BIGINT) % 2
                           AS variant,
                       MAX(CASE WHEN event_type = 'purchase'
                                THEN 1 ELSE 0 END) AS conv
                FROM events GROUP BY user_id
            ), c AS (
                SELECT
                    SUM(CASE WHEN variant = 0 AND conv = 1
                             THEN 1 ELSE 0 END) AS a,
                    SUM(CASE WHEN variant = 0 AND conv = 0
                             THEN 1 ELSE 0 END) AS b,
                    SUM(CASE WHEN variant = 1 AND conv = 1
                             THEN 1 ELSE 0 END) AS c2,
                    SUM(CASE WHEN variant = 1 AND conv = 0
                             THEN 1 ELSE 0 END) AS d
                FROM u HAVING COUNT(*) > 0
            )
            SELECT CAST(a AS BIGINT) AS n_a_conv,
                   CAST(b AS BIGINT) AS n_a_no,
                   CAST(c2 AS BIGINT) AS n_b_conv,
                   CAST(d AS BIGINT) AS n_b_no,
                   CAST(CASE WHEN (a+b) * (c2+d) * (a+c2) * (b+d) = 0
                        THEN 0
                        ELSE (CAST(1000000 AS HUGEINT) * (a+b+c2+d)
                              * (a*d - b*c2) * (a*d - b*c2))
                             // ((a+b) * (c2+d) * (a+c2) * (b+d))
                        END AS BIGINT) AS chi2_ppm
            FROM c
        """,
        # approach-to-stationary of the event-type Markov chain: three
        # integer-ppm power steps (per-term // 10^6, so the sum is
        # order-free) from the uniform ppm vector
        "events_markov_stationary": """
            WITH seq AS (
                SELECT user_id, event_type,
                       LAG(event_type) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id)
                           AS prev_type
                FROM events
            ), counts AS (
                SELECT prev_type AS from_type, event_type AS to_type,
                       COUNT(*) AS n
                FROM seq WHERE prev_type IS NOT NULL
                GROUP BY 1, 2
            ), p AS (
                SELECT from_type, to_type,
                       n * 1000000 // SUM(n) OVER (PARTITION BY from_type)
                           AS p_ppm
                FROM counts
            ), tps AS (SELECT DISTINCT event_type AS t FROM events),
            v0 AS (SELECT t, 1000000 // (SELECT COUNT(*) FROM tps) AS v
                   FROM tps),
            v1 AS (
                SELECT tps.t,
                       COALESCE(SUM((v0.v * p.p_ppm) // 1000000), 0) AS v
                FROM tps
                LEFT JOIN p ON p.to_type = tps.t
                LEFT JOIN v0 ON v0.t = p.from_type
                GROUP BY tps.t
            ),
            v2 AS (
                SELECT tps.t,
                       COALESCE(SUM((v1.v * p.p_ppm) // 1000000), 0) AS v
                FROM tps
                LEFT JOIN p ON p.to_type = tps.t
                LEFT JOIN v1 ON v1.t = p.from_type
                GROUP BY tps.t
            ),
            v3 AS (
                SELECT tps.t,
                       COALESCE(SUM((v2.v * p.p_ppm) // 1000000), 0) AS v
                FROM tps
                LEFT JOIN p ON p.to_type = tps.t
                LEFT JOIN v2 ON v2.t = p.from_type
                GROUP BY tps.t
            )
            SELECT t AS event_type, CAST(v AS BIGINT) AS v_ppm
            FROM v3 ORDER BY event_type
        """,
        # time-decayed engagement: integer one-week half-life weights
        # anchored at MAX(ts); µs-integer age so day boundaries can't
        # straddle a fractional second
        "events_decayed_counts": """
            WITH a AS (SELECT MAX(ts) AS anchor FROM events),
            w AS (
                SELECT user_id,
                       1000000 // (CAST(1 AS BIGINT) << CAST(LEAST(
                           ((epoch_us((SELECT anchor FROM a))
                             - epoch_us(ts)) // 86400000000) // 7,
                           20) AS BIGINT)) AS wq
                FROM events
            )
            SELECT user_id,
                   CAST(SUM(wq) AS BIGINT) AS decayed_q,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM w GROUP BY user_id
            ORDER BY decayed_q DESC, user_id LIMIT 20
        """,
        # classical seasonal decomposition over the observed month rows:
        # centered 12-row trend (full windows only), per-calendar-month
        # integer residual means (// truncates toward zero in DuckDB —
        # the engine matches with sign-aware truncation)
        "orders_seasonal_decompose": """
            WITH mo AS (
                SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)
                           AS month,
                       SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                           AS rev
                FROM orders GROUP BY 1
            ), w AS (
                SELECT month, rev,
                       SUM(rev) OVER (ORDER BY month
                           ROWS BETWEEN 6 PRECEDING AND 5 FOLLOWING)
                           AS wsum,
                       COUNT(*) OVER (ORDER BY month
                           ROWS BETWEEN 6 PRECEDING AND 5 FOLLOWING) AS wn
                FROM mo
            ), t AS (
                SELECT month, rev, wsum // 12 AS trend
                FROM w WHERE wn = 12
            ), s AS (
                SELECT month(month) AS moy,
                       SUM(rev - trend) AS dsum, COUNT(*) AS dn
                FROM t GROUP BY 1
            )
            SELECT t.month,
                   CAST(t.rev AS BIGINT) AS revenue_cents,
                   CAST(t.trend AS BIGINT) AS trend_cents,
                   CAST(s.dsum // s.dn AS BIGINT) AS seasonal_cents
            FROM t JOIN s ON month(t.month) = s.moy
            ORDER BY t.month
        """,
        # CUSUM changepoint over daily revenue: integer mean (total //
        # n_days), HUGEINT running deviation, earliest-argmax tie pin
        "orders_changepoint": """
            WITH d AS (
                SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP)
                           AS day,
                       SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                           AS rev
                FROM orders GROUP BY 1
            ), s AS (
                SELECT day, rev,
                       SUM(rev - (SELECT SUM(rev) // COUNT(*) FROM d))
                           OVER (ORDER BY day) AS dev
                FROM d
            ), cp AS (
                SELECT MIN(day) AS cpd FROM s
                WHERE ABS(dev) = (SELECT MAX(ABS(dev)) FROM s)
            )
            SELECT day,
                   CAST(rev AS BIGINT) AS revenue_cents,
                   CAST(dev AS BIGINT) AS dev_cents,
                   CAST(CASE WHEN day = (SELECT cpd FROM cp)
                             THEN 1 ELSE 0 END AS BIGINT) AS is_cp
            FROM s ORDER BY day
        """,
        "orders_monthly_growth": """
            WITH m AS (
                SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)
                           AS month,
                       SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                           AS revenue_cents
                FROM orders GROUP BY 1
            )
            SELECT month, CAST(revenue_cents AS BIGINT) AS revenue_cents,
                   CAST(COALESCE(revenue_cents
                                 - LAG(revenue_cents) OVER (ORDER BY month),
                                 0) AS BIGINT) AS delta_cents
            FROM m ORDER BY month
        """,
        # DAU / trailing-7-day WAU / stickiness — sliding-window
        # COUNT(DISTINCT); the engine decomposes it into user-bucketed
        # distinct pairs + a bounded 7× explode
        "events_dau_wau": """
            WITH u AS (
                SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP)
                           AS day, user_id
                FROM events
            ), days AS (SELECT DISTINCT day FROM u)
            SELECT d.day,
                   CAST((SELECT COUNT(*) FROM u WHERE u.day = d.day)
                        AS BIGINT) AS dau,
                   CAST((SELECT COUNT(DISTINCT user_id) FROM u
                         WHERE u.day BETWEEN d.day - INTERVAL 6 DAY
                                         AND d.day) AS BIGINT) AS wau,
                   CAST((SELECT COUNT(*) FROM u WHERE u.day = d.day)
                        * 1000000
                        // (SELECT COUNT(DISTINCT user_id) FROM u
                            WHERE u.day BETWEEN d.day - INTERVAL 6 DAY
                                            AND d.day) AS BIGINT)
                       AS stickiness_micro
            FROM days d ORDER BY d.day
        """,
        # global ROW_NUMBER over per-customer spend (range sort + block
        # prefix offsets in the engine — the unbounded-domain rank path)
        "orders_spend_rank": """
            WITH s AS (
                SELECT o_custkey,
                       SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                           AS spend_cents
                FROM orders GROUP BY 1
            )
            SELECT o_custkey, CAST(spend_cents AS BIGINT) AS spend_cents,
                   CAST(ROW_NUMBER() OVER (
                       ORDER BY spend_cents DESC, o_custkey) AS BIGINT)
                       AS spend_rank
            FROM s ORDER BY o_custkey
        """,
        # pairwise audience overlap between event types (set intersection
        # via per-bucket membership matrices in the engine)
        "events_type_overlap": """
            WITH u AS (SELECT DISTINCT event_type, user_id FROM events),
            s AS (SELECT event_type, COUNT(*) AS n FROM u GROUP BY 1),
            x AS (
                SELECT a.event_type AS type_a, b.event_type AS type_b,
                       COUNT(*) AS n_both
                FROM u a JOIN u b ON a.user_id = b.user_id
                 AND a.event_type < b.event_type
                GROUP BY 1, 2
            )
            SELECT x.type_a, x.type_b,
                   CAST(x.n_both AS BIGINT) AS n_both,
                   CAST(sa.n + sb.n - x.n_both AS BIGINT) AS n_either,
                   CAST(x.n_both * 1000000
                        // GREATEST(sa.n + sb.n - x.n_both, 1) AS BIGINT)
                       AS jaccard_ppm
            FROM x JOIN s sa ON x.type_a = sa.event_type
                   JOIN s sb ON x.type_b = sb.event_type
            ORDER BY type_a, type_b
        """,
        # hive-partitioned write + pruned single-partition read; the SQL
        # twin filters the same rows it never had to scan around
        "lineitem_partition_prune": """
            SELECT l_linestatus, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS qty_cents,
                   CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5)
                        AS BIGINT)) AS BIGINT) AS price_cents
            FROM lineitem WHERE l_returnflag = 'R'
            GROUP BY 1 ORDER BY 1
        """,
        # connected components of the support-3 co-order part graph; the
        # oracle is recursive-CTE reachability (O(sum comp²) rows — fine
        # at oracle scale), the engine is min-label propagation
        # connected components via the generated min-label rounds (the
        # recursive reach(v,l) closure materializes s^2 rows per
        # component — wedged at the synthesized sf1, where replication
        # multiplies co-order supports 10x and the >=3 filter stops
        # pruning, densifying the graph to ~1.2M edges)
        "parts_components": f"""
            WITH pairs AS MATERIALIZED (
                SELECT l1.l_partkey AS x, l2.l_partkey AS y
                FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) l1
                JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) l2
                  ON l1.l_orderkey = l2.l_orderkey
                 AND l1.l_partkey < l2.l_partkey
                GROUP BY 1, 2 HAVING COUNT(*) >= 3
            ),
            e AS MATERIALIZED (
                SELECT x AS a, y AS b FROM pairs
                UNION ALL SELECT y AS a, x AS b FROM pairs
            ),
            nodes AS MATERIALIZED (SELECT DISTINCT a AS v FROM e),
            {_minlabel_rounds('e', 'nodes')}
            comp AS (SELECT v AS id, l AS component_id FROM {_MINLABEL_LAST})
            SELECT CAST(component_id AS BIGINT) AS component_id,
                   CAST(COUNT(*) AS BIGINT) AS n_parts,
                   CAST(SUM(id) AS BIGINT) AS part_checksum
            FROM comp GROUP BY 1 ORDER BY 1
        """,
        # running total per customer (UNBOUNDED PRECEDING window frame)
        "orders_running_total": """
            WITH t AS (
                SELECT o_orderkey, o_custkey, o_orderdate,
                       CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
                           AS cents
                FROM orders
            )
            SELECT o_orderkey,
                   CAST(SUM(cents) OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS run_cents
            FROM t ORDER BY o_orderkey
        """,
        "q9_nation_profit": """
            SELECT n.n_name AS nation, CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
                   SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)
                       - CAST(FLOOR(l.l_extendedprice * l.l_tax * 100 + 0.5) AS BIGINT)) / 100.0 AS profit
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            WHERE p.p_name LIKE '%widget%'
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "q15_top_supplier": """
            WITH r AS (
                SELECT l_suppkey,
                       SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS rev_cents
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l_shipdate <  TIMESTAMP '1996-04-01'
                GROUP BY l_suppkey
            )
            SELECT CAST(s.s_suppkey AS BIGINT) AS s_suppkey, s.s_name,
                   r.rev_cents / 100.0 AS total_revenue
            FROM r JOIN supplier s ON r.l_suppkey = s.s_suppkey
            WHERE r.rev_cents = (SELECT MAX(rev_cents) FROM r)
            ORDER BY s_suppkey
        """,
        "q16_supplier_count": """
            SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
                   CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_brand <> 'Brand#13'
            GROUP BY 1, 2, 3
            ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        """,
        "events_funnel": """
            WITH s0 AS (SELECT user_id, MIN(ts) AS prev_ts FROM events
                        WHERE event_type = 'view' GROUP BY user_id),
            s1 AS (SELECT e.user_id, MIN(e.ts) AS prev_ts FROM events e
                   JOIN s0 ON e.user_id = s0.user_id
                   WHERE e.event_type = 'click' AND e.ts > s0.prev_ts
                   GROUP BY e.user_id),
            s2 AS (SELECT e.user_id, MIN(e.ts) AS prev_ts FROM events e
                   JOIN s1 ON e.user_id = s1.user_id
                   WHERE e.event_type = 'purchase' AND e.ts > s1.prev_ts
                   GROUP BY e.user_id)
            SELECT stage, n_users FROM (
                SELECT 'view' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM s0
                UNION ALL SELECT 'click', CAST(COUNT(*) AS BIGINT) FROM s1
                UNION ALL SELECT 'purchase', CAST(COUNT(*) AS BIGINT) FROM s2
            ) ORDER BY stage
        """,
        "events_rolling_avg": """
            SELECT CAST(event_id AS BIGINT) AS event_id,
                   ROUND(AVG(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
                         OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) / 100.0, 6) AS roll_avg
            FROM events ORDER BY event_id
        """,
        # moments from exact integer cents so the closed-form mean/stddev
        # is partitioning-independent on both engines (NOT STDDEV_POP,
        # whose streaming accumulation is visit-order-dependent)
        "events_value_stats": """
            WITH c AS (
                SELECT event_type,
                       CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c
                FROM events
            )
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                   ROUND(SUM(c) * 1.0 / COUNT(*) / 100.0, 6) AS mean_value,
                   ROUND(sqrt(GREATEST(
                       (SUM(c * c) * 1.0 / COUNT(*)
                        - (SUM(c) * 1.0 / COUNT(*)) * (SUM(c) * 1.0 / COUNT(*)))
                       / 10000.0, 0)), 6) AS stddev_pop
            FROM c GROUP BY event_type ORDER BY event_type
        """,
        "parts_co_ordered": """
            WITH p AS (
                SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
            ), pairs AS (
                SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                       COUNT(*) AS n
                FROM p a JOIN p b ON a.l_orderkey = b.l_orderkey
                                 AND a.l_partkey < b.l_partkey
                GROUP BY 1, 2
            )
            SELECT CAST(part_a AS BIGINT) AS part_a,
                   CAST(part_b AS BIGINT) AS part_b,
                   CAST(n AS BIGINT) AS n
            FROM pairs
            ORDER BY n DESC, part_a ASC, part_b ASC LIMIT 20
        """,
        "events_view_no_purchase": """
            WITH v AS (SELECT DISTINCT user_id FROM events
                       WHERE event_type = 'view'),
            b AS (SELECT DISTINCT user_id FROM events
                  WHERE event_type = 'purchase')
            SELECT CAST((SELECT COUNT(*) FROM v
                         WHERE user_id NOT IN (SELECT user_id FROM b))
                        AS BIGINT) AS n_view_no_purchase,
                   CAST((SELECT COUNT(*) FROM v
                         WHERE user_id IN (SELECT user_id FROM b))
                        AS BIGINT) AS n_view_and_purchase
        """,
        "events_retention": """
            WITH ud AS (
                SELECT DISTINCT user_id, date_trunc('day', ts) AS day
                FROM events
            )
            SELECT a.day, CAST(COUNT(*) AS BIGINT) AS n_active,
                   CAST(SUM(CASE WHEN b.user_id IS NOT NULL
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_retained
            FROM ud a LEFT JOIN ud b
              ON a.user_id = b.user_id AND b.day = a.day + INTERVAL 1 DAY
            GROUP BY a.day ORDER BY a.day
        """,
        "events_hopping_distinct": """
            WITH hops AS (
                SELECT user_id,
                       time_bucket(INTERVAL '30 minutes', ts) AS slot
                FROM events
            ), exploded AS (
                SELECT user_id, slot AS window_start FROM hops
                UNION ALL
                SELECT user_id, slot - INTERVAL '30 minutes' FROM hops
            )
            SELECT window_start,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
            FROM exploded GROUP BY window_start ORDER BY window_start
        """,
        "q5_rollup_revenue": """
            WITH j AS (
                SELECT r.r_name AS region, n.n_name AS nation,
                       CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT) AS cents
                FROM lineitem l
                JOIN orders o ON l.l_orderkey = o.o_orderkey
                JOIN customer c ON o.o_custkey = c.c_custkey
                JOIN nation n ON c.c_nationkey = n.n_nationkey
                JOIN region r ON n.n_regionkey = r.r_regionkey
            )
            SELECT COALESCE(region, 'ALL') AS region,
                   COALESCE(nation, 'ALL') AS nation,
                   SUM(cents) / 100.0 AS revenue
            FROM j GROUP BY ROLLUP(region, nation)
            ORDER BY 1, 2
        """,
        "q2_min_cost_part": """
            SELECT p_type, CAST(p_size AS BIGINT) AS p_size,
                   CAST(p_partkey AS BIGINT) AS p_partkey, p_name,
                   CAST(FLOOR(p_retailprice * 100 + 0.5) AS BIGINT) / 100.0
                       AS p_retailprice
            FROM part
            QUALIFY row_number() OVER (
                PARTITION BY p_type, p_size
                ORDER BY CAST(FLOOR(p_retailprice * 100 + 0.5) AS BIGINT) ASC,
                         p_partkey ASC) = 1
            ORDER BY p_type, p_size
        """,
        "events_top_user_per_window": """
            WITH s AS (
                SELECT date_trunc('hour', ts) AS window_start, user_id,
                       SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS cents
                FROM events GROUP BY 1, 2
            )
            SELECT window_start, CAST(user_id AS BIGINT) AS user_id,
                   cents / 100.0 AS sum_value
            FROM s
            QUALIFY row_number() OVER (PARTITION BY window_start
                                       ORDER BY cents DESC, user_id ASC) = 1
            ORDER BY window_start
        """,
        "events_distinct_users": """
            SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "events_top_users": """
            SELECT CAST(user_id AS BIGINT) AS user_id,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY user_id
            ORDER BY n DESC, user_id LIMIT 20
        """,
        # two unrolled integer-ppm PageRank iterations over the directed
        # co-order part graph (same per-edge floor-division order as the
        # engine: contribution floors per edge, damping floors per node)
        "parts_pagerank": """
            WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
            e0 AS (
                SELECT a.l_partkey AS src, c.l_partkey AS dst,
                       CAST(COUNT(*) AS BIGINT) AS n
                FROM b a JOIN b c USING (l_orderkey)
                WHERE a.l_partkey != c.l_partkey
                GROUP BY 1, 2
            ),
            ow AS (SELECT src, CAST(SUM(n) AS BIGINT) AS outw
                   FROM e0 GROUP BY src),
            e AS (SELECT e0.src, e0.dst, e0.n, ow.outw
                  FROM e0 JOIN ow USING (src)),
            r1 AS (
                SELECT dst AS node,
                       150000 + 850 * SUM(1000000 * n // outw) // 1000
                           AS rank
                FROM e GROUP BY dst
            ),
            r2 AS (
                SELECT e.dst AS node,
                       150000 + 850 * SUM(r1.rank * e.n // e.outw) // 1000
                           AS rank_ppm
                FROM e JOIN r1 ON e.src = r1.node GROUP BY e.dst
            )
            SELECT CAST(node AS BIGINT) AS part,
                   CAST(rank_ppm AS BIGINT) AS rank_ppm
            FROM r2 ORDER BY rank_ppm DESC, part LIMIT 20
        """,
        # personalized PageRank: teleport mass only on the p_size=1 seed
        # cohort; universe = nodes incident to >=1 edge (isolated seeds
        # out of scope on both sides); same 850/1000 damping and per-edge
        # floor divisions as parts_pagerank
        "parts_ppr": """
            WITH b AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
            e0 AS MATERIALIZED (
                SELECT a.l_partkey AS src, c.l_partkey AS dst,
                       CAST(COUNT(*) AS BIGINT) AS n
                FROM b a JOIN b c USING (l_orderkey)
                WHERE a.l_partkey != c.l_partkey
                GROUP BY 1, 2
            ),
            ow AS MATERIALIZED (SELECT src, CAST(SUM(n) AS BIGINT) AS outw
                   FROM e0 GROUP BY src),
            e AS MATERIALIZED (SELECT e0.src, e0.dst, e0.n, ow.outw
                  FROM e0 JOIN ow USING (src)),
            nodes AS MATERIALIZED (SELECT src AS node FROM e
                      UNION SELECT dst FROM e),
            seeds AS MATERIALIZED (SELECT p_partkey AS node FROM part
                      WHERE p_size = 1),
            sc AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS nk FROM seeds),
            r0 AS MATERIALIZED (
                SELECT n.node,
                       CASE WHEN s.node IS NOT NULL
                            THEN 1000000 // (SELECT nk FROM sc)
                            ELSE 0 END AS r
                FROM nodes n LEFT JOIN seeds s ON n.node = s.node
            ),
            in1 AS MATERIALIZED (
                SELECT e.dst AS node,
                       CAST(SUM(r0.r * e.n // e.outw) AS BIGINT) AS c
                FROM e JOIN r0 ON e.src = r0.node GROUP BY e.dst
            ),
            r1 AS MATERIALIZED (
                SELECT r0.node,
                       150 * r0.r // 1000
                       + 850 * COALESCE(in1.c, 0) // 1000 AS r
                FROM r0 LEFT JOIN in1 ON r0.node = in1.node
            ),
            in2 AS MATERIALIZED (
                SELECT e.dst AS node,
                       CAST(SUM(r1.r * e.n // e.outw) AS BIGINT) AS c
                FROM e JOIN r1 ON e.src = r1.node GROUP BY e.dst
            ),
            r2 AS MATERIALIZED (
                SELECT r0.node,
                       150 * r0.r // 1000
                       + 850 * COALESCE(in2.c, 0) // 1000 AS r
                FROM r0 LEFT JOIN in2 ON r0.node = in2.node
            )
            SELECT CAST(node AS BIGINT) AS part,
                   CAST(r AS BIGINT) AS pr_ppm
            FROM r2 WHERE r > 0
            ORDER BY r DESC, part LIMIT 20
        """,
        # the IDENTICAL KMV sketch (md5-based) run in SQL — deterministic,
        # so the estimate itself is hash-checked, not approximated
        "events_kmv_distinct": """
            WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
            h AS (
                SELECT DISTINCT event_type,
                       CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                                            1, 8)) AS BIGINT) AS h32
                FROM du
            ),
            r AS (
                SELECT event_type, h32,
                       row_number() OVER (PARTITION BY event_type
                                          ORDER BY h32) AS rn
                FROM h
            )
            SELECT event_type, CAST(h32 AS BIGINT) AS kth_hash,
                   CAST(7 * 4294967296 // h32 AS BIGINT) AS est_users
            FROM r WHERE rn = 8 ORDER BY event_type
        """,
        # the engine side runs a Bloom-prefiltered semi-join (exact after
        # the verify join), so the plain SQL semi-join is the oracle
        "orders_bloom_semijoin": """
            SELECT o_orderpriority,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS sum_cents
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE c.c_mktsegment = 'AUTOMOBILE'
            GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        # triangle census of the ≥2-times-co-ordered part graph (id-oriented
        # wedge enumeration, same orientation as the engine)
        "parts_triangles": """
            WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
            e AS (
                SELECT a.l_partkey AS u, c.l_partkey AS v
                FROM b a JOIN b c USING (l_orderkey)
                WHERE a.l_partkey < c.l_partkey
                GROUP BY 1, 2 HAVING COUNT(*) >= 2
            ),
            w AS (
                SELECT e1.v AS y, e2.v AS z
                FROM e e1 JOIN e e2 ON e1.u = e2.u AND e1.v < e2.v
            )
            SELECT CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
                   CAST((SELECT COUNT(*) FROM w) AS BIGINT) AS n_wedges,
                   CAST((SELECT COUNT(*) FROM w
                         JOIN e ON w.y = e.u AND w.z = e.v) AS BIGINT)
                       AS n_triangles
        """,
        "parts_clustering_coeff": """
            WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
            e AS (
                SELECT a.l_partkey AS u, c.l_partkey AS v
                FROM b a JOIN b c USING (l_orderkey)
                WHERE a.l_partkey < c.l_partkey
                GROUP BY 1, 2 HAVING COUNT(*) >= 2
            ),
            deg AS (
                SELECT node, COUNT(*) AS degree FROM (
                    SELECT u AS node FROM e
                    UNION ALL SELECT v FROM e
                ) GROUP BY node
            ),
            tri AS (
                SELECT e1.u AS a, e1.v AS b, e2.v AS c
                FROM e e1
                JOIN e e2 ON e1.u = e2.u AND e1.v < e2.v
                JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v
            ),
            tcnt AS (
                SELECT node, COUNT(*) AS n_tri FROM (
                    SELECT a AS node FROM tri
                    UNION ALL SELECT b FROM tri
                    UNION ALL SELECT c FROM tri
                ) GROUP BY node
            )
            SELECT CAST(d.node AS BIGINT) AS part_id,
                   CAST(d.degree AS BIGINT) AS degree,
                   CAST(COALESCE(t.n_tri, 0) AS BIGINT) AS n_tri,
                   CAST((2000000 * COALESCE(t.n_tri, 0))
                        // (d.degree * (d.degree - 1)) AS BIGINT)
                       AS coeff_ppm
            FROM deg d LEFT JOIN tcnt t ON d.node = t.node
            WHERE d.degree >= 2
            ORDER BY part_id
        """,
        "events_new_users_daily": """
            WITH f AS (
                SELECT user_id, MIN(date_trunc('day', ts)) AS day
                FROM events GROUP BY user_id
            )
            SELECT day, CAST(COUNT(*) AS BIGINT) AS n_new
            FROM f GROUP BY day ORDER BY day
        """,
        # right-to-be-forgotten cascade accounting: the forgotten cohort
        # is learned from customer (c_acctbal lives only there), then
        # flows orders → lineitem as semi-join delete sets
        "orders_forget_customers": """
            WITH del_c AS (
                SELECT c_custkey FROM customer WHERE c_acctbal < -900.0
            ), del_o AS (
                SELECT o_orderkey FROM orders
                WHERE o_custkey IN (SELECT c_custkey FROM del_c)
            ), del_l AS (
                SELECT 1 FROM lineitem
                WHERE l_orderkey IN (SELECT o_orderkey FROM del_o)
            )
            SELECT * FROM (
                SELECT 'customer' AS tab,
                       CAST((SELECT COUNT(*) FROM customer) AS BIGINT)
                           AS rows_before,
                       CAST((SELECT COUNT(*) FROM del_c) AS BIGINT)
                           AS rows_deleted,
                       CAST((SELECT COUNT(*) FROM customer)
                            - (SELECT COUNT(*) FROM del_c) AS BIGINT)
                           AS rows_after
                UNION ALL
                SELECT 'orders',
                       CAST((SELECT COUNT(*) FROM orders) AS BIGINT),
                       CAST((SELECT COUNT(*) FROM del_o) AS BIGINT),
                       CAST((SELECT COUNT(*) FROM orders)
                            - (SELECT COUNT(*) FROM del_o) AS BIGINT)
                UNION ALL
                SELECT 'lineitem',
                       CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT),
                       CAST((SELECT COUNT(*) FROM del_l) AS BIGINT),
                       CAST((SELECT COUNT(*) FROM lineitem)
                            - (SELECT COUNT(*) FROM del_l) AS BIGINT)
            ) ORDER BY tab
        """,
        "orders_profile": """
            SELECT 'o_custkey' AS col,
                   CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT) AS n_nulls,
                   CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
                   CAST(MIN(o_custkey) AS VARCHAR) AS min_v,
                   CAST(MAX(o_custkey) AS VARCHAR) AS max_v
            FROM orders
            UNION ALL
            SELECT 'o_orderpriority',
                   CAST(COUNT(*) - COUNT(o_orderpriority) AS BIGINT),
                   CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT),
                   MIN(o_orderpriority), MAX(o_orderpriority)
            FROM orders
            UNION ALL
            SELECT 'o_orderstatus',
                   CAST(COUNT(*) - COUNT(o_orderstatus) AS BIGINT),
                   CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
                   MIN(o_orderstatus), MAX(o_orderstatus)
            FROM orders
            ORDER BY col
        """,
        # the same integer EWMA recurrence, replayed by a recursive CTE
        "events_daily_ewma": """
            WITH RECURSIVE h AS (
                SELECT event_type, date_trunc('day', ts) AS day,
                       CAST(COUNT(*) AS BIGINT) AS n,
                       row_number() OVER (PARTITION BY event_type
                                          ORDER BY date_trunc('day', ts))
                           AS i
                FROM events GROUP BY 1, 2
            ), r AS (
                SELECT event_type, day, n, i, n AS ewma_q
                FROM h WHERE i = 1
                UNION ALL
                SELECT h.event_type, h.day, h.n, h.i,
                       (3 * r.ewma_q + h.n) // 4
                FROM h JOIN r ON h.event_type = r.event_type
                            AND h.i = r.i + 1
            )
            SELECT event_type, day, n, CAST(ewma_q AS BIGINT) AS ewma_q
            FROM r ORDER BY event_type, day
        """,
        "events_session_table": """
            WITH s AS (
                SELECT user_id, ts,
                       CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                                                    ORDER BY ts)
                                 > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS brk
                FROM events
            ), t AS (
                SELECT user_id, ts,
                       SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING)
                           AS session_id
                FROM s
            )
            SELECT CAST(user_id AS BIGINT) AS user_id,
                   CAST(session_id AS BIGINT) AS session_id,
                   MIN(ts) AS start_ts, MAX(ts) AS end_ts,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM t GROUP BY user_id, session_id
            ORDER BY user_id, session_id
        """,
        # Z-order (Morton) layout key: 8-bit interleave of two coordinates
        "lineitem_zorder_sample": """
            WITH kk AS (
                SELECT l_orderkey, l_partkey % 256 AS a,
                       l_suppkey % 256 AS b
                FROM lineitem
            )
            SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
                   CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
                   CAST({Z} AS BIGINT) AS zkey
            FROM kk ORDER BY zkey, l_orderkey LIMIT 20
        """.replace("{Z}", " + ".join(
            f"(((a >> {i}) & 1) * {1 << (2 * i)})"
            f" + (((b >> {i}) & 1) * {1 << (2 * i + 1)})"
            for i in range(8))),
        "events_cube": """
            WITH base AS (
                SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                       event_type, CAST(COUNT(*) AS BIGINT) AS n
                FROM events GROUP BY 1, 2
            )
            SELECT COALESCE(day, 'ALL') AS day,
                   COALESCE(event_type, 'ALL') AS event_type,
                   CAST(COALESCE(SUM(n), 0) AS BIGINT) AS n
            FROM base GROUP BY CUBE(day, event_type)
            ORDER BY day, event_type
        """,
        "orders_price_median": """
            SELECT o_orderpriority,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(quantile_disc(
                       CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT),
                       0.5) AS BIGINT) AS median_cents
            FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        # interval-bounded RANGE frame (gap-aware), vs rolling_avg's ROWS
        "events_range_window": """
            WITH d AS (
                SELECT event_type, date_trunc('day', ts) AS day,
                       CAST(COUNT(*) AS BIGINT) AS n
                FROM events GROUP BY 1, 2
            )
            SELECT event_type, day, n,
                   CAST(SUM(n) OVER (
                       PARTITION BY event_type ORDER BY day
                       RANGE BETWEEN INTERVAL 2 DAY PRECEDING
                                 AND CURRENT ROW) AS BIGINT) AS sum_3d
            FROM d ORDER BY event_type, day
        """,
        "part_type_stats": """
            SELECT p_type, COUNT(*) AS n,
                   ROUND(SUM(p_retailprice) / COUNT(*), 4) AS avg_price
            FROM part GROUP BY p_type ORDER BY p_type
        """,
        "supplier_nation_acct": """
            SELECT n.n_name AS nation, COUNT(*) AS n,
                   ROUND(SUM(s.s_acctbal) / COUNT(*), 4) AS avg_acctbal
            FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
            GROUP BY n.n_name ORDER BY nation
        """,
        "events_props_k": r"""
            SELECT event_type, COUNT(*) AS n,
                   CAST(SUM(CAST(regexp_extract(props, '(\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "docs_url_canonical": """
            SELECT doc_id,
                   'https://ex.example/' || source || '/' || CAST(doc_id AS VARCHAR) AS canonical_url
            FROM documents ORDER BY doc_id
        """,
        "docs_top_tokens": """
            SELECT word, COUNT(*) AS n FROM (
                SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS word
                FROM documents
            ) GROUP BY word ORDER BY n DESC, word LIMIT 20
        """,
        "docs_interleaved_roundtrip": """
            SELECT doc_id, 'Doc ' || CAST(doc_id AS VARCHAR) AS title, text,
                   CAST(2 AS BIGINT) AS n_spans
            FROM documents ORDER BY doc_id
        """,
        "chunk_documents": f"""
            WITH body AS (
                SELECT doc_id,
                       '[Testdata | Official Docs | General] Doc ' ||
                       CAST(doc_id AS VARCHAR) || chr(10) || text AS chunk_text
                FROM documents
            )
            SELECT 'testdata-chunk-' || substr(sha256(CAST(doc_id AS VARCHAR) || ':0:' ||
                        substr(chunk_text, 1, 100)), 1, 12) AS chunk_id,
                   CAST(doc_id AS VARCHAR) AS parent_doc_id,
                   CAST(0 AS INTEGER) AS chunk_index,
                   CAST(len(regexp_extract_all(chunk_text, '{{TOKENPAT}}')) AS INTEGER) AS token_count
            FROM body ORDER BY doc_id
        """.replace("{TOKENPAT}", TOKEN_PATTERN),
        "docs_lang_distribution": """
            SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang ORDER BY lang
        """,
        "docs_token_stats": f"""
            SELECT doc_id,
                   len(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS n_tokens,
                   len(regexp_extract_all(text, '\\S+')) AS n_ws_tokens
            FROM documents ORDER BY doc_id
        """,
        "docs_token_percentiles": f"""
            WITH t AS (
                SELECT len(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS n_tokens
                FROM documents
            )
            SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(quantile_disc(n_tokens, 0.5)  AS BIGINT) AS p50,
                   CAST(quantile_disc(n_tokens, 0.9)  AS BIGINT) AS p90,
                   CAST(quantile_disc(n_tokens, 0.99) AS BIGINT) AS p99
            FROM t
        """,
        "docs_token_percentiles_by_lang": f"""
            WITH t AS (
                SELECT lang,
                       len(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS n_tokens
                FROM documents
            )
            SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(quantile_disc(n_tokens, 0.5)  AS BIGINT) AS p50,
                   CAST(quantile_disc(n_tokens, 0.9)  AS BIGINT) AS p90,
                   CAST(quantile_disc(n_tokens, 0.99) AS BIGINT) AS p99
            FROM t GROUP BY lang ORDER BY lang
        """,
        "docs_quality_scores": f"""
            WITH f AS (
                SELECT doc_id,
                       len(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS n_words,
                       len(regexp_extract_all(text, '[^A-Za-z0-9_\\s]')) AS n_punct,
                       len(regexp_extract_all(lower(text), '{stop_pat}')) AS stop_hits
                FROM documents
            )
            SELECT doc_id, n_words, n_punct, stop_hits,
                   CAST(FLOOR(stop_hits * 1000000.0 / GREATEST(n_words, 1)) AS BIGINT) AS stop_ppm,
                   CAST(FLOOR(n_punct * 1000000.0 / GREATEST(n_words, 1)) AS BIGINT) AS punct_ppm
            FROM f ORDER BY doc_id
        """,
        "docs_langid": _langid_sql(),
        "docs_langid_confusion": _langid_sql(confusion=True),
        # per-language mean-centered token counts, exact integer micro units
        # (floor-divided mean is the rounding contract on both sides)
        "docs_lang_centered": f"""
            WITH t AS (
                SELECT doc_id, lang,
                       len(regexp_extract_all(text, '{TOKEN_PATTERN}'))
                           AS n_tokens
                FROM documents
            ), s AS (
                SELECT lang, COUNT(*) AS cnt, SUM(n_tokens) AS total
                FROM t GROUP BY lang
            )
            SELECT t.doc_id, t.lang, CAST(t.n_tokens AS BIGINT) AS n_tokens,
                   CAST(t.n_tokens * 1000000
                        - (s.total * 1000000) // s.cnt AS BIGINT) AS dev_micro
            FROM t JOIN s USING (lang) ORDER BY t.doc_id
        """,
        # exact global percent-rank in integer micro units; RANK()-1 ==
        # count-of-strictly-smaller, which the engine reads from a merged
        # histogram instead of a global sort
        "docs_percent_rank": f"""
            WITH t AS (
                SELECT doc_id,
                       len(regexp_extract_all(text, '{TOKEN_PATTERN}'))
                           AS n_tokens
                FROM documents
            )
            SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
                   CAST((RANK() OVER (ORDER BY n_tokens) - 1) * 1000000
                        // ((SELECT COUNT(*) FROM t) - 1) AS BIGINT)
                       AS pr_micro
            FROM t ORDER BY doc_id
        """,
        # NTILE(4) quartiles with the doc_id tiebreak; engine derives the
        # global ROW_NUMBER from a histogram + per-value cumcount, no sort
        "docs_ntile": f"""
            WITH t AS (
                SELECT doc_id,
                       len(regexp_extract_all(text, '{TOKEN_PATTERN}'))
                           AS n_tokens
                FROM documents
            )
            SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
                   CAST(NTILE(4) OVER (ORDER BY n_tokens, doc_id)
                        AS BIGINT) AS tile
            FROM t ORDER BY doc_id
        """,
        # documents ⋈ embeddings enrichment join on doc_id = vec_id; the
        # norm collapses the vector to one rounded scalar pre-join
        "docs_vector_enrich": """
            SELECT d.doc_id, d.lang, d.n_chars,
                   CAST(e.label AS BIGINT) AS label,
                   ROUND(sqrt(list_sum(list_transform(
                       CAST(e.embedding AS DOUBLE[]), x -> x * x))), 6)
                       AS vnorm
            FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
            ORDER BY d.doc_id
        """,
        # mean token rarity per document (corpus-count lookup via a
        # word-key exchange, then per-doc floor-divided mean)
        "docs_rarity_score": r"""
            WITH toks AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '\s+'),
                                   x -> x != '') AS w
                FROM documents
            ), tok AS (
                SELECT doc_id, UNNEST(w) AS word FROM toks
            ), cnt AS (
                SELECT word, CAST(COUNT(*) AS BIGINT) AS c
                FROM tok GROUP BY word
            )
            SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS ntok,
                   CAST(SUM(1000000 // cnt.c) // COUNT(*) AS BIGINT)
                       AS avg_rarity_q
            FROM tok t JOIN cnt USING (word)
            GROUP BY t.doc_id ORDER BY t.doc_id
        """,
        # interleaved span stats: title+body spans plus one media span per
        # 'sp'-prefixed token (the engine runs the REAL span codec; the SQL
        # twin derives the same counts/positions from the text)
        "docs_interleaved_media_stats": r"""
            WITH toks AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '\s+'),
                                   x -> x != '') AS w
                FROM documents
            ), tok AS (
                SELECT doc_id, unnest(w) AS word,
                       generate_subscripts(w, 1) AS pos
                FROM toks
            ), agg AS (
                SELECT doc_id,
                       COUNT(CASE WHEN word LIKE 's%' THEN 1 END) AS n_media,
                       MIN(CASE WHEN word LIKE 's%' THEN pos END) AS first_pos
                FROM tok GROUP BY doc_id
            )
            -- LEFT JOIN from documents: an empty/whitespace-only doc has
            -- no token rows but the codec still emits its title+body spans
            SELECT d.doc_id,
                   CAST(2 + COALESCE(a.n_media, 0) AS BIGINT) AS n_spans,
                   CAST(COALESCE(a.n_media, 0) AS BIGINT) AS n_media,
                   CAST(COALESCE(a.first_pos, 0) AS BIGINT) AS first_pos
            FROM documents d LEFT JOIN agg a USING (doc_id)
            ORDER BY d.doc_id
        """,
        # referential-integrity audit: span refs vs the asset table
        # ingested only from the doc_id %% 3 == 0 slice
        "docs_media_ref_integrity": r"""
            WITH toks AS (
                SELECT doc_id, lang,
                       list_filter(regexp_split_to_array(lower(text), '\s+'),
                                   x -> x != '') AS w
                FROM documents
            ), tok AS (
                SELECT doc_id, lang, unnest(w) AS word FROM toks
            ), refs AS (
                SELECT doc_id, lang, 'img://' || word AS media_ref
                FROM tok WHERE word LIKE 's%'
            ), assets AS (
                SELECT DISTINCT media_ref FROM refs WHERE doc_id % 3 = 0
            )
            SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_refs,
                   CAST(SUM(CASE WHEN a.media_ref IS NOT NULL
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_resolved,
                   CAST(SUM(CASE WHEN a.media_ref IS NULL
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_dangling
            FROM refs r LEFT JOIN assets a USING (media_ref)
            GROUP BY lang ORDER BY lang
        """,
        # shared-media-asset census over the interleaved corpus
        "docs_media_ref_counts": r"""
            WITH toks AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '\s+'),
                                   x -> x != '') AS w
                FROM documents
            ), tok AS (
                SELECT doc_id, unnest(w) AS word FROM toks
            )
            SELECT 'img://' || word AS media_ref,
                   CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
                   CAST(COUNT(*) AS BIGINT) AS n_spans
            FROM tok WHERE word LIKE 's%'
            GROUP BY word ORDER BY n_docs DESC, media_ref
        """,
        # Broder containment pairs over df-floored word 8-grams
        "docs_containment": r"""
            WITH toks AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '\s+'),
                                   x -> x != '') AS w
                FROM documents
            ), shs AS (
                SELECT doc_id,
                       list_distinct(list_transform(
                           range(1, greatest(len(w) - 6, 1)),
                           i -> w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]
                                ||' '||w[i+4]||' '||w[i+5]||' '||w[i+6]
                                ||' '||w[i+7])) AS s
                FROM toks
            ), tok AS (
                SELECT doc_id, unnest(s) AS sh FROM shs
            ), df AS (
                SELECT sh, COUNT(*) AS d FROM tok GROUP BY 1
            ), keep AS (
                SELECT tok.doc_id, tok.sh FROM tok JOIN df USING (sh)
                WHERE df.d <= 32
            ), sizes AS (
                SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
                FROM keep GROUP BY 1
            ), copair AS (
                SELECT a.doc_id AS src, b.doc_id AS dst,
                       CAST(COUNT(*) AS BIGINT) AS co
                FROM keep a JOIN keep b
                  ON a.sh = b.sh AND a.doc_id <> b.doc_id
                GROUP BY 1, 2
            )
            SELECT src, dst, co, sa.n AS n_src,
                   CAST(co * 1000000 // sa.n AS BIGINT) AS containment_ppm
            FROM copair JOIN sizes sa ON sa.doc_id = src
            WHERE co * 1000000 // sa.n >= 800000
            ORDER BY src, dst
        """,
        # ExactSubstr-style duplicated spans: positional word-8-grams,
        # grams in >= 2 distinct docs cover [pos, pos+7]; spans = maximal
        # consecutive covered runs per doc (engine merges via sorted-diff,
        # twin via the gaps-and-islands ROW_NUMBER trick)
        "docs_dup_spans": r"""
            WITH toks AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '\s+'),
                                   x -> x != '') AS w
                FROM documents
            ), gp AS (
                SELECT doc_id,
                       unnest(range(1, greatest(len(w) - 6, 1))) AS pos, w
                FROM toks
            ), g AS (
                SELECT doc_id, pos,
                       w[pos]||' '||w[pos+1]||' '||w[pos+2]||' '||w[pos+3]
                       ||' '||w[pos+4]||' '||w[pos+5]||' '||w[pos+6]
                       ||' '||w[pos+7] AS gram
                FROM gp
            ), dupg AS (
                SELECT gram FROM g GROUP BY gram
                HAVING COUNT(DISTINCT doc_id) >= 2
            ), hits AS (
                SELECT g.doc_id, g.pos FROM g JOIN dupg USING (gram)
            ), covered AS (
                SELECT DISTINCT doc_id, pos + d.d AS t
                FROM hits CROSS JOIN
                     (SELECT unnest(range(0, 8)) AS d) d
            ), runs AS (
                SELECT doc_id, t,
                       t - ROW_NUMBER() OVER (PARTITION BY doc_id
                                              ORDER BY t) AS grp
                FROM covered
            ), spans AS (
                SELECT doc_id,
                       CAST(COUNT(DISTINCT grp) AS BIGINT) AS n_spans,
                       CAST(COUNT(*) AS BIGINT) AS dup_tokens
                FROM runs GROUP BY doc_id
            )
            SELECT CAST(s.doc_id AS BIGINT) AS doc_id, s.n_spans,
                   s.dup_tokens, CAST(len(t.w) AS BIGINT) AS n_tokens,
                   CAST(s.dup_tokens * 1000000 // len(t.w) AS BIGINT)
                       AS dup_ppm
            FROM spans s JOIN toks t USING (doc_id)
            ORDER BY doc_id
        """,
        # MinHash-LSH recall audit: md5-shared 16-perm signatures, 4x4
        # bands, exact shingle-Jaccard pair set rebuilt in SQL
        "docs_minhash_recall": r"""
            WITH toks AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '\s+'),
                                   x -> x != '') AS w
                FROM documents
            ), shs AS (
                SELECT doc_id,
                       list_distinct(list_transform(
                           range(1, greatest(len(w) - 1, 1)),
                           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
                FROM toks
            ), sizes AS (
                SELECT doc_id, len(s) AS n FROM shs
            ), tok AS MATERIALIZED (
                SELECT doc_id, unnest(s) AS sh FROM shs
            -- exact arm: the DIRECT co-occurrence aggregation is the
            -- scalable form here — this corpus has a small shared
            -- vocabulary (29k distinct shingles, sum f^2 ~ 2.5e8 at
            -- sf1), so the pair stream flows through one spill-friendly
            -- hash aggregate, while a ppjoin prefix join (dense
            -- postings defeat the filter) re-joins tens of millions of
            -- candidates against full postings and exceeds any spill
            -- budget.  Opposite trade from docs_ngram_dedup, which has
            -- mostly-unique shingles.
            ), copair AS (
                SELECT a.doc_id AS pa, b.doc_id AS pb, COUNT(*) AS co
                FROM tok a JOIN tok b
                  ON a.sh = b.sh AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            ), exact AS MATERIALIZED (
                SELECT pa, pb FROM copair
                JOIN sizes sa ON sa.doc_id = pa
                JOIN sizes sb ON sb.doc_id = pb
                WHERE co * 1000000 >= 500000 * (sa.n + sb.n - co)
            -- per-posting hashing STREAMS into a 50k x 16-group MIN
            -- aggregate (a materialized distinct-shingle hash table is
            -- ~200M rows at sf1, where word permutation makes most
            -- shingles unique — that was the OOM, not the md5 count)
            ), h AS (
                SELECT doc_id, i.i AS i,
                       MIN(CAST(('0x' || substr(md5(CAST(i.i AS VARCHAR)
                           || '|' || sh), 1, 8)) AS BIGINT)) AS mh
                FROM tok CROSS JOIN (SELECT UNNEST(RANGE(0, 16)) AS i) i
                GROUP BY doc_id, i.i
            ), bands AS (
                SELECT doc_id, CAST(i // 4 AS VARCHAR) || ':' ||
                       string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i) AS key
                FROM h GROUP BY doc_id, i // 4
            ), cands AS (
                SELECT DISTINCT a.doc_id AS pa, b.doc_id AS pb
                FROM bands a JOIN bands b
                  ON a.key = b.key AND a.doc_id < b.doc_id
            ), tp AS (
                SELECT COUNT(*) AS n FROM cands c
                JOIN exact e ON c.pa = e.pa AND c.pb = e.pb
            )
            SELECT CAST((SELECT COUNT(*) FROM exact) AS BIGINT) AS n_exact_pairs,
                   CAST((SELECT COUNT(*) FROM cands) AS BIGINT) AS n_candidate_pairs,
                   CAST((SELECT n FROM tp) AS BIGINT) AS n_true_candidates,
                   CAST(CASE WHEN (SELECT COUNT(*) FROM exact) = 0 THEN 1000000
                        ELSE 1000000 * (SELECT n FROM tp)
                             // (SELECT COUNT(*) FROM exact)
                        END AS BIGINT) AS recall_ppm
        """,
        # small-file compaction roundtrip: aggregate on the compacted
        # layout vs the original table
        "docs_compaction_roundtrip": """
            SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(doc_id) AS BIGINT) AS id_checksum,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars
            FROM documents GROUP BY lang ORDER BY lang
        """,
        # composed training-data build: dedup → quality → split → census
        # in ONE SQL chain (stage composition is what's being checked)
        "docs_training_build": f"""
            WITH f AS (
                SELECT doc_id, lang, text,
                       len(regexp_extract_all(text, '[A-Za-z0-9_]+'))
                           AS n_words,
                       len(regexp_extract_all(lower(text), '{stop_pat}'))
                           AS stop_hits,
                       len(list_filter(regexp_split_to_array(lower(text),
                                                             '\\s+'),
                                       x -> x != '')) AS ntok
                FROM documents
            ), d AS (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY text
                                             ORDER BY doc_id) AS rn
                FROM f
            ), k AS (
                SELECT * FROM d
                WHERE rn = 1 AND n_words >= 40
                  AND CAST(FLOOR(stop_hits * 1000000.0
                                 / GREATEST(n_words, 1)) AS BIGINT) >= 10000
            ), s AS (
                SELECT lang, ntok,
                       CASE
                           WHEN CAST(('0x' || substr(
                               md5(CAST(doc_id AS VARCHAR)), 1, 8))
                               AS BIGINT) % 10 < 8 THEN 'train'
                           WHEN CAST(('0x' || substr(
                               md5(CAST(doc_id AS VARCHAR)), 1, 8))
                               AS BIGINT) % 10 < 9 THEN 'val'
                           ELSE 'test'
                       END AS split
                FROM k
            )
            SELECT lang, split, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(ntok) AS BIGINT) AS n_tokens
            FROM s GROUP BY lang, split ORDER BY lang, split
        """,
        # shared-asset dedup: min-doc_id ownership per img:// ref, per-doc
        # borrowed-span counts (same synthesized-ref contract as
        # docs_media_ref_counts)
        "docs_media_asset_dedup": r"""
            WITH toks AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '\s+'),
                                   x -> x != '') AS w
                FROM documents
            ), tok AS (
                SELECT doc_id, unnest(w) AS word FROM toks
            ), m AS (
                SELECT doc_id, 'img://' || word AS ref FROM tok
                WHERE word LIKE 's%'
            ), cnt AS (
                SELECT doc_id, ref, COUNT(*) AS n FROM m GROUP BY doc_id, ref
            ), own AS (
                SELECT ref, MIN(doc_id) AS owner FROM cnt GROUP BY ref
            )
            SELECT c.doc_id,
                   CAST(SUM(c.n) AS BIGINT) AS n_media,
                   CAST(SUM(CASE WHEN o.owner = c.doc_id THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_owned_refs,
                   CAST(SUM(CASE WHEN o.owner <> c.doc_id THEN c.n ELSE 0 END)
                        AS BIGINT) AS n_dup_spans
            FROM cnt c JOIN own o USING (ref)
            GROUP BY c.doc_id ORDER BY c.doc_id
        """,
        # watermark + allowed-lateness WINDOW aggregate: the prior-arrival
        # running max of event time is the low watermark; an event is
        # dropped late iff ts < watermark - 2h (strict; first arrival
        # never late), accepted events aggregate into their event-time day
        "events_late_window_agg": """
            WITH w AS (
                SELECT ts, value,
                       MAX(ts) OVER (ORDER BY event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING) AS wm
                FROM events
            ), lab AS (
                SELECT date_trunc('day', ts) AS day,
                       (wm IS NOT NULL
                        AND ts < wm - INTERVAL 2 HOUR) AS late,
                       CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
                FROM w
            )
            SELECT day,
                   CAST(SUM(CASE WHEN late THEN 0 ELSE 1 END) AS BIGINT)
                       AS n_accepted,
                   CAST(SUM(CASE WHEN late THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_late,
                   CAST(SUM(CASE WHEN late THEN 0 ELSE cents END)
                        AS BIGINT) AS accepted_cents
            FROM lab GROUP BY day ORDER BY day
        """,
        # first-touch session attribution: purchases credit the session's
        # first event type; sessions break on >30-min gaps per user
        "events_session_attribution": """
            WITH e AS (
                SELECT user_id, ts, event_id, event_type, value,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR ts - lag(ts) OVER w
                                    > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS new_s
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), s AS (
                SELECT *, SUM(new_s) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id
                                           ROWS UNBOUNDED PRECEDING)
                              AS sid
                FROM e
            ), fs AS (
                SELECT user_id, sid, event_type AS first_touch,
                       ROW_NUMBER() OVER (PARTITION BY user_id, sid
                                          ORDER BY ts, event_id) AS rn
                FROM s
            ), pur AS (
                SELECT user_id, sid,
                       SUM(CASE WHEN event_type = 'purchase'
                                THEN 1 ELSE 0 END) AS np,
                       SUM(CASE WHEN event_type = 'purchase'
                                THEN CAST(FLOOR(value * 100 + 0.5)
                                          AS BIGINT) ELSE 0 END) AS c
                FROM s GROUP BY user_id, sid
            )
            SELECT f.first_touch,
                   CAST(COUNT(*) AS BIGINT) AS n_sessions,
                   CAST(SUM(p.np) AS BIGINT) AS n_purchases,
                   CAST(SUM(p.c) AS BIGINT) AS attributed_cents
            FROM fs f JOIN pur p USING (user_id, sid)
            WHERE f.rn = 1
            GROUP BY f.first_touch ORDER BY f.first_touch
        """,
        # concurrent-open-interval count: +1 at orderdate, -1 the day
        # after the last lineitem shipdate; n_open = running sum at each
        # delta day
        "orders_open_interval_count": """
            WITH last AS (
                SELECT l_orderkey, MAX(l_shipdate) AS m
                FROM lineitem GROUP BY l_orderkey
            ), iv AS (
                SELECT date_trunc('day', o.o_orderdate) AS sd,
                       date_trunc('day', l.m) + INTERVAL 1 DAY AS ed
                FROM orders o JOIN last l ON o.o_orderkey = l.l_orderkey
            ), deltas AS (
                SELECT sd AS day, 1 AS delta FROM iv
                UNION ALL
                SELECT ed AS day, -1 AS delta FROM iv
            ), h AS (
                SELECT day, SUM(delta) AS d FROM deltas GROUP BY day
            )
            SELECT day,
                   CAST(SUM(d) OVER (ORDER BY day) AS BIGINT) AS n_open
            FROM h ORDER BY day
        """,
        # exact discrete lower quantiles on integer cents per type:
        # p_q = min cents whose cumulative count reaches ceil(q*n/100)
        "events_value_percentiles": """
            WITH c AS (SELECT event_type,
                              CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                                  AS cents
                       FROM events),
            h AS (SELECT event_type, cents, COUNT(*) AS k
                  FROM c GROUP BY event_type, cents),
            cum AS (SELECT event_type, cents,
                           SUM(k) OVER (PARTITION BY event_type
                                        ORDER BY cents) AS ck,
                           SUM(k) OVER (PARTITION BY event_type) AS n
                    FROM h)
            SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_events,
                   CAST(MIN(CASE WHEN ck >= CAST(CEIL(0.50 * n) AS BIGINT)
                                 THEN cents END) AS BIGINT) AS p50_cents,
                   CAST(MIN(CASE WHEN ck >= CAST(CEIL(0.95 * n) AS BIGINT)
                                 THEN cents END) AS BIGINT) AS p95_cents,
                   CAST(MIN(CASE WHEN ck >= CAST(CEIL(0.99 * n) AS BIGINT)
                                 THEN cents END) AS BIGINT) AS p99_cents
            FROM cum GROUP BY event_type ORDER BY event_type
        """,
        # delete-aware CDC merge: final state per user = last op by
        # (ts, event_id); 'error' deletes the key; census the live keys
        "events_cdc_state": """
            WITH last AS (
                SELECT user_id, event_type, value,
                       ROW_NUMBER() OVER (PARTITION BY user_id
                                          ORDER BY ts DESC,
                                                   event_id DESC) AS rn
                FROM events)
            SELECT user_id % 7 AS segment,
                   CAST(COUNT(*) AS BIGINT) AS n_live,
                   CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS value_cents
            FROM last WHERE rn = 1 AND event_type <> 'error'
            GROUP BY segment ORDER BY segment
        """,
        # per-segment census through the hot-key-salted fact⋈dim join —
        # the twin derives the segment directly, so any row lost or
        # duplicated by the salting/replication mechanics hash-mismatches
        "events_salted_segment_join": """
            SELECT user_id % 7 AS segment,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS value_cents
            FROM events GROUP BY segment ORDER BY segment
        """,
        # last-value-wins compaction of the keyed event log
        "events_log_compaction": """
            SELECT user_id, event_type, ts AS last_ts, value AS last_value
            FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY user_id, event_type
                    ORDER BY ts DESC, event_id DESC) AS rn
                FROM events
            ) WHERE rn = 1
            ORDER BY user_id, event_type
        """,
        # posting-list build over the doc_id % 17 == 0 index shard
        "docs_inverted_index": r"""
            WITH toks AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '\s+'),
                                   x -> x != '') AS w
                FROM documents WHERE doc_id % 17 = 0
            ), tok AS (
                SELECT doc_id, unnest(w) AS word FROM toks
            ), dtok AS (
                SELECT DISTINCT doc_id, word FROM tok
            )
            SELECT word, CAST(COUNT(*) AS BIGINT) AS df_docs,
                   string_agg(CAST(doc_id AS VARCHAR), ','
                              ORDER BY doc_id) AS postings
            FROM dtok GROUP BY word ORDER BY df_docs DESC, word
        """,
        # per-language token totals + equalizing upweight factor (ppm)
        "docs_mixture_weights": r"""
            WITH lt AS (
                SELECT lang,
                       CAST(SUM(len(list_filter(
                           regexp_split_to_array(lower(text), '\s+'),
                           x -> x != ''))) AS BIGINT) AS lang_tokens
                FROM documents GROUP BY lang
            )
            SELECT lang, lang_tokens,
                   CAST((SELECT MIN(lang_tokens) FROM lt) * 1000000
                        // lang_tokens AS BIGINT) AS weight_ppm
            FROM lt ORDER BY lang
        """,
        # 80/10/10 split routed by the same md5-32 hash as the engine
        "docs_train_val_test": r"""
            WITH s AS (
                SELECT lang,
                       CASE
                           WHEN CAST(('0x' || substr(
                               md5(CAST(doc_id AS VARCHAR)), 1, 8))
                               AS BIGINT) % 10 < 8 THEN 'train'
                           WHEN CAST(('0x' || substr(
                               md5(CAST(doc_id AS VARCHAR)), 1, 8))
                               AS BIGINT) % 10 < 9 THEN 'val'
                           ELSE 'test'
                       END AS split,
                       len(list_filter(regexp_split_to_array(lower(text),
                                                             '\s+'),
                                       x -> x != '')) AS ntok
                FROM documents
            )
            SELECT lang, split, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(ntok) AS BIGINT) AS n_tokens
            FROM s GROUP BY lang, split ORDER BY lang, split
        """,
        # robust median/MAD outlier flagging per event type; both medians
        # are quantile_disc(0.5) = the (n-1)//2-th order statistic
        "events_anomaly_mad": """
            WITH v AS (
                SELECT event_id, event_type,
                       CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
                FROM events
            ), med AS (
                SELECT event_type, quantile_disc(cents, 0.5) AS med
                FROM v GROUP BY event_type
            ), dev AS (
                SELECT v.event_id, v.event_type, v.cents,
                       abs(v.cents - m.med) AS dev
                FROM v JOIN med m USING (event_type)
            ), mad AS (
                SELECT event_type, quantile_disc(dev, 0.5) AS mad
                FROM dev GROUP BY event_type
            )
            SELECT d.event_id, d.event_type, CAST(d.cents AS BIGINT) AS cents,
                   CAST(d.dev AS BIGINT) AS dev
            FROM dev d JOIN mad m USING (event_type)
            WHERE d.dev > 3 * m.mad
            ORDER BY d.event_id
        """,
        # first-order Markov transition table over per-user sequences,
        # probabilities as exact integer ppm of the row marginal
        "events_transition_matrix": """
            WITH seq AS (
                SELECT user_id, event_type,
                       LAG(event_type) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id)
                           AS prev_type
                FROM events
            ), counts AS (
                SELECT prev_type AS from_type, event_type AS to_type,
                       COUNT(*) AS n
                FROM seq WHERE prev_type IS NOT NULL
                GROUP BY 1, 2
            )
            SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
                   CAST(n * 1000000
                        // SUM(n) OVER (PARTITION BY from_type) AS BIGINT)
                       AS prob_ppm
            FROM counts ORDER BY from_type, to_type
        """,
        # forecast backtest: one-step MAE of naive-1 vs seasonal-12
        # over monthly revenue, evaluated where the lagged month exists
        "orders_backtest_mae": """
            WITH m AS (
                SELECT CAST(date_trunc('month', o_orderdate)
                            AS TIMESTAMP) AS mo,
                       SUM(CAST(FLOOR(o_totalprice * 100 + 0.5)
                                AS BIGINT)) AS cents
                FROM orders GROUP BY 1
            ), naive AS (
                SELECT ABS(a.cents - b.cents) AS err
                FROM m a JOIN m b ON b.mo = a.mo - INTERVAL 1 MONTH
            ), seas AS (
                SELECT ABS(a.cents - b.cents) AS err
                FROM m a JOIN m b ON b.mo = a.mo - INTERVAL 12 MONTH
            )
            SELECT 'naive_1' AS method,
                   CAST(COUNT(*) AS BIGINT) AS n_eval,
                   CAST(CASE WHEN COUNT(*) = 0 THEN 0
                             ELSE SUM(err) // COUNT(*) END AS BIGINT)
                       AS mae_cents
            FROM naive
            UNION ALL
            SELECT 'seasonal_12', CAST(COUNT(*) AS BIGINT),
                   CAST(CASE WHEN COUNT(*) = 0 THEN 0
                             ELSE SUM(err) // COUNT(*) END AS BIGINT)
            FROM seas
            ORDER BY method
        """,
        # rapid-repeat (retry-storm) audit: an event is a repeat iff
        # the same (user, type) fired within 1 h before it (LAG on the
        # identical key — engine's adjacent-row shift compare)
        "events_dup_within_window": """
            WITH l AS (
                SELECT event_type,
                       CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                                PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) <= 3600000000
                            THEN 1 ELSE 0 END AS dup
                FROM events
            )
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM(dup) AS BIGINT) AS n_dups,
                   CAST(SUM(dup) * 1000000 // COUNT(*) AS BIGINT)
                       AS dup_ppm
            FROM l GROUP BY 1 ORDER BY 1
        """,
        # cadence-regularity bot census: users with ≥5 gaps flag iff
        # IQR·10⁶ // median < 1.4·10⁶ (quantile_disc order statistics;
        # zero median = perfectly regular = bot)
        "events_bot_users": """
            WITH g AS (
                SELECT user_id,
                       epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id)
                           AS gap
                FROM events
            ), m AS (
                SELECT user_id,
                       quantile_disc(gap, 0.5) AS med,
                       quantile_disc(gap, 0.75)
                           - quantile_disc(gap, 0.25) AS iqr
                FROM g WHERE gap IS NOT NULL
                GROUP BY user_id HAVING COUNT(*) >= 5
            ), f AS (
                SELECT user_id,
                       CASE WHEN med = 0
                                 OR CAST(iqr AS HUGEINT) * 1000000
                                    // med < 1400000
                            THEN 1 ELSE 0 END AS is_bot
                FROM m
            )
            SELECT CAST(is_bot AS BIGINT) AS is_bot,
                   CAST(COUNT(*) AS BIGINT) AS n_users,
                   CAST(SUM(user_id) AS BIGINT) AS user_checksum
            FROM f GROUP BY 1 ORDER BY 1
        """,
        # last-touch attribution: latest same-user view STRICTLY before
        # each purchase, ≤24 h back, ties → larger event_id; purchases
        # with no qualifying view fall into view_hour = −1
        "events_attribution": """
            WITH p AS (
                SELECT event_id, user_id, ts,
                       CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
                FROM events WHERE event_type = 'purchase'
            ), v AS (
                SELECT event_id, user_id, ts FROM events
                WHERE event_type = 'view'
            ), j AS (
                SELECT p.event_id AS pid, v.ts AS vts,
                       ROW_NUMBER() OVER (PARTITION BY p.event_id
                           ORDER BY v.ts DESC, v.event_id DESC) AS rn
                FROM p JOIN v
                  ON p.user_id = v.user_id
                 AND v.ts < p.ts
                 AND v.ts >= p.ts - INTERVAL 24 HOURS
            ), best AS (
                SELECT pid, vts FROM j WHERE rn = 1
            )
            SELECT CASE WHEN b.vts IS NULL THEN CAST(-1 AS BIGINT)
                        ELSE CAST(EXTRACT(hour FROM b.vts) AS BIGINT)
                   END AS view_hour,
                   CAST(COUNT(*) AS BIGINT) AS n_purchases,
                   CAST(SUM(p.cents) AS BIGINT) AS cents_total
            FROM p LEFT JOIN best b ON b.pid = p.event_id
            GROUP BY 1 ORDER BY 1
        """,
        # DP-shaped noisy release: Laplace(10) by inverse CDF from the
        # md5 uniform (md5_32(type)+0.5)/2³² — deterministic so both
        # sides add the identical noise; sign(u−½)=0 at exactly ½
        "events_dp_counts": """
            WITH c AS (
                SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
                FROM events GROUP BY 1
            ), u AS (
                SELECT event_type, n,
                       (CAST(('0x' || substr(md5(event_type), 1, 8))
                             AS BIGINT) + 0.5) / 4294967296.0 AS u
                FROM c
            )
            SELECT event_type, n,
                   n + CAST(ROUND(-10.0 * sign(u - 0.5)
                            * ln(1 - 2 * abs(u - 0.5))) AS BIGINT)
                       AS noisy_n
            FROM u ORDER BY event_type
        """,
        # FastSS delete-1 blocking entity resolution: candidate pairs
        # share a (name ∪ one-char-deletes) variant, verified with exact
        # byte Levenshtein ≤ 1 — the blocking is lossless for distance 1
        # and BOTH sides run blocking + verify, so equivalence is exact
        "customer_er_pairs": """
            WITH v AS (
                SELECT c_custkey, c_name,
                       unnest(list_prepend(c_name, list_transform(
                           range(1, length(c_name) + 1),
                           i -> substr(c_name, 1, CAST(i - 1 AS INT))
                                || substr(c_name, CAST(i + 1 AS INT)))))
                           AS variant
                FROM customer
            ), cand AS (
                SELECT DISTINCT a.c_custkey AS custkey1,
                                b.c_custkey AS custkey2,
                                a.c_name AS n1, b.c_name AS n2
                FROM v a JOIN v b
                  ON a.variant = b.variant
                 AND a.c_custkey < b.c_custkey
            )
            SELECT custkey1, custkey2,
                   CAST(levenshtein(n1, n2) AS BIGINT) AS dist
            FROM cand WHERE levenshtein(n1, n2) <= 1
            ORDER BY custkey1, custkey2
        """,
        # per-state conditional entropy of the event-type Markov chain:
        # the transition-matrix counts folded through the
        # docs_char_entropy fixed-point-ln contract (micro-nats)
        "events_entropy_rate": """
            WITH seq AS (
                SELECT user_id, event_type,
                       LAG(event_type) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id)
                           AS prev_type
                FROM events
            ), counts AS (
                SELECT prev_type AS from_type, event_type AS to_type,
                       CAST(COUNT(*) AS BIGINT) AS n
                FROM seq WHERE prev_type IS NOT NULL
                GROUP BY 1, 2
            ), m AS (
                SELECT from_type, SUM(n) AS m,
                       CAST(COUNT(*) AS BIGINT) AS n_to
                FROM counts GROUP BY 1
            ), s AS (
                SELECT c.from_type,
                       SUM(c.n * CAST(ROUND(ln(CAST(m.m AS DOUBLE) / c.n)
                           * 1000000) AS BIGINT)) AS t
                FROM counts c JOIN m USING (from_type) GROUP BY 1
            )
            SELECT m.from_type, CAST(m.m AS BIGINT) AS n_trans, m.n_to,
                   CAST(s.t // m.m AS BIGINT) AS entropy_micro
            FROM m JOIN s USING (from_type) ORDER BY from_type
        """,
        # Pareto skyline of 1995 orders (price maximal, date minimal);
        # equal pairs don't dominate — NOT EXISTS keeps both
        "orders_skyline": """
            WITH o95 AS (
                SELECT o_orderkey,
                       CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
                           AS cents,
                       o_orderdate
                FROM orders
                WHERE o_orderdate >= TIMESTAMP '1995-01-01'
                  AND o_orderdate < TIMESTAMP '1996-01-01'
            )
            SELECT a.o_orderkey, a.cents, a.o_orderdate
            FROM o95 a
            WHERE NOT EXISTS (
                SELECT 1 FROM o95 b
                WHERE b.cents >= a.cents AND b.o_orderdate <= a.o_orderdate
                  AND (b.cents > a.cents OR b.o_orderdate < a.o_orderdate)
            )
            ORDER BY a.o_orderkey
        """,
        # seeded epoch shuffle: md5 shuffle key, exact global rank (the
        # engine ranks via bucket histograms, never a global sort)
        "docs_epoch_shuffle": """
            WITH k AS (
                SELECT doc_id,
                       CAST(('0x' || substr(md5('1-' ||
                           CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS skey
                FROM documents
            ), r AS (
                SELECT doc_id, skey,
                       ROW_NUMBER() OVER (ORDER BY skey, doc_id) - 1 AS pos
                FROM k
            )
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(skey AS BIGINT) AS skey,
                   CAST(pos AS BIGINT) AS pos,
                   CAST(pos % 8 AS BIGINT) AS shard
            FROM r ORDER BY doc_id
        """,
        # SemDeDup: nearest-seed-centroid assignment (the emb_kmeans_assign
        # contract) then drop-if-lower-id-neighbor-≥-tau within the cluster
        "emb_semdedup": """
            WITH cents AS (
                SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS ce
                FROM embeddings WHERE vec_id < 8
            ), scored AS (
                SELECT e.vec_id, c.cid,
                       ROUND(list_cosine_similarity(
                           CAST(e.embedding AS DOUBLE[]), c.ce), 6) AS score
                FROM embeddings e CROSS JOIN cents c
            ), best AS (
                SELECT vec_id, cid,
                       ROW_NUMBER() OVER (PARTITION BY vec_id
                                          ORDER BY score DESC, cid) AS rn
                FROM scored
            ), assign AS (
                SELECT vec_id, cid FROM best WHERE rn = 1
            ), dropped AS (
                SELECT DISTINCT a.vec_id
                FROM assign a
                JOIN assign b ON a.cid = b.cid AND b.vec_id < a.vec_id
                JOIN embeddings ea ON ea.vec_id = a.vec_id
                JOIN embeddings eb ON eb.vec_id = b.vec_id
                WHERE ROUND(list_cosine_similarity(
                          CAST(ea.embedding AS DOUBLE[]),
                          CAST(eb.embedding AS DOUBLE[])), 6) >= 0.40
            )
            SELECT CAST(a.vec_id AS BIGINT) AS vec_id,
                   CAST(a.cid AS BIGINT) AS cluster_id
            FROM assign a
            WHERE a.vec_id NOT IN (SELECT vec_id FROM dropped)
            ORDER BY a.vec_id
        """,
        # hashed-linear quality classifier: md5-shared feature hashing, the
        # pinned integer weight expression w(b) = (b·2654435761) % 2003 − 1001
        "docs_quality_classifier": r"""
            WITH w AS (
                SELECT doc_id,
                       unnest(list_filter(regexp_split_to_array(lower(text),
                                                                '\s+'),
                                          x -> x != '')) AS word
                FROM documents
            ), scored AS (
                SELECT doc_id,
                       (CAST(('0x' || substr(md5(word), 1, 8)) AS BIGINT)
                           % 1024) * 2654435761 % 2003 - 1001 AS wgt
                FROM w
            )
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_tokens,
                   CAST(SUM(wgt) AS BIGINT) AS score_sum,
                   CASE WHEN SUM(wgt) >= 0 THEN 'keep' ELSE 'drop' END AS label
            FROM scored GROUP BY doc_id ORDER BY doc_id
        """,
        # DSIR importance ratios: add-one-smoothed 256-bucket hashed-unigram
        # target/raw frequency ratio in exact integer ppm (HUGEINT twin of
        # the engine's Python big-int arithmetic)
        "docs_dsir_weights": r"""
            WITH w AS (
                SELECT doc_id, lang,
                       CAST(('0x' || substr(md5(word), 1, 8)) AS BIGINT)
                           % 256 AS b
                FROM (SELECT doc_id, lang,
                             unnest(list_filter(
                                 regexp_split_to_array(lower(text), '\s+'),
                                 x -> x != '')) AS word
                      FROM documents)
            ), counts AS (
                SELECT b, COUNT(*) AS r_b,
                       COUNT(*) FILTER (WHERE lang = 'en') AS t_b
                FROM w GROUP BY b
            ), tot AS (
                SELECT SUM(r_b) AS R, SUM(t_b) AS T FROM counts
            ), ratios AS (
                SELECT b,
                       CAST((CAST(t_b + 1 AS HUGEINT) * (R + 256) * 1000000)
                            // (CAST(r_b + 1 AS HUGEINT) * (T + 256))
                            AS BIGINT) AS ratio_ppm
                FROM counts, tot
            )
            SELECT CAST(w.doc_id AS BIGINT) AS doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_tokens,
                   CAST(SUM(r.ratio_ppm) AS BIGINT) AS dsir_sum
            FROM w JOIN ratios r USING (b)
            GROUP BY w.doc_id ORDER BY doc_id
        """,
        # edit-distance fuzzy dedup on normalized 32-char heads: drop iff a
        # same-lang lower-id doc sits within Levenshtein 4 (±4 length band)
        "docs_edit_dedup": r"""
            -- pigeonhole candidate generation (Navarro partition filter):
            -- ed(a,b) <= 4 with a's head split into 5 pieces forces one
            -- piece to occur EXACTLY in b's head, shifted at most 4 —
            -- so candidates join a's pieces against b's shifted
            -- substrings, and the exact levenshtein runs only on them
            -- (the per-lang all-pairs form is quadratic: wedged at sf1)
            WITH hl AS MATERIALIZED (
                SELECT doc_id, lang,
                       substr(regexp_replace(lower(COALESCE(text, '')),
                                             '\s+', ' ', 'g'), 1, 32)
                           AS head,
                       length(substr(regexp_replace(lower(COALESCE(text,
                           '')), '\s+', ' ', 'g'), 1, 32)) AS lh
                FROM documents
            ), seg AS MATERIALIZED (
                SELECT doc_id, lang, lh, i.i AS i,
                       substr(head, (i.i * lh) // 5 + 1,
                              ((i.i + 1) * lh) // 5 - (i.i * lh) // 5)
                           AS piece
                FROM hl CROSS JOIN (SELECT UNNEST(RANGE(0, 5)) AS i) i
                WHERE ((i.i + 1) * lh) // 5 - (i.i * lh) // 5 > 0
            ), probe AS MATERIALIZED (
                SELECT DISTINCT hl.doc_id, hl.lang,
                       hl.lh + dl.dl AS lh_a, i.i AS i,
                       substr(hl.head,
                              (i.i * (hl.lh + dl.dl)) // 5 + 1 + d.d,
                              ((i.i + 1) * (hl.lh + dl.dl)) // 5
                                  - (i.i * (hl.lh + dl.dl)) // 5) AS piece
                FROM hl
                CROSS JOIN (SELECT UNNEST(RANGE(-4, 5)) AS dl) dl
                CROSS JOIN (SELECT UNNEST(RANGE(0, 5)) AS i) i
                CROSS JOIN (SELECT UNNEST(RANGE(-4, 5)) AS d) d
                WHERE hl.lh + dl.dl >= 1
                  AND ((i.i + 1) * (hl.lh + dl.dl)) // 5
                          - (i.i * (hl.lh + dl.dl)) // 5 > 0
                  AND (i.i * (hl.lh + dl.dl)) // 5 + 1 + d.d >= 1
                  AND (i.i * (hl.lh + dl.dl)) // 5 + d.d
                          + ((i.i + 1) * (hl.lh + dl.dl)) // 5
                          - (i.i * (hl.lh + dl.dl)) // 5 <= hl.lh
            ), cand AS MATERIALIZED (
                SELECT DISTINCT s.doc_id AS a_id, p.doc_id AS b_id
                FROM seg s JOIN probe p
                  ON p.lang = s.lang AND p.i = s.i
                 AND p.lh_a = s.lh AND p.piece = s.piece
                 AND p.doc_id < s.doc_id
                UNION
                -- the pigeonhole argument needs every piece of the split
                -- side nonempty (len >= 5); when BOTH heads are shorter,
                -- brute-force the (tiny) short-short block
                SELECT a.doc_id AS a_id, b.doc_id AS b_id
                FROM hl a JOIN hl b
                  ON a.lang = b.lang AND b.doc_id < a.doc_id
                 AND a.lh < 5 AND b.lh < 5
            ), dropped AS (
                SELECT DISTINCT c.a_id AS doc_id
                FROM cand c
                JOIN hl a ON a.doc_id = c.a_id
                JOIN hl b ON b.doc_id = c.b_id
                WHERE abs(a.lh - b.lh) <= 4
                  AND levenshtein(a.head, b.head) <= 4
            )
            SELECT CAST(doc_id AS BIGINT) AS doc_id FROM hl
            WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
            ORDER BY doc_id
        """,
        # shared vocabulary per language pair (unbounded-domain set
        # intersection; the engine uses word-bucket membership matrices)
        "docs_lang_vocab_overlap": r"""
            WITH toks AS (
                SELECT lang,
                       list_filter(regexp_split_to_array(lower(text), '\s+'),
                                   x -> x != '') AS w
                FROM documents
            ), tok AS (
                SELECT lang, unnest(w) AS word FROM toks
            ), lw AS (
                SELECT DISTINCT lang, word FROM tok
            )
            SELECT a.lang AS lang_a, b.lang AS lang_b,
                   CAST(COUNT(*) AS BIGINT) AS n_shared
            FROM lw a JOIN lw b ON a.word = b.word AND a.lang < b.lang
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        # incremental-ingest dedup: arrivals (odd doc_id) vs the ingested
        # corpus (even doc_id); shared md5 hash, first arrival wins
        "docs_incremental_dedup": """
            WITH base AS (
                SELECT DISTINCT md5(text) AS h FROM documents
                WHERE doc_id % 2 = 0
            ), inc AS (
                SELECT doc_id, lang, md5(text) AS h FROM documents
                WHERE doc_id % 2 = 1
            ), surv AS (
                SELECT lang FROM (
                    SELECT i.lang, row_number() OVER (
                        PARTITION BY i.h ORDER BY i.doc_id) AS rn
                    FROM inc i
                    WHERE NOT EXISTS (SELECT 1 FROM base b WHERE b.h = i.h)
                ) WHERE rn = 1
            ), n_in AS (
                SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_incoming
                FROM inc GROUP BY lang
            ), n_sv AS (
                SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_survivors
                FROM surv GROUP BY lang
            )
            SELECT n_in.lang, n_in.n_incoming,
                   CAST(COALESCE(n_sv.n_survivors, 0) AS BIGINT)
                       AS n_survivors
            FROM n_in LEFT JOIN n_sv USING (lang) ORDER BY n_in.lang
        """,
        # top bigram collocations by scaled lift (integer-exact monotone
        # twin of PMI); engine joins c(w1)/c(w2) via two word-hash-bucket
        # exchanges, min-support filtered before scoring
        # per-language Simpson diversity: exact-integer collision
        # probability Σn(n−1) // (N(N−1)) in HUGEINT; langs with N<2
        # emit no row
        "docs_simpson_diversity": r"""
            WITH tok AS (
                SELECT lang,
                       unnest(list_filter(
                           regexp_split_to_array(lower(text), '\s+'),
                           x -> x != '')) AS word
                FROM documents
            ), c AS (
                SELECT lang, word, CAST(COUNT(*) AS BIGINT) AS n
                FROM tok GROUP BY 1, 2
            )
            SELECT lang,
                   CAST(SUM(n) AS BIGINT) AS n_tokens,
                   CAST(CAST(1000000 AS HUGEINT)
                        * SUM(CAST(n AS HUGEINT) * (n - 1))
                        // (SUM(n) * (SUM(n) - 1)) AS BIGINT)
                       AS simpson_ppm
            FROM c GROUP BY lang HAVING SUM(n) >= 2
            ORDER BY lang
        """,
        # word burstiness: exact-integer Fano factor (var/mean · 10⁶) of
        # per-document counts over ALL D docs (zeros included);
        # min-support 10, top-30 by (fano DESC, word)
        "docs_burstiness": r"""
            WITH d AS (
                SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM documents
            ), tok AS (
                SELECT doc_id,
                       unnest(list_filter(
                           regexp_split_to_array(lower(text), '\s+'),
                           x -> x != '')) AS word
                FROM documents
            ), c AS (
                SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS c
                FROM tok GROUP BY 1, 2
            ), s AS (
                SELECT word, SUM(c) AS tot, SUM(c * c) AS ss,
                       CAST(COUNT(*) AS BIGINT) AS df
                FROM c GROUP BY word HAVING SUM(c) >= 10
            )
            SELECT word, CAST(tot AS BIGINT) AS tot, df,
                   CAST((d.nd * ss - tot * tot) * 1000000
                        // (d.nd * tot) AS BIGINT) AS fano_ppm
            FROM s, d
            ORDER BY fano_ppm DESC, word LIMIT 30
        """,
        # per-language hapax legomenon share over the lower().split()
        # vocabulary; trunc-div on non-negative operands ≡ floor-div
        "docs_hapax_ratio": r"""
            WITH tok AS (
                SELECT lang,
                       unnest(list_filter(
                           regexp_split_to_array(lower(text), '\s+'),
                           x -> x != '')) AS word
                FROM documents
            ), c AS (
                SELECT lang, word, COUNT(*) AS n
                FROM tok GROUP BY 1, 2
            )
            SELECT lang,
                   CAST(COUNT(*) AS BIGINT) AS n_distinct,
                   CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_hapax,
                   CAST(1000000 * SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END)
                        // COUNT(*) AS BIGINT) AS hapax_ppm
            FROM c GROUP BY lang ORDER BY lang
        """,
        # TextRank keywords: two integer-ppm PageRank iterations (the
        # parts_pagerank 850/1000 damping contract) over the undirected
        # adjacent-word graph; docs_bigram_lift tokenization; top-20 by
        # (rank DESC, word)
        "docs_textrank": r"""
            WITH toks AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '\s+'),
                                   x -> x != '') AS w
                FROM documents
            ), big0 AS (
                SELECT doc_id, UNNEST(range(1, len(w))) AS i, w FROM toks
            ), big AS (
                SELECT w[i] AS a, w[i + 1] AS b FROM big0
                WHERE w[i] <> w[i + 1]
            ), e AS (
                SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n FROM (
                    SELECT a AS src, b AS dst FROM big
                    UNION ALL SELECT b, a FROM big
                ) GROUP BY 1, 2
            ), o AS (
                SELECT src, CAST(SUM(n) AS BIGINT) AS outw
                FROM e GROUP BY src
            ), c1 AS (
                SELECT e.dst,
                       CAST(SUM(1000000 * e.n // o.outw) AS BIGINT) AS c
                FROM e JOIN o USING (src) GROUP BY e.dst
            ), r1 AS (
                SELECT dst AS node,
                       CAST(150000 + 850 * c // 1000 AS BIGINT) AS r
                FROM c1
            ), c2 AS (
                SELECT e.dst,
                       CAST(SUM(r1.r * e.n // o.outw) AS BIGINT) AS c
                FROM e JOIN o USING (src)
                JOIN r1 ON r1.node = e.src
                GROUP BY e.dst
            )
            SELECT dst AS word,
                   CAST(150000 + 850 * c // 1000 AS BIGINT) AS rank_ppm
            FROM c2 ORDER BY rank_ppm DESC, word LIMIT 20
        """,
        # per-document character Shannon entropy in micro-nats: per-char
        # term c·round(ln(n/c)·1e6) (fixed-point-ln contract), exact
        # integer sum, one trunc-div by n; empty docs emit no row
        "docs_char_entropy": """
            WITH ch AS (
                SELECT doc_id, unnest(string_split_regex(text, '')) AS ch
                FROM documents
            ), c AS (
                SELECT doc_id, ch, CAST(COUNT(*) AS BIGINT) AS c
                FROM ch WHERE ch <> '' GROUP BY 1, 2
            ), n AS (
                SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
                       CAST(COUNT(*) AS BIGINT) AS n_distinct
                FROM c GROUP BY 1
            ), s AS (
                SELECT c.doc_id,
                       SUM(c.c * CAST(ROUND(ln(CAST(n.n AS DOUBLE) / c.c)
                           * 1000000) AS BIGINT)) AS t
                FROM c JOIN n USING (doc_id) GROUP BY 1
            )
            SELECT n.doc_id, n.n AS n_chars, n.n_distinct,
                   CAST(s.t // n.n AS BIGINT) AS entropy_micro
            FROM n JOIN s USING (doc_id) ORDER BY n.doc_id
        """,
        # pairwise Jensen–Shannon divergence between language unigram
        # distributions: per-word fixed-point ln (round(ln·10⁶), the zipf
        # contract), exact-integer sums (HUGEINT), trunc-div halves
        "docs_js_divergence": """
            WITH w AS (
                SELECT lang, unnest(string_split(text, ' ')) AS word
                FROM documents
            ), c AS (
                SELECT lang, word, CAST(COUNT(*) AS BIGINT) AS n
                FROM w WHERE word <> '' GROUP BY 1, 2
            ), t AS (
                SELECT lang, SUM(n) AS tot FROM c GROUP BY lang
            ), p AS (
                SELECT t1.lang AS l1, t2.lang AS l2,
                       t1.tot AS ta, t2.tot AS tb
                FROM t t1 JOIN t t2 ON t1.lang < t2.lang
            ), v AS (
                SELECT DISTINCT p.l1, p.l2, p.ta, p.tb, c.word
                FROM p JOIN c ON c.lang IN (p.l1, p.l2)
            ), u AS (
                SELECT v.l1, v.l2, v.ta, v.tb, v.word,
                       COALESCE(ca.n, 0) AS a, COALESCE(cb.n, 0) AS b
                FROM v
                LEFT JOIN c ca ON ca.lang = v.l1 AND ca.word = v.word
                LEFT JOIN c cb ON cb.lang = v.l2 AND cb.word = v.word
            ), s AS (
                SELECT l1, l2, ta, tb,
                       CAST(COUNT(*) AS BIGINT) AS n_words,
                       SUM(CASE WHEN a > 0 THEN a * CAST(ROUND(ln(
                           (2.0 * a * tb) /
                           (CAST(a AS DOUBLE) * tb + CAST(b AS DOUBLE) * ta))
                           * 1000000) AS BIGINT) ELSE 0 END) AS sa,
                       SUM(CASE WHEN b > 0 THEN b * CAST(ROUND(ln(
                           (2.0 * b * ta) /
                           (CAST(b AS DOUBLE) * ta + CAST(a AS DOUBLE) * tb))
                           * 1000000) AS BIGINT) ELSE 0 END) AS sb
                FROM u GROUP BY 1, 2, 3, 4
            )
            SELECT l1 AS lang1, l2 AS lang2, n_words,
                   CAST(sa // (2 * ta) + sb // (2 * tb) AS BIGINT)
                       AS jsd_micro
            FROM s ORDER BY l1, l2
        """,
        # RAKE keyphrases: maximal non-stopword alpha-token runs; the
        # stoplist literal is pinned independently in
        # tests/test_pinned_constants.py; explicit ASCII blank class so
        # RE2 and Python tokenize identically
        "docs_rake_keywords": r"""
            WITH tok AS (
                SELECT doc_id,
                       regexp_extract_all(lower(text),
                                          '[a-z]+|[^a-z\t\n\f\r ]+') AS toks
                FROM documents
            ), w AS (
                SELECT doc_id,
                       CAST(generate_subscripts(toks, 1) AS BIGINT) AS ord,
                       unnest(toks) AS tok
                FROM tok
            ), nw AS (
                SELECT doc_id, ord, tok,
                       ord - ROW_NUMBER() OVER (PARTITION BY doc_id
                                                ORDER BY ord) AS grp
                FROM w
                WHERE regexp_matches(tok, '^[a-z]')
                  AND tok NOT IN (
                    'the','and','of','to','a','in','is','it','for','on',
                    'with','as','at','by','an','be','this','that','are',
                    'was','or','from','but','not','have','has','had','we',
                    'you','they')
            ), ph AS (
                SELECT doc_id, grp, COUNT(*) AS plen,
                       string_agg(tok, ' ' ORDER BY ord) AS phrase
                FROM nw GROUP BY doc_id, grp
            ), ws AS (
                SELECT nw.tok AS word, COUNT(*) AS freq,
                       SUM(ph.plen) AS deg
                FROM nw JOIN ph USING (doc_id, grp)
                GROUP BY nw.tok
            ), sc AS (
                SELECT word, deg * 1000000 // freq AS wscore FROM ws
            ), oc AS (
                SELECT nw.doc_id, nw.grp, SUM(sc.wscore) AS psum
                FROM nw JOIN sc ON nw.tok = sc.word
                GROUP BY nw.doc_id, nw.grp
            )
            SELECT ph.phrase,
                   CAST(COUNT(*) AS BIGINT) AS n_occ,
                   CAST(MIN(oc.psum) AS BIGINT) AS score
            FROM ph JOIN oc USING (doc_id, grp)
            GROUP BY ph.phrase
            ORDER BY score DESC, phrase LIMIT 20
        """,
        "docs_bigram_lift": r"""
            WITH toks AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '\s+'),
                                   x -> x != '') AS w
                FROM documents
            ), big0 AS (
                SELECT doc_id, UNNEST(range(1, len(w))) AS i, w FROM toks
            ), big AS (
                SELECT w[i] AS w1, w[i + 1] AS w2 FROM big0
            ), tok AS (
                SELECT UNNEST(w) AS word FROM toks
            ), uni AS (
                SELECT word, CAST(COUNT(*) AS BIGINT) AS c
                FROM tok GROUP BY word
            ), total AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM tok),
            bc AS (
                SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n
                FROM big GROUP BY w1, w2 HAVING COUNT(*) >= 5
            )
            SELECT bc.w1, bc.w2, bc.n,
                   u1.c AS c1, u2.c AS c2,
                   CAST(bc.n * (SELECT t FROM total) * 1000000
                        // (u1.c * u2.c) AS BIGINT) AS lift_q
            FROM bc
            JOIN uni u1 ON bc.w1 = u1.word
            JOIN uni u2 ON bc.w2 = u2.word
            ORDER BY lift_q DESC, w1, w2 LIMIT 20
        """,
        # integer Flesch-style readability: regex-class run counts (the
        # engine runs the identical three classes per row), trunc-div on
        # non-negative operands ≡ floor-div
        "docs_readability": r"""
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(w AS BIGINT) AS n_words,
                   CAST(s AS BIGINT) AS n_sents,
                   CAST(y AS BIGINT) AS n_syll,
                   CAST(206835 - 1015 * w // s - 84600 * y // w
                        AS BIGINT) AS flesch_milli
            FROM (
                SELECT doc_id,
                       len(regexp_extract_all(text, '\S+')) AS w,
                       GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1)
                           AS s,
                       len(regexp_extract_all(lower(text), '[aeiouy]+'))
                           AS y
                FROM documents
            ) WHERE w > 0 ORDER BY doc_id
        """,
        # Heaps'-law vocabulary growth: distinct words first seen at or
        # before each of 8 equal-width doc_id prefix boundaries
        "docs_vocab_growth": r"""
            WITH dom AS (
                SELECT MIN(doc_id) AS lo, MAX(doc_id) AS hi FROM documents
            ), toks AS (
                SELECT doc_id,
                       UNNEST(list_filter(
                           regexp_split_to_array(lower(text), '\s+'),
                           x -> x != '')) AS word
                FROM documents
            ), firsts AS (
                SELECT word, MIN(doc_id) AS first_doc FROM toks
                GROUP BY word
            ), ks AS (
                SELECT UNNEST(range(1, 9)) AS k
            )
            SELECT CAST(ks.k AS BIGINT) AS k,
                   CAST(dom.lo - 1 + ((dom.hi - dom.lo + 1) * ks.k) // 8
                        AS BIGINT) AS t_doc,
                   CAST(COALESCE(SUM(CASE WHEN f.first_doc <=
                            dom.lo - 1 + ((dom.hi - dom.lo + 1) * ks.k) // 8
                        THEN 1 ELSE 0 END), 0) AS BIGINT) AS vocab
            FROM ks, dom
            LEFT JOIN firsts f ON TRUE
            WHERE dom.lo IS NOT NULL
            GROUP BY ks.k, dom.lo, dom.hi
            ORDER BY k
        """,
        # content-defined chunking census: boundary AFTER every word whose
        # md5-32 ≡ 0 (mod 8); shared = chunk text in ≥2 distinct docs.
        # Chunk identity via the same md5 on both sides.
        "docs_cdc_chunks": r"""
            WITH toks AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '\s+'),
                                   x -> x != '') AS w
                FROM documents
            ), pos AS (
                SELECT doc_id, UNNEST(range(1, len(w) + 1)) AS i, w
                FROM toks WHERE len(w) > 0
            ), marked AS (
                SELECT doc_id, i, w[i] AS word,
                       CASE WHEN CAST(('0x' || substr(md5(w[i]), 1, 8))
                                 AS BIGINT) % 8 = 0
                            THEN 1 ELSE 0 END AS brk
                FROM pos
            ), cids AS (
                SELECT doc_id, i, word,
                       COALESCE(SUM(brk) OVER (
                           PARTITION BY doc_id ORDER BY i
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING), 0) AS cid
                FROM marked
            ), chunks AS (
                SELECT doc_id, cid,
                       md5(string_agg(word, ' ' ORDER BY i)) AS h
                FROM cids GROUP BY doc_id, cid
            ), shared AS (
                SELECT h FROM chunks
                GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2
            )
            SELECT CAST(c.doc_id AS BIGINT) AS doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_chunks,
                   CAST(SUM(CASE WHEN s.h IS NOT NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_shared
            FROM chunks c LEFT JOIN shared s ON c.h = s.h
            GROUP BY c.doc_id
            ORDER BY doc_id
        """,
        # histogram of exact-duplicate group sizes (engine groups by
        # sha256(text) prefix; SQL groups by the text itself — identical
        # absent a 64-bit hash collision)
        "docs_dup_cluster_sizes": """
            WITH g AS (
                SELECT COUNT(*) AS group_size FROM documents GROUP BY text
            )
            SELECT CAST(group_size AS BIGINT) AS group_size,
                   CAST(COUNT(*) AS BIGINT) AS n_groups
            FROM g GROUP BY group_size ORDER BY group_size
        """,
        "docs_sentiment": _sentiment_sql(),
        "docs_primary_topic": _primary_topic_sql(),
        "docs_top_per_source": """
            SELECT doc_id, source, n_chars FROM (
                SELECT doc_id, source, n_chars,
                       row_number() OVER (
                           PARTITION BY source
                           ORDER BY n_chars DESC, doc_id) AS rn
                FROM documents) WHERE rn <= 3
            ORDER BY source, doc_id
        """,
        # decontamination oracle: word-8-gram overlap of training docs
        # (doc_id % 7 <> 0) against the benchmark split (doc_id % 7 = 0);
        # n_hits = distinct overlapping grams per training doc
        "docs_decontaminate": r"""
            WITH toks AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '\s+'),
                                   x -> x != '') AS w
                FROM documents
            ), sh AS (
                SELECT doc_id,
                       list_distinct(list_transform(range(1, len(w) - 6),
                           i -> {G8})) AS s
                FROM toks
            ), bench AS (
                SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 7 = 0
            ), hits AS (
                SELECT t.doc_id, COUNT(*) AS n_hits
                FROM (SELECT doc_id, unnest(s) AS g FROM sh
                      WHERE doc_id % 7 <> 0) t
                JOIN bench USING (g) GROUP BY t.doc_id
            )
            SELECT doc_id, CAST(n_hits AS BIGINT) AS n_hits
            FROM hits ORDER BY doc_id
        """.replace("{G8}", " || ' ' || ".join(f"w[i+{j}]" for j in range(8))),
        # the engine writes documents through the partitioned sink and
        # reads them back; the oracle aggregates the ORIGINAL table — a
        # row lost/duplicated/mutated in the write→read path mismatches
        "docs_write_roundtrip": """
            SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(doc_id) AS BIGINT) AS id_checksum,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars
            FROM documents GROUP BY lang ORDER BY lang
        """,
        # kill-and-resume through the exactly-once partitioned sink must
        # conserve every row — the aggregate over the resumed layout
        # equals the aggregate over the original table
        "docs_write_exactly_once": """
            SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(doc_id) AS BIGINT) AS id_checksum,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars
            FROM documents GROUP BY lang ORDER BY lang
        """,
        # deterministic stratified sample: keep iff
        # ((doc_id*K) mod 2^32) mod 100 < rate(lang) — same arithmetic as
        # docqueries._SAMPLE_* so the exact sample set is pinned
        "docs_stratified_sample": """
            SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_sampled,
                   CAST(SUM(doc_id) AS BIGINT) AS id_checksum,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars
            FROM documents
            WHERE ((doc_id * 2654435761) % 4294967296) % 100 <
                  CASE lang WHEN 'en' THEN 50 WHEN 'de' THEN 30
                            WHEN 'fr' THEN 20 WHEN 'es' THEN 10
                            ELSE 5 END
            GROUP BY lang ORDER BY lang
        """,
        # intra-doc duplicate-8-gram ratio; grams built exactly like the
        # decontaminate oracle (lowercase whitespace split, 8-word join)
        "docs_repetition": r"""
            WITH toks AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '\s+'),
                                   x -> x != '') AS w
                FROM documents
            ), sh AS (
                SELECT doc_id,
                       list_transform(range(1, len(w) - 6), i -> {G8}) AS g
                FROM toks
            )
            SELECT doc_id,
                   CAST(len(g) AS BIGINT) AS n_grams,
                   CAST(len(list_distinct(g)) AS BIGINT) AS n_distinct,
                   CAST(FLOOR((len(g) - len(list_distinct(g))) * 1000000.0
                              / GREATEST(len(g), 1)) AS BIGINT) AS dup_ppm
            FROM sh ORDER BY doc_id
        """.replace("{G8}", " || ' ' || ".join(f"w[i+{j}]" for j in range(8))),
        "docs_exact_dedup": """
            SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
            FROM documents GROUP BY text ORDER BY doc_id
        """,
        # cross-document duplicate-8-gram share; grams tokenized exactly
        # like the repetition oracle (lowercase whitespace split), deduped
        # per doc, "duplicate" = present in >= 2 distinct docs.  The
        # engine compares 64-bit gram hashes; the oracle compares exact
        # strings (collision risk documented in docqueries.docs_crossdup).
        "docs_crossdup": r"""
            WITH toks AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '\s+'),
                                   x -> x != '') AS w
                FROM documents
            ), sh AS (
                SELECT doc_id,
                       list_distinct(list_transform(range(1, len(w) - 6),
                                                    i -> {G8})) AS g
                FROM toks
            ), dg AS (
                SELECT doc_id, UNNEST(g) AS gram FROM sh
            ), dup AS (
                SELECT gram FROM dg GROUP BY gram HAVING COUNT(*) >= 2
            ), per_doc AS (
                SELECT dg.doc_id, COUNT(*) AS ng,
                       SUM(CASE WHEN dup.gram IS NOT NULL
                                THEN 1 ELSE 0 END) AS nd
                FROM dg LEFT JOIN dup USING (gram)
                GROUP BY dg.doc_id
            )
            SELECT t.doc_id,
                   CAST(COALESCE(p.ng, 0) AS BIGINT) AS n_distinct_grams,
                   CAST(FLOOR(COALESCE(p.nd, 0) * 1000000.0
                              / GREATEST(COALESCE(p.ng, 0), 1)) AS BIGINT)
                       AS crossdup_ppm
            FROM toks t LEFT JOIN per_doc p USING (doc_id)
            ORDER BY doc_id
        """.replace("{G8}", " || ' ' || ".join(f"w[i+{j}]" for j in range(8))),
        # n-gram-Jaccard dedup oracle: brute-force exact word-3-shingle
        # Jaccard over all pairs, drop any doc with a smaller-id neighbor at
        # >= 0.7.  Two corpus-validated assumptions (both re-checked by the
        # pytest oracle, tests/test_relational-style): (a) LSH candidate
        # recall is 1 for the testdata's >=0.7 pairs, (b) near-dup clusters
        # are cliques, where greedy keep-first == drop-if-smaller-neighbor.
        # inverted-index form, NOT the naive all-pairs list_intersect join:
        # a pair below the 0.7 Jaccard bar with ZERO shared shingles can
        # never qualify, so intersections are aggregated only over pairs
        # co-occurring under some shingle (token equi-join + GROUP BY —
        # ~1M co-pair rows at sf0.1 vs 12.5M list_intersect evaluations,
        # which wedged the sf0.1 gate for 30+ min); the both-empty special
        # case joins only the empty-shingle docs
        "docs_ngram_dedup": r"""
            -- prefix-filtered exact Jaccard (ppjoin): under the global
            -- canonical shingle order (df asc, shingle), J(A,B) >= 0.7
            -- forces the length-(n - ceil(0.7 n) + 1) prefixes to
            -- intersect, so candidate pairs come from a PREFIX-only
            -- inverted index (the full-index co-occurrence join is
            -- quadratic in posting length and wedged at the synthesized
            -- sf1); intersections are then counted exactly per candidate
            WITH toks AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '\s+'),
                                   x -> x != '') AS w
                FROM documents
            ), sh AS MATERIALIZED (
                SELECT doc_id,
                       CASE WHEN len(w) < 3 THEN []::VARCHAR[]
                       ELSE list_distinct(list_transform(range(1, len(w) - 1),
                                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) END AS s
                FROM toks
            ), sizes AS MATERIALIZED (
                SELECT doc_id, len(s) AS n FROM sh
            ), tok AS MATERIALIZED (
                SELECT doc_id, unnest(s) AS g FROM sh
            ), df AS MATERIALIZED (
                SELECT g, COUNT(*) AS df FROM tok GROUP BY g
            ), pref AS MATERIALIZED (
                SELECT doc_id, g, rn, n FROM (
                    SELECT tok.doc_id, tok.g,
                           ROW_NUMBER() OVER (PARTITION BY tok.doc_id
                               ORDER BY df.df, tok.g) AS rn,
                           sizes.n
                    FROM tok JOIN df USING (g)
                             JOIN sizes ON sizes.doc_id = tok.doc_id)
                WHERE rn <= n - CAST(ceil(0.7 * n) AS BIGINT) + 1
            ), cand AS MATERIALIZED (
                -- ppjoin length + positional filters: |B| in
                -- [0.7|A|, |A|/0.7], and the remaining-suffix overlap
                -- bound must clear ceil(0.7/1.7 (|A|+|B|))
                SELECT DISTINCT a.doc_id AS pa, b.doc_id AS pb
                FROM pref a JOIN pref b
                  ON a.g = b.g AND a.doc_id < b.doc_id
                WHERE b.n * 10 >= a.n * 7 AND a.n * 10 >= b.n * 7
                  AND (LEAST(a.n - a.rn, b.n - b.rn) + 1) * 17
                          >= (a.n + b.n) * 7
            ), co AS (
                SELECT c.pa, c.pb, COUNT(*) AS c
                FROM cand c
                JOIN tok ta ON ta.doc_id = c.pa
                JOIN tok tb ON tb.doc_id = c.pb AND tb.g = ta.g
                GROUP BY 1, 2
            ), pairs AS (
                SELECT co.pb AS big
                FROM co
                JOIN sizes sa ON sa.doc_id = co.pa
                JOIN sizes sb ON sb.doc_id = co.pb
                WHERE co.c >= 0.7 * (sa.n + sb.n - co.c)
                UNION ALL
                SELECT b.doc_id
                FROM sizes a JOIN sizes b ON a.doc_id < b.doc_id
                WHERE a.n = 0 AND b.n = 0
            )
            SELECT doc_id FROM documents
            WHERE doc_id NOT IN (SELECT big FROM pairs) ORDER BY doc_id
        """,
        # embedding-cosine dedup oracle: brute-force all-pairs cosine,
        # same drop-if-smaller-neighbor formulation (clusters are cliques;
        # two 16-plane LSH rotations catch every >=0.95 pair here)
        "emb_cosine_dedup": """
            WITH v AS MATERIALIZED (
                SELECT vec_id, CAST(embedding AS DOUBLE[64]) AS emb
                FROM embeddings
            ), pairs AS (
                SELECT b.vec_id AS big
                FROM v a JOIN v b ON a.vec_id < b.vec_id
                WHERE array_cosine_similarity(a.emb, b.emb) >= 0.95
            )
            SELECT vec_id FROM embeddings
            WHERE vec_id NOT IN (SELECT big FROM pairs) ORDER BY vec_id
        """,
        # simhash / fingerprints use seeded polars & rolling hashes DuckDB
        # can't reproduce → PINNED EXPECTED TABLE joined on content hash
        # (regression oracle; generated by tools/gen_pinned_oracles.py,
        # semantics covered by pytest oracles)
        "docs_simhash": f"""
            SELECT d.doc_id, p.simhash
            FROM documents d
            JOIN read_parquet('{_PINNED}') p ON sha256(d.text) = p.text_sha
            ORDER BY d.doc_id
        """,
        # minhash / simhash near-dup SURVIVOR sets: whole-corpus results of
        # seeded-hash algorithms DuckDB can't express → pinned per corpus,
        # keyed by document count (tools/gen_pinned_oracles.py regenerates;
        # candidate-gen + greedy replay there are independent sequential
        # reimplementations)
        "docs_minhash_dedup": f"""
            SELECT p.doc_id FROM read_parquet('{_PINNED_DEDUP}') p
            WHERE p.algo = 'minhash'
              AND p.corpus_min_sha = (SELECT MIN(sha256(text)) FROM documents)
            ORDER BY p.doc_id
        """,
        # minimum spanning forest: the engine runs distributed Borůvka;
        # the pinned table is an INDEPENDENT sequential Kruskal — they
        # agree exactly because the (w, u, v) edge order is total
        "parts_mst": f"""
            SELECT CAST(p.u AS BIGINT) AS u, CAST(p.v AS BIGINT) AS v,
                   CAST(p.w AS BIGINT) AS w
            FROM read_parquet('{_PINNED_MST}') p
            WHERE p.corpus_n = (SELECT COUNT(*) FROM lineitem)
              AND p.corpus_sum = (SELECT SUM(l_orderkey + 3 * l_partkey)
                                  FROM lineitem)
            ORDER BY u, v
        """,
        # maximal independent set — the engine runs Luby-style parallel
        # min-id rounds; the pinned table is an INDEPENDENT sequential
        # greedy by ascending id (they provably coincide)
        "parts_mis": f"""
            SELECT CAST(p.part AS BIGINT) AS part,
                   CAST(p.in_mis AS BIGINT) AS in_mis
            FROM read_parquet('{_PINNED_MIS}') p
            WHERE p.corpus_n = (SELECT COUNT(*) FROM lineitem)
              AND p.corpus_sum = (SELECT SUM(l_orderkey + 3 * l_partkey)
                                  FROM lineitem)
            ORDER BY part
        """,
        # sampled-source stress centrality — pinned independent
        # sequential Brandes-stress twin (the parts_mst pinning pattern);
        # exact-integer sigma*g so two different algorithms must agree
        # bit-for-bit
        "parts_stress_centrality": f"""
            SELECT CAST(p.part_id AS BIGINT) AS part_id,
                   CAST(p.stress AS BIGINT) AS stress
            FROM read_parquet('{_PINNED_STRESS}') p
            WHERE p.corpus_n = (SELECT COUNT(*) FROM lineitem)
              AND p.corpus_sum = (SELECT SUM(l_orderkey + 3 * l_partkey)
                                  FROM lineitem)
            ORDER BY stress DESC, part_id
        """,
        "docs_simhash_dedup": f"""
            SELECT p.doc_id FROM read_parquet('{_PINNED_DEDUP}') p
            WHERE p.algo = 'simhash'
              AND p.corpus_min_sha = (SELECT MIN(sha256(text)) FROM documents)
            ORDER BY p.doc_id
        """,
        # union-of-candidates ensemble (MinHash ∪ SimHash edges, one
        # greedy replay) — pinned independent sequential twin
        "docs_ensemble_dedup": f"""
            SELECT p.doc_id FROM read_parquet('{_PINNED_DEDUP}') p
            WHERE p.algo = 'ensemble'
              AND p.corpus_min_sha = (SELECT MIN(sha256(text)) FROM documents)
            ORDER BY p.doc_id
        """,
        "docs_fingerprints": f"""
            SELECT d.doc_id, p.n_fingerprints
            FROM documents d
            JOIN read_parquet('{_PINNED}') p ON sha256(d.text) = p.text_sha
            ORDER BY d.doc_id
        """,
        # crawl order oracle: pinned table generated by the INDEPENDENT
        # sequential BFS oracle (tools/gen_pinned_oracles.py replaying
        # tests/oracle.py semantics) — both crawl modes must hash-match the
        # full (url, depth, crawl_rank, title) order
        "crawl_fixture": f"""
            SELECT url, depth, crawl_rank, title
            FROM read_parquet('{_PINNED_CRAWL}') ORDER BY crawl_rank
        """,
        "crawl_fixture_ordered": f"""
            SELECT url, depth, crawl_rank, title
            FROM read_parquet('{_PINNED_CRAWL}') ORDER BY crawl_rank
        """,
        "crawl_lineage_fixture": f"""
            SELECT shard, offered, seen, admitted, emitted
            FROM read_parquet('{_PINNED_CRAWL_LINEAGE}') ORDER BY shard
        """,
        "crawl_multi_fixture": f"""
            SELECT url, depth, title
            FROM read_parquet('{_PINNED_CRAWL_MULTI}') ORDER BY url
        """,
        "crawl_robots_fixture": f"""
            SELECT url, depth, title
            FROM read_parquet('{_PINNED_CRAWL_ROBOTS}') ORDER BY url
        """,
        # fake-decode features are a pure function of the media ref (one
        # per doc_id), so the pinned sequential replay joins on the
        # refs this SF's documents generate
        "media_decode": f"""
            SELECT p.media_ref, p.pixel_mean, p.pixel_std, p.decode_ok
            FROM documents d
            JOIN read_parquet('{_PINNED_MEDIA_DECODE}') p
              ON p.media_ref = 'media://img/' || CAST(d.doc_id AS VARCHAR)
            ORDER BY p.media_ref
        """,
        # frame-sample twin in PURE SQL: payload = sha256(ref) digest
        # tiled to DEFAULT_PAYLOAD_BYTES, so every frame slice is the
        # 32-byte digest tiled _mm_frame_tiles times and
        # byte_sum = _mm_frame_tiles * digest byte sum.  All constants
        # derived from stages/multimodal.py defaults above.
        "media_frames": f"""
            WITH refs AS (
                SELECT 'media://img/' || CAST(doc_id AS VARCHAR) AS media_ref
                FROM documents
            ), dsum AS (
                SELECT media_ref,
                       CAST(list_sum(list_transform(range(0, 32),
                           i -> CAST(('0x' || substr(sha256(media_ref),
                                       i * 2 + 1, 2)) AS BIGINT)))
                           AS BIGINT) AS digest_sum
                FROM refs
            )
            SELECT media_ref, CAST(f.f AS BIGINT) AS frame_index,
                   CAST({_mm_frame_bytes} AS BIGINT) AS frame_bytes,
                   CAST(digest_sum * {_mm_frame_tiles} AS BIGINT) AS byte_sum
            FROM dsum CROSS JOIN (SELECT unnest(range(0, {_MM_FRAMES})) AS f) f
            ORDER BY media_ref, frame_index
        """,
        # resize→decode twin: w*h*3 bytes = _mm_resize_tiles tiled digests
        # (constants derived from stages/multimodal.py defaults above)
        "media_resize_decode": f"""
            WITH refs AS (
                SELECT 'media://img/' || CAST(doc_id AS VARCHAR) AS media_ref
                FROM documents
            ), dig AS (
                SELECT media_ref,
                       list_transform(range(0, 32),
                           i -> CAST(('0x' || substr(sha256(media_ref),
                                       i * 2 + 1, 2)) AS BIGINT)) AS b
                FROM refs
            ), dsum AS (
                SELECT media_ref,
                       CAST(list_sum(b) AS BIGINT) AS s,
                       CAST(list_sum(list_transform(b, x -> x * x))
                           AS BIGINT) AS sq
                FROM dig
            )
            SELECT media_ref, CAST({_MM_RW} AS BIGINT) AS width,
                   CAST({_MM_RH} AS BIGINT) AS height,
                   CAST(s * {_mm_resize_tiles} AS BIGINT) AS pixel_sum,
                   CAST(sq * {_mm_resize_tiles} AS BIGINT) AS pixel_sq_sum
            FROM dsum ORDER BY media_ref
        """,
        # objection-handler twin in PURE SQL: rebuild both credibility-
        # ranked take-while-packed source strings (cumulative-length
        # window, c<=budget ⟺ the reference's first-overflow break since
        # lengths are positive), assemble the prompt from the module
        # template pieces, sha256 it, and slice the three stub handlers
        # out of the hex digest exactly as stub_llm_objections +
        # normalize_handler produce them
        "docs_objection_handlers": f"""
            WITH recs AS (
                SELECT doc_id, source, text,
                       CASE WHEN doc_id % 3 = 0 THEN 'kx' ELSE 'acme' END AS origin,
                       CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 2 END AS rnk,
                       {_gen_entry_sql} AS entry
                FROM documents
            ), cum AS (
                SELECT origin, rnk, doc_id, entry,
                       SUM(length(entry)) OVER (
                           PARTITION BY origin ORDER BY rnk, doc_id
                           ROWS UNBOUNDED PRECEDING) AS c
                FROM recs
            ), kx AS (
                SELECT COALESCE(string_agg(entry, '' ORDER BY rnk, doc_id),
                                {_sqlq(_GEN_NOSRC)}) AS p
                FROM cum WHERE origin = 'kx' AND c <= {_gen_max_chars}
            ), ac AS (
                SELECT COALESCE(string_agg(entry, '' ORDER BY rnk, doc_id),
                                {_sqlq(_GEN_NOSRC)}) AS p
                FROM cum WHERE origin = 'acme' AND c <= {_gen_max_chars}
            ), pr AS (
                SELECT sha256({_sqlq(_go1)} || 'acme' || {_sqlq(_go2)} ||
                              kx.p || {_sqlq(_go3)} || ac.p ||
                              {_sqlq(_go4)}) AS h
                FROM kx, ac
            )
            SELECT * FROM (
                SELECT CAST(0 AS BIGINT) AS handler_idx,
                       'objection-' || substr(h, 1, 8) AS objection,
                       'point-' || substr(h, 9, 8) || ' point-' ||
                           substr(h, 17, 8) AS response,
                       'doc: ev-' || substr(h, 25, 8) AS evidence
                FROM pr
                UNION ALL
                SELECT CAST(1 AS BIGINT),
                       'objection-' || substr(h, 33, 8),
                       'resp-' || substr(h, 41, 8), '' FROM pr
                UNION ALL
                SELECT CAST(2 AS BIGINT),
                       'objection-' || substr(h, 49, 8),
                       'speed: fast-' || substr(h, 57, 8), '' FROM pr
            ) ORDER BY handler_idx
        """,
        # comparison pairing: per-(topic, side) credibility-ranked greedy
        # char-budget pack rebuilt as a cumulative-length window — full
        # rows where c <= B, the unique overflow row (cb <= B < c) clipped
        # to B-cb when room > 0, chr(10)x2 joins, marker when any overflow
        # row exists — digested so only hashes cross the compare
        "docs_comparison_pairs": f"""
            WITH recs AS (
                SELECT doc_id, COALESCE(text, '') AS text,
                       doc_id % 3 = 0 AS is_primary,
                       doc_id % 4 AS rnk,
                       CASE WHEN doc_id % 2 = 0
                            THEN ['t' || CAST(doc_id % 5 AS VARCHAR),
                                  'u' || CAST(doc_id % 3 AS VARCHAR)]
                            ELSE ['t' || CAST(doc_id % 5 AS VARCHAR)]
                       END AS tps
                FROM documents
            ), ex AS (
                SELECT doc_id, text, is_primary, rnk, UNNEST(tps) AS topic
                FROM recs
            ), cum AS (
                SELECT topic, is_primary, rnk, doc_id, text,
                       SUM(length(text)) OVER (
                           PARTITION BY topic, is_primary
                           ORDER BY rnk, doc_id
                           ROWS UNBOUNDED PRECEDING) AS c,
                       COALESCE(SUM(length(text)) OVER (
                           PARTITION BY topic, is_primary
                           ORDER BY rnk, doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING), 0) AS cb
                FROM ex
            ), agg AS (
                SELECT topic, is_primary,
                       COALESCE(string_agg(
                           CASE WHEN c <= {_CMP_B} THEN text
                                ELSE substr(text, 1,
                                            CAST({_CMP_B} - cb AS INT)) END,
                           chr(10) || chr(10) ORDER BY rnk, doc_id)
                           FILTER (WHERE c <= {_CMP_B} OR cb < {_CMP_B}), '')
                       || CASE WHEN MAX(CASE WHEN c > {_CMP_B}
                                             AND cb <= {_CMP_B}
                                        THEN 1 ELSE 0 END) = 1
                               THEN {_sqlq(_CMP_MARK)} ELSE '' END AS ctx,
                       CAST(COUNT(*) AS BIGINT) AS n
                FROM cum
                GROUP BY topic, is_primary
            ), topics AS (SELECT DISTINCT topic FROM ex)
            SELECT t.topic,
                   sha256(COALESCE(p.ctx, '')) AS primary_digest,
                   sha256(COALESCE(a.ctx, '')) AS competitor_digest,
                   COALESCE(p.n, CAST(0 AS BIGINT)) AS n_primary,
                   COALESCE(a.n, CAST(0 AS BIGINT)) AS n_competitor
            FROM topics t
            LEFT JOIN (SELECT * FROM agg WHERE is_primary) p USING (topic)
            LEFT JOIN (SELECT * FROM agg WHERE NOT is_primary) a USING (topic)
            ORDER BY t.topic
        """,
        # span-level interleaved archival table for the fixture crawl,
        # pinned by an independent sequential BFS + codec replay
        "crawl_interleaved_fixture": f"""
            SELECT doc_id, span_offset, kind, text, media_ref
            FROM read_parquet('{_PINNED_CRAWL_INTERLEAVED}')
            ORDER BY doc_id, span_offset
        """,
        "crawl_multi_ordered_fixture": f"""
            SELECT url, depth, crawl_rank, title
            FROM read_parquet('{_PINNED_CRAWL_MULTI_ORDERED}')
            ORDER BY crawl_rank
        """,
        # radius search: every vector above the cosine threshold vs vec 0;
        # scores rounded BEFORE the compare, exactly like the engine
        "emb_range_search": """
            SELECT CAST(vec_id AS BIGINT) AS vec_id,
                   ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                       (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings
                        WHERE vec_id = 0)), 6) AS score
            FROM embeddings
            WHERE ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                       (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings
                        WHERE vec_id = 0)), 6) >= 0.1
            ORDER BY score DESC, vec_id
        """,
        # per-language scaled term relevance: tf(lang, word) * 1e6 // df(word)
        # (integer-exact tf-over-df ranking), top 5 per language
        "docs_tfidf_top_terms": r"""
            WITH toks AS (
                SELECT doc_id, lang,
                       list_filter(regexp_split_to_array(lower(text), '\s+'),
                                   x -> x != '') AS w
                FROM documents
            ), tok AS (
                SELECT doc_id, lang, UNNEST(w) AS word FROM toks
            ), tf AS (
                SELECT lang, word, CAST(COUNT(*) AS BIGINT) AS tf
                FROM tok GROUP BY lang, word
            ), df AS (
                SELECT word, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
                FROM tok GROUP BY word
            )
            SELECT tf.lang, tf.word, tf.tf, df.df,
                   CAST(tf.tf * 1000000 // df.df AS BIGINT) AS score_q
            FROM tf JOIN df USING (word)
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY tf.lang
                ORDER BY tf.tf * 1000000 // df.df DESC, tf.word) <= 5
            ORDER BY lang, score_q DESC, word
        """,
        # sequence packing: exclusive prefix sum of whitespace token
        # counts in doc_id order, cut into 256-token blocks
        "docs_pack_blocks": r"""
            WITH t AS (
                SELECT doc_id,
                       CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT)
                           AS n_tokens
                FROM documents
            ), c AS (
                SELECT doc_id, n_tokens,
                       COALESCE(SUM(n_tokens) OVER (
                           ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING), 0) AS s
                FROM t
            )
            SELECT doc_id, n_tokens,
                   CAST(s // 256 AS BIGINT) AS pack_id,
                   CAST(s % 256 AS BIGINT) AS pack_offset
            FROM c ORDER BY doc_id
        """,
        # multimodal-aware packing: cost = text tokens + 64 per media span
        # (trigger-prefixed tokens, same rule as docs_interleaved_media_stats)
        "docs_interleaved_pack": r"""
            WITH t AS (
                SELECT doc_id,
                       CAST(len(regexp_extract_all(text, '\S+'))
                            + 64 * len(regexp_extract_all(
                                  text, '(^|\s)[sS]')) AS BIGINT) AS n_cost
                FROM documents
            ), c AS (
                SELECT doc_id, n_cost,
                       COALESCE(SUM(n_cost) OVER (
                           ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING), 0) AS s
                FROM t
            )
            SELECT doc_id, n_cost,
                   CAST(s // 256 AS BIGINT) AS pack_id,
                   CAST(s % 256 AS BIGINT) AS pack_offset
            FROM c ORDER BY doc_id
        """,
        # spherical k-means assignment vs the vec_id<8 seed centroids;
        # integer member checksums so no float ever aggregates
        "emb_kmeans_assign": """
            WITH cents AS (
                SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS ce
                FROM embeddings WHERE vec_id < 8
            ), scored AS (
                SELECT e.vec_id, c.cid,
                       ROUND(list_cosine_similarity(
                           CAST(e.embedding AS DOUBLE[]), c.ce), 6) AS score
                FROM embeddings e CROSS JOIN cents c
            ), best AS (
                SELECT vec_id, cid,
                       ROW_NUMBER() OVER (PARTITION BY vec_id
                                          ORDER BY score DESC, cid) AS rn
                FROM scored
            )
            SELECT CAST(cid AS BIGINT) AS cluster_id,
                   CAST(COUNT(*) AS BIGINT) AS n_members,
                   CAST(SUM(vec_id) AS BIGINT) AS id_checksum
            FROM best WHERE rn = 1 GROUP BY cid ORDER BY cid
        """,
        # nearest neighbor within each label (kNN self-join co-partitioned
        # on the join key); rank on the 6-dp-rounded score with nn_id
        # tiebreak, exactly the engine's argmax order
        "emb_nn_within_label": """
            WITH scored AS (
                SELECT a.vec_id AS vec_id, b.vec_id AS nn_id,
                       ROUND(list_cosine_similarity(
                           CAST(a.embedding AS DOUBLE[]),
                           CAST(b.embedding AS DOUBLE[])), 6) AS score
                FROM embeddings a JOIN embeddings b
                  ON a.label = b.label AND a.vec_id <> b.vec_id
            ), best AS (
                SELECT vec_id, nn_id, score,
                       ROW_NUMBER() OVER (PARTITION BY vec_id
                                          ORDER BY score DESC, nn_id) AS rn
                FROM scored
            )
            SELECT vec_id, nn_id, score FROM best
            WHERE rn = 1 ORDER BY vec_id
        """,
        # global int8 scalar quantization: per-dim min/max over the corpus,
        # codes = floor(((x - mn) * 255) / (mx - mn)) — the identical IEEE
        # double expression the engine evaluates, so no rounding slack
        # mean pairwise cosine via the sum-vector identity over
        # 1e6-quantized unit vectors: ‖S‖²−T exact in HUGEINT; `//`
        # truncates toward zero on both sides (NOTES_r2 #64)
        "emb_isotropy": f"""
            WITH n2 AS (
                SELECT vec_id, ({iso_norm_chain}) AS norm2 FROM embeddings
            ), q AS (
                SELECT e.vec_id, d.d,
                       CAST(ROUND(CAST(e.embedding[d.d] AS DOUBLE)
                            / sqrt(n2.norm2) * 1000000) AS BIGINT) AS q
                FROM embeddings e JOIN n2 USING (vec_id)
                CROSS JOIN (SELECT UNNEST(RANGE(1, 65)) AS d) d
                WHERE n2.norm2 > 0
            ), s AS (
                SELECT d, CAST(SUM(q) AS HUGEINT) AS sd FROM q GROUP BY d
            ), agg AS (
                SELECT (SELECT SUM(sd * sd) FROM s) AS ss,
                       (SELECT CAST(SUM(q * q) AS HUGEINT) FROM q) AS t,
                       (SELECT CAST(COUNT(DISTINCT vec_id) AS BIGINT)
                        FROM q) AS n
            )
            SELECT n AS n_vecs,
                   CAST((ss - t) // (n * (n - 1) * 1000000) AS BIGINT)
                       AS mean_cos_micro
            FROM agg WHERE n >= 2
        """,
        "emb_int8_quantize": """
            WITH flat AS (
                SELECT vec_id, d.d AS d,
                       CAST(embedding[d.d] AS DOUBLE) AS val
                FROM embeddings
                CROSS JOIN (SELECT UNNEST(RANGE(1, 65)) AS d) d
            ), stats AS (
                SELECT d, MIN(val) AS mn, MAX(val) AS mx FROM flat GROUP BY d
            ), codes AS (
                SELECT vec_id, d,
                       CASE WHEN mx = mn THEN 0
                            ELSE CAST(LEAST(GREATEST(
                                FLOOR((val - mn) * 255 / (mx - mn)),
                                0), 255) AS BIGINT)
                       END AS c
                FROM flat JOIN stats USING (d)
            )
            SELECT vec_id, CAST(SUM(c) AS BIGINT) AS code_sum,
                   CAST(SUM(c * d) AS BIGINT) AS code_checksum
            FROM codes GROUP BY vec_id ORDER BY vec_id
        """,
        # two Lloyd iterations of spherical k-means; ROUND(AVG, 6) after
        # the recompute is the inter-iteration reproducibility contract
        # shared with the engine (64 per-dim mean terms generated below)
        "emb_kmeans_iterate": """
            WITH cents0 AS (
                SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS ce
                FROM embeddings WHERE vec_id < 8
            ), s1 AS (
                SELECT e.vec_id, c.cid,
                       ROUND(list_cosine_similarity(
                           CAST(e.embedding AS DOUBLE[]), c.ce), 6) AS score
                FROM embeddings e CROSS JOIN cents0 c
            ), a1 AS (
                SELECT vec_id, cid FROM (
                    SELECT vec_id, cid,
                           ROW_NUMBER() OVER (PARTITION BY vec_id
                                              ORDER BY score DESC, cid) AS rn
                    FROM s1) WHERE rn = 1
            ), m AS (
                SELECT a1.cid, {MEANS}
                FROM a1 JOIN embeddings e USING (vec_id) GROUP BY a1.cid
            ), s2 AS (
                SELECT e.vec_id, m.cid,
                       ROUND(({DOT}) / (sqrt({NE}) * sqrt({NM})), 6) AS score
                FROM embeddings e CROSS JOIN m
            ), a2 AS (
                SELECT vec_id, cid FROM (
                    SELECT vec_id, cid,
                           ROW_NUMBER() OVER (PARTITION BY vec_id
                                              ORDER BY score DESC, cid) AS rn
                    FROM s2) WHERE rn = 1
            )
            SELECT CAST(cid AS BIGINT) AS cluster_id,
                   CAST(COUNT(*) AS BIGINT) AS n_members,
                   CAST(SUM(vec_id) AS BIGINT) AS id_checksum
            FROM a2 GROUP BY cid ORDER BY cid
        """.replace("{MEANS}", ", ".join(
            f"ROUND(AVG(CAST(e.embedding[{i + 1}] AS DOUBLE)), 6) AS m{i}"
            for i in range(64))
        ).replace("{DOT}", " + ".join(
            f"CAST(e.embedding[{i + 1}] AS DOUBLE) * m.m{i}"
            for i in range(64))
        ).replace("{NE}", " + ".join(
            f"CAST(e.embedding[{i + 1}] AS DOUBLE)"
            f" * CAST(e.embedding[{i + 1}] AS DOUBLE)"
            for i in range(64))
        ).replace("{NM}", " + ".join(
            f"m.m{i} * m.m{i}" for i in range(64))),
        # simplified silhouette vs label-SUM centroids (the 1/n cancels
        # in cosine): a/b each ROUND(,6) first, then the sil expression
        # re-rounds — generated 64-dim SUM twin like centroid_distances
        "emb_silhouette": """
            WITH s AS (
                SELECT label, {SUMS}
                FROM embeddings GROUP BY label
            ), sims AS (
                SELECT e.vec_id, e.label AS own_label, s.label AS cl,
                       ROUND(({DOT}) / (sqrt({NE}) * sqrt({NS})), 6) AS sim
                FROM embeddings e CROSS JOIN s
            ), ab AS (
                SELECT vec_id, own_label AS label,
                       MAX(CASE WHEN cl = own_label THEN sim END) AS a_sim,
                       COALESCE(MAX(CASE WHEN cl <> own_label THEN sim END),
                                0) AS b_sim
                FROM sims GROUP BY vec_id, own_label
            )
            SELECT CAST(vec_id AS BIGINT) AS vec_id,
                   CAST(label AS BIGINT) AS label,
                   a_sim, b_sim,
                   CASE WHEN 1 - LEAST(a_sim, b_sim) <= 0 THEN 0.0
                        ELSE ROUND((a_sim - b_sim)
                                   / (1 - LEAST(a_sim, b_sim)), 6)
                   END AS sil
            FROM ab ORDER BY vec_id
        """.replace("{SUMS}", ", ".join(
            f"SUM(CAST(embedding[{i + 1}] AS DOUBLE)) AS s{i}"
            for i in range(64))
        ).replace("{DOT}", " + ".join(
            f"CAST(e.embedding[{i + 1}] AS DOUBLE) * s.s{i}"
            for i in range(64))
        ).replace("{NE}", " + ".join(
            f"CAST(e.embedding[{i + 1}] AS DOUBLE)"
            f" * CAST(e.embedding[{i + 1}] AS DOUBLE)"
            for i in range(64))
        ).replace("{NS}", " + ".join(
            f"s.s{i} * s.s{i}" for i in range(64))),
        # residual quantization (RQ-2): level-1 argmin against the
        # vec_id<8 codebook, level-2 argmin of the residual against the
        # vectors-8..15-minus-their-own-centroid codebook; every distance
        # ROUND(,6), ties to the smaller id; err_sq is the winning rounded
        # level-2 distance
        "emb_residual_quantize": """
            WITH cb AS (
                SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS ce
                FROM embeddings WHERE vec_id < 8
            ), d1 AS (
                SELECT e.vec_id, cb.cid, ROUND({DRQ1}, 6) AS d
                FROM embeddings e CROSS JOIN cb
            ), a1 AS (
                SELECT vec_id, cid FROM (
                    SELECT vec_id, cid, ROW_NUMBER() OVER (
                        PARTITION BY vec_id ORDER BY d, cid) AS rn FROM d1)
                WHERE rn = 1
            ), a1v AS (
                SELECT a1.vec_id, cb.ce FROM a1 JOIN cb ON a1.cid = cb.cid
            ), cb2 AS (
                SELECT vec_id AS cid2, CAST(embedding AS DOUBLE[]) AS ce
                FROM embeddings WHERE vec_id >= 8 AND vec_id < 16
            ), d2 AS (
                SELECT e.vec_id, a1.cid AS code1, cb2.cid2,
                       ROUND({DRQ2}, 6) AS d
                FROM embeddings e
                JOIN a1 ON a1.vec_id = e.vec_id
                JOIN a1v a1e ON a1e.vec_id = e.vec_id
                CROSS JOIN cb2
                JOIN a1v a1b ON a1b.vec_id = cb2.cid2
            )
            SELECT CAST(vec_id AS BIGINT) AS vec_id,
                   CAST(code1 AS BIGINT) AS code1,
                   CAST(cid2 AS BIGINT) AS code2,
                   d AS err_sq
            FROM (SELECT vec_id, code1, cid2, d, ROW_NUMBER() OVER (
                      PARTITION BY vec_id ORDER BY d, cid2) AS rn FROM d2)
            WHERE rn = 1 ORDER BY vec_id
        """.replace("{DRQ1}", _pq_dist_sql(0, sub=64)).replace(
            "{DRQ2}", _rq2_dist_sql()),
        # PQ/ADC recall@10 vs exact L2 (generated twin)
        "emb_pq_recall": _pq_recall_sql(),
        # product-quantization codes: per-subspace ROUND(L2², 6) argmin
        # against the vec_id<8 codebook — same rounding contract as the
        # kmeans twins, generated over the 4×16-dim subspaces
        "emb_pq_codes": """
            WITH cb AS (
                SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS ce
                FROM embeddings WHERE vec_id < 8
            ), d AS (
                SELECT e.vec_id, cb.cid,
                       ROUND({D0}, 6) AS d0, ROUND({D1}, 6) AS d1,
                       ROUND({D2}, 6) AS d2, ROUND({D3}, 6) AS d3
                FROM embeddings e CROSS JOIN cb
            ), a0 AS (SELECT vec_id, cid FROM (
                SELECT vec_id, cid, ROW_NUMBER() OVER (
                    PARTITION BY vec_id ORDER BY d0, cid) AS rn FROM d)
                WHERE rn = 1),
            a1 AS (SELECT vec_id, cid FROM (
                SELECT vec_id, cid, ROW_NUMBER() OVER (
                    PARTITION BY vec_id ORDER BY d1, cid) AS rn FROM d)
                WHERE rn = 1),
            a2 AS (SELECT vec_id, cid FROM (
                SELECT vec_id, cid, ROW_NUMBER() OVER (
                    PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM d)
                WHERE rn = 1),
            a3 AS (SELECT vec_id, cid FROM (
                SELECT vec_id, cid, ROW_NUMBER() OVER (
                    PARTITION BY vec_id ORDER BY d3, cid) AS rn FROM d)
                WHERE rn = 1)
            SELECT CAST(a0.vec_id AS BIGINT) AS vec_id,
                   CAST(a0.cid AS BIGINT) AS code_0,
                   CAST(a1.cid AS BIGINT) AS code_1,
                   CAST(a2.cid AS BIGINT) AS code_2,
                   CAST(a3.cid AS BIGINT) AS code_3
            FROM a0 JOIN a1 USING (vec_id) JOIN a2 USING (vec_id)
                    JOIN a3 USING (vec_id)
            ORDER BY vec_id
        """.replace("{D0}", _pq_dist_sql(0)).replace(
            "{D1}", _pq_dist_sql(1)).replace(
            "{D2}", _pq_dist_sql(2)).replace(
            "{D3}", _pq_dist_sql(3)),
        # ADC search over the PQ codes: per-subspace LUT from the query
        # (vec_id 0) to the codebook, approximate distance = Σ LUT[code_s]
        "emb_pq_adc_topk": """
            WITH cb AS (
                SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS ce
                FROM embeddings WHERE vec_id < 8
            ), q AS (
                SELECT CAST(embedding AS DOUBLE[]) AS qe
                FROM embeddings WHERE vec_id = 0
            ), lut AS (
                SELECT cb.cid,
                       ROUND({L0}, 6) AS l0, ROUND({L1}, 6) AS l1,
                       ROUND({L2}, 6) AS l2, ROUND({L3}, 6) AS l3
                FROM cb CROSS JOIN q
            ), d AS (
                SELECT e.vec_id, cb.cid,
                       ROUND({D0}, 6) AS d0, ROUND({D1}, 6) AS d1,
                       ROUND({D2}, 6) AS d2, ROUND({D3}, 6) AS d3
                FROM embeddings e CROSS JOIN cb
            ), a0 AS (SELECT vec_id, cid FROM (
                SELECT vec_id, cid, ROW_NUMBER() OVER (
                    PARTITION BY vec_id ORDER BY d0, cid) AS rn FROM d)
                WHERE rn = 1),
            a1 AS (SELECT vec_id, cid FROM (
                SELECT vec_id, cid, ROW_NUMBER() OVER (
                    PARTITION BY vec_id ORDER BY d1, cid) AS rn FROM d)
                WHERE rn = 1),
            a2 AS (SELECT vec_id, cid FROM (
                SELECT vec_id, cid, ROW_NUMBER() OVER (
                    PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM d)
                WHERE rn = 1),
            a3 AS (SELECT vec_id, cid FROM (
                SELECT vec_id, cid, ROW_NUMBER() OVER (
                    PARTITION BY vec_id ORDER BY d3, cid) AS rn FROM d)
                WHERE rn = 1)
            SELECT CAST(a0.vec_id AS BIGINT) AS vec_id,
                   ROUND(l0.l0 + l1.l1 + l2.l2 + l3.l3, 6) AS adc
            FROM a0 JOIN a1 USING (vec_id) JOIN a2 USING (vec_id)
                    JOIN a3 USING (vec_id)
                 JOIN lut l0 ON l0.cid = a0.cid
                 JOIN lut l1 ON l1.cid = a1.cid
                 JOIN lut l2 ON l2.cid = a2.cid
                 JOIN lut l3 ON l3.cid = a3.cid
            ORDER BY adc, a0.vec_id LIMIT 10
        """.replace("{D0}", _pq_dist_sql(0)).replace(
            "{D1}", _pq_dist_sql(1)).replace(
            "{D2}", _pq_dist_sql(2)).replace(
            "{D3}", _pq_dist_sql(3)).replace(
            "{L0}", _pq_dist_sql(0, lhs="q.qe")).replace(
            "{L1}", _pq_dist_sql(1, lhs="q.qe")).replace(
            "{L2}", _pq_dist_sql(2, lhs="q.qe")).replace(
            "{L3}", _pq_dist_sql(3, lhs="q.qe")),
        # Matryoshka-style prefix search fidelity (rank by 16-dim prefix)
        "emb_prefix_fidelity": """
            WITH q AS (
                SELECT CAST(embedding AS DOUBLE[]) AS qe,
                       CAST(embedding[1:16] AS DOUBLE[]) AS qp
                FROM embeddings WHERE vec_id = 0
            )
            SELECT vec_id,
                   ROUND(list_cosine_similarity(
                       CAST(embedding[1:16] AS DOUBLE[]),
                       (SELECT qp FROM q)), 6) AS pcos,
                   ROUND(list_cosine_similarity(
                       CAST(embedding AS DOUBLE[]),
                       (SELECT qe FROM q)), 6) AS fcos
            FROM embeddings
            ORDER BY pcos DESC, vec_id LIMIT 10
        """,
        "emb_knn": """
            SELECT vec_id,
                   ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                       (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)), 6) AS score
            FROM embeddings
            ORDER BY list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                       (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)) DESC, vec_id
            LIMIT 10
        """,
        "emb_knn_labels": """
            WITH scored AS (
                SELECT vec_id, label,
                       list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                           (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)) AS score
                FROM embeddings
            ), top AS (
                SELECT * FROM scored ORDER BY score DESC, vec_id LIMIT 50
            )
            SELECT label, COUNT(*) AS n FROM top GROUP BY label ORDER BY label
        """,
        "emb_label_centroids": """
            SELECT label, COUNT(*) AS n,
                   ROUND(SUM(embedding[1]) / COUNT(*), 6) AS mean_e0
            FROM embeddings GROUP BY label ORDER BY label
        """,
        # cosine of per-label SUM vectors == cosine of centroids (the 1/n
        # scaling cancels); the 64 SUM terms are generated below
        "emb_centroid_distances": """
            WITH s AS (SELECT label, {SUMS} FROM embeddings GROUP BY label)
            SELECT CAST(a.label AS BIGINT) AS label_a,
                   CAST(b.label AS BIGINT) AS label_b,
                   ROUND(({DOT}) / (sqrt({NA}) * sqrt({NB})), 6) AS cos_sim
            FROM s a JOIN s b ON a.label < b.label
            ORDER BY label_a, label_b
        """.replace("{SUMS}", ", ".join(
            f"SUM(embedding[{i + 1}]) AS s{i}" for i in range(64))
        ).replace("{DOT}", " + ".join(
            f"a.s{i}*b.s{i}" for i in range(64))
        ).replace("{NA}", " + ".join(
            f"a.s{i}*a.s{i}" for i in range(64))
        ).replace("{NB}", " + ".join(
            f"b.s{i}*b.s{i}" for i in range(64))),
        "emb_rrf": """
            WITH s0 AS (
                SELECT vec_id,
                       list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                           (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)) AS score
                FROM embeddings
            ), r0 AS (
                SELECT vec_id, ROW_NUMBER() OVER (ORDER BY score DESC, vec_id) - 1 AS rnk
                FROM s0 ORDER BY score DESC, vec_id LIMIT 20
            ), s1 AS (
                SELECT vec_id,
                       list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                           (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 1)) AS score
                FROM embeddings
            ), r1 AS (
                SELECT vec_id, ROW_NUMBER() OVER (ORDER BY score DESC, vec_id) - 1 AS rnk
                FROM s1 ORDER BY score DESC, vec_id LIMIT 20
            ), unioned AS (
                SELECT * FROM r0 UNION ALL SELECT * FROM r1
            )
            SELECT vec_id, ROUND(SUM(1.0 / (60 + rnk + 1)), 6) AS rrf_score
            FROM unioned GROUP BY vec_id
            ORDER BY rrf_score DESC, vec_id
            LIMIT 10
        """,
        # HLL distinct sketch: the OUTPUT is the exact-integer register
        # table (max leading-zero rank per 8-bit bucket of a 60-bit md5
        # hash) — rank via exact bit length (bin string), never float log2
        "events_hll_registers": """
            WITH du AS (SELECT DISTINCT user_id FROM events),
            h AS (
                SELECT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                                            1, 15)) AS BIGINT) AS h
                FROM du
            )
            SELECT CAST(h % 256 AS BIGINT) AS bucket,
                   CAST(MAX(53 - length(ltrim(bin(h // 256), '0')))
                        AS BIGINT) AS max_rank
            FROM h GROUP BY bucket ORDER BY bucket
        """,
        # count-min sketch (d=4, w=64) heavy hitters with exact counts
        # alongside: the SQL builds the IDENTICAL md5 registers
        "events_cms_topk": """
            WITH jd AS (SELECT UNNEST(RANGE(0, 4)) AS j),
            reg AS (
                SELECT jd.j,
                       CAST(('0x' || substr(md5(CAST(jd.j AS VARCHAR) || '|'
                             || CAST(user_id AS VARCHAR)), 1, 8))
                            AS BIGINT) % 64 AS slot,
                       COUNT(*) AS c
                FROM events CROSS JOIN jd GROUP BY 1, 2
            ), uc AS (
                SELECT user_id, COUNT(*) AS true_n FROM events
                GROUP BY user_id
            ), est AS (
                SELECT u.user_id, u.true_n, MIN(r.c) AS est_n
                FROM uc u CROSS JOIN jd
                JOIN reg r ON r.j = jd.j AND r.slot =
                    CAST(('0x' || substr(md5(CAST(jd.j AS VARCHAR) || '|'
                          || CAST(u.user_id AS VARCHAR)), 1, 8))
                         AS BIGINT) % 64
                GROUP BY u.user_id, u.true_n
            )
            SELECT user_id, CAST(est_n AS BIGINT) AS est_n,
                   CAST(true_n AS BIGINT) AS true_n
            FROM est ORDER BY est_n DESC, user_id LIMIT 10
        """,
        # windowed stream-stream join (click within the hour before the
        # purchase, same user), integer-cents value volume per day
        "events_window_join": """
            SELECT CAST(date_trunc('day', p.ts) AS TIMESTAMP) AS day,
                   CAST(COUNT(*) AS BIGINT) AS n_pairs,
                   CAST(SUM(CAST(FLOOR(c.value * 100 + 0.5) AS BIGINT)
                            + CAST(FLOOR(p.value * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS sum_cents
            FROM events p JOIN events c
              ON p.user_id = c.user_id
             AND p.event_type = 'purchase' AND c.event_type = 'click'
             AND c.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts
            GROUP BY 1 ORDER BY 1
        """,
        # event-time watermark audit: late = older than the running
        # arrival-order event-time max minus 15 min (first arrival exempt)
        "events_watermark_late": """
            WITH w AS (
                SELECT event_type, ts,
                       MAX(ts) OVER (ORDER BY event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING) AS prev_max
                FROM events
            )
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM(CASE WHEN prev_max IS NOT NULL
                                  AND ts < prev_max - INTERVAL 15 MINUTE
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_late
            FROM w GROUP BY event_type ORDER BY event_type
        """,
        # incremental-maintenance merge (base < cutoff ⊕ delta = cutoff)
        # vs the full recompute
        "orders_incremental_agg": """
            SELECT o_orderpriority,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS sum_cents
            FROM orders
            WHERE o_orderdate <= DATE '1995-06-17'
            GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        # PII scrub: deterministic synthesized PII (mod-3/5/7 contact
        # block from doc_id), then the same RE2 count + chained-replace
        # kernels the engine runs
        "docs_pii_scrub": f"""
            WITH aug AS (
                SELECT doc_id,
                       text ||
                       CASE WHEN doc_id % 3 = 0 THEN ' contact user'
                            || CAST(doc_id AS VARCHAR) || '@example.com'
                            ELSE '' END ||
                       CASE WHEN doc_id % 5 = 0 THEN ' call 555-'
                            || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                            ELSE '' END ||
                       CASE WHEN doc_id % 7 = 0 THEN ' from 10.'
                            || CAST(doc_id % 256 AS VARCHAR) || '.0.'
                            || CAST(doc_id % 100 AS VARCHAR)
                            ELSE '' END AS aug
                FROM documents
            )
            SELECT doc_id,
                   CAST(len(regexp_extract_all(aug, '{{EMAIL}}')) AS BIGINT) AS n_emails,
                   CAST(len(regexp_extract_all(aug, '{{PHONE}}')) AS BIGINT) AS n_phones,
                   CAST(len(regexp_extract_all(aug, '{{IP}}')) AS BIGINT) AS n_ips,
                   CAST(length(regexp_replace(regexp_replace(regexp_replace(
                        aug, '{{EMAIL}}', '<EMAIL>', 'g'),
                        '{{PHONE}}', '<PHONE>', 'g'),
                        '{{IP}}', '<IP>', 'g')) AS BIGINT) AS clean_len
            FROM aug ORDER BY doc_id
        """.replace("{EMAIL}", _PII_EMAIL)
          .replace("{PHONE}", _PII_PHONE)
          .replace("{IP}", _PII_IP),
        # Efraimidis–Spirakis weighted sample: per-row md5 uniform scored
        # ln(u)/weight (no aggregation → engine and SQL rank identically)
        "docs_weighted_sample": """
            WITH s AS (
                SELECT doc_id, n_chars,
                       LN((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                                1, 8)) AS BIGINT) + 1)
                          / 4294967296.0) / n_chars AS score
                FROM documents
            )
            SELECT CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id)
                        AS BIGINT) AS sample_rank,
                   doc_id, CAST(n_chars AS BIGINT) AS n_chars
            FROM s ORDER BY score DESC, doc_id LIMIT 20
        """,
        # two power iterations from e0; ROUND(w/||w||, 6) after each pass
        # is the same inter-iteration contract as emb_kmeans_iterate
        # (generated 64-dim sums below)
        "emb_pca_top2": _pca2_sql(),
        # mutual-3NN graph components: directed top-3 by ROUND-6 cosine
        # (ties → smaller vec_id), an edge needs BOTH directions, then
        # min-label closure; nodes with no mutual edge emit nothing
        # connected components via GENERATED relax+pointer-jump rounds
        # (the parts_sssp per-round-CTE pattern), NOT a recursive
        # reach(v,l) closure: the closure materializes s^2 (node, label)
        # rows per component and took 50s at 500 vectors / wedged the
        # sf0.1 gate at 2000 — the round chain is O((V+E) log V) total.
        "emb_snn_components": f"""
            -- exact top-3 WITHOUT materializing the 4e8-pair window
            -- (OOM at the synthesized sf1): pairs stream through three
            -- MAX scans over an order-isomorphic integer key
            -- (round6-score-micros, -vec_id); array_cosine_similarity on
            -- DOUBLE[64] is bit-identical to list_cosine_similarity on
            -- DOUBLE[] at 6-decimal rounding (probed on 2M pairs)
            WITH v AS MATERIALIZED (
                SELECT vec_id, CAST(embedding AS DOUBLE[64]) AS emb
                FROM embeddings
            ),
            P AS (
                SELECT a.vec_id AS src,
                       CAST(ROUND(ROUND(array_cosine_similarity(
                                a.emb, b.emb), 6) * 1000000, 0) AS BIGINT)
                           * 4294967296
                       + (2147483647 - b.vec_id) AS key
                FROM v a JOIN v b ON a.vec_id <> b.vec_id
            ),
            t1 AS MATERIALIZED (
                SELECT src, MAX(key) AS k FROM P GROUP BY src),
            t2 AS MATERIALIZED (
                SELECT P.src, MAX(P.key) AS k FROM P
                JOIN t1 ON t1.src = P.src WHERE P.key < t1.k GROUP BY P.src),
            t3 AS MATERIALIZED (
                SELECT P.src, MAX(P.key) AS k FROM P
                JOIN t2 ON t2.src = P.src WHERE P.key < t2.k GROUP BY P.src),
            nn AS MATERIALIZED (
                SELECT src, 2147483647
                       - (((k % 4294967296) + 4294967296) % 4294967296)
                       AS dst
                FROM (SELECT src, k FROM t1 UNION ALL
                      SELECT src, k FROM t2 UNION ALL
                      SELECT src, k FROM t3)
            ), mutual AS (
                SELECT x.src AS a, x.dst AS b
                FROM nn x JOIN nn y ON x.src = y.dst AND x.dst = y.src
                WHERE x.src < x.dst
            ), e AS MATERIALIZED (
                SELECT a, b FROM mutual UNION ALL SELECT b, a FROM mutual
            ), nodes AS MATERIALIZED (
                SELECT DISTINCT a AS v FROM e
            ),
            {_minlabel_rounds('e', 'nodes')}
            comp AS (
                SELECT v, l AS component_id FROM {_MINLABEL_LAST}
            )
            SELECT component_id, CAST(COUNT(*) AS BIGINT) AS n_vecs,
                   CAST(SUM(v) AS BIGINT) AS vec_checksum
            FROM comp GROUP BY 1 ORDER BY 1
        """,
        # DBSCAN under cosine: neighbor = ROUND(cos,6) ≥ 0.32 (self
        # excluded), core = ≥4 neighbors, clusters = components of the
        # core-core graph (min-core-id label), border joins the MIN
        # cluster label among its core neighbors, noise emits nothing
        "emb_dbscan": f"""
            WITH v AS MATERIALIZED (
                SELECT vec_id, CAST(embedding AS DOUBLE[64]) AS emb
                FROM embeddings
            ),
            nb AS MATERIALIZED (
                SELECT a.vec_id AS i, b.vec_id AS j
                FROM v a JOIN v b ON a.vec_id <> b.vec_id
                WHERE ROUND(array_cosine_similarity(a.emb, b.emb), 6)
                      >= 0.32
            ), core AS MATERIALIZED (
                SELECT i AS v FROM nb GROUP BY 1 HAVING COUNT(*) >= 4
            ), ce AS MATERIALIZED (
                SELECT nb.i AS a, nb.j AS b FROM nb
                JOIN core x ON x.v = nb.i JOIN core y ON y.v = nb.j
            ),
            {_minlabel_rounds('ce', 'core')}
            comp AS (
                SELECT v, l AS cid FROM {_MINLABEL_LAST}
            ), border AS (
                SELECT nb.i AS v, MIN(comp.cid) AS cid
                FROM nb JOIN core c ON c.v = nb.j
                JOIN comp ON comp.v = nb.j
                WHERE nb.i NOT IN (SELECT v FROM core)
                GROUP BY 1
            ), mem AS (
                SELECT v, cid, 1 AS is_core FROM comp
                UNION ALL SELECT v, cid, 0 FROM border
            )
            SELECT cid AS cluster_id,
                   CAST(SUM(is_core) AS BIGINT) AS n_core,
                   CAST(SUM(1 - is_core) AS BIGINT) AS n_border,
                   CAST(SUM(v) AS BIGINT) AS vec_checksum
            FROM mem GROUP BY 1 ORDER BY 1
        """,
        # Levina–Bickel MLE local intrinsic dimensionality at sampled
        # points: k=8 nearest by d = 1−ROUND(cos,6) (ties → smaller
        # vec_id), fixed-point ln terms, zero-distance neighbors
        # excluded from k AND the sum
        "emb_lid": """
            WITH q AS (
                SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
                FROM embeddings WHERE vec_id % 7 = 0
                ORDER BY vec_id LIMIT 16
            ), scored AS (
                SELECT q.qid, e.vec_id,
                       1 - ROUND(list_cosine_similarity(
                           CAST(e.embedding AS DOUBLE[]), q.qv), 6) AS d
                FROM embeddings e, q WHERE e.vec_id <> q.qid
            ), topk AS (
                SELECT qid, vec_id, d,
                       ROW_NUMBER() OVER (PARTITION BY qid
                                          ORDER BY d, vec_id) AS rn
                FROM scored
            ), nn AS (
                SELECT qid, vec_id, d FROM topk WHERE rn <= 8
            ), mx AS (
                SELECT qid, MAX(d) AS dk FROM nn GROUP BY qid
            ), terms AS (
                SELECT nn.qid,
                       CAST(COUNT(*) FILTER (WHERE nn.d > 0) AS BIGINT)
                           AS k_eff,
                       SUM(CASE WHEN nn.d > 0 THEN
                           CAST(ROUND(ln(mx.dk / nn.d) * 1000000)
                                AS BIGINT) ELSE 0 END) AS s
                FROM nn JOIN mx USING (qid) GROUP BY nn.qid
            )
            SELECT qid, k_eff,
                   CAST(COALESCE(s, 0) AS BIGINT) AS sum_micro,
                   CASE WHEN COALESCE(s, 0) > 0
                        THEN CAST(k_eff * 1000000000000 // s AS BIGINT)
                        ELSE 0 END AS lid_ppm
            FROM terms ORDER BY qid
        """,
        # kNN label propagation audit: vec_id%5==0 held out, majority of
        # 3 nearest labeled neighbors (ROUND-6 cosine; ties → smaller
        # vec_id; vote ties → smaller label)
        "emb_knn_classify": """
            WITH q AS (
                SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv,
                       label AS true_label
                FROM embeddings WHERE vec_id % 5 = 0
                ORDER BY vec_id LIMIT 16
            ), scored AS (
                SELECT q.qid, q.true_label, e.vec_id, e.label,
                       ROUND(list_cosine_similarity(
                           CAST(e.embedding AS DOUBLE[]), q.qv), 6) AS cs
                FROM embeddings e, q WHERE e.vec_id % 5 != 0
            ), top3 AS (
                SELECT qid, true_label, label,
                       ROW_NUMBER() OVER (PARTITION BY qid
                                          ORDER BY cs DESC, vec_id) AS rn
                FROM scored
            ), votes AS (
                SELECT qid, true_label, label, COUNT(*) AS nv
                FROM top3 WHERE rn <= 3 GROUP BY 1, 2, 3
            ), pred AS (
                SELECT qid, true_label, label AS pred_label,
                       ROW_NUMBER() OVER (PARTITION BY qid
                                          ORDER BY nv DESC, label) AS rn
                FROM votes
            )
            SELECT CAST(qid AS BIGINT) AS vec_id,
                   CAST(pred_label AS INTEGER) AS pred_label,
                   CAST(true_label AS INTEGER) AS true_label,
                   CAST(CASE WHEN pred_label = true_label
                             THEN 1 ELSE 0 END AS BIGINT) AS correct
            FROM pred WHERE rn = 1 ORDER BY vec_id
        """,
        "emb_power_iteration": """
            WITH w1 AS (
                SELECT {W1} FROM embeddings e
            ), n1 AS (
                SELECT sqrt({SQ1}) AS nrm, * FROM w1
            ), v1 AS (
                SELECT {V1} FROM n1
            ), d1 AS (
                SELECT e.vec_id, ({DOT1}) AS dot1
                FROM embeddings e CROSS JOIN v1
            ), w2 AS (
                SELECT {W2} FROM embeddings e JOIN d1 USING (vec_id)
            ), n2 AS (
                SELECT sqrt({SQ2}) AS nrm, * FROM w2
            ), fin AS (
                SELECT {V2} FROM n2
            )
            SELECT UNNEST(RANGE(0, 64)) AS dim,
                   UNNEST([{LIST}]) AS loading
            FROM fin
        """.replace("{W1}", ", ".join(
            f"SUM(CAST(e.embedding[{i + 1}] AS DOUBLE)"
            f" * CAST(e.embedding[1] AS DOUBLE)) AS w{i}"
            for i in range(64))
        ).replace("{SQ1}", " + ".join(
            f"w{i}*w{i}" for i in range(64))
        ).replace("{V1}", ", ".join(
            f"CASE WHEN nrm = 0 THEN 0.0 ELSE ROUND(w{i} / nrm, 6) END AS v{i}"
            for i in range(64))
        ).replace("{DOT1}", " + ".join(
            f"CAST(e.embedding[{i + 1}] AS DOUBLE) * v1.v{i}"
            for i in range(64))
        ).replace("{W2}", ", ".join(
            f"SUM(CAST(e.embedding[{i + 1}] AS DOUBLE) * d1.dot1) AS u{i}"
            for i in range(64))
        ).replace("{SQ2}", " + ".join(
            f"u{i}*u{i}" for i in range(64))
        ).replace("{V2}", ", ".join(
            f"CASE WHEN nrm = 0 THEN 0.0 ELSE ROUND(u{i} / nrm, 6) END AS f{i}"
            for i in range(64))
        ).replace("{LIST}", ", ".join(
            f"f{i}" for i in range(64))),
        # MIPS via the norm-augmentation reduction: the engine ranks
        # through the augmented-cosine transform, the oracle ranks by the
        # raw inner product — agreement proves the reduction
        "emb_mips_topk": """
            SELECT vec_id,
                   ROUND(list_inner_product(
                       CAST(embedding AS DOUBLE[]),
                       (SELECT CAST(embedding AS DOUBLE[])
                        FROM embeddings WHERE vec_id = 0)), 6) AS ip
            FROM embeddings
            ORDER BY list_inner_product(
                       CAST(embedding AS DOUBLE[]),
                       (SELECT CAST(embedding AS DOUBLE[])
                        FROM embeddings WHERE vec_id = 0)) DESC, vec_id
            LIMIT 10
        """,
        # IVF-ANN recall audit: rebuild the identical index (vec_id<8
        # seeds + one ROUND-6 Lloyd step, same contract as the kmeans
        # twins), probe nprobe=2 cells per query, rank in-cell, and
        # compare against the exact top-10 — checksums pin both sets
        "emb_ivf_recall": """
            WITH cents0 AS (
                SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS ce
                FROM embeddings WHERE vec_id < 8
            ), s1 AS (
                SELECT e.vec_id, c.cid,
                       ROUND(list_cosine_similarity(
                           CAST(e.embedding AS DOUBLE[]), c.ce), 6) AS score
                FROM embeddings e CROSS JOIN cents0 c
            ), a1 AS (
                SELECT vec_id, cid FROM (
                    SELECT vec_id, cid,
                           ROW_NUMBER() OVER (PARTITION BY vec_id
                                              ORDER BY score DESC, cid) AS rn
                    FROM s1) WHERE rn = 1
            ), m AS (
                SELECT a1.cid, {MEANS}
                FROM a1 JOIN embeddings e USING (vec_id) GROUP BY a1.cid
            ), cells AS (
                SELECT vec_id, cid FROM (
                    SELECT e.vec_id, m.cid,
                           ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                               ROUND(({DOT}) / (sqrt({NE}) * sqrt({NM})), 6)
                               DESC, m.cid) AS rn
                    FROM embeddings e CROSS JOIN m) WHERE rn = 1
            ), probed AS (
                SELECT qid, cid FROM (
                    SELECT q.vec_id AS qid, m.cid,
                           ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
                               ROUND(({QDOT}) / (sqrt({QN}) * sqrt({NM})), 6)
                               DESC, m.cid) AS rn
                    FROM embeddings q CROSS JOIN m
                    WHERE q.vec_id < 4) WHERE rn <= 2
            ), sc AS (
                SELECT q.vec_id AS qid, e.vec_id AS vid,
                       ROUND(list_cosine_similarity(
                           CAST(e.embedding AS DOUBLE[]),
                           CAST(q.embedding AS DOUBLE[])), 6) AS s
                FROM embeddings e CROSS JOIN embeddings q
                WHERE q.vec_id < 4 AND e.vec_id <> q.vec_id
            ), brute AS (
                SELECT qid, vid FROM (
                    SELECT qid, vid,
                           ROW_NUMBER() OVER (PARTITION BY qid
                                              ORDER BY s DESC, vid) AS rn
                    FROM sc) WHERE rn <= 10
            ), ann AS (
                SELECT qid, vid FROM (
                    SELECT sc.qid, sc.vid,
                           ROW_NUMBER() OVER (PARTITION BY sc.qid
                                              ORDER BY sc.s DESC, sc.vid) AS rn
                    FROM sc JOIN cells ON sc.vid = cells.vec_id
                            JOIN probed p ON p.qid = sc.qid
                                         AND p.cid = cells.cid
                    ) WHERE rn <= 10
            ), r AS (
                SELECT b.qid,
                       SUM(CASE WHEN a.vid IS NOT NULL THEN 1 ELSE 0 END) AS hits,
                       SUM(b.vid) AS exact_sum
                FROM brute b LEFT JOIN ann a ON a.qid = b.qid AND a.vid = b.vid
                GROUP BY b.qid
            ), asum AS (
                SELECT qid, SUM(vid) AS ann_sum FROM ann GROUP BY qid
            )
            SELECT r.qid AS query_id,
                   CAST(r.hits AS BIGINT) AS recall_hits,
                   CAST(r.exact_sum AS BIGINT) AS exact_checksum,
                   CAST(COALESCE(asum.ann_sum, 0) AS BIGINT) AS ann_checksum
            FROM r LEFT JOIN asum ON asum.qid = r.qid
            ORDER BY query_id
        """.replace("{MEANS}", ", ".join(
            f"ROUND(AVG(CAST(e.embedding[{i + 1}] AS DOUBLE)), 6) AS m{i}"
            for i in range(64))
        ).replace("{DOT}", " + ".join(
            f"CAST(e.embedding[{i + 1}] AS DOUBLE) * m.m{i}"
            for i in range(64))
        ).replace("{NE}", " + ".join(
            f"CAST(e.embedding[{i + 1}] AS DOUBLE)"
            f" * CAST(e.embedding[{i + 1}] AS DOUBLE)"
            for i in range(64))
        ).replace("{QDOT}", " + ".join(
            f"CAST(q.embedding[{i + 1}] AS DOUBLE) * m.m{i}"
            for i in range(64))
        ).replace("{QN}", " + ".join(
            f"CAST(q.embedding[{i + 1}] AS DOUBLE)"
            f" * CAST(q.embedding[{i + 1}] AS DOUBLE)"
            for i in range(64))
        ).replace("{NM}", " + ".join(
            f"m.m{i} * m.m{i}" for i in range(64))),
        # corpus-trained bigram LM score: p(w2|w1) in ppm, floor-divided
        # twice (integer-exact) — single-token docs have no bigrams
        "docs_lm_score": r"""
            WITH toks AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '\s+'),
                                   x -> x != '') AS w
                FROM documents
            ), tok AS (
                SELECT doc_id, unnest(w) AS word,
                       generate_subscripts(w, 1) AS pos
                FROM toks
            ), uni AS (
                SELECT word, CAST(COUNT(*) AS BIGINT) AS c1
                FROM tok GROUP BY word
            ), big AS (
                SELECT a.doc_id, a.word AS w1, b.word AS w2
                FROM tok a JOIN tok b
                  ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
            ), bc AS (
                SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
                FROM big GROUP BY w1, w2
            )
            SELECT big.doc_id, CAST(COUNT(*) AS BIGINT) AS nbig,
                   CAST(SUM(1000000 * bc.c12 // uni.c1) // COUNT(*)
                        AS BIGINT) AS avg_lm_q
            FROM big JOIN bc ON big.w1 = bc.w1 AND big.w2 = bc.w2
                     JOIN uni ON uni.word = big.w1
            GROUP BY big.doc_id ORDER BY big.doc_id
        """,
        # hard negatives: top-5 nearest with a DIFFERENT label per query;
        # rounded-before-rank so numpy and DuckDB order identically
        "emb_hard_negatives": """
            WITH q AS (
                SELECT vec_id AS qid, label AS qlabel,
                       CAST(embedding AS DOUBLE[]) AS qv
                FROM embeddings WHERE vec_id < 4
            ), s AS (
                SELECT q.qid, e.vec_id,
                       ROUND(list_cosine_similarity(
                           CAST(e.embedding AS DOUBLE[]), q.qv), 6) AS score
                FROM q JOIN embeddings e ON e.label != q.qlabel
            )
            SELECT qid AS query_id,
                   CAST(ROW_NUMBER() OVER (PARTITION BY qid
                            ORDER BY score DESC, vec_id) - 1 AS BIGINT)
                       AS "rank",
                   vec_id, score
            FROM s
            QUALIFY ROW_NUMBER() OVER (PARTITION BY qid
                        ORDER BY score DESC, vec_id) <= 5
            ORDER BY query_id, "rank"
        """,
        # greedy farthest-point (k-center) selection, unrolled CTE chain
        "emb_kcenter": _kcenter_sql(6),
        # per-type OLS slope from exact HUGEINT moments; // truncates
        # toward zero in DuckDB and the engine mirrors it
        "events_linreg": """
            WITH c AS (
                SELECT event_type,
                       CAST(datediff('hour', TIMESTAMP '2024-01-01', ts)
                            AS HUGEINT) AS x,
                       CAST(FLOOR(value * 100 + 0.5) AS HUGEINT) AS y
                FROM events
            ), m AS (
                SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS n,
                       SUM(x) AS sx, SUM(y) AS sy,
                       SUM(x * x) AS sxx, SUM(x * y) AS sxy
                FROM c GROUP BY event_type
            )
            SELECT event_type, CAST(n AS BIGINT) AS n,
                   CAST(sy AS BIGINT) AS sum_cents,
                   CAST(CASE WHEN n * sxx - sx * sx = 0 THEN 0
                             ELSE ((n * sxy - sx * sy) * 1000000)
                                  // (n * sxx - sx * sx)
                        END AS BIGINT) AS slope_ppm
            FROM m ORDER BY event_type
        """,
        # sweep line: per-day max concurrent sessions; ends sort before
        # starts at equal instants (d=-1 < 1), RANGE peers collapse
        "events_concurrency": """
            WITH s AS (
                SELECT user_id, ts,
                       CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                                                    ORDER BY ts)
                                 > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS brk
                FROM events
            ), t AS (
                SELECT user_id, ts,
                       SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING)
                           AS session_id
                FROM s
            ), sess AS (
                SELECT user_id, session_id,
                       MIN(ts) AS start_ts, MAX(ts) AS end_ts
                FROM t GROUP BY user_id, session_id
            ), b AS (
                SELECT start_ts AS ts, 1 AS d FROM sess
                UNION ALL SELECT end_ts, -1 FROM sess
            ), r AS (
                SELECT ts, d, SUM(d) OVER (ORDER BY ts, d) AS running
                FROM b
            )
            SELECT date_trunc('day', ts) AS day,
                   CAST(MAX(running) AS BIGINT) AS max_concurrent
            FROM r GROUP BY 1 ORDER BY 1
        """,
        # Croston intermittent demand: coupled size/interval integer
        # EWMAs (α=¼ floor-div, the daily_ewma recurrence contract)
        # replayed per part by one recursive CTE; single-demand parts
        # emit nothing
        "parts_croston": """
            WITH RECURSIVE d AS (
                SELECT l_partkey AS p,
                       CAST(date_trunc('month', l_shipdate)
                            AS TIMESTAMP) AS m,
                       SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT))
                           AS cq
                FROM lineitem GROUP BY 1, 2
            ), h AS (
                SELECT p, cq,
                       CAST(EXTRACT(year FROM m) * 12
                            + EXTRACT(month FROM m) AS BIGINT) AS mi,
                       row_number() OVER (PARTITION BY p ORDER BY m)
                           AS i,
                       COUNT(*) OVER (PARTITION BY p) AS nd
                FROM d
            ), hh AS (
                SELECT * FROM h WHERE nd >= 2
            ), r AS (
                SELECT p, i, mi, nd, cq AS z, CAST(0 AS BIGINT) AS pm
                FROM hh WHERE i = 1
                UNION ALL
                SELECT h.p, h.i, h.mi, h.nd,
                       (3 * r.z + h.cq) // 4,
                       CASE WHEN r.i = 1 THEN h.mi - r.mi
                            ELSE (3 * r.pm + (h.mi - r.mi)) // 4 END
                FROM hh h JOIN r ON h.p = r.p AND h.i = r.i + 1
            )
            SELECT p AS p_partkey, CAST(nd AS BIGINT) AS n_demands,
                   CAST(z AS BIGINT) AS z_cq, CAST(pm AS BIGINT) AS p_m,
                   CAST(z // pm AS BIGINT) AS forecast_cq
            FROM r WHERE i = nd ORDER BY p
        """,
        # RLE run census per column under the (l_orderkey, l_linenumber)
        # clustering; n_runs counts change-points including the first
        # row (LAG IS DISTINCT FROM), avg run length in ppm
        "lineitem_rle_runs": """
            WITH t AS (
                SELECT l_orderkey, l_returnflag, l_linestatus, l_suppkey,
                       LAG(l_orderkey)   OVER w AS p_ok,
                       LAG(l_returnflag) OVER w AS p_rf,
                       LAG(l_linestatus) OVER w AS p_ls,
                       LAG(l_suppkey)    OVER w AS p_sk
                FROM lineitem
                WINDOW w AS (ORDER BY l_orderkey, l_linenumber,
                            l_suppkey, l_returnflag, l_linestatus)
            ), runs AS (
                SELECT 'l_orderkey' AS column_name, COUNT(*) AS n_rows,
                       COUNT(*) FILTER (l_orderkey IS DISTINCT FROM p_ok)
                           AS n_runs
                FROM t
                UNION ALL
                SELECT 'l_returnflag', COUNT(*),
                       COUNT(*) FILTER (l_returnflag IS DISTINCT FROM p_rf)
                FROM t
                UNION ALL
                SELECT 'l_linestatus', COUNT(*),
                       COUNT(*) FILTER (l_linestatus IS DISTINCT FROM p_ls)
                FROM t
                UNION ALL
                SELECT 'l_suppkey', COUNT(*),
                       COUNT(*) FILTER (l_suppkey IS DISTINCT FROM p_sk)
                FROM t
            )
            SELECT column_name, CAST(n_rows AS BIGINT) AS n_rows,
                   CAST(n_runs AS BIGINT) AS n_runs,
                   CAST(CAST(n_rows AS HUGEINT) * 1000000 // n_runs
                        AS BIGINT) AS avg_run_len_ppm
            FROM runs WHERE n_rows > 0 ORDER BY column_name
        """,
        # lead–lag betas between gap-filled daily view/purchase series:
        # exact integer centering e_t = n·x_t − Σx (autocorr contract),
        # beta_ppm = 10⁶·Σ eˣ_t·eʸ_{t+k} // Σ(eˣ)² (trunc-div)
        "events_lead_lag": """
            WITH ev AS (
                SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
                       event_type
                FROM events WHERE event_type IN ('view', 'purchase')
            ), bounds AS (
                SELECT MIN(d) AS lo, MAX(d) AS hi,
                       datediff('day', MIN(d), MAX(d)) + 1 AS n
                FROM ev
            ), cal AS (
                SELECT datediff('day', b.lo, gs.d) AS idx
                FROM bounds b,
                     LATERAL (SELECT unnest(generate_series(
                         b.lo, b.hi, INTERVAL 1 DAY))::DATE AS d) gs
            ), cnt AS (
                SELECT datediff('day', b.lo, e.d) AS idx,
                       COUNT(*) FILTER (e.event_type = 'view')
                           AS xv,
                       COUNT(*) FILTER (e.event_type = 'purchase')
                           AS yv
                FROM ev e, bounds b GROUP BY 1
            ), s AS (
                SELECT c.idx,
                       CAST(COALESCE(t.xv, 0) AS HUGEINT) AS xv,
                       CAST(COALESCE(t.yv, 0) AS HUGEINT) AS yv
                FROM cal c LEFT JOIN cnt t ON t.idx = c.idx
            ), tot AS (
                SELECT SUM(xv) AS sx, SUM(yv) AS sy FROM s
            ), e AS (
                SELECT s.idx,
                       (SELECT n FROM bounds) * s.xv - tot.sx AS ex,
                       (SELECT n FROM bounds) * s.yv - tot.sy AS ey
                FROM s, tot
            ), den AS (
                SELECT SUM(ex * ex) AS dx FROM e
            ), lags AS (
                SELECT unnest(range(-3, 4)) AS lag
            )
            SELECT CAST(l.lag AS BIGINT) AS lag,
                   CAST((SELECT n FROM bounds) AS BIGINT) AS n_days,
                   CAST(CASE WHEN (SELECT dx FROM den) = 0 THEN 0
                        ELSE 1000000 * (
                            SELECT COALESCE(SUM(a.ex * b.ey), 0)
                            FROM e a JOIN e b ON b.idx = a.idx + l.lag)
                            // (SELECT dx FROM den) END AS BIGINT)
                        AS beta_ppm
            FROM lags l WHERE (SELECT lo FROM bounds) IS NOT NULL
            ORDER BY lag
        """,
        # truncated Katz centrality: exact length-1/2/3 walk counts into
        # each node of the support-2 co-order graph, katz_64 =
        # 16·w1 + 4·w2 + w3 (β=¼ × 4³), top-20 ties (katz DESC, part ASC)
        "parts_katz": """
            WITH d AS (
                SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
            ), pairs AS (
                SELECT l1.l_partkey AS a, l2.l_partkey AS b
                FROM d l1 JOIN d l2
                  ON l1.l_orderkey = l2.l_orderkey
                 AND l1.l_partkey < l2.l_partkey
                GROUP BY 1, 2 HAVING COUNT(*) >= 2
            ), edges AS (
                SELECT a, b FROM pairs
                UNION ALL SELECT b AS a, a AS b FROM pairs
            ), w1 AS (
                SELECT b AS node, CAST(COUNT(*) AS HUGEINT) AS w
                FROM edges GROUP BY 1
            ), w2 AS (
                SELECT e.b AS node, SUM(w1.w) AS w
                FROM edges e JOIN w1 ON w1.node = e.a GROUP BY 1
            ), w3 AS (
                SELECT e.b AS node, SUM(w2.w) AS w
                FROM edges e JOIN w2 ON w2.node = e.a GROUP BY 1
            )
            SELECT CAST(w1.node AS BIGINT) AS p_partkey,
                   CAST(w1.w AS BIGINT) AS w1,
                   CAST(w2.w AS BIGINT) AS w2,
                   CAST(w3.w AS BIGINT) AS w3,
                   CAST(16 * w1.w + 4 * w2.w + w3.w AS BIGINT)
                       AS katz_64
            FROM w1 JOIN w2 USING (node) JOIN w3 USING (node)
            ORDER BY katz_64 DESC, p_partkey LIMIT 20
        """,
        # synchronous label propagation, 4 rounds: relabel every node
        # with its most frequent neighbor label (ties → smallest), then
        # census the final labels
        "parts_modularity": """
            WITH d AS (
                SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
            ), pairs AS (
                SELECT l1.l_partkey AS a, l2.l_partkey AS b
                FROM d l1 JOIN d l2
                  ON l1.l_orderkey = l2.l_orderkey
                 AND l1.l_partkey < l2.l_partkey
                GROUP BY 1, 2 HAVING COUNT(*) >= 3
            ), edges AS (
                SELECT a, b FROM pairs
                UNION ALL SELECT b AS a, a AS b FROM pairs
            ), lab0 AS (
                SELECT DISTINCT a AS id, a AS lab FROM edges
            ), c1 AS (
                SELECT e.b AS id, l.lab, COUNT(*) AS c
                FROM edges e JOIN lab0 l ON l.id = e.a GROUP BY 1, 2
            ), lab1 AS (
                SELECT id, lab FROM (
                    SELECT id, lab, row_number() OVER (
                        PARTITION BY id ORDER BY c DESC, lab) AS rn
                    FROM c1) WHERE rn = 1
            ), c2 AS (
                SELECT e.b AS id, l.lab, COUNT(*) AS c
                FROM edges e JOIN lab1 l ON l.id = e.a GROUP BY 1, 2
            ), lab2 AS (
                SELECT id, lab FROM (
                    SELECT id, lab, row_number() OVER (
                        PARTITION BY id ORDER BY c DESC, lab) AS rn
                    FROM c2) WHERE rn = 1
            ), c3 AS (
                SELECT e.b AS id, l.lab, COUNT(*) AS c
                FROM edges e JOIN lab2 l ON l.id = e.a GROUP BY 1, 2
            ), lab3 AS (
                SELECT id, lab FROM (
                    SELECT id, lab, row_number() OVER (
                        PARTITION BY id ORDER BY c DESC, lab) AS rn
                    FROM c3) WHERE rn = 1
            ), c4 AS (
                SELECT e.b AS id, l.lab, COUNT(*) AS c
                FROM edges e JOIN lab3 l ON l.id = e.a GROUP BY 1, 2
            ), lab4 AS (
                SELECT id, lab FROM (
                    SELECT id, lab, row_number() OVER (
                        PARTITION BY id ORDER BY c DESC, lab) AS rn
                    FROM c4) WHERE rn = 1
            ), m AS (
                SELECT CAST(COUNT(*) AS HUGEINT) AS m2 FROM edges
            ), attach AS (
                SELECT la.lab AS la, lb.lab AS lbl
                FROM edges e JOIN lab4 la ON la.id = e.a
                             JOIN lab4 lb ON lb.id = e.b
            ), per AS (
                SELECT la AS lab,
                       CAST(SUM(CASE WHEN la = lbl THEN 1 ELSE 0 END)
                            AS HUGEINT) AS intra2,
                       CAST(COUNT(*) AS HUGEINT) AS dsum
                FROM attach GROUP BY 1
            )
            SELECT CAST(lab AS BIGINT) AS community_id,
                   CAST(intra2 AS BIGINT) AS intra2,
                   CAST(dsum AS BIGINT) AS deg_sum,
                   CAST(intra2 * m.m2 - dsum * dsum AS BIGINT) AS q_num
            FROM per CROSS JOIN m ORDER BY 1
        """,
        "parts_label_propagation": """
            WITH d AS (
                SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
            ), pairs AS (
                SELECT l1.l_partkey AS a, l2.l_partkey AS b
                FROM d l1 JOIN d l2
                  ON l1.l_orderkey = l2.l_orderkey
                 AND l1.l_partkey < l2.l_partkey
                GROUP BY 1, 2 HAVING COUNT(*) >= 3
            ), edges AS (
                SELECT a, b FROM pairs
                UNION ALL SELECT b AS a, a AS b FROM pairs
            ), lab0 AS (
                SELECT DISTINCT a AS id, a AS lab FROM edges
            ), c1 AS (
                SELECT e.b AS id, l.lab, COUNT(*) AS c
                FROM edges e JOIN lab0 l ON l.id = e.a GROUP BY 1, 2
            ), lab1 AS (
                SELECT id, lab FROM (
                    SELECT id, lab, row_number() OVER (
                        PARTITION BY id ORDER BY c DESC, lab) AS rn
                    FROM c1) WHERE rn = 1
            ), c2 AS (
                SELECT e.b AS id, l.lab, COUNT(*) AS c
                FROM edges e JOIN lab1 l ON l.id = e.a GROUP BY 1, 2
            ), lab2 AS (
                SELECT id, lab FROM (
                    SELECT id, lab, row_number() OVER (
                        PARTITION BY id ORDER BY c DESC, lab) AS rn
                    FROM c2) WHERE rn = 1
            ), c3 AS (
                SELECT e.b AS id, l.lab, COUNT(*) AS c
                FROM edges e JOIN lab2 l ON l.id = e.a GROUP BY 1, 2
            ), lab3 AS (
                SELECT id, lab FROM (
                    SELECT id, lab, row_number() OVER (
                        PARTITION BY id ORDER BY c DESC, lab) AS rn
                    FROM c3) WHERE rn = 1
            ), c4 AS (
                SELECT e.b AS id, l.lab, COUNT(*) AS c
                FROM edges e JOIN lab3 l ON l.id = e.a GROUP BY 1, 2
            ), lab4 AS (
                SELECT id, lab FROM (
                    SELECT id, lab, row_number() OVER (
                        PARTITION BY id ORDER BY c DESC, lab) AS rn
                    FROM c4) WHERE rn = 1
            )
            SELECT CAST(lab AS BIGINT) AS community_id,
                   CAST(COUNT(*) AS BIGINT) AS n_parts,
                   CAST(SUM(id) AS BIGINT) AS part_checksum
            FROM lab4 GROUP BY 1 ORDER BY 1
        """,
        # BOM-style subtree rollup over the decimal prefix hierarchy:
        # node v aggregates every part whose prefix chain passes v;
        # the root 0 counts once per part (first k reaching 0)
        "parts_bom_rollup": """
            WITH pc AS (
                SELECT p_partkey AS p,
                       CAST(FLOOR(p_retailprice * 100 + 0.5) AS BIGINT)
                           AS cents
                FROM part
            ), anc AS (
                SELECT p, cents,
                       p // CAST(POWER(10, k) AS BIGINT) AS node
                FROM pc, (SELECT unnest(range(0, 13)) AS k)
                WHERE p // CAST(POWER(10, k) AS BIGINT) <= 99
                  AND (k = 0
                       OR p // CAST(POWER(10, k) AS BIGINT) > 0
                       OR p // CAST(POWER(10, k - 1) AS BIGINT) > 0)
            )
            SELECT node, CAST(COUNT(*) AS BIGINT) AS n_parts,
                   CAST(SUM(cents) AS BIGINT) AS total_cents
            FROM anc GROUP BY node ORDER BY node
        """,
        # month-over-month Jaccard of the co-order edge set; the last
        # observed month compares against an empty successor
        "parts_edge_churn": """
            WITH e AS (
                SELECT DISTINCT
                       CAST(date_trunc('month', o.o_orderdate)
                            AS TIMESTAMP) AS m,
                       a.l_partkey AS x, b.l_partkey AS y
                FROM lineitem a
                JOIN lineitem b ON a.l_orderkey = b.l_orderkey
                                AND a.l_partkey < b.l_partkey
                JOIN orders o ON o.o_orderkey = a.l_orderkey
            ), cnt AS (
                SELECT m, CAST(COUNT(*) AS BIGINT) AS n FROM e GROUP BY m
            ), com AS (
                SELECT e1.m, CAST(COUNT(*) AS BIGINT) AS c
                FROM e e1 JOIN e e2
                  ON e1.x = e2.x AND e1.y = e2.y
                 AND e2.m = e1.m + INTERVAL 1 MONTH
                GROUP BY e1.m
            )
            SELECT c1.m AS month1, c1.n AS n_edges1,
                   COALESCE(c2.n, 0) AS n_edges2,
                   COALESCE(com.c, 0) AS n_common,
                   CAST(COALESCE(com.c, 0) * 1000000
                        // (c1.n + COALESCE(c2.n, 0) - COALESCE(com.c, 0))
                        AS BIGINT) AS jaccard_ppm
            FROM cnt c1
            LEFT JOIN cnt c2 ON c2.m = c1.m + INTERVAL 1 MONTH
            LEFT JOIN com ON com.m = c1.m
            ORDER BY month1
        """,
        # hop-6 Wasserman–Faust closeness from the 4 smallest part keys:
        # the parts_bfs_levels reach closure per source, farness = Σ min
        # levels, (n_reach−1)²·10⁶ // ((n_nodes−1)·farness)
        "parts_closeness": """
            WITH RECURSIVE dedup AS (
                SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
            ), pairs AS (
                SELECT a.l_partkey AS x, b.l_partkey AS y
                FROM dedup a JOIN dedup b
                  ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey < b.l_partkey
                GROUP BY x, y HAVING COUNT(*) >= 2
            ), e AS (
                SELECT x AS a, y AS b FROM pairs
                UNION ALL SELECT y, x FROM pairs
            ), nodes AS (
                SELECT DISTINCT a AS pk FROM e
            ), nn AS (
                SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes
            ), srcs AS (
                SELECT pk AS src FROM nodes ORDER BY pk LIMIT 4
            ), reach(src, pk, lvl) AS (
                SELECT src, src, 0 FROM srcs
                UNION
                SELECT r.src, e.b, r.lvl + 1 FROM reach r
                JOIN e ON e.a = r.pk
                WHERE r.lvl < 6
            ), d AS (
                SELECT src, pk, MIN(lvl) AS dist
                FROM reach GROUP BY 1, 2
            ), agg AS (
                SELECT src, CAST(COUNT(*) AS BIGINT) AS n_reach,
                       CAST(SUM(dist) AS BIGINT) AS farness
                FROM d GROUP BY src
            )
            SELECT src, n_reach, farness,
                   CASE WHEN farness = 0 OR nn.n <= 1 THEN 0
                        ELSE CAST(CAST(n_reach - 1 AS HUGEINT)
                             * (n_reach - 1) * 1000000
                             // (CAST(nn.n - 1 AS HUGEINT) * farness)
                             AS BIGINT)
                   END AS closeness_ppm
            FROM agg, nn ORDER BY src
        """,
        # BFS hop distance over the co-order part graph (≤ 4 hops from the
        # min edge endpoint); recursive reach closure, MIN(level) per node
        "parts_bfs_levels": """
            WITH RECURSIVE dedup AS (
                SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
            ), pairs AS (
                SELECT a.l_partkey AS x, b.l_partkey AS y
                FROM dedup a JOIN dedup b
                  ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey < b.l_partkey
                GROUP BY x, y HAVING COUNT(*) >= 2
            ), e AS (
                SELECT x AS a, y AS b FROM pairs
                UNION ALL SELECT y, x FROM pairs
            ), reach(pk, lvl) AS (
                SELECT MIN(a), 0 FROM e HAVING COUNT(*) > 0
                UNION
                SELECT e.b, r.lvl + 1 FROM reach r JOIN e ON e.a = r.pk
                WHERE r.lvl < 4
            )
            SELECT pk AS l_partkey, CAST(MIN(lvl) AS BIGINT) AS level
            FROM reach GROUP BY pk ORDER BY pk
        """,
        # hourly resample + last-observation-carried-forward per type
        "events_gap_fill": """
            WITH c AS (
                SELECT event_type, event_id, epoch_us(ts) AS ts_us,
                       CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
                FROM events
            ), hl AS (
                SELECT event_type, hour, cents FROM (
                    SELECT event_type, ts_us // 3600000000 AS hour, cents,
                           ROW_NUMBER() OVER (
                               PARTITION BY event_type, ts_us // 3600000000
                               ORDER BY ts_us DESC, event_id DESC) AS rn
                    FROM c) WHERE rn = 1
            ), bounds AS (
                SELECT MIN(hour) AS lo, MAX(hour) AS hi FROM hl
            ), firsts AS (
                SELECT event_type, MIN(hour) AS fh FROM hl
                GROUP BY event_type
            ), axis AS (
                SELECT f.event_type, g.hour
                FROM firsts f CROSS JOIN (
                    SELECT UNNEST(generate_series(
                        (SELECT lo FROM bounds),
                        (SELECT hi FROM bounds))) AS hour) g
                WHERE g.hour >= f.fh
            )
            SELECT a.event_type,
                   make_timestamp(a.hour * 3600000000) AS hour,
                   CAST(LAST_VALUE(hl.cents IGNORE NULLS) OVER (
                       PARTITION BY a.event_type ORDER BY a.hour)
                       AS BIGINT) AS cents,
                   CAST(CASE WHEN hl.cents IS NULL THEN 1 ELSE 0 END
                        AS BIGINT) AS filled
            FROM axis a LEFT JOIN hl
              ON hl.event_type = a.event_type AND hl.hour = a.hour
            ORDER BY a.event_type, a.hour
        """,
        # positional-posting intersection: exact phrase "hash join"
        "docs_phrase_search": r"""
            WITH toks AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '\s+'),
                                   x -> x != '') AS w
                FROM documents
            ), tok AS (
                SELECT doc_id, unnest(w) AS word,
                       generate_subscripts(w, 1) AS pos
                FROM toks
            ), p1 AS (
                SELECT doc_id, pos FROM tok WHERE word = 'hash'
            ), p2 AS (
                SELECT doc_id, pos FROM tok WHERE word = 'join'
            )
            SELECT p1.doc_id, CAST(COUNT(*) AS BIGINT) AS n_matches
            FROM p1 JOIN p2
              ON p1.doc_id = p2.doc_id AND p2.pos = p1.pos + 1
            GROUP BY p1.doc_id ORDER BY p1.doc_id
        """,
        # ±1 Johnson–Lindenstrauss projection, generated left-to-right sums
        "emb_random_projection": _random_projection_sql(),
        "emb_rptree_recall": _rptree_sql(),
        # kNN reliability table: hold out vec_id%5==0, majority of 5
        # nearest labeled (tie pins = emb_knn_classify), bucket by the
        # winning vote count
        "emb_knn_calibration": """
            WITH q AS (SELECT vec_id, label AS tl,
                              CAST(embedding AS DOUBLE[]) AS qe
                       FROM embeddings WHERE vec_id % 5 = 0),
            lab AS (SELECT vec_id, label AS nl,
                           CAST(embedding AS DOUBLE[]) AS le
                    FROM embeddings WHERE vec_id % 5 <> 0),
            kkv AS (SELECT LEAST(5, COUNT(*)) AS kk FROM lab),
            cs AS (SELECT q.vec_id AS qid, q.tl, l.vec_id AS nid, l.nl,
                          ROUND(list_cosine_similarity(q.qe, l.le), 6)
                              AS c
                   FROM q CROSS JOIN lab l),
            rk AS (SELECT qid, tl, nl,
                          ROW_NUMBER() OVER (PARTITION BY qid
                                             ORDER BY c DESC, nid) AS rn
                   FROM cs),
            top AS (SELECT qid, tl, nl FROM rk CROSS JOIN kkv
                    WHERE rn <= kk),
            vt AS (SELECT qid, tl, nl, CAST(COUNT(*) AS BIGINT) AS v
                   FROM top GROUP BY 1, 2, 3),
            pred AS (SELECT qid, tl, nl, v,
                            ROW_NUMBER() OVER (PARTITION BY qid
                                               ORDER BY v DESC, nl) AS r
                     FROM vt)
            SELECT CAST(v AS BIGINT) AS votes,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN nl = tl THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_correct,
                   CAST(SUM(CASE WHEN nl = tl THEN 1 ELSE 0 END)
                        * 1000000 // COUNT(*) AS BIGINT) AS acc_ppm
            FROM pred WHERE r = 1 GROUP BY 1 ORDER BY 1
        """,
        # Local Outlier Factor: micro distances (the cluster_stats
        # conversion), kk nearest by (d ASC, id), reach = max(d, kdist),
        # two pinned fixed-point ratio levels, top-10 by lof
        "emb_lof": """
            -- k=3 nearest per point WITHOUT the 4e8-pair window (see
            -- emb_snn_components): three MAX scans over the key
            -- (2000000 - d, -o), decoded back to (o, d)
            WITH v AS MATERIALIZED (
                SELECT vec_id, CAST(embedding AS DOUBLE[64]) AS emb
                FROM embeddings
            ),
            P AS (
                SELECT a.vec_id AS p,
                       (2000000 - (1000000
                            - CAST(ROUND(array_cosine_similarity(
                                  a.emb, b.emb) * 1000000, 0) AS BIGINT)))
                           * 4294967296
                       + (2147483647 - b.vec_id) AS key
                FROM v a JOIN v b ON a.vec_id <> b.vec_id
            ),
            kkv AS (SELECT LEAST(3, COUNT(*) - 1) AS kk FROM embeddings),
            t1 AS MATERIALIZED (
                SELECT p, MAX(key) AS k FROM P GROUP BY p),
            t2 AS MATERIALIZED (
                SELECT P.p, MAX(P.key) AS k FROM P
                JOIN t1 ON t1.p = P.p WHERE P.key < t1.k GROUP BY P.p),
            t3 AS MATERIALIZED (
                SELECT P.p, MAX(P.key) AS k FROM P
                JOIN t2 ON t2.p = P.p WHERE P.key < t2.k GROUP BY P.p),
            nn AS MATERIALIZED (
                SELECT p, 2147483647 - (k % 4294967296) AS o,
                       2000000 - (k // 4294967296) AS d
                FROM (SELECT p, k FROM t1 UNION ALL
                      SELECT p, k FROM t2 UNION ALL
                      SELECT p, k FROM t3)
            ),
            kd AS (SELECT p, MAX(d) AS kdist FROM nn GROUP BY 1),
            reach AS (SELECT nn.p,
                             CAST(SUM(GREATEST(nn.d, kdo.kdist))
                                  AS HUGEINT) AS s
                      FROM nn JOIN kd kdo ON kdo.p = nn.o GROUP BY 1),
            lrd AS (SELECT reach.p,
                           CAST(kkv.kk AS HUGEINT) * 1000000000000
                               // GREATEST(reach.s, 1) AS v
                    FROM reach CROSS JOIN kkv),
            lof AS (SELECT nn.p,
                           CAST(SUM(lo.v) * 1000000
                                // (kkv.kk * lp.v) AS BIGINT) AS lof_ppm
                    FROM nn JOIN lrd lo ON lo.p = nn.o
                            JOIN lrd lp ON lp.p = nn.p
                            CROSS JOIN kkv
                    GROUP BY nn.p, kkv.kk, lp.v)
            SELECT lof.p AS vec_id,
                   CAST(kd.kdist AS BIGINT) AS kdist_micro,
                   CAST(lrd.v AS BIGINT) AS lrd_ppm,
                   lof.lof_ppm
            FROM lof JOIN kd ON kd.p = lof.p JOIN lrd ON lrd.p = lof.p
            ORDER BY lof.lof_ppm DESC, vec_id LIMIT 10
        """,
        # SCD-2 dimension build from the orders change log
        "orders_scd2": """
            WITH s AS (
              SELECT o_custkey,
                     CAST(ROW_NUMBER() OVER w AS BIGINT) AS version,
                     strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
                     COALESCE(LEAD(strftime(o_orderdate, '%Y-%m-%d')) OVER w,
                              '9999-12-31') AS valid_to,
                     CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)
                         AS price_cents,
                     CAST(CASE WHEN LEAD(o_orderkey) OVER w IS NULL
                          THEN 1 ELSE 0 END AS BIGINT) AS is_current
              FROM orders
              WINDOW w AS (PARTITION BY o_custkey
                           ORDER BY o_orderdate, o_orderkey)
            )
            SELECT o_custkey, version, valid_from, valid_to, price_cents,
                   is_current
            FROM s ORDER BY o_custkey, version
        """,
        # Gopher-rule word census (thresholds mirror docqueries constants)
        "docs_gopher_rules": f"""
            WITH w AS (
              SELECT doc_id, unnest(string_split(text,' ')) AS word,
                     generate_subscripts(string_split(text,' '), 1) AS pos
              FROM documents
            ), runs AS (
              SELECT doc_id, pos,
                     CASE WHEN lag(word) OVER (PARTITION BY doc_id
                                               ORDER BY pos) = word
                          THEN 0 ELSE 1 END AS brk
              FROM w
            ), grp AS (
              SELECT doc_id,
                     SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS rid
              FROM runs
            ), runlen AS (
              SELECT doc_id, CAST(MAX(cnt) AS BIGINT) AS max_run FROM
                (SELECT doc_id, rid, COUNT(*) AS cnt
                 FROM grp GROUP BY doc_id, rid)
              GROUP BY doc_id
            ), stats AS (
              SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
                     CAST((SUM(length(word))*100)//COUNT(*) AS BIGINT)
                         AS mean_wlen_c100,
                     CAST((COUNT(DISTINCT word)*1000000)//COUNT(*) AS BIGINT)
                         AS ttr_ppm
              FROM w GROUP BY doc_id
            )
            SELECT s.doc_id, n_words, mean_wlen_c100, ttr_ppm, max_run,
                   CAST(CASE WHEN n_words >= {dq._GOPHER_MIN_WORDS}
                             AND ttr_ppm >= {dq._GOPHER_TTR_MIN_PPM}
                             AND max_run <= {dq._GOPHER_MAX_RUN}
                        THEN 1 ELSE 0 END AS BIGINT) AS keep
            FROM stats s JOIN runlen r USING (doc_id) ORDER BY s.doc_id
        """,
        # C4-adapted line filter over fixed 10-word windows
        "docs_line_filter": f"""
            WITH w AS (
              SELECT doc_id, unnest(string_split(text,' ')) AS word,
                     generate_subscripts(string_split(text,' '), 1) AS pos
              FROM documents
            ), l AS (
              SELECT doc_id, (pos-1)//{dq.LINE_WORDS} AS line_no,
                     COUNT(*) AS n_w, COUNT(DISTINCT word) AS n_d,
                     MAX(CASE WHEN word IN ({', '.join(
                         repr(s) for s in dq.LINE_STOPWORDS)})
                         THEN 1 ELSE 0 END) AS has_stop
              FROM w GROUP BY doc_id, line_no
            )
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_lines,
                   CAST(SUM(CASE WHEN n_d >= {dq.LINE_MIN_DISTINCT}
                            AND has_stop = 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_kept,
                   CAST(SUM(CASE WHEN n_d >= {dq.LINE_MIN_DISTINCT}
                            AND has_stop = 1 THEN n_w ELSE 0 END) AS BIGINT)
                       AS kept_words
            FROM l GROUP BY doc_id ORDER BY doc_id
        """,
        # global duplicate-line removal (md5-prefix line key shared with
        # the engine so grouping semantics are identical on both sides)
        "docs_line_dedup": f"""
            WITH w AS (
              SELECT doc_id, unnest(string_split(text,' ')) AS word,
                     generate_subscripts(string_split(text,' '), 1) AS pos
              FROM documents
            ), l AS (
              SELECT doc_id, (pos-1)//{dq.LINE_WORDS} AS line_no,
                     substr(md5(string_agg(word, ' ' ORDER BY pos)), 1, 16)
                         AS line_key
              FROM w GROUP BY doc_id, line_no
            ), r AS (
              SELECT doc_id, line_no,
                     ROW_NUMBER() OVER (PARTITION BY line_key
                                        ORDER BY doc_id, line_no) AS rn
              FROM l
            )
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_lines,
                   CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_dup
            FROM r GROUP BY doc_id ORDER BY doc_id
        """,
        "emb_hamming_topk": _hamming_sql(),
        "emb_hamming_recall": _hamming_recall_sql(),
        "docs_bpe_merges": _bpe_sql(),
        # per-lang fertility of the corpus-trained BPE (generated twin:
        # training chain + LEFT-JOIN-ON-TRUE merge replay per word)
        "docs_bpe_fertility": _bpe_fertility_sql(),
        "parts_sssp": _sssp_sql(),
        # FULL OUTER calendar alignment of the two fact-date streams
        "orders_ship_calendar": """
            WITH o AS (
                SELECT date_trunc('day', o_orderdate) AS day,
                       COUNT(*) AS n_orders
                FROM orders GROUP BY 1
            ), s AS (
                SELECT date_trunc('day', l_shipdate) AS day,
                       COUNT(*) AS n_shipped
                FROM lineitem GROUP BY 1
            )
            SELECT COALESCE(o.day, s.day) AS day,
                   CAST(COALESCE(o.n_orders, 0) AS BIGINT) AS n_orders,
                   CAST(COALESCE(s.n_shipped, 0) AS BIGINT) AS n_shipped
            FROM o FULL OUTER JOIN s ON o.day = s.day
            ORDER BY day
        """,
        "emb_mmr": _mmr_sql(),
        "docs_bm25": _bm25_sql(),
        # neighborhood Jaccard over the co-order part graph (support 2)
        "parts_neighbor_jaccard": """
            WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
            pairs AS (
              SELECT a.l_partkey AS u, b.l_partkey AS v, COUNT(*) AS n
              FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey < b.l_partkey
              GROUP BY 1, 2
            ), edges AS (SELECT u, v FROM pairs WHERE n >= 2),
            dir AS (SELECT u AS node, v AS nbr FROM edges
                    UNION ALL SELECT v, u FROM edges),
            deg AS (SELECT node, COUNT(*) AS d FROM dir GROUP BY node),
            com AS (
              SELECT e.u, e.v, COUNT(y.nbr) AS common
              FROM edges e
              JOIN dir x ON x.node = e.u
              JOIN dir y ON y.node = e.v AND y.nbr = x.nbr
              GROUP BY e.u, e.v
            )
            SELECT e.u AS a_id, e.v AS b_id,
                   CAST(COALESCE(c.common, 0) AS BIGINT) AS common,
                   CAST((COALESCE(c.common, 0) * 1000000)
                        // (du.d + dv.d - COALESCE(c.common, 0)) AS BIGINT)
                       AS jaccard_ppm
            FROM edges e
            JOIN deg du ON du.node = e.u
            JOIN deg dv ON dv.node = e.v
            LEFT JOIN com c ON c.u = e.u AND c.v = e.v
            ORDER BY a_id, b_id
        """,
        # manifest / zone-map build: per ship-month partition statistics
        "lineitem_manifest_stats": """
            SELECT strftime(l_shipdate, '%Y-%m') AS month,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   MIN(strftime(l_shipdate, '%Y-%m-%d')) AS min_date,
                   MAX(strftime(l_shipdate, '%Y-%m-%d')) AS max_date,
                   CAST(MIN(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT))
                        AS BIGINT) AS min_price_cents,
                   CAST(MAX(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT))
                        AS BIGINT) AS max_price_cents,
                   CAST(SUM(CAST(FLOOR(l_quantity*100 + 0.5) AS BIGINT))
                        AS BIGINT) AS sum_qty_c100,
                   CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts
            FROM lineitem
            GROUP BY 1 ORDER BY 1
        """,
        # RFM segmentation with exact NTILE(5) tie semantics
        "orders_rfm": """
            WITH m AS (
              SELECT o_custkey,
                     CAST(date_diff('day', MAX(o_orderdate),
                          (SELECT MAX(o_orderdate) FROM orders)) AS BIGINT)
                         AS recency_days,
                     CAST(COUNT(*) AS BIGINT) AS frequency,
                     CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT))
                          AS BIGINT) AS monetary_cents
              FROM orders GROUP BY o_custkey
            )
            SELECT o_custkey, recency_days, frequency, monetary_cents,
                   CAST(NTILE(5) OVER (ORDER BY recency_days, o_custkey)
                        AS BIGINT) AS r_score,
                   CAST(NTILE(5) OVER (ORDER BY frequency, o_custkey)
                        AS BIGINT) AS f_score,
                   CAST(NTILE(5) OVER (ORDER BY monetary_cents, o_custkey)
                        AS BIGINT) AS m_score,
                   CAST(NTILE(5) OVER (ORDER BY recency_days, o_custkey) * 100
                        + NTILE(5) OVER (ORDER BY frequency, o_custkey) * 10
                        + NTILE(5) OVER (ORDER BY monetary_cents, o_custkey)
                        AS BIGINT) AS rfm
            FROM m ORDER BY o_custkey
        """,
        # Zipf-law OLS fit over the global top-100 vocabulary; per-row
        # fixed-point logs (round(ln·10⁶)) make every aggregate an exact
        # integer — the events_linreg contract, same trunc-toward-zero //
        "docs_zipf_slope": """
            WITH w AS (
              SELECT unnest(string_split(text,' ')) AS word FROM documents
            ), cnt AS (
              SELECT word, CAST(COUNT(*) AS BIGINT) AS n
              FROM w GROUP BY word
            ), top AS (
              SELECT word, n,
                     CAST(ROW_NUMBER() OVER (ORDER BY n DESC, word)
                          AS BIGINT) AS rank
              FROM cnt ORDER BY n DESC, word LIMIT 100
            ), fp AS (
              SELECT n, rank,
                     CAST(ROUND(LN(rank) * 1000000, 0) AS HUGEINT) AS x6,
                     CAST(ROUND(LN(n) * 1000000, 0) AS HUGEINT) AS y6
              FROM top
            ), reg AS (
              SELECT CAST(COUNT(*) AS HUGEINT) AS np,
                     SUM(x6) AS sx, SUM(y6) AS sy,
                     SUM(x6*x6) AS sxx, SUM(x6*y6) AS sxy,
                     MAX(CASE WHEN rank = 1 THEN n END) AS top_count
              FROM fp
            )
            SELECT CAST(np AS BIGINT) AS n_points,
                   CAST(top_count AS BIGINT) AS top_count,
                   CAST(CASE WHEN np*sxx - sx*sx = 0 THEN 0
                             ELSE ((np*sxy - sx*sy) * 1000000)
                                  // (np*sxx - sx*sx)
                        END AS BIGINT) AS slope_ppm
            FROM reg
        """,
        # cohort retention triangle (distinct customers per cohort × offset)
        "orders_cohort_retention": """
            WITH m AS (
              SELECT o_custkey,
                     (YEAR(o_orderdate)*12 + MONTH(o_orderdate) - 1) AS mon
              FROM orders
            ), c AS (
              SELECT o_custkey, mon,
                     MIN(mon) OVER (PARTITION BY o_custkey) AS cohort
              FROM m
            ), t AS (
              SELECT DISTINCT o_custkey, cohort, mon - cohort AS months_since
              FROM c
            )
            SELECT lpad(CAST(cohort//12 AS VARCHAR), 4, '0') || '-' ||
                   lpad(CAST(cohort%12 + 1 AS VARCHAR), 2, '0')
                       AS cohort_month,
                   CAST(months_since AS BIGINT) AS months_since,
                   CAST(COUNT(*) AS BIGINT) AS n_customers
            FROM t GROUP BY cohort, months_since
            ORDER BY cohort_month, months_since
        """,
        # exact distinct users per day (engine: OR-mergeable bitmaps)
        "events_bitmap_distinct": """
            SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct
            FROM events GROUP BY 1 ORDER BY 1
        """,
        # Pareto/ABC classes from a global weighted running share
        "parts_abc_classes": """
            WITH p AS (
              SELECT l_partkey AS p_partkey,
                     CAST(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*100
                          + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
              FROM lineitem GROUP BY 1
            ), r AS (
              SELECT p_partkey, revenue_cents,
                     SUM(revenue_cents) OVER (ORDER BY revenue_cents DESC,
                                              p_partkey) AS cum,
                     SUM(revenue_cents) OVER () AS total
              FROM p
            )
            SELECT p_partkey, revenue_cents,
                   CAST((cum * 1000000) // total AS BIGINT) AS cum_ppm,
                   CASE WHEN (cum * 1000000) // total <= 700000 THEN 'A'
                        WHEN (cum * 1000000) // total <= 900000 THEN 'B'
                        ELSE 'C' END AS abc_class
            FROM r ORDER BY p_partkey
        """,
        # association rules (support / confidence / lift) over baskets
        "orders_basket_rules": """
            WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
            n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM li),
            pc AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n
                   FROM li GROUP BY 1),
            pairs AS (
              SELECT a.l_partkey AS a_id, b.l_partkey AS b_id,
                     CAST(COUNT(*) AS BIGINT) AS n_pair
              FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey < b.l_partkey
              GROUP BY 1, 2 HAVING COUNT(*) >= 3
            )
            SELECT p.a_id, p.b_id, p.n_pair, ca.n AS n_a, cb.n AS n_b,
                   CAST((p.n_pair * 1000000) // ca.n AS BIGINT)
                       AS conf_ab_ppm,
                   CAST((p.n_pair * 1000000) // cb.n AS BIGINT)
                       AS conf_ba_ppm,
                   CAST((CAST(p.n_pair AS HUGEINT) * n.n_orders * 1000000)
                        // (CAST(ca.n AS HUGEINT) * cb.n) AS BIGINT)
                       AS lift_ppm
            FROM pairs p
            JOIN pc ca ON ca.l_partkey = p.a_id
            JOIN pc cb ON cb.l_partkey = p.b_id
            CROSS JOIN n
            ORDER BY a_id, b_id
        """,
        # 3-round k-core peel at adaptive k = quantile_disc(deg, 0.25)+1
        "parts_kcore_peel": """
            -- AS MATERIALIZED throughout: DuckDB inlines plain CTEs, and
            -- the e->e2->e3->e4 peel chain would otherwise re-expand the
            -- lineitem pair self-join combinatorially (sf0.1 wedge)
            WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
            pairs AS MATERIALIZED (
              SELECT a.l_partkey AS u, b.l_partkey AS v, COUNT(*) AS n
              FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey < b.l_partkey GROUP BY 1, 2
            ), e AS MATERIALIZED (SELECT u, v FROM pairs WHERE n >= 2),
            nodes AS MATERIALIZED (SELECT DISTINCT u AS node FROM e
                      UNION SELECT DISTINCT v FROM e),
            d1 AS MATERIALIZED (SELECT node, COUNT(*) AS deg FROM
                   (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
                   GROUP BY node),
            kv AS MATERIALIZED (SELECT quantile_disc(deg, 0.25) + 1 AS k FROM d1),
            drop1 AS MATERIALIZED (SELECT node FROM d1 WHERE deg < (SELECT k FROM kv)),
            e2 AS MATERIALIZED (SELECT u, v FROM e
                   WHERE u NOT IN (SELECT node FROM drop1)
                     AND v NOT IN (SELECT node FROM drop1)),
            d2 AS MATERIALIZED (SELECT node, COUNT(*) AS deg FROM
                   (SELECT u AS node FROM e2 UNION ALL SELECT v FROM e2)
                   GROUP BY node),
            drop2 AS MATERIALIZED (
              SELECT n.node FROM nodes n LEFT JOIN d2 ON d2.node = n.node
              WHERE n.node NOT IN (SELECT node FROM drop1)
                AND (d2.deg IS NULL OR d2.deg < (SELECT k FROM kv))),
            e3 AS MATERIALIZED (SELECT u, v FROM e2
                   WHERE u NOT IN (SELECT node FROM drop2)
                     AND v NOT IN (SELECT node FROM drop2)),
            d3 AS MATERIALIZED (SELECT node, COUNT(*) AS deg FROM
                   (SELECT u AS node FROM e3 UNION ALL SELECT v FROM e3)
                   GROUP BY node),
            drop3 AS MATERIALIZED (
              SELECT n.node FROM nodes n LEFT JOIN d3 ON d3.node = n.node
              WHERE n.node NOT IN (SELECT node FROM drop1)
                AND n.node NOT IN (SELECT node FROM drop2)
                AND (d3.deg IS NULL OR d3.deg < (SELECT k FROM kv))),
            e4 AS MATERIALIZED (SELECT u, v FROM e3
                   WHERE u NOT IN (SELECT node FROM drop3)
                     AND v NOT IN (SELECT node FROM drop3)),
            d4 AS MATERIALIZED (SELECT node, COUNT(*) AS deg FROM
                   (SELECT u AS node FROM e4 UNION ALL SELECT v FROM e4)
                   GROUP BY node)
            SELECT n.node AS part,
                   CAST(COALESCE(d4.deg, 0) AS BIGINT) AS degree,
                   CAST(CASE WHEN n.node IN (SELECT node FROM drop1) THEN 1
                             WHEN n.node IN (SELECT node FROM drop2) THEN 2
                             WHEN n.node IN (SELECT node FROM drop3) THEN 3
                             ELSE 0 END AS BIGINT) AS dropped_round
            FROM nodes n LEFT JOIN d4 ON d4.node = n.node ORDER BY part
        """,
        # funnel state-machine validation (purchase needs view/click lag)
        "events_invalid_transitions": """
            WITH s AS (
              SELECT user_id, event_type,
                     LAG(event_type) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id) AS prev
              FROM events
            )
            SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM(CASE WHEN event_type = 'purchase'
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
                   CAST(SUM(CASE WHEN event_type = 'purchase'
                            AND (prev IS NULL
                                 OR prev NOT IN ('view', 'click'))
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_invalid
            FROM s GROUP BY user_id ORDER BY user_id
        """,
        # fixed-point periodogram: the VALUES table is regenerated here
        # with math.cos/sin + Python round — an independent computation of
        # the engine's integer micro tables
        "events_periodogram": _periodogram_sql(),
        # 2-state burst-detection Viterbi forward costs: recursive CTE
        # over the full day calendar, HUGEINT dp carries, min-normalized
        # outputs (the engine's exact integer contract)
        "events_burst_detect": """
            WITH RECURSIVE bounds AS (
                SELECT date_trunc('day', MIN(ts)) AS lo,
                       date_trunc('day', MAX(ts)) AS hi,
                       CAST(COUNT(*) AS BIGINT) AS total
                FROM events
            ), cal AS (
                SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
                FROM bounds WHERE lo IS NOT NULL
            ), cnt AS (
                SELECT date_trunc('day', ts) AS day,
                       CAST(COUNT(*) AS BIGINT) AS c
                FROM events GROUP BY 1
            ), base0 AS (
                SELECT cal.day, COALESCE(cnt.c, 0) AS c,
                       ROW_NUMBER() OVER (ORDER BY cal.day) AS i
                FROM cal LEFT JOIN cnt USING (day)
            ), p2 AS (
                SELECT lam0, 2 * lam0 AS lam1,
                       CAST(ROUND(LN(CAST(lam0 AS DOUBLE)) * 1000000, 0)
                            AS BIGINT) AS l0,
                       CAST(ROUND(LN(CAST(2 * lam0 AS DOUBLE)) * 1000000, 0)
                            AS BIGINT) AS l1
                FROM (SELECT GREATEST(1, total // GREATEST(
                          (SELECT COUNT(*) FROM base0), 1)) AS lam0
                      FROM bounds)
            ), base AS (
                SELECT b.i, b.day, b.c,
                       CAST(p2.lam0 AS HUGEINT) * 1000000
                           - CAST(b.c AS HUGEINT) * p2.l0 AS cost0,
                       CAST(p2.lam1 AS HUGEINT) * 1000000
                           - CAST(b.c AS HUGEINT) * p2.l1 AS cost1
                FROM base0 b CROSS JOIN p2
            ), dp AS (
                SELECT i, day, c, cost0 AS dp0, 2000000 + cost1 AS dp1
                FROM base WHERE i = 1
                UNION ALL
                SELECT b.i, b.day, b.c,
                       b.cost0 + LEAST(dp.dp0, dp.dp1),
                       b.cost1 + LEAST(dp.dp0 + 2000000, dp.dp1)
                FROM base b JOIN dp ON b.i = dp.i + 1
            )
            SELECT day, CAST(c AS BIGINT) AS n_events,
                   CAST(dp0 - LEAST(dp0, dp1) AS BIGINT) AS rdp0,
                   CAST(dp1 - LEAST(dp0, dp1) AS BIGINT) AS rdp1,
                   CAST(CASE WHEN dp0 <= dp1 THEN 0 ELSE 1 END AS BIGINT)
                       AS state
            FROM dp ORDER BY day
        """,
        # sliding 7-day HLL register max-merge (same md5 registers as
        # events_hll_registers, built per day)
        "events_hll_sliding": """
            WITH du AS (
                SELECT DISTINCT date_trunc('day', ts) AS day, user_id
                FROM events
            ), h AS (
                SELECT day, CAST(('0x' || substr(md5(CAST(user_id
                                 AS VARCHAR)), 1, 15)) AS BIGINT) AS h
                FROM du
            ), regs AS (
                SELECT day, CAST(h % 256 AS BIGINT) AS bucket,
                       CAST(MAX(53 - length(ltrim(bin(h // 256), '0')))
                            AS BIGINT) AS max_rank
                FROM h GROUP BY day, bucket
            ), merged AS (
                SELECT d.day, r.bucket, MAX(r.max_rank) AS mr
                FROM (SELECT DISTINCT day FROM regs) d
                JOIN regs r ON r.day BETWEEN d.day - INTERVAL 6 DAY
                                         AND d.day
                GROUP BY 1, 2
            )
            SELECT day, CAST(SUM(mr) AS BIGINT) AS sum_rank,
                   CAST(COUNT(*) AS BIGINT) AS n_buckets
            FROM merged GROUP BY day ORDER BY day
        """,
        # PERCENTILE_CONT as exact integer interpolation (cents×10,
        # denominator-10 rational position)
        "events_value_percentile_cont": """
            WITH v AS (SELECT CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                           AS cents FROM events),
            o AS (SELECT cents, ROW_NUMBER() OVER (ORDER BY cents) - 1
                      AS rk FROM v),
            nn AS (SELECT COUNT(*) AS n FROM v)
            SELECT CAST(n AS BIGINT) AS n_events,
                   CAST((SELECT cents FROM o WHERE rk = ((n-1)*5)//10)
                            * (10 - ((n-1)*5) % 10)
                        + COALESCE((SELECT cents FROM o
                                    WHERE rk = ((n-1)*5)//10 + 1), 0)
                            * (((n-1)*5) % 10) AS BIGINT) AS p50_c10,
                   CAST((SELECT cents FROM o WHERE rk = ((n-1)*9)//10)
                            * (10 - ((n-1)*9) % 10)
                        + COALESCE((SELECT cents FROM o
                                    WHERE rk = ((n-1)*9)//10 + 1), 0)
                            * (((n-1)*9) % 10) AS BIGINT) AS p90_c10
            FROM nn WHERE n > 0
        """,
        # Hill tail-index estimator over the top-100 order totals
        # (fixed-point ln of the ratio to the m-th order statistic)
        "orders_hill_tail": """
            WITH c AS (SELECT CAST(FLOOR(o_totalprice * 100 + 0.5)
                           AS BIGINT) AS cents FROM orders),
            top AS (SELECT cents FROM c ORDER BY cents DESC LIMIT 100),
            xm AS (SELECT MIN(cents) AS xm, COUNT(*) AS m FROM top),
            lr AS (SELECT CAST(ROUND(LN(CAST(cents AS DOUBLE) / xm.xm)
                               * 1000000, 0) AS HUGEINT) AS l
                   FROM top, xm)
            SELECT CAST(xm.m AS BIGINT) AS m_used,
                   CAST(xm.xm AS BIGINT) AS xm_cents,
                   CAST((SELECT SUM(l) FROM lr) // xm.m AS BIGINT)
                       AS hill_inv_micro
            FROM xm WHERE xm.m > 0
        """,
        # referential-integrity audit (anti-join counts; customers who
        # never ordered are the live orphan branch)
        "lineitem_integrity_audit": """
            WITH cm AS (
                SELECT COUNT(*) AS n_rows, COUNT(o.k) AS n_matched
                FROM customer c LEFT JOIN
                     (SELECT DISTINCT o_custkey AS k FROM orders) o
                  ON c.c_custkey = o.k
            ), lm AS (
                SELECT COUNT(*) AS n_rows, COUNT(o.k) AS n_matched
                FROM lineitem l LEFT JOIN
                     (SELECT DISTINCT o_orderkey AS k FROM orders) o
                  ON l.l_orderkey = o.k
            ), ce AS (
                SELECT COUNT(*) AS n_rows, COUNT(e.k) AS n_matched
                FROM customer c LEFT JOIN
                     (SELECT DISTINCT user_id AS k FROM events) e
                  ON c.c_custkey = e.k
            )
            SELECT * FROM (
                SELECT 'customer_events' AS "check",
                       CAST(n_rows AS BIGINT) AS n_rows,
                       CAST(n_matched AS BIGINT) AS n_matched,
                       CAST(n_rows - n_matched AS BIGINT) AS n_orphans
                FROM ce
                UNION ALL
                SELECT 'customer_orders', CAST(n_rows AS BIGINT),
                       CAST(n_matched AS BIGINT),
                       CAST(n_rows - n_matched AS BIGINT)
                FROM cm
                UNION ALL
                SELECT 'lineitem_orders', CAST(n_rows AS BIGINT),
                       CAST(n_matched AS BIGINT),
                       CAST(n_rows - n_matched AS BIGINT)
                FROM lm
            ) ORDER BY "check"
        """,
        # PPJoin set-similarity self-join over order baskets: brute-force
        # pairwise twin; the integer threshold test (i·2 ≥ u·1 for τ=1/2)
        # pins borderline pairs on both sides
        # basket pairs via DISTINCT-basket collapse: replicated corpora
        # carry many orders with identical part sets, so the naive
        # order-level inverted join aggregates ~1e9 pair rows (OOM at the
        # synthesized sf1); instead pair the distinct basket signatures
        # (tiny), then expand signature pairs and identical-signature
        # groups back to order pairs — output-bound work, same rows
        "orders_basket_simjoin": f"""
            WITH bp AS MATERIALIZED (
                SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                FROM lineitem),
            bh AS MATERIALIZED (
                SELECT o, string_agg(CAST(p AS VARCHAR), ','
                                     ORDER BY p) AS sig,
                       COUNT(*) AS s
                FROM bp GROUP BY o),
            rep AS MATERIALIZED (
                SELECT sig, MIN(o) AS ro, ANY_VALUE(s) AS s
                FROM bh GROUP BY sig),
            rbp AS MATERIALIZED (
                SELECT rep.sig, bp.p FROM rep JOIN bp ON bp.o = rep.ro),
            rinter AS (
                SELECT a.sig AS sa, b.sig AS sb, COUNT(*) AS i
                FROM rbp a JOIN rbp b ON a.p = b.p AND a.sig < b.sig
                GROUP BY 1, 2),
            rj AS MATERIALIZED (
                SELECT sa, sb, i, ra.s + rb.s - i AS u
                FROM rinter JOIN rep ra ON ra.sig = sa
                            JOIN rep rb ON rb.sig = sb
                WHERE i * {_SIMJOIN_TAU[1]} >= (ra.s + rb.s - i)
                          * {_SIMJOIN_TAU[0]}),
            cross_pairs AS (
                SELECT LEAST(x.o, y.o) AS o1, GREATEST(x.o, y.o) AS o2,
                       rj.i * 1000000 // rj.u AS jac_ppm
                FROM rj JOIN bh x ON x.sig = rj.sa
                        JOIN bh y ON y.sig = rj.sb),
            same_pairs AS (
                SELECT x.o AS o1, y.o AS o2,
                       CAST(1000000 AS BIGINT) AS jac_ppm
                FROM bh x JOIN bh y ON x.sig = y.sig AND x.o < y.o)
            SELECT o1, o2, CAST(jac_ppm AS BIGINT) AS jac_ppm
            FROM (SELECT * FROM cross_pairs UNION ALL
                  SELECT * FROM same_pairs)
            ORDER BY o1, o2
        """,
        # functional-dependency audit: COUNT(DISTINCT lhs) vs
        # COUNT(DISTINCT (lhs, rhs)) per pinned candidate, generated from
        # the same _FD_CANDIDATES tuple the engine walks
        "orders_fd_audit": "SELECT * FROM (\n" + "\nUNION ALL\n".join(
            f"""SELECT '{tab}' AS tab, '{lhs}' AS lhs, '{rhs}' AS rhs,
                   CAST(COUNT(DISTINCT {lhs}) AS BIGINT) AS n_lhs,
                   CAST(COUNT(DISTINCT ({lhs}, {rhs})) AS BIGINT)
                       AS n_pairs,
                   CAST(COUNT(DISTINCT ({lhs}, {rhs}))
                        - COUNT(DISTINCT {lhs}) AS BIGINT) AS n_viol,
                   CAST(CASE WHEN COUNT(DISTINCT {lhs})
                                  = COUNT(DISTINCT ({lhs}, {rhs}))
                             THEN 1 ELSE 0 END AS BIGINT) AS holds
            FROM {tab}"""
            for tab, lhs, rhs in _FD_CANDIDATES)
            + "\n) ORDER BY tab, lhs, rhs",
        # chi-square term selection per language over doc-presence
        # contingency tables (min-support 25, HUGEINT intermediates,
        # degenerate margins pinned to 0)
        "docs_chi2_terms": f"""
            WITH dw AS (SELECT DISTINCT doc_id, lang, word FROM (
                    SELECT doc_id, lang,
                           UNNEST(regexp_extract_all(lower(text),
                                                     '[a-z0-9_]+')) AS word
                    FROM documents)),
            nn AS (SELECT COUNT(*) AS n FROM documents),
            lt AS (SELECT lang, COUNT(*) AS lt FROM documents GROUP BY 1),
            wl AS (SELECT word, lang, COUNT(*) AS a FROM dw GROUP BY 1, 2),
            wt AS (SELECT word, SUM(a) AS wt FROM wl GROUP BY 1
                   HAVING SUM(a) >= {dq._CHI2_MIN_SUPPORT}),
            cell AS (SELECT l.lang, w.word, COALESCE(wl.a, 0) AS a,
                            w.wt, l.lt, nn.n
                     FROM lt l CROSS JOIN wt w CROSS JOIN nn
                     LEFT JOIN wl ON wl.word = w.word
                                  AND wl.lang = l.lang),
            chi AS (SELECT lang, word,
                           CASE WHEN wt = 0 OR wt = n
                                  OR lt = 0 OR lt = n THEN 0
                                ELSE CAST(CAST(n AS HUGEINT)
                                     * CAST(a * n - wt * lt AS HUGEINT)
                                     * CAST(a * n - wt * lt AS HUGEINT)
                                     * 1000000
                                     // (CAST(wt AS HUGEINT) * (n - wt)
                                         * lt * (n - lt))
                                     AS BIGINT) END AS chi2_micro
                    FROM cell)
            SELECT lang, word, chi2_micro FROM chi
            QUALIFY ROW_NUMBER() OVER (PARTITION BY lang
                                       ORDER BY chi2_micro DESC, word)
                    <= {dq._CHI2_TOP_K}
            ORDER BY lang, chi2_micro DESC, word
        """,
        # k-truss peel (edge dual of k-core): generated round CTEs, each
        # recomputing per-edge triangle support over the surviving set
        "parts_ktruss": _ktruss_sql(_KTRUSS_K, _KTRUSS_ROUNDS,
                                    _KTRUSS_SUPPORT),
        # Mann-Kendall trend test per event type: S and the tie-corrected
        # 18·Var(S) numerator, both exact integers over zero-filled daily
        # counts across the global day horizon
        "events_mann_kendall": """
            WITH dd AS (SELECT event_type,
                               epoch_us(date_trunc('day', ts))
                                   // 86400000000 AS day
                        FROM events),
            hor AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM dd),
            ty AS (SELECT DISTINCT event_type FROM dd),
            cal AS (SELECT UNNEST(generate_series(d0, d1, 1)) AS day
                    FROM hor),
            cnt AS (SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS c
                    FROM dd GROUP BY 1, 2),
            ser AS (SELECT t.event_type, g.day, COALESCE(cnt.c, 0) AS c
                    FROM ty t CROSS JOIN cal g
                    LEFT JOIN cnt ON cnt.event_type = t.event_type
                                  AND cnt.day = g.day),
            s AS (SELECT a.event_type,
                         SUM(CASE WHEN b.c > a.c THEN 1
                                  WHEN b.c < a.c THEN -1 ELSE 0 END)
                             AS s_stat
                  FROM ser a JOIN ser b ON a.event_type = b.event_type
                                        AND a.day < b.day
                  GROUP BY 1),
            nn AS (SELECT event_type, COUNT(*) AS n FROM ser GROUP BY 1),
            ties AS (SELECT event_type,
                            SUM(t * (t - 1) * (2 * t + 5)) AS tt
                     FROM (SELECT event_type, c, COUNT(*) AS t
                           FROM ser GROUP BY 1, 2)
                     GROUP BY 1)
            SELECT nn.event_type, CAST(nn.n AS BIGINT) AS n_days,
                   CAST(s.s_stat AS BIGINT) AS s_stat,
                   CAST(nn.n * (nn.n - 1) * (2 * nn.n + 5) - ties.tt
                        AS BIGINT) AS var18num
            FROM nn JOIN s USING (event_type)
                    JOIN ties USING (event_type)
            ORDER BY event_type
        """,
        # 4-cycle census by the diagonal identity: codegree over ALL
        # wedges (undirected adjacency), C4 = Σ C(codeg,2) / 2
        "parts_four_cycles": """
            WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
            e AS (
                SELECT a.l_partkey AS u, c.l_partkey AS v
                FROM b a JOIN b c USING (l_orderkey)
                WHERE a.l_partkey < c.l_partkey
                GROUP BY 1, 2 HAVING COUNT(*) >= 2
            ),
            und AS (SELECT u AS ctr, v AS nbr FROM e
                    UNION ALL SELECT v, u FROM e),
            wp AS (SELECT a.nbr AS v1, b.nbr AS v2
                   FROM und a JOIN und b
                   ON a.ctr = b.ctr AND a.nbr < b.nbr),
            cd AS (SELECT v1, v2, CAST(COUNT(*) AS HUGEINT) AS c
                   FROM wp GROUP BY 1, 2)
            SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
                   CAST(MAX(c) AS BIGINT) AS max_codeg,
                   CAST(SUM(c * (c - 1) // 2) AS BIGINT) AS c4_two,
                   CAST(SUM(c * (c - 1) // 2) // 2 AS BIGINT) AS n_c4
            FROM cd HAVING COUNT(*) > 0
        """,
        # rich-club density over the co-order graph at pinned degree
        # floors
        "parts_rich_club": """
            WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
            e AS (
                SELECT a.l_partkey AS u, c.l_partkey AS v
                FROM b a JOIN b c USING (l_orderkey)
                WHERE a.l_partkey < c.l_partkey
                GROUP BY 1, 2 HAVING COUNT(*) >= 2
            ),
            und AS (SELECT u AS x FROM e UNION ALL SELECT v FROM e),
            deg AS (SELECT x AS node, CAST(COUNT(*) AS BIGINT) AS d
                    FROM und GROUP BY 1),
            ks AS (SELECT UNNEST([2, 4, 8]) AS k),
            nk AS (SELECT ks.k, COUNT(*) AS n
                   FROM ks JOIN deg ON deg.d > ks.k GROUP BY 1),
            ek AS (SELECT ks.k, COUNT(*) AS m
                   FROM ks
                   JOIN e ON TRUE
                   JOIN deg da ON da.node = e.u AND da.d > ks.k
                   JOIN deg db ON db.node = e.v AND db.d > ks.k
                   GROUP BY 1)
            SELECT CAST(nk.k AS BIGINT) AS k,
                   CAST(nk.n AS BIGINT) AS n_rich,
                   CAST(COALESCE(ek.m, 0) AS BIGINT) AS n_edges,
                   CAST(2 * COALESCE(ek.m, 0) * 1000000
                        // (nk.n * (nk.n - 1)) AS BIGINT) AS rc_ppm
            FROM nk LEFT JOIN ek USING (k)
            WHERE nk.n >= 2 ORDER BY nk.k
        """,
        # Wald–Wolfowitz runs test: same zero-filled daily series as
        # mann_kendall; median = quantile_disc (ceil contract), days
        # equal to the median excluded, runs counted via LAG sign flips
        "events_runs_test": """
            WITH dd AS (SELECT event_type,
                               epoch_us(date_trunc('day', ts))
                                   // 86400000000 AS day
                        FROM events),
            hor AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM dd),
            ty AS (SELECT DISTINCT event_type FROM dd),
            cal AS (SELECT UNNEST(generate_series(d0, d1, 1)) AS day
                    FROM hor),
            cnt AS (SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS c
                    FROM dd GROUP BY 1, 2),
            ser AS (SELECT t.event_type, g.day, COALESCE(cnt.c, 0) AS c
                    FROM ty t CROSS JOIN cal g
                    LEFT JOIN cnt ON cnt.event_type = t.event_type
                                  AND cnt.day = g.day),
            med AS (SELECT event_type, quantile_disc(c, 0.5) AS m
                    FROM ser GROUP BY 1),
            ex AS (SELECT s.event_type, s.day,
                          CASE WHEN s.c > med.m THEN 1 ELSE 0 END AS sgn
                   FROM ser s JOIN med USING (event_type)
                   WHERE s.c <> med.m),
            rr AS (SELECT event_type, sgn,
                          LAG(sgn) OVER (PARTITION BY event_type
                                         ORDER BY day) AS prev
                   FROM ex),
            agg AS (SELECT event_type,
                           CAST(SUM(sgn) AS HUGEINT) AS n1,
                           CAST(SUM(1 - sgn) AS HUGEINT) AS n2,
                           SUM(CASE WHEN prev IS NULL OR sgn <> prev
                                    THEN 1 ELSE 0 END) AS runs
                    FROM rr GROUP BY 1)
            SELECT event_type,
                   CAST(n1 AS BIGINT) AS n_pos,
                   CAST(n2 AS BIGINT) AS n_neg,
                   CAST(runs AS BIGINT) AS n_runs,
                   CAST(n1 + n2 + 2 * n1 * n2 AS BIGINT) AS exp2num,
                   CAST(2 * n1 * n2 * (2 * n1 * n2 - (n1 + n2))
                        AS BIGINT) AS var_num
            FROM agg ORDER BY event_type
        """,
        # Spearman rank correlation between the pinned view/purchase
        # daily series: doubled average ranks (2·RANK() + t − 1) stay
        # integral; Pearson moments over ranks in HUGEINT
        "events_spearman": """
            WITH dd AS (SELECT event_type,
                               epoch_us(date_trunc('day', ts))
                                   // 86400000000 AS day
                        FROM events
                        WHERE event_type IN ('view', 'purchase')),
            hor AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM dd),
            cal AS (SELECT UNNEST(generate_series(d0, d1, 1)) AS day
                    FROM hor),
            cnt AS (SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS c
                    FROM dd GROUP BY 1, 2),
            serx AS (SELECT g.day, COALESCE(c.c, 0) AS v
                     FROM cal g LEFT JOIN cnt c
                     ON c.day = g.day AND c.event_type = 'view'),
            sery AS (SELECT g.day, COALESCE(c.c, 0) AS v
                     FROM cal g LEFT JOIN cnt c
                     ON c.day = g.day AND c.event_type = 'purchase'),
            rx AS (SELECT day, CAST(2 * RANK() OVER (ORDER BY v)
                                    + COUNT(*) OVER (PARTITION BY v) - 1
                                    AS HUGEINT) AS r2
                   FROM serx),
            ry AS (SELECT day, CAST(2 * RANK() OVER (ORDER BY v)
                                    + COUNT(*) OVER (PARTITION BY v) - 1
                                    AS HUGEINT) AS r2
                   FROM sery),
            m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
                         SUM(rx.r2 * ry.r2) AS sxy2,
                         SUM(rx.r2 * rx.r2) AS sxx2,
                         SUM(ry.r2 * ry.r2) AS syy2
                  FROM rx JOIN ry USING (day))
            SELECT CAST(n AS BIGINT) AS n_days,
                   CAST(sxy2 AS BIGINT) AS sxy2,
                   CAST(sxx2 AS BIGINT) AS sxx2,
                   CAST(syy2 AS BIGINT) AS syy2,
                   CAST(n * sxy2 - (n * (n + 1)) * (n * (n + 1))
                        AS BIGINT) AS rho_num,
                   CAST(n * sxx2 - (n * (n + 1)) * (n * (n + 1))
                        AS BIGINT) AS den_x,
                   CAST(n * syy2 - (n * (n + 1)) * (n * (n + 1))
                        AS BIGINT) AS den_y
            FROM m WHERE n > 0
        """,
        # AMS F2 sketch: one md5 hex digit per (sketch, user) gives the
        # ±1 sign; est = (Σ sign·count)², exact = Σ count² in HUGEINT
        "events_f2_sketch": """
            WITH f AS (SELECT user_id, CAST(COUNT(*) AS HUGEINT) AS c
                       FROM events GROUP BY 1),
            sk AS (SELECT UNNEST(range(0, 16)) AS s),
            e AS (SELECT sk.s AS sketch_id,
                         SUM((CASE WHEN substr(md5('ams-' ||
                                       CAST(f.user_id AS VARCHAR)),
                                       CAST(sk.s AS INT) + 1, 1)
                                   IN ('0','2','4','6','8','a','c','e')
                                   THEN 1 ELSE -1 END) * f.c) AS t
                  FROM sk CROSS JOIN f GROUP BY 1),
            x AS (SELECT CAST(SUM(c * c) AS HUGEINT) AS f2 FROM f),
            r AS (SELECT sketch_id, CAST(t * t AS HUGEINT) AS est FROM e
                  UNION ALL
                  SELECT -1, quantile_disc(CAST(t * t AS HUGEINT), 0.5)
                  FROM e)
            SELECT CAST(r.sketch_id AS BIGINT) AS sketch_id,
                   CAST(r.est AS BIGINT) AS est,
                   CAST(x.f2 AS BIGINT) AS exact_f2,
                   CAST(ABS(r.est - x.f2) * 1000000 // x.f2 AS BIGINT)
                       AS err_ppm
            FROM r CROSS JOIN x
            WHERE x.f2 IS NOT NULL
            ORDER BY r.sketch_id
        """,
        # k-anonymity audit under the pinned (nation, segment)
        # quasi-identifiers
        "customer_k_anonymity": """
            WITH cls AS (SELECT c_nationkey, c_mktsegment,
                                CAST(COUNT(*) AS BIGINT) AS n
                         FROM customer GROUP BY 1, 2)
            SELECT CAST(MIN(n) AS BIGINT) AS k_min,
                   CAST(COUNT(*) AS BIGINT) AS n_classes,
                   CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_singletons,
                   CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
                       AS n_below_5,
                   CAST(SUM(n) AS BIGINT) AS n_rows
            FROM cls HAVING COUNT(*) > 0
        """,
        # zone-map overlap (clustering depth) of l_shipdate under the
        # physical orderkey-range layout vs the ship-month re-sort
        "lineitem_zone_overlap": """
            WITH d AS (SELECT l_orderkey // 512 AS part,
                              epoch_us(date_trunc('day', l_shipdate))
                                  // 86400000000 AS day,
                              year(l_shipdate) * 12 + month(l_shipdate)
                                  AS mpart
                       FROM lineitem),
            zm AS (SELECT 'orderkey_range' AS layout, part,
                          MIN(day) AS lo, MAX(day) AS hi
                   FROM d GROUP BY 1, 2
                   UNION ALL
                   SELECT 'ship_month', mpart, MIN(day), MAX(day)
                   FROM d GROUP BY 1, 2),
            ov AS (SELECT a.layout, a.part,
                          (SELECT COUNT(*) FROM zm b
                           WHERE b.layout = a.layout
                             AND b.part <> a.part
                             AND b.lo <= a.hi AND b.hi >= a.lo) AS o
                   FROM zm a)
            SELECT layout, CAST(COUNT(*) AS BIGINT) AS n_parts,
                   CAST(MAX(o) AS BIGINT) AS max_overlaps,
                   CAST(SUM(o) AS BIGINT) AS sum_overlaps,
                   CAST(SUM(o) * 1000000 // COUNT(*) AS BIGINT)
                       AS avg_ppm
            FROM ov GROUP BY 1 ORDER BY 1
        """,
        # Markov majority-predictor accuracy: argmax row of the
        # transition-matrix counts, ties to the smallest successor
        "events_markov_accuracy": """
            WITH seq AS (
                SELECT user_id, event_type,
                       LAG(event_type) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id)
                           AS prev_type
                FROM events
            ), counts AS (
                SELECT prev_type AS from_type, event_type AS to_type,
                       CAST(COUNT(*) AS HUGEINT) AS n
                FROM seq WHERE prev_type IS NOT NULL
                GROUP BY 1, 2
            ), best AS (
                SELECT from_type, to_type, n,
                       ROW_NUMBER() OVER (PARTITION BY from_type
                                          ORDER BY n DESC, to_type)
                           AS rk,
                       SUM(n) OVER (PARTITION BY from_type) AS tot
                FROM counts
            )
            SELECT from_type, to_type AS predicted,
                   CAST(n AS BIGINT) AS n_correct,
                   CAST(tot AS BIGINT) AS n_total,
                   CAST(n * 1000000 // tot AS BIGINT) AS acc_ppm
            FROM best WHERE rk = 1 ORDER BY from_type
        """,
        # SAX word census: 4 six-hour quarters per active user-day,
        # zero-filled, quartile breakpoints via quantile_disc (the
        # ceil(q·n)-1 contract), boundaries inclusive downward
        "events_sax_words": """
            WITH ud AS (
                SELECT user_id, date_trunc('day', ts) AS day,
                       (epoch_us(ts) % 86400000000) // 21600000000 AS q
                FROM events
            ), cnt AS (
                SELECT user_id, day, q, CAST(COUNT(*) AS BIGINT) AS c
                FROM ud GROUP BY 1, 2, 3
            ), quarters AS (
                SELECT a.user_id, a.day, qq.q, COALESCE(cnt.c, 0) AS c
                FROM (SELECT DISTINCT user_id, day FROM ud) a
                CROSS JOIN (SELECT unnest(range(0, 4)) AS q) qq
                LEFT JOIN cnt ON cnt.user_id = a.user_id
                             AND cnt.day = a.day AND cnt.q = qq.q
            ), bp AS (
                SELECT quantile_disc(c, 0.25) AS b1,
                       quantile_disc(c, 0.5) AS b2,
                       quantile_disc(c, 0.75) AS b3
                FROM quarters
            ), sym AS (
                SELECT user_id, day, q,
                       CASE WHEN c <= b1 THEN 'a' WHEN c <= b2 THEN 'b'
                            WHEN c <= b3 THEN 'c' ELSE 'd' END AS s
                FROM quarters CROSS JOIN bp
            ), words AS (
                SELECT user_id, day, string_agg(s, '' ORDER BY q) AS word
                FROM sym GROUP BY 1, 2
            )
            SELECT word, CAST(COUNT(*) AS BIGINT) AS n_userdays
            FROM words GROUP BY word ORDER BY word
        """,
        # modal order priority per month (deterministic tie rule:
        # highest count, then lexicographically smallest priority)
        "orders_mode_priority": """
            WITH census AS (
                SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)
                           AS month,
                       o_orderpriority, COUNT(*) AS n
                FROM orders GROUP BY 1, 2
            ), ranked AS (
                SELECT month, o_orderpriority, n,
                       ROW_NUMBER() OVER (PARTITION BY month
                                          ORDER BY n DESC, o_orderpriority)
                           AS rn
                FROM census
            )
            SELECT month, o_orderpriority AS mode_priority,
                   CAST(n AS BIGINT) AS n_mode
            FROM ranked WHERE rn = 1 ORDER BY month
        """,
        # character-class census per language (both sides count with RE2:
        # pyarrow count_substring_regex / DuckDB regexp_replace)
        "docs_charclass_census": r"""
            WITH per AS (
                SELECT lang, length(text) AS n_chars,
                       length(text) - length(regexp_replace(
                           text, '[a-z]', '', 'g')) AS n_lower,
                       length(text) - length(regexp_replace(
                           text, '[A-Z]', '', 'g')) AS n_upper,
                       length(text) - length(regexp_replace(
                           text, '[0-9]', '', 'g')) AS n_digit,
                       length(text) - length(regexp_replace(
                           text, ' ', '', 'g')) AS n_space
                FROM documents
            )
            SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(n_chars) AS BIGINT) AS n_chars,
                   CAST(SUM(n_lower) AS BIGINT) AS n_lower,
                   CAST(SUM(n_upper) AS BIGINT) AS n_upper,
                   CAST(SUM(n_digit) AS BIGINT) AS n_digit,
                   CAST(SUM(n_space) AS BIGINT) AS n_space,
                   CAST(SUM(n_chars - n_lower - n_upper - n_digit - n_space)
                        AS BIGINT) AS n_other
            FROM per GROUP BY lang ORDER BY lang
        """,
        # ±2-token context window around every media span of the
        # interleaved corpus (same span synthesis as
        # docs_interleaved_media_stats: one media span per 's'-prefixed
        # token, positional refs; DuckDB list slices are 1-based inclusive)
        "docs_media_context": r"""
            WITH toks AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '\s+'),
                                   x -> x != '') AS w
                FROM documents
            ), tok AS (
                SELECT doc_id, w, unnest(w) AS word,
                       generate_subscripts(w, 1) AS pos
                FROM toks
            )
            SELECT doc_id, CAST(pos AS BIGINT) AS pos,
                   'img://' || word || '/' || CAST(pos AS VARCHAR)
                       AS media_ref,
                   array_to_string(
                       w[greatest(pos - 2, 1):least(pos + 2, len(w))],
                       ' ') AS context
            FROM tok WHERE word LIKE 's%' ORDER BY doc_id, pos
        """,
        # per-cluster fit stats over the spherical k-means assignment
        # contract; ONE integer-micro rounding of each score drives both
        # the argmax and the distortion sums
        "emb_cluster_stats": """
            WITH cents AS (
                SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS ce
                FROM embeddings WHERE vec_id < 8
            ), scored AS (
                SELECT e.vec_id, c.cid,
                       CAST(ROUND(list_cosine_similarity(
                           CAST(e.embedding AS DOUBLE[]), c.ce) * 1000000, 0)
                           AS BIGINT) AS sm
                FROM embeddings e CROSS JOIN cents c
            ), best AS (
                SELECT vec_id, cid, sm,
                       ROW_NUMBER() OVER (PARTITION BY vec_id
                                          ORDER BY sm DESC, cid) AS rn
                FROM scored
            )
            SELECT CAST(cid AS BIGINT) AS cluster_id,
                   CAST(COUNT(*) AS BIGINT) AS n_members,
                   CAST(SUM(1000000 - sm) AS BIGINT) AS distortion_micro,
                   CAST(MAX(1000000 - sm) AS BIGINT) AS max_dist_micro
            FROM best WHERE rn = 1 GROUP BY cid ORDER BY cid
        """,
        # NN-descent recall audit: ring init + one
        # neighbors-of-neighbors refinement round vs exact top-3 on the
        # vec_id % 31 sample; ONE integer-micro rounding drives every
        # top-k (ties → lowest nb)
        "emb_nn_descent": """
            WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                       FROM embeddings),
            nn AS (SELECT COUNT(*) AS n FROM e),
            nb0 AS (
                SELECT e.vec_id AS src, (e.vec_id + i.i) % nn.n AS nb
                FROM e CROSS JOIN (SELECT unnest(range(1, 4)) AS i) i
                CROSS JOIN nn
                WHERE (e.vec_id + i.i) % nn.n <> e.vec_id
            ), nb0d AS (SELECT DISTINCT src, nb FROM nb0),
            cand AS (
                SELECT src, nb, MAX(is0) AS is0 FROM (
                    SELECT src, nb, 1 AS is0 FROM nb0d
                    UNION ALL SELECT nb AS src, src AS nb, 0 FROM nb0d
                    UNION ALL SELECT a.src, b.nb, 0
                    FROM nb0d a JOIN nb0d b ON a.nb = b.src
                ) WHERE src <> nb GROUP BY src, nb
            ), scored AS (
                SELECT c.src, c.nb, c.is0,
                       CAST(ROUND(list_cosine_similarity(ea.v, eb.v)
                                  * 1000000, 0) AS BIGINT) AS sm
                FROM cand c JOIN e ea ON ea.vec_id = c.src
                            JOIN e eb ON eb.vec_id = c.nb
            ), n1 AS (
                SELECT src, nb FROM (
                    SELECT src, nb, ROW_NUMBER() OVER (
                        PARTITION BY src ORDER BY sm DESC, nb) AS rn
                    FROM scored) WHERE rn <= 3
            ), q AS (SELECT vec_id FROM e WHERE vec_id < 16),
            exs AS (
                SELECT a.vec_id AS src, b.vec_id AS nb,
                       CAST(ROUND(list_cosine_similarity(a.v, b.v)
                                  * 1000000, 0) AS BIGINT) AS sm
                FROM (SELECT e.vec_id, e.v FROM e JOIN q USING (vec_id)) a
                CROSS JOIN e b WHERE b.vec_id <> a.vec_id
            ), ex AS (
                SELECT src, nb FROM (
                    SELECT src, nb, ROW_NUMBER() OVER (
                        PARTITION BY src ORDER BY sm DESC, nb) AS rn
                    FROM exs) WHERE rn <= 3
            ), den AS (SELECT COUNT(*) AS d FROM ex),
            nq AS (SELECT COUNT(*) AS c FROM q),
            smp AS (SELECT * FROM scored WHERE src < 16),
            smp1 AS (
                SELECT src, nb, sm FROM (
                    SELECT src, nb, sm, ROW_NUMBER() OVER (
                        PARTITION BY src ORDER BY sm DESC, nb) AS rn
                    FROM smp) WHERE rn <= 3
            ),
            h0 AS (SELECT COUNT(*) AS h FROM
                   (SELECT src, nb FROM smp WHERE is0 = 1) s0
                   JOIN ex USING (src, nb)),
            h1 AS (SELECT COUNT(*) AS h FROM smp1 JOIN ex USING (src, nb)),
            b0 AS (SELECT COALESCE(SUM(mx), 0) AS s FROM
                   (SELECT src, MAX(sm) AS mx FROM smp WHERE is0 = 1
                    GROUP BY src)),
            b1 AS (SELECT COALESCE(SUM(mx), 0) AS s FROM
                   (SELECT src, MAX(sm) AS mx FROM smp GROUP BY src)),
            ne0 AS (SELECT COUNT(*) AS c FROM nb0d),
            ne1 AS (SELECT COUNT(*) AS c FROM n1)
            SELECT * FROM (
                SELECT CAST(0 AS BIGINT) AS round,
                       CAST(nq.c AS BIGINT) AS n_queries,
                       CAST(CASE WHEN den.d = 0 THEN 0
                            ELSE h0.h * 1000000 // den.d END AS BIGINT)
                           AS recall_ppm,
                       CAST(b0.s AS BIGINT) AS sum_best_sm,
                       CAST(ne0.c AS BIGINT) AS n_edges
                FROM nq, den, h0, b0, ne0
                UNION ALL
                SELECT CAST(1 AS BIGINT), CAST(nq.c AS BIGINT),
                       CAST(CASE WHEN den.d = 0 THEN 0
                            ELSE h1.h * 1000000 // den.d END AS BIGINT),
                       CAST(b1.s AS BIGINT), CAST(ne1.c AS BIGINT)
                FROM nq, den, h1, b1, ne1
            ) ORDER BY round
        """,
        # per-source language-mix entropy in exact fixed-point micro-nats
        "docs_source_lang_entropy": """
            WITH c AS (
              SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n
              FROM documents GROUP BY 1, 2
            ), t AS (
              SELECT source, lang, n,
                     SUM(n) OVER (PARTITION BY source) AS tot
              FROM c
            ), q AS (
              SELECT source, lang, n, tot,
                     CAST(ROUND(-LN(CAST(n AS DOUBLE) / tot) * 1000000, 0)
                          AS HUGEINT) AS term6
              FROM t
            )
            SELECT source, CAST(SUM(n) AS BIGINT) AS n_docs,
                   CAST(COUNT(*) AS BIGINT) AS n_langs,
                   CAST(SUM(CAST(n AS HUGEINT) * term6)
                        // SUM(CAST(n AS HUGEINT)) AS BIGINT)
                       AS entropy_micronat
            FROM q GROUP BY source ORDER BY source
        """,
    }
