"""Arrow schemas for the engine's logical tables.

Mapping from the reference's Pydantic data model (see SURVEY.md §1.4):
- SourceRecord (reference: competitive-intel/schemas/source_record.py:37-57)
  → flat Arrow columns + a sparse ``metadata`` struct (the tagged union of
  per-source metadata variants, source_record.py:60-108);
- the interleaved text+media document (BASELINE.json input_hint) → ``doc_id``
  + ``spans: list<struct<kind,text,media_ref,offset>>``;
- RawChunk (reference: competitive-intel/vectorstore/chunker.py:48-91)
  → chunk table with deterministic ids;
- embeddings → fixed-width ``list<float32>``.
"""

from __future__ import annotations

import pyarrow as pa

SPAN_KINDS = ("title", "body", "comment", "answer", "media", "code")

SPAN_TYPE = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)

INTERLEAVED_DOC_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN_TYPE)),
    ]
)

METADATA_TYPE = pa.struct(
    [
        # github issue
        ("issue_number", pa.int32()),
        ("state", pa.string()),
        ("labels", pa.list_(pa.string())),
        ("comments_count", pa.int32()),
        ("created_at", pa.string()),
        ("author", pa.string()),
        ("top_comments", pa.list_(pa.string())),
        ("is_bug", pa.bool_()),
        ("is_feature_request", pa.bool_()),
        # github discussion
        ("discussion_number", pa.int32()),
        ("category", pa.string()),
        ("is_answered", pa.bool_()),
        ("answer_body", pa.string()),
        # github release
        ("tag_name", pa.string()),
        ("is_prerelease", pa.bool_()),
        # reddit / hn
        ("subreddit", pa.string()),
        ("score", pa.int32()),
        ("permalink", pa.string()),
        ("created_utc", pa.timestamp("us")),
        ("hn_id", pa.int64()),
        ("points", pa.int32()),
        ("num_comments", pa.int32()),
        # blog
        ("relevance_score", pa.float64()),
        ("priority_keywords_matched", pa.list_(pa.string())),
    ]
)

SOURCE_RECORD_SCHEMA = pa.schema(
    [
        ("id", pa.string()),
        ("origin", pa.string()),
        ("source_type", pa.string()),
        ("url", pa.string()),
        ("title", pa.string()),
        ("text", pa.string()),
        ("scraped_date", pa.date32()),
        ("content_date", pa.date32()),
        ("topics", pa.list_(pa.string())),
        ("subtopics", pa.list_(pa.string())),
        ("credibility", pa.string()),
        ("sentiment", pa.string()),
        ("word_count", pa.int32()),
        ("arrival_seq", pa.int64()),
        ("metadata", METADATA_TYPE),
    ]
)

CHUNK_SCHEMA = pa.schema(
    [
        ("chunk_id", pa.string()),
        ("parent_doc_id", pa.string()),
        ("chunk_index", pa.int32()),
        ("text", pa.string()),
        ("token_count", pa.int32()),
        ("competitor", pa.string()),
        ("source_type", pa.string()),
        ("source_url", pa.string()),
        ("source_title", pa.string()),
        ("topic_ids", pa.list_(pa.string())),
        ("credibility", pa.string()),
        ("content_date", pa.date32()),
        ("scraped_date", pa.date32()),
    ]
)

WEB_GRAPH_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("status", pa.int32()),
        ("html", pa.string()),
        ("out_links", pa.list_(pa.string())),
        ("latency_ms", pa.int32()),
    ]
)

SOURCE_TYPES = (
    "official_docs", "product_page", "comparison_page", "case_study",
    "whitepaper", "blog", "github_issue", "github_discussion",
    "github_release", "community_hn", "community_reddit", "benchmark",
)
