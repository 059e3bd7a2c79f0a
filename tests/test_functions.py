"""Unit tests for the pure function library (no Ray needed)."""

import numpy as np
import pytest

from ai_intel_web_scraper_ray.functions import (
    benchmarkx,
    embed,
    fingerprint,
    htmlx,
    langid,
    minhash,
    quality,
    sentiment,
    simhash,
    tagging,
    textclean,
    tokenizer,
    urls,
)


class TestUrls:
    def test_normalize_drops_fragment_and_query(self):
        assert urls.normalize_url("https://a.io/x/y?q=1#frag") == "https://a.io/x/y"

    def test_normalize_strips_trailing_slash_except_root(self):
        assert urls.normalize_url("https://a.io/x/") == "https://a.io/x"
        assert urls.normalize_url("https://a.io/") == "https://a.io/"

    def test_normalize_resolves_relative(self):
        assert urls.normalize_url("../z", "https://a.io/x/y") == "https://a.io/z"
        assert urls.normalize_url("/p1", "https://a.io/x/y") == "https://a.io/p1"

    def test_same_domain(self):
        assert urls.is_same_domain("https://a.io/x", "https://a.io/")
        assert not urls.is_same_domain("https://b.io/x", "https://a.io/")

    def test_is_html_url(self):
        assert urls.is_html_url("https://a.io/page")
        assert not urls.is_html_url("https://a.io/img.PNG")
        assert not urls.is_html_url("https://a.io/data.json")

    def test_record_id_deterministic(self):
        a = urls.record_id("acme", "blog", "https://a.io/x")
        assert a == urls.record_id("acme", "blog", "https://a.io/x")
        assert a.startswith("acme-blog-") and len(a.split("-")[-1]) == 12

    def test_frontier_shard_stable(self):
        assert urls.frontier_shard("https://a.io/x", 8) == urls.frontier_shard("https://a.io/x", 8)
        assert 0 <= urls.frontier_shard("https://a.io/x", 8) < 8

    def test_extract_date(self):
        import datetime
        assert urls.extract_date_from_text("posted 2024-01-15 ok") == datetime.date(2024, 1, 15)
        assert urls.extract_date_from_text("January 15, 2024 news") == datetime.date(2024, 1, 15)
        assert urls.extract_date_from_text("15 January 2024") == datetime.date(2024, 1, 15)
        assert urls.extract_date_from_text("no date here") is None


class TestTokenizer:
    def test_counts(self):
        assert tokenizer.count_tokens("hello world") == 2
        assert tokenizer.count_tokens("a.b,c") == 5
        assert tokenizer.count_tokens("") == 0

    def test_spans_roundtrip(self):
        text = "hello, world  foo\nbar"
        spans = tokenizer.encode_spans(text)
        assert tokenizer.slice_by_tokens(text, spans, 0, len(spans)) == text.strip()
        assert tokenizer.slice_by_tokens(text, spans, 1, 2) == ","

    def test_whitespace_tokens(self):
        assert tokenizer.count_whitespace_tokens("  a  b\tc\n") == 3


class TestTextClean:
    def test_strips_cookie_banner(self):
        t, wc = textclean.clean_text("We use cookies to improve. Real content here stays put")
        assert "cookies" not in t
        assert "Real content" in t or "content here stays" in t

    def test_preserves_code_fences(self):
        code = "before\n```py\nx   =   1\n```\nafter   text"
        t, _ = textclean.clean_text(code)
        assert "x   =   1" in t
        assert "after text" in t

    def test_collapses_blank_runs(self):
        t, _ = textclean.clean_text("a\n\n\n\n\nb")
        assert t == "a\n\nb"

    def test_preserves_headings_tables_lists(self):
        src = "# H  one\n| a  | b |\n- item  x\nplain   text"
        t, _ = textclean.clean_text(src)
        assert "# H  one" in t
        assert "| a  | b |" in t
        assert "- item  x" in t
        assert "plain text" in t


class TestTagging:
    def test_weights_and_topk(self):
        bank = tagging.KeywordBank(
            {"a": ["fast"], "b": ["fast query"], "c": ["zebra"]}
        )
        # "fast query" weighted 1.5; both topics have 1 keyword
        topics = bank.tag("", "the fast query ran")
        assert topics[0] == "b"  # 1.5 > 1.0
        assert "a" in topics
        assert "c" not in topics

    def test_unclassified(self):
        bank = tagging.KeywordBank({"a": ["nomatch"]})
        assert bank.tag("", "hello world") == ["unclassified"]

    def test_competitor_merge_dedup(self):
        bank = tagging.KeywordBank({"a": ["Fast"]}, {"a": ["fast", "extra"], "new": ["thing"]})
        assert bank.topic_keywords["a"] == ["Fast", "extra"]
        assert bank.topic_keywords["new"] == ["thing"]


class TestQuality:
    def test_code_ratio(self):
        text = "x\n```\n" + "c" * 96 + "\n```"
        assert quality.code_ratio(text) > 0.9
        assert quality.code_ratio("no code") == 0.0

    def test_boilerplate_phrases(self):
        t = "skip to content table of contents cookie policy and more words"
        assert quality.is_boilerplate(t)

    def test_link_words(self):
        t = " ".join(["/nav"] * 10 + ["word"] * 5)
        assert quality.is_boilerplate(t)
        assert not quality.is_boilerplate(" ".join(["word"] * 60))

    def test_removal_reason_order(self):
        assert quality.removal_reason(5, ["x"], "blog", "short") == "too_short"
        assert quality.removal_reason(200, ["unclassified"], "blog", "w " * 200) == "no_topics"
        assert quality.removal_reason(200, ["unclassified"], "benchmark", "w " * 200) == ""


class TestSentiment:
    def test_cases(self):
        assert sentiment.estimate_sentiment("bug crash broken slow") == "negative"
        assert sentiment.estimate_sentiment("fast great excellent love") == "positive"
        assert sentiment.estimate_sentiment("fast but slow") == "mixed"
        assert sentiment.estimate_sentiment("great fast but a bug crash appeared") == "mixed"
        assert sentiment.estimate_sentiment("nothing notable") == "neutral"


class TestMinhash:
    def test_identical_texts_full_agreement(self):
        a = minhash.signature("the quick brown fox jumps over the lazy dog again and again")
        b = minhash.signature("the quick brown fox jumps over the lazy dog again and again")
        assert minhash.est_jaccard(a, b) == 1.0

    def test_disjoint_texts_low(self):
        a = minhash.signature(" ".join(f"wa{i}" for i in range(100)))
        b = minhash.signature(" ".join(f"wb{i}" for i in range(100)))
        assert minhash.est_jaccard(a, b) < 0.2

    def test_estimate_tracks_exact(self):
        base = " ".join(f"w{i}" for i in range(300))
        variant = " ".join(f"w{i}" if i % 10 else "CHANGED%d" % i for i in range(300))
        exact = minhash.exact_jaccard(base, variant)
        est = minhash.est_jaccard(minhash.signature(base), minhash.signature(variant))
        assert abs(exact - est) < 0.15

    def test_band_shapes(self):
        sig = minhash.signature("some text " * 20)
        bands = minhash.band_hashes(sig)
        assert bands.shape == (minhash.LSH_BANDS,)


class TestLangid:
    def test_en(self):
        assert langid.detect_lang("the cat and the dog in the house") == "en"

    def test_und(self):
        assert langid.detect_lang("xyzzy plugh") == "und"


class TestSimhash:
    def test_near_texts_close(self):
        a = simhash.simhash("the quick brown fox jumps over the lazy dog " * 5)
        b = simhash.simhash("the quick brown fox jumps over the lazy cat " * 5)
        c = simhash.simhash(" ".join(f"tok{i}" for i in range(50)))
        assert simhash.hamming(a, b) < simhash.hamming(a, c)

    def test_deterministic(self):
        assert simhash.simhash("hello world foo bar") == simhash.simhash("hello world foo bar")


class TestFingerprint:
    def test_shift_invariance(self):
        base = "the quick brown fox jumps over the lazy dog many times today"
        shifted = "PREFIX " + base
        fa = set(fingerprint.fingerprint(base))
        fb = set(fingerprint.fingerprint(shifted))
        assert len(fa & fb) / max(1, len(fa)) > 0.5

    def test_empty(self):
        assert fingerprint.fingerprint("short") == []


class TestEmbed:
    def test_unit_norm_deterministic(self):
        v = embed.embed_text("hello", 32)
        assert v.shape == (32,)
        assert abs(np.linalg.norm(v) - 1.0) < 1e-5
        assert np.array_equal(v, embed.embed_text("hello", 32))

    def test_cosine(self):
        m = np.stack([embed.embed_text(t) for t in ["a", "b", "c"]])
        s = embed.cosine_scores(m, embed.embed_text("a"))
        assert s[0] == pytest.approx(1.0, abs=1e-6)


class TestBenchmarkx:
    def test_extracts(self):
        text = "QuestDB hit 1,000,000 rows/sec vs ClickHouse at 12 ms on 32 CPU 128 GB RAM AWS c5.xlarge"
        d = benchmarkx.extract_benchmark_data(text)
        assert "QuestDB" in d["databases_mentioned"]
        assert "ClickHouse" in d["databases_mentioned"]
        assert any("rows/sec" in p for p in d["performance_numbers"])
        assert any("ms" == p.split()[-1] for p in d["performance_numbers"])
        assert len(d["hardware_specs"]) >= 2


class TestHtmlx:
    HTML = (
        "<html><head><title>T1</title></head><body>"
        "<nav><a href='/nav'>n</a></nav>"
        "<div class='cookie-box'>We use cookies</div>"
        "<article><h2>Head</h2><p>Para one</p>"
        "<pre class='language-py'>x = 1</pre>"
        "<table><tr><th>a</th><th>b</th></tr><tr><td>1</td><td>2</td></tr></table>"
        "<ul><li>i1</li><li>i2</li></ul>"
        "<a href='/x?q=1#f'>l1</a><a href='/x'>dup</a><a href='https://other.io/y'>ext</a>"
        "<a href='/img.png'>img</a></article>"
        "<footer>foot</footer></body></html>"
    )

    def test_extract_content(self):
        title, text = htmlx.extract_content(self.HTML, "article")
        assert title == "T1"
        assert "## Head" in text
        assert "Para one" in text
        assert "```py\nx = 1\n```" in text
        assert "| a | b |" in text
        assert "| --- | --- |" in text
        assert "- i1" in text
        assert "nav" not in text
        assert "cookies" not in text
        assert "foot" not in text

    def test_title_fallback_h1(self):
        html = "<html><body><h1>H1 Title</h1><p>x</p></body></html>"
        title, _ = htmlx.extract_content(html, "article")
        assert title == "H1 Title"

    def test_selector_fallback_chain(self):
        html = "<html><head><title>t</title></head><body><main><p>main content</p></main></body></html>"
        _, text = htmlx.extract_content(html, "article")
        assert "main content" in text

    def test_extract_links_canonical_dedup(self):
        links = htmlx.extract_links(self.HTML, "https://a.io/base", "article")
        assert links == ["https://a.io/x"]

    def test_extract_links_order_first_occurrence(self):
        html = "<body><a href='/b'>1</a><a href='/a'>2</a><a href='/b'>3</a></body>"
        assert htmlx.extract_links(html, "https://a.io/") == ["https://a.io/b", "https://a.io/a"]

    def test_extract_page_equals_separate_parses(self):
        """extract_page (single parse, used in the crawl hot path) must equal
        extract_content + extract_links on fresh parses — including pages
        where the content-area prune would otherwise eat links."""
        from ai_intel_web_scraper_ray.sources.synthetic import make_web_graph

        cases = [(self.HTML, "https://a.io/base")]
        cases += [(p["html"], p["url"]) for p in make_web_graph()[:20]]
        for html, url in cases:
            title, text = htmlx.extract_content(html, "article", url)
            links = htmlx.extract_links(html, url, "article")
            t2, x2, l2, m2 = htmlx.extract_page(html, "article", url)
            assert (t2, x2, l2) == (title, text, links)
            assert m2 == []  # media capture is opt-in
        # collect_links=False skips link work but keeps content identical
        t3, x3, l3, _ = htmlx.extract_page(self.HTML, "article", "https://a.io/base",
                                           collect_links=False)
        assert l3 == [] and x3 == htmlx.extract_content(self.HTML, "article")[1]

    def test_extract_page_collects_media_refs(self):
        """collect_media=True: same-domain non-html anchors come back
        canonicalized in first-occurrence order, html links unchanged;
        media anchors are collected even when links are not (max depth)."""
        html = (
            "<html><head><title>T</title></head><body><article>"
            '<a href="/a">a</a>'
            '<a href="/assets/logo.png">logo</a>'
            '<a href="/files/doc.pdf">pdf</a>'
            '<a href="/assets/logo.png">logo again</a>'
            '<a href="https://other.io/pic.png">offsite</a>'
            "</article></body></html>"
        )
        base = "https://a.io/base"
        t, x, links, media = htmlx.extract_page(html, "article", base,
                                                collect_media=True)
        assert links == ["https://a.io/a"]
        assert media == ["https://a.io/assets/logo.png",
                         "https://a.io/files/doc.pdf"]
        # at max depth: links off, media still captured
        _, _, l2, m2 = htmlx.extract_page(html, "article", base,
                                          collect_links=False,
                                          collect_media=True)
        assert l2 == [] and m2 == media
