"""Gates for the round-4 webtext operators: WARC source round-trip,
main-content extraction, URL canonicalization, quality classifier.
(Their cross-engine correctness is oracle-gated via __spark_entry__;
these tests pin unit semantics and the plan shapes.)"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from goskyr_spark.ops.classifier import THRESHOLD, VOCAB, quality_classifier
from goskyr_spark.ops.maincontent import extract_main_content, main_block
from goskyr_spark.ops.urls import canonicalize, url_dedup, variant_urls
from goskyr_spark.spark.corpus import CorpusSpec, generate_pages
from goskyr_spark.spark.warc import (
    generate_warc_files,
    parse_warc_bytes,
    read_warc,
    warc_record,
)
from tests.test_plans import plan_of

SF = "/root/testdata/sf0.001"
SPEC = CorpusSpec(n_hosts=3, list_pages_per_host=2, items_per_page=3,
                  mega_factor=2, seed=9)


# ---------------------------------------------------------------- WARC

def test_warc_roundtrip_equals_pages_table(spark):
    """Writer → reader reproduces (url, warc_ts, html) byte-exactly."""
    got = {
        r["url"]: (r["warc_ts"], bytes(r["html"]))
        for r in read_warc(generate_warc_files(spark, SPEC, pages_per_file=5)).collect()
    }
    want = {
        r["url"]: (r["warc_ts"], bytes(r["html"]))
        for r in generate_pages(spark, SPEC).collect()
    }
    assert got == want


def test_warc_parser_honors_content_length_not_markers():
    """A payload containing the literal record marker must not split the
    record — the parser walks Content-Length."""
    tricky = b"<html>WARC/1.0\r\nWARC-Type: fake</html>"
    raw = warc_record("https://x.test/a", "2026-01-01T00:00:00Z", tricky) + warc_record(
        "https://x.test/b", "2026-01-01T00:00:00Z", b"<p>ok</p>"
    )
    recs = parse_warc_bytes(raw)
    assert [(u, h) for u, _d, h in recs] == [
        ("https://x.test/a", tricky),
        ("https://x.test/b", b"<p>ok</p>"),
    ]


def test_warc_dir_replay_drives_identical_crawl(spark, tmp_path):
    """Common-Crawl replay mode end-to-end: write the corpus as real
    .warc files, read them back via the binaryFile source
    (pages_from_warc_dir), and drive a full multi-round crawl from the
    replayed pages — byte-identical pages table AND identical visit log
    vs the generated corpus."""
    from goskyr_spark.crawl.bloom import BloomSpec
    from goskyr_spark.crawl.rounds import CrawlRun
    from goskyr_spark.spark.warc import pages_from_warc_dir, write_warc_dir

    spec = CorpusSpec(n_hosts=2, list_pages_per_host=2, items_per_page=2,
                      mega_factor=1, seed=7)
    warc_dir = str(tmp_path / "warcs")
    n_files = write_warc_dir(spark, spec, warc_dir, pages_per_file=5)
    assert n_files == -(-spec.total_pages // 5)

    replay = pages_from_warc_dir(spark, warc_dir)
    # byte-equality gate vs the generated corpus
    got = {r["url"]: (r["warc_ts"], bytes(r["html"])) for r in replay.collect()}
    want = {
        r["url"]: (r["warc_ts"], bytes(r["html"]))
        for r in generate_pages(spark, spec).collect()
    }
    assert got == want

    def visit_log_over(pages, wh):
        cfg = spec.config_yaml().replace("id: n08a", "id: n08a\n  field: link")
        run = CrawlRun(
            spark, wh, pages, cfg, robots=None,
            bloom_spec=BloomSpec(n_buckets=8, bits_per_bucket=1 << 14),
            default_budget=16, n_salts=4, follow_links=True,
        )
        run.init(spec.seed_urls())
        run.run(max_rounds=6)
        return (
            run.visit_log().orderBy("round_id", "host", "visit_rank").toPandas()
        )

    a = visit_log_over(replay, str(tmp_path / "wh_warc"))
    b = visit_log_over(generate_pages(spark, spec), str(tmp_path / "wh_gen"))
    assert a.equals(b)


def test_warc_parser_skips_malformed_records():
    """A record with a non-integer Content-Length is skipped via marker
    resync; the rest of the file still parses (Common Crawl files do
    carry occasional damage — one bad record must not kill the batch)."""
    good_a = warc_record("https://x.test/a", "2026-01-01T00:00:00Z", b"<p>a</p>")
    bad = good_a.replace(b"https://x.test/a", b"https://x.test/bad").replace(
        b"Content-Length:", b"Content-Length: NaN\r\nX-Was:", 1
    )
    good_b = warc_record("https://x.test/b", "2026-01-01T00:00:00Z", b"<p>b</p>")
    recs = parse_warc_bytes(good_a + bad + good_b)
    assert [u for u, _d, _h in recs] == ["https://x.test/a", "https://x.test/b"]


def test_read_warc_defaults_missing_date(spark):
    """An empty WARC-Date must not raise inside the Arrow task — it
    defaults to epoch."""
    raw = warc_record("https://x.test/a", "", b"<p>a</p>")
    df = spark.createDataFrame([(0, bytearray(raw))], "file_id long, content binary")
    rows = read_warc(df).collect()
    assert len(rows) == 1 and rows[0]["warc_ts"].year == 1970


def test_warc_parser_skips_non_response_and_non_200():
    req = (
        b"WARC/1.0\r\nWARC-Type: request\r\nWARC-Target-URI: https://x.test/a\r\n"
        b"Content-Length: 18\r\n\r\nGET / HTTP/1.1\r\n\r\n\r\n\r\n"
    )
    notfound = warc_record("https://x.test/404", "2026-01-01T00:00:00Z", b"nope").replace(
        b"HTTP/1.1 200 OK", b"HTTP/1.1 404 NF"
    )
    ok = warc_record("https://x.test/ok", "2026-01-01T00:00:00Z", b"<p>y</p>")
    recs = parse_warc_bytes(req + notfound + ok)
    assert [u for u, _d, _h in recs] == ["https://x.test/ok"]


# -------------------------------------------------------- main content

def test_main_content_drops_nav_on_list_pages(spark):
    out = extract_main_content(generate_pages(spark, SPEC))
    rows = {r["url"]: r for r in out.collect()}
    for url, r in rows.items():
        if "/list/" in url:
            # the listing <main> wins over the link-dense nav/sidebar
            assert r["tag"] == "main", (url, r)
        else:
            assert r["tag"] == "article", (url, r)
    # winner digest matches the pure scorer on a sample page
    url, _ts, html, _t, _l = SPEC.page_for_ordinal(0)
    tag, n, ld, h = main_block(html.decode())
    assert rows[url]["text_md5"] == h and rows[url]["n_chars"] == n


def test_main_block_penalizes_link_density():
    html = (
        "<html><body>"
        '<div id="nav">' + "".join(f'<a href="/{i}">section {i} link</a>' for i in range(30)) + "</div>"
        '<div id="content"><p>' + "prose word " * 40 + '</p><a href="/x">one link</a></div>'
        "</body></html>"
    )
    tag, n, ld, h = main_block(html)
    assert tag == "div" and ld < 0.2
    assert hashlib.md5(("prose word " * 40).strip().encode() + b" one link").hexdigest() == h


def test_main_block_empty_tie_and_fallback_semantics():
    assert main_block("<html><body></body></html>") == (
        "body", 0, 0.0, hashlib.md5(b"").hexdigest())
    # equal-scoring nested candidates: the FIRST (outermost) wins
    html = "<body><div><div><p>same text here</p></div></div></body>"
    tag, n, _ld, _h = main_block(html)
    assert (tag, n) == ("div", len("same text here"))
    # no block candidate at all → <body> fallback
    tag, n, _ld, _h = main_block("<body><p>just a paragraph</p></body>")
    assert (tag, n) == ("body", len("just a paragraph"))


def test_main_content_plan_is_one_arrow_pass(spark):
    plan = plan_of(extract_main_content(generate_pages(spark, SPEC)))
    assert "Exchange" not in plan, plan


# ------------------------------------------------------------ url dedup

def test_canonicalize_vectors(spark):
    cases = [
        ("HTTPS://WWW.Host1.Example.COM:443/p/3", "https://host1.example.com/p/3"),
        ("https://host1.example.com/p/3#sec-2", "https://host1.example.com/p/3"),
        ("https://host1.example.com/p/3/", "https://host1.example.com/p/3"),
        ("https://host1.example.com/p/3?utm_source=feed&utm_campaign=c1",
         "https://host1.example.com/p/3"),
        ("https://host1.example.com/p/3?id=2&utm_medium=email",
         "https://host1.example.com/p/3?id=2"),
        ("https://host1.example.com/p/3?utm_a=1&id=2",
         "https://host1.example.com/p/3?id=2"),
        ("http://h.example.com:80/", "http://h.example.com"),
        # scheme-conditioned default ports: only the scheme's OWN default strips
        ("https://h.example.com:80/x", "https://h.example.com:80/x"),
        ("http://h.example.com:443/x", "http://h.example.com:443/x"),
        # utm embedded in another param's VALUE is not a tracking param
        ("https://h.example.com/p?next=utm_a=1&b=2",
         "https://h.example.com/p?next=utm_a=1&b=2"),
        # consecutive utm params mid-query collapse onto one separator
        ("https://h.example.com/p?utm_a=1&utm_b=2&id=3",
         "https://h.example.com/p?id=3"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r["canonical_url"] for r in canonicalize(df).collect()]
    assert got == [want for _, want in cases]


def test_url_dedup_collapses_variants(spark):
    out = url_dedup(spark, SF).collect()
    assert sum(r["n_variants"] for r in out) == spark.read.parquet(
        f"{SF}/documents.parquet"
    ).count()
    # variants genuinely collapse (the corpus plants ~6 spellings/URL)
    assert max(r["n_spellings"] for r in out) > 1


def test_url_dedup_plan_exchange_budget_codegen(spark):
    plan = plan_of(url_dedup(spark, SF))
    # canonical agg = 1 exchange; COUNT(DISTINCT url) legitimately adds
    # the standard expand/second-agg exchange — budget is exactly 2
    # ("+- Exchange" counts tree nodes; details repeat the names)
    assert plan.count("+- Exchange") == 2, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "HashAggregate" in plan


# ----------------------------------------------------- anchors & sitemaps

def test_corpus_anchor_rows_match_parse(spark):
    """The oracle's pure (src, dst, text) enumeration must equal what the
    real HTML parse emits — the lockstep gate (cf.
    test_corpus_link_edges_match_enumeration for the edge set)."""
    from goskyr_spark.ops.anchortext import corpus_anchor_rows, page_anchors

    parsed = sorted(
        (r["src"], r["dst"], r["text"])
        for r in page_anchors(generate_pages(spark, SPEC)).collect()
    )
    assert parsed == sorted(corpus_anchor_rows(SPEC))


def test_anchor_text_agg_semantics(spark):
    from goskyr_spark.ops.anchortext import anchor_text_agg

    a = spark.createDataFrame(
        [("s1", "d1", "buy now"), ("s2", "d1", "docs"), ("s3", "d1", "docs"),
         ("s1", "d2", "home")],
        "src string, dst string, text string",
    )
    rows = {r["url"]: r for r in anchor_text_agg(a).collect()}
    assert rows["d1"]["n_inlinks"] == 3 and rows["d1"]["n_anchor_forms"] == 2
    assert rows["d1"]["top_anchor"] == "docs" and rows["d1"]["top_anchor_count"] == 2
    # tie on count → lexicographic
    b = spark.createDataFrame(
        [("s1", "d", "zzz"), ("s2", "d", "aaa")], "src string, dst string, text string"
    )
    assert anchor_text_agg(b).collect()[0]["top_anchor"] == "aaa"


def test_anchor_agg_plan_two_exchanges(spark):
    from goskyr_spark.ops.anchortext import anchor_text_agg, page_anchors

    plan = plan_of(anchor_text_agg(page_anchors(generate_pages(spark, SPEC))))
    # agg keyed (dst,text) + window keyed dst — nothing else shuffles
    assert plan.count("+- Exchange") == 2, plan


def test_parse_sitemap_cdata_and_whitespace():
    from goskyr_spark.crawl.sitemaps import parse_sitemap

    xml = """<urlset>
      <url> <loc>
        <![CDATA[https://h.test/a]]> </loc><lastmod> 2026-01-02 </lastmod></url>
      <url><loc>https://h.test/b</loc></url>
      <url><priority>0.5</priority></url>
    </urlset>"""
    assert parse_sitemap(xml) == [
        ("https://h.test/a", "2026-01-02"), ("https://h.test/b", "")
    ]


def test_sitemap_frontier_covers_every_page(spark):
    from goskyr_spark.crawl.sitemaps import generate_sitemaps, sitemap_frontier

    rows = sitemap_frontier(generate_sitemaps(spark, SPEC)).collect()
    got = {r["url"] for r in rows}
    want = {r["url"] for r in generate_pages(spark, SPEC).collect()}
    assert got == want
    lastmods = {r["url"]: r["lastmod"] for r in rows}
    assert all(lm != "" for u, lm in lastmods.items() if "/list/" in u)
    assert all(lm == "" for u, lm in lastmods.items() if "/item/" in u)


# ------------------------------------------------------------ classifier

def test_quality_classifier_signal_dominates_hash_tail(spark):
    docs = spark.createDataFrame(
        [(1, "join filter vector merge scan column query"),
         (2, "slow slow small big the a value slow")],
        "doc_id long, text string",
    )
    import goskyr_spark.ops.classifier as c

    vocab = spark.createDataFrame(list(VOCAB), schema="tok string, w double")
    toks = docs.select(
        "doc_id",
        F.posexplode_outer(
            F.regexp_extract_all(F.lower("text"), F.lit(c.TOKEN_RE), F.lit(0))
        ).alias("pos", "tok"),
    ).filter(F.col("tok").isNotNull())
    scored = (
        toks.join(F.broadcast(vocab), "tok", "left")
        .groupBy("doc_id")
        .agg(F.round(F.avg(F.coalesce(F.col("w"), F.lit(0.0))), 6).alias("score"))
        .collect()
    )
    by_id = {r["doc_id"]: r["score"] for r in scored}
    assert by_id[1] > THRESHOLD > by_id[2]


def test_quality_classifier_plan_broadcasts_vocab(spark):
    plan = plan_of(quality_classifier(spark, SF))
    assert "BroadcastHashJoin" in plan, plan
    # tokens never shuffle by value: the only exchange keys on doc_id
    assert plan.count("+- Exchange") == 1, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
