"""Sitemap (sitemaps.org XML) source: seed the crawl frontier from
per-host sitemap indexes, distributed.

The reference discovers URLs only by scraping anchors out of fetched
pages (``/root/reference/scrape/scrape.go`` paginators + subpage URLs);
a production frontier ALSO ingests the sitemaps hosts publish — they
enumerate exactly the URLs the crawl would otherwise spend rounds
discovering, with last-modified hints for re-crawl scheduling.

Two-level shape per the protocol: ``/sitemap.xml`` is a
``<sitemapindex>`` pointing at child ``<urlset>`` files. The expansion
is a JOIN, not recursion: parse the index rows (one Arrow pass), join
the child locs back to the sitemap table on (host, path), parse the
matched urlsets (second Arrow pass). At 10^8 hosts both passes
partition by host and the join keys on (host, path) — no driver-side
fetch loop, no skew (each host contributes a handful of rows).

The parser is a dedicated scanner for the 4 tags the protocol defines
(``sitemap``/``url`` blocks, ``loc``/``lastmod`` leaves) — not the HTML5
parser (sitemaps are XML; HTML insertion rules would foster-parent
table-ish content) and not a fragile regex split (CDATA and whitespace
around ``<loc>`` are handled).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SITEMAP_SCHEMA = "host string, path string, xml string"
SITEMAP_URL_SCHEMA = "host string, url string, lastmod string"
_BLOCK = re.compile(r"<(sitemap|url)\b[^>]*>(.*?)</\1>", re.S)
_LOC = re.compile(r"<loc>\s*(?:<!\[CDATA\[)?(.*?)(?:\]\]>)?\s*</loc>", re.S)
_LASTMOD = re.compile(r"<lastmod>\s*(.*?)\s*</lastmod>", re.S)


def parse_sitemap(xml: str) -> list[tuple[str, str]]:
    """Pure: one sitemap/sitemapindex document → [(loc, lastmod|'')]."""
    out = []
    for _tag, body in _BLOCK.findall(xml or ""):
        loc = _LOC.search(body)
        if not loc:
            continue
        lm = _LASTMOD.search(body)
        out.append((loc.group(1).strip(), lm.group(1).strip() if lm else ""))
    return out


# ---------------------------------------------------------------------------
# deterministic corpus sitemaps (pure functions of CorpusSpec — the same
# contract corpus.py uses, so oracles can enumerate the expected set)

def _lastmod(spec, h: int, p: int) -> str:
    from ..spark.corpus import _h

    x = _h(spec.seed, "lm", h, p)
    return f"2026-{1 + x % 12:02d}-{1 + (x // 12) % 28:02d}"


def sitemap_paths(spec, h: int) -> list[str]:
    return ["/sitemap.xml", "/sitemap-lists.xml", "/sitemap-items.xml"]


def sitemap_xml(spec, h: int, path: str) -> str:
    base = spec.host_base(h)
    if path == "/sitemap.xml":
        inner = "".join(
            f"<sitemap><loc>{base}{c}</loc></sitemap>"
            for c in ("/sitemap-lists.xml", "/sitemap-items.xml")
        )
        return f'<?xml version="1.0"?><sitemapindex>{inner}</sitemapindex>'
    np_ = spec.list_pages_of(h)
    if path == "/sitemap-lists.xml":
        inner = "".join(
            f"<url><loc>{base}/list/{p}</loc>"
            f"<lastmod>{_lastmod(spec, h, p)}</lastmod></url>"
            for p in range(np_)
        )
    else:
        inner = "".join(
            f"<url><loc>{base}/item/{p}-{i}</loc></url>"
            for p in range(np_)
            for i in range(spec.items_per_page)
        )
    return f'<?xml version="1.0"?><urlset>{inner}</urlset>'


def generate_sitemaps(spark: SparkSession, spec) -> DataFrame:
    """Distributed (host, path, xml) table — one task slice per host
    range, zero shuffle (mirrors corpus.generate_pages)."""
    from ..extract.urlutil import host_of
    from ..spark.corpus import CorpusSpec

    args = (spec.n_hosts, spec.list_pages_per_host, spec.items_per_page,
            spec.mega_factor, spec.seed, spec.body_words)

    def gen(batches):
        sp = CorpusSpec(*args)
        for pdf in batches:
            rows = []
            for h in pdf["id"]:
                h = int(h)
                host = host_of(sp.host_base(h))
                for path in sitemap_paths(sp, h):
                    rows.append((host, path, sitemap_xml(sp, h, path)))
            yield pd.DataFrame(rows, columns=["host", "path", "xml"])

    parts = min(spec.n_hosts, max(8, spark.sparkContext.defaultParallelism))
    return spark.range(0, spec.n_hosts, numPartitions=parts).mapInPandas(
        gen, schema=SITEMAP_SCHEMA
    )


def _parse_pass(df: DataFrame) -> DataFrame:
    """(host, path, xml) → (host, loc, lastmod), one row per entry."""
    def run(batches):
        for pdf in batches:
            rows = []
            for host, xml in zip(pdf["host"], pdf["xml"]):
                for loc, lm in parse_sitemap(xml):
                    rows.append((host, loc, lm))
            yield pd.DataFrame(rows, columns=["host", "url", "lastmod"])

    return df.select("host", "path", "xml").mapInPandas(run, schema=SITEMAP_URL_SCHEMA)


def sitemap_frontier(sitemaps: DataFrame) -> DataFrame:
    """Index → children as a JOIN: parse the /sitemap.xml rows, turn each
    child loc into (host, path), join back to the sitemap table, parse
    the matched urlsets → (url, lastmod, host). Hosts whose index points
    at a missing child simply contribute nothing (inner join)."""
    idx = _parse_pass(sitemaps.filter(F.col("path") == "/sitemap.xml"))
    child_keys = idx.select(
        "host",
        F.regexp_replace("url", "^[A-Za-z]+://[^/]+", "").alias("path"),
    ).dropDuplicates(["host", "path"])  # an index listing a child twice must not double its urlset
    children = sitemaps.join(child_keys, ["host", "path"], "inner")
    out = _parse_pass(children)
    return out.select(F.col("url"), F.col("lastmod"), F.col("host"))
