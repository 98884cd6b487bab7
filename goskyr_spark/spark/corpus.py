"""Deterministic synthetic Common-Crawl-style corpus.

Generates the ``pages`` table (schema per BASELINE.json input_hint) as a
DISTRIBUTED job — ``spark.range`` → ``mapInPandas`` — so the same code
scales from the sandbox's thousands of pages to a 10^10-URL frontier on a
real cluster: every page is a pure function of ``(seed, page_ordinal)``,
no driver-side materialization, no shuffle.

Page graph (mirrors the page shapes goskyr scrapes — list pages with
repeated item containers, pagination links, and detail pages; cf. the
reference's own fixtures ``/root/reference/testdata/regression/``):

* host ``h``:   ``https://host{h:04d}.crawl-corpus.net``
* list page:    ``{base}/list/{p}``, ``items_per_page`` item divs, a
  ``rel=next`` link to ``/list/{p+1}``, and one cross-host link.
* detail page:  ``{base}/item/{p}-{i}`` — one detail container.
* host 0 is a MEGA-HOST with ``mega_factor``× the list pages of the rest
  (exercises the salted-repartition skew path).
* every host serves a robots.txt (separate ``robots`` table); hosts with
  ``h % 7 == 3`` disallow ``/private/`` and list pages link into it, so
  robots admission is observable in the crawl result.
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from . import schemas

HOST_FMT = "https://host{h:04d}.crawl-corpus.net"

_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima "
    "mike november oscar papa quebec romeo sierra tango uniform victor whiskey "
    "xray yankee zulu amber birch cedar dune ember fjord grove harbor inlet"
).split()

_MONTHS = (
    "January February March April May June July August "
    "September October November December"
).split()


def _h(seed: int, *parts) -> int:
    b = hashlib.sha1(("%d:" % seed + ":".join(map(str, parts))).encode()).digest()
    return int.from_bytes(b[:8], "big")


def _words(seed: int, tag: str, n: int, *parts) -> str:
    x = _h(seed, tag, *parts)
    out = []
    for _ in range(n):
        out.append(_WORDS[x % len(_WORDS)])
        x //= len(_WORDS)
        if x == 0:
            x = _h(seed, tag, "ext", *parts, len(out))
    return " ".join(out)


class CorpusSpec:
    """Sizing for one synthetic corpus; all content derives from ``seed``."""

    def __init__(
        self,
        n_hosts: int = 20,
        list_pages_per_host: int = 5,
        items_per_page: int = 8,
        mega_factor: int = 8,
        seed: int = 42,
        body_words: int = 60,
    ):
        self.n_hosts = n_hosts
        self.list_pages_per_host = list_pages_per_host
        self.items_per_page = items_per_page
        self.mega_factor = mega_factor
        self.seed = seed
        self.body_words = body_words

    # ---- page-graph arithmetic (pure; no Spark) ----

    def list_pages_of(self, h: int) -> int:
        return self.list_pages_per_host * (self.mega_factor if h == 0 else 1)

    @property
    def total_list_pages(self) -> int:
        return self.list_pages_per_host * (self.n_hosts - 1 + self.mega_factor)

    @property
    def total_pages(self) -> int:
        return self.total_list_pages * (1 + self.items_per_page)

    def ordinal_to_page(self, i: int):
        """Map a flat ordinal to (host, kind, list_idx, item_idx)."""
        lp, rest = divmod(i, 1 + self.items_per_page)
        mega = self.list_pages_of(0)
        if lp < mega:
            h, p = 0, lp
        else:
            h1, p = divmod(lp - mega, self.list_pages_per_host)
            h = h1 + 1
        if rest == 0:
            return h, "list", p, -1
        return h, "item", p, rest - 1

    def host_base(self, h: int) -> str:
        return HOST_FMT.format(h=h)

    def seed_urls(self) -> list[str]:
        return [self.host_base(h) + "/list/0" for h in range(self.n_hosts)]

    def host_disallows_private(self, h: int) -> bool:
        return h % 7 == 3

    def crawl_delay(self, h: int) -> int:
        return 1 + (_h(self.seed, "delay", h) % 3)

    # ---- page content (pure) ----

    def item_title(self, h: int, p: int, i: int) -> str:
        return f"Item {h}-{p}-{i}: {_words(self.seed, 'title', 3, h, p, i)}"

    def item_date(self, h: int, p: int, i: int) -> str:
        x = _h(self.seed, "date", h, p, i)
        return f"{_MONTHS[x % 12]} {1 + (x // 12) % 28}, {2024 + (x // 400) % 3}"

    def item_summary(self, h: int, p: int, i: int) -> str:
        return _words(self.seed, "summary", 10, h, p, i)

    def list_html(self, h: int, p: int) -> str:
        base = self.host_base(h)
        items = []
        for i in range(self.items_per_page):
            items.append(
                '<div class="post">'
                f'<h2 class="title"><a href="/item/{p}-{i}">{self.item_title(h, p, i)}</a></h2>'
                f'<span class="date">{self.item_date(h, p, i)}</span>'
                f'<p class="summary">{self.item_summary(h, p, i)}</p>'
                "</div>"
            )
        nav = ""
        if p + 1 < self.list_pages_of(h):
            nav = f'<a class="next" rel="next" href="/list/{p + 1}">Next</a>'
        # archive sidebar: a few same-host list links (typical blog archive
        # block) — gives the frontier BFS breadth instead of forcing the
        # crawler down the pagination chain one round per page
        np = self.list_pages_of(h)
        sidebar = "".join(
            f'<a class="archive" href="/list/{j}">archive {j}</a>'
            for j in sorted({0, (p * 7 + 3) % np, (p * 13 + 1) % np, (_h(self.seed, "sb", h, p) % np)})
        )
        cross = self.host_base((h + 1 + _h(self.seed, "x", h, p) % max(1, self.n_hosts - 1)) % self.n_hosts)
        private = '<a href="/private/admin">admin</a>' if self.host_disallows_private(h) else ""
        return (
            "<!DOCTYPE html><html><head>"
            f"<title>Host {h:04d} list {p}</title></head><body>"
            f'<main class="listing">{"".join(items)}</main>'
            f'<nav>{nav}<aside class="sidebar">{sidebar}</aside>'
            f'<a class="other" href="{cross}/list/0">elsewhere</a>{private}</nav>'
            "</body></html>"
        )

    def item_html(self, h: int, p: int, i: int) -> str:
        # body rendered as 15-word paragraphs: parse cost tracks tag count
        # (like real article markup), not just byte count
        words = _words(self.seed, "body", self.body_words, h, p, i).split()
        paras = "".join(
            "<p>" + " ".join(words[j : j + 15]) + "</p>" for j in range(0, len(words), 15)
        )
        return (
            "<!DOCTYPE html><html><head>"
            f"<title>{self.item_title(h, p, i)}</title></head><body>"
            f'<article class="detail"><h1 class="title">{self.item_title(h, p, i)}</h1>'
            f'<span class="byline">{_words(self.seed, "author", 2, h, p, i)}</span>'
            f'<div class="body">{paras}</div></article>'
            "</body></html>"
        )

    def page_for_ordinal(self, i: int):
        h, kind, p, it = self.ordinal_to_page(i)
        base = self.host_base(h)
        if kind == "list":
            url = f"{base}/list/{p}"
            html = self.list_html(h, p)
            text = "\n".join(
                self.item_title(h, p, j) + "\n" + self.item_summary(h, p, j)
                for j in range(self.items_per_page)
            )
        else:
            url = f"{base}/item/{p}-{it}"
            html = self.item_html(h, p, it)
            text = self.item_title(h, p, it) + "\n" + _words(self.seed, "body", self.body_words, h, p, it)
        ts = datetime(2026, 1, 1, tzinfo=timezone.utc)
        return url, ts.replace(tzinfo=None), html.encode("utf-8"), text, "en"

    def robots_txt(self, h: int) -> str:
        lines = ["User-agent: *"]
        if self.host_disallows_private(h):
            lines.append("Disallow: /private/")
        lines.append(f"Crawl-delay: {self.crawl_delay(h)}")
        return "\n".join(lines) + "\n"

    # ---- the goskyr config that extracts this corpus ----

    def config_yaml(self) -> str:
        return """\
id:
  slug: crawl-corpus-net
  id: n08a
scrapers:
  - url: https://host0000.crawl-corpus.net/list/0
    selector: div.post
    fields:
      - name: title
        location:
          selector: h2.title > a
      - name: link
        type: url
        location:
          selector: h2.title > a
      - name: date
        location:
          selector: span.date
      - name: summary
        location:
          selector: p.summary
    paginators:
      - location:
          selector: nav > a.next
          attr: href
"""

    def detail_config_yaml(self) -> str:
        return """\
id:
  slug: crawl-corpus-net
  field: link
  subid: n01a
scrapers:
  - url: https://host0000.crawl-corpus.net/list/0
    selector: article.detail
    fields:
      - name: heading
        location:
          selector: h1.title
      - name: author
        location:
          selector: span.byline
"""


def generate_pages(spark: SparkSession, spec: CorpusSpec, partitions: int | None = None) -> DataFrame:
    """Distributed pages-table build: one task per slice of the ordinal
    range; each row is recomputed from (seed, ordinal) — embarrassingly
    parallel, deterministic, zero shuffle."""
    n = spec.total_pages
    parts = partitions or max(8, spark.sparkContext.defaultParallelism)
    args = (spec.n_hosts, spec.list_pages_per_host, spec.items_per_page, spec.mega_factor, spec.seed, spec.body_words)

    def gen(batches):
        sp = CorpusSpec(*args)
        for pdf in batches:
            rows = [sp.page_for_ordinal(int(i)) for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])

    return spark.range(0, n, numPartitions=parts).mapInPandas(gen, schema=schemas.PAGES)


def generate_robots(spark: SparkSession, spec: CorpusSpec) -> DataFrame:
    from ..extract.urlutil import host_of

    rows = [(host_of(spec.host_base(h)), spec.robots_txt(h)) for h in range(spec.n_hosts)]
    return spark.createDataFrame(rows, schema=schemas.ROBOTS)


def load_reference_fixture_pages(spark: SparkSession, root: str = "/root/reference/testdata") -> DataFrame:
    """Ingest the reference's own cached fixture pages (stripping the
    ``HTTP/x.x NNN`` header line, cf. ``/root/reference/fetch/cache.go:63-75``)
    into the pages schema, driver-side (315 small files)."""
    import glob
    import os

    from ..extract.record import strip_http_header

    rows = []
    ts = datetime(2026, 7, 23)
    for cat in ("regression", "scraping"):
        for p in sorted(glob.glob(os.path.join(root, cat, "*", "*.html"))):
            with open(p, encoding="utf-8", errors="replace") as fh:
                raw = fh.read()
            slug = os.path.basename(p)[:-5]
            rows.append((f"fixture://{cat}/{slug}", ts, strip_http_header(raw).encode("utf-8"), None, None))
    return spark.createDataFrame(rows, schema=schemas.PAGES)
