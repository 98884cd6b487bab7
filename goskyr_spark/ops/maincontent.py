"""Main-content (boilerplate) extraction — the readability/trafilatura
move every web-text training pipeline runs between "fetched HTML" and
"document text": score each candidate block by how much prose it carries vs
how link-dense it is, keep the winner, drop nav/sidebar/footer chrome.

The reference extracts CONFIGURED fields (CSS selectors per site,
``/root/reference/scrape/scrape.go:722-843``); a 100-TB Common-Crawl
pipeline has no per-site config, so this operator is the config-free
counterpart: a deterministic block scorer over the DOM.

Algorithm (pure function of the HTML, no model):

* candidates: every element whose tag is in CANDIDATE_TAGS (the
  block-level containers boilerplate removers score), in document
  (pre-order) order; <body> is the FALLBACK when no candidate carries
  text, never a competitor (it ties its own best child on link-free
  pages and would steal the win by document order);
* for each candidate: ``text`` = its subtree text with runs of Java
  ``\\s`` ([ \\t\\n\\x0b\\f\\r]) collapsed to one space and trimmed;
  ``link_len`` = the same measure over the subtree text of its <a>
  descendants (nested <a> counted once — top-most wins);
* ``link_density`` = link_len / text_len (0 when empty);
  ``score`` = text_len · (1 − link_density)² — the squared penalty is
  what sinks link-farms (nav bars score near 0 even when long);
* winner = max score, ties broken by document order (first wins).

Scale shape: ONE Arrow ``mapInPandas`` pass over (url, html) — the same
zero-shuffle batch geometry as the extraction UDF
(spark/extract_udf.py); per-page work is bounded by DOM size, no state
crosses pages, so the pass partitions arbitrarily and survives 10^10
pages. The oracle (``__spark_entry__``) replays this module's own pure
scorer sequentially over the deterministic corpus and embeds the
expected rows as VALUES — gating that the distributed fan-out emits
exactly what the sequential scorer computes per page.
"""

from __future__ import annotations

import hashlib
import re

import pandas as pd
from pyspark.sql import DataFrame

# Java-\s parity (textstats.py convention): NOT python \s (which adds
# unicode spaces) — keeps the Spark side and any SQL replica identical.
_WS = re.compile(r"[ \t\n\x0b\f\r]+")

CANDIDATE_TAGS = ("article", "main", "section", "div", "td", "ul", "ol", "table")

MAIN_CONTENT_SCHEMA = (
    "url string, tag string, n_chars int, link_density double, text_md5 string"
)


def _norm(s: str) -> str:
    return _WS.sub(" ", s).strip()


def main_block(html: str) -> tuple[str, int, float, str]:
    """Pure per-page scorer → (tag, n_chars, link_density, text_md5).

    Shared verbatim by the distributed pass and the sequential oracle
    replica — the correctness statement is that Spark's fan-out equals
    this function applied per page.
    """
    from ..extract.record import strip_http_header
    from ..htmlx.parser import ELEMENT, parse_html

    root = parse_html(strip_http_header(html))

    def link_len(node) -> int:
        # top-most <a> wins: don't descend into a counted anchor
        total = 0
        stack = list(reversed(node.children))
        while stack:
            n = stack.pop()
            if n.type == ELEMENT and n.tag == "a":
                total += len(_norm(n.text_content()))
                continue
            stack.extend(reversed(n.children))
        return total

    best = None  # (score, order, tag, text, link_density)
    body = None
    order = 0
    for el in root.iter_elements():
        order += 1
        if el.tag == "body":
            body = el
        if el.tag not in CANDIDATE_TAGS:
            continue
        text = _norm(el.text_content())
        tl = len(text)
        if tl == 0:
            continue
        ld = min(link_len(el) / tl, 1.0)
        score = tl * (1.0 - ld) * (1.0 - ld)
        # strict > : first (shallowest/earliest) candidate wins ties
        if best is None or score > best[0]:
            best = (score, order, el.tag, text, ld)
    if best is None:
        text = _norm(body.text_content()) if body is not None else ""
        ld = min(link_len(body) / len(text), 1.0) if body is not None and text else 0.0
        return ("body", len(text), round(ld, 4),
                hashlib.md5(text.encode("utf-8")).hexdigest())
    _, _, tag, text, ld = best
    return tag, len(text), round(ld, 4), hashlib.md5(text.encode("utf-8")).hexdigest()


def extract_main_content(pages: DataFrame) -> DataFrame:
    """pages(url, html[, ...]) → (url, tag, n_chars, link_density,
    text_md5), one row per page; zero shuffle."""

    def run(batches):
        for pdf in batches:
            rows = []
            for url, html in zip(pdf["url"], pdf["html"]):
                s = (
                    html.decode("utf-8", errors="replace")
                    if isinstance(html, (bytes, bytearray))
                    else (html or "")
                )
                tag, n, ld, h = main_block(s)
                rows.append((url, tag, n, ld, h))
            yield pd.DataFrame(
                rows, columns=["url", "tag", "n_chars", "link_density", "text_md5"]
            )

    return pages.select("url", "html").mapInPandas(run, schema=MAIN_CONTENT_SCHEMA)
