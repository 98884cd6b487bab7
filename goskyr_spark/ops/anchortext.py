"""Anchor-text aggregation: for every URL in the link graph, how other
pages describe it — the classic web-IR signal (anchor text often beats
the page's own text for retrieval, and crawl schedulers use in-link
counts as a cheap centrality prior before PageRank converges).

Complements ops/linkrank.py: PageRank weighs the EDGES, this op reads
the LABELS. Same honest derivation — the anchors come out of the real
HTML via the extraction engine's parser, not the corpus arithmetic (the
arithmetic lives only in the oracle, whose lockstep with the generator
is separately test-gated, same discipline as
test_corpus_link_edges_match_enumeration).

Shape at 10^10 edges: one Arrow parse pass (zero shuffle) → ONE
aggregate keyed (dst, text) → ONE window keyed dst. Both exchanges key
on the destination URL; anchor strings never shuffle alone. Top-anchor
ties break (count DESC, text ASC) — deterministic across engines.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ANCHOR_SCHEMA = "src string, dst string, text string"


def page_anchors(pages: DataFrame) -> DataFrame:
    """pages(url, html) → (src, dst, text): every resolved http(s)
    anchor with its whitespace-normalized text, in document order."""
    import re

    from ..extract.record import PageDoc, strip_http_header
    from ..extract.urlutil import URLError, resolve_url

    ws = re.compile(r"[ \t\n\x0b\f\r]+")

    def run(batches):
        for pdf in batches:
            rows = []
            for url, html in zip(pdf["url"], pdf["html"]):
                s = (
                    html.decode("utf-8", errors="replace")
                    if isinstance(html, (bytes, bytearray))
                    else (html or "")
                )
                doc = PageDoc(url, strip_http_header(s))
                base = doc.base_href() or url
                for a in doc.find("a"):
                    href = a.attrs.get("href", "")
                    if not href or href.startswith(("javascript:", "mailto:", "#")):
                        continue
                    try:
                        dst = resolve_url(base, href)
                    except URLError:
                        continue
                    if dst.startswith(("http://", "https://")):
                        rows.append((url, dst, ws.sub(" ", a.text_content()).strip()))
            yield pd.DataFrame(rows, columns=["src", "dst", "text"])

    return pages.select("url", "html").mapInPandas(run, schema=ANCHOR_SCHEMA)


def anchor_text_agg(anchors: DataFrame) -> DataFrame:
    """(src, dst, text) → per-URL rollup: total in-links, distinct
    anchor spellings, and the dominant anchor text."""
    g = anchors.groupBy("dst", "text").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("dst")
    wo = w.orderBy(F.desc("cnt"), F.asc("text"))
    return (
        g.select(
            F.col("dst").alias("url"),
            "text",
            "cnt",
            F.row_number().over(wo).alias("rn"),
            F.sum("cnt").over(w).alias("n_inlinks"),
            F.count("*").over(w).cast("int").alias("n_anchor_forms"),
        )
        .filter(F.col("rn") == 1)
        .select(
            "url",
            "n_inlinks",
            "n_anchor_forms",
            F.col("text").alias("top_anchor"),
            F.col("cnt").alias("top_anchor_count"),
        )
    )


def corpus_anchor_rows(spec) -> list[tuple[str, str, str]]:
    """Pure enumeration of (src, dst, text) for the synthetic corpus —
    MUST stay in lockstep with corpus.CorpusSpec.list_html (gated by
    tests/test_webtext.py::test_corpus_anchor_rows_match_parse). Used by
    the oracle only; the operator parses the real HTML."""
    from ..spark.corpus import _h

    rows: list[tuple[str, str, str]] = []
    for h in range(spec.n_hosts):
        base = spec.host_base(h)
        np_ = spec.list_pages_of(h)
        for p in range(np_):
            src = f"{base}/list/{p}"
            for i in range(spec.items_per_page):
                rows.append((src, f"{base}/item/{p}-{i}", spec.item_title(h, p, i)))
            if p + 1 < np_:
                rows.append((src, f"{base}/list/{p + 1}", "Next"))
            sidebar = sorted({0, (p * 7 + 3) % np_, (p * 13 + 1) % np_,
                              _h(spec.seed, "sb", h, p) % np_})
            rows += [(src, f"{base}/list/{j}", f"archive {j}") for j in sidebar]
            cross = spec.host_base(
                (h + 1 + _h(spec.seed, "x", h, p) % max(1, spec.n_hosts - 1))
                % spec.n_hosts
            )
            rows.append((src, f"{cross}/list/0", "elsewhere"))
            if spec.host_disallows_private(h):
                rows.append((src, f"{base}/private/admin", "admin"))
    return rows
