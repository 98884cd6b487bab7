"""Filter parity (P1-P3, P5) — the reference's unit vectors
(``/root/reference/scrape/scrape_test.go:259-417``)."""

from __future__ import annotations

from datetime import datetime

from goskyr_spark.config.model import Field, Filter, Scraper
from goskyr_spark.extract.record import keep_record, remove_hidden_fields


def _scraper(fields, filters):
    s = Scraper(fields=fields, filters=filters)
    s.initialize_filters()
    return s


def test_filter_record_match_true():
    s = _scraper(
        [Field(name="title")],
        [Filter(field="title", exp=".*Concert", match=True)],
    )
    assert keep_record(s, {"title": "Jacob Collier - Concert"})


def test_filter_record_match_false():
    s = _scraper(
        [Field(name="title")],
        [Filter(field="title", exp=".*Cancelled", match=False)],
    )
    assert not keep_record(s, {"title": "Jacob Collier - Cancelled"})


def test_filter_record_by_date_match_true():
    s = _scraper(
        [Field(name="date", type="date")],
        [Filter(field="date", exp="> 2023-10-20T19:00", match=True)],
    )
    assert keep_record(s, {"date": datetime(2023, 10, 20, 19, 1)})


def test_filter_record_by_date_boundary_excluded():
    s = _scraper(
        [Field(name="date", type="date")],
        [Filter(field="date", exp="> 2023-10-20T19:00", match=True)],
    )
    assert not keep_record(s, {"date": datetime(2023, 10, 20, 19, 0)})


def test_filter_record_by_date_match_false():
    s = _scraper(
        [Field(name="date", type="date")],
        [Filter(field="date", exp="> 2023-10-20T19:00", match=False)],
    )
    assert not keep_record(s, {"date": datetime(2023, 10, 20, 19, 1)})


def test_remove_hidden_fields():
    s = Scraper(fields=[Field(name="hidden", hide=True), Field(name="shown")])
    rec = remove_hidden_fields(s, {"hidden": "x", "shown": "y"})
    assert rec == {"shown": "y"}


def test_resolve_lazy_image_sources_vectors():
    """scrape_test.go:17-41."""
    from goskyr_spark.extract.record import PageDoc, resolve_lazy_image_sources

    html = """<html><body>
        <img id="lazy" src="data:image/gif;base64,R0lGODlh" data-sek-src="https://example.com/real.jpg">
        <img id="real" src="https://example.com/already.jpg" data-sek-src="https://example.com/other.jpg">
        <img id="inline" src="data:image/png;base64,AAAA">
        <img id="missing" data-src="https://example.com/fromdatasrc.jpg">
    </body></html>"""
    doc = PageDoc("https://example.com", html)
    resolve_lazy_image_sources(doc)
    want = {
        "lazy": "https://example.com/real.jpg",
        "real": "https://example.com/already.jpg",
        "inline": "data:image/png;base64,AAAA",
        "missing": "https://example.com/fromdatasrc.jpg",
    }
    for img_id, expected in want.items():
        (node,) = doc.find(f"#{img_id}")
        assert node.attrs.get("src") == expected, img_id


def test_paginator_max_pages_limit():
    """scrape_test.go:43-88: MaxPages=1 never fetches page 2."""
    from goskyr_spark.config.model import Config
    from goskyr_spark.extract.record import scrape_page

    yml = """
id:
  slug: example-com
  id: n01a
scrapers:
  - url: https://example.com/page-1
    selector: article
    fields:
      - name: title
        location:
          selector: h2
    paginators:
      - location:
          selector: a.next
          attr: href
        max_pages: 1
"""
    fetched = []

    def get_page(url):
        fetched.append(url)
        if url.endswith("page-1"):
            return ('<html><body><article><h2>First</h2></article>'
                    '<a class="next" href="/page-2">Next</a></body></html>')
        raise AssertionError(f"must not fetch {url}")

    cfg = Config.from_yaml(yml)
    recs = scrape_page(cfg, cfg.scrapers[0], get_page)
    assert len(recs) == 1 and recs[0]["title"] == "First"
    assert fetched == ["https://example.com/page-1"]
