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
