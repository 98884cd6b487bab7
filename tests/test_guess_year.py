"""guessYear parity — the reference's own unit vectors
(``/root/reference/scrape/scrape_test.go:886-1094``): year inference for
legacy date fields around year boundaries, unordered records, multi-year
spans, and a reference time after the first record."""

from __future__ import annotations

from datetime import datetime

from goskyr_spark.config.model import Field, Scraper
from goskyr_spark.extract.record import guess_year


def _scraper():
    return Scraper(fields=[Field(name="date", type="date", guess_year=True)])


def _dates(recs):
    return [r["date"] for r in recs]


def test_guess_year_simple():
    recs = [
        {"date": datetime(2023, 12, 2, 20, 30)},
        {"date": datetime(2023, 12, 24, 21, 30)},
        {"date": datetime(2023, 1, 2, 20, 0)},
    ]
    guess_year(_scraper(), recs, datetime(2023, 11, 30, 20, 30))
    assert _dates(recs) == [
        datetime(2023, 12, 2, 20, 30),
        datetime(2023, 12, 24, 21, 30),
        datetime(2024, 1, 2, 20, 0),
    ]


def test_guess_year_unordered():
    recs = [
        {"date": datetime(2023, 11, 2, 20, 30)},
        {"date": datetime(2023, 12, 14, 20, 30)},
        {"date": datetime(2023, 12, 2, 20, 30)},
        {"date": datetime(2023, 12, 24, 21, 30)},
        {"date": datetime(2023, 1, 2, 20, 0)},
    ]
    guess_year(_scraper(), recs, datetime(2023, 11, 1, 20, 30))
    assert _dates(recs) == [
        datetime(2023, 11, 2, 20, 30),
        datetime(2023, 12, 14, 20, 30),
        datetime(2023, 12, 2, 20, 30),
        datetime(2023, 12, 24, 21, 30),
        datetime(2024, 1, 2, 20, 0),
    ]


def test_guess_year_two_years():
    recs = [
        {"date": datetime(2023, 12, 2, 20, 30)},
        {"date": datetime(2023, 1, 14, 20, 30)},
        {"date": datetime(2023, 5, 2, 20, 30)},
        {"date": datetime(2023, 9, 24, 21, 30)},
        {"date": datetime(2023, 2, 2, 20, 0)},
    ]
    guess_year(_scraper(), recs, datetime(2023, 11, 1, 20, 30))
    assert _dates(recs) == [
        datetime(2023, 12, 2, 20, 30),
        datetime(2024, 1, 14, 20, 30),
        datetime(2024, 5, 2, 20, 30),
        datetime(2024, 9, 24, 21, 30),
        datetime(2025, 2, 2, 20, 0),
    ]


def test_guess_year_start_before_reference():
    recs = [
        {"date": datetime(2023, 12, 2, 20, 30)},
        {"date": datetime(2023, 12, 24, 21, 30)},
        {"date": datetime(2023, 1, 2, 20, 0)},
    ]
    guess_year(_scraper(), recs, datetime(2024, 1, 30, 20, 30))
    assert _dates(recs) == [
        datetime(2023, 12, 2, 20, 30),
        datetime(2023, 12, 24, 21, 30),
        datetime(2024, 1, 2, 20, 0),
    ]
