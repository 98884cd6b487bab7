"""F5 datetime vectors — the reference's unit tests
(``scrape_test.go:697-775``): dotted continental date with time + zone,
and ref-time-driven year resolution for year-less dates."""

from __future__ import annotations

from datetime import datetime, timezone

from goskyr_spark.config.model import ElementLocation, Field
from goskyr_spark.extract.record import PageDoc, extract_field


def _date_field():
    return Field(
        name="date",
        type="date_time_tz_ranges",
        location=[ElementLocation(selector="a.event-date")],
        date_location="Europe/Berlin",
    )


def _run(html: str, ref_time=None) -> str | None:
    doc = PageDoc("", f"<html><body>{html}</body></html>")
    rec: dict = {}
    extract_field(_date_field(), rec, [doc.tree], "", 0, ref_time=ref_time)
    return rec.get("date__Pdate_time_tz_ranges")


def test_dotted_dmy_with_time_berlin_zone():
    """scrape_test.go:697-735: 'Fr, 10.03.2023 - 20:00' → 2023-03-10
    20:00 Europe/Berlin (RFC3339-parseable)."""
    v = _run('<a class="event-date">Fr, 10.03.2023 - 20:00</a>')
    assert v is not None
    parsed = datetime.fromisoformat(v)
    want = datetime(2023, 3, 10, 20, 0, tzinfo=timezone.utc).astimezone()
    assert (parsed.year, parsed.month, parsed.day, parsed.hour) == (2023, 3, 10, 20)
    # March 10 is CET: +01:00
    assert v.endswith("+01:00"), v


def test_ref_time_drives_yearless_year():
    """scrape_test.go:737-775: the injected reference time resolves the
    year of '10 March 20:00' deterministically."""
    for year in (2030, 2020):
        v = _run('<a class="event-date">10 March 20:00</a>', ref_time=datetime(year, 1, 1))
        assert v is not None, year
        parsed = datetime.fromisoformat(v)
        assert (parsed.year, parsed.month, parsed.day) == (year, 3, 10), v
