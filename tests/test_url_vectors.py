"""URL-resolution parity vectors (F4) — from the reference's own
``/root/reference/scrape/scrape_test.go:547-696`` (relative path, absolute,
query-only ``?bli=bla``, same-dir file, ``../`` parent-dir cases) — Go's
url.ResolveReference vs Python urljoin divergence is the named risk."""

from __future__ import annotations

import pytest

from goskyr_spark.config.model import ElementLocation, Field
from goskyr_spark.extract.record import PageDoc, extract_field

CASES = [
    # (html, selector, base_url, expected __Aurl)
    (
        '<div class="event-teaser-top"><a href="/events/10-03-2023-krachstock-final-story"'
        ' class="event-date size-m bold">Fr, 10.03.2023 - 20:00</a></div>',
        "a.event-date",
        "https://www.dachstock.ch/events",
        "https://www.dachstock.ch/events/10-03-2023-krachstock-final-story",
    ),
    (
        '<h2><a href="https://www.eventfabrik-muenchen.de/event/heinz-rudolf-kunze-verstaerkung-2/" title="x">A</a></h2>',
        "h2 > a",
        "https://www.eventfabrik-muenchen.de/events?s=&tribe_events_cat=konzert&tribe_events_venue=&tribe_events_month=",
        "https://www.eventfabrik-muenchen.de/event/heinz-rudolf-kunze-verstaerkung-2/",
    ),
    (
        '<h2><a href="?bli=bla" title="q">A</a></h2>',
        "h2 > a",
        "https://www.eventfabrik-muenchen.de/events?s=&tribe_events_cat=konzert&tribe_events_venue=&tribe_events_month=",
        "https://www.eventfabrik-muenchen.de/events?bli=bla",
    ),
    (
        '<div><a href="programm.php?m=4&j=2023&vid=4378">x</a></div>',
        "div > a",
        "https://www.roxy.ulm.de/programm/programm.php",
        "https://www.roxy.ulm.de/programm/programm.php?m=4&j=2023&vid=4378",
    ),
    (
        '<h2><a href="../site/event/id/165">x</a></h2>',
        "h2 > a",
        "http://point11.ch/site/home",
        "http://point11.ch/site/event/id/165",
    ),
]


@pytest.mark.parametrize("html,selector,base,want", CASES, ids=[c[3] for c in CASES])
def test_url_resolution_vectors(html, selector, base, want):
    doc = PageDoc(base, f"<html><body>{html}</body></html>")
    f = Field(name="url", type="url", location=[ElementLocation(selector=selector)])
    rec: dict = {}
    extract_field(f, rec, [doc.tree], base, 0)
    assert rec["url__Aurl"] == want
