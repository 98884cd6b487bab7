"""Nested-subfield / entity-split parity (F12) — the reference's unit
vectors (``/root/reference/scrape/scrape_test.go:1288-1541``)."""

from __future__ import annotations

from goskyr_spark.config.model import ElementLocation, Field
from goskyr_spark.extract.record import PageDoc, extract_subfields, merge_nested_field

HTML = """
<div class="event-card">
\t<h3 class="title">Weekend Workshop</h3>
\t<span class="date">2026-04-17</span>
\t<span class="cost">$295</span>
\t<a class="detail-link" href="/event/workshop-1">Details</a>
\t<a class="register-link" href="https://eventbrite.com/e/123">Register</a>
\t<div class="contact">
\t\t<span class="contact-name">Alice Smith</span>
\t\t<a class="contact-email" href="mailto:alice@example.com">alice@example.com</a>
\t\t<span class="contact-phone">555-1234</span>
\t</div>
</div>"""


def _nodes():
    return [PageDoc("https://example.com", HTML).tree]


def _f(name, selector=None, attr="", value="", fields=None):
    return Field(
        name=name,
        value=value,
        location=[ElementLocation(selector=selector, attr=attr)] if selector else [],
        fields=fields or [],
    )


def test_single_map():
    result = extract_subfields(
        [_f("raw_url", "a.detail-link", attr="href"), _f("role", value="detail")],
        _nodes(), "https://example.com",
    )
    assert result["raw_url"] == "/event/workshop-1"
    assert result["role"] == "detail"


def test_nested_map():
    result = extract_subfields(
        [_f("items", fields=[_f("raw_text", "h3.title")])], _nodes(), ""
    )
    assert result["items"]["raw_text"] == "Weekend Workshop"


def test_merge_nested_field_single_to_slice_and_third_append():
    rec: dict = {}
    merge_nested_field(rec, "links", {"raw_url": "url1", "role": "detail"})
    assert isinstance(rec["links"], dict)
    merge_nested_field(rec, "links", {"raw_url": "url2", "role": "registration"})
    assert isinstance(rec["links"], list) and len(rec["links"]) == 2
    assert rec["links"][0]["role"] == "detail"
    assert rec["links"][1]["role"] == "registration"
    merge_nested_field(rec, "links", {"raw_url": "url3"})
    assert [m.get("raw_url") for m in rec["links"]] == ["url1", "url2", "url3"]


def test_constant_only_and_multi_subfield():
    result = extract_subfields([_f("role", value="detail")], _nodes(), "")
    assert result["role"] == "detail"

    result = extract_subfields(
        [_f("contact", fields=[
            _f("name", "span.contact-name"),
            _f("email", "a.contact-email"),
            _f("phone", "span.contact-phone"),
        ])], _nodes(), "",
    )
    contact = result["contact"]
    assert contact["name"] == "Alice Smith"
    assert contact["email"] == "alice@example.com"
    assert contact["phone"] == "555-1234"


def test_constant_value_in_nested():
    result = extract_subfields(
        [_f("link", fields=[
            _f("raw_url", "a.detail-link", attr="href"),
            _f("role", value="detail"),
            _f("source", value="scraper"),
        ])], _nodes(), "",
    )
    link = result["link"]
    assert link["raw_url"] == "/event/workshop-1"
    assert link["role"] == "detail"
    assert link["source"] == "scraper"
