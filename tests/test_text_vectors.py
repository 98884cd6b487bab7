"""F1 text-extraction separator vectors — the reference's own unit tests
(``/root/reference/scrape/scrape_test.go:418-545``): \\x1e between
matched nodes, \\x1f between element siblings in entire_subtree mode,
regex extract, against the dachstock fixture html verbatim."""

from __future__ import annotations

from goskyr_spark.config.model import ElementLocation, Field, RegexConfig
from goskyr_spark.extract.record import PageDoc, extract_field

HTML = """
                            <div class="teaser event-teaser teaser-border teaser-hover">
                                <div class="event-teaser-image event-teaser-image--full"><a
                                        href="/events/10-03-2023-krachstock-final-story" class=""><!--[--><img
                                            src="data:image/gif;base64,R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAIBRAA7"
                                            class="image image--event_teaser v-lazy-image"><!--]--><!----></a>
                                    <div class="event-tix"><a class="button"
                                            href="https://www.petzi.ch/events/51480/tickets" target="_blank"
                                            rel="nofollow">Tickets</a></div>
                                </div>
                                <div class="event-teaser-info">
                                    <div class="event-teaser-top"><a href="/events/10-03-2023-krachstock-final-story"
                                            class="event-date size-m bold">Fr, 10.03.2023 - 20:00</a></div><a
                                        href="/events/10-03-2023-krachstock-final-story" class="event-teaser-bottom">
                                        <div class="size-xl event-title">Krachstock</div>
                                        <div class="artist-list"><!--[-->
                                            <h3 class="size-xxl"><!--[-->
                                                <div class="artist-teaser">
                                                    <div class="artist-name">Final Story</div>
                                                    <div class="artist-info">Aargau</div>
                                                </div><!----><!--]-->
                                            </h3>
                                            <h3 class="size-xxl"><!--[-->
                                                <div class="artist-teaser">
                                                    <div class="artist-name">Moment Of Madness</div>
                                                    <div class="artist-info">Basel</div>
                                                </div><!----><!--]-->
                                            </h3>
                                            <h3 class="size-xxl"><!--[-->
                                                <div class="artist-teaser">
                                                    <div class="artist-name">Irony of Fate</div>
                                                    <div class="artist-info">Bern</div>
                                                </div><!----><!--]-->
                                            </h3><!--]--><!---->
                                        </div><!---->
                                        <div class="event-teaser-tags"><!--[-->
                                            <div class="tag">Konzert</div><!--]--><!--[-->
                                            <div class="tag">Metal</div>
                                            <div class="tag">Metalcore</div><!--]-->
                                        </div>
                                    </a>
                                </div>
                            </div>"""


def _extract(field: Field) -> dict:
    doc = PageDoc("", HTML)
    rec: dict = {}
    extract_field(field, rec, [doc.tree], "", 0)
    return rec


def test_extract_field_text_record_separator():
    rec = _extract(Field(name="title", location=[ElementLocation(selector=".artist-name")]))
    assert rec["title"] == "Final Story\x1eMoment Of Madness\x1eIrony of Fate"


def test_extract_field_text_entire_subtree_unit_separators():
    rec = _extract(
        Field(name="title", location=[ElementLocation(selector=".artist-teaser", entire_subtree=True)])
    )
    assert rec["title"] == (
        "Final Story\x1f\n Aargau\x1f\x1eMoment Of Madness\x1f\n Basel\x1f\x1eIrony of Fate\x1f\n Bern\x1f"
    )


def test_extract_field_text_all_nodes():
    rec = _extract(
        Field(name="title", location=[ElementLocation(selector=".artist-name", all_nodes=True)])
    )
    assert rec["title"] == "Final Story\x1eMoment Of Madness\x1eIrony of Fate"


def test_extract_field_text_regex():
    rec = _extract(
        Field(
            name="time",
            location=[
                ElementLocation(
                    selector="a.event-date",
                    regex_extract=RegexConfig(exp=r"[0-9]{2}:[0-9]{2}", index=0),
                )
            ],
        )
    )
    assert rec["time"] == "20:00"


RICH = """
<div class="event-page">
\t<h1 class="event-title">Weekend Retreat</h1>
\t<div class="event-description">
\t\t<p>Join us for a <strong>transformative weekend</strong> exploring the Enneagram.</p>
\t\t<p>What to bring:</p>
\t\t<ul>
\t\t\t<li>Journal and pen</li>
\t\t\t<li>Comfortable clothing</li>
\t\t</ul>
\t\t<p>Visit <a href="https://example.com/venue">our venue</a> for directions.</p>
\t\t<p><img src="retreat.jpg" alt="Retreat photo">Beautiful setting.</p>
\t</div>
\t<div class="event-summary">A weekend retreat for exploring the Enneagram.</div>
</div>"""


def _html_string(selector: str, html: str = RICH) -> str:
    from goskyr_spark.extract.text import get_html_string

    doc = PageDoc("", html)
    return get_html_string(ElementLocation(selector=selector), [doc.tree])


def test_get_html_string_rich():
    """scrape_test.go:1095-1121: inner HTML with tags preserved."""
    s = _html_string(".event-description")
    assert "<strong>" in s
    assert "<ul>" in s
    assert 'href="https://example.com/venue"' in s
    assert "<img" in s


def test_get_html_string_empty_and_plain():
    assert _html_string(".nonexistent") == ""
    assert _html_string(".event-summary") == "A weekend retreat for exploring the Enneagram."


def test_get_html_string_multiple_nodes_skip_empty():
    """scrape_test.go:1163-1196: all matched nodes joined with <br>,
    empty leading <p> skipped."""
    html = """<div class="wrapper">
\t\t<div class="content">
\t\t\t<p></p>
\t\t\t<p>First paragraph with <strong>bold</strong> text.</p>
\t\t\t<p>Second paragraph.</p>
\t\t</div>
\t</div>"""
    s = _html_string("div.content p", html)
    assert "First paragraph" in s and "Second paragraph" in s
    assert "<strong>bold</strong>" in s
    assert "<br>" in s  # HTMLNodeSeparator between parts
