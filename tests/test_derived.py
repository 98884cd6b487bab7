"""Derived-field parity (F13) — every vector from the reference's own
``/root/reference/scrape/template_test.go`` (432 LoC, 5 test funcs).
Golden configs never exercise derived fields, so this is F13's gate."""

from __future__ import annotations

import pytest

from goskyr_spark.config.model import DerivedField, DerivedOutput, OutputCondition
from goskyr_spark.extract.derived import (
    apply_derived_fields,
    evaluate_condition,
    parse_regex_input,
    parse_template_input,
    parse_template_pattern,
)

PATTERN_CASES = [
    ("{name}", ["name"], "", False),
    ("{title} | {date}", ["title", "date"], " | ", False),
    ("{name} | {location} | {date}", ["name", "location", "date"], " | ", False),
    ("{title} - {subtitle}", ["title", "subtitle"], " - ", False),
    ("{label}: {value}", ["label", "value"], ": ", False),
    ("{a} | {b} - {c}", None, None, True),
    ("just text", None, None, True),
]


@pytest.mark.parametrize("tpl,syms,delim,err", PATTERN_CASES, ids=[c[0] for c in PATTERN_CASES])
def test_parse_template_pattern(tpl, syms, delim, err):
    if err:
        with pytest.raises(Exception):
            parse_template_pattern(tpl)
        return
    got_syms, got_delim = parse_template_pattern(tpl)
    assert got_syms == syms and got_delim == delim


INPUT_CASES = [
    (["name"], "", "John Doe", {"name": "John Doe"}),
    (["title", "date"], " | ", "Workshop Title | March 15, 2025",
     {"title": "Workshop Title", "date": "March 15, 2025"}),
    (["name", "location", "date"], " | ", "Event Name | VIRTUAL | February 2, 2026",
     {"name": "Event Name", "location": "VIRTUAL", "date": "February 2, 2026"}),
    (["name", "rest"], " | ", "Part1 | Part2 | Part3 | Part4",
     {"name": "Part1", "rest": "Part2 | Part3 | Part4"}),
    (["a", "b", "c"], " | ", "Only One", {"a": "Only One", "b": "", "c": ""}),
    (["title", "date"], " | ", "  Title  |  Date  ", {"title": "Title", "date": "Date"}),
]


@pytest.mark.parametrize("syms,delim,inp,want", INPUT_CASES, ids=[c[2] for c in INPUT_CASES])
def test_parse_template_input(syms, delim, inp, want):
    got = parse_template_input(syms, delim, inp)
    for k, v in want.items():
        assert got.get(k, "") == v, (k, got)


REGEX_CASES = [
    (r"(?P<sponsor>.*?) Based In: (?P<location>.*)", "John Smith Based In: New York",
     {"sponsor": "John Smith", "location": "New York"}),
    (r"(?i)Sponsored\s+By[:\s]+(?P<sponsor>.+?)(?:\s*Based\s+In|$)",
     "Sponsored By: Acme Corp Based In: Chicago", {"sponsor": "Acme Corp"}),
    (r"(?P<title>\d+)", "no numbers here", {}),
]


@pytest.mark.parametrize("rx,inp,want", REGEX_CASES, ids=[c[1] for c in REGEX_CASES])
def test_parse_regex_input(rx, inp, want):
    got = parse_regex_input(rx, inp)
    assert {k: got.get(k, "") for k in want} == want
    if not want:
        assert got == {}


def test_output_condition_evaluate():
    assert evaluate_condition(None, "anything")
    assert evaluate_condition(OutputCondition(equals="VIRTUAL", case_insensitive=True), "virtual")
    assert evaluate_condition(OutputCondition(equals="VIRTUAL"), "VIRTUAL")
    assert not evaluate_condition(OutputCondition(equals="VIRTUAL"), "NYC")
    assert evaluate_condition(OutputCondition(not_equals="VIRTUAL"), "NYC")
    assert not evaluate_condition(OutputCondition(not_equals="VIRTUAL"), "VIRTUAL")
    assert evaluate_condition(OutputCondition(matches=r"\d+"), "abc123")
    assert not evaluate_condition(OutputCondition(matches=r"\d+"), "abc")
    assert evaluate_condition(OutputCondition(not_matches=r"\d+"), "abc")


def test_apply_derived_fields_vectors():
    # simple template extraction
    rec = {"raw_title": "Workshop | March 15, 2025"}
    apply_derived_fields(
        [DerivedField(source="raw_title", template="{name} | {date}", outputs=[
            DerivedOutput(symbol="name", target="name"),
            DerivedOutput(symbol="date", target="datetime_ranges.text"),
        ])], rec)
    assert rec == {"raw_title": "Workshop | March 15, 2025", "name": "Workshop",
                   "datetime_ranges.text": "March 15, 2025"}

    # conditional output with value override
    rec = {"raw_title": "Event | VIRTUAL"}
    apply_derived_fields(
        [DerivedField(source="raw_title", template="{name} | {location}", outputs=[
            DerivedOutput(symbol="name", target="name"),
            DerivedOutput(symbol="location", target="virtual_locations.text",
                          condition=OutputCondition(equals="VIRTUAL"), value="Online"),
        ])], rec)
    assert rec["virtual_locations.text"] == "Online" and rec["name"] == "Event"

    # conditional output not matching → other branch fires
    rec = {"raw_title": "Event | New York"}
    apply_derived_fields(
        [DerivedField(source="raw_title", template="{name} | {location}", outputs=[
            DerivedOutput(symbol="name", target="name"),
            DerivedOutput(symbol="location", target="virtual_locations.text",
                          condition=OutputCondition(equals="VIRTUAL"), value="Online"),
            DerivedOutput(symbol="location", target="locations.text",
                          condition=OutputCondition(not_equals="VIRTUAL")),
        ])], rec)
    assert "virtual_locations.text" not in rec
    assert rec["locations.text"] == "New York"

    # regex extraction
    rec = {"content": "Sponsored By: Acme Corp Based In: Chicago"}
    apply_derived_fields(
        [DerivedField(source="content",
                      regex=r"Sponsored By: (?P<sponsor>.+?) Based In: (?P<location>.+)$",
                      outputs=[
                          DerivedOutput(symbol="sponsor", target="sponsor"),
                          DerivedOutput(symbol="location", target="location"),
                      ])], rec)
    assert rec["sponsor"] == "Acme Corp" and rec["location"] == "Chicago"

    # missing source field: no error, no outputs
    rec = {"other": "x"}
    apply_derived_fields(
        [DerivedField(source="content", template="{a} | {b}", outputs=[
            DerivedOutput(symbol="a", target="a"),
        ])], rec)
    assert rec == {"other": "x"}
