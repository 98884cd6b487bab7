"""Config → YAML serializer byte-compatible with the reference's
``Config.String()`` (``/root/reference/scrape/scrape.go:179-187``, go-yaml
v3 Marshal of the tagged structs).

Field order and omitempty rules follow the struct tags
(``scrape/scrape.go:89-530``); indentation follows go-yaml v3's emitter
(4-space at document level, 2-space inside block-sequence items), as
observed across every golden config under
``/root/reference/testdata/*/*_configs/*.yml`` — the round-trip test
(tests/test_generate_golden.py) parses each golden and re-emits it
byte-identically.
"""

from __future__ import annotations

import re

from ..config.model import Config, ElementLocation, Field, Paginator, Scraper

_PLAIN_OK_RE = re.compile(r"^[^\s\-?:,\[\]{}#&*!|>'\"%@`][^\n]*$")
_BOOLISH = {"true", "false", "null", "~", "yes", "no", "on", "off", ""}
_NUMBERISH = re.compile(r"^[-+]?(\d+\.?\d*|\.\d+)([eE][-+]?\d+)?$")


def scalar(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, int):
        return str(v)
    s = str(v)
    if s == "":
        return '""'
    if (
        _PLAIN_OK_RE.match(s)
        and ": " not in s
        and " #" not in s
        and not s.endswith(":")
        and s.lower() not in _BOOLISH
        and not _NUMBERISH.match(s)
        and not s.endswith(" ")
    ):
        return s
    if "\n" in s or any(ord(c) < 0x20 for c in s):
        return '"' + s.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n") + '"'
    return "'" + s.replace("'", "''") + "'"


class _W:
    def __init__(self):
        self.lines: list[str] = []

    def kv(self, indent: int, key: str, v) -> None:
        self.lines.append(" " * indent + key + ": " + scalar(v))

    def key(self, indent: int, key: str) -> None:
        self.lines.append(" " * indent + key + ":")

    def raw(self, s: str) -> None:
        self.lines.append(s)


def _location_items(loc: ElementLocation) -> list[tuple[str, object]]:
    """ElementLocation tag order (scrape.go:274-286), omitempty."""
    out = []
    if loc.selector:
        out.append(("selector", loc.selector))
    if loc.json_selector:
        out.append(("json_selector", loc.json_selector))
    if loc.child_index:
        out.append(("child_index", loc.child_index))
    if loc.regex_extract.exp or loc.regex_extract.index:
        out.append(("regex_extract", [("exp", loc.regex_extract.exp), ("index", loc.regex_extract.index)]))
    if loc.attr:
        out.append(("attr", loc.attr))
    if loc.max_length:
        out.append(("max_length", loc.max_length))
    if loc.entire_subtree:
        out.append(("entire_subtree", True))
    if loc.all_nodes:
        out.append(("all_nodes", True))
    if loc.separator:
        out.append(("separator", loc.separator))
    if loc.node_separator:
        out.append(("node_separator", loc.node_separator))
    if loc.strip_tags:
        out.append(("strip_tags", True))
    if loc.collapse_spaces:
        out.append(("collapse_spaces", True))
    if loc.until_selector:
        out.append(("until_selector", loc.until_selector))
    return out


def _emit_items(w: _W, indent: int, items, first_prefix: str | None = None) -> None:
    """Emit key/value pairs; nested list-of-pairs become nested maps."""
    first = True
    for k, v in items:
        pre = first_prefix if (first and first_prefix is not None) else " " * indent
        if isinstance(v, list) and v and isinstance(v[0], tuple):
            w.raw(pre + k + ":")
            _emit_items(w, indent + 2, v)
        else:
            w.raw(pre + k + ": " + scalar(v))
        first = False


def _emit_seq_of_maps(w: _W, key_indent: int, key: str, maps: list[list[tuple]]) -> None:
    """`key:` then block-sequence items at key_indent+2 (go-yaml v3 inside
    a sequence item)."""
    w.key(key_indent, key)
    dash = key_indent + 2
    for items in maps:
        if not items:
            w.raw(" " * dash + "- {}")
            continue
        _emit_items(w, dash + 2, items, first_prefix=" " * dash + "- ")


def _field_items(f: Field) -> list[tuple]:
    out: list[tuple] = [("name", f.name)]
    if f.value:
        out.append(("value", f.value))
    if f.type:
        out.append(("type", f.type))
    # subfields `fields` handled by caller (nested seq); generation never emits them
    if f.default:
        out.append(("default", f.default))
    if f.on_detail_page:
        out.append(("on_detail_page", f.on_detail_page))
    if f.required:
        out.append(("required", True))
    if f.date_location:
        out.append(("date_location", f.date_location))
    if f.date_language:
        out.append(("date_language", f.date_language))
    if f.hide:
        out.append(("hide", True))
    if f.guess_year:
        out.append(("guess_year", True))
    if f.strip_tags:
        out.append(("strip_tags", True))
    if f.collapse_spaces:
        out.append(("collapse_spaces", True))
    return out


def write_config_to_dir(c: Config, out_dir: str) -> None:
    """Config.WriteToFile (scrape.go:191-203): ``<ID>.yml`` plus
    ``<ID>_<n>.json`` when records are attached (S10)."""
    import json
    import os

    os.makedirs(out_dir, exist_ok=True)
    cid = str(c.id)
    with open(os.path.join(out_dir, cid + ".yml"), "w", encoding="utf-8") as fh:
        fh.write(dump_config(c))
    recs = getattr(c, "records", None)
    if recs:
        from .configs import records_string

        with open(
            os.path.join(out_dir, f"{cid}_{len(recs)}.json"), "w", encoding="utf-8"
        ) as fh:
            fh.write(records_string(recs))


def dump_config(c: Config) -> str:
    """Byte-parity with the golden ``.yml`` layout."""
    w = _W()
    w.key(0, "id")
    w.kv(4, "slug", c.id.slug)
    w.kv(4, "id", c.id.id)
    w.kv(4, "field", c.id.field)
    w.kv(4, "subid", c.id.subid)
    if c.scrapers:
        w.key(0, "scrapers")
        for s in c.scrapers:
            _emit_scraper(w, s)
    w.raw("records: []")
    return "\n".join(w.lines) + "\n"


def _emit_scraper(w: _W, s: Scraper) -> None:
    # Scraper tag order (scrape.go:505-526): interaction is declared
    # FIRST in the Go struct, so go-yaml emits it before name; the
    # generation pipeline never produces one, but a hand-written config
    # carrying interactions must round-trip losslessly (warn-and-keep,
    # never silently dropped — config/model.py Interaction).
    base = 6
    if s.interaction:
        w.raw("    - interaction:")
        dash = base + 2
        for ia in s.interaction:
            items = [
                (k, v)
                for k, v in (("type", ia.type), ("selector", ia.selector),
                             ("count", ia.count), ("delay", ia.delay))
                if v
            ]
            _emit_items(w, dash + 2, items, first_prefix=" " * dash + "- ")
        w.kv(base, "name", s.name)
    else:
        w.raw("    - name: " + scalar(s.name))
    if s.render_js:
        w.kv(base, "render_js", True)
    w.kv(base, "selector", s.selector)
    if s.strategy:
        w.kv(base, "strategy", s.strategy)
    w.kv(base, "url", s.url)
    if s.validation and s.validation.requires_cta_selector:
        w.key(base, "validation")
        w.kv(base + 2, "requires_cta_selector", s.validation.requires_cta_selector)
    if s.fields:
        field_maps = []
        for f in s.fields:
            items = _field_items(f)
            # insert location after type (tag order: name, value, type, fields, location, ...)
            locs = [_location_items(loc) for loc in f.location] if f.location else None
            if locs is not None:
                # find position after 'type'/'value'/'name'
                pos = len([1 for k, _ in items if k in ("name", "value", "type")])
                items = items[:pos] + [("__location__", locs)] + items[pos:]
            field_maps.append(items)
        w.key(base, "fields")
        dash = base + 2
        for items in field_maps:
            first = True
            for k, v in items:
                pre = (" " * dash + "- ") if first else " " * (dash + 2)
                if k == "__location__":
                    w.raw(pre + "location:")
                    for loc_items in v:
                        if not loc_items:
                            w.raw(" " * (dash + 4) + "- {}")
                        else:
                            _emit_items(w, dash + 6, loc_items, first_prefix=" " * (dash + 4) + "- ")
                else:
                    w.raw(pre + k + ": " + scalar(v))
                first = False
    if s.filters:
        raise NotImplementedError("filter serialization not exercised by generation")
    if s.paginators:
        pag_maps = []
        for p in s.paginators:
            items: list[tuple] = []
            li = _location_items(p.location)
            if li:
                items.append(("location", li))
            if p.max_pages:
                items.append(("max_pages", p.max_pages))
            pag_maps.append(items)
        _emit_seq_of_maps(w, base, "paginators", pag_maps)
    if s.merge_key:
        w.kv(base, "merge_key", s.merge_key)
