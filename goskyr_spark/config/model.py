"""Scraper-config data model (the declarative "query plan").

YAML-compatible with the reference's config schema:

* ``Config``      — ``/root/reference/scrape/scrape.go:89-95``
* ``ConfigID``    — ``/root/reference/scrape/scrape.go:97-148``
* ``Scraper``     — ``/root/reference/scrape/scrape.go:504-527``
* ``Field``       — ``/root/reference/scrape/scrape.go:320-340``
* ``ElementLocation`` — ``/root/reference/scrape/scrape.go:273-287``
  (scalar-or-list unmarshal: ``/root/reference/scrape/scrape.go:346-360``)
* ``Filter``      — ``/root/reference/scrape/scrape.go:366-376,431-473``
* ``Paginator``   — ``/root/reference/scrape/scrape.go:476-479``
* ``DerivedField``— ``/root/reference/scrape/template.go``

Configs are small; a parsed ``Config`` is broadcast to executors and the
extraction pandas UDF interprets it per page.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field
from datetime import datetime, timezone

import yaml


@dataclass
class RegexConfig:
    exp: str = ""
    index: int = 0

    @classmethod
    def from_dict(cls, d):
        if not d:
            return cls()
        return cls(exp=d.get("exp", "") or "", index=int(d.get("index", 0) or 0))


@dataclass
class TransformConfig:
    type: str = ""
    regex: str = ""
    replace: str = ""

    @classmethod
    def from_dict(cls, d):
        return cls(
            type=d.get("type", "") or "",
            regex=d.get("regex", "") or "",
            replace=d.get("replace", "") or "",
        )


@dataclass
class ElementLocation:
    selector: str = ""
    json_selector: str = ""
    child_index: int = 0
    regex_extract: RegexConfig = dc_field(default_factory=RegexConfig)
    attr: str = ""
    max_length: int = 0
    entire_subtree: bool = False
    all_nodes: bool = False
    separator: str = ""
    node_separator: str = ""
    strip_tags: bool = False
    collapse_spaces: bool = False
    until_selector: str = ""

    @classmethod
    def from_dict(cls, d):
        if d is None:
            d = {}
        return cls(
            selector=d.get("selector", "") or "",
            json_selector=d.get("json_selector", "") or "",
            child_index=int(d.get("child_index", 0) or 0),
            regex_extract=RegexConfig.from_dict(d.get("regex_extract")),
            attr=d.get("attr", "") or "",
            max_length=int(d.get("max_length", 0) or 0),
            entire_subtree=bool(d.get("entire_subtree", False)),
            all_nodes=bool(d.get("all_nodes", False)),
            separator=d.get("separator", "") or "",
            node_separator=d.get("node_separator", "") or "",
            strip_tags=bool(d.get("strip_tags", False)),
            collapse_spaces=bool(d.get("collapse_spaces", False)),
            until_selector=d.get("until_selector", "") or "",
        )

    def to_dict(self):
        d = {}
        if self.selector:
            d["selector"] = self.selector
        if self.attr:
            d["attr"] = self.attr
        if self.child_index:
            d["child_index"] = self.child_index
        if self.entire_subtree:
            d["entire_subtree"] = True
        if self.all_nodes:
            d["all_nodes"] = True
        if self.regex_extract.exp:
            d["regex_extract"] = {"exp": self.regex_extract.exp, "index": self.regex_extract.index}
        if self.max_length:
            d["max_length"] = self.max_length
        return d


def _locations_from_yaml(v) -> list[ElementLocation]:
    """ElementLocations unmarshals from a scalar mapping or a list
    (``/root/reference/scrape/scrape.go:346-360``)."""
    if v is None:
        return []
    if isinstance(v, dict):
        return [ElementLocation.from_dict(v)]
    return [ElementLocation.from_dict(x) for x in v]


@dataclass
class Field:
    name: str = ""
    value: str = ""
    type: str = ""  # '' == text
    fields: list["Field"] = dc_field(default_factory=list)
    location: list[ElementLocation] = dc_field(default_factory=list)
    default: str = ""
    on_detail_page: str = ""
    required: bool = False
    date_location: str = ""
    date_language: str = ""
    hide: bool = False
    guess_year: bool = False
    transform: list[TransformConfig] = dc_field(default_factory=list)
    strip_tags: bool = False
    collapse_spaces: bool = False

    @classmethod
    def from_dict(cls, d):
        return cls(
            name=d.get("name", "") or "",
            value=d.get("value", "") or "",
            type=d.get("type", "") or "",
            fields=[cls.from_dict(x) for x in d.get("fields", []) or []],
            location=_locations_from_yaml(d.get("location")),
            default=d.get("default", "") or "",
            on_detail_page=d.get("on_detail_page", "") or "",
            required=bool(d.get("required", False)),
            date_location=d.get("date_location", "") or "",
            date_language=d.get("date_language", "") or "",
            hide=bool(d.get("hide", False)),
            guess_year=bool(d.get("guess_year", False)),
            transform=[TransformConfig.from_dict(x) for x in d.get("transform", []) or []],
            strip_tags=bool(d.get("strip_tags", False)),
            collapse_spaces=bool(d.get("collapse_spaces", False)),
        )

    def to_dict(self):
        d = {"name": self.name}
        if self.type:
            d["type"] = self.type
        if self.value:
            d["value"] = self.value
        if self.location:
            d["location"] = [loc.to_dict() for loc in self.location]
        if self.fields:
            d["fields"] = [f.to_dict() for f in self.fields]
        return d


@dataclass
class Filter:
    field: str = ""
    exp: str = ""
    match: bool = False
    condition: str = ""
    case_insensitive: bool = False
    # initialized state (Filter.Initialize, scrape.go:431-473)
    type: str = ""
    regex: re.Pattern | None = None
    date_comp: datetime | None = None
    date_op: str = ""

    @classmethod
    def from_dict(cls, d):
        return cls(
            field=d.get("field", "") or "",
            exp=d.get("exp", "") or "",
            match=bool(d.get("match", False)),
            condition=d.get("condition", "") or "",
            case_insensitive=bool(d.get("case_insensitive", False)),
        )

    def initialize(self, field_type: str, now=None):
        if field_type == "date":
            self.type = "date"
            tokens = self.exp.split(" ")
            if len(tokens) != 2 or tokens[0] not in (">", "<"):
                raise ValueError(
                    "the expression for filtering by date should be of the "
                    "following format: '<|> now|YYYY-MM-ddTHH:mm'"
                )
            self.date_op = tokens[0]
            if tokens[1] != "now":
                self.date_comp = datetime.strptime(tokens[1], "%Y-%m-%dT%H:%M")
            else:
                self.date_comp = now or datetime.now(timezone.utc).replace(tzinfo=None)
        else:
            self.type = "regex"
            pattern = self.exp
            if self.case_insensitive:
                pattern = "(?i)" + pattern
            self.regex = re.compile(pattern)

    def filter_match(self, value) -> bool:
        if self.type == "regex":
            return bool(self.regex.search(str(value)))
        if self.type == "date":
            if not isinstance(value, datetime):
                value = datetime.min
            if self.date_op == ">":
                return value > self.date_comp
            return value < self.date_comp
        return False


@dataclass
class Paginator:
    location: ElementLocation = dc_field(default_factory=ElementLocation)
    max_pages: int = 0

    @classmethod
    def from_dict(cls, d):
        loc = d.get("location")
        return cls(
            location=ElementLocation.from_dict(loc if isinstance(loc, dict) else (loc[0] if loc else None)),
            max_pages=int(d.get("max_pages", 0) or 0),
        )


@dataclass
class OutputCondition:
    """/root/reference/scrape/template.go:33-43"""

    equals: str = ""
    not_equals: str = ""
    matches: str = ""
    not_matches: str = ""
    case_insensitive: bool = False

    @classmethod
    def from_dict(cls, d):
        if not d:
            return None
        return cls(
            equals=d.get("equals", "") or "",
            not_equals=d.get("not_equals", "") or "",
            matches=d.get("matches", "") or "",
            not_matches=d.get("not_matches", "") or "",
            case_insensitive=bool(d.get("case_insensitive", False)),
        )


@dataclass
class DerivedOutput:
    """/root/reference/scrape/template.go:25-30"""

    symbol: str = ""
    target: str = ""
    condition: OutputCondition | None = None
    value: str = ""

    @classmethod
    def from_dict(cls, d):
        return cls(
            symbol=d.get("symbol", "") or "",
            target=d.get("target", "") or "",
            condition=OutputCondition.from_dict(d.get("condition")),
            value=d.get("value", "") or "",
        )


@dataclass
class DerivedField:
    """/root/reference/scrape/template.go:10-22"""

    source: str = ""
    template: str = ""       # "{a} | {b}" delimiter-based
    regex: str = ""          # named-group regex alternative
    outputs: list[DerivedOutput] = dc_field(default_factory=list)

    # legacy alias used by extract.derived
    @property
    def pattern(self) -> str:
        return self.template

    @classmethod
    def from_dict(cls, d):
        return cls(
            source=d.get("source", "") or "",
            template=d.get("template", "") or "",
            regex=d.get("regex", "") or "",
            outputs=[DerivedOutput.from_dict(x) for x in d.get("outputs", []) or []],
        )


@dataclass
class ValidationConfig:
    requires_cta_selector: str = ""

    @classmethod
    def from_dict(cls, d):
        if not d:
            return cls()
        return cls(requires_cta_selector=d.get("requires_cta_selector", "") or "")


@dataclass
class Interaction:
    """Browser interaction surface (``/root/reference/fetch/fetcher.go:29-39``):
    parsed so a YAML using it fails LOUDLY instead of being silently
    ignored — this engine does not render JS (the reference's own tests
    never exercise it, ``cmd/goskyr/main_test.go:120-124``)."""

    type: str = ""  # 'click' | 'scroll'
    selector: str = ""
    count: int = 0
    delay: int = 0

    @classmethod
    def from_dict(cls, d):
        if not d:
            return cls()
        return cls(
            type=d.get("type", "") or "",
            selector=d.get("selector", "") or "",
            count=int(d.get("count", 0) or 0),
            delay=int(d.get("delay", 0) or 0),
        )


@dataclass
class Scraper:
    name: str = ""
    url: str = ""
    selector: str = ""
    strategy: str = ""  # '' / 'nested' / 'sequential'
    render_js: bool = False
    fields: list[Field] = dc_field(default_factory=list)
    filters: list[Filter] = dc_field(default_factory=list)
    paginators: list[Paginator] = dc_field(default_factory=list)
    derived_fields: list[DerivedField] = dc_field(default_factory=list)
    validation: ValidationConfig = dc_field(default_factory=ValidationConfig)
    merge_key: str = ""
    interaction: list[Interaction] = dc_field(default_factory=list)

    @classmethod
    def from_dict(cls, d):
        s = cls(
            name=d.get("name", "") or "",
            url=d.get("url", "") or "",
            selector=d.get("selector", "") or "",
            strategy=d.get("strategy", "") or "",
            render_js=bool(d.get("render_js", False)),
            fields=[Field.from_dict(x) for x in d.get("fields", []) or []],
            filters=[Filter.from_dict(x) for x in d.get("filters", []) or []],
            paginators=[Paginator.from_dict(x) for x in d.get("paginators", []) or []],
            derived_fields=[DerivedField.from_dict(x) for x in d.get("derived_fields", []) or []],
            validation=ValidationConfig.from_dict(d.get("validation")),
            merge_key=d.get("merge_key", "") or "",
            interaction=[Interaction.from_dict(x) for x in d.get("interaction", []) or []],
        )
        if s.interaction:
            import warnings

            warnings.warn(
                f"scraper {s.name or s.url!r} declares {len(s.interaction)} browser "
                "interaction(s) (click/scroll); this engine fetches statically and "
                "will NOT perform them — pages needing interaction will extract "
                "from the un-interacted DOM",
                stacklevel=2,
            )
        return s

    def initialize_filters(self, now=None):
        field_types = {f.name: f.type for f in self.fields}
        for f in self.filters:
            if f.field not in field_types:
                raise ValueError(f"filter error. There is no field with the name '{f.field}'")
            f.initialize(field_types[f.field], now=now)


@dataclass
class ConfigID:
    """Hierarchical config identity (``{slug}__{id}_{field}_{subid}``),
    string form at ``/root/reference/scrape/scrape.go:114-148``; compact
    mode (``WithCompact``/``compactConfigIDString``,
    ``scrape/scrape.go:106-162``) omits the URL-derived slug."""

    slug: str = ""
    id: str = ""
    field: str = ""
    subid: str = ""
    compact: bool = False

    def with_compact(self, v: bool) -> "ConfigID":
        return ConfigID(slug=self.slug, id=self.id, field=self.field,
                        subid=self.subid, compact=v)

    @classmethod
    def from_dict(cls, d):
        if not d:
            return cls()
        return cls(
            slug=d.get("slug", "") or "",
            id=d.get("id", "") or "",
            field=d.get("field", "") or "",
            subid=d.get("subid", "") or "",
        )

    def __str__(self) -> str:
        """ConfigID.String (scrape.go:114-148): '__' before the first
        present component, '_' between the rest; compact mode joins the
        non-slug parts with '-' lowercased (scrape.go:150-162)."""
        if self.compact:
            parts = [p for p in (self.id, self.field, self.subid) if p]
            return "-".join(parts).lower()
        r = self.slug
        sep = "__"
        for part in (self.id, self.field, self.subid):
            if part:
                r += sep + part
                sep = "_"
        return r


@dataclass
class Config:
    id: ConfigID = dc_field(default_factory=ConfigID)
    scrapers: list[Scraper] = dc_field(default_factory=list)

    @classmethod
    def from_dict(cls, d):
        return cls(
            id=ConfigID.from_dict(d.get("id")),
            scrapers=[Scraper.from_dict(x) for x in d.get("scrapers", []) or []],
        )

    @classmethod
    def from_yaml(cls, text: str) -> "Config":
        return cls.from_dict(yaml.safe_load(text))


def read_config(path: str) -> Config:
    with open(path, encoding="utf-8") as fh:
        return Config.from_yaml(fh.read())
