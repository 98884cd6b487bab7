"""Record construction: document scrape, detail-page merge, pagination.

Re-implements (SURVEY §2.2):

* ``gq_document``   — ``GQDocument``    ``/root/reference/scrape/scrape.go:722-843``
* ``gq_selection``  — ``GQSelection``   ``/root/reference/scrape/scrape.go:1075-1196``
* ``extract_field`` — ``extractField``  ``/root/reference/scrape/scrape.go:1633-1803``
* ``scrape_sequential`` — ``scrapeSequential`` ``/root/reference/scrape/scrape.go:909-1047``
* ``scrape_page``   — ``Page``          ``/root/reference/scrape/scrape.go:565-680``
* ``detail_pages`` / ``sub_document`` — ``DetailPages``/``SubGQDocument``
  ``/root/reference/scrape/scrape.go:2327-2464``
* lazy-image repair — ``resolveLazyImageSources`` ``/root/reference/scrape/scrape.go:691-720``
* ``guess_year``    — ``/root/reference/scrape/scrape.go:1243-1291``

Pure functions of ``(html, config)``; the Spark layer wraps ``scrape_page``
/ ``gq_document`` in Arrow-batched pandas UDFs, and ``detail_pages``
becomes a left equi-join over a second extraction pass.
"""

from __future__ import annotations

import re
from datetime import datetime

from ..config.model import Config, Field, Scraper
from ..htmlx import css
from ..htmlx.parser import ELEMENT, Node, parse_html
from . import datetime_ranges as dtr
from .text import (
    FIELD_PART_SEPARATOR,
    HTML_PART_SEPARATOR,
    RECORD_SEPARATOR,
    ExtractError,
    extract_string_field,
    extract_string_regex,
    get_html_string,
    get_text_string,
    go_trim_space,
)
from .urlutil import (
    URLError,
    first_url_part,
    go_url_parse_check,
    normalize_visited_url,
    registrable_domain,
    resolve_url,
)

URL_FIELD_NAME = "Aurl"
URL_FIELD_SUFFIX = "__" + URL_FIELD_NAME
TITLE_FIELD_NAME = "Atitle"
DATETIME_FIELD_SUFFIX = "__Pdate_time_tz_ranges"

DATE_RE = re.compile(
    r"(?i)\b(20\d{2}|January|February|March|April|May|June|July|August|September|"
    r"October|November|December|Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec|"
    r"Monday|Tuesday|Wednesday|Thursday|Friday|Saturday|Sunday|Mon|Tue|Wed|Thu|Fri|Sat|Sun)\b"
)

LAZY_IMAGE_SRC_ATTRS = ("data-orig-src", "data-sek-src", "data-src", "data-lazy-src")


class PageDoc:
    """A parsed page (the reference's ``fetch.Document``)."""

    __slots__ = ("url", "tree", "_find_cache")

    def __init__(self, url: str, html_str: str):
        self.url = url
        self.tree = parse_html(html_str)
        self._find_cache: dict[str, list[Node]] = {}

    def find(self, selector: str) -> list[Node]:
        r = self._find_cache.get(selector)
        if r is None:
            r = css.find([self.tree], selector)
            self._find_cache[selector] = r
        return r

    def title_text(self) -> str:
        # goquery Find("title").Text(): raw concatenation, no trimming
        return "".join(n.text_content() for n in self.find("title"))

    def base_href(self) -> str:
        bases = self.find("base")
        return bases[0].attrs.get("href", "") if bases else ""

    def fragment(self) -> str:
        _, _, frag = self.url.partition("#")
        return frag


def strip_http_header(raw: str) -> str:
    """Reference fixture pages prepend ``HTTP/0.0 200 OK`` + blank line
    (``NewDocumentFromResponse`` ``/root/reference/fetch/cache.go:63-75``,
    which splits off the FIRST line only)."""
    if raw.startswith("HTTP/"):
        return raw.split("\n", 1)[1] if "\n" in raw else ""
    return raw


def resolve_lazy_image_sources(doc: PageDoc) -> None:
    for img in doc.find("img"):
        src = img.attrs.get("src")
        if src and not src.startswith("data:"):
            continue
        for attr in LAZY_IMAGE_SRC_ATTRS:
            if attr not in img.attrs:
                continue
            real = img.attrs[attr].strip()
            if real and not real.startswith("data:"):
                img.set_attr("src", real)
                break


def sort_fields_url_first(fields: list[Field]) -> list[Field]:
    """Replicates ``sort.Slice(fs, func(i,j) { return fs[i].Type=="url" })``
    (scrape.go:1128): Go's insertion sort with that one-sided comparator
    moves url-type fields to the front in REVERSE original order while
    non-url fields keep their relative order."""
    urls = [f for f in fields if f.type == "url"]
    others = [f for f in fields if f.type != "url"]
    return urls[::-1] + others


def _text_is_empty(v) -> bool:
    return v is None or v == ""


def extract_field(f: Field, rec: dict, nodes: list[Node], base_url: str, base_year: int, ref_time=None) -> None:
    ftype = f.type or "text"
    if ftype == "text":
        rec[f.name] = extract_string_field(get_text_string, f, nodes, FIELD_PART_SEPARATOR)
    elif ftype == "html":
        rec[f.name] = extract_string_field(get_html_string, f, nodes, HTML_PART_SEPARATOR)
    elif ftype == "markdown":
        from .markdown import get_markdown_string

        rec[f.name] = extract_string_field(get_markdown_string, f, nodes, HTML_PART_SEPARATOR)
    elif ftype == "url":
        if len(f.location) != 1:
            raise ExtractError(
                f"a field of type 'url' must exactly have one location, found {len(f.location)}"
            )
        loc = f.location[0]
        if loc.attr == "":
            loc.attr = "href"  # GetTextStringAndURL default (scrape.go:1835-1838)
        rel_u = get_text_string(loc, nodes)
        rec[f.name] = rel_u
        try:
            go_url_parse_check(base_url)
            u = resolve_url(base_url, first_url_part(rel_u))
        except URLError as e:
            raise ExtractError(str(e)) from e
        if u == "":
            u = f.default
            if f.required and u == "":
                raise ExtractError(f"field {f.name} is required but empty")
        rec[f.name + URL_FIELD_SUFFIX] = u
    elif ftype == "date_time_tz_ranges":
        if len(f.location) != 1:
            raise ExtractError(
                f"a field of type 'date_time_tz_ranges' must exactly have one location, found {len(f.location)}"
            )
        s = get_text_string(f.location[0], nodes)
        rec[f.name] = s
        # baseYear from sorted *__Aurl keys (scrape.go:1708-1752)
        for k in sorted(rec.keys()):
            v = rec[k]
            if not isinstance(v, str) or not k.endswith(URL_FIELD_SUFFIX):
                continue
            if not DATE_RE.search(v):
                continue
            y = dtr.year_from_text(v, ref_time=ref_time, date_location=f.date_location)
            if y:
                base_year = y
                break
        if base_year == 0:
            base_year = (ref_time or datetime.now()).year
        parse_str = s if len(s) <= 500 else s[:500]
        rngs = dtr.parse_ranges(
            parse_str,
            base_year=base_year,
            ref_time=ref_time,
            date_location=f.date_location,
            date_language=f.date_language,
        )
        if rngs is not None and rngs.has_start_month_and_day():
            rec[f.name + DATETIME_FIELD_SUFFIX] = str(rngs)
    else:
        raise ExtractError(f"field type '{ftype}' does not exist")


def extract_subfields(fields: list[Field], nodes: list[Node], base_url: str, ref_time=None) -> dict:
    """extractSubfields (scrape.go:1490-1511)."""
    result: dict = {}
    for sf in fields:
        if sf.value != "":
            result[sf.name] = sf.value
            continue
        if sf.fields:
            sub = extract_subfields(sf.fields, nodes, base_url, ref_time)
            if sub:
                merge_nested_field(result, sf.name, sub)
            continue
        if sf.on_detail_page == "":
            try:
                extract_field(sf, result, nodes, base_url, 0, ref_time)
            except ExtractError:
                pass  # logged+ignored in the reference
    return result


def split_sub_map_by_separator(m: dict) -> list[dict]:
    """splitSubMapBySeparator (scrape.go:1519-1559)."""
    has_url_key = False
    max_parts = 1
    for k, v in m.items():
        is_url = k.endswith("url") or k.endswith("href")
        if isinstance(v, str) and is_url:
            n = v.count(RECORD_SEPARATOR) + 1
            if n > max_parts:
                max_parts = n
                has_url_key = True
    if max_parts == 1 or not has_url_key:
        return [m]
    result = [dict() for _ in range(max_parts)]
    for k, v in m.items():
        if not isinstance(v, str):
            for r in result:
                r[k] = v
            continue
        parts = v.split(RECORD_SEPARATOR)
        for i, r in enumerate(result):
            r[k] = parts[i] if i < len(parts) else parts[-1]
    return result


def merge_nested_field(rec: dict, key: str, sub_map: dict) -> None:
    """mergeNestedField (scrape.go:1563-1578)."""
    if key not in rec:
        rec[key] = sub_map
        return
    existing = rec[key]
    if isinstance(existing, dict):
        rec[key] = [existing, sub_map]
    elif isinstance(existing, list):
        existing.append(sub_map)
    else:
        rec[key] = sub_map


def keep_record(scraper: Scraper, rec: dict) -> bool:
    """keepRecord (scrape.go:1315-1337): OR over match-true filters,
    AND-NOT over match-false filters."""
    nr_match_true = 0
    filter_match_true = False
    filter_match_false = True
    for f in scraper.filters:
        if f.field in rec:
            if f.match:
                nr_match_true += 1
                if f.filter_match(rec[f.field]):
                    filter_match_true = True
            else:
                if f.filter_match(rec[f.field]):
                    filter_match_false = False
    if nr_match_true == 0:
        filter_match_true = True
    return filter_match_true and filter_match_false


def remove_hidden_fields(scraper: Scraper, rec: dict) -> dict:
    for f in scraper.fields:
        if f.hide:
            rec.pop(f.name, None)
    return rec


def gq_selection(config: Config, scraper: Scraper, nodes: list[Node], base_url: str, ref_time=None):
    """GQSelection (scrape.go:1075-1196). Returns a record dict, None
    (filtered out), or raises ExtractError."""
    from .derived import apply_derived_fields

    rec: dict = {}
    # the reference sorts the scraper's Fields slice IN PLACE on every
    # GQSelection call (sort.Slice, scrape.go:1128) — the mutation leaks
    # into serialized configs, so the generator's golden parity depends
    # on replicating it (see sort_fields_url_first docstring)
    scraper.fields[:] = sort_fields_url_first(scraper.fields)
    for f in scraper.fields:
        if f.value != "":
            rec[f.name] = f.value
            continue
        if f.fields:
            sub_map = extract_subfields(f.fields, nodes, base_url, ref_time)
            if sub_map:
                for m in split_sub_map_by_separator(sub_map):
                    merge_nested_field(rec, f.name, m)
            continue
        if f.on_detail_page == "":
            extract_field(f, rec, nodes, base_url, 0, ref_time)
        if not keep_record(scraper, rec):  # filter fast (scrape.go:1164-1172)
            return None
    if not keep_record(scraper, rec):
        return None
    if scraper.derived_fields:
        apply_derived_fields(scraper.derived_fields, rec)
    return remove_hidden_fields(scraper, rec)


def is_date_element(node: Node) -> bool:
    """isDateElement (scrape.go:866-895)."""
    direct = "".join(c.text for c in node.children if c.type == 3)
    child = "".join(" " + c.text_content() for c in node.children if c.type == ELEMENT)
    combined = go_trim_space(direct + " " + child)
    if not combined:
        return False
    return bool(DATE_RE.search(combined))


def scrape_sequential(config: Config, scraper: Scraper, found: list[Node], base_url: str, doc: PageDoc, ref_time=None):
    """scrapeSequential (scrape.go:909-1047): chunk children at date
    boundaries, validate, extract each field from the first chunk element
    that yields a non-empty value."""
    children: list[Node] = []
    for parent in found:
        children.extend(c for c in parent.children if c.type == ELEMENT)

    initial_chunks: list[list[Node]] = []
    current: list[Node] = []
    found_first_date = False
    for child in children:
        if is_date_element(child):
            if found_first_date and current:
                initial_chunks.append(current)
            current = [child]
            found_first_date = True
        elif found_first_date:
            current.append(child)
    if found_first_date and current:
        initial_chunks.append(current)

    chunks: list[list[Node]] = []
    for chunk in initial_chunks:
        date_idx = [i for i, n in enumerate(chunk) if is_date_element(n)]
        if len(date_idx) <= 1:
            chunks.append(chunk)
            continue
        for di, idx in enumerate(date_idx):
            end = date_idx[di + 1] if di + 1 < len(date_idx) else len(chunk)
            chunks.append(chunk[idx:end])

    cta_selector = scraper.validation.requires_cta_selector

    rets = []
    for chunk in chunks:
        has_date = any(is_date_element(n) for n in chunk)
        has_cta = bool(cta_selector) and any(css.find([n], cta_selector) for n in chunk)
        if not has_date:
            continue
        if cta_selector and not has_cta:
            continue
        rec: dict = {}
        for f in scraper.fields:
            for elem in chunk:
                try:
                    extract_field(f, rec, [elem], base_url, 0, ref_time)
                except ExtractError:
                    pass
                if not _text_is_empty(rec.get(f.name)):
                    break
        if not rec:
            continue
        rec[URL_FIELD_NAME] = base_url
        rec[TITLE_FIELD_NAME] = doc.title_text()
        rets.append(rec)
    return rets


def gq_document(config: Config, scraper: Scraper, doc: PageDoc, ref_time=None):
    """GQDocument (scrape.go:722-843): container selection (self ∪
    descendants), fragment scoping, per-container GQSelection; error
    records carry ``_error``."""
    base_url = doc.base_href() or scraper.url

    resolve_lazy_image_sources(doc)

    roots = [doc.tree]
    frag = doc.fragment()
    if frag:
        frag_nodes = doc.find("#" + frag)
        if frag_nodes:
            roots = frag_nodes

    if scraper.selector:
        self_match = css.filter_nodes([n for n in roots if n.type == ELEMENT], scraper.selector)
        desc_match = css.find(roots, scraper.selector)
        seen = set()
        found = []
        for n in self_match + desc_match:
            if id(n) not in seen:
                seen.add(id(n))
                found.append(n)
    else:
        found = roots

    if scraper.strategy == "sequential":
        recs = scrape_sequential(config, scraper, found, base_url, doc, ref_time)
        guess_year(scraper, recs, ref_time or datetime.now())
        return recs

    rets = []
    title = doc.title_text()
    for node in found:
        try:
            rec = gq_selection(config, scraper, [node], base_url, ref_time)
        except ExtractError as e:
            rec = {URL_FIELD_NAME: base_url, TITLE_FIELD_NAME: title, "_error": str(e)}
            rets.append(rec)
            continue
        if rec is None or len(rec) == 0:
            continue
        rec[URL_FIELD_NAME] = base_url
        rec[TITLE_FIELD_NAME] = title
        rets.append(rec)

    guess_year(scraper, rets, ref_time or datetime.now())
    return rets


def guess_year(scraper: Scraper, recs: list[dict], ref: datetime) -> None:
    """guessYear (scrape.go:1243-1291) for legacy date fields: pick the
    year (ref.year ± 1) minimizing distance to the previous record's date."""
    guess_fields = {f.name for f in scraper.fields if f.type == "date" and f.guess_year}
    if not guess_fields:
        return
    for i, rec in enumerate(recs):
        for name in list(rec.keys()):
            if name not in guess_fields:
                continue
            t = rec[name]
            if not isinstance(t, datetime):
                continue
            if i > 0 and isinstance(recs[i - 1].get(name), datetime):
                ref = recs[i - 1][name]
            best = t
            best_diff = None
            for y in range(ref.year - 1, ref.year + 2):
                try:
                    tmp = t.replace(year=y)
                except ValueError:
                    continue
                diff = abs((tmp - ref).total_seconds())
                if best_diff is None or diff < best_diff:
                    best_diff = diff
                    best = tmp
            rec[name] = best


def scrape_page(config: Config, scraper: Scraper, get_page, url: str | None = None, ref_time=None):
    """Page (scrape.go:565-680): pagination loop with visited-set cycle
    prevention; stamps the true page URL into Aurl.

    ``get_page(url) -> html string | None`` abstracts the page store (the
    reference's cache stack; in Spark, the pages table).
    """
    u = url or scraper.url
    scraper.initialize_filters(now=ref_time)

    rs: list[dict] = []
    visited = {normalize_visited_url(u)}
    current_url = u
    html_str = get_page(u)
    if html_str is None:
        raise ExtractError(f"fetching page {u!r}: not found")
    doc = PageDoc(current_url, strip_http_header(html_str))
    page_i = 0
    while True:
        recs = gq_document(config, scraper, doc, ref_time)
        for r in recs:
            r[URL_FIELD_NAME] = current_url
        rs.extend(recs)
        page_i += 1
        nxt = _next_page_url(config, scraper, doc, current_url, page_i)
        if nxt is None:
            break
        if normalize_visited_url(nxt) in visited:
            break
        visited.add(normalize_visited_url(nxt))
        html_str = get_page(nxt)
        if html_str is None:
            raise ExtractError(f"fetching next page {nxt!r}: not found")
        current_url = nxt
        doc = PageDoc(current_url, strip_http_header(html_str))

    guess_year(scraper, rs, ref_time or datetime.now())
    return rs


def _next_page_url(config: Config, scraper: Scraper, doc: PageDoc, current_url: str, next_page_i: int):
    """fetchPage pagination arm (scrape.go:1388-1463), href mode."""
    if not scraper.paginators:
        return None
    pag = scraper.paginators[0]
    base_url = doc.base_href() or current_url
    loc = pag.location
    if loc.attr == "":
        loc.attr = "href"
    rel = get_text_string(loc, [doc.tree])
    try:
        nxt = resolve_url(base_url, first_url_part(rel))
    except URLError:
        return None
    if not nxt:
        return None
    if pag.max_pages > 0 and next_page_i >= pag.max_pages:
        return None
    return nxt


SKIP_SUB_URL_EXT = {".gif", ".jfif", ".jpeg", ".jpg", ".mp4", ".pdf", ".png", ".webp", ".zip"}
KEEP_SUB_URL_SCHEME = {"http", "https"}


def detail_pages(config: Config, scraper: Scraper, recs: list[dict], get_page, domain: str = "", ref_time=None) -> None:
    """DetailPages (scrape.go:2327-2403): follow the ConfigID.Field URL of
    each record, scrape with the detail scraper, merge fields prefixed
    ``fname__`` (skipping Aurl)."""
    fname = config.id.field
    for rec in recs:
        rel = rec.get(fname)
        if not isinstance(rel, str):
            continue
        import os
        ext = os.path.splitext(rel.split("?")[0].split("#")[0])[1].lower()
        if ext in SKIP_SUB_URL_EXT:
            continue
        try:
            sub_url = resolve_url(scraper.url, rel)
        except URLError as e:
            raise ExtractError(str(e)) from e
        scheme = sub_url.split(":", 1)[0].lower()
        if scheme not in KEEP_SUB_URL_SCHEME:
            continue
        if domain and domain != registrable_domain(sub_url):
            continue
        html_str = get_page(sub_url)
        if html_str is None:
            continue
        sub_doc = PageDoc(sub_url, strip_http_header(html_str))
        sub_document(config, scraper, rec, fname, sub_doc, ref_time)


def sub_document(config: Config, scraper: Scraper, rec: dict, fname: str, doc: PageDoc, ref_time=None) -> None:
    """SubGQDocument (scrape.go:2407-2464): require exactly one detail
    record; merge with ``fname__`` prefix, skipping Aurl."""
    sub_recs = gq_document(config, scraper, doc, ref_time)
    if len(sub_recs) != 1:
        return
    for k, v in sub_recs[0].items():
        if k == URL_FIELD_NAME:
            continue
        rec[f"{fname}__{k}"] = v
