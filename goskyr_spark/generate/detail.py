"""Auto-config generation, stage 4: detail-page configs (G11).

* ConfigurationsForAllDetailPages ← ``/root/reference/generate/generate.go:1008-1214``
* ConfigurationsForDetailPages    ← ``/root/reference/generate/generate.go:1220-1349``
* JoinGQDocuments                 ← ``/root/reference/generate/generate.go:1430-1467``

Offline semantics (matching the reference's own tests): redirect
resolution is identity (cache stack bottoms out at a FileCache with no
network fallback, ``/root/reference/fetch/file_cache.go:160-165``).
"""

from __future__ import annotations

import copy as _copy

from ..config.model import Config, Scraper
from ..extract.record import PageDoc, detail_pages
from ..extract.urlutil import registrable_domain, resolve_url, trim_url_scheme
from ..htmlx.parser import render
from .configs import (
    GenOptions,
    _copy_cid,
    configurations_for_gq_document,
    records_string,
)

BLOCKED_DOMAINS = {"wikipedia", "google"}
KNOWN_DOMAINS = {"ticketweb", "dice"}

SKIP_SUB_URL_EXT = {".avif", ".gif", ".jpeg", ".jpg", ".mp3", ".mp4", ".pdf", ".png", ".webp"}
KEEP_SUB_URL_SCHEME = {"http", "https"}


def _go_ext(value: str) -> str:
    """filepath.Ext: suffix from the final dot of the last path element."""
    base = value.rsplit("/", 1)[-1]
    dot = base.rfind(".")
    return base[dot:] if dot >= 0 else ""


def tld_domain(url: str) -> str:
    """go-tld's .Domain: the registrable domain's first label
    ('quotes.toscrape.com' → 'toscrape')."""
    rd = registrable_domain(url if "//" in url else "http://" + url)
    return rd.split(".")[0] if rd else ""


def join_documents(docs: list[PageDoc | None]) -> PageDoc:
    """JoinGQDocuments (generate.go:1430-1467): concatenate <body> inner
    HTML inside an <htmls> wrapper, then re-parse."""
    parts = ["<htmls>\n"]
    for doc in docs:
        if doc is None:
            continue
        bodies = doc.find("body")
        if bodies:
            inner = "".join(render(ch) for ch in bodies[0].children)
        else:
            inner = "".join(render(ch) for ch in doc.tree.children)
        parts.append("\n" + inner + "\n")
    parts.append("\n</htmls>\n")
    return PageDoc("", "".join(parts))


def configurations_for_all_detail_pages(opts: GenOptions, page_configs: dict,
                                        get_page) -> dict:
    """generate.go:1008-1214. ``page_configs``: records-string → Config
    (with ``.records`` attached); ``get_page(url) -> html|None``."""
    page_joins_by_fname: dict[str, list] = {}
    field_urls_by_fname: dict[str, list[str]] = {}

    for page_c in sorted(page_configs.values(), key=lambda c: str(c.id)):
        page_s = page_c.scrapers[0]
        from .configs import get_detail_page_url_fields

        for page_f in get_detail_page_url_fields(page_s):
            pj = {"config": page_c, "field_joins": []}
            page_joins_by_fname.setdefault(page_f.name, []).append(pj)
            for rec in getattr(page_c, "records", []) or []:
                value = rec.get(page_f.name, "")
                if value == "" or not isinstance(value, str):
                    continue
                if _go_ext(value).lower() in SKIP_SUB_URL_EXT:
                    continue
                try:
                    abs_str = resolve_url(opts.url, value)
                except Exception:
                    continue
                if tld_domain(abs_str) in BLOCKED_DOMAINS:
                    continue
                resolved = abs_str  # offline: redirect resolution is identity
                scheme = resolved.split(":", 1)[0].lower()
                if scheme not in KEEP_SUB_URL_SCHEME:
                    continue
                if (
                    opts.only_known_domain_detail_pages
                    and not (tld_domain(opts.url) == tld_domain(resolved)
                             or tld_domain(resolved) in KNOWN_DOMAINS)
                ):
                    continue
                if tld_domain(resolved) in BLOCKED_DOMAINS:
                    continue
                u = trim_url_scheme(resolved)
                field_urls_by_fname.setdefault(page_f.name, []).append(u)
                pj["field_joins"].append({"name": page_f.name, "value": value, "url": u})

    for urls in field_urls_by_fname.values():
        urls.sort()

    rs: dict = {}
    field_urls_seen: dict[str, str] = {}
    for fname in sorted(page_joins_by_fname):
        f_urls = "\n".join(field_urls_by_fname.get(fname, []))
        if f_urls in field_urls_seen:
            continue  # identical URL set handled under an earlier field name
        field_urls_seen[f_urls] = fname

        pjs = page_joins_by_fname[fname]
        o = GenOptions(**{**opts.__dict__, "config_id": _copy_cid(opts.config_id)})
        o.config_id.field = fname
        pjs.sort(key=lambda pj: str(pj["config"].id))
        rs = configurations_for_detail_pages(o, pjs, rs, get_page)
    return rs


def _page_joins_urls(pjs: list) -> list[str]:
    us = {fj["url"] for pj in pjs for fj in pj["field_joins"]}
    return sorted("http://" + u for u in us)


def configurations_for_detail_pages(opts: GenOptions, pjs: list, rs: dict, get_page) -> dict:
    """generate.go:1220-1349."""
    urls = _page_joins_urls(pjs)
    docs = []
    for u in urls:
        html = get_page(u)
        if html is None:
            html = get_page("https://" + trim_url_scheme(u))
        docs.append(PageDoc(u, html) if html is not None else None)
    joined = join_documents(docs)

    o = GenOptions(**{**opts.__dict__, "config_id": _copy_cid(opts.config_id)})
    o.do_detail_pages = False
    o.require_string = ""
    cs = configurations_for_gq_document(joined, o)

    domain = tld_domain(opts.url) if opts.only_known_domain_detail_pages else ""

    configs_by_id = {str(c.id): c for c in cs.values()}
    config_ids = sorted(configs_by_id, key=lambda s: (len(s), s))

    for cid in config_ids:
        c = configs_by_id[cid]
        # Go copies the Scraper STRUCT but shares the Fields slice backing
        # array (generate.go:1299) — in-place field sorts during the merge
        # scrapes mutate the shared list; copy.copy preserves that aliasing
        sub_scraper = _copy.copy(c.scrapers[0])
        sel = sub_scraper.selector
        sel = sel.removeprefix("body > htmls")
        sel = sel.removeprefix(" > ")
        sub_scraper.selector = sel

        for pj in pjs:
            merged = Config(
                id=_copy_cid(pj["config"].id),
                scrapers=list(pj["config"].scrapers) + [sub_scraper],
            )
            merged.id.field = opts.config_id.field
            merged.id.subid = c.id.subid
            merged_records = _copy.deepcopy(getattr(pj["config"], "records", []) or [])
            try:
                detail_pages(merged, sub_scraper, merged_records, get_page,
                             domain=domain, ref_time=opts.ref_time)
            except Exception:
                continue

            min_records = opts.min_records if opts.min_records > 0 else 2
            if len(merged_records) < min_records:
                continue
            recs_str = records_string(merged_records)
            if recs_str in rs:
                continue
            merged.records = merged_records
            rs[recs_str] = merged
    return rs
