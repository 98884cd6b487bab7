"""Auto-config generation driver — the offline equivalent of
``goskyr generate <url>`` and the reference's TestGenerate harness
(``/root/reference/cmd/goskyr/main_test.go:30-232``).
"""

from __future__ import annotations

import glob
import os

from ..extract.record import PageDoc, strip_http_header
from ..extract.urlutil import url_slug
from ..testkit.golden import page_getter
from .configs import GenOptions, configurations_for_gq_document
from .detail import configurations_for_all_detail_pages


def generate_for_page(url: str, get_page, min_occs=(5, 10, 20), require_string: str = "",
                      do_detail_pages: bool = False, render_js: bool = True,
                      min_records: int = 0, require_dates: bool = False,
                      only_varying_fields: bool = True, ref_time=None) -> dict:
    """→ {config_id_string: Config} (page configs + detail configs)."""
    html = get_page(url)
    if html is None:
        raise FileNotFoundError(f"page not in cache: {url}")
    doc = PageDoc(url, strip_http_header(html))
    opts = GenOptions(
        url=url,
        min_occs=tuple(min_occs),
        do_detail_pages=do_detail_pages,
        only_varying_fields=only_varying_fields,
        render_js=render_js,
        require_string=require_string,
        min_records=min_records,
        require_dates=require_dates,
        ref_time=ref_time,
    ).init()
    cs = configurations_for_gq_document(doc, opts)
    by_id = {str(c.id): c for c in cs.values()}
    if do_detail_pages:
        sub_cs = configurations_for_all_detail_pages(opts, cs, get_page)
        for c in sub_cs.values():
            by_id[str(c.id)] = c
    return by_id


def generate_for_fixture(cat_dir: str, url: str, require_string: str = "", ref_time=None) -> dict:
    """Replays one reference TestGenerate case against the fixture cache."""
    get_page = page_getter(cat_dir)
    page_slug = url_slug(url)
    from urllib.parse import urlsplit

    host_slug = url_slug(urlsplit(url).netloc)
    detail_goldens = glob.glob(
        os.path.join(cat_dir, host_slug + "_configs", page_slug + "*href*.yml")
    )
    return generate_for_page(
        url,
        get_page,
        min_occs=(5, 10, 20),
        require_string=require_string,
        do_detail_pages=len(detail_goldens) > 0,
        render_js=True,
        ref_time=ref_time,
    )


def extend_page_config_records_with_next(config, doc, get_page, ref_time=None) -> None:
    """ExtendPageConfigRecordsWithNext (R7,
    ``/root/reference/generate/generate.go:872-964``): propose next-page
    URLs from every paginator candidate, drop javascript:/self links,
    scrape each proposed page with the same config, append the records,
    and keep only the paginators that produced records.

    NOTE the reference's own fetch map is empty (the FIXME at
    generate.go:911), so with ``get_page=None`` this faithfully degrades
    to the reference behavior: nothing is fetched and every paginator is
    dropped. Passing a real ``get_page`` enables the documented intent.
    """
    from ..extract.record import ExtractError, gq_document
    from ..extract.text import get_text_string
    from ..extract.urlutil import first_url_part, resolve_url, trim_url_scheme

    scraper = config.scrapers[0]
    base_url = doc.base_href() or scraper.url
    us_map = {}
    for pag in scraper.paginators:
        loc = pag.location
        if loc.attr == "":
            loc.attr = "href"
        rel = get_text_string(loc, [doc.tree])
        try:
            u = resolve_url(base_url, first_url_part(rel))
        except Exception:
            continue
        if not u or u.startswith("javascript:"):
            continue
        short_u, short_base = trim_url_scheme(u), trim_url_scheme(scraper.url)
        if short_u in (short_base, "www." + short_base) or "www." + short_u == short_base:
            continue
        us_map[short_u] = pag

    new_pags = []
    records = getattr(config, "records", None)
    if records is None:
        records = config.records = []
    for u, pag in us_map.items():
        html = get_page("https://" + u) if get_page else None
        if html is None and get_page:
            html = get_page("http://" + u)
        if html is None:
            continue
        from ..extract.record import PageDoc, strip_http_header

        next_doc = PageDoc("https://" + u, strip_http_header(html))
        try:
            recs = gq_document(config, scraper, next_doc, ref_time)
        except ExtractError:
            continue
        if not recs:
            continue
        records.extend(recs)
        new_pags.append(pag)
    scraper.paginators = new_pags
