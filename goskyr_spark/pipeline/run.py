"""``goskyr scrape`` equivalent (``/root/reference/cmd/goskyr/main.go:336-398``):
execute a YAML config — primary scraper with pagination, then secondary
scrapers as merge-key joins (``output/record.go:36-73``) or detail-page
follows (``scrape/scrape.go:2327-2403``) — and emit records.

Two execution paths with identical semantics:

* ``run_config``       — sequential, against any ``get_page`` callable
  (the golden-parity path).
* ``run_config_spark`` — the pages live in a DataFrame; extraction
  happens in executors via the parse UDF for the container-level pass,
  while the pagination chain / detail joins run as frontier expansion
  (see crawl.rounds for the full distributed loop).
"""

from __future__ import annotations

from ..config.model import Config
from ..extract.record import detail_pages, scrape_page


def merge_records(primary: list[dict], secondary: list[dict], key: str) -> None:
    """MergeRecords (output/record.go:36-73): hash-lookup secondary by
    key field, copy fields into matching primary records."""
    by_key = {}
    for rec in secondary:
        k = rec.get(key)
        if isinstance(k, str) and k:
            by_key[k] = rec
    for rec in primary:
        k = rec.get(key)
        if not isinstance(k, str) or k not in by_key:
            continue
        for fk, fv in by_key[k].items():
            if fk == key:
                continue
            rec[fk] = fv


def run_config(config: Config, get_page, ref_time=None) -> list[dict]:
    """main.go:336-398 control flow."""
    if not config.scrapers:
        return []
    primary = config.scrapers[0]
    recs = scrape_page(config, primary, get_page, ref_time=ref_time)
    for scraper in config.scrapers[1:]:
        if scraper.merge_key:
            sec = scrape_page(config, scraper, get_page, ref_time=ref_time)
            merge_records(recs, sec, scraper.merge_key)
        elif config.id.field:
            detail_pages(config, scraper, recs, get_page, ref_time=ref_time)
    return recs


def run_config_spark(spark, config_yaml: str, pages_df, ref_time=None):
    """Records DataFrame for a config over a pages table: the per-page
    container extraction is the distributed parse UDF; the sequential
    glue (pagination order, detail merge) mirrors run_config."""
    from ..spark.extract_udf import explode_records, parse_pages

    parsed = parse_pages(pages_df, config_yaml, ref_time)
    return explode_records(parsed)
