"""CLI mirroring the reference's commands
(``/root/reference/cmd/goskyr/main.go``):

    python -m goskyr_spark scrape <config.yml> [--pages-dir DIR] [--out FILE]
    python -m goskyr_spark generate <url> --cache-dir DIR [--min-occs 5,10,20]
    python -m goskyr_spark crawl --warehouse DIR --seeds URL[,URL...] [...]

``scrape``/``generate`` run against a page cache directory laid out like
the reference's file cache (``fetch/file_cache.go:136-158``); ``crawl``
runs the distributed frontier engine on a synthetic or parquet corpus.
"""

from __future__ import annotations

import argparse
import json
import sys


def cmd_scrape(args) -> int:
    from .config.model import read_config
    from .pipeline.output import write_file, write_stdout
    from .pipeline.run import run_config
    from .testkit.golden import page_getter

    config = read_config(args.config)
    recs = run_config(config, page_getter(args.pages_dir))
    if args.out:
        write_file(recs, args.out)
    else:
        write_stdout(recs)
    return 0


def cmd_generate(args) -> int:
    from .generate.pipeline import generate_for_page
    from .generate.yamlout import dump_config
    from .testkit.golden import page_getter

    min_occs = tuple(int(x) for x in args.min_occs.split(","))
    by_id = generate_for_page(
        args.url,
        page_getter(args.cache_dir),
        min_occs=min_occs,
        do_detail_pages=args.detail_pages,
        require_string=args.require_string,
        min_records=args.min_records,
        require_dates=args.require_dates,
        only_varying_fields=not args.all_fields,
    )
    for cid in sorted(by_id):
        print(f"# --- {cid} ---")
        print(dump_config(by_id[cid]))
    return 0


def cmd_crawl(args) -> int:
    from .crawl.bloom import BloomSpec
    from .crawl.rounds import CrawlRun
    from .spark.corpus import CorpusSpec, generate_pages, generate_robots
    from .spark.session import build_session

    spark = build_session(app_name="goskyr-crawl")
    if args.pages_parquet:
        pages = spark.read.parquet(args.pages_parquet)
        robots = None
        spec = None
    else:
        spec = CorpusSpec(n_hosts=args.hosts)
        pages = generate_pages(spark, spec).cache()
        robots = generate_robots(spark, spec)
    config_yaml = open(args.config).read() if args.config else spec.config_yaml()
    transport = None
    if args.http:
        from .crawl.fetch import UrllibTransport

        transport = UrllibTransport()
    run = CrawlRun(
        spark, args.warehouse, pages, config_yaml, robots=robots,
        bloom_spec=BloomSpec(), default_budget=args.budget,
        follow_links=args.follow_links, transport=transport,
    )
    seeds = args.seeds.split(",") if args.seeds else (spec.seed_urls() if spec else [])
    if run.resume_round() == 0:
        run.init(seeds)
    stats = run.run(max_rounds=args.max_rounds)
    print(json.dumps(stats))
    spark.stop()
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="goskyr_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    ps = sub.add_parser("scrape")
    ps.add_argument("config")
    ps.add_argument("--pages-dir", default=".")
    ps.add_argument("--out", default="")
    ps.set_defaults(fn=cmd_scrape)

    pg = sub.add_parser("generate")
    pg.add_argument("url")
    pg.add_argument("--cache-dir", required=True)
    pg.add_argument("--min-occs", default="5,10,20")
    pg.add_argument("--detail-pages", action="store_true")
    pg.add_argument("--require-string", default="",
                    help="require a candidate config to extract this text (RequireString)")
    pg.add_argument("--min-records", type=int, default=0,
                    help="minimum records a scraper must produce (MinRecords)")
    pg.add_argument("--require-dates", action="store_true",
                    help="require a date field for most items (RequireDates)")
    pg.add_argument("--all-fields", action="store_true",
                    help="keep static fields too (negates OnlyVaryingFields)")
    pg.set_defaults(fn=cmd_generate)

    pc = sub.add_parser("crawl")
    pc.add_argument("--warehouse", required=True)
    pc.add_argument("--seeds", default="")
    pc.add_argument("--pages-parquet", default="")
    pc.add_argument("--config", default="")
    pc.add_argument("--hosts", type=int, default=20)
    pc.add_argument("--budget", type=int, default=32)
    pc.add_argument("--max-rounds", type=int, default=50)
    pc.add_argument("--follow-links", action="store_true")
    pc.add_argument("--http", action="store_true",
                    help="fetch over real HTTP (reference client semantics) instead "
                         "of resolving against the pages table")
    pc.set_defaults(fn=cmd_crawl)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
