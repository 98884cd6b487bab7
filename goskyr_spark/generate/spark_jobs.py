"""Distributed auto-config generation — the scale path for G1-G12.

The reference generates one config per page, sequentially
(1-2 s / 10 KB page, 60-120 s / 1 MB page —
``/root/reference/docs/design/design_overview.md:1318-1320``). At crawl
scale, generation itself must distribute. Two Spark shapes:

* ``generate_configs_df``  — one full generation per page, fanned out as
  an Arrow-batched ``mapInPandas`` over (url, html): embarrassingly
  parallel, no shuffle; right when pages are independent (per-site
  config discovery across a million sites).
* ``analyze_pages_df`` + ``squash_candidates_df`` — the corpus-wide
  variant of G1+G2/G3: the per-page analyzer emits candidate rows
  ``(normalized_path, attr, text_index, example)`` and the squash
  becomes a groupBy aggregation — count + examples — so repeated
  structure across MANY pages of one template is detected even when a
  single page has too few occurrences (the reference approximates this
  by string-concatenating pages into one <htmls> document,
  ``generate/generate.go:1430-1467``; a groupBy does it without
  materializing the concatenation).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

CANDIDATE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("norm_path", T.StringType(), False),
        T.StructField("attr", T.StringType(), False),
        T.StructField("text_index", T.IntegerType(), False),
        T.StructField("example", T.StringType(), True),
    ]
)

CONFIG_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("config_id", T.StringType(), False),
        T.StructField("config_yaml", T.StringType(), False),
        T.StructField("n_records", T.IntegerType(), False),
        T.StructField("records_json", T.StringType(), False),
    ]
)


def analyze_pages_df(pages: DataFrame) -> DataFrame:
    """G1 as a flatMap: one candidate row per discovered location."""

    def run(batches):
        from ..extract.record import PageDoc, strip_http_header
        from .analyzer import Analyzer, path_string_without_nth_child

        for pdf in batches:
            rows = []
            for url, html in zip(pdf["url"], pdf["html"]):
                s = html.decode("utf-8", errors="replace") if isinstance(html, (bytes, bytearray)) else html
                try:
                    doc = PageDoc(url, strip_http_header(s))
                except Exception:
                    continue
                a = Analyzer(find_next=True)
                a.parse(doc.tree)
                for lp in a.loc_man:
                    rows.append(
                        (
                            url,
                            path_string_without_nth_child(lp.path),
                            lp.attr,
                            lp.text_index,
                            lp.examples[0] if lp.examples else None,
                        )
                    )
            yield pd.DataFrame(rows, columns=["url", "norm_path", "attr", "text_index", "example"])

    return pages.select("url", "html").mapInPandas(run, schema=CANDIDATE_SCHEMA)


def squash_candidates_df(candidates: DataFrame, min_occ: int, per_page: bool = False,
                         max_examples: int = 20) -> DataFrame:
    """G2/G3 as a groupBy: pattern aggregation with min-count HAVING.
    ``per_page=False`` aggregates corpus-wide (the scale win: template
    structure shared by N pages crosses minOcc even when each page has
    one instance). Map-side partial aggregation keeps the shuffle to one
    row per (path, attr, text_index) per partition."""
    keys = (["url"] if per_page else []) + ["norm_path", "attr", "text_index"]
    return (
        candidates.groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("occurrences"),
            F.countDistinct("example").alias("n_distinct_examples"),
            F.slice(F.sort_array(F.collect_set("example")), 1, max_examples).alias("examples"),
        )
        .filter(F.col("occurrences") >= min_occ)
        # G4 static-field filter: patterns whose examples never vary are
        # boilerplate, not fields
        .filter(F.col("n_distinct_examples") > 1)
    )


def generate_configs_df(pages: DataFrame, min_occs=(5, 10, 20), min_records: int = 0) -> DataFrame:
    """Full per-page generation fan-out: every page gets the complete
    G1-G10 pipeline on an executor; emits one row per surviving config."""
    occs = tuple(min_occs)

    def run(batches):
        import json

        from ..extract.record import PageDoc, strip_http_header
        from .configs import GenOptions, configurations_for_gq_document
        from .yamlout import dump_config

        for pdf in batches:
            rows = []
            for url, html in zip(pdf["url"], pdf["html"]):
                s = html.decode("utf-8", errors="replace") if isinstance(html, (bytes, bytearray)) else html
                try:
                    doc = PageDoc(url, strip_http_header(s))
                    opts = GenOptions(url=url, min_occs=occs, min_records=min_records,
                                      render_js=False).init()
                    cs = configurations_for_gq_document(doc, opts)
                except Exception:
                    continue
                for c in cs.values():
                    recs = getattr(c, "records", []) or []
                    rows.append(
                        (url, str(c.id), dump_config(c), len(recs),
                         json.dumps(recs, sort_keys=True, default=str))
                    )
            yield pd.DataFrame(
                rows, columns=["url", "config_id", "config_yaml", "n_records", "records_json"]
            )

    return pages.select("url", "html").mapInPandas(run, schema=CONFIG_SCHEMA)
