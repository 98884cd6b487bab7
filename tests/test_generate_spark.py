"""Distributed generation: the per-page mapInPandas fan-out must produce
the same configs as the sequential pipeline, and the corpus-wide squash
groupBy must find the repeating template structure."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from goskyr_spark.spark.corpus import CorpusSpec, generate_pages
from goskyr_spark.generate.spark_jobs import (
    analyze_pages_df,
    generate_configs_df,
    squash_candidates_df,
)


@pytest.fixture(scope="module")
def corpus(spark):
    spec = CorpusSpec(n_hosts=3, list_pages_per_host=2, items_per_page=8, mega_factor=1, seed=3)
    pages = generate_pages(spark, spec).cache()
    pages.count()
    return spec, pages


def test_distributed_generation_matches_sequential(spark, corpus):
    spec, pages = corpus
    lists = pages.filter(F.col("url").endswith("/list/0"))
    out = generate_configs_df(lists, min_occs=(5,)).cache()
    rows = {(r["url"], r["config_id"]): r for r in out.collect()}
    assert len(rows) > 0

    # sequential oracle on one page
    from goskyr_spark.extract.record import PageDoc
    from goskyr_spark.generate.configs import GenOptions, configurations_for_gq_document
    from goskyr_spark.generate.yamlout import dump_config

    url = spec.host_base(1) + "/list/0"
    doc = PageDoc(url, spec.list_html(1, 0))
    cs = configurations_for_gq_document(doc, GenOptions(url=url, min_occs=(5,)).init())
    assert cs, "sequential generation found no configs"
    for c in cs.values():
        key = (url, str(c.id))
        assert key in rows, f"distributed run missing {key}"
        assert rows[key]["config_yaml"] == dump_config(c)
        assert rows[key]["n_records"] == len(getattr(c, "records", []))

    # some generated config must extract exactly the planted item rows
    assert any(
        r["n_records"] == spec.items_per_page and "div.post" in r["config_yaml"]
        for r in rows.values()
    ), sorted((r["config_id"], r["n_records"]) for r in rows.values())


def test_corpus_squash_finds_template(spark, corpus):
    spec, pages = corpus
    cands = analyze_pages_df(pages.filter(F.col("url").contains("/list/")))
    squashed = squash_candidates_df(cands, min_occ=8).cache()
    paths = [r["norm_path"] for r in squashed.collect()]
    assert any("div.post" in p and "h2.title" in p for p in paths), paths
    # per-page variant keeps the url key
    per_page = squash_candidates_df(cands, min_occ=8, per_page=True)
    assert "url" in per_page.columns
    assert per_page.count() >= squashed.count()
