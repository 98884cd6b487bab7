"""Physical-plan quality gates: the plans Catalyst actually produces for
the operator library must broadcast small sides, prune columns at the
parquet scan, and push filters down. These assertions are the 100-TB
discipline made executable — a regression here is a scale bug even when
results stay correct."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_merge_key_join_broadcasts_dimension(spark):
    from goskyr_spark.ops.relational import merge_key_join

    plan = plan_of(merge_key_join(spark, SF))
    assert "BroadcastHashJoin" in plan, plan


def test_detail_join_broadcasts_dimension(spark):
    from goskyr_spark.ops.relational import detail_page_join

    plan = plan_of(detail_page_join(spark, SF))
    assert "BroadcastHashJoin" in plan


def test_token_counts_prunes_columns(spark):
    from goskyr_spark.ops.textstats import token_counts

    plan = plan_of(token_counts(spark, SF))
    # the scan must read only doc_id + text, not lang/source/n_chars
    scan = plan[plan.index("ReadSchema"):].splitlines()[0]
    assert "text" in scan and "doc_id" in scan
    assert "source" not in scan and "lang" not in scan, scan


def test_filter_pushdown_reaches_scan(spark):
    df = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .filter(F.col("o_totalprice") > 100000)
        .select("o_orderkey")
    )
    plan = plan_of(df)
    assert "PushedFilters: [" in plan
    assert "GreaterThan(o_totalprice" in plan, plan


def test_politeness_uses_two_window_phases(spark):
    from goskyr_spark.crawl.politeness import select_under_budget

    frontier = spark.createDataFrame(
        [("u%d" % i, i, "h1", "d1", float(i), 0, 0) for i in range(100)],
        "url string, url_hash long, host string, domain string, priority double, depth int, round_added int",
    )
    out = select_under_budget(frontier, default_budget=5, n_salts=4)
    plan = plan_of(out)
    # salted phase + exact phase = two Window operators
    assert plan.count("Window") >= 2, plan
    rows = out.collect()
    assert len(rows) == 5
    assert sorted(r["visit_rank"] for r in rows) == [1, 2, 3, 4, 5]


def test_whole_stage_codegen_covers_textstats(spark):
    from goskyr_spark.ops.textstats import quality_signals

    plan = plan_of(quality_signals(spark, SF))
    # '*' prefixes mark whole-stage-codegen nodes in formatted explain
    assert "* Project" in plan
    # no python UDF in the hot path
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
