"""Scan-parallelism helper shared by the ops modules.

Operators whose first stage does heavy per-row work (gram explosion,
per-gram md5, shingle hashing) are serialized when the input file is
small enough that parquet splits it into 1-2 tasks — a small-SF
artifact: at production sizes the scan has thousands of row-group
splits and carries the parallelism itself. ``spread_small_scan`` adds a
round-robin repartition ONLY when the file cannot fill the cluster
(< 4 MB per core, read from the filesystem — no Spark job), so plans
are exchange-free at scale and wide in the sandbox.

NOT used by the ops whose whole point is a shuffle-free plan
(stratified_sample, repetition_signals, token_counts — gated in
tests/test_plans.py); their per-row work (codegen'd expressions or a
sub-µs/token Arrow pass) is light enough that scan width doesn't
dominate.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

SPREAD_BYTES_PER_CORE = 4 * 1024 * 1024


def spread_small_scan(spark: SparkSession, df: DataFrame, path: str) -> DataFrame:
    try:
        size = (
            os.path.getsize(path)
            if os.path.isfile(path)
            else sum(
                os.path.getsize(os.path.join(path, f))
                for f in os.listdir(path)
                if f.endswith(".parquet")
            )
        )
    except OSError:
        return df
    cores = spark.sparkContext.defaultParallelism
    if size < SPREAD_BYTES_PER_CORE * cores:
        return df.repartition(cores)
    return df
