"""Benchmark decontamination — remove training documents that overlap an
evaluation/benchmark set, the standard pre-training hygiene step (run
after dedup, before mixing): any training doc sharing at least one word
n-gram (default n=8, the common contamination window) with any benchmark
doc is flagged and dropped from the mix.

Scale shape (the whole point of this operator at 100 TB):

- The benchmark side is TINY relative to training (thousands of eval
  docs vs billions of training docs), so its distinct n-gram digest set
  is built once and BROADCAST — the training scan then probes a
  hash set per partition with no shuffle of the 100 TB side at all.
  The only shuffle is the per-doc hit aggregation, keyed on doc_id
  with map-side combine, and only rows that actually hit a benchmark
  gram ever reach it (the broadcast join filters first).
- Gram keys are xxhash64 longs rather than raw gram strings, so the
  broadcast set and the aggregation rows stay fixed-width (8 bytes);
  the DuckDB oracle uses md5 keys instead — both engines count DISTINCT
  hashes of the same gram strings, so the integer outputs agree
  (64-bit collisions are negligible at any realistic gram count).
- The training side is NEVER pre-distincted: deduplication happens in
  the per-doc aggregate (count_distinct) AFTER the broadcast probe, so
  the only rows that ever shuffle are actual contamination hits — a
  full-corpus distinct would shuffle every gram of the 100 TB side.
- If the benchmark side ever outgrows broadcast range, drop the
  F.broadcast hint and the same plan degrades gracefully to a shuffle
  semi-join on the digest.

The n-gram construction guards Spark's ANSI sequence() trap: a doc with
fewer than n tokens must yield NO grams, but sequence(1, size-n+1)
yields a DESCENDING [1, 0] range when size < n — hence the explicit
when() guard (DuckDB's generate_series returns [] for the same bounds,
so the oracle needs no guard beyond len(t) >= n).

Contamination is PLANTED deterministically at small SF so the oracle is
non-vacuous: benchmark = every doc with doc_id % 20 == 7; for benchmark
docs with doc_id < 200 a synthetic training doc (doc_id + 2_000_000)
embeds the full benchmark text between novel filler words — those
planted docs must be flagged with exactly the benchmark doc's distinct
gram count, and nothing else overlaps at 8-gram width on this corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .scanutil import spread_small_scan

NGRAM = 8
BENCH_MOD, BENCH_REM = 20, 7
PLANT_BELOW = 200
PLANT_OFFSET = 2_000_000


def _word_grams(tokens: Column, n: int) -> Column:
    """Word n-grams of a token array as space-joined strings; empty
    array (not a descending-sequence artifact) when the doc is shorter
    than n tokens."""
    idx = F.sequence(F.lit(1), F.size(tokens) - (n - 1))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tokens, i, n)))
    return F.when(F.size(tokens) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def _tokens(col: str = "text") -> Column:
    return F.split(F.lower(F.trim(col)), "\\s+")


def _train_with_planted(docs: DataFrame) -> DataFrame:
    """Training side: all non-benchmark docs plus planted contaminated
    copies of the first few benchmark docs (filler words are novel vocab
    so only the embedded benchmark text produces matching grams)."""
    bench = docs.filter(F.col("doc_id") % BENCH_MOD == BENCH_REM)
    train = docs.filter(F.col("doc_id") % BENCH_MOD != BENCH_REM).select("doc_id", "text")
    planted = bench.filter(F.col("doc_id") < PLANT_BELOW).select(
        (F.col("doc_id") + PLANT_OFFSET).alias("doc_id"),
        F.concat(
            F.lit("zzleadin zzpad "), F.col("text"), F.lit(" zzpad zztrailout")
        ).alias("text"),
    )
    return train.unionByName(planted)


def decontaminate(spark: SparkSession, sf_dir: str, n: int = NGRAM) -> DataFrame:
    """Flag training docs sharing any word n-gram with the benchmark
    set. Returns (doc_id, n_contaminated_grams) for flagged docs only —
    the decontaminated corpus is the anti-join of training against this
    result (same broadcast set, zero extra passes when fused)."""
    path = f"{sf_dir}/documents.parquet"
    docs = spread_small_scan(spark, spark.read.parquet(path), path)
    # explode_outer + output-null filter instead of explode: the plain
    # form lets InferFiltersFromGenerate push size>0/isnotnull of the
    # WHOLE gram HOF chain below the Generate, re-evaluating it
    # (interpreted) twice more per row — see dedup.py
    # minhash_signatures_from_shingles for the measurement.
    # token arrays materialized in their own projection (blocks
    # CollapseProject): a lambda reference to an inline split
    # re-tokenizes per element — O(tokens²) per row
    bench_grams = (
        docs.filter(F.col("doc_id") % BENCH_MOD == BENCH_REM)
        .select(_tokens().alias("t"))
        .select(F.explode_outer(_word_grams(F.col("t"), n)).alias("g"))
        .filter(F.col("g").isNotNull())
        .select(F.xxhash64("g").alias("gk"))
        .distinct()
    )
    train_grams = (
        _train_with_planted(docs)
        .select("doc_id", _tokens().alias("t"))
        .select("doc_id", F.explode_outer(_word_grams(F.col("t"), n)).alias("g"))
        .filter(F.col("g").isNotNull())
        .select("doc_id", F.xxhash64("g").alias("gk"))
    )
    return (
        train_grams.join(F.broadcast(bench_grams), "gk")
        .groupBy("doc_id")
        .agg(F.count_distinct("gk").alias("n_contaminated_grams"))
    )
