"""Exact repeated-substring span detection — the "deduplicating training
data makes language models better" (Lee et al., 2022) ExactSubstr pass:
find every maximal span of >= k consecutive tokens that occurs more than
once anywhere in the corpus, so a downstream rewrite can cut the
repeated region out of each document (boilerplate, licenses, navigation
chrome, quoted passages) instead of dropping whole near-dup documents.

Lee et al. build a monolithic suffix array; that is the single-machine
formulation. The Spark-native equivalent replaces the suffix array with
a distributed gram-hash join, which is linear in corpus tokens and
shuffles only fixed-width keys:

1. every token position emits the xxhash64 of its k-token gram
   (8-byte key, not the gram string);
2. a groupBy over gram keys finds grams occurring > 1 time corpus-wide
   (partial counts combine map-side; the count can short-circuit at 2
   but Spark's partial agg already bounds each mapper's contribution);
3. positions semi-join the duplicated-gram set (shuffle hash join on
   the 8-byte key — the dup set is corpus-scale, so never broadcast);
4. surviving positions merge into maximal spans per document with a
   running-max window: position p covers [p, p+k-1]; a new span starts
   when p exceeds the running max end + 1. The window and the final
   span aggregate share the doc_id partitioning, so steps 4-5 are ONE
   exchange.

At 100 TB the only heavy stage is the gram-key shuffle (step 2-3),
which is the same volume Lee et al. stream through their suffix-array
construction — here it is embarrassingly parallel and AQE-sized. A
bloom filter built from the (much smaller) duplicated-gram set can
prefilter step 3's probe side when dup density is low (swap point; not
needed at test SF).

Duplication is PLANTED deterministically so the oracle is non-vacuous
at small SF: docs with doc_id < 25 get an exact copy at doc_id +
3_000_000, so both members of each pair must report one whole-document
span (plus any natural k-gram repeats in the synthetic corpus — the
oracle recomputes those identically). Engines hash grams differently
(xxhash64 vs md5) but both only GROUP by the hash; outputs are integer
positions, so the comparison is hash-exact.

ANSI guard: docs shorter than k tokens must emit no positions —
sequence(1, size-k+1) would produce a descending range, hence the
explicit when() (DuckDB's generate_series returns [] for the same
bounds).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .scanutil import spread_small_scan

K = 10
PLANT_N = 25
PLANT_OFFSET = 3_000_000


def _tokens(col: str = "text") -> Column:
    return F.split(F.lower(F.trim(col)), "\\s+")


def _docs_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = f"{sf_dir}/documents.parquet"
    docs = spread_small_scan(spark, spark.read.parquet(path), path).select(
        "doc_id", "text"
    )
    copies = docs.filter(F.col("doc_id") < PLANT_N).withColumn(
        "doc_id", F.col("doc_id") + F.lit(PLANT_OFFSET)
    )
    return docs.unionByName(copies)


def _gram_positions(df: DataFrame, k: int) -> DataFrame:
    """(doc_id, pos, gk): one row per token position that starts a
    k-gram; pos is 1-based (matching DuckDB list slicing); gk is the
    xxhash64 of the space-joined gram. Hashes are computed INSIDE the
    array transform so the generate explodes fixed-width longs — the
    token array never survives past the projection."""
    # token array materialized in its own projection (multi-referenced
    # alias blocks CollapseProject): a lambda reference to an inline
    # split re-tokenizes per element — O(tokens²) per row
    wdf = df.select("doc_id", _tokens().alias("ws"))
    ws = F.col("ws")
    gks = F.transform(
        F.sequence(F.lit(1), F.size(ws) - (k - 1)),
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(ws, i, k))),
    )
    guarded = F.when(F.size(ws) >= k, gks).otherwise(
        F.array().cast("array<bigint>")
    )
    # posexplode_outer + output-null filter: the plain form pushes an
    # inferred size>0/isnotnull filter of the whole hash-transform chain
    # below the Generate and re-evaluates it interpreted per conjunct
    # (see dedup.py minhash_signatures_from_shingles)
    return (
        wdf.select("doc_id", F.posexplode_outer(guarded).alias("pos0", "gk"))
        .filter(F.col("gk").isNotNull())
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "gk")
    )


def repeated_substring_spans(spark: SparkSession, sf_dir: str, k: int = K) -> DataFrame:
    """(doc_id, span_start, span_end, n_tokens) for every maximal span
    of tokens covered by at least one k-gram that occurs more than once
    corpus-wide. Positions are 1-based token indices, span bounds
    inclusive."""
    grams = _gram_positions(_docs_planted(spark, sf_dir), k)
    dup = grams.groupBy("gk").agg(F.count("*").alias("c")).filter(F.col("c") > 1)
    hot = grams.join(dup.select("gk"), "gk", "left_semi").select("doc_id", "pos")

    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    brk = F.when(
        F.col("pos")
        > F.coalesce(F.max(F.col("pos") + (k - 1)).over(w_prev), F.lit(-1)) + 1,
        1,
    ).otherwise(0)
    islands = hot.withColumn("island", F.sum(brk).over(w_run))
    return islands.groupBy("doc_id", "island").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + (k - 1)).alias("span_end"),
        (F.max("pos") + (k - 1) - F.min("pos") + 1).alias("n_tokens"),
    ).drop("island")
