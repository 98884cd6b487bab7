"""CCNet-style n-gram language-model quality scoring (Wenzek et al.,
"CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
Data", 2020): score every candidate document by its mean log-probability
under a small reference LM, so a downstream filter can keep the
head/middle of the perplexity distribution — the standard model-based
quality gate that sits between dedup and mixing in a web-scale
training-data pipeline.

The LM here is an add-one-smoothed bigram model trained on a held-out
reference slice of the corpus itself (``doc_id % 10 == 3`` — in
production this would be a trusted corpus like Wikipedia; the slice
keeps the op self-contained and deterministic). Scored docs are the
complement of the slice. For each document:

    score = sum(n_g * log2 P(w2|w1)) / sum(n_g)
    P(w2|w1) = (c(w1 w2) + 1) / (c(w1) + V)        (add-one smoothing)

with c(.) counts over the reference slice and V its distinct-token
vocabulary size. Unseen bigrams/contexts coalesce to count 0, so every
bigram has a finite probability and the score is defined for every doc
with >= 2 tokens.

Scale shape at 100 TB:

- The LM tables (unigram + bigram counts) are bounded by the REFERENCE
  slice, not the scored corpus — in production the reference LM is
  small and pruned (CCNet keeps a few hundred MB), so both probe joins
  are broadcast-able; here the hint is left to AQE so the same plan
  degrades to a shuffle join if the reference outgrows broadcast range.
  Swap point: prune the bigram table to top-K by count before broadcast
  (documented, not needed at test SF).
- The scored side aggregates per (doc_id, bigram) BEFORE probing
  (map-side combine on the groupBy), so repeated bigrams within a doc
  probe once and the join input is the doc's distinct-bigram set, not
  its token stream.
- The final per-doc aggregation shuffles on doc_id with map-side
  partial aggregation; output width is 3 fixed-size columns.
- V is a one-row dimension (count distinct over the reference slice)
  cross-joined as a broadcast — no driver collect.

Cross-engine determinism: tokenization is the parity-proven
``split(lower(trim(text)), '\\s+')`` (DuckDB ``string_split_regex``);
counts and V are exact integers in both engines; the only float is the
final weighted mean of log2 values, rounded to 4 decimals in BOTH
engines (IEEE-double log2/division agree far below 1e-4 at these
magnitudes). Verified end-to-end by the DuckDB oracle.

Reference surface: the reference repo has no model-based quality gate
(its filters are regex/date/conditional — goskyr/scrape.go filters);
this op extends the §2 pipeline family for LLM-corpus curation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .scanutil import spread_small_scan

LM_MOD, LM_REM = 10, 3  # reference-LM training slice of the corpus


def _tokens(col: str = "text") -> Column:
    return F.split(F.lower(F.trim(col)), "\\s+")


def _bigram_structs(tokens: Column) -> Column:
    """Array of (w1, g) structs — g is the space-joined bigram string
    (the LM-table join key), w1 its context token (the unigram join
    key). ANSI guard: docs with < 2 tokens yield an empty array, never
    a descending sequence() range."""
    idx = F.sequence(F.lit(1), F.size(tokens) - 1)
    pairs = F.transform(
        idx,
        lambda i: F.struct(
            F.element_at(tokens, i).alias("w1"),
            F.concat_ws(" ", F.slice(tokens, i, 2)).alias("g"),
        ),
    )
    empty = F.array().cast("array<struct<w1:string,g:string>>")
    return F.when(F.size(tokens) >= 2, pairs).otherwise(empty)


def lm_perplexity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_bigrams, avg_logp) for every non-reference doc with at
    least one bigram; avg_logp is the mean bigram log2-probability under
    the add-one-smoothed reference bigram LM (higher = more fluent under
    the reference distribution; a pipeline filters on a band of it)."""
    path = f"{sf_dir}/documents.parquet"
    docs = spread_small_scan(spark, spark.read.parquet(path), path)
    ref = docs.filter(F.col("doc_id") % LM_MOD == LM_REM)
    scored = docs.filter(F.col("doc_id") % LM_MOD != LM_REM)

    ref_tok = ref.select(F.explode_outer(_tokens()).alias("tok")).filter(
        F.col("tok").isNotNull()
    )
    unigrams = ref_tok.groupBy("tok").agg(F.count("*").alias("c1"))
    # explode_outer + output-null filter: plain explode would push the
    # whole bigram HOF chain into an inferred pre-Generate filter and
    # re-evaluate it interpreted per conjunct (see dedup.py
    # minhash_signatures_from_shingles). The token array is materialized
    # in its own projection first — a lambda reference to an inline
    # split re-tokenizes per element, O(tokens²) per row.
    bigrams = (
        ref.select(_tokens().alias("t"))
        .select(F.explode_outer(_bigram_structs(F.col("t"))).alias("b"))
        .filter(F.col("b").isNotNull())
        .groupBy(F.col("b.g").alias("g"))
        .agg(F.count("*").alias("c12"))
    )
    # V = number of unigram groups — reuses the unigram aggregate
    # instead of a second scan+explode of the reference slice
    vocab = unigrams.agg(F.count("*").alias("v"))

    doc_bigrams = (
        scored.select("doc_id", _tokens().alias("t"))
        .select("doc_id", F.explode_outer(_bigram_structs(F.col("t"))).alias("b"))
        .filter(F.col("b").isNotNull())
        .groupBy("doc_id", F.col("b.w1").alias("w1"), F.col("b.g").alias("g"))
        .agg(F.count("*").alias("n"))
    )
    probed = (
        doc_bigrams.join(bigrams, "g", "left")
        .join(unigrams, F.col("w1") == F.col("tok"), "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            "n",
            F.log2(
                (F.coalesce(F.col("c12"), F.lit(0)) + 1)
                / (F.coalesce(F.col("c1"), F.lit(0)) + F.col("v"))
            ).alias("logp"),
        )
    )
    return probed.groupBy("doc_id").agg(
        F.sum("n").alias("n_bigrams"),
        F.round(F.sum(F.col("n") * F.col("logp")) / F.sum("n"), 4).alias("avg_logp"),
    )
