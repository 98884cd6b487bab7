"""Training-mix construction operators: deterministic stratified
sampling, per-stratum quality rollups, and exact length percentiles.

These are the "compose the corpus" half of a training-data pipeline
(the dedup/quality ops in dedup.py / textstats.py are the "clean the
corpus" half). Everything here is JVM-side built-ins under whole-stage
codegen, and every output is oracle-checkable in DuckDB bit-for-bit:

- Sampling keys are 60-bit md5 prefixes (identical in both engines),
  compared against integer thresholds — no floating-point RNG, so the
  sample is reproducible across runs, engines, and cluster sizes, and
  re-running the pipeline after appending new rows never flips the
  keep/drop decision of an old row (the property reservoir or
  rand()-based sampling lacks).
- Percentiles are EXACT (Spark `percentile`, DuckDB `quantile_cont`,
  both linear-interpolation) — at 100 TB swap to approx_percentile and
  the oracle becomes a tolerance check; the exact form is what the
  small-SF gate verifies.

At scale: the sample is a scan+filter (no shuffle at all — the md5 key
derives from doc_id); rollup/percentiles shuffle once on the stratum
key with map-side partial aggregation. Nothing here collects to the
driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TWO_60 = 1 << 60

# per-language sampling rates for the demo training mix: downsample the
# over-represented head language, keep the tail. Expressed as integer
# thresholds against the 60-bit key so the comparison is exact.
LANG_RATES = {"en": 0.25, "zh": 0.75, "es": 0.75, "de": 0.75, "fr": 0.75}
DEFAULT_RATE = 1.0


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _sample_key(seed: str = "smpl") -> F.Column:
    """60-bit deterministic key from doc_id: first 15 hex chars of
    md5(seed ':' doc_id). Stable across engines (DuckDB md5 identical)
    and across appends (depends only on the row's own id)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(seed + ":"), F.col("doc_id").cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")


def _rate_threshold() -> F.Column:
    expr = F.lit(int(DEFAULT_RATE * TWO_60))
    for lang, rate in LANG_RATES.items():
        expr = F.when(F.col("lang") == lang, F.lit(int(rate * TWO_60))).otherwise(expr)
    return expr


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language stratified sample: keep a row iff its
    60-bit md5 key < rate(lang) * 2^60. Plan is scan → project →
    filter — ZERO shuffles, trivially parallel at any cluster size, and
    the selected set is a pure function of doc_id (idempotent re-runs,
    consistent incremental appends)."""
    docs = _docs(spark, sf_dir)
    return (
        docs.select("doc_id", "lang", "source", _sample_key().alias("sample_key"))
        .filter(F.col("sample_key") < _rate_threshold())
        .select("doc_id", "lang", "source", "sample_key")
    )


# per-language token budgets for the budgeted mix (en down-weighted as
# the over-represented head, everything else gets the default)
TOKEN_BUDGETS = {"en": 6000}
DEFAULT_TOKEN_BUDGET = 2000


def token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budgeted mixture sampling: admit documents per language, in
    deterministic md5-key order, until the language's TOKEN budget is
    exhausted — how a training mix is actually specified ("100 B tokens
    of en, 30 B of de"), versus stratified_sample's per-row rates.

    The admission set is a pure function of (doc_id, corpus): the md5
    key fixes a global per-language order, so re-runs and different
    cluster sizes admit the identical set, and the boundary document is
    decided by an exact integer cumulative sum, not a float rate.

    Scale note: the exact form is one window (cumulative token sum per
    language ordered by key) — a single shuffle, but each language is
    one window partition, so at 100 TB the swap point (same as
    length_percentiles' exact→approx swap) is: approximate the
    per-language admission-key cutoff from a t-digest over sample_key
    weighted by n_tokens, then admit with a scan + `sample_key <=
    cutoff(lang)` filter — zero total-order anywhere. The window form
    below is the oracle-exact small-SF stand-in; both produce a key
    cutoff, the sketch just finds it without sorting."""
    docs = _docs(spark, sf_dir)
    n_tokens = F.size(F.split(F.trim("text"), "\\s+")).cast("long")
    keyed = docs.select(
        "doc_id",
        "lang",
        n_tokens.alias("n_tokens"),
        _sample_key("tb").alias("sample_key"),
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("lang")
        .orderBy("sample_key", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    budget = F.lit(DEFAULT_TOKEN_BUDGET)
    for lang, b in TOKEN_BUDGETS.items():
        budget = F.when(F.col("lang") == lang, F.lit(b)).otherwise(budget)
    return (
        keyed.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= budget)
        .select("doc_id", "lang", "n_tokens", "cum_tokens")
    )


# sequence-packing shard assignment: tokens per shard at demo SF (at
# scale this is the context-window × sequences-per-shard product, e.g.
# 8192 × 256) and the number of key-range slices the exclusive prefix
# sum is computed over (any power of two; result is slice-count
# invariant, gated in tests).
SHARD_CAPACITY = 2048
PACK_RANGES = 16


def pack_shards(
    spark: SparkSession,
    sf_dir: str,
    capacity: int = SHARD_CAPACITY,
    n_ranges: int = PACK_RANGES,
) -> DataFrame:
    """Sequence packing: assign every document a (shard_id,
    shard_offset) in a token-packed shard layout — the step that turns a
    cleaned corpus into fixed-token training shards. A document is
    placed where its global token prefix sum starts (straddling docs
    belong to the shard they start in; the writer that splits them at
    the boundary is shard-local and embarrassingly parallel after this
    assignment).

    The global order is (60-bit md5 key, doc_id) — deterministic,
    engine-independent, append-stable. The prefix sum is computed WITHOUT
    a global total order: the key space is sliced into ``n_ranges``
    equal integer ranges (the md5 key is uniform, so slices are balanced
    by construction — no sampling, no RangePartitioner nondeterminism),
    per-slice token totals (a tiny ``n_ranges``-row aggregate) roll into
    exclusive slice offsets on the driver, and each slice then runs its
    own window cumsum in parallel. Associativity makes the result
    identical to the single global window the DuckDB oracle runs.

    At 100 TB: the only data-sized shuffle is the per-slice window sort
    (raise n_ranges to executor count × a few); the keyed projection is
    scanned twice (totals + final) — materialize it once alongside the
    dedup intermediates (ops/dedup._materialized pattern) when the scan
    dominates. Driver traffic is n_ranges longs, same budget as the IVF
    centroids."""
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    n_tokens = F.size(F.split(F.trim("text"), "\\s+")).cast("long")
    width = TWO_60 // n_ranges
    keyed = docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        _sample_key("pack").alias("sample_key"),
    ).withColumn("rng", F.expr(f"sample_key DIV {width}"))

    totals = {
        r["rng"]: r["t"]
        for r in keyed.groupBy("rng").agg(F.sum("n_tokens").alias("t")).collect()
    }
    acc = 0
    offsets = []
    for rng in sorted(totals):
        offsets.append((rng, acc))
        acc += totals[rng]
    off_df = spark.createDataFrame(offsets, "rng long, range_offset long")

    w = (
        Window.partitionBy("rng")
        .orderBy("sample_key", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        keyed.join(F.broadcast(off_df), "rng")
        .withColumn(
            "start", F.sum("n_tokens").over(w) + F.col("range_offset") - F.col("n_tokens")
        )
        .select(
            "doc_id",
            "n_tokens",
            F.expr(f"start DIV {capacity}").alias("shard_id"),
            (F.col("start") % capacity).alias("shard_offset"),
        )
    )


def quality_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, lang) corpus accounting: doc/char/word/stopword
    totals plus mean chars — the table a mix designer reads before
    setting sampling rates. One hash aggregate with map-side partials;
    the stratum-key cardinality (sources × langs) is tiny, so the final
    exchange moves only aggregate rows."""
    docs = _docs(spark, sf_dir)
    n_words = F.size(F.split(F.trim("text"), "\\s+"))
    n_stop = F.size(
        F.regexp_extract_all(
            F.lower(F.col("text")), F.lit("\\b(the|a|and|of|to|in|is|for)\\b"), F.lit(0)
        )
    )
    return (
        docs.groupBy("source", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.length("text")).alias("total_chars"),
            F.sum(n_words.cast("long")).alias("total_words"),
            F.sum(n_stop.cast("long")).alias("total_stopwords"),
            F.avg(F.length("text").cast("double")).alias("avg_chars"),
        )
    )


def length_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p90/p99 of document length per language (linear
    interpolation — matches DuckDB quantile_cont). Exact percentile
    sorts within each group; at 100 TB use approx_percentile (t-digest,
    mergeable, one pass) — the swap point is this function body, the
    query shape is identical."""
    docs = _docs(spark, sf_dir)
    pct = F.percentile(F.col("n_chars").cast("double"), F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)))
    return (
        docs.groupBy("lang")
        .agg(F.count("*").alias("n_docs"), pct.alias("p"))
        .select(
            "lang",
            "n_docs",
            F.element_at("p", 1).alias("p50_chars"),
            F.element_at("p", 2).alias("p90_chars"),
            F.element_at("p", 3).alias("p99_chars"),
        )
    )
