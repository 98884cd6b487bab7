"""Text analysis operators for training-data pipelines: token counting,
quality signals, language-ID, document fingerprinting. All JVM-side
built-ins (regexp/length arithmetic) so whole-stage codegen covers the
whole plan; integer outputs so the DuckDB oracle hash-compares exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokens + a BPE-ish subword proxy (runs of letters,
    digits, or single punctuation — the classic pre-tokenizer regex)."""
    docs = _docs(spark, sf_dir)
    ws = F.size(F.split(F.trim("text"), "\\s+"))
    bpe = F.size(F.regexp_extract_all(F.col("text"), F.lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), F.lit(0)))
    return docs.select(
        "doc_id",
        ws.alias("n_ws_tokens"),
        bpe.alias("n_subword_tokens"),
        F.length("text").alias("n_chars"),
    )


def quality_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length / punctuation / stopword counts — the standard cheap
    quality filters (C4/Gopher-style) as integer columns."""
    docs = _docs(spark, sf_dir)
    n_chars = F.length("text")
    n_punct = n_chars - F.length(F.regexp_replace("text", "[.,;:!?]", ""))
    n_digit = n_chars - F.length(F.regexp_replace("text", "[0-9]", ""))
    n_words = F.size(F.split(F.trim("text"), "\\s+"))
    n_stop = F.size(
        F.regexp_extract_all(
            F.lower(F.col("text")), F.lit("\\b(the|a|and|of|to|in|is|for)\\b"), F.lit(0)
        )
    )
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        n_punct.alias("n_punct"),
        n_digit.alias("n_digits"),
        n_stop.alias("n_stopwords"),
    )


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: vote by language-characteristic function
    words. Deterministic CASE chain (en/de/es/fr, else 'und') — the
    real-corpus version swaps in an n-gram model inside a pandas UDF;
    the query shape (scan → project → filter) is identical."""
    docs = _docs(spark, sf_dir)

    def score(words: str):
        return F.size(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("\\b(" + words + ")\\b"), F.lit(0))
        )

    en = score("the|and|of|is|for")
    de = score("der|die|das|und|ist")
    es = score("el|la|los|y|es")
    fr = score("le|la|les|et|est")
    guess = (
        F.when((en >= de) & (en >= es) & (en >= fr) & (en > 0), "en")
        .when((de >= es) & (de >= fr) & (de > 0), "de")
        .when((es >= fr) & (es > 0), "es")
        .when(fr > 0, "fr")
        .otherwise("und")
    )
    return docs.select("doc_id", "lang", guess.alias("lang_guess"))


# PII patterns chosen to parse identically under Java regex (Spark) and
# RE2 (DuckDB): no backrefs, no lookaround, \b and \d only. Applied in
# a fixed order (email → phone → ipv4) on both sides so overlapping
# matches resolve the same way.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("phone", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
]


def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub for training corpora: count + replace emails, phone
    numbers, and IPv4 addresses with typed placeholders. Pure
    regexp_count/regexp_replace chain — whole-stage codegen, no UDF, no
    shuffle (per-row map). Output carries match counts per category and
    the md5 of the redacted text (compact exact equality for the
    oracle without shipping full redacted bodies through the compare).
    """
    docs = _docs(spark, sf_dir)
    counts = [
        F.regexp_count(F.col("text"), F.lit(pat)).alias(f"n_{name}") for name, pat in PII_PATTERNS
    ]
    red = F.col("text")
    for name, pat in PII_PATTERNS:
        red = F.regexp_replace(red, pat, f"<{name.upper()}>")
    return docs.select("doc_id", *counts, F.md5(red).alias("redacted_md5"))


def repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters: most-common-word count and
    duplicate word-2-gram count per document (high top-word or dup-gram
    fractions mark boilerplate/spam). All integer outputs.

    ZERO-shuffle formulation: the obvious shape (explode words →
    groupBy(doc_id, word) → groupBy(doc_id)) shuffles every token twice;
    here the whole computation stays inside the row. The mode count
    comes from the sorted token array's RUN BOUNDARIES — the 0-based
    positions where the value changes (filter over an index sequence;
    ``F.get`` is total, so no ANSI out-of-bounds guard needed) — the
    longest gap between consecutive boundaries IS the top word count,
    and the boundary count IS the distinct count (one array_distinct
    avoided). An earlier F.aggregate fold carrying a (prev, run, best)
    struct per token measured ~5× slower: higher-order lambdas are
    interpreted, so per-element struct construction dominates; the
    boundary form does only int/get comparisons per element. 2-grams
    are one zip_with of the token array against its shift, not a
    per-index transform+slice. Whole plan is scan → project; swap to
    the explode form only for pathological single-docs (100 M tokens)
    where per-row work needs to be split across tasks."""
    docs = _docs(spark, sf_dir)
    words = F.array_sort(F.split(F.lower(F.trim("text")), "\\s+"))
    n = F.size(words)
    # 0-based run starts in the sorted array, plus an n sentinel; null
    # from get(words, -1) makes (i == 0) | (w[i] != w[i-1]) TRUE|NULL.
    bounds = F.concat(
        F.filter(
            F.sequence(F.lit(0), n - 1),
            lambda i: (i == 0) | (F.get(words, i) != F.get(words, i - 1)),
        ),
        F.array(n),
    )
    nb = F.size(bounds)
    runs = F.zip_with(
        F.slice(bounds, 2, nb - 1), F.slice(bounds, 1, nb - 1), lambda b, a: b - a
    )
    toks = F.split(F.lower(F.trim("text")), "\\s+")
    grams2 = F.when(
        F.size(toks) >= 2,
        F.zip_with(
            F.slice(toks, 1, F.size(toks) - 1),
            F.slice(toks, 2, F.size(toks) - 1),
            lambda x, y: F.concat_ws(" ", x, y),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return docs.select(
        "doc_id",
        n.alias("n_words"),
        (nb - 1).alias("n_distinct_words"),
        F.array_max(runs).alias("top_word_count"),
        F.size(grams2).alias("n_2grams"),
        F.size(F.array_distinct(grams2)).alias("n_distinct_2grams"),
    )


def doc_fingerprint(spark: SparkSession, sf_dir: str, k: int = 5, window: int = 4) -> DataFrame:
    """Winnowing fingerprint (Schleimer et al., SIGMOD'03): k-gram
    rolling hashes → min hash within each sliding window → distinct
    selected hashes per doc. Used for plagiarism-style containment
    detection. Built-ins only: transform over index arrays.

    Gram hash = first 60 bits of md5 (conv(substr(md5,1,15),16,10)) —
    md5 is available identically in DuckDB ('0x'||substr cast), so the
    fingerprints are oracle-checkable end-to-end; xxhash64 would be
    marginally cheaper but has no DuckDB counterpart. The per-gram md5
    makes this the heaviest per-row op in the module, so an
    under-parallel small scan is spread (no-op at production sizes)."""
    from .scanutil import spread_small_scan

    docs = spread_small_scan(
        spark, _docs(spark, sf_dir), f"{sf_dir}/documents.parquet"
    )
    words = F.split(F.trim("text"), "\\s+")
    grams = F.filter(
        F.transform(words, lambda w, i: F.concat_ws(" ", F.slice(words, i + 1, k))),
        lambda g: F.size(F.split(g, " ")) >= k,
    )
    hashes = F.transform(
        grams, lambda g: F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("long")
    )
    # MATERIALIZE the hash array in its own projection before the
    # sliding-window pass: the window transform references the array
    # once per index, and inlining the md5 expression there makes Spark
    # recompute the ENTIRE hash array per window position — O(n²) md5
    # calls (measured 214 s at sf0.1 vs ~2 s materialized). A multi-
    # referenced non-trivial alias blocks CollapseProject, so the
    # projection boundary is stable.
    h = docs.select("doc_id", hashes.alias("hs"))
    hs = F.col("hs")
    # windows of `window` consecutive hashes → min each → distinct.
    # sequence() is guarded: stop < start would yield a DESCENDING range.
    idx = F.sequence(F.lit(1), F.greatest(F.size(hs) - window + 1, F.lit(1)))
    mins = F.when(F.size(hs) == 0, F.array().cast("array<bigint>")).otherwise(
        F.transform(idx, lambda i: F.array_min(F.slice(hs, i, window)))
    )
    return h.select(
        "doc_id",
        F.size(hs).alias("n_grams"),
        F.array_sort(F.array_distinct(mins)).alias("fingerprints"),
    ).select(
        "doc_id",
        "n_grams",
        F.size("fingerprints").alias("n_fingerprints"),
        F.try_element_at("fingerprints", F.lit(1)).alias("min_fingerprint"),
    )
