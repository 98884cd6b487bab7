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


def normalize_text(spark: SparkSession, sf_dir: str, plant: bool = True) -> DataFrame:
    """C4/CCNet-style text normalization — the first pass of every
    training-data pipeline: unicode NFC (composes combining marks so
    the SAME visible text hashes identically in the dedup suite
    downstream), control characters → space (C0 minus the whitespace
    ones, plus DEL), whitespace runs collapsed to one space, trimmed.
    Output carries the normalized text, its length, and a changed flag.

    One Arrow-batched mapInPandas pass, zero shuffle, pruned scan —
    same shape as repetition_signals (NFC has no JVM built-in; Python's
    unicodedata is the vectorized-enough path at ~0.1 µs/char).
    Cross-engine parity: Python unicodedata.normalize('NFC') agrees
    with DuckDB's utf8proc nfc_normalize on the planted vectors (and
    trivially on the ASCII corpus); the regex classes are spelled as
    explicit char ranges so RE2 and Python re agree; trim/strip are
    space-only on both sides. ``plant=True`` unions rows carrying a
    combining acute + BEL + tab runs so the result is non-vacuous on
    the ASCII corpus."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    if plant:
        planted = docs.filter(F.col("doc_id") < 5).select(
            (F.col("doc_id") + F.lit(2_000_000)).alias("doc_id"),
            # 'e' + combining acute (NFC-composable), BEL, a tab run, a
            # trailing space — the oracle builds the identical string via
            # chr(101)||chr(769)||chr(7)||chr(9)||chr(9)
            F.lit("Cafee\u0301\x07\t\t menu ").alias("text"),
        )
        docs = docs.unionByName(planted)
    schema = "doc_id long, norm_text string, n_chars int, changed int"

    def _batches(batches):
        import re
        import unicodedata

        import pandas as pd

        ctrl = re.compile(r"[\x00-\x08\x0e-\x1f\x7f]")
        ws = re.compile(r"[ \t\n\x0b\f\r]+")
        for pdf in batches:
            outs = []
            for text in pdf["text"].tolist():
                t = text or ""
                n = unicodedata.normalize("NFC", t)
                n = ctrl.sub(" ", n)
                n = ws.sub(" ", n).strip(" ")
                outs.append((n, len(n), int(n != t)))
            out = pd.DataFrame(outs, columns=["norm_text", "n_chars", "changed"])
            out.insert(0, "doc_id", pdf["doc_id"].to_numpy())
            yield out

    return docs.mapInPandas(_batches, schema)


def repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters: most-common-word count and
    duplicate word-2-gram count per document (high top-word or dup-gram
    fractions mark boilerplate/spam). All integer outputs.

    ZERO-shuffle formulation: the obvious shape (explode words →
    groupBy(doc_id, word) → groupBy(doc_id)) shuffles every token twice;
    here the whole computation stays inside the row as ONE Arrow-batched
    mapInPandas pass (scan → MapInPandas, no Exchange, text+doc_id
    pruned scan — gated in tests/test_plans.py). Per-doc work is a
    Counter over the token list (~0.3 µs/token), so the pass is
    scan-bound at production sizes.

    Two pure-Catalyst forms were benchmarked first and REJECTED: an
    F.aggregate fold carrying a (prev, run, best) struct, and a
    sorted-array run-boundary filter over an index sequence. Both are
    higher-order functions, which whole-stage codegen cannot compile —
    every element evaluation goes through the interpreted path, and
    shared subtrees (the sorted array, the boundary array) are
    re-evaluated per consuming output column. Measured at sf0.1 (5,000
    docs, 271k tokens): boundary form 66-74 s, this Arrow pass < 1 s —
    a case where the "built-ins beat UDFs" default inverts because the
    built-in is interpreted and the UDF is vectorized.

    Token parity with the DuckDB oracle (and the former Catalyst form):
    Java regex \\s = [ \\t\\n\\x0b\\f\\r] (NOT python's unicode \\s),
    trim strips the same ASCII whitespace, lower() is ASCII-safe on
    this corpus."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    schema = (
        "doc_id long, n_words int, n_distinct_words int, top_word_count int, "
        "n_2grams int, n_distinct_2grams int"
    )

    def _batches(batches):
        import re
        from collections import Counter

        import pandas as pd

        java_ws = " \t\n\x0b\f\r"
        split_ws = re.compile(r"[ \t\n\x0b\f\r]+")
        for pdf in batches:
            rows = []
            for text in pdf["text"].tolist():
                toks = split_ws.split((text or "").strip(java_ws).lower())
                counts = Counter(toks)
                n = len(toks)
                if n >= 2:
                    g2 = list(zip(toks, toks[1:]))
                    n2, d2 = len(g2), len(set(g2))
                else:
                    n2, d2 = 0, 0
                rows.append((n, len(counts), max(counts.values()), n2, d2))
            out = pd.DataFrame(
                rows,
                columns=[
                    "n_words",
                    "n_distinct_words",
                    "top_word_count",
                    "n_2grams",
                    "n_distinct_2grams",
                ],
            )
            out.insert(0, "doc_id", pdf["doc_id"].to_numpy())
            yield out

    return docs.mapInPandas(_batches, schema)


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
    # token array MATERIALIZED in its own projection first: a lambda
    # body's reference to an outer expression re-evaluates it PER
    # ELEMENT (the split would run once per gram position — O(n²) token
    # splitting per row); the multi-referenced non-trivial alias blocks
    # CollapseProject, so the transform slices a bound column instead.
    wdf = docs.select(
        "doc_id", F.split(F.trim("text"), "\\s+").alias("ws")
    )
    ws = F.col("ws")
    # single index-guarded pass: positions 1..size-k+1 yield only
    # full-width grams, hashed inside the same transform (the former
    # transform-all + filter-with-a-split-per-gram + second transform
    # shape ran three interpreted HOF passes per row). ANSI guard: the
    # sequence is descending for docs shorter than k tokens.
    gidx = F.sequence(F.lit(1), F.size(ws) - (k - 1))
    gguard = F.when(F.size(ws) >= k, gidx).otherwise(
        F.array().cast("array<int>")
    )
    hashes = F.transform(
        gguard,
        lambda i: F.conv(
            F.substring(F.md5(F.concat_ws(" ", F.slice(ws, i, k))), 1, 15), 16, 10
        ).cast("long"),
    )
    # MATERIALIZE the hash array in its own projection before the
    # sliding-window pass: the window transform references the array
    # once per index, and inlining the md5 expression there makes Spark
    # recompute the ENTIRE hash array per window position — O(n²) md5
    # calls (measured 214 s at sf0.1 vs ~2 s materialized). A multi-
    # referenced non-trivial alias blocks CollapseProject, so the
    # projection boundary is stable.
    h = wdf.select("doc_id", hashes.alias("hs"))
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
