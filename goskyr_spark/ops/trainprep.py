"""Composed training-data preparation pipeline — the way the individual
operators in ops/dedup.py and ops/textstats.py are actually consumed by
an LLM-corpus build: exact dedup (keep canonical copy) → language gate →
quality gate → token accounting, as ONE declarative Catalyst plan.

Scale shape: a single shuffle on the 16-byte content digest (the dedup
window); every downstream step is a narrow projection/filter fused into
the same whole-stage-codegen span, so the pipeline costs dedup + one
scan regardless of how many gates are stacked. No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .dedup import _docs_planted


def training_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents (with planted duplicates, see dedup.PLANT_N) →
    deduplicated, English-gated, quality-gated rows with token stats.

    Steps (each is a real filter at corpus scale):
      1. exact dedup: keep the min-doc_id row per md5(text) — one
         hash-partitioned window, 16-byte shuffle key;
      2. language gate: the deterministic function-word vote from
         textstats.lang_id must say 'en';
      3. quality gate (C4/Gopher-style, integer arithmetic only):
         ≥ 10 whitespace tokens and ≥ 1 stopword hit;
      4. output integer token/char/stopword accounting per survivor.
    """
    return training_prep_docs(_docs_planted(spark, sf_dir))


def training_prep_docs(docs: DataFrame) -> DataFrame:
    """The same pipeline over ANY (doc_id, text) DataFrame — e.g. the
    crawl engine's extracted record text (see
    tests/test_integration_pipeline.py: fixtures → crawl → extract →
    training prep as one composed flow)."""
    w = Window.partitionBy(F.md5("text"))
    canon = (
        docs.withColumn("keep_id", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("keep_id"))
        .drop("keep_id")
    )

    def vote(words: str):
        return F.size(
            F.regexp_extract_all(
                F.lower(F.col("text")), F.lit("\\b(" + words + ")\\b"), F.lit(0)
            )
        )

    en, de, es, fr = (
        vote("the|and|of|is|for"),
        vote("der|die|das|und|ist"),
        vote("el|la|los|y|es"),
        vote("le|la|les|et|est"),
    )
    lang_guess = (
        F.when((en >= de) & (en >= es) & (en >= fr) & (en > 0), "en")
        .when((de >= es) & (de >= fr) & (de > 0), "de")
        .when((es >= fr) & (es > 0), "es")
        .when(fr > 0, "fr")
        .otherwise("und")
    )

    n_tokens = F.size(F.split(F.trim("text"), "\\s+"))
    n_stop = F.size(
        F.regexp_extract_all(
            F.lower(F.col("text")),
            F.lit("\\b(the|a|and|of|to|in|is|for)\\b"),
            F.lit(0),
        )
    )

    return (
        canon.select(
            "doc_id",
            n_tokens.alias("n_tokens"),
            F.length("text").alias("n_chars"),
            n_stop.alias("n_stopwords"),
            lang_guess.alias("lang_pred"),
        )
        .filter(
            (F.col("lang_pred") == "en")
            & (F.col("n_tokens") >= 10)
            & (F.col("n_stopwords") >= 1)
        )
    )
