"""CCNet-style paragraph-level deduplication: drop every paragraph
whose exact content has already appeared earlier in the corpus (first
occurrence wins), then reassemble each document from its surviving
paragraphs. This is the boilerplate-removal pass a web-text pipeline
runs between the crawl and document-level dedup — nav bars, footers,
cookie banners, and licence blurbs repeat across millions of pages and
survive document-level near-dup filters because the documents hosting
them differ (CCNet §4.1; the reference's scrape output is exactly such
page text — cf. /root/reference/scrape/scrape.go field extraction,
whose per-item records carry the repeated page chrome this pass
removes).

Paragraph boundary detection is corpus-specific, so the splitter is a
parameter: real web text splits on newlines; the driver's synthetic
``documents`` table is single-line word soup, so the demo splitter is
deterministic fixed-width token chunking (``width`` tokens). Swapping
the splitter changes ONE projection; the dedup/reassembly dataflow —
the part that matters at scale — is identical.

Scale shape (100 TB): two shuffles, both linear in corpus size.
(1) paragraphs explode and shuffle once on the paragraph key for the
first-occurrence window (keyed on xxhash64 of the text — the window
carries the text only for reassembly, never compares it; 64-bit
collisions are the same documented negligible-risk assumption the
shingle tables make). (2) ONE groupBy doc_id reassembles and counts
before/after in the same aggregation (kept paragraphs selected by a
conditional collect_list — no second pass, no totals join). No
self-join, no driver collection, no Python in the row path — chunking
is one index-guarded array transform (built-ins only). Documents whose
splitter yields zero paragraphs (empty text) are absent from the
output, the usual explode semantic; the synthetic corpus has none.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .dedup import _docs_planted

PARA_WIDTH = 20


def chunked_paragraphs(docs: DataFrame, width: int = PARA_WIDTH) -> DataFrame:
    """(doc_id, text) → (doc_id, pos, para): deterministic fixed-width
    token chunks, the demo stand-in for a newline splitter.

    Token array materialized in its own projection (the multi-referenced
    non-trivial alias blocks CollapseProject): a lambda reference to an
    inline split re-tokenizes per element — O(tokens²) per row. One
    index-guarded transform yields the chunks; posexplode_outer + an
    output-null filter instead of plain posexplode so
    InferFiltersFromGenerate cannot push the whole HOF chain into an
    inferred pre-Generate filter (re-evaluated interpreted per conjunct
    per row — see dedup.minhash_signatures_from_shingles)."""
    wdf = docs.select("doc_id", F.split(F.trim("text"), "\\s+").alias("ws"))
    ws = F.col("ws")
    n_chunks = F.ceil(F.size(ws) / F.lit(float(width))).cast("int")
    # sequence() is ANSI-descending for stop < start — guard empty docs
    idx = F.when(n_chunks >= 1, F.sequence(F.lit(0), n_chunks - 1)).otherwise(
        F.array().cast("array<int>")
    )
    chunks = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(ws, i * width + 1, width))
    )
    return (
        wdf.select("doc_id", F.posexplode_outer(chunks).alias("pos", "para"))
        .filter(F.col("para").isNotNull())
        .select("doc_id", F.col("pos").cast("int").alias("pos"), "para")
    )


def paragraph_dedup(
    spark: SparkSession, sf_dir: str, width: int = PARA_WIDTH
) -> DataFrame:
    """Corpus-wide first-occurrence paragraph dedup over the planted
    corpus (documents ∪ exact copies of doc_id < PLANT_N, same
    demo-corpus convention as the document-level dedup ops — the
    planted copies lose every paragraph to their originals, so the
    oracle rows are non-vacuous).

    Returns (doc_id, n_paras, n_kept, text): paragraph counts before and
    after dedup and the reassembled surviving text ('' when everything
    was boilerplate). First occurrence is ordered by (doc_id, pos) —
    deterministic, engine-independent, and append-stable: re-running
    after appending new documents never changes the verdict on an old
    row."""
    docs = _docs_planted(spark, sf_dir)
    paras = chunked_paragraphs(docs, width)
    # shuffle 1: first-occurrence rank per paragraph key
    w = Window.partitionBy(F.xxhash64("para")).orderBy("doc_id", "pos")
    ranked = paras.withColumn("rn", F.row_number().over(w))
    keep = F.col("rn") == 1
    # shuffle 2: ONE conditional aggregation — totals, kept count, and
    # ordered reassembly of the survivors (collect_list skips the nulls
    # the when() emits for dropped paragraphs)
    return ranked.groupBy("doc_id").agg(
        F.count("*").alias("n_paras"),
        F.sum(keep.cast("long")).alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.when(keep, F.struct("pos", "para")))),
                lambda s: s["para"],
            ),
        ).alias("text"),
    )
