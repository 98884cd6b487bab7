"""Deduplication family for large-scale text corpora — first-class
pipeline operators alongside the crawl (a web-scale crawl's output IS a
training corpus; dedup is the first thing run on it).

All of these stay JVM-side (built-in functions over exploded arrays);
the only Python is dataframe assembly. Scale design per operator in its
docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

MERSENNE_P = (1 << 61) - 1


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate groups by content hash: one shuffle on md5(text);
    the canonical survivor is the min doc_id (deterministic). At 100 TB
    the groupBy key is the 128-bit digest, not the text — only 16 bytes
    per row shuffle."""
    docs = _docs(spark, sf_dir)
    return (
        docs.select("doc_id", F.md5("text").alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .filter(F.col("n_copies") > 1)
    )


def char_jaccard_pairs(spark: SparkSession, sf_dir: str, threshold: float = 0.92) -> DataFrame:
    """Character-set Jaccard near-dup pairs with blocking on ``source``:
    the self-join runs only within blocks (at scale the blocking key is a
    cheap sketch — length bucket × LSH band — never a full cross join).
    Char-set Jaccard = |set(a)∩set(b)| / |set(a)∪set(b)| over distinct
    characters, computed with array_intersect/array_union (JVM-side)."""
    docs = _docs(spark, sf_dir).select(
        "doc_id",
        "source",
        F.array_distinct(F.split("text", "")).alias("chars"),
    )
    a = docs.alias("a")
    b = docs.alias("b")
    inter = F.size(F.array_intersect(F.col("a.chars"), F.col("b.chars")))
    union = F.size(F.array_union(F.col("a.chars"), F.col("b.chars")))
    jac = inter / union
    return (
        a.join(b, (F.col("a.source") == F.col("b.source")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(jac, 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str, n: int = 3, threshold: float = 0.8) -> DataFrame:
    """Word n-gram Jaccard near-dup pairs via inverted index — NOT a self
    join: explode n-grams, hash them, self-join the (gram → doc) posting
    list, count shared grams per pair, then Jaccard from
    |A∩B| / (|A|+|B|−|A∩B|). Shuffles are keyed on gram hash and the
    (doc_a, doc_b) pair — linear in corpus n-gram volume, not quadratic
    in documents. Hot grams (stopword runs) are the skew risk at scale:
    drop grams with document frequency above a cap before the pair join.
    """
    docs = _docs(spark, sf_dir)
    grams = (
        docs.select(
            "doc_id",
            F.array_distinct(
                F.transform(
                    F.filter(
                        F.transform(
                            F.split(F.trim("text"), "\\s+"),
                            lambda w, i: F.concat_ws(
                                " ",
                                F.slice(F.split(F.trim(F.col("text")), "\\s+"), i + 1, n),
                            ),
                        ),
                        lambda g: F.size(F.split(g, " ")) >= n,
                    ),
                    lambda g: F.xxhash64(g),
                )
            ).alias("grams"),
        )
    )
    sizes = grams.select("doc_id", F.size("grams").alias("n_grams"))
    posting = grams.select("doc_id", F.explode("grams").alias("gram"))
    # document-frequency cap: grams present in >1% of docs carry no signal
    df_cap = posting.groupBy("gram").count().filter(F.col("count") <= 50).select("gram")
    posting = posting.join(df_cap, "gram", "left_semi")
    pairs = (
        posting.alias("x")
        .join(posting.alias("y"), "gram")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .groupBy(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return (
        pairs.join(sizes.withColumnsRenamed({"doc_id": "doc_a", "n_grams": "ga"}), "doc_a")
        .join(sizes.withColumnsRenamed({"doc_id": "doc_b", "n_grams": "gb"}), "doc_b")
        .withColumn("jaccard", F.round(F.col("shared") / (F.col("ga") + F.col("gb") - F.col("shared")), 4))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "shared", "jaccard")
    )


def minhash_signatures(docs: DataFrame, n_perm: int = 64, shingle_k: int = 3, seed: int = 13) -> DataFrame:
    """MinHash signatures: shingle → xxhash64 → n_perm universal-hash
    permutations ((a·h + b) mod p) → per-doc min of each. All built-ins:
    explode + groupBy(doc).agg(64 × min). One shuffle on doc_id with full
    map-side partial aggregation (each of the 64 mins combines locally)."""
    import random

    rnd = random.Random(seed)
    coeffs = [(rnd.randrange(1, 1 << 31), rnd.randrange(0, 1 << 31)) for _ in range(n_perm)]

    words = F.split(F.trim("text"), "\\s+")
    shingles = F.array_distinct(
        F.filter(
            F.transform(words, lambda w, i: F.concat_ws(" ", F.slice(words, i + 1, shingle_k))),
            lambda g: F.size(F.split(g, " ")) >= shingle_k,
        )
    )
    # h is reduced to 31 bits and a,b < 2^31 so a·h+b < 2^62 — no long
    # overflow (Spark 4 runs ANSI mode; overflow would throw).
    sh = docs.select("doc_id", F.explode(shingles).alias("shingle")).select(
        "doc_id", F.pmod(F.xxhash64("shingle"), F.lit(1 << 31)).alias("h")
    )
    aggs = [
        F.min((F.col("h") * F.lit(a) + F.lit(b)) % F.lit(MERSENNE_P)).alias(f"mh{i}")
        for i, (a, b) in enumerate(coeffs)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(
    spark: SparkSession,
    sf_dir: str,
    n_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash + LSH banding: signature → ``bands`` band-hashes →
    candidate pairs = docs sharing a band bucket → estimated Jaccard =
    fraction of matching signature components. The band groupBy bounds
    the join fan-out; n_perm/bands tunes the S-curve. At 100 TB this is
    the standard near-dup path (the exact n-gram join is the verifier
    for the candidate residue only)."""
    docs = _docs(spark, sf_dir)
    # pack the 64 per-permutation mins into ONE array column right after
    # the aggregation: the banding hashes and the match count then work
    # on array slices/zip_with instead of 64-wide column lists — keeps
    # whole-stage codegen compilation (the dominant cost of wide plans)
    # linear, and the signature persists once for its three consumers
    rows_per_band = n_perm // bands
    sig = (
        minhash_signatures(docs, n_perm, shingle_k)
        .select("doc_id", F.array(*[f"mh{i}" for i in range(n_perm)]).alias("sig"))
        .persist()
    )
    band_cols = [
        F.xxhash64(F.slice("sig", b * rows_per_band + 1, rows_per_band)).alias(f"band{b}")
        for b in range(bands)
    ]
    banded = sig.select("doc_id", *band_cols)
    stack_expr = "stack({}, {}) as (band_idx, band_hash)".format(
        bands, ", ".join(f"{b}, band{b}" for b in range(bands))
    )
    long = banded.select("doc_id", F.expr(stack_expr))
    pairs = (
        long.alias("x")
        .join(long.alias("y"), ["band_idx", "band_hash"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )
    siga = sig.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    sigb = sig.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    matches = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v)
    )
    return (
        pairs.join(siga, "doc_a")
        .join(sigb, "doc_b")
        .withColumn("est_jaccard", F.round(matches / F.lit(n_perm), 4))
        .filter(F.col("est_jaccard") >= threshold)
        .select("doc_a", "doc_b", "est_jaccard")
    )


def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document: token → xxhash64; each bit position
    votes ±1 weighted by token frequency; fingerprint bit b = sign of the
    vote sum. Pure built-ins: explode tokens → 64 conditional sums →
    bit-OR assembly. Near-dup candidates at scale = fingerprints within
    Hamming distance d, found by pigeonhole banding of the 64 bits (same
    LSH trick as minhash bands)."""
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), "\\s+")).alias("tok")
    ).select("doc_id", F.xxhash64("tok").alias("h"))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(64)
    ]
    v = toks.groupBy("doc_id").agg(*votes)
    fp = None
    for b in range(64):
        bit = F.when(F.col(f"v{b}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, b)
        fp = term if fp is None else fp.bitwiseXOR(term)
    return v.select("doc_id", fp.alias("simhash"))


def embedding_cosine_dups(spark: SparkSession, sf_dir: str, threshold: float = 0.99) -> DataFrame:
    """Embedding-cosine near-duplicates: pairs with cosine ≥ threshold,
    blocked by coarse LSH sign-bucket so the pair join is within-bucket
    only (see similarity.py for the bucketing math)."""
    from .similarity import with_norm, hyperplane_bucket

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    e = with_norm(emb.select("vec_id", "embedding"))
    e = e.withColumn("bucket", hyperplane_bucket(F.col("embedding"), n_planes=4))
    a, b = e.alias("a"), e.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.embedding"), F.col("b.embedding"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cos = dot / (F.col("a.norm") * F.col("b.norm"))
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .withColumn("cosine", F.round(cos, 4))
        .filter(F.col("cosine") >= threshold)
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"), "cosine")
    )
