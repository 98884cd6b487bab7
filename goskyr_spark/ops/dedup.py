"""Deduplication family for large-scale text corpora — first-class
pipeline operators alongside the crawl (a web-scale crawl's output IS a
training corpus; dedup is the first thing run on it).

Architecture (round-2): every near-dup operator is CANDIDATES → VERIFY.
Candidate generation is always bounded (LSH banding / posting-list
join with a document-frequency cap) — never an unblocked self-join —
and the exact similarity (shingle Jaccard, char Jaccard, cosine) is
computed only on the candidate residue. That is the 100-TB shape: the
shuffle volume is linear in corpus size (banding) and the quadratic
work is confined to the tiny candidate set. It is also what makes the
operators ORACLE-CHECKABLE: the verified output equals the all-pairs
exact-similarity result whenever banding recall is 1, which DuckDB can
compute directly (the driver's CORRECTNESS gate does exactly this at
sf0.01, where recall is 1 by measurement: P(miss | J≥0.8) ≈ 2e-4 per
pair with 16 bands × 4 rows, and 0 of the 25 true pairs are missed).

All similarity math stays JVM-side (built-in functions over exploded
arrays); the only Python is dataframe assembly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MERSENNE_P = (1 << 61) - 1

# Planted-duplicate demo corpus: the driver's synthetic documents table
# is duplicate-free at small SF, which would make exact-dedup oracles
# vacuous (0 == 0). The demo queries run on documents ∪ exact copies of
# doc_id < PLANT_N (re-numbered +PLANT_OFFSET); the DuckDB oracle builds
# the identical union, so the oracle rows are non-vacuous and verify
# that planted dups are found and nothing else is invented.
PLANT_N = 25
PLANT_OFFSET = 1_000_000


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _docs_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    copies = docs.filter(F.col("doc_id") < PLANT_N).withColumn(
        "doc_id", F.col("doc_id") + F.lit(PLANT_OFFSET)
    )
    return docs.unionByName(copies)


# ---------------------------------------------------------------- exact

def exact_dedup_groups(docs: DataFrame) -> DataFrame:
    """Exact duplicate groups by content hash: one shuffle on md5(text);
    the canonical survivor is the min doc_id (deterministic). At 100 TB
    the groupBy key is the 128-bit digest, not the text — only 16 bytes
    per row shuffle."""
    return (
        docs.select("doc_id", F.md5("text").alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .filter(F.col("n_copies") > 1)
    )


def exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Demo entry on the planted corpus (see PLANT_N) so the oracle row
    is non-vacuous: exactly PLANT_N duplicate groups must come back."""
    return exact_dedup_groups(_docs_planted(spark, sf_dir))


# ------------------------------------------------------ shingle helpers

def _shingle_arrays(docs: DataFrame, k: int = 3) -> DataFrame:
    """(doc_id, shingles: array<long>) — distinct word-k-gram xxhash64
    per doc. Hash identity stands in for string identity (64-bit
    collisions are negligible below ~2^32 distinct grams; the DuckDB
    oracle uses the strings directly and agrees)."""
    words = F.split(F.trim("text"), "\\s+")
    grams = F.array_distinct(
        F.filter(
            F.transform(words, lambda w, i: F.concat_ws(" ", F.slice(words, i + 1, k))),
            lambda g: F.size(F.split(g, " ")) >= k,
        )
    )
    return docs.select(
        "doc_id", F.transform(grams, lambda g: F.xxhash64(g)).alias("shingles")
    )


def _verify_exact_jaccard(
    pairs: DataFrame, shingles: DataFrame, threshold: float
) -> DataFrame:
    """pairs(doc_a, doc_b) → + exact shingle Jaccard, filtered ≥
    threshold. Runs only on the candidate residue (two hash joins
    against the shingle table), never all-pairs."""
    sa = shingles.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    sb = shingles.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", F.round(inter / union, 4))
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------- char

def char_jaccard_pairs(spark: SparkSession, sf_dir: str, threshold: float = 0.92) -> DataFrame:
    """Character-set Jaccard near-dup pairs, demo form: the self-join is
    blocked on ``source`` (bounded blocks at sandbox SF; the sf0.01
    oracle compares this form). The SCALE path is
    ``char_jaccard_lsh_pairs`` below — same metric, candidates from
    minhash banding instead of a blocked self-join."""
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


def char_jaccard_lsh_pairs(
    spark: SparkSession,
    sf_dir: str,
    char_threshold: float = 0.92,
    jaccard_threshold: float = 0.8,
) -> DataFrame:
    """Scale-safe char-Jaccard: minhash-LSH banding generates the
    candidate pairs (bounded fan-out — no unblocked self-join anywhere
    in the plan), the residue is verified with exact shingle Jaccard ≥
    ``jaccard_threshold`` AND char-set Jaccard ≥ ``char_threshold``.
    Output equals the all-pairs (shingle-J, char-J) filter whenever
    banding recall is 1 — which the DuckDB oracle checks."""
    docs = _docs(spark, sf_dir)
    shingles = _shingle_arrays(docs)
    cand = minhash_band_candidates(docs)
    verified = _verify_exact_jaccard(cand, shingles, jaccard_threshold)
    chars = docs.select("doc_id", F.array_distinct(F.split("text", "")).alias("chars"))
    ca = chars.select(F.col("doc_id").alias("doc_a"), F.col("chars").alias("ch_a"))
    cb = chars.select(F.col("doc_id").alias("doc_b"), F.col("chars").alias("ch_b"))
    cj = F.size(F.array_intersect("ch_a", "ch_b")) / F.size(F.array_union("ch_a", "ch_b"))
    return (
        verified.join(ca, "doc_a")
        .join(cb, "doc_b")
        .withColumn("char_jaccard", F.round(cj, 4))
        .filter(F.col("char_jaccard") >= char_threshold)
        .select("doc_a", "doc_b", "char_jaccard")
    )


# -------------------------------------------------------------- n-gram

def ngram_jaccard_pairs(
    spark: SparkSession,
    sf_dir: str,
    n: int = 3,
    threshold: float = 0.8,
    df_cap: int | None = None,
) -> DataFrame:
    """Word n-gram Jaccard near-dup pairs via inverted index — NOT a self
    join: explode n-grams, hash them, self-join the (gram → doc) posting
    list, count shared grams per pair, then Jaccard from
    |A∩B| / (|A|+|B|−|A∩B|). Shuffles are keyed on gram hash and the
    (doc_a, doc_b) pair — linear in corpus n-gram volume, not quadratic
    in documents.

    Hot grams (stopword runs) are the skew risk at scale: grams with
    document frequency above ``df_cap`` are dropped from the posting
    list BEFORE the pair join. The cap is derived from the corpus size
    (max(50, 1% of docs)) unless passed explicitly, and the per-doc
    sizes |A|,|B| are computed over the SAME capped posting list, so
    the reported jaccard is the exact Jaccard of the capped gram
    universe (unbiased w.r.t. the metric it claims)."""
    docs = _docs(spark, sf_dir)
    if df_cap is None:
        df_cap = max(50, int(0.01 * docs.count()))
    words = F.split(F.trim("text"), "\\s+")
    grams = F.array_distinct(
        F.filter(
            F.transform(words, lambda w, i: F.concat_ws(" ", F.slice(words, i + 1, n))),
            lambda g: F.size(F.split(g, " ")) >= n,
        )
    )
    posting = docs.select(
        "doc_id", F.explode(F.transform(grams, lambda g: F.xxhash64(g))).alias("gram")
    )
    keep = posting.groupBy("gram").count().filter(F.col("count") <= df_cap).select("gram")
    posting = posting.join(keep, "gram", "left_semi")
    sizes = posting.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
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


# ------------------------------------------------------------- minhash

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


def minhash_band_candidates(
    docs: DataFrame, n_perm: int = 64, bands: int = 16, shingle_k: int = 3
) -> DataFrame:
    """Candidate pairs (doc_a < doc_b) sharing at least one LSH band
    bucket. Signature is array-packed (keeps whole-stage codegen
    compilation linear in n_perm) and banded via ``stack`` → ONE
    groupBy-join keyed on (band_idx, band_hash) — fan-out bounded by
    bucket sizes, never an unblocked self-join."""
    rows_per_band = n_perm // bands
    sig = minhash_signatures(docs, n_perm, shingle_k).select(
        "doc_id", F.array(*[f"mh{i}" for i in range(n_perm)]).alias("sig")
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
    return (
        long.alias("x")
        .join(long.alias("y"), ["band_idx", "band_hash"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )


def minhash_est_pairs(
    spark: SparkSession,
    sf_dir: str,
    n_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash + LSH with ESTIMATED Jaccard (fraction of matching
    signature components) — the cheap screening form; estimator accuracy
    is unit-tested against exact Jaccard (tests/test_ops.py)."""
    docs = _docs(spark, sf_dir)
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


def minhash_lsh_pairs(
    spark: SparkSession,
    sf_dir: str,
    n_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """MinHash + LSH banding with EXACT verification: banding generates
    candidates (bounded fan-out; the S-curve of 16 bands × 4 rows makes
    P(candidate | J≥0.8) ≈ 1), then the exact shingle Jaccard is
    computed on the residue and filtered ≥ threshold. This is the
    standard 100-TB near-dup pipeline (banding = linear shuffle,
    verification = quadratic only within candidates), and its output is
    oracle-checkable: equals DuckDB's all-pairs exact Jaccard filter
    when recall is 1 (measured 25/25 on the sf0.01 corpus)."""
    docs = _docs(spark, sf_dir)
    cand = minhash_band_candidates(docs, n_perm, bands, shingle_k)
    verified = _verify_exact_jaccard(cand, _shingle_arrays(docs, shingle_k), threshold)
    return verified.select("doc_a", "doc_b", "jaccard")


# ------------------------------------------------------------- simhash

def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document: token → xxhash64; each bit position
    votes ±1 weighted by token frequency; fingerprint bit b = sign of the
    vote sum. Pure built-ins: explode tokens → 64 conditional sums →
    bit-OR assembly."""
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


def simhash_dup_pairs(
    spark: SparkSession,
    sf_dir: str,
    bands: int = 8,
    threshold: float = 0.8,
    hamming_max: int = 16,
) -> DataFrame:
    """SimHash near-dup pairs: the 64-bit fingerprint is cut into
    ``bands`` 8-bit bands (pigeonhole: any pair within Hamming distance
    < bands shares at least one exact band) → candidate pairs sharing a
    band value → CHEAP Hamming prune (bit_count(xor) ≤ hamming_max on
    the two 8-byte fingerprints — JVM-side, before any array join) →
    EXACT shingle-Jaccard verification ≥ threshold on the survivors.

    The Hamming prune matters because same-distribution corpora
    correlate simhash bits: banding alone admits ~N²/corpus-diversity
    candidates (measured 67k candidates for 500 synthetic docs), and
    joining shingle arrays onto all of them dominated the runtime. Any
    pair with shingle-J ≥ 0.8 sits far inside Hamming ≤ 16 of 64 (the
    planted/natural near-dups here measure ≤ 8), so the prune cannot
    drop a true pair while cutting the expensive join ~50×."""
    docs = _docs(spark, sf_dir)
    fp = simhash_fingerprints(spark, sf_dir).persist()
    width = 64 // bands
    band_cols = [
        F.shiftrightunsigned(F.col("simhash"), b * width)
        .bitwiseAND(F.lit((1 << width) - 1))
        .alias(f"band{b}")
        for b in range(bands)
    ]
    banded = fp.select("doc_id", *band_cols)
    stack_expr = "stack({}, {}) as (band_idx, band_val)".format(
        bands, ", ".join(f"{b}, band{b}" for b in range(bands))
    )
    long = banded.select("doc_id", F.expr(stack_expr))
    cand = (
        long.alias("x")
        .join(long.alias("y"), ["band_idx", "band_val"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )
    fa = fp.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("fp_a"))
    fb = fp.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("fp_b"))
    pruned = (
        cand.join(fa, "doc_a")
        .join(fb, "doc_b")
        .filter(F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))) <= hamming_max)
        .select("doc_a", "doc_b")
    )
    verified = _verify_exact_jaccard(pruned, _shingle_arrays(docs), threshold)
    return verified.select("doc_a", "doc_b", "jaccard")


# ----------------------------------------------------------- embedding

def embedding_cosine_dups(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.99,
    n_planes: int = 24,
    bands: int = 6,
    plant: bool = True,
) -> DataFrame:
    """Embedding-cosine near-duplicates, banded sign-LSH: ``n_planes``
    hyperplane sign bits are cut into ``bands`` bands (4 bits each by
    default); candidate pairs share at least one band value; cosine is
    computed (in double) only on the candidate residue. Banding bounds
    the within-bucket quadratic blowup that a single coarse bucket
    would have (the round-1 form used 4 planes = 16 buckets ⇒ ~N²/16
    pairs; 6 bands of 4 keeps P(candidate | cos≥0.99) ≈ 1-2e-5 while
    random pairs collide on a band with p ≈ 6/16 at 4 bits — at scale
    raise n_planes with corpus size, e.g. 64 planes / 8 bands at 10⁹
    vectors, and the band value becomes the table partition key).

    ``plant=True`` unions exact copies of vec_id < PLANT_N so the
    result (and its DuckDB all-pairs oracle) is non-vacuous — the
    driver corpus has no natural cos ≥ 0.99 pair (measured max 0.513).
    """
    from .similarity import dot, hyperplane_band_values, with_norm

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    if plant:
        copies = emb.filter(F.col("vec_id") < PLANT_N).withColumn(
            "vec_id", F.col("vec_id") + F.lit(PLANT_OFFSET)
        )
        emb = emb.unionByName(copies)
    e = with_norm(emb)
    bvals = hyperplane_band_values(F.col("embedding"), n_planes=n_planes, bands=bands)
    banded = e.select("vec_id", *[b.alias(f"band{i}") for i, b in enumerate(bvals)])
    stack_expr = "stack({}, {}) as (band_idx, band_val)".format(
        bands, ", ".join(f"{b}, band{b}" for b in range(bands))
    )
    long = banded.select("vec_id", F.expr(stack_expr))
    cand = (
        long.alias("x")
        .join(long.alias("y"), ["band_idx", "band_val"])
        .filter(F.col("x.vec_id") < F.col("y.vec_id"))
        .select(F.col("x.vec_id").alias("vec_a"), F.col("y.vec_id").alias("vec_b"))
        .distinct()
    )
    ea = e.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"), F.col("norm").alias("norm_a"))
    eb = e.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b"), F.col("norm").alias("norm_b"))
    cos = dot(F.col("emb_a"), F.col("emb_b")) / (F.col("norm_a") * F.col("norm_b"))
    return (
        cand.join(ea, "vec_a")
        .join(eb, "vec_b")
        .withColumn("cosine", F.round(cos, 4))
        .filter(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", "cosine")
    )
