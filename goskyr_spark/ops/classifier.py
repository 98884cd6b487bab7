"""fastText-style linear quality classifier — the model-based document
filter every LLM-data pipeline runs after the heuristic gates (CCNet /
DCLM both score documents with a linear bag-of-words model; the lmscore
op is the perplexity variant, this is the classifier variant).

Serving shape, which is the part that matters at 100 TB:

* the MODEL is data: an in-vocabulary (token → weight) table joined in
  as a BROADCAST (a real fastText vocab is ~10^6 rows ≈ tens of MB —
  comfortably broadcastable; the quantized-hash-bucket tail rides as an
  expression, no table at all);
* out-of-vocabulary tokens get a hashing-trick weight — the 60-bit md5
  prefix mapped to [-1, 1) and damped — exactly fastText's bucket
  hashing, and the same cross-engine-deterministic md5 key the sampling
  ops use (no RNG, no floats that depend on platform math libraries);
* score = mean token weight, ROUNDed to 6 dp (the repo's summation-
  order cushion), label = keep iff rounded score ≥ threshold.

Plan: scan → codegen tokenize → posexplode_outer (NEVER a bare explode
over an inline array — see CLAUDE.md's InferFiltersFromGenerate trap)
→ broadcast left join on the vocab → ONE hash aggregate on doc_id.
Tokens never shuffle by value; the only exchange keys on doc_id.

The sign convention of the demo vocab: query-engine prose ("join",
"filter", "vector", …) votes keep; filler/spam-ish tokens vote drop.
With the hash tail damped to ±0.05 the in-vocab signal dominates, so
the label is a real classification, not hash noise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# (token, weight): the "pretrained" linear model. Real pipelines load
# this from the trained model file; weights here are fixed constants so
# the DuckDB oracle can embed them as VALUES.
VOCAB: tuple[tuple[str, float], ...] = (
    ("join", 0.9), ("filter", 0.8), ("vector", 0.7), ("hash", 0.6),
    ("merge", 0.6), ("scan", 0.5), ("column", 0.5), ("query", 0.4),
    ("table", 0.3), ("batch", 0.3),
    ("slow", -0.8), ("small", -0.4), ("big", -0.3), ("a", -0.2),
    ("the", -0.2), ("value", -0.1),
)
OOV_SCALE = 0.05  # damping of the hashing-trick tail
THRESHOLD = 0.05
TOKEN_RE = "[a-z0-9]+"
_KEY_DEN = float(1 << 60)


def _oov_weight(tok_col):
    """60-bit md5 prefix → [-1, 1), × OOV_SCALE. Identical in DuckDB:
    (CAST('0x'||substr(md5('qw:'||tok),1,15) AS BIGINT)/2^60*2-1)·s."""
    key = F.conv(
        F.substring(F.md5(F.concat(F.lit("qw:"), tok_col)), 1, 15), 16, 10
    ).cast("long")
    return (key.cast("double") / F.lit(_KEY_DEN) * 2.0 - 1.0) * F.lit(OOV_SCALE)


def quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    vocab = spark.createDataFrame(list(VOCAB), schema="tok string, w double")
    toks = docs.select(
        "doc_id",
        F.posexplode_outer(
            F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RE), F.lit(0))
        ).alias("pos", "tok"),
    ).filter(F.col("tok").isNotNull())
    weighted = toks.join(F.broadcast(vocab), "tok", "left").select(
        "doc_id", F.coalesce(F.col("w"), _oov_weight(F.col("tok"))).alias("w")
    )
    scored = weighted.groupBy("doc_id").agg(
        F.round(F.avg("w"), 6).alias("score"),
        F.count("*").cast("int").alias("n_tokens"),
    )
    return scored.select(
        "doc_id", "score", "n_tokens",
        (F.col("score") >= F.lit(THRESHOLD)).alias("keep"),
    )


def quality_classifier_oracle_sql() -> str:
    vocab_rows = ",\n            ".join(f"('{t}', {w!r})" for t, w in VOCAB)
    return f"""
        WITH vocab(tok, w) AS (VALUES
            {vocab_rows}),
        toks AS (
            SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS tok
            FROM documents),
        weighted AS (
            SELECT t.doc_id,
                   COALESCE(v.w,
                       (CAST('0x' || substr(md5('qw:' || t.tok), 1, 15) AS BIGINT)
                        / {_KEY_DEN!r} * 2.0 - 1.0) * {OOV_SCALE!r}) AS w
            FROM toks t LEFT JOIN vocab v ON v.tok = t.tok),
        scored AS (
            SELECT doc_id, ROUND(AVG(w), 6) AS score,
                   CAST(COUNT(*) AS INTEGER) AS n_tokens
            FROM weighted GROUP BY doc_id)
        SELECT doc_id, score, n_tokens, (score >= {THRESHOLD!r}) AS keep
        FROM scored
    """
