"""Unit tests for the training-data ops: dedup family, similarity
search, text stats, multimodal plumbing. Correctness against
constructed corpora with known answers (the driver's DuckDB oracle
covers the SQL-expressible subset; these cover the rest)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def mini_docs(spark, tmp_path_factory):
    """documents.parquet-shaped table with planted duplicates."""
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tonight")
    far = "completely different content about spark shuffle partitions and joins"
    rows = []
    for i in range(40):
        rows.append((i, f"unique document number {i} with filler words " + " ".join(
            f"w{(i * 7 + j) % 50}" for j in range(20)), "en", "srcA", 0))
    rows += [
        (100, base, "en", "srcA", 0),
        (101, base, "en", "srcA", 0),        # exact dup of 100
        (102, near, "en", "srcA", 0),        # near dup of 100
        (103, far, "en", "srcA", 0),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    p = str(tmp_path_factory.mktemp("minidocs"))
    df.write.mode("overwrite").parquet(p + "/documents.parquet")
    return p


def test_exact_dedup_finds_planted_dup(spark, mini_docs):
    from goskyr_spark.ops.dedup import exact_dedup

    got = exact_dedup(spark, mini_docs).collect()
    assert len(got) == 1
    assert got[0]["canonical_doc_id"] == 100
    assert got[0]["n_copies"] == 2


def test_minhash_lsh_finds_near_dup(spark, mini_docs):
    from goskyr_spark.ops.dedup import minhash_lsh_pairs

    pairs = {(r["doc_a"], r["doc_b"]): r["est_jaccard"] for r in
             minhash_lsh_pairs(spark, mini_docs, threshold=0.5).collect()}
    assert (100, 101) in pairs and pairs[(100, 101)] == 1.0  # exact dup
    assert (100, 102) in pairs  # near dup survives banding + threshold
    assert all(not (a == 103 or b == 103) for a, b in pairs)  # far doc clean


def test_ngram_jaccard_exact_values(spark, mini_docs):
    from goskyr_spark.ops.dedup import ngram_jaccard_pairs

    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in
           ngram_jaccard_pairs(spark, mini_docs, n=3, threshold=0.5).collect()}
    assert got[(100, 101)] == 1.0
    # 13 words → 11 distinct trigrams; only the final trigram differs
    # ('and again today' vs 'and again tonight') → |∩|=10, |∪|=12
    assert got[(100, 102)] == round(10 / 12, 4)


def test_simhash_dup_invariance(spark, mini_docs):
    from goskyr_spark.ops.dedup import simhash_fingerprints

    fp = {r["doc_id"]: r["simhash"] for r in simhash_fingerprints(spark, mini_docs).collect()}
    assert fp[100] == fp[101]  # identical docs → identical fingerprint
    ham_near = bin(fp[100] ^ fp[102]).count("1")
    ham_far = bin(fp[100] ^ fp[103]).count("1")
    assert ham_near < ham_far  # near dup closer in Hamming space


def test_ann_lsh_recall_vs_bruteforce(spark):
    from goskyr_spark.ops.similarity import ann_lsh_topk, cosine_topk

    exact = [r["vec_id"] for r in cosine_topk(spark, SF, k=10).collect()]
    approx = [r["vec_id"] for r in ann_lsh_topk(spark, SF, k=10, n_planes=2).collect()]
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.5, f"LSH recall too low: {recall} (exact={exact}, approx={approx})"


def test_ann_ivf_recall_vs_bruteforce(spark):
    from goskyr_spark.ops.similarity import cosine_topk, ivf_topk

    exact = [r["vec_id"] for r in cosine_topk(spark, SF, k=10).collect()]
    approx = [r["vec_id"] for r in ivf_topk(spark, SF, k=10, n_cells=8, n_probe=4).collect()]
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.5, f"IVF recall too low: {recall}"


def test_doc_fingerprint_shape(spark, mini_docs):
    from goskyr_spark.ops.textstats import doc_fingerprint

    rows = {r["doc_id"]: r for r in doc_fingerprint(spark, mini_docs).collect()}
    assert rows[100]["n_grams"] == rows[101]["n_grams"]
    assert rows[100]["min_fingerprint"] == rows[101]["min_fingerprint"]
    assert rows[100]["n_fingerprints"] <= rows[100]["n_grams"]


def test_multimodal_feature_pipeline(spark):
    from goskyr_spark.ops.multimodal import (
        extract_features,
        fake_decode_features,
        frame_sample_plan,
        synthesize_assets,
    )

    assets = synthesize_assets(spark, n=30)
    feats = extract_features(assets).collect()
    assert len(feats) == 30
    by_id = {r["asset_id"]: r for r in feats}
    # deterministic: recompute one feature locally
    a0 = assets.filter(F.col("asset_id") == 0).first()
    assert by_id[0]["feature"] == pytest.approx(fake_decode_features(bytes(a0["payload"])), rel=1e-5)
    assert by_id[0]["n_bytes"] == len(bytes(a0["payload"]))
    # real decoder is stubbed
    from goskyr_spark.ops.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"xx")
    # frame sampling plan: one row per sampled ts
    plan = frame_sample_plan(assets, every_ms=10000)
    vids = assets.filter("media_type = 'video'").collect()
    want = sum(1 + (v["meta_duration_ms"] - 1) // 10000 for v in vids)
    assert plan.count() == want


def test_quality_signals_values(spark, mini_docs):
    from goskyr_spark.ops.textstats import quality_signals

    r = {x["doc_id"]: x for x in quality_signals(spark, mini_docs).collect()}
    row = r[100]
    text = "the quick brown fox jumps over the lazy dog again and again today"
    assert row["n_chars"] == len(text)
    assert row["n_words"] == len(text.split())
    assert row["n_stopwords"] == 3  # 'the' ×2 + 'and'
    assert row["n_punct"] == 0
