"""Partitioned bloom-filter URL-seen set (north_star: "partitioned
bloom-filter URL-seen set … keyed by canonicalized-URL xxhash64").

The seen set is sharded into ``n_buckets`` buckets by
``url_hash % n_buckets``; each bucket owns an independent bloom bitset
stored as ONE binary row. At 10^10 URLs with 10 bits/key that is
~12.5 GB of bitsets total — e.g. 4096 buckets × ~3 MB — which join
bucket-to-bucket against candidate partitions (co-partitioned on the
same key), never broadcast, never driver-collected.

Usage per crawl round:

1. ``filter_unseen(candidates, blooms)`` — bucket-join + vectorized
   membership test. Bloom-negative rows are DEFINITELY unseen and pass
   through; bloom-positive rows are "maybe seen" and must be verified by
   the exact anti-join (bloom false-positive rate makes this a small
   fraction, so the expensive exact anti-join shuffles only the maybes).
2. ``merge_blooms(blooms, delta)`` — cogroup by bucket, OR the new
   hashes into each bucket's bitset (incremental; no rebuild).

All bit math is numpy over Arrow batches — no per-row Python
(input_hint mandate). The reference's equivalent is an in-memory Go map
(``visited`` ``/root/reference/scrape/scrape.go:640``), which cannot
scale past one process.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

BLOOMS_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("bits", T.BinaryType(), False),
        T.StructField("n_items", T.LongType(), False),
    ]
)

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _positions(hashes: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """k bit positions per key via Kirsch–Mitzenmacher double hashing:
    pos_i = (h1 + i*h2) mod m. Returns shape (len, k)."""
    h = hashes.astype(np.uint64)
    h1 = h
    h2 = (h ^ (h >> np.uint64(33))) * _MIX | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m_bits)).astype(np.int64)


def _set_bits(bits: np.ndarray, pos: np.ndarray) -> None:
    flat = pos.reshape(-1)
    np.bitwise_or.at(bits, flat >> 3, (1 << (flat & 7)).astype(np.uint8))


def _test_bits(bits: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """True where ALL k bits set (maybe-seen)."""
    flat = pos.reshape(-1)
    hit = (bits[flat >> 3] >> (flat & 7).astype(np.uint8)) & 1
    return hit.reshape(pos.shape).all(axis=1)


class BloomSpec:
    def __init__(self, n_buckets: int = 64, bits_per_bucket: int = 1 << 20, k: int = 7):
        self.n_buckets = n_buckets
        self.bits_per_bucket = bits_per_bucket
        self.k = k

    def bucket_col(self, hash_col):
        return F.pmod(hash_col, F.lit(self.n_buckets)).cast("int")


def empty_blooms(spark, spec: BloomSpec) -> DataFrame:
    nb, m = spec.n_buckets, spec.bits_per_bucket

    def gen(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "bucket": pdf["id"].astype("int32"),
                    "bits": [bytes(m // 8)] * len(pdf),
                    "n_items": np.zeros(len(pdf), dtype="int64"),
                }
            )

    return spark.range(nb).mapInPandas(gen, schema=BLOOMS_SCHEMA)


def merge_blooms(blooms: DataFrame, delta: DataFrame, spec: BloomSpec) -> DataFrame:
    """OR the hashes of ``delta(url_hash, bucket)`` into each bucket's
    bitset. Cogrouped by bucket: each task touches one bucket's bitset."""
    m, k = spec.bits_per_bucket, spec.k

    def apply(key, bloom_pdf, delta_pdf):
        if len(bloom_pdf):
            bits = np.frombuffer(bloom_pdf["bits"].iloc[0], dtype=np.uint8).copy()
            n = int(bloom_pdf["n_items"].iloc[0])
        else:
            bits = np.zeros(m // 8, dtype=np.uint8)
            n = 0
        if len(delta_pdf):
            h = delta_pdf["url_hash"].to_numpy(dtype=np.int64).view(np.uint64)
            _set_bits(bits, _positions(h, m, k))
            n += len(delta_pdf)
        return pd.DataFrame({"bucket": [int(key[0])], "bits": [bits.tobytes()], "n_items": [n]})

    return (
        blooms.groupBy("bucket")
        .cogroup(delta.select("bucket", "url_hash").groupBy("bucket"))
        .applyInPandas(apply, schema=BLOOMS_SCHEMA)
    )


def split_by_bloom(candidates: DataFrame, blooms: DataFrame, spec: BloomSpec) -> DataFrame:
    """Tag candidates(…, url_hash, bucket) with ``maybe_seen`` via a
    bucket-co-partitioned cogroup against the bitsets. Rows with
    ``maybe_seen = false`` are definitely unseen (bloom has no false
    negatives); only ``maybe_seen = true`` rows need the exact check."""
    m, k = spec.bits_per_bucket, spec.k
    out_schema = T.StructType(
        list(candidates.schema.fields) + [T.StructField("maybe_seen", T.BooleanType(), False)]
    )
    cols = [f.name for f in candidates.schema.fields]

    def apply(key, cand_pdf, bloom_pdf):
        if not len(cand_pdf):
            return pd.DataFrame(columns=cols + ["maybe_seen"])
        if not len(bloom_pdf):
            cand_pdf["maybe_seen"] = False
            return cand_pdf
        bits = np.frombuffer(bloom_pdf["bits"].iloc[0], dtype=np.uint8)
        h = cand_pdf["url_hash"].to_numpy(dtype=np.int64).view(np.uint64)
        cand_pdf = cand_pdf.copy()
        cand_pdf["maybe_seen"] = _test_bits(bits, _positions(h, m, k))
        return cand_pdf

    return (
        candidates.groupBy("bucket")
        .cogroup(blooms.groupBy("bucket"))
        .applyInPandas(apply, schema=out_schema)
    )


def filter_unseen(candidates: DataFrame, blooms: DataFrame, seen: DataFrame, spec: BloomSpec) -> DataFrame:
    """candidates ∖ seen: bloom pre-filter, then exact LEFT ANTI join on
    (url_hash, url) for the bloom-positive residue only. ``seen`` is the
    exact table (Iceberg/parquet); at scale the anti-join's probe side is
    just the false-positive + true-positive slice, not the whole
    frontier. The exact join carries the url alongside the hash so a
    64-bit collision can never suppress an uncrawled URL (the bloom side
    stays hash-only: a colliding URL is merely a guaranteed bloom
    positive, then rescued by this exact check)."""
    tagged = split_by_bloom(candidates, blooms, spec)
    definitely_new = tagged.filter(~F.col("maybe_seen")).drop("maybe_seen")
    maybes = tagged.filter(F.col("maybe_seen")).drop("maybe_seen")
    # the seen table is unbounded — never a driver broadcast (shuffle
    # hash join: co-partitioned probe of the maybe-seen residue only)
    verified_new = maybes.join(
        seen.select("url_hash", "url").hint("shuffle_hash"),
        on=["url_hash", "url"],
        how="left_anti",
    )
    return definitely_new.unionByName(verified_new)
