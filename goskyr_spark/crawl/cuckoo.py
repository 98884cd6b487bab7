"""Cuckoo-filter fallback for the URL-seen set (north_star: "cuckoo-filter
fallback for deletions").

Blooms cannot delete; re-crawl semantics (drop a URL from seen so the
next round may fetch it again) need a deletable sketch. Standard cuckoo
filter: 2 candidate buckets per key, ``slots_per_bucket`` fingerprint
slots each, partial-key cuckoo hashing for relocation (Fan et al.,
CoNLL'14 "Cuckoo Filter: Practically Better Than Bloom").

Same sharding story as the bloom: one filter per shard row, shards keyed
by ``url_hash % n_shards``, merged/queried through bucket-co-partitioned
cogroups. The numpy table is vectorized for lookup/delete; insert uses a
bounded eviction loop (amortized O(1))."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

CUCKOO_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType(), False),
        T.StructField("table", T.BinaryType(), False),
        T.StructField("n_items", T.LongType(), False),
    ]
)

_MAX_KICKS = 500


class CuckooTable:
    """One shard's in-memory table: uint16 fingerprints, 0 = empty."""

    def __init__(self, n_buckets: int = 1 << 16, slots: int = 4, table: bytes | None = None):
        self.n_buckets = n_buckets
        self.slots = slots
        if table is not None:
            self.t = np.frombuffer(table, dtype=np.uint16).reshape(n_buckets, slots).copy()
        else:
            self.t = np.zeros((n_buckets, slots), dtype=np.uint16)

    def _fp(self, h: np.ndarray) -> np.ndarray:
        fp = ((h >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.uint16)
        fp[fp == 0] = 1
        return fp

    def _i1(self, h: np.ndarray) -> np.ndarray:
        return (h % np.uint64(self.n_buckets)).astype(np.int64)

    def _i2(self, i1: np.ndarray, fp: np.ndarray) -> np.ndarray:
        # partial-key: i2 = i1 xor hash(fp)
        fph = (fp.astype(np.uint64) * np.uint64(0x5BD1E995)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        return ((i1.astype(np.uint64) ^ fph) % np.uint64(self.n_buckets)).astype(np.int64)

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        h = hashes.view(np.uint64)
        fp = self._fp(h)
        i1 = self._i1(h)
        i2 = self._i2(i1, fp)
        in1 = (self.t[i1] == fp[:, None]).any(axis=1)
        in2 = (self.t[i2] == fp[:, None]).any(axis=1)
        return in1 | in2

    def insert(self, hashes: np.ndarray) -> int:
        h = hashes.view(np.uint64)
        fp = self._fp(h)
        i1 = self._i1(h)
        i2 = self._i2(i1, fp)
        rng = np.random.default_rng(12345)  # deterministic evictions
        inserted = 0
        for j in range(len(h)):
            f = fp[j]
            for idx in (i1[j], i2[j]):
                if (self.t[idx] == f).any():
                    break
                empty = np.flatnonzero(self.t[idx] == 0)
                if len(empty):
                    self.t[idx, empty[0]] = f
                    inserted += 1
                    break
            else:
                cur, fcur, ok = int(i1[j]), f, False
                for _ in range(_MAX_KICKS):
                    slot = int(rng.integers(self.slots))
                    fcur, self.t[cur, slot] = self.t[cur, slot], fcur
                    cur = int(self._i2(np.array([cur]), np.array([fcur], dtype=np.uint16))[0])
                    empty = np.flatnonzero(self.t[cur] == 0)
                    if len(empty):
                        self.t[cur, empty[0]] = fcur
                        ok = True
                        break
                if not ok:
                    raise RuntimeError("cuckoo shard full — grow n_buckets")
                inserted += 1
        return inserted

    def delete(self, hashes: np.ndarray) -> int:
        h = hashes.view(np.uint64)
        fp = self._fp(h)
        i1 = self._i1(h)
        i2 = self._i2(i1, fp)
        removed = 0
        for j in range(len(h)):
            for idx in (i1[j], i2[j]):
                slots = np.flatnonzero(self.t[idx] == fp[j])
                if len(slots):
                    self.t[idx, slots[0]] = 0
                    removed += 1
                    break
        return removed

    def to_bytes(self) -> bytes:
        return self.t.tobytes()


def empty_cuckoo(spark, n_shards: int = 16, n_buckets: int = 1 << 14, slots: int = 4) -> DataFrame:
    def gen(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "shard": pdf["id"].astype("int32"),
                    "table": [bytes(n_buckets * slots * 2)] * len(pdf),
                    "n_items": np.zeros(len(pdf), dtype="int64"),
                }
            )

    return spark.range(n_shards).mapInPandas(gen, schema=CUCKOO_SCHEMA)


def _shard_col(n_shards: int):
    return F.pmod(F.col("url_hash"), F.lit(n_shards)).cast("int").alias("shard")


def cuckoo_update(filters: DataFrame, inserts: DataFrame | None, deletes: DataFrame | None,
                  n_shards: int, n_buckets: int = 1 << 14, slots: int = 4) -> DataFrame:
    """Apply insert/delete hash sets to the sharded filters via cogroup."""
    spark = filters.sparkSession
    empty = spark.createDataFrame([], "url_hash long, op string")
    ops = empty
    if inserts is not None:
        ops = ops.unionByName(inserts.select("url_hash", F.lit("i").alias("op")))
    if deletes is not None:
        ops = ops.unionByName(deletes.select("url_hash", F.lit("d").alias("op")))
    ops = ops.withColumn("shard", F.pmod(F.col("url_hash"), F.lit(n_shards)).cast("int"))

    def apply(key, f_pdf, ops_pdf):
        tbl = CuckooTable(n_buckets, slots, f_pdf["table"].iloc[0] if len(f_pdf) else None)
        n = int(f_pdf["n_items"].iloc[0]) if len(f_pdf) else 0
        ins = ops_pdf[ops_pdf["op"] == "i"]["url_hash"].to_numpy(dtype=np.int64)
        dels = ops_pdf[ops_pdf["op"] == "d"]["url_hash"].to_numpy(dtype=np.int64)
        if len(ins):
            n += tbl.insert(ins)
        if len(dels):
            n -= tbl.delete(dels)
        return pd.DataFrame({"shard": [int(key[0])], "table": [tbl.to_bytes()], "n_items": [n]})

    return (
        filters.groupBy("shard")
        .cogroup(ops.groupBy("shard"))
        .applyInPandas(apply, schema=CUCKOO_SCHEMA)
    )


def cuckoo_contains(candidates: DataFrame, filters: DataFrame,
                    n_shards: int, n_buckets: int = 1 << 14, slots: int = 4) -> DataFrame:
    """Tag candidates(url_hash, …) with ``maybe_seen`` against the cuckoo
    shards (co-partitioned cogroup, same pattern as the bloom path)."""
    cols = [f.name for f in candidates.schema.fields]
    out_schema = T.StructType(
        list(candidates.schema.fields) + [T.StructField("maybe_seen", T.BooleanType(), False)]
    )
    cand = candidates.withColumn("_shard", F.pmod(F.col("url_hash"), F.lit(n_shards)).cast("int"))

    def apply(key, cand_pdf, f_pdf):
        cand_pdf = cand_pdf.drop(columns=["_shard"])
        if not len(cand_pdf):
            return pd.DataFrame(columns=cols + ["maybe_seen"])
        if not len(f_pdf):
            cand_pdf["maybe_seen"] = False
            return cand_pdf
        tbl = CuckooTable(n_buckets, slots, f_pdf["table"].iloc[0])
        cand_pdf = cand_pdf.copy()
        cand_pdf["maybe_seen"] = tbl.contains(cand_pdf["url_hash"].to_numpy(dtype=np.int64))
        return cand_pdf

    return (
        cand.groupBy("_shard")
        .cogroup(filters.withColumnRenamed("shard", "_shard").groupBy("_shard"))
        .applyInPandas(apply, schema=out_schema)
    )
