"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed through Arrow-batched
``mapInPandas`` UDFs.

The decode step itself is STUBBED (no image/audio libraries in this
container): ``decode_image`` raises ``NotImplementedError`` unless the
deterministic fake decoder is requested. Everything Spark-side — schema,
partitioning, UDF signature, batch shape — is real and tested, so
swapping in PIL/libav on a real cluster changes one function body.

Scale notes: media blobs dominate row size, so the asset table is
stored separately from text and joined by content hash only when a
stage needs bytes; `spark.sql.files.maxPartitionBytes` governs scan
granularity; feature extraction emits fixed-width vectors so downstream
ops are columnar.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("meta_width", T.IntegerType(), True),
        T.StructField("meta_height", T.IntegerType(), True),
        T.StructField("meta_duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("content_sha1", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)


def decode_image(payload: bytes):  # pragma: no cover - real decoder absent
    """Real decode path — requires PIL/turbojpeg on the cluster."""
    raise NotImplementedError("image decoding requires PIL; use fake=True in this sandbox")


def fake_decode_features(payload: bytes, dim: int = 16) -> list[float]:
    """Deterministic stand-in for decode→feature-extract: sha1-seeded
    pseudo-features. Exercises the full Arrow round trip with stable
    values."""
    d = hashlib.sha1(payload).digest()
    vals = struct.unpack(">4I", d[:16])
    rng = np.random.default_rng(vals)
    return [float(x) for x in np.round(rng.standard_normal(dim), 6)]


def synthesize_assets(spark: SparkSession, n: int = 200, seed: int = 5) -> DataFrame:
    """Deterministic opaque-binary asset table (distributed generate,
    same pattern as the pages corpus)."""

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                mt = ("image", "audio", "video")[i % 3]
                payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (1 + i % 7)
                w, h, dur = (64 + i % 512, 64 + (i * 7) % 512, None) if mt == "image" else (None, None, 1000 + i * 33 % 90000)
                rows.append((i, mt, payload, w, h, dur))
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "media_type", "payload", "meta_width", "meta_height", "meta_duration_ms"],
            )

    return spark.range(n).mapInPandas(gen, schema=ASSET_SCHEMA)


def extract_features(assets: DataFrame, fake: bool = True, dim: int = 16) -> DataFrame:
    """mapInPandas decode/feature pipeline over binary payloads —
    Arrow-batched, no per-row Python crossing the wire."""

    def run(batches):
        for pdf in batches:
            feats, shas, sizes = [], [], []
            for payload in pdf["payload"]:
                b = bytes(payload)
                sizes.append(len(b))
                shas.append(hashlib.sha1(b).hexdigest())
                if fake:
                    feats.append(fake_decode_features(b, dim))
                else:
                    feats.append(decode_image(b))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pd.Series(sizes, dtype="int32"),
                    "content_sha1": shas,
                    "feature": feats,
                }
            )

    return assets.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (asset, frame_ts) —
    the explode happens before decode so frame decoding parallelizes
    across the cluster rather than per-video."""
    vids = assets.filter(F.col("media_type") == "video")
    return vids.select(
        "asset_id",
        F.explode(
            F.sequence(F.lit(0), F.col("meta_duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


def documents_as_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The oracle-checkable fragment: treat document text as an opaque
    binary payload and report its byte length (octet_length in DuckDB)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        "doc_id",
        F.octet_length("text").alias("n_bytes"),
        F.md5("text").alias("payload_md5"),
    )
