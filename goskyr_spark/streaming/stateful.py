"""Custom stateful streaming operator: a per-host crawl-rate guard via
``applyInPandasWithState`` — running page counts per host survive across
micro-batches in the state store; hosts breaching their budget emit
violation rows. (The batch engine enforces politeness per round via the
window top-k; this is the continuous-arrival counterpart.)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

RATE_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("total_pages", T.LongType(), False),
        T.StructField("batch_pages", T.LongType(), False),
        T.StructField("over_budget", T.BooleanType(), False),
    ]
)

STATE_SCHEMA = "total LONG"


def host_rate_guard(pages_stream: DataFrame, budget: int = 1000) -> DataFrame:
    """pages stream → one row per (host, micro-batch) with the running
    total from the state store and an over-budget flag."""

    def update(key, pdfs, state: GroupState):
        host = key[0]
        batch = 0
        for pdf in pdfs:
            batch += len(pdf)
        (total,) = state.get if state.exists else (0,)
        total += batch
        state.update((total,))
        yield pd.DataFrame(
            {
                "host": [host],
                "total_pages": [total],
                "batch_pages": [batch],
                "over_budget": [total > budget],
            }
        )

    # try_parse_url: ANSI-mode parse_url throws on malformed URLs; a
    # malformed page URL must not kill the stream (null host groups
    # together under the guard, which is the honest behavior).
    with_host = pages_stream.withColumn("host", F.try_parse_url("url", F.lit("HOST")))
    return with_host.groupBy("host").applyInPandasWithState(
        update,
        outputStructType=RATE_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_rate_guard(spark, pages_dir: str, out_dir: str, checkpoint_dir: str,
                   budget: int = 1000):
    """One availableNow pass of the guard over whatever pages have
    arrived; state persists in the checkpoint across invocations (file
    sink — the memory sink cannot recover from a checkpoint)."""
    from ..spark import schemas

    stream = spark.readStream.schema(schemas.PAGES).parquet(pages_dir)
    return (
        host_rate_guard(stream, budget)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# ------------------------------------------- streaming dedup-on-ingest

DEDUP_SCHEMA = T.StructType(
    [
        T.StructField("content_md5", T.StringType(), False),
        T.StructField("canonical_doc_id", T.LongType(), False),
        T.StructField("n_dups_in_batch", T.LongType(), False),
    ]
)

DEDUP_STATE_SCHEMA = "canonical LONG, n_seen LONG"


def streaming_exact_dedup(docs_stream: DataFrame) -> DataFrame:
    """Exact dedup at ingest time: the batch engine dedups a corpus
    after the fact (ops/dedup.exact_dedup); this is the continuous
    counterpart — the state store remembers every content hash ever
    admitted, and each micro-batch emits ONLY first-seen documents
    (canonical = min doc_id within the discovering batch). Re-ingesting
    the same shard after a restart re-emits nothing: admission is
    exactly-once per content hash for the lifetime of the checkpoint.

    State per key is 16 B of hash + two longs — at 10^9 unique docs the
    RocksDB state store holds ~40 GB across the cluster, the standard
    regime for streaming dedup; the grouping key is the md5 itself so
    state access is one partition-local lookup per key.
    """

    def update(key, pdfs, state: GroupState):
        md5 = key[0]
        ids = []
        for pdf in pdfs:
            ids.extend(int(x) for x in pdf["doc_id"])
        if state.exists:
            (canonical, n_seen) = state.get
            state.update((canonical, n_seen + len(ids)))
            return  # already admitted: emit nothing
        canonical = min(ids)
        state.update((canonical, len(ids)))
        yield pd.DataFrame(
            {
                "content_md5": [md5],
                "canonical_doc_id": [canonical],
                "n_dups_in_batch": [len(ids)],
            }
        )

    hashed = docs_stream.withColumn("content_md5", F.md5("text"))
    return hashed.groupBy("content_md5").applyInPandasWithState(
        update,
        outputStructType=DEDUP_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_streaming_dedup(spark, docs_dir: str, out_dir: str, checkpoint_dir: str):
    """One availableNow pass over whatever document shards have arrived;
    admitted-hash state persists in the checkpoint across invocations."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    stream = spark.readStream.schema(schema).parquet(docs_dir)
    return (
        streaming_exact_dedup(stream)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
