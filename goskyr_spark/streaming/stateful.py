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
