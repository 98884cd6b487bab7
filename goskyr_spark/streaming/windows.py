"""Watermarked tumbling-window aggregation over the event stream — the
canonical Structured Streaming shape (readStream → withWatermark →
window() groupBy → append sink) that the batch ``ops/events.window_agg``
twins. The watermark bounds state: a window's aggregate lives in the
state store only until the event-time watermark (max seen ts − delay)
passes its end, then it is emitted exactly once to the append sink and
evicted; events arriving later than the delay are DROPPED, which is the
deliberate late-data contract (the batch twin, re-run over the final
table, is the reconciliation path for anything later).

Scale: state size is O(open windows × group cardinality), independent of
stream length — this is what makes hour-window aggregation over an
unbounded crawl/event feed feasible where the batch groupBy would need
the full history. The sink is the same parquet-append pattern as
streaming/ingest.py; exactly-once comes from the stream checkpoint plus
the sink's idempotent file commit protocol.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def windowed_event_counts(
    stream: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window per-event-type counts/sums with late-data
    eviction. Identical aggregate expressions to the batch twin
    (ops/events.window_agg) so closed windows can be cross-checked
    row-for-row against a batch run over the on-time rows."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def run_windowed_counts(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    max_files_per_trigger: int = 1,
) -> None:
    """Drain whatever event files have arrived (availableNow), emitting
    every window the advancing watermark closes. maxFilesPerTrigger=1
    processes files as separate micro-batches in modification-time
    order, so the watermark advances between files exactly as it would
    between arrivals on a live stream; re-runs resume from the stream
    checkpoint and cannot double-emit a closed window."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_dir)
    )
    (
        windowed_event_counts(stream, window=window, watermark=watermark)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
