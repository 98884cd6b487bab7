"""Structured Streaming ingestion: pages arrive continuously (the
production shape of a fetch tier: WARC drops landing in object storage),
extraction runs incrementally, exactly-once via checkpointed
``foreachBatch``.

The reference has no streaming at all (batch rounds only,
``SURVEY.md §2.6``); this is the north_rule's "each crawl round is a
DataFrame job" extended to continuous arrival. Late pages are handled by
the watermark in ``host_rate_stream``; the extraction path reuses the
exact same parse UDF as the batch crawl, so records are byte-identical
whichever path produced them.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..spark import schemas
from ..spark.extract_udf import explode_records, parse_pages


def stream_extract(
    spark: SparkSession,
    pages_dir: str,
    config_yaml: str,
    out_dir: str,
    checkpoint_dir: str,
) -> None:
    """Incremental extraction: new page files → records parquet, one
    pass over whatever has arrived (``availableNow``), exactly-once via
    the stream checkpoint. Run repeatedly (or with a continuous trigger
    on a cluster) as pages land."""
    stream = spark.readStream.schema(schemas.PAGES).parquet(pages_dir)

    def do_batch(batch_df, epoch_id: int):
        recs = explode_records(parse_pages(batch_df, config_yaml), round_id=int(epoch_id))
        recs.write.mode("append").parquet(out_dir)

    (
        stream.writeStream.foreachBatch(do_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def host_rate_stream(spark: SparkSession, pages_dir: str, checkpoint_dir: str,
                     window: str = "10 minutes", watermark: str = "30 minutes"):
    """Watermarked per-host ingest-rate aggregation (the politeness
    monitor): windowed counts tolerate late page arrivals up to the
    watermark. Returns the started query writing to an in-memory sink
    named 'host_rates'."""
    stream = spark.readStream.schema(schemas.PAGES).parquet(pages_dir)
    agg = (
        stream.withColumn("host", F.parse_url("url", F.lit("HOST")))
        .withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window), "host")
        .agg(F.count(F.lit(1)).alias("pages"))
    )
    return (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("host_rates")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
