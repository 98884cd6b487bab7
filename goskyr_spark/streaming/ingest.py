"""Structured Streaming ingestion: pages arrive continuously (the
production shape of a fetch tier: WARC drops landing in object storage),
extraction runs incrementally. ``foreachBatch`` is at-least-once (a
batch that fails after its write is replayed on restart), so the batch
write is made IDEMPOTENT: records are partitioned by ``epoch_id`` and
written with dynamic partition overwrite — a replayed epoch overwrites
its own partition instead of appending duplicates, giving effectively-
exactly-once output.

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
    pass over whatever has arrived (``availableNow``). Source progress is
    exactly-once via the stream checkpoint; the sink is made idempotent
    by partitioning on epoch_id with dynamic partition overwrite (see
    module docstring), so a replayed batch cannot duplicate records.
    Run repeatedly (or with a continuous trigger on a cluster) as pages
    land."""
    stream = spark.readStream.schema(schemas.PAGES).parquet(pages_dir)

    def do_batch(batch_df, epoch_id: int):
        spark_b = batch_df.sparkSession
        prev = spark_b.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark_b.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            recs = explode_records(parse_pages(batch_df, config_yaml), round_id=int(epoch_id))
            (
                recs.withColumn("epoch_id", F.lit(int(epoch_id)))
                .write.mode("overwrite")
                .partitionBy("epoch_id")
                .parquet(out_dir)
            )
        finally:
            spark_b.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

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
        stream.withColumn("host", F.try_parse_url("url", F.lit("HOST")))
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
