"""Event-stream analytics over the `events` table: gap-based
sessionization and tumbling-window aggregation — the batch twins of the
streaming ingest path (streaming/ingest.py runs the same windowed
aggregation with a watermark over continuous arrivals).

Scale notes:
- Sessionization is the canonical one-shuffle window-function plan:
  hash-partition by user_id, sort each partition by ts, lag + running
  sum — no self-join, no iteration. Skewed power users are bounded by
  per-user event counts, not corpus size; at 100 TB the shuffle is
  keyed on user_id (high cardinality, well distributed).
- Window aggregation is groupBy(time_bucket, type) with map-side
  partial aggregation; output cardinality = windows × types, tiny.
- Timestamps cross the oracle boundary as epoch microseconds (long) —
  exact integer compare, no tz/precision ambiguity between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

SESSION_GAP_MIN = 30


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the sf parquet stores ts as TIMESTAMP_NTZ; the session runs UTC
    # (spark/session.py), so the cast to TIMESTAMP is micros-identity
    # and unix_micros == DuckDB epoch_us on the naive value
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.withColumn("ts", F.col("ts").cast("timestamp"))


def sessionize(spark: SparkSession, sf_dir: str, gap_min: int = SESSION_GAP_MIN) -> DataFrame:
    """Gap-based sessions: a new session starts when a user is idle
    longer than `gap_min` minutes. session_seq numbers a user's
    sessions in time order (running sum over the new-session flag);
    output is one row per session with start/end (epoch micros),
    event count and value sum."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = gap_min * 60 * 1_000_000
    ts_us = F.unix_micros("ts")
    prev = F.lag(ts_us).over(w)
    new_session = F.when(prev.isNull() | ((ts_us - prev) > gap_us), 1).otherwise(0)
    sessions = ev.select(
        "user_id",
        "event_id",
        ts_us.alias("ts_us"),
        "value",
        F.sum(new_session).over(w).alias("session_seq"),
    )
    return (
        sessions.groupBy("user_id", "session_seq")
        .agg(
            F.min("ts_us").alias("session_start_us"),
            F.max("ts_us").alias("session_end_us"),
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
        )
    )


def window_agg(spark: SparkSession, sf_dir: str, minutes: int = 60) -> DataFrame:
    """Tumbling-window counts per event_type (batch form; the streaming
    form with watermark lives in streaming/ingest.py). Window start is
    reported as epoch micros for exact oracle comparison."""
    ev = _events(spark, sf_dir)
    win = F.window("ts", f"{minutes} minutes")
    return (
        ev.groupBy(win.alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
            # exact distinct for the oracle gate; at 100 TB swap to
            # approx_count_distinct (HLL, mergeable, one pass) — the
            # exact form needs a second expand-aggregate
            F.count_distinct("user_id").alias("n_users"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "event_type",
            "n_events",
            "total_value",
            "n_users",
        )
    )


def asof_join(
    spark: SparkSession,
    sf_dir: str,
    left_type: str = "purchase",
    right_type: str = "view",
) -> DataFrame:
    """AS-OF join: attach to every `left_type` event the most recent
    earlier-or-equal `right_type` event of the same user (the classic
    point-in-time enrichment — trades×quotes, purchase×last-view).
    Spark has no native ASOF JOIN (DuckDB/Flink/pandas do); the naive
    encoding is an inequality join, which Catalyst can only run as a
    per-user nested loop — O(n_l·n_r) per user and a
    BroadcastNestedLoopJoin at scale. The scale-correct shape is the
    UNION-WINDOW form used here: tag both sides, ONE hash shuffle on
    user_id, one sort by (ts, side, event_id), then last(ignorenulls)
    carries the newest right-side row forward into each left row.
    Linear in events, no join at all; skew bounded by per-user counts.

    Tie policy: a right event at the SAME timestamp counts as "prior"
    (side sorts right-before-left at equal ts); ties inside a side
    break deterministically on event_id. view_* columns are null when
    no prior right event exists. Timestamps cross the oracle boundary
    as epoch micros (exact integer compare)."""
    ev = _events(spark, sf_dir).filter(
        F.col("event_type").isin(left_type, right_type)
    )
    is_r = (F.col("event_type") == right_type).cast("int")
    tagged = ev.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "value",
        is_r.alias("is_r"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts_us"), F.col("is_r").desc(), F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )

    def carry(col: str):
        return F.last(
            F.when(F.col("is_r") == 1, F.col(col)), ignorenulls=True
        ).over(w)

    return (
        tagged.select(
            "event_id",
            "user_id",
            "ts_us",
            "value",
            "is_r",
            carry("event_id").alias("view_event_id"),
            carry("ts_us").alias("view_ts_us"),
            carry("value").alias("view_value"),
        )
        .filter(F.col("is_r") == 0)
        .drop("is_r")
    )
