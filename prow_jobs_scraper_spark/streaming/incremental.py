"""Incremental ingest as Structured Streaming (SURVEY.md §2.9).

The reference is batch-on-cron but hand-rolls streaming semantics:
re-scrape everything, anti-join against already-indexed ids
(scraper.py:28-32), bounded dedup state = current+previous weekly index
(event.py:186-189,221-227), 6h late-data allowance
(jobsautoreport/main.py:41-52). This module maps those properly:

- file-source ``readStream`` over the transcripts directory;
- ``withWatermark('ts', '7 days')`` + ``dropDuplicates(conv_id, turn_idx)``
  = the reference's bounded dedup window, as real watermark state;
- ``trigger(availableNow=True)`` = one cron tick (template.yaml:12);
- ``foreachBatch`` appends only never-seen turns to the staging table —
  the downstream batch index build picks them up via its manifest
  (idempotent per-bucket commits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TRANSCRIPTS_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def incremental_ingest(
    spark: SparkSession,
    source_dir: str,
    staging_dir: str,
    checkpoint_dir: str,
    watermark: str = "7 days",
):
    """Start an availableNow incremental ingest; returns the query.

    Exactly-once per (conv_id, turn_idx): dropDuplicates within the
    watermark + the file source's own exactly-once file tracking. Await
    termination for the one-tick (cron-equivalent) semantics."""
    stream = (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA).parquet(source_dir)
        .withWatermark("ts", watermark)
        .dropDuplicates(["conv_id", "turn_idx"])
    )

    def write_batch(batch: DataFrame, batch_id: int):
        (
            batch.withColumn("ingest_batch", F.lit(batch_id))
            .write.mode("append").parquet(staging_dir)
        )

    return (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def windowed_turn_counts(spark: SparkSession, source_dir: str,
                         window: str = "1 week",
                         watermark: str = "6 hours") -> DataFrame:
    """The reference's tumbling weekly report window + 6h lag allowance as
    an event-time windowed aggregate (streaming-ready; also runs batch)."""
    df = spark.readStream.schema(TRANSCRIPTS_SCHEMA).parquet(source_dir)
    return (
        df.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("role"))
        .agg(F.count(F.lit(1)).alias("n_turns"))
        .select(F.col("w.start").alias("window_start"), "role", "n_turns")
    )
