"""Structured-Streaming re-expression of the reference's polling semantics.

The reference has no streaming runtime, but its semantics ARE a polling
stream: every cron run appends one observation per (emc, level) keyed by
timestamp (SURVEY.md §1.4). The engine represents that as an incremental
pipeline over the records/pages table directory:

    readStream(parquet dir) → watermark → windowed agg → writeStream

run with ``Trigger.AvailableNow`` — each invocation processes exactly the
files that arrived since the last checkpoint, then stops. That is the
cron-Lambda cadence, minus the reference's non-atomic read-modify-write
CSV sink (util.py:21–60): the checkpoint makes re-runs exactly-once.

At scale the same code runs continuously (processingTime trigger) on the
Iceberg-backed table; watermarks bound state for late observations the
reference would happily append stale (util.py:42 — dedupe disabled).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def poll_stream(
    spark: SparkSession, path: str, schema: StructType, pattern: str = "*.parquet"
) -> DataFrame:
    """File-source stream over an append-only parquet directory."""
    return (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", pattern)
        # one file ≈ one crawl wave ≈ one micro-batch: the watermark
        # advances wave-by-wave, closing earlier windows (append mode
        # emits a window only once the watermark passes its end)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def windowed_outage_counts(
    observations: DataFrame,
    ts_col: str = "run_ts",
    key_col: str = "emc",
    window: str = "15 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Per-key outage-record counts in event-time windows; late rows
    beyond the watermark are dropped instead of silently appended (the
    deliberate divergence from the reference's stale-append behavior)."""
    return (
        observations.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_records"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "n_records",
        )
    )


def run_available_now(
    result: DataFrame, sink_path: str, checkpoint_path: str
) -> None:
    """Process everything new since the checkpoint, then stop — one
    'poll' of the reference's cron cadence, exactly-once."""
    q = (
        result.writeStream.format("parquet")
        .option("path", sink_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
