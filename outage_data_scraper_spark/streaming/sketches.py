"""Streaming sketch maintenance: a Count-Min table kept current over an
unbounded stream.

The batch CMS (operators/sketch.py, q81) is MERGEABLE — per-shard
partial tables union + sum to the exact global table. This module runs
that property in a streaming loop: each micro-batch folds to its own
≤ d·w-row partial sketch inside ``foreachBatch``, written to a
batch-id-keyed subdirectory (overwrite → idempotent on retry, the
standard foreachBatch exactly-once recipe); the serving-side read
merges all partials with one groupBy sum. Because CMS merge is
associative AND commutative, the merged table is bit-identical to the
batch sketch over the same rows — which is what makes the streaming
run VALUE-GATABLE by the batch SQL oracle (q111).

Scale shape: state never lives in the streaming engine at all — each
partial is d·w rows regardless of batch size, the sketch directory
grows by one tiny file per batch (compact by re-merging, same as the
posting shards), and the merge read is a ≤ d·w·n_batches-row groupBy.
This is the 100 TB/day shape: no keyed state, no watermark, no
unbounded anything.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.sketch import CMS_D, CMS_W, cms_table


def run_streaming_cms(
    spark,
    df: DataFrame,
    n_splits: int,
    work_dir: str,
    value_col: str,
    split_key: str,
    d: int = CMS_D,
    w: int = CMS_W,
) -> DataFrame:
    """Replay ``df`` as ``n_splits`` single-file micro-batches
    (deterministic split on ``split_key`` % n_splits), maintain the CMS
    via foreachBatch partial sketches, and return the merged
    (row, bucket, cnt) table."""
    in_dir = os.path.join(work_dir, "in")
    sink = os.path.join(work_dir, "sketch")
    src = df.select(F.col(value_col).alias("v"), F.col(split_key).alias("k"))
    for i in range(n_splits):
        (
            src.filter(F.pmod(F.col("k"), F.lit(n_splits)) == i)
            .select("v")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(in_dir, f"split={i:04d}"))
        )

    stream = (
        spark.readStream.schema("v string")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(in_dir + "/split=*")
    )

    def fold_batch(batch_df: DataFrame, batch_id: int) -> None:
        cms_table(batch_df, "v", d=d, w=w).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(sink, f"batch={batch_id}"))

    q = (
        stream.writeStream.foreachBatch(fold_batch)
        .option("checkpointLocation", os.path.join(work_dir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    return (
        spark.read.option("basePath", sink)
        .parquet(sink + "/batch=*")
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
