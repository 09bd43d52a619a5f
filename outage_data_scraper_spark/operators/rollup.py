"""Hypertable-style multi-resolution rollup (continuous aggregates).

The TimescaleDB/druid pattern: aggregate raw events once into the
finest time bucket, then build every coarser resolution by
RE-AGGREGATING the next-finer level — never re-scanning raw. Only
mergeable aggregates participate (sum/count/min/max; avg derives as
sum/count at read time), which is exactly what makes the cascade equal
to aggregating raw directly at every level (tested + oracle-gated).

Scale shape: raw (10^10+ rows) is touched ONCE; level k+1 costs
O(rows of level k), which shrinks geometrically. Each level is
localCheckpoint'd so the union of levels doesn't re-execute the chain
once per branch (Spark unions re-evaluate shared subtrees — at 100 TB
that would mean one raw scan per level). Bucket arithmetic is integer
epoch-µs DIV (boundary-exact cross-engine; q74's rule), and values
enter as floored integer micro-units so every sum is order-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def time_bucket_us(ts_us: str, width_s: int):
    """Bucket start (epoch µs) via integer DIV — never double `/`."""
    w = width_s * 1_000_000
    return F.expr(f"({ts_us} DIV {w}) * {w}")


def rollup_cascade(
    events: DataFrame,
    ts_us: str = "ts_us",
    key: str = "event_type",
    value_u: str = "value_u",
    levels: tuple[int, ...] = (60, 3600, 86400),
) -> DataFrame:
    """Union of all resolution levels: (level_s, key, bucket_us, n,
    sum_u, min_u, max_u). ``levels`` must be ascending and each must
    divide the next (bucket alignment)."""
    finest = (
        events.groupBy(
            F.col(key), time_bucket_us(ts_us, levels[0]).alias("bucket_us")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(value_u).alias("sum_u"),
            F.min(value_u).alias("min_u"),
            F.max(value_u).alias("max_u"),
        )
        .localCheckpoint(eager=False)
    )
    out = finest.select(F.lit(levels[0]).alias("level_s"), "*")
    prev = finest
    for width in levels[1:]:
        cur = (
            prev.groupBy(
                F.col(key), time_bucket_us("bucket_us", width).alias("bucket_us")
            )
            .agg(
                F.sum("n").alias("n"),
                F.sum("sum_u").alias("sum_u"),
                F.min("min_u").alias("min_u"),
                F.max("max_u").alias("max_u"),
            )
            .localCheckpoint(eager=False)
        )
        out = out.unionByName(cur.select(F.lit(width).alias("level_s"), "*"))
        prev = cur
    return out
