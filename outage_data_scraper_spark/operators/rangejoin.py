"""Range (interval) join — point-in-interval matching at scale.

Spark has no merge strategy for `ON p.ts BETWEEN i.start AND i.end`: a
plain inequality join plans as broadcast-nested-loop (O(n·m) compares)
or, with an equality on the key, a hash join whose per-key probe still
scans every interval of hot keys. The scalable re-expression is
BUCKETIZATION: each interval explodes to the fixed-width time buckets
it covers, each point computes its single bucket, and the match becomes
an EQUI-join on (key, bucket) + an exact BETWEEN post-filter. Work is
O(points + intervals · avg_span/bucket + true_matches): pick
``bucket_us`` near the median interval span so the explode factor is
small; AQE's skew join splits residual hot buckets. Each true
(point, interval) pair surfaces exactly once — an interval appears once
per bucket and a point lives in one bucket — so no dedup pass.

All bucket arithmetic is integer epoch-microsecond DIV (exact in both
engines; q73's timestamp discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_point_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str = "ts",
    start_ts: str = "start_ts",
    end_ts: str = "end_ts",
    by: str | None = None,
    bucket_us: int = 3_600_000_000,
) -> DataFrame:
    """Inner join: every (point, interval) pair with
    start <= point <= end (and equal ``by`` key if given). Timestamp
    columns must be epoch-microsecond LONGs (cast upstream — keeps the
    operator engine-agnostic and the math exact)."""
    p_us = F.col(point_ts)
    s_us, e_us = F.col(start_ts), F.col(end_ts)
    # integer DIV, never double `/`: epoch_us/bucket quotients sit near
    # 2^39 where a double division can land at x.999... and truncate
    # into the wrong bucket — DIV is exact (and mirrors the oracle)
    ivals = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.expr(f"{start_ts} DIV {bucket_us}"),
                F.expr(f"{end_ts} DIV {bucket_us}"),
            )
        ),
    )
    pts = points.withColumn("__bucket", F.expr(f"{point_ts} DIV {bucket_us}"))
    keys = ["__bucket"] + ([by] if by else [])
    joined = pts.join(ivals, keys).filter((p_us >= s_us) & (p_us <= e_us))
    return joined.drop("__bucket")
