"""Exact distributed order statistics in two bounded passes.

Spark's approx_percentile and DuckDB's quantile use different internal
summaries — neither gates the other, and "approx" is the wrong contract
for dataset cards ("median doc length: N chars" should be a fact). This
computes EXACT k-th order statistics over a numeric column without ever
globally sorting the data:

pass 1 — min/max/count plus an integer equi-width histogram: one
         map-side-combined shuffle emitting ≤ n_buckets rows per task.
         The driver prefix-sums the ≤ n_buckets histogram and locates,
         for every requested rank, the bucket containing it and the
         rank's offset within that bucket.
pass 2 — ONLY the needed buckets are re-scanned (a pushed-down range
         predicate — on a sorted/clustered layout this prunes row
         groups, so the second pass reads ~n/n_buckets of the data),
         ranked within each bucket by a per-bucket window (parallel
         across buckets, each ≈ n/n_buckets rows), and the requested
         offsets selected via a broadcast of the driver's (bucket,
         local_rank, rank) map.

No global sort, no single-partition window, both passes bounded. An
adversarial distribution can still concentrate one bucket (all values
equal → one bucket holds everything); the in-bucket window then sees
that bucket's rows only — recurse with a finer histogram if that ever
exceeds an executor, noted here rather than hidden.

The reference repo has no quantile surface; this is dataset-statistics
tier (length/score distributions over a 10^10-doc corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_order_stats(
    df: DataFrame,
    value_col: str,
    ranks: list[int],
    n_buckets: int = 1024,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """(rank, value) for each 1-based rank in ``ranks`` — the exact
    k-th smallest values of ``value_col`` (long). The VALUE at a rank
    is tiebreak-independent; ``tiebreak_col`` only makes the in-bucket
    window order fully deterministic for plan stability."""
    if not ranks:
        raise ValueError("ranks must be non-empty")
    spark = df.sparkSession
    stats = df.agg(
        F.min(value_col).alias("mn"),
        F.max(value_col).alias("mx"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    n = int(stats["n"])
    if n == 0:
        return spark.createDataFrame([], "rank long, value long")
    bad = [r for r in ranks if r < 1 or r > n]
    if bad:
        raise ValueError(f"ranks out of [1, {n}]: {bad}")
    mn, mx = int(stats["mn"]), int(stats["mx"])
    # integer bucket width: ceil(span/B) via DIV — no float boundary
    # drift, no (v-mn)*B overflow at extreme longs
    width = max((mx - mn + n_buckets) // n_buckets, 1)
    bucket = F.expr(f"({value_col} - {mn}) DIV {width}")

    hist = (
        df.select(bucket.alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    counts = {int(r["b"]): int(r["c"]) for r in hist}
    cum = 0
    targets: list[tuple[int, int, int]] = []  # (bucket, local_rank, rank)
    want = sorted(set(int(r) for r in ranks))
    wi = 0
    for b in sorted(counts):
        c = counts[b]
        while wi < len(want) and want[wi] <= cum + c:
            targets.append((b, want[wi] - cum, want[wi]))
            wi += 1
        cum += c
    assert wi == len(want), "rank location failed (histogram inconsistent)"

    need = spark.createDataFrame(
        targets, "b long, local_rank long, rank long"
    )
    needed_buckets = sorted({t[0] for t in targets})
    order = [F.col(value_col).asc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    wnd = Window.partitionBy("b").orderBy(*order)
    subset = (
        df.withColumn("b", bucket)
        .filter(F.col("b").isin(needed_buckets))
        .withColumn("local_rank", F.row_number().over(wnd))
    )
    return (
        subset.join(F.broadcast(need), ["b", "local_rank"])
        .select("rank", F.col(value_col).cast("long").alias("value"))
        .orderBy("rank")
    )
