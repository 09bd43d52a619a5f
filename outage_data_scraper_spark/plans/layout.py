"""Data-layout planning: zone-map pruning simulation for sort-key
choice.

At 100 TB the single highest-leverage physical decision is which column
the table is clustered/sorted on: parquet row-group (and Iceberg file)
min/max statistics prune a scan ONLY if the probe column's values are
localized within groups, which the sort key determines. This simulates
exactly that: bucket the table into equal-width groups under each
candidate key, collect each group's (min, max) of the probe column, and
count how many groups — and rows — a range predicate would have to
scan. A key correlated with the probe column (event ids vs time) prunes
to a sliver; an uncorrelated key (user ids) scans everything. The
report is what you read BEFORE rewriting a 100 TB table.

All-integer arithmetic (equi-width integer DIV buckets on non-negative
offsets; basis points via DIV) so the report is value-gatable
cross-engine. Per candidate: one stats pass (two driver scalars) + one
map-side-combined group aggregate + one scalar rollup — each candidate
costs one scan, the same price a single zone-map build would.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pruning_report(
    df: DataFrame,
    candidate_keys: list[str],
    probe_col: Column,
    lo: int,
    hi: int,
    n_buckets: int = 64,
) -> DataFrame:
    """One row per candidate sort key: (sort_key, n_groups,
    groups_scanned, rows_total, rows_scanned, scan_bp) for the probe
    predicate ``lo <= probe <= hi`` — a group is scanned iff its
    [min, max] probe envelope intersects the predicate (the zone-map
    law). Candidate keys must be integer-valued; groups are equal-WIDTH
    key slices (``(k − min) DIV ceil(span/B)``), the shape a
    sorted-write produces."""
    spark = df.sparkSession
    rows = []
    probed = df.select(*candidate_keys, probe_col.cast("long").alias("__p"))
    for k in candidate_keys:
        st = probed.agg(F.min(k).alias("mn"), F.max(k).alias("mx")).collect()[0]
        mn, mx = int(st["mn"]), int(st["mx"])
        width = (mx - mn) // n_buckets + 1
        g = (
            probed.select(
                F.expr(f"({k} - {mn}) DIV {width}").alias("__g"), "__p"
            )
            .groupBy("__g")
            .agg(
                F.min("__p").alias("__mnp"),
                F.max("__p").alias("__mxp"),
                F.count(F.lit(1)).alias("__n"),
            )
        )
        hit = (F.col("__mnp") <= F.lit(int(hi))) & (
            F.col("__mxp") >= F.lit(int(lo))
        )
        r = g.agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum(hit.cast("long")).alias("groups_scanned"),
            F.sum("__n").alias("rows_total"),
            F.sum(F.when(hit, F.col("__n")).otherwise(0)).alias("rows_scanned"),
        ).collect()[0]
        rows.append(
            (
                k,
                int(r["n_groups"]),
                int(r["groups_scanned"]),
                int(r["rows_total"]),
                int(r["rows_scanned"]),
                10000 * int(r["rows_scanned"]) // int(r["rows_total"]),
            )
        )
    return spark.createDataFrame(
        rows,
        "sort_key string, n_groups long, groups_scanned long, "
        "rows_total long, rows_scanned long, scan_bp long",
    )
