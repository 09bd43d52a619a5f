"""As-of (backward temporal) join — the time-series merge Spark lacks.

For each left row, attach the LATEST right row with ``right.ts <=
left.ts`` in the same key group (optionally within a tolerance). The
classic use: align sensor/outage readings with the most recent
state/price/config change.

Scale shape — union + window, NOT a range join: a per-key range join
explodes on hot keys (every left row probes every earlier right row in
the worst case), and Spark has no merge-join-on-inequality. Instead
both sides union into one stream tagged by side, ONE hash shuffle on
the key partitions it, and a running ``last(right_struct, ignoreNulls)``
over (ts, side) ordering resolves every match in a single sorted pass —
O(n log n) per key, no pair blow-up, AQE-skew-splittable. The right
payload travels as ONE struct so a genuinely-NULL right column can
never reach back to an older row than the matched one.

Tie + duplicate semantics (mirrored by the DuckDB ``ASOF JOIN``
oracle): right rows at exactly left.ts DO match (side orders right
before left at equal ts); duplicate right rows at the same (key, ts)
are resolved deterministically by the caller pre-deduplicating — the
operator asserts nothing about them, exactly like DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | list[str] = "user_id",
    tolerance_us: int | None = None,
    right_prefix: str = "r_",
) -> DataFrame:
    """Backward as-of join. Returns every left row plus the matched
    right row's columns (``right_prefix``-renamed, null when no match
    or outside ``tolerance_us`` microseconds)."""
    by_cols = [by] if isinstance(by, str) else list(by)
    r_payload = [c for c in right.columns if c not in by_cols]
    l_tagged = left.select(
        *by_cols,
        F.col(on).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None).cast(
            right.select(
                F.struct(*[F.col(c) for c in r_payload]).alias("s")
            ).schema["s"].dataType.simpleString()
        ).alias("__r"),
    )
    r_tagged = right.select(
        *by_cols,
        F.col(on).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(
            left.select(
                F.struct(*[F.col(c) for c in left.columns]).alias("s")
            ).schema["s"].dataType.simpleString()
        ).alias("__l"),
        F.struct(*[F.col(c) for c in r_payload]).alias("__r"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(*by_cols)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        unioned.withColumn("__m", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    if tolerance_us is not None:
        in_tol = (
            F.unix_micros(F.col("__ts"))
            - F.unix_micros(F.col(f"__m.{on}"))
        ) <= F.lit(tolerance_us)
        matched = matched.withColumn(
            "__m", F.when(F.col("__m").isNotNull() & in_tol, F.col("__m"))
        )
    out_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(f"__m.{c}").alias(f"{right_prefix}{c}") for c in r_payload]
    return matched.select(*out_cols)
