"""Sessionization of outage time series (SURVEY.md O26/O27).

Two implementations of the reference's offline sessionizers
(scripts/bluefire/step1_ganz.py, step1_threshold.py):

1. ``sessionize_sql`` — gaps-and-islands in pure window algebra: a
   session is a maximal run of consecutive observations with
   CustomersOut ≥ threshold within a (utility, state, county, city)
   group. Fully Catalyst-optimized and DuckDB-oracle-checkable. This is
   the step1_ganz threshold-crossing semantics.

2. ``sessionize_threshold_state_machine`` — the full step1_threshold
   merger (cases on Δcustomers vs threshold + abs_diff, split/merge of
   tracked outages, step1_threshold.py:37–200) as a deterministic
   per-group fold in ``applyInPandas``: inherently sequential *within* a
   group, embarrassingly parallel *across* groups — the reference's
   single-threaded loop becomes one Arrow batch per group.

Scale: groups (utility×state×county×city) are plentiful and small →
groupBy hash-distributes well; skewed mega-groups are bounded by the
15-min cadence (~35k rows/year/group), well within one Arrow batch.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

GROUP_KEYS = ["UtilityName", "StateName", "CountyName", "CityName"]


def sessionize_sql(
    ts_df: DataFrame,
    threshold: float = 0,
    keys: list[str] = GROUP_KEYS,
    ts_col: str = "RecordDateTime",
    val_col: str = "CustomersOut",
) -> DataFrame:
    """Gaps-and-islands sessionization + per-session properties.

    Output: one row per outage session with start/end, duration (min),
    peak + time-weighted-mean value (O27: Σ gapᵢ·valᵢ / Σ gapᵢ,
    step1_ganz.py:49–57, forward gaps within the session).
    """
    w = Window.partitionBy(*keys).orderBy(ts_col)
    active = (F.col(val_col) > threshold).cast("int")
    marked = (
        ts_df.withColumn("is_active", active)
        .withColumn("prev_active", F.lag("is_active", 1, 0).over(w))
        .withColumn(
            "session_start", ((F.col("is_active") == 1) & (F.col("prev_active") == 0)).cast("int")
        )
        .withColumn("session_id", F.sum("session_start").over(w))
        .filter(F.col("is_active") == 1)
    )
    ws = Window.partitionBy(*keys, "session_id").orderBy(ts_col)
    gaps = marked.withColumn(
        "gap_s",
        F.coalesce(
            F.unix_timestamp(F.lead(ts_col, 1).over(ws))
            - F.unix_timestamp(F.col(ts_col)),
            F.lit(0),
        ),
    )
    return gaps.groupBy(*keys, "session_id").agg(
        F.min(ts_col).alias("session_start_ts"),
        F.max(ts_col).alias("session_end_ts"),
        (
            (F.unix_timestamp(F.max(ts_col)) - F.unix_timestamp(F.min(ts_col)))
            / 60.0
        ).alias("duration_min"),
        F.count(F.lit(1)).alias("n_obs"),
        F.max(val_col).alias("peak_value"),
        (
            F.sum(F.col("gap_s") * F.col(val_col))
            / F.when(F.sum("gap_s") > 0, F.sum("gap_s")).otherwise(F.lit(None))
        ).alias("tw_mean_value"),
        # exact numerator Σ gapᵢ·valᵢ (integer-exact when val is integral)
        F.sum(F.col("gap_s") * F.col(val_col)).alias("tw_numerator"),
        F.sum("gap_s").alias("active_s"),
    )


def session_properties(sessions: DataFrame) -> DataFrame:
    """Scalar aggregate report per group (O28, step2_property.py:60–94):
    outage frequency, avg duration, avg peak customers."""
    return sessions.groupBy(*GROUP_KEYS).agg(
        F.count(F.lit(1)).alias("outage_frequency"),
        F.avg("duration_min").alias("avg_duration_min"),
        F.avg("peak_value").alias("avg_peak_customers_out"),
        F.sum(
            F.col("tw_mean_value") * F.col("duration_min")
        ).alias("total_customer_minutes"),
    )


_SM_SCHEMA = (
    "UtilityName string, StateName string, CountyName string, CityName string, "
    "session_id int, session_start_ts timestamp, session_end_ts timestamp, "
    "duration_min double, n_obs long, peak_customers_out long, case_d_splits int"
)


def sessionize_threshold_state_machine(
    pous: DataFrame, threshold: int = 0, abs_diff: int = 50
) -> DataFrame:
    """step1_threshold merger semantics (step1_threshold.py:37–200) as a
    per-group ordered fold: a new session opens when customers-out rises
    from ≤threshold; within a session, a jump |Δ| > abs_diff splits a new
    tracked outage (case D); the session closes when customers-out falls
    to ≤threshold."""

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("RecordDateTime")
        out_rows = []
        cur = None
        sid = 0
        splits = 0
        prev_out = 0
        for ts, out in zip(pdf["RecordDateTime"], pdf["CustomersOut"]):
            out = int(out) if pd.notna(out) else 0
            if out > threshold:
                if cur is None:
                    sid += 1
                    splits = 0
                    cur = {"start": ts, "end": ts, "n": 1, "peak": out}
                else:
                    if abs(out - prev_out) > abs_diff:
                        splits += 1  # case D: tracked-outage split
                    cur["end"] = ts
                    cur["n"] += 1
                    cur["peak"] = max(cur["peak"], out)
            else:
                if cur is not None:
                    out_rows.append((sid, cur, splits))
                    cur = None
            prev_out = out
        if cur is not None:
            out_rows.append((sid, cur, splits))
        keys = pdf.iloc[0][GROUP_KEYS].tolist() if len(pdf) else [None] * 4
        return pd.DataFrame(
            [
                {
                    "UtilityName": keys[0],
                    "StateName": keys[1],
                    "CountyName": keys[2],
                    "CityName": keys[3],
                    "session_id": s,
                    "session_start_ts": c["start"],
                    "session_end_ts": c["end"],
                    "duration_min": (c["end"] - c["start"]).total_seconds() / 60.0,
                    "n_obs": c["n"],
                    "peak_customers_out": c["peak"],
                    "case_d_splits": sp,
                }
                for s, c, sp in out_rows
            ],
            columns=[
                "UtilityName", "StateName", "CountyName", "CityName",
                "session_id", "session_start_ts", "session_end_ts",
                "duration_min", "n_obs", "peak_customers_out", "case_d_splits",
            ],
        )

    return pous.groupBy(*GROUP_KEYS).applyInPandas(fold, _SM_SCHEMA)
