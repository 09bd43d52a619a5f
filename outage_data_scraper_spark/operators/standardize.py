"""Gold-layer standardization: per-outage metrics + unified schema.

Re-expresses the reference's only implemented pipeline, GA1TX8
(app/pipeline/pipeline.py:53–125), as pure DataFrame algebra:

- end_time      = max(timestamp) over outage      (O18, pipeline.py:112)
- per-outage metrics via ordered first/last windows + aggregates
                                                  (O19, pipeline.py:79–98)
- metrics joined back on (outage_id, timestamp=end_time)
                                                  (O20, pipeline.py:58)
- zipcode→county broadcast-joined dimension       (O21, pipeline.py:62)

No applyInPandas needed: the reference's groupby().apply() reads only
first/last rows and sums — all window/agg expressible, so the whole thing
stays in whole-stage codegen and is DuckDB-oracle-checkable.

Scale note: the window and the aggregate share the outage_id hash
partitioning, so Catalyst reuses one shuffle; the final join's right side
is one row per outage (≪ observations) and the zip→county dimension is
tiny → both broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def compute_outage_metrics(obs: DataFrame) -> DataFrame:
    """Per-outage metrics from observation rows.

    Input columns: outage_id, timestamp, start_time, customer_affected.
    Output: one row per outage_id with the reference's metric set
    (pipeline.py:79–98), where `timestamp` = the last observation's
    end_time — the reference's merge key.
    """
    w = (
        Window.partitionBy("outage_id")
        .orderBy("timestamp")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    enriched = obs.select(
        "outage_id",
        "timestamp",
        "start_time",
        "customer_affected",
        F.first("customer_affected").over(w).alias("first_ca"),
        F.last("customer_affected").over(w).alias("last_ca"),
        F.first("timestamp").over(w).alias("first_ts"),
        F.first("start_time").over(w).alias("first_st"),
        F.max("timestamp").over(w).alias("end_time"),
        F.last("start_time").over(w).alias("last_st"),
    )
    per_outage = enriched.groupBy("outage_id").agg(
        F.max("end_time").alias("end_time"),
        F.max("last_st").alias("start_time"),
        F.sum("customer_affected").alias("sum_ca"),
        F.avg("customer_affected").alias("customer_affected_mean"),
        F.max("first_ca").alias("first_ca"),
        F.max("last_ca").alias("last_ca"),
        F.max("first_ts").alias("first_ts"),
        F.max("first_st").alias("first_st"),
    )
    minutes = lambda a, b: (F.unix_timestamp(a) - F.unix_timestamp(b)) / 60.0  # noqa: E731
    duration = minutes(F.col("end_time"), F.col("start_time"))
    tcot = (
        15.0 * (F.col("sum_ca") - F.col("first_ca"))
        + minutes(F.col("first_ts"), F.col("first_st")) * F.col("first_ca")
    )
    return per_outage.select(
        "outage_id",
        F.col("end_time").alias("timestamp"),  # reference merge key
        "start_time",
        "end_time",
        duration.alias("duration"),
        (duration + 15.0).alias("duration_max"),
        (duration + 7.5).alias("duration_mean"),
        "customer_affected_mean",
        tcot.alias("total_customer_outage_time"),
        (tcot + 15.0 * F.col("last_ca")).alias("total_customer_outage_time_max"),
        (tcot + 7.5 * F.col("last_ca")).alias("total_customer_outage_time_mean"),
    )


ZIP_GUARD_SENTINEL = "Outage scale too large to extract zipcodes"
ZIP_UNKNOWN = "unknown"


def reverse_geocode_zip(
    points: DataFrame,
    geo_dim: DataFrame,
    lat_col: str = "lat",
    lng_col: str = "lng",
    out_col: str = "zipcode",
    precision: int = 2,
    guard_count: int = 10,
    group_keys: list[str] | None = None,
) -> DataFrame:
    """O16 reverse-geocode enrichment, the engine's Nominatim stand-in
    (ga_scraper.py:107–116 extract_zipcode + the :240–249 scale guard).

    ``geo_dim``: (lat_r, lng_r, zipcode) — coordinates rounded to
    ``precision`` decimals (≈1.1 km cells at 2 dp, the resolution a
    postcode lookup needs). It is a bounded dimension (one row per
    inhabited cell) → broadcast join; misses get 'unknown' exactly like
    the reference's failed Nominatim calls.

    Guard parity: the reference only geocodes batches with fewer than 10
    points and writes a sentinel otherwise. ``group_keys`` scopes that
    count (per parse batch ≈ per (emc, wave)); None applies no guard.
    """
    lat_r = F.round(F.col(lat_col), precision).alias("lat_r")
    lng_r = F.round(F.col(lng_col), precision).alias("lng_r")
    dim = geo_dim.select(
        F.col("lat_r"), F.col("lng_r"), F.col("zipcode").alias("__geo_zip")
    )
    joined = (
        points.withColumn("lat_r", lat_r)
        .withColumn("lng_r", lng_r)
        .join(F.broadcast(dim), ["lat_r", "lng_r"], "left")
        .drop("lat_r", "lng_r")
    )
    looked_up = F.coalesce(F.col("__geo_zip"), F.lit(ZIP_UNKNOWN))
    if group_keys:
        n = F.count(F.lit(1)).over(Window.partitionBy(*group_keys))
        looked_up = F.when(n < guard_count, looked_up).otherwise(
            F.lit(ZIP_GUARD_SENTINEL)
        )
    return joined.withColumn(out_col, looked_up).drop("__geo_zip")


def standardize_ga1tx8(
    obs: DataFrame,
    zip_county: DataFrame,
    utility_provider: str,
    state: str,
    geo_dim: DataFrame | None = None,
    tz: str | None = "US/Eastern",
) -> DataFrame:
    """Full GA1TX8 standardization → the 16-column gold schema
    (pipeline.py:64–68). ``obs`` columns: outage_id, timestamp,
    start_time, customer_affected, lat, lng, zipcode.
    ``zip_county``: (zipcode, county) dimension (ga_mapping.json).
    ``geo_dim``: optional (lat_r, lng_r, zipcode) broadcast dimension —
    rows whose zipcode is missing resolve through it (O16); payload zips
    and the scale-guard sentinel pass through untouched.
    ``tz``: the reference converts timestamps UTC→US/Eastern before
    anything else (pipeline.py:108–111, ``tz_convert(eastern)``); since
    its timestamps stay tz-aware, every duration/total there is an
    absolute-time difference — so computing the metrics on the UTC
    instants and rendering only the OUTPUT wall-clock columns
    (start_time/end_time) in ``tz`` is exactly equivalent, and avoids
    the 1-hour error naive-then-subtract arithmetic would pick up on
    outages spanning a DST transition. ``tz=None`` keeps raw UTC."""
    if geo_dim is not None:
        resolved = reverse_geocode_zip(
            obs.filter(F.col("zipcode").isNull()), geo_dim
        )
        obs = obs.filter(F.col("zipcode").isNotNull()).unionByName(resolved)
    metrics = compute_outage_metrics(obs)
    joined = metrics.join(
        obs.select("outage_id", "timestamp", "lat", "lng", "zipcode"),
        ["outage_id", "timestamp"],
        "inner",
    )
    with_county = joined.join(F.broadcast(zip_county), ["zipcode"], "left")
    r2 = lambda c: F.round(F.col(c), 2).alias(c)  # noqa: E731  (pipeline.py:57 .round(2))
    local = (
        (lambda c: F.from_utc_timestamp(F.col(c), tz).alias(c))
        if tz
        else (lambda c: F.col(c))
    )
    return with_county.select(
        F.lit(utility_provider).alias("utility_provider"),
        F.lit(state).alias("state"),
        "county",
        "zipcode",
        "outage_id",
        local("start_time"),
        local("end_time"),
        "lat",
        "lng",
        r2("duration"),
        r2("duration_max"),
        r2("duration_mean"),
        r2("customer_affected_mean"),
        r2("total_customer_outage_time"),
        r2("total_customer_outage_time_max"),
        r2("total_customer_outage_time_mean"),
    )
