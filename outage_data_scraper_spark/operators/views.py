"""Typed relational views over the long-format records table.

The crawl writes records as (level, data-JSON) rows; analytics wants
columns. One `F.from_json` with the family-level schema turns a slice of
the records table into a typed DataFrame — schema-on-read per family,
with the schemas frozen here (the engine inverse of the reference's
dynamic pandas inference, SURVEY.md §1.3).

`obs_from_records` then lifts GA1 per_outage records into the
observation shape the gold pipeline consumes — crawl → records →
standardize with no intermediate files (the reference round-trips
through CSV in S3, util.py:21–60).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (family, level) → DDL schema of the record JSON
RECORD_SCHEMAS: dict[tuple[str, str], str] = {
    ("ga1", "per_county"): "name string, customersAffected long, customersOutNow long",
    ("ga1", "per_outage"): (
        "outageRecID string, outageStartTime string, customersOutNow long, "
        "outagePoint struct<lat:double, lng:double>, zip string"
    ),
    ("ga3", "per_county"): "CountyName string, CustomersAffected string",
    ("kubra", "per_county"): "name string, cust_a long, percent_cust_a double, n_out long",
    ("kubra", "per_zipcode"): "name string, cust_a long, percent_cust_a double, n_out long",
    ("tx5", "per_county"): "name string, cust_a long, percent_cust_a double, n_out long",
    ("tx5", "per_zipcode"): "name string, cust_a long, percent_cust_a double, n_out long",
    ("tx5", "per_city"): "name string, cust_a long, percent_cust_a double, n_out long",
    ("tx5", "per_region"): "name string, cust_a long, percent_cust_a double, n_out long",
    ("tx4", "per_county"): "name string, customersAffected long, lastUpdatedTime string",
    ("tn7", "per_outage"): (
        "id string, county string, zipcode string, customerCount long, "
        "lat double, lon double"
    ),
    ("cc", "per_page"): "n_tokens long, n_chars long",
}


def typed_view(records: DataFrame, family: str, level: str) -> DataFrame:
    """records slice → typed columns + provenance (url, emc, run_ts).

    Filters by BOTH level and the family's (state, layout) pairs — many
    families emit a `per_county` level with different record shapes, so
    level alone under-constrains the slice."""
    from ..parsers.registry import FAMILY_BY_STATE_LAYOUT

    pairs = [sl for sl, fam in FAMILY_BY_STATE_LAYOUT.items() if fam == family]
    pair_pred = F.concat_ws("|", "state", "layout").isin(
        [f"{s}|{l}" for s, l in pairs]
    )
    ddl = RECORD_SCHEMAS[(family, level)]
    return (
        records.filter((F.col("level") == level) & pair_pred)
        .select(
            "url", "emc", "run_ts", "wave",
            F.from_json("data", ddl).alias("r"),
        )
        .select("url", "emc", "run_ts", "wave", "r.*")
    )


def obs_from_records(records: DataFrame) -> DataFrame:
    """GA1 per_outage records → the observation table the GA1TX8 gold
    pipeline consumes (operators/standardize.py). Column mapping mirrors
    the reference's renames (pipeline.py:118–123)."""
    v = typed_view(records, "ga1", "per_outage")
    return v.select(
        F.col("outageRecID").alias("outage_id"),
        F.col("run_ts").alias("timestamp"),
        F.to_timestamp(F.col("outageStartTime")).alias("start_time"),
        F.col("customersOutNow").alias("customer_affected"),
        F.col("outagePoint.lat").alias("lat"),
        F.col("outagePoint.lng").alias("lng"),
        F.col("zip").alias("zipcode"),
    )


def tn7_rollups(records: DataFrame) -> tuple[DataFrame, DataFrame]:
    """The reference's TN7 per_county / per_zipcode groupby-sum rollups
    (tn_scraper.py:190–200) as engine-side hash aggregates (O17)."""
    v = typed_view(records, "tn7", "per_outage")
    county = v.groupBy("emc", "county").agg(
        F.sum("customerCount").alias("customerCount")
    )
    zipcode = v.groupBy("emc", "zipcode").agg(
        F.sum("customerCount").alias("customerCount")
    )
    return county, zipcode
