"""Crawl → typed views → gold pipeline, end-to-end with no intermediate
files (the reference round-trips through CSV in S3; SURVEY.md §3.2)."""

import pytest
from pyspark.sql import functions as F

from outage_data_scraper_spark.catalog import SnapshotCatalog
from outage_data_scraper_spark.frontier.crawler import Crawler
from outage_data_scraper_spark.operators.standardize import standardize_ga1tx8
from outage_data_scraper_spark.operators.views import (
    obs_from_records,
    tn7_rollups,
    typed_view,
)
from outage_data_scraper_spark.sources.fixtures import make_fixture_fetcher
from outage_data_scraper_spark.sources.seeds import (
    fixture_miniweb_seeds,
    load_seed_events,
    seeds_df,
)


@pytest.fixture(scope="module")
def crawled_records(spark, tmp_path_factory):
    cat = SnapshotCatalog(str(tmp_path_factory.mktemp("viewcat")))
    c = Crawler(spark, cat, make_fixture_fetcher, per_host_k=20, num_parts=8)
    c.bootstrap(fixture_miniweb_seeds(spark))
    c.run(max_waves=5)
    return cat.read(spark, "records")


def test_typed_view_ga1_county(spark, crawled_records):
    v = typed_view(crawled_records, "ga1", "per_county")
    rows = v.collect()
    assert rows and all(isinstance(r.customersAffected, int) for r in rows)
    # active-outage filter semantics survived the JSON round trip
    assert all(r.customersAffected != 0 or r.customersOutNow != 0 for r in rows)


def test_crawl_to_gold_pipeline(spark, crawled_records):
    obs = obs_from_records(crawled_records)
    assert obs.count() > 0
    dim = spark.createDataFrame([("99999", "Nowhere")], "zipcode string, county string")
    gold = standardize_ga1tx8(obs, dim, "Fixture EMC", "tx")
    rows = gold.collect()
    assert rows
    cols = gold.columns
    assert cols == [
        "utility_provider", "state", "county", "zipcode", "outage_id",
        "start_time", "end_time", "lat", "lng", "duration", "duration_max",
        "duration_mean", "customer_affected_mean", "total_customer_outage_time",
        "total_customer_outage_time_max", "total_customer_outage_time_mean",
    ]
    # single-observation outages (one crawl wave per outage id):
    # duration_max = duration + 15, tcot rules hold
    for r in rows:
        assert r.duration_max == pytest.approx(r.duration + 15, abs=0.01)


def _geo_dim(spark):
    return spark.createDataFrame(
        [(33.75, -84.39, "30303"), (30.27, -97.74, "78701")],
        "lat_r double, lng_r double, zipcode string",
    )


def test_reverse_geocode_zip_guard_and_lookup(spark):
    """O16: broadcast geo-dim lookup below the <10-point guard, sentinel
    above it, 'unknown' on cell miss (ga_scraper.py:107–116, 240–249)."""
    from outage_data_scraper_spark.operators.standardize import (
        ZIP_GUARD_SENTINEL,
        ZIP_UNKNOWN,
        reverse_geocode_zip,
    )

    rows = [("small", 33.751, -84.392)] * 3 + [("small", 0.0, 0.0)] + [
        ("big", 33.749, -84.388)
    ] * 12
    pts = spark.createDataFrame(rows, "emc string, lat double, lng double")
    out = reverse_geocode_zip(pts, _geo_dim(spark), group_keys=["emc"]).collect()
    got = {}
    for r in out:
        got.setdefault(r.emc, set()).add(r.zipcode)
    assert got["small"] == {"30303", ZIP_UNKNOWN}  # lookup + cell miss
    assert got["big"] == {ZIP_GUARD_SENTINEL}      # ≥10 points → sentinel


def test_standardize_resolves_missing_zip_through_geo_dim(spark):
    from outage_data_scraper_spark.operators.standardize import ZIP_GUARD_SENTINEL

    obs = spark.createDataFrame(
        [
            ("o1", "2024-08-01 10:00:00", "2024-08-01 09:30:00", 5, 33.748, -84.391, None),
            ("o2", "2024-08-01 10:00:00", "2024-08-01 09:30:00", 7, 30.266, -97.743, "78799"),
            ("o3", "2024-08-01 10:00:00", "2024-08-01 09:30:00", 9, 30.266, -97.743, ZIP_GUARD_SENTINEL),
        ],
        "outage_id string, timestamp string, start_time string, "
        "customer_affected long, lat double, lng double, zipcode string",
    ).withColumn("timestamp", F.to_timestamp("timestamp")).withColumn(
        "start_time", F.to_timestamp("start_time")
    )
    dim = spark.createDataFrame([("30303", "Fulton")], "zipcode string, county string")
    gold = standardize_ga1tx8(obs, dim, "EMC", "ga", geo_dim=_geo_dim(spark))
    zips = {r.outage_id: r.zipcode for r in gold.collect()}
    assert zips["o1"] == "30303"            # null resolved through the dim
    assert zips["o2"] == "78799"            # payload zip untouched
    assert zips["o3"] == ZIP_GUARD_SENTINEL  # guard sentinel untouched
    counties = {r.outage_id: r.county for r in gold.collect()}
    assert counties["o1"] == "Fulton"       # resolved zip joins the county dim


def test_tn7_rollups_from_real_seed(spark, tmp_path):
    rows = [
        r for r in load_seed_events("/root/reference/events")
        if (r["state"], r["layout"]) == ("tn", "7")
    ]
    if not rows:
        pytest.skip("tn7 seed not present")
    cat = SnapshotCatalog(str(tmp_path / "cat"))
    c = Crawler(spark, cat, make_fixture_fetcher, per_host_k=20, num_parts=8)
    c.bootstrap(seeds_df(spark, rows))
    c.run(max_waves=3)
    records = cat.read(spark, "records")
    county, zipc = tn7_rollups(records)
    v = typed_view(records, "tn7", "per_outage")
    # rollup conservation: sums match the flat records
    assert (
        county.agg(F.sum("customerCount")).first()[0]
        == v.agg(F.sum("customerCount")).first()[0]
        == zipc.agg(F.sum("customerCount")).first()[0]
    )


def test_gold_with_real_ga_mapping_dimension(spark):
    """O21 against the reference's actual zip→county map
    (app/pipeline/ga_mapping.json, 679 entries) as a broadcast dimension."""
    import json
    import os

    path = "/root/reference/app/pipeline/ga_mapping.json"
    if not os.path.exists(path):
        pytest.skip("reference mapping not available")
    mapping = json.load(open(path))
    dim = spark.createDataFrame(list(mapping.items()), "zipcode string, county string")

    obs = spark.createDataFrame(
        [("O1", "2024-08-01 10:15:00", "2024-08-01 10:00:00", 10, 33.0, -84.0, "30002"),
         ("O2", "2024-08-01 10:15:00", "2024-08-01 10:00:00", 20, 33.0, -84.0, "30004"),
         ("O3", "2024-08-01 10:15:00", "2024-08-01 10:00:00", 30, 33.0, -84.0, "99999")],
        "outage_id string, timestamp string, start_time string, "
        "customer_affected long, lat double, lng double, zipcode string",
    ).withColumns({"timestamp": F.to_timestamp("timestamp"), "start_time": F.to_timestamp("start_time")})
    gold = {r.outage_id: r.county for r in
            standardize_ga1tx8(obs, dim, "GA EMC", "ga").collect()}
    assert gold["O1"] == "Dekalb" and gold["O2"] == "Fulton"
    assert gold["O3"] is None  # unmapped zip → null county (Series.map semantics)
