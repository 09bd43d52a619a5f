"""Crawl the REAL reference seed list (events/*/*.json, 285 seeds across
97 event files) end-to-end against the fixture renderer.

This is the crawl-parity artifact of SURVEY.md §5.2: the engine loads the
reference's own seed files, reproduces its iteration order as the
(event_seq, seed_seq) frontier sort key, fetches every mapped-family URL
(deterministic fixture payloads), and captures unmapped families as
fetch failures without aborting — mirroring the reference's per-URL
try/except (app/main.py:22–41).
"""

import os

import pytest
from pyspark.sql import functions as F

from outage_data_scraper_spark.catalog import SnapshotCatalog
from outage_data_scraper_spark.frontier.crawler import Crawler
from outage_data_scraper_spark.parsers.registry import FAMILY_BY_STATE_LAYOUT
from outage_data_scraper_spark.sources.fixtures import make_fixture_fetcher
from outage_data_scraper_spark.sources.seeds import load_seed_events, seeds_df

EVENTS_DIR = "/root/reference/events"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(EVENTS_DIR), reason="reference events not available"
)


@pytest.fixture(scope="module")
def ref_rows():
    return load_seed_events(EVENTS_DIR)


@pytest.fixture(scope="module")
def ref_crawl(spark, tmp_path_factory, ref_rows):
    cat = SnapshotCatalog(str(tmp_path_factory.mktemp("refcrawl")))
    c = Crawler(spark, cat, make_fixture_fetcher, per_host_k=50, num_parts=16,
                salt=2, rate_per_host=1000.0)
    c.bootstrap(seeds_df(spark, ref_rows))
    c.run(max_waves=10)
    return c, cat


def test_seed_loader_shape(ref_rows):
    assert len(ref_rows) >= 280  # 285 counted in SURVEY.md §0
    states = {r["state"] for r in ref_rows}
    assert {"ga", "tx", "fl", "ca"} <= states
    # insertion order within an event is preserved (app/main.py:21)
    tx8 = [r for r in ref_rows if r["state"] == "tx" and r["layout"] == "8"]
    assert tx8[0]["seed_seq"] == 0
    assert tx8[0]["emc"] == "Bryan Texas Utilities"


def test_mapped_families_all_fetch_ok(spark, ref_crawl, ref_rows):
    c, cat = ref_crawl
    log = c.fetch_log()
    mapped = {
        (r["state"], r["layout"]) for r in ref_rows
    } & set(FAMILY_BY_STATE_LAYOUT)
    # every mapped (state,layout) produced at least one successful fetch
    ok_pairs = {
        (r.state, r.layout)
        for r in log.filter(F.col("status") == 200).select("state", "layout").distinct().collect()
    }
    missing = mapped - ok_pairs
    assert not missing, f"mapped families with no successful fetch: {missing}"


def test_unmapped_families_fail_gracefully(ref_crawl):
    c, _ = ref_crawl
    log = c.fetch_log()
    failed = log.filter(F.col("status") != 200)
    # failures exist (not all reference layouts are implemented yet) and
    # carry the failure-sink columns (app/main.py:19)
    assert failed.count() > 0
    row = failed.first()
    assert row.reason is not None and row.state is not None


def test_frontier_order_matches_reference_iteration(spark, ref_crawl, ref_rows):
    c, _ = ref_crawl
    # project the ordering law onto depth-0 seed rows: must equal the
    # event-file × insertion order of the reference exactly
    got = [
        (r.event_seq, r.seed_seq)
        for r in c.frontier()
        .filter((F.col("depth") == 0) & (F.col("child_seq") == 0))
        .orderBy("event_seq", "seed_seq")
        .select("event_seq", "seed_seq")
        .collect()
    ]
    expected = [(r["event_seq"], r["seed_seq"]) for r in ref_rows]
    assert got == expected


def test_records_cover_major_levels(spark, ref_crawl):
    _, cat = ref_crawl
    levels = {
        r.level
        for r in cat.read(spark, "records").select("level").distinct().collect()
    }
    assert {"per_county", "per_outage", "per_zipcode", "per_substation"} <= levels
