"""Explicit schemas for every engine table (SURVEY.md §1, FIXTURES.md §1).

The reference infers every schema dynamically from payload dicts
(reference: app/scrapers/*.py `pd.DataFrame(list_of_dicts)`); the engine
inverts that — schema-on-write, one fixed StructType per table, so scans
prune columns and Catalyst folds constants.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ---------------------------------------------------------------------------
# Core input: Common-Crawl-style pages table (BASELINE.json input_hint).
# Partition spec at scale: (bucket(16, url), days(warc_ts)).
# ---------------------------------------------------------------------------
PAGES = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
        StructField("html", BinaryType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Seeds: one row per (event file, emc entry), mirroring the reference event
# JSON shape {layout, emc:{name→url}, bucket, folder} (app/main.py:13–17).
# (event_seq, seed_seq) capture the reference's deterministic iteration
# order over event files and dict insertion order (app/main.py:21), which is
# the crawl-ordering law the frontier must reproduce (SURVEY.md §7.3).
# ---------------------------------------------------------------------------
SEEDS = StructType(
    [
        StructField("event_seq", IntegerType(), False),
        StructField("seed_seq", IntegerType(), False),
        StructField("state", StringType(), False),
        StructField("layout", StringType(), False),
        StructField("emc", StringType(), False),
        StructField("url", StringType(), False),
        StructField("bucket", StringType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Frontier: the distributed priority queue. status ∈ {pending, fetched,
# failed}. Sort key (priority, event_seq, seed_seq, depth, child_seq) is a
# refinement of the reference's sequential order (SURVEY.md §7.3).
# ---------------------------------------------------------------------------
FRONTIER = StructType(
    [
        StructField("url", StringType(), False),
        StructField("host", StringType(), False),
        StructField("salted_part", IntegerType(), False),
        StructField("priority", DoubleType(), False),
        StructField("depth", IntegerType(), False),
        StructField("event_seq", IntegerType(), False),
        StructField("seed_seq", IntegerType(), False),
        StructField("child_seq", IntegerType(), False),
        StructField("state", StringType(), True),
        StructField("layout", StringType(), True),
        StructField("emc", StringType(), True),
        StructField("family", StringType(), True),
        StructField("status", StringType(), False),
        StructField("wave", IntegerType(), False),
    ]
)

# Exact URL-seen set (anti-join path). The Bloom path stores shards in
# SEEN_BLOOM; both satisfy the `visited` semantics of
# il_scraper.py:200–204 (false positives only suppress re-fetches).
SEEN = StructType(
    [
        StructField("url_hash", LongType(), False),
        StructField("url", StringType(), False),
        StructField("wave", IntegerType(), False),
        StructField("partition_id", IntegerType(), False),
    ]
)

SEEN_BLOOM = StructType(
    [
        StructField("partition_id", IntegerType(), False),
        StructField("bitset", BinaryType(), False),
        StructField("n", LongType(), False),
    ]
)

ROBOTS = StructType(
    [
        StructField("host", StringType(), False),
        StructField("fetched_ts", TimestampType(), False),
        StructField("rules", StringType(), True),
        StructField("allow_all", StringType(), True),  # "allow" | "deny" | "rules"
        StructField("crawl_delay", DoubleType(), True),
    ]
)

# Per-fetch outcome row; mirrors the reference failure sink columns
# state/layout/emc/reason/timestamp (app/main.py:19,32–48) plus lineage.
FETCH_LOG = StructType(
    [
        StructField("url", StringType(), False),
        StructField("wave", IntegerType(), False),
        StructField("ts", TimestampType(), False),
        StructField("status", IntegerType(), False),
        StructField("reason", StringType(), True),
        StructField("bytes", LongType(), True),
        StructField("partition_id", IntegerType(), True),
        StructField("emc", StringType(), True),
        StructField("state", StringType(), True),
        StructField("layout", StringType(), True),
    ]
)

# Long-format extracted records: one row per (url, level, record). `data`
# is the record as canonical JSON; per-family typed views come from
# F.from_json with the family schema. `text` is the byte-identical
# extracted-text invariant target (BASELINE.json input_hint).
RECORDS = StructType(
    [
        StructField("url", StringType(), False),
        StructField("state", StringType(), True),
        StructField("layout", StringType(), True),
        StructField("emc", StringType(), True),
        StructField("level", StringType(), False),
        StructField("data", StringType(), False),
        StructField("text", StringType(), True),
        StructField("run_ts", TimestampType(), False),
        StructField("wave", IntegerType(), False),
    ]
)

# Gold-layer unified outage record (reference: app/pipeline/pipeline.py:64–68).
GOLD_OUTAGE = StructType(
    [
        StructField("utility_provider", StringType(), True),
        StructField("state", StringType(), True),
        StructField("county", StringType(), True),
        StructField("zipcode", StringType(), True),
        StructField("outage_id", StringType(), True),
        StructField("start_time", TimestampType(), True),
        StructField("end_time", TimestampType(), True),
        StructField("lat", DoubleType(), True),
        StructField("lng", DoubleType(), True),
        StructField("duration", DoubleType(), True),
        StructField("duration_max", DoubleType(), True),
        StructField("duration_mean", DoubleType(), True),
        StructField("customer_affected_mean", DoubleType(), True),
        StructField("total_customer_outage_time", DoubleType(), True),
        StructField("total_customer_outage_time_max", DoubleType(), True),
        StructField("total_customer_outage_time_mean", DoubleType(), True),
    ]
)

# Sessionizer input (reference: scripts/bluefire/step1_ganz.py:13–25).
POUS = StructType(
    [
        StructField("UtilityName", StringType(), False),
        StructField("StateName", StringType(), False),
        StructField("CountyName", StringType(), False),
        StructField("CityName", StringType(), False),
        StructField("CountyFIPS", StringType(), True),
        StructField("CustomersTracked", LongType(), True),
        StructField("CustomersOut", LongType(), True),
        StructField("RecordDateTime", TimestampType(), False),
    ]
)

# Multimodal asset table: opaque binary payload + typed metadata
# (training-data pipeline surface; decode itself is stubbed, plumbing real).
ASSETS = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_s", DoubleType(), True),
    ]
)

EMBEDDINGS = StructType(
    [
        StructField("vec_id", LongType(), False),
        StructField("embedding", ArrayType(DoubleType()), True),
        StructField("label", IntegerType(), True),
    ]
)
