"""Seed-list sources: reference event files, fixture mini-web, and the
synthetic Zipf-skewed frontier generator for scale benches.

The reference consumes one event JSON per Lambda invocation
(app/main.py:13–17, files under events/<state>/layout_<id>.json). The
loader preserves its iteration order — event files sorted (state, layout),
then dict insertion order within each file (app/main.py:21) — as the
(event_seq, seed_seq) columns that the frontier's ordering law sorts by.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schemas


def load_seed_events(events_dir: str) -> list[dict]:
    """Driver-side load of events/<state>/layout_*.json (97 tiny files —
    driver I/O is correct here; the *frontier* is what scales)."""
    rows: list[dict] = []
    event_seq = 0
    for state in sorted(os.listdir(events_dir)):
        sdir = os.path.join(events_dir, state)
        if not os.path.isdir(sdir):
            continue
        for fname in sorted(os.listdir(sdir)):
            if not fname.endswith(".json"):
                continue
            with open(os.path.join(sdir, fname)) as f:
                event = json.load(f)
            layout = str(event.get("layout", fname[len("layout_"):-len(".json")]))
            for seed_seq, (emc, url) in enumerate(event.get("emc", {}).items()):
                rows.append(
                    {
                        "event_seq": event_seq,
                        "seed_seq": seed_seq,
                        "state": event.get("folder", state),
                        "layout": layout,
                        "emc": emc,
                        "url": url,
                        "bucket": event.get("bucket"),
                    }
                )
            event_seq += 1
    return rows


def seeds_df(spark: SparkSession, rows: list[dict]) -> DataFrame:
    return spark.createDataFrame(rows, schemas.SEEDS)


def fixture_miniweb_seeds(spark: SparkSession) -> DataFrame:
    """FIXTURES.md §4 mini-web: 13 GA1-family utilities (the shape of
    events/tx/layout_8.json) + 2 kubra seeds that discover children, one
    hot host repeated 5× to exercise the salted partitioner."""
    rows = []
    for i in range(13):
        host = "hot.fixture-utility.com" if i < 5 else f"u{i}.fixture-utility.com"
        rows.append(
            {
                "event_seq": 0,
                "seed_seq": i,
                "state": "tx",
                "layout": "8",
                "emc": f"Utility {i}",
                "url": f"https://{host}/outages/{i}/",
                "bucket": "data",
            }
        )
    for j in range(2):
        rows.append(
            {
                "event_seq": 1,
                "seed_seq": j,
                "state": "ga",
                "layout": "4",
                "emc": f"Kubra Utility {j}",
                "url": f"https://k{j}.fixture-kubra.com/maps/{j}",
                "bucket": "data",
            }
        )
    return seeds_df(spark, rows)


def synthetic_seeds(
    spark: SparkSession, n_urls: int, n_hosts: int, family: str = "cc"
) -> DataFrame:
    """Distributed synthetic frontier at arbitrary scale (bench path).

    Generated with spark.range — no driver loop, no network. Host ids are
    log-uniform in rank, giving the Zipf-like skew the reference seed set
    shows (28/285 URLs on one host): rank = floor(exp(u·ln(n_hosts))).
    """
    u = (F.pmod(F.xxhash64(F.col("id"), F.lit("host")), F.lit(1_000_000)) / 1_000_000.0)
    host_rank = F.floor(F.exp(u * F.log(F.lit(float(n_hosts))))) - 1
    return (
        spark.range(n_urls)
        .select(
            F.col("id").cast("int").alias("seed_seq"),
            host_rank.cast("long").alias("host_rank"),
        )
        .select(
            F.lit(0).alias("event_seq"),
            F.col("seed_seq"),
            F.lit({"cc": "cc", "ccl": "cc"}.get(family, "tx")).alias("state"),
            F.lit({"cc": "0", "ccl": "1"}.get(family, "8")).alias("layout"),
            F.concat(F.lit("Utility "), F.col("seed_seq")).alias("emc"),
            F.concat(
                F.lit("https://h"), F.col("host_rank"),
                F.lit(".synth-utility.net/outages/"), F.col("seed_seq"),
                # the LINKED family's URLs carry the host count (w{H}) so
                # the fixture renderer draws outlink destinations over
                # the same log-uniform host space as the seeds
                F.lit(f"/w{int(n_hosts)}/" if family == "ccl" else "/"),
            ).alias("url"),
            F.lit("data").alias("bucket"),
        )
    )
