"""Round-7d soak: the q122-q126 operators at 10-100x bench scale.

  q122  badwords_filter over the 50k-doc replica corpus (1- and
        3-token phrases planted on deterministic subsets)
  q124  pruning_report over 4M synthetic rows, correlated vs
        uncorrelated candidate keys
  q126  the incremental index refresh vs the full rebuild it must
        equal: base exists, ~14% of docs change -> diff, tombstone
        compaction, delta build, merge — wall vs rebuilding from
        scratch, with row-for-row parity asserted

Run:  python scripts/soak_r7d_ops.py    (one JSON line; paste to BENCH.md)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from outage_data_scraper_spark.frontier.snapshot import snapshot_diff
from outage_data_scraper_spark.operators.badwords import badwords_filter
from outage_data_scraper_spark.operators.index import (
    build_inverted_index,
    merge_inverted_index,
    remove_docs_from_index,
)
from outage_data_scraper_spark.plans.layout import pruning_report
from soak_sf1_corpus import build_corpus  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    replicas = int(os.environ.get("SPARK_GRAFT_SOAK_REPLICAS", "10"))
    n_big = int(os.environ.get("SPARK_GRAFT_SOAK_URLS", "4000000"))
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("soak-r7d-ops")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"sf": "sf0.1 x %d replicas / %dM rows" % (replicas, n_big // 10**6)}

    big, _ = build_corpus(spark, sf_dir, replicas)
    tmp = "/tmp/soak_r7d_docs_%d.parquet" % os.getpid()
    big.repartition(64).write.mode("overwrite").parquet(tmp)
    docs = spark.read.parquet(tmp)
    out["n_docs"] = docs.count()

    # ---- q122: blocklist filter over 50k docs -------------------------
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 17 == 0, F.lit(" zorblax")).otherwise(
                F.lit("")
            ),
            F.when(
                F.col("doc_id") % 23 == 0, F.lit(" grim flagged phrase")
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    t0 = time.monotonic()
    flagged = badwords_filter(planted, ("zorblax", "grim flagged phrase"))
    row = flagged.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((~F.col("keep")).cast("long")).alias("dropped"),
    ).collect()[0]
    out["q122_badwords_s"] = round(time.monotonic() - t0, 1)
    out["q122_dropped"] = int(row["dropped"])
    assert int(row["n"]) == out["n_docs"]
    assert int(row["dropped"]) > 0

    # ---- q124: layout planner over 4M rows ----------------------------
    ev = (
        spark.range(n_big)
        .select(
            F.col("id").alias("seq_key"),
            F.pmod(F.col("id") * 48271, F.lit(100_000)).alias("rand_key"),
            # probe column correlated with seq_key (event time)
            (F.col("id") * 37 + F.pmod(F.col("id"), F.lit(1000))).alias("ts_us"),
        )
        .repartition(64)
        .localCheckpoint(eager=True)
    )
    lo = 37 * (n_big // 2)
    hi = 37 * (n_big // 2 + n_big // 20)
    t0 = time.monotonic()
    rep = {
        r.sort_key: (r.groups_scanned, r.n_groups, r.scan_bp)
        for r in pruning_report(
            ev, ["seq_key", "rand_key"], F.col("ts_us"), lo=lo, hi=hi
        ).collect()
    }
    out["q124_layout_s"] = round(time.monotonic() - t0, 1)
    out["q124_seq_scan_bp"] = rep["seq_key"][2]
    out["q124_rand_scan_bp"] = rep["rand_key"][2]
    assert rep["seq_key"][2] < 1500 and rep["rand_key"][2] == 10000

    # ---- q126: incremental refresh vs full rebuild --------------------
    old = docs.select("doc_id", "text")
    new = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.col("text"), F.lit(" updated fresh content")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    ).localCheckpoint(eager=True)
    base = build_inverted_index(old).localCheckpoint(eager=True)  # pre-existing
    t0 = time.monotonic()
    diff = snapshot_diff(
        old.select("doc_id", F.md5("text").alias("sig")),
        new.select("doc_id", F.md5("text").alias("sig")),
        "doc_id",
        "sig",
    )
    changed = diff.filter(F.col("status") == "changed").select("doc_id")
    compacted = remove_docs_from_index(base, changed)
    delta = build_inverted_index(new.join(changed, "doc_id"))
    merged = merge_inverted_index(compacted, delta, min_df=2).localCheckpoint(
        eager=True
    )
    out["q126_terms"] = merged.count()
    out["q126_incremental_s"] = round(time.monotonic() - t0, 1)
    t0 = time.monotonic()
    full = build_inverted_index(new, min_df=2).localCheckpoint(eager=True)
    full.count()
    out["q126_full_rebuild_s"] = round(time.monotonic() - t0, 1)
    mismatches = (
        merged.unionByName(full)
        .groupBy("term", "df", "total_tf", "postings")
        .count()
        .filter(F.col("count") != 2)
        .count()
    )
    out["q126_parity_mismatches"] = int(mismatches)
    assert mismatches == 0

    print(json.dumps(out))


if __name__ == "__main__":
    main()
