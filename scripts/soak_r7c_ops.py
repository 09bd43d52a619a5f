"""Round-7c soak: the q112-q117 operators at 10-100x bench scale.

  q112  pop_wave(domain_budget) over a 4M-row pending frontier, 100k
        hosts / ~10k registered domains with one mega-registrant
        holding ~30% of the pool — the fairness cut must price it at
        its proportional share, never the whole wave
  q113  hop_distance over a 1M-node / 4M-edge graph (binary tree spine
        + shortcut edges): delta-frontier BFS must converge in ~log N
        rounds with every node reached
  q114  detect_mirrors over 4M (host, sig) pages on 20k hosts with
        planted adjacent-pair mirrors + a boilerplate sig on EVERY
        host (the df cut is the skew guard under load)
  q115  bm25_max_score_table over the 50k-doc replica corpus
  q117  merge_inverted_index of two segment indexes over that corpus,
        parity-checked against the full rebuild

Run:  python scripts/soak_r7c_ops.py    (one JSON line; paste to BENCH.md)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from outage_data_scraper_spark.frontier.mirrors import detect_mirrors
from outage_data_scraper_spark.frontier.priority import pop_wave
from outage_data_scraper_spark.operators.graph import hop_distance
from outage_data_scraper_spark.operators.index import (
    bm25_max_score_table,
    build_inverted_index,
    merge_inverted_index,
)
from soak_sf1_corpus import build_corpus  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    replicas = int(os.environ.get("SPARK_GRAFT_SOAK_REPLICAS", "10"))
    n_big = int(os.environ.get("SPARK_GRAFT_SOAK_URLS", "4000000"))
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("soak-r7c-ops")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"sf": "sf0.1 x %d replicas / %dM rows" % (replicas, n_big // 10**6)}

    # ---- q112: domain-fair budgeted pop over a 4M frontier ------------
    # hosts h0..h99999; registrants: host DIV 10 for most (10 hosts per
    # domain), but the first 30% of rows all land on megacorp.com
    dom = F.when(
        F.col("id") % 10 < 3, F.lit("megacorp.com")
    ).otherwise(
        F.concat(F.lit("d"), F.expr("(id % 100000) DIV 10"), F.lit(".com"))
    )
    host = F.concat(F.lit("h"), (F.col("id") % 100000).cast("string"), F.lit("."), dom)
    fr = (
        spark.range(n_big)
        .select(
            F.concat(F.lit("https://"), host, F.lit("/p/"), F.col("id")).alias("url"),
            host.alias("host"),
            F.lit(0).alias("salted_part"),
            (F.col("id") % 7).cast("double").alias("priority"),
            F.lit(0).alias("depth"),
            (F.col("id") % 11).cast("int").alias("event_seq"),
            F.col("id").cast("int").alias("seed_seq"),
            F.lit(0).alias("child_seq"),
            F.lit("pending").alias("status"),
        )
        .repartition(64)
        .localCheckpoint(eager=True)
    )
    budget = 400_000
    t0 = time.monotonic()
    popped = pop_wave(fr, per_host_k=50, num_parts=256, domain_budget=budget)
    mega = popped.filter(F.col("host").endswith(".megacorp.com")).count()
    total = popped.count()
    out["q112_domain_pop_s"] = round(time.monotonic() - t0, 1)
    out["q112_popped"] = int(total)
    out["q112_mega_share_bp"] = int(10000 * mega / total)
    # megacorp pools 30% of raw rows but its per-host cap (50 over
    # ~30k hosts' worth of rows on 100k hosts... it owns the h%10<3
    # slice of EVERY host id) — the quota must price it at its pooled
    # share, well under the whole wave
    assert total == budget, total
    assert mega < total * 0.5, mega

    # ---- q113: BFS over 1M nodes / 4M edges ----------------------------
    n_nodes = n_big // 4
    tree = (
        spark.range(1, n_nodes)
        .select(F.expr("id DIV 2").alias("src"), F.col("id").alias("dst"))
    )
    extra = spark.range(3 * n_nodes).select(
        F.pmod(F.col("id") * 48271, F.lit(n_nodes)).alias("src"),
        F.pmod(F.col("id") * 16807 + 7, F.lit(n_nodes)).alias("dst"),
    )
    seeds = spark.range(1).select(F.col("id").alias("node"))
    t0 = time.monotonic()
    dist = hop_distance(tree.unionByName(extra), seeds, max_rounds=40)
    row = dist.agg(
        F.count(F.lit(1)).alias("n"), F.max("dist").alias("ecc")
    ).collect()[0]
    out["q113_bfs_s"] = round(time.monotonic() - t0, 1)
    out["q113_reached"] = int(row["n"])
    out["q113_eccentricity"] = int(row["ecc"])
    assert int(row["n"]) == n_nodes  # the tree spine reaches everything

    # ---- q114: mirrors over 4M pages / 20k hosts -----------------------
    n_hosts = 20_000
    per_host = n_big // n_hosts
    pages = (
        spark.range(n_big)
        .select(
            F.concat(F.lit("m"), (F.col("id") % n_hosts).cast("string")).alias(
                "host"
            ),
            F.md5(
                F.when(
                    (F.expr(f"id DIV {n_hosts}") + F.col("id")) % 5 == 0,
                    F.concat(
                        F.lit("own/"),
                        (F.col("id") % n_hosts).cast("string"),
                        F.lit("/"),
                        F.expr(f"id DIV {n_hosts}").cast("string"),
                    ),
                ).otherwise(
                    F.concat(
                        F.lit("mir/"),
                        F.expr(f"(id % {n_hosts}) DIV 2").cast("string"),
                        F.lit("/"),
                        F.expr(f"id DIV {n_hosts}").cast("string"),
                    )
                )
            ).alias("sig"),
        )
        .unionByName(
            spark.range(n_hosts).select(
                F.concat(F.lit("m"), F.col("id").cast("string")).alias("host"),
                F.md5(F.lit("common")).alias("sig"),
            )
        )
    )
    t0 = time.monotonic()
    pairs = detect_mirrors(pages, min_shared=per_host // 4, max_df=2)
    n_pairs = pairs.count()
    out["q114_mirrors_s"] = round(time.monotonic() - t0, 1)
    out["q114_pairs"] = int(n_pairs)
    assert n_pairs == n_hosts // 2, n_pairs  # exactly the planted pairs

    # ---- q115 + q117: index ops over the 50k-doc replica corpus --------
    big, _ = build_corpus(spark, sf_dir, replicas)
    tmp = "/tmp/soak_r7c_docs_%d.parquet" % os.getpid()
    big.repartition(64).write.mode("overwrite").parquet(tmp)
    docs = spark.read.parquet(tmp)
    out["n_docs"] = docs.count()

    t0 = time.monotonic()
    ms = bm25_max_score_table(docs)
    out["q115_vocab"] = ms.count()
    out["q115_max_score_s"] = round(time.monotonic() - t0, 1)

    t0 = time.monotonic()
    base = build_inverted_index(docs.filter(F.col("doc_id") % 3 != 0))
    delta = build_inverted_index(docs.filter(F.col("doc_id") % 3 == 0))
    merged = merge_inverted_index(base, delta, min_df=2).localCheckpoint(
        eager=True
    )
    n_terms = merged.count()
    out["q117_merge_s"] = round(time.monotonic() - t0, 1)
    out["q117_terms"] = int(n_terms)
    # parity vs the full rebuild (the q117 law at soak scale)
    full = build_inverted_index(docs, min_df=2)
    diff = merged.unionByName(full).groupBy(
        "term", "df", "total_tf", "postings"
    ).count().filter(F.col("count") != 2).count()
    out["q117_parity_mismatches"] = int(diff)
    assert diff == 0

    print(json.dumps(out))


if __name__ == "__main__":
    main()
