"""Round-7b soak: the later round-7 operators at 10-100x bench scale —
sf1-equivalent evidence for the ops q98-q108 added after soak_r7_ops.py
was stamped.

  q98   pack_sequences over 500k synthetic doc sizes (the two-level
        prefix sum at 10x the corpus; conservation asserted)
  q99   chunk_dedup_keep_first on the 50k-doc replica corpus (the
        keep-first winner shuffle at replica density)
  q100  resolve_redirects over 4M synthesized chains (pointer doubling:
        must stay at ceil(log2(64)) = 6 self-join rounds regardless of N)
  q101  detect_traps over 4M URLs, exact AND approx (HLL) mode
  q105  snapshot_diff over two 4M-key signature snapshots
  q108  hits_micro, 3 rounds, over a 4M-edge host graph

Run:  python scripts/soak_r7b_ops.py    (one JSON line; paste to BENCH.md)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from outage_data_scraper_spark.frontier.redirects import resolve_redirects
from outage_data_scraper_spark.frontier.snapshot import (
    snapshot_diff,
    snapshot_diff_stats,
)
from outage_data_scraper_spark.frontier.traps import detect_traps
from outage_data_scraper_spark.operators.dedup import chunk_dedup_keep_first
from outage_data_scraper_spark.operators.graph import hits_micro
from outage_data_scraper_spark.operators.packing import pack_sequences
from soak_sf1_corpus import build_corpus  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    replicas = int(os.environ.get("SPARK_GRAFT_SOAK_REPLICAS", "10"))
    n_big = int(os.environ.get("SPARK_GRAFT_SOAK_URLS", "4000000"))
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("soak-r7b-ops")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"sf": "sf0.1 x %d replicas / %dM rows" % (replicas, n_big // 10**6)}

    # ---- q98: packing prefix sum over 500k doc sizes -----------------
    sized = (
        spark.range(500_000)
        .select(
            F.col("id").alias("doc_id"),
            (F.pmod(F.col("id") * 2654435761, F.lit(1500)) + 1).alias("n_tok"),
        )
        .localCheckpoint(eager=True)
    )
    t0 = time.monotonic()
    seqs = pack_sequences(sized, "n_tok", "doc_id", seq_len=2048, chunk=4096)
    tok_packed = seqs.agg(F.sum("n_tokens")).collect()[0][0]
    out["q98_pack_s"] = round(time.monotonic() - t0, 1)
    out["q98_sequences"] = seqs.count()
    tok_in = sized.agg(F.sum("n_tok")).collect()[0][0]
    assert int(tok_packed) == int(tok_in), (tok_packed, tok_in)

    # ---- q99: keep-first chunk dedup on the replica corpus -----------
    big, _ = build_corpus(spark, sf_dir, replicas)
    tmp = "/tmp/soak_r7b_docs_%d.parquet" % os.getpid()
    big.repartition(64).write.mode("overwrite").parquet(tmp)
    docs = spark.read.parquet(tmp)
    out["n_docs"] = docs.count()
    t0 = time.monotonic()
    kept = chunk_dedup_keep_first(docs)
    row = kept.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_spans").alias("spans"),
        F.sum("n_dropped").alias("dropped"),
    ).collect()[0]
    out["q99_chunk_dedup_s"] = round(time.monotonic() - t0, 1)
    out["q99_docs_out"] = int(row["n"])
    out["q99_dropped_frac"] = round(int(row["dropped"]) / int(row["spans"]), 4)

    # ---- q100: pointer doubling over 4M chains ------------------------
    nodes = spark.range(n_big).select(F.col("id").alias("src"))
    edges = nodes.select(
        "src", (F.col("src") - 1 - (F.col("src") % 3)).alias("dst")
    ).filter((F.col("src") % 13 != 0) & (F.col("dst") >= 0))
    t0 = time.monotonic()
    resolved = resolve_redirects(edges, "src", "dst", max_hops=64)
    mx = resolved.agg(F.max("hops")).collect()[0][0]
    out["q100_redirects_s"] = round(time.monotonic() - t0, 1)
    out["q100_chains"] = resolved.count()
    out["q100_max_hops"] = int(mx)

    # ---- q101: trap detection over 4M URLs ----------------------------
    urls = spark.range(n_big).select(
        F.concat(
            F.lit("https://h"),
            F.pmod(F.col("id"), F.lit(1000)).cast("string"),
            F.lit(".example.com/"),
            F.when(
                F.pmod(F.col("id"), F.lit(5)) == 0,
                F.concat(F.lit("session/"), F.col("id").cast("string")),
            ).otherwise(
                F.concat(
                    F.lit("page/p"),
                    F.pmod(F.col("id"), F.lit(40)).cast("string"),
                )
            ),
        ).alias("url")
    )
    for mode, approx in (("exact", False), ("approx", True)):
        t0 = time.monotonic()
        traps = detect_traps(urls, min_distinct=500, approx=approx)
        n_traps = traps.count()
        out[f"q101_traps_{mode}_s"] = round(time.monotonic() - t0, 1)
        out[f"q101_traps_{mode}"] = int(n_traps)
    # id%1000==h pins id%5 to h%5, so exactly the h%5==0 hosts mint
    # session URLs — 200 (host, session/N) templates of 4k distinct
    assert out["q101_traps_exact"] == (n_big // 4000) // 5

    # ---- q105: snapshot diff over two 4M-key snapshots -----------------
    base = spark.range(n_big).select(
        F.col("id").alias("k"), F.md5(F.col("id").cast("string")).alias("sig")
    )
    old = base.filter(F.col("k") % 11 != 0)
    new = (
        base.filter(F.col("k") % 13 != 0)
        .select(
            "k",
            F.when(
                F.col("k") % 7 == 0, F.md5(F.concat(F.lit("x"), F.col("sig")))
            )
            .otherwise(F.col("sig"))
            .alias("sig"),
        )
    )
    t0 = time.monotonic()
    stats = {
        r["status"]: r["n_keys"]
        for r in snapshot_diff_stats(
            snapshot_diff(old, new, "k", "sig")
        ).collect()
    }
    out["q105_diff_s"] = round(time.monotonic() - t0, 1)
    out["q105_changed"] = int(stats.get("changed", 0))
    out["q105_unchanged"] = int(stats.get("unchanged", 0))
    out["q105_new"] = int(stats.get("new", 0))
    out["q105_gone"] = int(stats.get("gone", 0))
    assert sum(stats.values()) > n_big * 0.99

    # ---- q108: HITS over a 4M-edge host graph -------------------------
    hosts = spark.range(n_big // 4).select(F.col("id").alias("node"))
    hedges = (
        spark.range(n_big)
        .select(
            F.pmod(F.col("id") * 48271, F.lit(n_big // 4)).alias("src"),
            F.pmod(F.col("id") * 16807 + 7, F.lit(n_big // 4)).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
    )
    t0 = time.monotonic()
    ranks = hits_micro(hedges, hosts, n_iter=3)
    top = ranks.agg(
        F.max("hub_micro").alias("mh"), F.max("auth_micro").alias("ma")
    ).collect()[0]
    out["q108_hits_s"] = round(time.monotonic() - t0, 1)
    out["q108_nodes"] = hosts.count()
    assert int(top["mh"]) == 1_000_000 and int(top["ma"]) == 1_000_000

    print(json.dumps(out))


if __name__ == "__main__":
    main()
