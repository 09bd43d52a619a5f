"""Round-5 soak: the new corpus operators at sf1 (10x bench scale).

Same deterministic 50k-doc corpus as scripts/soak_sf1_corpus.py
(sf0.1 x 10 replica perturbation — reuses build_corpus), timing the
round-5 operators at their gated operating points:

  q63  duplicated_substring_spans(window=8, min_count=2) — ExactSubstr
       sliding windows; the replica structure makes shifted copies
       common, exactly what this op exists to catch
  q20  minhash_lsh_candidates (xxhash64 mode) — the signature FOLD
       rewrite's headline case (the old per-permutation form measured
       344 s on this corpus; the fold is the shipped path)
  q68  train_bpe(30 merges) — vocabulary here is ~400 words (40 base +
       replica-perturbed tags), so the merge loop demonstrates the
       O(vocab)-per-round shape with a corpus 100x the vocab
  q70  build_inverted_index(min_df=2)
  q71  bm25_topk({spark, window, join})

Run:  python scripts/soak_r5_ops.py    (one JSON line; paste to BENCH.md)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from outage_data_scraper_spark.operators import bpe, dedup, index
from soak_sf1_corpus import build_corpus  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    replicas = int(os.environ.get("SPARK_GRAFT_SOAK_REPLICAS", "10"))
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("soak-r5-ops")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {"sf": "sf0.1 x %d replicas" % replicas}
    big, n_src = build_corpus(spark, sf_dir, replicas)
    tmp = "/tmp/soak_r5_docs_%d.parquet" % os.getpid()
    big.repartition(64).write.mode("overwrite").parquet(tmp)
    docs = spark.read.parquet(tmp)
    out["n_docs"] = docs.count()

    t0 = time.monotonic()
    spans = dedup.duplicated_substring_spans(docs, window_tokens=8, min_count=2)
    agg = spans.agg(
        F.count("*").alias("rows"), F.sum("n_dup_spans").alias("dup_spans")
    ).collect()[0]
    out["q63_s"] = round(time.monotonic() - t0, 1)
    out["q63_rows"], out["q63_dup_spans"] = agg["rows"], int(agg["dup_spans"])

    t0 = time.monotonic()
    cands = dedup.minhash_lsh_candidates(docs)
    out["q20_pairs"] = cands.count()
    out["q20_s"] = round(time.monotonic() - t0, 1)

    t0 = time.monotonic()
    merges = bpe.train_bpe(docs, 30)
    out["q68_merges"] = merges.count()
    out["q68_s"] = round(time.monotonic() - t0, 1)

    t0 = time.monotonic()
    inv = index.build_inverted_index(docs, min_df=2)
    agg = inv.agg(
        F.count("*").alias("terms"), F.sum("total_tf").alias("tf")
    ).collect()[0]
    out["q70_s"] = round(time.monotonic() - t0, 1)
    out["q70_terms"], out["q70_total_tf"] = agg["terms"], int(agg["tf"])

    t0 = time.monotonic()
    top = index.bm25_topk(docs, ["spark", "window", "join"], top_k=20).collect()
    out["q71_s"] = round(time.monotonic() - t0, 1)
    out["q71_rows"] = len(top)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
