"""Round-6 soak: the new operators at sf1 (10x bench scale).

Same deterministic 50k-doc corpus as scripts/soak_sf1_corpus.py
(sf0.1 x 10 replica perturbation — reuses build_corpus), timing the
round-6 operators at their gated operating points plus a 1M-sample
FLAC decode-rate probe:

  q81  cms_table + cms_estimate over corpus tokens (d=4, w=2048) —
       the one-shuffle sketch + broadcast probe at ~10M tokens
  q82  exact_order_stats of n_chars at 5 ranks (B=1024) — two bounded
       passes, second pass ≈ n/B rows
  q83  plan_shards(8 MiB shards, chunk=4096) + manifest — the
       two-level prefix sum at 50k docs
  q63-companion: hash-keyed q63 rerun rides soak_r5_ops; not repeated
  flac decode: 64 x ~0.2 s clips through decode_flac via mapInPandas —
       the Arrow-batched audio decode rate the multimodal column pays

Run:  python scripts/soak_r6_ops.py    (one JSON line; paste to BENCH.md)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from outage_data_scraper_spark.functions import textkit
from outage_data_scraper_spark.operators import sketch
from outage_data_scraper_spark.operators.quantiles import exact_order_stats
from outage_data_scraper_spark.operators.shards import plan_shards, shard_manifest
from soak_sf1_corpus import build_corpus  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    replicas = int(os.environ.get("SPARK_GRAFT_SOAK_REPLICAS", "10"))
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("soak-r6-ops")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {"sf": "sf0.1 x %d replicas" % replicas}
    big, _ = build_corpus(spark, sf_dir, replicas)
    tmp = "/tmp/soak_r6_docs_%d.parquet" % os.getpid()
    big.repartition(64).write.mode("overwrite").parquet(tmp)
    docs = spark.read.parquet(tmp)
    out["n_docs"] = docs.count()

    # q81: CMS over corpus tokens
    t0 = time.monotonic()
    toks = docs.filter(F.length(F.trim("text")) > 0).select(
        F.explode(textkit.tokens(textkit.normalized(F.col("text")))).alias("term")
    )
    table = sketch.cms_table(toks, "term")
    cand = toks.groupBy("term").agg(F.count(F.lit(1)).alias("exact"))
    est = sketch.cms_estimate(table, cand.select("term"), "term")
    row = (
        est.join(cand, "term")
        .agg(
            F.count("*").alias("terms"),
            F.sum((F.col("est_cnt") >= F.col("exact")).cast("int")).alias("ub_ok"),
        )
        .collect()[0]
    )
    assert row["ub_ok"] == row["terms"], "CMS upper bound violated"
    out["q81_cms_s"] = round(time.monotonic() - t0, 1)
    out["q81_terms"] = int(row["terms"])

    # q82: exact order stats
    t0 = time.monotonic()
    n = docs.count()
    ranks = sorted({1, n // 4, n // 2, (3 * n) // 4, n})
    got = exact_order_stats(
        docs, "n_chars", ranks, n_buckets=1024, tiebreak_col="doc_id"
    ).collect()
    assert len(got) == len(ranks)
    out["q82_quantiles_s"] = round(time.monotonic() - t0, 1)
    out["q82_median_n_chars"] = int(
        {r.rank: r.value for r in got}[sorted(ranks)[len(ranks) // 2]]
    )

    # q83: shard plan + manifest
    t0 = time.monotonic()
    man = shard_manifest(
        plan_shards(docs, "n_chars", "doc_id", shard_bytes=8 << 20, chunk=4096),
        "doc_id",
    )
    mrow = man.agg(
        F.count("*").alias("shards"), F.max("bytes").alias("max_bytes")
    ).collect()[0]
    out["q83_shards_s"] = round(time.monotonic() - t0, 1)
    out["q83_n_shards"] = int(mrow["shards"])
    assert mrow["max_bytes"] <= (8 << 20) + docs.agg(F.max("n_chars")).collect()[0][0]

    # FLAC decode rate: 64 clips x replicas, Arrow-batched
    import numpy as np
    import pandas as pd

    from outage_data_scraper_spark.operators.flac import decode_flac, encode_flac

    clips = []
    for i in range(64):
        rng = np.random.default_rng(i)
        t = np.arange(1600) / 8000.0
        w = (np.clip(0.6 * np.sin(2 * np.pi * (200 + i * 31) * t)
                     + 0.1 * rng.standard_normal(1600), -1, 1) * 32767)
        clips.append(encode_flac(w.astype(np.int32), 8000, block_size=512,
                                 use_lpc=bool(i % 2)))
    payloads = spark.createDataFrame(
        [(i, clips[i % 64]) for i in range(64 * replicas * 4)],
        "i long, payload binary",
    ).repartition(32)

    def dec(batches):
        for b in batches:
            ns = []
            for p in b["payload"]:
                samples, _, _ = decode_flac(bytes(p))
                ns.append(len(samples))
            yield pd.DataFrame({"n": ns})

    t0 = time.monotonic()
    total = payloads.mapInPandas(dec, "n long").agg(F.sum("n")).collect()[0][0]
    wall = time.monotonic() - t0
    out["flac_clips"] = 64 * replicas * 4
    out["flac_decode_s"] = round(wall, 1)
    out["flac_samples_per_s"] = int(total / wall)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
