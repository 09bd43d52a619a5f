"""Round-8 soak: the optimization round's reshaped operators at 10x
bench scale, plus the two VERDICT-r7 SemDeDup items demonstrated
end-to-end:

  q93  semdedup with PRECOMPUTED labels (labels=km) — the reuse path
       VERDICT item 4 asked for, over the same 20k-vector replica
       corpus soak_r7_ops.py stamps (k=64, tau=0.999); the dropped set
       must equal the self-clustering run's exactly.
  q92  kmeans_micro at k=256 with the broadcast centroid-array
       assignment (max_literal_cells=0) — the plan-size regime the
       literal expression could not reach (VERDICT item 3 /
       "What's wrong" #2).

Run:  python scripts/soak_r8_ops.py     (one JSON line; paste to BENCH.md)
Env:  SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
      SPARK_GRAFT_SOAK_REPLICAS (default 10).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from outage_data_scraper_spark.operators.cluster import kmeans_micro, semdedup


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    replicas = int(os.environ.get("SPARK_GRAFT_SOAK_REPLICAS", "10"))
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("soak-r8-ops")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"sf": "sf0.1 x %d replicas" % replicas}

    # identical replica corpus to soak_r7_ops.py's q92/q93 block
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    rep = spark.range(replicas).withColumnRenamed("id", "rep")
    vecs = (
        emb.crossJoin(F.broadcast(rep))
        .select(
            (F.col("vec_id") * replicas + F.col("rep")).alias("vec_id"),
            F.transform(
                F.col("embedding").cast("array<double>"),
                lambda x, i: x
                * (
                    F.lit(1.0)
                    + (i % F.lit(2)).cast("double")
                    * F.col("rep").cast("double")
                    * F.lit(0.0005)
                ),
            ).alias("embedding"),
        )
        .localCheckpoint(eager=True)
    )
    n_vecs = vecs.count()
    out["n_vectors"] = int(n_vecs)

    t0 = time.monotonic()
    km = kmeans_micro(vecs, k=64, n_iter=2).localCheckpoint(eager=True)
    km.count()
    out["kmeans_k64_s"] = round(time.monotonic() - t0, 1)

    # the reuse path: cluster once, dedup from the labels
    t0 = time.monotonic()
    sd = semdedup(vecs, k=64, n_iter=2, tau=0.999, labels=km)
    srow = sd.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((~F.col("keep")).cast("long")).alias("dropped"),
    ).collect()[0]
    out["semdedup_label_reuse_s"] = round(time.monotonic() - t0, 1)
    out["semdedup_dropped"] = int(srow["dropped"])
    assert int(srow["n"]) == n_vecs
    # must match soak_r7_ops.py's self-clustering run bit-for-bit
    assert int(srow["dropped"]) == 17950, srow

    # k=256 with the broadcast centroid-array assignment (16,384 cells
    # — 4x past the literal threshold)
    t0 = time.monotonic()
    km256 = kmeans_micro(vecs, k=256, n_iter=2, max_literal_cells=0)
    n256 = km256.count()
    out["kmeans_k256_table_s"] = round(time.monotonic() - t0, 1)
    assert n256 == n_vecs

    print(json.dumps(out))


if __name__ == "__main__":
    main()
