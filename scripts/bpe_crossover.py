"""BPE trainer crossover: distributed merge loop vs collected-vocab
fast path at >=1k merges (VERDICT r5 item 4).

The distributed loop (operators/bpe.py:train_bpe) pays one Spark job +
one driver collect + one localCheckpoint PER MERGE ROUND; the collected
path (train_bpe_collected) pays the identical single corpus shuffle,
then runs the merge loop driver-side over the vocab-sized (word, freq)
table. Both produce the byte-identical merge table (pytest parity);
this script measures the wall-clock gap on the sf0.01 documents corpus
and prints one JSON line for BENCH.md.

Run:  python scripts/bpe_crossover.py [n_merges] [n_dist_merges]
      (defaults 1000 and 60 — the distributed loop's per-round cost is
      flat, so its 1k-merge wall is extrapolated from a 60-round run
      and reported alongside the measured rounds)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from outage_data_scraper_spark.operators import bpe


def main() -> None:
    n_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    n_dist = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("bpe-crossover")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.count()  # warm the scan

    t0 = time.monotonic()
    fast = bpe.train_bpe_collected(docs, n_merges)
    fast_rows = [tuple(r) for r in fast.orderBy("step").collect()]
    fast_s = time.monotonic() - t0

    t0 = time.monotonic()
    dist = bpe.train_bpe(docs, n_dist)
    dist_rows = [tuple(r) for r in dist.orderBy("step").collect()]
    dist_s = time.monotonic() - t0

    assert dist_rows == fast_rows[:n_dist], "distributed/collected diverged"
    per_round = dist_s / max(1, len(dist_rows))
    out = {
        "corpus": sf_dir,
        "n_merges_collected": len(fast_rows),
        "collected_s": round(fast_s, 1),
        "n_merges_distributed": len(dist_rows),
        "distributed_s": round(dist_s, 1),
        "distributed_per_round_s": round(per_round, 3),
        "distributed_extrapolated_s_at_n": round(per_round * n_merges, 1),
        "speedup_at_n": round(per_round * n_merges / max(fast_s, 1e-9), 1),
        "parity_prefix_ok": True,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
