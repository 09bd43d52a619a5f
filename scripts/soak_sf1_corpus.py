"""Directive-5 soak: the q49/q47/q51 corpus stages at sf1 (10x the
sf0.1 bench scale), timed end-to-end on local[32].

No sf1 parquet exists in /root/testdata, so the corpus is synthesised
DETERMINISTICALLY from sf0.1 documents: each of the 5,000 source docs
is expanded into 10 replicas — replica 0 is the original, replicas 1–9
perturb every 8th token with a replica-salted md5 tag. That preserves
(and stresses) the duplicate structure a 10x web crawl actually has:
each source doc becomes an 11-ish-member near-dup clique (shared
shingles across replicas), span-level boilerplate crosses the df_min
threshold 10x more often, and the pair-mining stage sees the quadratic
within-cluster growth that dominates real dedup runs.

Stages timed (same operating points as the gated queries):
  q49  span_dedup(span_tokens=4, df_min=5)
  q47  ngram_jaccard_pairs(k=3, j>=0.12) -> connected_components_star
       (the 10^10-edge large-star/small-star path, not the O(diameter)
       propagation — this run is exactly the regime it exists for)
  q51  gopher filter -> span dedup -> exact dedup -> hash split

Run:  python scripts/soak_sf1_corpus.py            (defaults below)
Env:  SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
      SPARK_GRAFT_SOAK_REPLICAS (default 10).
Prints one JSON line; paste the numbers into BENCH.md.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from outage_data_scraper_spark.functions import textkit
from outage_data_scraper_spark.operators import dedup
from outage_data_scraper_spark.operators.sampling import split_column


def build_corpus(spark, sf_dir: str, replicas: int):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_src = docs.count()
    rep = spark.range(replicas).withColumnRenamed("id", "rep")
    # doc_id stays unique and deterministic: source id * replicas + rep.
    toks = F.split(F.col("text"), " ")
    perturbed = F.array_join(
        F.zip_with(
            toks,
            F.sequence(F.lit(0), F.size(toks) - F.lit(1)),
            lambda t, i: F.when(
                (F.col("rep") > 0) & (i % 8 == F.col("rep") % 8),
                F.concat(
                    F.lit("r"),
                    F.col("rep").cast("string"),
                    F.lit("_"),
                    F.substring(F.md5(t), 1, 6),
                ),
            ).otherwise(t),
        ),
        " ",
    )
    big = (
        docs.crossJoin(F.broadcast(rep))
        .select(
            (F.col("doc_id") * replicas + F.col("rep")).alias("doc_id"),
            perturbed.alias("text"),
            "lang",
            "source",
        )
        .withColumn("n_chars", F.length("text"))
    )
    return big, n_src


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    replicas = int(os.environ.get("SPARK_GRAFT_SOAK_REPLICAS", "10"))
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("soak-sf1-corpus")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {"sf": "sf0.1 x %d replicas" % replicas}
    t0 = time.monotonic()
    big, n_src = build_corpus(spark, sf_dir, replicas)
    # Materialize once so stage timings measure the stage, not the
    # generator; parquet round-trip mirrors how the bench reads inputs.
    tmp = "/tmp/soak_sf1_docs_%d.parquet" % os.getpid()
    big.repartition(64).write.mode("overwrite").parquet(tmp)
    docs = spark.read.parquet(tmp)
    n_docs = docs.count()
    out["n_docs"] = n_docs
    out["gen_s"] = round(time.monotonic() - t0, 1)
    assert n_docs == n_src * replicas, (n_docs, n_src, replicas)

    # q49 operating point -------------------------------------------------
    t0 = time.monotonic()
    sd = dedup.span_dedup(docs, span_tokens=4, df_min=5)
    agg = sd.agg(
        F.count("*").alias("rows"),
        F.sum("n_removed").alias("removed"),
        F.sum("n_spans").alias("spans"),
    ).collect()[0]
    out["q49_s"] = round(time.monotonic() - t0, 1)
    out["q49_rows"] = agg["rows"]
    out["q49_spans"] = int(agg["spans"])
    out["q49_removed"] = int(agg["removed"])
    assert agg["rows"] == n_docs

    # q47 operating point, scale path -------------------------------------
    t0 = time.monotonic()
    pairs = dedup.ngram_jaccard_pairs(docs, k_shingle=3, min_jaccard=0.12)
    pairs = pairs.localCheckpoint()
    n_pairs = pairs.count()
    comp = dedup.connected_components_star(pairs)
    n_comp = comp.select("label").distinct().count()
    n_nodes = comp.count()
    out["q47_s"] = round(time.monotonic() - t0, 1)
    out["q47_pairs"] = n_pairs
    out["q47_nodes"] = n_nodes
    out["q47_components"] = n_comp
    # Every replica clique must have collapsed: far fewer components
    # than nodes, and no component larger than the corpus.
    assert 0 < n_comp < n_nodes

    # q51 composition ------------------------------------------------------
    t0 = time.monotonic()
    toked = docs.select("doc_id", "text", textkit.tokens(F.col("text")).alias("toks"))
    kept = toked.filter(textkit.gopher_keep(F.col("text"), F.col("toks"))).select(
        "doc_id", "text"
    )
    cleaned = dedup.span_dedup(kept, span_tokens=4, df_min=5).select(
        "doc_id", F.md5("clean_text").alias("clean_sig")
    )
    canon = cleaned.groupBy("clean_sig").agg(F.min("doc_id").alias("canonical_id"))
    surv = cleaned.join(canon, "clean_sig").filter(
        F.col("doc_id") == F.col("canonical_id")
    )
    final = surv.select(
        "doc_id", split_column(F.col("doc_id")).alias("split"), "clean_sig"
    )
    splits = {r["split"]: r["n"] for r in final.groupBy("split").agg(F.count("*").alias("n")).collect()}
    out["q51_s"] = round(time.monotonic() - t0, 1)
    out["q51_survivors"] = sum(splits.values())
    out["q51_splits"] = splits
    assert 0 < out["q51_survivors"] <= n_docs

    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
