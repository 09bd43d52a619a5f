"""Round-7 soak: winnowing + overlap + ExactSubstr removal at sf1
(10x bench scale) — the operators VERDICT r6 items 1/6/7 added or
flagged as lacking an sf1 number.

Same deterministic 50k-doc corpus as scripts/soak_sf1_corpus.py
(sf0.1 x 10 replica perturbation — reuses build_corpus). The replica
structure makes this the overlap stress case the verdict asked for:
every 8th token of replica r>0 is rewritten, so shingles clear of the
perturbation positions are shared across ALL replicas of a source doc
— fingerprint df ~ replica count, candidate pairs ~ C(replicas,2) per
shared fp, dense but bounded by the max_df cutoff.

  q85  winnow_fingerprints (k=4, w=4): the zero-shuffle Arrow pass at
       50k docs; reports fingerprint rows and selection density
  q86  fingerprint_overlap (min_shared=2, max_df=50): the df-capped
       self-join on the replica-dense corpus; reports pair count and
       wall (sub-linear in candidate pairs = the pass criterion)
  q89  + connected_components over the q86 pairs (the MOSS-style
       cluster step): rounds are short-diameter, per-round
       localCheckpoint
  q87  remove_duplicated_spans (w=8, min_count=2): q63's span pass +
       the complement-slice reassembly; reports wall and removed
       fraction

Run:  python scripts/soak_r7_ops.py    (one JSON line; paste to BENCH.md)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from outage_data_scraper_spark.operators.dedup import (
    connected_components,
    remove_duplicated_spans,
)
from outage_data_scraper_spark.operators.fingerprint import (
    fingerprint_overlap,
    winnow_fingerprints,
)
from soak_sf1_corpus import build_corpus  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    replicas = int(os.environ.get("SPARK_GRAFT_SOAK_REPLICAS", "10"))
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("soak-r7-ops")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {"sf": "sf0.1 x %d replicas" % replicas}
    big, _ = build_corpus(spark, sf_dir, replicas)
    tmp = "/tmp/soak_r7_docs_%d.parquet" % os.getpid()
    big.repartition(64).write.mode("overwrite").parquet(tmp)
    docs = spark.read.parquet(tmp)
    n_docs = docs.count()
    out["n_docs"] = n_docs

    # q85: zero-shuffle fingerprint pass
    t0 = time.monotonic()
    fps = winnow_fingerprints(docs, k=4, w=4)
    n_fps = fps.count()
    out["q85_winnow_s"] = round(time.monotonic() - t0, 1)
    out["q85_fingerprints"] = int(n_fps)
    # selection density sanity: ~2/(w+1) of shingles, never more than all
    n_shingles = (
        docs.select(
            F.greatest(
                F.size(F.split(F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))), " ")) - 3,
                F.lit(0),
            ).alias("n")
        )
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    out["q85_density"] = round(n_fps / max(n_shingles, 1), 4)

    # q86: df-capped overlap self-join on the replica-dense corpus
    t0 = time.monotonic()
    pairs = fingerprint_overlap(
        docs, k=4, w=4, min_shared=2, max_df=50
    ).localCheckpoint(eager=True)
    n_pairs = pairs.count()
    out["q86_overlap_s"] = round(time.monotonic() - t0, 1)
    out["q86_pairs"] = int(n_pairs)
    assert n_pairs > 0, "replica corpus must produce overlap pairs"

    # q89: clusters over the q86 pairs
    t0 = time.monotonic()
    comp = connected_components(pairs.select("id_a", "id_b"))
    n_clustered = comp.count()
    n_clusters = comp.select("label").distinct().count()
    out["q89_cc_s"] = round(time.monotonic() - t0, 1)
    out["q89_clustered_docs"] = int(n_clustered)
    out["q89_clusters"] = int(n_clusters)

    # q87: ExactSubstr removal
    t0 = time.monotonic()
    rem = remove_duplicated_spans(docs, window_tokens=8, min_count=2)
    row = rem.agg(
        F.sum("orig_tokens").alias("orig"),
        F.sum("removed_tokens").alias("cut"),
    ).collect()[0]
    out["q87_remove_s"] = round(time.monotonic() - t0, 1)
    out["q87_removed_frac"] = round(int(row["cut"]) / int(row["orig"]), 4)

    # q96: NB classifier over the replica corpus (gopher-rule labels)
    from outage_data_scraper_spark.functions import textkit
    from outage_data_scraper_spark.operators.classifier import nb_quality_scores

    t0 = time.monotonic()
    toked = docs.withColumn("__gtoks", textkit.tokens(F.col("text")))
    label = textkit.gopher_keep(F.col("text"), F.col("__gtoks"))
    nb = nb_quality_scores(toked, label)
    nrow = nb.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("predicted_keep").cast("long")).alias("kept"),
    ).collect()[0]
    out["q96_nb_s"] = round(time.monotonic() - t0, 1)
    out["q96_predicted_keep_frac"] = round(int(nrow["kept"]) / int(nrow["n"]), 4)

    # q92/q93: integer k-means + SemDeDup over a 50k-vector replica
    # corpus (5k sf0.1 embeddings x 10 near-identical twins)
    from outage_data_scraper_spark.operators.cluster import kmeans_micro, semdedup

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
    t0 = time.monotonic()
    km = kmeans_micro(vecs, k=64, n_iter=2)
    n_lab = km.count()
    out["q92_kmeans_s"] = round(time.monotonic() - t0, 1)
    out["q92_vectors"] = int(n_lab)
    assert n_lab == n_vecs
    t0 = time.monotonic()
    sd = semdedup(vecs, k=64, n_iter=2, tau=0.999)
    srow = sd.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((~F.col("keep")).cast("long")).alias("dropped"),
    ).collect()[0]
    out["q93_semdedup_s"] = round(time.monotonic() - t0, 1)
    out["q93_dropped"] = int(srow["dropped"])
    # replicas are near-identical: most non-canonical twins must drop
    assert int(srow["dropped"]) > n_vecs // 2, srow

    print(json.dumps(out))


if __name__ == "__main__":
    main()
