"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``     brute-force exact top-k against a query vector:
                      F.zip_with dot product + F.aggregate — JVM-side,
                      one pass, one global top-k (no full sort at scale:
                      Spark's TakeOrderedAndProject handles LIMIT+ORDER).
- ``lsh_bucket``      random-hyperplane signature column — the scale
                      path: bucket by signature, probe only matching /
                      neighboring buckets, rerank exactly.
- ``ann_topk_lsh``    bucketed ANN: candidates from the query's bucket
                      (multi-probe over hamming-1 neighbors), exact
                      rerank. Recall < 1 by construction; brute force is
                      the correctness oracle.
- ``embedding_near_dup_pairs``  cosine ≥ τ pair mining with coarse
                      LSH blocking so the join never goes O(n²).

Hyperplanes are generated from a fixed seed driver-side and embedded as
literal arrays — deterministic across runs and cluster sizes.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def _lit_vec(v) -> Column:
    return F.array(*[F.lit(float(x)) for x in v])


def cosine_topk(
    emb: DataFrame, query: list[float], k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine similarity to ``query``."""
    q = _lit_vec(query)
    return (
        emb.select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col).cast("array<double>"), q), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def make_hyperplanes(dim: int, n_planes: int = 16, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_bucket(vec_col: Column, planes: np.ndarray) -> Column:
    """Signature int: bit i = sign(vec · plane_i). Same-bucket vectors are
    cosine-close with probability rising in their angle."""
    sig = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        sig = sig + F.when(_dot(vec_col, _lit_vec(p)) > 0, F.lit(2**i).cast("long")).otherwise(0)
    return sig


def ann_topk_lsh(
    emb: DataFrame, query: list[float], k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
    n_planes: int = 12, seed: int = 42, multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k: filter to the query's LSH bucket (± hamming-1
    probes), then exact rerank. At scale the bucket column is a partition
    key, so the probe is a partition-pruned scan, not a full pass."""
    dim = len(query)
    planes = make_hyperplanes(dim, n_planes, seed)
    qsig = 0
    for i, p in enumerate(planes):
        if float(np.dot(query, p)) > 0:
            qsig |= 1 << i
    probes = [qsig] + ([qsig ^ (1 << i) for i in range(n_planes)] if multiprobe else [])
    v = F.col(vec_col).cast("array<double>")
    bucketed = emb.withColumn("__bucket", lsh_bucket(v, planes))
    cands = bucketed.filter(F.col("__bucket").isin(probes))
    return (
        cands.select(
            F.col(id_col),
            F.round(cosine(v, _lit_vec(query)), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


# -- IVF: k-means coarse quantizer + probed search ----------------------------

def kmeans_centroids(
    emb: DataFrame, k: int = 16, iters: int = 3,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic mini k-means, DataFrame-native: initial centroids are
    the k lowest-id vectors spread by id order; each Lloyd step is one
    assign pass (argmin over broadcast centroid literals) + one
    elementwise-mean aggregation via posexplode. Everything JVM-side; the
    driver only holds k×dim floats."""
    # Deterministic pseudo-random init: the k rows with the smallest
    # xxhash64(id). Always yields exactly min(k, n) centroids (the old
    # monotonically_increasing_id + pmod sampling could under-provision:
    # mii is non-contiguous across partitions), and compiles to
    # TakeOrderedAndProject — a per-partition top-k merge, no global sort.
    init_rows = (
        emb.orderBy(F.xxhash64(F.col(id_col)), F.col(id_col))
        .limit(k)
        .select(vec_col)
        .collect()
    )
    centroids = np.array([[float(x) for x in r[0]] for r in init_rows])
    v = F.col(vec_col).cast("array<double>")
    for _ in range(iters):
        assigned = emb.withColumn("__c", _nearest_centroid(v, centroids))
        means = (
            assigned.select("__c", F.posexplode(v).alias("pos", "x"))
            .groupBy("__c", "pos")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        new = centroids.copy()
        for r in means:
            new[r["__c"]][r["pos"]] = r["m"]
        centroids = new
    return centroids


def _nearest_centroid(v: Column, centroids: np.ndarray) -> Column:
    """argmin_i ||v − c_i||² as pure column algebra: array_min over
    (distance, index) structs."""
    cands = F.array(
        *[
            F.struct(
                F.aggregate(
                    F.zip_with(v, _lit_vec(c), lambda x, y: (x - y) * (x - y)),
                    F.lit(0.0),
                    lambda acc, d: acc + d,
                ).alias("d"),
                F.lit(i).alias("i"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    return F.array_min(cands).getField("i")


def ann_topk_ivf(
    emb: DataFrame, query: list[float], k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
    n_centroids: int = 16, n_probe: int = 4, iters: int = 3,
) -> DataFrame:
    """IVF search: coarse-quantize with k-means, scan only the query's
    ``n_probe`` nearest inverted lists, rerank exactly. At scale the
    cluster id is a partition key (SCALE.md) so probes are partition-
    pruned scans; recall is tuned by n_probe with brute force (cosine_
    topk) as the oracle."""
    centroids = kmeans_centroids(emb, n_centroids, iters, id_col, vec_col)
    q = np.asarray(query, dtype=float)
    order = np.argsort(((centroids - q) ** 2).sum(axis=1))
    probes = [int(i) for i in order[:n_probe]]
    v = F.col(vec_col).cast("array<double>")
    bucketed = emb.withColumn("__c", _nearest_centroid(v, centroids))
    cands = bucketed.filter(F.col("__c").isin(probes))
    return (
        cands.select(
            F.col(id_col),
            F.round(cosine(v, _lit_vec(query)), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def embedding_near_dup_pairs(
    emb: DataFrame, threshold: float = 0.95,
    id_col: str = "vec_id", vec_col: str = "embedding",
    n_planes: int = 8, seed: int = 7,
) -> DataFrame:
    """Pairs (id_a < id_b) with cosine ≥ threshold, blocked by LSH bucket
    so candidate pairs are generated per-bucket instead of n²."""
    sample = emb.select(vec_col).first()
    dim = len(sample[0])
    planes = make_hyperplanes(dim, n_planes, seed)
    v = F.col(vec_col).cast("array<double>")
    b = emb.select(
        F.col(id_col), v.alias("v"), lsh_bucket(v, planes).alias("bucket")
    )
    l, r = b.alias("l"), b.alias("r")
    return (
        l.join(
            r,
            (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.round(cosine(F.col("l.v"), F.col("r.v")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
