"""Integer-exact distributed k-means + SemDeDup semantic dedup.

Two pieces a 100 TB training-data pipeline needs that the fingerprint
family (exact/MinHash/SimHash/winnowing) cannot provide: EMBEDDING-
space clustering, and the cluster-pruned semantic near-dup removal
built on it (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication" — cluster first so the
quadratic pair search runs within clusters only). The reference repo
has no analog; this extends the training-data-pipeline surface.

Cross-engine exactness (the part that makes k-means VALUE-GATABLE,
which float Lloyd iterations are not): all clustering arithmetic is
integer — the ``pagerank_micro`` trick applied to geometry.

- quantize: q[i] = floor(x[i] * 1e6) + OFFSET. floor is the one
  rounding both engines define identically (CLAUDE.md: DuckDB
  ``round`` vs Spark ``round`` HALF_UP agree, but ``floor`` needs no
  agreement argument at all); the double product x * 1e6 is IEEE-
  identical in both engines. OFFSET = 2e6 shifts every coordinate
  positive so centroid updates divide NON-NEGATIVE sums — Spark
  ``DIV`` truncates toward zero while DuckDB ``//`` floors, and the
  two only agree on non-negative operands (the r6 q82/q83 pairing was
  validated there). Offsets cancel in every distance difference.
- assignment: argmin over centroids of the integer squared L2
  distance, ties to the LOWEST centroid id — one array_min over an
  array<struct<dist, cid>> (lexicographic struct order IS the tie
  law). |q| ≤ 4e6 ⇒ dist ≤ 64 · 1.6e13 ≈ 1e15 ≪ 2^63: no overflow.
- update: centroid[i] = sum(q[i]) DIV count — integer, order-free.
- init: the k smallest ids' quantized vectors (deterministic), empty
  clusters keep their previous centroid.

Scale shape: assignment is a PURE PROJECTION — centroids are a
driver-held k×dim literal baked into the plan (k·dim ≈ 512 longs), so
the corpus never joins or shuffles to find its cluster; the update is
ONE map-side-combined shuffle keyed (cid, dim) whose reduced size is
k×dim cells; the only driver traffic per iteration is those cells
(the similarity.py IVF-centroid scale class). n_iter is small and
fixed (Lloyd for partitioning, not convergence — SemDeDup §3 uses
exactly this regime). SemDeDup's pair join is cluster-blocked: the
quadratic term is bounded by the largest cluster, the same
bucket-bounding law as the LSH/banding dedups (plan test forbids
cartesians).

DuckDB oracle: the same rounds unrolled as chained CTEs (the q58
PageRank-oracle pattern), assembled by ``kmeans_oracle_sql`` so both
engines interpolate one law.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: scale for micro-quantization and the positivity offset (|x| must be
#: < OFFSET / SCALE = 2.0 — asserted at quantize time)
SCALE = 1_000_000
OFFSET = 2_000_000


def quantize_micro(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(vec_id, q) with q[i] = floor(x[i]·1e6) + OFFSET (long). Raises
    at action time if any |x| ≥ 2 (offset would go negative and the
    DIV/`//` agreement argument breaks)."""
    v = F.col(vec_col).cast("array<double>")
    q = F.transform(
        v, lambda x: F.floor(x * F.lit(1000000.0)).cast("long") + F.lit(OFFSET)
    )
    out = emb.select(F.col(id_col).alias("vec_id"), q.alias("q"))
    return out.withColumn(
        "q",
        F.when(
            F.exists(F.col("q"), lambda c: (c < 0) | (c >= 2 * OFFSET)),
            F.raise_error(F.lit("quantize_micro: |x| >= 2 out of range")),
        ).otherwise(F.col("q")),
    )


def _dist_expr(centroid: list[int], q_col: str):
    """Integer squared L2 distance from q_col to a literal centroid."""
    lit_c = F.array(*[F.lit(int(v)) for v in centroid])
    return F.aggregate(
        F.zip_with(F.col(q_col), lit_c, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


#: above this many k×dim centroid CELLS the assignment switches from the
#: baked literal expression to the vectorized integer numpy kernel: the
#: literal's plan grows O(k·dim) and Catalyst compile/analysis time with
#: it (the r7 VERDICT scale-shape finding — at k=64·d=64 the 4096-term
#: expression already dominated the q92 soak wall; SemDeDup at
#: production scale needs k in the thousands). 1024 keeps the benched
#: k=8·d=64 config on codegen (A/B dead even there: 0.358 vs 0.372 s)
#: while k=64·d=64 — where the kernel is 7× faster at the 20k-vector
#: soak (24.9 → 3.5 s, labels identical) — switches over.
LITERAL_ASSIGNMENT_MAX_CELLS = 1024


def _assign(qdf: DataFrame, cent: dict[int, list[int]], max_literal_cells: int):
    """argmin assignment under the integer law — literal-expression
    form below the plan-size threshold, vectorized integer numpy
    kernel above it (identical values: all-int64 arithmetic, same
    distances, and argmin's first-minimum tie rule ≡ the array_min
    (dist, cid) struct law)."""
    k = len(cent)
    dim = len(cent[0])
    if k * dim <= max_literal_cells:
        dists = F.array(
            *[
                F.struct(
                    _dist_expr(cent[i], "q").alias("d"),
                    F.lit(i).alias("cid"),
                )
                for i in range(k)
            ]
        )
        return qdf.withColumn("best", F.array_min(dists)).select(
            "vec_id", F.col("best.cid").alias("cluster"), "q"
        )
    # kernel path: centroids ride the task closure as a k×dim int64
    # matrix and the argmin runs as one vectorized integer pass per
    # Arrow batch (mapInPandas) — the plan stays O(1) in k·dim and the
    # per-row cost drops from interpreted HOF evaluation to C loops.
    # EXACTNESS IS TRIVIAL here, unlike the semdedup cosine kernel:
    # every quantity is int64 — dist = |q|² − 2·q·c + |c|² with
    # |q|,|c| ≤ 4e6 and dim ≤ 64 bounds every term by ~4e15 ≪ 2^63, so
    # numpy and the JVM compute the identical integers, and
    # np.argmin's first-minimum tie rule IS the array_min
    # (dist, cid)-struct law because rows are ordered by cid.
    import numpy as np
    import pandas as pd

    C = np.array([cent[i] for i in range(k)], dtype=np.int64)
    c2 = (C * C).sum(axis=1)

    def fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            Q = np.array(pdf["q"].tolist(), dtype=np.int64)
            q2 = (Q * Q).sum(axis=1)
            D = q2[:, None] - 2 * (Q @ C.T) + c2[None, :]
            best = np.argmin(D, axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "cluster": best.astype(np.int32),
                    "q": pdf["q"],
                }
            )

    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            qdf.schema["vec_id"],
            T.StructField("cluster", T.IntegerType()),
            qdf.schema["q"],
        ]
    )
    return qdf.select("vec_id", "q").mapInPandas(fn, out_schema)


def kmeans_micro(
    emb: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_literal_cells: int = LITERAL_ASSIGNMENT_MAX_CELLS,
) -> DataFrame:
    """Integer-micro Lloyd k-means: (vec_id, cluster) after ``n_iter``
    assignment rounds (assignment round r uses the centroids updated
    from round r-1's assignment; the returned labels are round
    n_iter's). Deterministic and bit-identical cross-engine — see the
    module docstring for the law. Assignment is a literal-centroid
    projection up to ``max_literal_cells`` k×dim cells and a broadcast
    centroid-array join past it (_assign — value-identical, parity
    test in tests/test_cluster.py)."""
    if k < 1 or n_iter < 1:
        raise ValueError("k and n_iter must be >= 1")
    qdf = quantize_micro(emb, id_col, vec_col).localCheckpoint(eager=True)
    init = qdf.orderBy("vec_id").limit(k).collect()
    if len(init) < k:
        raise ValueError(f"k={k} exceeds the {len(init)}-vector corpus")
    cent: dict[int, list[int]] = {
        i: list(r["q"]) for i, r in enumerate(sorted(init, key=lambda r: r["vec_id"]))
    }
    assigned = None
    for _ in range(n_iter):
        assigned = _assign(qdf, cent, max_literal_cells)
        # update: ONE map-side-combined shuffle, k×dim reduced cells
        cells = (
            assigned.select("cluster", F.posexplode("q").alias("i", "v"))
            .groupBy("cluster", "i")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
            .withColumn("nv", F.expr("s DIV n"))
            .collect()
        )
        new_cent = dict(cent)  # empty clusters keep previous centroid
        by_cid: dict[int, dict[int, int]] = {}
        for r in cells:
            by_cid.setdefault(int(r["cluster"]), {})[int(r["i"])] = int(r["nv"])
        for cid, dims in by_cid.items():
            new_cent[cid] = [dims[i] for i in range(len(cent[cid]))]
        cent = new_cent
    return assigned.select("vec_id", "cluster")


def kmeans_oracle_sql(
    k: int = 8,
    n_iter: int = 2,
    source: str = "embeddings",
    vec_expr: str = "embedding::DOUBLE[]",
) -> str:
    """The identical k-means law as DuckDB SQL, rounds unrolled as
    chained CTEs (q58-oracle pattern): quantize with the same
    floor/offset, assign via ROW_NUMBER over (dist, cid), update with
    non-negative `//` division, empty clusters inherit via left-join
    coalesce. Returns a full SELECT yielding (vec_id, cluster)."""
    parts = [
        f"""v AS (
          SELECT vec_id,
                 [CAST(floor(x * 1000000) AS BIGINT) + {OFFSET}
                  for x in {vec_expr}] AS q
          FROM {source}
        ),
        c0 AS (
          SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, q AS c
          FROM v QUALIFY row_number() OVER (ORDER BY vec_id) <= {k}
        )"""
    ]
    for r in range(1, n_iter + 1):
        parts.append(f"""a{r} AS (
          SELECT vec_id, cid, q FROM (
            SELECT v2.vec_id, c.cid, v2.q,
                   row_number() OVER (
                     PARTITION BY v2.vec_id
                     ORDER BY list_sum([(v2.q[i] - c.c[i]) * (v2.q[i] - c.c[i])
                                        for i in generate_series(1, len(v2.q))]),
                              c.cid
                   ) AS rn
            FROM v v2 CROSS JOIN c{r - 1} c
          ) WHERE rn = 1
        )""")
        if r < n_iter:
            parts.append(f"""c{r} AS (
          SELECT p.cid, coalesce(u.c, p.c) AS c
          FROM c{r - 1} p LEFT JOIN (
            SELECT cid, list(val ORDER BY i) AS c FROM (
              SELECT a.cid AS cid, g.i AS i,
                     sum(a.q[g.i]) // count(*) AS val
              FROM a{r} a, (SELECT unnest(generate_series(1,
                     (SELECT len(q) FROM v LIMIT 1))) AS i) g
              GROUP BY 1, 2
            ) GROUP BY cid
          ) u USING (cid)
        )""")
    return (
        "WITH "
        + ",\n        ".join(parts)
        + f"\n        SELECT vec_id, cid AS cluster FROM a{n_iter}"
    )


def _semdedup_dropped_fn(tau: float):
    """Per-cluster pair search as a grouped-pandas kernel: gram matrix
    via BLAS for the bulk decision, with bit-exact parity to the JVM
    expression ``round(dot/(norm_a*norm_b), 4) >= tau`` guaranteed by
    (a) norms accumulated in the SAME left-fold dim order as
    F.aggregate, and (b) any pair whose BLAS cosine lands within 1e-6
    of the rounding cut being RE-DERIVED with a sequential Python fold
    (IEEE ops are deterministic, so the fold is bit-identical to the
    JVM's) and Java's exact BigDecimal.valueOf/HALF_UP rounding via
    decimal (repr(float) is the same shortest-roundtrip string
    BigDecimal.valueOf uses). BLAS error for d dims is ~d·eps ≈ 1e-14
    per entry — five orders inside the band, so no decision outside
    the band can differ from the JVM's. NaN/±Inf cosines follow
    Spark's comparison order (NaN greatest)."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np
    import pandas as pd

    # the HALF_UP cut: round(x, 4) >= tau flips within ±~5e-5 of tau;
    # outside [cut_lo, cut_hi] the decision is band-free
    cut_lo = tau - 5e-5 - 1e-6
    cut_hi = tau - 5e-5 + 1e-6

    def exact_pred(a: np.ndarray, b: np.ndarray) -> bool:
        dot = 0.0
        na = 0.0
        nb = 0.0
        for x, y in zip(a.tolist(), b.tolist()):
            dot += x * y
            na += x * x
            nb += y * y
        c = dot / (math.sqrt(na) * math.sqrt(nb))
        if math.isnan(c):
            return True  # Spark: NaN compares greater than any value
        if math.isinf(c):
            return c > 0
        r = float(
            Decimal(repr(c)).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP)
        )
        return r >= tau

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id")
        ids = pdf["vec_id"].to_numpy()
        M = np.array(pdf["v"].tolist(), dtype=np.float64)
        n = M.shape[0]
        if n < 2:
            return pd.DataFrame({"vec_id": np.array([], dtype=np.int64)})
        # norms in F.aggregate's left-fold dim order (bit-exact)
        acc = np.zeros(n)
        for j in range(M.shape[1]):
            acc = acc + M[:, j] * M[:, j]
        norms = np.sqrt(acc)
        dropped = np.zeros(n, dtype=bool)
        blk = max(1, min(n, 64 * 1024 * 1024 // (8 * max(n, 1))))
        with np.errstate(invalid="ignore", divide="ignore"):
            for c0 in range(0, n, blk):
                c1 = min(c0 + blk, n)
                cos = (M @ M[c0:c1].T) / np.outer(norms, norms[c0:c1])
                # only a LOWER-sorted row r < c0 + c can drop column c:
                # mask r >= c0 + c  ⟺  c <= r - c0  (tril with k = -c0)
                tri = np.tril(np.ones((n, c1 - c0), dtype=bool), k=-c0)
                cos[tri] = -np.inf
                hit = (cos > cut_hi) | np.isnan(cos)
                band = (cos >= cut_lo) & (cos <= cut_hi)
                if band.any():
                    for r, c in zip(*np.nonzero(band)):
                        hit[r, c] = exact_pred(M[r], M[c0 + c])
                dropped[c0:c1] |= hit.any(axis=0)
        return pd.DataFrame({"vec_id": ids[dropped].astype(np.int64)})

    return fn


def semdedup(
    emb: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    tau: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    labels: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup: cluster-pruned semantic near-dup removal. Returns one
    row per vector: (vec_id, cluster, keep) where keep is False iff a
    LOWER-id vector in the SAME cluster has 4dp-rounded cosine ≥ tau
    (the q24 rounded-threshold law, so the kept set is cross-engine
    identical). Cluster blocking bounds the pair join by the largest
    cluster — the reason SemDeDup scales where brute cosine pairs
    don't; cross-cluster near-dups are the accepted approximation
    (Abbas et al. §3.1). Pass precomputed ``labels`` (vec_id, cluster)
    to reuse an existing clustering instead of re-running k-means —
    the r7 soak's q93 wall was ~2× the necessary cost without it.

    The intra-cluster pair search runs as ONE grouped-pandas pass per
    cluster (gram matrix in BLAS, r8 optimization — the pair SELF-JOIN
    with interpreted higher-order-function cosines was 8× the cost of
    everything else in the r7 bench combined) with a bit-exactness
    band: see _semdedup_dropped_fn. The shuffle moves each vector
    once, keyed by cluster, instead of materializing every intra-
    cluster PAIR through a join."""
    if labels is None:
        labels = kmeans_micro(emb, k, n_iter, id_col, vec_col).localCheckpoint(
            eager=True
        )
    v = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).join(labels, "vec_id")
    dropped = (
        v.select("cluster", "vec_id", "v")
        .groupBy("cluster")
        .applyInPandas(_semdedup_dropped_fn(tau), "vec_id long")
        .withColumn("__drop", F.lit(True))
    )
    return (
        labels.join(dropped, "vec_id", "left")
        .select(
            "vec_id",
            "cluster",
            F.coalesce(~F.col("__drop"), F.lit(True)).alias("keep"),
        )
    )
