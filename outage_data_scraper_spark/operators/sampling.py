"""Deterministic dataset splitting / sampling for training pipelines.

A 100-TB corpus needs REPRODUCIBLE splits: `df.sample()` / `rand()`
re-roll on recompute, retry, or repartition, silently leaking rows
across train/test. Hash-based assignment is pure column algebra —
stable across runs, cluster sizes, and engine versions, and any row's
split is decidable in isolation (no global state, no shuffle).

md5 is used (not xxhash64) so the DuckDB oracle mirrors the exact
bucket arithmetic (CLAUDE.md: md5 is the only shared hash); the top 15
hex chars fit a signed BIGINT on both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_WEIGHTS: tuple[tuple[str, int], ...] = (
    ("train", 80),
    ("val", 10),
    ("test", 10),
)


def _hash60(id_col: Column, seed: str) -> Column:
    """md5(seed || id) top-15-hex as a 60-bit long — the ONE hashing
    chain behind both hash_bucket (q48) and uniform01 (q53); their
    DuckDB oracle twins mirror this exact construction, so any change
    here must change both oracles in lockstep."""
    h = F.md5(F.concat(F.lit(seed), id_col.cast("string")))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long")


def hash_bucket(id_col: Column, seed: str = "split-1", buckets: int = 100) -> Column:
    """Deterministic bucket in [0, buckets): md5(seed || id) as a 60-bit
    int, mod buckets."""
    return F.pmod(_hash60(id_col, seed), F.lit(buckets))


def split_column(
    id_col: Column,
    weights: tuple[tuple[str, int], ...] = DEFAULT_WEIGHTS,
    seed: str = "split-1",
) -> Column:
    """Split label from cumulative integer-percent weights (must sum to
    100): bucket < 80 → train, < 90 → val, else test by default."""
    total = sum(w for _, w in weights)
    if total != 100:
        raise ValueError(f"weights must sum to 100, got {total}")
    b = hash_bucket(id_col, seed)
    expr = None
    acc = 0
    for name, w in weights[:-1]:
        acc += w
        cond = b < acc
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = weights[-1][0]
    return expr.otherwise(last) if expr is not None else F.lit(last)


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: tuple[tuple[str, int], ...] = DEFAULT_WEIGHTS,
    seed: str = "split-1",
) -> DataFrame:
    """Attach a deterministic `split` column. Narrow (no shuffle, no
    RNG state): the plan stays a projection over the scan, so it
    composes with any downstream filter/write untouched."""
    return df.withColumn("split", split_column(F.col(id_col), weights, seed))


def uniform01(id_col: Column, seed: str = "mix-1") -> Column:
    """Deterministic uniform in [0, 1): the shared 60-bit hash over
    2^60. Same bit-for-bit in DuckDB as
    ('0x' || substr(md5(...), 1, 15))::BIGINT / 2^60."""
    return _hash60(id_col, seed) / F.lit(float(1 << 60))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: tuple[tuple[str, float], ...],
    id_col: str = "doc_id",
    seed: str = "mix-1",
) -> DataFrame:
    """Hash-threshold stratified sampling — the data-mixing primitive
    (downweight a dominant language/source, keep rare strata whole).

    Keep a row iff uniform01(id) < rate[stratum]; strata absent from
    ``rates`` drop (rate 0). Unlike per-stratum quota sampling (a window
    rank = one full shuffle on the stratum key, with the dominant
    stratum as a straggler partition), the threshold form is decidable
    PER ROW: the plan is filter-over-scan — zero shuffles, zero RNG
    state, stable under retry/repartition/cluster resize, and the same
    row set falls out at any scale. Rates are exact in expectation;
    at 10^10 rows the realized fraction is within ~1e-4 of the rate,
    which is what a training-mix needs (quotas that must be EXACT are a
    different op: rank on uniform01 and cut at k).
    """
    u = uniform01(F.col(id_col), seed)
    r: Column | None = None
    for name, rate in rates:
        cond = F.col(strata_col) == name
        r = F.when(cond, float(rate)) if r is None else r.when(cond, float(rate))
    r = F.lit(0.0) if r is None else r.otherwise(0.0)
    return df.withColumn("mix_u", F.round(u, 6)).filter(u < r)


def quota_sample(
    df: DataFrame,
    strata_col: str,
    quotas: dict[str, int],
    id_col: str = "doc_id",
    seed: str = "quota-1",
    prefilter_factor: int = 3,
) -> DataFrame:
    """EXACT per-stratum quotas — the pay-the-shuffle complement to
    stratified_sample's threshold form: keep the k rows with the
    SMALLEST (hash60, id) per stratum, so the output is a deterministic
    function of ids alone (retry/repartition/scale-invariant), strata
    absent from ``quotas`` drop, and a quota ≥ the stratum population
    keeps the whole stratum.

    Scale shape — two-phase: ranking a 10^10-row dominant stratum in
    ONE window partition is the straggler the threshold form avoids, so
    phase 1 prefilters with the per-row hash threshold at
    ``prefilter_factor·k/n`` (stratum counts = one tiny agg), cutting
    the window input to O(factor·k) rows per stratum; phase 2
    window-ranks only the survivors. The prefilter is validated —
    strata where it kept fewer than min(k, n) rows (vanishingly rare at
    factor 3; possible in principle since the hash is uniform, not
    magic) fall back to ranking the full stratum, preserving EXACTNESS
    unconditionally.
    """
    rows = df.sparkSession.createDataFrame(
        [(s, int(k)) for s, k in quotas.items()], f"{strata_col} string, __quota long"
    )
    counts = {
        r[strata_col]: r.n
        for r in df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n")).collect()
        if r[strata_col] in quotas
    }
    u = uniform01(F.col(id_col), seed)
    # per-stratum prefilter threshold (1.0 when quota covers the stratum)
    thr: Column | None = None
    full_rank: set[str] = set()
    for s, k in quotas.items():
        n = counts.get(s, 0)
        t = 1.0 if n <= prefilter_factor * k else prefilter_factor * k / n
        thr = F.when(F.col(strata_col) == s, t) if thr is None else thr.when(
            F.col(strata_col) == s, t
        )
    thr = F.lit(0.0) if thr is None else thr.otherwise(0.0)
    survivors = df.filter(u < thr)
    # validate: any stratum whose prefilter kept < min(k, n) rows ranks
    # over the full stratum instead (exactness is unconditional)
    kept = {
        r[strata_col]: r.n
        for r in survivors.groupBy(strata_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for s, k in quotas.items():
        need = min(int(k), counts.get(s, 0))
        if kept.get(s, 0) < need:
            full_rank.add(s)
    if full_rank:
        survivors = survivors.unionByName(
            df.filter(F.col(strata_col).isin(sorted(full_rank)))
        ).dropDuplicates([strata_col, id_col])
    w = Window.partitionBy(strata_col).orderBy(
        _hash60(F.col(id_col), seed), F.col(id_col)
    )
    return (
        survivors.join(F.broadcast(rows), strata_col)
        .withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= F.col("__quota"))
        .drop("__quota")
    )


def allocate_quotas(
    df: DataFrame,
    group_col: str,
    budget: int,
) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment of an integer sample
    ``budget`` across groups, proportional to group size — the quota
    DERIVATION step whose output feeds ``quota_sample``'s externally
    given quotas (domain-mixture curation: "take 1M docs, proportional
    by registered domain").

    All-integer arithmetic so the DuckDB oracle is bit-exact:
    ``base = (budget·n) DIV total`` and ``rem = (budget·n) % total``
    (non-negative operands — Spark DIV ≡ DuckDB ``//``); the
    ``budget − Σ base`` leftover units go to the largest remainders,
    ties to the lexically smallest group. Exactly ``Σ quota = budget``
    whenever budget ≥ 0 (proved by the method; asserted in tests).

    Scale shape: one map-side-combined count shuffle reduces the corpus
    to GROUP-cardinality rows; the global-total window and the
    remainder ranking run over that group-count-sized relation only
    (the documented small-window exception — never the corpus).
    Overflow contract: requires ``budget · max_group_count < 2^63``.
    """
    if budget < 0:
        raise ValueError("budget must be >= 0")
    counts = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_items")
    )
    whole = Window.partitionBy()
    sized = counts.select(
        group_col,
        "n_items",
        F.sum("n_items").over(whole).alias("__tot"),
    ).select(
        group_col,
        "n_items",
        F.expr(f"({budget} * n_items) DIV __tot").alias("__base"),
        F.expr(f"({budget} * n_items) % __tot").alias("__rem"),
    )
    rank_w = Window.orderBy(F.desc("__rem"), F.col(group_col).asc())
    return (
        sized.select(
            group_col,
            "n_items",
            "__base",
            F.row_number().over(rank_w).alias("__rk"),
            (F.lit(budget) - F.sum("__base").over(whole)).alias("__extra"),
        )
        .select(
            group_col,
            "n_items",
            (
                F.col("__base")
                + F.when(F.col("__rk") <= F.col("__extra"), 1).otherwise(0)
            )
            .cast("long")
            .alias("quota"),
        )
    )
