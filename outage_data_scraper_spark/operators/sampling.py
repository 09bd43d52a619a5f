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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_WEIGHTS: tuple[tuple[str, int], ...] = (
    ("train", 80),
    ("val", 10),
    ("test", 10),
)


def hash_bucket(id_col: Column, seed: str = "split-1", buckets: int = 100) -> Column:
    """Deterministic bucket in [0, buckets): md5(seed || id) as a 60-bit
    int, mod buckets."""
    h = F.md5(F.concat(F.lit(seed), id_col.cast("string")))
    return F.pmod(
        F.conv(F.substring(h, 1, 15), 16, 10).cast("long"), F.lit(buckets)
    )


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
