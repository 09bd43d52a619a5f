"""Distributed URL-seen set: exact anti-join + Bloom-filter fast path.

The reference's only dedupe is a per-run `visited` list guarding repeated
XHR captures (il_scraper.py:200–204; ny_scraper.py:203,211–212). The
engine generalizes it (north rule):

- **Exact path** — left-anti join against the `seen` table. Used at test
  scale and for the parity invariant (identical final seen-set).
- **Bloom path** — per-partition Bloom bitsets built from JVM-precomputed
  xxhash64 columns (so Python never hashes strings row-at-a-time), merged
  via ``RDD.treeAggregate`` (the engine's single RDD touchpoint), then
  broadcast and probed inside a vectorized ``mapInPandas``. False
  positives only *suppress* re-fetches — exactly the `visited` semantics —
  never invent URLs, so the Bloom path is safe at 10^10 scale with an
  ε·|frontier| re-fetch-suppression budget.

Both paths share the filter_unseen_* signature so callers flip with one
config knob.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_H1 = "__seen_h1"
_H2 = "__seen_h2"


def _with_hash_cols(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Two independent 64-bit hashes computed JVM-side (xxhash64 with
    different seeds via an extra literal column). Double hashing
    h1 + i*h2 gives the k Bloom probes."""
    return df.withColumn(_H1, F.xxhash64(F.col(url_col))).withColumn(
        _H2, F.xxhash64(F.col(url_col), F.lit("bloom-seed-2"))
    )


class BloomFilter:
    """Fixed-size Bloom bitset with vectorized numpy add/contains."""

    def __init__(self, m_bits: int, k: int, bits: np.ndarray | None = None):
        self.m = int(m_bits)
        self.k = int(k)
        self.bits = (
            bits if bits is not None else np.zeros((self.m + 7) // 8, dtype=np.uint8)
        )

    @classmethod
    def sized(cls, expected_n: int, fpp: float = 1e-3) -> "BloomFilter":
        n = max(expected_n, 1)
        m = int(-n * math.log(fpp) / (math.log(2) ** 2))
        m = max(64, (m + 63) // 64 * 64)
        k = max(1, round(m / n * math.log(2)))
        return cls(m, min(k, 16))

    def _probe_idx(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        h1 = h1.astype(np.uint64)
        h2 = h2.astype(np.uint64) | np.uint64(1)
        i = np.arange(self.k, dtype=np.uint64)[None, :]
        return ((h1[:, None] + i * h2[:, None]) % np.uint64(self.m)).astype(np.int64)

    def add_hashes(self, h1: np.ndarray, h2: np.ndarray) -> None:
        idx = self._probe_idx(h1, h2)
        np.bitwise_or.at(self.bits, idx >> 3, (1 << (idx & 7)).astype(np.uint8))

    def contains_hashes(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        if len(h1) == 0:
            return np.zeros(0, dtype=bool)
        idx = self._probe_idx(h1, h2)
        hit = (self.bits[idx >> 3] & (1 << (idx & 7)).astype(np.uint8)) != 0
        return hit.all(axis=1)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert self.m == other.m and self.k == other.k
        return BloomFilter(self.m, self.k, np.bitwise_or(self.bits, other.bits))

    def to_bytes(self) -> bytes:
        return self.bits.tobytes()

    @classmethod
    def from_bytes(cls, m: int, k: int, raw: bytes) -> "BloomFilter":
        return cls(m, k, np.frombuffer(raw, dtype=np.uint8).copy())


def bloom_from_df(
    df: DataFrame, url_col: str = "url", expected_n: int | None = None, fpp: float = 1e-3
) -> BloomFilter:
    """Build one merged Bloom filter over df[url_col].

    Per-partition bitsets are built with numpy from Arrow batches
    (mapInPandas → one bitset row per partition), then OR-merged with
    ``treeAggregate(depth=2)`` so the driver never receives more than
    sqrt(P) bitsets at once.
    """
    n = expected_n if expected_n is not None else df.count()
    proto = BloomFilter.sized(n, fpp)
    m, k = proto.m, proto.k

    hashed = _with_hash_cols(df, url_col).select(_H1, _H2)

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bf = BloomFilter(m, k)
        for b in batches:
            bf.add_hashes(b[_H1].to_numpy(np.int64), b[_H2].to_numpy(np.int64))
        yield pd.DataFrame({"bitset": [bf.to_bytes()]})

    shard_rdd = hashed.mapInPandas(build, "bitset binary").rdd.map(
        lambda row: np.frombuffer(row.bitset, dtype=np.uint8)
    )
    zero = np.zeros((m + 7) // 8, dtype=np.uint8)
    merged = shard_rdd.treeAggregate(zero, np.bitwise_or, np.bitwise_or, depth=2)
    return BloomFilter(m, k, merged)


def filter_unseen_exact(candidates: DataFrame, seen: DataFrame, url_col: str = "url") -> DataFrame:
    """Exact path: anti-join on the canonical URL. At scale the join key
    is the 64-bit url_hash first (cheap shuffle) with the string equality
    as the residual — Catalyst plans that from this one expression."""
    seen_keys = seen.select(F.col(url_col).alias("__seen_url")).distinct()
    return candidates.join(
        seen_keys, candidates[url_col] == F.col("__seen_url"), "left_anti"
    )


def filter_unseen_bloom(candidates: DataFrame, bloom: BloomFilter, url_col: str = "url") -> DataFrame:
    """Bloom path: broadcast the merged bitset, probe vectorized."""
    spark = candidates.sparkSession
    b = spark.sparkContext.broadcast((bloom.m, bloom.k, bloom.to_bytes()))
    hashed = _with_hash_cols(candidates, url_col)
    schema = hashed.schema

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        m, k, raw = b.value
        bf = BloomFilter.from_bytes(m, k, raw)
        for batch in batches:
            hit = bf.contains_hashes(
                batch[_H1].to_numpy(np.int64), batch[_H2].to_numpy(np.int64)
            )
            yield batch[~hit]

    return hashed.mapInPandas(probe, schema).drop(_H1, _H2)
