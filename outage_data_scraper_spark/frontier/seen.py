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
    # each partition emits ONE full-m bitset; a large-n bloom over many
    # partitions would push partitions × m/8 bytes through the merge
    # (a 38 MB bitset × 256 parts = 9.7 GB of byte[] rows — measured
    # JVM OOM at the 4M-URL soak). Cap in-flight bitset bytes at
    # ~512 MB by coalescing (narrow, no shuffle) — hashing loses some
    # parallelism only when bitsets are huge, exactly when the merge
    # would otherwise dominate. The 10^10-scale form is sharded blooms
    # (SCALE.md §Bloom): shard by url hash, each shard m/256 bits.
    bitset_bytes = (m + 7) // 8
    max_parts = max(8, (512 << 20) // max(bitset_bytes, 1))
    if hashed.rdd.getNumPartitions() > max_parts:
        hashed = hashed.coalesce(int(max_parts))

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


class CuckooFilter:
    """Bucketized cuckoo filter (the public Fan et al. CoNEXT'14 design):
    m buckets × 4 slots of 16-bit fingerprints. Same probe contract as
    the Bloom path (false positives only suppress re-fetches, never any
    false negatives) plus the one thing a Bloom bitset cannot do:
    **delete** — un-seeing a URL so a scheduled re-crawl can fetch it
    again without rebuilding the whole seen-set.

    Inserts/deletes walk an eviction loop per item (inherently
    sequential); membership probes are fully vectorized. The engine uses
    it like the Bloom: per-partition builds merged by fingerprint
    reinsertion (bucket index + fingerprint determine the partner bucket,
    so a table row is self-contained).
    """

    SLOTS = 4
    MAX_KICKS = 500
    _FP_MIX = np.uint64(0x5BD1E995)  # odd multiplier: fp → partner-bucket offset

    def __init__(self, m_buckets: int, table: np.ndarray | None = None, seed: int = 7):
        assert m_buckets & (m_buckets - 1) == 0, "bucket count must be a power of two"
        self.m = int(m_buckets)
        self.table = (
            table
            if table is not None
            else np.zeros((self.m, self.SLOTS), dtype=np.uint16)
        )
        self._rng = np.random.default_rng(seed)

    @classmethod
    def sized(cls, expected_n: int, load: float = 0.84) -> "CuckooFilter":
        n = max(expected_n, 1)
        m = 1
        while m * cls.SLOTS * load < n:
            m <<= 1
        return cls(max(m, 8))

    # -- hashing ---------------------------------------------------------------
    def _fp(self, h2: np.ndarray) -> np.ndarray:
        # fingerprints 1..65535 (0 is the empty-slot sentinel)
        return (h2.astype(np.uint64) % np.uint64(65535) + np.uint64(1)).astype(np.uint16)

    def _i1(self, h1: np.ndarray) -> np.ndarray:
        return (h1.astype(np.uint64) & np.uint64(self.m - 1)).astype(np.int64)

    def _partner(self, i: np.ndarray, fp: np.ndarray) -> np.ndarray:
        mix = (fp.astype(np.uint64) * self._FP_MIX) & np.uint64(self.m - 1)
        return (i.astype(np.uint64) ^ mix).astype(np.int64)

    # -- mutation (per-item, eviction loop) -------------------------------------
    def _insert_one(self, i: int, fp: int) -> None:
        for idx in (i, int(self._partner(np.array([i]), np.array([fp], dtype=np.uint16))[0])):
            row = self.table[idx]
            free = np.nonzero(row == 0)[0]
            if len(free):
                row[free[0]] = fp
                return
        cur_i, cur_fp = i, fp
        for _ in range(self.MAX_KICKS):
            slot = int(self._rng.integers(self.SLOTS))
            cur_fp, self.table[cur_i, slot] = int(self.table[cur_i, slot]), cur_fp
            cur_i = int(
                self._partner(np.array([cur_i]), np.array([cur_fp], dtype=np.uint16))[0]
            )
            row = self.table[cur_i]
            free = np.nonzero(row == 0)[0]
            if len(free):
                row[free[0]] = cur_fp
                return
        raise RuntimeError(
            "cuckoo filter over capacity — size with headroom (load ≤ 0.84)"
        )

    def add_hashes(self, h1: np.ndarray, h2: np.ndarray) -> None:
        fps = self._fp(h2)
        i1s = self._i1(h1)
        for i, fp in zip(i1s.tolist(), fps.tolist()):
            self._insert_one(i, fp)

    def delete_hashes(self, h1: np.ndarray, h2: np.ndarray) -> int:
        """Remove one stored fingerprint per item; returns #removed."""
        fps = self._fp(h2)
        i1s = self._i1(h1)
        i2s = self._partner(i1s, fps)
        removed = 0
        for i1, i2, fp in zip(i1s.tolist(), i2s.tolist(), fps.tolist()):
            for idx in (i1, i2):
                slots = np.nonzero(self.table[idx] == fp)[0]
                if len(slots):
                    self.table[idx, slots[0]] = 0
                    removed += 1
                    break
        return removed

    # -- probes (vectorized) -----------------------------------------------------
    def contains_hashes(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        if len(h1) == 0:
            return np.zeros(0, dtype=bool)
        fps = self._fp(h2)
        i1s = self._i1(h1)
        i2s = self._partner(i1s, fps)
        hit1 = (self.table[i1s] == fps[:, None]).any(axis=1)
        hit2 = (self.table[i2s] == fps[:, None]).any(axis=1)
        return hit1 | hit2

    # -- merge / serde ------------------------------------------------------------
    def merge(self, other: "CuckooFilter") -> "CuckooFilter":
        assert self.m == other.m
        out = CuckooFilter(self.m, self.table.copy())
        occ_i, occ_s = np.nonzero(other.table)
        for i, s in zip(occ_i.tolist(), occ_s.tolist()):
            out._insert_one(i, int(other.table[i, s]))
        return out

    def to_bytes(self) -> bytes:
        return self.table.tobytes()

    @classmethod
    def from_bytes(cls, m: int, raw: bytes) -> "CuckooFilter":
        return cls(m, np.frombuffer(raw, dtype=np.uint16).reshape(m, cls.SLOTS).copy())


def cuckoo_from_df(
    df: DataFrame, url_col: str = "url", expected_n: int | None = None
) -> CuckooFilter:
    """Build one merged cuckoo filter over df[url_col]: per-partition
    tables from Arrow batches, merged by fingerprint reinsertion via
    treeAggregate (same shape as bloom_from_df)."""
    n = expected_n if expected_n is not None else df.count()
    proto = CuckooFilter.sized(n)
    m = proto.m

    hashed = _with_hash_cols(df, url_col).select(_H1, _H2)
    # same in-flight-bytes cap as bloom_from_df (tables are m·SLOTS·2 B)
    table_bytes = m * CuckooFilter.SLOTS * 2
    max_parts = max(8, (512 << 20) // max(table_bytes, 1))
    if hashed.rdd.getNumPartitions() > max_parts:
        hashed = hashed.coalesce(int(max_parts))

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cf = CuckooFilter(m)
        for b in batches:
            cf.add_hashes(b[_H1].to_numpy(np.int64), b[_H2].to_numpy(np.int64))
        yield pd.DataFrame({"table": [cf.to_bytes()]})

    shard_rdd = hashed.mapInPandas(build, "table binary").rdd.map(
        lambda row: CuckooFilter.from_bytes(m, bytes(row.table))
    )
    zero = CuckooFilter(m)
    return shard_rdd.treeAggregate(
        zero, lambda a, b_: a.merge(b_), lambda a, b_: a.merge(b_), depth=2
    )


def filter_unseen_cuckoo(
    candidates: DataFrame, cuckoo: CuckooFilter, url_col: str = "url"
) -> DataFrame:
    """Cuckoo path: broadcast the fingerprint table, probe vectorized.
    Identical contract to filter_unseen_bloom, plus deletability."""
    spark = candidates.sparkSession
    b = spark.sparkContext.broadcast((cuckoo.m, cuckoo.to_bytes()))
    hashed = _with_hash_cols(candidates, url_col)
    schema = hashed.schema

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        m, raw = b.value
        cf = CuckooFilter.from_bytes(m, raw)
        for batch in batches:
            hit = cf.contains_hashes(
                batch[_H1].to_numpy(np.int64), batch[_H2].to_numpy(np.int64)
            )
            yield batch[~hit]

    return hashed.mapInPandas(probe, schema).drop(_H1, _H2)


def unsee_urls(cuckoo: CuckooFilter, df: DataFrame, url_col: str = "url") -> int:
    """Delete URLs from the cuckoo seen-set (driver-side over the small
    re-crawl list) so a scheduled refetch passes the filter again —
    the operation a Bloom bitset cannot express. Returns #removed."""
    rows = _with_hash_cols(df, url_col).select(_H1, _H2).collect()
    if not rows:
        return 0
    h1 = np.array([r[_H1] for r in rows], dtype=np.int64)
    h2 = np.array([r[_H2] for r in rows], dtype=np.int64)
    return cuckoo.delete_hashes(h1, h2)


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
