"""Crawl snapshot diff: classify every page key across two crawls.

The reference scraper re-fetches its fixed seed list every ~15 min and
appends; it never asks "what changed since last time". At web scale the
diff IS the product: recrawl scheduling (frontier/revisit.py consumes
per-URL change observations), index freshness accounting, and dedup of
unchanged fetches all key off (url, content-signature) compared across
two snapshots.

Scale shape: both sides arrive pre-reduced to ONE row per key (the
caller aggregates content to a signature — md5 text hash, simhash,
whatever the pipeline records per fetch), so the diff is a single
partitioned full-outer sort-merge join on the key plus a pure status
projection — no window, no skew surface beyond the join key itself,
which is the already-salted frontier key upstream. At 10^10 URLs this
is the same shape as the seen-set anti-join (q06).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STATUSES = ("unchanged", "changed", "new", "gone")


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str,
    sig_col: str,
) -> DataFrame:
    """Full-outer diff of two (key, signature) snapshots.

    Returns one row per key present in EITHER snapshot:
    ``(key_col, status, old_sig, new_sig)`` with status ∈
    ``unchanged`` (both, equal sig) / ``changed`` (both, different) /
    ``new`` (only in ``new``) / ``gone`` (only in ``old``).

    Each input must carry at most one row per key (the caller's
    aggregate-to-signature contract); duplicated keys would fan out in
    the join, so the contract is the caller's to uphold — exactly like
    the seen-set's canonical-URL contract.
    """
    o = old.select(
        F.col(key_col).alias("__ko"), F.col(sig_col).alias("old_sig")
    )
    n = new.select(
        F.col(key_col).alias("__kn"), F.col(sig_col).alias("new_sig")
    )
    j = o.join(n, o["__ko"] == n["__kn"], "full_outer")
    status = (
        F.when(F.col("old_sig").isNull(), F.lit("new"))
        .when(F.col("new_sig").isNull(), F.lit("gone"))
        .when(F.col("old_sig") == F.col("new_sig"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(
        F.coalesce(F.col("__ko"), F.col("__kn")).alias(key_col),
        status.alias("status"),
        "old_sig",
        "new_sig",
    )


def snapshot_diff_stats(diff: DataFrame) -> DataFrame:
    """Status rollup of a snapshot_diff: (status, n_keys) — the change
    rate a recrawl scheduler consumes. One map-side-combined shuffle to
    4 rows."""
    return diff.groupBy("status").agg(
        F.count(F.lit(1)).cast("long").alias("n_keys")
    )


def capture_index(
    captures: DataFrame,
    key_col: str = "url",
    ts_col: str = "ts",
    digest_col: str = "digest",
) -> DataFrame:
    """CDX-style per-URL capture index (the Common Crawl / Wayback
    index artifact): per URL over its whole fetch history — capture
    count, distinct content digests, number of content TRANSITIONS
    (digest != previous digest in (ts, digest) order — the change-rate
    numerator revisit scheduling estimates from), first/last capture
    time in epoch microseconds, and the latest digest. snapshot_diff
    compares two crawls; this summarizes ALL of them.

    Determinism: the history orders by (ts, digest) — equal-timestamp
    captures tie-break on the digest string, and the latest digest is
    the max (ts, digest) struct — so every output is a pure function of
    the capture SET (engine-exact). Timestamps cast to session-UTC
    timestamp before epoch math (the TIMESTAMP_NTZ law).

    Scale shape: one hash shuffle on the URL key; the lag window is
    bounded by each URL's capture count (revisit-schedule bounded —
    tens, not billions); the final agg is map-side combined."""
    from pyspark.sql import Window

    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(key_col).orderBy(us.asc(), F.col(digest_col).asc())
    o = captures.select(
        F.col(key_col).alias("url"),
        us.alias("__us"),
        F.col(digest_col).alias("__d"),
        F.lag(F.col(digest_col)).over(w).alias("__prev"),
    )
    return o.groupBy("url").agg(
        F.count(F.lit(1)).cast("long").alias("n_captures"),
        F.count_distinct("__d").cast("long").alias("n_digests"),
        F.sum(
            (F.col("__prev").isNotNull() & (F.col("__prev") != F.col("__d")))
            .cast("long")
        )
        .cast("long")
        .alias("n_changes"),
        F.min("__us").cast("long").alias("first_us"),
        F.max("__us").cast("long").alias("last_us"),
        F.max_by("__d", F.struct(F.col("__us"), F.col("__d"))).alias(
            "last_digest"
        ),
    )
