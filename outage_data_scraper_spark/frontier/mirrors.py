"""Host-level mirror detection (Bharat & Broder 1999, "Mirror, mirror
on the Web").

A web-scale crawl wastes budget re-fetching the same site under many
hostnames (CDNs, vanity domains, literal mirrors). Mirror detection
collapses the HOST graph: two hosts whose page-content signature sets
overlap heavily are aliases, and the frontier keeps only the canonical
one. The reference crawls a fixed seed list and never needs this; it is
north-rule frontier hygiene, the host-granularity sibling of the
doc-level fingerprint overlap matcher (operators/fingerprint.py).

Scale shape (10^8 hosts, 10^10 pages):
- the page table first collapses to DISTINCT (host, sig) — one
  map-side-combined shuffle; everything downstream is signature-set
  sized, never page sized.
- signatures on more than ``max_df`` hosts are dropped BEFORE the
  self-join (site chrome, shared boilerplate, empty-page hashes): the
  same cutoff that removes non-evidence also CAPS the join fan-out at
  max_df² pairs per signature — no boilerplate hash can cartesian the
  host space (the q86 skew law).
- the signature equi-join is the only wide op; per-host set sizes are a
  host-cardinality relation joined back (broadcastable at scale).

Containment is reported in integer BASIS POINTS of the smaller host's
set — (10000·shared) DIV min(n_a, n_b) — so the value is bit-exact
cross-engine (no float division; DIV ≡ // on the non-negative domain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def detect_mirrors(
    pages: DataFrame,
    host_col: str = "host",
    sig_col: str = "sig",
    min_shared: int = 2,
    max_df: int = 16,
) -> DataFrame:
    """Host pairs whose content-signature sets overlap: returns
    (host_a, host_b, n_shared, n_a, n_b, containment_bp) with
    host_a < host_b, for pairs sharing at least ``min_shared``
    signatures that each appear on at most ``max_df`` hosts.

    ``n_a``/``n_b`` count each host's FULL distinct-signature set
    (including widespread signatures the df cut excludes from pairing)
    — the denominator is the host's real size, the numerator only the
    discriminating evidence, so boilerplate can never manufacture a
    mirror verdict. containment_bp == 10000 means every page of the
    smaller host also lives on the larger one."""
    d = pages.select(
        F.col(host_col).alias("host"), F.col(sig_col).alias("sig")
    ).distinct()
    sizes = d.groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("n_sigs")
    )
    # d is distinct, so count(*) per sig IS the distinct-host df.
    # r8 (the q19/q86 pair-mining shape): df as a window count on ONE
    # sig-keyed exchange, the ≤max_df cap filtered BEFORE collect_list
    # materializes anything (lists stay bounded), pairs exploded from
    # the bounded lists on the same partitioning — replaces the
    # df-table join + sig self-join, which re-shuffled the signature
    # relation twice more. Singleton sigs (df < 2) can't pair and drop
    # with the same filter.
    from pyspark.sql import Window

    kept = d.withColumn(
        "__df", F.count(F.lit(1)).over(Window.partitionBy("sig"))
    ).filter((F.col("__df") >= 2) & (F.col("__df") <= max_df))
    grouped = kept.groupBy("sig").agg(F.collect_list("host").alias("ms"))
    pairs = (
        grouped.select(F.explode("ms").alias("host_a"), F.col("ms"))
        .select("host_a", F.explode("ms").alias("host_b"))
        .filter(F.col("host_a") < F.col("host_b"))
    )
    shared = (
        pairs.groupBy("host_a", "host_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    return (
        shared.join(
            sizes.select(F.col("host").alias("host_a"), F.col("n_sigs").alias("n_a")),
            "host_a",
        )
        .join(
            sizes.select(F.col("host").alias("host_b"), F.col("n_sigs").alias("n_b")),
            "host_b",
        )
        .select(
            "host_a",
            "host_b",
            "n_shared",
            "n_a",
            "n_b",
            F.expr("(10000 * n_shared) DIV least(n_a, n_b)")
            .cast("long")
            .alias("containment_bp"),
        )
    )
