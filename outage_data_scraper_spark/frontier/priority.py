"""Host-keyed priority frontier pop (SURVEY.md O2, §4.3).

The reference crawls sequentially in seed order (app/main.py:21). The
engine generalizes that to a distributed priority queue: per wave, take at
most ``per_host_k`` URLs from each host, ordered by the crawl-ordering law

    (priority, event_seq, seed_seq, depth, child_seq)

which degenerates to the reference's exact sequential order when every
seed has equal priority (the parity test in tests/test_crawl_parity.py).

Physical shape: one shuffle (hash partition by host for the window), then
a salted repartition for the fetch stage so hot hosts (28/285 seed URLs on
one host in the reference's seed set) don't straggle. AQE handles residual
skew; the window itself is per-host so no global sort happens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import urlkit

ORDER_COLS = ["priority", "event_seq", "seed_seq", "depth", "child_seq"]


def pop_wave(
    frontier: DataFrame,
    per_host_k: int = 1,
    num_parts: int = 32,
    salt: int = 4,
    lane_cap: int = 500,
) -> DataFrame:
    """Select this wave's fetch batch: top-k pending URLs per host.

    Returns the popped rows with a ``salted_part`` fetch-partition column.
    The caller marks them in-flight / fetched via the catalog MERGE.
    """
    w = Window.partitionBy("host").orderBy(*[F.col(c).asc() for c in ORDER_COLS])
    wc = Window.partitionBy("host")
    popped = (
        frontier.filter(F.col("status") == "pending")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= per_host_k)
        # popped-per-host count shares the window's hash partitioning —
        # no extra shuffle; it sizes the adaptive fetch lanes below
        .withColumn("cnt", F.count(F.lit(1)).over(wc))
    )
    return (
        popped.withColumn(
            "n_lanes", urlkit.adaptive_lanes(F.col("cnt"), num_parts, salt, lane_cap)
        )
        .withColumn(
            "salted_part",
            urlkit.salted_part(
                F.col("host"), F.col("url"), num_parts, salt,
                rn=F.col("rn"), lanes=F.col("n_lanes"),
            ),
        )
        .drop("rn", "cnt")
    )


def with_family(df: DataFrame) -> DataFrame:
    """Attach the site-family dispatch column via a broadcast join against
    the (state, layout) → family registry (SURVEY.md O3: the reference's
    factory-class chain, re-expressed as a dispatch dimension)."""
    from ..parsers.registry import FAMILY_BY_STATE_LAYOUT

    spark = df.sparkSession
    dim = spark.createDataFrame(
        [(s, l, fam) for (s, l), fam in FAMILY_BY_STATE_LAYOUT.items()],
        "state string, layout string, family string",
    )
    return df.join(F.broadcast(dim), ["state", "layout"], "left")


def expand_endpoints(frontier: DataFrame) -> DataFrame:
    """Seed fan-out (O29): families whose one seed fetches several
    endpoints (ga1, tx1, tx4, ga11, il7 — e.g. ga_scraper.py:256–266,
    tx_scraper.py:103–114) explode into per-endpoint URLs in the
    reference's fetch order, encoded as child_seq so the ordering law
    holds. Data-driven from sources.fixtures.FAMILY_ENDPOINTS."""
    from ..sources.fixtures import FAMILY_ENDPOINTS

    suffixes = F.lit(None)
    expr = None
    for fam, eps in FAMILY_ENDPOINTS.items():
        arr = F.array(*[F.lit(e) for e in eps])
        expr = F.when(F.col("family") == fam, arr) if expr is None else expr.when(
            F.col("family") == fam, arr
        )
    suffixes = expr.otherwise(F.array(F.lit("")))
    exploded = frontier.select(
        "*", F.posexplode(suffixes).alias("__pos", "__suffix")
    )
    return (
        exploded.withColumn("url", F.concat(F.col("url"), F.col("__suffix")))
        .withColumn("child_seq", F.col("child_seq") + F.col("__pos"))
        .drop("__pos", "__suffix")
    )


def seeds_to_frontier(seeds: DataFrame) -> DataFrame:
    """Lift the seeds table into frontier rows (depth 0, wave 0, pending),
    with family dispatch and endpoint fan-out applied."""
    base = seeds.select(
        F.col("url"),
        urlkit.host(F.col("url")).alias("host"),
        F.lit(0).alias("salted_part"),
        F.lit(0.0).alias("priority"),
        F.lit(0).alias("depth"),
        F.col("event_seq"),
        F.col("seed_seq"),
        F.lit(0).alias("child_seq"),
        F.col("state"),
        F.col("layout"),
        F.col("emc"),
        F.lit("pending").alias("status"),
        F.lit(0).alias("wave"),
    )
    return expand_endpoints(with_family(base))


def merge_children(
    frontier: DataFrame, children: DataFrame, wave: int
) -> DataFrame:
    """Union newly-discovered child URLs into the frontier (O6 two-hop
    discovery). ``children`` must carry (url, host, event_seq, seed_seq,
    depth, child_seq, state, layout, emc); dedup against the current
    frontier is the caller's job (seen-set filter runs before this)."""
    priority = (
        F.coalesce(F.col("priority"), F.lit(0.0))
        if "priority" in children.columns
        else F.lit(0.0)
    )
    lifted = children.select(
        "url",
        "host",
        F.lit(0).alias("salted_part"),
        priority.alias("priority"),
        "depth",
        "event_seq",
        "seed_seq",
        "child_seq",
        "state",
        "layout",
        "emc",
        "family",
        F.lit("pending").alias("status"),
        F.lit(wave).alias("wave"),
    )
    return frontier.unionByName(lifted)
