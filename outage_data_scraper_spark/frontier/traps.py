"""Crawl-trap detection — the frontier-hygiene operator a 10^10-URL
crawl cannot ship without: calendars, session ids, faceted search and
tracking parameters generate UNBOUNDED URL spaces under a handful of
path shapes, and an undefended frontier fills up with one host's
infinite garbage (the politeness budget then *starves real hosts* —
the queue is full of pages that will never say anything new).

Detection law (the shape Heritrix/Nutch-style crawlers use): collapse
every URL to its TEMPLATE — scheme://host/path with every digit run
squashed to ``N`` and every query value squashed to ``V`` — and flag
any (host, template) whose DISTINCT-URL count exceeds a threshold. A
bounded site section ("/page/N" with 50 pages) stays under it; a
session-id mint ("/session/N", one URL per visitor) blows through it.

Everything is pure Column algebra (whole-stage codegen, oracle-
mirrorable in ANSI SQL). Scale shape: one map-side-combined shuffle on
(host, template) for the exact count; ``approx=True`` swaps in
approx_count_distinct so the 100 TB pass never shuffles full URL
strings per group. The trap table itself is small (it lists SHAPES,
not URLs), so enforcement is a broadcast anti-join.

The reference crawls a fixed seed list and cannot hit traps; this is
north-rule frontier machinery (general URL-frontier scheduler).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import urlkit


def url_template(url: Column) -> Column:
    """scheme://host/<path with digit runs → N, query values → V>.

    Query values are everything between '=' and the next '&' (or end);
    digit squashing runs first so '?p=123' and '?p=abc' both land on
    '?p=V'. Fragment is gone via canonicalize's strip.
    """
    path = urlkit.path_and_query(url)
    squashed = F.regexp_replace(path, "[0-9]+", "N")
    squashed = F.regexp_replace(squashed, "=[^&#]*", "=V")
    return F.concat(
        urlkit.scheme(url), F.lit("://"), urlkit.authority(url), squashed
    )


def detect_traps(
    urls: DataFrame,
    url_col: str = "url",
    min_distinct: int = 100,
    approx: bool = False,
) -> DataFrame:
    """(host, template, n_urls) for every template minting at least
    ``min_distinct`` distinct URLs. ``approx=True`` uses HLL++ counts
    (rsd 5%) — the 100 TB shape where exact per-group distinct would
    shuffle every URL string; thresholds there are capacity guards,
    not exact laws, so ±5% is the right trade."""
    if min_distinct <= 0:
        raise ValueError("min_distinct must be positive")
    u = F.col(url_col)
    counted = (
        urls.select(
            urlkit.host(u).alias("host"),
            url_template(u).alias("template"),
            u.alias("__u"),
        )
        .groupBy("host", "template")
        .agg(
            (
                F.approx_count_distinct("__u")
                if approx
                else F.count_distinct("__u")
            ).alias("n_urls")
        )
    )
    return counted.filter(F.col("n_urls") >= min_distinct)


def filter_trapped(
    frontier: DataFrame, traps: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Drop frontier rows whose (host, template) is a detected trap.
    The trap table lists shapes, not URLs — broadcast anti-join."""
    u = F.col(url_col)
    keyed = frontier.withColumn("__h", urlkit.host(u)).withColumn(
        "__t", url_template(u)
    )
    kept = keyed.join(
        F.broadcast(traps.select(F.col("host").alias("__h"), F.col("template").alias("__t"))),
        ["__h", "__t"],
        "left_anti",
    )
    return kept.drop("__h", "__t")
