"""URL column functions — pure pyspark.sql.functions, no Python UDFs.

Everything here stays inside whole-stage codegen; the same logic is
expressible in ANSI SQL (the DuckDB oracles in __spark_entry__.py mirror
it with split_part/lower), which is how the driver cross-checks it.

The reference never canonicalizes URLs (it fetches seed strings verbatim,
app/main.py:21); canonicalization is a north-rule addition needed for the
URL-seen set to be well-defined at 10^10 scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def strip_fragment(url: Column) -> Column:
    """Drop everything from the first '#'."""
    return F.substring_index(url, "#", 1)


def scheme(url: Column) -> Column:
    return F.lower(F.substring_index(url, "://", 1))


def authority(url: Column) -> Column:
    """host[:port], lowercased. Port is kept: the reference treats
    `host:89` seeds as distinct endpoints (events/tx/layout_8.json)."""
    rest = F.substring_index(strip_fragment(url), "://", -1)
    return F.lower(F.substring_index(rest, "/", 1))


def host(url: Column) -> Column:
    """Politeness key: authority including port (one token bucket each)."""
    return authority(url)


def path_and_query(url: Column) -> Column:
    """Everything after the authority, '' if none (no trailing-/ added)."""
    rest = F.substring_index(strip_fragment(url), "://", -1)
    return F.when(
        F.length(rest) > F.length(F.substring_index(rest, "/", 1)),
        F.substring(rest, F.length(F.substring_index(rest, "/", 1)) + 1, F.lit(2_000_000)),
    ).otherwise(F.lit(""))


def canonicalize(url: Column) -> Column:
    """scheme://host[:port]<path?query> with fragment stripped and
    scheme+authority lowercased; path/query case preserved."""
    return F.concat(scheme(url), F.lit("://"), authority(url), path_and_query(url))


def url_hash(url: Column) -> Column:
    """64-bit stable hash for the seen-set and bucketing."""
    return F.xxhash64(url)


def salted_part(host_col: Column, url: Column, num_parts: int, salt: int = 4) -> Column:
    """Partition id that keeps one host co-located while spreading hot
    hosts across ``salt`` sub-partitions (SURVEY.md §4.3: 28/285 seed URLs
    share one host — naive repartition(host) straggles at scale).

    All URLs of a host land in one of ``salt`` fixed partitions derived
    from the host hash, sub-selected by the URL hash — so a host's token
    bucket state stays on few executors but a hot host's parse work fans
    out.
    """
    base = F.pmod(F.xxhash64(host_col), F.lit(num_parts // salt if num_parts >= salt else 1))
    sub = F.pmod(F.xxhash64(url), F.lit(salt))
    return (base * salt + sub).cast("int")
