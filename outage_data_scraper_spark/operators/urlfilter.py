"""URL-level corpus filtering (RefinedWeb/CCNet-style URL hygiene).

Before any page byte is fetched or parsed, web pipelines drop URLs by
domain blocklist and structural quality signals (spammy hosts carry
digit-heavy subdomains, tracking-parameter tails, absurd path depth).
The reference repo fetches a fixed seed set and has no URL-filter
analog; this is training-data-pipeline surface.

Scale shape: everything is pure column algebra over the frontier scan
except the blocklist, which is a broadcast join (a blocklist is
10^4–10^6 registered domains — MBs): zero shuffles on the 10^10-row
frontier side. The keep decision then prunes fetch work, which is the
point — this runs BEFORE the expensive stages.

Determinism: every feature is integer arithmetic (basis points via
integer DIV — the CLAUDE.md float-immunity rule) or a string in the
Java∩RE2 regex subset, so the DuckDB oracle recomputes all of it
value-exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import urlkit

#: frozen, tiny public-suffix subset for multi-label TLDs; mirrored
#: verbatim in the q69 oracle. A production deployment swaps in the full
#: PSL snapshot — the expression shape is unchanged (the list becomes a
#: broadcast dim if it outgrows a literal IN).
MULTI_LABEL_SUFFIXES = ["co.uk", "org.uk", "ac.uk", "com.au", "co.jp", "co.in"]

#: frozen keep-rule thresholds (RefinedWeb-flavored, integer units)
MAX_SUBDOMAIN_DEPTH = 3
MAX_PATH_DEPTH = 8
MAX_HOST_DIGIT_BP = 4000  # 40% digits in the hostname
MAX_URL_LEN = 200


def registered_domain(host: Column) -> Column:
    """eTLD+1 under the frozen suffix subset: last 3 labels when the
    last 2 form a known multi-label suffix, else last 2, else the host
    itself. ``F.get`` (0-based, null on out-of-range) rather than
    ``element_at`` — negative out-of-bounds indexes THROW under ANSI."""
    ls = F.split(host, r"\.")
    n = F.size(ls)
    last2 = F.concat_ws(".", F.get(ls, n - 2), F.get(ls, n - 1))
    last3 = F.concat_ws(".", F.get(ls, n - 3), F.get(ls, n - 2), F.get(ls, n - 1))
    return (
        F.when((n >= 3) & last2.isin(MULTI_LABEL_SUFFIXES), last3)
        .when(n >= 2, last2)
        .otherwise(host)
    )


def _count_char(s: Column, ch: str) -> Column:
    return (F.length(s) - F.length(F.regexp_replace(s, f"[{ch}]", ""))).cast("int")


def url_quality_features(
    frontier: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Per-URL structural features + blocklist flag + keep decision.

    ``blocklist`` is a 1-column DataFrame of registered domains; it is
    broadcast (never shuffled against the frontier). All other columns
    are a pure projection over the frontier scan.
    """
    url = F.col(url_col)
    host = urlkit.host(url)
    path = F.coalesce(
        F.regexp_extract(url, r"^[a-z]+://[^/?#]+(/[^?#]*)", 1), F.lit("")
    )
    query = F.coalesce(F.regexp_extract(url, r"\?([^#]*)", 1), F.lit(""))
    rd = registered_domain(host)
    feats = frontier.select(
        url.alias("url"),
        host.alias("host"),
        rd.alias("reg_domain"),
        # labels beyond the registered domain
        (
            _count_char(host, ".") - _count_char(rd, ".")
        ).alias("subdomain_depth"),
        _count_char(path, "/").alias("path_depth"),
        F.when(query == "", F.lit(0))
        .otherwise(_count_char(query, "&") + F.lit(1))
        .cast("int")
        .alias("n_params"),
        (
            (F.length(host) - F.length(F.regexp_replace(host, "[0-9]", "")))
            * F.lit(10000)
        ).cast("long").alias("_dig10k"),
        F.length(url).cast("int").alias("url_len"),
    ).withColumn(
        # integer DIV: exact in both engines (float-immunity rule)
        "host_digit_bp",
        F.expr("CAST(_dig10k DIV length(host) AS INT)"),
    ).drop("_dig10k")
    bl = F.broadcast(blocklist.select(F.col(blocklist.columns[0]).alias("reg_domain")).withColumn("blocked", F.lit(True)))
    out = feats.join(bl, "reg_domain", "left").withColumn(
        "blocked", F.coalesce(F.col("blocked"), F.lit(False))
    )
    keep = (
        (~F.col("blocked"))
        & (F.col("subdomain_depth") <= MAX_SUBDOMAIN_DEPTH)
        & (F.col("path_depth") <= MAX_PATH_DEPTH)
        & (F.col("host_digit_bp") < MAX_HOST_DIGIT_BP)
        & (F.col("url_len") <= MAX_URL_LEN)
    )
    return out.withColumn("keep", keep).select(
        "url",
        "host",
        "reg_domain",
        "subdomain_depth",
        "path_depth",
        "n_params",
        "host_digit_bp",
        "url_len",
        "blocked",
        "keep",
    )
