"""Redirect-chain resolution — the canonical-URL step between fetch
and the seen-set/frontier: a fetched URL that 3xx-redirects must be
keyed by its TERMINAL URL or the frontier re-enqueues every hop of
every chain forever (the reference follows redirects implicitly inside
``requests``/the browser — `app/scraper.py` fetch helpers — so its
seen set is terminal-keyed too; this makes the step explicit and
distributed).

Scale shape: resolving a chain of length h by iterated single-step
joins is h sequential shuffles — unusable when 10^10 URLs carry
15-hop chains. ``resolve_redirects`` uses POINTER DOUBLING: the
map node→(cur, hops) composes with ITSELF each round, so path length
doubles per join and ceil(log2(max_hops)) rounds resolve every chain
(4 joins for 16 hops). Each round localCheckpoints — the iterative-
lineage law (CLAUDE.md): without it Catalyst re-analyzes a 2^k-deep
plan.

Cycles and over-deep chains cannot silently mis-resolve: after the
fixed rounds, any row whose cursor still has an outgoing edge fails
the residual-domain assert (a redirect cycle a→b→a never leaves the
edge domain, so it is always caught).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_redirects(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int = 64,
) -> DataFrame:
    """Resolve every source node to its chain-terminal node.

    ``edges`` holds one redirect hop per row (src_col → dst_col); a
    node with no outgoing edge is terminal. Each src must have at most
    one outgoing edge (HTTP redirects are single-valued).

    Returns (node, terminal, hops) for every node that HAS an outgoing
    edge — callers left-join and coalesce for edge-less nodes. Raises
    if any chain exceeds ``max_hops`` (including any cycle).
    """
    if max_hops <= 0:
        raise ValueError("max_hops must be positive")
    reach = edges.select(
        F.col(src_col).alias("node"),
        F.col(dst_col).alias("cur"),
        F.lit(1).cast("long").alias("hops"),
    )
    rounds = max(1, math.ceil(math.log2(max_hops)))
    for _ in range(rounds):
        nxt = reach.select(
            F.col("node").alias("j_node"),
            F.col("cur").alias("j_cur"),
            F.col("hops").alias("j_hops"),
        )
        reach = (
            reach.join(nxt, reach["cur"] == nxt["j_node"], "left")
            .select(
                "node",
                F.coalesce("j_cur", "cur").alias("cur"),
                (F.col("hops") + F.coalesce("j_hops", F.lit(0))).alias("hops"),
            )
            .localCheckpoint()
        )
    srcs = edges.select(F.col(src_col).alias("cur")).distinct()
    residual = reach.join(srcs, "cur", "left_semi").limit(1).count()
    if residual:
        raise ValueError(
            f"resolve_redirects: chains longer than max_hops={max_hops} "
            "or redirect cycles present"
        )
    return reach.select("node", F.col("cur").alias("terminal"), "hops")
