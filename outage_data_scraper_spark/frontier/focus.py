"""Focused-crawl priority (Chakrabarti, van den Berg & Dom 1999;
shark-search, Hersovici et al. 1998).

A topical crawl cannot afford breadth-first: it scores every candidate
URL from the evidence available BEFORE fetching it — how relevant its
parent pages are (inherited score, decayed) and whether the anchor text
pointing at it mentions the topic. The reference crawls a fixed seed
list and needs neither; this is the steering layer that turns the
engine's budgeted frontier (priority.pop_wave) into a topical crawler:
the output column plugs straight into the frontier's ``priority`` (as a
negated rank, the same wiring operators/graph.reprioritize_frontier
uses for PageRank).

All-integer scoring (micro-units, DIV on the non-negative domain) so
the priority table is value-gatable cross-engine — and order-stable
under retries, which float scoring is not.

Scale shape: one edge-relation pass — links join the node-sized parent
score table on src (the corpus-scale hash join; AQE skew handles hub
parents), anchor hits are a per-row projection, and the per-dst max is
a map-side-combined aggregate. No window, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def focused_priority(
    links: DataFrame,
    page_scores: DataFrame,
    query_terms: list[str],
    inherit_bp: int = 8500,
    anchor_bonus_micro: int = 250_000,
    src: str = "src",
    dst: str = "dst",
    anchor: str = "anchor",
    score: str = "score_micro",
) -> DataFrame:
    """Per candidate URL: the best in-link's evidence —

        contrib = (parent_score_micro · inherit_bp) DIV 10000
                  + anchor_hits · anchor_bonus_micro

    where anchor_hits counts the DISTINCT query terms present in that
    link's anchor tokens (each term scores once — a spammy
    "spark spark spark" anchor earns no more than one mention).
    Returns (dst, n_inlinks, priority_micro = max contrib) — shark
    search's best-evidence rule: one strong recommendation beats many
    weak ones, and max (unlike sum) cannot be inflated by minting
    in-links. Parents missing from ``page_scores`` contribute anchor
    evidence only (score coalesced to 0: unscored ≠ forbidden)."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    toks = F.split(F.lower(F.col(anchor)), " ")
    hits: F.Column | None = None
    for t in query_terms:
        h = F.array_contains(toks, t.lower()).cast("long")
        hits = h if hits is None else hits + h
    # a NULL anchor must not null the whole contrib (r8 advisor
    # finding: a dst whose in-links all had NULL anchors returned a
    # NULL priority while n_inlinks still counted them) — NULL-anchor
    # links contribute inherited-score evidence only
    hits = F.coalesce(hits, F.lit(0))
    scored = links.join(
        page_scores.select(
            F.col("node").alias("__src"), F.col(score).alias("__sc")
        ),
        F.col(src) == F.col("__src"),
        "left",
    ).select(
        F.col(dst).alias("dst"),
        (
            F.expr(f"(coalesce(__sc, 0) * {int(inherit_bp)}) DIV 10000")
            + hits * F.lit(int(anchor_bonus_micro))
        ).alias("__contrib"),
    )
    return scored.groupBy("dst").agg(
        F.count(F.lit(1)).cast("long").alias("n_inlinks"),
        F.max("__contrib").cast("long").alias("priority_micro"),
    )
