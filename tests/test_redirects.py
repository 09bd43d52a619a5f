"""resolve_redirects — pointer-doubling chain resolution: exactness vs
a sequential walk, irregular chain shapes, cycle/over-depth failure."""

import pytest

from outage_data_scraper_spark.frontier.redirects import resolve_redirects


def _walk(edges, node):
    nxt = dict(edges)
    hops = 0
    cur = node
    while cur in nxt:
        cur = nxt[cur]
        hops += 1
        if hops > 10_000:
            raise RuntimeError("cycle")
    return cur, hops


def test_resolve_matches_sequential_walk(spark):
    # irregular chains: the q100 law (src -> src-1-(src%3), terminal at
    # multiples of 13) produces chain lengths 1..~15
    edges = [
        (i, i - 1 - (i % 3))
        for i in range(500)
        if i % 13 != 0 and i - 1 - (i % 3) >= 0
    ]
    df = spark.createDataFrame(edges, "src long, dst long").repartition(8)
    got = {r.node: (r.terminal, r.hops) for r in resolve_redirects(df).collect()}
    assert len(got) == len(edges)
    for src, _ in edges:
        assert got[src] == _walk(edges, src), f"src={src}"


def test_resolve_long_chain_within_budget(spark):
    # one 15-hop chain resolves with max_hops=16 (4 doubling rounds)
    chain = [(i, i + 1) for i in range(15)]
    df = spark.createDataFrame(chain, "src long, dst long")
    got = {r.node: (r.terminal, r.hops) for r in resolve_redirects(df, max_hops=16).collect()}
    assert got[0] == (15, 15)
    assert got[14] == (15, 1)


def test_resolve_rejects_cycles_and_overdepth(spark):
    cyc = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], "src long, dst long")
    with pytest.raises(ValueError, match="cycle"):
        resolve_redirects(cyc, max_hops=8)
    deep = spark.createDataFrame([(i, i + 1) for i in range(30)], "src long, dst long")
    with pytest.raises(ValueError, match="max_hops"):
        resolve_redirects(deep, max_hops=8)
    with pytest.raises(ValueError):
        resolve_redirects(cyc, max_hops=0)
