"""Linked synthetic-web family (ccl): renderer/parser children parity,
two-hop depth cap, registry routing, and the zero-join host-edge
projection the PageRank-reprioritized crawl soak runs on."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from outage_data_scraper_spark.parsers.families import parse_cc, parse_ccl
from outage_data_scraper_spark.parsers.registry import family_for
from outage_data_scraper_spark.sources.fixtures import (
    ccl_child_urls,
    render,
    render_ccl,
)


def _seed(s: int, rank: int = 3, hosts: int = 50) -> str:
    return f"https://h{rank}.synth-utility.net/outages/{s}/w{hosts}/"


def test_ccl_children_renderer_parser_parity_and_order():
    found_linked = 0
    for s in range(200):
        url = _seed(s)
        want = ccl_child_urls(url)
        _rec, got, text = parse_ccl(render_ccl(url))
        assert got == want  # discovery order, visited-deduped
        assert text and "<" not in text
        if want:
            found_linked += 1
            for c in want:
                assert c.startswith("https://h") and c.endswith("/w50/")
                assert "/ln1/3/" in c  # path embeds the parent host rank
    # the 1/8 outlink gate: some but not most seeds link out
    assert 5 <= found_linked <= 60


def test_ccl_two_hop_depth_cap():
    hop1 = []
    for s in range(400):
        hop1.extend(ccl_child_urls(_seed(s)))
    assert hop1
    hop2 = []
    for u in hop1:
        for g in ccl_child_urls(u):
            assert "/ln2/" in g
            hop2.append(g)
            assert ccl_child_urls(g) == []  # second hop never links out
    # ln1 gate is 1/4 so a 2-hop tail exists but stays bounded
    assert 0 < len(hop2) < len(hop1) * 3


def test_ccl_text_matches_cc_body_plus_anchors():
    # same URL through both renderers: ccl adds only the xlink anchors'
    # text; deterministic across calls (byte-identical invariant)
    for s in range(40):
        url = _seed(s, rank=1)
        _, _, cc_text = parse_cc(render_ccl(url).replace(b'class="xlink"', b""))
        _r1, k1, t1 = parse_ccl(render_ccl(url))
        _r2, k2, t2 = parse_ccl(render_ccl(url))
        assert t1 == t2 and k1 == k2
        n_links = len(ccl_child_urls(url))
        # each anchor contributes one 'ref' token to the stripped text
        assert t1.count("ref") >= n_links


def test_ccl_registry_routing():
    assert family_for("cc", "1") == "ccl"
    url = _seed(7)
    payload = render(url, "ccl")
    rec, kids, text = parse_ccl(payload)
    assert rec["per_page"][0]["n_tokens"] == len(text.split())
    assert kids == ccl_child_urls(url)


def test_ccl_host_edges_zero_join_projection(spark):
    from outage_data_scraper_spark.operators.graph import ccl_host_edges

    rows = [
        ("https://h5.synth-utility.net/ln1/3/123456/w50/", "h5.synth-utility.net"),
        ("https://h0.synth-utility.net/ln2/5/999/w50/", "h0.synth-utility.net"),
        ("https://h2.synth-utility.net/outages/9/w50/", "h2.synth-utility.net"),
        ("https://example.com/other", "example.com"),
    ]
    frontier = spark.createDataFrame(rows, "url string, host string")
    edges = ccl_host_edges(frontier)
    got = {(r.src, r.dst) for r in edges.collect()}
    assert got == {
        ("h3.synth-utility.net", "h5.synth-utility.net"),
        ("h5.synth-utility.net", "h0.synth-utility.net"),
    }
    # pure narrow projection: no exchange, no join in the plan
    plan = edges._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan


def test_ccl_mini_crawl_discovers_and_reprioritizes(spark, tmp_path):
    """End-to-end: a ccl crawl discovers cross-host children, the host
    graph projects from the frontier, and a rank overwrite changes the
    next wave's pop order toward high-rank hosts."""
    from outage_data_scraper_spark.catalog import SnapshotCatalog
    from outage_data_scraper_spark.frontier.crawler import Crawler
    from outage_data_scraper_spark.operators.graph import (
        ccl_host_edges,
        pagerank_micro,
        reprioritize_frontier,
    )
    from outage_data_scraper_spark.sources.fixtures import make_fixture_fetcher
    from outage_data_scraper_spark.sources.seeds import synthetic_seeds

    cat = SnapshotCatalog(str(tmp_path / "ccl_crawl"))
    c = Crawler(
        spark, cat, make_fixture_fetcher,
        per_host_k=3, num_parts=8, seen_mode="bloom", simulated_clock=True,
        wave_budget=15,  # budgeted crawl: priority DECIDES who makes a wave
    )
    c.bootstrap(synthetic_seeds(spark, 600, 20, family="ccl"))
    ws1 = c.run_wave(1)
    assert ws1.failed == 0 and ws1.popped == 15

    frontier = c.frontier()
    edges = ccl_host_edges(frontier)
    assert edges.count() == ws1.children  # every child row is one edge
    nodes = frontier.select(F.col("host").alias("node")).distinct()
    ranks = pagerank_micro(edges, nodes, n_iter=3).localCheckpoint(eager=True)
    cat.write(
        "frontier", reprioritize_frontier(frontier, ranks),
        mode="overwrite", wave=c.last_committed_wave(),
    )
    ws2 = c.run_wave(2)
    assert ws2.failed == 0 and ws2.popped == 15
    # records == fetches, still no duplicate fetch after the overwrite
    fl = cat.read(spark, "fetch_log")
    assert fl.count() == ws1.popped + ws2.popped
    assert fl.groupBy("url").count().filter(F.col("count") > 1).count() == 0
    # budget + rank feedback: wave 2's 15 slots go to the TOP-RANKED
    # hosts (≤5 hosts at k=3), and their mean rank beats the host-space
    # average — the reprioritization steers the crawl, not just orders it
    by_rank = sorted(
        ((r.rank_micro, r.node) for r in ranks.collect()), reverse=True
    )
    rmap = {n: rk for rk, n in by_rank}
    # ties share a rank value, so cut by the 10th-highest VALUE
    thresh = by_rank[min(9, len(by_rank) - 1)][0]
    w2_hosts = {
        r.node
        for r in fl.filter(F.col("wave") == 2)
        .select(F.expr("parse_url(url, 'HOST')").alias("node"))
        .collect()
    }
    assert all(rmap[h] >= thresh for h in w2_hosts), (sorted(w2_hosts), by_rank[:12])
    base = sum(rmap.values()) / len(rmap)
    w2_mean = sum(rmap[h] for h in w2_hosts) / len(w2_hosts)
    assert w2_mean > base


def test_lazy_host_priorities_match_frontier_overwrite(spark, tmp_path):
    """set_host_priorities (lazy broadcast at pop time — no frontier
    rewrite) must pop EXACTLY the URLs the eager reprioritize+overwrite
    path pops, wave for wave."""
    from outage_data_scraper_spark.catalog import SnapshotCatalog
    from outage_data_scraper_spark.frontier.crawler import Crawler
    from outage_data_scraper_spark.operators.graph import (
        ccl_host_edges,
        pagerank_micro,
        reprioritize_frontier,
    )
    from outage_data_scraper_spark.sources.fixtures import make_fixture_fetcher
    from outage_data_scraper_spark.sources.seeds import synthetic_seeds

    def crawl(name, apply_ranks):
        cat = SnapshotCatalog(str(tmp_path / name))
        c = Crawler(
            spark, cat, make_fixture_fetcher,
            per_host_k=3, num_parts=8, seen_mode="bloom",
            simulated_clock=True, wave_budget=15,
        )
        c.bootstrap(synthetic_seeds(spark, 600, 20, family="ccl"))
        c.run_wave(1)
        frontier = c.frontier()
        ranks = pagerank_micro(
            ccl_host_edges(frontier),
            frontier.select(F.col("host").alias("node")).distinct(),
            n_iter=3,
        ).localCheckpoint(eager=True)
        apply_ranks(c, cat, frontier, ranks)
        c.run_wave(2)
        fl = cat.read(spark, "fetch_log")
        return {r.url for r in fl.filter(F.col("wave") == 2).select("url").collect()}

    eager = crawl(
        "eager",
        lambda c, cat, fr, ranks: cat.write(
            "frontier", reprioritize_frontier(fr, ranks),
            mode="overwrite", wave=c.last_committed_wave(),
        ),
    )
    lazy = crawl("lazy", lambda c, cat, fr, ranks: c.set_host_priorities(ranks))
    assert eager == lazy and len(eager) == 15
