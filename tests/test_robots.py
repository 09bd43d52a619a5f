"""robots.txt gate: parser, column-algebra matching, crawler integration."""

import json

from pyspark.sql import functions as F

from outage_data_scraper_spark.frontier.robots import parse_robots_txt, robots_gate


def test_parse_robots_txt_groups():
    body = """
    # comment
    User-agent: *
    Disallow: /private/
    Disallow: /tmp/
    Crawl-delay: 2.5

    User-agent: OtherBot
    Disallow: /
    """
    dis, delay = parse_robots_txt(body)
    assert dis == ["/private/", "/tmp/"]
    assert delay == 2.5


def _cands(spark, urls):
    from outage_data_scraper_spark.functions import urlkit

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return df.withColumn("host", urlkit.host(F.col("url")))


def test_robots_gate_rules_and_policies(spark):
    cands = _cands(
        spark,
        [
            "https://a.com/public/x",
            "https://a.com/private/y",
            "https://deny.com/anything",
            "https://unknown.com/z",
        ],
    )
    robots = spark.createDataFrame(
        [
            ("a.com", "2024-08-01 00:00:00", json.dumps(["/private/"]), "rules", 1.0),
            ("deny.com", "2024-08-01 00:00:00", None, "deny", None),
        ],
        "host string, fetched_ts string, rules string, allow_all string, crawl_delay double",
    ).withColumn("fetched_ts", F.to_timestamp("fetched_ts"))
    kept = {r.url for r in robots_gate(cands, robots, default_allow=True).collect()}
    assert kept == {"https://a.com/public/x", "https://unknown.com/z"}
    # default-deny flips unknown hosts
    kept2 = {r.url for r in robots_gate(cands, robots, default_allow=False).collect()}
    assert kept2 == {"https://a.com/public/x"}


def test_crawler_respects_robots_table(spark, tmp_path):
    from outage_data_scraper_spark.catalog import SnapshotCatalog
    from outage_data_scraper_spark.frontier.crawler import Crawler
    from outage_data_scraper_spark.sources.fixtures import make_fixture_fetcher
    from outage_data_scraper_spark.sources.seeds import fixture_miniweb_seeds

    cat = SnapshotCatalog(str(tmp_path / "cat"))
    c = Crawler(spark, cat, make_fixture_fetcher, per_host_k=10, num_parts=8)
    c.bootstrap(fixture_miniweb_seeds(spark))
    robots = spark.createDataFrame(
        [("hot.fixture-utility.com", "2024-08-01 00:00:00", None, "deny", None)],
        "host string, fetched_ts string, rules string, allow_all string, crawl_delay double",
    ).withColumn("fetched_ts", F.to_timestamp("fetched_ts"))
    cat.write("robots", robots)

    c.run(max_waves=10)
    log = c.fetch_log()
    hot = log.filter(F.col("url").contains("hot.fixture-utility"))
    # every hot-host URL was denied by robots (status 451), none fetched
    assert hot.count() > 0
    assert hot.filter(F.col("status") != 451).count() == 0
    assert {r.reason for r in hot.select("reason").distinct().collect()} == {"robots disallow"}
    # other hosts crawled normally
    assert log.filter(F.col("status") == 200).count() > 0

def test_crawl_delay_becomes_rate_override(spark, tmp_path):
    """A robots Crawl-delay maps to that host's token-bucket rate: with a
    simulated clock the per-request wait equals the delay."""
    from outage_data_scraper_spark.frontier.politeness import HostPacer

    p = HostPacer(rate_per_host=100.0, salt=1, sim=True,
                  rate_overrides={"slow.com": 1.0 / 5.0})
    assert p.acquire("slow.com") == 0.0
    assert abs(p.acquire("slow.com") - 5.0) < 1e-9   # Crawl-delay: 5
    assert p.acquire("fast.com") == 0.0
    assert abs(p.acquire("fast.com") - 0.01) < 1e-9  # default rate


def test_robots_gate_carries_crawl_delay(spark):
    cands = _cands(spark, ["https://a.com/x", "https://unknown.com/z"])
    robots = spark.createDataFrame(
        [("a.com", "2024-08-01 00:00:00", None, "allow", 4.0)],
        "host string, fetched_ts string, rules string, allow_all string, crawl_delay double",
    ).withColumn("fetched_ts", F.to_timestamp("fetched_ts"))
    out = {r.url: r.crawl_delay for r in robots_gate(cands, robots).collect()}
    assert out == {"https://a.com/x": 4.0, "https://unknown.com/z": None}


def _wave_df(spark, rows):
    return spark.createDataFrame(
        rows,
        "url string, host string, state string, layout string, emc string, "
        "family string, depth int, event_seq int, seed_seq int, child_seq int, "
        "wave int, salted_part int, rate_override double",
    )


def test_fetch_wave_per_row_rate_override(spark):
    """Crawl-delay joined onto the wave as a column paces the bucket
    per-row — no driver-side host dict (SCALE.md: 10^8 hosts)."""
    from outage_data_scraper_spark.frontier.fetch import fetch_wave

    def wave(host, override):
        rows = [
            (f"https://{host}/{i}", host, "ga", "1", "e", "ga1",
             0, 0, 0, i, 1, 0, override)
            for i in range(3)
        ]
        fetched = fetch_wave(
            _wave_df(spark, rows),
            lambda: (lambda url, fam: (200, None, b"ok")),
            num_parts=1, rate_per_host=100.0, salt=1, simulated_clock=True,
        ).collect()
        return [r.wait_s for r in sorted(fetched, key=lambda r: r.child_seq)]

    slow = wave("slow.com", 1.0 / 5.0)
    assert slow[0] == 0.0
    assert all(abs(w - 5.0) < 1e-9 for w in slow[1:])  # Crawl-delay: 5
    fast = wave("fast.com", None)
    assert all(abs(w - 0.01) < 1e-9 for w in fast[1:])  # default rate


def test_fetch_wave_ordering_law_across_arrow_batches(spark):
    """The crawl-ordering law must hold per PARTITION, not per Arrow
    batch: shrink the batch size so one partition spans several batches
    and assert the fetch order is still globally sorted."""
    from outage_data_scraper_spark.frontier.fetch import fetch_wave

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key, None)
    spark.conf.set(key, "7")
    try:
        rows = [
            (f"https://h.com/{i:03d}", "h.com", "ga", "1", "e", "ga1",
             0, 0, 0, (i * 17) % 40, 1, 0, None)
            for i in range(40)
        ]
        fetched = fetch_wave(
            _wave_df(spark, rows),
            lambda: (lambda url, fam: (200, None, b"ok")),
            num_parts=1, rate_per_host=1e9, salt=1, simulated_clock=True,
        ).collect()
        got = [r.child_seq for r in fetched]
        assert got == sorted(got), "fetch order violated the ordering law"
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def test_fused_fetch_parse_ordering_law_across_arrow_batches(spark):
    """ADVICE r2: the FUSED fetch+parse path (the one bench uses) must
    apply the same whole-partition sort as fetch_wave — a partition
    spanning several Arrow batches must not fall back to batch-local
    order."""
    from outage_data_scraper_spark.parsers.parse import fused_fetch_parse

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key, None)
    spark.conf.set(key, "7")
    try:
        rows = [
            (f"https://h.com/{i:03d}", "h.com", "ga", "1", "e", "ga1",
             0, 0, 0, (i * 17) % 40, 1, 0, None)
            for i in range(40)
        ]
        parsed = fused_fetch_parse(
            _wave_df(spark, rows).drop("rate_override"),
            lambda: (lambda url, fam: (404, "nope", None)),
            num_parts=1, rate_per_host=1e9, salt=1, simulated_clock=True,
        ).collect()
        got = [r.child_seq for r in parsed]
        assert got == sorted(got), "fused path violated the ordering law"
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def test_small_host_paces_at_full_rate_despite_salt(spark):
    """Review r3: the pacer used to divide rate_per_host by the CONFIGURED
    salt even when adaptive lanes put a small host on ONE partition —
    throttling it salt-fold below the politeness budget. pop_wave's
    n_lanes column must drive the divisor: 3 URLs on one lane at 2 req/s
    wait 0.5 s each after the first (not 2.0 s)."""
    from outage_data_scraper_spark.frontier.fetch import fetch_wave
    from outage_data_scraper_spark.frontier.priority import pop_wave, seeds_to_frontier
    from outage_data_scraper_spark.sources.seeds import synthetic_seeds

    frontier = seeds_to_frontier(synthetic_seeds(spark, 3, 1))
    popped = pop_wave(frontier, per_host_k=10, num_parts=8, salt=4)
    assert "n_lanes" in popped.columns
    fetched = fetch_wave(
        popped,
        lambda: (lambda url, fam: (200, None, b"ok")),
        num_parts=8, rate_per_host=2.0, salt=4, simulated_clock=True,
    ).collect()
    waits = sorted(r.wait_s for r in fetched)
    assert waits[0] == 0.0
    assert all(abs(w - 0.5) < 1e-9 for w in waits[1:]), waits


def test_sitemap_directives_extracted_ua_independent():
    from outage_data_scraper_spark.frontier.robots import sitemap_urls

    body = """# comment
User-agent: somebody-else
Disallow: /private
Sitemap: https://a.example.com/sitemap.xml
User-agent: *
Disallow: /tmp
sitemap: https://a.example.com/sitemap-news.xml.gz  # trailing comment
Sitemap:
"""
    assert sitemap_urls(body) == [
        "https://a.example.com/sitemap.xml",
        "https://a.example.com/sitemap-news.xml.gz",
    ]


def test_aggregate_rate_across_lanes_bounded_real_clock(spark):
    """VERDICT r4 item 3 (r3 item 6): a hot host split over L>1 adaptive
    lanes on DIFFERENT partitions must stay <= rate_per_host in
    AGGREGATE, on the real clock — the per-host seriality the reference
    enforces with sleeps between navigations (ga_scraper.py:404,726),
    generalized to parallel lanes each pacing at rate/L.

    60 URLs on one host, lane_cap=30 -> n_lanes=2 (salt=4 configured, so
    the divisor must be the ACTUAL lane count, not salt); rate 60 req/s
    -> 30 req/s per lane. Each fetch stamps time.monotonic() (system-wide
    clock, comparable across the executor processes) into the payload."""
    import time as _time

    from outage_data_scraper_spark.frontier.fetch import fetch_wave
    from outage_data_scraper_spark.frontier.priority import pop_wave, seeds_to_frontier
    from outage_data_scraper_spark.sources.seeds import synthetic_seeds

    frontier = seeds_to_frontier(synthetic_seeds(spark, 60, 1))
    # num_parts=8: the two lane values (salted_part 3 and 4) hash to
    # DISTINCT Spark partitions (3 and 6) under repartition-by-column —
    # at num_parts=4 they collide mod 4, which would test nothing
    popped = pop_wave(frontier, per_host_k=100, num_parts=8, salt=4, lane_cap=30)

    def factory():
        def fetch(url, fam):
            return 200, None, repr(_time.monotonic()).encode()

        return fetch

    rate = 60.0
    fetched = fetch_wave(
        popped, factory, num_parts=8, rate_per_host=rate, salt=4,
        simulated_clock=False,
    ).collect()
    assert len(fetched) == 60
    by_lane: dict[int, list[float]] = {}
    for r in fetched:
        by_lane.setdefault(r.partition_id, []).append(float(bytes(r.html)))
    lanes = len(by_lane)
    assert lanes >= 2, "hot host must actually span multiple partitions"
    # per-lane token-bucket bound: requests in a window w <= 1 + w*rate/L
    for ts in by_lane.values():
        w = max(ts) - min(ts)
        assert len(ts) <= 1 + w * (rate / lanes) * 1.05 + 1e-9, (len(ts), w)
    # aggregate bound across ALL lanes: n <= L bursts + rate * window
    all_ts = [t for ts in by_lane.values() for t in ts]
    window = max(all_ts) - min(all_ts)
    assert len(all_ts) <= lanes + rate * window * 1.05, (len(all_ts), window)
    # and the host was NOT over-throttled (a rate/salt=15 req/s/lane bug
    # would need ~1.9 s; correct pacing finishes each lane in ~0.97 s)
    assert window < 1.6, window
