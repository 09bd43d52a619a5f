"""Crawl-trap detection: template squashing law, threshold behavior,
approx mode, and broadcast enforcement."""

import pytest

from pyspark.sql import functions as F

from outage_data_scraper_spark.frontier.traps import (
    detect_traps,
    filter_trapped,
    url_template,
)
from outage_data_scraper_spark.plans.explain import assert_broadcast_join


def test_url_template_squashes_digits_and_query_values(spark):
    cases = {
        "https://ex.com/page/123": "https://ex.com/page/N",
        "https://ex.com/2024/01/05/post-99": "https://ex.com/N/N/N/post-N",
        "https://ex.com/s?q=hello&page=7": "https://ex.com/s?q=V&page=V",
        "https://ex.com/cal?d=2024-01-05#frag": "https://ex.com/cal?d=V",
        "HTTPS://EX.com:8080/A9b": "https://ex.com:8080/ANb",
        "https://ex.com": "https://ex.com",
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = {r.url: r.t for r in df.select("url", url_template(F.col("url")).alias("t")).collect()}
    assert got == cases


def test_detect_traps_flags_unbounded_not_bounded(spark):
    # one host mints 150 session URLs under one template; a bounded
    # section cycles 40 pages many times over; a second host is quiet
    rows = (
        [(f"https://trap.com/session/{i}?sid={i}",) for i in range(150)]
        + [(f"https://trap.com/page/{i % 40}",) for i in range(300)]
        + [(f"https://ok.com/page/{i % 40}",) for i in range(200)]
    )
    urls = spark.createDataFrame(rows, "url string").repartition(8)
    traps = detect_traps(urls, min_distinct=100).collect()
    assert len(traps) == 1
    t = traps[0]
    assert t.host == "trap.com"
    assert t.template == "https://trap.com/session/N?sid=V"
    assert t.n_urls == 150
    # approx mode finds the same shape (HLL count within 5% rsd)
    at = detect_traps(urls, min_distinct=100, approx=True).collect()
    assert [(r.host, r.template) for r in at] == [("trap.com", "https://trap.com/session/N?sid=V")]
    assert abs(at[0].n_urls - 150) <= 15
    with pytest.raises(ValueError):
        detect_traps(urls, min_distinct=0)


def test_filter_trapped_drops_only_trap_shape(spark):
    rows = (
        [(f"https://trap.com/session/{i}?sid={i}",) for i in range(120)]
        + [(f"https://trap.com/page/{i}",) for i in range(30)]
        + [("https://ok.com/session/1?sid=1",)]  # same shape, other host
    )
    urls = spark.createDataFrame(rows, "url string")
    traps = detect_traps(urls, min_distinct=100)
    kept = filter_trapped(urls, traps)
    assert_broadcast_join(kept)
    got = [r.url for r in kept.collect()]
    assert len(got) == 31
    assert all("trap.com/session" not in u for u in got)
    assert "https://ok.com/session/1?sid=1" in got
