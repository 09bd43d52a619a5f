"""URL-seen set: exact anti-join vs Bloom fast path.

Invariant (SURVEY.md §7.3 Bloom-vs-exact duality): the Bloom path may
suppress extra URLs (false positives) but must never *keep* a URL the
exact path drops — false positives only suppress re-fetches, matching the
reference's `visited` semantics (il_scraper.py:200–204).
"""

from outage_data_scraper_spark.frontier.seen import (
    bloom_from_df,
    filter_unseen_bloom,
    filter_unseen_exact,
)


def _urls(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], "url string")


def test_exact_anti_join(spark):
    cand = _urls(spark, [f"https://h/{i}" for i in range(10)])
    seen = _urls(spark, [f"https://h/{i}" for i in range(0, 10, 2)])
    kept = {r.url for r in filter_unseen_exact(cand, seen).collect()}
    assert kept == {f"https://h/{i}" for i in range(1, 10, 2)}


def test_bloom_no_false_negatives_and_subset_of_exact(spark):
    seen_urls = [f"https://seen.example/{i}" for i in range(2000)]
    cand_urls = seen_urls[:500] + [f"https://new.example/{i}" for i in range(2000)]
    seen = _urls(spark, seen_urls)
    cand = _urls(spark, cand_urls)

    bloom = bloom_from_df(seen, fpp=1e-3)
    kept_bloom = {r.url for r in filter_unseen_bloom(cand, bloom).collect()}
    kept_exact = {r.url for r in filter_unseen_exact(cand, seen).collect()}

    # no false negatives: every seen URL is suppressed
    assert not (kept_bloom & set(seen_urls))
    # bloom keeps a subset of what exact keeps (fp only suppress)
    assert kept_bloom <= kept_exact
    # fpp budget: ≤ 1% of the 2000 new URLs wrongly suppressed
    assert len(kept_exact - kept_bloom) <= 20


def test_bloom_schema_preserved(spark):
    seen = _urls(spark, ["https://a/1"])
    cand = spark.createDataFrame(
        [("https://a/1", 1), ("https://b/2", 2)], "url string, k int"
    )
    bloom = bloom_from_df(seen)
    out = filter_unseen_bloom(cand, bloom)
    assert out.columns == ["url", "k"]
    assert [r.k for r in out.collect()] == [2]
