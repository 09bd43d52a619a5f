"""Host-level mirror detection (frontier/mirrors.py)."""

from pyspark.sql import functions as F

from outage_data_scraper_spark.frontier.mirrors import detect_mirrors


def _pages(spark, rows):
    return spark.createDataFrame(rows, "host string, sig string")


def test_planted_mirror_pair(spark):
    """Two hosts sharing 3 of their pages pair up with exact counts and
    basis-point containment of the SMALLER set; an unrelated host with
    nothing shared never appears."""
    rows = (
        [("a", f"s{i}") for i in range(4)]          # a: s0..s3
        + [("b", f"s{i}") for i in range(1, 4)]     # b: s1..s3 (3 shared)
        + [("b", "bx")]
        + [("c", "c0"), ("c", "c1")]                # c: disjoint
    )
    got = detect_mirrors(_pages(spark, rows), min_shared=2, max_df=8).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.host_a, r.host_b) == ("a", "b")
    assert (r.n_shared, r.n_a, r.n_b) == (3, 4, 4)
    assert r.containment_bp == (10000 * 3) // 4


def test_boilerplate_df_cut_numerator_not_denominator(spark):
    """A signature on every host is dropped from the PAIR evidence
    (df > max_df) but still counts in each host's set size."""
    rows = []
    for h in ("a", "b", "c", "d"):
        rows.append((h, "common"))
    rows += [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")]
    got = detect_mirrors(_pages(spark, rows), min_shared=2, max_df=2).collect()
    assert len(got) == 1
    r = got[0]
    # shared = {x, y} only; sizes include 'common'
    assert (r.n_shared, r.n_a, r.n_b) == (2, 3, 3)
    assert r.containment_bp == (10000 * 2) // 3
    # with the cut disabled, 'common' would push every pair over
    # min_shared — 6 pairs instead of 1
    loose = detect_mirrors(_pages(spark, rows), min_shared=1, max_df=99).collect()
    assert len(loose) == 6


def test_min_shared_threshold_and_duplicate_pages(spark):
    """Duplicate (host, sig) rows collapse before counting; pairs under
    min_shared are dropped."""
    rows = [("a", "x"), ("a", "x"), ("b", "x"), ("a", "y"), ("b", "z")]
    assert detect_mirrors(_pages(spark, rows), min_shared=2, max_df=8).count() == 0
    got = detect_mirrors(_pages(spark, rows), min_shared=1, max_df=8).collect()
    assert len(got) == 1 and got[0].n_shared == 1


def test_full_mirror_containment_10000(spark):
    """A host whose whole set lives on a bigger host reads 10000 bp."""
    rows = [("big", f"s{i}") for i in range(6)] + [
        ("small", "s0"), ("small", "s1"), ("small", "s2")
    ]
    r = detect_mirrors(_pages(spark, rows), min_shared=3, max_df=8).collect()[0]
    assert (r.host_a, r.host_b) == ("big", "small")
    assert (r.n_shared, r.n_a, r.n_b, r.containment_bp) == (3, 6, 3, 10000)
