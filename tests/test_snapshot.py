"""snapshot_diff: four-way status law over two (key, sig) snapshots."""

from outage_data_scraper_spark.frontier.snapshot import (
    snapshot_diff,
    snapshot_diff_stats,
)


def test_snapshot_diff_statuses(spark):
    old = spark.createDataFrame(
        [("u1", "s1"), ("u2", "s2"), ("u3", "s3")], "k string, sig string"
    )
    new = spark.createDataFrame(
        [("u1", "s1"), ("u2", "sX"), ("u4", "s4")], "k string, sig string"
    )
    rows = {r.k: r for r in snapshot_diff(old, new, "k", "sig").collect()}
    assert rows["u1"].status == "unchanged"
    assert rows["u2"].status == "changed"
    assert rows["u3"].status == "gone" and rows["u3"].new_sig is None
    assert rows["u4"].status == "new" and rows["u4"].old_sig is None
    assert set(rows) == {"u1", "u2", "u3", "u4"}
    stats = {
        r.status: r.n_keys
        for r in snapshot_diff_stats(
            snapshot_diff(old, new, "k", "sig")
        ).collect()
    }
    assert stats == {"unchanged": 1, "changed": 1, "gone": 1, "new": 1}


def test_snapshot_diff_empty_sides(spark):
    e = spark.createDataFrame([], "k string, sig string")
    one = spark.createDataFrame([("u1", "s1")], "k string, sig string")
    assert snapshot_diff(e, one, "k", "sig").collect()[0].status == "new"
    assert snapshot_diff(one, e, "k", "sig").collect()[0].status == "gone"
    assert snapshot_diff(e, e, "k", "sig").count() == 0


def test_capture_index_transitions_and_tie_law(spark):
    """Transitions count digest CHANGES in (ts, digest) order; equal-ts
    captures tie-break on the digest string; latest digest is the max
    (ts, digest) struct; first/last in epoch micros."""
    from pyspark.sql import functions as F

    from outage_data_scraper_spark.frontier.snapshot import capture_index

    rows = [
        ("u", "2024-01-01 00:00:00", "a"),
        ("u", "2024-01-01 00:00:01", "a"),   # no change
        ("u", "2024-01-01 00:00:02", "b"),   # change 1
        ("u", "2024-01-01 00:00:02", "a"),   # same ts: orders a,b -> a@02 is change 2 (b@01? no)
        ("v", "2024-01-01 00:00:00", "x"),
    ]
    caps = spark.createDataFrame(rows, "url string, ts string, digest string")
    caps = caps.select("url", F.col("ts").cast("timestamp_ntz").alias("ts"), "digest")
    got = {r.url: r for r in capture_index(caps).collect()}
    u = got["u"]
    # order for u: a@0, a@1, (a@2, b@2 by digest tie) -> seq a,a,a,b: 1 change
    assert (u.n_captures, u.n_digests, u.n_changes) == (4, 2, 1)
    assert u.last_digest == "b"
    assert u.last_us - u.first_us == 2_000_000
    v = got["v"]
    assert (v.n_captures, v.n_digests, v.n_changes, v.last_digest) == (1, 1, 0, "x")
