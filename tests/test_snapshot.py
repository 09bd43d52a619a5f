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
