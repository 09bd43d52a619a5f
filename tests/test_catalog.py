"""Snapshot catalog: append / overwrite / time travel / rollback."""

from outage_data_scraper_spark.catalog import SnapshotCatalog


def _df(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "x int")


def test_append_and_time_travel(spark, tmp_catalog_dir):
    cat = SnapshotCatalog(tmp_catalog_dir)
    s1 = cat.write("t", _df(spark, [1, 2]))
    s2 = cat.write("t", _df(spark, [3]))
    assert sorted(r.x for r in cat.read(spark, "t").collect()) == [1, 2, 3]
    assert sorted(r.x for r in cat.read(spark, "t", snapshot=s1).collect()) == [1, 2]
    assert cat.current_snapshot_id("t") == s2


def test_overwrite_resets_state(spark, tmp_catalog_dir):
    cat = SnapshotCatalog(tmp_catalog_dir)
    cat.write("t", _df(spark, [1, 2]))
    cat.write("t", _df(spark, [9]), mode="overwrite")
    cat.write("t", _df(spark, [10]))
    assert sorted(r.x for r in cat.read(spark, "t").collect()) == [9, 10]


def test_rollback_drops_newer_snapshots(spark, tmp_catalog_dir):
    cat = SnapshotCatalog(tmp_catalog_dir)
    s1 = cat.write("t", _df(spark, [1]), wave=1)
    cat.write("t", _df(spark, [2]), wave=2)
    cat.rollback("t", s1)
    assert [r.x for r in cat.read(spark, "t").collect()] == [1]
    assert cat.last_wave("t") == 1


def test_compact_preserves_state_and_prunes_snapshots(spark, tmp_catalog_dir):
    cat = SnapshotCatalog(tmp_catalog_dir)
    for i in range(4):
        cat.write("t", _df(spark, [i]))
    before = sorted(r.x for r in cat.read(spark, "t").collect())
    cat.compact(spark, "t")
    assert sorted(r.x for r in cat.read(spark, "t").collect()) == before
    assert len(cat.snapshots("t")) == 1
    # appends continue normally after compaction
    cat.write("t", _df(spark, [9]))
    assert sorted(r.x for r in cat.read(spark, "t").collect()) == before + [9]


def test_compact_default_wave_is_last_wave(spark, tmp_catalog_dir):
    """Regression: an unstamped (wave=None) compaction snapshot would be
    rolled back by Crawler.resume() — deleting the table's only data."""
    cat = SnapshotCatalog(tmp_catalog_dir)
    cat.write("t", _df(spark, [1]), wave=1)
    cat.write("t", _df(spark, [2]), wave=2)
    cat.compact(spark, "t")
    assert cat.snapshots("t")[-1]["wave"] == 2
    assert cat.last_wave("t") == 2
    # resume()-style rollback to the last committed wave keeps the data
    keep = [s["id"] for s in cat.snapshots("t") if s.get("wave") is not None and s["wave"] <= 2]
    cat.rollback("t", max(keep))
    assert sorted(r.x for r in cat.read(spark, "t").collect()) == [1, 2]


def test_compact_keeps_partition_spec(spark, tmp_catalog_dir):
    cat = SnapshotCatalog(tmp_catalog_dir)
    df = spark.createDataFrame([(1, "a"), (2, "b")], "x int, p string")
    cat.write("t", df, partition_by=["p"])
    cat.write("t", spark.createDataFrame([(3, "a")], "x int, p string"), partition_by=["p"])
    cat.compact(spark, "t")
    assert cat.snapshots("t")[-1]["partition_by"] == ["p"]
    got = {(r.x, r.p) for r in cat.read(spark, "t").collect()}
    assert got == {(1, "a"), (2, "b"), (3, "a")}
