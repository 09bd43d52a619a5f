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
