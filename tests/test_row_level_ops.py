"""Row-level MERGE (keyed upsert) and DELETE on the Iceberg-layout
table: copy-on-write scoped to the affected partitions only, MVCC
snapshots, and SQL three-valued delete semantics."""

import os

from pyspark.sql import functions as F

from lambdo_spark.sources.iceberg_layout import IcebergLayoutTable


def _mk(spark, parts=(0, 604800, 1209600), n=30):
    rows = []
    for p in parts:
        for i in range(n):
            rows.append((f"u{i % 5}", p + i * 60, float(i), p))
    return spark.createDataFrame(
        rows, "url string, bucket_s bigint, v double, part bigint"
    )


def test_merge_upsert_updates_and_inserts(spark, tmp_path):
    t = IcebergLayoutTable(str(tmp_path / "t"))
    base = _mk(spark)
    t.write_tier(base)
    # update 3 rows in part 0, insert 2 new keys in part 604800
    delta = spark.createDataFrame(
        [
            ("u0", 0, 99.0, 0),
            ("u1", 60, 98.0, 0),
            ("u2", 120, 97.0, 0),
            ("zz", 604800, 1.0, 604800),
            ("zz", 604860, 2.0, 604800),
        ],
        "url string, bucket_s bigint, v double, part bigint",
    )
    snap = t.merge_rows(delta, keys=["url", "bucket_s"])
    assert sorted(snap["new_parts"]) == ["0", "604800"]
    back = t.read_tier(spark)
    assert back.count() == base.count() + 2
    assert back.where("url='u0' and bucket_s=0").first()["v"] == 99.0
    assert back.where("url='zz'").count() == 2
    # untouched partition kept its version (no rewrite)
    assert t.part_versions()["1209600"] == 0


def test_merge_into_new_partition_and_empty_table(spark, tmp_path):
    t = IcebergLayoutTable(str(tmp_path / "t"))
    delta = _mk(spark, parts=(0,), n=5)
    t.merge_rows(delta, keys=["url", "bucket_s"])  # merge into empty = write
    assert t.read_tier(spark).count() == 5
    # merge a brand-new partition: pure insert
    t.merge_rows(_mk(spark, parts=(604800,), n=4), keys=["url", "bucket_s"])
    assert t.read_tier(spark).count() == 9


def test_merge_preserves_mvcc_reader_isolation(spark, tmp_path):
    t = IcebergLayoutTable(str(tmp_path / "t"))
    base = _mk(spark, parts=(0,))
    t.write_tier(base)
    s0 = t.current_snapshot()["snapshot_id"]
    delta = base.limit(3).withColumn("v", F.lit(-1.0))
    t.merge_rows(delta, keys=["url", "bucket_s"])
    # old snapshot still reads pre-merge values
    old = t.read_tier(spark, snapshot_id=s0)
    assert old.where("v = -1.0").count() == 0
    assert t.read_tier(spark).where("v = -1.0").count() == 3


def test_delete_where_rewrites_only_matching_parts(spark, tmp_path):
    t = IcebergLayoutTable(str(tmp_path / "t"))
    base = _mk(spark)
    t.write_tier(base)
    v0 = dict(t.part_versions())
    snap = t.delete_where(spark, "part = 0 and url = 'u0'")
    assert snap["new_parts"] == ["0"]
    back = t.read_tier(spark)
    assert back.where("part = 0 and url = 'u0'").count() == 0
    assert back.count() == base.count() - base.where("part=0 and url='u0'").count()
    # non-matching partitions kept their versions
    assert t.part_versions()["604800"] == v0["604800"]
    assert t.part_versions()["1209600"] == v0["1209600"]


def test_delete_where_null_predicate_keeps_rows(spark, tmp_path):
    """DELETE three-valued logic: rows where the predicate is NULL are
    NOT deleted."""
    t = IcebergLayoutTable(str(tmp_path / "t"))
    df = spark.createDataFrame(
        [("a", 1, 1.0, 0), ("b", 2, None, 0), ("c", 3, 9.0, 0)],
        "url string, bucket_s bigint, v double, part bigint",
    )
    t.write_tier(df)
    t.delete_where(spark, "v > 5")
    back = t.read_tier(spark)
    assert {r["url"] for r in back.collect()} == {"a", "b"}  # NULL row kept


def test_delete_where_no_match_is_noop(spark, tmp_path):
    t = IcebergLayoutTable(str(tmp_path / "t"))
    t.write_tier(_mk(spark, parts=(0,)))
    s0 = t.current_snapshot()["snapshot_id"]
    snap = t.delete_where(spark, "url = 'nope'")
    assert snap["snapshot_id"] == s0  # no new snapshot committed


def test_delete_with_prune_uses_file_stats(spark, tmp_path):
    t = IcebergLayoutTable(str(tmp_path / "t"), sort_order=("url", "bucket_s"))
    base = _mk(spark)
    t.write_tier(base)
    snap = t.delete_where(
        spark, "bucket_s < 120", prune={"bucket_s": (None, 119)}
    )
    # only partitions actually containing bucket_s < 120 were rewritten
    assert snap["new_parts"] == ["0"]
    assert t.read_tier(spark).count() == base.where("bucket_s >= 120").count()


def test_merge_after_rename_uses_current_names(spark, tmp_path):
    """Merge against a renamed table: base files written under the old
    name normalize to the current schema before the key-join."""
    t = IcebergLayoutTable(str(tmp_path / "t"))
    t.write_tier(_mk(spark, parts=(0,)))
    t.rename_column("v", "value")
    delta = spark.createDataFrame(
        [("u0", 0, 50.0, 0)], "url string, bucket_s bigint, value double, part bigint"
    )
    t.merge_rows(delta, keys=["url", "bucket_s"])
    back = t.read_tier(spark)
    assert back.where("url='u0' and bucket_s=0").first()["value"] == 50.0
    assert "v" not in back.columns


def test_merge_then_read_changes_shows_row_deltas(spark, tmp_path):
    t = IcebergLayoutTable(str(tmp_path / "t"))
    base = _mk(spark, parts=(0,), n=6)
    t.write_tier(base)
    s0 = t.current_snapshot()["snapshot_id"]
    delta = spark.createDataFrame(
        [("u0", 0, 42.0, 0)], "url string, bucket_s bigint, v double, part bigint"
    )
    t.merge_rows(delta, keys=["url", "bucket_s"])
    ch = t.read_changes(spark, s0)
    ins = {(r["url"], r["bucket_s"], r["v"]) for r in ch.where("_change='insert'").collect()}
    dels = {(r["url"], r["bucket_s"], r["v"]) for r in ch.where("_change='delete'").collect()}
    assert ins == {("u0", 0, 42.0)}
    assert dels == {("u0", 0, 0.0)}
