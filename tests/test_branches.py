"""Branch refs + write-audit-publish on the Iceberg-layout table:
writes staged on a branch are invisible to main until an atomic
fast-forward publish; publish after main advanced is rejected; GC
never collects an unpublished branch's data."""

import pytest

from lambdo_spark.sources.iceberg_layout import (
    ConcurrentWriteConflict,
    IcebergLayoutTable,
)

SCHEMA = "url string, bucket_s bigint, v double, part bigint"


def _mk(spark, n=10, part=0):
    return spark.createDataFrame(
        [(f"u{i % 3}", part + i * 60, float(i), part) for i in range(n)], SCHEMA
    )


def test_write_audit_publish_flow(spark, tmp_path):
    root = str(tmp_path / "t")
    t = IcebergLayoutTable(root)
    t.write_tier(_mk(spark))
    t.create_branch("audit")
    tb = IcebergLayoutTable(root, branch="audit")

    # stage two commits on the branch: a merge and a MOR delete
    delta = spark.createDataFrame([("u0", 0, 99.0, 0)], SCHEMA)
    tb.merge_rows(delta, keys=["url", "bucket_s"])
    tb.delete_where(spark, "url = 'u2'", mode="merge-on-read")

    # AUDIT: branch readers see the staged state; main is untouched
    assert tb.read_tier(spark).where("url = 'u2'").count() == 0
    assert tb.read_tier(spark).where("v = 99.0").count() == 1
    assert t.read_tier(spark).where("url = 'u2'").count() > 0
    assert t.read_tier(spark).where("v = 99.0").count() == 0

    # PUBLISH: main fast-forwards atomically to the branch head
    out = t.publish_branch("audit")
    assert out["published_snapshot_id"] == tb.current_snapshot()["snapshot_id"]
    main_rows = sorted(map(tuple, t.read_tier(spark).collect()))
    assert main_rows == sorted(map(tuple, tb.read_tier(spark).collect()))
    assert t.list_branches()["main"] == t.list_branches()["audit"]


def test_publish_rejected_when_main_advanced(spark, tmp_path):
    root = str(tmp_path / "t")
    t = IcebergLayoutTable(root)
    t.write_tier(_mk(spark))
    t.create_branch("audit")
    tb = IcebergLayoutTable(root, branch="audit")
    tb.merge_rows(spark.createDataFrame([("u0", 0, 1.0, 0)], SCHEMA),
                  keys=["url", "bucket_s"])
    # main moves on (a second partition lands)
    t.write_tier(_mk(spark, part=604800))
    with pytest.raises(ConcurrentWriteConflict, match="advanced"):
        t.publish_branch("audit")
    # main unaffected by the failed publish
    assert t.read_tier(spark).where("v = 1.0 and bucket_s = 0").count() == 0


def test_branch_isolation_and_gc_protection(spark, tmp_path):
    root = str(tmp_path / "t")
    t = IcebergLayoutTable(root)
    t.write_tier(_mk(spark))
    t.create_branch("wip")
    tb = IcebergLayoutTable(root, branch="wip")
    tb.delete_where(spark, "url = 'u0'")  # CoW rewrite on the branch
    staged = tb.read_tier(spark).count()
    # main-side maintenance: expire + orphan GC must keep the branch
    # chain and its data alive
    t.expire_snapshots(keep_last=1)
    t.remove_orphans(older_than_s=0.0)
    assert tb.read_tier(spark).count() == staged
    t.publish_branch("wip")
    assert t.read_tier(spark).count() == staged
    # dropped branch + expiry collects the now-unreferenced history
    t.drop_branch("wip")
    assert "wip" not in t.list_branches()


def test_branch_errors(spark, tmp_path):
    root = str(tmp_path / "t")
    t = IcebergLayoutTable(root)
    t.write_tier(_mk(spark))
    t.create_branch("b1")
    with pytest.raises(ConcurrentWriteConflict, match="already exists"):
        t.create_branch("b1")
    with pytest.raises(ValueError, match="default ref"):
        t.create_branch("main")
    with pytest.raises(FileNotFoundError, match="no branch"):
        t.publish_branch("nope")
    with pytest.raises(FileNotFoundError, match="create_branch"):
        IcebergLayoutTable(root, branch="ghost").current_snapshot()
