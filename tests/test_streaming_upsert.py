"""Streaming upsert sink (streaming/upsert_stream.py): a CDC-style
delta stream MERGEd into the Iceberg-layout table micro-batch by
micro-batch must equal the batch merge of the same deltas, replays
must be exactly-once, and merge-on-read batches must never rewrite
base data files."""

import glob
import os
import shutil

from lambdo_spark.sources.iceberg_layout import IcebergLayoutTable
from lambdo_spark.streaming.upsert_stream import streaming_upsert_writer

SCHEMA = "url string, bucket_s bigint, v double, part bigint"


def _land(df, staging, src, name):
    tmp = os.path.join(staging, name)
    df.write.parquet(tmp)
    os.makedirs(src, exist_ok=True)
    for i, f in enumerate(sorted(glob.glob(os.path.join(tmp, "part-*.parquet")))):
        shutil.copy(f, os.path.join(src, f"{name}-{i}.parquet"))


def _rows(t, spark):
    return sorted(
        (r["url"], r["bucket_s"], r["v"], r["part"])
        for r in t.read_tier(spark).collect()
    )


def test_streaming_upsert_matches_batch_merge(spark, tmp_path):
    src, staging = str(tmp_path / "src"), str(tmp_path / "staging")
    root, ckpt = str(tmp_path / "t"), str(tmp_path / "ckpt")
    base = spark.createDataFrame(
        [(f"u{i % 4}", i * 60, float(i), 0) for i in range(12)], SCHEMA
    )
    t = IcebergLayoutTable(root)
    t.write_tier(base)
    v0 = dict(t.part_versions())

    d1 = spark.createDataFrame(
        [("u0", 0, 100.0, 0), ("new", 99, 1.0, 0)], SCHEMA
    )
    d2 = spark.createDataFrame(
        [("u0", 0, 200.0, 0), ("zz", 604800, 2.0, 604800)], SCHEMA
    )
    _land(d1, staging, src, "d1")

    def run():
        stream = spark.readStream.schema(SCHEMA).format("parquet").load(src)
        q = (
            streaming_upsert_writer(stream, root, ["url", "bucket_s"], ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        q.stop()

    run()
    got = _rows(t, spark)
    # batch-merge oracle on a second table
    t2 = IcebergLayoutTable(str(tmp_path / "oracle"))
    t2.write_tier(base)
    t2.merge_rows(d1, keys=["url", "bucket_s"])
    assert got == _rows(t2, spark)

    # second landing: stacked stream upserts, incl. a brand-new partition
    _land(d2, staging, src, "d2")
    run()
    t2.merge_rows(d2, keys=["url", "bucket_s"])
    assert _rows(t, spark) == _rows(t2, spark)

    # merge-on-read: base data versions never changed
    assert {p: v for p, v in t.part_versions().items() if p in v0} == v0
    snap = t.current_snapshot()
    assert [x.split(":")[0] for x in snap["applied_upserts"]] == ["upsert", "upsert"]

    # re-run with the same checkpoint and no new files: no-op
    sid = snap["snapshot_id"]
    run()
    assert t.current_snapshot()["snapshot_id"] == sid


def test_replayed_batch_is_exactly_once(spark, tmp_path):
    """Simulate Spark replaying a crashed micro-batch: calling the
    foreachBatch body twice with the same batch_id commits once."""
    root = str(tmp_path / "t")
    t = IcebergLayoutTable(root)
    t.write_tier(spark.createDataFrame(
        [(f"u{i}", i, float(i), 0) for i in range(6)], SCHEMA
    ))
    delta = spark.createDataFrame([("u0", 0, 42.0, 0)], SCHEMA)
    for _ in range(2):
        t.merge_rows(delta, keys=["url", "bucket_s"],
                     mode="merge-on-read", idempotency_tag="upsert:7")
    snap = t.current_snapshot()
    assert snap["applied_upserts"] == ["upsert:7"]
    assert snap["snapshot_id"] == 1  # exactly one commit after the base
    back = t.read_tier(spark)
    assert back.count() == 6
    assert back.where("url='u0' and bucket_s=0").first()["v"] == 42.0
    # the ledger survives unrelated commits (carried extra key)
    t.compact_parts(spark)
    assert t.current_snapshot()["applied_upserts"] == ["upsert:7"]
