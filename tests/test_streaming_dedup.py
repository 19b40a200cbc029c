"""Streaming exact dedup (streaming/dedup_stream.py): first-seen docs
survive, in-window re-crawls are dropped, batch parity on the
first-occurrence set."""

import datetime as dt
import glob
import os
import shutil


def _land(df, staging, src, name):
    tmp = os.path.join(staging, name)
    df.write.parquet(tmp)
    os.makedirs(src, exist_ok=True)
    for i, f in enumerate(sorted(glob.glob(os.path.join(tmp, "part-*.parquet")))):
        shutil.copy(f, os.path.join(src, f"{name}-{i}.parquet"))


def test_streaming_dedup_first_seen(spark, tmp_path):
    from lambdo_spark.streaming.dedup_stream import streaming_dedup_exact

    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    staging = str(tmp_path / "staging")
    t0 = dt.datetime(2024, 1, 1)

    rows1 = [
        (1, "alpha beta", t0),
        (2, "alpha beta", t0 + dt.timedelta(minutes=1)),   # dup of 1
        (3, "gamma", t0 + dt.timedelta(minutes=2)),
    ]
    df1 = spark.createDataFrame(rows1, "doc_id long, text string, ts timestamp")
    _land(df1, staging, src, "f1")
    schema = df1.schema

    def run():
        stream = spark.readStream.schema(schema).format("parquet").load(src)
        q = (
            streaming_dedup_exact(stream, watermark_delay="30 minutes")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        q.stop()

    run()
    # batch 2 (restart, state carried): another in-window dup + a new doc
    rows2 = [
        (4, "alpha beta", t0 + dt.timedelta(minutes=5)),   # still a dup
        (5, "delta", t0 + dt.timedelta(minutes=6)),
    ]
    _land(
        spark.createDataFrame(rows2, "doc_id long, text string, ts timestamp"),
        staging, src, "f2",
    )
    run()

    got = spark.read.parquet(out).toPandas().sort_values("doc_id")
    assert sorted(got["text"]) == ["alpha beta", "delta", "gamma"]
    assert 2 not in set(got["doc_id"]) and 4 not in set(got["doc_id"])


def test_streaming_dedup_reemits_after_window(spark, tmp_path):
    """Bounded-state contract: a re-crawl far outside the watermark
    window re-emits (state expired), while in-window re-crawls stay
    dropped across restarts."""
    from lambdo_spark.streaming.dedup_stream import streaming_dedup_exact

    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    staging = str(tmp_path / "staging")
    t0 = dt.datetime(2024, 1, 1)

    def run(schema):
        stream = spark.readStream.schema(schema).format("parquet").load(src)
        q = (
            streaming_dedup_exact(stream, watermark_delay="30 minutes")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        q.stop()

    d1 = spark.createDataFrame(
        [(1, "alpha", t0)], "doc_id long, text string, ts timestamp"
    )
    _land(d1, staging, src, "f1")
    run(d1.schema)
    # advances the watermark hours past alpha's window
    _land(
        spark.createDataFrame(
            [(2, "omega", t0 + dt.timedelta(hours=2))], d1.schema
        ),
        staging, src, "f2",
    )
    run(d1.schema)
    # alpha again, far outside the original window: must RE-emit
    _land(
        spark.createDataFrame(
            [(3, "alpha", t0 + dt.timedelta(hours=2, minutes=1))], d1.schema
        ),
        staging, src, "f3",
    )
    run(d1.schema)
    got = spark.read.parquet(out).toPandas()
    assert sorted(got["doc_id"]) == [1, 2, 3]
