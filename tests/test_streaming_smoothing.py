"""Streaming EWMA (streaming/smoothing.py): emitted rows must equal
the batch adjust=True EWMA over the processed prefix, state must
survive a checkpointed restart, and late rows must be flagged."""

import datetime as dt
import glob
import os
import shutil

import numpy as np
import pandas as pd

from lambdo_spark.streaming.smoothing import streaming_ewma

ALPHA = 0.4


def _ts(m):
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)


def _land(df, staging: str, src: str, name: str) -> str:
    tmp = os.path.join(staging, name)
    df.write.parquet(tmp)
    os.makedirs(src, exist_ok=True)
    for i, f in enumerate(sorted(glob.glob(os.path.join(tmp, "part-*.parquet")))):
        shutil.copy(f, os.path.join(src, f"{name}-{i}.parquet"))
    return tmp


def _start(spark, src, out, ckpt, schema):
    stream = spark.readStream.schema(schema).format("parquet").load(src)
    q = (
        streaming_ewma(stream, ALPHA, key_col="k", ts_col="ts",
                       value_col="v")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    q.stop()


def test_streaming_ewma_matches_batch_prefix_and_resumes(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    staging = str(tmp_path / "staging")

    rows1 = [("u", _ts(0), 10.0), ("u", _ts(1), 20.0), ("u", _ts(2), 5.0),
             ("w", _ts(0), 100.0)]
    f1 = _land(
        spark.createDataFrame(rows1, "k string, ts timestamp, v double"),
        staging, src, "f1",
    )
    schema = spark.read.parquet(f1).schema
    _start(spark, src, out, ckpt, schema)

    # second run from the SAME checkpoint: recursion continues from
    # state (u gets two more rows, one of them LATE)
    rows2 = [("u", _ts(10), 40.0), ("u", _ts(1, ), 7.0)]
    _land(
        spark.createDataFrame(rows2, "k string, ts timestamp, v double"),
        staging, src, "f2",
    )
    _start(spark, src, out, ckpt, schema)

    got = (
        spark.read.parquet(out)
        .toPandas()
        .sort_values(["key", "ts_s", "value"])
        .reset_index(drop=True)
    )
    # processing order for u: batch1 sorted by ts -> 10, 20, 5;
    # batch2 sorted by ts -> 7 (late), 40
    seq = [10.0, 20.0, 5.0, 7.0, 40.0]
    exp = pd.Series(seq).ewm(alpha=ALPHA, adjust=True).mean()
    u = got[got["key"] == "u"].copy()
    # map each value to its processing position (values unique here)
    by_val = {v: e for v, e in zip(seq, exp)}
    for _, r in u.iterrows():
        assert np.isclose(r["ewma"], by_val[r["value"]], rtol=1e-12), r
    # the ts=1 row of batch 2 is late (u's newest processed was ts=2 min)
    assert bool(u[u["value"] == 7.0]["late"].iloc[0]) is True
    assert not u[u["value"] != 7.0]["late"].any()
    w = got[got["key"] == "w"]
    assert len(w) == 1 and np.isclose(w["ewma"].iloc[0], 100.0)


def test_streaming_ewma_alpha_validation(spark, tmp_path):
    import pytest

    stream = (
        spark.readStream.schema("k string, ts timestamp, v double")
        .format("parquet")
        .load(str(tmp_path))
    )
    with pytest.raises(ValueError):
        streaming_ewma(stream, 0.0, key_col="k", ts_col="ts", value_col="v")
