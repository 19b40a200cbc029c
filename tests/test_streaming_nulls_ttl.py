"""Null-value rows and idle-state eviction for the streaming
smoothing/detection twins.

Pins the ADVICE fixes: (1) a NULL value must not poison the per-key
EWMA state (batch ignore_na=False parity: null rows re-emit the prior
smoothed value and decay weights); (2) NULL values must not crash the
integer CUSUM / seasonal detectors (they emit with null scores/flags
and never fold); (3) ``state_ttl_s`` evicts idle keys so the next
arrival re-seeds as a cold start; (4) the workflow compiler accepts a
streaming ewma/cusum spec that supplies ``ts`` but no ``order``.
"""

import datetime as dt
import glob
import os
import shutil
import time

import numpy as np
import pandas as pd

from lambdo_spark.streaming.detect import streaming_anomaly, streaming_cusum
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


def _run(spark, build, src, out, ckpt, schema):
    # Trigger.Once, not availableNow: a query with
    # ProcessingTimeTimeout registered never self-terminates under
    # availableNow (it idles to service future timeouts, so every test
    # run would ride its awaitTermination to the deadline). Once runs
    # exactly one micro-batch — which both folds the new files and
    # fires any expired timeouts — then stops itself.
    stream = spark.readStream.schema(schema).format("parquet").load(src)
    q = (
        build(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(once=True)
        .start()
    )
    q.awaitTermination(180)
    q.stop()


def test_streaming_ewma_null_rows_match_batch(spark, tmp_path):
    """A null value decays weights and re-emits the prior smoothed
    value (pandas ignore_na=False), and later rows keep the exact
    batch recursion — the state is not NaN-poisoned."""
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    staging = str(tmp_path / "staging")
    rows = [("u", _ts(0), 10.0), ("u", _ts(1), None), ("u", _ts(2), 30.0),
            ("n", _ts(0), None)]
    f1 = _land(
        spark.createDataFrame(rows, "k string, ts timestamp, v double"),
        staging, src, "f1",
    )
    schema = spark.read.parquet(f1).schema
    _run(
        spark,
        lambda s: streaming_ewma(s, ALPHA, key_col="k", ts_col="ts",
                                 value_col="v"),
        src, out, ckpt, schema,
    )
    got = spark.read.parquet(out).toPandas()
    u = got[got["key"] == "u"].sort_values("ts_s").reset_index(drop=True)
    exp = pd.Series([10.0, np.nan, 30.0]).ewm(alpha=ALPHA,
                                              adjust=True).mean()
    assert np.allclose(u["ewma"].to_numpy(), exp.to_numpy(), rtol=1e-12)
    # the null row re-emitted the prior smoothed value, not NaN
    assert np.isclose(u["ewma"].iloc[1], 10.0)
    # an all-null key emits null ewma (batch: ewm of all-NaN is NaN)
    n = got[got["key"] == "n"]
    assert len(n) == 1 and pd.isna(n["ewma"].iloc[0])


def test_streaming_cusum_null_rows_skip_fold(spark, tmp_path):
    """Null values emit with the running scores (null before the first
    real fold, matching batch NULL propagation) and never enter the
    integer recursion."""
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    staging = str(tmp_path / "staging")
    rows = [("u", _ts(0), None), ("u", _ts(1), 9), ("u", _ts(2), None),
            ("u", _ts(3), 9)]
    f1 = _land(
        spark.createDataFrame(rows, "k string, ts timestamp, v long"),
        staging, src, "f1",
    )
    schema = spark.read.parquet(f1).schema
    _run(
        spark,
        lambda s: streaming_cusum(s, 5, 1, key_col="k", ts_col="ts",
                                  value_col="v"),
        src, out, ckpt, schema,
    )
    got = (
        spark.read.parquet(out).toPandas().sort_values("ts_s")
        .reset_index(drop=True)
    )
    assert len(got) == 4
    # row 0: nothing folded yet -> null scores (batch sums over an
    # all-null prefix are NULL)
    assert pd.isna(got["value"].iloc[0]) and pd.isna(got["cusum_pos"].iloc[0])
    # row 1 folds: S+ = 9-5-1 = 3
    assert got["cusum_pos"].iloc[1] == 3
    # row 2 is null: scores carry the previous fold unchanged
    assert pd.isna(got["value"].iloc[2]) and got["cusum_pos"].iloc[2] == 3
    # row 3 folds on top of the carried state: 3 + 3 = 6
    assert got["cusum_pos"].iloc[3] == 6


def test_streaming_anomaly_null_rows_no_crash(spark, tmp_path):
    """A null-valued bucket emits (null z, false flag) and stays out
    of the same-phase ring buffer."""
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    staging = str(tmp_path / "staging")
    day = 86400
    rows = [("u", d * day, v)
            for d, v in [(0, 10), (1, 11), (2, 9), (3, None), (4, 10)]]
    f1 = _land(
        spark.createDataFrame(rows, "k string, bucket_s long, v long"),
        staging, src, "f1",
    )
    schema = spark.read.parquet(f1).schema
    _run(
        spark,
        lambda s: streaming_anomaly(s, period_s=day, lookback=7,
                                    min_prior=3, threshold=2.0,
                                    key_col="k", bucket_col="bucket_s",
                                    value_col="v"),
        src, out, ckpt, schema,
    )
    got = (
        spark.read.parquet(out).toPandas().sort_values("bucket_s")
        .reset_index(drop=True)
    )
    assert len(got) == 5
    null_row = got[got["bucket_s"] == 3 * day].iloc[0]
    assert pd.isna(null_row["value"]) and pd.isna(null_row["zscore"])
    assert not null_row["is_anomaly"]
    # day 4's baseline skips the null bucket: mean(10,11,9), n=3
    last = got[got["bucket_s"] == 4 * day].iloc[0]
    assert last["n_prior"] == 3
    assert np.isclose(last["baseline_mean"], 10.0)


def test_streaming_ewma_state_ttl_evicts_idle_key(spark, tmp_path):
    """With state_ttl_s set, a key idle past the TTL re-seeds as a
    cold start: its recursion restarts from the first value and the
    late flag resets (the pre-eviction 'newest processed ts' is gone)."""
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    staging = str(tmp_path / "staging")

    def build(s):
        return streaming_ewma(s, ALPHA, key_col="k", ts_col="ts",
                              value_col="v", state_ttl_s=1)

    f1 = _land(
        spark.createDataFrame(
            [("u", _ts(0), 10.0), ("u", _ts(1), 20.0)],
            "k string, ts timestamp, v double",
        ),
        staging, src, "f1",
    )
    schema = spark.read.parquet(f1).schema
    _run(spark, build, src, out, ckpt, schema)

    # let u's TTL lapse, then process a batch WITHOUT u so the store
    # evicts it (timeouts fire when a later batch runs)
    time.sleep(2.5)
    _land(
        spark.createDataFrame([("w", _ts(0), 5.0)],
                              "k string, ts timestamp, v double"),
        staging, src, "f2",
    )
    _run(spark, build, src, out, ckpt, schema)

    # u returns with an OLDER event: a live state would flag it late
    # and keep the recursion; the evicted key re-seeds instead
    _land(
        spark.createDataFrame([("u", _ts(0), 99.0)],
                              "k string, ts timestamp, v double"),
        staging, src, "f3",
    )
    _run(spark, build, src, out, ckpt, schema)

    got = spark.read.parquet(out).toPandas()
    reseed = got[(got["key"] == "u") & (got["value"] == 99.0)].iloc[0]
    assert np.isclose(reseed["ewma"], 99.0)  # cold start: ewma = x_0
    assert not reseed["late"]


def test_streaming_cusum_state_ttl_evicts_idle_key(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    staging = str(tmp_path / "staging")

    def build(s):
        return streaming_cusum(s, 5, 0, key_col="k", ts_col="ts",
                               value_col="v", state_ttl_s=1)

    f1 = _land(
        spark.createDataFrame([("u", _ts(0), 15), ("u", _ts(1), 15)],
                              "k string, ts timestamp, v long"),
        staging, src, "f1",
    )
    schema = spark.read.parquet(f1).schema
    _run(spark, build, src, out, ckpt, schema)
    time.sleep(2.5)
    _land(
        spark.createDataFrame([("w", _ts(0), 5)],
                              "k string, ts timestamp, v long"),
        staging, src, "f2",
    )
    _run(spark, build, src, out, ckpt, schema)
    _land(
        spark.createDataFrame([("u", _ts(5), 6)],
                              "k string, ts timestamp, v long"),
        staging, src, "f3",
    )
    _run(spark, build, src, out, ckpt, schema)

    got = spark.read.parquet(out).toPandas()
    reseed = got[(got["key"] == "u") & (got["value"] == 6)].iloc[0]
    # cold start: S+ = max(0, 6-5) = 1, not 10+10+1 = 21
    assert reseed["cusum_pos"] == 1


def test_workflow_stream_ewma_ts_without_order(spark, tmp_path):
    """A streaming ewma/cusum spec may give `ts` alone (no `order`):
    the compiler must not KeyError on the absent batch-order key."""
    from lambdo_spark.plans.compiler import Workflow

    src = str(tmp_path / "src")
    os.makedirs(src)
    spark.createDataFrame(
        [("u", _ts(m), float(v)) for m, v in enumerate([10, 20, 5])],
        "k string, ts timestamp, v double",
    ).coalesce(1).write.parquet(str(tmp_path / "stage"))
    shutil.copy(
        glob.glob(str(tmp_path / "stage" / "part-*.parquet"))[0],
        os.path.join(src, "e-0.parquet"),
    )
    out, ck = str(tmp_path / "o1"), str(tmp_path / "c1")
    spec = (
        '{"tables": ['
        '{"id": "ev", "operation": "source", "format": "parquet",'
        f' "path": "{src}", "stream": true,'
        ' "schema": "k string, ts timestamp, v double"},'
        '{"id": "sm", "operation": "ewma", "source": "ev",'
        ' "keys": ["k"], "value": "v", "ts": "ts", "alpha": 0.4},'
        '{"id": "s1", "operation": "stream_sink", "source": "sm",'
        f' "path": "{out}", "checkpoint": "{ck}"}}'
        "]}"
    )
    wf = Workflow(spec, spark)
    wf.execute()
    wf.await_streams(timeout=300)
    sm = spark.read.parquet(out).toPandas().sort_values("ts_s")
    exp = pd.Series([10.0, 20.0, 5.0]).ewm(alpha=0.4, adjust=True).mean()
    assert [round(x, 9) for x in sm["ewma"]] == [round(x, 9) for x in exp]
