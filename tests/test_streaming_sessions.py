"""Streaming sessionization (streaming/sessions.py): closed sessions
must carry exactly the batch session_table's values and dense per-key
numbering; state must survive a checkpointed restart; idle keys must
close via event-time timeout once the watermark passes."""

import datetime as dt
import glob
import os
import shutil

from lambdo_spark.rollup.timeseries import session_table
from lambdo_spark.streaming.sessions import streaming_sessionizer

GAP = 600  # 10 min


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
        streaming_sessionizer(stream, GAP, key_col="k", ts_col="ts",
                              watermark_delay="1 minute")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    q.stop()


def test_streaming_sessions_match_batch_and_resume(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    staging = str(tmp_path / "staging")

    # file 1: u has two sessions (split at >10min gap), v one;
    # in-batch splits and the open tail both exercised
    rows1 = [
        ("u", _ts(0)), ("u", _ts(5)), ("u", _ts(9)),      # session 1
        ("u", _ts(30)), ("u", _ts(32)),                    # session 2 (open)
        ("v", _ts(0)), ("v", _ts(3)),                      # session 1 (open)
    ]
    f1 = _land(
        spark.createDataFrame(rows1, "k string, ts timestamp"), staging, src, "f1"
    )
    schema = spark.read.parquet(f1).schema
    _start(spark, src, out, ckpt, schema)
    got1 = spark.read.parquet(out).toPandas()

    # only u's first session is certainly closed by data (v idle; u's
    # 2nd open); timeout may also close sessions whose deadline the
    # watermark (max_ts - 1min) passed: u#1 deadline 0:19, wm 0:31 →
    # closed by gap anyway; v#1 deadline 0:13 < wm → timeout-closed
    assert ("u", 1) in set(zip(got1["key"], got1["session_id"]))
    u1 = got1[(got1["key"] == "u") & (got1["session_id"] == 1)].iloc[0]
    assert (u1["n_events"], u1["duration_s"]) == (3, 540)

    # file 2 (after restart, state carried): u continues session 2
    # within the gap, then everything closes as the watermark jumps
    rows2 = [
        ("u", _ts(40)),                                    # extends session 2
        # v got timeout-closed in run 1 (deadline 0:13 < wm 0:31);
        # post-timeout events must CONTINUE numbering at session 2,
        # not restart at 1 (the state.remove() bug)
        ("v", _ts(40)), ("v", _ts(45)),
        ("u", _ts(600)), ("w", _ts(600)),                  # far future: wm jump
    ]
    _land(
        spark.createDataFrame(rows2, "k string, ts timestamp"), staging, src, "f2"
    )
    _start(spark, src, out, ckpt, schema)
    got2 = (
        spark.read.parquet(out)
        .toPandas()
        .sort_values(["key", "session_id"])
        .reset_index(drop=True)
    )

    # batch oracle over ALL events; every session except each key's
    # last (u@600, w@600 — deadlines past the final watermark? wm =
    # 600-1min = 599 < 600+gap → still open) must be emitted closed
    all_rows = spark.createDataFrame(rows1 + rows2, "k string, ts timestamp")
    batch = (
        session_table(all_rows, ["k"], "ts", GAP)
        .toPandas()
        .sort_values(["k", "session_id"])
    )
    last = batch.groupby("k")["session_id"].max().rename("last_sid")
    batch = batch.join(last, on="k")
    expected_closed = batch[batch["session_id"] < batch["last_sid"]]

    got_keys = set(zip(got2["key"], got2["session_id"]))
    for _, r in expected_closed.iterrows():
        assert (r["k"], r["session_id"]) in got_keys
    # and every emitted session matches the batch oracle exactly
    m = got2.merge(
        batch, left_on=["key", "session_id"], right_on=["k", "session_id"],
        suffixes=("_got", "_exp"),
    )
    assert len(m) == len(got2)
    for c in ("start_s", "end_s", "duration_s", "n_events"):
        assert (m[f"{c}_got"] == m[f"{c}_exp"]).all(), c

    # u's session 2 must span the restart: events at 0:30..0:40
    u2 = got2[(got2["key"] == "u") & (got2["session_id"] == 2)]
    assert len(u2) == 1 and u2.iloc[0]["n_events"] == 3
    assert u2.iloc[0]["duration_s"] == 600

    # v's post-timeout session is numbered 2 (dense continuation),
    # never a duplicate (v, 1): timeout-close keeps n_closed in state
    v = got2[got2["key"] == "v"]
    assert sorted(v["session_id"]) == sorted(set(v["session_id"]))
    v2 = v[v["session_id"] == 2]
    assert len(v2) == 1 and v2.iloc[0]["n_events"] == 2
    assert v2.iloc[0]["duration_s"] == 300


def test_streaming_sessions_late_events_merge_not_split(spark, tmp_path):
    """Late-but-within-watermark events sort BEFORE the open session's
    stored last_ts. They must neither regress last_ts (key a: a later
    batch event 9.8min after the true last would then be mis-split)
    nor act as gap predecessors (key b: same two events in ONE batch).
    Batch oracle: all four events per key form one session."""
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    staging = str(tmp_path / "staging")

    rows1 = [("a", _ts(0)), ("a", _ts(5)), ("b", _ts(0)), ("b", _ts(5))]
    f1 = _land(
        spark.createDataFrame(rows1, "k string, ts timestamp"), staging, src, "f1"
    )
    schema = spark.read.parquet(f1).schema
    _start(spark, src, out, ckpt, schema)

    # a: late 4.5 alone; b: late 4.5 AND 14.8 together (in-batch form)
    rows2 = [("a", _ts(4.5)), ("b", _ts(4.5)), ("b", _ts(14.8))]
    _land(
        spark.createDataFrame(rows2, "k string, ts timestamp"), staging, src, "f2"
    )
    _start(spark, src, out, ckpt, schema)

    rows3 = [("a", _ts(14.8))]
    _land(
        spark.createDataFrame(rows3, "k string, ts timestamp"), staging, src, "f3"
    )
    _start(spark, src, out, ckpt, schema)

    # far future closes everything open
    rows4 = [("a", _ts(60)), ("b", _ts(60))]
    _land(
        spark.createDataFrame(rows4, "k string, ts timestamp"), staging, src, "f4"
    )
    _start(spark, src, out, ckpt, schema)

    got = (
        spark.read.parquet(out)
        .toPandas()
        .sort_values(["key", "session_id"])
        .reset_index(drop=True)
    )
    all_rows = spark.createDataFrame(
        rows1 + rows2 + rows3 + rows4, "k string, ts timestamp"
    )
    batch = session_table(all_rows, ["k"], "ts", GAP).toPandas()
    for k in ("a", "b"):
        exp = batch[(batch["k"] == k) & (batch["session_id"] == 1)].iloc[0]
        g = got[(got["key"] == k) & (got["session_id"] == 1)]
        assert len(g) == 1, (k, got)
        g = g.iloc[0]
        assert (
            g["start_s"], g["end_s"], g["n_events"]
        ) == (exp["start_s"], exp["end_s"], exp["n_events"]), k
        assert g["n_events"] == 4, k
