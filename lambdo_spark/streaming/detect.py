"""Streaming CUSUM change detection (``applyInPandasWithState``):
the stateful twin of ``rollup.analytics.cusum``.

The batch form's running-extremum identity is already incremental —
S⁺ = P − min(0, min P) and S⁻ = max(0, max Q) − Q need only the
cumulative sums and their extrema — so state is four exact values per
key and every emitted row equals the batch CUSUM over the rows
processed so far (same processing-order contract and per-row ``late``
flag as ``streaming/smoothing.py``).

With integer values/target/slack the arithmetic is exact end-to-end
(the state carries longs); alerts are immediate: each row's scores
emit in the same micro-batch that folded it.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

CUSUM_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("ts_s", LongType()),
        StructField("value", LongType()),
        StructField("cusum_pos", LongType()),
        StructField("cusum_neg", LongType()),
        StructField("late", BooleanType()),
    ]
)

# (p_sum, p_min, q_sum, q_max, last_ts_s) — P/Q cumulative sums of the
# upper/lower deviations and their running extrema (empty prefix = 0
# is folded in by clamping the extrema at 0)
CUSUM_STATE = StructType(
    [
        StructField("p_sum", LongType()),
        StructField("p_min", LongType()),
        StructField("q_sum", LongType()),
        StructField("q_max", LongType()),
        StructField("last_ts_s", LongType()),
    ]
)


def _make_detector(target: int, slack: int, ts_col: str, value_col: str):
    t, s = int(target), int(slack)

    def fn(key, pdfs, state: GroupState):
        (k,) = key
        frames = [pdf for pdf in pdfs]
        if not frames:
            return
        pdf = pd.concat(frames, ignore_index=True)
        ts = (
            pdf[ts_col].astype("datetime64[ns]").astype("int64") // 10**9
        ).to_numpy()
        vals = pdf[value_col].astype("int64").to_numpy()
        order = pd.DataFrame({"t": ts, "v": vals}).sort_values(
            ["t", "v"], kind="mergesort"
        )
        if state.exists:
            p_sum, p_min, q_sum, q_max, last = state.get
        else:
            p_sum, p_min, q_sum, q_max, last = 0, 0, 0, 0, None
        out = {c: [] for c in ("key", "ts_s", "value", "cusum_pos",
                               "cusum_neg", "late")}
        for tt, v in zip(order["t"].to_numpy(), order["v"].to_numpy()):
            p_sum += int(v) - t - s
            q_sum += int(v) - t + s
            p_min = min(p_min, p_sum)
            q_max = max(q_max, q_sum)
            out["key"].append(k)
            out["ts_s"].append(int(tt))
            out["value"].append(int(v))
            out["cusum_pos"].append(p_sum - min(0, p_min))
            out["cusum_neg"].append(max(0, q_max) - q_sum)
            out["late"].append(last is not None and int(tt) < last)
            last = int(tt) if last is None else max(last, int(tt))
        state.update((int(p_sum), int(p_min), int(q_sum), int(q_max), int(last)))
        yield pd.DataFrame(out)

    return fn


def streaming_cusum(
    stream: DataFrame,
    target: int,
    slack: int = 0,
    key_col: str = "key",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """One scored row per input row; see module doc for semantics."""
    renamed = stream.withColumnRenamed(key_col, "key")
    return renamed.groupBy("key").applyInPandasWithState(
        _make_detector(target, slack, ts_col, value_col),
        outputStructType=CUSUM_SCHEMA,
        stateStructType=CUSUM_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
