"""Streaming EWMA (``applyInPandasWithState``): the stateful twin of
``rollup.analytics.ewma``.

The batch form weights every prior row of the series — a stream
cannot re-read its history, but the adjust=True EWMA is exactly a
pair of linear recurrences, so TWO doubles of state per key replay it
incrementally::

    num_t = x_t + (1-α)·num_{t-1}        (weighted value sum)
    den_t = 1  + (1-α)·den_{t-1}         (weight normalizer)
    ewma_t = num_t / den_t

Each emitted row therefore equals the batch ``ewma`` over the rows
processed so far IN PROCESSING ORDER: within a micro-batch rows fold
in (ts, value) order; across micro-batches in arrival order. A late
row (event time older than the key's newest processed event) still
folds — smoothing is about recency of PROCESSING for monitoring
streams — but is flagged ``late=true`` so downstream consumers can
discount or audit it (the same late-data honesty contract as
streaming sessions' caveat, surfaced per row instead of buried).

NULL values follow the batch twin's pandas ``ignore_na=False``
semantics exactly: a null row adds no weight but still decays the
prior weights (num and den both scale by 1-α — their ratio, the
emitted ewma, is unchanged), so it re-emits the prior smoothed value
(null if nothing has been observed yet) without poisoning the state.

State is two doubles + two longs per key — by default forever (a
10^9-key store ≈ tens of GB cluster-wide). Pass ``state_ttl_s`` to
bound the store on unbounded key domains (per-url streams): a key
idle for that long in PROCESSING time is evicted and re-seeds as a
cold start on its next arrival — its recursion restarts from empty
(ewma forgets the pre-eviction history; the ``late`` flag also
resets, because "newest processed event" is part of the evicted
state). The per-batch fold is a per-key python loop over that key's
micro-batch rows — bounded by batch size, not history.
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

EWMA_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("ts_s", LongType()),
        StructField("value", DoubleType()),
        StructField("ewma", DoubleType()),
        StructField("late", BooleanType()),
    ]
)

# (num, den, last_ts_s, n_seen)
EWMA_STATE = StructType(
    [
        StructField("num", DoubleType()),
        StructField("den", DoubleType()),
        StructField("last_ts_s", LongType()),
        StructField("n", LongType()),
    ]
)


def _make_smoother(alpha: float, ts_col: str, value_col: str,
                   ttl_ms: int | None):
    q = 1.0 - float(alpha)

    def fn(key, pdfs, state: GroupState):
        (k,) = key
        if state.hasTimedOut:
            state.remove()
            return
        frames = [pdf for pdf in pdfs]
        if not frames:
            return
        pdf = pd.concat(frames, ignore_index=True)
        if len(pdf) == 0:
            # frames present but empty: nothing to fold, nothing to
            # update (int(None) on `last` would throw below)
            return
        ts = (
            pdf[ts_col].astype("datetime64[ns]").astype("int64") // 10**9
        ).to_numpy()
        vals = pdf[value_col].astype("float64").to_numpy()
        order = pd.DataFrame({"t": ts, "v": vals}).sort_values(
            ["t", "v"], kind="mergesort"
        )
        if state.exists:
            num, den, last, n = state.get
        else:
            num, den, last, n = 0.0, 0.0, None, 0
        out = {c: [] for c in ("key", "ts_s", "value", "ewma", "late")}
        for t, v in zip(order["t"].to_numpy(), order["v"].to_numpy()):
            if math.isnan(v):
                # ignore_na=False: decay both sides — the ratio (the
                # emitted smoothed value) is unchanged, but older
                # observations now weigh less against the next real one
                num *= q
                den *= q
            else:
                num = v + q * num
                den = 1.0 + q * den
            n += 1
            out["key"].append(k)
            out["ts_s"].append(int(t))
            out["value"].append(float(v))
            out["ewma"].append(num / den if den > 0.0 else float("nan"))
            out["late"].append(last is not None and int(t) < last)
            last = int(t) if last is None else max(last, int(t))
        state.update((float(num), float(den), int(last), int(n)))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(out)

    return fn


def streaming_ewma(
    stream: DataFrame,
    alpha: float,
    key_col: str = "key",
    ts_col: str = "ts",
    value_col: str = "value",
    state_ttl_s: int | None = None,
) -> DataFrame:
    """One smoothed row per input row; see module doc for semantics.

    ``state_ttl_s``: optional idle-key eviction (processing-time TTL).
    None (default) keeps every key's state forever.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    ttl_ms = None if state_ttl_s is None else int(state_ttl_s) * 1000
    if ttl_ms is not None and ttl_ms <= 0:
        raise ValueError(f"state_ttl_s must be positive, got {state_ttl_s}")
    renamed = stream.withColumnRenamed(key_col, "key")
    return renamed.groupBy("key").applyInPandasWithState(
        _make_smoother(alpha, ts_col, value_col, ttl_ms),
        outputStructType=EWMA_SCHEMA,
        stateStructType=EWMA_STATE,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.NoTimeout
            if ttl_ms is None
            else GroupStateTimeout.ProcessingTimeTimeout
        ),
    )
