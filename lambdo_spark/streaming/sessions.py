"""Streaming sessionization (``applyInPandasWithState`` +
event-time timeout).

The batch form (rollup/timeseries.py:sessionize — lag → boundary flag
→ running sum) needs the whole history per key; a stream cannot
window over "all previous rows". This operator keeps exactly one open
session per key in state and closes it two ways:

* **in-batch / cross-batch gap** — a new event for the key arrives
  more than ``gap_seconds`` after the open session's last event;
* **event-time timeout** — the watermark passes ``last_ts + gap``,
  i.e. the stream has globally progressed far enough that no on-time
  event can extend the session (``GroupStateTimeout.EventTimeTimeout``
  — fires even if the key never receives another event, which pure
  punctuation cannot do).

Emitted rows match the batch ``session_table`` columns
``(key, session_id, start_s, end_s, duration_s, n_events)`` with the
same dense 1-based per-key session numbering (a counter rides in
state), so batch and streaming outputs are interchangeable downstream.

Late data caveat (same contract as streaming/stateful.py): an event
older than the watermark that would have extended an already-closed
session starts a NEW session instead; choose the watermark delay to
bound that, exactly as with Spark's built-in ``session_window``.

Scale: state per key is five longs — 10^9 live keys ≈ tens of GB
across the cluster's state stores, well inside RocksDB-backed state
at 1000 executors. Batches are processed vectorized (numpy diff over
the sorted per-key timestamps), no per-event Python loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType

SESSION_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("session_id", LongType()),
        StructField("start_s", LongType()),
        StructField("end_s", LongType()),
        StructField("duration_s", LongType()),
        StructField("n_events", LongType()),
    ]
)

# (session_start_s, last_ts_s, n_events, n_closed_before)
STATE_SCHEMA = StructType(
    [
        StructField("start_s", LongType()),
        StructField("last_ts_s", LongType()),
        StructField("n_events", LongType()),
        StructField("n_closed", LongType()),
    ]
)


def _make_sessionizer(gap_seconds: int, ts_col: str):
    def fn(key, pdfs, state: GroupState):
        (k,) = key

        if state.hasTimedOut:
            # watermark passed last_ts + gap: the open session can no
            # longer be extended by on-time data — close it. Do NOT
            # state.remove(): that would discard n_closed, so a key
            # that later receives events would restart numbering at 1
            # and emit duplicate (key, session_id) pairs. Keep the
            # counter with a no-open-session sentinel (start_s=NULL)
            # and no timeout; the sentinel is treated as state-absent
            # for session boundaries. Cost: one 4-long row per
            # ever-seen key persists in the state store — the price of
            # dense per-key numbering (same as the batch session_table
            # contract).
            start, last, n, n_closed = state.get
            state.update((None, None, 0, n_closed + 1))
            yield pd.DataFrame(
                {
                    "key": [k],
                    "session_id": [n_closed + 1],
                    "start_s": [start],
                    "end_s": [last],
                    "duration_s": [last - start],
                    "n_events": [n],
                }
            )
            return

        ts_parts = [
            pdf[ts_col].astype("datetime64[ns]").astype("int64") // 10**9
            for pdf in pdfs
        ]
        ts = np.sort(np.concatenate(ts_parts)) if ts_parts else np.array([], dtype="int64")
        if ts.size == 0:
            return

        out = {c: [] for c in ("key", "session_id", "start_s", "end_s",
                               "duration_s", "n_events")}

        def emit(sid, s_start, s_last, s_n):
            out["key"].append(k)
            out["session_id"].append(sid)
            out["start_s"].append(s_start)
            out["end_s"].append(s_last)
            out["duration_s"].append(s_last - s_start)
            out["n_events"].append(s_n)

        if state.exists:
            start, last, n, n_closed = state.get
            if start is None:
                # sentinel left by a timeout-close: no open session,
                # but the dense counter survives — resume numbering
                start, last, n = int(ts[0]), int(ts[0]), 0
            elif int(ts[0]) - last > gap_seconds:
                # the stored open session closes untouched; the batch
                # starts a fresh one at ts[0]
                n_closed += 1
                emit(n_closed, start, last, n)
                start, last, n = int(ts[0]), int(ts[0]), 0
        else:
            start, last, n, n_closed = int(ts[0]), int(ts[0]), 0, 0

        # gap boundaries within the batch; the open session's last
        # event is ts[0]'s virtual predecessor, so index 0 can never
        # break (any state-vs-batch gap was handled above). Each
        # predecessor is clamped to at least `last`: late events sort
        # before the stored last_ts, and a gap measured against a late
        # predecessor instead of the session's true last would split a
        # session the open state actually bridges. The clamp self-
        # neutralizes after any break (a break implies ts > last+gap,
        # so every later predecessor already exceeds `last`).
        prev = np.maximum(np.concatenate(([last], ts[:-1])), last)
        breaks = np.flatnonzero(ts - prev > gap_seconds)
        seg_starts = np.concatenate(([0], breaks))
        seg_ends = np.concatenate((breaks, [ts.size]))  # exclusive

        for i, (a, b) in enumerate(zip(seg_starts, seg_ends)):
            first_seg = i == 0
            # first segment continues the OPEN session: a late-but-
            # within-watermark event sorts before the stored last_ts,
            # so the boundary timestamps must merge via min/max — bare
            # ts[b-1] would REGRESS last_ts (shrinking the timeout
            # deadline and mis-splitting the next batch) and bare
            # `start` would miss a late event earlier than the open
            # session's first
            s_start = min(start, int(ts[a])) if first_seg else int(ts[a])
            s_n = (n if first_seg else 0) + int(b - a)
            s_last = (
                max(last, int(ts[b - 1])) if first_seg else int(ts[b - 1])
            )
            if b == ts.size:
                # newest segment stays open in state
                state.update((s_start, s_last, s_n, n_closed))
                # a timeout at or before the watermark is illegal —
                # clamp (the session then times out on the next batch)
                deadline_ms = (s_last + gap_seconds) * 1000
                wm_ms = state.getCurrentWatermarkMs()
                state.setTimeoutTimestamp(max(deadline_ms, wm_ms + 1))
            else:
                n_closed += 1
                emit(n_closed, s_start, s_last, s_n)
        if out["key"]:
            yield pd.DataFrame(out)

    return fn


def streaming_sessionizer(
    events_stream,
    gap_seconds: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    watermark_delay: str = "10 minutes",
):
    """readStream events → closed sessions (append mode).

    The watermark bounds both lateness tolerance and how long an idle
    session stays open past its last event.

    The output ``key`` field takes the INPUT key column's type (the
    schema template's StringType is replaced), so numeric user ids
    don't fail the Arrow output conversion.
    """
    key_type = events_stream.schema[key_col].dataType
    out_schema = StructType(
        [
            StructField("key", key_type),
            *[f for f in SESSION_SCHEMA.fields if f.name != "key"],
        ]
    )
    stream = events_stream.withWatermark(ts_col, watermark_delay)
    return stream.groupBy(key_col).applyInPandasWithState(
        _make_sessionizer(gap_seconds, ts_col),
        outputStructType=out_schema,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
