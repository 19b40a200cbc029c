"""Streaming exact dedup — the training-data ingest shape.

Batch `dedup_exact` (functions/dedup.py) groups the whole corpus; a
stream cannot. This operator emits each document the FIRST time its
content hash is seen:

* content key = ``xxhash64(text)`` (JVM-side, no Python) — the same
  exact-dup notion as the batch op (hash collisions at 64 bits are
  ~2^-32 at a billion docs; swap in ``sha2`` for a cryptographic key);
* state is one ``first_ts`` long per distinct in-window key in the
  state store, expired via event-time timeout when the watermark
  passes ``first_ts + watermark_delay`` — bounded state, the
  ingest-window contract (a re-crawl of the same page within the
  watermark window is dropped; one far outside it re-emits, exactly
  like every production streaming-dedup design);
* ``watermark_delay=None`` keeps state forever (only for key spaces
  that fit).

Why not ``dropDuplicatesWithinWatermark``: among duplicates arriving
in the SAME micro-batch it keeps whichever row a task iterates first —
partition-scheduling luck, and streaming DataFrames cannot be sorted
to pin it down. "First seen" here must match the batch op's
first-occurrence contract (earliest ``ts_col``; full-row lexicographic
tie-break), so the group's kept row is chosen explicitly inside an
``applyInPandasWithState`` kernel: deterministic at any parallelism.

Scale: one shuffle on the content key; state store rows are
(key, first_ts) only, RocksDB-backed; the kernel is vectorized pandas
over Arrow batches (no per-row Python in the hot path beyond the one
kept-row pick per group).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

_STATE_SCHEMA = StructType([StructField("first_ts_ms", LongType())])


def _make_dedup(ts_col: str, out_cols: list[str], delay_ms: int | None):
    def fn(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            # watermark passed first_ts + delay: the key may re-emit
            state.remove()
            return
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch) == 0:
            return

        def pick_first():
            # deterministic first-seen: earliest event time, full-row
            # lexicographic tie-break (independent of partition order)
            sort_cols = [ts_col] + [c for c in out_cols if c != ts_col]
            kept = batch.sort_values(sort_cols, kind="mergesort").iloc[[0]]
            return kept, int(kept[ts_col].astype("int64").iloc[0] // 10**6)

        expired = False
        if state.exists:
            (first_ms,) = state.get
            # the window may have passed while the key kept receiving
            # data (timeout invocations only fire for keys WITHOUT
            # input in a batch) — check expiry inline so the re-emit
            # contract holds regardless of invocation ordering
            expired = (
                delay_ms is not None
                and first_ms + delay_ms <= state.getCurrentWatermarkMs()
            )
        if not state.exists or expired:
            kept, first_ms = pick_first()
            state.update((first_ms,))
            yield kept[out_cols]
        if delay_ms is not None:
            # timeouts reset on every invocation — re-arm from the
            # stored first_ts; a deadline at/behind the watermark is
            # illegal, clamp (the key then times out next batch)
            state.setTimeoutTimestamp(
                max(first_ms + delay_ms, state.getCurrentWatermarkMs() + 1)
            )

    return fn


def streaming_dedup_exact(
    docs_stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark_delay: str | None = "1 hour",
) -> DataFrame:
    """readStream docs → first-seen docs (append mode).

    ``watermark_delay=None`` deduplicates over the whole stream
    lifetime (unbounded state — only for small key spaces).
    """
    keyed = docs_stream.withColumn("__key__", F.xxhash64(F.col(text_col)))
    out_cols = [c for c in docs_stream.columns]
    out_schema = StructType(
        [f for f in docs_stream.schema.fields if f.name in out_cols]
    )
    if watermark_delay is None:
        delay_ms, timeout = None, GroupStateTimeout.NoTimeout
    else:
        delay_ms = int(pd.Timedelta(watermark_delay).total_seconds() * 1000)
        timeout = GroupStateTimeout.EventTimeTimeout
        keyed = keyed.withWatermark(ts_col, watermark_delay)
    return keyed.groupBy("__key__").applyInPandasWithState(
        _make_dedup(ts_col, out_cols, delay_ms),
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
