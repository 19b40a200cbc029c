"""Streaming upsert sink: a CDC-style delta stream continuously
MERGEd into an Iceberg-layout table with exactly-once semantics.

This is the row-level twin of `continuous.py` (which maintains
aggregate tiers): a stream of keyed correction/late-arrival rows —
the shape a Debezium/CDC feed or an entity-resolution pipeline emits —
is folded into the durable table by ``merge_rows`` inside
``foreachBatch``:

* each micro-batch upserts with ``idempotency_tag=f"{prefix}:{batch_id}"``
  — Spark replays a crashed batch with the SAME batch_id, and the
  table's ``applied_upserts`` ledger makes the replay a no-op
  (and a merge-on-read replay is convergent even without the ledger:
  its higher sequence number supersedes the original rows);
* ``mode="merge-on-read"`` (the default here) makes the per-batch cost
  O(batch): the delta appends as new data files plus equality-delete
  files — no base partition is read or rewritten, so a firehose of
  small corrections against years of history stays cheap. Run
  ``compact_parts`` periodically (or a maintenance CLI cron) to fold
  the accumulated adds/deletes back into base files;
* no streaming state: the table IS the state, so the stream can stop
  and batch ``merge_rows`` calls can take over (or vice versa).

The reference engine is strictly batch, whole-frame-in-memory
(lambdo/Table.py populate rebuilds the full pandas frame); a
continuously-upserted table of this shape is what its users would
need at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from lambdo_spark.sources.iceberg_layout import IcebergLayoutTable


def streaming_upsert_writer(
    delta_stream: DataFrame,
    root: str,
    keys: list[str],
    checkpoint_dir: str,
    mode: str = "merge-on-read",
    tag_prefix: str = "upsert",
    part_col: str = "part",
):
    """delta readStream → DataStreamWriter that upserts each
    micro-batch into the table at ``root`` by ``keys``.

    The stream must carry ``part_col``. Caller picks the trigger
    (``.trigger(availableNow=True)`` for catch-up, ``processingTime``
    for a live feed) and calls ``.start()``. One writer per table:
    the idempotency ledger assumes a single streaming committer
    (concurrent BATCH writers to other partitions are still fine —
    optimistic concurrency validates per partition)."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):  # empty micro-batch
            return
        IcebergLayoutTable(root).merge_rows(
            batch_df,
            keys=keys,
            part_col=part_col,
            mode=mode,
            idempotency_tag=f"{tag_prefix}:{batch_id}",
        )

    return (
        delta_stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
    )
