"""Streaming continuous-aggregate maintenance of the retention tiers.

`streaming_1h_partials` (rollup_stream.py) streams the 1h tier as an
append-only parquet feed; this module closes the loop the north rule
asks for: a pages *stream* continuously maintaining the SAME durable
tier tables (1h/1d/30d + compressed chunks) that batch retention and
`refresh_from_pages` maintain — TimescaleDB-style continuous
aggregates, driven by Structured Streaming.

The construction is deliberately thin: Structured Streaming is used
for what it is uniquely good at — incremental source discovery,
micro-batch framing, and a replay-stable `batch_id` — while all tier
algebra stays in `rollup/incremental.py`:

* each micro-batch of raw pages is handed to ``refresh_from_pages``
  inside ``foreachBatch`` with ``delta_tag=f"{tag_prefix}:{batch_id}"``;
* exactly-once falls out of composing the two ledgers: a crashed batch
  is REPLAYED by Spark with the same ``batch_id``, and the partials
  store's ``applied_deltas`` ledger makes the re-merge a no-op while
  the ``pending`` marker finishes any interrupted tier rebuild —
  the canonical idempotent-foreachBatch pattern;
* no streaming state at all (no watermark, no state store): the
  durable 1h partials store *is* the state, shared with the batch
  paths, so late pages fold into their historical bucket exactly like
  a batch delta and the stream can be stopped and replaced by batch
  refreshes (or vice versa) at any time.

Scale: per micro-batch cost is one shuffle over the batch plus
affected-partition tier rebuilds — the same O(delta) work as a batch
refresh; the trigger interval amortizes it.  Reference: the reference
engine is strictly batch (SURVEY.md §2.4 "Streaming: none").
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from lambdo_spark.rollup.incremental import refresh_from_pages


def continuous_refresh_writer(
    pages_stream: DataFrame,
    root: str,
    checkpoint_dir: str,
    tag_prefix: str = "stream",
    compress: bool = True,
    chunk_buckets: int = 4096,
    enforce_audit: bool = True,
):
    """pages readStream → DataStreamWriter that maintains the tier
    tables under ``root`` via exactly-once incremental refresh.

    Caller picks the trigger (``.trigger(availableNow=True)`` for
    catch-up runs, ``processingTime`` for a live firehose) and calls
    ``.start()``.  ``tag_prefix`` must be unique per checkpoint if
    several streams or manual batch refreshes share one root —
    delta tags are ``{tag_prefix}:{batch_id}``.
    """

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):  # empty micro-batch: nothing to merge
            return
        refresh_from_pages(
            batch_df.sparkSession,
            batch_df,
            root,
            delta_tag=f"{tag_prefix}:{batch_id}",
            compress=compress,
            chunk_buckets=chunk_buckets,
            enforce_audit=enforce_audit,
        )

    return (
        pages_stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
    )
