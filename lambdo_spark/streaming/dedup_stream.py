"""Streaming exact dedup — the training-data ingest shape.

Batch `dedup_exact` (functions/dedup.py) groups the whole corpus; a
stream cannot. This operator emits each document the FIRST time its
content hash is seen, using Spark's watermarked stateful
deduplication:

* content key = ``xxhash64(text)`` (JVM-side, no Python) — the same
  exact-dup notion as the batch op (hash collisions at 64 bits are
  ~2^-32 at a billion docs; swap in ``sha2`` for a cryptographic key);
* ``dropDuplicatesWithinWatermark`` keeps one state row per distinct
  key only until the watermark passes it — bounded state, the
  ingest-window contract (a re-crawl of the same page within the
  watermark window is dropped; one far outside it re-emits, exactly
  like every production streaming-dedup design);
* ``dropDuplicates`` (no watermark bound) is offered for corpora whose
  key space fits state forever.

Scale: state is one (key-hash, timestamp) row per distinct in-window
document in RocksDB-backed state stores; the dedup itself is one
shuffle on the content key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


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
    if watermark_delay is None:
        return keyed.dropDuplicates(["__key__"]).drop("__key__")
    out = keyed.withWatermark(ts_col, watermark_delay)
    return out.dropDuplicatesWithinWatermark(["__key__"]).drop("__key__")
