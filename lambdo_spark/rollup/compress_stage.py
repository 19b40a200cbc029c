"""Spark stage: per-url ordered series → compressed binary columns.

Each tier's (bucket_s, value) series is grouped per url, sorted inside
the kernel, and encoded with delta-of-delta (timestamps) + Gorilla XOR
(values) into two ``BinaryType`` blobs — one row per (url, chunk).

Scale notes:
- ``applyInPandas`` groups by url → one shuffle; hot urls are bounded
  here because input is *tier rows* (≤ one row per bucket), not raw
  pages — a url with 10^8 pages still has ≤ 2.2k rows/90d at 1h.
- chunking (``chunk_buckets``) caps blob size so a decade-long url
  series does not make a multi-GB single cell; chunk id derives from
  bucket_s so re-runs are deterministic.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from lambdo_spark.functions.compress import (
    compression_ratio,
    encode_timestamps,
    encode_values,
)

def _compressed_schema(tier: DataFrame) -> str:
    key_type = dict(tier.dtypes)["url"]
    return (
        f"url {key_type}, chunk long, n long, ts_blob binary, "
        "val_blob binary, ratio double"
    )


def compress_tier(
    tier: DataFrame,
    value_col: str = "mean_len",
    chunk_buckets: int = 4096,
    tier_seconds: int = 3600,
) -> DataFrame:
    """(url, bucket_s, value) tier rows → per-(url, chunk) binary blobs."""
    chunk_span = chunk_buckets * tier_seconds

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("bucket_s")
        ts = pdf["bucket_s"].to_numpy("int64")
        vals = pdf["_v"].to_numpy("float64")
        tb = encode_timestamps(ts)
        vb = encode_values(vals)
        ratio = compression_ratio(len(ts), tb) * 0.5 + compression_ratio(
            len(vals), vb
        ) * 0.5
        return pd.DataFrame(
            {
                "url": [pdf["url"].iloc[0]],
                "chunk": [int(pdf["_chunk"].iloc[0])],
                "n": [len(ts)],
                "ts_blob": [tb],
                "val_blob": [vb],
                "ratio": [ratio],
            }
        )

    prepared = tier.select(
        "url",
        "bucket_s",
        F.col(value_col).cast("double").alias("_v"),
        (F.floor(F.col("bucket_s") / F.lit(chunk_span))).cast("long").alias("_chunk"),
    )
    return prepared.groupBy("url", "_chunk").applyInPandas(
        kernel, schema=_compressed_schema(tier)
    )
