"""Custom stateful streaming operator: punctuation-based bucket
finalizer (``applyInPandasWithState``).

The watermarked window tier (rollup_stream.py) finalizes a bucket when
the EVENT-TIME watermark passes — a global clock. This operator
implements the *per-key punctuation* policy instead: a url's bucket is
finalized the moment a STRICTLY NEWER bucket for that same url
arrives, regardless of what other urls are doing. For a crawl
firehose where each url is fetched in monotone bursts, that emits
hours earlier than a global watermark would — and it is exactly the
kind of custom-state logic built-in streaming aggregations cannot
express (reference has no streaming at all, SURVEY §2.4).

State per url: the open (newest) bucket's algebraic partial
``(bucket_s, n, sum_len, min_ts_s, max_ts_s)``. Arriving batches are
merged vectorized (pandas groupby per Arrow batch group); every bucket
older than the newest observed is emitted as final. Emitted rows carry
the same algebra as batch 1h partials, so downstream downsampling can
consume either.

Caveat (documented, inherent to punctuation): out-of-order rows for an
already-finalized bucket would re-open it; callers choose punctuation
(this) vs watermark (rollup_stream) per source ordering guarantees.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("bucket_s", LongType()),
        StructField("n_points", LongType()),
        StructField("sum_len", LongType()),
        StructField("min_ts_s", LongType()),
        StructField("max_ts_s", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("bucket_s", LongType()),
        StructField("n_points", LongType()),
        StructField("sum_len", LongType()),
        StructField("min_ts_s", LongType()),
        StructField("max_ts_s", LongType()),
    ]
)


def _finalize_buckets(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (url,) = key
    # bucket -> [n, sum_len, min_ts, max_ts]
    partials: dict[int, list[Any]] = {}
    if state.exists:
        b, n, s, lo, hi = state.get
        partials[int(b)] = [int(n), int(s), int(lo), int(hi)]

    tier_seconds = 3600
    for pdf in pdfs:
        # NULL warc_ts rows are dropped (a NaT would otherwise become
        # a garbage int64 bucket); NULL text counts as length 0 — the
        # same tolerance the batch tier's F.sum(F.length(text)) has
        pdf = pdf[pdf["warc_ts"].notna()]
        if pdf.empty:
            continue
        ts = pdf["warc_ts"].astype("datetime64[ns]").astype("int64") // 10**9
        bucket = (ts // tier_seconds) * tier_seconds
        ln = pdf["text"].str.len().fillna(0).astype("int64")
        g = pd.DataFrame({"b": bucket, "n": 1, "s": ln, "lo": ts, "hi": ts}).groupby(
            "b"
        ).agg(n=("n", "sum"), s=("s", "sum"), lo=("lo", "min"), hi=("hi", "max"))
        for b, row in g.iterrows():
            cur = partials.get(int(b))
            if cur is None:
                partials[int(b)] = [int(row.n), int(row.s), int(row.lo), int(row.hi)]
            else:
                cur[0] += int(row.n)
                cur[1] += int(row.s)
                cur[2] = min(cur[2], int(row.lo))
                cur[3] = max(cur[3], int(row.hi))

    if not partials:
        return
    newest = max(partials)
    closed = sorted(b for b in partials if b < newest)
    n, s, lo, hi = partials[newest]
    state.update((newest, n, s, lo, hi))
    if closed:
        yield pd.DataFrame(
            {
                "url": url,
                "bucket_s": closed,
                "n_points": [partials[b][0] for b in closed],
                "sum_len": [partials[b][1] for b in closed],
                "min_ts_s": [partials[b][2] for b in closed],
                "max_ts_s": [partials[b][3] for b in closed],
            }
        )


def punctuated_1h_finalizer(pages_stream, url_col: str = "url"):
    """readStream pages → per-url punctuation-finalized 1h partials."""
    return pages_stream.groupBy(url_col).applyInPandasWithState(
        _finalize_buckets,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
