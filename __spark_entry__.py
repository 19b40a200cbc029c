"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship retention rollup on sf0.001 events.
``queries()`` / ``oracle_sql()`` — one pair per implemented operator
(SURVEY.md §2); the driver cross-checks them against DuckDB at sf0.01.

All float aggregates are rounded identically on both sides; timestamps
are compared as epoch-second longs to keep the value-hash stable
across engines.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from lambdo_spark.rollup.tiers import (
    TIER_SECONDS,
    downsample,
    finalize,
    gap_fill,
    partials_from_table,
)
from lambdo_spark.rollup.compress_stage import compress_tier


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "events.parquet"))


def _event_partials(spark: SparkSession, sf_dir: str, tier_seconds: int) -> DataFrame:
    """events as the keyed time-series: key=user_id, ts=ts,
    cat=event_type, measure=value quantized to cents (exact longs —
    sums/means become integer-exact, so the DuckDB value-hash can
    never drift on float summation order)."""
    return partials_from_table(
        _events(spark, sf_dir),
        tier_seconds,
        key_col="user_id",
        ts_col="ts",
        cat_col="event_type",
        measure=F.round(F.col("value") * 100, 0).cast("long"),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: 1h-tier continuous aggregate over sf0.001 events
    (count / mean / min-max ts / category histogram per key+bucket)."""
    return finalize(_event_partials(spark, "/root/testdata/sf0.001", 3600))


# --------------------------------------------------------------- queries

def _q_rollup_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    # mean exposed as scaled integer division over exact partials:
    # mean(value) * 10^4 = (sum_cents * 100) div n_points
    t = _event_partials(spark, sf_dir, 3600).groupBy("url", "bucket_s").agg(
        F.sum("n_points").alias("n_points"),
        F.sum("sum_len").alias("_sum_c"),
        F.min("min_ts").alias("_min_ts"),
        F.max("max_ts").alias("_max_ts"),
    )
    return t.select(
        F.col("url").alias("user_id"),
        "bucket_s",
        "n_points",
        F.expr("(_sum_c * 100) div n_points").alias("mean_value_x10k"),
        F.unix_timestamp("_min_ts").alias("min_ts_s"),
        F.unix_timestamp("_max_ts").alias("max_ts_s"),
    )


def _q_rollup_1d_via_partials(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1d tier produced by re-aggregating 1h partials (partial+final);
    the oracle computes the day rollup directly from raw rows — this
    pins the algebraic-merge invariant against an independent engine."""
    p1h = _event_partials(spark, sf_dir, 3600)
    p1d = downsample(p1h, TIER_SECONDS["1d"])
    t = p1d.groupBy("url", "bucket_s").agg(
        F.sum("n_points").alias("n_points"),
        F.sum("sum_len").alias("_sum_c"),
    )
    return t.select(
        F.col("url").alias("user_id"),
        "bucket_s",
        "n_points",
        F.expr("(_sum_c * 100) div n_points").alias("mean_value_x10k"),
    )


def _q_rollup_gapfill_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = finalize(_event_partials(spark, sf_dir, 3600))
    filled = gap_fill(t, 3600, key="url")
    return filled.select(
        F.col("url").alias("user_id"), "bucket_s", "n_points"
    )


def _q_hist_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Category histogram materialized as a MapType column, exploded
    back to rows so DuckDB can verify the map contents exactly."""
    t = finalize(downsample(_event_partials(spark, sf_dir, 3600), 86400))
    return t.select(
        F.col("url").alias("user_id"),
        "bucket_s",
        F.explode("lang_hist").alias("event_type", "n_points"),
    )


def _q_compressed_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gorilla/delta-of-delta compression stage (non-SQL-expressible:
    binary codecs; driver does the rows-only check, round-trip
    exactness is pinned by tests/test_compress.py)."""
    t = finalize(_event_partials(spark, sf_dir, 3600))
    c = compress_tier(t, value_col="mean_len", tier_seconds=3600)
    return c.select(
        F.col("url").alias("user_id"), "chunk", "n",
        F.length("ts_blob").alias("ts_bytes"),
        F.length("val_blob").alias("val_bytes"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "rollup_1h": _q_rollup_1h,
        "rollup_1d_via_partials": _q_rollup_1d_via_partials,
        "rollup_gapfill_1h": _q_rollup_gapfill_1h,
        "hist_1d": _q_hist_1d,
        "compressed_chunks": _q_compressed_chunks,
    }


_SQL_TIER = """
SELECT user_id,
       CAST(floor(epoch(ts)/{sec})*{sec} AS BIGINT) AS bucket_s,
       count(*) AS n_points,
       CAST((sum(CAST(round(value * 100, 0) AS BIGINT)) * 100) // count(*) AS BIGINT)
           AS mean_value_x10k,
       CAST(floor(min(epoch(ts))) AS BIGINT) AS min_ts_s,
       CAST(floor(max(epoch(ts))) AS BIGINT) AS max_ts_s
FROM events GROUP BY 1, 2
"""


def oracle_sql() -> dict[str, str]:
    return {
        "rollup_1h": _SQL_TIER.format(sec=3600),
        "rollup_1d_via_partials": """
            SELECT user_id,
                   CAST(floor(epoch(ts)/86400)*86400 AS BIGINT) AS bucket_s,
                   count(*) AS n_points,
                   CAST((sum(CAST(round(value * 100, 0) AS BIGINT)) * 100) // count(*) AS BIGINT)
                       AS mean_value_x10k
            FROM events GROUP BY 1, 2
        """,
        "rollup_gapfill_1h": """
            WITH tier AS (
              SELECT user_id,
                     CAST(floor(epoch(ts)/3600)*3600 AS BIGINT) AS bucket_s,
                     count(*) AS n_points
              FROM events GROUP BY 1, 2
            ), bounds AS (
              SELECT user_id, min(bucket_s) AS lo, max(bucket_s) AS hi
              FROM tier GROUP BY 1
            ), grid AS (
              SELECT b.user_id, gs.g AS bucket_s
              FROM bounds b,
                   LATERAL (SELECT unnest(generate_series(b.lo, b.hi, 3600)) AS g) gs
            )
            SELECT g.user_id, g.bucket_s,
                   COALESCE(t.n_points, 0) AS n_points
            FROM grid g LEFT JOIN tier t
              ON g.user_id = t.user_id AND g.bucket_s = t.bucket_s
        """,
        "hist_1d": """
            SELECT user_id,
                   CAST(floor(epoch(ts)/86400)*86400 AS BIGINT) AS bucket_s,
                   event_type,
                   count(*) AS n_points
            FROM events GROUP BY 1, 2, 3
        """,
        # compressed_chunks: intentionally absent (binary codec output;
        # rows-only check + pytest round-trip property tests)
    }
