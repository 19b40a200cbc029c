"""Salted two-phase aggregation must be exactly equal to the direct
aggregation (SURVEY.md §7.3: merges must be algebraic, never averaged
averages), on skewed data, with and without the hot-key sketch."""

import pandas as pd
from pyspark.sql import functions as F

from lambdo_spark.rollup.salting import key_frequency_sketch, salted_agg, with_salt
from lambdo_spark.sources.pages import generate_pages


def _direct(df):
    return df.groupBy("url").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("len").alias("s"),
        F.min("len").alias("mn"),
        F.max("len").alias("mx"),
    )


def _salted(df, hot=None):
    return salted_agg(
        df,
        ["url"],
        partial_aggs=[
            F.count(F.lit(1)).alias("n"),
            F.sum("len").alias("s"),
            F.min("len").alias("mn"),
            F.max("len").alias("mx"),
        ],
        merge_aggs=[
            F.sum("n").alias("n"),
            F.sum("s").alias("s"),
            F.min("mn").alias("mn"),
            F.max("mx").alias("mx"),
        ],
        hot_keys=hot,
        buckets=16,
    )


def test_salted_equals_direct(spark):
    df = generate_pages(spark, 4000, seed=42).select(
        "url", F.length("text").alias("len")
    )
    a = _direct(df).orderBy("url").toPandas()
    b = _salted(df).orderBy("url").toPandas()
    pd.testing.assert_frame_equal(a, b)


def test_salted_with_hot_sketch(spark):
    df = generate_pages(spark, 4000, seed=42).select(
        "url", F.length("text").alias("len")
    )
    hot = key_frequency_sketch(df, ["url"], threshold=50, sample_fraction=0.5)
    a = _direct(df).orderBy("url").toPandas()
    b = _salted(df, hot=hot).orderBy("url").toPandas()
    pd.testing.assert_frame_equal(a, b)


def test_cold_keys_get_salt_zero(spark):
    df = generate_pages(spark, 2000, seed=42).select("url")
    # empty hot set → everything cold → every salt must be 0
    hot = df.limit(0)
    out = with_salt(df, ["url"], hot_keys=hot, buckets=16)
    assert out.where(F.col("_salt") != 0).count() == 0


def test_hot_keys_fan_out_and_deterministic(spark):
    # salt over the real row shape (url + ts + text), not a keys-only
    # projection: the salt is a deterministic content hash, so rows
    # must carry distinguishing columns to fan out — which actual
    # fact rows do
    df = generate_pages(spark, 5000, seed=42).select("url", "warc_ts", "text")
    top = df.groupBy("url").count().orderBy(F.desc("count")).limit(1)
    hot = top.select("url")
    out = with_salt(df, ["url"], hot_keys=hot, buckets=16)
    hot_url = top.collect()[0]["url"]
    n_salts = (
        out.where(F.col("url") == hot_url).select("_salt").distinct().count()
    )
    assert n_salts > 4  # the hot key really spreads across buckets
    # determinism: two independent evaluations assign identical salts
    # (a retry-recomputed task must not re-salt rows differently)
    a = out.orderBy("url", "warc_ts").select("_salt").collect()
    b = (
        with_salt(df, ["url"], hot_keys=hot, buckets=16)
        .orderBy("url", "warc_ts").select("_salt").collect()
    )
    assert a == b
