"""Tier correctness vs a pandas oracle; downsample-equals-direct
(the partial+final invariant); gap-fill semantics (lambdo
fillna_value analog, /root/reference/tests/test_aggregate.py:77-79)."""

import pandas as pd

from pyspark.sql import functions as F

from lambdo_spark.rollup.tiers import (
    TIER_SECONDS,
    downsample,
    finalize,
    gap_fill,
    partials_from_pages,
)
from lambdo_spark.sources.pages import generate_pages, pages_pandas


def _pandas_tier(pdf: pd.DataFrame, tier_seconds: int) -> pd.DataFrame:
    df = pdf.copy()
    df["bucket_s"] = (
        df["warc_ts"].astype("int64") // 10**9 // tier_seconds * tier_seconds
    )
    df["_len"] = df["text"].str.len()
    g = (
        df.groupby(["url", "bucket_s"])
        .agg(
            n_points=("_len", "size"),
            mean_len=("_len", "mean"),
            min_ts=("warc_ts", "min"),
            max_ts=("warc_ts", "max"),
        )
        .reset_index()
    )
    return g.sort_values(["url", "bucket_s"]).reset_index(drop=True)


def test_1h_tier_matches_pandas_oracle(spark):
    pages = generate_pages(spark, 2000, seed=42)
    got = (
        finalize(partials_from_pages(pages, 3600))
        .select("url", "bucket_s", "n_points", "mean_len", "min_ts", "max_ts")
        .orderBy("url", "bucket_s")
        .toPandas()
        .reset_index(drop=True)
    )
    exp = _pandas_tier(pages_pandas(2000, seed=42), 3600)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_downsample_equals_direct(spark):
    """1d from 1h partials must equal 1d computed from raw pages."""
    pages = generate_pages(spark, 3000, seed=1)
    p1h = partials_from_pages(pages, TIER_SECONDS["1h"])
    via_partials = (
        finalize(downsample(p1h, TIER_SECONDS["1d"]))
        .orderBy("url", "bucket_s")
        .toPandas()
    )
    direct = (
        finalize(partials_from_pages(pages, TIER_SECONDS["1d"]))
        .orderBy("url", "bucket_s")
        .toPandas()
    )
    pd.testing.assert_frame_equal(via_partials, direct)


def test_30d_chain(spark):
    pages = generate_pages(spark, 2000, seed=3)
    p1h = partials_from_pages(pages, TIER_SECONDS["1h"])
    p30 = downsample(downsample(p1h, TIER_SECONDS["1d"]), TIER_SECONDS["30d"])
    direct = partials_from_pages(pages, TIER_SECONDS["30d"])
    a = finalize(p30).orderBy("url", "bucket_s").toPandas()
    b = finalize(direct).orderBy("url", "bucket_s").toPandas()
    pd.testing.assert_frame_equal(a, b)


def test_lang_hist_sums_to_count(spark):
    pages = generate_pages(spark, 1500, seed=5)
    t = finalize(partials_from_pages(pages, TIER_SECONDS["1d"]))
    bad = t.where(
        F.aggregate(F.map_values("lang_hist"), F.lit(0).cast("long"), lambda a, x: a + x)
        != F.col("n_points")
    )
    assert bad.count() == 0


def test_gap_fill(spark):
    rows = [
        ("u1", "2024-01-01 00:30:00", "x", "en"),
        ("u1", "2024-01-01 03:10:00", "y", "en"),
        ("u2", "2024-01-01 05:00:00", "z", "de"),
    ]
    pages = spark.createDataFrame(
        [(u, t, b"<html></html>", x, lang) for u, t, x, lang in rows],
        "url string, warc_ts string, html binary, text string, lang string",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    tier = finalize(partials_from_pages(pages, 3600))
    filled = gap_fill(tier, 3600).orderBy("url", "bucket_s").collect()
    u1 = [r for r in filled if r["url"] == "u1"]
    assert len(u1) == 4  # hours 00..03 densified
    assert [r["n_points"] for r in u1] == [1, 0, 0, 1]
    assert u1[1]["mean_len"] is None  # non-count columns stay NULL
    u2 = [r for r in filled if r["url"] == "u2"]
    assert len(u2) == 1
