"""Generator determinism + hash-audit invariant (FIXTURES.md F1)."""

import pandas as pd

from lambdo_spark.rollup.audit import audit_hashes, audit_summary
from lambdo_spark.sources.pages import extract_text, generate_pages, pages_pandas


def test_deterministic_across_partitioning(spark):
    a = (
        generate_pages(spark, 800, seed=42, partitions=3)
        .orderBy("url", "warc_ts", "text")
        .toPandas()
    )
    b = (
        generate_pages(spark, 800, seed=42, partitions=11)
        .orderBy("url", "warc_ts", "text")
        .toPandas()
    )
    pd.testing.assert_frame_equal(a, b)


def test_matches_pandas_oracle(spark):
    a = (
        generate_pages(spark, 500, seed=7)
        .orderBy("url", "warc_ts", "text")
        .toPandas()
        .reset_index(drop=True)
    )
    o = (
        pages_pandas(500, seed=7)
        .sort_values(["url", "warc_ts", "text"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        a[["url", "warc_ts", "text", "lang"]], o[["url", "warc_ts", "text", "lang"]]
    )


def test_skewed_urls(spark):
    counts = (
        generate_pages(spark, 5000, seed=42)
        .groupBy("url")
        .count()
        .orderBy("count", ascending=False)
        .limit(1)
        .collect()
    )
    assert counts[0]["count"] > 5000 / 78 * 5  # hot url way above uniform


def test_hash_audit_clean(spark):
    pages = generate_pages(spark, 1000, seed=42)
    s = audit_summary(pages).collect()[0]
    assert s["total_rows"] == 1000 and s["violations"] == 0
    assert audit_hashes(pages).count() == 0


def test_hash_audit_catches_corruption(spark):
    from pyspark.sql import functions as F

    pages = generate_pages(spark, 200, seed=42).withColumn(
        "text", F.concat(F.col("text"), F.lit("!corrupt!"))
    )
    assert audit_summary(pages).collect()[0]["violations"] == 200


def test_extract_text_python_reference():
    html = b"<html><body>hello world</body></html>"
    assert extract_text(html) == "hello world"


def test_null_lang_buckets_under_sentinel(spark):
    """NULL lang (undetected language) must not crash the rollup —
    it buckets under 'und' and merges with explicit 'und' rows (the
    sentinel is applied BEFORE grouping, so map_from_entries never
    sees a NULL key)."""
    import datetime as dt

    from lambdo_spark.rollup.tiers import finalize, partials_from_pages

    t0 = dt.datetime(2024, 1, 1, 0, 30)
    pages = spark.createDataFrame(
        [
            ("http://a", t0, b"", "xx", None),
            ("http://a", t0, b"", "yyyy", "und"),
            ("http://a", t0, b"", "zzzzzz", "en"),
        ],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    tier = finalize(partials_from_pages(pages, 3600)).collect()
    assert len(tier) == 1
    row = tier[0]
    assert row["n_points"] == 3
    assert dict(row["lang_hist"]) == {"und": 2, "en": 1}
