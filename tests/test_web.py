"""URL canonicalization: messy crawl-url variants must fold to one key."""

from pyspark.sql import functions as F

from lambdo_spark.functions.web import canonical_url, registered_domain, url_host

CASES = [
    # (raw, canonical)
    ("https://WWW.Example.com:443/a/b?id=3#frag", "https://example.com/a/b?id=3"),
    ("HTTP://example.com:80/", "http://example.com"),
    ("https://example.com/a?utm_source=x&id=3", "https://example.com/a?id=3"),
    ("https://example.com/a?id=3&utm_source=x&utm_medium=y", "https://example.com/a?id=3"),
    ("https://example.com/a?utm_source=x", "https://example.com/a"),
    ("https://example.com/a?fbclid=abc&gclid=def&q=1", "https://example.com/a?q=1"),
    ("https://sub.shop.example.com/P?Q=Mixed", "https://sub.shop.example.com/P?Q=Mixed"),
    ("not a url at all", "not a url at all"),
    ("https://example.com:8080/x", "https://example.com:8080/x"),  # non-default port kept
]


def test_canonical_url_cases(spark):
    df = spark.createDataFrame([(r,) for r, _ in CASES], "raw string")
    got = [
        r["c"]
        for r in df.select(canonical_url(F.col("raw")).alias("c"))
        .collect()
    ]
    assert got == [c for _, c in CASES]


def test_host_and_domain(spark):
    df = spark.createDataFrame(
        [("https://WWW.Sub.Shop.Example.co:8443/x?y#z",), ("junk",)],
        "raw string",
    )
    rows = df.select(
        url_host(F.col("raw")).alias("h"),
        registered_domain(F.col("raw")).alias("d"),
    ).collect()
    assert (rows[0]["h"], rows[0]["d"]) == ("sub.shop.example.co", "example.co")
    assert (rows[1]["h"], rows[1]["d"]) == ("", "")


def test_canonicalize_folds_dedup_keys(spark):
    """The point of the op: variants of one page collapse to ONE
    exact-dedup group."""
    variants = [
        "https://www.example.com/page?utm_source=tw",
        "HTTPS://EXAMPLE.COM/page#top",
        "https://example.com:443/page",
    ]
    df = spark.createDataFrame([(v,) for v in variants], "url string")
    n = (
        df.select(canonical_url(F.col("url")).alias("k"))
        .distinct()
        .count()
    )
    assert n == 1


def test_url_kernels_in_workflow(spark):
    """canonical_url / url_host / registered_domain are registry
    kernels, so JSON workflows can build crawl dedup keys with a plain
    `calculate` op (reference Column.py:170-260 calculate shape)."""
    from lambdo_spark.plans.compiler import Workflow

    wf = {
        "tables": [
            {"id": "crawl", "operation": "data",
             "columns": [
                 {"id": "key", "operation": "calculate",
                  "kernel": "canonical_url", "inputs": ["url"]},
                 {"id": "host", "operation": "calculate",
                  "kernel": "url_host", "inputs": ["url"]},
                 {"id": "domain", "operation": "calculate",
                  "kernel": "registered_domain", "inputs": ["url"]},
             ]},
        ],
    }
    data = {"crawl": spark.createDataFrame(
        [("https://WWW.Example.com:443/a?utm_source=x&id=3#f",)],
        "url string")}
    row = Workflow(wf, spark, data).execute()["crawl"].collect()[0]
    assert row["key"] == "https://example.com/a?id=3"
    assert row["host"] == "example.com"
    assert row["domain"] == "example.com"
