"""Per-url continuous aggregates at 1h/1d/30d retention tiers.

This is the Spark-first re-expression of lambdo's link+aggregate
pattern (reference: column-op aggregate /root/reference/lambdo/
Column.py:613-668 — group a fact table by a key, attach aggregates)
and its window families (`extensions`, /root/reference/lambdo/
utils.py:13-36 — same kernel at windows 10/5/2 becomes the same
aggregate at tiers 1h/1d/30d).

Scale design (the part lambdo, single-threaded pandas, cannot do):

* **Partial + final.** The unit of storage is the *partial* row
  ``(url, bucket_s, lang, n_points, sum_len, min_ts, max_ts)``.
  Partials are algebraic (sum/sum/min/max-mergeable), so the 1d tier
  is ONE ``groupBy`` over 1h partials and 30d over 1d — each a shuffle
  of already-aggregated data, orders of magnitude smaller than the
  page scan. No tier ever rescans raw pages except 1h.
* **Map-side combine.** All aggregates are Spark built-ins, so every
  shuffle here does partial hash-aggregation in the map task — a hot
  url contributes one pre-combined row per task, not one row per
  page. That (plus AQE skew splitting) is the first line of defense
  against zipf-skewed urls; `salting.py` covers kernels that cannot
  partially aggregate.
* **Exact merges.** Means are carried as (sum, count); histograms as
  per-lang partial rows merged by sum — never averaged averages.

Buckets are epoch-second longs (``bucket_s``) truncated with integer
arithmetic: identical semantics in Spark and the DuckDB oracle, and
"30 days" stays exact where calendar truncation has no unit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

TIER_SECONDS = {"1h": 3600, "1d": 86400, "30d": 2592000}

PARTIAL_COLS = ["url", "bucket_s", "lang", "n_points", "sum_len", "min_ts", "max_ts"]


def bucket_expr(ts_col: str, tier_seconds: int):
    """Truncate a timestamp column to an epoch-aligned bucket (seconds)."""
    u = F.unix_timestamp(F.col(ts_col))
    return (F.floor(u / F.lit(tier_seconds)) * F.lit(tier_seconds)).cast("long")


def partials_from_table(
    df: DataFrame,
    tier_seconds: int,
    key_col: str,
    ts_col: str,
    cat_col,
    measure,
) -> DataFrame:
    """Tier partials from any keyed timestamp table (one shuffle).

    ``measure`` / ``cat_col`` may be Column expressions; only the
    referenced columns are touched, so Catalyst prunes the rest (for
    pages: html/binary never leave the parquet scan).
    """
    cat = F.col(cat_col) if isinstance(cat_col, str) else cat_col
    # NULL category (undetected language) buckets under a sentinel:
    # it would otherwise become a NULL map key in finalize's
    # map_from_entries — a runtime error in Spark — and coalescing
    # HERE (not at finalize) keeps the sentinel a single merged group
    cat = F.coalesce(cat, F.lit("und"))
    m = F.col(measure) if isinstance(measure, str) else measure
    return (
        df.select(
            F.col(key_col).alias("url"),
            bucket_expr(ts_col, tier_seconds).alias("bucket_s"),
            cat.alias("lang"),
            m.alias("_len"),
            F.col(ts_col).alias("_ts"),
        )
        .groupBy("url", "bucket_s", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.sum("_len").alias("sum_len"),
            F.min("_ts").alias("min_ts"),
            F.max("_ts").alias("max_ts"),
        )
    )


def partials_from_pages(
    pages: DataFrame,
    tier_seconds: int = 3600,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """1h-tier partials straight from the pages scan (one shuffle)."""
    return partials_from_table(
        pages,
        tier_seconds,
        key_col=url_col,
        ts_col=ts_col,
        cat_col=lang_col,
        measure=F.length(F.col(text_col)).cast("long"),
    )


def downsample(partials: DataFrame, tier_seconds: int) -> DataFrame:
    """Re-aggregate finer partials into a coarser tier (exact merge)."""
    coarse = (F.floor(F.col("bucket_s") / F.lit(tier_seconds)) * F.lit(tier_seconds)).cast("long")
    return (
        partials.withColumn("bucket_s", coarse)
        .groupBy("url", "bucket_s", "lang")
        .agg(
            F.sum("n_points").alias("n_points"),
            F.sum("sum_len").alias("sum_len"),
            F.min("min_ts").alias("min_ts"),
            F.max("max_ts").alias("max_ts"),
        )
    )


def finalize(partials: DataFrame) -> DataFrame:
    """Partials → user-facing tier rows.

    ``(url, bucket_s, bucket timestamp, n_points, mean_len,
    lang_hist map<string,long>, min_ts, max_ts)``.
    """
    return (
        partials.groupBy("url", "bucket_s")
        .agg(
            F.sum("n_points").alias("n_points"),
            F.sum("sum_len").alias("sum_len"),
            F.min("min_ts").alias("min_ts"),
            F.max("max_ts").alias("max_ts"),
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("lang", "n_points")))
            ).alias("lang_hist"),
        )
        .select(
            "url",
            "bucket_s",
            F.timestamp_seconds(F.col("bucket_s")).alias("bucket"),
            "n_points",
            (F.col("sum_len").cast("double") / F.col("n_points")).alias("mean_len"),
            "lang_hist",
            "min_ts",
            "max_ts",
        )
    )


def gap_fill(
    tier: DataFrame,
    tier_seconds: int,
    key: str = "url",
    fill_zero: tuple[str, ...] = ("n_points",),
) -> DataFrame:
    """Densify each key's bucket series from its min to its max bucket.

    lambdo's ``fillna_value`` for empty groups (reference
    /root/reference/lambdo/Column.py:495-496, tests/test_aggregate.py:77-79)
    generalized to time gaps. Count-like columns fill with 0,
    everything else stays NULL.

    Plan shape (the 100 TB consideration): a dense grid can be 50-100×
    the real rows (measured 56.5M grid rows from 1.2M tier rows on the
    bench pages table), so the naive grid ``sequence``+``explode`` →
    left-join shuffles mostly *generated* rows. Instead this is ONE
    pass over the real rows: a per-key window computes each row's gap
    to its predecessor (``lag``), then the row is exploded into
    ``sequence(prev_bucket+step, own_bucket)`` — its gap buckets plus
    itself — and non-real rows are nulled with plain ``when``
    projections. All gap rows materialize AFTER the only exchange (the
    window's hash-partition on ``key``), so shuffle volume is the real
    rows only, independent of how sparse the series is; there is no
    join, no second scan of ``tier``, and the whole generate+project
    stays inside whole-stage codegen (an earlier variant built the gap
    rows with ``transform``+``struct`` — higher-order-function lambdas
    are interpreted, measured 10× slower than the join it replaced;
    this form measured 2.9× FASTER than the join).
    """
    others = [f for f in tier.schema.fields if f.name not in (key, "bucket_s")]
    step = F.lit(tier_seconds).cast("long")
    w = Window.partitionBy(key).orderBy("bucket_s")
    # first key row has no predecessor -> no gap range before it
    prepped = tier.withColumn(
        "_start",
        F.coalesce(F.lag("bucket_s").over(w) + step, F.col("bucket_s")),
    )
    exploded = prepped.select(
        key,
        F.col("bucket_s").alias("_own"),
        *[F.col(f.name) for f in others],
        F.explode(
            F.sequence(F.col("_start"), F.col("bucket_s"), step)
        ).alias("_b"),
    )
    is_real = F.col("_b") == F.col("_own")
    filled = exploded.select(
        key,
        F.col("_b").alias("bucket_s"),
        *[
            F.when(is_real, F.col(f.name)).alias(f.name)
            for f in others
        ],
    )
    for c in fill_zero:
        filled = filled.withColumn(c, F.coalesce(F.col(c), F.lit(0)))
    return filled.withColumn(
        "bucket", F.timestamp_seconds(F.col("bucket_s"))
    )


def rollup_all_tiers(pages: DataFrame) -> dict[str, DataFrame]:
    """The flagship pipeline: 1h from pages, 1d from 1h, 30d from 1d."""
    p1h = partials_from_pages(pages, TIER_SECONDS["1h"])
    p1d = downsample(p1h, TIER_SECONDS["1d"])
    p30d = downsample(p1d, TIER_SECONDS["30d"])
    return {"1h": finalize(p1h), "1d": finalize(p1d), "30d": finalize(p30d)}
