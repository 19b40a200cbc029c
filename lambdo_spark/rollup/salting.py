"""Skew-defeating salted aggregation (two-phase, exact).

Why: at 10^12 pages a zipf-hot url can put an entire reduce partition
on one straggler. For Spark *built-in* aggregates the map-side partial
hash-aggregation already pre-combines hot keys per task (see
tiers.py), and AQE splits skewed shuffle partitions. But custom
pandas-UDF kernels (``applyInPandas``) have NO partial aggregation —
every raw row of a hot key lands in one group. This module restores
the partial+final shape manually:

  phase 1: groupBy(key + salt)  — hot key split across S reducers
  phase 2: groupBy(key)         — merge S partials (tiny input)

Correctness requires *algebraic* merges: carry (sum, count) not mean,
min/max, map-merge for histograms — never average averages
(SURVEY.md §7.3 "Skewed hot urls").

The salt fan-out is chosen per key from a frequency sketch of the
actual data (one cheap sample pass) so cold keys keep salt=0 and pay
no extra merge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def key_frequency_sketch(
    df: DataFrame, keys: list[str], threshold: int, sample_fraction: float = 0.01
) -> DataFrame:
    """Approximate per-key row counts from a sample; returns only keys
    whose *estimated* full count exceeds ``threshold`` (the hot set —
    small by construction, safe to broadcast)."""
    frac = min(1.0, sample_fraction)
    est = 1.0 / frac
    return (
        df.sample(fraction=frac, seed=7)
        .groupBy(*keys)
        .agg((F.count(F.lit(1)) * F.lit(est)).alias("_est_rows"))
        .where(F.col("_est_rows") > threshold)
    )


def with_salt(
    df: DataFrame,
    keys: list[str],
    hot_keys: DataFrame | None = None,
    buckets: int = 32,
    salt_col: str = "_salt",
) -> DataFrame:
    """Add a salt column: uniform hash-mod for hot keys, 0 for cold.

    With ``hot_keys=None`` every key is salted (simple mode).

    The salt is a DETERMINISTIC function of the full row content
    (xxhash64 over every column) — a nondeterministic source
    (monotonically_increasing_id, rand) feeding a shuffle is a
    correctness bug: a recomputed map task after a fetch failure can
    re-salt rows differently, double-counting some partials and
    dropping others. The cost of determinism: rows that are
    byte-identical land in the same salt bucket; at web scale
    identical rows of one key are the pathological case map-side
    combine already collapses, so the trade is right.
    """
    salt: Column = F.pmod(
        F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(buckets)
    )
    if hot_keys is None:
        return df.withColumn(salt_col, salt)
    # duplicate hot-key rows (caller-built frames carry no uniqueness
    # guarantee) would MULTIPLY fact rows through the join — dedup
    hot = hot_keys.select(*keys).dropDuplicates(keys).select(
        *keys, F.lit(True).alias("_is_hot")
    )
    return (
        df.join(F.broadcast(hot), keys, "left")
        .withColumn(salt_col, F.when(F.col("_is_hot"), salt).otherwise(F.lit(0)))
        .drop("_is_hot")
    )


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    merge_aggs: list[Column],
    hot_keys: DataFrame | None = None,
    buckets: int = 32,
) -> DataFrame:
    """Exact two-phase aggregation over possibly-skewed keys.

    ``partial_aggs`` run per (keys + salt); ``merge_aggs`` combine the
    partials per keys. Both lists must be aliased, and merge must be
    algebraic over partial's outputs, e.g.::

        partial = [F.count('*').alias('c'), F.sum('x').alias('s')]
        merge   = [F.sum('c').alias('c'),   F.sum('s').alias('s')]
    """
    salted = with_salt(df, keys, hot_keys=hot_keys, buckets=buckets)
    phase1 = salted.groupBy(*keys, "_salt").agg(*partial_aggs)
    return phase1.groupBy(*keys).agg(*merge_aggs)
