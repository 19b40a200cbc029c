from lambdo_spark.rollup.tiers import (
    TIER_SECONDS,
    partials_from_pages,
    partials_from_table,
    downsample,
    finalize,
    gap_fill,
)
from lambdo_spark.rollup.timeseries import (
    delta,
    distinct_per_bucket,
    distinct_sketch_downsample,
    distinct_sketch_finalize,
    distinct_sketch_partials,
    heavy_hitters,
    interpolate_linear,
    locf,
    order_stat,
    rate,
    session_table,
    sessionize,
)
from lambdo_spark.rollup.incremental import refresh_from_pages, read_finalized_tier
from lambdo_spark.rollup.compress_stage import compress_tier, decompress_tier
from lambdo_spark.rollup.pipeline import run_retention_pipeline

__all__ = [
    "TIER_SECONDS",
    "partials_from_pages",
    "partials_from_table",
    "downsample",
    "finalize",
    "gap_fill",
    "delta",
    "distinct_per_bucket",
    "distinct_sketch_downsample",
    "distinct_sketch_finalize",
    "distinct_sketch_partials",
    "heavy_hitters",
    "interpolate_linear",
    "locf",
    "order_stat",
    "rate",
    "session_table",
    "sessionize",
    "refresh_from_pages",
    "read_finalized_tier",
    "compress_tier",
    "decompress_tier",
    "run_retention_pipeline",
]
