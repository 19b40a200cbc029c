from lambdo_spark.rollup.tiers import (
    TIER_SECONDS,
    partials_from_pages,
    partials_from_table,
    downsample,
    finalize,
    gap_fill,
)

__all__ = [
    "TIER_SECONDS",
    "partials_from_pages",
    "partials_from_table",
    "downsample",
    "finalize",
    "gap_fill",
]
