"""Hash-audit stage: per-row invariant enforcement.

BASELINE.json input_hint: "per-row invariant vs the reference:
byte-identical extracted text per url". The audit re-extracts text
from the raw html executor-side and compares sha256 digests against
the stored ``text`` column — all with built-in JVM expressions
(``sha2``), no Python in the hot path. Violations are returned as a
(small) DataFrame for the caller to fail on or quarantine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _extracted_text_expr():
    # the reference extractor (sources/pages.py:extract_text) strips the
    # deterministic wrapper; expressed as JVM substring arithmetic on
    # the utf-8 bytes decoded to string
    s = F.decode(F.col("html"), "UTF-8")
    return F.regexp_replace(
        F.regexp_replace(s, r"^<html><body>", ""), r"</body></html>$", ""
    )


def audit_hashes(pages: DataFrame) -> DataFrame:
    """Rows whose stored text is NOT byte-identical to re-extraction."""
    return (
        pages.withColumn("_re", _extracted_text_expr())
        .withColumn("_h_stored", F.sha2(F.encode(F.col("text"), "UTF-8"), 256))
        .withColumn("_h_extracted", F.sha2(F.encode(F.col("_re"), "UTF-8"), 256))
        .where(F.col("_h_stored") != F.col("_h_extracted"))
        .select("url", "warc_ts", "_h_stored", "_h_extracted")
    )


def audit_summary(pages: DataFrame) -> DataFrame:
    """One-row summary: total rows, violations (0 = invariant holds)."""
    return (
        pages.withColumn("_re", _extracted_text_expr())
        .select(
            F.count(F.lit(1)).alias("total_rows"),
            F.sum(
                F.when(
                    F.sha2(F.encode(F.col("text"), "UTF-8"), 256)
                    != F.sha2(F.encode(F.col("_re"), "UTF-8"), 256),
                    1,
                ).otherwise(0)
            ).alias("violations"),
        )
    )
