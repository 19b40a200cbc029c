"""Streaming 1h partials must equal the batch tier on the same input
(the merge-compatibility invariant), and resume from checkpoint."""

import pandas as pd
import pytest

from pyspark.sql import functions as F

from lambdo_spark.rollup.tiers import partials_from_pages
from lambdo_spark.sources.pages import generate_pages
from lambdo_spark.streaming.rollup_stream import run_stream_to_parquet


@pytest.fixture()
def pages_parquet(spark, tmp_path):
    src = str(tmp_path / "pages_src")
    generate_pages(spark, 800, seed=42).write.parquet(src)
    return src


def _run(spark, src, out, ckpt):
    schema = spark.read.parquet(src).schema
    q = run_stream_to_parquet(
        spark, src, out, ckpt, schema, watermark="0 seconds"
    ).start()
    q.awaitTermination(120)
    q.stop()


def test_streamed_partials_equal_batch(spark, tmp_path, pages_parquet):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _run(spark, pages_parquet, out, ckpt)

    streamed = spark.read.parquet(out)
    batch = partials_from_pages(spark.read.parquet(pages_parquet), 3600)
    cols = ["url", "bucket_s", "lang", "n_points", "sum_len", "min_ts", "max_ts"]
    a = streamed.select(cols).orderBy(cols[:3]).toPandas()
    b = batch.select(cols).orderBy(cols[:3]).toPandas()
    # availableNow + append mode withholds windows the watermark has
    # not passed; with watermark=0s and finite input, everything at or
    # before (max_ts - 0) except the open tail window may be held back
    merged = a.merge(b, on=["url", "bucket_s", "lang"], suffixes=("_s", "_b"))
    assert len(merged) == len(a)  # every streamed row exists in batch
    assert (merged["n_points_s"] == merged["n_points_b"]).all()
    assert (merged["sum_len_s"] == merged["sum_len_b"]).all()
    assert len(a) >= 0.8 * len(b)  # only the watermark tail is held


def test_stream_resumes_from_checkpoint(spark, tmp_path, pages_parquet):
    out = str(tmp_path / "out2")
    ckpt = str(tmp_path / "ckpt2")
    _run(spark, pages_parquet, out, ckpt)
    n1 = spark.read.parquet(out).count()
    # re-run with the same checkpoint: no new input → no duplicate rows
    _run(spark, pages_parquet, out, ckpt)
    n2 = spark.read.parquet(out).count()
    assert n2 == n1
