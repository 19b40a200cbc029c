"""Punctuation-based stateful bucket finalizer
(streaming/stateful.py, applyInPandasWithState): closed buckets must
carry exactly the batch partials' algebra; the newest bucket per url
stays open in state; state survives a checkpointed restart."""

import glob
import os
import shutil

import pandas as pd
import pytest

from pyspark.sql import functions as F

from lambdo_spark.sources.pages import generate_pages
from lambdo_spark.streaming.stateful import punctuated_1h_finalizer


def _land(df, staging: str, src: str, name: str) -> str:
    """Write a parquet then move its part files flat into the stream
    source dir (file streams don't recurse into subdirectories)."""
    tmp = os.path.join(staging, name)
    df.write.parquet(tmp)
    os.makedirs(src, exist_ok=True)
    for i, f in enumerate(sorted(glob.glob(os.path.join(tmp, "part-*.parquet")))):
        shutil.copy(f, os.path.join(src, f"{name}-{i}.parquet"))
    return tmp


def _start(spark, src, out, ckpt, schema):
    stream = spark.readStream.schema(schema).format("parquet").load(src)
    q = (
        punctuated_1h_finalizer(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    q.stop()


def _batch_partials(spark, paths):
    pages = spark.read.parquet(*paths)
    return (
        pages.groupBy(
            "url",
            (F.floor(F.unix_timestamp("warc_ts") / 3600) * 3600)
            .cast("long")
            .alias("bucket_s"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.sum(F.length("text").cast("long")).alias("sum_len"),
            F.min(F.unix_timestamp("warc_ts")).alias("min_ts_s"),
            F.max(F.unix_timestamp("warc_ts")).alias("max_ts_s"),
        )
        .toPandas()
    )


def test_punctuated_finalizer_matches_batch_and_resumes(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    staging = str(tmp_path / "staging")

    p1 = generate_pages(spark, 600, seed=11)
    f1 = _land(p1, staging, src, "f1")
    schema = spark.read.parquet(f1).schema

    _start(spark, src, out, ckpt, schema)
    emitted1 = spark.read.parquet(out).toPandas()

    batch1 = _batch_partials(spark, [f1])
    newest = batch1.groupby("url")["bucket_s"].max().rename("newest")
    b1 = batch1.join(newest, on="url")
    expected_closed = b1[b1.bucket_s < b1.newest]
    # every url's non-newest bucket is emitted, with exact partials
    m = emitted1.merge(
        expected_closed, on=["url", "bucket_s"], suffixes=("_got", "_exp")
    )
    assert len(m) == len(emitted1) == len(expected_closed)
    for c in ("n_points", "sum_len", "min_ts_s", "max_ts_s"):
        assert (m[f"{c}_got"] == m[f"{c}_exp"]).all()

    # restart with a later file: previously-open buckets close IF the
    # new data has newer buckets for that url; merged counts must
    # include the state carried across the restart
    p2 = generate_pages(spark, 600, seed=12)
    f2 = _land(p2, staging, src, "f2")
    _start(spark, src, out, ckpt, schema)
    emitted2 = spark.read.parquet(out).toPandas()
    assert len(emitted2) > len(emitted1)

    both = _batch_partials(spark, [f1, f2])
    newest2 = both.groupby("url")["bucket_s"].max().rename("newest")
    b2 = both.join(newest2, on="url")
    exp2 = b2[b2.bucket_s < b2.newest]
    # late rows for an already-closed bucket re-emit as an ADDITIONAL
    # partial (the documented punctuation caveat) — emitted rows are
    # algebraic partials, so merge them before comparing
    got2 = (
        emitted2.groupby(["url", "bucket_s"], as_index=False)
        .agg(
            n_points=("n_points", "sum"),
            sum_len=("sum_len", "sum"),
            min_ts_s=("min_ts_s", "min"),
            max_ts_s=("max_ts_s", "max"),
        )
    )
    m2 = got2.merge(exp2, on=["url", "bucket_s"], suffixes=("_got", "_exp"))
    # every closed bucket is present and exact — buckets that closed
    # only after the restart prove state carried across it
    assert len(m2) == len(exp2) == len(got2)
    closed_after_restart = set(map(tuple, got2[["url", "bucket_s"]].values)) - set(
        map(tuple, emitted1[["url", "bucket_s"]].values)
    )
    assert closed_after_restart
    for c in ("n_points", "sum_len", "min_ts_s", "max_ts_s"):
        assert (m2[f"{c}_got"] == m2[f"{c}_exp"]).all()
