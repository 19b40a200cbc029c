"""Streaming workflow language (plans/compiler.py): `stream: true`
sources, window_aggregate (batch == stream on the same input), dedup,
and stream_sink — the declarative spec runs unchanged in either mode."""


import os
import shutil

from pyspark.sql import functions as F

from lambdo_spark.plans.compiler import Workflow

EVENTS = "/root/testdata/sf0.001/events.parquet"


def _wf(src_extra: str, sink: str) -> str:
    return (
        '{"tables": ['
        '{"id": "events", "operation": "source", "format": "parquet",'
        f' "path": "%(path)s"{src_extra}}},'
        '{"id": "hourly", "operation": "window_aggregate", "source": "events",'
        ' "ts": "ts", "duration": "1 hour", "keys": ["event_type"],'
        ' "aggregations": [{"id": "n", "kernel": "count"},'
        '  {"id": "max_value", "kernel": "max", "inputs": ["value"]}]}'
        f"{sink}]}}"
    )


def _batch_expected(spark):
    return (
        spark.read.parquet(EVENTS)
        .groupBy(
            (F.floor(F.unix_timestamp("ts") / 3600) * 3600).alias("bucket_s"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"), F.max("value").alias("max_value"))
    )


def _canon(df_or_pdf):
    pdf = df_or_pdf if hasattr(df_or_pdf, "sort_values") else df_or_pdf.toPandas()
    return (
        pdf.sort_values(["bucket_s", "event_type"])
        .reset_index(drop=True)
        .astype({"bucket_s": "int64", "n": "int64"})
    )


def test_window_aggregate_batch(spark):
    spec = _wf("", "") % {"path": EVENTS}
    tables = Workflow(spec, spark).execute()
    got = _canon(tables["hourly"])
    exp = _canon(_batch_expected(spark))
    assert got.equals(exp)


def test_window_aggregate_stream_parity(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    shutil.copy(EVENTS, os.path.join(src, "e-0.parquet"))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    spec = _wf(
        ', "stream": true, "watermark": {"ts": "ts", "delay": "0 seconds"}',
        ', {"id": "to_parquet", "operation": "stream_sink", "source": "hourly",'
        f' "path": "{out}", "checkpoint": "{ckpt}"}}',
    ) % {"path": src}
    wf = Workflow(spec, spark)
    wf.execute()
    assert "to_parquet" in wf.streams
    wf.await_streams(timeout=300)

    streamed = _canon(spark.read.parquet(out))
    batch = _canon(_batch_expected(spark))
    # append mode withholds windows the watermark has not passed —
    # everything emitted must match batch exactly, and only the open
    # tail may be held back
    merged = streamed.merge(
        batch, on=["bucket_s", "event_type"], suffixes=("_s", "_b")
    )
    assert len(merged) == len(streamed)
    assert (merged["n_s"] == merged["n_b"]).all()
    assert (merged["max_value_s"] == merged["max_value_b"]).all()
    assert len(streamed) >= 0.8 * len(batch)


def test_workflow_stream_dedup(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    shutil.copy(EVENTS, os.path.join(src, "e-0.parquet"))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    spec = (
        '{"tables": ['
        '{"id": "events", "operation": "source", "format": "parquet",'
        f' "path": "{src}", "stream": true,'
        # delay spans the whole dataset: first-seen is global no matter
        # how availableNow splits the files into micro-batches
        ' "watermark": {"ts": "ts", "delay": "90 days"}},'
        '{"id": "by_user", "operation": "dedup", "source": "events",'
        ' "keys": ["user_id"]},'
        '{"id": "sink", "operation": "stream_sink", "source": "by_user",'
        f' "path": "{out}", "checkpoint": "{ckpt}"}}'
        "]}"
    )
    wf = Workflow(spec, spark)
    wf.execute()
    wf.await_streams(timeout=300)
    got = spark.read.parquet(out)
    users_all = spark.read.parquet(EVENTS).select("user_id").distinct().count()
    assert got.count() == got.select("user_id").distinct().count() == users_all


def test_window_aggregate_sliding(spark):
    """slide=30m, duration=1h: every event lands in exactly the two
    windows starting at floor(ts/1800)*1800 and 1800 earlier."""
    from lambdo_spark.operators.table_ops import window_aggregate

    ev = spark.read.parquet(EVENTS)
    got = _canon(
        window_aggregate(
            ev, "ts", "1 hour", ["event_type"],
            [{"id": "n", "kernel": "count"},
             {"id": "max_value", "kernel": "max", "inputs": ["value"]}],
            slide="30 minutes",
        )
    )
    half = (F.floor(F.unix_timestamp("ts") / 1800) * 1800).cast("long")
    exp = _canon(
        ev.withColumn(
            "bucket_s", F.explode(F.array(half, half - 1800))
        )
        .groupBy("bucket_s", "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.max("value").alias("max_value"))
    )
    assert got.equals(exp)


def test_stream_static_link_compose(spark, tmp_path):
    """link/compose against a static dim table works on a streaming
    fact source (stream-static left join), as docs/workflow_spec.md
    promises."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    shutil.copy(EVENTS, os.path.join(src, "e-0.parquet"))
    dim_path = str(tmp_path / "dim")
    users = spark.read.parquet(EVENTS).select("user_id").distinct()
    users.withColumn(
        "tier", F.when(F.col("user_id") % 2 == 0, "even").otherwise("odd")
    ).write.parquet(dim_path)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    spec = (
        '{"tables": ['
        f'{{"id": "dim", "operation": "source", "path": "{dim_path}"}},'
        '{"id": "events", "operation": "source", "format": "parquet",'
        f' "path": "{src}", "stream": true,'
        ' "columns": ['
        '  {"id": "u", "operation": "link", "keys": ["user_id"],'
        '   "linked_table": "dim", "linked_keys": ["user_id"]},'
        '  {"id": "tier", "operation": "compose", "link": "u",'
        '   "linked_table": "dim", "linked_keys": ["user_id"],'
        '   "target": "tier"}],'
        ' "column_filter": ["event_id", "user_id", "tier"]},'
        '{"id": "sink", "operation": "stream_sink", "source": "events",'
        f' "path": "{out}", "checkpoint": "{ckpt}"}}'
        "]}"
    )
    wf = Workflow(spec, spark)
    wf.execute()
    wf.await_streams(timeout=300)
    got = spark.read.parquet(out).toPandas()
    assert len(got) == spark.read.parquet(EVENTS).count()
    assert (
        got["tier"] == got["user_id"].map(lambda u: "even" if u % 2 == 0 else "odd")
    ).all()


def test_stream_sink_upsert_format(spark, tmp_path):
    """stream_sink format=upsert: a CDC delta stream continuously
    MERGEd into an Iceberg-layout table from the workflow language —
    merge-on-read, exactly-once per micro-batch."""
    from lambdo_spark.sources.iceberg_layout import IcebergLayoutTable

    root = str(tmp_path / "t")
    t = IcebergLayoutTable(root)
    t.write_tier(spark.createDataFrame(
        [(f"u{i}", i, float(i), 0) for i in range(8)],
        "url string, bucket_s bigint, v double, part bigint",
    ))
    v0 = dict(t.part_versions())
    src = str(tmp_path / "src")
    os.makedirs(src)
    spark.createDataFrame(
        [("u0", 0, 99.0, 0), ("new", 777, 1.0, 0)],
        "url string, bucket_s bigint, v double, part bigint",
    ).coalesce(1).write.parquet(str(tmp_path / "stage"))
    import glob as _g
    shutil.copy(
        _g.glob(str(tmp_path / "stage" / "part-*.parquet"))[0],
        os.path.join(src, "d-0.parquet"),
    )
    spec = (
        '{"tables": ['
        '{"id": "deltas", "operation": "source", "format": "parquet",'
        f' "path": "{src}", "stream": true}},'
        '{"id": "sink", "operation": "stream_sink", "source": "deltas",'
        ' "format": "upsert", "keys": ["url", "bucket_s"],'
        f' "path": "{root}", "checkpoint": "{tmp_path}/ckpt"}}'
        "]}"
    )
    wf = Workflow(spec, spark)
    wf.execute()
    wf.await_streams(timeout=300)
    back = t.read_tier(spark)
    assert back.count() == 9
    assert back.where("url='u0' and bucket_s=0").first()["v"] == 99.0
    assert t.part_versions() == v0  # merge-on-read: no base rewrite


def test_stream_sink_rejects_batch_source(spark, tmp_path):
    spec = (
        '{"tables": ['
        '{"id": "events", "operation": "source", "format": "parquet",'
        f' "path": "{EVENTS}"}},'
        '{"id": "sink", "operation": "stream_sink", "source": "events",'
        f' "path": "{tmp_path}/o", "checkpoint": "{tmp_path}/c"}}'
        "]}"
    )
    import pytest

    with pytest.raises(ValueError, match="batch table"):
        Workflow(spec, spark).execute()


def test_m4_kernels_stream_parity(spark, tmp_path):
    """M4 via window_aggregate's first_by/last_by kernels (struct
    min/max — algebraic, so streaming-state safe) equals the batch
    m4_downsample library op on the same input."""
    from lambdo_spark.rollup.timeseries import m4_downsample

    src = str(tmp_path / "src")
    os.makedirs(src)
    shutil.copy(EVENTS, os.path.join(src, "e-0.parquet"))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    spec = (
        '{"tables": ['
        '{"id": "events", "operation": "source", "format": "parquet",'
        f' "path": "{src}", "stream": true,'
        ' "watermark": {"ts": "ts", "delay": "0 seconds"},'
        ' "columns": [{"id": "ts_s", "operation": "calculate",'
        '   "kernel": "int", "inputs": ["ts"]}]},'
        '{"id": "m4", "operation": "window_aggregate", "source": "events",'
        ' "ts": "ts", "duration": "1 hour", "keys": ["user_id"],'
        ' "aggregations": ['
        '  {"id": "n_points", "kernel": "count"},'
        '  {"id": "v_min", "kernel": "min", "inputs": ["value"]},'
        '  {"id": "v_max", "kernel": "max", "inputs": ["value"]},'
        '  {"id": "v_first", "kernel": "first_by", "inputs": ["value", "ts_s"]},'
        '  {"id": "v_last", "kernel": "last_by", "inputs": ["value", "ts_s"]}]},'
        '{"id": "sink", "operation": "stream_sink", "source": "m4",'
        f' "path": "{out}", "checkpoint": "{ckpt}"}}'
        "]}"
    )
    wf = Workflow(spec, spark)
    wf.execute()
    wf.await_streams(timeout=300)

    streamed = (
        spark.read.parquet(out).toPandas()
        .sort_values(["user_id", "bucket_s"]).reset_index(drop=True)
    )
    batch = (
        m4_downsample(spark.read.parquet(EVENTS), "value", "ts", 3600,
                      ["user_id"])
        .drop("first_ts_s", "last_ts_s")
        .toPandas()
        .sort_values(["user_id", "bucket_s"]).reset_index(drop=True)
    )
    merged = streamed.merge(
        batch, on=["user_id", "bucket_s"], suffixes=("_s", "_b")
    )
    assert len(merged) == len(streamed) > 0
    for c in ("n_points", "v_min", "v_max", "v_first", "v_last"):
        assert (merged[f"{c}_s"] == merged[f"{c}_b"]).all()


def test_rowlocal_corpus_ops_stream_parity(spark, tmp_path):
    """Row-local corpus-prep stages (quality_filter flag + scrub_pii
    calculate kernel) run UNCHANGED on a streaming source: the same
    spec in batch and stream mode produces identical rows — the
    ingest-time half of the pipeline works on a live crawl feed."""
    docs_src = "/root/testdata/sf0.001/documents.parquet"
    spec_body = (
        '{"tables": ['
        '{"id": "docs", "operation": "source", "format": "parquet",'
        ' "path": "%(path)s"%(stream)s},'
        '{"id": "gated", "operation": "quality_filter", "source": "docs",'
        ' "text": "text", "flag": "keep",'
        ' "rules": {"min_words": 10, "min_distinct_stopwords": 0},'
        ' "columns": [{"id": "clean_text", "operation": "calculate",'
        '   "kernel": "scrub_pii", "inputs": ["text"]}]}'
        "%(sink)s]}"
    )
    batch = Workflow(spec_body % {"path": docs_src, "stream": "", "sink": ""},
                     spark).execute()["gated"].toPandas()

    src = str(tmp_path / "src")
    os.makedirs(src)
    shutil.copy(docs_src, os.path.join(src, "d-0.parquet"))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    wf = Workflow(spec_body % {
        "path": src, "stream": ', "stream": true',
        "sink": (', {"id": "to_parquet", "operation": "stream_sink",'
                 f' "source": "gated", "path": "{out}",'
                 f' "checkpoint": "{ckpt}"}}'),
    }, spark)
    wf.execute()
    wf.await_streams(timeout=300)
    streamed = spark.read.parquet(out).toPandas()

    key = ["doc_id"]
    b = batch.sort_values(key).reset_index(drop=True)
    s = streamed[batch.columns].sort_values(key).reset_index(drop=True)
    assert b.equals(s)
    assert "clean_text" in b.columns and b["keep"].isin([True, False]).all()


def test_stream_source_schema_inference_respects_csv_options(spark, tmp_path):
    """Schema inference for a stream source must use the same reader
    recipe as the batch source op (header + inferSchema for csv) — a
    bare read would treat the header row as data and hand the stream
    an all-string _c0/_c1 schema."""
    import os

    d = str(tmp_path / "csvsrc")
    os.makedirs(d)
    with open(os.path.join(d, "a.csv"), "w") as fh:
        fh.write("url,n\nhttp://a,1\nhttp://b,2\n")
    w = Workflow(
        {"tables": [
            {"id": "ev", "stream": True, "format": "csv", "path": d,
             "options": {"header": "true"}},
        ]},
        spark,
    )
    df = w.execute()["ev"]
    assert df.isStreaming
    assert df.columns == ["url", "n"]
    assert dict(df.dtypes)["n"] in ("int", "bigint")


def test_workflow_stream_ewma_and_cusum(spark, tmp_path):
    """The ewma/cusum workflow ops dispatch to their stateful twins on
    a streaming source; emitted rows must equal the batch recursions
    over the (single-file) processed prefix."""
    import datetime as dt
    import glob

    import pandas as pd

    src = str(tmp_path / "src")
    os.makedirs(src)
    rows = [("u", dt.datetime(2024, 1, 1, 0, m), float(v))
            for m, v in enumerate([10, 20, 5, 40, 15])]
    spark.createDataFrame(rows, "k string, ts timestamp, v double").coalesce(
        1
    ).write.parquet(str(tmp_path / "stage"))
    shutil.copy(
        glob.glob(str(tmp_path / "stage" / "part-*.parquet"))[0],
        os.path.join(src, "e-0.parquet"),
    )
    out1, ck1 = str(tmp_path / "o1"), str(tmp_path / "c1")
    out2, ck2 = str(tmp_path / "o2"), str(tmp_path / "c2")
    spec = (
        '{"tables": ['
        '{"id": "ev", "operation": "source", "format": "parquet",'
        f' "path": "{src}", "stream": true,'
        ' "schema": "k string, ts timestamp, v double"},'
        '{"id": "sm", "operation": "ewma", "source": "ev",'
        ' "keys": ["k"], "value": "v", "order": ["ts"], "alpha": 0.4},'
        '{"id": "cs", "operation": "cusum", "source": "ev",'
        ' "keys": ["k"], "value": "v", "order": ["ts"],'
        ' "target": 15, "slack": 2},'
        '{"id": "s1", "operation": "stream_sink", "source": "sm",'
        f' "path": "{out1}", "checkpoint": "{ck1}"}},'
        '{"id": "s2", "operation": "stream_sink", "source": "cs",'
        f' "path": "{out2}", "checkpoint": "{ck2}"}}'
        "]}"
    )
    wf = Workflow(spec, spark)
    wf.execute()
    wf.await_streams(timeout=300)

    vals = [10.0, 20.0, 5.0, 40.0, 15.0]
    sm = spark.read.parquet(out1).toPandas().sort_values("ts_s")
    exp = pd.Series(vals).ewm(alpha=0.4, adjust=True).mean()
    assert [round(x, 9) for x in sm["ewma"]] == [round(x, 9) for x in exp]

    cs = spark.read.parquet(out2).toPandas().sort_values("ts_s")
    sp = sn = 0
    exp_p, exp_n = [], []
    for v in vals:
        sp = max(0, sp + (int(v) - 15 - 2))
        sn = max(0, sn - (int(v) - 15 + 2))
        exp_p.append(sp)
        exp_n.append(sn)
    assert list(cs["cusum_pos"]) == exp_p
    assert list(cs["cusum_neg"]) == exp_n


def test_workflow_stream_anomaly_dispatch(spark, tmp_path):
    """The anomaly op on a streaming source routes to the stateful
    seasonal detector (rows flow through stream_sink)."""
    import datetime as dt
    import glob as _glob

    src = str(tmp_path / "src")
    os.makedirs(src)
    rows = [("u", d * 86400, 100 + d % 3) for d in range(8)] + [
        ("u", 8 * 86400, 999)
    ]
    spark.createDataFrame(rows, "k string, bucket_s long, v long").coalesce(
        1
    ).write.parquet(str(tmp_path / "stage"))
    shutil.copy(
        _glob.glob(str(tmp_path / "stage" / "part-*.parquet"))[0],
        os.path.join(src, "e-0.parquet"),
    )
    out, ck = str(tmp_path / "o"), str(tmp_path / "c")
    spec = (
        '{"tables": ['
        '{"id": "h", "operation": "source", "format": "parquet",'
        f' "path": "{src}", "stream": true,'
        ' "schema": "k string, bucket_s long, v long"},'
        '{"id": "an", "operation": "anomaly", "source": "h",'
        ' "keys": ["k"], "value": "v", "bucket": "bucket_s",'
        ' "lookback": 7, "min_prior": 3, "threshold": 2.0},'
        '{"id": "s", "operation": "stream_sink", "source": "an",'
        f' "path": "{out}", "checkpoint": "{ck}"}}'
        "]}"
    )
    wf = Workflow(spec, spark)
    wf.execute()
    wf.await_streams(timeout=300)
    got = spark.read.parquet(out).toPandas().sort_values("bucket_s")
    assert len(got) == len(rows)
    assert list(got[got["is_anomaly"]]["bucket_s"]) == [8 * 86400]
