"""Every shipped example workflow must compile and run end-to-end
(the reference ships runnable examples/*.json; so do we)."""

import json
import os

import pandas as pd

import pytest

from lambdo_spark.plans.compiler import Workflow, strip_comments

EXAMPLES = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples")


def _load(name):
    with open(os.path.join(EXAMPLES, name)) as f:
        return json.loads(strip_comments(f.read()))


def test_roll_families_example(spark):
    tables = Workflow(_load("roll_families.json"), spark).execute()
    out = tables["events"]
    for c in ("mean_10", "mean_5", "mean_2", "prev_value", "trend_up"):
        assert c in out.columns
    pdf = out.toPandas()
    # dropna on mean_10 → every surviving row has a full 10-window
    assert pdf["mean_10"].notna().all() and len(pdf) > 0


def test_link_aggregate_example(spark):
    tables = Workflow(_load("link_aggregate.json"), spark).execute()
    pdf = tables["customer"].toPandas()
    assert list(pdf.columns) == [
        "c_custkey", "c_name", "nation_name", "n_orders", "total_spend"
    ]
    assert pdf["nation_name"].notna().all()
    assert (pdf["n_orders"] >= 0).all()


def test_train_predict_example(spark, tmp_path):
    spec = _load("train_predict.json")
    art = str(tmp_path / "model.json")
    col = spec["tables"][0]["columns"][0]
    col["model"] = "$file:" + art
    tables = Workflow(spec, spark).execute()
    pdf = tables["lineitem"].toPandas()
    assert os.path.exists(art)
    # OLS residuals on real data: mean ~ 0 by construction
    assert abs(pdf["resid"].mean()) < 1e-6 * pdf["l_extendedprice"].abs().mean()


def test_rollup_pages_example(spark, tmp_path):
    from lambdo_spark.sources.pages import generate_pages

    path = str(tmp_path / "pages")
    generate_pages(spark, 3000, seed=3).write.parquet(path)
    spec = _load("rollup_pages.json")
    spec["tables"][0]["path"] = path
    tables = Workflow(spec, spark).execute()
    tier = tables["tier_1h"].toPandas()
    assert len(tier) > 0
    assert (tier["n_points"] >= 1).all()
    # workflow-language rollup must agree with the library tier engine
    from lambdo_spark.rollup.tiers import partials_from_pages

    lib = (
        partials_from_pages(spark.read.parquet(path), 3600)
        .groupBy("url", "bucket_s")
        .agg({"n_points": "sum"})
        .count()
    )
    assert len(tier) == lib


def test_sessions_tiers_example(spark):
    tables = Workflow(_load("sessions_tiers.json"), spark).execute()
    ev = tables["events"].toPandas()
    assert {"session_id", "d_value", "rate_x1m"} <= set(ev.columns)
    assert (ev["session_id"] >= 1).all()
    sess = tables["sessions"].toPandas()
    # sessions partition the events exactly
    assert sess["n_events"].sum() == len(ev)
    p95 = tables["p95_by_user"].toPandas()
    assert set(p95.columns) == {"user_id", "p95_value"}
    hh = tables["top_event_types"].toPandas()
    assert (hh.groupby("user_id")["rank"].max() <= 2).all()
    cube = tables["spend_cube"].toPandas()
    total = cube[cube["grouping_id"] == 3]
    assert len(total) == 1 and total["n"].iloc[0] == len(ev)


def test_training_data_prep_example(spark):
    """The LLM-corpus ingest flow as one workflow: analyze -> quality
    filter -> exact dedup -> minhash near-dup pairs. Each stage's
    contract checked against direct library calls."""
    from lambdo_spark.functions.dedup import dedup_exact, dedup_minhash_lsh
    from lambdo_spark.functions.text import analyze_documents

    tables = Workflow(_load("training_data_prep.json"), spark).execute()
    analyzed = tables["analyzed"].toPandas()
    assert {"n_tokens", "quality", "lang_guess", "fingerprint"} <= set(
        analyzed.columns
    )
    assert "keep" not in analyzed.columns  # predicate consumed (T8)
    assert (analyzed["quality"] >= 0.3).all()

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    expect = analyze_documents(docs).where("quality >= 0.3")
    uniq = tables["unique_docs"]
    # full rows survive, plus the example's scrub_pii calculate column
    assert set(uniq.columns) == set(expect.columns) | {"clean_text"}
    survivors = dedup_exact(expect, keep_rows=True)
    assert uniq.count() == survivors.count() == dedup_exact(expect).count()

    pairs = tables["near_dup_pairs"].toPandas()
    want = dedup_minhash_lsh(survivors, threshold=0.5, verify="token").toPandas()
    got = {tuple(r) for r in pairs[["id_a", "id_b"]].itertuples(index=False)}
    exp = {tuple(r) for r in want[["id_a", "id_b"]].itertuples(index=False)}
    assert got == exp and len(got) > 0


def test_distinct_sketch_example(spark):
    tables = Workflow(_load("distinct_sketch.json"), spark).execute()
    pdf = tables["daily_users"].toPandas()
    assert set(pdf.columns) == {"event_type", "bucket_s", "n_users_est"}
    assert (pdf["n_users_est"] > 0).all() and len(pdf) > 0


def test_user_kernels_example(spark):
    """imports + module:attr scalar and holistic rolling kernels +
    registry mad + fillna_value — the escape hatch, end-to-end from a
    workflow JSON file (paths relative to the repo root, as the CLI
    runs them)."""
    import numpy as np

    cwd = os.getcwd()
    os.chdir(os.path.dirname(EXAMPLES))
    try:
        tables = Workflow(_load("user_kernels.json"), spark).execute()
        pdf = (
            tables["events"]
            .toPandas()
            .sort_values(["user_id", "event_id"])
        )
    finally:
        os.chdir(cwd)
    assert np.allclose(pdf["log_value"], np.log1p(pdf["value"]))
    # fillna_value=0.0 filled the first 6 rows per key; later rows have
    # a genuine IQR
    one = pdf[pdf.user_id == pdf.user_id.iloc[0]]
    assert (one["iqr_7"].iloc[: min(6, len(one))] == 0.0).all()
    assert pdf["iqr_7"].notna().all()
    assert pdf["mad_7"].isna().sum() > 0  # no fillna on mad_7


def test_reference_example1_runs_unmodified(spark, tmp_path):
    """The REFERENCE's own examples/example1.json (pandas:read_csv
    source -> pandas:DataFrame.to_csv sink) compiles and runs with no
    structural edits — only the two path strings are repointed into
    tmp (the reference tree is read-only here)."""
    import shutil

    ref = "/root/reference/examples/example1.json"
    if not os.path.exists(ref):
        pytest.skip("reference examples not present")
    with open(ref) as f:
        spec = json.loads(strip_comments(f.read()))
    src_csv = str(tmp_path / "gspc.csv")
    shutil.copy("/root/reference/examples/^GSPC.csv", src_csv)
    out_csv = str(tmp_path / "example1-out.csv")
    spec["tables"][0]["model"]["filepath_or_buffer"] = src_csv
    spec["tables"][1]["model"]["path_or_buf"] = out_csv

    tables = Workflow(spec, spark).execute()
    assert tables["Source table"].count() == 1000  # nrows honored

    # the sink wrote ONE csv part a pandas reader can consume
    import glob

    parts = glob.glob(os.path.join(out_csv, "part-*.csv"))
    assert len(parts) == 1
    import pandas as pd

    pdf = pd.read_csv(parts[0])
    assert len(pdf) == 1000
    assert list(pdf.columns) == [
        "Date", "Open", "High", "Low", "Close", "Adj Close", "Volume"
    ]


def test_function_source_table(spark):
    """Generic 0-input function table (reference Table.py:499:
    func(**model) returns the populated frame)."""
    spec = {
        "tables": [
            {
                "id": "gen",
                "function": "tests.map_helpers:make_frame",
                "inputs": [],
                "model": {"n": 7},
            }
        ]
    }
    tables = Workflow(spec, spark).execute()
    assert tables["gen"].count() == 7


def test_reference_example2_runs_unmodified(spark, tmp_path):
    """Reference examples/example2.json: read_csv source + a
    window='one' pandas:to_datetime column (operation INFERRED, the
    well-known callable rewritten to the JVM to_timestamp kernel with
    strftime->JVM format translation) + column_filter exclude + csv
    sink. Only the two paths are repointed."""
    import shutil

    ref = "/root/reference/examples/example2.json"
    if not os.path.exists(ref):
        pytest.skip("reference examples not present")
    with open(ref) as f:
        spec = json.loads(strip_comments(f.read()))
    src_csv = str(tmp_path / "gspc.csv")
    shutil.copy("/root/reference/examples/^GSPC.csv", src_csv)
    out_csv = str(tmp_path / "example2-out.csv")
    spec["tables"][0]["model"]["filepath_or_buffer"] = src_csv
    spec["tables"][1]["model"]["path_or_buf"] = out_csv

    tables = Workflow(spec, spark).execute()
    src = tables["Source table"]
    assert dict(src.dtypes)["Date"].startswith("timestamp")
    assert "Adj Close" not in src.columns  # column_filter exclude
    assert src.count() == 1000

    import glob

    import pandas as pd

    parts = glob.glob(os.path.join(out_csv, "part-*.csv"))
    pdf = pd.read_csv(parts[0])
    assert len(pdf) == 1000
    assert "Adj Close" not in pdf.columns
    # to_datetime with %Y-%m-%d parsed correctly (first row 1990-01-02)
    assert pdf["Date"].min().startswith("1990-01-02")


def test_reference_example5_runs_unmodified(spark, tmp_path):
    """Reference examples/example5.json end-to-end in reference_compat
    mode: imports (examples.example3 from the reference tree),
    row-at-a-time diff_fn, Series.shift rewritten to the shift op,
    window-extension roll family (numpy:mean -> JVM avg) over implicit
    physical row order, dropna row_filter, csv sink. Only paths are
    repointed; the spec structure is byte-identical."""
    import shutil
    import sys

    ref = "/root/reference/examples/example5.json"
    if not os.path.exists(ref):
        pytest.skip("reference examples not present")
    with open(ref) as f:
        spec = json.loads(strip_comments(f.read()))
    src_csv = str(tmp_path / "gspc.csv")
    shutil.copy("/root/reference/examples/^GSPC.csv", src_csv)
    out_csv = str(tmp_path / "example5-out.csv")
    spec["tables"][0]["model"]["filepath_or_buffer"] = src_csv
    spec["tables"][2]["model"]["path_or_buf"] = out_csv

    sys.path.insert(0, "/root/reference")
    try:
        tables = Workflow(spec, spark, reference_compat=True).execute()
    finally:
        sys.path.remove("/root/reference")

    import glob

    import pandas as pd

    parts = glob.glob(os.path.join(out_csv, "part-*.csv"))
    got = pd.read_csv(parts[0]).sort_values("Date").reset_index(drop=True)
    # oracle: the same workflow in plain pandas (what the reference does)
    raw = pd.read_csv(src_csv, nrows=1000)
    raw["Date"] = pd.to_datetime(raw["Date"], format="%Y-%m-%d")
    raw["diff_high_low"] = raw["High"] - raw["Low"]
    raw["Close_Tomorrow"] = raw["Close"].shift(-1)
    del raw["Adj Close"]
    for i, w in enumerate((10, 5, 2)):
        raw[f"mean_Volume_{i}"] = raw["Volume"].rolling(w).mean()
    want = raw.dropna().reset_index(drop=True)

    assert len(got) == len(want) == 990
    assert set(got.columns) == set(want.columns)
    for c in ("diff_high_low", "Close_Tomorrow", "mean_Volume_0", "mean_Volume_2"):
        assert got[c].round(4).equals(want[c].round(4)), c


def test_continuous_tiers_example(spark):
    """Tier sink + pruned tier source, end-to-end declaratively: the
    daily table re-aggregates exactly the pruned hourly partials."""
    import shutil

    shutil.rmtree("/tmp/lambdo_example_tiers", ignore_errors=True)
    tables = Workflow(_load("continuous_tiers.json"), spark).execute()

    hourly = tables["hourly"].toPandas()
    recent = tables["hourly_recent"].toPandas()
    lo, hi = 1704067200, 1705276799
    in_range = hourly[(hourly.bucket_s >= lo) & (hourly.bucket_s <= hi)]
    assert len(recent) == len(in_range) > 0
    assert len(recent) < len(hourly)  # the prune actually cut files

    daily = tables["daily"].toPandas()
    want = (
        in_range.assign(day_s=(in_range.bucket_s // 86400) * 86400)
        .groupby(["day_s", "event_type"], as_index=False)
        .agg(n=("n", "sum"), sum_value=("sum_value", "sum"))
    )
    got = daily.sort_values(["day_s", "event_type"]).reset_index(drop=True)
    want = want.sort_values(["day_s", "event_type"]).reset_index(drop=True)
    assert got["n"].tolist() == want["n"].tolist()
    assert abs(got["sum_value"] - want["sum_value"]).max() < 1e-6

    # resumable: a second execution commits zero new partitions
    from lambdo_spark.sources.iceberg_layout import IcebergLayoutTable

    Workflow(_load("continuous_tiers.json"), spark).execute()
    assert IcebergLayoutTable("/tmp/lambdo_example_tiers").current_snapshot()[
        "new_parts"
    ] == []


def test_mergeable_tiers_example(spark):
    """The mergeable-aggregate chains as one workflow: each 1d table
    must equal the library chain called directly."""
    from lambdo_spark.rollup.timeseries import (
        counter_downsample,
        counter_finalize,
        counter_partials,
    )

    tables = Workflow(_load("mergeable_tiers.json"), spark).execute()
    m4 = tables["m4_1h"].toPandas()
    assert {"v_min", "v_max", "v_first", "v_last"} <= set(m4.columns)
    assert (m4["v_min"] <= m4["v_max"]).all()
    ev = tables["events"]
    lib = counter_finalize(
        counter_downsample(
            counter_partials(ev, "cents", "ts", 3600, ["user_id"]),
            86400, ["user_id"],
        )
    ).toPandas().sort_values(["user_id", "bucket_s"]).reset_index(drop=True)
    got = (
        tables["counter_1d"].toPandas()
        .sort_values(["user_id", "bucket_s"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, lib)
    twa = tables["twa_1d"].toPandas()
    assert (twa["covered_s"] <= 86400).all() and (twa["covered_s"] > 0).all()
    p95 = tables["p95_1d"].toPandas()
    assert (p95["p95_est"] % 100 == 0).all()


def test_training_data_prep_new_stages(spark):
    """Round-2 stages of the ingest example: Gopher flag column and
    the SQL summary stage."""
    tables = Workflow(_load("training_data_prep.json"), spark).execute()
    flagged = tables["gopher_flagged"].toPandas()
    assert flagged["gopher_keep"].isin([True, False]).all()
    stats = tables["corpus_stats"].toPandas()
    assert {"lang_guess", "n_docs", "n_gopher_keep", "avg_quality"} <= set(
        stats.columns
    )
    assert stats["n_docs"].sum() == len(flagged)
    assert (stats["n_gopher_keep"] <= stats["n_docs"]).all()


def test_training_data_prep_round3_stages(spark):
    """Round-3 stages of the ingest example: cluster labels with one
    representative each, contamination gate, and the stratified mix
    drawing only clean representatives."""
    tables = Workflow(_load("training_data_prep.json"), spark).execute()
    cl = tables["clusters"].toPandas()
    assert set(cl.columns) == {"doc_id", "cluster_id", "is_representative"}
    reps = cl[cl.is_representative == 1]
    assert reps.cluster_id.nunique() == len(reps) == cl.cluster_id.nunique()
    cont = tables["contamination"].toPandas()
    bench_ids = set(tables["bench"].toPandas()["doc_id"])
    flagged = set(cont[cont.contaminated == 1]["doc_id"])
    # every surviving benchmark doc self-contaminates
    assert bench_ids & set(cont["doc_id"]) <= flagged
    mix = tables["training_mix"].toPandas()
    assert (mix.groupby("lang_guess").size() <= 5).all()
    assert set(mix["doc_id"]) <= set(tables["clean_docs"].toPandas()["doc_id"])


def test_series_analytics_example(spark):
    tables = Workflow(_load("series_analytics.json"), spark).execute()
    an = tables["anomalies"].toPandas()
    assert {"zscore", "is_anomaly", "baseline_mean"} <= set(an.columns)
    assert len(an) > 0
    cs = tables["change_scores"].toPandas()
    assert (cs["cusum_pos"] >= 0).all() and (cs["cusum_neg"] >= 0).all()
    sm = tables["smoothed"].toPandas()
    assert sm["ewma"].notna().all()
    fc = tables["forecast"].toPandas()
    # 5 event types x 12 steps (every type has >= 48 hourly buckets)
    assert sorted(fc["h"].unique()) == list(range(1, 13))
    pw = tables["pairwise"].toPandas()
    assert len(pw) == 10  # C(5,2) unordered type pairs
    rc = tables["coupling"].toPandas()
    assert rc["rolling_corr"].notna().any()
