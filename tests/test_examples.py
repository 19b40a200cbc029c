"""Every shipped example workflow must compile and run end-to-end
(the reference ships runnable examples/*.json; so do we)."""

import json
import os

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
