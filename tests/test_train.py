"""C10 train/apply: distributed closed-form OLS, $file artifacts,
and the compiler's fit-or-load path (reference Column.py:844-956,
tests/test_train.py)."""

import os

import numpy as np
import pytest

from lambdo_spark.functions.train import (
    fit_linear,
    fit_linear_exact1,
    load_model,
    predict_expr,
    resolve_model,
    save_model,
)
from lambdo_spark.plans.compiler import compile_workflow


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_fit_linear_recovers_exact_line(spark):
    rows = [(float(x), 3.0 * x + 7.0) for x in range(10)]
    df = _df(spark, rows, "x double, y double")
    m = fit_linear(df, ["x"], "y")
    assert m["n"] == 10
    assert abs(m["weights"][0] - 3.0) < 1e-9
    assert abs(m["intercept"] - 7.0) < 1e-9


def test_fit_linear_multifeature_matches_numpy(spark):
    rng = np.random.default_rng(11)
    x = rng.normal(size=(60, 3))
    y = x @ np.array([2.0, -1.5, 0.5]) + 4.0 + rng.normal(scale=0.01, size=60)
    rows = [(float(a), float(b), float(c), float(t)) for (a, b, c), t in zip(x, y)]
    df = _df(spark, rows, "a double, b double, c double, y double")
    m = fit_linear(df, ["a", "b", "c"], "y")
    ref, *_ = np.linalg.lstsq(
        np.column_stack([np.ones(60), x]), y, rcond=None
    )
    assert np.allclose([m["intercept"], *m["weights"]], ref, atol=1e-8)


def test_fit_linear_exact1_matches_manual_formula(spark):
    rows = [(1, 10), (2, 19), (3, 31), (4, 42), (5, 48)]
    df = _df(spark, rows, "x long, y long")
    m = fit_linear_exact1(df, "x", "y")
    n, sx, sy = 5, 15, 150
    sxx, sxy = 55, sum(a * b for a, b in rows)
    slope = float(n * sxy - sx * sy) / float(n * sxx - sx * sx)
    intercept = (float(sy) - slope * float(sx)) / float(n)
    assert m["weights"][0] == slope and m["intercept"] == intercept


def test_predict_expr_is_jvm_only(spark):
    df = _df(spark, [(1.0, 2.0)], "a double, b double")
    out = df.withColumn(
        "p", predict_expr({"kind": "linear", "inputs": ["a", "b"],
                           "weights": [2.0, 3.0], "intercept": 1.0})
    )
    assert out.collect()[0]["p"] == 1.0 + 2.0 * 1.0 + 3.0 * 2.0
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_model_file_roundtrip(tmp_path):
    m = {"kind": "linear", "inputs": ["x"], "weights": [1.5], "intercept": -2.0, "n": 4}
    p = str(tmp_path / "m.json")
    save_model(m, p)
    assert load_model(p) == m


def test_resolve_model_fit_then_load(spark, tmp_path):
    df = _df(spark, [(float(x), 2.0 * x) for x in range(8)], "x double, y double")
    ref = "$file:" + str(tmp_path / "fit.json")
    train = {"function": "fit_linear", "inputs": ["x"], "outputs": ["y"]}
    m1 = resolve_model(ref, df, train)
    assert abs(m1["weights"][0] - 2.0) < 1e-9
    # second resolve must load the artifact, not refit: hand it a df
    # where refitting would give a different slope
    df2 = _df(spark, [(float(x), 5.0 * x) for x in range(8)], "x double, y double")
    m2 = resolve_model(ref, df2, train)
    assert m2 == m1


def test_resolve_model_missing_without_train():
    with pytest.raises(ValueError, match="no train spec"):
        resolve_model("$file:/nonexistent/m.json")


def test_workflow_train_predict_end_to_end(spark, tmp_path):
    """Compiler path: train block on a calculate column fits, persists
    the $file artifact, and applies as a JVM expression."""
    src = str(tmp_path / "in.parquet")
    _df(
        spark, [(i, float(i), 4.0 * i + 1.0) for i in range(20)],
        "id long, x double, y double",
    ).write.parquet(src)
    ref = "$file:" + str(tmp_path / "wf_model.json")
    spec = {
        "tables": [
            {
                "id": "t",
                "operation": "source",
                "path": src,
                "columns": [
                    {"id": "pred", "operation": "calculate",
                     "kernel": "linear_predict", "inputs": ["x"],
                     "model": ref,
                     "train": {"function": "fit_linear", "inputs": ["x"],
                               "outputs": ["y"]}},
                    {"id": "resid", "operation": "calculate",
                     "kernel": "sub_cols", "inputs": ["y", "pred"]},
                ],
            }
        ]
    }
    out = compile_workflow(spec, spark)["t"].toPandas()
    assert np.allclose(out["resid"], 0.0, atol=1e-8)
    art = load_model(str(tmp_path / "wf_model.json"))
    assert abs(art["weights"][0] - 4.0) < 1e-9
