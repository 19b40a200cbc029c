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


def test_fit_ridge_matches_closed_form(spark):
    """Ridge via distributed normal equations == the driver-side
    closed form (X'X + αI, intercept unpenalized) on the same data."""
    from lambdo_spark.functions.train import fit_ridge

    rng = np.random.default_rng(3)
    x = rng.normal(size=(80, 2))
    y = x @ np.array([1.5, -2.0]) + 3.0 + rng.normal(scale=0.1, size=80)
    rows = [(float(a), float(b), float(t)) for (a, b), t in zip(x, y)]
    df = _df(spark, rows, "a double, b double, y double")
    m = fit_ridge(df, ["a", "b"], "y", alpha=2.5)

    X = np.hstack([np.ones((80, 1)), x])
    A = X.T @ X
    A[1:, 1:] += 2.5 * np.eye(2)
    coef = np.linalg.solve(A, X.T @ y)
    assert abs(m["intercept"] - coef[0]) < 1e-9
    assert np.allclose(m["weights"], coef[1:], atol=1e-9)
    # alpha=0 degenerates to plain OLS
    m0 = fit_ridge(df, ["a", "b"], "y", alpha=0.0)
    ols = fit_linear(df, ["a", "b"], "y")
    assert np.allclose(m0["weights"], ols["weights"], atol=1e-9)


def test_fit_linear_grouped_matches_per_group_fit(spark):
    """The one-shuffle grouped fit equals fit_linear run per group."""
    from lambdo_spark.functions.train import fit_linear_grouped

    rng = np.random.default_rng(5)
    rows = []
    truth = {"g1": (2.0, 1.0), "g2": (-0.5, 10.0), "g3": (4.0, -3.0)}
    for g, (w, b) in truth.items():
        for _ in range(40):
            x = float(rng.normal())
            rows.append((g, x, w * x + b + float(rng.normal(scale=0.01))))
    df = _df(spark, rows, "g string, x double, y double")
    got = {
        r["g"]: (r["weights"][0], r["intercept"], r["n"])
        for r in fit_linear_grouped(df, ["x"], "y", ["g"]).collect()
    }
    for g in truth:
        ref = fit_linear(df.where(f"g = '{g}'"), ["x"], "y")
        w, b, n = got[g]
        assert n == 40
        assert abs(w - ref["weights"][0]) < 1e-9
        assert abs(b - ref["intercept"]) < 1e-9


def test_grouped_predict_expr(spark):
    from lambdo_spark.functions.train import (
        fit_linear_grouped,
        predict_grouped_expr,
    )
    from pyspark.sql import functions as F

    rows = [("a", float(x), 2.0 * x + 1.0) for x in range(20)] + [
        ("b", float(x), -1.0 * x + 5.0) for x in range(20)
    ]
    df = _df(spark, rows, "g string, x double, y double")
    models = fit_linear_grouped(df, ["x"], "y", ["g"])
    scored = df.join(F.broadcast(models), "g").withColumn(
        "pred", predict_grouped_expr(F.col("weights"), F.col("intercept"), [F.col("x")])
    )
    bad = scored.where(F.abs(F.col("pred") - F.col("y")) > 1e-6).count()
    assert bad == 0


def test_user_fit_escape_hatch(spark):
    """train.function = module:attr runs an arbitrary user estimator on
    a bounded driver-side sample (the reference's any-sklearn shape,
    Column.py:879-956, with an explicit scale contract)."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    try:
        df = _df(spark, [(float(x), 10.0) for x in range(50)], "x double, y double")
        fitted = resolve_model(
            "$file:" + "/tmp/userfit_model_test.json",
            df,
            {"function": "userfit_helper:fit_mean_model", "inputs": ["x"],
             "label": "y", "sample_rows": 30},
        )
        assert fitted["intercept"] == 10.0 and fitted["n"] == 30
        assert os.path.exists("/tmp/userfit_model_test.json")
        os.remove("/tmp/userfit_model_test.json")
    finally:
        sys.path.remove(os.path.dirname(os.path.abspath(__file__)))


def test_fit_exact1_degenerate_and_overflow_safe(spark):
    from lambdo_spark.functions.train import fit_linear_exact1

    # constant feature -> clear error, not ZeroDivisionError
    const = spark.createDataFrame([(5, 1), (5, 2)], "x int, y int")
    with pytest.raises(ValueError, match="constant"):
        fit_linear_exact1(const, "x", "y")

    # int32 column with |x| large enough that x*x overflows int32:
    # the long-cast-first sums must fit (ANSI would error otherwise)
    big = spark.createDataFrame(
        [(100000, 3), (200000, 5), (300000, 7)], "x int, y int"
    )
    m = fit_linear_exact1(big, "x", "y")
    assert abs(m["weights"][0] - 2e-05) < 1e-12
    assert abs(m["intercept"] - 1.0) < 1e-9


def test_fit_grouped_singular_groups_nan_not_crash(spark):
    from lambdo_spark.functions.train import fit_linear_grouped

    rows = (
        [("good", float(i), 2.0 * i + 1) for i in range(5)]
        + [("single", 4.0, 9.0)]          # n=1: singular
        + [("const", 3.0, 1.0), ("const", 3.0, 2.0)]  # constant x: singular
    )
    df = spark.createDataFrame(rows, "k string, x double, y double")
    out = {r["k"]: r for r in fit_linear_grouped(df, ["x"], "y", ["k"]).collect()}
    assert abs(out["good"]["weights"][0] - 2.0) < 1e-9
    assert abs(out["good"]["intercept"] - 1.0) < 1e-9
    # singular groups surface as NULL coefficients (NaN crosses the
    # Arrow boundary as null) — "no model", join-able downstream
    for k in ("single", "const"):
        assert out[k]["intercept"] is None, k
        assert out[k]["weights"][0] is None, k


# ------------------------------------------------------------ logistic


def _py_irls(x, y, iters=25, tol=1e-10, alpha=0.0):
    """From-scratch numpy Newton-IRLS — the independent reference for
    the distributed fit (same algorithm, all-local arithmetic)."""
    xm = np.column_stack([np.ones(len(y)), x])
    beta = np.zeros(xm.shape[1])
    for _ in range(iters):
        mu = 1.0 / (1.0 + np.exp(-(xm @ beta)))
        w = mu * (1.0 - mu)
        g = xm.T @ (y - mu)
        h = xm.T @ (xm * w[:, None])
        if alpha:
            h[1:, 1:] += np.eye(xm.shape[1] - 1) * alpha
            g[1:] -= alpha * beta[1:]
        delta = np.linalg.solve(h, g)
        beta = beta + delta
        if np.max(np.abs(delta)) < tol:
            break
    return beta


def _logistic_data(n=400, seed=5):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, 2))
    eta = -0.5 + 1.5 * x[:, 0] - 2.0 * x[:, 1]
    y = (rng.uniform(size=n) < 1.0 / (1.0 + np.exp(-eta))).astype(float)
    return x, y


def test_fit_logistic_matches_numpy_irls(spark):
    from lambdo_spark.functions.train import fit_logistic

    x, y = _logistic_data()
    rows = [(float(a), float(b), float(t)) for (a, b), t in zip(x, y)]
    df = _df(spark, rows, "x1 double, x2 double, y double")
    m = fit_logistic(df, ["x1", "x2"], "y")
    exp = _py_irls(x, y)
    np.testing.assert_allclose(
        [m["intercept"], *m["weights"]], exp, rtol=1e-8
    )
    assert m["kind"] == "logistic" and m["n"] == len(y)
    assert m["iters_run"] < 15  # Newton converges fast on scaled data


def test_fit_logistic_gradient_zero_at_optimum(spark):
    from lambdo_spark.functions.train import fit_logistic

    x, y = _logistic_data(seed=11)
    rows = [(float(a), float(b), float(t)) for (a, b), t in zip(x, y)]
    df = _df(spark, rows, "x1 double, x2 double, y double")
    m = fit_logistic(df, ["x1", "x2"], "y")
    beta = np.array([m["intercept"], *m["weights"]])
    xm = np.column_stack([np.ones(len(y)), x])
    mu = 1.0 / (1.0 + np.exp(-(xm @ beta)))
    np.testing.assert_allclose(xm.T @ (y - mu), 0.0, atol=1e-6)


def test_fit_logistic_penalized_matches_numpy(spark):
    from lambdo_spark.functions.train import fit_logistic

    x, y = _logistic_data(seed=13)
    rows = [(float(a), float(b), float(t)) for (a, b), t in zip(x, y)]
    df = _df(spark, rows, "x1 double, x2 double, y double")
    m = fit_logistic(df, ["x1", "x2"], "y", alpha=2.5)
    exp = _py_irls(x, y, alpha=2.5)
    np.testing.assert_allclose([m["intercept"], *m["weights"]], exp, rtol=1e-8)


def test_fit_logistic_separable_raises_without_alpha(spark):
    from lambdo_spark.functions.train import fit_logistic

    # perfectly separable: y = 1 iff x > 0 — unpenalized MLE diverges
    rows = [(float(v), 1.0 if v > 0 else 0.0) for v in range(-50, 51) if v != 0]
    df = _df(spark, rows, "x double, y double")
    with pytest.raises(ValueError):
        fit_logistic(df, ["x"], "y", iters=60)
    m = fit_logistic(df, ["x"], "y", alpha=1.0)  # penalized fit succeeds
    assert np.isfinite(m["weights"][0]) and m["weights"][0] > 0


def test_predict_expr_logistic_probability(spark):
    df = _df(spark, [(0.0,), (1.0,), (-1.0,)], "x double")
    m = {"kind": "logistic", "inputs": ["x"], "weights": [2.0], "intercept": 0.0}
    got = sorted(
        r[0] for r in df.select(predict_expr(m).alias("p")).collect()
    )
    exp = sorted(1.0 / (1.0 + np.exp(-2.0 * v)) for v in [0.0, 1.0, -1.0])
    np.testing.assert_allclose(got, exp, rtol=1e-12)


def test_resolve_model_fit_logistic_roundtrip(spark, tmp_path):
    x, y = _logistic_data(seed=17, n=200)
    rows = [(float(a), float(b), float(t)) for (a, b), t in zip(x, y)]
    df = _df(spark, rows, "x1 double, x2 double, y double")
    path = str(tmp_path / "logit.json")
    m = resolve_model(
        f"$file:{path}",
        df,
        {"function": "fit_logistic", "inputs": ["x1", "x2"], "label": "y"},
    )
    assert m["kind"] == "logistic" and os.path.exists(path)
    # second resolve loads the artifact without refitting
    m2 = resolve_model(f"$file:{path}")
    assert m2 == m


def test_fit_logistic_grouped_matches_per_group_irls(spark):
    from lambdo_spark.functions.train import fit_logistic_grouped

    rng = np.random.default_rng(23)
    rows, expected = [], {}
    for gi, g in enumerate(["a", "b", "c"]):
        x = rng.normal(size=(150, 2))
        coefs = [(-0.4, 1.2, -1.8), (0.6, -0.9, 0.5), (0.0, 2.0, 1.0)][gi]
        eta = coefs[0] + coefs[1] * x[:, 0] + coefs[2] * x[:, 1]
        y = (rng.uniform(size=150) < 1.0 / (1.0 + np.exp(-eta))).astype(float)
        expected[g] = _py_irls(x, y)
        rows += [
            (g, float(a), float(b_), float(t)) for (a, b_), t in zip(x, y)
        ]
    df = _df(spark, rows, "g string, x1 double, x2 double, y double")
    out = {
        r["g"]: r
        for r in fit_logistic_grouped(df, ["x1", "x2"], "y", ["g"]).collect()
    }
    for g, exp in expected.items():
        got = [out[g]["intercept"], *out[g]["weights"]]
        np.testing.assert_allclose(got, exp, rtol=1e-7)
        assert out[g]["converged"] and out[g]["n"] == 150


def test_fit_logistic_grouped_separable_group_goes_null(spark):
    from lambdo_spark.functions.train import fit_logistic_grouped

    rng = np.random.default_rng(29)
    rows = [("sep", float(v), 1.0 if v > 0 else 0.0)
            for v in range(-30, 31) if v != 0]
    x = rng.normal(size=80)
    eta = 0.5 * x
    y = (rng.uniform(size=80) < 1.0 / (1.0 + np.exp(-eta))).astype(float)
    rows += [("ok", float(a), float(t)) for a, t in zip(x, y)]
    df = _df(spark, rows, "g string, x double, y double")
    out = {
        r["g"]: r
        for r in fit_logistic_grouped(df, ["x"], "y", ["g"], iters=60).collect()
    }
    # the healthy group still fits and converges
    exp = _py_irls(x[:, None], y, iters=60)
    np.testing.assert_allclose(
        [out["ok"]["intercept"], *out["ok"]["weights"]], exp, rtol=1e-7
    )
    assert out["ok"]["converged"]
    # the separable group must surface as a no-model row, not poison
    # the healthy one (its MLE diverges; a diverged update nulls out)
    sep = out["sep"]
    assert (not sep["converged"]) or sep["weights"] is None or all(
        np.isfinite(w) for w in (sep["weights"] or [])
    )


def test_fit_logistic_grouped_penalized(spark):
    from lambdo_spark.functions.train import fit_logistic_grouped

    rows = [("sep", float(v), 1.0 if v > 0 else 0.0)
            for v in range(-30, 31) if v != 0]
    df = _df(spark, rows, "g string, x double, y double")
    out = fit_logistic_grouped(
        df, ["x"], "y", ["g"], iters=60, alpha=1.0
    ).collect()[0]
    # ridge keeps the separable fit finite and positive-slope
    assert out["weights"] is not None and out["weights"][0] > 0
    assert np.isfinite(out["intercept"])
