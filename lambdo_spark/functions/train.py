"""C10 — model train/apply stages, Spark-first.

The reference lets a column definition fit an arbitrary sklearn-style
model on (row-filtered, column-selected) training data and then apply
it per row, with the fitted model persisted by reference as
``$file:*.pkl`` (/root/reference/lambdo/Column.py:844-956, persistence
utils.py:207-264). That shape survives here, but the mechanics are
distributed and vectorized:

- **Fitting is an aggregation, not a collect.** ``fit_linear`` solves
  ordinary least squares via the normal equations: every entry of
  X'X / X'y is a built-in ``sum`` expression, so the *data* never
  leaves the executors — one aggregated row of p·(p+3)/2+2 numbers
  reaches the driver, and numpy solves the tiny (p+1)×(p+1) system.
  (The reference trains by handing the whole pandas frame to sklearn
  in-process — impossible at 10^12 rows.)
- **Single-feature fits are exact.** With integer-valued columns the
  sums are Spark longs (exact); slope/intercept derive from them with
  one float division each — reproducible bit-for-bit by any engine
  that aggregates exactly (the DuckDB oracle does, via HUGEINT).
- **Applying is a JVM expression.** ``linear_predict`` compiles to
  ``w·x + b`` built-in arithmetic — whole-stage codegen, no Python.
- **Persistence is a JSON artifact** next to checkpoint metadata
  (atomic tmp+rename like the tier manifests), referenced from
  workflow specs as ``$file:path`` exactly like the reference's
  pickle refs — but readable and engine-independent.
"""

from __future__ import annotations

import json
import os

import numpy as np

from pyspark.sql import DataFrame, functions as F

from lambdo_spark.functions.registry import Kernel, register

FILE_PREFIX = "$file:"


# ------------------------------------------------------------- fitting

def fit_linear(df: DataFrame, inputs: list[str], label: str) -> dict:
    """OLS fit of ``label ~ inputs`` via distributed normal equations.

    Returns ``{"kind": "linear", "inputs": [...], "weights": [...],
    "intercept": b, "n": rows}``.
    """
    p = len(inputs)
    xs = [F.col(c).cast("double") for c in inputs]
    y = F.col(label).cast("double")
    aggs = [F.count(F.lit(1)).alias("n"), F.sum(y).alias("sy")]
    for i in range(p):
        aggs.append(F.sum(xs[i]).alias(f"sx{i}"))
        aggs.append(F.sum(xs[i] * y).alias(f"sxy{i}"))
        for j in range(i, p):
            aggs.append(F.sum(xs[i] * xs[j]).alias(f"sxx{i}_{j}"))
    r = df.agg(*aggs).collect()[0]

    n = float(r["n"])
    # normal matrix over [1, x1..xp]
    a = np.zeros((p + 1, p + 1))
    b = np.zeros(p + 1)
    a[0, 0] = n
    b[0] = r["sy"]
    for i in range(p):
        a[0, i + 1] = a[i + 1, 0] = r[f"sx{i}"]
        b[i + 1] = r[f"sxy{i}"]
        for j in range(i, p):
            a[i + 1, j + 1] = a[j + 1, i + 1] = r[f"sxx{i}_{j}"]
    coef = np.linalg.solve(a, b)
    return {
        "kind": "linear",
        "inputs": list(inputs),
        "weights": [float(w) for w in coef[1:]],
        "intercept": float(coef[0]),
        "n": int(r["n"]),
    }


def fit_linear_exact1(df: DataFrame, x: str, label: str) -> dict:
    """Single-feature OLS over integer-valued columns with *exact*
    long sums; float rounding happens only in the final two
    divisions, mirroring what an exact-arithmetic SQL engine does
    (``float(num)/float(den)``, not ``num/den``) so cross-engine
    results are bit-identical."""
    r = df.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(x).cast("long")).alias("sx"),
        F.sum(F.col(label).cast("long")).alias("sy"),
        F.sum((F.col(x) * F.col(x)).cast("long")).alias("sxx"),
        F.sum((F.col(x) * F.col(label)).cast("long")).alias("sxy"),
    ).collect()[0]
    n, sx, sy, sxx, sxy = (int(r[c]) for c in ("n", "sx", "sy", "sxx", "sxy"))
    num, den = n * sxy - sx * sy, n * sxx - sx * sx
    slope = float(num) / float(den)
    intercept = (float(sy) - slope * float(sx)) / float(n)
    return {
        "kind": "linear",
        "inputs": [x],
        "weights": [slope],
        "intercept": intercept,
        "n": n,
    }


# --------------------------------------------------------- persistence

def save_model(model: dict, path: str) -> str:
    """Atomic JSON artifact (tmp+fsync+rename, like tier manifests)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(model, f, indent=1, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    return path


def load_model(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def resolve_model(model, df: DataFrame | None = None, train: dict | None = None):
    """Reference model-preparation semantics (Column.py:844-877):

    - ``model`` is a dict → use as-is;
    - ``model`` is ``$file:path`` and the file exists → load it;
    - otherwise, if a ``train`` spec is given → fit on ``df`` (after
      the spec's optional ``row_filter``) and, when ``model`` was a
      ``$file:`` ref, persist the artifact back to that path.
    """
    if isinstance(model, dict):
        return model
    path = None
    if isinstance(model, str) and model.startswith(FILE_PREFIX):
        path = model[len(FILE_PREFIX):]
        if os.path.exists(path):
            return load_model(path)
    if train is None:
        raise ValueError(f"model {model!r} not found and no train spec given")
    if df is None:
        raise ValueError("training requires the table DataFrame")
    tdf = df
    rf = train.get("row_filter")
    if rf:
        from lambdo_spark.operators.table_ops import row_filter

        tdf = row_filter(
            tdf,
            dropna=rf.get("dropna", False),
            predicate=rf.get("predicate"),
            sample=rf.get("sample"),
            slice_spec=rf.get("slice"),
            order_by=rf.get("order_by"),
        )
    fn = train.get("function", "fit_linear")
    label = train["outputs"][0] if "outputs" in train else train["label"]
    if fn == "fit_linear":
        fitted = fit_linear(tdf, train["inputs"], label)
    elif fn == "fit_linear_exact1":
        fitted = fit_linear_exact1(tdf, train["inputs"][0], label)
    else:
        raise ValueError(f"unknown train function '{fn}'")
    if path:
        save_model(fitted, path)
    return fitted


# ------------------------------------------------------------ applying

def predict_expr(model: dict, cols: list[F.Column] | None = None) -> F.Column:
    """Compile a fitted model to a built-in JVM expression."""
    if model.get("kind") != "linear":
        raise ValueError(f"cannot compile model kind {model.get('kind')!r}")
    cols = cols or [F.col(c) for c in model["inputs"]]
    out = F.lit(float(model["intercept"]))
    for w, c in zip(model["weights"], cols):
        out = out + F.lit(float(w)) * c.cast("double")
    return out


register(
    Kernel(
        "linear_predict",
        expr=lambda c, weights=(), intercept=0.0, **_: predict_expr(
            {"kind": "linear", "weights": list(weights), "intercept": intercept,
             "inputs": []},
            c,
        ),
        doc="w·x + b from a fitted linear model (C10 apply path)",
    )
)
