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

def _normal_eq(df: DataFrame, inputs: list[str], label: str):
    """Distributed normal-equation sums for ``label ~ [1, inputs]``:
    ONE agg ships p·(p+3)/2+2 scalars to the driver; returns the
    assembled (A, b, n) for the (p+1)-dim system over [1, x1..xp].
    Shared by :func:`fit_linear` and :func:`fit_ridge` so the
    aggregate construction and matrix assembly exist once."""
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
    a = np.zeros((p + 1, p + 1))
    b = np.zeros(p + 1)
    a[0, 0] = float(r["n"])
    b[0] = r["sy"]
    for i in range(p):
        a[0, i + 1] = a[i + 1, 0] = r[f"sx{i}"]
        b[i + 1] = r[f"sxy{i}"]
        for j in range(i, p):
            a[i + 1, j + 1] = a[j + 1, i + 1] = r[f"sxx{i}_{j}"]
    return a, b, int(r["n"])


def fit_linear(df: DataFrame, inputs: list[str], label: str) -> dict:
    """OLS fit of ``label ~ inputs`` via distributed normal equations.

    Returns ``{"kind": "linear", "inputs": [...], "weights": [...],
    "intercept": b, "n": rows}``.
    """
    a, b, n = _normal_eq(df, inputs, label)
    coef = np.linalg.solve(a, b)
    return {
        "kind": "linear",
        "inputs": list(inputs),
        "weights": [float(w) for w in coef[1:]],
        "intercept": float(coef[0]),
        "n": n,
    }


def fit_linear_exact1(df: DataFrame, x: str, label: str) -> dict:
    """Single-feature OLS over integer-valued columns with *exact*
    long sums; float rounding happens only in the final two
    divisions, mirroring what an exact-arithmetic SQL engine does
    (``float(num)/float(den)``, not ``num/den``) so cross-engine
    results are bit-identical."""
    # cast BEFORE multiplying (like the grouped twin): x*x in the
    # column's native 32-bit type overflows under ANSI at ~|x|>46341
    xl, yl = F.col(x).cast("long"), F.col(label).cast("long")
    r = df.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(xl).alias("sx"),
        F.sum(yl).alias("sy"),
        F.sum(xl * xl).alias("sxx"),
        F.sum(xl * yl).alias("sxy"),
    ).collect()[0]
    if r["n"] == 0:
        raise ValueError(f"fit_linear_exact1: no rows to fit {label} ~ {x}")
    n, sx, sy, sxx, sxy = (int(r[c]) for c in ("n", "sx", "sy", "sxx", "sxy"))
    num, den = n * sxy - sx * sy, n * sxx - sx * sx
    if den == 0:
        raise ValueError(
            f"fit_linear_exact1: degenerate fit — feature {x!r} is "
            f"constant over the {n} training rows (n*sxx == sx^2)"
        )
    slope = float(num) / float(den)
    intercept = (float(sy) - slope * float(sx)) / float(n)
    return {
        "kind": "linear",
        "inputs": [x],
        "weights": [slope],
        "intercept": intercept,
        "n": n,
    }


def fit_ridge(df: DataFrame, inputs: list[str], label: str, alpha: float = 1.0) -> dict:
    """Ridge regression via the SAME distributed normal equations as
    :func:`fit_linear` — the executors ship only the p·(p+3)/2+2
    aggregate sums; the driver solves (X'X + αI)w = X'y with the
    intercept left unpenalized (standard ridge convention)."""
    p = len(inputs)
    a, b, n = _normal_eq(df, inputs, label)
    a[1:, 1:] += np.eye(p) * float(alpha)  # penalize weights, not intercept
    coef = np.linalg.solve(a, b)
    return {
        "kind": "linear",
        "inputs": list(inputs),
        "weights": [float(w) for w in coef[1:]],
        "intercept": float(coef[0]),
        "n": n,
        "alpha": float(alpha),
    }


def fit_logistic(
    df: DataFrame,
    inputs: list[str],
    label: str,
    iters: int = 25,
    tol: float = 1e-10,
    alpha: float = 0.0,
) -> dict:
    """Binary logistic regression via distributed Newton-IRLS.

    Like :func:`fit_linear`, fitting is an AGGREGATION, not a collect:
    each Newton step evaluates the current linear predictor η = b + w·x
    as a built-in JVM expression, and ships only the gradient
    X'(y − μ) and Hessian X'WX sums (O(p²) scalars, W = μ(1−μ)) to
    the driver, which solves the tiny (p+1)-dim system and updates β.
    Convergence: max|Δβ| < ``tol`` or ``iters`` steps — Newton on the
    logistic likelihood is quadratically convergent, so well-scaled
    problems stop in < 10 passes over the data.

    ``alpha`` adds an L2 penalty on the weights (not the intercept) —
    the standard remedy when classes are linearly separable and the
    unpenalized MLE diverges; a non-finite update raises with that
    diagnosis either way.
    """
    p = len(inputs)
    xs = [F.col(c).cast("double") for c in inputs]
    y = F.col(label).cast("double")
    beta = np.zeros(p + 1)
    n = 0
    used = 0
    for it in range(int(iters)):
        eta = F.lit(float(beta[0]))
        for k in range(p):
            eta = eta + F.lit(float(beta[k + 1])) * xs[k]
        mu = F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
        wgt = mu * (F.lit(1.0) - mu)
        resid = y - mu
        feats = [F.lit(1.0)] + xs
        aggs = [F.count(F.lit(1)).alias("n")]
        for i in range(p + 1):
            aggs.append(F.sum(resid * feats[i]).alias(f"g{i}"))
            for j in range(i, p + 1):
                aggs.append(F.sum(wgt * feats[i] * feats[j]).alias(f"h{i}_{j}"))
        r = df.agg(*aggs).collect()[0]
        n = int(r["n"])
        if n == 0:
            raise ValueError(f"fit_logistic: no rows to fit {label} ~ {inputs}")
        g = np.array([r[f"g{i}"] for i in range(p + 1)], dtype=np.float64)
        h = np.zeros((p + 1, p + 1))
        for i in range(p + 1):
            for j in range(i, p + 1):
                h[i, j] = h[j, i] = r[f"h{i}_{j}"]
        if alpha:
            h[1:, 1:] += np.eye(p) * float(alpha)
            g[1:] -= float(alpha) * beta[1:]
        try:
            delta = np.linalg.solve(h, g)
        except np.linalg.LinAlgError as e:
            raise ValueError(
                "fit_logistic: singular Hessian — feature collinearity or "
                "complete separation; add alpha>0 or drop features"
            ) from e
        if not np.all(np.isfinite(delta)):
            raise ValueError(
                "fit_logistic: diverging update (separable classes?) — "
                "add alpha>0 for a penalized fit"
            )
        beta = beta + delta
        used = it + 1
        if float(np.max(np.abs(delta))) < float(tol):
            break
    return {
        "kind": "logistic",
        "inputs": list(inputs),
        "weights": [float(w) for w in beta[1:]],
        "intercept": float(beta[0]),
        "n": n,
        "iters_run": used,
        "alpha": float(alpha),
    }


def fit_linear_grouped(
    df: DataFrame, inputs: list[str], label: str, group_keys: list[str]
) -> DataFrame:
    """Per-key OLS at scale: ONE groupBy computes each group's
    normal-equation sums (algebraic, map-side combined), then a
    mapInPandas stage solves the tiny (p+1)×(p+1) systems in a single
    BATCHED ``np.linalg.solve`` over stacked matrices — millions of
    groups never touch the driver. Returns one row per group:
    (keys..., intercept, weights array<double>, n).

    The reference's per-group fit would call sklearn once per group in
    the driver process (Column.py:879-956 has no grouping at all)."""
    p = len(inputs)
    xs = [F.col(c).cast("double") for c in inputs]
    y = F.col(label).cast("double")
    aggs = [F.count(F.lit(1)).alias("n"), F.sum(y).alias("sy")]
    for i in range(p):
        aggs.append(F.sum(xs[i]).alias(f"sx{i}"))
        aggs.append(F.sum(xs[i] * y).alias(f"sxy{i}"))
        for j in range(i, p):
            aggs.append(F.sum(xs[i] * xs[j]).alias(f"sxx{i}_{j}"))
    sums = df.groupBy(*group_keys).agg(*aggs)

    key_schema = ", ".join(
        f"{k} {t}" for k, t in sums.dtypes if k in group_keys
    )
    out_schema = f"{key_schema}, intercept double, weights array<double>, n long"

    def solve(batches):
        import pandas as pd

        for pdf in batches:
            g = len(pdf)
            if g == 0:
                continue
            a = np.zeros((g, p + 1, p + 1))
            b = np.zeros((g, p + 1))
            a[:, 0, 0] = pdf["n"].to_numpy(dtype=np.float64)
            b[:, 0] = pdf["sy"].to_numpy(dtype=np.float64)
            for i in range(p):
                sx = pdf[f"sx{i}"].to_numpy(dtype=np.float64)
                a[:, 0, i + 1] = a[:, i + 1, 0] = sx
                b[:, i + 1] = pdf[f"sxy{i}"].to_numpy(dtype=np.float64)
                for j in range(i, p):
                    sxx = pdf[f"sxx{i}_{j}"].to_numpy(dtype=np.float64)
                    a[:, i + 1, j + 1] = a[:, j + 1, i + 1] = sxx
            # groups with n <= p (or a collinear/constant feature)
            # have singular normal matrices; np.linalg.solve would
            # throw for the WHOLE batch — mask them out and solve only
            # the regular systems (batched). The masked NaNs cross the
            # Arrow boundary as NULL coefficients: "no model" rows a
            # downstream join can filter or coalesce.
            det = np.linalg.det(a)
            ok = np.isfinite(det) & (np.abs(det) > 0)
            coef = np.full((g, p + 1), np.nan)
            if ok.any():
                coef[ok] = np.linalg.solve(a[ok], b[ok])
            out = pdf[group_keys].copy()
            out["intercept"] = coef[:, 0]
            out["weights"] = list(coef[:, 1:])
            out["n"] = pdf["n"].to_numpy(dtype=np.int64)
            yield out

    return sums.mapInPandas(solve, schema=out_schema)


def fit_logistic_grouped(
    df: DataFrame,
    inputs: list[str],
    label: str,
    group_keys: list[str],
    iters: int = 25,
    tol: float = 1e-8,
    alpha: float = 0.0,
) -> DataFrame:
    """Per-key logistic regression at scale — Newton-IRLS where the
    COEFFICIENT TABLE is itself a DataFrame that never collects.

    Each Newton step: join the current per-group β onto the facts
    (both sides hash-partitioned on the keys), evaluate η/μ/W as JVM
    expressions via :func:`predict_grouped_expr`, aggregate each
    group's gradient and Hessian sums in ONE map-side-combined
    groupBy, then solve the tiny (p+1)-dim systems BATCHED in
    mapInPandas (same shape as :func:`fit_linear_grouped`'s solver) —
    millions of groups never touch the driver. The β frame is
    localCheckpoint'ed per round (bounded plan depth); the only
    driver traffic is one max|Δβ| scalar per round for early stop.

    Groups whose Hessian is singular or whose update diverges
    (separation) get NULL coefficients and ``converged=false`` — "no
    model" rows, like the linear grouped fit — and NULL rows stay
    inert through later rounds. Returns one row per group:
    (keys..., intercept, weights array, n, converged).
    """
    p = len(inputs)
    xs = [F.col(c).cast("double") for c in inputs]
    y = F.col(label).cast("double")
    # hash-partition the facts on the keys ONCE before caching: every
    # Newton round's join then finds both sides already partitioned on
    # the keys and re-exchanges neither — k rounds cost k cache scans,
    # not k corpus shuffles
    facts = df.select(*group_keys, *inputs, label).repartition(
        *group_keys
    ).persist()
    try:
        betas = facts.groupBy(*group_keys).agg(
            F.count(F.lit(1)).alias("n")
        ).select(
            *group_keys,
            F.lit(0.0).alias("intercept"),
            F.array(*[F.lit(0.0) for _ in range(p)]).alias("weights"),
            "n",
        ).localCheckpoint(eager=True)
        a_ = float(alpha)
        key_schema = ", ".join(
            f"{k} {t}" for k, t in betas.dtypes if k in group_keys
        )
        out_schema = (
            f"{key_schema}, intercept double, weights array<double>, "
            f"n long, _delta double"
        )
        for _ in range(int(iters)):
            joined = facts.join(betas, group_keys)
            eta = predict_grouped_expr(
                F.col("weights"), F.col("intercept"), xs
            )
            mu = F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
            wgt = mu * (F.lit(1.0) - mu)
            resid = y - mu
            feats = [F.lit(1.0)] + xs
            aggs = [
                F.count(F.lit(1)).alias("n"),
                F.first("intercept").alias("_b0"),
                F.first("weights").alias("_bw"),
            ]
            for i in range(p + 1):
                aggs.append(F.sum(resid * feats[i]).alias(f"g{i}"))
                for j in range(i, p + 1):
                    aggs.append(
                        F.sum(wgt * feats[i] * feats[j]).alias(f"h{i}_{j}")
                    )
            sums = joined.groupBy(*group_keys).agg(*aggs)

            def step(batches):
                import pandas as pd

                for pdf in batches:
                    g = len(pdf)
                    if g == 0:
                        continue
                    bw = np.array(
                        [
                            list(w) if w is not None else [np.nan] * p
                            for w in pdf["_bw"]
                        ],
                        dtype=np.float64,
                    ).reshape(g, p)
                    beta = np.column_stack(
                        [pdf["_b0"].to_numpy(dtype=np.float64), bw]
                    )
                    h = np.zeros((g, p + 1, p + 1))
                    grad = np.zeros((g, p + 1))
                    for i in range(p + 1):
                        grad[:, i] = pdf[f"g{i}"].to_numpy(dtype=np.float64)
                        for j in range(i, p + 1):
                            hij = pdf[f"h{i}_{j}"].to_numpy(dtype=np.float64)
                            h[:, i, j] = h[:, j, i] = hij
                    if a_:
                        h[:, 1:, 1:] += np.eye(p) * a_
                        grad[:, 1:] -= a_ * beta[:, 1:]
                    det = np.linalg.det(h)
                    ok = np.isfinite(det) & (np.abs(det) > 0)
                    ok &= np.isfinite(beta).all(axis=1)
                    ok &= np.isfinite(grad).all(axis=1)
                    delta = np.full((g, p + 1), np.nan)
                    if ok.any():
                        delta[ok] = np.linalg.solve(h[ok], grad[ok])
                    newb = beta + delta
                    bad = ~np.isfinite(newb).all(axis=1)
                    newb[bad] = np.nan
                    dmax = np.abs(delta).max(axis=1)
                    dmax[bad] = np.nan
                    out = pdf[group_keys].copy()
                    out["intercept"] = newb[:, 0]
                    out["weights"] = [
                        None if b else list(w)
                        for b, w in zip(bad, newb[:, 1:])
                    ]
                    out["n"] = pdf["n"].to_numpy(dtype=np.int64)
                    # NULL (not NaN) for dead groups so max() ignores them
                    out["_delta"] = [None if b else d for b, d in zip(bad, dmax)]
                    yield out

            betas = sums.mapInPandas(step, schema=out_schema).localCheckpoint(
                eager=True
            )
            row = betas.agg(F.max("_delta").alias("d")).collect()[0]
            if row["d"] is None or row["d"] < float(tol):
                break
        return betas.select(
            *group_keys, "intercept", "weights", "n",
            F.coalesce(F.col("_delta") < float(tol), F.lit(False)).alias(
                "converged"
            ),
        )
    finally:
        facts.unpersist()


def fit_linear_grouped_exact1(
    df: DataFrame, x: str, label: str, group_keys: list[str]
) -> DataFrame:
    """Per-key single-feature OLS over integer columns with EXACT long
    sums — the grouped twin of :func:`fit_linear_exact1`; slope and
    intercept derive from exact sums with two float divisions each, so
    any exact-arithmetic engine (the DuckDB oracle via HUGEINT)
    reproduces them bit-for-bit. Pure JVM: one groupBy, no Python."""
    xc, yc = F.col(x).cast("long"), F.col(label).cast("long")
    s = df.groupBy(*group_keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xc).alias("sx"),
        F.sum(yc).alias("sy"),
        F.sum(xc * xc).alias("sxx"),
        F.sum(xc * yc).alias("sxy"),
    )
    # cross products of the long sums can pass 2^63 (n·sxy ≈ 2e18 at
    # sf0.1 already) — widen to decimal(38,0), the JVM twin of the
    # oracle's HUGEINT, so the difference is exact and only the final
    # cast-to-double rounds (identically in both engines)
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    num = (d(s["n"]) * d(s["sxy"]) - d(s["sx"]) * d(s["sy"])).cast("double")
    den = (d(s["n"]) * d(s["sxx"]) - d(s["sx"]) * d(s["sx"])).cast("double")
    slope = num / den
    icept = (s["sy"].cast("double") - slope * s["sx"].cast("double")) / s["n"].cast("double")
    return s.select(*group_keys, "n", slope.alias("slope"), icept.alias("intercept"))


def predict_grouped_expr(weights_col, intercept_col, cols: list) -> "F.Column":
    """Apply a grouped model after joining its table onto the facts:
    intercept + Σ weights[i]·x_i, all built-in JVM arithmetic."""
    out = intercept_col.cast("double")
    for i, c in enumerate(cols):
        out = out + F.element_at(weights_col, i + 1) * c.cast("double")
    return out


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
    elif fn == "fit_ridge":
        fitted = fit_ridge(
            tdf, train["inputs"], label, alpha=float(train.get("alpha", 1.0))
        )
    elif fn == "fit_logistic":
        fitted = fit_logistic(
            tdf,
            train["inputs"],
            label,
            iters=int(train.get("iters", 25)),
            tol=float(train.get("tol", 1e-10)),
            alpha=float(train.get("alpha", 0.0)),
        )
    elif ":" in fn:
        # arbitrary user estimator (the reference's any-sklearn shape,
        # Column.py:879-956) with an explicit scale contract: the user
        # fit function receives a driver-side pandas sample bounded by
        # train["sample_rows"] (default 100k) and must return a
        # JSON-serializable model dict. Estimators that can't fit on a
        # sample belong in a distributed fit_* function instead.
        from lambdo_spark.plans.compiler import resolve_callable

        user = resolve_callable(fn)
        cap = int(train.get("sample_rows", 100_000))
        pdf = tdf.select(*train["inputs"], label).limit(cap).toPandas()
        fitted = user(pdf, list(train["inputs"]), label)
        if not isinstance(fitted, dict):
            raise ValueError(
                f"user fit {fn!r} must return a JSON-serializable dict model"
            )
    else:
        raise ValueError(f"unknown train function '{fn}'")
    if path:
        save_model(fitted, path)
    return fitted


# ------------------------------------------------------------ applying

def predict_expr(model: dict, cols: list[F.Column] | None = None) -> F.Column:
    """Compile a fitted model to a built-in JVM expression: the linear
    predictor for ``kind=linear``, the class probability σ(η) for
    ``kind=logistic``."""
    kind = model.get("kind")
    if kind not in ("linear", "logistic"):
        raise ValueError(f"cannot compile model kind {kind!r}")
    cols = cols or [F.col(c) for c in model["inputs"]]
    out = F.lit(float(model["intercept"]))
    for w, c in zip(model["weights"], cols):
        out = out + F.lit(float(w)) * c.cast("double")
    if kind == "logistic":
        out = F.lit(1.0) / (F.lit(1.0) + F.exp(-out))
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

register(
    Kernel(
        "logistic_predict",
        expr=lambda c, weights=(), intercept=0.0, **_: predict_expr(
            {"kind": "logistic", "weights": list(weights),
             "intercept": intercept, "inputs": []},
            c,
        ),
        doc="σ(w·x + b) class probability from a fitted logistic model",
    )
)
