"""Randomized differential tests for the timeseries toolkit: many
seeded random cases run as ONE Spark job per operator (cases unioned,
partitioned by (case, key)) and compared against independent pandas
brute-force implementations — the property-test analog that doesn't
pay a Spark job per example."""

import numpy as np
import pandas as pd
import pytest

from lambdo_spark.rollup.timeseries import (
    delta,
    interpolate_linear,
    locf,
    order_stat,
    sessionize,
)

N_CASES = 12


@pytest.fixture(scope="module")
def random_events(spark):
    """(case, k, id, ts_s, v) — random keys, clustered+jumpy
    timestamps, ~20% null values."""
    rng = np.random.RandomState(7)
    frames = []
    for case in range(N_CASES):
        n = rng.randint(5, 120)
        ks = rng.choice(["a", "b", "c"], size=n)
        # mixture of small gaps and session-breaking jumps
        steps = np.where(
            rng.rand(n) < 0.25, rng.randint(2000, 9000, n), rng.randint(1, 900, n)
        )
        ts = 1_700_000_000 + np.cumsum(steps)
        rng.shuffle(ts)  # keys interleave arbitrarily
        v = rng.randint(-1000, 1000, n).astype("float64")
        v[rng.rand(n) < 0.2] = np.nan
        frames.append(
            pd.DataFrame(
                {"case": case, "k": ks, "id": np.arange(n), "ts_s": ts, "v": v}
            )
        )
    pdf = pd.concat(frames, ignore_index=True)
    sdf = spark.createDataFrame(pdf).withColumn(
        "ts", __import__("pyspark.sql.functions", fromlist=["x"]).timestamp_seconds("ts_s")
    )
    return pdf, sdf


def _per_group(pdf, fn):
    return (
        pdf.sort_values(["case", "k", "ts_s", "id"])
        .groupby(["case", "k"], group_keys=False)[pdf.columns]
        .apply(fn)
    )


def test_sessionize_random_vs_bruteforce(random_events):
    pdf, sdf = random_events
    GAP = 1800

    def brute(g):
        sid, last = 0, None
        out = []
        for t in g["ts_s"]:
            if last is None or t - last > GAP:
                sid += 1
            out.append(sid)
            last = t
        return g.assign(sid_exp=out)

    exp = _per_group(pdf, brute)
    got = (
        sessionize(sdf, ["case", "k"], "ts", GAP, ["id"])
        .toPandas()
        .sort_values(["case", "k", "ts_s", "id"])
    )
    assert got["session_id"].tolist() == exp["sid_exp"].tolist()


def test_delta_random_vs_bruteforce(random_events):
    pdf, sdf = random_events
    exp = _per_group(pdf, lambda g: g.assign(d_exp=g["v"].diff()))
    got = (
        delta(sdf, "d", "v", ["ts_s", "id"], ["case", "k"])
        .toPandas()
        .sort_values(["case", "k", "ts_s", "id"])
    )
    a, b = got["d"].to_numpy(), exp["d_exp"].to_numpy()
    # pandas diff treats NaN operands as NaN, as does Spark arithmetic
    assert ((a == b) | (np.isnan(a) & np.isnan(b))).all()


def test_locf_random_vs_pandas_ffill(random_events):
    pdf, sdf = random_events
    exp = _per_group(pdf, lambda g: g.assign(f_exp=g["v"].ffill()))
    got = (
        locf(sdf, ["v"], ["ts_s", "id"], ["case", "k"])
        .toPandas()
        .sort_values(["case", "k", "ts_s", "id"])
    )
    a, b = got["v"].to_numpy(), exp["f_exp"].to_numpy()
    assert ((a == b) | (np.isnan(a) & np.isnan(b))).all()


def test_interpolate_random_vs_pandas(random_events):
    pdf, sdf = random_events
    # interpolation needs unique grid points per group: dedup on ts_s
    p = pdf.drop_duplicates(["case", "k", "ts_s"])
    s = sdf.dropDuplicates(["case", "k", "ts_s"])

    def brute(g):
        gi = g.set_index("ts_s")
        return g.assign(
            i_exp=gi["v"].interpolate(method="index", limit_area="inside").to_numpy()
        )

    exp = (
        p.sort_values(["case", "k", "ts_s"])
        .groupby(["case", "k"], group_keys=False)[p.columns]
        .apply(brute)
    )
    got = (
        interpolate_linear(s, "v", "ts_s", ["case", "k"], output="i", ndigits=9)
        .toPandas()
        .sort_values(["case", "k", "ts_s"])
    )
    a, b = got["i"].to_numpy(), exp["i_exp"].to_numpy()
    ok = (np.isnan(a) & np.isnan(b)) | (np.abs(a - b) < 1e-6)
    assert ok.all(), (a[~ok][:5], b[~ok][:5])


def test_order_stat_random_vs_numpy(random_events):
    pdf, sdf = random_events
    clean = pdf.dropna(subset=["v"])
    s = sdf.dropna(subset=["v"])
    for q in (0.25, 0.5, 0.95):
        exp = (
            clean.sort_values(["v", "id"])
            .groupby(["case", "k"])
            .apply(
                lambda g, q=q: g["v"].to_numpy()[
                    int(np.ceil(q * len(g))) - 1
                ],
                include_groups=False,
            )
            .rename("e")
            .reset_index()
            .sort_values(["case", "k"])
        )
        got = (
            order_stat(s, ["case", "k"], "v", q, tiebreak=["id"], output="o")
            .toPandas()
            .sort_values(["case", "k"])
        )
        assert got["o"].tolist() == exp["e"].tolist(), q
