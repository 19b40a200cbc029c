"""Timeseries toolkit: sessionize, delta/rate, LOCF, linear
interpolation, exact order statistics, distinct counts, heavy
hitters, grouping sets — golden values against tiny hand-computed
frames (the reference's test style, SURVEY §5), plus a pandas
cross-check for interpolation."""

import datetime as dt

import numpy as np
import pandas as pd

from lambdo_spark.operators.table_ops import aggregate_grouping_sets
from lambdo_spark.rollup.timeseries import (
    delta,
    distinct_per_bucket,
    heavy_hitters,
    interpolate_linear,
    locf,
    order_stat,
    rate,
    session_table,
    sessionize,
)


def _ts(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def test_sessionize_gap_boundaries(spark):
    # gaps: 10s, 3600s (new), 5s, 7200s (new) -> sessions 1,1,2,2,3
    df = spark.createDataFrame(
        [("u", _ts(0)), ("u", _ts(10)), ("u", _ts(3610)), ("u", _ts(3615)),
         ("u", _ts(10815)), ("v", _ts(0))],
        "k string, ts timestamp",
    )
    out = (
        sessionize(df, ["k"], "ts", gap_seconds=1800)
        .toPandas()
        .sort_values(["k", "ts"])
    )
    assert out["session_id"].tolist() == [1, 1, 2, 2, 3, 1]


def test_session_table_durations(spark):
    df = spark.createDataFrame(
        [("u", _ts(0)), ("u", _ts(100)), ("u", _ts(5000)), ("u", _ts(5020))],
        "k string, ts timestamp",
    )
    out = (
        session_table(df, ["k"], "ts", gap_seconds=1800)
        .toPandas()
        .sort_values("session_id")
    )
    assert out["n_events"].tolist() == [2, 2]
    assert out["duration_s"].tolist() == [100, 20]
    assert out["start_s"].tolist()[1] - out["start_s"].tolist()[0] == 5000


def test_delta_and_rate(spark):
    df = spark.createDataFrame(
        [("u", _ts(0), 100), ("u", _ts(10), 150), ("u", _ts(30), 130),
         ("v", _ts(0), 7)],
        "k string, ts timestamp, v long",
    )
    out = delta(df, "d", "v", ["ts"], ["k"]).toPandas().sort_values(["k", "ts"])
    assert out["d"].fillna(-999).tolist() == [-999, 50, -20, -999]

    r = (
        rate(df, "r", "v", "ts", ["ts"], ["k"], scale=100)
        .toPandas()
        .sort_values(["k", "ts"])
    )
    # 50/10s * 100 = 500; -20/20s * 100 = -100
    assert r["r"].fillna(-999).tolist() == [-999, 500, -100, -999]


def test_rate_counter_reset(spark):
    df = spark.createDataFrame(
        [("u", _ts(0), 100), ("u", _ts(10), 5)],
        "k string, ts timestamp, v long",
    )
    r = (
        rate(df, "r", "v", "ts", ["ts"], ["k"], counter_reset=True, scale=10)
        .toPandas()
        .sort_values("ts")
    )
    # reset: delta -95 -> treated as raw value 5 -> 5/10s * 10 = 5
    assert r["r"].fillna(-999).tolist() == [-999, 5]


def test_locf_carries_last_known(spark):
    df = spark.createDataFrame(
        [("u", 0, None), ("u", 1, 10.0), ("u", 2, None), ("u", 3, None),
         ("u", 4, 40.0), ("v", 0, None)],
        "k string, b long, v double",
    )
    out = locf(df, ["v"], ["b"], ["k"]).toPandas().sort_values(["k", "b"])
    assert out["v"].fillna(-1).tolist() == [-1, 10.0, 10.0, 10.0, 40.0, -1]


def test_interpolate_linear_golden_and_pandas(spark):
    # u: known at b=0 (v=0) and b=4 (v=8) -> 2,4,6 interpolated
    rows = [("u", 0, 0.0), ("u", 1, None), ("u", 2, None), ("u", 3, None),
            ("u", 4, 8.0), ("u", 5, None)]  # trailing edge stays NULL
    df = spark.createDataFrame(rows, "k string, b long, v double")
    out = (
        interpolate_linear(df, "v", "b", ["k"], output="vi")
        .toPandas()
        .sort_values("b")
    )
    assert out["vi"].fillna(-1).tolist() == [0.0, 2.0, 4.0, 6.0, 8.0, -1]

    # cross-check the interior against pandas interpolate on a grid
    pdf = pd.DataFrame({"b": [r[1] for r in rows], "v": [r[2] for r in rows]})
    expected = pdf.set_index("b")["v"].interpolate(
        method="index", limit_area="inside"
    )
    got = out.set_index("b")["vi"]
    assert np.allclose(
        got.dropna().values, expected.dropna().values
    )


def test_order_stat_exact_kth(spark):
    df = spark.createDataFrame(
        [("g", i, v) for i, v in enumerate([5, 1, 9, 3, 7])]
        + [("h", 0, 42)],
        "k string, id long, v long",
    )
    # sorted g: 1,3,5,7,9; q=0.5 -> k=ceil(2.5)=3 -> 5; q=0.95 -> k=5 -> 9
    med = order_stat(df, ["k"], "v", 0.5, tiebreak=["id"]).toPandas()
    med = med.sort_values("k")
    assert med["order_stat"].tolist() == [5, 42]
    p95 = order_stat(df, ["k"], "v", 0.95, tiebreak=["id"]).toPandas()
    assert sorted(p95["order_stat"].tolist()) == [9, 42]


def test_order_stat_approx_close(spark):
    vals = [("g", i, float(i)) for i in range(1000)]
    df = spark.createDataFrame(vals, "k string, id long, v double")
    ap = order_stat(df, ["k"], "v", 0.5, exact=False).toPandas()
    assert abs(ap["order_stat"].iloc[0] - 500.0) <= 25


def test_distinct_exact_and_approx(spark):
    rows = [("b1", f"u{i % 7}") for i in range(100)] + [("b2", "solo")]
    df = spark.createDataFrame(rows, "bucket string, user string")
    ex = distinct_per_bucket(df, ["bucket"], "user").toPandas().sort_values("bucket")
    assert ex["n_distinct"].tolist() == [7, 1]
    ap = (
        distinct_per_bucket(df, ["bucket"], "user", exact=False, rsd=0.01)
        .toPandas()
        .sort_values("bucket")
    )
    assert ap["n_distinct"].tolist() == [7, 1]  # tiny cardinality: HLL exact


def test_distinct_sketch_merge_matches_direct(spark):
    """The partial+final property that lets coarser tiers reuse finer
    sketches: union of per-1h sketches estimated at 1d == sketch built
    directly at 1d. Exact-integer equality with count_distinct at
    these (coupon-mode) cardinalities."""
    from lambdo_spark.rollup.timeseries import (
        distinct_sketch_downsample,
        distinct_sketch_finalize,
        distinct_sketch_partials,
    )
    import pyspark.sql.functions as F

    rows = [
        ("k1", 1000 + 3600 * (i % 30), f"u{i % 41}") for i in range(500)
    ] + [("k2", 2000 + 3600 * (i % 5), f"v{i % 3}") for i in range(50)]
    df = spark.createDataFrame(rows, "key string, ts_s long, item string").select(
        "key", F.timestamp_seconds("ts_s").alias("ts"), "item"
    )

    p1h = distinct_sketch_partials(df, ["key"], "item", "ts", 3600)
    merged = distinct_sketch_finalize(
        distinct_sketch_downsample(p1h, ["key"], 86400)
    ).toPandas().sort_values(["key", "bucket_s"]).reset_index(drop=True)
    direct = distinct_sketch_finalize(
        distinct_sketch_partials(df, ["key"], "item", "ts", 86400)
    ).toPandas().sort_values(["key", "bucket_s"]).reset_index(drop=True)
    assert merged.equals(direct)

    exact = (
        df.groupBy(
            "key",
            (F.floor(F.unix_timestamp("ts") / 86400) * 86400)
            .cast("long")
            .alias("bucket_s"),
        )
        .agg(F.count_distinct("item").alias("n_exact"))
        .toPandas()
        .sort_values(["key", "bucket_s"])
        .reset_index(drop=True)
    )
    assert merged["n_distinct_est"].tolist() == exact["n_exact"].tolist()


def test_distinct_sketch_error_bound_at_scale(spark):
    """Past coupon mode the estimate is approximate: lgk=12 gives
    rsd ~1.04/sqrt(4096) = 1.6%; require within 5% at 30k distinct."""
    from lambdo_spark.rollup.timeseries import (
        distinct_sketch_finalize,
        distinct_sketch_partials,
    )
    import pyspark.sql.functions as F

    df = spark.range(0, 30000).select(
        F.lit("g").alias("key"),
        F.timestamp_seconds(F.lit(1000)).alias("ts"),
        F.concat(F.lit("u"), F.col("id")).alias("item"),
    )
    est = distinct_sketch_finalize(
        distinct_sketch_partials(df, ["key"], "item", "ts", 3600)
    ).collect()[0]["n_distinct_est"]
    assert abs(est - 30000) / 30000 < 0.05, est


def test_distinct_sketch_workflow_op(spark):
    """distinct_sketch via the workflow language: 1h partials merged
    to 1d, estimates exact at tiny cardinality."""
    from lambdo_spark.plans.compiler import compile_workflow
    import pyspark.sql.functions as F

    rows = [("e1", 100 + 3600 * i, f"u{i % 4}") for i in range(10)]
    src = spark.createDataFrame(rows, "et string, ts_s long, user string").select(
        "et", F.timestamp_seconds("ts_s").alias("ts"), "user"
    )
    wf = {
        "tables": [
            {"id": "ev"},
            {
                "id": "du",
                "operation": "distinct_sketch",
                "source": "ev",
                "keys": ["et"],
                "item": "user",
                "ts": "ts",
                "tier_seconds": 3600,
                "merge_to": 86400,
                "output": "n_users",
            },
        ]
    }
    out = compile_workflow(wf, spark, data={"ev": src})["du"].toPandas()
    exact = (
        src.groupBy(
            "et",
            (F.floor(F.unix_timestamp("ts") / 86400) * 86400)
            .cast("long")
            .alias("bucket_s"),
        )
        .agg(F.count_distinct("user").alias("n"))
        .toPandas()
    )
    m = out.merge(exact, on=["et", "bucket_s"])
    assert len(m) == len(out) == len(exact)
    assert (m["n_users"] == m["n"]).all()


def test_heavy_hitters_salted_matches_unsalted(spark):
    """The skew-proof two-phase top-k (per-salt rank -> final rank of
    S*k survivors) must return EXACTLY the single-window result,
    including count ties broken by item ascending."""
    rows = [
        (f"g{i % 3}", f"item{(i * 7) % 29}") for i in range(500)
    ] + [("g0", "t1")] * 4 + [("g0", "t2")] * 4  # forced tie
    df = spark.createDataFrame(rows, "k string, item string")
    base = (
        heavy_hitters(df, ["k"], "item", k=5)
        .toPandas().sort_values(["k", "rank"]).reset_index(drop=True)
    )
    for s in (2, 8, 64):  # incl. S*k > vocab and S > vocab
        salted = (
            heavy_hitters(df, ["k"], "item", k=5, salt_buckets=s)
            .toPandas().sort_values(["k", "rank"]).reset_index(drop=True)
        )
        assert salted.equals(base), f"salt_buckets={s}"


def test_heavy_hitters_topk_ties(spark):
    rows = (
        [("b", "x")] * 5 + [("b", "y")] * 3 + [("b", "z")] * 3 + [("b", "w")] * 1
    )
    df = spark.createDataFrame(rows, "bucket string, item string")
    out = (
        heavy_hitters(df, ["bucket"], "item", k=3)
        .toPandas()
        .sort_values("rank")
    )
    # tie y/z at 3 -> item ascending: y before z
    assert out["item"].tolist() == ["x", "y", "z"]
    assert out["n"].tolist() == [5, 3, 3]


def test_grouping_sets_rollup_levels(spark):
    df = spark.createDataFrame(
        [("a", "x", 1), ("a", "y", 2), ("b", "x", 4)],
        "g1 string, g2 string, v long",
    )
    out = aggregate_grouping_sets(
        df, ["g1", "g2"],
        [{"id": "s", "kernel": "sum", "inputs": ["v"]},
         {"id": "n"}],
        mode="rollup",
    ).toPandas()
    # levels: (g1,g2) x3 rows, (g1) x2, () x1 -> 6 rows
    assert len(out) == 6
    total = out[out["grouping_id"] == 3]
    assert total["s"].tolist() == [7] and total["n"].tolist() == [3]
    g1_level = out[out["grouping_id"] == 1].sort_values("g1")
    assert g1_level["s"].tolist() == [3, 4]
    leaf = out[out["grouping_id"] == 0]
    assert sorted(leaf["s"].tolist()) == [1, 2, 4]


def test_grouping_sets_cube_levels(spark):
    df = spark.createDataFrame(
        [("a", "x", 1), ("a", "y", 2), ("b", "x", 4)],
        "g1 string, g2 string, v long",
    )
    out = aggregate_grouping_sets(
        df, ["g1", "g2"], [{"id": "s", "kernel": "sum", "inputs": ["v"]}],
        mode="cube",
    ).toPandas()
    # cube adds the (g2) level: 3 + 2 + 2 + 1 = 8 rows
    assert len(out) == 8
    g2_level = out[out["grouping_id"] == 2].sort_values("g2")
    assert g2_level["s"].tolist() == [5, 2]


def test_m4_downsample_golden(spark):
    """Hand-computed M4 bucket: min/max/first/last with a ts tie —
    the tie at t=0 breaks to the SMALLER value for first (struct min)
    and the tie at t=90 breaks to the LARGER value for last."""
    from lambdo_spark.rollup.timeseries import m4_downsample

    df = spark.createDataFrame(
        [("u", _ts(0), 5), ("u", _ts(0), 2), ("u", _ts(30), 9),
         ("u", _ts(90), 1), ("u", _ts(90), 4), ("u", _ts(100), 7)],
        "k string, ts timestamp, v long",
    )
    out = m4_downsample(df, "v", "ts", 3600, ["k"]).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_points"], r["v_min"], r["v_max"]) == (6, 1, 9)
    assert (r["v_first"], r["v_last"]) == (2, 7)
    assert r["last_ts_s"] - r["first_ts_s"] == 100


def test_time_weighted_locf_golden(spark):
    """v=10 holds 0..60, v=40 holds 60..3600 within a 1h bucket:
    wsum = 10*60 + 40*3540, covered = 3600, twa = 39 (int div).
    A second bucket with one sample mid-bucket covers only its tail."""
    from lambdo_spark.rollup.timeseries import time_weighted

    df = spark.createDataFrame(
        [("u", _ts(0), 10), ("u", _ts(60), 40), ("u", _ts(5400), 8)],
        "k string, ts timestamp, v long",
    )
    out = {r["bucket_s"]: r for r in
           time_weighted(df, "v", "ts", 3600, ["k"]).collect()}
    b0 = out[1704067200]
    assert (b0["wsum"], b0["covered_s"]) == (10 * 60 + 40 * 3540, 3600)
    assert b0["twa"] == (10 * 60 + 40 * 3540) // 3600
    b1 = out[1704067200 + 3600]
    assert (b1["wsum"], b1["covered_s"], b1["twa"]) == (8 * 1800, 1800, 8)


def test_time_weighted_one_exchange(spark):
    """The lead window and the aggregate share one hash exchange —
    exactly one Exchange in the plan (the scale property)."""
    from lambdo_spark.rollup.timeseries import time_weighted

    df = spark.createDataFrame(
        [("u", _ts(0), 10)], "k string, ts timestamp, v long",
    )
    plan = time_weighted(df, "v", "ts", 3600, ["k"])._jdf.queryExecution(
    ).executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_counter_partials_golden_resets(spark):
    """Counter 10→15→3→8 in one bucket: rises 5, reset contributes the
    restarted value 3, rise 5 — increase 13; first/last pinned."""
    from lambdo_spark.rollup.timeseries import counter_finalize, counter_partials

    df = spark.createDataFrame(
        [("u", _ts(0), 10), ("u", _ts(60), 15), ("u", _ts(120), 3),
         ("u", _ts(180), 8)],
        "k string, ts timestamp, v long",
    )
    out = counter_finalize(counter_partials(df, "v", "ts", 3600, ["k"])).collect()
    assert len(out) == 1
    r = out[0]
    assert r["increase"] == 5 + 3 + 5
    assert (r["first_v"], r["last_v"], r["n_points"]) == (10, 8, 4)


def test_counter_chain_equals_direct(spark):
    """The tier chain (1h partials → 1d downsample) returns EXACTLY the
    1d partials computed from raw — including resets that land on 1h
    boundaries and keys with empty 1h gaps."""
    from lambdo_spark.rollup.timeseries import counter_downsample, counter_partials

    rows = []
    v = 0
    for k in ("a", "b"):
        v = 0
        for i in range(200):
            # sawtooth with jitter: resets every 37 samples; samples
            # every 11 min → crosses many 1h edges, some hours empty
            v = (v + 7 + (i * 13) % 5) if i % 37 else 1
            rows.append((k, _ts(i * 660 + (i % 3)), v))
    df = spark.createDataFrame(rows, "k string, ts timestamp, v long")
    chain = counter_downsample(
        counter_partials(df, "v", "ts", 3600, ["k"]), 86400, ["k"]
    )
    direct = counter_partials(df, "v", "ts", 86400, ["k"])
    a = sorted(map(tuple, chain.collect()))
    b = sorted(map(tuple, direct.collect()))
    assert a == b


def test_counter_partials_one_exchange(spark):
    from lambdo_spark.rollup.timeseries import counter_partials

    df = spark.createDataFrame(
        [("u", _ts(0), 1)], "k string, ts timestamp, v long",
    )
    plan = counter_partials(df, "v", "ts", 3600, ["k"])._jdf.queryExecution(
    ).executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_hist_quantile_chain_and_error_bound(spark):
    """Histogram-sketch quantile: the 1h→1d chain equals the 1d-direct
    histogram, and the estimate is within one bin_width of the exact
    order statistic at every (key, bucket)."""
    import pyspark.sql.functions as F

    from lambdo_spark.rollup.timeseries import (
        order_stat,
        quantile_from_hist,
        value_hist_downsample,
        value_hist_partials,
    )

    rows = [
        ("a" if i % 3 else "b", _ts(i * 660), (i * 137) % 1000)
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v long")
    chain = value_hist_downsample(
        value_hist_partials(df, "v", "ts", 3600, ["k"], bin_width=50),
        86400, ["k"],
    )
    direct = value_hist_partials(df, "v", "ts", 86400, ["k"], bin_width=50)
    assert sorted(map(tuple, chain.collect())) == sorted(
        map(tuple, direct.collect())
    )
    est = quantile_from_hist(chain, 0.95, ["k"]).toPandas()
    exact = order_stat(
        df.withColumn(
            "bucket_s",
            (F.floor(F.unix_timestamp("ts") / 86400) * 86400).cast("long"),
        ),
        ["k", "bucket_s"], "v", 0.95, output="p95",
    ).toPandas()
    m = est.merge(exact, on=["k", "bucket_s"])
    assert len(m) == len(est) == len(exact) > 1
    assert ((m["p95"] - m["q_est"]).abs() <= 50).all()
    # the bin estimate never exceeds the true order statistic
    assert (m["q_est"] <= m["p95"]).all()


def test_time_weighted_chain_equals_direct(spark):
    """1h time-weighted partials downsampled to 1d equal the 1d
    partials from raw — the boundary holds (last sample of an hour
    holding into later hours / to day end) are reconstructed exactly,
    including across empty-hour gaps; finalize matches too."""
    from lambdo_spark.rollup.timeseries import (
        time_weighted,
        time_weighted_downsample,
        time_weighted_finalize,
        time_weighted_partials,
    )

    rows = []
    for k in ("a", "b"):
        for i in range(120):
            # irregular sampling: 41-minute stride + jitter → many
            # empty hours, occasional same-hour bursts
            rows.append((k, _ts(i * 2460 + (i % 7) * 11), (i * 37) % 500))
    df = spark.createDataFrame(rows, "k string, ts timestamp, v long")
    chain = time_weighted_downsample(
        time_weighted_partials(df, "v", "ts", 3600, ["k"]),
        3600, 86400, ["k"],
    )
    direct = time_weighted_partials(df, "v", "ts", 86400, ["k"])
    assert sorted(map(tuple, chain.collect())) == sorted(
        map(tuple, direct.collect())
    )
    fin = time_weighted_finalize(chain, 86400).toPandas()
    one = time_weighted(df, "v", "ts", 86400, ["k"]).toPandas()
    m = fin.merge(one, on=["k", "bucket_s"], suffixes=("_c", "_d"))
    assert len(m) == len(fin) == len(one) > 2
    assert (m["wsum_c"] == m["wsum_d"]).all()
    assert (m["covered_s_c"] == m["covered_s_d"]).all()
    assert (m["twa_c"] == m["twa_d"]).all()


def test_lttb_downsample_golden(spark):
    """One point per present bucket: edge buckets emit their first/
    last points; the interior bucket picks the max-triangle point
    (the 500-peak) against neighbor-bucket centroids."""
    from lambdo_spark.rollup.timeseries import lttb_downsample

    df = spark.createDataFrame(
        [("u", _ts(0), 0), ("u", _ts(10), 100),
         ("u", _ts(3600), 0), ("u", _ts(3700), 500), ("u", _ts(3800), 0),
         ("u", _ts(7200), 10), ("u", _ts(7210), 20)],
        "k string, ts timestamp, v long",
    )
    out = {
        r["bucket_s"] - 1704067200: (r["ts_s"] - 1704067200, r["v"])
        for r in lttb_downsample(df, "v", "ts", 3600, ["k"]).collect()
    }
    assert out == {0: (0, 0), 3600: (3700, 500), 7200: (7210, 20)}


def test_order_stat_nulls_and_q0(spark):
    """NULL values are excluded from the ranked population (same as
    percentile_approx); q=0.0 returns the group minimum, not an empty
    result; an all-NULL group vanishes like in the approx path."""
    df = spark.createDataFrame(
        [("g", 0, None), ("g", 1, None), ("g", 2, 1), ("g", 3, 2),
         ("g", 4, 3), ("n", 0, None)],
        "k string, id long, v long",
    )
    med = order_stat(df, ["k"], "v", 0.5, tiebreak=["id"]).toPandas()
    # median of the NON-NULL population [1,2,3] is 2 (k=ceil(1.5)=2)
    assert med["k"].tolist() == ["g"]
    assert med["order_stat"].tolist() == [2]
    lo = order_stat(df, ["k"], "v", 0.0, tiebreak=["id"]).toPandas()
    assert lo["order_stat"].tolist() == [1]


def test_quantile_from_hist_q0_lowest_bin(spark):
    from lambdo_spark.rollup.timeseries import (
        quantile_from_hist,
        value_hist_partials,
    )

    df = spark.createDataFrame(
        [("g", dt.datetime(2024, 1, 1, 0, 0, i), v)
         for i, v in enumerate([15, 25, 35])],
        "k string, ts timestamp, v long",
    )
    p = value_hist_partials(df, "v", "ts", 3600, ["k"], bin_width=10)
    q0 = quantile_from_hist(p, 0.0, ["k"]).toPandas()
    assert len(q0) == 1  # group present, lowest populated bin
    assert q0.iloc[0]["q_est"] == 10


def test_lttb_float_values_not_truncated(spark):
    """Floating value columns must keep their fractional part — the
    pick must distinguish 10.9 from 10.1 (both truncate to 10)."""
    from lambdo_spark.rollup.timeseries import lttb_downsample

    base = dt.datetime(2024, 1, 1)
    rows = []
    # three buckets; middle bucket has a clear float outlier 10.9
    for b, vals in enumerate([[5.0], [10.1, 10.9, 10.2], [5.0]]):
        for i, v in enumerate(vals):
            rows.append(("g", base + dt.timedelta(seconds=b * 60 + i * 5), v))
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = lttb_downsample(df, "v", "ts", 60, ["k"]).toPandas()
    mid = out[out["bucket_s"] == out["bucket_s"].sort_values().iloc[1]]
    assert abs(float(mid["v"].iloc[0]) - 10.9) < 1e-9
