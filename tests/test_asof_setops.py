"""As-of join, time-range windows, and set operations — the
timeseries operators beyond the reference's surface (SURVEY §2.4
gaps: no as-of/range joins, row-count windows only, no set ops)."""

import datetime as dt

import pandas as pd

from lambdo_spark.operators.column_ops import roll_range
from lambdo_spark.operators.table_ops import (
    asof_join,
    except_tables,
    intersect_tables,
    union_tables,
)


def _ts(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_backward_golden(spark):
    left = _mk(
        spark,
        [("a", _ts(5), 1), ("a", _ts(10), 2), ("a", _ts(20), 3), ("b", _ts(7), 4)],
        "k string, ts timestamp, ev long",
    )
    right = _mk(
        spark,
        [("a", _ts(4), 100.0), ("a", _ts(10), 200.0), ("a", _ts(15), 300.0),
         ("c", _ts(1), 999.0)],
        "k string, rts timestamp, px double",
    )
    out = (
        asof_join(left, right, ["k"], "ts", "rts", ["px"])
        .toPandas()
        .sort_values(["k", "ts"])
    )
    # ev=1 @5 -> px@4; ev=2 @10 -> px@10 (equal ts matches, inclusive);
    # ev=3 @20 -> px@15; b has no right rows -> NULL
    assert out["px"].tolist() == [100.0, 200.0, 300.0] + [None] or \
        out["px"].fillna(-1).tolist() == [100.0, 200.0, 300.0, -1]
    assert out["ev"].tolist() == [1, 2, 3, 4]


def test_asof_forward_golden(spark):
    left = _mk(spark, [("a", _ts(5), 1), ("a", _ts(16), 2)], "k string, ts timestamp, ev long")
    right = _mk(
        spark,
        [("a", _ts(5), 10.0), ("a", _ts(15), 20.0)],
        "k string, rts timestamp, px double",
    )
    out = (
        asof_join(left, right, ["k"], "ts", "rts", ["px"], direction="forward")
        .toPandas()
        .sort_values("ts")
    )
    # @5 -> forward inclusive matches px@5; @16 -> nothing later -> NULL
    assert out["px"].tolist()[0] == 10.0
    assert pd.isna(out["px"].tolist()[1])


def test_asof_matches_pandas_merge_asof(spark):
    """Cross-check against pandas.merge_asof on deterministic data."""
    import numpy as np

    rng = np.random.default_rng(5)
    lts = np.sort(rng.integers(0, 1000, 200))
    rts = np.sort(rng.integers(0, 1000, 50))
    lpd = pd.DataFrame({
        "k": ["x"] * 200,
        "ts": pd.to_datetime(lts, unit="s"),
        "ev": np.arange(200),
    })
    rpd = pd.DataFrame({
        "k": ["x"] * 50,
        "rts": pd.to_datetime(rts, unit="s"),
        "px": np.arange(50) * 1.5,
    }).drop_duplicates(subset=["k", "rts"])
    exp = pd.merge_asof(
        lpd, rpd, left_on="ts", right_on="rts", by="k"
    ).sort_values("ev")
    got = (
        asof_join(
            spark.createDataFrame(lpd), spark.createDataFrame(rpd),
            ["k"], "ts", "rts", ["px"],
        )
        .toPandas()
        .sort_values("ev")
    )
    pd.testing.assert_series_equal(
        got["px"].reset_index(drop=True), exp["px"].reset_index(drop=True)
    )


def test_roll_range_golden(spark):
    df = _mk(
        spark,
        [("a", _ts(0), 1), ("a", _ts(30), 2), ("a", _ts(59), 4), ("a", _ts(61), 8)],
        "k string, ts timestamp, v long",
    )
    out = (
        roll_range(df, "s60", "sum", ["v"], 60, "ts", ["k"])
        .toPandas()
        .sort_values("ts")
    )
    # trailing 60s inclusive: @0->1; @30->3; @59->7 (0,30,59 all within
    # 59s); @61->14 (2,4,8 — the @0 row is 61s old, outside)
    assert out["s60"].tolist() == [1, 3, 7, 14]


def test_set_ops(spark):
    a = _mk(spark, [(1,), (2,), (2,), (3,)], "x long")
    b = _mk(spark, [(2,), (3,), (4,)], "x long")
    assert union_tables([a, b]).count() == 7
    assert sorted(
        r.x for r in union_tables([a, b], distinct=True).collect()
    ) == [1, 2, 3, 4]
    assert sorted(r.x for r in intersect_tables(a, b).collect()) == [2, 3]
    # exceptAll keeps the surviving duplicate of 2
    assert sorted(r.x for r in except_tables(a, b).collect()) == [1, 2]


def test_asof_and_setops_through_compiler(spark):
    from lambdo_spark.plans.compiler import compile_workflow

    data = {
        "trades": _mk(
            spark, [("a", _ts(5), 1), ("a", _ts(12), 2)],
            "k string, ts timestamp, ev long",
        ),
        "quotes": _mk(
            spark, [("a", _ts(4), 10.0), ("a", _ts(11), 20.0)],
            "k string, qts timestamp, px double",
        ),
    }
    spec = {
        "tables": [
            {"id": "trades", "operation": "data"},
            {"id": "quotes", "operation": "data"},
            {"id": "joined", "operation": "asof_join", "left": "trades",
             "right": "quotes", "on": ["k"], "left_ts": "ts",
             "right_ts": "qts", "values": ["px"]},
            {"id": "both", "operation": "union", "inputs": ["trades", "trades"]},
        ]
    }
    out = compile_workflow(spec, spark, data)
    j = out["joined"].toPandas().sort_values("ts")
    assert j["px"].tolist() == [10.0, 20.0]
    assert out["both"].count() == 4


def test_asof_tolerance_matches_pandas(spark):
    """tolerance: matches farther than N seconds come back NULL
    (pandas merge_asof tolerance semantics), left rows all kept."""
    import numpy as np

    rng = np.random.default_rng(11)
    lts = np.sort(rng.integers(0, 1000, 150))
    rts = np.sort(rng.choice(1000, 20, replace=False))
    lpd = pd.DataFrame({
        "k": ["x"] * 150,
        "ts": pd.to_datetime(lts, unit="s"),
        "ev": np.arange(150),
    })
    rpd = pd.DataFrame({
        "k": ["x"] * 20,
        "rts": pd.to_datetime(rts, unit="s"),
        "px": np.arange(20) * 1.5,
    })
    exp = pd.merge_asof(
        lpd, rpd, left_on="ts", right_on="rts", by="k",
        tolerance=pd.Timedelta(seconds=30),
    ).sort_values("ev")
    got = (
        asof_join(
            spark.createDataFrame(lpd), spark.createDataFrame(rpd),
            ["k"], "ts", "rts", ["px"], tolerance=30,
        )
        .toPandas()
        .sort_values("ev")
    )
    assert len(got) == 150
    pd.testing.assert_series_equal(
        got["px"].reset_index(drop=True), exp["px"].reset_index(drop=True)
    )


def test_asof_tolerance_forward_long_ts(spark):
    """Forward direction with plain long timestamps: @16 has a match
    at 20 within tol 5; @5 matches itself at 5; @40's nearest later
    right is 100 — beyond tol — so NULL."""
    left = spark.createDataFrame(
        [("k", 5), ("k", 16), ("k", 40)], "k string, ts long"
    )
    right = spark.createDataFrame(
        [("k", 5, 1.0), ("k", 20, 2.0), ("k", 100, 3.0)],
        "k string, rts long, px double",
    )
    out = (
        asof_join(left, right, ["k"], "ts", "rts", ["px"],
                  direction="forward", tolerance=5)
        .toPandas().sort_values("ts")
    )
    assert out["px"].tolist()[0] == 1.0
    assert out["px"].tolist()[1] == 2.0
    assert pd.isna(out["px"].tolist()[2])


def test_asof_join_value_col_name_collision_suffixes(spark):
    """A value column the left side also carries gets the _right
    suffix (pandas merge_asof convention) instead of a duplicate-
    column failure."""
    import datetime as dt

    from lambdo_spark.operators.table_ops import asof_join

    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [("k", t0 + dt.timedelta(seconds=10), 111.0)],
        "id string, ts timestamp, price double",
    )
    right = spark.createDataFrame(
        [("k", t0 + dt.timedelta(seconds=5), 42.0)],
        "id string, rts timestamp, price double",
    )
    out = asof_join(left, right, ["id"], "ts", "rts", ["price"])
    row = out.collect()[0]
    assert row["price"] == 111.0          # the left's own column
    assert row["price_right"] == 42.0     # the matched right value
