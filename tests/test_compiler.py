"""Workflow compiler: spec → stages parity with the reference's
Workflow/Topology behavior (SURVEY.md §3)."""

import pytest

from lambdo_spark.plans.compiler import (
    Workflow,
    compile_workflow,
    expand_extensions,
    stratify,
    strip_comments,
)


def test_extensions_desugar():
    """reference utils.py:13-36 + tests/test_roll.py:84: auto ids."""
    base = {"id": "m", "operation": "roll", "kernel": "mean", "window": 10,
            "inputs": ["A"], "extensions": [{"window": 5}, {"window": 2, "id": "m2"}]}
    out = expand_extensions(base)
    assert [(c["id"], c["window"]) for c in out] == [("m_0", 5), ("m2", 2)]
    assert all("extensions" not in c for c in out)


def test_strip_comments():
    """reference main.py:23 accepts // comments in workflow json."""
    import json
    s = '{\n// a comment\n"tables": []\n}'
    assert json.loads(strip_comments(s)) == {"tables": []}


def test_stratify_layers():
    """reference tests/test_topology.py:140-155 plan-shape style:
    aggregate chain stratifies into dependency layers."""
    spec = {"tables": [
        {"id": "groups", "operation": "data",
         "columns": [{"id": "tot", "operation": "aggregate",
                      "fact_table": "facts", "keys": ["A"],
                      "fact_keys": ["A"], "kernel": "sum", "measure": "M"}]},
        {"id": "facts", "operation": "data"},
        {"id": "report", "operation": "aggregate", "source": "groups",
         "keys": ["A"], "aggregations": [{"id": "n"}]},
    ]}
    assert stratify(spec) == [["facts"], ["groups"], ["report"]]


def test_stratify_cycle_raises():
    spec = {"tables": [
        {"id": "a", "operation": "extend", "source": "b"},
        {"id": "b", "operation": "extend", "source": "a"},
    ]}
    with pytest.raises(ValueError, match="cycle"):
        stratify(spec)


def test_end_to_end_workflow(spark):
    """A full reference-style workflow: data injection (entry point 2,
    tests/test_calculate.py:32-48), calculate, roll family, shift,
    link+aggregate, filter."""
    facts = spark.createDataFrame(
        [(0, "a", 1), (1, "a", 2), (2, "b", 3), (3, "b", 4)],
        "idx long, A string, M long",
    )
    groups = spark.createDataFrame([("a",), ("b",), ("c",)], "A string")
    spec = {"tables": [
        {"id": "facts", "operation": "data", "order_by": ["idx"],
         "columns": [
             {"id": "Mf", "operation": "calculate", "kernel": "float",
              "inputs": ["M"]},
             {"id": "rsum", "operation": "roll", "kernel": "sum",
              "inputs": ["Mf"], "window": 2,
              "extensions": [{"window": 2}, {"window": 3, "id": "rsum3"}]},
             {"id": "nxt", "operation": "shift", "inputs": ["Mf"],
              "periods": -1},
         ]},
        {"id": "groups", "operation": "data",
         "columns": [
             {"id": "tot", "operation": "aggregate", "fact_table": "facts",
              "keys": ["A"], "fact_keys": ["A"], "kernel": "sum",
              "measure": "Mf", "fillna_value": 0.0},
         ],
         "row_filter": {"predicate": []}},
    ]}
    out = compile_workflow(spec, spark, data={"facts": facts, "groups": groups})
    f = out["facts"].orderBy("idx").collect()
    assert [r["rsum_0"] for r in f] == [None, 3.0, 5.0, 7.0]
    assert [r["rsum3"] for r in f] == [None, None, 6.0, 9.0]
    assert [r["nxt"] for r in f] == [2.0, 3.0, 4.0, None]
    g = {r["A"]: r["tot"] for r in out["groups"].collect()}
    assert g == {"a": 3.0, "b": 7.0, "c": 0.0}


def test_workflow_json_string_with_comments(spark):
    spec = """
    {
      // project then aggregate
      "tables": [
        {"id": "src", "operation": "data"},
        {"id": "dims", "operation": "project", "source": "src",
         "inputs": ["A"], "outputs": ["key"]}
      ]
    }
    """
    src = spark.createDataFrame([("a", 1), ("a", 2), ("b", 3)], "A string, M long")
    out = Workflow(spec, spark, data={"src": src}).execute()
    assert sorted(r["key"] for r in out["dims"].collect()) == ["a", "b"]


def test_workflow_source_and_column_filter(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    spark.createDataFrame([(1, 2, 3)], "A long, B long, C long").write.parquet(p)
    spec = {"tables": [
        {"id": "t", "operation": "source", "format": "parquet", "path": p,
         "column_filter": {"exclude": ["B"]}},
        {"id": "ext", "operation": "extend", "source": "t",
         "columns": [{"id": "D", "operation": "calculate", "kernel": "add",
                      "inputs": ["A"], "model": {"value": 10}}]},
    ]}
    out = compile_workflow(spec, spark)
    assert out["t"].columns == ["A", "C"]
    assert out["ext"].collect()[0]["D"] == 11


def test_map_table_via_named_kernel(spark):
    """T3 map table: 'module:attr' kernel ref (reference
    resolve.py:14-49 semantics) over mapInPandas."""
    from lambdo_spark.plans.compiler import compile_workflow, resolve_callable

    assert resolve_callable("tests.map_helpers:double_b")
    data = {"src": spark.createDataFrame([(1, 10.0), (2, 20.0)], "a long, b double")}
    spec = {
        "tables": [
            {"id": "src", "operation": "data"},
            {"id": "mapped", "operation": "map", "source": "src",
             "function": "tests.map_helpers:double_b",
             "schema": "a long, b2 double"},
        ]
    }
    out = compile_workflow(spec, spark, data)["mapped"].toPandas().sort_values("a")
    assert out["b2"].tolist() == [20.0, 40.0]


def test_workflow_timeseries_column_ops(spark):
    """sessionize/delta/rate/locf as declarative column ops sharing
    the table-level (partition_by, order_by) defaults."""
    import datetime as dt

    rows = [
        ("u", dt.datetime(2024, 1, 1, 0, 0, 0), 100),
        ("u", dt.datetime(2024, 1, 1, 0, 0, 10), 150),
        ("u", dt.datetime(2024, 1, 1, 2, 0, 0), 130),
    ]
    data = {"ev": spark.createDataFrame(rows, "k string, ts timestamp, v long")}
    spec = {"tables": [
        {"id": "ev", "operation": "data"},
        {"id": "t", "operation": "extend", "source": "ev",
         "order_by": ["ts"], "partition_by": ["k"],
         "columns": [
             {"id": "sid", "operation": "sessionize", "ts": "ts",
              "gap_seconds": 1800},
             {"id": "d", "operation": "delta", "inputs": ["v"]},
             {"id": "r", "operation": "rate", "inputs": ["v"], "ts": "ts",
              "scale": 100},
         ]},
    ]}
    out = compile_workflow(spec, spark, data)["t"].toPandas().sort_values("ts")
    assert out["sid"].tolist() == [1, 1, 2]
    assert out["d"].fillna(-1).tolist() == [-1, 50, -20]
    # rate row 3: floor(-20*100 / 7190s) == -1 (floor of negative)
    assert out["r"].fillna(-999).tolist() == [-999, 500, -1]


def test_workflow_timeseries_table_ops(spark):
    """sessions/order_stat/distinct/heavy_hitters/grouping_sets as
    declarative population ops."""
    import datetime as dt

    rows = [
        ("u", "a", dt.datetime(2024, 1, 1, 0, 0, 0), 5),
        ("u", "a", dt.datetime(2024, 1, 1, 0, 0, 10), 1),
        ("u", "b", dt.datetime(2024, 1, 1, 2, 0, 0), 9),
        ("v", "a", dt.datetime(2024, 1, 1, 0, 0, 0), 3),
    ]
    data = {"ev": spark.createDataFrame(
        rows, "k string, cat string, ts timestamp, v long")}
    spec = {"tables": [
        {"id": "ev", "operation": "data"},
        {"id": "sess", "operation": "sessions", "source": "ev",
         "keys": ["k"], "ts": "ts", "gap_seconds": 1800},
        {"id": "p50", "operation": "order_stat", "source": "ev",
         "keys": ["k"], "value": "v", "q": 0.5, "output": "med"},
        {"id": "nd", "operation": "distinct", "source": "ev",
         "keys": ["k"], "item": "cat", "output": "n_cats"},
        {"id": "hh", "operation": "heavy_hitters", "source": "ev",
         "keys": ["k"], "item": "cat", "k": 1},
        {"id": "gs", "operation": "grouping_sets", "source": "ev",
         "keys": ["k", "cat"],
         "aggregations": [{"id": "s", "kernel": "sum", "inputs": ["v"]}]},
        {"id": "m4", "operation": "m4", "source": "ev",
         "keys": ["k"], "value": "v", "ts": "ts", "tier_seconds": 86400},
        {"id": "tw", "operation": "time_weighted", "source": "ev",
         "keys": ["k"], "value": "v", "ts": "ts", "tier_seconds": 86400},
        {"id": "cnt", "operation": "counter", "source": "ev",
         "keys": ["k"], "value": "v", "ts": "ts", "tier_seconds": 3600,
         "merge_to": 86400},
        {"id": "vh", "operation": "value_hist", "source": "ev",
         "keys": ["k"], "value": "v", "ts": "ts", "tier_seconds": 3600,
         "bin_width": 4, "merge_to": 86400, "q": 0.5},
    ]}
    out = compile_workflow(spec, spark, data)
    sess = out["sess"].toPandas()
    assert sorted(sess["n_events"].tolist()) == [1, 1, 2]
    med = out["p50"].toPandas().sort_values("k")
    assert med["med"].tolist() == [5, 3]
    nd = out["nd"].toPandas().sort_values("k")
    assert nd["n_cats"].tolist() == [2, 1]
    hh = out["hh"].toPandas().sort_values("k")
    assert hh["cat"].tolist() == ["a", "a"]
    gs = out["gs"].toPandas()
    assert gs[gs["grouping_id"] == 3]["s"].tolist() == [18]
    m4 = out["m4"].toPandas().sort_values("k")
    # u's day bucket: min 1, max 9, first 5 (t=0), last 9 (t=7200)
    assert m4[m4["k"] == "u"][["v_min", "v_max", "v_first", "v_last"]].iloc[
        0].tolist() == [1, 9, 5, 9]
    tw = out["tw"].toPandas().sort_values("k")
    # u: 5 holds 10s, 1 holds 7190s, 9 holds to day end (79200s)
    assert tw[tw["k"] == "u"]["wsum"].iloc[0] == 5 * 10 + 1 * 7190 + 9 * 79200
    cnt = out["cnt"].toPandas().sort_values("k")
    # u via the 1h→1d chain: 5→1 reset contributes 1, 1→9 rises 8
    assert cnt[cnt["k"] == "u"]["increase"].iloc[0] == 1 + 8
    vh = out["vh"].toPandas().sort_values("k")
    # u's values 5,1,9 → median 5 → bin floor(5/4)*4 = 4
    assert vh[vh["k"] == "u"]["q_est"].iloc[0] == 4


def test_reference_style_spec_with_lambdas(spark):
    """The reference's own spec shape runs unmodified (reference
    tests/test_table_populate.py:49-50): noop first table, implicit
    extend second table, inline-lambda 'function' columns — gated
    behind allow_lambda."""
    from lambdo_spark.plans.compiler import Workflow

    wf_json = {
        "id": "My workflow",
        "tables": [
            {
                "id": "Base Table",
                "operation": "noop",
                "columns": [
                    {"id": "B", "operation": "calculate",
                     "function": "lambda x: x + 1", "inputs": ["A"]},
                ],
            },
            {
                "id": "Extended Table",
                # "operation": "extend" — by default (Table.py:177-190)
                "columns": [
                    {"id": "C", "operation": "calculate",
                     "function": "lambda x: x + 1", "inputs": ["B"]},
                ],
            },
        ],
    }
    data = {"Base Table": spark.createDataFrame([(1.0,), (2.0,)], "A double")}
    out = Workflow(wf_json, spark, data, allow_lambda=True).execute()
    got = out["Extended Table"].toPandas().sort_values("A")
    assert got["B"].tolist() == [2.0, 3.0]
    assert got["C"].tolist() == [3.0, 4.0]

    # lambda eval is OFF by default — workflow-supplied code never runs
    with pytest.raises(ValueError, match="allow_lambda"):
        Workflow(wf_json, spark, data).execute()["Extended Table"].collect()


def test_workflow_imports_and_module_attr_kernel(spark, tmp_path):
    """Workflow-level imports (reference Workflow.py:40-41,
    resolve.py:98-130): a user module loaded from a source path whose
    functions resolve as module:attr kernels."""
    mod = tmp_path / "userkernels_t1.py"
    mod.write_text(
        "def double_it(s):\n    return s * 2\n"
        "def span(s):\n    return s.max() - s.min()\n"
    )
    spec = {
        "imports": [str(mod)],
        "tables": [
            {"id": "t", "operation": "data",
             "order_by": ["i"],
             "columns": [
                 {"id": "d", "operation": "calculate",
                  "function": "userkernels_t1:double_it", "inputs": ["v"]},
                 {"id": "sp", "operation": "roll",
                  "function": "userkernels_t1:span", "inputs": ["v"],
                  "window": 2},
             ]},
        ],
    }
    import sys

    sys.path.insert(0, str(tmp_path))
    try:
        from lambdo_spark.plans.compiler import Workflow

        data = {"t": spark.createDataFrame(
            [(0, 3.0), (1, 7.0), (2, 4.0)], "i long, v double")}
        got = (
            Workflow(spec, spark, data).execute()["t"]
            .toPandas().sort_values("i")
        )
        assert got["d"].tolist() == [6.0, 14.0, 8.0]
        assert got["sp"].fillna(-1).tolist() == [-1.0, 4.0, 3.0]
    finally:
        sys.path.remove(str(tmp_path))


def test_holistic_kernels_and_fillna(spark):
    """median/mad/quantile run via the pandas GROUPED_AGG escape hatch;
    C9 fillna_value applies to ANY column op post-attach."""
    from lambdo_spark.plans.compiler import compile_workflow as cw

    data = {"t": spark.createDataFrame(
        [("a", 0, 1.0), ("a", 1, 5.0), ("a", 2, 2.0), ("b", 0, 4.0)],
        "g string, i long, v double")}
    spec = {"tables": [
        {"id": "t", "operation": "data",
         "order_by": ["i"], "partition_by": ["g"],
         "columns": [
             {"id": "med", "operation": "roll", "kernel": "median",
              "inputs": ["v"], "window": 3, "fillna_value": -1.0},
             {"id": "q75", "operation": "all", "kernel": "quantile",
              "inputs": ["v"], "model": {"q": 0.75}},
         ]},
    ]}
    got = cw(spec, spark, data)["t"].toPandas().sort_values(["g", "i"])
    assert got["med"].tolist() == [-1.0, -1.0, 2.0, -1.0]
    assert got["q75"].tolist() == [3.5, 3.5, 3.5, 4.0]


def test_tier_source_reads_pipeline_output(spark, tmp_path):
    """format:"tier" source — workflows consume retention-pipeline
    outputs with snapshot isolation, optional prune + gapfill."""
    from lambdo_spark.plans.compiler import Workflow
    from lambdo_spark.rollup.incremental import read_finalized_tier
    from lambdo_spark.rollup.pipeline import run_retention_pipeline
    from lambdo_spark.sources.pages import generate_pages

    root = str(tmp_path / "tiers")
    run_retention_pipeline(spark, generate_pages(spark, 1500, seed=9), root)
    direct = read_finalized_tier(spark, root, "1h")
    lo = direct.agg({"bucket_s": "min"}).first()[0]
    hi = lo + 14 * 86400

    spec = {"tables": [
        {"id": "t1h", "operation": "source", "format": "tier",
         "path": root, "tier": "1h",
         "prune": {"bucket_s": [lo, hi]}},
        {"id": "daily", "operation": "aggregate", "source": "t1h",
         "keys": ["url"],
         "aggregations": [
             {"id": "n_total", "kernel": "sum", "inputs": ["n_points"]}
         ]},
    ]}
    got = Workflow(spec, spark).execute()
    want = (
        direct.where((direct.bucket_s >= lo) & (direct.bucket_s <= hi))
        .groupBy("url").agg({"n_points": "sum"})
    )
    assert got["t1h"].count() == direct.where(
        (direct.bucket_s >= lo) & (direct.bucket_s <= hi)
    ).count()
    assert got["daily"].count() == want.count()


def test_tier_sink_checkpointed_write(spark, tmp_path):
    """sink with format:"tier" — resumable Iceberg-layout write from
    the workflow language; second execution skips committed parts."""
    from lambdo_spark.plans.compiler import Workflow
    from lambdo_spark.sources.iceberg_layout import IcebergLayoutTable

    root = str(tmp_path / "wf_tier")
    data = {"src": spark.createDataFrame(
        [("u1", 0, 3), ("u1", 604800, 4), ("u2", 0, 5)],
        "url string, part long, n long")}
    spec = {"tables": [
        {"id": "src", "operation": "data"},
        {"id": "out", "operation": "sink", "source": "src",
         "format": "tier", "path": root},
    ]}
    Workflow(spec, spark, data).execute()
    t = IcebergLayoutTable(root)
    assert t.read_tier(spark).count() == 3
    assert sorted(t.part_versions()) == ["0", "604800"]
    snap2 = Workflow(spec, spark, data).execute() and t.current_snapshot()
    assert snap2["new_parts"] == []  # resumed, nothing rewritten


def test_sql_operation(spark):
    """operation:"sql" — the Spark-SQL escape hatch (the reference has
    no SQL surface; SURVEY §3): inputs register as temp views named by
    their workflow ids, results feed downstream stages like any table."""
    facts = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 5)], "idx long, k string, v long"
    )
    dims = spark.createDataFrame([("a", "X"), ("b", "Y")], "k string, grp string")
    spec = {"tables": [
        {"id": "facts", "operation": "data"},
        {"id": "dims", "operation": "data"},
        {"id": "by_grp", "operation": "sql", "inputs": ["facts", "dims"],
         "query": """
            SELECT grp, count(*) AS n, sum(v) AS total
            FROM facts JOIN dims ON facts.k = dims.k
            GROUP BY grp
         """},
        {"id": "top", "operation": "sql", "inputs": ["by_grp"],
         "query": "SELECT grp FROM by_grp WHERE total >= 30"},
    ]}
    out = compile_workflow(spec, spark, data={"facts": facts, "dims": dims})
    got = {r["grp"]: (r["n"], r["total"]) for r in out["by_grp"].collect()}
    assert got == {"X": (2, 30), "Y": (1, 5)}
    assert [r["grp"] for r in out["top"].collect()] == ["X"]


def test_tier_source_realtime(spark, tmp_path):
    """format:"tier" + realtime: the workflow-language form of the
    real-time continuous aggregate — materialized head ∪ raw tail must
    equal a full recompute over the raw table."""
    from pyspark.sql import functions as F

    from lambdo_spark.rollup.pipeline import run_retention_pipeline
    from lambdo_spark.rollup.tiers import rollup_all_tiers
    from lambdo_spark.sources.pages import generate_pages

    pages = generate_pages(spark, 2000, seed=11).persist()
    lo, hi = pages.agg(
        F.min(F.unix_timestamp("warc_ts")), F.max(F.unix_timestamp("warc_ts"))
    ).first()
    cut = lo + (hi - lo) // 2  # deliberately not bucket-aligned
    root = str(tmp_path / "tiers")
    run_retention_pipeline(
        spark, pages.where(F.unix_timestamp("warc_ts") < cut), root
    )

    spec = {"tables": [
        {"id": "raw", "operation": "data"},
        {"id": "rt", "operation": "source", "format": "tier",
         "path": root, "tier": "1h",
         "realtime": {"raw": "raw", "key": "url", "ts": "warc_ts",
                      "text": "text", "lang": "lang"}},
    ]}
    got = compile_workflow(spec, spark, data={"raw": pages})["rt"]
    exp = rollup_all_tiers(pages)["1h"]
    g = got.select("url", "bucket_s", "n_points").toPandas().sort_values(
        ["url", "bucket_s"]).reset_index(drop=True)
    e = exp.select("url", "bucket_s", "n_points").toPandas().sort_values(
        ["url", "bucket_s"]).reset_index(drop=True)
    assert g.equals(e)

    # hierarchical form: cascade=true serves the 1d edge from the 1h
    # partials store (retention roots persist it) — same full-recompute
    # equality at the coarse tier
    spec_c = {"tables": [
        {"id": "raw", "operation": "data"},
        {"id": "rt1d", "operation": "source", "format": "tier",
         "path": root, "tier": "1d",
         "realtime": {"raw": "raw", "cascade": True}},
    ]}
    got_c = compile_workflow(spec_c, spark, data={"raw": pages})["rt1d"]
    exp_c = rollup_all_tiers(pages)["1d"]
    gc = got_c.select("url", "bucket_s", "n_points").toPandas().sort_values(
        ["url", "bucket_s"]).reset_index(drop=True)
    ec = exp_c.select("url", "bucket_s", "n_points").toPandas().sort_values(
        ["url", "bucket_s"]).reset_index(drop=True)
    assert gc.equals(ec)
    pages.unpersist()


def test_quality_filter_op(spark):
    """operation:"quality_filter" — Gopher rules from the workflow
    language, filter and flag modes."""
    good = "the quick brown foxes jumped over packs of lazy sleeping hounds " * 6
    df = spark.createDataFrame(
        [(1, good), (2, "the cat"), (3, "zz " * 80)], "doc_id long, text string"
    )
    spec = {"tables": [
        {"id": "docs", "operation": "data"},
        {"id": "kept", "operation": "quality_filter", "source": "docs",
         "rules": {"min_words": 20, "max_repetition": 0.95}},
        {"id": "flagged", "operation": "quality_filter", "source": "docs",
         "flag": "keep", "rules": {"min_words": 20, "max_repetition": 0.95}},
    ]}
    out = compile_workflow(spec, spark, data={"docs": df})
    assert [r["doc_id"] for r in out["kept"].collect()] == [1]
    flags = {r["doc_id"]: r["keep"] for r in out["flagged"].collect()}
    assert flags == {1: True, 2: False, 3: False}


def test_keep_latest_op(spark):
    """operation:"keep_latest" — newest row per key from the workflow
    language (struct-max plan, no window)."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [("u1", t0, 1), ("u1", t0 + dt.timedelta(hours=1), 2), ("u2", t0, 3)],
        "url string, ts timestamp, doc_id long",
    )
    spec = {"tables": [
        {"id": "docs", "operation": "data"},
        {"id": "latest", "operation": "keep_latest", "source": "docs",
         "keys": ["url"], "ts": "ts", "tiebreak": ["doc_id"]},
    ]}
    got = compile_workflow(spec, spark, data={"docs": df})["latest"]
    assert sorted(r["doc_id"] for r in got.collect()) == [2, 3]


def test_dedup_clusters_and_sample_stratified_ops(spark):
    """operation:"dedup_clusters" / "sample_stratified" — cluster
    labeling and data-mixing quotas from the workflow language."""
    base = "the quick brown fox jumps over the lazy dog again and again ok"
    docs = spark.createDataFrame(
        [(1, base + " a", "en"), (2, base + " b", "en"),
         (3, "totally different text about spark shuffles here now", "en"),
         (4, "nochmal ganz anderer deutscher beispieltext hier jetzt", "de"),
         (5, "weiterer deutscher text ohne jede aehnlichkeit dazu", "de")],
        "doc_id long, text string, lang string",
    )
    spec = {"tables": [
        {"id": "docs", "operation": "data"},
        {"id": "clusters", "operation": "dedup_clusters", "source": "docs",
         "threshold": 0.6},
        {"id": "mix", "operation": "sample_stratified", "source": "docs",
         "keys": ["lang"], "n": 1, "unique_keys": ["doc_id"]},
    ]}
    out = compile_workflow(spec, spark, data={"docs": docs})
    cl = {r["doc_id"]: r["cluster_id"] for r in out["clusters"].collect()}
    assert cl == {1: 1, 2: 1, 3: 3, 4: 4, 5: 5}
    mix = out["mix"].toPandas()
    assert mix.groupby("lang").size().to_dict() == {"en": 1, "de": 1}


def test_remove_boilerplate_op(spark):
    """operation:"remove_boilerplate" from the workflow language."""
    nav = "subscribe now"
    docs = spark.createDataFrame(
        [(1, "a", f"{nav}\none"), (2, "a", f"{nav}\ntwo"), (3, "a", nav)],
        "doc_id long, source string, text string",
    )
    spec = {"tables": [
        {"id": "docs", "operation": "data"},
        {"id": "clean", "operation": "remove_boilerplate", "source": "docs",
         "min_docs": 3},
    ]}
    got = {r["doc_id"]: r["text"]
           for r in compile_workflow(spec, spark, data={"docs": docs})["clean"].collect()}
    assert got == {1: "one", 2: "two", 3: ""}


def test_decontaminate_op(spark):
    """operation:"decontaminate" — two-table dep (source + bench)."""
    span = "what is the capital city of france in europe"
    train = spark.createDataFrame(
        [(1, f"quiz asked {span} twice"), (2, "unrelated words entirely here")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(span,)], "text string")
    spec = {"tables": [
        {"id": "train", "operation": "data"},
        {"id": "bench", "operation": "data"},
        {"id": "flags", "operation": "decontaminate",
         "source": "train", "bench": "bench", "n": 8},
    ]}
    got = {r["doc_id"]: r["contaminated"]
           for r in compile_workflow(
               spec, spark, data={"train": train, "bench": bench}
           )["flags"].collect()}
    assert got == {1: 1, 2: 0}


def test_shuffle_op(spark):
    """operation:"shuffle" — deterministic epoch order from the
    workflow language."""
    docs = spark.createDataFrame([(i,) for i in range(20)], "doc_id long")
    spec = {"tables": [
        {"id": "docs", "operation": "data"},
        {"id": "epoch1", "operation": "shuffle", "source": "docs",
         "unique_keys": ["doc_id"], "seed": "ep1"},
    ]}
    got = compile_workflow(spec, spark, data={"docs": docs})["epoch1"].toPandas()
    assert sorted(got["shuffle_rank"]) == list(range(1, 21))


def test_components_op(spark):
    """operation:"components" — connected components over any edge
    table from the workflow language (composes with dedup_minhash:
    pairs table in, cluster labels out)."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "id_a long, id_b long"
    )
    spec = {"tables": [
        {"id": "edges", "operation": "data"},
        {"id": "cc", "operation": "components", "source": "edges",
         "src": "id_a", "dst": "id_b"},
    ]}
    got = {r["node"]: r["component"]
           for r in compile_workflow(spec, spark, data={"edges": edges})["cc"].collect()}
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7}


def test_dedup_spans_op(spark):
    """operation:"dedup_spans" from the workflow language."""
    span = "a b c d e f g h"
    docs = spark.createDataFrame(
        [(1, f"x {span}"), (2, f"y {span}")], "doc_id long, text string"
    )
    spec = {"tables": [
        {"id": "docs", "operation": "data"},
        {"id": "clean", "operation": "dedup_spans", "source": "docs"},
    ]}
    got = {r["doc_id"]: r["text"]
           for r in compile_workflow(spec, spark, data={"docs": docs})["clean"].collect()}
    assert got == {1: "x", 2: "y"}


def test_media_feature_ops(spark):
    """operation:"audio_features"/"video_features" — real decode from
    the workflow language."""
    import numpy as np

    from lambdo_spark.functions.multimodal import (
        encode_avi_rgb,
        encode_wav_pcm16,
    )

    s = ((np.arange(50) * 3) % 200 - 100).astype(np.int16)
    fr = (np.arange(2 * 4 * 6 * 3) % 256).astype(np.uint8).reshape(2, 4, 6, 3)
    media = spark.createDataFrame(
        [(1, bytearray(encode_wav_pcm16(s, 16000)),
          bytearray(encode_avi_rgb(fr)))],
        "doc_id long, audio binary, video binary",
    )
    spec = {"tables": [
        {"id": "media", "operation": "data"},
        {"id": "af", "operation": "audio_features", "source": "media"},
        {"id": "vf", "operation": "video_features", "source": "media"},
    ]}
    out = compile_workflow(spec, spark, data={"media": media})
    a = out["af"].collect()[0]
    assert (a["sample_rate"], a["n_samples"]) == (16000, 50)
    v = out["vf"].collect()[0]
    assert (v["n_frames"], v["height"], v["width"]) == (2, 4, 6)


def test_tier_source_time_travel_and_changes(spark, tmp_path):
    """format:"tier" direct reads take snapshot/as_of/changes — time
    travel and CDC from the workflow language."""
    from lambdo_spark.sources.iceberg_layout import IcebergLayoutTable

    root = str(tmp_path / "tt")
    t = IcebergLayoutTable(root)
    df0 = spark.createDataFrame([(0, 1, 10.0)], "part long, k long, v double")
    t.write_tier(df0, input_snapshot="s0")
    df1 = spark.createDataFrame([(1, 2, 20.0)], "part long, k long, v double")
    t.write_tier(df1, input_snapshot="s1")

    spec = {"tables": [
        {"id": "now", "operation": "source", "format": "tier",
         "tier": "", "path": root},
        {"id": "old", "operation": "source", "format": "tier",
         "tier": "", "path": root, "snapshot": 0},
        {"id": "delta", "operation": "source", "format": "tier",
         "tier": "", "path": root, "changes": [0, 1]},
    ]}
    out = compile_workflow(spec, spark)
    assert out["now"].count() == 2
    assert out["old"].count() == 1
    ch = out["delta"].toPandas()
    assert set(ch["_change"]) == {"insert"} and len(ch) == 1


def test_merge_sink(spark, tmp_path):
    """sink format:"merge" — batch keyed upsert into an Iceberg-layout
    table from the workflow language; `tag` makes re-runs exactly-once."""
    from lambdo_spark.sources.iceberg_layout import IcebergLayoutTable

    root = str(tmp_path / "m")
    t = IcebergLayoutTable(root)
    base = spark.createDataFrame(
        [(0, 1, 10.0), (0, 2, 20.0)], "part long, k long, v double"
    )
    t.write_tier(base, input_snapshot="base")

    spec = {"tables": [
        {"id": "delta", "operation": "data"},
        {"id": "out", "operation": "sink", "format": "merge",
         "source": "delta", "path": root, "keys": ["k"], "tag": "d1"},
    ]}
    delta = spark.createDataFrame(
        [(0, 2, 99.0), (0, 3, 30.0)], "part long, k long, v double"
    )
    compile_workflow(spec, spark, data={"delta": delta})
    got = {r["k"]: r["v"] for r in IcebergLayoutTable(root).read_tier(spark).collect()}
    assert got == {1: 10.0, 2: 99.0, 3: 30.0}
    snap = IcebergLayoutTable(root).current_snapshot()["snapshot_id"]
    # same tag replays as a no-op
    compile_workflow(spec, spark, data={"delta": delta})
    assert IcebergLayoutTable(root).current_snapshot()["snapshot_id"] == snap


def test_pack_op(spark):
    """operation:"pack" — sequence packing from the workflow language."""
    docs = spark.createDataFrame(
        [(i, 60) for i in range(10)], "doc_id long, n_tok long"
    )
    spec = {"tables": [
        {"id": "docs", "operation": "data"},
        {"id": "packed", "operation": "pack", "source": "docs",
         "tokens": "n_tok", "budget": 128, "order_by": ["doc_id"]},
    ]}
    got = compile_workflow(spec, spark, data={"docs": docs})["packed"].orderBy(
        "doc_id").collect()
    assert [r["pack_id"] for r in got] == [i * 60 // 128 for i in range(10)]


def test_lm_score_op(spark):
    """operation:"lm_score" from the workflow language — self-trained
    and reference-trained forms."""
    rows = [(1, "the cat sat on the mat"), (2, "the cat sat on the mat"),
            (3, "zz qq xx")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    wf = {
        "tables": [
            {"id": "docs", "operation": "data"},
            {"id": "scored", "operation": "lm_score", "source": "docs"},
            {"id": "xscored", "operation": "lm_score", "source": "docs",
             "ref": "docs", "alpha": 0.1},
        ]
    }
    out = compile_workflow(wf, spark, data={"docs": docs})
    got = {r["doc_id"]: r for r in out["scored"].collect()}
    assert got[1]["n_bigrams"] == 6 and got[1]["hits2"] >= 6
    assert got[3]["ppl"] > got[1]["ppl"]
    # ref= form agrees with counts-trained direct call at same alpha
    from lambdo_spark.functions.lm import lm_score
    direct = {r["doc_id"]: r["ppl"]
              for r in lm_score(docs, alpha=0.1).collect()}
    for r in out["xscored"].collect():
        assert abs(r["ppl"] - direct[r["doc_id"]]) < 1e-9


def test_decontaminate_prefilter_op(spark):
    """operation:"decontaminate" with prefilter:"hash64" compiles and
    matches the plain op's output."""
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta eta theta iota")
         for i in range(6)] + [(9, "nothing in common with anything else at all")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    wf = {
        "tables": [
            {"id": "docs", "operation": "data"},
            {"id": "bench", "operation": "data"},
            {"id": "plain", "operation": "decontaminate",
             "source": "docs", "bench": "bench"},
            {"id": "fast", "operation": "decontaminate",
             "source": "docs", "bench": "bench", "prefilter": "hash64"},
        ]
    }
    out = compile_workflow(wf, spark, data={"docs": docs, "bench": bench})
    assert sorted(map(tuple, out["plain"].collect())) == \
        sorted(map(tuple, out["fast"].collect()))
    flags = {r["doc_id"]: r["contaminated"] for r in out["fast"].collect()}
    assert flags[0] == 1 and flags[9] == 0


def test_to_datetime_coerce_and_unsupported_model_args(spark, tmp_path):
    """errors='coerce' maps to try_to_timestamp (NULL on bad input);
    any model arg the JVM rewrite would silently drop raises."""
    d = str(tmp_path / "src")
    spark.createDataFrame(
        [("2024-01-02",), ("garbage",), ("2024-02-03",)], "s string"
    ).write.parquet(d)

    def spec(model):
        return {"tables": [
            {"id": "t", "operation": "source", "format": "parquet",
             "path": d,
             "columns": [{"id": "ts", "function": "pandas:to_datetime",
                          "inputs": ["s"], "model": model}]}]}

    out = (
        Workflow(spec({"format": "%Y-%m-%d", "errors": "coerce"}), spark)
        .execute()["t"].orderBy("s").collect()
    )
    assert [r["ts"] is None for r in out] == [False, False, True]
    with pytest.raises(ValueError, match="unit"):
        Workflow(spec({"format": "%Y-%m-%d", "unit": "s"}), spark).execute()


def test_extend_first_table_without_source_raises(spark):
    with pytest.raises(ValueError, match="first table"):
        Workflow(
            {"tables": [{"id": "t0", "operation": "extend"}]}, spark
        ).execute()


def test_workflow_analytics_table_ops(spark):
    """ewma/anomaly/cusum/corr_pairs as declarative population ops —
    each compiled table must equal the direct function call."""
    rows = [
        ("a", i * 3600, (i * 7) % 23 + 1) for i in range(40)
    ] + [("b", i * 3600, (i * 5) % 17 + 2) for i in range(40)]
    data = {"h": spark.createDataFrame(rows, "k string, b long, v long")}
    spec = {"tables": [
        {"id": "h", "operation": "data"},
        {"id": "sm", "operation": "ewma", "source": "h",
         "keys": ["k"], "value": "v", "order": ["b"], "alpha": 0.4},
        {"id": "an", "operation": "anomaly", "source": "h",
         "keys": ["k"], "value": "v", "bucket": "b",
         "lookback": 5, "min_prior": 2, "threshold": 2.5},
        {"id": "cu", "operation": "cusum", "source": "h",
         "keys": ["k"], "value": "v", "order": ["b"], "slack": 3},
        {"id": "co", "operation": "corr_pairs", "source": "h",
         "series": "k", "value": "v", "bucket": "b"},
    ]}
    out = compile_workflow(spec, spark, data)
    from lambdo_spark.rollup.analytics import (
        anomaly_seasonal, corr_pairs, cusum, ewma,
    )

    src = data["h"]
    for tid, direct in [
        ("sm", ewma(src, "v", ["b"], ["k"], 0.4)),
        ("an", anomaly_seasonal(src, "v", "b", ["k"], lookback=5,
                                min_prior=2, threshold=2.5)),
        ("cu", cusum(src, "v", ["b"], ["k"], slack=3)),
        ("co", corr_pairs(src, "v", "k", "b")),
    ]:
        import pandas.testing as pdt

        cols = list(out[tid].columns)
        got = out[tid].toPandas().sort_values(cols).reset_index(drop=True)
        exp = direct.toPandas().sort_values(cols).reset_index(drop=True)
        pdt.assert_frame_equal(got, exp, check_like=True), tid


def test_workflow_retrieval_table_ops(spark):
    """bm25 (scores + top-k) / tfidf / semdedup as declarative ops."""
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha alpha beta"), (3, "delta gamma")],
        ["doc_id", "text"],
    )
    emb = spark.createDataFrame(
        [(i, [float(i % 3 == j) + 0.01 * i for j in range(3)]) for i in range(9)],
        ["vec_id", "embedding"],
    )
    spec = {"tables": [
        {"id": "docs", "operation": "data"},
        {"id": "emb", "operation": "data"},
        {"id": "scored", "operation": "bm25", "source": "docs",
         "query": ["alpha", "gamma"]},
        {"id": "top1", "operation": "bm25", "source": "docs",
         "query": ["alpha", "gamma"], "k": 1},
        {"id": "w", "operation": "tfidf", "source": "docs",
         "vocab": ["alpha", "delta"]},
        {"id": "kept", "operation": "semdedup", "source": "emb",
         "tau": 0.95, "k": 3},
    ]}
    out = compile_workflow(spec, spark, {"docs": docs, "emb": emb})
    scored = {r["doc_id"]: r["n_terms"] for r in out["scored"].collect()}
    assert scored == {1: 2, 2: 1, 3: 1}
    assert out["top1"].count() == 1
    w = {(r["doc_id"], r["term"]): r["tf"] for r in out["w"].collect()}
    assert w[(2, "alpha")] == 2 and w[(3, "delta")] == 1
    kept = {r["vec_id"] for r in out["kept"].collect()}
    assert kept and kept.issubset(set(range(9)))
    from lambdo_spark.functions.semdedup import semdedup

    direct = {r["vec_id"] for r in semdedup(emb, tau=0.95, k=3).collect()}
    assert kept == direct


def test_workflow_bpe_op(spark):
    docs = spark.createDataFrame(
        [(1, "low low lower"), (2, "newer new lower low")], ["doc_id", "text"]
    )
    spec = {"tables": [
        {"id": "docs", "operation": "data"},
        {"id": "trained", "operation": "bpe", "source": "docs",
         "num_merges": 6},
        {"id": "fixed", "operation": "bpe", "source": "docs",
         "merges": [["l", "o"], ["lo", "w"]]},
    ]}
    out = compile_workflow(spec, spark, {"docs": docs})
    from lambdo_spark.functions.bpe import bpe_encode, train_bpe

    merges = train_bpe(docs, 6)
    exp = {r["doc_id"]: list(r["bpe_tokens"])
           for r in bpe_encode(docs, merges).collect()}
    got = {r["doc_id"]: list(r["bpe_tokens"])
           for r in out["trained"].collect()}
    assert got == exp
    fixed = {r["doc_id"]: list(r["bpe_tokens"])
             for r in out["fixed"].collect()}
    assert fixed[1] == ["low", "</w>", "low", "</w>", "low", "e", "r", "</w>"]


def test_workflow_rolling_corr_op(spark):
    rows = [("a", i, i, 2 * i + (i % 3)) for i in range(12)]
    data = {"h": spark.createDataFrame(rows, "k string, b long, x long, y long")}
    spec = {"tables": [
        {"id": "h", "operation": "data"},
        {"id": "rc", "operation": "rolling_corr", "source": "h",
         "keys": ["k"], "x": "x", "y": "y", "order": ["b"],
         "window": 4, "min_periods": 3},
    ]}
    out = compile_workflow(spec, spark, data)["rc"]
    from lambdo_spark.rollup.analytics import rolling_corr

    direct = rolling_corr(data["h"], "x", "y", ["b"], ["k"], 4, min_periods=3)
    import pandas.testing as pdt

    got = out.toPandas().sort_values("b").reset_index(drop=True)
    exp = direct.toPandas().sort_values("b").reset_index(drop=True)
    pdt.assert_frame_equal(got, exp, check_like=True)


def test_workflow_holt_winters_op(spark):
    rows = [("a", t, float(10 * (t % 3) + t)) for t in range(12)]
    data = {"h": spark.createDataFrame(rows, "k string, b long, v double")}
    spec = {"tables": [
        {"id": "h", "operation": "data"},
        {"id": "fc", "operation": "holt_winters", "source": "h",
         "keys": ["k"], "value": "v", "order": ["b"],
         "season_length": 3, "steps": 4},
    ]}
    out = compile_workflow(spec, spark, data)["fc"]
    from lambdo_spark.rollup.analytics import holt_winters

    direct = holt_winters(data["h"], "v", ["b"], ["k"], 3, steps=4)
    got = sorted((r["h"], r["hw_forecast"]) for r in out.collect())
    exp = sorted((r["h"], r["hw_forecast"]) for r in direct.collect())
    assert got == exp and len(got) == 4
