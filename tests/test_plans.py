"""Physical-plan regression tests — the 100 TB guarantees.

Correctness tests prove the operators right at small scale; these
prove the *plans* stay scale-worthy: column pruning reaches the
parquet scan, the rollup hot path never leaves the JVM, small
dimension joins broadcast, predicates push down. A regression here is
invisible at sf0.01 and catastrophic at 10^12 rows.
"""

import os

import pytest

from pyspark.sql import functions as F

from lambdo_spark.operators import column_ops as C
from lambdo_spark.rollup.tiers import TIER_SECONDS, downsample, finalize, gap_fill, partials_from_pages

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


@pytest.fixture(scope="module")
def pages(spark, tmp_path_factory):
    from lambdo_spark.sources.pages import generate_pages

    path = str(tmp_path_factory.mktemp("plans") / "pages.parquet")
    generate_pages(spark, 2000, seed=1).write.parquet(path)
    return spark.read.parquet(path)


def test_rollup_scan_prunes_html(pages):
    """The big binary column must never leave the parquet reader:
    the 1h-partials ReadSchema carries (url, warc_ts, text, lang)
    but NOT html."""
    plan = _plan(finalize(partials_from_pages(pages, 3600)))
    scan = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan, plan
    assert "html" not in scan[0], scan[0]
    assert "url" in scan[0] and "warc_ts" in scan[0]


def test_rollup_path_is_jvm_only(pages):
    """partials -> downsample -> finalize -> gap_fill: zero Python
    eval nodes; everything whole-stage-codegen-able built-ins."""
    t = finalize(downsample(partials_from_pages(pages, 3600), TIER_SECONDS["1d"]))
    plan = _plan(gap_fill(t, TIER_SECONDS["1d"]))
    for bad in ("BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas", "MapInPandas"):
        assert bad not in plan, f"{bad} found in rollup plan"


def test_rollup_partial_aggregation(pages):
    """Tier groupBy must map-side combine (partial_ aggregate before
    the shuffle) — the first defense against zipf-hot urls."""
    plan = _plan(partials_from_pages(pages, 3600))
    assert "partial_" in plan, plan


def test_link_broadcasts_small_dim(spark):
    """C4 link against a tiny dimension: Catalyst must pick a
    broadcast join, not shuffle the fact side."""
    cust = spark.read.parquet(os.path.join(SF, "customer.parquet"))
    nation = spark.read.parquet(os.path.join(SF, "nation.parquet"))
    out = C.link(cust, "nat", ["c_nationkey"], nation, ["n_nationkey"])
    assert "BroadcastHashJoin" in _plan(out)


def test_filter_pushdown_reaches_scan(spark):
    """A post-hoc filter on a scan lands in PushedFilters (the
    reference forces filter-last, Topology.py:83-85 — we declare last
    and Catalyst pushes down, SURVEY §4.1)."""
    orders = spark.read.parquet(os.path.join(SF, "orders.parquet"))
    df = orders.select("o_orderkey", "o_totalprice").where(
        F.col("o_totalprice") > 1000.0
    )
    plan = _plan(df)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed and "o_totalprice" in pushed[0], plan


def test_column_pruning_through_project(spark):
    """T4 project reads only its input columns from parquet."""
    from lambdo_spark.operators.table_ops import project

    orders = spark.read.parquet(os.path.join(SF, "orders.parquet"))
    plan = _plan(project(orders, ["o_orderstatus"], ["status"]))
    scan = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan and "o_totalprice" not in scan[0], plan


def test_read_tier_partition_pruning(spark, pages, tmp_path):
    """IcebergLayoutTable.read_tier filters on the hive-partitioned
    `part` column — the filter must become a PartitionFilter (pruned
    directory listing), not a post-scan predicate. At 10^12 rows this
    is what makes reading one retention window not touch the rest."""
    from lambdo_spark.sources.iceberg_layout import IcebergLayoutTable, with_part

    t = IcebergLayoutTable(str(tmp_path / "t"))
    tier = with_part(finalize(partials_from_pages(pages, 3600)))
    t.write_tier(tier)
    df = t.read_tier(spark)
    plan = _plan(df)
    scan = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert scan, plan
    assert "part" in scan[0], scan[0]


def test_mor_delete_read_broadcasts_anti_join(spark, tmp_path):
    """A merge-on-read read applies position deletes with a LeftAnti
    join that must BROADCAST the delete side (O(deleted rows), tiny
    next to the data) — never shuffle the petabyte data side to meet
    a kilobyte delete set."""
    from lambdo_spark.sources.iceberg_layout import IcebergLayoutTable

    t = IcebergLayoutTable(str(tmp_path / "t"))
    t.write_tier(spark.createDataFrame(
        [(f"u{i}", i, float(i), 0) for i in range(100)],
        "url string, bucket_s bigint, v double, part bigint",
    ))
    t.delete_where(spark, "v = 3.0", mode="merge-on-read")
    plan = _plan(t.read_tier(spark))
    anti = [ln for ln in plan.splitlines() if "LeftAnti" in ln]
    assert anti, plan
    assert any("BroadcastHashJoin" in ln for ln in anti), anti


def test_gap_fill_join_free(pages):
    """Gap-fill is a single pass over the real rows: per-key lag window
    -> gap bucket range exploded as longs, non-real columns nulled by
    when() projections (all codegen). No join of any
    kind, and exactly ONE exchange (the window's hash-partition) — gap
    rows materialize AFTER the shuffle, so shuffle volume is the real
    rows only, independent of series sparsity."""
    t = finalize(partials_from_pages(pages, 3600))
    plan = _plan(gap_fill(t, 3600))
    for join in ("CartesianProduct", "BroadcastNestedLoopJoin",
                 "SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"):
        assert join not in plan, f"{join} found in gap_fill plan"
    # gap-fill itself must add at most ONE exchange (the window's
    # hash-partition on url) on top of whatever the input tier's own
    # plan already contains
    base = _plan(t).count("Exchange hashpartitioning")
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges <= base + 1, plan
    assert "Generate explode" in plan, plan


def test_timeseries_window_stack_single_exchange(spark):
    """sessionize + delta + rate over the same (key, ts order) must
    collapse into ONE hash exchange on the key: Catalyst merges
    identical window specs, so stacking toolkit columns costs one
    shuffle total, not one per column."""
    from lambdo_spark.rollup.timeseries import delta, rate, sessionize

    ev = spark.read.parquet(os.path.join(SF, "events.parquet"))
    out = sessionize(ev, ["user_id"], "ts", 1800, ["event_id"])
    out = delta(out, "d", "value", ["ts", "event_id"], ["user_id"])
    out = rate(out, "r", "value", "ts", ["ts", "event_id"], ["user_id"])
    plan = _plan(out)
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, f"expected 1 exchange, got {n_exchanges}:\n{plan}"
    for bad in ("BatchEvalPython", "ArrowEvalPython"):
        assert bad not in plan


def test_heavy_hitters_partial_agg_before_window(spark):
    """heavy_hitters must pre-aggregate with map-side combine so the
    top-k window ranks |distinct items| per group, not raw rows."""
    from lambdo_spark.rollup.timeseries import heavy_hitters

    ev = spark.read.parquet(os.path.join(SF, "events.parquet"))
    plan = _plan(heavy_hitters(ev, ["user_id"], "event_type", k=3))
    assert "partial_count" in plan, plan


def test_grouping_sets_single_expand(spark):
    """ROLLUP computes every level via one Expand + one aggregate —
    not one scan per level."""
    from lambdo_spark.operators.table_ops import aggregate_grouping_sets

    ev = spark.read.parquet(os.path.join(SF, "events.parquet"))
    plan = _plan(aggregate_grouping_sets(
        ev, ["event_type", "user_id"],
        [{"id": "s", "kernel": "sum", "inputs": ["value"]}],
    ))
    assert plan.count("Expand") == 1, plan
    assert plan.count("Scan parquet") == 1, plan


def test_topk_plan_uses_take_ordered(spark):
    """topk compiles to TakeOrderedAndProject (distributed partial
    top-k per task), not a row_number over a 1-partition global sort."""
    import __spark_entry__ as ent

    plan = _plan(ent._q_topk_orders(spark, SF))
    assert "TakeOrderedAndProject" in plan, plan


def test_slice_bounded_plan_uses_take_ordered(spark):
    from lambdo_spark.operators.table_ops import row_filter

    orders = spark.read.parquet(os.path.join(SF, "orders.parquet")).select(
        "o_orderkey"
    )
    df = row_filter(
        orders,
        slice_spec={"start": 10, "end": 200, "step": 7},
        order_by=["o_orderkey"],
    )
    assert "TakeOrderedAndProject" in _plan(df)


def test_global_ordinal_two_phase_no_single_partition(spark):
    """global_ordinal: range partition + per-partition offsets — the
    plan must contain NO SinglePartition exchange, and the ordinal must
    equal a sorted enumeration."""
    from lambdo_spark.operators.table_ops import global_ordinal

    orders = spark.read.parquet(os.path.join(SF, "orders.parquet")).select(
        "o_orderkey"
    )
    df = global_ordinal(orders, ["o_orderkey"], out_col="rn")
    assert "SinglePartition" not in _plan(df), _plan(df)
    got = df.orderBy("rn").toPandas()
    assert got["rn"].tolist() == list(range(1, len(got) + 1))
    assert got["o_orderkey"].is_monotonic_increasing


def test_join_by_rownumber_no_single_partition(spark):
    """T6 index join: positional alignment via the two-phase ordinal —
    no 1-partition sort; rows pair by physical position."""
    from lambdo_spark.operators.table_ops import join_tables

    a = spark.range(100).toDF("x")
    b = spark.range(100).selectExpr("id * 2 AS y")
    out = join_tables([a, b], [None])
    assert "SinglePartition" not in _plan(out)
    pdf = out.toPandas()
    assert len(pdf) == 100
    assert (pdf["y"] == pdf["x"] * 2).all()


def test_sample_stratified_no_single_partition(spark):
    """Stratified sampling: BOTH ranking windows partition on keys
    (group+salt, then group) — no SinglePartition exchange anywhere,
    so no task ever ranks a whole mega-stratum, let alone the corpus."""
    from lambdo_spark.functions.sampling import sample_stratified

    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    plan = _plan(sample_stratified(docs, ["lang"], 5, ["doc_id"]))
    assert "SinglePartition" not in plan, plan
    assert plan.count("Window") >= 2, plan


def test_boilerplate_counts_partial_agg(spark):
    """Line-frequency counting must map-side combine (partial agg
    before the exchange) and reassembly must not globally sort."""
    from lambdo_spark.functions.text import remove_boilerplate_lines

    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    out = remove_boilerplate_lines(docs, min_docs=5)
    plan = _plan(out)
    assert "partial_" in plan, plan
    assert "SinglePartition" not in plan, plan
    # the count exchange carries the 16-byte unhex(md5(line)) key, not
    # line text, and removal is an ANTI join against the small
    # boilerplate set (never an inner join of all lines vs all counts)
    opt = _optimized(out)
    assert "unhex(md5(" in opt, opt
    assert "LeftAnti" in opt, opt
    import re
    groupings = re.findall(r"Aggregate \[([^\]]*)\]", opt)
    assert any("_lk" in g for g in groupings), opt
    assert not any("_line#" in g for g in groupings), opt


def test_connected_components_star_plan(spark):
    """One star round = groupBy-min + same-key join: the aggregate
    partials combine map-side and nothing plans a SinglePartition
    exchange (no collect_set of neighbor arrays anywhere)."""
    from lambdo_spark.functions.cluster import _large_star

    e = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "u long, v long"
    )
    plan = _plan(_large_star(e))
    assert "SinglePartition" not in plan, plan
    assert "collect_set" not in plan, plan
    assert "partial_min" in plan, plan


def test_decontaminate_broadcasts_bench(spark):
    """The benchmark n-gram set must broadcast: the corpus side is
    never shuffled for the overlap join."""
    from lambdo_spark.functions.contamination import decontaminate

    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    bench = docs.where(F.pmod(F.col("doc_id"), F.lit(50)) == 0)
    plan = _plan(decontaminate(docs, bench, n=8))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan


def test_dedup_spans_partial_agg_no_single_partition(spark):
    """Span dedup: the corpus-wide window count combines map-side and
    nothing plans a SinglePartition exchange; reassembly state is
    per-doc, not global."""
    from lambdo_spark.functions.exact_substr import remove_duplicate_spans

    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    plan = _plan(remove_duplicate_spans(docs))
    assert "partial_" in plan, plan
    assert "SinglePartition" not in plan, plan


def test_dedup_spans_count_exchange_fixed_width_key(spark):
    """The window-count exchange must carry the 16-byte
    unhex(md5(window)) key, not the ~L-token window STRING (which
    would ship ~L× corpus bytes through the shuffle at 10^12 tokens).
    Pin: the md5 is computed in the map-side projection (optimized
    plan shows unhex(md5(...)) feeding the gram rows) and the
    count-aggregate key column is BinaryType."""
    from lambdo_spark.functions.exact_substr import remove_duplicate_spans

    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    out = remove_duplicate_spans(docs)  # default key="hash128"
    opt = _optimized(out)
    # md5 computed in the map-side projection, before any exchange;
    # unhex(md5(..)) is BinaryType(16) — the exchange key is fixed-width
    assert "unhex(md5(" in opt, opt
    # no raw window string survives as a grouping key: every Aggregate
    # groups on the _ng hash column, never on an array_join expression
    import re
    groupings = re.findall(r"Aggregate \[([^\]]*)\]", opt)
    assert any("_ng" in g for g in groupings), opt
    assert not any("array_join" in g for g in groupings), opt
    # text mode keeps the exact-string key (verify path)
    opt_text = _optimized(remove_duplicate_spans(docs, key="text"))
    assert "unhex(md5(" not in opt_text, opt_text


def test_lm_score_plan_codegen_and_partial_agg(spark):
    """lm_score: bigram construction must be Generate + projection
    (no interpreted higher-order lambda in the hot path), counts must
    map-side combine, and nothing plans a SinglePartition exchange."""
    from lambdo_spark.functions.lm import lm_score

    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    out = lm_score(docs)
    plan = _plan(out)
    assert "partial_" in plan, plan
    # exactly ONE SinglePartition is allowed: the vocabulary-size
    # count — a global aggregate over the already-distinct token set
    # (|V| rows, pre-combined by the hash-distinct exchange below it).
    # The bigram/context counts and the score join must all stay
    # hash-partitioned.
    assert plan.count("SinglePartition") <= 1, plan
    opt = _optimized(out)
    assert "lambdafunction" not in opt.lower(), opt
    assert "Generate" in opt, opt


def test_dedup_spans_plan_no_interpreted_lambda(spark):
    """Span-dedup window construction stays in codegen: the gram
    stage (the corpus-wide hot path — rows ≈ corpus tokens) is
    Generate(explode(sequence)) + slice/array_join in a plain
    projection, never inside a transform lambda. The per-DOC
    reassembly transform after the final groupBy is allowed — its
    input is one doc's own tokens, not corpus-scale."""
    from lambdo_spark.functions.exact_substr import remove_duplicate_spans

    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    opt = _optimized(remove_duplicate_spans(docs))
    # every gram-construction site (array_join over a slice) must be a
    # plain projection expression, not a lambda body
    for ln in opt.splitlines():
        low = ln.lower()
        if "array_join(slice(" in low:
            assert "lambdafunction" not in low, ln
    # and the only lambdas left are the per-doc reassembly transform
    assert opt.lower().count("lambdafunction(") <= 2, opt


def test_decontaminate_plan_no_interpreted_lambda(spark):
    """Decontamination n-gram explode stays in codegen (the
    _exploded_ngrams form), both plain and hash64-prefilter paths."""
    from lambdo_spark.functions.contamination import decontaminate

    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    bench = docs.where(F.pmod(F.col("doc_id"), F.lit(50)) == 0)
    for pf in (None, "hash64"):
        opt = _optimized(decontaminate(docs, bench, n=8, prefilter=pf))
        assert "lambdafunction" not in opt.lower(), (pf, opt)
