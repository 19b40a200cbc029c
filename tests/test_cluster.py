"""Connected components + duplicate-cluster dedup.

The star-forest fixpoint is property-checked against a plain Python
union-find on seeded random graphs (incl. the worst-case long path,
where naive one-hop label propagation would need O(n) rounds)."""

import random

from pyspark.sql import functions as F

from lambdo_spark.functions.cluster import connected_components, dedup_clusters


def _uf_components(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in range(n_nodes) if any(x in e for e in edges)}


def _cc_dict(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }


def test_cc_golden(spark):
    got = _cc_dict(spark, [(1, 2), (2, 3), (5, 6)])
    assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5}


def test_cc_long_path(spark):
    """A 60-node path: diameter 59, so per-hop propagation would need
    ~59 rounds — star alternation must finish inside max_iter=50."""
    edges = [(i, i + 1) for i in range(59)]
    got = _cc_dict(spark, edges)
    assert got == {i: 0 for i in range(60)}


def test_cc_random_vs_union_find(spark):
    rng = random.Random(7)
    n = 80
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(70)]
    edges = [e for e in edges if e[0] != e[1]]
    want = _uf_components(n, edges)
    assert _cc_dict(spark, edges) == want


def test_cc_string_ids(spark):
    df = spark.createDataFrame(
        [("b", "c"), ("a", "b"), ("x", "y")], "src string, dst string"
    )
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_cc_empty(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert connected_components(df).count() == 0


def test_dedup_clusters_transitive(spark):
    """A~B and B~C near-dups (A~C only via transitivity) land in ONE
    cluster keyed by the min id; unrelated docs are singleton clusters."""
    base = "the quick brown fox jumps over the lazy dog again and again ok"
    docs = spark.createDataFrame(
        [
            (10, base + " alpha"),
            (11, base + " beta"),
            (12, base + " gamma"),
            (20, "completely different text about spark shuffles and joins here"),
            (21, "yet another unrelated document concerning parquet row groups"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["cluster_id"], r["is_representative"])
        for r in dedup_clusters(docs, threshold=0.6).collect()
    }
    assert out[10] == (10, 1)
    assert out[11] == (10, 0)
    assert out[12] == (10, 0)
    assert out[20] == (20, 1)
    assert out[21] == (21, 1)
    # exactly one representative per cluster
    reps = [d for d, (_, r) in out.items() if r]
    assert sorted(reps) == [10, 20, 21]


def test_dedup_clusters_quality_representative(spark):
    """score_col keeps the HIGHEST-quality doc per cluster (ties → the
    larger id), singletons stay their own representative."""
    base = "the quick brown fox jumps over the lazy dog again and again ok"
    docs = spark.createDataFrame(
        [
            (10, base + " alpha", 0.2),
            (11, base + " beta", 0.9),
            (12, base + " gamma", 0.9),
            (20, "completely different text about spark shuffles and joins here", 0.1),
        ],
        "doc_id long, text string, quality double",
    )
    out = {
        r["doc_id"]: (r["cluster_id"], r["is_representative"])
        for r in dedup_clusters(
            docs, threshold=0.6, score_col="quality"
        ).collect()
    }
    assert out[10] == (10, 0)
    assert out[11] == (10, 0)
    assert out[12] == (10, 1)  # 0.9 tie between 11/12 → larger id
    assert out[20] == (20, 1)


def test_dedup_clusters_precomputed_pairs(spark):
    """pairs= clusters an existing pair table (any dedup family's
    output) without re-running MinHash."""
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in (1, 2, 3, 9)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    out = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup_clusters(docs, pairs=pairs).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 9: 9}


# ---------------------------------------------------------------- property
from hypothesis import given, settings, strategies as st


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)),
        min_size=1,
        max_size=40,
    )
)
def test_property_matches_union_find(spark, raw_edges):
    """Random multigraphs (self-loops, duplicates, dense collisions):
    the star-forest fixpoint must equal sequential union-find."""
    edges = [e for e in raw_edges if e[0] != e[1]]
    if not edges:
        return
    want = _uf_components(16, edges)
    assert _cc_dict(spark, edges) == want
