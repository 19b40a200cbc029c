"""Duplicate-cluster assembly: connected components over near-dup pairs.

The dedup family (functions/dedup.py) emits verified near-duplicate
PAIRS.  A training-data pipeline needs one step more: group the pairs
into duplicate CLUSTERS (connected components of the pair graph) and
keep one representative document per cluster.  Transitivity is real in
crawl data — A~B and B~C at 0.8 Jaccard frequently with A~C just below
threshold — so "drop the b of every pair" over-deletes and "keep both"
under-deletes; the component is the correct dedup unit.

Algorithm: alternating large-star / small-star (Kiveris, Lattanzi,
Mirrokni, Rastogi, Vassilvitskii — "Connected Components in MapReduce
and Beyond", SoCC 2014).  Converges in O(log^2 n) rounds on any graph
(in practice 2-4 rounds on dedup graphs, whose components are
near-cliques from LSH banding).  Each round is two groupBy-min +
self-join passes over the edge list — NO per-node neighbor arrays
(``collect_set`` would OOM on a boilerplate mega-cluster whose hub
degree is millions), the min is a map-side-combinable aggregate and
the join back is on the same key, so AQE's skew-join splitting covers
hot hubs.  Driver-side work per round is one tiny (count, checksum)
row for the convergence test; edges are localCheckpoint'ed each round
so the iterative plan never grows.

Reference analog: lambdo has no graph step at all — its dedup story
ends at pairwise UDF comparisons (/root/reference/lambdo/Column.py:
524-559 calculate over row pairs would be the closest shape); the
cluster step is what the 10^12-document scale demands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["connected_components", "dedup_clusters"]


def _large_star(e: DataFrame) -> DataFrame:
    """Attach every strictly-larger neighbor of u to min(N(u) ∪ {u})."""
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
    mins = mins.select("u", F.least("u", "mn").alias("m"))
    return (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Canonicalize edges to (hi, lo); attach lo's and hi to the min."""
    canon = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    mins = canon.groupBy("u").agg(F.min("v").alias("m"))  # m < u always
    lo = (
        canon.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    hi = mins.select("u", F.col("m").alias("v"))
    return lo.union(hi).where(F.col("u") != F.col("v")).distinct()


def _checksum(e: DataFrame) -> tuple[int, int]:
    """(row count, order-independent xor hash) — the convergence probe.

    ``bit_xor`` (not ``sum``) because Spark 4 runs ANSI mode: summing
    xxhash64 longs overflows; xor never does, and edges are distinct so
    no pair can self-cancel.
    """
    row = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
    ).first()
    return int(row["n"]), int(row["h"])


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components of an undirected graph given as an edge list.

    Returns ``(node, component)`` where ``component`` is the MINIMUM
    node id in the node's component — a deterministic, join-free-to-
    interpret label.  Every node that appears in ``edges`` gets a row
    (including each component's own minimum); isolated nodes never
    enter an edge list, so callers map them to themselves (see
    :func:`dedup_clusters`).

    Node ids may be any orderable Spark type (numeric, string, ...).
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    prev = _checksum(e)
    if prev[0] == 0:
        empty = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
        return empty
    for _ in range(max_iter):
        nxt = _small_star(_large_star(e)).localCheckpoint()
        cur = _checksum(nxt)
        e, prev_e = nxt, e
        prev_e.unpersist()
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(theoretical bound is O(log^2 n) — this indicates a bug or "
            "an adversarial id ordering; raise max_iter to confirm)"
        )
    # converged edge set is a star forest: (node -> component min)
    assign = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = (
        e.select(F.col("v").alias("node")).distinct()
        .withColumn("component", F.col("node"))
    )
    return assign.union(roots).distinct()


def dedup_clusters(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    score_col: str | None = None,
    pairs: DataFrame | None = None,
    **lsh_kwargs,
) -> DataFrame:
    """Near-dup CLUSTER assignment: MinHash pairs → components → keep one.

    Returns ``(id_col, cluster_id, is_representative)`` for EVERY input
    document: near-dups share the component-minimum ``cluster_id``,
    singletons are their own cluster, and ``is_representative`` (int
    0/1) marks the one kept doc per cluster.

    Representative policy: the minimum id by default; pass
    ``score_col`` (e.g. a quality score already on ``docs``) to keep
    the HIGHEST-scoring doc per cluster instead — score ties break on
    the larger id, so the pick is deterministic. The score pass is one
    struct-max groupBy on ``cluster_id`` plus a broadcast-sized join
    back (representatives ≈ #clusters rows).

    ``threshold`` / ``**lsh_kwargs`` feed :func:`dedup_minhash_lsh`
    with ``verify="shingle"`` so the pair stage stays the oracled
    exact-at-threshold form. Pass ``pairs`` (columns ``id_a, id_b``)
    to cluster an already-materialized pair table instead — e.g.
    SimHash or embedding-cosine pairs, or a persisted MinHash run.
    """
    if pairs is None:
        from lambdo_spark.functions.dedup import dedup_minhash_lsh

        pairs = dedup_minhash_lsh(
            docs, id_col, text_col, threshold, verify="shingle", **lsh_kwargs
        )
    cc = connected_components(pairs, src="id_a", dst="id_b")
    keep = [F.col(id_col)] + ([F.col(score_col)] if score_col else [])
    out = docs.select(*keep).join(
        cc.withColumnRenamed("node", id_col), id_col, "left"
    )
    cluster = F.coalesce("component", F.col(id_col))
    out = out.select(
        F.col(id_col),
        cluster.alias("cluster_id"),
        *([F.col(score_col)] if score_col else []),
    )
    if score_col is None:
        return out.select(
            id_col,
            "cluster_id",
            (F.col("cluster_id") == F.col(id_col)).cast("int").alias(
                "is_representative"
            ),
        )
    reps = out.groupBy("cluster_id").agg(
        F.max(F.struct(F.col(score_col), F.col(id_col))).alias("_best")
    )
    return (
        out.join(reps, "cluster_id")
        .select(
            id_col,
            "cluster_id",
            (F.col(f"_best.{id_col}") == F.col(id_col)).cast("int").alias(
                "is_representative"
            ),
        )
    )
