"""Deterministic documents generator + planted-cluster ground truth."""

import numpy as np

from pyspark.sql import functions as F

from lambdo_spark.sources.documents import doc_texts, generate_documents


def test_partitioning_invariance(spark):
    """Same (seed, n) → byte-identical rows at any parallelism — the
    property the scale bench relies on."""
    a = generate_documents(spark, 64, seed=7, partitions=1).collect()
    b = generate_documents(spark, 64, seed=7, partitions=13).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # and matches the pure-numpy oracle
    texts = doc_texts(np.arange(64), 7)
    got = {r["doc_id"]: r["text"] for r in a}
    assert all(got[i] == texts[i] for i in range(64))


def test_key_spaces_disjoint_at_any_size():
    """Unique-doc stream keys must never repeat nor collide with trio
    group keys — regression for the `ids + 1 << 32` precedence bug
    that made 'unique' docs 2**26 apart byte-identical."""
    a = doc_texts(np.array([7, 7 + 2**26], dtype=np.uint64), seed=42)
    assert a[0] != a[1]
    # unique member (j=5) of a huge group vs its trio stream
    big = np.array([8 * 2**40, 8 * 2**40 + 5], dtype=np.uint64)
    b = doc_texts(big, seed=42)
    assert b[0] != b[1]


def test_planted_trios_cluster_exactly(spark):
    """dedup_clusters on the generated corpus must recover exactly the
    planted structure: n/8 trios (component id = trio minimum), the
    rest singletons."""
    from lambdo_spark.functions.cluster import dedup_clusters

    n = 160  # 20 groups
    docs = generate_documents(spark, n, seed=42)
    out = dedup_clusters(docs, threshold=0.8)
    agg = out.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum("is_representative").alias("reps"),
        F.count_distinct("cluster_id").alias("clusters"),
    ).first()
    trios = n // 8
    assert agg["rows"] == n
    assert agg["clusters"] == n - 2 * trios
    assert agg["reps"] == n - 2 * trios
    # every trio collapsed onto its minimum id
    trio_rows = out.where(F.pmod(F.col("doc_id"), F.lit(8)) < 3).collect()
    for r in trio_rows:
        assert r["cluster_id"] == (r["doc_id"] // 8) * 8
        assert r["is_representative"] == (r["doc_id"] % 8 == 0)
