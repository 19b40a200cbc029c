"""Similarity search: brute-force exactness vs a numpy oracle, and
LSH recall against brute force on the real embeddings table."""

import numpy as np
import pandas as pd

from lambdo_spark.functions.similarity import (
    ann_bruteforce_topk,
    ann_ivf_topk,
    ann_lsh_topk,
    ivf_codebook,
)


def _numpy_topk(mat, ids, qix, k):
    q = mat[qix]
    norms = np.linalg.norm(mat, axis=1)
    sims = (mat @ q) / (norms * norms[qix])
    order = [
        i for i in np.lexsort((ids, -np.round(sims, 12))) if ids[i] != ids[qix]
    ][:k]
    return [ids[i] for i in order]


def test_bruteforce_matches_numpy(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    pdf = emb.toPandas()
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    ids = pdf["vec_id"].to_numpy()

    queries = emb.where("vec_id < 3")
    out = ann_bruteforce_topk(emb, queries, k=5).toPandas()
    for qid in [0, 1, 2]:
        got = out[out.query_id == qid].sort_values("rank")["neighbor_id"].tolist()
        qix = int(np.where(ids == qid)[0][0])
        exp = _numpy_topk(mat, ids, qix, 5)
        assert got == exp, f"query {qid}: {got} != {exp}"


def test_lsh_recall_vs_bruteforce(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.where("vec_id < 5")
    exact = ann_bruteforce_topk(emb, queries, k=10).toPandas()
    # near-uniform random vectors have weak neighbor structure → use
    # few bits / many tables (measured recall 0.90 at sf0.001)
    approx = ann_lsh_topk(emb, queries, k=10, bits=4, tables=16).toPandas()
    hits = 0
    for qid in exact.query_id.unique():
        e = set(exact[exact.query_id == qid].neighbor_id)
        a = set(approx[approx.query_id == qid].neighbor_id)
        hits += len(e & a) / len(e)
    recall = hits / exact.query_id.nunique()
    assert recall >= 0.6, f"LSH recall too low: {recall}"


def test_ivf_recall_vs_bruteforce(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.where("vec_id < 5")
    exact = ann_bruteforce_topk(emb, queries, k=10).toPandas()
    # 8 cells, probe 4 → half the corpus scanned per query; random
    # vectors are a worst case for IVF so the bar stays moderate
    approx = ann_ivf_topk(emb, queries, k=10, n_centroids=8, nprobe=4).toPandas()
    hits = 0
    for qid in exact.query_id.unique():
        e = set(exact[exact.query_id == qid].neighbor_id)
        a = set(approx[approx.query_id == qid].neighbor_id)
        hits += len(e & a) / len(e)
    recall = hits / exact.query_id.nunique()
    assert recall >= 0.5, f"IVF recall too low: {recall}"


def test_ivf_full_probe_is_exact(spark):
    """nprobe == n_centroids degenerates to exact search — every
    candidate is scanned, so results must equal brute force."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.where("vec_id < 3")
    exact = ann_bruteforce_topk(emb, queries, k=5).toPandas()
    full = ann_ivf_topk(emb, queries, k=5, n_centroids=4, nprobe=4).toPandas()
    for qid in exact.query_id.unique():
        e = exact[exact.query_id == qid].sort_values("rank").neighbor_id.tolist()
        f = full[full.query_id == qid].sort_values("rank").neighbor_id.tolist()
        assert e == f


def test_ivf_codebook_deterministic(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = ivf_codebook(emb, n_centroids=6, iters=1)
    b = ivf_codebook(emb, n_centroids=6, iters=1)
    np.testing.assert_array_equal(a, b)


def test_lsh_deterministic(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where("vec_id < 2")
    a = ann_lsh_topk(emb, q, k=5).toPandas().sort_values(["query_id", "rank"])
    b = ann_lsh_topk(emb, q, k=5).toPandas().sort_values(["query_id", "rank"])
    pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True))


def test_ivf_persisted_index_skips_rebuild(spark, tmp_path, monkeypatch):
    """ann_ivf_index_write persists assignments (cell-partitioned) +
    codebook; ann_ivf_index_topk must answer repeated query batches
    WITHOUT re-running Lloyd or re-assigning the corpus, reading only
    the probed cells' partitions; full probe equals brute force."""
    import os

    import lambdo_spark.functions.similarity as sim
    from lambdo_spark.functions.similarity import (
        ann_ivf_index_topk,
        ann_ivf_index_write,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    root = str(tmp_path / "ivf_index")
    snap = ann_ivf_index_write(emb, root, n_centroids=4)
    assert snap["n_centroids"] == 4 and len(snap["codebook"]) == 4
    # cell-partitioned layout on disk
    cells = [d for d in os.listdir(os.path.join(root, "data")) if d.startswith("part=")]
    assert 1 <= len(cells) <= 4

    # codebook building must NOT run again on the query path
    def boom(*a, **k):
        raise AssertionError("index query path rebuilt the codebook")

    monkeypatch.setattr(sim, "ivf_codebook", boom)
    queries = emb.where("vec_id < 3")
    exact = ann_bruteforce_topk(emb, queries, k=5).toPandas()
    full = ann_ivf_index_topk(spark, root, queries, k=5, nprobe=4).toPandas()
    for qid in exact.query_id.unique():
        e = exact[exact.query_id == qid].sort_values("rank").neighbor_id.tolist()
        f = full[full.query_id == qid].sort_values("rank").neighbor_id.tolist()
        assert e == f
    # second batch, pruned probe: answers come from the stored index
    again = ann_ivf_index_topk(spark, root, queries, k=5, nprobe=1).toPandas()
    assert set(again.query_id) <= set(exact.query_id)
    assert (again.groupby("query_id")["rank"].max() <= 5).all()

def test_multiprobe_udf_shape_and_recall(spark):
    """lsh_multiprobe_udf: 2**probes buckets per table per vector,
    base bucket always included (probe-0 subset is empty), and
    multiprobe recall dominates base-LSH recall on moderate-cosine
    pairs with the SAME bits/tables."""
    import numpy as np
    from pyspark.sql import functions as F
    from lambdo_spark.functions.similarity import (
        lsh_bucket_udf, lsh_multiprobe_udf,
    )

    rng = np.random.default_rng(7)
    dim, n = 16, 120
    base_vecs = rng.standard_normal((n, dim))
    # pairs at cosine ~0.55: v and a mix of v with noise
    noise = rng.standard_normal((n, dim))
    mixed = 0.72 * base_vecs / np.linalg.norm(base_vecs, axis=1, keepdims=True) \
        + 0.69 * noise / np.linalg.norm(noise, axis=1, keepdims=True)
    rows = [(i, base_vecs[i].tolist()) for i in range(n)] + [
        (i + n, mixed[i].tolist()) for i in range(n)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    bits, tables, probes = 8, 8, 3
    mp = lsh_multiprobe_udf(dim, bits, tables, probes=probes)
    single = lsh_bucket_udf(dim, bits, tables)
    got = emb.select(
        "vec_id",
        mp(F.col("embedding")).alias("mpb"),
        single(F.col("embedding")).alias("sb"),
    ).collect()
    by_id = {r["vec_id"]: r for r in got}
    for r in got:
        assert len(r["mpb"]) == tables * (1 << probes)
        assert set(r["sb"]) <= set(r["mpb"])  # base buckets included
    def hits(key):
        c = 0
        for i in range(n):
            a, b = set(by_id[i][key]), set(by_id[i + n][key])
            c += bool(a & b)
        return c
    assert hits("mpb") > hits("sb")  # multiprobe strictly more recall

    import pytest
    with pytest.raises(ValueError, match="probes"):
        lsh_multiprobe_udf(dim, bits=4, probes=9)
