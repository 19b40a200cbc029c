"""SemDeDup within-cluster embedding dedup: seeded centroids,
assignment, and survivor set cross-checked against a from-scratch
numpy implementation."""

import hashlib

import numpy as np
import pytest

from lambdo_spark.functions.semdedup import (
    assign_clusters,
    seeded_centroids,
    semdedup,
)


def _corpus(n=60, dim=16, dup_every=5, seed=9):
    """Random unit-ish vectors; every dup_every-th vector is a tiny
    perturbation of its predecessor (a planted near-dup pair)."""
    rng = np.random.default_rng(seed)
    vecs = rng.normal(size=(n, dim))
    for i in range(dup_every, n, dup_every):
        vecs[i] = vecs[i - 1] + rng.normal(scale=0.01, size=dim)
    return [(i, [float(x) for x in vecs[i]]) for i in range(n)]


@pytest.fixture()
def emb(spark):
    return spark.createDataFrame(_corpus(), ["vec_id", "embedding"])


def _py_md5_order(rows, k):
    return [
        r[0]
        for r in sorted(
            rows, key=lambda r: (hashlib.md5(str(r[0]).encode()).hexdigest(), r[0])
        )
    ][:k]


def test_seeded_centroids_md5_order(emb):
    # the seed SET is the md5-smallest k; matrix rows are then sorted
    # by centroid id so argmax ties resolve to the smallest id (the
    # DuckDB oracle's tie-break)
    mat, ids = seeded_centroids(emb, 4)
    assert ids == sorted(_py_md5_order(_corpus(), 4))
    assert ids == sorted(ids)
    assert mat.shape == (4, 16)
    lookup = dict(_corpus())
    np.testing.assert_allclose(mat[0], lookup[ids[0]], rtol=1e-6)


def test_assign_clusters_matches_numpy(emb):
    rows = _corpus()
    mat, ids = seeded_centroids(emb, 4)
    got = {
        r["vec_id"]: r["cluster_id"]
        for r in assign_clusters(emb, mat, ids).collect()
    }
    c = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    for vid, vec in rows:
        v = np.array(vec) / np.linalg.norm(vec)
        exp = ids[int(np.argmax(v @ c.T))]
        assert got[vid] == exp, vid


def _py_semdedup(rows, assign, tau):
    lookup = {i: np.array(v) / np.linalg.norm(v) for i, v in rows}
    dropped = set()
    ids = sorted(lookup)
    for i in ids:
        for j in ids:
            if j <= i or assign[i] != assign[j]:
                continue
            if float(lookup[i] @ lookup[j]) >= tau:
                dropped.add(j)
    return set(ids) - dropped


def test_semdedup_survivors_match_bruteforce(emb):
    rows = _corpus()
    mat, ids = seeded_centroids(emb, 4)
    assign = {
        r["vec_id"]: r["cluster_id"]
        for r in assign_clusters(emb, mat, ids).collect()
    }
    got = {r["vec_id"] for r in semdedup(emb, tau=0.9, k=4).collect()}
    exp = _py_semdedup(rows, assign, 0.9)
    assert got == exp
    # the planted near-dup pairs that share a cell must have dropped one side
    assert len(got) < len(rows)


def test_semdedup_high_tau_keeps_all(emb):
    got = semdedup(emb, tau=0.9999999, k=4).collect()
    assert len(got) == len(_corpus())


def test_semdedup_lloyd_iters_valid_partition(emb):
    out = semdedup(emb, tau=0.9, k=4, iters=2)
    rows = out.collect()
    ids = [r["vec_id"] for r in rows]
    assert len(set(ids)) == len(ids)
    assert set(ids).issubset({i for i, _ in _corpus()})
    # survivor invariant: no same-cluster pair at >= tau remains
    by_cluster = {}
    lookup = {i: np.array(v) / np.linalg.norm(v) for i, v in _corpus()}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r["vec_id"])
    for members in by_cluster.values():
        for i in members:
            for j in members:
                if i < j:
                    assert float(lookup[i] @ lookup[j]) < 0.9 + 1e-9


def test_semdedup_matmul_equals_join_method(emb):
    a = {
        (r["vec_id"], r["cluster_id"])
        for r in semdedup(emb, tau=0.9, k=4, method="matmul").collect()
    }
    b = {
        (r["vec_id"], r["cluster_id"])
        for r in semdedup(emb, tau=0.9, k=4, method="join").collect()
    }
    assert a == b and a


def test_semdedup_matmul_blocking_boundary(spark, monkeypatch):
    # force tiny blocks so the blocked Gram path crosses boundaries
    import lambdo_spark.functions.semdedup as sd

    monkeypatch.setattr(sd, "_SD_BLOCK", 3)
    emb = spark.createDataFrame(_corpus(n=40), ["vec_id", "embedding"])
    a = {r["vec_id"] for r in sd.semdedup(emb, tau=0.9, k=2).collect()}
    monkeypatch.setattr(sd, "_SD_BLOCK", 1024)
    b = {r["vec_id"] for r in sd.semdedup(emb, tau=0.9, k=2).collect()}
    assert a == b


def test_semdedup_unknown_method_raises(emb):
    import pytest as _pt

    with _pt.raises(ValueError):
        semdedup(emb, tau=0.9, k=4, method="nope")
