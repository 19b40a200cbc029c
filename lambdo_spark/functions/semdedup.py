"""SemDeDup-style semantic deduplication (Abbas et al. 2023,
arXiv:2303.09540): cluster the embedding space, then deduplicate by
cosine similarity WITHIN clusters only — the pair search drops from
O(N²) to Σ_c O(|c|²), which is the property that makes embedding
dedup feasible at corpus scale (k ≈ √N keeps expected cell size √N).

Spark-first decomposition:

* centroid seeding is an order-free deterministic sample: the k
  corpus vectors with the smallest ``md5(id)`` — a TakeOrdered (no
  full sort), reproducible on any engine, no RNG state. Lloyd
  refinement (when requested) reuses ``similarity.ivf_codebook``'s
  distributed passes (assign → posexplode → algebraic groupBy).
* assignment is one Arrow-batched matmul per partition
  (``ivf_assign_udf``) against the broadcast k×dim codebook — the
  only corpus-wide pass, no shuffle.
* the within-cluster pair join shuffles ids+vectors ONCE on
  cluster_id; AQE's skew split handles lopsided cells. Each pair
  evaluates the exact float64 cosine — the cluster step only gates
  WHICH pairs are examined, never the similarity arithmetic, so
  survivors are exact for any pair the clustering co-locates
  (SemDeDup's stated contract: near-dups in different cells are the
  recall tradeoff, tuned by k).
* keep rule = lowest id per duplicate group (same as
  ``dedup.dedup_embedding_cosine``): a row is dropped iff SOME
  kept/smaller id in its cell is ≥ tau similar.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

from lambdo_spark.functions.similarity import cosine_expr, ivf_assign_udf


def seeded_centroids(
    emb: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[np.ndarray, list]:
    """Deterministic k seed vectors: smallest ``md5(cast(id as
    string))`` wins (ties by id). Returns (k×dim float64 matrix,
    centroid ids in matrix-row order). O(k·dim) driver bytes.

    The matrix rows are sorted by centroid ID (not md5-sample order):
    ``ivf_assign_udf``'s argmax breaks exact-similarity ties by first
    matrix row, so id-ordered rows make ties resolve to the SMALLEST
    centroid id — the same tie-break the DuckDB oracle's ``ORDER BY
    sim DESC, cid`` uses, keeping duplicate-embedding seeds
    engine-identical."""
    rows = (
        emb.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .orderBy(F.md5(F.col("_id").cast("string")), F.col("_id"))
        .limit(int(k))
        .collect()
    )
    rows = sorted(rows, key=lambda r: r["_id"])
    mat = np.array([r["_v"] for r in rows], dtype=np.float64)
    return mat, [r["_id"] for r in rows]


def assign_clusters(
    emb: DataFrame,
    centroids: np.ndarray,
    centroid_ids: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_super: int | None = None,
    probes: int = 1,
) -> DataFrame:
    """(id, vector, cluster_id) — cluster_id is the CENTROID's id (not
    a positional index), so the labeling is stable under any centroid
    ordering. One Arrow matmul pass, zero shuffle.

    ``n_super`` routes assignment through the two-level codebook
    (``similarity.hier_assign_udf``): O(√k·dim) per row instead of
    O(k·dim) — the scale path once k passes ~10^4 (N ~ 10^8 docs at
    the k ≈ √N prescription). Approximate (recall tuned by
    ``probes``); the default flat path stays exact and is the oracled
    configuration."""
    if n_super is not None:
        from lambdo_spark.functions.similarity import hier_assign_udf

        assign = hier_assign_udf(centroids, n_super=n_super, probes=probes)
    else:
        assign = ivf_assign_udf(centroids, nprobe=1)
    spark = emb.sparkSession
    cmap = spark.createDataFrame(
        [(i, cid) for i, cid in enumerate(centroid_ids)], ["_cell", "cluster_id"]
    )
    cells = emb.select(
        F.col(id_col),
        F.col(vec_col),
        assign(F.col(vec_col))[0].alias("_cell"),
    )
    return cells.join(F.broadcast(cmap), "_cell").drop("_cell")


def semdedup(
    emb: DataFrame,
    tau: float,
    k: int = 16,
    iters: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "matmul",
    n_super: int | None = None,
    probes: int = 1,
) -> DataFrame:
    """Survivors of within-cluster cosine dedup: (id, cluster_id) for
    every row NOT dominated by a smaller-id row ≥ ``tau`` similar in
    the same cluster.

    ``iters=0`` uses the seeded centroids as-is (fully deterministic
    and engine-reproducible — the oracled configuration); ``iters>0``
    runs that many distributed Lloyd passes first (ivf_codebook
    semantics) for tighter cells at the same pair cost.

    ``method="matmul"`` (default, the scale path): ONE shuffle on
    cluster_id, then each cell runs a blocked float64 Gram matmul in
    an Arrow batch (``applyInPandas``) — the |cell|² pair work is
    vectorized BLAS, not |cell|² engine rows. Peak memory is bounded
    by the 1024-row block (block × |cell| doubles). The unit of work
    is one cell per task, which is exactly the SemDeDup contract: k
    must grow with N (k ≈ √N keeps expected |cell| ≈ √N).
    ``method="join"`` keeps the relational form (self-join +
    expression cosine) — the cross-checkable reference path.
    """
    if iters > 0:
        from lambdo_spark.functions.similarity import ivf_codebook

        cents = ivf_codebook(
            emb, n_centroids=int(k), id_col=id_col, vec_col=vec_col, iters=iters
        )
        # Lloyd means are synthetic points; label cells by position.
        cids = list(range(len(cents)))
    else:
        cents, cids = seeded_centroids(emb, k, id_col, vec_col)
    assigned = assign_clusters(
        emb, cents, cids, id_col, vec_col, n_super=n_super, probes=probes
    )

    if method == "matmul":
        return _semdedup_matmul(assigned, tau, id_col, vec_col)
    if method != "join":
        raise ValueError(f"unknown semdedup method {method!r}")
    a = assigned.select(
        F.col("cluster_id"),
        F.col(id_col).alias("_ida"),
        F.col(vec_col).alias("_va"),
    )
    b = assigned.select(
        F.col("cluster_id"),
        F.col(id_col).alias("_idb"),
        F.col(vec_col).alias("_vb"),
    )
    dominated = (
        a.join(b, "cluster_id")
        .where(F.col("_ida") < F.col("_idb"))
        .where(cosine_expr(F.col("_va"), F.col("_vb")) >= F.lit(float(tau)))
        .select(F.col("_idb").alias(id_col))
        .distinct()
    )
    return (
        assigned.join(dominated, id_col, "left_anti")
        .select(F.col(id_col), "cluster_id")
    )


_SD_BLOCK = 1024


def _semdedup_matmul(
    assigned: DataFrame, tau: float, id_col: str, vec_col: str
) -> DataFrame:
    """Per-cell survivor kernel: sort the cell by id, normalize once,
    then blocked Gram products — row j is dominated iff some i<j has
    cosine ≥ tau. float64 throughout; deterministic (the reduction is
    an any(), not an accumulation)."""
    from pyspark.sql.types import StructType

    id_field = next(f for f in assigned.schema.fields if f.name == id_col)
    cl_field = next(
        f for f in assigned.schema.fields if f.name == "cluster_id"
    )
    out_schema = StructType([id_field, cl_field])
    t = float(tau)

    def _kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        v = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        v /= np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
        n = len(pdf)
        dominated = np.zeros(n, dtype=bool)
        for lo in range(0, n, _SD_BLOCK):
            hi = min(lo + _SD_BLOCK, n)
            # rows lo..hi vs ALL later columns; only i<j pairs count
            sims = v[lo:hi] @ v.T  # (hi-lo, n)
            ge = sims >= t
            for r in range(hi - lo):
                i = lo + r
                if i + 1 < n:
                    dominated[i + 1 :] |= ge[r, i + 1 :]
        return pdf.loc[~dominated, [id_col, "cluster_id"]]

    return assigned.groupBy("cluster_id").applyInPandas(
        _kernel, schema=out_schema
    )
