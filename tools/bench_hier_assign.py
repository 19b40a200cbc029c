"""Two-level codebook assignment at production k: flat O(k·dim) vs
hierarchical O((n_super + probes·k/n_super)·dim) per row, measured at
k = 10^4 centroids (the k ≈ √N prescription for N ~ 10^8 docs) on a
deterministic synthetic embedding table. Reports rows/s for both and
the hierarchical path's agreement with the flat argmax.

Usage: python tools/bench_hier_assign.py [--rows 200000] [--k 10000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lambdo_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=200_000)
    ap.add_argument("--k", type=int, default=10_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--probes", type=int, default=4)
    args = ap.parse_args()

    spark = get_spark(app_name="bench_hier_assign")
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, FloatType

    from lambdo_spark.functions.similarity import (
        hier_assign_udf,
        ivf_assign_udf,
    )

    dim = args.dim
    k = args.k

    # deterministic synthetic embeddings: executor-side numpy keyed by
    # row id (no data movement from the driver). MIXTURE data — each
    # row is a planted cluster direction plus noise — because real
    # embedding spaces are clustered; on isotropic gaussian vectors
    # every centroid is a near-tie and NO coarse router can recover
    # the argmax (measured 0.30-0.33 agreement on that adversarial
    # case even with weak planted structure, see BENCH.md), which
    # says nothing about embedding workloads. Noise std 0.05/dim
    # gives within-cluster cosine ~0.93 — the regime semantic dedup
    # actually operates in.
    dirs_rng = np.random.default_rng(7)
    dirs = dirs_rng.standard_normal((k, dim))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)

    @F.pandas_udf(ArrayType(FloatType()))
    def synth(ids):
        import pandas as pd

        out = []
        for i in ids:
            rng = np.random.default_rng(int(i))
            base = dirs[int(i) % k]
            out.append(
                (base + rng.standard_normal(dim) * 0.05).astype(np.float32)
            )
        return pd.Series(out)

    emb = (
        spark.range(0, args.rows, 1, 32)
        .select(F.col("id").alias("vec_id"), synth("id").alias("embedding"))
        .persist()
    )
    emb.count()

    # centroids = the planted directions lightly perturbed (what a
    # Lloyd pass over this corpus would produce)
    pert = np.random.default_rng(11)
    cents = dirs + pert.standard_normal((k, dim)) * 0.02

    def run(label, udf):
        t0 = time.time()
        df = emb.select(udf(F.col("embedding"))[0].alias("cell"))
        agg = df.agg(F.sum(F.col("cell").cast("long"))).collect()[0][0]
        wall = time.time() - t0
        return wall, agg

    flat_wall, _ = run("flat", ivf_assign_udf(cents, 1))
    n_super = max(1, int(np.sqrt(args.k)))
    t0 = time.time()
    hudf = hier_assign_udf(cents, n_super=n_super, probes=args.probes)
    build_wall = time.time() - t0
    hier_wall, _ = run("hier", hudf)

    # agreement on a 20k sample
    sample = emb.limit(20_000).persist()
    sample.count()
    fl = sample.select(
        "vec_id", ivf_assign_udf(cents, 1)("embedding")[0].alias("c")
    ).toPandas()
    hi = sample.select(
        "vec_id", hudf("embedding")[0].alias("c")
    ).toPandas()
    m = fl.merge(hi, on="vec_id", suffixes=("_f", "_h"))
    agree = float((m["c_f"] == m["c_h"]).mean())

    out = {
        "metric": "hier_assign_k10k",
        "rows": args.rows,
        "k": args.k,
        "dim": dim,
        "n_super": n_super,
        "probes": args.probes,
        "super_codebook_build_s": round(build_wall, 2),
        "flat_wall_s": round(flat_wall, 2),
        "hier_wall_s": round(hier_wall, 2),
        "flat_rows_per_s": round(args.rows / flat_wall),
        "hier_rows_per_s": round(args.rows / hier_wall),
        "speedup": round(flat_wall / hier_wall, 2),
        "agreement_with_flat": round(agree, 4),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
