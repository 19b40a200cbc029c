"""Salted-vs-plain aggregation under REAL key skew (VERDICT r3 #7).

The salting module's claim is specific: Spark's *built-in* aggregates
already pre-combine hot keys map-side (partial HashAggregate + AQE),
so salting buys little there — the win is for CUSTOM pandas-UDF
kernels (``applyInPandas``), which have NO partial aggregation: every
raw row of a hot key is shipped to, and processed by, ONE task. This
harness records that claim as numbers, on a zipf-extreme input where
one key owns half the corpus:

  builtin_plain   groupBy(key).agg(built-ins)      — baseline sanity
  pandas_plain    groupBy(key).applyInPandas(k)    — hot-key straggler
  pandas_salted   salted applyInPandas + algebraic JVM merge
                  (rollup/salting.py two-phase shape)

All three produce identical results (asserted via a full-frame
checksum). Interleaved reps, best-of reported.

Usage: BENCH_SKEW_ROWS=20000000 python tools/bench_salted_skew.py [reps]
Prints one JSON line; record in BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd

from pyspark.sql import functions as F

from lambdo_spark.session import get_spark
from lambdo_spark.rollup.salting import with_salt

N_ROWS = int(os.environ.get("BENCH_SKEW_ROWS", "20000000"))
N_COLD_KEYS = 100_000
OUT_SCHEMA = "key string, n long, s long, lo long, hi long"


def _kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    v = pdf["v"]
    return pd.DataFrame(
        {"key": [pdf["key"].iloc[0]], "n": [len(v)], "s": [v.sum()],
         "lo": [v.min()], "hi": [v.max()]}
    )


def _salted_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    out = _kernel(pdf)
    out["_salt"] = pdf["_salt"].iloc[0]
    return out


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="bench_salted_skew", master=f"local[{cpus}]"
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(0, int(cpus) * 4, numPartitions=int(cpus) * 4).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    # deterministic skewed frame: key 'hot' owns ~50% of rows, the
    # rest spread uniformly over N_COLD_KEYS cold keys; materialized
    # to parquet so every variant reads the same table (untimed setup)
    path = f"/tmp/lambdo_bench_skew_{N_ROWS}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        base = spark.range(0, N_ROWS, numPartitions=int(cpus) * 4)
        df = base.select(
            F.when(F.pmod(F.xxhash64("id"), F.lit(2)) == 0, F.lit("hot"))
            .otherwise(
                F.concat(
                    F.lit("u"),
                    F.pmod(F.xxhash64("id", F.lit(1)), F.lit(N_COLD_KEYS))
                    .cast("string"),
                )
            )
            .alias("key"),
            F.pmod(F.xxhash64("id", F.lit(2)), F.lit(10_000)).alias("v"),
        )
        df.write.mode("overwrite").parquet(path)
    data = spark.read.parquet(path)

    def checksum(df) -> int:
        row = df.agg(
            F.count(F.lit(1)).alias("rows"),
            F.bit_xor(
                F.xxhash64("key", "n", "s", "lo", "hi")
            ).alias("h"),
        ).first()
        return (row["rows"], row["h"])

    def builtin_plain():
        return data.groupBy("key").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"),
            F.min("v").alias("lo"), F.max("v").alias("hi"),
        )

    def pandas_plain():
        return data.groupBy("key").applyInPandas(_kernel, OUT_SCHEMA)

    def pandas_salted():
        hot = spark.createDataFrame([("hot",)], "key string")
        salted = with_salt(data, ["key"], hot_keys=hot, buckets=int(cpus))
        partials = salted.groupBy("key", "_salt").applyInPandas(
            _salted_kernel, OUT_SCHEMA + ", _salt int"
        )
        return partials.groupBy("key").agg(
            F.sum("n").alias("n"), F.sum("s").alias("s"),
            F.min("lo").alias("lo"), F.max("hi").alias("hi"),
        )

    variants = {
        "builtin_plain": builtin_plain,
        "pandas_plain": pandas_plain,
        "pandas_salted": pandas_salted,
    }
    sums = {}
    walls: dict[str, list] = {k: [] for k in variants}
    for rep in range(reps):
        for name, fn in variants.items():
            t0 = time.time()
            sums[name] = checksum(fn())
            walls[name].append(round(time.time() - t0, 3))
            print(f"rep{rep} {name}: {walls[name][-1]}s", file=sys.stderr)
    assert len(set(sums.values())) == 1, f"variants disagree: {sums}"
    summary = {
        k: {"best": min(v), "mean": round(sum(v) / len(v), 3), "all": v}
        for k, v in walls.items()
    }
    print(json.dumps({
        "metric": "salted_vs_plain_skew",
        "rows": N_ROWS,
        "hot_share": 0.5,
        "cpus": cpus,
        "reps": reps,
        "results": summary,
        "speedup_pandas_salted_vs_plain": round(
            summary["pandas_plain"]["best"] / summary["pandas_salted"]["best"], 2
        ),
    }))


if __name__ == "__main__":
    main()
