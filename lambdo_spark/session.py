"""SparkSession factory tuned for the rollup workload.

Defaults target the sandbox (local[N], 32 cores) but every knob is the
one you would set on a 1000-executor cluster:

- AQE on (runtime shuffle coalescing + skew-join splitting),
- Arrow on (all our Python kernels are pandas/Arrow-vectorized),
- shuffle partitions sized to the parallelism at hand (AQE coalesces
  down; at 100 TB you would raise the floor, not lower it),
- maxPartitionBytes left at 128m so scans split into memory-safe tasks.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession


def package_zip() -> str:
    """Zip the lambdo_spark package for --py-files-style distribution.

    Executor Python workers unpickle our pandas-UDF kernels *by module
    reference*, so the package must be importable on every worker.
    On a real cluster this zip is what you pass to
    ``spark-submit --py-files``; locally we ``addPyFile`` it so the
    engine works regardless of the driver's cwd/PYTHONPATH.
    """
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    out = os.path.join(tempfile.gettempdir(), "lambdo_spark_pkg.zip")
    with zipfile.ZipFile(out, "w") as z:
        for root, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    z.write(full, rel)
    return out


def get_spark(
    app_name: str = "lambdo_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        try:
            n = int(master.split("[")[1].rstrip("]*")) if "[" in master else 32
        except ValueError:
            n = 32
        shuffle_partitions = max(2 * n, 8)

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 64k-row Arrow batches: our pandas kernels are fully
        # vectorized, so per-batch fixed overhead dominates at small
        # batch sizes (measured: compress stage 26% faster at 65536
        # than the 10k default; 256k regresses)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.session.timeZone", "UTC")
        # Spark still defaults parquet timestamps to legacy INT96,
        # which carries NO column statistics — a `ts >= watermark`
        # predicate then cannot skip a single row group, so every
        # time-range read scans all history. int64 micros restores
        # min/max stats (measured: the realtime-read tail scan drops
        # from 100% to ~3% of raw bytes, tools/bench_realtime.py).
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.addPyFile(package_zip())
    return spark


def load_table(spark: SparkSession, sf_dir: str, name: str):
    """Read one driver-provided parquet table (TESTDATA.md)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
