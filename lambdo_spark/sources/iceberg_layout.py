"""Iceberg-layout checkpointed, resumable tier writer.

No Iceberg runtime jar exists in this sandbox (BASELINE.md), so this
implements the *protocol* Iceberg provides — snapshot isolation via an
atomic metadata pointer, per-partition manifests with lineage +
metrics, idempotent partition rewrites — over partitioned Parquet:

    <root>/data/part=<p>/*.parquet          (dynamic-overwrite units)
    <root>/metadata/manifest-<p>.json       (lineage row per partition)
    <root>/metadata/snapshot-<n>.json       (committed partition set)
    <root>/metadata/CURRENT                 (atomic pointer, tmp+rename)

Resume: a killed run leaves data files but no manifest/snapshot for
incomplete partitions; the next run lists committed partitions from
CURRENT's snapshot, recomputes ONLY the missing ones (pushed down as a
partition filter), overwrites their directories (idempotent — Spark
dynamic partition overwrite), and commits a new snapshot. Readers only
ever follow CURRENT → committed data.

Where a real Iceberg catalog exists this module is replaced by
``df.writeTo(table).overwritePartitions()`` — the pipeline code only
depends on ``write_tier``/``read_tier``.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F


def _atomic_write_json(path: str, obj: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def _read_json(path: str) -> dict | None:
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


class IcebergLayoutTable:
    def __init__(self, root: str):
        self.root = root
        self.data_dir = os.path.join(root, "data")
        self.meta_dir = os.path.join(root, "metadata")
        os.makedirs(self.meta_dir, exist_ok=True)

    # ------------------------------------------------------------ metadata
    def current_snapshot(self) -> dict | None:
        cur = _read_json(os.path.join(self.meta_dir, "CURRENT"))
        if not cur:
            return None
        return _read_json(os.path.join(self.meta_dir, cur["snapshot"]))

    def committed_parts(self) -> set[str]:
        snap = self.current_snapshot()
        return set(snap["parts"]) if snap else set()

    def lineage(self) -> list[dict]:
        return [
            m
            for p in sorted(self.committed_parts())
            if (m := _read_json(os.path.join(self.meta_dir, f"manifest-{p}.json")))
        ]

    def _commit(self, parts: set[str], extra: dict) -> dict:
        snap = self.current_snapshot()
        n = (snap["snapshot_id"] + 1) if snap else 0
        new = {
            "snapshot_id": n,
            "parts": sorted(parts),
            "committed_at": time.time(),
            **extra,
        }
        name = f"snapshot-{n}.json"
        _atomic_write_json(os.path.join(self.meta_dir, name), new)
        _atomic_write_json(os.path.join(self.meta_dir, "CURRENT"), {"snapshot": name})
        return new

    # ----------------------------------------------------------------- IO
    def write_tier(
        self,
        df: DataFrame,
        part_col: str = "part",
        input_snapshot: str = "",
    ) -> dict:
        """Write all not-yet-committed partitions of ``df``; resumable.

        ``df`` must carry ``part_col`` (string-able partition value).
        Returns the committed snapshot dict.
        """
        done = self.committed_parts()
        all_parts = {
            str(r[0]) for r in df.select(part_col).distinct().collect()
        }
        missing = sorted(all_parts - done)
        self._write_parts(df, missing, part_col, input_snapshot)
        return self._commit(
            done | set(missing),
            {
                "input_snapshot": input_snapshot,
                "new_parts": missing,
                "part_col": part_col,
            },
        )

    def overwrite_parts(
        self,
        df: DataFrame,
        parts: list[str],
        part_col: str = "part",
        input_snapshot: str = "",
        extra: dict | None = None,
    ) -> dict:
        """Force-rewrite the given partitions (committed or not) —
        the incremental-refresh primitive: a changed partition is
        dynamically overwritten and its manifest/lineage replaced,
        then a new snapshot commits. Unlisted partitions are untouched
        (readers on the old snapshot stay consistent)."""
        parts = sorted({str(p) for p in parts})
        self._write_parts(df, parts, part_col, input_snapshot)
        return self._commit(
            self.committed_parts() | set(parts),
            {
                "input_snapshot": input_snapshot,
                "new_parts": parts,
                "part_col": part_col,
                **(extra or {}),
            },
        )

    def _write_parts(
        self, df: DataFrame, missing: list[str], part_col: str, input_snapshot: str
    ) -> None:
        spark = df.sparkSession
        if missing:
            t0 = time.time()
            pending = df.where(F.col(part_col).cast("string").isin(missing))
            (
                pending.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy(part_col)
                .parquet(self.data_dir)
            )
            wall = time.time() - t0
            # per-partition lineage metrics from what was actually written
            written = spark.read.parquet(self.data_dir).where(
                F.col(part_col).cast("string").isin(missing)
            )
            # maps/structs are not hashable by xxhash64 → stable JSON
            # form; combine with bit_xor (order-insensitive, no overflow)
            hashable = [
                F.to_json(F.col(c)) if t.startswith(("map", "struct", "array")) else F.col(c)
                for c, t in written.dtypes
                if c != part_col
            ]
            stats = {
                str(r["p"]): r
                for r in written.select(
                    F.col(part_col).cast("string").alias("p"),
                    F.xxhash64(*hashable).alias("_h"),
                )
                .groupBy("p")
                .agg(
                    F.count(F.lit(1)).alias("rows"),
                    F.expr("bit_xor(_h)").alias("value_hash"),
                )
                .collect()
            }
            for p in missing:
                s = stats.get(p)
                _atomic_write_json(
                    os.path.join(self.meta_dir, f"manifest-{p}.json"),
                    {
                        "part": p,
                        "rows": int(s["rows"]) if s else 0,
                        "value_hash": int(s["value_hash"]) if s else 0,
                        "wall_time_share_s": wall / len(missing),
                        "input_snapshot": input_snapshot,
                        "written_at": time.time(),
                    },
                )

    def read_tier(self, spark: SparkSession) -> DataFrame:
        """Read only committed partitions (snapshot-isolated view)."""
        parts = sorted(self.committed_parts())
        df = spark.read.parquet(self.data_dir)
        part_col = self.current_snapshot().get("part_col", "part")
        return df.where(F.col(part_col).cast("string").isin(parts))


def with_part(df: DataFrame, bucket_col: str = "bucket_s", part_seconds: int = 7 * 86400) -> DataFrame:
    """Derive the partition value (weekly by default) from the bucket."""
    return df.withColumn(
        "part",
        (F.floor(F.col(bucket_col) / F.lit(part_seconds)) * F.lit(part_seconds)).cast(
            "long"
        ),
    )
