"""Stratified sampling — deterministic per-group quotas for data mixing.

Training-data pipelines mix sources by recipe ("x docs per language /
domain / quality band"); `df.sample(fraction)` can't express an exact
per-group quota and isn't reproducible across engines. This op ranks
each group's rows by a salted hash (a deterministic pseudorandom
permutation — md5 so the SQL oracle replays the identical order) and
keeps the first ``n`` per group.

Skew is the scale hazard: at 10^12 docs one stratum (lang='en') holds
most of the corpus, and a single ``row_number`` window over it would
rank 10^11 rows in ONE task. The implementation is therefore a
two-phase exact top-k (same shape as rollup/timeseries.py
heavy_hitters): phase 1 ranks within (group, hash-salt-bucket) —
bounding any task at group_size / salt_buckets — and keeps n per
bucket; phase 2 ranks the surviving salt_buckets × n rows per group.
Identical output to the single window for any salt_buckets ≥ 1.

Reference analog: lambdo's row_filter ``sample`` is a whole-frame
pandas shuffle (/root/reference/lambdo/utils.py:266-320); stratified
quotas are the web-scale extension of that knob.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = ["sample_stratified"]


def _hash_key(key_cols: Sequence[str], seed: str) -> Column:
    """Deterministic pseudorandom sort key, identical in ANSI SQL:
    md5(seed || key1 || '|' || key2 ...) — hex string, lowercase in
    both Spark and DuckDB."""
    parts = [F.lit(seed)]
    for c in key_cols:
        parts.append(F.col(c).cast("string"))
        parts.append(F.lit("|"))
    return F.md5(F.concat(*parts).cast("binary"))


def sample_stratified(
    df: DataFrame,
    group_cols: Sequence[str],
    n_per_group: int | dict | None,
    key_cols: Sequence[str],
    seed: str = "42",
    salt_buckets: int = 16,
    fraction: float | None = None,
) -> DataFrame:
    """Keep exactly ``min(quota, group size)`` rows per group, where
    the quota is ``n_per_group`` (absolute int, or a per-stratum
    recipe dict ``{stratum: n}`` — strata missing from the recipe are
    dropped) or ``ceil(fraction × group size)`` (proportional — pass
    ``fraction`` and ``n_per_group=None``).

    ``key_cols`` must uniquely identify a row within its group — the
    salted md5 of the keys is the random order AND the tiebreak, so
    the picked set is fully deterministic (change ``seed`` to draw a
    different sample). Output adds ``_rk`` (1-based rank within the
    group's sample) and keeps all input columns.

    Proportional mode adds one count aggregate on the group key — the
    same key the ranking shuffles on, so the join back is co-located.
    """
    if (n_per_group is None) == (fraction is None):
        raise ValueError("pass exactly one of n_per_group / fraction")
    hk = _hash_key(key_cols, seed)
    d = df.withColumn("_hk", hk)
    if fraction is not None:
        # null-safe equi-join (eqNullSafe per group col) so a NULL
        # stratum samples like any other — matching the absolute-n and
        # dict modes, where the window partition keeps NULL as its own
        # group. A plain `join(counts, cols)` would silently drop every
        # NULL-stratum row. Catalyst still plans this as an equi-join
        # (<=> is a sort-merge/broadcast-able key), so no plan penalty.
        counts = df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("_gn"))
        for i, c in enumerate(group_cols):
            counts = counts.withColumnRenamed(c, f"_g{i}")
        cond = None
        for i, c in enumerate(group_cols):
            clause = d[c].eqNullSafe(counts[f"_g{i}"])
            cond = clause if cond is None else cond & clause
        quota = F.ceil(F.col("_gn") * F.lit(float(fraction))).cast("long")
        d = (
            d.join(counts, cond)
            .withColumn("_quota", quota)
            .drop("_gn", *[f"_g{i}" for i in range(len(group_cols))])
        )
    elif isinstance(n_per_group, dict):
        # an explicit mixing recipe: {stratum value: quota}. Strata
        # absent from the recipe get quota 0 (dropped) — recipes are
        # allowlists. Single group column only (recipes key on values).
        if len(group_cols) != 1:
            raise ValueError("dict quotas require exactly one group column")
        g = F.col(group_cols[0]).cast("string")
        quota = F.lit(0).cast("long")
        for k, v in n_per_group.items():
            quota = F.when(g == str(k), F.lit(int(v)).cast("long")).otherwise(quota)
        d = d.withColumn("_quota", quota).where(F.col("_quota") > 0)
    else:
        d = d.withColumn("_quota", F.lit(int(n_per_group)).cast("long"))
    # phase 1: bound every task at group_size / salt_buckets
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in key_cols]), F.lit(salt_buckets))
    w1 = Window.partitionBy(*group_cols, "_salt").orderBy("_hk", *key_cols)
    surv = (
        d.withColumn("_salt", salt)
        .withColumn("_r1", F.row_number().over(w1))
        .where(F.col("_r1") <= F.col("_quota"))
        .drop("_salt", "_r1")
    )
    # phase 2: final exact rank over ≤ salt_buckets × quota survivors
    w2 = Window.partitionBy(*group_cols).orderBy("_hk", *key_cols)
    return (
        surv.withColumn("_rk", F.row_number().over(w2))
        .where(F.col("_rk") <= F.col("_quota"))
        .drop("_hk", "_quota")
    )


def shuffle_deterministic(
    df: DataFrame,
    key_cols: Sequence[str],
    seed: str = "42",
    out_col: str = "shuffle_rank",
) -> DataFrame:
    """Reproducible GLOBAL shuffle order for training: rank every row
    by a salted md5 of its keys (a deterministic pseudorandom
    permutation — same seed, same order, on any cluster size or
    partitioning). Write sorted by ``out_col`` and the corpus streams
    to the trainer in a fixed, replayable order; change ``seed`` for
    a fresh epoch permutation.

    Scale shape: the ranking is the two-phase
    :func:`~lambdo_spark.operators.table_ops.global_ordinal` (range
    partition on the hash + per-partition offsets) — the naive
    ``row_number() OVER (ORDER BY hash)`` single-reducer sort never
    appears. Because md5 output is uniform, the range partitions are
    balanced no matter how skewed the key distribution is.
    """
    from lambdo_spark.operators.table_ops import global_ordinal

    d = df.withColumn("_hk", _hash_key(key_cols, seed))
    out = global_ordinal(d, ["_hk", *list(key_cols)], out_col=out_col)
    return out.drop("_hk")


def pack_sequences(
    df: DataFrame,
    token_col: str,
    budget: int,
    order_cols: Sequence[str],
    pack_col: str = "pack_id",
    offset_col: str = "pack_offset",
) -> DataFrame:
    """Assign documents to fixed token-budget packs — the standard
    pretraining batching rule: concatenate docs in a deterministic
    order and cut every ``budget`` tokens. A doc belongs to the pack
    where its first token lands (``pack_id = tokens_before // budget``)
    and ``offset_col`` is its position inside that pack, so the writer
    can materialize packs without re-scanning.

    The global prefix sum is TWO-PHASE (the shape of
    ``global_ordinal``): range-partition on the order, per-partition
    token sums collect to O(#partitions) driver rows, and each row
    gets partition-local cumsum + its partition's offset — the naive
    ``SUM() OVER (ORDER BY ...)`` single-partition window never
    appears. Combine with :func:`shuffle_deterministic` to pack in a
    seed-replayable shuffled order.

    The per-partition cumsum uses an explicit ROWS frame
    (``rowsBetween(unboundedPreceding, -1)``) — the default window
    frame for an ordered window is RANGE, under which rows tied on
    ``order_cols`` would each see the OTHERS' tokens in their own
    prefix and land in overlapping packs. With the ROWS frame ties
    pack correctly (disjoint offsets); for fully *deterministic*
    output ``order_cols`` should still uniquely identify rows (pass a
    doc id as the last column), otherwise the relative order WITHIN a
    tie group is implementation-defined.

    Cache lifecycle (same contract as ``global_ordinal``): the
    range-partitioned frame is persisted and stays registered until
    the session ends or ``spark.catalog.clearCache()`` — deliberate.
    The collected ``part_sums`` offsets are only valid for the exact
    partition boundaries the count job saw; unpersisting (or block
    eviction forcing a recompute) would let ``repartitionByRange``
    re-sample boundaries and silently corrupt pack ids. Blocks are
    MEMORY_AND_DISK, so pressure spills rather than evicts.
    """
    cols = [F.col(c) for c in order_cols]
    sdf = (
        df.repartitionByRange(*cols)
        .sortWithinPartitions(*cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    part_sums = {
        r["_pid"]: r["s"]
        for r in sdf.groupBy("_pid")
        .agg(F.coalesce(F.sum(token_col), F.lit(0)).alias("s"))
        .collect()
    }
    if not part_sums:
        return (
            sdf.withColumn(pack_col, F.lit(None).cast("long"))
            .withColumn(offset_col, F.lit(None).cast("long"))
            .drop("_pid")
        )
    offsets, acc = {}, 0
    for pid in sorted(part_sums):
        offsets[pid] = acc
        acc += part_sums[pid]
    off = F.element_at(
        F.map_from_arrays(
            F.array(*[F.lit(int(p)) for p in offsets]),
            F.array(*[F.lit(int(o)) for o in offsets.values()]),
        ),
        F.col("_pid"),
    )
    w = Window.partitionBy("_pid").orderBy(*cols).rowsBetween(
        Window.unboundedPreceding, -1
    )
    before = (
        F.coalesce(F.sum(token_col).over(w), F.lit(0)) + off
    ).cast("long")
    return (
        sdf.withColumn(pack_col, F.floor(before / budget).cast("long"))
        .withColumn(offset_col, F.pmod(before, F.lit(budget)).cast("long"))
        .drop("_pid")
    )
