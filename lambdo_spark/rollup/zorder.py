"""Z-order (Morton) clustering for multi-dimensional file pruning.

Linear sort orders prune scans on the LEADING column only: a tier
sorted by (url, bucket_s) packs each file with one url range, so a
time-range read still touches every file. Interleaving the bits of
all sort dimensions (Morton order — the layout behind Iceberg's
``rewrite_data_files(strategy => 'sort', sort_order => zorder(...))``
and Delta's OPTIMIZE ZORDER BY) makes every file cover a narrow
RECTANGLE of the key space, so the per-file min/max column stats the
manifests already record become selective on EVERY dimension at once.

Spark-first: the z-value is a pure JVM column expression (shift/mask/
or chains over quantized dimensions — whole-stage codegen); the only
extra work is one min/max aggregate over the frame being rewritten to
fix the quantization ranges.

Dimension handling:

* numeric / timestamp columns quantize linearly into ``bits``-bit
  ranks between the frame's min and max — range predicates on these
  dimensions prune files.
* string columns contribute ``xxhash64 & mask`` (hash locality):
  equal values co-locate (point lookups benefit through the
  co-located numeric dims), but string RANGE predicates gain nothing
  — same tradeoff as Iceberg's bucket transform. The per-file string
  min/max stats are still recorded and still prune whatever they can.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_NUMERIC = ("int", "bigint", "smallint", "tinyint", "double", "float", "decimal")


def _quantize(col: Column, lo, hi, bits: int) -> Column:
    """bits-bit rank of ``col`` within [lo, hi]; NULL → 0. The caller
    pre-casts timestamps to epoch seconds."""
    top = (1 << bits) - 1
    if hi is None or lo is None or hi == lo:
        return F.lit(0).cast("long")
    span = float(hi) - float(lo)
    q = F.floor(
        (col.cast("double") - F.lit(float(lo))) * F.lit(top / span)
    ).cast("long")
    # NULL must rank 0 explicitly: Spark's least/greatest SKIP nulls
    # (greatest(0, NULL) is 0 but least(top, NULL) is top — a NULL
    # would otherwise land at the TOP of the dimension)
    return F.when(
        col.isNull(), F.lit(0).cast("long")
    ).otherwise(F.greatest(F.lit(0), F.least(F.lit(top), q)))


def zvalue_expr(
    df: DataFrame, cols: list[str], bits: int = 16
) -> tuple[Column, dict]:
    """(z-value column, stats) for ``cols`` over ``df``.

    Runs ONE min/max aggregate over the numeric/timestamp dimensions
    to fix the quantization ranges (collected as 2·|dims| scalars),
    then builds the interleaved-bit expression. ``bits`` per dimension;
    ``bits·len(cols)`` total must fit a signed long (≤ 62).
    """
    if bits * len(cols) > 62:
        raise ValueError(
            f"zorder: {len(cols)} dims x {bits} bits exceeds a signed long"
        )
    dtypes = dict(df.dtypes)
    missing = [c for c in cols if c not in dtypes]
    if missing:
        raise ValueError(f"zorder: columns {missing} not in frame")
    num_cols = [
        c
        for c in cols
        if dtypes[c].startswith(_NUMERIC) or dtypes[c].startswith("timestamp")
    ]
    aggs = []
    for c in num_cols:
        col = F.col(c)
        if dtypes[c].startswith("timestamp"):
            col = F.unix_timestamp(col)
        aggs += [F.min(col).alias(f"_lo_{c}"), F.max(col).alias(f"_hi_{c}")]
    stats = {}
    if aggs:
        row = df.agg(*aggs).collect()[0]
        for c in num_cols:
            stats[c] = (row[f"_lo_{c}"], row[f"_hi_{c}"])
    mask = (1 << bits) - 1
    ranks = []
    for c in cols:
        if c in stats:
            col = F.col(c)
            if dtypes[c].startswith("timestamp"):
                col = F.unix_timestamp(col)
            lo, hi = stats[c]
            ranks.append(_quantize(col, lo, hi, bits))
        else:
            ranks.append(
                F.coalesce(F.xxhash64(F.col(c)), F.lit(0)).bitwiseAND(
                    F.lit(mask)
                )
            )
    d = len(cols)
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, r in enumerate(ranks):
            bit = F.shiftright(r, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * d + i))
    return z, stats
