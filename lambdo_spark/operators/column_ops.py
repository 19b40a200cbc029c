"""Column operators C1–C9 (SURVEY.md §2.2) as DataFrame compositions.

lambdo evaluates columns against implicit frame row order
(/root/reference/README.md:109-121); Spark has no physical row order,
so every order-sensitive op here takes explicit ``partition_by`` /
``order_by`` — the "single biggest semantic translation" (SURVEY.md
§1.1 Time series row).

Row-order semantics parity:
- roll windows are trailing row-count frames with min_periods == N
  (first N-1 rows NULL), matching reference tests/test_roll.py:46-48.
- shift(k) == pandas Series.shift: positive k looks back (lag),
  negative looks forward (lead) — tests/test_calculate.py:54-89.
- link stores the *natural key* of the target row rather than a
  pandas index position (Column.py:717-718 has no distributed
  analog); compose dereferences by joining on that key. Golden tests
  compare values, not surrogate ids (SURVEY.md §7.3).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec, functions as F

from lambdo_spark.functions.registry import get_kernel


def _window(partition_by: Sequence[str] | None, order_by: Sequence[str]) -> WindowSpec:
    w = Window.partitionBy(*(partition_by or []))
    return w.orderBy(*[F.col(c) for c in order_by])


def calculate(
    df: DataFrame,
    output: str,
    kernel: str,
    inputs: Sequence[str],
    model: dict | None = None,
) -> DataFrame:
    """C1 — per-row scalar (reference Column.py:524-559), compiled to a
    built-in JVM expression (never row-at-a-time Python)."""
    k = get_kernel(kernel)
    if k.expr is None:
        raise ValueError(f"kernel '{kernel}' has no scalar form")
    return df.withColumn(output, k.expr([F.col(c) for c in inputs], **(model or {})))


def roll(
    df: DataFrame,
    output: str,
    kernel: str,
    inputs: Sequence[str],
    window: int,
    order_by: Sequence[str],
    partition_by: Sequence[str] | None = None,
    model: dict | None = None,
    min_periods: int | None = None,
) -> DataFrame:
    """C2 — trailing row-count window (reference Column.py:561-611).

    min_periods defaults to the window size (reference semantics:
    first N-1 rows NULL, tests/test_roll.py:46-48).
    """
    k = get_kernel(kernel)
    if k.agg is None:
        raise ValueError(f"kernel '{kernel}' has no aggregate form")
    mp = window if min_periods is None else min_periods
    w = _window(partition_by, order_by).rowsBetween(-(window - 1), 0)
    value = k.agg([F.col(c) for c in inputs], over=w, **(model or {}))
    if mp > 1:
        have = F.count(F.lit(1)).over(w)
        value = F.when(have >= F.lit(mp), value)
    return df.withColumn(output, value)


def roll_range(
    df: DataFrame,
    output: str,
    kernel: str,
    inputs: Sequence[str],
    range_seconds: int,
    ts_col: str,
    partition_by: Sequence[str] | None = None,
    model: dict | None = None,
) -> DataFrame:
    """C2 time-range variant — trailing window over TIME, not rows:
    the aggregate covers every row with ts in (current - range,
    current], inclusive of the current instant. The reference only has
    row-count windows (Column.py:561-611); for a timeseries engine the
    range form is the one that survives irregular sampling — a
    10-minute gap doesn't silently widen the window's time span.

    Implemented as ``rangeBetween`` over epoch seconds — pure JVM,
    one sort per partition, no per-row Python.
    """
    k = get_kernel(kernel)
    if k.agg is None:
        raise ValueError(f"kernel '{kernel}' has no aggregate form")
    sec = F.unix_timestamp(F.col(ts_col))
    w = (
        Window.partitionBy(*(partition_by or []))
        .orderBy(sec)
        .rangeBetween(-(int(range_seconds) - 1), 0)
    )
    return df.withColumn(
        output, k.agg([F.col(c) for c in inputs], over=w, **(model or {}))
    )


def shift(
    df: DataFrame,
    output: str,
    input_col: str,
    periods: int,
    order_by: Sequence[str],
    partition_by: Sequence[str] | None = None,
) -> DataFrame:
    """C3 (window='all') shift — pandas Series.shift semantics
    (reference tests/test_calculate.py:54-89): positive periods pull
    values from earlier rows (lag), negative from later (lead)."""
    w = _window(partition_by, order_by)
    fn = F.lag(input_col, periods) if periods >= 0 else F.lead(input_col, -periods)
    return df.withColumn(output, fn.over(w))


def window_all(
    df: DataFrame,
    output: str,
    kernel: str,
    inputs: Sequence[str],
    partition_by: Sequence[str] | None = None,
    order_by: Sequence[str] | None = None,
    model: dict | None = None,
) -> DataFrame:
    """C3 — whole-table function (reference Column.py:498-522), here a
    whole-*group* aggregate broadcast back onto every row via an
    unbounded window (e.g. zscore scaling uses mean/std over all)."""
    k = get_kernel(kernel)
    if k.agg is None:
        raise ValueError(f"kernel '{kernel}' has no aggregate form")
    w = Window.partitionBy(*(partition_by or []))
    if order_by:
        w = w.orderBy(*order_by).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    return df.withColumn(
        output, k.agg([F.col(c) for c in inputs], over=w, **(model or {}))
    )


def link(
    df: DataFrame,
    output: str,
    keys: Sequence[str],
    linked_table: DataFrame,
    linked_keys: Sequence[str],
) -> DataFrame:
    """C4 — foreign-key resolution (reference Column.py:670-754).

    The reference stores the matched row's pandas index; distributed
    Spark has no row ids, so the link column is a STRUCT of the
    target's key values (NULL when unmatched — tests/test_link.py:116).
    Catalyst broadcasts the (typically small) dimension side.
    """
    probe = linked_table.select(
        *[F.col(k) for k in linked_keys],
        F.struct(*[F.col(k) for k in linked_keys]).alias(output),
    ).dropDuplicates(list(linked_keys))
    cond = [df[a] == probe[b] for a, b in zip(keys, linked_keys)]
    joined = df.join(probe, cond, "left")
    return joined.drop(*[probe[k] for k in linked_keys])


def compose(
    df: DataFrame,
    output: str,
    link_col: str,
    linked_table: DataFrame,
    linked_keys: Sequence[str],
    target_col: str,
) -> DataFrame:
    """C5 — dereference a link path Link::Col (reference
    Column.py:756-814): join back to the target on the link struct's
    key fields and project one target column."""
    dim = linked_table.select(
        F.struct(*[F.col(k) for k in linked_keys]).alias("__lk__"),
        F.col(target_col).alias(output),
    ).dropDuplicates(["__lk__"])
    return df.join(dim, df[link_col] == dim["__lk__"], "left").drop("__lk__")


def aggregate_column(
    group_df: DataFrame,
    output: str,
    fact_df: DataFrame,
    group_keys: Sequence[str],
    fact_keys: Sequence[str],
    kernel: str,
    measure: str | None,
    fillna_value=None,
    model: dict | None = None,
) -> DataFrame:
    """C6 — grouped aggregate attached to the group table (reference
    Column.py:613-668): aggregate facts per key, LEFT-join back onto
    the group table so empty groups survive, fillna for them
    (tests/test_aggregate.py:77-79)."""
    k = get_kernel(kernel)
    if k.agg is None:
        raise ValueError(f"kernel '{kernel}' has no aggregate form")
    cols = [F.col(measure)] if measure else []
    agg = (
        fact_df.groupBy(*[F.col(c) for c in fact_keys])
        .agg(k.agg(cols, **(model or {})).alias(output))
        .select(*[F.col(c).alias(f"__fk{i}__") for i, c in enumerate(fact_keys)], output)
    )
    cond = [group_df[g] == agg[f"__fk{i}__"] for i, g in enumerate(group_keys)]
    out = group_df.join(agg, cond, "left").drop(
        *[f"__fk{i}__" for i in range(len(fact_keys))]
    )
    if fillna_value is not None:
        out = out.withColumn(output, F.coalesce(F.col(output), F.lit(fillna_value)))
    return out
