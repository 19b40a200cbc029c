"""Named batch kernels for T3 map-table compiler tests (resolved via
the reference-style 'module:attr' ref, compiler.resolve_callable)."""

from collections.abc import Iterator

import pandas as pd


def double_b(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for b in batches:
        yield pd.DataFrame({"a": b["a"], "b2": b["b"] * 2})


def make_frame(n: int = 5) -> pd.DataFrame:
    """0-input function-table source (reference Table.py:499)."""
    return pd.DataFrame({"k": range(n), "v": [float(i) * 2 for i in range(n)]})
