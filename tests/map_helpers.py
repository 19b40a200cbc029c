"""Named batch kernels for T3 map-table compiler tests (resolved via
the reference-style 'module:attr' ref, compiler.resolve_callable)."""

from collections.abc import Iterator

import pandas as pd


def double_b(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for b in batches:
        yield pd.DataFrame({"a": b["a"], "b2": b["b"] * 2})
