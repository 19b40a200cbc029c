"""End-to-end parity on the reference's OWN shipped example workflows.

The strongest form of "a user of the reference could switch": take the
exact JSON files lambdo ships in examples/ (example1–5 — the ones
whose functions need only pandas/numpy; 6–9 import sklearn, absent
here), run each through BOTH engines — the reference itself
(pure-pandas, imported read-only from /root/reference) and this
engine's compiler in ``reference_compat`` mode — and assert the sink
CSVs are value-identical.

Only I/O locations are patched (absolute source path; per-engine tmp
sink — nothing may write into /root/reference). Everything else runs
as shipped: ``pandas:read_csv`` function-table sources,
``imports: ["examples.example3"]`` user modules,
``pandas.core.tools.datetimes:to_datetime`` window-all columns,
``examples.example3:diff_fn`` row functions,
``pandas.core.series:Series.shift`` with model kwargs,
``numpy.core.fromnumeric:mean`` roll extensions, column_filter
exclude, row_filter dropna, function-less extend tables, and
``pandas:DataFrame.to_csv`` sinks.

Known serialization difference (normalized before comparing): Spark's
CSV writer emits timestamps as ISO-8601 instants, pandas as bare
dates — same values, different text.
"""

import glob
import json
import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, "/root/reference")
pytest.importorskip("lambdo.Workflow")
from lambdo.Workflow import Workflow as RefWorkflow  # noqa: E402

from lambdo_spark.plans.compiler import Workflow  # noqa: E402

REF_EXAMPLES = "/root/reference/examples"


def _load_patched(n: int, sink: str) -> dict:
    with open(os.path.join(REF_EXAMPLES, f"example{n}.json")) as f:
        spec = json.load(f)
    spec["tables"][0]["model"]["filepath_or_buffer"] = os.path.join(
        REF_EXAMPLES, "^GSPC.csv"
    )
    spec["tables"][-1]["model"]["path_or_buf"] = sink
    return spec


def _canon(df: pd.DataFrame, cols: list[str]) -> pd.DataFrame:
    df = df[cols].copy()
    if "Date" in cols:
        df["Date"] = pd.to_datetime(df["Date"], utc=True).dt.tz_localize(None)
        df = df.sort_values("Date")
    else:
        df = df.sort_values(cols[0])
    return df.reset_index(drop=True)


@pytest.mark.parametrize("n", [1, 2, 3, 4, 5])
def test_reference_example_runs_identically(spark, tmp_path, n):
    ref_sink = str(tmp_path / f"ref_ex{n}.csv")
    RefWorkflow(_load_patched(n, ref_sink)).execute()
    ref = pd.read_csv(ref_sink)

    our_sink = str(tmp_path / f"our_ex{n}.csv")
    Workflow(_load_patched(n, our_sink), spark, reference_compat=True).execute()
    parts = sorted(glob.glob(os.path.join(our_sink, "part-*")))
    assert parts, f"no sink output under {our_sink}"
    ours = pd.concat([pd.read_csv(p) for p in parts], ignore_index=True)

    cols = ref.columns.tolist()
    assert ours.columns.tolist() == cols
    pd.testing.assert_frame_equal(
        _canon(ours, cols), _canon(ref, cols), check_exact=False, rtol=1e-12
    )


def test_sklearn_examples_are_out_of_scope():
    """examples 6-9 import sklearn (example9.py does so at module
    top); absent sklearn neither engine can run them — documented,
    not silently skipped."""
    try:
        import sklearn  # noqa: F401
    except ImportError:
        return  # expected here: 6-9 unrunnable in either engine
    pytest.skip(
        "sklearn IS available in this environment — extend the "
        "parametrize above to examples 6-8 for full parity"
    )
