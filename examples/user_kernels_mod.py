"""User kernels for examples/user_kernels.json — vectorized callables
referenced from the workflow as ``user_kernels_mod:<name>`` (reference
resolve.py:14-49 semantics; loaded via the workflow's ``imports`` and
shipped to executors with addPyFile)."""


def log1p_len(s):
    """Scalar kernel (calculate): pd.Series in -> pd.Series out."""
    import numpy as np

    return np.log1p(s)


def iqr(s):
    """Aggregate kernel (roll/all): pd.Series in -> scalar out —
    inter-quartile range, a holistic statistic no JVM expression has."""
    return s.quantile(0.75) - s.quantile(0.25)
