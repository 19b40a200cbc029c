"""User fit function for the C10 module:attr escape-hatch test."""


def fit_mean_model(pdf, inputs, label):
    """Trivial 'estimator': predict the label mean (a dict model the
    linear_predict kernel can apply: zero weights + mean intercept)."""
    return {
        "kind": "linear",
        "inputs": list(inputs),
        "weights": [0.0] * len(inputs),
        "intercept": float(pdf[label].mean()),
        "n": int(len(pdf)),
    }
