"""Text-analysis kernels for training-data pipelines over `documents`.

All the *scoring* kernels compile to built-in JVM expressions (they
stay inside whole-stage codegen and are exactly replicable in the
DuckDB oracle); only the fingerprint (64-bit polynomial rolling hash)
is a pandas/Arrow kernel, pinned by a pure-Python reference in tests.

Tokenization contract (shared with every dedup/similarity kernel and
with the SQL oracles — keep in sync or hashes drift):
    tokens(text) = split(trim(text), r"\\s+")
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

# per-language stopword markers for the n-gram-free heuristic lang-ID;
# deliberately tiny + deterministic so the SQL oracle can mirror it
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "que", "los", "de"],
}
STOPWORDS = sorted({w for ws in LANG_MARKERS.values() for w in ws})


def tokens(col: Column) -> Column:
    return F.split(F.trim(col), r"\s+")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def punct_ratio(col: Column) -> Column:
    """punctuation chars / total chars (0 for empty)."""
    n = F.length(col)
    p = F.length(F.regexp_replace(col, r"[^.!?,;:]", ""))
    return F.when(n > 0, p.cast("double") / n).otherwise(F.lit(0.0))


def stopword_ratio(col: Column) -> Column:
    toks = tokens(col)
    hits = F.size(F.filter(toks, lambda t: F.lower(t).isin(STOPWORDS)))
    return F.when(F.size(toks) > 0, hits.cast("double") / F.size(toks)).otherwise(
        F.lit(0.0)
    )


def quality_score(col: Column) -> Column:
    """Composite quality in [0,1]: length score x (1 - punct excess)
    x stopword presence — the standard cheap pre-filter shape."""
    length_score = F.least(F.length(col).cast("double") / F.lit(500.0), F.lit(1.0))
    punct_penalty = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(col) * 5)
    sw = F.least(stopword_ratio(col) * 5, F.lit(1.0))
    return F.round(length_score * punct_penalty * (F.lit(0.5) + sw / 2), 6)


def lang_id(col: Column) -> Column:
    """Marker-word lang-ID: argmax of per-language marker hits, ties
    broken by language order (en,de,fr,es); 'und' (undetermined) when
    no marker hits at all."""
    toks = tokens(col)

    def marker_hits(ws):
        # NB: F.filter dispatches on lambda arity (2 params = element,
        # index) — close over ws instead of a default arg
        return F.size(F.filter(toks, lambda t: F.lower(t).isin(ws)))

    scores = [marker_hits(ws).alias(lang) for lang, ws in LANG_MARKERS.items()]
    best = F.greatest(*scores)
    out = F.lit("und")
    # reversed so earlier languages win ties via later when() override
    for lang, score in reversed(list(zip(LANG_MARKERS, scores))):
        out = F.when((score == best) & (best > 0), F.lit(lang)).otherwise(out)
    return out


# ------------------------------------------------------- fingerprinting

_FP_BASE = np.uint64(1099511628211)
_FP_OFFSET = np.uint64(14695981039346656037)


def fingerprint_py(text: str) -> int:
    """Pure-Python reference: FNV-1a over utf-8 bytes (stable 64-bit)."""
    h = int(_FP_OFFSET)
    for b in text.encode("utf-8"):
        h = ((h ^ b) * int(_FP_BASE)) & 0xFFFFFFFFFFFFFFFF
    return h - (1 << 64) if h >= (1 << 63) else h


def fingerprint_udf():
    """Vectorized-batch FNV-1a document fingerprint (Arrow transfer;
    per-doc byte loop in numpy). Factory — pandas_udf schema parsing
    needs an active session, so don't decorate at import time."""

    @pandas_udf("long")
    def _udf(texts: pd.Series) -> pd.Series:
        out = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            h = _FP_OFFSET
            if t:
                data = np.frombuffer(t.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
                with np.errstate(over="ignore"):
                    for b in data:
                        h = np.uint64((h ^ b) * _FP_BASE)
            out[i] = np.int64(h)
        return pd.Series(out)

    return _udf


def analyze_documents(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass text analysis: token count, punct/stopword ratios,
    quality, heuristic lang, fingerprint."""
    c = F.col(text_col)
    return docs.select(
        "*",
        token_count(c).alias("n_tokens"),
        F.round(punct_ratio(c), 6).alias("punct_ratio"),
        F.round(stopword_ratio(c), 6).alias("stopword_ratio"),
        quality_score(c).alias("quality"),
        lang_id(c).alias("lang_guess"),
        fingerprint_udf()(c).alias("fingerprint"),
    )
