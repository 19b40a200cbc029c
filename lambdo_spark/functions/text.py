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


def token_count_bpe(col: Column) -> Column:
    """BPE-ish subword-boundary token count: runs of word chars plus
    each punctuation mark as its own token (`\\w+|[^\\w\\s]`) — the
    pre-tokenization most BPE vocabularies apply before merges, so it
    tracks real tokenizer counts far better than whitespace splitting
    on punctuated text. Pure JVM regex — whole-stage codegen."""
    return F.size(F.regexp_extract_all(col, F.lit(r"\w+|[^\w\s]"), F.lit(0)))


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


# --------------------------------------- Gopher/C4-style quality rules
# Rahm et al. "Scaling Language Models" (Gopher, 2021) §A1.1 and the C4
# pipeline popularized cheap repetition/shape heuristics for web-text
# filtering. All pure JVM array/regexp expressions — no Python in the
# hot path, exactly replicable in the DuckDB oracle.


def repetition_ratio(col: Column) -> Column:
    """(tokens − distinct tokens) / tokens — word-level repetition.
    1.0-ish for boilerplate floods, 0 for all-unique text."""
    toks = tokens(col)
    n, d = F.size(toks), F.size(F.array_distinct(toks))
    return F.when(n > 0, (n - d).cast("double") / n).otherwise(F.lit(0.0))


def bigram_array(col: Column) -> Column:
    """Adjacent word pairs. NB Spark ``sequence(0, -1)`` is DESCENDING
    (not empty) — short inputs must be guarded."""
    toks = tokens(col)
    n = F.size(toks)
    return F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.concat_ws(" ", F.get(toks, i), F.get(toks, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def dup_bigram_fraction(col: Column) -> Column:
    """(bigrams − distinct bigrams) / bigrams — catches repeated
    phrases that unigram repetition misses (Gopher's dup-n-gram
    family at n=2)."""
    bg = bigram_array(col)
    m = F.size(bg)
    return F.when(
        m > 0, (m - F.size(F.array_distinct(bg))).cast("double") / m
    ).otherwise(F.lit(0.0))


def mean_word_length(col: Column) -> Column:
    toks = tokens(col)
    n = F.size(toks)
    s = F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t))
    return F.when(n > 0, s.cast("double") / n).otherwise(F.lit(0.0))


def symbol_word_ratio(col: Column) -> Column:
    """('#' + ellipsis occurrences) / words — Gopher's symbol ratio."""
    n = token_count(col)
    hashes = F.length(col) - F.length(F.regexp_replace(col, r"#", ""))
    ell = F.size(F.regexp_extract_all(col, F.lit(r"\.\.\.|…"), F.lit(0)))
    return F.when(n > 0, (hashes + ell).cast("double") / n).otherwise(F.lit(0.0))


def gopher_filter(
    col: Column,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_repetition: float = 0.3,
    min_distinct_stopwords: int = 2,
) -> Column:
    """Composite keep/drop boolean over the Gopher §A1.1 rules. All
    sub-metrics are deterministic integer-count divisions, so the
    boolean is engine-portable bit-for-bit."""
    toks = tokens(col)
    n = F.size(toks)
    sw_distinct = F.size(
        F.array_distinct(F.filter(toks, lambda t: F.lower(t).isin(STOPWORDS)))
    )
    mwl = mean_word_length(col)
    return (
        (n >= F.lit(min_words))
        & (n <= F.lit(max_words))
        & (mwl >= F.lit(min_mean_word_len))
        & (mwl <= F.lit(max_mean_word_len))
        & (symbol_word_ratio(col) <= F.lit(max_symbol_ratio))
        & (repetition_ratio(col) <= F.lit(max_repetition))
        & (sw_distinct >= F.lit(min_distinct_stopwords))
    )


# ------------------------------------------------------- fingerprinting

_FP_BASE = np.uint64(1099511628211)
_FP_OFFSET = np.uint64(14695981039346656037)


def fingerprint_py(text: str) -> int:
    """Pure-Python reference: FNV-1a over utf-8 bytes (stable 64-bit)."""
    h = int(_FP_OFFSET)
    for b in text.encode("utf-8"):
        h = ((h ^ b) * int(_FP_BASE)) & 0xFFFFFFFFFFFFFFFF
    return h - (1 << 64) if h >= (1 << 63) else h


def fingerprint_expr(col: Column) -> Column:
    """Default JVM-side fingerprint: xxhash64 — whole-stage codegen,
    zero Python. Use this unless FNV-1a bit-compat with an existing
    corpus is required (then ``fingerprint_udf``)."""
    return F.xxhash64(col)


def _fnv1a_batch(encoded: list[bytes], h: np.ndarray) -> None:
    """FNV-1a, vectorized ACROSS documents: the recurrence
    h = (h ^ byte) * base is sequential per doc, so iterate over byte
    POSITIONS with whole-column numpy ops instead of per-byte Python.
    Docs arrive sorted by length descending, so the live set at each
    position is a prefix — a slice, not a mask."""
    n = len(encoded)
    lens = np.fromiter((len(b) for b in encoded), dtype=np.int64, count=n)
    maxlen = int(lens[0]) if n else 0
    if maxlen == 0:
        return
    mat = np.zeros((n, maxlen), dtype=np.uint8)
    for i, b in enumerate(encoded):
        if b:
            mat[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
    # alive[j] = #docs with len > j (prefix length at byte position j)
    alive = n - np.cumsum(np.bincount(lens, minlength=maxlen + 1))
    with np.errstate(over="ignore"):
        for j in range(maxlen):
            k = int(alive[j])
            if k == 0:
                break
            h[:k] = (h[:k] ^ mat[:k, j].astype(np.uint64)) * _FP_BASE


def fingerprint_udf():
    """Arrow-batch FNV-1a document fingerprint. Factory — pandas_udf
    schema parsing needs an active session, so don't decorate at
    import time.

    Throughput: ~n_docs bytes processed per numpy op (cross-doc
    vectorization) vs one byte per Python op in the naive form —
    measured ~40-100× on 1-4 KB docs. Memory-bounded: the byte matrix
    is built in ≤32 MB slabs."""

    @pandas_udf("long")
    def _udf(texts: pd.Series) -> pd.Series:
        n = len(texts)
        encoded = [
            t.encode("utf-8") if isinstance(t, str) and t else b"" for t in texts
        ]
        order = np.argsort([-len(b) for b in encoded], kind="stable")
        h_sorted = np.full(n, _FP_OFFSET, dtype=np.uint64)
        # slab the (docs × maxlen) matrix to ~32 MB so huge documents
        # cannot blow executor memory
        start = 0
        while start < n:
            maxlen = len(encoded[order[start]])
            if maxlen == 0:
                break
            rows = max(1, min(n - start, (32 << 20) // maxlen))
            idx = order[start : start + rows]
            hs = h_sorted[start : start + rows]
            _fnv1a_batch([encoded[i] for i in idx], hs)
            start += rows
        out = np.empty(n, dtype=np.uint64)
        out[order] = h_sorted
        return pd.Series(out.view(np.int64))

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


# --------------------------------------------------------- PII scrub
#
# Web corpora leak emails / phone numbers / IPs; scrubbing them before
# training is a standard pipeline stage (CCNet/C4-style). Pure JVM
# regexp_replace chains — whole-stage codegen, and the SAME patterns
# run in the DuckDB oracle (no backrefs/lookaround, so Java regex and
# RE2 agree). Patterns are deliberately conservative (precision over
# recall): a false positive deletes signal from every surviving doc.

PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# phone: requires an explicit +CC prefix or a (xxx) area code — digit
# groups with separators alone would swallow ISO dates ("2024-01-01")
# and version strings, and a false positive deletes real signal
PII_PHONE = (
    r"\+[0-9]{1,3}[ .-][0-9]{2,4}[ .-][0-9]{2,4}[ .-][0-9]{2,4}"
    r"|\([0-9]{3}\)[ .-]?[0-9]{3}[ .-][0-9]{4}"
)
PII_IPV4 = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def scrub_pii(
    col: Column,
    email: str = "<EMAIL>",
    phone: str = "<PHONE>",
    ip: str = "<IP>",
) -> Column:
    """Replace emails, phone numbers and IPv4 addresses with typed
    placeholder tokens (pass an empty string to delete instead).
    Order matters: emails first (an email's host could otherwise be
    clipped by the IP rule), then IPs, then phones."""
    out = F.regexp_replace(col, PII_EMAIL, email)
    out = F.regexp_replace(out, PII_IPV4, ip)
    out = F.regexp_replace(out, PII_PHONE, phone)
    return out


def pii_counts(col: Column) -> Column:
    """Struct of per-kind PII match counts (audit/reporting — decide
    drop-vs-scrub thresholds before rewriting the corpus)."""
    return F.struct(
        F.size(F.regexp_extract_all(col, F.lit(PII_EMAIL), F.lit(0))).alias("emails"),
        F.size(F.regexp_extract_all(col, F.lit(PII_IPV4), F.lit(0))).alias("ips"),
        F.size(F.regexp_extract_all(col, F.lit(PII_PHONE), F.lit(0))).alias("phones"),
    )


# ------------------------------------------- boilerplate line removal

def remove_boilerplate_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_cols: tuple[str, ...] = ("source",),
    min_docs: int = 5,
    sep: str = "\n",
) -> DataFrame:
    """Strip lines that repeat across ``min_docs``+ distinct documents
    of the same group (site nav, cookie banners, footers — the
    CCNet/Dolma line-level dedup rule; grouping by domain keeps a
    line that is boilerplate on one site but content on another).

    Returns ``(id_col, text_col)`` for EVERY input doc — a doc whose
    lines were all boilerplate comes back as ``''``. A NULL group
    value is its own group (null-safe anti-join), so docs with a
    missing group column dedup against each other rather than being
    silently dropped.

    Scale shape: one posexplode (rows ≈ corpus lines), then the
    count-distinct groupBy keyed on the 128-BIT ``unhex(md5(line))``
    — 16 bytes per line through the count exchange instead of the
    line text (collision odds ~n²/2^129, negligible at 10^12 lines,
    unlike a 64-bit key whose birthday bound there is ~10^4 silent
    deletions). Lines surviving ``>= min_docs`` form the BOILERPLATE
    set — small (boilerplate is the exception), so the removal is a
    broadcast-able LEFT ANTI join against it; the full corpus-lines
    frame is never shuffled for the join (the old shape inner-joined
    every line against every count). Reassembly groupBy state per doc
    is the doc's own kept lines (bounded by document size).
    """
    gcols = list(group_cols)
    lines = docs.select(
        F.col(id_col),
        *[F.col(g) for g in gcols],
        F.posexplode(F.split(F.col(text_col), sep)).alias("_ix", "_line"),
    ).withColumn("_lk", F.unhex(F.md5("_line")))
    bp = (
        lines.select(*gcols, "_lk", id_col)
        .groupBy(*gcols, "_lk")
        .agg(F.countDistinct(id_col).alias("_ndocs"))
        .where(F.col("_ndocs") >= min_docs)
        .select(*[F.col(g).alias(f"_bg_{g}") for g in gcols],
                F.col("_lk").alias("_bk"))
    )
    cond = lines["_lk"] == bp["_bk"]
    for g in gcols:
        cond = cond & lines[g].eqNullSafe(bp[f"_bg_{g}"])
    kept = lines.join(bp, cond, "left_anti")
    assembled = kept.groupBy(id_col).agg(
        F.concat_ws(
            sep,
            F.transform(
                F.array_sort(F.collect_list(F.struct("_ix", "_line"))),
                lambda s: s["_line"],
            ),
        ).alias(text_col)
    )
    ids = docs.select(F.col(id_col))
    return ids.join(assembled, id_col, "left").select(
        id_col, F.coalesce(text_col, F.lit("")).alias(text_col)
    )
