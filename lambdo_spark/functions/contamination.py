"""Benchmark decontamination — n-gram overlap against an eval set.

Before training, corpora are scanned for documents that contain
verbatim n-token spans of evaluation benchmarks (the GPT-3 13-gram /
PaLM 8-gram decontamination rule): any such doc inflates eval scores
and must be dropped or flagged.

Shape at scale: the benchmark side is tiny relative to the corpus
(millions of n-grams vs 10^12 docs), so the overlap test is a
broadcast semi-join of distinct benchmark n-grams onto the exploded
train n-grams — the corpus is touched ONCE, no shuffle of corpus
text. The join keys on the n-gram STRING, not a bare 64-bit hash: at
10^12-document scale unverified hash collisions would flag clean
documents as contaminated (silent corpus loss), and the broadcast
side is the small one, so exactness costs only benchmark bytes. When
even the string set is too big to broadcast, ``prefilter="hash64"``
broadcasts the 8-byte xxhash64 values instead and exact-verifies the
(tiny) candidate set against the strings in a second join — same
output, ~12× lighter broadcast.

Reference analog: lambdo's pairwise UDF comparisons
(/root/reference/lambdo/Column.py:524-559) are the closest shape; the
cross-table n-gram containment test is what eval hygiene demands at
web scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["ngram_set", "decontaminate", "contamination_pairs"]


def ngram_set(col: Column, n: int) -> Column:
    """Distinct n-token shingle strings (whitespace tokenization —
    the shared contract in functions/text.py); empty array for texts
    shorter than n tokens. NB Spark ``sequence(1, 0)`` is DESCENDING,
    so short inputs must short-circuit.

    NB the transform(sequence, λ) here runs INTERPRETED (higher-order
    lambdas never enter whole-stage codegen); the hot paths below use
    :func:`_exploded_ngrams` — a Generate + plain-projection form that
    stays in codegen — and keep this array form for per-doc-array
    consumers and the SQL-parity tests."""
    toks = F.split(F.trim(col), r"\s+")
    m = F.size(toks)
    return F.when(
        m >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), m - (n - 1)),
                lambda i: F.array_join(F.slice(toks, i, n), " "),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def _exploded_ngrams(df: DataFrame, text_col: str, n: int, keep) -> DataFrame:
    """(keep..., _ng) rows — one per n-gram OCCURRENCE (not per-doc
    distinct: every consumer below is a semi-join or COUNT DISTINCT,
    where occurrence duplicates are harmless). Codegen-friendly:
    explode the start positions, build the gram with slice/array_join
    in a plain projection — same rewrite as span dedup / lm bigrams."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    m = F.size("_tk")
    return (
        df.select(*keep, toks.alias("_tk"))
        .where(m >= n)
        .select(
            *keep, "_tk",
            F.explode(F.sequence(F.lit(1), m - (n - 1))).alias("_i"),
        )
        .select(
            *keep,
            F.array_join(F.slice("_tk", F.col("_i"), n), " ").alias("_ng"),
        )
    )


def decontaminate(
    train: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
    n: int = 8,
    min_hits: int = 1,
    broadcast_bench: bool = True,
    prefilter: str | None = None,
) -> DataFrame:
    """Flag training docs sharing ``min_hits``+ distinct n-grams with
    ANY benchmark text.

    Returns ``(id_col, n_hits, contaminated)`` for EVERY train doc:
    ``n_hits`` = distinct benchmark n-grams found in the doc,
    ``contaminated`` = int 0/1 of ``n_hits >= min_hits``. Filter
    ``contaminated = 0`` to keep the clean corpus, or keep the counts
    for an audit table.

    ``broadcast_bench=True`` (default) broadcasts the distinct
    benchmark n-gram set — right for real benchmarks (MBs); disable it
    if the "benchmark" side is itself corpus-sized.

    ``prefilter="hash64"`` broadcasts the distinct ``xxhash64`` values
    of the benchmark n-grams instead of the strings (8 B per gram —
    ~12× lighter than 13-gram text, the knob that keeps the broadcast
    under executor memory when the eval suite is huge), then
    EXACT-verifies the surviving candidates against the benchmark
    strings with a second join. The candidate set after the hash
    semi-join is real hits + ~n²/2^64 collisions, so the verify join
    is tiny and the output is byte-identical to the plain path (same
    oracle SQL).
    """
    bt = bench_text_col or text_col
    tr = _exploded_ngrams(train, text_col, n, [F.col(id_col)])
    be = _exploded_ngrams(bench, bt, n, []).distinct()
    if prefilter == "hash64":
        bh = be.select(F.xxhash64("_ng").alias("_ngh")).distinct()
        if broadcast_bench:
            bh = F.broadcast(bh)
        cand = tr.join(bh, F.xxhash64(tr["_ng"]) == bh["_ngh"], "left_semi")
        # exact re-verify: collisions (~n²/2^64) must not flag clean
        # docs — candidates are few, so this join is cheap either way
        matched = cand.join(
            F.broadcast(be) if broadcast_bench else be, "_ng", "left_semi"
        )
    elif prefilter is None:
        if broadcast_bench:
            be = F.broadcast(be)
        matched = tr.join(be, "_ng", "left_semi")
    else:
        raise ValueError(f"prefilter must be None or 'hash64', got {prefilter!r}")
    hits = matched.groupBy(id_col).agg(
        F.countDistinct("_ng").alias("n_hits")
    )
    ids = train.select(F.col(id_col))
    return ids.join(hits, id_col, "left").select(
        id_col,
        F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
        (F.coalesce("n_hits", F.lit(0)) >= min_hits).cast("int").alias(
            "contaminated"
        ),
    )


def contamination_pairs(
    train: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "bench_id",
    bench_text_col: str | None = None,
    n: int = 8,
    min_hits: int = 1,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Audit form of :func:`decontaminate`: WHICH benchmark doc did a
    train doc overlap, and by how many distinct n-grams.

    Returns ``(id_col, bench_id_col, n_shared)`` — one row per
    contaminated (train, bench) pair with ``n_shared >= min_hits``.
    Same broadcast shape as ``decontaminate``; the output is bounded
    by actual overlaps, not the cross product.
    """
    bt = bench_text_col or text_col
    tr = _exploded_ngrams(train, text_col, n, [F.col(id_col)])
    be = _exploded_ngrams(bench, bt, n, [F.col(bench_id_col)]).distinct()
    if broadcast_bench:
        be = F.broadcast(be)
    return (
        tr.join(be, "_ng")
        .groupBy(id_col, bench_id_col)
        .agg(F.countDistinct("_ng").alias("n_shared"))
        .where(F.col("n_shared") >= min_hits)
    )
