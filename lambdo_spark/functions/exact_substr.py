"""Exact-substring span dedup — remove repeated spans, keep the docs.

Whole-document dedup (exact/MinHash) misses the dominant duplication
mode in web text: long verbatim SPANS (quotes, licenses, syndicated
paragraphs) embedded in otherwise-unique documents. Lee et al. 2022
("Deduplicating Training Data Makes Language Models Better") remove
every span of >= L tokens that occurs more than once in the corpus;
this is that operator in fixed-window form: a token is dropped iff it
is covered by some L-token window whose exact text appears
``min_count``+ times corpus-wide, and the doc's remaining tokens are
kept in order.

Execution shape (all relational, no suffix arrays needed for the
fixed-L form):

1. window strings with start positions per doc (posexplode — rows ≈
   corpus tokens),
2. one map-side-combined groupBy counting each window corpus-wide;
   duplicated windows survive a ``count >= min_count`` filter (that
   set is tiny relative to the corpus — duplication is the
   exception),
3. join occurrences against the duplicated set — keyed (default) on
   the 128-BIT ``unhex(md5(window))`` of the window text, computed
   map-side so the count exchange ships one fixed 16-byte key per
   window instead of ~L tokens of text. At 10^12 tokens the string
   form shuffles ~L× the corpus bytes (web grams are mostly unique,
   so map-side combine barely reduces it); the md5 form shuffles
   16 B/row regardless of L. Collision risk at 128 bits is ~n²/2^129
   — ~10⁻¹⁵ even at 10^12 distinct windows — unlike a 64-bit key,
   which WOULD delete clean text at that scale. ``key="text"`` keeps
   the exact-string form for verify/oracle runs,
4. covered token positions via an interval explode + distinct,
5. anti-join tokens against covered positions, groupBy-doc ordered
   reassembly (state per doc = the doc's own tokens).

Output text is whitespace-NORMALIZED (tokens rejoined with single
spaces) — the token stream, not the raw bytes, is what training
consumes. Docs shorter than L tokens pass through (normalized);
fully-duplicated docs come back as ``''``.

Reference analog: lambdo's row-at-a-time UDFs could score a span but
not see across documents (/root/reference/lambdo/Column.py:524-559);
cross-doc span removal is inherently a corpus-wide relational job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["remove_duplicate_spans"]


def remove_duplicate_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_tokens: int = 8,
    min_count: int = 2,
    key: str = "hash128",
    cache_grams: bool = True,
) -> DataFrame:
    """Drop every token covered by an ``span_tokens``-token window
    whose exact text occurs ``min_count``+ times in the corpus.

    Returns ``(id_col, text_col)`` for EVERY input doc (tokens
    rejoined with single spaces; ``''`` when everything was
    duplicated). ``min_count=2`` is the Lee-et-al rule; raise it to
    tolerate limited repetition (e.g. popular quotes).

    ``key`` picks the shuffle key for the corpus-wide window count:
    ``"hash128"`` (default) ships ``unhex(md5(window))`` — 16 bytes
    per window through the exchange, safe at any corpus size;
    ``"text"`` ships the window string itself (exact, L× heavier —
    the verify mode). Output is identical between the two barring a
    ~2^-128 md5 collision.

    ``cache_grams=True`` (default) persists the gram rows — they feed
    TWO consumers (the corpus-wide count and the duplicated-window
    occurrence join), and without the cache each consumer re-runs the
    full tokenize+hash scan of the corpus (at 100 TB that is a second
    full source read; measured 1.7× end-to-end at the 500k-doc scale
    bench). Cached rows are fixed-width (id + start + 16-byte key,
    MEMORY_AND_DISK — spills locally rather than re-scanning the
    source). Lifecycle follows the minhash-signature convention: the
    cache stays registered until the session ends or
    ``spark.catalog.clearCache()``; pass ``cache_grams=False`` for
    one-shot memory-constrained runs.
    """
    if key not in ("hash128", "text"):
        raise ValueError(f"key must be 'hash128' or 'text', got {key!r}")
    L = int(span_tokens)
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    d = docs.select(F.col(id_col), toks.alias("_tk"))
    n = F.size("_tk")
    # L-token windows with 0-based start positions; in hash128 mode
    # the md5 is computed INSIDE this map-side projection, so the
    # window text never reaches the count exchange. The window is
    # built by exploding the start positions and slicing in a plain
    # projection — building the window array inside a
    # transform(sequence, λ) lambda ran INTERPRETED (higher-order
    # lambdas never enter whole-stage codegen; same lesson as the
    # gap-fill rewrite, BENCH.md) and cost ~2.7× at the 500k-doc
    # scale bench, worse still with md5 inside the lambda.
    win = F.array_join(F.slice("_tk", F.col("_start") + 1, L), " ")
    gram_key = F.unhex(F.md5(win)) if key == "hash128" else win
    grams = (
        d.where(n >= L)
        .select(
            F.col(id_col),
            "_tk",
            F.explode(F.sequence(F.lit(0), n - L)).alias("_start"),
        )
        .select(F.col(id_col), "_start", gram_key.alias("_ng"))
    )
    if cache_grams:
        grams = grams.persist()
    dup = (
        grams.groupBy("_ng")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .where(F.col("_cnt") >= min_count)
        .select("_ng")
    )
    covered = (
        grams.join(dup, "_ng")
        .select(
            F.col(id_col),
            F.explode(
                F.sequence(F.col("_start"), F.col("_start") + (L - 1))
            ).alias("_pos"),
        )
        .distinct()
    )
    tokens = d.select(
        F.col(id_col), F.posexplode("_tk").alias("_pos", "_tok")
    )
    kept = tokens.join(covered, [id_col, "_pos"], "left_anti")
    clean = kept.groupBy(id_col).agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_tok"))),
                lambda s: s["_tok"],
            ),
        ).alias(text_col)
    )
    ids = docs.select(F.col(id_col))
    return ids.join(clean, id_col, "left").select(
        id_col, F.coalesce(text_col, F.lit("")).alias(text_col)
    )
