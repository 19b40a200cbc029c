"""Byte-pair-encoding tokenizer (Sennrich et al. 2016,
arXiv:1508.07909): distributed merge-rule training + corpus encoding.

The reference's token surface is a whitespace/regex count
(/root/reference has no tokenizer at all); a training-data engine
needs the real thing: learn merge rules from the corpus, then encode
documents with them (token budgets, packing, dedup grain).

Spark-first shape — the classic algorithm splits cleanly into a
corpus-sized step and a vocab-sized loop:

* ONE corpus pass builds the word-frequency table (tokenize →
  map-side-combined groupBy) — after this, training never touches the
  corpus again: BPE statistics are exactly recoverable from
  (word, count), and |vocab| ≪ corpus at web scale (Heaps' law).
* each merge iteration runs on the vocab table only: adjacent symbol
  pairs via ``slice``+``arrays_zip`` (built-in JVM expressions, no
  HOF lambdas) → one map-side-combined groupBy(pair) weighted by word
  count → the argmax pair by (total desc, pair lexicographic) — a
  deterministic, engine-independent tie-break. Applying the merge is
  an Arrow-batched pandas kernel over the vocab rows. The frame is
  re-persisted per round and checkpointed every 8 merges so plan
  depth stays bounded (same discipline as
  ``cluster.connected_components``).
* encoding re-tokenizes documents and encodes each DISTINCT word once
  per Arrow batch with the standard merge-rank greedy loop, so the
  per-batch cost is O(distinct words), not O(tokens).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, functions as F

END = "</w>"
WORD_RE = "[a-z0-9]+"


def word_counts(
    docs: DataFrame, text_col: str = "text", word_re: str = WORD_RE
) -> DataFrame:
    """(word, count) over the corpus — the single corpus-wide pass."""
    return (
        docs.select(
            F.explode(
                F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(word_re), 0)
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def _merge_pair_kernel(a: str, b: str):
    merged = a + b

    @F.pandas_udf("array<string>")
    def _apply(syms: pd.Series) -> pd.Series:
        def one(seq):
            out, i, n = [], 0, len(seq)
            while i < n:
                if i + 1 < n and seq[i] == a and seq[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            return out

        return syms.map(one)

    return _apply


def train_bpe(
    docs: DataFrame,
    num_merges: int,
    text_col: str = "text",
    min_count: int = 1,
    checkpoint_every: int = 8,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` merge rules. Returns them in rank order.

    Stops early when no pair occurs twice (or at all). ``min_count``
    prunes hapax words from the statistics (standard practice; the
    default keeps everything).
    """
    wc = word_counts(docs, text_col)
    if min_count > 1:
        wc = wc.where(F.col("count") >= int(min_count))
    syms = wc.select(
        "count",
        F.concat(F.split("word", ""), F.array(F.lit(END))).alias("syms"),
    ).persist()
    syms.count()  # materialize before the loop
    merges: list[tuple[str, str]] = []
    try:
        for i in range(int(num_merges)):
            n = F.size("syms")
            pairs = (
                syms.where(n >= 2)
                .select(
                    "count",
                    F.explode(
                        F.arrays_zip(
                            F.slice("syms", 1, n - 1).alias("p0"),
                            F.slice("syms", F.lit(2), n - 1).alias("p1"),
                        )
                    ).alias("pr"),
                )
                .groupBy(
                    F.col("pr.p0").alias("p0"), F.col("pr.p1").alias("p1")
                )
                .agg(F.sum("count").alias("total"))
            )
            best = (
                pairs.orderBy(F.desc("total"), "p0", "p1").limit(1).collect()
            )
            if not best or int(best[0]["total"]) < 2:
                break
            a, b = best[0]["p0"], best[0]["p1"]
            merges.append((a, b))
            nxt = syms.withColumn(
                "syms", _merge_pair_kernel(a, b)(F.col("syms"))
            )
            if (i + 1) % int(checkpoint_every) == 0:
                nxt = nxt.localCheckpoint(eager=True)
            else:
                nxt = nxt.persist()
                nxt.count()
            syms.unpersist()
            syms = nxt
    finally:
        syms.unpersist()
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Standard greedy BPE: repeatedly merge the lowest-rank adjacent
    pair until none of the present pairs has a rule."""
    seq = list(word) + [END]
    while len(seq) >= 2:
        cand = [
            (ranks[(seq[i], seq[i + 1])], i)
            for i in range(len(seq) - 1)
            if (seq[i], seq[i + 1]) in ranks
        ]
        if not cand:
            break
        rank = min(r for r, _ in cand)
        out, i, n = [], 0, len(seq)
        while i < n:
            if (
                i + 1 < n
                and ranks.get((seq[i], seq[i + 1])) == rank
            ):
                out.append(seq[i] + seq[i + 1])
                i += 2
            else:
                out.append(seq[i])
                i += 1
        seq = out
    return seq


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    output: str = "bpe_tokens",
    word_re: str = WORD_RE,
) -> DataFrame:
    """(id, tokens array, n_tokens) — Arrow-batched; each DISTINCT
    word in a batch is encoded once (memoized), so hot words cost
    O(1) per occurrence. Per-document work only: no shuffle."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    import re as _re

    rx = _re.compile(word_re)

    @F.pandas_udf("array<string>")
    def _enc(texts: pd.Series) -> pd.Series:
        memo: dict[str, list[str]] = {}

        def one(t):
            if t is None:
                return []
            out = []
            for w in rx.findall(t.lower()):
                enc = memo.get(w)
                if enc is None:
                    enc = _encode_word(w, ranks)
                    memo[w] = enc
                out.extend(enc)
            return out

        return texts.map(one)

    return docs.select(
        F.col(id_col),
        _enc(F.col(text_col)).alias(output),
    ).withColumn("n_tokens", F.size(output).cast("long"))


def bpe_vocab(merges: list[tuple[str, str]]) -> list[str]:
    """The subword units the rules can produce (merged symbols, in
    rank order). Base characters are implicit."""
    return [a + b for a, b in merges]
