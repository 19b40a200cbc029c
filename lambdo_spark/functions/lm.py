"""N-gram language-model quality scoring (CCNet-style), fully relational.

CCNet/RedPajama/Dolma bucket web documents by language-model
perplexity: a doc whose token stream is improbable under a reference
LM is likely boilerplate, gibberish, or OCR noise. The reference
pipelines use a KenLM binary; at Spark scale the same statistic is a
pair of count tables and one join — no external model artifact, no
per-row Python:

  TRAIN (one pass over the reference corpus):
    bigram counts  c12(w1, w2)   — groupBy, map-side combined
    context counts c1(w1)        — groupBy, map-side combined
    vocabulary     V             — countDistinct
  SCORE (one pass over the scored corpus):
    per doc:  logprob = Σ ln( (c12 + α) / (c1 + α·V) )   (add-α)
              ppl     = exp(-logprob / n_bigrams)

Every token stream is BOS-prefixed so the first real token is
conditioned too; docs shorter than 1 token score NULL. The score join
shuffles doc-bigram occurrences against the count table on the bigram
key — both sides hash-partition on that key, no broadcast needed even
for 10^10-bigram web vocabularies; cold (unseen) bigrams fall back to
the α mass via the left join's COALESCE.

Reference analog: lambdo would express this as a trained model object
fed to a per-row UDF (/root/reference/lambdo/Column.py:844-956); here
the "model" is two DataFrames and the "predict" is a join — the
relational re-expression is what makes it 100 TB-viable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["lm_counts", "lm_score"]

_BOS = "\x02"  # ASCII STX — cannot appear in whitespace-split tokens


def _doc_bigrams(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2) rows — one per bigram of the BOS-prefixed stream."""
    # regexp trim, NOT F.trim: trim() strips only spaces, so a doc
    # starting with a tab/newline would keep a leading '' token after
    # the whitespace split and be mis-guarded as empty below
    toks = F.split(
        F.regexp_replace(F.col(text_col), r"^\s+|\s+$", ""), r"\s+"
    )
    stream = F.when(
        (F.size(toks) > 0) & (F.element_at(toks, 1) != F.lit("")),
        F.concat(F.array(F.lit(_BOS)), toks),
    ).otherwise(F.array().cast("array<string>"))
    # codegen-friendly shape: posexplode the stream and read the
    # successor token with element_at on the carried array — a
    # transform(sequence, λ→struct) form ran INTERPRETED (higher-order
    # lambdas never enter whole-stage codegen; the same lesson as the
    # round-2 gap-fill rewrite, BENCH.md) and cost 34 s per evaluation
    # at 500k docs vs ~4 s for this Generate+projection
    return (
        docs.select(F.col(id_col), stream.alias("_s"))
        .select(
            F.col(id_col), F.col("_s"),
            F.posexplode(F.col("_s")).alias("_p", "w1"),
        )
        .where(F.col("_p") < F.size("_s") - 1)
        .select(
            id_col,
            "w1",
            F.element_at("_s", F.col("_p") + 2).alias("w2"),
        )
    )


def lm_counts(
    ref: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Train the add-α bigram LM: returns (bigrams, contexts, vocab)
    count DataFrames — ``(w1, w2, c12)``, ``(w1, c1)`` and a 1-row
    ``(v)``. All three are plain aggregates (map-side combined);
    persist them if scoring several corpora against one reference."""
    bg = _doc_bigrams(ref, id_col, text_col)
    bigrams = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    # contexts and vocabulary derive from the (far smaller) bigram
    # count table instead of re-scanning the corpus: c1(w1) = Σ_w2
    # c12(w1, w2), and every corpus token appears as some bigram's w2
    contexts = bigrams.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = bigrams.select(F.col("w2").alias("w")).distinct().agg(
        F.count(F.lit(1)).alias("v")
    )
    return bigrams, contexts, vocab


def lm_score(
    docs: DataFrame,
    ref: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
    counts: tuple[DataFrame, DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Score every doc under the add-α bigram LM trained on ``ref``
    (default: the scored corpus itself — self-perplexity, the CCNet
    in-domain shape) or on pre-built ``counts`` from :func:`lm_counts`.

    Returns one row per input doc:

    ``(id_col, n_bigrams, hits2, hits1, logprob, ppl)`` where
    ``n_bigrams`` is the BOS-prefixed bigram count, ``hits2``/``hits1``
    are the exact integer Σ c12 / Σ c1 over the doc's bigrams (the
    oracle-stable sufficient statistics), ``logprob`` the add-α log
    probability and ``ppl = exp(-logprob/n_bigrams)``. Empty docs get
    n_bigrams=0 and NULL scores.

    Plan shape: one shuffle of doc-bigram occurrences against the
    count tables on (w1, w2) / (w1) — both hash-partitioned joins, no
    broadcast requirement, so a 10^10-bigram web LM scores without any
    driver- or executor-resident model.
    """
    if counts is None:
        counts = lm_counts(ref if ref is not None else docs, id_col, text_col)
    bigrams, contexts, vocab = counts
    occ = _doc_bigrams(docs, id_col, text_col)
    scored = (
        occ.join(bigrams, ["w1", "w2"], "left")
        .join(contexts, ["w1"], "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            F.col(id_col),
            F.coalesce("c12", F.lit(0)).alias("c12"),
            F.coalesce("c1", F.lit(0)).alias("c1"),
            F.col("v"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("c12").alias("hits2"),
        F.sum("c1").alias("hits1"),
        F.sum(
            F.log((F.col("c12") + F.lit(alpha)) / (F.col("c1") + F.lit(alpha) * F.col("v")))
        ).alias("logprob"),
    )
    ids = docs.select(F.col(id_col))
    return ids.join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
        F.coalesce("hits2", F.lit(0)).cast("long").alias("hits2"),
        F.coalesce("hits1", F.lit(0)).cast("long").alias("hits1"),
        F.col("logprob").cast("double").alias("logprob"),
        F.when(
            F.col("n_bigrams") > 0,
            F.exp(-F.col("logprob") / F.col("n_bigrams")),
        ).alias("ppl"),
    )
