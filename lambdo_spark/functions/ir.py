"""Sparse lexical retrieval over a document corpus: TF-IDF weighting
and BM25 ranking — the classic relevance stack a training-data
pipeline uses for corpus exploration, quality slicing, and targeted
decontamination lookups.

The reference has no retrieval surface at all (its column functions
are numeric rolling windows, /root/reference/lambdo/Column.py); this
is the §2.4 gap-fill for "find the documents about X in 10^12 docs".

Spark-first shape — every stage is a built-in expression or an
algebraic aggregate, no Python in the hot path:

* tokenize: ``regexp_extract_all(lower(text), '[a-z0-9]+')`` +
  explode — JVM regex, whole-stage codegen.
* document lengths NEVER explode: dl = ``size(tokens)`` per doc, and
  N / avgdl are one aggregate over the doc frame.
* term frequencies materialize ONLY for the query/vocab terms: the
  exploded token stream semi-joins the broadcast term list BEFORE the
  (doc, term) groupBy, so the one corpus-wide exchange carries the
  matching tokens, not the corpus vocabulary. (Measured at 500k
  docs/20M tokens: filtering pre-groupBy instead of aggregating the
  full (doc, term) table cut bm25 wall ~5×.) The unfiltered
  ``term_frequencies`` frame remains available for full-vocabulary
  work (it is what ``tools/bench_corpus_scale.py`` stresses).
* corpus stats (N, avgdl, per-term df): tiny frames; the scalar
  stats join back via ``crossJoin(broadcast(1 row))`` and the term
  list via ``broadcast`` hash join — nothing wide shuffles twice.
* scoring: closed-form column expressions. avgdl is derived from
  exact long sums (sum(dl)/N) so both engines compute the identical
  double — never engine-internal ``avg`` accumulation.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F

TOKEN_RE = "[a-z0-9]+"


def term_frequencies(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc, term, tf) — one tokenize + one map-side-combined groupBy."""
    toks = docs.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
        ).alias("term"),
    )
    return toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))


def doc_lengths(tf: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc, dl) token counts, re-aggregated from the tf frame — no
    second corpus scan."""
    return tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))


def _doc_lengths_direct(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(doc, dl) straight from size(tokens): no explode, no shuffle —
    docs with zero tokens are excluded (they carry no df/tf mass and
    keep N consistent with the tf-derived population)."""
    dl = F.size(
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
    ).cast("long")
    return docs.select(F.col(id_col), dl.alias("dl")).where(F.col("dl") > 0)


def _term_frequencies_for(
    docs: DataFrame, terms: Sequence[str], id_col: str, text_col: str
) -> DataFrame:
    """tf restricted to ``terms``: the broadcast term list filters the
    exploded token stream BEFORE the (doc, term) groupBy, so the
    corpus-wide exchange carries only matching tokens."""
    spark = docs.sparkSession
    tlist = spark.createDataFrame([(t,) for t in sorted(set(terms))], ["term"])
    toks = docs.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
        ).alias("term"),
    )
    return (
        toks.join(F.broadcast(tlist), "term")
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def tfidf_scores(
    docs: DataFrame,
    vocab: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per (doc, vocab term): tf, df, and tf·ln(N/df).

    N = documents with at least one token (the population the df
    counts are drawn from). The vocab frame broadcasts; df and N are
    computed over the tf frame, never the raw corpus.
    """
    tf_v = _term_frequencies_for(docs, vocab, id_col, text_col)
    # df via a window over the (small, already-filtered) tf frame — a
    # separate aggregate+join would duplicate the corpus tokenize
    # subtree in the physical plan (no common-subexpression reuse
    # across differently-shaped aggregates)
    df_t = F.count(F.lit(1)).over(Window.partitionBy("term"))
    n = _doc_lengths_direct(docs, id_col, text_col).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    scored = (
        tf_v.withColumn("df", df_t)
        .crossJoin(F.broadcast(n))
        .select(
            F.col(id_col),
            "term",
            "tf",
            "df",
            (
                F.col("tf").cast("double")
                * F.log(F.col("n_docs").cast("double") / F.col("df").cast("double"))
            ).alias("tfidf"),
        )
    )
    return scored


def bm25_scores(
    docs: DataFrame,
    query_terms: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 relevance of every matching document for a bag-of-terms
    query (Robertson/Sparck-Jones; the Lucene ``+1`` idf form, always
    positive)::

        idf(t)   = ln(1 + (N - df + 0.5) / (df + 0.5))
        score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl))

    Output: (doc, n_terms matched, score) for docs matching ≥1 query
    term. Repeated query terms count once (bag collapses to a set).
    avgdl = sum(dl)/N from exact long sums — engine-identical doubles.
    """
    terms = sorted(set(query_terms))
    dl = _doc_lengths_direct(docs, id_col, text_col)
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
    ).select(
        "n_docs",
        (F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")).alias(
            "avgdl"
        ),
    )
    tf_q = _term_frequencies_for(docs, terms, id_col, text_col)
    # df via a window over the filtered tf frame (see tfidf_scores:
    # an aggregate+join would duplicate the corpus tokenize subtree)
    parts = (
        tf_q.withColumn(
            "df", F.count(F.lit(1)).over(Window.partitionBy("term"))
        )
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
    )
    tfd = F.col("tf").cast("double")
    dld = F.col("dl").cast("double")
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    term_score = idf * (
        tfd * F.lit(k1 + 1.0)
        / (tfd + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dld / F.col("avgdl")))
    )
    return (
        parts.select(F.col(id_col), term_score.alias("_s"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("_s").alias("bm25"),
        )
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: Sequence[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k by BM25 (ties broken by doc id for a stable ranking).
    orderBy().limit(k) plans as TakeOrderedAndProject — distributed
    partial top-k, no global sort materialization."""
    scored = bm25_scores(docs, query_terms, id_col, text_col, k1, b)
    return scored.orderBy(F.desc("bm25"), F.col(id_col)).limit(k)
