"""TF-IDF / BM25 retrieval: cross-checked against a from-scratch
pure-Python scorer (collections.Counter — independent of the Spark
expressions) and golden hand-computations."""

import math
import re
from collections import Counter

import pytest

from lambdo_spark.functions.ir import (
    bm25_scores,
    bm25_topk,
    term_frequencies,
    tfidf_scores,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick quick fox"),
    (3, "lazy dogs sleep all day, the dog dreams"),
    (4, "Foxes and DOGS! foxes, dogs... quick-quick"),
    (5, "completely unrelated words here banana apple"),
]


def _py_tokens(text):
    return re.findall(r"[a-z0-9]+", text.lower())


def _py_bm25(query, k1=1.2, b=0.75):
    toks = {d: _py_tokens(t) for d, t in DOCS}
    n = len([d for d in toks if toks[d]])
    avgdl = sum(len(v) for v in toks.values()) / n
    terms = sorted(set(query))
    df = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    out = {}
    for d, v in toks.items():
        c = Counter(v)
        s, m = 0.0, 0
        for t in terms:
            if c[t] == 0 or df[t] == 0:
                continue
            m += 1
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * c[t] * (k1 + 1) / (c[t] + k1 * (1 - b + b * len(v) / avgdl))
        if m:
            out[d] = (m, s)
    return out


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_term_frequencies_tokenization(docs):
    tf = {
        (r["doc_id"], r["term"]): r["tf"]
        for r in term_frequencies(docs).collect()
    }
    assert tf[(1, "the")] == 2
    assert tf[(4, "quick")] == 2  # "quick-quick" splits on the hyphen
    assert tf[(4, "foxes")] == 2  # case folded, punctuation stripped
    assert (4, "and") in tf


def test_bm25_matches_reference_python(docs):
    got = {
        r["doc_id"]: (r["n_terms"], r["bm25"])
        for r in bm25_scores(docs, ["quick", "dog"]).collect()
    }
    exp = _py_bm25(["quick", "dog"])
    assert set(got) == set(exp)
    for d in exp:
        assert got[d][0] == exp[d][0]
        assert got[d][1] == pytest.approx(exp[d][1], rel=1e-12)


def test_bm25_repeated_query_terms_collapse(docs):
    a = {r["doc_id"]: r["bm25"] for r in bm25_scores(docs, ["dog", "dog"]).collect()}
    b_ = {r["doc_id"]: r["bm25"] for r in bm25_scores(docs, ["dog"]).collect()}
    assert a == b_


def test_bm25_topk_stable_order(docs):
    top = bm25_topk(docs, ["quick", "fox"], k=3).collect()
    exp = _py_bm25(["quick", "fox"])
    ranked = sorted(exp.items(), key=lambda kv: (-kv[1][1], kv[0]))[:3]
    assert [r["doc_id"] for r in top] == [d for d, _ in ranked]


def test_tfidf_golden(docs):
    out = {
        (r["doc_id"], r["term"]): r
        for r in tfidf_scores(docs, ["quick", "banana"]).collect()
    }
    # df(quick)=3 (docs 1,2,4), df(banana)=1, N=5
    r = out[(2, "quick")]
    assert r["tf"] == 2 and r["df"] == 3
    assert r["tfidf"] == pytest.approx(2 * math.log(5 / 3), rel=1e-12)
    r = out[(5, "banana")]
    assert r["tf"] == 1 and r["df"] == 1
    assert r["tfidf"] == pytest.approx(math.log(5.0), rel=1e-12)
    # vocab terms absent from a doc produce no row
    assert (1, "banana") not in out


def test_bm25_plan_broadcasts_query_side(docs):
    plan = (
        bm25_scores(docs, ["quick"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # query terms / per-term df / corpus stats all broadcast; the only
    # non-broadcast join allowed is tf-to-dl on doc_id (corpus-sized
    # on BOTH sides, so a hash shuffle there is the right plan).
    assert "BroadcastHashJoin" in plan


def test_bm25_plan_single_explode_no_full_vocab_aggregate(docs):
    # the optimized shape: doc lengths come from size(tokens) with NO
    # explode, so the whole plan contains exactly one Generate (the
    # query-filtered token stream) — aggregating the full (doc, term)
    # vocabulary would show a second one
    plan = (
        bm25_scores(docs, ["quick"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Generate") == 1, plan
