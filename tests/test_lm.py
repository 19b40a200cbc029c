"""Bigram-LM quality scoring: parity with a pure-Python reference."""

import math

import pytest
from pyspark.sql import functions as F

from lambdo_spark.functions.lm import lm_counts, lm_score, _BOS


ROWS = [
    (1, "the cat sat on the mat"),
    (2, "the cat sat on the mat"),          # exact dup → most probable
    (3, "the dog ran over the hill"),
    (4, "zx qv jj zx qv"),                  # gibberish → high ppl
    (5, "the"),                             # single token: 1 bigram (BOS,the)
    (6, ""),                                # empty: n_bigrams 0, NULL ppl
    (7, "   "),                             # whitespace-only == empty
    (8, "\tthe cat sat"),                   # leading tab must still score
    (9, "\n\nthe dog ran\t"),               # leading newlines, trailing tab
    (10, "\t \n"),                          # mixed whitespace-only == empty
]


def _py_reference(rows, alpha=0.5):
    """Sequential add-α bigram LM over the same corpus."""
    streams = {}
    for i, t in rows:
        tk = [w for w in t.strip(" ").split() if True] if t.strip(" ") else []
        streams[i] = ([_BOS] + tk) if tk else []
    c12, c1, vocab = {}, {}, set()
    for st in streams.values():
        for a, b in zip(st, st[1:]):
            c12[(a, b)] = c12.get((a, b), 0) + 1
            c1[a] = c1.get(a, 0) + 1
            vocab.add(b)
    v = len(vocab)
    out = {}
    for i, st in streams.items():
        bgs = list(zip(st, st[1:]))
        if not bgs:
            out[i] = (0, 0, 0, None, None)
            continue
        lp = sum(
            math.log((c12[(a, b)] + alpha) / (c1[a] + alpha * v))
            for a, b in bgs
        )
        out[i] = (
            len(bgs),
            sum(c12[(a, b)] for a, b in bgs),
            sum(c1[a] for a, b in bgs),
            lp,
            math.exp(-lp / len(bgs)),
        )
    return out


def test_lm_score_matches_python_reference(spark):
    docs = spark.createDataFrame(ROWS, "doc_id long, text string")
    got = {r["doc_id"]: r for r in lm_score(docs).collect()}
    want = _py_reference(ROWS)
    assert set(got) == set(want)
    for i, (nb, h2, h1, lp, ppl) in want.items():
        r = got[i]
        assert r["n_bigrams"] == nb and r["hits2"] == h2 and r["hits1"] == h1, i
        if lp is None:
            assert r["logprob"] is None and r["ppl"] is None
        else:
            assert r["logprob"] == pytest.approx(lp, rel=1e-12)
            assert r["ppl"] == pytest.approx(ppl, rel=1e-12)
    # the duplicated sentence is more probable than the gibberish
    assert got[1]["ppl"] < got[4]["ppl"]


def test_lm_score_external_reference_corpus(spark):
    """Score one corpus under counts trained on ANOTHER (the CCNet
    wiki-reference shape); unseen bigrams take the α fallback."""
    ref = spark.createDataFrame(ROWS[:4], "doc_id long, text string")
    target = spark.createDataFrame(
        [(10, "the cat sat"), (11, "completely novel words here")],
        "doc_id long, text string",
    )
    counts = lm_counts(ref)
    got = {r["doc_id"]: r for r in lm_score(target, counts=counts).collect()}
    assert got[10]["hits2"] > 0          # seen bigrams hit the table
    assert got[11]["hits2"] == 0         # fully out-of-domain
    assert got[11]["ppl"] > got[10]["ppl"]


def test_lm_score_deterministic_across_partitioning(spark):
    """Integer sufficient statistics are exactly partitioning-
    invariant; float log-sums only up to summation order (IEEE
    addition is not associative), hence the oracled driver row
    exposes the integers and keeps logprob/ppl out of the hash."""
    docs = spark.createDataFrame(ROWS, "doc_id long, text string")
    a = {r["doc_id"]: r for r in lm_score(docs.repartition(7)).collect()}
    b = {r["doc_id"]: r for r in lm_score(docs.repartition(2)).collect()}
    for i in a:
        for c in ("n_bigrams", "hits2", "hits1"):
            assert a[i][c] == b[i][c]
        if a[i]["ppl"] is not None:
            assert a[i]["ppl"] == pytest.approx(b[i]["ppl"], rel=1e-12)
