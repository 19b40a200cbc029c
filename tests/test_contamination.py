"""Benchmark decontamination: n-gram containment flags."""

from pyspark.sql import functions as F

from lambdo_spark.functions.contamination import decontaminate, ngram_set


def test_ngram_set_short_input(spark):
    df = spark.createDataFrame([("a b c",), ("a b c d",)], "t string")
    got = df.select(F.size(ngram_set(F.col("t"), 4)).alias("n")).collect()
    assert [r["n"] for r in got] == [0, 1]


def test_decontaminate_flags_verbatim_span(spark):
    bench_q = "what is the capital city of france in europe"
    train = spark.createDataFrame(
        [
            # contains the 8-token benchmark span verbatim
            (1, "quiz night asked what is the capital city of france in europe twice"),
            # paraphrase — shares shorter spans only
            (2, "the capital of france is paris which sits in europe"),
            (3, "completely unrelated text about spark shuffle partitions here"),
            (4, "too short"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(bench_q,)], "text string")
    out = {
        r["doc_id"]: (r["n_hits"], r["contaminated"])
        for r in decontaminate(train, bench, n=8).collect()
    }
    assert out[1][1] == 1 and out[1][0] >= 1
    assert out[2] == (0, 0)
    assert out[3] == (0, 0)
    assert out[4] == (0, 0)


def test_decontaminate_min_hits_and_no_broadcast(spark):
    """min_hits raises the bar; broadcast off gives identical output."""
    span = "one two three four five six seven eight nine"
    train = spark.createDataFrame(
        [(1, span), (2, "x " + span)], "doc_id long, text string"
    )
    bench = spark.createDataFrame([(span,)], "text string")
    # doc 1 == the span: 2 distinct 8-grams; doc 2 contains both too
    strict = {
        r["doc_id"]: r["contaminated"]
        for r in decontaminate(train, bench, n=8, min_hits=3).collect()
    }
    assert strict == {1: 0, 2: 0}
    a = sorted(map(tuple, decontaminate(train, bench, n=8).collect()))
    b = sorted(map(tuple, decontaminate(
        train, bench, n=8, broadcast_bench=False).collect()))
    assert a == b


def test_contamination_pairs(spark):
    from lambdo_spark.functions.contamination import contamination_pairs

    q1 = "what is the capital city of france in europe"
    q2 = "name the longest river on the african continent please"
    train = spark.createDataFrame(
        [(1, f"intro {q1} outro"), (2, f"a {q2} b"), (3, "nothing shared here at all now")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, q1), (200, q2)], "bench_id long, text string"
    )
    got = sorted(
        (r["doc_id"], r["bench_id"])
        for r in contamination_pairs(train, bench, n=8).collect()
    )
    assert got == [(1, 100), (2, 200)]

def test_decontaminate_hash_prefilter_identical(spark):
    """prefilter='hash64' (broadcast 8-byte hashes + exact re-verify)
    must return byte-identical output to the plain string-broadcast
    path, and the plan must show the hash semi-join feeding an exact
    string verify."""
    import pytest
    from lambdo_spark.functions.contamination import decontaminate

    train = spark.createDataFrame(
        [(i, f"doc {i} alpha beta gamma delta epsilon zeta eta theta"
          + (" shared bench span one two three four five" if i % 3 == 0 else ""))
         for i in range(30)],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(0, "the shared bench span one two three four five appears here")],
        "bench_id long, text string",
    )
    plain = sorted(map(tuple, decontaminate(train, bench, n=8).collect()))
    fast = sorted(map(tuple,
        decontaminate(train, bench, n=8, prefilter="hash64").collect()))
    assert plain == fast
    assert any(r[2] == 1 for r in plain)  # the planted overlap is found
    plan = decontaminate(
        train, bench, n=8, prefilter="hash64"
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "xxhash64" in plan
    with pytest.raises(ValueError, match="prefilter"):
        decontaminate(train, bench, prefilter="bloom")


def test_exploded_ngrams_matches_ngram_set(spark):
    """The codegen explode form and the array form must describe the
    same n-gram sets: distinct occurrences per doc == ngram_set."""
    from lambdo_spark.functions.contamination import (
        _exploded_ngrams, ngram_set,
    )

    rows = [
        (1, "a b c d e"), (2, "a a a a"), (3, "x"), (4, ""),
        (5, "  padded   tokens  here four five  "),
        (6, "t1 t2 t3 t1 t2 t3 t1 t2"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for n in (2, 4, 8):
        arr = {
            r["doc_id"]: sorted(r["ng"])
            for r in df.select(
                "doc_id", ngram_set(F.col("text"), n).alias("ng")
            ).collect()
        }
        exp = {r[0]: [] for r in rows}
        for r in (
            _exploded_ngrams(df, "text", n, [F.col("doc_id")])
            .dropDuplicates(["doc_id", "_ng"]).collect()
        ):
            exp[r["doc_id"]].append(r["_ng"])
        exp = {k: sorted(v) for k, v in exp.items()}
        assert arr == exp, n
