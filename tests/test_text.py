"""Text-analysis kernels: values pinned against hand-computed and
pure-Python references."""

import pytest
from pyspark.sql import functions as F

from lambdo_spark.functions.text import (
    analyze_documents,
    fingerprint_py,
    lang_id,
    quality_score,
    token_count,
)


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "the cat and the dog sat in a house"),
            (2, "der hund und die katze das ist gut"),
            (3, "le chat et la maison les arbres des"),
            (4, "xyzzy qwerty plugh"),
            (5, ""),
        ],
        "doc_id long, text string",
    )


def test_token_count(spark):
    out = _docs(spark).select("doc_id", token_count(F.col("text")).alias("n"))
    got = {r["doc_id"]: r["n"] for r in out.collect()}
    assert got[1] == 9 and got[4] == 3


def test_lang_id(spark):
    out = _docs(spark).select("doc_id", lang_id(F.col("text")).alias("lang"))
    got = {r["doc_id"]: r["lang"] for r in out.collect()}
    assert got[1] == "en"
    assert got[2] == "de"
    assert got[3] == "fr"
    assert got[4] == "und"


def test_quality_monotone_in_length(spark):
    df = spark.createDataFrame(
        [(1, "the " * 10), (2, "the " * 200)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["q"] for r in df.select(
        "doc_id", quality_score(F.col("text")).alias("q")).collect()}
    assert 0 <= got[1] < got[2] <= 1


def test_fingerprint_matches_python_reference(spark):
    out = analyze_documents(_docs(spark)).select("doc_id", "text", "fingerprint")
    for r in out.collect():
        assert r["fingerprint"] == fingerprint_py(r["text"])


def test_analyze_on_real_documents(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = analyze_documents(docs)
    assert out.count() == docs.count()
    row = out.first()
    assert row["n_tokens"] > 0 and 0 <= row["quality"] <= 1


def test_gopher_metrics_hand_computed(spark):
    from lambdo_spark.functions.text import (
        dup_bigram_fraction,
        mean_word_length,
        repetition_ratio,
        symbol_word_ratio,
    )

    df = spark.createDataFrame(
        [
            (1, "a b a b a"),          # 5 toks, 2 distinct; bigrams: ab ba ab ba → 4,2
            (2, "one two three"),       # all unique
            (3, "### wow ... fine …"),  # 3 hashes + 2 ellipses over 5 tokens
            (4, ""),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            repetition_ratio(F.col("text")).alias("rep"),
            dup_bigram_fraction(F.col("text")).alias("dup2"),
            mean_word_length(F.col("text")).alias("mwl"),
            symbol_word_ratio(F.col("text")).alias("sym"),
        ).collect()
    }
    assert got[1]["rep"] == pytest.approx(3 / 5)
    assert got[1]["dup2"] == pytest.approx(2 / 4)
    assert got[2]["rep"] == 0.0 and got[2]["dup2"] == 0.0
    assert got[2]["mwl"] == pytest.approx((3 + 3 + 5) / 3)
    assert got[3]["sym"] == pytest.approx((3 + 2) / 5)
    assert got[4]["rep"] == 0.0 and got[4]["mwl"] == 0.0 and got[4]["sym"] == 0.0


def test_gopher_filter_rules(spark):
    from lambdo_spark.functions.text import gopher_filter

    good = "the cat and dog sat " * 12              # 60 words, stopwords, unique-ish
    short = "the cat"                                # < min_words
    symbols = ("the and of to in " + "# " * 60)      # symbol flood
    df = spark.createDataFrame(
        [(1, good), (2, short), (3, symbols)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["keep"]
        for r in df.select(
            "doc_id",
            gopher_filter(F.col("text"), max_repetition=0.95).alias("keep"),
        ).collect()
    }
    assert got == {1: True, 2: False, 3: False}


def test_bigram_array_short_input_guard(spark):
    """Spark sequence(0,-1) is descending, not empty — one-token and
    empty docs must yield empty bigram arrays, not a crash."""
    from lambdo_spark.functions.text import bigram_array

    df = spark.createDataFrame([(1, "solo"), (2, "")], "doc_id long, text string")
    got = {r["doc_id"]: r["bg"] for r in df.select(
        "doc_id", bigram_array(F.col("text")).alias("bg")).collect()}
    assert got[1] == [] and got[2] == []


def test_scrub_pii_golden(spark):
    from lambdo_spark.functions.text import pii_counts, scrub_pii

    rows = spark.createDataFrame(
        [
            ("mail a.b+c@ex-ample.org now", "mail <EMAIL> now", (1, 0, 0)),
            ("host 192.168.1.250 up", "host <IP> up", (0, 1, 0)),
            ("call +49 171 555 0123 ok", "call <PHONE> ok", (0, 0, 1)),
            ("us (415) 555-0199 line", "us <PHONE> line", (0, 0, 1)),
            # precision guards: dates / versions / bare ints survive
            ("born 2024-01-01 v1.2.3 id 1234567", "born 2024-01-01 v1.2.3 id 1234567", (0, 0, 0)),
        ],
        "text string, want string, counts struct<emails:int,ips:int,phones:int>",
    )
    got = rows.select(
        "want", "counts",
        scrub_pii(F.col("text")).alias("scrubbed"),
        pii_counts(F.col("text")).alias("c"),
    ).collect()
    for r in got:
        assert r["scrubbed"] == r["want"]
        assert (r["c"]["emails"], r["c"]["ips"], r["c"]["phones"]) == tuple(r["counts"])


def test_remove_boilerplate_lines(spark):
    from lambdo_spark.functions.text import remove_boilerplate_lines

    nav = "subscribe to our newsletter"
    docs = spark.createDataFrame(
        [
            (1, "a", f"{nav}\nreal content one"),
            (2, "a", f"{nav}\nreal content two"),
            (3, "a", nav),                      # all-boilerplate doc
            (4, "b", f"{nav}\nother site text"),  # same line, other group
        ],
        "doc_id long, source string, text string",
    )
    out = {
        r["doc_id"]: r["text"]
        for r in remove_boilerplate_lines(docs, min_docs=3).collect()
    }
    assert out == {
        1: "real content one",
        2: "real content two",
        3: "",
        4: f"{nav}\nother site text",  # only 1 doc in group b keeps it
    }

def test_boilerplate_null_group_kept(spark):
    """Docs with a NULL group column form their own stratum (null-safe
    anti-join) instead of being silently emptied — previously the
    inner count-join dropped every NULL-group line."""
    from lambdo_spark.functions.text import remove_boilerplate_lines

    nav = "home | about | contact"
    rows = [
        (1, None, f"{nav}\nunique one"),
        (2, None, f"{nav}\nunique two"),
        (3, None, f"{nav}\nunique three"),
        (4, "a", "content stays intact here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["doc_id"]: r["text"]
           for r in remove_boilerplate_lines(docs, min_docs=3).collect()}
    assert out[1] == "unique one"          # nav removed WITHIN null group
    assert out[2] == "unique two"
    assert out[3] == "unique three"
    assert out[4] == "content stays intact here"
