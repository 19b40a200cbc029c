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
