"""Multimodal plumbing: real Spark mechanics, stubbed decode."""

import pytest

from lambdo_spark.functions.multimodal import (
    FEATURE_DIM,
    decode_image,
    extract_media_features,
    fake_features,
)
from lambdo_spark.sources.pages import generate_pages


def test_decode_is_an_explicit_stub():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_fake_features_deterministic():
    a, b = fake_features(b"abc"), fake_features(b"abc")
    assert list(a) == list(b) and len(a) == FEATURE_DIM
    assert list(fake_features(b"abc")) != list(fake_features(b"abd"))


def test_extract_media_features_over_binary_column(spark):
    pages = generate_pages(spark, 300, seed=42)
    out = extract_media_features(pages, id_col="url", binary_col="html")
    rows = out.collect()
    assert len(rows) == 300
    r = rows[0]
    assert r["kind"] == "image" and r["n_bytes"] > 0
    assert len(r["features"]) == FEATURE_DIM


def test_features_stable_across_partitioning(spark):
    a = extract_media_features(
        generate_pages(spark, 200, seed=1, partitions=2), "url", "html"
    ).orderBy("media_id", "n_bytes").toPandas()
    b = extract_media_features(
        generate_pages(spark, 200, seed=1, partitions=7), "url", "html"
    ).orderBy("media_id", "n_bytes").toPandas()
    assert a["features"].map(tuple).tolist() == b["features"].map(tuple).tolist()
