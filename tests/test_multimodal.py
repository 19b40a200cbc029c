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


def test_sample_frames_shape_and_determinism(spark):
    from lambdo_spark.functions.multimodal import sample_frames

    pages = generate_pages(spark, 50, seed=3).dropDuplicates(["url"])
    n_docs = pages.count()
    out = sample_frames(pages, id_col="url", binary_col="html", n_frames=4)
    pdf = out.toPandas()
    assert len(pdf) == n_docs * 4
    assert sorted(pdf.columns) == sorted(
        ["media_id", "frame_ix", "byte_offset", "n_bytes", "frame_sig"]
    )
    # offsets are evenly spaced integer positions within the blob
    g = pdf[pdf.media_id == pdf.media_id.iloc[0]].sort_values("frame_ix")
    n = g.n_bytes.iloc[0]
    assert g.byte_offset.tolist() == [(i * n) // 4 for i in range(4)]
    # partitioning-independent determinism
    again = (
        sample_frames(pages.repartition(7), "url", "html", n_frames=4)
        .toPandas()
        .sort_values(["media_id", "frame_ix"])
        .reset_index(drop=True)
    )
    assert again.equals(
        pdf.sort_values(["media_id", "frame_ix"]).reset_index(drop=True)
    )


def test_resize_image_stub_plumbing(spark):
    from lambdo_spark.functions.multimodal import resize_image

    pages = generate_pages(spark, 20, seed=4).dropDuplicates(["url"])
    n_docs = pages.count()
    out = resize_image(pages, id_col="url", binary_col="html", target_w=8, target_h=6)
    pdf = out.toPandas()
    assert len(pdf) == n_docs
    assert (pdf["resized"].map(len) == 48).all()  # fixed output size
    assert (pdf["target_w"] == 8).all() and (pdf["target_h"] == 6).all()
    # deterministic across partitionings
    b = resize_image(
        pages.repartition(5), "url", "html", target_w=8, target_h=6
    ).toPandas()
    a = pdf.sort_values("media_id").reset_index(drop=True)
    b = b.sort_values("media_id").reset_index(drop=True)
    assert (a["resized"].map(bytes) == b["resized"].map(bytes)).all()
