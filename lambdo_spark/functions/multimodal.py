"""Multimodal column plumbing: image/audio/video as opaque binary.

The Spark-side machinery — schema, partition-preserving mapInPandas,
Arrow batch shapes, typed metadata — is real and tested against the
pages table's ``html`` binary column. The *decode* step is stubbed
(no image/audio libs in this container): ``decode_image`` raises
NotImplementedError; ``fake_features`` is the deterministic stand-in
the tests and benchmarks run, with exactly the batch shape a real
decoder kernel would have (binary in → fixed-dim float vector out).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id string, kind string, n_bytes long, width int, height int, "
    "features array<float>"
)

FEATURE_DIM = 8


def decode_image(data: bytes) -> "np.ndarray":
    """Real decoder slot — wire Pillow/opencv here on a full cluster.

    Kept as an explicit NotImplementedError (not a silent fake) so a
    misconfigured production deploy fails loudly.
    """
    raise NotImplementedError(
        "image decoding requires Pillow/opencv, not present in this sandbox; "
        "use fake_features for plumbing tests"
    )


def fake_features(data: bytes) -> np.ndarray:
    """Deterministic stand-in feature extractor: 8 floats derived from
    the sha256 of the bytes — stable across processes/partitionings."""
    d = hashlib.sha256(data or b"").digest()
    return (
        np.frombuffer(d[:FEATURE_DIM * 4], dtype=np.uint32).astype(np.float32)
        / np.float32(2**32)
    )


def extract_media_features(
    df: DataFrame,
    id_col: str,
    binary_col: str,
    kind: str = "image",
    batch_hint: int = 1024,
) -> DataFrame:
    """mapInPandas feature-extraction stage over a binary column.

    Arrow delivers the binary cells in batches; the kernel processes a
    batch at a time and emits (id, kind, n_bytes, width/height
    placeholders, features). Swap ``fake_features`` for a real decoder
    without touching the Spark plumbing.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            blobs = b[binary_col]
            feats = [fake_features(bytes(x) if x is not None else b"") for x in blobs]
            yield pd.DataFrame(
                {
                    "media_id": b[id_col].astype(str),
                    "kind": kind,
                    "n_bytes": blobs.map(lambda x: len(x) if x is not None else 0),
                    "width": pd.array([None] * len(b), dtype="Int32"),
                    "height": pd.array([None] * len(b), dtype="Int32"),
                    "features": feats,
                }
            )

    return df.select(id_col, binary_col).mapInPandas(kernel, schema=MEDIA_SCHEMA)
