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


FRAME_SCHEMA = (
    "media_id string, frame_ix int, byte_offset long, n_bytes long, "
    "frame_sig long"
)

RESIZE_SCHEMA = (
    "media_id string, kind string, n_bytes long, target_w int, target_h int, "
    "resized binary"
)


def sample_frames(
    df: DataFrame,
    id_col: str,
    binary_col: str,
    n_frames: int = 4,
) -> DataFrame:
    """Frame-sampling plumbing for video-like binary columns: one input
    row explodes into ``n_frames`` output rows at evenly spaced byte
    offsets (offset_i = floor(i·n_bytes/n_frames)). A real decoder
    would seek keyframes; the *Spark shape* — mapInPandas batch in,
    multi-row Arrow batch out, stable row explosion — is exactly what
    that decoder plugs into. ``frame_sig`` is a deterministic xxhash-
    style signature of the 64-byte window at the offset (splitmix64
    over sha256 prefix) so downstream dedup/tests can pin content."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, ixs, offs, lens, sigs = [], [], [], [], []
            for mid, blob in zip(b[id_col], b[binary_col]):
                data = bytes(blob) if blob is not None else b""
                n = len(data)
                for i in range(n_frames):
                    off = (i * n) // n_frames
                    window = data[off : off + 64]
                    d = hashlib.sha256(window).digest()[:8]
                    ids.append(str(mid))
                    ixs.append(i)
                    offs.append(off)
                    lens.append(n)
                    sigs.append(int.from_bytes(d, "little", signed=True))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype=object),
                    "frame_ix": pd.Series(ixs, dtype="int32"),
                    "byte_offset": pd.Series(offs, dtype="int64"),
                    "n_bytes": pd.Series(lens, dtype="int64"),
                    "frame_sig": pd.Series(sigs, dtype="int64"),
                }
            )

    return df.select(id_col, binary_col).mapInPandas(kernel, schema=FRAME_SCHEMA)


def resize_image(
    df: DataFrame,
    id_col: str,
    binary_col: str,
    target_w: int = 64,
    target_h: int = 64,
    kind: str = "image",
) -> DataFrame:
    """Resize plumbing: binary in → binary out with typed size
    metadata, batched over Arrow. The decode+resample step is the
    documented stub (`decode_image`); the deterministic stand-in emits
    target_w·target_h bytes derived from the input's sha256 stream so
    output size, schema, and partitioning behave exactly like a real
    resizer (Pillow/opencv drops into the marked line)."""
    out_len = target_w * target_h

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            blobs = b[binary_col]
            resized = []
            for blob in blobs:
                data = bytes(blob) if blob is not None else b""
                # REAL DECODER SLOT: decode_image(data) -> resample ->
                # tobytes(). Stand-in: sha256-seeded deterministic bytes.
                stream = bytearray()
                seed = hashlib.sha256(data).digest()
                while len(stream) < out_len:
                    stream.extend(seed)
                    seed = hashlib.sha256(seed).digest()
                resized.append(bytes(stream[:out_len]))
            yield pd.DataFrame(
                {
                    "media_id": b[id_col].astype(str),
                    "kind": kind,
                    "n_bytes": blobs.map(lambda x: len(x) if x is not None else 0),
                    "target_w": pd.Series([target_w] * len(b), dtype="int32"),
                    "target_h": pd.Series([target_h] * len(b), dtype="int32"),
                    "resized": resized,
                }
            )

    return df.select(id_col, binary_col).mapInPandas(kernel, schema=RESIZE_SCHEMA)


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
