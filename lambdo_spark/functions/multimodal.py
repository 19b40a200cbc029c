"""Multimodal column plumbing: image/audio/video as opaque binary.

The Spark-side machinery — schema, partition-preserving mapInPandas,
Arrow batch shapes, typed metadata — is real and tested against the
pages table's ``html`` binary column. The *decode* step is
import-guarded: ``decode_image`` decodes binary PPM (P6) in pure
numpy everywhere, uses Pillow for PNG/JPEG/etc. when importable, and
otherwise raises a loud NotImplementedError (never a silent fake) so
a misconfigured production deploy fails visibly. ``fake_features``
remains the deterministic stand-in the oracled driver rows run — it
exercises exactly the batch shape a real decoder kernel has (binary
in → fixed-dim float vector out) without depending on codec bits.

Audio needs no guard at all: ``decode_wav`` parses canonical
RIFF/WAVE PCM16 in pure numpy (see the audio section at the bottom),
so that modality decodes for real in every environment.
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

_PIL_IMAGE = None  # memoized import probe: None=unchecked, False=absent


def _pil():
    global _PIL_IMAGE
    if _PIL_IMAGE is None:
        try:
            from PIL import Image  # noqa: PLC0415

            _PIL_IMAGE = Image
        except ImportError:
            _PIL_IMAGE = False
    return _PIL_IMAGE


def _decode_ppm_p6(data: bytes) -> np.ndarray:
    """Binary PPM (P6) → H×W×3 uint8, pure numpy (no image libs).
    Header: 'P6' <ws> width <ws> height <ws> maxval <single ws> raster;
    '#' comments allowed between tokens."""
    toks, i, n = [], 2, len(data)  # skip the 'P6' magic
    while len(toks) < 3 and i < n:
        while i < n and data[i : i + 1].isspace():
            i += 1
        if data[i : i + 1] == b"#":
            while i < n and data[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < n and not data[j : j + 1].isspace():
            j += 1
        toks.append(int(data[i:j]))
        i = j
    i += 1  # the single whitespace byte after maxval
    w, h, maxval = toks
    if maxval > 255:
        raise ValueError("16-bit PPM not supported by the numpy fallback")
    raster = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=i)
    return raster.reshape(h, w, 3)


def _decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BMP (BITMAPINFOHEADER) → H×W×3 uint8 RGB,
    pure numpy. Rows are stored bottom-up and padded to 4 bytes; pixel
    byte order is BGR(A)."""
    import struct as _struct  # noqa: PLC0415

    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    off = _struct.unpack("<I", data[10:14])[0]
    hdr = _struct.unpack("<I", data[14:18])[0]
    if hdr < 40:
        raise ValueError("BITMAPCOREHEADER BMP not supported")
    w, h = _struct.unpack("<ii", data[18:26])
    planes, bpp = _struct.unpack("<HH", data[26:30])
    comp = _struct.unpack("<I", data[30:34])[0]
    if comp not in (0, 3) or bpp not in (24, 32):
        raise ValueError(f"only uncompressed 24/32-bit BMP (bpp={bpp}, comp={comp})")
    flip = h > 0
    h = abs(h)
    nch = bpp // 8
    stride = (w * nch + 3) & ~3
    raster = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=off)
    rows = raster.reshape(h, stride)[:, : w * nch].reshape(h, w, nch)
    rgb = rows[:, :, 2::-1]  # BGR(A) → RGB
    return (rgb[::-1] if flip else rgb).copy()


def decode_image(data: bytes) -> "np.ndarray":
    """Decode an image binary to an H×W×3 uint8 RGB array.

    Binary PPM (P6) and uncompressed 24/32-bit BMP decode in pure
    numpy everywhere; every other format needs Pillow (import-guarded
    — wire opencv here instead if that's the cluster's lib). Raises
    NotImplementedError, loudly, if the format needs a decoder this
    environment doesn't have.
    """
    if data[:2] == b"P6":
        return _decode_ppm_p6(data)
    if data[:2] == b"BM":
        return _decode_bmp(data)
    img_mod = _pil()
    if img_mod:
        import io  # noqa: PLC0415

        with img_mod.open(io.BytesIO(data)) as im:
            return np.asarray(im.convert("RGB"))
    raise NotImplementedError(
        "decoding this image format requires Pillow (not importable here); "
        "binary PPM (P6) works without it, and fake_features covers "
        "plumbing tests"
    )


def real_features(data: bytes) -> np.ndarray:
    """Feature vector from a REAL decode: per-channel mean/std (RGB)
    plus log-dims — 8 float32s, same shape contract as fake_features."""
    a = decode_image(data).astype(np.float32)
    h, w = a.shape[0], a.shape[1]
    return np.array(
        [
            *(a[..., c].mean() / 255.0 for c in range(3)),
            *(a[..., c].std() / 255.0 for c in range(3)),
            np.log1p(np.float32(w)),
            np.log1p(np.float32(h)),
        ],
        dtype=np.float32,
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
    decoder: str = "fake",
) -> DataFrame:
    """Resize plumbing: binary in → binary out with typed size
    metadata, batched over Arrow.

    ``decoder="fake"`` (default): deterministic sha256-stream bytes of
    exactly target_w·target_h — output size, schema, and partitioning
    behave like a real resizer without codec dependencies.
    ``decoder="real"``: :func:`decode_image` + numpy nearest-neighbor
    resample → raw RGB bytes (target_w·target_h·3), deterministic
    across environments (no resampling-library variance)."""
    use_real = decoder == "real"
    out_len = target_w * target_h

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            blobs = b[binary_col]
            resized = []
            for blob in blobs:
                data = bytes(blob) if blob is not None else b""
                if use_real:
                    a = decode_image(data)
                    h, w = a.shape[0], a.shape[1]
                    yi = (np.arange(target_h) * h) // target_h
                    xi = (np.arange(target_w) * w) // target_w
                    resized.append(a[yi][:, xi].tobytes())
                    continue
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
    decoder: str = "fake",
) -> DataFrame:
    """mapInPandas feature-extraction stage over a binary column.

    Arrow delivers the binary cells in batches; the kernel processes a
    batch at a time and emits (id, kind, n_bytes, width/height,
    features).

    ``decoder="fake"`` (default): deterministic sha256-derived
    features, width/height null — the oracled plumbing path.
    ``decoder="real"``: decode each binary with :func:`decode_image`
    (pure-numpy PPM anywhere; Pillow formats where it's importable)
    and emit real dimensions + channel-statistics features. Fails
    loudly per NotImplementedError if the format has no decoder here.
    """
    use_real = decoder == "real"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            blobs = b[binary_col]
            if use_real:
                feats, ws, hs = [], [], []
                for x in blobs:
                    data = bytes(x) if x is not None else b""
                    arr = decode_image(data)
                    hs.append(arr.shape[0])
                    ws.append(arr.shape[1])
                    feats.append(real_features(data))
                width = pd.array(ws, dtype="Int32")
                height = pd.array(hs, dtype="Int32")
            else:
                feats = [
                    fake_features(bytes(x) if x is not None else b"") for x in blobs
                ]
                width = pd.array([None] * len(b), dtype="Int32")
                height = pd.array([None] * len(b), dtype="Int32")
            yield pd.DataFrame(
                {
                    "media_id": b[id_col].astype(str),
                    "kind": kind,
                    "n_bytes": blobs.map(lambda x: len(x) if x is not None else 0),
                    "width": width,
                    "height": height,
                    "features": feats,
                }
            )

    return df.select(id_col, binary_col).mapInPandas(kernel, schema=MEDIA_SCHEMA)


# ------------------------------------------------------------- audio (WAV)
#
# Unlike images (PIL-guarded), canonical PCM WAV needs NO external
# codec: the RIFF container is a struct-packed header walk and the
# samples are little-endian int16 — pure numpy, decoded for real in
# every environment.

import struct

AUDIO_SCHEMA = (
    "media_id string, sample_rate int, n_channels int, n_samples long, "
    "duration_ms long, abs_sum long, peak int"
)


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int, channels: int = 1) -> bytes:
    """Minimal canonical RIFF/WAVE, PCM 16-bit little-endian."""
    data = np.asarray(samples, dtype="<i2").tobytes()
    return (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack(
            "<IHHIIHH", 16, 1, channels, sample_rate,
            sample_rate * channels * 2, channels * 2, 16,
        )
        + b"data" + struct.pack("<I", len(data)) + data
    )


def decode_wav(data: bytes) -> tuple[int, int, np.ndarray]:
    """Parse RIFF/WAVE PCM16 → (sample_rate, n_channels, int16 frames).

    Walks the chunk list (extra chunks like LIST/INFO are skipped), so
    real-world WAV files decode, not just our own output. Raises
    ``ValueError`` on non-RIFF input or non-PCM16 encodings — loud,
    never a silent fake."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, sr, ch, bits, frames = 12, None, None, None, None
    while pos + 8 <= len(data):
        cid, size = data[pos:pos + 4], struct.unpack("<I", data[pos + 4:pos + 8])[0]
        body = data[pos + 8:pos + 8 + size]
        if len(body) < size:
            raise ValueError("truncated WAV chunk")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("malformed fmt chunk")
            fmt, ch, sr = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if fmt != 1 or bits != 16:
                raise ValueError(
                    f"only PCM16 supported (got format={fmt}, bits={bits})"
                )
        elif cid == b"data":
            frames = np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if sr is None or frames is None:
        raise ValueError("missing fmt/data chunk")
    if ch > 1:
        frames = frames[: (len(frames) // ch) * ch].reshape(-1, ch)
    return int(sr), int(ch), frames


def extract_audio_features(
    df: DataFrame, id_col: str = "doc_id", audio_col: str = "audio"
) -> DataFrame:
    """Decode WAV blobs and emit integer-exact audio features — one
    mapInPandas pass, decode stays partition-local. Features are
    integer-valued on purpose (duration via floor division, abs-sum,
    peak): cross-engine float drift can't touch the oracle."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            srs, chs, ns, durs, sums, peaks = [], [], [], [], [], []
            for x in b[audio_col]:
                sr, ch, fr = decode_wav(bytes(x))
                flat = fr.reshape(-1).astype(np.int64)
                n = len(flat) // ch if ch > 1 else len(flat)
                srs.append(sr)
                chs.append(ch)
                ns.append(n)
                durs.append(n * 1000 // sr)
                sums.append(int(np.abs(flat).sum()))
                peaks.append(int(np.abs(flat).max()) if len(flat) else 0)
            yield pd.DataFrame(
                {
                    "media_id": b[id_col].astype(str),
                    "sample_rate": srs,
                    "n_channels": chs,
                    "n_samples": ns,
                    "duration_ms": durs,
                    "abs_sum": sums,
                    "peak": peaks,
                }
            )

    return df.select(id_col, audio_col).mapInPandas(kernel, schema=AUDIO_SCHEMA)


# ------------------------------------------------------------ video (AVI)
#
# Same story as WAV: an uncompressed AVI is pure container walking —
# RIFF 'AVI ' → LIST hdrl (avih main header) → LIST movi with one
# '00db' (uncompressed DIB) chunk per frame. No codec bits needed, so
# video-as-binary decodes for real everywhere, like audio and
# PPM/BMP images.

VIDEO_SCHEMA = (
    "media_id string, n_frames int, width int, height int, "
    "frame_bytes long, px_sum long"
)


def encode_avi_rgb(frames: "np.ndarray", fps: int = 10) -> bytes:
    """Minimal uncompressed AVI: frames is N×H×W×3 uint8 RGB; stored
    as bottom-up BGR DIB rows (the BMP raster convention), one '00db'
    chunk per frame."""
    n, h, w, _ = frames.shape
    stride = (w * 3 + 3) & ~3
    dib_frames = []
    for f in frames:
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, : w * 3] = f[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
        dib_frames.append(rows.tobytes())
    fsize = h * stride

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps, fsize * fps, 0, 0x10, n, 0, 1, fsize, w, h,
        0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0, n, fsize, 0, 0,
        0, 0, w, h,
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, fsize, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00db", d) for d in dib_frames))
    return b"RIFF" + struct.pack("<I", 4 + len(hdrl) + len(movi)) + b"AVI " + hdrl + movi


def decode_avi_rgb(data: bytes) -> "np.ndarray":
    """Parse an uncompressed AVI → N×H×W×3 uint8 RGB frames. Walks the
    RIFF tree for the avih header and every '00db' DIB chunk; raises
    ``ValueError`` on non-AVI input — loud, never a silent fake."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    w = h = None
    frames = []

    def walk(lo: int, hi: int) -> None:
        nonlocal w, h
        pos = lo
        while pos + 8 <= hi:
            cid = data[pos:pos + 4]
            size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
            body_lo, body_hi = pos + 8, pos + 8 + size
            if body_hi > len(data):
                raise ValueError("truncated AVI chunk")
            if cid == b"LIST":
                walk(body_lo + 4, body_hi)  # skip the list-kind fourcc
            elif cid == b"avih":
                if size < 40:
                    raise ValueError("malformed avih header")
                hdr = struct.unpack("<IIIIIIIIII", data[body_lo:body_lo + 40])
                w, h = hdr[8], hdr[9]
            elif cid == b"00db":
                frames.append(data[body_lo:body_hi])
            pos = body_hi + (size & 1)

    walk(12, len(data))
    if w is None or not frames:
        raise ValueError("missing avih header or 00db frames")
    stride = (w * 3 + 3) & ~3
    out = np.empty((len(frames), h, w, 3), dtype=np.uint8)
    for i, d in enumerate(frames):
        rows = np.frombuffer(d, dtype=np.uint8, count=stride * h).reshape(h, stride)
        out[i] = rows[:, : w * 3].reshape(h, w, 3)[::-1, :, ::-1]  # → top-down RGB
    return out


def extract_video_features(
    df: DataFrame, id_col: str = "doc_id", video_col: str = "video"
) -> DataFrame:
    """Decode AVI blobs to integer-exact video features in one
    mapInPandas pass (frame count, dims, raw frame bytes, pixel sum)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = {"media_id": [], "n_frames": [], "width": [],
                   "height": [], "frame_bytes": [], "px_sum": []}
            for mid, x in zip(b[id_col], b[video_col]):
                fr = decode_avi_rgb(bytes(x))
                out["media_id"].append(str(mid))
                out["n_frames"].append(fr.shape[0])
                out["height"].append(fr.shape[1])
                out["width"].append(fr.shape[2])
                out["frame_bytes"].append(int(fr.nbytes))
                out["px_sum"].append(int(fr.astype(np.int64).sum()))
            yield pd.DataFrame(out)

    return df.select(id_col, video_col).mapInPandas(kernel, schema=VIDEO_SCHEMA)
