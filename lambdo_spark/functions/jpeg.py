"""Baseline JPEG (ITU T.81) codec in pure numpy — no image library.

Round 3 proved the multimodal plumbing with uncompressed containers
(PPM/BMP/WAV/AVI); round 4's PNG codec added a real compressed format
(DEFLATE). This module closes the remaining named gap — "JPEG needs
Pillow" — with a from-scratch baseline sequential DCT codec:

* ``decode_jpeg``: marker walk (SOI/APPn/COM/DQT/SOF0/DHT/DRI/SOS/
  RSTn/EOI), canonical Huffman decode of the entropy-coded segment,
  dequantize, 8x8 inverse DCT, chroma upsampling (1x1 / 2x1 / 2x2
  sampling factors), YCbCr->RGB. Grayscale and 3-component
  interleaved baseline scans; restart intervals honored. Progressive
  (SOF2), arithmetic coding, 12-bit precision and non-interleaved
  multi-scan files raise a clean ``ValueError`` naming the limit —
  loud, never a silent fake.
* ``encode_jpeg``: the fixture synthesizer — Annex-K quantization
  tables scaled by libjpeg's quality curve, standard Huffman tables
  (emitted in DHT markers, so decode correctness never depends on
  table recall), optional 4:2:0 / 4:2:2 subsampling and restart
  intervals.

Exactness contract (what makes the DuckDB oracle possible): the DC
basis term is evaluated EXACTLY on both sides — the forward DCT
overrides ``S[0,0] = sum(block)/8`` (integer*2^-3: exact in float64)
and the inverse adds ``dc/8`` outside the cosine matrix product — and
every rounding step is half-up ``floor(x + 0.5)``. A constant-color
image therefore decodes to a value computable in closed form by plain
SQL arithmetic: quantized AC terms are exactly zero, and the whole
pipeline collapses to RGB->YCbCr rounding, one quantize/dequantize of
the DC term, and YCbCr->RGB rounding. ``tests/test_multimodal.py``
pins this and the driver row ``image_decode_jpeg`` hash-checks it
against DuckDB at sf0.01.

Reference analog: none — the reference engine (asavinov/lambdo) has
no media path at all; this extends the multimodal column family
(SURVEY.md §2.4).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables

#: Annex K.1 / K.2 base quantization tables (row-major 8x8).
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64).reshape(8, 8)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64).reshape(8, 8)


def quant_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """Annex-K tables scaled by the libjpeg quality curve:
    scale = 5000/q (q<50) else 200-2q; cell = clip((base*scale+50)//100, 1, 255).
    Integer arithmetic throughout — the oracle SQL inlines the result."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in 1..100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (QUANT_LUMA, QUANT_CHROMA):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int64))
    return out[0], out[1]


def _zigzag_order() -> np.ndarray:
    """The T.81 zig-zag scan as flat row-major indices, generated (not
    transcribed) from the diagonal walk so it cannot be mistyped."""
    order = []
    for s in range(15):
        rng = range(min(s, 7), max(s - 7, 0) - 1, -1) if s % 2 == 0 else \
              range(max(s - 7, 0), min(s, 7) + 1)
        for r in rng:
            order.append(r * 8 + (s - r))
    return np.array(order, dtype=np.int64)


ZIGZAG = _zigzag_order()           # natural index for each zigzag position
UNZIGZAG = np.argsort(ZIGZAG)      # zigzag position for each natural index

# Standard Huffman table specs (T.81 Annex K.3): (bits[1..16], values).
# Emitted in DHT and rebuilt from DHT on decode, so the round trip is
# self-consistent by construction; any canonically-valid table works.
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))

_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# Cosine basis M[u,x] = 0.5*C(u)*cos((2x+1)u*pi/16); DCT = M @ b @ M.T.
_X = np.arange(8)
_DCT_M = 0.5 * np.cos((2 * _X[None, :] + 1) * _X[:, None] * np.pi / 16)
_DCT_M[0, :] *= 1 / np.sqrt(2)


def _round_half_up(x: np.ndarray) -> np.ndarray:
    """floor(x + 0.5): the codec-wide rounding rule. Deterministic for
    negatives (half rounds toward +inf) and expressible in plain SQL,
    unlike numpy's banker rounding."""
    return np.floor(x + 0.5)


# ------------------------------------------------------------ color space


def rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    """JFIF RGB->YCbCr, half-up rounded, clipped — uint8 in/out."""
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
    out = np.stack([y, cb, cr], axis=-1)
    return np.clip(_round_half_up(out), 0, 255).astype(np.uint8)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    """JFIF YCbCr->RGB, half-up rounded, clipped — uint8 in/out."""
    y = ycc[..., 0].astype(np.float64)
    cb = ycc[..., 1].astype(np.float64) - 128.0
    cr = ycc[..., 2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    out = np.stack([r, g, b], axis=-1)
    return np.clip(_round_half_up(out), 0, 255).astype(np.uint8)


# ------------------------------------------------------------- transforms


def _fdct_blocks(blocks: np.ndarray) -> np.ndarray:
    """Forward DCT over N level-shifted 8x8 blocks (float64 in). The
    DC term is recomputed EXACTLY as sum/8 (integer * 2^-3 — exact in
    binary floating point), so constant blocks quantize with no cosine
    round-off; see the module docstring's exactness contract."""
    out = np.einsum("ux,nxy,vy->nuv", _DCT_M, blocks, _DCT_M, optimize=True)
    out[:, 0, 0] = blocks.sum(axis=(1, 2)) * 0.125
    return out


def _idct_blocks(coeffs: np.ndarray) -> np.ndarray:
    """Inverse DCT over N dequantized 8x8 blocks. The DC basis term is
    added exactly (dc/8) outside the cosine product — the mirror of
    :func:`_fdct_blocks`'s exact DC."""
    dc = coeffs[:, 0, 0].copy()
    ac = coeffs.astype(np.float64).copy()
    ac[:, 0, 0] = 0.0
    out = np.einsum("ux,nuv,vy->nxy", _DCT_M, ac, _DCT_M, optimize=True)
    return out + (dc * 0.125)[:, None, None]


def _to_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) with H, W multiples of 8 -> (N, 8, 8), raster block order."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _from_blocks(blocks: np.ndarray, h: int, w: int) -> np.ndarray:
    return (
        blocks.reshape(h // 8, w // 8, 8, 8).transpose(0, 2, 1, 3).reshape(h, w)
    )


def _pad_replicate(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    """Pad to multiples of (mh, mw) by edge replication (the standard
    encoder convention: keeps block boundaries smooth)."""
    h, w = plane.shape
    ph = (-h) % mh
    pw = (-w) % mw
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


# ---------------------------------------------------------------- huffman


def _build_encode_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) for canonical (bits, vals)."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


def _build_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol for canonical (bits, vals)."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitWriter:
    """MSB-first bit accumulator with 0xFF byte stuffing."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        """Pad the final partial byte with 1-bits (T.81 F.1.2.3)."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _magnitude(v: int) -> tuple[int, int]:
    """T.81 magnitude category + appended bits for a DC diff / AC value."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


class _BitReader:
    """MSB-first reader over a destuffed entropy segment (numpy bit
    array), giving O(1) amortized per-bit access."""

    def __init__(self, segment: bytes) -> None:
        self.bits = np.unpackbits(np.frombuffer(segment, dtype=np.uint8))
        self.pos = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.bits):
            raise ValueError("truncated JPEG entropy segment")
        b = int(self.bits[self.pos])
        self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        if self.pos + n > len(self.bits):
            raise ValueError("truncated JPEG entropy segment")
        v = 0
        for b in self.bits[self.pos : self.pos + n]:
            v = (v << 1) | int(b)
        self.pos += n
        return v

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _extend(bits: int, size: int) -> int:
    """T.81 EXTEND: appended bits -> signed value."""
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


# ---------------------------------------------------------------- encoder

_SUBSAMPLING = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}


def encode_jpeg(
    rgb: np.ndarray,
    quality: int = 85,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode H×W×3 uint8 RGB (or H×W grayscale) as baseline JPEG.

    Deterministic fixture synthesis: Annex-K tables scaled by
    ``quality``, standard Huffman tables, optional 4:2:2 / 4:2:0
    chroma subsampling (box mean, exact integer ``(sum+n/2)//n``) and
    restart intervals every ``restart_interval`` MCUs."""
    rgb = np.asarray(rgb, dtype=np.uint8)
    gray = rgb.ndim == 2
    h, w = rgb.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    qy, qc = quant_tables(quality)
    hs, vs = (1, 1) if gray else _SUBSAMPLING[subsampling]

    if gray:
        planes = [rgb.astype(np.int64)]
        factors = [(1, 1)]
        qtab = [qy]
    else:
        ycc = rgb_to_ycbcr(rgb).astype(np.int64)
        ypl = ycc[..., 0]
        cb, cr = ycc[..., 1], ycc[..., 2]
        if (hs, vs) != (1, 1):
            cbp = _pad_replicate(cb, vs, hs).astype(np.int64)
            crp = _pad_replicate(cr, vs, hs).astype(np.int64)
            ph, pw = cbp.shape
            # exact integer box mean, half-up
            def box(p: np.ndarray) -> np.ndarray:
                s = p.reshape(ph // vs, vs, pw // hs, hs).sum(axis=(1, 3))
                return (s + (vs * hs) // 2) // (vs * hs)
            cb, cr = box(cbp), box(crp)
        planes = [ypl, cb, cr]
        factors = [(hs, vs), (1, 1), (1, 1)]
        qtab = [qy, qc, qc]

    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-w // mcu_w)
    mcus_y = -(-h // mcu_h)

    # per-component block grids, padded to the MCU coverage
    comp_blocks = []
    for plane, (fh, fv), qt in zip(planes, factors, qtab):
        tw, th = mcus_x * 8 * fh, mcus_y * 8 * fv
        p = plane
        p = np.pad(
            p,
            ((0, th - p.shape[0]), (0, tw - p.shape[1])),
            mode="edge",
        )
        blocks = _to_blocks(p.astype(np.float64) - 128.0)
        coeffs = _fdct_blocks(blocks)
        q = _round_half_up(coeffs / qt[None, :, :]).astype(np.int64)
        comp_blocks.append((q, tw // 8, fh, fv))

    # Huffman tables
    enc_dc = [_build_encode_table(_DC_LUMA_BITS, _DC_LUMA_VALS),
              _build_encode_table(_DC_CHROMA_BITS, _DC_CHROMA_VALS)]
    enc_ac = [_build_encode_table(_AC_LUMA_BITS, _AC_LUMA_VALS),
              _build_encode_table(_AC_CHROMA_BITS, _AC_CHROMA_VALS)]

    bw = _BitWriter()
    pred = [0] * len(planes)
    flat_zz = [q.reshape(-1, 64)[:, ZIGZAG] for q, *_ in comp_blocks]
    segments: list[bytes] = []
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                segments.append(bytes(bw.out))
                bw = _BitWriter()
                pred = [0] * len(planes)
            for ci, (q, bw_blocks, fh, fv) in enumerate(comp_blocks):
                tsel = 0 if ci == 0 else 1
                dct_t, act_t = enc_dc[tsel], enc_ac[tsel]
                for by in range(fv):
                    for bx in range(fh):
                        bix = (my * fv + by) * bw_blocks + (mx * fh + bx)
                        zz = flat_zz[ci][bix]
                        diff = int(zz[0]) - pred[ci]
                        pred[ci] = int(zz[0])
                        size, bits = _magnitude(diff)
                        code, ln = dct_t[size]
                        bw.write(code, ln)
                        if size:
                            bw.write(bits, size)
                        run = 0
                        nz = np.nonzero(zz[1:])[0]
                        last = nz[-1] + 1 if len(nz) else 0
                        for k in range(1, last + 1):
                            v = int(zz[k])
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                code, ln = act_t[0xF0]  # ZRL
                                bw.write(code, ln)
                                run -= 16
                            size, bits = _magnitude(v)
                            code, ln = act_t[(run << 4) | size]
                            bw.write(code, ln)
                            bw.write(bits, size)
                            run = 0
                        if last < 63:
                            code, ln = act_t[0x00]  # EOB
                            bw.write(code, ln)
            mcu_count += 1
    bw.flush()
    segments.append(bytes(bw.out))

    # ---- markers
    def marker(m: int, body: bytes) -> bytes:
        return struct.pack(">HH", 0xFF00 | m, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += marker(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += marker(0xDB, b"\x00" + qy.reshape(-1)[ZIGZAG].astype(np.uint8).tobytes())
    if not gray:
        out += marker(
            0xDB, b"\x01" + qc.reshape(-1)[ZIGZAG].astype(np.uint8).tobytes()
        )
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        fh, fv = factors[ci]
        sof += struct.pack("BBB", ci + 1, (fh << 4) | fv, 0 if ci == 0 else 1)
    out += marker(0xC0, sof)
    for cls, tid, bits, vals in (
        (0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS),
        (1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS),
        (0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
        (1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS),
    ):
        if gray and tid == 1:
            continue
        out += marker(
            0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
        )
    if restart_interval:
        out += marker(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        tsel = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (tsel << 4) | tsel])
    sos += b"\x00\x3f\x00"
    out += marker(0xDA, sos)
    for i, seg in enumerate(segments):
        if i:
            out += bytes([0xFF, 0xD0 + ((i - 1) % 8)])
        out += seg
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------- decoder


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline JPEG to H×W×3 uint8 RGB (grayscale replicated
    across channels). Raises ``ValueError`` naming the limit for
    progressive / arithmetic / 12-bit / non-interleaved files."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    scan = None
    n = len(data)

    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        m = data[pos + 1]
        if m == 0xFF:  # T.81 B.1.1.2: optional fill bytes before a marker
            pos += 1
            continue
        if m == 0xD9:  # EOI
            break
        if m == 0x01 or 0xD0 <= m <= 0xD7:
            pos += 2
            continue
        seglen = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
        body = data[pos + 4 : pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if m == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quantization tables not supported")
                zz = np.frombuffer(body, dtype=np.uint8, count=64, offset=i + 1)
                nat = np.empty(64, dtype=np.int64)
                nat[ZIGZAG] = zz
                qtables[tq] = nat.reshape(8, 8)
                i += 65
        elif m == 0xC4:  # DHT
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                nvals = sum(bits)
                vals = list(body[i + 17 : i + 17 + nvals])
                tbl = _build_decode_table(bits, vals)
                (dc_tables if cls == 0 else ac_tables)[tid] = tbl
                i += 17 + nvals
        elif m in (0xC0, 0xC1):  # SOF0/1 baseline
            prec, fh, fw, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision JPEG supported")
            comps = []
            for ci in range(ncomp):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (fh, fw, comps)
        elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG frame type SOF{m - 0xC0} "
                "(only baseline sequential SOF0/SOF1)"
            )
        elif m == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif m == 0xDA:  # SOS
            ns = body[0]
            comp_sel = []
            for ci in range(ns):
                cs, t = body[1 + 2 * ci], body[2 + 2 * ci]
                comp_sel.append((cs, t >> 4, t & 0x0F))
            scan_start = pos + 2 + seglen
            scan = (comp_sel, scan_start)
            break
        pos += 2 + seglen

    if frame is None or scan is None:
        raise ValueError("missing SOF/SOS in JPEG")
    fh, fw, comps = frame
    comp_sel, scan_start = scan
    if len(comp_sel) != len(comps):
        raise ValueError("non-interleaved multi-scan JPEG not supported")
    if len(comps) == 1:
        # T.81 A.2.3: a one-component scan is non-interleaved — its MCU
        # is exactly ONE data unit regardless of declared sampling
        # factors (grayscale files converted from 4:2:0 color keep the
        # 2x2 luma factors). Normalizing to 1x1 yields the correct
        # block raster: ceil(fw/8) x ceil(fh/8), one block per MCU.
        comps = [(comps[0][0], 1, 1, comps[0][3])]

    # split the entropy stream on restart markers, destuff FF00
    segments: list[bytes] = []
    i = scan_start
    seg_lo = i
    while i + 1 < n:
        if data[i] == 0xFF:
            b2 = data[i + 1]
            if b2 == 0x00:
                i += 2
                continue
            if 0xD0 <= b2 <= 0xD7:
                segments.append(data[seg_lo:i].replace(b"\xff\x00", b"\xff"))
                i += 2
                seg_lo = i
                continue
            segments.append(data[seg_lo:i].replace(b"\xff\x00", b"\xff"))
            seg_lo = None
            break
        i += 1
    if seg_lo is not None:
        segments.append(data[seg_lo:].replace(b"\xff\x00", b"\xff"))

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-fw // (8 * hmax))
    mcus_y = -(-fh // (8 * vmax))

    # block grids: mcus_y*cv rows x mcus_x*ch cols of 8x8 blocks
    grids = [
        np.zeros((mcus_y * cv, mcus_x * ch, 8, 8), dtype=np.int64)
        for _, ch, cv, _ in comps
    ]

    table_sel = {cs: (dsel, asel) for cs, dsel, asel in comp_sel}

    seg_ix = 0
    reader = _BitReader(segments[0]) if segments else None
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if (
                restart_interval
                and mcu_count
                and mcu_count % restart_interval == 0
            ):
                seg_ix += 1
                if seg_ix >= len(segments):
                    raise ValueError("missing JPEG restart segment")
                reader = _BitReader(segments[seg_ix])
                pred = [0] * len(comps)
            if reader is None:
                raise ValueError("empty JPEG scan")
            for ci, (cid, ch, cv, tq) in enumerate(comps):
                dsel, asel = table_sel[cid]
                try:
                    dct = dc_tables[dsel]
                    act = ac_tables[asel] if asel in ac_tables else None
                except KeyError:
                    raise ValueError("JPEG scan references missing DC table")
                if act is None:
                    raise ValueError("JPEG scan references missing AC table")
                for by in range(cv):
                    for bx in range(ch):
                        zz = np.zeros(64, dtype=np.int64)
                        size = reader.decode_symbol(dct)
                        diff = _extend(reader.read_bits(size), size)
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = reader.decode_symbol(act)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC run past block end")
                            zz[k] = _extend(reader.read_bits(s), s)
                            k += 1
                        nat = np.zeros(64, dtype=np.int64)
                        nat[ZIGZAG] = zz
                        grids[ci][my * cv + by, mx * ch + bx] = nat.reshape(8, 8)
            mcu_count += 1

    # dequantize + IDCT + assemble per component
    planes = []
    for ci, (cid, ch, cv, tq) in enumerate(comps):
        if tq not in qtables:
            raise ValueError("JPEG component references missing DQT table")
        g = grids[ci]
        rows, cols = g.shape[0], g.shape[1]
        blocks = g.reshape(-1, 8, 8) * qtables[tq][None, :, :]
        px = _idct_blocks(blocks) + 128.0
        px = np.clip(_round_half_up(px), 0, 255).astype(np.uint8)
        plane = _from_blocks(px, rows * 8, cols * 8)
        # upsample to full MCU-resolution grid
        ry, rx = vmax // cv, hmax // ch
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:fh, :fw])

    if len(planes) == 1:
        return np.repeat(planes[0][:, :, None], 3, axis=2)
    ycc = np.stack(planes, axis=-1)
    return ycbcr_to_rgb(ycc)


# ------------------------------------------------- closed-form DC oracle


def constant_color_roundtrip(
    r: int, g: int, b: int, quality: int = 85
) -> tuple[int, int, int]:
    """The closed-form value a constant-(r,g,b) image decodes to after
    an encode/decode round trip at ``quality`` (4:4:4 or any chroma
    subsampling — a constant plane box-means to itself). Mirrors the
    exact float64 expression chain the codec evaluates; the driver
    row's DuckDB oracle states the same chain in SQL. Kept in sync by
    tests/test_multimodal.py's pixel-identity check."""
    qy, qc = quant_tables(quality)

    def q_rt(v: int, q00: int) -> int:
        s00 = float(8 * (v - 128))          # exact DC of a constant block
        dcq = np.floor(s00 / q00 + 0.5)     # encoder quantize
        rec = dcq * q00                     # decoder dequantize
        return int(np.clip(np.floor(rec / 8.0 + 128.0 + 0.5), 0, 255))

    y = int(np.clip(np.floor(0.299 * r + 0.587 * g + 0.114 * b + 0.5), 0, 255))
    cb = int(np.clip(np.floor(
        -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0 + 0.5), 0, 255))
    cr = int(np.clip(np.floor(
        0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0 + 0.5), 0, 255))
    y2 = q_rt(y, int(qy[0, 0]))
    cb2 = q_rt(cb, int(qc[0, 0]))
    cr2 = q_rt(cr, int(qc[0, 0]))
    r2 = int(np.clip(np.floor(y2 + 1.402 * (cr2 - 128) + 0.5), 0, 255))
    g2 = int(np.clip(np.floor(
        y2 - 0.344136286 * (cb2 - 128) - 0.714136286 * (cr2 - 128) + 0.5), 0, 255))
    b2 = int(np.clip(np.floor(y2 + 1.772 * (cb2 - 128) + 0.5), 0, 255))
    return r2, g2, b2
