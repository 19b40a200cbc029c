"""GIF87a/89a codec in pure numpy — no image library.

Closes the last named image-format gap ("GIF needs Pillow") with a
from-scratch decoder for GIF's real compression, LZW with variable
code width:

* ``decode_gif``: header + logical-screen parse, global/local color
  tables, extension-block walk (graphic control, comment,
  application — sub-blocks skipped per spec), image descriptors with
  sub-rectangle placement, Adam-style 4-pass interlace reorder, LZW
  decode (LSB-first bit stream across data sub-blocks, clear/EOI
  codes, code-width growth to 12 bits, full-table deferred-clear
  tolerance), frame compositing with transparency and disposal
  methods 0-3. Returns every composited frame — an animated GIF is a
  tiny video, and ``extract_video_features`` treats it as one.
  Malformed/truncated input raises a clean ``ValueError`` at the
  exact failure point — loud, never a silent fake.
* ``encode_gif``: the fixture synthesizer — real LZW encoder (same
  width-growth rule, emits CLEAR when the table fills), optional
  interlace, per-frame local palettes, transparency, disposal,
  sub-rect frames. Exists so tests and oracle rows can synthesize
  deterministic fixtures; the decoder is additionally pinned against
  a HAND-COMPUTED byte fixture in tests/test_multimodal.py so a
  co-designed encode/decode bug cannot cancel out.

GIF is lossless: the oracled driver row (``image_decode_gif``)
synthesizes patterned frames whose palette indices follow a closed
form, so DuckDB recomputes the exact per-channel pixel sums the
decoder must produce — the hash match proves the LZW entropy decode,
the interlace reorder, and the compositing chain byte-for-byte.

Reference analog: none — the reference engine (asavinov/lambdo) has
no media path; this extends the multimodal column family
(SURVEY.md §2.4).
"""

from __future__ import annotations

import struct

import numpy as np

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(h: int) -> np.ndarray:
    """Row output order for an interlaced image: pass p writes rows
    start::step in stream order."""
    return np.concatenate(
        [np.arange(start, h, step) for start, step in _INTERLACE_PASSES]
    ).astype(np.int64)


# ---------------------------------------------------------------- LZW

_MAX_CODE_WIDTH = 12
_TABLE_CAP = 1 << _MAX_CODE_WIDTH


def lzw_decode(mcs: int, data: bytes, n_pixels: int) -> np.ndarray:
    """GIF-variant LZW decode: ``mcs`` is the LZW minimum code size
    byte, ``data`` the concatenated sub-block payload. Returns exactly
    ``n_pixels`` uint8 palette indices; raises ValueError on a corrupt
    stream (bad code, truncation before EOI/raster completion)."""
    if not 2 <= mcs <= 11:
        raise ValueError(f"bad LZW minimum code size {mcs}")
    clear = 1 << mcs
    eoi = clear + 1
    base = [bytes((i,)) for i in range(clear)]
    table: list[bytes] = []
    width = mcs + 1
    out = bytearray()
    prev: int | None = None

    bits = np.unpackbits(
        np.frombuffer(data, dtype=np.uint8), bitorder="little"
    )
    nbits = len(bits)
    pos = 0
    while True:
        if pos + width > nbits:
            raise ValueError("truncated LZW stream (ran out of bits before EOI)")
        code = int(bits[pos : pos + width] @ (1 << np.arange(width, dtype=np.int64)))
        pos += width
        if code == clear:
            table = list(base) + [b"", b""]  # clear + eoi placeholders
            width = mcs + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if not table:  # stream may legally omit a leading CLEAR
                table = list(base) + [b"", b""]
            if code >= clear:
                raise ValueError(f"LZW code {code} before any table entry")
            out += table[code]
            prev = code
            continue
        if code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = table[prev] + table[prev][:1]
        else:
            raise ValueError(f"LZW code {code} beyond table size {len(table)}")
        out += entry
        if len(table) < _TABLE_CAP:
            table.append(table[prev] + entry[:1])
            if len(table) == (1 << width) and width < _MAX_CODE_WIDTH:
                width += 1
        prev = code
        if len(out) >= n_pixels:
            break
    if len(out) < n_pixels:
        raise ValueError(
            f"LZW stream ended at {len(out)} of {n_pixels} raster pixels"
        )
    return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)


def lzw_encode(mcs: int, indices: np.ndarray) -> bytes:
    """GIF-variant LZW encode of uint8 palette indices (fixture
    synthesis; emits CLEAR whenever the table fills)."""
    clear = 1 << mcs
    eoi = clear + 1
    out_bits = bytearray()  # one bit per entry; packed at the end
    width = mcs + 1

    def emit(code: int, w: int) -> None:
        for i in range(w):
            out_bits.append((code >> i) & 1)

    table: dict[bytes, int] = {bytes((i,)): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear, width)
    s = b""
    for ix in bytes(indices.astype(np.uint8).tobytes()):
        c = bytes((ix,))
        if s + c in table:
            s += c
            continue
        emit(table[s], width)
        if next_code < _TABLE_CAP:
            table[s + c] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < _MAX_CODE_WIDTH:
                width += 1
        else:  # table full: reset, mirroring the decoder's rebuild
            emit(clear, width)
            table = {bytes((i,)): i for i in range(clear)}
            next_code = eoi + 1
            width = mcs + 1
        s = c
    if s:
        emit(table[s], width)
    emit(eoi, width)
    packed = np.packbits(
        np.frombuffer(bytes(out_bits), dtype=np.uint8), bitorder="little"
    ).tobytes()
    return packed


# ---------------------------------------------------------------- encode


def _color_table_field(n_colors: int) -> int:
    """Size field f with 2^(f+1) >= n_colors (GIF tables are padded to
    a power of two)."""
    f = 0
    while (2 << f) < n_colors:
        f += 1
    return f


def _pad_palette(palette: np.ndarray, f: int) -> bytes:
    pal = np.zeros((2 << f, 3), dtype=np.uint8)
    pal[: len(palette)] = np.asarray(palette, dtype=np.uint8)
    return pal.tobytes()


def encode_gif(
    frames,
    palette,
    *,
    local_palettes=None,
    interlace: bool = False,
    transparent: int | None = None,
    disposals=None,
    delays_cs=None,
    offsets=None,
    bg_index: int = 0,
    version: bytes = b"89a",
) -> bytes:
    """Encode palette-index frames as a valid GIF.

    ``frames``: list of (h, w) uint8 index arrays (full logical screen
    unless ``offsets`` gives per-frame (left, top) for sub-rects — the
    logical screen is then the max extent). ``palette``: n×3 uint8
    global color table. ``local_palettes``: optional per-frame n×3
    table (or None to use the global). ``transparent``: palette index
    rendered as see-through (emitted in a per-frame GCE).
    ``disposals``: per-frame disposal method 0-3.
    """
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    n = len(frames)
    offsets = offsets or [(0, 0)] * n
    disposals = disposals or [1] * n
    delays_cs = delays_cs or [10] * n
    local_palettes = local_palettes or [None] * n
    sw = max(ox + f.shape[1] for f, (ox, oy) in zip(frames, offsets))
    sh = max(oy + f.shape[0] for f, (ox, oy) in zip(frames, offsets))

    gf = _color_table_field(len(palette))
    out = bytearray(b"GIF" + version)
    packed = 0x80 | (7 << 4) | gf  # GCT present, 8-bit color resolution
    out += struct.pack("<HHBBB", sw, sh, packed, bg_index, 0)
    out += _pad_palette(palette, gf)

    for f, (ox, oy), disp, delay, lpal in zip(
        frames, offsets, disposals, delays_cs, local_palettes
    ):
        h, w = f.shape
        if version == b"89a":
            gce_packed = (disp & 7) << 2
            tix = 0
            if transparent is not None:
                gce_packed |= 1
                tix = transparent
            out += b"\x21\xf9\x04" + struct.pack("<BHB", gce_packed, delay, tix)
            out += b"\x00"
        ipacked = 0
        pal_here = palette
        if lpal is not None:
            lf = _color_table_field(len(lpal))
            ipacked |= 0x80 | lf
            pal_here = lpal
        if interlace:
            ipacked |= 0x40
        out += b"\x2c" + struct.pack("<HHHHB", ox, oy, w, h, ipacked)
        if lpal is not None:
            out += _pad_palette(lpal, _color_table_field(len(lpal)))
        mcs = max(2, _color_table_field(len(pal_here)) + 1)
        ix = f[_interlace_order(h)] if interlace else f
        lzw = lzw_encode(mcs, ix.reshape(-1))
        out.append(mcs)
        for i in range(0, len(lzw), 255):
            block = lzw[i : i + 255]
            out.append(len(block))
            out += block
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


# ---------------------------------------------------------------- decode


def decode_gif(data: bytes) -> np.ndarray:
    """Decode a GIF to composited frames, N×H×W×3 uint8 RGB over the
    logical screen (N=1 for a still image).

    Compositing: the canvas starts at the background color (or black
    when there is no global table entry); each image renders at its
    (left, top) sub-rect, transparent pixels leaving the canvas
    untouched; disposal 2 restores the sub-rect to background after
    the frame is snapshotted, disposal 3 restores the prior canvas.
    """
    if len(data) < 13 or data[:4] != b"GIF8" or data[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF: bad signature")
    sw, sh, packed, bg_index, _aspect = struct.unpack("<HHBBB", data[6:13])
    if sw == 0 or sh == 0:
        raise ValueError("zero-dimension GIF logical screen")
    pos = 13
    gct = None
    if packed & 0x80:
        ncol = 2 << (packed & 7)
        end = pos + 3 * ncol
        if end > len(data):
            raise ValueError("truncated GIF: global color table cut short")
        gct = np.frombuffer(data[pos:end], dtype=np.uint8).reshape(-1, 3)
        pos = end

    bg_rgb = (
        gct[bg_index] if gct is not None and bg_index < len(gct)
        else np.zeros(3, dtype=np.uint8)
    )
    canvas = np.broadcast_to(bg_rgb, (sh, sw, 3)).copy()
    frames: list[np.ndarray] = []
    transparent: int | None = None
    disposal = 0

    def sub_blocks(p: int) -> tuple[bytes, int]:
        chunks = []
        while True:
            if p >= len(data):
                raise ValueError("truncated GIF: unterminated sub-block chain")
            ln = data[p]
            p += 1
            if ln == 0:
                return b"".join(chunks), p
            if p + ln > len(data):
                raise ValueError("truncated GIF: sub-block cut short")
            chunks.append(data[p : p + ln])
            p += ln

    while True:
        if pos >= len(data):
            raise ValueError("truncated GIF: no trailer")
        intro = data[pos]
        pos += 1
        if intro == 0x3B:  # trailer
            break
        if intro == 0x21:  # extension
            if pos >= len(data):
                raise ValueError("truncated GIF: extension label cut short")
            label = data[pos]
            pos += 1
            body, pos = sub_blocks(pos)
            if label == 0xF9:  # graphic control
                if len(body) < 4:
                    raise ValueError("malformed graphic control extension")
                gpacked, _delay, tix = struct.unpack("<BHB", body[:4])
                disposal = (gpacked >> 2) & 7
                transparent = tix if gpacked & 1 else None
            continue
        if intro != 0x2C:
            raise ValueError(f"unknown GIF block introducer 0x{intro:02x}")
        if pos + 9 > len(data):
            raise ValueError("truncated GIF: image descriptor cut short")
        left, top, w, h, ipacked = struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        if w == 0 or h == 0 or left + w > sw or top + h > sh:
            raise ValueError("GIF image rect outside the logical screen")
        pal = gct
        if ipacked & 0x80:
            ncol = 2 << (ipacked & 7)
            end = pos + 3 * ncol
            if end > len(data):
                raise ValueError("truncated GIF: local color table cut short")
            pal = np.frombuffer(data[pos:end], dtype=np.uint8).reshape(-1, 3)
            pos = end
        if pal is None:
            raise ValueError("GIF image has neither local nor global color table")
        if pos >= len(data):
            raise ValueError("truncated GIF: missing LZW minimum code size")
        mcs = data[pos]
        pos += 1
        lzw, pos = sub_blocks(pos)
        ix = lzw_decode(mcs, lzw, w * h).reshape(h, w)
        if ipacked & 0x40:  # interlaced: stream rows land at pass order
            deinterlaced = np.empty_like(ix)
            deinterlaced[_interlace_order(h)] = ix
            ix = deinterlaced
        if int(ix.max(initial=0)) >= len(pal):
            raise ValueError("GIF pixel index beyond color table")
        saved = canvas[top : top + h, left : left + w].copy()
        rgb = pal[ix]
        if transparent is not None:
            mask = ix != transparent
            region = canvas[top : top + h, left : left + w]
            region[mask] = rgb[mask]
        else:
            canvas[top : top + h, left : left + w] = rgb
        frames.append(canvas.copy())
        if disposal == 2:
            canvas[top : top + h, left : left + w] = bg_rgb
        elif disposal == 3:
            canvas[top : top + h, left : left + w] = saved
        transparent = None  # a GCE scopes to the one image that follows
        disposal = 0
    if not frames:
        raise ValueError("GIF contains no image data")
    return np.stack(frames)
