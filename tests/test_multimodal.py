"""Multimodal plumbing: real Spark mechanics, stubbed decode."""

import pytest
from hypothesis import given, settings, strategies as st

from lambdo_spark.functions.multimodal import (
    FEATURE_DIM,
    decode_image,
    extract_media_features,
    fake_features,
)
from lambdo_spark.sources.pages import generate_pages


def test_decode_is_an_explicit_stub():
    # WebP has no pure-numpy decoder here (PPM/BMP/PNG/JPEG/GIF do):
    # needs Pillow, loudly.
    with pytest.raises(NotImplementedError):
        decode_image(b"RIFF\x00\x00\x00\x00WEBPVP8 " + b"\x00" * 16)
    # truncated GIF fails loudly in the decoder, not the stub
    with pytest.raises(ValueError):
        decode_image(b"GIF89a" + b"\x00" * 16)
    # truncated JPEG fails loudly too — in the decoder, not the stub
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 16)


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


def _ppm_bytes(w, h):
    """Tiny real P6 PPM: pixel (x,y) = (x*16 % 256, y*16 % 256, 128)."""
    import numpy as np

    a = np.zeros((h, w, 3), dtype=np.uint8)
    a[..., 0] = (np.arange(w)[None, :] * 16) % 256
    a[..., 1] = (np.arange(h)[:, None] * 16) % 256
    a[..., 2] = 128
    return b"P6\n# test\n%d %d\n255\n" % (w, h) + a.tobytes(), a


def test_decode_image_ppm_pure_numpy():
    """Real decode with zero image libs: binary PPM (P6) through the
    numpy parser — dims and pixels exact."""
    import numpy as np

    from lambdo_spark.functions.multimodal import decode_image

    data, want = _ppm_bytes(5, 3)
    got = decode_image(data)
    assert got.shape == (3, 5, 3)
    assert np.array_equal(got, want)


def test_media_features_real_decoder_ppm(spark):
    """decoder="real" through the SAME mapInPandas plumbing: real
    dimensions and channel-stat features from an actual decoded image
    (PPM needs no Pillow; PNG/JPEG take the same path when PIL
    exists)."""
    import numpy as np

    from lambdo_spark.functions.multimodal import (
        extract_media_features,
        real_features,
    )

    d1, _ = _ppm_bytes(8, 4)
    d2, _ = _ppm_bytes(3, 7)
    df = spark.createDataFrame(
        [("a", bytearray(d1)), ("b", bytearray(d2))], "url string, html binary"
    )
    out = (
        extract_media_features(df, "url", "html", decoder="real")
        .toPandas().set_index("media_id").sort_index()
    )
    assert out.loc["a", "width"] == 8 and out.loc["a", "height"] == 4
    assert out.loc["b", "width"] == 3 and out.loc["b", "height"] == 7
    np.testing.assert_allclose(
        np.array(out.loc["a", "features"]), real_features(d1), rtol=1e-6
    )


def _hand_rolled_png_1x1_red() -> bytes:
    """A 1x1 red PNG assembled chunk-by-chunk with stdlib only — an
    encoder-independent fixture for decode_png (the library encoder is
    never touched here)."""
    import struct
    import zlib

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 0)
    idat = zlib.compress(b"\x00\xff\x00\x00")  # filter 0 + RGB red
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def test_media_features_real_decoder_png(spark):
    """PNG through decoder="real": decodes in pure numpy + stdlib zlib
    (no Pillow) through the same mapInPandas plumbing. The historical
    Pillow-needed fixture here was actually CORRUPT (bad IDAT CRC and
    adler32) — it only ever exercised the pre-parse NotImplementedError
    — so this hand-rolled replacement is CRC-valid by construction."""
    import numpy as np

    from lambdo_spark.functions.multimodal import decode_image, extract_media_features

    png = _hand_rolled_png_1x1_red()
    assert np.array_equal(decode_image(png), [[[255, 0, 0]]])
    df = spark.createDataFrame([("p", bytearray(png))], "url string, html binary")
    row = (
        extract_media_features(df, "url", "html", decoder="real").toPandas().iloc[0]
    )
    assert (row["width"], row["height"]) == (1, 1)
    np.testing.assert_allclose(row["features"][:3], [1.0, 0.0, 0.0])


def test_resize_image_real_decoder_ppm(spark):
    """decoder="real": nearest-neighbor resample of the decoded PPM —
    output is raw RGB target_w·target_h·3 bytes, pixel-exact vs the
    numpy reference."""
    import numpy as np

    from lambdo_spark.functions.multimodal import resize_image

    data, a = _ppm_bytes(8, 6)
    df = spark.createDataFrame([("a", bytearray(data))], "url string, html binary")
    out = resize_image(df, "url", "html", target_w=4, target_h=3,
                       decoder="real").toPandas().iloc[0]
    yi = (np.arange(3) * 6) // 3
    xi = (np.arange(4) * 8) // 4
    assert bytes(out["resized"]) == a[yi][:, xi].tobytes()


def test_wav_roundtrip_and_chunk_walk(spark):
    import numpy as np
    import struct as _struct

    from lambdo_spark.functions.multimodal import decode_wav, encode_wav_pcm16

    s = ((np.arange(1000) * 17 + 31) % 65536 - 32768).astype(np.int16)
    sr, ch, fr = decode_wav(encode_wav_pcm16(s, 16000))
    assert (sr, ch) == (16000, 1) and np.array_equal(fr, s)
    # stereo + a foreign LIST chunk before fmt: the chunk walk skips it
    st = np.stack([s, -s], axis=1).reshape(-1).astype(np.int16)
    blob = encode_wav_pcm16(st, 8000, channels=2)
    blob = blob[:12] + b"LIST" + _struct.pack("<I", 4) + b"INFO" + blob[12:]
    sr2, ch2, fr2 = decode_wav(blob)
    assert (sr2, ch2, fr2.shape) == (8000, 2, (1000, 2))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"not audio at all")


def test_extract_audio_features(spark):
    import numpy as np

    from lambdo_spark.functions.multimodal import (
        encode_wav_pcm16,
        extract_audio_features,
    )

    rows = []
    for d in (1, 2):
        n = 100 * d
        s = ((np.arange(n) * 3 + d) % 200 - 100).astype(np.int16)
        rows.append((d, bytearray(encode_wav_pcm16(s, 16000))))
    df = spark.createDataFrame(rows, "doc_id long, audio binary")
    got = {
        r["media_id"]: r
        for r in extract_audio_features(df).collect()
    }
    for d in (1, 2):
        n = 100 * d
        s = ((np.arange(n) * 3 + d) % 200 - 100).astype(np.int64)
        r = got[str(d)]
        assert r["n_samples"] == n
        assert r["duration_ms"] == n * 1000 // 16000
        assert r["abs_sum"] == int(np.abs(s).sum())
        assert r["peak"] == int(np.abs(s).max())


def test_bmp_decode_pure_numpy(spark):
    """Uncompressed 24-bit BMP: bottom-up rows, 4-byte padding, BGR
    order — decoded without PIL and identical to the known pixels."""
    import struct as _struct

    import numpy as np

    from lambdo_spark.functions.multimodal import decode_image

    # 3x2 RGB image with distinct pixels
    rgb = np.arange(3 * 2 * 3, dtype=np.uint8).reshape(2, 3, 3)
    w, h, nch = 3, 2, 3
    stride = (w * nch + 3) & ~3
    raster = bytearray()
    for row in rgb[::-1]:            # bottom-up
        line = bytearray()
        for px in row:
            line += bytes([px[2], px[1], px[0]])  # BGR
        line += b"\x00" * (stride - len(line))
        raster += line
    hdr = (
        b"BM" + _struct.pack("<IHHI", 54 + len(raster), 0, 0, 54)
        + _struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster),
                        2835, 2835, 0, 0)
    )
    out = decode_image(bytes(hdr) + bytes(raster))
    assert np.array_equal(out, rgb)
    # top-down variant (negative height)
    hdr2 = (
        b"BM" + _struct.pack("<IHHI", 54 + len(raster), 0, 0, 54)
        + _struct.pack("<IiiHHIIiiII", 40, w, -h, 1, 24, 0, len(raster),
                        2835, 2835, 0, 0)
    )
    raster_td = bytearray()
    for row in rgb:                  # top-down storage
        line = bytearray()
        for px in row:
            line += bytes([px[2], px[1], px[0]])
        line += b"\x00" * (stride - len(line))
        raster_td += line
    assert np.array_equal(decode_image(bytes(hdr2) + bytes(raster_td)), rgb)


def test_avi_roundtrip_and_features(spark):
    import numpy as np

    from lambdo_spark.functions.multimodal import (
        decode_avi_rgb,
        encode_avi_rgb,
        extract_video_features,
    )

    fr = (np.arange(3 * 4 * 6 * 3, dtype=np.int64) * 29 % 256).astype(
        np.uint8
    ).reshape(3, 4, 6, 3)
    back = decode_avi_rgb(encode_avi_rgb(fr))
    assert np.array_equal(back, fr)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="AVI"):
        decode_avi_rgb(b"RIFFxxxxWAVE")

    df = spark.createDataFrame(
        [(7, bytearray(encode_avi_rgb(fr)))], "doc_id long, video binary"
    )
    r = extract_video_features(df).collect()[0]
    assert (r["n_frames"], r["height"], r["width"]) == (3, 4, 6)
    assert r["frame_bytes"] == fr.nbytes
    assert r["px_sum"] == int(fr.astype(np.int64).sum())


def test_truncated_media_raises_value_error(spark):
    """Corrupt/truncated blobs fail with a clean ValueError at every
    cut point — never a leaked struct.error — so a production decode
    stage can catch one exception type."""
    import numpy as np
    import pytest as _pytest

    from lambdo_spark.functions.multimodal import (
        decode_avi_rgb,
        decode_wav,
        encode_avi_rgb,
        encode_wav_pcm16,
    )

    wav = encode_wav_pcm16(np.arange(100, dtype=np.int16), 16000)
    for cut in range(12, len(wav), 7):
        with _pytest.raises(ValueError):
            decode_wav(wav[:cut])
    fr = (np.arange(2 * 4 * 6 * 3) % 256).astype(np.uint8).reshape(2, 4, 6, 3)
    avi = encode_avi_rgb(fr)
    for cut in range(12, len(avi), 13):
        with _pytest.raises(ValueError):
            decode_avi_rgb(avi[:cut])


# ---------------------------------------------------------------------------
# PNG: real compressed codec (stdlib zlib + numpy), no image libs.
# ---------------------------------------------------------------------------


def test_png_roundtrip_every_color_type_and_filter():
    """encode→decode byte-exact for gray/palette/gray+alpha/RGB/RGBA
    across every scanline filter (0-4 uniform + mixed) — covers all
    five defilter paths including the sequential Average/Paeth ones."""
    import numpy as np

    from lambdo_spark.functions.multimodal import decode_png, encode_png

    rng = np.random.default_rng(7)
    cases = [((6, 9), False), ((6, 9), True), ((5, 7, 2), False),
             ((6, 9, 3), False), ((4, 11, 4), False)]
    for shape, use_palette in cases:
        for ft in [0, 1, 2, 3, 4, "mixed"]:
            if use_palette:
                palette = rng.integers(0, 256, (16, 3), dtype=np.uint8)
                a = rng.integers(0, 16, shape, dtype=np.uint8)
                want = palette[a]
                blob = encode_png(a, palette=palette, filter_type=ft)
            else:
                a = rng.integers(0, 256, shape, dtype=np.uint8)
                if a.ndim == 2:
                    want = np.repeat(a[:, :, None], 3, axis=2)
                elif a.shape[2] == 2:
                    want = np.repeat(a[:, :, :1], 3, axis=2)
                else:
                    want = a[:, :, :3]
                blob = encode_png(a, filter_type=ft)
            assert np.array_equal(decode_png(blob), want), (shape, use_palette, ft)


def test_png_multi_idat_and_dispatch():
    """IDAT may legally split into many chunks — the decoder must
    concatenate before inflating; decode_image dispatches on the
    8-byte signature."""
    import numpy as np

    from lambdo_spark.functions.multimodal import decode_image, encode_png

    a = np.random.default_rng(3).integers(0, 256, (20, 30, 3), dtype=np.uint8)
    blob = encode_png(a, filter_type="mixed", idat_split=5)
    assert blob.count(b"IDAT") == 5
    assert np.array_equal(decode_image(blob), a)


def test_png_malformed_inputs_raise_value_error():
    """Every malformation is a clean ValueError: bad signature, CRC
    flip, truncation at any chunk boundary, corrupt DEFLATE, Adam7
    interlace flag, non-8-bit depth, missing PLTE, short raster."""
    import struct
    import zlib

    import numpy as np
    import pytest as _pytest

    from lambdo_spark.functions.multimodal import decode_png, encode_png

    a = np.arange(60, dtype=np.uint8).reshape(4, 5, 3)
    good = encode_png(a, filter_type=4)

    with _pytest.raises(ValueError, match="signature"):
        decode_png(b"\x89PNX" + good[4:])
    # flip one byte inside the IDAT body -> CRC mismatch
    ix = good.index(b"IDAT") + 6
    with _pytest.raises(ValueError, match="CRC"):
        decode_png(good[:ix] + bytes([good[ix] ^ 0xFF]) + good[ix + 1:])
    for cut in range(9, len(good), 11):
        with _pytest.raises(ValueError):
            decode_png(good[:cut])

    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))

    sig = b"\x89PNG\r\n\x1a\n"

    def ihdr(w, h, depth, color, interlace):
        return chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, depth, color, 0, 0,
                                          interlace))

    end = chunk(b"IEND", b"")
    with _pytest.raises(ValueError, match="interlace"):
        decode_png(sig + ihdr(1, 1, 8, 2, 1) + end)
    with _pytest.raises(ValueError, match="bit depth"):
        decode_png(sig + ihdr(1, 1, 16, 2, 0) + end)
    # palette image without PLTE
    pal_idat = chunk(b"IDAT", zlib.compress(b"\x00\x00"))
    with _pytest.raises(ValueError, match="PLTE"):
        decode_png(sig + ihdr(1, 1, 8, 3, 0) + pal_idat + end)
    # corrupt DEFLATE stream (valid CRC, garbage body)
    bad_idat = chunk(b"IDAT", b"\x12\x34\x56\x78")
    with _pytest.raises(ValueError, match="inflate"):
        decode_png(sig + ihdr(1, 1, 8, 2, 0) + bad_idat + end)
    # raster shorter than h*(1+w*ch)
    short = chunk(b"IDAT", zlib.compress(b"\x00\x01\x02\x03"))
    with _pytest.raises(ValueError, match="shorter"):
        decode_png(sig + ihdr(5, 5, 8, 2, 0) + short + end)


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.sampled_from([1, 2, 3, 4]),
    st.sampled_from([0, 1, 2, 3, 4, "mixed"]),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_png_roundtrip_property(w, h, ch, ft, seed):
    """Property: any uint8 raster round-trips byte-exact through
    encode_png/decode_png under any filter choice."""
    import numpy as np

    from lambdo_spark.functions.multimodal import decode_png, encode_png

    rng = np.random.default_rng(seed)
    shape = (h, w) if ch == 1 else (h, w, ch)
    a = rng.integers(0, 256, shape, dtype=np.uint8)
    got = decode_png(encode_png(a, filter_type=ft))
    px = a if a.ndim == 3 else a[:, :, None]
    if ch in (1, 2):
        want = np.repeat(px[:, :, :1], 3, axis=2)
    else:
        want = px[:, :, :3]
    assert np.array_equal(got, want)


# ---------------------------------------------------------------------------
# JPEG: baseline DCT codec in pure numpy (lambdo_spark.functions.jpeg)
# and Motion-JPEG AVI ('00dc' frames) through the same decoder.
# ---------------------------------------------------------------------------


def test_jpeg_constant_color_matches_closed_form():
    """The exactness contract behind the image_decode_jpeg oracle:
    a constant-color image decodes — at every quality, subsampling
    and restart setting — to the closed-form DC-only value, uniformly
    across all pixels (every quantized AC term is exactly zero)."""
    import numpy as np

    from lambdo_spark.functions.jpeg import (
        constant_color_roundtrip,
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(42)
    for trial in range(40):
        r, g, b = (int(x) for x in rng.integers(0, 256, 3))
        q = int(rng.integers(10, 96))
        sub = ("444", "422", "420")[trial % 3]
        ri = trial % 4
        h, w = int(rng.integers(3, 21)), int(rng.integers(3, 21))
        img = np.full((h, w, 3), (r, g, b), dtype=np.uint8)
        out = decode_jpeg(
            encode_jpeg(img, quality=q, subsampling=sub, restart_interval=ri)
        )
        assert out.shape == (h, w, 3)
        uniq = np.unique(out.reshape(-1, 3), axis=0)
        assert len(uniq) == 1, (r, g, b, q, sub, ri)
        assert tuple(uniq[0]) == constant_color_roundtrip(r, g, b, quality=q)


def test_jpeg_lossy_roundtrip_bounded_and_grayscale():
    """Random rasters round-trip within a small error bound at high
    quality (lossy, but sane), grayscale replicates to 3 channels, and
    4:2:0 on odd dims crops back to the exact frame size."""
    import numpy as np

    from lambdo_spark.functions.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=95))
    assert out.shape == img.shape
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 40

    gray = rng.integers(0, 256, (17, 19), dtype=np.uint8)
    g3 = decode_jpeg(encode_jpeg(gray, quality=90))
    assert g3.shape == (17, 19, 3)
    assert np.array_equal(g3[:, :, 0], g3[:, :, 1])

    odd = rng.integers(0, 256, (9, 11, 3), dtype=np.uint8)
    assert decode_jpeg(encode_jpeg(odd, subsampling="420")).shape == (9, 11, 3)


def test_jpeg_restart_interval_changes_stream_not_pixels():
    import numpy as np

    from lambdo_spark.functions.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    plain = encode_jpeg(img, quality=80)
    rst = encode_jpeg(img, quality=80, restart_interval=2)
    assert plain != rst and b"\xff\xdd" in rst  # DRI marker present
    assert np.array_equal(decode_jpeg(plain), decode_jpeg(rst))


def test_jpeg_malformed_inputs_raise_value_error():
    """Loud failure on non-JPEG bytes, truncation at several offsets,
    and the documented scope limits (progressive SOF2)."""
    import numpy as np
    import pytest as _pytest

    from lambdo_spark.functions.jpeg import decode_jpeg, encode_jpeg

    with _pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg at all")
    good = encode_jpeg(np.full((8, 8, 3), 99, dtype=np.uint8), quality=75)
    for cut in (2, 20, len(good) // 2):
        with _pytest.raises(ValueError):
            decode_jpeg(good[:cut])
    sof0 = good.index(b"\xff\xc0")
    progressive = good[:sof0] + b"\xff\xc2" + good[sof0 + 2:]
    with _pytest.raises(ValueError, match="[Pp]rogressive|SOF"):
        decode_jpeg(progressive)


def test_avi_mjpeg_roundtrip_and_features(spark):
    """Motion-JPEG AVI: '00dc' frames decode through the pure-numpy
    JPEG path; constant frames are exact; extract_video_features sees
    the same integer features as the raw-DIB twin."""
    import numpy as np

    from lambdo_spark.functions.jpeg import constant_color_roundtrip
    from lambdo_spark.functions.multimodal import (
        decode_avi_rgb,
        encode_avi_rgb,
        extract_video_features,
    )

    const = np.full((3, 10, 14, 3), (120, 33, 200), dtype=np.uint8)
    blob = encode_avi_rgb(const, codec="mjpeg", quality=85)
    out = decode_avi_rgb(blob)
    assert out.shape == const.shape
    want = constant_color_roundtrip(120, 33, 200, quality=85)
    assert tuple(np.unique(out.reshape(-1, 3), axis=0)[0]) == want

    df = spark.createDataFrame(
        [("v", bytearray(blob))], "doc_id string, video binary"
    )
    row = extract_video_features(df).collect()[0]
    assert (row.n_frames, row.height, row.width) == (3, 10, 14)
    assert row.px_sum == 3 * 10 * 14 * sum(want)

    with __import__("pytest").raises(ValueError, match="Motion-JPEG"):
        # a structurally-valid '00dc' chunk whose payload is not JPEG
        # must fail loudly: rename a raw AVI's DIB chunks to '00dc'
        raw = encode_avi_rgb(const)  # uncompressed twin
        decode_avi_rgb(raw.replace(b"00db", b"00dc"))


def test_decode_image_dispatches_jpeg_magic():
    import numpy as np

    from lambdo_spark.functions.multimodal import decode_image
    from lambdo_spark.functions.jpeg import encode_jpeg

    img = np.full((8, 8, 3), (1, 2, 3), dtype=np.uint8)
    got = decode_image(encode_jpeg(img, quality=100))
    assert got.shape == (8, 8, 3)


# ---------------------------------------------------------------------------
# GIF: LZW codec in pure numpy (lambdo_spark.functions.gif) — the
# decoder is pinned against a HAND-COMPUTED byte fixture so a
# co-designed encode/decode bug cannot cancel out.
# ---------------------------------------------------------------------------


def test_gif_lzw_hand_fixture():
    """LZW of indices [1,1,0] at min code size 2, computed by hand:
    codes CLEAR(4),1,1,0,EOI(5) all at width 3, packed LSB-first =
    0x4C 0x50. Both directions must reproduce it exactly."""
    import numpy as np

    from lambdo_spark.functions.gif import lzw_decode, lzw_encode

    assert lzw_encode(2, np.array([1, 1, 0], dtype=np.uint8)) == bytes.fromhex(
        "4c50"
    )
    assert list(lzw_decode(2, bytes.fromhex("4c50"), 3)) == [1, 1, 0]


def test_gif_hand_assembled_file_decodes():
    """A complete one-frame GIF assembled byte-by-byte in the test
    (header, LSD, 4-color GCT, image descriptor, the hand-computed
    LZW stream above padded to 2x2) — decoder never sees encoder
    output."""
    import struct

    import numpy as np

    from lambdo_spark.functions.gif import decode_gif, lzw_encode

    pal = np.array(
        [[10, 20, 30], [200, 100, 50], [0, 0, 0], [255, 255, 255]],
        dtype=np.uint8,
    )
    lzw = lzw_encode(2, np.array([1, 1, 0, 3], dtype=np.uint8))
    blob = (
        b"GIF89a"
        + struct.pack("<HHBBB", 2, 2, 0x80 | (7 << 4) | 1, 0, 0)
        + pal.tobytes()
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 2, 0)
        + bytes([2, len(lzw)]) + lzw + b"\x00"
        + b"\x3b"
    )
    out = decode_gif(blob)
    assert out.shape == (1, 2, 2, 3)
    want = pal[np.array([[1, 1], [0, 3]])]
    assert np.array_equal(out[0], want)


def test_gif_roundtrip_single_frame_and_interlace():
    import numpy as np

    from lambdo_spark.functions.gif import decode_gif, encode_gif

    rng = np.random.default_rng(0)
    pal = rng.integers(0, 256, (8, 3)).astype(np.uint8)
    f = rng.integers(0, 8, (13, 17)).astype(np.uint8)
    for interlace in (False, True):
        out = decode_gif(encode_gif([f], pal, interlace=interlace))
        assert out.shape == (1, 13, 17, 3)
        assert np.array_equal(out[0], pal[f]), f"interlace={interlace}"


def test_gif_code_width_growth_to_12_bits_and_table_reset():
    """A 256-color noisy raster forces LZW code width through every
    step 9..12 and (at this size) a mid-stream table reset; lossless
    equality proves the growth rule and the CLEAR handling."""
    import numpy as np

    from lambdo_spark.functions.gif import decode_gif, encode_gif

    rng = np.random.default_rng(1)
    pal = rng.integers(0, 256, (256, 3)).astype(np.uint8)
    f = rng.integers(0, 256, (120, 150)).astype(np.uint8)
    assert np.array_equal(decode_gif(encode_gif([f], pal))[0], pal[f])


def test_gif_animation_transparency_disposal_local_palettes():
    """Two frames: full-screen then a transparent sub-rect with its
    own local palette; disposal 2 restores background after frame 2.
    The composited canvases must match a straight numpy rendering."""
    import numpy as np

    from lambdo_spark.functions.gif import decode_gif, encode_gif

    rng = np.random.default_rng(2)
    gpal = rng.integers(0, 256, (4, 3)).astype(np.uint8)
    lpal = rng.integers(0, 256, (8, 3)).astype(np.uint8)
    f1 = rng.integers(0, 4, (10, 10)).astype(np.uint8)
    f2 = rng.integers(0, 8, (4, 5)).astype(np.uint8)
    blob = encode_gif(
        [f1, f2], gpal, local_palettes=[None, lpal],
        offsets=[(0, 0), (3, 2)], transparent=1, disposals=[1, 2],
    )
    out = decode_gif(blob)
    assert out.shape == (2, 10, 10, 3)
    want1 = np.where((f1 == 1)[..., None], gpal[0], gpal[f1])
    assert np.array_equal(out[0], want1)
    want2 = want1.copy()
    sub = want2[2:6, 3:8]
    m = f2 != 1
    sub[m] = lpal[f2][m]
    assert np.array_equal(out[1], want2)


def test_gif_malformed_inputs_raise_value_error():
    import numpy as np

    from lambdo_spark.functions.gif import decode_gif, encode_gif

    rng = np.random.default_rng(3)
    pal = rng.integers(0, 256, (4, 3)).astype(np.uint8)
    blob = encode_gif([rng.integers(0, 4, (6, 7)).astype(np.uint8)], pal)
    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF" + blob[6:])
    for cut in (10, 14, len(blob) // 2, len(blob) - 2):
        with pytest.raises(ValueError):
            decode_gif(blob[:cut])
    # flipped bit inside the LZW stream: bad code or short raster
    body = bytearray(blob)
    body[-6] ^= 0x55
    with pytest.raises(ValueError):
        decode_gif(bytes(body))


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 18),
    ncol=st.integers(2, 64),
    interlace=st.booleans(),
    seed=st.integers(0, 10_000),
)
def test_gif_roundtrip_property(w, h, ncol, interlace, seed):
    import numpy as np

    from lambdo_spark.functions.gif import decode_gif, encode_gif

    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (ncol, 3)).astype(np.uint8)
    f = rng.integers(0, ncol, (h, w)).astype(np.uint8)
    out = decode_gif(encode_gif([f], pal, interlace=interlace))
    assert out.shape == (1, h, w, 3)
    assert np.array_equal(out[0], pal[f])


def test_gif_decodes_via_decode_image_and_video_features(spark):
    """decode_image returns the first composited frame; an animated
    GIF flows through extract_video_features like an AVI."""
    import numpy as np

    from lambdo_spark.functions.gif import encode_gif
    from lambdo_spark.functions.multimodal import extract_video_features

    rng = np.random.default_rng(5)
    pal = rng.integers(0, 256, (8, 3)).astype(np.uint8)
    frames = [rng.integers(0, 8, (6, 9)).astype(np.uint8) for _ in range(3)]
    blob = encode_gif(frames, pal)
    first = decode_image(blob)
    assert first.shape == (6, 9, 3)
    assert np.array_equal(first, pal[frames[0]])

    df = spark.createDataFrame([(1, bytearray(blob))], "doc_id long, video binary")
    row = extract_video_features(df).collect()[0]
    assert (row.n_frames, row.height, row.width) == (3, 6, 9)
    assert row.px_sum == sum(int(pal[f].astype(np.int64).sum()) for f in frames)


# ---------------------------------------------------------------------------
# G.711 mu-law / A-law: real compressed audio (ITU-T telephony codec)
# through the same RIFF/WAVE walk (format tags 7 / 6).
# ---------------------------------------------------------------------------


def test_g711_expand_compress_involution_all_bytes():
    """compress(expand(b)) == b for every companded byte — the exact
    property the classic g711.c tables have. One documented
    exception: mu-law 0x7F is 'negative zero'; it decodes to 0 like
    0xFF does, and the compressor canonicalizes 0 to 0xFF."""
    import numpy as np

    from lambdo_spark.functions.multimodal import g711_compress, g711_expand

    allb = np.arange(256, dtype=np.uint8)
    back_mu = g711_compress(g711_expand(allb, "mulaw").astype(np.int64), "mulaw")
    diff = np.nonzero(back_mu != allb)[0]
    assert list(diff) == [0x7F] and back_mu[0x7F] == 0xFF
    assert int(g711_expand(np.array([0x7F, 0xFF], np.uint8), "mulaw").sum()) == 0

    back_a = g711_compress(g711_expand(allb, "alaw").astype(np.int64), "alaw")
    assert np.array_equal(back_a, allb)


def test_g711_wav_roundtrip_and_idempotence():
    """Lossy but stable: expand(compress(x)) re-compresses to the
    same bytes; container round trip preserves rate/channels; raw
    uint8 payloads pass through verbatim (the oracle-row path)."""
    import numpy as np

    from lambdo_spark.functions.multimodal import (
        decode_wav,
        encode_wav_g711,
        g711_expand,
    )

    rng = np.random.default_rng(11)
    pcm = rng.integers(-32768, 32768, 400).astype(np.int16)
    for law in ("mulaw", "alaw"):
        sr, ch, fr = decode_wav(encode_wav_g711(pcm, 16000, law))
        assert (sr, ch) == (16000, 1) and len(fr) == 400
        sr2, ch2, fr2 = decode_wav(encode_wav_g711(fr, 16000, law))
        assert np.array_equal(fr, fr2), law
        assert int(np.abs(fr.astype(int) - pcm.astype(int)).max()) < 1024

    pay = ((np.arange(64) * 7 + 3) % 256).astype(np.uint8)
    _, _, fr = decode_wav(encode_wav_g711(pay, 8000, "alaw"))
    assert np.array_equal(fr, g711_expand(pay, "alaw"))


def test_g711_error_surface():
    import struct

    import numpy as np

    from lambdo_spark.functions.multimodal import (
        decode_wav,
        encode_wav_g711,
        g711_compress,
    )

    with pytest.raises(ValueError):
        g711_compress(np.zeros(4, np.int64), "adpcm")
    # format tag 2 (ADPCM) must fail loudly in the chunk walk
    blob = bytearray(encode_wav_g711(np.zeros(8, np.uint8), 8000, "mulaw"))
    tag_off = blob.index(b"fmt ") + 8
    blob[tag_off:tag_off + 2] = struct.pack("<H", 2)
    with pytest.raises(ValueError):
        decode_wav(bytes(blob))


def test_decode_image_falls_back_to_pillow_for_rejected_variants():
    """Variants the pure-numpy decoders reject by design (here: Adam7
    interlaced PNG) must fall through to Pillow when importable —
    having Pillow never narrows the decodable set."""
    import numpy as np

    from lambdo_spark.functions import multimodal as mm

    rgb = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    blob = bytearray(mm.encode_png(rgb))
    # IHDR interlace byte: 8 (sig) + 8 (len+type) + 12th data byte
    assert blob[16 + 12] == 0
    blob[16 + 12] = 1  # claim Adam7 -> decode_png raises ValueError
    import binascii
    import struct

    crc = binascii.crc32(bytes(blob[12:12 + 4 + 13])) & 0xFFFFFFFF
    blob[12 + 4 + 13:12 + 4 + 13 + 4] = struct.pack(">I", crc)
    blob = bytes(blob)

    with pytest.raises(ValueError, match="interlaced"):
        mm.decode_png(blob)

    class _FakeImg:
        def convert(self, mode):
            return np.zeros((4, 4, 3), dtype=np.uint8)

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    class _FakePIL:
        @staticmethod
        def open(fh):
            return _FakeImg()

    old = mm._PIL_IMAGE
    try:
        mm._PIL_IMAGE = _FakePIL
        out = mm.decode_image(blob)
        assert out.shape == (4, 4, 3) and not out.any()
        # and with no Pillow, the numpy decoder's error surfaces
        mm._PIL_IMAGE = False
        with pytest.raises(ValueError, match="interlaced"):
            mm.decode_image(blob)
    finally:
        mm._PIL_IMAGE = old


def test_jpeg_fill_bytes_before_markers():
    """T.81 B.1.1.2 allows any number of 0xFF pad bytes before a
    marker; the walk must skip them, not parse 0xFF as a marker."""
    import numpy as np

    from lambdo_spark.functions.jpeg import decode_jpeg, encode_jpeg

    img = np.arange(16 * 24 * 3, dtype=np.uint8).reshape(16, 24, 3)
    blob = encode_jpeg(img, quality=90)
    ref = decode_jpeg(blob)
    # insert fill bytes before the DQT marker
    at = blob.index(b"\xff\xdb")
    padded = blob[:at] + b"\xff" * 3 + blob[at:]
    assert np.array_equal(decode_jpeg(padded), ref)


def test_jpeg_single_component_scan_ignores_sampling_factors():
    """T.81 A.2.3: a one-component scan's MCU is exactly one data unit
    regardless of declared sampling factors (grayscale converted from
    4:2:0 keeps 2x2 luma factors). Patching the SOF factors byte from
    1x1 to 2x2 must not change the decode."""
    import numpy as np

    from lambdo_spark.functions.jpeg import decode_jpeg, encode_jpeg

    gray = (np.arange(24 * 40, dtype=np.uint32) * 7 % 256).astype(
        np.uint8).reshape(24, 40)
    blob = encode_jpeg(gray, quality=85)
    ref = decode_jpeg(blob)
    sof = blob.index(b"\xff\xc0")
    assert blob[sof + 11] == 0x11  # ncomp=1, factors 1x1
    patched = blob[:sof + 11] + b"\x22" + blob[sof + 12:]
    assert np.array_equal(decode_jpeg(patched), ref)
