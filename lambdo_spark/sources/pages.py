"""Deterministic Common-Crawl-style web-pages table (BASELINE.json input_hint).

Schema: ``(url string, warc_ts timestamp, html binary, text string,
lang string)`` — FIXTURES.md F1.

The generator is *distributed and seed-deterministic*: the driver only
creates ``spark.range(n)``; every attribute of row ``i`` is a pure
function of ``(seed, i)`` computed executor-side in numpy inside
``mapInPandas`` (Arrow batches, no per-row Python, no driver data).
That means the same (seed, n) produces byte-identical rows at any
partitioning / parallelism / cluster size — the property the golden
tests, hash audit, and the local[8]-vs-local[32] scaling run rely on.

Skew: url ranks are drawn from a harmonic (zipf-ish) inverse CDF, so a
handful of hot urls carry a large share of rows — exercising the
salted-shuffle path exactly like hot domains do at 10^12 scale.

Reference parity: lambdo has no generator; its tests inject tiny
in-memory frames (/root/reference/tests/test_calculate.py:32-48). This
module is the scale-bearing analog of that injection step.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)

# lang categories, skew weights (en-heavy like the real crawl)
_LANGS = np.array(["en", "de", "fr", "es", "ru", "zh", "ja", "pt"])
_LANG_CDF = np.cumsum(np.array([0.45, 0.12, 0.10, 0.10, 0.08, 0.07, 0.05, 0.03]))

_WORDS = np.array(
    "the quick brown fox jumps over lazy dog stream table rollup tier "
    "window bucket shard crawl parse index fetch render cache header "
    "body anchor token filter merge".split()
)

_EPOCH_2024 = np.int64(1704067200)  # 2024-01-01T00:00:00Z
_SPAN_MINUTES = np.int64(90 * 24 * 60)  # 90 days of minute grid


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 — the per-row deterministic PRNG."""
    with np.errstate(over="ignore"):
        z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _u01(bits: np.ndarray) -> np.ndarray:
    return (bits >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def row_attrs(ids: np.ndarray, seed: int, n_urls: int) -> dict[str, np.ndarray]:
    """Pure (seed, id) -> attributes; shared by generator and oracle."""
    ids = ids.astype(np.uint64)
    base = np.uint64(seed) * np.uint64(0x100000001B3)
    h1 = _splitmix64(ids + base)
    h2 = _splitmix64(h1)
    h3 = _splitmix64(h2)

    # harmonic inverse-CDF → zipf-ish skewed url rank in [0, n_urls)
    u = _u01(h1)
    rank = np.minimum(
        (np.exp(u * np.log(float(n_urls) + 1.0)) - 1.0).astype(np.int64),
        n_urls - 1,
    )
    # minute-grid timestamp with natural gaps (uniform over 90-day grid)
    minute = (h2 % np.uint64(_SPAN_MINUTES)).astype(np.int64)
    ts = _EPOCH_2024 + minute * 60

    # per-url seeded lang (FIXTURES F1: "seeded per url")
    lang_u = _u01(_splitmix64(rank.astype(np.uint64) + base + np.uint64(7)))
    lang_ix = np.searchsorted(_LANG_CDF, lang_u, side="right").clip(0, len(_LANGS) - 1)

    w = h3 % np.uint64(len(_WORDS))
    return {"rank": rank, "ts": ts, "lang_ix": lang_ix, "word_ix": w.astype(np.int64)}


def _batch(ids: np.ndarray, seed: int, n_urls: int) -> pd.DataFrame:
    a = row_attrs(ids, seed, n_urls)
    rank, ts, lang_ix, w = a["rank"], a["ts"], a["lang_ix"], a["word_ix"]
    domain = rank % 97
    url = pd.Series(
        np.char.add(
            np.char.add("https://site", domain.astype("U8")),
            np.char.add(".example.com/page/", rank.astype("U12")),
        )
    )
    # deterministic text per (url, warc_ts): rank, ts and a hash-picked
    # word stream of varying length → exercises mean-length aggregates
    nwords = 3 + (rank % 7)
    word0 = _WORDS[w % len(_WORDS)]
    word1 = _WORDS[(w + rank) % len(_WORDS)]
    text = pd.Series(
        np.char.add(
            np.char.add(
                np.char.add("page ", rank.astype("U12")),
                np.char.add(" at ", ts.astype("U14")),
            ),
            np.char.add(
                np.char.add(" ", np.char.multiply(np.char.add(word0, " "), nwords)),
                word1,
            ),
        )
    )
    html = ("<html><body>" + text + "</body></html>").map(lambda s: s.encode("utf-8"))
    return pd.DataFrame(
        {
            "url": url,
            "warc_ts": pd.to_datetime(ts, unit="s", utc=True).tz_localize(None),
            "html": html,
            "text": text,
            "lang": pd.Series(_LANGS[lang_ix]),
        }
    )


def generate_pages(
    spark: SparkSession,
    n_rows: int,
    seed: int = 42,
    n_urls: int | None = None,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic pages table of ``n_rows`` rows."""
    if n_urls is None:
        n_urls = max(16, n_rows // 64)
    if partitions is None:
        partitions = max(8, spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield _batch(b["id"].to_numpy(), seed, n_urls)

    return (
        spark.range(0, n_rows, numPartitions=partitions)
        .mapInPandas(gen, schema=PAGES_SCHEMA)
    )


def extract_text(html: bytes) -> str:
    """The 'reference extractor' for the hash audit: strips the
    deterministic wrapper. Byte-identical to the generator's text."""
    s = html.decode("utf-8")
    return s.removeprefix("<html><body>").removesuffix("</body></html>")


def pages_pandas(n_rows: int, seed: int = 42, n_urls: int | None = None) -> pd.DataFrame:
    """Driver-side oracle: same rows as generate_pages, via pandas."""
    if n_urls is None:
        n_urls = max(16, n_rows // 64)
    return _batch(np.arange(n_rows, dtype=np.uint64), seed, n_urls)
