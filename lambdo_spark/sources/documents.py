"""Deterministic web-documents table with PLANTED near-dup clusters.

Scale-bench input for the training-data pipeline (dedup_clusters,
MinHash/LSH, span dedup): the sandbox `documents.parquet` fixtures max
out at 5k docs, which measures fixed per-job overheads, not the
shuffle design. This generator synthesizes an arbitrarily large
documents table the same way `sources/pages.py` does — the driver
creates only ``spark.range(n)``; every attribute of row ``i`` is a
pure function of ``(seed, i)`` computed executor-side in numpy inside
``mapInPandas`` — so identical (seed, n) yields byte-identical rows at
any parallelism, and the bench numbers are comparable across runs.

Planted duplication structure (known ground truth, so the bench can
ASSERT the cluster count instead of trusting it):

* docs come in groups of 8 (``gid = doc_id // 8``);
* members ``j = doc_id % 8`` in {0, 1, 2} form a NEAR-DUP TRIO — the
  same 40-token stream with members 1 and 2 carrying a single
  distinct token substitution at a fixed position. Pairwise 3-shingle
  Jaccard ≈ 35/41 ≈ 0.854, comfortably above the 0.8 dedup threshold;
* members 3-7 are unique (their token stream keys on doc_id, not gid).

So ``n`` docs (n % 8 == 0) contain exactly ``n/8`` trios → expected
clusters = n/8 (size 3) + 5n/8 singletons, and 3 verified pairs per
trio. Cross-group shingle overlap is noise (26-word pool → word-triple
space 26³; expected distinct-shingle Jaccard between unrelated docs
≈ 0), verified exactly by the pair stage anyway.

Reference analog: lambdo injects tiny in-memory frames in its tests
(/root/reference/tests/test_calculate.py:32-48); this is the
scale-bearing equivalent for corpus-prep operators.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from lambdo_spark.sources.pages import _splitmix64

DOCS_SCHEMA = "doc_id long, source string, text string"

_POOL = np.array(
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar papa quebec romeo sierra tango "
    "uniform victor whiskey xray yankee zulu".split()
)

_N_TOKENS = 40
_MUT_POS = 20  # the position trio members 1/2 substitute


def doc_texts(ids: np.ndarray, seed: int) -> np.ndarray:
    """Pure (seed, doc_id) -> text, shared by generator and tests."""
    ids = ids.astype(np.uint64)
    base = np.uint64(seed) * np.uint64(0x100000001B3)
    gid = ids // np.uint64(8)
    j = ids % np.uint64(8)
    is_dup = j < np.uint64(3)
    # trio members stream from the GROUP key, uniques from the doc key;
    # parity keeps the two key spaces disjoint at ANY corpus size (the
    # previous `ids + 1 << 32` offset parsed as `(ids+1) << 32` and
    # repeated with period 2^26 after the *64 below)
    stream_key = np.where(
        is_dup,
        gid * np.uint64(2) + np.uint64(1),
        ids * np.uint64(2),
    )
    n = len(ids)
    cols = []
    W = np.uint64(len(_POOL))
    for p in range(_N_TOKENS):
        ix = _splitmix64(
            base + stream_key * np.uint64(64) + np.uint64(p)
        ) % W
        if p == _MUT_POS:
            # members 1/2 substitute a distinct word (offset by j)
            ix = np.where(
                is_dup & (j > 0), (ix + j) % W, ix
            )
        cols.append(_POOL[ix.astype(np.int64)])
    out = cols[0]
    for c in cols[1:]:
        out = np.char.add(np.char.add(out, " "), c)
    return out


def _batch(ids: np.ndarray, seed: int) -> pd.DataFrame:
    text = doc_texts(ids, seed)
    source = np.char.add(
        "crawl-", ((ids.astype(np.uint64) // np.uint64(8)) % np.uint64(13)).astype("U4")
    )
    return pd.DataFrame(
        {"doc_id": ids.astype(np.int64), "source": source, "text": text}
    )


def generate_documents(
    spark: SparkSession, n: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Distributed, seed-deterministic documents table (see module doc)."""
    rng = spark.range(0, n, numPartitions=partitions) if partitions else spark.range(0, n)

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield _batch(pdf["id"].to_numpy(), seed)

    return rng.mapInPandas(gen, schema=DOCS_SCHEMA)
