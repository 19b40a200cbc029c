"""Deduplication operators for web-scale training data.

Five strategies, cheapest first. Everything hash-based uses the same
deterministic splitmix64 family as the pages generator — no Python
``hash()`` (varies per process), no randomness at runtime.

Scale notes:
- exact + tokenset dedup are single groupBys (map-side combined).
- MinHash LSH is the linear-cost near-dup path: shingles → K minhash
  values → B bands → candidate pairs only within equal band buckets
  (one shuffle on band key), verified by exact Jaccard. At 10^12 docs
  band buckets are further split by a doc-count cap before the
  self-join (hot buckets = near-identical boilerplate; the cap bounds
  the quadratic term).
- SimHash gives 64-bit signatures; near-dups = small Hamming distance,
  found by banding the signature into 4x16-bit chunks (any equal chunk
  → candidate, exact for distance <= 3 by pigeonhole).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf


# ------------------------------------------------------------ exact

def dedup_exact(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_rows: bool = False,
) -> DataFrame:
    """Exact dedup: one row per distinct text, keeping min id.
    (groupBy on sha2 would equally work; grouping on the text itself
    lets Catalyst skip materializing the hash at small scale — at
    100 TB swap in sha2(text) as the group key to shrink shuffle rows.)

    ``keep_rows=True`` returns the full first-seen row per content hash
    (all input columns) in ONE shuffle: ``min_by(struct(*), id)`` is a
    declarative aggregate, so map-side combine reduces each partition
    to one candidate row per text before the exchange — no second
    join-back pass and no per-group window sort.
    """
    if keep_rows:
        row = F.min_by(F.struct(*docs.columns), F.col(id_col)).alias("_row")
        return docs.groupBy(F.col(text_col)).agg(row).select("_row.*")
    return docs.groupBy(F.col(text_col)).agg(
        F.min(id_col).alias("keep_id"),
        F.count(F.lit(1)).alias("dup_count"),
    ).select("keep_id", "dup_count")


def dedup_tokenset(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Near-dup by token-set normalization: same distinct sorted token
    multiset-free signature → duplicates (catches reorderings)."""
    sig = F.concat_ws(
        " ", F.sort_array(F.array_distinct(F.split(F.trim(F.col(text_col)), r"\s+")))
    )
    return docs.groupBy(sig.alias("token_sig")).agg(
        F.min(id_col).alias("keep_id"),
        F.count(F.lit(1)).alias("dup_count"),
    ).select("keep_id", "dup_count")


# ---------------------------------------------------------- hashing

def _splitmix64(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _token_hashes(text: str) -> np.ndarray:
    """Per-token blake2b (the simhash family's documented hash —
    cryptographic, one Python hashlib call per token)."""
    toks = text.split()
    if not toks:
        return np.zeros(1, dtype=np.uint64)
    h = np.array(
        [int.from_bytes(__import__("hashlib").blake2b(t.encode(), digest_size=8).digest(), "little") for t in toks],
        dtype=np.uint64,
    )
    return h


_FNV_OFFSET = np.uint64(14695981039346656037)
_FNV_PRIME = np.uint64(1099511628211)
# Fold at most this many bytes per token; the full byte LENGTH is
# mixed into the hash afterwards, so long tokens sharing a 64-byte
# prefix still separate by length. Bounds the column fold on
# pathological web-text tokens (a 1 MB minified-JS "token" would
# otherwise cost one vectorized pass per BYTE of the longest token).
# A residual prefix+length collision only ADDS an LSH candidate —
# verification is exact Jaccard on the full strings, so no wrong pair
# can survive it.
_TOKEN_HASH_BYTES = 64


def _fnv_fold(bs: list[bytes]) -> np.ndarray:
    """Vectorized FNV-1a over a padded token-byte matrix (one numpy
    pass per byte POSITION, capped at ``_TOKEN_HASH_BYTES``), length
    mixed in, splitmix64 finisher for avalanche."""
    lens = np.fromiter((len(b) for b in bs), count=len(bs), dtype=np.int64)
    m = min(int(lens.max()), _TOKEN_HASH_BYTES)
    buf = np.frombuffer(
        b"".join(b[:m].ljust(m, b"\0") for b in bs), dtype=np.uint8
    ).reshape(len(bs), m)
    h = np.full(len(bs), _FNV_OFFSET, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(m):
            live = lens > j
            h[live] = (h[live] ^ buf[live, j].astype(np.uint64)) * _FNV_PRIME
        h ^= lens.astype(np.uint64)
    return _splitmix64(h)


def _token_hashes_fast(text: str) -> np.ndarray:
    """Vectorized token hashes for the MinHash family — see
    :func:`_fnv_fold`. MinHash only needs a well-mixed deterministic
    family, not a cryptographic one (the verified output is pinned to
    exact shingle Jaccard either way)."""
    toks = text.split()
    if not toks:
        return np.zeros(1, dtype=np.uint64)
    return _fnv_fold([t.encode() for t in toks])


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """k-token shingle hashes (rolling combination of token hashes)."""
    th = _token_hashes_fast(text)
    if len(th) < k:
        return _splitmix64(th)
    sh = th[: len(th) - k + 1].copy()
    for i in range(1, k):
        sh = _splitmix64(sh * np.uint64(31) + th[i : len(th) - k + 1 + i])
    return sh


def minhash_signature(text: str, num_hashes: int = 64, k: int = 3) -> np.ndarray:
    """K minhash values via one shingle-hash array x K splitmix salts
    (vectorized K x S matrix min)."""
    sh = np.unique(shingle_hashes(text, k))
    salts = _splitmix64(np.arange(1, num_hashes + 1, dtype=np.uint64) * np.uint64(0xA5A5A5A5))
    with np.errstate(over="ignore"):
        m = _splitmix64(sh[None, :] ^ salts[:, None])
    return m.min(axis=1)


def _shingle_hashes_batch(texts, k: int = 3):
    """Shingle hashes for a BATCH of docs in one set of numpy passes
    (cross-doc vectorization — per-doc numpy is overhead-bound at
    ~300-token docs). Returns (sh, doc_starts): the concatenated
    per-doc shingle-hash arrays and each doc's start offset into it.
    Semantics per doc are exactly :func:`shingle_hashes` (min over a
    multiset equals min over its set, so the per-doc ``np.unique`` is
    unnecessary for MinHash and skipped here)."""
    tok_lists = [(t or "").split() for t in texts]
    counts = np.array([len(tl) for tl in tok_lists], dtype=np.int64)
    all_toks = [tok for tl in tok_lists for tok in tl]
    # one global token-hash fold (empty docs contribute zero tokens;
    # their single sentinel hash 0 is injected at the shingle level,
    # mirroring _token_hashes' zeros(1) for empty input)
    if all_toks:
        th = _fnv_fold([t.encode() for t in all_toks])
    else:
        th = np.empty(0, dtype=np.uint64)
    tok_starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    # per-doc shingle counts: c-k+1 rolling windows for c>=k, else one
    # hash per token (shingle_hashes' short-doc rule), else 1 sentinel
    n_sh = np.where(counts >= k, counts - (k - 1), np.maximum(counts, 1))
    doc_starts = np.concatenate(([0], np.cumsum(n_sh)[:-1]))
    total = int(n_sh.sum())
    # global shingle position -> global token position of its window start
    within = np.arange(total, dtype=np.int64) - np.repeat(doc_starts, n_sh)
    tokpos = np.repeat(tok_starts, n_sh) + within
    doc_count = np.repeat(counts, n_sh)
    empty = doc_count == 0
    tokpos_safe = np.where(empty, 0, tokpos)
    if len(th):
        sh = th[np.minimum(tokpos_safe, len(th) - 1)].copy()
    else:
        sh = np.zeros(total, dtype=np.uint64)
    rolling = doc_count >= k
    short = (~rolling) & (~empty)
    with np.errstate(over="ignore"):
        for i in range(1, k):
            idx = np.minimum(tokpos_safe + i, max(len(th) - 1, 0))
            nxt = th[idx] if len(th) else np.zeros(total, dtype=np.uint64)
            upd = _splitmix64(sh * np.uint64(31) + nxt)
            sh = np.where(rolling, upd, sh)
        # short docs: splitmix of the raw token hash (shingle_hashes'
        # <k-token branch applies _splitmix64 to th directly)
        sh = np.where(short, _splitmix64(np.where(short, sh, 0)), sh)
    sh = np.where(empty, _splitmix64(np.zeros(total, dtype=np.uint64)), sh)
    return sh, doc_starts


def minhash_bands_udf(num_hashes: int = 64, bands: int = 16):
    """Arrow-batch band-key kernel, vectorized ACROSS docs: one global
    token-hash fold, one rolling-shingle pass, then per-salt
    ``np.minimum.reduceat`` segmented minima — no per-doc numpy calls
    (per-doc arrays of a few hundred elements are overhead-bound;
    cross-doc batching is the same fix fingerprint got). Band keys are
    bit-identical to the single-doc reference path
    (:func:`minhash_signature` + band fold), pinned by test."""
    rows_per_band = num_hashes // bands
    salts = _splitmix64(
        np.arange(1, num_hashes + 1, dtype=np.uint64) * np.uint64(0xA5A5A5A5)
    )
    band_ix = np.arange(bands, dtype=np.uint64)

    @pandas_udf("array<long>")
    def _udf(texts: pd.Series) -> pd.Series:
        n_docs = len(texts)
        if n_docs == 0:
            return pd.Series([], dtype=object)
        sh, doc_starts = _shingle_hashes_batch(list(texts))
        sig = np.empty((num_hashes, n_docs), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(num_hashes):
                sig[j] = np.minimum.reduceat(_splitmix64(sh ^ salts[j]), doc_starts)
            bnd = sig.reshape(bands, rows_per_band, n_docs)
            bsums = bnd.sum(axis=1, dtype=np.uint64)            # bands×docs
            bs = _splitmix64(bsums)
            keys = _splitmix64(bs * np.uint64(1315423911) + band_ix[:, None])
        keys = keys.T.astype(np.int64)                           # docs×bands
        return pd.Series(list(keys))

    return _udf


def ngram_jaccard(a, b):
    """Exact token Jaccard as a column expression (JVM-side)."""
    ta = F.array_distinct(F.split(F.trim(a), r"\s+"))
    tb = F.array_distinct(F.split(F.trim(b), r"\s+"))
    inter = F.size(F.array_intersect(ta, tb)).cast("double")
    union = F.size(F.array_union(ta, tb)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(1.0))


def jaccard_verify_udf(mode: str = "shingle", k: int = 3):
    """Vectorized (Arrow-batched) exact Jaccard — value-identical to
    :func:`shingle_jaccard` / :func:`ngram_jaccard` but ~80× faster.

    Why a UDF here when the rule is "JVM expressions first": the
    expression form references the ``split(trim(text))`` subtree once
    PER SHINGLE ELEMENT inside a higher-order ``transform`` lambda,
    and Catalyst does not common-subexpression-eliminate across lambda
    bodies — each 40-token verify row re-ran the regex split ~100×
    (measured 127 s for 202k pairs at the 500k-doc scale bench; the
    UDF does the same verification in ~1.5 s). Verification is
    per-pair local work with no shuffle, exactly the shape Arrow
    batches excel at.

    Parity is bit-exact, property-tested against the expression form
    (test_dedup.py): Java's ``\\s`` is ASCII-only → ``re.ASCII``;
    Spark's ``trim`` strips the space character only → ``strip(' ')``;
    counts divide as IEEE doubles in both engines. Shingle sets are
    memoized per distinct text within a batch (every doc appears in
    many candidate pairs)."""
    import re

    pat = re.compile(r"\s+", re.ASCII)

    def _sets(s: str, memo: dict) -> frozenset:
        got = memo.get(s)
        if got is not None:
            return got
        t = pat.split((s or "").strip(" "))
        if mode == "shingle":
            out = (
                frozenset(" ".join(t[i : i + k]) for i in range(len(t) - k + 1))
                if len(t) >= k
                else frozenset()
            )
        else:
            out = frozenset(t)
        memo[s] = out
        return out

    @pandas_udf("double")
    def _udf(a: pd.Series, b: pd.Series) -> pd.Series:
        memo: dict = {}
        out = np.empty(len(a), dtype=np.float64)
        for i, (x, y) in enumerate(zip(a, b)):
            sx, sy = _sets(x, memo), _sets(y, memo)
            u = len(sx | sy)
            out[i] = (len(sx & sy) / u) if u else 1.0
        return pd.Series(out)

    return _udf


def shingle_jaccard(a, b, k: int = 3):
    """Exact k-token-shingle Jaccard as a JVM expression — the SAME
    similarity measure the MinHash family approximates, so LSH
    candidate recall and the verification threshold talk about one
    quantity. Docs shorter than k tokens have an empty shingle set
    (jaccard 0 vs anything non-empty)."""

    def sh(c):
        tk = F.split(F.trim(c), r"\s+")
        return F.when(
            F.size(tk) >= k,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size(tk) - (k - 1)),
                    lambda i: F.concat_ws(
                        " ", *[F.element_at(tk, i + j) for j in range(k)]
                    ),
                )
            ),
        ).otherwise(F.array().cast("array<string>"))

    sa, sb = sh(a), sh(b)
    inter = F.size(F.array_intersect(sa, sb)).cast("double")
    union = F.size(F.array_union(sa, sb)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(1.0))


def minhash_band_plan(
    threshold: float, num_hashes: int = 64, min_recall: float = 0.95
) -> tuple[int, int, float]:
    """Pick the (bands, rows) split whose LSH S-curve fits ``threshold``.

    For ``b`` bands of ``r`` rows (``b*r = num_hashes``) the
    probability that a pair with Jaccard similarity ``s`` collides in
    at least one band is ``1 - (1 - s^r)^b``, an S-curve with
    inflection near ``(1/b)^(1/r)`` (Mining of Massive Datasets §3.4).
    Since :func:`dedup_minhash_lsh` verifies every candidate with the
    exact Jaccard, false positives only cost compute — recall is the
    quantity that matters. This picks, among the divisor splits of
    ``num_hashes`` whose recall AT the threshold is ≥ ``min_recall``,
    the one with the HIGHEST inflection point (fewest false
    candidates); if none clears the recall bar it falls back to the
    max-recall split.

    Returns ``(bands, rows, est_recall_at_threshold)``. Deterministic,
    pure arithmetic — safe to call at plan-build time.
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    splits = []
    for b in range(1, num_hashes + 1):
        if num_hashes % b:
            continue
        r = num_hashes // b
        recall = 1.0 - (1.0 - threshold**r) ** b
        inflection = (1.0 / b) ** (1.0 / r)
        splits.append((b, r, recall, inflection))
    ok = [s for s in splits if s[2] >= min_recall]
    if ok:
        b, r, recall, _ = max(ok, key=lambda s: s[3])
    else:
        b, r, recall, _ = max(splits, key=lambda s: s[2])
    return b, r, recall


def dedup_minhash_lsh(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int | str = 16,
    bucket_cap: int = 1000,
    verify: str = "token",
    metrics: dict | None = None,
) -> DataFrame:
    """MinHash+LSH near-dup pairs with exact-Jaccard verification.

    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold.
    Pipeline: signature → band keys → explode (ids only) → self-join
    per band bucket → dedup candidate id pairs → join the text back
    ONCE per unique pair → verify with the exact JVM Jaccard.

    Shuffle budget: the band exchange carries only ``(id, band_ix,
    band_key)`` — fixed-width rows, NOT the document text. Text enters
    the plan exactly twice, joined by id onto the already-deduplicated
    candidate pairs (candidates ≈ collisions, orders of magnitude
    smaller than docs×bands). At 100 TB the band shuffle is therefore
    ~24 bytes × docs × bands, not corpus-bytes × bands.

    ``bucket_cap`` drops degenerate buckets (boilerplate floods —
    near-identical docs that would explode the quadratic self-join).
    The drop is never silent: pass ``metrics={}`` to have the call
    eagerly count the capped buckets/doc-slots into
    ``metrics["dropped_buckets"]`` / ``metrics["dropped_doc_slots"]``
    (one cheap aggregate over the bucket-size table), and any nonzero
    drop is also logged at WARNING level.

    ``verify``: "token" (distinct-token-set Jaccard — loose, catches
    reorderings among candidates) or "shingle" (3-token-shingle
    Jaccard — the measure the MinHash family itself approximates, so
    the verified output is exactly {pairs: shingle_jaccard >= t}
    whenever banding recall is complete; SQL-replicable, hence the
    oracled driver row).

    ``bands="auto"`` picks the split via :func:`minhash_band_plan`
    (recall-safe S-curve fit to ``threshold``); the chosen plan lands
    in ``metrics["band_plan"]`` when a metrics dict is passed.
    """
    if bands == "auto":
        bands, rows, est_recall = minhash_band_plan(threshold, num_hashes)
        if metrics is not None:
            metrics["band_plan"] = {
                "bands": bands, "rows": rows, "est_recall": round(est_recall, 6)
            }
    bud = minhash_bands_udf(num_hashes, bands)
    # Signatures are cached: the plan below references them along FOUR
    # branches (the bucket-size aggregate, both sides of the bucket
    # self-join) and without a cache each branch re-runs the full
    # text scan + hashing UDF. The cached rows are fixed-width
    # (id + `bands` longs, ~140 B/doc — orders of magnitude under the
    # corpus bytes) and MEMORY_AND_DISK spills rather than OOMs; at
    # extreme corpus sizes write signatures to a temp table instead.
    # The cache stays registered until the caller's session ends (or
    # clearCache) — freeing it earlier would re-run the signature UDF
    # per plan branch; one dedup pass per session is the normal shape.
    sigs = docs.select(
        F.col(id_col).alias("id"), bud(F.col(text_col)).alias("bnd")
    ).persist()
    # ids + band keys only — text does NOT ride the band shuffle
    exploded = sigs.select(
        "id", F.posexplode("bnd").alias("band_ix", "band_key")
    )
    # cap pathological buckets before the quadratic join
    sizes = exploded.groupBy("band_ix", "band_key").count()
    if metrics is not None:
        sizes = sizes.persist()
        row = (
            sizes.where(F.col("count") > bucket_cap)
            .agg(
                F.count(F.lit(1)).alias("b"),
                F.coalesce(F.sum("count"), F.lit(0)).alias("d"),
            )
            .first()
        )
        metrics["dropped_buckets"] = int(row["b"])
        metrics["dropped_doc_slots"] = int(row["d"])
        if metrics["dropped_buckets"]:
            import logging

            logging.getLogger(__name__).warning(
                "dedup_minhash_lsh: bucket_cap=%d dropped %d flood bucket(s) "
                "covering %d doc-slots — near-dup pairs inside those buckets "
                "are NOT reported (recall trade; raise bucket_cap or handle "
                "boilerplate upstream)",
                bucket_cap, metrics["dropped_buckets"], metrics["dropped_doc_slots"],
            )
    # drop flood buckets via LEFT ANTI against the over-cap set —
    # flood buckets are the exception (at most slots/bucket_cap of
    # them), so AQE plans this as a broadcast anti-join at runtime
    # (no explicit hint: a pathological corpus could have a large
    # flood set, where AQE correctly falls back to a shuffled anti
    # join). The old shape inner-joined all docs×bands exploded rows
    # against the FULL bucket-size table — a sort-merge join measured
    # at ~10 s of the 500k-doc scale bench.
    flood = sizes.where(F.col("count") > bucket_cap).drop("count")
    exploded = exploded.join(flood, ["band_ix", "band_key"], "left_anti")
    a = exploded.select("band_ix", "band_key", F.col("id").alias("id_a"))
    b = exploded.select("band_ix", "band_key", F.col("id").alias("id_b"))
    cand = (
        a.join(b, ["band_ix", "band_key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    # text joins in ONCE per unique candidate pair, after dedup
    txt = docs.select(F.col(id_col).alias("_tid"), F.col(text_col).alias("_txt"))
    cand = (
        cand.join(txt, cand.id_a == txt._tid)
        .withColumnRenamed("_txt", "txt_a").drop("_tid")
        .join(txt, cand.id_b == txt._tid)
        .withColumnRenamed("_txt", "txt_b").drop("_tid")
    )
    # exact verification via the Arrow-batched UDF — value-identical
    # to the shingle_jaccard/ngram_jaccard expressions (property-
    # tested) but without their per-lambda-element regex re-splits
    jac = jaccard_verify_udf(mode=verify, k=3)
    return (
        cand.withColumn("jaccard", jac(F.col("txt_a"), F.col("txt_b")))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


# ----------------------------------------------------------- simhash

def simhash_py(text: str) -> int:
    """64-bit SimHash over token hashes (reference implementation)."""
    th = _token_hashes(text or "")
    bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    v = (bits * 2 - 1).sum(axis=0)
    h = 0
    for i in range(64):
        if v[i] > 0:
            h |= 1 << i
    return h - (1 << 64) if h >= (1 << 63) else h


def simhash_udf():
    @pandas_udf("long")
    def _udf(texts: pd.Series) -> pd.Series:
        return pd.Series([simhash_py(t) for t in texts], dtype=np.int64)

    return _udf


def simhash_sigs_md5(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash signatures with an md5 token-hash family,
    computed entirely JVM-side (no Python in the path):

    token hash = first 8 bytes of md5(token), big-endian — exactly
    ``('0x' || substr(md5(tok),1,16))::UBIGINT`` in DuckDB, which is
    what makes this family fully SQL-oracle-able (the blake2b default
    in :func:`simhash_udf` is not expressible in SQL).

    Plan shape: explode tokens → md5/conv scalar expressions → ONE
    groupBy(id) with 64 algebraic SUM aggregates (map-side combined)
    → bit-majority OR-fold. Docs with no tokens keep sig=0 via a
    left join back onto the doc list (parity with simhash_py, where
    an empty token set hashes to a single 0)."""
    import functools

    ids = docs.select(F.col(id_col).alias("id")).dropDuplicates(["id"])
    tok = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.col(text_col), r"\s+")).alias("tok"),
    ).where(F.col("tok") != "")
    hx = F.md5(F.col("tok"))
    h = F.shiftleft(F.conv(F.substring(hx, 1, 8), 16, 10).cast("long"), 32).bitwiseOR(
        F.conv(F.substring(hx, 9, 8), 16, 10).cast("long")
    )
    th = tok.select("id", h.alias("h"))
    bitv = th.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"v{b}")
            for b in range(64)
        ]
    )
    sig = functools.reduce(
        lambda a, b: a.bitwiseOR(b),
        [
            F.when(
                F.col(f"v{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)
            ).otherwise(F.lit(0).cast("long"))
            for i in range(64)
        ],
    )
    sigs = bitv.select("id", sig.alias("sig"))
    return ids.join(sigs, "id", "left").select(
        "id", F.coalesce(F.col("sig"), F.lit(0).cast("long")).alias("sig")
    )


def dedup_simhash(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    hash_family: str = "blake2b",
) -> DataFrame:
    """SimHash near-dup pairs: band the 64-bit signature into 4
    16-bit chunks; by pigeonhole any pair within hamming<=3 shares at
    least one exact chunk → equi-join per chunk, then exact hamming
    filter via bit_count(xor).

    hash_family: "blake2b" (default, Arrow pandas UDF) or "md5"
    (pure JVM via :func:`simhash_sigs_md5`; DuckDB-oracle-able)."""
    if hash_family == "md5":
        sigs = simhash_sigs_md5(docs, id_col, text_col)
    else:
        sigs = docs.select(
            F.col(id_col).alias("id"), simhash_udf()(F.col(text_col)).alias("sig")
        )
    # both chunk self-join sides reference sigs — cache the 16 B/doc
    # signature rows so the signature computation (blake2b UDF or the
    # md5 64-sum aggregate) runs once, not once per branch
    sigs = sigs.persist()
    chunks = sigs.select(
        "id", "sig",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("chunk_ix"),
                    F.shiftright("sig", i * 16).bitwiseAND(F.lit(0xFFFF)).alias("chunk"),
                )
                for i in range(4)
            ])
        ).alias("c"),
    ).select("id", "sig", "c.chunk_ix", "c.chunk")
    a = chunks.select("chunk_ix", "chunk", F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    b = chunks.select("chunk_ix", "chunk", F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    return (
        a.join(b, ["chunk_ix", "chunk"])
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ------------------------------------------------- embedding near-dup

def dedup_embedding_cosine(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    exact: bool | None = None,
    bits: int = 8,
    tables: int = 8,
    seed: int = 42,
    probes: int | None = None,
) -> DataFrame:
    """Near-dup pairs by embedding cosine >= threshold.

    Default strategy (``exact=None``) is threshold-adaptive:

    * threshold >= 0.7 — the regime embedding-dedup usually runs in —
      uses **LSH-bucketed candidates + exact cosine re-rank** (one
      shuffle on bucket keys; random-hyperplane collision probability
      for a true pair at cos c is 1-(1-p^bits)^tables with
      p = 1 - arccos(c)/π, e.g. recall > 1 - 1e-7 at c=0.99 with the
      defaults). This is the 100 TB path: candidate volume ~
      collisions, never O(N²).
    * threshold < 0.7: **multi-probe LSH** (Lv et al. 2007) — per
      table each vector also lands in every bucket reachable by
      flipping a subset of its ``probes`` least-confident sign bits,
      precisely the bits a moderately-similar pair disagrees on. This
      keeps a sub-quadratic path open at low thresholds where base
      LSH recall collapses (at c=0.5 per-bit agreement is only ~0.67).
      Default ``probes=3`` there (8 buckets/table/vector — candidate
      volume stays linear); recall is APPROXIMATE — raise ``tables``
      and ``probes`` to push it toward 1, or pass ``exact=True`` for
      the all-pairs crossJoin on small corpora / oracle baselines.

    ``exact=True``/``False`` forces either path at any threshold;
    ``probes`` (``None`` = adaptive: 0 at >= 0.7, 3 below) controls
    multi-probing on the LSH path. Precision is always exact — every
    candidate is re-ranked by true cosine.
    """
    from lambdo_spark.functions.similarity import (
        cosine_expr, lsh_bucket_udf, lsh_multiprobe_udf,
    )

    if exact is None:
        exact = False
    if probes is None:
        probes = 0 if threshold >= 0.7 else 3
    if exact:
        a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
        b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
        cand = a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
    else:
        dim = len(emb.select(vec_col).first()[0])  # O(1) driver probe
        if probes > 0:
            udf = lsh_multiprobe_udf(dim, bits, tables, seed, probes)
        else:
            udf = lsh_bucket_udf(dim, bits, tables, seed)
        # ids only through the bucket shuffle (vectors are dim×8 B
        # ×tables if they ride the explode — they join back by id onto
        # the deduplicated candidate pairs instead, like the MinHash
        # text join); cached because both self-join sides reference it
        # (without the cache the projection UDF runs twice over the
        # full corpus)
        buckets = emb.select(
            F.col(id_col).alias("id"),
            F.explode(udf(F.col(vec_col))).alias("bucket"),
        ).persist()
        a = buckets.select("bucket", F.col("id").alias("id_a"))
        b = buckets.select("bucket", F.col("id").alias("id_b"))
        vecs = emb.select(F.col(id_col).alias("_vid"), F.col(vec_col).alias("_v"))
        cand = (
            a.join(b, "bucket")
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .dropDuplicates(["id_a", "id_b"])
        )
        cand = (
            cand.join(vecs, cand.id_a == vecs._vid)
            .withColumnRenamed("_v", "va").drop("_vid")
            .join(vecs, F.col("id_b") == vecs._vid)
            .withColumnRenamed("_v", "vb").drop("_vid")
        )
    return (
        cand.withColumn("cosine", cosine_expr(F.col("va"), F.col("vb")))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )


def dedup_keep_latest(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    tiebreak_cols: Sequence[str] = (),
    n: int = 1,
) -> DataFrame:
    """Keep the newest ``n`` rows per key — the canonical Common-Crawl
    url-level dedup (a url crawled in many dumps keeps its latest
    capture; WARC revisit handling does exactly this).

    ``n=1`` (the overwhelmingly common case) is ONE ``groupBy`` with a
    lexicographic struct max — map-side combined, no window, no sort:
    each task contributes one pre-reduced row per key, so a url crawled
    10^6 times shuffles one row per task, not 10^6. ``n>1`` uses a
    window partitioned BY KEY (never a global sort): rank within each
    key's rows only.

    Determinism: ties on ``ts_col`` break by ``tiebreak_cols``
    descending (give a unique column, e.g. the doc id — with a unique
    tiebreak the remaining payload never participates in the
    comparison). Residual ties (no unique tiebreak) break
    lexicographically on the payload columns, descending, in BOTH
    paths — the struct-max compares payload fields naturally, and the
    window path appends the orderable payload columns to its orderBy —
    so the two paths agree on tied rows. The one exception: rows whose
    payload includes map-typed columns (Spark cannot order maps) fall
    back to the window WITHOUT those columns in the orderBy, so a tie
    that is only resolved by a map value picks an arbitrary-but-single
    row; supply a unique ``tiebreak_cols`` there for full determinism.
    Rows with NULL timestamps lose to any non-null row.

    Output: the full original rows (all columns, original names), the
    kept one(s) per key.

    Rows with map-typed payload columns (Spark cannot compare maps, so
    they cannot ride inside the struct max) fall back to the
    keyed-window path automatically — same result, one sort per key
    instead of the map-side-combined aggregate.
    """
    from pyspark.sql.types import MapType

    payload = [
        c for c in df.columns
        if c not in set(key_cols) | {ts_col} | set(tiebreak_cols)
    ]

    def _unorderable(dt) -> bool:  # maps (incl. nested) can't be compared
        if dt is None:
            return False
        if isinstance(dt, MapType):
            return True
        if any(_unorderable(f.dataType) for f in getattr(dt, "fields", [])):
            return True
        return _unorderable(getattr(dt, "elementType", None))

    has_map = any(
        _unorderable(f.dataType) for f in df.schema.fields if f.name in payload
    )
    if n == 1 and not has_map:
        picked = df.groupBy(*key_cols).agg(
            F.max(
                F.struct(
                    F.col(ts_col),
                    *[F.col(c) for c in tiebreak_cols],
                    *[F.col(c) for c in payload],
                )
            ).alias("_pick")
        )
        return picked.select(
            *key_cols,
            *[F.col(f"_pick.{c}").alias(c) for c in (ts_col, *tiebreak_cols, *payload)],
        ).select(*df.columns)  # original column order
    from pyspark.sql import Window

    orderable_payload = [
        c for c in payload
        if not _unorderable(df.schema[c].dataType)
    ]
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(ts_col).desc(),
        *[F.col(c).desc() for c in tiebreak_cols],
        *[F.col(c).desc() for c in orderable_payload],
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n)
        .drop("_rn")
    )
