"""Dedup operators: planted duplicates must be found; reported pairs
must be exact (verified similarity above threshold)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lambdo_spark.functions.dedup import (
    dedup_embedding_cosine,
    dedup_exact,
    dedup_minhash_lsh,
    dedup_simhash,
    dedup_tokenset,
    simhash_py,
)

BASE = "the quick brown fox jumps over the lazy dog near the old river bank today"
NEAR = BASE.replace("today", "tonight")  # 1-token change → high jaccard
FAR = "completely different content about spark shuffles and parquet files"


def _docs(spark):
    rows = [
        (1, BASE), (2, BASE),          # exact dup pair
        (3, NEAR),                      # near dup of 1/2
        (4, FAR), (5, "the quick brown fox"),
        (6, " ".join(reversed(BASE.split()))),  # reordering of BASE
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dedup_exact(spark):
    out = dedup_exact(_docs(spark)).collect()
    by_keep = {r["keep_id"]: r["dup_count"] for r in out}
    assert by_keep[1] == 2           # docs 1,2 collapse
    assert sum(by_keep.values()) == 6


def test_dedup_tokenset_catches_reordering(spark):
    out = dedup_tokenset(_docs(spark)).collect()
    by_keep = {r["keep_id"]: r["dup_count"] for r in out}
    assert by_keep[1] == 3           # 1, 2 and the reordered 6


def test_minhash_lsh_finds_planted_pairs(spark):
    out = dedup_minhash_lsh(_docs(spark), threshold=0.8).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in out}
    assert (1, 2) in pairs           # exact dup
    assert (1, 3) in pairs and (2, 3) in pairs  # near dup
    # NB: (1,6) (reversal) is NOT required — shingling is order-
    # sensitive by design; reorderings are dedup_tokenset's job
    for r in out:                    # verification is exact jaccard
        assert r["jaccard"] >= 0.8
    assert not any({4, 5} & {a, b} for a, b in pairs if (a, b) != (4, 5))


def test_simhash_reference_properties():
    assert simhash_py(BASE) == simhash_py(BASE)
    h1, h2 = simhash_py(BASE), simhash_py(NEAR)
    assert bin((h1 ^ h2) & (2**64 - 1)).count("1") <= 16  # near docs → close
    hf = simhash_py(FAR)
    assert bin((h1 ^ hf) & (2**64 - 1)).count("1") > 10


def test_dedup_simhash_pairs(spark):
    out = dedup_simhash(_docs(spark), max_hamming=3).collect()
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in out}
    assert pairs[(1, 2)] == 0
    assert pairs[(1, 6)] == 0        # simhash is order-insensitive
    assert (1, 4) not in pairs


def _simhash_md5_py(text: str) -> int:
    """Pure-Python reference for the md5 hash family (big-endian
    first 8 bytes of md5(token)) — mirrors simhash_sigs_md5's JVM
    expressions and the DuckDB oracle SQL bit for bit."""
    import hashlib

    toks = text.split()
    hs = [int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big") for t in toks] or [0]
    sig = 0
    for b in range(64):
        v = sum(1 if (h >> b) & 1 else -1 for h in hs)
        if v > 0:
            sig |= 1 << b
    return sig - (1 << 64) if sig >= (1 << 63) else sig


def test_simhash_md5_jvm_matches_python(spark):
    from lambdo_spark.functions.dedup import simhash_sigs_md5

    docs = _docs(spark).union(
        spark.createDataFrame([(7, ""), (8, "   ")], "doc_id long, text string")
    )
    got = {r["id"]: r["sig"] for r in simhash_sigs_md5(docs).collect()}
    want = {
        1: _simhash_md5_py(BASE), 2: _simhash_md5_py(BASE),
        3: _simhash_md5_py(NEAR), 4: _simhash_md5_py(FAR),
        5: _simhash_md5_py("the quick brown fox"),
        6: _simhash_md5_py(" ".join(reversed(BASE.split()))),
        7: 0, 8: 0,  # token-less docs keep sig=0 (simhash_py parity)
    }
    assert got == want


def test_dedup_simhash_md5_pairs(spark):
    out = dedup_simhash(_docs(spark), max_hamming=3, hash_family="md5").collect()
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in out}
    assert pairs[(1, 2)] == 0
    assert pairs[(1, 6)] == 0        # order-insensitive
    assert (1, 4) not in pairs


def test_dedup_embedding_cosine(spark):
    rng = np.random.default_rng(0)
    v1 = rng.standard_normal(16).tolist()
    v2 = [x * 1.001 for x in v1]              # near-identical direction
    v3 = rng.standard_normal(16).tolist()
    emb = spark.createDataFrame(
        [(1, v1), (2, v2), (3, v3)], "vec_id long, embedding array<double>"
    )
    out = dedup_embedding_cosine(emb, threshold=0.99).collect()
    assert {(r["id_a"], r["id_b"]) for r in out} == {(1, 2)}


def test_minhash_shingle_verify_matches_exact(spark):
    """verify="shingle": the verified output equals the exact
    brute-force {pairs: shingle_jaccard >= t} set (the measure the
    MinHash family approximates — this is what makes the driver row
    oracle-able)."""
    from lambdo_spark.functions.dedup import shingle_jaccard

    docs = _docs(spark)
    got = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in dedup_minhash_lsh(docs, threshold=0.5, verify="shingle").collect()
    }
    exact_df = (
        docs.selectExpr("doc_id AS id_a", "text AS ta")
        .crossJoin(docs.selectExpr("doc_id AS id_b", "text AS tb"))
        .where("id_a < id_b")
        .withColumn("jaccard", F.round(shingle_jaccard(F.col("ta"), F.col("tb")), 6))
        .where("jaccard >= 0.5")
    )
    exact = {(r["id_a"], r["id_b"], r["jaccard"]) for r in exact_df.collect()}
    assert got == exact and (1, 2, 1.0) in got


def test_dedup_keep_latest(spark):
    """n=1 struct-max pick == windowed n=1 == pandas idxmax; ties break
    by the tiebreak column descending; n=2 keeps the two newest."""
    import datetime as dt

    import pandas as pd

    from lambdo_spark.functions.dedup import dedup_keep_latest

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("u1", t0, 1, "a"),
        ("u1", t0 + dt.timedelta(hours=2), 2, "b"),   # latest for u1
        ("u1", t0 + dt.timedelta(hours=1), 3, "c"),
        ("u2", t0, 4, "d"),
        ("u2", t0, 5, "e"),                            # ts tie → id 5 wins
        ("u3", t0 + dt.timedelta(days=1), 6, "f"),
    ]
    df = spark.createDataFrame(
        rows, "url string, ts timestamp, doc_id long, text string"
    )
    got = (
        dedup_keep_latest(df, ["url"], "ts", ["doc_id"])
        .toPandas().sort_values("url").reset_index(drop=True)
    )
    assert got["doc_id"].tolist() == [2, 5, 6]
    assert got.columns.tolist() == ["url", "ts", "doc_id", "text"]

    # windowed path (n>1) agrees on n=1 semantics via its top row
    got2 = (
        dedup_keep_latest(df, ["url"], "ts", ["doc_id"], n=2)
        .toPandas().sort_values(["url", "doc_id"]).reset_index(drop=True)
    )
    assert got2["doc_id"].tolist() == [2, 3, 4, 5, 6]

    # pandas oracle for the n=1 pick
    pdf = pd.DataFrame(rows, columns=["url", "ts", "doc_id", "text"])
    exp = (
        pdf.sort_values(["ts", "doc_id"])
        .groupby("url").tail(1)
        .sort_values("url")["doc_id"].tolist()
    )
    assert got["doc_id"].tolist() == exp


def test_dedup_keep_latest_plan_is_one_aggregate(spark):
    """The n=1 pick must plan as hash aggregate with a map-side partial
    (one Exchange) — no Window, no global sort."""
    from lambdo_spark.functions.dedup import dedup_keep_latest

    df = spark.range(0, 1000).selectExpr(
        "concat('u', id % 37) AS url",
        "timestamp_seconds(1704067200 + id * 60) AS ts",
        "id AS doc_id",
        "repeat('x', 10) AS text",
    )
    plan = (
        dedup_keep_latest(df, ["url"], "ts", ["doc_id"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan
    assert plan.count("Exchange") == 1
    assert "partial_max" in plan  # map-side combine on the struct


def test_dedup_keep_latest_map_payload_falls_back(spark):
    """Map-typed payload can't ride in a struct max (maps aren't
    orderable) — the op must fall back to the keyed window and still
    return whole rows."""
    from lambdo_spark.functions.dedup import dedup_keep_latest

    df = spark.createDataFrame(
        [("u1", 1, 10, {"a": 1}), ("u1", 2, 20, {"b": 2})],
        "url string, ts long, doc_id long, props map<string,int>",
    ).withColumn("ts", F.timestamp_seconds(F.col("ts")))
    got = dedup_keep_latest(df, ["url"], "ts", ["doc_id"]).toPandas()
    assert got["doc_id"].tolist() == [20]
    assert got["props"].iloc[0] == {"b": 2}


def test_minhash_band_shuffle_carries_no_text(spark):
    """Scale guard: the LSH band explode/exchange must ship only
    (id, band_ix, band_key) — document text joins in once per unique
    candidate pair AFTER dedup, never ×bands through the shuffle."""
    plan = (
        dedup_minhash_lsh(_docs(spark), threshold=0.8)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    for line in plan.splitlines():
        if "posexplode" in line.lower() or "Generate" in line:
            assert "text#" not in line and "txt" not in line, line


def test_minhash_bucket_cap_reports_drops(spark):
    """No silent caps: a flood bucket dropped by bucket_cap must be
    counted into the caller's metrics dict (and an un-capped run
    reports zero)."""
    # 30 identical docs → every band bucket holds all 30 copies
    flood = spark.createDataFrame(
        [(i, BASE) for i in range(30)], "doc_id long, text string"
    )
    metrics = {}
    out = dedup_minhash_lsh(flood, threshold=0.8, bucket_cap=10, metrics=metrics)
    assert out.count() == 0                      # every bucket was capped
    assert metrics["dropped_buckets"] > 0
    assert metrics["dropped_doc_slots"] >= 30    # ≥ docs × 1 band

    ok = {}
    got = dedup_minhash_lsh(_docs(spark), threshold=0.8, metrics=ok)
    assert {(r["id_a"], r["id_b"]) for r in got.collect()} >= {(1, 2), (1, 3)}
    assert ok == {"dropped_buckets": 0, "dropped_doc_slots": 0}


def test_embedding_low_threshold_multiprobe(spark):
    """Below cosine 0.7 the implicit path is multi-probe LSH (probes
    auto-set to 3) — sub-quadratic, approximate recall, exact
    precision; exact=True still opts into the all-pairs crossJoin."""
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    impl = dedup_embedding_cosine(emb, threshold=0.4).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in impl}
    assert pairs == {(1, 2)}  # precision exact; the close pair recalled
    out = dedup_embedding_cosine(emb, threshold=0.4, exact=True).collect()
    assert {(r["id_a"], r["id_b"]) for r in out} == {(1, 2)}
    # the implicit low-threshold plan is NOT a crossJoin
    plan = dedup_embedding_cosine(
        emb, threshold=0.4
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "Cross" not in plan, plan


def test_keep_latest_window_path_breaks_ties_on_payload(spark):
    """ADVICE fix: with NO unique tiebreak, the windowed path must
    break residual ties lexicographically on payload (desc) — same
    rule as the struct-max path, so both paths return the same row."""
    from lambdo_spark.functions.dedup import dedup_keep_latest

    df = spark.createDataFrame(
        [("u1", 100, "aaa"), ("u1", 100, "zzz"), ("u1", 99, "mmm")],
        "url string, ts long, text string",
    ).withColumn("ts", F.timestamp_seconds(F.col("ts")))
    structmax = dedup_keep_latest(df, ["url"], "ts").toPandas()
    # n=1 always takes struct-max, so exercise the window path via n=2
    # and check its top-ranked row matches the struct-max pick
    top2 = (
        dedup_keep_latest(df, ["url"], "ts", n=2)
        .orderBy(F.col("ts").desc(), F.col("text").desc())
        .toPandas()
    )
    assert structmax["text"].tolist() == ["zzz"]
    assert top2["text"].tolist()[0] == "zzz"


def test_minhash_batch_kernel_matches_per_doc_reference(spark):
    """The cross-doc vectorized band kernel must be bit-identical to
    the single-doc reference path (minhash_signature + band fold),
    including the short-doc (<k tokens) and empty-doc rules."""
    from lambdo_spark.functions.dedup import (
        _splitmix64,
        minhash_bands_udf,
        minhash_signature,
    )

    texts = [
        BASE, NEAR, FAR, "", "   ", "one", "one two",
        " ".join(f"w{i % 7}" for i in range(200)),
        "  padded   whitespace   tokens  ",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: list(r["bnd"])
        for r in df.select(
            "doc_id", minhash_bands_udf(64, 16)(F.col("text")).alias("bnd")
        ).collect()
    }
    band_ix = np.arange(16, dtype=np.uint64)
    for i, t in enumerate(texts):
        sig = minhash_signature(t or "", 64)
        bnd = sig.reshape(16, 4)
        with np.errstate(over="ignore"):
            bs = _splitmix64(bnd.sum(axis=1, dtype=np.uint64))
            keys = _splitmix64(bs * np.uint64(1315423911) + band_ix)
        assert got[i] == list(keys.astype(np.int64)), f"doc {i}: {t[:30]!r}"


def test_minhash_band_plan_arithmetic():
    """S-curve planner: hand-checked MMDS §3.4 cases.

    64 hashes @ t=0.8: b=8 (r=8) has recall 1-(1-0.8^8)^8 ≈ 0.77
    (below the 0.95 bar) while b=16 (r=4) has ≈ 0.9998 and the
    highest inflection among qualifying splits → (16, 4).
    At t=0.5 the b=16 split's recall drops to ≈ 0.644, so the planner
    must step down the curve to b=32 (r=2, recall ≈ 0.990)."""
    from lambdo_spark.functions.dedup import minhash_band_plan

    b, r, rec = minhash_band_plan(0.8, num_hashes=64)
    assert (b, r) == (16, 4) and rec > 0.999
    b, r, rec = minhash_band_plan(0.5, num_hashes=64)
    assert (b, r) == (32, 2) and 0.95 <= rec < 1.0
    # pathological: nothing clears the bar -> max-recall fallback
    b, r, rec = minhash_band_plan(0.05, num_hashes=4, min_recall=0.9999999)
    assert b * r == 4 and rec == max(
        1 - (1 - 0.05 ** (4 // bb)) ** bb for bb in (1, 2, 4)
    )
    with pytest.raises(ValueError):
        minhash_band_plan(0.0)


def test_minhash_auto_bands_matches_exact(spark):
    """bands="auto" at t=0.5 (where the fixed 16-band default is
    recall-weak) returns exactly the brute-force shingle-Jaccard pair
    set, and reports the chosen plan in metrics."""
    from lambdo_spark.functions.dedup import shingle_jaccard

    docs = _docs(spark)
    metrics = {}
    got = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in dedup_minhash_lsh(
            docs, threshold=0.5, verify="shingle", bands="auto", metrics=metrics
        ).collect()
    }
    assert metrics["band_plan"]["bands"] == 32
    assert metrics["band_plan"]["rows"] == 2
    exact_df = (
        docs.selectExpr("doc_id AS id_a", "text AS ta")
        .crossJoin(docs.selectExpr("doc_id AS id_b", "text AS tb"))
        .where("id_a < id_b")
        .withColumn("jaccard", F.round(shingle_jaccard(F.col("ta"), F.col("tb")), 6))
        .where("jaccard >= 0.5")
    )
    exact = {(r["id_a"], r["id_b"], r["jaccard"]) for r in exact_df.collect()}
    assert got == exact

def test_jaccard_udf_matches_expressions(spark):
    """jaccard_verify_udf must be VALUE-IDENTICAL to the JVM
    expression forms (shingle_jaccard / ngram_jaccard) — including the
    Java-regex \\s (ASCII-only), Spark trim (space only), empty-string
    and short-doc edge rules — property-checked over adversarial
    strings."""
    from lambdo_spark.functions.dedup import (
        jaccard_verify_udf, ngram_jaccard, shingle_jaccard,
    )

    samples = [
        "", " ", "  ", "a", "a b", "a b c", "a b c d e",
        "a  b\tc\nd", " leading", "trailing ", "\tTABS\t",
        "a b c d",          # NBSP: not \s in Java ASCII regex
        "x y z x y z x y z", "UPPER lower MiXeD",
        "tok " * 50, "a b c\x0b d", "　wide space　 a b",
    ]
    rows = [(i, samples[i % len(samples)], samples[(i * 7 + 3) % len(samples)])
            for i in range(len(samples) ** 2)]
    df = spark.createDataFrame(rows, "i long, ta string, tb string")
    got = df.select(
        "i",
        shingle_jaccard(F.col("ta"), F.col("tb")).alias("sh_expr"),
        ngram_jaccard(F.col("ta"), F.col("tb")).alias("tk_expr"),
        jaccard_verify_udf("shingle")(F.col("ta"), F.col("tb")).alias("sh_udf"),
        jaccard_verify_udf("token")(F.col("ta"), F.col("tb")).alias("tk_udf"),
    ).collect()
    for r in got:
        assert r["sh_expr"] == r["sh_udf"], (r["i"], r["sh_expr"], r["sh_udf"])
        assert r["tk_expr"] == r["tk_udf"], (r["i"], r["tk_expr"], r["tk_udf"])
