"""Stratified sampling: exact quotas, determinism, salt-invariance."""

from pyspark.sql import functions as F

from lambdo_spark.functions.sampling import sample_stratified


def _docs(spark):
    rows = [(i, ["en", "de", "fr"][i % 3]) for i in range(90)]
    rows += [(100 + i, "tiny") for i in range(3)]  # group smaller than n
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_exact_quota_and_small_group(spark):
    out = sample_stratified(_docs(spark), ["lang"], 10, ["doc_id"]).toPandas()
    sizes = out.groupby("lang").size().to_dict()
    assert sizes == {"en": 10, "de": 10, "fr": 10, "tiny": 3}
    assert sorted(out["_rk"].unique()) == list(range(1, 11))


def test_salt_invariance_and_seed(spark):
    """Two-phase output == single-window output (salt_buckets=1) for
    any bucket count; a different seed draws a different sample."""
    d = _docs(spark)
    picked = lambda **kw: sorted(
        (r["lang"], r["doc_id"])
        for r in sample_stratified(d, ["lang"], 7, ["doc_id"], **kw).collect()
    )
    base = picked(salt_buckets=1)
    assert picked(salt_buckets=16) == base
    assert picked(salt_buckets=5) == base
    assert picked(seed="other") != base


def test_deterministic_across_runs(spark):
    d = _docs(spark).repartition(13)
    a = sample_stratified(d, ["lang"], 5, ["doc_id"]).collect()
    b = sample_stratified(d.repartition(3), ["lang"], 5, ["doc_id"]).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_fraction_mode(spark):
    import pytest

    d = _docs(spark)  # en/de/fr 30 each, tiny 3
    out = sample_stratified(d, ["lang"], None, ["doc_id"], fraction=0.1).toPandas()
    # ceil(30 * 0.1) = 3 per big group, ceil(3 * 0.1) = 1 for tiny
    assert out.groupby("lang").size().to_dict() == {
        "en": 3, "de": 3, "fr": 3, "tiny": 1
    }
    with pytest.raises(ValueError, match="exactly one"):
        sample_stratified(d, ["lang"], 5, ["doc_id"], fraction=0.1)
    with pytest.raises(ValueError, match="exactly one"):
        sample_stratified(d, ["lang"], None, ["doc_id"])


def test_shuffle_deterministic(spark):
    from lambdo_spark.functions.sampling import shuffle_deterministic

    d = _docs(spark)
    a = shuffle_deterministic(d.repartition(7), ["doc_id"]).collect()
    b = shuffle_deterministic(d.repartition(2), ["doc_id"]).collect()
    ra = {r["doc_id"]: r["shuffle_rank"] for r in a}
    rb = {r["doc_id"]: r["shuffle_rank"] for r in b}
    assert ra == rb                      # partitioning-independent
    assert sorted(ra.values()) == list(range(1, len(ra) + 1))  # dense
    rc = {
        r["doc_id"]: r["shuffle_rank"]
        for r in shuffle_deterministic(d, ["doc_id"], seed="ep2").collect()
    }
    assert rc != ra                      # new epoch, new permutation


def test_pack_sequences(spark):
    from lambdo_spark.functions.sampling import pack_sequences

    rows = [(i, 10 + (i * 7) % 40) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long").repartition(9)
    out = (
        pack_sequences(df, "n_tok", 128, ["doc_id"])
        .orderBy("doc_id")
        .toPandas()
    )
    # sequential reference: running cut every 128 tokens
    cum = 0
    for _, r in out.iterrows():
        assert r["pack_id"] == cum // 128
        assert r["pack_offset"] == cum % 128
        cum += r["n_tok"]
    # partitioning-independent
    out2 = (
        pack_sequences(df.repartition(2), "n_tok", 128, ["doc_id"])
        .orderBy("doc_id").toPandas()
    )
    assert out.equals(out2)


def test_recipe_quotas(spark):
    """Dict quotas = an explicit mixing recipe; unlisted strata drop."""
    import pytest

    out = sample_stratified(
        _docs(spark), ["lang"], {"en": 4, "de": 2}, ["doc_id"]
    ).toPandas()
    assert out.groupby("lang").size().to_dict() == {"en": 4, "de": 2}
    with pytest.raises(ValueError, match="one group column"):
        sample_stratified(_docs(spark), ["lang", "lang"], {"en": 1}, ["doc_id"])

def test_fraction_mode_null_stratum(spark):
    """NULL strata must survive fraction mode (null-safe count join),
    matching the absolute-n mode where the window keeps NULL as its
    own group — previously the inner equi-join silently dropped them."""
    rows = [(i, None if i < 20 else "en") for i in range(50)]
    d = spark.createDataFrame(rows, "doc_id long, lang string")
    out = sample_stratified(d, ["lang"], None, ["doc_id"], fraction=0.2).toPandas()
    sizes = {k if k == k else None: v  # NaN key → None
             for k, v in out.groupby("lang", dropna=False).size().items()}
    assert sizes == {None: 4, "en": 6}  # ceil(20*0.2)=4, ceil(30*0.2)=6
    # and it agrees with absolute-n mode's treatment of the NULL group
    out_n = sample_stratified(d, ["lang"], 4, ["doc_id"]).toPandas()
    assert out_n.groupby("lang", dropna=False).size().to_dict() == {
        None: 4, "en": 4
    } or len(out_n[out_n["lang"].isna()]) == 4


def test_pack_sequences_tied_order(spark):
    """Rows tied on order_cols must land in DISJOINT pack slots (ROWS
    prefix frame) — under the default RANGE frame every tied row saw
    the whole tie group's tokens and packs overlapped."""
    from lambdo_spark.functions.sampling import pack_sequences

    # 6 rows, ALL tied on the order key, 50 tokens each, budget 128
    rows = [(1, 50, i) for i in range(6)]
    df = spark.createDataFrame(rows, "grp long, n_tok long, doc_id long")
    out = pack_sequences(df, "n_tok", 128, ["grp"]).toPandas()
    starts = sorted(
        int(r["pack_id"] * 128 + r["pack_offset"]) for _, r in out.iterrows()
    )
    # a valid sequential packing in SOME tie order: starts are exactly
    # the running prefix sums 0,50,100,...,250 — never duplicated
    assert starts == [0, 50, 100, 150, 200, 250]
    assert out["pack_id"].tolist().count(0) == 3  # 0,50,100 fit in pack 0
