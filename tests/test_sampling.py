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
