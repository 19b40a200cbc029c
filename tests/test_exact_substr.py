"""Exact-substring span dedup (Lee et al. 2022, fixed-window form)."""

from lambdo_spark.functions.exact_substr import remove_duplicate_spans


def _run(spark, rows, **kw):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r["doc_id"]: r["text"]
        for r in remove_duplicate_spans(docs, **kw).collect()
    }


def test_cross_doc_span_removed(spark):
    span = "a b c d e f g h"  # exactly 8 tokens, shared by two docs
    out = _run(
        spark,
        [
            (1, f"intro {span} outro one"),
            (2, f"start {span} finish two"),
            (3, "totally unique text that nobody else repeats anywhere"),
        ],
    )
    assert out[1] == "intro outro one"
    assert out[2] == "start finish two"
    assert out[3] == "totally unique text that nobody else repeats anywhere"


def test_within_doc_repetition_removed(spark):
    span = "p q r s t u v w"
    out = _run(spark, [(1, f"{span} mid {span}")])
    assert out[1] == "mid"


def test_short_docs_pass_and_full_dup_empties(spark):
    span = "a b c d e f g h"
    out = _run(spark, [(1, span), (2, span), (3, "too short")])
    assert out[1] == "" and out[2] == ""
    assert out[3] == "too short"


def test_overlapping_windows_cover_long_span(spark):
    """A 10-token shared span: every covering 8-window repeats, so all
    10 tokens go — interval union across overlapping windows."""
    span = "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"
    out = _run(spark, [(1, f"x {span} y"), (2, f"z {span} w")])
    assert out[1] == "x y"
    assert out[2] == "z w"


def test_min_count_tolerance(spark):
    span = "a b c d e f g h"
    rows = [(1, f"one {span}"), (2, f"two {span}")]
    assert _run(spark, rows, min_count=3) == {
        1: f"one {span}", 2: f"two {span}"
    }


# ---------------------------------------------------------------- property
from hypothesis import given, settings, strategies as st


def _py_reference(texts, L=3, min_count=2):
    """Pure-Python span dedup: count L-windows corpus-wide, drop
    covered tokens, rejoin."""
    toks = [t.split() for t in texts]
    from collections import Counter

    cnt = Counter(
        " ".join(tk[i:i + L])
        for tk in toks for i in range(len(tk) - L + 1)
    )
    out = []
    for tk in toks:
        covered = set()
        for i in range(len(tk) - L + 1):
            if cnt[" ".join(tk[i:i + L])] >= min_count:
                covered.update(range(i, i + L))
        out.append(" ".join(t for j, t in enumerate(tk) if j not in covered))
    return out


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from("abcd"), min_size=0, max_size=12).map(" ".join),
        min_size=1,
        max_size=6,
    )
)
def test_property_matches_python_reference(spark, texts):
    """Tiny alphabet forces dense window collisions — overlap-union
    and boundary cases must match the sequential reference exactly."""
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["text"]
        for r in remove_duplicate_spans(docs, span_tokens=3).collect()
    }
    want = dict(enumerate(_py_reference(texts, L=3)))
    assert got == want

def test_hash128_equals_text_mode(spark):
    """The 16-byte md5 shuffle key and the exact-string key produce
    identical output (collision odds ~2^-128)."""
    import pytest

    rows = [
        (1, "intro a b c d e f g h outro one"),
        (2, "start a b c d e f g h finish two"),
        (3, "x y z x y z x y z x y z x y z"),
        (4, "short doc"),
        (5, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fast = {r["doc_id"]: r["text"]
            for r in remove_duplicate_spans(docs, key="hash128").collect()}
    exact = {r["doc_id"]: r["text"]
             for r in remove_duplicate_spans(docs, key="text").collect()}
    assert fast == exact
    with pytest.raises(ValueError, match="hash128"):
        remove_duplicate_spans(docs, key="sha512")
