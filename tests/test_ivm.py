"""join_delta must equal recompute-minus-old under BAG semantics —
duplicate join keys multiply, and the three delta terms must partition
the new view's provenance pairs exactly (no row double-counted)."""

from __future__ import annotations

from collections import Counter

from sparkdiff.operators.ivm import join_delta


def _bag(df):
    return Counter(tuple(r) for r in df.collect())


def test_join_delta_equals_recompute_with_duplicates(spark):
    # duplicate keys on BOTH sides, in BOTH the stored and delta slices
    a_old = spark.createDataFrame(
        [(1, "a1"), (1, "a2"), (2, "a3")], "k int, av string"
    )
    a_delta = spark.createDataFrame(
        [(1, "a4"), (3, "a5")], "k int, av string"
    )
    b_old = spark.createDataFrame(
        [(1, "b1"), (3, "b2"), (3, "b3")], "k int, bv string"
    )
    b_delta = spark.createDataFrame(
        [(1, "b4"), (2, "b5")], "k int, bv string"
    )
    full_new = a_old.unionByName(a_delta).join(
        b_old.unionByName(b_delta), "k"
    )
    full_old = a_old.join(b_old, "k")
    expected = _bag(full_new) - _bag(full_old)
    got = _bag(join_delta(a_old, a_delta, b_old, b_delta, "k"))
    assert got == expected
    # sanity: the fixture really exercises multiplicity (1 matches 2x2
    # new pairs) and every term of the decomposition is non-empty
    assert sum(expected.values()) > 4


def test_join_delta_empty_deltas_is_empty(spark):
    a = spark.createDataFrame([(1, "a")], "k int, av string")
    b = spark.createDataFrame([(1, "b")], "k int, bv string")
    empty_a = a.limit(0)
    empty_b = b.limit(0)
    assert join_delta(a, empty_a, b, empty_b, "k").count() == 0
