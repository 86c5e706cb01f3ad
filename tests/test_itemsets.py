"""Hand-checkable pins for pair_association_rules: presence-based
counts, min-support gate, and the exact per-mille ratio arithmetic."""

from __future__ import annotations

from sparkdiff.operators.itemsets import pair_association_rules


def test_pair_rules_hand_checked(spark):
    # 4 baskets: {a,b}, {a,b}, {a,c}, {b} — with a duplicate (1, a)
    # row that presence-counting must collapse
    rows = [
        (1, "a"), (1, "a"), (1, "b"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "c"),
        (4, "b"),
    ]
    df = spark.createDataFrame(rows, "basket int, item string")
    got = {
        (r.item_a, r.item_b): r
        for r in pair_association_rules(df, "basket", "item").collect()
    }
    # only (a,b) reaches support 2; (a,c) has support 1
    assert set(got) == {("a", "b")}
    r = got[("a", "b")]
    assert (r.n_a, r.n_b, r.n_ab) == (3, 3, 2)
    assert r.support_pm == 2 * 1000 // 4
    assert r.conf_ab_pm == 2 * 1000 // 3
    assert r.conf_ba_pm == 2 * 1000 // 3
    assert r.lift_pm == 2 * 1000 * 4 // (3 * 3)


def test_pair_rules_min_support_one_keeps_singletons(spark):
    rows = [(1, "x"), (1, "y"), (2, "x"), (2, "z")]
    df = spark.createDataFrame(rows, "basket int, item string")
    got = {
        (r.item_a, r.item_b)
        for r in pair_association_rules(df, "basket", "item", min_support=1).collect()
    }
    assert got == {("x", "y"), ("x", "z")}
