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


def test_pair_rules_match_brute_force_on_random_baskets(spark):
    """Seeded random baskets vs a Python brute-force mirror: every
    column of every rule row, at min_support=1 so nothing hides."""
    import itertools
    import random

    rng = random.Random(7)
    rows = []
    for b in range(40):
        for _ in range(rng.randint(1, 6)):
            rows.append((b, rng.choice("abcdefg")))
    df = spark.createDataFrame(rows, "basket int, item string")

    baskets = {}
    for b, i in rows:
        baskets.setdefault(b, set()).add(i)
    nb = len(baskets)
    item_n = {}
    pair_n = {}
    for items in baskets.values():
        for i in items:
            item_n[i] = item_n.get(i, 0) + 1
        for x, y in itertools.combinations(sorted(items), 2):
            pair_n[(x, y)] = pair_n.get((x, y), 0) + 1
    want = {
        (a, b): (
            item_n[a], item_n[b], n,
            n * 1000 // nb, n * 1000 // item_n[a], n * 1000 // item_n[b],
            n * 1000 * nb // (item_n[a] * item_n[b]),
        )
        for (a, b), n in pair_n.items()
    }
    got = {
        (r.item_a, r.item_b): (
            r.n_a, r.n_b, r.n_ab,
            r.support_pm, r.conf_ab_pm, r.conf_ba_pm, r.lift_pm,
        )
        for r in pair_association_rules(df, "basket", "item", min_support=1).collect()
    }
    assert got == want
