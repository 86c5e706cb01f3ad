"""Frequent-itemset / association-rule mining over basket-shaped data
(Agrawal & Srikant 1994, VLDB — the Apriori support/confidence/lift
frame, restricted to the pair level that dominates real co-occurrence
analytics).

Scale shape: the pair generator is a self-equi-join ON THE BASKET KEY,
so the fan-out is Σ_b C(|b|, 2) — quadratic in the (bounded) basket
size, linear in baskets; it never materializes item × item.  Counts are
map-side-combined integer aggregates; the basket total rides as a
one-row broadcast (the q76/q90 stats shape).  Everything is exact
int64 — support/confidence/lift leave as per-mille integers, so the
whole table value-hash oracles (q166).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pair_association_rules(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
) -> DataFrame:
    """Unordered item-pair rules: ``(item_a, item_b, n_a, n_b, n_ab,
    support_pm, conf_ab_pm, conf_ba_pm, lift_pm)`` for pairs seen in at
    least ``min_support`` baskets.

    ``lift_pm = 1000 · P(ab) / (P(a)·P(b))`` computed as
    ``1000 · n_ab · n_baskets DIV (n_a · n_b)`` — pure int64 (both
    products stay far under 2^63 for any realistic catalog).  Duplicate
    (basket, item) rows are collapsed first, so counts are
    presence-based, as the support definition requires."""
    b, i = F.col(basket_col), F.col(item_col)
    items = baskets.select(b.alias("_b"), i.alias("_i")).distinct()
    n_baskets = items.select(
        F.countDistinct("_b").cast("long").alias("_n_baskets")
    )
    item_n = items.groupBy(F.col("_i").alias("_it")).agg(
        F.count(F.lit(1)).cast("long").alias("_n")
    )
    pairs = (
        items.alias("x")
        .join(items.alias("y"), "_b")
        .filter(F.col("x._i") < F.col("y._i"))
        .groupBy(
            F.col("x._i").alias("item_a"), F.col("y._i").alias("item_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
        .filter(F.col("n_ab") >= min_support)
    )
    return (
        pairs.join(
            item_n.select(F.col("_it").alias("item_a"), F.col("_n").alias("n_a")),
            "item_a",
        )
        .join(
            item_n.select(F.col("_it").alias("item_b"), F.col("_n").alias("n_b")),
            "item_b",
        )
        .join(F.broadcast(n_baskets))
        .select(
            "item_a",
            "item_b",
            "n_a",
            "n_b",
            "n_ab",
            F.expr("n_ab * 1000 DIV _n_baskets").cast("long").alias("support_pm"),
            F.expr("n_ab * 1000 DIV n_a").cast("long").alias("conf_ab_pm"),
            F.expr("n_ab * 1000 DIV n_b").cast("long").alias("conf_ba_pm"),
            F.expr("n_ab * 1000 * _n_baskets DIV (n_a * n_b)")
            .cast("long")
            .alias("lift_pm"),
        )
    )
