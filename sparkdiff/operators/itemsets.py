"""Frequent-itemset / association-rule mining over basket-shaped data
(Agrawal & Srikant 1994, VLDB — the Apriori support/confidence/lift
frame, restricted to the pair level that dominates real co-occurrence
analytics).

Scale shape: baskets collapse to ONE sorted distinct-item array per
basket key (map-side-combined collect_set), and pairs fan out map-side
from each array — the fan-out is Σ_b C(|b|, 2), quadratic in the
(bounded) basket size, linear in baskets; it never materializes
item × item and never self-joins the item table.  Counts are
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
    # Round 9 (guide §2.3/§2.4): one groupBy(basket) collect_set replaces
    # the old distinct + self-equi-join-on-basket pair generator — the
    # q164 sorted-array map-side pair fan-out.  The basket-array table is
    # ONE row per basket (arrays bounded by basket size) and feeds three
    # consumers (basket total, item counts, pair fan-out), so it is
    # persisted (PERSISTS_BY_DESIGN convention; released by the session
    # owner's clearCache).  Pair semantics are unchanged: sort_array +
    # (index i < j) enumerates exactly the distinct unordered item pairs
    # with item_a < item_b the old join produced.
    arrs = (
        baskets.select(b.alias("_b"), i.alias("_i"))
        .groupBy("_b")
        .agg(F.sort_array(F.collect_set("_i")).alias("_arr"))
        .persist()
    )
    n_baskets = arrs.agg(F.count(F.lit(1)).cast("long").alias("_n_baskets"))
    item_n = (
        arrs.select(F.explode("_arr").alias("_it"))
        .groupBy("_it")
        .agg(F.count(F.lit(1)).cast("long").alias("_n"))
    )
    pair_arr = F.flatten(
        F.transform(
            F.col("_arr"),
            lambda x, ix: F.transform(
                F.slice(
                    F.col("_arr"), ix + 2, F.size(F.col("_arr"))
                ),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    pairs = (
        arrs.select(F.explode(pair_arr).alias("_p"))
        .groupBy(
            F.col("_p.a").alias("item_a"), F.col("_p.b").alias("item_b")
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
