"""Workload operators — the reference's Hive/Snowflake script patterns
(SURVEY.md §2.3–§2.7) as reusable DataFrame transforms.

The reference's ``resources/scripts/nw_customer/nw_customer_PRE_300.hql``
pipeline is the canonical shape: UNION ALL of branch subqueries, LIKE
filters over ``lower(coalesce(...))``, an expression-key join, a
CASE-derived ordering key, and ``row_number()`` dedup keeping the best row
per business key (W1/W2/U1/J2/J3 in SURVEY §2).

Every helper takes/returns DataFrames so compositions stay inside one
Catalyst plan; all orderings demand a *total* order (caller supplies
tiebreaks) so results are deterministic under any partitioning.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dedup_latest(
    df: DataFrame, keys: Sequence[str], order: Sequence[Column]
) -> DataFrame:
    """W1: ``row_number() OVER (PARTITION BY keys ORDER BY order) = 1``.

    The reference's top-1-per-group dedup
    (``nw_customer_PRE_300.hql:21,43``).  ``order`` must be a total order.
    At scale this is one shuffle on ``keys``; AQE handles skewed keys.
    """
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_rwn", F.row_number().over(w))
        .filter(F.col("_rwn") == 1)
        .drop("_rwn")
    )


def keep_max(
    df: DataFrame, keys: Sequence[str], order_cols: Sequence[str]
) -> DataFrame:
    """A6/A8: keep the row with the lexicographically-greatest
    ``order_cols`` per key — ``max_by`` over a struct, i.e. the Hive
    ``collect_max_one`` UDAF (reference ``tools/script_converter_tool.py:48-62``)
    without a custom UDAF.  One-pass partial aggregation: cheaper than a
    window when only the winning row is needed (no full sort per group).
    """
    value = F.struct(*[F.col(c) for c in df.columns])
    ordering = F.struct(*[F.col(c) for c in order_cols])
    agg = df.groupBy(*keys).agg(F.max_by(value, ordering).alias("_best"))
    keep = [c for c in df.columns if c not in keys]
    return agg.select(*keys, *[F.col(f"_best.{c}").alias(c) for c in keep])


def top_k_per_group(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """T7: top-k per group via ``row_number`` ≤ k (the reference's
    top-3-per-platform stage, ``mcp_enhanced_search_agent.py:1090-1144``)."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )


def case_ordering_key(branches: Sequence[tuple[Column, int]], default: int = 1) -> Column:
    """W2: the CASE-derived ``forOrdering`` priority key
    (``nw_customer_PRE_300.hql:34-38``)."""
    expr = None
    for cond, rank in branches:
        expr = F.when(cond, F.lit(rank)) if expr is None else expr.when(cond, F.lit(rank))
    return (expr.otherwise(F.lit(default)) if expr is not None else F.lit(default))


def normalized_not_like(col: str, pattern: str) -> Column:
    """P5: ``lower(COALESCE(col,'')) NOT LIKE pattern``
    (``nw_customer_PRE_300.hql:10,28``)."""
    return ~F.lower(F.coalesce(F.col(col), F.lit(""))).like(pattern)
