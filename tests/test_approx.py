"""Approximate-aggregate scale alternatives, pinned against exact.

The oracle gate needs bit-stable answers, so the registered queries use
exact aggregation; these pin the bounded-error claims of the approximate
twins a 100 TB deployment would switch to (HLL++ distinct counts, GK
quantile sketches — one pass, fixed memory, no giant shuffle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkdiff.session import load_table

from .conftest import SF_DIR_ORACLE


def test_approx_count_distinct_within_rsd(spark):
    orders = load_table(spark, SF_DIR_ORACLE, "orders")
    row = orders.agg(
        F.countDistinct("o_custkey").alias("exact"),
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx"),
    ).collect()[0]
    assert row.exact > 0
    rel_err = abs(row.approx - row.exact) / row.exact
    assert rel_err < 0.05, (row.exact, row.approx)


def test_approx_count_distinct_is_deterministic(spark):
    orders = load_table(spark, SF_DIR_ORACLE, "orders")
    vals = {
        orders.repartition(n)
        .agg(F.approx_count_distinct("o_custkey", rsd=0.02))
        .collect()[0][0]
        for n in (2, 8, 32)
    }
    # HLL++ merges are commutative: the estimate must not depend on
    # partitioning, else round-over-round metrics would jitter
    assert len(vals) == 1, vals
