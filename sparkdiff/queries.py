"""Named queries — the engine's driver-checked surface.

Every entry here implements an operator (or operator composition) from
SURVEY.md §2 and has, where SQL-expressible, a matching DuckDB oracle in
``sparkdiff.oracles``.  Each callable takes ``(spark, sf_dir)`` and
returns a lazy DataFrame.

Determinism rules (so the driver's order-insensitive value-hash matches):

- every computed column is explicitly aliased, identically to the oracle;
- double aggregation goes through exact integer/decimal arithmetic and is
  cast to double only at the end (Spark's partial-agg order can otherwise
  flip low bits vs a serial oracle);
- every top-k / argmax has a total tiebreak order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkdiff import testkit
from sparkdiff.operators.diff import cell_diff, presence_diff, table_metrics
from sparkdiff.session import load_table


def _cents(col: str | F.Column) -> F.Column:
    """Exact integer-cents representation of a 2-decimal double column.

    Integer arithmetic is associative, so distributed partial aggregation
    yields bit-identical results to any serial oracle — the determinism
    backbone for money-typed aggregates.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100, 0).cast("long")


# ---------------------------------------------------------------------------
# Diff family (SURVEY §2.3 J1/J4, §2.4 A1/A9/A10, §2.8 F6) — flagship
# ---------------------------------------------------------------------------

def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped rollup over lineitem (SURVEY §2.4 A7/A10 class).

    Money math in integer cents (see ``_cents``) so the distributed sum is
    exact; rendered as doubles at the end.
    """
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02")
    )
    qty_c = _cents("l_quantity")
    price_c = _cents("l_extendedprice")
    disc_c = _cents("l_discount")
    tax_c = _cents("l_tax")
    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(qty_c) / F.lit(100.0)).alias("sum_qty"),
            (F.sum(price_c) / F.lit(100.0)).alias("sum_base_price"),
            (F.sum(price_c * (100 - disc_c)) / F.lit(1_000_000.0)).alias(
                "sum_disc_price"
            ),
            (F.sum(price_c * (100 - disc_c) * (100 + tax_c)) / F.lit(1e8)).alias(
                "sum_charge"
            ),
            (
                F.sum(qty_c).cast("double") / (F.count(F.lit(1)) * F.lit(100.0))
            ).alias("avg_qty"),
            (
                F.sum(price_c).cast("double") / (F.count(F.lit(1)) * F.lit(100.0))
            ).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q02_presence_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-presence diff on the perturbed pair (J1: pandas outer-merge with
    indicator → pk-only full-outer join)."""
    hive, sf = testkit.hive_sf_pair(spark, sf_dir)
    return presence_diff(hive, sf, "c_custkey")


def q03_cell_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cell-level diff with excluded column suppressed (J4 + X1: the
    per-id stored-proc loop as ONE distributed job)."""
    hive, sf = testkit.hive_sf_pair(spark, sf_dir)
    return cell_diff(hive, sf, "c_custkey", exclude_cols=testkit.EXCLUDE_COLS)


def q04_metrics_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``dw_data_metrics`` row (A9/A10, ``db-setup.sql:76-102``) with
    PK arrays rendered as sorted comma-joined strings (portable shape)."""
    hive, sf = testkit.hive_sf_pair(spark, sf_dir)
    m = table_metrics(
        hive, sf, "c_custkey", "customer", exclude_cols=testkit.EXCLUDE_COLS
    )
    return m.select(
        "table_name",
        "primary_column",
        "total_record_count_hive",
        "total_record_count_sf",
        "row_count_only_in_hive",
        F.array_join("hive_only_pk_values", ",").alias("hive_only_pks"),
        "row_count_only_in_sf",
        F.array_join("sf_only_pk_values", ",").alias("sf_only_pks"),
        "row_count_data_discrepancy",
    )


QUERIES: dict[str, callable] = {
    "q01_pricing_summary": q01_pricing_summary,
    "q02_presence_diff": q02_presence_diff,
    "q03_cell_diff": q03_cell_diff,
    "q04_metrics_summary": q04_metrics_summary,
}
