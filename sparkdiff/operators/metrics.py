"""Metrics store + table discovery (SURVEY §7.2 step 3; S2/P1-P4/T1).

The reference keeps ``dw_data_metrics`` in Snowflake and exposes
discovery helpers through agent tools: the distinct-table list
(``tools/fetch_tables_tool.py:16``) and per-table discrepancy-id lookup
with case/space-insensitive matching and null guards
(``tools/data_discrepancy_tool.py:33-43``).  Same API, DataFrame-native.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def metrics_scan(metrics: DataFrame) -> DataFrame:
    """S2: rows worth investigating — any records on either side AND any
    non-empty PK array — ordered as the reference's metrics query
    (``tools/snowflake_tool.py:23-39``)."""
    return metrics.filter(
        (
            (F.col("total_record_count_hive") > 0)
            | (F.col("total_record_count_sf") > 0)
        )
        & (
            (F.size("hive_only_pk_values") > 0)
            | (F.size("sf_only_pk_values") > 0)
            | (F.size("data_discrepancy_pk_values") > 0)
        )
    ).orderBy(
        "hive_only_pk_values",
        "sf_only_pk_values",
        "data_discrepancy_pk_values",
        "table_name",
    )


def tables_with_discrepancies(metrics: DataFrame) -> DataFrame:
    """P1: distinct table names from the metrics scan."""
    return metrics_scan(metrics).select("table_name").distinct()


def discrepancy_ids(metrics: DataFrame, table_name: str) -> list[str]:
    """P2/P3: the ``DATA_DISCREPANCY_PK_VALUES`` array for one table,
    matched case/space-insensitively; empty when absent/blank."""
    if table_name is None or not str(table_name).strip():
        return []
    rows = (
        metrics.filter(
            F.upper(F.trim(F.col("table_name")))
            == str(table_name).strip().upper()
        )
        .select("data_discrepancy_pk_values")
        .collect()
    )
    return list(rows[0][0]) if rows and rows[0][0] is not None else []
