"""Workload-parity pipeline (FIXTURES.md §7, SURVEY §3.2).

The reference pairs each Hive script with its Snowflake counterpart and
validates that both produce the same table (its `/convert` + `/process`
flows).  Here the whole loop is native: script-directory source →
suffix pairing (J5) → macro expansion (X4) → dialect rewrite (X5) →
``spark.sql`` → cell diff of the two results.

The embedded fixture pair under ``sparkdiff/resources/scripts/`` is a
corrected, runnable form of the reference's
``nw_customer_PRE_300.hql`` / ``sf_dw_customer_PRE_300.sql`` (the
originals contain stray commas and a self-referencing alias and do not
parse); the sf variant intentionally diverges on LastName ('ee' suffix)
and RowModified, so the diff must flag exactly those two columns.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkdiff.plans.dialect import to_spark_sql
from sparkdiff.plans.macro import MacroExpander
from sparkdiff.session import load_table
from sparkdiff.sources.catalog import SchemaCatalog
from sparkdiff.sources.scripts import pair_scripts

SCRIPTS_ROOT = os.path.join(os.path.dirname(os.path.dirname(__file__)), "resources", "scripts")
HIVE_SCRIPT_DIR = os.path.join(SCRIPTS_ROOT, "nw_parity_customer")
SF_SCRIPT_DIR = os.path.join(SCRIPTS_ROOT, "sf_dw_parity_customer")


def parity_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference-shaped entity (ID/Source/SourceCustomerNumber/
    LastName/RowModified/Batch — FIXTURES.md §1) derived deterministically
    from the driver's customer table."""
    c = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    return c.select(
        k.cast("string").alias("ID"),
        F.when(k % 5 == 0, "james_avery_rental_derived")
        .when(k % 5 == 1, "Customer_import")
        .when(k % 5 == 2, "x_DMM_feed")
        .otherwise("other")
        .alias("Source"),
        F.col("c_name").alias("SourceCustomerNumber"),
        F.substring("c_name", 10, 9).alias("LastName"),
        (F.lit(1_690_000_000_000) + k).alias("RowModified"),
        F.col("c_nationkey").cast("long").alias("Batch"),
    )


#: DuckDB CTEs equivalent to the registered input views.
PARITY_BASE_CTES = """
base AS (
    SELECT CAST(c_custkey AS VARCHAR) AS ID,
           CASE WHEN c_custkey % 5 = 0 THEN 'james_avery_rental_derived'
                WHEN c_custkey % 5 = 1 THEN 'Customer_import'
                WHEN c_custkey % 5 = 2 THEN 'x_DMM_feed'
                ELSE 'other' END AS Source,
           c_name AS SourceCustomerNumber,
           substring(c_name, 10, 9) AS LastName,
           1690000000000 + c_custkey AS RowModified,
           CAST(c_nationkey AS BIGINT) AS Batch
    FROM customer
),
udm_s_parity_customer AS (SELECT * FROM base),
udm_parity_customer AS (SELECT * FROM base WHERE CAST(ID AS BIGINT) % 3 <> 0)
"""


def _oracle_script_sql(lastname_expr: str, rowmodified_literal: int) -> str:
    """Hand-expanded (macro-free) DuckDB equivalent of the fixture script."""
    cols = "ID, Source, SourceCustomerNumber, LastName, RowModified, Batch"
    u_cols = "u.ID AS ID, u.Source AS Source, u.SourceCustomerNumber AS SourceCustomerNumber, u.LastName AS LastName, u.RowModified AS RowModified, u.Batch AS Batch"
    return f"""
    SELECT {cols} FROM (
        SELECT s.ID AS ID, s.Source AS Source,
               s.SourceCustomerNumber AS SourceCustomerNumber,
               s.LastName AS LastName, s.RowModified AS RowModified,
               s.Batch AS Batch
        FROM udm_s_parity_customer s
        WHERE lower(COALESCE(s.Source,'')) NOT LIKE '%derived%'
        UNION ALL
        SELECT {u_cols}
        FROM (
            SELECT dwc.ID AS ID, dwc.Source AS Source,
                   dwc.SourceCustomerNumber AS SourceCustomerNumber,
                   dwc.Batch AS Batch,
                   {lastname_expr} AS LastName,
                   {rowmodified_literal} AS RowModified,
                   row_number() OVER (PARTITION BY dwc.SourceCustomerNumber
                       ORDER BY dwc.forOrdering DESC, dwc.RowModified DESC, dwc.ID DESC) AS rwn
            FROM (
                SELECT SourceCustomerNumber, LastName
                FROM udm_s_parity_customer
                WHERE lower(COALESCE(Source,'')) LIKE '%derived%'
            ) sc
            INNER JOIN (
                SELECT dw.*,
                       substr(dw.SourceCustomerNumber,1,20) AS joinSCN,
                       CASE WHEN COALESCE(dw.Source,'') LIKE 'Customer%' THEN 3
                            WHEN COALESCE(dw.Source,'') LIKE '%DMM%' THEN 2
                            ELSE 1 END AS forOrdering
                FROM udm_parity_customer dw
                WHERE COALESCE(dw.LastName,'') <> ''
            ) dwc ON sc.SourceCustomerNumber = dwc.joinSCN
                 AND upper(sc.LastName) = upper(dwc.LastName)
        ) u
        WHERE u.rwn = 1
    ) c
    """


ORACLE_HIVE_RESULT = _oracle_script_sql("dwc.LastName", 1_700_000_000_000)
ORACLE_SF_RESULT = _oracle_script_sql("concat(dwc.LastName, 'ee')", 1_700_000_001_000)


def register_parity_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = parity_base(spark, sf_dir)
    base.createOrReplaceTempView("udm_s_parity_customer")
    base.filter(F.col("ID").cast("long") % 3 != 0).createOrReplaceTempView(
        "udm_parity_customer"
    )
    return base


def run_script_pair(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """Load, pair, expand, dialect-rewrite and execute the fixture
    scripts; returns (hive_result, sf_result)."""
    base = register_parity_views(spark, sf_dir)
    catalog = SchemaCatalog.from_spark({"parity_customer": base})
    expander = MacroExpander(catalog)
    pairs = pair_scripts(HIVE_SCRIPT_DIR, SF_SCRIPT_DIR)
    (hive_sql, sf_sql) = pairs["parity_customer_PRE_300"]
    hive_df = spark.sql(to_spark_sql(expander.expand(hive_sql)))
    sf_df = spark.sql(to_spark_sql(expander.expand(sf_sql)))
    return hive_df, sf_df
