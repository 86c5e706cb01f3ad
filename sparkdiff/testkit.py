"""Perturb-and-detect fixtures (FIXTURES.md §1, mirroring the reference's
own golden test: clone a table, mutate known rows, expect exactly those
back — ``db-setup.sql:53-71``).

``hive_sf_pair`` derives a deterministic (hive, sf) table pair from the
driver's ``customer`` table.  ``PAIR_SQL_CTES`` is the *equivalent* ANSI
SQL (DuckDB dialect) so oracle queries can rebuild the identical pair.

Injected, modulus-keyed edits (all on ``c_custkey``):

- ``% 101 == 0``  row missing from sf          → hive_only
- ``% 103 == 0``  extra sf row (custkey+10^7)  → sf_only
- ``% 97  == 0``  ``c_name || 'ee'``           → cell diff (the reference's
  own mutation pattern: ``set LASTname='ramirezee'``, ``db-setup.sql:64``)
- ``% 89  == 0``  ``round(c_acctbal)``         → numeric-precision diff
  (reference's real discrepancy class ``717.2786`` vs ``717.278634433``,
  ``agents/suggester_agent.py:42``)
- ``% 61  == 0``  ``c_mktsegment='MUTATED'``   → must be SUPPRESSED when
  ``c_mktsegment`` is excluded (``DW_SHADOW_RUN_CONF`` semantics)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkdiff.session import load_table

EXCLUDE_COLS = ("c_mktsegment",)


def hive_sf_pair(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    customer = load_table(spark, sf_dir, "customer")
    hive = customer
    k = F.col("c_custkey")
    mutated = (
        customer.filter(k % 101 != 0)
        .withColumn(
            "c_name",
            F.when(k % 97 == 0, F.concat(F.col("c_name"), F.lit("ee"))).otherwise(
                F.col("c_name")
            ),
        )
        .withColumn(
            "c_acctbal",
            F.when(k % 89 == 0, F.round(F.col("c_acctbal"), 0)).otherwise(
                F.col("c_acctbal")
            ),
        )
        .withColumn(
            "c_mktsegment",
            F.when(k % 61 == 0, F.lit("MUTATED")).otherwise(F.col("c_mktsegment")),
        )
    )
    inserted = customer.filter(k % 103 == 0).withColumn(
        "c_custkey", k + F.lit(10_000_000)
    )
    sf = mutated.unionByName(inserted)
    return hive, sf


#: DuckDB CTEs equivalent to :func:`hive_sf_pair` (views `customer` etc. are
#: pre-registered by the driver's oracle runner).
PAIR_SQL_CTES = """
hive AS (SELECT * FROM customer),
sf AS (
    SELECT
        c_custkey,
        CASE WHEN c_custkey % 97 = 0 THEN c_name || 'ee' ELSE c_name END AS c_name,
        c_nationkey,
        CASE WHEN c_custkey % 89 = 0 THEN round(c_acctbal, 0) ELSE c_acctbal END AS c_acctbal,
        CASE WHEN c_custkey % 61 = 0 THEN 'MUTATED' ELSE c_mktsegment END AS c_mktsegment
    FROM customer
    WHERE c_custkey % 101 <> 0
    UNION ALL
    SELECT c_custkey + 10000000, c_name, c_nationkey, c_acctbal, c_mktsegment
    FROM customer
    WHERE c_custkey % 103 = 0
)
"""
