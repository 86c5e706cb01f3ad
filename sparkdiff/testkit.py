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

#: dimensionality of the driver-generated ``embeddings.parquet`` vector
#: column — fixed across every scale factor (TESTDATA.md).  Queries use
#: this constant instead of a one-row ``first()`` probe so constructing
#: the registry launches ZERO Spark jobs (pinned by
#: tests/test_registry.py::test_registry_construction_is_lazy and
#: validated against the real fixture in test_retrieval.py).
EMBED_DIM = 64


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


#: Per-(session, sf_dir) memo of the persisted lineitem rollup.  The pair
#: models two STORED warehouse tables (the reference diffs materialized
#: Snowflake tables, not views); without this, every action over the pair
#: re-runs the pk rollup — three sort-aggregate scans of lineitem per diff
#: — and the bench ends up measuring fixture reconstruction instead of
#: the diff join.  ~50 MB at sf0.1, MEMORY_AND_DISK.
_LI_BASE_MEMO: dict[tuple[int, str], DataFrame] = {}


def _lineitem_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    key = (id(spark), sf_dir)
    base = _LI_BASE_MEMO.get(key)
    if base is not None:
        # an intervening spark.catalog.clearCache() (each bench query,
        # the plan-snapshot test) silently strips the memo's persist
        # marking, and plans derived afterwards lose the
        # InMemoryRelation — q46's signature flipped 5 vs 4 shuffles
        # depending on TEST ORDER.  Re-mark so the stored-table model
        # (and the plan shape) is cache-state-independent.
        if base.storageLevel == StorageLevel.NONE:
            base.persist(StorageLevel.MEMORY_AND_DISK)
        return base

    li = load_table(spark, sf_dir, "lineitem")
    # (l_orderkey, l_linenumber) is NOT unique in the synthetic data, so
    # the diff base is a deterministic per-key rollup (max per column —
    # engine-independent), keyed by orderkey*8+linenumber (linenumber<8).
    base = (
        li.groupBy(
            (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("li_pk")
        )
        .agg(
            *[
                F.max(c).alias(c)
                for c in li.columns
                if c not in ("l_orderkey", "l_linenumber")
            ]
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    _LI_BASE_MEMO[key] = base
    return base


def lineitem_pair(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Perturbed pair at the reference's production scale class
    (TRANSACTION ≈ 408k rows/side, ``db-setup.sql:90-102``): lineitem
    with a synthetic pk (orderkey*8 + linenumber) and the same
    modulus-keyed edit classes as :func:`hive_sf_pair`."""
    base = _lineitem_base(spark, sf_dir)
    k = F.col("li_pk")
    hive = base
    mutated = (
        base.filter(k % 101 != 0)
        .withColumn(
            "l_quantity",
            F.when(k % 97 == 0, F.col("l_quantity") + 1).otherwise(
                F.col("l_quantity")
            ),
        )
        .withColumn(
            "l_extendedprice",
            F.when(k % 89 == 0, F.round(F.col("l_extendedprice"), 0)).otherwise(
                F.col("l_extendedprice")
            ),
        )
    )
    inserted = base.filter(k % 103 == 0).withColumn(
        "li_pk", k + F.lit(1_000_000_000)
    )
    return hive, mutated.unionByName(inserted)


#: DuckDB CTEs equivalent to :func:`lineitem_pair`.
LINEITEM_PAIR_SQL_CTES = """
base AS (
    SELECT l_orderkey * 8 + l_linenumber AS li_pk,
           max(l_partkey) AS l_partkey,
           max(l_suppkey) AS l_suppkey,
           max(l_quantity) AS l_quantity,
           max(l_extendedprice) AS l_extendedprice,
           max(l_discount) AS l_discount,
           max(l_tax) AS l_tax,
           max(l_returnflag) AS l_returnflag,
           max(l_linestatus) AS l_linestatus,
           max(l_shipdate) AS l_shipdate
    FROM lineitem
    GROUP BY l_orderkey * 8 + l_linenumber
),
hive_li AS (SELECT * FROM base),
sf_li AS (
    SELECT li_pk, l_partkey, l_suppkey,
           CASE WHEN li_pk % 97 = 0 THEN l_quantity + 1 ELSE l_quantity END AS l_quantity,
           CASE WHEN li_pk % 89 = 0 THEN round(l_extendedprice, 0) ELSE l_extendedprice END AS l_extendedprice,
           l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
    FROM base
    WHERE li_pk % 101 <> 0
    UNION ALL
    SELECT li_pk + 1000000000, l_partkey, l_suppkey,
           l_quantity, l_extendedprice, l_discount, l_tax,
           l_returnflag, l_linestatus, l_shipdate
    FROM base
    WHERE li_pk % 103 = 0
)
"""


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
