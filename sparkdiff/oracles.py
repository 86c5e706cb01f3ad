"""DuckDB oracle SQL — one entry per key in ``sparkdiff.queries.QUERIES``.

Each statement runs on the driver's pre-registered parquet views
(``region nation customer supplier part orders lineitem events documents
embeddings``) and must hash-match the Spark result: same column names,
same (order-insensitive) values.
"""

from __future__ import annotations

from sparkdiff.testkit import PAIR_SQL_CTES

_CANON_NAME_H = "COALESCE(CAST(h.c_name AS VARCHAR), 'NULL')"
_CANON_NAME_S = "COALESCE(CAST(s.c_name AS VARCHAR), 'NULL')"
_CANON_NK_H = "COALESCE(CAST(h.c_nationkey AS VARCHAR), 'NULL')"
_CANON_NK_S = "COALESCE(CAST(s.c_nationkey AS VARCHAR), 'NULL')"
_CANON_BAL_H = "COALESCE(CAST(CAST(h.c_acctbal AS DECIMAL(18,4)) AS VARCHAR), 'NULL')"
_CANON_BAL_S = "COALESCE(CAST(CAST(s.c_acctbal AS DECIMAL(18,4)) AS VARCHAR), 'NULL')"

ORACLES: dict[str, str] = {
    "q01_pricing_summary": """
        SELECT
            l_returnflag,
            l_linestatus,
            SUM(CAST(round(l_quantity * 100, 0) AS BIGINT)) / 100.0 AS sum_qty,
            SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) / 100.0 AS sum_base_price,
            SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) / 1000000.0 AS sum_disc_price,
            SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))
                * (100 + CAST(round(l_tax * 100, 0) AS BIGINT))) / 100000000.0 AS sum_charge,
            CAST(SUM(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS DOUBLE)
                / (COUNT(*) * 100.0) AS avg_qty,
            CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS DOUBLE)
                / (COUNT(*) * 100.0) AS avg_price,
            COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q02_presence_diff": f"""
        WITH {PAIR_SQL_CTES}
        SELECT CAST(c_custkey AS VARCHAR) AS pk_value, 'hive_only' AS side
        FROM hive WHERE c_custkey NOT IN (SELECT c_custkey FROM sf)
        UNION ALL
        SELECT CAST(c_custkey AS VARCHAR) AS pk_value, 'sf_only' AS side
        FROM sf WHERE c_custkey NOT IN (SELECT c_custkey FROM hive)
    """,
    "q03_cell_diff": f"""
        WITH {PAIR_SQL_CTES},
        j AS (
            SELECT
                CAST(h.c_custkey AS VARCHAR) AS pk_value,
                {_CANON_NAME_H} AS h_name, {_CANON_NAME_S} AS s_name,
                {_CANON_NK_H} AS h_nk, {_CANON_NK_S} AS s_nk,
                {_CANON_BAL_H} AS h_bal, {_CANON_BAL_S} AS s_bal
            FROM hive h JOIN sf s ON h.c_custkey = s.c_custkey
        )
        SELECT pk_value, 'c_name' AS column_name, h_name AS hive_value, s_name AS sf_value
        FROM j WHERE h_name <> s_name
        UNION ALL
        SELECT pk_value, 'c_nationkey', h_nk, s_nk FROM j WHERE h_nk <> s_nk
        UNION ALL
        SELECT pk_value, 'c_acctbal', h_bal, s_bal FROM j WHERE h_bal <> s_bal
    """,
    "q04_metrics_summary": f"""
        WITH {PAIR_SQL_CTES},
        flags AS (
            SELECT
                CAST(COALESCE(h.c_custkey, s.c_custkey) AS VARCHAR) AS pk_value,
                (h.c_custkey IS NOT NULL) AS in_h,
                (s.c_custkey IS NOT NULL) AS in_s,
                (h.c_custkey IS NOT NULL AND s.c_custkey IS NOT NULL
                 AND ({_CANON_NAME_H} <> {_CANON_NAME_S}
                      OR {_CANON_NK_H} <> {_CANON_NK_S}
                      OR {_CANON_BAL_H} <> {_CANON_BAL_S})) AS mismatch
            FROM hive h FULL OUTER JOIN sf s ON h.c_custkey = s.c_custkey
        )
        SELECT
            'customer' AS table_name,
            'c_custkey' AS primary_column,
            SUM(CASE WHEN in_h THEN 1 ELSE 0 END) AS total_record_count_hive,
            SUM(CASE WHEN in_s THEN 1 ELSE 0 END) AS total_record_count_sf,
            SUM(CASE WHEN in_h AND NOT in_s THEN 1 ELSE 0 END) AS row_count_only_in_hive,
            COALESCE(string_agg(CASE WHEN in_h AND NOT in_s THEN pk_value END, ','
                                ORDER BY CASE WHEN in_h AND NOT in_s THEN pk_value END), '')
                AS hive_only_pks,
            SUM(CASE WHEN in_s AND NOT in_h THEN 1 ELSE 0 END) AS row_count_only_in_sf,
            COALESCE(string_agg(CASE WHEN in_s AND NOT in_h THEN pk_value END, ','
                                ORDER BY CASE WHEN in_s AND NOT in_h THEN pk_value END), '')
                AS sf_only_pks,
            SUM(CASE WHEN mismatch THEN 1 ELSE 0 END) AS row_count_data_discrepancy
        FROM flags
    """,
    "q05_rownum_dedup": """
        SELECT o_custkey, o_orderkey, o_orderstatus, o_totalprice,
               CAST(o_orderdate AS DATE) AS o_orderdate
        FROM (
            SELECT *,
                   row_number() OVER (
                       PARTITION BY o_custkey
                       ORDER BY (CASE WHEN o_orderpriority LIKE '1-%' THEN 3
                                      WHEN o_orderpriority LIKE '2-%' THEN 2
                                      ELSE 1 END) DESC,
                                o_orderdate DESC, o_orderkey DESC) AS rwn
            FROM orders
        ) WHERE rwn = 1
    """,
    "q06_union_dedup_workload": """
        WITH unioned AS (
            SELECT c.c_custkey, c.c_name, o.o_orderdate AS last_ts,
                   o.o_orderkey AS tie
            FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
            UNION ALL
            SELECT c.c_custkey, c.c_name, NULL AS last_ts, -1 AS tie
            FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        )
        SELECT c_custkey, c_name, CAST(last_ts AS DATE) AS last_orderdate
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY c_custkey
                ORDER BY last_ts DESC NULLS LAST, tie DESC) AS rwn
            FROM unioned
        ) WHERE rwn = 1
    """,
    "q07_expr_join": """
        SELECT n.n_name, COUNT(*) AS n_pairs
        FROM customer c
        JOIN supplier s
          ON c.c_nationkey = s.s_nationkey
         AND upper(substring(c.c_name, 10, 3)) = upper(substring(s.s_name, 10, 3))
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
    """,
    "q08_argmax": """
        SELECT o_custkey, o_orderstatus AS last_status,
               CAST(o_orderdate AS DATE) AS last_orderdate
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY o_custkey
                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rwn
            FROM orders
        ) WHERE rwn = 1
    """,
    "q09_conditional_agg": """
        SELECT o_orderpriority,
               SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS n_open,
               SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS n_filled,
               SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS n_partial,
               COUNT(*) AS n_total,
               SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) / 100.0 AS total_price
        FROM orders
        GROUP BY o_orderpriority
    """,
    "q10_histogram": """
        SELECT event_type, COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY event_type
    """,
    "q11_argmax_histogram": """
        SELECT event_type, COUNT(*) AS n
        FROM events
        GROUP BY event_type
        ORDER BY n DESC, event_type ASC
        LIMIT 1
    """,
    "q12_topk_per_group": """
        SELECT o_custkey, o_orderkey, o_totalprice, rank
        FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   CAST(row_number() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey DESC) AS INTEGER) AS rank
            FROM orders
        ) WHERE rank <= 3
    """,
    "q13_minmax_rollup": """
        SELECT l_partkey,
               CAST(MIN(l_shipdate) AS DATE) AS first_ship,
               CAST(MAX(l_shipdate) AS DATE) AS last_ship,
               MIN(l_quantity) AS min_qty,
               MAX(l_quantity) AS max_qty,
               COUNT(*) AS n_items
        FROM lineitem
        GROUP BY l_partkey
    """,
    "q14_distinct_agg": """
        SELECT COUNT(DISTINCT o_custkey) AS n_customers,
               COUNT(DISTINCT o_orderstatus) AS n_statuses,
               COUNT(DISTINCT o_orderpriority) AS n_priorities,
               COUNT(*) AS n_orders
        FROM orders
    """,
}
