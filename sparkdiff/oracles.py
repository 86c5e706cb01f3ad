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
}
