"""Semantics tests for the macro pre-parser (X4) and dialect rewriter
(X5), including the reference's own example metadata shape
(``script_expansion_tool.py:226-321`` smoke) and the collect_max_one
rewrite (converter rule 13)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkdiff.plans.dialect import to_spark_sql
from sparkdiff.plans.macro import MacroExpander
from sparkdiff.plans.parity import run_script_pair
from sparkdiff.operators.diff import cell_diff
from sparkdiff.sources.catalog import ColumnMeta, SchemaCatalog
from sparkdiff.sources.scripts import pair_scripts, script_suffix

from .conftest import SF_DIR_SMALL


def _catalog():
    cols = [
        ColumnMeta("ID", "STRING"),
        ColumnMeta("LASTNAME", "STRING"),
        ColumnMeta("DELETEFLAG", "BOOLEAN"),
        ColumnMeta("AGE", "LONG"),
        ColumnMeta("BALANCE", "DOUBLE"),
        ColumnMeta("RATE", "DECIMAL"),
    ]
    return SchemaCatalog({"customer": "customer"}, {"customer": cols})


def test_macro_simple_and_exclusions():
    ex = MacroExpander(_catalog())
    assert (
        ex.expand("SELECT ${columns:customer::%1$s} FROM t")
        == "SELECT ID, LASTNAME, DELETEFLAG, AGE, BALANCE, RATE FROM t"
    )
    assert (
        ex.expand("SELECT ${columns:customer:~LastName,Age:%1$s} FROM t")
        == "SELECT ID, DELETEFLAG, BALANCE, RATE FROM t"
    )
    # default format when the spec is empty
    assert ex.expand("${columns:customer:~ID,DELETEFLAG,AGE,BALANCE,RATE}") == "LASTNAME"


def test_macro_prefix_fallback_resolution():
    ex = MacroExpander(_catalog())
    # udm_s_/delta_stage_ staged names resolve to the bare entity
    out = ex.expand("${columns:udm_s_customer::s.%1$s}")
    assert out.startswith("s.ID, s.LASTNAME")
    out = ex.expand("${columns:delta_stage_customer::%1$s}")
    assert out.startswith("ID")


def test_macro_type_dispatch():
    ex = MacroExpander(_catalog())
    out = ex.expand(
        "${columns:customer::S(%1$s):B(%1$s):I(%1$s):D(%1$s):N(%1$s)}"
    )
    assert out == "S(ID), S(LASTNAME), B(DELETEFLAG), I(AGE), D(BALANCE), N(RATE)"


def test_macro_hiveconf():
    ex = MacroExpander(_catalog())
    out = ex.expand("SELECT * FROM ${hiveconf:SRC}", hiveconf={"SRC": "t1"})
    assert out == "SELECT * FROM t1"


def test_dialect_scalar_rewrites():
    cases = {
        "reflect('java.net.URLDecoder','decode',v,'UTF-8')": "url_decode(v)",
        "reflect('org.apache.commons.codec.digest.DigestUtils','sha256Hex',lower(x))": "sha2(lower(x), 256)",
        "SHA2_HEX(Email)": "sha2(Email, 256)",
        "decodeurl(u)": "url_decode(u)",
        "hashcode(v)": "hash(v)",
        "IFF(a > b, 1, 0)": "if(a > b, 1, 0)",
        "SPLIT_PART(c,'_',2)": "element_at(split(c, '_'), 2)",
        "DATEADD(second, 1, ts)": "(ts + INTERVAL 1 SECOND)",
    }
    for src, expected in cases.items():
        assert to_spark_sql(src) == expected, src


def test_dialect_collect_max_one_runs_on_spark(spark):
    """The rewritten collect_max_one pattern must execute and implement
    latest-non-null-by-RowModified (converter rule 13 semantics)."""
    hive_fragment = """
        SELECT k,
        CASE WHEN map_values (collect_max_one (COALESCE(v,''),CASE WHEN v IS NULL then 0L else RowModified END))[0]= 0L THEN NULL
             ELSE map_keys (collect_max_one (COALESCE(v,''),CASE WHEN v IS NULL then 0L else RowModified END))[0] END AS v
        FROM src GROUP BY k
    """
    rewritten = to_spark_sql(hive_fragment)
    assert "collect_max_one" not in rewritten and "max_by" in rewritten
    rows = [
        ("a", "old", 1), ("a", "new", 5), ("a", None, 9),
        ("b", None, 3), ("b", None, 4),
        # 'c': TIE on the winning ord -> string-max value wins (the
        # Snowflake CONCAT-ordering semantics, SURVEY §7.4 #2)
        ("c", "alpha", 7), ("c", "zeta", 7), ("c", "beta", 2),
    ]
    spark.createDataFrame(rows, "k string, v string, RowModified long").createOrReplaceTempView("src")
    got = {r.k: r.v for r in spark.sql(rewritten).collect()}
    # 'a': latest non-null value wins (NULL rows vote with ord 0)
    assert got["a"] == "new"
    # 'b': every value NULL -> max(ord)=0 -> NULL
    assert got["b"] is None
    assert got["c"] == "zeta"


def test_script_pairing():
    from sparkdiff.plans.parity import HIVE_SCRIPT_DIR, SF_SCRIPT_DIR

    assert script_suffix("nw_customer_PRE_300.hql") == "customer_PRE_300"
    assert script_suffix("sf_dw_customer_PRE_300.sql") == "customer_PRE_300"
    pairs = pair_scripts(HIVE_SCRIPT_DIR, SF_SCRIPT_DIR)
    assert len(pairs) == 2
    (h, s) = pairs["parity_customer_PRE_300"]
    assert h and s and "IFF" in s and "IFF" not in h


def test_script_pair_diff_flags_exactly_divergent_columns(spark):
    hive_df, sf_df = run_script_pair(spark, SF_DIR_SMALL)
    flagged = {
        r.column_name
        for r in cell_diff(hive_df, sf_df, "ID").select("column_name").distinct().collect()
    }
    assert flagged == {"LastName", "RowModified"}
    # both sides nonetheless agree on row membership
    assert hive_df.count() == sf_df.count() > 0


# ---------------------------------------------------------------------------
# Hive -> Snowflake conversion (converter rules 1-5/13/15/16/28/31) and
# the rule-31 empty-table shorthand
# ---------------------------------------------------------------------------

def _parity_catalog(spark):
    from sparkdiff.plans.parity import register_parity_views

    base = register_parity_views(spark, SF_DIR_SMALL)
    return SchemaCatalog.from_spark({"parity_customer": base})


def test_macro_empty_table_shorthand_resolves_from_insert_target():
    class _Cat:
        def get_columns_for_table(self, table):
            assert table == "orders"
            return [ColumnMeta("o_id", "INTEGER"), ColumnMeta("o_total", "DOUBLE")]

    exp = MacroExpander(_Cat())
    script = (
        "INSERT OVERWRITE INTO delta_stage_orders (${columns:orders::%1$s})\n"
        "SELECT ${columns:::m.%1$s AS %1$s} FROM (SELECT * FROM t) m"
    )
    out = exp.expand(script)
    assert "(o_id, o_total)" in out
    assert "m.o_id AS o_id, m.o_total AS o_total" in out


def test_macro_empty_table_shorthand_without_insert_is_left_alone():
    class _Cat:
        def get_columns_for_table(self, table):
            raise AssertionError("should not resolve")

    exp = MacroExpander(_Cat())
    script = "SELECT ${columns:::m.%1$s} FROM t m"
    assert exp.expand(script) == script


def test_hive_to_sf_table_and_insert_rules():
    from sparkdiff.plans.dialect import hive_to_sf_script

    src = (
        "INSERT INTO TABLE udm_customer\n"
        "SELECT c.* FROM udm_s_customer s\n"
        "JOIN udm_pv_orders p ON p.id = s.id\n"
        "JOIN udm_customer c ON c.id = s.id"
    )
    out = hive_to_sf_script(src)
    assert "INSERT OVERWRITE INTO delta_stage_customer (${columns:customer::%1$s})" in out
    assert "FROM delta_udm_customer s" in out
    assert "JOIN PUBLIC.orders p" in out
    assert "JOIN PUBLIC.customer c" in out
    # not a main script -> no MD5Source
    assert "MD5Source" not in out


def test_hive_to_sf_existing_collist_kept_verbatim():
    from sparkdiff.plans.dialect import hive_to_sf_script

    src = "INSERT INTO TABLE udm_customer (${columns:::%1$s})\nSELECT 1"
    out = hive_to_sf_script(src)
    # rule 31: the shorthand is not touched, no second list appended
    assert out.count("${columns") == 1
    assert "delta_stage_customer (${columns:::%1$s})" in out


def test_hive_to_sf_fixture_pair_is_converter_output():
    """The committed sf MAIN_310 fixture is exactly what the converter
    produces from the hive MAIN_310 fixture."""
    from sparkdiff.plans.dialect import hive_to_sf_script
    from sparkdiff.plans.parity import HIVE_SCRIPT_DIR, SF_SCRIPT_DIR
    import os

    hive = open(os.path.join(HIVE_SCRIPT_DIR, "nw_parity_customer_MAIN_310.hql")).read()
    sf = open(os.path.join(SF_SCRIPT_DIR, "sf_dw_parity_customer_MAIN_310.sql")).read()
    assert hive_to_sf_script(hive) == sf
    for mark in (
        "SET MD5Source='PUBLIC.parity_customer';",
        "LEFT OUTER JOIN TABLE($MD5Source)",
        "SUBSTRING(MAX(CONCAT(TO_NUMBER_CUSTOM(s.RowModified)",
        "IFF(position('derived', LOWER(COALESCE(s.Source,''))) > 0",
    ):
        assert mark in sf, mark


def test_main_fixture_hive_side_runs_on_spark(spark):
    """The hive MAIN_310 fixture (INSERT stripped) macro-expands —
    including the rule-31 shorthand resolved from the INSERT target —
    and executes natively."""
    import os
    import re as _re
    from sparkdiff.plans.parity import HIVE_SCRIPT_DIR

    cat = _parity_catalog(spark)
    exp = MacroExpander(cat)
    hive = open(os.path.join(HIVE_SCRIPT_DIR, "nw_parity_customer_MAIN_310.hql")).read()
    expanded = exp.expand(hive)
    assert "${columns" not in expanded
    assert "m.ID, m.Source, m.SourceCustomerNumber" in expanded
    body = _re.sub(r"INSERT\s+INTO\s+TABLE\s+\S+\s*", "", expanded, flags=_re.I)
    df = spark.sql(to_spark_sql(body))
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"ID", "Source", "SourceCustomerNumber", "LastName", "RowModified", "Batch"}
