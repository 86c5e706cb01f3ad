"""Metrics-store discovery API and suggester-stage tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkdiff import testkit
from sparkdiff.operators.diff import cell_diff, table_metrics
from sparkdiff.operators.metrics import (
    discrepancy_ids,
    metrics_scan,
    tables_with_discrepancies,
)
from sparkdiff.plans.parity import HIVE_SCRIPT_DIR, SF_SCRIPT_DIR
from sparkdiff.plans.suggester import suggest_snippets
from sparkdiff.sources.scripts import pair_scripts

from .conftest import SF_DIR_SMALL


def _metrics(spark):
    hive, sf = testkit.hive_sf_pair(spark, SF_DIR_SMALL)
    return table_metrics(
        hive, sf, "c_custkey", "CUSTOMER", exclude_cols=testkit.EXCLUDE_COLS
    )


def test_metrics_discovery_roundtrip(spark):
    m = _metrics(spark)
    tables = [r.table_name for r in tables_with_discrepancies(m).collect()]
    assert tables == ["CUSTOMER"]
    assert metrics_scan(m).count() == 1
    ids = discrepancy_ids(m, "  customer ")  # case/space-insensitive (P2)
    assert ids and all(isinstance(i, str) for i in ids)
    assert discrepancy_ids(m, "NOPE") == []
    assert discrepancy_ids(m, "   ") == []  # blank guard (P3)


def test_suggester_extracts_column_snippets(spark):
    hive, sf = testkit.hive_sf_pair(spark, SF_DIR_SMALL)
    # diff the parity scripts' divergent columns against the script pair
    from sparkdiff.plans.parity import run_script_pair

    h, s = run_script_pair(spark, SF_DIR_SMALL)
    cells = cell_diff(h, s, "ID")
    pairs = pair_scripts(HIVE_SCRIPT_DIR, SF_SCRIPT_DIR)
    snippets = suggest_snippets(spark, cells, pairs, window_lines=3).collect()
    assert snippets
    by_col = {}
    for r in snippets:
        by_col.setdefault(r.column_name, set()).add(r.side)
    # both divergent columns found in BOTH script variants
    assert by_col.get("LastName") == {"hive", "sf"}
    assert by_col.get("RowModified") == {"hive", "sf"}
    for r in snippets:
        assert r.column_name.lower() in r.snippet.lower()
        assert r.first_line >= 0


def test_suggester_quotes_regex_metacharacters(spark):
    """Column names containing regex metacharacters (quoted identifiers
    like 'price$usd' or 'total(net)') must match literally, not throw a
    pattern-compile error or mis-match."""
    diff_cols = spark.createDataFrame(
        [("price$usd",), ("total(net)",), ("plain_col",)],
        "column_name string",
    )
    pairs = {
        "T1": (
            "SELECT price$usd, total(net) FROM t -- hive",
            "SELECT plain_col FROM t -- sf",
        )
    }
    rows = suggest_snippets(spark, diff_cols, pairs, window_lines=1).collect()
    by_col = {r.column_name: r.side for r in rows}
    assert by_col.get("price$usd") == "hive"
    assert by_col.get("total(net)") == "hive"
    assert by_col.get("plain_col") == "sf"
    # 'total(net' as a prefix must NOT match a line without the paren
    # (i.e. the pattern is literal, not 'total' + group syntax)
    assert all("(net)" in r.snippet for r in rows if r.column_name == "total(net)")
