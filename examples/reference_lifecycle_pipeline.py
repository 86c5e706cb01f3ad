"""The reference's three entry points — ``/process``, ``/convert`` and
the suggester — chained end-to-end as ONE engine session (round-9
stretch item).

Reference flow (``main.py:22-74`` + ``app.py:681-702``): Flask routes
dispatch to agents that (1) **/process** discover discrepant tables and
walk per-id column diffs through stored-proc RPCs capped at 3 ids per
request, (2) **/convert** macro-expand ``${columns:...}`` against the
production schema CSVs (145 tables / ~30k columns) and rewrite Hive SQL
into the warehouse dialect, (3) **suggest** locate each flagged column
in the paired workload scripts and extract context snippets.

Here the same lifecycle is one lazy composition:

- stage 1 diffs the FULL production-scale pair in one job (no id cap);
- stage 2 expands + rewrites against a generated catalog of the
  reference's exact production shape, then proves the conversion is
  EXECUTABLE by running the converted fixture script pair;
- stage 3 feeds the script-pair diff's flagged columns straight into
  the snippet suggester — diff → flagged columns → snippets is a single
  DataFrame lineage, evaluated once at the final action.

Run: ``python examples/reference_lifecycle_pipeline.py [sf_dir]``
"""

from __future__ import annotations

import csv
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkdiff import testkit
from sparkdiff.operators.diff import cell_diff, table_diff
from sparkdiff.operators.metrics import tables_with_discrepancies
from sparkdiff.plans.dialect import to_spark_sql
from sparkdiff.plans.macro import MacroExpander
from sparkdiff.plans.parity import HIVE_SCRIPT_DIR, SF_SCRIPT_DIR, run_script_pair
from sparkdiff.plans.suggester import suggest_snippets
from sparkdiff.session import get_spark
from sparkdiff.sources.catalog import SchemaCatalog
from sparkdiff.sources.io import to_json_records
from sparkdiff.sources.scripts import pair_scripts

#: the reference's production catalog shape (tests/test_catalog_scale.py
#: pins load + expansion cost at exactly this scale)
N_TABLES, N_COLUMNS = 145, 30_000


def _write_prod_scale_catalog(d: str) -> None:
    """schema_table.csv / schema_column.csv with the reference's headers,
    cardinalities and ragged per-table column counts."""
    with open(os.path.join(d, "schema_table.csv"), "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["table_id", "active", "name"])
        w.writeheader()
        for t in range(N_TABLES):
            w.writerow({"table_id": 1000 + t, "active": 1, "name": f"entity_{t:03d}"})
    with open(os.path.join(d, "schema_column.csv"), "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["column_id", "name", "type", "tableId"])
        w.writeheader()
        cid, t = 0, 0
        while cid < N_COLUMNS:
            n_cols = 10 + (t * 37) % 391
            for c in range(min(n_cols, N_COLUMNS - cid)):
                w.writerow(
                    {
                        "column_id": cid,
                        "name": f"c_attr{c:04d}",
                        "type": str(cid % 6),
                        "tableId": 1000 + (t % N_TABLES),
                    }
                )
                cid += 1
            t += 1


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("reference-lifecycle", cpus=8)

    # ------------------------------------------------------------------
    # stage 1 — /process: the full-pair diff as one Spark job (the
    # reference walks the same table 3 pk ids per stored-proc call)
    # ------------------------------------------------------------------
    hive, sf = testkit.lineitem_pair(spark, sf_dir)
    diff = table_diff(hive, sf, pk="li_pk", table_name="LINEITEM")
    print("[process] metrics:")
    diff.metrics.show(truncate=100, vertical=True)
    flagged = tables_with_discrepancies(diff.metrics)
    print(
        "[process] tables with discrepancies:",
        [r.table_name for r in flagged.collect()],
    )
    print("[process] per-column report:")
    diff.report.show(truncate=60)

    # ------------------------------------------------------------------
    # stage 2 — /convert: macro expansion + dialect rewrite, first
    # against the PRODUCTION-SHAPE catalog (145 tables / 30k columns),
    # then executably against the fixture pair
    # ------------------------------------------------------------------
    with tempfile.TemporaryDirectory() as d:
        _write_prod_scale_catalog(d)
        catalog = SchemaCatalog.from_csv(d)
        expander = MacroExpander(catalog)
        # the reference's group-merge idiom around a ${columns} macro:
        # per-column keep-latest via the collect_max_one UDAF, expanded
        # per type and rewritten to native max_by by the dialect layer
        raw = (
            "INSERT OVERWRITE TABLE dw.entity_042 SELECT "
            "${columns:entity_042:~C_ATTR0001:%1$s, trim(%1$s), "
            "CAST(%1$s AS DECIMAL(18,4))}, "
            "CASE WHEN map_values(collect_max_one(COALESCE(c_attr0002,''),"
            "CASE WHEN c_attr0002 IS NULL then 0L else RowModified END))[0]"
            "= 0L THEN NULL ELSE map_keys(collect_max_one("
            "COALESCE(c_attr0002,''),CASE WHEN c_attr0002 IS NULL then 0L "
            "else RowModified END))[0] END AS c_attr0002 "
            "FROM src.entity_042 GROUP BY c_attr0000"
        )
        expanded = expander.expand(raw)
        converted = to_spark_sql(expanded)
        n_cols = len(catalog.get_columns_for_table("entity_042"))
        print(
            f"[convert] catalog: {N_TABLES} tables / {N_COLUMNS} columns; "
            f"entity_042 has {n_cols} columns"
        )
        print(
            f"[convert] macro fan-out: {len(raw)} chars -> "
            f"{len(expanded)} expanded -> {len(converted)} converted"
        )
        assert "${columns" not in expanded, "macro left unexpanded"
        assert "collect_max_one" not in converted, "dialect rule missed"

    # the same conversion path, proven EXECUTABLE: the fixture pair is
    # expanded, rewritten, and run as two Spark SQL lineages
    h_out, s_out = run_script_pair(spark, sf_dir)
    print(f"[convert] executed script pair: {h_out.count()} hive rows, "
          f"{s_out.count()} sf rows")

    # ------------------------------------------------------------------
    # stage 3 — suggester: script-pair diff -> flagged columns ->
    # snippet extraction, one lazy lineage evaluated at the final show
    # ------------------------------------------------------------------
    script_cells = cell_diff(h_out, s_out, "ID")
    pairs = pair_scripts(HIVE_SCRIPT_DIR, SF_SCRIPT_DIR)
    snippets = suggest_snippets(spark, script_cells, pairs, window_lines=2)
    print("[suggest] snippets for columns the script-pair diff flagged:")
    snippets.select("column_name", "side", "first_line").show()

    # the Flask-response edge: one JSON record per report row
    print("[response]", to_json_records(diff.report).first().json[:200], "...")
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:2])
