"""End-to-end parity validation — the reference's `/process` flow
(SURVEY §3.1) as one library session.

Reference flow: 3 LangChain agents + per-id Snowflake stored-proc RPCs
capped at 3 ids.  Here: table pair → metrics row → discovery → full cell
diff → per-column report → script-pair snippet suggestions → JSON sink,
all lazy until the final actions.

Run: ``python examples/parity_pipeline.py [sf_dir]``
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkdiff import testkit
from sparkdiff.operators.diff import table_diff
from sparkdiff.operators.metrics import discrepancy_ids, tables_with_discrepancies
from sparkdiff.plans.parity import HIVE_SCRIPT_DIR, SF_SCRIPT_DIR
from sparkdiff.plans.suggester import suggest_snippets
from sparkdiff.session import get_spark
from sparkdiff.sources.io import to_json_records
from sparkdiff.sources.scripts import pair_scripts


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("parity-pipeline", cpus=8)

    # 1. the table pair under validation (stand-in for hive/sf mirrors)
    hive, sf = testkit.hive_sf_pair(spark, sf_dir)

    # 2. full validation in one lineage (replaces /process stages 1+2)
    diff = table_diff(
        hive, sf, pk="c_custkey", table_name="CUSTOMER",
        exclude_cols=testkit.EXCLUDE_COLS,
    )
    print("metrics row:")
    diff.metrics.show(truncate=120, vertical=True)

    # 3. discovery API (extract-agent semantics)
    tables = tables_with_discrepancies(diff.metrics)
    print("tables with discrepancies:", [r.table_name for r in tables.collect()])
    ids = discrepancy_ids(diff.metrics, "customer")
    print(f"discrepant ids ({len(ids)}):", ids[:5], "...")

    # 4. per-column mismatch report (data-matrix semantics, ALL ids)
    print("per-column diff report:")
    diff.report.show(truncate=80)

    # 5. suggester stage (/process stage 3): diff the paired workload
    #    scripts' outputs, then locate each flagged column in the
    #    scripts themselves and extract context snippets
    from sparkdiff.operators.diff import cell_diff
    from sparkdiff.plans.parity import run_script_pair

    h_out, s_out = run_script_pair(spark, sf_dir)
    script_cells = cell_diff(h_out, s_out, "ID")
    pairs = pair_scripts(HIVE_SCRIPT_DIR, SF_SCRIPT_DIR)
    snippets = suggest_snippets(spark, script_cells, pairs, window_lines=2)
    print("script snippets for columns flagged by the script-pair diff:")
    snippets.select("column_name", "side", "first_line").show()

    # 6. JSON sink (the Flask-response edge)
    print(to_json_records(diff.report).first().json[:200], "...")
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:2])
