"""Staged re-validation — the escalation ladder SCALE.md's diff
section describes, cheapest probe first, each stage gating the next:

1. **Profile drift** (q107 machinery): per-column non-null/NDV/range
   comparison — catches schema-level regressions for the cost of two
   narrow profile passes.
2. **Distribution drift** (q124 machinery): chi-square-style histogram
   score per flagged column — locates WHERE the value mass moved.
3. **Checksum-refined cell diff** (q52 machinery): the row-level diff,
   but only dirty pk-buckets are fingerprint-joined and unpivoted.

On an all-clean pair the pipeline stops after stage 1 having scanned
only profile aggregates; on the perturbed fixture it escalates to the
exact mismatch rows.

Run: ``python examples/staged_revalidation_pipeline.py [sf_dir]``
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sparkdiff import testkit
from sparkdiff.operators.diff import refined_cell_diff
from sparkdiff.operators.profile import profile_table
from sparkdiff.session import get_spark


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("staged-revalidation", cpus=8)
    hive, sf = testkit.lineitem_pair(spark, sf_dir)
    cols = ["l_quantity", "l_extendedprice", "l_returnflag", "l_shipdate"]

    # stage 1: profile drift
    ph = profile_table(hive, cols).select(
        "column",
        F.col("n_nonnull").alias("nn_h"),
        F.col("ndv").alias("ndv_h"),
        F.col("min_str").alias("min_h"),
        F.col("max_str").alias("max_h"),
    )
    ps = profile_table(sf, cols).select(
        "column",
        F.col("n_nonnull").alias("nn_s"),
        F.col("ndv").alias("ndv_s"),
        F.col("min_str").alias("min_s"),
        F.col("max_str").alias("max_s"),
    )
    drifted = (
        ph.join(ps, "column")
        .filter(
            (F.col("nn_h") != F.col("nn_s"))
            | (F.col("ndv_h") != F.col("ndv_s"))
            | (F.col("min_h") != F.col("min_s"))
            | (F.col("max_h") != F.col("max_s"))
        )
        .select("column")
    )
    flagged = [r["column"] for r in drifted.collect()]  # <= n_cols rows
    print(f"stage 1 profile drift: {len(flagged)} column(s) flagged: {flagged}")
    if not flagged:
        print("clean pair — stopping after profile stage")
        spark.stop()
        return

    # stage 2: distribution drift on the flagged numeric columns
    for col, width in (("l_quantity", 100), ("l_extendedprice", 100_000)):
        if col not in flagged:
            continue
        hh = (
            hive.select((F.floor(F.col(col) * 100 / width)).alias("b"))
            .groupBy("b")
            .agg(F.count(F.lit(1)).alias("c1"))
        )
        hs = (
            sf.select((F.floor(F.col(col) * 100 / width)).alias("b"))
            .groupBy("b")
            .agg(F.count(F.lit(1)).alias("c2"))
        )
        j = hh.join(hs, "b", "full_outer").select(
            F.coalesce("c1", F.lit(0)).alias("c1"),
            F.coalesce("c2", F.lit(0)).alias("c2"),
        )
        chi2 = j.agg(
            F.sum(
                F.expr(
                    "CAST((CAST(c1 - c2 AS DECIMAL(38,0)) * (c1 - c2)"
                    " * 1048576) div CAST(c1 + c2 AS DECIMAL(38,0))"
                    " AS BIGINT)"
                )
            ).alias("chi2_s")
        ).collect()[0]["chi2_s"]
        print(f"stage 2 dist drift {col}: chi2_s={chi2}")

    # stage 3: checksum-refined exact diff (dirty buckets only)
    diff = refined_cell_diff(
        hive.withColumnRenamed("li_pk", "pk"),
        sf.withColumnRenamed("li_pk", "pk"),
        "pk",
    )
    by_col = (
        diff.groupBy("column_name")
        .agg(F.count(F.lit(1)).alias("n_mismatches"))
        .orderBy(F.desc("n_mismatches"), "column_name")
    )
    for r in by_col.collect():
        print(f"stage 3 cell diff: {r['column_name']}: {r['n_mismatches']}")
    spark.stop()


if __name__ == "__main__":
    main(*(sys.argv[1:2] or []))
