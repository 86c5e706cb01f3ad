"""Scale-evidence test: with both diff sides bucketed by pk, the
fingerprint join plans with NO shuffle exchange (SCALE.md's co-location
claim) — the repeated-validation fast path at cluster scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkdiff import testkit
from sparkdiff.functions.canonical import row_fingerprint

from .conftest import SF_DIR_SMALL


def test_bucketed_fingerprint_join_has_no_shuffle(spark, tmp_path):
    hive, sf = testkit.hive_sf_pair(spark, SF_DIR_SMALL)
    spark.sql("DROP TABLE IF EXISTS hive_bucketed")
    spark.sql("DROP TABLE IF EXISTS sf_bucketed")
    (
        hive.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
        .option("path", str(tmp_path / "hive_b"))
        .saveAsTable("hive_bucketed")
    )
    (
        sf.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
        .option("path", str(tmp_path / "sf_b"))
        .saveAsTable("sf_bucketed")
    )
    h = spark.table("hive_bucketed")
    s = spark.table("sf_bucketed")
    cols = ["c_name", "c_nationkey", "c_acctbal"]
    hj = h.select("c_custkey", row_fingerprint(h, cols).alias("fp_h"))
    sj = s.select("c_custkey", row_fingerprint(s, cols).alias("fp_s"))

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = hj.join(sj, "c_custkey").filter(F.col("fp_h") != F.col("fp_s"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS hive_bucketed")
        spark.sql("DROP TABLE IF EXISTS sf_bucketed")
