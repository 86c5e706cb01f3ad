"""Partition-layout evidence: a partitioned sink must (a) prune
non-matching partitions at the file index, (b) under dynamic overwrite
replace only the partitions present in the incoming batch."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkdiff.session import load_table
from sparkdiff.sources.io import write_partitioned

from .conftest import SF_DIR_SMALL


def test_partitioned_scan_prunes(spark, tmp_path):
    events = load_table(spark, SF_DIR_SMALL, "events")
    path = str(tmp_path / "events_by_type")
    write_partitioned(events, path, ["event_type"])

    back = spark.read.parquet(path)
    one = back.filter(F.col("event_type") == "click")

    # the partition predicate must reach the file index (a directory
    # listing decision), not run as a post-scan row filter
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan, plan
    pf = plan.split("PartitionFilters")[1].split("]")[0]
    assert "event_type" in pf, plan
    # the data (non-partition) filter list must NOT carry the predicate
    assert "event_type" not in plan.split("PushedFilters")[1].split("]")[0], plan
    # and the data survives the round-trip
    assert one.count() == events.filter(F.col("event_type") == "click").count()


def test_dynamic_overwrite_replaces_only_present_partitions(spark, tmp_path):
    events = load_table(spark, SF_DIR_SMALL, "events").select(
        "event_id", "event_type", "value"
    )
    path = str(tmp_path / "events_dyn")
    write_partitioned(events, path, ["event_type"])
    before = {
        r.event_type: r.n
        for r in spark.read.parquet(path)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert len(before) > 1

    # overwrite ONE partition with a single marker row
    batch = spark.createDataFrame(
        [(999_999, 0.0, "click")], "event_id long, value double, event_type string"
    )
    write_partitioned(batch, path, ["event_type"], dynamic=True)

    after = {
        r.event_type: r.n
        for r in spark.read.parquet(path)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert after["click"] == 1  # replaced
    for k, n in before.items():
        if k != "click":
            assert after[k] == n, k  # untouched
