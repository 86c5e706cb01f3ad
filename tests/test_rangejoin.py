"""range_join_bucketed: bucket-decomposition correctness (vs a naive
range join on small data), bucket-width invariance, inclusive bounds."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkdiff.operators.asof import range_join_bucketed


def _frames(spark):
    left = spark.createDataFrame(
        [(1, 100, 0), (1, 101, 1000), (2, 102, 500), (3, 103, 0)],
        "k long, lid long, ms long",
    ).select("k", "lid", F.timestamp_millis("ms").alias("lts"))
    right = spark.createDataFrame(
        [
            (1, 200, 0),      # == left 100 lower bound
            (1, 201, 300),    # inside for 100
            (1, 202, 1300),   # inside for 101, outside for 100 (>0+300)
            (2, 203, 899),    # inside for 102 (500+399)
            (2, 204, 901),    # outside for 102 with upper=400
            (9, 205, 0),      # key never matches
        ],
        "k long, rid long, ms long",
    ).select("k", "rid", F.timestamp_millis("ms").alias("rts"))
    return left, right


def _naive(spark, lower, upper):
    left, right = _frames(spark)
    return sorted(
        (r.lid, r.rid)
        for r in left.join(right, "k")
        .filter(
            (F.unix_millis("rts") >= F.unix_millis("lts") + lower)
            & (F.unix_millis("rts") <= F.unix_millis("lts") + upper)
        )
        .select("lid", "rid")
        .collect()
    )


@pytest.mark.parametrize("bucket_ms", [None, 1, 7, 400, 10_000])
def test_bucketed_equals_naive_for_any_bucket_width(spark, bucket_ms):
    left, right = _frames(spark)
    got = sorted(
        (r.lid, r.rid)
        for r in range_join_bucketed(
            left, right, "k", "lts", "rts", 0, 400, bucket_ms=bucket_ms
        )
        .select("lid", "rid")
        .collect()
    )
    assert got == _naive(spark, 0, 400)


def test_bounds_are_inclusive_and_window_can_look_back(spark):
    left, right = _frames(spark)
    got = sorted(
        (r.lid, r.rid)
        for r in range_join_bucketed(
            left, right, "k", "lts", "rts", -300, 0
        )
        .select("lid", "rid")
        .collect()
    )
    assert got == _naive(spark, -300, 0)
    # right 200 sits exactly on left 100's upper bound (both ms=0, window
    # [-300, 0]) — inclusive bounds must keep it
    assert (100, 200) in got


def test_plan_is_equi_join_not_nested_loop(spark):
    left, right = _frames(spark)
    j = range_join_bucketed(left, right, "k", "lts", "rts", 0, 400)
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_rejects_bad_bounds(spark):
    left, right = _frames(spark)
    with pytest.raises(ValueError):
        range_join_bucketed(left, right, "k", "lts", "rts", 400, 0)
    with pytest.raises(ValueError):
        range_join_bucketed(left, right, "k", "lts", "rts", 0, 400, bucket_ms=0)
