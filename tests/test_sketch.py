"""Count-min sketch pins: one-sided error, min-over-rows estimates at
collision-forcing widths, and the cell-wise mergeability that makes the
sketch the 100 TB counts structure."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkdiff.operators.sketch import (
    cms_bucket,
    cms_estimate,
    cms_merge,
    count_min_sketch,
)


def _occ(spark, words):
    return spark.createDataFrame([(w,) for w in words], "token: string")


def test_cms_never_undercounts_and_tiny_width_collides(spark):
    words = ["a"] * 5 + ["b"] * 3 + ["c"] * 2 + ["d"]
    occ = _occ(spark, words)
    exact = {"a": 5, "b": 3, "c": 2, "d": 1}
    # w=2: collisions are certain (4 tokens, 2 buckets per row)
    sk = count_min_sketch(occ, d=2, w=2, salt="t-")
    probes = _occ(spark, list(exact))
    est = {
        r.token: r.cms_est
        for r in cms_estimate(sk, probes, d=2, w=2, salt="t-").collect()
    }
    assert set(est) == set(exact)
    for t, c in exact.items():
        assert est[t] >= c  # one-sided
    # total mass per row is conserved: every row's cells sum to N
    per_row = {
        r.r: r.s
        for r in sk.groupBy("r").agg(F.sum("cnt").alias("s")).collect()
    }
    assert per_row == {0: len(words), 1: len(words)}
    # wide sketch: no collisions among 4 tokens -> estimates exact
    wide = count_min_sketch(occ, d=2, w=4096, salt="t-")
    est_w = {
        r.token: r.cms_est
        for r in cms_estimate(wide, probes, d=2, w=4096, salt="t-").collect()
    }
    assert est_w == exact


def test_cms_estimate_is_min_over_rows(spark):
    """Hand-replay: the estimate equals the minimum of the probe's d
    cell counts, computed from the same md5 buckets."""
    words = ["x"] * 4 + ["y"] * 2 + ["z"]
    occ = _occ(spark, words)
    d, w, salt = 3, 2, "mr-"
    sk = {(r.r, r.b): r.cnt for r in count_min_sketch(occ, d=d, w=w, salt=salt).collect()}
    buckets = _occ(spark, ["x", "y", "z"]).select(
        "token", *[cms_bucket("token", i, w, salt).alias(f"b{i}") for i in range(d)]
    ).collect()
    expect = {
        row.token: min(sk[(i, row[f"b{i}"])] for i in range(d))
        for row in buckets
    }
    sk_df = count_min_sketch(occ, d=d, w=w, salt=salt)
    est = {
        r.token: r.cms_est
        for r in cms_estimate(
            sk_df, _occ(spark, ["x", "y", "z"]), d=d, w=w, salt=salt
        ).collect()
    }
    assert est == expect


def test_cms_merge_equals_sketch_of_union(spark):
    a = _occ(spark, ["a", "a", "b", "c"])
    b = _occ(spark, ["b", "c", "c", "d"])
    d, w, salt = 4, 8, "mg-"
    merged = cms_merge(
        count_min_sketch(a, d=d, w=w, salt=salt),
        count_min_sketch(b, d=d, w=w, salt=salt),
    )
    union = count_min_sketch(a.unionByName(b), d=d, w=w, salt=salt)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, union.collect())
    )


def test_cms_rejects_bad_geometry(spark):
    with pytest.raises(ValueError, match="d and w"):
        count_min_sketch(_occ(spark, ["a"]), d=0, w=8)


def test_cms_weighted_build_equals_occurrence_build(spark):
    """Sketching a (token, count) frequency table with weight_col gives
    the exact same cells as sketching the raw occurrences — the batch
    shape that hashes vocab-sized rows instead of d× every occurrence."""
    words = ["a"] * 5 + ["b"] * 3 + ["c"] * 2 + ["d"]
    occ = _occ(spark, words)
    freq = occ.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    a = count_min_sketch(occ, d=3, w=8, salt="wb-")
    b = count_min_sketch(freq, d=3, w=8, salt="wb-", weight_col="n")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
