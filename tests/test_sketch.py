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


# --- HyperLogLog -----------------------------------------------------------

from sparkdiff.operators.sketch import (  # noqa: E402
    HLL_SUFFIX_BITS,
    hll_alpha,
    hll_corrected,
    hll_estimate,
    hll_merge,
    hll_registers,
)


def _ints(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.concat(F.lit("v"), F.col("id")).alias("token")
    )


def test_hll_merge_equals_registers_of_union(spark):
    """MAX-merge of two halves' registers == registers of the whole —
    the property that lets every partition sketch independently."""
    whole = _ints(spark, 0, 2000)
    a, b = _ints(spark, 0, 1200), _ints(spark, 1100, 2000)  # overlapping
    union = a.unionByName(b)
    ra = hll_registers(a, p=8, salt="m-")
    rb = hll_registers(b, p=8, salt="m-")
    merged = {
        (r.bucket, r.reg) for r in hll_merge(ra, rb).collect()
    }
    direct = {
        (r.bucket, r.reg) for r in hll_registers(union, p=8, salt="m-").collect()
    }
    assert merged == direct
    # and duplicates are free: union-with-overlap == the distinct whole
    assert direct == {
        (r.bucket, r.reg) for r in hll_registers(whole, p=8, salt="m-").collect()
    }


def test_hll_estimate_within_theory_error(spark):
    """Raw estimate error within 5 standard errors (1.04/sqrt(m)) of
    truth at a cardinality where raw HLL is in-regime (n >> 2.5m)."""
    n, p = 20000, 8
    est = hll_estimate(
        hll_registers(_ints(spark, 0, n), p=p, salt="e-"), p=p
    ).collect()[0]
    se = 1.04 / (1 << p) ** 0.5
    assert abs(est.hll_ndv - n) / n < 5 * se
    assert est.buckets_hit <= 1 << p


def test_hll_duplicates_do_not_move_the_estimate(spark):
    """Occurrence multiplicity is invisible to MAX registers."""
    once = _ints(spark, 0, 500)
    thrice = once.unionByName(once).unionByName(once)
    e1 = hll_estimate(hll_registers(once, p=8, salt="d-"), p=8).collect()[0]
    e3 = hll_estimate(hll_registers(thrice, p=8, salt="d-"), p=8).collect()[0]
    assert (e1.buckets_hit, e1.hll_ndv) == (e3.buckets_hit, e3.hll_ndv)


def test_hll_corrected_matches_python_linear_counting(spark):
    """The libm-bearing correction column == math.log replay, and it
    only fires in the small-range regime."""
    import math

    n, p, m = 100, 8, 256
    regs = hll_registers(_ints(spark, 0, n), p=p, salt="c-")
    est = hll_estimate(regs, p=p)
    row = est.select(
        "buckets_hit",
        "hll_ndv",
        hll_corrected(F.col("hll_ndv"), F.col("buckets_hit"), p=p).alias("corr"),
    ).collect()[0]
    assert row.hll_ndv <= int(2.5 * m)  # small-range regime at n=100
    expect = math.floor(m * math.log(m / (m - row.buckets_hit)))
    assert row.corr == expect
    # linear counting should beat the raw estimate at tiny n
    assert abs(row.corr - n) <= abs(row.hll_ndv - n)


def test_hll_register_values_are_bit_ranks(spark):
    """Registers are in [1, HLL_SUFFIX_BITS+1] — the bin()-length rank
    construction can produce nothing else."""
    regs = hll_registers(_ints(spark, 0, 5000), p=8, salt="r-").collect()
    assert regs
    assert all(1 <= r.reg <= HLL_SUFFIX_BITS + 1 for r in regs)


def test_hll_rejects_bad_p(spark):
    with pytest.raises(ValueError):
        hll_registers(_ints(spark, 0, 10), p=3)
    with pytest.raises(ValueError):
        hll_alpha(100)
    # tabulated small-m constants exist (Flajolet et al. 2007)
    assert hll_alpha(64) == 0.709


# --------------------------------------------------------------------------
# KMV (k-minimum-values) sketch
# --------------------------------------------------------------------------


def _kmv_py(values, k, salt):
    """Mirrored reference: k smallest distinct md5-60-bit hashes."""
    import hashlib

    hs = {
        int(hashlib.md5((v + salt).encode()).hexdigest()[:15], 16)
        for v in set(values)
    }
    return sorted(hs)[:k]


def test_kmv_sample_is_k_smallest_distinct(spark):
    from sparkdiff.operators.sketch import kmv_sketch

    vals = [f"w{i}" for i in range(40)] * 3  # duplicates cost nothing
    occ = _occ(spark, vals)
    got = sorted(r.hv for r in kmv_sketch(occ, k=8, salt="kt").collect())
    assert got == _kmv_py(vals, 8, "kt")
    # under-full group: the sample IS the distinct set
    small = _occ(spark, ["a", "b", "b", "c"])
    got_s = sorted(r.hv for r in kmv_sketch(small, k=8, salt="kt").collect())
    assert got_s == _kmv_py(["a", "b", "c"], 8, "kt")


def test_kmv_two_level_rail_matches_any_fan(spark):
    """The skew-proof sub-bucket rail is lossless for every fan."""
    from sparkdiff.operators.sketch import kmv_sketch

    vals = [f"v{i}" for i in range(200)]
    occ = _occ(spark, vals)
    want = _kmv_py(vals, 16, "kf")
    for fan in (1, 3, 32):
        got = sorted(
            r.hv for r in kmv_sketch(occ, k=16, salt="kf", fan=fan).collect()
        )
        assert got == want, fan


def test_kmv_merge_equals_sketch_of_union(spark):
    from sparkdiff.operators.sketch import kmv_merge, kmv_sketch

    a = [f"a{i}" for i in range(60)] + ["shared0", "shared1"]
    b = [f"b{i}" for i in range(60)] + ["shared0", "shared1"]
    sa = kmv_sketch(_occ(spark, a), k=12, salt="km")
    sb = kmv_sketch(_occ(spark, b), k=12, salt="km")
    merged = sorted(r.hv for r in kmv_merge(sa, sb, k=12).collect())
    direct = sorted(
        r.hv for r in kmv_sketch(_occ(spark, a + b), k=12, salt="km").collect()
    )
    assert merged == direct


def test_kmv_estimate_exact_below_k_and_within_theory_above(spark):
    from sparkdiff.operators.sketch import kmv_estimate, kmv_sketch

    small = _occ(spark, ["a", "b", "c", "c"])
    est = kmv_estimate(kmv_sketch(small, k=64, salt="ke"), k=64).collect()
    assert est[0].kmv_ndv == 3  # under-full -> exact
    n, k = 5000, 256
    occ = _occ(spark, [f"t{i}" for i in range(n)])
    got = kmv_estimate(kmv_sketch(occ, k=k, salt="ke"), k=k).collect()[0].kmv_ndv
    # ~1/sqrt(k-2) relative error; allow 4 sigma
    assert abs(got - n) < 4 * n / (k - 2) ** 0.5


def test_kmv_pair_overlap_membership_is_exact(spark):
    """Hand-replay the per-pair combined sample on a constructed
    overlap: counts in the sample match the Python mirror exactly."""
    from sparkdiff.operators.sketch import kmv_pair_overlap, kmv_sketch

    shared = [f"s{i}" for i in range(30)]
    a = shared + [f"a{i}" for i in range(50)]
    b = shared + [f"b{i}" for i in range(50)]
    k = 16
    rows = [("A", v) for v in a] + [("B", v) for v in b]
    occ = spark.createDataFrame(rows, "src: string, token: string")
    sk = kmv_sketch(occ, "token", keys=["src"], k=k, salt="kp")
    got = kmv_pair_overlap(sk, "src", k=k).collect()[0]
    sa, sb = set(_kmv_py(a, k, "kp")), set(_kmv_py(b, k, "kp"))
    L = sorted(sa | sb)[:k]
    c = sum(1 for h in L if h in sa and h in sb)
    kth = max(L)
    union = len(L) if len(L) < k else int((k - 1) * (1 << 60) / kth)
    assert (got.key_a, got.key_b) == ("A", "B")
    assert got.kmv_union == union
    assert got.kmv_inter == c * union // len(L)
    assert got.jaccard_pm == c * 1000 // len(L)


def test_kmv_rejects_bad_k(spark):
    from sparkdiff.operators.sketch import kmv_sketch

    with pytest.raises(ValueError):
        kmv_sketch(_occ(spark, ["a"]), k=1)


def test_kmv_assume_distinct_equals_default(spark):
    """Pre-distincted input + assume_distinct=True is the same sketch
    the default path builds from raw occurrences."""
    from sparkdiff.operators.sketch import kmv_sketch

    vals = [f"w{i % 50}" for i in range(300)]  # heavy duplication
    occ = _occ(spark, vals)
    a = sorted(r.hv for r in kmv_sketch(occ, k=16, salt="kd").collect())
    b = sorted(
        r.hv
        for r in kmv_sketch(
            occ.distinct(), k=16, salt="kd", assume_distinct=True
        ).collect()
    )
    assert a == b


def test_kmv_pair_overlap_underfull_groups_are_exact(spark):
    """Both groups below k: the combined sample is the whole union, so
    union/intersection/jaccard are EXACT set arithmetic."""
    from sparkdiff.operators.sketch import kmv_pair_overlap, kmv_sketch

    rows = [("A", v) for v in ("x", "y", "z")] + [
        ("B", v) for v in ("y", "z", "w", "q")
    ]
    occ = spark.createDataFrame(rows, "src: string, token: string")
    sk = kmv_sketch(occ, "token", keys=["src"], k=64, salt="ku")
    got = kmv_pair_overlap(sk, "src", k=64).collect()[0]
    assert got.kmv_union == 5   # |{x,y,z,w,q}|
    assert got.kmv_inter == 2 * 5 // 5
    assert got.jaccard_pm == 2 * 1000 // 5
