"""Unit pins for the q84–q89 operator family: profiling (exact + HLL
twin), stratified quotas, SemDeDup planted-duplicate recovery, and int8
quantization error bounds."""

import pytest
from pyspark.sql import functions as F

from sparkdiff.operators.profile import profile_pair, profile_table
from sparkdiff.operators.sampling import stratified_sample
from sparkdiff.operators.similarity import (
    cosine,
    cosine_flat,
    dot,
    dot_flat,
    int_dot,
    quantize_embeddings,
    quantize_int8,
    semdedup,
)
from sparkdiff.session import load_table

from .conftest import SF_DIR_SMALL


def test_profile_exact_matches_groundtruth(spark):
    li = load_table(spark, SF_DIR_SMALL, "lineitem")
    prof = {
        r["column"]: r.asDict()
        for r in profile_table(li, ["l_orderkey", "l_quantity"]).collect()
    }
    n = li.count()
    assert prof["l_orderkey"]["n_rows"] == n
    assert prof["l_orderkey"]["ndv"] == li.select("l_orderkey").distinct().count()
    assert prof["l_quantity"]["n_nonnull"] == li.filter(
        F.col("l_quantity").isNotNull()
    ).count()
    lo, hi = li.agg(F.min("l_quantity"), F.max("l_quantity")).first()
    assert prof["l_quantity"]["min_str"] == str(int(lo * 10000))
    assert prof["l_quantity"]["max_str"] == str(int(hi * 10000))


def test_profile_pair_matches_two_single_profiles(spark):
    """The round-9 fused pair profile must be value-identical, per
    side, to two independent hash-encoded profile_table runs — the
    fusion (one tagged union, one base agg, one melt) changes the plan
    shape only."""
    li = load_table(spark, SF_DIR_SMALL, "lineitem")
    a = li.filter(F.col("l_orderkey") % 3 != 0)
    b = li.filter(F.col("l_orderkey") % 5 != 0)
    cols = ["l_quantity", "l_returnflag", "l_shipdate"]
    fused = {
        r["column"]: r.asDict()
        for r in profile_pair(a, b, cols).collect()
    }
    for side_df, sfx in ((a, "l"), (b, "r")):
        single = {
            r["column"]: r.asDict()
            for r in profile_table(
                side_df, cols, ndv_encoding="hash"
            ).collect()
        }
        for c in cols:
            assert fused[c][f"nn_{sfx}"] == single[c]["n_nonnull"], (c, sfx)
            assert fused[c][f"ndv_{sfx}"] == single[c]["ndv"], (c, sfx)
            assert fused[c][f"min_{sfx}"] == single[c]["min_str"], (c, sfx)
            assert fused[c][f"max_{sfx}"] == single[c]["max_str"], (c, sfx)
    spark.catalog.clearCache()


def test_profile_hll_twin_within_rtol(spark):
    """The no-Expand HLL variant tracks exact ndv within the sketch's
    documented ~5% relative error (exploratory-scale path)."""
    li = load_table(spark, SF_DIR_SMALL, "lineitem")
    cols = ["l_orderkey", "l_partkey"]
    exact = {r["column"]: r["ndv"] for r in profile_table(li, cols).collect()}
    approx = {
        r["column"]: r["ndv"]
        for r in profile_table(li, cols, exact_ndv=False).collect()
    }
    for c in cols:
        assert approx[c] == pytest.approx(exact[c], rel=0.1)


def test_profile_counts_nulls(spark):
    df = spark.createDataFrame(
        [(1, None), (2, 5.0), (None, 5.0)], "a: long, b: double"
    )
    prof = {r["column"]: r.asDict() for r in profile_table(df).collect()}
    assert prof["a"]["n_rows"] == 3
    assert prof["a"]["n_nonnull"] == 2
    assert prof["b"]["ndv"] == 1
    assert prof["b"]["min_str"] == "50000"


def test_stratified_sample_quotas_and_stability(spark):
    d = load_table(spark, SF_DIR_SMALL, "documents")
    s = stratified_sample(d, ["lang", "source"], "doc_id", 2, seed="x")
    per = s.groupBy("lang", "source").count()
    avail = d.groupBy("lang", "source").count().withColumnRenamed(
        "count", "avail"
    )
    merged = per.join(avail, ["lang", "source"]).collect()
    for r in merged:
        assert r["count"] == min(2, r["avail"])
    # partition-invariant picks
    s2 = stratified_sample(
        d.repartition(13), ["lang", "source"], "doc_id", 2, seed="x"
    )
    assert {r.doc_id for r in s.collect()} == {r.doc_id for r in s2.collect()}


def test_dot_flat_bitwise_equals_fold(spark):
    e = load_table(spark, SF_DIR_SMALL, "embeddings").select(
        F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    rows = e.select(
        (dot(F.col("v"), F.col("v")) == dot_flat(F.col("v"), F.col("v"), 64))
        .alias("dok"),
        (
            cosine(F.col("v"), F.col("v"))
            == cosine_flat(F.col("v"), F.col("v"), 64)
        ).alias("cok"),
    ).collect()
    assert all(r.dok and r.cok for r in rows)


def test_semdedup_recovers_planted_duplicates(spark):
    e = load_table(spark, SF_DIR_SMALL, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    planted = (
        e.filter(F.col("vec_id") % 10 == 0)
        .withColumn("vec_id", F.col("vec_id") + 50_000)
    )  # exact copies: cosine 1.0
    out = semdedup(
        e.unionByName(planted), "vec_id", "v", k=4, iters=2, threshold=0.99
    )
    dropped = {r.vec_id for r in out.filter(F.col("kept") == 0).collect()}
    expect = {r.vec_id for r in planted.select("vec_id").collect()}
    # every planted copy shares a cluster with its identical original
    # (identical vectors can never split), so exactly the copies drop
    assert dropped == expect
    assert out.count() == e.count() + len(expect)


def test_semdedup_hierarchical_assignment_recovers_planted_dups(spark):
    """Above HIERARCHICAL_K_THRESHOLD semdedup's cluster assignment
    switches to the coarse-then-fine numpy form (round-9: flat auto-k
    assignment is O(n²·d/100) — a >20-minute job at the 64×-replica
    tier vs ~9 s hierarchical).  The scale path must keep semdedup's
    load-bearing properties: exact copies land in one cell (so every
    planted duplicate is dropped), cluster count ≈ k with bounded
    populations, and the result is run-to-run deterministic."""
    from sparkdiff.operators.retrieval import kmeans_assign_hierarchical
    from sparkdiff.operators.similarity import HIERARCHICAL_K_THRESHOLD

    e = load_table(spark, SF_DIR_SMALL, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    planted = (
        e.filter(F.col("vec_id") % 10 == 0)
        .withColumn("vec_id", F.col("vec_id") + 50_000)
    )  # exact copies: cosine 1.0 to their originals
    corpus = e.unionByName(planted)
    k = HIERARCHICAL_K_THRESHOLD  # forces the hierarchical branch
    out = semdedup(corpus, "vec_id", "v", k=k, iters=2, threshold=0.99)
    dropped = {r.vec_id for r in out.filter(F.col("kept") == 0).collect()}
    expect = {r.vec_id for r in planted.select("vec_id").collect()}
    # identical vectors have identical (coarse, fine) distances, and the
    # argmin tie-break is id-independent, so copies cannot split cells
    assert dropped == expect
    assert out.count() == corpus.count()
    # ~k dense cells, none empty-dominant: every population is bounded
    # well under the corpus (the pair-scan guarantee)
    pops = out.groupBy("cluster").count()
    n_cells = pops.count()
    assert k // 2 <= n_cells <= 2 * k
    assert pops.agg(F.max("count")).first()[0] < corpus.count() // 4
    # deterministic across runs (same session, same BLAS)
    again = semdedup(corpus, "vec_id", "v", k=k, iters=2, threshold=0.99)
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, again.collect())
    )
    # the standalone operator agrees with what semdedup consumed
    assign = kmeans_assign_hierarchical(corpus, "vec_id", "v", k=k, iters=2)
    assert assign.count() == corpus.count()
    assert assign.select("cluster").distinct().count() == n_cells


def test_semdedup_auto_k_matches_explicit_heuristic_k(spark):
    """k=None derives max(4, n // 100) from one corpus count; the
    result must be identical to passing that k explicitly (the auto
    path adds no other behavior), and small corpora floor at k=4."""
    e = load_table(spark, SF_DIR_SMALL, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    n = e.count()  # 500 -> heuristic k = max(4, 5) = 5
    k_expect = max(4, n // 100)
    assert k_expect == 5
    auto = semdedup(e, "vec_id", "v", k=None, iters=2, threshold=0.95)
    explicit = semdedup(
        e, "vec_id", "v", k=k_expect, iters=2, threshold=0.95
    )
    assert sorted(map(tuple, auto.collect())) == sorted(
        map(tuple, explicit.collect())
    )
    assert auto.select("cluster").distinct().count() == k_expect
    # floor: 50 vectors -> k = 4, never fewer
    small = semdedup(
        e.filter(F.col("vec_id") < 50), "vec_id", "v", k=None, iters=2
    )
    assert small.select("cluster").distinct().count() == 4


def test_quantize_int8_codes_and_error_bound(spark):
    e = load_table(spark, SF_DIR_SMALL, "embeddings").select(
        "vec_id", F.col("embedding").alias("v")
    )
    q = quantize_int8(e, "vec_id", "v")
    rows = q.collect()
    assert len(rows) == e.count()
    for r in rows:
        assert -127 <= r.min_code <= r.max_code <= 127
        # per-dim error < amax/127 <= 1/127 for unit-ish floats; the
        # scaled total is bounded by n_dims * 2^40 * (max|v|/127)
        assert r.qerr_s >= 0
    # zero vector quantizes to all-zero codes with zero error
    z = spark.createDataFrame([(1, [0.0, 0.0, 0.0])], "vec_id: long, v: array<double>")
    rz = quantize_int8(z, "vec_id", "v").first()
    assert rz.max_code == 0 and rz.min_code == 0 and rz.qerr_s == 0


def test_ndv_encodings_agree_and_default_is_injective(spark):
    """The default encoding is the provably-injective 'typed' (exact
    integer images on a long rail, strings otherwise); 'string' is the
    all-string injective form and 'hash' the opt-in 64-bit variant —
    all three must report the same NDV on real data."""
    import inspect

    assert (
        inspect.signature(profile_table).parameters["ndv_encoding"].default
        == "typed"
    )
    li = load_table(spark, SF_DIR_SMALL, "lineitem")
    cols = ["l_orderkey", "l_quantity", "l_returnflag", "l_shipdate"]
    t = {r["column"]: r["ndv"] for r in profile_table(li, cols).collect()}
    s = {
        r["column"]: r["ndv"]
        for r in profile_table(li, cols, ndv_encoding="string").collect()
    }
    h = {
        r["column"]: r["ndv"]
        for r in profile_table(li, cols, ndv_encoding="hash").collect()
    }
    assert t == s == h


def test_quantize_embeddings_codes_and_int_dot(spark):
    """quantize_embeddings emits the codes (round half-up, per-vector
    symmetric scale) plus the exact integer sum of squares; int_dot is
    exact long arithmetic.  Hand-checkable vectors pin the rounding
    convention; the zero vector maps to zero codes and qss=0."""
    e = spark.createDataFrame(
        [
            (1, [1.0, -0.5, 0.25]),   # scale 127/1.0: [127, -63, 32]
            (2, [0.0, 0.0]),          # zero vector -> zero codes
            (3, [0.004, -0.002]),     # tiny but nonzero: [127, -63]
        ],
        "vec_id: long, v: array<double>",
    )
    q = {r.vec_id: r for r in quantize_embeddings(e, "vec_id", "v").collect()}
    # round-half-up: -0.5*127 = -63.5 -> floor(-63.5+0.5) = -63
    assert q[1].qvec == [127, -63, 32]
    assert q[1].qss == 127 * 127 + 63 * 63 + 32 * 32
    assert q[2].qvec == [0, 0] and q[2].qss == 0
    # per-vector scale: max|v|=0.004 maps to 127 regardless of magnitude
    assert q[3].qvec == [127, -63]
    # int_dot: exact long arithmetic on the emitted codes
    pairs = spark.createDataFrame(
        [([127, -63, 32], [1, 2, 3]), ([0, 0, 0], [5, 6, 7])],
        "a: array<int>, b: array<int>",
    )
    got = [
        r.d for r in pairs.select(int_dot(F.col("a"), F.col("b")).alias("d")).collect()
    ]
    assert got == [127 * 1 - 63 * 2 + 32 * 3, 0]


def test_jl_projection_signs_and_exactness(spark):
    """The ±1 matrix is a pure function of (salt, i, j); projecting the
    i-th basis vector returns exactly the matrix's i-th column (the
    flat chain adds one nonzero term, so no float accumulation at all);
    scaling by 2 commutes exactly (2x is an exact double op)."""
    from sparkdiff.operators.similarity import jl_project, jl_signs

    signs = jl_signs(4, 3, salt="t")
    assert all(s in (1.0, -1.0) for row in signs for s in row)
    assert signs == jl_signs(4, 3, salt="t")  # deterministic
    assert signs != jl_signs(4, 3, salt="u")  # salt-sensitive
    basis = spark.createDataFrame(
        [(i, [1.0 if k == i else 0.0 for k in range(4)]) for i in range(4)],
        "vec_id: long, v: array<double>",
    )
    got = {
        r.vec_id: r.p
        for r in basis.select(
            "vec_id", jl_project(F.col("v"), signs).alias("p")
        ).collect()
    }
    for i in range(4):
        assert got[i] == [signs[j][i] for j in range(3)]
    doubled = spark.createDataFrame(
        [(0, [2.0, 0.0, 0.0, 0.0])], "vec_id: long, v: array<double>"
    )
    gd = doubled.select(jl_project(F.col("v"), signs).alias("p")).first().p
    assert gd == [2.0 * signs[j][0] for j in range(3)]
    # the broadcast-relation variant is value-identical to the literal
    from sparkdiff.operators.similarity import with_jl_projection

    wb = {
        r.vec_id: r.p
        for r in with_jl_projection(basis, "v", signs).collect()
    }
    assert wb == got
    import pytest as _pytest

    with _pytest.raises(ValueError, match="with_jl_projection"):
        with_jl_projection(basis.withColumn("_jl_s", F.lit(1)), "v", signs)


def test_skew_report_hand_computed(spark):
    """12 rows over two key columns with known group sizes — every
    output column checked against hand arithmetic, including the
    NULL-key group and the deterministic struct-max top key."""
    from sparkdiff.operators.profile import skew_report

    rows = (
        [("a", 1)] * 6 + [("b", 1)] * 3 + [("c", 2)] * 2 + [(None, 2)]
    )
    df = spark.createDataFrame(rows, "k: string, g: long")
    out = {r.key_col: r for r in skew_report(df, ["k", "g"]).collect()}
    k = out["k"]
    # groups: a=6, b=3, c=2, NULL=1 -> n=12, keys=4, max=6
    assert (k.n_rows, k.n_keys, k.max_n) == (12, 4, 6)
    assert k.mean_milli == 1000 * 12 // 4 == 3000
    assert k.skew_milli == 1000 * 6 * 4 // 12 == 2000
    assert k.salt == (6 * 4 + 12 - 1) // 12 == 2
    assert k.top_key == "a"
    # p99: smallest size with cum keys >= ceil(0.99*4)=4 -> 6
    assert k.p99_n == 6
    g = out["g"]
    # groups: 1 -> 9 rows, 2 -> 3 rows
    assert (g.n_rows, g.n_keys, g.max_n, g.top_key) == (12, 2, 9, "1")
    assert g.skew_milli == 1000 * 9 * 2 // 12 == 1500
