"""Deterministic hash sampling/splitting: partition-invariance, split
totality, per-key stability, and weight validation."""

import re

import pytest
from pyspark.sql import functions as F

from sparkdiff.operators.sampling import hash_sample, hash_split, unit_hash
from sparkdiff.session import load_table

from .conftest import SF_DIR_SMALL

WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}


def test_split_is_total_and_partition_invariant(spark):
    d = load_table(spark, SF_DIR_SMALL, "documents")
    a = hash_split(d, "doc_id", WEIGHTS, seed="s")
    b = hash_split(d.repartition(17), "doc_id", WEIGHTS, seed="s")
    ga = {r.doc_id: r.split for r in a.select("doc_id", "split").collect()}
    gb = {r.doc_id: r.split for r in b.select("doc_id", "split").collect()}
    assert ga == gb
    assert set(ga.values()) == {"train", "val", "test"}
    assert len(ga) == d.count()


def test_split_proportions_roughly_match_weights(spark):
    d = load_table(spark, SF_DIR_SMALL, "documents")
    n = d.count()
    counts = {
        r.split: r["count"]
        for r in hash_split(d, "doc_id", WEIGHTS).groupBy("split").count().collect()
    }
    assert counts["train"] / n == pytest.approx(0.8, abs=0.08)
    assert counts["val"] / n == pytest.approx(0.1, abs=0.06)


def test_seed_changes_assignment_but_stays_deterministic(spark):
    d = load_table(spark, SF_DIR_SMALL, "documents")
    s1 = {r.doc_id: r.split for r in hash_split(d, "doc_id", WEIGHTS, "a").collect()}
    s2 = {r.doc_id: r.split for r in hash_split(d, "doc_id", WEIGHTS, "b").collect()}
    assert s1 != s2  # different seed, different shuffle of assignments
    s1_again = {
        r.doc_id: r.split for r in hash_split(d, "doc_id", WEIGHTS, "a").collect()
    }
    assert s1 == s1_again


def test_hash_sample_is_consistent_subset(spark):
    d = load_table(spark, SF_DIR_SMALL, "documents")
    small = {r.doc_id for r in hash_sample(d, "doc_id", 0.2).select("doc_id").collect()}
    big = {r.doc_id for r in hash_sample(d, "doc_id", 0.5).select("doc_id").collect()}
    assert small <= big  # nested samples: raising the rate only adds rows
    assert 0 < len(small) < len(big) < d.count()


def test_unit_hash_range_and_weight_validation(spark):
    d = load_table(spark, SF_DIR_SMALL, "documents").select(
        unit_hash("doc_id").alias("u")
    )
    mm = d.agg(F.min("u"), F.max("u")).collect()[0]
    assert 0.0 <= mm[0] and mm[1] < 1.0
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(
            load_table(spark, SF_DIR_SMALL, "documents"),
            "doc_id",
            {"a": 0.5, "b": 0.4},
        )
    with pytest.raises(ValueError, match="fraction"):
        hash_sample(load_table(spark, SF_DIR_SMALL, "documents"), "doc_id", 1.5)


def test_repetition_ratio_known_values(spark):
    from sparkdiff.functions.textstats import repetition_ratio

    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),     # trigrams: 2 total, 1 distinct
            (2, "all words here differ"),   # no duplicate trigrams
            (3, "ab"),                      # < 3 tokens
        ],
        "id int, text string",
    )
    toks = df.select(
        "id",
        F.filter(
            F.split(F.lower("text"), "[^a-z0-9]+"), lambda t: F.length(t) > 0
        ).alias("_t"),
    )
    got = {
        r.id: r.rep
        for r in toks.select(
            "id", repetition_ratio(F.col("_t"), 3).alias("rep")
        ).collect()
    }
    assert got[1] == pytest.approx(0.5)
    assert got[2] == 0.0
    assert got[3] == 0.0


def test_token_budget_sample_respects_budget_and_partitioning(spark):
    """Every domain's kept prefix stays within budget, keeps at least
    one doc (budget >> single doc), and the kept set is identical under
    a different physical partitioning (content-hash determinism)."""
    from sparkdiff.functions.textstats import ws_token_count
    from sparkdiff.operators.sampling import token_budget_sample

    scored = load_table(spark, SF_DIR_SMALL, "documents").select(
        "doc_id", "source", ws_token_count("text").alias("n_tok")
    )
    kept = token_budget_sample(scored, "doc_id", "source", "n_tok", budget=600)
    rows = kept.collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    assert by_src, "nothing kept"
    for src, rs in by_src.items():
        assert max(r.cum_tokens for r in rs) <= 600
        # cum of the heaviest row equals the sum of its domain's kept rows
        assert max(r.cum_tokens for r in rs) == sum(r.n_tok for r in rs)
    again = token_budget_sample(
        scored.repartition(7), "doc_id", "source", "n_tok", budget=600
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))

    import pytest as _pytest

    with _pytest.raises(ValueError, match="budget"):
        token_budget_sample(scored, "doc_id", "source", "n_tok", budget=0)


def _pps_reference(pairs, k, seed=""):
    """Pure-python systematic PPS resampling over (key, weight)."""
    import hashlib

    def u(key):
        h = int(hashlib.md5(f"{key}{seed}".encode()).hexdigest()[:15], 16)
        return (h % 10**6) / 10**6

    laid = sorted((u(key), key, w) for key, w in pairs)
    total = sum(w for _, _, w in laid)

    def cnt(x):
        return max(0, min(k, (2 * k * x + total - 1) // (2 * total)))

    out, cum = {}, 0
    for _, key, w in laid:
        c0, cum = cum, cum + w
        n = cnt(cum) - cnt(c0)
        if n >= 1:
            out[key] = n
    return out


def test_systematic_weighted_sample_matches_reference(spark):
    from sparkdiff.operators.sampling import systematic_weighted_sample

    df = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 17).alias("w")
    )
    got = {
        r.doc_id: r.n_copies
        for r in systematic_weighted_sample(df, "doc_id", "w", 50).collect()
    }
    want = _pps_reference([(i, i % 17) for i in range(1000)], 50)
    assert got == want
    assert sum(got.values()) == 50
    # zero-weight rows (id % 17 == 0) can never be drawn
    assert all(i % 17 != 0 for i in got)
    got7 = {
        r.doc_id: r.n_copies
        for r in systematic_weighted_sample(
            df.repartition(7), "doc_id", "w", 50
        ).collect()
    }
    assert got7 == want


def test_systematic_weighted_sample_heavy_row_drawn_multiple_times(spark):
    from sparkdiff.operators.sampling import systematic_weighted_sample

    df = spark.createDataFrame(
        [(1, 1000), (2, 1), (3, 1)], "doc_id long, w long"
    )
    got = {
        r.doc_id: r.n_copies
        for r in systematic_weighted_sample(df, "doc_id", "w", 10).collect()
    }
    assert sum(got.values()) == 10
    assert got[1] >= 9  # ~99.8% of the mass


def test_systematic_weighted_sample_validation(spark):
    from sparkdiff.operators.sampling import systematic_weighted_sample

    df = spark.createDataFrame([(1, 5)], "doc_id long, w long")
    with pytest.raises(ValueError, match="k must be"):
        systematic_weighted_sample(df, "doc_id", "w", 0)
    neg = spark.createDataFrame([(1, 5), (2, -1)], "doc_id long, w long")
    with pytest.raises(Exception, match="weights must be"):
        systematic_weighted_sample(neg, "doc_id", "w", 3).collect()
    # all-zero weights: W = 0 makes the draw positions undefined; must
    # raise, not silently return an empty sample (regression: the old
    # guard let `div (2*W)` produce NULL counts)
    zero = spark.createDataFrame([(1, 0), (2, 0)], "doc_id long, w long")
    with pytest.raises(Exception, match="positive total"):
        systematic_weighted_sample(zero, "doc_id", "w", 3).collect()
    # headroom boundary: W*(2k+1) just over 2^63-1 must raise — the old
    # floor-form guard admitted the exact 2*k*W == 2^63 boundary
    k = 4
    w_bad = ((1 << 63) - 1) // (2 * k + 1) + 1
    big = spark.createDataFrame([(1, w_bad)], "doc_id long, w long")
    with pytest.raises(Exception, match="signed long"):
        systematic_weighted_sample(big, "doc_id", "w", k).collect()


def test_systematic_weighted_sample_no_single_partition_exchange(spark):
    """The prefix sum must ride the range-partition rail — a
    SinglePartition exchange would be the global-window cliff."""
    from sparkdiff.operators.sampling import systematic_weighted_sample

    df = spark.range(0, 100).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7 + 1).alias("w")
    )
    plan = (
        systematic_weighted_sample(df, "doc_id", "w", 10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # every running-sum window is partitioned by the range-bucket id —
    # never the empty partition spec that would serialize the corpus
    for m in re.findall(r"windowspecdefinition\((\w+)", plan):
        assert m.startswith("_pid"), plan
    # the only SinglePartition exchange is the one-row total over the
    # #partitions-row subtotal table (bounded input, not corpus-sized)
    assert plan.count("Exchange SinglePartition") == 1


from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=300, deadline=None)
@given(
    ws=st.lists(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=60),
    k=st.integers(min_value=1, max_value=500),
)
def test_pps_draw_arithmetic_properties(ws, k):
    """The integer systematic-draw formula (pure python, the same math
    the Spark columns compute): exactly k total draws, every draw count
    within ceil/floor of the real-valued expectation k*w/W, and
    zero-weight rows never drawn — for ANY weights and k."""
    if sum(ws) == 0:
        return
    got = _pps_reference(list(enumerate(ws)), k)
    assert sum(got.values()) == k
    total = sum(ws)
    for key, w in enumerate(ws):
        n = got.get(key, 0)
        exp = k * w / total
        assert exp - 1 < n < exp + 1, (key, w, n, exp)
        if w == 0:
            assert n == 0


def test_systematic_weighted_sample_empty_input(spark):
    from sparkdiff.operators.sampling import systematic_weighted_sample

    df = spark.createDataFrame([], "doc_id long, w long")
    out = systematic_weighted_sample(df, "doc_id", "w", 5)
    assert out.count() == 0
    assert "n_copies" in out.columns


def _priority_reference(rows, k, seed=""):
    """Pure-python priority sampling on the same md5 variate."""
    import hashlib

    cand = []
    for key, w in rows:
        if w <= 0:
            continue
        m = int(hashlib.md5(f"{key}{seed}".encode()).hexdigest()[:15], 16) % 10**6
        cand.append((float(w * 10**6) / float(m + 1), key, w))
    cand.sort(key=lambda t: (-t[0], t[1]))
    tau = cand[k][0] if len(cand) >= k + 1 else 0.0
    return [(key, w, q, max(float(w), tau)) for q, key, w in cand[:k]]


def test_priority_sample_matches_reference(spark):
    from sparkdiff.operators.sampling import priority_sample

    rows = [(i, (i * 37) % 100) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = [
        (r["doc_id"], r["w"], r["priority"], r["est_weight"])
        for r in priority_sample(df, "doc_id", "w", k=50, seed="s")
        .orderBy("doc_id")
        .collect()
    ]
    ref = sorted(_priority_reference(rows, 50, "s"))
    assert got == ref


def test_priority_sample_small_population_tau_zero(spark):
    from sparkdiff.operators.sampling import priority_sample

    rows = [(1, 10), (2, 20), (3, 0)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    out = priority_sample(df, "doc_id", "w", k=5).collect()
    # n <= k: everything positive-weight sampled, tau = 0, est == w
    assert sorted((r["doc_id"], r["est_weight"]) for r in out) == [
        (1, 10.0),
        (2, 20.0),
    ]


def test_priority_sample_estimator_is_unbiased_over_seeds(spark):
    from sparkdiff.operators.sampling import priority_sample

    rows = [(i, 1 + (i % 13)) for i in range(300)]
    total = sum(w for _, w in rows)
    df = spark.createDataFrame(rows, "doc_id long, w long")
    ests = []
    for s in range(12):
        out = priority_sample(df, "doc_id", "w", k=40, seed=f"e{s}")
        est = out.groupBy().agg(F.sum("est_weight").alias("e")).first()["e"]
        ests.append(est)
    mean = sum(ests) / len(ests)
    # unbiased subset-sum estimator: mean over seeds within 15% of truth
    assert abs(mean - total) / total < 0.15


def test_priority_sample_heavy_items_always_kept(spark):
    from sparkdiff.operators.sampling import priority_sample

    # one row with weight >> rest: its priority >= w exceeds any tau
    # whenever tau <= w, i.e. the certainty-inclusion property
    rows = [(0, 10**6)] + [(i, 1) for i in range(1, 400)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    for s in ("a", "b", "c"):
        kept = {
            r["doc_id"]
            for r in priority_sample(df, "doc_id", "w", 20, seed=s).collect()
        }
        assert 0 in kept, s


def test_priority_sample_validation(spark):
    import pytest

    from sparkdiff.operators.sampling import priority_sample

    df = spark.createDataFrame([(1, 1)], "doc_id long, w long")
    with pytest.raises(ValueError):
        priority_sample(df, "doc_id", "w", k=0)


def test_priority_sample_rejects_fractional_weights(spark):
    """Fractional weights must raise, not silently truncate (a 0.5
    weight floored to 0 would silently drop the row from the sample)."""
    import pytest
    from pyspark.sql.utils import PythonException

    from sparkdiff.operators.sampling import priority_sample

    df = spark.createDataFrame(
        [(1, 2.0), (2, 0.5), (3, 3.0)], "doc_id long, w double"
    )
    with pytest.raises(Exception) as exc:
        priority_sample(df, "doc_id", "w", k=2).collect()
    assert "integral" in str(exc.value)


def test_priority_sample_integral_doubles_match_longs(spark):
    """Integral-VALUED double weights are legal and sample identically
    to the same weights stored as longs; NULL weights are excluded like
    non-positive ones."""
    from sparkdiff.operators.sampling import priority_sample

    rows = [(i, float(1 + i % 7)) for i in range(100)]
    as_dbl = spark.createDataFrame(rows, "doc_id long, w double")
    as_long = spark.createDataFrame(
        [(i, int(w)) for i, w in rows], "doc_id long, w long"
    )
    a = sorted(
        r["doc_id"] for r in priority_sample(as_dbl, "doc_id", "w", k=20).collect()
    )
    b = sorted(
        r["doc_id"] for r in priority_sample(as_long, "doc_id", "w", k=20).collect()
    )
    assert a == b and len(a) == 20
    with_null = spark.createDataFrame(
        [(1, 5.0), (2, None), (3, 4.0)], "doc_id long, w double"
    )
    got = sorted(
        r["doc_id"]
        for r in priority_sample(with_null, "doc_id", "w", k=3).collect()
    )
    assert got == [1, 3]


def test_leakage_safe_split_no_family_straddles_boundary(spark):
    """The operator's whole contract: for EVERY verified near-dup pair,
    both ends land in the same split; transitively-linked chains (A~B~C
    with A!~C) also stay together, because the key is the connected
    component, not the pair.  A plain doc_id hash_split on the same
    corpus demonstrably leaks (sanity check that the test data could
    catch a violation at all)."""
    from sparkdiff.operators.dedup import near_dup_pairs
    from sparkdiff.operators.sampling import hash_split, leakage_safe_split

    d = load_table(spark, SF_DIR_SMALL, "documents").select("doc_id", "text")
    dups = (
        d.filter(F.col("doc_id") % 25 == 0)
        .withColumn("doc_id", F.col("doc_id") + 20_000)
        .withColumn("text", F.concat(F.col("text"), F.lit(" extra suffix words")))
    )
    corpus = d.unionByName(dups)
    w = {"train": 0.75, "val": 0.125, "test": 0.125}
    out = leakage_safe_split(
        corpus, "doc_id", "text", w, threshold=0.6, seed="t"
    ).persist()
    split_of = {r.doc_id: r.split for r in out.collect()}
    fam_of = {r.doc_id: r.family for r in out.collect()}
    out.unpersist()
    pairs = [
        (r.id_a, r.id_b)
        for r in near_dup_pairs(corpus, "doc_id", "text", 0.6).collect()
    ]
    assert len(pairs) > 20  # the injected dups must actually pair up
    for a, b in pairs:
        assert fam_of[a] == fam_of[b], f"pair ({a},{b}) split across families"
        assert split_of[a] == split_of[b], f"pair ({a},{b}) leaked across splits"
    # sanity: the naive doc-keyed split WOULD leak on this corpus
    naive = {
        r.doc_id: r.split
        for r in hash_split(corpus, "doc_id", w, seed="t").collect()
    }
    assert any(naive[a] != naive[b] for a, b in pairs), (
        "test corpus cannot demonstrate leakage — strengthen the fixture"
    )
    # all three splits are populated (weights are far from degenerate)
    assert {s for s in split_of.values()} == {"train", "val", "test"}


def test_internal_temp_columns_raise_on_collision(spark):
    """The bloom_probe '_k' bug class (ADVICE r6), pinned across every
    operator that decorates a CALLER frame with underscore temporaries
    and drops them: a caller column of the same name must raise loudly,
    never be silently overwritten and deleted."""
    from sparkdiff.operators.asof import range_join_bucketed
    from sparkdiff.operators.packing import pack_concat_chunks
    from sparkdiff.operators.sampling import (
        leakage_safe_split,
        priority_sample,
        shuffle_shards,
        stratified_sample,
        systematic_weighted_sample,
    )

    base = spark.createDataFrame(
        [(1, "s", 5, "x")], "doc_id long, source string, w long, _h string"
    )
    with pytest.raises(ValueError, match="_h"):
        shuffle_shards(base, "doc_id", 4)
    with pytest.raises(ValueError, match="_h"):
        stratified_sample(base, ["source"], "doc_id", 1)
    with pytest.raises(ValueError, match="_u"):
        systematic_weighted_sample(
            base.withColumnRenamed("_h", "_u"), "doc_id", "w", 2
        )
    with pytest.raises(ValueError, match="_rn"):
        priority_sample(base.withColumnRenamed("_h", "_rn"), "doc_id", "w", 2)
    with pytest.raises(ValueError, match="family"):
        leakage_safe_split(
            base.withColumnRenamed("_h", "family"),
            "doc_id", "source", {"a": 0.5, "b": 0.5},
        )
    with pytest.raises(ValueError, match="_tok"):
        pack_concat_chunks(
            base.withColumnRenamed("_h", "_tok"), "doc_id", "w", 16
        )
    ts = spark.createDataFrame(
        [(1, 0, "a")], "k long, ts long, _bucket string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    with pytest.raises(ValueError, match="_bucket"):
        range_join_bucketed(
            ts, ts.drop("_bucket"), "k", "ts", "ts", -1000, 1000
        )


def test_min_hash_row_sample_deterministic_and_mergeable(spark):
    """Layout-independence (same sample at any partitioning), the
    KMV merge property (shard samples re-sample to the global sample),
    and under-full passthrough."""
    from sparkdiff.operators.sampling import min_hash_row_sample

    rows = [(i, f"p{i}") for i in range(200)]
    df = spark.createDataFrame(rows, "id int, payload string")
    k = 16
    want = sorted(
        (r.id, r.payload)
        for r in min_hash_row_sample(df, ["id"], k, salt="ms").collect()
    )
    # layout-independent
    got2 = sorted(
        (r.id, r.payload)
        for r in min_hash_row_sample(
            df.repartition(7, "payload"), ["id"], k, salt="ms"
        ).collect()
    )
    assert got2 == want
    # mergeable: sample each half, union, re-sample
    a = min_hash_row_sample(df.filter("id % 2 = 0"), ["id"], k, salt="ms")
    b = min_hash_row_sample(df.filter("id % 2 = 1"), ["id"], k, salt="ms")
    merged = sorted(
        (r.id, r.payload)
        for r in min_hash_row_sample(a.unionByName(b), ["id"], k, salt="ms").collect()
    )
    assert merged == want
    # under-full: everything comes back
    small = df.filter("id < 5")
    assert min_hash_row_sample(small, ["id"], k, salt="ms").count() == 5
