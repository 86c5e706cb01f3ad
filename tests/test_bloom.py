"""Bloom gate: zero false negatives, sane fpp, compact == join probe."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sparkdiff.operators.bloom import (
    bloom_build,
    bloom_probe,
    bloom_probe_compact,
    bloom_size,
)

M, H, SEED = 4096, 4, "t"


def _keys(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id").alias("k"))


def test_no_false_negatives(spark):
    corpus = _keys(spark, 0, 300)
    filt = bloom_build(corpus, "k", M, H, SEED)
    probed = bloom_probe(corpus, "k", filt, M, H, SEED)
    assert probed.filter(~F.col("maybe_seen")).count() == 0


def test_false_positive_rate_is_designed(spark):
    n = 300
    corpus = _keys(spark, 0, n)
    filt = bloom_build(corpus, "k", M, H, SEED)
    novel = _keys(spark, 10_000, 12_000)
    fp = (
        bloom_probe(novel, "k", filt, M, H, SEED)
        .filter(F.col("maybe_seen"))
        .count()
    )
    # theoretical fpp = (1 - e^{-hn/m})^h ~ 0.43% here; allow 5x slack
    p = (1 - math.exp(-H * n / M)) ** H
    assert fp / 2000 < max(5 * p, 0.02)


def test_compact_probe_matches_join_probe(spark):
    corpus = _keys(spark, 0, 250)
    filt = bloom_build(corpus, "k", M, H, SEED)
    words = {r["word_idx"]: r["bits"] for r in filt.collect()}
    batch = _keys(spark, 0, 3000)
    a = {
        r["k"]: r["maybe_seen"]
        for r in bloom_probe(batch, "k", filt, M, H, SEED).collect()
    }
    b = {
        r["k"]: r["maybe_seen"]
        for r in bloom_probe_compact(batch, "k", words, M, H, SEED).collect()
    }
    assert a == b


def test_union_of_builds_is_incremental_append(spark):
    a = bloom_build(_keys(spark, 0, 100), "k", M, H, SEED)
    b = bloom_build(_keys(spark, 100, 200), "k", M, H, SEED)
    merged = (
        a.unionAll(b).groupBy("word_idx").agg(F.bit_or("bits").alias("bits"))
    )
    full = bloom_build(_keys(spark, 0, 200), "k", M, H, SEED)
    got = {(r["word_idx"], r["bits"]) for r in merged.collect()}
    want = {(r["word_idx"], r["bits"]) for r in full.collect()}
    assert got == want


def test_bloom_size_closed_form():
    m, h = bloom_size(1000, 0.01)
    assert m % 64 == 0
    assert abs(m - (-1000 * math.log(0.01) / math.log(2) ** 2)) <= 64
    assert h == round(m / 1000 * math.log(2))
    with pytest.raises(ValueError):
        bloom_size(0, 0.01)
    with pytest.raises(ValueError):
        bloom_size(10, 1.5)


def test_build_validates_geometry(spark):
    with pytest.raises(ValueError):
        bloom_build(_keys(spark, 0, 10), "k", 100, 2, SEED)  # not mult of 64
    with pytest.raises(ValueError):
        bloom_build(_keys(spark, 0, 10), "k", 128, 0, SEED)


def test_high_bit_word63_roundtrip(spark):
    # force keys whose positions include bit 63 of some word: build over
    # many keys so every bit index class is exercised, then probe them
    corpus = _keys(spark, 0, 2000)
    filt = bloom_build(corpus, "k", 1024, 2, SEED)
    # with 2000*2 positions into 1024 bits, words are dense; bit 63 of
    # several words is set and longs go negative — arithmetic shift
    # must still read single bits correctly
    assert filt.filter(F.col("bits") < 0).count() > 0
    probed = bloom_probe(corpus, "k", filt, 1024, 2, SEED)
    assert probed.filter(~F.col("maybe_seen")).count() == 0


def test_null_keys_are_total_over_input_rows(spark):
    """NULL keys: inserted via the sentinel on build, probed to a
    definite true/false — never a silent NULL third bucket."""
    corpus = spark.createDataFrame(
        [(1,), (2,), (None,)], "k int"
    )
    filt = bloom_build(corpus, "k", M, H, SEED)
    probed = {
        r["k"]: r["maybe_seen"]
        for r in bloom_probe(corpus, "k", filt, M, H, SEED).collect()
    }
    assert probed == {1: True, 2: True, None: True}  # zero false negatives
    # a filter built WITHOUT null keys answers definite false (modulo
    # fpp, negligible at this geometry) for the null-keyed probe row
    filt2 = bloom_build(corpus.filter(F.col("k").isNotNull()), "k", M, H, SEED)
    probed2 = {
        r["k"]: r["maybe_seen"]
        for r in bloom_probe(corpus, "k", filt2, M, H, SEED).collect()
    }
    assert probed2[None] is False and probed2[1] is True
    # compact probe agrees on the null row
    words = {r["word_idx"]: r["bits"] for r in filt2.collect()}
    compact = {
        r["k"]: r["maybe_seen"]
        for r in bloom_probe_compact(corpus, "k", words, M, H, SEED).collect()
    }
    assert compact == probed2


def test_bloom_semi_join_is_recall_complete_and_strays_are_fpp(spark):
    """The runtime-filter gate never drops a true match (zero false
    negatives), keeps the fact schema, and at a collision-forcing
    geometry lets only false-POSITIVE strays through — which the
    caller's exact join then removes."""
    from sparkdiff.operators.bloom import bloom_semi_join

    fact = spark.createDataFrame(
        [(i, f"v{i}") for i in range(200)], "k int, payload string"
    )
    dim = spark.createDataFrame([(i,) for i in range(0, 200, 10)], "k int")
    gated = bloom_semi_join(fact, "k", dim, "k", m_bits=1 << 12, n_hashes=4)
    assert gated.columns == fact.columns
    got = {r.k for r in gated.collect()}
    want = set(range(0, 200, 10))
    assert want <= got  # recall-complete
    # tiny filter: 64 bits for 20 keys -> heavy false positives, but
    # still never a false negative; every stray is removed by the join
    tiny = bloom_semi_join(fact, "k", dim, "k", m_bits=64, n_hashes=2)
    tiny_keys = {r.k for r in tiny.collect()}
    assert want <= tiny_keys and len(tiny_keys) > len(want)
    joined = tiny.join(dim.withColumnRenamed("k", "dk"),
                       F.col("k") == F.col("dk")).collect()
    assert {r.k for r in joined} == want
