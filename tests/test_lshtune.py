"""Closed-form LSH tuning: model sanity, budget/recall contracts, and a
live round-trip through the SRP near-dup operator."""

import math

import pytest
from pyspark.sql import functions as F

from sparkdiff.operators.lshtune import (
    candidate_prob,
    tune_bands,
    tune_minhash,
    tune_srp,
)
from sparkdiff.session import load_table

from .conftest import SF_DIR_SMALL


def test_candidate_prob_classic_value():
    # MMDS textbook example: s=0.8, 20 bands x 5 rows
    assert candidate_prob(0.8, 20, 5) == pytest.approx(
        1 - (1 - 0.8**5) ** 20, abs=1e-12
    )


def test_candidate_prob_monotone_in_similarity():
    probs = [candidate_prob(s / 20, 16, 4) for s in range(21)]
    assert probs == sorted(probs)
    assert probs[0] == 0.0 and probs[-1] == 1.0


@pytest.mark.parametrize("thr", [0.5, 0.7, 0.9])
@pytest.mark.parametrize("recall", [0.9, 0.99])
def test_tune_minhash_meets_recall_within_budget(thr, recall):
    plan = tune_minhash(thr, recall, max_perm=512)
    assert plan.total_hashes <= 512
    assert plan.recall_at_threshold >= recall
    # selectivity: background pairs must be much less likely than recall
    assert plan.false_candidate_rate < plan.recall_at_threshold


def test_tune_picks_most_selective_plan():
    loose = tune_minhash(0.8, 0.9, max_perm=16)
    tight = tune_minhash(0.8, 0.9, max_perm=512)
    assert tight.false_candidate_rate <= loose.false_candidate_rate


def test_tune_impossible_budget_raises():
    with pytest.raises(ValueError, match="no .* meets recall"):
        tune_bands(0.05, recall=0.999, max_total=4)


def test_tune_srp_probability_model():
    plan = tune_srp(0.99, recall=0.999, max_planes=256)
    p = 1 - math.acos(0.99) / math.pi
    assert candidate_prob(p, plan.bands, plan.rows_per_band) >= 0.999


def test_tuned_srp_drives_near_dup_operator(spark):
    """A tuned plan plugged into embedding_near_dup_pairs recovers an
    exact duplicate — the tuner's output is directly consumable."""
    from sparkdiff.operators.similarity import embedding_near_dup_pairs

    plan = tune_srp(0.99, recall=0.999, max_planes=128)
    e = load_table(spark, SF_DIR_SMALL, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    dup = e.filter(F.col("vec_id") == 5).withColumn(
        "vec_id", F.lit(888_888).cast("long")
    )
    pairs = embedding_near_dup_pairs(
        e.unionByName(dup),
        "vec_id",
        "v",
        threshold=0.99,
        bands=plan.bands,
        rows_per_band=plan.rows_per_band,
    ).collect()
    assert (5, 888_888) in {(r.id_a, r.id_b) for r in pairs}
