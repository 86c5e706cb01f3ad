"""Physical-plan regression guards: the optimizations the engine relies
on (predicate pushdown to parquet, broadcast of small sides, no
nested-loop joins on hot paths) must stay in the plan."""

from __future__ import annotations

import pytest

from sparkdiff.queries import QUERIES

from .conftest import SF_DIR_ORACLE


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_DIR_ORACLE)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q01_filter_pushed_to_parquet(spark):
    plan = _plan(spark, "q01_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_q03_cell_diff_uses_hash_join(spark):
    plan = _plan(spark, "q03_cell_diff")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_q07_dimension_is_broadcast(spark):
    plan = _plan(spark, "q07_expr_join")
    assert "BroadcastHashJoin" in plan


def test_q24_query_side_broadcast_only(spark):
    # the corpus side must stream; only the (tiny) query side broadcasts
    plan = _plan(spark, "q24_cosine_topk")
    assert plan.count("BroadcastExchange") == 1


def test_q26_block_join_not_nested_loop(spark):
    # the sorted-neighborhood dedup must stay an equi-join on the block
    # key (a range-only condition regresses to a nested-loop join whose
    # condition evaluates the Jaccard for every row pair)
    plan = _plan(spark, "q26_ngram_jaccard_dups")
    assert "BroadcastNestedLoopJoin" not in plan


def test_q46_flagship_scans_prune_columns(spark):
    # fingerprint diff must not read pk-irrelevant... it reads all data
    # columns by design, but each parquet scan must appear exactly twice
    # (hive+sf sides derive from one base read each) with no NLJ
    plan = _plan(spark, "q46_lineitem_diff")
    assert "BroadcastNestedLoopJoin" not in plan


@pytest.mark.parametrize(
    "name",
    ["q05_rownum_dedup", "q12_topk_per_group", "q43_window_suite"],
)
def test_window_queries_single_shuffle(spark, name):
    # one partitioning shuffle per window family — no accidental extra
    # exchanges from misaligned partitioning
    plan = _plan(spark, name)
    assert plan.count("Exchange hashpartitioning") <= 2, plan

def test_cell_diff_incremental_fastpath_plan_and_equivalence(spark):
    """unique_sides + broadcast_side must produce a zero-exchange
    broadcast plan (the incremental-batch shape: big side scanned in
    place) AND the same rows as the default path."""
    from sparkdiff import testkit
    from sparkdiff.operators.diff import cell_diff
    from sparkdiff.plans.signature import plan_signature

    hive, sf = testkit.hive_sf_pair(spark, SF_DIR_ORACLE)
    # both sides of this pair are pk-unique, so the fast path is valid
    fast = cell_diff(
        hive,
        sf,
        "c_custkey",
        exclude_cols=testkit.EXCLUDE_COLS,
        unique_sides=("hive", "sf"),
        broadcast_side="hive",
    )
    sig = plan_signature(fast)
    assert sig["joins"].get("BroadcastHashJoin") == 1, sig
    assert sig["shuffles"] == 0, sig

    slow = cell_diff(hive, sf, "c_custkey", exclude_cols=testkit.EXCLUDE_COLS)
    assert sorted(map(tuple, fast.collect())) == sorted(
        map(tuple, slow.collect())
    )


def test_cell_diff_rejects_bad_hints(spark):
    from sparkdiff import testkit
    from sparkdiff.operators.diff import cell_diff

    hive, sf = testkit.hive_sf_pair(spark, SF_DIR_ORACLE)
    with pytest.raises(ValueError):
        cell_diff(hive, sf, "c_custkey", unique_sides=("both",))
    with pytest.raises(ValueError):
        cell_diff(hive, sf, "c_custkey", broadcast_side="left")
