"""FastSS edit-distance join and sorted-neighborhood blocking pins.

The edit-distance join's entire claim is LOSSLESS blocking (deletion-
neighborhood intersection is implied by ed <= d); these tests check it
exhaustively against brute-force levenshtein on a small closed domain,
plus the d=2 path and string edge cases the query's oracle never
exercises.
"""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from sparkdiff.operators.blocking import sorted_neighborhood_pairs
from sparkdiff.operators.editdist import (
    deletion_neighborhood,
    edit_distance_join,
    single_deletions,
)


def _levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _strings_df(spark, strings):
    return spark.createDataFrame(
        [(i, s) for i, s in enumerate(strings)], "sid: long, s: string"
    )


@pytest.mark.parametrize("d", [1, 2])
def test_edit_distance_join_is_exact_on_closed_domain(spark, d):
    """Exhaustive: every string over {a,b,c} of length <= 3 (40
    strings) — the join must equal brute-force levenshtein <= d
    exactly: no false negatives (lossless blocking) AND no false
    positives (verify step)."""
    alpha = "abc"
    strings = [""] + [
        "".join(t)
        for n in (1, 2, 3)
        for t in itertools.product(alpha, repeat=n)
    ]
    expect = {
        (i, j, _levenshtein(a, b))
        for (i, a), (j, b) in itertools.combinations(enumerate(strings), 2)
        if _levenshtein(a, b) <= d
    }
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in edit_distance_join(
            _strings_df(spark, strings), "sid", "s", d=d
        ).collect()
    }
    assert got == expect


def test_deletion_neighborhood_contents(spark):
    df = spark.range(1).select(F.lit("abc").alias("s"))
    row = df.select(
        single_deletions(F.col("s")).alias("d1"),
        deletion_neighborhood(F.col("s"), 2).alias("n2"),
    ).collect()[0]
    assert sorted(row.d1) == ["ab", "ac", "bc"]
    assert set(row.n2) == {"abc", "ab", "ac", "bc", "a", "b", "c"}
    # empty string: no deletions, neighborhood is just itself
    empty = spark.range(1).select(F.lit("").alias("s")).select(
        single_deletions(F.col("s")).alias("d1"),
        deletion_neighborhood(F.col("s"), 1).alias("n1"),
    ).collect()[0]
    assert empty.d1 == [] and empty.n1 == [""]


def test_edit_distance_join_rejects_nothing_on_distant_strings(spark):
    df = _strings_df(spark, ["aaaaaa", "zzzzzz", "qqqqqq"])
    assert edit_distance_join(df, "sid", "s", d=1).count() == 0


def test_sorted_neighborhood_pairs_window_semantics(spark):
    """On a known key order, the pair set is exactly each record with
    its `window` successors — deterministic, rank-adjacent, no self or
    reversed pairs."""
    rows = [(i, f"k{i:02d}", f"p{i}") for i in range(6)]
    df = spark.createDataFrame(rows, "rid: long, k: string, payload: string")
    got = {
        (r.id_a, r.id_b)
        for r in sorted_neighborhood_pairs(
            df, "rid", F.col("k"), "payload", window=2
        ).collect()
    }
    expect = {(i, j) for i in range(6) for j in (i + 1, i + 2) if j < 6}
    assert got == expect


def test_sorted_neighborhood_ties_break_on_id(spark):
    """Equal keys: the (key, id) total order decides adjacency, so the
    result is deterministic run to run."""
    df = spark.createDataFrame(
        [(10, "same", "x"), (3, "same", "y"), (7, "same", "z")],
        "rid: long, k: string, payload: string",
    )
    got = {
        (r.id_a, r.id_b)
        for r in sorted_neighborhood_pairs(
            df, "rid", F.col("k"), "payload", window=1
        ).collect()
    }
    assert got == {(3, 7), (7, 10)}


def test_sorted_neighborhood_rejects_bad_window(spark):
    df = spark.createDataFrame([(1, "a", "p")], "rid: long, k: string, payload: string")
    with pytest.raises(ValueError):
        sorted_neighborhood_pairs(df, "rid", F.col("k"), "payload", window=0)
