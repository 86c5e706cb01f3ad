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


# --- Fellegi-Sunter linkage ------------------------------------------------

from sparkdiff.operators.linkage import (  # noqa: E402
    LinkageField,
    fellegi_sunter_score,
    field_u_stats,
)


def test_field_u_stats_exact_counts(spark):
    """u numerators are exact freq^2 sums, NULL counted as a value."""
    df = spark.createDataFrame(
        [("x",), ("x",), ("y",), (None,), (None,), (None,)], "v: string"
    )
    row = field_u_stats(df, ["v"]).collect()[0]
    assert row.n == 6 and row.u_v_num == 4 + 1 + 9


def test_fellegi_sunter_score_and_decisions(spark):
    """Hand-replay: one agreeing and one disagreeing pair against
    Python's float arithmetic, and the threshold split."""
    base = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "c")], "id: long, v: string"
    )
    u = field_u_stats(base, ["v"])
    pairs = spark.createDataFrame(
        [(1, 2, "a", "a"), (1, 3, "a", "b")],
        "id_a: long, id_b: long, v_a: string, v_b: string",
    )
    fields = [
        LinkageField(
            "v", (F.col("v_a") == F.col("v_b")).cast("int"), 0.9, "u_v_num"
        )
    ]
    out = {
        (r.id_a, r.id_b): r
        for r in fellegi_sunter_score(pairs, u, fields, 3.0, 1.0).collect()
    }
    uu = (4 + 1 + 1) / float(16)  # freq^2 sum over {a:2, b:1, c:1}, n=4
    assert out[(1, 2)].score == 0.9 / uu
    assert out[(1, 3)].score == (1.0 - 0.9) / (1.0 - uu)
    # 0.9/0.375 = 2.4 -> possible; disagree ratio 0.16 -> non_match
    assert out[(1, 2)].decision == "possible"
    assert out[(1, 3)].decision == "non_match"
    assert out[(1, 2)].agree_v == 1 and out[(1, 3)].agree_v == 0


def test_fellegi_sunter_fixed_order_is_reproducible(spark):
    """Same fields, same order -> bit-identical score across runs (the
    product is a per-row left fold, no cross-row aggregation)."""
    base = spark.createDataFrame(
        [(i, f"v{i % 7}", i % 3) for i in range(100)],
        "id: long, a: string, b: long",
    )
    u = field_u_stats(base, ["a", "b"])
    pairs = (
        base.alias("x")
        .join(base.alias("y"), F.col("x.id") + 1 == F.col("y.id"))
        .select(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            F.col("x.a").alias("a_a"),
            F.col("y.a").alias("a_b"),
            F.col("x.b").alias("b_a"),
            F.col("y.b").alias("b_b"),
        )
    )
    fields = [
        LinkageField("a", (F.col("a_a") == F.col("a_b")).cast("int"), 0.95, "u_a_num"),
        LinkageField("b", (F.col("b_a") == F.col("b_b")).cast("int"), 0.8, "u_b_num"),
    ]
    s1 = {
        (r.id_a, r.id_b): r.score
        for r in fellegi_sunter_score(pairs, u, fields, 10.0, 1.0).collect()
    }
    s2 = {
        (r.id_a, r.id_b): r.score
        for r in fellegi_sunter_score(
            pairs.repartition(7), u, fields, 10.0, 1.0
        ).collect()
    }
    assert s1 == s2 and len(s1) == 99
