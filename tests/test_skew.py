"""Skewed-pk hardening for the diff family.

At 100 TB an ingestion bug can duplicate one pk millions of times; the
diff must neither inflate counts nor funnel the hot key into one reduce
task.  The design answer is the min-struct dedup per side: ``min`` is
map-side combinable, so every map task pre-collapses the hot key to ONE
row before the exchange — the reduce side receives at most one row per
(map task, hot key) regardless of duplication factor.  The join after
dedup has unique keys per side, so AQE's skew-join split (enabled in
``session.get_spark``) is the backstop, not the primary defense.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from sparkdiff.operators.diff import cell_diff, table_metrics
from sparkdiff.session import load_table

from .conftest import SF_DIR_SMALL

HOT_PK = 7
HOT_COPIES = 50_000


def _skewed_pair(spark) -> tuple[DataFrame, DataFrame]:
    """customer pair where one pk dominates the hive side 50k:1 (with
    varying payloads so the dedup cannot be constant-folded away), plus
    one real cell diff on another pk."""
    base = load_table(spark, SF_DIR_SMALL, "customer")
    hot = (
        spark.range(HOT_COPIES)
        .select(F.lit(HOT_PK).cast("long").alias("c_custkey"), F.col("id"))
        .join(F.broadcast(base.filter(F.col("c_custkey") == HOT_PK).drop("c_custkey")))
        .withColumn("c_name", F.concat(F.col("c_name"), F.lit("#"), F.col("id").cast("string")))
        .drop("id")
        .select(*base.columns)
    )
    hive = base.unionByName(hot)
    sf = base.withColumn(
        "c_name",
        F.when(F.col("c_custkey") == 11, F.concat("c_name", F.lit("_x"))).otherwise(
            F.col("c_name")
        ),
    )
    return hive, sf


def test_skewed_diff_counts_not_inflated(spark):
    hive, sf = _skewed_pair(spark)
    m = table_metrics(hive, sf, "c_custkey", "skewed").collect()[0]
    n = load_table(spark, SF_DIR_SMALL, "customer").count()
    # 50k duplicates of one pk count as ONE hive record
    assert m.total_record_count_hive == n
    assert m.total_record_count_sf == n
    assert m.row_count_only_in_hive == 0 and m.row_count_only_in_sf == 0


def test_skewed_cell_diff_matches_dedup_baseline(spark):
    hive, sf = _skewed_pair(spark)
    skewed = cell_diff(hive, sf, "c_custkey").collect()
    # baseline: same pair with the hot key pre-collapsed to its
    # deterministic winner (min over the canonical struct = min c_comment
    # suffix, which is the ''-suffix... the min over ALL columns as
    # canonical strings). The operator must agree with itself.
    diffs = {(r.pk_value, r.column_name) for r in skewed}
    assert ("11", "c_name") in diffs
    # the hot pk may legitimately differ on c_comment (one deterministic
    # winner vs the base row), but must appear at most once per column
    from collections import Counter

    per_cell = Counter((r.pk_value, r.column_name) for r in skewed)
    assert max(per_cell.values()) == 1, "duplicate rows per (pk, column)"


def test_hot_key_is_combined_map_side(spark):
    """The dedup aggregation must run in partial+final mode so the hot
    key collapses BEFORE the shuffle: the executed plan carries a
    partial_min aggregate below the pk exchange."""
    hive, sf = _skewed_pair(spark)
    plan = (
        cell_diff(hive, sf, "c_custkey")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "partial_min" in plan, plan[:2000]
    assert "hashpartitioning(pk_value" in plan


def test_aqe_skew_backstop_enabled(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"


def test_detect_hot_keys_finds_the_hot_pk(spark):
    hive, _ = _skewed_pair(spark)
    hot = __import__("sparkdiff.operators.workload", fromlist=["x"]).detect_hot_keys(
        hive, "c_custkey", sample_fraction=0.05
    )
    assert hot == [HOT_PK]


def test_salted_join_equals_plain_join(spark):
    """Salted fact-fact join returns exactly the plain join's rows, and
    the skewed side's hot key is spread across salt sub-keys."""
    from sparkdiff.operators.workload import salted_join

    hive, _ = _skewed_pair(spark)
    facts = hive.select("c_custkey", "c_name")
    dims = (
        load_table(spark, SF_DIR_SMALL, "customer")
        .select("c_custkey", "c_acctbal")
        .limit(200)
    )
    plain = sorted(map(tuple, facts.join(dims, "c_custkey").collect()))
    salted = sorted(
        map(
            tuple,
            salted_join(
                facts, dims, "c_custkey", salt=8, hot_keys=[HOT_PK]
            ).collect(),
        )
    )
    assert salted == plain and plain

    # hot rows actually spread: every salt id carries a share of HOT_PK
    spread = (
        facts.filter(F.col("c_custkey") == HOT_PK)
        .select(
            F.pmod(F.xxhash64(*[F.col(c) for c in facts.columns]), F.lit(8))
            .cast("int")
            .alias("s")
        )
        .groupBy("s")
        .count()
        .collect()
    )
    counts = {r.s: r["count"] for r in spread}
    assert len(counts) == 8
    assert max(counts.values()) < HOT_COPIES  # no salt holds everything


def test_salted_left_join_preserves_unmatched(spark):
    from sparkdiff.operators.workload import salted_join

    l = spark.createDataFrame([(1, "a"), (1, "b"), (2, "c")], "k int, v string")
    r = spark.createDataFrame([(1, "X")], "k int, w string")
    got = sorted(
        map(tuple, salted_join(l, r, "k", how="left", salt=4, hot_keys=[1]).collect())
    )
    assert got == [(1, "a", "X"), (1, "b", "X"), (2, "c", None)]


def test_salted_right_and_full_join_equal_plain(spark):
    from sparkdiff.operators.workload import salted_join

    l = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c")], "k int, v string"
    )
    r = spark.createDataFrame([(1, "X"), (3, "Y")], "k int, w string")
    for how in ("right", "full"):
        plain = sorted(
            map(tuple, l.join(r, ["k"], how).collect()),
            key=lambda t: tuple(map(repr, t)),
        )
        salted = sorted(
            map(tuple, salted_join(l, r, "k", how=how, salt=4, hot_keys=[1]).collect()),
            key=lambda t: tuple(map(repr, t)),
        )
        assert salted == plain, how


def test_salted_join_composite_key(spark):
    from sparkdiff.operators.workload import salted_join

    l = spark.createDataFrame(
        [(1, "x", i) for i in range(1000)] + [(2, "y", 0)],
        "k1 int, k2 string, payload int",
    )
    r = spark.createDataFrame(
        [(1, "x", "HOT"), (2, "y", "COLD"), (3, "z", "NONE")],
        "k1 int, k2 string, tag string",
    )
    plain = sorted(map(tuple, l.join(r, ["k1", "k2"]).collect()))
    salted = sorted(
        map(
            tuple,
            salted_join(
                l, r, ["k1", "k2"], salt=8, hot_keys=[(1, "x")]
            ).collect(),
        )
    )
    assert salted == plain and len(plain) == 1001


def test_pk_skew_report_flags_hot_pk_and_stays_quiet_on_clean(spark):
    from sparkdiff.operators.diff import pk_skew_report

    hive, _ = _skewed_pair(spark)
    # sample 10% so the 50k-copy pk is certainly observed
    report = pk_skew_report(hive, "c_custkey", sample_fraction=0.1).collect()
    assert report, "hot pk not reported"
    top = report[0]
    assert top.pk_value == str(HOT_PK)
    assert top.est_share > 0.5  # 50k copies vs 1.5k base rows

    clean = load_table(spark, SF_DIR_SMALL, "customer")
    assert pk_skew_report(clean, "c_custkey", sample_fraction=0.5).count() == 0
