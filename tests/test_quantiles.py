"""Grouped-quantile methods: the distribution method must reproduce
``F.percentile`` bit-for-bit, the sketch must land within its rank-error
bound, and the registered q50 must not buffer whole groups."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkdiff.operators.quantiles import grouped_quantiles
from sparkdiff.queries import q50_quantiles
from sparkdiff.session import load_table

from .conftest import SF_DIR_ORACLE

SPECS = [
    ("p50_qty", "l_quantity", 0.5),
    ("p90_qty", "l_quantity", 0.9),
    ("p25_price", "l_extendedprice", 0.25),
]


def _rows(df):
    return sorted(df.collect(), key=lambda r: r[0])


def test_dist_equals_exact_bitwise(spark):
    l = load_table(spark, SF_DIR_ORACLE, "lineitem")
    dist = _rows(grouped_quantiles(l, ["l_returnflag"], SPECS, method="dist"))
    exact = _rows(grouped_quantiles(l, ["l_returnflag"], SPECS, method="exact"))
    assert dist == exact  # identical doubles, not just close


def test_dist_count_col_equals_raw_rows_bitwise(spark):
    """The round-9 pre-aggregated input mode (``count_col``): feeding
    the rail one row per (keys, value) with its row count must produce
    the SAME doubles as feeding it the raw rows — the mode exists so a
    caller (q109) can share one distinct-value table between the rail
    and other consumers."""
    l = load_table(spark, SF_DIR_ORACLE, "lineitem")
    raw = _rows(
        grouped_quantiles(
            l,
            ["l_returnflag"],
            [("p50", "l_quantity", 0.5), ("p90", "l_quantity", 0.9)],
        )
    )
    vc = l.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    pre = _rows(
        grouped_quantiles(
            vc,
            ["l_returnflag"],
            [("p50", "l_quantity", 0.5), ("p90", "l_quantity", 0.9)],
            count_col="c",
        )
    )
    spark.catalog.clearCache()
    assert raw == pre  # identical doubles AND identical n


def test_dist_handles_nulls_and_tiny_groups(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("a", 3.0), ("b", 7.0)], "g string, v double"
    )
    specs = [("p50", "v", 0.5), ("p99", "v", 0.99)]
    dist = _rows(grouped_quantiles(df, ["g"], specs, method="dist"))
    exact = _rows(grouped_quantiles(df, ["g"], specs, method="exact"))
    # n differs by convention (exact counts all rows, dist counts the
    # non-null distribution) — compare the percentile values themselves
    assert [r[:3] for r in dist] == [r[:3] for r in exact]
    assert dist[0]["p50"] == 2.0  # interpolated between 1 and 3
    assert dist[1]["p50"] == 7.0  # single-value group


def test_approx_within_rank_error(spark):
    l = load_table(spark, SF_DIR_ORACLE, "lineitem")
    exact = {
        r["l_returnflag"]: r
        for r in grouped_quantiles(
            l, ["l_returnflag"], SPECS, method="exact"
        ).collect()
    }
    approx = grouped_quantiles(
        l, ["l_returnflag"], SPECS, method="approx", accuracy=10_000
    ).collect()
    for r in approx:
        e = exact[r["l_returnflag"]]
        assert abs(r["p50_qty"] - e["p50_qty"]) <= 1.0
        assert abs(r["p25_price"] - e["p25_price"]) / e["p25_price"] < 0.01


def test_q50_plan_has_no_buffering_percentile(spark):
    """The registered query must use the distribution method: no
    `percentile(` aggregate (whose buffer holds every group value) may
    appear in the physical plan."""
    df = q50_quantiles(spark, SF_DIR_ORACLE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "percentile" not in plan.lower()


def test_q50_single_scan(spark):
    """All value columns are melted through one posexplode, so the whole
    query reads lineitem exactly once.  Since round 9 the rail persists
    the distinct-value table (the range-boundary sampler would otherwise
    execute the scan→melt→groupBy chain a second time), so the one
    FileScan lives inside the cached InMemoryRelation and every
    consumer — the boundary sampler, the range shuffle, and the rail's
    fan-out — reads the cache: exactly one FileScan anywhere in the
    post-execution plan text, and at least one InMemoryTableScan
    consuming it."""
    spark.catalog.clearCache()
    df = q50_quantiles(spark, SF_DIR_ORACLE)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.lower().count("filescan parquet") == 1
    assert "InMemoryTableScan" in final
    spark.catalog.clearCache()


def test_scalable_row_number_matches_global_window(spark):
    """The range-partitioned rank rail must reproduce Window.orderBy's
    row_number exactly, for any input partitioning (boundary placement
    must not matter because the sort key is a total order)."""
    from pyspark.sql import Window

    from sparkdiff.operators.quantiles import scalable_row_number

    df = spark.range(0, 5003).select(
        (F.col("id") * 2654435761 % 997).alias("v"),
        F.col("id").alias("k"),
    )
    order = [F.desc("v"), F.asc("k")]
    want = {
        (r.v, r.k): r.rn
        for r in df.withColumn(
            "rn", F.row_number().over(Window.orderBy(*order)).cast("long")
        ).collect()
    }
    got = {
        (r.v, r.k): r.rn
        for r in scalable_row_number(df, order, "rn").collect()
    }
    assert got == want
    got7 = {
        (r.v, r.k): r.rn
        for r in scalable_row_number(df.repartition(7), order, "rn").collect()
    }
    assert got7 == want
    # ranks are a permutation of 1..n
    assert sorted(got.values()) == list(range(1, 5004))


def test_scalable_row_number_empty_and_single(spark):
    from sparkdiff.operators.quantiles import scalable_row_number

    df = spark.range(0, 5).select(F.col("id").alias("v"))
    assert scalable_row_number(df.filter("v < 0"), [F.asc("v")]).count() == 0
    one = scalable_row_number(df.filter("v = 3"), [F.asc("v")]).collect()
    assert [(r.v, r.rn) for r in one] == [(3, 1)]
