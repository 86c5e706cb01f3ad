"""Partition-invariance property: results must be bit-identical under
different parallelism — the property every determinism claim in the
repo (dyadic-integer float rails, fixed-order folds, total-order
windows) ultimately promises.

A result that changes when ``spark.sql.shuffle.partitions`` changes or
when the input arrives pre-shuffled would silently diverge between a
laptop and a 1000-executor cluster; these tests run the float-sensitive
queries both ways and demand equality.
"""

from __future__ import annotations

import pytest

from sparkdiff.queries import QUERIES
from sparkdiff.session import load_table

from .conftest import SF_DIR_SMALL

#: The queries whose determinism rests on a design choice (not just on
#: integer arithmetic): money-cents sums, dyadic centroid sums, ordered
#: double folds, RANGE-frame long sums, md5 variates.
SENSITIVE = [
    "q01_pricing_summary",
    "q70_label_centroids",
    "q73_token_budget_sample",
    "q75_kmeans_embed",
    "q76_bm25_rank",
    "q78_rolling_events",
    "q103_mad_outliers",
    # range-partition prefix-sum rail: bucket boundaries move with the
    # partition count, the ranks/draws must not
    "q117_revenue_concentration",
    "q135_pps_sample",
]


def _rows(df):
    return sorted(tuple(map(repr, r)) for r in df.collect())


@pytest.mark.parametrize("name", SENSITIVE)
def test_result_invariant_under_shuffle_partition_count(spark, name):
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        low = _rows(QUERIES[name](spark, SF_DIR_SMALL))
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        high = _rows(QUERIES[name](spark, SF_DIR_SMALL))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    assert low == high, f"{name} changed with shuffle partition count"


def test_centroids_invariant_under_input_repartition(spark):
    """q70's dyadic-sum rail specifically: a skewed single-partition
    input and a 16-way scattered input must agree to the last bit."""
    from pyspark.sql import functions as F

    e = load_table(spark, SF_DIR_SMALL, "embeddings")

    def centroids(df):
        scale = F.lit(8589934592)
        ex = df.select("label", F.posexplode("embedding").alias("d", "v"))
        return sorted(
            map(
                repr,
                ex.groupBy("label", "d")
                .agg(
                    (
                        F.sum(F.floor(F.col("v").cast("double") * scale))
                    ).alias("s")
                )
                .collect(),
            )
        )

    assert centroids(e.coalesce(1)) == centroids(
        e.repartition(16, "vec_id")
    )
