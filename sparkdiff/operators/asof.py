"""As-of join — an operator the reference lacks (SURVEY §2.3 MISSING)
and Spark has no native form for.

Implemented as the union+window composition (preference order (a) from
the build guidance: compose built-in ops before reaching for
``applyInPandas``):

1. tag left (probe) rows and right (reference) rows, union them on the
   shared (key, ts) spine;
2. one window per key ordered by (ts, tag): ``last(right_value,
   ignorenulls)`` over ``rowsBetween(unboundedPreceding, 0)`` carries
   the most recent right row forward;
3. keep probe rows.

One shuffle on the key — the same cost as a plain equi-join — versus
``merge_asof`` per group in pandas (Arrow round-trip + python).  Ties
(equal ts) match the right row (tag order sorts right rows first).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    value_cols: list[str],
) -> DataFrame:
    """For each left row: the latest right row with ``right.ts <=
    left.ts`` for the same key.  Output = left columns + ``value_cols``
    (NULL when no prior right row exists)."""
    l_tag = left.select(
        F.col(key).alias("_k"),
        F.col(ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        F.struct(*left.columns).alias("_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_v_{c}") for c in value_cols],
    )
    r_tag = right.select(
        F.col(key).alias("_k"),
        F.col(ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        F.lit(None).cast(
            l_tag.schema["_left"].dataType
        ).alias("_left"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
    )
    spine = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_tag")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = spine.select(
        "_tag",
        "_left",
        *[
            F.last(f"_v_{c}", ignorenulls=True).over(w).alias(f"_vc_{c}")
            for c in value_cols
        ],
    )
    probe = carried.filter(F.col("_tag") == 1)
    return probe.select(
        *[F.col(f"_left.{c}").alias(c) for c in left.columns],
        *[F.col(f"_vc_{c}").alias(c) for c in value_cols],
    )


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower_ms: int,
    upper_ms: int,
    bucket_ms: int | None = None,
) -> DataFrame:
    """Interval join: pairs where ``right_ts`` falls in
    ``[left_ts + lower_ms, left_ts + upper_ms]`` (inclusive) for the same
    key — expressed as a bucket EQUI-join plus an exact refine, never a
    range-condition join (which Spark plans as a nested loop: every row
    pair evaluated; the same O(n²) trap the n-gram dedup's block join
    avoids).

    Each right row lands in one time bucket; each left row explodes to
    the few buckets its window can overlap (``span/bucket_ms + 1``
    values, 2 at the default bucket width = window span).  The join is
    then ``(key, bucket)`` equality — shuffle-partitionable, AQE-
    plannable, skew-splittable — and the exact range predicate runs on
    candidates only.  Each matching pair joins exactly once because a
    right row has exactly one bucket.
    """
    if upper_ms < lower_ms:
        raise ValueError(f"upper_ms {upper_ms} < lower_ms {lower_ms}")
    if bucket_ms is None:
        bucket_ms = max(upper_ms - lower_ms, 1)
    if bucket_ms <= 0:
        raise ValueError(f"bucket_ms must be positive, got {bucket_ms}")
    lms = F.unix_millis(F.col(left_ts))
    rms = F.unix_millis(F.col(right_ts))
    l_buckets = F.sequence(
        F.floor((lms + F.lit(lower_ms)) / F.lit(bucket_ms)),
        F.floor((lms + F.lit(upper_ms)) / F.lit(bucket_ms)),
    )
    from sparkdiff.operators._util import reserve_columns

    reserve_columns(left, ("_lms", "_bucket"), "range_join")
    reserve_columns(right, ("_rms", "_bucket"), "range_join")
    l = left.withColumn("_lms", lms).withColumn(
        "_bucket", F.explode(l_buckets)
    )
    r = right.withColumn("_rms", rms).withColumn(
        "_bucket", F.floor(rms / F.lit(bucket_ms))
    )
    joined = l.join(r, on=[key, "_bucket"], how="inner").filter(
        (F.col("_rms") >= F.col("_lms") + F.lit(lower_ms))
        & (F.col("_rms") <= F.col("_lms") + F.lit(upper_ms))
    )
    return joined.drop("_bucket", "_lms", "_rms")
