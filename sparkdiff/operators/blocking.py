"""Sorted-neighborhood blocking (Hernandez & Stolfo 1995, SIGMOD —
the merge/purge method): the classic entity-resolution candidate
generator.  Sort the corpus by a blocking key and compare each record
only to its ``window`` successors in sort order — candidates are
LINEAR in corpus size (n x window), versus LSH's hash-bucket fan-out
and miles from the quadratic cross product.

Spark-first shape, engineered around the two usual cliffs:

* the global sort does NOT use ``Window.orderBy`` without a partition
  (an ``Exchange SinglePartition`` — the warehouse-scale cliff); ranks
  come from the repo's range-partitioned prefix-sum rail
  (``operators/quantiles.scalable_row_number``),
* the neighborhood pairing is NOT a range join; each record explodes
  into ``window`` (rank + k) probes and pairs via a plain EQUI-join on
  the integer rank — shuffle on a dense unique key, AQE-friendly.

Recall is windowed by design (a true dup whose keys sort > window
apart is missed) — the standard trade documented with the method; use
multiple passes with independent keys, or the MinHash family
(operators/dedup.py), when unkeyed recall matters more than cost.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sparkdiff.operators.quantiles import scalable_row_number


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    key: Column,
    payload_col: str,
    window: int = 4,
) -> DataFrame:
    """Candidate pairs ``(id_a, id_b, <payload>_a, <payload>_b)`` for
    every record and its ``window`` successors in ``(key, id)`` sort
    order.  The (key, id) order is total, so ranks — and therefore the
    produced pair set — are deterministic.  Verification (string
    similarity, field compare, ...) is the caller's: this operator is
    pure candidate generation."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    base = df.select(
        F.col(id_col).alias("_snm_id"),
        key.alias("_snm_key"),
        F.col(payload_col).alias("_snm_p"),
    )
    # persisted: BOTH pairing sides (probe fan-out and rank-keyed right
    # side) consume the ranked table — unpersisted, each side re-runs
    # the whole key-normalization + range-rank rail over the corpus
    # (round 9; guide §5).  One row per input record; released by the
    # session owner's clearCache (PERSISTS_BY_DESIGN convention).
    ranked = scalable_row_number(
        base, [F.col("_snm_key"), F.col("_snm_id")], out_col="_snm_rn"
    ).persist()
    probes = ranked.select(
        F.col("_snm_id").alias("id_a"),
        F.col("_snm_p").alias(f"{payload_col}_a"),
        F.col("_snm_rn"),
        F.explode(F.sequence(F.lit(1), F.lit(window))).alias("_snm_k"),
    ).select(
        "id_a",
        f"{payload_col}_a",
        (F.col("_snm_rn") + F.col("_snm_k")).alias("_snm_rn_b"),
    )
    right = ranked.select(
        F.col("_snm_id").alias("id_b"),
        F.col("_snm_p").alias(f"{payload_col}_b"),
        F.col("_snm_rn").alias("_snm_rn_b"),
    )
    return probes.join(right, "_snm_rn_b").select(
        "id_a", "id_b", f"{payload_col}_a", f"{payload_col}_b"
    )
