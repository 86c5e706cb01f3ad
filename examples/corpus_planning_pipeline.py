"""Corpus-planning pipeline: the sizing questions a curation team
answers BEFORE committing a new source to the 100 TB mix, each from
constant-or-bounded state:

1. expectation gate (q168 machinery) — is the incoming table even
   well-formed?  One aggregation pass, #checks rows.
2. cross-source overlap (q164 machinery) — how much of the candidate
   source's vocabulary do we already have?  KMV samples: k longs per
   source, pairwise union/intersection estimates.
3. ingest-novelty burn-down (q170 machinery) — is the source still
   producing new content batch over batch, or has it gone stale?

Run: ``python examples/corpus_planning_pipeline.py [sf_dir]``
(defaults to /root/testdata/sf0.001; prints the three reports).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sparkdiff.operators.dedup import _shingle_sets
from sparkdiff.operators.expectations import (
    expectation_report,
    in_range,
    not_null,
    unique,
)
from sparkdiff.operators.sketch import kmv_estimate, kmv_pair_overlap, kmv_sketch
from sparkdiff.session import get_spark, load_table


def main(sf_dir: str = "/root/testdata/sf0.001") -> dict:
    spark = get_spark("corpus-planning")
    d = load_table(spark, sf_dir, "documents")

    # 1. gate: malformed rows would poison every estimate downstream
    gate = expectation_report(
        d,
        [
            not_null("doc_id"),
            not_null("text"),
            in_range("n_chars", 1, 1_000_000),
            unique(["doc_id"]),
        ],
    )
    gate_rows = gate.collect()
    print("== expectation gate ==")
    for r in gate_rows:
        print(f"  {r.check:40s} violations={r.n_violations} ok={r.ok}")

    # 2. overlap planning: per-source KMV samples over 3-word shingles,
    # NDV per source + pairwise union/intersection/jaccard estimates
    sh = _shingle_sets(d, "source", "text", 3)
    occ = sh.select(F.col("_id").alias("source"), F.explode("_sh").alias("t"))
    sample = kmv_sketch(occ, "t", keys=["source"], k=128, salt="plan")
    ndv = kmv_estimate(sample, keys=["source"], k=128)
    overlap = kmv_pair_overlap(sample, "source", k=128)
    top = overlap.orderBy(F.col("jaccard_pm").desc(), "key_a", "key_b").limit(5)
    print("== per-source vocabulary (KMV NDV estimate) ==")
    for r in ndv.orderBy("source").collect()[:5]:
        print(f"  {r.source}: ~{r.kmv_ndv} shingles")
    print("== most-overlapping source pairs ==")
    top_rows = top.collect()
    for r in top_rows:
        print(
            f"  {r.key_a} ~ {r.key_b}: union~{r.kmv_union} "
            f"inter~{r.kmv_inter} jaccard={r.jaccard_pm}pm"
        )

    # 3. novelty burn-down: is the source still producing new content?
    occ_b = (
        _shingle_sets(d, "doc_id", "text", 3)
        .select(
            F.expr("_id DIV 100").cast("long").alias("batch"),
            F.explode("_sh").alias("t"),
        )
        .distinct()
    )
    novel = (
        occ_b.groupBy("t")
        .agg(F.min("batch").alias("batch"))
        .groupBy("batch")
        .agg(F.count(F.lit(1)).alias("n_novel"))
    )
    sizes = occ_b.groupBy("batch").agg(F.count(F.lit(1)).alias("n_shingles"))
    curve = (
        sizes.join(novel, "batch", "left")
        .select(
            "batch",
            F.expr(
                "coalesce(n_novel, 0) * 1000 DIV n_shingles"
            ).alias("novelty_pm"),
        )
        .orderBy("batch")
        .collect()
    )
    print("== novelty burn-down ==")
    for r in curve:
        print(f"  batch {r.batch}: {r.novelty_pm}pm novel")

    return {
        "gate_ok": all(r.ok for r in gate_rows if r.check != "unique(doc_id)"),
        "n_pairs": overlap.count(),
        "curve": [(r.batch, r.novelty_pm) for r in curve],
    }


if __name__ == "__main__":
    main(*sys.argv[1:])
