"""Auto-k / cell-geometry audit for the similarity family at replica
tiers (round-9 verdict #4): the 100 TB story for semdedup and the ANN
paths is that the per-cell quadratic term stays bounded because cell
POPULATIONS stay O(100) as the corpus grows (auto-k = max(4, n // 100))
and the PQ codebook stays configuration-sized (m x k entries).  This
probe measures those claims directly instead of inferring them from
runtime slopes: for each tier it reports the derived k, the realized
k-means cell-population distribution (mean / p95 / max), and the
within-cell pair count the quadratic stage actually scans.

Run AFTER tools/scaling_probe.py has materialized the replica dir:

    REPLICAS=64 python tools/scaling_probe.py q136_semdedup_auto ...
    REPLICAS=64 python tools/cell_audit.py

Prints one line per (tier, metric); writes nothing outside /tmp.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

REPLICAS = int(os.environ.get("REPLICAS", "64"))
TIERS = [
    ("sf0.01", "/root/testdata/sf0.01"),
    ("sf0.1", "/root/testdata/sf0.1"),
    (f"{REPLICAS}x", f"/tmp/sfprobe_{REPLICAS:02d}"),
]


def main() -> None:
    from sparkdiff.operators.retrieval import (
        kmeans_assign,
        kmeans_assign_hierarchical,
    )
    from sparkdiff.operators.similarity import HIERARCHICAL_K_THRESHOLD
    from sparkdiff.queries import _semdedup_corpus
    from sparkdiff.session import get_spark

    spark = get_spark("cell-audit")
    print("tier, n_vectors, auto_k, cell_mean, cell_p95, cell_max, "
          "within_cell_pairs, pairs_per_vector")
    for label, d in TIERS:
        if not os.path.isdir(d):
            print(f"{label}: replica dir {d} missing — run scaling_probe "
                  "first", file=sys.stderr)
            continue
        corpus = _semdedup_corpus(spark, d).select(
            F.col("vec_id").alias("_id"),
            F.col("v").cast("array<double>").alias("_v"),
        )
        n = corpus.count()
        k = max(4, n // 100)  # the q136 auto-k rule under audit
        # same routing as semdedup: flat Lloyd below the threshold (the
        # oracle-pinned path), coarse-then-fine above it (the scale path)
        assign = (
            kmeans_assign_hierarchical
            if k >= HIERARCHICAL_K_THRESHOLD
            else kmeans_assign
        )
        cells = (
            assign(corpus, "_id", "_v", k=k, iters=2)
            .groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("pop"))
            .persist()
        )
        stats = cells.agg(
            F.mean("pop").alias("mean"),
            F.expr("percentile(pop, 0.95)").alias("p95"),
            F.max("pop").alias("max"),
            # the quadratic term the cells exist to bound: the number of
            # (smaller, larger) id pairs the within-cell scan generates
            F.sum(F.col("pop") * (F.col("pop") - 1) / 2).alias("pairs"),
        ).collect()[0]
        cells.unpersist()
        print(
            f"{label}, {n}, {k}, {stats['mean']:.1f}, {stats['p95']:.0f}, "
            f"{stats['max']}, {int(stats['pairs'])}, "
            f"{stats['pairs'] / n:.1f}"
        )
    # PQ geometry is corpus-independent by construction: the broadcast
    # ADC lookup is m x k entries and only CODES shuffle.  Report it so
    # the audit artifact states the claim next to the measured cells.
    print("pq_codebook_entries (q152, any tier): m=4 x k=4 = 16 "
          "(broadcast), codes shuffled = 1 byte-scale row per vector")
    spark.stop()


if __name__ == "__main__":
    main()
