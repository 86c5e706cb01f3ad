"""Amortized-index probe for the streaming/incremental ingest dedup
gate: measures the per-ingest cost of screening a FIXED batch against a
growing corpus, with and without a persisted corpus index.

Round-4 baseline (index rebuilt per run): 2.69 / 3.88 / 6.62 s at the
1x / 4x / 16x corpus tiers — 2.5x time for 16x corpus, the slope being
the per-run corpus re-shingle + re-MinHash.  The amortized path
(``corpus_dedup_index`` built ONCE, persisted to parquet via
``save_corpus_dedup_index``, reopened per run with
``load_corpus_dedup_index``) pays only the batch's own signatures plus
a columnar read of the band-key table, which is what a real
continuously-fed corpus does: the index is a TABLE, not a computation.

Run: ``python tools/gate_probe.py`` (builds the replica tiers in /tmp
via scaling_probe.build_4x).  Prints one line per (tier, mode).
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tools.scaling_probe as sp


def main() -> None:
    from pyspark.sql import functions as F

    from sparkdiff.operators.dedup import (
        corpus_dedup_index,
        incremental_near_dup_pairs,
        load_corpus_dedup_index,
        save_corpus_dedup_index,
    )
    from sparkdiff.session import get_spark, load_table

    spark = get_spark("gate-probe")
    tiers = [("1x", sp.SRC)]
    for n in (4, 16):
        os.environ["REPLICAS"] = str(n)
        sp.REPLICAS, sp.DST = n, f"/tmp/sfprobe_{n:02d}"
        tiers.append((f"{n}x", sp.build_4x()))

    # FIXED ingest batch at every tier (the production regime: corpus
    # grows, a day's ingest does not)
    batch = (
        load_table(spark, sp.SRC, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") % 17 == 0)
        .withColumn("doc_id", F.col("doc_id") + 10**8)
        .withColumn("text", F.concat("text", F.lit(" ingest revision")))
    )

    for label, d in tiers:
        corpus = load_table(spark, d, "documents").select("doc_id", "text")
        # mode 1: rebuild — what the round-4 probe measured
        runs = []
        for _ in range(3):
            t0 = time.time()
            incremental_near_dup_pairs(
                corpus, batch, "doc_id", "text", threshold=0.6
            ).write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
            spark.catalog.clearCache()
        print(f"gate {label} rebuild {sorted(runs)[1]:.2f}s", flush=True)

        # mode 2: amortized — index persisted once (untimed), reopened
        # per run like any warehouse table
        idx_dir = f"/tmp/gateidx_{label}"
        shutil.rmtree(idx_dir, ignore_errors=True)
        save_corpus_dedup_index(
            corpus_dedup_index(corpus, "doc_id", "text"), idx_dir
        )
        runs = []
        for _ in range(3):
            t0 = time.time()
            incremental_near_dup_pairs(
                None,
                batch,
                "doc_id",
                "text",
                threshold=0.6,
                corpus_index=load_corpus_dedup_index(spark, idx_dir),
                persist_batch=False,
            ).write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        print(f"gate {label} amortized {sorted(runs)[1]:.2f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
