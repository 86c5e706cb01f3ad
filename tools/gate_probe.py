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

    from sparkdiff.operators.bloom import bloom_build, bloom_probe
    from sparkdiff.operators.dedup import (
        _shingle_sets,
        band_keys_from_shingles,
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

        # mode 3: amortized + SCOPED batch signatures — the streaming
        # handler's lifecycle: shingles+band keys computed once per
        # batch, persisted, shared by the band join and the verify
        # join, unpersisted after (fixes the double signature cost
        # persist_batch=False paid: both consumers recomputed the
        # batch's shingle+MinHash work)
        runs = []
        for _ in range(3):
            t0 = time.time()
            sh_b = _shingle_sets(batch, "doc_id", "text", 3).persist()
            bk_b = band_keys_from_shingles(sh_b).persist()
            try:
                incremental_near_dup_pairs(
                    None,
                    batch,
                    "doc_id",
                    "text",
                    threshold=0.6,
                    corpus_index=load_corpus_dedup_index(spark, idx_dir),
                    persist_batch=False,
                    batch_shingles=sh_b,
                    batch_band_keys=bk_b,
                ).write.format("noop").mode("overwrite").save()
            finally:
                bk_b.unpersist()
                sh_b.unpersist()
            runs.append(time.time() - t0)
        print(f"gate {label} scoped {sorted(runs)[1]:.2f}s", flush=True)

        # mode 4: Bloom pre-gate on a NOVEL batch — the short-circuit
        # path streaming_ingest_dedup(bloom_gate=...) takes.  Filter
        # built once from the index band table (untimed, amortized like
        # the index itself) and kept as the persisted word TABLE; the
        # timed probe is: batch signatures + broadcast word-table join
        # + 1-row any() (the large-m probe path — per-row cost
        # independent of m) — versus the full exact gate on the same
        # novel batch.
        m_bits, n_h = 1 << 24, 4
        comp = F.concat_ws(":", F.col("band").cast("string"), F.col("key"))
        bk_all = load_corpus_dedup_index(spark, idx_dir)[1]
        words_df = bloom_build(
            bk_all.select(comp.alias("_bk")), "_bk", m_bits, n_h, seed="g"
        ).persist()
        words_df.count()  # materialize outside the timed loop
        novel = batch.withColumn(
            "text", F.concat(F.lit("zq xv qj wk vz jx kq "), F.col("doc_id").cast("string"))
        )
        for bname, b in (("novel", novel), ("dup-heavy", batch)):
            runs_bloom, runs_exact, skipped = [], [], None
            for _ in range(3):
                t0 = time.time()
                sh_b = _shingle_sets(b, "doc_id", "text", 3).persist()
                bk_b = band_keys_from_shingles(sh_b).persist()
                try:
                    hits = (
                        bloom_probe(
                            bk_b.select(comp.alias("_bk")),
                            "_bk", words_df, m_bits, n_h, seed="g",
                        )
                        .filter(F.col("maybe_seen"))
                        .limit(1)
                        .count()
                    )
                    skipped = hits == 0
                    if not skipped:
                        incremental_near_dup_pairs(
                            None, b, "doc_id", "text", threshold=0.6,
                            corpus_index=load_corpus_dedup_index(spark, idx_dir),
                            persist_batch=False,
                            batch_shingles=sh_b, batch_band_keys=bk_b,
                        ).write.format("noop").mode("overwrite").save()
                finally:
                    bk_b.unpersist()
                    sh_b.unpersist()
                runs_bloom.append(time.time() - t0)
                t0 = time.time()
                sh_b = _shingle_sets(b, "doc_id", "text", 3).persist()
                bk_b = band_keys_from_shingles(sh_b).persist()
                try:
                    incremental_near_dup_pairs(
                        None, b, "doc_id", "text", threshold=0.6,
                        corpus_index=load_corpus_dedup_index(spark, idx_dir),
                        persist_batch=False,
                        batch_shingles=sh_b, batch_band_keys=bk_b,
                    ).write.format("noop").mode("overwrite").save()
                finally:
                    bk_b.unpersist()
                    sh_b.unpersist()
                runs_exact.append(time.time() - t0)
            print(
                f"gate {label} bloom[{bname}] {sorted(runs_bloom)[1]:.2f}s "
                f"(short-circuit={skipped}) vs exact "
                f"{sorted(runs_exact)[1]:.2f}s",
                flush=True,
            )
        words_df.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
