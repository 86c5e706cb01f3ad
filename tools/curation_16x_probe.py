"""Composed end-to-end curation run at the heavy (REPLICAS=16) tier —
the closest thing to a 100 TB rehearsal this sandbox can stage (round-6
verdict #5): decontaminate → exact dedup → near-dup dedup → quality
filter → temperature mix → pack, as ONE pipeline with per-stage and
total wall time.

Every stage boundary is a durable parquet write to /tmp (the honest
production shape: stages restart independently, and each timing below
includes the stage's own write).  The test suite for decontamination is
FIXED (drawn from replica 0 only — q134's pattern recipe): the
benchmark suite a real pipeline holds out does not grow with the
corpus.

Run: ``REPLICAS=16 python tools/curation_16x_probe.py``
(builds /tmp/sfprobe_16 on first use; REPLICAS=4 for a quick pass).
Prints one line per stage plus a summary block for SCALE.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("REPLICAS", "16")

from pyspark.sql import functions as F  # noqa: E402

from tools.scaling_probe import REPLICAS, SHIFT, build_4x  # noqa: E402

OUT = f"/tmp/curation16x_{REPLICAS:02d}"


def main() -> None:
    from sparkdiff.functions.textstats import (
        dup_fraction,
        quality_score,
        word_ngrams,
        ws_token_count,
    )
    from sparkdiff.operators.contamination import excise_contamination
    from sparkdiff.operators.dedup import (
        exact_dedup,
        near_dup_pairs,
        paragraph_dedup,
    )
    from sparkdiff.operators.packing import pack_concat_chunks
    from sparkdiff.operators.sampling import weighted_domain_sample
    from sparkdiff.session import get_spark

    tier = build_4x()
    shutil.rmtree(OUT, ignore_errors=True)
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("curation-16x")
    timings: list[tuple[str, float, int]] = []
    t_all = time.time()

    def stage(name: str, df, path: str):
        t0 = time.time()
        df.write.mode("overwrite").parquet(path)
        out = spark.read.parquet(path)
        n = out.count()
        timings.append((name, time.time() - t0, n))
        print(f"{name}: {timings[-1][1]:.1f}s, {n} rows", flush=True)
        return out

    docs = spark.read.parquet(os.path.join(tier, "documents.parquet"))

    # 0. expectation gate: malformed input poisons every stage below,
    # so the Deequ-style one-pass audit (q168 machinery) runs FIRST and
    # fails fast on critical violations; the report is #checks rows and
    # the pass costs one scan
    from sparkdiff.operators.expectations import (
        expectation_gate,
        in_range,
        not_null,
        unique,
    )

    t0 = time.time()
    expectation_gate(
        docs,
        [
            not_null("doc_id"),
            not_null("text"),
            in_range("n_chars", 1, 10_000_000),
            unique(["doc_id"]),
        ],
        report_sink=f"{OUT}/s0_gate",
    )
    timings.append(("expectation_gate", time.time() - t0, 4))
    print(f"expectation_gate: {timings[-1][1]:.1f}s, 4 checks", flush=True)

    # 1. decontaminate: fixed held-out suite (replica 0 only), excised
    # in one broadcast-automaton corpus scan (operators/contamination)
    pats = docs.filter(
        (F.col("doc_id") % 40 == 0)
        & (F.col("doc_id") < SHIFT)
        & (F.col("n_chars") >= 65)
    ).select(
        F.col("doc_id").alias("test_id"),
        F.expr("substr(text, 11, 30 + CAST(doc_id % 25 AS INT))").alias("pat"),
    )
    clean = excise_contamination(docs, pats).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    meta = docs.select("doc_id", "source")
    clean = clean.join(meta, "doc_id")
    d1 = stage("decontaminate", clean, f"{OUT}/s1_decontaminated")

    # 2. exact dedup on the cleaned text (hash groupBy keep-first)
    d2 = stage("exact_dedup", exact_dedup(d1, ["text"]), f"{OUT}/s2_exact")

    # 3. near-dup dedup: MinHash-LSH pairs, drop the higher doc_id of
    # each verified pair (keep-first; banded bucket join, never n^2)
    pairs = near_dup_pairs(d2, "doc_id", "text", threshold=0.85)
    losers = pairs.select(
        F.greatest("id_a", "id_b").alias("doc_id")
    ).distinct()
    d3 = stage(
        "near_dup_dedup", d2.join(losers, "doc_id", "left_anti"), f"{OUT}/s3_neardup"
    )

    # 3b. paragraph-level dedup (CCNet stage, round-7 q151): cut every
    # repeated 10-word segment except its corpus-first occurrence and
    # rebuild the documents — catches the sub-document repetition that
    # doc-level exact/near-dup can't
    para = paragraph_dedup(
        d3.select("doc_id", "text"), segment_words=10, min_chars=20
    )
    d3b = stage(
        "paragraph_dedup",
        para.select("doc_id", F.col("clean_text").alias("text")).join(
            d3.select("doc_id", "source"), "doc_id"
        ),
        f"{OUT}/s3b_paragraph",
    )
    d3 = d3b

    # 4. quality + repetition gates (pure column expressions).
    # Two plan traps live here, both found by this probe (SCALE.md):
    # (a) the dedup stages collapse the corpus to a small single-file
    #     parquet, so without a repartition the CPU-heavy per-doc gate
    #     runs on ONE core;
    # (b) filtering directly on dup_fraction(_g3) lets Catalyst PUSH
    #     THE PREDICATE BELOW the _toks/_g3 projection, substituting
    #     the full word_ngrams HOF tree (twice) into the filter — the
    #     per-element re-evaluation the textstats docstrings warn
    #     about, ~4 ms/row interpreted.  The persist() is the q68
    #     convention: an InMemoryRelation is a pushdown barrier, so the
    #     gate reads the MATERIALIZED gram arrays.
    # Measured: 16.1 s naive → ~1 s with both fixes, same rows out.
    toks = (
        d3.repartition(32)
        .withColumn(
            "_toks",
            F.filter(
                F.split(F.lower("text"), "[^a-z0-9]+"),
                lambda t: F.length(t) > 0,
            ),
        )
        .withColumn("_g3", word_ngrams(F.col("_toks"), 3))
        .persist()
    )
    gated = toks.filter(
        (quality_score("text") > 0.4) & (dup_fraction(F.col("_g3")) < 0.5)
    ).drop("_toks", "_g3")
    d4 = stage("quality_filter", gated, f"{OUT}/s4_quality")
    toks.unpersist()

    # 5. temperature mix (alpha=0.5): per-source keep rates proportional
    # to sqrt(n)/n, scaled so the largest source's rate maxes at 1.0 —
    # the q139 reweighting turned into a deterministic hash-sample.
    # The per-source collect is vocabulary-sized (sources, not docs).
    per = (
        d4.groupBy("source")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .collect()
    )
    raw = {r["source"]: (r["n"] ** 0.5) / r["n"] for r in per}
    top = max(raw.values())
    rates = {s: w / top for s, w in raw.items()}
    mixed = weighted_domain_sample(
        d4, "doc_id", "source", rates, default_rate=1.0, seed="curation-16x"
    )
    d5 = stage("temperature_mix", mixed, f"{OUT}/s5_mixed")

    # 6. pack into 2048-token context windows (per-shard prefix sums)
    packed = pack_concat_chunks(
        d5.withColumn("n_tokens", ws_token_count("text")).withColumn(
            "shard_key", (F.col("doc_id") % 32).cast("long")
        ),
        "doc_id",
        "n_tokens",
        capacity=2048,
        shard_col="shard_key",
    )
    stage("pack", packed, f"{OUT}/s6_packed")

    total = time.time() - t_all
    print(f"\n# SCALE.md block (REPLICAS={REPLICAS}, local[32])")
    print("| stage | seconds | rows out |")
    print("|---|---|---|")
    for name, sec, n in timings:
        print(f"| {name} | {sec:.1f} | {n} |")
    print(f"| **total (incl. stage parquet I/O)** | **{total:.1f}** | |")
    spark.stop()


if __name__ == "__main__":
    main()
