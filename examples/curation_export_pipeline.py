"""Corpus-to-training-set export pipeline: PII scrub → quality/repetition
gates → domain-weighted mixing → deterministic train/val/test split →
context-window packing → shuffle-shard export.

The back half of a pretraining data pipeline (the front half — dedup,
language ID, chunking — is ``training_data_pipeline.py``).  Every stage
is a pure-column-expression operator, and every assignment (mix, split,
shard) is a content-hash decision, so re-running the pipeline on an
appended corpus changes only the new rows.

Run: ``python examples/curation_export_pipeline.py [sf_dir]``
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sparkdiff.functions.pii import PII_PATTERNS, pii_count, redact_pii
from sparkdiff.functions.textstats import (
    dup_fraction,
    quality_score,
    word_ngrams,
    ws_token_count,
)
from sparkdiff.operators.packing import pack_concat_chunks
from sparkdiff.operators.sampling import (
    hash_split,
    shuffle_shards,
    weighted_domain_sample,
)
from sparkdiff.session import get_spark, load_table


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("curation-export-pipeline", cpus=8)
    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1. PII scrub: redact in place, keep the counts as audit columns
    scrubbed = docs.select(
        "doc_id",
        "source",
        redact_pii("text").alias("text"),
        sum(
            [pii_count("text", pat) for _, pat, _ in PII_PATTERNS],
            F.lit(0).cast("long"),
        ).alias("n_pii"),
    )
    n_pii_docs = scrubbed.filter(F.col("n_pii") > 0).count()

    # 2. quality + repetition gates over the scrubbed text.  The
    # persist() is load-bearing: filtering directly on
    # dup_fraction(_g3) would let predicate pushdown substitute the
    # full word_ngrams HOF tree into the filter (twice) below the
    # projection — the per-element re-evaluation trap (SCALE.md,
    # measured ~15x) — and an InMemoryRelation is a pushdown barrier.
    toks = (
        scrubbed.withColumn(
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
    n1 = gated.count()

    # 3. domain mixing: per-source keep rates, content-hash deterministic
    mixed = weighted_domain_sample(
        gated,
        "doc_id",
        "source",
        {"src1": 1.0, "src2": 0.7},
        default_rate=0.4,
        seed="curation-v1",
    )
    n2 = mixed.count()

    # 4. train/val/test split — stable under appends and repartitioning
    split = hash_split(
        mixed, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05},
        seed="curation-v1",
    )

    # 5. pack the train split into 512-token context windows (per-shard
    # prefix sums; shard = pk residue so packing parallelizes)
    train = split.filter(F.col("split") == "train").withColumn(
        "n_tokens", ws_token_count("text")
    )
    packed = pack_concat_chunks(
        train.withColumn("shard_key", (F.col("doc_id") % 4).cast("long")),
        "doc_id",
        "n_tokens",
        capacity=512,
        shard_col="shard_key",
    )
    n_windows = (
        packed.groupBy("shard")
        .agg(F.max(F.col("window_id") + F.col("spans")).alias("w"))
        .agg(F.sum("w"))
        .collect()[0][0]
    )

    # 6. deterministic shuffle-shard assignment for the export
    export = shuffle_shards(
        packed.select("doc_id", "shard", "n_tokens", "window_id"),
        "doc_id",
        n_shards=4,
        seed="curation-v1",
        shard_col="out_shard",
    )
    per_shard = {
        r.out_shard: r.n
        for r in export.groupBy("out_shard").agg(F.count("*").alias("n")).collect()
    }

    # 7. export manifest: per-shard counts + the commutative content
    # checksum (q153's shape) — re-running the export on ANY cluster
    # layout reproduces this table byte-for-byte, so a consumer
    # verifies shards without re-reading them
    from sparkdiff.functions.canonical import content_checksum

    manifest = (
        export.groupBy("out_shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            content_checksum(F.col("doc_id"), F.col("n_tokens")).alias(
                "checksum"
            ),
        )
        .orderBy("out_shard")
    )
    manifest_rows = {
        r.out_shard: (r.n_docs, r.n_tokens, r.checksum)
        for r in manifest.collect()
    }
    # verification pass: recompute from a differently-partitioned read
    # of the same export — the manifest must match exactly
    recheck = {
        r.out_shard: (r.n_docs, r.n_tokens, r.checksum)
        for r in export.repartition(13)
        .groupBy("out_shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            content_checksum(F.col("doc_id"), F.col("n_tokens")).alias(
                "checksum"
            ),
        )
        .collect()
    }
    assert recheck == manifest_rows, "manifest verification failed"

    print(f"corpus: {n0} docs, {n_pii_docs} carried PII (redacted)")
    print(f"after quality/repetition gates: {n1}")
    print(f"after domain mixing: {n2}")
    print(
        "split sizes:",
        {
            r.split: r.n
            for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()
        },
    )
    print(f"train packed into {n_windows} windows of 512 tokens")
    print(f"export shards: {per_shard}")
    print(f"manifest (verified on a re-read): {manifest_rows}")
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:2])
