"""Continuous ingest-dedup gate: a persisted corpus index (bucketed
band-table layout) fronted by a Bloom pre-gate, driven as a real
Structured-Streaming micro-batch loop with a restart.

The round-trip a continuously-fed training corpus runs on every ingest:

1. bootstrap ONCE: shingle+MinHash the existing corpus into a parquet
   index (``save_corpus_dedup_index`` — band table PARTITIONED by
   ``pmod(xxhash64(key), 64)`` so a micro-batch's probe reads only its
   own buckets) and build the engine-portable Bloom filter over the
   corpus band keys;
2. per micro-batch: probe the batch's band keys against the
   (configuration-sized) filter — a batch with ZERO maybe-seen keys is
   certified novel and SKIPS the exact index entirely (no false
   negatives: a key the filter never saw cannot be in the index);
   otherwise run the exact banded gate (batch×corpus only, never
   corpus×corpus) and report near-duplicates;
3. append the ADMITTED docs' own signature rows + filter bits — the
   gate screens later batches against earlier ones and a stream
   restart reloads everything from disk, never re-shingling the corpus.

Run: ``python examples/ingest_gate_pipeline.py [sf_dir]``
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sparkdiff.operators.dedup import (
    index_key_buckets,
    load_corpus_dedup_index,
)
from sparkdiff.session import get_spark, load_table
from sparkdiff.streaming.validate import streaming_ingest_dedup


def main(sf_dir: str) -> None:
    spark = get_spark("ingest-gate-example", cpus=4, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="ingest_gate_")
    src = os.path.join(work, "incoming")
    idx = os.path.join(work, "index")
    ckpt = os.path.join(work, "ckpt")

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 17 == 0)
    print(f"corpus: {corpus.count()} documents -> bootstrap index at {idx}")

    reports: dict[int, int] = {}

    def on_duplicates(pairs, batch_id: int) -> None:
        reports[batch_id] = pairs.count()

    def run_stream() -> None:
        stream = spark.readStream.schema(docs.schema).parquet(src)
        q = (
            streaming_ingest_dedup(
                stream,
                corpus,
                "doc_id",
                "text",
                on_duplicates,
                threshold=0.6,
                index_dir=idx,
                key_buckets=64,          # bucketed band-table layout
                bloom_gate=(1 << 18, 4),  # persisted pre-gate filter
            )
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    # batch 1: genuinely novel content -> the Bloom gate short-circuits
    novel = spark.createDataFrame(
        [(900_000 + i, f"entirely novel synthetic passage {i} " * 6)
         for i in range(8)],
        "doc_id long, text string",
    )
    novel.coalesce(1).write.mode("append").parquet(src)
    run_stream()

    # batch 2: revisions of corpus docs -> exact gate flags them
    revised = (
        corpus.limit(12)
        .withColumn("doc_id", F.col("doc_id") + 50_000)
        .withColumn("text", F.concat("text", F.lit(" ingest revision")))
    )
    revised.coalesce(1).write.mode("append").parquet(src)
    run_stream()  # RESTART: index, bloom and checkpoint reload from disk

    # batch 3: copies of batch-1 docs -> flagged against the GROWN index
    copies = novel.limit(5).withColumn("doc_id", F.col("doc_id") + 1_000)
    copies.coalesce(1).write.mode("append").parquet(src)
    run_stream()

    for bid in sorted(reports):
        print(f"batch {bid}: near-duplicate pairs flagged = {reports[bid]}")
    sh, bk = load_corpus_dedup_index(spark, idx)
    n_docs = sh.select("_id").distinct().count()
    print(f"index now covers {n_docs} documents "
          f"(key_buckets={index_key_buckets(idx)})")
    part_dirs = [
        d for d in os.listdir(os.path.join(idx, "bands"))
        if d.startswith("_kb=")
    ]
    print(f"band table physically partitioned into {len(part_dirs)} buckets; "
          "a micro-batch probe reads only its own")
    print(f"bloom filter persisted at {os.path.join(idx, 'bloom')} "
          "(novel batches short-circuit the exact index)")
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
