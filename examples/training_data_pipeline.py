"""Training-data curation pipeline over the documents corpus: quality
filter → language filter → exact dedup → near-dup removal (MinHash-LSH)
→ ingest gate for a new batch → token-budget mixture sampling → chunk →
embed → self-similarity search.

Every stage is one of the engine's operators; the whole thing is a
single lazy composition until the final actions.

Run: ``python examples/training_data_pipeline.py [sf_dir]``
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sparkdiff.functions.embed import encode_text
from sparkdiff.functions.textstats import lang_id, quality_score, ws_token_count
from sparkdiff.operators.dedup import (
    corpus_dedup_index,
    exact_dedup,
    incremental_near_dup_pairs,
    near_dup_pairs,
)
from sparkdiff.operators.sampling import token_budget_sample
from sparkdiff.operators.similarity import cosine_topk
from sparkdiff.session import get_spark, load_table


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("training-data-pipeline", cpus=8)
    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1. quality + language gates (pure column expressions)
    kept = docs.filter(
        (quality_score("text") > 0.5) & (lang_id("text") == "en")
    )
    n1 = kept.count()

    # 2. exact dedup on normalized content
    deduped = exact_dedup(kept.select("doc_id", "text"), ["text"])
    n2 = deduped.count()

    # 3. near-dup removal: drop the higher doc_id of each detected pair
    pairs = near_dup_pairs(deduped, "doc_id", "text", threshold=0.85)
    losers = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    survivors = deduped.join(losers, "doc_id", "left_anti")
    n3 = survivors.count()

    # 4. ingest gate: a "new batch" (perturbed copies) against the
    #    survivors, via the amortizable corpus index — batch docs that
    #    near-duplicate the corpus never enter it
    index = corpus_dedup_index(survivors, "doc_id", "text")
    batch = survivors.limit(20).select(
        (F.col("doc_id") + 900_000).alias("doc_id"),
        F.concat("text", F.lit(" trailing edit")).alias("text"),
    )
    flagged = incremental_near_dup_pairs(
        None, batch, "doc_id", "text", threshold=0.8, corpus_index=index
    )
    n_flagged = flagged.select("batch_id").distinct().count()

    # 5. token-budget mixture sampling: cap each source domain's
    #    contribution (deterministic, append-stable)
    budgeted = token_budget_sample(
        survivors.join(
            docs.select("doc_id", "source"), "doc_id"
        ).withColumn("n_tok", ws_token_count("text")),
        "doc_id",
        "source",
        "n_tok",
        budget=5_000,
    ).drop("n_tok", "cum_tokens", "source")
    n5 = budgeted.count()

    # 6. chunk + embed (Arrow-batched encoder)
    chunks = budgeted.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.length("text"), F.lit(1)), F.lit(450)),
                lambda s: F.substring(F.col("text"), s, F.lit(500)),
            )
        ).alias("chunk_idx", "chunk"),
    )
    embedded = chunks.select(
        "doc_id", "chunk_idx", encode_text(F.col("chunk")).alias("embedding")
    )
    embedded = embedded.withColumn(
        "chunk_id", F.col("doc_id") * 1000 + F.col("chunk_idx")
    )
    n4 = embedded.count()

    # 7. similarity search: top-3 neighbors for the first 5 chunks
    queries = embedded.orderBy("chunk_id").limit(5)
    hits = cosine_topk(
        queries, embedded, "chunk_id", "chunk_id", "embedding", "embedding", k=3
    )

    print(f"corpus {n0} -> quality/lang {n1} -> exact-dedup {n2} "
          f"-> near-dup {n3} -> ingest-flagged {n_flagged} "
          f"-> budgeted {n5} -> chunks {n4}")
    hits.show()
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:2])
