"""Benchmark-decontamination pipeline: two-stage screen (token 8-gram
overlap, then exact variable-length substring via a broadcast
Aho-Corasick automaton) → drop contaminated documents → exact PPS
sample of the clean remainder, proportional to token count.

This is the standard pre-training hygiene recipe: the gram screen
(q66's shape) catches paraphrase-level overlap cheaply, the exact pass
(q134's shape) catches verbatim leakage the gram width misses, and the
final mixture draw (q135's shape) is reproducible bit-for-bit on any
cluster size.  Both screens scan the corpus once with the test suite
broadcast; the sampler's only global state is a #partitions-row
subtotal table.

Run: ``python examples/decontamination_pipeline.py [sf_dir]``
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sparkdiff.functions.textstats import ws_token_count
from sparkdiff.operators.contamination import exact_contamination, excise_contamination
from sparkdiff.operators.dedup import token_hash
from sparkdiff.operators.sampling import systematic_weighted_sample
from sparkdiff.session import get_spark, load_table


def main(sf_dir: str) -> None:
    spark = get_spark("decontamination-pipeline")
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()

    # The held-out "benchmark suite": verbatim snippets of every 40th
    # document — variable lengths, exactly how leakage looks in practice.
    suite = docs.filter(
        (F.col("doc_id") % 40 == 0) & (F.col("n_chars") >= 65)
    ).select(
        F.col("doc_id").alias("test_id"),
        F.expr("substring(text, 11, 30 + doc_id % 25)").alias("pat"),
    )

    # Stage 1 — word 8-gram overlap screen (broadcast test grams,
    # one corpus scan, grams travel as md5-derived 60-bit longs).
    toks = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda t: F.length(t) > 0
    )
    base = docs.select("doc_id", toks.alias("_toks"))

    def grams(col, k=8):
        n = F.size(col)
        return F.when(n < k, F.array().cast("array<string>")).otherwise(
            F.transform(
                F.sequence(F.lit(1), n - (k - 1)),
                lambda i: F.concat_ws(" ", F.slice(col, i, k)),
            )
        )

    test_grams = (
        base.filter(F.col("doc_id") % 40 == 0)
        .select(F.explode(F.array_distinct(grams(F.slice("_toks", 2, 30)))).alias("g"))
        .select(token_hash("g", "md5").alias("gh"))
        .distinct()
    )
    gram_hits = (
        base.select("doc_id", F.explode(F.array_distinct(grams(F.col("_toks")))).alias("g"))
        .select("doc_id", token_hash("g", "md5").alias("gh"))
        .join(F.broadcast(test_grams), "gh")
        .select("doc_id")
        .distinct()
    )

    # Stage 2 — exact substring pass (Aho-Corasick broadcast automaton),
    # plus the surgical alternative: excise the matched spans instead of
    # dropping the documents they sit in.
    exact_hits = exact_contamination(docs, suite).select("doc_id").distinct()
    excised = (
        excise_contamination(docs, suite)
        .filter(F.col("n_spans") > 0)
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_chars_excised").alias("chars"),
        )
        .collect()[0]
    )
    print(f"-> surgical option: {excised.chars} chars excisable from {excised.docs} docs")

    flagged = gram_hits.union(exact_hits).distinct()
    clean = docs.join(flagged, "doc_id", "left_anti")

    n_gram = gram_hits.count()
    n_exact = exact_hits.count()
    n_clean = clean.count()
    print(f"corpus {n_docs} docs -> gram-flagged {n_gram}, exact-flagged {n_exact}")
    print(f"-> clean {n_clean}")

    # Stage 3 — exact PPS mixture draw over the clean remainder.
    weighted = clean.select("doc_id", ws_token_count("text").alias("n_tok"))
    sample = systematic_weighted_sample(weighted, "doc_id", "n_tok", k=100, seed="demo")
    drawn = sample.agg(
        F.sum("n_copies").alias("k"), F.count(F.lit(1)).alias("docs")
    ).collect()[0]
    print(f"-> PPS sample: {drawn.k} draws over {drawn.docs} distinct docs")
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
