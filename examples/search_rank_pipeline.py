"""The reference's cross-platform search pipeline (SURVEY §3.3 —
`agents/slack_search_agent.py:233-433`) as one deterministic DataFrame
composition: keyword scoring → top-10 candidates → conditional
refinement re-query with an expanded term set and a linked-document
bonus → re-rank to top-7 → dedup → histogram insights.

The reference drives this with an LLM keyword extractor and REST
back-ends; here the corpus is the documents table and every stage is an
engine operator, so the whole loop is reproducible and oracle-grade
deterministic.  The refinement trigger (best score > threshold) mirrors
the reference's `if best > 65: re-query with components/labels`.

Run: ``python examples/search_rank_pipeline.py [sf_dir]``
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sparkdiff.functions.text import term_hits
from sparkdiff.operators.workload import keep_max
from sparkdiff.session import get_spark, load_table

QUERY_TERMS = ["slow", "error"]
EXPANDED_TERMS = QUERY_TERMS + ["merge", "timeout"]  # U2 set-union stage
REFINE_THRESHOLD = 5
LINKED_BONUS = 10


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("search-rank-pipeline", cpus=8)
    docs = load_table(spark, sf_dir, "documents")

    # stage 1: keyword score over the corpus, top-10 candidates
    scored = docs.select(
        "doc_id",
        "source",
        (term_hits("text", QUERY_TERMS) * 10).alias("score"),
    ).filter(F.col("score") > 0)
    top10 = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(10)

    best = top10.agg(F.max("score")).collect()[0][0] or 0
    print(f"initial candidates: {scored.count()}, best score: {best}")

    # stage 2: conditional refinement — the reference re-queries with
    # components/labels when the best hit clears the bar
    if best > REFINE_THRESHOLD:
        refined = docs.select(
            "doc_id",
            "source",
            (
                term_hits("text", EXPANDED_TERMS) * 10
                # linked-document bonus: docs citing an issue key
                + F.when(
                    F.col("text").rlike(r"\b[A-Z][A-Z0-9]{1,9}-\d+\b"),
                    F.lit(LINKED_BONUS),
                ).otherwise(F.lit(0))
            ).alias("score"),
        ).filter(F.col("score") > 0)
        pool = top10.unionByName(refined)
    else:
        pool = top10

    # stage 3: keep-max dedup per doc (A6), re-rank to top-7 (T3)
    deduped = keep_max(pool, ["doc_id"], ["score"])
    top7 = deduped.orderBy(F.desc("score"), F.asc("doc_id")).limit(7)
    print("top-7:")
    for r in top7.collect():
        print(f"  doc {r.doc_id:>6}  source={r.source:<6} score={r.score}")

    # stage 4: histogram insights (A2–A5)
    insights = (
        deduped.groupBy("source")
        .agg(F.count("*").alias("n"), F.max("score").alias("best"))
        .orderBy(F.desc("n"), "source")
    )
    print("per-source insight:")
    for r in insights.collect():
        print(f"  {r.source:<6} n={r.n:>4} best={r.best}")
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:2])
