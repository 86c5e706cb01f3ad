"""BPE training-cost probe at production round counts.

q138 trains 8 merges (demonstration scale); a real subword vocabulary
is 10^4-10^5 merges = that many sequential argmax jobs in the exact
mode.  This probe measures, on the sf0.1 documents corpus:

- sequential (``batch_size=1``) training at ``ROUNDS`` merges — the
  per-round job cost with the existing ``checkpoint_every`` cadence;
- batched (``batch_size=B``) training of the same vocabulary size —
  rounds/B jobs, the standard production variant (pairwise
  symbol-disjoint merges per job; see ``operators/bpe.py``).

Run: ``ROUNDS=256 BATCH=16 python tools/bpe_probe.py``
Prints total seconds, jobs, and s/merge for both modes.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROUNDS = int(os.environ.get("ROUNDS", "256"))
BATCH = int(os.environ.get("BATCH", "16"))
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pyspark.sql import functions as F

    from sparkdiff.operators.bpe import bpe_merges
    from sparkdiff.queries import _tokenized_docs
    from sparkdiff.session import get_spark, load_table

    spark = get_spark("bpe-probe")
    toks = _tokenized_docs(
        load_table(spark, SRC, "documents")
    ).select(F.explode("_toks").alias("token"))

    for label, bs in (("sequential", 1), (f"batched(B={BATCH})", BATCH)):
        t0 = time.time()
        got = bpe_merges(toks, "token", rounds=ROUNDS, batch_size=bs).collect()
        dt = time.time() - t0
        jobs = ROUNDS if bs == 1 else (ROUNDS + BATCH - 1) // BATCH
        print(
            f"bpe {label}: {len(got)} merges in {dt:.1f}s "
            f"(~{jobs} argmax jobs, {dt / max(len(got), 1):.3f} s/merge)",
            flush=True,
        )
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
