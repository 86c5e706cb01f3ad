"""Continuous re-validation — the day-2 story for table parity.

Day 1 runs the full diff once (``parity_pipeline.py``).  Every run after
that should pay for the DRIFT, not the table:

1. persist the stable side's bucket-checksum store (KBs),
2. per run, scan only the live side and compare against the store,
3. re-diff just the dirty buckets (lossless — same rows as a full diff),
4. optionally keep the checksums current from a CDC stream instead of
   rescanning at all (``streaming_bucket_checksums_cdc``).

Run: ``python examples/revalidation_pipeline.py [sf_dir]``
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkdiff import testkit
from sparkdiff.operators.diff import (
    _compared_columns,
    cell_diff,
    dirty_vs_store,
    refined_table_metrics,
    write_bucket_store,
)
from sparkdiff.session import get_spark


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("revalidation-pipeline", cpus=8)
    hive, sf = testkit.hive_sf_pair(spark, sf_dir)
    pk = "c_custkey"
    cols = _compared_columns(hive, sf, pk, testkit.EXCLUDE_COLS)
    n_buckets = 512

    with tempfile.TemporaryDirectory() as tmp:
        store = os.path.join(tmp, "hive_checksums")

        # day 1: one scan of the stable side, persisted as KBs
        write_bucket_store(hive, pk, cols, store, n_buckets=n_buckets)

        # day 2+: scan ONLY the live side
        dirty = dirty_vs_store(sf, store, pk, cols, n_buckets=n_buckets)
        dirty_ids = [r.bucket for r in dirty.collect()]
        print(f"dirty buckets: {len(dirty_ids)}/{n_buckets}")

        # re-diff just the drifted slice (lossless vs the full diff)
        from pyspark.sql import functions as F

        def keep(df):
            b = F.pmod(F.xxhash64(F.col(pk).cast("string")), F.lit(n_buckets))
            return df.filter(b.isin(dirty_ids))

        drifted = cell_diff(keep(hive), keep(sf), pk, testkit.EXCLUDE_COLS)
        print(f"cell diffs in drifted slice: {drifted.count()}")

        # the dw_data_metrics row through the same fast path
        m = refined_table_metrics(
            hive, sf, pk, "CUSTOMER", testkit.EXCLUDE_COLS, n_buckets=n_buckets
        ).collect()[0]
        print(
            "metrics: "
            f"hive={m.total_record_count_hive} sf={m.total_record_count_sf} "
            f"only_hive={m.row_count_only_in_hive} only_sf={m.row_count_only_in_sf} "
            f"mismatch={m.row_count_data_discrepancy}"
        )


if __name__ == "__main__":
    main(*sys.argv[1:2])
