"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sparkdiff.queries import QUERIES  # noqa: E402
from sparkdiff.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("sparkdiff-bench")
    # warm the JVM + parquet footer caches so per-query numbers measure
    # the queries, not session startup
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(os.path.join(sf_dir, "customer.parquet")).count()
    timings: dict[str, float] = {}
    for name, fn in sorted(QUERIES.items()):
        df = fn(spark, sf_dir)
        t0 = time.perf_counter()
        # foreach-noop forces full evaluation without driver collect cost
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "sparkdiff_total_query_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
