"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: median_sec}, "sf": ...}.

Each query is evaluated $SPARK_GRAFT_BENCH_N times (default 3) and the
MEDIAN is reported, so round-over-round regressions are attributable to
code rather than scheduler noise; per-run samples, row counts and
rows/sec normalization ride along under "queries_detail".
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sparkdiff.queries import QUERIES  # noqa: E402
from sparkdiff.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_N", "3")))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("sparkdiff-bench")
    # warm the JVM + parquet footer caches so per-query numbers measure
    # the queries, not session startup
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(os.path.join(sf_dir, "customer.parquet")).count()

    timings: dict[str, float | None] = {}
    detail: dict[str, dict] = {}
    errors: dict[str, str] = {}
    for name, fn in sorted(QUERIES.items()):
        # One broken query must cost ONE null entry, never the whole
        # bench: round 2 lost all 68 timings to a single failing scan.
        try:
            df = fn(spark, sf_dir)
            runs = []
            for _ in range(n_runs):
                t0 = time.perf_counter()
                # noop sink forces full evaluation without driver collect cost
                df.write.format("noop").mode("overwrite").save()
                runs.append(round(time.perf_counter() - t0, 4))
            med = round(statistics.median(runs), 4)
            rows = df.count()
        except Exception as exc:  # noqa: BLE001 — harness must survive
            timings[name] = None
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            print(f"bench: {name} FAILED: {errors[name]}", file=sys.stderr)
            continue
        timings[name] = med
        detail[name] = {
            "runs": runs,
            "median": med,
            "rows": rows,
            "rows_per_sec": round(rows / med, 1) if med > 0 else None,
        }

    total = round(sum(t for t in timings.values() if t is not None), 4)
    out = {
        "metric": "sparkdiff_total_query_time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "n_runs": n_runs,
        "queries_detail": detail,
        "sf": sf,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
