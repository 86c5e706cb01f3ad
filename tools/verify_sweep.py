"""Write the FULL-registry oracle sweep as a diffable per-round artifact
(round-7 verdict #4).

The driver's hard correctness signal (CORRECTNESS_r*.json) covers only
the first 50 registry entries; the remaining queries were verified by a
driver-faithful pytest sweep whose result lived only inside a test run.
This tool runs the SAME comparison (tests/oracle_harness.py — both sides
fetched through pandas, type-tagged value canonicalization, identical to
the driver's semantics) over ALL registry entries and writes
``CORRECTNESS_LOCAL_r<N>.json`` in the driver's exact per-query schema::

    {"<query>": {"rows_match": bool, "schema_match": bool,
                 "hash_match": bool, "spark_rows": int,
                 "oracle_rows": int, "err": str | null}, ...}

so a reader can diff local correctness round-over-round exactly like the
driver artifact.  Queries without an oracle entry (none today) would get
the driver's weaker rows-only record: ``hash_match``/``schema_match``
null, ``oracle_rows`` null.

Usage::

    python tools/verify_sweep.py            # sf0.01, infer round number
    SPARKDIFF_SWEEP_ROUND=8 python tools/verify_sweep.py

Round inference mirrors bench.py: (highest driver-recorded
CORRECTNESS_r*.json) + 1 — the round currently being built.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from sparkdiff.oracles import ORACLES  # noqa: E402
from sparkdiff.queries import QUERIES  # noqa: E402
from sparkdiff.session import get_spark  # noqa: E402
from tests.oracle_harness import _keyed, run_oracle  # noqa: E402


def sweep_one(spark, name: str, sf_dir: str) -> dict:
    rec: dict = {
        "rows_match": None,
        "schema_match": None,
        "hash_match": None,
        "spark_rows": None,
        "oracle_rows": None,
        "err": None,
    }
    try:
        s_pdf = QUERIES[name](spark, sf_dir).toPandas()
        rec["spark_rows"] = int(len(s_pdf))
        if name not in ORACLES:
            # driver's weaker rows-only record: ran clean, produced rows
            rec["rows_match"] = bool(len(s_pdf) > 0)
            return rec
        d_pdf = run_oracle(ORACLES[name], sf_dir)
        rec["oracle_rows"] = int(len(d_pdf))
        rec["rows_match"] = len(s_pdf) == len(d_pdf)
        rec["schema_match"] = sorted(s_pdf.columns) == sorted(d_pdf.columns)
        rec["hash_match"] = (
            rec["rows_match"]
            and rec["schema_match"]
            and _keyed(s_pdf) == _keyed(d_pdf)
        )
    except Exception as exc:  # noqa: BLE001 — one failure costs one entry
        rec["err"] = f"{type(exc).__name__}: {exc}"[:500]
    finally:
        spark.catalog.clearCache()
    return rec


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    rnd = os.environ.get("SPARKDIFF_SWEEP_ROUND")
    if not rnd:
        recorded = [
            int(m.group(1))
            for f in os.listdir(REPO)
            if (m := re.fullmatch(r"CORRECTNESS_r(\d+)\.json", f))
        ]
        rnd = str(max(recorded, default=0) + 1)

    spark = get_spark("sparkdiff-verify-sweep")
    t0 = time.perf_counter()
    results: dict[str, dict] = {}
    n_bad = 0
    for name in sorted(QUERIES):
        rec = sweep_one(spark, name, sf_dir)
        results[name] = rec
        ok = rec["err"] is None and (
            rec["hash_match"] if name in ORACLES else rec["rows_match"]
        )
        if not ok:
            n_bad += 1
            print(f"sweep: {name} FAILED: {rec}", file=sys.stderr)

    out = os.path.join(REPO, f"CORRECTNESS_LOCAL_r{int(rnd):02d}.json")
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(
        json.dumps(
            {
                "artifact": os.path.basename(out),
                "sf_dir": sf_dir,
                "n_queries": len(results),
                "n_oracled": sum(1 for n in results if n in ORACLES),
                "n_failed": n_bad,
                "wall_sec": round(time.perf_counter() - t0, 1),
            }
        )
    )
    spark.stop()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
