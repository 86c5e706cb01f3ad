"""Oracle-verify a NAMED SUBSET of registry queries — the fast inner loop
for optimization rounds (the full sweep is tools/verify_sweep.py and takes
minutes; one query takes seconds).

Runs the driver-faithful comparison (tests/oracle_harness.py: both sides
through pandas, type-tagged value canonicalization, keyed multiset hash)
at one or more scale factors and exits non-zero on any mismatch.  Never
writes CORRECTNESS_LOCAL_* — partial runs are not round evidence.

Usage::

    python tools/verify_some.py q164_kmv_set_ops q147_source_overlap
    SPARKDIFF_VERIFY_SFS=sf0.001,sf0.01,sf0.1 python tools/verify_some.py q50_quantiles
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from sparkdiff.oracles import ORACLES  # noqa: E402
from sparkdiff.queries import QUERIES  # noqa: E402
from sparkdiff.session import get_spark  # noqa: E402
from tests.oracle_harness import _keyed, run_oracle  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    assert names, "usage: verify_some.py <query> [query ...]"
    sfs = os.environ.get("SPARKDIFF_VERIFY_SFS", "sf0.01,sf0.1").split(",")
    spark = get_spark("sparkdiff-verify-some")
    n_bad = 0
    for sf in sfs:
        sf_dir = f"/root/testdata/{sf}"
        for name in names:
            t0 = time.perf_counter()
            try:
                s_pdf = QUERIES[name](spark, sf_dir).toPandas()
                if name not in ORACLES:
                    print(f"{sf} {name}: NO ORACLE ({len(s_pdf)} rows)")
                    continue
                d_pdf = run_oracle(ORACLES[name], sf_dir)
                ok = (
                    len(s_pdf) == len(d_pdf)
                    and sorted(s_pdf.columns) == sorted(d_pdf.columns)
                    and _keyed(s_pdf) == _keyed(d_pdf)
                )
            except Exception as exc:  # noqa: BLE001 — report and continue
                print(f"{sf} {name}: ERROR {type(exc).__name__}: {exc}"[:300])
                n_bad += 1
                continue
            finally:
                spark.catalog.clearCache()
            dt = time.perf_counter() - t0
            if ok:
                print(f"{sf} {name}: HASH OK ({len(s_pdf)} rows, {dt:.1f}s)")
            else:
                n_bad += 1
                print(
                    f"{sf} {name}: MISMATCH spark={len(s_pdf)} "
                    f"oracle={len(d_pdf)} cols_ok="
                    f"{sorted(s_pdf.columns) == sorted(d_pdf.columns)}"
                )
    spark.stop()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
