"""Round-9 before/after comparison: committed clean-host baseline
(BENCH_DETAIL_r09.json as of commit 181a8d1, the round's *before*) vs
the end-of-round BENCH_DETAIL.json (*after*).  Prints the per-query
delta table for OPTIMIZATION_r09.md — biggest movers first — plus the
fleet totals.

Usage::

    python tools/round9_compare.py [min_abs_delta_sec]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASELINE_COMMIT = "181a8d1"


def main() -> None:
    thresh = float(sys.argv[1]) if len(sys.argv) > 1 else 0.1
    before = json.loads(
        subprocess.run(
            ["git", "show", f"{BASELINE_COMMIT}:BENCH_DETAIL_r09.json"],
            capture_output=True,
            text=True,
            cwd=REPO,
            check=True,
        ).stdout
    )
    after = json.load(open(os.path.join(REPO, "BENCH_DETAIL.json")))
    qb, qa = before["queries"], after["queries"]
    print(
        f"before total {before['value']:.2f}s (adj {before['adjudicated_value']:.2f}) "
        f"steal {before['host_health']['steal_pct']}%"
    )
    print(
        f"after  total {after['value']:.2f}s (adj {after['adjudicated_value']:.2f}) "
        f"steal {after['host_health']['steal_pct']}%  "
        f"retimed {len(after.get('retimes', {}))}"
    )
    shared = sorted(set(qb) & set(qa), key=lambda k: qb[k] - qa[k], reverse=True)
    print(f"\n{'query':38s} {'before':>7s} {'after':>7s} {'delta':>7s}")
    for k in shared:
        d = qb[k] - qa[k]
        if abs(d) >= thresh:
            print(f"{k:38s} {qb[k]:7.3f} {qa[k]:7.3f} {d:+7.3f}")
    print(f"\nsum before {sum(qb.values()):.2f}  sum after {sum(qa.values()):.2f}")


if __name__ == "__main__":
    main()
