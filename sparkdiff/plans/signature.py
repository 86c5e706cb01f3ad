"""Physical-plan shape signatures for regression pinning.

A query can stay value-correct while its plan silently degrades — a
broadcast flipping to sort-merge, a new exchange, a filter no longer
reaching the scan.  ``plan_signature`` reduces a DataFrame's physical
plan to the shape facts that matter at 100 TB:

- join strategy counts (broadcast / sort-merge / shuffled-hash / NLJ /
  cartesian),
- shuffle exchange count (``Exchange *partitioning``) vs broadcast
  exchange count,
- Python-boundary operator count (Arrow/pandas evals — the JVM-exit
  points that must stay out of hot paths).

``tests/test_plan_snapshots.py`` pins one signature per registered
query against ``tests/plan_snapshots.json``; regenerate with
``SPARKDIFF_REGEN_PLANS=1 pytest tests/test_plan_snapshots.py``.
"""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import DataFrame

_JOIN_RE = re.compile(
    r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
    r"BroadcastNestedLoopJoin|CartesianProduct)\b"
)
_SHUFFLE_RE = re.compile(
    # roundrobin covers keyless repartition(n) — the round-9 parallelism
    # opt-ins (q16/q21/q26/q55/q67) add these, and an accidental
    # full-corpus repartition must be pinned like any other exchange
    # (round-9 advisor finding: they were invisible to the snapshots)
    r"\bExchange (?:hash|range|single|roundrobin)partitioning\b"
)
_BROADCAST_X_RE = re.compile(r"\bBroadcastExchange\b")
_PYTHON_RE = re.compile(
    r"\b(ArrowEvalPython|BatchEvalPython|MapInPandas|"
    r"FlatMapGroupsInPandas|AggregateInPandas)\b"
)


def plan_signature(df: DataFrame) -> dict:
    """Shape signature of the (pre-AQE) physical plan."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "joins": dict(sorted(Counter(_JOIN_RE.findall(plan)).items())),
        "shuffles": len(_SHUFFLE_RE.findall(plan)),
        "broadcasts": len(_BROADCAST_X_RE.findall(plan)),
        "python_evals": len(_PYTHON_RE.findall(plan)),
    }
