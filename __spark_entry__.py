"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship table-parity validation on sf0.001.
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 with its DuckDB oracle (see ``sparkdiff.queries`` /
``sparkdiff.oracles``).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sparkdiff.oracles import ORACLES  # noqa: E402
from sparkdiff.queries import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full-table parity metrics (presence + cell discrepancies)
    on the perturbed lineitem pair at sf0.001 — the reference's `/process`
    pipeline at its production scale class, as one distributed job."""
    return QUERIES["q46_lineitem_diff"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
