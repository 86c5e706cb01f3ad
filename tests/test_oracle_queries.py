"""Every declared query must match its DuckDB oracle at sf0.01 —
a local dry-run of the driver's correctness gate."""

from __future__ import annotations

import pytest

from sparkdiff.oracles import ORACLES
from sparkdiff.queries import QUERIES

from .conftest import SF_DIR_ORACLE
from .oracle_harness import compare


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, name):
    assert name in QUERIES, f"oracle {name} has no spark query"
    df = QUERIES[name](spark, SF_DIR_ORACLE)
    res = compare(name, df, ORACLES[name], SF_DIR_ORACLE)
    assert res.ok, "\n".join(res.problems)


def test_all_queries_have_runnable_plans(spark):
    for name, fn in QUERIES.items():
        df = fn(spark, SF_DIR_ORACLE)
        assert df.columns, name


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_execute(spark, name):
    """Queries without an oracle (non-SQL-expressible) still must run and
    produce rows at the driver's correctness scale."""
    n = QUERIES[name](spark, SF_DIR_ORACLE).count()
    assert n > 0, f"{name} returned no rows"
