"""Every declared query must match its DuckDB oracle at sf0.01 —
a local dry-run of the driver's correctness gate.

Tiering (round-9 verdict #2): the exhaustive 202-query sweep pushed the
default suite past the driver's verify budget (~29 min; VERIFY_r09 shows
the run truncated mid-suite with zero failures), so the full sweep and
the no-oracle execution sweep are `-m full` opt-ins — still run by
`tools/verify_sweep.py` and the end-of-round verification — while the
default tier keeps a deterministic smoke slice (every 7th oracle name
plus the flagship diff) so a broken rail is still caught in minutes.
"""

from __future__ import annotations

import pytest

from sparkdiff.oracles import ORACLES
from sparkdiff.queries import QUERIES

from .conftest import SF_DIR_ORACLE
from .oracle_harness import compare

#: Deterministic default-tier slice: every 7th sorted oracle plus the
#: flagship parity query — ~30 compares, one per operator neighborhood.
SMOKE = sorted(set(sorted(ORACLES)[::7]) | {"q46_lineitem_diff"})


@pytest.mark.parametrize("name", SMOKE)
def test_query_matches_oracle_smoke(spark, name):
    assert name in QUERIES, f"oracle {name} has no spark query"
    df = QUERIES[name](spark, SF_DIR_ORACLE)
    res = compare(name, df, ORACLES[name], SF_DIR_ORACLE)
    assert res.ok, "\n".join(res.problems)


@pytest.mark.full
@pytest.mark.parametrize("name", sorted(set(ORACLES) - set(SMOKE)))
def test_query_matches_oracle(spark, name):
    assert name in QUERIES, f"oracle {name} has no spark query"
    df = QUERIES[name](spark, SF_DIR_ORACLE)
    res = compare(name, df, ORACLES[name], SF_DIR_ORACLE)
    assert res.ok, "\n".join(res.problems)


def test_all_queries_have_runnable_plans(spark):
    for name, fn in QUERIES.items():
        df = fn(spark, SF_DIR_ORACLE)
        assert df.columns, name


@pytest.mark.full
@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_execute(spark, name):
    """Queries without an oracle (non-SQL-expressible) still must run and
    produce rows at the driver's correctness scale."""
    n = QUERIES[name](spark, SF_DIR_ORACLE).count()
    assert n > 0, f"{name} returned no rows"
