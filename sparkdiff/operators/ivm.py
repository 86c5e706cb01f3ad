"""Incremental view maintenance for JOIN views — the delta-propagation
algebra behind every warehouse materialized view that is not a pure
aggregate (Gupta & Mumick 1995, "Maintenance of materialized views:
problems, techniques, and applications"; the same decomposition drives
Differential Dataflow and Materialize).

For an insert-only pair of deltas against a stored two-table equi-join
view ``V = A ⋈ B``::

    ΔV  =  ΔA ⋈ B  ∪  A ⋈ ΔB  ∪  ΔA ⋈ ΔB

(the three terms are disjoint when ΔA/ΔB are disjoint from A/B, which
insert-only guarantees).  The point at 100 TB: the view is refreshed by
joining DELTA-sized inputs against the stored sides — never by
recomputing ``A_new ⋈ B_new`` — and when a delta batch is small Spark
broadcasts it, so maintenance cost is O(|Δ| · matched rows), not
O(|A| + |B|).

Reference anchor: the reference re-runs its stored-proc diff from
scratch per request (`tools/data_matrix_tool.py:43`); this is the
engine-side machinery that makes repeated validation incremental,
composing with q108's partial-aggregate combine (aggregates) and the
q52/q53 checksum gate (change detection).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame


def join_delta(
    a_old: DataFrame,
    a_delta: DataFrame,
    b_old: DataFrame,
    b_delta: DataFrame,
    on: Sequence[str] | str,
) -> DataFrame:
    """Insert-only delta of the equi-join view ``A ⋈ B``: the rows of
    ``(A ∪ ΔA) ⋈ (B ∪ ΔB)`` that are not in ``A ⋈ B``, computed from
    three delta-sized joins — ``ΔA ⋈ B ∪ A ⋈ ΔB ∪ ΔA ⋈ ΔB`` — without
    touching the old-side × old-side product.  Column layout follows
    ``DataFrame.join(..., on)``: join keys once, then A's remaining
    columns, then B's.  Correct for bag semantics (duplicate join rows
    propagate multiplicities) because the three terms partition the new
    join's provenance pairs."""
    on = [on] if isinstance(on, str) else list(on)
    return (
        a_delta.join(b_old, on)
        .unionByName(a_old.join(b_delta, on))
        .unionByName(a_delta.join(b_delta, on))
    )
