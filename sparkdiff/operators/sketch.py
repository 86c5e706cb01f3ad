"""Count-min sketch (Cormode & Muthukrishnan 2005, J. Algorithms):
the MERGEABLE heavy-hitter/frequency sketch — fixed d×w integer
matrix, one-sided error (estimates never undercount), and two sketches
merge by cell-wise addition.  At 100 TB that is the whole point: every
partition/day/source builds its own d×w grid, grids add, and the final
table is d·w rows regardless of corpus size — the counts analogue of
the Bloom filter (operators/bloom.py) and the HLL NDV twin
(operators/profile.py), completing the repo's sketch family.

Determinism: the d hash rows are the repo's standard md5 60-bit
construction (``conv(substr(md5(token || salt || row), 1, 15), 16,
10) % w``) — engine-portable, so the ENTIRE sketch (cell values,
probe buckets, min-estimates) is replayable in ANSI SQL and value-hash
oracled (q154).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cms_bucket(token: Column | str, row: int, w: int, salt: str) -> Column:
    """Row-``row``'s bucket for ``token``: md5-60-bit hash mod ``w``
    (non-negative, so ``%`` and ``pmod`` agree across engines)."""
    t = F.col(token) if isinstance(token, str) else token
    h = F.conv(
        F.substring(F.md5(F.concat(t, F.lit(f"{salt}{row}"))), 1, 15), 16, 10
    ).cast("long")
    return F.pmod(h, F.lit(w)).cast("long")


def _row_buckets(token_col: str, d: int, w: int, salt: str) -> Column:
    return F.array(
        *[
            F.struct(
                F.lit(i).cast("long").alias("r"),
                cms_bucket(token_col, i, w, salt).alias("b"),
            )
            for i in range(d)
        ]
    )


def count_min_sketch(
    occurrences: DataFrame,
    token_col: str = "token",
    d: int = 4,
    w: int = 1024,
    salt: str = "cms",
    weight_col: str | None = None,
) -> DataFrame:
    """Build the sketch: returns ``(r, b, cnt)`` with at most d·w rows.
    One corpus scan, one map-side-combined aggregation over a
    d·w-bounded key space — mergeable with any other sketch of the same
    (d, w, salt) by summing ``cnt`` per (r, b).

    Two input shapes, identical cells: one row per OCCURRENCE
    (``weight_col=None`` — the streaming shape), or one row per
    DISTINCT token with ``weight_col`` its occurrence count — the batch
    shape when a frequency table already exists, hashing vocab-sized
    rows instead of exploding every occurrence d× (q154: the d·|corpus
    tokens| explode was the query's whole cost; the weighted build
    hashes |vocab| rows)."""
    if d < 1 or w < 1:
        raise ValueError(f"d and w must be >= 1, got {d}, {w}")
    wcol = (
        F.lit(1).cast("long")
        if weight_col is None
        else F.col(weight_col).cast("long")
    )
    return (
        occurrences.select(
            wcol.alias("_cms_w"),
            F.explode(_row_buckets(token_col, d, w, salt)).alias("rb"),
        )
        .select("_cms_w", F.col("rb.r").alias("r"), F.col("rb.b").alias("b"))
        .groupBy("r", "b")
        .agg(F.sum("_cms_w").cast("long").alias("cnt"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches built with identical (d, w, salt): cell-wise
    sum.  ``sketch(A) ⊕ sketch(B) == sketch(A ∪ B)`` exactly — the
    property that lets every partition/source/day sketch independently."""
    return (
        a.unionByName(b)
        .groupBy("r", "b")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    token_col: str = "token",
    d: int = 4,
    w: int = 1024,
    salt: str = "cms",
) -> DataFrame:
    """Point-estimate each probe token's occurrence count: min over the
    token's d cells.  Never undercounts; overcounts only by hash-
    collision mass (≤ 2·N/w per row w.h.p.).  The sketch side is
    d·w-bounded, so it broadcasts and the probe table never shuffles."""
    pb = probes.select(
        token_col, F.explode(_row_buckets(token_col, d, w, salt)).alias("rb")
    ).select(token_col, F.col("rb.r").alias("r"), F.col("rb.b").alias("b"))
    return (
        pb.join(F.broadcast(sketch), ["r", "b"])
        .groupBy(token_col)
        .agg(F.min("cnt").cast("long").alias("cms_est"))
    )
