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


# --------------------------------------------------------------------------
# HyperLogLog (Flajolet, Fusy, Gandouet & Meunier 2007, AofA): the
# MERGEABLE cardinality sketch.  Spark's built-in
# ``approx_count_distinct`` is HLL++ but its registers are opaque (and
# its estimate is not replayable in another engine); this explicit
# register-table form gives the repo the same three properties the
# count-min and Bloom operators already have: (a) a fixed-size state
# table (m = 2^p rows max, regardless of corpus size), (b) loss-free
# MAX-merge across partitions/days/sources, and (c) full ANSI-SQL
# replayability so the estimate itself is value-hash oracled (q157).
#
# Determinism across engines is engineered, not assumed:
#   * hash = the repo's md5-60-bit construction; bucket = h % m,
#     suffix = the next HLL_SUFFIX_BITS bits (bit ops only).
#   * rho (leading-zero rank) = 41 - length(bin(suffix)) — binary-string
#     length instead of log2(), so no libm anywhere.
#   * the harmonic sum is computed SCALED BY 2^41 in int64
#     (sum of 1 << (41 - reg), absent registers contribute 1 << 41);
#     with 40 suffix bits and m <= 4096 the scaled sum stays < 2^53,
#     so the int64 -> double cast is exact and the single double
#     division + floor is bit-identical on any IEEE-754 engine.
#   * the small-range linear-counting correction needs ln(); libm last-
#     ulp divergence would poison a value-hash, so the RAW estimate is
#     the oracled surface and the correction is a separate library
#     column (`hll_corrected`) tested against Python's math.log.
# --------------------------------------------------------------------------

#: Suffix width in bits.  40 (not the full 52 the 60-bit hash could
#: spare) keeps the scaled harmonic sum exactly representable:
#: max rho = 41, so each register term <= 2^41 and the m-register sum
#: stays < 2^53 for every p <= 12.
HLL_SUFFIX_BITS = 40


def hll_alpha(m: int) -> float:
    """Bias-correction constant alpha_m of Flajolet et al. (2007):
    the paper's tabulated values for m = 16/32/64, the closed form for
    m >= 128."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    if m < 128:
        raise ValueError(f"hll_alpha needs m in {{16,32,64}} or >= 128, got {m}")
    return 0.7213 / (1.0 + 1.079 / m)


def hll_alpha_m2_scaled(p: int) -> float:
    """``alpha_m * m^2 * 2^(HLL_SUFFIX_BITS+1)`` as one double — the
    numerator of the raw estimate against the SCALED integer harmonic
    sum.  Both engines receive this exact double (Spark via lit(),
    DuckDB via repr() round-trip), so the division is bit-identical."""
    m = 1 << p
    return hll_alpha(m) * m * m * float(1 << (HLL_SUFFIX_BITS + 1))


def hll_registers(
    df: DataFrame,
    token_col: str = "token",
    keys: list[str] | tuple = (),
    p: int = 8,
    salt: str = "hll",
) -> DataFrame:
    """One corpus scan -> the register table ``(*keys, bucket, reg)``
    with at most m = 2^p rows per key group.  Feed raw OCCURRENCES —
    duplicates cost nothing (MAX absorbs them map-side), which is the
    whole point: no distinct(), no shuffle of the value domain, state
    bounded by m however large the corpus."""
    if not 4 <= p <= 12:
        raise ValueError(f"p must be in [4, 12], got {p}")
    m = 1 << p
    keys = list(keys)
    t = F.col(token_col)
    h = F.conv(
        F.substring(F.md5(F.concat(t, F.lit(salt))), 1, 15), 16, 10
    ).cast("long")
    bucket = F.pmod(h, F.lit(m)).cast("long")
    suffix = F.shiftright(h, p).bitwiseAND(F.lit((1 << HLL_SUFFIX_BITS) - 1))
    rho = (
        F.when(suffix == 0, F.lit(HLL_SUFFIX_BITS + 1))
        .otherwise(F.lit(HLL_SUFFIX_BITS + 1) - F.length(F.bin(suffix)))
        .cast("long")
    )
    return (
        df.select(*keys, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*keys, "bucket")
        .agg(F.max("rho").alias("reg"))
    )


def hll_merge(a: DataFrame, b: DataFrame, keys: list[str] | tuple = ()) -> DataFrame:
    """MAX-merge two register tables built with identical (p, salt):
    ``hll(A) merge hll(B) == hll(A UNION ALL B)`` exactly — sketch each
    partition/day/source independently, merge m-bounded states."""
    return (
        a.unionByName(b)
        .groupBy(*list(keys), "bucket")
        .agg(F.max("reg").alias("reg"))
    )


def hll_estimate(
    registers: DataFrame, keys: list[str] | tuple = (), p: int = 8
) -> DataFrame:
    """Raw HLL estimate per key group: ``(*keys, buckets_hit, hll_ndv)``.

    ``hll_ndv = floor(alpha_m * m^2 / Z)`` with the harmonic sum Z kept
    as an exact scaled int64 until one final double division (module
    header explains why that is bit-stable across engines).  This is
    the RAW estimator — apply :func:`hll_corrected` for the small-range
    linear-counting correction when the estimate feeds decisions rather
    than a value-hash oracle."""
    m = 1 << p
    rmax = HLL_SUFFIX_BITS + 1
    agg = registers.groupBy(*list(keys)).agg(
        F.count(F.lit(1)).cast("long").alias("buckets_hit"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({rmax} - reg AS INT))")
        ).alias("_z_present"),
    )
    z_scaled = (
        F.col("_z_present")
        + (F.lit(m) - F.col("buckets_hit")) * F.lit(1 << rmax).cast("long")
    )
    est = F.floor(
        F.lit(hll_alpha_m2_scaled(p)) / z_scaled.cast("double")
    ).cast("long")
    return agg.select(*list(keys), "buckets_hit", est.alias("hll_ndv"))


def hll_corrected(estimate: Column, buckets_hit: Column, p: int = 8) -> Column:
    """Linear-counting correction (Flajolet et al. 2007 fig. 3): when
    the raw estimate <= 2.5m and some buckets are empty, the balls-in-
    bins estimate ``m * ln(m / n_empty)`` dominates.  Uses ln()
    (libm), so this column is deliberately OUTSIDE the oracle surface —
    pinned against Python math.log in tests instead."""
    m = 1 << p
    n_empty = F.lit(float(m)) - buckets_hit.cast("double")
    lc = F.floor(F.lit(float(m)) * F.log(F.lit(float(m)) / n_empty)).cast("long")
    small = (estimate <= F.lit(int(2.5 * m))) & (buckets_hit < F.lit(m))
    return F.when(small, lc).otherwise(estimate)
